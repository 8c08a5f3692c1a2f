"""Adversarial-skew fixture generator (VERDICT r8 task 5).

The driver testdata's key distributions are near-uniform, so the
salting / sub-cell / null-drop paths' skew claims were never exercised
against a genuinely adversarial distribution. This tool writes:

- ``make_zipf_events(out_dir)`` — an ``events.parquet`` with the driver
  schema whose ``user_id`` and ``event_type`` follow a finite-rank
  Zipf(s≈1.5): the top user owns ~35-40% of ALL rows (P(rank r) ∝
  r^-s; 1/H(n,1.5) mass on rank 1) — the distribution where an
  unsalted shuffle concentrates ~0.4N rows on one reducer.
- ``make_tied_embeddings(out_dir)`` — an ``embeddings.parquet`` of
  IDENTICAL dyadic-valued vectors: every centroid distance ties
  exactly, so the argmin tie-break routes ALL vectors into one cell —
  the worst-case skewed cell for SemDeDup's sub-cell pair cap (and an
  adversarial probe of the engine/oracle tie-break mirror).

Values are dyadic rationals where exactness matters (tie-break test):
sums and averages of dyadics are exact in IEEE double at these sizes,
so "identical vectors" produce *bit-identical* centroid distances, not
merely close ones.

Usage: python tools/skew_fixture.py /tmp/skew  (writes both tables and
prints the realized skew summary).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _zipf_ranks(rng: np.random.Generator, n: int, n_ranks: int, s: float):
    w = np.arange(1, n_ranks + 1, dtype=np.float64) ** -s
    return rng.choice(n_ranks, size=n, p=w / w.sum()) + 1


def make_zipf_events(
    out_dir: str,
    n_rows: int = 400_000,
    n_users: int = 40_000,
    n_types: int = 200,
    s: float = 1.5,
    seed: int = 7,
) -> dict:
    rng = np.random.default_rng(seed)
    user_id = _zipf_ranks(rng, n_rows, n_users, s).astype(np.int64)
    type_rank = _zipf_ranks(rng, n_rows, n_types, s)
    base_us = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z in micros
    tab = pa.table(
        {
            "event_id": np.arange(n_rows, dtype=np.int64),
            "ts": pa.array(
                base_us + np.arange(n_rows, dtype=np.int64),
                type=pa.timestamp("us"),
            ),
            "user_id": user_id,
            "event_type": np.array(
                [f"type_{r:03d}" for r in type_rank], dtype=object
            ),
            "value": np.round(rng.uniform(0, 100, n_rows), 2),
            "props": np.array(
                ['{"v":1}'] * n_rows, dtype=object
            ),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(tab, os.path.join(out_dir, "events.parquet"))
    top_user = np.bincount(user_id).max()
    top_type = np.bincount(type_rank).max()
    return {
        "n_rows": n_rows,
        "top_user_share": round(top_user / n_rows, 4),
        "top_type_share": round(top_type / n_rows, 4),
    }


def make_tied_embeddings(
    out_dir: str, n_vecs: int = 2_000, dim: int = 64
) -> dict:
    # one dyadic vector repeated n times: 0.5, 0.25, 0.5, 0.25, ...
    # (nonzero norm; all sums/averages exact in double)
    vec = [0.5 if i % 2 == 0 else 0.25 for i in range(dim)]
    tab = pa.table(
        {
            "vec_id": np.arange(n_vecs, dtype=np.int64),
            "embedding": [vec] * n_vecs,
            "label": np.zeros(n_vecs, dtype=np.int32),
        },
        schema=pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        ),
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(tab, os.path.join(out_dir, "embeddings.parquet"))
    return {"n_vecs": n_vecs, "dim": dim}


def make_dup_class_embeddings(
    out_dir: str, n_natural: int = 300, m_dup: int = 50, dim: int = 64
) -> dict:
    """Natural-ish deterministic vectors plus an m_dup-member class of
    byte-identical copies of vector 0 (ids past the naturals) — the
    hyperplane-LSH degenerate-bucket fixture (r17, VERDICT r16 task 4:
    identical embeddings share every sign band the way identical
    shingle arrays share every minhash band)."""
    rng = np.random.RandomState(1234)
    nat = rng.uniform(-1.0, 1.0, (n_natural, dim)).astype(np.float32)
    vecs = [nat[i].tolist() for i in range(n_natural)] + [
        nat[0].tolist()
    ] * m_dup
    n = n_natural + m_dup
    tab = pa.table(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": vecs,
            "label": np.zeros(n, dtype=np.int32),
        },
        schema=pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        ),
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(tab, os.path.join(out_dir, "embeddings.parquet"))
    return {"n_natural": n_natural, "m_dup": m_dup, "dim": dim}


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skew"
    print(json.dumps(make_zipf_events(out)))
    print(json.dumps(make_tied_embeddings(out)))
