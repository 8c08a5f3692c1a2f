"""Measure ivfpq_topk recall@10 vs exact brute force — the harness
behind the numbers in queries/vectorq.py's IVF-PQ module comment and
EVIDENCE_r11.

Tiers:
- DIFFUSE (the ANN worst case): unit-norm i.i.d. Gaussian corpora at
  N in {500, 2 000, 20 000} x corpus seeds {7, 11, 23} — no cluster
  structure, true top-10 cosines ~0.37-0.55.
- REAL: the driver-generated sf0.001/sf0.01/sf0.1 embeddings.
- PLANTED: diffuse N=20 000 plus a cos~0.9999 copy of the query vector
  (the dedup ceiling: the copy must come back at rank 1).

Usage: python tools/ivfpq_recall.py [--quick]
(--quick runs one diffuse seed and sf0.01 only)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_diffuse(n: int, seed: int, d: int = 64) -> np.ndarray:
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, d))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v.astype(np.float32)


def write_embeddings(path: str, vids: np.ndarray, vecs: np.ndarray) -> None:
    tab = pa.table(
        {
            "vec_id": vids.astype(np.int64),
            "embedding": [row.tolist() for row in vecs.astype(np.float32)],
            "label": (vids % 5).astype(np.int32),
        },
        schema=pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        ),
    )
    pq.write_table(tab, path)


def brute_top10(vecs: np.ndarray, vids: np.ndarray, qid: int) -> set[int]:
    qi = int(np.where(vids == qid)[0][0])
    v64 = vecs.astype(np.float64)
    q = v64[qi]
    cos = np.round(
        (v64 @ q) / (np.linalg.norm(v64, axis=1) * np.linalg.norm(q)), 4
    )
    m = vids != qid
    order = np.lexsort((vids[m], -cos[m]))
    return {int(x) for x in vids[m][order][:10]}


def run_spark(spark, sf_dir: str) -> list[int]:
    from log_analysis_bigdata_spark.queries import all_queries

    rows = all_queries()["ivfpq_topk"].spark(spark, sf_dir).collect()
    return [r["vec_id"] for r in rows]


def main() -> int:
    quick = "--quick" in sys.argv
    from log_analysis_bigdata_spark.session import get_spark

    spark = get_spark(app_name="ivfpq_recall")
    out: dict[str, dict] = {}
    seeds = (7,) if quick else (7, 11, 23)
    sizes = (20_000,) if quick else (500, 2_000, 20_000)

    with tempfile.TemporaryDirectory() as td:
        for n in sizes:
            for seed in seeds:
                V = make_diffuse(n, seed)
                vids = np.arange(n)
                d = os.path.join(td, f"diffuse_{n}_{seed}")
                os.makedirs(d, exist_ok=True)
                write_embeddings(os.path.join(d, "embeddings.parquet"), vids, V)
                truth = brute_top10(V, vids, 0)
                got = set(run_spark(spark, d))
                out[f"diffuse_n{n}_seed{seed}"] = {
                    "recall_at_10": len(truth & got) / 10
                }
        # planted ceiling
        V = make_diffuse(20_000, 7)
        rng = np.random.default_rng(1)
        dup = V[0] + rng.normal(0, 0.005, 64).astype(np.float32)
        dup /= np.linalg.norm(dup)
        V2 = np.vstack([V, dup[None]])
        vids2 = np.arange(20_001)
        d = os.path.join(td, "planted")
        os.makedirs(d, exist_ok=True)
        write_embeddings(os.path.join(d, "embeddings.parquet"), vids2, V2)
        got_list = run_spark(spark, d)
        out["planted_n20001"] = {
            "dup_found": 20_000 in got_list,
            "dup_rank": (got_list.index(20_000) + 1)
            if 20_000 in got_list
            else None,
        }

    sfs = ("/root/testdata/sf0.01",) if quick else (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    for sf in sfs:
        t = pq.read_table(os.path.join(sf, "embeddings.parquet"))
        V = np.array(
            [np.array(x, dtype=np.float32) for x in t["embedding"].to_pylist()]
        )
        vids = np.array(t["vec_id"].to_pylist())
        truth = brute_top10(V, vids, 0)
        got = set(run_spark(spark, sf))
        out[f"real_{os.path.basename(sf)}"] = {
            "n": len(vids),
            "recall_at_10": len(truth & got) / 10,
        }

    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
