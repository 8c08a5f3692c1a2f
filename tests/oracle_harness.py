"""THE single implementation of the driver's DuckDB-oracle comparison,
shared by `pytest` (tests/test_oracle_parity.py) and the full sweep tool
(tools/driver_parity.py) — VERDICT r8 task 8: the compare and the
oracle-fetch path (including the large-corpus closure swap) live HERE
and only here, so an oracle-side fix cannot drift between the two entry
points.

Compare semantics replicate the round driver's correctness fetch: both
result sets materialize through pandas, columns sort by name, and cells
compare on their canonical string representation (a repr-hash). That is
deliberately STRICT — DuckDB HUGEINT→float64 coercion ("44158776552.0"
vs "44158776552") must FAIL here because it fails the driver's hash.
"""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):
            # Spark-written tables are DIRECTORIES of part files (the
            # self-generated scale-up sets under /tmp); driver testdata
            # is single files — support both
            path = os.path.join(path, "*.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


# --- canonical cell/frame representation (the driver's repr-hash) -----------


def canon_cell(v):
    """Canonical string for a cell, matching what a repr-hash would see."""
    if v is None or v is pd.NA:
        return "NULL"
    if isinstance(v, (float, np.floating)) and math.isnan(v):
        return "NULL"
    if isinstance(v, np.floating):
        return repr(float(v))
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def canon_frame(pdf: pd.DataFrame):
    """Canonicalize per COLUMN (never ``iterrows``): row extraction
    coerces mixed int/float frames to a common dtype on BOTH sides,
    which would hide exactly the Spark-long vs DuckDB-float64
    representation drift ("44158776552" vs "44158776552.0") this
    module exists to catch."""
    cols = sorted(pdf.columns, key=lambda c: c.lower())
    col_vals = []
    for c in cols:
        s = pdf[c]
        vals = s.to_numpy() if s.dtype.kind in "iufb" else s.to_list()
        col_vals.append([canon_cell(v) for v in vals])
    rows = sorted(zip(*col_vals)) if col_vals else []
    kinds = {c.lower(): pdf[c].dtype.kind for c in pdf.columns}
    return [c.lower() for c in cols], rows, kinds


_KIND_CLASS = {"i": "int", "u": "int", "f": "float", "b": "bool"}


def kind_class(kind: str) -> str:
    """Numeric class of a dtype kind — int-vs-float drift on a hashed
    column is a FAILURE (the driver's repr-hash sees "5" vs "5.0"), not
    a note."""
    return _KIND_CLASS.get(kind, "other")


def strict_compare_frames(
    spdf: pd.DataFrame, dpdf: pd.DataFrame
) -> tuple[list[str], list[str]]:
    """Driver-strict comparison of a Spark ``toPandas()`` frame against
    a DuckDB ``fetchdf()`` frame.

    Returns ``(problems, kind_notes)``: ``problems`` non-empty means the
    driver's hash would mismatch; ``kind_notes`` are informational dtype
    kind differences that canonicalize identically (e.g. int32 vs
    int64)."""
    s_cols, s_rows, s_kinds = canon_frame(spdf)
    d_cols, d_rows, d_kinds = canon_frame(dpdf)
    problems: list[str] = []
    if s_cols != d_cols:
        problems.append(f"columns spark={s_cols} duck={d_cols}")
    elif len(s_rows) != len(d_rows):
        problems.append(f"rows spark={len(s_rows)} duck={len(d_rows)}")
    else:
        bad = [
            (i, c, a, b)
            for i, (sr, dr) in enumerate(zip(s_rows, d_rows))
            for c, (a, b) in enumerate(zip(sr, dr))
            if a != b
        ]
        for i, c, a, b in bad[:4]:
            problems.append(f"row {i} col {s_cols[c]}: spark={a!r} duck={b!r}")
        if len(bad) > 4:
            problems.append(f"... {len(bad)} cell mismatches")
    kind_notes = [
        f"{c}: spark={s_kinds[c]} duck={d_kinds[c]}"
        for c in s_kinds
        if c in d_kinds and s_kinds[c] != d_kinds[c]
    ]
    if s_rows and d_rows:  # empty frames carry no meaningful dtype
        problems.extend(
            f"numeric-class drift {c}: spark kind={s_kinds[c]} "
            f"duck kind={d_kinds[c]}"
            for c in s_kinds
            if c in d_kinds and kind_class(s_kinds[c]) != kind_class(d_kinds[c])
        )
    return problems, kind_notes


# --- scalable oracle for simhash_near_components (VERDICT r7 task 5) --------
# The registered oracle's recursive-CTE transitive closure is
# Θ(Σ component²) rows in `reach` — it cannot run over the sf1 tile set
# (EVIDENCE_r07 §1). Above this corpus size the replica swaps ONLY the
# closure: the verified hamming<=1 edge list still comes from the same
# DuckDB SQL (the oracle's own CTE chain minus `reach`), and a Python
# union-find replaces the recursive fixpoint. tests/test_properties.py
# asserts the two closures are row-identical on the small-SF corpus, so
# the swap cannot hide a clustering divergence.
CLOSURE_SWAP_MIN_DOCS = 20_000


def simhash_components_py_oracle(con) -> pd.DataFrame:
    """(node, component) via DuckDB-verified edges + Python union-find.

    Matches the registered oracle exactly: the node set is every pair
    endpoint (the recursive form's self-loops), and component = min
    reachable node id."""
    from log_analysis_bigdata_spark.queries.textq import (
        _DUP_CORPUS_SQL,
        _near_bands_sql,
        _near_sig_sql,
    )

    edges = con.execute(f"""
    WITH corpus AS ({_DUP_CORPUS_SQL}),
    sig AS (
      SELECT doc_id, CAST({_near_sig_sql()} AS BIGINT) AS simhash
      FROM corpus
    ),
    bands AS ({_near_bands_sql()}),
    cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sig_a, b.simhash AS sig_b
      FROM bands a JOIN bands b
        ON a.b = b.b AND a.band_val = b.band_val AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b FROM cands
    WHERE bit_count(xor(sig_a, sig_b)) <= 1
    """).fetchall()

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id keeps root == component label directly
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = sorted((n, find(n)) for n in parent)
    return pd.DataFrame(rows, columns=["node", "component"]).astype("int64")


def fetch_oracle_df(
    con: duckdb.DuckDBPyConnection, name: str, sql: str
) -> tuple[pd.DataFrame, str]:
    """Fetch a query's oracle result as a pandas frame, applying the
    large-corpus closure swap when it triggers. Returns ``(frame,
    note)`` — ``note`` is non-empty when a swap replaced the registered
    SQL, so callers can surface it."""
    if (
        name == "simhash_near_components"
        and con.execute("SELECT count(*) FROM documents").fetchone()[0]
        >= CLOSURE_SWAP_MIN_DOCS
    ):
        # recursive-CTE closure infeasible at this scale; see
        # simhash_components_py_oracle
        return simhash_components_py_oracle(con), " [py-union-find closure]"
    return con.execute(sql).fetchdf(), ""
