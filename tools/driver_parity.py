"""Strict replica of the round driver's correctness fetch path.

The driver materializes BOTH result sets through pandas — Spark via
``toPandas()``-equivalent collect, DuckDB via a dataframe fetch — sorts
columns by name, and value-hashes the raw cell representations. That is
stricter than ``tests/oracle_harness.compare_results`` (which compares
Python objects with float tolerance): DuckDB HUGEINT→float64 coercion
("44158776552.0" vs "44158776552") fails the driver hash while passing
the tolerant compare. Run this before every round to catch any
representation drift on ALL registered queries.

Usage: python tools/driver_parity.py [sf_dir] [name_substring ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


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
    representation drift ("44158776552" vs "44158776552.0") this tool
    exists to catch."""
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


def simhash_components_py_oracle(con) -> "pd.DataFrame":
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


def kind_class(kind: str) -> str:
    """Numeric class of a dtype kind — int-vs-float drift on a hashed
    column is a FAILURE (the driver's repr-hash sees "5" vs "5.0"), not
    a note."""
    return _KIND_CLASS.get(kind, "other")


def main() -> int:
    from log_analysis_bigdata_spark.queries import all_queries
    from log_analysis_bigdata_spark.session import get_spark
    from tests.oracle_harness import duck_connection

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    spark = get_spark(app_name="driver_parity")
    # Warm the JVM and Python UDF workers (same as bench.py) so the
    # first query's reported time isn't dominated by one-time session
    # startup — this is a correctness sweep; per-query seconds are only
    # recorded to spot outliers.
    spark.range(1000).count()
    from pyspark.sql.functions import col, pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.range(1000).repartition(8).select(_warm(col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()
    # ...and the join/agg/sort/HOF codegen paths: whichever query runs
    # first otherwise absorbs their one-time JIT (measured ~5s of the
    # slot-1 query's wall time — it made slot-1 simhash_near_components
    # look 2x slower in EVIDENCE_r05/r06 than the same query mid-sweep).
    a = spark.range(2000).selectExpr(
        "id", "id % 7 AS k", "array_repeat(id, 4) AS arr"
    )
    (
        a.join(a.selectExpr("id AS id2", "id % 7 AS k"), "k")
        .selectExpr(
            "k",
            "aggregate(arr, 0L, (acc, x) -> acc + x) AS s",
            "row_number() OVER (PARTITION BY k ORDER BY id) AS rn",
        )
        .groupBy("k")
        .agg({"s": "sum", "rn": "max"})
        .orderBy("k")
        .write.format("noop").mode("overwrite").save()
    )
    # ...and the localCheckpoint path the iterative operators
    # (components, pagerank) hit on their first round
    spark.range(4000).selectExpr(
        "id % 13 AS a", "id % 7 AS b"
    ).distinct().localCheckpoint(eager=True).count()
    con = duck_connection(sf)
    queries = all_queries()
    n_fail = 0
    for name, qd in queries.items():
        if only and not any(s in name for s in only):
            continue
        t0 = time.time()
        try:
            spdf = qd.spark(spark, sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark err {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if qd.oracle is None:
            print(f"ok   {name}: rows-only ({len(spdf)} rows, {time.time()-t0:.1f}s)")
            continue
        swap_note = ""
        try:
            if (
                name == "simhash_near_components"
                and con.execute("SELECT count(*) FROM documents").fetchone()[0]
                >= CLOSURE_SWAP_MIN_DOCS
            ):
                # recursive-CTE closure infeasible at this scale; see
                # simhash_components_py_oracle
                dpdf = simhash_components_py_oracle(con)
                swap_note = " [py-union-find closure]"
            else:
                dpdf = con.execute(qd.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle err {type(e).__name__}: {e}")
            n_fail += 1
            continue
        s_cols, s_rows, s_kinds = canon_frame(spdf)
        d_cols, d_rows, d_kinds = canon_frame(dpdf)
        problems = []
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
                f"numeric-class drift {c}: spark kind={s_kinds[c]} duck kind={d_kinds[c]}"
                for c in s_kinds
                if c in d_kinds and kind_class(s_kinds[c]) != kind_class(d_kinds[c])
            )
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"     {p}")
            if kind_notes:
                print(f"     dtype kinds: {'; '.join(kind_notes)}")
        else:
            note = f" [dtype kinds differ: {'; '.join(kind_notes)}]" if kind_notes else ""
            print(
                f"ok   {name} ({len(s_rows)} rows, "
                f"{time.time()-t0:.1f}s){note}{swap_note}"
            )
    print(f"\n{n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
