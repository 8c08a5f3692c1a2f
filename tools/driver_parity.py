"""Full-registry sweep of the round driver's correctness fetch path.

The compare and oracle-fetch logic (canonical repr-hash cells, the
dtype-kind drift check, the large-corpus py-union-find closure swap)
live in ONE shared module — ``tests/oracle_harness.py`` — imported by
both this sweep and the pytest parity suite (VERDICT r8 task 8), so an
oracle-side fix cannot drift between the two entry points. This tool
adds only the sweep loop: session warm-up, per-query timing, and the
failure report over ALL registered queries.

Usage: python tools/driver_parity.py [sf_dir] [name_substring ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_harness import (  # noqa: E402
    CLOSURE_SWAP_MIN_DOCS,  # noqa: F401  (back-compat re-export)
    duck_connection,
    fetch_oracle_df,
    simhash_components_py_oracle,  # noqa: F401  (back-compat re-export)
    strict_compare_frames,
)


def main() -> int:
    from log_analysis_bigdata_spark.queries import all_queries
    from log_analysis_bigdata_spark.session import get_spark

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
        try:
            dpdf, swap_note = fetch_oracle_df(con, name, qd.oracle)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle err {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems, kind_notes = strict_compare_frames(spdf, dpdf)
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
                f"ok   {name} ({len(spdf)} rows, "
                f"{time.time()-t0:.1f}s){note}{swap_note}"
            )
    print(f"\n{n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
