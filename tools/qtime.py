"""Isolated per-query timing: run named registry queries through the
noop sink (guide §1.4) N times in one session and print cold + warm-min
seconds per query — the measurement loop for optimization work without
paying a full bench pass.

Usage: python tools/qtime.py [--passes 3] [--sf-dir DIR] name [name...]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_analysis_bigdata_spark.queries import all_queries  # noqa: E402
from log_analysis_bigdata_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark(app_name="qtime")
    registry = all_queries()
    # same JVM/Python-worker warmup as bench.py
    spark.range(1000).count()
    from pyspark.sql.functions import col, pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.range(1000).repartition(32).select(_warm(col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    out = {}
    for name in args.names:
        times = []
        for _ in range(args.passes):
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.perf_counter()
            df = registry[name].spark(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            del df
            gc.collect()
        out[name] = {
            "cold": round(times[0], 3),
            "warm_min": round(min(times[1:]) if len(times) > 1 else times[0], 3),
            "all": [round(t, 3) for t in times],
        }
        print(name, out[name], file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
