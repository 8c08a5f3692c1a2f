"""Streaming cost attribution for stream_stream_join_attribution
(round 10, VERDICT r9 task 8): is the ~7 s sf0.01 parity wall the fixed
micro-batch replay harness, or real state-store/join work?

Method: run three availableNow streaming queries over the SAME events
source through the SAME memory-sink harness shape and compare

  (a) floor    — pass-through projection (no state, no join): the
                 harness + source-discovery + sink cost every streaming
                 entry pays regardless of its operator;
  (b) join     — the registered click->purchase interval join plan;
  (c) the join query's own StreamingQueryProgress: per-batch
                 triggerExecution/addBatch breakdown + state-store rows,
                 which attributes (b)-(a) between join compute and
                 state management.

Each variant runs twice; the SECOND run is reported (first pays one-off
JIT/codegen, same policy as bench.py warm-min). Prints one JSON line;
paste the numbers into EVIDENCE_r10 §9 next to the bench
streaming-harness exclusion so the exclusion stays honest.

Usage: python tools/profile_streaming.py [sf_dir=/root/testdata/sf0.01]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def run_stream(df, output_mode: str = "append"):
    """availableNow replay into a memory sink (the registry harness
    shape), returning (wall_seconds, progress_list)."""
    qname = f"prof_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="prof_ckpt_")
    t0 = time.perf_counter()
    try:
        q = (
            df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(qname)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        except BaseException:
            q.stop()
            raise
        wall = time.perf_counter() - t0
        prog = [p.asDict() if hasattr(p, "asDict") else p
                for p in (q.recentProgress or [])]
        return wall, prog
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from log_analysis_bigdata_spark.catalog import load_table_stream
    from log_analysis_bigdata_spark.session import get_spark

    spark = get_spark(app_name="profile_streaming")
    spark.range(1000).count()

    def passthrough():
        return load_table_stream(spark, sf_dir, "events").select(
            "user_id", "ts", "event_type"
        )

    def ss_join():
        ev = load_table_stream(spark, sf_dir, "events").select(
            "user_id", "ts", "event_type"
        )
        clicks = (
            ev.filter(F.col("event_type") == "click")
            .select("user_id", F.col("ts").alias("click_ts"))
            .withWatermark("click_ts", "1 hour")
        )
        purchases = (
            ev.filter(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
            )
            .withWatermark("p_ts", "1 hour")
        )
        return clicks.join(
            purchases,
            F.expr(
                "user_id = p_user AND p_ts >= click_ts "
                "AND p_ts <= click_ts + interval 30 minutes"
            ),
        )

    out = {"sf_dir": sf_dir}
    for name, mk in (("floor_passthrough", passthrough), ("ss_join", ss_join)):
        walls, progress = [], None
        for _run in range(2):
            w, p = run_stream(mk())
            walls.append(round(w, 3))
            progress = p
        batches = []
        for p in progress or []:
            dur = p.get("durationMs", {}) or {}
            st = p.get("stateOperators") or []
            batches.append(
                {
                    "batchId": p.get("batchId"),
                    "numInputRows": p.get("numInputRows"),
                    "triggerExecution_ms": dur.get("triggerExecution"),
                    "addBatch_ms": dur.get("addBatch"),
                    "getBatch_ms": dur.get("getBatch"),
                    "latestOffset_ms": dur.get("latestOffset"),
                    "walCommit_ms": dur.get("walCommit"),
                    "stateCommit_ms": dur.get("commitTime"),
                    "state_rows_total": sum(
                        s.get("numRowsTotal", 0) for s in st
                    ),
                    "state_mem_bytes": sum(
                        s.get("memoryUsedBytes", 0) for s in st
                    ),
                }
            )
        out[name] = {
            "wall_cold": walls[0],
            "wall_warm": walls[1],
            "batches_warm": batches,
        }
    floor = out["floor_passthrough"]["wall_warm"]
    join_w = out["ss_join"]["wall_warm"]
    out["attribution"] = {
        "harness_floor_s": floor,
        "join_total_s": join_w,
        "operator_cost_s": round(join_w - floor, 3),
        "operator_share": round((join_w - floor) / join_w, 3)
        if join_w
        else None,
    }
    print(json.dumps(out, indent=1, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
