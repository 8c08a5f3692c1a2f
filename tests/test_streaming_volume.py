"""Streaming at volume (VERDICT r8 task 6): an sf0.1-sized replay —
100,000 messages in 10 event-time-ordered files — through the REAL
speed-layer harness (run_file_stream: watermarked source-side dedup →
shared batch transform → score → keyed last-write-wins upsert), with
each file its own micro-batch, plus the applyInPandasWithState session
operator over the same volume.

Asserted, not just survived:
- the dedup state store stays bounded at O(keys-per-horizon): its row
  count plateaus around the ~3-horizon key window and does NOT grow
  with stream length (late batches add ~10k keys each; state doesn't);
- byte-identical replays of the previous file are dropped while
  same-key UPDATES flow through and replace (last-write-wins);
- the final upsert table is row-identical to the batch twin (batch
  dedup + newest-payload-per-key + the same feature/score transform);
- session state is O(distinct keys) with O(1) per-key size: replayed
  lines update state rows, never add them.
"""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from log_analysis_bigdata_spark.schemas import SESSION_MESSAGE
from log_analysis_bigdata_spark.streaming.job import (
    dedup_messages,
    message_features,
    run_file_stream,
    score_expr,
)

TEMPLATES = [
    ("E1", "Receiving block[*]src:[*]"),
    ("E2", "PacketResponder[*]terminating"),
]
EVENT_IDS = ["E1", "E2"]

N_FILES = 10
MSGS_PER_FILE = 10_000
N_REPLAYS = 500  # per file f>=1: byte-identical copies from file f-1
N_UPDATES = 1_000  # in the last file: new payload for file-0 keys
BASE = dt.datetime(2008, 11, 9, 12, 0, 0)
HORIZON = "10 minutes"


def _n1(f: int, i: int) -> int:
    return (f + i) % 3 + 1


def _msg(f: int, i: int, n1: int | None = None) -> dict:
    ts = BASE + dt.timedelta(minutes=10 * f, seconds=i % 600)
    n1 = _n1(f, i) if n1 is None else n1
    n2 = i % 2
    lines = [
        f"081109 120000 143 INFO dfs.DataNode$DataXceiver: Receiving "
        f"block blk_{f}_{i} src: /10.0.0.{j} dest: /10.0.0.9"
        for j in range(n1)
    ] + [
        f"081109 120001 145 INFO dfs.DataNode$PacketResponder: "
        f"PacketResponder {j} for block blk_{f}_{i} terminating"
        for j in range(n2)
    ]
    tss = ts.strftime("%Y-%m-%d %H:%M:%S")
    return {
        "block_id": f"blk_{f}_{i}",
        "start_ts": tss,
        "end_ts": tss,
        "duration_sec": 0,
        "log_full": "\n".join(lines),
        "num_lines": len(lines),
    }


def _update_msg(i: int) -> dict:
    # same key as file-0 message i, NEW payload, event time in file 9's
    # window (update must replace, not be dropped as a replay)
    m = _msg(0, i, n1=5)
    ts = BASE + dt.timedelta(minutes=10 * (N_FILES - 1), seconds=i % 600)
    m["start_ts"] = m["end_ts"] = ts.strftime("%Y-%m-%d %H:%M:%S")
    return m


def _write_volume(src: str) -> int:
    os.makedirs(src, exist_ok=True)
    total = 0
    for f in range(N_FILES):
        with open(os.path.join(src, f"file_{f:02d}.json"), "w") as fh:
            for i in range(MSGS_PER_FILE):
                fh.write(json.dumps(_msg(f, i)) + "\n")
                total += 1
            if f >= 1:  # byte-identical replays of the previous file
                for i in range(N_REPLAYS):
                    fh.write(json.dumps(_msg(f - 1, i)) + "\n")
                    total += 1
            if f == N_FILES - 1:  # updates: file-0 keys, new payload
                for i in range(N_UPDATES):
                    fh.write(json.dumps(_update_msg(i)) + "\n")
                    total += 1
    return total


def test_volume_replay_state_bounded_and_batch_twin(spark, tmp_path):
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "detections")
    ckpt = str(tmp_path / "ckpt")
    total = _write_volume(src)
    assert total >= 100_000

    q = run_file_stream(
        spark,
        src,
        tgt,
        ckpt,
        TEMPLATES,
        EVENT_IDS,
        weights={"E1": 0.9, "E2": 0.5},
        bias=-1.0,
        watermark=HORIZON,
        source_options={"maxFilesPerTrigger": "1"},
    )
    q.awaitTermination(600)
    progress = [json.loads(p.json) for p in q.recentProgress]

    # --- state-store bound: rows track the watermark horizon window,
    # not stream length ---------------------------------------------------
    def dedup_op(p):
        for op in p.get("stateOperators", []):
            if op.get("operatorName") == "dedupeWithinWatermark":
                return op
        return None

    state_all = [
        dedup_op(p)["numRowsTotal"] for p in progress if dedup_op(p)
    ]
    state_input = [
        dedup_op(p)["numRowsTotal"]
        for p in progress
        if dedup_op(p) and p.get("numInputRows", 0) > 0
    ]
    assert len(state_input) >= N_FILES
    n_unique = N_FILES * MSGS_PER_FILE  # replays/updates reuse keys
    # measured: state plateaus at 60-62k entries (Spark stores ~2
    # entries per live key: dedup row + event-time index) covering the
    # ~3-horizon live window of ~30k keys — far below the 100k unique
    # keys the stream carries; an unbounded dropDuplicates would hold
    # 200k+ entries by the final batch
    assert max(state_all) <= 70_000, (
        f"dedup state grew to {max(state_all)} — not horizon-bounded"
    )
    # plateau: the last 4 input batches added ~40k new keys; state moved
    # by a fraction of that (measured +2k)
    grew = state_input[-1] - state_input[-5]
    assert grew <= 8_000, f"state still growing linearly (+{grew} over 4 batches)"
    # eviction is real: the availableNow trailing batch shrinks the store
    assert state_all[-1] < max(state_all)
    # replays were dropped AT THE SOURCE (before parse/feature/score),
    # not merely squashed by the idempotent sink
    n_dropped = sum(
        int(dedup_op(p)["customMetrics"].get("numDroppedDuplicateRows", 0))
        for p in progress
        if dedup_op(p)
    )
    assert n_dropped >= (N_FILES - 1) * N_REPLAYS

    # --- convergence to the batch twin -----------------------------------
    raw = spark.read.schema(SESSION_MESSAGE).json(src)
    batch = dedup_messages(
        raw.withColumn("_md5", F.md5(F.coalesce("log_full", F.lit("")))),
        "block_id",
        "start_ts",
        HORIZON,
        content_cols=["_md5"],
    )
    # newest payload per key wins (the upsert sink's semantics)
    newest = (
        batch.withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy("block_id").orderBy(F.desc("start_ts"))
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_md5")
    )
    twin = message_features(newest, TEMPLATES, EVENT_IDS).withColumn(
        "prediction",
        (
            score_expr(EVENT_IDS, {"E1": 0.9, "E2": 0.5}, -1.0) >= 0.83
        ).cast("int"),
    )
    got = spark.read.parquet(tgt).select(
        "block_id", *EVENT_IDS, "prediction"
    )
    assert got.count() == n_unique
    cols = ["block_id", *EVENT_IDS, "prediction"]
    diff = got.select(cols).exceptAll(twin.select(cols))
    assert diff.count() == 0, diff.limit(5).collect()

    # --- updates replaced, replays did not duplicate ----------------------
    updated = got.filter(
        F.col("block_id").isin([f"blk_0_{i}" for i in range(0, 50)])
    ).collect()
    assert all(r["E1"] == 5 for r in updated)  # new payload won


def test_volume_stateful_sessions_state_is_per_key(spark, tmp_path):
    """100k+ lines through the applyInPandasWithState session operator:
    state rows == distinct keys (O(1) per key), and a second replay of
    the same keys UPDATES those rows without adding any."""
    from log_analysis_bigdata_spark.streaming.stateful import (
        running_block_sessions,
    )

    src = str(tmp_path / "lines")
    os.makedirs(src)
    n_keys = 20_000
    lines_per_key = 3

    def write(fname, offset_s):
        with open(os.path.join(src, fname), "w") as fh:
            for i in range(n_keys):
                for j in range(lines_per_key):
                    ts = BASE + dt.timedelta(seconds=offset_s + j)
                    fh.write(
                        json.dumps(
                            {
                                "block_id": f"blk_{i}",
                                "event_ts": ts.strftime(
                                    "%Y-%m-%d %H:%M:%S"
                                ),
                            }
                        )
                        + "\n"
                    )

    write("b0.json", 0)
    write("b1.json", 600)  # same keys again — must UPDATE, not add

    raw = (
        spark.readStream.schema("block_id string, event_ts string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .select("block_id", F.to_timestamp("event_ts").alias("datetime"))
    )
    q = (
        running_block_sessions(raw)
        .writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    progress = [json.loads(p.json) for p in q.recentProgress]
    state_rows = [
        op["numRowsTotal"]
        for p in progress
        for op in p.get("stateOperators", [])
        if p.get("numInputRows", 0) > 0
    ]
    assert state_rows, "no state metrics captured"
    # 120k lines, 2 batches — state is exactly the key count both times
    assert state_rows[-1] == n_keys
    assert max(state_rows) == n_keys
