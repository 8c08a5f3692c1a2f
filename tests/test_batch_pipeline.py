"""End-to-end batch-pipeline parity: the notebook EP1 flow (SURVEY §3)
on HDFS-shaped raw log text with hand-computed golden outputs.

raw text → P1 parse → F4 timestamps → template tagging (first-match) →
A1 traces → A2 feature counts → A3/A4 sessionization → J2 label join —
the full `prepare_data_batch.ipynb` cells 2-10 + 26-30 pipeline, with
every intermediate checked (the committed notebook cell outputs are the
reference's de-facto goldens; ours are computed from the same fixture).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from log_analysis_bigdata_spark.functions.logparse import parse_log_lines
from log_analysis_bigdata_spark.functions.templates import tag_events
from log_analysis_bigdata_spark.operators.features import (
    event_traces,
    feature_counts_hof,
    feature_counts_pivot,
)
from log_analysis_bigdata_spark.operators.sessionize import (
    label_sessions,
    sessionize,
)

TEMPLATES = [
    ("E1", "Receiving block[*]src:[*]dest:[*]"),
    ("E2", "PacketResponder[*]for block[*]terminating"),
    ("E3", "Received block[*]of size[*]from[*]"),
]

# yyMMdd HHmmss raw format (the real HDFS_v1 shape); blk_2 spans 75 sec.
RAW = [
    "081109 203518 143 INFO dfs.DataNode$DataXceiver: Receiving block blk_1 src: /10.0.0.1 dest: /10.0.0.9",
    "081109 203519 145 INFO dfs.DataNode$PacketResponder: PacketResponder 1 for block blk_1 terminating",
    "081109 203520 145 INFO dfs.DataNode$DataXceiver: Received block blk_1 of size 91178 from /10.0.0.1",
    "081109 203600 150 INFO dfs.DataNode$DataXceiver: Receiving block blk_2 src: /10.0.0.2 dest: /10.0.0.8",
    "081109 203715 151 INFO dfs.DataNode$PacketResponder: PacketResponder 0 for block blk_2 terminating",
    "081109 203530 999 WARN dfs.FSNamesystem: unmatched line for blk_1",
]

LABELS = [("blk_1", "Normal"), ("blk_2", "Anomaly")]


def _parsed(spark):
    raw = spark.createDataFrame([(l,) for l in RAW], ["value"])
    return parse_log_lines(raw).withColumn(
        "block_id", F.regexp_extract("value", r"(blk_[\-0-9]+)", 1)
    )


def test_parse_stage(spark):
    rows = {r["value"]: r for r in _parsed(spark).collect()}
    r0 = rows[RAW[0]]
    assert str(r0["datetime"]) == "2008-11-09 20:35:18"
    assert r0["pid"] == 143 and r0["level"] == "INFO"
    assert r0["component"].startswith("dfs.DataNode")
    assert r0["block_id"] == "blk_1"
    assert rows[RAW[5]]["level"] == "WARN"


def test_template_and_traces_stage(spark):
    tagged = tag_events(_parsed(spark), TEMPLATES, message_col="message")
    traces = {
        r["block_id"]: r["event_seq"]
        for r in event_traces(
            tagged.filter(F.col("event_id").isNotNull()),
            "block_id", "datetime", "event_id",
        ).collect()
    }
    # chronological order within block, unmatched line excluded (P3)
    assert traces == {"blk_1": ["E1", "E2", "E3"], "blk_2": ["E1", "E2"]}


def test_feature_counts_both_variants_agree(spark):
    tagged = tag_events(_parsed(spark), TEMPLATES, message_col="message")
    matched = tagged.filter(F.col("event_id").isNotNull())
    pivot = feature_counts_pivot(
        matched, "block_id", "event_id", [t[0] for t in TEMPLATES]
    )
    traces = event_traces(matched, "block_id", "datetime", "event_id")
    hof = feature_counts_hof(
        traces, "block_id", "event_seq", [t[0] for t in TEMPLATES]
    )
    p = {r["block_id"]: (r["E1"], r["E2"], r["E3"]) for r in pivot.collect()}
    h = {r["block_id"]: (r["E1"], r["E2"], r["E3"]) for r in hof.collect()}
    assert p == h == {"blk_1": (1, 1, 1), "blk_2": (1, 1, 0)}


def test_session_and_label_stage(spark):
    parsed = _parsed(spark).filter(F.col("block_id") != "")
    sessions = sessionize(parsed, "block_id", "datetime", line_col="value")
    labels = spark.createDataFrame(LABELS, ["block_id", "label"])
    out = {r["block_id"]: r.asDict()
           for r in label_sessions(sessions, labels, "block_id").collect()}

    b2 = out["blk_2"]
    assert str(b2["start_ts"]) == "2008-11-09 20:36:00"
    assert str(b2["end_ts"]) == "2008-11-09 20:37:15"
    assert b2["duration_sec"] == 75  # epoch-cast subtraction, cell 29
    assert b2["num_lines"] == 2
    assert b2["label"] == "Anomaly"

    b1 = out["blk_1"]
    assert b1["num_lines"] == 4  # includes the unmatched WARN line
    assert b1["label"] == "Normal"
    # log_full is chronologically ordered original lines joined by \n
    lines = b1["log_full"].split("\n")
    assert lines == [RAW[0], RAW[1], RAW[2], RAW[5]]
