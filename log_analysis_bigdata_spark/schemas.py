"""Fixed StructType schemas shared by batch and streaming — the engine
decision from SURVEY §1.3: one declared schema everywhere (the reference
infers CSV schemas, duck-types its Kafka JSON, and type-sniffs HBase
bytes; those three diverge and we unify them).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Parsed log line (SURVEY §1.1 "Parsed log table";
# prepare_data_batch.ipynb:168-177).
PARSED_LOG = T.StructType(
    [
        T.StructField("value", T.StringType()),
        T.StructField("datetime", T.TimestampType()),
        T.StructField("pid", T.IntegerType()),
        T.StructField("level", T.StringType()),
        T.StructField("component", T.StringType()),
        T.StructField("message", T.StringType()),
        T.StructField("block_id", T.StringType()),
    ]
)

# Kafka session message (FIXTURES §7; producer stream_data.py:35,
# README.md:136-145) — the streaming payload.
SESSION_MESSAGE = T.StructType(
    [
        T.StructField("block_id", T.StringType()),
        T.StructField("start_ts", T.TimestampType()),
        T.StructField("end_ts", T.TimestampType()),
        T.StructField("duration_sec", T.LongType()),
        T.StructField("log_full", T.StringType()),
        T.StructField("num_lines", T.IntegerType()),
    ]
)

# Typed serving/detection record (FIXTURES §6; the typed rendering of the
# HBase row written at insert_data_to_HBase.py:28-43).
DETECTION = T.StructType(
    [
        T.StructField("block_id", T.StringType()),
        T.StructField("start_ts", T.TimestampType()),
        T.StructField("end_ts", T.TimestampType()),
        T.StructField("duration_sec", T.LongType()),
        T.StructField("log_full", T.StringType()),
        T.StructField("num_lines", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.IntegerType())),
        T.StructField("prediction", T.IntegerType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("tenant", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)

# Opaque multimodal media record (BASELINE.json north star: multimodal
# columns as binary + typed metadata).
MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)
