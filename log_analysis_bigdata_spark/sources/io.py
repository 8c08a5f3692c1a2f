"""Connector implementations for SURVEY §2.1.

| Ref | Reference behavior (file:line in /root/reference/) | Here |
|-----|-----------------------------------------------------|------|
| S1  | `spark.read.text` raw HDFS.log (`prepare_data_batch.ipynb` cell 2) | :func:`read_text_logs` |
| S2/S3 | CSV dims, header + inferred schema (`nb` cell 2; `transform.py:32`) | :func:`read_csv_dim` |
| S4  | Kafka consumer, topic/group/offset opts (`kafka_consumer.py:13-25`) | :func:`kafka_source` |
| S5  | Kafka producer, JSON value, acks=all (`kafka_producer.py:10-28`) | :func:`kafka_sink_writer` |
| S6  | HBase keyed upsert (`insert_data_to_HBase.py:11-43`) | streaming.job.upsert_sink |
| S7  | HBase scan (`hbase_client.py:285-298`) | plain read of the serving table |
| S8  | `coalesce(1)` CSV export (`nb` cell 32) | :func:`write_csv_single` |
| S9  | pandas `to_sql` → PostgreSQL (`load_data_to_sql.py:6-17`) | :func:`write_jdbc` |
| S10 | joblib model load (`ML_predict.py:8-13`) | ml.inference.model_scorer_udf (broadcast) |

Scale sink: :func:`write_parquet_partitioned` is what replaces S8 at
100 TB — date-partitioned parquet so downstream scans partition-prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_text_logs(spark: SparkSession, path: str) -> DataFrame:
    """S1: raw log file → DataFrame[value: string], one row per line.

    Splittable text: on a cluster each 128 MB block becomes a task, so a
    100 TB log corpus fans out to ~800k tasks with no driver involvement.
    """
    return spark.read.text(path)


def read_csv_dim(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """S2/S3: dimension CSV with header.

    The reference uses ``inferSchema=True`` (an extra full pass over the
    file); pass an explicit ``schema`` to skip that — mandatory hygiene
    for anything bigger than a dim table.
    """
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def kafka_source_options(
    brokers: str, topic: str, starting_offsets: str = "latest"
) -> dict[str, str]:
    """The exact option set the S4 reader is configured with — exposed
    as data so the wire-contract test can assert it without a broker.

    Mapping to the reference consumer (`kafka_consumer.py:13-25`):
    ``subscribe`` = its TOPIC positional, ``kafka.bootstrap.servers`` =
    ``bootstrap_servers``, ``startingOffsets='latest'`` =
    ``auto_offset_reset='latest'``; group management/auto-commit have no
    analog (Spark tracks offsets in the checkpoint, strictly stronger
    than ``enable_auto_commit``), and ``failOnDataLoss=false`` matches
    its at-least-once posture (it logs and continues on error).
    """
    return {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "false",
    }


def kafka_source(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "latest",
):
    """S4: configured Structured-Streaming Kafka reader (not yet started).

    Mirrors `kafka_consumer.py:13-25` (subscribe + auto_offset_reset).
    Returns the DataStreamReader so callers `.load()` when the connector
    jar + broker exist; in this container that load raises (no
    spark-sql-kafka jar; jar fetch retried round 7, 2026-08-14 — no
    network route to a Maven mirror), which tests assert — the dev
    substitute is the file source in streaming.job.file_stream_source.
    """
    return spark.readStream.format("kafka").options(
        **kafka_source_options(brokers, topic, starting_offsets)
    )


def kafka_payload(df: DataFrame) -> DataFrame:
    """S5's wire payload: each row → one JSON ``value`` string, the
    engine twin of the reference producer's serializer
    (``json.dumps(dict)``, `kafka_producer.py:12`). Split out from the
    writer so the producer→wire→consumer loop is testable broker-free."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("value"))


def kafka_sink_writer(df: DataFrame, brokers: str, topic: str):
    """S5: batch DataFrame → Kafka writer, JSON value per row.

    `to_json(struct(*))` is the reference producer's `json.dumps(dict)`
    (`kafka_producer.py:12`); delivery guarantees (`acks=all`) are broker
    configs passed through the kafka. option namespace.
    """
    return (
        kafka_payload(df).write.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("kafka.acks", "all")
    )


def write_csv_single(df: DataFrame, path: str) -> None:
    """S8: single-file CSV export with header, quoted so multi-line
    strings (the reference's `log_full`) survive the round-trip.

    coalesce(1) funnels through one task — only for small exports, which
    is also all the reference uses it for (`nb` cell 32).
    """
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)
        .option("escape", '"')
        .csv(path)
    )


def write_parquet_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """The scale sink: parquet partitioned by (typically) event date.

    Downstream filters on the partition columns become directory pruning
    (PartitionFilters in the scan node) — at 100 TB a one-day query reads
    ~1/2500th of the files. Pair with AQE coalesce so each partition
    writes a few well-sized files instead of one per shuffle task.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_jdbc(
    df: DataFrame, url: str, table: str, mode: str = "overwrite", **options: str
):
    """S9: JDBC writer (`load_data_to_sql.py:6-17`'s `to_sql`).

    Returns the configured writer so callers can `.save()`. Executed
    end-to-end in tests against the Spark-bundled Derby embedded driver
    (write → read-back → overwrite); the reference's PostgreSQL target
    only needs the postgres jar on the classpath and its `url`/`driver`
    options. numPartitions bounds the connection fan-in a 1000-executor
    write would otherwise open.
    """
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    return writer


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
) -> dict:
    """Small-file compaction — the table-maintenance pass every
    long-running ingest needs: streaming/append jobs leave thousands of
    KB-sized parquet files whose per-file open/footer/task overhead
    eventually dominates scan cost. Rewrite the table into
    ceil(total_bytes / target_file_bytes) files (~HDFS-block-sized by
    default) and swap directories (two renames — see the crash-window
    note inline); data is byte-identical (same rows, new layout).

    Scale notes: the rewrite is one distributed job — a scan +
    coalesce(n_out) write, no shuffle (coalesce narrows; row order
    within files may change, which parquet tables don't guarantee
    anyway). At 100 TB you run this per-PARTITION (date=.../hour=...)
    so each compaction touches only closed partitions, and swap via the
    metastore; the directory swap here is the filesystem-table
    rendering of the same idea. Returns {files_before, files_after,
    bytes_total} for the maintenance log.
    """
    import glob as _glob
    import math
    import os as _os
    import shutil as _shutil
    import uuid as _uuid

    files = [
        f
        for f in _glob.glob(_os.path.join(path, "**", "*.parquet"),
                            recursive=True)
        if _os.path.isfile(f)
    ]
    n_before = len(files)
    total = sum(_os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total / target_file_bytes))

    tmp = f"{path.rstrip('/')}__compact_{_uuid.uuid4().hex[:10]}"
    # hive-partitioned tables must be rewritten WITH partitionBy or the
    # key=value directory layout (and its partition pruning) is lost —
    # the partition keys would silently become plain data columns.
    # Detect the layout from the key=value directory names and REJECT a
    # call whose partition_by doesn't cover it (ADVICE r6) — the
    # flattening is otherwise only visible later as lost pruning.
    discovered = sorted(
        {
            seg.split("=", 1)[0]
            for f in files
            for seg in _os.path.relpath(f, path).split(_os.sep)[:-1]
            if "=" in seg
        }
    )
    missing = [c for c in discovered if c not in (partition_by or [])]
    if missing:
        raise ValueError(
            f"compact_parquet: {path} is hive-partitioned by {discovered} "
            f"but partition_by={list(partition_by or [])} omits {missing}; "
            "compacting without them would flatten the partition columns "
            "into data files and silently lose partition pruning"
        )
    try:
        writer = (
            spark.read.parquet(path).coalesce(n_out).write.mode("overwrite")
        )
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
    except BaseException:
        _shutil.rmtree(tmp, ignore_errors=True)  # no half-written leak
        raise
    # Swap = two renames, not atomic: a crash between them leaves the
    # table absent and the data at __old_<uuid> (recoverable by hand;
    # the restore below covers in-process failure of the second rename).
    # A metastore-backed table would swap pointers instead — this is
    # the plain-filesystem rendering.
    old = f"{path.rstrip('/')}__old_{_uuid.uuid4().hex[:10]}"
    _os.rename(path, old)
    try:
        _os.rename(tmp, path)
    except BaseException:
        _os.rename(old, path)  # restore the original table
        _shutil.rmtree(tmp, ignore_errors=True)
        raise
    _shutil.rmtree(old)

    n_after = len(
        [
            f
            for f in _glob.glob(
                _os.path.join(path, "**", "*.parquet"), recursive=True
            )
            if _os.path.isfile(f)
        ]
    )
    return {
        "files_before": n_before,
        "files_after": n_after,
        "bytes_total": total,
    }
