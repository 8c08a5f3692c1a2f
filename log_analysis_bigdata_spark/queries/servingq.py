"""Serving-layer query shapes — SURVEY §2.10 Q1-Q7 re-expressed as
DataFrame programs with full predicate pushdown (the reference evaluates
time-range / threshold / keyword predicates client-side after transferring
rows from HBase; here Catalyst pushes them into the parquet scan).

The ``events`` table stands in for the serving ``detections`` table:
``ts`` ≈ ts_ms ordering key, ``value`` ≈ score, ``event_type`` ≈ tenant,
``props``/``user_id`` ≈ payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register


@register(
    "serving_latest_n",
    oracle="""
    SELECT event_id, ts, user_id, event_type
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 100
    """,
    tags=("serving", "Q1", "W4"),
)
def serving_latest_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: latest-N — orderBy(desc).limit(n) = TakeOrderedAndProject,
    replacing the reference's inverted-rowkey gymnastics
    (hbase_client.py:89-99) and over-scan heuristics (:285-302)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_id", "ts", "user_id", "event_type")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(100)
    )


@register(
    "serving_by_key",
    oracle="""
    SELECT event_id, ts, user_id, value
    FROM events
    WHERE event_type = 'purchase' AND user_id = 7
    ORDER BY ts DESC, event_id DESC
    LIMIT 50
    """,
    tags=("serving", "Q2"),
)
def serving_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: composite-key lookup (tenant/host/path ≈ event_type/user_id)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") == 7))
        .select("event_id", "ts", "user_id", "value")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(50)
    )


@register(
    "serving_time_range",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00'
                 AND TIMESTAMP '2024-01-12 00:00:00'
    """,
    tags=("serving", "Q3", "P7"),
)
def serving_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3/P7: time-range predicate, pushed to the scan (the reference
    filters post-transfer, hbase_client.py:387)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        F.col("ts").between("2024-01-10 00:00:00", "2024-01-12 00:00:00")
    ).select("event_id", "ts", "user_id", "event_type", "value")


@register(
    "serving_high_score",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    WHERE value >= 400.0
    """,
    tags=("serving", "Q4", "P8"),
)
def serving_high_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4/P8: threshold predicate (reference default 0.2 on score;
    scaled to this table's value domain)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("value") >= 400.0).select("event_id", "user_id", "value")


@register(
    "serving_stats",
    oracle="""
    SELECT count(*) AS n_total,
           count(DISTINCT user_id) AS n_users,
           count(DISTINCT event_type) AS n_types,
           round(avg(value), 4) AS avg_value,
           CAST(sum(CASE WHEN value >= 100.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_high
    FROM events
    """,
    tags=("serving", "Q5", "A12"),
)
def serving_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5/A12: global stats in ONE aggregate pass (the reference's
    hbase_client.py:556-613 full-scan python loop)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.sum(F.when(F.col("value") >= 100.0, 1).otherwise(0))
        .cast("long")
        .alias("n_high"),
    )


@register(
    "serving_delete",
    oracle="""
    SELECT count(*) AS n_remaining
    FROM events e
    WHERE NOT EXISTS (
      SELECT 1 FROM events d
      WHERE d.event_type = 'error' AND d.value < 50.0
        AND d.event_id = e.event_id)
    """,
    tags=("serving", "Q6"),
)
def serving_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: point/batch delete as an anti-join rewrite of the serving table
    (no Delta in this image; MERGE/DELETE emulated relationally)."""
    ev = load_table(spark, sf_dir, "events")
    doomed = ev.filter(
        (F.col("event_type") == "error") & (F.col("value") < 50.0)
    ).select("event_id")
    return (
        ev.join(doomed, "event_id", "left_anti").agg(
            F.count(F.lit(1)).alias("n_remaining")
        )
    )


@register(
    "serving_compound_filter",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE event_type IN ('error', 'signup')
      AND value >= 50.0
      AND ts BETWEEN TIMESTAMP '2024-01-05 00:00:00'
                 AND TIMESTAMP '2024-01-25 00:00:00'
    """,
    tags=("serving", "Q7", "P5", "P7", "P8"),
)
def serving_compound_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: the dashboard's client-side compound filter (dashboard.js:146-191)
    as one conjunctive predicate, fully pushed down."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        F.col("event_type").isin("error", "signup")
        & (F.col("value") >= 50.0)
        & F.col("ts").between("2024-01-05 00:00:00", "2024-01-25 00:00:00")
    ).select("event_id", "ts", "user_id", "event_type", "value")
