"""Windowed streaming aggregations — T5/T6 capability (SURVEY §2.9).

The reference has no in-stream windows (consumer is stateless per
message, kafka_consumer.py:27-40); its only session notion is batch
min/max per BlockId. These are the real streaming renderings: tumbling /
sliding / session windows with an enforced watermark. Each works
identically over a bounded batch DataFrame (used by the oracle-checked
batch twins in queries/streamq.py) and a streaming one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ltz(df: DataFrame, ts_col: str) -> DataFrame:
    """TIMESTAMP_NTZ event time → session-tz TIMESTAMP.

    ``withWatermark`` (and ``window``'s state bookkeeping) require LTZ
    event time; newer testdata parquet carries ``ts`` as NTZ. The cast is
    legal in both batch and streaming plans and value-identity under the
    UTC session the catalog pins.
    """
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    width: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window count/sum per key."""
    df = _ltz(df, ts_col)
    src = df.withWatermark(ts_col, watermark) if watermark and df.isStreaming else df
    return (
        src.groupBy(F.window(ts_col, width).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("w.start").alias("window_start"),
            key_col,
            "n",
            "total",
        )
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Sliding-window global counts."""
    df = _ltz(df, ts_col)
    src = df.withWatermark(ts_col, watermark) if watermark and df.isStreaming else df
    return (
        src.groupBy(F.window(ts_col, width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def session_windows(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based session windows per key (T5's streaming variant).

    Emits min/max event time + count per session, not the padded
    session_window bounds (whose end = last event + gap), so the batch
    twin is plain SQL over lag/cumsum.
    """
    df = _ltz(df, ts_col)
    src = df.withWatermark(ts_col, watermark) if watermark and df.isStreaming else df
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("sw"), F.col(key_col))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(key_col, "session_start", "session_end", "n_events")
    )
