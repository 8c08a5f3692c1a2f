"""Bucketed range (interval) join — the scale-safe rendering of
"join points to intervals" when there is NO equi key.

A plain `l.lo <= r.ts AND r.ts < l.hi` join has no equi condition, so
Spark plans BroadcastNestedLoopJoin — O(|L|·|R|) and a driver-killer the
moment neither side broadcasts. The classic fix: quantize time into
fixed buckets, explode each interval over the buckets it overlaps
(intervals are bounded, so this is a small constant factor), tag each
point with its bucket, equi-join on the bucket, then apply the exact
range predicate as a residual. The join becomes a hash join keyed by
bucket: one shuffle, parallel by time slice, skew bounded by the busiest
bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKET = "_bucket"


def _sec(col: Column) -> Column:
    return col.cast("timestamp").cast("long")


def bucketed_interval_join(
    intervals: DataFrame,
    points: DataFrame,
    lo_col: str,
    hi_col: str,
    ts_col: str,
    bucket_seconds: int = 86_400,
    how: str = "inner",
) -> DataFrame:
    """Join each [lo, hi) interval row to every point row with
    lo <= ts < hi, via bucket equi-join + residual.

    Output: intervals' columns + points' columns. `bucket_seconds`
    should be on the order of the typical interval length — shorter
    buckets mean more interval replication, longer ones mean weaker
    pre-filtering.
    """
    lo_s, hi_s = _sec(F.col(lo_col)), _sec(F.col(hi_col))
    iv = intervals.withColumn(
        BUCKET,
        F.explode(
            F.sequence(
                F.floor(lo_s / bucket_seconds),
                # hi is exclusive: a point at exactly hi never matches,
                # so the last covered bucket is the one holding hi-1s
                F.floor((hi_s - 1) / bucket_seconds),
            )
        ),
    )
    pt = points.withColumn(
        BUCKET + "_r", F.floor(_sec(F.col(ts_col)) / bucket_seconds)
    )
    ts_s = _sec(F.col(ts_col))
    # the range predicate belongs IN the join condition (a residual on
    # the hash join) — as a post-filter it would discard the null rows
    # an outer join is supposed to keep
    cond = (
        (F.col(BUCKET) == F.col(BUCKET + "_r"))
        & (ts_s >= _sec(F.col(lo_col)))
        & (ts_s < _sec(F.col(hi_col)))
    )
    return iv.join(pt, on=cond, how=how).drop(BUCKET, BUCKET + "_r")
