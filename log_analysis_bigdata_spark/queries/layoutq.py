"""Data-layout and incremental-maintenance operators — the table-
management half of running an analytics engine at 100 TB: multi-
dimensional clustering (Z-order) for file skipping, and algebraic
partial-aggregate merge for O(batch) metric maintenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register

Z_BITS = 16  # bits interleaved per dimension → 32-bit z-value
Z_BUCKET_SHIFT = 12  # z-bits above 12 → one bucket per 64x64 (user,hour) tile


def _z_interleave_sql(a: str, b: str) -> str:
    """Bit-interleave two Z_BITS-wide bigints: a's bit j lands at 2j,
    b's at 2j+1. Plain integer arithmetic — identical in Spark SQL and
    DuckDB (both support >>, &, * on bigints)."""
    terms = []
    for j in range(Z_BITS):
        terms.append(f"((({a} >> {j}) & 1) * {1 << (2 * j)})")
        terms.append(f"((({b} >> {j}) & 1) * {1 << (2 * j + 1)})")
    return "(" + " + ".join(terms) + ")"


@register(
    "zorder_locality_events",
    oracle=f"""
    WITH d AS (
      SELECT user_id & {(1 << Z_BITS) - 1} AS u,
             (CAST(floor(epoch(ts)) AS BIGINT) // 3600)
               & {(1 << Z_BITS) - 1} AS h
      FROM events
    ),
    z AS (SELECT u, h, {_z_interleave_sql("u", "h")} AS zval FROM d)
    SELECT zval >> {Z_BUCKET_SHIFT} AS z_bucket,
           count(*) AS n,
           min(u) AS min_user, max(u) AS max_user,
           min(h) AS min_hour, max(h) AS max_hour
    FROM z GROUP BY 1
    """,
    tags=("layout", "zorder", "clustering", "file-skipping"),
)
def zorder_locality_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (user_id, event-hour) and
    the per-bucket min/max envelope it produces — the layout operator
    behind multi-dimensional file skipping: write the table
    ``repartitionByRange(zval)`` + sorted and every parquet file carries
    a TIGHT min/max range on BOTH dimensions, so a predicate on either
    user or time prunes files (a single-column sort gives tight stats on
    one dimension only). The output is the proof: each z-bucket covers
    one 64x64 tile of the (user, hour) grid — a tight min/max envelope
    on BOTH columns, never the full range. Pure bigint bit-arithmetic
    (interleave via shift/mask ×16 per dimension) — narrow,
    codegen-friendly, and bit-identical to the DuckDB twin; the only
    shuffle is the bucket rollup.
    """
    ev = load_table(spark, sf_dir, "events")
    mask = (1 << Z_BITS) - 1
    d = ev.select(
        (F.col("user_id").bitwiseAND(mask)).alias("u"),
        F.expr(f"(cast(ts as long) div 3600) & {mask}").alias("h"),
    )
    z = d.select(
        "u", "h", F.expr(_z_interleave_sql("u", "h")).alias("zval")
    )
    return (
        z.select(
            F.shiftright("zval", Z_BUCKET_SHIFT).alias("z_bucket"), "u", "h"
        )
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("u").alias("min_user"),
            F.max("u").alias("max_user"),
            F.min("h").alias("min_hour"),
            F.max("h").alias("max_hour"),
        )
    )


@register(
    "incremental_agg_merge_events",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM events
    GROUP BY user_id
    """,
    tags=("maintenance", "incremental", "mergeable-aggregate"),
)
def incremental_agg_merge_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental aggregate maintenance: the stored per-user metrics
    table is NOT recomputed when a batch arrives — the batch's partial
    aggregate (same commutative-monoid state: count + integer-cents sum)
    is merged into the stored partials by addition. Here the events
    table is split deterministically (event_id % 5 == 0 plays the new
    batch), the "stored" side is materialized first (localCheckpoint —
    the stand-in for reading the persisted metrics table), and the merge
    is a union + second-stage sum. The oracle recomputes from scratch:
    merge-equals-recompute is exactly the algebraic property that makes
    the maintenance valid. At 100 TB this is the difference between
    O(batch) and O(history) per update; it works because every metric
    here is a mergeable monoid (counts, integer sums — averages would be
    carried as (sum, n) pairs, never as finished ratios).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )

    stored = partial(ev.filter(F.col("event_id") % 5 != 0)).localCheckpoint(
        eager=True
    )
    batch = partial(ev.filter(F.col("event_id") % 5 == 0))
    return (
        stored.unionByName(batch)
        .groupBy("user_id")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("total_cents").cast("bigint").alias("total_cents"),
        )
    )
