"""Multimodal catalog queries: binary payload plumbing through
mapInPandas, oracle-checked wherever the result is SQL-recomputable.

The byte-level feature values (mean_byte, n_distinct_bytes) are not
expressible in DuckDB SQL over BLOBs, so the oracle-checked projections
stick to sizes/counts — the full feature columns are asserted against
numpy in tests/test_multimodal.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal.assets import (
    asset_table,
    byte_stats,
    frame_sample,
    resize_plan,
)
from . import register

_MEDIA_SQL = "list_value('image','audio','video')[(doc_id % 3) + 1]"


@register(
    "multimodal_asset_stats",
    oracle=f"""
    SELECT {_MEDIA_SQL} AS media_type,
           count(*) AS n_assets,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           round(avg(octet_length(encode(text))), 4) AS avg_bytes,
           CAST(max(octet_length(encode(text)) // 8) AS INTEGER)
             AS max_duration_ms
    FROM documents
    GROUP BY 1
    """,
    tags=("multimodal", "binary", "agg"),
)
def multimodal_asset_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata aggregate over the binary asset table — the
    partition-stats query an ingest pipeline runs before decode."""
    assets = asset_table(spark, sf_dir)
    return assets.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.round(F.avg("n_bytes"), 4).alias("avg_bytes"),
        F.max("duration_ms").cast("int").alias("max_duration_ms"),
    )


@register(
    "multimodal_byte_stats",
    oracle=f"""
    SELECT doc_id AS asset_id,
           {_MEDIA_SQL} AS media_type,
           octet_length(encode(text)) AS n_bytes
    FROM documents
    """,
    tags=("multimodal", "binary", "mapInPandas"),
)
def multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-feature extraction through mapInPandas, projected to the
    oracle-recomputable columns (full features covered in unit tests)."""
    return byte_stats(asset_table(spark, sf_dir)).select(
        "asset_id", "media_type", "n_bytes"
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH v AS (
      SELECT doc_id AS asset_id, octet_length(encode(text)) AS n
      FROM documents
      WHERE doc_id % 3 = 2 AND octet_length(encode(text)) > 0
    )
    SELECT asset_id,
           CAST((n + 255) // 256 AS INTEGER) AS n_frames,
           CAST(n AS BIGINT) AS total_frame_bytes,
           CAST(n - 256 * ((n + 255) // 256 - 1) AS INTEGER) AS last_frame_len
    FROM v
    """,
    tags=("multimodal", "video", "mapInPandas", "explode"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (1→N row explosion in mapInPandas) rolled back up
    per asset so the oracle can recompute frame counts from sizes."""
    frames = frame_sample(asset_table(spark, sf_dir), stride=256)
    return frames.groupBy("asset_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_frames"),
        F.sum("frame_len").cast("bigint").alias("total_frame_bytes"),
        F.max_by("frame_len", "frame_idx").cast("int").alias("last_frame_len"),
    )


@register(
    "multimodal_resize_plan",
    oracle="""
    SELECT doc_id AS asset_id,
           CAST(16 + doc_id % 64 AS INTEGER) AS width,
           CAST(16 + doc_id % 48 AS INTEGER) AS height,
           round(224.0 / least(16 + doc_id % 64, 16 + doc_id % 48), 4) AS scale
    FROM documents
    """,
    tags=("multimodal", "resize", "scalar"),
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize parameters — pure column arithmetic."""
    return resize_plan(asset_table(spark, sf_dir), target=224).select(
        "asset_id", "width", "height", "scale"
    )
