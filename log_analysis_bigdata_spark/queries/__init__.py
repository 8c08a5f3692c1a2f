"""Query registry: every operator from SURVEY §2 (plus the LLM-data-
pipeline operators) exposed as a named (spark_fn, oracle_sql) pair.

``spark_fn(spark, sf_dir) -> DataFrame`` is the engine's DataFrame-first
implementation; ``oracle`` is the ANSI-SQL equivalent DuckDB runs on the
same parquet tables for the driver's correctness gate. Column names and
aliases MUST match pairwise — the driver sorts columns by name before
value-hashing.

Determinism rules applied throughout (so Spark and DuckDB hash-match):
- every ``LIMIT`` is preceded by a total order (unique tiebreaker column);
- money sums are compared as per-item integer cents
  (``CAST(sum(CAST(round(x*100) AS BIGINT)) AS BIGINT)``): integer addition is
  order-independent, so Spark's run-to-run partial-agg order can't flip
  a total that lands on a half-cent boundary (rounding the double TOTAL
  can — 4-decimal products like price·(1−disc) have true cent values at
  exact .5);
- averages/ratios are ``round(x, 4)``;
- epoch math uses floor-to-second semantics on both sides
  (Spark ``cast(ts as long)`` == DuckDB ``CAST(floor(epoch(ts)) AS BIGINT)``);
- array aggregations are sorted with explicit tiebreakers before joining.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QueryDef(name=name, spark=fn, oracle=oracle, tags=tags)
        return fn

    return deco


_LOADED = False

# The correctness driver evaluates only the FIRST 50 registry entries per
# round, so ordering is evidence policy: queries that still need a driver
# verdict go first, already-green ones last (their earlier verdicts stand
# on file). Round-7 window (50 slots), in priority order:
#   (1) the two round-6 late additions — the ONLY catalog entries with
#       no CORRECTNESS row ever (VERDICT r6 task 1);
#   (2) the four new round-7 queries (decoded-pixel PPM stats; the
#       iterative BPE merge trainer and its apply/tokenize half; the
#       cogroup demo's JVM full-outer-join twin);
#   (3) re-verdicts for every query whose CODE CHANGED this round:
#       SemDeDup's corpus-derived cell count, the single-base-hash
#       MinHash rewrite (signatures/pairs/union/pipeline/incremental),
#       the signature-collapsed simhash clustering + the 60-bit
#       adaptive-band simhash rewrite (components AND pairs), the
#       adaptive components solve that dedup_components rides on, the
#       corpus-derived LSH band width behind embedding_near_dup, and
#       udtf_chunk_docs' fixed-name registration (ADVICE r6);
#   (4) the full round-3-latest cohort (the oldest remaining verdicts —
#       all eight rotate forward, none left older than r4);
#   (5) 25 of the 44 round-4-latest, alphabetical. The 19 that don't
#       fit (q4_priority_exists, range_join_hour_activity,
#       rollup_order_status, salted_event_type_stats,
#       scalar_subquery_last_order, session_window_events, setop_*,
#       sliding/tumbling_window_events, stats_agg_events,
#       string_funcs_customer, template_tag_docs, topk_orders_by_price,
#       window_lag_event_gaps, window_time_range_sum,
#       window_topk_orders_per_customer, word_histogram_docs) keep
#       their r4 green rows — untouched code paths, first in line next
#       round. 2 + 4 + 11 + 8 + 25 = 50.
_DRIVER_WINDOW = (
    # (1) never-verdicted round-6 late additions
    "bpe_merge_candidates",
    "hard_negatives_per_query",
    # (2) new round-7 queries
    "multimodal_ppm_pixel_stats",
    "bpe_train_merges",
    "bpe_apply_merges",
    "user_activity_full_join",
    # (3) round-7 code-change re-verdicts
    "semdedup_embedding_cells",
    "dedup_pipeline_docs",
    "incremental_dedup_newbatch",
    "simhash_near_components",
    "simhash_near_pairs",
    "minhash_signatures",
    "minhash_dup_pairs",
    "grouped_minhash_union",
    "dedup_components",
    "embedding_near_dup",
    "udtf_chunk_docs",
    # (4) round-3-latest cohort, rotated in full
    "approx_percentile_value",
    "chunk_documents",
    "constant_columns_detect",
    "grouped_zscore_window",
    "ivf_topk_nprobe",
    "json_extract_events",
    "unpivot_lineitem_metrics",
    "window_running_value",
    # (5) round-4-latest cohort, 25 alphabetical
    "asof_join_events_orders",
    "asof_join_tolerance",
    "bm25_search_docs",
    "cdc_latest_state",
    "cogroup_user_activity",
    "distinct_count_segments",
    "embedding_centroid_drift",
    "ewma_user_value",
    "group_having_active_customers",
    "grouped_zscore_events",
    "join_anti_customers_no_orders",
    "join_left_customer_orders",
    "join_semi_customers_with_orders",
    "kmeans_step_shift",
    "label_histogram_embeddings",
    "latest_record_per_key",
    "ml_score_embeddings",
    "mode_per_event_type",
    "multimodal_asset_stats",
    "multimodal_byte_stats",
    "multimodal_frame_sample",
    "multimodal_resize_plan",
    "per_user_model_fit",
    "per_user_regression_sql",
    "percentile_order_value",
    # Past the 50-slot window: everything else keeps its r5/r6 green
    # verdict; the full local parity sweep for ALL registry entries is
    # committed per round as EVIDENCE_r07.md.
)


def all_queries() -> dict[str, QueryDef]:
    global _LOADED
    if not _LOADED:
        from . import (  # noqa: F401
            corpusq,
            graphq,
            layoutq,
            logq,
            mlq,
            multimodalq,
            pandasq,
            relational,
            servingq,
            streamq,
            textq,
            tpchq,
            vectorq,
        )

        ordered = {
            name: REGISTRY[name] for name in _DRIVER_WINDOW if name in REGISTRY
        }
        for name, qd in REGISTRY.items():
            ordered.setdefault(name, qd)
        REGISTRY.clear()
        REGISTRY.update(ordered)
        _LOADED = True
    return REGISTRY
