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
# on file; tests/test_driver_session.py CI-enforces the rotation —
# no latest verdict may age past 4 rounds). Round-10 window (50 slots):
#   (1) the full round-6-latest cohort — all 14, the oldest verdicts
#       left in the chain (VERDICT r9 task 3);
#   (2) the six queries REGISTERED this round, never verdicted:
#       dedup_survivors_by_quality, multimodal_bmp_pixel_stats,
#       multimodal_gif_pixel_stats (from-scratch LZW decode),
#       ivfpq_topk (product-quantized ANN),
#       repeated_ngram_spans (span-level boilerplate dedup), and
#       the consolidated setops_nations;
#   (3) re-verdicts for the two queries whose CODE changed this round:
#       heavy_hitters_topk (NULL-keyed sketch-arm fix + certified
#       result built from the collected top-10, ADVICE r9) and
#       ml_lr_train_confusion (setSummary guarded behind try/except);
#   (4) 28 of the 49 round-7-latest, alphabetical
#       (approx_percentile_value .. json_extract_events). The 21
#       that do not fit (kmeans_step_shift,
#       label_histogram_embeddings,
#       latest_record_per_key,
#       minhash_dup_pairs, minhash_signatures,
#       ml_score_embeddings,
#       mode_per_event_type, the five multimodal_* r7 entries,
#       per_user_model_fit, per_user_regression_sql,
#       percentile_order_value, simhash_near_components,
#       simhash_near_pairs, udtf_chunk_docs, unpivot_lineitem_metrics,
#       user_activity_full_join, window_running_value) keep their r7
#       green rows at age 3 — they MUST head the r11 window (cap 4).
#       14 + 6 + 2 + 28 = 50.
_DRIVER_WINDOW = (
    # (1) round-6-latest cohort, rotated in full
    "quality_decile_stats",
    "repetition_metrics_docs",
    "reservoir_sample_docs",
    "sequence_pack_docs",
    "serving_compound_filter",
    "serving_latest_n",
    "serving_stats",
    "skew_report_events",
    "stratified_sample_docs",
    "stream_static_enrich_segments",
    "stream_stream_join_attribution",
    "tfidf_top_terms",
    "unigram_logprob_docs",
    "zorder_locality_events",
    # (2) new registrations this round (never verdicted) — including
    # the consolidated setops_nations (replaces the setop trio whose
    # three r8-green entries left the registry, task 5)
    "dedup_survivors_by_quality",
    "ivfpq_topk",
    "multimodal_bmp_pixel_stats",
    "multimodal_gif_pixel_stats",
    "repeated_ngram_spans",
    "setops_nations",
    # (3) round-10 code-change re-verdicts
    "heavy_hitters_topk",
    "ml_lr_train_confusion",
    # (4) round-7-latest cohort, 28 alphabetical
    "approx_percentile_value",
    "asof_join_events_orders",
    "asof_join_tolerance",
    "bm25_search_docs",
    "bpe_apply_merges",
    "bpe_merge_candidates",
    "bpe_train_merges",
    "cdc_latest_state",
    "chunk_documents",
    "cogroup_user_activity",
    "constant_columns_detect",
    "dedup_components",
    "dedup_pipeline_docs",
    "distinct_count_segments",
    "embedding_centroid_drift",
    "embedding_near_dup",
    "ewma_user_value",
    "group_having_active_customers",
    "grouped_minhash_union",
    "grouped_zscore_events",
    "grouped_zscore_window",
    "hard_negatives_per_query",
    "incremental_dedup_newbatch",
    "ivf_topk_nprobe",
    "join_anti_customers_no_orders",
    "join_left_customer_orders",
    "join_semi_customers_with_orders",
    "json_extract_events",
    # Past the 50-slot window: everything else keeps its r7–r9 green
    # verdict; the full local parity sweep for ALL registry entries is
    # committed per round as EVIDENCE_r10.md.
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

        # a typo in the hand-rotated window must be LOUD, not a silent
        # slot giveaway to an arbitrary already-green entry (code-review
        # r9): every window name must resolve, and exactly 50 must lead
        unknown = set(_DRIVER_WINDOW) - set(REGISTRY)
        if unknown:  # real raise, not assert: must survive python -O
            raise ValueError(f"_DRIVER_WINDOW names not in registry: {unknown}")
        if not (len(set(_DRIVER_WINDOW)) == len(_DRIVER_WINDOW) == 50):
            raise ValueError("driver window must hold exactly 50 distinct names")
        ordered = {name: REGISTRY[name] for name in _DRIVER_WINDOW}
        for name, qd in REGISTRY.items():
            ordered.setdefault(name, qd)
        REGISTRY.clear()
        REGISTRY.update(ordered)
        _LOADED = True
    return REGISTRY
