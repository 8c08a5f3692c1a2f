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
# no latest verdict may age past 4 rounds). Round-15 window (50 slots),
# per VERDICT r14 task 1:
#   (1) the 35 round-10-latest entries at the age cap (the exact list
#       the r14 rotation guard printed), registry order;
#   (2) re-verdicts for queries whose CODE changed this round —
#       (6 total incl. pagerank_supplier_graph: edge build now dedups
#       the undirected pair set BEFORE mirroring — the doubled
#       distinct OOM'd the sf10 probe graph on an 8 GiB heap; edge
#       set and values identical by construction) —
#       embedding_covariance_topk (int64 matmul now chunked to
#       COV_ROWS_PER_MATMUL rows with an exact rows·m² < 2⁶² guard,
#       ADVICE r14 — values identical by construction, re-verdicted
#       out of caution) and the IVF-PQ family ivfpq_topk /
#       ivfpq_knn_join / ivfpq_index_append (candidate-scan bounding
#       for the sf10 decade-ratio, VERDICT r14 task 3), plus
#       semdedup_embedding_cells (assignment argmin moved to an
#       Arrow-batched BLAS matmul — k grows with N, so the per-row
#       interpreted fold was the probe's worst ratio; identical
#       argmin rule, no-exact-ties);
#   (3) queries REGISTERED this round, never verdicted —
#       multimodal_wav_pcm_stats (from-scratch RIFF/PCM audio decode,
#       VERDICT r14 task 4), attribution_revenue_touch (first/
#       last-touch revenue attribution, VERDICT r14 task 5), and
#       multimodal_avi_frame_stats (RIFF/AVI video decode — the
#       multimodal triad's third modality);
#   (4) 5 of the 44 round-11-latest (age cap at r16), alphabetical —
#       pre-rotating them lightens the forced r16 head to 39.
#       35 + 7 + 3 + 5 = 50.
_DRIVER_WINDOW = (
    # (1) round-10-latest cohort at the age cap — all 35
    "repetition_metrics_docs",
    "sequence_pack_docs",
    "chunk_documents",
    "tfidf_top_terms",
    "unigram_logprob_docs",
    "stratified_sample_docs",
    "quality_decile_stats",
    "grouped_minhash_union",
    "reservoir_sample_docs",
    "dedup_survivors_by_quality",
    "zorder_locality_events",
    "ml_lr_train_confusion",
    "constant_columns_detect",
    "multimodal_bmp_pixel_stats",
    "multimodal_gif_pixel_stats",
    "grouped_zscore_events",
    "grouped_zscore_window",
    "cogroup_user_activity",
    "group_having_active_customers",
    "distinct_count_segments",
    "join_left_customer_orders",
    "join_anti_customers_no_orders",
    "join_semi_customers_with_orders",
    "setops_nations",
    "json_extract_events",
    "skew_report_events",
    "ewma_user_value",
    "serving_latest_n",
    "serving_stats",
    "serving_compound_filter",
    "stream_stream_join_attribution",
    "stream_static_enrich_segments",
    "ivf_topk_nprobe",
    "embedding_centroid_drift",
    "hard_negatives_per_query",
    # (2) round-15 code-change re-verdicts (ivf_topk joined late in the
    # round when the in-row assign was extended to the plain-IVF pair;
    # its nprobe twin is already in cohort (1))
    "embedding_covariance_topk",
    "ivfpq_topk",
    "ivfpq_knn_join",
    "ivfpq_index_append",
    "ivf_topk",
    "pagerank_supplier_graph",
    "semdedup_embedding_cells",
    # (3) round-15 new registrations
    "multimodal_wav_pcm_stats",
    "attribution_revenue_touch",
    "multimodal_avi_frame_stats",
    # (4) round-11-latest cohort, 5 alphabetical
    "ann_bucketed_topk",
    "anti_join_docs_quarantine",
    "case_bucket_order_price",
    "chunk_dedup_retention",
    "corpus_to_training_set",
    # Past the 50-slot window: everything else keeps its r11–r14 green
    # verdict; the full local parity sweep for ALL registry entries is
    # re-run per round (tests/test_oracle_parity.py — N_registry + 1
    # cases: every registry entry plus the flagship entry(); the
    # "177/177" in EVIDENCE_r14 was that parity count over the then-176
    # registry, not a registry miscount).
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
