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
# on file; tests/test_driver_session.py now CI-enforces the rotation —
# no latest verdict may age past 4 rounds). Round-9 window (50 slots):
#   (1) the full round-5-latest cohort — all 17, the oldest verdicts
#       left in the chain (VERDICT r8 task 2);
#   (2) re-verdicts for the two queries whose CODE changed this round:
#       semdedup_embedding_cells (oracle argmin now mirrors the engine
#       fold + tie-break, ADVICE r8) and pagerank_supplier_graph
#       (row-count convergence guard in _pr_loop, ADVICE r8);
#       ml_lr_train_confusion also changed (trainingSummary dropped
#       post-fit — closure-serialization fix) and sits in cohort (3);
#       heavy_hitters_topk changed too (cardinality-gated exact arm —
#       the sf1 sweep caught the sketch losing recall on near-uniform
#       keys) and takes the slot repetition_metrics_docs vacates;
#       corpus_to_training_set changed late (translate-based symbol
#       count in the quality gate) and takes quality_decile_stats'
#       slot; quality_filter_docs (same change) was already slot 4;
#   (3) 29 of the 43 round-6-latest, alphabetical. The 14 that do not
#       fit (quality_decile_stats, repetition_metrics_docs, reservoir_sample_docs,
#       sequence_pack_docs, serving_compound_filter, serving_latest_n,
#       serving_stats, skew_report_events, stratified_sample_docs,
#       stream_static_enrich_segments, stream_stream_join_attribution,
#       tfidf_top_terms, unigram_logprob_docs, zorder_locality_events)
#       keep their r6 green rows — first in line next round.
#       17 + 4 + 29 = 50.
_DRIVER_WINDOW = (
    # (1) round-5-latest cohort, rotated in full
    "q5_revenue_by_nation",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "quality_filter_docs",
    "serving_by_key",
    "serving_delete",
    "serving_high_score",
    "serving_time_range",
    "session_flow_top_transitions",
    "sessionize_events",
    "simhash_buckets",
    "simhash_dup_groups",
    "simhash_text_docs",
    "stream_dedup_blocks",
    "text_quality_docs",
    "token_counts_docs",
    "variant_props_stats",
    # (2) round-9 code-change re-verdicts (4)
    "semdedup_embedding_cells",
    "pagerank_supplier_graph",
    "heavy_hitters_topk",
    "corpus_to_training_set",
    # (3) round-6-latest cohort, 29 alphabetical
    "approx_distinct_users",
    "arrow_map_embedding_norms",
    "bpe_token_estimate_docs",
    "chunk_dedup_retention",
    "contamination_check",
    "crossformat_dedup_docs",
    "hash_split_summary",
    "incremental_agg_merge_events",
    "integrity_check_report",
    "mixture_weights_lang",
    "ml_lr_train_confusion",
    "pii_redact_docs",
    "psi_value_drift",
    "q10_returned_items",
    "q11_important_parts",
    "q12_late_shipments",
    "q13_customer_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_parts_supplier_counts",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_discounted_revenue",
    "q20_excess_share_suppliers",
    "q21_final_shipper",
    "q22_dormant_customers",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_profit_by_nation",
    # Past the 50-slot window: everything else keeps its r6–r8 green
    # verdict; the full local parity sweep for ALL registry entries is
    # committed per round as EVIDENCE_r09.md.
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
