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
# no latest verdict may age past 4 rounds). Round-14 window (50 slots).
# NOTE round 13 was a zero-turn round (no builder commits): the r12
# window was verdicted as-is by the r13 driver run, so the 29
# round-9-latest entries the r12 comment said "MUST head the r13
# window" arrive here at the age cap instead (VERDICT r13 task 1):
#   (1) the full round-9-latest cohort — all 29 remaining (the 44-entry
#       r9 cohort minus the 15 rotated in r12), age 4 at the r14 run;
#       alphabetical;
#   (2) re-verdicts for the 3 queries whose CODE changed this round —
#       repeated_ngram_spans (gram keys switched from Spark-only
#       xxhash64 to the md5-prefix key BOTH engines derive, closing
#       ADVICE r11 #2's collision-parity risk), ivfpq_knn_join (grew
#       the adc_chunks parameter for very-large-Q broadcast bounding —
#       default path identical) and ivfpq_topk (final corpus encode
#       now routed through the extracted _ivfpq_encode helper — values
#       identical by construction, re-verdicted out of caution) —
#       plus the 1 query REGISTERED this round, never verdicted:
#       ivfpq_index_append (incremental IVF-PQ index maintenance,
#       VERDICT r13 task 7);
#   (2b) the 9 queries REGISTERED later in round 14, never verdicted —
#       bigram_logprob_docs, source_cap_sample, embedding_dimension_stats,
#       dup_cluster_size_histogram, tokenizer_fertility_by_lang,
#       embedding_covariance_topk (the corpus-QC/curation batch),
#       stream_topk_user_event_types (streaming space-saving heavy
#       hitters), funnel_conversion_steps and retention_cohort_weeks
#       (the two canonical product-analytics shapes);
#   (3) 8 of the 43 round-10-latest, alphabetical
#       (approx_percentile_value .. cdc_latest_state).
#       The 35 r10 entries that do not fit stay at age 4 after r14 and
#       MUST head the r15 window (cap 4; 35 + r15 re-verdicts ≤ 50
#       fits). 29 + 4 + 9 + 8 = 50.
_DRIVER_WINDOW = (
    # (1) round-9-latest cohort, rotated in full (age cap)
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
    "q5_revenue_by_nation",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_profit_by_nation",
    "quality_filter_docs",
    "semdedup_embedding_cells",
    "serving_by_key",
    "serving_delete",
    "serving_high_score",
    "serving_time_range",
    "session_flow_top_transitions",
    "sessionize_events",
    "simhash_buckets",
    "simhash_text_docs",
    "stream_dedup_blocks",
    "text_quality_docs",
    "token_counts_docs",
    "variant_props_stats",
    # (2) round-14 code-change re-verdicts + the new registration
    "repeated_ngram_spans",
    "ivfpq_knn_join",
    "ivfpq_topk",
    "ivfpq_index_append",
    # (2b) round-14 late registrations (corpus QC / curation)
    "bigram_logprob_docs",
    "source_cap_sample",
    "embedding_dimension_stats",
    "dup_cluster_size_histogram",
    "tokenizer_fertility_by_lang",
    "embedding_covariance_topk",
    "stream_topk_user_event_types",
    "funnel_conversion_steps",
    "retention_cohort_weeks",
    # (3) round-10-latest cohort, 8 alphabetical
    "approx_percentile_value",
    "asof_join_events_orders",
    "asof_join_tolerance",
    "bm25_search_docs",
    "bpe_apply_merges",
    "bpe_merge_candidates",
    "bpe_train_merges",
    "cdc_latest_state",
    # Past the 50-slot window: everything else keeps its r10–r13 green
    # verdict; the full local parity sweep for ALL registry entries is
    # committed per round as EVIDENCE_r14.md.
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
