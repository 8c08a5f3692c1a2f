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
# no latest verdict may age past 4 rounds). Round-12 window (50 slots):
#   (1) the full round-8-latest cohort — all 27 remaining (the 41-entry
#       r8 cohort minus the 14 rotated in r11), at the age cap after
#       r11 (VERDICT r11 task 1: they MUST head this window);
#   (2) re-verdicts for the 6 queries whose CODE changed this round:
#       mixture_temperature_sample (DECIMAL/HUGEINT keep-rate headroom,
#       ADVICE r11), repeated_ngram_spans + decontaminate_spans_docs
#       (single-sourced island-merge helper, VERDICT r11 task 2 —
#       values unchanged by proof: covered = p1-p0+1 under the unified
#       inclusive-end convention equals the old max(pos)-p0+K),
#       ivfpq_topk (index build extracted to the shared
#       _ivfpq_index/_IVFPQ_INDEX_SQL), simhash_near_pairs +
#       simhash_near_components (_near_cand_pairs grew the n_bands
#       parameter — default path identical, re-verdicted out of
#       caution);
#   (3) the two queries REGISTERED this round, never verdicted:
#       ivfpq_knn_join (batched IVF-PQ retrieval, VERDICT r11 task 3)
#       and image_near_dup_components (perceptual dHash dedup over
#       decoded pixels, VERDICT r11 task 4);
#   (4) 15 of the 44 round-9-latest, alphabetical
#       (approx_distinct_users .. q13_customer_order_distribution).
#       The 29 r9 entries that do not fit stay at age 3 after r12 and
#       MUST head the r13 window (cap 4). 27 + 6 + 2 + 15 = 50.
_DRIVER_WINDOW = (
    # (1) round-8-latest cohort, rotated in full (age cap)
    "interval_overlap_sessions",
    "ivf_topk",
    "knn_join_topk",
    "lang_histogram",
    "langid_ngram_predict",
    "mad_outliers_events",
    "parse_raw_logs",
    "pivot_daily_event_counts",
    "profile_documents",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_priority_exists",
    "range_join_hour_activity",
    "rollup_order_status",
    "salted_event_type_stats",
    "scalar_subquery_last_order",
    "session_window_events",
    "sliding_window_events",
    "stats_agg_events",
    "string_funcs_customer",
    "template_tag_docs",
    "topk_orders_by_price",
    "tumbling_window_events",
    "window_lag_event_gaps",
    "window_time_range_sum",
    "window_topk_orders_per_customer",
    "word_histogram_docs",
    # (2) round-12 code-change re-verdicts
    "mixture_temperature_sample",
    "repeated_ngram_spans",
    "decontaminate_spans_docs",
    "ivfpq_topk",
    "simhash_near_pairs",
    "simhash_near_components",
    # (3) new registrations this round (never verdicted)
    "ivfpq_knn_join",
    "image_near_dup_components",
    # (4) round-9-latest cohort, 15 alphabetical
    "approx_distinct_users",
    "arrow_map_embedding_norms",
    "bpe_token_estimate_docs",
    "contamination_check",
    "hash_split_summary",
    "incremental_agg_merge_events",
    "integrity_check_report",
    "mixture_weights_lang",
    "pagerank_supplier_graph",
    "pii_redact_docs",
    "psi_value_drift",
    "q10_returned_items",
    "q11_important_parts",
    "q12_late_shipments",
    "q13_customer_order_distribution",
    # Past the 50-slot window: everything else keeps its r9–r11 green
    # verdict; the full local parity sweep for ALL registry entries is
    # committed per round as EVIDENCE_r12.md.
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
