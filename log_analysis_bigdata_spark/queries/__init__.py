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
# on file). Round-5 window = the 32 queries whose newest verdict predates
# the driver's testdata regeneration (rotate them all in), then re-checks
# of round-5-touched code paths, then the round-5 additions; slots 43-50
# fill from registry order with core-pipeline re-checks.
_DRIVER_WINDOW = (
    # --- round-5 window ---
    # (1) the 32 queries whose newest driver verdict dates to round 2 —
    # BEFORE the driver's testdata regeneration (the exact failure mode
    # that produced r3's stale-green stats_agg_events). VERDICT r4 task 2:
    # rotate all of them in so every registry entry holds a post-
    # regeneration verdict.
    "serving_by_key",
    "serving_delete",
    "serving_high_score",
    "serving_time_range",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "dedup_exact_docs",
    "doc_fingerprint",
    "minhash_signatures",
    "minhash_dup_pairs",
    "ngram_jaccard_pairs",
    "simhash_text_docs",
    "simhash_buckets",
    "simhash_dup_groups",
    "dedup_components",
    "embedding_near_dup",
    "embedding_norms",
    "cosine_topk",
    "ann_bucketed_topk",
    "ivf_topk",
    "case_bucket_order_price",
    "cube_order_status",
    "date_parts_orders",
    "grouped_agg_weighted_mean",
    "profile_documents",
    "lang_histogram",
    "token_counts_docs",
    "text_quality_docs",
    "quality_filter_docs",
    # (2) re-checks of queries whose code paths were touched in round 5:
    # stream_dedup_blocks (dedup_messages grew a message-identity key for
    # the T3 fix) and interval_overlap_sessions (oracle gained the
    # (ts, event_id) tiebreaker per ADVICE r4).
    "stream_dedup_blocks",
    "interval_overlap_sessions",
    "heavy_hitters_topk",
    # (3) new round-5 queries — first verdicts.
    "ewma_user_value_stateful",
    "session_flow_top_transitions",
    "pivot_daily_event_counts",
    "grouped_minhash_union",
    "anti_join_docs_quarantine",
    "langid_ngram_predict",
    "simhash_near_pairs",
    "variant_props_stats",
    "fuzzy_match_names",
    "mad_outliers_events",
    "grouping_sets_order_stats",
    # Everything else: verdicts from r3/r4 postdate the last testdata
    # regeneration and round 5 does not touch their code paths; their
    # green rows stand. The full local parity sweep for ALL registry
    # entries is committed as EVIDENCE_r05.md (per-query result list).
)


def all_queries() -> dict[str, QueryDef]:
    global _LOADED
    if not _LOADED:
        from . import (  # noqa: F401
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
