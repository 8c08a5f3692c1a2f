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
# no latest verdict may age past 4 rounds). Round-11 window (50 slots):
#   (1) the full round-7-latest cohort — all 21, at the age cap after
#       r10 (VERDICT r10 task 1: they MUST head this window);
#   (2) re-verdicts for the 8 queries OUTSIDE that cohort whose
#       RESULTS changed with the PLANT_SHIFT 10^12 id-shift bump
#       (textq._dup_corpus / the variant / new-batch / c2t corpora —
#       the r7 minhash/simhash entries in (1) re-verdict the same
#       change): dedup_exact_docs, ngram_jaccard_pairs (r8),
#       simhash_dup_groups, crossformat_dedup_docs,
#       corpus_to_training_set, chunk_dedup_retention (r9),
#       dedup_pipeline_docs, incremental_dedup_newbatch (r10).
#       (grouped_minhash_union reads plain `documents`, NOT the dup
#       corpus — the r11 self-review caught it squatting in this
#       section while chunk_dedup_retention, a real _DUP_CORPUS_SQL
#       consumer, was missing; its r10 verdict stands unchanged);
#   (3) re-verdicts for the 5 queries whose CODE changed this round:
#       heavy_hitters_topk (TakeOrderedAndProject final cut),
#       ivfpq_topk (IVF cells + residual PQ recomposition),
#       embedding_near_dup + dedup_components (count-derived
#       threshold ladder), repeated_ngram_spans (8-byte gram keys);
#   (3b) the two queries REGISTERED this round, never verdicted:
#       decontaminate_spans_docs (token-level span excision) and
#       mixture_temperature_sample (tau=1/2 data-mixing resampler);
#   (4) 14 of the remaining 41 round-8-latest, alphabetical
#       (ann_bucketed_topk .. grouping_sets_order_stats). The 27 that
#       do not fit keep their r8 green rows at age 3 — they MUST head
#       the r12 window (cap 4). 21 + 8 + 5 + 2 + 14 = 50.
_DRIVER_WINDOW = (
    # (1) round-7-latest cohort, rotated in full (age cap)
    "kmeans_step_shift",
    "label_histogram_embeddings",
    "latest_record_per_key",
    "minhash_dup_pairs",
    "minhash_signatures",
    "ml_score_embeddings",
    "mode_per_event_type",
    "multimodal_asset_stats",
    "multimodal_byte_stats",
    "multimodal_frame_sample",
    "multimodal_ppm_pixel_stats",
    "multimodal_resize_plan",
    "per_user_model_fit",
    "per_user_regression_sql",
    "percentile_order_value",
    "simhash_near_components",
    "simhash_near_pairs",
    "udtf_chunk_docs",
    "unpivot_lineitem_metrics",
    "user_activity_full_join",
    "window_running_value",
    # (2) PLANT_SHIFT re-verdicts outside the r7 cohort
    "dedup_exact_docs",
    "ngram_jaccard_pairs",
    "simhash_dup_groups",
    "crossformat_dedup_docs",
    "corpus_to_training_set",
    "chunk_dedup_retention",
    "dedup_pipeline_docs",
    "incremental_dedup_newbatch",
    # (3) round-11 code-change re-verdicts
    "heavy_hitters_topk",
    "ivfpq_topk",
    "embedding_near_dup",
    "dedup_components",
    "repeated_ngram_spans",
    # (3b) new registrations this round (never verdicted)
    "decontaminate_spans_docs",
    "mixture_temperature_sample",
    # (4) round-8-latest cohort, 14 alphabetical
    "ann_bucketed_topk",
    "anti_join_docs_quarantine",
    "case_bucket_order_price",
    "cosine_topk",
    "cube_order_status",
    "date_parts_orders",
    "doc_fingerprint",
    "embedding_norms",
    "event_traces_users",
    "ewma_user_value_stateful",
    "feature_counts_events",
    "fuzzy_match_names",
    "grouped_agg_weighted_mean",
    "grouping_sets_order_stats",
    # Past the 50-slot window: everything else keeps its r8–r10 green
    # verdict; the full local parity sweep for ALL registry entries is
    # committed per round as EVIDENCE_r11.md.
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
