#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced end-to-end with the noop sink (full execution, no
driver collect). Wall time per query + total.

Protocol (r10): $SPARK_GRAFT_BENCH_PASSES (>=3, default 3) INTERLEAVED
full passes — pass 1 cold, passes 2..N warm; per-pass totals and their
relative spread are committed in BENCH_LOCAL.json (pass_totals /
warm_spread_rel) so a round-over-round regression claim must clear the
run's own noise band.

COLD-PASS NUMBERS ARE JIT-NOISE-DOMINATED FOR SUB-2s QUERIES — compare
rounds on the warm-min / 3-run-median sections, never on cold deltas
(VERDICT r5 #4 investigation, 2026-08-14, sf0.1 local[32]):
  - r5 flagged q7/q8/q9/q10 + 3 report shapes ~1.5-2x slower cold than
    r4 with byte-identical plans. This round's run (15 MORE headline
    queries in the same session) has them back near r4 levels
    (q8 1.54 -> 1.25, q10 0.96 -> 0.75) with, again, unchanged plans.
  - Isolated fresh-JVM 3-run protocol per query: cold 4.0-5.0s,
    3-run min 1.0-1.7s — an isolated cold is 3-5x ANY in-suite cold,
    so "cold" position-in-suite numbers mostly measure how much JIT/
    codegen/parquet-footer cache the preceding queries happened to
    warm, which shifts whenever the headline set grows.
  - Warm-min for the same queries is stable across r4/r5/r6 (±10%).
    Since r6 the driver tail always carries both passes, so round-over-
    round comparison should use the warm dict there or BENCH_LOCAL.json.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from log_analysis_bigdata_spark.queries import all_queries
from log_analysis_bigdata_spark.session import get_spark

HEADLINE = [
    "sessionize_events",
    "parse_raw_logs",
    "event_traces_users",
    "feature_counts_events",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "window_topk_orders_per_customer",
    "serving_stats",
    "serving_latest_n",
    "dedup_exact_docs",
    "minhash_dup_pairs",
    "cosine_topk",
    "text_quality_docs",
    "q6_forecast_revenue",
    "q4_priority_exists",
    "embedding_near_dup",
    "ml_score_embeddings",
    "multimodal_byte_stats",
    "multimodal_frame_sample",
    "q7_nation_volume",
    "asof_join_events_orders",
    "range_join_hour_activity",
    "latest_record_per_key",
    "stats_agg_events",
    "per_user_model_fit",
    "grouped_zscore_events",
    "quality_filter_docs",
    "token_counts_docs",
    "ivf_topk",
    # round-3 additions (appended — earlier order stays pinned for
    # round-over-round comparison)
    "q8_market_share",
    "q9_profit_by_nation",
    "q10_returned_items",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "pii_redact_docs",
    "repetition_metrics_docs",
    "knn_join_topk",
    # JVM twins of the two pandas-UDF demos directly above them in the
    # list — BENCH now shows the built-in-vs-Arrow gap explicitly
    "grouped_zscore_window",
    "per_user_regression_sql",
    # round-3b: completing all 22 TPC-H shapes — the three heaviest
    "q2_min_cost_supplier",
    "q21_final_shipper",
    "q13_customer_order_distribution",
    # round-3c: training-set assembly
    "contamination_check",
    "sequence_pack_docs",
    # round-3d: corpus indexing, scale tooling, contracts
    "chunk_documents",
    "tfidf_top_terms",
    "unigram_logprob_docs",
    "skew_report_events",
    "kmeans_step_shift",
    "integrity_check_report",
    # round-4: asof tolerance / interval overlap / CDC / mode / BM25 /
    # drift / stream-dedup batch twin
    "asof_join_tolerance",
    "interval_overlap_sessions",
    "cdc_latest_state",
    "mode_per_event_type",
    "bm25_search_docs",
    "embedding_centroid_drift",
    "stream_dedup_blocks",
    "ewma_user_value",
    "heavy_hitters_topk",
    # round-5: stateful-streaming EWMA replay, funnel transitions,
    # declared-values pivot, mergeable minhash rollup, quarantine
    # anti-join, n-gram language-ID. (simhash_near_pairs stays out: the
    # deliberately-duplicated corpus yields ~20k true near-pairs at
    # sf0.01 already — correct, but a multi-minute headline at sf0.1.)
    "ewma_user_value_stateful",
    "session_flow_top_transitions",
    "pivot_daily_event_counts",
    "grouped_minhash_union",
    "anti_join_docs_quarantine",
    "langid_ngram_predict",
    "variant_props_stats",
    "fuzzy_match_names",
    "mad_outliers_events",
    "grouping_sets_order_stats",
    # round-6: the end-to-end dedup pipeline (candidate → verify →
    # cluster → canonicalize in one entry), deterministic reservoir
    # sampling, BPE token estimation, cross-format dedup
    "dedup_pipeline_docs",
    "reservoir_sample_docs",
    "bpe_token_estimate_docs",
    "crossformat_dedup_docs",
    "incremental_dedup_newbatch",
    "chunk_dedup_retention",
    # udtf_chunk_docs next to its JVM twin chunk_documents (already in
    # the list) — shows the Python-UDTF-vs-sequence+explode gap the same
    # way the pandas demos sit beside their JVM twins
    "udtf_chunk_docs",
    "pagerank_supplier_graph",
    "zorder_locality_events",
    "incremental_agg_merge_events",
    "semdedup_embedding_cells",
    # mapInArrow beside the JVM HOF embedding_norms family — same
    # side-by-side policy as the pandas/UDTF demos
    "arrow_map_embedding_norms",
    "bpe_merge_candidates",
    "hard_negatives_per_query",
    # round-7: real decoded-pixel math beside the byte-level multimodal
    # entries, and the simhash clustering rebuilt on signature collapse
    "multimodal_ppm_pixel_stats",
    "simhash_near_components",
    "bpe_train_merges",
    "bpe_apply_merges",
    "user_activity_full_join",
    # (stream_stream_join_attribution / stream_static_enrich_segments
    # stay out: their wall time is the fixed streaming-replay harness
    # cost, already represented by ewma_user_value_stateful)
    # round-8: the composed end-to-end training-set build (quality →
    # dedup → decontaminate → split → pack in ONE entry)
    "corpus_to_training_set",
    # round-10: product-quantized ANN — distinct plan family (codebook
    # train + 1-pass encode + ADC candidate scan + exact re-rank), not a
    # parameter variant of ivf_topk
    "ivfpq_topk",
    # round-10: the two new real decoders beside the PPM twin — BMP
    # (padded BGR raster permutations) and GIF87a (full LZW
    # decompression, the honest no-wheel decode-throughput number)
    "multimodal_bmp_pixel_stats",
    "multimodal_gif_pixel_stats",
    # round-16: the sixth and seventh from-scratch decoders — PNG
    # (deflate + all five scanline filters; stdlib zlib, so no env
    # gate applies) and baseline grayscale JPEG (canonical Huffman +
    # dequant + IDCT; flat blocks make the lossy path oracle-exact)
    "multimodal_png_pixel_stats",
    "multimodal_jpeg_block_stats",
    "multimodal_jpeg_color_stats",
    "multimodal_jpeg_422_stats",
    # round-10: span-level boilerplate dedup (cross-doc repeated k-gram
    # windows merged to maximal spans) — the third dedup regime beside
    # doc-level and chunk-level
    "repeated_ngram_spans",
    # round-11 (VERDICT r10 task 4): the quality-aware survivor
    # selection is a PIPELINE (components → quality join → max_by
    # survivor), not a parameter variant of the minhash family — it
    # belongs in HEADLINE like dedup_pipeline_docs
    "dedup_survivors_by_quality",
    # round-11: flagged by the excluded-wall audit below — a full
    # 4-way melt of lineitem (the biggest table) is a throughput
    # shape, not a fixed-latency micro; also the only unpivot/stack
    # plan family in the list
    "unpivot_lineitem_metrics",
    # round-11: token-level benchmark decontamination (span excision
    # with columnar splice) — a pipeline, registered this round
    "decontaminate_spans_docs",
    # round-11: temperature-flattened mixture resampling — the
    # data-mixing stage, registered this round
    "mixture_temperature_sample",
    # round-12: the batched IVF-PQ retrieval shape (many queries, one
    # code-index scan) — a distinct plan family from both ivfpq_topk
    # (single query) and knn_join_topk (brute-force all-pairs)
    "ivfpq_knn_join",
    # round-12: perceptual image dedup — fused decode+dHash mapInPandas
    # pass + banded pairing + components over the signature quotient;
    # the only dedup entry whose cost is dominated by DECODE throughput
    "image_near_dup_components",
    # round-14: incremental IVF-PQ index maintenance (frozen
    # centroids/codebooks, new batch encoded + appended) — the ingest
    # shape; cost is dominated by the history-side index train, so it
    # belongs here, not hidden as a sub-1s 'variant'
    "ivfpq_index_append",
    # round-14 corpus-QC/curation additions: the bigram rung of the
    # perplexity-filter ladder (distinct plan family from unigram —
    # zip_with bigram build + co-keyed probs join), domain balancing
    # (per-source cap), per-dimension embedding QC, the dedup-cluster
    # size report (composes the full dedup_components pipeline), and
    # tokenizer fertility by language
    "bigram_logprob_docs",
    "source_cap_sample",
    "embedding_dimension_stats",
    "dup_cluster_size_histogram",
    "tokenizer_fertility_by_lang",
    # round-14: one-pass Arrow-batched covariance (per-batch d x d
    # integer outer-product partials; shuffle volume partitions x d^2,
    # corpus-size-independent) — a distinct plan family from both the
    # JVM posexplode aggs and the pandas demos
    "embedding_covariance_topk",
    # round-14: the two canonical product-analytics shapes over the
    # event log — ordered first-touch funnel (three co-keyed user_id
    # step aggs) and the weekly retention cohort matrix
    "funnel_conversion_steps",
    "retention_cohort_weeks",
    # round-15: the third product-analytics shape (first/last-touch
    # revenue attribution — one user_id window shuffle over the
    # unioned touch+order stream) and the audio decode family
    # (RIFF/PCM chunk walker, fused narrow mapInPandas like the
    # PPM/BMP/GIF image twins)
    "attribution_revenue_touch",
    "multimodal_wav_pcm_stats",
    "multimodal_avi_frame_stats",
]

# Heavyweight entries DELIBERATELY excluded from HEADLINE, name →
# justification. The excluded-wall audit below (VERDICT r10 task 4)
# times every variant/micro exclusion once per bench run and flags any
# wall over EXCLUDED_WALL_BUDGET seconds that is not justified here —
# so a future heavyweight can no longer hide in 'variant' silently.
EXCLUDED_WALL_BUDGET = 1.0
HEAVY_EXCLUDED_OK = {
    "simhash_near_pairs": (
        "planted-dup corpus yields ~20k true near-pairs at sf0.01 "
        "already — correct but multi-minute at sf0.1; the family's "
        "engine cost is benched via simhash_near_components"
    ),
    # the r11 audit's first sweep flagged these four at 1.0-1.7s on a
    # contended host; each one's engine machinery is already benched
    # inside a HEADLINE entry, so they stay variants WITH the receipt:
    "minhash_signatures": (
        "the signature stage is the first half of benched "
        "minhash_dup_pairs; the standalone wall is the full n×8 "
        "signature frame materializing to noop"
    ),
    "ngram_jaccard_pairs": (
        "the shingle-Jaccard verify stage is benched inside "
        "dedup_pipeline_docs; this entry exists for the oracle "
        "contract on the planted pairs"
    ),
    "simhash_dup_groups": (
        "simhash family cost is benched via simhash_near_components "
        "(HEADLINE); this is the exact-signature grouping variant"
    ),
    "dedup_components": (
        "composition of benched embedding_near_dup + the "
        "connected-components operator benched inside "
        "dedup_pipeline_docs; no unbenched machinery"
    ),
    # ~1.0-1.1s single-pass walls that flap across the budget with
    # ambient load — both literal parameter variants of benched entries:
    "ivf_topk_nprobe": (
        "nprobe=2 parameter variant of benched ivf_topk — identical "
        "centroid/assign machinery plus one tiny probe-list join"
    ),
    "simhash_text_docs": (
        "the signature stage of the simhash family benched via "
        "simhash_near_components; standalone wall is the full n-row "
        "signature frame materializing to noop"
    ),
    # r13 driver audit flagged this at 1.96s on a run where the WHOLE
    # suite moved ~1.6x vs the identical r12-committed tree (machine
    # contention, no code change between the runs); it audits ~0.9-1.0s
    # on an idle host. The justification, not just the flap: it is a
    # full-table per-event RANGE-frame window over events (every row
    # re-aggregates its trailing time interval) + the oracle-determinism
    # trailing global orderBy — inherently around the budget at sf0.1.
    # The window-function family's throughput is benched via
    # window_topk_orders_per_customer and grouped_zscore_window
    # (HEADLINE); this entry exists for the RANGE-frame oracle contract.
    "window_time_range_sum": (
        "full-table per-event RANGE-frame window (trailing time "
        "interval re-aggregated per event row) + determinism orderBy — "
        "~1s-class at sf0.1 by construction and flaps over the budget "
        "under ambient load (r13 driver env ran the identical r12 tree "
        "~1.6x slower suite-wide); window throughput is benched via "
        "window_topk_orders_per_customer / grouped_zscore_window"
    ),
    # r15 (VERDICT r14 task 2): the two sketch aggregations the r14
    # driver session flagged at 1.183/1.099 s on a run whose own
    # warm_spread_rel was 0.31 (ambient contention). Idle-host walls
    # measured r15: approx_distinct 0.88-1.18 s, approx_percentile
    # 0.68-0.81 s — boundary flappers, not heavyweights. The
    # justification beyond the flap: each is a FULL-TABLE single-pass
    # sketch (every events row updates the HLL/KLL state), so ~1s at
    # sf0.1 is the construction cost; the same whole-scan + one-agg
    # machinery is benched via stats_agg_events (HEADLINE), and the
    # sketches' accuracy contracts are tested in test_operators, not
    # by wall time.
    "approx_distinct_users": (
        "full-table single-pass HLL sketch over events (~0.9-1.2 s at "
        "sf0.1 by construction, flaps across the 1 s budget under "
        "ambient load); scan+agg throughput benched via "
        "stats_agg_events (HEADLINE)"
    ),
    "approx_percentile_value": (
        "full-table single-pass percentile sketch over events "
        "(~0.7-1.1 s at sf0.1, flaps across the 1 s budget under "
        "ambient load); scan+agg throughput benched via "
        "stats_agg_events (HEADLINE)"
    ),
}

# Registry entries NOT in HEADLINE are timed only in the parity sweeps
# (tools/driver_parity.py prints per-query seconds); the bench line's
# "N/N ok" covers the HEADLINE set, not the registry (VERDICT r7 task
# 8). Why each excluded class stays out — the concrete name list is
# computed at run time and committed in BENCH_LOCAL.json["excluded"]:
EXCLUDED_REASONS = {
    "tpch": "TPC-H shapes beyond the 8 benched: same scan/join/agg "
            "machinery; the benched subset spans the heavy shapes "
            "(q1/q2/q9/q13/q18/q21)",
    "streaming-harness": "wall time is fixed per-micro-batch state-store "
            "lifecycle overhead, NOT data volume (r10 profile: replay "
            "harness floor 0.5s; ss-join 5.5s at 32 shuffle partitions "
            "vs 1.8s at 4 — ~19ms per store instance x partitions x "
            "stores x batches, amortized at production volume); "
            "represented by ewma_user_value_stateful",
    "demo-twin": "deliberate slow-path API demos (pandas/UDTF/cogroup "
            "surfaces); their JVM twins ARE benched alongside",
    "serving-micro": "single-key/limit-N serving lookups — "
            "sub-100ms fixed-latency shapes, not throughput queries",
    "variant": "parameter/family variants of a benched dedup/ANN "
            "entry (signatures/buckets/nprobe/width variants); "
            "wall-audited each run — see excluded_walls/"
            "excluded_over_budget",
    "ml-recipe": "deterministic ML train/eval recipes — quality is "
            "anchored vs closed-form oracles in test_ml, not wall time",
    "micro": "single-pass micro shapes (small dims, scalar funcs, "
            "setops, tiny aggs) dominated by fixed job latency at any "
            "benched SF; wall-audited each run — see excluded_walls/"
            "excluded_over_budget",
    "uncategorized": "matched NO explicit exclusion rule — a new "
            "registry entry that should either join HEADLINE or get "
            "an explicit category (this bucket existing is a bug)",
}

# 'micro' is an EXPLICIT allowlist, not a fall-through (ADVICE r8): a
# future heavyweight query left out of HEADLINE must not silently read
# as a justified micro exclusion. Anything matching no rule lands in
# 'uncategorized' with a stderr warning.
MICRO_NAMES = frozenset({
    "approx_distinct_users", "approx_percentile_value",
    "case_bucket_order_price", "cube_order_status", "date_parts_orders",
    "distinct_count_segments", "embedding_norms",
    "group_having_active_customers", "hash_split_summary",
    "join_anti_customers_no_orders", "join_left_customer_orders",
    "join_semi_customers_with_orders", "json_extract_events",
    "lang_histogram", "mixture_weights_lang", "multimodal_asset_stats",
    "multimodal_resize_plan", "percentile_order_value",
    "profile_documents", "psi_value_drift", "quality_decile_stats",
    "rollup_order_status", "salted_event_type_stats",
    "scalar_subquery_last_order", "setops_nations",
    "stratified_sample_docs", "string_funcs_customer",
    "template_tag_docs", "topk_orders_by_price",
    "window_lag_event_gaps",
    "window_running_value", "window_time_range_sum",
    "word_histogram_docs",
})


def excluded_category(name: str, tags: tuple[str, ...]) -> str:
    if "tpch" in tags:
        return "tpch"
    if "streaming" in tags:
        return "streaming-harness"
    if "pandas" in tags or "weak-by-design" in tags:
        return "demo-twin"
    if name.startswith("serving_"):
        return "serving-micro"
    if {"minhash", "simhash", "lsh", "ann", "components", "jaccard",
        "fingerprint"} & set(tags):
        return "variant"
    if "ml" in tags:
        return "ml-recipe"
    if name in MICRO_NAMES:
        return "micro"
    print(
        f"WARNING: excluded query {name!r} matches no exclusion rule "
        "— add it to HEADLINE or give it an explicit category",
        file=sys.stderr,
    )
    return "uncategorized"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="bench")
    registry = all_queries()

    # Warm the JVM/session and the Python UDF workers so the first query
    # doesn't pay one-time startup (executors reuse workers afterwards).
    spark.range(1000).count()
    from pyspark.sql.functions import col, pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.range(1000).repartition(32).select(_warm(col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    # NOISE-BOUNDED PROTOCOL (round 10, VERDICT r9 task 2): N>=3
    # INTERLEAVED full passes over the headline list — pass 1 runs
    # every query once (COLD: first materialization of persist()ed
    # intermediates, page cache, codegen), then passes 2..N repeat the
    # whole list (WARM). Interleaving is the point: r9's committed wall
    # (66.1 s) vs a same-code quieter run (59.5 s) showed ambient
    # container load drifting +-10% WITHIN one sweep, larger than most
    # real per-query wins — with back-to-back per-query runs that drift
    # lands on whichever queries were executing, while full passes
    # spread it evenly and the PER-PASS WARM TOTALS give the noise band
    # directly: a round-over-round regression claim must clear
    # warm_spread_rel, not just move the single committed number.
    # Per query: warm-min (min over passes 2..N — suppresses contention
    # noise, observed +-50% on identical plans), median of all passes,
    # and the tagged cold pass (persist()-artifact gaps visible, e.g.
    # minhash_dup_pairs r2: min 0.70 s was cache-hot, cold 2.5 s).
    # Headline order is pinned so round-over-round per-query regression
    # comparison is mechanical.
    # Per-query isolation: one raising query must NOT kill the run
    # (round-3 lesson — BENCH_r03 produced zero numbers because query #1
    # threw at plan time). A failed query gets {"err": ...}; every other
    # query still gets timed, and the total covers the ones that ran.
    n_passes = max(3, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))
    per_pass: list[dict[str, float]] = []
    errors: dict[str, str] = {}
    for p in range(n_passes):
        pass_times: dict[str, float] = {}
        for name in HEADLINE:
            if name in errors:
                continue  # failed once — don't re-fail it N times
            try:
                # timer covers CONSTRUCTION + execution: plan building
                # is ~ms for lazy queries, but eager operators (the
                # stateful-streaming replay runs its stream inside the
                # query fn) must not get their real cost hidden outside
                # the timer.
                t0 = time.perf_counter()
                df = registry[name].spark(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                pass_times[name] = time.perf_counter() - t0
            except Exception as exc:  # noqa: BLE001 — isolate, continue
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                print(
                    f"bench: {name} FAILED: {errors[name]}", file=sys.stderr
                )
                continue
            # Release the query's leaked storage before the next entry
            # (r9): localCheckpoint()ed RDDs stay pinned in the block
            # manager until their JVM references die, and py4j
            # finalizers are LAZY — without the collect, 90 queries x N
            # passes accumulate checkpoint blocks and the late-slot
            # heavyweights pay the eviction/GC pressure. The Python-side
            # collect frees the py4j refs so Spark's ContextCleaner can
            # reclaim blocks asynchronously; a per-query JVM System.gc
            # was tried and rejected (it perturbed warm timings more
            # than the leak did).
            del df
            gc.collect()
        per_pass.append(pass_times)
        print(
            f"bench: pass {p + 1}/{n_passes} done, "
            f"total {round(sum(pass_times.values()), 2)}s",
            file=sys.stderr,
        )

    # present in EVERY pass (a query can fail first in a warm pass)
    ok_names = [n for n in HEADLINE if all(n in pp for pp in per_pass)]
    timings = {  # warm-min: min over passes 2..N
        n: round(min(pp[n] for pp in per_pass[1:]), 3) for n in ok_names
    }
    medians = {
        n: round(sorted(pp[n] for pp in per_pass)[n_passes // 2], 3)
        for n in ok_names
    }
    colds = {n: round(per_pass[0][n], 3) for n in ok_names}
    # per-pass totals over the queries that ran in EVERY pass — the
    # committed noise band (warm spread = max/min of the warm passes)
    pass_totals = [
        round(sum(pp[n] for n in ok_names), 3) for pp in per_pass
    ]
    warm_totals = pass_totals[1:]
    warm_spread_rel = (
        round((max(warm_totals) - min(warm_totals)) / min(warm_totals), 4)
        if warm_totals and min(warm_totals) > 0
        else None
    )

    # value is null when ANY query errored (ADVICE r4): a partial total
    # must never be mistaken for a faster full run in round-over-round
    # comparison. The partial sum is still reported separately.
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_wall",
        "value": total if not errors else None,
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        "queries_cold": colds,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_ok": len(timings),
        "n_err": len(errors),
        # noise band (r10): pass 1 is cold, passes 2..N warm; a
        # round-over-round total delta smaller than the warm passes'
        # own spread is ambient load, not a regression
        "n_passes": n_passes,
        "pass_totals": pass_totals,
        "warm_spread_rel": warm_spread_rel,
    }
    if errors:
        out["errors"] = errors
        out["partial_total"] = total

    # exclusion transparency (VERDICT r7 task 8): "n_ok/N" above covers
    # the HEADLINE set only — name every registry entry the bench does
    # NOT time, with its reason category, so partial coverage can never
    # read as full-registry coverage.
    out["n_registry"] = len(registry)
    out["excluded"] = {
        name: excluded_category(name, qd.tags)
        for name, qd in sorted(registry.items())
        if name not in HEADLINE
    }
    out["excluded_reasons"] = EXCLUDED_REASONS
    print(
        f"bench: {len(out['excluded'])} of {len(registry)} registry "
        "entries excluded from HEADLINE (categories in "
        "BENCH_LOCAL.json['excluded'])",
        file=sys.stderr,
    )

    # excluded-wall audit (VERDICT r10 task 4; de-flapped r12 per
    # VERDICT r11 task 5): 'variant' and 'micro' exist for CHEAP
    # family/parameter shapes — time each one and flag any wall over
    # EXCLUDED_WALL_BUDGET that is not justified in HEAVY_EXCLUDED_OK,
    # so a heavyweight pipeline can never sit in a cheap-exclusion
    # category silently (the dedup_survivors lesson). The audited wall
    # is the MEDIAN of AUDIT_PASSES back-to-back runs: the r11 audit
    # was single-pass, and ~1 s shapes flapped across the budget with
    # ambient load (four entries acquired justifications for exactly
    # that reason); a median discards one contended outlier while a
    # genuinely heavyweight entry still exceeds the budget every run.
    # This is a classification guard, not a benchmark — the flagged set
    # must be empty; walls are not compared round-over-round.
    AUDIT_PASSES = 3
    excluded_walls: dict[str, float] = {}
    over_budget: dict[str, float] = {}
    for name, cat in out["excluded"].items():
        if cat not in ("variant", "micro") or name in HEAVY_EXCLUDED_OK:
            continue
        walls: list[float] = []
        for _ in range(AUDIT_PASSES):
            try:
                t0 = time.perf_counter()
                df = registry[name].spark(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                walls.append(time.perf_counter() - t0)
            except Exception as exc:  # noqa: BLE001 — audit must not kill bench
                walls = []
                print(
                    f"bench: excluded-audit {name} FAILED: "
                    f"{type(exc).__name__}: {exc}"[:300],
                    file=sys.stderr,
                )
                break
            del df
            gc.collect()
        if not walls:
            excluded_walls[name] = -1.0
            continue
        wall = round(sorted(walls)[len(walls) // 2], 3)
        excluded_walls[name] = wall
        if wall > EXCLUDED_WALL_BUDGET:
            over_budget[name] = wall
            print(
                f"WARNING: excluded query {name!r} ({cat}) median wall "
                f"{wall}s > {EXCLUDED_WALL_BUDGET}s budget over "
                f"{AUDIT_PASSES} runs — move it to HEADLINE or justify "
                "it in HEAVY_EXCLUDED_OK",
                file=sys.stderr,
            )
    out["excluded_walls"] = excluded_walls
    out["excluded_over_budget"] = over_budget
    out["excluded_heavy_justified"] = HEAVY_EXCLUDED_OK

    # Evidence-capture contract (learned rounds 3-5): the driver stores
    # only the LAST 2000 chars of stdout and parses the final line as
    # JSON. The full three-pass JSON is ~6 KB, so printing it last left
    # `parsed` null in BENCH_r03..r05. Layout that survives:
    #   stdout line 1: full compact JSON, cold dict LAST — the tail
    #     fragment above the final line is then cold per-query data;
    #   stdout final line: a <=1950-char summary JSON (warm per-query
    #     seconds + cold/median TOTALS) that always parses whole.
    #   BENCH_LOCAL.json: the full three-pass JSON, committed per round.
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_LOCAL.json"), "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(
        f"bench: {len(timings)}/{len(HEADLINE)} ok, {len(errors)} err, "
        f"warm-min total {total}s at sf{sf} (full JSON: BENCH_LOCAL.json)",
        file=sys.stderr,
    )
    full_order = {
        k: v for k, v in out.items() if k not in ("queries_median", "queries_cold")
    }
    full_order["queries_median"] = medians
    full_order["queries_cold"] = colds  # last: the tail fragment shows cold
    print(json.dumps(full_order, separators=(",", ":")))

    # Per-query keys use a unique name prefix ("q_key" documents the
    # scheme; full names are in line 1 / BENCH_LOCAL.json in the same
    # pinned order) because full names alone are ~1.4 KB — both passes
    # with full names can never fit the window.
    def prefix_keys(names: list[str], width: int) -> dict[str, str]:
        mapped: dict[str, str] = {}
        taken = set()
        for n in names:
            k, w = n[:width], width
            while k in taken:
                if w >= len(n):
                    # n is a full prefix of an earlier name's key —
                    # widening can't disambiguate (ADVICE r6); bound the
                    # loop with a numeric suffix instead of hanging.
                    i = 2
                    while f"{n}#{i}" in taken:
                        i += 1
                    k = f"{n}#{i}"
                    break
                w += 1
                k = n[:w]
            taken.add(k)
            mapped[n] = k
        return mapped

    def build_line(width: int, ndp: int, warm_only: bool = False) -> str:
        keys = prefix_keys(list(timings), width)
        summary = {
            "metric": "headline_queries_wall",
            "value": out["value"],
            "unit": "sec",
            "sf": out["sf"],
            "n_ok": len(timings),
            "n_err": len(errors),
            "total_cold": round(sum(colds.values()), 2),
            "total_median": round(sum(medians.values()), 2),
            "pass_totals": pass_totals,
            "warm_spread_rel": warm_spread_rel,
            # excluded-wall audit verdict: entries in variant/micro
            # over the 1s budget without a HEAVY_EXCLUDED_OK entry
            # (must be 0; names in BENCH_LOCAL.json)
            "x_over_budget": len(over_budget),
            "q_key": f"name[:{width}]",
            "q_val": "warm_min_s" if warm_only else "[cold_s,warm_min_s]",
            "queries": {
                keys[k]: (
                    round(v, ndp)
                    if warm_only
                    else [round(colds[k], ndp), round(v, ndp)]
                )
                for k, v in timings.items()
            },
        }
        if errors:
            summary["errors"] = {
                k: v[:60] for k, v in list(errors.items())[:3]
            }
        return json.dumps(summary, separators=(",", ":"))

    line = build_line(14, 2)
    for width, ndp in ((12, 1), (10, 1), (8, 1), (6, 1)):
        if len(line) <= 1900:
            break
        line = build_line(width, ndp)
    if len(line) > 1900:
        # next fallback before dropping ANY query: warm-min-only values
        # (round-over-round comparison is warm-min anyway; per-query
        # cold stays on line 1 and in BENCH_LOCAL.json)
        for width in (8, 6):
            line = build_line(width, 1, warm_only=True)
            if len(line) <= 1900:
                break
    if len(line) > 1900:
        # hard cap: keep only the slowest-warm entries in the tail line
        # (the full set is always on line 1 + BENCH_LOCAL.json) and say
        # how many were elided — a summary that silently fits is better
        # than a complete one the driver's 2000-char tail truncates into
        # unparseable JSON.
        full = dict(timings)
        for keep in (60, 45, 30, 20):
            timings = dict(
                sorted(full.items(), key=lambda kv: -kv[1])[:keep]
            )
            line = build_line(8, 1)
            line = (
                line[:-1] + f',"elided_fastest":{len(full) - keep}}}'
            )
            if len(line) <= 1900:
                break
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
