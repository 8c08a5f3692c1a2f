"""Two-decade scale probe (round 10, VERDICT r9 task 1): build /tmp/sf10
from /tmp/sf1 (second-level tiling, signflip embedding decorrelator) and
measure the 6 scale-critical families at BOTH decades, with engine-side
invariant checks where the DuckDB oracle is quadratic.

The families and their checks:

- dedup_pipeline_docs   (minhash->LSH->verify->components)
    invariant: tiles never interact (fresh word suffixes), so the
    cluster count at sf10 is EXACTLY 10x sf1's.
- simhash_near_components
    same exact-10x invariant (cross-tile hamming<=1 collisions on
    60-bit sigs are ~2^-54 per candidate pair).
- semdedup_embedding_cells
    k grows with N and the quantizer is global, so only a band holds:
    output rows in [5x, 20x] of sf1.
- pagerank_supplier_graph
    per-tile graphs are isomorphic and the arithmetic is integer, so
    the sf10 top-20 rank VALUES must equal the multiset drawn from
    sf1's top-20 values, each repeated 10x, sorted desc, first 20.
- corpus_to_training_set
    stage-0 (raw) n_units and n_tokens are EXACTLY 10x (suffixing
    preserves token counts); later stages report ratios (the quality
    gate responds to suffix-lengthened words, so 10x is not exact).
- heavy_hitters_topk
    sf10 has ~150k distinct users > HH_EXACT_MAX_KEYS: the sketch arm
    engages, and on this near-uniform corpus its U certificate must
    FAIL, forcing the exact fallback. The probe records the gate
    cardinality, the certificate verdict (telemetry), and asserts the
    query's answer equals an independently computed exact top-10.

Timing: per family, 1 cold + 2 warm interleaved passes at each SF in
one session; warm-min ratios sf10/sf1 are committed to
BENCH_SF10_LOCAL.json. Sub-quadratic criterion: ratio <= 30 for a 10x
data step on fixed cores (linear ideal is ~10; 30 allows constant
factors + memory-hierarchy pressure; a quadratic family would be ~100).

Usage: python tools/scale_probe.py [--skip-build] [sf1=/tmp/sf1]
       [sf10=/tmp/sf10]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

FAMILIES = [
    "dedup_pipeline_docs",
    "semdedup_embedding_cells",
    "simhash_near_components",
    "pagerank_supplier_graph",
    "corpus_to_training_set",
    "heavy_hitters_topk",
    # r10 (post-signflip-fix): the embedding PAIR families — probing
    # them at sf10 only became meaningful once cross-tile copies stopped
    # being planted near-dups (see scale_up signflip docstring)
    "embedding_near_dup",
    "ivfpq_topk",
    # r12: perceptual image dedup — decode-dominated scan + signature
    # quotient; the sf1 probe of the PRE-ladder version measured the
    # 285 s dense-components cliff this family now ladders away from
    "image_near_dup_components",
    # r14: the bigram LM filter (vocabulary-squared pressure: the
    # doc-x-bigram table and the probs join both key on bigram) and the
    # one-pass covariance (shuffle volume partitions x d^2 — the claim
    # IS corpus-size-independence, so its decade ratio should sit near
    # the pure scan cost)
    "bigram_logprob_docs",
    "embedding_covariance_topk",
    # r15 (VERDICT r14 task 6): the product-analytics trio — funnel
    # (three co-keyed user_id step aggs), retention (first-touch agg +
    # co-keyed join + distinct), attribution (ONE user_id window sort
    # over the unioned touch+order stream) — and the streaming
    # space-saving top-k (state #users x m, replayed availableNow;
    # its wall is state-store lifecycle + per-batch overhead, the
    # scale claim is that it stays bounded, not that it is cheap)
    "funnel_conversion_steps",
    "retention_cohort_weeks",
    "attribution_revenue_touch",
    "stream_topk_user_event_types",
    # r16 (VERDICT r15 task 6): the two worst-scaling of the remaining
    # heavy un-probed shapes (measured grouped_zscore_window 1.75 /
    # per_user_regression_sql 2.88 / bpe_train 2.76 vs these two) —
    # the cross-doc boilerplate span miner (gram-inventory persist +
    # one gram shuffle + island windows) and BPE inference (iterative
    # vocab-table learn loop + chained corpus-wide replaces)
    "repeated_ngram_spans",
    "bpe_apply_merges",
]

# r12: the batched IVF-PQ retrieval join is probed at sf1 ONLY (200
# queries x 20k vectors; ~30 s): its query block is defined as
# vec_id % 100 == 7, so the sf10 workload is Q x N = 100x BY
# CONSTRUCTION — a wall ratio would compare different jobs, not the
# engine. The deployment shape for growing Q is chunking the stacked
# ADC table by query block (see the query docstring); per-corpus-decade
# growth at fixed Q is what the sf1-vs-sf0.1 recall/wall pins in CI
# cover (test_properties: the N=20k diffuse fixture IS corpus-sf1
# scale).
KNN_JOIN_PROBE = "ivfpq_knn_join"

RATIO_BOUND = 30.0  # sub-quadratic gate for one 10x decade, fixed cores


def timed_passes(spark, registry, sf_dir: str, n_passes: int = 3):
    """Interleaved passes (bench.py protocol): pass 1 cold, rest warm."""
    per_pass = []
    for _p in range(n_passes):
        pt = {}
        for name in FAMILIES:
            t0 = time.perf_counter()
            df = registry[name].spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            pt[name] = time.perf_counter() - t0
            del df
            gc.collect()
        per_pass.append(pt)
    return {
        n: {
            "cold": round(per_pass[0][n], 3),
            "warm_min": round(min(pp[n] for pp in per_pass[1:]), 3),
        }
        for n in FAMILIES
    }


def invariants(spark, registry, sf1: str, sf10: str) -> dict:
    out = {}

    def rows(name, sf):
        return registry[name].spark(spark, sf).count()

    # near-exact 10x cluster counts: tiles never share clusters (fresh
    # word suffixes), but banded-LSH candidate RECALL on borderline
    # (Jaccard < 1 / hamming-boundary) pairs redraws with the per-tile
    # hashes, so the per-tile cluster count varies a few parts per
    # thousand around sf1's (measured 9.96x / 9.71x on the smoke build)
    # — a [9x, 11x] band separates that from any real structural change
    for name in ("dedup_pipeline_docs", "simhash_near_components"):
        n1, n10 = rows(name, sf1), rows(name, sf10)
        out[name] = {
            "rows_sf1": n1,
            "rows_sf10": n10,
            "check": "band_9x_11x",
            "ok": 9 * n1 <= n10 <= 11 * n1,
        }

    # semdedup: cells PARTITION the corpus, and the cell count is the
    # count()-derived k — both exact by construction at any scale
    # (the r7 fixed-capacity lesson, verified live here)
    from log_analysis_bigdata_spark.queries.vectorq import semdedup_k

    sd = {}
    for sf, key in ((sf1, "sf1"), (sf10, "sf10")):
        n_emb = spark.read.parquet(f"{sf}/embeddings.parquet").count()
        agg = (
            registry["semdedup_embedding_cells"]
            .spark(spark, sf)
            .agg(
                F.count(F.lit(1)).alias("cells"),
                F.sum("n_members").alias("members"),
                F.sum("n_dropped").alias("dropped"),
            )
            .first()
        )
        sd[key] = {
            "n_emb": n_emb,
            "cells": agg["cells"],
            "k_expected": semdedup_k(n_emb),
            "members": agg["members"],
            "dropped": agg["dropped"],
        }
    out["semdedup_embedding_cells"] = {
        **sd,
        "check": "cells_eq_k_and_members_eq_n",
        "ok": all(
            v["cells"] == v["k_expected"] and v["members"] == v["n_emb"]
            for v in sd.values()
        ),
    }

    # pagerank: value multiset of sf10 top-20 == sf1 top-20 values
    # each repeated 10x, sorted desc, first 20 (isomorphic tiles +
    # integer arithmetic make this exact)
    r1 = [r["rank"] for r in registry["pagerank_supplier_graph"]
          .spark(spark, sf1).collect()]
    r10 = [r["rank"] for r in registry["pagerank_supplier_graph"]
           .spark(spark, sf10).collect()]
    expect = sorted(
        [v for v in r1 for _ in range(10)], reverse=True
    )[:20]
    out["pagerank_supplier_graph"] = {
        "top20_sf1": r1,
        "top20_sf10": r10,
        "check": "tile_multiset",
        "ok": sorted(r10, reverse=True) == expect,
    }

    # corpus_to_training_set: raw stage exactly 10x, attrition monotone
    def stages(sf):
        return {
            r["stage"]: (r["n_units"], r["n_tokens"])
            for r in registry["corpus_to_training_set"]
            .spark(spark, sf).collect()
        }

    s1, s10 = stages(sf1), stages(sf10)
    raw_ok = (
        s10["raw"][0] == 10 * s1["raw"][0]
        and s10["raw"][1] == 10 * s1["raw"][1]
    )
    order = ["raw", "quality", "dedup", "decontaminated", "train_split"]
    mono_ok = all(
        s10[a][0] >= s10[b][0] for a, b in zip(order, order[1:])
    )
    out["corpus_to_training_set"] = {
        "stages_sf1": s1,
        "stages_sf10": s10,
        "stage_unit_ratios": {
            k: round(s10[k][0] / max(s1[k][0], 1), 3) for k in s10
        },
        "check": "raw_exact_10x_and_monotone",
        "ok": raw_ok and mono_ok,
    }

    # embedding_near_dup: the signflip-fix validator. Cross-tile COPIES
    # of one source vector must NOT read as near-dups — under the broken
    # decorrelator they were ~100% above threshold (64k planted pairs);
    # under rotate+parity-signs they are random pairs, so the found
    # pairs should be overwhelmingly WITHIN-tile (same vec_id // V_OFF
    # tile for both ends). No tight 10x band on the total: the band-bit
    # ladder widens with corpus count, so diffuse-tier recall is
    # intentionally scale-dependent.
    v_off = (
        spark.read.parquet(f"{sf1}/embeddings.parquet")
        .agg(F.max("vec_id"))
        .first()[0]
        + 1
    )
    pairs10 = registry["embedding_near_dup"].spark(spark, sf10)
    agg = pairs10.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(
            (
                (F.col("id_a") % v_off) == (F.col("id_b") % v_off)
            ).cast("long")
        ).alias("copy_pairs"),
        F.sum(
            (
                F.floor(F.col("id_a") / v_off) != F.floor(F.col("id_b") / v_off)
            ).cast("long")
        ).alias("cross_tile_pairs"),
    ).first()
    n_pairs_sf1 = registry["embedding_near_dup"].spark(spark, sf1).count()
    # r11: the REPORTED pair count must now grow ~linearly — the
    # count-derived threshold ladder (vectorq.near_dup_threshold)
    # tightens the cosine cut per corpus doubling, so 10x vectors may
    # report at most ~10x pairs with headroom (30x bound, the repo's
    # standard sub-quadratic band; the fixed 0.35 threshold measured
    # 6.7k -> 147k = 22x-super-linear O(n^2 p) growth in r10).
    pairs_ratio = agg["total"] / max(n_pairs_sf1, 1)
    out["embedding_near_dup"] = {
        "pairs_sf1": int(n_pairs_sf1),
        "pairs_sf10": int(agg["total"]),
        "pairs_ratio": round(pairs_ratio, 2),
        "cross_tile_copy_pairs_sf10": int(agg["copy_pairs"]),
        "cross_tile_pairs_sf10": int(agg["cross_tile_pairs"]),
        "check": "cross_tile_copies_below_5pct_and_pairs_ratio_le_30x",
        "ok": (
            agg["copy_pairs"] <= max(1, agg["total"] // 20)
            and pairs_ratio <= 30.0
        ),
    }

    # ivfpq: structural sanity at sf10 (exactness vs brute force is
    # recall-pinned at sf0.01 in CI; the oracle-free check here is the
    # contract shape: exactly top-10, exact cosines strictly ordered)
    pq = registry["ivfpq_topk"].spark(spark, sf10).collect()
    cos_seq = [r["cosine"] for r in pq]
    out["ivfpq_topk"] = {
        "rows": len(pq),
        "top_cosines": cos_seq[:3],
        "check": "ten_rows_descending_cosine",
        "ok": len(pq) == 10
        and all(a >= b for a, b in zip(cos_seq, cos_seq[1:])),
    }

    # heavy hitters: gate telemetry + exact-answer equality at sf10
    from log_analysis_bigdata_spark.catalog import load_table
    from log_analysis_bigdata_spark.queries import relational as R

    ev = load_table(spark, sf10, "events").select("user_id")
    n_keys = ev.agg(
        F.approx_count_distinct("user_id").alias("k")
    ).first()["k"]
    sketch_arm = n_keys > R.HH_EXACT_MAX_KEYS
    cert_pass = None
    if sketch_arm:
        # mirror heavy_hitters_topk's contract (ADVICE r9): the sketch
        # arm input must be null-free on user_id — the query pre-filters
        # and unions the exact NULL count back; the probe's telemetry
        # must validate the same arm, not a null-dropping variant
        sk_counts, bound = R._hh_sketch_counts(
            ev.filter(F.col("user_id").isNotNull())
        )
        top = (
            sk_counts.orderBy(F.desc("n"), F.asc_nulls_last("user_id"))
            .limit(10)
            .collect()
        )
        cert_pass = len(top) == 10 and top[-1]["n"] > bound
    exact = [
        (r["user_id"], r["n"])
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc_nulls_last("user_id"))
        .limit(10)
        .collect()
    ]
    got = [
        (r["user_id"], r["n"])
        for r in registry["heavy_hitters_topk"].spark(spark, sf10).collect()
    ]
    out["heavy_hitters_topk"] = {
        "approx_n_keys_sf10": int(n_keys),
        "sketch_arm_engaged": bool(sketch_arm),
        "certificate_passed": cert_pass,
        "check": "equals_exact_top10",
        "ok": got == exact,
    }

    # r12 — image_near_dup_components at sf10: every RE-ENCODED planted
    # copy (doc%10==1 vs doc−1, identical pixels ⇒ identical signature)
    # must co-cluster at ANY ladder tier — same-signature docs share a
    # rep and therefore a component by construction, so a violation
    # here means the decode/signature/expansion path broke at scale.
    # (Brightness-lift pairs at hamming 2–4 are EXPECTED to drop out
    # once the count-derived ladder tightens past their tier — the
    # documented trade; the exact-recall pins for them run at the
    # hamming-4 tier in CI.) Ladder telemetry recorded alongside.
    from log_analysis_bigdata_spark.multimodal.assets import (
        ppm_dhash,
        synth_ppm_dup_assets,
    )
    from log_analysis_bigdata_spark.queries.multimodalq import (
        img_max_hamming,
    )

    lab = registry["image_near_dup_components"].spark(spark, sf10)
    a = lab.filter(F.col("node") % 10 == 1).select(
        F.col("node").alias("d"), F.col("component").alias("ca")
    )
    b = lab.select(F.col("node").alias("s"), F.col("component").alias("cb"))
    j = a.join(b, a["d"] - 1 == b["s"], "left").select("d", "ca", "cb")
    viol = j.filter(
        F.col("cb").isNull() | (F.col("ca") != F.col("cb"))
    ).count()
    n_reenc = a.count()
    n_reps = (
        ppm_dhash(
            synth_ppm_dup_assets(
                spark.read.parquet(f"{sf10}/documents.parquet")
            )
        )
        .select("simhash")
        .distinct()
        .count()
    )
    out["image_near_dup_components"] = {
        "reencode_pairs_sf10": int(n_reenc),
        "co_cluster_violations": int(viol),
        "n_reps_sf10": int(n_reps),
        "ladder_hamming_sf10": img_max_hamming(n_reps),
        "check": "all_reencoded_copies_co_clustered",
        "ok": n_reenc > 0 and viol == 0,
    }

    # r14 — bigram LM filter: the tile transform suffixes every word
    # ("_t{k}"/"u{k}") without touching whitespace, so each sf10 doc
    # twin has the IDENTICAL bigram count as its sf1 source — rows and
    # Σ n_bigrams are both exactly 10x. (Scores shift — V and the
    # per-tile bigram tables differ — so values carry no invariant;
    # value correctness is the DuckDB oracle's job at the gate SFs.)
    big1 = (
        registry["bigram_logprob_docs"]
        .spark(spark, sf1)
        .agg(F.count(F.lit(1)).alias("r"), F.sum("n_bigrams").alias("s"))
        .first()
    )
    big10 = (
        registry["bigram_logprob_docs"]
        .spark(spark, sf10)
        .agg(F.count(F.lit(1)).alias("r"), F.sum("n_bigrams").alias("s"))
        .first()
    )
    out["bigram_logprob_docs"] = {
        "rows_sf1": int(big1["r"]),
        "rows_sf10": int(big10["r"]),
        "bigrams_sf1": int(big1["s"]),
        "bigrams_sf10": int(big10["s"]),
        "check": "rows_and_bigram_totals_exact_10x",
        "ok": big10["r"] == 10 * big1["r"] and big10["s"] == 10 * big1["s"],
    }

    # r14 — one-pass covariance: the output is top-COV_TOPK pairs at
    # ANY corpus size (the shuffle is partitions x d^2 — corpus-size-
    # independent by construction; the decade WALL ratio above is the
    # real claim). Structural check: exactly k rows, every corr in
    # [-1, 1] (+ rounding slack), i<j canonical pair order.
    from log_analysis_bigdata_spark.queries.vectorq import COV_TOPK

    cov10 = registry["embedding_covariance_topk"].spark(spark, sf10).collect()
    out["embedding_covariance_topk"] = {
        "rows_sf10": len(cov10),
        "max_abs_corr_sf10": max(
            (abs(r["corr"]) for r in cov10 if r["corr"] is not None),
            default=None,
        ),
        "check": "topk_rows_corr_bounded_canonical_pairs",
        "ok": len(cov10) == COV_TOPK
        and all(r["i"] < r["j"] for r in cov10)
        and all(
            abs(r["corr"]) <= 1.0001
            for r in cov10
            if r["corr"] is not None
        ),
    }

    # r15 — the product-analytics trio: tiles copy each user's event
    # stream onto disjoint user ids with IDENTICAL timestamps, and
    # orders tile o_custkey by the same customer stride, so every
    # per-user computation lands 10 independent copies — funnel step
    # counts, retention matrix cells, and attribution (model, channel)
    # order counts/revenues are all EXACTLY 10x with identical derived
    # rates (round(10n/10N) == round(n/N): same rational, same double).
    fun1 = {
        r["step"]: (r["n_users"], r["conv_from_start"], r["conv_from_prev"])
        for r in registry["funnel_conversion_steps"].spark(spark, sf1).collect()
    }
    fun10 = {
        r["step"]: (r["n_users"], r["conv_from_start"], r["conv_from_prev"])
        for r in registry["funnel_conversion_steps"].spark(spark, sf10).collect()
    }
    out["funnel_conversion_steps"] = {
        "steps_sf1": fun1,
        "steps_sf10": fun10,
        "check": "counts_exact_10x_rates_equal",
        "ok": set(fun1) == set(fun10)
        and all(
            fun10[s][0] == 10 * fun1[s][0] and fun10[s][1:] == fun1[s][1:]
            for s in fun1
        ),
    }

    ret1 = {
        (r["cohort_week"], r["week_offset"]): (r["n_users"], r["retention"])
        for r in registry["retention_cohort_weeks"].spark(spark, sf1).collect()
    }
    ret10 = {
        (r["cohort_week"], r["week_offset"]): (r["n_users"], r["retention"])
        for r in registry["retention_cohort_weeks"].spark(spark, sf10).collect()
    }
    out["retention_cohort_weeks"] = {
        "cells_sf1": len(ret1),
        "cells_sf10": len(ret10),
        "check": "matrix_counts_exact_10x_retention_equal",
        "ok": set(ret1) == set(ret10)
        and all(
            ret10[k] == (10 * ret1[k][0], ret1[k][1]) for k in ret1
        ),
    }

    att1 = {
        (r["model"], r["channel"]): (r["n_conversions"], r["revenue_micro"])
        for r in registry["attribution_revenue_touch"]
        .spark(spark, sf1).collect()
    }
    att10 = {
        (r["model"], r["channel"]): (r["n_conversions"], r["revenue_micro"])
        for r in registry["attribution_revenue_touch"]
        .spark(spark, sf10).collect()
    }
    # non-degeneracy: the FIRST cut keyed conversions to orders, whose
    # TPC-H dates all precede the event era — every conversion read
    # 'direct' and the window path was green-but-vacuous. Real touch
    # channels must appear in both models at both decades.
    channels = {c for (_m, c) in att10}
    out["attribution_revenue_touch"] = {
        "cells_sf1": {f"{m}/{c}": v for (m, c), v in att1.items()},
        "cells_sf10": {f"{m}/{c}": v for (m, c), v in att10.items()},
        "check": "conversions_and_revenue_exact_10x_and_nondegenerate",
        "ok": set(att1) == set(att10)
        and all(
            att10[k] == (10 * att1[k][0], 10 * att1[k][1]) for k in att1
        )
        and len(channels - {"direct"}) >= 2,
    }

    # r15 — streaming space-saving top-k at sf10: 5 event types per
    # user <= m=16, so the sketch must be EXACT — every emitted
    # (user, type) count equals the batch groupBy and max_err == 0.
    # Compared distributed (150k users x 5 types — no driver collect).
    got = registry["stream_topk_user_event_types"].spark(spark, sf10)
    exact_counts = (
        load_table(spark, sf10, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    jj = got.join(exact_counts, ["user_id", "event_type"], "full")
    bad = jj.filter(
        F.col("est_count").isNull()
        | F.col("n").isNull()
        | (F.col("est_count") != F.col("n"))
        | (F.col("max_err") != 0)
    ).count()
    n_groups = exact_counts.count()
    out["stream_topk_user_event_types"] = {
        "groups_sf10": int(n_groups),
        "mismatches": int(bad),
        "check": "sketch_exact_under_m_vs_batch_groupby",
        "ok": n_groups > 0 and bad == 0,
    }

    # r16 — repeated_ngram_spans: per-doc output for every doc (left
    # join), so rows are EXACTLY 10x; the in-query boilerplate plant
    # (doc_id % 7 == 0, un-suffixed by the tile transform, so planted
    # lines stay corpus-wide duplicates) must yield >= 5 dup windows
    # and >= 1 span for every planted doc at the big decade; coverage
    # is a ratio in [0, 10000] by construction.
    sp1 = registry["repeated_ngram_spans"].spark(spark, sf1).count()
    sp10df = registry["repeated_ngram_spans"].spark(spark, sf10)
    sp_agg = sp10df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(
            (
                (F.col("doc_id") % 7 == 0)
                & ((F.col("dup_windows") < 5) | (F.col("n_spans") < 1))
            ).cast("long")
        ).alias("planted_viol"),
        F.sum(
            ((F.col("coverage_e4") < 0) | (F.col("coverage_e4") > 10000))
            .cast("long")
        ).alias("cov_viol"),
    ).first()
    out["repeated_ngram_spans"] = {
        "rows_sf1": int(sp1),
        "rows_sf10": int(sp_agg["rows"]),
        "planted_violations": int(sp_agg["planted_viol"]),
        "coverage_violations": int(sp_agg["cov_viol"]),
        "check": "rows_exact_10x_planted_spans_found_coverage_bounded",
        "ok": sp_agg["rows"] == 10 * sp1
        and sp_agg["planted_viol"] == 0
        and sp_agg["cov_viol"] == 0,
    }

    # r16 — bpe_apply_merges: per-doc rows exactly 10x; merges only
    # ever REDUCE symbol counts, so 1 <= n_bpe_tokens <= n_chars for
    # every doc with text; and the learn loop stays non-degenerate at
    # the big decade (full merge table learned)
    from log_analysis_bigdata_spark.queries.corpusq import N_BPE_MERGES

    bp1 = registry["bpe_apply_merges"].spark(spark, sf1).count()
    bp10 = registry["bpe_apply_merges"].spark(spark, sf10)
    bp_agg = bp10.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(
            (
                (F.col("n_bpe_tokens") > F.col("n_chars"))
                | (F.col("n_bpe_tokens") <= 0)
            ).cast("long")
        ).alias("viol"),
    ).first()
    n_merges10 = registry["bpe_train_merges"].spark(spark, sf10).count()
    out["bpe_apply_merges"] = {
        "rows_sf1": int(bp1),
        "rows_sf10": int(bp_agg["rows"]),
        "conservation_violations": int(bp_agg["viol"]),
        "merges_learned_sf10": int(n_merges10),
        "check": "rows_exact_10x_tokens_conserved_full_merge_table",
        "ok": bp_agg["rows"] == 10 * bp1
        and bp_agg["viol"] == 0
        and n_merges10 == N_BPE_MERGES,
    }

    # r12 — batched IVF-PQ knn join, sf1 only (see KNN_JOIN_PROBE note):
    # contract shape — every query serves exactly K rows, ranks are
    # 1..K, cosines descend within each query.
    from log_analysis_bigdata_spark.queries.vectorq import IVFPQ_JOIN_K

    t0 = time.perf_counter()
    rows = registry[KNN_JOIN_PROBE].spark(spark, sf1).collect()
    knn_wall = round(time.perf_counter() - t0, 1)
    per_q: dict = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append((r["rank"], r["cosine"]))
    shape_ok = bool(per_q) and all(
        sorted(rk for rk, _ in v) == list(range(1, IVFPQ_JOIN_K + 1))
        and all(
            x[1] >= y[1]
            for x, y in zip(sorted(v), sorted(v)[1:])
        )
        for v in per_q.values()
    )
    out[KNN_JOIN_PROBE] = {
        "sf1_queries": len(per_q),
        "sf1_rows": len(rows),
        "sf1_wall": knn_wall,
        "check": "every_query_full_topk_descending",
        "ok": shape_ok and len(rows) == IVFPQ_JOIN_K * len(per_q),
    }
    return out


SKEW_FAMILIES = [
    "funnel_conversion_steps",
    "retention_cohort_weeks",
    "attribution_revenue_touch",
    "heavy_hitters_topk",
    "stream_topk_user_event_types",
    "salted_event_type_stats",
    # r16b: the FLAGSHIP under the hot key — sessionize's collect_list
    # moves the whole session text through the shuffle, so the hot
    # user's 1M-event session is the single heaviest reduce task any
    # registry query produces (sort_array over 1M structs + a ~6 MB
    # array_join in ONE task)
    "sessionize_events",
]
# a hot key may cost more than its row share (one partition sorts the
# whole stream), but it must stay a CONSTANT factor — 3x the uniform
# warm (plus a small absolute floor for timer noise on sub-second
# families) separates "AQE/salting absorbed it" from a hot-partition
# blowup
SKEW_WALL_FACTOR = 3.0
SKEW_WALL_FLOOR_S = 5.0


def build_skew_tile(spark, sf10: str, skew_dir: str) -> None:
    """events-with-a-hot-key variant of the sf10 tile (VERDICT r15
    task 4): the uniform tiles copy per-user streams onto DISJOINT
    users, so no probe had ever aimed a Zipf head at the user_id
    shuffles. This ADDS one synthetic user holding a copy of ~10% of
    all events (every event_id % 10 == 3, original timestamps/types/
    values, fresh unique event_ids) — an additive construction, so
    every original user's stream is byte-identical and per-family
    expectations stay closed-form. All other tables symlink to the
    uniform sf10 build."""
    os.makedirs(skew_dir, exist_ok=True)
    ev = spark.read.parquet(f"{sf10}/events.parquet")
    mx = ev.agg(
        F.max("event_id").alias("e"), F.max("user_id").alias("u")
    ).first()
    hot_user, e_off = mx["u"] + 1, mx["e"] + 1
    hot = (
        ev.filter(F.col("event_id") % 10 == 3)
        .withColumn("user_id", F.lit(hot_user).cast("long"))
        .withColumn("event_id", F.col("event_id") + F.lit(e_off))
    )
    ev.unionByName(hot).repartition(
        spark.sparkContext.defaultParallelism
    ).write.mode("overwrite").parquet(f"{skew_dir}/events.parquet")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        dst = f"{skew_dir}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(os.path.abspath(f"{sf10}/{t}.parquet"), dst)


DUP_CLASS_M = 25_000  # planted exact-duplicate class size at sf10


def build_dup_class_tile(spark, sf10: str, dup_dir: str) -> None:
    """documents-with-a-mega-dup-class variant of the sf10 tile (r16):
    the uniform corpus has a natural near-dup rate but no DEGENERATE
    LSH bucket — yet 100 TB corpora always carry byte-identical
    boilerplate classes (empty pages, license files) in the 10⁵..10⁶
    range, and the banded self-join is quadratic IN A BUCKET. This
    ADDS one 25k-member exact class with fresh non-corpus words
    (additive: every natural cluster is untouched and the class's
    expected output row is closed-form), and — r17 — a 25k-member
    identical-EMBEDDING class (copies of vector 0) for the hyperplane-
    LSH twin of the same degeneracy. Ladder stability across the
    plant is asserted in the probe (bits/thr must not shift between
    200k and 225k, or the uniform-vs-dup comparison compares different
    bandings)."""
    os.makedirs(dup_dir, exist_ok=True)
    docs = spark.read.parquet(f"{sf10}/documents.parquet")
    mx = docs.agg(F.max("doc_id")).first()[0]
    text = " ".join(f"zqx{w}dup" for w in range(40))
    plant = spark.range(DUP_CLASS_M).select(
        (F.col("id") + mx + 1).alias("doc_id"),
        F.lit(text).alias("text"),
        F.lit("synthetic").alias("source"),
        F.lit("en").alias("lang"),
        F.lit(len(text)).alias("n_chars"),
    )
    common = [c for c in docs.columns if c in plant.columns]
    docs.select(*common).unionByName(plant.select(*common)).repartition(
        spark.sparkContext.defaultParallelism
    ).write.mode("overwrite").parquet(f"{dup_dir}/documents.parquet")
    # r17 (VERDICT r16 task 4): the EMBEDDING twin of the degenerate
    # class — byte-identical embeddings share every hyperplane-LSH sign
    # band exactly like byte-identical shingle arrays share every
    # minhash band. Plant DUP_CLASS_M copies of the GLOBAL-MIN vec_id's
    # vector (new ids past the max): the class merges with vector 0's
    # own natural cluster, so the expected components are closed-form
    # from the uniform run (label = 0, the global min) and every other
    # natural cluster must stay byte-identical.
    edst = f"{dup_dir}/embeddings.parquet"
    if os.path.islink(edst):
        # r16 tiles symlinked embeddings to the uniform sf10 copy; a
        # Spark overwrite THROUGH the link would delete the uniform
        # data it points at — drop the link first
        os.remove(edst)
    emb = spark.read.parquet(f"{sf10}/embeddings.parquet")
    emx = emb.agg(F.max("vec_id")).first()[0]
    v0 = emb.orderBy("vec_id").limit(1).select("embedding", "label").first()
    eplant = spark.range(DUP_CLASS_M).select(
        (F.col("id") + emx + 1).alias("vec_id"),
        F.lit(v0["embedding"]).cast("array<float>").alias("embedding"),
        F.lit(v0["label"]).alias("label"),
    )
    emb.select("vec_id", "embedding", "label").unionByName(
        eplant
    ).repartition(spark.sparkContext.defaultParallelism).write.mode(
        "overwrite"
    ).parquet(f"{dup_dir}/embeddings.parquet")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        dst = f"{dup_dir}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(os.path.abspath(f"{sf10}/{t}.parquet"), dst)


def dup_class_probe(spark, registry, sf10: str, dup_dir: str,
                    sf10_warms: dict) -> dict:
    """Run the end-to-end dedup pipeline against the mega-class and
    check the exact-collapse contract: ONE closed-form mega-cluster,
    every natural cluster byte-identical to the uniform run, and a
    bounded wall. (Pre-fix this input inflated candidates ~1 250× at
    sf1 — 2.5k → 3.13M for a 2 500-member class — and would have built
    ~312M pairs here; the collapse makes the class cost m−1 star
    edges.)"""
    docs = spark.read.parquet(f"{sf10}/documents.parquet")
    mx = docs.agg(F.max("doc_id")).first()[0]
    t0 = time.perf_counter()
    got = {
        r["keep_doc_id"]: (r["n_members"], r["max_doc_id"])
        for r in registry["dedup_pipeline_docs"].spark(spark, dup_dir)
        .collect()
    }
    wall = round(time.perf_counter() - t0, 3)
    base = {
        r["keep_doc_id"]: (r["n_members"], r["max_doc_id"])
        for r in registry["dedup_pipeline_docs"].spark(spark, sf10)
        .collect()
    }
    mega = got.pop(mx + 1, None)
    ref = sf10_warms.get("dedup_pipeline_docs")
    wall_ok = ref is None or wall <= max(
        SKEW_WALL_FACTOR * ref, ref + SKEW_WALL_FLOOR_S
    )
    # closed form under the QUERY's own deterministic plant
    # (textq._dup_corpus_spark re-keys every doc_id % 10 == 0 at
    # +PLANT_SHIFT): the class contributes its % 10 == 0 members again,
    # and the max member is the shifted copy of the largest such id
    from log_analysis_bigdata_spark.queries.textq import PLANT_SHIFT

    ids_div10 = [
        i for i in range(mx + 1, mx + DUP_CLASS_M + 1) if i % 10 == 0
    ]
    expect_n = DUP_CLASS_M + len(ids_div10)
    expect_max = (
        PLANT_SHIFT + ids_div10[-1] if ids_div10 else mx + DUP_CLASS_M
    )
    doc_res = {
        "planted_class_m": DUP_CLASS_M,
        "mega_cluster": list(mega) if mega else None,
        "expected": [expect_n, expect_max],
        "natural_clusters_match": got == base,
        "wall": wall,
        "sf10_uniform_warm_min": ref,
        "wall_ok": wall_ok,
        "check": "mega_cluster_exact_naturals_identical_wall_bounded",
        "ok": mega == (expect_n, expect_max)
        and got == base
        and wall_ok,
    }

    # r17 embedding twin: dedup_components (the collapsed hyperplane-
    # LSH path) against the planted identical-embedding class. Expected
    # components are closed-form from the uniform run: the planted ids
    # all label to vec 0 (global min — planting copies of ITS vector
    # makes the merge target deterministic), vec 0 itself labels 0, and
    # every other natural component is byte-identical (same reps, same
    # bands, same ladder — asserted below).
    from log_analysis_bigdata_spark.queries.vectorq import (
        lsh_band_bits,
        near_dup_threshold,
    )

    emb_u = spark.read.parquet(f"{sf10}/embeddings.parquet")
    n_u = emb_u.count()
    emx = emb_u.agg(F.max("vec_id")).first()[0]
    n_d = n_u + DUP_CLASS_M
    ladder_ok = lsh_band_bits(n_u) == lsh_band_bits(n_d) and (
        near_dup_threshold(n_u) == near_dup_threshold(n_d)
    )
    tb = time.perf_counter()
    base_e = {
        r["node"]: r["component"]
        for r in registry["dedup_components"].spark(spark, sf10).collect()
    }
    ref_e = round(time.perf_counter() - tb, 3)
    t1 = time.perf_counter()
    got_e = {
        r["node"]: r["component"]
        for r in registry["dedup_components"].spark(spark, dup_dir)
        .collect()
    }
    wall_e = round(time.perf_counter() - t1, 3)
    planted = {
        i: got_e.pop(i, None) for i in range(emx + 1, emx + DUP_CLASS_M + 1)
    }
    v0_label = got_e.pop(0, None)
    base_e.pop(0, None)  # vec 0 may be near-dup-free in the uniform run
    wall_e_ok = wall_e <= max(
        SKEW_WALL_FACTOR * ref_e, ref_e + SKEW_WALL_FLOOR_S
    )
    doc_res["embedding_tile"] = {
        "planted_class_m": DUP_CLASS_M,
        "ladder_stable": ladder_ok,
        "planted_all_label_v0": all(
            c == 0 for c in planted.values()
        ),
        "v0_label": v0_label,
        "natural_components_match": got_e == base_e,
        "wall": wall_e,
        "sf10_uniform_wall": ref_e,
        "wall_ok": wall_e_ok,
        "check": "planted_class_labels_v0_naturals_identical_wall_bounded",
        "ok": ladder_ok
        and all(c == 0 for c in planted.values())
        and v0_label == 0
        and got_e == base_e
        and wall_e_ok,
    }
    doc_res["ok"] = doc_res["ok"] and doc_res["embedding_tile"]["ok"]
    return doc_res


def skew_probe(spark, registry, sf10: str, skew_dir: str,
               sf10_warms: dict) -> dict:
    """Run the user-keyed analytics under the hot key and check the
    closed-form expectations (additive construction: original users'
    results are unchanged) plus the wall band."""
    from log_analysis_bigdata_spark.catalog import load_table

    ev_skew = load_table(spark, skew_dir, "events")
    hot_user = ev_skew.agg(F.max("user_id")).first()[0]
    n_hot = ev_skew.filter(F.col("user_id") == hot_user).count()
    out: dict = {"hot_user": int(hot_user), "hot_events": int(n_hot)}

    walls = {}
    per_pass = []
    for _p in range(3):
        pt = {}
        for name in SKEW_FAMILIES:
            t0 = time.perf_counter()
            registry[name].spark(spark, skew_dir).write.format(
                "noop"
            ).mode("overwrite").save()
            pt[name] = time.perf_counter() - t0
            gc.collect()
        per_pass.append(pt)
    for name in SKEW_FAMILIES:
        warm = round(min(pp[name] for pp in per_pass[1:]), 3)
        ref = sf10_warms.get(name)
        walls[name] = {
            "cold": round(per_pass[0][name], 3),
            "warm_min": warm,
            "sf10_uniform_warm_min": ref,
            "wall_ok": ref is None
            or warm <= max(SKEW_WALL_FACTOR * ref,
                           ref + SKEW_WALL_FLOOR_S),
        }
    out["walls"] = walls

    # funnel: one added user flips each step count by 0 or 1, and the
    # flips are monotone down the funnel (a user in step k is in k-1)
    fu = {r["step"]: r["n_users"] for r in
          registry["funnel_conversion_steps"].spark(spark, sf10).collect()}
    fs = {r["step"]: r["n_users"] for r in
          registry["funnel_conversion_steps"].spark(spark, skew_dir)
          .collect()}
    steps = sorted(fu, key=lambda s: -fu[s])  # funnel order
    deltas = [fs.get(s, 0) - fu[s] for s in steps]
    out["funnel_conversion_steps"] = {
        "deltas_down_funnel": deltas,
        "check": "deltas_in_01_and_monotone",
        "ok": set(fs) == set(fu)
        and all(d in (0, 1) for d in deltas)
        and all(a >= b for a, b in zip(deltas, deltas[1:])),
    }

    # retention: the hot user lands in exactly ONE cohort week; each
    # (cohort, offset) cell gains 0 or 1 users, gains confined to that
    # cohort, at least the offset-0 cell gains
    ru = {(r["cohort_week"], r["week_offset"]): r["n_users"] for r in
          registry["retention_cohort_weeks"].spark(spark, sf10).collect()}
    rs = {(r["cohort_week"], r["week_offset"]): r["n_users"] for r in
          registry["retention_cohort_weeks"].spark(spark, skew_dir)
          .collect()}
    gains = {k: rs[k] - ru.get(k, 0) for k in rs if rs[k] != ru.get(k, 0)}
    cohorts = {k[0] for k in gains}
    out["retention_cohort_weeks"] = {
        "gained_cells": {f"{k[0]}/{k[1]}": v for k, v in gains.items()},
        "check": "single_cohort_unit_gains",
        "ok": set(ru) <= set(rs)
        and all(v == 1 for v in gains.values())
        and len(cohorts) == 1
        and any(k[1] == 0 for k in gains),
    }

    # attribution: conversions are the user's PURCHASE EVENTS (the r15
    # rework), so the hot user legitimately adds ~10% of all
    # conversions and shifts cells — no identity-to-uniform invariant
    # exists. Run the strongest check instead: the full DuckDB oracle
    # on the SKEWED input, strict hash parity (the driver gate's
    # compare, at sf10, under the hot key). The r16 first-cut invariant
    # ("identical to uniform — hot user places no orders") failed
    # exactly here and was itself the bug: it still assumed the
    # orders-keyed attribution the probe killed in r15.
    from tests.oracle_harness import (
        duck_connection,
        fetch_oracle_df,
        strict_compare_frames,
    )

    qd = registry["attribution_revenue_touch"]
    spark_df = qd.spark(spark, skew_dir).toPandas()
    con = duck_connection(skew_dir)
    oracle_df, swap_note = fetch_oracle_df(
        con, "attribution_revenue_touch", qd.oracle
    )
    problems, _kinds = strict_compare_frames(spark_df, oracle_df)
    con.close()
    out["attribution_revenue_touch"] = {
        "check": "full_oracle_hash_parity_on_skewed_input",
        "problems": problems,
        "ok": not problems,
    }

    # heavy hitters: hot user is the new #1 with its exact count; the
    # rest is the uniform top-9 unchanged
    hu = [(r["user_id"], r["n"]) for r in
          registry["heavy_hitters_topk"].spark(spark, sf10).collect()]
    hs = [(r["user_id"], r["n"]) for r in
          registry["heavy_hitters_topk"].spark(spark, skew_dir).collect()]
    out["heavy_hitters_topk"] = {
        "hot_rank1": hs[0] if hs else None,
        "check": "hot_first_exact_then_uniform_top9",
        "ok": hs == [(hot_user, n_hot)] + hu[:9],
    }

    # streaming space-saving: 5 types per user <= m=16, so the sketch
    # stays EXACT even for the hot key — distributed full-join compare
    # against the batch groupBy (same check as the uniform phase)
    got = registry["stream_topk_user_event_types"].spark(spark, skew_dir)
    exact_counts = ev_skew.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    jj = got.join(exact_counts, ["user_id", "event_type"], "full")
    bad = jj.filter(
        F.col("est_count").isNull()
        | F.col("n").isNull()
        | (F.col("est_count") != F.col("n"))
        | (F.col("max_err") != 0)
    ).count()
    out["stream_topk_user_event_types"] = {
        "mismatches": int(bad),
        "check": "sketch_exact_under_hot_key",
        "ok": bad == 0,
    }

    # flagship sessionize: the additive construction means every
    # ORIGINAL user's session row must be byte-identical to the uniform
    # run (distributed exceptAll both ways), and the hot user's single
    # giant session must aggregate its full stream exactly (num_lines =
    # its event count, envelope = its min/max ts, log_full length =
    # Σ len(event_type) + n−1 newlines — checked without collecting
    # the megastring)
    sess_u = registry["sessionize_events"].spark(spark, sf10)
    sess_s = registry["sessionize_events"].spark(spark, skew_dir)
    orig = sess_s.filter(F.col("user_id") != hot_user)
    extra = orig.exceptAll(sess_u).count()
    missing = sess_u.exceptAll(orig).count()
    hot_row = (
        sess_s.filter(F.col("user_id") == hot_user)
        .select(
            "num_lines",
            F.unix_micros("start_ts").alias("s"),
            F.unix_micros("end_ts").alias("e"),
            F.length("log_full").alias("flen"),
        )
        .collect()
    )
    hot_truth = (
        ev_skew.filter(F.col("user_id") == hot_user)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.unix_micros(F.min("ts")).alias("s"),
            F.unix_micros(F.max("ts")).alias("e"),
            (
                F.sum(F.length("event_type")) + F.count(F.lit(1)) - 1
            ).alias("flen"),
        )
        .first()
    )
    hot_ok = (
        len(hot_row) == 1
        and hot_row[0]["num_lines"] == hot_truth["n"]
        and hot_row[0]["s"] == hot_truth["s"]
        and hot_row[0]["e"] == hot_truth["e"]
        and hot_row[0]["flen"] == hot_truth["flen"]
    )
    out["sessionize_events"] = {
        "orig_rows_extra": int(extra),
        "orig_rows_missing": int(missing),
        "hot_num_lines": int(hot_row[0]["num_lines"]) if hot_row else None,
        "check": "original_sessions_identical_hot_session_exact",
        "ok": extra == 0 and missing == 0 and hot_ok,
    }

    # salted agg: the rewrite must stay semantically invisible under
    # the skew it exists for — distributed compare vs the plain groupBy
    sal = registry["salted_event_type_stats"].spark(spark, skew_dir)
    plain = ev_skew.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_p"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("tc_p"),
        F.min("user_id").cast("long").alias("mu_p"),
    )
    sj = sal.join(plain, "event_type", "full")
    sbad = sj.filter(
        (F.col("n") != F.col("n_p"))
        | (F.col("total_cents") != F.col("tc_p"))
        | (F.col("min_user") != F.col("mu_p"))
    ).count()
    out["salted_event_type_stats"] = {
        "mismatches": int(sbad),
        "check": "salted_equals_plain_groupby",
        "ok": sbad == 0,
    }

    out["ok"] = all(
        v["ok"] for k, v in out.items() if isinstance(v, dict) and "ok" in v
    ) and all(w["wall_ok"] for w in walls.values())
    return out


SF100_FAMILY = "bigram_logprob_docs"


def build_sf100_docs(spark, sf10: str, sf100_dir: str,
                     doc_tag: str = "v") -> None:
    """documents-only THIRD-decade tile (VERDICT r16 task 7): tile the
    sf10 corpus 10x with a fresh word-suffix tag (the scale_up doc
    rule — "v" after sf1's "t" and sf10's "u" — so cross-tile bigram/
    shingle spaces never collide and per-tile statistics match sf10's).
    Only documents is materialized (~850 MB; the spot family reads
    nothing else); other tables symlink to sf10."""
    if os.path.exists(f"{sf100_dir}/documents.parquet"):
        return
    os.makedirs(sf100_dir, exist_ok=True)
    docs = spark.read.parquet(f"{sf10}/documents.parquet")
    d_off = docs.agg(F.max("doc_id")).first()[0] + 1

    def doc_tile(d, k):
        d = d.withColumn("doc_id", F.col("doc_id") + k * d_off)
        if k == 0:
            return d
        text = F.concat_ws(
            " ",
            F.transform(
                F.split(F.trim(F.col("text")), " +"),
                lambda w: F.concat(w, F.lit(f"_{doc_tag}{k}")),
            ),
        )
        return d.withColumn("text", text).withColumn(
            "n_chars", F.length(text)
        )

    out = doc_tile(docs, 0)
    for k in range(1, 10):
        out = out.unionByName(doc_tile(docs, k))
    out.repartition(
        spark.sparkContext.defaultParallelism
    ).write.mode("overwrite").parquet(f"{sf100_dir}/documents.parquet")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        dst = f"{sf100_dir}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(os.path.abspath(f"{sf10}/{t}.parquet"), dst)


def sf100_spot(spark, registry, sf10: str, sf100_dir: str) -> dict:
    """Push ONE family a second decade, sf10 -> sf100 (VERDICT r16 task
    7): the measured sf1->sf10 ratios only certify one decade; a
    materialization-shaped defect (the pagerank r15 class) often hides
    one decade up. bigram_logprob_docs is the pick — the table's own
    history (8.46 -> 2.16 after the single-exchange rework) plus
    vocabulary-squared pressure: at sf100 the corpus carries ~266M
    bigram instances. Invariant is the same closed form as the sf10
    phase: the word-suffix transform preserves whitespace, so rows and
    Σ n_bigrams are BOTH exactly 10x sf10's. 1 cold + 2 warm passes per
    decade in one fresh-session protocol; the decade ratio uses
    warm-min like the main table."""
    qd = registry[SF100_FAMILY]

    def passes(sf):
        walls = []
        for _p in range(3):
            t0 = time.perf_counter()
            qd.spark(spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.perf_counter() - t0, 3))
            gc.collect()
        return {"cold": walls[0], "warm_min": min(walls[1:])}

    t10 = passes(sf10)
    t100 = passes(sf100_dir)
    ratio = round(t100["warm_min"] / max(t10["warm_min"], 1e-9), 2)

    agg10 = (
        qd.spark(spark, sf10)
        .agg(F.count(F.lit(1)).alias("r"), F.sum("n_bigrams").alias("s"))
        .first()
    )
    agg100 = (
        qd.spark(spark, sf100_dir)
        .agg(F.count(F.lit(1)).alias("r"), F.sum("n_bigrams").alias("s"))
        .first()
    )
    return {
        "family": SF100_FAMILY,
        "sf10": t10,
        "sf100": t100,
        "warm_min_ratio": ratio,
        "sub_quadratic": ratio <= RATIO_BOUND,
        "rows_sf10": int(agg10["r"]),
        "rows_sf100": int(agg100["r"]),
        "bigrams_sf10": int(agg10["s"]),
        "bigrams_sf100": int(agg100["s"]),
        "check": "second_decade_ratio_and_rows_bigrams_exact_10x",
        "ok": ratio <= RATIO_BOUND
        and agg100["r"] == 10 * agg10["r"]
        and agg100["s"] == 10 * agg10["s"],
    }


def main() -> int:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    skip_build = "--skip-build" in sys.argv
    skew_only = "--skew-only" in sys.argv
    sf100_only = "--sf100-spot" in sys.argv
    sf1 = argv[0] if len(argv) > 0 else "/tmp/sf1"
    sf10 = argv[1] if len(argv) > 1 else "/tmp/sf10"
    skew_dir = sf10.rstrip("/") + "skew"

    # the probe's sf10 workload needs heap headroom the 8g default
    # doesn't give a 1 000+-stage session (r15: pagerank/invariants
    # OOM'd nondeterministically at 8g even post-fix); a probe is a
    # scale experiment, not the driver gate, so it gets 16g unless the
    # caller overrides (the 128 GiB host has ample room)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

    from log_analysis_bigdata_spark.queries import all_queries
    from log_analysis_bigdata_spark.session import get_spark

    spark = get_spark(app_name="scale_probe")
    registry = all_queries()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(here, "BENCH_SF10_LOCAL.json")

    if sf100_only:
        # second-decade spot probe against an existing artifact
        with open(out_path) as fh:
            res = json.load(fh)
        sf100_dir = sf10.rstrip("/") + "0docs"
        build_sf100_docs(spark, sf10, sf100_dir)
        res["sf100_spot"] = sf100_spot(spark, registry, sf10, sf100_dir)
        res["all_ok"] = bool(res.get("all_ok")) and res["sf100_spot"]["ok"]
        with open(out_path, "w") as fh:
            json.dump(res, fh, indent=1)
            fh.write("\n")
        print(json.dumps(res["sf100_spot"], indent=1))
        spark.stop()
        return 0 if res["sf100_spot"]["ok"] else 1

    if skew_only:
        # iterate on the skew phase alone against an existing artifact
        with open(out_path) as fh:
            res = json.load(fh)
        warms = {
            n: f["sf10"]["warm_min"] for n, f in res["families"].items()
        }
        build_skew_tile(spark, sf10, skew_dir)
        spark.range(1000).count()
        res["skew_tile"] = skew_probe(spark, registry, sf10, skew_dir, warms)
        build_dup_class_tile(spark, sf10, sf10.rstrip("/") + "dupclass")
        res["dup_class_tile"] = dup_class_probe(
            spark, registry, sf10, sf10.rstrip("/") + "dupclass", warms
        )
        res["skew_tile"]["ok"] = (
            res["skew_tile"]["ok"] and res["dup_class_tile"]["ok"]
        )
        # recompute from parts: the pre-skew checkpoint pins all_ok
        # False, so AND-ing with it would never recover
        res["all_ok"] = (
            all(f["sub_quadratic"] for f in res["families"].values())
            and isinstance(res.get("invariants"), dict)
            and all(i["ok"] for i in res["invariants"].values())
            and res["skew_tile"]["ok"]
        )
        with open(out_path, "w") as fh:
            json.dump(res, fh, indent=1)
            fh.write("\n")
        print(json.dumps({"skew_ok": res["skew_tile"]["ok"],
                          "walls": res["skew_tile"]["walls"]}, indent=1))
        spark.stop()
        return 0 if res["skew_tile"]["ok"] else 1

    if not skip_build:
        from tools.scale_up import build

        t0 = time.perf_counter()
        # signflip + fresh "u" tag: BOTH level-1 transforms (rotation,
        # "_t{k}" word suffix) collide with themselves when re-applied
        # to an already-scaled src — see scale_up.build's docstring
        build(spark, sf10, 10, src=sf1, emb_mode="signflip", doc_tag="u")
        print(f"built {sf10} in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr)

    spark.range(1000).count()  # session warm-up

    res = {"sf1_dir": sf1, "sf10_dir": sf10, "families": {}}
    t_sf1 = timed_passes(spark, registry, sf1)
    # fresh session for the sf10 decade: ~1 400 stages of sf1 passes
    # leave enough driver-heap residue (result buffers, block/broadcast
    # metadata, streaming state providers) that the sf10 heavyweights
    # OOM nondeterministically on an old heap. Warm/cold semantics are
    # PER-SF (pass 1 cold, 2-3 warm within one session), so recycling
    # between the decades changes no measurement.
    spark.stop()
    spark = get_spark(app_name="scale_probe_sf10")
    spark.range(1000).count()
    t_sf10 = timed_passes(spark, registry, sf10)
    for name in FAMILIES:
        ratio = round(
            t_sf10[name]["warm_min"] / max(t_sf1[name]["warm_min"], 1e-9), 2
        )
        res["families"][name] = {
            "sf1": t_sf1[name],
            "sf10": t_sf10[name],
            "warm_min_ratio": ratio,
            "sub_quadratic": ratio <= RATIO_BOUND,
        }

    # crash-safe: persist the (expensive) timing phase immediately —
    # the r15 run lost ~50 min of timings when the invariants phase
    # later exhausted a 6-pass-old heap
    with open(out_path, "w") as fh:
        json.dump({**res, "invariants": "PENDING", "all_ok": False}, fh,
                  indent=1)
        fh.write("\n")

    # recycle the session between phases: 6 interleaved passes × 19
    # families leave a long-lived driver heap (result buffers, block
    # metadata, state-store providers) that the invariants phase then
    # OOMs on — a fresh JVM-side session resets it. getOrCreate() would
    # return the stopped session's builder config but a NEW context.
    spark.stop()
    spark = get_spark(app_name="scale_probe_invariants")
    spark.range(1000).count()

    res["invariants"] = invariants(spark, registry, sf1, sf10)

    # crash-safe checkpoint before the skew phase
    res["all_ok"] = False
    with open(out_path, "w") as fh:
        json.dump({**res, "skew_tile": "PENDING"}, fh, indent=1)
        fh.write("\n")

    # fresh session for the hot-key phase (same heap-residue reasoning
    # as between the decades)
    spark.stop()
    spark = get_spark(app_name="scale_probe_skew")
    spark.range(1000).count()
    build_skew_tile(spark, sf10, skew_dir)
    warms_map = {n: f["sf10"]["warm_min"] for n, f in res["families"].items()}
    res["skew_tile"] = skew_probe(spark, registry, sf10, skew_dir, warms_map)
    build_dup_class_tile(spark, sf10, sf10.rstrip("/") + "dupclass")
    res["dup_class_tile"] = dup_class_probe(
        spark, registry, sf10, sf10.rstrip("/") + "dupclass", warms_map
    )

    res["all_ok"] = (
        all(f["sub_quadratic"] for f in res["families"].values())
        and all(i["ok"] for i in res["invariants"].values())
        and res["skew_tile"]["ok"]
        and res["dup_class_tile"]["ok"]
    )

    with open(out_path, "w") as fh:
        json.dump(res, fh, indent=1)
        fh.write("\n")
    print(json.dumps(
        {
            "all_ok": res["all_ok"],
            "ratios": {
                n: f["warm_min_ratio"] for n, f in res["families"].items()
            },
            "invariants": {
                n: i["ok"] for n, i in res["invariants"].items()
            },
            "skew_tile_ok": res["skew_tile"]["ok"],
        },
        indent=1,
    ))
    spark.stop()
    return 0 if res["all_ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
