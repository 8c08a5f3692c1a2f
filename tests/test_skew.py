"""Adversarial-skew stress tests (VERDICT r8 task 5).

The skew-mitigation paths (operators/skew.py salting, SemDeDup's
rank-sub-cell pair cap) claim safety under hot keys, but the driver
testdata is near-uniform. These tests generate genuinely adversarial
distributions (tools/skew_fixture.py):

- events with Zipf(1.5) user_id / event_type — the top user owns ~38%
  of all rows, the distribution where one reducer melts;
- an embeddings corpus of IDENTICAL vectors — every centroid distance
  ties exactly, so the tie-break routes the entire corpus into ONE
  cell (maximum cell skew).

and assert (a) the salted paths return rows IDENTICAL to their
unsalted twins, (b) salting provably bounds the max shuffle-partition
row count vs the unsalted key partitioning, and (c) the sub-cell cap
turns the would-be quadratic one-cell pair join into the predicted
capped pair count — with the DuckDB oracle agreeing bit-for-bit on the
all-ties corpus (the adversarial probe of the argmin tie-break mirror).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tools.skew_fixture import make_tied_embeddings, make_zipf_events

N_ROWS = 300_000
SALT_BUCKETS = 16
SHUFFLE_P = 32


@pytest.fixture(scope="module")
def zipf_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("zipf"))
    stats = make_zipf_events(d, n_rows=N_ROWS, seed=7)
    # the fixture must actually BE adversarial or the bounds below
    # prove nothing
    assert stats["top_user_share"] >= 0.30
    assert stats["top_type_share"] >= 0.30
    return d


def _events(spark, d):
    from log_analysis_bigdata_spark.catalog import load_table

    return load_table(spark, d, "events")


def test_salted_agg_identical_rows_on_zipf(spark, zipf_dir):
    from log_analysis_bigdata_spark.operators.skew import salted_agg

    ev = _events(spark, zipf_dir)
    salted = salted_agg(
        ev,
        ["event_type"],
        partial={
            "c": F.count(F.lit(1)),
            "s": F.sum(F.round(F.col("value") * 100).cast("long")),
        },
        final={"n": F.sum("c"), "total_cents": F.sum("s")},
        salt_buckets=SALT_BUCKETS,
    )
    plain = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias(
            "total_cents"
        ),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_join_identical_rows_on_zipf(spark, zipf_dir):
    from log_analysis_bigdata_spark.operators.skew import salted_join

    ev = _events(spark, zipf_dir).select("event_id", "user_id", "value")
    users = (
        _events(spark, zipf_dir)
        .select("user_id")
        .distinct()
        .withColumn("segment", (F.col("user_id") % 5).cast("int"))
    )
    salted = salted_join(ev, users, "user_id", salt_buckets=8)
    plain = ev.join(users, "user_id")
    cols = sorted(salted.columns)
    assert cols == sorted(plain.columns)
    assert sorted(map(tuple, salted.select(*cols).collect())) == sorted(
        map(tuple, plain.select(*cols).collect())
    )


def test_salting_bounds_max_shuffle_partition(spark, zipf_dir):
    """The measurable skew claim: hash-partitioning the zipf events by
    the bare hot key concentrates the top user's ~38% of rows in ONE
    partition; partitioning by (key, salt) spreads them over the salt
    buckets. Max-partition row count must drop by >=4x (measured ~10x)."""
    from log_analysis_bigdata_spark.operators.skew import SALT

    ev = _events(spark, zipf_dir).select("user_id", "value")

    def max_part(df, *keys):
        return (
            df.repartition(SHUFFLE_P, *keys)
            .groupBy(F.spark_partition_id().alias("p"))
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )

    unsalted = max_part(ev, "user_id")
    salted_df = ev.withColumn(
        SALT, F.floor(F.rand(42) * SALT_BUCKETS).cast("int")
    )
    salted = max_part(salted_df, "user_id", SALT)
    assert unsalted >= 0.30 * N_ROWS  # the hot key really concentrates
    assert salted * 4 <= unsalted, (
        f"salting only reduced max partition {unsalted} -> {salted}"
    )


def test_semdedup_subcell_caps_adversarial_cell(spark, tmp_path):
    """All-identical vectors tie every centroid distance, so the
    deterministic tie-break assigns the ENTIRE corpus to the lowest
    cell id — the worst-case skewed cell. The rank-sub-cell cap must
    bound the pair join to ceil(m/W) within-sub blocks (exact expected
    pair count, not O(m^2)), and the DuckDB oracle must agree
    bit-for-bit on this all-ties corpus (adversarial probe of the
    engine/oracle argmin tie-break mirror)."""
    import duckdb

    from log_analysis_bigdata_spark.queries import all_queries
    from log_analysis_bigdata_spark.queries.vectorq import (
        SEMDEDUP_SPLIT_WIDTH,
    )
    from tests.oracle_harness import strict_compare_frames

    d = str(tmp_path)
    n = make_tied_embeddings(d)["n_vecs"]
    qd = all_queries()["semdedup_embedding_cells"]
    spdf = qd.spark(spark, d).toPandas()

    # one row: every vector in cell 0 (tie-break to lowest cell id)
    assert list(spdf["cell"]) == [0]
    assert int(spdf["n_members"][0]) == n
    # capped pair count: rank sub-cells of width W, all-pairs inside
    w = SEMDEDUP_SPLIT_WIDTH
    widths = [w] * (n // w) + ([n % w] if n % w else [])
    expected_pairs = sum(m * (m - 1) // 2 for m in widths)
    assert expected_pairs < n * (n - 1) // 2  # the cap actually bit
    assert int(spdf["n_dup_pairs"][0]) == expected_pairs
    assert int(spdf["n_dropped"][0]) == n - len(widths)
    assert math.comb(n, 2) // expected_pairs >= 3  # >=3x work reduction

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet')"
    )
    dpdf = con.execute(qd.oracle).fetchdf()
    problems, _ = strict_compare_frames(spdf, dpdf)
    assert not problems, "; ".join(problems)


def test_heavy_hitters_sketch_arm_exact_on_skew(spark, zipf_dir, monkeypatch):
    """The r9 sf1 sweep showed the space-saving arm losing recall on
    near-uniform keys; the fix gates it behind a cardinality check AND
    a per-run completeness certificate. This test runs the SKETCH arm
    directly on the genuinely Zipfian fixture — its home regime — and
    requires (a) its top-10 to equal the exact answer and (b) the U
    certificate to PASS there (10th count > U, so the sketch result is
    provably complete, no fallback); it then verifies the registered
    query (exact arm for this 40k-key corpus) returns the same rows."""
    from log_analysis_bigdata_spark.queries import relational as R

    ev = _events(spark, zipf_dir).select("user_id")
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "user_id")
        .limit(10)
        .collect()
    )
    sk_counts, bound = R._hh_sketch_counts(ev)
    sketch = (
        sk_counts.orderBy(F.desc("n"), "user_id").limit(10).collect()
    )
    assert [tuple(r) for r in sketch] == [tuple(r) for r in exact]
    assert sketch[-1]["n"] > bound  # certificate passes on real skew

    # registered query on the same corpus: exact arm (40k keys < gate),
    # same answer
    monkeypatch.setattr(R, "load_table", lambda s, d, t: ev)
    got = R.heavy_hitters_topk(spark, zipf_dir).collect()
    assert [(r["user_id"], r["n"]) for r in got] == [
        (r["user_id"], r["n"]) for r in exact
    ]


def test_heavy_hitters_sketch_certificate_forces_fallback_on_uniform(
    spark, monkeypatch
):
    """Near-uniform keys are the distribution where per-batch local
    top-m cannot rank near-ties (the r9 sf1 failure). Force the sketch
    arm (gate at 0) on a uniform corpus and require the registered
    query to still return the EXACT answer — the U certificate must
    fail and trigger the exact-groupBy fallback, turning the old
    silent wrong answer into a correct one."""
    from log_analysis_bigdata_spark.queries import relational as R

    # 60k rows over 20k near-uniform keys (count 3 each, +1 for a few)
    ev = spark.range(60_000).selectExpr("id % 20000 AS user_id").select(
        "user_id"
    )
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "user_id")
        .limit(10)
        .collect()
    )
    _sk, bound = R._hh_sketch_counts(ev)
    assert bound >= 3  # certificate CANNOT pass: counts are all ~3

    monkeypatch.setattr(R, "HH_EXACT_MAX_KEYS", 0)  # force sketch arm
    monkeypatch.setattr(R, "load_table", lambda s, d, t: ev)
    got = R.heavy_hitters_topk(spark, "unused").collect()
    assert [(r["user_id"], r["n"]) for r in got] == [
        (r["user_id"], r["n"]) for r in exact
    ]


def test_heavy_hitters_sketch_arm_counts_null_keys(spark, monkeypatch):
    """ADVICE r9: pandas value_counts drops NaN and the recount
    equi-join can't match NULL, so a NULL group used to be invisible to
    the sketch arm — candidate list AND U bound both missed it. The fix
    counts NULL exactly in the gate pass and unions it into the sketch
    counts. Force the sketch arm on a corpus where NULL is a top-10
    key and the skew is strong enough for the certificate to PASS (so
    the exact fallback can't mask the bug) and require the NULL group
    to appear with its exact count."""
    from log_analysis_bigdata_spark.queries import relational as R

    # NULL every 8th row (5,000 rows); the rest log2-bucketed — ~16
    # keys with 2^k-style counts, so every Arrow batch holds < 50
    # distinct keys, every t_b is 0, U = 0 and the certificate passes.
    ev = spark.range(40_000).selectExpr(
        "CASE WHEN id % 8 = 0 THEN NULL"
        " ELSE CAST(log2(id + 1) AS BIGINT) END AS user_id"
    )
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc_nulls_last("user_id"))
        .limit(10)
        .collect()
    )
    assert any(r["user_id"] is None for r in exact)  # NULL is top-10

    monkeypatch.setattr(R, "HH_EXACT_MAX_KEYS", 0)  # force sketch arm
    monkeypatch.setattr(R, "load_table", lambda s, d, t: ev)
    got = R.heavy_hitters_topk(spark, "unused").collect()
    assert [(r["user_id"], r["n"]) for r in got] == [
        (r["user_id"], r["n"]) for r in exact
    ]
    null_rows = [r for r in got if r["user_id"] is None]
    assert len(null_rows) == 1 and null_rows[0]["n"] == 5_000


def test_embedding_dup_class_collapse_component_equivalent(spark, tmp_path):
    """r17 (VERDICT r16 task 4): byte-identical embeddings form a
    degenerate hyperplane-LSH bucket (every sign band agrees), so
    dedup_components routes through _near_dup_component_edges — exact
    classes star-collapse to their min vec_id before banding. Pins:
    (1) components are IDENTICAL to the uncollapsed pair generation's
    (the output-preservation proof at unit scale); (2) the class
    contributes exactly m star edges, and the banded join sees one
    representative (candidate volume O(naturals), never m²/2)."""
    from tools.skew_fixture import make_dup_class_embeddings

    from log_analysis_bigdata_spark.operators.components import (
        connected_components,
    )
    from log_analysis_bigdata_spark.queries.vectorq import (
        _near_dup_component_edges,
        embedding_near_dup,
    )

    d = str(tmp_path)
    meta = make_dup_class_embeddings(d, n_natural=200, m_dup=40)
    n_nat, m = meta["n_natural"], meta["m_dup"]

    edges = _near_dup_component_edges(spark, d)
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            edges, src="id_a", dst="id_b"
        ).collect()
    }
    pairs = embedding_near_dup(spark, d).select("id_a", "id_b")
    want = {
        r["node"]: r["component"]
        for r in connected_components(
            pairs, src="id_a", dst="id_b"
        ).collect()
    }
    assert got == want and got  # identical clustering, nonempty
    # the planted ids all collapse to vector 0's component
    for i in range(n_nat, n_nat + m):
        assert got[i] == 0
    # star contribution: the class's members appear exactly once as a
    # star target each in the collapsed edge list (id_a == 0 for them),
    # and the banded join carried ONE representative — so collapsed
    # edges among class ids are exactly the m star edges, while the
    # uncollapsed pair list is quadratic in the class
    class_ids = set(range(n_nat, n_nat + m)) | {0}
    star_edges = [
        r
        for r in edges.collect()
        if r["id_a"] in class_ids and r["id_b"] in class_ids
    ]
    assert len(star_edges) == m
    quad = pairs.filter(
        F.col("id_a").isin(list(class_ids))
        & F.col("id_b").isin(list(class_ids))
    ).count()
    assert quad == (m + 1) * m // 2  # the blowup the collapse avoids
