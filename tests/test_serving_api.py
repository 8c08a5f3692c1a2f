"""ServingAPI facade: every route shape against a small keyed table."""

from __future__ import annotations

from pyspark.sql import functions as F

from log_analysis_bigdata_spark.serving import ServingAPI


def _api(spark):
    rows = [
        ("blk_1", 1000, 0.95, 1, "Receiving block blk_1 failed"),
        ("blk_2", 2000, 0.10, 0, "PacketResponder terminating"),
        ("blk_3", 3000, 0.40, 1, "Received block blk_3 of size 5"),
        ("tenant_a#h1", 4000, 0.05, 0, "ok"),
    ]
    df = spark.createDataFrame(
        rows, ["key", "ts_ms", "score", "prediction", "log_full"]
    )
    return ServingAPI(df)


def test_latest_with_prefix(spark):
    api = _api(spark)
    assert [r["key"] for r in api.latest(2).collect()] == ["tenant_a#h1", "blk_3"]
    assert [r["key"] for r in api.latest(10, prefix="blk_").collect()] == [
        "blk_3", "blk_2", "blk_1",
    ]


def test_by_key_and_time_range(spark):
    api = _api(spark)
    assert api.by_key(key="blk_2").first()["ts_ms"] == 2000
    got = [r["key"] for r in api.time_range(1500, 3500).collect()]
    assert got == ["blk_3", "blk_2"]


def test_high_score_default_threshold(spark):
    api = _api(spark)
    assert {r["key"] for r in api.high_score().collect()} == {
        "blk_1", "blk_3",
    }  # >= 0.2, the reference's default


def test_stats_single_agg(spark):
    r = _api(spark).stats().first()
    assert r["total"] == 4 and r["distinct_keys"] == 4
    assert r["high_score_count"] == 2
    assert abs(r["avg_score"] - round((0.95 + 0.10 + 0.40 + 0.05) / 4, 4)) < 1e-9


def test_delete_is_anti_join(spark):
    api = _api(spark)
    left = api.delete_keys(["blk_1", "blk_3"])
    assert {r["key"] for r in left.collect()} == {"blk_2", "tenant_a#h1"}


def test_compound_filter(spark):
    api = _api(spark)
    got = api.compound(prediction=1, keyword="BLOCK", ts_lo=0, ts_hi=2500)
    assert [r["key"] for r in got.collect()] == ["blk_1"]
