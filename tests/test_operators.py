"""Operator-level unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from log_analysis_bigdata_spark.catalog import load_table

from .conftest import SF_SMOKE

def test_salted_join_equals_plain_join(spark):
    from log_analysis_bigdata_spark.operators.skew import salted_join

    big = load_table(spark, SF_SMOKE, "orders").select("o_custkey", "o_orderkey")
    small = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = big.join(small, "o_custkey")
    salted = salted_join(big, small, "o_custkey", salt_buckets=4)
    assert salted.count() == plain.count()
    assert sorted(salted.columns) == sorted(plain.columns)
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
