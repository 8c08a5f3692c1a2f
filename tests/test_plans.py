"""Physical-plan regression tests: the scale-critical plan properties
asserted from explain output, so a future edit can't silently trade a
broadcast for a sort-merge shuffle or un-push a filter.

These are the local-mode proxies for 100 TB behavior: a plan that
broadcasts dims, prunes columns, and pushes predicates here compiles to
the same strategy on a 1000-executor cluster (modulo AQE runtime
re-planning, which only improves on the static plan).
"""

from __future__ import annotations

import pytest

from log_analysis_bigdata_spark.queries import all_queries

from .conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = all_queries()[name].spark(spark, SF_SMOKE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_q5_dims_broadcast_no_sort_merge(spark):
    plan = _plan(spark, "q5_revenue_by_nation")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q6_filters_pushed_and_columns_pruned(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    assert "GreaterThanOrEqual(l_shipdate" in plan  # pushed range predicate
    assert "LessThan(l_shipdate" in plan
    # projection pruned to the 4 referenced columns
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert read.count(":") <= 5 and "l_extendedprice" in read
    assert "l_orderkey" not in read


def test_serving_latest_n_is_topk(spark):
    plan = _plan(spark, "serving_latest_n")
    assert "TakeOrderedAndProject" in plan  # not global sort + limit
    assert "Exchange" not in plan.split("TakeOrderedAndProject")[0]


def test_topk_orders_is_topk(spark):
    plan = _plan(spark, "topk_orders_by_price")
    assert "TakeOrderedAndProject" in plan


def test_q4_semi_join_with_pushed_date_filter(spark):
    plan = _plan(spark, "q4_priority_exists")
    assert "LeftSemi" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_exact_dedup_partial_aggregation(spark):
    """The dedup groupBy must partial-aggregate map-side (two
    HashAggregate nodes around one Exchange), not shuffle raw rows."""
    plan = _plan(spark, "dedup_exact_docs")
    before_exchange = plan.split("Exchange")[-1]
    assert "HashAggregate" in before_exchange


def test_scalar_pipeline_stays_in_codegen(spark):
    """parse_raw_logs (regex extraction) must be one WholeStageCodegen
    span over the scan — no Python, no extra exchanges."""
    plan = _plan(spark, "parse_raw_logs")
    assert "codegen id" in plan  # formatted mode marks codegen spans per node
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # narrow: parse is shuffle-free
