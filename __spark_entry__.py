"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship sessionization query at sf0.001;
``queries()``/``oracle_sql()`` expose the engine's operator catalog
(log_analysis_bigdata_spark.queries) for the DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from log_analysis_bigdata_spark.queries import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: block sessionization —
    the reference's cells 26-29 semantics (min/max/count + ordered full
    text per session key)."""
    q = all_queries()["sessionize_events"]
    return q.spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.spark for name, qd in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted for
    non-SQL-expressible ops → rows-only check)."""
    return {
        name: qd.oracle
        for name, qd in all_queries().items()
        if qd.oracle is not None
    }
