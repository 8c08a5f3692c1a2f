"""Every registered query must hash-match its DuckDB oracle — the local
twin of the driver's CORRECTNESS gate, run at sf0.001 for speed."""

from __future__ import annotations

import pytest

from log_analysis_bigdata_spark.queries import all_queries

from .conftest import SF_ORACLE
from .oracle_harness import compare_results, duck_connection

QUERIES = all_queries()
WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    qd = QUERIES[name]
    df = qd.spark(spark, SF_ORACLE)
    problems = compare_results(df, duck, qd.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_all_queries_return_rows(spark):
    for name, qd in QUERIES.items():
        df = qd.spark(spark, SF_ORACLE)
        assert df.columns, f"{name} has no columns"
