"""Every registered query must hash-match its DuckDB oracle — the local
twin of the driver's CORRECTNESS gate, run at sf0.001 for speed.

Uses the SAME strict compare + oracle-fetch implementation as the full
sweep tool (tools/driver_parity.py) — see tests/oracle_harness.py
(VERDICT r8 task 8: one implementation, two entry points)."""

from __future__ import annotations

import pytest

from log_analysis_bigdata_spark.queries import all_queries

from .conftest import SF_ORACLE
from .oracle_harness import (
    duck_connection,
    fetch_oracle_df,
    strict_compare_frames,
)

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
    spdf = qd.spark(spark, SF_ORACLE).toPandas()
    dpdf, _note = fetch_oracle_df(duck, name, qd.oracle)
    problems, _kind_notes = strict_compare_frames(spdf, dpdf)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_all_queries_return_rows(spark):
    for name, qd in QUERIES.items():
        df = qd.spark(spark, SF_ORACLE)
        assert df.columns, f"{name} has no columns"
