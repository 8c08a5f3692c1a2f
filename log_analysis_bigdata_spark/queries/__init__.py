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
  (``sum(CAST(round(x*100) AS BIGINT))``): integer addition is
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


def all_queries() -> dict[str, QueryDef]:
    global _LOADED
    if not _LOADED:
        from . import (  # noqa: F401
            logq,
            mlq,
            multimodalq,
            pandasq,
            relational,
            servingq,
            streamq,
            textq,
            vectorq,
        )

        _LOADED = True
    return REGISTRY
