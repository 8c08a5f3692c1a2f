"""Skew mitigation: salted two-stage aggregation and salted broadcast-
replicated joins.

The reference never deals with skew (its only hot key space, BlockId, is
near-uniform), but at 100 TB real event streams are Zipfian — one
event_type or user_id can dwarf every other group, and AQE's skew-join
splitting only covers sort-merge joins, not aggregations. These helpers
encode the classic rewrites:

- :func:`salted_agg` — stage 1 groups on (key, salt) so the hot key's
  rows spread over `salt_buckets` reducers; stage 2 merges the partial
  results on the true key. Works for any algebraic aggregate
  (sum/count/min/max); averages decompose as sum+count.
- :func:`salted_join` — explode the *small* side once per salt value so
  the big side can join on (key, salt) without concentrating a hot key
  on one task. For dim-sized small sides prefer plain broadcast; this is
  for the mid-sized case where broadcast is too big and one key is hot.

Both preserve semantics exactly (the oracle-checked
``salted_event_type_stats`` query compares against the unsalted SQL).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial: dict[str, Column],
    final: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation over salted keys.

    ``partial`` maps intermediate column name → aggregate over the raw
    rows (stage 1, grouped on keys+salt); ``final`` maps output column
    name → aggregate over those intermediates (stage 2, grouped on keys).
    Example (count + sum + min)::

        salted_agg(
            events, ["event_type"],
            partial={"c": F.count(F.lit(1)), "s": F.sum("value")},
            final={"n": F.sum("c"), "total": F.sum("s")},
        )
    """
    # any row→salt assignment yields the same final result; rand spreads
    # a hot key uniformly over the buckets
    salted = df.withColumn(SALT, F.floor(F.rand(42) * salt_buckets).cast("int"))
    stage1 = salted.groupBy(*keys, SALT).agg(
        *[expr.alias(name) for name, expr in partial.items()]
    )
    return stage1.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in final.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join where `big[key]` is skewed: salt the big side, replicate
    the small side across all salt values, join on (key, salt).

    Output columns = big's ∪ small's (salt dropped), equal to the plain
    inner join on `key`.
    """
    big_s = big.withColumn(
        SALT, F.floor(F.rand(42) * salt_buckets).cast("int")
    )
    small_s = small.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return big_s.join(small_s, [key, SALT]).drop(SALT)
