"""As-of join — an operator Spark lacks natively, composed from
union + window so it scales with one shuffle and zero range explosion.

Semantics (matching DuckDB/kdb/pandas `merge_asof` backward direction):
for every left row, attach the single right row with the same key and
the greatest right.ts <= left.ts (nothing if no such row).

The naive renderings both fail at 100 TB: a non-equi join
(l.key = r.key AND r.ts <= l.ts) + row_number is a broadcast-nested-loop
or exploding theta join; per-key collect_list breaks on big keys. The
composition here is the scale-safe classic:

1. union both sides into one keyed stream, right rows tagged 0 and left
   rows tagged 1 so a right row at ts == left.ts sorts FIRST (inclusive
   <= semantics);
2. one window over (key) ordered by (ts, tag, right-payload) —  the
   payload struct is the deterministic tiebreaker when several right
   rows share (key, ts): the greatest payload wins, run-to-run stable;
3. ``last(payload struct, ignoreNulls=True)`` carries the most recent
   right MATCH forward as a unit — a NULL field inside the latest match
   is preserved (per-column last(ignorenulls) would skip it and carry a
   staler value, diverging from merge_asof);
4. keep only left rows.

Cost: one hash shuffle on the key + one in-partition sort — the same
price as a plain equi-join, independent of how far back the match is.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """left columns + (for each v in value_cols) the as-of right value.

    ``right`` must contain ``key``, ``right_ts`` and ``value_cols``;
    column names in ``value_cols`` must not collide with left's.

    Requirements/semantics (the payload struct participates in the window
    ORDER BY as the deterministic tiebreaker):
    - every ``value_cols`` type must be ORDERABLE — a map-typed value
      column fails at analysis time; wrap it or exclude it from the sort
      by pre-deduping (key, ts) instead;
    - when several right rows share (key, ts), the GREATEST payload
      struct (field-by-field comparison in ``value_cols`` order) wins —
      run-to-run stable, but it diverges from pandas ``merge_asof``'s
      positional-last pick, which depends on input row order Spark
      doesn't preserve. Pre-dedupe (key, right_ts) upstream (the in-repo
      caller does) to make the two semantics coincide;
    - NULL-carry: the whole latest match is carried as a unit, so a NULL
      field inside it stays NULL (see module docstring).
    """
    rv_probe = right.select(
        F.struct(*[F.col(v) for v in value_cols]).alias("_rv")
    )
    lt = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(rv_probe.schema["_rv"].dataType).alias("_rv"),
    )
    rt = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(lt.schema["_l"].dataType).alias("_l"),
        F.struct(*[F.col(v) for v in value_cols]).alias("_rv"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_is_left", "_rv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lt.unionByName(rt).select(
        "_is_left",
        "_l",
        F.last("_rv", ignorenulls=True).over(w).alias("_rv"),
    )
    out_left = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_right = [F.col(f"_rv.{v}").alias(v) for v in value_cols]
    return carried.filter(F.col("_is_left") == 1).select(*out_left, *out_right)
