"""Block/key sessionization — the reference's A3/A4 operators.

Reference: ``prepare_data_batch.ipynb:813-825 (cell 28)`` groups parsed
lines by BlockId and aggregates ``min(datetime), max(datetime), count(*),
sort_array(collect_list(struct(datetime, clean_line)))``; cell 29
(``:842-847``) finalizes ``log_full = array_join(transform(lines,
x -> x.clean_line), '\\n')`` and ``duration_sec = end.cast(long) −
start.cast(long)``.

Scale notes (100 TB): one hash-shuffle on the session key, with map-side
partial aggregation for min/max/count. ``collect_list`` is the one
intrinsically heavy part (the whole session text moves through the
shuffle); it is gated behind ``with_full_text`` so callers that only need
session envelopes (start/end/duration/num_lines) never pay for it.
Ordering ties break by struct comparison (ts, then line) exactly like the
reference's ``sort_array`` of ``struct(datetime, clean_line)`` — SURVEY
§7 hard-part #1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    line_col: str | None = None,
    with_full_text: bool = True,
) -> DataFrame:
    """(key, start_ts, end_ts, duration_sec, num_lines[, log_full])."""
    aggs = [
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        F.count(F.lit(1)).alias("num_lines"),
    ]
    if with_full_text and line_col is not None:
        aggs.append(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col(ts_col), F.col(line_col)))
                    ),
                    lambda x: x[line_col],
                ),
                "\n",
            ).alias("log_full")
        )
    out = df.groupBy(F.col(key_col)).agg(*aggs)
    out = out.withColumn(
        "duration_sec",
        F.col("end_ts").cast("long") - F.col("start_ts").cast("long"),
    )
    cols = [key_col, "start_ts", "end_ts", "duration_sec", "num_lines"]
    if with_full_text and line_col is not None:
        cols.append("log_full")
    return out.select(*cols)


def label_sessions(
    sessions: DataFrame, labels: DataFrame, key_col: str
) -> DataFrame:
    """Left-join ground-truth labels onto sessions — reference J2
    (``prepare_data_batch.ipynb:858-865``). The label dim is small
    relative to sessions only in some deployments, so no broadcast hint:
    AQE picks broadcast when the build side fits."""
    return sessions.join(labels, on=key_col, how="left")
