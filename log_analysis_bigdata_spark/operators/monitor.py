"""Zero-extra-pass pipeline health metrics via ``Dataset.observe``.

The reference has no ingest monitoring at all — failures surface as
printouts on the consumer thread (kafka_consumer.py:38-40). The engine
rendering attaches named accumulator-backed metrics to the SAME job that
does the work: ``df.observe(Observation, ...)`` evaluates aggregate
expressions per task as rows stream through, so row counts / null rates /
value bounds cost no second scan — at 100 TB a separate COUNT pass is a
second 100 TB read; observation metrics are free.

Batch: read ``Observation.get`` after any action. Streaming: the same
``observe`` call surfaces per-micro-batch under
``StreamingQueryProgress.observedMetrics`` — one metric definition serves
both engines, same philosophy as the shared batch/stream transforms.

KNOWN SPARK GOTCHA (4.1, verified here): an object-form ``Observation``
registers with the session's ``ObservationManager`` and that manager then
rides along in later RDD-closure serialization — a subsequent
``pyspark.ml`` fit ON THE SAME SESSION dies with ``Task not
serializable: ObservationManager``. When mixing batch observations with
MLlib in one process, attach observations in an isolated
``spark.newSession()`` (shares the SparkContext, owns its SessionState)
— the pattern tests/test_operators.py demonstrates. Streaming's
name-form observe does not register an Observation and is unaffected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def ingest_health_metrics(
    required_cols: list[str], value_col: str | None = None
) -> list[Column]:
    """The default ingest-gate metric set: total rows, per-column null
    counts, and (optionally) the value column's min/max envelope."""
    metrics: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in required_cols:
        # coalesce: sum over ZERO rows is NULL, and a downstream gate
        # asserting n_null_col == 0 would evaluate NULL on an empty
        # micro-batch — empty input must report 0 nulls (ADVICE r5)
        metrics.append(
            F.coalesce(
                F.sum(F.col(c).isNull().cast("long")), F.lit(0)
            ).alias(f"n_null_{c}")
        )
    if value_col is not None:
        metrics.append(F.min(value_col).alias(f"min_{value_col}"))
        metrics.append(F.max(value_col).alias(f"max_{value_col}"))
    return metrics


def observed(
    df: DataFrame, name: str, *metrics: Column
) -> tuple[DataFrame, Observation | None]:
    """Attach the metric expressions; returns (df, observation).

    Batch: ``observation.get`` after any action on (a descendant of) the
    returned df. Streaming: Spark requires the name-only observe form
    (one Observation can't hold one value per micro-batch), so the
    second element is None and the per-batch values arrive under
    ``StreamingQueryProgress.observedMetrics[name]`` — read
    ``query.lastProgress``/``recentProgress`` or a
    StreamingQueryListener."""
    if df.isStreaming:
        return df.observe(name, *metrics), None
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
