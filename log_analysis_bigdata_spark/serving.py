"""Serving API facade — the engine twin of the reference's query client
(`jobs/app/loghub-detection/hbase_client.py` + the Flask routes in
`app.py:190-411`), as one class over a typed detections DataFrame.

Differences by design (SURVEY §3 EP3): every predicate is a DataFrame
filter Catalyst pushes into the scan — no over-scan heuristics
(`hbase_client.py:286` reads limit*2 then truncates client-side), no
python-side sorts (`:302`), no rowkey gymnastics (`:89-99`), no
type-sniffing (`:186-219` — the table is typed). Methods return
DataFrames so callers compose further; `.limit()` keeps every query
top-k-shaped (TakeOrderedAndProject, no global sort).

The store is any keyed table the streaming job's upsert_sink maintains
(parquet locally, Delta/Iceberg on a deployment) — last-write-wins by
key, exactly the reference's HBase put semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ServingAPI:
    """Query surface over a detections table.

    Expected columns: a unique ``key`` (BlockId in the reference), an
    ordering timestamp ``ts_ms``, a ``score``, plus payload columns.
    Column names are constructor-injected so the same facade serves any
    keyed table (tests drive it with the events stand-in schema).
    """

    def __init__(
        self,
        detections: DataFrame,
        key_col: str = "key",
        ts_col: str = "ts_ms",
        score_col: str = "score",
    ) -> None:
        self.df = detections
        self.key = key_col
        self.ts = ts_col
        self.score = score_col

    def _newest_first(self, df: DataFrame) -> DataFrame:
        return df.orderBy(F.desc(self.ts), F.desc(self.key))

    # Q1 — app.py:233-254 / hbase_client.py:263-307
    def latest(self, limit: int = 100, prefix: str | None = None) -> DataFrame:
        df = self.df
        if prefix:
            df = df.filter(F.col(self.key).startswith(prefix))
        return self._newest_first(df).limit(limit)

    # Q2 — app.py:257-289 / hbase_client.py:309-346
    def by_key(self, limit: int = 50, **equals) -> DataFrame:
        df = self.df
        for col, val in equals.items():
            df = df.filter(F.col(col) == F.lit(val))
        return self._newest_first(df).limit(limit)

    # Q3 — app.py:292-326 / hbase_client.py:348-396
    def time_range(self, lo, hi, limit: int = 100) -> DataFrame:
        return self._newest_first(
            self.df.filter(F.col(self.ts).between(lo, hi))
        ).limit(limit)

    # Q4 — app.py:329-351 / hbase_client.py:398-431 (default 0.2)
    def high_score(self, threshold: float = 0.2, limit: int = 100) -> DataFrame:
        return self._newest_first(
            self.df.filter(F.col(self.score) >= F.lit(threshold))
        ).limit(limit)

    # Q5 — app.py:354-371 / hbase_client.py:556-613
    def stats(self, high_threshold: float = 0.2) -> DataFrame:
        return self.df.agg(
            F.count(F.lit(1)).alias("total"),
            F.countDistinct(self.key).alias("distinct_keys"),
            F.round(F.avg(self.score), 4).alias("avg_score"),
            F.sum(
                F.when(F.col(self.score) >= high_threshold, 1).otherwise(0)
            ).alias("high_score_count"),
        )

    # Q6 — app.py:374-411 / hbase_client.py:497-554: delete = anti-join
    # rewrite of the table (Delta DELETE on a real deployment)
    def delete_keys(self, keys: list) -> DataFrame:
        victims = (
            self.df.sparkSession.createDataFrame(
                [(k,) for k in keys], [self.key]
            )
        )
        return self.df.join(victims, self.key, "left_anti")

    # Q7 — dashboard.js:146-191's compound client-side filter, pushed down
    def compound(
        self,
        prediction: int | None = None,
        keyword: str | None = None,
        ts_lo=None,
        ts_hi=None,
        text_col: str = "log_full",
        prediction_col: str = "prediction",
        limit: int = 500,
    ) -> DataFrame:
        cond: Column = F.lit(True)
        if prediction is not None:
            cond = cond & (F.col(prediction_col) == prediction)
        if keyword:
            cond = cond & F.lower(F.col(text_col)).contains(keyword.lower())
        if ts_lo is not None and ts_hi is not None:
            cond = cond & F.col(self.ts).between(ts_lo, ts_hi)
        return self._newest_first(self.df.filter(cond)).limit(limit)
