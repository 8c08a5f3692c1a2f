"""Grouped pandas-UDF surface: applyInPandas (grouped map) and
pandas_udf grouped aggregation.

Together with the scalar pandas UDF (mlq.ml_score_embeddings), the
mapInPandas operators (multimodal), applyInPandasWithState
(streaming.stateful), the cogroup applyInPandas (relational), and —
added round 6 — the Python UDTF (udtf_chunk_docs, ArrowEvalPythonUDTF)
and raw-Arrow mapInArrow (arrow_map_embedding_norms), this completes
every Python-execution shape Spark offers — each used only where column
expressions genuinely can't express the computation, each
Arrow-batched, never row-at-a-time.

Both queries here are chosen to be SQL-recomputable so the DuckDB oracle
can verify the UDF path end-to-end (same trick as ml_score_embeddings).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..catalog import load_table
from . import register


@register(
    "grouped_zscore_events",
    oracle="""
    WITH s AS (
      SELECT event_id, user_id, value,
             avg(value) OVER (PARTITION BY user_id) AS mu,
             stddev_samp(value) OVER (PARTITION BY user_id) AS sd
      FROM events
    )
    SELECT event_id, user_id,
           -- + 0.0 normalizes IEEE negative zero: a z-score that rounds
           -- to -0.0 reprs differently from 0.0 and fails the driver
           -- hash (surfaced by the r7 sf0.1 sweep, not visible at
           -- sf0.01)
           round(CASE WHEN sd IS NULL OR sd = 0 THEN 0.0
                      ELSE (value - mu) / sd END, 4) + 0.0 AS zscore
    FROM s
    """,
    tags=("pandas", "applyInPandas", "grouped-map", "window"),
)
def grouped_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score via applyInPandas (grouped map).

    The shape a per-group model-ish transform takes (normalization,
    per-entity detrending): one shuffle on the group key, then each
    group's whole frame visits Python once as an Arrow batch. Chosen
    deliberately SQL-expressible (window avg/stddev) so the oracle
    verifies the UDF; a real use-case would do something SQL can't
    (per-group sklearn fit, dynamic time warping, ...).

    Scale note: group = one user's events — thousands of rows at most,
    no skew risk; for giant groups prefer window functions or
    mapInPandas over pre-sorted partitions.
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        sd = pdf["value"].std()  # ddof=1 == stddev_samp
        mu = pdf["value"].mean()
        z = (pdf["value"] - mu) / sd if pd.notna(sd) and sd != 0 else 0.0
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                # + 0.0 folds IEEE -0.0 to 0.0 (same normalization as
                # the oracle and the window twin)
                "zscore": (z if not isinstance(z, float) else pd.Series(z, index=pdf.index)).round(4) + 0.0,
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        zscore, "event_id bigint, user_id bigint, zscore double"
    )


@register(
    "grouped_zscore_window",
    oracle="""
    WITH s AS (
      SELECT event_id, user_id, value,
             avg(value) OVER (PARTITION BY user_id) AS mu,
             stddev_samp(value) OVER (PARTITION BY user_id) AS sd
      FROM events
    )
    SELECT event_id, user_id,
           -- + 0.0 normalizes IEEE negative zero: a z-score that rounds
           -- to -0.0 reprs differently from 0.0 and fails the driver
           -- hash (surfaced by the r7 sf0.1 sweep, not visible at
           -- sf0.01)
           round(CASE WHEN sd IS NULL OR sd = 0 THEN 0.0
                      ELSE (value - mu) / sd END, 4) + 0.0 AS zscore
    FROM s
    """,
    tags=("window", "zscore", "scale-path"),
)
def grouped_zscore_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recommended 100 TB rendering of ``grouped_zscore_events``:
    identical output, but the per-user mean/stddev come from JVM window
    functions — whole-stage codegen end to end, zero Python/Arrow
    round-trips. Same single shuffle on user_id; Tungsten does the rest.
    The applyInPandas twin above exists to exercise (and oracle-verify)
    the grouped-map UDF surface; THIS is the plan to run at scale.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    w = Window.partitionBy("user_id")
    mu = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    z = F.when(sd.isNull() | (sd == 0), F.lit(0.0)).otherwise(
        (F.col("value") - mu) / sd
    )
    # + 0.0 folds IEEE -0.0 to 0.0 (oracle does the same); Spark and
    # DuckDB disagree on the sign of a zero-rounded negative otherwise
    return ev.select(
        "event_id", "user_id", (F.round(z, 4) + F.lit(0.0)).alias("zscore")
    )


@register(
    "grouped_agg_weighted_mean",
    oracle="""
    SELECT event_type,
           round(sum(value * (1 + event_id % 5)) / sum(1 + event_id % 5), 4)
             AS wmean
    FROM events
    GROUP BY event_type
    """,
    tags=("pandas", "grouped-agg", "udaf"),
)
def grouped_agg_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mean as a grouped-aggregate pandas UDF — Spark's Python
    UDAF shape (Series in → scalar out per group, partial Arrow batches).

    The weight (1 + event_id % 5) is computed JVM-side; only the two
    columns the UDAF needs cross into Python.
    """

    @pandas_udf("double")
    def wmean(v: pd.Series, w: pd.Series) -> float:
        return float((v * w).sum() / w.sum())

    ev = load_table(spark, sf_dir, "events")
    weight = (1 + F.col("event_id") % 5).cast("double")
    return (
        ev.groupBy("event_type")
        .agg(F.round(wmean(F.col("value"), weight), 4).alias("wmean"))
    )


@register(
    "per_user_model_fit",
    oracle="""
    SELECT user_id,
           round(regr_slope(value, epoch(ts) / 3600.0), 4) AS slope,
           round(regr_intercept(value, epoch(ts) / 3600.0), 4) AS intercept,
           round(regr_r2(value, epoch(ts) / 3600.0), 4) AS r2,
           count(*) AS n
    FROM events
    GROUP BY user_id
    """,
    tags=("pandas", "applyInPandas", "model-fit", "regression"),
)
def per_user_model_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group model fit through applyInPandas: an OLS line per user,
    numpy closed-form inside the grouped-map UDF, verified against SQL's
    regr_slope/intercept/r2 — the pattern for anything sklearn-shaped
    that SQL can't express (the oracle-checkable OLS stands in for it).

    One shuffle on user_id; each group's frame visits Python once. The
    closed-form moments (not lstsq) keep the arithmetic identical to the
    SQL regression aggregates.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        (F.col("ts").cast("double") / 3600.0).alias("x"),
        F.col("value").alias("y"),
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["x"].to_numpy(dtype="float64")
        y = pdf["y"].to_numpy(dtype="float64")
        n = len(x)
        mx, my = x.mean(), y.mean()
        sxx = ((x - mx) ** 2).sum()
        sxy = ((x - mx) * (y - my)).sum()
        syy = ((y - my) ** 2).sum()
        slope = sxy / sxx if sxx else float("nan")
        intercept = my - slope * mx
        r2 = (sxy * sxy) / (sxx * syy) if sxx and syy else float("nan")
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "slope": [round(slope, 4)],
                "intercept": [round(intercept, 4)],
                "r2": [round(r2, 4)],
                "n": [n],
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        fit, "user_id bigint, slope double, intercept double, r2 double, n bigint"
    )


@register(
    "per_user_regression_sql",
    oracle="""
    SELECT user_id,
           round(regr_slope(value, epoch(ts) / 3600.0), 4) AS slope,
           round(regr_intercept(value, epoch(ts) / 3600.0), 4) AS intercept,
           round(regr_r2(value, epoch(ts) / 3600.0), 4) AS r2,
           count(*) AS n
    FROM events
    GROUP BY user_id
    """,
    tags=("agg", "regression", "scale-path"),
)
def per_user_regression_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recommended 100 TB rendering of ``per_user_model_fit``:
    identical output via Spark's built-in linear-regression aggregates
    (``regr_slope`` / ``regr_intercept`` / ``regr_r2``) — mergeable
    map-side partials, no Python, no per-group Arrow batch. The
    applyInPandas twin above demos the grouped-map surface for fits SQL
    genuinely can't express; when the fit IS expressible (OLS), this
    plan wins by the whole Python round-trip.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        (F.col("ts").cast("double") / 3600.0).alias("x"),
        F.col("value").alias("y"),
    )
    return ev.groupBy("user_id").agg(
        F.round(F.expr("regr_slope(y, x)"), 4).alias("slope"),
        F.round(F.expr("regr_intercept(y, x)"), 4).alias("intercept"),
        F.round(F.expr("regr_r2(y, x)"), 4).alias("r2"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "cogroup_user_activity",
    oracle="""
    WITH e AS (SELECT user_id, count(*) AS n_events,
                      round(sum(value), 4) AS total_value
               FROM events GROUP BY user_id),
    o AS (SELECT o_custkey AS user_id, count(*) AS n_orders
          FROM orders GROUP BY o_custkey)
    SELECT coalesce(e.user_id, o.user_id) AS user_id,
           coalesce(e.n_events, 0) AS n_events,
           coalesce(e.total_value, 0.0) AS total_value,
           coalesce(o.n_orders, 0) AS n_orders
    FROM e FULL OUTER JOIN o ON e.user_id = o.user_id
    """,
    tags=("pandas", "cogroup", "applyInPandas", "weak-by-design"),
)
def cogroup_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas — the last Python execution shape: both
    tables shuffle once on the key and each key's two pandas frames
    arrive together in one Python call (the pattern for per-entity
    merge_asof / feature alignment across sources). Chosen
    SQL-recomputable (counts + sums == full outer join of group-bys) so
    the oracle verifies the cogroup path.

    WEAK-BY-DESIGN (same policy as per_user_model_fit /
    grouped_zscore_events): one Python call per user makes this the
    slowest registry entry at the sf1 sweep (23 s; per-group call
    overhead, not data volume). The JVM twin
    ``user_activity_full_join`` below computes the identical result as
    two group-bys + a full outer join and is the 100 TB path; reach for
    a real cogroup only when the per-key merge is imperative
    (merge_asof, stateful alignment) in a way joins can't express.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    od = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id")
    )

    def merge(evp: pd.DataFrame, odp: pd.DataFrame) -> pd.DataFrame:
        uid = evp["user_id"].iloc[0] if len(evp) else odp["user_id"].iloc[0]
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_events": [len(evp)],
                "total_value": [round(float(evp["value"].sum()), 4)],
                "n_orders": [len(odp)],
            }
        )

    return (
        ev.groupBy("user_id")
        .cogroup(od.groupBy("user_id"))
        .applyInPandas(
            merge,
            "user_id bigint, n_events bigint, total_value double, n_orders bigint",
        )
    )


@register(
    "user_activity_full_join",
    oracle="""
    WITH e AS (SELECT user_id, count(*) AS n_events,
                      round(sum(value), 4) AS total_value
               FROM events GROUP BY user_id),
    o AS (SELECT o_custkey AS user_id, count(*) AS n_orders
          FROM orders GROUP BY o_custkey)
    SELECT coalesce(e.user_id, o.user_id) AS user_id,
           coalesce(e.n_events, 0) AS n_events,
           coalesce(e.total_value, 0.0) AS total_value,
           coalesce(o.n_orders, 0) AS n_orders
    FROM e FULL OUTER JOIN o ON e.user_id = o.user_id
    """,
    tags=("join", "full-outer", "scale-path"),
)
def user_activity_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recommended 100 TB rendering of ``cogroup_user_activity``:
    identical output from two map-side-combinable group-bys + one full
    outer join — whole-stage codegen end to end, zero Python calls,
    ~15x the cogroup demo's throughput at the sf1 sweep (23.3 s -> 1.5 s). Same shuffle
    budget (each side once, on the key)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
    od = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        ev.join(od, "user_id", "full_outer")
        .select(
            "user_id",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        )
    )


@register(
    "udtf_chunk_docs",
    oracle="""
    WITH n AS (
      SELECT doc_id, string_split_regex(trim(text), ' +') AS tok,
             len(string_split_regex(trim(text), ' +')) AS n_tok
      FROM documents
    ), ex AS (
      SELECT doc_id, tok, n_tok,
             unnest(range(CAST(floor((n_tok - 1) / 15) AS BIGINT) + 1))
               AS chunk_idx
      FROM n
    )
    SELECT doc_id, chunk_idx,
           array_to_string(list_slice(tok, chunk_idx * 15 + 1,
             least(chunk_idx * 15 + 20, n_tok)), ' ') AS chunk_text
    FROM ex
    """,
    tags=("udtf", "python", "chunking", "weak-by-design"),
)
def udtf_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (Spark 3.5+/4 ``@udtf``): the one Python
    execution shape the module docstring's inventory was missing — a
    table function yielding N output rows per input row, lateral-joined
    in SQL. Demonstrated on the chunk_documents spec (size-20/stride-15
    sliding token windows) so the DuckDB oracle can verify the UDTF
    path end-to-end. Runs as ``ArrowEvalPythonUDTF`` — the session
    factory pins ``spark.sql.execution.pythonUDTF.arrow.enabled`` so
    batches cross to Python via Arrow, not row pickling (plan_audit
    treats row-serialized BatchEvalPython as a violation).

    WEAK-BY-DESIGN, same pattern as per_user_model_fit: even Arrow-fed,
    eval() is a per-row Python generator, so the JVM sequence+explode
    twin ``chunk_documents`` is the 100 TB path — this entry proves the
    API works and matches it bit-for-bit. Reach for a real UDTF only
    when the per-row expansion is imperative/stateful in a way HOFs
    can't express (e.g. a tokenizer with carry-over state).
    """
    import re
    import uuid

    from pyspark.sql.functions import lit, udtf

    from .textq import CHUNK_SIZE, CHUNK_STRIDE

    @udtf(returnType="doc_id bigint, chunk_idx bigint, chunk_text string")
    class ChunkUdtf:
        def eval(self, doc_id, text):  # noqa: ANN001 — runtime-typed row fn
            if text is None:
                return  # oracle's range(NULL) yields no rows
            # strip(" ") not strip(): SQL trim() removes SPACES only, so
            # bare strip() (which also eats \n/\t) would tokenize
            # differently from the oracle/JVM twin on texts with
            # trailing non-space whitespace
            toks = re.split(" +", text.strip(" "))
            n_tok = len(toks)
            n_chunks = (max(n_tok - 1, 0)) // CHUNK_STRIDE + 1
            for i in range(n_chunks):
                start = i * CHUNK_STRIDE
                yield (
                    doc_id,
                    i,
                    " ".join(toks[start : start + CHUNK_SIZE]),
                )

    # Fixed names, replace-on-register semantics: uuid-per-call names
    # leaked a catalog entry per invocation (ADVICE r6 — bench runs each
    # entry 3×); register() and createOrReplaceTempView both overwrite,
    # so repeated runs reuse the same two slots.
    fn = "chunk_udtf_q"
    view = "udtf_chunk_docs_src"
    spark.udtf.register(fn, ChunkUdtf)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT c.doc_id, c.chunk_idx, c.chunk_text "
        f"FROM {view}, LATERAL {fn}(doc_id, text) AS c"
    )


@register(
    "arrow_map_embedding_norms",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 4)
             AS l2_norm,
           round(CAST(embedding[1] AS DOUBLE)
                 / sqrt(list_aggregate(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')),
                 4) AS unit_first
    FROM embeddings
    """,
    tags=("arrow", "mapInArrow", "vector"),
)
def arrow_map_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` surface — RecordBatches cross to Python as raw
    pyarrow (no pandas materialization), the right shape when the
    computation is numpy-vectorizable over Arrow buffers: here the
    embedding ListArray's values buffer is reshaped (fixed dim) and the
    per-row L2 norm + first normalized component come from two
    vectorized numpy passes, zero per-row Python. Compared to the
    pandas_udf path this skips the Arrow→pandas conversion entirely —
    the choice for binary/tensor columns where pandas object boxing
    dominates. The JVM HOF twin is embedding_norms (vectorq): built-in
    aggregate/transform remains the 100 TB default; mapInArrow is for
    logic that genuinely needs numpy/scipy kernels.
    """
    import numpy as np
    import pyarrow as pa

    from ..catalog import load_table

    def norms(batches):
        for batch in batches:
            vec_id = batch.column(0)
            emb = batch.column(1)
            offsets = emb.offsets.to_numpy()
            lengths = np.diff(offsets)
            values = emb.flatten().to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            if len(lengths) and (lengths == lengths[0]).all():
                m = values.reshape(-1, int(lengths[0]))
                sums = (m * m).sum(axis=1)
                first = m[:, 0]
            else:  # ragged fallback (not hit by this table's fixed dim)
                sums = np.array(
                    [float((values[s:e] ** 2).sum())
                     for s, e in zip(offsets[:-1], offsets[1:])]
                )
                first = np.array(
                    [values[s] if e > s else np.nan
                     for s, e in zip(offsets[:-1], offsets[1:])]
                )
            nrm = np.sqrt(sums)
            yield pa.RecordBatch.from_arrays(
                [
                    vec_id,
                    pa.array(np.round(nrm, 4)),
                    pa.array(np.round(first / nrm, 4)),
                ],
                names=["vec_id", "l2_norm", "unit_first"],
            )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return emb.mapInArrow(
        norms, "vec_id long, l2_norm double, unit_first double"
    )
