"""ML queries: pandas-UDF batch scoring (oracle-checked) and the full
weighted-LR train/eval pipeline (SURVEY §2.8).

`ml_score_embeddings` replays the reference's score-then-threshold path
(`jobs/stream_layer/ML_predict.py:96-115`) with a fully-specified
linear-logistic model so DuckDB can verify the UDF arithmetic end-to-end.
`ml_lr_train_confusion` runs the notebook's whole M1→M7 pipeline
(`prepare_data_batch.ipynb` cells 18–25) on the embeddings table; training
isn't SQL-expressible so it registers without an oracle (rows-only check).
"""

from __future__ import annotations

from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..ml.inference import logistic_scorer_udf, threshold_prediction
from ..ml.pipeline import (
    balanced_class_weights,
    stratified_split,
    train_weighted_lr,
)
from . import register

# Deterministic stand-in model: w_i = ((i*37) mod 19 - 9) / 10 for the
# 64-dim embeddings, bias 0.1 — arbitrary but fixed, spanning [-0.9, 0.9].
SCORE_DIM = 64
SCORE_WEIGHTS = [((i * 37) % 19 - 9) / 10.0 for i in range(SCORE_DIM)]
SCORE_BIAS = 0.1
SCORE_THRESHOLD = 0.83

_W_SQL = "[" + ", ".join(repr(w) for w in SCORE_WEIGHTS) + "]::DOUBLE[]"


@register(
    "ml_score_embeddings",
    oracle=f"""
    WITH scored AS (
      SELECT vec_id, label,
             1.0 / (1.0 + exp(-(
               list_aggregate(list_transform(list_zip(embedding, {_W_SQL}),
                 p -> CAST(p[1] AS DOUBLE) * p[2]), 'sum')
               + {SCORE_BIAS!r}))) AS s
      FROM embeddings
    )
    SELECT vec_id, label,
           round(s, 4) AS score,
           CAST(s >= {SCORE_THRESHOLD!r} AS INTEGER) AS prediction
    FROM scored
    """,
    tags=("ml", "M9", "pandas_udf", "scoring"),
)
def ml_score_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-score every embedding with the Arrow pandas UDF + threshold.

    Plan shape: one narrow map stage — scan → Arrow batch → UDF → project;
    no shuffle, so it scales linearly with executors at 100 TB. The
    threshold comparison runs on the un-rounded score (as the reference
    thresholds the raw predict_proba) and only the reported score is
    rounded for hashing.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    udf = logistic_scorer_udf(SCORE_WEIGHTS, SCORE_BIAS)
    scored = emb.select("vec_id", "label", udf(F.col("embedding")).alias("s"))
    return scored.select(
        "vec_id",
        "label",
        F.round("s", 4).alias("score"),
        threshold_prediction(F.col("s"), SCORE_THRESHOLD).alias("prediction"),
    )


@register(
    "ml_lr_train_confusion",
    oracle=None,  # training is not SQL-expressible; rows-only check
    tags=("ml", "M1", "M5", "M6", "M7", "lr", "train"),
)
def ml_lr_train_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1→M7 pipeline on embeddings: seeded stratified 80/20 split,
    balanced class weights, weighted LR (maxIter=200, reg=0.01), test-set
    confusion matrix.

    The binary target is sign(embedding[0]) — linearly separable by
    construction, so a correct pipeline lands near-perfect counts on the
    diagonal; a broken split/weight/fit shows up as off-diagonal mass.
    Output: (label_index, prediction, n) sorted — 2×2 at most.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        (F.col("embedding").getItem(0) >= 0).cast("double").alias("label_index"),
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    train, test = stratified_split(
        emb, label_col="label_index", key_col="vec_id", test_fraction=0.2, seed=42
    )
    model = train_weighted_lr(balanced_class_weights(train, "label_index"))
    pred = model.transform(test)
    return (
        pred.groupBy(
            F.col("label_index").cast("int").alias("label_index"),
            F.col("prediction").cast("int").alias("prediction"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label_index", "prediction")
    )


_FEATURE_CTE = """
    SELECT user_id,
           sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS click,
           sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS error,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchase,
           sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS signup,
           sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS view
    FROM events GROUP BY user_id
"""

_FEATURE_COLS = ["click", "error", "purchase", "signup", "view"]


@register(
    "constant_columns_detect",
    oracle=f"""
    WITH f AS ({_FEATURE_CTE})
    {" UNION ALL ".join(
        f"SELECT '{c}' AS feature, count(DISTINCT {c}) AS n_distinct, "
        f"CAST(count(DISTINCT {c}) = 1 AS INTEGER) AS is_constant FROM f"
        for c in _FEATURE_COLS
    )}
    """,
    tags=("ml", "A14", "profiling"),
)
def constant_columns_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: find zero-variance feature columns (the reference drops E22
    this way, XGBoot.ipynb cell 9 — `nunique()==1`).

    One aggregate pass computes every column's distinct count
    (map-side partials; no per-column jobs), then an unpivot via stack —
    profiling 29 columns over 100 TB costs one shuffle of tiny partial
    states, not 29 scans.
    """
    from pyspark.sql import functions as FF
    from ..operators.features import feature_counts_pivot
    from ..queries.logq import EVENT_TYPES

    ev = load_table(spark, sf_dir, "events")
    feats = feature_counts_pivot(ev, "user_id", "event_type", EVENT_TYPES)
    agg = feats.agg(
        *[FF.countDistinct(c).alias(c) for c in _FEATURE_COLS]
    )
    stack = ", ".join(f"'{c}', {c}" for c in _FEATURE_COLS)
    return agg.selectExpr(
        f"stack({len(_FEATURE_COLS)}, {stack}) AS (feature, n_distinct)"
    ).select(
        "feature",
        "n_distinct",
        (FF.col("n_distinct") == 1).cast("int").alias("is_constant"),
    )


@register(
    "label_histogram_embeddings",
    oracle="""
    SELECT label, count(*) AS n
    FROM embeddings
    GROUP BY label
    """,
    tags=("ml", "A13", "agg"),
)
def label_histogram_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: label value_counts (`XGBoot.ipynb` cell 7) as groupBy count."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
