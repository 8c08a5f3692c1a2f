"""Spark ML parity layer (SURVEY §2.8 M1–M9).

The reference trains a weighted logistic regression in its batch notebook
(`jobs/batch_layer/batch_analysis/notebook/prepare_data_batch.ipynb`
cells 12–25) and scores streams with a pickled LightGBM via pandas row
loops (`jobs/stream_layer/ML_predict.py:96-115`). Here the pipeline is
pyspark.ml end-to-end and inference is an Arrow-batched pandas UDF.
"""

from .pipeline import (
    balanced_class_weights,
    evaluate_binary,
    stratified_split,
    train_weighted_lr,
)
from .inference import logistic_scorer_udf, model_scorer_udf

__all__ = [
    "balanced_class_weights",
    "evaluate_binary",
    "stratified_split",
    "train_weighted_lr",
    "logistic_scorer_udf",
    "model_scorer_udf",
]
