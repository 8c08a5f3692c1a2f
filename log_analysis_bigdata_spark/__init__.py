"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference log-analytics system
(``little-duck-vie/log_analysis_bigdata``), re-expressed Spark-first.

Layout:

- ``session``    — SparkSession factory tuned for local[32] dev / cluster prod
- ``catalog``    — typed loaders for the benchmark parquet tables
- ``schemas``    — fixed StructType schemas shared by batch and streaming
- ``functions``  — scalar-function layer (log parsing, templates, text, vectors)
- ``operators``  — relational + domain operators (sessionize, features,
                   serving queries, dedup, similarity, multimodal)
- ``ml``         — Spark ML pipeline parity (weighted LR) + pandas-UDF scoring
- ``streaming``  — Structured Streaming jobs (parse → score → keyed upsert)
"""

__version__ = "0.1.0"
