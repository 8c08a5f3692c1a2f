"""Sources & sinks (SURVEY §2.1 S1–S10).

Everything the reference reads or writes, re-expressed as Spark
connectors. Kafka and JDBC need external services/jars not present in
this container, so those builders construct the fully-configured
reader/writer and are exercised in tests up to (not including) the
network call; the file-based paths run for real.
"""

from .io import (
    kafka_sink_writer,
    kafka_source,
    read_csv_dim,
    read_text_logs,
    write_csv_single,
    write_jdbc,
    write_parquet_partitioned,
)

__all__ = [
    "kafka_sink_writer",
    "kafka_source",
    "read_csv_dim",
    "read_text_logs",
    "write_csv_single",
    "write_jdbc",
    "write_parquet_partitioned",
]
