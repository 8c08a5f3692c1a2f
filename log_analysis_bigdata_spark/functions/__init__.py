"""Scalar-function layer: log parsing, event templates, text analysis,
vector math. All built on ``pyspark.sql.functions`` (JVM-side, codegen)
— no row-at-a-time Python UDFs in any hot path.
"""
