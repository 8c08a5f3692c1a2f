"""Local replica of the driver's DuckDB-oracle comparison so mismatches
surface in `pytest` before the driver's round gate.

Compare semantics mirrored from the driver contract: row count, column
name set, and order-insensitive value comparison (columns sorted by
name, rows sorted, approximate equality for floats).
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):
            # Spark-written tables are DIRECTORIES of part files (the
            # self-generated scale-up sets under /tmp); driver testdata
            # is single files — support both
            path = os.path.join(path, "*.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _sort_key(row):
    return tuple(
        (v is None, str(type(v).__name__), str(v)) for v in row
    )


def compare_results(
    spark_df, con: duckdb.DuckDBPyConnection, sql: str, rel_tol: float = 1e-7
) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = ok)."""
    problems: list[str] = []
    spark_cols = [c.lower() for c in spark_df.columns]
    oracle = con.execute(sql)
    duck_cols = [d[0].lower() for d in oracle.description]
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems

    s_order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    d_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s_rows = [
        tuple(_norm(row[i]) for i in s_order) for row in spark_df.collect()
    ]
    d_rows = [tuple(_norm(row[i]) for i in d_order) for row in oracle.fetchall()]
    if len(s_rows) != len(d_rows):
        problems.append(f"row count: spark={len(s_rows)} duck={len(d_rows)}")
        return problems

    s_rows.sort(key=_sort_key)
    d_rows.sort(key=_sort_key)
    n_bad = 0
    for sr, dr in zip(s_rows, d_rows):
        for c, (a, b) in enumerate(zip(sr, dr)):
            if isinstance(a, float) and isinstance(b, float):
                if not math.isclose(a, b, rel_tol=rel_tol, abs_tol=1e-9):
                    n_bad += 1
                    if n_bad <= 5:
                        problems.append(
                            f"value mismatch col={sorted(spark_cols)[c]}: {a!r} vs {b!r}"
                        )
                    break
            elif a != b:
                n_bad += 1
                if n_bad <= 5:
                    problems.append(
                        f"value mismatch col={sorted(spark_cols)[c]}: {a!r} vs {b!r}"
                    )
                break
    if n_bad > 5:
        problems.append(f"... {n_bad} mismatched rows total")
    return problems
