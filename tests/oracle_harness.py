"""Local replica of the driver's DuckDB-oracle equivalence check
(SURVEY.md section 5 item 1): run the Spark query and the oracle SQL
on the same parquet, compare row count + schema-insensitive sorted
columns + order-insensitive canonicalized values.

Strictness: values are canonicalized to exact strings (floats via
repr, timestamps via isoformat, null/NaN unified) and compared as
multisets — no tolerance. Queries are responsible for rounding
floating-point aggregates identically on both sides.
"""

from __future__ import annotations

import math
from collections import Counter
from datetime import datetime

import duckdb
import pandas as pd

from citybikedatawarehouse_spark.schemas import TESTDATA_TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == 0.0:
            return "0.0"  # normalize -0.0
        return repr(v)
    if isinstance(v, pd.Timestamp) or isinstance(v, datetime):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, (bool,)):
        return str(bool(v))
    if isinstance(v, (int,)):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def _rows(pdf: pd.DataFrame) -> Counter:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    return Counter(
        tuple(_canon(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    )


def compare(spark, name: str, query_fn, oracle: str, sf_dir: str) -> None:
    """Assert Spark result == DuckDB oracle result. Raises AssertionError
    with a diff sample on mismatch."""
    sdf = query_fn(spark, sf_dir)
    spdf = sdf.toPandas()
    con = duckdb_con(sf_dir)
    dpdf = con.sql(oracle).df()
    con.close()

    assert sorted(spdf.columns) == sorted(dpdf.columns), (
        f"{name}: column mismatch spark={sorted(spdf.columns)} "
        f"duck={sorted(dpdf.columns)}"
    )
    assert len(spdf) == len(dpdf), (
        f"{name}: row count mismatch spark={len(spdf)} duck={len(dpdf)}"
    )
    s_rows, d_rows = _rows(spdf), _rows(dpdf)
    if s_rows != d_rows:
        only_s = list((s_rows - d_rows).items())[:5]
        only_d = list((d_rows - s_rows).items())[:5]
        raise AssertionError(
            f"{name}: value mismatch (cols sorted: {sorted(spdf.columns)})\n"
            f"  spark-only rows (sample): {only_s}\n"
            f"  duck-only rows (sample): {only_d}"
        )
