"""End-to-end JDBC sink round-trip against embedded Apache Derby.

The reference's actual sink is SQLAlchemy ``to_sql`` into PostgreSQL
(/root/reference/src/create_db_from_csv.py:12-14,
check_and_create_db_v4.py:151-295); ``write_jdbc`` is our equivalent,
and until this test it had never executed (no PostgreSQL driver jar in
the sandbox). Spark BUNDLES Derby (derby*.jar on every classpath, used
for the Hive metastore), and Spark ships a DerbyDialect — so the whole
JDBC write path (dialect type mapping, per-partition connections,
batched INSERTs, mode semantics) runs for real here: write -> read
back -> digest equals the parquet twin.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.sources.writers import write_jdbc

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
_PROPS = {"driver": DERBY_DRIVER}


@pytest.fixture(scope="module")
def derby_url(spark) -> str:
    # route Derby's log out of the repo CWD before the engine loads
    spark._jvm.System.setProperty(
        "derby.stream.error.file", tempfile.mktemp(prefix="derby_", suffix=".log")
    )
    return f"jdbc:derby:{tempfile.mkdtemp(prefix='cbdw_derby_')}/rt;create=true"


def _digest(df) -> tuple[int, str]:
    """Order-insensitive (rows, hash) of a DataFrame — the same
    compare style the oracle harness uses."""
    cols = sorted(df.columns)
    row_h = F.sha2(
        F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x1eNULL")) for c in cols]
        ),
        256,
    )
    agg = df.select(row_h.alias("h")).agg(
        F.count("*").alias("n"),
        F.sha2(F.concat_ws("", F.sort_array(F.collect_list("h"))), 256).alias("d"),
    ).collect()[0]
    return int(agg["n"]), agg["d"]


def test_jdbc_overwrite_roundtrip_nation(spark, sf_dir, derby_url):
    src = spark.read.parquet(f"{sf_dir}/nation.parquet")
    write_jdbc(src, derby_url, "NATION_RT", mode="overwrite", properties=_PROPS)
    back = spark.read.jdbc(url=derby_url, table="NATION_RT", properties=_PROPS)
    assert sorted(back.columns) == sorted(src.columns)
    assert _digest(back) == _digest(src)


def test_jdbc_typed_columns_roundtrip(spark, sf_dir, derby_url):
    # int + string + double + timestamp + date through the
    # DerbyDialect type map — the column shapes the reference's typed
    # sink writes (o_orderdate is a timestamp in the testdata; the
    # explicit date cast exercises the DATE mapping too)
    src = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            F.to_date("o_orderdate").alias("o_date"),
        )
        .limit(500)
    )
    write_jdbc(src, derby_url, "ORDERS_RT", mode="overwrite", properties=_PROPS)
    back = spark.read.jdbc(url=derby_url, table="ORDERS_RT", properties=_PROPS)
    assert _digest(back) == _digest(src)
    # the dialect must round-trip types losslessly, not stringly
    got = dict(back.dtypes)
    assert got["o_totalprice"] == "double"
    assert got["o_orderdate"] == "timestamp"
    assert got["o_date"] == "date"


def test_jdbc_append_mode_accumulates(spark, sf_dir, derby_url):
    src = spark.read.parquet(f"{sf_dir}/region.parquet")
    n = src.count()
    write_jdbc(src, derby_url, "REGION_RT", mode="overwrite", properties=_PROPS)
    write_jdbc(src, derby_url, "REGION_RT", mode="append", properties=_PROPS)
    back = spark.read.jdbc(url=derby_url, table="REGION_RT", properties=_PROPS)
    assert back.count() == 2 * n
    # append must not deduplicate or reorder columns
    assert back.distinct().count() == n
