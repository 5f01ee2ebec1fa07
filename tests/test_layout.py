"""Z-order layout keys: bit-level unit checks plus the property the
operator exists for — multi-dimensional locality (tight per-file
bounding boxes after a z-sort)."""

from __future__ import annotations

from pyspark.sql import functions as F

from citybikedatawarehouse_spark.functions.layout import (
    morton_interleave,
    zorder_key,
)
from citybikedatawarehouse_spark.sources.readers import load_table


def test_morton_interleave_known_bits(spark):
    df = spark.createDataFrame(
        [(1, 0), (0, 1), (3, 5), (0, 0), (65535, 65535)],
        "x long, y long",
    )
    got = [
        r[0]
        for r in df.select(
            morton_interleave([F.col("x"), F.col("y")], bits=16)
        ).collect()
    ]
    # col 0 owns even bit positions: (3,5)=x 011 / y 101 ->
    # bits 0,2 from x, bits 1,5 from y -> 0b100111 = 39
    assert got == [1, 2, 39, 0, (1 << 32) - 1]


def test_zorder_locality_beats_single_column_sort(spark, sf_dir):
    """Split orders into 32 z-key-ordered chunks (a stand-in for
    files): the mean per-chunk date extent must be well under the
    full date range — which is exactly what a single-column
    custkey sort CANNOT deliver (every chunk spans ~all dates)."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "__epoch_day", F.datediff("o_orderdate", F.lit("1970-01-01"))
    )
    z = zorder_key(o, ["o_custkey", "__epoch_day"], bits=16)
    from pyspark.sql import Window

    w = Window.orderBy("z_key", "o_orderkey")
    chunked = z.withColumn("chunk", F.ntile(32).over(w))
    ext = (
        chunked.groupBy("chunk")
        .agg(
            (F.max("__epoch_day") - F.min("__epoch_day")).alias("d_ext"),
            (F.max("o_custkey") - F.min("o_custkey")).alias("c_ext"),
        )
        .agg(F.avg("d_ext").alias("mean_d"), F.avg("c_ext").alias("mean_c"))
        .collect()[0]
    )
    full = o.agg(
        (F.max("__epoch_day") - F.min("__epoch_day")).alias("d"),
        (F.max("o_custkey") - F.min("o_custkey")).alias("c"),
    ).collect()[0]
    # both dimensions stay tight simultaneously
    assert ext["mean_d"] < 0.5 * full["d"]
    assert ext["mean_c"] < 0.5 * full["c"]


def test_zorder_wide_range_no_wrap(spark):
    """Ranges beyond 2^(63-bits) used to wrap the proportional
    (v-mn)*65535 scaling (non-ANSI overflow -> garbage keys). The
    bucket-width branch must keep keys in [0, 2^(2*bits)) and
    monotone."""
    vals = [-(1 << 62), -(1 << 55), 0, 1 << 50, 1 << 55, (1 << 62) + 17]
    df = spark.createDataFrame([(v, 1) for v in vals], "a long, k long")
    rows = (
        zorder_key(df, ["a", "k"], bits=16)
        .orderBy("a")
        .select("z_key")
        .collect()
    )
    keys = [r[0] for r in rows]
    assert all(0 <= z < (1 << 32) for z in keys)
    assert keys == sorted(keys)
    # extremes actually spread across the bucket space (not collapsed)
    assert keys[-1] > keys[0]


def test_zorder_constant_column_is_zero(spark):
    df = spark.createDataFrame([(i, 7) for i in range(10)], "a long, k long")
    out = zorder_key(df, ["k", "a"], bits=8)
    # constant column contributes 0 bits; key is monotone in `a`
    rows = out.orderBy("a").select("z_key").collect()
    assert [r[0] for r in rows] == sorted(r[0] for r in rows)
    assert rows[0][0] == 0
