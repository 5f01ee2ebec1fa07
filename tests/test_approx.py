"""Sketch-based aggregates can't cross engines — q28b is therefore
SELF-ORACLED (exact value + within-tolerance flag in one pass); these
tests assert the underlying error bounds directly and the flags."""

from __future__ import annotations

from pyspark.sql import functions as F

from citybikedatawarehouse_spark.plans.catalog import QUERIES
from citybikedatawarehouse_spark.sources.readers import load_table


def test_approx_count_distinct_within_bounds(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx"),
            F.countDistinct("l_partkey").alias("exact"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r["approx"] - r["exact"]) / r["exact"] < 0.05  # HLL++ rsd ~2.3%


def test_approx_percentile_within_bounds(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5).alias("approx"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r["approx"] - r["exact"]) / r["exact"] < 0.05


def test_q28b_flags_all_true(spark, sf_dir):
    """The self-oracle contract: every within-tolerance flag is TRUE
    (the DuckDB oracle asserts the same via literal TRUE columns)."""
    for r in QUERIES["q28b_approx_aggregates"](spark, sf_dir).collect():
        assert r["approx_parts_within_15pct"] is True
        assert r["approx_p50_within_1pct"] is True


def test_approx_deterministic_rerun(spark, sf_dir):
    a = sorted(map(str, QUERIES["q28b_approx_aggregates"](spark, sf_dir).collect()))
    b = sorted(map(str, QUERIES["q28b_approx_aggregates"](spark, sf_dir).collect()))
    assert a == b  # stable across reruns for the driver gate
