"""Sketch-based aggregates can't cross engines — validate them
against exact results with error bounds instead."""

from __future__ import annotations

from pyspark.sql import functions as F

from citybikedatawarehouse_spark.plans.catalog import QUERIES
from citybikedatawarehouse_spark.sources.readers import load_table


def test_approx_count_distinct_within_bounds(spark, sf_dir):
    approx = {
        r["l_returnflag"]: r["approx_parts"]
        for r in QUERIES["q28b_approx_aggregates"](spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    for k, e in exact.items():
        assert abs(approx[k] - e) / e < 0.05  # HLL++ default rsd ~2.3%


def test_approx_percentile_within_bounds(spark, sf_dir):
    approx = {
        r["l_returnflag"]: r["approx_p50"]
        for r in QUERIES["q28b_approx_aggregates"](spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r["p"]
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, 0.5)").alias("p"))
        .collect()
    }
    for k, e in exact.items():
        assert abs(approx[k] - e) / e < 0.05


def test_approx_deterministic_rerun(spark, sf_dir):
    a = sorted(map(str, QUERIES["q28b_approx_aggregates"](spark, sf_dir).collect()))
    b = sorted(map(str, QUERIES["q28b_approx_aggregates"](spark, sf_dir).collect()))
    assert a == b  # stable for the driver's rows-only re-check
