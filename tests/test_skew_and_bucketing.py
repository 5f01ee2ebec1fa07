"""Skew salting + bucketing: result-equivalence of the salted
operators, and shuffle-free joins between co-bucketed tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.operators.skew import salted_aggregate, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    """1000 rows where 90% share one hot key."""
    rows = [(i, i % 10 if i % 10 else 0, float(i)) for i in range(1000)]
    hot = [(10_000 + i, 0, float(i)) for i in range(2000)]
    return spark.createDataFrame(rows + hot, "uid long, key int, v double")


def test_salted_aggregate_equals_plain(skewed):
    got = salted_aggregate(
        skewed,
        ["key"],
        {"total": ("v", "sum"), "n": ("v", "count"), "mx": ("v", "max")},
        salt_col="uid",
        n_salts=8,
    )
    want = skewed.groupBy("key").agg(
        F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"), F.max("v").alias("mx")
    )
    g = {r["key"]: (r["total"], r["n"], r["mx"]) for r in got.collect()}
    w = {r["key"]: (r["total"], r["n"], r["mx"]) for r in want.collect()}
    assert g == w


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame(
        [(k, f"name_{k}") for k in range(10)], "key int, kname string"
    )
    got = salted_join(skewed, dim, on="key", salt_col="uid", n_salts=8)
    want = skewed.join(dim, "key")
    assert sorted(map(str, got.select("uid", "key", "kname").collect())) == sorted(
        map(str, want.select("uid", "key", "kname").collect())
    )
    assert "__salt" not in got.columns


def test_salted_join_spreads_hot_key(skewed, spark):
    """The hot key's rows must land on multiple salt values."""
    s = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col("uid")), F.lit(8))
    ).filter(F.col("key") == 0)
    n_salts_used = s.select("__salt").distinct().count()
    assert n_salts_used == 8


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Tables co-bucketed on the join key join without an Exchange —
    the at-rest co-location strategy for repeated large-large joins."""
    big = spark.range(0, 10_000).select(
        F.col("id").alias("key"), (F.col("id") * 2).alias("a")
    )
    other = spark.range(0, 5_000).select(
        F.col("id").alias("key"), (F.col("id") * 3).alias("b")
    )
    spark.sql("DROP TABLE IF EXISTS bk1")
    spark.sql("DROP TABLE IF EXISTS bk2")
    big.write.bucketBy(8, "key").sortBy("key").saveAsTable("bk1")
    other.write.bucketBy(8, "key").sortBy("key").saveAsTable("bk2")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("bk1").join(spark.table("bk2"), "key")
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # bucketing removed the shuffle
        assert j.count() == 5_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk1")
        spark.sql("DROP TABLE IF EXISTS bk2")


def test_catalog_database_ddl(spark):
    """SURVEY 2.1 op 5: database existence-check + create, through
    the Spark catalog instead of pg_catalog probes."""
    spark.sql("CREATE DATABASE IF NOT EXISTS cbdw_test_db")
    try:
        assert spark.catalog.databaseExists("cbdw_test_db")
        big = spark.range(0, 100).select(F.col("id").alias("k"))
        big.write.mode("overwrite").saveAsTable("cbdw_test_db.t1")
        assert spark.table("cbdw_test_db.t1").count() == 100
        assert spark.catalog.tableExists("cbdw_test_db.t1")
    finally:
        spark.sql("DROP TABLE IF EXISTS cbdw_test_db.t1")
        spark.sql("DROP DATABASE IF EXISTS cbdw_test_db")


def test_pagerank_iteration_on_bucketed_edges_is_edge_shuffle_free(spark):
    """The at-rest layout for iterative graph queries: edges bucketed
    by src join the ranks relation without re-shuffling the edge side
    — at 100 TB the edge relation is the corpus-scale one, so every
    avoided edge exchange is the dominant per-iteration cost."""
    from pyspark.sql import functions as F

    edges = spark.range(0, 5_000).select(
        (F.col("id") % 500).alias("src"),
        ((F.col("id") * 7) % 500).alias("dst"),
        F.lit(10).alias("deg"),
    )
    spark.sql("DROP TABLE IF EXISTS pr_edges")
    edges.write.bucketBy(8, "src").sortBy("src").saveAsTable("pr_edges")
    ranks = spark.range(0, 500).select(
        F.col("id").alias("node"), F.lit(1.0 / 500).alias("rank")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        e = spark.table("pr_edges")
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("inflow"))
        )
        plan = contrib._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
        # the edge side must NOT re-shuffle on src: the only
        # hash exchanges are the ranks side (shuffled to meet the
        # bucketed layout) and the dst aggregate
        import re

        exchanges = re.findall(r"Exchange hashpartitioning\(([a-z_]+)", plan)
        assert "src" not in exchanges, plan
        assert contrib.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS pr_edges")


def test_pagerank_end_to_end_on_bucketed_edges(spark):
    """The full pagerank() over a saveAsTable-bucketed edge list with
    assume_partitioned_by_src=True: (a) the production edge-prep
    expression compiles to ZERO edge-side src exchanges (the bucketed
    scan's HashPartitioning(src) satisfies the dedup clustering and
    the degree window), and (b) ranks are identical to the default
    repartition path — the module docstring's at-rest claim as a
    pinned fact, not prose."""
    import re

    from pyspark.sql import functions as F

    from citybikedatawarehouse_spark.operators.graph import (
        _edge_prep,
        pagerank,
    )

    pairs = [(i % 37, (i * 11) % 37) for i in range(300) if i % 37 != (i * 11) % 37]
    bi = sorted({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})
    edges = spark.createDataFrame(bi, "src int, dst int")
    spark.sql("DROP TABLE IF EXISTS pr_edges_e2e")
    edges.write.bucketBy(8, "src").sortBy("src").saveAsTable("pr_edges_e2e")
    try:
        bucketed = spark.table("pr_edges_e2e")
        prep_plan = (
            _edge_prep(bucketed, assume_partitioned_by_src=True)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert not re.findall(r"Exchange hashpartitioning\(src", prep_plan), prep_plan
        # the default path (no layout guarantee) pays exactly one
        prep_default = (
            _edge_prep(edges)._jdf.queryExecution().executedPlan().toString()
        )
        assert len(re.findall(r"Exchange hashpartitioning\(src", prep_default)) == 1
        got_b = {
            r["node"]: r["rank"]
            for r in pagerank(
                bucketed, n_iter=3, assume_partitioned_by_src=True
            ).collect()
        }
        got_d = {
            r["node"]: r["rank"] for r in pagerank(edges, n_iter=3).collect()
        }
        assert set(got_b) == set(got_d)
        for n in got_b:
            assert abs(got_b[n] - got_d[n]) < 1e-12
        assert abs(sum(got_b.values()) - 1.0) < 1e-9
    finally:
        spark.sql("DROP TABLE IF EXISTS pr_edges_e2e")
