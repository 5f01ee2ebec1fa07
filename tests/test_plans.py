"""Physical-plan regression tests: the scale properties that make
the engine work at 100 TB must be visible in the plan at any SF —
predicate pushdown into the parquet scan, column pruning, broadcast
joins for dim tables, TakeOrderedAndProject for top-k, whole-stage
codegen, and no accidental cartesian products anywhere."""

from __future__ import annotations

import pytest

from citybikedatawarehouse_spark.plans.catalog import QUERIES


def _plan(spark, name, sf_dir, mode="formatted"):
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, "q02_filter_pushdown", sf_dir)
    assert "PushedFilters:" in plan
    assert "GreaterThan(l_quantity,45.0)" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_column_pruning(spark, sf_dir):
    """The 4-column projection must not read the full 11-column
    lineitem schema."""
    plan = _plan(spark, "q02_filter_pushdown", sf_dir)
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_tax" not in read and "l_returnflag" not in read
    assert "l_quantity" in read


def test_joins_broadcast_dimensions(spark, sf_dir):
    """At tiny SF, size-based stats (no hints needed) still broadcast
    the small sides; no query degenerates to a cartesian product."""
    for name in ["q03_topk_revenue", "q05_region_volume", "q07_left_join_enrich"]:
        plan = _plan(spark, name, sf_dir)
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name


def test_no_forced_broadcast_of_fact_scale_tables(spark, sf_dir):
    """customer/supplier/part scale with SF — a hard F.broadcast()
    hint on them would override AQE's size check and OOM executors at
    large SF. With size-based broadcasting disabled, the only
    BroadcastHashJoins left must be the hinted constant-size dims
    (region: 5 rows, nation: 25 rows)."""
    expected_hinted = {
        "q03_topk_revenue": 0,     # customer: no hint
        "q07_left_join_enrich": 0, # customer: no hint
        "q33b_promo_revenue_share": 0,  # part: no hint
        "q05_region_volume": 2,    # nation + region hints only
        "q34b_nation_trade_volume": 2,  # two nation aliases only
    }
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name, n_hinted in expected_hinted.items():
            plan = _plan(spark, name, sf_dir, mode="simple")
            assert plan.count("BroadcastHashJoin") == n_hinted, (
                f"{name}: expected {n_hinted} hinted broadcasts, plan:\n{plan}"
            )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = _plan(spark, "q26_sort_limit_topk", sf_dir)
    assert "TakeOrderedAndProject" in plan
    # a global Sort would be the scalability bug this test guards against
    assert "\n+- Sort" not in plan


def test_flagship_partial_aggregation(spark, sf_dir):
    """Map-side combine (partial_sum before the exchange) is what
    keeps the Q1 shuffle tiny at scale."""
    plan = _plan(spark, "q01_pricing_summary", sf_dir, mode="simple")
    assert "partial_sum" in plan
    assert plan.index("partial_sum") > plan.index("Exchange")  # partial below exchange


def test_no_cartesian_products_anywhere(spark, sf_dir):
    offenders = []
    for name in QUERIES:
        plan = _plan(spark, name, sf_dir, mode="simple")
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"cartesian products in: {offenders}"


def test_fact_derive_mode_is_join_free(spark, tmp_path):
    """The derive-strategy fact build must contain no join operator
    at all — the core 100 TB design claim of SURVEY section 7."""
    from citybikedatawarehouse_spark.operators.fact import build_ride_fact
    from citybikedatawarehouse_spark.sources.readers import read_ride_csv
    from tests.citibike_fixture import write_fixture

    path = str(tmp_path / "rides.csv")
    write_fixture(path)
    fact = build_ride_fact(read_ride_csv(spark, path), strategy="derive", dedup=False)
    plan = fact._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "Join" not in plan and "Exchange" not in plan


def test_minhash_lsh_exchange_reuse(spark, sf_dir):
    """q62's exact-verify pipeline must share exchanges, not rescan:
    (a) the banded self-join's two sides reuse ONE (band, bucket)
    exchange (the bucket-size cap is a window count riding that same
    exchange, not a separate aggregate + join-back), and (b) the
    w1/w2 verify branches reuse ONE doc_id exchange (set sizes are a
    window count carried on the item rows). Net effect: the FINAL
    adaptive plan reads the documents parquet at most twice —
    signature build + verify items — where the unfused formulation
    read it six times. Broadcast is disabled so the asserted shape is
    the sort-merge one a 100 TB corpus would take."""
    from citybikedatawarehouse_spark.plans.catalog import QUERIES

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERIES["q62_minhash_lsh"](spark, sf_dir)
        df.collect()  # AQE: reuse is decided at runtime — need the final plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "isFinalPlan=true" in final
        assert final.count("ReusedExchange") >= 2, final
        assert final.count("Scan parquet") <= 2, final
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_kmeans_assign_is_shuffle_free(spark, sf_dir):
    """Lloyd's assignment must not move the corpus: a single assign
    against given centroids contains no exchange keyed by the corpus
    (the only exchanges in a full fit belong to the k x dim update
    aggregates and the k-row centroid collapse)."""
    from citybikedatawarehouse_spark.operators.clustering import (
        kmeans_assign,
        kmeans_init,
    )
    from citybikedatawarehouse_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_init(emb, 4, "vec_id", "embedding").localCheckpoint()
    plan = (
        kmeans_assign(emb, cents, "vec_id", "embedding")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the centroid collapse aggregates 4 rows to 1 (SinglePartition);
    # nothing may hash-partition the embeddings themselves
    assert "hashpartitioning(vec_id" not in plan
    assert "hashpartitioning(embedding" not in plan


def test_ngram_novelty_exchange_reuse(spark, sf_dir):
    """q114's shingle relation feeds two consumers (first-seen agg +
    join-back); it must be computed and shuffled ONCE — the final
    adaptive plan reuses the shingle exchange and reads the documents
    parquet once. Broadcast is disabled so the asserted shape is the
    sort-merge one a 100 TB corpus takes (distinct shingles grow with
    the corpus — first-seen can never broadcast at scale)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERIES["q114_ngram_novelty"](spark, sf_dir)
        df.collect()  # AQE: reuse is decided at runtime
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "isFinalPlan=true" in final
        assert final.count("ReusedExchange") >= 1, final
        assert final.count("Scan parquet") == 1, final
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_new_topk_queries_use_take_ordered(spark, sf_dir):
    """BM25 (q111) and weighted sampling (q113) rank with a
    TakeOrdered, never a global sort; chunking (q112) is a pure
    narrow fan-out with no exchange at all."""
    for name in ["q111_bm25_topk", "q113_weighted_sample"]:
        plan = _plan(spark, name, sf_dir, mode="simple")
        assert "TakeOrderedAndProject" in plan, name
    chunk_plan = _plan(spark, "q112_doc_chunks", sf_dir, mode="simple")
    assert "Exchange" not in chunk_plan


def test_hard_negatives_broadcasts_query_side(spark, sf_dir):
    """q115's label-inequality join must broadcast the (tiny) query
    side into a nested-loop over the corpus — never a cartesian
    product or a corpus-side shuffle for the join itself (the only
    hash exchange is the per-query ranking window's)."""
    plan = _plan(spark, "q115_hard_negatives", sf_dir, mode="simple")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_cosine_topk_single_corpus_scan_one_shuffle(spark, sf_dir):
    """Brute-force top-k: the corpus parquet is scanned once, and the
    only hash exchange is the window's (query_id) — the scoring join
    itself is broadcast, shuffle-free."""
    from citybikedatawarehouse_spark.plans.catalog import QUERIES

    df = QUERIES["q70_cosine_topk"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 2  # corpus + (broadcast) queries
    hash_exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(hash_exchanges) == 1 and "query_id" in hash_exchanges[0]


def test_pagerank_edge_prep_single_exchange(spark):
    """The (dedup + degree) edge preparation must ride ONE src
    exchange: HashPartitioning(src) satisfies the (src, dst) dedup's
    clustering requirement, and the degree window partitions by src
    — a second shuffle here would double the heaviest stage of every
    graph query at corpus scale."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (3, 1)], "src int, dst int"
    )
    prep = (
        edges.repartition("src")
        .dropDuplicates(["src", "dst"])
        .withColumn("deg", F.count(F.lit(1)).over(W.partitionBy("src")))
    )
    plan = prep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_prototype_margin_broadcasts_prototypes(spark, sf_dir):
    """q139's audit join must broadcast the L-row prototype relation
    (corpus side never shuffles after the fit) and scan the
    embeddings parquet at most twice (fit + audit)."""
    from citybikedatawarehouse_spark.plans.catalog import QUERIES

    df = QUERIES["q139_label_prototype_margin"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("Scan parquet") <= 2, plan


def test_copurchase_cap_bounds_mega_order(spark):
    """A degenerate order holding 100 parts must contribute only
    C(20,2) pairs (the cap keeps the per-order fan-out from going
    quadratic), and the capped part set is the 20 SMALLEST part ids
    (deterministic, matching the oracle's row_number formulation)."""
    from pyspark.sql import functions as F

    rows = [(1, p) for p in range(100)] + [(2, 200), (2, 201)]
    li = spark.createDataFrame(rows, "ok long, pk long")
    per_order = li.groupBy("ok").agg(
        F.slice(F.array_sort(F.collect_set("pk")), 1, 20).alias("ps")
    )
    pair_structs = F.flatten(
        F.transform(
            "ps",
            lambda x, i: F.transform(
                F.slice(
                    "ps",
                    i + F.lit(2),
                    F.greatest(F.size("ps") - i - 1, F.lit(0)),
                ),
                lambda y: F.struct(x.alias("p1"), y.alias("p2")),
            ),
        )
    )
    pairs = per_order.select(
        "ok", F.explode(pair_structs).alias("pp")
    ).select("ok", F.col("pp.p1").alias("p1"), F.col("pp.p2").alias("p2"))
    got = pairs.filter(F.col("ok") == 1).collect()
    assert len(got) == 20 * 19 // 2  # C(20,2), not C(100,2)
    assert max(max(r["p1"], r["p2"]) for r in got) == 19  # smallest ids kept
    assert all(r["p1"] < r["p2"] for r in got)
    small = pairs.filter(F.col("ok") == 2).collect()
    assert [(r["p1"], r["p2"]) for r in small] == [(200, 201)]


def test_dsir_uses_take_ordered_not_global_sort(spark, sf_dir):
    """q164's top-100 must compile to TakeOrderedAndProject — a
    global Sort (or a corpus-scale unpartitioned rank window) before
    the limit would serialize the candidate pool."""
    plan = (
        QUERIES["q164_dsir_resample"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_temperature_mixture_broadcasts_quota(spark, sf_dir):
    """q162's per-source quota relation (|sources| rows) must join
    broadcast — the corpus side shuffles only for its rank window."""
    plan = (
        QUERIES["q162_temperature_mixture"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan, plan


def test_cdc_cross_doc_exchange_keys_on_digest(spark, sf_dir):
    """q163's cross-document aggregate must shuffle on the 32-byte
    chunk digest, never on chunk text: the only hash exchanges are
    the per-doc chunk build (doc_id) and the digest rollup."""
    import re

    plan = (
        QUERIES["q163_cdc_chunk_dedup"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    keys = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert keys and set(keys) <= {"doc_id", "chunk_digest"}, keys


def test_triangle_query_single_corpus_pass(spark, sf_dir):
    """q176's oriented edge list is persisted: the downstream plan
    (wedge self-join + closing join + corner agg) must read the
    cached relation — at least two InMemoryTableScans in the
    executed plan (before the persist fix the plan held 15
    replicated lineitem scans and no cache at all). The FileScan
    text still appears once inside the cache's build recipe; what
    must NOT appear is a lineitem scan outside it."""
    from citybikedatawarehouse_spark.plans.catalog import QUERIES

    df = QUERIES["q176_triangle_participation"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 2, plan


def test_cluster_purity_single_corpus_pass(spark, sf_dir):
    """q178's (cell, label) histogram is checkpointed: totals,
    majority window and entropy must all read the materialized
    k·|labels| relation, never re-run the assignment pipeline."""
    from citybikedatawarehouse_spark.plans.catalog import QUERIES

    df = QUERIES["q178_cluster_purity"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") + plan.count("FileScan") == 0, plan


def test_trade_flows_broadcasts_all_dims(spark, sf_dir):
    """q186's 6-relation TPC-H Q7 shape: the customer/supplier/
    nation dims must all come in as broadcast joins — the only join
    allowed to shuffle at scale is lineitem ⋈ orders (and AQE may
    broadcast even that at test scale). No cartesian anywhere."""
    from citybikedatawarehouse_spark.plans.catalog import QUERIES

    df = QUERIES["q186_trade_flows"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") <= 1, plan


def test_trade_flows_single_shuffle_join_without_aqe_broadcast(spark, sf_dir):
    """With size-based broadcasting disabled, q186's explicit
    F.broadcast hints must keep all four dim joins broadcast and
    leave EXACTLY one shuffle join — lineitem ⋈ orders — the plan
    the claim '100 TB: only the fact join shuffles' rests on."""
    from citybikedatawarehouse_spark.plans.catalog import QUERIES

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERIES["q186_trade_flows"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastHashJoin") == 4, plan
        n_shuffle_joins = plan.count("SortMergeJoin") + plan.count(
            "ShuffledHashJoin"
        )
        assert n_shuffle_joins == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_key_skew_census_scans_are_column_pruned(spark, sf_dir):
    """Each census branch must read ONLY its key column — the whole
    claim of '100 TB: a single-int-column scan per key' rests on
    pruning reaching the parquet reader."""
    plan = _plan(spark, "q210_key_skew_census", sf_dir)
    assert "ReadSchema: struct<l_orderkey" in plan, plan
    # no lineitem branch may drag a second column along
    for line in plan.splitlines():
        if "ReadSchema" in line and "lineitem" in plan:
            # schema struct must contain exactly one field
            inner = line.split("struct<", 1)[1]
            assert inner.count(",") == 0 or "user_id" in inner, line


def test_item_similarity_degree_joins_broadcast(spark, sf_dir):
    """q216: both degree joins ride broadcasts and the pair fan-out
    aggregate is the only corpus-scale exchange family; no cartesian
    anywhere."""
    from citybikedatawarehouse_spark.plans.catalog import QUERIES

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERIES["q216_item_similarity"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastHashJoin") >= 2, plan
        assert "CartesianProduct" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bfs_frontier_joins_broadcast(spark):
    """q215's fix pinned: with size-based broadcast off, a frontier
    expansion must STILL be a BroadcastHashJoin (the explicit hint),
    never a sort-merge re-shuffle of O(E) per hop. bfs_hops
    checkpoints each round eagerly, so the step's plan is pinned on
    the exposed _bfs_expand itself."""
    from pyspark.sql import functions as F

    from citybikedatawarehouse_spark.operators.graph import _bfs_expand

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        e = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4)], ["src", "dst"]
        )
        dist = spark.createDataFrame([(1, 0)], ["node", "hop"])
        step = _bfs_expand(dist, e, 1)
        plan = step._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan
        got = {(r["node"], r["hop"]) for r in step.collect()}
        assert got == {(1, 0), (2, 1)}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_partition_pruning_reaches_scan(spark, sf_dir, tmp_path):
    """Hive-style partitioned layout must prune at the SCAN: a write
    partitioned by event date + an equality filter on that date has
    to show up in PartitionFilters (metadata-only pruning), NOT as a
    post-scan Filter over all partitions — at 100 TB this is the
    difference between reading one day and reading the decade."""
    from pyspark.sql import functions as F

    from citybikedatawarehouse_spark.sources.readers import load_table
    from citybikedatawarehouse_spark.sources.writers import write_parquet

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    out = str(tmp_path / "events_by_day")
    write_parquet(ev, out, partition_by=["day"])

    some_day = spark.read.parquet(out).select("day").first()["day"]
    df = spark.read.parquet(out).where(F.col("day") == some_day)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PartitionFilters" in plan, plan
    assert "day" in plan.split("PartitionFilters")[1].splitlines()[0], plan
    # and the pruned read still returns exactly the day's rows
    got = df.count()
    want = ev.where(F.col("day") == some_day).count()
    assert got == want and want > 0


def test_sketch_and_eval_queries_broadcast_only(spark, sf_dir):
    """The sketch trio and the eval suite never sort-merge join or
    go cartesian: sketches/models are broadcast-sized by design."""
    for name in [
        "q243_countmin_heavy_hitters",
        "q244_hll_distinct",
        "q245_bloom_screen",
        "q247_bootstrap_ci",
        "q249_model_auc",
        "q250_learning_curve",
        "q254_ipf_mixture",
    ]:
        plan = _plan(spark, name, sf_dir)
        assert "SortMergeJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_multi_consumer_relations_scan_once(spark, sf_dir):
    """Persisted multi-consumer relations keep single table scans:
    q245's shingle relation feeds 4 consumers off ONE documents
    scan; q250's fact join feeds models and scoring off ONE
    lineitem/orders scan (was 5 and 3 scans before the persists).

    CacheManager matches persists by CANONICALIZED plan, so a
    relation persisted by an earlier test's run of these (or any
    plan-identical) queries would substitute InMemoryTableScan
    nodes here and change the printed scan counts — start from a
    clean cache so the assertion is about THIS query's plan shape,
    not suite ordering."""
    spark.catalog.clearCache()
    p245 = _plan(spark, "q245_bloom_screen", sf_dir)
    assert p245.count("documents.parquet") <= 1
    p250 = _plan(spark, "q250_learning_curve", sf_dir)
    assert p250.count("lineitem.parquet") <= 1
    assert p250.count("orders.parquet") <= 1
    p237 = _plan(spark, "q237_hitrate_eval", sf_dir)
    assert p237.count("lineitem.parquet") <= 1
    assert p237.count("orders.parquet") <= 1


def test_ndcg_single_corpus_scan(spark, sf_dir):
    """q253's grade and BM25 legs share one persisted bm25_per
    staging relation — ONE documents scan (the round-6 shape
    tokenized the corpus once per leg and was the 2.2×-at-10×
    outlier)."""
    spark.catalog.clearCache()
    p253 = _plan(spark, "q253_ndcg_at_10", sf_dir)
    assert p253.count("documents.parquet") <= 1


def test_pagerank_edge_checkpoint_is_serialized(spark):
    """The O(E) edge checkpoint must store SERIALIZED — the default
    deserialized row blocks are the measured 100x OOM mode
    (PERFORMANCE.md round 7). Running pagerank must add at least one
    'Serialized'-level cached RDD (the e_deg checkpoint; the O(V)
    ranks/nodes checkpoints stay deserialized by design)."""
    from pyspark.sql import functions as F  # noqa: F401

    from citybikedatawarehouse_spark.operators.graph import pagerank

    def n_serialized():
        return sum(
            1
            for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
            if "Serialized" in i.storageLevel().description()
        )

    before = n_serialized()
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3)],
        "src: long, dst: long",
    )
    pagerank(e, n_iter=2).collect()
    assert n_serialized() > before
