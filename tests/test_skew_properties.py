"""Adversarial skew tests for the learned-blocking operators: the
worst case for both semantic dedup (q88) and PQ codebooks is a corpus
where every embedding is near-identical — k-means collapses to ONE
cell holding everything, which is exactly the "quadratic within a
skewed cell" scale-killer the anchor cap exists to bound, and the
"k_codes > distinct vectors" degeneracy for codebook training (empty
cells must drop out without poisoning the fit)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

VEC_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _collapsed_corpus(spark, n=60, dim=8):
    """n near-identical unit-ish vectors (cosine ~1 pairwise): one
    k-means cell captures the whole corpus."""
    rows = [
        (i, [1.0] + [1e-4 * ((i + j) % 3) for j in range(dim - 1)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, VEC_SCHEMA)


def test_semantic_dedup_complete_under_one_giant_cell(spark):
    """Planted giant cluster: every vector lands in one cell, and the
    anchor cap (set far below the cell size) must still produce a
    COMPLETE dedup — everything except the min id is dropped, because
    every vector matches anchor #1. This is the guarantee that the
    cap bounds the join without silently losing survivors in the
    degenerate case."""
    from citybikedatawarehouse_spark.plans.similarity import semantic_dedup

    n = 60
    emb = _collapsed_corpus(spark, n=n)
    dropped = semantic_dedup(
        emb, k=4, n_iter=1, threshold=0.9, anchor_cap=4
    ).collect()
    assert sorted(r["vec_id"] for r in dropped) == list(range(1, n))
    assert {r["cluster_id"] for r in dropped} == {0}  # one giant cell


def test_semantic_dedup_anchor_cap_bounds_pairs(spark):
    """The cap is a real bound, not a heuristic: with anchor_cap=c,
    the pre-filter pair count in one cell of size n is n*c - c*(c+1)/2
    (anchors x later ids), never n*(n-1)/2. Verified by counting the
    capped join's rows with the similarity threshold disabled."""
    from pyspark.sql.window import Window

    from citybikedatawarehouse_spark.operators.clustering import (
        kmeans_assign,
        kmeans_fit,
    )

    n, cap = 40, 3
    emb = _collapsed_corpus(spark, n=n)
    _, cents = kmeans_fit(emb, k=2, n_iter=1)
    av = kmeans_assign(emb, cents, "vec_id", "embedding")
    w = Window.partitionBy("cluster_id").orderBy("vec_id")
    av = av.withColumn("__rank", F.row_number().over(w))
    a = av.filter(F.col("__rank") <= cap).select(
        F.col("vec_id").alias("id_1"), "cluster_id"
    )
    b = av.select(F.col("vec_id").alias("id_2"), "cluster_id")
    pairs = (
        a.join(b, "cluster_id").filter(F.col("id_1") < F.col("id_2")).count()
    )
    assert pairs == n * cap - cap * (cap + 1) // 2  # 114, not 780


def test_pq_degenerate_more_codes_than_distinct_vectors(spark):
    """k_codes > distinct vectors: the corpus holds 3 distinct
    vectors (repeated), codebooks ask for 8 entries. Empty cells must
    drop out of the Lloyd update without error, every vector must
    still be encoded, and — since each distinct vector can own a
    code — reconstruction must be exact (recon_err == 0)."""
    from citybikedatawarehouse_spark.operators.clustering import pq_fit_encode

    base = [
        [1.0, 0.0, 0.0, 0.0, 2.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0, 0.0, 2.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 2.0, 0.0],
    ]
    rows = [(i, base[i % 3]) for i in range(24)]
    emb = spark.createDataFrame(rows, VEC_SCHEMA)
    codes = pq_fit_encode(emb, m=2, k=8, n_iter=2, dim=8).collect()
    assert sorted(r["vec_id"] for r in codes) == list(range(24))
    assert all(r["recon_err"] == 0.0 for r in codes)
    # identical vectors must share identical codes
    by_class = {}
    for r in codes:
        by_class.setdefault(r["vec_id"] % 3, set()).add(
            (r["code_0"], r["code_1"])
        )
    assert all(len(s) == 1 for s in by_class.values())


def test_pq_adc_search_survives_collapsed_corpus(spark):
    """ADC search on the all-near-identical corpus: distance tables
    still build (empty codebook cells dropped), every query gets k
    ranked neighbors, and ranks are dense 1..k."""
    from citybikedatawarehouse_spark.operators.clustering import pq_adc_topk

    emb = _collapsed_corpus(spark, n=30, dim=8)
    out = pq_adc_topk(
        emb, emb.filter(F.col("vec_id") < 3), k=4, m=2, k_codes=8,
        n_iter=1, dim=8,
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(by_q) == {0, 1, 2}
    assert all(sorted(v) == [1, 2, 3, 4] for v in by_q.values())


def test_dim_stats_constant_dimension_yields_zero_std(spark):
    """Catastrophic-cancellation guard: a dimension constant across
    the corpus makes sum(v^2) - sum(v)^2/n a tiny NEGATIVE float;
    without the clamp this is a sqrt domain error on DuckDB and NaN
    on Spark. The clamped formula must report std exactly 0.0 for
    constant dims and a sane positive std for varying ones."""
    import duckdb

    rows = [(i, [0.7, 0.001, float(i % 5)] + [0.0] * 5) for i in range(40)]
    emb = spark.createDataFrame(rows, VEC_SCHEMA)
    from pyspark.sql import functions as F

    e = emb.select(
        F.posexplode(
            F.transform(F.col("embedding"), lambda x: x.cast("double"))
        ).alias("dim", "v")
    )
    cnt = F.count(F.lit(1))
    sv, svv = F.sum("v"), F.sum(F.col("v") * F.col("v"))
    resid = F.greatest(svv - sv * sv / cnt, F.lit(0.0))
    got = {
        r["dim"]: r["std"]
        for r in e.groupBy("dim")
        .agg(F.round(F.sqrt(resid / (cnt - 1)), 6).alias("std"))
        .collect()
    }
    assert got[0] == 0.0 and got[1] == 0.0  # constant dims: clamped, not NaN
    assert got[2] > 0.0                     # varying dim: real std
    assert all(got[d] == 0.0 for d in range(3, 8))
    # and the DuckDB side of the same clamped formula runs clean
    con = duckdb.connect()
    con.sql("CREATE TABLE t AS SELECT unnest([0.7, 0.7, 0.7]) AS v")
    (std,) = con.sql(
        "SELECT round(sqrt(greatest(sum(v*v) - sum(v)*sum(v)/count(*), 0.0)"
        " / (count(*) - 1)), 6) FROM t"
    ).fetchone()
    assert std == 0.0


def test_semantic_dedup_recall_on_planted_dup_groups(spark):
    """Recall characterization on SemDeDup's design regime — TRUE
    near-dups (cosine ~1) in tight planted groups: precision is
    exactly 1 (only within-group pairs clear threshold 0.95), and
    the survivor count per group equals the number of k-means cells
    the group occupies (the structural law of cell-blocked greedy
    dedup: one survivor per (group, cell)). With the md5
    pseudo-random seeding, groups co-locate and recall lands >= 0.9;
    the OLD lowest-id seeding put all k seeds inside group 0 (ids
    sort by group) and stranded most groups seedless — this test
    falsified it at ~60% recall. On weakly-similar pairs (cos
    0.4-0.6) cell blocking is structurally lossy regardless of
    seeding — measured 30% recall on the synthetic sf0.01 corpus
    where ALL qualifying pairs sit in that band."""
    from citybikedatawarehouse_spark.operators.clustering import (
        kmeans_assign,
        kmeans_fit,
    )
    from citybikedatawarehouse_spark.plans.similarity import semantic_dedup

    dim, groups, per = 16, 12, 8
    rows = []
    for g in range(groups):
        for m in range(per):
            v = [0.0] * dim
            v[g % dim] = 1.0
            v[(g + 7) % dim] = 0.3 + 1e-3 * m  # tiny member jitter
            rows.append((g * per + m, v))
    emb = spark.createDataFrame(rows, VEC_SCHEMA)
    dropped = {
        r["vec_id"]
        for r in semantic_dedup(
            emb, k=8, n_iter=2, threshold=0.95, anchor_cap=64
        ).collect()
    }
    expected = {g * per + m for g in range(groups) for m in range(1, per)}
    assert dropped <= expected  # precision 1: never drops a group min
    assert len(dropped) / len(expected) >= 0.9  # seeding-diversity bar
    # exact structural law: survivors per group == cells it occupies
    _, cents = kmeans_fit(emb, k=8, n_iter=2)
    av = kmeans_assign(emb, cents, "vec_id", "embedding").collect()
    cells_of_group = {}
    for r in av:
        cells_of_group.setdefault(r["vec_id"] // per, set()).add(
            r["cluster_id"]
        )
    survivors = {i for i in range(groups * per)} - dropped
    per_group = {}
    for s in survivors:
        per_group[s // per] = per_group.get(s // per, 0) + 1
    for g in range(groups):
        assert per_group[g] == len(cells_of_group[g]), (g, per_group)


def test_multisignal_semantic_bucket_cap_bounds_giant_bucket(spark):
    """All-identical embeddings collapse every vector into ONE
    (table, signature) bucket per table — the worst case for the
    audit's semantic pair sweep. The 64-member cap must bound the
    candidate count at C(64,2) per table (deduped across tables)
    instead of C(n,2), and the capped members are the lowest ids."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    from citybikedatawarehouse_spark.functions.vectors import norm
    from citybikedatawarehouse_spark.operators.similarity_ops import (
        with_lsh_signatures,
    )

    n = 200
    vec = [0.1] * 64
    emb = spark.createDataFrame(
        [(i, vec) for i in range(n)], "vec_id long, embedding array<double>"
    )
    banded = with_lsh_signatures(emb).select(
        "vec_id", F.posexplode("lsh_sigs").alias("tbl", "sig")
    )
    w_cap = W.partitionBy("tbl", "sig").orderBy("vec_id")
    capped = (
        banded.withColumn("__rn", F.row_number().over(w_cap))
        .filter(F.col("__rn") <= 64)
        .drop("__rn")
    )
    a = capped.select(F.col("vec_id").alias("id_1"), "tbl", "sig")
    b = capped.select(F.col("vec_id").alias("id_2"), "tbl", "sig")
    pairs = (
        a.join(b, ["tbl", "sig"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2")
        .distinct()
    )
    got = pairs.collect()
    assert len(got) == 64 * 63 // 2  # C(64,2), NOT C(200,2)=19900
    assert max(max(r["id_1"], r["id_2"]) for r in got) == 63  # lowest ids
