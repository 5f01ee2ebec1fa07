"""Distributed Lloyd's k-means (operators/clustering.py): behavioral
properties beyond the q75 oracle hash — argmin correctness, inertia
monotonicity, determinism, and the no-driver-collect plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from citybikedatawarehouse_spark.operators.clustering import (
    kmeans_assign,
    kmeans_fit,
    kmeans_init,
    kmeans_update,
)
from citybikedatawarehouse_spark.sources.readers import load_table


def _inertia(assigned) -> float:
    return assigned.agg(F.sum("sq_dist")).collect()[0][0]


def test_assign_is_argmin(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_init(emb, 3, "vec_id", "embedding")
    assigned = kmeans_assign(emb, cents, "vec_id", "embedding")
    # exactly one row per vector
    assert assigned.count() == emb.count()
    # the assigned distance is the minimum over all centroids
    sq = F.aggregate(
        F.zip_with(
            F.transform("embedding", lambda x: x.cast("double")),
            F.col("centroid"),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    all_d = (
        emb.crossJoin(F.broadcast(cents))
        .select("vec_id", F.round(sq, 6).alias("d"))
        .groupBy("vec_id")
        .agg(F.min("d").alias("min_d"))
    )
    bad = (
        assigned.join(all_d, "vec_id")
        .filter(F.col("sq_dist") != F.col("min_d"))
        .count()
    )
    assert bad == 0


def test_inertia_never_increases(spark, sf_dir):
    """Lloyd's guarantee: each assign+update round cannot raise the
    summed squared distance (up to the round-6 quantization)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_init(emb, 4, "vec_id", "embedding")
    prev = None
    for _ in range(3):
        assigned = kmeans_assign(emb, cents, "vec_id", "embedding")
        cur = _inertia(assigned)
        if prev is not None:
            assert cur <= prev + 1e-3
        prev = cur
        cents = kmeans_update(assigned, "embedding")


def test_fit_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a1, c1 = kmeans_fit(emb, k=4, n_iter=2)
    a2, c2 = kmeans_fit(emb, k=4, n_iter=2)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))
    assert sorted(map(tuple, c1.collect())) == sorted(map(tuple, c2.collect()))


def test_clusters_nonempty_and_labeled(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, cents = kmeans_fit(emb, k=4, n_iter=2)
    ids = {r[0] for r in cents.select("cluster_id").collect()}
    assert ids <= {0, 1, 2, 3}
    got = {r[0] for r in assigned.select("cluster_id").distinct().collect()}
    assert got <= ids


def test_kmeans_ivf_topk(spark, sf_dir):
    """Trained-quantizer IVF vs brute force on real testdata: output
    shape, determinism, and recall (euclidean cells + 2-of-8 probes
    on the planted-structure corpus must recover most of the true
    top-5)."""
    from citybikedatawarehouse_spark.operators.clustering import kmeans_ivf_topk
    from citybikedatawarehouse_spark.operators.similarity_ops import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    ann = kmeans_ivf_topk(emb, queries, k=5, n_cells=8, n_iter=2, n_probe=2).collect()
    assert {r["query_id"] for r in ann} == set(range(10))
    for r in ann:
        assert 1 <= r["rank"] <= 5
    ann2 = kmeans_ivf_topk(emb, queries, k=5, n_cells=8, n_iter=2, n_probe=2).collect()
    assert sorted(map(tuple, ann)) == sorted(map(tuple, ann2))
    brute_pairs = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    ann_pairs = {(r["query_id"], r["neighbor_id"]) for r in ann}
    assert len(ann_pairs & brute_pairs) / len(brute_pairs) >= 0.3


def test_hier_kmeans_partitions_and_respects_coarse(spark, sf_dir):
    """Hierarchical fit invariants: every vector assigned exactly
    once, fine ids within [0, k_fine), and each vector's coarse cell
    equals the flat coarse assignment it was derived from."""
    from citybikedatawarehouse_spark.operators.clustering import (
        hier_kmeans_fit,
        kmeans_assign,
        kmeans_fit,
    )
    from citybikedatawarehouse_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, fines = hier_kmeans_fit(emb, k_coarse=8, k_fine=4, n_iter=2)
    n = emb.count()
    assert assigned.count() == n
    assert assigned.select("vec_id").distinct().count() == n
    assert assigned.filter(
        (F.col("fine_id") < 0) | (F.col("fine_id") >= 4)
    ).count() == 0
    # coarse level must match the flat fit it reuses
    _, coarse = kmeans_fit(emb, k=8, n_iter=2)
    flat = kmeans_assign(emb, coarse, "vec_id", "embedding").select(
        "vec_id", F.col("cluster_id").alias("coarse_flat")
    )
    mismatch = (
        assigned.join(flat, "vec_id")
        .filter(F.col("coarse_cell") != F.col("coarse_flat"))
        .count()
    )
    assert mismatch == 0
    # every fine centroid belongs to an existing coarse cell
    cells = {r["coarse_cell"] for r in fines.select("coarse_cell").distinct().collect()}
    assert cells <= {r["coarse_cell"] for r in assigned.select("coarse_cell").distinct().collect()}


def test_pq_adc_self_distance_is_recon_err(spark, sf_dir):
    """ADC consistency identity: looking up a vector's OWN codes in
    its own distance table must reproduce exactly its reconstruction
    error (sum of per-subspace distances to its selected codes) —
    ties the q95 encode output and the q96 table math together."""
    from citybikedatawarehouse_spark.operators.clustering import pq_fit
    from citybikedatawarehouse_spark.functions.vectors import _as_double
    from citybikedatawarehouse_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    codes, books = pq_fit(emb, m=4, k=8, n_iter=1)
    sub = 16
    qd_dist = F.round(
        F.aggregate(
            F.zip_with(
                _as_double(
                    F.slice(F.col("embedding"), F.col("subspace") * sub + 1, sub)
                ),
                F.col("centroid"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )
    qd = (
        emb.select(F.col("vec_id").alias("query_id"), "embedding")
        .crossJoin(books)
        .select("query_id", "subspace", "cell", qd_dist.alias("d"))
    )
    own = codes.select(
        F.col("vec_id").alias("query_id"),
        "recon_err",
        F.posexplode(F.array("code_0", "code_1", "code_2", "code_3")).alias(
            "subspace", "cell"
        ),
    )
    self_dist = (
        own.join(qd, ["query_id", "subspace", "cell"])
        .groupBy("query_id", "recon_err")
        .agg(F.round(F.sum("d"), 6).alias("adc_self"))
    )
    mismatch = self_dist.filter(
        F.abs(F.col("adc_self") - F.col("recon_err")) > 1e-9
    ).count()
    assert mismatch == 0
