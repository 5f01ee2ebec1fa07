"""Distributed Lloyd's k-means over embedding columns (north-star
extension — the training half of the IVF index family in
similarity_ops.py, and the canonical "iterative algorithm as a lazy
DataFrame plan" shape).

Everything is DataFrame ops: assignment is a broadcast cross join of
the corpus against k centroid rows followed by a windowed argmin;
the centroid update is a posexplode -> per-(cluster, dim) average ->
array rebuild. No driver-side collect anywhere — the centroid
relation stays a (tiny) DataFrame and iterations compose lazily, so
Catalyst sees one plan per fitted model.

Scale notes (100 TB): each iteration re-scans the corpus once —
inherent to Lloyd's — so callers at scale should cache/checkpoint the
input once up front; the per-iteration shuffle is k*dim rows (the
per-dimension partial sums combine map-side), and the broadcast side
is always exactly k rows. Determinism: init is the k lowest-id
vectors (no RNG to ship), distances and means are rounded to 6
decimals before every comparison, ties break to the lowest cluster
id — which is what makes the whole fit replayable in ANSI SQL by the
DuckDB oracle (plans/similarity.py q75).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.functions.vectors import _as_double


def _round6(arr):
    return F.transform(arr, lambda x: F.round(x, 6))


def kmeans_init(emb: DataFrame, k: int, id_col: str, vec_col: str) -> DataFrame:
    """Deterministic seeding: the k lowest-id vectors, numbered
    0..k-1 in id order. TakeOrdered collects nothing to the driver —
    the limit stays in the plan (k rows cross the final exchange)."""
    seed = emb.orderBy(id_col).limit(k)
    return seed.select(
        (F.row_number().over(Window.orderBy(id_col)) - 1).alias("cluster_id"),
        _round6(_as_double(vec_col)).alias("centroid"),
    )


def kmeans_assign(
    emb: DataFrame, centroids: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Nearest-centroid assignment: broadcast the k centroid rows,
    score every vector against all k (the k-way fan-out is the
    standard Lloyd cost), argmin on the ROUNDED squared distance with
    ties to the lowest cluster id (cross-engine determinism).

    The argmin is min(struct(dist, cluster)) under hash aggregation,
    NOT a window: the broadcast fan-out keeps all k candidate rows in
    their input partition, so the partial aggregate collapses them
    k->1 map-side and the shuffle moves one row per vector — a
    windowed row_number would shuffle and sort all k*N fanned-out
    rows."""
    sq = F.aggregate(
        F.zip_with(
            _as_double(vec_col), F.col("centroid"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = emb.crossJoin(F.broadcast(centroids)).select(
        id_col, vec_col, "cluster_id", F.round(sq, 6).alias("sq_dist")
    )
    best = scored.groupBy(id_col).agg(
        F.min(F.struct("sq_dist", "cluster_id")).alias("__best"),
        F.first(vec_col).alias(vec_col),  # identical across the k fan-out rows
    )
    return best.select(
        id_col,
        vec_col,
        F.col("__best.cluster_id").alias("cluster_id"),
        F.col("__best.sq_dist").alias("sq_dist"),
    )


def kmeans_update(assigned: DataFrame, vec_col: str) -> DataFrame:
    """Centroid recomputation: per-(cluster, dimension) mean via
    posexplode (map-side combinable — the shuffle carries k*dim
    partial sums, not vectors), then rebuild the array ordered by
    dimension. Clusters that lost every member drop out, matching the
    SQL replay's semantics."""
    per_dim = assigned.select(
        "cluster_id", F.posexplode(_as_double(vec_col)).alias("__pos", "__val")
    )
    means = per_dim.groupBy("cluster_id", "__pos").agg(
        F.round(F.avg("__val"), 6).alias("__m")
    )
    return means.groupBy("cluster_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__pos", "__m"))),
            lambda s: s["__m"],
        ).alias("centroid")
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Fixed-iteration Lloyd's: init -> n_iter x (assign, update) ->
    final assignment against the last centroids. Returns
    (assignments, centroids); assignments carry (id, cluster_id,
    sq_dist). Fixed iteration count (not a convergence test) keeps
    the plan fully lazy — no per-round action — and keeps the SQL
    oracle finite."""
    cents = kmeans_init(emb, k, id_col, vec_col)
    for _ in range(n_iter):
        assigned = kmeans_assign(emb, cents, id_col, vec_col)
        cents = kmeans_update(assigned, vec_col)
    final = kmeans_assign(emb, cents, id_col, vec_col).select(
        id_col, "cluster_id", "sq_dist"
    )
    return final, cents
