"""Embedding similarity search (north-star extension).

Two strategies over an ``array<float>`` embedding column:

  * brute-force cosine top-k — the exact baseline: query set x corpus
    join, cosine as a Catalyst higher-order-function fold (double
    math, JVM-side), per-query window top-k. At scale: broadcast the
    query set (it is the small side), so the corpus is scanned once
    with no shuffle of the embeddings; the only shuffle is the
    top-k aggregation keyed by query id.
  * random-hyperplane LSH ANN — the scale path: H deterministic
    hyperplanes (signs derived from sha256 of (plane, dim) — no RNG
    state, reproducible everywhere) give an H-bit signature; the
    corpus is bucketed by signature prefix, candidates come from the
    query's bucket, exact cosine re-ranks. Misses are possible
    (that's the A in ANN); recall is measured against brute force in
    tests/test_similarity.py.

The signature is computed with a vectorized pandas UDF (Arrow batch
-> one numpy matmul per batch) — the documented exception to the
no-UDF rule: a 64xH matmul per row is where numpy beats per-element
Catalyst expression trees.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.functions.vectors import (
    cosine_hoisted,
    norm,
)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.
    Output: (query_id, neighbor_id, cos_sim, rank), self excluded,
    ties broken by neighbor id for determinism."""
    # norms hoisted into each side's row projection: the scoring
    # join then evaluates ONE interpreted HOF fold (the dot) per
    # pair instead of three — bit-identical cosines
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm(vec_col).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        norm(vec_col).alias("__cn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_hoisted("__qv", "__cv", "__qn", "__cn"), 6
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int) -> np.ndarray:
    """Deterministic +-1 hyperplanes: sign(p, d) from sha256 —
    identical on every machine, no RNG state to ship."""
    signs = np.empty((dim, n_planes), dtype=np.float64)
    for p in range(n_planes):
        for d in range(dim):
            h = hashlib.sha256(f"plane:{p}:dim:{d}".encode()).digest()
            signs[d, p] = 1.0 if h[0] % 2 == 0 else -1.0
    return signs


def with_lsh_signatures(
    df: DataFrame,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    vec_col: str = "embedding",
    out_col: str = "lsh_sigs",
) -> DataFrame:
    """Append ``n_tables`` independent n_planes-bit random-hyperplane
    signatures (array<long>). Arrow-batched pandas UDF: one
    (batch x dim) @ (dim x tables*planes) matmul per batch.

    Multi-table is the recall lever of hyperplane LSH: each table is
    an independent chance for true neighbors to collide; candidates
    are the union over tables. Bits-per-table trades bucket
    selectivity (cost) against per-table recall.
    """
    planes = _hyperplanes(dim, n_planes * n_tables)  # (dim, T*P)
    weights = np.power(2.0, np.arange(n_planes))

    @F.pandas_udf("array<long>")
    def sigs(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)  # (batch, dim)
        # round-6 before the sign test: an engine replaying the
        # projection from SQL folds must reach the identical bit even
        # when a dot sits within accumulation-order ulp of zero
        bits = np.round(mat @ planes, 6) > 0  # (batch, T*P)
        out = [
            (bits[:, t * n_planes : (t + 1) * n_planes] @ weights).astype(np.int64)
            for t in range(n_tables)
        ]
        return pd.Series(np.stack(out, axis=1).tolist())

    return df.withColumn(out_col, sigs(F.col(vec_col)))


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share any per-table signature
    bucket with the query (union over tables); exact cosine re-ranks
    candidates. Output schema matches brute_force_topk (fewer than k
    rows per query when the buckets are thin — ANN semantics)."""

    def banded(df: DataFrame, idc: str, alias: str, valias: str, nalias: str) -> DataFrame:
        return (
            with_lsh_signatures(df, dim, n_planes, n_tables, vec_col)
            .select(
                F.col(id_col).alias(alias),
                F.col(vec_col).alias(valias),
                norm(vec_col).alias(nalias),
                F.posexplode("lsh_sigs").alias("table", "sig"),
            )
        )

    c = banded(corpus, id_col, "neighbor_id", "__cv", "__cn")
    q = banded(queries, id_col, "query_id", "__qv", "__qn")
    cands = (
        c.join(F.broadcast(q), ["table", "sig"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__qv", "__cv", "__qn", "__cn")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_hoisted("__qv", "__cv", "__qn", "__cn"), 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    block_col: str | None = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= threshold, blocked
    by ``block_col`` (a cheap cluster/bucket key) to avoid the full
    N^2 — the standard blocking pattern; set block_col=None for the
    exact quadratic sweep on small inputs."""
    a = df.select(
        F.col(id_col).alias("id_1"),
        F.col(vec_col).alias("__v1"),
        norm(vec_col).alias("__n1"),
        *( [F.col(block_col)] if block_col else [] ),
    )
    b = df.select(
        F.col(id_col).alias("id_2"),
        F.col(vec_col).alias("__v2"),
        norm(vec_col).alias("__n2"),
        *( [F.col(block_col)] if block_col else [] ),
    )
    joined = a.join(b, on=block_col) if block_col else a.crossJoin(b)
    return (
        joined.filter(F.col("id_1") < F.col("id_2"))
        .select(
            "id_1",
            "id_2",
            F.round(cosine_hoisted("__v1", "__v2", "__n1", "__n2"), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_index(
    corpus: DataFrame,
    n_centroids: int = 40,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, DataFrame]:
    """IVF coarse quantizer without iterative training: centroids are
    a deterministic pseudo-random corpus sample — the C rows with the
    smallest ``md5(id)`` (md5 of the id rendered as a string: both
    this engine and the DuckDB oracle derive the identical order, so
    the whole index is cross-engine reproducible). Spark executes
    orderBy+limit as TakeOrderedAndProject (each partition keeps its
    local top-C, the driver merges C-sized heaps), so only C rows
    ever reach the driver — no O(N) materialization. At real scale
    you'd k-means the same sample; the assignment/probe machinery
    below is identical either way.

    Returns (cent_norm, assigned): the row-normalized (C x dim)
    centroid matrix, and the corpus with each vector's
    nearest-centroid id (``ivf_cell``). Assignment is one
    Arrow-batched matmul per batch: (batch x dim) @ (dim x C);
    cosines are rounded to 6 decimals before the argmax with ties to
    the lowest cell — the same decision an engine replaying the index
    from SQL folds arrives at (raw last-ulp accumulation-order drift
    must not flip cell choices).
    """
    # null ids are excluded up front so BOTH selection paths (the
    # md5 < '1' sliver and the small-corpus fallback) see the same
    # candidate set — without this, the sliver filter would drop
    # null-id rows while the fallback's ASC-NULLS-FIRST sort would
    # pick them, silently changing the centroid set between paths
    base = corpus.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    )
    # the C globally-smallest md5 values all start with '0', so a
    # md5 < '1' pre-filter prunes ~15/16 of rows BEFORE the top-C
    # heap ever sees them — same result, no full-corpus ranking.
    # (TakeOrderedAndProject still scans once to hash ids, but the
    # per-row heap work now happens on the filtered sliver only.)
    key = F.md5(F.col("__id").cast("string"))
    cents = (
        base.filter(key < F.lit("1"))
        .orderBy(key, F.col("__id"))
        .limit(n_centroids)
        .collect()
    )
    if len(cents) < n_centroids:
        # corpus smaller than ~16*C: the sliver can run short — fall
        # back to the unfiltered ranking (tiny input, cost irrelevant)
        cents = (
            base.orderBy(key, F.col("__id")).limit(n_centroids).collect()
        )
    cent_mat = np.stack([np.asarray(r["__v"], dtype=np.float64) for r in cents])
    cent_norm = cent_mat / np.linalg.norm(cent_mat, axis=1, keepdims=True)

    @F.pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = np.round(mat @ cent_norm.T, 6)
        # argmax returns the FIRST max -> tie goes to the lowest cell
        return pd.Series(np.argmax(sims, axis=1).astype("int32"))

    return cent_norm, corpus.withColumn("ivf_cell", assign(F.col(vec_col)))


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 40,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidate_filter=None,
) -> DataFrame:
    """IVF ANN: corpus bucketed by nearest centroid; each query probes
    its ``n_probe`` nearest cells; exact cosine re-ranks candidates.
    Same output shape as brute_force_topk. At scale the assigned
    corpus is written partitioned by ivf_cell so a probe reads only
    n_probe/n_centroids of the data (partition pruning).

    ``candidate_filter`` (optional boolean Column over corpus
    columns) makes this FILTERED vector search: the index stays
    built on the FULL corpus (indexes are not rebuilt per
    predicate), and the filter lands on the assigned-corpus scan
    BEFORE the probe join — at rest that is partition pruning
    (ivf_cell) AND predicate pushdown (the metadata filter) on the
    same parquet scan, so a probe reads n_probe/n_centroids of the
    data and only the matching rows of that. Callers should widen
    ``n_probe`` under selective filters: cells are filtered too, so
    recall at fixed probe width drops roughly with selectivity."""
    cent_norm, assigned = ivf_index(corpus, n_centroids, id_col, vec_col)
    if candidate_filter is not None:
        assigned = assigned.where(candidate_filter)
    probe = min(n_probe, cent_norm.shape[0])

    @F.pandas_udf("array<int>")
    def probe_cells(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = np.round(mat @ cent_norm.T, 6)
        # stable sort on rounded sims: ties go to the lowest cell,
        # matching a SQL (sim DESC, cell ASC) ranking exactly
        order = np.argsort(-sims, axis=1, kind="stable")[:, :probe].astype("int32")
        return pd.Series(order.tolist())

    q = (
        queries.withColumn("ivf_cell", F.explode(probe_cells(F.col(vec_col))))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            norm(vec_col).alias("__qn"),
            "ivf_cell",
        )
    )
    c = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        norm(vec_col).alias("__cn"),
        "ivf_cell",
    )
    scored = (
        c.join(F.broadcast(q), "ivf_cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_hoisted("__qv", "__cv", "__qn", "__cn"), 6).alias("cos_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
