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
is always exactly k rows. Determinism: init is the first k vectors
in (md5(id), id) order — deterministic pseudo-random, no RNG state
to ship, and robust to id-correlated data layouts where lowest-id
seeding collapses (see kmeans_init) — distances and means are
rounded to 6 decimals before every comparison, ties break to the
lowest cluster id — which is what makes the whole fit replayable in
ANSI SQL by the DuckDB oracle (plans/similarity.py q75).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.functions.vectors import _as_double


def _round6(arr):
    return F.transform(arr, lambda x: F.round(x, 6))


def kmeans_init(emb: DataFrame, k: int, id_col: str, vec_col: str) -> DataFrame:
    """Deterministic PSEUDO-RANDOM seeding: the first k vectors in
    (md5(id), id) order, numbered 0..k-1 in that order. md5 ordering
    (no RNG state to ship, replayable in ANSI SQL) fixes the
    pathology of lowest-id seeding: when the smallest k ids are
    near-identical — planted duplicate groups, sorted ingest, any
    id-correlated layout — id-ordered seeds have zero diversity and
    Lloyd's strands most clusters inside one tight blob
    (tests/test_skew_properties.py's planted-group recall test
    falsified the old seeding). TakeOrdered collects nothing to the
    driver — the limit stays in the plan (k rows cross the final
    exchange).

    Numbering is collect_list -> array_sort -> posexplode on the
    already-limited k rows rather than an unpartitioned row_number
    window: same values, but the bench/test tail stays free of
    `WindowExec: No Partition Defined` warnings, so a REAL
    unpartitioned window sneaking onto a data path is visible instead
    of drowned by k-row seeding noise."""
    skey = F.md5(F.col(id_col).cast("string"))
    seed = emb.orderBy(skey, id_col).limit(k).select(
        skey.alias("__skey"),
        F.col(id_col).alias("__sid"),
        _round6(_as_double(vec_col)).alias("centroid"),
    )
    packed = seed.agg(
        F.array_sort(
            F.collect_list(F.struct("__skey", "__sid", "centroid"))
        ).alias("__s")
    )
    return packed.select(
        F.posexplode("__s").alias("cluster_id", "__e")
    ).select("cluster_id", F.col("__e.centroid").alias("centroid"))


def kmeans_assign(
    emb: DataFrame, centroids: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Nearest-centroid assignment: collapse the k centroid rows into
    ONE broadcast array row, then argmin as a higher-order-function
    fold per vector — zero shuffle of the corpus. A crossJoin fan-out
    + groupBy(id) argmin (the previous shape) re-shuffles every
    vector once per assignment even though all k candidate rows stay
    in their input partition; with the k-array broadcast the corpus
    never moves at all during Lloyd's — only the k x dim partial
    sums in the update step ever cross the wire. argmin =
    array_min(struct(ROUNDED sq_dist, cluster_id)): ties to the
    lowest cluster id, identical to the SQL replay's
    min(struct(...)) decision."""
    cents_row = centroids.agg(
        F.array_sort(
            F.collect_list(F.struct("cluster_id", "centroid"))
        ).alias("__cents")
    )

    def sq_to(c):
        return F.aggregate(
            F.zip_with(
                _as_double(vec_col), c["centroid"], lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    best = F.array_min(
        F.transform(
            F.col("__cents"),
            lambda c: F.struct(
                F.round(sq_to(c), 6).alias("sq_dist"),
                c["cluster_id"].alias("cluster_id"),
            ),
        )
    )
    return (
        emb.crossJoin(F.broadcast(cents_row))
        .select(id_col, vec_col, best.alias("__best"))
        .select(
            id_col,
            vec_col,
            F.col("__best.cluster_id").alias("cluster_id"),
            F.col("__best.sq_dist").alias("sq_dist"),
        )
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


def kmeans_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    n_iter: int = 2,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN with a k-means-TRAINED coarse quantizer (vs
    similarity_ops.ivf_index's sampled one): Lloyd-fit the cells,
    assign the corpus, probe each query's n_probe nearest cells, and
    exact-cosine re-rank the union of probed cells. Output shape
    matches brute_force_topk (query_id, neighbor_id, cos_sim, rank).

    All Catalyst HOF expressions — no pandas UDF and no driver-side
    centroid matrix: the quantizer stays a k-row DataFrame that is
    localCheckpointed once (it is consumed by both the corpus
    assignment and the query probe; without the checkpoint each
    consumer would replay the whole Lloyd chain). At scale the
    assigned corpus is written partitioned by cluster_id, so a probe
    reads n_probe/n_cells of the data via partition pruning."""
    from citybikedatawarehouse_spark.functions.vectors import (
        cosine_hoisted,
        norm,
    )

    cents = kmeans_init(corpus, n_cells, id_col, vec_col)
    for _ in range(n_iter):
        cents = kmeans_update(
            kmeans_assign(corpus, cents, id_col, vec_col), vec_col
        )
    cents = cents.localCheckpoint(eager=False)  # k rows, two consumers
    assigned = kmeans_assign(corpus, cents, id_col, vec_col)

    sq = F.aggregate(
        F.zip_with(
            _as_double(vec_col), F.col("centroid"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("__sq").asc(), F.col("cluster_id").asc()
    )
    probes = (
        queries.crossJoin(F.broadcast(cents))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            "cluster_id",
            F.round(sq, 6).alias("__sq"),
        )
        .withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "__qv", norm("__qv").alias("__qn"), "cluster_id")
    )
    cand = (
        assigned.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cv"),
            norm(vec_col).alias("__cn"),
            "cluster_id",
        )
        .join(F.broadcast(probes), "cluster_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_hoisted("__qv", "__cv", "__qn", "__cn"), 6).alias("cos_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return cand.withColumn("rank", F.row_number().over(w_rank)).filter(
        F.col("rank") <= k
    )


def hier_assign(
    av: DataFrame, fines: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Fine-level assignment for the hierarchical quantizer: the fine
    centroids of each coarse cell collapse into one array row, the
    (tiny, k_coarse-row) table broadcasts, and each vector argmins
    over ONLY its own coarse cell's fine centroids — the corpus never
    shuffles, and per-vector work is k_fine folds, not
    k_coarse*k_fine."""
    per_cell = fines.groupBy("coarse_cell").agg(
        F.array_sort(
            F.collect_list(F.struct("fine_id", "centroid"))
        ).alias("__fc")
    )

    def sq_to(c):
        return F.aggregate(
            F.zip_with(
                _as_double(vec_col), c["centroid"], lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    best = F.array_min(
        F.transform(
            F.col("__fc"),
            lambda c: F.struct(
                F.round(sq_to(c), 6).alias("sq_dist"),
                c["fine_id"].alias("fine_id"),
            ),
        )
    )
    return (
        av.join(F.broadcast(per_cell), "coarse_cell")
        .select(id_col, vec_col, "coarse_cell", best.alias("__best"))
        .select(
            id_col,
            vec_col,
            "coarse_cell",
            F.col("__best.fine_id").alias("fine_id"),
            F.col("__best.sq_dist").alias("sq_dist"),
        )
    )


def hier_kmeans_fit(
    emb: DataFrame,
    k_coarse: int = 8,
    k_fine: int = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Two-level (hierarchical) k-means quantizer — the scale escape
    for flat IVF's O(N*k) assignment once k must grow with the
    corpus: a coarse Lloyd's fit (k_coarse cells) partitions the
    corpus, then k_fine sub-cells train INSIDE every coarse cell
    simultaneously (one distributed job per iteration, not a
    per-cell loop — the fine update is a single groupBy
    (coarse, fine, dim)). Per-vector assignment work drops from
    O(k_coarse*k_fine) to O(k_coarse) + O(k_fine); effective cells =
    k_coarse*k_fine.

    Determinism matches the flat fit: seeds are the k_fine lowest ids
    per coarse cell, distances/means round to 6, ties to the lowest
    cell — the whole two-level fit replays as a DuckDB CTE chain
    (q93's oracle). The coarse assignment is localCheckpointed: every
    fine iteration reads it, and at scale it is a persisted
    cluster-keyed table, not a recomputation of the coarse chain.

    Returns (assignments, fine_centroids): assignments carry
    (id, coarse_cell, fine_id, sq_dist to the fine centroid), plus
    the vector column when ``keep_vec`` — consumers that need the
    vectors (q117's pair sweep) take them from the assignment
    directly instead of paying an id-keyed corpus re-join."""
    _, coarse = kmeans_fit(emb, k=k_coarse, n_iter=n_iter, id_col=id_col, vec_col=vec_col)
    av = (
        kmeans_assign(emb, coarse, id_col, vec_col)
        .withColumnRenamed("cluster_id", "coarse_cell")
        .drop("sq_dist")
        .localCheckpoint(eager=False)
    )
    # fine seeds: first k_fine members per coarse cell in (md5(id),
    # id) order — the same pseudo-random seeding rationale as
    # kmeans_init, applied within each cell
    w = Window.partitionBy("coarse_cell").orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    )
    fines = (
        av.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k_fine)
        .select(
            "coarse_cell",
            (F.col("__rn") - 1).alias("fine_id"),
            _round6(_as_double(vec_col)).alias("centroid"),
        )
    )
    for _ in range(n_iter):
        assigned = hier_assign(av, fines, id_col, vec_col)
        per_dim = assigned.select(
            "coarse_cell",
            "fine_id",
            F.posexplode(_as_double(vec_col)).alias("__pos", "__val"),
        )
        means = per_dim.groupBy("coarse_cell", "fine_id", "__pos").agg(
            F.round(F.avg("__val"), 6).alias("__m")
        )
        fines = means.groupBy("coarse_cell", "fine_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__m"))),
                lambda s: s["__m"],
            ).alias("centroid")
        )
    keep = [id_col] + ([vec_col] if keep_vec else []) + [
        "coarse_cell", "fine_id", "sq_dist"
    ]
    final = hier_assign(av, fines, id_col, vec_col).select(*keep)
    return final, fines


def hier_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k_coarse: int = 8,
    k_fine: int = 4,
    n_iter: int = 2,
    n_probe_coarse: int = 2,
    n_probe_fine: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k through the hierarchical quantizer: each query
    probes its ``n_probe_coarse`` nearest coarse cells, then the
    ``n_probe_fine`` nearest fine cells WITHIN each probed coarse
    cell, and exact cosine re-ranks the candidate union. Probe work
    per query is O(k_coarse) + O(n_probe_coarse * k_fine) — the
    hierarchical version of kmeans_ivf_topk's O(k) probe, which is
    what keeps query cost flat as the cell count grows with the
    corpus. Candidate volume is bounded by the probed (coarse, fine)
    cells; at scale the assigned corpus is stored partitioned by
    (coarse_cell, fine_id) so the candidate join is partition-pruned.
    """
    from citybikedatawarehouse_spark.functions.vectors import (
        cosine_hoisted,
        norm,
    )

    assigned, fines = hier_kmeans_fit(
        corpus, k_coarse, k_fine, n_iter, id_col, vec_col
    )
    fines = fines.localCheckpoint(eager=False)  # probed twice below

    # coarse probe: nearest coarse cells by distance to the coarse
    # MEANS of the fine centroids? No — the coarse centroids trained
    # first are gone from the fit output, so probe against the fine
    # centroids grouped per coarse cell: a query's distance to a
    # coarse cell is its distance to that cell's NEAREST fine
    # centroid (the same argmin the corpus assignment ran, so probe
    # and assignment agree on geometry).
    per_cell = fines.groupBy("coarse_cell").agg(
        F.array_sort(
            F.collect_list(F.struct("fine_id", "centroid"))
        ).alias("__fc")
    )

    def sq_to(c):
        return F.aggregate(
            F.zip_with(
                _as_double(vec_col), c["centroid"], lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    scored_cells = F.transform(
        F.col("__fc"),
        lambda c: F.struct(
            F.round(sq_to(c), 6).alias("sq"),
            c["fine_id"].alias("fine_id"),
        ),
    )
    w_coarse = Window.partitionBy("query_id").orderBy(
        F.col("__cell_best.sq").asc(), F.col("coarse_cell").asc()
    )
    probed_coarse = (
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias(vec_col)
        )
        .crossJoin(F.broadcast(per_cell))
        .select(
            "query_id",
            vec_col,
            "coarse_cell",
            F.array_min(scored_cells).alias("__cell_best"),
            scored_cells.alias("__scored"),
        )
        .withColumn("__rn", F.row_number().over(w_coarse))
        .filter(F.col("__rn") <= n_probe_coarse)
    )
    # fine probe inside each probed coarse cell: the n_probe_fine
    # best (sq, fine_id) structs of the already-computed score array
    probed = probed_coarse.select(
        "query_id",
        F.col(vec_col).alias("__qv"),
        norm(vec_col).alias("__qn"),
        "coarse_cell",
        F.explode(
            F.slice(F.array_sort(F.col("__scored")), 1, n_probe_fine)
        ).alias("__f"),
    ).select(
        "query_id", "__qv", "__qn", "coarse_cell",
        F.col("__f.fine_id").alias("fine_id"),
    )
    cand = (
        assigned.join(corpus.select(id_col, vec_col), id_col)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cv"),
            norm(vec_col).alias("__cn"),
            "coarse_cell",
            "fine_id",
        )
        .join(F.broadcast(probed), ["coarse_cell", "fine_id"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_hoisted("__qv", "__cv", "__qn", "__cn"), 6
            ).alias("cos_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return cand.withColumn("rank", F.row_number().over(w_rank)).filter(
        F.col("rank") <= k
    )


def pq_fit_encode(
    emb: DataFrame,
    m: int = 4,
    k: int = 8,
    n_iter: int = 1,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product quantization: split each vector into ``m`` contiguous
    subspaces, Lloyd-fit a ``k``-entry codebook per subspace (all the
    determinism rules of kmeans_fit), and encode every vector as its
    m nearest-code ids — the compression layer of a large-scale
    embedding store (64 float32 dims = 256 B shrink to m code bytes;
    ANN distance tables then work on codes, not vectors).

    Returns (id, code_0..code_{m-1}, recon_err) where recon_err is
    the total squared distance to the selected codes (the sum of the
    per-subspace rounded sq_dists — the quantity PQ minimizes).

    Scale shape: each subspace fit is the shuffle-free kmeans_fit on
    a SLICED projection (the slice is a narrow per-row expression, so
    the m fits each scan the corpus once over sub/dim of the bytes);
    the final m-way join is id-keyed and AQE co-partitions it. The m
    fits are independent — Spark schedules their jobs concurrently
    under the same action."""
    codes, _books = pq_fit(emb, m, k, n_iter, dim, id_col, vec_col)
    return codes


def pq_fit(
    emb: DataFrame,
    m: int = 4,
    k: int = 8,
    n_iter: int = 1,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """The full PQ model: returns (codes, codebooks) where codes is
    pq_fit_encode's output and codebooks is one row per
    (subspace, cell, centroid) — the m*k-row relation ADC search
    broadcasts to build per-query distance tables."""
    sub = dim // m
    parts, books = [], []
    for s in range(m):
        sliced = emb.select(
            id_col, F.slice(vec_col, s * sub + 1, sub).alias("__sub")
        )
        assigned, cents = kmeans_fit(
            sliced, k=k, n_iter=n_iter, id_col=id_col, vec_col="__sub"
        )
        parts.append(
            assigned.select(
                id_col,
                F.col("cluster_id").alias(f"code_{s}"),
                F.col("sq_dist").alias(f"__err_{s}"),
            )
        )
        books.append(
            cents.select(
                F.lit(s).alias("subspace"),
                F.col("cluster_id").alias("cell"),
                "centroid",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.join(p, id_col)
    total = F.round(
        sum(F.col(f"__err_{s}") for s in range(m)), 6
    ).alias("recon_err")
    codes = out.select(id_col, *[f"code_{s}" for s in range(m)], total)
    allbooks = books[0]
    for b in books[1:]:
        allbooks = allbooks.unionByName(b)
    return codes, allbooks


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 4,
    k_codes: int = 8,
    n_iter: int = 1,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric distance computation over PQ codes — the standard
    PQ query path: each query builds an m*k_codes distance table
    (exact squared distance of its subspace slices to every codebook
    entry), and a corpus vector's approximate distance is the SUM of
    m table lookups selected by its stored codes. No raw corpus
    vector is ever touched at query time — the scan reads m small
    int codes per vector, which is the whole point of PQ at 100 TB
    (the 64x-compressed code table is what stays hot).

    Plan: codes posexplode to (id, subspace, code) and join the
    BROADCAST distance tables on (subspace, cell); the per-(query,
    neighbor) sum is map-side combinable. Rounding: table entries
    round to 6 (cross-engine bit-stable), the m-term sum rounds to 6
    again — same order-insensitive arithmetic the oracle replays."""
    sub = dim // m
    codes, books = pq_fit(
        corpus, m, k_codes, n_iter, dim, id_col, vec_col
    )
    qd_dist = F.round(
        F.aggregate(
            F.zip_with(
                _as_double(
                    F.slice(
                        F.col(vec_col),
                        F.col("subspace") * sub + 1,
                        sub,
                    )
                ),
                F.col("centroid"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )
    # books is m*k_codes rows — broadcast explicitly (AQE would
    # usually rescue the plan, but the hint costs nothing and pins it,
    # matching the ADC lookup join below)
    qd = (
        queries.select(F.col(id_col).alias("query_id"), vec_col)
        .crossJoin(F.broadcast(books))
        .select("query_id", "subspace", "cell", qd_dist.alias("__d"))
    )
    cc = codes.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode(
            F.array(*[f"code_{s}" for s in range(m)])
        ).alias("subspace", "cell"),
    )
    approx = (
        cc.join(F.broadcast(qd), ["subspace", "cell"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.sum("__d"), 6).alias("approx_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("neighbor_id").asc()
    )
    return approx.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    n_iter_ivf: int = 2,
    m: int = 4,
    k_codes: int = 8,
    n_iter_pq: int = 1,
    dim: int = 64,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ — the composed FAISS-style index: a Lloyd-trained
    coarse quantizer restricts each query to its ``n_probe`` nearest
    cells (q76's probe), and candidates inside those cells are scored
    by PQ asymmetric distance over their stored codes (q96's ADC) —
    query-time work is O(n_probe/n_cells · corpus) table LOOKUPS,
    touching neither raw corpus vectors nor unprobed cells. This is
    the index layout a 100 TB embedding store runs: the coarse cell
    is the at-rest partition key (probe = partition pruning), the
    code table is the 64×-compressed hot set, raw vectors page in
    only for a final exact re-rank when recall demands it.

    Returns (query_id, neighbor_id, approx_dist, rank) — rank by
    ascending ADC distance, deterministic neighbor_id tie-break.
    """
    from pyspark.sql import Window

    # coarse quantizer + corpus assignment (the q76 fit)
    cents = kmeans_init(corpus, n_cells, id_col, vec_col)
    for _ in range(n_iter_ivf):
        cents = kmeans_update(
            kmeans_assign(corpus, cents, id_col, vec_col), vec_col
        )
    cents = cents.localCheckpoint(eager=False)  # k rows, two consumers
    assigned = kmeans_assign(corpus, cents, id_col, vec_col).select(
        id_col, "cluster_id"
    )

    sq = F.aggregate(
        F.zip_with(
            _as_double(vec_col),
            F.col("centroid"),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("__sq").asc(), F.col("cluster_id").asc()
    )
    probes = (
        queries.crossJoin(F.broadcast(cents))
        .select(
            F.col(id_col).alias("query_id"),
            "cluster_id",
            F.round(sq, 6).alias("__sq"),
        )
        .withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "cluster_id")
    )

    # PQ model + per-query distance tables (the q96 ADC side)
    sub = dim // m
    codes, books = pq_fit(corpus, m, k_codes, n_iter_pq, dim, id_col, vec_col)
    qd_dist = F.round(
        F.aggregate(
            F.zip_with(
                _as_double(
                    F.slice(
                        F.col(vec_col), F.col("subspace") * sub + 1, sub
                    )
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
        queries.select(F.col(id_col).alias("query_id"), vec_col)
        .crossJoin(F.broadcast(books))
        .select("query_id", "subspace", "cell", qd_dist.alias("__d"))
    )

    # candidates: codes of vectors in the query's probed cells only
    cc = (
        codes.join(assigned, id_col)
        .select(
            F.col(id_col).alias("neighbor_id"),
            "cluster_id",
            F.posexplode(
                F.array(*[f"code_{s}" for s in range(m)])
            ).alias("subspace", "cell"),
        )
        .join(F.broadcast(probes), "cluster_id")
    )
    approx = (
        cc.join(F.broadcast(qd), ["query_id", "subspace", "cell"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.sum("__d"), 6).alias("approx_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("neighbor_id").asc()
    )
    return approx.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
