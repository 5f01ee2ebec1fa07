"""Similarity search over the embeddings table (north-star
extension): brute-force cosine top-k baseline + LSH-bucketed ANN +
cosine near-dup pairs. Heavy lifting in operators/similarity_ops.py.

Oracle note: DuckDB's list_cosine_similarity computes in float32 and
drifts ~1e-6 from double math, so oracles unnest to doubles
explicitly (parallel unnest zips element-wise in DuckDB).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Window
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.plans.catalog import register
from citybikedatawarehouse_spark.sources.readers import load_table as _t

@register(
    "q70_cosine_topk",
    oracle="""
    WITH expl AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(unnest(q.embedding) AS DOUBLE) AS qe,
             CAST(unnest(c.embedding) AS DOUBLE) AS ce
      FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
    ),
    scored AS (
      SELECT query_id, neighbor_id,
             round(sum(qe * ce) / (sqrt(sum(qe * qe)) * sqrt(sum(ce * ce))), 6) AS cos_sim
      FROM expl GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INTEGER) AS rank FROM (
      SELECT query_id, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def q70_cosine_topk(spark, sf_dir):
    """Brute-force exact cosine top-5 for query vectors vec_id < 10:
    broadcast queries x corpus scan, double-math fold, window top-k."""
    from citybikedatawarehouse_spark.operators.similarity_ops import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@register(
    "q71_cosine_neardup",
    oracle="""
    WITH expl AS (
      SELECT a.vec_id AS id_1, b.vec_id AS id_2,
             CAST(unnest(a.embedding) AS DOUBLE) AS ae,
             CAST(unnest(b.embedding) AS DOUBLE) AS be
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT id_1, id_2, cos_sim FROM (
      SELECT id_1, id_2,
             round(sum(ae * be) / (sqrt(sum(ae * ae)) * sqrt(sum(be * be))), 6) AS cos_sim
      FROM expl GROUP BY 1, 2
    ) WHERE cos_sim >= 0.4
    """,
)
def q71_cosine_neardup(spark, sf_dir):
    """Embedding near-dup pairs (cosine >= threshold), label-blocked
    to avoid N^2 — the embedding leg of the dedup suite. The
    synthetic embeddings are i.i.d. random (max pairwise cosine
    ~0.45-0.51 per SF), so a production-style 0.95 threshold matches
    NOTHING at any SF and the oracle check is a hash of the empty
    set (the q147 vacuity trap). 0.4 is calibrated to this data:
    5/5/86 pairs at sf0.001/0.01/0.1 — the operator shape is
    identical, the check is no longer vacuous."""
    from citybikedatawarehouse_spark.operators.similarity_ops import (
        cosine_neardup_pairs,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return cosine_neardup_pairs(emb, threshold=0.4, block_col="label")


@register(
    "q72_lsh_ann_topk",
    oracle="""
    WITH planes AS (  -- sha256-derived +-1 hyperplanes: sign(p,d)
      SELECT p, d,
             CASE WHEN ('0x' || substr(sha256('plane:' || p || ':dim:' || d), 1, 2))::INT % 2 = 0
                  THEN 1.0 ELSE -1.0 END AS sgn
      FROM range(0, 32) t1(p) CROSS JOIN range(0, 64) t2(d)
    ),
    dots AS (  -- projection of every vector on every plane, round 6
      SELECT e.vec_id, pl.p,
             round(sum(CAST(e.embedding[pl.d + 1] AS DOUBLE) * pl.sgn), 6) AS dot
      FROM embeddings e CROSS JOIN planes pl
      GROUP BY 1, 2
    ),
    sigs AS (  -- 4 tables x 8-bit signatures
      SELECT vec_id, p // 8 AS tbl,
             CAST(sum(CASE WHEN dot > 0 THEN power(2, p % 8) ELSE 0 END) AS BIGINT) AS sig
      FROM dots GROUP BY 1, 2
    ),
    cands AS (  -- bucket collisions in any table
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM sigs q JOIN sigs c ON q.tbl = c.tbl AND q.sig = c.sig
      WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
    ),
    scored AS (  -- exact cosine re-rank of candidates
      SELECT query_id, neighbor_id,
             round(sum(qe * ce) / (sqrt(sum(qe * qe)) * sqrt(sum(ce * ce))), 6) AS cos_sim
      FROM (
        SELECT cd.query_id, cd.neighbor_id,
               CAST(unnest(q.embedding) AS DOUBLE) AS qe,
               CAST(unnest(c.embedding) AS DOUBLE) AS ce
        FROM cands cd
        JOIN embeddings q ON q.vec_id = cd.query_id
        JOIN embeddings c ON c.vec_id = cd.neighbor_id
      ) GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INTEGER) AS rank FROM (
      SELECT query_id, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def q72_lsh_ann_topk(spark, sf_dir):
    """Random-hyperplane LSH ANN top-5: 4 tables x 8-bit signatures,
    candidates = union of bucket hits, exact cosine re-rank.

    Oracle-paired: the sha256-derived planes are pure public math
    both engines can evaluate, so DuckDB replays signature
    construction, bucket collisions, and the re-ranked top-k — the
    hash gate covers the whole ANN path (the Spark side computes
    signatures in an Arrow-batched matmul; round-6 before the sign
    test keeps bit decisions identical across engines). Recall vs
    brute force is additionally asserted in tests/test_similarity.py."""
    from citybikedatawarehouse_spark.operators.similarity_ops import lsh_ann_topk

    emb = _t(spark, sf_dir, "embeddings")
    return lsh_ann_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@register(
    "q73_embedding_stats",
    oracle="""
    SELECT label,
           count(*) AS n,
           round(avg(nrm), 6) AS avg_norm,
           round(min(nrm), 6) AS min_norm,
           round(max(nrm), 6) AS max_norm
    FROM (
      SELECT label, sqrt(sum(e * e)) AS nrm FROM (
        SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS e
        FROM embeddings
      ) GROUP BY vec_id, label
    )
    GROUP BY label
    """,
)
def q73_embedding_stats(spark, sf_dir):
    """Per-label embedding norm statistics — array higher-order
    functions feeding a relational aggregate."""
    from citybikedatawarehouse_spark.functions.vectors import norm

    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.select("label", norm("embedding").alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
        )
    )


@register(
    "q74_ivf_ann_topk",
    oracle="""
    WITH cents AS (
      SELECT cell, cvec FROM (
        SELECT embedding AS cvec,
               row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
                 - 1 AS cell
        FROM embeddings
      ) WHERE cell < 40
    ),
    asims AS (  -- cosine of every vector to every centroid, round 6
      SELECT vec_id, cell,
             round(sum(ee * ce) / (sqrt(sum(ee * ee)) * sqrt(sum(ce * ce))), 6) AS sim
      FROM (
        SELECT e.vec_id, c.cell,
               CAST(unnest(e.embedding) AS DOUBLE) AS ee,
               CAST(unnest(c.cvec) AS DOUBLE) AS ce
        FROM embeddings e CROSS JOIN cents c
      ) GROUP BY 1, 2
    ),
    assign AS (  -- nearest cell per corpus vector (ties -> low cell)
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, cell) AS rn
        FROM asims
      ) WHERE rn = 1
    ),
    probes AS (  -- each query probes its 4 nearest cells
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, cell) AS rn
        FROM asims WHERE vec_id < 10
      ) WHERE rn <= 4
    ),
    cands AS (
      SELECT DISTINCT p.vec_id AS query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.vec_id
    ),
    scored AS (  -- exact cosine re-rank of candidates
      SELECT query_id, neighbor_id,
             round(sum(qe * ce) / (sqrt(sum(qe * qe)) * sqrt(sum(ce * ce))), 6) AS cos_sim
      FROM (
        SELECT cd.query_id, cd.neighbor_id,
               CAST(unnest(q.embedding) AS DOUBLE) AS qe,
               CAST(unnest(c.embedding) AS DOUBLE) AS ce
        FROM cands cd
        JOIN embeddings q ON q.vec_id = cd.query_id
        JOIN embeddings c ON c.vec_id = cd.neighbor_id
      ) GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INTEGER) AS rank FROM (
      SELECT query_id, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def q74_ivf_ann_topk(spark, sf_dir):
    """IVF ANN top-5 (deterministic md5-sampled coarse quantizer,
    4-cell probe, exact re-rank) — the partition-pruned alternative
    scale path to q72's hyperplane LSH.

    Oracle-paired: centroid order (md5 of the id string), cell
    assignment (round-6 cosine argmax, ties to the low cell), probe
    sets, and the re-ranked top-k are all replayed in DuckDB SQL, so
    the hash gate checks the ENTIRE index construction, not just the
    final ranking. Recall vs brute force is additionally asserted in
    tests/test_similarity.py."""
    from citybikedatawarehouse_spark.operators.similarity_ops import ivf_ann_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_ann_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@register(
    "q263_filtered_ann_topk",
    oracle="""
    WITH cents AS (
      SELECT cell, cvec FROM (
        SELECT embedding AS cvec,
               row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
                 - 1 AS cell
        FROM embeddings
      ) WHERE cell < 40
    ),
    asims AS (
      SELECT vec_id, cell,
             round(sum(ee * ce) / (sqrt(sum(ee * ee)) * sqrt(sum(ce * ce))), 6) AS sim
      FROM (
        SELECT e.vec_id, c.cell,
               CAST(unnest(e.embedding) AS DOUBLE) AS ee,
               CAST(unnest(c.cvec) AS DOUBLE) AS ce
        FROM embeddings e CROSS JOIN cents c
      ) GROUP BY 1, 2
    ),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, cell) AS rn
        FROM asims
      ) WHERE rn = 1
    ),
    probes AS (  -- widened probe: filtered search keeps recall by
                 -- scanning more cells (8 vs q74's 4)
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, cell) AS rn
        FROM asims WHERE vec_id < 10
      ) WHERE rn <= 8
    ),
    cands AS (  -- the metadata predicate restricts CANDIDATES only
      SELECT DISTINCT p.vec_id AS query_id, a.vec_id AS neighbor_id
      FROM probes p
      JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.vec_id
      JOIN embeddings m ON m.vec_id = a.vec_id AND m.label % 3 = 0
    ),
    scored AS (
      SELECT query_id, neighbor_id,
             round(sum(qe * ce) / (sqrt(sum(qe * qe)) * sqrt(sum(ce * ce))), 6) AS cos_sim
      FROM (
        SELECT cd.query_id, cd.neighbor_id,
               CAST(unnest(q.embedding) AS DOUBLE) AS qe,
               CAST(unnest(c.embedding) AS DOUBLE) AS ce
        FROM cands cd
        JOIN embeddings q ON q.vec_id = cd.query_id
        JOIN embeddings c ON c.vec_id = cd.neighbor_id
      ) GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INTEGER) AS rank FROM (
      SELECT query_id, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def q263_filtered_ann_topk(spark, sf_dir):
    """FILTERED vector search — the production ANN shape (pgvector /
    Milvus / OpenSearch filtered k-NN): top-5 cosine neighbors among
    vectors satisfying a metadata predicate (label % 3 = 0), with
    the IVF index built on the FULL corpus (indexes are not rebuilt
    per predicate) and the predicate applied to candidates inside
    the probed cells.

    Two scale decisions this query pins: (1) the filter lands on the
    assigned-corpus scan BEFORE the probe join — at rest that is
    partition pruning (ivf_cell) plus predicate pushdown (label) on
    the SAME parquet scan; (2) the probe is widened 4 -> 8 because a
    ~1/3-selective filter thins every probed cell, and recall at
    fixed probe width drops roughly with selectivity — the widened
    probe buys it back at n_probe/n_centroids = 20% of the corpus
    read, vs a brute-force filtered scan reading 100%.

    Oracle-paired end-to-end like q74: centroid order, assignment,
    widened probe sets, the candidate predicate, and the re-ranked
    top-k are all replayed in DuckDB SQL."""
    from citybikedatawarehouse_spark.operators.similarity_ops import ivf_ann_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_ann_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        k=5,
        n_probe=8,
        candidate_filter=F.col("label") % 3 == 0,
    )


_KM_SQ = (
    "round(sum((CAST(e.embedding[t.i] AS DOUBLE) - c.cvec[t.i]) "
    "* (CAST(e.embedding[t.i] AS DOUBLE) - c.cvec[t.i])), 6)"
)


def _kmeans_ctes(
    k: int, n_iter: int, dim: int, table: str = "embeddings"
) -> list[str]:
    """CTE chain replaying the deterministic fixed-iteration Lloyd's
    fit (operators/clustering.py): same init (first k vectors in
    md5(id) order — deterministic pseudo-random, see kmeans_init),
    same round-6 distances/means, same low-cluster tie-break — one
    assign/update pair per iteration (c0 -> a0 -> c1 -> ... ->
    afinal). Shared by the q75 and q76 oracles. ``table`` lets a
    caller train on a CTE-defined SLICE (q167's frozen historical
    fit); the default renders byte-identical SQL to the original."""

    def assign(name: str, cents: str) -> str:
        return f"""
    {name} AS (
      SELECT vec_id, cell, sq FROM (
        SELECT vec_id, cell, sq,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sq, cell) AS rn
        FROM (
          SELECT e.vec_id, c.cell, {_KM_SQ} AS sq
          FROM {table} e CROSS JOIN {cents} c,
               range(1, {dim} + 1) t(i)
          GROUP BY e.vec_id, c.cell
        )
      ) WHERE rn = 1
    )"""

    def update(name: str, assigned: str) -> str:
        return f"""
    {name} AS (
      SELECT cell, list(m ORDER BY i) AS cvec FROM (
        SELECT a.cell, t.i,
               round(avg(CAST(e.embedding[t.i] AS DOUBLE)), 6) AS m
        FROM {assigned} a JOIN {table} e USING (vec_id),
             range(1, {dim} + 1) t(i)
        GROUP BY a.cell, t.i
      ) GROUP BY cell
    )"""

    ctes = [
        f"""
    c0 AS (
      SELECT row_number() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
             list_transform(embedding,
                            x -> round(CAST(x AS DOUBLE), 6)) AS cvec
      FROM (SELECT * FROM {table}
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k})
    )"""
    ]
    for it in range(n_iter):
        ctes.append(assign(f"a{it}", f"c{it}"))
        ctes.append(update(f"c{it + 1}", f"a{it}"))
    ctes.append(assign("afinal", f"c{n_iter}"))
    return ctes


def _kmeans_oracle_sql(k: int = 4, n_iter: int = 2, dim: int = 64) -> str:
    return (
        "WITH" + ",".join(_kmeans_ctes(k, n_iter, dim)) + """
    SELECT vec_id, CAST(cell AS INTEGER) AS cluster_id, sq AS sq_dist
    FROM afinal
    """
    )


@register("q75_kmeans", oracle=_kmeans_oracle_sql(k=4, n_iter=2))
def q75_kmeans(spark, sf_dir):
    """Distributed Lloyd's k-means (k=4, 2 fixed iterations) over the
    embeddings table — the iterative-algorithm shape: every step is a
    lazy DataFrame op (broadcast cross join + windowed argmin for
    assignment, posexplode + per-dim mean for the update), no driver
    collect, no RNG.

    Oracle-paired: deterministic init (k lowest ids), round-6
    distances and means, and low-cluster tie-breaks make the ENTIRE
    fit — both update steps included — replayable as a DuckDB CTE
    chain, so the hash gate checks the iteration itself, not just the
    final labels."""
    from citybikedatawarehouse_spark.operators.clustering import kmeans_fit

    emb = _t(spark, sf_dir, "embeddings")
    assigned, _ = kmeans_fit(emb, k=4, n_iter=2)
    return assigned


def _ivf_kmeans_oracle_sql(
    n_cells: int = 8, n_iter: int = 2, dim: int = 64, n_probe: int = 2, topk: int = 5
) -> str:
    """q76 replay: the shared k-means CTE chain trains the quantizer,
    afinal is the corpus cell assignment, then probe/candidate/re-rank
    follow the q74 IVF pattern."""
    ctes = _kmeans_ctes(n_cells, n_iter, dim)
    ctes.append(f"""
    probes AS (
      SELECT query_id, cell FROM (
        SELECT query_id, cell,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sq, cell) AS rn
        FROM (
          SELECT e.vec_id AS query_id, c.cell, {_KM_SQ} AS sq
          FROM embeddings e CROSS JOIN c{n_iter} c,
               range(1, {dim} + 1) t(i)
          WHERE e.vec_id < 10
          GROUP BY e.vec_id, c.cell
        )
      ) WHERE rn <= {n_probe}
    )""")
    ctes.append("""
    cands AS (
      SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN afinal a USING (cell)
      WHERE a.vec_id <> p.query_id
    )""")
    ctes.append("""
    scored AS (
      SELECT query_id, neighbor_id,
             round(sum(qe * ce) / (sqrt(sum(qe * qe)) * sqrt(sum(ce * ce))), 6) AS cos_sim
      FROM (
        SELECT cd.query_id, cd.neighbor_id,
               CAST(unnest(q.embedding) AS DOUBLE) AS qe,
               CAST(unnest(c.embedding) AS DOUBLE) AS ce
        FROM cands cd
        JOIN embeddings q ON q.vec_id = cd.query_id
        JOIN embeddings c ON c.vec_id = cd.neighbor_id
      ) GROUP BY 1, 2
    )""")
    return (
        "WITH" + ",".join(ctes) + f"""
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INTEGER) AS rank FROM (
      SELECT query_id, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= {topk}
    """
    )


@register("q76_ivf_kmeans_topk", oracle=_ivf_kmeans_oracle_sql())
def q76_ivf_kmeans_topk(spark, sf_dir):
    """IVF ANN top-5 with a k-means-TRAINED coarse quantizer (8
    Lloyd-fitted cells, 2-cell probe, exact cosine re-rank) — the
    trained-index counterpart of q74's sampled quantizer, and the
    piece that ties the clustering operator into the similarity
    suite. Pure Catalyst HOF expressions end to end: no pandas UDF,
    no driver-side centroid matrix.

    Oracle-paired: the shared Lloyd CTE chain plus the probe /
    candidate / re-rank replay means the hash gate covers quantizer
    TRAINING and the search path in one check."""
    from citybikedatawarehouse_spark.operators.clustering import kmeans_ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    return kmeans_ivf_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5, n_cells=8, n_iter=2, n_probe=2
    )


def _semantic_dedup_oracle_sql(
    k: int = 16,
    n_iter: int = 2,
    dim: int = 64,
    threshold: float = 0.4,
    anchor_cap: int = 128,
) -> str:
    """q88 replay: the shared k-means CTE chain assigns every vector
    to its trained cluster (the semantic blocking key), then any
    vector with a smaller-id ANCHOR neighbor at cosine >= threshold
    inside its cluster is dropped (the greedy SemDeDup keep-min rule,
    closure-free). Anchors = the anchor_cap lowest-id members of the
    cell — the same skew bound the Spark side applies, so both
    engines agree on every input."""
    ctes = _kmeans_ctes(k, n_iter, dim)
    ctes.append(f"""
    cpairs AS (
      SELECT a1.vec_id AS id_1, a2.vec_id AS id_2, a1.cell
      FROM (SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY cell
                                      ORDER BY vec_id) AS rn
            FROM afinal) a1
      JOIN afinal a2
        ON a1.cell = a2.cell AND a1.vec_id < a2.vec_id
      WHERE a1.rn <= {anchor_cap}
    )""")
    ctes.append("""
    cscored AS (
      SELECT id_1, id_2, cell,
             round(sum(ae * be) / (sqrt(sum(ae * ae)) * sqrt(sum(be * be))), 6) AS cos_sim
      FROM (
        SELECT p.id_1, p.id_2, p.cell,
               CAST(unnest(a.embedding) AS DOUBLE) AS ae,
               CAST(unnest(b.embedding) AS DOUBLE) AS be
        FROM cpairs p
        JOIN embeddings a ON a.vec_id = p.id_1
        JOIN embeddings b ON b.vec_id = p.id_2
      ) GROUP BY 1, 2, 3
    )"""
    )
    return (
        "WITH" + ",".join(ctes) + f"""
    SELECT DISTINCT id_2 AS vec_id, CAST(cell AS INTEGER) AS cluster_id
    FROM cscored WHERE cos_sim >= {threshold}
    """
    )


def capped_pair_sweep(
    av,
    cell_cols: list[str],
    threshold: float,
    anchor_cap: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Anchor-capped within-cell near-dup sweep (shared by q88's flat
    cells and q117's (coarse, fine) cells): drop every vector with a
    smaller-id ANCHOR cell-mate at cosine >= threshold, where anchors
    are the anchor_cap lowest-id members of the cell. The rank window
    partitions by the cell columns, riding the exact exchange the
    pair join needs — the bound costs no extra shuffle, and pair
    volume per cell is O(|cell| * cap), never O(|cell|^2). Input
    ``av`` must carry (id, vec, *cell_cols). Returns the dropped set
    (id, *cell_cols), distinct. ONE definition so the cap semantics
    can never diverge between the flat and hierarchical paths."""
    from citybikedatawarehouse_spark.functions.vectors import cosine_hoisted, norm

    w_anchor = Window.partitionBy(*cell_cols).orderBy(id_col)
    av = av.select(
        id_col,
        vec_col,
        *cell_cols,
        F.row_number().over(w_anchor).alias("__rank"),
    )
    a = av.filter(F.col("__rank") <= anchor_cap).select(
        F.col(id_col).alias("id_1"),
        F.col(vec_col).alias("__v1"),
        norm(vec_col).alias("__n1"),
        *cell_cols,
    )
    b = av.select(
        F.col(id_col).alias("id_2"),
        F.col(vec_col).alias("__v2"),
        norm(vec_col).alias("__n2"),
        *cell_cols,
    )
    return (
        a.join(b, cell_cols)
        .filter(F.col("id_1") < F.col("id_2"))
        .filter(
            F.round(cosine_hoisted("__v1", "__v2", "__n1", "__n2"), 6)
            >= threshold
        )
        .select(F.col("id_2").alias(id_col), *cell_cols)
        .distinct()
    )


def semantic_dedup(
    emb,
    k: int = 16,
    n_iter: int = 2,
    threshold: float = 0.4,
    anchor_cap: int = 128,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """SemDeDup core (shared by q88 and the skew tests): k-means
    blocking + greedy keep-min-id drop rule, with the within-cell
    pair sweep bounded by ``anchor_cap``.

    The cap is the LSH-bucket-cap pattern applied to learned cells:
    each vector is compared against only the cap lowest-id members
    ("anchors") of its cell — a ``row_number`` window over
    ``cluster_id`` that rides the exact exchange the pair join needs,
    so the bound costs no extra shuffle. Pair volume per cell falls
    from O(|cell|^2) to O(|cell| * cap): one giant cell (skewed
    k-means fits ARE common on real embedding corpora) can no longer
    explode the join. Semantics under the cap: a duplicate pair is
    detected iff its smaller-id member is an anchor — in the
    degenerate all-near-identical corpus every vector matches anchor
    #1 and the dedup is still complete (see
    tests/test_skew_properties.py); what is sacrificed is only
    far-tail pairs inside oversized MIXED cells, where callers should
    raise k (or sub-cluster with hier_kmeans_fit — q117) so cells
    stay under the cap. The oracle applies the identical rank
    filter. Sweep core shared with q117 via ``capped_pair_sweep``."""
    from citybikedatawarehouse_spark.operators.clustering import (
        kmeans_assign,
        kmeans_fit,
    )

    # Lloyd's re-scans the input 2*n_iter+2 times; materialize the
    # projected (id, vec) relation ONCE so every pass reads executor-
    # local blocks instead of re-decoding parquet (the clustering
    # module's own scale note, applied). Measured at sf0.1: 2.72 s ->
    # 2.57 s, a ~6% win — modest here because the sf0.1 scan is
    # cheap, but the gap widens with input size since the saved work
    # is per-scan decode; see PERFORMANCE.md round 5.
    emb_p = emb.select(id_col, vec_col).localCheckpoint(
        eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK
    )  # serialized: O(N) vector arrays, the measured 100x OOM shape
    _, cents = kmeans_fit(emb_p, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col)
    av = kmeans_assign(emb_p, cents, id_col, vec_col)
    return capped_pair_sweep(
        av, ["cluster_id"], threshold, anchor_cap, id_col, vec_col
    )


@register("q88_semantic_dedup", oracle=_semantic_dedup_oracle_sql())
def q88_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic deduplication: a trained k-means
    clustering is the blocking key (vectors can only be near-dups
    inside one semantic cell), then the greedy keep-min-id rule drops
    every vector with a smaller-id anchor cluster-mate at cosine >=
    0.4. Returns the dropped set (vec_id, cluster_id).

    Recall characterization (measured honestly): cell blocking is
    sound exactly in SemDeDup's design regime — tight true
    duplicates at cosine ~1 co-locate, and on planted duplicate
    groups the survivor count per group provably equals the number
    of cells the group occupies (>=0.9 recall with the md5
    pseudo-random seeding; tests/test_skew_properties.py). On
    WEAKLY-similar pairs it is structurally lossy: this synthetic
    corpus's qualifying pairs all sit at cosine 0.4-0.6, where
    members straddle cell boundaries, and measured recall vs the
    exact all-pairs rule is 0.40 at sf0.01 (0.30 before md5
    seeding), precision 1.0. Production thresholds (0.9+) live in
    the sound regime; raising k or using q117's hierarchy trades
    recall for cost explicitly.

    Scale story: the pair scan is quadratic only WITHIN a cell, and
    since round 5 it is hard-bounded by the 128-anchor cap (see
    ``semantic_dedup``) — a skewed fit that lands 10% of a 100 TB
    corpus in one cell produces O(|cell|*128) pairs, not O(|cell|^2).
    k=16 balances assignment O(N*k*dim) against the pair sweep
    O(N^2/k) — re-measured at sf0.1 under the round-5 md5 seeding:
    k=8 2.62s, k=16 2.39s, k=24 2.43s (the r4 lowest-id-seeding
    sweep gave the same ordering); at scale k grows with the corpus
    to hold cell size constant, with hier_kmeans_fit as the
    subdivide path once flat k saturates.
    Versus q71's given-label blocking, the blocking key here is
    LEARNED, so the operator works on unlabeled corpora; the oracle
    replays the full fit + capped pair sweep in SQL."""
    return semantic_dedup(_t(spark, sf_dir, "embeddings"))


_HKM_SQ = (
    "round(sum((CAST(e.embedding[t.i] AS DOUBLE) - c.cvec[t.i]) "
    "* (CAST(e.embedding[t.i] AS DOUBLE) - c.cvec[t.i])), 6)"
)


def _hier_kmeans_oracle_sql(
    k_coarse: int = 8, k_fine: int = 4, n_iter: int = 2, dim: int = 64
) -> str:
    """q93 replay: the shared coarse CTE chain (afinal = per-vector
    coarse cell), then the fine level — seeds are the k_fine lowest
    ids per coarse cell, and every fine assign joins a vector only to
    its own coarse cell's fine centroids."""
    ctes = _kmeans_ctes(k_coarse, n_iter, dim)
    ctes.append(f"""
    f0 AS (
      SELECT s.cell AS ccell, s.rn - 1 AS fine,
             list_transform(e.embedding,
                            x -> round(CAST(x AS DOUBLE), 6)) AS cvec
      FROM (SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY cell
                     ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
            FROM afinal) s
      JOIN embeddings e ON e.vec_id = s.vec_id
      WHERE s.rn <= {k_fine}
    )""")

    def fassign(name: str, cents: str) -> str:
        return f"""
    {name} AS (
      SELECT vec_id, ccell, fine, sq FROM (
        SELECT vec_id, ccell, fine, sq,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sq, fine) AS rn
        FROM (
          SELECT e.vec_id, c.ccell, c.fine, {_HKM_SQ} AS sq
          FROM embeddings e
          JOIN afinal a ON a.vec_id = e.vec_id
          JOIN {cents} c ON c.ccell = a.cell,
               range(1, {dim} + 1) t(i)
          GROUP BY e.vec_id, c.ccell, c.fine
        )
      ) WHERE rn = 1
    )"""

    def fupdate(name: str, assigned: str) -> str:
        return f"""
    {name} AS (
      SELECT ccell, fine, list(m ORDER BY i) AS cvec FROM (
        SELECT a.ccell, a.fine, t.i,
               round(avg(CAST(e.embedding[t.i] AS DOUBLE)), 6) AS m
        FROM {assigned} a JOIN embeddings e USING (vec_id),
             range(1, {dim} + 1) t(i)
        GROUP BY a.ccell, a.fine, t.i
      ) GROUP BY ccell, fine
    )"""

    for it in range(n_iter):
        ctes.append(fassign(f"fa{it}", f"f{it}"))
        ctes.append(fupdate(f"f{it + 1}", f"fa{it}"))
    ctes.append(fassign("fafinal", f"f{n_iter}"))
    return (
        "WITH" + ",".join(ctes) + """
    SELECT vec_id, CAST(ccell AS INTEGER) AS coarse_cell,
           CAST(fine AS INTEGER) AS fine_id, sq AS sq_dist
    FROM fafinal
    """
    )


@register("q93_hier_kmeans", oracle=_hier_kmeans_oracle_sql())
def q93_hier_kmeans(spark, sf_dir):
    """Two-level hierarchical k-means quantizer (8 coarse x 4 fine =
    32 effective cells): the scale escape for flat IVF once the cell
    count must grow with the corpus — per-vector assignment work is
    O(k_coarse) + O(k_fine) instead of O(k_coarse*k_fine), and the
    fine level trains inside every coarse cell SIMULTANEOUSLY (one
    distributed groupBy per iteration, never a per-cell loop). The
    oracle replays both levels end-to-end, fine seeds and per-cell
    restricted assignments included.

    Scale notes: both assign levels are broadcast-array argmin folds
    (zero corpus shuffle, same as q75 post-round-4); the coarse
    assignment localCheckpoints because every fine iteration reads it
    — at 100 TB that is the persisted cluster-keyed corpus table."""
    from citybikedatawarehouse_spark.operators.clustering import hier_kmeans_fit

    emb = _t(spark, sf_dir, "embeddings")
    assigned, _ = hier_kmeans_fit(emb, k_coarse=8, k_fine=4, n_iter=2)
    return assigned


def _hier_ivf_oracle_parts(
    k_coarse: int = 8,
    k_fine: int = 4,
    n_iter: int = 2,
    dim: int = 64,
    n_probe_coarse: int = 2,
    n_probe_fine: int = 2,
    topk: int = 5,
    query_pred: str = "e.vec_id < 10",
) -> tuple[str, str]:
    """q94 replay, returned as (cte_prefix, final_select) so callers
    composing LONGER chains (q152 appends the label-audit stages)
    splice structurally instead of string-slicing the rendered SQL —
    a cosmetic reformat here must never break another module's import
    (round-5 ADVICE). ``_hier_ivf_oracle_sql`` joins the parts.

    The chain: q93's two-level fit, then the hierarchical probe —
    coarse cells ranked by their nearest fine centroid, fine cells
    ranked within each probed coarse cell, candidates re-ranked by
    exact cosine (the q76 pattern); the final select takes top-k per
    query from the ``hscored`` CTE."""
    # reuse q93's full CTE chain (coarse + fine levels) verbatim:
    # take everything between its WITH and its final SELECT
    hier = _hier_kmeans_oracle_sql(k_coarse, k_fine, n_iter, dim)
    fine_part = hier.split("WITH", 1)[1].rsplit("SELECT vec_id, CAST(ccell", 1)[0]
    ctes = [fine_part.rstrip().rstrip(",")]
    ctes.append(f"""
    qsq AS (
      SELECT e.vec_id AS query_id, c.ccell, c.fine, {_HKM_SQ} AS sq
      FROM embeddings e CROSS JOIN f{n_iter} c,
           range(1, {dim} + 1) t(i)
      WHERE {query_pred}
      GROUP BY e.vec_id, c.ccell, c.fine
    )""")
    ctes.append(f"""
    cprobe AS (
      SELECT query_id, ccell FROM (
        SELECT query_id, ccell,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY min(sq), ccell) AS rn
        FROM qsq GROUP BY query_id, ccell
      ) WHERE rn <= {n_probe_coarse}
    )""")
    ctes.append(f"""
    fprobe AS (
      SELECT q.query_id, q.ccell, q.fine FROM (
        SELECT query_id, ccell, fine,
               row_number() OVER (PARTITION BY query_id, ccell
                                  ORDER BY sq, fine) AS rn
        FROM qsq
      ) q JOIN cprobe p ON p.query_id = q.query_id AND p.ccell = q.ccell
      WHERE q.rn <= {n_probe_fine}
    )""")
    ctes.append("""
    hcands AS (
      SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
      FROM fprobe p JOIN fafinal a ON a.ccell = p.ccell AND a.fine = p.fine
      WHERE a.vec_id <> p.query_id
    )""")
    ctes.append("""
    hscored AS (
      SELECT query_id, neighbor_id,
             round(sum(qe * ce) / (sqrt(sum(qe * qe)) * sqrt(sum(ce * ce))), 6) AS cos_sim
      FROM (
        SELECT cd.query_id, cd.neighbor_id,
               CAST(unnest(q.embedding) AS DOUBLE) AS qe,
               CAST(unnest(c.embedding) AS DOUBLE) AS ce
        FROM hcands cd
        JOIN embeddings q ON q.vec_id = cd.query_id
        JOIN embeddings c ON c.vec_id = cd.neighbor_id
      ) GROUP BY 1, 2
    )""")
    prefix = "WITH" + ",".join(ctes)
    final = f"""
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INTEGER) AS rank FROM (
      SELECT query_id, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM hscored
    ) WHERE rank <= {topk}
    """
    return prefix, final


def _hier_ivf_oracle_sql(**kwargs) -> str:
    """The rendered q94 oracle: CTE prefix + final top-k select."""
    prefix, final = _hier_ivf_oracle_parts(**kwargs)
    return prefix + final


@register("q94_hier_ivf_topk", oracle=_hier_ivf_oracle_sql())
def q94_hier_ivf_topk(spark, sf_dir):
    """ANN top-5 through the hierarchical quantizer (q93's fit):
    queries probe their 2 nearest coarse cells, the 2 nearest fine
    cells within each, and exact cosine re-ranks the candidates.
    Probe work per query is O(k_coarse) + O(n_probe_coarse * k_fine)
    — flat as effective cell count grows — versus the flat IVF's
    O(cells). A coarse cell's distance is the distance to its nearest
    fine centroid, the same argmin the corpus assignment used, so
    probe geometry and assignment geometry agree. Oracle replays fit,
    both probe levels, and the re-rank."""
    from citybikedatawarehouse_spark.operators.clustering import hier_ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    return hier_ivf_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


def _pq_ctes(s: int, off: int, sub: int, k: int, n_iter: int) -> list[str]:
    """Per-subspace replay of the sliced kmeans_fit: identical to
    _kmeans_ctes but indexing embedding[t.i + off] so the slice never
    materializes. CTE names are s{s}-prefixed."""
    sq = (
        f"round(sum((CAST(e.embedding[t.i + {off}] AS DOUBLE) - c.cvec[t.i]) "
        f"* (CAST(e.embedding[t.i + {off}] AS DOUBLE) - c.cvec[t.i])), 6)"
    )

    def assign(name: str, cents: str) -> str:
        return f"""
    {name} AS (
      SELECT vec_id, cell, sq FROM (
        SELECT vec_id, cell, sq,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sq, cell) AS rn
        FROM (
          SELECT e.vec_id, c.cell, {sq} AS sq
          FROM embeddings e CROSS JOIN {cents} c,
               range(1, {sub} + 1) t(i)
          GROUP BY e.vec_id, c.cell
        )
      ) WHERE rn = 1
    )"""

    def update(name: str, assigned: str) -> str:
        return f"""
    {name} AS (
      SELECT cell, list(m ORDER BY i) AS cvec FROM (
        SELECT a.cell, t.i,
               round(avg(CAST(e.embedding[t.i + {off}] AS DOUBLE)), 6) AS m
        FROM {assigned} a JOIN embeddings e USING (vec_id),
             range(1, {sub} + 1) t(i)
        GROUP BY a.cell, t.i
      ) GROUP BY cell
    )"""

    ctes = [
        f"""
    s{s}c0 AS (
      SELECT row_number() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
             list_transform(embedding[{off + 1}:{off + sub}],
                            x -> round(CAST(x AS DOUBLE), 6)) AS cvec
      FROM (SELECT * FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k})
    )"""
    ]
    for it in range(n_iter):
        ctes.append(assign(f"s{s}a{it}", f"s{s}c{it}"))
        ctes.append(update(f"s{s}c{it + 1}", f"s{s}a{it}"))
    ctes.append(assign(f"s{s}afinal", f"s{s}c{n_iter}"))
    return ctes


def _pq_oracle_sql(
    m: int = 4, k: int = 8, n_iter: int = 1, dim: int = 64
) -> str:
    sub = dim // m
    ctes: list[str] = []
    for s in range(m):
        ctes.extend(_pq_ctes(s, s * sub, sub, k, n_iter))
    code_cols = ", ".join(
        f"CAST(s{s}afinal.cell AS INTEGER) AS code_{s}" for s in range(m)
    )
    joins = " ".join(
        f"JOIN s{s}afinal ON s{s}afinal.vec_id = s0afinal.vec_id"
        for s in range(1, m)
    )
    err = " + ".join(f"s{s}afinal.sq" for s in range(m))
    return (
        "WITH" + ",".join(ctes) + f"""
    SELECT s0afinal.vec_id, {code_cols},
           round({err}, 6) AS recon_err
    FROM s0afinal {joins}
    """
    )


@register("q95_pq_encode", oracle=_pq_oracle_sql())
def q95_pq_encode(spark, sf_dir):
    """Product quantization (4 subspaces x 16 dims, 8-entry codebooks,
    1 Lloyd iteration): every vector compresses to 4 code ids + its
    reconstruction error — 256 bytes of float32 down to 4 bytes, the
    storage/shuffle format a 100 TB embedding store actually keeps
    online (ANN then scans distance tables over codes, touching raw
    vectors only at re-rank). Each subspace codebook is the
    shuffle-free kmeans_fit on a sliced projection; the m fits are
    independent jobs over 1/m of the vector bytes each. Oracle
    replays all four sub-fits end-to-end."""
    from citybikedatawarehouse_spark.operators.clustering import pq_fit_encode

    emb = _t(spark, sf_dir, "embeddings")
    return pq_fit_encode(emb, m=4, k=8, n_iter=1)


def _pq_adc_oracle_sql(
    m: int = 4, k: int = 8, n_iter: int = 1, dim: int = 64, topk: int = 5
) -> str:
    sub = dim // m
    ctes: list[str] = []
    for s in range(m):
        ctes.extend(_pq_ctes(s, s * sub, sub, k, n_iter))
    books = " UNION ALL ".join(
        f"SELECT {s} AS subspace, cell, cvec FROM s{s}c{n_iter}"
        for s in range(m)
    )
    codes = " UNION ALL ".join(
        f"SELECT vec_id, {s} AS subspace, cell FROM s{s}afinal"
        for s in range(m)
    )
    ctes.append(f"""
    books AS ({books})""")
    ctes.append(f"""
    qcodes AS ({codes})""")
    ctes.append(f"""
    qd AS (
      SELECT q.vec_id AS query_id, b.subspace, b.cell,
             round(sum((CAST(q.embedding[t.i + b.subspace * {sub}] AS DOUBLE) - b.cvec[t.i])
                       * (CAST(q.embedding[t.i + b.subspace * {sub}] AS DOUBLE) - b.cvec[t.i])), 6) AS d
      FROM embeddings q CROSS JOIN books b,
           range(1, {sub} + 1) t(i)
      WHERE q.vec_id < 10
      GROUP BY 1, 2, 3
    )""")
    ctes.append("""
    approx AS (
      SELECT qd.query_id, c.vec_id AS neighbor_id,
             round(sum(qd.d), 6) AS approx_dist
      FROM qcodes c JOIN qd ON qd.subspace = c.subspace AND qd.cell = c.cell
      WHERE c.vec_id <> qd.query_id
      GROUP BY 1, 2
    )""")
    return (
        "WITH" + ",".join(ctes) + f"""
    SELECT query_id, neighbor_id, approx_dist, CAST(rank AS INTEGER) AS rank FROM (
      SELECT query_id, neighbor_id, approx_dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY approx_dist, neighbor_id) AS rank
      FROM approx
    ) WHERE rank <= {topk}
    """
    )


@register("q96_pq_adc_topk", oracle=_pq_adc_oracle_sql())
def q96_pq_adc_topk(spark, sf_dir):
    """Asymmetric-distance top-5 over PQ codes (q95's model): each
    query builds a 4x8 distance table against the subspace codebooks;
    a corpus vector's approximate distance is the sum of 4 table
    lookups selected by its stored codes — query-time scans touch
    only the compressed code table, never raw vectors. Oracle replays
    codebook training, encoding, the distance tables, and the ranked
    lookup sum end-to-end."""
    from citybikedatawarehouse_spark.operators.clustering import pq_adc_topk

    emb = _t(spark, sf_dir, "embeddings")
    return pq_adc_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@register(
    "q115_hard_negatives",
    oracle="""
    WITH expl AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS neg_label,
             CAST(unnest(q.embedding) AS DOUBLE) AS qe,
             CAST(unnest(c.embedding) AS DOUBLE) AS ce
      FROM embeddings q JOIN embeddings c
        ON q.vec_id < 10 AND q.label <> c.label
    ),
    scored AS (
      SELECT query_id, neighbor_id, neg_label,
             round(sum(qe * ce) / (sqrt(sum(qe * qe)) * sqrt(sum(ce * ce))), 6)
               AS cos_sim
      FROM expl GROUP BY 1, 2, 3
    )
    SELECT query_id, neighbor_id, neg_label, cos_sim,
           CAST(rank AS INTEGER) AS rank FROM (
      SELECT query_id, neighbor_id, neg_label, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def q115_hard_negatives(spark, sf_dir):
    """Hard-negative mining for contrastive training: for each query
    vector (vec_id < 10), the top-5 most-similar vectors with a
    DIFFERENT label — the highest-cosine wrong-class examples that
    make the strongest negatives for embedding-model training
    (easy negatives teach nothing; false negatives are excluded by
    the label inequality).

    Scale shape: the 10-query side broadcasts into a
    label-inequality join (BroadcastNestedLoop over 10 rows — the
    non-equi twin of q70's brute-force scan), one hoisted-norm
    cosine fold per pair, and a query-partitioned top-k window. At
    corpus scale the exact scan swaps for the IVF/PQ candidate
    paths (q74/q76/q96) with the label filter applied to candidates
    — same output contract."""
    from citybikedatawarehouse_spark.functions.vectors import cosine_hoisted, norm

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"),
        norm("embedding").alias("__qn"),
        F.col("label").alias("__ql"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("__cv"),
        norm("embedding").alias("__cn"),
        F.col("label").alias("neg_label"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("__ql") != F.col("neg_label"))
        .select(
            "query_id",
            "neighbor_id",
            "neg_label",
            F.round(
                cosine_hoisted("__qv", "__cv", "__qn", "__cn"), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= 5
    )


def _semantic_dedup_hier_oracle_sql(
    k_coarse: int = 8,
    k_fine: int = 4,
    n_iter: int = 2,
    dim: int = 64,
    threshold: float = 0.4,
    anchor_cap: int = 128,
) -> str:
    """q117 replay: q93's full two-level fit CTE chain, then the
    capped pair sweep of q88 applied within (coarse, fine) cells."""
    hier = _hier_kmeans_oracle_sql(k_coarse, k_fine, n_iter, dim)
    fit = hier.split("WITH", 1)[1].rsplit("SELECT vec_id, CAST(ccell", 1)[0]
    ctes = [fit.rstrip().rstrip(",")]
    ctes.append(f"""
    hpairs AS (
      SELECT a1.vec_id AS id_1, a2.vec_id AS id_2, a1.ccell, a1.fine
      FROM (SELECT vec_id, ccell, fine,
                   row_number() OVER (PARTITION BY ccell, fine
                                      ORDER BY vec_id) AS rn
            FROM fafinal) a1
      JOIN fafinal a2
        ON a1.ccell = a2.ccell AND a1.fine = a2.fine
       AND a1.vec_id < a2.vec_id
      WHERE a1.rn <= {anchor_cap}
    )""")
    ctes.append("""
    hscored AS (
      SELECT id_1, id_2, ccell, fine,
             round(sum(ae * be) / (sqrt(sum(ae * ae)) * sqrt(sum(be * be))), 6)
               AS cos_sim
      FROM (
        SELECT p.id_1, p.id_2, p.ccell, p.fine,
               CAST(unnest(a.embedding) AS DOUBLE) AS ae,
               CAST(unnest(b.embedding) AS DOUBLE) AS be
        FROM hpairs p
        JOIN embeddings a ON a.vec_id = p.id_1
        JOIN embeddings b ON b.vec_id = p.id_2
      ) GROUP BY 1, 2, 3, 4
    )""")
    return (
        "WITH" + ",".join(ctes) + f"""
    SELECT DISTINCT id_2 AS vec_id, CAST(ccell AS INTEGER) AS coarse_cell,
           CAST(fine AS INTEGER) AS fine_id
    FROM hscored WHERE cos_sim >= {threshold}
    """
    )


@register("q117_semantic_dedup_hier", oracle=_semantic_dedup_hier_oracle_sql())
def q117_semantic_dedup_hier(spark, sf_dir):
    """SemDeDup with a HIERARCHICAL blocking key: the two-level
    k-means fit (q93's hier_kmeans_fit, 8 coarse x 4 fine = 32
    effective cells) blocks the pair sweep by (coarse_cell, fine_id),
    with the same 128-anchor cap as q88 inside each fine cell. This
    is the subdivide path for the skewed-cell problem: when a flat
    fit lands a huge fraction of the corpus in one cell, the fine
    level re-partitions exactly that cell's vectors among k_fine
    sub-centroids — cell sizes shrink multiplicatively BEFORE the cap
    has to sacrifice any pair, and per-vector assignment work stays
    O(k_coarse)+O(k_fine) instead of the O(k_coarse*k_fine) a flat
    fit of equal resolution would cost. The cap remains as the hard
    bound for cells the hierarchy cannot split (identical vectors).

    Oracle-paired end to end: DuckDB replays both fit levels (the
    q93 CTE chain) plus the capped sweep, so the hash gate covers
    training AND the dedup decision. Sweep core shared with q88 via
    ``capped_pair_sweep``; the fit keeps the vector column
    (keep_vec) so no id-keyed corpus re-join is needed."""
    from citybikedatawarehouse_spark.operators.clustering import hier_kmeans_fit

    emb_p = (
        _t(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .localCheckpoint(
            eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK
        )  # serialized O(N) arrays; Lloyd's re-scans — see semantic_dedup
    )
    assigned, _ = hier_kmeans_fit(
        emb_p, k_coarse=8, k_fine=4, n_iter=2, keep_vec=True
    )
    return capped_pair_sweep(
        assigned, ["coarse_cell", "fine_id"], threshold=0.4, anchor_cap=128
    )


def _hybrid_rrf_oracle_sql(
    rrf_k: int = 60, list_n: int = 50, topk: int = 10
) -> str:
    """q118 replay: the q111 BM25 list (via the SHARED _bm25_ctes
    fragment — one scorer definition, so q111 and q118 cannot drift)
    and a cosine list against the vec_id=0 query vector, each cut to
    list_n and ranked on rounded scores, fused with reciprocal-rank
    fusion."""
    from citybikedatawarehouse_spark.plans.text import _bm25_ctes

    return f"""
    WITH {_bm25_ctes()},
    lexr AS (
      SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
      FROM lex WHERE score > 0
      QUALIFY r <= {list_n}
    ),
    qv AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    sem AS (
      SELECT vec_id,
             round(sum(ce * qe) / (sqrt(sum(ce * ce)) * sqrt(sum(qe * qe))), 6)
               AS score
      FROM (
        SELECT c.vec_id,
               CAST(unnest(c.embedding) AS DOUBLE) AS ce,
               CAST(unnest(q.embedding) AS DOUBLE) AS qe
        FROM embeddings c CROSS JOIN qv q
      ) GROUP BY vec_id
    ),
    semr AS (
      SELECT vec_id, row_number() OVER (ORDER BY score DESC, vec_id) AS r
      FROM sem
      QUALIFY r <= {list_n}
    )
    SELECT coalesce(l.doc_id, s.vec_id) AS doc_id,
           CAST(l.r AS INTEGER) AS lex_rank,
           CAST(s.r AS INTEGER) AS sem_rank,
           round(coalesce(1.0 / ({rrf_k} + l.r), 0.0)
                 + coalesce(1.0 / ({rrf_k} + s.r), 0.0), 6) AS rrf_score
    FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.vec_id
    ORDER BY rrf_score DESC, doc_id LIMIT {topk}
    """


@register("q118_hybrid_rrf", oracle=_hybrid_rrf_oracle_sql())
def q118_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval via reciprocal-rank fusion (Cormack et al.,
    SIGIR'09): the q111 BM25 lexical list and a vector list (cosine
    against the vec_id=0 query embedding; doc_id <-> vec_id is the
    testdata's row correspondence) are each cut to their top-50,
    ranked on ROUNDED scores with id tie-breaks, and fused as
    sum(1/(60+rank)) over the lists a doc appears in. The standard
    lexical+semantic search combiner of a RAG/retrieval stack —
    robust to either list's score scale because only ranks fuse.

    Scale shape: each list is a TakeOrdered top-50 (no global sort);
    ranks are then a row_number over a CONSTANT partition of 50 rows
    (bounded post-limit input — a real partition spec, so the
    unpartitioned-window warning stays meaningful for data paths);
    the fusion join is 50x50-row, trivially broadcast. BM25 stats
    come from a one-row broadcast; the cosine list reuses the
    hoisted-norm fold."""
    from citybikedatawarehouse_spark.functions.vectors import cosine_hoisted, norm

    # the lexical list is the SAME bm25_scores core q111 ranks (one
    # scorer definition — the two can never drift), cut at list_n=50
    # here because fusion ranks on the wider list
    from citybikedatawarehouse_spark.plans.text import bm25_scores

    lex = (
        bm25_scores(_t(spark, sf_dir, "documents").select("doc_id", "text"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(50)
    )
    w_lex = Window.partitionBy(F.lit(0)).orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    lexr = lex.select(
        "doc_id", F.row_number().over(w_lex).alias("lex_rank")
    )

    emb = _t(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("__qv"), norm("embedding").alias("__qn")
    )
    sem = (
        emb.select(
            "vec_id",
            F.col("embedding").alias("__cv"),
            norm("embedding").alias("__cn"),
        )
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(
                cosine_hoisted("__qv", "__cv", "__qn", "__cn"), 6
            ).alias("score"),
        )
        .orderBy(F.col("score").desc(), "vec_id")
        .limit(50)
    )
    w_sem = Window.partitionBy(F.lit(0)).orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    semr = sem.select(
        "vec_id", F.row_number().over(w_sem).alias("sem_rank")
    )

    fused = (
        lexr.join(semr, lexr["doc_id"] == semr["vec_id"], "full_outer")
        .select(
            F.coalesce(lexr["doc_id"], semr["vec_id"]).alias("doc_id"),
            "lex_rank",
            "sem_rank",
            F.round(
                F.coalesce(1.0 / (60 + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (60 + F.col("sem_rank")), F.lit(0.0)),
                6,
            ).alias("rrf_score"),
        )
        .orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(10)
    )
    return fused


@register(
    "q123_embedding_dim_stats",
    oracle="""
    WITH e AS (
      SELECT t.i - 1 AS dim, CAST(emb.embedding[t.i] AS DOUBLE) AS v
      FROM embeddings emb, UNNEST(range(1, len(emb.embedding) + 1)) t(i)
    )
    SELECT CAST(dim AS INTEGER) AS dim,
           count(*) AS n,
           round(sum(v) / count(*), 6) AS mean,
           round(sqrt(greatest(sum(v * v) - sum(v) * sum(v) / count(*), 0.0)
                      / (count(*) - 1)), 6) AS std,
           round(min(v), 6) AS mn,
           round(max(v), 6) AS mx
    FROM e GROUP BY dim
    """,
)
def q123_embedding_dim_stats(spark, sf_dir):
    """Per-dimension corpus statistics of the embedding column
    (mean/std/min/max) — the FIT half of feature standardization: a
    normalizer (or whitening/PCA preprocessing step) broadcasts this
    64-row relation and applies (v - mean)/std per dimension. Also
    the drift monitor for an embedding store: a dimension whose
    std collapses or mean wanders signals a model/version skew in
    the ingest path.

    Scale shape: one posexplode keyed (dim) — the shuffle carries
    per-partition partial sums (map-side combine), so wire volume is
    64 rows per partition regardless of corpus size; the output is
    always exactly dim rows. std is computed from raw sums with the
    same explicit formula on both engines (engine-native stddev_samp
    implementations disagree on the compensation algorithm), with
    the sum-of-squares residue CLAMPED at zero — a constant
    dimension makes sum(v^2) - sum(v)^2/n a tiny NEGATIVE float by
    catastrophic cancellation, which is sqrt-domain-error on DuckDB
    and NaN on Spark (tests/test_skew_properties.py pins the
    constant-dimension case)."""
    emb = _t(spark, sf_dir, "embeddings")
    e = emb.select(
        F.posexplode(
            F.transform(F.col("embedding"), lambda x: x.cast("double"))
        ).alias("dim", "v")
    )
    cnt = F.count(F.lit(1))
    sv, svv = F.sum("v"), F.sum(F.col("v") * F.col("v"))
    resid = F.greatest(svv - sv * sv / cnt, F.lit(0.0))
    return e.groupBy("dim").agg(
        cnt.alias("n"),
        F.round(sv / cnt, 6).alias("mean"),
        F.round(F.sqrt(resid / (cnt - 1)), 6).alias("std"),
        F.round(F.min("v"), 6).alias("mn"),
        F.round(F.max("v"), 6).alias("mx"),
    )


@register(
    "q126_positive_pairs",
    oracle="""
    WITH ranked AS (
      SELECT vec_id, label,
             row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
      FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS anchor_id, b.vec_id AS positive_id, a.label
      FROM ranked a JOIN embeddings b ON a.label = b.label
                                     AND a.vec_id < b.vec_id
      WHERE a.rn <= 32
    ),
    scored AS (
      SELECT anchor_id, positive_id, label,
             round(sum(ae * be) / (sqrt(sum(ae * ae)) * sqrt(sum(be * be))), 6)
               AS cos_sim
      FROM (
        SELECT p.anchor_id, p.positive_id, p.label,
               CAST(unnest(a.embedding) AS DOUBLE) AS ae,
               CAST(unnest(b.embedding) AS DOUBLE) AS be
        FROM pairs p
        JOIN embeddings a ON a.vec_id = p.anchor_id
        JOIN embeddings b ON b.vec_id = p.positive_id
      ) GROUP BY 1, 2, 3
    )
    SELECT anchor_id, positive_id, CAST(label AS INTEGER) AS label, cos_sim,
           CAST(rank AS INTEGER) AS rank FROM (
      SELECT anchor_id, positive_id, label, cos_sim,
             row_number() OVER (PARTITION BY anchor_id
                                ORDER BY cos_sim DESC, positive_id) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
)
def q126_positive_pairs(spark, sf_dir):
    """Contrastive POSITIVE mining — the counterpart of q115's hard
    negatives: for each anchor, the top-3 highest-cosine SAME-label
    vectors. Together the two queries emit training triplets
    (anchor, positive, hard-negative) for embedding-model training.
    Anchors are capped at the 32 lowest ids per label (the q88
    anchor-cap pattern: the rank window rides the label-keyed
    exchange the pair join needs), so a giant label class can never
    go quadratic — pair volume per label is O(|class| * 32).

    Scale shape: one label-keyed exchange shared by the rank window
    and the join; hoisted-norm cosine per pair; anchor-partitioned
    top-k window. At corpus scale the exact within-label scan swaps
    for the ANN candidate paths with the label filter on candidates."""
    from citybikedatawarehouse_spark.functions.vectors import cosine_hoisted, norm

    emb = _t(spark, sf_dir, "embeddings")
    w_anchor = Window.partitionBy("label").orderBy("vec_id")
    a = (
        emb.select("vec_id", "label", "embedding")
        .withColumn("__rn", F.row_number().over(w_anchor))
        .filter(F.col("__rn") <= 32)
        .select(
            F.col("vec_id").alias("anchor_id"),
            "label",
            F.col("embedding").alias("__av"),
            norm("embedding").alias("__an"),
        )
    )
    b = emb.select(
        F.col("vec_id").alias("positive_id"),
        "label",
        F.col("embedding").alias("__bv"),
        norm("embedding").alias("__bn"),
    )
    scored = (
        a.join(b, "label")
        .filter(F.col("anchor_id") < F.col("positive_id"))
        .select(
            "anchor_id",
            "positive_id",
            "label",
            F.round(
                cosine_hoisted("__av", "__bv", "__an", "__bn"), 6
            ).alias("cos_sim"),
        )
    )
    w_rank = Window.partitionBy("anchor_id").orderBy(
        F.col("cos_sim").desc(), F.col("positive_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w_rank)).filter(
        F.col("rank") <= 3
    )


@register(
    "q160_semantic_decontaminate",
    oracle="""
    WITH expl AS (
      SELECT t.vec_id, e.vec_id AS eval_id,
             CAST(unnest(t.embedding) AS DOUBLE) AS te,
             CAST(unnest(e.embedding) AS DOUBLE) AS ee
      FROM embeddings t JOIN embeddings e
        ON t.vec_id >= 50 AND e.vec_id < 50
    ),
    scored AS (
      SELECT vec_id, eval_id,
             round(sum(te * ee)
                   / (sqrt(sum(te * te)) * sqrt(sum(ee * ee))), 6) AS cs
      FROM expl GROUP BY 1, 2
    )
    SELECT vec_id, eval_id AS best_eval_id, cs AS max_cos FROM (
      SELECT vec_id, eval_id, cs,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cs DESC, eval_id) AS rn
      FROM scored
    ) WHERE rn = 1 AND cs >= 0.35
    """,
)
def q160_semantic_decontaminate(spark, sf_dir):
    """SEMANTIC decontamination: flag every training vector whose
    embedding cosine against ANY held-out eval vector (vec_id < 50
    stands in for the benchmark suite, the q69 convention) reaches
    0.35 — the paraphrase-level leak that q69's lexical 5-gram
    filter cannot see (a reworded eval question shares no shingles
    but sits next to its source in embedding space; 0.35 is ~p99.9
    of the cross-pair cosine distribution on the synthetic corpus,
    so the gate exercises real rows at every shipped scale).
    Returns (vec_id, best_eval_id, max_cos) for flagged vectors —
    the anti-join list a pipeline removes before training.

    Scale shape: the eval side is BROADCAST (eval suites are
    thousands of rows; the corpus is the big side and is scanned
    ONCE, never shuffled on embeddings); per-row scoring is a
    JVM-side fold over the zipped arrays. The only exchange is the
    per-train-vector argmax window — corpus-keyed, map-side bounded
    by |eval| rows per key. At 100 TB the same plan holds; if the
    eval suite outgrows broadcast, the LSH/IVF bucketed path (q72/
    q94) replaces the exact crossJoin, same report shape."""
    emb = _t(spark, sf_dir, "embeddings")
    train = emb.filter(F.col("vec_id") >= 50).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("__t"),
    )
    ev = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("eval_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("__e"),
    )
    dot = F.aggregate(
        F.zip_with("__t", "__e", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    sq = lambda c: F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
    )
    scored = (
        train.crossJoin(F.broadcast(ev))
        .select(
            "vec_id",
            "eval_id",
            F.round(dot / (F.sqrt(sq("__t")) * F.sqrt(sq("__e"))), 6).alias(
                "cs"
            ),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cs").desc(), "eval_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("cs") >= 0.35))
        .select(
            "vec_id",
            F.col("eval_id").alias("best_eval_id"),
            F.col("cs").alias("max_cos"),
        )
    )


def _ivfpq_oracle_sql(
    n_cells: int = 8,
    n_iter_ivf: int = 2,
    m: int = 4,
    k_codes: int = 8,
    n_iter_pq: int = 1,
    dim: int = 64,
    n_probe: int = 2,
    topk: int = 5,
) -> str:
    """q165 replay: the shared Lloyd chain trains the coarse
    quantizer (c0..afinal), the probe CTE picks each query's cells,
    the per-subspace PQ chains train the codebooks, and ADC distance
    is summed ONLY for candidates in probed cells."""
    sub = dim // m
    ctes = _kmeans_ctes(n_cells, n_iter_ivf, dim)
    ctes.append(f"""
    probes AS (
      SELECT query_id, cell FROM (
        SELECT query_id, cell,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sq, cell) AS rn
        FROM (
          SELECT e.vec_id AS query_id, c.cell, {_KM_SQ} AS sq
          FROM embeddings e CROSS JOIN c{n_iter_ivf} c,
               range(1, {dim} + 1) t(i)
          WHERE e.vec_id < 10
          GROUP BY e.vec_id, c.cell
        )
      ) WHERE rn <= {n_probe}
    )""")
    for s in range(m):
        ctes.extend(_pq_ctes(s, s * sub, sub, k_codes, n_iter_pq))
    books = " UNION ALL ".join(
        f"SELECT {s} AS subspace, cell, cvec FROM s{s}c{n_iter_pq}"
        for s in range(m)
    )
    qcodes = " UNION ALL ".join(
        f"SELECT vec_id, {s} AS subspace, cell FROM s{s}afinal"
        for s in range(m)
    )
    ctes.append(f"""
    books AS ({books})""")
    ctes.append(f"""
    qcodes AS ({qcodes})""")
    ctes.append(f"""
    qd AS (
      SELECT q.vec_id AS query_id, b.subspace, b.cell,
             round(sum((CAST(q.embedding[t.i + b.subspace * {sub}] AS DOUBLE) - b.cvec[t.i])
                       * (CAST(q.embedding[t.i + b.subspace * {sub}] AS DOUBLE) - b.cvec[t.i])), 6) AS d
      FROM embeddings q CROSS JOIN books b,
           range(1, {sub} + 1) t(i)
      WHERE q.vec_id < 10
      GROUP BY 1, 2, 3
    )""")
    ctes.append("""
    approx AS (
      SELECT p.query_id, c.vec_id AS neighbor_id,
             round(sum(qd.d), 6) AS approx_dist
      FROM qcodes c
      JOIN afinal a ON a.vec_id = c.vec_id
      JOIN probes p ON p.cell = a.cell
      JOIN qd ON qd.query_id = p.query_id
             AND qd.subspace = c.subspace AND qd.cell = c.cell
      WHERE c.vec_id <> p.query_id
      GROUP BY 1, 2
    )""")
    return (
        "WITH" + ",".join(ctes) + f"""
    SELECT query_id, neighbor_id, approx_dist, CAST(rank AS INTEGER) AS rank FROM (
      SELECT query_id, neighbor_id, approx_dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY approx_dist, neighbor_id) AS rank
      FROM approx
    ) WHERE rank <= {topk}
    """
    )


@register("q165_ivfpq_topk", oracle=_ivfpq_oracle_sql())
def q165_ivfpq_topk(spark, sf_dir):
    """IVF-PQ ANN top-5 — the COMPOSED index (q76's trained coarse
    probe × q96's ADC code scoring), i.e. the standard FAISS IVFPQ
    layout: probe 2 of 8 Lloyd cells, score only those cells'
    vectors by summed code-table lookups. Query-time work is
    O(n_probe/n_cells) of the corpus in table lookups with no raw
    vector access; at rest the cell is the partition key (probe =
    partition pruning) and the code table is the hot set. The oracle
    replays coarse training, probing, all four subspace codebook
    trainings, encoding, and the restricted ADC sum end-to-end."""
    from citybikedatawarehouse_spark.operators.clustering import ivf_pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_pq_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


def _index_drift_oracle_sql(
    k: int = 8, n_iter: int = 2, dim: int = 64
) -> str:
    """q167 replay: the shared Lloyd chain trains on the CTE-shadowed
    historical slice (even vec_ids), then the FULL corpus assigns
    against the frozen c{n_iter} centroids and per-cell occupancy /
    quantization-error stats split by slice."""
    ctes = ['''
    hist AS (SELECT * FROM embeddings WHERE vec_id % 2 = 0)''']
    ctes.extend(_kmeans_ctes(k, n_iter, dim, table="hist"))
    ctes.append(f"""
    allassign AS (
      SELECT vec_id, cell, sq FROM (
        SELECT vec_id, cell, sq,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sq, cell) AS rn
        FROM (
          SELECT e.vec_id, c.cell, {_KM_SQ} AS sq
          FROM embeddings e CROSS JOIN c{n_iter} c,
               range(1, {dim} + 1) t(i)
          GROUP BY e.vec_id, c.cell
        )
      ) WHERE rn = 1
    )""")
    return (
        "WITH" + ",".join(ctes) + """
    SELECT CAST(cell AS INTEGER) AS cell,
           CAST(count(*) FILTER (WHERE vec_id % 2 = 0) AS BIGINT) AS n_hist,
           CAST(count(*) FILTER (WHERE vec_id % 2 = 1) AS BIGINT) AS n_new,
           round(avg(sq) FILTER (WHERE vec_id % 2 = 0), 6) AS mean_sq_hist,
           round(avg(sq) FILTER (WHERE vec_id % 2 = 1), 6) AS mean_sq_new,
           round(avg(sq) FILTER (WHERE vec_id % 2 = 1)
                 / avg(sq) FILTER (WHERE vec_id % 2 = 0), 6) AS drift_ratio
    FROM allassign GROUP BY cell
    """
    )


@register("q167_index_drift", oracle=_index_drift_oracle_sql())
def q167_index_drift(spark, sf_dir):
    """ANN index-staleness audit: train the coarse quantizer on a
    FROZEN historical slice (even vec_ids stand in for "the corpus
    at index-build time"), assign everything — old and new — against
    those frozen centroids, and report per-cell occupancy and mean
    quantization error split by slice, plus the drift ratio
    (new/hist mean sq). This is the refit trigger every production
    ANN index needs: drift_ratio creeping above ~1 and occupancy
    skewing toward a few cells mean the quantizer no longer matches
    the distribution and recall is silently decaying (IVF probes
    miss shifted mass). Complements q76/q94/q165 (the indices) the
    way q151's PSI complements the text pipeline.

    Scale shape: the fit is the shuffle-free Lloyd on half the
    corpus; the audit pass is ONE broadcast-array argmin scan of the
    full corpus (zero corpus shuffle) and a k-row aggregate. The
    oracle replays fit, frozen assignment, and both stat columns."""
    from citybikedatawarehouse_spark.operators.clustering import (
        kmeans_assign,
        kmeans_fit,
    )

    emb = _t(spark, sf_dir, "embeddings")
    hist = emb.filter(F.col("vec_id") % 2 == 0)
    _, cents = kmeans_fit(hist, k=8, n_iter=2)
    allassign = kmeans_assign(emb, cents, "vec_id", "embedding")
    is_hist = F.col("vec_id") % 2 == 0
    mean_h = F.avg(F.when(is_hist, F.col("sq_dist")))
    mean_n = F.avg(F.when(~is_hist, F.col("sq_dist")))
    return allassign.groupBy(
        F.col("cluster_id").cast("int").alias("cell")
    ).agg(
        F.count(F.when(is_hist, 1)).cast("bigint").alias("n_hist"),
        F.count(F.when(~is_hist, 1)).cast("bigint").alias("n_new"),
        F.round(mean_h, 6).alias("mean_sq_hist"),
        F.round(mean_n, 6).alias("mean_sq_new"),
        F.round(mean_n / mean_h, 6).alias("drift_ratio"),
    )


def _cluster_purity_oracle(k: int = 4, n_iter: int = 2, dim: int = 64) -> str:
    """q178 replay: the shared k-means CTE chain (q75's exact fit),
    then per-cluster label histogram → majority label, purity and
    label entropy."""
    return (
        "WITH" + ",".join(_kmeans_ctes(k, n_iter, dim)) + """,
    lc AS (
      SELECT a.cell, e.label, count(*) AS c
      FROM afinal a JOIN embeddings e USING (vec_id)
      GROUP BY a.cell, e.label
    ),
    tot AS (SELECT cell, sum(c) AS n FROM lc GROUP BY cell),
    top AS (
      SELECT cell, label, c FROM (
        SELECT cell, label, c,
               row_number() OVER (PARTITION BY cell
                                  ORDER BY c DESC, label) AS rn
        FROM lc
      ) WHERE rn = 1
    ),
    ent AS (
      SELECT lc.cell,
             round(-sum((lc.c * 1.0 / t.n) * ln(lc.c * 1.0 / t.n)), 6)
               AS label_entropy
      FROM lc JOIN tot t USING (cell) GROUP BY lc.cell
    )
    SELECT CAST(t.cell AS INTEGER) AS cluster_id,
           CAST(t.n AS BIGINT) AS n_vecs,
           CAST(p.label AS INTEGER) AS top_label,
           CAST(p.c AS BIGINT) AS n_top,
           round(p.c * 1.0 / t.n, 6) AS purity,
           e.label_entropy
    FROM tot t JOIN top p USING (cell) JOIN ent e ON e.cell = t.cell
    """
    )


@register("q178_cluster_purity", oracle=_cluster_purity_oracle())
def q178_cluster_purity(spark, sf_dir):
    """Cluster-quality audit: per k-means cluster (q75's exact fit —
    same init, iterations and tie-breaks), the label histogram
    summarized as majority label, purity (majority share) and label
    entropy. The audit a curation pipeline runs before trusting
    cluster ids for stratified splits (q161) or cluster-balanced
    sampling — low purity/high entropy flags clusters whose members
    disagree with their would-be stratum.

    Oracle-paired end-to-end: the DuckDB chain replays the FULL
    Lloyd's fit, then the histogram/majority/entropy stages, so the
    hash gate covers the training loop and the audit, not just the
    audit. Majority ties break to the low label in both engines;
    entropy terms are summed unrounded and rounded once at 1e-6.

    Scale shape: the fit is q75's (broadcast centroids, corpus never
    shuffles); the audit adds ONE (cell, label) aggregate — k·|labels|
    rows — and windows/joins over that tiny relation. One corpus-scale
    shuffle total for the audit stage at any size."""
    from citybikedatawarehouse_spark.operators.clustering import kmeans_fit
    from pyspark.sql import Window as W

    emb = _t(spark, sf_dir, "embeddings")
    assigned, _ = kmeans_fit(emb, k=4, n_iter=2)
    lc = (
        assigned.join(emb.select("vec_id", "label"), "vec_id")
        .groupBy(F.col("cluster_id").alias("cell"), "label")
        .agg(F.count(F.lit(1)).alias("c"))
        # k·|labels| rows feeding THREE consumers (totals, majority
        # window, entropy) — materialize once or the corpus-scale
        # assignment pipeline replicates into every branch (measured:
        # 20 parquet scans without this)
        .localCheckpoint(eager=True)
    )
    tot = lc.groupBy("cell").agg(F.sum("c").alias("n"))
    top = (
        lc.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("cell").orderBy(F.desc("c"), "label")
            ),
        )
        .where(F.col("rn") == 1)
        .select("cell", F.col("label").alias("top_label"), F.col("c").alias("n_top"))
    )
    ent = (
        lc.join(tot, "cell")
        .groupBy("cell")
        .agg(
            F.round(
                -F.sum(
                    (F.col("c") * F.lit(1.0) / F.col("n"))
                    * F.log(F.col("c") * F.lit(1.0) / F.col("n"))
                ),
                6,
            ).alias("label_entropy")
        )
    )
    return (
        tot.join(top, "cell")
        .join(ent, "cell")
        .select(
            F.col("cell").cast("int").alias("cluster_id"),
            F.col("n").cast("bigint").alias("n_vecs"),
            F.col("top_label").cast("int").alias("top_label"),
            F.col("n_top").cast("bigint").alias("n_top"),
            F.round(F.col("n_top") * F.lit(1.0) / F.col("n"), 6).alias("purity"),
            "label_entropy",
        )
    )


@register(
    "q191_ann_recall",
    oracle="""
    WITH cents AS (
      SELECT cell, cvec FROM (
        SELECT embedding AS cvec,
               row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
                 - 1 AS cell
        FROM embeddings
      ) WHERE cell < 40
    ),
    asims AS (
      SELECT vec_id, cell,
             round(sum(ee * ce) / (sqrt(sum(ee * ee)) * sqrt(sum(ce * ce))), 6) AS sim
      FROM (
        SELECT e.vec_id, c.cell,
               CAST(unnest(e.embedding) AS DOUBLE) AS ee,
               CAST(unnest(c.cvec) AS DOUBLE) AS ce
        FROM embeddings e CROSS JOIN cents c
      ) GROUP BY 1, 2
    ),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, cell) AS rn
        FROM asims
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, cell) AS rn
        FROM asims WHERE vec_id < 10
      ) WHERE rn <= 4
    ),
    cands AS (
      SELECT DISTINCT p.vec_id AS query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.vec_id
    ),
    ann_scored AS (
      SELECT query_id, neighbor_id,
             round(sum(qe * ce) / (sqrt(sum(qe * qe)) * sqrt(sum(ce * ce))), 6) AS cos_sim
      FROM (
        SELECT cd.query_id, cd.neighbor_id,
               CAST(unnest(q.embedding) AS DOUBLE) AS qe,
               CAST(unnest(c.embedding) AS DOUBLE) AS ce
        FROM cands cd
        JOIN embeddings q ON q.vec_id = cd.query_id
        JOIN embeddings c ON c.vec_id = cd.neighbor_id
      ) GROUP BY 1, 2
    ),
    ann AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM ann_scored
      ) WHERE rank <= 5
    ),
    ex_scored AS (
      SELECT query_id, neighbor_id,
             round(sum(qe * ce) / (sqrt(sum(qe * qe)) * sqrt(sum(ce * ce))), 6) AS cos_sim
      FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST(unnest(q.embedding) AS DOUBLE) AS qe,
               CAST(unnest(c.embedding) AS DOUBLE) AS ce
        FROM embeddings q JOIN embeddings c
          ON q.vec_id < 10 AND q.vec_id <> c.vec_id
      ) GROUP BY 1, 2
    ),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM ex_scored
      ) WHERE rank <= 5
    )
    SELECT e.query_id,
           CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
           round(count(a.neighbor_id) / 5.0, 6) AS recall_at_5
    FROM exact e LEFT JOIN ann a USING (query_id, neighbor_id)
    GROUP BY e.query_id
    """,
)
def q191_ann_recall(spark, sf_dir):
    """Recall@5 of the IVF ANN index (q74's exact configuration)
    against brute-force ground truth (q70), per query — THE quality
    number a vector-search deployment reports before trusting an
    index, closing the loop the ANN suite (q72/q74/q76/q93–q96/q165)
    builds indexes for. Both pipelines are deterministic, so the
    audit itself is oracle-replayable end-to-end: the DuckDB chain
    re-runs the coarse quantizer, probes, re-rank AND the exact
    top-k, then intersects.

    Scale shape: the two top-k's are the existing operators (probe-
    pruned vs broadcast-query scan over a bounded query set); the
    intersection is a left join on (query, neighbor) over 5·|queries|
    rows — negligible beside either index path. Recall audits at
    corpus scale run exactly this plan over a SAMPLED query set
    (here vec_id < 10), never all queries."""
    from citybikedatawarehouse_spark.operators.similarity_ops import (
        brute_force_topk,
        ivf_ann_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    ann = ivf_ann_topk(emb, qs, k=5).select("query_id", "neighbor_id")
    exact = brute_force_topk(emb, qs, k=5).select(
        "query_id", F.col("neighbor_id").alias("e_n")
    )
    hit = exact.join(
        ann,
        (exact.query_id == ann.query_id) & (exact.e_n == ann.neighbor_id),
        "left",
    ).select(exact.query_id, ann.neighbor_id.alias("hit"))
    return hit.groupBy("query_id").agg(
        F.count("hit").cast("bigint").alias("n_hits"),
        F.round(F.count("hit") / F.lit(5.0), 6).alias("recall_at_5"),
    )


def _silhouette_oracle(k: int = 4, n_iter: int = 2, dim: int = 64) -> str:
    """q211 replay: the shared k-means CTE chain (q75's exact fit),
    then all-centroid distances per vector and the per-cluster
    simplified-silhouette summary."""
    return (
        "WITH" + ",".join(_kmeans_ctes(k, n_iter, dim)) + f""",
    alldist AS (
      SELECT e.vec_id, c.cell, {_KM_SQ} AS sq
      FROM embeddings e CROSS JOIN c{n_iter} c,
           range(1, {dim} + 1) t(i)
      GROUP BY e.vec_id, c.cell
    ),
    sil AS (
      SELECT a.vec_id, a.cell,
             round(CASE WHEN greatest(sqrt(a.sq), sqrt(min(d.sq))) = 0
                        THEN 0.0
                        ELSE (sqrt(min(d.sq)) - sqrt(a.sq))
                             / greatest(sqrt(a.sq), sqrt(min(d.sq)))
                   END, 6) AS s
      FROM afinal a JOIN alldist d
        ON d.vec_id = a.vec_id AND d.cell <> a.cell
      GROUP BY a.vec_id, a.cell, a.sq
    )
    SELECT CAST(cell AS INTEGER) AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(avg(s), 6) AS mean_silhouette,
           round(min(s), 6) AS min_silhouette
    FROM sil GROUP BY cell
    """
    )


@register("q211_silhouette", oracle=_silhouette_oracle())
def q211_silhouette(spark, sf_dir):
    """Simplified-silhouette audit of q75's k-means fit: per vector,
    a = distance to its own (nearest) centroid and b = distance to
    the closest OTHER centroid; s = (b - a) / max(a, b), summarized
    per cluster as mean and min. The label-free companion to q178's
    label purity — mean s near 0 says the clusters barely separate
    (don't trust them for stratified splits or SemDeDup cells), s
    near 1 says tight, well-separated cells. Because the final
    Lloyd's step assigns every point to its NEAREST centroid, a <= b
    and s >= 0 by construction here: the metric reads as a margin
    ("how much closer is my centroid than the runner-up"), which is
    exactly the simplified (centroid-based) silhouette of Hruschka et
    al. — the O(N*k) scale substitute for the O(N^2) classic
    silhouette's mean pairwise distances.

    Oracle-paired end-to-end: the DuckDB chain replays the FULL fit
    (q75's CTE chain), the all-centroid distance pass, and the
    summary, so the hash gate covers training + audit. Distances are
    rounded at 1e-6 before sqrt on both engines (the kmeans_assign
    convention); per-point s is rounded before the avg.

    Scale shape: the fit is q75's (broadcast k-row centroid array,
    corpus never shuffles); the audit is ONE more broadcast-array
    HOF scan computing all k distances per vector — zero corpus
    shuffle — then a k-row aggregate. O(N*k*dim) work, O(k) output
    at any corpus size."""
    from citybikedatawarehouse_spark.operators.clustering import kmeans_fit
    from citybikedatawarehouse_spark.functions.vectors import _as_double

    emb = _t(spark, sf_dir, "embeddings")
    _, cents = kmeans_fit(emb, k=4, n_iter=2)
    cents_row = cents.agg(
        F.array_sort(
            F.collect_list(F.struct("cluster_id", "centroid"))
        ).alias("__cents")
    )

    def sq_to(c):
        return F.aggregate(
            F.zip_with(
                _as_double("embedding"),
                c["centroid"],
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    dists = F.transform(
        F.col("__cents"),
        lambda c: F.struct(
            F.round(sq_to(c), 6).alias("sq"),
            c["cluster_id"].alias("cell"),
        ),
    )
    with_d = (
        emb.crossJoin(F.broadcast(cents_row))
        .select("vec_id", dists.alias("__d"))
        .select(
            "vec_id",
            F.array_min("__d").alias("__best"),
            F.col("__d").alias("__d"),
        )
        .select(
            "vec_id",
            F.col("__best.cell").alias("cell"),
            F.sqrt("__best.sq").alias("a_dist"),
            F.sqrt(
                F.array_min(
                    F.filter(
                        "__d",
                        lambda d: d["cell"] != F.col("__best.cell"),
                    )
                )["sq"]
            ).alias("b_dist"),
        )
    )
    s = F.round(
        F.when(F.greatest("a_dist", "b_dist") == 0, F.lit(0.0)).otherwise(
            (F.col("b_dist") - F.col("a_dist"))
            / F.greatest("a_dist", "b_dist")
        ),
        6,
    )
    return (
        with_d.select("cell", s.alias("s"))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.round(F.avg("s"), 6).alias("mean_silhouette"),
            F.round(F.min("s"), 6).alias("min_silhouette"),
        )
        .select(
            F.col("cell").cast("int").alias("cluster_id"),
            "n_vecs",
            "mean_silhouette",
            "min_silhouette",
        )
    )
