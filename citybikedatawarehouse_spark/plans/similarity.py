"""Similarity search over the embeddings table (north-star
extension): brute-force cosine top-k baseline + LSH-bucketed ANN +
cosine near-dup pairs. Heavy lifting in operators/similarity_ops.py.

Oracle note: DuckDB's list_cosine_similarity computes in float32 and
drifts ~1e-6 from double math, so oracles unnest to doubles
explicitly (parallel unnest zips element-wise in DuckDB).
"""

from __future__ import annotations

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
    ) WHERE cos_sim >= 0.95
    """,
)
def q71_cosine_neardup(spark, sf_dir):
    """Embedding near-dup pairs (cosine >= 0.95), label-blocked to
    avoid N^2 — the embedding leg of the dedup suite."""
    from citybikedatawarehouse_spark.operators.similarity_ops import (
        cosine_neardup_pairs,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return cosine_neardup_pairs(emb, threshold=0.95, block_col="label")


@register("q72_lsh_ann_topk")
def q72_lsh_ann_topk(spark, sf_dir):
    """Random-hyperplane LSH ANN top-5: 4 tables x 8-bit signatures,
    candidates = union of bucket hits, exact cosine re-rank.
    Deterministic (sha256-derived planes) but approximate and
    pandas-UDF-backed — rows-only check; recall vs brute force is
    asserted in tests/test_similarity.py."""
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


@register("q74_ivf_ann_topk")
def q74_ivf_ann_topk(spark, sf_dir):
    """IVF ANN top-5 (deterministic coarse quantizer, 4-cell probe,
    exact re-rank) — the partition-pruned alternative scale path to
    q72's hyperplane LSH. Rows-only check; recall vs brute force
    asserted in tests/test_similarity.py."""
    from citybikedatawarehouse_spark.operators.similarity_ops import ivf_ann_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_ann_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
