"""Embedding transforms (SURVEY.md §2.4 north-star extensions):
deterministic sign random projection (JL) and top-principal-
component extraction by power iteration. Cores in
operators/projection.py; this module registers the oracle-paired
catalog entries.

The oracle contract for q135 is the RECURRENCE, not the limit: the
DuckDB SQL replays the identical fixed-iteration power method
(start v0 = 1/8 exactly representable, 4 iterations), the same way
the k-means oracles replay Lloyd's (q75) — so the hash gate covers
the fit arithmetic end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.operators.projection import (
    RP_MATRIX,
    power_iteration_top_pc,
    random_projection,
)
from citybikedatawarehouse_spark.plans.catalog import register
from citybikedatawarehouse_spark.sources.readers import load_table as _t


def _rp_matrix_sql() -> str:
    """Render RP_MATRIX as DuckDB VALUES rows — the same Python
    constant renders the Spark literal, so the sides cannot drift."""
    rows = ",\n        ".join(
        "({}, [{}]::DOUBLE[])".format(
            j, ", ".join(str(s) for s in row)
        )
        for j, row in enumerate(RP_MATRIX)
    )
    return rows


@register(
    "q134_random_projection",
    oracle=f"""
    WITH r AS (
      SELECT * FROM (VALUES
        {_rp_matrix_sql()}
      ) t(j, rv)
    ),
    p AS (
      SELECT e.vec_id, r.j,
             CAST(unnest(e.embedding) AS DOUBLE) AS x,
             unnest(r.rv) AS s
      FROM embeddings e CROSS JOIN r
    )
    SELECT vec_id, CAST(j AS INTEGER) AS j,
           round(sum(x * s) / 4.0, 6) AS y
    FROM p GROUP BY 1, 2
    """,
)
def q134_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign random projection 64 → 16 dims (Achlioptas-style ±1 JL
    matrix, deterministic from md5 so it is reproducible across jobs
    without shipping a matrix artifact): the pre-reduction step
    before ANN indexing / dedup blocking when the raw dimension is
    what makes candidates expensive. y = Rx/√16.

    Scale shape: a pure per-row HOF map — ZERO shuffles; the matrix
    is a query literal (16×64 doubles), never a join, and the
    double-cast input array is staged once per row (HOF lambdas
    don't subexpression-eliminate). The oracle renders the identical
    matrix constant into VALUES rows and zips it with a parallel
    unnest."""
    emb = _t(spark, sf_dir, "embeddings")
    return random_projection(emb)


_PCA_ITER = 4


def _pca_oracle(n_iter: int = _PCA_ITER) -> str:
    head = """
    WITH e AS (
      SELECT emb.vec_id, t.i - 1 AS pos,
             CAST(emb.embedding[t.i] AS DOUBLE) AS x
      FROM embeddings emb, UNNEST(range(1, len(emb.embedding) + 1)) t(i)
    ),
    st AS (
      SELECT pos, sum(x) AS sx, sum(x * x) AS sxx, count(*) AS n
      FROM e GROUP BY pos
    ),
    tv AS (
      SELECT sum(sxx - sx * sx / n) / (min(n) - 1) AS total_var,
             min(n) AS n
      FROM st
    ),
    c AS (
      SELECT e.vec_id, e.pos, e.x - st.sx / st.n AS xc
      FROM e JOIN st USING (pos)
    ),
    v0 AS (SELECT pos, 0.125 AS v FROM st)"""
    steps = []
    for k in range(1, n_iter + 1):
        steps.append(f""",
    d{k} AS (
      SELECT c.vec_id, sum(c.xc * v.v) AS dot
      FROM c JOIN v{k - 1} v USING (pos) GROUP BY c.vec_id
    ),
    w{k} AS (
      SELECT c.pos, sum(c.xc * d.dot) AS w
      FROM c JOIN d{k} d USING (vec_id) GROUP BY c.pos
    ),
    n{k} AS (SELECT sqrt(sum(w * w)) AS nrm FROM w{k}),
    v{k} AS (SELECT pos, w / (SELECT nrm FROM n{k}) AS v FROM w{k})""")
    return (
        head
        + "".join(steps)
        + f"""
    SELECT CAST(pos AS INTEGER) AS dim,
           round(v, 6) AS loading,
           round((SELECT nrm FROM n{n_iter}) / ((SELECT n FROM tv) - 1), 6)
             AS eigval,
           round((SELECT nrm FROM n{n_iter}) / ((SELECT n FROM tv) - 1)
                 / (SELECT total_var FROM tv), 6) AS explained_ratio
    FROM v{n_iter}
    """
    )


@register("q135_pca_power_iteration", oracle=_pca_oracle())
def q135_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the centered embedding corpus by
    distributed power iteration (4 fixed iterations from v0 = 1/8):
    loadings + Rayleigh eigenvalue + explained-variance ratio — the
    fit half of whitening / ABTT common-component removal, and the
    one-number drift monitor ("how much variance does one direction
    eat") for an embedding store.

    Scale shape (operators/projection.py): the covariance matrix is
    NEVER materialized — each iteration folds xc·v per row JVM-side
    and map-side-combines Σ xc·(xc·v) into d rows; only O(d) floats
    reach the driver per iteration. The centered corpus is
    checkpointed once (Lloyd's-style re-scan economy). The oracle
    replays the identical recurrence as a CTE chain."""
    emb = _t(spark, sf_dir, "embeddings")
    v, eigval, total_var, _n = power_iteration_top_pc(
        emb, n_iter=_PCA_ITER
    )
    out = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(v)], "dim int, loading double"
    )
    return out.select(
        "dim",
        F.round("loading", 6).alias("loading"),
        F.round(F.lit(eigval), 6).alias("eigval"),
        F.round(F.lit(eigval / total_var), 6).alias("explained_ratio"),
    )
