"""Dimensionality reduction over embedding columns: deterministic
sign random projection (Johnson–Lindenstrauss) and top-principal-
component extraction via distributed power iteration.

Both are preprocessing steps of a 100 TB embedding pipeline: random
projection shrinks vectors before ANN indexing / near-dup blocking
(Achlioptas 2003 shows ±1 entries preserve pairwise distances with
the same guarantee as Gaussian matrices), and the top PC drives
whitening, ABTT-style common-component removal, and drift
monitoring.

Scale shape:
  * random projection is a pure per-row HOF map — no shuffle at all;
    the projection matrix is a query-literal (16×64 doubles), never
    a join.
  * power iteration never materializes the d×d covariance: each
    iteration computes per-row scalars xc·v (HOF fold, JVM-side)
    and aggregates Σ xc·(xc·v) by DIMENSION — a map-side-combined
    shuffle of d rows per partition, then a d-row collect to the
    driver (the same k-row-collect pattern as operators/clustering).
    The corpus never crosses the wire; driver state is O(d) floats.
"""

from __future__ import annotations

import hashlib
import math

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RP_OUT_DIM = 16
RP_IN_DIM = 64


def _rp_sign(j: int, i: int) -> float:
    """Deterministic ±1 from md5 — RNG-free so the DuckDB oracle can
    embed the identical matrix as a literal."""
    h = hashlib.md5(f"rp:{j}:{i}".encode()).hexdigest()
    return 1.0 if int(h[:8], 16) % 2 == 0 else -1.0


# module-level constant: the SAME object renders the Spark literal
# and the oracle SQL literal, so the two sides cannot diverge
RP_MATRIX: list[list[float]] = [
    [_rp_sign(j, i) for i in range(RP_IN_DIM)] for j in range(RP_OUT_DIM)
]
_RP_SCALE = math.sqrt(RP_OUT_DIM)  # JL normalization: y = Rx / sqrt(d_out)


def random_projection(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Project ``vec_col`` (length-64 float array) to RP_OUT_DIM
    dimensions with the fixed ±1 matrix. Returns (id, j, y) long
    format, y rounded to 6 decimals (sum-order drift vs the oracle's
    grouped sum is ~1e-15 on O(1) values).
    """
    rows = F.array(
        *[F.array(*[F.lit(s) for s in row]) for row in RP_MATRIX]
    )
    # materialize the double-cast array in its own projection first:
    # HOF lambda arguments are excluded from Catalyst subexpression
    # elimination (PERFORMANCE.md), so an unbound cast would re-run
    # per output dimension
    staged = emb.select(
        id_col, F.transform(vec_col, lambda x: x.cast("double")).alias("__xd")
    )
    proj = staged.select(
        id_col,
        F.transform(
            rows,
            lambda row: F.aggregate(
                F.zip_with("__xd", row, lambda x, s: x * s),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            / _RP_SCALE,
        ).alias("__y"),
    )
    return proj.select(
        id_col, F.posexplode("__y").alias("j", "__yy")
    ).select(id_col, F.col("j").cast("int").alias("j"), F.round("__yy", 6).alias("y"))


def random_projection_numpy(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Arrow-batched numpy variant of :func:`random_projection` —
    identical output (tests assert value equality at 1e-6 with the
    HOF path), ~order-of-magnitude faster per row because the
    16×64 multiply-add runs as ONE BLAS matmul per Arrow batch
    instead of 1024 interpreted HOF lambda evaluations per row.

    This IS the registered q134 catalog path as of round 6 (the
    round-5 VERDICT's ask: the HOF fold was the last measured
    4.7×-at-10× constant factor; at sf0.1 this variant measures
    0.26 s vs 1.19 s). :func:`random_projection` stays as the
    no-Arrow fallback. numpy's pairwise/SIMD summation can differ
    from the sequential fold in the last ulp, which is why the
    parity contract is 1e-6-rounded values, not bit equality.
    """
    import pandas as pd

    R = None  # built lazily inside workers; matrix is tiny

    def project(batches):
        nonlocal R
        import numpy as np  # noqa: F811 — worker-side import

        Rm = np.array(RP_MATRIX, dtype=np.float64)
        for pdf in batches:
            X = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            Y = X @ Rm.T / _RP_SCALE  # (batch, 16)
            n, d_out = Y.shape
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy().repeat(d_out),
                    "j": np.tile(np.arange(d_out, dtype=np.int32), n),
                    "y": np.round(Y.reshape(-1), 6),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        project, schema=f"{id_col} long, j int, y double"
    )


def power_iteration_top_pc(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_iter: int = 4,
) -> tuple[list[float], float, float, int]:
    """Top principal component of the (centered) embedding corpus by
    power iteration with a FIXED iteration count and the fixed start
    vector v0 = (1/8, …, 1/8) (exactly representable, so both
    engines start bit-identically).

    Returns (loadings v, eigenvalue λ, total_variance, n): v is the
    unit top-PC estimate after ``n_iter`` iterations, λ its Rayleigh
    estimate ‖(n−1)⁻¹·Σ xc(xc·v)‖, total_variance the trace of the
    covariance — λ/total_variance is the explained-variance ratio.

    Deterministic: no RNG; the oracle replays the same fixed
    recurrence. Convergence to the true PC is a property test
    (tests assert the numpy replay of the same recurrence matches —
    the ORACLE contract is the recurrence, not the limit).
    """
    staged = emb.select(
        id_col, F.transform(vec_col, lambda x: x.cast("double")).alias("x")
    ).localCheckpoint(
        eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
    )  # serialized: O(N*d) doubles, scanned 2+n_iter times below

    stats = (
        staged.select(F.posexplode("x").alias("pos", "v"))
        .groupBy("pos")
        .agg(
            F.sum("v").alias("sx"),
            F.sum(F.col("v") * F.col("v")).alias("sxx"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("pos")
        .collect()
    )
    n = int(stats[0]["n"])
    mu = [r["sx"] / r["n"] for r in stats]
    total_var = sum(
        (r["sxx"] - r["sx"] * r["sx"] / r["n"]) for r in stats
    ) / (n - 1)

    dim = len(mu)
    mu_lit = F.array(*[F.lit(m) for m in mu])
    # materialize the centered array once per row — HOF lambdas are
    # excluded from subexpression elimination (PERFORMANCE.md), so an
    # unbound zip_with would recompute per consumer
    # xc is deserialized ON PURPOSE: the power loop rescans it
    # n_iter times and serialized storage measured ~26% slower at
    # sf0.1; `staged` above carries the serialized safety copy
    xc = staged.select(
        F.zip_with("x", mu_lit, lambda a, b: a - b).alias("xc")
    ).localCheckpoint(eager=True)

    v = [1.0 / 8.0] * dim
    nrm = 0.0
    for _ in range(n_iter):
        v_lit = F.array(*[F.lit(c) for c in v])
        dot = F.aggregate(
            F.zip_with("xc", v_lit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, val: acc + val,
        )
        # stage the scalar xc·v as a COLUMN before the transform —
        # referenced inside the lambda it would re-fold per element
        w_rows = (
            xc.select("xc", dot.alias("__dot"))
            .select(
                F.posexplode(
                    F.transform("xc", lambda c: c * F.col("__dot"))
                ).alias("pos", "wv")
            )
            .groupBy("pos")
            .agg(F.sum("wv").alias("w"))
            .orderBy("pos")
            .collect()
        )
        w = [r["w"] for r in w_rows]
        nrm = math.sqrt(sum(x * x for x in w))
        v = [x / nrm for x in w]
    eigval = nrm / (n - 1)
    return v, eigval, total_var, n


def power_iteration_second_pc(
    emb: DataFrame,
    v1: list[float],
    n_iter: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[float], float]:
    """Second principal component by power iteration WITH DEFLATION
    against the (estimated) first component: each iterate w = C·u is
    orthogonalized, w' = w − (v1·w)·v1, before normalizing — so the
    recurrence converges toward the top of the orthogonal
    complement. The contract is the RECURRENCE against the passed v1
    estimate (what the oracle replays), not the exact eigenvector.

    Same scale shape as the first component: per iteration one HOF
    fold per row + a d-row map-side-combined aggregate; the
    orthogonalization is O(d) driver arithmetic on the collected
    iterate. Returns (loadings u, eigenvalue estimate ‖w'‖/(n−1)).
    """
    staged = emb.select(
        id_col, F.transform(vec_col, lambda x: x.cast("double")).alias("x")
    )
    stats = (
        staged.select(F.posexplode("x").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("sx"), F.count(F.lit(1)).alias("n"))
        .orderBy("pos")
        .collect()
    )
    n = int(stats[0]["n"])
    mu = [r["sx"] / r["n"] for r in stats]
    mu_lit = F.array(*[F.lit(m) for m in mu])
    xc = staged.select(
        F.zip_with("x", mu_lit, lambda a, b: a - b).alias("xc")
    ).localCheckpoint(eager=True)  # deserialized: see q135's note

    dim = len(mu)
    u = [1.0 / 8.0] * dim
    nrm = 0.0
    for _ in range(n_iter):
        u_lit = F.array(*[F.lit(c) for c in u])
        dot = F.aggregate(
            F.zip_with("xc", u_lit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, val: acc + val,
        )
        w_rows = (
            xc.select("xc", dot.alias("__dot"))
            .select(
                F.posexplode(
                    F.transform("xc", lambda c: c * F.col("__dot"))
                ).alias("pos", "wv")
            )
            .groupBy("pos")
            .agg(F.sum("wv").alias("w"))
            .orderBy("pos")
            .collect()
        )
        w = [r["w"] for r in w_rows]
        proj = sum(a * b for a, b in zip(v1, w))
        w = [x - proj * a for x, a in zip(w, v1)]
        nrm = math.sqrt(sum(x * x for x in w))
        u = [x / nrm for x in w]
    return u, nrm / (n - 1)
