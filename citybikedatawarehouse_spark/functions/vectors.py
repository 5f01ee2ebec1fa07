"""Vector column functions for embedding similarity (north-star
extension): cosine similarity, dot product, norms — as Catalyst
higher-order-function expressions over array<float>/array<double>.

Elements are cast to double BEFORE any arithmetic: float32 ops
accumulate error and differ across engines (DuckDB's native
list_cosine_similarity computes in float32 — verified 1e-6 drift);
double-math folds are bit-reproducible against the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column | str) -> Column:
    v = F.col(v) if isinstance(v, str) else v
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_as_double(a), lambda x: x * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; null if either norm is 0 (try_divide —
    ANSI-safe), which callers may coalesce."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def cosine_hoisted(
    a: Column | str, b: Column | str, na: Column | str, nb: Column | str
) -> Column:
    """Cosine with precomputed norms: ``na``/``nb`` must be
    ``norm(a)``/``norm(b)`` computed in each join side's row
    projection. Bit-identical to ``cosine`` (each factor is the same
    double — same fold over the same array, just evaluated once per
    ROW instead of once per PAIR), but a k-pair join evaluates one
    HOF fold per pair instead of three. HOFs are interpreted
    (CodegenFallback), so on an N x Q scoring join this cuts the
    dominant interpreted work ~3x."""
    na = F.col(na) if isinstance(na, str) else na
    nb = F.col(nb) if isinstance(nb, str) else nb
    return F.try_divide(dot(a, b), na * nb)
