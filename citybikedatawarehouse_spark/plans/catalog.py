"""Query catalog: the engine's declared operator surface.

Every operator from SURVEY.md section 2 (plus the north-star
extensions in section 2.4) registers here as a named query:

  * ``QUERIES[name](spark, sf_dir) -> DataFrame`` — the Spark plan.
  * ``ORACLES[name]`` — equivalent ANSI SQL for the DuckDB oracle
    (absent for ops DuckDB can't express; those get rows-only checks).

The driver (and ``tests/test_oracle_parity.py``) runs both sides on
the same parquet tables and compares row-count + schema +
order-insensitive value hash — so every query aliases its output
columns identically on both sides, rounds floating-point aggregates
to a fixed scale on both sides (double summation order differs
between engines), and avoids nondeterministic expressions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # each module registers its queries on import
    from citybikedatawarehouse_spark.plans import (  # noqa: F401
        relational,
        star,
        text,
        dedup,
        curation,
        similarity,
        temporal,
        multimodal,
        streaming_batch,
        scalar,
        sql_api,
        warehouse_ops,
        analytics,
        embedding_transform,
        decision_support,
        selection,
    )


_load_all()
