"""Every registered query with an oracle must hash-match DuckDB —
the local twin of the driver's CORRECTNESS gate, run at sf0.001 for
speed (the driver re-runs at sf0.01)."""

from __future__ import annotations

import pytest

from citybikedatawarehouse_spark.plans.catalog import ORACLES, QUERIES
from tests.oracle_harness import compare


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    compare(spark, name, QUERIES[name], ORACLES[name], sf_dir)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    """Queries without an oracle still must execute and return a
    stable schema."""
    df = QUERIES[name](spark, sf_dir)
    assert df.columns  # schema resolves
    assert df.count() >= 0
