"""Every registered query with an oracle must hash-match DuckDB at
sf0.01 — the local mirror of the driver's correctness gate."""

from __future__ import annotations

import pytest

from big_data_analytics_spark.queries import load_all
from tests.conftest import SF_CORRECT
from tests.oracle_compare import compare

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle)
NO_ORACLE = sorted(n for n, q in REGISTRY.items() if not q.oracle)


@pytest.mark.oracle
@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, name):
    q = REGISTRY[name]
    df = q.spark_fn(spark, SF_CORRECT)
    result = compare(name, df, q.oracle, SF_CORRECT)
    assert result.match, f"{name}: {result.detail} (spark={result.spark_rows}, oracle={result.oracle_rows})"


@pytest.mark.oracle
@pytest.mark.parametrize("name", NO_ORACLE)
def test_query_runs(spark, name):
    """Non-SQL-expressible ops at least run and return a stable schema."""
    q = REGISTRY[name]
    df = q.spark_fn(spark, SF_CORRECT)
    assert df.columns, name
    assert df.count() >= 0, name
