"""Every registered query must hash-match its DuckDB oracle — this is
the in-repo mirror of the driver's CORRECTNESS gate (at sf0.001 for
speed; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from degenter_clickhouse_spark.queries import load_registry

from .helpers import SF_DIR, assert_matches_oracle

REGISTRY = load_registry()
ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    assert_matches_oracle(df, q.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
