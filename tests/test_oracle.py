"""Differential test: every registered query vs its DuckDB oracle.

This is the local mirror of the driver's CORRECTNESS gate — the same
design Presto uses in AbstractTestQueries (514 assertQuery methods
against H2, reference presto-tests/.../AbstractTestQueries.java).
"""

from __future__ import annotations

import pytest

from presto_0_235_spark.queries.registry import all_queries
from tests.conftest import assert_df_matches_oracle

_QUERIES = all_queries()
_WITH_ORACLE = sorted(n for n, q in _QUERIES.items() if q.oracle)
_ROWS_ONLY = sorted(n for n, q in _QUERIES.items() if not q.oracle)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_matches_oracle(name, spark, duck, sf_dir):
    q = _QUERIES[name]
    df = q.builder(spark, sf_dir)
    assert_df_matches_oracle(df, duck, q.oracle)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_dir):
    """Non-SQL-expressible ops: must run and yield a stable schema."""
    q = _QUERIES[name]
    df = q.builder(spark, sf_dir)
    assert df.columns, f"{name} produced no columns"
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
