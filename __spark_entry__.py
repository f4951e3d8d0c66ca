"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over presto_0_235_spark.queries.registry: every implemented
operator from SURVEY.md §2 (plus the LLM-pipeline extensions) is a
named query there, each with a DuckDB oracle where the semantics are
SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from presto_0_235_spark.queries import registry

FLAGSHIP_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q6 scan-filter-aggregate on sf0.001."""
    from presto_0_235_spark.queries.tpch_q import tpch_q6

    return tpch_q6(spark, FLAGSHIP_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query (SURVEY.md §2)."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query."""
    return registry.oracle_sql()
