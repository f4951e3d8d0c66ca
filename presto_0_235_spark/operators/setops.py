"""Set operations (SURVEY.md §2.7).

Presto 0.235: UNION [ALL|DISTINCT] (SPI/plan/UnionNode.java),
INTERSECT/EXCEPT DISTINCT-only (ALL is rejected by the analyzer,
reference MAIN/sql/analyzer/StatementAnalyzer.java:1227,1237), with
INTERSECT/EXCEPT lowered to union+marker+agg+filter
(ImplementIntersectAndExceptAsUnion.java:110). Spark implements all
of these natively, plus the ALL variants — exposed here as a flagged
superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_all(*dfs: DataFrame) -> DataFrame:
    """UNION ALL by column *name* (Presto resolves positionally but
    the fixtures always align; byName is the safer contract)."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out


def union_distinct(*dfs: DataFrame) -> DataFrame:
    """UNION (DISTINCT)."""
    return union_all(*dfs).distinct()


def intersect(left: DataFrame, right: DataFrame) -> DataFrame:
    """INTERSECT DISTINCT (the only form Presto 0.235 accepts)."""
    return left.intersect(right)


def except_(left: DataFrame, right: DataFrame) -> DataFrame:
    """EXCEPT DISTINCT."""
    return left.subtract(right)


def intersect_all(left: DataFrame, right: DataFrame) -> DataFrame:
    """INTERSECT ALL — beyond-reference extension (Spark native)."""
    return left.intersectAll(right)


def except_all(left: DataFrame, right: DataFrame) -> DataFrame:
    """EXCEPT ALL — beyond-reference extension (Spark native)."""
    return left.exceptAll(right)
