"""Sort / limit / top-N with Presto ordering semantics.

Presto's default null ordering is **nulls last for both ASC and
DESC** (reference MAIN/sql/planner/PlannerUtils.java:39-51); Spark's
default is nulls-first ASC / nulls-last DESC. Every ordering built
here goes through presto_order() so the default matches.

Presto operators covered: OrderByOperator
(MAIN/operator/OrderByOperator.java:30), TopNOperator
(TopNOperator.java:35 — Spark plans TakeOrderedAndProject, already
partial+final like Presto's CreatePartialTopN rule), LimitOperator
(LimitOperator.java:24), DistinctLimitOperator
(DistinctLimitOperator.java:37).

Scale note: a global ORDER BY range-partitions then sorts per
partition — fine at any size; ORDER BY + LIMIT k never materializes
the full sort (per-partition top-k, then merge of k-row heaps).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def presto_order(col: Column | str, direction: str = "asc") -> Column:
    """One sort key with Presto's nulls-last default."""
    c = F.col(col) if isinstance(col, str) else col
    if direction == "asc":
        return c.asc_nulls_last()
    if direction == "desc":
        return c.desc_nulls_last()
    raise ValueError(f"direction must be asc|desc, got {direction!r}")


def order_by(df: DataFrame, *keys: tuple[str, str] | Column) -> DataFrame:
    """ORDER BY with Presto null ordering. Keys are (col, dir) pairs
    or ready Column sort expressions."""
    cols = [
        k if isinstance(k, Column) else presto_order(k[0], k[1])
        for k in keys
    ]
    return df.orderBy(*cols)


def top_n(df: DataFrame, n: int, *keys: tuple[str, str] | Column) -> DataFrame:
    """ORDER BY ... LIMIT n (TopNOperator)."""
    return order_by(df, *keys).limit(n)


def distinct_limit(
    df: DataFrame, n: int, *keys: tuple[str, str] | Column
) -> DataFrame:
    """SELECT DISTINCT ... LIMIT n (DistinctLimitOperator).

    The trailing order keys make the selected subset deterministic —
    required for differential testing; Presto's operator is
    first-come-first-served.
    """
    out = df.distinct()
    return order_by(out, *keys).limit(n) if keys else out.limit(n)
