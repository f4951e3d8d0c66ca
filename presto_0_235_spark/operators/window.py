"""Window functions (SURVEY.md §2.5).

Presto's WindowOperator (MAIN/operator/WindowOperator.java:47)
partitions, sorts, and evaluates frames; ranking/value functions live
in MAIN/operator/window/. Spark's Window spec covers the whole
surface — and exceeds it: the reference rejects RANGE k PRECEDING
(StatementAnalyzer.java:1513-1515) while Spark's rangeBetween
supports it.

The reference's TopNRowNumberOperator (TopNRowNumberOperator.java:38,
planner rule WindowFilterPushDown.java) — row_number < k pushed into
the sort — corresponds to Spark's InferWindowGroupLimit, which
rewrites exactly the pattern top_n_per_group builds.

Scale note: a window over PARTITION BY k shuffles once on k; frames
evaluate within partitions without further exchange. Skewed partition
keys (one giant user) are the hazard at 100 TB — mitigate upstream
with salting or pre-aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from presto_0_235_spark.operators.sort import presto_order


def spec(
    partition_by: list[str | Column],
    order_by: list[tuple[str, str] | Column] | None = None,
) -> WindowSpec:
    """PARTITION BY ... ORDER BY ... with Presto null ordering."""
    w = Window.partitionBy(*partition_by)
    if order_by:
        keys = [
            k if isinstance(k, Column) else presto_order(k[0], k[1])
            for k in order_by
        ]
        w = w.orderBy(*keys)
    return w


def top_n_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[tuple[str, str]],
    n: int,
    rank_col: str = "rn",
) -> DataFrame:
    """row_number() <= n per group — the TopNRowNumber pattern.

    Spark pushes the limit into the window sort
    (InferWindowGroupLimit), so no partition fully sorts beyond n.
    """
    w = spec(partition_by, order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= n
    )
