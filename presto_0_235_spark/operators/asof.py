"""As-of (nearest-prior-event) join.

Beyond-reference: the reference has NO range/as-of/interval joins —
theta joins fall back to nested-loop (SURVEY.md §2.3 table, last
row). For time-series enrichment (attach the latest reference value
at or before each event) a nested-loop is O(n*m); the Spark-first
as-of join here is the classic union + partitioned-sort + running
last_value formulation:

  1. tag both inputs and union them (right rows carry the payload,
     left rows a null payload),
  2. one shuffle on the join key, sort by (ts, side) inside each
     partition — right-before-left at equal ts makes the match
     inclusive (ts_left >= ts_right, DuckDB ASOF semantics),
  3. running last(payload, ignorenulls) over rows-unbounded-preceding
     assigns every left row the latest prior right payload,
  4. keep the left rows.

Cost: ONE shuffle of n+m rows + a linear window pass — the optimal
distributed as-of join shape; no range explosion, no NLJ. Skewed keys
inherit the window's partitioning, so the SCALE.md salting recipe
applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    left_cols: list[str],
    right_value: str,
    out_col: str,
) -> DataFrame:
    """Left as-of join: for each left row, the ``right_value`` of the
    latest right row with right.ts <= left.ts and equal ``on`` key
    (NULL when no prior right row exists)."""
    rv_type = right.schema[right_value].dataType
    lu = left.select(
        on,
        ts,
        *left_cols,
        F.lit(None).cast(rv_type).alias("__rv"),
        F.lit(1).alias("__side"),
    )
    ru = right.select(
        on,
        ts,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        F.col(right_value).alias("__rv"),
        F.lit(0).alias("__side"),
    )
    unioned = lu.unionByName(ru)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn(out_col, F.last("__rv", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .drop("__rv", "__side")
    )
