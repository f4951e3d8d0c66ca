"""Join operators.

Presto executes equi-joins as hash joins (probe
MAIN/operator/LookupJoinOperator.java:53, build
HashBuilderOperator.java:51) and everything else as nested-loop joins
(NestedLoopJoinOperator.java:36); semi joins build a set
(HashSemiJoinOperator.java:32 + SetBuilderOperator.java:36). The
broadcast-vs-shuffle decision is plan-time
(DetermineJoinDistributionType.java). On Spark all of that is the
physical layer: these builders declare the join, Catalyst picks
BroadcastHashJoin / SortMergeJoin / ShuffledHashJoin /
BroadcastNestedLoopJoin, and AQE can flip shuffle->broadcast at
runtime.

Scale notes:
  - `broadcast_join` pins the REPLICATED strategy for dimension
    tables — at 100 TB a fact-dim join must never shuffle the fact.
  - fact-fact equi-joins shuffle on the key; co-locate via bucketing
    (both sides bucketed on the key -> no exchange) when the join
    repeats across queries.
  - `semi_join`/`anti_join` never widen rows — prefer them to
    join+distinct (Presto plans IN/EXISTS the same way).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: Column | list[str],
    how: str = "inner",
) -> DataFrame:
    """INNER/LEFT/RIGHT/FULL equi-join.

    Presto runtime types INNER, PROBE_OUTER, LOOKUP_OUTER, FULL_OUTER
    (reference MAIN/operator/LookupJoinOperators.java:32-37).
    """
    assert how in ("inner", "left", "right", "full")
    return left.join(right, on, how)


def broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Column | list[str],
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the dim side replicated to every task.

    Presto's REPLICATED distribution (JoinNode.DistributionType).
    The fact side keeps its partitioning — no shuffle.
    """
    return fact.join(F.broadcast(dim), on, how)


def semi_join(left: DataFrame, right: DataFrame, on: Column) -> DataFrame:
    """IN/EXISTS: keep left rows with >=1 match; never duplicates.

    Presto lowers IN/EXISTS subqueries to SemiJoinNode
    (MAIN/sql/planner/plan/SemiJoinNode.java).
    """
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Column) -> DataFrame:
    """NOT EXISTS: keep left rows with no match.

    Note: plain anti join is *not* NOT IN — see null_aware_not_in.
    """
    return left.join(right, on, "left_anti")


def null_aware_not_in(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
) -> DataFrame:
    """NOT IN with SQL three-valued logic.

    If the build side contains any NULL, NOT IN yields no rows; a NULL
    probe key never qualifies. Presto keeps the semi-join "match"
    channel nullable for exactly this (HashSemiJoinOperator.java:32).
    Spark plans a null-aware anti join for SQL NOT IN; this builder
    expresses the same semantics in DataFrame form.
    """
    has_null = right.filter(F.col(right_key).isNull()).limit(1)
    non_empty = right.limit(1).select(F.lit(1).alias("__any_flag"))
    # Internal rename keeps the anti-join condition unambiguous even
    # when probe and build share the column name.
    clean = right.filter(F.col(right_key).isNotNull()).select(
        F.col(right_key).alias("__nin_key")
    )
    return (
        # NULL probe keys never qualify — EXCEPT against an empty
        # build side, where NOT IN is vacuously TRUE for every row
        # (Spark's NullAwareAntiJoin applies the same special case).
        left.join(F.broadcast(non_empty), how="left")
        .filter(F.col(left_key).isNotNull() | F.col("__any_flag").isNull())
        .drop("__any_flag")
        # NULL-keyed probe rows fall through the anti join untouched
        # (NULL == k is never true), which is exactly right here.
        .join(clean, F.col(left_key) == F.col("__nin_key"), "left_anti")
        # empty result if any build-side NULL: cross-join the 0/1-row
        # null marker and keep rows only when it is absent
        .join(F.broadcast(has_null.select(F.lit(1).alias("__null_flag"))),
              how="left")
        .filter(F.col("__null_flag").isNull())
        .drop("__null_flag")
    )


def cross_join(left: DataFrame, right: DataFrame) -> DataFrame:
    """Cartesian product (Presto NestedLoopJoinOperator)."""
    return left.crossJoin(right)


def theta_join(
    left: DataFrame, right: DataFrame, condition: Column, how: str = "inner"
) -> DataFrame:
    """Join on an arbitrary (non-equi) predicate.

    Presto runs these as nested-loop joins with a residual
    JoinFilterFunction; Spark plans BroadcastNestedLoopJoin. Keep the
    smaller side right so it gets broadcast.
    """
    return left.join(right, condition, how)
