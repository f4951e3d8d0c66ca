"""Pin the r17 optimization of functions/compat._scaled_long: the
sign-aware floor form must be value-identical to the ROUND form it
replaced (Spark's ROUND on doubles goes through a per-value
BigDecimal; floor stays primitive in codegen — ~2x on the q1 shape).

Identity domain: the 1e-6 money grid the compat header contracts
(fixture money carries <=6 true decimals). The synthetic grid below
steps by 0.5e-6 — every exact half-tie and sign combination — so the
test fails loudly if either form's boundary behavior drifts.
"""

import pytest
from pyspark.sql import functions as F

from presto_0_235_spark.functions.compat import (
    MONEY_SCALE,
    _scaled_long,
    dec_avg,
    dec_sum,
)


def _round_form(c):
    """The pre-r17 spelling (reference behavior)."""
    return F.round(c * MONEY_SCALE).cast("long")


def test_scaled_long_matches_round_on_half_tie_grid(spark):
    # -1.0 .. 1.0 in 0.5e-6 steps: every money-grid point and every
    # exact .5 tie of the scaled domain, both signs.
    vals = spark.range(-2_000_000, 2_000_001).select(
        (F.col("id").cast("double") / 2.0 / MONEY_SCALE).alias("v")
    )
    mism = vals.agg(
        F.sum(
            F.when(
                ~_round_form(F.col("v")).eqNullSafe(
                    _scaled_long(F.col("v"))
                ),
                1,
            ).otherwise(0)
        ).alias("m")
    ).collect()[0]["m"]
    assert mism == 0


def test_scaled_long_matches_round_on_fixture_money(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    exprs = [
        F.col("l_quantity"),
        F.col("l_extendedprice"),
        F.col("l_discount"),
        F.col("l_tax"),
        disc,
        disc * (1 + F.col("l_tax")),
        F.col("l_extendedprice") * F.col("l_discount"),
    ]
    agg = li.agg(
        *[
            F.sum(
                F.when(~_round_form(e).eqNullSafe(_scaled_long(e)), 1)
                .otherwise(0)
            ).alias(f"m{i}")
            for i, e in enumerate(exprs)
        ]
    ).collect()[0]
    assert sum(v or 0 for v in agg) == 0


def test_dec_sum_null_and_negative_semantics(spark):
    # NULLs skipped by SUM, negatives round away from zero — both
    # identical to the old ROUND spelling.
    df = spark.createDataFrame(
        [(1, 1.5), (1, -2.5), (1, None), (2, None)],
        schema="g int, v double",
    )
    got = {
        r["g"]: (r["s"], r["a"])
        for r in df.groupBy("g")
        .agg(dec_sum("v", "s"), dec_avg("v", "a"))
        .collect()
    }
    assert got[1] == (-1.0, -0.5)
    assert got[2] == (None, None)


def test_no_bigdecimal_round_in_dec_sum_plan(spark):
    """The optimization's plan claim: dec_sum emits no ROUND node."""
    df = spark.createDataFrame([(1.25,)], schema="v double")
    plan = (
        df.agg(dec_sum("v", "s"))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "round(" not in plan.lower()
    assert "floor(" in plan.lower()


def _column_dec_sum(col, alias):
    """The pre-fast-path Column spelling of dec_sum (kept as the
    reference tree for the plan-identity pin below)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(_scaled_long(c)).cast("double") / F.lit(float(MONEY_SCALE))
    ).alias(alias)


def _column_dec_avg(col, alias):
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(_scaled_long(c)).cast("double")
        / F.lit(float(MONEY_SCALE))
        / F.count(c)
    ).alias(alias)


def test_expr_fast_path_plan_identity(spark, sf_dir):
    """The r17 single-`expr` fast path (string args to dec_sum /
    dec_avg parse as one Spark-SQL expression instead of ~60 Py4J
    Column calls) must build the IDENTICAL analyzed plan — same
    literal types (0.5D, int MONEY_SCALE), same operator tree — so
    results are bit-identical by construction. Canonicalized
    optimized-plan equality pins it for every aggregate shape the
    query corpus uses."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    def canon(df):
        return (
            df._jdf.queryExecution().optimizedPlan().canonicalized()
            .toString()
        )

    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    shapes = [
        (F.col("l_quantity"), "l_quantity", "plain"),
        (disc, "l_extendedprice * (1 - l_discount)", "product"),
        (
            disc * (1 + F.col("l_tax")),
            "(l_extendedprice * (1 - l_discount)) * (1 + l_tax)",
            "charge",
        ),
        (
            F.col("l_extendedprice") * F.col("l_discount"),
            "l_extendedprice * l_discount",
            "disc_product",
        ),
    ]
    for col_expr, sql_expr, label in shapes:
        old = li.groupBy("l_returnflag").agg(_column_dec_sum(col_expr, "x"))
        new = li.groupBy("l_returnflag").agg(dec_sum(sql_expr, "x"))
        assert canon(old) == canon(new), f"dec_sum {label}"
    old = li.groupBy("l_returnflag").agg(_column_dec_avg("l_discount", "x"))
    new = li.groupBy("l_returnflag").agg(dec_avg("l_discount", "x"))
    assert canon(old) == canon(new), "dec_avg plain"
    # non-trivial dec_avg expression: COUNT's argument must be
    # parenthesized like _scaled_long_sql's so the parse shape of
    # both uses of the expression cannot drift
    old = li.groupBy("l_returnflag").agg(_column_dec_avg(disc, "x"))
    new = li.groupBy("l_returnflag").agg(
        dec_avg("l_extendedprice * (1 - l_discount)", "x"))
    assert canon(old) == canon(new), "dec_avg product"
