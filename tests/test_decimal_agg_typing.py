"""r15 semantics batch — value + type pins.

1. Decimal aggregate-argument typing (r14 verdict #1):
   AVG/SUM/MIN/MAX over a KNOWABLE decimal column (VALUES-typed or
   catalog-typed) land on the reference's aggregate types —
   DecimalAverageAggregation.java:197-207 keeps (p, s) with HALF_UP
   at s; DecimalSumAggregation.java lands at decimal(38, s).
   Previously only CAST-typed argument TEXT fired the templates; the
   annotation pass now wraps bare decimal column refs in
   aggregate-argument positions. Windowed AVG consumes its OVER
   clause into the widen-round-cast rewrite (scalar_templates
   _decimal_avg_window).

2. Bare-literal casts to integral types (r14 ADVICE high, root
   cause): Presto types a bare dotted literal as DECIMAL — so
   CAST(1.7 AS INTEGER) rounds HALF_UP to 2 (DecimalCasts.java) and
   CAST(1.7E0 AS INTEGER) goes through Math.round
   (DoubleOperators.castToLong) — where Spark ANSI truncates to 1.

3. Decimal literal precision excludes leading integer zeros
   (Decimals.java:112-118 parse(..., false): 0.5 is decimal(1,1))
   — both the DECIMAL 'x' typed-literal lowering and the VALUES
   cell annotation (r14 ADVICE low).

4. grouping() under plain GROUP BY folds to a non-ordinal constant
   so ORDER BY grouping(a) survives analysis (r14 ADVICE medium).

5. _int_div_pass parses unparenthesized *|% chains as the dividend
   (r14 ADVICE low): CAST(a AS INT)*CAST(b AS INT)/CAST(c AS INT)
   is integer math end-to-end.
"""

from __future__ import annotations

import pytest

from presto_0_235_spark.sql.frontend import run_sql


def _one(spark, q):
    df = run_sql(spark, q)
    row = df.first()
    return row[len(row) - 1], df.schema[-1].dataType.simpleString()


# (sql, value-as-str, spark-type) — value compared on str() to pin
# scale rendering
AGG_CASES = [
    ("SELECT AVG(x) AS v FROM (VALUES DECIMAL '0.01', "
     "DECIMAL '0.02') AS t(x)", "0.02", "decimal(2,2)"),
    ("SELECT SUM(x) AS v FROM (VALUES DECIMAL '0.01', "
     "DECIMAL '0.02') AS t(x)", "0.03", "decimal(38,2)"),
    ("SELECT MIN(x) AS v FROM (VALUES DECIMAL '0.01', "
     "DECIMAL '0.02') AS t(x)", "0.01", "decimal(2,2)"),
    ("SELECT MAX(x) AS v FROM (VALUES 0.01, 0.02) AS t(x)",
     "0.02", "decimal(2,2)"),
    # HALF_UP at the input scale: (10.25 + 10.26) / 2 = 10.255 -> 10.26
    ("SELECT AVG(x) AS v FROM (VALUES 10.25, 10.26) AS t(x)",
     "10.26", "decimal(4,2)"),
    ("SELECT AVG(x) AS v FROM (VALUES 1.5, 2.0, 2.0) AS t(x)",
     "1.8", "decimal(2,1)"),
    # windowed AVG keeps (p, s) too (same accumulator serves frames)
    ("SELECT AVG(x) OVER (PARTITION BY 1) AS v FROM "
     "(VALUES 0.01, 0.02) AS t(x)", "0.02", "decimal(2,2)"),
    # windowed SUM: the shape-preserving widen composes with OVER
    ("SELECT SUM(x) OVER (PARTITION BY 1) AS v FROM "
     "(VALUES 0.01, 0.02) AS t(x)", "0.03", "decimal(38,2)"),
]


@pytest.mark.parametrize(
    "q,val,typ", AGG_CASES,
    ids=[f"agg{i:02d}" for i in range(len(AGG_CASES))])
def test_decimal_aggregate_typing(spark, q, val, typ):
    v, t = _one(spark, q)
    assert str(v) == val
    assert t == typ


CAST_CASES = [
    ("CAST(1.7 AS INTEGER)", "2"),
    ("CAST(-1.7 AS INTEGER)", "-2"),
    ("CAST(2.5 AS BIGINT)", "3"),       # HALF_UP (decimal source)
    ("CAST(-2.5 AS BIGINT)", "-3"),
    ("CAST(1.7E0 AS INTEGER)", "2"),    # Math.round (double source)
    # half AWAY FROM ZERO on doubles too: castToLong is
    # DoubleMath.roundToLong(v, HALF_UP) (DoubleOperators.java:240)
    # and the smaller types go through the sign-aware
    # MathFunctions.round (MathFunctions.java:757-758). Reference
    # value pins: TestDoubleOperators.java:186-195.
    ("CAST(-2.5E0 AS BIGINT)", "-3"),
    ("CAST(-17.5E0 AS BIGINT)", "-18"),  # TestDoubleOperators.java:195
    ("CAST(2.5E0 AS BIGINT)", "3"),
    ("CAST(-2.5E0 AS INTEGER)", "-3"),
    ("CAST(-2.5E0 AS SMALLINT)", "-3"),
    ("CAST(-2.5E0 AS TINYINT)", "-3"),
    # post-JDK-6430675 Math.round edge: largest double below 0.5
    # rounds to 0, where floor(x + 0.5) would give 1
    ("CAST(0.49999999999999994E0 AS BIGINT)", "0"),
    ("CAST(-0.49999999999999994E0 AS BIGINT)", "0"),
    ("CAST(2.49 AS SMALLINT)", "2"),
]


@pytest.mark.parametrize(
    "expr,val", CAST_CASES,
    ids=[f"cast{i:02d}" for i in range(len(CAST_CASES))])
def test_bare_literal_integral_casts(spark, expr, val):
    v, _ = _one(spark, f"SELECT {expr} AS v")
    assert str(v) == val


def test_decimal_literal_precision_excludes_leading_zeros(spark):
    v, t = _one(spark, "SELECT 0.5 AS v")
    assert t == "decimal(1,1)"
    v, t = _one(spark, "SELECT DECIMAL '0.5' AS v")
    assert t == "decimal(1,1)"
    # downstream arithmetic derives the reference's widths:
    # (1,1) x integer(->decimal(10,0)) -> decimal(11,1)
    v, t = _one(spark,
                "SELECT x * 2 AS v FROM (VALUES 0.5) AS t(x)")
    assert (str(v), t) == ("1.0", "decimal(11,1)")


def test_grouping_order_by_survives(spark):
    rows = run_sql(
        spark,
        "SELECT a, count(*) AS c FROM (VALUES 1, 2, 1) AS t(a) "
        "GROUP BY a ORDER BY grouping(a), a").collect()
    assert [tuple(r) for r in rows] == [(1, 2), (2, 1)]


INT_DIV_CASES = [
    ("SELECT CAST(a AS INTEGER)*CAST(b AS INTEGER)/CAST(c AS "
     "INTEGER) AS v FROM (VALUES (7, 3, 4)) AS t(a, b, c)", 5),
    ("SELECT CAST(a AS INTEGER)*CAST(b AS INTEGER)%CAST(c AS "
     "INTEGER)/CAST(d AS INTEGER) AS v FROM "
     "(VALUES (7, 3, 5, 2)) AS t(a, b, c, d)", 0),
    # mixed chain: VALUES-typed int column times literal over literal
    ("SELECT a*3/4 AS v FROM (VALUES 7) AS t(a)", 5),
    ("SELECT a*3/4 AS v FROM (VALUES -7) AS t(a)", -5),
]


@pytest.mark.parametrize(
    "q,val", INT_DIV_CASES,
    ids=[f"div{i:02d}" for i in range(len(INT_DIV_CASES))])
def test_int_division_chain_dividend(spark, q, val):
    v, t = _one(spark, q)
    assert v == val
    assert t in ("int", "bigint")
