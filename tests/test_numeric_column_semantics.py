"""r17 — resolved-type numeric semantics over COLUMN operands.

The r14-r16 numeric-semantics program (half-away-from-zero
double→integral casts, IEEE `/` and `%`, type-preserving ceil/floor,
greatest/least NaN discipline, sign-aware round) fired only where the
operand type was lexically visible in the SQL text. The r16 verdict's
probes showed the engine silently reverting to Spark-ANSI behavior
over plain double columns — the shape every real query hits first.
r17 threads the catalog's declared schemas (and VALUES-derived double
typing) through frontend._annotate_numeric_columns into the existing
rewrites; these tests pin the verdict's exact probe shapes.

Reference pins cited per case:
 - CAST(double AS BIGINT) rounds HALF_UP away from zero
   (DoubleOperators.java:240 DoubleMath.roundToLong HALF_UP;
   TestDoubleOperators.java:186-195)
 - double `/` and `%` are IEEE — zero divisors give signed
   Infinity / NaN, never an error (DoubleOperators.divide/modulus
   are Java's operators; TestMathFunctions.java:945,
   TestRealOperators.java:91)
 - ceil/floor preserve DOUBLE/REAL and pass NaN through
   (MathFunctions.java:135-171; TestMathFunctions.java:151-171),
   and Java Math.ceil(-0.5)/Math.floor(-0.0) keep NEGATIVE zero
 - greatest/least raise "Invalid argument to greatest(): NaN" only
   when the bound type is DOUBLE (AbstractGreatestLeast.java:128;
   checkNotNaN is generated solely for StandardTypes.DOUBLE)
 - 2-arg double round is Math.round(num * 10^n) / 10^n on the
   BINARY double (MathFunctions.java:750-763)
 - CHAR(n) comparison pads to the common length with U+0020 and
   compares code points (CharOperators compareChars;
   TestCharOperators.java:66-77 pins sub-space ordering)
"""

from __future__ import annotations

import math
import struct

import pytest

from presto_0_235_spark.catalog import register_views
from presto_0_235_spark.sql.frontend import run_sql


def _one(spark, sql):
    rows = run_sql(spark, sql).collect()
    assert len(rows) == 1
    return rows[0][0]


def _is_neg_zero(v: float) -> bool:
    return v == 0.0 and math.copysign(1.0, v) == -1.0


# ---------------------------------------------------------------------------
# double→integral CAST over resolved columns
# ---------------------------------------------------------------------------

def test_cast_values_double_column_rounds_half_up(spark):
    assert _one(spark, "SELECT CAST(x AS BIGINT) "
                       "FROM (VALUES (2.7E0)) t(x)") == 3
    assert _one(spark, "SELECT CAST(x AS BIGINT) "
                       "FROM (VALUES (-2.5E0)) t(x)") == -3
    # post-JDK-6430675 edge rides the same path
    assert _one(spark, "SELECT CAST(x AS BIGINT) FROM "
                       "(VALUES (0.49999999999999994E0)) t(x)") == 0


def test_cast_real_and_trycast_column_round_half_up(spark):
    # REAL->integral hops through MathFunctions.round
    # (RealOperators.java:212-215) — same half-away-from-zero; and
    # TRY_CAST must reach the annotation gate (\bCAST misses it:
    # no word boundary after the underscore)
    assert _one(spark, "SELECT CAST(x AS BIGINT) FROM "
                       "(VALUES (CAST(2.7 AS REAL))) t(x)") == 3
    assert _one(spark, "SELECT CAST(x AS INTEGER) FROM "
                       "(VALUES (CAST(-2.5 AS REAL))) t(x)") == -3
    assert _one(spark, "SELECT TRY_CAST(x AS BIGINT) FROM "
                       "(VALUES (2.7E0)) t(x)") == 3


def test_cast_decimal_column_to_integral_rounds_half_up(spark):
    # decimal->integral rescales with round-half-up in the reference
    # (DecimalCasts) where Spark truncates; the literal spelling
    # folds, this pins the runtime column-typed extent
    assert _one(spark, "SELECT CAST(CAST(x AS DECIMAL(5,2)) "
                       "AS BIGINT) FROM (VALUES (2.75E0)) t(x)") == 3
    rows = run_sql(spark, "SELECT CAST(d AS BIGINT) AS v FROM "
                          "(VALUES (CAST('2.5' AS DECIMAL(5,1))), "
                          "(CAST('-2.5' AS DECIMAL(5,1)))) t(d) "
                          "ORDER BY v").collect()
    assert [r.v for r in rows] == [-3, 3]
    # scale-0 decimals are already integral — identity
    assert _one(spark, "SELECT CAST(d AS BIGINT) FROM (VALUES "
                       "(CAST('7' AS DECIMAL(5,0)))) t(d)") == 7
    # TRY_CAST keeps the overflow-to-NULL discipline
    assert _one(spark, "SELECT TRY_CAST(CAST(x AS DECIMAL(5,2)) "
                       "AS TINYINT) FROM (VALUES (999.9E0)) t(x)") \
        is None


def test_cast_catalog_double_column_rounds_half_up(spark, sf_dir, duck):
    register_views(spark, sf_dir)
    got = {r.l_returnflag: r.v for r in run_sql(
        spark,
        "SELECT l_returnflag, "
        "sum(CAST(l_extendedprice AS BIGINT)) AS v "
        "FROM lineitem WHERE l_orderkey < 100 GROUP BY l_returnflag",
    ).collect()}
    # prices are positive, so (pc + 50) // 100 over exact cents IS
    # half-away-from-zero; DuckDB's native cast rounds half-even and
    # would diverge on exact-.50 prices
    exp = dict(duck.execute(
        "SELECT l_returnflag, "
        "sum((CAST(round(l_extendedprice * 100) AS BIGINT) + 50) "
        "    // 100) "
        f"FROM read_parquet('{sf_dir}/lineitem.parquet') "
        "WHERE l_orderkey < 100 GROUP BY l_returnflag"
    ).fetchall())
    assert got and got == exp


# ---------------------------------------------------------------------------
# IEEE division / modulus over resolved columns
# ---------------------------------------------------------------------------

def test_column_division_by_zero_is_ieee(spark, sf_dir):
    register_views(spark, sf_dir)
    v = _one(spark, "SELECT max(l_extendedprice / "
                    "(l_discount - l_discount)) FROM lineitem")
    assert v == float("inf")


def test_column_modulus_by_zero_is_nan(spark, sf_dir):
    register_views(spark, sf_dir)
    v = _one(spark, "SELECT max(l_extendedprice % "
                    "(l_discount - l_discount)) FROM lineitem")
    assert math.isnan(v)


def test_values_double_division_sign(spark):
    assert _one(spark, "SELECT x / (y - y) "
                       "FROM (VALUES (-3.0E0, 1.5E0)) t(x, y)") \
        == float("-inf")
    assert math.isnan(_one(
        spark, "SELECT (x - x) / (y - y) "
               "FROM (VALUES (3.0E0, 1.5E0)) t(x, y)"))


def test_mod_function_float_zero_divisor_is_nan(spark):
    # the call form rides the same IEEE contract as the operator
    assert math.isnan(_one(spark, "SELECT mod(5.0E0, 0.0E0)"))
    assert _one(spark, "SELECT mod(5.0E0, 2.0E0)") == 1.0
    assert math.isnan(_one(
        spark, "SELECT mod(x, x - x) FROM (VALUES (5.0E0)) t(x)"))


# ---------------------------------------------------------------------------
# ceil / floor type + NaN + negative-zero discipline
# ---------------------------------------------------------------------------

def test_ceil_floor_catalog_column_keeps_double(spark, sf_dir):
    register_views(spark, sf_dir)
    df = run_sql(spark, "SELECT ceil(l_extendedprice) AS c, "
                        "floor(l_extendedprice) AS f "
                        "FROM lineitem LIMIT 1")
    assert dict(df.dtypes) == {"c": "double", "f": "double"}


def test_ceil_nan_column_passes_through(spark):
    assert math.isnan(_one(
        spark, "SELECT ceil(x) FROM (VALUES (nan())) t(x)"))
    assert math.isnan(_one(
        spark, "SELECT floor(x) FROM (VALUES (nan())) t(x)"))


@pytest.mark.parametrize("expr,neg", [
    ("ceil(-0.5E0)", True),
    ("ceil(-0.0E0)", True),
    ("floor(-0.0E0)", True),
    ("ceil(0.0E0)", False),
    ("floor(0.5E0)", False),
    ("truncate(-0.3E0)", True),
    ("round(-0.3E0)", True),
])
def test_negative_zero_discipline(spark, expr, neg):
    v = _one(spark, f"SELECT {expr}")
    assert v == 0.0
    assert _is_neg_zero(v) == neg


def test_ceil_round_column_negative_zero(spark):
    for fn in ("ceil", "round"):
        v = _one(spark, f"SELECT {fn}(x) FROM (VALUES (-0.3E0)) t(x)")
        assert _is_neg_zero(v), fn


# ---------------------------------------------------------------------------
# aggregate-RESULT operands (r17 second pass: sum(a)/sum(b) and
# ceil(sum(x)) — float-preserving aggregates over typed interiors
# are themselves statically typed operands)
# ---------------------------------------------------------------------------

def test_sum_over_sum_zero_is_ieee(spark, sf_dir):
    register_views(spark, sf_dir)
    v = _one(spark, "SELECT sum(l_extendedprice) / "
                    "sum(l_discount - l_discount) FROM lineitem")
    assert v == float("inf")
    v = _one(spark, "SELECT sum(l_extendedprice) % "
                    "sum(l_discount - l_discount) FROM lineitem")
    assert math.isnan(v)


def test_ceil_round_of_aggregate_keeps_double(spark, sf_dir):
    register_views(spark, sf_dir)
    df = run_sql(spark, "SELECT ceil(sum(l_extendedprice)) AS c, "
                        "floor(min(l_extendedprice)) AS f, "
                        "round(avg(l_extendedprice), 2) AS r "
                        "FROM lineitem WHERE l_orderkey < 10")
    assert dict(df.dtypes) == {"c": "double", "f": "double",
                               "r": "double"}


def test_windowed_aggregate_operands(spark, sf_dir):
    # an OVER clause is type-transparent: the detectors extend the
    # operand across it (never wrapping a partial call), so windowed
    # sums get the same IEEE and type-preservation discipline
    register_views(spark, sf_dir)
    rows = run_sql(
        spark,
        "SELECT sum(l_extendedprice) OVER "
        "(PARTITION BY l_returnflag) / 2E0 AS v "
        "FROM lineitem LIMIT 5").collect()
    assert len(rows) == 5 and all(r.v > 0 for r in rows)
    v = run_sql(
        spark,
        "SELECT sum(l_extendedprice) OVER (PARTITION BY l_orderkey) "
        "/ (l_discount - l_discount) AS v FROM lineitem "
        "ORDER BY v DESC LIMIT 1").collect()[0].v
    assert v == float("inf")
    df = run_sql(
        spark,
        "SELECT ceil(sum(l_extendedprice) OVER "
        "(PARTITION BY l_returnflag)) AS v FROM lineitem LIMIT 1")
    assert dict(df.dtypes) == {"v": "double"}


# ---------------------------------------------------------------------------
# alias / derived-table / CTE propagation (r17 third pass: the
# resolver follows SELECT-item aliases through derived tables and
# first-level CTEs — r16 verdict #1 named this leg explicitly)
# ---------------------------------------------------------------------------

def test_derived_table_alias_propagates_double(spark, sf_dir):
    register_views(spark, sf_dir)
    q = ("SELECT CAST({ref} AS BIGINT) AS v FROM "
         "(SELECT l_extendedprice AS x FROM lineitem) t "
         "ORDER BY v LIMIT 1")
    unq = _one(spark, q.format(ref="x"))
    qual = _one(spark, q.format(ref="t.x"))
    assert unq == qual
    # HALF_UP, not truncation: compare against the typed spelling
    direct = _one(spark, "SELECT CAST(l_extendedprice AS BIGINT) AS v "
                         "FROM lineitem ORDER BY v LIMIT 1")
    assert unq == direct


def test_derived_star_and_column_list(spark, sf_dir):
    register_views(spark, sf_dir)
    df = run_sql(spark, "SELECT ceil(l_extendedprice) AS v FROM "
                        "(SELECT * FROM lineitem) t LIMIT 1")
    assert dict(df.dtypes) == {"v": "double"}
    v = _one(spark, "SELECT max(a / (b - b)) FROM "
                    "(SELECT l_extendedprice, l_discount "
                    "FROM lineitem) t(a, b)")
    assert v == float("inf")


def test_cte_propagates_double(spark, sf_dir):
    register_views(spark, sf_dir)
    v = _one(spark, "WITH t AS (SELECT l_extendedprice p, "
                    "l_discount d FROM lineitem) "
                    "SELECT max(p / (d - d)) FROM t")
    assert v == float("inf")
    df = run_sql(spark, "WITH t AS (SELECT l_extendedprice p "
                        "FROM lineitem) "
                        "SELECT floor(p) AS v FROM t LIMIT 1")
    assert dict(df.dtypes) == {"v": "double"}


def test_outer_alias_still_shadows(spark, sf_dir):
    # an alias defined in the OUTER scope is not a derived column —
    # the blanked-extent shadow set must keep treating it as a shadow
    register_views(spark, sf_dir)
    rows = run_sql(
        spark,
        "SELECT l_extendedprice + 0E0 AS x FROM lineitem "
        "ORDER BY x LIMIT 1").collect()
    assert rows[0].x > 0


# ---------------------------------------------------------------------------
# greatest / least NaN discipline
# ---------------------------------------------------------------------------

def test_greatest_nan_double_column_raises(spark):
    with pytest.raises(Exception, match="Invalid argument to "
                                        r"greatest\(\): NaN"):
        run_sql(spark, "SELECT greatest(x, 1E0) "
                       "FROM (VALUES (nan())) t(x)").collect()


def test_greatest_least_pure_real_nan_order(spark):
    # checkNotNaN is generated only for DOUBLE; REAL lists compare
    # through `>`/`<` where NaN never wins — result is NaN only when
    # the FIRST argument is NaN (ADVICE r16 #2)
    assert math.isnan(_one(
        spark, "SELECT greatest(CAST('NaN' AS REAL), "
               "CAST(1 AS REAL))"))
    assert _one(spark, "SELECT greatest(CAST(1 AS REAL), "
                       "CAST('NaN' AS REAL))") == 1.0
    assert _one(spark, "SELECT least(CAST(2 AS REAL), "
                       "CAST('NaN' AS REAL), CAST(7 AS REAL))") == 2.0
    assert math.isnan(_one(
        spark, "SELECT least(CAST('NaN' AS REAL), "
               "CAST(5 AS REAL))"))


# ---------------------------------------------------------------------------
# 2-arg double round: binary-double factor semantics (ADVICE r16 #3)
# ---------------------------------------------------------------------------

def test_round_scale_binary_double(spark):
    # 1.005 * 100 = 100.49999999999999 on the binary double
    assert _one(spark, "SELECT round(1.005E0, 2)") == 1.0
    assert _one(spark, "SELECT round(-1.005E0, 2)") == -1.0
    assert _one(spark, "SELECT round(2.5E0, 0)") == 3.0
    # 1.345 * 100 lands EXACTLY on 134.5 in binary — ties round up
    # (the 1.005 case above is the discriminating pin: the binary
    # product 100.49999999999999 rounds DOWN where Spark's native
    # ROUND — decimal HALF_UP on the shortest repr — gives 1.01)
    assert _one(spark, "SELECT round(1.345E0, 2)") == 1.35
    # REAL overload computes through double and narrows
    assert _one(spark, "SELECT round(CAST('1.005' AS REAL), 2)") \
        == struct.unpack("f", struct.pack("f", 1.0))[0]
    # column operand rides the annotation
    assert _one(spark, "SELECT round(x, 2) "
                       "FROM (VALUES (1.005E0)) t(x)") == 1.0


def test_round_factor_bits_match_jvm_math_pow(spark):
    """The emitted factor literal must be bit-identical to Java's
    Math.pow(10, n) for every scale the template accepts."""
    jvm_pow = spark.sparkContext._jvm.java.lang.Math.pow
    for n in range(-22, 23):
        if n == 0:
            continue
        py = float(10.0 ** n)
        jv = jvm_pow(10.0, float(n))
        assert struct.pack("d", py) == struct.pack("d", jv), n


# ---------------------------------------------------------------------------
# CHAR(n) padded comparison — sub-space code points (verdict #2)
# ---------------------------------------------------------------------------

def test_char_subspace_comparison_orders_by_padding(spark):
    assert _one(spark, "SELECT cast('ab\t' as char(3)) = "
                       "cast('ab' as char(2))") is False
    assert _one(spark, "SELECT cast('ab\t' as char(3)) < "
                       "cast('ab' as char(2))") is True
    assert _one(spark, "SELECT CAST('a\t' AS CHAR(5)) = "
                       "CAST('a' AS CHAR(5))") is False
    # trailing-space insignificance is unchanged
    assert _one(spark, "SELECT cast('foo' as char(3)) = "
                       "cast('foo' as char(5))") is True
    assert _one(spark, "SELECT cast('bar' as char(5)) = 'bar   '") \
        is True
    # BETWEEN rides the same pad
    assert _one(spark, "SELECT cast('b' as char(3)) BETWEEN "
                       "cast('a' as char(1)) AND "
                       "cast('c' as char(5))") is True


# ---------------------------------------------------------------------------
# compound function arguments (r17 follow-up — the residual the r17
# notes documented): an arithmetic chain of statically-typed float
# operands derives the reference's DOUBLE result type inside the
# type-sensitive numeric calls
# ---------------------------------------------------------------------------

def test_ceil_floor_compound_double_column_chain(spark):
    df = run_sql(spark, "SELECT ceil(x + 1) AS v "
                        "FROM (VALUES (2.2E0)) t(x)")
    assert dict(df.dtypes)["v"] == "double"
    assert df.collect()[0][0] == 4.0
    df = run_sql(spark, "SELECT floor(x * 2) AS v "
                        "FROM (VALUES (2.2E0)) t(x)")
    assert dict(df.dtypes)["v"] == "double"
    assert df.collect()[0][0] == 4.0
    # grouping parens inside the chain
    df = run_sql(spark, "SELECT ceil((x + 1) * 2) AS v "
                        "FROM (VALUES (2.2E0)) t(x)")
    assert dict(df.dtypes)["v"] == "double"
    assert df.collect()[0][0] == 7.0


def test_truncate_round_compound_chain(spark):
    assert _one(spark, "SELECT truncate(x + 1) "
                       "FROM (VALUES (2.7E0)) t(x)") == 3.0
    # binary-double factor semantics survive the chain spelling
    assert _one(spark, "SELECT round(x + 0.005E0, 2) "
                       "FROM (VALUES (1.0E0)) t(x)") == 1.0


def test_compound_chain_negative_zero_and_nan(spark):
    v = _one(spark, "SELECT ceil(x - x - 0.5E0) "
                    "FROM (VALUES (3.25E0)) t(x)")
    assert _is_neg_zero(v)
    assert math.isnan(_one(
        spark, "SELECT ceil(nan() + x) FROM (VALUES (1E0)) t(x)"))
    assert math.isinf(_one(
        spark, "SELECT floor(infinity() - x) "
               "FROM (VALUES (1E0)) t(x)"))


def test_greatest_mod_compound_chain(spark):
    assert _one(spark, "SELECT greatest(x + 1E0, 0E0) "
                       "FROM (VALUES (2.5E0)) t(x)") == 3.5
    # IEEE modulus with a compound zero divisor
    assert math.isnan(_one(
        spark, "SELECT mod(x + 1, 0E0) FROM (VALUES (2.5E0)) t(x)"))


def test_compound_chain_unknown_operand_declines(spark):
    # a chain containing an untyped identifier keeps Spark's
    # derivation (conservative decline, no wrong rewrite)
    df = run_sql(spark,
                 "SELECT ceil(x + y) AS v FROM "
                 "(SELECT 1.5E0 AS x, CAST(1 AS BIGINT) AS y) t")
    assert df.collect()[0][0] in (3, 3.0)
