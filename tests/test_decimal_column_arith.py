"""Column-operand decimal arithmetic — the r14 conversion of the last
documented wrong-VALUE divergence class for valid inputs.

Through r13 every LITERAL decimal form constant-folded with the
reference's type derivation, but `col_a op col_b` on decimal-typed
columns kept Spark's derivation (notably divide: Spark's
max(6, s1+p2+1) result scale vs Presto's max(s1, s2) with HALF_UP —
DecimalOperators.java:316-317). The r14 `_rewrite_decimal_column_arith`
pass closes the class for every site whose operand types are
statically derivable from the SQL text (CAST(... AS DECIMAL(p,s))
forms, typed/bare literals, and chains of those).

Pins follow DecimalOperators.java:
  :91-92  add/sub  (max(p1-s1,p2-s2)+max(s1,s2)+1, max(s1,s2))
  :251-252 multiply (p1+p2, s1+s2)
  :316-317 divide   (p1+s2+max(0,s2-s1), max(s1,s2)) with HALF_UP
  :480-481 modulus  (min(p1-s1,p2-s2)+max(s1,s2), max(s1,s2))
all capped at 38. Values forced through VALUES-table columns so
Catalyst cannot constant-fold the Spark plan — the derivation under
test is the column-operand one.
"""

from __future__ import annotations

import decimal

import pytest

from presto_0_235_spark.sql.frontend import run_sql

D = decimal.Decimal


def _one(spark, sql):
    df = run_sql(spark, sql)
    row = df.collect()[0]
    return df.schema[0].dataType.simpleString(), row[0]


# (select expr, FROM clause, expected Spark type, expected value)
CASES = [
    # divide: Presto scale max(s1,s2), HALF_UP away from zero
    ("CAST(x AS DECIMAL(12,2)) / CAST(y AS DECIMAL(12,2))",
     "(VALUES (1.0, 3.0)) t(x, y)", "decimal(14,2)", D("0.33")),
    ("CAST(x AS DECIMAL(12,2)) / CAST(y AS DECIMAL(12,2))",
     "(VALUES (1.0, 8.0)) t(x, y)", "decimal(14,2)", D("0.13")),
    ("CAST(x AS DECIMAL(12,2)) / CAST(y AS DECIMAL(12,2))",
     "(VALUES (-1.0, 8.0)) t(x, y)", "decimal(14,2)", D("-0.13")),
    ("CAST(x AS DECIMAL(12,2)) / CAST(y AS DECIMAL(12,2))",
     "(VALUES (1.0, -8.0)) t(x, y)", "decimal(14,2)", D("-0.13")),
    # integer-literal divisor coerces to decimal(10,0)
    ("CAST(x AS DECIMAL(12,2)) / 3",
     "(VALUES (10.0)) t(x)", "decimal(12,2)", D("3.33")),
    # s2 > s1: dividend rescales before the HALF_UP divide
    ("CAST(x AS DECIMAL(3,1)) / CAST(y AS DECIMAL(5,2))",
     "(VALUES (1.0, 3.00)) t(x, y)", "decimal(6,2)", D("0.33")),
    ("CAST(x AS DECIMAL(5,2)) / CAST(y AS DECIMAL(3,1))",
     "(VALUES (100.00, 0.3)) t(x, y)", "decimal(6,2)", D("333.33")),
    # the divide scale pin on minimal types
    ("CAST(x AS DECIMAL(2,1)) / CAST(y AS DECIMAL(2,1))",
     "(VALUES (1.0, 3.0)) t(x, y)", "decimal(3,1)", D("0.3")),
    # multiply: (p1+p2, s1+s2)
    ("CAST(x AS DECIMAL(12,2)) * CAST(y AS DECIMAL(12,2))",
     "(VALUES (1.5, 2.5)) t(x, y)", "decimal(24,4)", D("3.7500")),
    # add/sub: (max int digits + max scale + 1, max scale)
    ("CAST(x AS DECIMAL(12,2)) + CAST(y AS DECIMAL(10,4))",
     "(VALUES (1.25, 2.0005)) t(x, y)", "decimal(15,4)", D("3.2505")),
    ("CAST(x AS DECIMAL(12,2)) - CAST(y AS DECIMAL(10,4))",
     "(VALUES (1.25, 2.0005)) t(x, y)", "decimal(15,4)", D("-0.7505")),
    # modulus: sign of the dividend, Presto type
    ("CAST(x AS DECIMAL(12,2)) % CAST(y AS DECIMAL(10,0))",
     "(VALUES (5.5, 2)) t(x, y)", "decimal(12,2)", D("1.50")),
    # literal/column mixing with Presto's bare-literal coercions
    ("2 * CAST(y AS DECIMAL(12,2))",
     "(VALUES (2.5)) t(y)", "decimal(22,2)", D("5.00")),
    ("CAST(x AS DECIMAL(12,2)) + 0.005",
     "(VALUES (1.25)) t(x)", "decimal(14,3)", D("1.255")),
    # typed DECIMAL literal against a column
    ("DECIMAL '1.20' + CAST(x AS DECIMAL(12,2))",
     "(VALUES (1.25)) t(x)", "decimal(13,2)", D("2.45")),
    # left-associative chain: ((12,2)*(12,2)=(24,4)) * (12,2) = (36,6)
    ("CAST(a AS DECIMAL(12,2)) * CAST(b AS DECIMAL(12,2)) * "
     "CAST(c AS DECIMAL(12,2))",
     "(VALUES (2.0, 3.0, 4.0)) t(a, b, c)",
     "decimal(36,6)", D("24.000000")),
    # parenthesized groups fold through (the TPC-H revenue shape)
    ("CAST(x AS DECIMAL(12,2)) * (1 - CAST(y AS DECIMAL(12,2)))",
     "(VALUES (100.00, 0.05)) t(x, y)", "decimal(25,4)", D("95.0000")),
]


@pytest.mark.parametrize(
    "expr,frm,expected_type,expected",
    CASES, ids=[f"case{i}" for i in range(len(CASES))])
def test_column_decimal_arith(spark, expr, frm, expected_type, expected):
    typ, val = _one(spark, f"SELECT {expr} AS r FROM {frm}")
    assert typ == expected_type, f"{expr}: type {typ} != {expected_type}"
    assert val == expected, f"{expr}: {val} != {expected}"


def test_try_still_absorbs_division_by_zero(spark):
    # sites inside TRY are deliberately NOT rewritten: Presto TRY
    # absorbs "Division by zero" to NULL and the try_divide lowering
    # needs the bare operator shape
    _, val = _one(
        spark,
        "SELECT TRY(CAST(x AS DECIMAL(12,2)) / CAST(y AS DECIMAL(12,2)))"
        " AS r FROM (VALUES (1.0, 0.0)) t(x, y)")
    assert val is None


def test_division_by_zero_still_raises(spark):
    with pytest.raises(Exception):
        run_sql(
            spark,
            "SELECT CAST(x AS DECIMAL(12,2)) / CAST(y AS DECIMAL(12,2))"
            " AS r FROM (VALUES (1.0, 0.0)) t(x, y)").collect()


def test_untyped_forms_left_alone(spark):
    # bare double columns keep engine-native double arithmetic — the
    # rewrite fires only on statically-typed decimal operands
    typ, _ = _one(
        spark,
        "SELECT x / y AS r FROM (VALUES (CAST(1.0 AS DOUBLE), "
        "CAST(3.0 AS DOUBLE))) t(x, y)")
    assert typ == "double"


def test_high_precision_divide_routes_to_exact_udf(spark):
    # (38,2)/(38,2): Spark's adjusted divide scale (6) cannot prove
    # the HALF_UP bound, so (r14 #2) the site routes through the
    # exact-arithmetic UDF (functions/udfs.presto_decimal_div) — the
    # former documented residual now lands on the reference type AND
    # value: decimal(38,2) with HALF_UP
    typ, v = _one(
        spark,
        "SELECT CAST(x AS DECIMAL(38,2)) / CAST(y AS DECIMAL(38,2))"
        " AS r FROM (VALUES (1.0, 3.0)) t(x, y)")
    assert (typ, v) == ("decimal(38,2)", D("0.33"))
    typ, v = _one(
        spark,
        "SELECT CAST(x AS DECIMAL(38,2)) / CAST(y AS DECIMAL(38,2))"
        " AS r FROM (VALUES (1.0, 8.0)) t(x, y)")
    assert (typ, v) == ("decimal(38,2)", D("0.13"))  # HALF_UP
    # a 38-digit-class value through the exact path stays exact
    typ, v = _one(
        spark,
        "SELECT CAST(x AS DECIMAL(38,0)) / CAST(y AS DECIMAL(38,0))"
        " AS r FROM (VALUES (CAST('99999999999999999999999999999999'"
        " AS DECIMAL(38,0)), 3)) t(x, y)")
    assert (typ, v) == ("decimal(38,0)",
                        D("33333333333333333333333333333333"))
    # precision-loss multiply routes exact too: (38,10)*(20,10) keeps
    # the full scale 20 where Spark would reduce it
    typ, v = _one(
        spark,
        "SELECT CAST(x AS DECIMAL(38,10)) * CAST(y AS DECIMAL(20,10))"
        " AS r FROM (VALUES (1.5, 2.5)) t(x, y)")
    assert (typ, v) == ("decimal(38,20)", D("3.75"))
    # the reference's overflow raise survives the exact path
    with pytest.raises(Exception):
        _one(
            spark,
            "SELECT CAST(x AS DECIMAL(38,10)) * "
            "CAST(x AS DECIMAL(38,10)) AS r FROM (VALUES ("
            "CAST('9999999999999999999999999999.9999999999' "
            "AS DECIMAL(38,10)))) t(x)")


def test_sum_decimal_lands_at_presto_type(spark):
    # DecimalSumAggregation.java: sum(decimal(p,s)) -> decimal(38,s).
    # The template widens a statically-typed argument to (28,s) so
    # Spark's own min(38, p+10) rule produces exactly (38,s) — same
    # accumulator width as the reference, composing with OVER/FILTER.
    for sql, want_t, want_v in [
        ("SELECT sum(CAST(x AS DECIMAL(12,2))) AS s "
         "FROM (VALUES (1.25),(2.25)) t(x)",
         "decimal(38,2)", D("3.50")),
        ("SELECT sum(CAST(x AS DECIMAL(12,2))) OVER () AS s "
         "FROM (VALUES (1.25)) t(x)",
         "decimal(38,2)", D("1.25")),
        ("SELECT sum(CAST(x AS DECIMAL(12,2))) FILTER (WHERE x > 2) "
         "AS s FROM (VALUES (1.25),(2.25)) t(x)",
         "decimal(38,2)", D("2.25")),
        # the revenue shape: sum over a dca-derived (25,4) product
        ("SELECT sum(CAST(x AS DECIMAL(12,2)) * "
         "(1 - CAST(y AS DECIMAL(12,2)))) AS s "
         "FROM (VALUES (100.0, 0.05)) t(x, y)",
         "decimal(38,4)", D("95.0000")),
    ]:
        typ, val = _one(spark, sql)
        assert typ == want_t, (sql, typ)
        assert val == want_v, (sql, val)


def test_avg_decimal_keeps_input_type_half_up(spark):
    # DecimalAverageAggregation.java:197-207: avg over decimal(p,s)
    # KEEPS (p,s) — sum/count ROUND_HALF_UP at scale s. The template
    # widens the argument (k = (34-p)//2 extra scale digits) so the
    # internal average carries enough guard digits that the final
    # HALF_UP at s is provably single-rounding for any realistic
    # group, then casts back to (p,s).
    for sql, want_t, want_v in [
        ("SELECT avg(CAST(x AS DECIMAL(12,2))) AS a "
         "FROM (VALUES (1.00),(2.00),(2.01)) t(x)",
         "decimal(12,2)", D("1.67")),
        # the half-point pins: HALF_UP away from zero at scale s
        ("SELECT avg(CAST(x AS DECIMAL(12,2))) AS a "
         "FROM (VALUES (0.01),(0.02)) t(x)",
         "decimal(12,2)", D("0.02")),
        ("SELECT avg(CAST(x AS DECIMAL(12,2))) AS a "
         "FROM (VALUES (-0.01),(-0.02)) t(x)",
         "decimal(12,2)", D("-0.02")),
    ]:
        typ, val = _one(spark, sql)
        assert typ == want_t, (sql, typ)
        assert val == want_v, (sql, val)
    # window sites consume the OVER clause into the rewrite since
    # r15 (_decimal_avg_window) — the same DecimalAverageAggregation
    # accumulator serves frames, so (p,s) + HALF_UP holds there too
    typ, val = _one(
        spark,
        "SELECT avg(CAST(x AS DECIMAL(12,2))) OVER () AS a "
        "FROM (VALUES (0.01)) t(x)")
    assert typ == "decimal(12,2)"
    assert val == D("0.01")
    # DISTINCT sites stay verbatim (documented residual)
    typ, _ = _one(
        spark,
        "SELECT avg(DISTINCT CAST(x AS DECIMAL(12,2))) AS a "
        "FROM (VALUES (0.01)) t(x)")
    assert typ == "decimal(16,6)"
    # r16 (verdict #6, the non-static decimal class): aggregate
    # RESULTS are statically typed operands now —
    # _wrap_decimal_agg_types exposes sum->(38,s) / avg->(p,s)
    # (DecimalSumAggregation.java / DecimalAverageAggregation.java)
    # to the arithmetic derivation, so outer arithmetic lands the
    # reference type instead of Spark's
    typ, val = _one(
        spark,
        "SELECT sum(CAST(x AS DECIMAL(12,2))) / 3 AS a "
        "FROM (VALUES (1.00),(2.00)) t(x)")
    assert typ == "decimal(38,2)", typ
    assert val == D("1.00"), val
    typ, val = _one(
        spark,
        "SELECT avg(CAST(x AS DECIMAL(12,2))) * CAST(2 AS "
        "DECIMAL(5,0)) AS a FROM (VALUES (1.00),(2.01)) t(x)")
    assert typ == "decimal(17,2)", typ
    assert val == D("3.02"), val
    # r16 (verdict #6): round over a statically-typed decimal
    # COLUMN cast — 1-arg rounds to an INTEGER at
    # decimal(min(38, p-s+min(1,s)), 0) (MathFunctions.java Round
    # constraints) while 2-arg keeps the scale at min(38, p+1)
    # (RoundN constraints)
    for sql, want_t, want_v in [
        ("SELECT round(CAST(x AS DECIMAL(12,2))) AS a "
         "FROM (VALUES (2.50)) t(x)", "decimal(11,0)", D("3")),
        ("SELECT round(CAST(x AS DECIMAL(12,2)), 1) AS a "
         "FROM (VALUES (2.55)) t(x)", "decimal(13,2)", D("2.60")),
        ("SELECT round(CAST(x AS DECIMAL(12,2)), 5) AS a "
         "FROM (VALUES (2.55)) t(x)", "decimal(13,2)", D("2.55")),
        ("SELECT round(CAST(x AS DECIMAL(4,1)), -2) AS a "
         "FROM (VALUES (99.9)) t(x)", "decimal(5,1)", D("100.0")),
    ]:
        typ, val = _one(spark, sql)
        assert typ == want_t, (sql, typ)
        assert val == want_v, (sql, val)
    # r16 ADVICE #3: a COMPOUND argument (cast + cast) must decline —
    # the first CAST's extent doesn't span the argument, and typing
    # the avg from the LAST cast would pin decimal(10,2) where the
    # reference derives the sum type decimal(11,2). Declined sites
    # keep Spark's own derivation (not the last-cast's (10,2)).
    typ, val = _one(
        spark,
        "SELECT avg(CAST(x AS DECIMAL(10,2)) + CAST(y AS "
        "DECIMAL(10,2))) OVER () AS a FROM (VALUES (1.00, 2.00)) "
        "t(x, y)")
    assert typ != "decimal(10,2)", typ
    assert val == D("3.00"), val
