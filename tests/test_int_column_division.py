"""Column-operand INTEGRAL division + catalog-aware column typing —
the r14 second-half conversion.

Presto '/' on integral operands is truncating integral division per
the reference's OWN TESTS (TestIntegerOperators.testDivide: INTEGER
'37' / INTEGER '17' = 2; TestBigintOperators:90 and the MIN/-1
overflow raise). Spark's '/' always promotes to DOUBLE — the
long-standing documented divergence for column operands. Two pieces
close it:

 - frontend._int_div_pass rewrites statically-integral '/' sites
   (CAST(... AS <int type>) forms, COUNT(...) calls, integer
   literals, parenthesized groups) to CAST((a) DIV (b) AS <wider>),
   Spark's truncating integral division with the same ANSI raise
   discipline (division by zero, MIN/-1 overflow);
 - frontend._annotate_numeric_columns resolves BARE column references
   against the registered catalog and wraps arithmetic-adjacent
   integral/REAL/DECIMAL columns in CAST(col AS <its own type>)
   no-ops, making them statically typed for this pass AND for the
   r14 decimal/REAL column rewrites.

The annotation's safety rules (shadowing aliases, ambiguity,
unresolvable refs, end-of-statement adjacency) are pinned here too —
a wrong annotation would be a wrong VALUE, so the declines are as
load-bearing as the rewrites.
"""

from __future__ import annotations

import decimal

import pytest

from presto_0_235_spark.catalog import register_views
from presto_0_235_spark.sql.frontend import (
    _annotate_numeric_columns,
    run_sql,
)

D = decimal.Decimal
SF_DIR = __import__("tests.conftest", fromlist=["SF_DIR"]).SF_DIR


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    register_views(spark, SF_DIR)


def _one(spark, sql):
    df = run_sql(spark, sql)
    row = df.collect()[0]
    return df.schema[0].dataType.simpleString(), row[0]


# ---------------------------------------------------------------------------
# integral division over catalog columns
# ---------------------------------------------------------------------------


def test_bare_int_columns_divide_truncating(spark):
    # TestIntegerOperators.testDivide semantics on real table columns
    df = run_sql(
        spark,
        "SELECT l_orderkey, l_linenumber, "
        "l_orderkey / l_linenumber AS q "
        "FROM lineitem WHERE l_orderkey < 40",
    )
    assert df.schema["q"].dataType.simpleString() == "bigint"
    for r in df.collect():
        want = abs(r.l_orderkey) // abs(r.l_linenumber)
        if (r.l_orderkey >= 0) != (r.l_linenumber >= 0):
            want = -want
        assert r.q == want


def test_negative_dividend_truncates_toward_zero(spark):
    spark.sql(
        "SELECT CAST(-7 AS BIGINT) AS x, CAST(2 AS BIGINT) AS y"
    ).createOrReplaceTempView("t_int_neg")
    t, v = _one(spark, "SELECT x / y FROM t_int_neg")
    assert (t, v) == ("bigint", -3)  # floor would give -4


def test_mixed_column_literal_divisor(spark):
    # INT column / integer literal: rank widens to the larger side
    t, v = _one(
        spark,
        "SELECT l_linenumber / 2 FROM lineitem "
        "WHERE l_orderkey = 3 AND l_linenumber = 3",
    )
    assert (t, v) == ("int", 1)
    t, v = _one(
        spark,
        "SELECT 100 / l_linenumber FROM lineitem "
        "WHERE l_orderkey = 3 AND l_linenumber = 3",
    )
    assert (t, v) == ("int", 33)


def test_parenthesized_int_expression_divides(spark):
    # (a - b) / c: the group type-derives as an integral chain
    df = run_sql(
        spark,
        "SELECT (l_partkey - l_suppkey) / l_linenumber AS q, "
        "l_partkey, l_suppkey, l_linenumber "
        "FROM lineitem WHERE l_orderkey < 40",
    )
    assert df.schema["q"].dataType.simpleString() == "bigint"
    for r in df.collect():
        num = r.l_partkey - r.l_suppkey
        want = abs(num) // abs(r.l_linenumber)
        if (num >= 0) != (r.l_linenumber >= 0):
            want = -want
        assert r.q == want, (num, r.l_linenumber)


def test_literal_group_divides_with_truncation(spark):
    # a computed literal group is NOT the literal fold's domain —
    # the pass rewrites it (and /0 raises like the reference)
    t, v = _one(spark, "SELECT (7 - 3) / 2 FROM lineitem LIMIT 1")
    assert (t, v) == ("int", 2)
    t, v = _one(spark, "SELECT (8 - 1) / 2 FROM lineitem LIMIT 1")
    assert (t, v) == ("int", 3)


def test_count_star_is_a_bigint_operand(spark):
    t, v = _one(spark, "SELECT count(*) / 7 FROM lineitem")
    n = run_sql(spark, "SELECT count(*) AS n FROM lineitem").first().n
    assert (t, v) == ("bigint", n // 7)


def test_aggregate_operands_divide_truncating(spark):
    # SUM(integral) is BIGINT in both engines; sum(x)/count(*) — the
    # average idiom — is truncating integral division in Presto
    df = run_sql(
        spark,
        "SELECT sum(l_linenumber) / count(*) AS a, "
        "sum(l_orderkey) / 100 AS b, "
        "max(l_linenumber) / 2 AS m FROM lineitem",
    )
    assert df.schema["a"].dataType.simpleString() == "bigint"
    assert df.schema["b"].dataType.simpleString() == "bigint"
    assert df.schema["m"].dataType.simpleString() == "int"
    row = run_sql(
        spark,
        "SELECT sum(l_linenumber) AS s, count(*) AS n, "
        "max(l_linenumber) AS mx FROM lineitem",
    ).first()
    got = df.first()
    assert got.a == row.s // row.n
    assert got.m == row.mx // 2


def test_values_inline_table_types_statically(spark):
    # (VALUES ...) t(cols): column types derive from the literal
    # cells, so Presto's integer '/' applies without a catalog entry
    df = run_sql(
        spark,
        "SELECT x / y AS q FROM (VALUES (7, 2), (-7, 2), (9, 4)) "
        "t(x, y) ORDER BY q",
    )
    assert df.schema["q"].dataType.simpleString() == "int"
    assert [r.q for r in df.collect()] == [-3, 2, 3]
    # TRY over a VALUES-typed division: NULL on zero, truncation on
    # the valid rows (AbstractTestQueries.java:5034 testTry)
    df = run_sql(
        spark,
        "SELECT try(1 / x) AS q FROM (VALUES 0, 1, 2) t(x)",
    )
    assert sorted((r.q is None, r.q) for r in df.collect()) == [
        (False, 0), (False, 1), (True, None)]
    # mixed int/decimal cells unify to the decimal coercion
    df = run_sql(
        spark,
        "SELECT x * 2 AS m FROM (VALUES 1.5, 2) t(x) ORDER BY m",
    )
    # x unifies to decimal(11,1) (int 2 coerces as decimal(10,0));
    # multiply derives (p1+p2, s1+s2) = (21, 1)
    assert df.schema["m"].dataType.simpleString() == "decimal(21,1)"
    # a signed divisor parses (TestBigintOperators.java:259 spelling)
    with pytest.raises(Exception):
        run_sql(
            spark,
            "SELECT (-9223372036854775807 - 1) / -1",
        ).collect()


def test_decimal_literal_over_count_derives_presto_type(spark):
    # AbstractTestAggregations.java:354 testAggregationImplicitCoercion
    # — DECIMAL '1.0' / bigint count is decimal(2,1) with HALF_UP in
    # the reference (its own harness rounds the H2 expectation to
    # that scale, H2QueryRunner.java:375)
    df = run_sql(
        spark,
        "SELECT 1.0 / COUNT(*) AS q, COUNT(*) + 0.5 AS p "
        "FROM lineitem WHERE l_orderkey = 3",
    )
    assert df.schema["q"].dataType.simpleString() == "decimal(2,1)"
    assert df.schema["p"].dataType.simpleString() == "decimal(21,1)"
    n = run_sql(
        spark,
        "SELECT count(*) AS n FROM lineitem WHERE l_orderkey = 3",
    ).first().n
    row = df.first()
    assert row.q == D(20 + n) // D(2 * n) / 10
    assert row.p == D(n) + D("0.5")


def test_sum_int_with_decimal_literal_is_a_decimal_op(spark):
    df = run_sql(
        spark,
        "SELECT sum(l_linenumber) * 2.5 AS s FROM lineitem "
        "WHERE l_orderkey = 3",
    )
    assert df.schema["s"].dataType.simpleString() == "decimal(21,1)"


def test_windowed_aggregate_operands_divide(spark):
    # the OVER (...) suffix is absorbed into the operand — a windowed
    # COUNT keeps BIGINT in both engines, so the division is integral
    # (and 1.0 / count(*) OVER () derives Presto's decimal(2,1))
    df = run_sql(
        spark,
        "SELECT CAST(l_orderkey AS BIGINT) / count(*) OVER () AS r, "
        "1.0 / count(*) OVER () AS q, "
        "count(*) OVER () / 7 AS c "
        "FROM lineitem WHERE l_orderkey < 5",
    )
    assert df.schema["r"].dataType.simpleString() == "bigint"
    assert df.schema["q"].dataType.simpleString() == "decimal(2,1)"
    assert df.schema["c"].dataType.simpleString() == "bigint"


def test_filtered_aggregate_divisor_left_to_spark(spark):
    # a FILTER (WHERE ...) suffix is not absorbed — the site declines
    # and keeps Spark's double division (documented residual)
    df = run_sql(
        spark,
        "SELECT sum(l_linenumber) FILTER (WHERE l_linenumber > 1) "
        "/ 2 AS f FROM lineitem",
    )
    assert df.schema["f"].dataType.simpleString() == "double"


def test_sum_of_double_column_untouched(spark):
    df = run_sql(
        spark,
        "SELECT sum(l_quantity) / count(*) AS avgq FROM lineitem",
    )
    assert df.schema["avgq"].dataType.simpleString() == "double"


def test_chain_divides_left_associatively(spark):
    spark.sql(
        "SELECT CAST(100 AS BIGINT) AS a, CAST(7 AS BIGINT) AS b, "
        "CAST(2 AS BIGINT) AS c"
    ).createOrReplaceTempView("t_int_chain")
    t, v = _one(spark, "SELECT a / b / c FROM t_int_chain")
    # (100 / 7) / 2 = 14 / 2 = 7 (NOT 100 / 3.5)
    assert (t, v) == ("bigint", 7)


def test_division_by_zero_raises_and_try_absorbs(spark):
    spark.sql(
        "SELECT CAST(5 AS INT) AS x, CAST(0 AS INT) AS z"
    ).createOrReplaceTempView("t_int_z")
    with pytest.raises(Exception):
        run_sql(spark, "SELECT x / z FROM t_int_z").collect()
    assert run_sql(
        spark, "SELECT TRY(x / z) FROM t_int_z"
    ).first()[0] is None
    # TRY of a NON-raising integral divide still truncates
    assert run_sql(
        spark, "SELECT TRY(x / CAST(2 AS INT)) FROM t_int_z"
    ).first()[0] == 2


def test_bigint_min_over_minus_one_overflow_raises(spark):
    # TestBigintOperators.testOverflowDivide, column-operand form
    spark.sql(
        "SELECT CAST(-9223372036854775808 AS BIGINT) AS mn, "
        "CAST(-1 AS BIGINT) AS m1"
    ).createOrReplaceTempView("t_int_min")
    with pytest.raises(Exception):
        run_sql(spark, "SELECT mn / m1 FROM t_int_min").collect()


def test_int_column_with_decimal_literal_is_a_decimal_op(spark):
    # integral coerces to decimal(10,0)/(19,0) against a DECIMAL
    # operand (Presto TypeRegistry); divide derives
    # (p1+s2+max(0,s2-s1), max(s1,s2)) with HALF_UP
    t, v = _one(
        spark,
        "SELECT l_linenumber / 2.5 FROM lineitem "
        "WHERE l_orderkey = 3 AND l_linenumber = 3",
    )
    assert (t, v) == ("decimal(12,1)", D("1.2"))
    t, v = _one(
        spark,
        "SELECT l_linenumber * 1.5 FROM lineitem "
        "WHERE l_orderkey = 3 AND l_linenumber = 3",
    )
    # multiply: (p1+p2, s1+s2) = (10+2, 0+1)
    assert (t, v) == ("decimal(12,1)", D("4.5"))


# ---------------------------------------------------------------------------
# catalog annotation feeding the decimal / REAL column rewrites
# ---------------------------------------------------------------------------


def test_bare_decimal_columns_get_reference_derivation(spark):
    spark.sql(
        "SELECT CAST(1.0 AS DECIMAL(12,2)) AS a, "
        "CAST(3.0 AS DECIMAL(12,2)) AS b"
    ).createOrReplaceTempView("t_dec_bare")
    df = run_sql(spark, "SELECT a / b AS q, a * b AS m FROM t_dec_bare")
    assert df.schema["q"].dataType.simpleString() == "decimal(14,2)"
    assert df.schema["m"].dataType.simpleString() == "decimal(24,4)"
    row = df.first()
    assert row.q == D("0.33")  # HALF_UP at scale 2, not Spark's 0.333333
    assert row.m == D("3.0000")


def test_bare_real_columns_divide_in_float32_ieee(spark):
    spark.sql(
        "SELECT CAST(-0.0 AS FLOAT) AS f1, CAST(0.0 AS FLOAT) AS f2, "
        "CAST(12.34 AS FLOAT) AS f3, CAST(56.78 AS FLOAT) AS f4"
    ).createOrReplaceTempView("t_real_bare")
    df = run_sql(spark, "SELECT f1 / f2 AS a, f3 / f4 AS b FROM t_real_bare")
    assert df.schema["a"].dataType.simpleString() == "float"
    row = df.first()
    assert row.a != row.a  # -0.0f / 0.0f -> NaN (TestRealOperators:76)
    import struct

    f32 = struct.unpack(
        "f", struct.pack("f",
                         struct.unpack("f", struct.pack("f", 12.34))[0]
                         / struct.unpack("f", struct.pack("f", 56.78))[0])
    )[0]
    assert row.b == pytest.approx(f32, abs=0.0)


# ---------------------------------------------------------------------------
# annotation safety declines
# ---------------------------------------------------------------------------


def test_select_alias_shadow_blocks_annotation(spark):
    # the alias l_linenumber is a DOUBLE expression; annotating the
    # ORDER BY reference with the table column's INT type would be a
    # wrong value — the shadow scan must skip it
    sql = ("SELECT l_quantity / 2 AS l_linenumber FROM lineitem "
           "ORDER BY l_linenumber / 2 LIMIT 1")
    out = _annotate_numeric_columns(spark, sql)
    assert "CAST(l_linenumber" not in out
    df = run_sql(spark, sql)
    assert df.schema[0].dataType.simpleString() == "double"


def test_implicit_alias_shadow_blocks_annotation(spark):
    sql = ("SELECT l_quantity / 2 l_linenumber FROM lineitem "
           "ORDER BY l_linenumber / 2 LIMIT 1")
    out = _annotate_numeric_columns(spark, sql)
    assert "CAST(l_linenumber" not in out


def test_lambda_parameter_shadow_blocks_annotation(spark):
    sql = ("SELECT transform(ARRAY[1,2], l_linenumber -> "
           "l_linenumber / 2) FROM lineitem LIMIT 1")
    out = _annotate_numeric_columns(spark, sql)
    assert "CAST(l_linenumber" not in out


def test_cte_alias_resolves_for_unqualified_annotation(spark):
    # r17 (r16 verdict #1): a first-level CTE over a catalog table
    # PROPAGATES its item types — the bare output column annotates
    # with the base column's type instead of blocking the pass
    # (pre-r17 this test pinned the conservative decline)
    sql = ("WITH m AS (SELECT l_orderkey AS k FROM lineitem) "
           "SELECT k / 2 FROM m")
    out = _annotate_numeric_columns(spark, sql)
    assert "CAST(k AS BIGINT) / 2" in out
    df = run_sql(spark, sql)
    # Presto integer division stays integral
    assert df.schema[df.columns[0]].dataType.simpleString() == "bigint"


def test_unresolvable_cte_still_blocks_unqualified_annotation(spark):
    # a CTE the propagation can't type (set-op body) keeps the
    # conservative decline for bare names
    sql = ("WITH m AS (SELECT l_orderkey AS k FROM lineitem UNION ALL "
           "SELECT o_orderkey FROM orders) SELECT k / 2 FROM m")
    out = _annotate_numeric_columns(spark, sql)
    assert "CAST(k" not in out


def test_qualified_reference_annotates_via_alias(spark):
    sql = ("SELECT l.l_orderkey / l.l_linenumber AS q FROM lineitem l "
           "WHERE l.l_orderkey = 3")
    out = _annotate_numeric_columns(spark, sql)
    assert "CAST(l.l_orderkey AS BIGINT)" in out
    df = run_sql(spark, sql)
    assert df.schema["q"].dataType.simpleString() == "bigint"


def test_end_of_statement_identifier_untouched(spark):
    # regression pin for the empty-rest adjacency bug: a trailing
    # GROUP BY key is NOT arithmetic-adjacent
    sql = ("SELECT o_custkey, 1.0 / COUNT(*) AS f FROM orders "
           "GROUP BY o_custkey")
    out = _annotate_numeric_columns(spark, sql)
    assert out.rstrip().endswith("GROUP BY o_custkey")
    run_sql(spark, sql).collect()  # must analyze


def test_ambiguous_name_across_tables_blocks_annotation(spark):
    spark.sql("SELECT CAST(1 AS INT) AS amb").createOrReplaceTempView(
        "t_amb_a")
    spark.sql("SELECT CAST(1 AS BIGINT) AS amb, 2 AS k"
              ).createOrReplaceTempView("t_amb_b")
    sql = ("SELECT amb / 2 FROM t_amb_a "
           "JOIN t_amb_b ON amb = k")  # nonsense query, text-only check
    out = _annotate_numeric_columns(spark, sql)
    assert "CAST(amb" not in out


def test_double_columns_are_never_annotated(spark):
    sql = ("SELECT l_extendedprice * (1 - l_discount) AS rev "
           "FROM lineitem LIMIT 1")
    out = _annotate_numeric_columns(spark, sql)
    assert out == sql
