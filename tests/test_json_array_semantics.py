"""r17 — token-kind-aware json_array_* semantics.

The r17 value-pin sweep over TestJsonFunctions.java surfaced four
divergence classes in the json_array_* family; these tests pin the
fixes, including the COLUMN-operand spellings the literal pins can't
cover.

Reference pins cited per case:
 - json_array_length returns BIGINT; non-array/malformed/NULL -> NULL
   (JsonFunctions.java jsonArrayLength; TestJsonFunctions.java:57-67)
 - json_array_contains dispatches on the needle's type and matches
   only same-kind tokens: a bigint needle only INTEGER number tokens
   (so '[1.0]' does not contain 1 — TestJsonFunctions.java:100,108),
   a double needle only FLOAT tokens, a boolean needle only
   true/false, a varchar needle only strings compared unescaped
   (JsonFunctions.java:199-369)
 - json_array_get: negative indexes count from the end, out-of-range
   / Long.MIN_VALUE / null index / non-array -> NULL, a JSON null
   ELEMENT -> SQL NULL while the STRING "null" element survives,
   strings come back unquoted, nested values in compact form
   (JsonFunctions.java:375-431; TestJsonFunctions.java:170-246)
"""

from __future__ import annotations

import pytest

from presto_0_235_spark.sql.frontend import run_sql


def _one(spark, sql):
    rows = run_sql(spark, sql).collect()
    assert len(rows) == 1
    return rows[0][0]


# ---------------------------------------------------------------------------
# json_array_length
# ---------------------------------------------------------------------------

def test_json_array_length_is_bigint(spark):
    df = run_sql(spark, "SELECT json_array_length('[1, 2, 3]') AS n")
    assert dict(df.dtypes)["n"] == "bigint"
    assert df.collect()[0][0] == 3


def test_json_array_length_non_array_and_null(spark):
    assert _one(spark, "SELECT json_array_length('{\"a\": 1}')") is None
    assert _one(spark, "SELECT json_array_length('')") is None
    assert _one(spark, "SELECT json_array_length(null)") is None


def test_json_array_length_column(spark):
    # column operand through a derived table
    assert _one(
        spark,
        "SELECT json_array_length(j) FROM "
        "(VALUES ('[2, 4, {\"a\": [8, 9]}, [], [5], 4]')) t(j)",
    ) == 6


# ---------------------------------------------------------------------------
# json_array_contains — token-kind dispatch
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "expr,expected",
    [
        # bigint needle matches only INTEGER tokens
        ("json_array_contains('[1.0]', 1)", False),
        ("JSON_ARRAY_CONTAINS(JSON '[1.0]', 1)", False),
        ("json_array_contains('[1]', 1)", True),
        ("json_array_contains('[1, \"foo\", null, \"8\"]', 8)", False),
        # double needle matches only FLOAT tokens
        ("json_array_contains('[1]', 1e0)", False),
        ("json_array_contains('[1.0]', 1e0)", True),
        ("json_array_contains('[1.5]', 1.5e0)", True),
        # decimal needle rides the double overload
        ("json_array_contains('[1.5]', 1.5)", True),
        ("json_array_contains('[9.35]', 9.37)", False),
        # non-finite double needle -> false before parsing
        ("json_array_contains('[1.0]', nan())", False),
        ("json_array_contains('[1.0]', infinity())", False),
        # boolean needle matches only true/false tokens
        ("json_array_contains('[true]', true)", True),
        ("json_array_contains('[1]', true)", False),
        ("json_array_contains('[false, false, true]', false)", True),
        # varchar needle matches only string tokens, unescaped compare
        ("json_array_contains('[\"foo\"]', 'foo')", True),
        ("json_array_contains('[1]', '1')", False),
        ("json_array_contains('[\"8\"]', '8')", True),
        # JSON null elements never match; shape errors -> NULL
        ("json_array_contains('[null]', 'null')", False),
        ("json_array_contains('{\"a\": 1}', 1)", None),
        ("json_array_contains('', 1)", None),
        ("json_array_contains(null, 1)", None),
        ("json_array_contains('[1]', CAST(NULL AS BIGINT))", None),
    ],
)
def test_json_array_contains_kinds(spark, expr, expected):
    assert _one(spark, f"SELECT {expr}") is expected


def test_json_array_contains_column_operands(spark):
    # doc and needle both columns: kind dispatch must survive the
    # non-literal spelling
    assert _one(
        spark,
        "SELECT json_array_contains(j, n) FROM "
        "(VALUES ('[1.0]', 1)) t(j, n)",
    ) is False
    assert _one(
        spark,
        "SELECT json_array_contains(j, n) FROM "
        "(VALUES ('[1, 7]', 7)) t(j, n)",
    ) is True


# ---------------------------------------------------------------------------
# json_array_get
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "expr,expected",
    [
        # positive / negative indexes (TestJsonFunctions.java:170-188)
        ("json_array_get('[2, 7, 4]', 1)", "7"),
        ("json_array_get('[2, 7, 4, 6, 8, 1, 0]', -1)", "0"),
        ("json_array_get('[2, 7, 4, 6, 8, 1, 0]', -7)", "2"),
        ("json_array_get('[2, 7, 4, 6, 8, 1, 0]', -8)", None),
        ("json_array_get('[1, 3, 2]', 3)", None),
        ("json_array_get('[]', 0)", None),
        # null index / Long.MIN / malformed (:188-193)
        ("json_array_get('[1]', null)", None),
        ("json_array_get('', 1)", None),
        ("json_array_get('', -1)", None),
        ("json_array_get('[1]', -9223372036854775807 - 1)", None),
        # JSON null element -> SQL NULL, string "null" survives
        ("json_array_get('[\"jhfa\", null]', 1)", None),
        ("json_array_get('[null]', 0)", None),
        ("json_array_get('[\"null\"]', 0)", "null"),
        # strings unquoted, raw double text, nested compact form
        ("json_array_get('[\"jhfa\"]', 0)", "jhfa"),
        ("json_array_get('[\"\"]', 0)", ""),
        ("json_array_get('[3.14]', 0)", "3.14"),
        ("json_array_get('[1.0]', -1)", "1.0"),
        ("json_array_get('[{\"a\": [8, 9]}]', 0)", '{"a":[8,9]}'),
        # JSON typed-literal spelling
        ("JSON_ARRAY_GET(JSON '[2, 7, 4]', 1)", "7"),
        ("JSON_ARRAY_GET(JSON '[3.14, null]', 1)", None),
        # not an array
        ("json_array_get('{\"a\": 1}', 0)", None),
    ],
)
def test_json_array_get(spark, expr, expected):
    got = _one(spark, f"SELECT {expr}")
    if expected is None:
        assert got is None
    else:
        assert got == expected


def test_json_array_get_column_index(spark):
    # non-literal index: the dynamic get_json_object path
    assert _one(
        spark,
        "SELECT json_array_get('[\"a\", \"b\", \"c\"]', i) FROM "
        "(VALUES (2)) t(i)",
    ) == "c"
    assert _one(
        spark,
        "SELECT json_array_get(j, i) FROM "
        "(VALUES ('[10, 20, 30]', -2)) t(j, i)",
    ) == "20"
