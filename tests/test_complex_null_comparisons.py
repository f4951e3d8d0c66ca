"""Value pins for the null-touching complex-element comparison fold
(frontend._fold_complex_null_comparisons, r14 #2).

The raising side lives in tests/test_error_pin_corpus.py (10 pins,
TestArrayOperators.java:536-1504 + TestRowOperators.java:521). THIS
file pins the other half of the contract: inputs the reference
COMPUTES must keep computing — the fold replays the reference's
element-visit order, so a match that short-circuits before any null
is touched returns a value (ArrayContains.java returns true at the
first EQUAL hit; RowComparisonOperator decides at the first strict
field inequality), and the reference's own VALID rows around the
raise pins (TestArrayOperators.java:1195-1201 array_intersect) stay
green. Also pins the TRY absorption: a statically-raising
contains/array_position inside TRY folds to NULL (Presto TRY
absorbs the NOT_SUPPORTED raise — TryFunction.java)."""

from __future__ import annotations

import pytest

from presto_0_235_spark.sql.frontend import run_sql


def _val(spark, expr):
    return run_sql(spark, f"SELECT {expr} AS v").first().v


CASES = [
    # contains: the match at an earlier position short-circuits
    # before the null element is compared (ArrayContains.java loop)
    ("CONTAINS(ARRAY [ARRAY[1], ARRAY[null]], ARRAY[1])", True),
    ("CONTAINS(ARRAY [ARRAY [1.1, 2.2], ARRAY [3.3, 4.3]], "
     "ARRAY [1.1, 2.2])", True),
    # a null ELEMENT (not a null inside an element) is skipped; no
    # match over non-null elements -> NULL (foundNull)
    ("CONTAINS(ARRAY [ARRAY[2], null], ARRAY[1])", None),
    ("ARRAY_POSITION(ARRAY [ARRAY[1], ARRAY[null]], ARRAY[1])", 1),
    # scalar elements never hit the complex-indeterminate raise
    ("CONTAINS(ARRAY[1, null], 1)", True),
    ("ARRAY_POSITION(ARRAY[null, 2], 2)", 2),
    # row ordering decides at field 0 without visiting the null
    # (RowComparisonOperator.compare visit order)
    ("row(0, CAST(NULL AS INTEGER)) < row(1, 2)", True),
    ("row(2, CAST(NULL AS INTEGER)) < row(1, 2)", False),
    # the reference's own valid rows next to the intersect raise
    # pins (TestArrayOperators.java:1195-1201): hash-disjoint
    # null-field rows never reach an EQUAL call
    ("CARDINALITY(ARRAY_INTERSECT(ARRAY[(123, 'abc'), (123, 'abc')],"
     " ARRAY[(123, 'abc'), (123, NULL)]))", 1),
    ("CARDINALITY(ARRAY_INTERSECT(ARRAY[(123, 'abc')], "
     "ARRAY[(123, NULL)]))", 0),
    # TRY absorbs the statically-known raise to NULL
    ("TRY(CONTAINS(ARRAY [ARRAY [1.1, null]], ARRAY [1.1, null]))",
     None),
    ("TRY(ARRAY_POSITION(ARRAY [ARRAY[null]], ARRAY[1]))", None),
    # literal complex equality folds with Presto's 3-valued
    # semantics (RowEqualOperator / ArrayEqualOperator /
    # MapEqualOperator): NULL when undecided, FALSE on a decided
    # mismatch, and MAP equality computes where Spark's analyzer
    # refuses the type outright
    ("row(1, CAST(NULL AS INTEGER)) = row(1, 2)", None),
    ("row(2, CAST(NULL AS INTEGER)) = row(1, 2)", False),
    ("ARRAY[1, null] = ARRAY[1, null]", None),
    ("ARRAY[1, null] = ARRAY[2, null]", False),
    ("ARRAY[1, null] <> ARRAY[2, null]", True),
    ("MAP(ARRAY[1, 2], ARRAY['a', 'b']) = "
     "MAP(ARRAY[2, 1], ARRAY['b', 'a'])", True),
    ("MAP(ARRAY[1], ARRAY[NULL]) = MAP(ARRAY[1], ARRAY[NULL])",
     None),
    ("row(TRUE, ARRAY[1], MAP(ARRAY[1], ARRAY[2])) = "
     "row(TRUE, ARRAY[1], MAP(ARRAY[1], ARRAY[2]))", True),
    # r15 (r14 ADVICE high): the fold's CAST branch must replay the
    # reference's cast rounding instead of treating it as identity —
    # CAST(1.7 AS INTEGER) is HALF_UP 2 (DecimalCasts.java), so the
    # match short-circuits before the null and ROW equality decides
    # TRUE (previously a wrong raise and a wrong FALSE)
    ("CONTAINS(ARRAY[ARRAY[2], ARRAY[null]], "
     "ARRAY[CAST(1.7 AS INTEGER)])", True),
    ("ROW(CAST(1.7 AS INTEGER)) = ROW(2)", True),
    ("ROW(CAST(-1.7 AS INTEGER)) = ROW(-2)", True),
    ("ROW(CAST(1.5 AS INTEGER)) = ROW(2)", True),
    ("CONTAINS(ARRAY[ARRAY[3], ARRAY[null]], "
     "ARRAY[CAST(2.5 AS INTEGER)])", True),
    # r15 #2 (r14 ADVICE low, completed): char(n) comparison pads to
    # the common length (Presto CharType) — the fold runs BEFORE the
    # typed-literal lowering erases CHAR-ness and replays the pad
    # via _CncChar, so these land on the reference's values instead
    # of Spark's unpadded string compare
    ("ROW(CHAR 'ab') = ROW(CHAR 'ab ')", True),
    ("ROW(CHAR 'ab', 1) <> ROW(CHAR 'ab  ', 1)", False),
    ("ARRAY[CHAR 'x '] = ARRAY[CHAR 'x']", True),
    ("ROW(CHAR 'ab') = ROW(CHAR 'ac')", False),
]


@pytest.mark.parametrize(
    "expr,want", CASES, ids=[f"{i:02d}" for i in range(len(CASES))]
)
def test_valid_inputs_keep_computing(spark, expr, want):
    assert _val(spark, expr) == want
