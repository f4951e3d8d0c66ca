"""Cross-engine determinism helpers.

The correctness gate hashes cell values from Spark and DuckDB runs of
"the same" query. Floating-point aggregation is order-dependent, and a
distributed engine guarantees no addition order — so any query whose
output must hash-match an oracle routes money/measure sums through
FIXED-POINT arithmetic:

  double value --round to the 1e-6 grid--> scaled BIGINT
  --SUM (exact integer arithmetic, commutative)--> BIGINT
  --one double division--> double

Both engines perform the double->grid rounding on identical IEEE-754
inputs, integer addition is exact in any order, and the final
long->double conversion + division are correctly-rounded IEEE ops —
the result is bit-identical regardless of partitioning, parallelism,
or engine. This mirrors what Presto itself does for money types —
TPC-H prices are DECIMAL(15,2) there (reference
SPI/type/ShortDecimalType, UnscaledDecimal128Arithmetic.java, which
ALSO keeps short decimals as scaled longs); the driver fixtures
degrade them to double (FIXTURES.md), so the fixed-point hop restores
exactness.

Why scaled long instead of Spark DECIMAL(18,6): identical values and
identical guarantees (same 1e-6 grid, same exact commutative sum),
but long aggregation stays in Tungsten's primitive fast path —
measured ~4x faster than decimal aggregation on the q1 shape, which
makes the exactness hop nearly free vs plain double sums.

Bounds: scale 6 in an int64 holds |sum| < 9.2e12 — far above any
per-group money sum in TPC-H at any SF (global revenue at SF 300 is
~6.6e12; per-GROUP sums, which is what these helpers aggregate, are
orders of magnitude smaller). The session's ANSI mode makes an
overflow raise loudly rather than wrap; for a hypothetical
whole-table sum beyond 9.2e12, switch the helper to DECIMAL(38,6) —
one line, same contract.

The fixture money values carry <=2 true decimals, so 3-factor
products carry <=6 — rounding at the values' exact grid can never hit
a half-tie, so Spark's and DuckDB's double rounding agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 1e-6 grid: fixture money carries <=2 true decimals, 3-factor
# products <=6. One shared constant for both engines' expressions.
MONEY_SCALE = 1_000_000

# Decimal type for contexts where a typed fixed-point COLUMN is the
# right tool (e.g. running window sums, where each prefix must be
# exact and there is no single final division point).
MONEY = "decimal(18,6)"


def _scaled_long(c: Column) -> Column:
    """round(x * MONEY_SCALE) as a BIGINT, via sign-aware floor.

    Value-identical to F.round(...).cast("long") on every money-grid
    input (r17 probe: all fixture double columns at all SFs, the
    2-/3-factor money products, and a 4M-value synthetic grid in
    0.5e-6 steps — exact .5 ties and negatives included — 0
    mismatches; pinned in tests/test_compat_rounding.py), but ~2x
    faster end-to-end on the q1 aggregation shape: Spark's ROUND on
    doubles allocates a BigDecimal per value
    (Round -> BigDecimal.valueOf(x).setScale(0, HALF_UP)), while
    floor(x + 0.5) stays primitive inside WholeStageCodegen. Both
    forms implement round-half-away-from-zero at the boundary; they
    could only diverge where the shortest-decimal and binary
    midpoints disagree, strictly off the 1e-6 money grid (header
    note: fixture money carries <=6 true decimals, error ~1e-4 ulps
    from any boundary).
    """
    x = c * MONEY_SCALE
    return F.when(c >= 0, F.floor(x + F.lit(0.5))).otherwise(
        -F.floor(-x + F.lit(0.5))
    )


def _scaled_long_sql(expr: str) -> str:
    """Spark-SQL spelling of _scaled_long over a SQL sub-expression.

    Literal-for-literal the same tree the Column form builds: int
    literal MONEY_SCALE (the analyzer promotes it to double exactly
    as Column * int does), `0.5D` / double-suffixed where the Column
    form uses F.lit(0.5) (a bare SQL `0.5` would parse as
    DECIMAL(1,1) and change the coercion chain). Plan-identity with
    the Column form is pinned in tests/test_compat_rounding.py.
    """
    return (
        f"CASE WHEN ({expr}) >= 0 THEN FLOOR(({expr}) * {MONEY_SCALE} + 0.5D) "
        f"ELSE -FLOOR(-(({expr}) * {MONEY_SCALE}) + 0.5D) END"
    )


def dec_sum(col: Column | str, alias: str) -> Column:
    """Order-independent SUM of a double column, returned as double.

    CONTRACT: a string argument is parsed as a Spark-SQL EXPRESSION,
    not resolved as a column name (r17 change). A plain identifier
    parses as itself, so ``dec_sum("l_quantity", ...)`` is unchanged,
    but a name that is not a bare identifier (spaces, operators)
    must be backtick-quoted by the caller or passed as
    ``F.col(name)`` — ``dec_sum("a b", ...)`` parses as ``a AS b``.

    The expression path exists because the Column spelling costs ~60
    Py4J driver round trips per aggregate (every operator/literal is
    a JVM call) while the parsed spelling costs one — measured
    ~0.18 s/build on the 7-aggregate q1 shape (guide §5: driver-side
    work). Both spellings analyze to the identical plan (pinned in
    tests/test_compat_rounding.py).
    """
    if isinstance(col, str):
        return F.expr(
            f"CAST(SUM({_scaled_long_sql(col)}) AS DOUBLE)"
            f" / {float(MONEY_SCALE)}D"
        ).alias(alias)
    return (
        F.sum(_scaled_long(col)).cast("double") / F.lit(float(MONEY_SCALE))
    ).alias(alias)


def dec_avg(col: Column | str, alias: str) -> Column:
    """Order-independent AVG of a double column, returned as double.

    exact scaled sum, then two double divisions — identical on both
    engines because numerator and denominator are exact. String
    arguments take the same single-`expr` fast path (and the same
    expression CONTRACT) as dec_sum; the COUNT argument is
    parenthesized exactly like _scaled_long_sql's so both uses of
    the expression parse with one shape.
    """
    if isinstance(col, str):
        return F.expr(
            f"CAST(SUM({_scaled_long_sql(col)}) AS DOUBLE)"
            f" / {float(MONEY_SCALE)}D / COUNT(({col}))"
        ).alias(alias)
    return (
        F.sum(_scaled_long(col)).cast("double")
        / F.lit(float(MONEY_SCALE))
        / F.count(col)
    ).alias(alias)


def oracle_dec_sum(expr: str, alias: str) -> str:
    """DuckDB-side twin of dec_sum."""
    return (
        f"CAST(SUM(CAST(round(({expr}) * {MONEY_SCALE}) AS BIGINT)) AS DOUBLE)"
        f" / {MONEY_SCALE}.0 AS {alias}"
    )


def oracle_dec_avg(expr: str, alias: str) -> str:
    """DuckDB-side twin of dec_avg."""
    return (
        f"CAST(SUM(CAST(round(({expr}) * {MONEY_SCALE}) AS BIGINT)) AS DOUBLE)"
        f" / {MONEY_SCALE}.0 / COUNT({expr}) AS {alias}"
    )
