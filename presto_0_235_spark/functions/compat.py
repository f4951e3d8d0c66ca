"""Cross-engine determinism helpers.

The correctness gate hashes cell values from Spark and DuckDB runs of
"the same" query. Floating-point aggregation is order-dependent, and a
distributed engine guarantees no addition order — so any query whose
output must hash-match an oracle routes money/measure sums through
fixed-point DECIMAL:

  double value --cast--> DECIMAL(18,6) --SUM (exact, commutative)-->
  DECIMAL --cast--> double

Both engines perform the double->decimal rounding on identical IEEE-754
inputs, decimal addition is exact, and the final cast is deterministic:
the result is bit-identical regardless of partitioning, parallelism, or
engine. This mirrors what Presto itself does for money types — TPC-H
prices are DECIMAL(15,2) there (reference SPI/type/ShortDecimalType,
UnscaledDecimal128Arithmetic.java); the driver fixtures degrade them to
double (FIXTURES.md), so the fixed-point hop restores exactness.

Scale note: decimal aggregation is ~2x double aggregation per value but
identically parallel (partial + final HashAggregate); at 100 TB the
plan shape is unchanged. Perf-critical paths that do not need
hash-exactness (bench.py) use plain double sums.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 18 digits / 6 decimals holds every fixture sum comfortably
# (sf0.1 revenue ~1e10; decimal(18,6) caps at 1e12). Scale 6 matters:
# fixture money values carry <=2 true decimals, so 3-factor products
# carry <=6 — rounding at the values' exact grid can never hit a
# half-tie, so Spark (HALF_UP) and DuckDB (half-even) double->decimal
# casts agree bit-for-bit.
MONEY = "decimal(18,6)"


def dec_sum(col: Column | str, alias: str) -> Column:
    """Order-independent SUM of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(MONEY)).cast("double").alias(alias)


def dec_avg(col: Column | str, alias: str) -> Column:
    """Order-independent AVG of a double column, returned as double.

    sum(decimal)/count: one double division at the end — identical on
    both engines because numerator and denominator are exact.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(MONEY)).cast("double") / F.count(c)
    ).alias(alias)


def oracle_dec_sum(expr: str, alias: str) -> str:
    """DuckDB-side twin of dec_sum for oracle SQL strings."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def oracle_dec_avg(expr: str, alias: str) -> str:
    """DuckDB-side twin of dec_avg."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
