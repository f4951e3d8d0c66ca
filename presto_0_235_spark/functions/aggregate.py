"""Presto aggregate functions without Spark builtins (SURVEY.md §2.4).

Spark covers most of the reference's aggregate library 1:1
(count/sum/avg/min/max, variance family, corr/covar/regr, bool/bit,
min_by/max_by, collect_*, approx_count_distinct, percentile). The
compositions here supply the rest:

  checksum        reference ChecksumAggregationFunction.java —
                  order-independent hash aggregate
  geometric_mean  GeometricMeanAggregations.java — exp(avg(ln x))
  entropy         EntropyAggregation.java — -sum(p log2 p)
  map_agg         MapAggregationFunction.java —
                  map_from_entries(collect_list(struct(k, v)))
  reduce_agg      ReduceAggregationFunction.java — lambda aggregation
                  via aggregate() over a collected array

portable_hash64 is the cross-engine 64-bit hash used by checksum and
by the dedup/fingerprint extensions: the top 60 bits of md5, which
every engine computes identically (Spark xxhash64 is faster but
engine-specific — the scale path swaps it in when no oracle diff is
needed; both hashes distribute uniformly).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash64(col: Column | str) -> Column:
    """Deterministic 64-bit (60 usable bits) hash, identical on any
    engine with md5: BIGINT of the first 15 hex chars."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def oracle_portable_hash64(expr: str) -> str:
    """DuckDB twin of portable_hash64."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def checksum_agg(col: Column | str, alias: str) -> Column:
    """Order-independent content checksum: xor of row hashes, exactly
    Presto checksum()'s combine rule (ChecksumAggregationFunction.java
    xors row hashes) — order-independent and overflow-free at any row
    count (a sum of 60-bit hashes would overflow int64 after ~16 rows
    and raise under the session's ANSI mode)."""
    return F.bit_xor(portable_hash64(col)).alias(alias)


def geometric_mean(col: Column | str, alias: str) -> Column:
    """exp(avg(ln(x))) for positive x."""
    c = F.col(col) if isinstance(col, str) else col
    return F.exp(F.avg(F.log(c))).alias(alias)


def entropy_of_counts(count_col: Column | str, alias: str) -> Column:
    """Shannon entropy (base 2) of a distribution given per-row
    weights, Presto entropy() semantics: -sum(p log2 p) with
    p = c / sum(c)."""
    c = F.col(count_col) if isinstance(count_col, str) else count_col
    total = F.sum(c)
    # sum(c*log2(c)) and total are both aggregated once; entropy
    # follows from log identities: H = log2(T) - sum(c log2 c)/T.
    return (
        F.log2(total) - F.sum(c * F.log2(c)) / total
    ).alias(alias)


def map_agg(key: Column | str, value: Column | str) -> Column:
    """map_agg(k, v): Presto MapAggregationFunction composition."""
    k = F.col(key) if isinstance(key, str) else key
    v = F.col(value) if isinstance(value, str) else value
    return F.map_from_entries(F.collect_list(F.struct(k, v)))


def reduce_agg_sum(col: Column | str, alias: str) -> Column:
    """reduce_agg(x, 0, (s,x)->s+x, (s1,s2)->s1+s2) — the reference's
    user-lambda aggregation (ReduceAggregationFunction.java),
    expressed as aggregate() over the collected input. Exact for
    integers; demonstrates the lambda machinery, not a fast path."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.collect_list(c),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x.cast("long"),
    ).alias(alias)
