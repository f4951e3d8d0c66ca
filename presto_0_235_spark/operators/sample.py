"""TABLESAMPLE (SURVEY.md §2.8).

Presto rewrites BERNOULLI(p) to a rand() < p filter
(ImplementBernoulliSampleAsFilter.java) and SYSTEM(p) samples at
split granularity. Spark's df.sample is the Bernoulli equivalent.
Both are nondeterministic across engines, so differential testing
additionally uses a *deterministic* arithmetic sample — same trick
Presto tests use for stable subsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bernoulli_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """TABLESAMPLE BERNOULLI(p) — row-level, seeded but engine-specific."""
    return df.sample(fraction=fraction, seed=seed)


def deterministic_sample(
    df: DataFrame, key: str, percent: int, modulus: int = 100
) -> DataFrame:
    """Keep rows where a multiplicative hash of `key` falls in
    [0, percent) — identical row set on any engine. The Knuth
    multiplier keeps the bucket assignment well-mixed for sequential
    keys while staying exactly expressible in portable SQL."""
    bucket = (F.col(key) * F.lit(2654435761)) % modulus
    return df.filter(bucket < percent)
