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


def system_sample(df: DataFrame, percent: int) -> DataFrame:
    """TABLESAMPLE SYSTEM(p) — split-granularity sampling, Presto's
    second sampling mode: whole splits are kept or dropped (cheap:
    skipped splits are never read in the connector; here, never
    processed past the scan). Spark analog: filter on the partition
    id — keeps ~p% of partitions, each wholly."""
    keep_every = max(1, round(100 / max(1, percent)))
    return df.filter(F.spark_partition_id() % keep_every == 0)
