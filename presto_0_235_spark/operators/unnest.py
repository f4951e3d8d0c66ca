"""UNNEST (SURVEY.md §2.8).

Presto's UnnestOperator (MAIN/operator/unnest/UnnestOperator.java:48)
expands arrays, maps, and zipped multi-arg unnests, with optional
WITH ORDINALITY (1-based). Spark primitives: explode / posexplode /
explode_outer / arrays_zip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def unnest_array(
    df: DataFrame,
    array: Column | str,
    alias: str,
    ordinality: str | None = None,
    outer: bool = False,
) -> DataFrame:
    """UNNEST(array) [WITH ORDINALITY] — ordinality is 1-based like
    Presto (posexplode is 0-based)."""
    arr = F.col(array) if isinstance(array, str) else array
    if ordinality is None:
        fn = F.explode_outer if outer else F.explode
        return df.withColumn(alias, fn(arr))
    exploded = df.select(
        "*", F.posexplode_outer(arr) if outer else F.posexplode(arr)
    )
    return exploded.withColumn(
        ordinality, (F.col("pos") + 1).cast("int")
    ).drop("pos").withColumnRenamed("col", alias)


def unnest_map(
    df: DataFrame, mapping: Column | str, key_alias: str, value_alias: str
) -> DataFrame:
    """UNNEST(map) -> one row per entry (Presto MapUnnester)."""
    m = F.col(mapping) if isinstance(mapping, str) else mapping
    return df.select("*", F.explode(m).alias(key_alias, value_alias))


def unnest_zip(
    df: DataFrame, arrays: list[Column | str], aliases: list[str]
) -> DataFrame:
    """Multi-argument UNNEST(a, b, ...) — Presto zips the arrays,
    padding the shorter with NULL; arrays_zip + explode matches."""
    cols = [F.col(a) if isinstance(a, str) else a for a in arrays]
    zipped = F.explode(F.arrays_zip(*[c.alias(n) for c, n in zip(cols, aliases)]))
    out = df.select("*", zipped.alias("__z"))
    for name in aliases:
        out = out.withColumn(name, F.col(f"__z.{name}"))
    return out.drop("__z")
