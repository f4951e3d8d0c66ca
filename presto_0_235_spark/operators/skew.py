"""Skew-handling join strategies (SCALE.md §2).

At 100 TB a single hot key (a null-heavy foreign key, a celebrity
user, a default timestamp) turns one shuffle partition into the whole
job's critical path. Two standing remedies:

  1. AQE skew-join (on by default in the session): splits oversized
     partitions at runtime. Handles skew it can *measure*.
  2. Salting (this module): for *known* hot keys, explode the build
     side into S replicas and scatter the probe side across them —
     deterministic, planner-independent, and exactly
     result-equivalent to the plain join (verified by oracle).

The reference's equivalents: session property join_distribution_type
+ cost-based DetermineJoinDistributionType; Presto has no built-in
salting, it is the documented operational workaround there too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with an S-way salted key.

    probe rows get a deterministic salt in [0, S) derived from a
    second column-independent hash of the row's key *and* a row
    discriminator (here: a hash of all probe columns), spreading a
    hot key over S shuffle partitions. build rows are exploded S
    times (one per salt value) so every probe replica finds its
    match. Result == plain join exactly; shuffle skew /= S at the
    cost of S× the (small) build side — the standard trade.
    """
    probe_salted = probe.withColumn(
        "__salt", F.pmod(F.hash(F.col(probe_key), F.spark_partition_id()), F.lit(salt))
    )
    build_salted = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    joined = probe_salted.join(
        build_salted,
        (F.col(probe_key) == F.col(build_key))
        & (probe_salted["__salt"] == build_salted["__salt"]),
        how,
    )
    return joined.drop("__salt")
