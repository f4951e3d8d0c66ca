"""Accuracy bounds for sketch-based aggregates (no oracle possible —
HLL/qdigest internals are engine-specific, so correctness is an error
bound against the exact computation, mirroring how the reference
tests ApproximateCountDistinctAggregation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from presto_0_235_spark.catalog import load_table


def test_approx_count_distinct_error(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_percentile_approx_error(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), 10000).alias(
            "approx"
        ),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.02
