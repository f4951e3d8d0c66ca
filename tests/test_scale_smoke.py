"""Scale smoke: representative heavy queries must run at sf0.1 in
interactive time (seconds, not minutes) — the local proxy for the
BASELINE bound (BASELINE.md: bench within 2x at the same SF).
Skipped automatically if the sf0.1 fixtures are absent.
"""

from __future__ import annotations

import os
import time

import pytest

from presto_0_235_spark.queries.registry import all_queries

SF01 = "/root/testdata/sf0.1"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF01), reason="sf0.1 fixtures not present"
)

_HEAVY = ["tpch_q5", "dedup_minhash_lsh", "pipeline_corpus_dedup",
          "text_decontaminate", "join_interval_overlap",
          "ts_rollup_gapfill", "tpch_q21_adapted", "dedup_cc_star",
          "tpch_q2_adapted", "ann_int8_topk", "join_spatial_radius",
          "docs_pack_sequences"]


@pytest.mark.parametrize("name", _HEAVY)
def test_heavy_query_interactive_at_sf01(name, spark):
    q = all_queries()[name]
    start = time.monotonic()
    assert q.builder(spark, SF01).count() >= 0
    elapsed = time.monotonic() - start
    assert elapsed < 120, f"{name} took {elapsed:.1f}s at sf0.1"


def test_avro_format_probe(spark, tmp_path):
    """AVRO (HiveStorageFormat.java:42-91) is an external Spark module
    (spark-avro jar). This probe documents the gap precisely: if a
    deployment ships the jar, the roundtrip below runs and AVRO
    support is live; in this container it skips. Either way the gap
    is pinned by a test, not prose."""
    try:
        spark.range(5).write.format("avro").save(str(tmp_path / "probe"))
    except Exception:
        pytest.skip("spark-avro module not deployed in this container")
    back = spark.read.format("avro").load(str(tmp_path / "probe"))
    assert back.count() == 5


def test_lsh_bucket_cap_survives_mass_duplication(spark):
    """Adversarial LSH smoke (the scale property the bucket cap
    exists for): ~50k copies of ONE document would make the band
    self-join quadratic in that bucket (~2.5e9 pairs per band key)
    without the cap. With the cap the degenerate bucket is dropped
    from pair generation and the job stays interactive; organic
    near-dups in the same corpus are still found."""
    import time

    from pyspark.sql import functions as F

    from presto_0_235_spark.operators import dedup as dd

    boiler = "the quick brown fox jumps over the lazy dog " * 8
    docs = (
        spark.range(50_000)
        .select(
            F.col("id").alias("doc_id"),
            F.lit(boiler).alias("text"),
        )
        # two organic near-dup pairs hidden among the mass-dupes
        .unionByName(
            spark.createDataFrame(
                [
                    (100_001, "alpha beta gamma delta epsilon zeta eta theta one"),
                    (100_002, "alpha beta gamma delta epsilon zeta eta theta two"),
                ],
                "doc_id long, text string",
            )
        )
    )
    docs = docs.withColumn("shingles", dd.word_shingles("text"))
    start = time.monotonic()
    pairs = dd.lsh_candidate_pairs(docs, "doc_id", "shingles")
    n_pairs = pairs.count()
    elapsed = time.monotonic() - start
    # The capped join must never materialize the ~2.5e9 degenerate
    # pairs; anything interactive proves the cap engaged.
    assert elapsed < 120, f"capped LSH took {elapsed:.1f}s"
    assert n_pairs < 1_000_000, f"cap failed: {n_pairs} candidate pairs"
    # the organic near-dup pair still surfaces
    organic = pairs.filter(
        (F.col("id1") == 100_001) & (F.col("id2") == 100_002)
    ).count()
    assert organic == 1
