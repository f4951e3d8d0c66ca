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
