"""Semantic q-digest (operators/qdigest.py) — the public
Shrivastava et al. 2004 algorithm with the reference's
qdigest(bigint) function-surface semantics
(QuantileDigestAggregationFunction.java / QuantileDigestFunctions
.java). Byte interop with airlift stays out of scope (documented
since r10: no airlift source/jar on this machine to verify a layout
against); THESE tests pin the semantic contract instead:

  - rank-error bound: value_at_quantile(q) lies between the exact
    values at ranks (q - accuracy)N and (q + accuracy)N
  - mergeability: merging partial digests (any split, any order)
    obeys the same bound — the combine() law
  - merge associativity up to the bound
  - wire roundtrip of THIS ENGINE's serialization
  - quantile_at_value inverts value_at_quantile within the bound
"""

from __future__ import annotations

import random

import pytest

from presto_0_235_spark.operators.qdigest import (
    DEFAULT_ACCURACY, qdigest_build, qdigest_deserialize,
    qdigest_merge, qdigest_serialize, quantile_at_value,
    value_at_quantile, values_at_quantiles)

QS = (0.01, 0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99)


def _bracket_ok(est, sv, q, eps):
    """est must be a legal answer: between the exact values at
    ranks (q-eps)N and (q+eps)N (value-bracketing — rank-of-value
    comparisons break down under heavy ties)."""
    n = len(sv)
    lo = sv[max(0, min(n - 1, int((q - eps) * n) - 1))]
    hi = sv[max(0, min(n - 1, int((q + eps) * n)))]
    return lo <= est <= hi


def _datasets():
    rnd = random.Random(7)
    return {
        "uniform": [rnd.randint(0, 10_000) for _ in range(40_000)],
        "zipf": [int(rnd.paretovariate(1.2) * 100)
                 for _ in range(40_000)],
        "wide": [rnd.randint(-2**40, 2**40) for _ in range(20_000)],
        "clustered": [rnd.choice([5, 1_000, 10**9]) + rnd.randint(0, 3)
                      for _ in range(40_000)],
        "negative": [rnd.randint(-10_000, -1) for _ in range(20_000)],
    }


@pytest.mark.parametrize("name", list(_datasets()))
def test_rank_error_bound(name):
    vals = _datasets()[name]
    sv = sorted(vals)
    d = qdigest_build(vals, accuracy=DEFAULT_ACCURACY)
    for q in QS:
        est = value_at_quantile(d, q)
        assert _bracket_ok(est, sv, q, DEFAULT_ACCURACY), (name, q, est)


@pytest.mark.parametrize("name", ["uniform", "wide", "clustered"])
def test_merge_preserves_bound(name):
    vals = _datasets()[name]
    sv = sorted(vals)
    parts = [qdigest_build(vals[i::7]) for i in range(7)]
    merged = qdigest_merge(*parts)
    assert merged.total == pytest.approx(len(vals))
    for q in QS:
        est = value_at_quantile(merged, q)
        assert _bracket_ok(est, sv, q, DEFAULT_ACCURACY), (name, q, est)


def test_merge_associativity_up_to_bound():
    vals = _datasets()["uniform"]
    sv = sorted(vals)
    parts = [qdigest_build(vals[i::4]) for i in range(4)]
    left = qdigest_merge(qdigest_merge(parts[0], parts[1]),
                         qdigest_merge(parts[2], parts[3]))
    right = qdigest_merge(
        parts[3], qdigest_merge(parts[2],
                                qdigest_merge(parts[1], parts[0])))
    for q in QS:
        for d in (left, right):
            assert _bracket_ok(value_at_quantile(d, q), sv, q,
                               DEFAULT_ACCURACY)


def test_wire_roundtrip_and_weights():
    vals = [1, 2, 3]
    d = qdigest_build(vals, weights=[1, 2, 7])
    b = qdigest_serialize(d)
    d2 = qdigest_deserialize(b)
    assert d2.counts == d.counts and d2.total == d.total
    # weighted median: 10 total, rank 5 falls in the weight-7 value
    assert value_at_quantile(d2, 0.5) == 3
    assert values_at_quantiles(d2, [0.0, 0.05, 0.5]) == [1, 1, 3]


def test_quantile_at_value_inverts():
    vals = _datasets()["uniform"]
    d = qdigest_build(vals)
    for q in (0.1, 0.5, 0.9):
        v = value_at_quantile(d, q)
        assert abs(quantile_at_value(d, v) - q) <= 3 * DEFAULT_ACCURACY


def test_validation_raises():
    with pytest.raises(ValueError):
        qdigest_build([1], accuracy=0.0)
    with pytest.raises(ValueError):
        qdigest_build([1], weights=[-1])
    d = qdigest_build([1, 2, 3])
    with pytest.raises(ValueError):
        value_at_quantile(d, 1.5)


def test_extreme_quantiles_clamp_to_observed_range():
    # airlift's QuantileDigest tracks min/max and clamps getQuantile
    # into [min, max]; without the clamp, merges that compress mass
    # into high-level/root nodes make q near 1 return the node upper
    # bound (2^63-1) — reproduced with a 7-way merge of range(100000)
    parts = [qdigest_build(range(i * 14286,
                                 min((i + 1) * 14286, 100000)))
             for i in range(7)]
    m = qdigest_merge(*parts)
    assert m.min == 0 and m.max == 99999
    assert value_at_quantile(m, 1.0) == 99999
    assert 0 <= value_at_quantile(m, 0.0) <= 1000  # accuracy*N bound
    # bounds survive the wire
    rt = qdigest_deserialize(qdigest_serialize(m))
    assert (rt.min, rt.max) == (0, 99999)
    assert value_at_quantile(rt, 1.0) == 99999
    # negative-domain clamp at the low end
    neg = qdigest_merge(qdigest_build([-500, -400]),
                        qdigest_build([-300, -200, -100]))
    assert value_at_quantile(neg, 0.0) >= -500
    assert value_at_quantile(neg, 1.0) == -100


def test_sql_surface_qdigest(spark):
    """r14: the SQL door exposes the reference's qdigest surface
    (QuantileDigestFunctions.java): qdigest_agg over a GROUP BY
    routes through the mergeable two-phase operator
    (frontend._route_geo_aggregate -> operators/qdigest.
    qdigest_two_phase — partial digests below the exchange), the
    scalar accessors evaluate on digest columns, and shapes outside
    the router window fall back to the grouped-agg pandas UDAF."""
    from presto_0_235_spark.catalog import register_views
    from presto_0_235_spark.sql.frontend import run_sql

    register_views(spark, "/root/testdata/sf0.001")
    df = run_sql(
        spark,
        "SELECT o_orderstatus, "
        "value_at_quantile(qdigest_agg(o_orderkey), 0.5) AS p50, "
        "value_at_quantile(qdigest_agg(o_orderkey), 0.99) AS p99 "
        "FROM orders GROUP BY o_orderstatus")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "FlatMapGroupsInPandas" in plan
    rows = {r["o_orderstatus"]: r for r in df.collect()}
    exact = run_sql(
        spark,
        "SELECT o_orderstatus, count(*) AS n, max(o_orderkey) AS mx, "
        "min(o_orderkey) AS mn FROM orders GROUP BY o_orderstatus"
    ).collect()
    for r in exact:
        got = rows[r["o_orderstatus"]]
        # clamped into the observed range, p50 <= p99, and the rank
        # error bound holds loosely (values ordered by construction)
        assert r["mn"] <= got["p50"] <= got["p99"] <= r["mx"]
    # quantile_at_value inverts approximately
    inv = run_sql(
        spark,
        "SELECT quantile_at_value(qdigest_agg(o_orderkey), "
        "CAST((SELECT max(o_orderkey) FROM orders) AS BIGINT)) AS q "
        "FROM orders").collect()[0]["q"]
    assert 0.97 <= inv <= 1.0
    # the UDAF fallback (subquery position declines the router)
    fb = run_sql(
        spark,
        "SELECT value_at_quantile(d, 0.5) AS p50 FROM ("
        "SELECT qdigest_agg(o_orderkey) AS d FROM orders "
        "GROUP BY o_orderstatus) t")
    assert fb.count() == 3
    # weighted signature (qdigest_agg(x, w))
    wrow = run_sql(
        spark,
        "SELECT value_at_quantile(qdigest_agg(o_orderkey, 2.0), 0.5) "
        "AS p FROM orders").collect()[0]
    assert wrow["p"] is not None
