"""Mergeable geometry aggregates (operators/geo_agg.py) — the
reference's GeometryUnionAgg / GeometryConvexHullAgg accumulator
design (presto-geospatial aggregation/GeometryUnionAgg.java,
GeometryConvexHullAgg.java) as two-phase Arrow aggregates.

Contract under test:
  - union_fold is POINT-SET equal to geo_overlay.union_all for any
    fold order / partial split (symdifference of the two results is
    empty) — the associativity+commutativity that makes the
    reference's combine() sound;
  - merging partial folds equals folding everything at once (the
    mergeable-accumulator law);
  - the Spark two-phase operator agrees with the SQL front door's
    collect_list lowering on grouped data, nulls skipped, all-null
    groups -> null.
"""

from __future__ import annotations

import random

import pytest

from presto_0_235_spark.functions import geo_wkt as gw
from presto_0_235_spark.functions.geo_overlay import (
    symdifference, union_all)
from presto_0_235_spark.operators.geo_agg import (
    convex_hull_agg, geometry_union_agg, hull_fold, union_fold)


def _sq(k: float) -> str:
    x = 0.5 * k
    return (f"POLYGON (({x} 0, {x + 1} 0, {x + 1} 1, {x} 1, "
            f"{x} 0))")


def _pointset_equal(a: str, b: str) -> bool:
    sd = symdifference(a, b)
    return gw.envelope_bounds(sd) is None or "EMPTY" in sd


def test_union_fold_matches_union_all_random_polygons():
    rnd = random.Random(7)
    for _ in range(3):
        wkts = []
        for _i in range(9):
            x, y = rnd.uniform(0, 15), rnd.uniform(0, 15)
            w, h = rnd.uniform(1, 3), rnd.uniform(1, 3)
            wkts.append(
                f"POLYGON (({x} {y}, {x + w} {y}, {x} {y + h}, "
                f"{x} {y}))"
            )
        assert _pointset_equal(union_fold(wkts), union_all(wkts))


def test_union_fold_merge_of_partials_is_fold_of_all():
    rnd = random.Random(11)
    ks = [rnd.randrange(60) for _ in range(200)]
    wkts = [_sq(k) for k in ks]
    partials = [union_fold(wkts[i::5]) for i in range(5)]
    assert _pointset_equal(union_fold(partials), union_fold(wkts))


def test_union_fold_holes_and_mixed_dimensions():
    donut = ("POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), "
             "(3 3, 5 3, 5 5, 3 5, 3 3))")
    plug = "POLYGON ((3.5 3.5, 4.5 3.5, 4.5 4.5, 3.5 4.5, 3.5 3.5))"
    far = "POLYGON ((20 20, 21 20, 21 21, 20 21, 20 20))"
    u = union_fold([donut, plug, far])
    assert _pointset_equal(u, union_all([donut, plug, far]))
    # mixed dims take the overlay fallback and stay exact
    mixed = ["POINT (50 50)", "LINESTRING (60 0, 61 1)",
             "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"]
    assert union_fold(mixed) == union_all(mixed)


def test_union_fold_null_and_empty_inputs():
    assert union_fold(None) is None
    assert union_fold([]) is None
    assert union_fold([None, None]) is None
    assert "EMPTY" in union_fold(["POLYGON EMPTY", "POINT EMPTY"])
    assert union_fold([None, _sq(0)]) == gw.geometry_from_text(_sq(0))


def _ring_canon(wkt: str):
    """Rotation-insensitive hull ring (the ring PHASE follows the
    first input vertex — an input-order artifact, like the ESRI
    convention the pin corpus documents — but the vertex SET and
    cyclic order are what the hull is)."""
    tag, payload = gw.parse_wkt(wkt)
    assert tag == "POLYGON"
    ring = payload[0][:-1]
    i = ring.index(min(ring))
    rot = ring[i:] + ring[:i]
    # also fix direction: choose the rotation whose second vertex
    # is smaller between forward and reversed traversal
    rev = [rot[0]] + rot[1:][::-1]
    return tuple(min(rot, rev))


def test_hull_fold_is_mergeable():
    rnd = random.Random(3)
    pts = [f"POINT ({rnd.uniform(0, 100):.3f} "
           f"{rnd.uniform(0, 100):.3f})" for _ in range(300)]
    direct = hull_fold(pts)
    partials = [hull_fold(pts[i::4]) for i in range(4)]
    assert _ring_canon(hull_fold(partials)) == _ring_canon(direct)


@pytest.mark.usefixtures("spark")
def test_two_phase_matches_sql_front_door(spark):
    from presto_0_235_spark.sql.frontend import run_sql

    rnd = random.Random(5)
    rows = [(i % 4, _sq(rnd.randrange(30))) for i in range(120)]
    rows.append((9, None))  # all-null group
    df = spark.createDataFrame(rows, "k int, g string").repartition(8)
    got = {
        r["k"]: r["union_geom"]
        for r in geometry_union_agg(df, ["k"], "g").collect()
    }
    df.createOrReplaceTempView("geo_agg_t")
    want = {
        r["k"]: r["u"]
        for r in run_sql(
            spark,
            "SELECT k, geometry_union_agg(g) AS u FROM geo_agg_t "
            "GROUP BY k",
        ).collect()
    }
    assert set(got) == set(want) == {0, 1, 2, 3, 9}
    assert got[9] is None and want[9] is None
    for k in (0, 1, 2, 3):
        assert _pointset_equal(got[k], want[k]), k
    # hull: exact text equality (hull of hulls == hull of all)
    hg = {
        r["k"]: r["hull_geom"]
        for r in convex_hull_agg(df, ["k"], "g").collect()
    }
    hw = {
        r["k"]: r["h"]
        for r in run_sql(
            spark,
            "SELECT k, convex_hull_agg(g) AS h FROM geo_agg_t "
            "GROUP BY k",
        ).collect()
    }
    assert hg == hw
