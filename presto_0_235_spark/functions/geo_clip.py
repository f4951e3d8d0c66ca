"""Polygon clipping kernel — ST_Union / ST_Intersection / polygon
ST_Buffer for OVERLAPPING polygons (the last §2.9 geometry gap).

The reference's GeoFunctions.java stUnion/stIntersection/stBuffer
delegate to the Esri geometry kernel; no geometry library is
installable in this container (shapely/Sedona checked absent), so
this module implements the public Greiner–Hormann clipping algorithm
(Greiner & Hormann, "Efficient clipping of arbitrary polygons", ACM
TOG 17(2), 1998) for simple polygons in general position, plus a
convex-polygon buffer by exact edge offsetting with N-gon corner
arcs (the standard round-join construction; arcs are inscribed
chords with sagitta r*(1-cos(pi/k))).

Scope (stated precisely): simple polygons without holes, vertices in
general position (no shared vertices / collinear overlapping edges —
the documented Greiner–Hormann degeneracy). The queries built on
this kernel (fn_geospatial_union / fn_geospatial_buffer in
queries/functions_q.py) generate such inputs and verify against
closed-form differential oracles.

Scale: the kernel is per-row Python, but it runs inside Arrow
``mapInPandas`` batches on executors — one polygon pair per row, no
driver involvement, same shape as the multimodal decode operators.
"""

from __future__ import annotations

import math
import sys

try:  # pickle-by-value so executors don't need this module on disk
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

Point = tuple[float, float]


def polygon_area(pts: list[Point]) -> float:
    """Shoelace area (positive for CCW)."""
    n = len(pts)
    s = 0.0
    for i in range(n):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return s / 2.0


def point_in_polygon(p: Point, poly: list[Point]) -> bool:
    """Even-odd ray cast (matches functions/geo.st_contains_ring)."""
    x, y = p
    inside = False
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if (y1 > y) != (y2 > y):
            xin = x1 + (y - y1) / (y2 - y1) * (x2 - x1)
            if x < xin:
                inside = not inside
    return inside


class _V:
    __slots__ = ("x", "y", "nxt", "prv", "neighbor", "entry",
                 "intersect", "alpha", "visited")

    def __init__(self, x: float, y: float, alpha: float = 0.0,
                 intersect: bool = False):
        self.x = x
        self.y = y
        self.nxt = None
        self.prv = None
        self.neighbor = None
        self.entry = True
        self.intersect = intersect
        self.alpha = alpha
        self.visited = False


def _build(poly: list[Point]) -> _V:
    first = None
    prev = None
    for x, y in poly:
        v = _V(x, y)
        if first is None:
            first = v
        else:
            prev.nxt = v
            v.prv = prev
        prev = v
    prev.nxt = first
    first.prv = prev
    return first


def _iter_ring(first: _V):
    v = first
    while True:
        yield v
        v = v.nxt
        while v.intersect and v is not first:
            yield v
            v = v.nxt
        if v is first:
            return


def _source_vertices(first: _V) -> list[_V]:
    return [v for v in _iter_ring(first) if not v.intersect]


def _insert(v: _V, start: _V, end: _V) -> None:
    """Insert intersection vertex between start and end, ordered by
    alpha among already-inserted intersections on the same edge."""
    cur = start
    while cur.nxt is not end and cur.nxt.alpha < v.alpha:
        cur = cur.nxt
    v.nxt = cur.nxt
    v.prv = cur
    cur.nxt.prv = v
    cur.nxt = v


def _intersect_segs(p1, p2, q1, q2):
    """Proper segment intersection -> (alphaP, alphaQ) or None."""
    d1x, d1y = p2.x - p1.x, p2.y - p1.y
    d2x, d2y = q2.x - q1.x, q2.y - q1.y
    denom = d1x * d2y - d1y * d2x
    if denom == 0:
        return None
    tx, ty = q1.x - p1.x, q1.y - p1.y
    ta = (tx * d2y - ty * d2x) / denom
    tb = (tx * d1y - ty * d1x) / denom
    if 0 < ta < 1 and 0 < tb < 1:
        return ta, tb
    return None


def clip_polygons(subject: list[Point], clip: list[Point],
                  op: str) -> list[list[Point]]:
    """Greiner–Hormann boolean op on two simple polygons.
    op: "intersection" or "union". Returns a list of result rings
    (possibly empty for a disjoint intersection, two rings for a
    disjoint union)."""
    if op not in ("intersection", "union"):
        raise ValueError(f"unsupported op {op!r}")
    s_first = _build(subject)
    c_first = _build(clip)

    # Phase 1: find and insert intersections, cross-linked.
    found = False
    for sv in list(_source_vertices(s_first)):
        s_end = sv.nxt
        while s_end.intersect:
            s_end = s_end.nxt
        for cv in list(_source_vertices(c_first)):
            c_end = cv.nxt
            while c_end.intersect:
                c_end = c_end.nxt
            hit = _intersect_segs(sv, s_end, cv, c_end)
            if hit is None:
                continue
            found = True
            ta, tb = hit
            x = sv.x + ta * (s_end.x - sv.x)
            y = sv.y + ta * (s_end.y - sv.y)
            i1 = _V(x, y, ta, True)
            i2 = _V(x, y, tb, True)
            i1.neighbor = i2
            i2.neighbor = i1
            _insert(i1, sv, s_end)
            _insert(i2, cv, c_end)

    if not found:
        # No edge crossings: containment or disjoint.
        s_pts, c_pts = list(subject), list(clip)
        s_in_c = point_in_polygon(s_pts[0], c_pts)
        c_in_s = point_in_polygon(c_pts[0], s_pts)
        if op == "intersection":
            if s_in_c:
                return [s_pts]
            if c_in_s:
                return [c_pts]
            return []
        if s_in_c:
            return [c_pts]
        if c_in_s:
            return [s_pts]
        return [s_pts, c_pts]

    # Phase 2: entry/exit flags. For intersection: an intersection is
    # an ENTRY iff the previous status was outside the other polygon.
    # Union flips both flag sets (the published GH op table).
    for first, other in ((s_first, clip), (c_first, subject)):
        status = not point_in_polygon((first.x, first.y), other)
        if op == "union":
            status = not status
        for v in _iter_ring(first):
            if v.intersect:
                v.entry = status
                status = not status

    # Phase 3: traverse.
    results: list[list[Point]] = []
    while True:
        start = None
        for v in _iter_ring(s_first):
            if v.intersect and not v.visited:
                start = v
                break
        if start is None:
            break
        ring: list[Point] = []
        cur = start
        while True:
            cur.visited = True
            if cur.neighbor is not None:
                cur.neighbor.visited = True
            if cur.entry:
                while True:
                    ring.append((cur.x, cur.y))
                    cur = cur.nxt
                    if cur.intersect:
                        break
            else:
                while True:
                    ring.append((cur.x, cur.y))
                    cur = cur.prv
                    if cur.intersect:
                        break
            cur = cur.neighbor
            if cur is start or cur.neighbor is start:
                break
            if cur.visited:
                break
        if len(ring) >= 3:
            results.append(ring)
    return results


def intersection_area(a: list[Point], b: list[Point]) -> float:
    return sum(
        abs(polygon_area(r)) for r in clip_polygons(a, b, "intersection")
    )


def union_rings(a: list[Point], b: list[Point]) -> list[list[Point]]:
    return clip_polygons(a, b, "union")


def union_area(a: list[Point], b: list[Point]) -> float:
    return sum(abs(polygon_area(r)) for r in union_rings(a, b))


# ---- convex polygon buffer (round joins) ----------------------------------


def buffer_convex(poly: list[Point], r: float,
                  circle_segments: int = 48) -> list[Point]:
    """ST_Buffer(convex polygon, r) boundary: each edge offset
    exactly by r along its outward normal, corners joined by
    inscribed arcs stepping at most 2*pi/circle_segments. Input must
    be convex CCW; output is the buffer polygon (CCW)."""
    n = len(poly)
    if abs(polygon_area(poly)) == 0:
        raise ValueError("degenerate polygon")
    if polygon_area(poly) < 0:
        poly = list(reversed(poly))
        n = len(poly)
    step = 2 * math.pi / circle_segments
    out: list[Point] = []
    for i in range(n):
        a = poly[i]
        b = poly[(i + 1) % n]
        c = poly[(i + 2) % n]
        # outward normal of edge a->b for CCW polygon: (dy, -dx)
        d1x, d1y = b[0] - a[0], b[1] - a[1]
        l1 = math.hypot(d1x, d1y)
        n1x, n1y = d1y / l1, -d1x / l1
        d2x, d2y = c[0] - b[0], c[1] - b[1]
        l2 = math.hypot(d2x, d2y)
        n2x, n2y = d2y / l2, -d2x / l2
        # offset edge endpoints
        out.append((a[0] + r * n1x, a[1] + r * n1y))
        out.append((b[0] + r * n1x, b[1] + r * n1y))
        # arc at b from normal1 to normal2 (exterior angle, convex
        # so the turn is CCW-positive and < pi)
        a1 = math.atan2(n1y, n1x)
        a2 = math.atan2(n2y, n2x)
        turn = a2 - a1
        while turn <= -math.pi:
            turn += 2 * math.pi
        while turn > math.pi:
            turn -= 2 * math.pi
        k = max(0, int(math.ceil(abs(turn) / step)) - 1)
        for j in range(1, k + 1):
            ang = a1 + turn * j / (k + 1)
            out.append((b[0] + r * math.cos(ang), b[1] + r * math.sin(ang)))
    return out
