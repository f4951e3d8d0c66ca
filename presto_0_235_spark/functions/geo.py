"""Geospatial scalar core (reference presto-geospatial
GeoFunctions.java) — the planar point/linestring/polygon subset that
needs no geometry library, as pure Column expressions.

Geometry model: a POINT is struct<x:double, y:double>; a LINESTRING /
POLYGON RING is array<struct<x,y>> (rings closed — first point
repeated last, the WKT convention); a POLYGON WITH HOLES and a
MULTILINESTRING are array<array<point>>. Covered as pure Column
expressions: the measure/accessor/predicate core (ST_X/ST_Y/
ST_Distance/ST_Length/ST_Area/ST_Centroid/envelope containment),
general-polygon ST_Contains/ST_Within by ray-casting crossing
parity (holes via the even-odd rule), WKT parse/render for POINT/
LINESTRING/POLYGON (incl. interior rings)/MULTIPOINT/
MULTILINESTRING, point ST_Buffer as an N-gon circle, and
great_circle_distance (SphericalGeographyUtils.java:82),
MULTIPOLYGON (even-odd containment, summed area, WKT both ways),
GEOMETRYCOLLECTION (member split + ST_NumGeometries/ST_GeometryN),
general ST_Distance (point-line / point-polygon via clamped segment
projection, which also gives exact line-buffer containment),
ST_Intersects for line/line + polygon/polygon (orientation-sign
segment tests), ST_Union for the exactly-representable cases
(point-set dedup, disjoint-polygon concat), and ST_ConvexHull
(monotone chain — the one Arrow-UDF member — plus the two-phase
distributed convex_hull_agg). Remaining gaps (documented): polygon
boundary buffers and overlapping-polygon union/clipping — these need
a computational-geometry kernel (the reference links
Esri-geometry-api). The spatial JOIN paths are join_spatial_radius
and join_spatial_contains (ExtractSpatialJoins.java analogs).

Everything here except the convex hull is JVM-side whole-stage-
codegen arithmetic — at 100 TB these are scan-speed per-row
expressions, no shuffle, no UDF. The hull alone needs sequential
stack logic and runs as an Arrow pandas UDF (never row-at-a-time).
"""

from __future__ import annotations

import math
import sys

from pyspark.sql import Column
from pyspark.sql import functions as F

try:  # st_convex_hull/convex_hull_agg run worker-side — by-value
    # fallback until the package zip ships (session.py r14)
    from presto_0_235_spark.session import register_worker_module

    register_worker_module(sys.modules[__name__])
except Exception:  # pragma: no cover - older vendored cloudpickle
    pass


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def st_point(x: Column | str, y: Column | str) -> Column:
    """ST_Point(x, y) (GeoFunctions.java stPoint)."""
    return F.struct(
        _c(x).cast("double").alias("x"), _c(y).cast("double").alias("y")
    )


def st_x(p: Column | str) -> Column:
    """ST_X(point)."""
    return _c(p).getField("x")


def st_y(p: Column | str) -> Column:
    """ST_Y(point)."""
    return _c(p).getField("y")


def st_distance(a: Column | str, b: Column | str) -> Column:
    """ST_Distance(point, point) — planar euclidean
    (GeoFunctions.java stDistance)."""
    dx = st_x(a) - st_x(b)
    dy = st_y(a) - st_y(b)
    return F.sqrt(dx * dx + dy * dy)


def st_length(line: Column | str) -> Column:
    """ST_Length(linestring): sum of consecutive segment lengths.
    aggregate over zip_with(line, shifted-line) — one pass, no UDF.
    Empty/single-point inputs yield 0.0 (slice length clamps to 0;
    a negative length is a runtime error)."""
    pts = _c(line)
    n = F.greatest(F.size(pts) - 1, F.lit(0))
    segs = F.zip_with(
        F.slice(pts, 1, n), F.slice(pts, 2, n), st_distance
    )
    return F.aggregate(segs, F.lit(0.0), lambda acc, s: acc + s)


def _shoelace_2a(ring: Column) -> Column:
    """Twice the signed area of a closed ring (shoelace sum).
    Empty rings yield 0.0 (slice length clamps to 0)."""
    n = F.greatest(F.size(ring) - 1, F.lit(0))
    terms = F.zip_with(
        F.slice(ring, 1, n),
        F.slice(ring, 2, n),
        lambda p, q: p.getField("x") * q.getField("y")
        - q.getField("x") * p.getField("y"),
    )
    return F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t)


def st_area(ring: Column | str) -> Column:
    """ST_Area(polygon ring) — absolute shoelace area
    (GeoFunctions.java stArea). Ring must be closed."""
    return F.abs(_shoelace_2a(_c(ring))) / 2.0


def st_centroid_points(pts: Column | str) -> Column:
    """ST_Centroid of a multipoint: arithmetic mean point."""
    p = _c(pts)
    n = F.size(p).cast("double")
    sx = F.aggregate(
        p, F.lit(0.0), lambda acc, q: acc + q.getField("x")
    )
    sy = F.aggregate(
        p, F.lit(0.0), lambda acc, q: acc + q.getField("y")
    )
    return F.struct((sx / n).alias("x"), (sy / n).alias("y"))


def st_envelope_contains(
    xmin: Column | str,
    ymin: Column | str,
    xmax: Column | str,
    ymax: Column | str,
    p: Column | str,
) -> Column:
    """ST_Contains(envelope, point) — the rectangle fast path the
    reference optimizer itself special-cases before handing general
    polygons to the geometry library."""
    return (
        (st_x(p) >= _c(xmin))
        & (st_x(p) <= _c(xmax))
        & (st_y(p) >= _c(ymin))
        & (st_y(p) <= _c(ymax))
    )


def _coord_extreme(pts: Column | str, field: str, extreme) -> Column:
    return extreme(F.transform(_c(pts), lambda q: q.getField(field)))


def st_x_min(pts: Column | str) -> Column:
    """ST_XMin of a multipoint/linestring/ring."""
    return _coord_extreme(pts, "x", F.array_min)


def st_x_max(pts: Column | str) -> Column:
    """ST_XMax."""
    return _coord_extreme(pts, "x", F.array_max)


def st_y_min(pts: Column | str) -> Column:
    """ST_YMin."""
    return _coord_extreme(pts, "y", F.array_min)


def st_y_max(pts: Column | str) -> Column:
    """ST_YMax."""
    return _coord_extreme(pts, "y", F.array_max)


def st_contains_ring(ring: Column | str, p: Column | str) -> Column:
    """ST_Contains(polygon, point) for a single closed ring —
    ray-casting crossing count as a pure Column fold
    (GeoFunctions.java:1021 stContains; the reference delegates to
    the Esri geometry library — crossing-parity is the same
    algorithm every planar geometry engine uses for point-in-
    polygon). For each edge (a, b) of the ring, a rightward
    horizontal ray from p crosses iff the edge straddles p.y
    strictly and the edge/ray intersection lies right of p.x; an odd
    crossing total means inside. Horizontal edges contribute nothing
    (the straddle test is false; the slope division may produce
    inf — harmless under IEEE doubles, identically on any engine).
    Boundary points follow crossing parity (not the OGC boundary
    convention) — exact on-edge hits are measure-zero for real
    coordinates and both sides of every differential test run the
    identical arithmetic.

    Whole-stage-codegen per-row math: O(vertices) per point, no
    shuffle, no UDF — at 100 TB this is scan-speed, and the
    join_spatial_contains grid bucketing keeps candidate pairs
    sparse."""
    return _ring_crossings(_c(ring), _c(p)) % 2 == 1


def _ring_crossings(pts: Column, p: Column) -> Column:
    """Rightward-ray crossing count against one closed ring."""
    px, py = st_x(p), st_y(p)
    n = F.greatest(F.size(pts) - 1, F.lit(0))
    crossings = F.zip_with(
        F.slice(pts, 1, n),
        F.slice(pts, 2, n),
        lambda a, b: F.when(
            ((a.getField("y") > py) != (b.getField("y") > py))
            & (
                px
                < (b.getField("x") - a.getField("x"))
                * (py - a.getField("y"))
                / (b.getField("y") - a.getField("y"))
                + a.getField("x")
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return F.aggregate(crossings, F.lit(0), lambda acc, c: acc + c)


def st_contains_polygon(rings: Column | str, p: Column | str) -> Column:
    """ST_Contains for a polygon WITH HOLES:
    ``rings`` = array<array<point>> — outer ring first, then hole
    rings (each closed). The EVEN-ODD rule extends crossing parity
    naturally: total crossings over ALL rings is odd iff the point
    is inside the outer ring an even number of hole boundaries deep
    — i.e., inside the polygon and outside its holes. Same per-row
    whole-stage-codegen math as st_contains_ring, one nested fold."""
    pp = _c(p)
    total = F.aggregate(
        _c(rings),
        F.lit(0),
        lambda acc, ring: acc + _ring_crossings(ring, pp),
    )
    return total % 2 == 1


def st_within_ring(p: Column | str, ring: Column | str) -> Column:
    """ST_Within(point, polygon) = ST_Contains(polygon, point) with
    the arguments flipped (GeoFunctions.java stWithin)."""
    return st_contains_ring(ring, p)


def ray_cast_terms_sql(
    px: str, py: str, vertices: list[tuple[float, float]]
) -> str:
    """SQL sum of per-edge crossing indicators for one closed ring —
    identical arithmetic to _ring_crossings (same straddle
    comparison, same slope expression), so a DuckDB oracle reproduces
    the engine's doubles bit-for-bit. Vertex coordinates may be
    numbers or SQL expression strings."""
    terms = []
    for (x1, y1), (x2, y2) in zip(vertices, vertices[1:]):
        terms.append(
            f"(CASE WHEN (({y1} > {py}) <> ({y2} > {py})) AND "
            f"({px} < ({x2} - {x1}) * ({py} - {y1}) / ({y2} - {y1}) "
            f"+ {x1}) THEN 1 ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def ray_cast_sql(px: str, py: str, vertices: list[tuple[float, float]]) -> str:
    """ANSI-SQL twin of st_contains_ring for a FIXED closed ring:
    crossing-term sum parity."""
    return f"({ray_cast_terms_sql(px, py, vertices)} % 2 = 1)"


def ray_cast_holes_sql(
    px: str, py: str, rings: list[list[tuple[float, float]]]
) -> str:
    """ANSI-SQL twin of st_contains_polygon (even-odd over outer +
    hole rings)."""
    total = " + ".join(ray_cast_terms_sql(px, py, r) for r in rings)
    return f"(({total}) % 2 = 1)"


def st_num_points(pts: Column | str) -> Column:
    """ST_NumPoints."""
    return F.size(_c(pts)).cast("bigint")


def st_is_closed(pts: Column | str) -> Column:
    """ST_IsClosed: first point equals last point."""
    p = _c(pts)
    first, last = F.element_at(p, 1), F.element_at(p, F.size(p))
    return (first.getField("x") == last.getField("x")) & (
        first.getField("y") == last.getField("y")
    )


# ---- WKT text I/O (GeoFunctions.java stGeometryFromText/stAsText) ----------
# The basic OGC types parse/render with pure string expressions — no
# geometry library needed: POINT, LINESTRING, POLYGON with a single
# ring (st_polygon_from_text) or with holes
# (st_polygon_rings_from_text). Multi-geometries (MULTIPOLYGON /
# GEOMETRYCOLLECTION) remain out of scope.


_POINT_WKT = r"^POINT \(([-0-9.eE]+) ([-0-9.eE]+)\)$"


def st_point_from_text(wkt: Column | str) -> Column:
    """ST_GeometryFromText('POINT (x y)') -> point struct."""
    w = _c(wkt)
    x = F.regexp_extract(w, _POINT_WKT, 1)
    y = F.regexp_extract(w, _POINT_WKT, 2)
    return F.when(
        x != "",
        F.struct(
            x.cast("double").alias("x"), y.cast("double").alias("y")
        ),
    )


def _coords_to_points(inner: Column) -> Column:
    # split each "x y" pair once, then bind the pieces via a nested
    # transform (higher-order lambdas have no let-form)
    return F.transform(
        F.transform(
            F.split(inner, r",\s*"), lambda pair: F.split(F.trim(pair), " ")
        ),
        lambda xy: F.struct(
            xy[0].cast("double").alias("x"), xy[1].cast("double").alias("y")
        ),
    )


def st_line_from_text(wkt: Column | str) -> Column:
    """ST_GeometryFromText('LINESTRING (x y, x y, ...)') ->
    array<point>."""
    inner = F.regexp_extract(_c(wkt), r"^LINESTRING \((.+)\)$", 1)
    return F.when(inner != "", _coords_to_points(inner))


def st_polygon_from_text(wkt: Column | str) -> Column:
    """ST_GeometryFromText('POLYGON ((x y, ...))') -> closed ring
    array<point> (single outer ring; for holes use
    st_polygon_rings_from_text)."""
    inner = F.regexp_extract(_c(wkt), r"^POLYGON \(\((.+)\)\)$", 1)
    return F.when(inner != "", _coords_to_points(inner))


def st_polygon_rings_from_text(wkt: Column | str) -> Column:
    """ST_GeometryFromText('POLYGON ((outer), (hole), ...)') ->
    array<array<point>> — outer ring first, then holes; feeds
    st_contains_polygon. Ring splitting is on the ')…(' boundaries,
    then the residual parens strip per ring — still pure string
    expressions."""
    inner = F.regexp_extract(_c(wkt), r"^POLYGON \((.+)\)$", 1)
    rings_txt = F.split(inner, r"\)\s*,\s*\(")
    cleaned = F.transform(
        rings_txt, lambda r: F.regexp_replace(r, r"^\(|\)$", "")
    )
    return F.when(
        inner != "",
        F.transform(cleaned, lambda r: _coords_to_points(r)),
    )


def st_as_text_point(p: Column | str) -> Column:
    """ST_AsText(point) -> 'POINT (x y)'."""
    return F.concat(
        F.lit("POINT ("),
        st_x(p).cast("string"),
        F.lit(" "),
        st_y(p).cast("string"),
        F.lit(")"),
    )


def st_as_text_line(line: Column | str) -> Column:
    """ST_AsText(linestring) -> 'LINESTRING (x y, x y, ...)'."""
    coords = F.array_join(
        F.transform(
            _c(line),
            lambda q: F.concat(
                q.getField("x").cast("string"),
                F.lit(" "),
                q.getField("y").cast("string"),
            ),
        ),
        ", ",
    )
    return F.concat(F.lit("LINESTRING ("), coords, F.lit(")"))


EARTH_RADIUS_KM = 6371.01


def great_circle_distance(
    lat1: Column | str,
    lon1: Column | str,
    lat2: Column | str,
    lon2: Column | str,
) -> Column:
    """great_circle_distance(lat1, lon1, lat2, lon2) -> km
    (SphericalGeographyUtils.java:82 greatCircleDistance) — the
    reference's spherical-Vincenty atan2 form on its 6371.01 km mean
    earth radius. atan2(sqrt(t1²+t2²), t3) is well-conditioned at
    both the near-zero and near-antipodal tails, where plain
    haversine (asin form) loses precision — same formula, same
    floating-point shape, so parity holds in the tails too."""
    rlat1 = F.radians(_c(lat1))
    rlat2 = F.radians(_c(lat2))
    sin1, cos1 = F.sin(rlat1), F.cos(rlat1)
    sin2, cos2 = F.sin(rlat2), F.cos(rlat2)
    dlon = F.radians(_c(lon1)) - F.radians(_c(lon2))
    cos_dlon = F.cos(dlon)
    t1 = cos2 * F.sin(dlon)
    t2 = cos1 * sin2 - sin1 * cos2 * cos_dlon
    t3 = sin1 * sin2 + cos1 * cos2 * cos_dlon
    return F.atan2(F.sqrt(t1 * t1 + t2 * t2), t3) * F.lit(EARTH_RADIUS_KM)


# ---- multi-geometries (subset) + point buffer ------------------------------
# ST_MultiPoint (GeoFunctions.java:171) is array<point> natively in
# this engine's geometry model; MULTIPOINT/MULTILINESTRING WKT parse/
# render with the same string expressions as the single forms. A
# MULTILINESTRING is array<array<point>>; its ST_Length is the sum of
# member lengths. ST_Buffer (GeoFunctions.java:277) on a POINT is a
# regular-polygon circle approximation (the classic N-gon buffer —
# a geometry library refines the same idea); buffers of lines/
# polygons stay out of scope.


def st_multipoint_from_text(wkt: Column | str) -> Column:
    """ST_GeometryFromText('MULTIPOINT (x y, x y, ...)') ->
    array<point>. Both WKT spellings parse: bare pairs and the
    parenthesized '(x y), (x y)' form."""
    inner = F.regexp_extract(_c(wkt), r"^MULTIPOINT \((.+)\)$", 1)
    cleaned = F.regexp_replace(inner, r"[()]", "")
    return F.when(inner != "", _coords_to_points(cleaned))


def st_as_text_multipoint(pts: Column | str) -> Column:
    """ST_AsText(multipoint) -> 'MULTIPOINT (x y, x y, ...)'."""
    coords = F.array_join(
        F.transform(
            _c(pts),
            lambda q: F.concat(
                q.getField("x").cast("string"),
                F.lit(" "),
                q.getField("y").cast("string"),
            ),
        ),
        ", ",
    )
    return F.concat(F.lit("MULTIPOINT ("), coords, F.lit(")"))


def st_multiline_from_text(wkt: Column | str) -> Column:
    """ST_GeometryFromText('MULTILINESTRING ((...), (...))') ->
    array<array<point>> (same ring-splitting as polygon holes)."""
    inner = F.regexp_extract(_c(wkt), r"^MULTILINESTRING \((.+)\)$", 1)
    lines_txt = F.split(inner, r"\)\s*,\s*\(")
    cleaned = F.transform(
        lines_txt, lambda r: F.regexp_replace(r, r"^\(|\)$", "")
    )
    return F.when(
        inner != "",
        F.transform(cleaned, lambda r: _coords_to_points(r)),
    )


def st_length_multi(lines: Column | str) -> Column:
    """ST_Length(multilinestring): sum of member linestring lengths."""
    return F.aggregate(
        _c(lines), F.lit(0.0), lambda acc, line: acc + st_length(line)
    )


def st_buffer_point(p: Column | str, radius, sides: int = 32) -> Column:
    """ST_Buffer(point, r) as a closed regular ``sides``-gon ring
    (GeoFunctions.java:277; the Esri buffer of a point is a circle —
    this is its N-gon approximation, area within cos(pi/n) of the
    disc). Vertex k sits at angle 2*pi*k/n — plain cos/sin Column
    math, so the ring feeds every other geo function (area, length,
    contains) unchanged."""
    pp = _c(p)
    r = F.lit(float(radius)) if isinstance(radius, (int, float)) else radius
    two_pi = 2.0 * math.pi
    return F.transform(
        F.sequence(F.lit(0), F.lit(sides)),
        lambda k: F.struct(
            (st_x(pp) + r * F.cos(k.cast("double") * (two_pi / sides)))
            .alias("x"),
            (st_y(pp) + r * F.sin(k.cast("double") * (two_pi / sides)))
            .alias("y"),
        ),
    )


# ---- general ST_Distance (point <-> linestring / polygon) ------------------
# GeoFunctions.java stDistance accepts any geometry pair (Esri
# kernel). The point-vs-line and point-vs-polygon cases are closed
# forms over segments: distance to a segment is the distance to the
# clamped projection onto it. This also gives exact ST_Buffer
# CONTAINMENT for lines without constructing the capsule boundary:
# a point lies in ST_Buffer(line, r) iff its distance to the line is
# <= r (the buffer IS the distance-<=-r set) — the representable
# subset of line buffers noted at st_buffer_point.


def _seg_dist2(p: Column, a: Column, b: Column) -> Column:
    """Squared distance from point p to segment (a, b): clamp the
    projection parameter t to [0, 1], then squared distance to the
    projected point. Zero-length segments fall back to the vertex
    distance (the t expression would divide by zero)."""
    vx = b.getField("x") - a.getField("x")
    vy = b.getField("y") - a.getField("y")
    wx = st_x(p) - a.getField("x")
    wy = st_y(p) - a.getField("y")
    len2 = vx * vx + vy * vy
    t = F.greatest(
        F.lit(0.0), F.least(F.lit(1.0), (wx * vx + wy * vy) / len2)
    )
    dx = wx - t * vx
    dy = wy - t * vy
    return F.when(len2 == 0.0, wx * wx + wy * wy).otherwise(
        dx * dx + dy * dy
    )


def _line_min_dist2(line: Column, p: Column) -> Column:
    n = F.greatest(F.size(line) - 1, F.lit(0))
    d2s = F.zip_with(
        F.slice(line, 1, n),
        F.slice(line, 2, n),
        lambda a, b: _seg_dist2(p, a, b),
    )
    # A degenerate single-vertex linestring has no segments (array_min
    # over an empty array is NULL); the Esri kernel measures to the
    # lone vertex, so fall back to the point-to-vertex distance.
    v0 = F.element_at(line, 1)
    wx = st_x(p) - v0.getField("x")
    wy = st_y(p) - v0.getField("y")
    return F.coalesce(F.array_min(d2s), wx * wx + wy * wy)


def st_distance_point_line(p: Column | str, line: Column | str) -> Column:
    """ST_Distance(point, linestring): min over segments of the
    point-to-segment distance (GeoFunctions.java stDistance for the
    point/line pair). Pure Column math, O(vertices) per row."""
    return F.sqrt(_line_min_dist2(_c(line), _c(p)))


def st_distance_point_polygon(
    rings: Column | str, p: Column | str
) -> Column:
    """ST_Distance(point, polygon): 0 when the point is inside the
    polygon (even-odd over outer + holes), else the distance to the
    nearest boundary edge over ALL rings — a point inside a hole is
    outside the polygon and measures to the hole boundary."""
    rr, pp = _c(rings), _c(p)
    boundary = F.sqrt(
        F.array_min(
            F.transform(rr, lambda ring: _line_min_dist2(ring, pp))
        )
    )
    return F.when(st_contains_polygon(rr, pp), F.lit(0.0)).otherwise(
        boundary
    )


def st_line_buffer_contains(
    line: Column | str, radius, p: Column | str
) -> Column:
    """ST_Contains(ST_Buffer(linestring, r), point) without
    constructing the capsule polygon: membership in the buffer is
    exactly distance(line, point) <= r."""
    r = F.lit(float(radius)) if isinstance(radius, (int, float)) else radius
    return st_distance_point_line(p, line) <= r


def seg_dist2_sql(px, py, x1, y1, x2, y2) -> str:
    """SQL twin of _seg_dist2 for fixed or expression endpoints —
    identical clamp/projection arithmetic so DuckDB reproduces the
    engine's doubles exactly."""
    vx, vy = f"({x2} - {x1})", f"({y2} - {y1})"
    wx, wy = f"({px} - {x1})", f"({py} - {y1})"
    len2 = f"({vx} * {vx} + {vy} * {vy})"
    t = (
        f"greatest(0.0, least(1.0, ({wx} * {vx} + {wy} * {vy}) / {len2}))"
    )
    dx = f"({wx} - {t} * {vx})"
    dy = f"({wy} - {t} * {vy})"
    return (
        f"(CASE WHEN {len2} = 0.0 THEN {wx} * {wx} + {wy} * {wy} "
        f"ELSE {dx} * {dx} + {dy} * {dy} END)"
    )


def line_dist_sql(px, py, vertices) -> str:
    """SQL twin of st_distance_point_line over fixed/expression
    vertex pairs."""
    d2s = ", ".join(
        seg_dist2_sql(px, py, x1, y1, x2, y2)
        for (x1, y1), (x2, y2) in zip(vertices, vertices[1:])
    )
    return f"sqrt(least({d2s}))"


def polygon_dist_sql(px, py, rings) -> str:
    """SQL twin of st_distance_point_polygon for FIXED rings."""
    d2s = ", ".join(
        seg_dist2_sql(px, py, x1, y1, x2, y2)
        for ring in rings
        for (x1, y1), (x2, y2) in zip(ring, ring[1:])
    )
    contains = ray_cast_holes_sql(px, py, rings)
    return f"(CASE WHEN {contains} THEN 0.0 ELSE sqrt(least({d2s})) END)"


# ---- ST_Intersects / ST_Crosses (segment-arithmetic cases) -----------------
# GeoFunctions.java stIntersects/stCrosses delegate to the Esri
# kernel; for line/line and polygon/polygon the predicate is exact
# segment arithmetic: two segments intersect iff the endpoints of
# each straddle the other's supporting line (orientation sign
# products), with the collinear cases resolved by bounding-box
# overlap. Polygons additionally intersect when one contains the
# other's first vertex (covers the nested case with no edge
# crossings). All closed-form doubles — replayable in SQL.


def _orient(a: Column, b: Column, c: Column) -> Column:
    """Signed orientation of c relative to directed a->b
    (cross product of (b-a) x (c-a))."""
    return (b.getField("x") - a.getField("x")) * (
        c.getField("y") - a.getField("y")
    ) - (b.getField("y") - a.getField("y")) * (
        c.getField("x") - a.getField("x")
    )


def _on_seg(a: Column, b: Column, c: Column) -> Column:
    """Collinear c lies within the bounding box of segment (a, b)."""
    ax, ay = a.getField("x"), a.getField("y")
    bx, by = b.getField("x"), b.getField("y")
    cx, cy = c.getField("x"), c.getField("y")
    return (
        (F.least(ax, bx) <= cx)
        & (cx <= F.greatest(ax, bx))
        & (F.least(ay, by) <= cy)
        & (cy <= F.greatest(ay, by))
    )


def _segs_intersect(
    a1: Column, a2: Column, b1: Column, b2: Column
) -> Column:
    o1 = _orient(a1, a2, b1)
    o2 = _orient(a1, a2, b2)
    o3 = _orient(b1, b2, a1)
    o4 = _orient(b1, b2, a2)
    proper = (o1 * o2 < 0.0) & (o3 * o4 < 0.0)
    return (
        proper
        | ((o1 == 0.0) & _on_seg(a1, a2, b1))
        | ((o2 == 0.0) & _on_seg(a1, a2, b2))
        | ((o3 == 0.0) & _on_seg(b1, b2, a1))
        | ((o4 == 0.0) & _on_seg(b1, b2, a2))
    )


def _segments(line: Column) -> Column:
    n = F.greatest(F.size(line) - 1, F.lit(0))
    return F.zip_with(
        F.slice(line, 1, n),
        F.slice(line, 2, n),
        lambda a, b: F.struct(a.alias("p"), b.alias("q")),
    )


def st_intersects_lines(la: Column | str, lb: Column | str) -> Column:
    """ST_Intersects(linestring, linestring): any segment pair
    intersects. O(n*m) per row in whole-stage codegen — linestrings
    in relational rows are short; the distributed shape for big
    geometry sets is the grid-bucketed spatial join."""
    sa, sb = _segments(_c(la)), _segments(_c(lb))
    return F.exists(
        sa,
        lambda s: F.exists(
            sb,
            lambda t: _segs_intersect(
                s.getField("p"), s.getField("q"),
                t.getField("p"), t.getField("q"),
            ),
        ),
    )


def st_intersects_polygons(ra: Column | str, rb: Column | str) -> Column:
    """ST_Intersects(polygon, polygon) for single-ring polygons:
    boundary edges cross, OR one polygon contains the other's first
    vertex (the fully-nested case)."""
    a, b = _c(ra), _c(rb)
    return (
        st_intersects_lines(a, b)
        | st_contains_ring(a, F.element_at(b, 1))
        | st_contains_ring(b, F.element_at(a, 1))
    )


def orient_sql(a, b, c) -> str:
    """SQL twin of _orient; points are (x, y) expression pairs."""
    return (
        f"(({b[0]} - {a[0]}) * ({c[1]} - {a[1]})"
        f" - ({b[1]} - {a[1]}) * ({c[0]} - {a[0]}))"
    )


def seg_intersect_sql(a1, a2, b1, b2) -> str:
    """SQL twin of _segs_intersect."""
    o1 = orient_sql(a1, a2, b1)
    o2 = orient_sql(a1, a2, b2)
    o3 = orient_sql(b1, b2, a1)
    o4 = orient_sql(b1, b2, a2)

    def on_seg(a, b, c):
        return (
            f"(least({a[0]}, {b[0]}) <= {c[0]}"
            f" AND {c[0]} <= greatest({a[0]}, {b[0]})"
            f" AND least({a[1]}, {b[1]}) <= {c[1]}"
            f" AND {c[1]} <= greatest({a[1]}, {b[1]}))"
        )

    return (
        f"(({o1} * {o2} < 0.0 AND {o3} * {o4} < 0.0)"
        f" OR ({o1} = 0.0 AND {on_seg(a1, a2, b1)})"
        f" OR ({o2} = 0.0 AND {on_seg(a1, a2, b2)})"
        f" OR ({o3} = 0.0 AND {on_seg(b1, b2, a1)})"
        f" OR ({o4} = 0.0 AND {on_seg(b1, b2, a2)}))"
    )


def lines_intersect_sql(va, vb) -> str:
    """SQL twin of st_intersects_lines over fixed/expression vertex
    lists."""
    terms = [
        seg_intersect_sql(a1, a2, b1, b2)
        for a1, a2 in zip(va, va[1:])
        for b1, b2 in zip(vb, vb[1:])
    ]
    return "(" + " OR ".join(terms) + ")"


# ---- MULTIPOLYGON / GEOMETRYCOLLECTION / ST_Union (subset) -----------------
# A MULTIPOLYGON in this engine's typed model is
# array<array<array<point>>> — polygons -> rings (outer first, then
# holes) -> closed point rings. Containment extends the even-odd rule
# across every ring of every member polygon (valid for the disjoint
# member polygons OGC requires of a MULTIPOLYGON); area sums
# outer-minus-holes per member. A GEOMETRYCOLLECTION parses into its
# member WKTs + standard type names (GeometryType.java:23-29), each
# member feeding the existing single-geometry parsers — the same
# recursive shape the reference's Esri-backed collection takes.
# ST_Union covers the exactly-representable cases: point-set union
# (dedup) and union of polygons with DISJOINT interiors (concat into
# a multipolygon — the grid/tile pipeline case); overlapping-polygon
# boundary clipping needs a geometry kernel and stays out of scope.


def st_multipolygon_from_text(wkt: Column | str) -> Column:
    """ST_GeometryFromText('MULTIPOLYGON (((...)), ((...), (hole)))')
    -> array<array<array<point>>>. Polygons split on the ')), (('
    boundary, rings inside each polygon on '), (' — coordinates never
    contain parens, so the two-level split is unambiguous with pure
    string expressions."""
    inner = F.regexp_extract(_c(wkt), r"^MULTIPOLYGON \((.+)\)$", 1)
    polys_txt = F.split(inner, r"\)\)\s*,\s*\(\(")
    return F.when(
        inner != "",
        F.transform(
            polys_txt,
            lambda poly: F.transform(
                F.split(
                    F.regexp_replace(poly, r"^\(+|\)+$", ""),
                    r"\)\s*,\s*\(",
                ),
                lambda ring: _coords_to_points(ring),
            ),
        ),
    )


def st_as_text_multipolygon(polys: Column | str) -> Column:
    """ST_AsText(multipolygon) -> 'MULTIPOLYGON (((...)), ...)'."""
    def ring_txt(ring):
        return F.concat(
            F.lit("("),
            F.array_join(
                F.transform(
                    ring,
                    lambda q: F.concat(
                        q.getField("x").cast("string"),
                        F.lit(" "),
                        q.getField("y").cast("string"),
                    ),
                ),
                ", ",
            ),
            F.lit(")"),
        )

    poly_txt = F.transform(
        _c(polys),
        lambda rings: F.concat(
            F.lit("("),
            F.array_join(F.transform(rings, ring_txt), ", "),
            F.lit(")"),
        ),
    )
    return F.concat(
        F.lit("MULTIPOLYGON ("), F.array_join(poly_txt, ", "), F.lit(")")
    )


def st_contains_multipolygon(polys: Column | str, p: Column | str) -> Column:
    """ST_Contains(multipolygon, point): crossing parity over EVERY
    ring of EVERY member polygon. For the disjoint members a valid
    MULTIPOLYGON requires, a point interior to one member crosses
    that member's rings an odd total and every other member's an even
    total — the global parity is exactly membership. Same whole-stage
    codegen fold as st_contains_polygon, one level deeper."""
    pp = _c(p)
    total = F.aggregate(
        _c(polys),
        F.lit(0),
        lambda acc, rings: acc
        + F.aggregate(
            rings, F.lit(0), lambda a2, ring: a2 + _ring_crossings(ring, pp)
        ),
    )
    return total % 2 == 1


def st_area_polygon(rings: Column | str) -> Column:
    """ST_Area of a polygon with holes: |outer| minus the hole areas
    (shoelace absolute value per ring — holes subtract regardless of
    their winding)."""
    r = _c(rings)
    outer = F.abs(_shoelace_2a(F.element_at(r, 1))) / 2.0
    holes = F.aggregate(
        F.slice(r, 2, F.greatest(F.size(r) - 1, F.lit(0))),
        F.lit(0.0),
        lambda acc, ring: acc + F.abs(_shoelace_2a(ring)) / 2.0,
    )
    return outer - holes


def st_area_multipolygon(polys: Column | str) -> Column:
    """ST_Area(multipolygon): sum of member polygon areas."""
    return F.aggregate(
        _c(polys),
        F.lit(0.0),
        lambda acc, rings: acc + st_area_polygon(rings),
    )


_GEOM_STANDARD_NAMES = {
    "POINT": "ST_Point",
    "MULTIPOINT": "ST_MultiPoint",
    "LINESTRING": "ST_LineString",
    "MULTILINESTRING": "ST_MultiLineString",
    "POLYGON": "ST_Polygon",
    "MULTIPOLYGON": "ST_MultiPolygon",
    "GEOMETRYCOLLECTION": "ST_GeomCollection",
}


def st_geometry_type(wkt: Column | str) -> Column:
    """ST_GeometryType -> the OGC standard name
    (GeometryType.java:23-29 standardName: ST_Point, ST_LineString,
    ST_Polygon, ST_Multi*, ST_GeomCollection)."""
    tag = F.regexp_extract(_c(wkt), r"^([A-Z]+)", 1)
    expr = F.lit(None).cast("string")
    for raw, std in _GEOM_STANDARD_NAMES.items():
        expr = F.when(tag == raw, F.lit(std)).otherwise(expr)
    return expr


def st_collection_members(wkt: Column | str) -> Column:
    """GEOMETRYCOLLECTION (...) -> array of member WKT strings.
    Members split on commas FOLLOWED BY a geometry keyword (lookahead
    — coordinates never start with a letter), so nested commas inside
    member coordinate lists survive. Each member string feeds the
    existing typed parsers (st_point_from_text & co.) — recursion via
    composition, as the SQL user would write it."""
    inner = F.regexp_extract(
        _c(wkt), r"^GEOMETRYCOLLECTION \((.+)\)$", 1
    )
    return F.when(
        inner != "", F.transform(F.split(inner, r",\s*(?=[A-Z])"), F.trim)
    )


def st_num_geometries(wkt: Column | str) -> Column:
    """ST_NumGeometries over a collection WKT (1 for single
    geometries, member count for GEOMETRYCOLLECTION — matching the
    reference's OGCConcreteGeometryCollection.numGeometries)."""
    members = st_collection_members(wkt)
    return F.coalesce(F.size(members), F.lit(1)).cast("bigint")


def st_geometry_n(wkt: Column | str, n) -> Column:
    """ST_GeometryN(collection, n) -> member WKT (1-based, NULL out
    of range; the single-geometry case returns the geometry itself
    for n=1, reference GeoFunctions stGeometryN)."""
    nn = F.lit(n) if isinstance(n, int) else n
    members = F.coalesce(
        st_collection_members(wkt), F.array(_c(wkt))
    )
    return F.when(
        (nn >= 1) & (nn <= F.size(members)), F.element_at(members, nn)
    )


def st_union_multipoint(a: Column | str, b: Column | str) -> Column:
    """ST_Union of two point sets -> deduplicated multipoint
    (array_union on the typed point structs)."""
    return F.array_union(_c(a), _c(b))


def st_union_disjoint_polygons(a: Column | str, b: Column | str) -> Column:
    """ST_Union of two multipolygons whose interiors are DISJOINT
    (the tiling/partition case): the union is exactly the member
    concatenation. Overlapping unions require boundary clipping (a
    geometry kernel) — out of scope, documented."""
    return F.concat(_c(a), _c(b))


def geometry_to_bing_tiles_envelope(
    lat_min, lat_max, lon_min, lon_max, zoom: Column | str
) -> Column:
    """geometry_to_bing_tiles for the envelope path
    (BingTileFunctions.java:378 geometryToBingTiles — points and
    rectangles take the pure tile-range branch; general shapes add a
    per-tile disjoint filter the Esri kernel performs): the covering
    grid spans from the tile of (lat_max, lon_min) to the tile of
    (lat_min, lon_max), with the reference's border-touch shrink
    (:401-414): when the lower-right tile's upper-left corner falls
    EXACTLY on the envelope's max-x / min-y border, the range
    retreats one tile in that axis. Returns
    array<struct<x:int,y:int>> row-major — pure Column sequence
    arithmetic, identical doubles both engines."""
    la0 = _c(lat_min).cast("double")
    la1 = _c(lat_max).cast("double")
    lo0 = _c(lon_min).cast("double")
    lo1 = _c(lon_max).cast("double")
    zz = _c(zoom).cast("int")
    lu = bing_tile_at(la1, lo0, zz)
    rl = bing_tile_at(la0, lo1, zz)
    m = _map_size(zz)
    x1, y1 = lu.getField("x"), lu.getField("y")
    rx, ry = rl.getField("x"), rl.getField("y")
    corner_lon = 360.0 * (
        F.least(rx.cast("double") * _TILE_PIXELS, m) / m - 0.5
    )
    corner_lat = 90.0 - 360.0 * F.atan(
        F.exp(
            -(0.5 - F.least(ry.cast("double") * _TILE_PIXELS, m) / m)
            * (2.0 * math.pi)
        )
    ) / math.pi
    x2 = F.when((rx > x1) & (corner_lon == lo1), rx - 1).otherwise(rx)
    y2 = F.when((ry > y1) & (corner_lat == la0), ry - 1).otherwise(ry)
    return F.flatten(
        F.transform(
            F.sequence(y1, y2),
            lambda y: F.transform(
                F.sequence(x1, x2),
                lambda x: F.struct(x.alias("x"), y.alias("y")),
            ),
        )
    )


# ---- ST_ConvexHull (GeoFunctions.java stConvexHull) ------------------------
# The reference hands hulls to the Esri kernel; here Andrew's
# monotone chain over the typed point array — the one geometry
# function in this engine that needs sequential stack logic, so it
# runs as an Arrow pandas UDF (never row-at-a-time Python). The
# output ring is DETERMINISTIC: CCW, starting at the
# lexicographically smallest vertex, closed. Degenerate inputs
# return what they are: a single point or a 2-point segment.


def _hull_of(points: list[tuple[float, float]]) -> list[tuple[float, float]]:
    """Monotone-chain convex hull; CCW closed ring for >= 3 distinct
    non-collinear points, the sorted degenerate set otherwise."""
    pts = sorted(set(points))
    if len(pts) <= 2:
        return pts

    def half(seq):
        out: list[tuple[float, float]] = []
        for p in seq:
            while (
                len(out) >= 2
                and (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
                <= 0
            ):
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(reversed(pts))
    ring = lower[:-1] + upper[:-1]
    if len(ring) < 3:  # all collinear
        return [pts[0], pts[-1]]
    return ring + [ring[0]]


def st_convex_hull(pts: Column | str) -> Column:
    """ST_ConvexHull(multipoint) -> closed CCW hull ring
    (GeoFunctions.java stConvexHull). Arrow-batched pandas UDF over
    the typed point-array column."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<struct<x:double,y:double>>")
    def hull_udf(col):
        import pandas as pd

        out = []
        for arr in col:
            if arr is None:
                out.append(None)
                continue
            ring = _hull_of(
                [(float(p["x"]), float(p["y"])) for p in arr]
            )
            out.append([{"x": x, "y": y} for x, y in ring])
        return pd.Series(out)

    return hull_udf(_c(pts))


def convex_hull_agg(
    df, keys: list[str], x: str, y: str, partials: int = 16
):
    """Distributed convex-hull aggregate (the reference's
    convex_hull_agg / GeometryStateFactory path, re-planned for
    scale): hull(all points) == hull(union of partial hulls), so
    phase 1 computes a per-(key, salt) partial hull — output bounded
    by hull size, not partition size — and phase 2 merges the partial
    hull vertices per key. State never exceeds
    partials x hull_size points per key at the merge, which is what
    makes a 100 TB point set feasible; both phases are Arrow
    applyInPandas."""
    import pandas as pd
    from pyspark.sql import functions as SF

    def hull_pdf(pdf: pd.DataFrame, with_seq: bool) -> pd.DataFrame:
        ring = _hull_of(list(zip(pdf[x], pdf[y])))
        head = pdf.iloc[:1]
        rows = {k: [head[k].iloc[0]] * len(ring) for k in keys}
        if with_seq:
            rows["seq"] = list(range(len(ring)))
        rows[x] = [p[0] for p in ring]
        rows[y] = [p[1] for p in ring]
        return pd.DataFrame(rows)

    base = df.select(*keys, x, y)
    schema1 = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in base.schema.fields
    )
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in base.select(*keys).schema.fields
    )
    xy_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in base.select(x, y).schema.fields
    )
    schema2 = f"{key_fields}, seq int, {xy_fields}"
    salted = base.withColumn(
        "_hull_salt",
        SF.pmod(SF.hash(SF.col(x), SF.col(y)), SF.lit(partials)),
    )
    phase1 = salted.groupBy(*keys, "_hull_salt").applyInPandas(
        lambda pdf: hull_pdf(pdf.drop(columns=["_hull_salt"]), False),
        schema1,
    )
    # the explicit seq column carries the ring order through the
    # unordered exchange (rows have no implicit order post-shuffle)
    return phase1.groupBy(*keys).applyInPandas(
        lambda pdf: hull_pdf(pdf, True), schema2
    )


# ---- Bing tiles (presto-geospatial BingTileFunctions.java,
# BingTile.java) -------------------------------------------------------------
# The reference's quadkey tile system (the standard Bing Maps tile
# scheme, msdn bb259689): a tile is (x, y, zoomLevel), zoom <= 23,
# with a packed-bigint encoding and a base-4 quadkey string form.
# Engine model: struct<x:int, y:int, zoom:int>; every function below
# is pure Column arithmetic (trig + exact powers of two — bit shifts
# are expressed as divisions by 2^k, exact in IEEE doubles for the
# <= 23-bit coordinate range).

BING_MAX_ZOOM = 23
_TILE_PIXELS = 256


def bing_tile(x: Column | str, y: Column | str, zoom: Column | str) -> Column:
    """bing_tile(x, y, zoom) constructor (BingTileFunctions.java:117).
    Out-of-range coordinates (>= 2^zoom) yield NULL — the
    TRY-wrapped form of the reference's thrown error."""
    xx, yy, zz = _c(x).cast("int"), _c(y).cast("int"), _c(zoom).cast("int")
    valid = (
        (zz >= 0) & (zz <= BING_MAX_ZOOM)
        & (xx >= 0) & (xx < F.pow(F.lit(2.0), zz))
        & (yy >= 0) & (yy < F.pow(F.lit(2.0), zz))
    )
    return F.when(
        valid,
        F.struct(xx.alias("x"), yy.alias("y"), zz.alias("zoom")),
    )


def bing_tile_x(t: Column | str) -> Column:
    """bing_tile_coordinates(tile).x"""
    return _c(t).getField("x")


def bing_tile_y(t: Column | str) -> Column:
    """bing_tile_coordinates(tile).y"""
    return _c(t).getField("y")


def bing_tile_zoom_level(t: Column | str) -> Column:
    """bing_tile_zoom_level(tile) (BingTileFunctions.java:168)."""
    return _c(t).getField("zoom").cast("bigint")


def bing_tile_encode(t: Column | str) -> Column:
    """CAST(tile AS BIGINT) — the packed form (BingTile.java:165:
    version 0 in the top 5 bits, x << 32, zoom << 26, y low):
    y | x*2^32 | zoom*2^26."""
    tt = _c(t)
    return (
        tt.getField("y").cast("bigint")
        + tt.getField("x").cast("bigint") * F.lit(1 << 32).cast("bigint")
        + tt.getField("zoom").cast("bigint") * F.lit(1 << 26).cast("bigint")
    )


def bing_tile_decode(b: Column | str) -> Column:
    """CAST(bigint AS BingTile) — inverse of bing_tile_encode
    (BingTile.java:175 decode, version 0)."""
    bb = _c(b).cast("bigint")
    x = F.floor(bb / F.lit(float(1 << 32))).cast("int")
    zoom = F.pmod(F.floor(bb / F.lit(float(1 << 26))), F.lit(32)).cast("int")
    y = F.pmod(bb, F.lit(1 << 23)).cast("int")
    return F.struct(x.alias("x"), y.alias("y"), zoom.alias("zoom"))


def _bit_at(v: Column, k: Column) -> Column:
    """(v >> k) & 1 as exact double-division arithmetic."""
    return F.pmod(F.floor(v.cast("double") / F.pow(F.lit(2.0), k)), F.lit(2))


def bing_tile_quadkey(t: Column | str) -> Column:
    """bing_tile_quadkey(tile) -> base-4 string, most significant
    bit first (BingTile.java:141 toQuadKey: digit_i =
    bit(x, zoom-i) + 2*bit(y, zoom-i))."""
    tt = _c(t)
    x, y, zoom = tt.getField("x"), tt.getField("y"), tt.getField("zoom")
    return F.array_join(
        F.transform(
            F.sequence(F.lit(1), zoom),
            lambda i: (
                _bit_at(x, zoom - i) + _bit_at(y, zoom - i) * 2
            ).cast("int").cast("string"),
        ),
        "",
    )


def bing_tile_from_quadkey(qk: Column | str) -> Column:
    """bing_tile(quadkey) (BingTileFunctions.java:176,
    BingTile.java:94 fromQuadKey): zoom = length, digit at position
    i contributes bit (zoom - i) of x (low bit of digit) and y
    (high bit). NULL for malformed digits or zoom > 23."""
    q = _c(qk)
    zoom = F.length(q)

    def accum(which_bit):
        return F.aggregate(
            F.sequence(F.lit(1), zoom),
            F.lit(0).cast("bigint"),
            lambda acc, i: acc
            + F.pmod(
                F.floor(
                    F.substring(q, i, 1).cast("double")
                    / (2.0 if which_bit else 1.0)
                ),
                F.lit(2),
            ).cast("bigint")
            * F.pow(F.lit(2.0), (zoom - i).cast("double")).cast("bigint"),
        )

    valid = (zoom <= BING_MAX_ZOOM) & q.rlike("^[0-3]*$")
    return F.when(
        valid,
        F.struct(
            accum(False).cast("int").alias("x"),
            accum(True).cast("int").alias("y"),
            zoom.cast("int").alias("zoom"),
        ),
    )


def _map_size(zoom: Column) -> Column:
    return F.lit(float(_TILE_PIXELS)) * F.pow(F.lit(2.0), zoom.cast("double"))


def _axis_to_tile(axis: Column, map_size: Column) -> Column:
    clipped = F.least(
        F.greatest(axis * map_size, F.lit(0.0)), map_size - 1
    )
    # Java (int) cast truncates toward zero; values are >= 0 -> floor
    return F.floor(F.floor(clipped) / _TILE_PIXELS).cast("int")


def bing_tile_at(
    lat: Column | str, lon: Column | str, zoom: Column | str
) -> Column:
    """bing_tile_at(latitude, longitude, zoom)
    (BingTileFunctions.java:185 -> :620 latitudeLongitudeToTile,
    :637 longitudeToTileX / :643 longitudeToTileY): Mercator pixel
    math on the clipped WGS84 square. NULL outside lat
    [-85.05112878, 85.05112878] / lon [-180, 180] (TRY-form of the
    thrown error)."""
    la, lo = _c(lat).cast("double"), _c(lon).cast("double")
    zz = _c(zoom).cast("int")
    m = _map_size(zz)
    sin_lat = F.sin(la * math.pi / 180.0)
    x_axis = (lo + 180.0) / 360.0
    y_axis = (
        F.lit(0.5)
        - F.log((1.0 + sin_lat) / (1.0 - sin_lat)) / (4.0 * math.pi)
    )
    valid = (
        la.between(-85.05112878, 85.05112878)
        & lo.between(-180.0, 180.0)
        & (zz >= 0) & (zz <= BING_MAX_ZOOM)
    )
    return F.when(
        valid,
        F.struct(
            _axis_to_tile(x_axis, m).alias("x"),
            _axis_to_tile(y_axis, m).alias("y"),
            zz.alias("zoom"),
        ),
    )


def bing_tiles_around(
    lat: Column | str, lon: Column | str, zoom: Column | str
) -> Column:
    """bing_tiles_around(lat, lon, zoom) (BingTileFunctions.java:200):
    the 3x3 neighborhood of the containing tile, clipped to the
    valid coordinate range — array<tile> in row-major (dx, dy)
    order matching the reference's loop."""
    center = bing_tile_at(lat, lon, zoom)
    zz = _c(zoom).cast("int")
    max_index = F.pow(F.lit(2.0), zz.cast("double")).cast("int") - 1
    cx, cy = center.getField("x"), center.getField("y")
    offsets = F.flatten(
        F.transform(
            F.sequence(F.lit(-1), F.lit(1)),
            lambda dx: F.transform(
                F.sequence(F.lit(-1), F.lit(1)),
                lambda dy: F.struct(dx.alias("dx"), dy.alias("dy")),
            ),
        )
    )
    return F.filter(
        F.transform(
            offsets,
            lambda o: F.when(
                ((cx + o.getField("dx")).between(F.lit(0), max_index))
                & ((cy + o.getField("dy")).between(F.lit(0), max_index)),
                F.struct(
                    (cx + o.getField("dx")).cast("int").alias("x"),
                    (cy + o.getField("dy")).cast("int").alias("y"),
                    zz.alias("zoom"),
                ),
            ),
        ),
        lambda t: t.isNotNull(),
    )


def bing_tile_polygon(t: Column | str) -> Column:
    """bing_tile_polygon(tile) (BingTileFunctions.java:366 ->
    tileToEnvelope): the tile's lat/lon envelope as a closed ring
    (feeds st_area/st_contains_ring directly). Corner math is the
    :?? tileXYToLatitudeLongitude inverse-Mercator:
    lat = 90 - 360*atan(exp(-y_axis*2*pi))/pi, lon = 360*x_axis."""
    tt = _c(t)
    zoom = tt.getField("zoom")
    m = _map_size(zoom)

    def lon_at(tile_x):
        x_axis = (
            F.least(tile_x.cast("double") * _TILE_PIXELS, m) / m - 0.5
        )
        return 360.0 * x_axis

    def lat_at(tile_y):
        y_axis = (
            F.lit(0.5)
            - F.least(tile_y.cast("double") * _TILE_PIXELS, m) / m
        )
        return (
            F.lit(90.0)
            - 360.0 * F.atan(F.exp(-y_axis * 2.0 * math.pi)) / math.pi
        )

    x0, x1 = tt.getField("x"), tt.getField("x") + 1
    y0, y1 = tt.getField("y"), tt.getField("y") + 1
    nw = st_point(lon_at(x0), lat_at(y0))
    ne = st_point(lon_at(x1), lat_at(y0))
    se = st_point(lon_at(x1), lat_at(y1))
    sw = st_point(lon_at(x0), lat_at(y1))
    return F.array(nw, ne, se, sw, nw)
