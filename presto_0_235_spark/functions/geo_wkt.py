"""Pure-Python planar WKT engine backing the SQL-surface ST_* family.

The engine's DataFrame path implements geometry as Spark Column
expressions (functions/geo.py — oracle-green, used by the
fn_geospatial_* registry queries). The SQL front door needs callable
functions, and Spark 4's classic API cannot serialize a Column back
to SQL text, so this module re-expresses the same planar semantics as
per-value Python over canonical WKT strings, exposed through
Arrow-batched pandas UDFs (functions/udfs.py pattern; geometry values
are small strings, the scalar functions are not hot-path operators —
the DataFrame path remains the bulk-data route).

Parity sources (cited per function): the reference's
presto-geospatial GeoFunctions.java (ESRI-backed planar ops),
BingTileUtils.java (public Bing maps tile system math), and
presto-geospatial-toolkit SphericalGeographyUtils.java:82-108
(Vincenty great-circle, EARTH_RADIUS_KM = 6371.01). Out of scope this
round (documented): ST_Buffer/ST_Intersection/ST_Difference/
ST_SymDifference/ST_Relate/ST_IsValid (the polygon-clip engine in
functions/geo_clip.py carries the DataFrame-path versions) and the
SphericalGeography type beyond great_circle_distance.

Geometry model: ``(tag, payload)`` where tag is one of POINT /
MULTIPOINT / LINESTRING / MULTILINESTRING / POLYGON / MULTIPOLYGON /
GEOMETRYCOLLECTION and payload is None (EMPTY), a point, a point
list, a ring list, etc. Canonical text follows ESRI's AsText: integer
coordinates print without a decimal point ("POINT (1 4)"),
multipoints print with per-point parens ("MULTIPOINT ((1 2), (3 4))").
"""

from __future__ import annotations

import math
import re
import sys

# Executor Python workers don't share the driver's sys.path edits —
# same pickle-by-value convention as every worker-side module here.
try:
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

EARTH_RADIUS_KM = 6371.01  # SphericalGeographyUtils.java:36
MIN_LATITUDE = -85.05112878  # BingTileUtils.java (Bing tile system)
MAX_LATITUDE = 85.05112878


# --------------------------------------------------------------------------
# WKT parse / format
# --------------------------------------------------------------------------

_TAGS = (
    "GEOMETRYCOLLECTION",
    "MULTILINESTRING",
    "MULTIPOLYGON",
    "MULTIPOINT",
    "LINESTRING",
    "POLYGON",
    "POINT",
)


def _parse_points(text: str) -> list[tuple[float, float]]:
    pts = []
    for part in text.split(","):
        nums = part.replace("(", " ").replace(")", " ").split()
        if len(nums) != 2:
            raise ValueError(f"Invalid WKT coordinates: {part!r}")
        pts.append((float(nums[0]), float(nums[1])))
    return pts


def _split_groups(text: str) -> list[str]:
    """Split 'a, b), (c, d' style top-level paren groups."""
    groups, depth, start = [], 0, None
    for i, ch in enumerate(text):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                groups.append(text[start:i])
    if not groups:
        raise ValueError(f"Invalid WKT group: {text!r}")
    return groups


ENV_MARK = "ENV:"  # value-level analog of the reference's ENVELOPE
# serialization type (EsriGeometrySerde): ST_Envelope/expand_envelope
# produce it, every consumer strips it here, and ST_Intersection
# branches on it for the envelope fast path
# (GeoFunctions.java:960-1006).


def parse_wkt(s: str):
    """WKT text -> (tag, payload); raises ValueError on malformed
    input (the reference raises INVALID_FUNCTION_ARGUMENT)."""
    t = s.strip()
    if t.startswith(ENV_MARK):
        t = t[len(ENV_MARK):].strip()
    upper = t.upper()
    for tag in _TAGS:
        if upper.startswith(tag):
            body = t[len(tag):].strip()
            break
    else:
        raise ValueError(f"Invalid WKT: {s!r}")
    if body.upper() == "EMPTY":
        return (tag, None)
    if not (body.startswith("(") and body.endswith(")")):
        raise ValueError(f"Invalid WKT: {s!r}")
    inner = body[1:-1].strip()
    if tag == "POINT":
        pts = _parse_points(inner)
        if len(pts) != 1:
            raise ValueError(f"Invalid WKT: {s!r}")
        return (tag, pts[0])
    if tag in ("MULTIPOINT", "LINESTRING"):
        return (tag, _parse_points(inner))
    if tag == "MULTILINESTRING":
        return (tag, [_parse_points(g) for g in _split_groups(inner)])
    if tag == "POLYGON":
        rings = [_parse_points(g) for g in _split_groups(inner)]
        return (tag, _normalize_rings(rings))
    if tag == "MULTIPOLYGON":
        # split top-level polygon groups, each a ring list
        polys, depth, start = [], 0, None
        for i, ch in enumerate(body):
            if ch == "(":
                depth += 1
                if depth == 2 and start is None:
                    start = i
            elif ch == ")":
                if depth == 2 and start is not None:
                    pass
                depth -= 1
            if depth == 1 and start is not None and ch == ")":
                polys.append(body[start : i + 1])
                start = None
        if not polys:
            raise ValueError(f"Invalid WKT: {s!r}")
        return (tag, [
            _normalize_rings([_parse_points(g)
                              for g in _split_groups(p[1:-1])])
            for p in polys
        ])
    # GEOMETRYCOLLECTION: split on top-level tag boundaries
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(inner):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(inner[start:i])
            start = i + 1
    parts.append(inner[start:])
    return (tag, [parse_wkt(p) for p in parts])


def _ring_signed_area2(ring) -> float:
    return sum(x0 * y1 - x1 * y0
               for (x0, y0), (x1, y1) in _segments(ring))


def _normalize_rings(rings):
    """ESRI canonical ring orientation: exterior CLOCKWISE (negative
    shoelace in y-up coordinates), holes counterclockwise — the
    reference's AsText round trips pin exactly this (e.g. input ring
    1 1, 4 1, 1 4 comes back 1 1, 1 4, 4 1). Reversal keeps the first
    point first (closed rings)."""

    def orient(ring, want_cw: bool):
        a2 = _ring_signed_area2(ring)
        cw = a2 < 0
        if a2 == 0 or cw == want_cw:
            return ring
        # a closed ring reversed whole keeps its start point
        return ring[::-1]

    return [orient(r, want_cw=(i == 0)) for i, r in enumerate(rings)]


def _fmt_num(v: float) -> str:
    if v == int(v) and abs(v) < 1e16:
        return str(int(v))
    return repr(float(v))


def _fmt_pt(p) -> str:
    return f"{_fmt_num(p[0])} {_fmt_num(p[1])}"


def format_wkt(g) -> str:
    tag, payload = g
    if payload is None or payload == []:
        return f"{tag} EMPTY"
    if tag == "POINT":
        return f"POINT ({_fmt_pt(payload)})"
    if tag == "MULTIPOINT":
        return "MULTIPOINT ((" + "), (".join(_fmt_pt(p) for p in payload) + "))"
    if tag == "LINESTRING":
        return "LINESTRING (" + ", ".join(_fmt_pt(p) for p in payload) + ")"
    if tag == "MULTILINESTRING":
        return "MULTILINESTRING ((" + "), (".join(
            ", ".join(_fmt_pt(p) for p in line) for line in payload) + "))"
    if tag == "POLYGON":
        return "POLYGON ((" + "), (".join(
            ", ".join(_fmt_pt(p) for p in ring) for ring in payload) + "))"
    if tag == "MULTIPOLYGON":
        return "MULTIPOLYGON (" + ", ".join(
            "((" + "), (".join(", ".join(_fmt_pt(p) for p in ring)
                               for ring in poly) + "))"
            for poly in payload) + ")"
    return "GEOMETRYCOLLECTION (" + ", ".join(
        format_wkt(sub) for sub in payload) + ")"


def geometry_from_text(s: str) -> str:
    """ST_GeometryFromText / ST_AsText canonical echo
    (GeoFunctions.java stGeometryFromText/stAsText)."""
    return format_wkt(parse_wkt(s))


def point_wkt(x: float, y: float) -> str:
    if math.isnan(x) or math.isnan(y):
        raise ValueError("ST_Point: coordinates must not be NaN")
    return format_wkt(("POINT", (x, y)))


# --------------------------------------------------------------------------
# decomposition helpers
# --------------------------------------------------------------------------


def _all_points(g):
    tag, payload = g
    if payload is None:
        return
    if tag == "POINT":
        yield payload
    elif tag in ("MULTIPOINT", "LINESTRING"):
        yield from payload
    elif tag in ("MULTILINESTRING", "POLYGON"):
        for part in payload:
            yield from part
    elif tag == "MULTIPOLYGON":
        for poly in payload:
            for ring in poly:
                yield from ring
    else:
        for sub in payload:
            yield from _all_points(sub)


def _segments(pts):
    for a, b in zip(pts, pts[1:]):
        yield (a, b)


def _decompose(g):
    """-> (points, segments, polygon_ring_lists) for distance work."""
    tag, payload = g
    pts, segs, polys = [], [], []
    if payload is None:
        return pts, segs, polys
    if tag == "POINT":
        pts.append(payload)
    elif tag == "MULTIPOINT":
        pts.extend(payload)
    elif tag == "LINESTRING":
        segs.extend(_segments(payload))
    elif tag == "MULTILINESTRING":
        for line in payload:
            segs.extend(_segments(line))
    elif tag == "POLYGON":
        polys.append(payload)
    elif tag == "MULTIPOLYGON":
        polys.extend(payload)
    else:
        for sub in payload:
            p2, s2, g2 = _decompose(sub)
            pts += p2
            segs += s2
            polys += g2
    return pts, segs, polys


# --------------------------------------------------------------------------
# measures / predicates
# --------------------------------------------------------------------------


def envelope_bounds(wkt: str):
    pts = list(_all_points(parse_wkt(wkt)))
    if not pts:
        return None
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    return (min(xs), min(ys), max(xs), max(ys))


def envelope_wkt(wkt: str) -> str:
    b = envelope_bounds(wkt)
    if b is None:
        return ENV_MARK + "POLYGON EMPTY"
    x0, y0, x1, y1 = b
    ring = [(x0, y0), (x0, y1), (x1, y1), (x1, y0), (x0, y0)]
    return ENV_MARK + format_wkt(("POLYGON", [ring]))


def expand_envelope(wkt: str, distance: float) -> str:
    """GeoFunctions.java:899-918 expandEnvelope: envelope grown by
    `distance` on every side; NaN/negative distances raise, infinite
    bounds serialize as the empty polygon (the reference's pins at
    TestGeoFunctions.java:739-751)."""
    if math.isnan(distance):
        raise ValueError("expand_envelope: distance is NaN")
    if distance < 0:
        raise ValueError(
            f"expand_envelope: distance {distance} is negative"
        )
    b = envelope_bounds(wkt)
    if b is None or math.isinf(distance):
        return ENV_MARK + "POLYGON EMPTY"
    x0, y0, x1, y1 = (b[0] - distance, b[1] - distance,
                      b[2] + distance, b[3] + distance)
    ring = [(x0, y0), (x0, y1), (x1, y1), (x1, y0), (x0, y0)]
    return ENV_MARK + format_wkt(("POLYGON", [ring]))


_TYPE_NAMES = {
    "POINT": "ST_Point",
    "MULTIPOINT": "ST_MultiPoint",
    "LINESTRING": "ST_LineString",
    "MULTILINESTRING": "ST_MultiLineString",
    "POLYGON": "ST_Polygon",
    "MULTIPOLYGON": "ST_MultiPolygon",
    "GEOMETRYCOLLECTION": "ST_GeomCollection",
}


def geometry_type(wkt: str) -> str:
    """GeoFunctions.java stGeometryType ('ST_Point' style names)."""
    return _TYPE_NAMES[parse_wkt(wkt)[0]]


def point_x(wkt: str):
    tag, payload = parse_wkt(wkt)
    if tag != "POINT":
        raise ValueError("ST_X requires a Point")
    return None if payload is None else payload[0]


def point_y(wkt: str):
    tag, payload = parse_wkt(wkt)
    if tag != "POINT":
        raise ValueError("ST_Y requires a Point")
    return None if payload is None else payload[1]


def is_empty(wkt: str) -> bool:
    g = parse_wkt(wkt)
    return next(_all_points(g), None) is None


def is_closed(wkt: str) -> bool:
    tag, payload = parse_wkt(wkt)
    if tag == "LINESTRING":
        lines = [payload] if payload else []
    elif tag == "MULTILINESTRING":
        lines = payload or []
    else:
        raise ValueError(
            "ST_IsClosed only applies to LINE_STRING or MULTI_LINE_STRING"
        )
    return all(line[0] == line[-1] for line in lines) and bool(lines)


def _segs_cross(a, b, c, d) -> bool:
    """Proper interior crossing of segments ab and cd."""

    def orient(p, q, r):
        v = (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])
        return 0 if v == 0 else (1 if v > 0 else -1)

    o1, o2 = orient(a, b, c), orient(a, b, d)
    o3, o4 = orient(c, d, a), orient(c, d, b)
    return o1 != o2 and o3 != o4 and 0 not in (o1, o2, o3, o4)


def is_ring(wkt: str) -> bool:
    """Closed AND simple (GeoFunctions.java stIsRing)."""
    tag, payload = parse_wkt(wkt)
    if tag != "LINESTRING":
        raise ValueError("ST_IsRing only applies to LINE_STRING")
    if not payload or payload[0] != payload[-1]:
        return False
    segs = list(_segments(payload))
    for i in range(len(segs)):
        for j in range(i + 2, len(segs)):
            if i == 0 and j == len(segs) - 1:
                continue  # the closing segment legitimately meets seg 0
            if _segs_cross(*segs[i], *segs[j]):
                return False
    return True


def length(wkt: str) -> float:
    tag, payload = parse_wkt(wkt)
    if tag == "LINESTRING":
        lines = [payload] if payload else []
    elif tag == "MULTILINESTRING":
        lines = payload or []
    else:
        raise ValueError(
            "ST_Length only applies to LINE_STRING or MULTI_LINE_STRING"
        )
    return sum(
        math.dist(a, b) for line in lines for a, b in _segments(line)
    )


def num_interior_ring(wkt: str):
    tag, payload = parse_wkt(wkt)
    if tag != "POLYGON":
        raise ValueError("ST_NumInteriorRing only applies to POLYGON")
    return None if payload is None else len(payload) - 1


def exterior_ring(wkt: str):
    tag, payload = parse_wkt(wkt)
    if tag != "POLYGON":
        raise ValueError("ST_ExteriorRing only applies to POLYGON")
    if payload is None:
        return None
    return format_wkt(("LINESTRING", payload[0]))


def start_point(wkt: str):
    tag, payload = parse_wkt(wkt)
    if tag != "LINESTRING":
        raise ValueError("ST_StartPoint only applies to LINE_STRING")
    return None if not payload else format_wkt(("POINT", payload[0]))


def end_point(wkt: str):
    tag, payload = parse_wkt(wkt)
    if tag != "LINESTRING":
        raise ValueError("ST_EndPoint only applies to LINE_STRING")
    return None if not payload else format_wkt(("POINT", payload[-1]))


def num_points(wkt: str) -> int:
    return len(list(_all_points(parse_wkt(wkt))))


def _ring_area2_cx_cy(ring):
    """2*signed area and the (unnormalized) centroid accumulators.
    Coordinates are translated to the ring's mean first — the
    shoelace cross terms otherwise cancel catastrophically for small
    shapes far from the origin (a Bing tile at lon 60 lost 8 digits
    of centroid precision without this)."""
    mx = sum(p[0] for p in ring) / len(ring)
    my = sum(p[1] for p in ring) / len(ring)
    a2 = cx = cy = 0.0
    for (px0, py0), (px1, py1) in _segments(ring):
        x0, y0, x1, y1 = px0 - mx, py0 - my, px1 - mx, py1 - my
        cross = x0 * y1 - x1 * y0
        a2 += cross
        cx += (x0 + x1) * cross
        cy += (y0 + y1) * cross
    return a2, cx, cy, mx, my


def area(wkt: str) -> float:
    tag, payload = parse_wkt(wkt)
    if tag == "POLYGON":
        polys = [payload] if payload else []
    elif tag == "MULTIPOLYGON":
        polys = payload or []
    else:
        raise ValueError(
            "ST_Area only applies to POLYGON or MULTI_POLYGON"
        )
    total = 0.0
    for rings in polys:
        outer = abs(_ring_signed_area2(rings[0])) / 2.0
        holes = sum(abs(_ring_signed_area2(r)) / 2.0 for r in rings[1:])
        total += outer - holes
    return total


def centroid(wkt: str):
    g = parse_wkt(wkt)
    tag, payload = g
    pts = list(_all_points(g))
    if not pts:
        return "POINT EMPTY"
    if tag == "POINT":
        return format_wkt(g)
    if tag == "MULTIPOINT":
        n = len(payload)
        return point_wkt(sum(p[0] for p in payload) / n,
                         sum(p[1] for p in payload) / n)
    if tag in ("LINESTRING", "MULTILINESTRING"):
        lines = [payload] if tag == "LINESTRING" else payload
        tw = cx = cy = 0.0
        for line in lines:
            for a, b in _segments(line):
                w = math.dist(a, b)
                tw += w
                cx += w * (a[0] + b[0]) / 2.0
                cy += w * (a[1] + b[1]) / 2.0
        if tw == 0.0:
            return point_wkt(pts[0][0], pts[0][1])
        return point_wkt(cx / tw, cy / tw)
    if tag in ("POLYGON", "MULTIPOLYGON"):
        polys = [payload] if tag == "POLYGON" else payload
        tw = wx = wy = 0.0
        for rings in polys:
            for k, ring in enumerate(rings):
                a2, rcx, rcy, mx, my = _ring_area2_cx_cy(ring)
                if a2 == 0.0:
                    continue
                # ring centroid in global coordinates
                gx = mx + rcx / (3.0 * a2)
                gy = my + rcy / (3.0 * a2)
                w = abs(a2) / 2.0 * (1.0 if k == 0 else -1.0)
                tw += w
                wx += w * gx
                wy += w * gy
        if tw == 0.0:
            return point_wkt(pts[0][0], pts[0][1])
        return point_wkt(wx / tw, wy / tw)
    raise ValueError("ST_Centroid: unsupported geometry collection")


def boundary(wkt: str) -> str:
    """GeoFunctions.java stBoundary: points -> empty collection,
    lines -> MULTIPOINT of non-interior endpoints (sorted),
    polygons -> their ring lines."""
    tag, payload = parse_wkt(wkt)
    if tag in ("POINT", "MULTIPOINT"):
        return "GEOMETRYCOLLECTION EMPTY"
    if tag in ("LINESTRING", "MULTILINESTRING"):
        lines = ([payload] if tag == "LINESTRING" else payload) or []
        counts: dict = {}
        for line in lines:
            if line:
                for p in (line[0], line[-1]):
                    counts[p] = counts.get(p, 0) + 1
        # OGC mod-2 rule: endpoints shared an even number of times
        # (incl. a closed line's coincident ends) are interior.
        # Ordering follows the reference's AsText: a single line keeps
        # its own endpoint order, multi-line boundaries come out
        # coordinate-sorted (TestGeoFunctions.java stBoundary pins).
        odd = [p for p, c in counts.items() if c % 2 == 1]
        ends = odd if len(lines) == 1 else sorted(odd)
        return format_wkt(("MULTIPOINT", ends or None))
    if tag == "POLYGON":
        rings = payload or []
        if not rings:
            return "MULTILINESTRING EMPTY"
        if len(rings) == 1:
            return format_wkt(("LINESTRING", rings[0]))
        return format_wkt(("MULTILINESTRING", rings))
    if tag == "MULTIPOLYGON":
        rings = [r for poly in (payload or []) for r in poly]
        return format_wkt(("MULTILINESTRING", rings or None))
    raise ValueError("ST_Boundary: unsupported geometry")


# --------------------------------------------------------------------------
# distance
# --------------------------------------------------------------------------


def _pt_seg_dist(p, a, b) -> float:
    ax, ay = a
    bx, by = b
    px, py = p
    dx, dy = bx - ax, by - ay
    denom = dx * dx + dy * dy
    if denom == 0.0:
        return math.dist(p, a)
    t = max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / denom))
    return math.dist(p, (ax + t * dx, ay + t * dy))


def _seg_seg_dist(a, b, c, d) -> float:
    if _segs_cross(a, b, c, d):
        return 0.0
    return min(
        _pt_seg_dist(a, c, d), _pt_seg_dist(b, c, d),
        _pt_seg_dist(c, a, b), _pt_seg_dist(d, a, b),
    )


def _point_in_rings(p, rings) -> bool:
    """Ray cast against the outer ring minus holes."""

    def in_ring(pt, ring):
        x, y = pt
        inside = False
        for (x0, y0), (x1, y1) in _segments(ring):
            if (y0 > y) != (y1 > y):
                xin = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
                if x < xin:
                    inside = not inside
        return inside

    if not in_ring(p, rings[0]):
        return False
    return not any(in_ring(p, hole) for hole in rings[1:])


def distance(wkt1: str, wkt2: str):
    g1, g2 = parse_wkt(wkt1), parse_wkt(wkt2)
    p1, s1, poly1 = _decompose(g1)
    p2, s2, poly2 = _decompose(g2)
    if not (p1 or s1 or poly1) or not (p2 or s2 or poly2):
        return None  # empty geometry -> NULL (ESRI distance contract)
    # polygon interiors: containment means distance 0
    for polys, opts, osegs in ((poly1, p2, s2), (poly2, p1, s1)):
        for rings in polys:
            for p in opts:
                if _point_in_rings(p, rings):
                    return 0.0
            for a, b in osegs:
                if _point_in_rings(a, rings) or _point_in_rings(b, rings):
                    return 0.0
    # polygons of one inside the other: test a vertex
    for rings in poly1:
        for rings2 in poly2:
            if _point_in_rings(rings[0][0], rings2) or _point_in_rings(
                rings2[0][0], rings
            ):
                return 0.0
    # boundaries as segments
    for rings in poly1:
        for ring in rings:
            s1.extend(_segments(ring))
    for rings in poly2:
        for ring in rings:
            s2.extend(_segments(ring))
    best = math.inf
    for p in p1:
        for q in p2:
            best = min(best, math.dist(p, q))
        for c, d in s2:
            best = min(best, _pt_seg_dist(p, c, d))
    for a, b in s1:
        for q in p2:
            best = min(best, _pt_seg_dist(q, a, b))
        for c, d in s2:
            best = min(best, _seg_seg_dist(a, b, c, d))
    return best


def line_locate_point(line_wkt: str, point_wkt_s: str):
    """GeoFunctions.java lineLocatePoint: fraction of the line's
    length at the point closest to the given point."""
    tag, pts = parse_wkt(line_wkt)
    if tag != "LINESTRING":
        raise ValueError(
            "line_locate_point: first argument must be a LineString"
        )
    ptag, p = parse_wkt(point_wkt_s)
    if ptag != "POINT":
        raise ValueError(
            "line_locate_point: second argument must be a Point"
        )
    if pts is None or p is None:
        return None
    total = sum(math.dist(a, b) for a, b in _segments(pts))
    if total == 0.0:
        return 0.0
    best = (math.inf, 0.0)
    walked = 0.0
    for a, b in _segments(pts):
        seg_len = math.dist(a, b)
        if seg_len > 0.0:
            dx, dy = b[0] - a[0], b[1] - a[1]
            t = max(0.0, min(1.0, ((p[0] - a[0]) * dx + (p[1] - a[1]) * dy)
                             / (seg_len * seg_len)))
        else:
            t = 0.0
        proj = (a[0] + t * (b[0] - a[0]), a[1] + t * (b[1] - a[1]))
        d = math.dist(p, proj)
        if d < best[0]:
            best = (d, walked + t * seg_len)
        walked += seg_len
    return best[1] / total


# --------------------------------------------------------------------------
# spherical
# --------------------------------------------------------------------------


def great_circle_distance(lat1, lon1, lat2, lon2) -> float:
    """SphericalGeographyUtils.java:82-108 — spherical Vincenty in
    kilometers, EARTH_RADIUS_KM = 6371.01."""
    for lat in (lat1, lat2):
        if not -90.0 <= lat <= 90.0:
            raise ValueError("Latitude must be between -90 and 90")
    for lon in (lon1, lon2):
        if not -180.0 <= lon <= 180.0:
            raise ValueError("Longitude must be between -180 and 180")
    rlat1, rlat2 = math.radians(lat1), math.radians(lat2)
    sin1, cos1 = math.sin(rlat1), math.cos(rlat1)
    sin2, cos2 = math.sin(rlat2), math.cos(rlat2)
    dlon = math.radians(lon1) - math.radians(lon2)
    cos_dlon = math.cos(dlon)
    t1 = cos2 * math.sin(dlon)
    t2 = cos1 * sin2 - sin1 * cos2 * cos_dlon
    t3 = sin1 * sin2 + cos1 * cos2 * cos_dlon
    return math.atan2(math.hypot(t1, t2), t3) * EARTH_RADIUS_KM


# --------------------------------------------------------------------------
# Bing tiles (public Bing maps tile system; BingTileUtils.java).
# A tile is represented as its quadkey string — it uniquely encodes
# (x, y, zoom), and bing_tile_quadkey is the identity.
# --------------------------------------------------------------------------


def bing_tile_from_quadkey(qk: str) -> str:
    # zoom 0 is the empty quadkey (the whole-world tile)
    if len(qk) > 23 or re.search(r"[^0-3]", qk):
        raise ValueError(f"Invalid QuadKey: {qk}")
    return qk


def bing_tile_from_xyz(x: int, y: int, zoom: int) -> str:
    if not 0 <= zoom <= 23:
        raise ValueError(f"Zoom level must be <= 23, got {zoom}")
    n = 1 << zoom
    if not 0 <= x < n:
        raise ValueError(f"XCoordinate must be within [0, {n - 1}], got {x}")
    if not 0 <= y < n:
        raise ValueError(f"YCoordinate must be within [0, {n - 1}], got {y}")
    digits = []
    for i in range(zoom, 0, -1):
        digit = 0
        mask = 1 << (i - 1)
        if x & mask:
            digit += 1
        if y & mask:
            digit += 2
        digits.append(str(digit))
    return "".join(digits)


def bing_tile_xyz(qk: str) -> tuple[int, int, int]:
    x = y = 0
    for i, ch in enumerate(qk):
        mask = 1 << (len(qk) - 1 - i)
        d = int(ch)
        if d & 1:
            x |= mask
        if d & 2:
            y |= mask
    return x, y, len(qk)


def bing_tile_polygon(qk: str) -> str:
    x, y, zoom = bing_tile_xyz(qk)
    n = float(1 << zoom)

    def lat(yy: float) -> float:
        return math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * yy / n))))

    def lon(xx: float) -> float:
        return xx / n * 360.0 - 180.0

    west, east = lon(x), lon(x + 1)
    north, south = lat(y), lat(y + 1)
    ring = [(west, south), (west, north), (east, north), (east, south),
            (west, south)]
    return format_wkt(("POLYGON", [ring]))


def bing_tile_at(lat: float, lon: float, zoom: int) -> str:
    """BingTileUtils.java latitudeLongitudeToTile."""
    if not 0 <= zoom <= 23:
        raise ValueError(f"Zoom level must be <= 23, got {zoom}")
    if not MIN_LATITUDE <= lat <= MAX_LATITUDE:
        raise ValueError(
            f"Latitude must be between {MIN_LATITUDE} and {MAX_LATITUDE}"
        )
    if not -180.0 <= lon <= 180.0:
        raise ValueError("Longitude must be between -180 and 180")
    n = 1 << zoom
    xf = (lon + 180.0) / 360.0
    sin_lat = math.sin(math.radians(lat))
    yf = 0.5 - math.log((1 + sin_lat) / (1 - sin_lat)) / (4 * math.pi)
    x = min(n - 1, max(0, int(xf * n)))
    y = min(n - 1, max(0, int(yf * n)))
    return bing_tile_from_xyz(x, y, zoom)
