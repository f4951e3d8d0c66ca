"""Exact planar overlay engine — ST_Intersection / ST_Difference /
ST_SymDifference / ST_Union and the DE-9IM relate family for the
SQL-surface geometry front door.

Parity sources: the reference's presto-geospatial GeoFunctions.java
(stIntersection:960 with its envelope fast path, stDifference:923,
stSymmetricDifference:1009, stUnion:583-640 — union splits by
dimension, unions each, then drops lower-dimension pieces covered by
higher ones, per the Esri/geometry-api-java#199 workaround cited
there) over the ESRI geometry kernel. This module is an ORIGINAL
implementation (no ESRI/JTS code exists on this machine): a
Fraction-exact segment arrangement with even-odd polygon semantics,
in-the-limit side classification, and face/chain assembly.

Observed ESRI output conventions (reverse-engineered from
TestGeoFunctions.java and encoded here):
  - noding vertices are KEPT (no collinear simplification): union of
    touching unit squares prints the shared corners,
  - polyline chains break at nodes of degree != 2 and start at their
    (y, x)-lexicographic-minimum endpoint,
  - multi-part outputs sort parts by (y, x) of their minimum vertex,
  - polygon shells are clockwise, holes counter-clockwise, shell
    rings rotated to start at their (y, x) minimum vertex,
  - single-part results use the simple tag (POLYGON not
    MULTIPOLYGON), mixed-dimension results are GEOMETRYCOLLECTION
    ordered by ascending dimension,
  - an empty intersection prints MULTIPOLYGON EMPTY (pin
    TestGeoFunctions.java:800), except the envelope-pair fast path
    which prints POLYGON EMPTY (GeoFunctions.java:968-988).
ESRI's TopoGraph emits some rings rotated to an internal traversal
phase instead of the (y, x) minimum (e.g. a difference ring may start
at the subject's first vertex); those pins are compared
ring-rotation-insensitively in the corpus and inventoried there.

Scale: per-value Python inside Arrow batches — the SQL-surface
convenience path for small WKT scalars, same division of labor as
functions/geo_wkt.py (the DataFrame Column path in functions/geo.py
and the clip kernel in functions/geo_clip.py remain the bulk routes).
"""

from __future__ import annotations

import sys
from fractions import Fraction

try:  # worker-side code: by-value fallback until the package ships
    from presto_0_235_spark.session import register_worker_module

    register_worker_module(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

from presto_0_235_spark.functions import geo_wkt as _W

Pt = tuple  # (Fraction, Fraction)


def _fpt(p) -> Pt:
    # Fraction(float) is EXACT binary-to-rational — no
    # limit_denominator, which would corrupt sub-1e-10 coordinate
    # deltas (the reference pins tiny buffer-of-buffer geometries at
    # 1e-10 scale, TestGeoFunctions.java:207-209)
    return (Fraction(p[0]), Fraction(p[1]))


def _cross(o, a, b) -> Fraction:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _on_seg(p: Pt, a: Pt, b: Pt) -> bool:
    """p lies on closed segment ab (exact)."""
    if _cross(a, b, p) != 0:
        return False
    return (min(a[0], b[0]) <= p[0] <= max(a[0], b[0])
            and min(a[1], b[1]) <= p[1] <= max(a[1], b[1]))


def _seg_intersections(a: Pt, b: Pt, c: Pt, d: Pt) -> list:
    """Exact intersection points of closed segments ab and cd.
    Proper crossing -> [point]; collinear overlap -> overlap
    endpoints; endpoint touch -> [point]; disjoint -> []."""
    d1, d2 = _cross(c, d, a), _cross(c, d, b)
    d3, d4 = _cross(a, b, c), _cross(a, b, d)
    if d1 == 0 and d2 == 0:  # collinear
        pts = [p for p in (a, b) if _on_seg(p, c, d)]
        pts += [p for p in (c, d) if _on_seg(p, a, b)]
        return list(dict.fromkeys(pts))
    if ((d1 > 0) != (d2 > 0) or 0 in (d1, d2)) and \
       ((d3 > 0) != (d4 > 0) or 0 in (d3, d4)):
        if d1 == 0:
            return [a]
        if d2 == 0:
            return [b]
        if d3 == 0:
            return [c]
        if d4 == 0:
            return [d]
        t = d3 / (d3 - d4)  # along cd? no: param of crossing on ab side
        # Solve exactly: intersection of the two support lines.
        x1, y1, x2, y2 = a[0], a[1], b[0], b[1]
        x3, y3, x4, y4 = c[0], c[1], d[0], d[1]
        den = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
        px = ((x1 * y2 - y1 * x2) * (x3 - x4)
              - (x1 - x2) * (x3 * y4 - y3 * x4)) / den
        py = ((x1 * y2 - y1 * x2) * (y3 - y4)
              - (y1 - y2) * (x3 * y4 - y3 * x4)) / den
        return [(px, py)]
    return []


class _Geom:
    """One input side: points / line segments / polygon rings with
    Fraction coordinates. Even-odd fill semantics for rings (ESRI's
    simplify treats overlapping same-input rings as XOR — pinned by
    TestGeoFunctions.java:805 where an overlapping MULTIPOLYGON's
    overlap region is a hole)."""

    def __init__(self, wkt: str):
        g = _W.parse_wkt(wkt)
        self.points: list[Pt] = []
        self.lines: list[tuple[Pt, Pt]] = []
        self.rings: list[list[Pt]] = []
        self.tags: set[str] = set()
        self._load(g)

    def _load(self, g):
        tag, payload = g
        if payload is None:
            self.tags.add(tag)
            return
        self.tags.add(tag)
        if tag == "POINT":
            self.points.append(_fpt(payload))
        elif tag == "MULTIPOINT":
            self.points.extend(_fpt(p) for p in payload)
        elif tag == "LINESTRING":
            pts = [_fpt(p) for p in payload]
            self.lines.extend(
                (pts[i], pts[i + 1]) for i in range(len(pts) - 1)
                if pts[i] != pts[i + 1])
        elif tag == "MULTILINESTRING":
            for path in payload:
                pts = [_fpt(p) for p in path]
                self.lines.extend(
                    (pts[i], pts[i + 1]) for i in range(len(pts) - 1)
                    if pts[i] != pts[i + 1])
        elif tag == "POLYGON":
            for ring in payload:
                r = [_fpt(p) for p in ring]
                if r and r[0] == r[-1]:
                    r = r[:-1]
                if len(r) >= 3:
                    self.rings.append(r)
        elif tag == "MULTIPOLYGON":
            for rings in payload:
                for ring in rings:
                    r = [_fpt(p) for p in ring]
                    if r and r[0] == r[-1]:
                        r = r[:-1]
                    if len(r) >= 3:
                        self.rings.append(r)
        elif tag == "GEOMETRYCOLLECTION":
            for sub in payload:
                self._load(sub)

    def is_empty(self) -> bool:
        return not (self.points or self.lines or self.rings)

    def ring_edges(self) -> list[tuple[Pt, Pt]]:
        out = []
        for r in self.rings:
            for i in range(len(r)):
                a, b = r[i], r[(i + 1) % len(r)]
                if a != b:
                    out.append((a, b))
        return out

    def eo_inside(self, p: Pt) -> bool:
        """Even-odd strictly-inside test (p must not be on a ring
        edge). Half-open crossing rule on a +x ray."""
        cnt = 0
        for a, b in self.ring_edges():
            if (a[1] > p[1]) != (b[1] > p[1]):
                # x coordinate of edge at height p[1]
                t = (p[1] - a[1]) / (b[1] - a[1])
                x = a[0] + t * (b[0] - a[0])
                if x > p[0]:
                    cnt += 1
        return cnt % 2 == 1

    def on_boundary2(self, p: Pt) -> bool:
        return any(_on_seg(p, a, b) for a, b in self.ring_edges())

    def on_lines(self, p: Pt) -> bool:
        return any(_on_seg(p, a, b) for a, b in self.lines)

    def line_boundary_points(self) -> set:
        """Mod-2 endpoints (OGC boundary of a 1D geometry)."""
        from collections import Counter

        c = Counter()
        for a, b in self.lines:
            c[a] += 1
            c[b] += 1
        return {p for p, n in c.items() if n % 2 == 1}

    def in_closure(self, p: Pt) -> bool:
        return (p in set(self.points) or self.on_lines(p)
                or self.on_boundary2(p) or self.eo_inside(p))


# ---------------------------------------------------------------------------
# Arrangement: node every segment at every intersection / touching
# feature from both inputs.
# ---------------------------------------------------------------------------


def _node(ga: _Geom, gb: _Geom):
    """Returns (edges, labels) where edges are noded undirected
    segments keyed (min_end, max_end) and labels[key] is a set of
    ('A'|'B', 'line'|'ring') origins."""
    raw = ([(s, ("A", "line")) for s in ga.lines]
           + [(s, ("A", "ring")) for s in ga.ring_edges()]
           + [(s, ("B", "line")) for s in gb.lines]
           + [(s, ("B", "ring")) for s in gb.ring_edges()])
    pts = list(ga.points) + list(gb.points)
    segs = [s for s, _ in raw]
    cuts = [set() for _ in raw]

    # float bounding boxes (padded OUTWARD beyond float()'s half-ulp
    # rounding) reject non-overlapping pairs before any exact
    # Fraction arithmetic — the all-pairs noding loop is the overlay
    # kernel's hot spot and most pairs in real geometry are far
    # apart. Padding keeps this a pure PRE-FILTER: a pair the float
    # test rejects provably cannot intersect, so exactness is
    # untouched.
    def _fbox(a, b):
        ax, ay = float(a[0]), float(a[1])
        bx, by = float(b[0]), float(b[1])
        lo_x, hi_x = (ax, bx) if ax <= bx else (bx, ax)
        lo_y, hi_y = (ay, by) if ay <= by else (by, ay)
        px = 1e-9 * (1.0 + abs(lo_x) + abs(hi_x))
        py = 1e-9 * (1.0 + abs(lo_y) + abs(hi_y))
        return (lo_x - px, lo_y - py, hi_x + px, hi_y + py)

    fb = [_fbox(a, b) for (a, b) in segs]
    fpts = [(float(p[0]), float(p[1])) for p in pts]
    for i, (a, b) in enumerate(segs):
        bi = fb[i]
        for p, (fx, fy) in zip(pts, fpts):
            if bi[0] <= fx <= bi[2] and bi[1] <= fy <= bi[3] \
                    and _on_seg(p, a, b):
                cuts[i].add(p)
        for j in range(i + 1, len(segs)):
            bj = fb[j]
            if bi[0] > bj[2] or bj[0] > bi[2] \
                    or bi[1] > bj[3] or bj[1] > bi[3]:
                continue
            c, d = segs[j]
            for p in _seg_intersections(a, b, c, d):
                cuts[i].add(p)
                cuts[j].add(p)
    labels: dict = {}
    for i, ((a, b), lab) in enumerate(raw):
        ordered = sorted(cuts[i] | {a, b},
                         key=lambda p: ((p[0] - a[0]) ** 2
                                        + (p[1] - a[1]) ** 2))
        for u, v in zip(ordered, ordered[1:]):
            if u == v:
                continue
            key = (u, v) if (u[1], u[0]) <= (v[1], v[0]) else (v, u)
            labels.setdefault(key, set()).add(lab)
    return labels


def _eps_for(labels, extra_pts=()):
    """A rational epsilon below half the minimum feature separation
    of the arrangement, so mid +/- eps*normal classification is exact
    in-the-limit.

    Fast path (r13): the minimum separation only needs a safe LOWER
    bound, so distances run in FLOAT — each coordinate difference is
    an EXACT Fraction subtraction converted once (one rounding, no
    catastrophic cancellation), and the products after carry ~1e-15
    relative error; projecting onto a segment at a float-approximate
    parameter can only OVERestimate that segment distance by
    O(ulp^2) relative. The returned power of two sits at
    sqrt(best/64) — a 2x margin over the exact path's sqrt(best/32),
    dwarfing the float error. Underflow/overflow (best 0 or
    non-finite) falls back to the exact-rational computation."""
    import math

    nodes = set(extra_pts)
    for (u, v) in labels:
        nodes.add(u)
        nodes.add(v)
    best = None

    def upd(d2):
        nonlocal best
        if d2 > 0 and (best is None or d2 < best):
            best = d2

    nodes = list(nodes)
    for i, p in enumerate(nodes):
        for q in nodes[i + 1:]:
            dx, dy = float(p[0] - q[0]), float(p[1] - q[1])
            d2 = dx * dx + dy * dy
            if d2 == 0.0:
                # nodes is a set of exact points, so p != q: the
                # float difference UNDERFLOWED — the safe bound is
                # below the subnormal range, only the exact path can
                # produce it (r14, advisor finding)
                return _eps_for_exact(labels, extra_pts)
            upd(d2)
        for (u, v) in labels:
            if p in (u, v):
                continue
            # squared distance from p to segment uv (float, exact
            # differences)
            dxs, dys = float(v[0] - u[0]), float(v[1] - u[1])
            ll = dxs * dxs + dys * dys
            if ll <= 0:
                if u != v:
                    return _eps_for_exact(labels, extra_pts)
                continue
            px, py = float(p[0] - u[0]), float(p[1] - u[1])
            t = (px * dxs + py * dys) / ll
            t = 0.0 if t < 0.0 else (1.0 if t > 1.0 else t)
            cx, cy = px - t * dxs, py - t * dys
            d2 = cx * cx + cy * cy
            if d2 == 0.0:
                # zero is legitimate only when p sits EXACTLY on the
                # closed segment (a T-node); verify in rationals and
                # fall back to exact when the zero is an underflow
                cross = ((v[0] - u[0]) * (p[1] - u[1])
                         - (v[1] - u[1]) * (p[0] - u[0]))
                if cross != 0:
                    return _eps_for_exact(labels, extra_pts)
                dot = ((p[0] - u[0]) * (v[0] - u[0])
                       + (p[1] - u[1]) * (v[1] - u[1]))
                l2 = (v[0] - u[0]) ** 2 + (v[1] - u[1]) ** 2
                if not (0 <= dot <= l2):
                    return _eps_for_exact(labels, extra_pts)
                continue
            upd(d2)
    if best is None:
        return Fraction(1, 1 << 20)
    if not math.isfinite(best) or best <= 0.0:
        return _eps_for_exact(labels, extra_pts)
    target = math.sqrt(best / 64.0)
    if target <= 0.0:
        return _eps_for_exact(labels, extra_pts)
    _m, ex = math.frexp(target)  # target = m * 2^ex, m in [0.5, 1)
    # 2^(ex-1) <= target
    return (Fraction(1 << (ex - 1)) if ex >= 1
            else Fraction(1, 1 << (1 - ex)))


def _eps_for_exact(labels, extra_pts=()):
    """Exact-rational fallback of _eps_for (degenerate float
    range)."""
    nodes = set(extra_pts)
    for (u, v) in labels:
        nodes.add(u)
        nodes.add(v)
    best = None

    def upd(d2):
        nonlocal best
        if d2 > 0 and (best is None or d2 < best):
            best = d2

    nodes = list(nodes)
    for i, p in enumerate(nodes):
        for q in nodes[i + 1:]:
            upd((p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2)
        for (u, v) in labels:
            if p in (u, v):
                continue
            dx, dy = v[0] - u[0], v[1] - u[1]
            L = dx * dx + dy * dy
            if L == 0:
                continue
            t = ((p[0] - u[0]) * dx + (p[1] - u[1]) * dy) / L
            t = min(max(t, Fraction(0)), Fraction(1))
            cx, cy = u[0] + t * dx, u[1] + t * dy
            upd((p[0] - cx) ** 2 + (p[1] - cy) ** 2)
    if best is None:
        return Fraction(1, 1 << 20)
    e = best
    while e * e * 32 > best:  # e <= sqrt(best/32)
        e = e / 2
    return e


def _mid(u: Pt, v: Pt) -> Pt:
    return ((u[0] + v[0]) / 2, (u[1] + v[1]) / 2)


def _side_pts(u: Pt, v: Pt, eps: Fraction):
    """Points just left and right of edge uv at its midpoint."""
    m = _mid(u, v)
    dx, dy = v[0] - u[0], v[1] - u[1]
    # normalize magnitude roughly to <=1 without sqrt: divide by
    # max(|dx|,|dy|)
    mag = max(abs(dx), abs(dy))
    dx, dy = dx / mag, dy / mag
    left = (m[0] - dy * eps, m[1] + dx * eps)
    right = (m[0] + dy * eps, m[1] - dx * eps)
    return left, right


# ---------------------------------------------------------------------------
# Output assembly helpers
# ---------------------------------------------------------------------------


def _yx(p: Pt):
    return (p[1], p[0])


def _chains(edges: list[tuple[Pt, Pt]]) -> list[list[Pt]]:
    """Merge undirected noded edges into maximal paths breaking at
    nodes of degree != 2; each chain starts at its (y, x)-min
    endpoint; chains sorted by (y, x) of their minimum vertex."""
    from collections import defaultdict

    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    used = set()
    chains = []

    def key(u, v):
        return (u, v) if (u[1], u[0]) <= (v[1], v[0]) else (v, u)

    starts = [p for p in adj if len(adj[p]) != 2]
    # closed loops with all degree-2 nodes: start anywhere
    for start in sorted(adj, key=_yx):
        if start not in starts and any(
                key(start, n) not in used for n in adj[start]):
            starts.append(start)
    for start in sorted(starts, key=_yx):
        for nxt in sorted(adj[start], key=_yx):
            if key(start, nxt) in used:
                continue
            path = [start, nxt]
            used.add(key(start, nxt))
            cur, prev = nxt, start
            while len(adj[cur]) == 2 and cur != start:
                a, b = adj[cur]
                nxt2 = a if a != prev else b
                if key(cur, nxt2) in used:
                    break
                used.add(key(cur, nxt2))
                path.append(nxt2)
                prev, cur = cur, nxt2
            chains.append(path)
    # canonical: start at (y,x)-min endpoint
    out = []
    for ch in chains:
        if ch[0] == ch[-1]:  # loop: rotate to min, keep closed
            body = ch[:-1]
            i = min(range(len(body)), key=lambda k: _yx(body[k]))
            body = body[i:] + body[:i]
            out.append(body + [body[0]])
        elif _yx(ch[-1]) < _yx(ch[0]):
            out.append(ch[::-1])
        else:
            out.append(ch)
    out.sort(key=lambda ch: min(_yx(p) for p in ch))
    return out


def _signed_area2(ring: list[Pt]) -> Fraction:
    s = Fraction(0)
    n = len(ring)
    for i in range(n):
        a, b = ring[i], ring[(i + 1) % n]
        s += a[0] * b[1] - b[0] * a[1]
    return s


def _assemble_faces(boundary: list[tuple[Pt, Pt, bool]]):
    """boundary: directed edges (u, v, _) with the result region on
    the RIGHT. Assemble closed rings by always taking, at each node,
    the most-clockwise continuation (keeps the region on the right).
    Returns list of (shell, holes) with shells CW, holes CCW."""
    import math as _m
    from collections import defaultdict

    out = defaultdict(list)
    for u, v, _ in boundary:
        out[u].append(v)
    used = set()
    rings = []
    for u0, v0, _ in sorted(boundary, key=lambda e: (_yx(e[0]), _yx(e[1]))):
        if (u0, v0) in used:
            continue
        ring = [u0]
        u, v = u0, v0
        used.add((u, v))
        while v != u0:
            ring.append(v)
            # Sharpest RIGHT turn relative to the travel direction:
            # interior is on the right of every directed boundary
            # edge, so the tightest clockwise continuation hugs ONE
            # face — at pinch nodes this splits the region into
            # simple polygons exactly like ESRI's TopoGraph output
            # (TestGeoFunctions.java testSTSymmetricDifference).
            ang_back = _m.atan2(float(u[1] - v[1]), float(u[0] - v[0]))
            best = None
            for w in out[v]:
                if (v, w) in used:
                    continue
                ang = _m.atan2(float(w[1] - v[1]), float(w[0] - v[0]))
                # counter-clockwise angle from the reversed incoming
                # direction; the smallest positive value is the
                # sharpest right turn w.r.t. travel
                d = (ang - ang_back) % (2 * _m.pi)
                if d == 0:
                    d = 2 * _m.pi
                if best is None or d < best[0]:
                    best = (d, w)
            if best is None:
                break  # degenerate; abandon
            w = best[1]
            used.add((v, w))
            u, v = v, w
        if v == u0 and len(ring) >= 3:
            rings.append(ring)
    shells = [r for r in rings if _signed_area2(r) < 0]  # CW
    holes = [r for r in rings if _signed_area2(r) > 0]   # CCW
    faces = []
    for s in shells:
        faces.append((s, []))
    for h in holes:
        # assign to smallest containing shell
        cand = []
        hp = h[0]
        for i, (s, _hs) in enumerate(faces):
            if _point_in_ring(hp, s) or _pt_on_ring(hp, s):
                cand.append((abs(_signed_area2(s)), i))
        if cand:
            faces[min(cand)[1]][1].append(h)
    return faces


def _point_in_ring(p: Pt, ring: list[Pt]) -> bool:
    cnt = 0
    n = len(ring)
    for i in range(n):
        a, b = ring[i], ring[(i + 1) % n]
        if (a[1] > p[1]) != (b[1] > p[1]):
            t = (p[1] - a[1]) / (b[1] - a[1])
            x = a[0] + t * (b[0] - a[0])
            if x > p[0]:
                cnt += 1
    return cnt % 2 == 1


def _pt_on_ring(p: Pt, ring: list[Pt]) -> bool:
    n = len(ring)
    return any(_on_seg(p, ring[i], ring[(i + 1) % n]) for i in range(n))


# ---------------------------------------------------------------------------
# Serialization back to canonical WKT via geo_wkt.format_wkt
# ---------------------------------------------------------------------------


def _f(x: Fraction) -> float:
    return float(x)


def _to_wkt(points, chains, faces, empty_tag="MULTIPOLYGON") -> str:
    parts = []
    if points:
        pts = sorted(set(points), key=_yx)
        if len(pts) == 1:
            parts.append(("POINT", (_f(pts[0][0]), _f(pts[0][1]))))
        else:
            parts.append(("MULTIPOINT",
                          [(_f(p[0]), _f(p[1])) for p in pts]))
    if chains:
        cs = [[(_f(p[0]), _f(p[1])) for p in ch] for ch in chains]
        if len(cs) == 1:
            parts.append(("LINESTRING", cs[0]))
        else:
            parts.append(("MULTILINESTRING", cs))
    if faces:
        polys = []
        for shell, holes in faces:
            shell = _rotate_min(shell)
            rings = [[(_f(p[0]), _f(p[1])) for p in shell
                      ] + [(_f(shell[0][0]), _f(shell[0][1]))]]
            for h in holes:
                h = _rotate_min(h)
                rings.append([(_f(p[0]), _f(p[1])) for p in h
                              ] + [(_f(h[0][0]), _f(h[0][1]))])
            polys.append(rings)
        polys.sort(key=lambda rs: min((p[1], p[0]) for p in rs[0]))
        if len(polys) == 1:
            parts.append(("POLYGON", polys[0]))
        else:
            parts.append(("MULTIPOLYGON", polys))
    if not parts:
        return f"{empty_tag} EMPTY"
    if len(parts) == 1:
        return _W.format_wkt(parts[0])
    return _W.format_wkt(("GEOMETRYCOLLECTION", parts))


def _rotate_min(ring: list[Pt]) -> list[Pt]:
    i = min(range(len(ring)), key=lambda k: _yx(ring[k]))
    return ring[i:] + ring[:i]


# ---------------------------------------------------------------------------
# The overlay proper
# ---------------------------------------------------------------------------


def _overlay(wa: str, wb: str, op: str) -> str:
    ga, gb = _Geom(wa), _Geom(wb)
    if op == "intersection" and (ga.is_empty() or gb.is_empty()):
        return "MULTIPOLYGON EMPTY"
    if op == "difference" and ga.is_empty():
        return "MULTIPOLYGON EMPTY"
    if op == "difference" and gb.is_empty():
        return _W.geometry_from_text(wa)
    if op in ("symdifference", "union") and ga.is_empty():
        return (_W.geometry_from_text(wb) if not gb.is_empty()
                else "MULTIPOLYGON EMPTY")
    if op in ("symdifference", "union") and gb.is_empty():
        return _W.geometry_from_text(wa)

    labels = _node(ga, gb)
    all_pts = set(ga.points) | set(gb.points)
    eps = _eps_for(labels, all_pts)

    def pred(in_a: bool, in_b: bool) -> bool:
        if op == "intersection":
            return in_a and in_b
        if op == "difference":
            return in_a and not in_b
        if op == "symdifference":
            return in_a != in_b
        return in_a or in_b  # union

    # ---- dim-2: boundary edges of the result region --------------------
    side_cache = {}
    boundary = []
    for (u, v), labs in labels.items():
        has_ring = any(k == "ring" for _s, k in labs)
        left, right = _side_pts(u, v, eps)
        la = ga.eo_inside(left)
        lb = gb.eo_inside(left)
        ra = ga.eo_inside(right)
        rb = gb.eo_inside(right)
        side_cache[(u, v)] = (la, lb, ra, rb)
        if not has_ring and not (la or lb or ra or rb):
            continue
        pl, pr = pred(la, lb), pred(ra, rb)
        if pl != pr:
            # orient region-on-right
            boundary.append((u, v, True) if pr else (v, u, True))
    faces = _assemble_faces(boundary)

    # membership helpers for flatten/remove
    def on_face_closure_pt(p: Pt) -> bool:
        for shell, holes in faces:
            if _pt_on_ring(p, shell) or any(
                    _pt_on_ring(p, h) for h in holes):
                return True
            if _point_in_ring(p, shell) and not any(
                    _point_in_ring(p, h) for h in holes):
                return True
        return False

    def edge_in_face_closure(u: Pt, v: Pt) -> bool:
        m = _mid(u, v)
        return on_face_closure_pt(m) and on_face_closure_pt(u) \
            and on_face_closure_pt(v)

    # ---- dim-1 ----------------------------------------------------------
    kept_edges = []
    for (u, v), labs in labels.items():
        a_line = ("A", "line") in labs
        b_line = ("B", "line") in labs
        a_ring = ("A", "ring") in labs
        b_ring = ("B", "ring") in labs
        la, lb, ra, rb = side_cache[(u, v)]
        in_a1 = a_line or a_ring or (la and ra)  # edge subset of closure(A)
        in_b1 = b_line or b_ring or (lb and rb)
        keep = False
        if op == "intersection":
            keep = in_a1 and in_b1
        elif op == "difference":
            keep = a_line and not in_b1
        elif op == "symdifference":
            keep = (a_line and not in_b1) or (b_line and not in_a1)
        else:  # union
            keep = a_line or b_line
        if keep and not edge_in_face_closure(u, v):
            kept_edges.append((u, v))
    chains = _chains(kept_edges)

    def on_kept_edge(p: Pt) -> bool:
        return any(_on_seg(p, u, v) for u, v in kept_edges)

    # ---- dim-0 ----------------------------------------------------------
    nodes = set()
    for (u, v) in labels:
        nodes.add(u)
        nodes.add(v)
    pts = []
    if op == "intersection":
        for p in sorted(nodes | all_pts, key=_yx):
            if ga.in_closure(p) and gb.in_closure(p) \
                    and not on_kept_edge(p) and not on_face_closure_pt(p):
                pts.append(p)
    elif op == "difference":
        for p in sorted(set(ga.points), key=_yx):
            if not gb.in_closure(p) and not on_kept_edge(p) \
                    and not on_face_closure_pt(p):
                pts.append(p)
    elif op == "symdifference":
        for p in sorted(set(ga.points) | set(gb.points), key=_yx):
            if p in set(ga.points) and gb.in_closure(p):
                continue
            if p in set(gb.points) and ga.in_closure(p):
                continue
            if not on_kept_edge(p) and not on_face_closure_pt(p):
                pts.append(p)
    else:  # union
        for p in sorted(all_pts, key=_yx):
            # a point survives the union iff not absorbed by a kept
            # edge or face closure (line/face coverage of the inputs
            # is already folded into those kept structures)
            if not (on_kept_edge(p) or on_face_closure_pt(p)):
                pts.append(p)
    return _to_wkt(pts, chains, faces)


# Public ops -----------------------------------------------------------------

_UNION_OK = ("POINT", "MULTIPOINT", "LINESTRING", "MULTILINESTRING",
             "POLYGON", "MULTIPOLYGON")


def intersection(wa: str, wb: str) -> str:
    """GeoFunctions.java:960 stIntersection (envelope fast path is
    handled by the caller in udfs.py via the ENV: value marker)."""
    return _overlay(wa, wb, "intersection")


def difference(wa: str, wb: str) -> str:
    """GeoFunctions.java:923 stDifference."""
    return _overlay(wa, wb, "difference")


def symdifference(wa: str, wb: str) -> str:
    """GeoFunctions.java:1009 stSymmetricDifference."""
    return _overlay(wa, wb, "symdifference")


def union(wa: str, wb: str) -> str:
    """GeoFunctions.java:583 stUnion (binary form)."""
    return _overlay(wa, wb, "union")


# ---------------------------------------------------------------------------
# DE-9IM relate + named predicates
# ---------------------------------------------------------------------------


def _classify(p: Pt, g: _Geom) -> str:
    """'I' / 'B' / 'E' of point p relative to geometry g, using the
    highest-dimension component containing p (ESRI relational
    operators work on the point-set of the whole geometry)."""
    if g.rings:
        if g.on_boundary2(p):
            return "B"
        if g.eo_inside(p):
            return "I"
    if g.lines:
        if g.on_lines(p):
            return "B" if p in g.line_boundary_points() and not g.rings \
                else "I"
    if p in set(g.points):
        return "I"
    return "E"


def de9im(wa: str, wb: str) -> list:
    """3x3 matrix of intersection DIMENSIONS (-1 empty, else 0/1/2)
    between {interior, boundary, exterior} of A and of B."""
    ga, gb = _Geom(wa), _Geom(wb)
    labels = _node(ga, gb)
    all_pts = set(ga.points) | set(gb.points)
    eps = _eps_for(labels, all_pts)
    m = [[-1] * 3 for _ in range(3)]
    idx = {"I": 0, "B": 1, "E": 2}

    def feed(p: Pt, dim: int):
        ca, cb = _classify(p, ga), _classify(p, gb)
        i, j = idx[ca], idx[cb]
        if dim > m[i][j]:
            m[i][j] = dim

    # 0-dim samples: nodes + isolated points
    nodes = set(all_pts)
    for (u, v) in labels:
        nodes.add(u)
        nodes.add(v)
    for p in nodes:
        feed(p, 0)
    # 1-dim samples: edge midpoints
    for (u, v) in labels:
        feed(_mid(u, v), 1)
        # 2-dim samples: just off each edge on both sides
        left, right = _side_pts(u, v, eps)
        for q in (left, right):
            ca = "I" if ga.eo_inside(q) else "E"
            cb = "I" if gb.eo_inside(q) else "E"
            if not ga.rings:
                ca = "E" if not (ga.on_lines(q) or q in set(ga.points)) \
                    else ca
            if not gb.rings:
                cb = "E" if not (gb.on_lines(q) or q in set(gb.points)) \
                    else cb
            if m[idx[ca]][idx[cb]] < 2:
                m[idx[ca]][idx[cb]] = 2
    # line interiors that are 1-dim subsets of polygon interiors:
    # handled by midpoint feed above. Boundary-of-line endpoints by
    # node feed. Exterior/exterior always dim 2 on the plane:
    m[2][2] = 2
    # Exterior-vs-interior cells are fed by the per-edge side
    # samples (a point just off an A-only edge is in B's exterior and
    # vice versa); nothing more needed.
    return m


def relate(wa: str, wb: str, pattern: str) -> bool:
    if len(pattern) != 9:
        raise ValueError("Relate pattern must have 9 characters")
    m = de9im(wa, wb)
    flat = [m[i][j] for i in range(3) for j in range(3)]
    for ch, d in zip(pattern, flat):
        if ch == "*":
            continue
        if ch in "Tt":
            if d < 0:
                return False
        elif ch in "Ff":
            if d >= 0:
                return False
        elif ch in "012":
            if d != int(ch):
                return False
        else:
            raise ValueError(f"invalid DE-9IM pattern char {ch!r}")
    return True


def _pattern_any(wa, wb, patterns) -> bool:
    return any(relate(wa, wb, p) for p in patterns)


def st_equals(wa: str, wb: str) -> bool:
    return relate(wa, wb, "T*F**FFF*") or (
        _Geom(wa).is_empty() and _Geom(wb).is_empty())


def st_contains(wa: str, wb: str) -> bool:
    return relate(wa, wb, "T*****FF*")


def st_within(wa: str, wb: str) -> bool:
    return relate(wa, wb, "T*F**F***")


def st_touches(wa: str, wb: str) -> bool:
    return _pattern_any(wa, wb, ("FT*******", "F**T*****", "F***T****"))


def st_crosses(wa: str, wb: str) -> bool:
    ga, gb = _Geom(wa), _Geom(wb)
    da = 2 if ga.rings else (1 if ga.lines else 0)
    db = 2 if gb.rings else (1 if gb.lines else 0)
    if da < db:
        return relate(wa, wb, "T*T******")
    if da > db:
        return relate(wa, wb, "T*****T**")
    if da == 1:
        return relate(wa, wb, "0********")
    return False


def st_overlaps(wa: str, wb: str) -> bool:
    ga, gb = _Geom(wa), _Geom(wb)
    da = 2 if ga.rings else (1 if ga.lines else 0)
    db = 2 if gb.rings else (1 if gb.lines else 0)
    if da != db:
        return False
    if da == 1:
        return relate(wa, wb, "1*T***T**")
    return relate(wa, wb, "T*T***T**")


def st_intersects(wa: str, wb: str) -> bool:
    return not st_disjoint(wa, wb)


def st_disjoint(wa: str, wb: str) -> bool:
    return relate(wa, wb, "FF*FF****")


# ---------------------------------------------------------------------------
# Validity (JTS IsValidOp model), simplicity (JTS IsSimpleOp model),
# and simplify (JTS TopologyPreservingSimplifier model) — the
# reference routes ST_IsValid / geometry_invalid_reason / ST_IsSimple
# / simplify_geometry through JtsGeometrySerde + JTS
# (GeoFunctions.java:394-421,760-775;
# GeometryUtils.java:292-335 getGeometryInvalidReason).
# ---------------------------------------------------------------------------


def _jd(x: Fraction) -> str:
    """Java Double.toString for the small coordinates JTS reports in
    non-simple locations ('0.0', '3.5')."""
    return repr(float(x))


def _rings_of(parsed):
    """[(shell, holes)] per polygon from a parse_wkt payload."""
    tag, payload = parsed
    out = []
    if tag == "POLYGON" and payload:
        rs = [_dedup_ring([_fpt(p) for p in r[:-1]]) for r in payload]
        out.append((rs[0], rs[1:]))
    elif tag == "MULTIPOLYGON" and payload:
        for rings in payload:
            rs = [_dedup_ring([_fpt(p) for p in r[:-1]]) for r in rings]
            out.append((rs[0], rs[1:]))
    return out


def _dedup_ring(r):
    """drop consecutive duplicates (JTS drops them before checks)"""
    out = []
    for p in r:
        if not out or out[-1] != p:
            out.append(p)
    if len(out) > 1 and out[0] == out[-1]:
        out.pop()
    return out


def _ring_edges_list(r):
    return [(r[i], r[(i + 1) % len(r)]) for i in range(len(r))]


def _noding_failure(all_rings) -> bool:
    """JTS checkConsistentArea analog: any proper crossing, collinear
    interior overlap, or vertex-in-edge-interior between ring edges
    (excluding shared endpoints) -> 'Self-intersection'."""
    edges = []
    for ri, r in enumerate(all_rings):
        for e in _ring_edges_list(r):
            edges.append((ri, e))
    for i in range(len(edges)):
        ri, (a, b) = edges[i]
        for j in range(i + 1, len(edges)):
            rj, (c, d) = edges[j]
            if _cross(a, b, c) == 0 and _cross(a, b, d) == 0 \
                    and _cross(c, d, a) == 0:
                # collinear pair: any positive-length shared interval
                # (duplicate or partially overlapping edges) is a
                # noding failure even when endpoints are shared
                shared = [p for p in dict.fromkeys((a, b, c, d))
                          if _on_seg(p, a, b) and _on_seg(p, c, d)]
                if len(shared) >= 2:
                    return True
                continue
            for p in _seg_intersections(a, b, c, d):
                if p in (a, b) or p in (c, d):
                    # vertex of at least one segment: a touch node
                    # (T-node or shared endpoint), allowed by JTS
                    # IsValidOp — single-point hole/shell tangency is
                    # valid even mid-edge (r13 ADVICE; same-ring
                    # T-nodes fall to the Ring Self-intersection
                    # check). Crossings THROUGH a vertex surface via
                    # the hole-outside-shell / nesting checks.
                    continue
                return True  # interior to both segments: proper cross
    return False


def _ring_self_touch(r):
    """repeated non-consecutive vertex OR a vertex lying in the
    interior of a non-adjacent edge of the SAME ring -> the JTS
    'Ring Self-intersection' class (the T-node form moved here from
    _noding_failure in r13: cross-ring T-nodes are valid tangency,
    same-ring T-nodes make the ring non-simple)"""
    seen = {}
    for i, p in enumerate(r):
        if p in seen:
            return True
        seen[p] = i
    n = len(r)
    for i, p in enumerate(r):
        for j in range(n):
            if j == i or (j + 1) % n == i:
                continue  # edges incident to p
            a, b = r[j], r[(j + 1) % n]
            if _on_seg(p, a, b):
                return True
    return False


def _pt_in_ring_or_boundary(p, ring):
    return _pt_on_ring(p, ring) or _point_in_ring(p, ring)


def invalid_reason_valid_part(parsed):
    """TopologyValidationError message or None, for one flattened
    geometry (no GC)."""
    tag, payload = parsed
    if payload is None or tag in ("POINT", "MULTIPOINT", "LINESTRING",
                                  "MULTILINESTRING"):
        return None
    polys = _rings_of(parsed)
    # zero-area shell: ESRI->JTS serde cannot identify a shell ring
    # and throws (the reference surfaces the serde message for the
    # zero-area bowtie, TestGeoFunctions.java:458)
    for shell, holes in polys:
        if _signed_area2(shell) == 0:
            return ("Error constructing Polygon: shell is empty but "
                    "holes are not")
    # consistent-area noding across every ring of the geometry
    all_rings = [r for shell, holes in polys for r in [shell] + holes]
    if _noding_failure(all_rings):
        return "Self-intersection"
    for r in all_rings:
        if _ring_self_touch(r):
            return "Ring Self-intersection"
    for shell, holes in polys:
        for h in holes:
            probe = next((p for p in h if not _pt_on_ring(p, shell)),
                         None)
            if probe is not None and not _point_in_ring(probe, shell):
                return "Hole lies outside shell"
        for i, h1 in enumerate(holes):
            for h2 in holes[i + 1:]:
                probe = next(
                    (p for p in h2 if not _pt_on_ring(p, h1)), None)
                if probe is not None and _point_in_ring(probe, h1):
                    return "Holes are nested"
        # interior connectivity: a hole (or hole chain) touching the
        # shell at 2+ distinct points pinches the interior apart
        for h in holes:
            touches = {p for p in h if _pt_on_ring(p, shell)}
            if len(touches) >= 2:
                return "Interior is disconnected"
    # shells nested / overlapping across polygons (noding already
    # caught proper overlaps; containment without edge contact here)
    for i, (s1, _h1) in enumerate(polys):
        for s2, _h2 in polys[i + 1:]:
            if all(_pt_in_ring_or_boundary(p, s1) for p in s2) or \
                    all(_pt_in_ring_or_boundary(p, s2) for p in s1):
                return "Shells are nested"
    return None


def _nonsimple_location(parsed):
    """JTS IsSimpleOp analog: None if simple, else the non-simple
    coordinate and the JTS geometry-type label."""
    tag, payload = parsed
    if payload is None:
        return None
    if tag == "POINT":
        return None
    if tag == "MULTIPOINT":
        seen = set()
        for p in payload:
            q = _fpt(p)
            if q in seen:
                return ("MultiPoint", "Repeated point", q)
            seen.add(q)
        return None
    if tag in ("LINESTRING", "MULTILINESTRING"):
        paths = [payload] if tag == "LINESTRING" else payload
        segs = []  # (path_idx, seg_idx, a, b)
        closed = []
        for pi, path in enumerate(paths):
            pts = [_fpt(p) for p in path]
            closed.append(len(pts) > 1 and pts[0] == pts[-1])
            for si in range(len(pts) - 1):
                if pts[si] != pts[si + 1]:
                    segs.append((pi, si, pts[si], pts[si + 1]))
        bad = []
        for x in range(len(segs)):
            pi1, si1, a, b = segs[x]
            for y in range(x + 1, len(segs)):
                pi2, si2, c, d = segs[y]
                for p in _seg_intersections(a, b, c, d):
                    if pi1 == pi2:
                        if si2 == si1 + 1 and p == b and p == c:
                            continue  # consecutive join
                        if closed[pi1] and si1 == 0 and \
                                si2 == len([s for s in segs
                                            if s[0] == pi1]) - 1 \
                                and p == a and p == d:
                            continue  # ring closure point
                    else:
                        # different paths may touch at mod-2
                        # endpoints? JTS: any intersection between
                        # different components is non-simple unless
                        # at both boundaries
                        if p in (a, b) and p in (c, d):
                            # endpoint-endpoint touch between parts
                            # is allowed only at path BOUNDARY points
                            ends1 = {segs_first_last(segs, pi1)[0],
                                     segs_first_last(segs, pi1)[1]}
                            ends2 = {segs_first_last(segs, pi2)[0],
                                     segs_first_last(segs, pi2)[1]}
                            if p in ends1 and p in ends2:
                                continue
                    bad.append(p)
        if bad:
            label = ("LineString" if tag == "LINESTRING"
                     else "MultiLineString")
            p = min(bad, key=lambda q: (q[1], q[0]))
            return (label, "Self-intersection at or near", p)
        return None
    return None  # polygons/GC are always OGC-simple


def segs_first_last(segs, pi):
    ours = [s for s in segs if s[0] == pi]
    return (ours[0][2], ours[-1][3])


def invalid_reason(wkt: str):
    """geometry_invalid_reason: validity reason first, then
    non-simplicity (GeometryUtils.java:292-335); None when valid and
    simple. GC components are checked in order."""
    g = _W.parse_wkt(wkt)
    parts = g[1] if g[0] == "GEOMETRYCOLLECTION" and g[1] else [g]
    for part in parts:
        r = invalid_reason_valid_part(part)
        if r is not None:
            return r
    # multipolygon pieces of a GC checked, now simplicity
    for part in parts:
        ns = _nonsimple_location(part)
        if ns is not None:
            label, desc, p = ns
            return f"[{label}] {desc}: ({_jd(p[0])} {_jd(p[1])})"
    return None


def is_valid(wkt: str) -> bool:
    g = _W.parse_wkt(wkt)
    parts = g[1] if g[0] == "GEOMETRYCOLLECTION" and g[1] else [g]
    return all(invalid_reason_valid_part(p) is None for p in parts)


def is_simple(wkt: str) -> bool:
    """ST_IsSimple (GeoFunctions.java:380): valid AND OGC-simple."""
    g = _W.parse_wkt(wkt)
    parts = g[1] if g[0] == "GEOMETRYCOLLECTION" and g[1] else [g]
    if not all(invalid_reason_valid_part(p) is None for p in parts):
        return False
    return all(_nonsimple_location(p) is None for p in parts)


# --- simplify (JTS TopologyPreservingSimplifier model) ---------------------


def _simplify_path(pts, tol, min_size, other_edges):
    """JTS TaggedLineStringSimplifier: recursive DP that refuses to
    flatten when the output would drop below min_size vertices or the
    flattened chord would cross another retained input edge."""
    n = len(pts)
    if n <= 2:
        return list(pts)
    result_pts = []  # vertices emitted so far (segment chain)

    def seg_dist(p, a, b):
        dx, dy = b[0] - a[0], b[1] - a[1]
        L = dx * dx + dy * dy
        if L == 0:
            return ((p[0] - a[0]) ** 2 + (p[1] - a[1]) ** 2)
        t = ((p[0] - a[0]) * dx + (p[1] - a[1]) * dy) / L
        t = min(max(t, Fraction(0)), Fraction(1))
        cx, cy = a[0] + t * dx, a[1] + t * dy
        return (p[0] - cx) ** 2 + (p[1] - cy) ** 2

    tol2 = Fraction(tol) ** 2

    def furthest(i, j):
        best, besti = None, i + 1
        for k in range(i + 1, j):
            d = seg_dist(pts[k], pts[i], pts[j])
            if best is None or d > best:
                best, besti = d, k
        return besti, best

    def bad_intersection(i, j):
        a, b = pts[i], pts[j]
        for (c, d) in other_edges:
            for p in _seg_intersections(a, b, c, d):
                if p in (a, b):
                    continue
                return True
        return False

    def section(i, j, depth):
        depth += 1
        if i + 1 == j:
            if not result_pts:
                result_pts.append(pts[i])
            result_pts.append(pts[j])
            return
        ok = True
        if len(result_pts) < min_size:
            if depth + 1 < min_size:
                ok = False
        fi, fd = furthest(i, j)
        if fd is not None and fd > tol2:
            ok = False
        if ok and bad_intersection(i, j):
            ok = False
        if ok:
            if not result_pts:
                result_pts.append(pts[i])
            result_pts.append(pts[j])
            return
        section(i, fi, depth)
        section(fi, j, depth)

    section(0, n - 1, 0)
    return result_pts


def simplify(wkt: str, tol: float) -> str:
    """simplify_geometry (GeoFunctions.java:760; JTS
    TopologyPreservingSimplifier.simplify). tol checks are in the UDF
    wrapper; tol == 0 returns the input untouched there."""
    g = _W.parse_wkt(wkt)

    def edges_of(parsed):
        gg = _Geom(_W.format_wkt(parsed))
        return gg.lines + gg.ring_edges()

    def simp(parsed, other_edges):
        tag, payload = parsed
        if payload is None or tag in ("POINT", "MULTIPOINT"):
            return parsed
        if tag == "LINESTRING":
            pts = [_fpt(p) for p in payload]
            out = _simplify_path(pts, tol, 2, other_edges)
            return (tag, [(float(p[0]), float(p[1])) for p in out])
        if tag == "MULTILINESTRING":
            return (tag, [
                simp(("LINESTRING", path), other_edges)[1]
                for path in payload
            ])
        if tag == "POLYGON":
            rings = []
            for r in payload:
                pts = [_fpt(p) for p in r]
                out = _simplify_path(pts, tol, 4, other_edges)
                rings.append([(float(p[0]), float(p[1])) for p in out])
            return (tag, rings)
        if tag == "MULTIPOLYGON":
            return (tag, [
                simp(("POLYGON", rings), other_edges)[1]
                for rings in payload
            ])
        # GEOMETRYCOLLECTION
        return (tag, [simp(sub, other_edges) for sub in payload])

    return _W.format_wkt(simp(g, []))


# ---------------------------------------------------------------------------
# ST_Buffer (GeoFunctions.java:277: JTS Geometry.buffer with the
# default 8 quadrant segments, round joins and round caps). The
# construction below models JTS OffsetSegmentGenerator: per-side
# offset segments, directed fillets of PI/2/8 quantum at outside
# turns, closing segments at inside turns (closingSegLengthFactor
# 80), round line end caps — then an exact noding pass extracts the
# positive-winding boundary. Vertex values agree with JTS to libm
# rounding (last ulp); the corpus compares the heavy vertex pins at
# 1e-9 relative on coordinates.
# ---------------------------------------------------------------------------

import math as _math

_QUADRANT_SEGS = 8
_FILLET_QUANTUM = _math.pi / 2 / _QUADRANT_SEGS
_CLOSING_FACTOR = 80


class _SegList:
    def __init__(self, min_dist: float):
        self.pts: list = []
        self.min_dist = min_dist

    def add(self, p):
        if self.pts:
            q = self.pts[-1]
            if _math.hypot(p[0] - q[0], p[1] - q[1]) <= self.min_dist:
                return
        self.pts.append(p)

    def close(self):
        if self.pts and self.pts[0] != self.pts[-1]:
            self.pts.append(self.pts[0])


def _offset_seg(a, b, dist):
    """offset of segment ab to its LEFT by dist"""
    dx, dy = b[0] - a[0], b[1] - a[1]
    L = _math.hypot(dx, dy)
    ux, uy = dx / L, dy / L
    nx, ny = -uy * dist, ux * dist
    return ((a[0] + nx, a[1] + ny), (b[0] + nx, b[1] + ny))


def _fillet(seglist, p, start_pt, end_pt, direction, radius):
    """JTS addDirectedFillet (angle-bracketed form)."""
    sa = _math.atan2(start_pt[1] - p[1], start_pt[0] - p[0])
    ea = _math.atan2(end_pt[1] - p[1], end_pt[0] - p[0])
    if direction < 0:  # clockwise
        if sa <= ea:
            sa += 2 * _math.pi
    else:
        if sa >= ea:
            sa -= 2 * _math.pi
    _directed_fillet(seglist, p, sa, ea, direction, radius)


def _directed_fillet(seglist, p, start_angle, end_angle, direction,
                     radius):
    factor = -1 if direction < 0 else 1
    total = abs(start_angle - end_angle)
    nsegs = int(total / _FILLET_QUANTUM + 0.5)
    if nsegs < 1:
        return
    inc = total / nsegs
    angle = 0.0
    while angle < total:
        cur = start_angle + factor * angle
        seglist.add((p[0] + radius * _math.cos(cur),
                     p[1] + radius * _math.sin(cur)))
        angle += inc


class _OffsetGen:
    """JTS OffsetSegmentGenerator (round joins/caps only)."""

    def __init__(self, dist: float):
        self.d = dist
        self.out = _SegList(dist / 1000.0)
        self.s1 = self.s2 = None
        self.off1 = None

    def init_side(self, s1, s2):
        self.s1, self.s2 = s1, s2
        self.off1 = _offset_seg(s1, s2, self.d)

    def next_seg(self, p, add_start=True):
        s0, s1, s2 = self.s1, self.s2, p
        self.s1, self.s2 = s1, s2
        off0 = self.off1
        off1 = _offset_seg(s1, s2, self.d)
        self.off1 = off1
        turn = ((s1[0] - s0[0]) * (s2[1] - s0[1])
                - (s1[1] - s0[1]) * (s2[0] - s0[0]))
        outside = turn < 0  # LEFT-side offset: clockwise turn is outside
        if turn == 0:
            # collinear: just continue (round join degenerate)
            self.out.add(off0[1])
            return
        gap = _math.hypot(off0[1][0] - off1[0][0],
                          off0[1][1] - off1[0][1])
        if outside:
            # JTS OFFSET_SEGMENT_SEPARATION_FACTOR = 1e-3: nearly
            # coincident offset endpoints collapse to one vertex
            if gap < self.d * 1e-3:
                self.out.add(off0[1])
                return
            if add_start:
                self.out.add(off0[1])
            _fillet(self.out, s1, off0[1], off1[0], -1, self.d)
            self.out.add(off1[0])
        else:
            # inside turn (JTS addInsideTurn): if the two offset
            # segments intersect, emit just the intersection point
            inter = _seg_intersections(_fpt(off0[0]), _fpt(off0[1]),
                                       _fpt(off1[0]), _fpt(off1[1]))
            if inter:
                self.out.add((float(inter[0][0]), float(inter[0][1])))
                return
            if gap < self.d * 1e-3:
                self.out.add(off0[1])
                return
            # mis-turn: closing segments toward the vertex
            self.out.add(off0[1])
            f = _CLOSING_FACTOR
            self.out.add((((f * off0[1][0] + s1[0]) / (f + 1)),
                          ((f * off0[1][1] + s1[1]) / (f + 1))))
            self.out.add((((f * off1[0][0] + s1[0]) / (f + 1)),
                          ((f * off1[0][1] + s1[1]) / (f + 1))))
            self.out.add(off1[0])

    def last_seg(self):
        self.out.add(self.off1[1])

    def end_cap(self, p0, p1):
        """round cap past p1 (travel direction p0 -> p1); JTS
        addLineEndCap ends with the right-offset endpoint."""
        dx, dy = p1[0] - p0[0], p1[1] - p0[1]
        ang = _math.atan2(dy, dx)
        _directed_fillet(self.out, p1, ang + _math.pi / 2,
                         ang - _math.pi / 2, -1, self.d)
        self.out.add((p1[0] + self.d * _math.cos(ang - _math.pi / 2),
                      p1[1] + self.d * _math.sin(ang - _math.pi / 2)))


def _circle_pts(p, r):
    sl = _SegList(r / 1000.0)
    sl.add((p[0] + r, p[1]))
    _directed_fillet(sl, p, 0.0, 2 * _math.pi, -1, r)
    sl.close()
    return sl.pts


def _line_curve(pts, d):
    """closed buffer curve of an open polyline (both sides + caps)"""
    gen = _OffsetGen(d)
    n = len(pts) - 1
    gen.init_side(pts[0], pts[1])
    for i in range(2, n + 1):
        gen.next_seg(pts[i], True)
    gen.last_seg()
    gen.end_cap(pts[n - 1], pts[n])
    gen.init_side(pts[n], pts[n - 1])
    for i in range(n - 2, -1, -1):
        gen.next_seg(pts[i], True)
    gen.last_seg()
    gen.end_cap(pts[1], pts[0])
    gen.out.close()
    return gen.out.pts


def _ring_curve(ring, d):
    """exterior offset curve of a closed ring (shell buffered
    outward). The ring is traversed so its LEFT is the exterior."""
    pts = list(ring)
    if pts[0] != pts[-1]:
        pts.append(pts[0])
    # ensure counter-clockwise-with-exterior-left: left-offset needs
    # travel with interior on the right -> clockwise ring. Exact
    # rational shoelace — the double form cancels to 0.0 on the
    # reference's 1e-10-sized pin rectangle.
    s = _signed_area2([_fpt(p) for p in pts[:-1]])
    if s > 0:
        pts = pts[::-1]
    n = len(pts) - 1
    gen = _OffsetGen(d)
    gen.init_side(pts[n - 1], pts[0])
    for i in range(1, n + 1):
        gen.next_seg(pts[i], True)
    gen.out.close()
    return gen.out.pts


def _winding_region(curves):
    """Node the directed closed curves and extract the boundary of
    the positive-winding region — the cleanup pass JTS's
    BufferBuilder does with its overlay graph. Returns face list for
    _to_wkt."""
    dir_edges = []
    for c in curves:
        fp = [_fpt(p) for p in c]
        for a, b in zip(fp, fp[1:]):
            if a != b:
                dir_edges.append((a, b))
    # node
    cuts = [set() for _ in dir_edges]
    for i, (a, b) in enumerate(dir_edges):
        for j, (c, d) in enumerate(dir_edges):
            if i == j:
                continue
            for p in _seg_intersections(a, b, c, d):
                cuts[i].add(p)
    noded = []
    for (a, b), cut in zip(dir_edges, cuts):
        ordered = sorted(cut | {a, b},
                         key=lambda p: ((p[0] - a[0]) ** 2
                                        + (p[1] - a[1]) ** 2))
        noded.extend((u, v) for u, v in zip(ordered, ordered[1:])
                     if u != v)

    def winding(q):
        w = 0
        for a, b in noded:
            if (a[1] > q[1]) != (b[1] > q[1]):
                t = (q[1] - a[1]) / (b[1] - a[1])
                x = a[0] + t * (b[0] - a[0])
                if x > q[0]:
                    w += 1 if b[1] > a[1] else -1
        return w

    labels = {}
    for u, v in noded:
        key = (u, v) if (u[1], u[0]) <= (v[1], v[0]) else (v, u)
        labels.setdefault(key, True)
    eps = _eps_for(labels)
    boundary = []
    seen = set()
    for u, v in noded:
        key = (u, v) if (u[1], u[0]) <= (v[1], v[0]) else (v, u)
        if key in seen:
            continue
        seen.add(key)
        left, right = _side_pts(u, v, eps)
        inl, inr = winding(left) != 0, winding(right) != 0
        if inl != inr:
            boundary.append((u, v, True) if inr else (v, u, True))
    return _assemble_faces(boundary)


def buffer_wkt(wkt: str, dist: float):
    """ST_Buffer core (raise/zero/empty handling in the UDF)."""
    g = _W.parse_wkt(wkt)

    def curves_of(parsed):
        tag, payload = parsed
        if payload is None:
            return []
        if tag == "POINT":
            return [_circle_pts(payload, dist)]
        if tag == "MULTIPOINT":
            return [_circle_pts(p, dist) for p in payload]
        if tag == "LINESTRING":
            return [_line_curve(payload, dist)]
        if tag == "MULTILINESTRING":
            return [_line_curve(p, dist) for p in payload]
        if tag == "POLYGON":
            if len(payload) > 1:
                raise NotImplementedError(
                    "ST_Buffer of a polygon with holes is not "
                    "supported on the SQL surface (unpinned in the "
                    "reference tests; the DataFrame path in "
                    "functions/geo_clip.py carries holed-polygon "
                    "buffer areas)")
            return [_ring_curve(payload[0], dist)]
        if tag == "MULTIPOLYGON":
            if any(len(rings) > 1 for rings in payload):
                raise NotImplementedError(
                    "ST_Buffer of a polygon with holes is not "
                    "supported on the SQL surface")
            return [_ring_curve(rings[0], dist) for rings in payload]
        return [c for sub in payload for c in curves_of(sub)]

    curves = curves_of(g)
    if not curves:
        return None
    # the offset curve of a shell is ONE closed loop encircling the
    # polygon plus its band — the interior already has winding +-1,
    # no extra winding source needed
    faces = _winding_region(curves)

    # Collapse sub-double-precision artifact vertices: our exact
    # noder finds crossings between nearly coincident arc chords that
    # JTS's double-based noder never sees. The tolerance must stay
    # below real vertex spacing (the reference pins keep vertices
    # 1e-10 apart at distance 0.01, TestGeoFunctions.java:209).
    snap2 = Fraction(dist * 1e-9) ** 2

    def snap_ring(r):
        out = []
        for p in r:
            if out and (p[0] - out[-1][0]) ** 2 \
                    + (p[1] - out[-1][1]) ** 2 <= snap2:
                continue
            out.append(p)
        if len(out) > 1 and (out[0][0] - out[-1][0]) ** 2 \
                + (out[0][1] - out[-1][1]) ** 2 <= snap2:
            out.pop()
        return out

    faces = [(snap_ring(shell), [snap_ring(h) for h in holes])
             for shell, holes in faces]
    faces = [(s, [h for h in hs if len(h) >= 3])
             for s, hs in faces if len(s) >= 3]
    return _to_wkt([], [], faces)


def union_all(wkts) -> str | None:
    """geometry_union(array(Geometry)) / geometry_union_agg
    (GeoFunctions.java:588-596 stUnion over a cursor): left fold of
    the binary overlay union; nulls skipped, empty input -> null.
    Point-set equal to the reference's n-ary union; serialization is
    this engine's canonical form (ESRI's n-ary path emits an internal
    ring phase and dissolves some collinear crossing vertices — the
    aggregate tests compare geometries, not text)."""
    acc = None
    for w in wkts or []:
        if w is None:
            continue
        acc = _W.geometry_from_text(w) if acc is None else union(acc, w)
    return acc
