"""Computational-geometry algorithms over the internal Geom repr.

Implements (from scratch — no GEOS available in this environment) the kernel
semantics of the reference's function set:
- measures:   /root/reference/c/sedona-geos/src/st_area.rs, st_length.rs, distance.rs
- predicates: /root/reference/c/sedona-geos/src/binary_predicates.rs
- overlay:    /root/reference/c/sedona-geos/src/overlay.rs (subset: point/line vs
              polygon, convex clip via Sutherland-Hodgman)
- hull:       /root/reference/c/sedona-geos/src/st_convexhull.rs (monotone chain)
- simplify:   /root/reference/c/sedona-geos/src/st_simplify.rs (Douglas-Peucker)
- affine:     /root/reference/rust/sedona-functions/src/st_affine.rs

Semantics follow PostGIS/GEOS conventions the reference tests encode
(/root/reference/python/sedonadb/tests/functions/test_predicates.py:21-97):
boundary-touch => contains False / intersects True; EMPTY never intersects.
"""

from __future__ import annotations

import math

import numpy as np

from sedona_db_spark.geom.core import (
    GEOMETRYCOLLECTION, LINESTRING, MULTILINESTRING, MULTIPOINT,
    MULTIPOLYGON, POINT, POLYGON, Geom, make_point,
)

_EPS = 1e-12


# ======================================================================
# bounds / envelope
# ======================================================================

def bounds(g: Geom):
    """(xmin, ymin, xmax, ymax) or None for empty.  Memoized on the Geom
    (hot path of every bbox prefilter); polygon bounds come from shell
    rings only — holes are interior by definition — avoiding the
    all_coords concatenation."""
    b = g._bounds
    if b is not None:
        return b
    if g.gt == POINT:
        if g.data is None:
            return None
        x, y = float(g.data[0]), float(g.data[1])
        b = (x, y, x, y)
    elif g.gt == LINESTRING:
        if len(g.data) == 0:
            return None
        c = g.data
        mn = c[:, :2].min(axis=0)
        mx = c[:, :2].max(axis=0)
        b = (float(mn[0]), float(mn[1]), float(mx[0]), float(mx[1]))
    elif g.gt == POLYGON:
        if len(g.data) == 0:
            return None
        c = g.data[0]  # shell only
        mn = c[:, :2].min(axis=0)
        mx = c[:, :2].max(axis=0)
        b = (float(mn[0]), float(mn[1]), float(mx[0]), float(mx[1]))
    else:
        parts = [bounds(s) for s in g.geometries()]
        parts = [p for p in parts if p is not None]
        if not parts:
            return None
        b = (min(p[0] for p in parts), min(p[1] for p in parts),
             max(p[2] for p in parts), max(p[3] for p in parts))
    g._bounds = b
    return b


def envelope(g: Geom) -> Geom:
    b = bounds(g)
    if b is None:
        return g          # GEOS: empty input keeps its type
    x0, y0, x1, y1 = b
    if x0 == x1 and y0 == y1:
        return make_point(x0, y0)
    if x0 == x1 or y0 == y1:
        return Geom(LINESTRING, np.array([[x0, y0], [x1, y1]]))
    # GEOS ring order: CW from (xmin, ymin) going up (python/sedonadb
    # tests pin POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0)))
    ring = np.array([[x0, y0], [x0, y1], [x1, y1], [x1, y0], [x0, y0]])
    return Geom(POLYGON, [ring])


def box_polygon(x0, y0, x1, y1) -> Geom:
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64)
    return Geom(POLYGON, [ring])


def bbox_intersects(b1, b2) -> bool:
    if b1 is None or b2 is None:
        return False
    return not (b1[2] < b2[0] or b2[2] < b1[0] or b1[3] < b2[1] or b2[3] < b1[1])


# ======================================================================
# measures
# ======================================================================

def _ring_area2(ring: np.ndarray) -> float:
    """Twice the signed shoelace area (CCW positive)."""
    x, y = ring[:, 0], ring[:, 1]
    return float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def area(g: Geom) -> float:
    total = 0.0
    for poly in g.polygons():
        if not poly:
            continue
        total += abs(_ring_area2(poly[0])) / 2.0
        for hole in poly[1:]:
            total -= abs(_ring_area2(hole)) / 2.0
    return total


def _path_length(arr: np.ndarray) -> float:
    if len(arr) < 2:
        return 0.0
    d = np.diff(arr[:, :2], axis=0)
    return float(np.sum(np.hypot(d[:, 0], d[:, 1])))


def length(g: Geom) -> float:
    """Length of linear parts (PostGIS ST_Length: 0 for polygons/points)."""
    return sum(_path_length(l) for l in g.lines())


def perimeter(g: Geom) -> float:
    return sum(_path_length(r) for r in g.rings())


def centroid(g: Geom):
    """Area/length/count-weighted centroid of highest-dimension parts."""
    dim = g.dimension()
    if g.is_empty():
        return None
    if dim == 2:
        cx = cy = A = 0.0
        for poly in g.polygons():
            for i, ring in enumerate(poly):
                x, y = ring[:, 0], ring[:, 1]
                xn, yn = np.roll(x, -1), np.roll(y, -1)
                cross = x * yn - xn * y
                a2 = float(np.sum(cross))  # signed
                if abs(a2) < _EPS:
                    continue
                gx = float(np.sum((x + xn) * cross)) / (3.0 * a2)
                gy = float(np.sum((y + yn) * cross)) / (3.0 * a2)
                w = abs(a2) / 2.0 * (1.0 if i == 0 else -1.0)
                cx += gx * w
                cy += gy * w
                A += w
        if abs(A) > _EPS:
            return (cx / A, cy / A)
        dim = 1  # degenerate polygon -> fall through to length centroid
    if dim == 1:
        cx = cy = L = 0.0
        segs = list(g.lines()) + list(g.rings())
        for arr in segs:
            if len(arr) < 2:
                continue
            p, q = arr[:-1, :2], arr[1:, :2]
            seglen = np.hypot(*(q - p).T)
            mid = (p + q) / 2.0
            cx += float(np.sum(mid[:, 0] * seglen))
            cy += float(np.sum(mid[:, 1] * seglen))
            L += float(np.sum(seglen))
        if L > _EPS:
            return (cx / L, cy / L)
    pts = g.all_coords()
    if len(pts) == 0:
        return None
    return (float(np.mean(pts[:, 0])), float(np.mean(pts[:, 1])))


# ======================================================================
# low-level predicates
# ======================================================================

def _orient(o, a, b):
    """Cross product sign of (a-o) x (b-o)."""
    v = (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])
    if v > _EPS:
        return 1
    if v < -_EPS:
        return -1
    return 0


def _on_segment(p, a, b) -> bool:
    if _orient(a, b, p) != 0:
        return False
    return (min(a[0], b[0]) - _EPS <= p[0] <= max(a[0], b[0]) + _EPS and
            min(a[1], b[1]) - _EPS <= p[1] <= max(a[1], b[1]) + _EPS)


def _seg_intersects(a, b, c, d) -> bool:
    o1, o2 = _orient(a, b, c), _orient(a, b, d)
    o3, o4 = _orient(c, d, a), _orient(c, d, b)
    if o1 != o2 and o3 != o4:
        return True
    return (_on_segment(c, a, b) or _on_segment(d, a, b) or
            _on_segment(a, c, d) or _on_segment(b, c, d))


def _point_in_ring(p, ring: np.ndarray) -> int:
    """1 interior, 0 boundary, -1 exterior (ray casting, vectorized)."""
    x, y = p[0], p[1]
    xs, ys = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    # boundary check
    dx, dy = x2 - xs, y2 - ys
    cross = (x - xs) * dy - (y - ys) * dx
    within_x = (np.minimum(xs, x2) - _EPS <= x) & (x <= np.maximum(xs, x2) + _EPS)
    within_y = (np.minimum(ys, y2) - _EPS <= y) & (y <= np.maximum(ys, y2) + _EPS)
    seg_len2 = dx * dx + dy * dy
    tol = np.maximum(seg_len2, 1.0)
    if np.any((np.abs(cross) <= 1e-9 * np.sqrt(tol)) & within_x & within_y):
        return 0
    # ray cast to +x
    cond = (ys > y) != (y2 > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xi = xs + (y - ys) / (y2 - ys) * (x2 - xs)
    crossings = int(np.count_nonzero(cond & (x < xi)))
    return 1 if crossings % 2 == 1 else -1


def _point_in_polygon(p, poly_rings) -> int:
    """1 interior, 0 boundary, -1 exterior; polygon with holes."""
    r = _point_in_ring(p, poly_rings[0])
    if r <= 0:
        return r
    for hole in poly_rings[1:]:
        h = _point_in_ring(p, hole)
        if h == 1:
            return -1
        if h == 0:
            return 0
    return 1


def points_in_ring_batch(pts: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized _point_in_ring for many points: (n,) of {1, 0, -1}."""
    x = pts[:, 0:1]          # (n,1)
    y = pts[:, 1:2]
    xs, ys = ring[:, 0][None, :], ring[:, 1][None, :]   # (1,m)
    x2, y2 = np.roll(ring[:, 0], -1)[None, :], np.roll(ring[:, 1], -1)[None, :]
    dx, dy = x2 - xs, y2 - ys
    cross = (x - xs) * dy - (y - ys) * dx                # (n,m)
    within_x = (np.minimum(xs, x2) - _EPS <= x) & (x <= np.maximum(xs, x2) + _EPS)
    within_y = (np.minimum(ys, y2) - _EPS <= y) & (y <= np.maximum(ys, y2) + _EPS)
    seg_len2 = dx * dx + dy * dy
    tol = 1e-9 * np.sqrt(np.maximum(seg_len2, 1.0))
    on_boundary = ((np.abs(cross) <= tol) & within_x & within_y).any(axis=1)
    cond = (ys > y) != (y2 > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xi = xs + (y - ys) / (y2 - ys) * (x2 - xs)
    crossings = (cond & (x < xi)).sum(axis=1)
    out = np.where(crossings % 2 == 1, 1, -1)
    out[on_boundary] = 0
    return out


def points_in_polygon_batch(pts: np.ndarray, poly_rings) -> np.ndarray:
    """Vectorized _point_in_polygon (with holes) for many points."""
    res = points_in_ring_batch(pts, poly_rings[0])
    for hole in poly_rings[1:]:
        h = points_in_ring_batch(pts, hole)
        res = np.where((res == 1) & (h == 1), -1, res)
        res = np.where((res == 1) & (h == 0), 0, res)
    return res


def points_position_batch(pts: np.ndarray, g: Geom) -> np.ndarray:
    """Vectorized point_position for a pure-polygon geometry; falls back to
    the scalar path for mixed geometries."""
    polys = list(g.polygons())
    if polys and g.dimension() == 2 and not list(g.lines()) and not list(g.points()):
        res = np.full(len(pts), -1, dtype=np.int64)
        for poly in polys:
            r = points_in_polygon_batch(pts, poly)
            res = np.maximum(res, r)
        return res
    return np.array([point_position(p, g) for p in pts], dtype=np.int64)


def point_position(p, g: Geom) -> int:
    """Locate point vs geometry: 1 interior, 0 boundary, -1 exterior."""
    best = -1
    for poly in g.polygons():
        r = _point_in_polygon(p, poly)
        best = max(best, r)
        if best == 1:
            return 1
    for line in g.lines():
        for i in range(len(line) - 1):
            if _on_segment(p, line[i], line[i + 1]):
                # interior of a line unless at an unshared endpoint
                is_end = ((i == 0 and _close(p, line[0])) or
                          (i == len(line) - 2 and _close(p, line[-1])))
                closed = _close(line[0], line[-1])
                best = max(best, 0 if (is_end and not closed) else 1 if g.dimension() == 1 else 0)
    for q in g.points():
        if _close(p, q):
            best = max(best, 1 if g.dimension() == 0 else 0)
    return best


def _close(a, b) -> bool:
    return abs(a[0] - b[0]) <= _EPS and abs(a[1] - b[1]) <= _EPS


def _segments(g: Geom):
    for arr in list(g.lines()) + list(g.rings()):
        for i in range(len(arr) - 1):
            yield arr[i], arr[i + 1]


def _any_segment_cross(g1: Geom, g2: Geom) -> bool:
    segs2 = list(_segments(g2))
    if not segs2:
        return False
    for a, b in _segments(g1):
        sb = (min(a[0], b[0]), min(a[1], b[1]), max(a[0], b[0]), max(a[1], b[1]))
        for c, d in segs2:
            if (max(c[0], d[0]) < sb[0] - _EPS or min(c[0], d[0]) > sb[2] + _EPS or
                    max(c[1], d[1]) < sb[1] - _EPS or min(c[1], d[1]) > sb[3] + _EPS):
                continue
            if _seg_intersects(a, b, c, d):
                return True
    return False


# ======================================================================
# binary predicates (DE-9IM-lite)
# ======================================================================

def intersects(g1: Geom, g2: Geom) -> bool:
    if g1.is_empty() or g2.is_empty():
        return False
    if not bbox_intersects(bounds(g1), bounds(g2)):
        return False
    # any collection: distribute
    if g1.gt == GEOMETRYCOLLECTION:
        return any(intersects(s, g2) for s in g1.data)
    if g2.gt == GEOMETRYCOLLECTION:
        return any(intersects(g1, s) for s in g2.data)
    # point tests
    for p in g1.points():
        if point_position(p, g2) >= 0:
            return True
    for p in g2.points():
        if point_position(p, g1) >= 0:
            return True
    if g1.dimension() == 0 and g2.dimension() == 0:
        return False
    # edge crossings
    if _any_segment_cross(g1, g2):
        return True
    # containment without edge crossing: one inside the other
    c1 = _first_vertex(g1)
    if c1 is not None and any(_point_in_polygon(c1, poly) >= 0 for poly in g2.polygons()):
        return True
    c2 = _first_vertex(g2)
    if c2 is not None and any(_point_in_polygon(c2, poly) >= 0 for poly in g1.polygons()):
        return True
    return False


def _first_vertex(g: Geom):
    c = g.all_coords()
    return c[0] if len(c) else None


def _all_vertices_position(g: Geom, container: Geom):
    """min/max of point_position over every vertex of g."""
    lo, hi = 1, -1
    for c in g.all_coords():
        r = point_position(c, container)
        lo, hi = min(lo, r), max(hi, r)
    return lo, hi


def _interior_reps(g2: Geom):
    """Representative interior points of g2 (for the II-nonempty witness):
    polygons -> point_on_surface per part; lines -> segment midpoints;
    points -> the points themselves."""
    reps = []
    if g2.dimension() == 2:
        from sedona_db_spark.geom import algorithms2 as _a2
        for pr in g2.polygons():
            p = _a2.point_on_surface(Geom(POLYGON, list(pr)))
            if p is not None and p.data is not None:
                reps.append(np.asarray(p.data[:2], dtype=np.float64))
    elif g2.dimension() == 1:
        for a, b in _segments(g2):
            reps.append(np.array([(a[0] + b[0]) / 2.0, (a[1] + b[1]) / 2.0]))
    else:
        reps = [np.asarray(c[:2], dtype=np.float64) for c in g2.all_coords()]
    return reps


def _gc_contains(g1: Geom, g2: Geom) -> bool:
    """Contains with a GEOMETRYCOLLECTION on the left.  Union topology:
    a lower-dimension part lying on/in a higher-dimension part is absorbed
    into it (its independent interior disappears) — matches GEOS/PostGIS
    on the reference's test_predicates.py collection cases."""
    parts = [p for p in g1.geometries() if not p.is_empty()]
    polys = [p for p in parts if p.dimension() == 2]
    lines = [p for p in parts if p.dimension() == 1]
    pts = [p for p in parts if p.dimension() == 0]
    # coverage: nothing of g2 may fall outside the union of parts
    if not covers(g1, g2):
        return False
    # interior-interior witness
    for rep in _interior_reps(g2):
        if any(point_position(rep, poly) > 0 for poly in polys):
            return True
        on_poly_closure = any(point_position(rep, poly) >= 0 for poly in polys)
        if not on_poly_closure:
            for ln in lines:
                if point_position(rep, ln) > 0:
                    return True
        touched = on_poly_closure or any(
            point_position(rep, ln) >= 0 for ln in lines)
        if not touched:
            for pp in pts:
                if point_position(rep, pp) > 0:
                    return True
    return False


def contains(g1: Geom, g2: Geom) -> bool:
    """PostGIS ST_Contains: g2 fully inside g1, interiors must intersect."""
    if g1.is_empty() or g2.is_empty():
        return False
    b1, b2 = bounds(g1), bounds(g2)
    if b1 is None or b2 is None:
        return False
    if b2[0] < b1[0] - _EPS or b2[1] < b1[1] - _EPS or b2[2] > b1[2] + _EPS or b2[3] > b1[3] + _EPS:
        return False
    if g1.gt == GEOMETRYCOLLECTION:
        return _gc_contains(g1, g2)
    if g2.gt == GEOMETRYCOLLECTION:
        return all(contains(g1, s) for s in g2.data if not s.is_empty())
    lo, hi = _all_vertices_position(g2, g1)
    if lo < 0:
        return False
    if hi < 1 and g2.dimension() == 0:
        return False  # all points on boundary -> contains is false
    if g2.dimension() >= 1:
        # no edge of g2 may cross out of g1; approximate: no proper crossing
        # with g1's boundary, plus midpoints inside
        if _any_proper_cross(g1, g2):
            return False
        if not _midpoints_inside(g2, g1):
            return False
        if g1.dimension() == 2:
            # interior-interior witness: some representative interior point
            # of g2 must be strictly inside g1 (catches hole-boundary
            # sharing and boundary-only lines), and none strictly outside
            pos = [point_position(r, g1) for r in _interior_reps(g2)]
            if any(p < 0 for p in pos):
                return False
            if pos and not any(p > 0 for p in pos):
                return False
        if g1.dimension() == 2 and g2.dimension() == 2 \
                and _cover_needs_exact(g1):
            return _covers_exact_area(g1, g2)
    return True


def _cover_needs_exact(g1: Geom) -> bool:
    """Boundary/midpoint sampling proves area coverage only when g1 is a
    single hole-free polygon (simply connected: g2's boundary inside g1
    implies g2 inside g1).  Holes or multiple parts can sit strictly
    inside g2 without touching its boundary — needs the exact check."""
    polys = list(g1.polygons())
    return len(polys) > 1 or any(len(p) > 1 for p in polys)


def _covers_exact_area(g1: Geom, g2: Geom) -> bool:
    """g2's area minus g1's area must be empty (Martinez sweep)."""
    from sedona_db_spark.geom import clip as _mclip
    d = _mclip.polygon_boolean(g2, g1, "difference")
    return d.is_empty() or area(d) == 0.0


def _any_proper_cross(g1: Geom, g2: Geom) -> bool:
    """True if a segment of g2 properly crosses a boundary segment of g1."""
    for a, b in _segments(g2):
        for c, d in _segments(g1):
            o1, o2 = _orient(c, d, a), _orient(c, d, b)
            o3, o4 = _orient(a, b, c), _orient(a, b, d)
            if o1 * o2 < 0 and o3 * o4 < 0:
                return True
    return False


def _midpoints_inside(g2: Geom, g1: Geom) -> bool:
    for a, b in _segments(g2):
        mid = ((a[0] + b[0]) / 2.0, (a[1] + b[1]) / 2.0)
        if point_position(mid, g1) < 0:
            return False
    return True


def within(g1, g2):
    return contains(g2, g1)


def covers(g1: Geom, g2: Geom) -> bool:
    """Like contains but boundary-only containment is allowed."""
    if g1.is_empty() or g2.is_empty():
        return False
    if g2.gt == GEOMETRYCOLLECTION:
        return all(covers(g1, s) for s in g2.data if not s.is_empty())
    lo, _ = _all_vertices_position(g2, g1)
    if lo < 0:
        return False
    if g2.dimension() >= 1:
        if _any_proper_cross(g1, g2):
            return False
        for a, b in _segments(g2):
            mid = ((a[0] + b[0]) / 2.0, (a[1] + b[1]) / 2.0)
            if point_position(mid, g1) < 0:
                return False
        if g1.dimension() == 2 and g2.dimension() == 2 \
                and _cover_needs_exact(g1):
            return _covers_exact_area(g1, g2)
    return True


def covered_by(g1, g2):
    return covers(g2, g1)


def disjoint(g1, g2):
    return not intersects(g1, g2)


def touches(g1: Geom, g2: Geom) -> bool:
    """Boundary-only contact: intersects with empty interior-interior
    intersection (DE-9IM F********, GEOS semantics).  Exact per dim
    pair: point sides by position, line x area by split-segment
    classified lengths, area x area by overlay area, line x line by the
    exact II cell (collinear overlap / proper cross / interior vertex
    contact all counted)."""
    if not intersects(g1, g2):
        return False
    d1, d2 = g1.dimension(), g2.dimension()
    if d1 == 0 and d2 == 0:
        return False  # any point-point contact is interior-interior
    if d1 == 0 or d2 == 0:
        pts = g1 if d1 == 0 else g2
        other = g2 if d1 == 0 else g1
        # II empty <=> no point in the other's interior (line interiors
        # and open polygon interiors both read 1 from point_position)
        return all(point_position(p, other) <= 0 for p in pts.points())
    if d1 == 2 and d2 == 2:
        from sedona_db_spark.geom import clip as _mclip
        return area(_mclip.polygon_boolean(g1, g2, "intersection")) <= 1e-12
    if 2 in (d1, d2):
        line, poly = (g1, g2) if d1 == 1 else (g2, g1)
        from sedona_db_spark.geom import algorithms2 as _a2
        li, _lb, _le = _a2._linework_position_lengths(line, poly)
        return li <= 1e-12
    from sedona_db_spark.geom import algorithms2 as _a2
    return not _a2.lines_ii_nonempty(g1, g2)


def equals(g1: Geom, g2: Geom) -> bool:
    if g1.is_empty() and g2.is_empty():
        return True
    if g1.dimension() != g2.dimension():
        return False
    return covers(g1, g2) and covers(g2, g1)


def crosses(g1: Geom, g2: Geom) -> bool:
    """DE-9IM crosses: lower-dim side meets both interior and exterior
    of the higher (T*T****** / T*****T**), lines cross at dim-0 (0********).
    Line x area uses exact split-segment lengths (midpoint sampling
    missed vertex-only boundary transits)."""
    d1, d2 = g1.dimension(), g2.dimension()
    if not intersects(g1, g2):
        return False
    if d1 == d2 == 1:
        from sedona_db_spark.geom import algorithms2 as _a2
        return (not _a2._lines_share_dim1(g1, g2)
                and _a2.lines_ii_nonempty(g1, g2))
    if {d1, d2} == {0, 1} or {d1, d2} == {0, 2}:
        pts = g1 if d1 == 0 else g2
        other = g2 if d1 == 0 else g1
        positions = [point_position(p, other) for p in pts.points()]
        return any(r == 1 for r in positions) and any(r == -1 for r in positions)
    if {d1, d2} == {1, 2}:
        line = g1 if d1 == 1 else g2
        poly = g2 if d1 == 1 else g1
        from sedona_db_spark.geom import algorithms2 as _a2
        li, _lb, le = _a2._linework_position_lengths(line, poly)
        return li > 1e-12 and le > 1e-12
    return False


def overlaps(g1: Geom, g2: Geom) -> bool:
    """DE-9IM overlaps: same dimension, interiors share that SAME
    dimension, and each side keeps an exclusive part.  Lines that merely
    cross at a point do NOT overlap (dim(II)=0 != 1); areas must share
    positive area."""
    d1, d2 = g1.dimension(), g2.dimension()
    if d1 != d2 or not intersects(g1, g2):
        return False
    if d1 == 0:
        pa = {(round(p[0] / _EPS), round(p[1] / _EPS)) for p in g1.points()}
        pb = {(round(p[0] / _EPS), round(p[1] / _EPS)) for p in g2.points()}
        return bool(pa & pb) and bool(pa - pb) and bool(pb - pa)
    if d1 == 1:
        from sedona_db_spark.geom import algorithms2 as _a2
        return (_a2._lines_share_dim1(g1, g2)
                and not covered_by(g1, g2) and not covered_by(g2, g1))
    from sedona_db_spark.geom import clip as _mclip
    return (area(_mclip.polygon_boolean(g1, g2, "intersection")) > 1e-12
            and not covered_by(g1, g2) and not covered_by(g2, g1))


# ======================================================================
# distance
# ======================================================================

def _pt_seg_dist_many(p, segs_a: np.ndarray, segs_b: np.ndarray) -> float:
    """Min distance from point p to segments (a_i -> b_i), vectorized."""
    d = segs_b - segs_a
    len2 = np.einsum("ij,ij->i", d, d)
    ap = p[:2] - segs_a
    t = np.clip(np.divide(np.einsum("ij,ij->i", ap, d), np.where(len2 == 0, 1, len2)), 0, 1)
    proj = segs_a + t[:, None] * d
    diff = p[:2] - proj
    return float(np.sqrt(np.min(np.einsum("ij,ij->i", diff, diff))))


def _collect_segments(g: Geom):
    arrs = list(g.lines()) + list(g.rings())
    a_list, b_list = [], []
    for arr in arrs:
        if len(arr) >= 2:
            a_list.append(arr[:-1, :2])
            b_list.append(arr[1:, :2])
    if not a_list:
        return None, None
    return np.concatenate(a_list), np.concatenate(b_list)


def points_to_polygon_distance_batch(pts: np.ndarray, g: Geom) -> np.ndarray:
    """Vectorized distance from each point to an areal geometry: 0 for
    covered points (incl. boundary; holes handled by point_position),
    else the min distance to any ring segment.  One numpy pass per
    segment — the KNN-refine shape (few polygons against many points)."""
    pts = np.asarray(pts, dtype=np.float64)[:, :2]
    d = np.full(len(pts), np.inf)
    for ring in g.rings():
        arr = np.asarray(ring, dtype=np.float64)[:, :2]
        a, b = arr[:-1], arr[1:]
        for i in range(len(a)):
            dv = b[i] - a[i]
            L2 = float(dv @ dv)
            if L2 <= 0.0:
                dd = np.hypot(pts[:, 0] - a[i, 0], pts[:, 1] - a[i, 1])
            else:
                t = np.clip(((pts - a[i]) @ dv) / L2, 0.0, 1.0)
                proj = a[i] + t[:, None] * dv
                dd = np.hypot(pts[:, 0] - proj[:, 0], pts[:, 1] - proj[:, 1])
            np.minimum(d, dd, out=d)
    pos = points_position_batch(pts, g)
    d[pos >= 0] = 0.0
    return d


def distance(g1: Geom, g2: Geom):
    if g1.is_empty() or g2.is_empty():
        return None
    if intersects(g1, g2):
        return 0.0
    best = math.inf
    p1 = list(g1.points())
    p2 = list(g2.points())
    a1, b1 = _collect_segments(g1)
    a2, b2 = _collect_segments(g2)
    # point-point
    if p1 and p2:
        arr1 = np.array([p[:2] for p in p1])
        arr2 = np.array([p[:2] for p in p2])
        diff = arr1[:, None, :] - arr2[None, :, :]
        best = min(best, float(np.sqrt(np.min(np.einsum("ijk,ijk->ij", diff, diff)))))
    # point-seg both directions
    if p1 and a2 is not None:
        best = min(best, min(_pt_seg_dist_many(p, a2, b2) for p in p1))
    if p2 and a1 is not None:
        best = min(best, min(_pt_seg_dist_many(p, a1, b1) for p in p2))
    # seg-seg: endpoints-to-other-segments (sufficient for non-crossing segs)
    if a1 is not None and a2 is not None:
        for p in np.concatenate([a1, b1]):
            best = min(best, _pt_seg_dist_many(p, a2, b2))
        for p in np.concatenate([a2, b2]):
            best = min(best, _pt_seg_dist_many(p, a1, b1))
    return best if best < math.inf else None


def dwithin(g1: Geom, g2: Geom, d: float):
    r = distance(g1, g2)
    return None if r is None else bool(r <= d + _EPS)


def max_distance(g1: Geom, g2: Geom):
    """Max distance between vertices (reference st_max_distance.rs)."""
    c1, c2 = g1.all_coords(), g2.all_coords()
    if len(c1) == 0 or len(c2) == 0:
        return None
    diff = c1[:, None, :2] - c2[None, :, :2]
    return float(np.sqrt(np.max(np.einsum("ijk,ijk->ij", diff, diff))))


def hausdorff(g1: Geom, g2: Geom):
    """Discrete (vertex-sampled) Hausdorff distance."""
    a1, b1 = _collect_segments(g1)
    a2, b2 = _collect_segments(g2)
    c1, c2 = g1.all_coords(), g2.all_coords()
    if len(c1) == 0 or len(c2) == 0:
        return None

    def _dir(coords, sa, sb, other_pts):
        worst = 0.0
        for p in coords:
            if sa is not None:
                dmin = _pt_seg_dist_many(p, sa, sb)
            else:
                diff = other_pts[:, :2] - p[:2]
                dmin = float(np.sqrt(np.min(np.einsum("ij,ij->i", diff, diff))))
            worst = max(worst, dmin)
        return worst

    return max(_dir(c1, a2, b2, c2), _dir(c2, a1, b1, c1))


# ======================================================================
# hull / simplify / affine / line ops
# ======================================================================

def convex_hull(g: Geom) -> Geom:
    pts = g.all_coords()[:, :2]
    if len(pts) == 0:
        return Geom(GEOMETRYCOLLECTION, [])
    pts = np.unique(pts, axis=0)
    if len(pts) == 1:
        return make_point(pts[0][0], pts[0][1])
    if len(pts) == 2:
        return Geom(LINESTRING, pts)
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2 and _orient(out[-2], out[-1], p) <= 0:
                out.pop()
            out.append(tuple(p))
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    hull = lower[:-1] + upper[:-1]
    if len(hull) < 3:
        return Geom(LINESTRING, np.array(hull))
    ring = np.array(hull + [hull[0]], dtype=np.float64)
    # CCW from monotone chain; PostGIS emits CCW shell too
    return Geom(POLYGON, [ring])


def _dp_mask(arr: np.ndarray, tol: float, i: int, j: int, keep: np.ndarray):
    if j <= i + 1:
        return
    a, b = arr[i, :2], arr[j, :2]
    seg = b - a
    seg_len2 = float(seg @ seg)
    pts = arr[i + 1:j, :2]
    if seg_len2 < _EPS:
        d = np.sqrt(np.einsum("ij,ij->i", pts - a, pts - a))
    else:
        t = np.clip(((pts - a) @ seg) / seg_len2, 0, 1)
        proj = a + t[:, None] * seg
        d = np.sqrt(np.einsum("ij,ij->i", pts - proj, pts - proj))
    kmax = int(np.argmax(d))
    if d[kmax] > tol:
        keep[i + 1 + kmax] = True
        _dp_mask(arr, tol, i, i + 1 + kmax, keep)
        _dp_mask(arr, tol, i + 1 + kmax, j, keep)


def _simplify_path(arr: np.ndarray, tol: float, is_ring: bool) -> np.ndarray:
    if len(arr) <= 2:
        return arr
    keep = np.zeros(len(arr), dtype=bool)
    keep[0] = keep[-1] = True
    _dp_mask(arr, tol, 0, len(arr) - 1, keep)
    out = arr[keep]
    if is_ring and len(out) < 4:
        return arr
    return out


def _ring_preserve_simplify(r, tol, must_contain=None):
    """TopologyPreservingSimplifier ring pass: greedy max-deviation
    re-insertion from the anchor vertex until every remaining deviation
    is within tolerance AND the ring stays a valid positive-area ring
    that still contains `must_contain` points (hole-in-shell guard).
    Equal deviations resolve to the LOWEST vertex index (python/sedonadb
    test_st_simplifypreservetopology pins (5 5, 5 6, 8 5))."""
    body = np.asarray(r, dtype=np.float64)[:-1]
    n = len(body)
    if n <= 3:
        return np.vstack([body, body[:1]])
    sel = {0}

    def chord_dev(idx, s_sorted):
        # distance of body[idx] to the chord between its selected
        # cyclic neighbors
        import bisect
        pos = bisect.bisect_left(s_sorted, idx)
        a = body[s_sorted[pos - 1]]
        b = body[s_sorted[pos % len(s_sorted)]]
        ab = (b - a)[:2]
        L2 = float(ab @ ab)
        if L2 <= 0:
            return float(np.hypot(*(body[idx][:2] - a[:2])))
        t = min(1.0, max(0.0, float((body[idx][:2] - a[:2]) @ ab) / L2))
        proj = a[:2] + t * ab
        return float(np.hypot(*(body[idx][:2] - proj)))

    while len(sel) < n:
        s_sorted = sorted(sel)
        ring = np.vstack([body[s_sorted], body[s_sorted[:1]]])
        ok = (len(s_sorted) >= 3
              and abs(_ring_area2(ring)) > _EPS
              and (must_contain is None or all(
                  _point_in_ring(p, ring) >= 0 for p in must_contain)))
        best = None
        for idx in range(n):
            if idx in sel:
                continue
            d = chord_dev(idx, s_sorted)
            if best is None or d > best[0] + 1e-15:
                best = (d, idx)
        if best is None:
            break
        if best[0] > tol or not ok:
            sel.add(best[1])
        else:
            break
    s_sorted = sorted(sel)
    return np.vstack([body[s_sorted], body[s_sorted[:1]]])


def simplify(g: Geom, tol: float, preserve: bool = False) -> Geom:
    """Douglas-Peucker.  Plain mode DROPS rings/parts that collapse
    under the tolerance (GEOS DouglasPeuckerSimplifier; python/sedonadb
    test_st_simplify pins the degenerate-part drops); preserve mode
    simplifies each ring only as far as validity allows — minimum
    triangle, holes still inside the shell
    (TopologyPreservingSimplifier)."""
    def ring_out(r):
        # raw DP (no ring-restore): a ring that collapses below 4
        # points or zero area must be DETECTED, not silently restored
        rr = _simplify_path(r, tol, False)
        if len(rr) >= 4 and abs(_ring_area2(rr)) > _EPS:
            return rr
        return np.asarray(r, dtype=np.float64) if preserve else None

    if g.gt == LINESTRING:
        return Geom(LINESTRING, _simplify_path(g.data, tol, False), g.has_z, g.has_m)
    if g.gt == POLYGON:
        if preserve:
            if not g.data:
                return g
            holes = [_ring_preserve_simplify(h, tol) for h in g.data[1:]]
            hole_pts = (np.vstack([h[:-1] for h in holes])
                        if holes else None)
            shell = _ring_preserve_simplify(g.data[0], tol, hole_pts)
            return Geom(POLYGON, [shell] + holes, g.has_z, g.has_m)
        rings = []
        for i, r in enumerate(g.data):
            rr = ring_out(r)
            if rr is None:
                if i == 0:
                    return Geom(POLYGON, [], g.has_z, g.has_m)
                continue   # collapsed hole drops
            rings.append(rr)
        return Geom(POLYGON, rings, g.has_z, g.has_m)
    if g.gt == MULTILINESTRING:
        return Geom(MULTILINESTRING, [_simplify_path(l, tol, False) for l in g.data], g.has_z, g.has_m)
    if g.gt == MULTIPOLYGON:
        parts = []
        for p in g.data:
            sp = simplify(Geom(POLYGON, list(p), g.has_z, g.has_m), tol,
                          preserve)
            if sp.data:
                parts.append(sp.data)
        return Geom(MULTIPOLYGON, parts, g.has_z, g.has_m)
    if g.gt == GEOMETRYCOLLECTION:
        return Geom(GEOMETRYCOLLECTION,
                    [simplify(s, tol, preserve) for s in g.data],
                    g.has_z, g.has_m)
    return g


def transform_coords_full(g: Geom, fn) -> Geom:
    """Apply fn((n,k) array)->(n,k) to every coordinate row, k = full
    coordinate width (transform_coords only hands fn the xy slice and
    DISCARDS its z writes — the 3-D kernels need the whole row)."""
    def tx(arr):
        if arr is None:
            return None
        arr = np.asarray(arr, dtype=np.float64)
        single = arr.ndim == 1
        a2 = arr.reshape(1, -1) if single else arr
        out = np.asarray(fn(a2), dtype=np.float64)
        return out[0] if single else out

    if g.gt == POINT:
        return Geom(POINT, tx(g.data), g.has_z, g.has_m, g.srid)
    if g.gt == LINESTRING:
        return Geom(LINESTRING, tx(g.data), g.has_z, g.has_m, g.srid)
    if g.gt == POLYGON:
        return Geom(POLYGON, [tx(r) for r in g.data], g.has_z, g.has_m, g.srid)
    if g.gt == MULTIPOINT:
        return Geom(MULTIPOINT, [tx(p) for p in g.data], g.has_z, g.has_m, g.srid)
    if g.gt == MULTILINESTRING:
        return Geom(MULTILINESTRING, [tx(l) for l in g.data], g.has_z, g.has_m, g.srid)
    if g.gt == MULTIPOLYGON:
        return Geom(MULTIPOLYGON, [[tx(r) for r in p] for p in g.data],
                    g.has_z, g.has_m, g.srid)
    return Geom(GEOMETRYCOLLECTION,
                [transform_coords_full(s, fn) for s in g.data],
                g.has_z, g.has_m, g.srid)


def transform_coords(g: Geom, fn) -> Geom:
    """Apply fn((n,2) array)->(n,2) to every xy, preserving extra dims."""
    def tx(arr):
        if arr is None:
            return None
        arr = np.asarray(arr, dtype=np.float64)
        single = arr.ndim == 1
        a2 = arr.reshape(1, -1) if single else arr
        out = a2.copy()
        out[:, :2] = fn(a2[:, :2])
        return out[0] if single else out

    if g.gt == POINT:
        return Geom(POINT, tx(g.data), g.has_z, g.has_m, g.srid)
    if g.gt == LINESTRING:
        return Geom(LINESTRING, tx(g.data), g.has_z, g.has_m, g.srid)
    if g.gt == POLYGON:
        return Geom(POLYGON, [tx(r) for r in g.data], g.has_z, g.has_m, g.srid)
    if g.gt == MULTIPOINT:
        return Geom(MULTIPOINT, [tx(p) for p in g.data], g.has_z, g.has_m, g.srid)
    if g.gt == MULTILINESTRING:
        return Geom(MULTILINESTRING, [tx(l) for l in g.data], g.has_z, g.has_m, g.srid)
    if g.gt == MULTIPOLYGON:
        return Geom(MULTIPOLYGON, [[tx(r) for r in p] for p in g.data], g.has_z, g.has_m, g.srid)
    return Geom(GEOMETRYCOLLECTION, [transform_coords(s, fn) for s in g.data], g.has_z, g.has_m, g.srid)


def affine(g: Geom, a, b, d, e, xoff, yoff) -> Geom:
    m = np.array([[a, b], [d, e]], dtype=np.float64)
    off = np.array([xoff, yoff], dtype=np.float64)
    return transform_coords(g, lambda xy: xy @ m.T + off)


def translate(g, dx, dy):
    return affine(g, 1, 0, 0, 1, dx, dy)


def scale(g, sx, sy):
    return affine(g, sx, 0, 0, sy, 0, 0)


def rotate(g, theta, ox=0.0, oy=0.0):
    c, s = math.cos(theta), math.sin(theta)
    return affine(g, c, -s, s, c, ox - ox * c + oy * s, oy - ox * s - oy * c)


def flip_coordinates(g):
    return transform_coords(g, lambda xy: xy[:, ::-1])


def line_interpolate_point(line: np.ndarray, frac: float):
    if len(line) == 0:
        return None
    frac = min(max(frac, 0.0), 1.0)
    seg = np.diff(line[:, :2], axis=0)
    seglen = np.hypot(seg[:, 0], seg[:, 1])
    total = float(np.sum(seglen))
    if total == 0:
        return line[0][:2]
    target = frac * total
    cum = np.concatenate([[0.0], np.cumsum(seglen)])
    i = int(np.searchsorted(cum, target, side="right")) - 1
    i = min(i, len(seglen) - 1)
    rem = target - cum[i]
    t = rem / seglen[i] if seglen[i] > 0 else 0.0
    return line[i, :2] + t * seg[i]


def line_locate_point(line: np.ndarray, p) -> float:
    if len(line) < 2:
        return 0.0
    a, b = line[:-1, :2], line[1:, :2]
    d = b - a
    len2 = np.einsum("ij,ij->i", d, d)
    t = np.clip(np.divide(np.einsum("ij,ij->i", p[:2] - a, d), np.where(len2 == 0, 1, len2)), 0, 1)
    proj = a + t[:, None] * d
    diff = p[:2] - proj
    dist2 = np.einsum("ij,ij->i", diff, diff)
    i = int(np.argmin(dist2))
    seglen = np.sqrt(len2)
    total = float(np.sum(seglen))
    if total == 0:
        return 0.0
    return float((np.sum(seglen[:i]) + t[i] * seglen[i]) / total)


def line_substring_full(line: np.ndarray, f0: float, f1: float) -> np.ndarray:
    """Substring of a line with EVERY coordinate column linearly
    interpolated (Z/M follow the 2-D arc-length parameter — GEOS
    LengthIndexedLine; python/sedonadb test_st_line_substring pins
    LINESTRING Z (5 5 5, 8 8 8)).  Returns one row for a degenerate
    span."""
    arr = np.asarray(line, dtype=np.float64)
    if f1 < f0:
        f0, f1 = f1, f0
    f0 = min(max(f0, 0.0), 1.0)
    f1 = min(max(f1, 0.0), 1.0)
    seg = np.diff(arr[:, :2], axis=0)
    seglen = np.hypot(seg[:, 0], seg[:, 1])
    total = float(seglen.sum())
    if total == 0:
        return arr[:1]
    cum = np.concatenate([[0.0], np.cumsum(seglen)])

    def at(target):
        i = int(np.searchsorted(cum, target, side="right")) - 1
        i = min(max(i, 0), len(seglen) - 1)
        t = 0.0 if seglen[i] == 0 else (target - cum[i]) / seglen[i]
        return arr[i] + t * (arr[i + 1] - arr[i])

    lo, hi = f0 * total, f1 * total
    if hi - lo <= 0:
        return at(lo).reshape(1, -1)
    rows = [at(lo)]
    for i in range(1, len(arr)):
        if lo < cum[i] < hi:
            rows.append(arr[i])
    rows.append(at(hi))
    return np.asarray(rows, dtype=np.float64)


def line_substring(line: np.ndarray, f0: float, f1: float):
    if f1 < f0:
        f0, f1 = f1, f0
    p0 = line_interpolate_point(line, f0)
    p1 = line_interpolate_point(line, f1)
    seg = np.diff(line[:, :2], axis=0)
    seglen = np.hypot(seg[:, 0], seg[:, 1])
    total = float(np.sum(seglen))
    cum = np.concatenate([[0.0], np.cumsum(seglen)])
    lo, hi = f0 * total, f1 * total
    mids = [p0]
    for i in range(1, len(line)):
        if lo < cum[i] < hi:
            mids.append(line[i, :2])
    mids.append(p1)
    return np.array(mids)


def segmentize(g: Geom, max_len: float) -> Geom:
    if max_len <= 0:
        raise ValueError(
            "ST_Segmentize: max_segment_length must be positive, got "
            f"{max_len}")

    def seg_path(arr):
        if len(arr) < 2:
            return arr
        out = [arr[0]]
        for i in range(1, len(arr)):
            a, b = arr[i - 1], arr[i]
            d = math.hypot(b[0] - a[0], b[1] - a[1])
            n = max(1, int(math.ceil(d / max_len)))
            for j in range(1, n + 1):
                out.append(a + (b - a) * (j / n))
        return np.array(out)

    if g.gt == LINESTRING:
        return Geom(LINESTRING, seg_path(g.data), g.has_z, g.has_m)
    if g.gt == POLYGON:
        return Geom(POLYGON, [seg_path(r) for r in g.data], g.has_z, g.has_m)
    if g.gt == MULTILINESTRING:
        return Geom(MULTILINESTRING, [seg_path(l) for l in g.data], g.has_z, g.has_m)
    if g.gt == MULTIPOLYGON:
        return Geom(MULTIPOLYGON, [[seg_path(r) for r in p] for p in g.data], g.has_z, g.has_m)
    if g.gt == GEOMETRYCOLLECTION:
        return Geom(GEOMETRYCOLLECTION, [segmentize(s, max_len) for s in g.data], g.has_z, g.has_m)
    return g


# ======================================================================
# buffer: Minkowski sum with a discretized disc.  Round joins/caps fall
# out of unioning per-segment capsules (exact up to arc discretization —
# the same semantics GEOS computes; reference c/sedona-geos/src/st_buffer.rs)
# ======================================================================

_CIRCLE_TABLES: dict = {}


def _circle_table(n: int):
    """cos/sin at the global angle grid j*2π/n — every arc samples THIS
    table so arcs sharing a center produce bitwise-identical vertices
    (coincident edges stay exactly coincident through the boolean sweep;
    1-ulp near-coincidence is what breaks it)."""
    tab = _CIRCLE_TABLES.get(n)
    if tab is None:
        step = 2.0 * math.pi / n
        tab = [(math.cos(j * step), math.sin(j * step)) for j in range(n)]
        _CIRCLE_TABLES[n] = tab
    return tab


def _arc_points(c, dist: float, a_from: float, a_to: float, n: int) -> list:
    """Clockwise arc (decreasing angle a_from -> a_to) around c, sampled
    on the global n-grid; endpoints snap to grid vertices when aligned."""
    tab = _circle_table(n)
    step = 2.0 * math.pi / n

    def ep(a):
        j = a / step
        rj = round(j)
        if abs(j - rj) < 1e-9:
            co, si = tab[int(rj) % n]
        else:
            co, si = math.cos(a), math.sin(a)
        return (c[0] + dist * co, c[1] + dist * si)

    pts = [ep(a_from)]
    j = math.floor(a_from / step)
    while j * step >= a_from - 1e-12 * step:
        j -= 1
    while j * step > a_to + 1e-12 * step:
        co, si = tab[j % n]
        pts.append((c[0] + dist * co, c[1] + dist * si))
        j -= 1
    pts.append(ep(a_to))
    return pts


def _disc_ring(c, dist: float, n: int) -> np.ndarray:
    c = np.asarray(c, dtype=float)[:2]
    tab = np.array(_circle_table(n))
    ring = c + dist * tab
    return np.vstack([ring, ring[:1]])


def _capsule_ring(p0, p1, dist: float, quad_segs: int) -> np.ndarray | None:
    """CCW boundary of segment ⊕ disc: two straight sides + semicircle
    caps sampled on the shared angle grid (~quad_segs per quarter)."""
    p0 = np.asarray(p0, dtype=float)[:2]
    p1 = np.asarray(p1, dtype=float)[:2]
    d = p1 - p0
    L = math.hypot(d[0], d[1])
    if L == 0.0:
        return None
    a = math.atan2(d[1], d[0])
    n = max(4 * quad_segs, 8)
    half = math.pi / 2
    pts = (_arc_points(p1, dist, a + half, a - half, n)
           + _arc_points(p0, dist, a - half, a - 3 * half, n))
    ring = np.asarray(pts[::-1], dtype=float)     # reverse: CCW
    return np.vstack([ring, ring[:1]])


def _boundary_capsules(g: Geom, dist: float, quad_segs: int) -> list:
    caps = []
    for arr in list(g.lines()) + list(g.rings()):
        r = np.asarray(arr, dtype=float)[:, :2]
        for i in range(len(r) - 1):
            c = _capsule_ring(r[i], r[i + 1], dist, quad_segs)
            if c is not None:
                caps.append([c])
    return caps


# ----------------------------------------------------------------------
# styled buffer (GEOS buffer style parameters, reference
# c/sedona-geos/src/st_buffer.rs 3-arg form)
# ----------------------------------------------------------------------

def _parse_buffer_style(params: str) -> dict:
    """GEOS parameter string: 'quad_segs=8 endcap=round join=mitre
    mitre_limit=5 side=both'.  Unknown keys raise (GEOS errors too)."""
    out = {"quad_segs": 8, "endcap": "round", "join": "round",
           "mitre_limit": 5.0, "side": "both"}
    for tok in str(params).split():
        if "=" not in tok:
            raise ValueError(f"invalid buffer style parameter: {tok!r}")
        k, v = tok.split("=", 1)
        k = k.strip().lower()
        v = v.strip().lower()
        if k == "quad_segs" or k == "quadsegs":
            out["quad_segs"] = max(int(float(v)), 1)
        elif k == "endcap":
            if v == "butt":
                v = "flat"
            if v not in ("round", "flat", "square"):
                raise ValueError(f"unknown endcap style: {v!r}")
            out["endcap"] = v
        elif k == "join":
            if v == "miter":
                v = "mitre"
            if v not in ("round", "mitre", "bevel"):
                raise ValueError(f"unknown join style: {v!r}")
            out["join"] = v
        elif k in ("mitre_limit", "miter_limit"):
            out["mitre_limit"] = float(v)
        elif k == "side":
            if v not in ("both", "left", "right"):
                raise ValueError(f"unknown side: {v!r}")
            out["side"] = v
        else:
            raise ValueError(f"unknown buffer style parameter: {k!r}")
    return out


def _fillet_arc(v, a0, total, direction, dist, quad_segs):
    """GEOS OffsetSegmentGenerator::addDirectedFillet vertex placement:
    arc of angular span `total` from angle a0, rotating `direction`
    (+1 CCW / -1 CW), nseg = round(total/quantum), EVEN spacing."""
    quantum = math.pi / 2.0 / quad_segs
    nseg = int(total / quantum + 0.5)
    if nseg < 1:
        nseg = 1
    inc = total / nseg
    pts = []
    for i in range(nseg + 1):
        a = a0 + direction * i * inc
        pts.append((v[0] + dist * math.cos(a), v[1] + dist * math.sin(a)))
    return pts


def _join_piece(v, t1, t2, dist, style) -> list | None:
    """Join fill at vertex v between unit tangents t1 (incoming) and t2
    (outgoing), on the OUTER side of the turn.  Returns a ring or None
    for collinear.

    The ring is anchored at a point pulled INTO the corridor (v minus
    half the offset distance along the inner bisector) instead of at v
    itself: the piece then overlaps the segment rectangles and its
    edges cross them transversally — exact edge-on-edge abutment at v
    is the Martinez sweep's degenerate case (observed: a cap chord
    collinear with a rectangle side collapsed the union)."""
    cross = t1[0] * t2[1] - t1[1] * t2[0]
    if abs(cross) < 1e-14 and t1[0] * t2[0] + t1[1] * t2[1] > 0:
        return None                      # straight through
    # outer normal: right of travel for a left turn, left for a right
    sgn = -1.0 if cross > 0 else 1.0     # +1 -> left normal side
    n1 = (-t1[1] * sgn, t1[0] * sgn)
    n2 = (-t2[1] * sgn, t2[0] * sgn)
    p1 = (v[0] + dist * n1[0], v[1] + dist * n1[1])
    p2 = (v[0] + dist * n2[0], v[1] + dist * n2[1])
    bx, by = n1[0] + n2[0], n1[1] + n2[1]
    bl = math.hypot(bx, by)
    anchor = (v[0] - 0.5 * dist * bx / bl,
              v[1] - 0.5 * dist * by / bl) if bl > 1e-9 else tuple(v[:2])
    if style["join"] == "round":
        a0 = math.atan2(n1[1], n1[0])
        a1 = math.atan2(n2[1], n2[0])
        # outer normals rotate WITH the tangent: CCW across the gap for
        # a left turn, CW for a right turn
        direction = 1.0 if cross > 0 else -1.0
        total = (a1 - a0) * direction
        while total < 0:
            total += 2 * math.pi
        while total >= 2 * math.pi:
            total -= 2 * math.pi
        arc = _fillet_arc(v, a0, total, direction, dist,
                          style["quad_segs"])
        ring = [anchor] + arc + [anchor]
        return np.asarray(ring, dtype=float)
    if style["join"] == "bevel":
        return np.asarray([anchor, p1, p2, anchor], dtype=float)
    # mitre
    dot = n1[0] * n2[0] + n1[1] * n2[1]
    denom = 1.0 + dot
    if denom <= 1e-12:   # ~180-degree spike: fall back to bevel
        return np.asarray([anchor, p1, p2, anchor], dtype=float)
    mx = v[0] + dist * (n1[0] + n2[0]) / denom
    my = v[1] + dist * (n1[1] + n2[1]) / denom
    ratio = math.hypot(mx - v[0], my - v[1]) / dist
    if ratio <= style["mitre_limit"]:
        return np.asarray([anchor, p1, (mx, my), p2, anchor], dtype=float)
    # truncated mitre: clip the spike by the line perpendicular to the
    # bisector at distance mitre_limit*dist from v (GEOS limited mitre)
    ml = math.hypot(mx - v[0], my - v[1])
    ux, uy = (mx - v[0]) / ml, (my - v[1]) / ml
    cut = style["mitre_limit"] * dist

    def clip_toward_m(p):
        # point on segment p->m where dot((x-v), u) == cut
        d0 = (p[0] - v[0]) * ux + (p[1] - v[1]) * uy
        if ml - d0 <= 1e-14:
            return p
        t = (cut - d0) / (ml - d0)
        t = min(max(t, 0.0), 1.0)
        return (p[0] + t * (mx - p[0]), p[1] + t * (my - p[1]))
    q1, q2 = clip_toward_m(p1), clip_toward_m(p2)
    return np.asarray([anchor, p1, q1, q2, p2, anchor], dtype=float)


def _seg_piece(a, b, dist, style, cap_a, cap_b) -> np.ndarray | None:
    """One segment's offset piece with its end caps FUSED into a single
    ring (GEOS builds one offset curve; separate cap pieces abut the
    rectangle exactly edge-on-edge, the Martinez sweep's degenerate
    case)."""
    t = (b[0] - a[0], b[1] - a[1])
    L = math.hypot(t[0], t[1])
    if L == 0.0:
        return None
    t = (t[0] / L, t[1] / L)
    nl = (-t[1] * dist, t[0] * dist)
    td = (t[0] * dist, t[1] * dist)
    qs = style["quad_segs"]
    cap = style["endcap"]
    ring = [(a[0] + nl[0], a[1] + nl[1])]
    if cap_b and cap == "round":
        ring += _fillet_arc(b, math.atan2(nl[1], nl[0]), math.pi, -1.0,
                            dist, qs)
    elif cap_b and cap == "square":
        ring += [(b[0] + nl[0], b[1] + nl[1]),
                 (b[0] + nl[0] + td[0], b[1] + nl[1] + td[1]),
                 (b[0] - nl[0] + td[0], b[1] - nl[1] + td[1]),
                 (b[0] - nl[0], b[1] - nl[1])]
    else:
        ring += [(b[0] + nl[0], b[1] + nl[1]), (b[0] - nl[0], b[1] - nl[1])]
    if cap_a and cap == "round":
        ring += _fillet_arc(a, math.atan2(-nl[1], -nl[0]), math.pi, -1.0,
                            dist, qs)
    elif cap_a and cap == "square":
        ring += [(a[0] - nl[0], a[1] - nl[1]),
                 (a[0] - nl[0] - td[0], a[1] - nl[1] - td[1]),
                 (a[0] + nl[0] - td[0], a[1] + nl[1] - td[1])]
    else:
        ring += [(a[0] - nl[0], a[1] - nl[1])]
    if ring[-1] != ring[0]:
        ring.append(ring[0])
    return np.asarray(ring, dtype=float)


def _ccw_ring(ring: np.ndarray) -> np.ndarray:
    """Martinez pieces must be CCW (same convention as _capsule_ring)."""
    ring = np.asarray(ring, dtype=float)
    return ring[::-1] if _ring_area2(ring) < 0 else ring


def _seg_rect(a, b, dist, side_sign) -> np.ndarray | None:
    """Offset rectangle of one segment: both sides (side_sign 0) or a
    single side (+1 left / -1 right of travel)."""
    t = (b[0] - a[0], b[1] - a[1])
    L = math.hypot(t[0], t[1])
    if L == 0.0:
        return None
    t = (t[0] / L, t[1] / L)
    nl = (-t[1] * dist, t[0] * dist)
    if side_sign == 0:
        ring = [(a[0] + nl[0], a[1] + nl[1]), (b[0] + nl[0], b[1] + nl[1]),
                (b[0] - nl[0], b[1] - nl[1]), (a[0] - nl[0], a[1] - nl[1])]
    else:
        s = float(side_sign)
        ring = [tuple(a[:2]), tuple(b[:2]),
                (b[0] + s * nl[0], b[1] + s * nl[1]),
                (a[0] + s * nl[0], a[1] + s * nl[1])]
    ring.append(ring[0])
    return np.asarray(ring, dtype=float)


def _styled_line_pieces(coords: np.ndarray, dist, style, closed: bool
                        ) -> list:
    """Offset pieces for one polyline/ring: per-segment rectangles,
    outer-turn joins, end caps (open lines, side=both only)."""
    r = np.asarray(coords, dtype=float)[:, :2]
    keep = [0]
    for i in range(1, len(r)):
        if math.hypot(*(r[i] - r[keep[-1]])) > 0:
            keep.append(i)
    r = r[keep]
    if len(r) < 2:
        return []
    side_sign = {"both": 0, "left": 1, "right": -1}[style["side"]]
    pieces = []
    for i in range(len(r) - 1):
        if side_sign == 0:
            rect = _seg_piece(r[i], r[i + 1], dist, style,
                              cap_a=(not closed and i == 0),
                              cap_b=(not closed and i == len(r) - 2))
        else:
            rect = _seg_rect(r[i], r[i + 1], dist, side_sign)
        if rect is not None:
            pieces.append([_ccw_ring(rect)])
    # joins at interior vertices (every vertex for closed rings)
    n = len(r)
    idxs = range(1, n - 1) if not closed else range(n - 1)
    for i in idxs:
        prev_i = i - 1 if i > 0 else n - 2
        a, v, b = r[prev_i], r[i], r[(i + 1) % n if closed else i + 1]
        t1 = v - a
        t2 = b - v
        L1, L2 = math.hypot(*t1), math.hypot(*t2)
        if L1 == 0 or L2 == 0:
            continue
        t1, t2 = t1 / L1, t2 / L2
        cross = t1[0] * t2[1] - t1[1] * t2[0]
        if side_sign != 0:
            # single-sided: joins only when the outer side is the
            # buffered side (left turn -> outer is right)
            outer = -1 if cross > 0 else 1
            if outer != side_sign:
                continue
        ring = _join_piece(v, t1, t2, dist, style)
        if ring is not None:
            pieces.append([_ccw_ring(ring)])
    return pieces


def buffer_styled(g: Geom, dist: float, params: str) -> Geom:
    """ST_Buffer with GEOS style parameters.  Same union-of-pieces
    construction as `buffer` but with style-aware joins/caps and GEOS
    fillet vertex placement (addDirectedFillet even spacing), so round
    areas agree with GEOS to discretization-identical values.

    side=left/right uses plain one-sided piece union; GEOS versions
    disagree with each other on the winding cancellation this implies
    for self-overlapping offsets (the reference's own test documents
    GEOS 3.9 vs 3.12 splits), so only the non-overlapping cases are
    byte-comparable."""
    style = _parse_buffer_style(params)
    if g.is_empty():
        return Geom(POLYGON, [])
    if dist == 0.0:
        return g if g.dimension() == 2 else Geom(POLYGON, [])
    qs = style["quad_segs"]
    if dist < 0.0:
        if g.dimension() < 2:
            return Geom(POLYGON, [])
        # erosion: carve the inner-side bands (+ joins at reflex turns)
        pieces = []
        for arr in g.rings():
            pieces += _styled_line_pieces(arr, -dist, style, closed=True)
        if not pieces:
            return Geom(POLYGON, [])
        carve = unary_union(Geom(MULTIPOLYGON, pieces))
        out = difference(g, carve)
        return out if not out.is_empty() else Geom(POLYGON, [])
    pieces = []
    for p in g.points():
        if style["endcap"] == "flat":
            continue
        if style["endcap"] == "square":
            pieces.append([_ccw_ring(np.asarray(
                [(p[0] - dist, p[1] - dist), (p[0] + dist, p[1] - dist),
                 (p[0] + dist, p[1] + dist), (p[0] - dist, p[1] + dist),
                 (p[0] - dist, p[1] - dist)], dtype=float))])
        else:
            pieces.append([_disc_ring(p, dist, 4 * qs)])
    for arr in g.lines():
        pieces += _styled_line_pieces(arr, dist, style, closed=False)
    for pr in g.polygons():
        for ring in pr:
            pieces += _styled_line_pieces(ring, dist, style, closed=True)
    pieces += [[np.asarray(r, dtype=float)[:, :2] for r in pr]
               for pr in g.polygons()]
    if not pieces:
        return Geom(POLYGON, [])
    return unary_union(Geom(MULTIPOLYGON, pieces))


def buffer(g: Geom, dist: float, quad_segs: int = 8) -> Geom:
    """GEOS-style round-join buffer.  Point: exact regular 4*quad_segs-gon
    (GEOS vertex placement).  Lines/polygons: union of per-segment
    capsules (+ the polygon itself); negative distance erodes by
    subtracting the boundary capsules — both exact boolean ops over the
    discretized disc (geom/clip.py)."""
    if g.is_empty():
        return Geom(POLYGON, [])
    if dist == 0.0:
        return g if g.dimension() == 2 else Geom(POLYGON, [])
    n = max(4 * quad_segs, 8)
    if dist < 0.0:
        if g.dimension() < 2:
            return Geom(POLYGON, [])
        caps = _boundary_capsules(g, -dist, quad_segs)
        if not caps:
            return Geom(POLYGON, [])
        carve = unary_union(Geom(MULTIPOLYGON, caps))
        out = difference(g, carve)
        return out if not out.is_empty() else Geom(POLYGON, [])
    pts = list(g.points())
    if g.dimension() == 0 and len(pts) == 1:
        return Geom(POLYGON, [_disc_ring(pts[0], dist, n)])
    parts = [[_disc_ring(p, dist, n)] for p in pts]
    parts += _boundary_capsules(g, dist, quad_segs)
    parts += [[np.asarray(r, dtype=float)[:, :2] for r in pr]
              for pr in g.polygons()]
    if not parts:
        return Geom(POLYGON, [])
    return unary_union(Geom(MULTIPOLYGON, parts))


# ======================================================================
# overlay subset: clipping
# ======================================================================

def _is_convex_ring(ring: np.ndarray) -> bool:
    n = len(ring) - 1
    if n < 3:
        return False
    sign = 0
    for i in range(n):
        o = _orient(ring[i], ring[(i + 1) % n], ring[(i + 2) % n])
        if o != 0:
            if sign == 0:
                sign = o
            elif o != sign:
                return False
    return True


def _clip_ring_convex(subject: np.ndarray, clip_ring: np.ndarray) -> np.ndarray | None:
    """Sutherland-Hodgman: clip subject ring by a CONVEX clip ring."""
    if _ring_area2(clip_ring) < 0:
        clip_ring = clip_ring[::-1]
    output = [tuple(p[:2]) for p in subject[:-1]]
    n = len(clip_ring) - 1
    for i in range(n):
        a, b = clip_ring[i], clip_ring[i + 1]
        input_pts = output
        output = []
        if not input_pts:
            return None
        m = len(input_pts)
        for j in range(m):
            cur, prev = input_pts[j], input_pts[j - 1]
            cur_in = _orient(a, b, cur) >= 0
            prev_in = _orient(a, b, prev) >= 0
            if cur_in:
                if not prev_in:
                    output.append(_line_x(prev, cur, a, b))
                output.append(tuple(cur))
            elif prev_in:
                output.append(_line_x(prev, cur, a, b))
    if len(output) < 3:
        return None
    ring = np.array(output + [output[0]], dtype=np.float64)
    if abs(_ring_area2(ring)) < _EPS:
        return None
    return ring


def _line_x(p, q, a, b):
    x1, y1, x2, y2 = p[0], p[1], q[0], q[1]
    x3, y3, x4, y4 = a[0], a[1], b[0], b[1]
    den = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
    if abs(den) < _EPS:
        return tuple(q[:2])
    t = ((x1 - x3) * (y3 - y4) - (y1 - y3) * (x3 - x4)) / den
    return (x1 + t * (x2 - x1), y1 + t * (y2 - y1))


def _clip_line_area(line: Geom, poly: Geom, keep_inside: bool) -> list:
    """Exact line/area clip: split every line segment at its crossings
    with the polygon boundary (parametric intersection with each boundary
    segment), then keep sub-segments whose midpoint is inside (or
    outside) the area.  Adjacent kept sub-segments are stitched back into
    maximal paths.  Replaces the former densify-and-sample approximation."""
    bsegs = list(_segments(poly))
    pieces: list = []
    for arr in line.lines():
        r = np.asarray(arr, dtype=float)[:, :2]
        path: list = []
        for i in range(len(r) - 1):
            a, b = r[i], r[i + 1]
            dx, dy = b[0] - a[0], b[1] - a[1]
            if dx == 0.0 and dy == 0.0:
                continue
            ts = [0.0, 1.0]
            for c, d in bsegs:
                den = dx * (d[1] - c[1]) - dy * (d[0] - c[0])
                if den == 0.0:
                    continue
                u = ((c[0] - a[0]) * (d[1] - c[1])
                     - (c[1] - a[1]) * (d[0] - c[0])) / den
                v = ((c[0] - a[0]) * dy - (c[1] - a[1]) * dx) / den
                if 0.0 <= u <= 1.0 and 0.0 <= v <= 1.0:
                    ts.append(u)
            ts = sorted(set(ts))
            for k in range(len(ts) - 1):
                t0, t1 = ts[k], ts[k + 1]
                if t1 - t0 <= 1e-15:
                    continue
                tm = 0.5 * (t0 + t1)
                mid = (a[0] + tm * dx, a[1] + tm * dy)
                inside = point_position(mid, poly) >= 0
                if inside == keep_inside:
                    p0 = (a[0] + t0 * dx, a[1] + t0 * dy)
                    p1 = (a[0] + t1 * dx, a[1] + t1 * dy)
                    if path and path[-1] == p0:
                        path.append(p1)
                    else:
                        if len(path) >= 2:
                            pieces.append(np.asarray(path))
                        path = [p0, p1]
                else:
                    if len(path) >= 2:
                        pieces.append(np.asarray(path))
                    path = []
        if len(path) >= 2:
            pieces.append(np.asarray(path))
    return pieces


def _overlay_orient(g: Geom) -> Geom:
    """GEOS overlay output orientation for an unchanged areal result:
    CW shells / CCW holes via BODY reversal (the ring restarts at the
    input's last body vertex — matches the overlay writer)."""
    def fix(rings):
        out = []
        for i, r in enumerate(rings):
            r = np.asarray(r, dtype=np.float64)
            ccw = _ring_area2(r) > 0
            want_ccw = i > 0
            if ccw != want_ccw and len(r) > 1:
                b = r[:-1][::-1]
                r = np.vstack([b, b[:1]])
            out.append(r)
        return out
    if g.gt == POLYGON:
        return Geom(POLYGON, fix(g.data), g.has_z, g.has_m)
    if g.gt == MULTIPOLYGON:
        return Geom(MULTIPOLYGON, [fix(p) for p in g.data],
                    g.has_z, g.has_m)
    return g


def _empty_of_dim(d: int) -> Geom:
    """GEOS overlay empty-result convention: POINT/LINESTRING/POLYGON
    EMPTY by dimension (python/sedonadb test_overlay pins the types)."""
    if d <= 0:
        return Geom(POINT, None)
    if d == 1:
        return Geom(LINESTRING, np.empty((0, 2)))
    return Geom(POLYGON, [])


def _collinear_overlap_t(a, b, c, d):
    """Overlap interval of segment (c,d) on segment (a,b) as (t0, t1)
    along (a,b), or None when not collinear / no overlap."""
    if abs(_orient(a, b, c)) > _EPS or abs(_orient(a, b, d)) > _EPS:
        return None
    ab = (b[0] - a[0], b[1] - a[1])
    L2 = ab[0] * ab[0] + ab[1] * ab[1]
    if L2 <= 0:
        return None
    t0 = ((c[0] - a[0]) * ab[0] + (c[1] - a[1]) * ab[1]) / L2
    t1 = ((d[0] - a[0]) * ab[0] + (d[1] - a[1]) * ab[1]) / L2
    lo, hi = min(t0, t1), max(t0, t1)
    lo, hi = max(lo, 0.0), min(hi, 1.0)
    if hi < lo:
        return None
    return (lo, hi)


def _seg_cross_point(a, b, c, d):
    """Isolated intersection point of segments, or None."""
    r = (b[0] - a[0], b[1] - a[1])
    s = (d[0] - c[0], d[1] - c[1])
    den = r[0] * s[1] - r[1] * s[0]
    if abs(den) < 1e-15:
        return None
    t = ((c[0] - a[0]) * s[1] - (c[1] - a[1]) * s[0]) / den
    u = ((c[0] - a[0]) * r[1] - (c[1] - a[1]) * r[0]) / den
    if -1e-12 <= t <= 1 + 1e-12 and -1e-12 <= u <= 1 + 1e-12:
        return (a[0] + t * r[0], a[1] + t * r[1])
    return None


def _line_segs(g: Geom):
    segs = []
    for arr in list(g.lines()) + list(g.rings()):
        a = np.asarray(arr, dtype=np.float64)[:, :2]
        for i in range(len(a) - 1):
            if np.hypot(*(a[i + 1] - a[i])) > 0:
                segs.append((a[i], a[i + 1]))
    return segs


def _line_line_intersection(g1: Geom, g2: Geom) -> Geom:
    """Exact lineal x lineal intersection: collinear overlap segments +
    isolated contact points not covered by a segment (GEOS semantics,
    python/sedonadb test_overlay: touching lines -> POINT)."""
    segs1, segs2 = _line_segs(g1), _line_segs(g2)
    out_segs, out_pts = [], []
    for a, b in segs1:
        for c, d in segs2:
            ov = _collinear_overlap_t(a, b, c, d)
            if ov is not None:
                t0, t1 = ov
                p = a + t0 * (b - a)
                q = a + t1 * (b - a)
                if np.hypot(*(q - p)) > _EPS:
                    out_segs.append(np.vstack([p, q]))
                else:
                    out_pts.append(p)
                continue
            x = _seg_cross_point(a, b, c, d)
            if x is not None:
                out_pts.append(np.asarray(x))
    seg_geom = None
    if out_segs:
        from sedona_db_spark.geom import algorithms2 as _a2
        seg_geom = _a2.line_merge(Geom(MULTILINESTRING, out_segs))
    pts = []
    seen = set()
    for p in out_pts:
        if seg_geom is not None and intersects(Geom(POINT, p), seg_geom):
            continue
        k = (round(float(p[0]) / _EPS), round(float(p[1]) / _EPS))
        if k not in seen:
            seen.add(k)
            pts.append(p)
    if seg_geom is not None and not pts:
        return seg_geom
    if pts and seg_geom is None:
        if len(pts) == 1:
            return Geom(POINT, pts[0])
        return Geom(MULTIPOINT, pts)
    if pts and seg_geom is not None:
        return Geom(GEOMETRYCOLLECTION,
                    ([Geom(MULTIPOINT, pts)] if len(pts) > 1
                     else [Geom(POINT, pts[0])]) + seg_geom.geometries())
    return _empty_of_dim(1)


def _line_line_difference(g1: Geom, g2: Geom) -> Geom:
    """Lineal minus lineal: remove collinear overlap intervals (isolated
    crossings remove nothing), then merge the remainder."""
    segs2 = _line_segs(g2)
    pieces = []
    for a, b in _line_segs(g1):
        ivs = []
        for c, d in segs2:
            ov = _collinear_overlap_t(a, b, c, d)
            if ov is not None and ov[1] - ov[0] > 1e-15:
                ivs.append(ov)
        ivs.sort()
        cur = 0.0
        keep = []
        for lo, hi in ivs:
            if lo > cur + 1e-12:
                keep.append((cur, lo))
            cur = max(cur, hi)
        if cur < 1.0 - 1e-12:
            keep.append((cur, 1.0))
        for lo, hi in keep:
            p = a + lo * (b - a)
            q = a + hi * (b - a)
            pieces.append(np.vstack([p, q]))
    if not pieces:
        return _empty_of_dim(1)
    from sedona_db_spark.geom import algorithms2 as _a2
    return _a2.line_merge(Geom(MULTILINESTRING, pieces))


def _line_line_union(g1: Geom, g2: Geom) -> Geom:
    """Lineal union: the combined linework noded at every mutual
    intersection, duplicates dropped (GEOS union output is the noded
    edge set, NOT merged — python/sedonadb test_overlay pins
    MULTILINESTRING ((0 0, 0.5 0.5), (0.5 0.5, 1 1)))."""
    from sedona_db_spark.geom import algorithms2 as _a2
    arrs = [np.asarray(l, dtype=np.float64)[:, :2]
            for g in (g1, g2) for l in list(g.lines()) + list(g.rings())]
    verts, edges = _a2._node_ring_segments(arrs)
    if not edges:
        return _empty_of_dim(1)
    if len(edges) == 1:
        a, b = edges[0]
        return Geom(LINESTRING, np.vstack([verts[a], verts[b]]))
    return Geom(MULTILINESTRING,
                [np.vstack([verts[a], verts[b]]) for a, b in edges])


def intersection(g1: Geom, g2: Geom) -> Geom:
    """Overlay subset: exact when one side is convex polygon / point / line."""
    if g1.gt == GEOMETRYCOLLECTION or g2.gt == GEOMETRYCOLLECTION:
        gc, other = (g1, g2) if g1.gt == GEOMETRYCOLLECTION else (g2, g1)
        parts = [intersection(m, other) for m in gc.data]
        parts = [p for p in parts if not p.is_empty()]
        if not parts:
            return _empty_of_dim(0)
        if len(parts) == 1:
            return parts[0]
        return Geom(GEOMETRYCOLLECTION, parts)
    if g1.is_empty() or g2.is_empty() or not intersects(g1, g2):
        return _empty_of_dim(min(g1.dimension(), g2.dimension()))
    # points
    if g1.dimension() == 0:
        pts = [p for p in g1.points() if point_position(p, g2) >= 0]
        if not pts:
            return _empty_of_dim(0)
        if len(pts) == 1:
            return Geom(POINT, pts[0])
        return Geom(MULTIPOINT, pts)
    if g2.dimension() == 0:
        return intersection(g2, g1)
    if g1.dimension() == 1 and g2.dimension() == 1:
        return _line_line_intersection(g1, g2)
    if g1.dimension() == 2 and g2.dimension() == 2:
        p1s = list(g1.polygons())
        p2s = list(g2.polygons())
        # fast path: single hole-free convex pair -> Sutherland-Hodgman
        # (result of convex∩convex is one convex piece, so SH is exact;
        # anything concave or holed goes through the Martinez sweep)
        if (len(p1s) == 1 and len(p2s) == 1
                and len(p1s[0]) == 1 and len(p2s[0]) == 1
                and _is_convex_ring(p1s[0][0]) and _is_convex_ring(p2s[0][0])):
            c = _clip_ring_convex(p1s[0][0], p2s[0][0])
            if c is None:
                return Geom(GEOMETRYCOLLECTION, [])
            return Geom(POLYGON, [c])
        from sedona_db_spark.geom import clip as _mclip
        return _mclip.polygon_boolean(g1, g2, "intersection")
    # line vs polygon: exact clip (split at boundary crossings)
    line = g1 if g1.dimension() == 1 else g2
    poly = g2 if g1.dimension() == 1 else g1
    pieces = _clip_line_area(line, poly, keep_inside=True)
    if not pieces:
        return Geom(GEOMETRYCOLLECTION, [])
    if len(pieces) == 1:
        return Geom(LINESTRING, pieces[0])
    return Geom(MULTILINESTRING, pieces)


# ======================================================================
# nearest points / further overlay subsets
# ======================================================================

def nearest_points(g1: Geom, g2: Geom):
    """(p1, p2) witness points of the minimum distance (PostGIS
    ST_ClosestPoint / ST_ShortestLine support)."""
    if g1.is_empty() or g2.is_empty():
        return None
    # intersecting: find a shared point
    if intersects(g1, g2):
        for p in g1.points():
            if point_position(p, g2) >= 0:
                return (p[:2], p[:2])
        for p in g2.points():
            if point_position(p, g1) >= 0:
                return (p[:2], p[:2])
        for a, b in _segments(g1):
            for c, d in _segments(g2):
                if _seg_intersects(a, b, c, d):
                    x = _line_x(a, b, c, d)
                    return (np.asarray(x), np.asarray(x))
        c1 = _first_vertex(g1)
        if c1 is not None and point_position(c1, g2) >= 0:
            return (c1[:2], c1[:2])
        c2 = _first_vertex(g2)
        if c2 is not None and point_position(c2, g1) >= 0:
            return (c2[:2], c2[:2])
    best = (math.inf, None, None)

    def upd(d, p, q):
        nonlocal best
        if d < best[0]:
            best = (d, p, q)

    a1, b1 = _collect_segments(g1)
    a2, b2 = _collect_segments(g2)
    v1 = g1.all_coords()[:, :2]
    v2 = g2.all_coords()[:, :2]
    for p in v1:
        if a2 is not None:
            d = b2 - a2
            len2 = np.einsum("ij,ij->i", d, d)
            t = np.clip(np.divide(np.einsum("ij,ij->i", p - a2, d),
                                  np.where(len2 == 0, 1, len2)), 0, 1)
            proj = a2 + t[:, None] * d
            dist = np.hypot(*(p - proj).T)
            i = int(np.argmin(dist))
            upd(float(dist[i]), p, proj[i])
        else:
            dist = np.hypot(*(v2 - p).T)
            i = int(np.argmin(dist))
            upd(float(dist[i]), p, v2[i])
    for q in v2:
        if a1 is not None:
            d = b1 - a1
            len2 = np.einsum("ij,ij->i", d, d)
            t = np.clip(np.divide(np.einsum("ij,ij->i", q - a1, d),
                                  np.where(len2 == 0, 1, len2)), 0, 1)
            proj = a1 + t[:, None] * d
            dist = np.hypot(*(q - proj).T)
            i = int(np.argmin(dist))
            upd(float(dist[i]), proj[i], q)
        else:
            dist = np.hypot(*(v1 - q).T)
            i = int(np.argmin(dist))
            upd(float(dist[i]), v1[i], q)
    if best[1] is None:
        return None
    return (np.asarray(best[1]), np.asarray(best[2]))


def _is_rectilinear(g: Geom) -> bool:
    """True if g is a polygon/multipolygon whose edges are all axis-parallel."""
    if g.gt not in (POLYGON, MULTIPOLYGON):
        return False
    found = False
    for poly in g.polygons():
        for r in poly:
            found = True
            d = np.diff(np.asarray(r)[:, :2], axis=0)
            if not np.all((np.abs(d[:, 0]) < 1e-12) | (np.abs(d[:, 1]) < 1e-12)):
                return False
    return found


def _rectilinear_boolean(g1: Geom, g2: Geom, op: str) -> Geom:
    """Exact boolean overlay for axis-parallel polygons ('union', 'diff',
    'xor').  Cut the plane along every input edge line, classify each grid
    cell by its center (never on an edge, so classification is exact),
    keep cells per op, then reassemble the kept region's boundary (edges
    adjacent to exactly one kept cell) with build_area — holes fall out of
    the ring-containment pass.  O(V^2) cells in the input vertex count:
    fine for scalar kernels; large dissolves go through union_agg's
    grouped path instead.  Invariant-checked: if ring assembly ever
    disagrees with the summed cell area (degree-4 corner contact), fall
    back to the exact-area cell tessellation."""
    from sedona_db_spark.geom import algorithms2 as alg2

    if op == "xor":  # two disjoint-interior differences; parts stay parts
        d1 = _rectilinear_boolean(g1, g2, "diff")
        d2 = _rectilinear_boolean(g2, g1, "diff")
        parts = [p for g in (d1, d2) for p in g.polygons()]
        if not parts:
            return Geom(GEOMETRYCOLLECTION, [])
        if len(parts) == 1:
            return Geom(POLYGON, parts[0])
        return Geom(MULTIPOLYGON, parts)

    coords = [np.asarray(r)[:, :2] for g in (g1, g2) for poly in g.polygons()
              for r in poly]
    allc = np.vstack(coords)
    xs = np.unique(allc[:, 0])
    ys = np.unique(allc[:, 1])
    nx, ny = len(xs) - 1, len(ys) - 1
    if nx * ny > 250_000:  # pathological vertex counts: refuse, don't OOM
        raise NotImplementedError(
            f"rectilinear overlay grid too fine ({nx}x{ny} cells); "
            "dissolve through union_agg's grouped path instead")
    keep = np.zeros((nx, ny), dtype=bool)
    for i in range(nx):
        cx = (xs[i] + xs[i + 1]) / 2.0
        for j in range(ny):
            cy = (ys[j] + ys[j + 1]) / 2.0
            a = point_position((cx, cy), g1) > 0
            b = point_position((cx, cy), g2) > 0
            keep[i, j] = (a or b) if op == "union" else (a and not b)
    if not keep.any():
        return Geom(GEOMETRYCOLLECTION, [])

    segs = []
    for i in range(nx):
        for j in range(ny):
            if not keep[i, j]:
                continue
            if j == 0 or not keep[i, j - 1]:   # bottom
                segs.append([(xs[i], ys[j]), (xs[i + 1], ys[j])])
            if j == ny - 1 or not keep[i, j + 1]:  # top
                segs.append([(xs[i], ys[j + 1]), (xs[i + 1], ys[j + 1])])
            if i == 0 or not keep[i - 1, j]:   # left
                segs.append([(xs[i], ys[j]), (xs[i], ys[j + 1])])
            if i == nx - 1 or not keep[i + 1, j]:  # right
                segs.append([(xs[i + 1], ys[j]), (xs[i + 1], ys[j + 1])])
    lines = Geom(MULTILINESTRING, [np.array(s, dtype=np.float64) for s in segs])
    out = alg2.build_area(lines)
    want = sum((xs[i + 1] - xs[i]) * (ys[j + 1] - ys[j])
               for i in range(nx) for j in range(ny) if keep[i, j])
    if abs(area(out) - want) > 1e-9 * max(want, 1.0):
        cells = [np.array([(xs[i], ys[j]), (xs[i + 1], ys[j]),
                           (xs[i + 1], ys[j + 1]), (xs[i], ys[j + 1]),
                           (xs[i], ys[j])], dtype=np.float64)
                 for i in range(nx) for j in range(ny) if keep[i, j]]
        return Geom(MULTIPOLYGON, [[c] for c in cells])
    return out


def union2(g1: Geom, g2: Geom) -> Geom:
    """Binary ST_Union: points dedup; disjoint -> multi/collection;
    containment short-circuits; overlapping area/area via the exact
    Martinez sweep (geom/clip.py)."""
    if g1.is_empty():
        return g2
    if g2.is_empty():
        return g1
    if g1.dimension() == 0 and g2.dimension() == 0:
        pts = {tuple(p[:2]) for p in g1.points()} | {tuple(p[:2]) for p in g2.points()}
        spts = sorted(pts)
        if len(spts) == 1:
            return Geom(POINT, np.asarray(spts[0]))
        return Geom(MULTIPOINT, [np.asarray(p) for p in spts])
    if g1.dimension() == 1 and g2.dimension() == 1 \
            and not list(g1.points()) and not list(g2.points()) \
            and intersects(g1, g2):
        # GEOS unions linework by NODING at mutual intersections even
        # when one line covers the other (python/sedonadb test_overlay
        # pins MULTILINESTRING ((0 0, 0.5 0.5), (0.5 0.5, 1 1)))
        return _line_line_union(g1, g2)
    if contains(g1, g2) or covers(g1, g2):
        return g1
    if contains(g2, g1) or covers(g2, g1):
        return g2
    if not intersects(g1, g2):
        parts = g1.geometries() + g2.geometries()
        gts = {p.gt for p in parts}
        if gts == {POLYGON}:
            return Geom(MULTIPOLYGON, [p.data for p in parts])
        if gts == {LINESTRING}:
            return Geom(MULTILINESTRING, [p.data for p in parts])
        return Geom(GEOMETRYCOLLECTION, parts)
    if g1.dimension() == 2 and g2.dimension() == 2:
        from sedona_db_spark.geom import clip as _mclip
        return _mclip.polygon_boolean(g1, g2, "union")
    if g1.dimension() == 2 or g2.dimension() == 2:
        # line/point ∪ area: the area absorbs the covered part
        poly, other = (g1, g2) if g1.dimension() == 2 else (g2, g1)
        rest = difference(other, poly)
        if rest.is_empty():
            return poly
        return Geom(GEOMETRYCOLLECTION, poly.geometries() + rest.geometries())
    if g1.dimension() == 1 and g2.dimension() == 1:
        return _line_line_union(g1, g2)
    raise NotImplementedError(
        "union of overlapping mixed lower-dimension geometries not supported")


def difference(g1: Geom, g2: Geom) -> Geom:
    """Binary ST_Difference — supported: disjoint (identity), g2 covers g1
    (typed empty), point/line minus area (exact clip), lineal minus
    lineal (collinear interval subtraction), collections member-wise."""
    if g1.gt == GEOMETRYCOLLECTION:
        parts = [difference(m, g2) for m in g1.data]
        parts = [p for p in parts if not p.is_empty()]
        if not parts:
            return _empty_of_dim(0)
        if len(parts) == 1:
            return parts[0]
        return Geom(GEOMETRYCOLLECTION, parts)
    if g1.is_empty() or g2.is_empty() or not intersects(g1, g2):
        if g1.dimension() == 2 and g2.dimension() == 2 \
                and not g1.is_empty() and not g2.is_empty():
            # GEOS difference rebuilds through overlay even for disjoint
            # inputs: CW shells, body-reversed (test_overlay pins
            # POLYGON ((0 1, 1 1, 1 0, 0 0, 0 1)))
            return _overlay_orient(g1)
        return g1
    if covers(g2, g1):
        return _empty_of_dim(g1.dimension())
    if g1.dimension() == 0:
        pts = [p for p in g1.points() if point_position(p, g2) < 0]
        if not pts:
            return _empty_of_dim(0)
        if len(pts) == 1:
            return Geom(POINT, pts[0])
        return Geom(MULTIPOINT, pts)
    if g1.dimension() == 1 and g2.dimension() == 1:
        return _line_line_difference(g1, g2)
    if g1.dimension() == 1 and g2.dimension() == 2:
        pieces = _clip_line_area(g1, g2, keep_inside=False)
        if not pieces:
            return _empty_of_dim(1)
        if len(pieces) == 1:
            return Geom(LINESTRING, pieces[0])
        return Geom(MULTILINESTRING, pieces)
    if g1.dimension() == 2 and g2.dimension() == 2:
        from sedona_db_spark.geom import clip as _mclip
        return _mclip.polygon_boolean(g1, g2, "difference")
    if g2.dimension() < 2:
        return g1   # subtracting a lower-dimension geometry leaves g1
    raise NotImplementedError(
        "difference not supported for this dimension combination")


def unary_union(g: Geom) -> Geom:
    """ST_UnaryUnion: dissolve self-overlaps among a geometry's area
    parts (tree-folded pairwise Martinez unions — exact).  Non-area
    parts pass through unchanged alongside the dissolved area."""
    if g.is_empty():
        return Geom(GEOMETRYCOLLECTION, [])
    polys = [Geom(POLYGON, p, g.has_z, g.has_m) for p in g.polygons()]
    if not polys:
        return g
    if len(polys) == 1:
        if g.gt == MULTIPOLYGON:
            # GEOS dissolves a single-part multipolygon to POLYGON with
            # overlay orientation: CCW rings body-reverse (the output
            # starts at the input's LAST body vertex — python/sedonadb
            # test_st_unaryunion_zm pins POLYGON Z((0 4 10,...)));
            # dimensions carry through untouched
            rings = []
            for i, r in enumerate(polys[0].data):
                r = np.asarray(r, dtype=np.float64)
                ccw = _ring_area2(r) > 0
                want_ccw = i > 0
                if ccw != want_ccw and len(r) > 1:
                    b = r[:-1][::-1]
                    r = np.vstack([b, b[:1]])
                rings.append(r)
            return Geom(POLYGON, rings, g.has_z, g.has_m)
        return g
    from sedona_db_spark.geom import clip as _mclip
    items = polys
    while len(items) > 1:
        nxt = [_mclip.polygon_boolean(items[i], items[i + 1], "union")
               for i in range(0, len(items) - 1, 2)]
        if len(items) % 2:
            nxt.append(items[-1])
        items = nxt
    dissolved = items[0]
    others = [s for s in g.geometries() if s.dimension() < 2]
    if not others:
        return dissolved
    return Geom(GEOMETRYCOLLECTION, dissolved.geometries() + others)


def sym_difference(g1: Geom, g2: Geom) -> Geom:
    if not intersects(g1, g2):
        return union2(g1, g2)
    if g1.dimension() == 2 and g2.dimension() == 2:
        from sedona_db_spark.geom import clip as _mclip
        return _mclip.polygon_boolean(g1, g2, "xor")
    d1 = difference(g1, g2)
    d2 = difference(g2, g1)
    if d1.is_empty():
        return d2
    if d2.is_empty():
        return d1
    return union2(d1, d2)


def normalize(g: Geom) -> Geom:
    """GEOS canonical form (the reference's ST_Normalize is GEOS-backed,
    c/sedona-geos/src/st_normalize.rs): exterior rings CLOCKWISE,
    interior rings counter-clockwise, rings start at the lexicographic
    minimum vertex, linestrings directed so the sequence is <= its
    reverse, and multi-part components sorted in DESCENDING order —
    e.g. MULTILINESTRING ((2 2, 1 1), (4 4, 3 3)) normalizes to
    ((3 3, 4 4), (1 1, 2 2)), matching the reference's own test."""
    def norm_ring(ring, want_ccw):
        r = ring[:-1]
        ccw = _ring_area2(ring) > 0
        if ccw != want_ccw:
            r = r[::-1]
        i = int(np.lexsort((r[:, 1], r[:, 0]))[0])
        r = np.vstack([r[i:], r[:i]])
        return np.vstack([r, r[:1]])

    def norm_line(l):
        a = np.asarray(l, dtype=np.float64)
        fwd = [tuple(p) for p in a]
        if fwd[::-1] < fwd:
            a = a[::-1]
        return a

    def _key(geom: Geom):
        # GEOS Geometry::compareTo sort index (normalize sorts members
        # DESCENDING: polygon before linestring before point — pinned
        # by python/sedonadb test_st_normalize's mixed collection)
        rank = {POINT: 0, MULTIPOINT: 1, LINESTRING: 2,
                MULTILINESTRING: 4, POLYGON: 5, MULTIPOLYGON: 6,
                GEOMETRYCOLLECTION: 7}.get(geom.gt, 8)
        return (rank, [tuple(c[:2]) for c in geom.all_coords()])

    if g.gt == LINESTRING:
        return Geom(LINESTRING, norm_line(g.data), g.has_z, g.has_m) \
            if len(g.data) else g
    if g.gt == MULTIPOINT:
        pts = sorted([np.asarray(p) for p in g.data],
                     key=lambda p: tuple(p), reverse=True)
        return Geom(MULTIPOINT, pts, g.has_z, g.has_m)
    if g.gt == MULTILINESTRING:
        lines = sorted([norm_line(l) for l in g.data],
                       key=lambda l: [tuple(p) for p in l], reverse=True)
        return Geom(MULTILINESTRING, lines, g.has_z, g.has_m)
    if g.gt == POLYGON:
        if not g.data:
            return g
        rings = [norm_ring(g.data[0], False)] + \
            [norm_ring(h, True) for h in g.data[1:]]
        return Geom(POLYGON, rings, g.has_z, g.has_m)
    if g.gt == MULTIPOLYGON:
        polys = sorted(
            [normalize(Geom(POLYGON, p, g.has_z, g.has_m)).data
             for p in g.data],
            key=lambda rs: [tuple(p) for p in rs[0]], reverse=True)
        return Geom(MULTIPOLYGON, polys, g.has_z, g.has_m)
    if g.gt == GEOMETRYCOLLECTION:
        subs = sorted([normalize(s) for s in g.data], key=_key,
                      reverse=True)
        return Geom(GEOMETRYCOLLECTION, subs, g.has_z, g.has_m)
    return g


def snap(g1: Geom, g2: Geom, tol: float) -> Geom:
    """GEOS GeometrySnapper semantics (python/sedonadb test_st_snap):
    phase 1 — each SNAP POINT pulls its nearest source vertex within
    tolerance onto itself (per-snap-point nearest, NOT per-vertex: a
    chain of vertices near one snap point moves only its closest one);
    phase 2 — snap points not already present are inserted into the
    nearest source segment within tolerance."""
    if g1.is_empty():
        return g1
    snap_pts = g2.all_coords()[:, :2]
    if len(snap_pts) == 0 or tol <= 0:
        return g1
    # dedupe preserving order
    seen = set()
    sp = []
    for s in snap_pts:
        k = (round(float(s[0]) * 1e12), round(float(s[1]) * 1e12))
        if k not in seen:
            seen.add(k)
            sp.append(s)

    def snap_seq(arr, closed, segments):
        a = [row.copy() for row in np.asarray(arr, dtype=np.float64)]
        n = len(a)
        taken = set()
        for s in sp:
            lim = n - 1 if closed and n > 1 else n
            best, bd = None, tol
            for i in range(lim):
                d = math.hypot(a[i][0] - s[0], a[i][1] - s[1])
                if 0 < d <= bd and i not in taken:
                    best, bd = i, d
            if best is not None:
                a[best][0], a[best][1] = s[0], s[1]
                taken.add(best)
                if closed and best == 0 and n > 1:
                    a[-1][0], a[-1][1] = s[0], s[1]
        if segments:
            for s in sp:
                if any(math.hypot(p[0] - s[0], p[1] - s[1]) < 1e-12
                       for p in a):
                    continue
                best, bd, bt = None, tol, 0.0
                for i in range(len(a) - 1):
                    p, q = a[i], a[i + 1]
                    dx, dy = q[0] - p[0], q[1] - p[1]
                    L2 = dx * dx + dy * dy
                    if L2 <= 0:
                        continue
                    t = ((s[0] - p[0]) * dx + (s[1] - p[1]) * dy) / L2
                    t = min(max(t, 0.0), 1.0)
                    d = math.hypot(p[0] + t * dx - s[0],
                                   p[1] + t * dy - s[1])
                    if d <= bd:
                        best, bd, bt = i, d, t
                if best is not None:
                    row = a[best].copy()
                    row[0], row[1] = s[0], s[1]
                    a.insert(best + 1, row)
        return np.asarray(a, dtype=np.float64)

    def walk(g: Geom) -> Geom:
        if g.gt == POINT:
            if g.data is None:
                return g
            out = snap_seq(g.data.reshape(1, -1), False, False)[0]
            return Geom(POINT, out, g.has_z, g.has_m)
        if g.gt == MULTIPOINT:
            pts = [p for p in g.data if p is not None]
            if not pts:
                return g
            out = snap_seq(np.asarray(pts, dtype=np.float64), False, False)
            return Geom(MULTIPOINT, list(out), g.has_z, g.has_m)
        if g.gt == LINESTRING:
            return Geom(LINESTRING, snap_seq(g.data, False, True),
                        g.has_z, g.has_m)
        if g.gt == MULTILINESTRING:
            return Geom(MULTILINESTRING,
                        [snap_seq(l, False, True) for l in g.data],
                        g.has_z, g.has_m)
        if g.gt == POLYGON:
            return Geom(POLYGON, [snap_seq(r, True, True) for r in g.data],
                        g.has_z, g.has_m)
        if g.gt == MULTIPOLYGON:
            return Geom(MULTIPOLYGON,
                        [[snap_seq(r, True, True) for r in p]
                         for p in g.data], g.has_z, g.has_m)
        return Geom(GEOMETRYCOLLECTION, [walk(s) for s in g.data],
                    g.has_z, g.has_m)
    return walk(g1)


_EARTH_RADIUS_M = 6371008.8
_WGS84_A = 6378137.0  # web-mercator sphere radius


def _lonlat_to_webmercator(xy: np.ndarray) -> np.ndarray:
    x = np.radians(xy[:, 0]) * _WGS84_A
    lat = np.clip(xy[:, 1], -85.06, 85.06)
    y = np.log(np.tan(np.pi / 4 + np.radians(lat) / 2)) * _WGS84_A
    return np.column_stack([x, y])


def _webmercator_to_lonlat(xy: np.ndarray) -> np.ndarray:
    lon = np.degrees(xy[:, 0] / _WGS84_A)
    lat = np.degrees(2 * np.arctan(np.exp(xy[:, 1] / _WGS84_A)) - np.pi / 2)
    return np.column_stack([lon, lat])


_TRANSFORMS = {
    ("EPSG:4326", "EPSG:3857"): _lonlat_to_webmercator,
    ("EPSG:3857", "EPSG:4326"): _webmercator_to_lonlat,
    ("OGC:CRS84", "EPSG:3857"): _lonlat_to_webmercator,
    ("EPSG:3857", "OGC:CRS84"): _webmercator_to_lonlat,
}


_WGS84_SEMI_A = 6378137.0
_WGS84_F = 1.0 / 298.257223563
_WGS84_E2 = _WGS84_F * (2.0 - _WGS84_F)


def _llh_to_ecef(arr: np.ndarray) -> np.ndarray:
    arr = np.asarray(arr, dtype=np.float64)
    lon = np.radians(arr[:, 0])
    lat = np.radians(arr[:, 1])
    h = arr[:, 2] if arr.shape[1] > 2 else np.zeros(len(arr))
    sinlat = np.sin(lat)
    N = _WGS84_SEMI_A / np.sqrt(1.0 - _WGS84_E2 * sinlat * sinlat)
    out = arr.copy()
    out[:, 0] = (N + h) * np.cos(lat) * np.cos(lon)
    out[:, 1] = (N + h) * np.cos(lat) * np.sin(lon)
    if out.shape[1] > 2:
        out[:, 2] = (N * (1.0 - _WGS84_E2) + h) * sinlat
    return out


def _ecef_to_llh(arr: np.ndarray) -> np.ndarray:
    arr = np.asarray(arr, dtype=np.float64)
    x, y = arr[:, 0], arr[:, 1]
    z = arr[:, 2] if arr.shape[1] > 2 else np.zeros(len(arr))
    lon = np.arctan2(y, x)
    p = np.hypot(x, y)
    lat = np.arctan2(z, p * (1.0 - _WGS84_E2))
    for _ in range(8):   # fixed-point iteration, mm convergence
        sinlat = np.sin(lat)
        N = _WGS84_SEMI_A / np.sqrt(1.0 - _WGS84_E2 * sinlat * sinlat)
        h = p / np.cos(lat) - N
        lat = np.arctan2(z, p * (1.0 - _WGS84_E2 * N / (N + h)))
    sinlat = np.sin(lat)
    N = _WGS84_SEMI_A / np.sqrt(1.0 - _WGS84_E2 * sinlat * sinlat)
    out = arr.copy()
    out[:, 0] = np.degrees(lon)
    out[:, 1] = np.degrees(lat)
    if out.shape[1] > 2:
        out[:, 2] = p / np.cos(lat) - N
    return out


def transform_crs(g: Geom, src: str, dst: str) -> Geom:
    """Reproject between supported CRSes (reference ST_Transform via PROJ,
    /root/reference/c/sedona-proj; here: spherical Web-Mercator math for
    the 4326<->3857 pair — the overwhelmingly common case — implemented
    directly since PROJ is unavailable in this environment)."""
    src, dst = src.upper(), dst.upper()
    if src == dst:
        return g
    if {src, dst} == {"EPSG:4979", "EPSG:4978"}:
        # geographic 3-D (lon lat h) <-> geocentric ECEF (WGS84
        # closed forms; python/sedonadb test_st_transform_3d)
        return transform_coords_full(
            g, _llh_to_ecef if dst == "EPSG:4978" else _ecef_to_llh)
    fn = _TRANSFORMS.get((src, dst))
    if fn is not None:
        return transform_coords(g, fn)
    # UTM zones (EPSG:326xx/327xx) via native Krüger transverse Mercator;
    # chains through EPSG:4326 for 3857<->UTM
    from sedona_db_spark.geom import projections as prj
    _LL = ("EPSG:4326", "OGC:CRS84")
    utm_dst = prj.parse_utm_epsg(dst)
    utm_src = prj.parse_utm_epsg(src)
    if utm_dst is not None and (src in _LL or src == "EPSG:3857"):
        if src == "EPSG:3857":
            g = transform_coords(g, _TRANSFORMS[("EPSG:3857", "EPSG:4326")])
        zone, north = utm_dst

        def fwd(arr):
            arr = np.asarray(arr, dtype=np.float64)
            e, n_ = prj.utm_forward(arr[:, 0], arr[:, 1], zone, north)
            out = arr.copy()
            out[:, 0] = e
            out[:, 1] = n_
            return out
        return transform_coords(g, fwd)
    if utm_src is not None and (dst in _LL or dst == "EPSG:3857"):
        zone, north = utm_src

        def inv(arr):
            arr = np.asarray(arr, dtype=np.float64)
            lon, lat = prj.utm_inverse(arr[:, 0], arr[:, 1], zone, north)
            out = arr.copy()
            out[:, 0] = lon
            out[:, 1] = lat
            return out
        g2 = transform_coords(g, inv)
        if dst == "EPSG:3857":
            g2 = transform_coords(g2, _TRANSFORMS[("EPSG:4326", "EPSG:3857")])
        return g2

    # registered conic/azimuthal CRSes (LCC 2SP, Albers, polar stereo,
    # LAEA — geom/projections.py registry); any pair chains through 4326
    p_dst = prj.lookup_projection(dst)
    p_src = prj.lookup_projection(src)
    if p_src is not None or p_dst is not None:
        g2 = g
        if p_src is not None:
            def inv2(arr, _p=p_src):
                arr = np.asarray(arr, dtype=np.float64)
                lon, lat = _p.inverse(arr[:, 0], arr[:, 1])
                out = arr.copy()
                out[:, 0] = lon
                out[:, 1] = lat
                return out
            g2 = transform_coords(g2, inv2)
            cur = "EPSG:4326"
        else:
            cur = src
        if p_dst is not None:
            if cur not in _LL:
                g2 = transform_crs(g2, cur, "EPSG:4326")

            def fwd2(arr, _p=p_dst):
                arr = np.asarray(arr, dtype=np.float64)
                x, y = _p.forward(arr[:, 0], arr[:, 1])
                out = arr.copy()
                out[:, 0] = x
                out[:, 1] = y
                return out
            return transform_coords(g2, fwd2)
        if dst in _LL:
            return g2
        return transform_crs(g2, "EPSG:4326", dst)
    unknown = dst if (prj.lookup_projection(dst) is None
                      and prj.parse_utm_epsg(dst) is None
                      and dst not in _LL and dst != "EPSG:3857") else src
    near = ", ".join(prj.nearest_supported(unknown))
    raise NotImplementedError(
        f"transform {src} -> {dst} not supported: {unknown} is not in the "
        f"parameter registry (nearest supported codes: {near}). Supported: "
        "EPSG:4326/OGC:CRS84 <-> EPSG:3857 <-> all WGS84 UTM zones "
        "326xx/327xx, ETRS89/NAD83 UTM, GDA94/GDA2020 MGA, SIRGAS2000 UTM "
        "18S-25S, ~45 US State Plane NAD83 zones, and the national grids "
        "in geom/projections.py _PROJ_REGISTRY")


def haversine(lon1, lat1, lon2, lat2):
    """Great-circle distance in meters (vectorized-friendly scalars)."""
    rl1, rl2 = math.radians(lat1), math.radians(lat2)
    dlat = rl2 - rl1
    dlon = math.radians(lon2 - lon1)
    a = math.sin(dlat / 2) ** 2 + math.cos(rl1) * math.cos(rl2) * math.sin(dlon / 2) ** 2
    return 2 * _EARTH_RADIUS_M * math.asin(min(1.0, math.sqrt(a)))


# ======================================================================
# validity / misc
# ======================================================================

def is_ring_simple(ring: np.ndarray) -> bool:
    n = len(ring) - 1
    for i in range(n):
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue
            if _seg_intersects(ring[i], ring[i + 1], ring[j], ring[j + 1]):
                return False
    return True


def invalid_reason(g: Geom):
    """GEOS-phrase validity diagnosis; None when valid.

    Covered rules (python/sedonadb tests/functions test_st_isvalid):
    lineal components need >= 2 distinct points; polygon rings closed,
    >= 4 points, no proper self-crossing ("Self-intersection") and no
    repeated interior vertex ("Ring Self-intersection"); holes may not
    share a dim-1 stretch with the shell or leave it; multipolygon part
    interiors must be disjoint and must not share edges."""
    for line in g.lines():
        if len(line) > 0:
            arr = np.asarray(line, dtype=np.float64)[:, :2]
            if float(np.abs(arr - arr[0]).max()) <= _EPS:
                return "Too few distinct points in geometry component"
    polys = list(g.polygons())
    for poly in polys:
        for ring in poly:
            if len(ring) < 4 or not _close(ring[0], ring[-1]):
                return "Too few points in geometry component"
            r = _ring_crossing_kind(ring)
            if r is not None:
                return r
        shell = np.asarray(poly[0], dtype=np.float64)[:, :2]
        shell_g = Geom(POLYGON, [shell])
        from sedona_db_spark.geom import algorithms2 as _a2
        rings_as_lines = [Geom(LINESTRING, np.asarray(rr, dtype=np.float64)[:, :2])
                          for rr in poly]
        for hi in range(1, len(poly)):
            if _a2._lines_share_dim1(rings_as_lines[0], rings_as_lines[hi]):
                return "Self-intersection"    # hole runs along the shell
            lo, _hihi = _all_vertices_position(
                Geom(LINESTRING, np.asarray(poly[hi], dtype=np.float64)[:, :2]),
                shell_g)
            if lo < 0:
                return "Hole lies outside shell"
        for hi in range(1, len(poly)):
            for hj in range(hi + 1, len(poly)):
                if _a2._lines_share_dim1(rings_as_lines[hi], rings_as_lines[hj]):
                    return "Self-intersection"
    if len(polys) > 1:
        from sedona_db_spark.geom import clip as _mclip
        pgs = [Geom(POLYGON, [np.asarray(r, dtype=np.float64)[:, :2]
                              for r in p]) for p in polys]
        from sedona_db_spark.geom import algorithms2 as _a2
        for i in range(len(pgs)):
            for j in range(i + 1, len(pgs)):
                if not intersects(pgs[i], pgs[j]):
                    continue
                if area(_mclip.polygon_boolean(pgs[i], pgs[j],
                                               "intersection")) > 1e-12:
                    return "Self-intersection"
                ra = Geom(MULTILINESTRING, [np.asarray(r, dtype=np.float64)[:, :2]
                                            for r in pgs[i].data])
                rb = Geom(MULTILINESTRING, [np.asarray(r, dtype=np.float64)[:, :2]
                                            for r in pgs[j].data])
                if _a2._lines_share_dim1(ra, rb):
                    return "Self-intersection"
    return None


def _ring_crossing_kind(ring):
    """None if the closed ring is a simple curve; else the GEOS phrase:
    'Self-intersection' for a proper segment crossing,
    'Ring Self-intersection' for a repeated (pinch) vertex.  Repeated
    CONSECUTIVE points are not self-contact (GEOS: such polygons are
    valid)."""
    r = _dedup_consecutive(ring)
    n = len(r) - 1
    for i in range(n):
        # adjacent (incl. closing) segment pair sharing vertex v:
        # collinear backtrack is a self-overlap (a fully collinear
        # "ring" pinches everywhere — zero-area triangle case)
        a, v = r[i], r[i + 1]
        d = r[((i + 1) % n) + 1]
        if _orient(a, v, d) == 0 and \
                (d[0] - v[0]) * (a[0] - v[0]) + \
                (d[1] - v[1]) * (a[1] - v[1]) > 0:
            return "Ring Self-intersection"
    for i in range(n):
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue
            if _seg_intersects(r[i], r[i + 1], r[j], r[j + 1]):
                o1 = _orient(r[i], r[i + 1], r[j])
                o2 = _orient(r[i], r[i + 1], r[j + 1])
                o3 = _orient(r[j], r[j + 1], r[i])
                o4 = _orient(r[j], r[j + 1], r[i + 1])
                if o1 * o2 < 0 and o3 * o4 < 0:
                    return "Self-intersection"
                return "Ring Self-intersection"
    # repeated non-closing vertex (pinch through a shared vertex)
    seen = set()
    for p in r[:-1]:
        k = (round(float(p[0]) / _EPS), round(float(p[1]) / _EPS))
        if k in seen:
            return "Ring Self-intersection"
        seen.add(k)
    return None


def is_valid(g: Geom) -> bool:
    return invalid_reason(g) is None


def is_ring_closed_simple(ring) -> bool:
    return _ring_crossing_kind(ring) is None


def _dedup_consecutive(arr):
    arr = np.asarray(arr, dtype=np.float64)[:, :2]
    if len(arr) < 2:
        return arr
    keep = [0]
    for i in range(1, len(arr)):
        if not _close(arr[i], arr[keep[-1]]):
            keep.append(i)
    return arr[keep]


def _line_self_simple(line) -> bool:
    """Single polyline simplicity: no self-contact except the closing
    vertex of a closed line (adjacent segments may not backtrack)."""
    pts = _dedup_consecutive(line)
    n = len(pts) - 1
    if n < 1:
        return True
    closed = _close(pts[0], pts[-1])
    for i in range(n):
        for j in range(i + 1, n):
            a, b, c, d = pts[i], pts[i + 1], pts[j], pts[j + 1]
            if j == i + 1:
                # shared vertex b==c: backtrack overlap only
                if _orient(a, b, d) == 0 and \
                        (d[0] - b[0]) * (a[0] - b[0]) + \
                        (d[1] - b[1]) * (a[1] - b[1]) > 0:
                    return False
                continue
            if i == 0 and j == n - 1 and closed:
                # closing pair shares pts[0]: backtrack overlap only
                if _orient(c, d, b) == 0 and \
                        (b[0] - d[0]) * (c[0] - d[0]) + \
                        (b[1] - d[1]) * (c[1] - d[1]) > 0:
                    return False
                continue
            if _seg_intersects(a, b, c, d):
                return False
    return True


def is_simple(g: Geom) -> bool:
    """OGC/GEOS ST_IsSimple semantics (python/sedonadb
    tests/functions test_st_issimple): points always simple, multipoints
    need distinct members, lines no self-contact, polygons need simple
    rings, multilinestrings additionally only boundary-boundary contact
    between members, collections and multipolygons check members
    independently."""
    if g.gt == GEOMETRYCOLLECTION:
        return all(is_simple(s) for s in g.data)
    if g.dimension() == 0:
        keys = [(round(float(p[0]) / _EPS), round(float(p[1]) / _EPS))
                for p in g.points()]
        return len(keys) == len(set(keys))
    if g.gt == LINESTRING:
        return _line_self_simple(g.data)
    if g.gt == MULTILINESTRING:
        lines = [np.asarray(l, dtype=np.float64) for l in g.data]
        if not all(_line_self_simple(l) for l in lines):
            return False
        from sedona_db_spark.geom import algorithms2 as _a2
        gls = [Geom(LINESTRING, l[:, :2]) for l in lines if len(l)]
        for i in range(len(gls)):
            for j in range(i + 1, len(gls)):
                if not intersects(gls[i], gls[j]):
                    continue
                M = _a2._relate_simple(gls[i], gls[j])
                # contact allowed only at boundary-boundary points
                if M[0][0] != "F" or M[0][1] != "F" or M[1][0] != "F":
                    return False
        return True
    # areal: every ring a simple closed curve (cross-ring contact is a
    # VALIDITY question, not simplicity)
    for poly in g.polygons():
        for ring in poly:
            if len(ring) >= 4 and not is_ring_closed_simple(ring):
                return False
    return True


def is_closed(g: Geom) -> bool:
    """GEOS: empties are not closed; nonempty points/areals are; lineal
    parts must each close; collections need every member closed."""
    if g.is_empty():
        return False
    if g.gt == GEOMETRYCOLLECTION:
        return all(is_closed(s) for s in g.data)
    lines = list(g.lines())
    if not lines:
        return True
    return all(len(l) >= 2 and _close(l[0], l[-1]) for l in lines)


def reverse(g: Geom) -> Geom:
    if g.gt == LINESTRING:
        return Geom(LINESTRING, g.data[::-1].copy(), g.has_z, g.has_m)
    if g.gt == POLYGON:
        return Geom(POLYGON, [r[::-1].copy() for r in g.data], g.has_z, g.has_m)
    if g.gt == MULTILINESTRING:
        return Geom(MULTILINESTRING, [l[::-1].copy() for l in g.data], g.has_z, g.has_m)
    if g.gt == MULTIPOLYGON:
        return Geom(MULTIPOLYGON, [[r[::-1].copy() for r in p] for p in g.data], g.has_z, g.has_m)
    if g.gt == GEOMETRYCOLLECTION:
        return Geom(GEOMETRYCOLLECTION, [reverse(s) for s in g.data], g.has_z, g.has_m)
    return g


def make_valid(g: Geom) -> Geom:
    """Best-effort: drop degenerate rings; close unclosed rings.

    A polygon whose rings ALL collapse (zero area) returns its noded
    linework instead of POLYGON EMPTY — GEOS MakeValid's linework
    method (reference c/sedona-geos/src/st_makevalid.rs test:
    POLYGON ((0 0, 1 1, 2 2, 3 3, 0 0)) -> MULTILINESTRING
    ((0 0, 1 1), (1 1, 2 2), (2 2, 3 3))): segments split at every
    input vertex lying on them, then deduplicated undirected."""
    if g.gt == POLYGON:
        rings = []
        raw = []
        for r in g.data:
            if len(r) >= 3:
                if not _close(r[0], r[-1]):
                    r = np.vstack([r, r[:1]])
                raw.append(r)
                # a self-crossing ring (bowtie) has cancelling signed
                # area but nonzero even-odd area — keep it for noding
                if abs(_ring_area2(r)) > _EPS or \
                        _ring_crossing_kind(r) is not None:
                    rings.append(r)
        if any(_ring_crossing_kind(r) is not None for r in raw):
            # self-crossing ring (bowtie): GEOS nodes the linework and
            # keeps the odd-parity faces — MULTIPOLYGON of the lobes,
            # CW shells (python/sedonadb test_st_makevalid); a fully
            # collapsed self-touching ring yields no faces and falls
            # through to the linework result below
            from sedona_db_spark.geom import algorithms2 as _a2
            faces = _a2.noded_even_odd_polygons(raw)
            if len(faces) == 1:
                return Geom(POLYGON, [faces[0][::-1]])
            if faces:
                return Geom(MULTIPOLYGON, [[f[::-1]] for f in faces])
        if not [r for r in rings if abs(_ring_area2(r)) > _EPS] and raw:
            # linework is computed in 2D (vertex noding drops Z/M), so
            # the result flags MUST say 2D — mismatched flags crash the
            # WKB writer (r11 review finding)
            segs = _collapsed_linework(raw)
            if len(segs) == 1:
                return Geom(LINESTRING, segs[0])
            if segs:
                return Geom(MULTILINESTRING, segs)
        return Geom(POLYGON, rings, g.has_z, g.has_m)
    if g.gt == MULTIPOLYGON:
        parts = [make_valid(Geom(POLYGON, list(p), g.has_z, g.has_m))
                 for p in g.data]
        if all(p.gt == POLYGON for p in parts) and \
                not any(_ring_crossing_kind(r) is not None
                        for p in g.data for r in p if len(r) >= 4):
            return g
        out = []
        for p in parts:
            if p.gt == POLYGON and p.data:
                out.append(p.data)
            elif p.gt == MULTIPOLYGON:
                out.extend(p.data)
        return Geom(MULTIPOLYGON, out)
    if g.gt == GEOMETRYCOLLECTION:
        fixed = [make_valid(s) for s in g.data]
        return Geom(GEOMETRYCOLLECTION, fixed, g.has_z, g.has_m)
    return g


def _collapsed_linework(rings: list) -> list:
    """Unique undirected segments of degenerate rings, split at every
    ring vertex that lies on a segment's interior (vertex-noding is
    exact for collapsed rings: every crossing IS a vertex)."""
    verts = np.vstack([np.asarray(r, dtype=np.float64)[:, :2]
                       for r in rings])
    out = {}
    for r in rings:
        a = np.asarray(r, dtype=np.float64)[:, :2]
        for i in range(len(a) - 1):
            p, q = a[i], a[i + 1]
            d = q - p
            L2 = float(d @ d)
            if L2 <= _EPS * _EPS:
                continue
            # parameters of every vertex that lies on [p, q]
            t = ((verts - p) @ d) / L2
            on = (np.abs(np.cross(verts - p, d)) <= 1e-12 * np.sqrt(L2)) \
                & (t > 1e-12) & (t < 1 - 1e-12)
            cuts = sorted({0.0, 1.0} | set(np.round(t[on], 15)))
            pts = [p + c * d for c in cuts]
            for u, v in zip(pts[:-1], pts[1:]):
                key = tuple(sorted((tuple(np.round(u, 12)),
                                    tuple(np.round(v, 12)))))
                if key not in out:
                    out[key] = np.vstack([u, v])
    return list(out.values())
