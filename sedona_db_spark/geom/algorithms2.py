"""Wave-3 computational geometry: triangulation, hull refinement, linework
assembly, interior points, clearance, DE-9IM relate, space-filling order.

Reference parity targets (semantics only, no code ported):
- ST_DelaunayTriangles  /root/reference/c/sedona-geos/src/st_delaunaytriangles.rs
- ST_ConcaveHull        /root/reference/c/sedona-geos/src/st_concavehull.rs
- ST_LineMerge          /root/reference/c/sedona-geos/src/st_line_merge.rs
- ST_Polygonize         /root/reference/c/sedona-geos/src/st_polygonize.rs
- ST_BuildArea          /root/reference/c/sedona-geos/src/st_buildarea.rs
- ST_PointOnSurface     /root/reference/c/sedona-geos/src/st_pointonsurface.rs
- ST_MinimumClearance   /root/reference/c/sedona-geos/src/st_minimumclearance.rs
- ST_Relate             /root/reference/c/sedona-geos/src/st_relate.rs
- SD_Order              /root/reference/rust/sedona-functions/src/sd_order.rs

All functions operate on the pure-python/numpy `Geom` model (geom.core); they
run executor-side inside Arrow-batched pandas UDFs, so they scale horizontally
with partitions — no driver involvement.
"""

from __future__ import annotations

import math

import numpy as np

from sedona_db_spark.geom import algorithms as alg
from sedona_db_spark.geom.core import (
    GEOMETRYCOLLECTION, LINESTRING, MULTILINESTRING, MULTIPOINT, MULTIPOLYGON,
    POINT, POLYGON, Geom, make_point,
)

# ----------------------------------------------------------------------
# Delaunay triangulation (Bowyer-Watson, O(n^2) — batch sizes are bounded
# by Arrow batch rows, and per-geometry vertex counts are small)
# ----------------------------------------------------------------------

def _circumcircle_contains(pts, tri, p) -> bool:
    ax, ay = pts[tri[0]]
    bx, by = pts[tri[1]]
    cx, cy = pts[tri[2]]
    dx, dy = p
    # in-circumcircle determinant; orientation-normalized
    m = np.array([
        [ax - dx, ay - dy, (ax - dx) ** 2 + (ay - dy) ** 2],
        [bx - dx, by - dy, (bx - dx) ** 2 + (by - dy) ** 2],
        [cx - dx, cy - dy, (cx - dx) ** 2 + (cy - dy) ** 2],
    ])
    det = np.linalg.det(m)
    area2 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    if area2 < 0:
        det = -det
    return det > 1e-12


def delaunay_triangles(points: np.ndarray) -> list[tuple[int, int, int]]:
    """Bowyer-Watson over unique 2-D points -> list of index triangles."""
    pts = np.unique(np.asarray(points, dtype=np.float64)[:, :2], axis=0)
    n = len(pts)
    if n < 3:
        return [], pts
    # super-triangle enclosing everything
    cx, cy = pts.mean(axis=0)
    r = max(np.abs(pts - [cx, cy]).max(), 1.0) * 64.0
    sup = np.array([[cx - 2 * r, cy - r], [cx + 2 * r, cy - r], [cx, cy + 2 * r]])
    allp = np.vstack([pts, sup])
    s0, s1, s2 = n, n + 1, n + 2
    tris = [(s0, s1, s2)]
    for i in range(n):
        p = allp[i]
        bad = [t for t in tris if _circumcircle_contains(allp, t, p)]
        if not bad:
            continue
        # boundary of the cavity = edges appearing exactly once among bad tris
        edge_count: dict = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                edge_count[k] = edge_count.get(k, 0) + 1
        tris = [t for t in tris if t not in bad]
        for (a, b), c in edge_count.items():
            if c == 1:
                tris.append((a, b, i))
    out = [t for t in tris if s0 not in t and s1 not in t and s2 not in t]
    return [(int(a), int(b), int(c)) for a, b, c in out], pts


def _node_ring_segments(rings):
    """Undirected noded edge soup of the rings: every segment split at
    each intersection (proper crossings and T-junctions) with any other
    segment.  Returns (vertices array, edge index pairs) with vertices
    deduplicated on a 1e-9 grid, edges in input discovery order."""
    segs = []
    for r in rings:
        a = np.asarray(r, dtype=np.float64)[:, :2]
        for i in range(len(a) - 1):
            if np.hypot(*(a[i + 1] - a[i])) > 1e-12:
                segs.append((a[i], a[i + 1]))
    cuts = [[0.0, 1.0] for _ in segs]
    for i in range(len(segs)):
        p, q = segs[i]
        d = q - p
        for j in range(len(segs)):
            if j == i:
                continue
            c, e = segs[j]
            f = e - c
            den = d[0] * f[1] - d[1] * f[0]
            if abs(den) > 1e-15:
                t = ((c[0] - p[0]) * f[1] - (c[1] - p[1]) * f[0]) / den
                u = ((c[0] - p[0]) * d[1] - (c[1] - p[1]) * d[0]) / den
                if -1e-12 <= t <= 1 + 1e-12 and -1e-12 <= u <= 1 + 1e-12:
                    cuts[i].append(min(max(t, 0.0), 1.0))
            else:
                # collinear: project the other's endpoints
                L2 = float(d @ d)
                if L2 > 0 and abs((c[0] - p[0]) * d[1]
                                  - (c[1] - p[1]) * d[0]) < 1e-12:
                    for pt in (c, e):
                        t = float((pt - p) @ d) / L2
                        if 0.0 < t < 1.0:
                            cuts[i].append(t)
    key2idx, verts, edges, seen = {}, [], [], set()

    def vid(pt):
        k = (round(pt[0] * 1e9), round(pt[1] * 1e9))
        if k not in key2idx:
            key2idx[k] = len(verts)
            verts.append((pt[0], pt[1]))
        return key2idx[k]

    for i, (p, q) in enumerate(segs):
        d = q - p
        ts = sorted(set(cuts[i]))
        for k in range(len(ts) - 1):
            if ts[k + 1] - ts[k] < 1e-12:
                continue
            a = vid(p + ts[k] * d)
            b = vid(p + ts[k + 1] * d)
            if a == b:
                continue
            ek = (a, b) if a < b else (b, a)
            if ek not in seen:
                seen.add(ek)
                edges.append((a, b))
    return np.asarray(verts, dtype=np.float64), edges


def noded_even_odd_polygons(rings) -> list:
    """Node the rings, trace the arrangement's minimal faces (left-face
    walk), keep faces whose representative point has ODD crossing
    parity against the ORIGINAL rings — the GEOS MakeValid result for
    self-crossing rings (bowtie -> two lobes).  Returns CCW face rings
    in edge-discovery order."""
    verts, edges = _node_ring_segments(rings)
    if not edges:
        return []
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    ang = {}
    for v, nbrs in adj.items():
        nbrs = sorted(set(nbrs))
        adj[v] = nbrs
        for w in nbrs:
            ang[(v, w)] = math.atan2(verts[w][1] - verts[v][1],
                                     verts[w][0] - verts[v][0])
    visited = set()
    faces = []
    half = [(a, b) for a, b in edges] + [(b, a) for a, b in edges]
    for h0 in half:
        if h0 in visited:
            continue
        ring_idx = []
        h = h0
        for _ in range(4 * len(half)):
            visited.add(h)
            ring_idx.append(h[0])
            u, v = h
            back = ang[(v, u)]
            nbrs = adj[v]
            # next clockwise neighbor after the reversed edge -> left face
            best, bestd = None, None
            for w in nbrs:
                d = (back - ang[(v, w)]) % (2 * math.pi)
                if d < 1e-12:
                    d = 2 * math.pi
                if bestd is None or d < bestd:
                    best, bestd = w, d
            h = (v, best)
            if h == h0:
                break
        ring = np.asarray([verts[i] for i in ring_idx] + [verts[ring_idx[0]]],
                          dtype=np.float64)
        if len(ring) >= 4 and alg._ring_area2(ring) > 1e-15:
            faces.append(ring)
    kept = []
    for ring in faces:
        rep = point_on_surface(Geom(POLYGON, [ring]))
        if rep is None or rep.data is None:
            continue
        p = np.asarray(rep.data[:2], dtype=np.float64)
        crossings = 0
        for r in rings:
            a = np.asarray(r, dtype=np.float64)[:, :2]
            y0, y1 = a[:-1, 1], a[1:, 1]
            x0, x1 = a[:-1, 0], a[1:, 0]
            m = ((y0 <= p[1]) & (y1 > p[1])) | ((y1 <= p[1]) & (y0 > p[1]))
            if m.any():
                t = (p[1] - y0[m]) / (y1[m] - y0[m])
                crossings += int(np.sum(x0[m] + t * (x1[m] - x0[m]) > p[0]))
        if crossings % 2 == 1:
            kept.append(ring)
    return kept


def delaunay_gc(tris, pts) -> Geom:
    """Triangles -> GEOMETRYCOLLECTION of CCW POLYGONs, each ring
    started at its top-most (tie: left-most) vertex — the GEOS
    QuadEdge emission order the reference's python tests pin
    (GEOMETRYCOLLECTION (POLYGON ((0.5 1, 0 0, 1 0, 0.5 1))))."""
    polys = []
    for a, b, c in tris:
        ring = np.array([pts[a], pts[b], pts[c], pts[a]], dtype=np.float64)
        if alg._ring_area2(ring) < 0:
            ring = ring[::-1]
        start = max(range(3), key=lambda i: (ring[i][1], -ring[i][0]))
        if start:
            ring = np.vstack([ring[start:-1], ring[:start], ring[start:start + 1]])
        polys.append(Geom(POLYGON, [ring]))
    return Geom(GEOMETRYCOLLECTION, polys)


def st_delaunay(g: Geom) -> Geom:
    coords = g.all_coords()
    if len(coords) < 3:
        return Geom(GEOMETRYCOLLECTION, [])
    tris, pts = delaunay_triangles(coords)
    return delaunay_gc(tris, pts)


# ----------------------------------------------------------------------
# Concave hull — Delaunay + boundary-edge erosion (the GEOS
# ConcaveHull algorithm family; ratio 1.0 == convex hull)
# ----------------------------------------------------------------------

def _edge_len(pts, a, b):
    return float(np.hypot(*(pts[a] - pts[b])))


def concave_hull(g: Geom, ratio: float, allow_holes: bool = False) -> Geom:
    coords = g.all_coords()
    if len(coords) < 3:
        return alg.convex_hull(g)
    ratio = min(max(float(ratio), 0.0), 1.0)
    tris, pts = delaunay_triangles(coords)
    if not tris:
        return alg.convex_hull(g)
    if ratio >= 1.0:
        return alg.convex_hull(g)

    lens = [_edge_len(pts, a, b) for t in tris
            for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0]))]
    lo, hi = min(lens), max(lens)
    thr = lo + ratio * (hi - lo)

    tri_set = set(tris)

    def edge_key(a, b):
        return (a, b) if a < b else (b, a)

    def edge_uses():
        uses: dict = {}
        for t in tri_set:
            for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                uses.setdefault(edge_key(a, b), []).append(t)
        return uses

    changed = True
    while changed and len(tri_set) > 1:
        changed = False
        uses = edge_uses()
        border_edges = {e for e, ts in uses.items() if len(ts) == 1}
        bcount: dict = {}
        for e in border_edges:
            for v in e:
                bcount[v] = bcount.get(v, 0) + 1
        # GEOS ConcaveHull erosion: remove the border triangle whose
        # longest border edge is largest (above threshold).  Only
        # single-border-edge triangles with an interior opposite vertex
        # are removable — the hull must still COVER every input point,
        # so ears never go.  NOTE: on co-circular inputs the Delaunay
        # diagonals (and therefore which of several EQUAL-length border
        # edges erodes) are not unique; GEOS's triangulator can bite a
        # different corner (replay DIVERGENCES).
        best = None
        for t in tri_set:
            tes = [edge_key(t[0], t[1]), edge_key(t[1], t[2]),
                   edge_key(t[2], t[0])]
            bes = [e for e in tes if e in border_edges]
            if len(bes) != 1:
                continue
            ln = _edge_len(pts, *bes[0])
            if ln <= thr:
                continue
            opp = [v for v in t if v not in bes[0]][0]
            if bcount.get(opp, 0):
                continue  # removal would pinch the hull
            if best is None or ln > best[0]:
                best = (ln, t)
        if best is not None:
            tri_set.discard(best[1])
            changed = True

    # stitch remaining boundary edges into a ring
    uses = edge_uses()
    border = [e for e, ts in uses.items() if len(ts) == 1]
    if not border:
        return alg.convex_hull(g)
    nxt: dict = {}
    for a, b in border:
        nxt.setdefault(a, []).append(b)
        nxt.setdefault(b, []).append(a)
    start = border[0][0]
    ring = [start]
    prev = None
    cur = start
    for _ in range(len(border) + 1):
        cands = [v for v in nxt.get(cur, []) if v != prev]
        if not cands:
            break
        prev, cur = cur, cands[0]
        ring.append(cur)
        if cur == start:
            break
    if ring[-1] != start or len(ring) < 4:
        return alg.convex_hull(g)
    arr = pts[np.array(ring)]
    if alg._ring_area2(arr) < 0:
        arr = arr[::-1]
    return Geom(POLYGON, [arr])


# ----------------------------------------------------------------------
# Linework: merge, polygonize, build_area
# ----------------------------------------------------------------------

def _pt_key(p, nd=12):
    return (round(float(p[0]), nd), round(float(p[1]), nd))


def line_merge(g: Geom, directed: bool = False) -> Geom:
    """Chain lines that meet at degree-2 endpoints (GEOS LineMerger).
    ``directed=True`` (GEOS DirectedLineMerger, the reference's 2-arg
    ST_LineMerge) only joins an END to a START — no segment is ever
    reversed."""
    lines = [np.asarray(l, dtype=np.float64)[:, :2] for l in g.lines() if len(l) >= 2]
    lines += [np.asarray(r, dtype=np.float64)[:, :2]
              for r in g.rings() if len(r) >= 2]   # polygon linework merges
    if not lines:
        # empty inputs keep their type; a non-empty puntal input has no
        # linework and GEOS LineMerger emits an empty collection
        return g if g.is_empty() else Geom(GEOMETRYCOLLECTION, [])
    merged = True
    while merged:
        merged = False
        # endpoint -> [(line_idx, is_start)]
        ends: dict = {}
        for i, l in enumerate(lines):
            ends.setdefault(_pt_key(l[0]), []).append((i, True))
            ends.setdefault(_pt_key(l[-1]), []).append((i, False))
        for k, touching in ends.items():
            if len(touching) != 2:
                continue
            (i, si), (j, sj) = touching
            if i == j:
                continue  # closed ring
            if directed:
                # join only end-of-one to start-of-other, as-is
                if si == sj:
                    continue
                if si:       # i starts at k, j ends at k -> j + i
                    i, j = j, i
                    si, sj = sj, si
                lines[i] = np.vstack([lines[i], lines[j][1:]])
                lines.pop(j)
                merged = True
                break
            a, b = lines[i], lines[j]
            if si:
                a = a[::-1]  # now a ends at k
            if not sj:
                b = b[::-1]  # now b starts at k
            lines[i] = np.vstack([a, b[1:]])
            lines.pop(j)
            merged = True
            break
    if len(lines) == 1:
        return Geom(LINESTRING, lines[0])
    return Geom(MULTILINESTRING, lines)


def polygonize(g: Geom) -> Geom:
    """Closed rings in the (merged) linework -> collection of polygons.
    Shells come out CLOCKWISE — GEOS Polygonizer's output convention
    (reference c/sedona-geos/src/st_polygonize.rs asserts
    POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0)) for the CCW input ring).
    A ring contained in another becomes a CCW HOLE of the smallest
    enclosing ring's polygon AND still emits its own polygon (GEOS
    Polygonizer; python/sedonadb test_st_polygonize pins the
    polygon-with-hole double output)."""
    m = line_merge(g)
    rings = []
    for l in ([m.data] if m.gt == LINESTRING else list(m.data) if m.gt == MULTILINESTRING else []):
        if len(l) >= 4 and _pt_key(l[0]) == _pt_key(l[-1]):
            ring = np.asarray(l, dtype=np.float64)
            if alg._ring_area2(ring) > 0:
                ring = ring[::-1]          # CW shells
            rings.append(ring)
    # containment: hole rings attach to the smallest enclosing ring
    holes_of: dict = {i: [] for i in range(len(rings))}
    for i, r in enumerate(rings):
        parent, parea = None, None
        for j, s in enumerate(rings):
            if i == j:
                continue
            sa = abs(alg._ring_area2(s))
            if sa <= abs(alg._ring_area2(r)):
                continue
            if alg._point_in_ring(r[0], s) > 0 or (
                    alg._point_in_ring(r[0], s) == 0
                    and alg._point_in_ring(
                        0.5 * (r[0] + r[1]), s) >= 0):
                if parent is None or sa < parea:
                    parent, parea = j, sa
        if parent is not None:
            holes_of[parent].append(r[::-1])   # CCW holes
    polys = [Geom(POLYGON, [r] + holes_of[i])
             for i, r in enumerate(rings)]
    return Geom(GEOMETRYCOLLECTION, polys)


def _as_linework(g: Geom) -> Geom:
    """Every edge of the input as plain linestrings: polygon/multipolygon
    rings become closed lines (GEOS BuildArea consumes the LINEWORK of
    its argument, so a polygon input rebuilds its area — reference
    c/sedona-geos/src/st_buildarea.rs test: POLYGON in -> POLYGON out).
    Collections recurse per member ONLY (g.lines() itself walks into
    collections, so mixing both walks double-counted every lineal
    member — r11 review finding)."""
    if g.gt == GEOMETRYCOLLECTION:
        lines = []
        for sub in g.data:
            lines += list(_as_linework(sub).data)
        return Geom(MULTILINESTRING, lines)
    lines = [np.asarray(l, dtype=np.float64)[:, :2]
             for l in g.lines() if len(l) >= 2]
    if g.gt == POLYGON:
        lines += [np.asarray(r, dtype=np.float64)[:, :2] for r in g.data]
    elif g.gt == MULTIPOLYGON:
        lines += [np.asarray(r, dtype=np.float64)[:, :2]
                  for p in g.data for r in p]
    return Geom(MULTILINESTRING, lines)


def _puntal_only(g: Geom) -> bool:
    if g.gt in (POINT, MULTIPOINT):
        return True
    if g.gt == GEOMETRYCOLLECTION:
        return bool(g.data) and all(_puntal_only(s) for s in g.data)
    return False


def build_area(g: Geom) -> Geom | None:
    """Polygonize + assign rings contained in another ring as holes.
    Non-lineal input (points) returns None -> SQL NULL; empty or
    non-polygonizable LINEWORK returns POLYGON EMPTY — both pinned by
    the reference's own asserts (c/sedona-geos/src/st_buildarea.rs:
    POINT -> null, LINESTRING EMPTY -> POLYGON EMPTY)."""
    if _puntal_only(g):
        return None
    pc = polygonize(_as_linework(g))
    shells = [p.data[0] for p in pc.data]
    if not shells:
        return Geom(POLYGON, [])
    # sort big->small so holes attach to the smallest enclosing shell last
    order = sorted(range(len(shells)),
                   key=lambda i: -abs(alg._ring_area2(shells[i])))
    assigned = [None] * len(shells)  # index of parent shell or None
    for pos, i in enumerate(order):
        for j in order[:pos][::-1]:  # smallest enclosing first
            if assigned[j] is not None:
                continue
            inside = alg._point_in_ring(shells[i][0], shells[j]) >= 0 and \
                abs(alg._ring_area2(shells[j])) > abs(alg._ring_area2(shells[i]))
            if inside:
                assigned[i] = j
                break
    polys = []
    for i in range(len(shells)):
        if assigned[i] is not None:
            continue
        holes = [shells[j][::-1] for j in range(len(shells)) if assigned[j] == i]
        polys.append(Geom(POLYGON, [shells[i]] + holes))
    if not polys:
        return Geom(POLYGON, [])
    if len(polys) == 1:
        return polys[0]
    return Geom(MULTIPOLYGON, [p.data for p in polys])


# ----------------------------------------------------------------------
# Interior point (ST_PointOnSurface)
# ----------------------------------------------------------------------

def point_on_surface(g: Geom) -> Geom | None:
    if g.is_empty():
        return Geom(POINT, None)      # GEOS: POINT EMPTY, not NULL
    if g.gt in (POINT, MULTIPOINT):
        return Geom(POINT, next(iter(g.points())).copy()[:2])
    if g.gt in (LINESTRING, MULTILINESTRING):
        # GEOS InteriorPointLine: the interior (non-endpoint) vertex
        # nearest the centroid; endpoints only when NO line has one
        c = alg.centroid(g)
        for pick_interior in (True, False):
            best, bd = None, math.inf
            for l in g.lines():
                arr = np.asarray(l, dtype=np.float64)[:, :2]
                cand = arr[1:-1] if pick_interior else arr
                if not len(cand):
                    continue
                d = np.hypot(cand[:, 0] - c[0], cand[:, 1] - c[1])
                i = int(d.argmin())
                if d[i] < bd:
                    bd, best = float(d[i]), cand[i]
            if best is not None:
                return Geom(POINT, best.copy())
        return Geom(POINT, None)
    polys = list(g.polygons())
    if not polys:
        for part in g.geometries():  # mixed collection: first non-empty
            p = point_on_surface(part)
            if p is not None and p.data is not None:
                return p
        return None
    # GEOS InteriorPointArea: horizontal SAFE bisector, widest interval.
    # SafeBisectorFinder: loY = max vertex-Y <= centre (seeded minY),
    # hiY = min vertex-Y > centre (seeded maxY), bisect the two — this
    # moves the scanline off any vertex row (hole-top-on-centre case
    # pins POINT (2 3), python/sedonadb test_st_pointonsurface)
    rings = [np.asarray(r, dtype=np.float64)[:, :2] for pr in polys for r in pr]
    ys = np.concatenate([r[:, 1] for r in rings])
    centre = (ys.min() + ys.max()) / 2.0
    lo = ys[ys <= centre]
    hi = ys[ys > centre]
    y = ((lo.max() if len(lo) else ys.min())
         + (hi.min() if len(hi) else ys.max())) / 2.0
    xs = []
    for r in rings:
        x0, y0 = r[:-1, 0], r[:-1, 1]
        x1, y1 = r[1:, 0], r[1:, 1]
        cross = ((y0 <= y) & (y1 > y)) | ((y1 <= y) & (y0 > y))
        t = (y - y0[cross]) / (y1[cross] - y0[cross])
        xs.append(x0[cross] + t * (x1[cross] - x0[cross]))
    xs = np.sort(np.concatenate(xs)) if xs else np.empty(0)
    if len(xs) < 2:
        c = alg.centroid(g)
        return Geom(POINT, np.array(c, dtype=np.float64))
    widths = xs[1::2] - xs[0::2] if len(xs) % 2 == 0 else xs[1:] - xs[:-1]
    i = int(np.argmax(widths))
    mid_x = (xs[2 * i] + xs[2 * i + 1]) / 2.0 if len(xs) % 2 == 0 else \
        (xs[i] + xs[i + 1]) / 2.0
    return Geom(POINT, np.array([mid_x, y], dtype=np.float64))


# ----------------------------------------------------------------------
# Minimum clearance
# ----------------------------------------------------------------------

def minimum_clearance(g: Geom, want_line: bool = False):
    """GEOS MinimumClearance: min over positive vertex-to-vertex and
    vertex-to-non-incident-segment distances, scanned in GEOMETRY
    order (the witness line is (query vertex, nearest point); strict <
    keeps the first minimal pair — GEOS's tree traversal can pick a
    different witness among EXACT ties, see tools/replay_python_tests
    DIVERGENCES).  Puntal/empty input -> LINESTRING EMPTY for the line
    form, inf for the scalar."""
    coords = g.all_coords()[:, :2]
    uniq_seen: set = set()
    verts = []
    for p in coords:
        k = (round(float(p[0]) * 1e12), round(float(p[1]) * 1e12))
        if k not in uniq_seen:
            uniq_seen.add(k)
            verts.append(np.asarray(p, dtype=np.float64))
    segs = []
    for part in ([l for l in g.lines()] + [r for r in g.rings()]):
        arr = np.asarray(part, dtype=np.float64)[:, :2]
        for k in range(len(arr) - 1):
            if np.hypot(*(arr[k + 1] - arr[k])) > 0:
                segs.append((arr[k], arr[k + 1]))
    if len(verts) < 2 and not segs:
        if want_line:
            return Geom(LINESTRING, np.empty((0, 2)))
        return math.inf
    best = math.inf
    best_pair = None
    # ALL vertex-vertex pairs first (geometry order), then vertex-to-
    # segment: GEOS resolves a vertex-pair/segment tie in favor of the
    # vertex pair (POLYGON((0 0,3 0,3 3,2 1,1 3,0 3)) pins (1 3, 0 3))
    for i, v in enumerate(verts):
        for j in range(i + 1, len(verts)):
            d = float(np.hypot(*(verts[j] - v)))
            if 0 < d < best:
                best = d
                best_pair = (v, verts[j])
    for v in verts:
        for a, b in segs:
            if (abs(v[0] - a[0]) < 1e-12 and abs(v[1] - a[1]) < 1e-12) or \
                    (abs(v[0] - b[0]) < 1e-12 and abs(v[1] - b[1]) < 1e-12):
                continue
            ab = b - a
            ll = float(ab @ ab)
            t = min(1.0, max(0.0, float((v - a) @ ab) / ll))
            proj = a + t * ab
            d = float(np.hypot(*(v - proj)))
            if 0 < d < best:
                best = d
                best_pair = (v, proj)
    if want_line:
        if best_pair is None or not math.isfinite(best):
            return Geom(LINESTRING, np.empty((0, 2)))
        return Geom(LINESTRING, np.array([best_pair[0], best_pair[1]],
                                         dtype=np.float64))
    return best


# ----------------------------------------------------------------------
# DE-9IM relate (case analysis on topological dimension; exact for
# homogeneous inputs incl. multi-part — see relate_matrix; heterogeneous
# collections take cell-wise max over part pairs)
# ----------------------------------------------------------------------

_DIMRANK = {"F": 0, "0": 1, "1": 2, "2": 3}
_RANKDIM = {v: k for k, v in _DIMRANK.items()}


def _cell_max(a: str, b: str) -> str:
    return a if _DIMRANK[a] >= _DIMRANK[b] else b


def _line_boundary_points(g: Geom) -> list:
    """Mod-2 boundary: endpoints appearing an odd number of times."""
    cnt: dict = {}
    pts: dict = {}
    for l in g.lines():
        arr = np.asarray(l, dtype=np.float64)[:, :2]
        if len(arr) < 2 or _pt_key(arr[0]) == _pt_key(arr[-1]):
            continue
        for p in (arr[0], arr[-1]):
            k = _pt_key(p)
            cnt[k] = cnt.get(k, 0) + 1
            pts[k] = p
    return [pts[k] for k, c in cnt.items() if c % 2 == 1]


def _pt_on_line_interior(p, g: Geom) -> bool:
    bnd = {_pt_key(q) for q in _line_boundary_points(g)}
    if _pt_key(p) in bnd:
        return False
    pg = Geom(POINT, np.asarray(p, dtype=np.float64))
    return alg.intersects(pg, g)


def lines_ii_nonempty(a: Geom, b: Geom) -> bool:
    """Exact interior(a) n interior(b) != empty for lineal a, b.
    Three exhaustive contact classes: collinear overlap (dim 1), proper
    transversal segment crossing, and a vertex of either line sitting
    on the line-interior of BOTH (covers T-contacts and vertex-vertex
    crossings that strict-orientation tests miss).  Isolated contacts
    between polylines always fall in one of the last two classes: a
    point shared by two straight segments away from every vertex is a
    transversal crossing, and any other isolated contact involves a
    segment endpoint, i.e. a vertex."""
    if _lines_share_dim1(a, b):
        return True
    if alg._any_proper_cross(a, b):
        return True
    for g in (a, b):
        for arr in g.lines():
            for p in np.asarray(arr, dtype=np.float64)[:, :2]:
                if _pt_on_line_interior(p, a) and _pt_on_line_interior(p, b):
                    return True
    return False


def _lines_share_dim1(a: Geom, b: Geom) -> bool:
    """Any pair of collinear overlapping segments between the two."""
    for sa0, sa1 in alg._segments(a):
        da = sa1 - sa0
        for sb0, sb1 in alg._segments(b):
            # collinear test
            if abs(alg._orient(sa0, sa1, sb0)) > 1e-12 or \
               abs(alg._orient(sa0, sa1, sb1)) > 1e-12:
                continue
            # 1-D overlap along the dominant axis
            ax = 0 if abs(da[0]) >= abs(da[1]) else 1
            lo1, hi1 = sorted((sa0[ax], sa1[ax]))
            lo2, hi2 = sorted((sb0[ax], sb1[ax]))
            if min(hi1, hi2) - max(lo1, lo2) > 1e-12:
                return True
    return False


def _relate_simple(a: Geom, b: Geom) -> list[list[str]]:
    """9-cell matrix for single-part a, b (rows: a I/B/E, cols: b I/B/E)."""
    M = [["F", "F", "F"], ["F", "F", "F"], ["F", "F", "2"]]
    da, db = a.dimension(), b.dimension()

    def setc(r, c, v):
        M[r][c] = _cell_max(M[r][c], v)

    if da == 0 and db == 0:
        pa = {_pt_key(p) for p in a.points()}
        pb = {_pt_key(p) for p in b.points()}
        if pa & pb:
            setc(0, 0, "0")
        if pa - pb:
            setc(0, 2, "0")
        if pb - pa:
            setc(2, 0, "0")
        return M
    if da == 0:
        return _transpose(_relate_simple(b, a))
    if db == 0:  # a is line/polygon, b is point(s)
        for p in b.points():
            pg = Geom(POINT, np.asarray(p, dtype=np.float64))
            if da == 1:
                bnd = {_pt_key(q) for q in _line_boundary_points(a)}
                if _pt_key(p) in bnd:
                    setc(1, 0, "0")
                elif alg.intersects(pg, a):
                    setc(0, 0, "0")
                else:
                    setc(2, 0, "0")
            else:
                pos = alg.point_position(np.asarray(p, dtype=np.float64)[:2], a)
                if pos > 0:
                    setc(0, 0, "0")
                elif pos == 0:
                    setc(1, 0, "0")
                else:
                    setc(2, 0, "0")
        # a minus the points always keeps its own dimension
        setc(0, 2, str(da))
        if da == 1:
            if _line_boundary_points(a):
                setc(1, 2, "0")
        else:
            setc(1, 2, "1")
        return M

    if da == 1 and db == 1:
        sh1 = _lines_share_dim1(a, b)
        inter = alg.intersects(a, b)
        ba = _line_boundary_points(a)
        bb = _line_boundary_points(b)
        bak = {_pt_key(p) for p in ba}
        bbk = {_pt_key(p) for p in bb}
        if sh1:
            setc(0, 0, "1")
        elif inter and lines_ii_nonempty(a, b):
            # isolated interior-interior contact: proper crossing or an
            # interior-vertex contact (a boundary touch elsewhere no
            # longer masks it — the old touched_int heuristic did)
            setc(0, 0, "0")
        # boundary-vs-other cells
        for p in bb:
            if _pt_on_line_interior(p, a):
                setc(0, 1, "0")
            elif _pt_key(p) in bak:
                setc(1, 1, "0")
            else:
                setc(2, 1, "0")
        for p in ba:
            if _pt_on_line_interior(p, b):
                setc(1, 0, "0")
            elif _pt_key(p) in bbk:
                setc(1, 1, "0")
            else:
                setc(1, 2, "0")
        if not (alg.covered_by(a, b) and sh1):
            if not alg.covered_by(a, b):
                setc(0, 2, "1")
        if not alg.covered_by(b, a):
            setc(2, 0, "1")
        return M

    if da == 1 and db == 2:
        return _transpose(_relate_simple(b, a))
    if da == 2 and db == 1:
        # polygon a vs line b: exact first-column cells from the
        # split-at-boundary classified lengths (vertex/midpoint sampling
        # missed transits that cross the boundary only at ring vertices)
        li, lb, le = _linework_position_lengths(b, a)
        if li > _AREA_TOL:
            setc(0, 0, "1")
        ringg = Geom(MULTILINESTRING, [np.asarray(r, dtype=np.float64)[:, :2]
                                       for r in a.rings()])
        if lb > _AREA_TOL:
            setc(1, 0, "1")   # line runs along the boundary
        elif alg.intersects(ringg, b):
            setc(1, 0, "0")   # isolated boundary touches/crossings only
        if le > _AREA_TOL:
            setc(2, 0, "1")
        for p in _line_boundary_points(b):
            pp = alg.point_position(np.asarray(p, dtype=np.float64)[:2], a)
            if pp > 0:
                setc(0, 1, "0")
            elif pp == 0:
                setc(1, 1, "0")
            else:
                setc(2, 1, "0")
        setc(0, 2, "2")
        if not alg.covered_by(ringg, b):
            setc(1, 2, "1")
        return M

    # polygon vs polygon
    inter = alg.intersects(a, b)
    if not inter:
        M[0][2] = "2"
        M[1][2] = "1"
        M[2][0] = "2"
        M[2][1] = "1"
        return M
    eq = alg.equals(a, b)
    if eq:
        return [["2", "F", "F"], ["F", "1", "F"], ["F", "F", "2"]]
    a_in_b = alg.covered_by(a, b)
    b_in_a = alg.covered_by(b, a)
    ra = Geom(MULTILINESTRING, [np.asarray(r, dtype=np.float64)[:, :2]
                                for r in a.rings()])
    rb = Geom(MULTILINESTRING, [np.asarray(r, dtype=np.float64)[:, :2]
                                for r in b.rings()])
    bb_dim1 = _lines_share_dim1(ra, rb)
    touch_only = alg.touches(a, b)
    if not touch_only:
        M[0][0] = "2"
    M[1][1] = "1" if bb_dim1 else ("0" if alg.intersects(ra, rb) else "F")
    if not touch_only:
        # b's boundary meets a's interior unless a sits inside b
        if not a_in_b:
            M[0][1] = "1"
        # a's boundary meets b's interior unless b sits inside a
        if not b_in_a:
            M[1][0] = "1"
    if not a_in_b:
        M[0][2] = "2"
        M[1][2] = "1"
    if not b_in_a:
        M[2][0] = "2"
        M[2][1] = "1"
    return M


def _transpose(M):
    return [[M[c][r] for c in range(3)] for r in range(3)]


def _linework_position_lengths(line: Geom, poly: Geom):
    """(len_interior, len_boundary, len_exterior) of `line` measured
    against the whole areal geometry `poly` — exact: every segment is
    split at its crossings with the polygon boundary and each piece is
    classified by its midpoint position (split points always exist at
    class transitions because the adjacent non-collinear boundary
    segment generates one)."""
    bsegs = list(alg._segments(poly))
    acc = [0.0, 0.0, 0.0]  # interior, boundary, exterior
    for arr in line.lines():
        r = np.asarray(arr, dtype=np.float64)[:, :2]
        for i in range(len(r) - 1):
            a, b = r[i], r[i + 1]
            dx, dy = b[0] - a[0], b[1] - a[1]
            if dx == 0.0 and dy == 0.0:
                continue
            seg_len = float(np.hypot(dx, dy))
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
                pos = alg.point_position(mid, poly)
                acc[1 - pos] += (t1 - t0) * seg_len  # pos 1/0/-1 -> idx 0/1/2
    return acc[0], acc[1], acc[2]


_AREA_TOL = 1e-12


def _relate_areal_exact(a: Geom, b: Geom) -> list[list[str]]:
    """Exact DE-9IM for (multi)polygon x (multi)polygon, computed
    constructively on the WHOLE geometries (reference GEOS semantics,
    c/sedona-geos/src/st_relate.rs): open-set cells from Martinez
    overlay areas, boundary cells from exact clip lengths.  Correct for
    interacting parts (e.g. two parts of A jointly covering B), where
    cell-wise max over part pairs is not."""
    from sedona_db_spark.geom import clip as _mclip
    M = [["F", "F", "F"], ["F", "F", "F"], ["F", "F", "2"]]
    ra = Geom(MULTILINESTRING, [np.asarray(r, dtype=np.float64)[:, :2]
                                for r in a.rings()])
    rb = Geom(MULTILINESTRING, [np.asarray(r, dtype=np.float64)[:, :2]
                                for r in b.rings()])
    # interiors are open 2-D sets: any nonempty intersection with an open
    # set that a curve/area meets has full dimension, so each open-set
    # cell is a yes/no measured by overlay area or clip length
    if alg.area(_mclip.polygon_boolean(a, b, "intersection")) > _AREA_TOL:
        M[0][0] = "2"
    if alg.area(_mclip.polygon_boolean(a, b, "difference")) > _AREA_TOL:
        M[0][2] = "2"
    if alg.area(_mclip.polygon_boolean(b, a, "difference")) > _AREA_TOL:
        M[2][0] = "2"
    bi, bbnd, be = _linework_position_lengths(rb, a)
    if bi > _AREA_TOL:
        M[0][1] = "1"
    if be > _AREA_TOL:
        M[2][1] = "1"
    ai, _abnd, ae = _linework_position_lengths(ra, b)
    if ai > _AREA_TOL:
        M[1][0] = "1"
    if ae > _AREA_TOL:
        M[1][2] = "1"
    # B(A) n B(B): dim 1 iff the boundaries share collinear length
    # (measured by the same clip), else 0 iff they meet at all
    M[1][1] = ("1" if bbnd > _AREA_TOL
               else ("0" if alg.intersects(ra, rb) else "F"))
    return M


def _boundary_dim_str(g: Geom) -> str:
    if g.dimension() == 2:
        return "1"
    if g.dimension() == 1:
        return "0" if _line_boundary_points(g) else "F"
    return "F"


def _part_dims(g: Geom) -> set:
    if g.gt == GEOMETRYCOLLECTION:
        out: set = set()
        for p in g.geometries():
            out |= _part_dims(p)
        return out
    return {g.dimension()} if not g.is_empty() else set()


def relate_matrix(a: Geom, b: Geom) -> str:
    """DE-9IM matrix string (reference c/sedona-geos/src/st_relate.rs).

    Exact for homogeneous inputs including multi-part: areal x areal is
    computed constructively on the whole geometries via overlay +
    boundary-clip (`_relate_areal_exact`); point/line combinations run
    `_relate_simple` directly on the whole geometry (its primitives —
    mod-2 boundaries, whole-geometry covers/position — already handle
    multiple parts).  Only heterogeneous GEOMETRYCOLLECTIONs fall back
    to cell-wise max over part pairs (documented approximation)."""
    if a.is_empty() or b.is_empty():
        M = [["F"] * 3 for _ in range(3)]
        M[2][2] = "2"
        if not a.is_empty():
            M[0][2] = str(a.dimension())
            M[1][2] = _boundary_dim_str(a)
        if not b.is_empty():
            M[2][0] = str(b.dimension())
            M[2][1] = _boundary_dim_str(b)
        return "".join(M[r][c] for r in range(3) for c in range(3))

    da, db = _part_dims(a), _part_dims(b)
    if len(da) == 1 and len(db) == 1:
        if da == {2} and db == {2}:
            M = _relate_areal_exact(a, b)
        else:
            M = _relate_simple(a, b)
        return "".join(M[r][c] for r in range(3) for c in range(3))

    # heterogeneous collection: exact via I/B/E decomposition of the union
    M = _relate_mixed_exact(a, b)
    return "".join(M[r][c] for r in range(3) for c in range(3))


class _MixedSide:
    """I/B/E decomposition of a (possibly heterogeneous) geometry, using
    the union point-set semantics GEOS RelateNG exposes for collections
    (observed in the reference's PostGIS-parity expectations,
    python/sedonadb/tests/functions/test_predicates.py:45-90):
      B = boundary(union of areal parts) U mod-2 endpoints of line parts
      I = (union of all part point-sets) \\ B, with areal interior taking
          priority (a line endpoint inside a polygon interior is interior)
      element interiors do NOT absorb boundary points (a POINT part at a
      line endpoint stays boundary).
    """

    def __init__(self, g: Geom):
        import functools
        polys = [Geom(POLYGON, p) for p in g.polygons()]
        self.P = None
        if polys:
            self.P = functools.reduce(alg.union2, polys) if len(polys) > 1 else polys[0]
        self.lines = [np.asarray(l, dtype=np.float64)[:, :2]
                      for l in g.lines() if len(l) >= 2]
        self.mod2 = {_pt_key(p) for p in _line_boundary_points(
            Geom(MULTILINESTRING, self.lines))} if self.lines else set()
        self.tpts = [np.asarray(p, dtype=np.float64)[:2] for p in g.points()]
        self.tkeys = {_pt_key(p) for p in self.tpts}

    def loc(self, p) -> int:
        """0 = interior, 1 = boundary, 2 = exterior."""
        p = np.asarray(p, dtype=np.float64)[:2]
        pos = alg.point_position(p, self.P) if self.P is not None else -1
        if pos > 0:
            return 0
        if pos == 0 or _pt_key(p) in self.mod2:
            return 1
        if _pt_key(p) in self.tkeys:
            return 0
        for arr in self.lines:
            for i in range(len(arr) - 1):
                if alg._on_segment(p, arr[i], arr[i + 1]):
                    return 0
        return 2

    def segments(self):
        if self.P is not None:
            for ring in self.P.rings():
                arr = np.asarray(ring, dtype=np.float64)[:, :2]
                for i in range(len(arr) - 1):
                    yield arr[i], arr[i + 1]
        for arr in self.lines:
            for i in range(len(arr) - 1):
                yield arr[i], arr[i + 1]


def _seg_break_ts(a0, a1, b0, b1) -> list:
    """Params t in (0,1) along a where b crosses/overlaps a."""
    d = a1 - a0
    L2 = float(d @ d)
    if L2 <= 0:
        return []
    o0 = alg._orient(a0, a1, b0)
    o1 = alg._orient(a0, a1, b1)
    eps = 1e-12 * max(1.0, math.sqrt(L2))
    out = []
    if abs(o0) <= eps and abs(o1) <= eps:  # collinear: overlap endpoints
        for q in (b0, b1):
            t = float((q - a0) @ d) / L2
            if 1e-12 < t < 1 - 1e-12:
                out.append(t)
        return out
    if abs(o0) <= eps or abs(o1) <= eps or (o0 > 0) != (o1 > 0):
        ob0 = alg._orient(b0, b1, a0)
        ob1 = alg._orient(b0, b1, a1)
        if abs(ob0) <= eps or abs(ob1) <= eps or (ob0 > 0) != (ob1 > 0):
            denom = o0 - o1
            if abs(denom) > 0:
                t_on_b = o0 / denom  # intersection param along b
                q = b0 + t_on_b * (b1 - b0)
                t = float((q - a0) @ d) / L2
                if 1e-12 < t < 1 - 1e-12:
                    out.append(t)
    return out


def _relate_mixed_exact(a: Geom, b: Geom) -> list[list[str]]:
    """Exact DE-9IM for heterogeneous collections: areal overlay for the
    dim-2 cells, global segment noding + midpoint location for dim-1, and
    candidate-point location for dim-0."""
    A, B = _MixedSide(a), _MixedSide(b)
    M = [["F"] * 3 for _ in range(3)]
    M[2][2] = "2"

    def setc(r, c, v):
        M[r][c] = _cell_max(M[r][c], v)

    # dim-2 cells from the areal unions (open sets: minus the other side's
    # measure-zero lines/points they keep a dim-2 subset)
    if A.P is not None and B.P is not None:
        if alg.area(alg.intersection(A.P, B.P)) > 1e-24:
            setc(0, 0, "2")
        if alg.area(alg.difference(A.P, B.P)) > 1e-24:
            setc(0, 2, "2")
        if alg.area(alg.difference(B.P, A.P)) > 1e-24:
            setc(2, 0, "2")
    elif A.P is not None and alg.area(A.P) > 0:
        setc(0, 2, "2")
    elif B.P is not None and alg.area(B.P) > 0:
        setc(2, 0, "2")

    # global noding: split every segment at crossings/overlap endpoints
    segs = [(p0, p1) for p0, p1 in A.segments()] + \
           [(p0, p1) for p0, p1 in B.segments()]
    pts0: list = [p for p in A.tpts] + [p for p in B.tpts]
    for i, (a0, a1) in enumerate(segs):
        ts = [0.0, 1.0]
        for j, (b0, b1) in enumerate(segs):
            if i != j:
                ts.extend(_seg_break_ts(a0, a1, b0, b1))
        ts = sorted(set(ts))
        for t0, t1 in zip(ts[:-1], ts[1:]):
            mid = a0 + ((t0 + t1) / 2.0) * (a1 - a0)
            setc(A.loc(mid), B.loc(mid), "1")
            pts0.append(a0 + t0 * (a1 - a0))
        pts0.append(a1)

    for p in pts0:
        setc(A.loc(p), B.loc(p), "0")
    return M


def relate_pattern(a: Geom, b: Geom, pattern: str) -> bool:
    m = relate_matrix(a, b)
    if len(pattern) != 9:
        return False
    for mc, pc in zip(m, pattern.upper()):
        if pc == "*":
            continue
        if pc == "T":
            if mc == "F":
                return False
        elif pc != mc:
            return False
    return True


# ----------------------------------------------------------------------
# Hilbert space-filling order (SD_Order / SD_OrderLngLat)
# ----------------------------------------------------------------------

_HILBERT_ORDER = 16  # 2^16 cells per axis -> 32-bit key


def hilbert_xy2d(x: int, y: int, order: int = _HILBERT_ORDER) -> int:
    rx = ry = 0
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        # rotate
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def hilbert_key(x: float, y: float, bounds=(-180.0, -90.0, 180.0, 90.0)) -> int:
    x0, y0, x1, y1 = bounds
    n = (1 << _HILBERT_ORDER) - 1
    fx = 0.0 if x1 == x0 else (min(max(x, x0), x1) - x0) / (x1 - x0)
    fy = 0.0 if y1 == y0 else (min(max(y, y0), y1) - y0) / (y1 - y0)
    return hilbert_xy2d(int(fx * n), int(fy * n))
