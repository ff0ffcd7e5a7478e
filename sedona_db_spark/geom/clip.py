"""General polygon boolean operations via the Martinez–Rueda–Feito
sweep-line algorithm (Martinez, Rueda, Feito: "A new algorithm for
computing Boolean operations on polygons", Computers & Geosciences 2009,
and the 2013 extension for overlapping edges).

Handles arbitrary simple polygons with holes and multipolygons —
including concave/concave pairs and collinear overlapping edges — in
O((n+k) log n).  This is the exact-overlay engine behind
ST_Intersection / ST_Union / ST_Difference / ST_SymDifference for
area/area inputs (reference parity: c/sedona-geos/src/overlay.rs, which
delegates to GEOS OverlayNG).

Implementation is from the published algorithm description; event/status
bookkeeping follows the paper's structure (sweep events with
in_out/other_in_out flags, edge-type labels for overlapping edges).
Ring reconstruction deviates from the paper: instead of partner-jump
event chaining (fragile at 4-valent crossing vertices), the labeled
result edges are assembled as a planar arrangement — angular half-edge
face walk, then an exact scanline parity test keeps the cycles bounding
the result region.  No epsilon offsets anywhere.
"""

from __future__ import annotations

import heapq

import numpy as np

from .core import Geom, GEOMETRYCOLLECTION, MULTIPOLYGON, POLYGON

# edge types (overlapping-edge extension)
_NORMAL, _NON_CONTRIBUTING, _SAME_TRANSITION, _DIFFERENT_TRANSITION = 0, 1, 2, 3
# operations
_INT, _UNION, _DIFF, _XOR = 0, 1, 2, 3
OPS = {"intersection": _INT, "union": _UNION, "difference": _DIFF, "xor": _XOR}

_next_id = 0


def _signed_area(p0, p1, p2) -> float:
    return (p0[0] - p2[0]) * (p1[1] - p2[1]) - (p1[0] - p2[0]) * (p0[1] - p2[1])


class _Event:
    __slots__ = ("p", "left", "other", "subject", "type", "in_out",
                 "other_in_out", "in_result", "pos", "id")

    def __init__(self, p, left, subject):
        global _next_id
        self.p = p                  # (x, y)
        self.left = left            # is left endpoint of its segment
        self.other = None           # partner event (other endpoint)
        self.subject = subject      # belongs to subject polygon
        self.type = _NORMAL
        self.in_out = False         # inside->outside transition of OWN polygon
        self.other_in_out = False   # same, for closest-below edge of OTHER polygon
        self.in_result = False
        self.pos = 0                # index in result event list
        self.id = _next_id          # creation order (deterministic tie-break)
        _next_id += 1

    def is_below(self, p) -> bool:
        if self.left:
            return _signed_area(self.p, self.other.p, p) > 0
        return _signed_area(self.other.p, self.p, p) > 0

    def is_above(self, p) -> bool:
        return not self.is_below(p)

    def is_vertical(self) -> bool:
        return self.p[0] == self.other.p[0]

    def __lt__(self, o):  # heapq ordering
        return _compare_events(self, o) < 0


def _compare_events(e1: _Event, e2: _Event) -> int:
    """Sweep order: by x, then y; right endpoints before left at the same
    point; at identical point+side, the lower segment first."""
    if e1 is e2:
        return 0
    if e1.p[0] != e2.p[0]:
        return 1 if e1.p[0] > e2.p[0] else -1
    if e1.p[1] != e2.p[1]:
        return 1 if e1.p[1] > e2.p[1] else -1
    if e1.left != e2.left:
        return 1 if e1.left else -1
    sa = _signed_area(e1.p, e1.other.p, e2.other.p)
    if sa != 0.0:
        return -1 if e1.is_below(e2.other.p) else 1
    if e1.subject != e2.subject:
        return -1 if e1.subject else 1
    return -1 if e1.id < e2.id else (0 if e1.id == e2.id else 1)


def _compare_segments(le1: _Event, le2: _Event) -> int:
    """Status-line order: which segment is lower at the sweep position."""
    if le1 is le2:
        return 0
    if (_signed_area(le1.p, le1.other.p, le2.p) != 0.0
            or _signed_area(le1.p, le1.other.p, le2.other.p) != 0.0):
        # not collinear
        if le1.p == le2.p:
            return -1 if le1.is_below(le2.other.p) else 1
        if le1.p[0] == le2.p[0]:
            return -1 if le1.p[1] < le2.p[1] else 1
        if _compare_events(le1, le2) == 1:     # le1 inserted after le2
            return -1 if le2.is_above(le1.p) else 1
        return -1 if le1.is_below(le2.p) else 1
    # collinear segments
    if le1.subject == le2.subject:
        if le1.p == le2.p and le1.other.p == le2.other.p:
            return 0
        return -1 if le1.id < le2.id else 1
    return -1 if _compare_events(le1, le2) == -1 else 1


def _segment_intersection(a1, a2, b1, b2):
    """0, 1 or 2 intersection points of closed segments (endpoint-snapped)."""
    vax, vay = a2[0] - a1[0], a2[1] - a1[1]
    vbx, vby = b2[0] - b1[0], b2[1] - b1[1]
    ex, ey = b1[0] - a1[0], b1[1] - a1[1]
    kross = vax * vby - vay * vbx
    if kross != 0.0:
        s = (ex * vby - ey * vbx) / kross
        if s < 0.0 or s > 1.0:
            return []
        t = (ex * vay - ey * vax) / kross
        if t < 0.0 or t > 1.0:
            return []
        if s == 0.0:
            return [a1]
        if s == 1.0:
            return [a2]
        if t == 0.0:
            return [b1]
        if t == 1.0:
            return [b2]
        return [(a1[0] + s * vax, a1[1] + s * vay)]
    # parallel
    if ex * vay - ey * vax != 0.0:
        return []                   # parallel, not collinear
    len2 = vax * vax + vay * vay
    if len2 == 0.0:
        return []                   # degenerate edge (filtered earlier)
    t0 = (ex * vax + ey * vay) / len2
    t1 = t0 + (vbx * vax + vby * vay) / len2
    tmin, tmax = (t0, t1) if t0 <= t1 else (t1, t0)
    lo, hi = max(0.0, tmin), min(1.0, tmax)
    if lo > hi:
        return []

    def pt(t):
        if t == 0.0:
            return a1
        if t == 1.0:
            return a2
        if t == t0:
            return b1
        if t == t1:
            return b2
        return (a1[0] + t * vax, a1[1] + t * vay)

    if lo == hi:
        return [pt(lo)]
    return [pt(lo), pt(hi)]


def _divide_segment(e: _Event, p, heap) -> None:
    """Split segment [e.p, e.other.p] at interior point p."""
    if p == e.p or p == e.other.p:
        return
    r = _Event(p, False, e.subject)
    l = _Event(p, True, e.subject)
    r.other = e
    l.other = e.other
    # rounding guard: the new left event must not sort after the right end
    if _compare_events(l, e.other) > 0:
        e.other.left = True
        l.left = False
    e.other.other = l
    e.other = r
    heapq.heappush(heap, l)
    heapq.heappush(heap, r)


def _possible_intersection(e1: _Event, e2: _Event, heap) -> int:
    inter = _segment_intersection(e1.p, e1.other.p, e2.p, e2.other.p)
    n = len(inter)
    if n == 0:
        return 0
    if n == 1 and (e1.p == e2.p or e1.other.p == e2.other.p):
        return 0                    # segments share an endpoint only
    if n == 2 and e1.subject == e2.subject:
        return 0                    # self-overlap within one polygon: ignore
    if n == 1:
        _divide_segment(e1, inter[0], heap)
        _divide_segment(e2, inter[0], heap)
        return 1
    # overlapping collinear segments from different polygons
    events = []
    left_coincide = e1.p == e2.p
    if not left_coincide:
        if _compare_events(e1, e2) == 1:
            events.extend((e2, e1))
        else:
            events.extend((e1, e2))
    right_coincide = e1.other.p == e2.other.p
    if not right_coincide:
        if _compare_events(e1.other, e2.other) == 1:
            events.extend((e2.other, e1.other))
        else:
            events.extend((e1.other, e2.other))
    if left_coincide:
        e2.type = _NON_CONTRIBUTING
        e1.type = (_SAME_TRANSITION if e2.in_out == e1.in_out
                   else _DIFFERENT_TRANSITION)
        if not right_coincide:
            _divide_segment(events[1].other, events[0].p, heap)
        return 2
    if right_coincide:
        _divide_segment(events[0], events[1].p, heap)
        return 3
    if events[0] is not events[3].other:
        # total overlap of distinct segments
        _divide_segment(events[0], events[1].p, heap)
        _divide_segment(events[1], events[2].p, heap)
        return 3
    # one segment fully contains the other
    _divide_segment(events[0], events[1].p, heap)
    _divide_segment(events[3].other, events[2].p, heap)
    return 3


def _in_result(e: _Event, op: int) -> bool:
    if e.type == _NORMAL:
        if op == _INT:
            return not e.other_in_out
        if op == _UNION:
            return e.other_in_out
        if op == _DIFF:
            return (e.subject and e.other_in_out) or \
                   (not e.subject and not e.other_in_out)
        return True                 # XOR
    if e.type == _SAME_TRANSITION:
        return op in (_INT, _UNION)
    if e.type == _DIFFERENT_TRANSITION:
        return op == _DIFF
    return False                    # NON_CONTRIBUTING


def _compute_fields(e: _Event, prev: _Event | None, op: int) -> None:
    if prev is None:
        e.in_out = False
        e.other_in_out = True
    elif e.subject == prev.subject:
        e.in_out = not prev.in_out
        e.other_in_out = prev.other_in_out
    else:
        e.in_out = not prev.other_in_out
        e.other_in_out = (not prev.in_out) if prev.is_vertical() else prev.in_out
    e.in_result = _in_result(e, op)


def _fill_events(polys, subject: bool, heap) -> None:
    for rings in polys:
        for ring in rings:
            r = np.asarray(ring, dtype=float)[:, :2]
            if len(r) and (r[0] != r[-1]).any():
                r = np.vstack([r, r[:1]])
            pts = [tuple(p) for p in r]
            for i in range(len(pts) - 1):
                p1, p2 = pts[i], pts[i + 1]
                if p1 == p2:
                    continue
                e1 = _Event(p1, False, subject)
                e2 = _Event(p2, False, subject)
                e1.other, e2.other = e2, e1
                if (p1[0], p1[1]) < (p2[0], p2[1]):
                    e1.left = True
                else:
                    e2.left = True
                heapq.heappush(heap, e1)
                heapq.heappush(heap, e2)


def _subdivide(heap, op: int, sub_xmax: float, min_xmax: float) -> list:
    """Sweep: process events, subdivide at intersections, label edges."""
    sl: list[_Event] = []           # status line, ordered by _compare_segments
    sorted_events: list[_Event] = []
    while heap:
        e = heapq.heappop(heap)
        if (op == _INT and e.p[0] > min_xmax) or \
           (op == _DIFF and e.p[0] > sub_xmax):
            break                   # nothing further can contribute
        sorted_events.append(e)
        if e.left:
            idx = len(sl)
            for i in range(len(sl)):
                if _compare_segments(e, sl[i]) < 0:
                    idx = i
                    break
            sl.insert(idx, e)
            prev = sl[idx - 1] if idx > 0 else None
            nxt = sl[idx + 1] if idx + 1 < len(sl) else None
            _compute_fields(e, prev, op)
            if nxt is not None and _possible_intersection(e, nxt, heap) == 2:
                _compute_fields(e, prev, op)
                _compute_fields(nxt, e, op)
            if prev is not None and _possible_intersection(prev, e, heap) == 2:
                pprev = sl[idx - 2] if idx - 1 > 0 else None
                _compute_fields(prev, pprev, op)
                _compute_fields(e, prev, op)
        else:
            le = e.other
            idx = -1
            for i, s in enumerate(sl):      # identity lookup
                if s is le:
                    idx = i
                    break
            if idx == -1:
                continue
            prev = sl[idx - 1] if idx > 0 else None
            nxt = sl[idx + 1] if idx + 1 < len(sl) else None
            sl.pop(idx)
            if prev is not None and nxt is not None:
                _possible_intersection(prev, nxt, heap)
    return sorted_events


def _face_cycles(edges: list) -> list:
    """Enumerate boundary cycles of the planar arrangement of `edges`
    (undirected, exact-float endpoint tuples) via angular half-edge
    traversal: next(u->v) = clockwise predecessor of (v->u) among v's
    outgoing half-edges.  Interior faces come out CCW (positive area),
    the unbounded face CW.  Each edge is used once per direction."""
    import math

    out: dict = {}                  # vertex -> sorted [(angle, edge_i, dir)]
    for i, (p, q) in enumerate(edges):
        out.setdefault(p, []).append((math.atan2(q[1] - p[1], q[0] - p[0]), i, 0))
        out.setdefault(q, []).append((math.atan2(p[1] - q[1], p[0] - q[0]), i, 1))
    pos = {}                        # (edge_i, dir) -> (vertex, index)
    for v, lst in out.items():
        lst.sort()
        for k, (_, i, d) in enumerate(lst):
            pos[(i, d)] = (v, k)
    cycles = []
    seen = set()
    for start in pos:
        if start in seen:
            continue
        cycle = []
        h = start
        guard = 2 * len(edges) + 4
        while guard > 0:
            guard -= 1
            seen.add(h)
            i, d = h
            p, q = edges[i]
            src, dst = (p, q) if d == 0 else (q, p)
            cycle.append(src)
            rev = (i, 1 - d)        # outgoing half-edge (dst -> src)
            v, k = pos[rev]
            lst = out[v]
            nxt = lst[(k - 1) % len(lst)]
            h = (nxt[1], nxt[2])
            if h == start:
                break
        if guard <= 0:
            raise ValueError("face traversal did not converge")
        cycle.append(cycle[0])
        cycles.append(cycle)
    return cycles


def _keep_result_cycles(cycles: list, edges: list) -> list:
    """Keep the cycles that bound the result region from the correct
    side: a cycle is kept iff the face adjacent to its leftmost boundary
    crossing (on the cycle's enclosed side) is inside the result — tested
    by exact even-odd crossing parity on a scanline that passes strictly
    between arrangement vertex levels (no epsilon offsets)."""
    levels = np.unique(np.array([y for p, q in edges for y in (p[1], q[1])]))
    kept = []
    for cycle in cycles:
        arr = np.asarray(cycle)
        sa = _ring_area(arr)
        if sa == 0.0:
            continue
        ymin, ymax = arr[:, 1].min(), arr[:, 1].max()
        inb = levels[(levels >= ymin) & (levels <= ymax)]
        if len(inb) < 2:
            continue
        y = 0.5 * (inb[0] + inb[1])

        def _crossings(edge_iter):
            xs = []
            for p, q in edge_iter:
                if p > q:
                    p, q = q, p     # canonical direction: bit-identical x
                if (p[1] <= y) != (q[1] <= y):
                    xs.append(p[0] + (y - p[1]) / (q[1] - p[1]) * (q[0] - p[0]))
            return xs

        xs_all = _crossings(edges)
        xs_cyc = _crossings((tuple(arr[k]), tuple(arr[k + 1]))
                            for k in range(len(arr) - 1))
        if not xs_cyc:
            continue
        x_c = min(xs_cyc)
        rank = sum(1 for x in xs_all if x < x_c)
        inside_is_in = (rank + 1) % 2 == 1
        if inside_is_in == (sa > 0.0):
            kept.append(cycle)
    return kept


def _reconstruct(sorted_events: list) -> Geom:
    """Result events -> polygon(s): face walk + parity classification."""
    edges = [(e.p, e.other.p) for e in sorted_events
             if e.left and e.in_result and e.p != e.other.p]
    if not edges:
        return Geom(GEOMETRYCOLLECTION, [])
    cycles = _face_cycles(edges)
    return _assemble(_keep_result_cycles(cycles, edges))


def _ring_area(r: np.ndarray) -> float:
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))


def _pt_in_ring(p, r: np.ndarray) -> bool:
    """Even-odd ray cast, boundary-agnostic (rep points are interior)."""
    x, y = p
    x0, y0 = r[:-1, 0], r[:-1, 1]
    x1, y1 = r[1:, 0], r[1:, 1]
    cond = (y0 <= y) != (y1 <= y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xi = x0 + (y - y0) / (y1 - y0) * (x1 - x0)
    return bool(np.count_nonzero(cond & (x < xi)) % 2)


def _ring_rep(r: np.ndarray):
    """A point ON ring r for ring-in-ring containment tests: the midpoint
    of its first non-degenerate edge.  Kept cycles never share edges (an
    in-result edge bounds the result region exactly once), so this point
    cannot lie on another kept ring except at touch vertices — unlike an
    interior sample, which can fall inside a sibling hole."""
    for k in range(len(r) - 1):
        if r[k, 0] != r[k + 1, 0] or r[k, 1] != r[k + 1, 1]:
            return (0.5 * (r[k, 0] + r[k + 1, 0]),
                    0.5 * (r[k, 1] + r[k + 1, 1]))
    return (float(r[0, 0]), float(r[0, 1]))


def _assemble(rings: list) -> Geom:
    """Closed rings -> POLYGON/MULTIPOLYGON via even-odd nesting."""
    arrs = []
    for ring in rings:
        a = np.asarray(ring, dtype=float)
        if len(a) >= 4 and abs(_ring_area(a)) > 0.0:
            arrs.append(a)
    if not arrs:
        return Geom(GEOMETRYCOLLECTION, [])
    reps = [_ring_rep(a) for a in arrs]
    depth = []
    for i, rp in enumerate(reps):
        d = sum(1 for j, a in enumerate(arrs) if j != i and _pt_in_ring(rp, a))
        depth.append(d)
    shells = [i for i in range(len(arrs)) if depth[i] % 2 == 0]
    holes = [i for i in range(len(arrs)) if depth[i] % 2 == 1]
    # GEOS output convention (reference c/sedona-geos/src/st_unaryunion.rs
    # asserts the CW sequence byte-for-byte): shells clockwise, holes
    # counter-clockwise; reversing a closed ring keeps its start vertex
    def orient(a, cw):
        return a[::-1] if (_ring_area(a) > 0) == cw else a
    # assign each hole to the innermost (deepest) shell containing it
    polys = {i: [orient(arrs[i], True)] for i in shells}
    for h in holes:
        best, best_depth = None, -1
        for s in shells:
            if _pt_in_ring(reps[h], arrs[s]) and depth[s] > best_depth:
                best, best_depth = s, depth[s]
        if best is not None:
            polys[best].append(orient(arrs[h], False))
    out = [polys[s] for s in sorted(polys)]
    if len(out) == 1:
        return Geom(POLYGON, out[0])
    return Geom(MULTIPOLYGON, out)


def _bbox(polys):
    lo = np.array([np.inf, np.inf])
    hi = np.array([-np.inf, -np.inf])
    for rings in polys:
        for ring in rings:
            r = np.asarray(ring, dtype=float)[:, :2]
            if len(r):
                lo = np.minimum(lo, r.min(axis=0))
                hi = np.maximum(hi, r.max(axis=0))
    return lo, hi


def polygon_boolean(a: Geom, b: Geom, op: str) -> Geom:
    """Boolean overlay of two polygonal Geoms (POLYGON / MULTIPOLYGON /
    polygon-bearing collections).  op in OPS."""
    opc = OPS[op]
    subject = [list(p) for p in a.polygons()]
    clipping = [list(p) for p in b.polygons()]
    if not subject:
        if opc in (_UNION, _XOR):
            return _assemble_input(clipping)
        return Geom(GEOMETRYCOLLECTION, [])
    if not clipping:
        if opc == _INT:
            return Geom(GEOMETRYCOLLECTION, [])
        return _assemble_input(subject)
    slo, shi = _bbox(subject)
    clo, chi = _bbox(clipping)
    if (shi < clo).any() or (chi < slo).any():
        # disjoint extents
        if opc == _INT:
            return Geom(GEOMETRYCOLLECTION, [])
        if opc == _DIFF:
            return _assemble_input(subject)
        return _assemble_input(subject + clipping)
    heap: list = []
    _fill_events(subject, True, heap)
    _fill_events(clipping, False, heap)
    sorted_events = _subdivide(heap, opc, float(shi[0]),
                               float(min(shi[0], chi[0])))
    return _reconstruct(sorted_events)


def _assemble_input(polys) -> Geom:
    out = [[np.asarray(r, dtype=float)[:, :2] for r in rings]
           for rings in polys]
    if not out:
        return Geom(GEOMETRYCOLLECTION, [])
    if len(out) == 1:
        return Geom(POLYGON, out[0])
    return Geom(MULTIPOLYGON, out)
