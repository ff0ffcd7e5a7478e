"""Globally-exact spherical predicates on unit-sphere geometry.

The gnomonic reduction in functions/geography.py is exact only for inputs
contained in a single hemisphere (great-circle arcs map to straight lines
inside the tangent hemisphere; beyond it the projection folds).  This
module provides the global path used when inputs exceed a hemisphere:

- vertices become 3-D unit vectors;
- edge/edge crossing is the S2 ``SimpleCrossing`` construction — four
  sign-of-triple-product tests (reference evaluates the same predicates on
  S2 shapes, c/sedona-s2geography/src/kernels.rs:38-138);
- point-in-ring is winding-angle based with the *smaller-region* interior
  convention (a simple ring divides the sphere in two; the region with
  area < 2*pi steradians is the interior — matches the planar-sourced
  data model and PostGIS geography expectations, orientation-ignored);
- signed ring area comes from the van Oosterom-Strackee solid-angle
  formula summed over a fan (Girard excess, vectorized).

Supported here: intersects / contains / within / covers / covered_by for
every POINT/LINESTRING/POLYGON (+multi/collection) combination.  The
finer DE-9IM relations (touches/crosses/overlaps/equals) and overlay
construction still require the hemisphere gnomonic path and raise
``HemisphereError`` beyond it rather than silently folding.

Point classification is winding-based with an edge-crossing-parity
fallback for the antipodal-pair case (a point whose antipode shares its
region has winding ~0; parity against a reference point epsilon-left of
a ring edge decides it) — this closed the former known limit where
hemisphere-spanning rings misclassified exactly those points.
"""

from __future__ import annotations

import numpy as np

from sedona_db_spark.geom.core import (
    GEOMETRYCOLLECTION, LINESTRING, MULTILINESTRING, MULTIPOINT,
    MULTIPOLYGON, POINT, POLYGON, Geom)

_EPS_ANG = 1e-9          # angular tolerance (radians) for on-boundary
_EPS_DET = 1e-15         # triple-product zero threshold


class HemisphereError(NotImplementedError):
    """Inputs exceed one hemisphere and the requested operation has no
    global path yet.  Raised instead of returning a folded (wrong)
    gnomonic answer — wrong-answer-silently is the worst failure mode."""


def xyz_of(coords: np.ndarray) -> np.ndarray:
    """(n, >=2) lon/lat degrees -> (n, 3) unit vectors."""
    lam = np.radians(np.asarray(coords, dtype=np.float64)[:, 0])
    phi = np.radians(np.asarray(coords, dtype=np.float64)[:, 1])
    return np.column_stack([np.cos(phi) * np.cos(lam),
                            np.cos(phi) * np.sin(lam),
                            np.sin(phi)])


def _det3(a, b, c):
    """Triple product det[a; b; c] with numpy broadcasting."""
    return np.sum(np.cross(a, b) * c, axis=-1)


def simple_crossing(a, b, c, d) -> np.ndarray:
    """True where arc (a,b) and arc (c,d) cross at an interior point.

    S2 SimpleCrossing: all four triple products must share a sign.
    Shapes broadcast; shared endpoints / tangencies return False (they
    are handled by the on-arc tests)."""
    ab = np.cross(a, b)
    acb = -np.sum(ab * c, axis=-1)
    bda = np.sum(ab * d, axis=-1)
    cd = np.cross(c, d)
    cbd = -np.sum(cd * b, axis=-1)
    dac = np.sum(cd * a, axis=-1)
    return ((acb * bda > _EPS_DET) & (acb * cbd > _EPS_DET)
            & (acb * dac > _EPS_DET))


def on_arc(p, a, b) -> np.ndarray:
    """True where point p lies on the (minor) arc a->b, endpoints
    included.  p broadcasts against edge arrays.

    Betweenness uses tangent-plane SIGNS (sin of the along-arc offset
    past each endpoint), not the angle-sum form: arccos near an endpoint
    loses ~1.5e-8 rad to rounding (a 1-ulp dot error maps to ~10 cm), so
    the angle-sum test at _EPS_ANG rejected bit-exact ring vertices and
    boundary classification fell through to winding noise."""
    n = np.cross(a, b)
    nn = np.linalg.norm(n, axis=-1)
    degenerate = nn < 1e-15          # a == b (or antipodal): treat as point
    with np.errstate(invalid="ignore", divide="ignore"):
        n_hat = n / np.where(nn, nn, 1.0)[..., None]
        off_plane = np.abs(np.sum(n_hat * p, axis=-1))
    # sin of arc position past a (toward b) / before b (toward a); exact
    # endpoints give 0 — well-conditioned where arccos is not
    s_a = np.sum(np.cross(n_hat, a) * p, axis=-1)
    s_b = np.sum(np.cross(b, n_hat) * p, axis=-1)
    within = (s_a >= -_EPS_ANG) & (s_b >= -_EPS_ANG)
    ang = lambda u, v: np.arccos(np.clip(np.sum(u * v, axis=-1), -1, 1))  # noqa: E731
    same_as_a = ang(a, p) < _EPS_ANG
    return np.where(degenerate, same_as_a,
                    (off_plane < _EPS_ANG) & within)


def ring_edges(ring_xyz: np.ndarray):
    """(a, b) edge endpoint arrays for a closed ring (last == first not
    required; closure edge added when missing)."""
    r = ring_xyz
    if len(r) and np.linalg.norm(r[0] - r[-1]) > 1e-12:
        r = np.vstack([r, r[:1]])
    return r[:-1], r[1:]


def fan_area(ring_xyz: np.ndarray) -> float:
    """Signed enclosed area (mod 4*pi, mapped to (-2*pi, 2*pi)) via the
    van Oosterom-Strackee signed solid angle summed over a fan from v0.
    Positive => the LEFT region of the traversal is the smaller one."""
    a, b = ring_edges(ring_xyz)
    v0 = ring_xyz[0]
    det = _det3(np.broadcast_to(v0, a.shape), a, b)
    denom = (1.0 + a @ v0 + b @ v0 + np.sum(a * b, axis=-1))
    return float(np.sum(2.0 * np.arctan2(det, denom)))


def left_smaller(ring_xyz: np.ndarray) -> bool:
    """True when the region on the LEFT of the traversal is the smaller
    of the two regions the ring bounds.

    Computed from the EXACT Girard turning-angle excess (the same
    construction as geography.spherical_ring_area_m2): the area of the
    left region is (2*pi - sum of signed exterior turn angles) mod 4*pi,
    which is exact for great-circle edges of ANY length.  The former
    lon/lat trapezoid line integral was only a rhumb-ish approximation
    and flipped the interior convention on ~11% of random triangles
    with edges over ~90 deg (advisor-found regression, round 6); the
    van Oosterom fan sum is only defined mod 4*pi and fails on
    hemisphere-spanning bands — fan_area remains only as the fallback
    when a vertex has degenerate tangents (antipodal neighbours)."""
    r = ring_xyz
    if len(r) and np.linalg.norm(r[0] - r[-1]) > 1e-12:
        r = np.vstack([r, r[:1]])
    v = r[:-1]
    if len(v) >= 1:
        keep = np.ones(len(v), dtype=bool)
        keep[1:] = np.linalg.norm(np.diff(v, axis=0), axis=1) > 1e-14
        v = v[keep]
    if len(v) < 3:
        return fan_area(ring_xyz) > 0
    prev = np.roll(v, 1, axis=0)
    nxt = np.roll(v, -1, axis=0)
    t_in = np.cross(np.cross(prev, v), v)
    t_out = np.cross(np.cross(v, nxt), v)
    ni = np.linalg.norm(t_in, axis=1)
    no = np.linalg.norm(t_out, axis=1)
    if np.any(ni <= 1e-14) or np.any(no <= 1e-14):
        # antipodal neighbours: tangent undefined -> legacy fan fallback
        return fan_area(ring_xyz) > 0
    t_in = t_in / ni[:, None]
    t_out = t_out / no[:, None]
    sin_t = np.einsum("ij,ij->i", np.cross(t_in, t_out), v)
    cos_t = np.einsum("ij,ij->i", t_in, t_out)
    turns = np.arctan2(sin_t, cos_t)
    left_area = (2.0 * np.pi - float(np.sum(turns))) % (4.0 * np.pi)
    return left_area < 2.0 * np.pi


def winding(p: np.ndarray, ring_xyz: np.ndarray) -> float:
    """Total azimuth angle swept by the ring around p (radians):
    +-2*pi when p and its antipode lie in different regions (sign says
    which side), ~0 when they share a region."""
    k = np.array([0.0, 0.0, 1.0])
    if abs(float(p @ k)) > 0.99:
        k = np.array([0.0, 1.0, 0.0])
    ex = np.cross(k, p)
    ex /= np.linalg.norm(ex)
    ey = np.cross(p, ex)
    r = ring_xyz
    if len(r) and np.linalg.norm(r[0] - r[-1]) > 1e-12:
        r = np.vstack([r, r[:1]])
    az = np.arctan2(r @ ey, r @ ex)
    d = np.diff(az)
    d = (d + np.pi) % (2.0 * np.pi) - np.pi
    return float(np.sum(d))


def classify_point_ring(p: np.ndarray, ring_xyz: np.ndarray,
                        ring_fan: float | None = None) -> int:
    """+1 p strictly inside the ring's smaller region, 0 on the
    boundary, -1 outside."""
    a, b = ring_edges(ring_xyz)
    if len(a) == 0:
        return -1
    if bool(np.any(on_arc(p, a, b))):
        return 0
    smaller_is_left = left_smaller(ring_xyz) if ring_fan is None \
        else ring_fan > 0
    w = winding(p, ring_xyz)
    if abs(w) > np.pi:                       # p / antipode separated
        in_left = w > 0
        return 1 if in_left == smaller_is_left else -1
    # p and its antipode share a region (winding ~ 0): decide by edge-
    # crossing parity against a reference point epsilon-left of a ring
    # edge.  This closes the former known limit where a large ring whose
    # smaller region contains an antipodal point pair misclassified
    # exactly those points (the full-sphere overlay lives in that regime).
    in_left = _in_left_by_parity(p, ring_xyz)
    if in_left is None:
        return -1                            # degenerate ring: outside
    return 1 if in_left == smaller_is_left else -1


def _crossing_unit(p, r, c, d) -> np.ndarray:
    """``simple_crossing`` for the parity probe arc with unit-normalized
    arc normals: the four-sign pattern is identical, but the magnitude
    gate becomes scale-free.  The absolute ``_EPS_DET`` gate swallowed
    GENUINE crossings on sub-milliradian rings (triple products scale
    with edge-length x arc-length x separation ~ 1e-16 there), flipping
    the parity fallback's verdict for points near tiny polygons."""
    ab = np.cross(p, r)
    nab = np.linalg.norm(ab, axis=-1, keepdims=True)
    ab = ab / np.where(nab > 0, nab, 1.0)
    cd = np.cross(c, d)
    ncd = np.linalg.norm(cd, axis=-1, keepdims=True)
    cd = cd / np.where(ncd > 0, ncd, 1.0)
    acb = -np.sum(ab * c, axis=-1)
    bda = np.sum(ab * d, axis=-1)
    cbd = -np.sum(cd * r, axis=-1)
    dac = np.sum(cd * p, axis=-1)
    return ((acb * bda > _EPS_DET) & (acb * cbd > _EPS_DET)
            & (acb * dac > _EPS_DET))


def _in_left_by_parity(p: np.ndarray, ring_xyz: np.ndarray):
    """True/False: is p in the LEFT region of the (closed, simple) ring?
    Counts great-circle arc crossings from p to a point just left of a
    ring edge (the parity flips once per boundary crossing).  Tries
    several reference edges for robustness against near-degenerate
    crossing tests; None when no usable reference edge exists."""
    a, b = ring_edges(ring_xyz)
    n_edges = len(a)
    step = max(n_edges // 3, 1)
    for k in list(range(0, n_edges, step))[:5]:
        m = a[k] + b[k]
        nm = np.linalg.norm(m)
        n = np.cross(a[k], b[k])
        nn = np.linalg.norm(n)
        if nm < 1e-9 or nn < 1e-12:
            continue
        m = m / nm
        # walking a->b on the outside of the sphere, LEFT is the a x b
        # direction at the edge midpoint; the nudge scales with the edge
        # (a fixed 1e-5 rad ~ 64 m overshoots sub-100 m rings entirely,
        # putting the reference point OUTSIDE and inverting the parity)
        r = m + min(1e-5, 0.25 * nn) * (n / nn)
        r = r / np.linalg.norm(r)
        if float(p @ r) < -1.0 + 1e-12:      # p ~ antipodal to r: arc undefined
            continue
        cr = _crossing_unit(p[None, :], r[None, :], a, b)
        cnt = int(np.sum(cr))
        # reject references where the probe arc grazes a ring vertex (an
        # endpoint touch is not counted by simple_crossing and would
        # silently flip parity)
        if bool(np.any(on_arc(ring_xyz, p[None, :], r[None, :]))):
            continue
        return cnt % 2 == 0
    return None


def winding_batch(P: np.ndarray, ring_xyz: np.ndarray) -> np.ndarray:
    """Vectorized ``winding`` over P (n, 3) -> (n,) radians.

    Decision-equivalent to the scalar: same per-point tangent-basis
    choice (z axis unless |p_z| > 0.99, then y), same azimuth wrap
    arithmetic, same per-point summation order down the ring.  The only
    numeric difference is BLAS matmul vs matvec rounding, orders of
    magnitude below the ±2*pi-vs-~0 decision gap."""
    r = ring_xyz
    if len(r) and np.linalg.norm(r[0] - r[-1]) > 1e-12:
        r = np.vstack([r, r[:1]])
    n = len(P)
    k = np.zeros((n, 3))
    k[:, 2] = 1.0
    k[np.abs(P[:, 2]) > 0.99] = (0.0, 1.0, 0.0)
    ex = np.cross(k, P)
    ex /= np.linalg.norm(ex, axis=1, keepdims=True)
    ey = np.cross(P, ex)
    az = np.arctan2(r @ ey.T, r @ ex.T)          # (m+1, n)
    d = np.diff(az, axis=0)
    d = (d + np.pi) % (2.0 * np.pi) - np.pi
    return np.sum(d, axis=0)


def _on_any_arc_batch(P: np.ndarray, a: np.ndarray, b: np.ndarray,
                      budget: int = 4_000_000) -> np.ndarray:
    """any(on_arc(p, a, b)) per row of P, chunked so the (rows x edges)
    broadcast stays within a fixed element budget."""
    n, m = len(P), len(a)
    out = np.zeros(n, dtype=bool)
    if m == 0 or n == 0:
        return out
    rows = max(1, budget // m)
    for i0 in range(0, n, rows):
        sl = slice(i0, min(n, i0 + rows))
        out[sl] = np.any(on_arc(P[sl][:, None, :], a[None, :, :],
                                b[None, :, :]), axis=1)
    return out


def _in_left_by_parity_batch(P: np.ndarray, ring_xyz: np.ndarray):
    """Vectorized ``_in_left_by_parity`` -> (in_left (n,), valid (n,)).

    Same reference-edge sequence and same first-usable-reference rule as
    the scalar (the outer loop walks k in the scalar's order and only
    fills still-unresolved points), so every resolved point gets the
    verdict of exactly the reference edge the scalar would have used;
    valid=False mirrors the scalar's None."""
    a, b = ring_edges(ring_xyz)
    n_edges = len(a)
    n = len(P)
    in_left = np.zeros(n, dtype=bool)
    valid = np.zeros(n, dtype=bool)
    if n == 0 or n_edges == 0:
        return in_left, valid
    step = max(n_edges // 3, 1)
    for k in list(range(0, n_edges, step))[:5]:
        todo = np.nonzero(~valid)[0]
        if len(todo) == 0:
            break
        m = a[k] + b[k]
        nm = np.linalg.norm(m)
        nrm = np.cross(a[k], b[k])
        nn = np.linalg.norm(nrm)
        if nm < 1e-9 or nn < 1e-12:
            continue
        m = m / nm
        # same edge-scaled nudge as the scalar (decision equivalence)
        r = m + min(1e-5, 0.25 * nn) * (nrm / nn)
        r = r / np.linalg.norm(r)
        sub = P[todo]
        ok = sub @ r >= -1.0 + 1e-12        # p ~ antipodal to r: undefined
        # probe arc p->r grazing a ring vertex would silently flip parity
        graze = np.any(on_arc(ring_xyz[None, :, :], sub[:, None, :],
                              r[None, None, :]), axis=1)
        usable = ok & ~graze
        if not usable.any():
            continue
        cr = _crossing_unit(sub[usable][:, None, :], r[None, None, :],
                            a[None, :, :], b[None, :, :])
        hit = todo[usable]
        in_left[hit] = (np.sum(cr, axis=1) % 2) == 0
        valid[hit] = True
    return in_left, valid


def classify_points_ring_batch(P: np.ndarray,
                               ring_xyz: np.ndarray) -> np.ndarray:
    """Vectorized ``classify_point_ring`` over P (n, 3) -> int8 (n,) of
    +1 / 0 / -1.  Same decision procedure as the scalar — on-arc
    boundary first, winding where it separates p from its antipode,
    edge-crossing parity fallback otherwise — with ``left_smaller``
    computed once per ring instead of once per pair (the per-pair cost
    that dominated geography relation-join refines; the reference pays
    this classification in S2's C++ loops,
    c/sedona-s2geography/src/kernels.rs:68-72)."""
    n = len(P)
    out = np.full(n, -1, dtype=np.int8)
    a, b = ring_edges(ring_xyz)
    if len(a) == 0 or n == 0:
        return out
    onb = _on_any_arc_batch(P, a, b)
    smaller_is_left = left_smaller(ring_xyz)
    w = winding_batch(P, ring_xyz)
    sep = np.abs(w) > np.pi
    out[sep & ((w > 0) == smaller_is_left)] = 1
    need = ~onb & ~sep
    if need.any():
        idx = np.nonzero(need)[0]
        in_left, valid = _in_left_by_parity_batch(P[idx], ring_xyz)
        res = np.where(in_left == smaller_is_left, 1, -1).astype(np.int8)
        res[~valid] = -1
        out[idx] = res
    out[onb] = 0
    return out


def classify_points_poly_batch(P: np.ndarray,
                               rings_xyz: list[np.ndarray]) -> np.ndarray:
    """Vectorized ``classify_point_poly`` (outer ring minus holes).
    Hole precedence matches the scalar: a point on a hole boundary is 0,
    inside a hole is -1, and later holes are not consulted once one has
    claimed the point."""
    n = len(P)
    if not rings_xyz:
        return np.full(n, -1, dtype=np.int8)
    c = classify_points_ring_batch(P, rings_xyz[0])
    inside = c > 0
    for hole in rings_xyz[1:]:
        idx = np.nonzero(inside)[0]
        if len(idx) == 0:
            break
        hc = classify_points_ring_batch(P[idx], hole)
        c[idx[hc == 0]] = 0
        c[idx[hc > 0]] = -1
        inside[idx] = hc < 0
    return c


def classify_point_poly(p: np.ndarray, rings_xyz: list[np.ndarray]) -> int:
    """+1 interior of (outer minus holes), 0 boundary, -1 outside."""
    if not rings_xyz:
        return -1
    c = classify_point_ring(p, rings_xyz[0])
    if c <= 0:
        return c
    for hole in rings_xyz[1:]:
        hc = classify_point_ring(p, hole)
        if hc == 0:
            return 0
        if hc > 0:
            return -1
    return 1


# ----------------------------------------------------------------------
# geometry decomposition
# ----------------------------------------------------------------------

def _parts(g: Geom):
    """(points_xyz(list of (3,)), lines_xyz(list of (n,3)),
    polys_xyz(list of [rings]))."""
    pts = [xyz_of(np.asarray(p, dtype=np.float64).reshape(1, -1))[0]
           for p in g.points()]
    lines = [xyz_of(l) for l in g.lines() if len(l) > 0]
    polys = [[xyz_of(r) for r in rings if len(r) > 0]
             for rings in g.polygons()]
    return pts, lines, [pl for pl in polys if pl]


def _all_edges(lines, polys):
    """Concatenate every edge of lines + polygon rings -> (a, b)."""
    segs_a, segs_b = [], []
    for l in lines:
        if len(l) >= 2:
            segs_a.append(l[:-1]); segs_b.append(l[1:])
    for rings in polys:
        for r in rings:
            a, b = ring_edges(r)
            if len(a):
                segs_a.append(a); segs_b.append(b)
    if not segs_a:
        z = np.zeros((0, 3))
        return z, z
    return np.concatenate(segs_a), np.concatenate(segs_b)


def _point_touches(g_pts, g_lines, g_polys, p) -> bool:
    """p intersects the closure of the decomposed geometry."""
    for q in g_pts:
        if float(q @ p) > 1.0 - _EPS_ANG * _EPS_ANG / 2:
            if np.arccos(np.clip(float(q @ p), -1, 1)) < _EPS_ANG:
                return True
    a, b = _all_edges(g_lines, [])
    if len(a) and bool(np.any(on_arc(p, a, b))):
        return True
    for rings in g_polys:
        if classify_point_poly(p, rings) >= 0:
            return True
    return False


def _any_cross(lines1, polys1, lines2, polys2) -> bool:
    a, b = _all_edges(lines1, polys1)
    c, d = _all_edges(lines2, polys2)
    if len(a) == 0 or len(c) == 0:
        return False
    # outer broadcast (m x n); contract-scale pair batches stay small —
    # join operators bound candidates long before this kernel runs
    A = a[:, None, :]; B = b[:, None, :]
    C = c[None, :, :]; D = d[None, :, :]
    return bool(np.any(simple_crossing(A, B, C, D)))


def intersects_exact(g1: Geom, g2: Geom) -> bool:
    """Global spherical intersects for any point/line/polygon combo."""
    p1, l1, po1 = _parts(g1)
    p2, l2, po2 = _parts(g2)
    for p in p1:
        if _point_touches(p2, l2, po2, p):
            return True
    for p in p2:
        if _point_touches(p1, l1, po1, p):
            return True
    # vertex-in-other (covers line-in-poly, poly-in-poly, shared verts)
    for l in l1:
        for v in l:
            if _point_touches([], l2, po2, v):
                return True
    for l in l2:
        for v in l:
            if _point_touches([], l1, po1, v):
                return True
    for rings in po1:
        for v in rings[0]:
            if _point_touches([], l2, po2, v):
                return True
    for rings in po2:
        for v in rings[0]:
            if _point_touches([], l1, po1, v):
                return True
    return _any_cross(l1, po1, l2, po2)


def _probe_points(g_pts, g_lines, g_polys):
    """Representative test points: vertices + edge midpoints (+ ring
    midpoints).  Midpoints catch a chord that exits between two boundary
    touches."""
    out = list(g_pts)
    a, b = _all_edges(g_lines, g_polys)
    for arr in g_lines:
        out.extend(arr)
    for rings in g_polys:
        for r in rings:
            out.extend(r)
    if len(a):
        mids = a + b
        nrm = np.linalg.norm(mids, axis=-1, keepdims=True)
        ok = nrm[:, 0] > 1e-12
        mids = mids[ok] / nrm[ok]
        out.extend(mids)
    return out


def covers_exact(gA: Geom, gB: Geom) -> bool:
    """Every point of gB lies in the closure of gA (global spherical)."""
    pA, lA, poA = _parts(gA)
    pB, lB, poB = _parts(gB)
    if poB and not poA:
        return False                     # area can't fit in lines/points
    if lB and not (lA or poA):
        return False
    for p in _probe_points(pB, lB, poB):
        if not _point_touches(pA, lA, poA, p):
            return False
    # a proper boundary crossing means part of B escapes A
    if _any_cross(lB, poB, lA, poA):
        return False
    # a hole of A poking into a polygon of B breaks coverage
    for ringsA in poA:
        for hole in ringsA[1:]:
            ha, hb = ring_edges(hole)
            if len(ha) == 0:
                continue
            hm = ha[0] + hb[0]
            n = np.linalg.norm(hm)
            if n < 1e-12:
                continue
            hm = hm / n
            for ringsB in poB:
                if classify_point_poly(hm, ringsB) > 0 and \
                        classify_point_poly(hm, ringsA) < 0:
                    return False
    return True


def contains_exact(gA: Geom, gB: Geom) -> bool:
    """covers + at least one point of gB interior to gA (planar-style
    contains where a boundary-only relationship is excluded)."""
    if not covers_exact(gA, gB):
        return False
    pA, lA, poA = _parts(gA)
    pB, lB, poB = _parts(gB)
    if poA:
        for p in _probe_points(pB, lB, poB):
            if any(classify_point_poly(p, rings) > 0 for rings in poA):
                return True
        return False
    if lA:          # line contains line/point: interior = non-endpoint
        for p in _probe_points(pB, lB, poB):
            a, b = _all_edges(lA, [])
            hit = on_arc(p, a, b)
            if bool(np.any(hit)):
                ends = np.concatenate([a[:1], b[-1:]])
                if not any(np.arccos(np.clip(float(e @ p), -1, 1)) < _EPS_ANG
                           for e in ends):
                    return True
        return bool(pB) and not lB and not poB
    return covers_exact(gA, gB)          # point covers point


def within_exact(gA: Geom, gB: Geom) -> bool:
    return contains_exact(gB, gA)


def covered_by_exact(gA: Geom, gB: Geom) -> bool:
    return covers_exact(gB, gA)


EXACT_PREDICATES = {
    "intersects": intersects_exact,
    "contains": contains_exact,
    "within": within_exact,
    "covers": covers_exact,
    "covered_by": covered_by_exact,
}


# ----------------------------------------------------------------------
# exact great-circle minimum distance (point-to-arc closest pair)
# ----------------------------------------------------------------------

def _angles(u, v):
    """Angular distance(s) between unit vectors (broadcasting, stable
    near 0 and pi via atan2 of cross/dot)."""
    cr = np.linalg.norm(np.cross(u, v), axis=-1)
    dt = np.sum(u * v, axis=-1)
    return np.arctan2(cr, dt)


def _pts_to_arc(V, a, b):
    """Min angular distance from each row of V (n,3) to the minor arc
    a->b, exact: foot-of-perpendicular when it falls on the arc, else the
    nearer endpoint.  Returns (dists (n,), points (n,3))."""
    n = np.cross(a, b)
    nn = np.linalg.norm(n)
    da = _angles(V, a)
    db = _angles(V, b)
    ends = np.where((da <= db)[:, None], np.broadcast_to(a, V.shape),
                    np.broadcast_to(b, V.shape))
    dends = np.minimum(da, db)
    if nn < 1e-15:
        return dends, ends
    nh = n / nn
    dot = V @ nh
    C = V - np.outer(dot, nh)
    Cn = np.linalg.norm(C, axis=1)
    ok = Cn > 1e-15
    C[ok] = C[ok] / Cn[ok][:, None]
    foot_on = ok & on_arc(C, a, b)
    d_foot = np.abs(np.arcsin(np.clip(dot, -1.0, 1.0)))
    dists = np.where(foot_on, d_foot, dends)
    pts = np.where(foot_on[:, None], C, ends)
    return dists, pts


def _shared_point(g1: Geom, g2: Geom) -> np.ndarray:
    """An actual point common to both geometries (assumes they intersect).

    Mirrors the detection order of intersects_exact — a vertex of one
    touching the other, else a great-circle edge-edge crossing point — so
    whenever intersects_exact is True a genuine witness exists here."""
    p1, l1, po1 = _parts(g1)
    p2, l2, po2 = _parts(g2)
    for p in p1:
        if _point_touches(p2, l2, po2, p):
            return p
    for p in p2:
        if _point_touches(p1, l1, po1, p):
            return p
    for l in l1:
        for v in l:
            if _point_touches([], l2, po2, v):
                return v
    for l in l2:
        for v in l:
            if _point_touches([], l1, po1, v):
                return v
    for rings in po1:
        for v in rings[0]:
            if _point_touches([], l2, po2, v):
                return v
    for rings in po2:
        for v in rings[0]:
            if _point_touches([], l1, po1, v):
                return v
    # proper interior crossing: intersect the two great circles and pick
    # the hemisphere candidate that lies on both arcs
    a, b = _all_edges(l1, po1)
    c, d = _all_edges(l2, po2)
    if len(a) and len(c):
        A = a[:, None, :]; B = b[:, None, :]
        C = c[None, :, :]; D = d[None, :, :]
        hits = np.argwhere(simple_crossing(A, B, C, D))
        for i, j in hits:
            x = np.cross(np.cross(a[i], b[i]), np.cross(c[j], d[j]))
            n = np.linalg.norm(x)
            if n < 1e-15:
                continue
            x = x / n
            for cand in (x, -x):
                if bool(on_arc(cand, a[i:i + 1], b[i:i + 1])[0]) and \
                        bool(on_arc(cand, c[j:j + 1], d[j:j + 1])[0]):
                    return cand
    # unreachable when intersects_exact held; degrade to a vertex
    ac = g1.all_coords()
    return xyz_of(ac[:1, :2])[0] if len(ac) else np.array([1.0, 0, 0])


def closest_pair_rad(g1: Geom, g2: Geom):
    """Exact spherical closest pair: (angle_rad, p1_xyz, p2_xyz).

    angle 0 with p1=p2=an actual shared point when the geometries
    intersect (exact predicate); otherwise the minimum over
    vertex-to-arc projections in both directions (which subsumes
    vertex-vertex).  This is the true great-circle geometry distance the
    reference gets from S2 (c/sedona-s2geography), replacing the
    vertex-only approximation."""
    if intersects_exact(g1, g2):
        p = _shared_point(g1, g2)
        return 0.0, p, p
    V1 = xyz_of(g1.all_coords()[:, :2])
    V2 = xyz_of(g2.all_coords()[:, :2])
    p1_pts, l1, po1 = _parts(g1)
    p2_pts, l2, po2 = _parts(g2)
    A1, B1 = _all_edges(l1, po1)
    A2, B2 = _all_edges(l2, po2)
    best = np.inf
    bp1 = V1[0] if len(V1) else np.array([1.0, 0, 0])
    bp2 = V2[0] if len(V2) else np.array([1.0, 0, 0])
    # vertex(1) -> arcs(2) and vertex(2) -> arcs(1); plus vertex-vertex
    d0 = _angles(V1[:, None, :], V2[None, :, :])
    i, j = np.unravel_index(np.argmin(d0), d0.shape) if d0.size else (0, 0)
    if d0.size and d0[i, j] < best:
        best, bp1, bp2 = float(d0[i, j]), V1[i], V2[j]
    for k in range(len(A2)):
        d, pts = _pts_to_arc(V1, A2[k], B2[k])
        m = int(np.argmin(d)) if len(d) else 0
        if len(d) and d[m] < best:
            best, bp1, bp2 = float(d[m]), V1[m], pts[m]
    for k in range(len(A1)):
        d, pts = _pts_to_arc(V2, A1[k], B1[k])
        m = int(np.argmin(d)) if len(d) else 0
        if len(d) and d[m] < best:
            best, bp1, bp2 = float(d[m]), pts[m], V2[m]
    return best, bp1, bp2


def lonlat_of(p: np.ndarray) -> tuple[float, float]:
    """Unit vector -> (lon, lat) degrees."""
    return (float(np.degrees(np.arctan2(p[1], p[0]))),
            float(np.degrees(np.arcsin(np.clip(p[2], -1.0, 1.0)))))
