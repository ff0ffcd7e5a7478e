"""Full-sphere boolean overlay on spherical polygons.

Closes the last geography construction gap: the gnomonic fast path
(functions/geography.py) is exact only for hemisphere-contained inputs
and used to raise HemisphereError beyond that; this module provides the
global path, so spherical ST_Intersection / ST_Union / ST_Difference /
ST_SymDifference work anywhere on the sphere (reference: S2 boolean
operations, c/sedona-s2geography/src/kernels.rs:113-118,524-664).

Algorithm — the classic trace overlay, entirely on the unit sphere:

1. rings -> unit-vector chains; every edge of A is split at its
   great-circle intersection points with every edge of B (S2
   SimpleCrossing sign tests locate crossing pairs; the crossing point
   is +-normalize(cross(n_a, n_b)) with the sign that lies on both
   minor arcs), and vice versa;
2. each sub-edge is wholly inside or outside the other polygon, so one
   winding-number classification of its midpoint (geom/sphere.py
   classify_point_poly — globally valid, smaller-region interior
   convention) labels it;
3. the boolean op selects sub-edges (intersection: A-in-B + B-in-A;
   union: A-out-B + B-out-A; difference: A-out-B + reversed B-in-A);
4. selected sub-edges are stitched into closed cycles by quantized
   endpoint matching; cycles nested inside another cycle become holes.

Generic-position algorithm: shared/collinear boundary segments are
resolved by the midpoint classification's boundary answer (treated as
inside for intersection/difference-subtrahend, outside for union),
which yields the regularized result for the common cases.  The
hemisphere gnomonic path remains the default (faster, Martinez-exact);
this path runs only when that raises.
"""

from __future__ import annotations

import numpy as np

from sedona_db_spark.geom import sphere
from sedona_db_spark.geom.core import (
    MULTIPOLYGON, POLYGON, Geom, empty as geom_empty)

_QUANT = 1e-9


def _rings_xyz(g: Geom) -> list[list[np.ndarray]]:
    """Polygon parts -> list of [outer, hole...] rings as (n,3) unit
    vectors (closing vertex dropped), orientation CANONICALIZED: outer
    rings traverse with their smaller region (the interior) on the
    RIGHT, holes with theirs on the LEFT — i.e. the part interior is on
    the right of every boundary walk.  The trace stitcher selects
    sub-edges in traversal order, so without this normalization a
    reversed input ring made every cycle fail to close and the overlay
    silently returned EMPTY (latent orientation dependence found while
    building the lune splitter, round 6)."""
    parts = []
    for rings in g.polygons():
        part = []
        for i, r in enumerate(rings):
            r = np.asarray(r, dtype=np.float64)
            if len(r) and np.allclose(r[0, :2], r[-1, :2]):
                r = r[:-1]
            if len(r) >= 3:
                xyz = sphere.xyz_of(r[:, : 2])
                want_left = i > 0           # holes: smaller region on left
                if sphere.left_smaller(xyz) != want_left:
                    xyz = xyz[::-1].copy()
                part.append(xyz)
        if part:
            parts.append(part)
    return parts


def _arc_inters(a, b, C, D):
    """Intersection points of arc (a,b) with edge arrays (C,D) -> list of
    unit vectors strictly interior to arc (a,b)."""
    if len(C) == 0:
        return []
    cross = sphere.simple_crossing(a[None, :], b[None, :], C, D)
    out = []
    n1 = np.cross(a, b)
    for j in np.flatnonzero(cross):
        x = np.cross(n1, np.cross(C[j], D[j]))
        nn = np.linalg.norm(x)
        if nn < 1e-15:
            continue
        x = x / nn
        for cand in (x, -x):
            if bool(sphere.on_arc(cand, a[None, :], b[None, :])[0]) and \
                    bool(sphere.on_arc(cand, C[j:j + 1], D[j:j + 1])[0]):
                out.append(cand)
                break
    return out


def _split_edges(rings: list[np.ndarray], other_a, other_b):
    """Split every ring edge at crossings with the other polygon's edge
    set.  Returns a list of (start_xyz, end_xyz) sub-edges, ring order
    preserved."""
    subs = []
    for ring in rings:
        a_arr, b_arr = sphere.ring_edges(ring)
        for a, b in zip(a_arr, b_arr):
            cuts = _arc_inters(a, b, other_a, other_b)
            if not cuts:
                subs.append((a, b))
                continue
            # order cut points by angle from the start vertex
            angs = [float(np.arctan2(np.linalg.norm(np.cross(a, c)),
                                     float(a @ c))) for c in cuts]
            chain = [a] + [c for _, c in sorted(zip(angs, cuts),
                                                key=lambda t: t[0])] + [b]
            for u, v in zip(chain[:-1], chain[1:]):
                if float(u @ v) < 1.0 - 1e-16 or \
                        np.linalg.norm(u - v) > 1e-12:
                    subs.append((u, v))
    return subs


def _mid(u, v):
    m = u + v
    n = np.linalg.norm(m)
    if n < 1e-12:          # antipodal sub-edge midpoint: perturb via cross
        m = np.cross(u, np.array([0.0, 0.0, 1.0]))
        n = np.linalg.norm(m)
        if n < 1e-12:
            m = np.cross(u, np.array([0.0, 1.0, 0.0]))
            n = np.linalg.norm(m)
    return m / n


def _classify_sub(subs, poly_parts):
    """-1 outside / 0 boundary / +1 inside of the (multi)polygon for each
    sub-edge midpoint."""
    out = []
    for u, v in subs:
        m = _mid(u, v)
        best = -1
        for part in poly_parts:
            c = sphere.classify_point_poly(m, part)
            best = max(best, c)
        out.append(best)
    return out


def _key(p):
    return (round(float(p[0]) / _QUANT), round(float(p[1]) / _QUANT),
            round(float(p[2]) / _QUANT))


def _stitch(edges):
    """Stitch (start, end) sub-edges into closed xyz cycles."""
    from collections import defaultdict
    adj = defaultdict(list)
    for i, (u, v) in enumerate(edges):
        adj[_key(u)].append(i)
    used = [False] * len(edges)
    cycles = []
    for i in range(len(edges)):
        if used[i]:
            continue
        chain = [edges[i][0]]
        cur = i
        used[i] = True
        start_key = _key(edges[i][0])
        guard = 0
        while guard <= len(edges):
            guard += 1
            end = edges[cur][1]
            ek = _key(end)
            if ek == start_key:
                if len(chain) >= 3:
                    cycles.append(np.asarray(chain))
                break
            nxts = [j for j in adj[ek] if not used[j]]
            if not nxts:
                break                      # open chain: drop (degenerate)
            cur = nxts[0]
            used[cur] = True
            chain.append(edges[cur][0])
    return cycles


def _to_lonlat(ring_xyz: np.ndarray) -> np.ndarray:
    lon = np.degrees(np.arctan2(ring_xyz[:, 1], ring_xyz[:, 0]))
    lat = np.degrees(np.arcsin(np.clip(ring_xyz[:, 2], -1.0, 1.0)))
    out = np.column_stack([lon, lat])
    return np.vstack([out, out[:1]])      # close the ring


def _assemble(cycles) -> Geom:
    """Cycles -> POLYGON / MULTIPOLYGON by containment DEPTH: a cycle
    contained by an even number of other cycles is the outer ring of a
    new part; odd depth makes it a hole of its immediate (depth-1)
    container.  The former first-container parenting collapsed depth-2
    nests — an island inside a hole (e.g. difference against a
    polygon-with-hole) was silently emitted as a second hole of the
    outer instead of its own part (round-6 advisor finding)."""
    if not cycles:
        return geom_empty(POLYGON)
    n = len(cycles)
    containers: list[list[int]] = [[] for _ in range(n)]
    for i in range(n):
        # representative boundary point of cycle i (midpoint of its
        # first edge) probed against every other cycle's smaller region
        p = _mid(cycles[i][0], cycles[i][1])
        for j in range(n):
            if i != j and sphere.classify_point_poly(p, [cycles[j]]) > 0:
                containers[i].append(j)
    depth = [len(c) for c in containers]
    part_rings: dict[int, list[int]] = {
        i: [i] for i in range(n) if depth[i] % 2 == 0}
    for i in range(n):
        if depth[i] % 2 == 1:
            par = next((j for j in containers[i]
                        if depth[j] == depth[i] - 1), None)
            if par is not None and par in part_rings:
                part_rings[par].append(i)
            else:                      # inconsistent probe: own part
                part_rings[i] = [i]
    parts = [[_to_lonlat(cycles[k]) for k in ring_ids]
             for ring_ids in part_rings.values()]
    if not parts:
        parts = [[_to_lonlat(c)] for c in cycles]
    if len(parts) == 1:
        return Geom(POLYGON, parts[0])
    return Geom(MULTIPOLYGON, parts)


def _all_edges_of(parts):
    a_l, b_l = [], []
    for part in parts:
        for ring in part:
            a, b = sphere.ring_edges(ring)
            if len(a):
                a_l.append(a)
                b_l.append(b)
    if not a_l:
        z = np.zeros((0, 3))
        return z, z
    return np.concatenate(a_l), np.concatenate(b_l)


def _lines_xyz(g: Geom) -> list[np.ndarray]:
    out = []
    for l in g.lines():
        a = np.asarray(l, dtype=np.float64)
        if len(a) >= 2:
            out.append(sphere.xyz_of(a[:, :2]))
    return out


def _chain_subs(subs):
    """Merge consecutive (start, end) sub-edges into polylines."""
    chains = []
    cur: list[np.ndarray] = []
    for u, v in subs:
        if cur and np.linalg.norm(cur[-1] - u) < 1e-12:
            cur.append(v)
        else:
            if len(cur) >= 2:
                chains.append(np.asarray(cur))
            cur = [u, v]
    if len(cur) >= 2:
        chains.append(np.asarray(cur))
    return chains


def _lonlat_open(chain_xyz: np.ndarray) -> np.ndarray:
    lon = np.degrees(np.arctan2(chain_xyz[:, 1], chain_xyz[:, 0]))
    lat = np.degrees(np.arcsin(np.clip(chain_xyz[:, 2], -1.0, 1.0)))
    return np.column_stack([lon, lat])


def spherical_line_clip(g_line: Geom, g_poly: Geom, op: str) -> Geom:
    """Global line-vs-polygon overlay: split the line's great-circle
    edges at polygon-boundary crossings, keep the sub-edges whose
    midpoint classification matches the op (intersection: inside or on
    the boundary; difference: strictly outside), merge consecutive
    sub-edges back into polylines."""
    from sedona_db_spark.geom.core import LINESTRING, MULTILINESTRING
    lines = _lines_xyz(g_line)
    parts = _rings_xyz(g_poly)
    if not lines:
        return geom_empty(LINESTRING)
    if not parts:
        if op == "intersection":
            return geom_empty(LINESTRING)
        return g_line
    pa, pb = _all_edges_of(parts)
    keep = (lambda c: c >= 0) if op == "intersection" else (lambda c: c < 0)
    chains = []
    for line in lines:
        subs = []
        for a, b in zip(line[:-1], line[1:]):
            cuts = _arc_inters(a, b, pa, pb)
            if not cuts:
                subs.append((a, b))
                continue
            angs = [float(np.arctan2(np.linalg.norm(np.cross(a, c)),
                                     float(a @ c))) for c in cuts]
            chain = [a] + [c for _, c in sorted(zip(angs, cuts),
                                                key=lambda t: t[0])] + [b]
            for u, v in zip(chain[:-1], chain[1:]):
                if np.linalg.norm(u - v) > 1e-12:
                    subs.append((u, v))
        cls = _classify_sub(subs, parts)
        chains.extend(_chain_subs(
            [e for e, c in zip(subs, cls) if keep(c)]))
    if not chains:
        return geom_empty(LINESTRING)
    if len(chains) == 1:
        res = Geom(LINESTRING, _lonlat_open(chains[0]))
    else:
        res = Geom(MULTILINESTRING, [_lonlat_open(c) for c in chains])
    res.spherical = True
    return res


def _girdling_union(g1: Geom, g2: Geom) -> Geom:
    """Representable girdling results (round-6 verdict #3): a result
    region wrapping 360 degrees of longitude is bounded by two cycles
    neither containing the other, which no single smaller-region ring
    expresses.  Only UNION can produce one from representable inputs —
    intersection and difference results are subsets of input A, so they
    girdle only if A itself does (and a girdling input is not
    expressible as a Geom in the first place).  The union decomposes as
    A ⊎ (B − A): interiors are disjoint, so the multipolygon of A's
    parts plus (B−A)'s parts covers exactly A ∪ B — a seam
    representation whose parts meet along ∂A ∩ B; membership (max over
    parts) and total area are unchanged, and no degenerate
    shared-boundary overlay is ever computed (B−A uses the original
    generic-position inputs)."""
    d = spherical_overlay(g2, g1, "difference", _seamed=True)
    parts = [[np.asarray(r, dtype=np.float64) for r in rings]
             for rings in g1.polygons()]
    parts += [[np.asarray(r, dtype=np.float64) for r in rings]
              for rings in d.polygons()]
    if not parts:
        return geom_empty(POLYGON)
    res = Geom(POLYGON, parts[0]) if len(parts) == 1 \
        else Geom(MULTIPOLYGON, parts)
    res.spherical = True
    return res


def spherical_overlay(g1: Geom, g2: Geom, op: str,
                      _seamed: bool = False) -> Geom:
    """Boolean overlay of two spherical polygons anywhere on the sphere.

    op: 'intersection' | 'union' | 'difference' | 'sym_difference'.
    Girdling results (a region wrapping 360 degrees of longitude) are
    returned as the disjoint-part decomposition A ⊎ (B−A) — a
    multipolygon whose parts meet along internal seams (see
    _girdling_union); ``_seamed`` marks that recursive pass, where a
    second girdling detection is a real failure and re-raises.
    Non-polygon inputs are not handled here (the gnomonic path covers
    line/point overlays; the line-vs-polygon global paths live in
    spherical_line_clip)."""
    p1 = _rings_xyz(g1)
    p2 = _rings_xyz(g2)
    if not p1 or not p2:
        if op == "intersection":
            return geom_empty(POLYGON)
        if op == "difference":
            return g1 if p1 else geom_empty(POLYGON)
        return g1 if p1 else (g2 if p2 else geom_empty(POLYGON))
    if op == "sym_difference":
        d1 = spherical_overlay(g1, g2, "difference")
        d2 = spherical_overlay(g2, g1, "difference")
        parts = [r for r in d1.polygons()] + [r for r in d2.polygons()]
        parts = [[np.asarray(r) for r in rings] for rings in parts]
        if not parts:
            return geom_empty(POLYGON)
        if len(parts) == 1:
            return Geom(POLYGON, parts[0])
        return Geom(MULTIPOLYGON, parts)

    a2, b2 = _all_edges_of(p2)
    a1, b1 = _all_edges_of(p1)
    subs1 = []
    for part in p1:
        subs1.extend(_split_edges(part, a2, b2))
    subs2 = []
    for part in p2:
        subs2.extend(_split_edges(part, a1, b1))
    c1 = _classify_sub(subs1, p2)   # A sub-edges vs B
    c2 = _classify_sub(subs2, p1)   # B sub-edges vs A

    sel = []
    if op == "intersection":
        sel += [e for e, c in zip(subs1, c1) if c >= 0]
        sel += [e for e, c in zip(subs2, c2) if c > 0]
    elif op == "union":
        sel += [e for e, c in zip(subs1, c1) if c < 0]
        sel += [e for e, c in zip(subs2, c2) if c < 0]
    elif op == "difference":
        sel += [e for e, c in zip(subs1, c1) if c < 0]
        sel += [(v, u) for (u, v), c in zip(subs2, c2) if c > 0]
    else:
        raise ValueError(f"unknown overlay op {op!r}")

    cycles = _stitch(sel)
    res = _assemble(cycles)
    res.spherical = True
    try:
        _verify_interior(res, sel, subs1, c1, p1, p2, op)
    except NotImplementedError:
        if _seamed or op != "union":
            raise               # only a union of representable inputs
            # can girdle; anything else here is a genuine assembly
            # failure, not a representability limit — surface it
        return _girdling_union(g1, g2)
    return res


def _verify_interior(res, sel, subs1, c1, p1, p2, op) -> None:
    """Post-assembly sanity probe: a point epsilon-inside the result
    (derived from a selected boundary edge and the SOURCE polygon's own
    interior side) must classify inside the assembled polygon.

    This catches the one construction the engine's polygon model cannot
    express: a result region girdling the sphere (e.g. the union of two
    bands whose longitudes jointly wrap 360 degrees) is bounded by two
    cycles neither of which contains the other — under the
    smaller-region orientation-ignored convention (geom/sphere.py) no
    ring assembly represents it, so raise rather than return a polygon
    that classifies its own interior as outside."""
    if res.is_empty() or not sel:
        return
    # prefer an A-sourced edge: for every op the result interior lies on
    # the A-interior side of a selected A sub-edge
    probe = None
    sel_a = [e for e, c in zip(subs1, c1)
             if (op == "intersection" and c >= 0)
             or (op != "intersection" and c < 0)]
    for u, v in sel_a[:8]:
        m = _mid(u, v)
        n = np.cross(u, v)
        nn = np.linalg.norm(n)
        if nn < 1e-12:
            continue
        n = n / nn
        for cand in (m + 1e-5 * n, m - 1e-5 * n):
            cand = cand / np.linalg.norm(cand)
            in_a = max((sphere.classify_point_poly(cand, part)
                        for part in p1), default=-1) > 0
            if in_a:
                if op == "intersection":
                    # must also be inside B, else the probe sits in
                    # A-minus-B and is not interior to the result
                    in_b = max((sphere.classify_point_poly(cand, part)
                                for part in p2), default=-1) > 0
                    if not in_b:
                        continue
                probe = cand
                break
        if probe is not None:
            break
    if probe is None:
        return
    got = max((sphere.classify_point_poly(probe, [np.asarray(
        sphere.xyz_of(np.asarray(r)[:, :2])) for r in rings])
        for rings in res.polygons()), default=-1)
    if got < 0:
        raise NotImplementedError(
            "spherical overlay result girdles the sphere (boundary cycles "
            "that do not nest) — not representable under the "
            "smaller-region polygon convention; split the inputs so no "
            "result region wraps a full 360 degrees of longitude")
