"""Geography (spherical/geodesic) kernels — SURVEY §2.4.

Reference: the S2-backed geography overloads
(/root/reference/c/sedona-s2geography/src/register.rs:30-59, kernels.rs:38).
There, geography vs geometry is a type tag (`Edges::Spherical`) and the same
SQL names dispatch to spherical kernels.  In our Spark model the edge tag
rides column metadata (SURVEY §1.3), and Spark SQL UDFs cannot dispatch on
metadata — so spherical semantics get explicit SQL names (the PostGIS
convention): ST_DistanceSphere / ST_DistanceSpheroid / ST_AreaSpheroid /
ST_LengthSpheroid / ST_PerimeterSpheroid / ST_DWithinSphere, plus the
S2-style cell functions S2_CellIDFromPoint / S2_CoveringCellIDs
(docs/reference/sql/s2_*.qmd).

All kernels assume lon/lat degrees (EPSG:4326 axis order lon, lat).

Cell IDs are bitwise-identical to the s2geometry library (cube face +
quadratic ST + Hilbert lookup tables, validated on the reference's own
vectors); SQL surfaces them as signed int64.  Coverings are sound
RegionCoverer-style hierarchical descents (complete by construction).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sedona_db_spark.functions.kernels import (
    BIN, BOOL, DBL, KERNELS, _coerce, _decode,
)
from sedona_db_spark.geom import algorithms2 as alg2
from sedona_db_spark.geom.core import Geom, POINT

EARTH_RADIUS_M = 6371008.8            # mean radius (reference uses the same
                                      # sphere for ST_DistanceSphere)
WGS84_A = 6378137.0                   # spheroid semi-major
WGS84_F = 1.0 / 298.257223563         # flattening


# ----------------------------------------------------------------------
# scalar math (numpy-vectorizable)
# ----------------------------------------------------------------------

def haversine_m(lon1, lat1, lon2, lat2) -> float:
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = p2 - p1
    dl = math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * EARTH_RADIUS_M * math.asin(min(1.0, math.sqrt(a)))


def spheroid_distance_m(lon1, lat1, lon2, lat2) -> float:
    """Lambert's formula on WGS84 (good to ~10 m over long lines) —
    dependency-free stand-in for the reference's full geodesic solver."""
    if lon1 == lon2 and lat1 == lat2:
        return 0.0
    # reduced latitudes
    b1 = math.atan((1 - WGS84_F) * math.tan(math.radians(lat1)))
    b2 = math.atan((1 - WGS84_F) * math.tan(math.radians(lat2)))
    # central angle via haversine on reduced latitudes
    dl = math.radians(lon2 - lon1)
    a = math.sin((b2 - b1) / 2) ** 2 + \
        math.cos(b1) * math.cos(b2) * math.sin(dl / 2) ** 2
    sigma = 2 * math.asin(min(1.0, math.sqrt(a)))
    if sigma == 0.0:
        return 0.0
    P, Q = (b1 + b2) / 2, (b2 - b1) / 2
    sin_s, cos_s = math.sin(sigma), math.cos(sigma)
    X = (sigma - sin_s) * (math.sin(P) ** 2 * math.cos(Q) ** 2) / \
        max(1e-15, math.cos(sigma / 2) ** 2)
    Y = (sigma + sin_s) * (math.cos(P) ** 2 * math.sin(Q) ** 2) / \
        max(1e-15, math.sin(sigma / 2) ** 2)
    return WGS84_A * (sigma - WGS84_F / 2 * (X + Y))


def _geom_min_distance(a: Geom, b: Geom, dist_fn) -> float:
    """Exact great-circle geometry distance: the spherical closest pair
    (vertex-to-arc projections + exact intersection test, geom/sphere.py)
    is computed on the unit sphere, then `dist_fn` (haversine or the
    spheroid solver) is evaluated at that pair — matching the reference's
    S2 edge distance (c/sedona-s2geography) instead of the former
    vertex-to-vertex approximation."""
    from sedona_db_spark.geom import sphere
    ang, p1, p2 = sphere.closest_pair_rad(a, b)
    if ang == 0.0:
        return 0.0
    lon1, lat1 = sphere.lonlat_of(p1)
    lon2, lat2 = sphere.lonlat_of(p2)
    return dist_fn(lon1, lat1, lon2, lat2)


def geodesic_length_m(g: Geom, rings: bool = False) -> float:
    total = 0.0
    parts = list(g.rings()) if rings else list(g.lines())
    for arr in parts:
        a = np.asarray(arr, dtype=np.float64)[:, :2]
        for i in range(len(a) - 1):
            total += haversine_m(a[i, 0], a[i, 1], a[i + 1, 0], a[i + 1, 1])
    return total


def spherical_ring_area_m2(ring: np.ndarray) -> float:
    """EXACT spherical ring area via the Girard turning-angle excess:
    area of the enclosed region = (2*pi - sum of exterior turn angles)
    * R^2, computed from great-circle edge tangents at each vertex.

    The previous trapezoid line integral (sum dlam*(2+sin(phi))/2) is
    the rhumb-ish approximation — exact only when sin(phi) varies
    linearly with lam along an edge; an octant polygon came out 50% low
    (caught by the round-5 golden file).  Girard is exact for
    great-circle edges of ANY length.  The smaller of the two bounded
    regions is returned (the engine's orientation-ignored interior
    convention, geom/sphere.py)."""
    a = np.asarray(ring, dtype=np.float64)[:, :2]
    if len(a) >= 2 and np.allclose(a[0], a[-1]):
        a = a[:-1]
    if len(a) < 3:
        return 0.0
    lam = np.radians(a[:, 0])
    phi = np.radians(a[:, 1])
    v = np.column_stack([np.cos(phi) * np.cos(lam),
                         np.cos(phi) * np.sin(lam), np.sin(phi)])
    # drop consecutive duplicates (zero-length edges break tangents)
    keep = np.ones(len(v), dtype=bool)
    keep[1:] = np.linalg.norm(np.diff(v, axis=0), axis=1) > 1e-14
    v = v[keep]
    n = len(v)
    if n < 3:
        return 0.0
    prev = np.roll(v, 1, axis=0)
    nxt = np.roll(v, -1, axis=0)
    t_in = np.cross(np.cross(prev, v), v)
    t_out = np.cross(np.cross(v, nxt), v)
    ni = np.linalg.norm(t_in, axis=1, keepdims=True)
    no = np.linalg.norm(t_out, axis=1, keepdims=True)
    ok = (ni[:, 0] > 1e-14) & (no[:, 0] > 1e-14)
    t_in = np.where(ni > 1e-14, t_in / np.where(ni > 0, ni, 1.0), t_in)
    t_out = np.where(no > 1e-14, t_out / np.where(no > 0, no, 1.0), t_out)
    sin_t = np.einsum("ij,ij->i", np.cross(t_in, t_out), v)
    cos_t = np.einsum("ij,ij->i", t_in, t_out)
    turns = np.where(ok, np.arctan2(sin_t, cos_t), 0.0)
    left = (2.0 * np.pi - float(np.sum(turns))) % (4.0 * np.pi)
    return min(left, 4.0 * np.pi - left) * EARTH_RADIUS_M ** 2


def geodesic_area_m2(g: Geom) -> float:
    total = 0.0
    for poly in g.polygons():
        rings = list(poly)
        if not rings:
            continue
        total += spherical_ring_area_m2(rings[0])
        for hole in rings[1:]:
            total -= spherical_ring_area_m2(hole)
    return abs(total)


# ----------------------------------------------------------------------
# S2 hierarchical cells — bitwise-identical to the s2geometry library
# (public algorithm: cube-face + quadratic ST projection + Hilbert curve
# via 4-bit lookup tables; validated against the reference's vectors in
# c/sedona-s2geography/src/utils.rs:218-230).  IDs are uint64 reinterpreted
# as signed int64 (the BigQuery/Sedona SQL convention), so faces 4-5 are
# negative — joins against externally produced S2 ids now match bit-for-bit.
# ----------------------------------------------------------------------

_MAX_LEVEL = 30
_LOOKUP_BITS = 4
_SWAP, _INVERT = 1, 2
_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENT = (_SWAP, 0, 0, _INVERT | _SWAP)
_LOOKUP_POS = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)


def _init_lookup(level, i, j, orig_orient, orient, pos):
    if level == _LOOKUP_BITS:
        ij = (i << _LOOKUP_BITS) + j
        _LOOKUP_POS[(ij << 2) + orig_orient] = (pos << 2) + orient
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = _POS_TO_IJ[orient]
    for idx in range(4):
        _init_lookup(level, i + (r[idx] >> 1), j + (r[idx] & 1),
                     orig_orient, orient ^ _POS_TO_ORIENT[idx], pos + idx)


for _o in range(4):
    _init_lookup(0, 0, 0, _o, _o, 0)


def _lonlat_to_xyz(lon, lat):
    lam, phi = math.radians(lon), math.radians(lat)
    return (math.cos(phi) * math.cos(lam), math.cos(phi) * math.sin(lam),
            math.sin(phi))


def _xyz_to_face_uv(x, y, z):
    """Standard S2 cube-face projection (public algorithm description)."""
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax >= ay and ax >= az:
        return (0, y / x, z / x) if x > 0 else (3, z / x, y / x)
    if ay >= ax and ay >= az:
        return (1, -x / y, z / y) if y > 0 else (4, z / y, -x / y)
    return (2, -x / z, -y / z) if z > 0 else (5, -y / z, -x / z)


def _uv_to_st(u: float) -> float:
    """S2's quadratic projection flattening cube-face distortion."""
    if u >= 0:
        return 0.5 * math.sqrt(1 + 3 * u)
    return 1 - 0.5 * math.sqrt(1 - 3 * u)


def _cellid_from_face_ij(face: int, i: int, j: int) -> int:
    """Leaf (level-30) cell id from face + 30-bit (i, j), as uint64."""
    n = face << 60  # kPosBits - 1 = 60
    bits = face & _SWAP
    mask = (1 << _LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits += ((i >> (k * _LOOKUP_BITS)) & mask) << (_LOOKUP_BITS + 2)
        bits += ((j >> (k * _LOOKUP_BITS)) & mask) << 2
        bits = int(_LOOKUP_POS[bits])
        n |= (bits >> 2) << (k * 2 * _LOOKUP_BITS)
        bits &= (_SWAP | _INVERT)
    return n * 2 + 1


def cell_id_from_point(lon: float, lat: float, level: int = _MAX_LEVEL) -> int:
    """s2geometry-exact cell id (uint64 value) containing the point."""
    face, u, v = _xyz_to_face_uv(*_lonlat_to_xyz(lon, lat))
    s, t = _uv_to_st(u), _uv_to_st(v)
    limit = 1 << _MAX_LEVEL
    i = max(0, min(limit - 1, int(math.floor(s * limit))))
    j = max(0, min(limit - 1, int(math.floor(t * limit))))
    leaf = _cellid_from_face_ij(face, i, j)
    level = int(level)
    if level >= _MAX_LEVEL:
        return leaf
    lsb = 1 << (2 * (_MAX_LEVEL - level))
    return (leaf & ~(lsb - 1)) | lsb


def cell_id_signed(cid: int) -> int:
    """uint64 cell id -> signed int64 (two's complement), the SQL LongType
    representation used by BigQuery and the reference."""
    return cid - (1 << 64) if cid >= (1 << 63) else cid


def _st_to_uv(s: float) -> float:
    """Inverse of the quadratic ST projection."""
    if s >= 0.5:
        return (4.0 * s * s - 1.0) / 3.0
    return (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0


# face (u, v) -> xyz: x = u-axis, y = v-axis, z = face normal (S2 layout)
_FACE_UVW = (
    ((0, 1, 0), (0, 0, 1), (1, 0, 0)),     # face 0: +x
    ((-1, 0, 0), (0, 0, 1), (0, 1, 0)),    # face 1: +y
    ((-1, 0, 0), (0, -1, 0), (0, 0, 1)),   # face 2: +z
    ((0, 0, -1), (0, -1, 0), (-1, 0, 0)),  # face 3: -x
    ((0, 0, -1), (1, 0, 0), (0, -1, 0)),   # face 4: -y
    ((0, 1, 0), (1, 0, 0), (0, 0, -1)),    # face 5: -z
)


def _face_uv_lonlat(face: int, u: float, v: float) -> tuple[float, float]:
    ua, va, wa = (np.array(a, dtype=np.float64) for a in _FACE_UVW[face])
    p = ua * u + va * v + wa
    p /= np.linalg.norm(p)
    return (math.degrees(math.atan2(p[1], p[0])),
            math.degrees(math.asin(max(-1.0, min(1.0, p[2])))))


def _cell_polygon(face: int, i0: int, j0: int, size: int) -> Geom:
    """Spherical quad of the cell [i0, i0+size) x [j0, j0+size) on a face
    (cell edges are great-circle arcs: u/v = const planes through 0)."""
    lim = float(1 << _MAX_LEVEL)
    corners = []
    for di, dj in ((0, 0), (size, 0), (size, size), (0, size), (0, 0)):
        u = _st_to_uv((i0 + di) / lim)
        v = _st_to_uv((j0 + dj) / lim)
        corners.append(_face_uv_lonlat(face, u, v))
    from sedona_db_spark.geom.core import POLYGON as _POLY
    return Geom(_POLY, [np.asarray(corners, dtype=np.float64)])


def covering_cell_ids(g: Geom, level: int = 8) -> list[int]:
    """S2 RegionCoverer-style covering at a fixed level: hierarchical
    descent from the 6 face cells, keeping every level-`level` cell whose
    spherical quad intersects the geometry (exact predicates,
    geom/sphere.py).  Complete by construction — every point of `g` lies
    in some emitted cell — which is what the S2-bucketed equi-join
    requires (the former bounded-grid sampling could miss slivers)."""
    from sedona_db_spark.geom import sphere
    if g.is_empty():
        return []
    level = max(0, min(int(level), _MAX_LEVEL))
    out: set = set()
    lim = 1 << _MAX_LEVEL

    def descend(face: int, i0: int, j0: int, size: int, lvl: int):
        cell = _cell_polygon(face, i0, j0, size)
        try:
            hit = sphere.intersects_exact(cell, g)
        except Exception:
            hit = True  # conservative: keep on predicate failure
        if not hit:
            return
        # At the cap, emit the current (coarser) ancestor cell instead of
        # descending further: the covering stays complete — S2
        # RegionCoverer max_cells semantics — rather than hard-failing the
        # query.  Result may therefore mix levels once the cap is hit.
        if lvl == level or len(out) >= 65536:
            leaf = _cellid_from_face_ij(face, i0 + size // 2, j0 + size // 2)
            lsb = 1 << (2 * (_MAX_LEVEL - lvl))
            out.add((leaf & ~(lsb - 1)) | lsb)
            return
        h = size // 2
        for di, dj in ((0, 0), (h, 0), (0, h), (h, h)):
            descend(face, i0 + di, j0 + dj, h, lvl + 1)

    for face in range(6):
        descend(face, 0, 0, lim, 0)
    return sorted(cell_id_signed(c) for c in out)


# ----------------------------------------------------------------------
# pandas-UDF kernels
# ----------------------------------------------------------------------

def _haversine_m_vec(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Vectorized haversine (same formula/radius as haversine_m)."""
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = (p2 - p1) / 2.0
    dl = np.radians(lon2 - lon1) / 2.0
    a = np.sin(dp) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.minimum(1.0, np.sqrt(a)))


def _pair_metric(dist_fn):
    vectorize = dist_fn is haversine_m

    def run(s1: pd.Series, s2: pd.Series) -> pd.Series:
        if vectorize and len(s1):
            # all-tagged-point batch: one frombuffer sweep per side and
            # a numpy haversine instead of millions of from_wkb calls —
            # the dominant cost of geography dwithin refines at scale.
            # Any null / non-point / NaN coordinate falls back per row.
            from sedona_db_spark.operators.geography_join import \
                _geog_points_fast
            p1 = _geog_points_fast(list(s1))
            p2 = _geog_points_fast(list(s2)) if p1 is not None else None
            if p1 is not None and p2 is not None and len(p1) == len(p2) \
                    and not np.isnan(p1).any() and not np.isnan(p2).any():
                return pd.Series(_haversine_m_vec(
                    p1[:, 0], p1[:, 1], p2[:, 0], p2[:, 1]))
        out = []
        for a, b in zip(_decode(s1), _decode(s2)):
            if a is None or b is None:
                out.append(None)
            elif a.gt == POINT and b.gt == POINT and not a.is_empty() and not b.is_empty():
                out.append(dist_fn(float(a.data[0]), float(a.data[1]),
                                   float(b.data[0]), float(b.data[1])))
            else:
                out.append(_geom_min_distance(a, b, dist_fn))
        return pd.Series(out, dtype=object)
    return run


def k_dwithin_sphere(s1, s2, d) -> pd.Series:
    D = _coerce(d, len(s1))
    dist = _pair_metric(haversine_m)(s1, s2)
    if dist.dtype != object:            # vectorized all-point batch
        dv = pd.to_numeric(D, errors="coerce").to_numpy(dtype=float)
        res = dist.to_numpy(dtype=float) <= dv
        out = pd.Series(res, dtype=object)
        nulls = pd.isna(pd.Series(list(D)))
        if bool(nulls.any()):
            out[nulls.to_numpy()] = None
        return out
    return pd.Series(
        [None if (v is None or dd is None) else bool(v <= float(dd))
         for v, dd in zip(dist, D)], dtype=object)


def k_area_spheroid(s: pd.Series) -> pd.Series:
    return pd.Series([None if g is None else geodesic_area_m2(g)
                      for g in _decode(s)], dtype=object)


def k_length_spheroid(s: pd.Series) -> pd.Series:
    return pd.Series([None if g is None else geodesic_length_m(g)
                      for g in _decode(s)], dtype=object)


def k_perimeter_spheroid(s: pd.Series) -> pd.Series:
    return pd.Series([None if g is None else geodesic_length_m(g, rings=True)
                      for g in _decode(s)], dtype=object)


def k_s2_cellid(s: pd.Series, level) -> pd.Series:
    L = _coerce(level, len(s))
    out = []
    for g, lv in zip(_decode(s), L):
        if g is None or g.gt != POINT or g.is_empty() or lv is None:
            out.append(None)
        else:
            out.append(cell_id_signed(cell_id_from_point(
                float(g.data[0]), float(g.data[1]), int(lv))))
    return pd.Series(out, dtype=object)


def k_s2_covering(s: pd.Series, level) -> pd.Series:
    L = _coerce(level, len(s))
    out = []
    for g, lv in zip(_decode(s), L):
        if g is None or lv is None:
            out.append(None)
        else:
            out.append(covering_cell_ids(g, int(lv)))
    return pd.Series(out, dtype=object)


KERNELS.update({
    "ST_DistanceSpheroid": (_pair_metric(spheroid_distance_m), DBL, "gg"),
    "ST_DWithinSphere": (k_dwithin_sphere, BOOL, "ggd"),
    "ST_AreaSpheroid": (k_area_spheroid, DBL, "g"),
    "ST_LengthSpheroid": (k_length_spheroid, DBL, "g"),
    "ST_PerimeterSpheroid": (k_perimeter_spheroid, DBL, "g"),
    "S2_CellIDFromPoint": (k_s2_cellid, T.LongType(), "gi"),
    "S2_CoveringCellIDs": (k_s2_covering, T.ArrayType(T.LongType()), "gi"),
})


# ----------------------------------------------------------------------
# Same-name dispatch: geography-tagged values -> spherical kernels
# ----------------------------------------------------------------------
# The reference gives spherical semantics to the SAME SQL names when the
# argument type is geography (c/sedona-s2geography/src/kernels.rs:38-757,
# register.rs:30-59).  Spark SQL function resolution is type-blind over
# BINARY, so the edge tag rides in the value (core._SD_GEOG, set by
# ST_GeogFrom*/ST_GeogPoint/ST_ToGeography) and the shared kernels below
# dispatch per row.

from sedona_db_spark.geom import algorithms as _alg  # noqa: E402
from sedona_db_spark.geom import core as _core  # noqa: E402
from sedona_db_spark.geom import sphere as _sphere  # noqa: E402


def _gnomonic_pair(a: Geom, b: Geom):
    """Project both geometries onto the gnomonic tangent plane at their
    joint (vector-mean) centroid, scaled to meters.  Great-circle arcs
    map to straight lines under the gnomonic projection, so PLANAR
    topological predicates on the projected geometries give exact
    spherical-edge answers for inputs inside the tangent hemisphere
    (the reference evaluates the same predicates on S2 shapes,
    kernels.rs:68-138)."""
    va = a.all_coords()[:, :2]
    vb = b.all_coords()[:, :2]
    allv = np.radians(np.vstack([va, vb]).astype(np.float64))
    xyz = np.column_stack([
        np.cos(allv[:, 1]) * np.cos(allv[:, 0]),
        np.cos(allv[:, 1]) * np.sin(allv[:, 0]),
        np.sin(allv[:, 1])])
    c = xyz.mean(axis=0)
    nrm = float(np.linalg.norm(c))
    if nrm < 1e-12:  # antipodal degenerate: keep lon/lat plane
        return a, b
    c /= nrm
    lam0 = math.atan2(c[1], c[0])
    sin0 = c[2]
    cos0 = math.sqrt(max(1.0 - sin0 * sin0, 0.0))

    def proj(arr):
        lam = np.radians(arr[:, 0])
        phi = np.radians(arr[:, 1])
        cosc = sin0 * np.sin(phi) + cos0 * np.cos(phi) * np.cos(lam - lam0)
        if float(np.min(cosc)) < 1e-6:
            # beyond the tangent hemisphere the projection folds; raising
            # (callers fall back to the exact 3-D path or propagate)
            # replaced the old silent clamp that returned plausible-but-
            # wrong answers for hemisphere-spanning inputs
            raise _sphere.HemisphereError(
                "input spans more than a hemisphere; gnomonic reduction "
                "is not valid (exact 3-D path handles "
                "intersects/contains/within/covers/covered_by)")
        x = EARTH_RADIUS_M * np.cos(phi) * np.sin(lam - lam0) / cosc
        y = EARTH_RADIUS_M * (cos0 * np.sin(phi)
                              - sin0 * np.cos(phi) * np.cos(lam - lam0)) / cosc
        out = arr.copy()
        out[:, 0] = x
        out[:, 1] = y
        return out

    return _alg.transform_coords(a, proj), _alg.transform_coords(b, proj)


def _gnomonic_pair_inv(a: Geom, b: Geom):
    """(projected a, projected b, inverse fn) — like _gnomonic_pair but
    also returns the inverse mapping so constructive results (overlay
    outputs) can be carried back to lon/lat."""
    va = a.all_coords()[:, :2]
    vb = b.all_coords()[:, :2]
    allv = np.radians(np.vstack([va, vb]).astype(np.float64))
    xyz = np.column_stack([
        np.cos(allv[:, 1]) * np.cos(allv[:, 0]),
        np.cos(allv[:, 1]) * np.sin(allv[:, 0]),
        np.sin(allv[:, 1])])
    c = xyz.mean(axis=0)
    nrm = float(np.linalg.norm(c))
    if nrm < 1e-12:
        return a, b, None
    c /= nrm
    lam0 = math.atan2(c[1], c[0])
    sin0 = c[2]
    cos0 = math.sqrt(max(1.0 - sin0 * sin0, 0.0))
    R = EARTH_RADIUS_M

    def proj(arr):
        lam = np.radians(arr[:, 0])
        phi = np.radians(arr[:, 1])
        cosc = sin0 * np.sin(phi) + cos0 * np.cos(phi) * np.cos(lam - lam0)
        if float(np.min(cosc)) < 1e-6:
            raise _sphere.HemisphereError(
                "input spans more than a hemisphere; spherical overlay "
                "construction requires hemisphere-contained geometries")
        x = R * np.cos(phi) * np.sin(lam - lam0) / cosc
        y = R * (cos0 * np.sin(phi) - sin0 * np.cos(phi) * np.cos(lam - lam0)) / cosc
        out = arr.copy()
        out[:, 0] = x
        out[:, 1] = y
        return out

    def inv(arr):
        x = arr[:, 0] / R
        y = arr[:, 1] / R
        rho = np.hypot(x, y)
        cang = np.arctan(rho)  # gnomonic inverse: c = arctan(rho)
        with np.errstate(invalid="ignore", divide="ignore"):
            sc, cc = np.sin(cang), np.cos(cang)
            phi = np.arcsin(np.clip(
                cc * sin0 + np.where(rho > 1e-12, y * sc * cos0 / rho, 0.0),
                -1.0, 1.0))
            lam = lam0 + np.arctan2(
                x * sc, rho * cos0 * cc - y * sin0 * sc)
        lam = np.where(rho <= 1e-12, lam0, lam)
        phi = np.where(rho <= 1e-12, math.asin(sin0), phi)
        out = arr.copy()
        out[:, 0] = (np.degrees(lam) + 180.0) % 360.0 - 180.0
        out[:, 1] = np.degrees(phi)
        return out

    return (_alg.transform_coords(a, proj), _alg.transform_coords(b, proj),
            inv)


def _line_poly_union(g_line, g_poly):
    """Global line ∪ polygon: GEOMETRYCOLLECTION(polygon, line − polygon)
    — the polygon absorbs the covered line portion; the remainder keeps
    its dimension (regularized mixed-dimension union)."""
    from sedona_db_spark.geom.sphere_overlay import spherical_line_clip
    outside = spherical_line_clip(g_line, g_poly, "difference")
    if outside.is_empty():
        return g_poly
    res = _core.Geom(_core.GEOMETRYCOLLECTION, [g_poly, outside])
    res.spherical = True
    return res


def _spherical_overlay_kernel(op_fn, op_name: str | None = None):
    """Geography overlay: gnomonic project (great circles -> lines),
    exact planar Martinez overlay, inverse-project, re-tag spherical
    (reference spherical overlay set: kernels.rs:113-118, 524-664).

    Hemisphere-spanning polygon inputs no longer raise: the global
    3-D trace overlay (geom/sphere_overlay.py — great-circle edge
    splitting + winding classification + cycle stitching) takes over
    when the gnomonic reduction is invalid.  Hemisphere-spanning LINE
    overlays still raise (no global path yet)."""

    def run(s1: pd.Series, s2: pd.Series) -> pd.Series:
        from sedona_db_spark.geom.sphere_overlay import spherical_overlay
        out = []
        for g1, g2 in zip(_decode(s1), _decode(s2)):
            if g1 is None or g2 is None:
                out.append(None)
                continue
            if g1.is_empty() or g2.is_empty():
                res = op_fn(g1, g2)
            else:
                try:
                    p1, p2, inv = _gnomonic_pair_inv(g1, g2)
                    res = op_fn(p1, p2)
                    if inv is not None and not res.is_empty():
                        res = _alg.transform_coords(res, inv)
                except _sphere.HemisphereError:
                    if op_name is None:
                        raise
                    p1, p2 = list(g1.polygons()), list(g2.polygons())
                    l1, l2 = list(g1.lines()), list(g2.lines())
                    if p1 and p2:
                        res = spherical_overlay(g1, g2, op_name)
                    elif l1 and p2 and not p1 and \
                            op_name in ("intersection", "difference"):
                        from sedona_db_spark.geom.sphere_overlay import \
                            spherical_line_clip
                        res = spherical_line_clip(g1, g2, op_name)
                    elif l1 and p2 and not p1 and op_name == "union":
                        # mixed-dimension union (round 6): polygon plus
                        # the line portion OUTSIDE it, as a collection —
                        # the reference's S2 union emits the same
                        # mixed-dimension result (kernels.rs:524-664)
                        res = _line_poly_union(g1, g2)
                    elif l2 and p1 and not p2 and op_name == "intersection":
                        from sedona_db_spark.geom.sphere_overlay import \
                            spherical_line_clip
                        res = spherical_line_clip(g2, g1, op_name)
                    elif l2 and p1 and not p2 and op_name == "union":
                        res = _line_poly_union(g2, g1)
                    else:
                        raise
            res.spherical = True
            out.append(_core.to_wkb(res))
        return pd.Series(out, dtype=object)
    return run


# position threshold for the vectorized spherical polygon-vs-points fast
# path, mirroring kernels._PT_POLY_PRED: (flip, min_position) — flip True
# means the polygon rides on the RIGHT argument; None means symmetric
# (try both orders).  position: 1 interior, 0 boundary, -1 outside.
_SPH_PT_POLY = {
    "contains": (False, 1), "covers": (False, 0), "intersects": (None, 0),
    "within": (True, 1), "covered_by": (True, 0),
}


def _sph_poly_parts_xyz(g: Geom):
    """Polygon parts as lists of xyz rings, or None when g is not purely
    polygonal (mirrors the planar fast-path eligibility test)."""
    if g is None or g.is_empty() or g.dimension() != 2 \
            or list(g.lines()) or list(g.points()):
        return None
    parts = [[_sphere.xyz_of(np.asarray(r, dtype=np.float64)[:, :2])
              for r in rings if len(r)]
             for rings in g.polygons()]
    parts = [p for p in parts if p]
    return parts or None


def _sph_point_poly_fast(s1: pd.Series, s2: pd.Series, pred_name: str):
    """Vectorized spherical predicate when one side is uniform tagged
    geography points and the other has few distinct polygonal WKBs (the
    geography relation-join refine shape).  Classification runs through
    the batched exact spherical kernel (sphere.classify_points_poly_batch
    — same on-arc/winding/parity procedure as the scalar path's global
    branch, vectorized many-points-one-ring).  Returns None when the
    batch doesn't fit; the caller falls back to the per-pair loop."""
    spec = _SPH_PT_POLY.get(pred_name)
    if spec is None:
        return None
    flip, min_pos = spec
    from sedona_db_spark.operators.geography_join import _geog_points_fast
    orders = ((s2, s1),) if flip is True else \
        ((s1, s2),) if flip is False else ((s1, s2), (s2, s1))
    for poly_s, pt_s in orders:
        pts = _geog_points_fast(list(pt_s))
        if pts is None or (len(pts) and bool(np.isnan(pts).any())):
            continue
        codes, uniques = pd.factorize(poly_s)
        if len(uniques) > 64 or bool((codes < 0).any()):
            continue
        cache = []
        good = True
        for bts in uniques:
            try:
                parts = _sph_poly_parts_xyz(_core.from_wkb(bts))
            except Exception:
                parts = None
            if parts is None:
                good = False
                break
            cache.append(parts)
        if not good:
            continue
        P = _sphere.xyz_of(pts)
        res = np.empty(len(pt_s), dtype=bool)
        for kcode, parts in enumerate(cache):
            mask = codes == kcode
            sub = P[mask]
            pos = np.full(len(sub), -2, dtype=np.int8)
            for rings in parts:        # multipolygon: best part wins,
                pos = np.maximum(       # matching contains/covers_exact
                    pos, _sphere.classify_points_poly_batch(sub, rings))
            res[mask] = pos >= min_pos
        return pd.Series(res)
    return None


def _synth_geog_points(lon: pd.Series, lat: pd.Series) -> pd.Series:
    """21-byte tagged point WKB series from certified (lon, lat)
    doubles — byte-identical to what ST_GeogFromWKT('POINT (lon lat)')
    produced for the same doubles (certify_geog_point_view proved the
    shadows bit-equal), so a kernel delegating through this sees the
    exact inputs the geography column would have carried.  NULL lon or
    lat -> NULL WKB (the certificate null-matches shadows to the
    geography column)."""
    from sedona_db_spark.operators.geography_join import _GEOG_PT_PREFIX
    n = len(lon)
    if n == 0:
        return pd.Series([], dtype=object)
    mask = (lon.isna() | lat.isna()).to_numpy()
    lov = lon.to_numpy(dtype=np.float64, na_value=0.0)
    lav = lat.to_numpy(dtype=np.float64, na_value=0.0)
    raw = np.empty((n, 21), dtype=np.uint8)
    raw[:, :5] = np.frombuffer(_GEOG_PT_PREFIX, dtype=np.uint8)
    raw[:, 5:13] = np.ascontiguousarray(lov, dtype="<f8") \
        .view(np.uint8).reshape(n, 8)
    raw[:, 13:21] = np.ascontiguousarray(lav, dtype="<f8") \
        .view(np.uint8).reshape(n, 8)
    buf = raw.tobytes()
    out = [None if mask[i] else buf[i * 21:(i + 1) * 21]
           for i in range(n)]
    return pd.Series(out, dtype=object)


def _spherical_pred_kernel(pred_name: str):
    pred = getattr(_alg, pred_name)
    exact = _sphere.EXACT_PREDICATES.get(pred_name)

    def run(s1: pd.Series, s2: pd.Series) -> pd.Series:
        fast = _sph_point_poly_fast(s1.reset_index(drop=True),
                                    s2.reset_index(drop=True), pred_name)
        if fast is not None:
            return fast
        out = []
        for g1, g2 in zip(_decode(s1), _decode(s2)):
            if g1 is None or g2 is None:
                out.append(None)
            elif g1.is_empty() or g2.is_empty():
                out.append(pred(g1, g2))
            else:
                try:
                    p1, p2 = _gnomonic_pair(g1, g2)
                    out.append(pred(p1, p2))
                except _sphere.HemisphereError:
                    # hemisphere-spanning inputs: exact 3-D edge tests
                    # (S2 EdgeCrosser construction) for the predicates
                    # that have a global path; the rest raise honestly
                    if exact is None:
                        raise
                    out.append(bool(exact(g1, g2)))
        return pd.Series(out, dtype=object)
    return run


def _k_distance_spherical(s1: pd.Series, s2: pd.Series) -> pd.Series:
    return _pair_metric(haversine_m)(s1, s2)


def _k_dwithin_spherical(s1, s2, d) -> pd.Series:
    return k_dwithin_sphere(s1, s2, d)


def _tags1(s: pd.Series) -> np.ndarray:
    """Vectorized edge-tag scan: one C-level join of the 5-byte WKB
    heads + a numpy bit test (the per-row Python loop dominated
    nested-loop predicate joins at millions of pairs)."""
    vals = list(s)
    n = len(vals)
    if n == 0:
        return np.zeros(0, dtype=bool)
    try:
        head = b"".join(b"\0\0\0\0\0" if v is None
                        else (v[:5] if len(v) >= 5 else bytes(5))
                        for v in vals)
        h = np.frombuffer(head, dtype=np.uint8)
        if len(h) == 5 * n:
            h = h.reshape(n, 5)
            hi = np.where(h[:, 0] == 1, h[:, 4], h[:, 1])
            return (hi & 0x10) != 0
    except TypeError:
        pass
    return np.array([_core.is_geog_wkb(v) for v in vals], dtype=bool)


def _tags2(s1: pd.Series, s2: pd.Series) -> np.ndarray:
    return _tags1(s1) & _tags1(s2)


def _coerce_args(rest, n):
    return [r.reset_index(drop=True) if isinstance(r, pd.Series) else r
            for r in rest]


def _sub_args(rest, idx):
    return [r.iloc[idx].reset_index(drop=True) if isinstance(r, pd.Series)
            else r for r in rest]


def _dispatch(planar_fn, spherical_fn, n_geom: int):
    """Per-batch router: all-planar and all-geography batches go straight
    to one kernel; mixed batches compute planar everywhere and overwrite
    the geography rows (rare in practice — a column is one or the other)."""

    def run(*args):
        geoms, rest = args[:n_geom], list(args[n_geom:])
        geoms = [g.reset_index(drop=True) for g in geoms]
        tags = _tags2(*geoms) if n_geom == 2 else _tags1(geoms[0])
        rest = _coerce_args(rest, len(geoms[0]))
        if not tags.any():
            return planar_fn(*geoms, *rest)
        if tags.all():
            return spherical_fn(*geoms, *rest)
        res = planar_fn(*geoms, *rest).reset_index(drop=True)
        idx = np.flatnonzero(tags)
        subs = [g.iloc[idx].reset_index(drop=True) for g in geoms]
        sph = spherical_fn(*subs, *_sub_args(rest, idx))
        res.iloc[idx] = sph.values
        return res
    return run


_SAME_NAME_SPHERICAL: dict[str, tuple] = {
    # predicates (gnomonic reduction -> planar)
    "ST_Intersects": (_spherical_pred_kernel("intersects"), 2),
    "ST_Contains": (_spherical_pred_kernel("contains"), 2),
    "ST_Within": (_spherical_pred_kernel("within"), 2),
    "ST_Covers": (_spherical_pred_kernel("covers"), 2),
    "ST_CoveredBy": (_spherical_pred_kernel("covered_by"), 2),
    "ST_Touches": (_spherical_pred_kernel("touches"), 2),
    "ST_Crosses": (_spherical_pred_kernel("crosses"), 2),
    "ST_Overlaps": (_spherical_pred_kernel("overlaps"), 2),
    "ST_Equals": (_spherical_pred_kernel("equals"), 2),
    "ST_Disjoint": (lambda s1, s2: pd.Series(
        [None if v is None else not v
         for v in _spherical_pred_kernel("intersects")(s1, s2)],
        dtype=object), 2),
    # metrics (meters)
    "ST_Distance": (_k_distance_spherical, 2),
    "ST_DWithin": (_k_dwithin_spherical, 2),
    "ST_Area": (k_area_spheroid, 1),
    "ST_Length": (k_length_spheroid, 1),
    "ST_Perimeter": (k_perimeter_spheroid, 1),
}

for _name, (_sph_fn, _n) in _SAME_NAME_SPHERICAL.items():
    if _name in KERNELS:
        _planar_fn, _rtype, _sig = KERNELS[_name]
        KERNELS[_name] = (_dispatch(_planar_fn, _sph_fn, _n), _rtype, _sig)


# ---- spherical editors: Buffer / Segmentize / Simplify -----------------
# Reference spherical editor set: kernels.rs:177-226 (S2 buffering /
# simplification).  Here: azimuthal-equidistant local projection for
# meter-true buffering, great-circle slerp for segmentize, AEQ + planar
# Douglas-Peucker for simplify — the standard small-geometry reductions.


def _aeq_center(g: Geom):
    v = np.radians(g.all_coords()[:, :2].astype(np.float64))
    xyz = np.column_stack([np.cos(v[:, 1]) * np.cos(v[:, 0]),
                           np.cos(v[:, 1]) * np.sin(v[:, 0]),
                           np.sin(v[:, 1])])
    c = xyz.mean(axis=0)
    n = float(np.linalg.norm(c))
    if n < 1e-12:
        return 0.0, 0.0
    c /= n
    return math.atan2(c[1], c[0]), math.asin(c[2])


def _aeq_project(g: Geom):
    """-> (projected Geom in meters, inverse fn).  Azimuthal equidistant
    on the mean sphere: distances from the projection center are true,
    so a planar buffer by d meters is correct at the center and accurate
    nearby (small-geometry assumption, like S2's cap discretization)."""
    lam0, phi0 = _aeq_center(g)
    sin0, cos0 = math.sin(phi0), math.cos(phi0)
    R = EARTH_RADIUS_M

    def fwd(arr):
        lam = np.radians(arr[:, 0])
        phi = np.radians(arr[:, 1])
        dl = lam - lam0
        cosc = np.clip(sin0 * np.sin(phi) + cos0 * np.cos(phi) * np.cos(dl),
                       -1.0, 1.0)
        c = np.arccos(cosc)
        with np.errstate(invalid="ignore", divide="ignore"):
            k = np.where(c > 1e-12, c / np.sin(c), 1.0)
        x = R * k * np.cos(phi) * np.sin(dl)
        y = R * k * (cos0 * np.sin(phi) - sin0 * np.cos(phi) * np.cos(dl))
        out = arr.copy()
        out[:, 0] = x
        out[:, 1] = y
        return out

    def inv(arr):
        x = arr[:, 0] / R
        y = arr[:, 1] / R
        c = np.hypot(x, y)
        with np.errstate(invalid="ignore", divide="ignore"):
            sc, cc = np.sin(c), np.cos(c)
            phi = np.arcsin(np.clip(
                cc * sin0 + np.where(c > 1e-12, y * sc * cos0 / c, 0.0),
                -1.0, 1.0))
            lam = lam0 + np.arctan2(
                x * sc, c * cos0 * cc - y * sin0 * sc)
        lam = np.where(c <= 1e-12, lam0, lam)
        phi = np.where(c <= 1e-12, phi0, phi)
        out = arr.copy()
        out[:, 0] = (np.degrees(lam) + 180.0) % 360.0 - 180.0
        out[:, 1] = np.degrees(phi)
        return out

    return _alg.transform_coords(g, fwd), inv


def _sph_editor(planar_op):
    def run(s: pd.Series, d) -> pd.Series:
        dv = _coerce(d, len(s))
        out = []
        for g, dd in zip(_decode(s), dv):
            if g is None or dd is None:
                out.append(None)
            elif g.is_empty():
                out.append(_core.to_wkb(g))
            else:
                p, inv = _aeq_project(g)
                res = planar_op(p, float(dd))
                res = _alg.transform_coords(res, inv)
                res.spherical = True
                out.append(_core.to_wkb(res))
        return pd.Series(out, dtype=object)
    return run


def _k_segmentize_spherical(s: pd.Series, d) -> pd.Series:
    """Great-circle interpolation: split any segment whose geodesic
    length exceeds max_m, new vertices by spherical slerp."""
    dv = _coerce(d, len(s))
    out = []
    for g, dd in zip(_decode(s), dv):
        if g is None or dd is None:
            out.append(None)
            continue
        max_m = float(dd)

        def seg_arr(arr):
            arr = np.asarray(arr, dtype=np.float64)
            pieces = [arr[:1]]
            for i in range(len(arr) - 1):
                lon1, lat1 = arr[i, :2]
                lon2, lat2 = arr[i + 1, :2]
                dist = haversine_m(lon1, lat1, lon2, lat2)
                n = max(int(math.ceil(dist / max_m)), 1)
                if n > 1:
                    a1 = np.radians([lon1, lat1])
                    a2 = np.radians([lon2, lat2])
                    v1 = np.array([math.cos(a1[1]) * math.cos(a1[0]),
                                   math.cos(a1[1]) * math.sin(a1[0]),
                                   math.sin(a1[1])])
                    v2 = np.array([math.cos(a2[1]) * math.cos(a2[0]),
                                   math.cos(a2[1]) * math.sin(a2[0]),
                                   math.sin(a2[1])])
                    omega = math.acos(max(-1.0, min(1.0, float(v1 @ v2))))
                    mids = []
                    for j in range(1, n):
                        t = j / n
                        if omega < 1e-12:
                            v = v1
                        else:
                            v = (math.sin((1 - t) * omega) * v1
                                 + math.sin(t * omega) * v2) / math.sin(omega)
                        v = v / np.linalg.norm(v)
                        mids.append([math.degrees(math.atan2(v[1], v[0])),
                                     math.degrees(math.asin(v[2]))])
                    if mids:
                        pieces.append(np.asarray(mids))
                pieces.append(arr[i + 1:i + 2])
            return np.vstack(pieces)

        res = _alg.transform_parts(g, seg_arr) if hasattr(_alg, "transform_parts") \
            else _segmentize_geom(g, seg_arr)
        res.spherical = True
        out.append(_core.to_wkb(res))
    return pd.Series(out, dtype=object)


def _segmentize_geom(g: Geom, seg_arr):
    from sedona_db_spark.geom.core import (
        LINESTRING, MULTILINESTRING, MULTIPOLYGON, POLYGON)
    if g.gt == LINESTRING:
        return Geom(LINESTRING, seg_arr(g.data))
    if g.gt == POLYGON:
        return Geom(POLYGON, [seg_arr(r) for r in g.data])
    if g.gt == MULTILINESTRING:
        return Geom(MULTILINESTRING, [seg_arr(l) for l in g.data])
    if g.gt == MULTIPOLYGON:
        return Geom(MULTIPOLYGON, [[seg_arr(r) for r in p] for p in g.data])
    return g


for _name2, _sph_fn2 in (
        ("ST_Buffer", _sph_editor(lambda g, d: _alg.buffer(g, d))),
        ("ST_Simplify", _sph_editor(lambda g, d: _alg.simplify(g, d))),
        ("ST_Segmentize", _k_segmentize_spherical)):
    if _name2 in KERNELS:
        _pf, _rt, _sg = KERNELS[_name2]
        KERNELS[_name2] = (_dispatch(_pf, _sph_fn2, 1), _rt, _sg)


# spherical overlay dispatch (after the editor loop so _dispatch exists)
for _name3, _op, _opname in (
        ("ST_Intersection", lambda a, b: _alg.intersection(a, b), "intersection"),
        ("ST_Union", lambda a, b: _alg.union2(a, b), "union"),
        ("ST_Difference", lambda a, b: _alg.difference(a, b), "difference"),
        ("ST_SymDifference", lambda a, b: _alg.sym_difference(a, b), "sym_difference")):
    if _name3 in KERNELS:
        _pf3, _rt3, _sg3 = KERNELS[_name3]
        KERNELS[_name3] = (
            _dispatch(_pf3, _spherical_overlay_kernel(_op, _opname), 2),
            _rt3, _sg3)


def _sph_nearest_kernel(as_line: bool):
    """Spherical ClosestPoint / ShortestLine via the exact great-circle
    closest pair (geom/sphere.closest_pair_rad: intersection test +
    vertex-to-arc projections), globally valid — no gnomonic hemisphere
    assumption (kernels.rs ClosestPoint class parity)."""

    def run(s1: pd.Series, s2: pd.Series) -> pd.Series:
        from sedona_db_spark.geom import sphere
        from sedona_db_spark.geom.core import LINESTRING
        out = []
        for g1, g2 in zip(_decode(s1), _decode(s2)):
            if g1 is None or g2 is None or g1.is_empty() or g2.is_empty():
                out.append(None)
                continue
            _ang, p1, p2 = sphere.closest_pair_rad(g1, g2)
            c1 = np.array(sphere.lonlat_of(p1), dtype=np.float64)
            c2 = np.array(sphere.lonlat_of(p2), dtype=np.float64)
            if as_line:
                res = Geom(LINESTRING, np.vstack([c1, c2]))
            else:
                res = Geom(POINT, c1)
            res.spherical = True
            out.append(_core.to_wkb(res))
        return pd.Series(out, dtype=object)
    return run


for _name4, _sph4 in (("ST_ClosestPoint", _sph_nearest_kernel(False)),
                      ("ST_ShortestLine", _sph_nearest_kernel(True))):
    if _name4 in KERNELS:
        _pf4, _rt4, _sg4 = KERNELS[_name4]
        KERNELS[_name4] = (_dispatch(_pf4, _sph4, 2), _rt4, _sg4)


def _slerp(v1: np.ndarray, v2: np.ndarray, t: float) -> np.ndarray:
    omega = math.acos(max(-1.0, min(1.0, float(v1 @ v2))))
    so = math.sin(omega)
    if omega < 1e-12 or so < 1e-9:
        # coincident or (near-)antipodal: the great circle is undefined
        # for antipodes — fall back to the normalized chord (stable,
        # arbitrary-but-deterministic path choice)
        v = (1 - t) * v1 + t * v2
        n = float(np.linalg.norm(v))
        return v1 if n < 1e-9 else v / n
    v = (math.sin((1 - t) * omega) * v1 + math.sin(t * omega) * v2) / so
    return v / np.linalg.norm(v)


def _k_line_interpolate_spherical(s: pd.Series, f) -> pd.Series:
    """Point at `fraction` of the GEODESIC length along a lon/lat line,
    interpolated on the great circle (reference kernels.rs:596)."""
    fv = _coerce(f, len(s))
    out = []
    for g, fr in zip(_decode(s), fv):
        if g is None or fr is None or g.is_empty():
            out.append(None)
            continue
        lines = list(g.lines())
        if not lines:
            out.append(None)
            continue
        arr = np.asarray(lines[0], dtype=np.float64)[:, :2]
        seg = np.array([haversine_m(arr[i, 0], arr[i, 1],
                                    arr[i + 1, 0], arr[i + 1, 1])
                        for i in range(len(arr) - 1)])
        total = float(seg.sum())
        target = min(max(float(fr), 0.0), 1.0) * total
        acc = 0.0
        px, py = arr[-1, 0], arr[-1, 1]
        for i, sl in enumerate(seg):
            if acc + sl >= target or i == len(seg) - 1:
                t = 0.0 if sl == 0 else (target - acc) / sl
                a1 = np.radians(arr[i])
                a2 = np.radians(arr[i + 1])
                v1 = np.array([math.cos(a1[1]) * math.cos(a1[0]),
                               math.cos(a1[1]) * math.sin(a1[0]),
                               math.sin(a1[1])])
                v2 = np.array([math.cos(a2[1]) * math.cos(a2[0]),
                               math.cos(a2[1]) * math.sin(a2[0]),
                               math.sin(a2[1])])
                v = _slerp(v1, v2, min(max(t, 0.0), 1.0))
                px = math.degrees(math.atan2(v[1], v[0]))
                py = math.degrees(math.asin(v[2]))
                break
            acc += sl
        res = Geom(POINT, np.array([px, py]))
        res.spherical = True
        out.append(_core.to_wkb(res))
    return pd.Series(out, dtype=object)


if "ST_LineInterpolatePoint" in KERNELS:
    _pf5, _rt5, _sg5 = KERNELS["ST_LineInterpolatePoint"]
    KERNELS["ST_LineInterpolatePoint"] = (
        _dispatch(_pf5, _k_line_interpolate_spherical, 1), _rt5, _sg5)
