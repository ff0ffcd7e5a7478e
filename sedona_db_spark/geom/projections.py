"""Native map projections for ST_Transform — SURVEY §2.1 ST_Transform
(reference uses PROJ via c/sedona-proj; PROJ is unavailable here, so the
common projections are implemented directly from the public formulas).

UTM: transverse Mercator by the Krüger series (4th-order in the third
flattening n — the same series PROJ's `etmerc`/Karney method uses at low
order; accuracy ~1 mm within a zone).  WGS84 parameters.
"""

from __future__ import annotations

import math

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
K0 = 0.9996
E0 = 500000.0
_n = WGS84_F / (2.0 - WGS84_F)
_A = WGS84_A / (1 + _n) * (1 + _n ** 2 / 4 + _n ** 4 / 64)
_e = math.sqrt(WGS84_F * (2 - WGS84_F))

_ALPHA = (
    _n / 2 - 2 * _n ** 2 / 3 + 5 * _n ** 3 / 16,
    13 * _n ** 2 / 48 - 3 * _n ** 3 / 5,
    61 * _n ** 3 / 240,
)
_BETA = (
    _n / 2 - 2 * _n ** 2 / 3 + 37 * _n ** 3 / 96,
    _n ** 2 / 48 + _n ** 3 / 15,
    17 * _n ** 3 / 480,
)
_DELTA = (
    2 * _n - 2 * _n ** 2 / 3 - 2 * _n ** 3,
    7 * _n ** 2 / 3 - 8 * _n ** 3 / 5,
    56 * _n ** 3 / 15,
)


def utm_zone_central_meridian(zone: int) -> float:
    return float((zone - 1) * 6 - 180 + 3)


def utm_forward(lon: np.ndarray, lat: np.ndarray, zone: int,
                north: bool) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) degrees -> UTM (easting, northing) meters, vectorized."""
    lam0 = math.radians(utm_zone_central_meridian(zone))
    lam = np.radians(np.asarray(lon, dtype=np.float64)) - lam0
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    s = np.sin(phi)
    t = np.sinh(np.arctanh(s) - _e * np.arctanh(_e * s))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    E = E0 + K0 * _A * eta
    N = K0 * _A * xi
    if not north:
        N = N + 10000000.0
    return E, N


def utm_inverse(E: np.ndarray, N: np.ndarray, zone: int,
                north: bool) -> tuple[np.ndarray, np.ndarray]:
    """UTM meters -> (lon, lat) degrees, vectorized."""
    lam0 = math.radians(utm_zone_central_meridian(zone))
    N = np.asarray(N, dtype=np.float64)
    if not north:
        N = N - 10000000.0
    xi = N / (K0 * _A)
    eta = (np.asarray(E, dtype=np.float64) - E0) / (K0 * _A)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.clip(np.sin(xi_p) / np.cosh(eta_p), -1.0, 1.0))
    phi = chi.copy()
    for j, d in enumerate(_DELTA, start=1):
        phi += d * np.sin(2 * j * chi)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.degrees(lam + lam0), np.degrees(phi)


def parse_utm_epsg(code: str) -> tuple[int, bool] | None:
    """EPSG:326xx -> (zone, north=True); EPSG:327xx -> (zone, False)."""
    c = code.upper().replace("EPSG:", "")
    if not c.isdigit() or len(c) != 5:
        return None
    v = int(c)
    if 32601 <= v <= 32660:
        return v - 32600, True
    if 32701 <= v <= 32760:
        return v - 32700, False
    return None


# ======================================================================
# Conic / azimuthal families (Snyder, "Map Projections — A Working
# Manual", USGS PP 1395: LCC pp.107-109, Albers pp.101-102, polar
# stereographic pp.160-162, LAEA pp.187-190).  Reference surface:
# c/sedona-proj + rust/sedona-functions/src/st_transform.rs:45 (PROJ);
# PROJ is unavailable here so the families are implemented directly.
# Ellipsoids are WGS84/GRS80; ETRS89, NAD83, GDA94 and RGF93 are treated
# as coincident with WGS84 (standard meter-level assumption, no Helmert).
# ======================================================================

GRS80_A = 6378137.0
GRS80_F = 1.0 / 298.257222101


INTL24_A = 6378388.0           # International 1924 (Hayford)
INTL24_F = 1.0 / 297.0
AIRY_A = 6377563.396
AIRY_F = 1.0 / 299.3249646

_ELLIPSOIDS = {
    "GRS80": (GRS80_A, GRS80_F),
    "WGS84": (WGS84_A, WGS84_F),
    "INTL24": (INTL24_A, INTL24_F),
    "AIRY": (AIRY_A, AIRY_F),
    "WGS72": (6378135.0, 1.0 / 298.26),
    # legacy national ellipsoids for the round-7 registry families
    "BESSEL": (6377397.155, 1.0 / 299.1528128),      # Bessel 1841
    "CLARKE66": (6378206.4, 1.0 / 294.9786982139006),  # Clarke 1866
    "KRASS": (6378245.0, 1.0 / 298.3),               # Krassowsky 1940
    # GRS 1967 Modified (SIRGAS docs; SAD69 uses 1/f = 298.25 exactly)
    "GRS67": (6378160.0, 1.0 / 298.25),
    # authalic spheres (f = 0): US National Atlas (Clarke 1866 authalic)
    # and the EASE-Grid 1.0 International 1924 authalic sphere
    "SPHERE_ATLAS": (6370997.0, 0.0),
    "SPHERE_EASE1": (6371228.0, 0.0),
    # round-11: Helmert 1906 (Egypt 1907 belts), Indonesian National
    # 1974, Everest 1830 (1937 adjustment), Clarke 1880 (RGS)
    "HELMERT1906": (6378200.0, 1.0 / 298.3),
    "INDO74": (6378160.0, 1.0 / 298.247),
    "EVEREST37": (6377276.345, 1.0 / 300.8017),
    "CLARKE80RGS": (6378249.145, 1.0 / 293.465),
    # round-10 tranche: IAG 1975 (Xian 1980) and the ORIGINAL GRS 1967
    # (HD72; distinct from the SAD69 "GRS 1967 Modified" 1/f=298.25)
    "XIAN80": (6378140.0, 1.0 / 298.257),
    "GRS67_ORIG": (6378160.0, 1.0 / 298.247167427),
}


def _ell(ellps: str):
    a, f = _ELLIPSOIDS.get(ellps, (WGS84_A, WGS84_F))
    e2 = f * (2 - f)
    return a, math.sqrt(e2), e2


def _t_snyder(phi, e):
    s = e * np.sin(phi)
    return np.tan(np.pi / 4 - phi / 2) / np.power((1 - s) / (1 + s), e / 2)


def _m_snyder(phi, e):
    return np.cos(phi) / np.sqrt(1 - (e * np.sin(phi)) ** 2)


def _phi_from_t(t, e, iters: int = 15):
    """Invert t(phi) by fixed point (converges to ~1e-12 rad in <10)."""
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(iters):
        s = e * np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(t * np.power((1 - s) / (1 + s), e / 2))
    return phi


def _q_snyder(phi, e, e2):
    s = np.sin(phi)
    return (1 - e2) * (s / (1 - e2 * s * s)
                       - (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s)))


def _phi_from_q(q, e, e2, iters: int = 15):
    phi = np.arcsin(np.clip(q / 2, -1.0, 1.0))
    for _ in range(iters):
        s = np.sin(phi)
        den = (1 - e2 * s * s) ** 2 / (2 * np.cos(phi))
        corr = (q / (1 - e2) - s / (1 - e2 * s * s)
                + (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s)))
        phi = phi + den * corr
    return phi


def _q_any(phi, e, e2):
    """Snyder's q, sphere-safe: the e -> 0 limit is q = 2 sin(phi)
    (the 1/(2e)·log term -> sin(phi)), which the general form cannot
    evaluate (division by e)."""
    if e == 0.0:
        return 2.0 * np.sin(phi)
    return _q_snyder(phi, e, e2)


def _phi_from_q_any(q, e, e2):
    if e == 0.0:
        return np.arcsin(np.clip(np.asarray(q) / 2.0, -1.0, 1.0))
    return _phi_from_q(q, e, e2)




def _wrap_lon(lon_deg):
    """Normalize degrees longitude to [-180, 180)."""
    return (np.asarray(lon_deg) + 180.0) % 360.0 - 180.0

class LambertConformalConic2SP:
    def __init__(self, lat0, lon0, sp1, sp2, fe, fn, ellps="GRS80"):
        self.a, self.e, _ = _ell(ellps)
        p0, p1, p2 = map(math.radians, (lat0, sp1, sp2))
        self.lam0 = math.radians(lon0)
        m1 = float(_m_snyder(np.float64(p1), self.e))
        m2 = float(_m_snyder(np.float64(p2), self.e))
        t0 = float(_t_snyder(np.float64(p0), self.e))
        t1 = float(_t_snyder(np.float64(p1), self.e))
        t2 = float(_t_snyder(np.float64(p2), self.e))
        self.n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
        self.F = m1 / (self.n * t1 ** self.n)
        self.rho0 = self.a * self.F * t0 ** self.n
        self.fe, self.fn = fe, fn

    def forward(self, lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        t = _t_snyder(phi, self.e)
        rho = self.a * self.F * np.power(t, self.n)
        th = self.n * (lam - self.lam0)
        return self.fe + rho * np.sin(th), self.fn + self.rho0 - rho * np.cos(th)

    def inverse(self, x, y):
        dx = np.asarray(x, dtype=np.float64) - self.fe
        dy = self.rho0 - (np.asarray(y, dtype=np.float64) - self.fn)
        sign = 1.0 if self.n >= 0 else -1.0
        rho = sign * np.hypot(dx, dy)
        t = np.power(rho / (self.a * self.F), 1.0 / self.n)
        th = np.arctan2(sign * dx, sign * dy)
        phi = _phi_from_t(t, self.e)
        return (_wrap_lon(np.degrees(th / self.n + self.lam0)), np.degrees(phi))


class AlbersEqualArea2SP:
    def __init__(self, lat0, lon0, sp1, sp2, fe, fn, ellps="GRS80"):
        self.a, self.e, self.e2 = _ell(ellps)
        p0, p1, p2 = map(math.radians, (lat0, sp1, sp2))
        self.lam0 = math.radians(lon0)
        m1 = float(_m_snyder(np.float64(p1), self.e))
        m2 = float(_m_snyder(np.float64(p2), self.e))
        q0 = float(_q_snyder(np.float64(p0), self.e, self.e2))
        q1 = float(_q_snyder(np.float64(p1), self.e, self.e2))
        q2 = float(_q_snyder(np.float64(p2), self.e, self.e2))
        self.n = (m1 * m1 - m2 * m2) / (q2 - q1)
        self.C = m1 * m1 + self.n * q1
        self.rho0 = self.a * math.sqrt(self.C - self.n * q0) / self.n
        self.fe, self.fn = fe, fn

    def forward(self, lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        q = _q_snyder(phi, self.e, self.e2)
        rho = self.a * np.sqrt(self.C - self.n * q) / self.n
        th = self.n * (lam - self.lam0)
        return self.fe + rho * np.sin(th), self.fn + self.rho0 - rho * np.cos(th)

    def inverse(self, x, y):
        dx = np.asarray(x, dtype=np.float64) - self.fe
        dy = self.rho0 - (np.asarray(y, dtype=np.float64) - self.fn)
        sign = 1.0 if self.n >= 0 else -1.0
        rho = sign * np.hypot(dx, dy)
        q = (self.C - (rho * self.n / self.a) ** 2) / self.n
        th = np.arctan2(sign * dx, sign * dy)
        phi = _phi_from_q(q, self.e, self.e2)
        return (_wrap_lon(np.degrees(th / self.n + self.lam0)), np.degrees(phi))


class PolarStereographic:
    """Variant B (standard parallel lat_ts), north or south aspect.
    ``variant_a`` builds the EPSG Variant A form (scale factor k0 at the
    pole — UPS): identical mapping with rho = 2 a k0 t /
    sqrt((1+e)^(1+e) (1-e)^(1-e)) (Snyder eq. 21-33), so only the
    precomputed rho/t constant differs."""

    def __init__(self, lat_ts, lon0, fe, fn, south: bool, ellps="WGS84"):
        self.a, self.e, _ = _ell(ellps)
        self.lam0 = math.radians(lon0)
        self.south = south
        pts = math.radians(abs(lat_ts))
        tc = float(_t_snyder(np.float64(pts), self.e))
        mc = float(_m_snyder(np.float64(pts), self.e))
        self.k = self.a * mc / tc  # rho = k * t
        self.fe, self.fn = fe, fn

    @classmethod
    def variant_a(cls, k0, lon0, fe, fn, south: bool, ellps="WGS84"):
        # any non-polar lat_ts works: the constant is overwritten below
        self = cls(71.0, lon0, fe, fn, south, ellps)
        e = self.e
        self.k = (2.0 * self.a * k0
                  / math.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e)))
        return self

    def forward(self, lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        if self.south:
            lam, phi = -lam, -phi
            lam0 = -self.lam0
        else:
            lam0 = self.lam0
        t = _t_snyder(phi, self.e)
        rho = self.k * t
        x = rho * np.sin(lam - lam0)
        y = -rho * np.cos(lam - lam0)
        if self.south:
            x, y = -x, -y
        return self.fe + x, self.fn + y

    def inverse(self, x, y):
        dx = np.asarray(x, dtype=np.float64) - self.fe
        dy = np.asarray(y, dtype=np.float64) - self.fn
        if self.south:
            dx, dy = -dx, -dy
            lam0 = -self.lam0
        else:
            lam0 = self.lam0
        rho = np.hypot(dx, dy)
        t = rho / self.k
        phi = _phi_from_t(t, self.e)
        lam = lam0 + np.arctan2(dx, -dy)
        if self.south:
            return _wrap_lon(np.degrees(-lam)), np.degrees(-phi)
        return _wrap_lon(np.degrees(lam)), np.degrees(phi)


class LambertAzimuthalEqualArea:
    def __init__(self, lat0, lon0, fe, fn, ellps="GRS80"):
        self.a, self.e, self.e2 = _ell(ellps)
        p0 = math.radians(lat0)
        self.lam0 = math.radians(lon0)
        self.qp = float(_q_any(np.float64(np.pi / 2), self.e, self.e2))
        # polar aspect (Snyder 1987 eq. 24-23..24-31): the oblique D =
        # a·m0/(Rq·cos(b0)) degenerates 0/0 at |lat0| = 90
        self.polar = 1 if lat0 >= 89.9999999 else (
            -1 if lat0 <= -89.9999999 else 0)
        self.fe, self.fn = fe, fn
        if self.polar:
            return
        q0 = float(_q_any(np.float64(p0), self.e, self.e2))
        self.b0 = math.asin(q0 / self.qp)
        self.Rq = self.a * math.sqrt(self.qp / 2)
        m0 = float(_m_snyder(np.float64(p0), self.e))
        self.D = self.a * m0 / (self.Rq * math.cos(self.b0))

    def forward(self, lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        q = _q_any(phi, self.e, self.e2)
        dl = lam - self.lam0
        if self.polar:
            rho = self.a * np.sqrt(np.maximum(self.qp - self.polar * q, 0.0))
            x = self.fe + rho * np.sin(dl)
            y = self.fn - self.polar * rho * np.cos(dl)
            return x, y
        b = np.arcsin(np.clip(q / self.qp, -1.0, 1.0))
        denom = 1 + math.sin(self.b0) * np.sin(b) + math.cos(self.b0) * np.cos(b) * np.cos(dl)
        B = self.Rq * np.sqrt(2.0 / denom)
        x = B * self.D * np.cos(b) * np.sin(dl)
        y = (B / self.D) * (math.cos(self.b0) * np.sin(b)
                            - math.sin(self.b0) * np.cos(b) * np.cos(dl))
        return self.fe + x, self.fn + y

    def inverse(self, x, y):
        if self.polar:
            dx = np.asarray(x, dtype=np.float64) - self.fe
            dy = np.asarray(y, dtype=np.float64) - self.fn
            rho = np.hypot(dx, dy)
            q = self.polar * (self.qp - (rho / self.a) ** 2)
            lam = self.lam0 + np.arctan2(dx, -self.polar * dy)
            lam = np.where(rho == 0, self.lam0, lam)
            phi = _phi_from_q_any(q, self.e, self.e2)
            return _wrap_lon(np.degrees(lam)), np.degrees(phi)
        dx = (np.asarray(x, dtype=np.float64) - self.fe) / self.D
        dy = (np.asarray(y, dtype=np.float64) - self.fn) * self.D
        rho = np.hypot(dx, dy)
        with np.errstate(invalid="ignore", divide="ignore"):
            ce = 2 * np.arcsin(np.clip(rho / (2 * self.Rq), -1.0, 1.0))
            q = self.qp * (np.cos(ce) * math.sin(self.b0)
                           + dy * np.sin(ce) * math.cos(self.b0) / rho)
            lam = self.lam0 + np.arctan2(
                dx * np.sin(ce),
                rho * math.cos(self.b0) * np.cos(ce)
                - dy * math.sin(self.b0) * np.sin(ce))
        # at the projection origin rho == 0: q/lam degenerate -> origin
        q = np.where(rho == 0, self.qp * math.sin(self.b0), q)
        lam = np.where(rho == 0, self.lam0, lam)
        phi = _phi_from_q_any(q, self.e, self.e2)
        return _wrap_lon(np.degrees(lam)), np.degrees(phi)


class CylindricalEqualArea:
    """Normal-aspect ellipsoidal cylindrical equal-area (Snyder 1987
    eq. 10-13..10-16): x = a·k0·dλ, y = a·q/(2·k0) with
    k0 = cos(φts)/sqrt(1 − e²·sin²(φts)).  Registered for the EASE-Grid
    family (EPSG:6933 on WGS84, EPSG:3410 on the International authalic
    sphere, both lat_ts = 30)."""

    def __init__(self, lat_ts, lon0, fe, fn, ellps="WGS84"):
        self.a, self.e, self.e2 = _ell(ellps)
        ts = math.radians(lat_ts)
        self.k0 = math.cos(ts) / math.sqrt(1 - self.e2 * math.sin(ts) ** 2)
        self.lam0 = math.radians(lon0)
        self.fe, self.fn = fe, fn

    def forward(self, lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        dl = np.arctan2(np.sin(lam - self.lam0), np.cos(lam - self.lam0))
        q = _q_any(phi, self.e, self.e2)
        return (self.fe + self.a * self.k0 * dl,
                self.fn + self.a * q / (2.0 * self.k0))

    def inverse(self, x, y):
        dx = np.asarray(x, dtype=np.float64) - self.fe
        dy = np.asarray(y, dtype=np.float64) - self.fn
        lam = self.lam0 + dx / (self.a * self.k0)
        q = 2.0 * self.k0 * dy / self.a
        phi = _phi_from_q_any(q, self.e, self.e2)
        return _wrap_lon(np.degrees(lam)), np.degrees(phi)


class TransverseMercator:
    """General Krüger-series TM (any ellipsoid / lat0 / k0 / false origin) —
    the same math as the UTM fast path above but fully parameterized, for
    national grids (OSGB 27700, NZTM 2193) and the ETRS89/NAD83 UTM ranges."""

    def __init__(self, lat0, lon0, k0, fe, fn, a, f):
        self.a_ell, self.f_ell = a, f
        n = f / (2.0 - f)
        self.A = a / (1 + n) * (1 + n ** 2 / 4 + n ** 4 / 64)
        self.e = math.sqrt(f * (2 - f))
        self.alpha = (
            n / 2 - 2 * n ** 2 / 3 + 5 * n ** 3 / 16,
            13 * n ** 2 / 48 - 3 * n ** 3 / 5,
            61 * n ** 3 / 240,
        )
        self.beta = (
            n / 2 - 2 * n ** 2 / 3 + 37 * n ** 3 / 96,
            n ** 2 / 48 + n ** 3 / 15,
            17 * n ** 3 / 480,
        )
        self.delta = (
            2 * n - 2 * n ** 2 / 3 - 2 * n ** 3,
            7 * n ** 2 / 3 - 8 * n ** 3 / 5,
            56 * n ** 3 / 15,
        )
        self.lam0 = math.radians(lon0)
        self.k0, self.fe, self.fn = k0, fe, fn
        # meridian arc to the latitude of false origin
        self.xi0 = self._xi_of_lat(math.radians(lat0)) if lat0 else 0.0

    def _xi_of_lat(self, phi):
        s = math.sin(phi)
        if abs(s) >= 1.0:
            # polar latitude-of-origin (Argentina Gauss-Krüger fajas use
            # lat0 = -90): atanh(+-1) diverges but the limit is exact —
            # t -> +-inf, xi_p -> +-pi/2, and every series term
            # sin(2*j*pi/2) vanishes
            return math.copysign(math.pi / 2, s)
        t = math.sinh(math.atanh(s) - self.e * math.atanh(self.e * s))
        xi_p = math.atan(t)
        xi = xi_p
        for j, a in enumerate(self.alpha, start=1):
            xi += a * math.sin(2 * j * xi_p)
        return xi

    def forward(self, lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64)) - self.lam0
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        s = np.sin(phi)
        t = np.sinh(np.arctanh(s) - self.e * np.arctanh(self.e * s))
        xi_p = np.arctan2(t, np.cos(lam))
        eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
        xi, eta = xi_p.copy(), eta_p.copy()
        for j, a in enumerate(self.alpha, start=1):
            xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
            eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
        return (self.fe + self.k0 * self.A * eta,
                self.fn + self.k0 * self.A * (xi - self.xi0))

    def inverse(self, x, y):
        xi = (np.asarray(y, dtype=np.float64) - self.fn) / (self.k0 * self.A) + self.xi0
        eta = (np.asarray(x, dtype=np.float64) - self.fe) / (self.k0 * self.A)
        xi_p, eta_p = xi.copy(), eta.copy()
        for j, b in enumerate(self.beta, start=1):
            xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        chi = np.arcsin(np.clip(np.sin(xi_p) / np.cosh(eta_p), -1.0, 1.0))
        phi = chi.copy()
        for j, d in enumerate(self.delta, start=1):
            phi += d * np.sin(2 * j * chi)
        lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
        return _wrap_lon(np.degrees(lam + self.lam0)), np.degrees(phi)


# ---- Helmert 7-parameter datum shift (Bursa-Wolf, small-angle) --------

def _geodetic_to_ecef(lon_deg, lat_deg, a, e2):
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    s, c = np.sin(phi), np.cos(phi)
    nu = a / np.sqrt(1 - e2 * s * s)
    return nu * c * np.cos(lam), nu * c * np.sin(lam), nu * (1 - e2) * s


def _ecef_to_geodetic(X, Y, Z, a, e2, iters=15):
    lam = np.arctan2(Y, X)
    p = np.hypot(X, Y)
    phi = np.arctan2(Z, p * (1 - e2))
    for _ in range(iters):
        s = np.sin(phi)
        nu = a / np.sqrt(1 - e2 * s * s)
        phi = np.arctan2(Z + e2 * nu * s, p)
    return np.degrees(lam), np.degrees(phi)


class HelmertTM:
    """TM projection on a non-WGS84 datum, reached from WGS84 lon/lat via a
    Bursa-Wolf 7-parameter shift (the grid-free path PROJ uses when no
    NTv2/OSTN grids are installed; ~5 m vs the grid for OSGB)."""

    def __init__(self, tm: TransverseMercator, t, r_arcsec, s_ppm):
        self.tm = tm
        self.t = t
        self.r = tuple(math.radians(v / 3600.0) for v in r_arcsec)
        self.s = 1.0 + s_ppm * 1e-6
        self.e2_dst = tm.f_ell * (2 - tm.f_ell)
        # the exact inverse of the linearized rotation actually applied
        # in forward (the transpose is only O(r^2)-accurate: ~4 mm for
        # the 5" MGI rotations)
        rx, ry, rz = self.r
        m = np.array([[1.0, -rz, ry], [rz, 1.0, -rx], [-ry, rx, 1.0]])
        self._minv = np.linalg.inv(m)

    def _shift(self, X, Y, Z, invert=False):
        tx, ty, tz = self.t
        rx, ry, rz = self.r
        if invert:
            Xp = (X - tx) / self.s
            Yp = (Y - ty) / self.s
            Zp = (Z - tz) / self.s
            m = self._minv
            return (m[0, 0] * Xp + m[0, 1] * Yp + m[0, 2] * Zp,
                    m[1, 0] * Xp + m[1, 1] * Yp + m[1, 2] * Zp,
                    m[2, 0] * Xp + m[2, 1] * Yp + m[2, 2] * Zp)
        return (tx + self.s * (X - rz * Y + ry * Z),
                ty + self.s * (rz * X + Y - rx * Z),
                tz + self.s * (-ry * X + rx * Y + Z))

    def forward(self, lon, lat):
        X, Y, Z = _geodetic_to_ecef(lon, lat, WGS84_A, WGS84_F * (2 - WGS84_F))
        X, Y, Z = self._shift(X, Y, Z)
        lon2, lat2 = _ecef_to_geodetic(X, Y, Z, self.tm.a_ell, self.e2_dst)
        return self.tm.forward(lon2, lat2)

    def inverse(self, x, y):
        lon2, lat2 = self.tm.inverse(x, y)
        X, Y, Z = _geodetic_to_ecef(lon2, lat2, self.tm.a_ell, self.e2_dst)
        X, Y, Z = self._shift(X, Y, Z, invert=True)
        return _ecef_to_geodetic(X, Y, Z, WGS84_A, WGS84_F * (2 - WGS84_F))


class LambertConformalConic1SP:
    """EPSG method 9801 (LCC with one standard parallel + scale factor),
    e.g. the legacy French NTF Lambert zones and Jamaica grids."""

    def __init__(self, lat0, lon0, k0, fe, fn, a, f):
        self.a, self.f = a, f
        e2 = f * (2 - f)
        self.e = math.sqrt(e2)
        p0 = math.radians(lat0)
        self.lam0 = math.radians(lon0)
        m0 = float(_m_snyder(np.float64(p0), self.e))
        t0 = float(_t_snyder(np.float64(p0), self.e))
        self.n = math.sin(p0)
        self.F = m0 / (self.n * t0 ** self.n)
        self.rho0 = a * self.F * t0 ** self.n * k0
        self.aFk = a * self.F * k0
        self.fe, self.fn = fe, fn

    def forward(self, lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        t = _t_snyder(phi, self.e)
        rho = self.aFk * np.power(t, self.n)
        th = self.n * (lam - self.lam0)
        return self.fe + rho * np.sin(th), self.fn + self.rho0 - rho * np.cos(th)

    def inverse(self, x, y):
        dx = np.asarray(x, dtype=np.float64) - self.fe
        dy = self.rho0 - (np.asarray(y, dtype=np.float64) - self.fn)
        sign = 1.0 if self.n >= 0 else -1.0
        rho = sign * np.hypot(dx, dy)
        t = np.power(rho / self.aFk, 1.0 / self.n)
        th = np.arctan2(sign * dx, sign * dy)
        phi = _phi_from_t(t, self.e)
        return _wrap_lon(np.degrees(th / self.n + self.lam0)), np.degrees(phi)


class Krovak:
    """EPSG method 9819 (Krovak oblique conformal conic, S-JTSK) in the
    East-North orientation of EPSG:5514 (east = -westing, north =
    -southing).  Constants and flow follow the published EPSG Guidance
    Note 7-2 formulas; validated on its worked example."""

    def __init__(self):
        a, f = 6377397.155, 1.0 / 299.1528128   # Bessel 1841
        self.a = a
        e2 = f * (2 - f)
        self.e = math.sqrt(e2)
        phi_c = math.radians(49.5)               # projection centre latitude
        # 42d30' east of Ferro == 24d50' east of Greenwich
        self.lam0 = math.radians(24.0 + 50.0 / 60.0)
        self.alpha = math.radians(30.0 + 17.0 / 60.0 + 17.3031 / 3600.0)
        phi_1 = math.radians(78.5)               # pseudo standard parallel
        k_p = 0.9999
        self.B = math.sqrt(1 + e2 * math.cos(phi_c) ** 4 / (1 - e2))
        A_ = a * math.sqrt(1 - e2) / (1 - e2 * math.sin(phi_c) ** 2)
        self.gamma0 = math.asin(math.sin(phi_c) / self.B)
        self.t0 = (math.tan(math.pi / 4 + self.gamma0 / 2)
                   * ((1 + self.e * math.sin(phi_c))
                      / (1 - self.e * math.sin(phi_c))) ** (self.e * self.B / 2)
                   / math.tan(math.pi / 4 + phi_c / 2) ** self.B)
        self.n = math.sin(phi_1)
        self.r0 = k_p * A_ / math.tan(phi_1)
        self.tan_p1 = math.tan(phi_1 / 2 + math.pi / 4)

    def _gamma(self, phi):
        s = np.sin(phi)
        return 2 * (np.arctan(
            self.t0 * np.tan(phi / 2 + np.pi / 4) ** self.B
            / ((1 + self.e * s) / (1 - self.e * s)) ** (self.e * self.B / 2))
            - np.pi / 4)

    def forward(self, lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        U = self._gamma(phi)
        V = self.B * (self.lam0 - lam)
        T = np.arcsin(np.clip(math.cos(self.alpha) * np.sin(U)
                              + math.sin(self.alpha) * np.cos(U) * np.cos(V),
                              -1.0, 1.0))
        D = np.arcsin(np.clip(np.cos(U) * np.sin(V) / np.cos(T), -1.0, 1.0))
        theta = self.n * D
        r = self.r0 * self.tan_p1 ** self.n \
            / np.tan(T / 2 + np.pi / 4) ** self.n
        southing = r * np.cos(theta)
        westing = r * np.sin(theta)
        return -westing, -southing   # EPSG:5514 East-North

    def inverse(self, x, y):
        westing = -np.asarray(x, dtype=np.float64)
        southing = -np.asarray(y, dtype=np.float64)
        r = np.hypot(westing, southing)
        theta = np.arctan2(westing, southing)
        D = theta / self.n
        T = 2 * (np.arctan((self.r0 * self.tan_p1 ** self.n / r)
                           ** (1.0 / self.n)) - np.pi / 4)
        U = np.arcsin(np.clip(math.cos(self.alpha) * np.sin(T)
                              - math.sin(self.alpha) * np.cos(T) * np.cos(D),
                              -1.0, 1.0))
        V = np.arcsin(np.clip(np.cos(T) * np.sin(D) / np.cos(U), -1.0, 1.0))
        lam = self.lam0 - V / self.B
        # invert the conformal latitude by fixed point
        phi = U.copy()
        for _ in range(15):
            s = np.sin(phi)
            phi = 2 * (np.arctan(
                (np.tan(U / 2 + np.pi / 4) / self.t0
                 * ((1 + self.e * s) / (1 - self.e * s))
                 ** (self.e * self.B / 2)) ** (1.0 / self.B)) - np.pi / 4)
        return _wrap_lon(np.degrees(lam)), np.degrees(phi)


class HelmertProj:
    """Any projection on a non-WGS84 datum behind a Bursa-Wolf shift.

    `proj` must expose forward/inverse plus `a`/`e` (its ellipsoid), as
    the conic classes do; params are the dst-from-WGS84 7 parameters."""

    def __init__(self, proj, t, r_arcsec, s_ppm):
        self.proj = proj
        self.t = t
        self.r = tuple(math.radians(v / 3600.0) for v in r_arcsec)
        self.s = 1.0 + s_ppm * 1e-6
        self.e2_dst = float(proj.e) ** 2
        self.a_dst = float(proj.a)
        rx, ry, rz = self.r
        m = np.array([[1.0, -rz, ry], [rz, 1.0, -rx], [-ry, rx, 1.0]])
        self._minv = np.linalg.inv(m)

    _shift = HelmertTM._shift

    def forward(self, lon, lat):
        X, Y, Z = _geodetic_to_ecef(lon, lat, WGS84_A, WGS84_F * (2 - WGS84_F))
        X, Y, Z = self._shift(X, Y, Z)
        lon2, lat2 = _ecef_to_geodetic(X, Y, Z, self.a_dst, self.e2_dst)
        return self.proj.forward(lon2, lat2)

    def inverse(self, x, y):
        lon2, lat2 = self.proj.inverse(x, y)
        X, Y, Z = _geodetic_to_ecef(lon2, lat2, self.a_dst, self.e2_dst)
        X, Y, Z = self._shift(X, Y, Z, invert=True)
        return _ecef_to_geodetic(X, Y, Z, WGS84_A, WGS84_F * (2 - WGS84_F))


US_SURVEY_FOOT = 1200.0 / 3937.0      # exact EPSG 9003 definition
INTL_FOOT = 0.3048                    # exact EPSG 9002 definition


class ScaledAxes:
    """A projected CRS identical to ``proj`` but with its easting/
    northing axes in a non-metre unit.  EPSG publishes these as
    distinct codes (e.g. 2225 'NAD83 / California zone 1 (ftUS)' is the
    unit conversion of 26941): the conversion parameters are the same
    to the micrometre, only the axis unit changes, so the wrapper
    divides on the way out and multiplies on the way in.  The reference
    resolves these codes through PROJ's unit table
    (c/sedona-proj/src/transform.rs); here the unit is explicit data."""

    def __init__(self, proj, unit_m):
        self.proj = proj
        self.unit_m = float(unit_m)

    def forward(self, lon, lat):
        x, y = self.proj.forward(lon, lat)
        return x / self.unit_m, y / self.unit_m

    def inverse(self, x, y):
        return self.proj.inverse(np.asarray(x, dtype=float) * self.unit_m,
                                 np.asarray(y, dtype=float) * self.unit_m)


class SwissObliqueMercator:
    """CH1903+/LV95 (EPSG:2056): swisstopo's conformal double projection —
    Bessel ellipsoid -> conformal sphere -> equator rotation -> Mercator
    (public swisstopo 'Formulas and constants' document, rigorous path)."""

    BESSEL_A = 6377397.155
    BESSEL_F = 1.0 / 299.1528128

    def __init__(self, fe=2600000.0, fn=1200000.0):
        self.a = self.BESSEL_A
        e2 = self.BESSEL_F * (2 - self.BESSEL_F)
        self.e = math.sqrt(e2)
        b0 = math.radians(46.0 + 57.0 / 60.0 + 8.66 / 3600.0)   # Bern lat
        self.lam0 = math.radians(7.0 + 26.0 / 60.0 + 22.50 / 3600.0)
        s0 = math.sin(b0)
        self.R = self.a * math.sqrt(1 - e2) / (1 - e2 * s0 * s0)
        self.alpha = math.sqrt(1 + e2 / (1 - e2) * math.cos(b0) ** 4)
        self.b0s = math.asin(s0 / self.alpha)   # sphere latitude of origin
        self.K = (math.log(math.tan(math.pi / 4 + self.b0s / 2))
                  - self.alpha * math.log(math.tan(math.pi / 4 + b0 / 2))
                  + self.alpha * self.e / 2
                  * math.log((1 + self.e * s0) / (1 - self.e * s0)))
        self.fe, self.fn = fe, fn

    def forward(self, lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        s = np.sin(phi)
        # ellipsoid -> conformal sphere
        S = (self.alpha * np.log(np.tan(np.pi / 4 + phi / 2))
             - self.alpha * self.e / 2
             * np.log((1 + self.e * s) / (1 - self.e * s)) + self.K)
        b = 2 * (np.arctan(np.exp(S)) - np.pi / 4)
        l = self.alpha * (lam - self.lam0)
        # rotation to the pseudo-equator system
        lb = np.arctan2(np.sin(l), np.sin(self.b0s) * np.tan(b)
                        + np.cos(self.b0s) * np.cos(l))
        bb = np.arcsin(np.clip(np.cos(self.b0s) * np.sin(b)
                               - np.sin(self.b0s) * np.cos(b) * np.cos(l),
                               -1.0, 1.0))
        E = self.fe + self.R * lb
        N = self.fn + self.R / 2 * np.log((1 + np.sin(bb)) / (1 - np.sin(bb)))
        return E, N

    def inverse(self, x, y):
        lb = (np.asarray(x, dtype=np.float64) - self.fe) / self.R
        bb = 2 * (np.arctan(np.exp(
            (np.asarray(y, dtype=np.float64) - self.fn) / self.R)) - np.pi / 4)
        b = np.arcsin(np.clip(np.cos(self.b0s) * np.sin(bb)
                              + np.sin(self.b0s) * np.cos(bb) * np.cos(lb),
                              -1.0, 1.0))
        l = np.arctan2(np.sin(lb), np.cos(self.b0s) * np.cos(lb)
                       - np.sin(self.b0s) * np.tan(bb))
        lam = self.lam0 + l / self.alpha
        # conformal sphere -> ellipsoid latitude (fixed point)
        phi = b.copy()
        for _ in range(12):
            s = np.sin(phi)
            S = (np.log(np.tan(np.pi / 4 + b / 2)) - self.K) / self.alpha \
                + self.e / 2 * np.log((1 + self.e * s) / (1 - self.e * s))
            phi = 2 * (np.arctan(np.exp(S)) - np.pi / 4)
        return _wrap_lon(np.degrees(lam)), np.degrees(phi)

    # ellipsoid hooks for HelmertProj
    @property
    def e_(self):
        return self.e


class ObliqueStereographic:
    """EPSG method 9809 (Roussilhe oblique stereographic via the Gauss
    conformal sphere) — the Dutch RD projection (published EPSG Guidance
    Note 7-2 formulas, validated on its worked example)."""

    def __init__(self, lat0, lon0, k0, fe, fn, a, f):
        self.a, self.f = a, f
        e2 = f * (2 - f)
        self.e = math.sqrt(e2)
        p0 = math.radians(lat0)
        self.lam0 = math.radians(lon0)
        s0 = math.sin(p0)
        self.n = math.sqrt(1 + e2 * math.cos(p0) ** 4 / (1 - e2))
        S1 = (1 + s0) / (1 - s0)
        S2 = (1 - self.e * s0) / (1 + self.e * s0)
        w1 = (S1 * S2 ** self.e) ** self.n
        sin_chi0 = (w1 - 1) / (w1 + 1)
        self.c = ((self.n + s0) * (1 - sin_chi0)
                  / ((self.n - s0) * (1 + sin_chi0)))
        w2 = self.c * w1
        self.chi0 = math.asin((w2 - 1) / (w2 + 1))
        rho0 = a * (1 - e2) / (1 - e2 * s0 * s0) ** 1.5
        nu0 = a / math.sqrt(1 - e2 * s0 * s0)
        self.R = math.sqrt(rho0 * nu0)
        self.k0, self.fe, self.fn = k0, fe, fn

    def _chi_lam(self, lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        s = np.sin(phi)
        w = self.c * ((1 + s) / (1 - s)
                      * ((1 - self.e * s) / (1 + self.e * s)) ** self.e) ** self.n
        chi = np.arcsin(np.clip((w - 1) / (w + 1), -1.0, 1.0))
        return chi, self.n * (lam - self.lam0)

    def forward(self, lon, lat):
        chi, dl = self._chi_lam(lon, lat)
        B = (1 + np.sin(chi) * math.sin(self.chi0)
             + np.cos(chi) * math.cos(self.chi0) * np.cos(dl))
        x = self.fe + 2 * self.R * self.k0 * np.cos(chi) * np.sin(dl) / B
        y = self.fn + 2 * self.R * self.k0 * (
            np.sin(chi) * math.cos(self.chi0)
            - np.cos(chi) * math.sin(self.chi0) * np.cos(dl)) / B
        return x, y

    def inverse(self, x, y):
        gx = (np.asarray(x, dtype=np.float64) - self.fe) / (2 * self.R * self.k0)
        gy = (np.asarray(y, dtype=np.float64) - self.fn) / (2 * self.R * self.k0)
        rho = np.hypot(gx, gy)
        cc = 2 * np.arctan(rho)
        sin_cc, cos_cc = np.sin(cc), np.cos(cc)
        with np.errstate(invalid="ignore", divide="ignore"):
            chi = np.where(rho == 0, self.chi0, np.arcsin(np.clip(
                cos_cc * math.sin(self.chi0)
                + gy * sin_cc * math.cos(self.chi0) / np.where(rho, rho, 1.0),
                -1.0, 1.0)))
            dl = np.where(rho == 0, 0.0, np.arctan2(
                gx * sin_cc,
                rho * math.cos(self.chi0) * cos_cc
                - gy * math.sin(self.chi0) * sin_cc))
        lam = dl / self.n + self.lam0
        # invert the conformal-sphere latitude by fixed point
        sin_chi = np.sin(chi)
        w = (1 + sin_chi) / (1 - sin_chi)
        phi = chi.copy()
        for _ in range(15):
            s = np.sin(phi)
            inner = (w / self.c) ** (1.0 / self.n) \
                * ((1 + self.e * s) / (1 - self.e * s)) ** self.e
            phi = np.arcsin(np.clip((inner - 1) / (inner + 1), -1.0, 1.0))
        return _wrap_lon(np.degrees(lam)), np.degrees(phi)


# EPSG parameter registry (public EPSG registry values) for widely used
# projected CRSes on WGS84-coincident datums.
class WebMercator:
    """EPSG:3857 Pseudo-Mercator: spherical Mercator on the WGS84 major
    axis, latitudes taken as-is (the defining 'pseudo' simplification).
    Closed form: x = R*lam, y = R*ln(tan(pi/4 + phi/2))."""

    def __init__(self):
        self.a, self.e = WGS84_A, 0.0

    def forward(self, lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        phi = np.radians(np.clip(np.asarray(lat, dtype=np.float64),
                                 -89.9999, 89.9999))
        return (self.a * lam,
                self.a * np.log(np.tan(np.pi / 4.0 + phi / 2.0)))

    def inverse(self, x, y):
        lon = np.degrees(np.asarray(x, dtype=np.float64) / self.a)
        lat = np.degrees(2.0 * np.arctan(
            np.exp(np.asarray(y, dtype=np.float64) / self.a)) - np.pi / 2.0)
        return lon, lat


class MercatorEllipsoidal:
    """EPSG:3395 World Mercator: ellipsoidal Mercator 1SP, k0 = 1
    (Snyder 7-7: y = -a * ln t with the isometric t)."""

    def __init__(self, ellps: str = "WGS84"):
        self.a, self.e, self.e2 = _ell(ellps)

    def forward(self, lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        phi = np.radians(np.clip(np.asarray(lat, dtype=np.float64),
                                 -89.9999, 89.9999))
        t = _t_snyder(phi, self.e)
        return self.a * lam, -self.a * np.log(t)

    def inverse(self, x, y):
        lon = np.degrees(np.asarray(x, dtype=np.float64) / self.a)
        t = np.exp(-np.asarray(y, dtype=np.float64) / self.a)
        lat = np.degrees(_phi_from_t(t, self.e))
        return lon, lat


class EquirectangularSphere:
    """EPSG:32662 WGS 84 / Plate Carrée (and the modern EPSG:4087 World
    Equidistant Cylindrical): spherical equirectangular on the WGS84
    major axis — x = a*lam, y = a*phi (radians).  PROJ's +proj=eqc."""

    def __init__(self):
        self.a = WGS84_A

    def forward(self, lon, lat):
        return (self.a * np.radians(np.asarray(lon, dtype=np.float64)),
                self.a * np.radians(np.asarray(lat, dtype=np.float64)))

    def inverse(self, x, y):
        return (np.degrees(np.asarray(x, dtype=np.float64) / self.a),
                np.degrees(np.asarray(y, dtype=np.float64) / self.a))


class MollweideSphere:
    """ESRI:54009 World Mollweide: equal-area pseudocylindrical on the
    sphere of radius a (PROJ's +proj=moll is spherical-only; es is
    forced to 0).  Snyder 31-1..31-8: solve 2t + sin 2t = pi sin phi,
    x = (2 sqrt2 / pi) a lam cos t, y = sqrt2 a sin t."""

    def __init__(self):
        self.a = WGS84_A

    def _theta(self, phi):
        rhs = np.pi * np.sin(phi)
        t = phi.copy()
        for _ in range(12):
            f = 2.0 * t + np.sin(2.0 * t) - rhs
            t = t - f / (2.0 + 2.0 * np.cos(2.0 * t) + 1e-300)
        return t

    def forward(self, lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        phi = np.radians(np.clip(np.asarray(lat, dtype=np.float64),
                                 -90.0, 90.0))
        t = self._theta(phi)
        return (2.0 * math.sqrt(2.0) / np.pi * self.a * lam * np.cos(t),
                math.sqrt(2.0) * self.a * np.sin(t))

    def inverse(self, x, y):
        t = np.arcsin(np.clip(
            np.asarray(y, dtype=np.float64) / (math.sqrt(2.0) * self.a),
            -1.0, 1.0))
        phi = np.arcsin(np.clip((2.0 * t + np.sin(2.0 * t)) / np.pi,
                                -1.0, 1.0))
        c = np.cos(t)
        lam = np.where(
            np.abs(c) < 1e-12, 0.0,
            np.pi * np.asarray(x, dtype=np.float64)
            / (2.0 * math.sqrt(2.0) * self.a * np.where(c == 0, 1.0, c)))
        return np.degrees(lam), np.degrees(phi)


class EckertIVSphere:
    """ESRI:54012 World Eckert IV: equal-area pseudocylindrical on the
    sphere of radius a (same spherical convention as World Mollweide).
    Snyder 1987 eq. 32-1..32-6: solve
    theta + sin(theta)cos(theta) + 2 sin(theta) = (2 + pi/2) sin(phi),
    x = (2/sqrt(pi(4+pi))) a dlam (1 + cos theta),
    y = 2 sqrt(pi/(4+pi)) a sin theta."""

    _CX = 2.0 / math.sqrt(math.pi * (4.0 + math.pi))
    _CY = 2.0 * math.sqrt(math.pi / (4.0 + math.pi))

    def __init__(self):
        self.a = WGS84_A

    def _theta(self, phi):
        rhs = (2.0 + np.pi / 2.0) * np.sin(phi)
        t = phi / 2.0                      # Snyder's starting guess
        # f' = 2 cos(t)(1+cos(t)) -> 0 at the pole root t = pi/2, where
        # Newton degrades to bisection-rate halving; mid-latitude inputs
        # converge quadratically well inside 12 rounds, so the extra
        # rounds run only when near-pole latitudes are present, and the
        # exact pole is snapped closed-form below (round-9 review)
        extra = 18 if np.any(np.abs(phi) > math.radians(89.0)) else 0
        for _ in range(12 + extra):
            f = t + np.sin(t) * np.cos(t) + 2.0 * np.sin(t) - rhs
            d = 2.0 * np.cos(t) * (1.0 + np.cos(t))
            t = np.clip(t - f / np.maximum(d, 1e-9),
                        -np.pi / 2, np.pi / 2)
        return np.where(np.abs(phi) >= np.pi / 2 - 1e-12,
                        np.copysign(np.pi / 2, phi), t)

    def forward(self, lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        phi = np.radians(np.clip(np.asarray(lat, dtype=np.float64),
                                 -90.0, 90.0))
        t = self._theta(phi)
        return (self._CX * self.a * lam * (1.0 + np.cos(t)),
                self._CY * self.a * np.sin(t))

    def inverse(self, x, y):
        st = np.clip(np.asarray(y, dtype=np.float64)
                     / (self._CY * self.a), -1.0, 1.0)
        t = np.arcsin(st)
        phi = np.arcsin(np.clip(
            (t + np.sin(t) * np.cos(t) + 2.0 * np.sin(t))
            / (2.0 + np.pi / 2.0), -1.0, 1.0))
        den = self._CX * self.a * (1.0 + np.cos(t))
        lam = np.asarray(x, dtype=np.float64) / np.maximum(den, 1e-9)
        return np.degrees(lam), np.degrees(phi)


class SinusoidalEllipsoidal:
    """ESRI:54008 World Sinusoidal: equal-area pseudocylindrical,
    ellipsoidal form (Snyder 30-8/30-9): x = a cos(phi) dlam / W,
    y = M(phi) with W = sqrt(1 - e2 sin2 phi) and M the meridian arc.
    The arc and its inverse reuse the Krüger series (A*xi == M)."""

    def __init__(self, ellps: str = "WGS84"):
        a, f = _ELLIPSOIDS[ellps]
        self._tm = TransverseMercator(0.0, 0.0, 1.0, 0.0, 0.0, a, f)
        self.a = a
        self.e2 = f * (2.0 - f)

    def _arc(self, phi):
        s = np.sin(phi)
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.sinh(np.arctanh(s)
                        - self._tm.e * np.arctanh(self._tm.e * s))
        xi_p = np.arctan(t)              # arctan(+-inf) = +-pi/2 at poles
        xi = xi_p.copy()
        for j, al in enumerate(self._tm.alpha, start=1):
            xi += al * np.sin(2 * j * xi_p)
        return self._tm.A * xi

    def forward(self, lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        w = np.sqrt(1.0 - self.e2 * np.sin(phi) ** 2)
        return self.a * np.cos(phi) * lam / w, self._arc(phi)

    def inverse(self, x, y):
        xi = np.asarray(y, dtype=np.float64) / self._tm.A
        xi_p = xi.copy()
        for j, b in enumerate(self._tm.beta, start=1):
            xi_p -= b * np.sin(2 * j * xi)
        chi = xi_p
        phi = chi.copy()
        for j, d in enumerate(self._tm.delta, start=1):
            phi += d * np.sin(2 * j * chi)
        w = np.sqrt(1.0 - self.e2 * np.sin(phi) ** 2)
        c = np.cos(phi)
        lam = np.where(np.abs(c) < 1e-12, 0.0,
                       np.asarray(x, dtype=np.float64) * w
                       / (self.a * np.where(c == 0, 1.0, c)))
        return np.degrees(lam), np.degrees(phi)


class EqualEarth:
    """Equal Earth pseudocylindrical projection (Šavrič, Patterson &
    Jenny 2019, "The Equal Earth map projection", IJGIS 33:3 — the
    published polynomial with A1..A4; PROJ `eqearth`).  Ellipsoidal
    form: latitude is converted to the authalic latitude and the
    authalic radius R_q = a·sqrt(qp/2) scales the plane, which keeps
    the map exactly equal-area on the ellipsoid (pinned by the numeric
    Jacobian test).  Registered for EPSG:8857/8858/8859."""

    A1, A2, A3, A4 = 1.340264, -0.081106, 0.000893, 0.003796
    _M = math.sqrt(3.0) / 2.0

    def __init__(self, lon0=0.0, ellps="WGS84"):
        self.a, self.e, self.e2 = _ell(ellps)
        self.lam0 = math.radians(lon0)
        self.qp = float(_q_any(np.float64(np.pi / 2), self.e, self.e2))
        self.Rq = self.a * math.sqrt(self.qp / 2.0)
        self.fe = self.fn = 0.0

    def _poly(self, t):
        t2 = t * t
        t6 = t2 * t2 * t2
        return self.A1 + self.A2 * t2 + self.A3 * t6 + self.A4 * t6 * t2

    def _dpoly(self, t):
        t2 = t * t
        t6 = t2 * t2 * t2
        return (self.A1 + 3.0 * self.A2 * t2 + 7.0 * self.A3 * t6
                + 9.0 * self.A4 * t6 * t2)

    def forward(self, lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        q = _q_any(phi, self.e, self.e2)
        sxi = np.clip(q / self.qp, -1.0, 1.0)       # sin(authalic lat)
        theta = np.arcsin(np.clip(self._M * sxi, -1.0, 1.0))
        dl = np.arctan2(np.sin(lam - self.lam0), np.cos(lam - self.lam0))
        x = (2.0 * math.sqrt(3.0) / 3.0) * self.Rq * dl * np.cos(theta) \
            / self._dpoly(theta)
        y = self.Rq * theta * self._poly(theta)
        return x, y

    def inverse(self, x, y):
        xs = np.asarray(x, dtype=np.float64) / self.Rq
        ys = np.asarray(y, dtype=np.float64) / self.Rq
        # Newton for theta: theta*poly(theta) = ys; |y|max = theta_max *
        # poly ~ 1.31, well-conditioned (derivative >= A1 - ... > 0.7)
        theta = np.clip(ys / self.A1, -np.pi / 2, np.pi / 2)
        for _ in range(12):
            f = theta * self._poly(theta) - ys
            # d/dθ [θ·poly(θ)] = poly + θ·poly' ; note _dpoly is the
            # x-denominator polynomial, which equals poly + θ·poly'
            theta = theta - f / self._dpoly(theta)
        sxi = np.clip(np.sin(theta) / self._M, -1.0, 1.0)
        phi = _phi_from_q_any(sxi * self.qp, self.e, self.e2)
        with np.errstate(invalid="ignore", divide="ignore"):
            dl = xs * self._dpoly(theta) \
                / ((2.0 * math.sqrt(3.0) / 3.0) * np.cos(theta))
        dl = np.where(np.abs(np.cos(theta)) < 1e-12, 0.0, dl)
        return _wrap_lon(np.degrees(self.lam0 + dl)), np.degrees(phi)


class GeographicCRS:
    """A geographic (lon/lat degree) CRS on a possibly non-WGS84 datum.
    forward() takes WGS84 lon/lat and returns lon/lat in the local datum
    (coordinates ARE the degrees — the identity 'projection'); inverse()
    returns to WGS84.  shift is the WGS84->local Bursa-Wolf 7-tuple or
    None for WGS84-coincident datums (ETRS89/NAD83/GDA-class)."""

    def __init__(self, ellps: str = "WGS84", shift=None):
        a, f = _ELLIPSOIDS[ellps]
        self.a, self.e2 = a, f * (2.0 - f)
        if shift is None:
            self._h = None
        else:
            t, r, s = shift[:3], shift[3:6], shift[6]
            self._h = HelmertTM(
                TransverseMercator(0.0, 0.0, 1.0, 0.0, 0.0, a, f),
                t=t, r_arcsec=r, s_ppm=s)

    def forward(self, lon, lat):
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        if self._h is None:
            return lon.copy(), lat.copy()
        X, Y, Z = _geodetic_to_ecef(lon, lat,
                                    WGS84_A, WGS84_F * (2 - WGS84_F))
        X, Y, Z = self._h._shift(X, Y, Z)
        return _ecef_to_geodetic(X, Y, Z, self.a, self.e2)

    def inverse(self, x, y):
        if self._h is None:
            return (np.asarray(x, dtype=np.float64).copy(),
                    np.asarray(y, dtype=np.float64).copy())
        X, Y, Z = _geodetic_to_ecef(x, y, self.a, self.e2)
        X, Y, Z = self._h._shift(X, Y, Z, invert=True)
        return _ecef_to_geodetic(X, Y, Z,
                                 WGS84_A, WGS84_F * (2 - WGS84_F))


_PROJ_REGISTRY: dict[str, object] = {}


def _register_projections():
    reg = _PROJ_REGISTRY
    # France: RGF93 / Lambert-93
    reg["EPSG:2154"] = LambertConformalConic2SP(
        46.5, 3.0, 49.0, 44.0, 700000.0, 6600000.0, "GRS80")
    # USA: NAD83 / Conus Albers
    reg["EPSG:5070"] = AlbersEqualArea2SP(
        23.0, -96.0, 29.5, 45.5, 0.0, 0.0, "GRS80")
    # Australia: GDA94 / Australian Albers
    reg["EPSG:3577"] = AlbersEqualArea2SP(
        0.0, 132.0, -18.0, -36.0, 0.0, 0.0, "GRS80")
    # ESRI aliases of Web Mercator (ArcGIS "Auxiliary Sphere" ids)
    reg["ESRI:102100"] = reg["ESRI:102113"] = WebMercator()
    # Europe: ETRS89-extended / LAEA Europe
    reg["EPSG:3035"] = LambertAzimuthalEqualArea(
        52.0, 10.0, 4321000.0, 3210000.0, "GRS80")
    # Antarctic Polar Stereographic
    reg["EPSG:3031"] = PolarStereographic(
        -71.0, 0.0, 0.0, 0.0, south=True, ellps="WGS84")
    # NSIDC Sea Ice Polar Stereographic North
    reg["EPSG:3413"] = PolarStereographic(
        70.0, -45.0, 0.0, 0.0, south=False, ellps="WGS84")
    # USA Contiguous Lambert Conformal Conic (NAD83)
    reg["EPSG:102004"] = reg["ESRI:102004"] = LambertConformalConic2SP(
        39.0, -96.0, 33.0, 45.0, 0.0, 0.0, "GRS80")
    # ETRS89 / UTM zones 28N-38N (Europe's standard grid) and the NAD83
    # UTM range — GRS80 TM, standard UTM constants
    for z in range(28, 39):
        reg[f"EPSG:258{z:02d}"] = TransverseMercator(
            0.0, utm_zone_central_meridian(z), K0, E0, 0.0, GRS80_A, GRS80_F)
    for z in range(3, 24):
        reg[f"EPSG:269{z:02d}"] = TransverseMercator(
            0.0, utm_zone_central_meridian(z), K0, E0, 0.0, GRS80_A, GRS80_F)
    # Universal Polar Stereographic (EPSG Variant A: k0 = 0.994 at the
    # pole, FE = FN = 2,000,000) — pinned by the EPSG Guidance 7-2
    # Variant A worked example (73N 44E -> 3320416.75 E, 632668.43 N)
    _ups_n = PolarStereographic.variant_a(
        0.994, 0.0, 2000000.0, 2000000.0, south=False)
    _ups_s = PolarStereographic.variant_a(
        0.994, 0.0, 2000000.0, 2000000.0, south=True)
    reg["EPSG:32661"] = reg["EPSG:5041"] = _ups_n
    reg["EPSG:32761"] = reg["EPSG:5042"] = _ups_s
    # Ireland: IRENET95 / Irish Transverse Mercator (GRS80, ~WGS84)
    reg["EPSG:2157"] = TransverseMercator(
        53.5, -8.0, 0.99982, 600000.0, 750000.0, GRS80_A, GRS80_F)
    # Korea 2000 / Unified CS and the 2010 belt set (GRS80, ~WGS84)
    reg["EPSG:5179"] = TransverseMercator(
        38.0, 127.5, 0.9996, 1000000.0, 2000000.0, GRS80_A, GRS80_F)
    for _code, _lon0 in ((5185, 125.0), (5186, 127.0),
                         (5187, 129.0), (5188, 131.0)):
        reg[f"EPSG:{_code}"] = TransverseMercator(
            38.0, _lon0, 1.0, 200000.0, 600000.0, GRS80_A, GRS80_F)
    # Australia: GDA94 / Geoscience Australia Lambert
    reg["EPSG:3112"] = LambertConformalConic2SP(
        0.0, 134.0, -18.0, -36.0, 0.0, 0.0, "GRS80")
    # Europe: ETRS89-extended / LCC Europe
    reg["EPSG:3034"] = LambertConformalConic2SP(
        52.0, 10.0, 35.0, 65.0, 4000000.0, 2800000.0, "GRS80")
    # Great Britain: OSGB36 / British National Grid (Airy 1830 TM behind
    # the published WGS84->OSGB36 Bursa-Wolf shift)
    reg["EPSG:27700"] = HelmertTM(
        TransverseMercator(49.0, -2.0, 0.9996012717, 400000.0, -100000.0,
                           AIRY_A, AIRY_F),
        t=(-446.448, 125.157, -542.060),
        r_arcsec=(-0.1502, -0.2470, -0.8421), s_ppm=20.4894)
    # New Zealand: NZGD2000 / NZTM2000 (GRS80, NZGD2000 ~ WGS84)
    reg["EPSG:2193"] = TransverseMercator(
        0.0, 173.0, 0.9996, 1600000.0, 10000000.0, GRS80_A, GRS80_F)
    # US State Plane (meter-based zones): NAD83 / Maryland (LCC 2SP)
    reg["EPSG:26985"] = LambertConformalConic2SP(
        37.0 + 40.0 / 60.0, -77.0, 39.45, 38.3, 400000.0, 0.0, "GRS80")
    # NAD83 / New York Long Island (LCC 2SP)
    reg["EPSG:32118"] = LambertConformalConic2SP(
        40.0 + 10.0 / 60.0, -74.0, 41.0 + 2.0 / 60.0, 40.0 + 40.0 / 60.0,
        300000.0, 0.0, "GRS80")
    # Belgium: BD72 / Belgian Lambert 72 (LCC 2SP on International 1924
    # behind the published BD72<->WGS84 Bursa-Wolf shift, negated to give
    # the WGS84->BD72 direction)
    reg["EPSG:31370"] = HelmertProj(
        LambertConformalConic2SP(
            90.0, 4.0 + 22.0 / 60.0 + 2.952 / 3600.0,
            51.0 + 10.0 / 60.0 + 0.00204 / 3600.0,
            49.0 + 50.0 / 60.0 + 0.00204 / 3600.0,
            150000.013, 5400088.438, "INTL24"),
        t=(106.8686, -52.2978, 103.7239),
        r_arcsec=(-0.3366, 0.457, -1.8422), s_ppm=1.2747)
    # Switzerland: CH1903+/LV95 — swisstopo double projection on Bessel
    # behind the pure translation ETRS89->CH1903+ (swisstopo GRANIT87
    # values, no rotations)
    reg["EPSG:2056"] = HelmertProj(
        SwissObliqueMercator(),
        t=(-674.374, -15.056, -405.346), r_arcsec=(0.0, 0.0, 0.0),
        s_ppm=0.0)
    # Ireland: TM65/Irish Grid (EPSG:29902) and IRENET-era 29903 — TM on
    # Airy Modified (k0 = 1.000035) behind the published OSi/OSNI
    # WGS84->Ireland65 Bursa-Wolf
    _irish_tm = TransverseMercator(
        53.5, -8.0, 1.000035, 200000.0, 250000.0, 6377340.189, AIRY_F)
    reg["EPSG:29902"] = reg["EPSG:29903"] = HelmertTM(
        _irish_tm, t=(-482.53, 130.596, -564.557),
        r_arcsec=(1.042, 0.214, 0.631), s_ppm=-8.15)
    # France (legacy): NTF / Lambert zone II (EPSG:27572) — LCC 1SP on
    # Clarke 1880 IGN behind the NTF->WGS84 pure translation (negated)
    # ... and the full NTF zone family (round 9): zone I (Nord,
    # lat0 49.5), II (Centre, 46.8), III (Sud, 44.1) — zone-prefixed
    # "carto" northings 1.2/2.2/3.2 Mm (EPSG:27571-27573) and the
    # unprefixed 200 km variants (EPSG:27561-27563); all LCC 1SP on
    # Clarke 1880 IGN at the Paris meridian (2d20'14.025" E)
    _ntf_lon0 = 2.0 + 20.0 / 60.0 + 14.025 / 3600.0
    _ntf_zones = [(1, 49.5, 0.999877341), (2, 46.8, 0.99987742),
                  (3, 44.1, 0.999877499)]
    for _z, _lat0, _k0 in _ntf_zones:
        for _code, _fn in ((27560 + _z, 200000.0),
                           (27570 + _z, _z * 1_000_000.0 + 200000.0)):
            _p = LambertConformalConic1SP(
                _lat0, _ntf_lon0, _k0, 600000.0, _fn,
                6378249.2, 1.0 / 293.4660212936269)
            reg[f"EPSG:{_code}"] = HelmertProj(
                _p, t=(168.0, 60.0, -320.0), r_arcsec=(0.0, 0.0, 0.0),
                s_ppm=0.0)
    # Czechia/Slovakia: S-JTSK / Krovak East North (EPSG:5514) behind the
    # inverse of the published S-JTSK->WGS84 Bursa-Wolf
    reg["EPSG:5514"] = HelmertProj(
        Krovak(), t=(-570.8, -85.7, -462.8),
        r_arcsec=(-4.998, -1.587, -5.261), s_ppm=-3.56)
    # Netherlands: Amersfoort / RD New — oblique stereographic on Bessel
    # behind the inverse of the published Amersfoort->WGS84 Bursa-Wolf
    reg["EPSG:28992"] = HelmertProj(
        ObliqueStereographic(
            52.0 + 9.0 / 60.0 + 22.178 / 3600.0,
            5.0 + 23.0 / 60.0 + 15.5 / 3600.0,
            0.9999079, 155000.0, 463000.0,
            SwissObliqueMercator.BESSEL_A, SwissObliqueMercator.BESSEL_F),
        t=(-565.417, -50.3319, -465.552),
        r_arcsec=(0.398957, -0.343988, 1.87740), s_ppm=-4.0772)


def _dms(d: float, m: float = 0.0, s: float = 0.0) -> float:
    sign = -1.0 if d < 0 else 1.0
    return sign * (abs(d) + m / 60.0 + s / 3600.0)


# US State Plane NAD83 (meter-based EPSG codes), public EPSG registry
# parameters (SPCS83, NOAA NGS 13).  Two method families feed the
# existing projection classes as pure parameter data:
#   LCC rows: (code, lat0, lon0, sp1, sp2, FE, FN)
#   TM rows:  (code, lat0, lon0, k0, FE, FN)
_SPCS83_LCC = [
    # California zones 1-6
    (26941, _dms(39, 20), _dms(-122, 0), _dms(41, 40), _dms(40, 0), 2000000.0, 500000.0),
    (26942, _dms(37, 40), _dms(-122, 0), _dms(39, 50), _dms(38, 20), 2000000.0, 500000.0),
    (26943, _dms(36, 30), _dms(-120, 30), _dms(38, 26), _dms(37, 4), 2000000.0, 500000.0),
    (26944, _dms(35, 20), _dms(-119, 0), _dms(37, 15), _dms(36, 0), 2000000.0, 500000.0),
    (26945, _dms(33, 30), _dms(-118, 0), _dms(35, 28), _dms(34, 2), 2000000.0, 500000.0),
    (26946, _dms(32, 10), _dms(-116, 15), _dms(33, 53), _dms(32, 47), 2000000.0, 500000.0),
    # Texas North / North Central / Central / South Central / South
    (32137, _dms(34, 0), _dms(-101, 30), _dms(36, 11), _dms(34, 39), 200000.0, 1000000.0),
    (32138, _dms(31, 40), _dms(-98, 30), _dms(33, 58), _dms(32, 8), 600000.0, 2000000.0),
    (32139, _dms(29, 40), _dms(-100, 20), _dms(31, 53), _dms(30, 7), 700000.0, 3000000.0),
    (32140, _dms(27, 50), _dms(-99, 0), _dms(30, 17), _dms(28, 23), 600000.0, 4000000.0),
    (32141, _dms(25, 40), _dms(-98, 30), _dms(27, 50), _dms(26, 10), 300000.0, 5000000.0),
    # Washington N/S, Oregon N/S
    (32148, _dms(47, 0), _dms(-120, 50), _dms(48, 44), _dms(47, 30), 500000.0, 0.0),
    (32149, _dms(45, 20), _dms(-120, 30), _dms(47, 20), _dms(45, 50), 500000.0, 0.0),
    (32126, _dms(43, 40), _dms(-120, 30), _dms(46, 0), _dms(44, 20), 2500000.0, 0.0),
    (32127, _dms(41, 40), _dms(-120, 30), _dms(44, 0), _dms(42, 20), 1500000.0, 0.0),
    # Colorado N/C/S (exact-meter conversions of the 3,000,000/1,000,000
    # US-survey-foot false origin)
    (26953, _dms(39, 20), _dms(-105, 30), _dms(40, 47), _dms(39, 43), 914401.8289, 304800.6096),
    (26954, _dms(37, 50), _dms(-105, 30), _dms(39, 45), _dms(38, 27), 914401.8289, 304800.6096),
    (26955, _dms(36, 40), _dms(-105, 30), _dms(38, 26), _dms(37, 14), 914401.8289, 304800.6096),
    # Pennsylvania N/S, Virginia N/S, North Carolina, Tennessee, Ohio N/S
    (32128, _dms(40, 10), _dms(-77, 45), _dms(41, 57), _dms(40, 53), 600000.0, 0.0),
    (32129, _dms(39, 20), _dms(-77, 45), _dms(40, 58), _dms(39, 56), 600000.0, 0.0),
    (32146, _dms(37, 40), _dms(-78, 30), _dms(39, 12), _dms(38, 2), 3500000.0, 2000000.0),
    (32147, _dms(36, 20), _dms(-78, 30), _dms(37, 58), _dms(36, 46), 3500000.0, 1000000.0),
    (32119, _dms(33, 45), _dms(-79, 0), _dms(36, 10), _dms(34, 20), 609601.22, 0.0),
    (32136, _dms(34, 20), _dms(-86, 0), _dms(36, 25), _dms(35, 15), 600000.0, 0.0),
    (32122, _dms(39, 40), _dms(-82, 30), _dms(41, 42), _dms(40, 26), 600000.0, 0.0),
    (32123, _dms(38, 0), _dms(-82, 30), _dms(40, 2), _dms(38, 44), 600000.0, 0.0),
    # Massachusetts Mainland, Utah Central, Louisiana South
    (26986, _dms(41, 0), _dms(-71, 30), _dms(42, 41), _dms(41, 43), 200000.0, 750000.0),
    (32143, _dms(38, 20), _dms(-111, 30), _dms(40, 39), _dms(39, 1), 500000.0, 2000000.0),
    (26982, _dms(28, 30), _dms(-91, 20), _dms(30, 42), _dms(29, 18), 1000000.0, 0.0),
    # --- round-11 foot-variant bases ---
    # Florida North, Massachusetts Island, South Carolina (FE is the
    # exact metre value of 2,000,000 international feet)
    (26960, _dms(29, 0), _dms(-84, 30), _dms(30, 45), _dms(29, 35), 600000.0, 0.0),
    (26987, _dms(41, 0), _dms(-70, 30), _dms(41, 29), _dms(41, 17), 500000.0, 0.0),
    (32133, _dms(31, 50), _dms(-81, 0), _dms(34, 50), _dms(32, 30), 609600.0, 0.0),
    # Michigan North / Central / South
    (26988, _dms(44, 47), _dms(-87, 0), _dms(47, 5), _dms(45, 29), 8000000.0, 0.0),
    (26989, _dms(43, 19), _dms(-84, 22), _dms(45, 42), _dms(44, 11), 6000000.0, 0.0),
    (26990, _dms(41, 30), _dms(-84, 22), _dms(43, 40), _dms(42, 6), 4000000.0, 0.0),
]

_SPCS83_TM = [
    # New Jersey / New York East (same parameters, two codes)
    (32111, _dms(38, 50), _dms(-74, 30), 0.9999, 150000.0, 0.0),
    (32115, _dms(38, 50), _dms(-74, 30), 0.9999, 150000.0, 0.0),
    # Florida East / West
    (26958, _dms(24, 20), _dms(-81, 0), 1.0 - 1.0 / 17000.0, 200000.0, 0.0),
    (26959, _dms(24, 20), _dms(-82, 0), 1.0 - 1.0 / 17000.0, 200000.0, 0.0),
    # Georgia East / West
    (26966, _dms(30, 0), _dms(-82, 10), 0.9999, 200000.0, 0.0),
    (26967, _dms(30, 0), _dms(-84, 10), 0.9999, 700000.0, 0.0),
    # Alabama East, Illinois East / West
    (26929, _dms(30, 30), _dms(-85, 50), 0.99996, 200000.0, 0.0),
    (26971, _dms(36, 40), _dms(-88, 20), 1.0 - 1.0 / 40000.0, 300000.0, 0.0),
    (26972, _dms(36, 40), _dms(-90, 10), 1.0 - 1.0 / 17000.0, 700000.0, 0.0),
    # Arizona East / Central / West (false easting in exact meters of
    # 700,000 international feet = 213,360 m)
    (26948, _dms(31, 0), _dms(-110, 10), 0.9999, 213360.0, 0.0),
    (26949, _dms(31, 0), _dms(-111, 55), 0.9999, 213360.0, 0.0),
    (26950, _dms(31, 0), _dms(-113, 45), 1.0 - 1.0 / 15000.0, 213360.0, 0.0),
    # New York Central / West (round-11 foot-variant bases)
    (32116, _dms(40, 0), _dms(-76, 35), 0.9999375, 250000.0, 0.0),
    (32117, _dms(40, 0), _dms(-78, 35), 0.9999375, 350000.0, 0.0),
]


def _register_generated():
    """Parameter-table-driven registrations: the math classes above are
    complete; breadth is data.  All NAD83/GDA94/GDA2020/SIRGAS2000
    datums are treated as WGS84-coincident (meter-level, standard
    assumption — same as the existing ETRS89/NAD83 UTM entries)."""
    reg = _PROJ_REGISTRY
    for code, lat0, lon0, sp1, sp2, fe, fn in _SPCS83_LCC:
        reg[f"EPSG:{code}"] = LambertConformalConic2SP(
            lat0, lon0, sp1, sp2, fe, fn, "GRS80")
    for code, lat0, lon0, k0, fe, fn in _SPCS83_TM:
        reg[f"EPSG:{code}"] = TransverseMercator(
            lat0, lon0, k0, fe, fn, GRS80_A, GRS80_F)
    # NAD83 / UTM zones 1-2 (extends the 3-23 range above to the full set)
    for z in (1, 2):
        reg[f"EPSG:269{z:02d}"] = TransverseMercator(
            0.0, utm_zone_central_meridian(z), K0, E0, 0.0, GRS80_A, GRS80_F)
    # Australia: GDA94 / MGA zones 49-56 and GDA2020 / MGA zones 49-56
    # (southern hemisphere: 10,000,000 m false northing)
    for z in range(49, 57):
        tm = TransverseMercator(0.0, utm_zone_central_meridian(z), K0, E0,
                                10000000.0, GRS80_A, GRS80_F)
        reg[f"EPSG:283{z:02d}"] = tm       # GDA94 / MGA
        reg[f"EPSG:78{z:02d}"] = tm        # GDA2020 / MGA
    # Brazil: SIRGAS 2000 / UTM zones 18S-25S
    for z in range(18, 26):
        reg[f"EPSG:319{60 + z}"] = TransverseMercator(
            0.0, utm_zone_central_meridian(z), K0, E0, 10000000.0,
            GRS80_A, GRS80_F)


def _register_from_table():
    """Importer for the committed EPSG parameter dump
    (geom/epsg_registry_data.py) — round-6 verdict #7.  Every row feeds
    the existing worked-example-verified projection classes as pure
    parameter data; rows with a Bursa-Wolf shift wrap in the Helmert
    adapters (WGS84->local direction, position-vector convention, same
    as the hand-curated entries)."""
    from sedona_db_spark.geom import epsg_registry_data as D
    reg = _PROJ_REGISTRY

    def wrap(proj, shift, tm=False):
        if shift is None:
            return proj
        t, r, s = shift[:3], shift[3:6], shift[6]
        cls = HelmertTM if tm else HelmertProj
        return cls(proj, t=t, r_arcsec=r, s_ppm=s)

    for base_n, base_s, zones, ellps, shift in D.UTM_SERIES:
        a, f = _ELLIPSOIDS[ellps]
        for z in zones:
            cm = utm_zone_central_meridian(z)
            reg[f"EPSG:{base_n + z}"] = wrap(
                TransverseMercator(0.0, cm, K0, E0, 0.0, a, f), shift,
                tm=True)
            reg[f"EPSG:{base_s + z}"] = wrap(
                TransverseMercator(0.0, cm, K0, E0, 10000000.0, a, f),
                shift, tm=True)
    for code, lat0, lon0, k0, fe, fn, ellps, shift in D.TM_ROWS:
        a, f = _ELLIPSOIDS[ellps]
        reg[f"EPSG:{code}"] = wrap(
            TransverseMercator(lat0, lon0, k0, fe, fn, a, f), shift,
            tm=True)
    for code, lat0, lon0, sp1, sp2, fe, fn, ellps, shift in D.LCC2_ROWS:
        reg[f"EPSG:{code}"] = wrap(
            LambertConformalConic2SP(lat0, lon0, sp1, sp2, fe, fn, ellps),
            shift)
    for code, lat0, lon0, sp1, sp2, fe, fn, ellps, shift in D.ALBERS_ROWS:
        obj = wrap(
            AlbersEqualArea2SP(lat0, lon0, sp1, sp2, fe, fn, ellps), shift)
        reg[f"EPSG:{code}"] = obj
        if code >= 100000:                  # ESRI range: register both
            reg[f"ESRI:{code}"] = obj
    for code, lat_ts, lon0, fe, fn, south, ellps, shift in D.PSTEREO_ROWS:
        reg[f"EPSG:{code}"] = wrap(
            PolarStereographic(lat_ts, lon0, fe, fn, south=south,
                               ellps=ellps), shift)
    for code, lat0, lon0, fe, fn, ellps, shift in D.LAEA_ROWS:
        reg[f"EPSG:{code}"] = wrap(
            LambertAzimuthalEqualArea(lat0, lon0, fe, fn, ellps), shift)
    for code, lat_ts, lon0, fe, fn, ellps, shift in D.CEA_ROWS:
        obj = wrap(CylindricalEqualArea(lat_ts, lon0, fe, fn, ellps), shift)
        reg[f"EPSG:{code}"] = obj
        if code >= 54000:                   # ESRI world range
            reg[f"ESRI:{code}"] = obj
    for code, lon0 in D.EQEARTH_ROWS:
        reg[f"EPSG:{code}"] = EqualEarth(lon0)
    for code, kind in D.MERC_ROWS:
        reg[f"EPSG:{code}"] = (WebMercator() if kind == "sphere"
                               else MercatorEllipsoidal())
    for code, ellps, shift in D.GEOG_ROWS:
        reg[f"EPSG:{code}"] = GeographicCRS(ellps, shift)
    for code, kind in D.WORLD_ROWS:
        obj = {"eqc": EquirectangularSphere,
               "moll": MollweideSphere,
               "sinu": SinusoidalEllipsoidal,
               "eck4": EckertIVSphere}[kind]()
        reg[f"EPSG:{code}"] = obj
        if code >= 54000:                   # ESRI world range
            reg[f"ESRI:{code}"] = obj
    # SPCS83 foot-unit variants: the base metric zones are registered
    # above (projections.py _SPCS83 tables run first), so each foot
    # code wraps the already-built projection object
    for code, base, unit in D.FOOT_ROWS:
        reg[f"EPSG:{code}"] = ScaledAxes(
            reg[f"EPSG:{base}"],
            US_SURVEY_FOOT if unit == "ftUS" else INTL_FOOT)
    # round-11 hand extras: CH1903 / LV03 (EPSG:21781) is the LV95
    # double projection with the 1903 false origin (600/200 km) behind
    # the classic CH1903 translation (swisstopo GRANIT87-era values,
    # no rotations — same convention as the 2056 entry); plus the
    # common ESRI aliases for Krovak East-North and Web Mercator.
    reg["EPSG:21781"] = HelmertProj(
        SwissObliqueMercator(600000.0, 200000.0),
        t=(-674.4, -15.1, -405.3), r_arcsec=(0.0, 0.0, 0.0), s_ppm=0.0)
    if "EPSG:5514" in reg:
        reg["ESRI:102067"] = reg["EPSG:102067"] = reg["EPSG:5514"]
    if "EPSG:3857" in reg:
        reg["ESRI:102100"] = reg["EPSG:102100"] = reg["EPSG:3857"]


_register_projections()
_register_generated()
_register_from_table()


def lookup_projection(code: str):
    """Projection object for an EPSG/ESRI code, or None."""
    return _PROJ_REGISTRY.get(code.upper())


def nearest_supported(code: str, n: int = 5) -> list[str]:
    """The n numerically-nearest registered codes to an unsupported EPSG
    code — for actionable NotImplementedError messages."""
    c = code.upper().replace("EPSG:", "").replace("ESRI:", "")
    if not c.isdigit():
        return sorted(_PROJ_REGISTRY)[:n]
    v = int(c)
    return sorted(
        set(_PROJ_REGISTRY)
        | {f"EPSG:{32600 + z}" for z in range(1, 61)}
        | {f"EPSG:{32700 + z}" for z in range(1, 61)},
        key=lambda k: (abs(int(k.split(":")[1]) - v)
                       if k.split(":")[1].isdigit() else 10**9))[:n]
