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
