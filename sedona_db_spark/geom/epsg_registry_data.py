"""Committed EPSG parameter data for the generated projection registry.

PUBLIC DATA: every row restates projected-CRS parameters from the public
EPSG registry (epsg.org dataset; also republished in NOAA NGS SPCS83
documents and national mapping-agency specifications).  The reference
engine links PROJ's full database (/root/reference/c/sedona-proj);
this module is the repo's importable dump for the same role — breadth
is DATA, the math lives in geom/projections.py.

Row formats (consumed by projections._register_from_table):

``TM_ROWS``      (code, lat0, lon0, k0, FE, FN, ellps, shift)
``LCC2_ROWS``    (code, lat0, lon0, sp1, sp2, FE, FN, ellps, shift)
``ALBERS_ROWS``  (code, lat0, lon0, sp1, sp2, FE, FN, ellps, shift)
``PSTEREO_ROWS`` (code, lat_ts, lon0, FE, FN, south, ellps, shift)
``MERC_ROWS``    (code, kind) with kind 'sphere' (EPSG:3857 Web
                 Mercator) or 'ellipsoidal' (EPSG:3395 World Mercator)
``UTM_SERIES``   (base_north, base_south, zones, ellps, shift) — one
                 registry entry per zone: base+zone north (FN 0) and
                 south (FN 10,000,000)

``shift`` is a 7-parameter Bursa-Wolf (position-vector convention) in
the WGS84 -> local-datum direction: (dx, dy, dz, rx", ry", rz", ds_ppm),
or None when the datum is treated as WGS84-coincident (meter-level:
ETRS89 / NAD83 / GDA / SIRGAS / JGD-class modern datums — the same
assumption the hand-curated entries make).

Angles are decimal degrees (sexagesimal EPSG values converted exactly).
"""

# WGS 72 -> WGS 84 is published as dz +4.5 m, rz +0.554", ds +0.219 ppm
# (EPSG transformation 1237); stored here inverted to the WGS84 -> WGS72
# direction the Helmert wrappers consume.
WGS84_TO_WGS72 = (0.0, 0.0, -4.5, 0.0, 0.0, -0.554, -0.219)

UTM_SERIES = [
    # WGS 84 / UTM zones 1-60 N (EPSG:32601-32660) and S (32701-32760)
    (32600, 32700, range(1, 61), "WGS84", None),
    # WGS 72 / UTM zones 1-60 N (EPSG:32201-32260) and S (32301-32360)
    (32200, 32300, range(1, 61), "WGS72", WGS84_TO_WGS72),
]

_D = lambda d, m=0.0, s=0.0: (abs(d) + m / 60.0 + s / 3600.0) * (1 if d >= 0 else -1)  # noqa: E731

TM_ROWS = [
    # --- Nordic / Baltic national grids (ETRS89-class datums) ---
    (3006, 0.0, 15.0, 0.9996, 500000.0, 0.0, "GRS80", None),       # SWEREF99 TM
    # SWEREF99 local zones (k0=1, FE 150 km): official lon0 sequence
    (3007, 0.0, 12.0, 1.0, 150000.0, 0.0, "GRS80", None),          # 12 00
    (3008, 0.0, 13.5, 1.0, 150000.0, 0.0, "GRS80", None),          # 13 30
    (3009, 0.0, 15.0, 1.0, 150000.0, 0.0, "GRS80", None),          # 15 00
    (3010, 0.0, 16.5, 1.0, 150000.0, 0.0, "GRS80", None),          # 16 30
    (3011, 0.0, 18.0, 1.0, 150000.0, 0.0, "GRS80", None),          # 18 00
    (3012, 0.0, 14.25, 1.0, 150000.0, 0.0, "GRS80", None),         # 14 15
    (3013, 0.0, 15.75, 1.0, 150000.0, 0.0, "GRS80", None),         # 15 45
    (3014, 0.0, 17.25, 1.0, 150000.0, 0.0, "GRS80", None),         # 17 15
    (3015, 0.0, 18.75, 1.0, 150000.0, 0.0, "GRS80", None),         # 18 45
    (3016, 0.0, 20.25, 1.0, 150000.0, 0.0, "GRS80", None),         # 20 15
    (3017, 0.0, 21.75, 1.0, 150000.0, 0.0, "GRS80", None),         # 21 45
    (3018, 0.0, 23.25, 1.0, 150000.0, 0.0, "GRS80", None),         # 23 15
    (3067, 0.0, 27.0, 0.9996, 500000.0, 0.0, "GRS80", None),       # ETRS89 / TM35FIN
    # ETRS89 / GK19FIN..GK31FIN (k0=1, zone-prefixed false easting)
    *[(3873 + i, 0.0, 19.0 + i, 1.0, (19 + i) * 1_000_000.0 + 500000.0,
       0.0, "GRS80", None) for i in range(13)],
    (3059, 0.0, 24.0, 0.9996, 500000.0, -6000000.0, "GRS80", None),  # LKS92 Latvia
    (3346, 0.0, 24.0, 0.9998, 500000.0, 0.0, "GRS80", None),         # LKS94 Lithuania
    # --- Central Europe ---
    (2180, 0.0, 19.0, 0.9993, 500000.0, -5300000.0, "GRS80", None),  # ETRS89 / Poland CS92
    (2176, 0.0, 15.0, 0.999923, 5500000.0, 0.0, "GRS80", None),      # Poland CS2000 zone 5
    (2177, 0.0, 18.0, 0.999923, 6500000.0, 0.0, "GRS80", None),      # zone 6
    (2178, 0.0, 21.0, 0.999923, 7500000.0, 0.0, "GRS80", None),      # zone 7
    (2179, 0.0, 24.0, 0.999923, 8500000.0, 0.0, "GRS80", None),      # zone 8
    (3794, 0.0, 15.0, 0.9999, 500000.0, -5000000.0, "GRS80", None),  # Slovenia D96/TM
    (3765, 0.0, 16.5, 0.9999, 500000.0, 0.0, "GRS80", None),         # Croatia HTRS96/TM
    # --- Iberia ---
    (3763, _D(39, 40, 5.73), _D(-8, 7, 59.19), 1.0, 0.0, 0.0,
     "GRS80", None),                                                 # Portugal ETRS89/TM06
]

LCC2_ROWS = [
    (3034, 52.0, 10.0, 35.0, 65.0, 4000000.0, 2800000.0, "GRS80", None),  # ETRS89 / LCC Europe
    (3301, _D(57, 31, 3.19415), 24.0, _D(59, 20), 58.0, 500000.0,
     6375000.0, "GRS80", None),                                      # Estonia L-EST97
    (3057, 65.0, -19.0, 64.25, 65.75, 500000.0, 500000.0,
     "GRS80", None),                                                 # ISN93 / Lambert 1993
    (3978, 49.0, -95.0, 49.0, 77.0, 0.0, 0.0, "GRS80", None),        # NAD83 / Canada Atlas
]

ALBERS_ROWS = [
    (3005, 45.0, -126.0, 50.0, 58.5, 1000000.0, 0.0, "GRS80", None),  # NAD83 / BC Albers
    (3338, 50.0, -154.0, 55.0, 65.0, 0.0, 0.0, "GRS80", None),        # NAD83 / Alaska Albers
    (6350, 23.0, -96.0, 29.5, 45.5, 0.0, 0.0, "GRS80", None),         # NAD83(2011) Conus Albers
    (102003, 37.5, -96.0, 29.5, 45.5, 0.0, 0.0, "GRS80", None),       # ESRI USA Contiguous
]

PSTEREO_ROWS = [
    # WGS 84 / Arctic Polar Stereographic and NSIDC Sea Ice South
    (3995, 71.0, 0.0, 0.0, 0.0, False, "WGS84", None),
    (3976, -70.0, 0.0, 0.0, 0.0, True, "WGS84", None),
    # Universal Polar Stereographic N/S (EPSG:5041/5042): defined by
    # k0 = 0.994 at the pole == true scale at 81.11451786859362 deg
    # (EPSG Guidance Note 7-2 variant A->B conversion)
    (5041, 81.11451786859362, 0.0, 2000000.0, 2000000.0, False,
     "WGS84", None),
    (5042, -81.11451786859362, 0.0, 2000000.0, 2000000.0, True,
     "WGS84", None),
]

MERC_ROWS = [
    (3857, "sphere"),        # WGS 84 / Pseudo-Mercator (Web Mercator)
    (900913, "sphere"),      # legacy alias
    (3395, "ellipsoidal"),   # WGS 84 / World Mercator
]
