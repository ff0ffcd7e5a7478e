"""Geography (spherical/geodesic) kernels + S2-style cells — SURVEY §2.4."""

import math

import pytest

from sedona_db_spark.functions import geography as geo


def one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").first()["v"]


def test_haversine_known_pairs():
    # London -> Paris ~343.5 km
    d = geo.haversine_m(-0.1278, 51.5074, 2.3522, 48.8566)
    assert d == pytest.approx(343_500, rel=0.01)
    # equator degree ~111.19 km
    assert geo.haversine_m(0, 0, 1, 0) == pytest.approx(111_195, rel=0.001)


def test_spheroid_vs_sphere():
    # meridian arc 0->45N: spheroid slightly shorter than sphere per WGS84
    s = geo.spheroid_distance_m(0, 0, 0, 45)
    h = geo.haversine_m(0, 0, 0, 45)
    assert s == pytest.approx(4_984_940, rel=0.001)  # known WGS84 value
    assert abs(s - h) / h < 0.01
    assert geo.spheroid_distance_m(10, 10, 10, 10) == 0.0


def test_spherical_polygon_area():
    # 1x1 degree cell at the equator ~ (111.19 km)^2 ~ 1.2364e10 m2
    from sedona_db_spark.geom import wkt
    g = wkt.from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    a = geo.geodesic_area_m2(g)
    assert a == pytest.approx(1.2364e10, rel=0.01)
    # same cell at 60N is ~half the area (cos 60 = 0.5 shrink in lon)
    g60 = wkt.from_wkt("POLYGON ((0 60, 1 60, 1 61, 0 61, 0 60))")
    assert geo.geodesic_area_m2(g60) / a == pytest.approx(0.5, rel=0.05)


def test_cell_hierarchy():
    c30 = geo.cell_id_from_point(2.35, 48.85, 30)
    c10 = geo.cell_id_from_point(2.35, 48.85, 10)
    assert c30 >> (2 * 20) == c10                # parent is a prefix
    # nearby points share coarse cells, far points don't
    assert geo.cell_id_from_point(2.36, 48.86, 8) == \
        geo.cell_id_from_point(2.35, 48.85, 8)
    assert geo.cell_id_from_point(100.0, -30.0, 8) != \
        geo.cell_id_from_point(2.35, 48.85, 8)


def test_sql_surface(spark):
    d = one(spark, "ST_DistanceSphere(ST_Point(0.0, 0.0), ST_Point(1.0, 0.0))")
    assert d == pytest.approx(111_195, rel=0.01)
    ds = one(spark, "ST_DistanceSpheroid(ST_Point(0.0, 0.0), ST_Point(0.0, 45.0))")
    assert ds == pytest.approx(4_984_940, rel=0.001)
    assert one(spark, "ST_DWithinSphere(ST_Point(0.0,0.0), ST_Point(1.0,0.0), 120000.0)") is True
    assert one(spark, "ST_DWithinSphere(ST_Point(0.0,0.0), ST_Point(1.0,0.0), 100000.0)") is False
    a = one(spark, "ST_AreaSpheroid(ST_GeomFromWKT('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'))")
    assert a == pytest.approx(1.2364e10, rel=0.01)
    ln = one(spark, "ST_LengthSpheroid(ST_GeomFromWKT('LINESTRING (0 0, 1 0)'))")
    assert ln == pytest.approx(111_195, rel=0.01)
    cid = one(spark, "S2_CellIDFromPoint(ST_Point(2.35, 48.85), 10)")
    assert isinstance(cid, int)
    cov = one(spark, "S2_CoveringCellIDs(ST_MakeEnvelope(0.0, 0.0, 2.0, 2.0), 6)")
    assert isinstance(cov, list) and len(cov) >= 1


def test_covering_cells_bucket_join_shape(spark):
    """Covering cells are the geography join key (S2-bucketed equi-join):
    a point's cell at level L must appear in the covering of a polygon
    containing it."""
    poly_cells = one(spark, "S2_CoveringCellIDs(ST_MakeEnvelope(2.0, 48.0, 3.0, 49.0), 7)")
    pt_cell = one(spark, "S2_CellIDFromPoint(ST_Point(2.35, 48.85), 7)")
    assert pt_cell in poly_cells
