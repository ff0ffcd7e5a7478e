"""Scalar cases replayed from the reference's OWN unit tests.

Each row is an (SQL expression, expected) pair transcribed from a
reference test file (cited per block) — the literal assertions its
engine makes about itself, run through this engine's SQL surface.
Round 11: mining these surfaced and fixed four semantic gaps
(ST_Boundary mod-2 + collection recursion, ST_BuildArea polygon
linework + empty type, ST_MakeValid collapse->linework, ST_Normalize
GEOS canonical form)."""

import pytest


def _one(spark, expr):
    return spark.sql(f"SELECT {expr}").collect()[0][0]


CASES = [
    # c/sedona-geos/src/st_boundary.rs
    ("ST_AsText(ST_Boundary(ST_GeomFromWKT("
     "'LINESTRING(100 150,50 60, 70 80, 160 170)')))",
     "MULTIPOINT ((100 150), (160 170))"),
    ("ST_AsText(ST_Boundary(ST_GeomFromWKT("
     "'MULTILINESTRING ((10 10, 20 20), (30 30, 40 40, 30 30))')))",
     "MULTIPOINT ((10 10), (20 20))"),
    ("ST_AsText(ST_Boundary(ST_GeomFromWKT("
     "'POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))')))",
     "LINESTRING (0 0, 0 10, 10 10, 10 0, 0 0)"),
    # c/sedona-geos/src/st_buildarea.rs
    ("ST_AsText(ST_BuildArea(ST_GeomFromWKT('POLYGON ((0 0, 1 0, 1 1, 0 0))')))",
     "POLYGON ((0 0, 1 1, 1 0, 0 0))"),
    ("ST_AsText(ST_BuildArea(ST_GeomFromWKT('LINESTRING EMPTY')))",
     "POLYGON EMPTY"),
    # c/sedona-geos/src/st_makevalid.rs
    ("ST_AsText(ST_MakeValid(ST_GeomFromWKT("
     "'POLYGON ((0 0, 1 1, 2 2, 3 3, 0 0))')))",
     "MULTILINESTRING ((0 0, 1 1), (1 1, 2 2), (2 2, 3 3))"),
    ("ST_AsText(ST_MakeValid(ST_GeomFromWKT('POLYGON ((0 0, 0 1, 1 1, "
     "1 0, 0.0000000001 0.0000000001, 0 0))')))",
     "POLYGON ((0 0, 0 1, 1 1, 1 0, 1e-10 1e-10, 0 0))"),
    # c/sedona-geos/src/st_normalize.rs
    ("ST_AsText(ST_Normalize(ST_GeomFromWKT("
     "'MULTILINESTRING ((2 2, 1 1), (4 4, 3 3))')))",
     "MULTILINESTRING ((3 3, 4 4), (1 1, 2 2))"),
    ("ST_AsText(ST_Normalize(ST_GeomFromWKT("
     "'POLYGON((1 1, 1 0, 0 0, 0 1, 1 1))')))",
     "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))"),
    # rust/sedona-functions/src/st_start_point.rs
    ("ST_AsText(ST_StartPoint(ST_GeomFromWKT('LINESTRING (1 2, 3 4, 5 6)')))",
     "POINT (1 2)"),
    ("ST_AsText(ST_EndPoint(ST_GeomFromWKT('LINESTRING (1 2, 3 4, 5 6)')))",
     "POINT (5 6)"),
    # c/sedona-geos/src/st_centroid.rs / st_pointonsurface.rs
    ("ST_AsText(ST_Centroid(ST_GeomFromWKT("
     "'POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))')))", "POINT (0.5 0.5)"),
    ("ST_AsText(ST_PointOnSurface(ST_GeomFromWKT('POINT (1 2)')))",
     "POINT (1 2)"),
    # rust/sedona-functions/src/st_haszm.rs
    ("ST_HasM(ST_GeomFromWKT('POINT M (1 2 3)'))", True),
    ("ST_HasZ(ST_GeomFromWKT('POINT M (1 2 3)'))", False),
    ("ST_ZMFlag(ST_GeomFromWKT('POINT ZM (1 2 3 4)'))", 3),
    # rust/sedona-functions/src/st_npoints.rs
    ("ST_NPoints(ST_GeomFromWKT('LINESTRING (1 2, 3 4, 5 6)'))", 3),
    # c/sedona-geos/src/st_exteriorring.rs / st_isring.rs / st_issimple.rs
    ("ST_AsText(ST_ExteriorRing(ST_GeomFromWKT("
     "'POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))')))",
     "LINESTRING (0 0, 0 10, 10 10, 10 0, 0 0)"),
    ("ST_IsRing(ST_GeomFromWKT('LINESTRING (0 0, 1 0, 1 1, 0 1, 0 0)'))",
     True),
    ("ST_IsSimple(ST_GeomFromWKT('LINESTRING (0 0, 1 1, 1 0, 0 1)'))",
     False),
    # c/sedona-geos/src/st_convexhull.rs / st_polygonize.rs — GEOS
    # emits CLOCKWISE shells; pinned byte-for-byte
    ("ST_AsText(ST_ConvexHull(ST_GeomFromWKT("
     "'MULTIPOINT ((0 0), (0 1), (1 1), (1 0))')))",
     "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))"),
    ("ST_AsText(ST_Polygonize(ST_GeomFromWKT("
     "'LINESTRING(0 0, 0 1, 1 1, 1 0, 0 0)')))",
     "GEOMETRYCOLLECTION (POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0)))"),
    ("ST_AsText(ST_BuildArea(ST_GeomFromWKT("
     "'LINESTRING (0 0, 1 0, 1 1, 0 1, 0 0)')))",
     "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))"),
]


@pytest.mark.parametrize("expr,expected", CASES,
                         ids=[c[0][:48] for c in CASES])
def test_reference_scalar_golden(spark, expr, expected):
    assert _one(spark, expr) == expected


def test_reference_unaryunion_exact(spark):
    """c/sedona-geos/src/st_unaryunion.rs: byte-for-byte WKT of the
    dissolved two-square union (CW shell, GEOS vertex order)."""
    got = _one(spark, "ST_AsText(ST_UnaryUnion(ST_GeomFromWKT("
               "'MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
               "((1 0, 2 0, 2 1, 1 1, 1 0)))')))")
    assert got == "POLYGON ((0 0, 0 1, 1 1, 2 1, 2 0, 1 0, 0 0))"


def test_reference_st_points_multipoint(spark):
    """rust/sedona-functions/src/st_points.rs: ST_Points returns ONE
    MULTIPOINT of every vertex (dims preserved), not an exploded set."""
    got = _one(spark, "ST_AsText(ST_Points(ST_GeomFromWKT("
               "'LINESTRING (1 2, 3 4, 5 6)')))")
    assert got == "MULTIPOINT ((1 2), (3 4), (5 6))"
    got = _one(spark, "ST_AsText(ST_Points(ST_GeomFromWKT("
               "'POINT Z (1 2 3)')))")
    assert got == "MULTIPOINT Z ((1 2 3))"


def test_r11_review_regressions(spark):
    """Second self-review wave: GC linework double-count, Z/M flag
    propagation through boundary/makevalid, puntal BuildArea null,
    aggregate hull orientation."""
    # GC members are walked once — one polygon, not two
    got = _one(spark, "ST_AsText(ST_BuildArea(ST_GeomFromWKT("
               "'GEOMETRYCOLLECTION(LINESTRING(0 0, 0 1, 1 1, 1 0, 0 0))')))")
    assert got == "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))"
    # split multiline ring inside a GC still polygonizes (the old
    # double-count made every endpoint degree-4 and returned EMPTY)
    got = _one(spark, "ST_Area(ST_BuildArea(ST_GeomFromWKT("
               "'GEOMETRYCOLLECTION(MULTILINESTRING((0 0, 0 1, 1 1),"
               "(1 1, 1 0, 0 0)))')))")
    assert got == 1.0
    # puntal input -> SQL NULL (reference st_buildarea.rs)
    assert _one(spark, "ST_BuildArea(ST_GeomFromWKT('POINT (0 0)')) "
                "IS NULL") is True
    # Z flags survive boundary; collapsed-Z makevalid returns 2D linework
    got = _one(spark, "ST_AsText(ST_Boundary(ST_GeomFromWKT("
               "'MULTILINESTRING Z ((10 10 1, 20 20 1), "
               "(30 30 1, 40 40 1, 30 30 1))')))")
    assert got == "MULTIPOINT Z ((10 10 1), (20 20 1))"
    got = _one(spark, "ST_AsText(ST_MakeValid(ST_GeomFromWKT("
               "'POLYGON Z ((0 0 1, 1 1 1, 2 2 1, 3 3 1, 0 0 1))')))")
    assert got == "MULTILINESTRING ((0 0, 1 1), (1 1, 2 2), (2 2, 3 3))"
    # aggregate hull matches the scalar's CW shell
    # (rust/sedona-geo/src/st_convexhull_agg.rs:447)
    got = _one(spark, "ST_AsText(ST_ConvexHull_Agg(g)) FROM (SELECT "
               "ST_GeomFromWKT(w) AS g FROM VALUES ('POINT (0 0)'),"
               "('POINT (0 1)'),('POINT (1 1)'),('POINT (1 0)') AS t(w))")
    assert got == "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))"
