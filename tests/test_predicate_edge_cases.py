"""PostGIS-compatible NULL/EMPTY/collection predicate edge cases.

The case list mirrors the reference's differential suite
(/root/reference/python/sedonadb/tests/functions/test_predicates.py:21-97)
— encoded as OUR spec per SURVEY §5/§7 ("encode them as the spec").
"""

import pytest

CONTAINS_CASES = [
    (None, None, None),
    ("POINT (0 0)", None, None),
    (None, "POINT (0 0)", None),
    ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", "POINT (0 0)", False),
    ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", "POINT (0.5 0.5)", True),
    ("POINT (0 0)", "POINT EMPTY", False),
    ("POINT (0 0)", "LINESTRING (0 0, 1 1)", False),
    ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", "LINESTRING (0 0, 1 1)", True),
    ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
     "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))", False),
    # hole-boundary sharing: the hole's interior is A's exterior
    ("POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0), (1 1, 1 2, 2 1, 1 1))",
     "POLYGON ((1 1, 1 2, 2 1, 1 1))", False),
    ("POINT (1 1)",
     "GEOMETRYCOLLECTION (POINT (0 0), POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)),"
     " LINESTRING (0 0, 1 1))", False),
    ("GEOMETRYCOLLECTION (POINT (0 0))", "POINT (0 0)", True),
    # point absorbed into the line's boundary
    ("GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (0 0, 0 1))",
     "POINT (0 0)", False),
    ("GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (0 0, 0 1))",
     "POINT (0 0.5)", True),
    # isolated point part keeps its own interior
    ("GEOMETRYCOLLECTION (POINT (-1 -1), LINESTRING (0 0, 0 1))",
     "POINT (-1 -1)", True),
    ("GEOMETRYCOLLECTION (POINT (0 0), POLYGON ((0 0, 0 1, 1 0, 0 0)))",
     "POINT (0 0)", False),
    ("GEOMETRYCOLLECTION (POINT (0 0), POLYGON ((0 0, 0 1, 1 0, 0 0)))",
     "POINT (0.25 0.25)", True),
    # line lying along the area boundary has no independent interior
    ("GEOMETRYCOLLECTION (LINESTRING (0 0, 0 1), POLYGON ((0 0, 0 1, 1 0, 0 0)))",
     "LINESTRING (0 0, 0 1)", False),
    ("GEOMETRYCOLLECTION (LINESTRING (0 0, 0 1), POLYGON ((0 0, 0 1, 1 0, 0 0)))",
     "LINESTRING (0 0, 0.25 0.25)", True),
]


def _expr(wkt):
    return "CAST(NULL AS BINARY)" if wkt is None else f"ST_GeomFromWKT('{wkt}')"


@pytest.mark.parametrize("g1,g2,expected", CONTAINS_CASES,
                         ids=[f"{str(a)[:25]}|{str(b)[:25]}"
                              for a, b, _ in CONTAINS_CASES])
def test_contains_edge_cases(spark, g1, g2, expected):
    got = spark.sql(
        f"SELECT ST_Contains({_expr(g1)}, {_expr(g2)}) AS v").first()["v"]
    assert got == expected


INTERSECTS_CASES = [
    (None, "POINT (0 0)", None),
    ("POINT EMPTY", "POINT (0 0)", False),
    ("POINT (0 0)", "POINT (0 0)", True),
    ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", "POINT (0 0)", True),  # boundary
    ("LINESTRING (0 0, 1 1)", "LINESTRING (1 0, 0 1)", True),
    ("LINESTRING (0 0, 1 1)", "LINESTRING (2 2, 3 3)", False),
]


@pytest.mark.parametrize("g1,g2,expected", INTERSECTS_CASES,
                         ids=[f"{str(a)[:25]}|{str(b)[:25]}"
                              for a, b, _ in INTERSECTS_CASES])
def test_intersects_edge_cases(spark, g1, g2, expected):
    got = spark.sql(
        f"SELECT ST_Intersects({_expr(g1)}, {_expr(g2)}) AS v").first()["v"]
    assert got == expected


# DE-9IM matrices verified against PostGIS/GEOS ST_Relate.  The two
# MULTIPOLYGON rows are the interacting-parts cases where cell-wise max
# over part pairs is wrong (two parts of A jointly covering B must give
# E(A)^I(B) = F; a part inside B plus a disjoint part must NOT claim
# I(A)^B(B)).
RELATE_CASES = [
    ("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
     "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))", "212101212"),
    ("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
     "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "2FFF1FFF2"),
    ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
     "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))", "212FF1FF2"),
    ("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
     "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))", "FF2F11212"),
    ("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
     "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))", "FF2FF1212"),
    # hole-filling: B equals A's hole -> interiors disjoint, the shared
    # ring is boundary of BOTH (so E(A)^B(B) = F, not 1)
    ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))",
     "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))", "FF2F112F2"),
    # two parts of A jointly cover B exactly
    ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((1 0, 2 0, 2 1, 1 1, 1 0)))",
     "POLYGON ((0 0, 2 0, 2 1, 0 1, 0 0))", "2FF11FFF2"),
    # one part strictly inside B, one disjoint part
    ("MULTIPOLYGON (((1 1, 2 1, 2 2, 1 2, 1 1)), ((10 10, 11 10, 11 11, 10 11, 10 10)))",
     "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))", "2F21F1212"),
    # multilinestring with shared endpoint (mod-2 boundary) vs line
    ("MULTILINESTRING ((0 0, 1 0), (1 0, 2 0))",
     "LINESTRING (0 0, 2 0)", "1FFF0FFF2"),
]


@pytest.mark.parametrize("g1,g2,expected", RELATE_CASES,
                         ids=[f"relate{i}" for i in range(len(RELATE_CASES))])
def test_relate_exact_matrices(spark, g1, g2, expected):
    got = spark.sql(
        f"SELECT ST_Relate({_expr(g1)}, {_expr(g2)}) AS v").first()["v"]
    assert got == expected


# Heterogeneous GEOMETRYCOLLECTION semantics — expectations mirror the
# reference's PostGIS-parity suite
# (/root/reference/python/sedonadb/tests/functions/test_predicates.py:45-90):
# B(GC) = boundary(areal union) + mod-2 line endpoints; element interiors
# never absorb boundary points; areal interior has priority.
MIXED_GC_CONTAINS = [
    ("GEOMETRYCOLLECTION (POINT (0 0))", "POINT (0 0)", True),
    # point part at a line endpoint stays boundary
    ("GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (0 0, 0 1))",
     "POINT (0 0)", False),
    ("GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (0 0, 0 1))",
     "POINT (0 0.5)", True),
    ("GEOMETRYCOLLECTION (POINT (-1 -1), LINESTRING (0 0, 0 1))",
     "POINT (-1 -1)", True),
    # point part on a polygon-part boundary stays boundary
    ("GEOMETRYCOLLECTION (POINT (0 0), POLYGON ((0 0, 0 1, 1 0, 0 0)))",
     "POINT (0 0)", False),
    ("GEOMETRYCOLLECTION (POINT (0 0), POLYGON ((0 0, 0 1, 1 0, 0 0)))",
     "POINT (0.25 0.25)", True),
    # line part lying on the polygon edge is absorbed into the boundary
    ("GEOMETRYCOLLECTION (LINESTRING (0 0, 0 1), POLYGON ((0 0, 0 1, 1 0, 0 0)))",
     "LINESTRING (0 0, 0 1)", False),
    ("GEOMETRYCOLLECTION (LINESTRING (0 0, 0 1), POLYGON ((0 0, 0 1, 1 0, 0 0)))",
     "LINESTRING (0 0, 0.25 0.25)", True),
]


@pytest.mark.parametrize("g1,g2,expected", MIXED_GC_CONTAINS,
                         ids=[f"gc{i}" for i in range(len(MIXED_GC_CONTAINS))])
def test_mixed_gc_contains(spark, g1, g2, expected):
    got = spark.sql(
        f"SELECT ST_Contains({_expr(g1)}, {_expr(g2)}) AS v").first()["v"]
    assert got == expected


def test_mixed_gc_covered_by(spark):
    got = spark.sql(
        "SELECT ST_CoveredBy(ST_GeomFromWKT('POINT (1 1)'), ST_GeomFromWKT("
        "'GEOMETRYCOLLECTION (POINT (0 0), POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)),"
        " LINESTRING (0 0, 1 1))')) AS v").first()["v"]
    assert got is True


def test_mixed_gc_relate_matrices():
    """Direct matrix checks for absorption cases (no Spark round-trip)."""
    from sedona_db_spark.geom import wkt
    from sedona_db_spark.geom.algorithms2 import relate_matrix
    W = wkt.from_wkt
    # line endpoint inside a polygon interior -> interior (area priority)
    m = relate_matrix(
        W("GEOMETRYCOLLECTION (POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0)),"
          " LINESTRING (2 2, 6 2))"),
        W("POINT (2 2)"))
    assert m[0] == "0" and m[3] == "F"  # I(A) cap I(B), not boundary
    # mixed GC vs mixed GC: point-vs-line-interior crossing
    m2 = relate_matrix(
        W("GEOMETRYCOLLECTION (POINT (5 5), LINESTRING (0 0, 2 0))"),
        W("GEOMETRYCOLLECTION (POINT (5 5), LINESTRING (1 -1, 1 1))"))
    assert m2[0] == "0"   # shared isolated point + line crossing
