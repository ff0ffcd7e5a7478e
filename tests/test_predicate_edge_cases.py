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
