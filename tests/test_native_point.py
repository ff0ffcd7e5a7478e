"""Bit-exactness and wiring of the native point extraction rewrite.

plans/native_point.py reconstructs IEEE-754 doubles from point-WKB bit
patterns with pure whole-stage-codegen SQL; the certified-scalar rewrite
(plans/sql_rewrite.rewrite_certified_scalar) substitutes it for the
ST_X/ST_Y/ST_Distance kernels only under a point certificate.  These
tests pin (a) bit-equality against the Python kernels over the full
double domain including subnormals/zeros/inf/NaN, (b) the guard's
rejection of non-point WKB, (c) certify_point_table's refusal to stamp
a lying certificate, and (d) the rewrite firing (plan goes pure native)
without changing results.
"""

import math
import struct

import numpy as np
import pytest

from sedona_db_spark.plans.native_point import (
    point_guard_sql, point_x_sql, point_y_sql)


def _pt_wkb(x: float, y: float) -> bytes:
    return b"\x01\x01\x00\x00\x00" + struct.pack("<dd", x, y)


def _domain_coords():
    rng = np.random.default_rng(20260817)
    vals = list(rng.uniform(-1e6, 1e6, 200))
    vals += list(rng.normal(0, 1e-300, 20))            # subnormal-range
    vals += [0.0, -0.0, math.inf, -math.inf,
             5e-324, -5e-324, 2.2250738585072014e-308,  # min subnormal/normal
             1.7976931348623157e308, -1.7976931348623157e308,
             1.0, -1.0, 123.456, -0.1]
    vals += list(rng.uniform(-180, 180, 80))
    return vals


def test_native_xy_bit_exact(spark):
    coords = _domain_coords()
    pts = [(_pt_wkb(x, y),) for x, y in zip(coords, coords[::-1])]
    df = spark.createDataFrame(pts, "g binary")
    df.createOrReplaceTempView("np_bits")
    rows = spark.sql(
        f"SELECT ST_X(g) kx, ST_Y(g) ky, {point_x_sql('g')} nx, "
        f"{point_y_sql('g')} ny FROM np_bits").collect()
    assert len(rows) == len(pts)
    for r in rows:
        # bit-level equality (incl. -0.0 vs 0.0)
        for k, n in ((r["kx"], r["nx"]), (r["ky"], r["ny"])):
            assert struct.pack("<d", k) == struct.pack("<d", n), (k, n)


def test_nan_points_never_certify(spark):
    """NaN-coordinate WKB is the kernels' POINT EMPTY encoding (ST_X/Y
    -> NULL); the ST_Point kernel never produces it (NaN input -> NULL
    geometry), and write-time certification must refuse it so the
    native extraction (which would yield NaN, not NULL) stays
    unreachable for such rows."""
    from sedona_db_spark.plans.sql_rewrite import certify_point_table
    rows = [(_pt_wkb(1.0, 2.0),), (_pt_wkb(math.nan, math.nan),)]
    spark.createDataFrame(rows, "geom binary").write.mode("overwrite") \
        .saveAsTable("np_cert_nan")
    with pytest.raises(ValueError, match="refusing to stamp"):
        certify_point_table(spark, "np_cert_nan", ["geom"])
    spark.sql("DROP TABLE np_cert_nan")
    # and the kernel indeed NULLs NaN input, so plan-certified columns
    # cannot contain NaN coords
    r = spark.sql("SELECT ST_Point(CAST('NaN' AS DOUBLE), 1.0) g").first()
    assert r["g"] is None


def test_guard_rejects_non_point(spark):
    rows = [
        (b"\x01\x02\x00\x00\x00" + struct.pack("<dd", 1, 2),),  # linestring tag
        (b"\x00\x01\x00\x00\x00" + struct.pack(">dd", 1, 2),),  # big-endian
        (_pt_wkb(1, 2) + b"\x00",),                              # wrong length
        (_pt_wkb(1, 2)[:-1],),
        (None,),
    ]
    df = spark.createDataFrame(rows, "g binary")
    df.createOrReplaceTempView("np_guard")
    out = spark.sql(
        f"SELECT {point_guard_sql('g')} ok, {point_x_sql('g')} x "
        "FROM np_guard").collect()
    assert all(not r["ok"] for r in out if r["ok"] is not None)
    assert all(r["x"] is None for r in out)


def test_certify_point_table_stamps_and_refuses(spark, tmp_path):
    from sedona_db_spark.plans.sql_rewrite import (
        certify_point_table, _point_table_cols)
    good = [( _pt_wkb(float(i), float(-i)),) for i in range(10)] + [(None,)]
    spark.createDataFrame(good, "geom binary").write.mode("overwrite") \
        .saveAsTable("np_cert_good")
    certify_point_table(spark, "np_cert_good", ["geom"])
    assert _point_table_cols(spark, "np_cert_good") == ["geom"]

    bad = good + [(b"\x01\x02\x00\x00\x00" + struct.pack("<dd", 1, 2),)]
    spark.createDataFrame(bad, "geom binary").write.mode("overwrite") \
        .saveAsTable("np_cert_bad")
    with pytest.raises(ValueError, match="refusing to stamp"):
        certify_point_table(spark, "np_cert_bad", ["geom"])
    assert _point_table_cols(spark, "np_cert_bad") == []
    spark.sql("DROP TABLE np_cert_good")
    spark.sql("DROP TABLE np_cert_bad")


def test_shadow_certification_and_substitution(spark):
    """Shadow columns (stored doubles proven bit-equal to the WKB
    coordinates) substitute directly — zero per-row decode: no
    EvalPython AND no bit-extraction (conv) in the plan."""
    from sedona_db_spark.plans.sql_rewrite import certify_point_table
    rng = np.random.default_rng(11)
    rows = [(int(i), _pt_wkb(float(x), float(y)), float(x), float(y))
            for i, (x, y) in enumerate(rng.uniform(-50, 50, (32, 2)))]
    rows.append((32, None, None, None))    # NULL row: shadows NULL too
    spark.createDataFrame(rows, "k bigint, geom binary, px double, py double") \
        .write.mode("overwrite").saveAsTable("np_shadow_pts")
    certify_point_table(spark, "np_shadow_pts", ["geom"],
                        shadow={"geom": ("px", "py")})
    q = ("SELECT a.k, ST_Distance(a.geom, b.geom) d, ST_X(a.geom) x "
         "FROM np_shadow_pts a JOIN np_shadow_pts b ON b.k = a.k + 1")
    out = spark.sql(q)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan
    assert "conv(" not in plan, plan       # shadow, not bit extraction
    got = {r["k"]: (r["d"], r["x"]) for r in out.collect()}
    by_k = {k: (x, y) for k, _, x, y in rows}
    for k, (d, x) in got.items():
        if by_k[k][0] is None or by_k[k + 1][0] is None:
            assert d is None and (x is None or by_k[k][0] is not None)
            continue
        assert x == by_k[k][0]
        assert d == pytest.approx(math.hypot(
            by_k[k][0] - by_k[k + 1][0], by_k[k][1] - by_k[k + 1][1]),
            abs=1e-9)
    spark.sql("DROP TABLE np_shadow_pts")


def test_shadow_certification_refusals(spark):
    from sedona_db_spark.plans.sql_rewrite import certify_point_table
    # (a) coordinate mismatch
    rows = [(_pt_wkb(1.0, 2.0), 1.0, 2.5)]
    spark.createDataFrame(rows, "geom binary, px double, py double") \
        .write.mode("overwrite").saveAsTable("np_shadow_bad")
    with pytest.raises(ValueError, match="refusing to stamp"):
        certify_point_table(spark, "np_shadow_bad", ["geom"],
                            shadow={"geom": ("px", "py")})
    # (b) sign-of-zero mismatch: WKB stores -0.0, shadow says 0.0
    rows = [(_pt_wkb(-0.0, 2.0), 0.0, 2.0)]
    spark.createDataFrame(rows, "geom binary, px double, py double") \
        .write.mode("overwrite").saveAsTable("np_shadow_zero")
    with pytest.raises(ValueError, match="refusing to stamp"):
        certify_point_table(spark, "np_shadow_zero", ["geom"],
                            shadow={"geom": ("px", "py")})
    # (c) NULL geometry with non-NULL shadow (substitution would
    # resurrect a value the kernel returns NULL for)
    rows = [(None, 1.0, 2.0)]
    spark.createDataFrame(rows, "geom binary, px double, py double") \
        .write.mode("overwrite").saveAsTable("np_shadow_null")
    with pytest.raises(ValueError, match="refusing to stamp"):
        certify_point_table(spark, "np_shadow_null", ["geom"],
                            shadow={"geom": ("px", "py")})
    for t in ("np_shadow_bad", "np_shadow_zero", "np_shadow_null"):
        spark.sql(f"DROP TABLE {t}")


def test_view_shadow_invalidated_by_replace(spark):
    """certify_point_view's certificate dies with the view definition:
    CREATE OR REPLACE with different content must fail the fingerprint
    so the rewrite falls back to the kernel (fail-closed)."""
    from sedona_db_spark.plans.sql_rewrite import (
        certify_point_view, _view_shadow)
    spark.sql("""CREATE OR REPLACE TEMP VIEW np_vshadow AS
                 SELECT CAST(id AS DOUBLE) vx, CAST(-id AS DOUBLE) vy,
                        ST_Point(CAST(id AS DOUBLE), CAST(-id AS DOUBLE)) g
                 FROM range(10)""")
    certify_point_view(spark, "np_vshadow", {"g": ("vx", "vy")})
    assert _view_shadow(spark, "np_vshadow", "g") == ("vx", "vy")
    spark.sql("""CREATE OR REPLACE TEMP VIEW np_vshadow AS
                 SELECT CAST(id AS DOUBLE) vx, CAST(id AS DOUBLE) vy,
                        ST_Point(CAST(id AS DOUBLE), CAST(id AS DOUBLE)) g
                 FROM range(10)""")
    assert _view_shadow(spark, "np_vshadow", "g") is None
    spark.catalog.dropTempView("np_vshadow")


def test_certified_scalar_rewrite_fires_and_matches(spark):
    from sedona_db_spark.plans.sql_rewrite import certify_point_table
    rng = np.random.default_rng(7)
    pts = [(int(i), _pt_wkb(float(x), float(y)))
           for i, (x, y) in enumerate(rng.uniform(-100, 100, (64, 2)))]
    spark.createDataFrame(pts, "k bigint, geom binary") \
        .write.mode("overwrite").saveAsTable("np_cert_pts")
    certify_point_table(spark, "np_cert_pts", ["geom"])
    q = ("SELECT a.k, ST_Distance(a.geom, b.geom) d, ST_X(a.geom) x "
         "FROM np_cert_pts a JOIN np_cert_pts b ON b.k = a.k + 1")
    out = spark.sql(q)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan     # rewrite fired: no kernel
    got = {r["k"]: (r["d"], r["x"]) for r in out.collect()}
    by_k = {k: struct.unpack("<dd", g[5:]) for k, g in pts}
    assert len(got) == 63
    for k, (d, x) in got.items():
        ax, ay = by_k[k]
        bx, by = by_k[k + 1]
        assert x == ax
        assert d == pytest.approx(math.hypot(ax - bx, ay - by), abs=1e-9)
    spark.sql("DROP TABLE np_cert_pts")
