"""Reference SQL-name parity (round 7, verdict item #6).

Extracts the set of SQL function names the reference registers (the name
string of every SedonaScalarUDF/aggregate constructor reachable from its
register.rs files, plus declared aliases) and asserts each one resolves in
this engine's spark.sql.  Alias misses are exactly what a porting user
trips on first.
"""

import glob
import os
import re

import pytest

_REF = "/root/reference/rust"

# Names registered by the reference but intentionally not carried, each
# with the reason (SURVEY §2 n/a rows / sandbox gates).
_EXCLUDED = {
    # GPU spatial join marker (SURVEY: GPU join n/a — no CUDA in a
    # PySpark engine; the join itself exists as spatial_join)
    "st_gpu_join",
}


def _reference_sql_names() -> set[str]:
    if not os.path.isdir(_REF):
        pytest.skip("reference repo unavailable")
    names: set[str] = set()
    srcs = (glob.glob(f"{_REF}/sedona-functions/src/*.rs")
            + glob.glob(f"{_REF}/sedona-geo/src/**/*.rs", recursive=True)
            + glob.glob(f"{_REF}/sedona-raster-functions/src/*.rs")
            + glob.glob(f"{_REF}/sedona-raster-gdal/src/*.rs"))
    for f in srcs:
        txt = open(f).read()
        names |= set(re.findall(
            r'::new\(\s*"((?:st|rs|sd)_[a-z0-9_]+)"', txt))
        names |= set(re.findall(
            r'(?:new_stub|from_impl|new_aggregate)\(\s*"((?:st|rs|sd)_[a-z0-9_]+)"',
            txt))
        for m in re.findall(r'with_aliases\(vec!\[([^\]]*)\]', txt):
            names |= set(re.findall(r'"([a-z0-9_]+)"', m))
    # the C-backed engines (GEOS / s2geography / geoarrow-c / proj /
    # tg) register overriding or additional implementations through
    # their own register.rs manifests — every quoted function name
    # there is user-callable (round 11: this is where st_geogfromwkb
    # lives, which the rust-layer glob alone misses)
    for f in glob.glob(f"{os.path.dirname(_REF)}/c/*/src/register.rs"):
        names |= set(re.findall(
            r'"((?:st|rs|sd|s2)_[a-z0-9_]+)"', open(f).read()))
    assert len(names) > 150, "extraction regressed — too few names found"
    return names


def test_every_reference_sql_name_resolves(spark):
    names = _reference_sql_names()
    missing = sorted(
        n for n in names - _EXCLUDED
        if not spark.catalog.functionExists(n))
    assert not missing, f"unregistered reference SQL names: {missing}"


def test_alias_semantics_match_canonical(spark):
    rows = spark.sql("""
      SELECT ST_AsWKT(ST_Point(1.0, 2.0)) AS wkt,
             ST_AsWKB(ST_Point(1.0, 2.0)) AS wkb,
             ST_AsText(ST_GeometryFromText('POINT (3 4)')) AS p2,
             ST_AsText(ST_LineStringFromText('LINESTRING (0 0, 1 1)')) AS l1,
             ST_AsText(ST_GeogFromText('POINT (5 6)')) AS g1,
             SD_SimplifyStorage(ST_AsWKB(ST_Point(1.0, 2.0))) AS simp
    """).collect()[0]
    assert rows["wkt"] == "POINT (1 2)"
    assert rows["p2"] == "POINT (3 4)"
    assert rows["l1"] == "LINESTRING (0 0, 1 1)"
    assert rows["g1"] == "POINT (5 6)"
    assert bytes(rows["simp"]) == bytes(rows["wkb"])


def test_rs_example_matches_reference_fixture(spark):
    """rs_example.rs:50-75: 64x32, 3 uint8 bands, transform
    [43.08, 2, 1, 79.07, 1, 2], nodata 127, band N filled with N except
    the nodata top-left corner."""
    r = spark.sql("SELECT RS_Example() AS r").collect()[0]["r"]
    assert list(r["spatial_shape"]) == [32, 64]
    assert [round(v, 2) for v in r["transform"]] == [43.08, 2.0, 1.0,
                                                     79.07, 1.0, 2.0]
    assert len(r["bands"]) == 3
    import numpy as np
    for i, b in enumerate(r["bands"]):
        assert b["nodata"] == 127.0
        arr = np.frombuffer(bytes(b["data"]), dtype=np.uint8)
        assert arr[0] == 127 and set(arr[1:]) == {i + 1}


def test_rs_slice_indexes_named_dimension(spark):
    import numpy as np
    from sedona_db_spark.functions.raster import (RASTER_TYPE,
                                                  make_raster_row)
    from pyspark.sql import functions as F
    import pyspark.sql.types as T
    data = np.arange(24, dtype=np.float64).reshape(2, 3, 4)  # (t, y, x)
    row = make_raster_row(4, 3, bands=[("v", "float64", data[0])])
    row["bands"][0]["dim_names"] = ["t", "y", "x"]
    row["bands"][0]["source_shape"] = [2, 3, 4]
    row["bands"][0]["data"] = data.tobytes()
    df = spark.createDataFrame([(row,)], T.StructType(
        [T.StructField("r", RASTER_TYPE)]))
    df.createOrReplaceTempView("__rs_slice_t")
    out = spark.sql(
        "SELECT RS_Slice(r, 't', 1) AS s FROM __rs_slice_t").collect()[0]["s"]
    b = out["bands"][0]
    assert list(b["dim_names"]) == ["y", "x"]
    got = np.frombuffer(bytes(b["data"]), dtype=np.float64).reshape(3, 4)
    assert np.array_equal(got, data[1])
    # spatial dims refuse to slice
    with pytest.raises(Exception):
        spark.sql("SELECT RS_Slice(r, 'x', 0) AS s FROM __rs_slice_t") \
            .collect()


def test_rs_zonalstats_single_statistic(spark):
    import numpy as np
    from sedona_db_spark.functions.raster import (RASTER_TYPE,
                                                  make_raster_row)
    import pyspark.sql.types as T
    arr = np.arange(100, dtype=np.float64).reshape(10, 10)
    row = make_raster_row(10, 10, ulx=0.0, uly=10.0, scale_x=1.0,
                          scale_y=-1.0, bands=[("v", "float64", arr)])
    df = spark.createDataFrame([(row,)], T.StructType(
        [T.StructField("r", RASTER_TYPE)]))
    df.createOrReplaceTempView("__rs_zs_t")
    got = spark.sql("""
      SELECT RS_ZonalStats(r, ST_AsBinary(
               ST_MakeEnvelope(0.0, 0.0, 10.0, 10.0)), 1L, 'mean') AS m,
             RS_ZonalStats(r, ST_AsBinary(
               ST_MakeEnvelope(0.0, 0.0, 10.0, 10.0)), 1L, 'count') AS c,
             RS_ZonalStats(r, ST_AsBinary(
               ST_MakeEnvelope(0.0, 0.0, 10.0, 10.0)), 1L, 'variance') AS v
      FROM __rs_zs_t""").collect()[0]
    assert got["m"] == pytest.approx(49.5)
    assert got["c"] == 100.0
    assert got["v"] == pytest.approx(float(np.var(arr)))
    # struct path agrees
    all_row = spark.sql("""
      SELECT RS_ZonalStatsAll(r, ST_AsBinary(
               ST_MakeEnvelope(0.0, 0.0, 10.0, 10.0)), 1L) AS s
      FROM __rs_zs_t""").collect()[0]["s"]
    assert all_row["mean"] == pytest.approx(49.5)


def test_rs_frompath_and_fromgdalraster(spark, tmp_path):
    import numpy as np
    from sedona_db_spark.functions.raster import (RASTER_TYPE,
                                                  make_raster_row)
    from sedona_db_spark.sources.geotiff import encode_geotiff
    import pyspark.sql.types as T
    arr = (np.arange(48) % 251).astype(np.uint8).reshape(6, 8)
    row = make_raster_row(8, 6, ulx=100.0, uly=50.0, scale_x=0.5,
                          scale_y=-0.5, bands=[("b1", "uint8", arr)])
    tif = encode_geotiff(row)
    p = tmp_path / "t.tif"
    p.write_bytes(tif)
    got = spark.sql(
        f"SELECT RS_FromPath('{p}') AS r").collect()[0]["r"]
    assert list(got["spatial_shape"]) == [6, 8]
    assert np.array_equal(
        np.frombuffer(bytes(got["bands"][0]["data"]), dtype=np.uint8),
        arr.ravel())
    # RS_FromGDALRaster: TIFF bytes keep georeferencing; PNG bytes get
    # the identity-transform ungeoreferenced convention
    from sedona_db_spark.operators.multimodal import encode_png
    png = encode_png(np.dstack([arr, arr, arr]))
    df = spark.createDataFrame([(bytearray(tif), bytearray(png))],
                               "t binary, p binary")
    df.createOrReplaceTempView("__rs_gdal_t")
    out = spark.sql("""
      SELECT RS_FromGDALRaster(t) AS rt, RS_FromGDALRaster(p) AS rp
      FROM __rs_gdal_t""").collect()[0]
    assert [round(v, 2) for v in out["rt"]["transform"]][:2] == [100.0, 0.5]
    assert list(out["rp"]["spatial_shape"]) == [6, 8]
    assert len(out["rp"]["bands"]) == 3
