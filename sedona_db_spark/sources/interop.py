"""In-memory interop + text IO — SURVEY §2.8.

Reference surface: `create_data_frame` from pandas / GeoPandas / pyarrow /
`__geo_interface__` (/root/reference/python/sedonadb/python/sedonadb/
context.py:147-177), `to_pandas` returning a GeoDataFrame when a geometry
column exists (dataframe.py:1478), CSV/JSON read/write with geometry as
WKT/WKB-hex (read.py:271,315; dataframe.py:1628,1662), and the pyogrio
bridge (context.py:313).

GeoPandas/pyogrio are import-gated (absent in this container); everything
else is dependency-free.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sedona_db_spark.geom import core, wkt as wktmod


# ----------------------------------------------------------------------
# inbound
# ----------------------------------------------------------------------

def _geojson_geom_to_wkb(gj: dict) -> bytes:
    """__geo_interface__ mapping -> WKB via WKT construction."""
    import json

    def coords_to_wkt(typ, coords):
        t = typ.upper()
        def ring(c):
            return "(" + ", ".join(f"{p[0]} {p[1]}" for p in c) + ")"
        if t == "POINT":
            return f"POINT ({coords[0]} {coords[1]})"
        if t == "LINESTRING":
            return "LINESTRING " + ring(coords)
        if t == "POLYGON":
            return "POLYGON (" + ", ".join(ring(r) for r in coords) + ")"
        if t == "MULTIPOINT":
            return "MULTIPOINT (" + ", ".join(f"({p[0]} {p[1]})" for p in coords) + ")"
        if t == "MULTILINESTRING":
            return "MULTILINESTRING (" + ", ".join(ring(l) for l in coords) + ")"
        if t == "MULTIPOLYGON":
            return "MULTIPOLYGON (" + ", ".join(
                "(" + ", ".join(ring(r) for r in poly) + ")" for poly in coords) + ")"
        raise ValueError(f"unsupported __geo_interface__ type {typ}")

    if gj["type"] == "GeometryCollection":
        parts = [coords_to_wkt(g["type"], g["coordinates"])
                 for g in gj["geometries"]]
        wkt = "GEOMETRYCOLLECTION (" + ", ".join(parts) + ")"
    else:
        wkt = coords_to_wkt(gj["type"], gj["coordinates"])
    return core.to_wkb(wktmod.from_wkt(wkt))


def create_data_frame(spark: SparkSession, obj: Any,
                      geometry: str | None = None) -> DataFrame:
    """pandas / pyarrow / GeoDataFrame / __geo_interface__ -> DataFrame
    with geometry as WKB BinaryType (reference create_data_frame)."""
    # GeoDataFrame (gated): geometry column -> WKB
    try:
        import geopandas  # noqa: F401
        if isinstance(obj, geopandas.GeoDataFrame):
            pdf = pd.DataFrame(obj.drop(columns=obj.geometry.name))
            pdf[obj.geometry.name] = obj.geometry.to_wkb()
            return spark.createDataFrame(pdf)
    except ImportError:
        pass
    # __geo_interface__ feature collection
    if hasattr(obj, "__geo_interface__") or (
            isinstance(obj, dict) and obj.get("type") == "FeatureCollection"):
        gi = obj.__geo_interface__ if hasattr(obj, "__geo_interface__") else obj
        rows = []
        for feat in gi["features"]:
            row = dict(feat.get("properties") or {})
            row[geometry or "geometry"] = _geojson_geom_to_wkb(feat["geometry"])
            rows.append(row)
        return spark.createDataFrame(pd.DataFrame(rows))
    # pyarrow table
    try:
        import pyarrow as pa
        if isinstance(obj, pa.Table):
            return spark.createDataFrame(obj.to_pandas())
    except ImportError:
        pass
    if isinstance(obj, pd.DataFrame):
        return spark.createDataFrame(obj)
    return spark.createDataFrame(obj)


def read_pyogrio(spark: SparkSession, path: str, **kwargs) -> DataFrame:
    """GDAL vector formats (Shapefile/GPKG/FlatGeobuf/GeoJSON...) via
    pyogrio's Arrow reader — driver-side read, executor-distributed after
    (reference read_pyogrio; for many-file layouts call once per file)."""
    try:
        import pyogrio
    except ImportError as exc:
        raise NotImplementedError(
            "read_pyogrio requires the pyogrio package (GDAL); not in this "
            "container — GeoParquet/CSV/JSON/LAS/Zarr readers are native") from exc
    meta, table = pyogrio.raw.read_arrow(path, **kwargs)
    df = spark.createDataFrame(table.to_pandas())
    geom = meta.get("geometry_name") or "wkb_geometry"
    return df.withColumnRenamed(geom, "geometry")


# ----------------------------------------------------------------------
# outbound
# ----------------------------------------------------------------------

def to_pandas(df: DataFrame, geometry: str | None = None):
    """toPandas(); when GeoPandas is present and a geometry column exists,
    return a GeoDataFrame (reference dataframe.py:1478)."""
    pdf = df.toPandas()
    gcol = geometry or ("geometry" if "geometry" in pdf.columns else
                        "geom" if "geom" in pdf.columns else None)
    if gcol is None:
        return pdf
    try:
        import geopandas
        from geopandas.array import from_wkb
        return geopandas.GeoDataFrame(
            pdf, geometry=from_wkb(pdf[gcol]))
    except ImportError:
        return pdf


# ----------------------------------------------------------------------
# CSV / JSON with geometry serialization (reference to_csv/to_json:
# geometry travels as WKT text)
# ----------------------------------------------------------------------

def _wkt_encode_geoms(df: DataFrame, geom_cols: list[str]) -> DataFrame:
    for c in geom_cols:
        df = df.withColumn(c, F.expr(f"ST_AsText({c})"))
    return df


def write_csv(df: DataFrame, path: str, geom_cols: list[str] = (),
              **options) -> None:
    _wkt_encode_geoms(df, list(geom_cols)).write \
        .options(header=True, **options).mode("overwrite").csv(path)


def read_csv(spark: SparkSession, path: str, geom_cols: list[str] = (),
             **options) -> DataFrame:
    df = spark.read.options(header=True, inferSchema=True, **options).csv(path)
    for c in geom_cols:
        df = df.withColumn(c, F.expr(f"ST_GeomFromWKT({c})"))
    return df


def write_json(df: DataFrame, path: str, geom_cols: list[str] = (),
               **options) -> None:
    _wkt_encode_geoms(df, list(geom_cols)).write \
        .options(**options).mode("overwrite").json(path)


def read_json(spark: SparkSession, path: str, geom_cols: list[str] = (),
              **options) -> DataFrame:
    df = spark.read.options(**options).json(path)
    for c in geom_cols:
        df = df.withColumn(c, F.expr(f"ST_GeomFromWKT({c})"))
    return df
