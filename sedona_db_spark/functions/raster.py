"""Raster subsystem: RS_* functions over a nested struct column.

Schema mirrors the reference's fixed Arrow raster struct
(/root/reference/rust/sedona-schema/src/raster.rs:40-128): `{crs, transform
(6-element GDAL GeoTransform), spatial_dims, spatial_shape, bands:
[{name, dim_names, source_shape, datatype, nodata, view, outdb_uri,
outdb_format, data}]}`.  Bands may be out-of-DB (`outdb_uri` set, `data`
null) and are fetched lazily by `ensure_loaded` — the Spark analogue of the
async loader registry (/root/reference/rust/sedona/src/context.rs:283-316).

Scale design — two tiers, like the reference's pure-Rust vs GDAL split
(/root/reference/rust/sedona-raster-functions/src/register.rs:39-92 vs
rust/sedona-raster-gdal/src/lib.rs:21-35):

1. Metadata/geotransform accessors are PURE NATIVE column expressions over
   the struct (whole-stage codegen, zero Python) — at 100 TB these run
   entirely JVM-side with column pruning reading only the small metadata
   fields, never the band payload.
2. Pixel ops (value lookup, rasterize, zonal stats, clip, tile) are
   Arrow-batched pandas UDFs decoding the binary band payload with numpy.

GDAL/rasterio is not needed for GeoTIFF IO: `as_geotiff` / `from_geotiff` /
`from_path` / `RS_FromGDALRaster` run on the repo's native codecs
(DEFLATE/LZW/PackBits/JPEG baseline+progressive/CCITT G3-G4, libtiff- and
libjpeg-cross-validated both directions, sources/geotiff.py).  Out-of-DB
band loading fetches http(s)/s3 executor-side; the `fake://` scheme is a
deterministic loader kept for tests only.

GeoTransform convention (GDAL): t = [ulx, scale_x, skew_x, uly, skew_y,
scale_y]; world_x = t0 + px*t1 + py*t2, world_y = t3 + px*t4 + py*t5.
"""

from __future__ import annotations

import math
import struct as _struct

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sedona_db_spark.functions import get_udf

# ----------------------------------------------------------------------
# schema (reference raster.rs:40-128)
# ----------------------------------------------------------------------

BAND_VIEW_TYPE = T.StructType([
    T.StructField("source_axis", T.LongType()),
    T.StructField("start", T.LongType()),
    T.StructField("step", T.LongType()),
    T.StructField("steps", T.LongType()),
])

BAND_TYPE = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("dim_names", T.ArrayType(T.StringType())),
    T.StructField("source_shape", T.ArrayType(T.LongType())),
    T.StructField("datatype", T.StringType()),
    T.StructField("nodata", T.DoubleType()),
    T.StructField("view", BAND_VIEW_TYPE),
    T.StructField("outdb_uri", T.StringType()),
    T.StructField("outdb_format", T.StringType()),
    T.StructField("data", T.BinaryType()),
])

RASTER_TYPE = T.StructType([
    T.StructField("crs", T.StringType()),
    T.StructField("transform", T.ArrayType(T.DoubleType())),
    T.StructField("spatial_dims", T.ArrayType(T.StringType())),
    T.StructField("spatial_shape", T.ArrayType(T.LongType())),
    T.StructField("bands", T.ArrayType(BAND_TYPE)),
])

_NP_DTYPES = {
    "uint8": np.uint8, "int8": np.int8, "uint16": np.uint16,
    "int16": np.int16, "uint32": np.uint32, "int32": np.int32,
    "int64": np.int64, "float32": np.float32, "float64": np.float64,
}


# ----------------------------------------------------------------------
# python-side constructors (test/demo; the reference's sedona-testing
# raster_spec.rs plays the same role)
# ----------------------------------------------------------------------

def make_raster_row(width, height, ulx=0.0, uly=0.0, scale_x=1.0,
                    scale_y=-1.0, crs="EPSG:4326", bands=None,
                    skew_x=0.0, skew_y=0.0):
    """Row dict matching RASTER_TYPE. `bands` = [(name, dtype, np_array)]."""
    out_bands = []
    for name, dtype, arr in (bands or []):
        a = np.ascontiguousarray(np.asarray(arr, dtype=_NP_DTYPES[dtype]))
        out_bands.append({
            "name": name, "dim_names": ["y", "x"],
            "source_shape": [height, width], "datatype": dtype,
            "nodata": None, "view": None,
            "outdb_uri": None, "outdb_format": None,
            "data": a.tobytes(),
        })
    return {
        "crs": crs,
        "transform": [float(ulx), float(scale_x), float(skew_x),
                      float(uly), float(skew_y), float(scale_y)],
        "spatial_dims": ["y", "x"],
        "spatial_shape": [int(height), int(width)],
        "bands": out_bands,
    }


def example_raster_row():
    """RS_Example equivalent: 4x3 gradient raster (rs_example.rs parity)."""
    arr = np.arange(12, dtype=np.float64).reshape(3, 4)
    return make_raster_row(4, 3, ulx=10.0, uly=20.0, bands=[("b1", "float64", arr)])


# ----------------------------------------------------------------------
# tier 1 — native metadata / geotransform accessors (no Python at runtime)
# ----------------------------------------------------------------------

def num_bands(r: Column) -> Column:
    return F.size(r["bands"])


def band_field(r: Column, band: Column | int, field: str) -> Column:
    b = F.lit(band) if isinstance(band, int) else band
    return F.element_at(r["bands"], b)[field]  # 1-based like the reference


def band_pixel_type(r, band):
    return band_field(r, band, "datatype")


def band_nodata(r, band):
    return band_field(r, band, "nodata")


def band_path(r, band):
    return band_field(r, band, "outdb_uri")


def width(r: Column) -> Column:
    return F.element_at(r["spatial_shape"],
                        F.array_position(r["spatial_dims"], "x").cast("int"))


def height(r: Column) -> Column:
    return F.element_at(r["spatial_shape"],
                        F.array_position(r["spatial_dims"], "y").cast("int"))


def upper_left_x(r):
    return r["transform"][0]


def scale_x(r):
    return r["transform"][1]


def skew_x(r):
    return r["transform"][2]


def upper_left_y(r):
    return r["transform"][3]


def skew_y(r):
    return r["transform"][4]


def scale_y(r):
    return r["transform"][5]


def rotation(r):
    return F.atan2(skew_y(r), scale_x(r))


def georeference(r) -> Column:
    """GDAL-order 6-line string (rs_geotransform.rs RS_GeoReference)."""
    return F.concat_ws("\n", scale_x(r), skew_y(r), skew_x(r), scale_y(r),
                       upper_left_x(r), upper_left_y(r))


def set_georeference(r, ulx, sx, kx, uly, ky, sy) -> Column:
    return r.withField("transform", F.array(
        *[c.cast("double") if isinstance(c, Column) else F.lit(float(c))
          for c in (ulx, sx, kx, uly, ky, sy)]))


def srid(r) -> Column:
    return F.when(r["crs"].startswith("EPSG:"),
                  F.split(r["crs"], ":")[1].cast("int")).otherwise(F.lit(0))


def crs(r) -> Column:
    return r["crs"]


def set_srid(r, s) -> Column:
    s = F.lit(s) if not isinstance(s, Column) else s
    return r.withField("crs", F.concat(F.lit("EPSG:"), s.cast("string")))


def set_crs(r, c) -> Column:
    c = F.lit(c) if not isinstance(c, Column) else c
    return r.withField("crs", c)


def set_band_nodata(r, band_idx: int, val) -> Column:
    v = F.lit(val) if not isinstance(val, Column) else val
    return r.withField("bands", F.transform(
        r["bands"],
        lambda b, i: F.when(i == F.lit(band_idx - 1),
                            b.withField("nodata", v.cast("double"))).otherwise(b)))


def num_dimensions(r) -> Column:
    return F.size(r["spatial_shape"])


def dim_names(r) -> Column:
    return r["spatial_dims"]


def dim_size(r, name) -> Column:
    n = F.lit(name) if not isinstance(name, Column) else name
    return F.element_at(r["spatial_shape"],
                        F.array_position(r["spatial_dims"], n).cast("int"))


def shape(r) -> Column:
    return r["spatial_shape"]


def is_empty(r) -> Column:
    return (F.size(r["spatial_shape"]) == 0) | \
        F.exists(r["spatial_shape"], lambda s: s == 0)


def raster_to_world_x(r, px, py) -> Column:
    px, py = _numc(px), _numc(py)
    return upper_left_x(r) + px * scale_x(r) + py * skew_x(r)


def raster_to_world_y(r, px, py) -> Column:
    px, py = _numc(px), _numc(py)
    return upper_left_y(r) + px * skew_y(r) + py * scale_y(r)


def world_to_raster_x(r, wx, wy) -> Column:
    """Inverse affine, floor to pixel (rs_world_to_raster coords)."""
    wx, wy = _numc(wx), _numc(wy)
    det = scale_x(r) * scale_y(r) - skew_x(r) * skew_y(r)
    dx, dy = wx - upper_left_x(r), wy - upper_left_y(r)
    return F.floor((dx * scale_y(r) - dy * skew_x(r)) / det).cast("long")


def world_to_raster_y(r, wx, wy) -> Column:
    wx, wy = _numc(wx), _numc(wy)
    det = scale_x(r) * scale_y(r) - skew_x(r) * skew_y(r)
    dx, dy = wx - upper_left_x(r), wy - upper_left_y(r)
    return F.floor((dy * scale_x(r) - dx * skew_y(r)) / det).cast("long")


def _numc(v):
    return F.lit(float(v)) if not isinstance(v, Column) else v.cast("double")


def _corner_wkt(r) -> Column:
    """POLYGON WKT of the raster footprint (4 affine-transformed corners)."""
    w, h = width(r).cast("double"), height(r).cast("double")
    zero = F.lit(0.0)
    pts = []
    for px, py in ((zero, zero), (w, zero), (w, h), (zero, h), (zero, zero)):
        pts.append(F.concat_ws(" ", raster_to_world_x(r, px, py),
                               raster_to_world_y(r, px, py)))
    return F.concat(F.lit("POLYGON (("), F.concat_ws(", ", *pts), F.lit("))"))


def envelope(r) -> Column:
    """Footprint polygon as WKB geometry (RS_Envelope)."""
    return get_udf("ST_GeomFromWKT")(_corner_wkt(r))


def convex_hull(r) -> Column:
    return get_udf("ST_ConvexHull")(envelope(r))


def pixel_as_point(r, px, py) -> Column:
    return get_udf("ST_Point")(raster_to_world_x(r, px, py),
                               raster_to_world_y(r, px, py))


def pixel_as_centroid(r, px, py) -> Column:
    px, py = _numc(px), _numc(py)
    return get_udf("ST_Point")(raster_to_world_x(r, px + 0.5, py + 0.5),
                               raster_to_world_y(r, px + 0.5, py + 0.5))


def pixel_as_polygon(r, px, py) -> Column:
    px, py = _numc(px), _numc(py)
    pts = []
    for dx, dy in ((0, 0), (1, 0), (1, 1), (0, 1), (0, 0)):
        pts.append(F.concat_ws(" ", raster_to_world_x(r, px + dx, py + dy),
                               raster_to_world_y(r, px + dx, py + dy)))
    wkt = F.concat(F.lit("POLYGON (("), F.concat_ws(", ", *pts), F.lit("))"))
    return get_udf("ST_GeomFromWKT")(wkt)


# raster-vs-geometry predicates over the FOOTPRINT polygon (the affine
# image of the raster's four corners — skew-correct, matching the
# reference's join semantics, sedona-spatial-join-raster/src/lib.rs:20-33).
# Join-eligible: compose with operators.spatial_join by materializing
# envelope() first.  Same-CRS comparison as in the reference's same-CRS
# path; cross-CRS inputs should be aligned first (ST_Transform /
# RS_ReprojectMatch) — the reference's densified reprojection covers that
# case, antimeridian/geodesic edges are unmodeled in both engines.
def envelope_in(r, crs) -> Column:
    """Raster footprint reprojected into ``crs`` (WKB): corner ring
    densified (20 vertices per edge) in pixel space, affine-transformed
    to world, then routed through the projection registry when the
    raster's CRS differs — the reference's densified-reprojection path
    for cross-CRS raster predicates (rs_spatial_predicates.rs:203-205).
    Same-CRS rows skip the transform and stay exact."""
    crs = F.lit(crs) if not isinstance(crs, Column) else crs
    return _rs_footprint_in_udf(r, crs)


def intersects(r, geom, geom_crs=None) -> Column:
    """RS_Intersects.  With ``geom_crs`` set, the footprint is densified
    and reprojected into the geometry's CRS first (cross-CRS path)."""
    fp = envelope(r) if geom_crs is None else envelope_in(r, geom_crs)
    return get_udf("ST_Intersects")(fp, geom)


def contains(r, geom, geom_crs=None) -> Column:
    fp = envelope(r) if geom_crs is None else envelope_in(r, geom_crs)
    return get_udf("ST_Contains")(fp, geom)


def within(r, geom, geom_crs=None) -> Column:
    fp = envelope(r) if geom_crs is None else envelope_in(r, geom_crs)
    return get_udf("ST_Within")(fp, geom)


def slice_bands(r, start: int, stop: int) -> Column:
    """RS_SliceRange: 1-based inclusive band slice."""
    return r.withField("bands", F.slice(r["bands"], start, stop - start + 1))


# ----------------------------------------------------------------------
# tier 2 — pixel-payload kernels (Arrow-batched pandas UDFs)
# ----------------------------------------------------------------------

def _iter_struct(rs):
    """Yield per-row struct values: pandas UDFs receive StructType args as a
    pd.DataFrame (one column per field), plain object Series otherwise."""
    if isinstance(rs, pd.DataFrame):
        for _, row in rs.iterrows():
            yield None if row.isna().all() else row
    else:
        for r in rs:
            yield r


def _struct_out(rows) -> pd.DataFrame:
    """StructType-returning pandas UDFs must emit a pd.DataFrame."""
    nulls = {f.name: None for f in RASTER_TYPE.fields}
    return pd.DataFrame([nulls if r is None else r for r in rows])


def _band_array(band_row) -> np.ndarray | None:
    if band_row is None:
        return None
    data = band_row["data"]
    if data is None:
        return None
    dt = _NP_DTYPES.get(band_row["datatype"])
    if dt is None:
        return None
    arr = np.frombuffer(bytes(data), dtype=dt)
    shp = band_row["source_shape"]
    if shp is not None and len(shp) and int(np.prod(shp)) == arr.size:
        arr = arr.reshape([int(s) for s in shp])
    return arr


def _raster_fields(row):
    t = [float(v) for v in row["transform"]]
    dims = list(row["spatial_dims"])
    shp = [int(v) for v in row["spatial_shape"]]
    h = shp[dims.index("y")]
    w = shp[dims.index("x")]
    return t, w, h


@F.pandas_udf(T.DoubleType())
def _rs_value_udf(rs: pd.Series, band: pd.Series, px: pd.Series,
                  py: pd.Series) -> pd.Series:
    out = []
    for r, b, x, y in zip(_iter_struct(rs), band, px, py):
        if r is None or b is None or x is None or y is None:
            out.append(None)
            continue
        bands = r["bands"]
        bi = int(b) - 1
        if bi < 0 or bi >= len(bands):
            out.append(None)
            continue
        arr = _band_array(bands[bi])
        if arr is None:
            out.append(None)
            continue
        _, w, h = _raster_fields(r)
        x, y = int(x), int(y)
        if not (0 <= x < w and 0 <= y < h):
            out.append(None)
            continue
        flat = arr.reshape(h, w)
        v = float(flat[y, x])
        nod = bands[bi]["nodata"]
        out.append(None if nod is not None and v == float(nod) else v)
    return pd.Series(out, dtype=object)


def value(r, band, px, py) -> Column:
    band = F.lit(band) if not isinstance(band, Column) else band
    px = F.lit(px) if not isinstance(px, Column) else px
    py = F.lit(py) if not isinstance(py, Column) else py
    return _rs_value_udf(r, band.cast("long"), px.cast("long"), py.cast("long"))


_STATS_SCHEMA = T.StructType([
    T.StructField("count", T.LongType()),
    T.StructField("sum", T.DoubleType()),
    T.StructField("mean", T.DoubleType()),
    T.StructField("min", T.DoubleType()),
    T.StructField("max", T.DoubleType()),
    T.StructField("stddev", T.DoubleType()),
])


def _zonal_stats_batch(rs: pd.Series, geom: pd.Series,
                       band: pd.Series) -> pd.DataFrame:
    """Zonal stats: mask = pixel centers inside geometry (numpy batch
    point-in-polygon) — the join-based pattern from SURVEY §2.6."""
    from sedona_db_spark.geom import algorithms as alg, core
    rows = []
    for r, gwkb, b in zip(_iter_struct(rs), geom, band):
        if r is None or gwkb is None or b is None:
            rows.append((None,) * 6)
            continue
        bands = r["bands"]
        bi = int(b) - 1
        arr = _band_array(bands[bi]) if 0 <= bi < len(bands) else None
        if arr is None:
            rows.append((None,) * 6)
            continue
        t, w, h = _raster_fields(r)
        flat = arr.reshape(h, w).astype(np.float64)
        g = core.from_wkb(bytes(gwkb))
        px, py = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
        wx = t[0] + px * t[1] + py * t[2]
        wy = t[3] + px * t[4] + py * t[5]
        pts = np.column_stack([wx.ravel(), wy.ravel()])
        mask = alg.points_position_batch(pts, g) >= 0
        nod = bands[bi]["nodata"]
        vals = flat.ravel()[mask]
        if nod is not None:
            vals = vals[vals != float(nod)]
        if len(vals) == 0:
            rows.append((0, None, None, None, None, None))
        else:
            rows.append((int(len(vals)), float(vals.sum()), float(vals.mean()),
                         float(vals.min()), float(vals.max()),
                         float(vals.std(ddof=0))))
    return pd.DataFrame(rows, columns=["count", "sum", "mean", "min", "max",
                                       "stddev"])


@F.pandas_udf(_STATS_SCHEMA)
def _rs_zonal_udf(rs: pd.Series, geom: pd.Series, band: pd.Series) -> pd.DataFrame:
    return _zonal_stats_batch(rs, geom, band)


def zonal_stats(r, geom, band=1) -> Column:
    band = F.lit(band) if not isinstance(band, Column) else band
    return _rs_zonal_udf(r, geom, band.cast("long"))


@F.pandas_udf(RASTER_TYPE)
def _rs_asraster_udf(geom: pd.Series, w: pd.Series, h: pd.Series,
                     val: pd.Series) -> pd.DataFrame:
    """Rasterize: burn `val` into pixels whose center is inside the
    geometry, over the geometry's own bbox grid (RS_AsRaster)."""
    from sedona_db_spark.geom import algorithms as alg, core
    rows = []
    for gwkb, ww, hh, v in zip(geom, w, h, val):
        if gwkb is None or ww is None or hh is None:
            rows.append(None)
            continue
        g = core.from_wkb(bytes(gwkb))
        x0, y0, x1, y1 = alg.bounds(g)
        ww, hh = int(ww), int(hh)
        sx = (x1 - x0) / ww if x1 > x0 else 1.0
        sy = -((y1 - y0) / hh) if y1 > y0 else -1.0
        px, py = np.meshgrid(np.arange(ww) + 0.5, np.arange(hh) + 0.5)
        wx = x0 + px * sx
        wy = y1 + py * sy
        pts = np.column_stack([wx.ravel(), wy.ravel()])
        mask = alg.points_position_batch(pts, g) >= 0
        burn = np.where(mask, float(v if v is not None else 1.0),
                        0.0).astype(np.float64)
        rows.append(make_raster_row(
            ww, hh, ulx=x0, uly=y1, scale_x=sx, scale_y=sy,
            bands=[("band_1", "float64", burn.reshape(hh, ww))]))
    return _struct_out(rows)


def as_raster(geom, w, h, val=1.0) -> Column:
    w = F.lit(w) if not isinstance(w, Column) else w
    h = F.lit(h) if not isinstance(h, Column) else h
    val = F.lit(float(val)) if not isinstance(val, Column) else val
    return _rs_asraster_udf(geom, w.cast("long"), h.cast("long"),
                            val.cast("double"))


@F.pandas_udf(RASTER_TYPE)
def _rs_clip_udf(rs: pd.Series, geom: pd.Series) -> pd.DataFrame:
    """Crop to geometry bbox; pixels outside the geometry -> nodata NaN."""
    from sedona_db_spark.geom import algorithms as alg, core
    out = []
    for r, gwkb in zip(_iter_struct(rs), geom):
        if r is None or gwkb is None:
            out.append(None)
            continue
        g = core.from_wkb(bytes(gwkb))
        t, w, h = _raster_fields(r)
        gx0, gy0, gx1, gy1 = alg.bounds(g)
        # bbox -> pixel range (axis-aligned transform assumption for crop)
        xs = sorted(((gx0 - t[0]) / t[1], (gx1 - t[0]) / t[1]))
        ys = sorted(((gy0 - t[3]) / t[5], (gy1 - t[3]) / t[5]))
        px0, px1 = max(0, int(math.floor(xs[0]))), min(w, int(math.ceil(xs[1])))
        py0, py1 = max(0, int(math.floor(ys[0]))), min(h, int(math.ceil(ys[1])))
        if px0 >= px1 or py0 >= py1:
            out.append(None)
            continue
        nw, nh = px1 - px0, py1 - py0
        nulx = t[0] + px0 * t[1]
        nuly = t[3] + py0 * t[5]
        px, py = np.meshgrid(np.arange(nw) + 0.5 + px0, np.arange(nh) + 0.5 + py0)
        wx = t[0] + px * t[1] + py * t[2]
        wy = t[3] + px * t[4] + py * t[5]
        inside = alg.points_position_batch(
            np.column_stack([wx.ravel(), wy.ravel()]), g) >= 0
        new_bands = []
        for b in r["bands"]:
            arr = _band_array(b)
            if arr is None:
                continue
            sub = arr.reshape(h, w)[py0:py1, px0:px1].astype(np.float64)
            subf = sub.ravel()
            subf[~inside] = np.nan
            new_bands.append((b["name"], "float64", subf.reshape(nh, nw)))
        out.append(make_raster_row(nw, nh, ulx=nulx, uly=nuly, scale_x=t[1],
                                   scale_y=t[5], crs=r["crs"],
                                   bands=new_bands))
    return _struct_out(out)


def clip(r, geom) -> Column:
    return _rs_clip_udf(r, geom)


@F.pandas_udf(T.ArrayType(RASTER_TYPE))
def _rs_tile_udf(rs: pd.Series, tw: pd.Series, th: pd.Series) -> pd.Series:
    """Split into tiles — pair with F.explode for distributed downstream
    processing (RS_Tile; at scale one big scene fans out to many rows)."""
    out = []
    for r, w_, h_ in zip(_iter_struct(rs), tw, th):
        if r is None or w_ is None or h_ is None:
            out.append(None)
            continue
        t, w, h = _raster_fields(r)
        tiles = []
        for py0 in range(0, h, int(h_)):
            for px0 in range(0, w, int(w_)):
                nw = min(int(w_), w - px0)
                nh = min(int(h_), h - py0)
                bands = []
                for b in r["bands"]:
                    arr = _band_array(b)
                    if arr is None:
                        continue
                    bands.append((b["name"], b["datatype"],
                                  arr.reshape(h, w)[py0:py0 + nh,
                                                    px0:px0 + nw]))
                tiles.append(make_raster_row(
                    nw, nh,
                    ulx=t[0] + px0 * t[1] + py0 * t[2],
                    uly=t[3] + px0 * t[4] + py0 * t[5],
                    scale_x=t[1], scale_y=t[5], skew_x=t[2], skew_y=t[4],
                    crs=r["crs"], bands=bands))
        out.append(tiles)
    return pd.Series(out)


def tile(r, tile_w: int, tile_h: int) -> Column:
    return _rs_tile_udf(r, F.lit(tile_w).cast("long"),
                        F.lit(tile_h).cast("long"))


# ----------------------------------------------------------------------
# out-of-DB loading (RS_EnsureLoaded) + format stubs
# ----------------------------------------------------------------------

def _fake_loader(uri: str, fmt: str, shape) -> np.ndarray:
    """Deterministic fake for `fake://` URIs (tests / containers without
    rasterio): seeded by the URI so results are stable cluster-wide."""
    seed = abs(hash(uri)) % (2 ** 31)
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=[int(s) for s in shape]).astype(np.float64)


# per-executor fetch cache: one multi-band file typically backs several
# out-of-DB bands of the same row/partition — fetch it once.  True LRU
# (hits move to the back, eviction pops the front) under BOTH an entry
# cap and a total-byte budget — the former first-key eviction was
# insertion-ordered, and 32 x 64 MB could pin 2 GB per executor.
from collections import OrderedDict as _OrderedDict

_HTTP_CACHE: "_OrderedDict[str, bytes]" = _OrderedDict()
_HTTP_CACHE_MAX = 32
_HTTP_CACHE_ENTRY_MAX = 64 * 1024 * 1024     # never cache payloads above
_HTTP_CACHE_BYTES_MAX = 256 * 1024 * 1024    # total budget per executor
_HTTP_CACHE_BYTES = 0


def _cache_put(key: str, data: bytes) -> None:
    global _HTTP_CACHE_BYTES
    if len(data) > _HTTP_CACHE_ENTRY_MAX:
        return
    old = _HTTP_CACHE.pop(key, None)
    if old is not None:
        _HTTP_CACHE_BYTES -= len(old)
    _HTTP_CACHE[key] = data
    _HTTP_CACHE_BYTES += len(data)
    while _HTTP_CACHE and (len(_HTTP_CACHE) > _HTTP_CACHE_MAX
                           or _HTTP_CACHE_BYTES > _HTTP_CACHE_BYTES_MAX):
        _, evicted = _HTTP_CACHE.popitem(last=False)
        _HTTP_CACHE_BYTES -= len(evicted)


# object-store loader hooks: map scheme://bucket/key onto an http(s)
# endpoint (path-style convention) + static headers, so the existing
# executor-side http fetcher serves object stores too — the role of the
# reference's pluggable loader registry
# (rust/sedona/src/context.rs:283-316).  Configure per-process with
# register_s3_endpoint()/register_gs_endpoint()/
# register_object_store_endpoint(), or the SPARK_GRAFT_{SCHEME}_ENDPOINT /
# SPARK_GRAFT_{SCHEME}_HEADERS (JSON) environment variables, which
# executors inherit from the session environment.  gs:// additionally
# falls back to the public GCS XML endpoint
# (https://storage.googleapis.com/<bucket>/<key>), which serves
# public-read objects with no credentials.
_OBJSTORE_ENDPOINTS: dict[str, dict[str, tuple[str, dict]]] = {}
_OBJSTORE_DEFAULTS = {"gs": "https://storage.googleapis.com"}
# back-compat: the s3 table is the scheme entry itself (callers snapshot it)
_S3_ENDPOINTS: dict[str, tuple[str, dict]] = \
    _OBJSTORE_ENDPOINTS.setdefault("s3", {})


def register_object_store_endpoint(scheme: str, endpoint: str,
                                   bucket: str = "*",
                                   headers: dict | None = None) -> None:
    """Route ``<scheme>://bucket/...`` fetches through ``endpoint`` (an
    http(s) base URL, path-style); bucket "*" is the wildcard fallback."""
    _OBJSTORE_ENDPOINTS.setdefault(scheme.lower(), {})[bucket] = (
        endpoint.rstrip("/"), dict(headers or {}))


def register_s3_endpoint(endpoint: str, bucket: str = "*",
                         headers: dict | None = None) -> None:
    register_object_store_endpoint("s3", endpoint, bucket, headers)


def register_gs_endpoint(endpoint: str, bucket: str = "*",
                         headers: dict | None = None) -> None:
    register_object_store_endpoint("gs", endpoint, bucket, headers)


def _objstore_resolve(uri: str) -> tuple[str, dict]:
    """scheme://bucket/key[#frag] -> (http url with frag, headers)."""
    import json as _json
    import os as _os
    scheme, _, rest = uri.partition("://")
    scheme = scheme.lower()
    bucket, _, key = rest.partition("/")
    table = _OBJSTORE_ENDPOINTS.get(scheme, {})
    ep = table.get(bucket) or table.get("*")
    if ep is None:
        env = _os.environ.get(f"SPARK_GRAFT_{scheme.upper()}_ENDPOINT")
        if env:
            hdrs = _json.loads(_os.environ.get(
                f"SPARK_GRAFT_{scheme.upper()}_HEADERS", "{}"))
            ep = (env.rstrip("/"), hdrs)
    if ep is None and scheme in _OBJSTORE_DEFAULTS:
        ep = (_OBJSTORE_DEFAULTS[scheme], {})
    if ep is None:
        raise NotImplementedError(
            f"{scheme} out-of-DB load for {uri!r}: no endpoint registered — "
            f"call register_object_store_endpoint({scheme!r}, endpoint"
            f"[, bucket, headers]) or set SPARK_GRAFT_{scheme.upper()}"
            "_ENDPOINT (path-style http(s) base URL)")
    base, headers = ep
    return f"{base}/{bucket}/{key}", dict(headers)


def _s3_resolve(uri: str) -> tuple[str, dict]:
    return _objstore_resolve(uri)


def _http_fetch(uri: str, retries: int = 3, timeout: float = 30.0,
                extra_headers: dict | None = None) -> bytes:
    """Executor-side http(s) fetch (stdlib urllib — no extra deps) with
    exponential-backoff retries and optional range requests: a
    `#bytes=a-b` fragment becomes an HTTP Range header so a loader can
    pull one band's strip out of a large remote file (reference: the
    async loader registry, rust/sedona/src/context.rs:283-316)."""
    import time as _time
    import urllib.error
    import urllib.request
    key = uri
    cached = _HTTP_CACHE.get(key)
    if cached is not None:
        _HTTP_CACHE.move_to_end(key)         # LRU hit
        return cached
    url, _, frag = uri.partition("#")
    headers = dict(extra_headers or {})
    if frag.startswith("bytes="):
        headers["Range"] = frag
    last: Exception | None = None
    for attempt in range(retries):
        try:
            req = urllib.request.Request(url, headers=headers)
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                data = resp.read()
            _cache_put(key, data)
            return data
        except urllib.error.HTTPError as exc:
            if exc.code in (404, 410):
                # definitive absence: no retry, and a DISTINCT type so
                # callers with absent-is-ok semantics (zarr fill chunks,
                # optional shapefile .dbf) never conflate it with a
                # timeout/5xx/auth failure (which must stay errors)
                raise FileNotFoundError(f"{uri!r}: HTTP {exc.code}") from exc
            last = exc
            _time.sleep(0.2 * (2 ** attempt))
        except (urllib.error.URLError, OSError, TimeoutError) as exc:
            last = exc
            _time.sleep(0.2 * (2 ** attempt))
    raise IOError(f"out-of-DB fetch failed after {retries} tries: {uri!r}: "
                  f"{last}")


def _load_outdb_band(b, h: int, w: int) -> tuple[str, str, np.ndarray]:
    """Resolve one out-of-DB band to (name, dtype, array)."""
    uri = b["outdb_uri"]
    fmt = (b["outdb_format"] or "").lower()
    shp = b["source_shape"]
    if shp is None or len(shp) == 0:
        shp = [h, w]
    if uri.startswith("fake://"):
        return (b["name"], "float64", _fake_loader(uri, fmt, shp))
    if uri.startswith(("http://", "https://", "s3://", "gs://", "az://")):
        if uri.startswith(("s3://", "gs://", "az://")):
            url, hdrs = _objstore_resolve(uri)
            data = _http_fetch(url, extra_headers=hdrs)
        else:
            data = _http_fetch(uri)
        if fmt in ("", "gtiff", "tiff", "geotiff"):
            from sedona_db_spark.sources.geotiff import decode_geotiff
            row = decode_geotiff(data)
            # band selection: same-name band in the remote file, else the
            # band's positional index, else the first band
            rbands = row["bands"]
            pick = next((rb for rb in rbands if rb["name"] == b["name"]),
                        None)
            if pick is None:
                pick = rbands[0]
            arr = np.frombuffer(pick["data"],
                                dtype=_NP_DTYPES[pick["datatype"]])
            hh, ww = (int(s) for s in pick["source_shape"])
            return (b["name"], pick["datatype"], arr.reshape(hh, ww))
        if fmt in ("raw_f64", "raw"):
            arr = np.frombuffer(data, dtype="<f8")
            return (b["name"], "float64",
                    arr.reshape([int(s) for s in shp]))
        raise NotImplementedError(
            f"out-of-DB format {fmt!r} over http (supported: GeoTIFF, "
            "raw_f64)")
    raise NotImplementedError(
        f"out-of-DB raster load for {uri!r}: supported schemes are "
        "fake:// (deterministic test loader), http(s):// (stdlib fetch "
        "+ native GeoTIFF decode) and s3:// (endpoint-mapped onto the "
        "http fetcher — see register_s3_endpoint); other schemes need "
        "rasterio/GDAL on the cluster")


def _ensure_loaded_batch(rs: pd.Series) -> pd.DataFrame:
    out = []
    for r in _iter_struct(rs):
        if r is None:
            out.append(None)
            continue
        t, w, h = _raster_fields(r)
        bands = []
        changed = False
        for b in r["bands"]:
            if b["data"] is None and b["outdb_uri"]:
                bands.append(_load_outdb_band(b, h, w))
                changed = True
                continue
            arr = _band_array(b)
            if arr is not None:
                bands.append((b["name"], b["datatype"], arr))
        if not changed and len(bands) == len(r["bands"]):
            pass
        out.append(make_raster_row(w, h, ulx=t[0], uly=t[3], scale_x=t[1],
                                   scale_y=t[5], skew_x=t[2], skew_y=t[4],
                                   crs=r["crs"], bands=bands))
    return _struct_out(out)


@F.pandas_udf(RASTER_TYPE)
def _rs_ensure_loaded_udf(rs: pd.Series) -> pd.DataFrame:
    return _ensure_loaded_batch(rs)


def ensure_loaded(r) -> Column:
    """Materialize out-of-DB bands (executor-side fetch + decode).

    Built per call so driver-side ``register_s3_endpoint()`` entries ride
    to the executors in the UDF closure — module state set on the driver
    after the JVM launched would otherwise never reach the python
    workers (env vars are inherited only at JVM start)."""
    snapshot = {sc: dict(tbl) for sc, tbl in _OBJSTORE_ENDPOINTS.items() if tbl}
    if not snapshot:
        return _rs_ensure_loaded_udf(r)

    @F.pandas_udf(RASTER_TYPE)
    def _udf(rs: pd.Series) -> pd.DataFrame:
        # import the module explicitly: cloudpickle captures a nested
        # function's global refs BY VALUE, so mutating the name
        # `_S3_ENDPOINTS` here would populate a detached pickled copy —
        # the module-level functions the loader actually calls resolve
        # the executor module's own dict
        from sedona_db_spark.functions import raster as _r
        for sc, tbl in snapshot.items():
            dst = _r._OBJSTORE_ENDPOINTS.setdefault(sc, {})
            for k, v in tbl.items():
                dst.setdefault(k, v)
        return _ensure_loaded_batch(rs)
    return _udf(r)


@F.pandas_udf(T.BinaryType())
def _rs_footprint_in_udf(rs: pd.Series, to_crs: pd.Series) -> pd.Series:
    """Densified footprint ring, reprojected when raster CRS != target."""
    from sedona_db_spark.geom import algorithms as alg
    from sedona_db_spark.geom import core
    out = []
    N = 20                                   # vertices per edge
    frac = np.arange(N) / float(N)
    for r, dst in zip(_iter_struct(rs), to_crs):
        if r is None or dst is None:
            out.append(None)
            continue
        t, w, h = _raster_fields(r)
        fw, fh = float(w), float(h)
        px = np.concatenate([frac * fw, np.full(N, fw),
                             fw - frac * fw, np.zeros(N), [0.0]])
        py = np.concatenate([np.zeros(N), frac * fh,
                             np.full(N, fh), fh - frac * fh, [0.0]])
        wx = t[0] + t[1] * px + t[2] * py
        wy = t[3] + t[4] * px + t[5] * py
        g = core.Geom(core.POLYGON, [np.column_stack([wx, wy])])
        src = r["crs"]
        if src and dst and str(src).upper() != str(dst).upper():
            g = alg.transform_crs(g, str(src), str(dst))
        out.append(core.to_wkb(g))
    return pd.Series(out, dtype=object)


@F.pandas_udf(T.BinaryType())
def _rs_as_geotiff_udf(rs: pd.Series) -> pd.Series:
    from sedona_db_spark.sources.geotiff import encode_geotiff
    out = []
    for r in _iter_struct(rs):
        out.append(None if r is None else encode_geotiff(r))
    return pd.Series(out, dtype=object)


@F.pandas_udf(T.BinaryType())
def _rs_as_geotiff_deflate_udf(rs: pd.Series) -> pd.Series:
    from sedona_db_spark.sources.geotiff import encode_geotiff
    out = []
    for r in _iter_struct(rs):
        out.append(None if r is None
                   else encode_geotiff(r, compress="deflate"))
    return pd.Series(out, dtype=object)


_AS_GEOTIFF_UDFS = {"none": _rs_as_geotiff_udf,
                    "deflate": _rs_as_geotiff_deflate_udf}


def as_geotiff(r, compress: str = "none") -> Column:
    """RS_AsGeoTIFF: raster struct -> GeoTIFF bytes.

    Native codec (sources/geotiff.py) from the public TIFF 6.0 / OGC
    GeoTIFF specs — the reference shells out to GDAL
    (rust/sedona-raster-gdal/src/lib.rs:21-35), which is absent here.
    Compressions: 'deflate' (zlib strips, predictor 2 for integer
    samples), 'lzw', and 'ccitt_g4'/'ccitt_g3'/'ccitt_rle' for 0/1
    bilevel single-band rasters."""
    if compress not in ("none", "deflate", "lzw",
                        "ccitt_g4", "ccitt_g3", "ccitt_rle"):
        raise ValueError(f"unsupported GeoTIFF compression {compress!r}")
    udf = _AS_GEOTIFF_UDFS.get(compress)
    if udf is None:
        @F.pandas_udf(T.BinaryType())
        def _udf(rs: pd.Series, _c=compress) -> pd.Series:
            from sedona_db_spark.sources.geotiff import encode_geotiff
            return pd.Series([None if r is None
                              else encode_geotiff(r, compress=_c)
                              for r in _iter_struct(rs)], dtype=object)
        udf = _AS_GEOTIFF_UDFS[compress] = _udf
    return udf(r)


@F.pandas_udf(RASTER_TYPE)
def _rs_from_geotiff_udf(b: pd.Series) -> pd.DataFrame:
    from sedona_db_spark.sources.geotiff import decode_geotiff
    out = []
    for v in b:
        out.append(None if v is None else decode_geotiff(bytes(v)))
    return _struct_out(out)


def from_geotiff(b) -> Column:
    """RS_FromGeoTIFF: GeoTIFF bytes -> raster struct.  Handles strip
    and tile layouts; compressions: none, DEFLATE (predictor 1/2), LZW,
    PackBits, baseline+progressive JPEG, CCITT G3/G4 fax + packed
    1-bit strips."""
    return _rs_from_geotiff_udf(b)


def from_path(spark: SparkSession, path: str) -> DataFrame:
    """RS_FromPath: distributed GeoTIFF directory read.

    Spark lists the files (binaryFile source: path, length, bytes) and
    each task decodes its files executor-side with the native codec
    (strips/tiles; DEFLATE/LZW/PackBits/JPEG/CCITT — the same decoder
    RS_FromGeoTIFF uses), with no driver-side IO.  Remote URIs
    (http(s)/s3/gs/az, single or list) fetch through the object-store
    endpoint hooks instead of the binaryFile listing."""
    from sedona_db_spark.sources.remote import is_remote, read_binary_remote
    if is_remote(path):
        files = read_binary_remote(spark, path)
    else:
        files = spark.read.format("binaryFile") \
            .option("pathGlobFilter", "*.tif*").load(path) \
            .select("path", "content")
    out_schema = T.StructType([T.StructField("path", T.StringType())]
                              + list(RASTER_TYPE.fields))

    def decode(batches):
        from sedona_db_spark.sources.geotiff import decode_geotiff
        for pdf in batches:
            rows = []
            for p, c in zip(pdf["path"], pdf["content"]):
                r = decode_geotiff(bytes(c))
                rows.append({"path": p, **r})
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return files.mapInPandas(decode, schema=out_schema)


# ----------------------------------------------------------------------
# SQL registration.  Pixel kernels are pandas UDFs; the metadata /
# geotransform accessors are Spark SQL *scalar functions* (CREATE
# FUNCTION ... RETURN expr) so SQL callers get the same zero-Python
# whole-stage-codegen path as the Column API above — mirroring the
# reference's SQL registration manifest
# (/root/reference/rust/sedona-raster-functions/src/register.rs:39-92).
# ----------------------------------------------------------------------

_R = None  # filled lazily: SQL type string for RASTER_TYPE


def _sql_accessor_defs():
    global _R
    if _R is None:
        _R = RASTER_TYPE.simpleString()
    R = _R
    B = ("NAMED_STRUCT('name', b.name, 'dim_names', b.dim_names, "
         "'source_shape', b.source_shape, 'datatype', b.datatype, "
         "'nodata', {nodata}, 'view', b.view, 'outdb_uri', b.outdb_uri, "
         "'outdb_format', b.outdb_format, 'data', b.data)")
    mk_raster = ("NAMED_STRUCT('crs', {crs}, 'transform', {transform}, "
                 "'spatial_dims', r.spatial_dims, 'spatial_shape', "
                 "r.spatial_shape, 'bands', {bands})")
    w2r_det = "(r.transform[1] * r.transform[5] - r.transform[2] * r.transform[4])"
    return [
        ("RS_NumBands", f"(r {R})", "INT", "size(r.bands)"),
        # reference pixel-type vocabulary (rs_band.rs: UNSIGNED_8BITS...)
        ("RS_BandPixelType", f"(r {R}, b INT)", "STRING",
         "CASE element_at(r.bands, b).datatype "
         "WHEN 'uint8' THEN 'UNSIGNED_8BITS' "
         "WHEN 'int8' THEN 'SIGNED_8BITS' "
         "WHEN 'uint16' THEN 'UNSIGNED_16BITS' "
         "WHEN 'int16' THEN 'SIGNED_16BITS' "
         "WHEN 'uint32' THEN 'UNSIGNED_32BITS' "
         "WHEN 'int32' THEN 'SIGNED_32BITS' "
         "WHEN 'int64' THEN 'SIGNED_64BITS' "
         "WHEN 'float32' THEN 'FLOAT_32BITS' "
         "WHEN 'float64' THEN 'FLOAT_64BITS' "
         "ELSE element_at(r.bands, b).datatype END"),
        ("RS_BandNoDataValue", f"(r {R}, b INT)", "DOUBLE",
         "element_at(r.bands, b).nodata"),
        ("RS_BandPath", f"(r {R}, b INT)", "STRING",
         "element_at(r.bands, b).outdb_uri"),
        ("RS_Width", f"(r {R})", "BIGINT",
         "element_at(r.spatial_shape, CAST(array_position(r.spatial_dims, 'x') AS INT))"),
        ("RS_Height", f"(r {R})", "BIGINT",
         "element_at(r.spatial_shape, CAST(array_position(r.spatial_dims, 'y') AS INT))"),
        ("RS_UpperLeftX", f"(r {R})", "DOUBLE", "r.transform[0]"),
        ("RS_ScaleX", f"(r {R})", "DOUBLE", "r.transform[1]"),
        ("RS_SkewX", f"(r {R})", "DOUBLE", "r.transform[2]"),
        ("RS_UpperLeftY", f"(r {R})", "DOUBLE", "r.transform[3]"),
        ("RS_SkewY", f"(r {R})", "DOUBLE", "r.transform[4]"),
        ("RS_ScaleY", f"(r {R})", "DOUBLE", "r.transform[5]"),
        ("RS_Rotation", f"(r {R})", "DOUBLE",
         "atan2(r.transform[4], r.transform[1])"),
        # GDAL world-file order scaleX skewY skewX scaleY ulx uly, 10
        # decimals (reference rs_georeference.rs output format)
        ("RS_GeoReference", f"(r {R})", "STRING",
         "concat_ws(chr(10), format_string('%.10f', r.transform[1]), "
         "format_string('%.10f', r.transform[4]), "
         "format_string('%.10f', r.transform[2]), "
         "format_string('%.10f', r.transform[5]), "
         "format_string('%.10f', r.transform[0]), "
         "format_string('%.10f', r.transform[3]))"),
        # 2-arg format variant ('GDAL'|'ESRI'): ESRI reports the pixel
        # CENTER upper-left (corner + half a pixel incl. skew terms)
        ("RS_GeoReferenceFmt", f"(r {R}, fmt STRING)", "STRING",
         "concat_ws(chr(10), format_string('%.10f', r.transform[1]), "
         "format_string('%.10f', r.transform[4]), "
         "format_string('%.10f', r.transform[2]), "
         "format_string('%.10f', r.transform[5]), "
         "format_string('%.10f', r.transform[0] + IF(upper(fmt) = 'ESRI', "
         "0.5D * (r.transform[1] + r.transform[2]), 0.0D)), "
         "format_string('%.10f', r.transform[3] + IF(upper(fmt) = 'ESRI', "
         "0.5D * (r.transform[4] + r.transform[5]), 0.0D)))"),
        # RS_SRID: 'EPSG:n' strings, else the WHOLE-CRS authority code of
        # a WKT string (the LAST AUTHORITY["EPSG","n"] clause)
        ("RS_SRID", f"(r {R})", "INT",
         "CASE WHEN r.crs LIKE 'EPSG:%' THEN CAST(split(r.crs, ':')[1] AS INT) "
         "WHEN size(regexp_extract_all(r.crs, "
         "'AUTHORITY\\\\[\"EPSG\",\"([0-9]+)\"\\\\]', 1)) > 0 THEN "
         "CAST(element_at(regexp_extract_all(r.crs, "
         "'AUTHORITY\\\\[\"EPSG\",\"([0-9]+)\"\\\\]', 1), -1) AS INT) "
         "ELSE 0 END"),
        ("RS_CRS", f"(r {R})", "STRING", "r.crs"),
        ("RS_NumDimensions", f"(r {R})", "INT", "size(r.spatial_shape)"),
        ("RS_DimNames", f"(r {R})", "ARRAY<STRING>", "r.spatial_dims"),
        ("RS_DimSize", f"(r {R}, d STRING)", "BIGINT",
         "element_at(r.spatial_shape, CAST(array_position(r.spatial_dims, d) AS INT))"),
        ("RS_Shape", f"(r {R})", "ARRAY<BIGINT>", "r.spatial_shape"),
        ("RS_IsEmpty", f"(r {R})", "BOOLEAN",
         "size(r.spatial_shape) = 0 OR exists(r.spatial_shape, s -> s = 0)"),
        ("RS_RasterToWorldCoordX", f"(r {R}, px DOUBLE, py DOUBLE)", "DOUBLE",
         "r.transform[0] + px * r.transform[1] + py * r.transform[2]"),
        # footprint polygon (affine image of the 4 corners; skew-correct —
        # reference join semantics, sedona-spatial-join-raster/src/lib.rs)
        ("RS_Envelope", f"(r {R})", "BINARY",
         "ST_GeomFromWKT(concat('POLYGON ((', " + ", ', ', ".join(
             "concat_ws(' ', "
             f"r.transform[0] + {px} * r.transform[1] + {py} * r.transform[2], "
             f"r.transform[3] + {px} * r.transform[4] + {py} * r.transform[5])"
             for px, py in (
                 ("0.0D", "0.0D"),
                 ("CAST(RS_Width(r) AS DOUBLE)", "0.0D"),
                 ("CAST(RS_Width(r) AS DOUBLE)", "CAST(RS_Height(r) AS DOUBLE)"),
                 ("0.0D", "CAST(RS_Height(r) AS DOUBLE)"),
                 ("0.0D", "0.0D"))) + ", '))'))"),
        ("RS_ConvexHull", f"(r {R})", "BINARY", "RS_Envelope(r)"),
        ("RS_Intersects", f"(r {R}, g BINARY)", "BOOLEAN",
         "ST_Intersects(RS_Envelope(r), g)"),
        ("RS_Contains", f"(r {R}, g BINARY)", "BOOLEAN",
         "ST_Contains(RS_Envelope(r), g)"),
        ("RS_Within", f"(r {R}, g BINARY)", "BOOLEAN",
         "ST_Within(RS_Envelope(r), g)"),
        ("RS_RasterToWorldCoordY", f"(r {R}, px DOUBLE, py DOUBLE)", "DOUBLE",
         "r.transform[3] + px * r.transform[4] + py * r.transform[5]"),
        ("RS_WorldToRasterCoordX", f"(r {R}, wx DOUBLE, wy DOUBLE)", "BIGINT",
         f"CAST(floor(((wx - r.transform[0]) * r.transform[5] - "
         f"(wy - r.transform[3]) * r.transform[2]) / {w2r_det}) AS BIGINT)"),
        ("RS_WorldToRasterCoordY", f"(r {R}, wx DOUBLE, wy DOUBLE)", "BIGINT",
         f"CAST(floor(((wy - r.transform[3]) * r.transform[1] - "
         f"(wx - r.transform[0]) * r.transform[4]) / {w2r_det}) AS BIGINT)"),
        ("RS_SetSRID", f"(r {R}, s INT)", R,
         mk_raster.format(crs="concat('EPSG:', CAST(s AS STRING))",
                          transform="r.transform", bands="r.bands")),
        # pixel geometries + combined coordinate forms
        # (rs_pixel_geometry.rs / rs_coords.rs SQL names)
        ("RS_RasterToWorldCoord", f"(r {R}, px DOUBLE, py DOUBLE)", "BINARY",
         "ST_Point(RS_RasterToWorldCoordX(r, px, py), "
         "RS_RasterToWorldCoordY(r, px, py))"),
        ("RS_WorldToRasterCoord", f"(r {R}, wx DOUBLE, wy DOUBLE)", "BINARY",
         "ST_Point(CAST(RS_WorldToRasterCoordX(r, wx, wy) AS DOUBLE), "
         "CAST(RS_WorldToRasterCoordY(r, wx, wy) AS DOUBLE))"),
        ("RS_PixelAsPoint", f"(r {R}, px DOUBLE, py DOUBLE)", "BINARY",
         "RS_RasterToWorldCoord(r, px, py)"),
        ("RS_PixelAsCentroid", f"(r {R}, px DOUBLE, py DOUBLE)", "BINARY",
         "RS_RasterToWorldCoord(r, px + 0.5D, py + 0.5D)"),
        ("RS_PixelAsPolygon", f"(r {R}, px DOUBLE, py DOUBLE)", "BINARY",
         "ST_GeomFromWKT(concat('POLYGON ((', "
         "concat_ws(' ', RS_RasterToWorldCoordX(r, px, py), "
         "RS_RasterToWorldCoordY(r, px, py)), ', ', "
         "concat_ws(' ', RS_RasterToWorldCoordX(r, px + 1.0D, py), "
         "RS_RasterToWorldCoordY(r, px + 1.0D, py)), ', ', "
         "concat_ws(' ', RS_RasterToWorldCoordX(r, px + 1.0D, py + 1.0D), "
         "RS_RasterToWorldCoordY(r, px + 1.0D, py + 1.0D)), ', ', "
         "concat_ws(' ', RS_RasterToWorldCoordX(r, px, py + 1.0D), "
         "RS_RasterToWorldCoordY(r, px, py + 1.0D)), ', ', "
         "concat_ws(' ', RS_RasterToWorldCoordX(r, px, py), "
         "RS_RasterToWorldCoordY(r, px, py)), '))'))"),
        ("RS_SliceRange", f"(r {R}, s INT, e INT)", R,
         mk_raster.format(crs="r.crs", transform="r.transform",
                          bands="slice(r.bands, s, e - s + 1)")),
        ("RS_Metadata", f"(r {R})",
         "STRUCT<upperleftx DOUBLE, upperlefty DOUBLE, width BIGINT, "
         "height BIGINT, scalex DOUBLE, scaley DOUBLE, skewx DOUBLE, "
         "skewy DOUBLE, srid INT, numbands INT>",
         "NAMED_STRUCT('upperleftx', r.transform[0], "
         "'upperlefty', r.transform[3], 'width', RS_Width(r), "
         "'height', RS_Height(r), 'scalex', r.transform[1], "
         "'scaley', r.transform[5], 'skewx', r.transform[2], "
         "'skewy', r.transform[4], 'srid', RS_SRID(r), "
         "'numbands', RS_NumBands(r))"),
        ("RS_SetCRS", f"(r {R}, c STRING)", R,
         mk_raster.format(crs="c", transform="r.transform", bands="r.bands")),
        # GDAL georeference STRING 'scaleX skewY skewX scaleY ulx uly'
        # (reference rs_georeference.rs setter; the ESRI variant converts
        # the pixel-center upper-left back to the stored corner)
        ("RS_SetGeoReference", f"(r {R}, s STRING)", R,
         mk_raster.format(
             crs="r.crs",
             transform=("array("
                        "CAST(split(trim(s), '\\\\s+')[4] AS DOUBLE), "
                        "CAST(split(trim(s), '\\\\s+')[0] AS DOUBLE), "
                        "CAST(split(trim(s), '\\\\s+')[2] AS DOUBLE), "
                        "CAST(split(trim(s), '\\\\s+')[5] AS DOUBLE), "
                        "CAST(split(trim(s), '\\\\s+')[1] AS DOUBLE), "
                        "CAST(split(trim(s), '\\\\s+')[3] AS DOUBLE))"),
             bands="r.bands")),
        ("RS_SetGeoReferenceFmt", f"(r {R}, s STRING, fmt STRING)", R,
         mk_raster.format(
             crs="r.crs",
             transform=("array("
                        "CAST(split(trim(s), '\\\\s+')[4] AS DOUBLE) - "
                        "IF(upper(fmt) = 'ESRI', 0.5D * ("
                        "CAST(split(trim(s), '\\\\s+')[0] AS DOUBLE) + "
                        "CAST(split(trim(s), '\\\\s+')[2] AS DOUBLE)), 0.0D), "
                        "CAST(split(trim(s), '\\\\s+')[0] AS DOUBLE), "
                        "CAST(split(trim(s), '\\\\s+')[2] AS DOUBLE), "
                        "CAST(split(trim(s), '\\\\s+')[5] AS DOUBLE) - "
                        "IF(upper(fmt) = 'ESRI', 0.5D * ("
                        "CAST(split(trim(s), '\\\\s+')[1] AS DOUBLE) + "
                        "CAST(split(trim(s), '\\\\s+')[3] AS DOUBLE)), 0.0D), "
                        "CAST(split(trim(s), '\\\\s+')[1] AS DOUBLE), "
                        "CAST(split(trim(s), '\\\\s+')[3] AS DOUBLE))"),
             bands="r.bands")),
        ("RS_SetBandNoDataValue", f"(r {R}, bi INT, v DOUBLE)", R,
         mk_raster.format(
             crs="r.crs", transform="r.transform",
             bands=("transform(r.bands, (b, i) -> IF(i = bi - 1, "
                    + B.format(nodata="v") + ", b))"))),
        # 2-arg form: NULL value -> NULL raster; otherwise only
        # unambiguous on a single-band raster
        ("RS_SetBandNoDataValueB1", f"(r {R}, v DOUBLE)", R,
         f"IF(isnull(v), CAST(NULL AS {R}), IF(size(r.bands) > 1, "
         "raise_error('RS_SetBandNoDataValue: raster has multiple bands; "
         "specify which band to set'), "
         + mk_raster.format(
             crs="r.crs", transform="r.transform",
             bands=("transform(r.bands, (b, i) -> IF(i = 0, "
                    + B.format(nodata="v") + ", b))")) + "))"),
    ]


def register_sql_accessors(spark: SparkSession) -> None:
    for name, args, ret, body in _sql_accessor_defs():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{args} "
                  f"RETURNS {ret} RETURN {body}")


# ----------------------------------------------------------------------
# round 7: reference SQL-name parity (register.rs diff)
# ----------------------------------------------------------------------

def _rs_example_row():
    """The reference's RS_Example fixture raster (rs_example.rs:50-75):
    64x32, 3 uint8 bands, geotransform [43.08, 2, 1, 79.07, 1, 2],
    nodata 127; band N is filled with N except the top-left pixel."""
    w, h = 64, 32
    bands = []
    for band_id in (1, 2, 3):
        arr = np.full((h, w), band_id, dtype=np.uint8)
        arr[0, 0] = 127
        bands.append({
            "name": f"b{band_id}", "dim_names": ["y", "x"],
            "source_shape": [h, w], "datatype": "uint8",
            "nodata": 127.0, "view": None,
            "outdb_uri": None, "outdb_format": None,
            "data": arr.tobytes(),
        })
    return {"crs": "EPSG:4326",
            "transform": [43.08, 2.0, 1.0, 79.07, 1.0, 2.0],
            "spatial_dims": ["y", "x"], "spatial_shape": [h, w],
            "bands": bands}


@F.pandas_udf(RASTER_TYPE)
def _rs_slice_udf(rs: pd.Series, dim: pd.Series,
                  idx: pd.Series) -> pd.DataFrame:
    """RS_Slice (rs_slice.rs): index each band along the named NON-spatial
    dimension, removing that dimension from the output; bands without the
    dimension pass through unchanged (xarray `isel` convention, same as
    RS_DimToBand)."""
    out = []
    for r, d, i in zip(_iter_struct(rs), dim, idx):
        if r is None or d is None or i is None:
            out.append(None)
            continue
        d, i = str(d), int(i)
        if i < 0:
            raise ValueError(f"RS_Slice: index must be non-negative, got {i}")
        if d in (list(r["spatial_dims"]) or ["y", "x"]):
            raise ValueError("RS_Slice: spatial dimensions cannot be sliced")
        if not any(b["dim_names"] is not None and d in list(b["dim_names"])
                   for b in r["bands"]):
            raise ValueError(f"RS_Slice: no band has dimension {d!r}")
        new_bands = []
        for b in r["bands"]:
            dims = list(b["dim_names"]) if b["dim_names"] is not None and len(b["dim_names"]) else []
            if d not in dims:
                new_bands.append(_band_dict(
                    b["name"], dims, b["source_shape"], b["datatype"],
                    b["data"], b["nodata"]))
                continue
            ax = dims.index(d)
            arr = _band_array(b)
            if i >= arr.shape[ax]:
                raise ValueError(
                    f"RS_Slice: index {i} out of range for dimension "
                    f"{d!r} with size {arr.shape[ax]}")
            sub = np.ascontiguousarray(np.take(arr, i, axis=ax))
            new_bands.append(_band_dict(
                b["name"], dims[:ax] + dims[ax + 1:], sub.shape,
                b["datatype"], sub.tobytes(), b["nodata"]))
        out.append({"crs": r["crs"], "transform": list(r["transform"]),
                    "spatial_dims": list(r["spatial_dims"]),
                    "spatial_shape": [int(v) for v in r["spatial_shape"]],
                    "bands": new_bands})
    return _struct_out(out)


_ZONAL_STAT_ALIASES = {
    "count": "count", "sum": "sum", "mean": "mean", "avg": "mean",
    "average": "mean", "min": "min", "max": "max", "stddev": "stddev",
    "sd": "stddev", "std": "stddev", "variance": "variance",
}


@F.pandas_udf(T.DoubleType())
def _rs_zonalstats_udf(rs: pd.Series, geom: pd.Series, band: pd.Series,
                       stat: pd.Series) -> pd.Series:
    """RS_ZonalStats (rs_zonal_stats.rs ladder, fixed at the 4-arg form
    (raster, roi, band, stat)): one statistic as a double.  Stat-name
    aliases follow Sedona Spark (avg/average, sd/std); variance is
    stddev squared."""
    full = _zonal_stats_batch(rs, geom, band)
    out = []
    for (_, row), s in zip(full.iterrows(), stat):
        if s is None:
            out.append(None)
            continue
        key = _ZONAL_STAT_ALIASES.get(str(s).lower())
        if key is None:
            raise ValueError(
                f"RS_ZonalStats: unknown statistic {s!r} (supported: "
                f"{sorted(set(_ZONAL_STAT_ALIASES))})")
        v = row["stddev" if key == "variance" else key]
        if v is None or (isinstance(v, float) and np.isnan(v)):
            out.append(None)
        else:
            out.append(float(v) ** 2 if key == "variance" else float(v))
    return pd.Series(out, dtype="float64")


def _fetch_uri_bytes(uri: str) -> bytes:
    """Fetch whole-file bytes for RS_FromPath: local paths/file://,
    http(s):// and s3:// (endpoint-mapped) — the same loader surface as
    out-of-DB band loading."""
    if uri.startswith("file://"):
        with open(uri[len("file://"):], "rb") as f:
            return f.read()
    if uri.startswith(("http://", "https://")):
        return _http_fetch(uri)
    if uri.startswith(("s3://", "gs://", "az://")):
        url, headers = _objstore_resolve(uri)
        return _http_fetch(url, extra_headers=headers)
    if "://" not in uri:
        with open(uri, "rb") as f:
            return f.read()
    raise NotImplementedError(
        f"RS_FromPath scheme for {uri!r}: supported are local paths, "
        "file://, http(s):// and s3:// (register_s3_endpoint)")


@F.pandas_udf(RASTER_TYPE)
def _rs_frompath_udf(path: pd.Series) -> pd.DataFrame:
    """RS_FromPath (sedona-raster-gdal rs_frompath.rs): path string ->
    raster, fetched and decoded executor-side with the native GeoTIFF
    codec (the reference opens the path through GDAL)."""
    from sedona_db_spark.sources.geotiff import decode_geotiff
    out = []
    for p in path:
        if p is None:
            out.append(None)
            continue
        out.append(decode_geotiff(_fetch_uri_bytes(str(p))))
    return _struct_out(out)


@F.pandas_udf(RASTER_TYPE)
def _rs_fromgdalraster_udf(payload: pd.Series) -> pd.DataFrame:
    """RS_FromGDALRaster (rs_from_gdal_raster.rs): GDAL-readable image
    bytes -> raster.  TIFF decodes with the native GeoTIFF codec
    (georeferencing preserved); PNG/JPEG/GIF/BMP/netpbm/WebP decode with
    the native image codecs and get GDAL's convention for ungeoreferenced
    images (identity transform, one band per channel, no CRS)."""
    from sedona_db_spark.operators.multimodal import decode_image
    from sedona_db_spark.sources.geotiff import decode_geotiff
    out = []
    for b in payload:
        if b is None:
            out.append(None)
            continue
        data = bytes(b)
        if data[:4] in (b"II*\x00", b"MM\x00*"):
            out.append(decode_geotiff(data))
            continue
        arr = decode_image(data)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        h, w, nch = arr.shape
        bands = [(f"b{i + 1}", str(arr.dtype), arr[:, :, i])
                 for i in range(nch)]
        out.append(make_raster_row(w, h, ulx=0.0, uly=0.0, scale_x=1.0,
                                   scale_y=1.0, crs=None, bands=bands))
    return _struct_out(out)


def register(spark: SparkSession) -> None:
    spark.udf.register("RS_Value", _rs_value_udf)
    spark.udf.register("RS_ZonalStatsAll", _rs_zonal_udf)
    spark.udf.register("RS_EnsureLoaded", _rs_ensure_loaded_udf)
    spark.udf.register("RS_Clip", _rs_clip_udf)
    spark.udf.register("RS_Tile", _rs_tile_udf)
    spark.udf.register("RS_AsRaster", _rs_asraster_udf)
    spark.udf.register("RS_AsGeoTIFF", _rs_as_geotiff_udf)
    spark.udf.register("RS_AsGeoTIFFDeflate", _rs_as_geotiff_deflate_udf)
    spark.udf.register("RS_FromGeoTIFF", _rs_from_geotiff_udf)
    spark.udf.register("RS_Values", _rs_values_udf)
    # world-point RS_Value (2/3-arg SQL forms route here via the front
    # door; the 4-arg pixel-coordinate form keeps the base name)
    spark.udf.register("RS_ValueGeom", _rs_value_geom_udf)
    spark.udf.register("RS_ReprojectMatch", _rs_reproject_match_udf)
    spark.udf.register("RS_DimToBand", _rs_dimtoband_udf)
    spark.udf.register("RS_BandToDim", _rs_bandtodim_udf)
    spark.udf.register("RS_Resample", _rs_resample_udf)
    spark.udf.register("RS_Polygonize", _rs_polygonize_udf)
    # round 7: remaining reference SQL names (register.rs diff)
    spark.udf.register("RS_Example", _rs_example_row, RASTER_TYPE)
    spark.udf.register("RS_Slice", _rs_slice_udf)
    spark.udf.register("RS_ZonalStats", _rs_zonalstats_udf)
    spark.udf.register("RS_FromPath", _rs_frompath_udf)
    spark.udf.register("RS_FromGDALRaster", _rs_fromgdalraster_udf)
    register_sql_accessors(spark)


# ----------------------------------------------------------------------
# resample / polygonize (GDAL-tier ops implemented natively with numpy)
# ----------------------------------------------------------------------

@F.pandas_udf(RASTER_TYPE)
def _rs_resample_udf(rs: pd.Series, new_w: pd.Series,
                     new_h: pd.Series) -> pd.DataFrame:
    """Nearest-neighbor resample to (new_w, new_h) — the default GDAL
    RS_Resample mode; pixel size rescales, extent is preserved."""
    out = []
    for r, nw, nh in zip(_iter_struct(rs), new_w, new_h):
        if r is None or nw is None or nh is None:
            out.append(None)
            continue
        t, w, h = _raster_fields(r)
        nw, nh = int(nw), int(nh)
        ys = (np.arange(nh) * (h / nh)).astype(int).clip(0, h - 1)
        xs = (np.arange(nw) * (w / nw)).astype(int).clip(0, w - 1)
        bands = []
        for b in r["bands"]:
            arr = _band_array(b)
            if arr is None:
                continue
            sub = arr.reshape(h, w)[np.ix_(ys, xs)]
            bands.append((b["name"], b["datatype"], sub))
        out.append(make_raster_row(
            nw, nh, ulx=t[0], uly=t[3],
            scale_x=t[1] * w / nw, scale_y=t[5] * h / nh,
            skew_x=t[2], skew_y=t[4], crs=r["crs"], bands=bands))
    return _struct_out(out)


def resample(r, new_w: int, new_h: int) -> Column:
    return _rs_resample_udf(r, F.lit(new_w).cast("long"),
                            F.lit(new_h).cast("long"))


_POLY_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("value", T.DoubleType()),
    T.StructField("geometry", T.BinaryType()),
]))


@F.pandas_udf(_POLY_SCHEMA)
def _rs_polygonize_udf(rs: pd.Series, band: pd.Series) -> pd.Series:
    """RS_Polygonize: 4-connected same-value pixel regions -> exact
    rectilinear polygons (pixel squares merged by strip union).  Pair
    with F.explode; nodata pixels are skipped."""
    from sedona_db_spark.functions.aggregates import _rect_union
    from sedona_db_spark.geom import core
    out = []
    for r, b in zip(_iter_struct(rs), band):
        if r is None or b is None:
            out.append(None)
            continue
        bands = r["bands"]
        bi = int(b) - 1
        arr = _band_array(bands[bi]) if 0 <= bi < len(bands) else None
        if arr is None:
            out.append(None)
            continue
        t, w, h = _raster_fields(r)
        grid = arr.reshape(h, w)
        nod = bands[bi]["nodata"]
        labels = np.full((h, w), -1, dtype=np.int64)
        nxt = 0
        regions: list = []
        for sy in range(h):
            for sx in range(w):
                if labels[sy, sx] != -1:
                    continue
                v = grid[sy, sx]
                if nod is not None and v == nod:
                    labels[sy, sx] = -2
                    continue
                stack = [(sy, sx)]
                labels[sy, sx] = nxt
                cells = []
                while stack:
                    y, x = stack.pop()
                    cells.append((y, x))
                    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        yy, xx = y + dy, x + dx
                        if 0 <= yy < h and 0 <= xx < w and \
                                labels[yy, xx] == -1 and grid[yy, xx] == v:
                            labels[yy, xx] = nxt
                            stack.append((yy, xx))
                regions.append((float(v), cells))
                nxt += 1
        feats = []
        for v, cells in regions:
            rects = []
            for y, x in cells:
                wx0 = t[0] + x * t[1]
                wy0 = t[3] + (y + 1) * t[5]
                wx1 = t[0] + (x + 1) * t[1]
                wy1 = t[3] + y * t[5]
                x0, x1 = sorted((wx0, wx1))
                y0, y1 = sorted((wy0, wy1))
                rects.append([np.array([[x0, y0], [x1, y0], [x1, y1],
                                        [x0, y1], [x0, y0]])])
            u = _rect_union(rects)
            feats.append({"value": v, "geometry": core.to_wkb(u)})
        out.append(feats)
    return pd.Series(out)


def polygonize(r, band=1) -> Column:
    band = F.lit(band) if not isinstance(band, Column) else band
    return _rs_polygonize_udf(r, band.cast("long"))


def metadata(r) -> Column:
    """RS_Metadata: flat struct of the descriptive fields (native)."""
    return F.struct(
        upper_left_x(r).alias("upperleftx"),
        upper_left_y(r).alias("upperlefty"),
        width(r).alias("width"), height(r).alias("height"),
        scale_x(r).alias("scalex"), scale_y(r).alias("scaley"),
        skew_x(r).alias("skewx"), skew_y(r).alias("skewy"),
        srid(r).alias("srid"), num_bands(r).alias("numbands"))


@F.pandas_udf(T.ArrayType(T.DoubleType()))
def _rs_values_udf(rs: pd.Series, pts: pd.Series, band: pd.Series) -> pd.Series:
    """RS_Values (rs_values.rs): sample the band at each point of a
    MultiPoint; out-of-bounds points yield null."""
    from sedona_db_spark.geom import core as _geocore
    out = []
    for r, pw, b in zip(_iter_struct(rs), pts, band):
        if r is None or pw is None or b is None:
            out.append(None)
            continue
        g = _geocore.from_wkb(bytes(pw))
        coords = g.all_coords()[:, :2]
        t, w, h = _raster_fields(r)
        arr = _band_array(r["bands"][int(b) - 1])
        if arr is None:
            out.append(None)
            continue
        ulx, sx, kx, uly, ky, sy = t
        det = sx * sy - kx * ky
        nod = r["bands"][int(b) - 1]["nodata"]
        vals = []
        for x, y in coords:
            dx, dy = x - ulx, y - uly
            col = (dx * sy - dy * kx) / det
            row = (dy * sx - dx * ky) / det
            # floor, not int(): int() truncates toward zero, so points up
            # to one pixel left/above the origin (col in (-1,0)) would
            # alias onto index 0 instead of falling out of bounds
            ci, ri = math.floor(col), math.floor(row)
            if 0 <= ci < w and 0 <= ri < h:
                v = float(arr[ri, ci])
                # nodata pixels read as NULL (reference rs_values.rs)
                vals.append(None if nod is not None and v == float(nod)
                            else v)
            else:
                vals.append(None)
        out.append(vals)
    return pd.Series(out, dtype=object)


@F.pandas_udf(T.DoubleType())
def _rs_value_geom_udf(rs: pd.Series, pts: pd.Series,
                       band: pd.Series) -> pd.Series:
    """RS_Value(raster, point_geom, band) — the reference's world-point
    form (rs_value.rs); the 4-arg pixel form stays on RS_Value."""
    vals = _rs_values_udf.func(rs, pts, band)
    return pd.Series(
        [None if v is None or not v else v[0] for v in vals],
        dtype=object)


def values(r, pts, band=1) -> Column:
    b = F.lit(band) if isinstance(band, int) else band
    return _rs_values_udf(r, pts, b.cast("long"))


@F.pandas_udf(RASTER_TYPE)
def _rs_reproject_match_udf(rs: pd.Series, ref: pd.Series) -> pd.DataFrame:
    """RS_ReprojectMatch (rs_reproject_match.rs / rioxarray
    reproject_match): warp the input raster onto the REFERENCE raster's
    grid — output extent, resolution, dimensions and CRS come from the
    reference, pixel values from the input (nearest-neighbor), cells
    outside the input footprint filled with NaN.  CRS pairs resolve
    through the native projection registry (no GDAL)."""
    from sedona_db_spark.geom import algorithms as _alg
    from sedona_db_spark.geom.core import MULTIPOINT, Geom as _G
    out = []
    for r, rf in zip(_iter_struct(rs), _iter_struct(ref)):
        if r is None or rf is None:
            out.append(None)
            continue
        t_in, w_in, h_in = _raster_fields(r)
        t_rf, w_rf, h_rf = _raster_fields(rf)
        # reference-grid pixel centers in reference CRS
        cols, rows = np.meshgrid(np.arange(w_rf) + 0.5,
                                 np.arange(h_rf) + 0.5)
        xs = t_rf[0] + cols * t_rf[1] + rows * t_rf[2]
        ys = t_rf[3] + cols * t_rf[4] + rows * t_rf[5]
        pts = np.column_stack([xs.ravel(), ys.ravel()])
        src_crs, dst_crs = str(rf["crs"] or ""), str(r["crs"] or "")
        if src_crs and dst_crs and src_crs.upper() != dst_crs.upper():
            moved = _alg.transform_crs(
                _G(MULTIPOINT, [p for p in pts]), src_crs, dst_crs)
            pts = np.vstack([p[:2] for p in moved.data])
        # invert the input geotransform for pixel lookup
        ulx, sx, kx, uly, ky, sy = t_in
        det = sx * sy - kx * ky
        dx, dy = pts[:, 0] - ulx, pts[:, 1] - uly
        col = np.floor((dx * sy - dy * kx) / det).astype(np.int64)
        row = np.floor((dy * sx - dx * ky) / det).astype(np.int64)
        inside = (col >= 0) & (col < w_in) & (row >= 0) & (row < h_in)
        bands = []
        for b in r["bands"]:
            arr = _band_array(b)
            if arr is None:
                continue
            vals = np.full(len(pts), np.nan)
            vals[inside] = arr[row[inside], col[inside]].astype(np.float64)
            bands.append((b["name"], "float64",
                          vals.reshape(h_rf, w_rf)))
        out.append(make_raster_row(
            w_rf, h_rf, ulx=t_rf[0], uly=t_rf[3], scale_x=t_rf[1],
            scale_y=t_rf[5], skew_x=t_rf[2], skew_y=t_rf[4],
            crs=rf["crs"], bands=bands))
    return _struct_out(out)


def reproject_match(r, ref) -> Column:
    return _rs_reproject_match_udf(r, ref)


def _band_dict(name, dims, shape, dtype, data, nodata=None):
    return {"name": name, "dim_names": list(dims),
            "source_shape": [int(s) for s in shape], "datatype": dtype,
            "nodata": nodata, "view": None, "outdb_uri": None,
            "outdb_format": None, "data": data}


@F.pandas_udf(RASTER_TYPE)
def _rs_dimtoband_udf(rs: pd.Series, dim: pd.Series) -> pd.DataFrame:
    """RS_DimToBand (rs_dim_band.rs): expand the named NON-spatial
    dimension of each band into one band per index along it; bands
    without that dimension pass through."""
    out = []
    for r, d in zip(_iter_struct(rs), dim):
        if r is None or d is None:
            out.append(None)
            continue
        d = str(d)
        if d in ("x", "y"):
            raise ValueError("spatial dimensions cannot be expanded")
        new_bands = []
        for b in r["bands"]:
            dims = list(b["dim_names"]) if b["dim_names"] is not None and len(b["dim_names"]) else []
            if d not in dims:
                new_bands.append(_band_dict(
                    b["name"], dims, b["source_shape"], b["datatype"],
                    b["data"], b["nodata"]))
                continue
            ax = dims.index(d)
            arr = _band_array(b)
            rest_dims = dims[:ax] + dims[ax + 1:]
            for i in range(arr.shape[ax]):
                sub = np.ascontiguousarray(np.take(arr, i, axis=ax))
                new_bands.append(_band_dict(
                    f"{b['name']}[{d}={i}]", rest_dims, sub.shape,
                    b["datatype"], sub.tobytes(), b["nodata"]))
        out.append({"crs": r["crs"], "transform": list(r["transform"]),
                    "spatial_dims": list(r["spatial_dims"]),
                    "spatial_shape": [int(v) for v in r["spatial_shape"]],
                    "bands": new_bands})
    return _struct_out(out)


@F.pandas_udf(RASTER_TYPE)
def _rs_bandtodim_udf(rs: pd.Series, dim: pd.Series) -> pd.DataFrame:
    """RS_BandToDim: stack all (same-shape, same-dtype) bands into ONE
    band with a new leading dimension named `dim` — the inverse of
    RS_DimToBand."""
    out = []
    for r, d in zip(_iter_struct(rs), dim):
        if r is None or d is None:
            out.append(None)
            continue
        d = str(d)
        arrs = [_band_array(b) for b in r["bands"]]
        if not arrs or any(a is None for a in arrs):
            out.append(None)
            continue
        if len({a.shape for a in arrs}) != 1 or \
                len({str(a.dtype) for a in arrs}) != 1:
            raise ValueError("RS_BandToDim requires uniform band shapes/dtypes")
        stacked = np.ascontiguousarray(np.stack(arrs, axis=0))
        b0 = r["bands"][0]
        dims = [d] + (list(b0["dim_names"]) if b0["dim_names"] is not None and len(b0["dim_names"]) else [])
        out.append({"crs": r["crs"], "transform": list(r["transform"]),
                    "spatial_dims": list(r["spatial_dims"]),
                    "spatial_shape": [int(v) for v in r["spatial_shape"]],
                    "bands": [_band_dict(b0["name"], dims, stacked.shape,
                                         b0["datatype"], stacked.tobytes(),
                                         b0["nodata"])]})
    return _struct_out(out)


def dim_to_band(r, dim) -> Column:
    d = F.lit(dim) if isinstance(dim, str) else dim
    return _rs_dimtoband_udf(r, d)


def band_to_dim(r, dim) -> Column:
    d = F.lit(dim) if isinstance(dim, str) else dim
    return _rs_bandtodim_udf(r, d)
