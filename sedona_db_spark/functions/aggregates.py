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
from sedona_db_spark.geom import algorithms2 as alg2
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
        if not geoms:
            # zero rows / all-NULL input -> SQL NULL (python/sedonadb
            # test_st_collect_all_null / _zero_input)
            out.append(None)
            continue
        dims = {(g.has_z, g.has_m) for g in geoms}
        if len(dims) > 1:
            raise ValueError(
                "ST_Collect: cannot collect mixed dimension geometries")
        geoms = [g for g in geoms if not g.is_empty()]
        if not geoms:
            out.append(core.to_wkb(core.Geom(core.GEOMETRYCOLLECTION, [])))
            continue
        z, m = dims.pop()
        gts = {g.gt for g in geoms}
        if gts == {core.POINT}:
            out.append(core.to_wkb(core.Geom(core.MULTIPOINT, [g.data for g in geoms], z, m)))
        elif gts == {core.LINESTRING}:
            out.append(core.to_wkb(core.Geom(core.MULTILINESTRING, [g.data for g in geoms], z, m)))
        elif gts == {core.POLYGON}:
            out.append(core.to_wkb(core.Geom(core.MULTIPOLYGON, [g.data for g in geoms], z, m)))
        else:
            out.append(core.to_wkb(core.Geom(core.GEOMETRYCOLLECTION, geoms, z, m)))
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
            # CW shell at the SQL boundary, same as scalar ST_ConvexHull
            # (the reference's aggregate test pins the CW sequence,
            # rust/sedona-geo/src/st_convexhull_agg.rs:447)
            from sedona_db_spark.functions.kernels import _orient_cw
            out.append(core.to_wkb(_orient_cw(alg.convex_hull(
                core.Geom(core.MULTIPOINT, list(allp))))))
    return pd.Series(out, dtype=object)


def _is_axis_rect(rings) -> bool:
    if len(rings) != 1 or len(rings[0]) != 5:
        return False
    r = np.asarray(rings[0], dtype=np.float64)[:, :2]
    xs, ys = set(np.round(r[:, 0], 9)), set(np.round(r[:, 1], 9))
    return len(xs) == 2 and len(ys) == 2


def _rect_union(polys) -> "core.Geom":
    """Exact rectilinear union: grid decomposition on boundary coords,
    keep covered cells, merge per-row into strips -> MULTIPOLYGON."""
    rects = []
    for pr in polys:
        r = np.asarray(pr[0], dtype=np.float64)[:, :2]
        rects.append((r[:, 0].min(), r[:, 1].min(), r[:, 0].max(), r[:, 1].max()))
    xs = np.unique([v for r in rects for v in (r[0], r[2])])
    ys = np.unique([v for r in rects for v in (r[1], r[3])])
    strips = []
    for j in range(len(ys) - 1):
        cy0, cy1 = ys[j], ys[j + 1]
        run_start = None
        for i in range(len(xs)):
            covered = i < len(xs) - 1 and any(
                r[0] <= xs[i] and xs[i + 1] <= r[2] and
                r[1] <= cy0 and cy1 <= r[3] for r in rects)
            if covered and run_start is None:
                run_start = xs[i]
            if not covered and run_start is not None:
                strips.append((run_start, cy0, xs[i], cy1))
                run_start = None
    polys_out = [[np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])]
                 for x0, y0, x1, y1 in strips]
    if len(polys_out) == 1:
        return core.Geom(core.POLYGON, polys_out[0])
    return core.Geom(core.MULTIPOLYGON, polys_out)


def _union_finisher(arrs: pd.Series) -> pd.Series:
    """ST_Union_Agg: exact dissolve.  Point sets dedup; disjoint polygons
    concatenate; overlapping axis-aligned rectangles use the grid
    decomposition fast path; any other overlapping group goes through
    tree-folded Martinez sweep unions (geom/clip.py) — same semantics as
    the reference's GEOS boolean union."""
    out = []
    for arr in arrs:
        if arr is None or not any(b is not None for b in arr):
            out.append(None)    # zero rows / all-NULL group -> NULL
            continue
        pts, polys = [], []
        for b in arr:
            if b is None:
                continue
            g = core.from_wkb(bytes(b))
            for p in g.points():
                pts.append(tuple(p[:2]))
            for pr in g.polygons():
                polys.append(pr)
        if polys:
            # connected components by bbox overlap
            n = len(polys)
            boxes = []
            for pr in polys:
                r = np.vstack([np.asarray(x, dtype=np.float64)[:, :2] for x in pr])
                boxes.append((r[:, 0].min(), r[:, 1].min(),
                              r[:, 0].max(), r[:, 1].max()))
            parent = list(range(n))

            def find(i):
                while parent[i] != i:
                    parent[i] = parent[parent[i]]
                    i = parent[i]
                return i

            for i in range(n):
                for j in range(i + 1, n):
                    a, b2 = boxes[i], boxes[j]
                    if a[0] < b2[2] and b2[0] < a[2] and a[1] < b2[3] and b2[1] < a[3]:
                        parent[find(i)] = find(j)
            comps: dict = {}
            for i in range(n):
                comps.setdefault(find(i), []).append(i)
            out_polys = []
            for members in comps.values():
                group = [polys[i] for i in members]
                if len(group) == 1:
                    out_polys.append(group[0])
                elif all(_is_axis_rect(pr) for pr in group):
                    u = _rect_union(group)
                    out_polys.extend(u.polygons())
                else:
                    # exact dissolve: tree-folded Martinez unions
                    u = alg.unary_union(core.Geom(core.MULTIPOLYGON, group))
                    out_polys.extend(u.polygons())
            if len(out_polys) == 1:
                out.append(core.to_wkb(core.Geom(core.POLYGON, out_polys[0])))
            else:
                out.append(core.to_wkb(core.Geom(core.MULTIPOLYGON, out_polys)))
            continue
        uniq = sorted(set(pts))
        if not uniq:
            out.append(None)
        elif len(uniq) == 1:
            out.append(core.to_wkb(core.make_point(*uniq[0])))
        else:
            out.append(core.to_wkb(core.Geom(
                core.MULTIPOINT, [np.array(p) for p in uniq])))
    return pd.Series(out, dtype=object)


_union_points_finisher = _union_finisher  # back-compat alias


def _intersection_finisher(arrs: pd.Series) -> pd.Series:
    """Running intersection of the group (reference
    rust/sedona-geo/src/st_intersection_agg.rs).  Binary intersection is
    associative+commutative, so a fold over the collected list matches the
    reference accumulator; short-circuits on EMPTY."""
    out = []
    for arr in arrs:
        if arr is None:
            out.append(None)
            continue
        geoms = [core.from_wkb(bytes(b)) for b in arr if b is not None]
        if not geoms:
            out.append(None)
            continue
        acc = geoms[0]
        for g in geoms[1:]:
            if acc.is_empty():
                break
            acc = alg.intersection(acc, g)
        out.append(core.to_wkb(acc))
    return pd.Series(out, dtype=object)


def _polygonize_agg_finisher(arrs: pd.Series) -> pd.Series:
    """Polygonize the group's combined linework (reference
    c/sedona-geos/src/st_polygonize_agg.rs): merge all collected lines into
    one collection, then ring-assemble."""
    out = []
    for arr in arrs:
        if arr is None or not any(b is not None for b in arr):
            out.append(None)    # zero rows / all-NULL group -> NULL
            continue
        geoms = [core.from_wkb(bytes(b)) for b in arr if b is not None]
        geoms = [g for g in geoms if not g.is_empty()]
        if not geoms:
            out.append(core.to_wkb(core.Geom(core.GEOMETRYCOLLECTION, [])))
            continue
        out.append(core.to_wkb(
            alg2.polygonize(core.Geom(core.GEOMETRYCOLLECTION, geoms))))
    return pd.Series(out, dtype=object)


_coll_udf = None
_hull_udf = None
_union_udf = None
_inter_udf = None
_polyize_udf = None


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


def intersection_agg_expr(geom_col) -> Column:
    global _inter_udf
    if _inter_udf is None:
        _inter_udf = F.pandas_udf(_intersection_finisher, returnType=T.BinaryType())
    return _inter_udf(F.collect_list(geom_col))


def polygonize_agg_expr(geom_col) -> Column:
    global _polyize_udf
    if _polyize_udf is None:
        _polyize_udf = F.pandas_udf(_polygonize_agg_finisher, returnType=T.BinaryType())
    return _polyize_udf(F.collect_list(geom_col))


def _envelope_finisher(arrs: pd.Series) -> pd.Series:
    """Group bbox -> envelope polygon WKB (SQL ST_Envelope_Agg path; the
    DataFrame API keeps the pure-native min/max composition)."""
    out = []
    for arr in arrs:
        if arr is None:
            out.append(None)
            continue
        lo = [np.inf, np.inf]
        hi = [-np.inf, -np.inf]
        for b in arr:
            if b is None:
                continue
            g = core.from_wkb(bytes(b))
            bb = alg.bounds(g)
            if bb is None:
                continue
            lo[0] = min(lo[0], bb[0]); lo[1] = min(lo[1], bb[1])
            hi[0] = max(hi[0], bb[2]); hi[1] = max(hi[1], bb[3])
        if lo[0] > hi[0]:
            out.append(None)
            continue
        if lo[0] == hi[0] and lo[1] == hi[1]:
            # single point group -> POINT; collinear -> LINESTRING;
            # GEOS envelope ring order otherwise (python/sedonadb
            # test_st_envelope_agg_*)
            out.append(core.to_wkb(core.make_point(lo[0], lo[1])))
        elif lo[0] == hi[0] or lo[1] == hi[1]:
            out.append(core.to_wkb(core.Geom(
                core.LINESTRING,
                np.array([[lo[0], lo[1]], [hi[0], hi[1]]]))))
        else:
            ring = np.array([[lo[0], lo[1]], [lo[0], hi[1]],
                             [hi[0], hi[1]], [hi[0], lo[1]],
                             [lo[0], lo[1]]])
            out.append(core.to_wkb(core.Geom(core.POLYGON, [ring])))
    return pd.Series(out, dtype=object)


def _grouped_agg(finisher):
    """Adapt a collect_list finisher into a grouped-agg pandas UDF
    (Series of WKB within the group -> one WKB), registrable for SQL:
    `SELECT ST_Union_Agg(geom) FROM t GROUP BY k`."""
    def fn(s: pd.Series) -> bytes:
        return finisher(pd.Series([list(s)]))[0]
    return fn


def register(spark: SparkSession) -> None:
    """SQL names for the geometry aggregates (reference
    rust/sedona-functions/src/register.rs:123-128).  Grouped-agg pandas
    UDFs: no partial aggregation (rows shuffle to their group), which
    matches the reference's single-node accumulator semantics; the
    DataFrame-API *_expr builders keep the map-side-combinable
    collect_list form for the scale path."""
    for name, fin in (("ST_Union_Agg", _union_finisher),
                      ("ST_Collect_Agg", _collect_finisher),
                      ("ST_ConvexHull_Agg", _hull_finisher),
                      ("ST_Intersection_Agg", _intersection_finisher),
                      ("ST_Polygonize_Agg", _polygonize_agg_finisher),
                      ("ST_Envelope_Agg", _envelope_finisher)):
        spark.udf.register(name, F.pandas_udf(_grouped_agg(fin), T.BinaryType()))
        # array-input scalar form: the SQL front door rewrites
        # ST_X_Agg(g) -> ST_X_AggFin(collect_list(g)) because Spark's
        # GROUPED_AGG pandas UDFs emit ZERO rows for an empty global
        # aggregate, while SQL (and the reference) return one NULL row;
        # collect_list keeps the one-row semantics and drops NULLs,
        # which the finishers map to NULL
        spark.udf.register(name + "Fin", F.pandas_udf(fin, T.BinaryType()))

    def _analyze(s: pd.Series) -> str:
        import json
        n = 0
        npts = 0
        lo = [np.inf, np.inf]
        hi = [-np.inf, -np.inf]
        types: dict = {}
        for b in s:
            if b is None:
                continue
            g = core.from_wkb(bytes(b))
            n += 1
            npts += sum(1 for _ in g.points())
            t = g.type_name() if hasattr(g, "type_name") else str(g.gt)
            types[t] = types.get(t, 0) + 1
            bb = alg.bounds(g)
            if bb is not None:
                lo[0] = min(lo[0], bb[0]); lo[1] = min(lo[1], bb[1])
                hi[0] = max(hi[0], bb[2]); hi[1] = max(hi[1], bb[3])
        return json.dumps({
            "count": n,
            "mean_points": (npts / n) if n else 0.0,
            "bbox": None if lo[0] > hi[0] else [lo[0], lo[1], hi[0], hi[1]],
            "types": dict(sorted(types.items())),
        }, sort_keys=True)

    spark.udf.register("ST_Analyze_Agg", F.pandas_udf(_analyze, T.StringType()))


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


def envelope_agg_geography(df: DataFrame, group_cols: list[str],
                           geom: str = "geom") -> DataFrame:
    """Per-group lon/lat envelope with antimeridian awareness (reference
    geography ST_Envelope_Agg, sedona-s2geography).

    Fully native: aggregate BOTH longitude framings — raw [-180, 180]
    and shifted [0, 360) — and keep the narrower interval.  A cluster
    straddling the antimeridian (177E..-178E) gets the tight wrapped box
    (xmin > xmax in PostGIS convention) instead of a near-global one.
    One shuffle, no Python beyond the bbox decode and constructor."""
    b = df.withColumn("__b", bbox_col(F.col(geom)))
    # Shift each box AS A UNIT: sxmin = wrap(xmin), sxmax = sxmin + width.
    # Aggregating min(wrap(xmin)) / max(wrap(xmax)) independently breaks a
    # box whose raw extent crosses lon 0 (xmin wraps to ~359 while xmax
    # wraps to ~1, an inconsistent interval that can collapse the group
    # envelope and silently drop geometry).
    sxmin = (F.col("__b.xmin") + 360.0) % 360.0
    sxmax = sxmin + (F.col("__b.xmax") - F.col("__b.xmin"))
    agg = (b.withColumn("__sx0", sxmin).withColumn("__sx1", sxmax)
            .groupBy(*group_cols).agg(
        F.min("__b.xmin").alias("rx0"), F.max("__b.xmax").alias("rx1"),
        F.min("__sx0").alias("sx0"), F.max("__sx1").alias("sx1"),
        F.min("__b.ymin").alias("ymin"), F.max("__b.ymax").alias("ymax")))
    raw_w = F.col("rx1") - F.col("rx0")
    shf_w = F.col("sx1") - F.col("sx0")
    use_shift = shf_w < raw_w
    xmin = F.when(use_shift,
                  ((F.col("sx0") + 180.0) % 360.0) - 180.0).otherwise(F.col("rx0"))
    xmax = F.when(use_shift,
                  ((F.col("sx1") + 180.0) % 360.0) - 180.0).otherwise(F.col("rx1"))
    mk = get_udf("ST_MakeEnvelope")
    out = agg.withColumn("xmin", xmin).withColumn("xmax", xmax)
    # wrapped envelopes (xmin > xmax) keep the numeric columns; the
    # polygon constructor gets the unwrapped shifted box for a valid ring
    env = mk(F.least("xmin", "xmax"), F.col("ymin"),
             F.greatest("xmin", "xmax"), F.col("ymax"))
    return out.select(*group_cols, "xmin", "ymin", "xmax", "ymax",
                      env.alias("envelope"))
