"""Table functions / generators.

`sd_random_geometry` reimplements the reference's seeded random-geometry
table provider (/root/reference/rust/sedona/src/random_geometry_provider.rs:
52-337; options surface python/.../functions/table.py:29-53) Spark-first:
`spark.range(n)` partitions the id space across executors and a
deterministic counter-based PRNG (splitmix64 of id*stream+seed) generates
per-row geometry WITHOUT any driver-side state — infinitely scalable and
reproducible regardless of partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sedona_db_spark.geom import algorithms as alg
from sedona_db_spark.geom import core
from sedona_db_spark.geom.core import Geom


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return z ^ (z >> np.uint64(31))


def _uniforms(ids: np.ndarray, seed: int, stream: int, n_per_row: int) -> np.ndarray:
    """(len(ids), n_per_row) deterministic uniforms in [0, 1)."""
    base = ids.astype(np.uint64) * np.uint64(1_000_003) + np.uint64(seed * 7_919 + stream)
    cols = []
    for j in range(n_per_row):
        cols.append(_splitmix64(base + np.uint64(j * 0x51_7C_C1B7)))
    m = np.stack(cols, axis=1)
    return (m >> np.uint64(11)).astype(np.float64) / float(1 << 53)


DEFAULTS = {
    "geom_type": "Point",
    "num_rows": 1000,
    "num_vertices": [10, 10],
    "num_parts": [3, 3],
    "size": [1.0, 1.0],
    "bounds": [0.0, 0.0, 100.0, 100.0],
    "hole_rate": 0.0,
    "empty_rate": 0.0,
    "null_rate": 0.0,
    "seed": 42,
}


def sd_random_geometry(spark: SparkSession, options: dict | None = None) -> DataFrame:
    """Seeded random geometry table: reference schema (id bigint,
    dist double 0..100, geometry binary WKB)."""
    opt = dict(DEFAULTS)
    opt.update(options or {})
    gt = opt["geom_type"].lower()
    n = int(opt["num_rows"])
    seed = int(opt["seed"])
    vmin, vmax = opt["num_vertices"]
    smin, smax = opt["size"]
    x0, y0, x1, y1 = opt["bounds"]
    hole_rate = float(opt["hole_rate"])
    empty_rate = float(opt["empty_rate"])
    null_rate = float(opt["null_rate"])

    def _polygon_ring(cx, cy, radius, nv, u_angles, u_radii):
        ang = np.sort(u_angles * 2 * np.pi)
        rad = radius * (0.5 + 0.5 * u_radii)
        xs = cx + rad * np.cos(ang)
        ys = cy + rad * np.sin(ang)
        ring = np.column_stack([xs, ys])
        return np.vstack([ring, ring[:1]])

    def _one(rid: int) -> bytes | None:
        u = _uniforms(np.array([rid]), seed, 0, 8 + 3 * int(vmax))[0]
        if null_rate > 0 and u[0] < null_rate:
            return None
        if empty_rate > 0 and u[1] < empty_rate:
            return core.to_wkb(core.empty(
                {"point": core.POINT, "linestring": core.LINESTRING,
                 "polygon": core.POLYGON}.get(gt, core.GEOMETRYCOLLECTION)))
        size = smin + u[2] * (smax - smin)
        nv = int(vmin + u[3] * (vmax - vmin + 1)) if vmax > vmin else int(vmin)
        cx = x0 + u[4] * max(x1 - x0 - size, 1e-9)
        cy = y0 + u[5] * max(y1 - y0 - size, 1e-9)
        verts_u = _uniforms(np.array([rid]), seed, 1, max(nv, 3) * 2)[0]
        if gt == "point":
            return core.to_wkb(core.make_point(cx, cy))
        if gt == "linestring":
            xs = cx + verts_u[:nv] * size
            ys = cy + verts_u[nv:2 * nv] * size
            return core.to_wkb(Geom(core.LINESTRING, np.column_stack([xs, ys])))
        if gt == "polygon":
            nv_eff = max(nv, 3)
            ring = _polygon_ring(cx + size / 2, cy + size / 2, size / 2,
                                 nv_eff, verts_u[:nv_eff], verts_u[nv_eff:2 * nv_eff])
            rings = [ring]
            if hole_rate > 0 and u[6] < hole_rate:
                hole = _polygon_ring(cx + size / 2, cy + size / 2, size / 6, 6,
                                     verts_u[:6], verts_u[6:12])
                rings.append(hole[::-1])
            return core.to_wkb(Geom(core.POLYGON, rings))
        if gt == "geometrycollection":
            parts = [
                core.make_point(cx, cy),
                Geom(core.LINESTRING, np.column_stack(
                    [cx + verts_u[:max(nv // 2, 2)] * size,
                     cy + verts_u[max(nv // 2, 2):2 * max(nv // 2, 2)] * size])),
                Geom(core.POLYGON, [_polygon_ring(cx + size / 2, cy + size / 2, size / 3, 5,
                                                  verts_u[:5], verts_u[5:10])]),
            ]
            return core.to_wkb(Geom(core.GEOMETRYCOLLECTION, parts))
        raise ValueError(f"unsupported geom_type {opt['geom_type']}")

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            geoms = [_one(int(i)) for i in ids]
            # reference schema (random_geometry_provider.rs:303-319):
            # id, dist (random float 0..100), geometry
            dist = _uniforms(ids, seed, 90, 1)[:, 0] * 100.0
            yield pd.DataFrame({"id": ids, "dist": dist,
                                "geometry": geoms})

    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("dist", T.DoubleType()),
                           T.StructField("geometry", T.BinaryType())])
    return spark.range(n).mapInPandas(gen, schema=schema)


def reference_bench_tables(spark: SparkSession, num_rows: int = 10_000):
    """The reference benchmark table pair (BASELINE.md row 4): geom1
    seed=42 bounds [0,0,80,100]; geom2 seed=43 bounds [20,0,100,100];
    size [1,15] -> ~2% intersection rate."""
    a = sd_random_geometry(spark, {
        "geom_type": "Polygon", "num_rows": num_rows, "num_vertices": [10, 10],
        "size": [1.0, 15.0], "bounds": [0.0, 0.0, 80.0, 100.0], "seed": 42})
    b = sd_random_geometry(spark, {
        "geom_type": "Polygon", "num_rows": num_rows, "num_vertices": [10, 10],
        "size": [1.0, 15.0], "bounds": [20.0, 0.0, 100.0, 100.0], "seed": 43})
    return a.select("id", "geometry"), b.select("id", "geometry")
