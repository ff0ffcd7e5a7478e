"""Geography (spherical) distance join.

Reference parity: the reference registers a dedicated S2-based geography
join planner after the default spatial planner
(/root/reference/rust/sedona/src/context.rs:163-172,
 rust/sedona-spatial-join-geography/).  This is the Spark-first
equivalent for point/point ST_DWithin(geography) joins:

- equal-angle grid partitioning: build side maps to ONE cell
  (floor(lon/c), floor(lat/c)); probe side explodes to the cell range
  covering a geodesic radius, with latitude-aware longitude padding
  (1° of longitude shrinks by cos(lat)) clamped at ±`max_lat`
- candidates meet in ONE shuffle (equi-join on the cell id — Spark's
  hash join machinery, AQE-eligible)
- exact haversine refine runs as a native codegen expression

No Python rows anywhere — the whole plan is JVM-side, so it scales with
the cluster like any equi-join.  Longitude cells are modular (pmod over
the cell count) so antimeridian-crossing pairs are found; the polar
fan-out (a radius circle near a pole covers every longitude) is bounded
by the `max_lat` clamp — rows there probe all lon cells of their band,
which is exactly the correct candidate set.  A production variant could
switch the cell id to hierarchical S2 cells to shrink that fan.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

R_EARTH_M = 6371008.8                       # IUGG mean radius
M_PER_DEG = math.pi * R_EARTH_M / 180.0     # meridian meters per degree


def haversine_m(lat1, lon1, lat2, lon2) -> Column:
    """Great-circle distance in meters (native column expression)."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = (rl2 - rl1) / 2.0
    dlon = (F.radians(lon2) - F.radians(lon1)) / 2.0
    a = F.sin(dlat) * F.sin(dlat) + \
        F.cos(rl1) * F.cos(rl2) * F.sin(dlon) * F.sin(dlon)
    return 2.0 * R_EARTH_M * F.asin(F.sqrt(a))


def geography_dwithin_join(build: DataFrame, probe: DataFrame,
                           dist_m: float,
                           build_lon: str = "lon", build_lat: str = "lat",
                           probe_lon: str = "lon", probe_lat: str = "lat",
                           max_lat: float = 88.0) -> DataFrame:
    """Inner join of `build` × `probe` on great-circle distance ≤ dist_m.

    Pass the SMALLER side as `build` (it stays one-row-per-cell; the
    probe side fans out to its covering cells).  Returns all columns of
    both inputs plus `geo_dist_m`."""
    cell = dist_m / M_PER_DEG                   # grid step in degrees (lat)
    ncx = int(math.ceil(360.0 / cell))          # lon cells wrap modulo ncx
    # exact-tiling longitude step: ncx * lon_cell == 360 exactly, so
    # floor((lon+180)/lon_cell) % ncx is seam-consistent.  With the raw
    # `cell` step, ncx*cell - 360 can approach a full cell and raw indices
    # pmod'd by ncx misalign across the antimeridian, silently dropping
    # cross-seam pairs.
    lon_cell = 360.0 / ncx
    b = build.withColumn("_cx", F.pmod(
                 F.floor((F.col(build_lon) + 180.0) / lon_cell), F.lit(ncx))) \
             .withColumn("_cy", F.floor(F.col(build_lat) / cell))
    lat, lon = F.col(probe_lat), F.col(probe_lon)
    lat_pad = F.lit(cell)
    # exact geodesic lon bound: two points within distance d at worst-case
    # band latitude L satisfy |Δlon| <= 2·asin(sin(r/2)/cos(L)) (r = d/R);
    # the planar r/cos(L) underestimates this near the poles and drops
    # band-edge pairs.  arg >= 1 -> the circle wraps every longitude.
    r = dist_m / R_EARTH_M
    wl = F.radians(F.least(F.abs(lat) + lat_pad, F.lit(max_lat)))
    arg = F.lit(math.sin(r / 2.0)) / F.cos(wl)
    lon_pad = F.when(arg >= 1.0, F.lit(180.0)) \
               .otherwise(F.degrees(2.0 * F.asin(arg)))
    # modular lon cells handle the antimeridian: a circle near ±180°
    # covers cells on both sides; array_distinct guards the full-wrap
    # case (lon_pad = 180°) from emitting a cell twice
    cxs = F.array_distinct(F.transform(
        F.sequence(F.floor((lon + 180.0 - lon_pad) / lon_cell),
                   F.floor((lon + 180.0 + lon_pad) / lon_cell)),
        lambda x: F.pmod(x, F.lit(ncx))))
    p = (probe
         .withColumn("_cy", F.explode(F.sequence(
             F.floor((lat - lat_pad) / cell), F.floor((lat + lat_pad) / cell))))
         .withColumn("_cx", F.explode(cxs)))
    joined = p.join(b, ["_cx", "_cy"])
    d = haversine_m(F.col(build_lat), F.col(build_lon),
                    F.col(probe_lat), F.col(probe_lon))
    return joined.where(d <= F.lit(float(dist_m))) \
                 .withColumn("geo_dist_m", d) \
                 .drop("_cx", "_cy")
