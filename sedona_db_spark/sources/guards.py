"""Guards shared by the driver-side single-file vector writers.

GeoPackage / Shapefile / FlatGeobuf are single-header interchange formats:
one process must assemble the whole file, so the writers `collect()` to the
driver by design.  That is fine for export-sized outputs and catastrophic
for big tables — an unguarded `write_geopackage(huge_df)` OOMs the driver.
`guard_driver_collect` probes `limit(N+1).count()` (cheap: the scan stops
after N+1 rows, same probe pattern as operators/spatial_join.py) and raises
with a clear steer toward GeoParquet before any collect happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Default cap for driver-side single-file writers.  ~500 k rows of typical
# vector features is tens-to-hundreds of MB on the driver — comfortably an
# interchange file, safely under driver heap.
DEFAULT_MAX_DRIVER_ROWS = 500_000


def guard_driver_collect(df: DataFrame, fmt: str,
                         max_rows: int | None = DEFAULT_MAX_DRIVER_ROWS) -> None:
    """Raise ValueError if `df` exceeds `max_rows` (None disables).

    Uses a LIMIT probe, not a full count: Spark stops the scan as soon as
    max_rows + 1 rows are produced, so the guard costs O(max_rows) even on
    a 100 TB input.
    """
    if max_rows is None:
        return
    probe = df.limit(max_rows + 1).count()
    if probe > max_rows:
        raise ValueError(
            f"{fmt} write is a driver-side single-file export capped at "
            f"{max_rows:,} rows (input has more). {fmt} is an interchange "
            "format; write large outputs as GeoParquet "
            "(sources.geoparquet.write_geoparquet) instead, or raise the "
            "cap explicitly with max_rows= if the driver has the memory.")
