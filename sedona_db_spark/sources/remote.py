"""Remote (object-store / http) inputs for the binary file sources.

The reference serves EVERY source through its object-store loader
registry (rust/sedona/src/context.rs:283-316); Spark's binaryFile source
covers Hadoop filesystems but not plain http or the s3/gs/az scheme
hooks this engine exposes for out-of-DB rasters and Zarr.  This module
closes that gap for the remaining readers: explicit URI(s) fan out over
``parallelize`` and each object is fetched WHERE IT IS PARSED via the
shared endpoint-hook + LRU machinery (functions/raster.py) — no
driver-side IO, no listing (object stores have no cheap directory walk,
so remote reads take explicit URIs, exactly like the reference's
``read_*("https://...")`` surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SCHEMES = ("http://", "https://", "s3://", "gs://", "az://")


def is_remote(path) -> bool:
    """True when path (or every path in a list) is a remote URI."""
    if isinstance(path, (list, tuple)):
        return bool(path) and all(str(p).startswith(SCHEMES) for p in path)
    return str(path).startswith(SCHEMES)


def _fetch_with(snapshot, uri: str) -> bytes:
    """Executor-side fetch: install the driver's endpoint registrations
    (they ride in the closure — the ensure_loaded pattern) then pull the
    object through the shared retrying/LRU fetch."""
    from sedona_db_spark.functions import raster as _r
    if snapshot:
        for sc, tbl in snapshot.items():
            dst = _r._OBJSTORE_ENDPOINTS.setdefault(sc, {})
            for bucket, ep in tbl.items():
                dst.setdefault(bucket, ep)
    if uri.startswith(("s3://", "gs://", "az://")):
        url, hdrs = _r._objstore_resolve(uri)
        return _r._http_fetch(url, extra_headers=hdrs)
    return _r._http_fetch(uri)


def read_binary_remote(spark: SparkSession, path,
                       text: bool = False) -> DataFrame:
    """URI or list of URIs -> DataFrame[(path, content)] (or [(path,
    value)] string column in ``text`` mode) with one partition per
    object, fetched executor-side."""
    uris = [str(p) for p in (path if isinstance(path, (list, tuple))
                             else [path])]
    from sedona_db_spark.functions.raster import _OBJSTORE_ENDPOINTS
    snapshot = {sc: dict(tbl)
                for sc, tbl in _OBJSTORE_ENDPOINTS.items() if tbl}
    if text:
        schema = T.StructType([T.StructField("path", T.StringType()),
                               T.StructField("value", T.StringType())])
        rdd = spark.sparkContext.parallelize(uris, len(uris)).map(
            lambda u: (u, _fetch_with(snapshot, u).decode("utf-8")))
    else:
        schema = T.StructType([T.StructField("path", T.StringType()),
                               T.StructField("content", T.BinaryType())])
        rdd = spark.sparkContext.parallelize(uris, len(uris)).map(
            lambda u: (u, bytearray(_fetch_with(snapshot, u))))
    return spark.createDataFrame(rdd, schema)
