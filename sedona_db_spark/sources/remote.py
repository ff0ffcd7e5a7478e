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
    """True when path (or every path in a list) is a remote URI (scheme
    matched case-insensitively, RFC 3986); a MIXED local/remote list
    raises rather than silently routing the remote URIs into the
    binaryFile source (whose Hadoop scheme error would be
    unrecognizable)."""
    def one(p) -> bool:
        return str(p).lower().startswith(SCHEMES)

    if isinstance(path, (list, tuple)):
        flags = [one(p) for p in path]
        if any(flags) and not all(flags):
            raise ValueError(
                "mixed local and remote paths in one read are not "
                "supported — split the call per scheme")
        return bool(path) and all(flags)
    return one(path)


def endpoint_snapshot() -> dict:
    """Driver-side copy of the object-store endpoint registrations, for
    shipping to executors in a closure (the ensure_loaded pattern)."""
    from sedona_db_spark.functions.raster import _OBJSTORE_ENDPOINTS
    return {sc: dict(tbl) for sc, tbl in _OBJSTORE_ENDPOINTS.items() if tbl}


def uri_list(path) -> list[str]:
    """Normalize a scalar-or-list path argument to a list of URIs."""
    return [str(p) for p in (path if isinstance(path, (list, tuple))
                             else [path])]


def _fetch_with(snapshot, uri: str) -> bytes:
    """Executor-side fetch: install the driver's endpoint registrations
    (they ride in the closure) then pull the object through the shared
    retrying/LRU fetch.  The snapshot REPLACES executor entries — a
    re-registered endpoint or refreshed auth headers must win over
    whatever a long-lived worker cached from an earlier job."""
    from sedona_db_spark.functions import raster as _r
    if snapshot:
        for sc, tbl in snapshot.items():
            dst = _r._OBJSTORE_ENDPOINTS.setdefault(sc, {})
            dst.update(tbl)
    low = uri.lower()
    if low.startswith(("s3://", "gs://", "az://")):
        url, hdrs = _r._objstore_resolve(uri)
        return _r._http_fetch(url, extra_headers=hdrs)
    return _r._http_fetch(uri)


def read_binary_remote(spark: SparkSession, path, text: bool = False,
                       missing_ok: bool = False) -> DataFrame:
    """URI or list of URIs -> DataFrame[(path, content)] (or [(path,
    value)] string column in ``text`` mode) with one partition per
    object, fetched executor-side.  ``missing_ok`` maps a definitive
    HTTP 404/410 to a NULL content value (optional sidecars); every
    other failure propagates."""
    uris = uri_list(path)
    snapshot = endpoint_snapshot()

    def fetch(u):
        if missing_ok:
            try:
                return _fetch_with(snapshot, u)
            except FileNotFoundError:
                return None
        return _fetch_with(snapshot, u)

    if text:
        schema = T.StructType([T.StructField("path", T.StringType()),
                               T.StructField("value", T.StringType())])
        rdd = spark.sparkContext.parallelize(uris, len(uris)).map(
            lambda u: (u, (lambda b: None if b is None
                           else b.decode("utf-8"))(fetch(u))))
    else:
        schema = T.StructType([T.StructField("path", T.StringType()),
                               T.StructField("content", T.BinaryType())])
        rdd = spark.sparkContext.parallelize(uris, len(uris)).map(
            lambda u: (u, (lambda b: None if b is None
                           else bytearray(b))(fetch(u))))
    return spark.createDataFrame(rdd, schema)
