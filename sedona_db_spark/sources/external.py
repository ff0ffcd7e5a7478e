"""Pluggable external-format registry.

Spark-first analogue of the reference's ``ExternalFormatSpec`` protocol
(/root/reference/python/sedonadb/python/sedonadb/datasource.py:25-123):
a user (or the engine itself) registers a named format exposing
``read(spark, path, **options)`` and optionally ``write(df, path,
**options)`` and ``extension``; readers then resolve uniformly through
``read_external(spark, "name", path)`` / extension sniffing via
``format_for_path``.

Unlike the reference, there is no DataFusion listing layer to plug into
— a Spark reader IS a function that returns a DataFrame (the format
implementation decides how to parallelize: binaryFile + mapInPandas for
record formats, a driver-side parse + createDataFrame for small sidecar
formats, spark.read.* for anything Hadoop-native).  Registered readers
therefore keep full control of pushdown and partitioning.

All of the repo's native formats self-register here, so
``read_external`` covers GeoJSON / Shapefile / GeoPackage / FlatGeobuf /
GeoParquet / LAS / Zarr / CSV / JSON out of the box with one calling
convention.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class ExternalFormat:
    """A named external file format.

    ``reader(spark, path, **options) -> DataFrame`` is required;
    ``writer(df, path, **options)`` is optional (formats may be
    read-only).  ``extensions`` drive ``format_for_path`` sniffing."""

    name: str
    reader: Callable[..., DataFrame]
    writer: Callable[..., None] | None = None
    extensions: tuple[str, ...] = field(default_factory=tuple)
    description: str = ""


_FORMATS: dict[str, ExternalFormat] = {}


def register_format(fmt: ExternalFormat) -> None:
    """Register (or replace) a format under its lower-cased name."""
    _FORMATS[fmt.name.lower()] = fmt


def unregister_format(name: str) -> None:
    _FORMATS.pop(name.lower(), None)


def registered_formats() -> list[str]:
    return sorted(_FORMATS)


def lookup_format(name: str) -> ExternalFormat:
    fmt = _FORMATS.get(name.lower())
    if fmt is None:
        raise KeyError(
            f"no external format {name!r} registered "
            f"(available: {', '.join(registered_formats())})")
    return fmt


def format_for_path(path: str) -> ExternalFormat | None:
    """Sniff a registered format from the path's extension (longest
    match wins, e.g. '.geojson' beats '.json')."""
    p = path.lower().rstrip("/")
    best: ExternalFormat | None = None
    best_len = 0
    for fmt in _FORMATS.values():
        for ext in fmt.extensions:
            if p.endswith(ext.lower()) and len(ext) > best_len:
                best, best_len = fmt, len(ext)
    return best


def read_external(spark: SparkSession, name_or_path: str,
                  path: str | None = None, **options) -> DataFrame:
    """``read_external(spark, "shapefile", path)`` or, with a single
    argument, extension-sniffed: ``read_external(spark, "x.fgb")``."""
    if path is None:
        fmt = format_for_path(name_or_path)
        if fmt is None:
            raise KeyError(
                f"cannot infer a registered format from {name_or_path!r} "
                f"(known extensions: "
                f"{sorted(e for f in _FORMATS.values() for e in f.extensions)})")
        return fmt.reader(spark, name_or_path, **options)
    return lookup_format(name_or_path).reader(spark, path, **options)


def write_external(df: DataFrame, name: str, path: str, **options) -> None:
    fmt = lookup_format(name)
    if fmt.writer is None:
        raise NotImplementedError(f"format {fmt.name!r} is read-only")
    fmt.writer(df, path, **options)


def _register_builtins() -> None:
    """Self-register every native format (lazy imports keep module load
    light; each reader/writer resolves its module on first use)."""

    def lazy(module: str, fn: str) -> Callable:
        def call(*a, **k):
            import importlib
            return getattr(importlib.import_module(module), fn)(*a, **k)
        return call

    S = "sedona_db_spark.sources"
    rows = [
        ("geojson", f"{S}.geojson", "read_geojson", "write_geojson",
         (".geojson", ".json"), "RFC 7946 GeoJSON FeatureCollection"),
        ("shapefile", f"{S}.shapefile", "read_shapefile", "write_shapefile",
         (".shp",), "ESRI Shapefile (shp/shx/dbf)"),
        ("geopackage", f"{S}.geopackage", "read_geopackage",
         "write_geopackage", (".gpkg",), "OGC GeoPackage (SQLite)"),
        ("flatgeobuf", f"{S}.flatgeobuf", "read_flatgeobuf",
         "write_flatgeobuf", (".fgb",), "FlatGeobuf"),
        # read_geoparquet returns (df, geo_metadata); the protocol's
        # reader contract is a DataFrame, so unwrap
        ("geoparquet", f"{S}.geoparquet", None,
         "write_geoparquet", (".parquet",), "GeoParquet with geo footer"),
        ("las", f"{S}.las", "read_las", None, (".las", ".laz"),
         "ASPRS LAS point cloud (LAZ gated)"),
        ("zarr", f"{S}.zarr_source", "read_zarr", None, (".zarr",),
         "Zarr v2/v3 datacube"),
        ("warc", f"{S}.warc", "read_warc", "write_warc",
         (".warc", ".warc.gz", ".wet", ".wet.gz"),
         "WARC/WET web archives (ISO 28500, Common Crawl)"),
        ("csv", f"{S}.interop", "read_csv", "write_csv", (".csv",),
         "CSV with WKT geometry columns"),
        ("json", f"{S}.interop", "read_json", "write_json", (),
         "JSON lines with WKT geometry columns"),
    ]
    def geoparquet_reader(spark, path, **options):
        from sedona_db_spark.sources.geoparquet import read_geoparquet
        df, _meta = read_geoparquet(spark, path, **options)
        return df

    for name, mod, r, w, exts, desc in rows:
        register_format(ExternalFormat(
            name=name,
            reader=lazy(mod, r) if r else geoparquet_reader,
            writer=lazy(mod, w) if w else None,
            extensions=exts, description=desc))


_register_builtins()
