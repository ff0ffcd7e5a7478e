"""Read/write surface for the user-facing API (reference
python/sedonadb/read.py + dataframe.py writer methods).

Readers are thin wrappers over ``spark.read`` (so scans stay distributed
and Catalyst sees pushdown/pruning); integer CSV inference upcasts to
64-bit to match the reference engine's Int64 inference.  Single-FILE
writes (path with matching suffix) materialize via Arrow on the driver —
the reference's single-file contract; directory writes go through the
distributed Spark writers (and the engine GeoParquet writer for geometry,
which is the 100 TB path: bbox covering + footer + spatial sort)."""

from __future__ import annotations

import json
import re
from typing import Any, Optional

from sedona_db_spark.api.errors import SedonaError

_EPSG_RE = re.compile(r"(?i)^epsg:(\d+)$")

# EPSG codes that are geographic (2D lat/lon) among those commonly seen;
# everything else renders as ProjectedCRS — PROJJSON consumers here only
# read the id block.
_GEOGRAPHIC_EPSG = {4326, 4269, 4267, 4258, 4979}


def projjson_from_crs(crs) -> Any:
    """Best-effort PROJJSON for a CRS spec.  'EPSG:n' strings become a
    PROJJSON object with an id block (what GeoParquet 1.1 requires and
    the reference's writer emits); dicts pass through; anything else is
    returned as-is."""
    if crs in (None, "", 0):
        return None
    if isinstance(crs, dict):
        return crs
    if isinstance(crs, int):
        crs = f"EPSG:{crs}"
    m = _EPSG_RE.match(str(crs))
    if not m:
        return str(crs)
    code = int(m.group(1))
    kind = "GeographicCRS" if code in _GEOGRAPHIC_EPSG else "ProjectedCRS"
    return {
        "$schema": "https://proj.org/schemas/v0.7/projjson.schema.json",
        "type": kind,
        "name": f"EPSG:{code}",
        "id": {"authority": "EPSG", "code": code},
    }


# ---------------------------------------------------------------- arrow
_WKB_EXT_REGISTERED = False


def geoarrow_wkb_type(crs=None):
    """The geoarrow.wkb Arrow extension type (binary storage + optional
    crs in the metadata), registered once per process."""
    import pyarrow as pa

    global _WKB_EXT_REGISTERED

    class _GeoArrowWkbType(pa.ExtensionType):
        def __init__(self, crs=None):
            self._crs = crs
            super().__init__(pa.binary(), "geoarrow.wkb")

        def __arrow_ext_serialize__(self):
            meta = {}
            if self._crs is not None:
                meta["crs"] = self._crs
            return json.dumps(meta).encode()

        @classmethod
        def __arrow_ext_deserialize__(cls, storage_type, serialized):
            try:
                meta = json.loads(serialized.decode() or "{}")
            except Exception:
                meta = {}
            return cls(meta.get("crs"))

    if not _WKB_EXT_REGISTERED:
        try:
            pa.register_extension_type(_GeoArrowWkbType())
        except pa.ArrowKeyError:
            pass
        _WKB_EXT_REGISTERED = True
    return _GeoArrowWkbType(crs)


def wrap_geo_columns(tbl, geo_cols: dict, validate: bool = False):
    """Cast the named binary columns of an Arrow table to geoarrow.wkb;
    optionally validate each value parses as WKB first (SedonaError on
    the first failure, as the reference's validate=True scan does)."""
    import pyarrow as pa

    if not geo_cols:
        return tbl
    if validate:
        from sedona_db_spark.geom import core as _core
        for name in geo_cols:
            if name not in tbl.column_names:
                continue
            for chunk in tbl.column(name).chunks:
                for i, v in enumerate(chunk):
                    if v.as_py() is None:
                        continue
                    try:
                        _core.from_wkb(v.as_py())
                    except Exception as e:
                        raise SedonaError(
                            f"WKB validation failed for column '{name}': "
                            f"{e}") from e
    for name, crs in geo_cols.items():
        if name not in tbl.column_names:
            continue
        i = tbl.column_names.index(name)
        col = tbl.column(name)
        if not pa.types.is_binary(col.type) and \
                not pa.types.is_large_binary(col.type):
            continue
        ext = geoarrow_wkb_type(projjson_from_crs(crs))
        chunks = [pa.ExtensionArray.from_storage(
            ext, c.cast(pa.binary())) for c in col.chunks]
        new = pa.chunked_array(chunks, type=ext) if chunks else \
            pa.chunked_array([], type=ext)
        tbl = tbl.set_column(i, pa.field(name, ext), new)
    return tbl


# ---------------------------------------------------------------- read
def _as_path_list(paths) -> list[str]:
    if isinstance(paths, (str, bytes)) or hasattr(paths, "__fspath__"):
        return [str(paths)]
    return [str(p) for p in paths]


class Read:
    """``con.read`` accessor (reference read.py:28): callable generic
    entry point plus per-format readers."""

    def __init__(self, ctx):
        self._ctx = ctx

    def __call__(self, paths, *, schema=None, options: Optional[dict] = None,
                 **kwargs):
        plist = _as_path_list(paths)
        first = plist[0].lower()
        options = dict(options or {})
        options.update(kwargs)
        if first.endswith(".csv") or first.endswith(".csv.gz"):
            return self.csv(paths, **options)
        if first.endswith((".json", ".ndjson", ".jsonl")):
            return self.json(paths, **options)
        if first.endswith(".parquet") or not re.search(r"\.[A-Za-z0-9]+$",
                                                       first):
            return self.parquet(paths, **options)
        return self.pyogrio(paths, **options)

    def csv(self, paths, has_header: bool = True, delimiter: str = ","):
        from sedona_db_spark.api.dataframe import DataFrame
        if len(str(delimiter).encode()) != 1:
            raise SedonaError(
                f"CSV delimiter must be a single byte, got {delimiter!r}")
        reader = (self._ctx._spark.read
                  .option("header", "true" if has_header else "false")
                  .option("sep", delimiter)
                  .option("inferSchema", "true"))
        sdf = reader.csv(_as_path_list(paths))
        sdf = _upcast_inferred(sdf)
        return DataFrame(self._ctx, sdf)

    def json(self, paths):
        from sedona_db_spark.api.dataframe import DataFrame
        sdf = self._ctx._spark.read.json(_as_path_list(paths))
        return DataFrame(self._ctx, sdf)

    def parquet(self, paths, **kwargs):
        return self._ctx.read_parquet(paths, **kwargs)

    def pyogrio(self, paths, **kwargs):
        from sedona_db_spark.api.dataframe import DataFrame
        from sedona_db_spark.sources import interop
        reader = getattr(interop, "read_pyogrio", None)
        if reader is None:
            raise SedonaError("pyogrio support requires the pyogrio package")
        sdf = reader(self._ctx._spark, _as_path_list(paths), **kwargs)
        return DataFrame(self._ctx, sdf)


def _upcast_inferred(sdf):
    """CSV inference parity: the reference infers Int64/Float64; Spark
    infers int32/float for small values — upcast so dtypes line up."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    cols = []
    changed = False
    for f in sdf.schema.fields:
        if isinstance(f.dataType, (T.ByteType, T.ShortType, T.IntegerType)):
            cols.append(F.col(f.name).cast("bigint").alias(f.name))
            changed = True
        elif isinstance(f.dataType, T.FloatType):
            cols.append(F.col(f.name).cast("double").alias(f.name))
            changed = True
        else:
            cols.append(F.col(f.name))
    return sdf.select(*cols) if changed else sdf


def read_parquet(ctx, paths, *, partitioning="auto",
                 geometry_columns=None, validate: bool = False,
                 options: Optional[dict] = None, **kwargs):
    """con.read_parquet (reference context.py:223): plain + GeoParquet.

    ``partitioning=[]`` disables hive partition discovery (files are read
    directly, partition columns dropped); any other value lets Spark
    auto-discover.  ``geometry_columns`` is the reference's JSON (or
    dict) marking binary columns as WKB geometry; ``validate`` checks
    every WKB value at materialization."""
    from sedona_db_spark.api.dataframe import DataFrame

    plist = _as_path_list(paths)
    spark = ctx._spark
    disable_partitions = (isinstance(partitioning, (list, tuple))
                          and len(partitioning) == 0)
    geo_cols: dict[str, Any] = {}
    if geometry_columns:
        spec = geometry_columns
        if isinstance(spec, str):
            spec = json.loads(spec)
        for name, info in spec.items():
            enc = (info or {}).get("encoding", "WKB")
            if str(enc).upper() != "WKB":
                raise SedonaError(
                    f"Unsupported geometry encoding {enc!r} for column "
                    f"'{name}'")
            geo_cols[name] = (info or {}).get("crs")

    sdf = None
    if disable_partitions:
        sdf = (spark.read.option("recursiveFileLookup", "true")
               .parquet(*plist))
    elif len(plist) == 1:
        try:
            from sedona_db_spark.sources import geoparquet
            sdf, _meta = geoparquet.read_geoparquet(spark, plist[0])
        except Exception:
            sdf = None
    if sdf is None:
        sdf = spark.read.parquet(*plist)

    # geometry columns the engine reader tagged (udt metadata)
    for f in sdf.schema.fields:
        try:
            if f.metadata.get("udt") == "geometry" and f.name not in geo_cols:
                geo_cols[f.name] = f.metadata.get("crs")
        except Exception:
            pass

    df = DataFrame(ctx, sdf)
    df._geo_cols = geo_cols
    df._validate_wkb = bool(validate)
    return df


# ---------------------------------------------------------------- write
def _schema_has_binary(dt) -> bool:
    from pyspark.sql import types as T
    if isinstance(dt, T.BinaryType):
        return True
    if isinstance(dt, T.ArrayType):
        return _schema_has_binary(dt.elementType)
    if isinstance(dt, T.MapType):
        return _schema_has_binary(dt.keyType) or \
            _schema_has_binary(dt.valueType)
    if isinstance(dt, T.StructType):
        return any(_schema_has_binary(f.dataType) for f in dt.fields)
    return False


def check_no_geometry_columns(df, fmt: str) -> None:
    """CSV/JSON have no geometry representation: a (possibly nested)
    binary/geometry column is a hard error naming the column, with the
    documented ST_AsText workaround (reference dataframe.py to_csv)."""
    for f in df._sdf.schema.fields:
        if _schema_has_binary(f.dataType):
            raise SedonaError(
                f'Cannot write geometry column "{f.name}" to {fmt}; '
                f"project it through ST_AsText() or ST_AsBinary() first")


def detect_geo_columns(df) -> dict:
    """{column: crs-or-None} for the DataFrame's geometry columns:
    explicit (_geo_cols from read_parquet), schema-tagged (udt), else a
    one-row WKB-parse probe over binary columns (SRID from EWKB)."""
    from pyspark.sql import types as T

    known = dict(getattr(df, "_geo_cols", None) or {})
    bin_cols = [f.name for f in df._sdf.schema.fields
                if isinstance(f.dataType, T.BinaryType)]
    for f in df._sdf.schema.fields:
        try:
            if f.metadata.get("udt") == "geometry" and f.name not in known:
                known[f.name] = f.metadata.get("crs")
        except Exception:
            pass
    probe = [c for c in bin_cols if c not in known]
    if probe:
        from sedona_db_spark.geom import core as _core
        rows = df._sdf.select(*probe).limit(1).collect()
        if rows:
            row = rows[0]
            for c in probe:
                v = row[c]
                if v is None:
                    continue
                try:
                    g = _core.from_wkb(bytes(v))
                except Exception:
                    continue
                known[c] = f"EPSG:{g.srid}" if getattr(g, "srid", 0) else None
    return {c: crs for c, crs in known.items() if c in df._sdf.columns}


_GEOPARQUET_VERSIONS = {None, "1.0", "1.1", "2.0"}


def to_parquet(df, path, *, geoparquet_version=None, sort_by=None,
               partition_by=None, max_row_group_size=None, **kwargs) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    if geoparquet_version not in _GEOPARQUET_VERSIONS:
        raise SedonaError(
            f"Unexpected GeoParquet version string: {geoparquet_version!r} "
            f"(expected one of 1.0, 1.1, 2.0)")
    path = str(path)
    geo = detect_geo_columns(df)

    sdf = df._sdf
    if sort_by:
        keys = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        from pyspark.sql import functions as F
        from sedona_db_spark.functions import get_udf
        sort_cols = []
        for k in keys:
            if k in geo:
                # spatial (Hilbert) sort for locality-tight row groups —
                # the engine's SD_Order key, the row-group-pruning lever
                sort_cols.append(get_udf("SD_Order")(F.col(k)))
            else:
                sort_cols.append(F.col(k))
        sdf = sdf.orderBy(*sort_cols)

    if not path.endswith(".parquet"):
        writer_df = sdf
        if partition_by:
            parts = [partition_by] if isinstance(partition_by, str) \
                else list(partition_by)
            writer_df.write.mode("overwrite").partitionBy(*parts) \
                .parquet(path)
            return
        if geo:
            from sedona_db_spark.api.dataframe import DataFrame as _DF
            from sedona_db_spark.sources import geoparquet
            geoparquet.write_geoparquet(
                writer_df, path,
                geom_cols={c: (crs or "EPSG:0") for c, crs in geo.items()},
                add_bbox=False)
            return
        writer_df.write.mode("overwrite").parquet(path)
        return

    # single-file write: driver-side Arrow materialization (the
    # reference's single-file contract; large outputs should use a
    # directory path, which stays distributed)
    if partition_by:
        raise SedonaError(
            "partition_by requires a directory output path")
    tbl = sdf.toArrow()
    md = dict(tbl.schema.metadata or {})
    if geo:
        version = {"1.0": "1.0.0", "1.1": "1.1.0",
                   "2.0": "2.0.0"}.get(geoparquet_version, "1.1.0")
        cols = {}
        for c, crs in geo.items():
            entry = {"encoding": "WKB", "geometry_types": []}
            pj = projjson_from_crs(crs)
            if pj is not None:
                entry["crs"] = pj
            cols[c] = entry
        md[b"geo"] = json.dumps({
            "version": version,
            "primary_column": next(iter(geo)),
            "columns": cols,
        }).encode()
        tbl = tbl.replace_schema_metadata(md)
    pq.write_table(tbl, path,
                   row_group_size=max_row_group_size,
                   **{k: v for k, v in kwargs.items()
                      if k in ("compression",)})


def to_csv(df, path, *, has_header: bool = True, delimiter: str = ",",
           **kwargs) -> None:
    if len(str(delimiter).encode()) != 1:
        raise SedonaError(
            f"CSV delimiter must be a single byte, got {delimiter!r}")
    check_no_geometry_columns(df, "CSV")
    path = str(path)
    if not path.endswith(".csv"):
        (df._sdf.write.mode("overwrite")
         .option("header", "true" if has_header else "false")
         .option("sep", delimiter).csv(path))
        return
    df.to_pandas().to_csv(path, index=False, header=has_header,
                          sep=delimiter)


def to_json(df, path) -> None:
    check_no_geometry_columns(df, "JSON")
    path = str(path)
    if not path.endswith((".json", ".ndjson", ".jsonl")):
        df._sdf.write.mode("overwrite").json(path)
        return
    df.to_pandas().to_json(path, orient="records", lines=True)
