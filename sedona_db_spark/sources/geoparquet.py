"""GeoParquet read/write + bbox-based scan pruning.

Reference: /root/reference/rust/sedona-geoparquet/src/provider.rs:108 (read),
writer.rs:71-579 (write, bbox covering columns), file_opener.rs:102-470
(three pruning layers), metadata.rs (the `geo` footer key).

Spark-first design (SURVEY.md §4.2):
- write: geometry stays WKB; a NATIVE `bbox` struct column
  (xmin/ymin/xmax/ymax) is added before the parquet write, so stock
  Parquet min/max row-group statistics serve as the GeoParquet 1.1
  covering — Spark's own row-group pruning then implements the
  reference's layer-2 skip with ZERO custom reader code.
- `geo` metadata: GeoParquet 1.1 JSON is embedded into each file footer
  (pyarrow post-pass; at 100 TB you'd move this into a DSv2 commit hook)
  and mirrored in a `_geo_metadata.json` sidecar that survives engines
  that drop custom footer keys.
- read: restores geometry column metadata from footer or sidecar;
  `spatial_filter` rewrites ST_Intersects(geom, <bbox literal>) into
  native range predicates on the bbox column (+ exact refine), which
  `.explain` shows as PushedFilters reaching the scan.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

GEO_VERSION = "1.1.0"
SIDECAR = "_geo_metadata.json"


def _geo_meta(geom_cols: dict[str, str], bbox_cols: dict[str, str]) -> dict:
    cols = {}
    for c, crs in geom_cols.items():
        entry = {
            "encoding": "WKB",
            "geometry_types": [],
            "crs": crs,
        }
        if c in bbox_cols:
            entry["covering"] = {"bbox": {
                "xmin": [bbox_cols[c], "xmin"], "ymin": [bbox_cols[c], "ymin"],
                "xmax": [bbox_cols[c], "xmax"], "ymax": [bbox_cols[c], "ymax"]}}
        cols[c] = entry
    primary = next(iter(geom_cols))
    return {"version": GEO_VERSION, "primary_column": primary, "columns": cols}


def write_geoparquet(
    df: DataFrame,
    path: str,
    geom_cols: dict[str, str] | None = None,   # {col: crs}
    add_bbox: bool = True,
    embed_footer: bool = True,
    partition_by: list[str] | None = None,
    sort_spatially: bool = False,
    spatial_partitions: int | None = None,
    mode: str = "overwrite",
    bucket_by: tuple[int, list[str]] | None = None,
    sort_by: list[str] | None = None,
    table_name: str | None = None,
) -> None:
    """Write a DataFrame with WKB geometry column(s) as GeoParquet.

    ``sort_spatially`` range-partitions + sorts by the Hilbert key of the
    first geometry column (reference writer's ``sort_by`` +
    ``SD_Order``): rows near in space land in the same row groups, so the
    bbox min/max stats become tight and row-group pruning (spatial_filter)
    skips far more data — the single biggest pruning lever at 100 TB.

    ``bucket_by=(n, cols)`` (requires ``table_name``; Spark stores the
    bucket spec in the catalog, so bucketed data must be written with
    saveAsTable) hash-clusters + optionally ``sort_by``-sorts the files:
    equi-joins and aggregations on the bucket columns then plan with
    ZERO exchange — the layout lever that deletes a per-query shuffle
    at 100 TB.  ``path`` becomes the table location's sidecar root.
    """
    if geom_cols is None:
        geom_cols = {"geom": "EPSG:4326"}
    from sedona_db_spark.operators.spatial_join import bbox_col
    bbox_cols = {}
    if add_bbox:
        for c in geom_cols:
            bname = "bbox" if len(geom_cols) == 1 else f"{c}_bbox"
            df = df.withColumn(bname, bbox_col(F.col(c)))
            bbox_cols[c] = bname
    if sort_spatially:
        from sedona_db_spark.functions import get_udf
        first_geom = next(iter(geom_cols))
        df = df.withColumn("__hkey", get_udf("SD_Order")(F.col(first_geom)))
        # explicit partition count bypasses AQE shuffle coalescing so
        # small datasets still yield per-extent files (file-skip tests);
        # at scale leave it None and let AQE size the files
        if spatial_partitions is not None:
            df = df.repartitionByRange(spatial_partitions, "__hkey")
        else:
            df = df.repartitionByRange("__hkey")
        df = df.sortWithinPartitions("__hkey").drop("__hkey")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by is not None:
        if table_name is None:
            raise ValueError(
                "bucket_by requires table_name: Spark persists the bucket "
                "spec in the catalog (plain .parquet() files would lose it)")
        n, cols = bucket_by
        writer = writer.format("parquet").bucketBy(int(n), *cols)
        if sort_by:
            writer = writer.sortBy(*sort_by)
        writer.option("path", path).saveAsTable(table_name)
    else:
        writer.parquet(path)
    meta = _geo_meta(geom_cols, bbox_cols)
    with open(os.path.join(path, SIDECAR), "w") as f:
        json.dump(meta, f)
    if embed_footer:
        _embed_geo_footer(path, meta, bbox_cols)


def _file_bbox_from_table(t, bbox_cols: dict[str, str]) -> list | None:
    """[xmin, ymin, xmax, ymax] of one file from its bbox struct column."""
    if not bbox_cols:
        return None
    bname = next(iter(bbox_cols.values()))
    if bname not in t.column_names:
        return None
    col = t.column(bname)
    try:
        import pyarrow.compute as pc
        vals = [pc.min(pc.struct_field(col, f)).as_py() for f in ("xmin", "ymin")]
        vals += [pc.max(pc.struct_field(col, f)).as_py() for f in ("xmax", "ymax")]
    except Exception:
        return None
    if any(v is None for v in vals):
        return None
    return [float(v) for v in vals]


def _embed_geo_footer(path: str, meta: dict,
                      bbox_cols: dict[str, str] | None = None) -> None:
    """Driver-side post-pass stamping the `geo` key into each footer.

    Each file's footer gets ITS OWN bbox (GeoParquet per-file `bbox`
    field) computed from the covering column, and the sidecar collects a
    {relative file: bbox} map — the listing-time index for
    `read_geoparquet(bbox=...)` file skips (reference layer 1,
    file_opener.rs:289-313)."""
    import pyarrow.parquet as pq
    file_boxes: dict[str, list] = {}
    for fp in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        t = pq.read_table(fp)
        fmeta = json.loads(json.dumps(meta))  # per-file copy
        fb = _file_bbox_from_table(t, bbox_cols or {})
        if fb is not None:
            for entry in fmeta["columns"].values():
                entry["bbox"] = fb
            file_boxes[os.path.relpath(fp, path)] = fb
        md = dict(t.schema.metadata or {})
        md[b"geo"] = json.dumps(fmeta).encode()
        pq.write_table(t.replace_schema_metadata(md), fp)
        # Hadoop LocalFS checksums are stale after the rewrite
        crc = os.path.join(os.path.dirname(fp), "." + os.path.basename(fp) + ".crc")
        if os.path.exists(crc):
            os.remove(crc)
    if file_boxes:
        meta["file_bboxes"] = file_boxes
        with open(os.path.join(path, SIDECAR), "w") as f:
            json.dump(meta, f)


def _prune_files_by_bbox(path: str, meta: dict, bbox) -> list[str] | None:
    """Listing-time file skip (reference layer 1, file_opener.rs:289-313):
    keep only files whose footer bbox intersects the query bbox.  Uses
    the sidecar map when present, else one footer-only read per file.
    Files with no bbox info are conservatively kept.  Returns None when
    nothing can be pruned (no per-file info at all)."""
    xmin, ymin, xmax, ymax = bbox
    file_boxes = meta.get("file_bboxes")
    if file_boxes is None:
        import pyarrow.parquet as pq
        file_boxes = {}
        for fp in glob.glob(os.path.join(path, "**", "*.parquet"),
                            recursive=True):
            md = pq.read_schema(fp).metadata or {}
            if b"geo" in md:
                fm = json.loads(md[b"geo"])
                for entry in (fm.get("columns") or {}).values():
                    if "bbox" in entry:
                        file_boxes[os.path.relpath(fp, path)] = entry["bbox"]
                        break
    if not file_boxes:
        return None
    kept = []
    for fp in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        fb = file_boxes.get(os.path.relpath(fp, path))
        if fb is None or not (fb[0] > xmax or fb[2] < xmin or
                              fb[1] > ymax or fb[3] < ymin):
            kept.append(fp)
    return kept


def read_geoparquet(spark: SparkSession, path: str,
                    bbox: tuple | None = None) -> tuple[DataFrame, dict]:
    """Read (Geo)Parquet; returns (df, geo_metadata).  Geometry columns get
    Spark column metadata {'udt': 'geometry', 'crs': ...} re-stamped.

    With ``bbox=(xmin, ymin, xmax, ymax)`` whole files whose footer bbox
    is disjoint from the query window are skipped BEFORE Spark lists
    their row groups — at 100 TB the file-level skip (layer 1) removes
    far more IO than row-group stats alone; combine with
    ``spatial_filter`` for the row-group (layer 2) + exact (layer 3)
    refinements.

    Remote URIs (http(s)/s3/gs/az, single or list of .parquet objects)
    fetch executor-side and decode via pyarrow; there is no listing and
    no file-level bbox prune remotely (apply ``spatial_filter`` for the
    in-plan layers), matching the explicit-URI contract of the other
    remote sources."""
    from sedona_db_spark.sources.remote import is_remote
    if is_remote(path):
        if bbox is not None:
            raise ValueError(
                "bbox file pruning needs a listable store — for remote "
                "URIs read without bbox and apply spatial_filter (the "
                "in-plan bbox layers) instead")
        return _read_geoparquet_remote(spark, path)
    meta = {}
    sidecar = os.path.join(path, SIDECAR)
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            meta = json.load(f)
    else:
        import pyarrow.parquet as pq
        files = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if files:
            md = pq.read_schema(files[0]).metadata or {}
            if b"geo" in md:
                meta = json.loads(md[b"geo"])
    if bbox is not None:
        kept = _prune_files_by_bbox(path, meta, bbox)
        if kept is not None:
            if not kept:
                # all files pruned: empty frame with the dataset schema
                df = spark.read.parquet(path).limit(0)
            else:
                # basePath keeps hive partition-column discovery working
                # when reading a pruned subset of a partition_by dataset —
                # without it the partition columns vanish from the schema
                df = spark.read.option("basePath", path).parquet(*kept)
        else:
            df = spark.read.parquet(path)
    else:
        df = spark.read.parquet(path)
    for c, entry in (meta.get("columns") or {}).items():
        if c in df.columns:
            df = df.withMetadata(c, {"udt": "geometry",
                                     "crs": entry.get("crs", "EPSG:4326"),
                                     "edges": "planar"})
    return df, meta


def _parquet_schema_remote(snapshot, uri: str):
    """Arrow schema of a remote parquet object from a Range request for
    its tail (the footer lives at the end; a few KB instead of the
    whole object on the driver).  Falls back to a full fetch when the
    server lacks suffix-Range support or the footer is oversized."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sedona_db_spark.sources.remote import _fetch_with
    try:
        tail = _fetch_with(snapshot, uri + "#bytes=-65536")
        if len(tail) >= 8 and tail[-4:] == b"PAR1":
            flen = int.from_bytes(tail[-8:-4], "little")
            if flen + 8 <= len(tail):
                # a synthetic [PAR1][footer][len][PAR1] file parses for
                # schema purposes (column offsets are not dereferenced)
                fake = b"PAR1" + tail[-(flen + 8):]
                return pq.read_schema(pa.BufferReader(fake))
    except Exception:
        pass
    return pq.read_schema(pa.BufferReader(_fetch_with(snapshot, uri)))


def _read_geoparquet_remote(spark: SparkSession, path):
    """Remote leg of read_geoparquet: per-object fetch + pyarrow decode
    executor-side; schema and the geo footer come from one driver-side
    footer Range request on the first object."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sedona_db_spark.sources.remote import (endpoint_snapshot,
                                                read_binary_remote,
                                                uri_list)

    uris = uri_list(path)
    snapshot = endpoint_snapshot()
    arrow_schema = _parquet_schema_remote(snapshot, uris[0])
    md = arrow_schema.metadata or {}
    meta = json.loads(md[b"geo"]) if b"geo" in md else {}
    from pyspark.sql.pandas.types import from_arrow_schema
    schema = from_arrow_schema(arrow_schema)

    files = read_binary_remote(spark, uris)

    def parse(batches):
        for pdf in batches:
            for content in pdf["content"]:
                yield pq.read_table(
                    pa.BufferReader(bytes(content))).to_pandas()

    df = files.mapInPandas(parse, schema)
    for c, entry in (meta.get("columns") or {}).items():
        if c in df.columns:
            df = df.withMetadata(c, {"udt": "geometry",
                                     "crs": entry.get("crs", "EPSG:4326"),
                                     "edges": "planar"})
    return df, meta


def spatial_filter(df: DataFrame, geom_col: str, xmin: float, ymin: float,
                   xmax: float, ymax: float, bbox_col_name: str = "bbox",
                   exact: bool = True) -> DataFrame:
    """ST_Intersects(geom, envelope) rewritten to pushdown-able ranges.

    The bbox range conjuncts are native comparisons on a parquet-backed
    struct column -> Catalyst pushes them to the scan (PushedFilters),
    parquet row-group stats skip non-overlapping row groups — this IS the
    reference's geo-pruning (file_opener.rs:315-366) re-expressed."""
    out = df
    if bbox_col_name in df.columns:
        out = out.filter(
            (F.col(f"{bbox_col_name}.xmin") <= xmax) &
            (F.col(f"{bbox_col_name}.xmax") >= xmin) &
            (F.col(f"{bbox_col_name}.ymin") <= ymax) &
            (F.col(f"{bbox_col_name}.ymax") >= ymin))
    if exact:
        from sedona_db_spark.functions import get_udf
        env = get_udf("ST_MakeEnvelope")(
            F.lit(float(xmin)), F.lit(float(ymin)), F.lit(float(xmax)), F.lit(float(ymax)))
        out = out.filter(get_udf("ST_Intersects")(F.col(geom_col), env))
    return out
