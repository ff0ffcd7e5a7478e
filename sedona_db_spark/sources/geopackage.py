"""Native GeoPackage (OGC 12-128r18) source/sink — SURVEY §2.8.

Reference reads GPKG through pyogrio/GDAL (context.py:313); here the
format is handled directly: a GeoPackage is a SQLite database with
registry tables (`gpkg_contents`, `gpkg_geometry_columns`) and feature
tables whose geometry BLOBs are a small "GP" header followed by
standard WKB — and SQLite itself ships in the Python stdlib.

Spark plumbing: files arrive through the binaryFile source and each
task opens its payload IN MEMORY via ``sqlite3.Connection.deserialize``
(no temp files, works on any Hadoop FS).  Parallelism is at file
granularity — the SQLite container cannot be split, same unit as the
reference's GDAL driver.  The writer assembles one .gpkg driver-side
(export format; large outputs belong in GeoParquet).
"""

from __future__ import annotations

import sqlite3
import struct

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from sedona_db_spark.geom import core


def gpkg_blob_to_wkb(blob: bytes) -> bytes | None:
    """GPKG geometry BLOB -> plain WKB (header: magic GP, version, flags
    with 3-bit envelope-size code, srs_id, optional envelope doubles)."""
    if blob is None:
        return None
    b = bytes(blob)
    if b[:2] != b"GP":
        raise ValueError("not a GPKG geometry blob")
    flags = b[3]
    if flags & 0x20:  # empty geometry flag
        return None
    env_code = (flags >> 1) & 0x07
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}.get(env_code)
    if env_len is None:
        raise ValueError(f"invalid GPKG envelope code {env_code}")
    return b[8 + env_len:]


def wkb_to_gpkg_blob(wkb: bytes, srs_id: int = 4326) -> bytes | None:
    if wkb is None:
        return None
    # little-endian header, no envelope (code 0)
    return b"GP" + bytes([0, 0x01]) + struct.pack("<i", srs_id) + bytes(wkb)


def _feature_tables(con: sqlite3.Connection) -> list[tuple[str, str]]:
    """[(table, geometry_column)] from the GPKG registry."""
    rows = con.execute(
        "SELECT c.table_name, g.column_name FROM gpkg_contents c "
        "JOIN gpkg_geometry_columns g ON c.table_name = g.table_name "
        "WHERE c.data_type = 'features'").fetchall()
    return [(r[0], r[1]) for r in rows]


def _sqlite_spark_type(decl: str) -> T.DataType:
    d = (decl or "").upper()
    if any(k in d for k in ("INT",)):
        return T.LongType()
    if any(k in d for k in ("REAL", "FLOA", "DOUB")):
        return T.DoubleType()
    if "BLOB" in d:
        return T.BinaryType()
    return T.StringType()


def read_geopackage(spark: SparkSession, path: str, table: str | None = None,
                    geom_col: str = "geom") -> DataFrame:
    """Distributed GPKG read: (attribute columns..., geom WKB)."""
    from sedona_db_spark.sources.remote import is_remote, read_binary_remote
    if is_remote(path):
        files = read_binary_remote(spark, path).select("content")
    else:
        files = spark.read.format("binaryFile") \
            .option("pathGlobFilter", "*.gpkg").load(path).select("content")
    head = files.limit(1).collect()
    if not head:
        raise FileNotFoundError(f"no .gpkg files under {path}")
    con = sqlite3.connect(":memory:")
    con.deserialize(bytes(head[0]["content"]))
    tables = _feature_tables(con)
    if not tables:
        raise ValueError("GeoPackage has no feature tables")
    tname, gcol = tables[0] if table is None else next(
        (t for t in tables if t[0] == table), (table, None))
    if gcol is None:
        raise ValueError(f"table {table!r} not registered as features")
    cols = con.execute(f'PRAGMA table_info("{tname}")').fetchall()
    con.close()
    fields = [T.StructField(c[1], _sqlite_spark_type(c[2]))
              for c in cols if c[1] != gcol]
    schema = T.StructType(fields + [T.StructField(geom_col, T.BinaryType())])
    names = [f.name for f in schema.fields]
    attr_names = names[:-1]

    def parse(batches):
        for pdf in batches:
            rows = []
            for payload in pdf["content"]:
                c = sqlite3.connect(":memory:")
                c.deserialize(bytes(payload))
                sel = ", ".join(f'"{a}"' for a in attr_names + [gcol])
                for rec in c.execute(f'SELECT {sel} FROM "{tname}"'):
                    vals = list(rec[:-1])
                    vals.append(gpkg_blob_to_wkb(rec[-1]))
                    rows.append(tuple(vals))
                c.close()
            yield pd.DataFrame(rows, columns=names)

    return files.mapInPandas(parse, schema=schema)


def write_geopackage(df: DataFrame, path: str, table: str = "layer",
                     geom_col: str = "geom", srs_id: int = 4326,
                     max_rows: int | None = None) -> None:
    """Driver-side single-file GPKG export with the required registry.

    Guarded: raises (steering to GeoParquet) beyond the driver-safe row
    cap — pass max_rows to override."""
    import os
    from sedona_db_spark.sources.guards import (
        DEFAULT_MAX_DRIVER_ROWS, guard_driver_collect)
    guard_driver_collect(df, "GeoPackage",
                         DEFAULT_MAX_DRIVER_ROWS if max_rows is None else max_rows)
    rows = df.collect()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    con.execute("PRAGMA application_id = 1196444487")  # 'GPKG'
    con.execute("PRAGMA user_version = 10301")
    con.execute("""CREATE TABLE gpkg_spatial_ref_sys (
        srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
        organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
        definition TEXT NOT NULL, description TEXT)""")
    con.execute("INSERT INTO gpkg_spatial_ref_sys VALUES "
                "('WGS 84', 4326, 'EPSG', 4326, 'GEOGCS[...]', NULL),"
                "('undefined', 0, 'NONE', 0, 'undefined', NULL),"
                "('undefined', -1, 'NONE', -1, 'undefined', NULL)")
    con.execute("""CREATE TABLE gpkg_contents (
        table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
        identifier TEXT UNIQUE, description TEXT DEFAULT '',
        last_change DATETIME DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
        min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
        srs_id INTEGER)""")
    con.execute("""CREATE TABLE gpkg_geometry_columns (
        table_name TEXT NOT NULL, column_name TEXT NOT NULL,
        geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
        z TINYINT NOT NULL, m TINYINT NOT NULL,
        PRIMARY KEY (table_name, column_name))""")
    attrs = [c for c in df.columns if c != geom_col]

    def decl(f):
        if isinstance(f.dataType, (T.LongType, T.IntegerType, T.ShortType,
                                   T.BooleanType)):
            return "INTEGER"
        if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            return "REAL"
        if isinstance(f.dataType, T.BinaryType):
            return "BLOB"
        return "TEXT"
    fmap = {f.name: f for f in df.schema.fields}
    cols_sql = ", ".join(f'"{a}" {decl(fmap[a])}' for a in attrs)
    con.execute(f'CREATE TABLE "{table}" (fid INTEGER PRIMARY KEY, '
                f'{cols_sql}{", " if attrs else ""}"{geom_col}" BLOB)')
    con.execute("INSERT INTO gpkg_contents (table_name, data_type, "
                "identifier, srs_id) VALUES (?, 'features', ?, ?)",
                (table, table, srs_id))
    con.execute("INSERT INTO gpkg_geometry_columns VALUES "
                "(?, ?, 'GEOMETRY', ?, 0, 0)", (table, geom_col, srs_id))
    ph = ", ".join(["?"] * (len(attrs) + 1))
    ins = f'INSERT INTO "{table}" ({", ".join(chr(34)+a+chr(34) for a in attrs)}' \
          f'{", " if attrs else ""}"{geom_col}") VALUES ({ph})'
    for r in rows:
        vals = [r[a] for a in attrs]
        b = r[geom_col]
        vals.append(None if b is None else wkb_to_gpkg_blob(bytes(b), srs_id))
        con.execute(ins, vals)
    con.commit()
    con.close()
