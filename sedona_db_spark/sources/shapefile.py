"""Native ESRI Shapefile reader — SURVEY §2.8 vector formats.

Reference reads shapefiles through pyogrio/GDAL
(/root/reference/python/sedonadb/python/sedonadb/context.py:313
read_pyogrio); neither library exists in this environment, so the format
is parsed directly from the public specs: the ESRI Shapefile Technical
Description (July 1998 white paper) for .shp geometry and the dBase
III/IV layout for .dbf attributes.

Spark plumbing: the .shp and sibling .dbf payloads are fetched through
the binaryFile source (works on any Hadoop filesystem), joined by file
stem, and each task parses its files into (attributes..., geom WKB)
rows — parallelism at file granularity, the same unit pyogrio/GDAL
gives the reference.  Schema comes from one driver-fetched .dbf header.

Supported shape types: 0 null, 1/11/21 point, 3/13/23 polyline,
5/15/25 polygon, 8/18/28 multipoint (Z/M coordinates parsed, extra
dims preserved for Z).  Polygon rings are assembled by winding order:
clockwise = outer shell, counter-clockwise = hole, holes assigned to
the containing shell.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sedona_db_spark.geom import core
from sedona_db_spark.geom.core import Geom


# ---------------------------------------------------------------- .dbf


def parse_dbf_header(data: bytes):
    """-> (n_records, header_size, record_size, fields[(name, type, len, dec)])."""
    n_rec, hdr_size, rec_size = struct.unpack_from("<IHH", data, 4)
    fields = []
    off = 32
    while off < hdr_size - 1 and data[off] != 0x0D:
        raw = data[off:off + 32]
        name = raw[:11].split(b"\0")[0].decode("ascii", "replace")
        ftype = chr(raw[11])
        flen = raw[16]
        fdec = raw[17]
        fields.append((name, ftype, flen, fdec))
        off += 32
    return n_rec, hdr_size, rec_size, fields


def _dbf_field_type(ftype: str, dec: int) -> T.DataType:
    if ftype in ("N", "F"):
        return T.DoubleType() if (dec or ftype == "F") else T.LongType()
    if ftype == "L":
        return T.BooleanType()
    return T.StringType()  # C, D, memo -> string


def parse_dbf_records(data: bytes):
    """Yield one dict per non-deleted record."""
    n_rec, hdr_size, rec_size, fields = parse_dbf_header(data)
    for i in range(n_rec):
        off = hdr_size + i * rec_size
        rec = data[off:off + rec_size]
        if not rec or rec[0:1] == b"*":  # deleted
            continue
        pos = 1
        out = {}
        for name, ftype, flen, fdec in fields:
            raw = rec[pos:pos + flen].decode("ascii", "replace").strip()
            pos += flen
            if raw == "" or set(raw) == {"*"}:
                out[name] = None
            elif ftype in ("N", "F"):
                try:
                    out[name] = float(raw) if (fdec or ftype == "F"
                                               or "." in raw) else int(raw)
                except ValueError:
                    out[name] = None
            elif ftype == "L":
                out[name] = (True if raw in "TtYy" else
                             False if raw in "FfNn" else None)
            else:
                out[name] = raw
        yield out


# ---------------------------------------------------------------- .shp


def _ring_signed_area(r: np.ndarray) -> float:
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _point_in_ring(p, r: np.ndarray) -> bool:
    x, y = p
    xs, ys = r[:, 0], r[:, 1]
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    cond = (ys > y) != (y2 > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xi = xs + (y - ys) / (y2 - ys) * (x2 - xs)
    return int((cond & (x < xi)).sum()) % 2 == 1


def _assemble_polygons(rings: list[np.ndarray]) -> Geom:
    """ESRI winding: CW (negative shoelace) = shell, CCW = hole."""
    shells = [r for r in rings if _ring_signed_area(r) <= 0]
    holes = [r for r in rings if _ring_signed_area(r) > 0]
    if not shells:  # degenerate: treat everything as shells
        shells, holes = holes, []
    polys = [[s] for s in shells]
    for h in holes:
        placed = False
        for poly in polys:
            if _point_in_ring(h[0], poly[0]):
                poly.append(h)
                placed = True
                break
        if not placed:
            polys.append([h])
    if len(polys) == 1:
        return Geom(core.POLYGON, polys[0])
    return Geom(core.MULTIPOLYGON, polys)


def _parse_shp_record(buf: bytes, off: int):
    """-> (geom | None, next_offset).  Record header is big-endian."""
    _, content_len = struct.unpack_from(">II", buf, off)
    body = off + 8
    nxt = body + content_len * 2
    (stype,) = struct.unpack_from("<I", buf, body)
    base = stype % 10
    has_z = stype >= 9 and stype < 20 and stype != 10
    p = body + 4
    if stype == 0:
        return None, nxt
    if base == 1:  # point / pointZ / pointM
        x, y = struct.unpack_from("<2d", buf, p)
        p += 16
        if has_z:
            (z,) = struct.unpack_from("<d", buf, p)
            return Geom(core.POINT, np.array([x, y, z]), has_z=True), nxt
        return Geom(core.POINT, np.array([x, y])), nxt
    if base == 8:  # multipoint
        (n,) = struct.unpack_from("<I", buf, p + 32)
        pts = np.frombuffer(buf, dtype="<f8", count=2 * n,
                            offset=p + 36).reshape(n, 2).copy()
        return Geom(core.MULTIPOINT, [pts[i] for i in range(n)]), nxt
    if base in (3, 5):  # polyline / polygon
        nparts, npoints = struct.unpack_from("<2I", buf, p + 32)
        parts = np.frombuffer(buf, dtype="<u4", count=nparts, offset=p + 40)
        pts_off = p + 40 + 4 * nparts
        pts = np.frombuffer(buf, dtype="<f8", count=2 * npoints,
                            offset=pts_off).reshape(npoints, 2)
        bounds = list(parts) + [npoints]
        pieces = [pts[bounds[i]:bounds[i + 1]].copy()
                  for i in range(nparts) if bounds[i + 1] > bounds[i]]
        if base == 3:
            if len(pieces) == 1:
                return Geom(core.LINESTRING, pieces[0]), nxt
            return Geom(core.MULTILINESTRING, pieces), nxt
        return _assemble_polygons(pieces), nxt
    raise NotImplementedError(f"shapefile shape type {stype} unsupported")


def parse_shp(data: bytes):
    """Yield Geom | None per record of one .shp payload."""
    (code,) = struct.unpack_from(">I", data, 0)
    if code != 9994:
        raise ValueError("not a shapefile (bad magic)")
    (flen,) = struct.unpack_from(">I", data, 24)  # length in 16-bit words
    end = flen * 2
    off = 100
    while off < min(end, len(data)):
        g, off = _parse_shp_record(data, off)
        yield g


# ------------------------------------------------------------- reader


def read_shapefile(spark: SparkSession, path: str,
                   geom_col: str = "geom") -> DataFrame:
    """Distributed shapefile read: (dbf attribute columns..., geom WKB).

    Remote: pass the ``.shp`` URI(s); the ``.dbf`` sibling is fetched
    by extension swap (object stores are never listed)."""
    from sedona_db_spark.sources.remote import is_remote, read_binary_remote
    if is_remote(path):
        uris = [str(p) for p in (path if isinstance(path, (list, tuple))
                                 else [path])]
        for u in uris:
            if not u.lower().endswith(".shp"):
                raise ValueError(
                    f"remote shapefile read takes .shp URIs, got {u!r}")
        shp = read_binary_remote(spark, uris).selectExpr(
            "regexp_replace(path, '(?i)\\\\.shp$', '') AS stem",
            "content AS shp")
        # .dbf sibling is OPTIONAL (attributes-less shapefiles are
        # legal): a 404 yields null attributes, like the local left
        # join.  Object stores are case-sensitive, so the sibling
        # mirrors the .shp extension's case (ROADS.SHP -> ROADS.DBF)
        dbf = read_binary_remote(
            spark, [u[:-4] + (".DBF" if u[-4:].isupper() else ".dbf")
                    for u in uris],
            missing_ok=True).selectExpr(
            "regexp_replace(path, '(?i)\\\\.dbf$', '') AS stem",
            "content AS dbf")
    else:
        shp = spark.read.format("binaryFile") \
            .option("pathGlobFilter", "*.shp").load(path).selectExpr(
                "regexp_replace(path, '\\\\.shp$', '') AS stem",
                "content AS shp")
        dbf = spark.read.format("binaryFile") \
            .option("pathGlobFilter", "*.dbf").load(path).selectExpr(
                "regexp_replace(path, '\\\\.dbf$', '') AS stem",
                "content AS dbf")
    pairs = shp.join(dbf, "stem", "left")

    # schema from one driver-fetched dbf header
    head = dbf.where("dbf IS NOT NULL").limit(1).collect()
    fields: list = []
    if head:
        _, _, _, dbf_fields = parse_dbf_header(bytes(head[0]["dbf"]))
        fields = [T.StructField(n, _dbf_field_type(t, d))
                  for n, t, _l, d in dbf_fields]
    schema = T.StructType(fields + [T.StructField(geom_col, T.BinaryType())])
    names = [f.name for f in schema.fields]

    def parse(batches):
        for pdf in batches:
            rows = []
            for shp_raw, dbf_raw in zip(pdf["shp"], pdf["dbf"]):
                geoms = list(parse_shp(bytes(shp_raw)))
                attrs = (list(parse_dbf_records(bytes(dbf_raw)))
                         if dbf_raw is not None else [{}] * len(geoms))
                for g, a in zip(geoms, attrs):
                    vals = [a.get(n) for n in names[:-1]]
                    vals.append(None if g is None else core.to_wkb(g))
                    rows.append(tuple(vals))
            yield pd.DataFrame(rows, columns=names)

    return pairs.select("shp", "dbf").mapInPandas(parse, schema=schema)


# ------------------------------------------------------------- writer


def _shape_record(g: Geom | None) -> bytes:
    if g is None or g.is_empty():
        return struct.pack("<I", 0)
    if g.gt == core.POINT:
        return struct.pack("<I2d", 1, float(g.data[0]), float(g.data[1]))
    if g.gt == core.MULTIPOINT:
        pts = np.asarray([p[:2] for p in g.data], dtype="<f8")
        bb = (pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max())
        return (struct.pack("<I4dI", 8, *bb, len(pts)) + pts.tobytes())
    if g.gt in (core.LINESTRING, core.MULTILINESTRING):
        parts = [np.asarray(g.data, dtype="<f8")[:, :2]] \
            if g.gt == core.LINESTRING else \
            [np.asarray(p, dtype="<f8")[:, :2] for p in g.data]
        stype = 3
    elif g.gt in (core.POLYGON, core.MULTIPOLYGON):
        polys = [g.data] if g.gt == core.POLYGON else g.data
        parts = []
        for rings in polys:
            for i, r in enumerate(rings):
                arr = np.asarray(r, dtype="<f8")[:, :2]
                # ESRI winding: shell CW, holes CCW
                cw = _ring_signed_area(arr) <= 0
                want_cw = i == 0
                if cw != want_cw:
                    arr = arr[::-1]
                parts.append(np.ascontiguousarray(arr))
        stype = 5
    else:
        raise NotImplementedError(f"shapefile write for {g.gt} unsupported")
    allp = np.vstack(parts)
    bb = (allp[:, 0].min(), allp[:, 1].min(), allp[:, 0].max(), allp[:, 1].max())
    offsets = np.cumsum([0] + [len(p) for p in parts[:-1]]).astype("<u4")
    return (struct.pack("<I4d2I", stype, *bb, len(parts), len(allp))
            + offsets.tobytes() + allp.astype("<f8").tobytes())


def write_shapefile(df: DataFrame, path: str, geom_col: str = "geom",
                    max_rows: int | None = None) -> None:
    """Single-file shapefile write (driver-side assembly — the format's
    2 GB limit and single-header layout make it a small-data export
    format; large outputs belong in GeoParquet).  Guarded: raises beyond
    the driver-safe row cap — pass max_rows to override."""
    import os
    from sedona_db_spark.sources.guards import (
        DEFAULT_MAX_DRIVER_ROWS, guard_driver_collect)
    guard_driver_collect(df, "Shapefile",
                         DEFAULT_MAX_DRIVER_ROWS if max_rows is None else max_rows)
    rows = df.collect()
    os.makedirs(path, exist_ok=True)
    base = os.path.join(path, "layer")
    attrs = [c for c in df.columns if c != geom_col]

    recs = []
    for i, r in enumerate(rows):
        b = r[geom_col]
        g = core.from_wkb(bytes(b)) if b is not None else None
        body = _shape_record(g)
        recs.append(struct.pack(">II", i + 1, len(body) // 2) + body)
    total_words = (100 + sum(len(x) for x in recs)) // 2
    xs, ys = [], []
    for r in rows:
        b = r[geom_col]
        if b is None:
            continue
        g = core.from_wkb(bytes(b))
        if g.is_empty():
            continue
        from sedona_db_spark.geom import algorithms as alg
        x0, y0, x1, y1 = alg.bounds(g)
        xs += [x0, x1]
        ys += [y0, y1]
    bb = (min(xs), min(ys), max(xs), max(ys)) if xs else (0.0, 0.0, 0.0, 0.0)
    stype = 0
    for x in recs:
        (st,) = struct.unpack_from("<I", x, 8)
        if st:
            stype = st
            break
    hdr = struct.pack(">7I", 9994, 0, 0, 0, 0, 0, total_words) \
        + struct.pack("<2I", 1000, stype) + struct.pack("<4d", *bb) \
        + struct.pack("<4d", 0, 0, 0, 0)
    with open(base + ".shp", "wb") as f:
        f.write(hdr + b"".join(recs))
    # .shx companion index
    off_words = 50
    shx = bytearray()
    for x in recs:
        shx += struct.pack(">II", off_words, (len(x) - 8) // 2)
        off_words += len(x) // 2
    with open(base + ".shx", "wb") as f:
        f.write(hdr[:24] + struct.pack(">I", (100 + len(shx)) // 2)
                + hdr[28:] + bytes(shx))
    # .dbf attributes
    fields = []
    for c in attrs:
        v = next((r[c] for r in rows if r[c] is not None), None)
        if isinstance(v, bool):
            fields.append((c[:10], "L", 1, 0))
        elif isinstance(v, int):
            fields.append((c[:10], "N", 18, 0))
        elif isinstance(v, float):
            fields.append((c[:10], "N", 24, 10))
        else:
            fields.append((c[:10], "C", 64, 0))
    rec_size = 1 + sum(f[2] for f in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    out = bytearray(struct.pack("<B3BIHH20x", 3, 0, 0, 0, len(rows),
                                hdr_size, rec_size))
    for name, t, ln, dec in fields:
        out += name.encode("ascii").ljust(11, b"\0") + t.encode("ascii") \
            + b"\0\0\0\0" + bytes([ln, dec]) + b"\0" * 14
    out += b"\x0d"
    for r in rows:
        out += b" "
        for (name, t, ln, dec), c in zip(fields, attrs):
            v = r[c]
            if v is None:
                out += b" " * ln
            elif t == "L":
                out += (b"T" if v else b"F")
            elif t == "N" and dec:
                out += f"{float(v):>{ln}.{dec}f}".encode("ascii")[:ln]
            elif t == "N":
                out += f"{int(v):>{ln}d}".encode("ascii")[:ln]
            else:
                out += str(v).encode("ascii", "replace")[:ln].ljust(ln)
    out += b"\x1a"
    with open(base + ".dbf", "wb") as f:
        f.write(bytes(out))
