"""Native FlatGeobuf source/sink — SURVEY §2.8 vector formats.

Reference reads FlatGeobuf through pyogrio/GDAL (context.py:313); here
the format is implemented from the public spec (flatgeobuf.org, BSD
spec repo): magic bytes, a size-prefixed flatbuffers Header, an
optional packed Hilbert R-tree index (skipped on read via the spec's
node-count formula), then size-prefixed Feature records.

Includes a minimal flatbuffers runtime (back-to-front builder + vtable
reader) written from the public flatbuffers internals documentation —
only the subset the FGB schema needs (tables, scalar fields, vectors of
f64/u32/u8/tables, strings).

Spark plumbing: binaryFile payloads parsed executor-side, file-granular
parallelism (an FGB body is a single sequential stream, same unit the
reference's GDAL driver gets); the writer assembles one file
driver-side without an index (index_node_size=0 is spec-legal), which
suits export; spatially-sorted big outputs belong in GeoParquet.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from sedona_db_spark.geom import core
from sedona_db_spark.geom.core import Geom

MAGIC = b"fgb\x03fgb\x00"

# GeometryType enum (geometry.fbs)
_GT_POINT, _GT_LINESTRING, _GT_POLYGON = 1, 2, 3
_GT_MULTIPOINT, _GT_MULTILINESTRING, _GT_MULTIPOLYGON, _GT_GC = 4, 5, 6, 7
_GT_OF_CORE = {core.POINT: _GT_POINT, core.LINESTRING: _GT_LINESTRING,
               core.POLYGON: _GT_POLYGON, core.MULTIPOINT: _GT_MULTIPOINT,
               core.MULTILINESTRING: _GT_MULTILINESTRING,
               core.MULTIPOLYGON: _GT_MULTIPOLYGON,
               core.GEOMETRYCOLLECTION: _GT_GC}

# ColumnType enum (header.fbs)
_CT_BOOL, _CT_LONG, _CT_DOUBLE, _CT_STRING = 2, 7, 10, 11


# ---------------------------------------------------------------- read


def _u16(b, o):
    return struct.unpack_from("<H", b, o)[0]


def _u32(b, o):
    return struct.unpack_from("<I", b, o)[0]


def _i32(b, o):
    return struct.unpack_from("<i", b, o)[0]


class _Tbl:
    """flatbuffers table accessor (vtable-indirected fields)."""

    __slots__ = ("b", "pos", "vt", "vt_size")

    def __init__(self, b: bytes, pos: int):
        self.b = b
        self.pos = pos
        self.vt = pos - _i32(b, pos)
        self.vt_size = _u16(b, self.vt)

    def _slot(self, fid: int) -> int:
        o = 4 + fid * 2
        if o + 2 > self.vt_size:
            return 0
        rel = _u16(self.b, self.vt + o)
        return self.pos + rel if rel else 0

    def scalar(self, fid: int, fmt: str, default):
        o = self._slot(fid)
        return struct.unpack_from("<" + fmt, self.b, o)[0] if o else default

    def _indirect(self, fid: int):
        o = self._slot(fid)
        return o + _u32(self.b, o) if o else None

    def string(self, fid: int):
        v = self._indirect(fid)
        if v is None:
            return None
        n = _u32(self.b, v)
        return self.b[v + 4:v + 4 + n].decode("utf-8")

    def vec_len(self, fid: int) -> int:
        v = self._indirect(fid)
        return _u32(self.b, v) if v is not None else 0

    def vec_f64(self, fid: int):
        v = self._indirect(fid)
        if v is None:
            return np.empty(0)
        n = _u32(self.b, v)
        return np.frombuffer(self.b, dtype="<f8", count=n, offset=v + 4)

    def vec_u32(self, fid: int):
        v = self._indirect(fid)
        if v is None:
            return np.empty(0, dtype=np.uint32)
        n = _u32(self.b, v)
        return np.frombuffer(self.b, dtype="<u4", count=n, offset=v + 4)

    def vec_u8(self, fid: int):
        v = self._indirect(fid)
        if v is None:
            return b""
        n = _u32(self.b, v)
        return self.b[v + 4:v + 4 + n]

    def vec_tables(self, fid: int):
        v = self._indirect(fid)
        if v is None:
            return []
        n = _u32(self.b, v)
        out = []
        for i in range(n):
            eo = v + 4 + i * 4
            out.append(_Tbl(self.b, eo + _u32(self.b, eo)))
        return out

    def table(self, fid: int):
        v = self._indirect(fid)
        return _Tbl(self.b, v) if v is not None else None


def _packed_rtree_size(num_items: int, node_size: int) -> int:
    """Byte size of the packed Hilbert R-tree (spec: 40-byte nodes,
    level sizes from repeatedly ceil-dividing by the node size)."""
    if node_size < 2 or num_items == 0:
        return 0
    n = num_items
    total = n
    # spec uses do-while: even num_items == 1 gets a root level (leaf +
    # root = 80 bytes), otherwise a single-feature indexed file would
    # mis-offset the feature stream by 40 bytes
    while True:
        n = math.ceil(n / node_size)
        total += n
        if n == 1:
            break
    return total * 40


def _geom_from_fgb(t: _Tbl | None, header_type: int, has_z: bool) -> Geom | None:
    if t is None:
        return None
    gtype = t.scalar(6, "B", 0) or header_type
    xy = t.vec_f64(1)
    pts = np.asarray(xy, dtype=np.float64).reshape(-1, 2)
    ends = t.vec_u32(0)
    if gtype == _GT_POINT:
        if len(pts) == 0:
            return Geom(core.POINT, None)
        return Geom(core.POINT, pts[0].copy())
    if gtype == _GT_MULTIPOINT:
        return Geom(core.MULTIPOINT, [p.copy() for p in pts])
    if gtype == _GT_LINESTRING:
        return Geom(core.LINESTRING, pts.copy())
    if gtype in (_GT_POLYGON, _GT_MULTILINESTRING):
        bounds = [0] + [int(e) for e in ends] if len(ends) else [0, len(pts)]
        if len(ends):
            bounds = [0] + [int(e) for e in ends]
        rings = [pts[bounds[i]:bounds[i + 1]].copy()
                 for i in range(len(bounds) - 1)]
        if gtype == _GT_POLYGON:
            return Geom(core.POLYGON, rings)
        return Geom(core.MULTILINESTRING, rings)
    if gtype == _GT_MULTIPOLYGON:
        parts = [_geom_from_fgb(p, _GT_POLYGON, has_z) for p in t.vec_tables(7)]
        return Geom(core.MULTIPOLYGON, [p.data for p in parts])
    if gtype == _GT_GC:
        return Geom(core.GEOMETRYCOLLECTION,
                    [_geom_from_fgb(p, 0, has_z) for p in t.vec_tables(7)])
    raise NotImplementedError(f"FlatGeobuf geometry type {gtype}")


_PROP_FMT = {0: ("b", 1), 1: ("B", 1), 3: ("h", 2), 4: ("H", 2),
             5: ("i", 4), 6: ("I", 4), 7: ("q", 8), 8: ("Q", 8),
             9: ("f", 4), 10: ("d", 8)}


def _parse_properties(raw: bytes, col_types: list[int]) -> dict[int, object]:
    out: dict[int, object] = {}
    pos = 0
    n = len(raw)
    while pos + 2 <= n:
        ci = _u16(raw, pos)
        pos += 2
        ct = col_types[ci]
        if ct == _CT_BOOL:
            out[ci] = bool(raw[pos])
            pos += 1
        elif ct in _PROP_FMT:
            fmt, sz = _PROP_FMT[ct]
            out[ci] = struct.unpack_from("<" + fmt, raw, pos)[0]
            pos += sz
        elif ct in (_CT_STRING, 12, 13, 14):  # string/json/datetime/binary
            ln = _u32(raw, pos)
            pos += 4
            val = raw[pos:pos + ln]
            pos += ln
            out[ci] = val if ct == 14 else val.decode("utf-8")
        else:
            raise NotImplementedError(f"FlatGeobuf column type {ct}")
    return out


def parse_fgb(data: bytes):
    """-> (columns [(name, ColumnType)], iterator of (props dict, Geom))."""
    data = bytes(data)
    if data[:8] != MAGIC[:8]:
        raise ValueError("not a FlatGeobuf file (bad magic)")
    pos = 8
    hsize = _u32(data, pos)
    pos += 4
    header = _Tbl(data, pos + _u32(data, pos))
    geom_type = header.scalar(2, "B", 0)
    has_z = bool(header.scalar(3, "?", False))
    cols = [(c.string(0), c.scalar(1, "B", 0))
            for c in header.vec_tables(7)]
    feat_count = header.scalar(8, "Q", 0)
    node_size = header.scalar(9, "H", 16)
    pos += hsize
    pos += _packed_rtree_size(feat_count, node_size)
    col_types = [c[1] for c in cols]

    def features():
        p = pos
        while p + 4 <= len(data):
            fsize = _u32(data, p)
            if fsize == 0:
                break
            fp = p + 4
            feat = _Tbl(data, fp + _u32(data, fp))
            props = _parse_properties(feat.vec_u8(1), col_types)
            g = _geom_from_fgb(feat.table(0), geom_type, has_z)
            yield props, g
            p = fp + fsize

    return cols, features()


# --------------------------------------------------------------- build


class _FBB:
    """Minimal back-to-front flatbuffers builder (tables, strings,
    f64/u32/u8/table vectors).  Distances are measured from the file
    end; uoffset = d_field - d_target."""

    def __init__(self):
        self.buf = bytearray()

    def _prepend(self, raw: bytes):
        self.buf[:0] = raw

    def _align(self, align: int, extra: int = 0):
        # pad so that (len + extra) % align == 0 after the next prepend
        while (len(self.buf) + extra) % align != 0:
            self._prepend(b"\0")

    def ref(self) -> int:
        return len(self.buf)

    def string(self, s: str) -> int:
        raw = s.encode("utf-8") + b"\0"
        self._align(4, 4 + len(raw))
        self._prepend(struct.pack("<I", len(raw) - 1) + raw)
        return self.ref()

    def vector_f64(self, vals) -> int:
        raw = np.asarray(vals, dtype="<f8").tobytes()
        self._align(8, 4 + len(raw) + 4)  # keep elements 8-aligned
        self._prepend(struct.pack("<I", len(raw) // 8) + raw)
        return self.ref()

    def vector_u32(self, vals) -> int:
        raw = np.asarray(vals, dtype="<u4").tobytes()
        self._align(4, 4 + len(raw))
        self._prepend(struct.pack("<I", len(raw) // 4) + raw)
        return self.ref()

    def vector_u8(self, raw: bytes) -> int:
        self._align(4, 4 + len(raw))
        self._prepend(struct.pack("<I", len(raw)) + raw)
        return self.ref()

    def vector_tables(self, refs: list[int]) -> int:
        self._align(4, 4 + 4 * len(refs))
        body = bytearray(struct.pack("<I", len(refs)))
        base = len(self.buf) + 4 + 4 * len(refs)  # d of the vector start
        for i, r in enumerate(refs):
            d_field = base - (4 + i * 4)
            body += struct.pack("<I", d_field - r)
        self._prepend(bytes(body))
        return self.ref()

    def table(self, fields: list[tuple[int, str, object]]) -> int:
        """fields: (fid, kind, value); kind 'u8'/'u16'/'u64'/'bool' scalar,
        'off' = reference returned by another create call."""
        sizes = {"u8": 1, "bool": 1, "u16": 2, "u32": 4, "u64": 8, "off": 4}
        fields = sorted(fields, key=lambda f: f[0])
        # slot layout after the 4-byte soffset, in field order
        rel = 4
        slots = {}
        for fid, kind, _ in fields:
            sz = sizes[kind]
            rel = (rel + sz - 1) // sz * sz
            slots[fid] = (rel, kind)
            rel += sz
        tsize = rel
        self._align(8, tsize)
        body = bytearray(b"\0" * tsize)
        d_start = len(self.buf) + tsize  # distance-from-end of table start
        for fid, kind, val in fields:
            r, _k = slots[fid]
            if kind == "off":
                d_field = d_start - r
                struct.pack_into("<I", body, r, d_field - val)
            else:
                fmt = {"u8": "B", "bool": "?", "u16": "H", "u32": "I",
                       "u64": "Q"}[kind]
                struct.pack_into("<" + fmt, body, r, val)
        self._prepend(bytes(body))
        d_table = self.ref()
        # vtable: u16 vt_size, u16 table_size, u16 slot per max fid
        nslots = (max(f[0] for f in fields) + 1) if fields else 0
        vt = bytearray(struct.pack("<HH", 4 + nslots * 2, tsize))
        vt += b"\0" * (nslots * 2)
        for fid, _kind, _v in fields:
            struct.pack_into("<H", vt, 4 + fid * 2, slots[fid][0])
        self._align(2)
        self._prepend(bytes(vt))
        d_vt = self.ref()
        # patch the soffset at table start: table_pos - vt_pos = d_vt - d_table
        soff_pos = len(self.buf) - d_table
        struct.pack_into("<i", self.buf, soff_pos, d_vt - d_table)
        return d_table

    def finish_size_prefixed(self, root: int) -> bytes:
        self._align(8, 4)
        # the root uoffset is relative to its own location, which after
        # this prepend sits at distance len+4 from the end
        self._prepend(struct.pack("<I", len(self.buf) + 4 - root))
        total = len(self.buf)
        out = struct.pack("<I", total) + bytes(self.buf)
        return out


def _geom_to_fgb(b: _FBB, g: Geom) -> int:
    fields: list[tuple[int, str, object]] = [(6, "u8", _GT_OF_CORE[g.gt])]
    if g.gt == core.POINT:
        xy = [] if g.data is None else [float(g.data[0]), float(g.data[1])]
        if xy:
            fields.append((1, "off", b.vector_f64(xy)))
    elif g.gt in (core.LINESTRING, core.MULTIPOINT):
        arr = np.asarray(g.data if g.gt == core.LINESTRING
                         else [p[:2] for p in g.data], dtype=np.float64)
        fields.append((1, "off", b.vector_f64(arr[:, :2].ravel())))
    elif g.gt in (core.POLYGON, core.MULTILINESTRING):
        rings = [np.asarray(r, dtype=np.float64)[:, :2] for r in g.data]
        ends = np.cumsum([len(r) for r in rings]).astype(np.uint32)
        fields.append((0, "off", b.vector_u32(ends)))
        fields.append((1, "off", b.vector_f64(np.vstack(rings).ravel())))
    elif g.gt == core.MULTIPOLYGON:
        parts = [_geom_to_fgb(b, Geom(core.POLYGON, p)) for p in g.data]
        fields.append((7, "off", b.vector_tables(parts)))
    elif g.gt == core.GEOMETRYCOLLECTION:
        parts = [_geom_to_fgb(b, sub) for sub in g.data]
        fields.append((7, "off", b.vector_tables(parts)))
    else:
        raise NotImplementedError(f"FlatGeobuf write for {g.gt}")
    return b.table(fields)


def _spark_col_type(dt: T.DataType) -> int:
    if isinstance(dt, T.BooleanType):
        return _CT_BOOL
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return _CT_LONG
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return _CT_DOUBLE
    return _CT_STRING


def write_flatgeobuf(df: DataFrame, path: str, geom_col: str = "geom",
                     name: str = "layer", max_rows: int | None = None) -> None:
    """Driver-side single-file FGB export, no spatial index
    (index_node_size=0 — spec-legal, what GDAL calls SPATIAL_INDEX=NO).
    Guarded: raises beyond the driver-safe row cap — pass max_rows to
    override."""
    from sedona_db_spark.sources.guards import (
        DEFAULT_MAX_DRIVER_ROWS, guard_driver_collect)
    guard_driver_collect(df, "FlatGeobuf",
                         DEFAULT_MAX_DRIVER_ROWS if max_rows is None else max_rows)
    rows = df.collect()
    attrs = [(f.name, _spark_col_type(f.dataType))
             for f in df.schema.fields if f.name != geom_col]

    out = bytearray(MAGIC)
    hb = _FBB()
    col_refs = []
    for cname, ct in attrs:
        nref = hb.string(cname)
        col_refs.append(hb.table([(0, "off", nref), (1, "u8", ct)]))
    hfields = [(0, "off", hb.string(name)),
               (2, "u8", 0),  # Unknown geometry type (mixed allowed)
               (8, "u64", len(rows)),
               (9, "u16", 0)]  # no index
    if col_refs:
        hfields.insert(1, (7, "off", hb.vector_tables(col_refs)))
    out += hb.finish_size_prefixed(hb.table(hfields))

    for r in rows:
        fb = _FBB()
        props = bytearray()
        for ci, (cname, ct) in enumerate(attrs):
            v = r[cname]
            if v is None:
                continue
            props += struct.pack("<H", ci)
            if ct == _CT_BOOL:
                props += struct.pack("<?", bool(v))
            elif ct == _CT_LONG:
                props += struct.pack("<q", int(v))
            elif ct == _CT_DOUBLE:
                props += struct.pack("<d", float(v))
            else:
                raw = str(v).encode("utf-8")
                props += struct.pack("<I", len(raw)) + raw
        ffields = []
        wkb = r[geom_col]
        if wkb is not None:
            g = core.from_wkb(bytes(wkb))
            ffields.append((0, "off", _geom_to_fgb(fb, g)))
        if props:
            ffields.append((1, "off", fb.vector_u8(bytes(props))))
        out += fb.finish_size_prefixed(fb.table(ffields))

    import os
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(bytes(out))


# -------------------------------------------------------------- reader


_CT_SPARK = {_CT_BOOL: T.BooleanType(), _CT_LONG: T.LongType(),
             _CT_DOUBLE: T.DoubleType(), _CT_STRING: T.StringType(),
             0: T.LongType(), 1: T.LongType(), 3: T.LongType(),
             4: T.LongType(), 5: T.LongType(), 6: T.LongType(),
             8: T.LongType(), 9: T.DoubleType(), 12: T.StringType(),
             13: T.StringType(), 14: T.BinaryType()}


def read_flatgeobuf(spark: SparkSession, path: str,
                    geom_col: str = "geom") -> DataFrame:
    """Distributed FGB read: (property columns..., geom WKB)."""
    from sedona_db_spark.sources.remote import is_remote, read_binary_remote
    if is_remote(path):
        files = read_binary_remote(spark, path).select("content")
    else:
        files = spark.read.format("binaryFile") \
            .option("pathGlobFilter", "*.fgb").load(path).select("content")
    head = files.limit(1).collect()
    if not head:
        raise FileNotFoundError(f"no .fgb files under {path}")
    cols, _ = parse_fgb(bytes(head[0]["content"]))
    fields = [T.StructField(n, _CT_SPARK.get(t, T.StringType()))
              for n, t in cols]
    schema = T.StructType(fields + [T.StructField(geom_col, T.BinaryType())])
    names = [f.name for f in schema.fields]

    def parse(batches):
        for pdf in batches:
            rows = []
            for payload in pdf["content"]:
                _c, feats = parse_fgb(bytes(payload))
                for props, g in feats:
                    vals = [props.get(i) for i in range(len(names) - 1)]
                    vals.append(None if g is None else core.to_wkb(g))
                    rows.append(tuple(vals))
            yield pd.DataFrame(rows, columns=names)

    return files.mapInPandas(parse, schema=schema)
