"""LAS/LAZ point-cloud source — SURVEY §2.8.

Reference: /root/reference/rust/sedona-pointcloud/src/las/format.rs:58,132
(LAS registered as a read-only file format producing point rows with a
geometry column).  This is a from-scratch reader of the public ASPRS LAS
1.2-1.4 spec (point record formats 0-10; wave-packet tails skipped) — no
laspy dependency.

Scale design: `spark.read.format("binaryFile")` lists and reads the files
distributed (one task per file, executors do the IO), and a `mapInPandas`
kernel parses each file with a numpy structured dtype — zero-copy
`np.frombuffer` over the point block, so a 1000-executor cluster parses
1000 files concurrently.  LAZ (compressed) decodes natively through
sources/laz.py — BOTH the layered compressor 3 (PDRF 6-10 + extra
bytes, pinned bit-exact against the reference's own las/laz fixture
pairs) and the legacy pointwise compressor 2 (PDRF 0-5); pass
laz_strict=False to read_las to opt into unverified multi-return
decode.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LAS_SCHEMA = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("x", T.DoubleType()),
    T.StructField("y", T.DoubleType()),
    T.StructField("z", T.DoubleType()),
    T.StructField("intensity", T.IntegerType()),
    T.StructField("return_number", T.IntegerType()),
    T.StructField("classification", T.IntegerType()),
    T.StructField("point_source_id", T.IntegerType()),
    T.StructField("gps_time", T.DoubleType()),
    T.StructField("red", T.IntegerType()),
    T.StructField("green", T.IntegerType()),
    T.StructField("blue", T.IntegerType()),
    T.StructField("geometry", T.BinaryType()),
])

# point-record numpy dtypes per LAS point data format id.
# Formats 0-5: legacy 20-byte core (flags: return# in bits 0-2).
# Formats 6-10: LAS 1.4 30-byte core (returns: return# in bits 0-3,
# 16-bit scan angle, gps_time always present); RGB in 7/8/10, NIR in 8/10.
# Wave-packet tails (4/5/9/10) are skipped via the core-dtype prefix.
_BASE = [("X", "<i4"), ("Y", "<i4"), ("Z", "<i4"), ("intensity", "<u2"),
         ("flags", "u1"), ("classification", "u1"), ("scan_angle", "i1"),
         ("user_data", "u1"), ("point_source_id", "<u2")]
_RGB = [("red", "<u2"), ("green", "<u2"), ("blue", "<u2")]
_BASE14 = [("X", "<i4"), ("Y", "<i4"), ("Z", "<i4"), ("intensity", "<u2"),
           ("flags", "u1"), ("flags2", "u1"), ("classification", "u1"),
           ("user_data", "u1"), ("scan_angle", "<i2"),
           ("point_source_id", "<u2"), ("gps_time", "<f8")]
_FMT_DTYPES = {
    0: np.dtype(_BASE),
    1: np.dtype(_BASE + [("gps_time", "<f8")]),
    2: np.dtype(_BASE + _RGB),
    3: np.dtype(_BASE + [("gps_time", "<f8")] + _RGB),
    4: np.dtype(_BASE + [("gps_time", "<f8")]),          # + wave tail
    5: np.dtype(_BASE + [("gps_time", "<f8")] + _RGB),   # + wave tail
    6: np.dtype(_BASE14),
    7: np.dtype(_BASE14 + _RGB),
    8: np.dtype(_BASE14 + _RGB + [("nir", "<u2")]),
    9: np.dtype(_BASE14),                                # + wave tail
    10: np.dtype(_BASE14 + _RGB + [("nir", "<u2")]),     # + wave tail
}


def parse_las_header(buf: bytes) -> dict:
    """ASPRS LAS public header block (spec 1.2 §2; 1.4-compatible)."""
    if buf[:4] != b"LASF":
        raise ValueError("not a LAS file (missing LASF signature)")
    major, minor = buf[24], buf[25]
    header_size, = struct.unpack_from("<H", buf, 94)
    offset_to_points, = struct.unpack_from("<I", buf, 96)
    fmt = buf[104]
    compressed = bool(fmt & 0x80)      # laszip convention
    fmt &= 0x3F
    rec_len, = struct.unpack_from("<H", buf, 105)
    n_points, = struct.unpack_from("<I", buf, 107)
    sx, sy, sz, ox, oy, oz = struct.unpack_from("<6d", buf, 131)
    if major == 1 and minor >= 4 and n_points == 0:
        n_points, = struct.unpack_from("<Q", buf, 247)
    return {"version": (major, minor), "header_size": header_size,
            "offset": offset_to_points, "format": fmt, "rec_len": rec_len,
            "n_points": n_points, "scale": (sx, sy, sz),
            "origin": (ox, oy, oz), "compressed": compressed}


def parse_las_points(buf: bytes, laz_strict: bool = True) -> pd.DataFrame:
    """Whole-file bytes -> DataFrame of scaled points (vectorized).

    ``laz_strict=False`` opts into decoding LAZ files whose return
    numbers change mid-chunk (context tables unverified — see
    sources/laz.py)."""
    h = parse_las_header(buf)
    dt = _FMT_DTYPES.get(h["format"])
    if dt is None:
        raise ValueError(f"unsupported LAS point format {h['format']}")
    n = h["n_points"]
    if h["compressed"]:
        # native LAZ decode (sources/laz.py): layered-chunked compressor
        # covering PDRF 6-10 + extra bytes, pinned against the reference
        # repo's paired las/laz fixtures
        from sedona_db_spark.sources.laz import laz_decompress_points
        raw = np.frombuffer(laz_decompress_points(buf, h, strict=laz_strict),
                            dtype=np.uint8)
    else:
        raw = np.frombuffer(buf, dtype=np.uint8,
                            count=n * h["rec_len"], offset=h["offset"])
    # records may carry trailing extra bytes: keep the core-dtype prefix
    core = raw.reshape(n, h["rec_len"])[:, :dt.itemsize].tobytes()
    pts = np.frombuffer(core, dtype=dt)
    sx, sy, sz = h["scale"]
    ox, oy, oz = h["origin"]
    out = pd.DataFrame({
        "x": pts["X"] * sx + ox,
        "y": pts["Y"] * sy + oy,
        "z": pts["Z"] * sz + oz,
        "intensity": pts["intensity"].astype(np.int32),
        "return_number": (pts["flags"]
                          & (0x0F if h["format"] >= 6 else 0x07))
        .astype(np.int32),
        "classification": pts["classification"].astype(np.int32),
        "point_source_id": pts["point_source_id"].astype(np.int32),
        "gps_time": pts["gps_time"] if "gps_time" in dt.names else
        np.full(n, np.nan),
        "red": pts["red"].astype(np.int32) if "red" in dt.names else
        np.full(n, -1, dtype=np.int32),
        "green": pts["green"].astype(np.int32) if "green" in dt.names else
        np.full(n, -1, dtype=np.int32),
        "blue": pts["blue"].astype(np.int32) if "blue" in dt.names else
        np.full(n, -1, dtype=np.int32),
    })
    return out


def write_las(path: str, x, y, z, fmt: int = 0, scale: float = 0.001) -> None:
    """Minimal LAS 1.2 writer (test fixture / export path)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    n = len(x)
    dt = _FMT_DTYPES[fmt]
    header_size = 227
    rec = np.zeros(n, dtype=dt)
    rec["X"] = np.round(x / scale).astype(np.int64)
    rec["Y"] = np.round(y / scale).astype(np.int64)
    rec["Z"] = np.round(z / scale).astype(np.int64)
    hdr = bytearray(header_size)
    hdr[0:4] = b"LASF"
    hdr[24], hdr[25] = 1, 2
    struct.pack_into("<H", hdr, 94, header_size)
    struct.pack_into("<I", hdr, 96, header_size)
    hdr[104] = fmt
    struct.pack_into("<H", hdr, 105, dt.itemsize)
    struct.pack_into("<I", hdr, 107, n)
    struct.pack_into("<6d", hdr, 131, scale, scale, scale, 0.0, 0.0, 0.0)
    struct.pack_into("<6d", hdr, 179, float(x.max(initial=0)), float(x.min(initial=0)),
                     float(y.max(initial=0)), float(y.min(initial=0)),
                     float(z.max(initial=0)), float(z.min(initial=0)))
    with open(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(rec.tobytes())


def read_las(spark: SparkSession, path: str,
             with_geometry: bool = True,
             laz_strict: bool = True) -> DataFrame:
    """Distributed LAS read: binaryFile listing + per-file numpy parse.

    At 100 TB the file listing shards across executors and each file is
    parsed where it is read; no driver-side IO at all.  Remote URIs
    (http(s)/s3/gs/az, single or list) fetch executor-side through the
    object-store endpoint hooks (sources/remote.py).
    """
    from sedona_db_spark.geom import core
    from sedona_db_spark.sources.remote import is_remote, read_binary_remote

    if is_remote(path):
        files = read_binary_remote(spark, path)
    else:
        files = spark.read.format("binaryFile").load(path) \
            .select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                out = parse_las_points(bytes(row["content"]),
                                       laz_strict=laz_strict)
                out.insert(0, "path", row["path"])
                if with_geometry:
                    out["geometry"] = list(core.points_to_wkb_array(
                        out["x"].to_numpy(), out["y"].to_numpy()))
                else:
                    out["geometry"] = None
                yield out

    return files.mapInPandas(parse, LAS_SCHEMA)
