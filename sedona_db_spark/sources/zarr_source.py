"""Zarr v2/v3 datacube source — SURVEY §2.8.

Reference: /root/reference/rust/sedona-raster-zarr (directory-shaped URL
table producing raster rows; docs/working-with-zarr-ndarray-sedonadb.md).
This is a from-scratch reader of the public Zarr storage specs: v2
(`.zarray` JSON + dot-named chunk files) and v3 (`zarr.json` + c/-prefixed
chunk keys, bytes/gzip/zlib codecs), supporting raw, zlib, gzip, zstd
(libzstd via ctypes when present, else the pure-python RFC 8878 decoder in
zstd_native.py), lzma/bz2 (stdlib), and blosc containers per the public
c-blosc layout (split sub-streams, per-block byte-shuffle; inner codecs
blosclz, lz4, snappy via the pyarrow-validated native decoder, zlib,
zstd) — no zarr-python or numcodecs dependency.  blosclz is decoded by
the repo's own FastLZ-derivative coder (sources/blosclz_native.py; see
its oracle-status note — no in-container blosclz producer exists).

Scale design: chunk decoding happens per-(chunk, band) task — the chunk
list is parallelized across executors so a petabyte datacube fans out to
one task per chunk, and each output row is one raster tile struct (the
same tile-per-row layout RS_Tile produces).
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from sedona_db_spark.functions import raster as rs

_DTYPES = {
    "<f8": ("float64", np.dtype("<f8")), "<f4": ("float32", np.dtype("<f4")),
    "<i8": ("int64", np.dtype("<i8")), "<i4": ("int32", np.dtype("<i4")),
    "<i2": ("int16", np.dtype("<i2")), "|u1": ("uint8", np.dtype("|u1")),
    "<u2": ("uint16", np.dtype("<u2")), "<u4": ("uint32", np.dtype("<u4")),
}


_V3_DTYPES = {
    "float64": "<f8", "float32": "<f4", "int64": "<i8", "int32": "<i4",
    "int16": "<i2", "uint8": "|u1", "uint16": "<u2", "uint32": "<u4",
}


def _normalize_v3(meta: dict) -> dict:
    """Zarr v3 zarr.json -> the v2-shaped meta dict the reader uses."""
    grid = meta.get("chunk_grid", {})
    if grid.get("name") != "regular":
        raise NotImplementedError("only regular chunk grids are supported")
    dt = _V3_DTYPES.get(meta.get("data_type"))
    if dt is None:
        raise NotImplementedError(f"zarr v3 data_type {meta.get('data_type')!r}")
    comp = None
    for codec in meta.get("codecs", []):
        name = codec.get("name")
        if name == "bytes":
            if codec.get("configuration", {}).get("endian", "little") != "little":
                dt = ">" + dt[1:] if dt[0] in "<|" else dt
        elif name in ("gzip", "zlib", "blosc", "zstd"):
            comp = {"id": name}
        elif name == "transpose":
            raise NotImplementedError("zarr v3 transpose codec unsupported")
        else:
            raise NotImplementedError(
                f"zarr v3 codec {name!r} needs numcodecs (bytes/gzip/zlib/"
                "zstd/blosc are supported natively)")
    key = meta.get("chunk_key_encoding", {"name": "default"})
    sep = key.get("configuration", {}).get("separator", "/")
    return {
        "zarr_format": 3, "shape": meta["shape"],
        "chunks": grid["configuration"]["chunk_shape"], "dtype": dt,
        "order": "C", "compressor": comp,
        "fill_value": meta.get("fill_value"),
        "_v3_key": (key.get("name", "default"), sep),
    }


def _is_remote(store: str) -> bool:
    from sedona_db_spark.sources.remote import is_remote
    return is_remote(store)


def _remote_fetch_or_none(uri: str, snapshot=None):
    """Object-store / http chunk fetch through the shared out-of-DB
    loader (sources/remote.py: LRU byte cache, retries,
    scheme->endpoint hooks); None ONLY for a definitive HTTP 404/410
    (absent chunk -> fill value).  Timeouts, 5xx and auth failures
    PROPAGATE — substituting fill values for transient errors would
    silently corrupt the cube."""
    from sedona_db_spark.sources.remote import _fetch_with
    try:
        return _fetch_with(snapshot, uri)
    except FileNotFoundError:
        return None


def _join(base: str, *parts: str) -> str:
    if _is_remote(base):
        return "/".join([base.rstrip("/")] + [p for p in parts if p])
    return os.path.join(base, *[p for p in parts if p])


def read_zarray_meta(store: str, array: str = "") -> dict:
    """Array metadata: Zarr v2 `.zarray` or v3 `zarr.json`, normalized
    to one dict shape (reference surface: rust/sedona-raster-zarr).
    ``store`` may be a local directory or an http(s)/s3/gs/az URL
    (object-store schemes resolve through the registered endpoint
    hooks, exactly like out-of-DB raster bands)."""
    base = _join(store, array)

    def load(name):
        if _is_remote(store):
            raw = _remote_fetch_or_none(_join(base, name))
            return None if raw is None else json.loads(raw)
        p = os.path.join(base, name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    meta = load(".zarray")
    if meta is not None:
        if meta.get("zarr_format") != 2:
            raise ValueError("unrecognized .zarray zarr_format")
    else:
        raw = load("zarr.json")
        if raw is None:
            raise FileNotFoundError(f"no .zarray or zarr.json under {base}")
        if raw.get("zarr_format") != 3 or raw.get("node_type") != "array":
            raise ValueError("zarr.json is not a v3 array node")
        meta = _normalize_v3(raw)
    if meta.get("order", "C") != "C":
        raise ValueError("only C-order chunks are supported")
    comp = meta.get("compressor")
    if comp is not None and comp.get("id") not in ("zlib", "gzip", "blosc",
                                                   "zstd", "lzma", "bz2"):
        raise NotImplementedError(
            f"compressor {comp.get('id')!r} needs numcodecs (zlib/gzip/zstd/"
            "lzma/bz2/blosc-{lz4,snappy,zlib,zstd}/raw are native)")
    return meta


def _decode_chunk(raw: bytes, meta: dict) -> np.ndarray:
    comp = meta.get("compressor")
    if comp is not None:
        if comp["id"] == "blosc":
            raw = blosc_decompress(raw)
        elif comp["id"] == "zstd":
            from sedona_db_spark.sources.zstd_native import zstd_decompress
            raw = zstd_decompress(raw)
        elif comp["id"] == "lzma":
            import lzma
            raw = lzma.decompress(raw)
        elif comp["id"] == "bz2":
            import bz2
            raw = bz2.decompress(raw)
        else:
            raw = zlib.decompress(raw, 47 if comp["id"] == "gzip" else 15)
    _, npdt = _DTYPES[meta["dtype"]]
    return np.frombuffer(raw, dtype=npdt).reshape(meta["chunks"])


def list_chunks(store: str, array: str = "",
                meta: dict | None = None) -> list[tuple[str, tuple]]:
    """[(chunk_path, chunk_index)] for every materialized chunk file.

    v2 keys are dot-joined file names ("1.2"); v3 default encoding nests
    under a "c" prefix with a separator ("c/1/2"), v2-style encoding in
    v3 uses dot names.

    Remote stores are never LISTED (object stores have no cheap
    directory walk): the chunk grid is derived from shape/chunks and
    every grid key is emitted — absent chunks resolve to the array's
    fill value at read time, which is Zarr's own semantics for
    unwritten chunks."""
    base = _join(store, array)
    if _is_remote(store):
        if meta is None:
            raise ValueError("remote zarr stores need the array metadata")
        import itertools
        grid = [-(-s // c) for s, c in zip(meta["shape"], meta["chunks"])]
        v3key = meta.get("_v3_key")
        sep = meta.get("dimension_separator", ".")
        out = []
        for idx in itertools.product(*(range(g) for g in grid)):
            if v3key is not None and v3key[0] == "default":
                key = "c" + v3key[1] + v3key[1].join(str(i) for i in idx)
            else:
                key = sep.join(str(i) for i in idx)
            out.append((_join(base, key), idx))
        return out
    out = []
    v3key = (meta or {}).get("_v3_key")
    if v3key is not None and v3key[0] == "default":
        croot = os.path.join(base, "c")
        if not os.path.isdir(croot):
            return []
        for dirpath, _dirs, files in os.walk(croot):
            for name in sorted(files):
                rel = os.path.relpath(os.path.join(dirpath, name), croot)
                parts = rel.replace(os.sep, "/").split("/")
                try:
                    idx = tuple(int(p) for p in parts)
                except ValueError:
                    continue
                out.append((os.path.join(dirpath, name), idx))
        out.sort(key=lambda t: t[1])
        return out
    for name in sorted(os.listdir(base)):
        if name.startswith(".") or name == "zarr.json":
            continue
        try:
            idx = tuple(int(p) for p in name.split("."))
        except ValueError:
            continue
        out.append((os.path.join(base, name), idx))
    return out


def read_zarr(spark: SparkSession, store: str, array: str = "",
              transform: list[float] | None = None,
              crs: str = "EPSG:4326") -> DataFrame:
    """Zarr array -> DataFrame of raster-tile rows (one row per 2-D chunk).

    2-D arrays -> single-band tiles; 3-D arrays (band/time leading axis)
    -> one band per leading index within the chunk.  `transform` is the
    whole-array GDAL GeoTransform; per-tile transforms are derived by
    offsetting the origin to the chunk position.
    """
    meta = read_zarray_meta(store, array)
    shape, chunks = meta["shape"], meta["chunks"]
    nd = len(shape)
    if nd not in (2, 3):
        raise ValueError("only 2-D or 3-D zarr arrays map to raster tiles")
    t = transform or [0.0, 1.0, 0.0, 0.0, 0.0, -1.0]
    dtname, _ = _DTYPES[meta["dtype"]]
    fill = meta.get("fill_value")
    chunk_list = list_chunks(store, array, meta)

    remote = _is_remote(store)
    # ship the driver's object-store endpoint registrations to the
    # executors in the map closure (same pattern as raster.ensure_loaded:
    # driver-side register_*_endpoint() calls after JVM launch would
    # otherwise never reach the python workers)
    if remote:
        from sedona_db_spark.functions.raster import _OBJSTORE_ENDPOINTS
        ep_snapshot = {sc: dict(tbl)
                       for sc, tbl in _OBJSTORE_ENDPOINTS.items() if tbl}
    else:
        ep_snapshot = None

    def one(item):
        path, idx = item
        if remote:
            raw = _remote_fetch_or_none(path, ep_snapshot)
        else:
            with open(path, "rb") as f:
                raw = f.read()
        if raw is None:
            # unwritten chunk in an object store: Zarr semantics say the
            # region holds the fill value
            _, npdt = _DTYPES[meta["dtype"]]
            arr = np.full(meta["chunks"], fill if fill is not None else 0,
                          dtype=npdt)
        else:
            arr = _decode_chunk(raw, meta)
        if nd == 2:
            cy, cx = idx
            bands_nd = arr[None, ...]
        else:
            cb, cy, cx = idx[0], idx[-2], idx[-1]
            bands_nd = arr
        h, w = bands_nd.shape[-2], bands_nd.shape[-1]
        py0 = cy * chunks[-2]
        px0 = cx * chunks[-1]
        # clip partial edge chunks to the array shape
        h = min(h, shape[-2] - py0)
        w = min(w, shape[-1] - px0)
        bands = []
        for bi in range(bands_nd.shape[0]):
            name = f"band_{idx[0] * chunks[0] + bi + 1}" if nd == 3 else "band_1"
            bands.append((name, dtname, np.ascontiguousarray(
                bands_nd[bi, :h, :w])))
        row = rs.make_raster_row(
            w, h,
            ulx=t[0] + px0 * t[1] + py0 * t[2],
            uly=t[3] + px0 * t[4] + py0 * t[5],
            scale_x=t[1], scale_y=t[5], skew_x=t[2], skew_y=t[4],
            crs=crs, bands=bands)
        if fill is not None:
            for b in row["bands"]:
                b["nodata"] = float(fill)
        return (path, list(idx), row)

    schema = T.StructType([
        T.StructField("chunk_path", T.StringType()),
        T.StructField("chunk_index", T.ArrayType(T.LongType())),
        T.StructField("raster", rs.RASTER_TYPE),
    ])
    rdd = spark.sparkContext.parallelize(
        chunk_list, max(1, min(len(chunk_list), 256))).map(one)
    return spark.createDataFrame(rdd, schema)


# ----------------------------------------------------------------------
# Blosc container + LZ4 block codec (native) — the zarr-python default
# compressor (blosc cname='lz4' + byte shuffle), implemented from the
# public c-blosc container layout and LZ4 block format descriptions.
# Inner codecs supported: blosclz, lz4, zlib, zstd, snappy,
# memcpyed/raw blocks.
# ----------------------------------------------------------------------

def lz4_block_decompress(src: bytes, dst_size: int) -> bytes:
    """LZ4 *block* format decoder (token / literals / offset+match)."""
    out = bytearray()
    pos = 0
    n = len(src)
    while pos < n and len(out) < dst_size:
        token = src[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        out += src[pos:pos + lit]
        pos += lit
        if pos >= n:
            break  # last sequence: literals only
        offset = src[pos] | (src[pos + 1] << 8)
        pos += 2
        mlen = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = src[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        start = len(out) - offset
        if offset == 0:
            raise ValueError("corrupt LZ4 stream (zero offset)")
        for i in range(mlen):  # byte-wise: overlapping copies are the point
            out.append(out[start + i])
    return bytes(out)


def _unshuffle(raw: bytes, typesize: int) -> bytes:
    if typesize <= 1 or len(raw) % typesize:
        return raw
    n = len(raw) // typesize
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(typesize, n)
    return np.ascontiguousarray(arr.T).tobytes()


def bit_shuffle(raw: bytes, typesize: int) -> bytes:
    """Bitshuffle filter forward transform (for fixtures/tests).

    The on-disk layout is the transpose of the [n_elements, typesize*8]
    bit matrix with LSB-first bit order, columns ordered (byte, bit) —
    verified equivalent to a faithful translation of the public
    bitshuffle scalar kernel chain (bshuf_trans_byte_elem +
    TRANS_BIT_8X8 + bshuf_trans_bitrow_eight) for every element size.
    Per c-blosc's bitshuffle(): only the leading multiple-of-8 element
    count is transformed; leftover bytes are appended unfiltered."""
    if typesize < 1 or len(raw) % typesize:
        return raw
    n = len(raw) // typesize
    n8 = n - (n % 8)
    if n8 == 0:
        return raw
    body = np.frombuffer(raw[:n8 * typesize], np.uint8).reshape(n8, typesize)
    bits = np.unpackbits(body, axis=1, bitorder="little")      # [n8, t*8]
    out = np.packbits(np.ascontiguousarray(bits.T), axis=1,
                      bitorder="little")                       # [t*8, n8/8]
    return out.tobytes() + raw[n8 * typesize:]


def _bit_unshuffle(raw: bytes, typesize: int) -> bytes:
    """Inverse of :func:`bit_shuffle` (the decompression-side filter)."""
    if typesize < 1 or len(raw) % typesize:
        return raw
    n = len(raw) // typesize
    n8 = n - (n % 8)
    if n8 == 0:
        return raw
    body = np.frombuffer(raw[:n8 * typesize], np.uint8) \
             .reshape(typesize * 8, n8 // 8)
    bits = np.unpackbits(body, axis=1, bitorder="little")      # [t*8, n8]
    out = np.packbits(np.ascontiguousarray(bits.T), axis=1,
                      bitorder="little")                       # [n8, t]
    return out.tobytes() + raw[n8 * typesize:]


def blosc_decompress(src: bytes) -> bytes:
    """Blosc1 chunk -> raw bytes, per the public c-blosc container spec
    (README_HEADER.rst + blosc.c):

    - flags bit 0 byte-shuffle, bit 1 pure-memcpy, bit 2 bit-shuffle,
      bit 4 blocks-not-split, bits 5-7 compressor code
      (0 blosclz, 1 lz4/lz4hc, 2 snappy, 3 zlib, 4 zstd);
    - memcpyed chunks store the ORIGINAL buffer (no filters applied);
    - each block is independently filtered: split into ``typesize``
      sub-streams (unless bit 4 set or it is the partial last block),
      each sub-stream prefixed by an int32 compressed-size (equal to
      the sub-stream size when stored raw), and byte-unshuffled PER
      BLOCK after reassembly."""
    import struct as _st
    if len(src) < 16:
        raise ValueError("truncated blosc chunk")
    _version, _versionlz, flags, typesize = src[0], src[1], src[2], src[3]
    nbytes, blocksize, _cbytes = _st.unpack_from("<III", src, 4)
    codec = flags >> 5
    shuffled = bool(flags & 0x1)
    bitshuffled = bool(flags & 0x4)
    dont_split = bool(flags & 0x10)
    if flags & 0x2:  # memcpyed: payload is the raw original buffer
        return src[16:16 + nbytes]

    def inner(payload: bytes, out_size: int) -> bytes:
        if codec == 0:       # blosclz
            from sedona_db_spark.sources.blosclz_native import (
                blosclz_decompress)
            return blosclz_decompress(payload, out_size)
        if codec == 1:       # lz4 / lz4hc
            return lz4_block_decompress(payload, out_size)
        if codec == 2:       # snappy (raw block format)
            from sedona_db_spark.sources.snappy_native import (
                snappy_decompress)
            return snappy_decompress(payload)
        if codec == 3:       # zlib
            return zlib.decompress(payload)
        if codec == 4:       # zstd
            from sedona_db_spark.sources.zstd_native import zstd_decompress
            return zstd_decompress(payload, out_size)
        raise NotImplementedError(
            f"unknown blosc inner codec id {codec} "
            "(blosclz/lz4/snappy/zlib/zstd/raw are supported)")

    nblocks = (nbytes + blocksize - 1) // blocksize if blocksize else 1
    bstarts = _st.unpack_from("<%dI" % nblocks, src, 16)
    raw = bytearray()
    for i, off in enumerate(bstarts):
        block_nb = min(blocksize, nbytes - i * blocksize)
        leftover = block_nb != blocksize
        nsplits = (typesize if (not dont_split and not leftover
                                and typesize > 1) else 1)
        neblock = block_nb // nsplits
        block = bytearray()
        for _ in range(nsplits):
            (scb,) = _st.unpack_from("<i", src, off)
            off += 4
            payload = src[off:off + scb]
            off += scb
            block += payload if scb == neblock else inner(payload, neblock)
        if shuffled:
            block = _unshuffle(bytes(block), typesize)
        elif bitshuffled:
            block = _bit_unshuffle(bytes(block), typesize)
        raw += block
    return bytes(raw)
