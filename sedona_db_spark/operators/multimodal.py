"""Multimodal (image/audio/video) column plumbing.

Design copied from the geometry type decision (SURVEY.md §1.3): opaque
`binary` payload + typed metadata struct riding column metadata.

Decode is REAL without external libraries: PCM WAV (stdlib `wave`),
netpbm P5/P6 incl. 16-bit, uncompressed BMP, PNG (all color types,
depths 1-16, Adam7 — libpng-parity-tested), JPEG (baseline +
progressive, libjpeg-cross-validated native codec) and GIF incl.
animations (giflib-parity-tested), with per-window audio features
(RMS + zero-crossing rate) and grid mean-pool image features.
WebP-lossless decodes through the libwebp-parity-tested native VP8L
codec.  Unrecognized containers (MP4, lossy WebP ...) fall back behind
the sniffing
registry to the deterministic fake with `decoded=false`; the Spark
plumbing (schema, Arrow batching, mapInPandas shape) is identical
either way.
"""

from __future__ import annotations

import hashlib

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("format", T.StringType()),      # png | wav | mp4 ...
    T.StructField("payload", T.BinaryType()),     # opaque bytes
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
])

FEATURE_DIM = 64


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for decode+feature-extract:
    sha256(payload) expanded to a unit-norm float vector.
    Replace with a real decoder (PIL/librosa/ffmpeg) in production —
    signature and batch shape stay identical."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.RandomState(np.frombuffer(h[:4], dtype=np.uint32)[0])
    v = rng.standard_normal(dim)
    return v / np.linalg.norm(v)


def extract_features_synthetic(df: DataFrame, payload_col: str = "payload",
                     dim: int = FEATURE_DIM) -> DataFrame:
    """Append `features array<double>` via Arrow-batched mapInPandas.

    At 100 TB: decode runs executor-side over Arrow batches; payload
    bytes never visit the driver; batch size bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("features", T.ArrayType(T.DoubleType()))])

    def run(it):
        for pdf in it:
            feats = [None if p is None else list(map(float, _fake_decode(bytes(p), dim)))
                     for p in pdf[payload_col]]
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def resize_synthetic(df: DataFrame, width: int, height: int,
                payload_col: str = "payload") -> DataFrame:
    """Image resize plumbing: passes payload through a mapInPandas stage and
    rewrites the metadata dims (real impl: PIL resize in the same loop)."""
    def run(it):
        for pdf in it:
            pdf = pdf.copy()
            if "width" in pdf:
                pdf["width"] = np.where(pdf[payload_col].isna(), pdf["width"], width)
            if "height" in pdf:
                pdf["height"] = np.where(pdf[payload_col].isna(), pdf["height"], height)
            yield pdf
    return df.mapInPandas(run, schema=df.schema)


def frame_sample_synthetic(df: DataFrame, every_ms: int = 1000,
                      payload_col: str = "payload") -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    (explode on computed frame offsets); frame payload stubbed as a
    sliced hash of the source payload."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("frame_ms", T.LongType()),
                                  T.StructField("frame_payload", T.BinaryType())])

    def run(it):
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                dur = r.get("duration_ms") or 0
                payload = r[payload_col]
                if payload is None or dur <= 0:
                    continue
                for ms in range(0, int(dur), every_ms):
                    fake_frame = hashlib.sha256(
                        bytes(payload) + ms.to_bytes(8, "little")).digest()
                    rows.append(tuple(r) + (ms, fake_frame))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(run, schema=out_schema)


# deterministic-synthetic variants above are TEST SURFACES: the real
# decode/feature/resize/frame-sample path is extract_features_real /
# image_resize_nearest / frame_sample over the native codecs below.
extract_features = extract_features_synthetic  # back-compat alias
resize_stub = resize_synthetic                 # back-compat alias
frame_sample_stub = frame_sample_synthetic     # back-compat alias


def make_demo_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table exercising the schema."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 8
        kind = ["image", "audio", "video"][i % 3]
        rows.append((i, kind, {"image": "png", "audio": "wav", "video": "mp4"}[kind],
                     payload, 640 if kind == "image" else None,
                     480 if kind == "image" else None,
                     5000 if kind != "image" else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ----------------------------------------------------------------------
# REAL decoders for spec-simple formats (no external libs needed):
# PCM WAV via the stdlib `wave` module, PPM/PGM (netpbm) and
# uncompressed BMP by direct parse.  JPEG/PNG/MP4 remain gated on
# PIL/ffmpeg — the registry routes by sniffed magic bytes, so swapping
# a real codec in changes nothing upstream.
# ----------------------------------------------------------------------

def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes -> (float32 mono samples in [-1, 1], sample_rate)."""
    import io
    import wave
    with wave.open(io.BytesIO(payload), "rb") as w:
        n = w.getnframes()
        sw = w.getsampwidth()
        ch = w.getnchannels()
        rate = w.getframerate()
        raw = w.readframes(n)
    if sw == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 4:
        arr = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise NotImplementedError(f"WAV sample width {sw} unsupported")
    if ch > 1:
        arr = arr.reshape(-1, ch).mean(axis=1)
    return arr, rate


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary netpbm (P5 gray / P6 rgb) -> (h, w[, 3]) uint8 array."""
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM payload")
    toks: list[bytes] = []
    pos = 2
    while len(toks) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while payload[pos:pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        toks.append(payload[start:pos])
    pos += 1  # single whitespace after maxval
    w, h, maxv = int(toks[0]), int(toks[1]), int(toks[2])
    depth = 3 if payload[:2] == b"P6" else 1
    if maxv > 255:  # 16-bit netpbm: big-endian 2-byte samples (spec)
        arr = np.frombuffer(payload, dtype=">u2", count=w * h * depth,
                            offset=pos).astype(np.uint16)
    else:
        arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * depth,
                            offset=pos)
    return arr.reshape((h, w, 3) if depth == 3 else (h, w)).copy()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP -> (h, w, 3) uint8 (top-down)."""
    import struct as _st
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = _st.unpack_from("<I", payload, 10)
    hdr_size, w, h = _st.unpack_from("<Iii", payload, 14)
    planes, bpp = _st.unpack_from("<HH", payload, 26)
    (comp,) = _st.unpack_from("<I", payload, 30)
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError("only uncompressed 24/32-bit BMP")
    flip = h > 0
    h = abs(h)
    bypp = bpp // 8
    stride = (w * bypp + 3) // 4 * 4
    rows = []
    for r in range(h):
        off = data_off + r * stride
        row = np.frombuffer(payload, np.uint8, count=w * bypp, offset=off)
        rows.append(row.reshape(w, bypp)[:, :3][:, ::-1])  # BGR -> RGB
    img = np.stack(rows)
    return img[::-1].copy() if flip else img.copy()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# Adam7 pass grid: (x0, y0, dx, dy) per pass, PNG spec §8.2
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _png_defilter(raw: bytes, pos: int, height: int, rowbytes: int,
                  bpp: int) -> tuple[np.ndarray, int]:
    """Undo the five PNG scanline filters over ``height`` rows starting
    at byte ``pos`` of the inflated stream; returns (rows, next_pos)."""
    if len(raw) < pos + height * (rowbytes + 1):
        raise ValueError("PNG pixel data truncated")
    out = np.zeros((height, rowbytes), dtype=np.uint8)
    prev = np.zeros(rowbytes, dtype=np.int32)
    for y in range(height):
        ft = raw[pos]
        line = np.frombuffer(raw, np.uint8, count=rowbytes,
                             offset=pos + 1).astype(np.int32)
        pos += rowbytes + 1
        if ft == 0:                          # None
            cur = line
        elif ft == 2:                        # Up
            cur = (line + prev) & 0xFF
        elif ft == 1:                        # Sub (sequential per pixel)
            cur = line.copy()
            for i in range(bpp, rowbytes):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ft == 3:                        # Average
            cur = line.copy()
            for i in range(rowbytes):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:                        # Paeth
            cur = line.copy()
            for i in range(rowbytes):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ft} invalid")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out, pos


def _png_rows_to_samples(rows: np.ndarray, width: int, channels: int,
                         bit_depth: int) -> np.ndarray:
    """Filtered rows -> (h, width, channels) sample array (uint8/uint16)."""
    h = rows.shape[0]
    if bit_depth == 8:
        return rows[:, :width * channels].reshape(h, width, channels)
    if bit_depth == 16:
        u16 = rows.view(">u2").astype(np.uint16)
        return u16[:, :width * channels].reshape(h, width, channels)
    # 1/2/4-bit (gray or palette indices): MSB-first sub-byte samples
    bits = np.unpackbits(rows, axis=1)
    n = bits.shape[1] // bit_depth
    vals = np.zeros((h, n), dtype=np.uint8)
    for b in range(bit_depth):
        vals = (vals << 1) | bits[:, b::bit_depth][:, :n]
    return vals[:, :width].reshape(h, width, 1)


def decode_png(payload: bytes) -> np.ndarray:
    """Native PNG decode: stdlib zlib inflate + the five scanline filters
    (None/Sub/Up/Average/Paeth).  Supports gray / gray+alpha / RGB /
    RGBA / palette at bit depths 1/2/4/8/16, non-interlaced AND
    Adam7-interlaced streams (cross-validated against libpng's
    simplified read API in tests/test_operators.py).  16-bit returns
    uint16; sub-byte gray is scaled to 8-bit as libpng presents it.

    Reference ships image decode via its Python/GDAL layer; here the
    codec is from the PNG spec (RFC 2083) directly — no PIL."""
    import struct as _st
    import zlib
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    idat = bytearray()
    w = h = None
    bit_depth = color_type = interlace = None
    palette = None
    trns = None
    while pos + 8 <= len(payload):
        (ln,) = _st.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln                       # len + type + data + crc
        if ctype == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = \
                _st.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(data, np.uint8)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"PNG color type {color_type} invalid")
    valid_depths = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                    4: (8, 16), 6: (8, 16)}[color_type]
    if bit_depth not in valid_depths:
        raise ValueError(
            f"PNG bit depth {bit_depth} invalid for color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    bpp = max(1, channels * bit_depth // 8)

    def rowbytes(width: int) -> int:
        return (width * channels * bit_depth + 7) // 8

    if interlace == 0:
        rows, _ = _png_defilter(raw, 0, h, rowbytes(w), bpp)
        img = _png_rows_to_samples(rows, w, channels, bit_depth)
    elif interlace == 1:                     # Adam7
        dt = np.uint16 if bit_depth == 16 else np.uint8
        img = np.zeros((h, w, channels), dtype=dt)
        pos = 0
        for (x0, y0, dx, dy) in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            rows, pos = _png_defilter(raw, pos, ph, rowbytes(pw), bpp)
            img[y0::dy, x0::dx] = _png_rows_to_samples(
                rows, pw, channels, bit_depth)
    else:
        raise ValueError(f"PNG interlace method {interlace} invalid")

    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        idx = img[:, :, 0]
        if trns is not None:                 # palette alpha -> RGBA
            alpha = np.full(len(palette), 255, np.uint8)
            alpha[:len(trns)] = trns
            img = np.dstack([palette[idx], alpha[idx]])
        else:
            img = palette[idx]
    elif color_type == 0 and bit_depth < 8:
        # scale sub-byte gray to full 8-bit range (libpng presentation)
        img = (img.astype(np.uint16) * 255 // ((1 << bit_depth) - 1)) \
            .astype(np.uint8)
    return img if img.shape[2] > 1 else img[:, :, 0]


def encode_png(img: np.ndarray, compress_level: int = 6,
               interlace: bool = False) -> bytes:
    """Native PNG encode (filter 0 scanlines + zlib): (h, w[, c]) uint8
    or uint16 gray/gray+alpha/RGB/RGBA -> PNG bytes, optionally
    Adam7-interlaced.  Used for fixtures and as the write half of the
    image roundtrip."""
    import struct as _st
    import zlib
    arr = np.asarray(img)
    depth = 16 if arr.dtype == np.uint16 else 8
    arr = arr.astype(np.uint16 if depth == 16 else np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (_st.pack(">I", len(data)) + ctype + data
                + _st.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    def rows(a: np.ndarray) -> bytes:
        if depth == 16:
            a = a.astype(">u2")
        return b"".join(b"\x00" + a[y].tobytes() for y in range(a.shape[0]))

    if interlace:
        raw = b"".join(rows(arr[y0::dy, x0::dx])
                       for (x0, y0, dx, dy) in _ADAM7
                       if arr[y0::dy, x0::dx].size)
    else:
        raw = rows(arr)
    ihdr = _st.pack(">IIBBBBB", w, h, depth, color_type, 0, 0,
                    1 if interlace else 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, compress_level))
            + chunk(b"IEND", b""))


def decode_image(payload: bytes) -> np.ndarray:
    """Sniff + decode: netpbm/BMP/PNG/baseline-JPEG natively; anything
    else (progressive JPEG, webp, ...) gates on PIL."""
    if payload[:2] in (b"P5", b"P6"):
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xFF\xD8":
        from sedona_db_spark.operators.jpeg_native import decode_jpeg
        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from sedona_db_spark.operators.gif_native import decode_gif
        return decode_gif(payload)[0][0][:, :, :3]  # first frame RGB
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from sedona_db_spark.operators.vp8l_native import decode_webp
        # lossless decodes natively; lossy delegates to platform libwebp
        return decode_webp(payload)
    try:
        from PIL import Image  # noqa (absent in this container)
        import io
        return np.asarray(Image.open(io.BytesIO(payload)))
    except ImportError as exc:
        raise NotImplementedError(
            "unrecognized image format needs PIL (netpbm/BMP/PNG/GIF/"
            "JPEG decode natively)") from exc


def image_resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    ys = (np.arange(height) * img.shape[0] // height).clip(0, img.shape[0] - 1)
    xs = (np.arange(width) * img.shape[1] // width).clip(0, img.shape[1] - 1)
    return img[np.ix_(ys, xs)]


def image_features(img: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """Grid mean-pool luminance features (deterministic, unit-norm)."""
    if img.ndim == 3:
        img = img.mean(axis=2)
    side = int(np.sqrt(dim))
    pooled = image_resize_nearest(img.astype(np.float64), side, side).ravel()
    out = np.zeros(dim)
    out[:len(pooled)] = pooled
    n = np.linalg.norm(out)
    return out / n if n > 0 else out


def audio_features(samples: np.ndarray, rate: int, n_windows: int = 16):
    """Per-window RMS + zero-crossing-rate features over mono samples."""
    if len(samples) == 0:
        return np.zeros(n_windows * 2)
    chunks = np.array_split(samples, n_windows)
    rms = np.array([float(np.sqrt(np.mean(c * c))) if len(c) else 0.0
                    for c in chunks])
    zcr = np.array([float(np.mean(np.abs(np.diff(np.signbit(c).astype(int)))))
                    if len(c) > 1 else 0.0 for c in chunks])
    return np.concatenate([rms, zcr])


def extract_features_real(df: DataFrame, payload_col: str = "payload",
                          kind_col: str = "kind",
                          dim: int = FEATURE_DIM) -> DataFrame:
    """Like extract_features but with REAL decoders where the format
    allows: netpbm/BMP images and PCM WAV audio decode natively; other
    payloads fall back to the deterministic fake (documented gate)."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("features", T.ArrayType(T.DoubleType())),
           T.StructField("decoded", T.BooleanType())])

    def run(it):
        for pdf in it:
            feats = []
            real = []
            for p, k in zip(pdf[payload_col], pdf[kind_col]):
                if p is None:
                    feats.append(None)
                    real.append(None)
                    continue
                b = bytes(p)
                try:
                    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
                        feats.append(list(map(float, image_features(
                            decode_image(b), dim))))
                        real.append(True)
                        continue
                    if b[:4] == b"RIFF":
                        s, rate = decode_wav(b)
                        v = audio_features(s, rate)
                        f = np.zeros(dim)
                        f[:len(v)] = v[:dim]
                        n = np.linalg.norm(f)
                        feats.append(list(map(float, f / n if n else f)))
                        real.append(True)
                        continue
                    if (b[:2] in (b"P5", b"P6", b"BM", b"\xFF\xD8")
                            or b[:8] == _PNG_SIG
                            or b[:6] in (b"GIF87a", b"GIF89a")):
                        feats.append(list(map(float,
                                              image_features(decode_image(b), dim))))
                        real.append(True)
                        continue
                except (ValueError, NotImplementedError, IndexError,
                        struct.error):
                    # truncated/corrupt payloads degrade to the fake
                    # decode instead of killing the task
                    pass
                feats.append(list(map(float, _fake_decode(b, dim))))
                real.append(False)
            pdf = pdf.copy()
            pdf["features"] = feats
            pdf["decoded"] = real
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


# ----------------------------------------------------------------------
# REAL video frame sampling: MJPEG-in-AVI (RIFF container walk + the
# native baseline-JPEG codec in operators/jpeg_native.py).  Replaces the
# synthetic frame_sample_synthetic for AVI payloads; other containers (MP4
# etc.) still raise — their demuxers aren't in this environment.
# Reference surface: video decode in the multimodal ingestion path.
# ----------------------------------------------------------------------

def encode_mjpeg_avi(frames: list[np.ndarray], fps: int = 10,
                     quality: int = 85) -> bytes:
    """Grayscale/RGB frames -> a minimal spec-conforming MJPEG AVI
    (RIFF('AVI ') / hdrl(avih + strl(strh,strf)) / movi('00dc' JPEG
    chunks) / idx1).  Used for fixtures and as the writer half of the
    roundtrip test."""
    import struct as st
    from sedona_db_spark.operators.jpeg_native import encode_jpeg
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality) for f in frames]

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + st.pack("<I", len(data)) + data + pad

    def lst(fourcc: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", fourcc + data)

    us_per_frame = 1000000 // fps
    max_size = max(len(j) for j in jpegs)
    avih = st.pack("<14I", us_per_frame, max_size * fps, 0, 0x10,
                   len(jpegs), 0, 1, max_size, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + st.pack("<I", 0) + st.pack("<2H", 0, 0)
            + st.pack("<8I", 0, 1, fps, 0, len(jpegs), max_size, 0xFFFFFFFF, 0)
            + st.pack("<4H", 0, 0, w, h))
    strf = st.pack("<I2i2H2I2i2I", 40, w, h, 1, 24, 0x47504A4D,  # 'MJPG'
                   w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_chunks = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_chunks)
    idx = bytearray()
    off = 4
    for j in jpegs:
        idx += b"00dc" + st.pack("<3I", 0x10, off, len(j))
        off += 8 + len(j) + (len(j) % 2)
    body = hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + st.pack("<I", 4 + len(body)) + b"AVI " + body


def decode_avi_frames(payload: bytes):
    """MJPEG AVI bytes -> (frame_jpegs list, ms_per_frame float).

    Walks the RIFF tree: reads us_per_frame from 'avih', collects
    '00dc'/'00db' chunks from the 'movi' LIST.  Raises ValueError on
    non-AVI input, NotImplementedError on non-MJPEG streams."""
    import struct as st
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF AVI payload")
    us_per_frame = None
    frames: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int):
        nonlocal us_per_frame
        while pos + 8 <= end:
            fourcc = buf[pos:pos + 4]
            size = st.unpack("<I", buf[pos + 4:pos + 8])[0]
            data_start = pos + 8
            data_end = min(data_start + size, end)
            if fourcc == b"LIST":
                walk(buf, data_start + 4, data_end)
            elif fourcc == b"avih" and size >= 4:
                us_per_frame = st.unpack(
                    "<I", buf[data_start:data_start + 4])[0]
            elif fourcc in (b"00dc", b"00db"):
                frames.append(buf[data_start:data_end])
            pos = data_start + size + (size % 2)

    walk(payload, 12, len(payload))
    if us_per_frame is None or not frames:
        raise ValueError("AVI missing avih header or video chunks")
    for f in frames:
        if f[:2] != b"\xFF\xD8":
            raise NotImplementedError(
                "only MJPEG video streams are decodable here")
    return frames, us_per_frame / 1000.0


def frame_sample(df: DataFrame, every_ms: int = 1000,
                 payload_col: str = "payload",
                 decode_pixels: bool = False) -> DataFrame:
    """REAL video frame sampling over MJPEG-AVI and animated-GIF
    payloads: one output row per sampled frame; frame_ms is the frame's
    actual container timestamp, frame_payload its JPEG bytes (AVI) or a
    PNG re-encode of the composited frame (GIF); decode_pixels=True adds
    mean pixel intensity as a cheap content check.  Other payloads raise
    ValueError — route them to frame_sample_synthetic explicitly if synthetic
    plumbing is wanted."""
    from sedona_db_spark.operators.jpeg_native import decode_jpeg
    fields = (list(df.schema.fields)
              + [T.StructField("frame_ms", T.LongType()),
                 T.StructField("frame_payload", T.BinaryType())])
    if decode_pixels:
        fields.append(T.StructField("frame_mean", T.DoubleType()))
    out_schema = T.StructType(fields)

    def run(it):
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                payload = r[payload_col]
                if payload is None:
                    continue
                payload = bytes(payload)
                if payload[:6] in (b"GIF87a", b"GIF89a"):
                    from sedona_db_spark.operators.gif_native import (
                        decode_gif)
                    t = next_t = 0.0
                    for img, delay_cs in decode_gif(payload):
                        if t + 1e-9 >= next_t:
                            rgb = img[:, :, :3]
                            row = tuple(r) + (int(round(t)),
                                              encode_png(rgb))
                            if decode_pixels:
                                row = row + (float(rgb.mean()),)
                            rows.append(row)
                            next_t += every_ms
                        t += delay_cs * 10.0
                    continue
                jpegs, ms_per = decode_avi_frames(payload)
                next_t = 0.0
                for i, j in enumerate(jpegs):
                    t = i * ms_per
                    if t + 1e-9 >= next_t:
                        row = tuple(r) + (int(round(t)), j)
                        if decode_pixels:
                            row = row + (float(decode_jpeg(j).mean()),)
                        rows.append(row)
                        next_t += every_ms
            yield pd.DataFrame(rows,
                               columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(run, schema=out_schema)
