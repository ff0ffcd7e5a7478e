"""Native baseline JPEG codec: self-roundtrips, an analytic DC-only
fixture, and cross-validation against libjpeg (ctypes, subprocess)."""

import os
import struct
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from sedona_db_spark.operators import jpeg_native as J


def test_solid_and_gradient_roundtrip():
    img = np.full((16, 24), 130, dtype=np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(img, 90))
    assert dec.shape == (16, 24)
    assert np.all(np.abs(dec.astype(int) - 130) <= 1)

    h, w = 40, 56
    x = np.linspace(0, 255, w)[None, :].repeat(h, 0)
    y = np.linspace(0, 255, h)[:, None].repeat(w, 1)
    rgb = np.stack([x, y, (x + y) / 2], axis=-1).astype(np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(rgb, 92))
    mse = np.mean((dec.astype(float) - rgb.astype(float)) ** 2)
    assert 10 * np.log10(255 ** 2 / mse) > 32  # PSNR


def test_dc_only_analytic_fixture():
    """Hand-built spec fixture: one 8x8 grayscale block, quant table all
    16s, a single DC coefficient of +5 and EOB -> every decoded pixel is
    round(5*16/8) + 128 = 138 exactly (orthonormal DC basis = 1/8)."""
    dqt = b"\xFF\xDB" + struct.pack(">HB", 67, 0) + bytes([16] * 64)
    sof = b"\xFF\xC0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0])
    dht_dc = b"\xFF\xC4" + struct.pack(">HB", 19 + 12, 0x00) \
        + bytes(J.DC_LUMA_BITS) + bytes(J.DC_LUMA_VALS)
    dht_ac = b"\xFF\xC4" + struct.pack(">HB", 19 + len(J.AC_LUMA_VALS), 0x10) \
        + bytes(J.AC_LUMA_BITS) + bytes(J.AC_LUMA_VALS)
    sos = b"\xFF\xDA" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) + b"\x00\x3F\x00"
    # entropy: DC category 3 (code '100', 3 bits) + value bits 101 (=5),
    # then EOB (code '1010'); pad with 1s -> 100 101 1010 111111 -> 0x95 0xFC
    ecs = bytes([0b10010110, 0b10111111])
    jpg = b"\xFF\xD8" + dqt + sof + dht_dc + dht_ac + sos + ecs + b"\xFF\xD9"
    dec = J.decode_jpeg(jpg)
    assert dec.shape == (8, 8)
    assert np.all(dec == 138), dec


_WORKER = r'''
import ctypes, sys, struct
data = open(sys.argv[1], "rb").read()
lib = ctypes.CDLL("libjpeg.so.62")
lib.jpeg_std_error.restype = ctypes.c_void_p
err = ctypes.create_string_buffer(1024)
errp = lib.jpeg_std_error(err)
cinfo = ctypes.create_string_buffer(4096)
ctypes.cast(cinfo, ctypes.POINTER(ctypes.c_void_p))[0] = errp
lib.jpeg_CreateDecompress(cinfo, 62, 632)
buf = ctypes.create_string_buffer(data, len(data))
lib.jpeg_mem_src(cinfo, buf, len(data))
lib.jpeg_read_header(cinfo, 1)
raw = bytes(cinfo.raw)
W, H = struct.unpack(">HH", open(sys.argv[2], "rb").read())
woff = None
for off in range(40, 200, 4):
    a, b = struct.unpack_from("<II", raw, off)
    if a == W and b == H:
        woff = off; break
assert woff is not None
lib.jpeg_start_decompress(cinfo)
raw = bytes(cinfo.raw)
oc = None
for off in range(woff, 632 - 24, 4):
    a, b = struct.unpack_from("<II", raw, off)
    if a == W and b == H:
        for k in range(off + 8, off + 24, 4):
            v = struct.unpack_from("<i", raw, k)[0]
            if v in (1, 3):
                oc = v; break
        if oc: break
assert oc
row = ctypes.create_string_buffer(W * oc)
rowptr = (ctypes.c_void_p * 1)(ctypes.addressof(row))
out = bytearray()
for _ in range(H):
    assert lib.jpeg_read_scanlines(cinfo, rowptr, 1) == 1
    out += row.raw[:W * oc]
lib.jpeg_finish_decompress(cinfo)
lib.jpeg_destroy_decompress(cinfo)
sys.stdout.buffer.write(bytes(out))
'''


def _libjpeg_decode(enc: bytes, w: int, h: int):
    f1, f2 = tempfile.mktemp(), tempfile.mktemp()
    try:
        open(f1, "wb").write(enc)
        open(f2, "wb").write(struct.pack(">HH", w, h))
        r = subprocess.run([sys.executable, "-c", _WORKER, f1, f2],
                           capture_output=True, timeout=60)
        if r.returncode != 0:
            return None
        nc = len(r.stdout) // (h * w)
        return np.frombuffer(r.stdout, dtype=np.uint8).reshape(h, w, nc).squeeze()
    finally:
        for f in (f1, f2):
            if os.path.exists(f):
                os.unlink(f)


def test_cross_validate_against_libjpeg():
    """My-encoder streams decoded by libjpeg and by the native decoder
    must agree to cross-implementation IDCT tolerance (mean << 1 LSB,
    worst-case a few LSBs on high-frequency content)."""
    try:
        import ctypes
        ctypes.CDLL("libjpeg.so.62")
    except OSError:
        pytest.skip("libjpeg unavailable")
    rng = np.random.RandomState(1)
    h, w = 40, 56
    x = np.linspace(0, 255, w)[None, :].repeat(h, 0)
    y = np.linspace(0, 255, h)[:, None].repeat(w, 1)
    cases = [
        np.stack([x, y, (x + y) / 2], axis=-1).astype(np.uint8),
        (np.cumsum(np.cumsum(rng.randn(h, w, 3), 0), 1) % 256).astype(np.uint8),
        np.clip(x + 10 * np.sin(y / 8), 0, 255).astype(np.uint8),
    ]
    for img in cases:
        enc = J.encode_jpeg(img, 92)
        ref = _libjpeg_decode(enc, w, h)
        if ref is None:
            pytest.skip("libjpeg worker failed")
        mine = J.decode_jpeg(enc)
        d = np.abs(ref.astype(int) - mine.astype(int))
        assert d.mean() <= 1.0 and d.max() <= 8, (d.mean(), d.max())


def test_arithmetic_and_hierarchical_rejected():
    # progressive (SOF2) is supported since round 6; the still-gated
    # frame types (arithmetic SOF9, hierarchical SOF5) must keep raising
    for sof in (b"\xFF\xC9", b"\xFF\xC5"):
        bad = (b"\xFF\xD8" + sof + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
               + bytes([1, 0x11, 0]) + b"\xFF\xD9")
        with pytest.raises(NotImplementedError):
            J.decode_jpeg(bad)


def test_truncated_stream_raises_valueerror():
    """A truncated entropy-coded segment must surface the decoder's
    ValueError contract, not an IndexError from the bit machinery."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (24, 24), dtype=np.uint8)
    enc = J.encode_jpeg(img, 90)
    for cut in (len(enc) - 8, len(enc) - 30, len(enc) // 2 + 40):
        with pytest.raises((ValueError, NotImplementedError)):
            J.decode_jpeg(enc[:cut])


_COMPRESS_WORKER = r'''
import ctypes, struct, sys
import numpy as np
raw = open(sys.argv[1], "rb").read()
h, w, nc, quality = struct.unpack(">HHBB", raw[:6])
img = np.frombuffer(raw[6:], dtype=np.uint8).reshape(h, w, nc)
lib = ctypes.CDLL("libjpeg.so.62")
lib.jpeg_std_error.restype = ctypes.c_void_p
err = ctypes.create_string_buffer(1024)
errp = lib.jpeg_std_error(err)
cinfo = ctypes.create_string_buffer(1024)
ctypes.cast(cinfo, ctypes.POINTER(ctypes.c_void_p))[0] = errp
lib.jpeg_CreateCompress(cinfo, 62, 520)
outbuf = ctypes.c_void_p(0)
outsize = ctypes.c_ulong(0)
lib.jpeg_mem_dest(cinfo, ctypes.byref(outbuf), ctypes.byref(outsize))
# LP64 jpeg_compress_struct: image_width @48, height @52,
# input_components @56, in_color_space @60 (common fields 40B + dest ptr)
struct.pack_into("<I", cinfo, 48, w)
struct.pack_into("<I", cinfo, 52, h)
struct.pack_into("<i", cinfo, 56, nc)
struct.pack_into("<i", cinfo, 60, 1 if nc == 1 else 2)
lib.jpeg_set_defaults(cinfo)
lib.jpeg_set_quality(cinfo, quality, 1)
lib.jpeg_simple_progression(cinfo)
lib.jpeg_start_compress(cinfo, 1)
data = np.ascontiguousarray(img).tobytes()
rb = w * nc
for y in range(h):
    row = ctypes.create_string_buffer(data[y*rb:(y+1)*rb], rb)
    ptr = (ctypes.c_void_p * 1)(ctypes.addressof(row))
    assert lib.jpeg_write_scanlines(cinfo, ptr, 1) == 1
lib.jpeg_finish_compress(cinfo)
sys.stdout.buffer.write(ctypes.string_at(outbuf, outsize.value))
'''


def _libjpeg_encode_progressive(img, quality=90):
    """Progressive JPEG bytes via libjpeg's own compressor
    (jpeg_simple_progression: the canonical 10-scan script with AC
    successive approximation) — the independent fixture source."""
    img = np.atleast_3d(img)
    h, w, nc = img.shape
    f1 = tempfile.mktemp()
    try:
        with open(f1, "wb") as f:
            f.write(struct.pack(">HHBB", h, w, nc, quality))
            f.write(np.ascontiguousarray(img).tobytes())
        r = subprocess.run([sys.executable, "-c", _COMPRESS_WORKER, f1],
                           capture_output=True, timeout=60)
        if r.returncode != 0:
            return None
        return r.stdout
    finally:
        if os.path.exists(f1):
            os.unlink(f1)


def test_progressive_decode_cross_validated_against_libjpeg():
    """Round 6: progressive (SOF2) decoding — libjpeg-compressed
    progressive streams (spectral selection + successive approximation,
    incl. the AC refinement scans) must decode identically (to IDCT
    tolerance) to libjpeg's own decompressor."""
    try:
        import ctypes
        ctypes.CDLL("libjpeg.so.62")
    except OSError:
        pytest.skip("libjpeg unavailable")
    rng = np.random.RandomState(3)
    h, w = 48, 64
    x = np.linspace(0, 255, w)[None, :].repeat(h, 0)
    gray = (x + rng.randint(0, 40, (h, w))).clip(0, 255).astype(np.uint8)
    rgb = np.stack([x, x[::-1], rng.randint(0, 255, (h, w))],
                   axis=-1).astype(np.uint8)
    for img, q in [(gray, 90), (gray, 55), (rgb, 90), (rgb, 75)]:
        enc = _libjpeg_encode_progressive(img, q)
        if enc is None:
            pytest.skip("libjpeg compress harness failed on this build")
        assert b"\xff\xc2" in enc          # really progressive
        ref = _libjpeg_decode(enc, w, h)
        if ref is None:
            pytest.skip("libjpeg decode harness failed on this build")
        got = J.decode_jpeg(enc)
        assert got.shape == ref.shape
        diff = np.abs(got.astype(int) - ref.astype(int))
        assert diff.mean() < 1.0 and diff.max() <= 4, (
            img.shape, q, diff.mean(), diff.max())
