"""Baseline JPEG codec (ITU-T T.81) — no external imaging libraries.

Decoder: SOI/APP/DQT/SOF0/DHT/DRI/SOS/RST/EOI marker parse, canonical
Huffman decode, dequantize, float IDCT (orthonormal DCT-III via matrix
multiply), YCbCr->RGB, sampling factors 1-2 per axis (4:4:4, 4:2:2,
4:2:0) with box upsampling.  Progressive / arithmetic / 12-bit inputs
raise (the multimodal pipeline falls back to its flagged fake features).

Encoder: quality-scaled Annex-K quantization tables, the Annex-K typical
Huffman tables, 4:4:4 (or grayscale), used by tests and as the
RS/multimodal export path.  Validation strategy (tests/test_multimodal*):
my-encoder streams are decoded by BOTH this decoder and libjpeg (ctypes,
subprocess-guarded) and must agree within IDCT tolerance; a hand-built
DC-only fixture from the spec decodes to its exact analytic value.

Role parity: the reference delegates image decode to GDAL/browser-side
tooling; this engine keeps decode executor-side in Arrow batches
(operators/multimodal.py)."""

from __future__ import annotations

import struct

import numpy as np

# ---- shared tables ----------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int32)

# Annex K.1/K.2 example quantization tables (natural order)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    dtype=np.int32)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int32)

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

# orthonormal 8-point DCT matrix: C[k, n] = a(k) cos((2n+1)k pi/16)
_C = np.zeros((8, 8))
for _k in range(8):
    _a = np.sqrt(0.125) if _k == 0 else 0.5
    for _n in range(8):
        _C[_k, _n] = _a * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


def _scale_quant(tab: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (tab * s + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


# ---- canonical Huffman ------------------------------------------------

def _build_codes(bits, vals):
    """(bits[16], huffval) -> {symbol: (code, length)} (T.81 C.2)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode(bits, vals):
    """-> (maxcode/valptr arrays for fast canonical decode)."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code = 0
    k = 0
    for length in range(1, 17):
        if bits[length - 1]:
            valptr[length] = k
            mincode[length] = code
            code += bits[length - 1]
            k += bits[length - 1]
            maxcode[length] = code - 1
        code <<= 1
    return mincode, maxcode, valptr, list(vals)


# ---- encoder ----------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)


def _mag_bits(v: int):
    """DC/AC magnitude category + value bits (T.81 F.1.2.1)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 -> baseline JFIF bytes
    (4:4:4, Annex-K Huffman tables)."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    if nc not in (1, 3):
        raise ValueError("grayscale or RGB only")
    ql = _scale_quant(QUANT_LUMA, quality)
    qc = _scale_quant(QUANT_CHROMA, quality)
    if nc == 3:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
                  0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
        quants = [ql, qc, qc]
    else:
        planes = [img[:, :, 0].astype(np.float64)]
        quants = [ql]

    out = bytearray(b"\xFF\xD8")                      # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)            # APP0
    for tid, q in ((0, ql), (1, qc))[: (2 if nc == 3 else 1)]:
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tid) \
            + bytes(int(q[ZIGZAG[i]]) for i in range(64))
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    tables = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS),
              (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if nc == 3:
        tables += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
                   (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tc, bits, vals in tables:
        out += b"\xFF\xC4" + struct.pack(">HB", 19 + len(vals), tc) \
            + bytes(bits) + bytes(vals)
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3F\x00"                             # Ss/Se/AhAl

    dc_codes_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_codes_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_codes_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    bw = _BitWriter()
    pred = [0] * nc
    by, bx = (h + 7) // 8, (w + 7) // 8
    padded = []
    for p in planes:
        pp = np.empty((by * 8, bx * 8))
        pp[:h, :w] = p
        pp[h:, :w] = p[-1:, :]
        pp[:, w:] = pp[:, w - 1: w]
        padded.append(pp)
    for my in range(by):
        for mx in range(bx):
            for ci in range(nc):
                q = quants[ci]
                dc_codes = dc_codes_l if ci == 0 else dc_codes_c
                ac_codes = ac_codes_l if ci == 0 else ac_codes_c
                blk = padded[ci][my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] - 128.0
                coef = _dct2(blk)
                zz = np.round(coef.ravel()[ZIGZAG]
                              / q[ZIGZAG].astype(np.float64)).astype(np.int64)
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                s, bits_v = _mag_bits(diff)
                code, ln = dc_codes[s]
                bw.put(code, ln)
                if s:
                    bw.put(bits_v, s)
                run = 0
                last_nz = np.max(np.nonzero(zz[1:])[0]) + 1 if np.any(zz[1:]) else 0
                for i in range(1, last_nz + 1):
                    v = int(zz[i])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[0xF0]
                        bw.put(code, ln)
                        run -= 16
                    s, bits_v = _mag_bits(v)
                    code, ln = ac_codes[(run << 4) | s]
                    bw.put(code, ln)
                    bw.put(bits_v, s)
                    run = 0
                if last_nz < 63:
                    code, ln = ac_codes[0x00]
                    bw.put(code, ln)
    bw.flush()
    out += bw.out
    out += b"\xFF\xD9"                                 # EOI
    return bytes(out)


# ---- decoder ----------------------------------------------------------

class _BitReader:
    """Entropy-coded segment reader: unstuffs FF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker = None

    def _fill(self):
        d = self.data
        while self.n <= 24:
            if self.marker is not None:
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.n += 8
                continue
            if self.pos >= len(d) or (d[self.pos] == 0xFF
                                      and self.pos + 1 >= len(d)):
                # truncated entropy-coded segment (no trailing marker):
                # surface the decoder's documented error contract, not an
                # IndexError from deep inside the bit machinery
                raise ValueError("truncated JPEG stream")
            b = d[self.pos]
            if b == 0xFF:
                nb = d[self.pos + 1]
                if nb == 0x00:
                    self.pos += 2
                elif 0xD0 <= nb <= 0xD7:   # RSTn consumed by caller
                    self.marker = nb
                    continue
                else:
                    self.marker = nb
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFFFF
            self.n += 8

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        if self.n < k:
            self._fill()
        self.n -= k
        return (self.acc >> self.n) & ((1 << k) - 1)

    def restart(self):
        """Consume an RSTn marker and realign."""
        self.acc = 0
        self.n = 0
        self.marker = None
        self.pos += 2

    def decode_huff(self, table) -> int:
        mincode, maxcode, valptr, vals = table
        code = self.read(1)
        for length in range(1, 17):
            if maxcode[length] >= 0 and code <= maxcode[length]:
                return vals[valptr[length] + code - mincode[length]]
            code = (code << 1) | self.read(1)
        raise ValueError("bad Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w) or (h, w, 3) uint8."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, tuple] = {}
    huff_ac: dict[int, tuple] = {}
    frame = None
    restart_interval = 0
    coefs = None                 # progressive: per-component coef planes
    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        m = data[pos + 1]
        pos += 2
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            continue
        if m == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2: pos + seglen]
        if m == 0xDB:
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0xF
                sp += 1
                if pq:
                    raise NotImplementedError("16-bit quant tables")
                tab = np.zeros(64, dtype=np.int32)
                tab[ZIGZAG] = np.frombuffer(seg[sp:sp + 64], dtype=np.uint8)
                qt[tq] = tab
                sp += 64
        elif m == 0xC4:
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0xF
                bits = list(seg[sp + 1:sp + 17])
                cnt = sum(bits)
                vals = list(seg[sp + 17:sp + 17 + cnt])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode(bits, vals)
                sp += 17 + cnt
        elif m == 0xC0 or m == 0xC1:
            prec, fh, fw, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise NotImplementedError("12-bit JPEG")
            comps = []
            for ci in range(nc):
                cid, sf, tq = seg[6 + 3 * ci], seg[7 + 3 * ci], seg[8 + 3 * ci]
                comps.append({"id": cid, "h": sf >> 4, "v": sf & 0xF, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif m == 0xC2:
            prec, fh, fw, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise NotImplementedError("12-bit JPEG")
            comps = []
            for ci in range(nc):
                cid, sf, tq = seg[6 + 3 * ci], seg[7 + 3 * ci], seg[8 + 3 * ci]
                comps.append({"id": cid, "h": sf >> 4, "v": sf & 0xF, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps, "progressive": True}
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential and progressive (SOF2) JPEG")
        elif m == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif m == 0xDA:
            ns = seg[0]
            scan = []
            for ci in range(ns):
                cs, tt = seg[1 + 2 * ci], seg[2 + 2 * ci]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append({"comp": comp, "dc": tt >> 4, "ac": tt & 0xF})
            if not frame.get("progressive"):
                return _decode_scan(data, pos + seglen, frame, scan, qt,
                                    huff_dc, huff_ac, restart_interval)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if coefs is None:
                coefs = _alloc_coefs(frame)
            pos = _decode_progressive_scan(
                data, pos + seglen, frame, scan, coefs, huff_dc, huff_ac,
                ss, se, ahal >> 4, ahal & 0xF, restart_interval)
            # skip any entropy padding up to the next true marker
            while pos + 1 < n and not (data[pos] == 0xFF
                                       and data[pos + 1] not in (0x00,)):
                pos += 1
            continue
        pos += seglen
    if frame is not None and frame.get("progressive") and coefs is not None:
        return _finish_coefs(frame, coefs, qt)
    raise ValueError("no scan found")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, ri):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in frame["comps"]:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)))
    br = _BitReader(data, pos)
    pred = [0] * len(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and mcu_count and mcu_count % ri == 0:
                if br.marker is None:
                    br._fill()
                if br.marker is not None and 0xD0 <= br.marker <= 0xD7:
                    # skip to the marker position and consume it
                    while data[br.pos] != 0xFF or not (0xD0 <= data[br.pos + 1] <= 0xD7):
                        br.pos += 1
                        if br.pos + 1 >= len(data):
                            raise ValueError("truncated JPEG stream")
                    br.restart()
                    pred = [0] * len(scan)
            for si, sc in enumerate(scan):
                c = sc["comp"]
                q = qt[c["tq"]].astype(np.float64)
                for byi in range(c["v"]):
                    for bxi in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        s = br.decode_huff(huff_dc[sc["dc"]])
                        diff = _extend(br.read(s), s) if s else 0
                        pred[si] += diff
                        zz[0] = pred[si]
                        k = 1
                        while k < 64:
                            rs = br.decode_huff(huff_ac[sc["ac"]])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.read(s), s)
                            k += 1
                        coef = np.zeros(64)
                        coef[ZIGZAG] = zz * q[ZIGZAG]
                        blk = _idct2(coef.reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + byi) * 8
                        x0 = (mx * c["h"] + bxi) * 8
                        planes[frame["comps"].index(c)][y0:y0 + 8, x0:x0 + 8] = blk
            mcu_count += 1
    return _planes_to_image(frame, planes, hmax, vmax)


def _fancy2x(p: np.ndarray, axis: int) -> np.ndarray:
    """Triangular 2x upsample along one axis (libjpeg's 'fancy'
    h2v1/h2v2 filter, float form): each output sample is 3/4 the nearer
    input + 1/4 the farther, edges replicated."""
    p = np.moveaxis(p, axis, 0)
    prev = np.concatenate([p[:1], p[:-1]], axis=0)
    nxt = np.concatenate([p[1:], p[-1:]], axis=0)
    out = np.empty((p.shape[0] * 2,) + p.shape[1:], dtype=np.float64)
    out[0::2] = 0.75 * p + 0.25 * prev
    out[1::2] = 0.75 * p + 0.25 * nxt
    return np.moveaxis(out, 0, axis)


def _planes_to_image(frame, planes, hmax, vmax) -> np.ndarray:
    """Component planes -> uint8 image: upsample, crop, color-convert."""
    h, w = frame["h"], frame["w"]
    full = []
    for c, p in zip(frame["comps"], planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        while ry > 1 and ry % 2 == 0:          # triangular for 2x steps
            p = _fancy2x(p, 0)
            ry //= 2
        while rx > 1 and rx % 2 == 0:
            p = _fancy2x(p, 1)
            rx //= 2
        if ry > 1 or rx > 1:                   # odd ratios: nearest
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    # component ids R/G/B (0x52/0x47/0x42, e.g. libtiff photometric=RGB)
    # mean the stream carries RGB directly — no color transform
    ids = tuple(c["id"] for c in frame["comps"])
    if ids == (0x52, 0x47, 0x42):
        return np.clip(np.round(np.stack(full, axis=-1)), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ----------------------------------------------------------------------
# progressive (SOF2) decoding — ITU-T T.81 G.2: coefficients accumulate
# across scans (spectral selection Ss..Se, successive approximation
# Ah/Al), then one dequantize + IDCT pass at EOI.  Fixture validation:
# streams produced by libjpeg's jpeg_simple_progression (the canonical
# 10-scan script incl. AC refinement) must decode identically to
# libjpeg's own decompressor (tests/test_jpeg_native.py).
# ----------------------------------------------------------------------

def _alloc_coefs(frame):
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    frame["_hmax"], frame["_vmax"] = hmax, vmax
    frame["_mcux"], frame["_mcuy"] = mcux, mcuy
    return [np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
            for c in frame["comps"]]


def _decode_progressive_scan(data, pos, frame, scan, coefs, huff_dc,
                             huff_ac, ss, se, ah, al, ri):
    br = _BitReader(data, pos)
    comps = frame["comps"]
    mcux, mcuy = frame["_mcux"], frame["_mcuy"]
    state = {"eobrun": 0, "pred": [0] * len(scan), "mcu": 0}

    def maybe_restart():
        if ri and state["mcu"] and state["mcu"] % ri == 0:
            if br.marker is None:
                br._fill()
            if br.marker is not None and 0xD0 <= br.marker <= 0xD7:
                while data[br.pos] != 0xFF or not (
                        0xD0 <= data[br.pos + 1] <= 0xD7):
                    br.pos += 1
                    if br.pos + 1 >= len(data):
                        raise ValueError("truncated JPEG stream")
                br.restart()
                state["pred"] = [0] * len(scan)
                state["eobrun"] = 0

    if len(scan) > 1 or (ss == 0 and len(scan) == len(comps)):
        # interleaved DC scan over the MCU grid
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for si, sc in enumerate(scan):
                    c = sc["comp"]
                    ci = comps.index(c)
                    for byi in range(c["v"]):
                        for bxi in range(c["h"]):
                            blk = coefs[ci][my * c["v"] + byi,
                                            mx * c["h"] + bxi]
                            if ah == 0:
                                s = br.decode_huff(huff_dc[sc["dc"]])
                                diff = _extend(br.read(s), s) if s else 0
                                state["pred"][si] += diff
                                blk[0] = state["pred"][si] << al
                            else:
                                if br.read(1):
                                    blk[0] |= 1 << al
                state["mcu"] += 1
        return br.pos

    # single-component scan (all AC scans; also 1-component DC): blocks
    # in raster order over the COMPONENT's own (unpadded) block grid
    sc = scan[0]
    c = sc["comp"]
    ci = comps.index(c)
    hmax, vmax = frame["_hmax"], frame["_vmax"]
    cw = -(-frame["w"] * c["h"] // hmax)     # ceil component sample dims
    ch = -(-frame["h"] * c["v"] // vmax)
    bw, bh = -(-cw // 8), -(-ch // 8)
    for by in range(bh):
        for bx in range(bw):
            maybe_restart()
            blk = coefs[ci][by, bx]
            if ss == 0:
                if ah == 0:
                    s = br.decode_huff(huff_dc[sc["dc"]])
                    diff = _extend(br.read(s), s) if s else 0
                    state["pred"][0] += diff
                    blk[0] = state["pred"][0] << al
                elif br.read(1):
                    blk[0] |= 1 << al
            elif ah == 0:
                state["eobrun"] = _ac_first(
                    br, blk, huff_ac[sc["ac"]], ss, se, al,
                    state["eobrun"])
            else:
                state["eobrun"] = _ac_refine(
                    br, blk, huff_ac[sc["ac"]], ss, se, al,
                    state["eobrun"])
            state["mcu"] += 1
    return br.pos


def _ac_first(br, blk, huff, ss, se, al, eobrun):
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.decode_huff(huff)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.read(r)
                break
            k += 16                       # ZRL
            continue
        k += r
        if k > 63:
            raise ValueError("AC index overflow")
        blk[k] = _extend(br.read(s), s) << al
        k += 1
    return eobrun


def _ac_refine(br, blk, huff, ss, se, al, eobrun):
    """Successive-approximation AC refinement (T.81 G.2 / the
    decode_mcu_AC_refine construction): new coefficients arrive as
    +-1<<al; already-nonzero coefficients receive correction bits."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.decode_huff(huff)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r < 15:
                    # NOTE: unlike the first-scan EOB (which excludes the
                    # current block up front), refinement keeps the
                    # current block IN the run: the tail below applies
                    # its correction bits, then decrements
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read(r)
                    break
                val = 0                   # ZRL: pass 16 zero-history slots
            else:
                val = p1 if br.read(1) else m1
            while k <= se:
                if blk[k] != 0:
                    if br.read(1) and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                if br.read(1) and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _finish_coefs(frame, coefs, qt):
    """Accumulated zigzag coefficients -> image (one vectorized
    dequantize + batched IDCT per component)."""
    planes = []
    for c, zz in zip(frame["comps"], coefs):
        q = qt[c["tq"]].astype(np.float64)
        nat = np.zeros_like(zz, dtype=np.float64)
        nat[..., ZIGZAG] = zz * q[ZIGZAG]
        bh, bw = zz.shape[:2]
        blocks = nat.reshape(bh, bw, 8, 8)
        # batched IDCT: C.T @ coef @ C
        out = np.einsum("ij,xyjk,kl->xyil", _C.T, blocks, _C) + 128.0
        plane = out.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        planes.append(plane)
    return _planes_to_image(frame, planes, frame["_hmax"], frame["_vmax"])
