"""Native WebP-lossless (VP8L) decoder — no libwebp dependency at run
time.

Implemented from the public "WebP Lossless Bitstream Specification":
RIFF container, LSB-first bit stream, canonical prefix codes (simple
and code-length-coded variants), meta-prefix entropy images, color
cache, LZ77 backward references with the 120-entry 2-D distance map,
and all four transforms (predictor with its 14 modes, cross-color,
subtract-green, color-indexing incl. sub-byte pixel bundling).

Cross-validated against libwebp (``libwebp.so.7``) in
``tests/test_operators.py``: images encoded by ``WebPEncodeLosslessRGBA``
across content classes chosen to trigger each transform (photographic
gradients, palettized art, repeated textures) must decode here to the
exact RGBA libwebp returns.  Lossy VP8 delegates to the platform
libwebp when present (its RFC 6386 default probability/quantizer
tables cannot be transcribed with integrity here) and raises with a
precise message otherwise.
"""

from __future__ import annotations

import struct

import numpy as np

_CODE_LENGTH_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10,
                      11, 12, 13, 14, 15]


# The spec's 120 closest-neighbor (dx, dy) offsets for 2-D distance
# codes.  EXTRACTED EMPIRICALLY from libwebp: a hand-crafted VP8L
# stream emits each distance code once (each copy isolated behind a
# fresh run of position-tagged literals) and WebPDecodeRGBA reveals
# which pixel every code addresses — so this table is pinned to the
# reference decoder, not to recollection (the tail rows are not
# derivable from any simple distance-sort rule: x=+8 entries exist
# where x=-8 never does).  The extractor lives in the parity test.
_DISTANCE_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
    (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
    (0, 3), (3, 0), (1, 3), (-1, 3), (3, 1), (-3, 1),
    (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3),
    (2, 4), (-2, 4), (4, 2), (-4, 2), (0, 5), (3, 4),
    (-3, 4), (4, 3), (-4, 3), (5, 0), (1, 5), (-1, 5),
    (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3),
    (0, 6), (6, 0), (1, 6), (-1, 6), (6, 1), (-6, 1),
    (2, 6), (-2, 6), (6, 2), (-6, 2), (4, 5), (-4, 5),
    (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5),
    (7, 1), (-7, 1), (4, 6), (-4, 6), (6, 4), (-6, 4),
    (2, 7), (-2, 7), (7, 2), (-7, 2), (3, 7), (-3, 7),
    (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1),
    (8, 2), (6, 6), (-6, 6), (8, 3), (5, 7), (-5, 7),
    (7, 5), (-7, 5), (8, 4), (6, 7), (-6, 7), (7, 6),
    (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


class _BitReader:
    """LSB-first bit reader with a buffered peek window (the prefix-code
    fast path reads 8 bits at a time through a root lookup table)."""

    __slots__ = ("data", "pos", "buf", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.n = 0

    def _fill(self):
        data = self.data
        while self.n <= 48 and self.pos < len(data):
            self.buf |= data[self.pos] << self.n
            self.pos += 1
            self.n += 8

    def read(self, k: int) -> int:
        if self.n < k:
            self._fill()
            if self.n < k:
                raise ValueError("truncated VP8L stream")
        v = self.buf & ((1 << k) - 1)
        self.buf >>= k
        self.n -= k
        return v

    def peek8(self) -> int:
        if self.n < 8:
            self._fill()
        return self.buf & 0xFF


class _Huffman:
    """Canonical prefix code (DEFLATE-style assignment), decoded by
    walking stream bits MSB-of-code-first."""

    __slots__ = ("table", "single", "root")

    def __init__(self, lengths):
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if len(nz) == 0:
            raise ValueError("empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = None
            self.root = None
            return
        self.single = None
        # canonical assignment: increasing length, then symbol order
        nz.sort()
        table = {}
        code = 0
        prev_len = nz[0][0]
        for ln, sym in nz:
            code <<= (ln - prev_len)
            prev_len = ln
            table[(ln, code)] = sym
            code += 1
        if code != (1 << prev_len):
            raise ValueError("invalid prefix code (not full)")
        self.table = table
        # root lookup: next 8 stream bits (LSB-first) -> (sym, len) for
        # codes of length <= 8 (code bits arrive MSB-of-code-first, so
        # the stream pattern is the bit-reversed code, low-filled)
        root = [None] * 256
        for (ln, cd), sym in table.items():
            if ln <= 8:
                rev = 0
                for i in range(ln):
                    rev |= ((cd >> i) & 1) << (ln - 1 - i)
                for hi in range(1 << (8 - ln)):
                    root[rev | (hi << ln)] = (sym, ln)
        self.root = root

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        hit = self.root[br.peek8()]
        if hit is not None:
            sym, ln = hit
            if br.n >= ln:
                br.buf >>= ln
                br.n -= ln
                return sym
            br.read(ln)
            return sym
        acc = 0
        ln = 0
        table = self.table
        while ln < 16:
            acc = (acc << 1) | br.read(1)
            ln += 1
            sym = table.get((ln, acc))
            if sym is not None:
                return sym
        raise ValueError("bad prefix code in VP8L stream")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _Huffman:
    if br.read(1):                            # simple code
        num_symbols = br.read(1) + 1
        if br.read(1):                        # first symbol is 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            lengths[sym0] = 1
            h = _Huffman.__new__(_Huffman)
            h.single = sym0
            h.table = None
            return h
        sym1 = br.read(8)
        lengths[sym0] = 1
        lengths[sym1] = 1
        return _Huffman(lengths)
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.read(3)
    cl = _Huffman(cl_lengths)
    lengths = [0] * alphabet_size
    if br.read(1):                            # explicit max symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    sym = 0
    prev_len = 8
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl.decode(br)
        if code_len < 16:
            lengths[sym] = code_len
            sym += 1
            if code_len != 0:
                prev_len = code_len
        elif code_len == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if sym < alphabet_size:
                    lengths[sym] = prev_len
                    sym += 1
        elif code_len == 17:
            sym += 3 + br.read(3)
        else:
            sym += 11 + br.read(7)
    return _Huffman(lengths)


def _prefix_value(code: int, br: _BitReader) -> int:
    """Length/distance prefix decoding (code -> value with extra bits)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _div_round_up(a: int, b: int) -> int:
    return (a + b - 1) // b


def _decode_entropy_image(br: _BitReader, w: int, h: int) -> np.ndarray:
    """Recursive image stream without transforms -> (h, w) uint32 ARGB."""
    return _decode_image_stream(br, w, h, is_level0=False)


def _decode_image_stream(br: _BitReader, xsize: int, ysize: int,
                         is_level0: bool) -> np.ndarray:
    transforms = []
    w = xsize
    if is_level0:
        while br.read(1):
            ttype = br.read(2)
            if ttype == 0:                    # predictor
                bits = br.read(3) + 2
                tw, th = _div_round_up(w, 1 << bits), _div_round_up(
                    ysize, 1 << bits)
                data = _decode_entropy_image(br, tw, th)
                transforms.append(("predictor", bits, data))
            elif ttype == 1:                  # cross-color
                bits = br.read(3) + 2
                tw, th = _div_round_up(w, 1 << bits), _div_round_up(
                    ysize, 1 << bits)
                data = _decode_entropy_image(br, tw, th)
                transforms.append(("color", bits, data))
            elif ttype == 2:                  # subtract green
                transforms.append(("subtract_green", 0, None))
            else:                             # color indexing
                pal_size = br.read(8) + 1
                pal = _decode_entropy_image(br, pal_size, 1)[0]
                # palette entries are delta-coded per channel
                pal = pal.view()
                out = np.zeros(pal_size, np.uint32)
                prev = 0
                for i in range(pal_size):
                    a = ((pal[i] >> 24) + (prev >> 24)) & 0xFF
                    r = (((pal[i] >> 16) & 0xFF)
                         + ((prev >> 16) & 0xFF)) & 0xFF
                    g = (((pal[i] >> 8) & 0xFF)
                         + ((prev >> 8) & 0xFF)) & 0xFF
                    b = ((pal[i] & 0xFF) + (prev & 0xFF)) & 0xFF
                    prev = (a << 24) | (r << 16) | (g << 8) | b
                    out[i] = prev
                if pal_size <= 2:
                    wb = 3
                elif pal_size <= 4:
                    wb = 2
                elif pal_size <= 16:
                    wb = 1
                else:
                    wb = 0
                transforms.append(("palette", wb, out))
                w = _div_round_up(w, 1 << wb)

    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"bad VP8L color cache bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta = None
    meta_bits = 0
    num_groups = 1
    if is_level0 and br.read(1):              # meta prefix codes
        meta_bits = br.read(3) + 2
        tw, th = _div_round_up(w, 1 << meta_bits), _div_round_up(
            ysize, 1 << meta_bits)
        mimg = _decode_entropy_image(br, tw, th)
        meta = (((mimg >> 16) & 0xFF) << 8 | ((mimg >> 8) & 0xFF)) \
            .astype(np.int64)
        num_groups = int(meta.max()) + 1

    groups = []
    for _ in range(num_groups):
        g = _read_prefix_code(br, 256 + 24 + cache_size)
        r = _read_prefix_code(br, 256)
        b = _read_prefix_code(br, 256)
        a = _read_prefix_code(br, 256)
        d = _read_prefix_code(br, 40)
        groups.append((g, r, b, a, d))

    npix = w * ysize
    pix = np.zeros(npix, np.uint32)
    cache = [0] * cache_size
    pos = 0
    gcode, rcode, bcode, acode, dcode = groups[0]
    cur_group = 0
    while pos < npix:
        if meta is not None:
            x = pos % w
            y = pos // w
            gi = int(meta[y >> meta_bits, x >> meta_bits])
            if gi != cur_group:
                cur_group = gi
                gcode, rcode, bcode, acode, dcode = groups[gi]
        S = gcode.decode(br)
        if S < 256:
            red = rcode.decode(br)
            blue = bcode.decode(br)
            alpha = acode.decode(br)
            argb = (alpha << 24) | (red << 16) | (S << 8) | blue
            pix[pos] = argb
            pos += 1
            if cache_size:
                cache[(0x1E35A7BD * argb & 0xFFFFFFFF)
                      >> (32 - cache_bits)] = argb
        elif S < 256 + 24:
            length = _prefix_value(S - 256, br)
            dist_code = _prefix_value(dcode.decode(br), br)
            if dist_code <= 120:
                dx, dy = _DISTANCE_MAP[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            else:
                dist = dist_code - 120
            if dist > pos:
                raise ValueError("VP8L backward reference before start")
            for _ in range(length):
                if pos >= npix:
                    break
                argb = int(pix[pos - dist])
                pix[pos] = argb
                pos += 1
                if cache_size:
                    cache[(0x1E35A7BD * argb & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = argb
        else:
            pix[pos] = cache[S - 256 - 24]
            pos += 1
    img = pix.reshape(ysize, w)
    # apply inverse transforms in reverse order
    for (kind, bits, data) in reversed(transforms):
        if kind == "palette":
            img = _apply_palette(img, bits, data, xsize)
        elif kind == "subtract_green":
            img = _add_green(img)
        elif kind == "color":
            img = _inverse_color_transform(img, bits, data)
        else:
            img = _inverse_predictor(img, bits, data)
    return img


def _apply_palette(img: np.ndarray, width_bits: int, palette: np.ndarray,
                   xsize: int) -> np.ndarray:
    h = img.shape[0]
    idx = ((img >> 8) & 0xFF).astype(np.int64)   # indices ride green
    if width_bits:
        per = 1 << width_bits
        bits = 8 >> width_bits                   # bits per pixel
        cols = []
        for k in range(per):
            cols.append((idx >> (k * bits)) & ((1 << bits) - 1))
        idx = np.stack(cols, axis=2).reshape(h, -1)[:, :xsize]
    idx = np.clip(idx, 0, len(palette) - 1)
    return palette[idx]


def _add_green(img: np.ndarray) -> np.ndarray:
    g = (img >> 8) & 0xFF
    r = (((img >> 16) & 0xFF) + g) & 0xFF
    b = ((img & 0xFF) + g) & 0xFF
    return (img & 0xFF00FF00) | (r << 16) | b


def _color_delta(t: int, c: int) -> int:
    """Signed 3.5 fixed-point transform delta contribution."""
    t = t - 256 if t >= 128 else t
    c = c - 256 if c >= 128 else c
    return (t * c) >> 5


def _inverse_color_transform(img: np.ndarray, bits: int,
                             tdata: np.ndarray) -> np.ndarray:
    h, w = img.shape
    out = img.copy()
    for y in range(h):
        trow = tdata[y >> bits]
        for x in range(w):
            te = int(trow[x >> bits])
            g2r = te & 0xFF            # green_to_red rides blue channel
            g2b = (te >> 8) & 0xFF     # green_to_blue rides green
            r2b = (te >> 16) & 0xFF    # red_to_blue rides red
            v = int(out[y, x])
            g = (v >> 8) & 0xFF
            r = (((v >> 16) & 0xFF) + _color_delta(g2r, g)) & 0xFF
            b = ((v & 0xFF) + _color_delta(g2b, g)
                 + _color_delta(r2b, r - 256 if r >= 128 else r)) & 0xFF
            out[y, x] = (v & 0xFF00FF00) | (r << 16) | b
    return out


def _pix_avg2(a: int, b: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= ((((a >> sh) & 0xFF) + ((b >> sh) & 0xFF)) >> 1) << sh
    return out


def _pix_add(a: int, b: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= ((((a >> sh) & 0xFF) + ((b >> sh) & 0xFF)) & 0xFF) << sh
    return out


def _clamp_add_sub_full(c0: int, c1: int, c2: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((c0 >> sh) & 0xFF) + ((c1 >> sh) & 0xFF) - ((c2 >> sh) & 0xFF)
        v = 0 if v < 0 else (255 if v > 255 else v)
        out |= v << sh
    return out


def _pix_select(t: int, l: int, tl: int) -> int:
    pa = 0
    pb = 0
    for sh in (24, 16, 8, 0):
        p = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        pa += abs(p - ((l >> sh) & 0xFF))
        pb += abs(p - ((t >> sh) & 0xFF))
    # libwebp returns T unless pa is strictly less than pb (ties -> T).
    return l if pa < pb else t


def _inverse_predictor(img: np.ndarray, bits: int,
                       modes: np.ndarray) -> np.ndarray:
    h, w = img.shape
    out = img.astype(np.uint32).copy()
    for y in range(h):
        mrow = modes[y >> bits]
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(out[0, x - 1])             # L
            elif x == 0:
                pred = int(out[y - 1, 0])             # T
            else:
                mode = (int(mrow[x >> bits]) >> 8) & 0xFF
                L = int(out[y, x - 1])
                T = int(out[y - 1, x])
                TL = int(out[y - 1, x - 1])
                # rightmost column: top-right wraps to the first pixel
                # of the CURRENT row (libwebp's contiguous-buffer rule)
                TR = int(out[y - 1, x + 1]) if x + 1 < w \
                    else int(out[y, 0])
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _pix_avg2(_pix_avg2(L, TR), T)
                elif mode == 6:
                    pred = _pix_avg2(L, TL)
                elif mode == 7:
                    pred = _pix_avg2(L, T)
                elif mode == 8:
                    pred = _pix_avg2(TL, T)
                elif mode == 9:
                    pred = _pix_avg2(T, TR)
                elif mode == 10:
                    pred = _pix_avg2(_pix_avg2(L, TL), _pix_avg2(T, TR))
                elif mode == 11:
                    pred = _pix_select(T, L, TL)
                elif mode == 12:
                    pred = _clamp_add_sub_full(L, T, TL)
                elif mode == 13:
                    ave = _pix_avg2(L, T)
                    out_v = 0
                    for sh in (24, 16, 8, 0):
                        a = (ave >> sh) & 0xFF
                        c = (TL >> sh) & 0xFF
                        # C truncating division (toward zero), not floor.
                        d = a - c
                        v = a + (-((-d) // 2) if d < 0 else d // 2)
                        v = 0 if v < 0 else (255 if v > 255 else v)
                        out_v |= v << sh
                    pred = out_v
                else:
                    raise ValueError(f"bad predictor mode {mode}")
            out[y, x] = _pix_add(int(out[y, x]), pred)
    return out


def decode_vp8l(payload: bytes) -> np.ndarray:
    """VP8L chunk payload -> (h, w, 4) uint8 RGBA."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("not a VP8L stream")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)                                # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    img = _decode_image_stream(br, w, h, is_level0=True)
    rgba = np.zeros((h, w, 4), np.uint8)
    rgba[:, :, 0] = (img >> 16) & 0xFF
    rgba[:, :, 1] = (img >> 8) & 0xFF
    rgba[:, :, 2] = img & 0xFF
    rgba[:, :, 3] = (img >> 24) & 0xFF
    return rgba


def _libwebp_decode_rgba(payload: bytes):
    """Decode via the system libwebp (ctypes), or None when absent.

    Lossy VP8 depends on ~1100 entries of default token-probability and
    quantizer tables (RFC 6386) that cannot be transcribed or
    behaviorally extracted with integrity in this environment, so the
    lossy path DELEGATES to the platform codec the same way the
    reference links its codec libraries — import-gated, never required
    for the from-scratch lossless path."""
    import ctypes
    import ctypes.util
    name = ctypes.util.find_library("webp") or "libwebp.so.7"
    try:
        lib = ctypes.CDLL(name)
    except OSError:
        return None
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    w, h = ctypes.c_int(), ctypes.c_int()
    ptr = lib.WebPDecodeRGBA(payload, len(payload),
                             ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        return None
    try:
        n = w.value * h.value * 4
        arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    finally:
        if hasattr(lib, "WebPFree"):
            lib.WebPFree(ptr)
        else:
            # pre-0.5 libwebp has no WebPFree; the documented contract
            # is plain free() — without this every decode leaks w*h*4
            libc = ctypes.CDLL(None)
            libc.free.argtypes = [ctypes.c_void_p]
            libc.free(ctypes.cast(ptr, ctypes.c_void_p))
    return arr.reshape(h.value, w.value, 4)


def decode_webp(payload: bytes) -> np.ndarray:
    """WebP container bytes -> (h, w, 4) uint8 RGBA.

    Lossless (VP8L) decodes through the from-scratch, libwebp-bit-exact
    native path; lossy (VP8) delegates to the system libwebp when
    present (see _libwebp_decode_rgba) and raises otherwise."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP container")
    pos = 12
    while pos + 8 <= len(payload):
        fourcc = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        if fourcc == b"VP8L":
            return decode_vp8l(body)
        if fourcc == b"VP8 ":
            rgba = _libwebp_decode_rgba(payload)
            if rgba is not None:
                return rgba
            raise NotImplementedError(
                "lossy VP8 WebP needs the platform libwebp (not found); "
                "lossless VP8L decodes natively")
        pos += 8 + size + (size & 1)
    raise ValueError("WebP container without image chunk")
