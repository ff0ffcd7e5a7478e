"""Zstandard decompression for Zarr/blosc chunks — no external deps.

Two paths:
- ``libzstd`` via ctypes when the shared library is present (most Linux
  images ship it) — used for speed.
- A from-scratch pure-Python decoder of the public RFC 8878 format
  (frame/block framing, FSE, Huffman, sequence execution) as the
  guaranteed-available fallback, validated against libzstd round-trips in
  tests/test_sources_wave2.py.

Reference parity: the reference reads Zarr zstd/blosc-zstd chunks through
the rust zstd crate (rust/sedona-raster-zarr); this module plays that role
for the Spark engine.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct

# ----------------------------------------------------------------------
# ctypes fast path
# ----------------------------------------------------------------------

_LIB = None


def _libzstd():
    global _LIB
    if _LIB is None:
        try:
            name = ctypes.util.find_library("zstd") or "libzstd.so.1"
            lib = ctypes.CDLL(name)
            lib.ZSTD_isError.restype = ctypes.c_uint
            lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
            lib.ZSTD_decompress.restype = ctypes.c_size_t
            lib.ZSTD_decompress.argtypes = [
                ctypes.c_void_p, ctypes.c_size_t,
                ctypes.c_void_p, ctypes.c_size_t]
            lib.ZSTD_compressBound.restype = ctypes.c_size_t
            lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
            lib.ZSTD_compress.restype = ctypes.c_size_t
            lib.ZSTD_compress.argtypes = [
                ctypes.c_void_p, ctypes.c_size_t,
                ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int]
            _LIB = lib
        except OSError:
            _LIB = False
    return _LIB or None


def zstd_decompress(data: bytes, dst_size: int | None = None) -> bytes:
    """Decompress one zstd frame (library if available, else native)."""
    lib = _libzstd()
    if lib is not None:
        if dst_size is None:
            dst_size = _frame_content_size(data)
        if dst_size is not None:
            buf = ctypes.create_string_buffer(dst_size)
            n = lib.ZSTD_decompress(buf, dst_size, data, len(data))
            if not lib.ZSTD_isError(n):
                return buf.raw[:n]
    return decompress_native(data)


def zstd_compress(data: bytes, level: int = 3) -> bytes:
    """Compress via libzstd (used by the Zarr writer and tests); raises
    when the shared library is unavailable — writing zstd chunks without
    it is gated, reading never is."""
    lib = _libzstd()
    if lib is None:
        raise NotImplementedError("libzstd not available for compression")
    bound = lib.ZSTD_compressBound(len(data))
    buf = ctypes.create_string_buffer(bound)
    n = lib.ZSTD_compress(buf, bound, data, len(data), level)
    if lib.ZSTD_isError(n):
        raise ValueError("zstd compression failed")
    return buf.raw[:n]


def _frame_content_size(data: bytes) -> int | None:
    """Parse the frame header for the declared content size (RFC 8878)."""
    if len(data) < 5 or struct.unpack("<I", data[:4])[0] != 0xFD2FB528:
        return None
    fhd = data[4]
    fcs_flag = fhd >> 6
    single = (fhd >> 5) & 1
    pos = 5
    if not single:
        pos += 1  # window descriptor
    pos += (0, 1, 2, 4)[fhd & 3]  # dictionary id
    if fcs_flag == 0:
        return data[pos] if single else None
    if fcs_flag == 1:
        return struct.unpack_from("<H", data, pos)[0] + 256
    if fcs_flag == 2:
        return struct.unpack_from("<I", data, pos)[0]
    return struct.unpack_from("<Q", data, pos)[0]


# ----------------------------------------------------------------------
# pure-Python RFC 8878 decoder
# ----------------------------------------------------------------------

class _RBits:
    """Backward bitstream: bits are read MSB-down starting just below the
    sentinel 1-bit in the final byte (RFC 8878 bitstream convention)."""

    __slots__ = ("val", "navail")

    def __init__(self, data: bytes):
        if not data:
            raise ValueError("empty bitstream")
        self.val = int.from_bytes(data, "little")
        top = self.val.bit_length()
        if top == 0:
            raise ValueError("bitstream with no sentinel")
        self.navail = top - 1  # strip sentinel

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if n > self.navail:
            # zstd allows reading past start (returns 0 bits) only for
            # state inits on exactly-consumed streams; pad with zeros
            got = self.navail
            v = (self.val & ((1 << got) - 1)) << (n - got) if got > 0 else 0
            self.navail = 0
            return v
        self.navail -= n
        return (self.val >> self.navail) & ((1 << n) - 1)

    def finished(self) -> bool:
        return self.navail == 0


def _highbit(v: int) -> int:
    return v.bit_length() - 1


# ---- FSE ---------------------------------------------------------------

def _fse_build_dtable(norm: list[int], acc: int):
    """Decode table from normalized counts: list of (symbol, nbits, base)."""
    size = 1 << acc
    table_sym = [0] * size
    high = size - 1
    # "less than 1" symbols take single cells from the table end
    for s, n in enumerate(norm):
        if n == -1:
            table_sym[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, n in enumerate(norm):
        if n <= 0:
            continue
        for _ in range(n):
            table_sym[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("FSE table spread error")
    nxt = [1 if n == -1 else n for n in norm]
    table = [None] * size
    for st in range(size):
        s = table_sym[st]
        x = nxt[s]
        nxt[s] += 1
        nbits = acc - _highbit(x)
        table[st] = (s, nbits, (x << nbits) - size)
    return table


def _fse_read_ncount(data: bytes, pos: int, max_sym: int):
    """Parse an FSE table description; returns (norm, acclog, newpos).

    Forward bitstream, LSB-first (unlike the backward decode streams);
    variable-width threshold coding per RFC 8878 §4.1.1."""
    bitpos = pos * 8
    total_bits = len(data) * 8

    def get(n):
        nonlocal bitpos
        if n == 0:
            return 0
        end = min(bitpos + n, total_bits)
        chunk = data[bitpos // 8: (end + 7) // 8]
        v = int.from_bytes(chunk, "little") >> (bitpos % 8) if chunk else 0
        bitpos += n
        return v & ((1 << n) - 1)

    acc = get(4) + 5
    if acc > 9:
        raise ValueError("FSE accuracy log too large")
    remaining = (1 << acc) + 1
    threshold = 1 << acc
    nbits = acc + 1
    norm = []
    prev0 = False
    while remaining > 1 and len(norm) <= max_sym:
        if prev0:
            # 2-bit repeat flags: each run of 3 extends the zero run
            while True:
                rep = get(2)
                norm.extend([0] * rep)
                if rep < 3:
                    break
            prev0 = False
            continue
        maxv = (2 * threshold - 1) - remaining
        v = get(nbits - 1)
        if v < maxv:
            count = v  # small value: one less bit
        else:
            v |= get(1) << (nbits - 1)
            count = v if v < threshold else v - maxv
        count -= 1  # stored +1; -1 encodes "less than 1"
        norm.append(count)
        remaining -= -count if count < 0 else count
        prev0 = count == 0
        while remaining < threshold and remaining > 1:
            nbits -= 1
            threshold >>= 1
    if remaining != 1:
        raise ValueError("FSE ncount mismatch")
    return norm, acc, (bitpos + 7) // 8


class _FSEState:
    __slots__ = ("table", "state")

    def __init__(self, table, acc, bits: _RBits):
        self.table = table
        self.state = bits.read(acc)

    def symbol(self) -> int:
        return self.table[self.state][0]

    def update(self, bits: _RBits):
        _, nbits, base = self.table[self.state]
        self.state = base + bits.read(nbits)


# ---- Huffman -----------------------------------------------------------

def _huf_read_weights(data: bytes, pos: int):
    """Huffman tree description -> (weights list, newpos)."""
    hdr = data[pos]
    pos += 1
    if hdr >= 128:
        nsym = hdr - 127
        weights = []
        for k in range(nsym):
            b = data[pos + k // 2]
            weights.append((b >> 4) if k % 2 == 0 else (b & 0xF))
        pos += (nsym + 1) // 2
        return weights, pos
    # FSE-compressed weights: two interleaved states, one shared table
    comp = data[pos:pos + hdr]
    pos += hdr
    norm, acc, p2 = _fse_read_ncount(comp, 0, 255)
    table = _fse_build_dtable(norm, acc)
    bits = _RBits(comp[p2:])
    s1 = _FSEState(table, acc, bits)
    s2 = _FSEState(table, acc, bits)
    # two interleaved states; when updating a state would overrun the
    # stream, the OTHER state emits its final symbol and decoding stops
    weights = []
    cur, other = s1, s2
    while len(weights) <= 255:
        weights.append(cur.symbol())
        if bits.navail < cur.table[cur.state][1]:
            weights.append(other.symbol())
            break
        cur.update(bits)
        cur, other = other, cur
    else:
        raise ValueError("too many Huffman weights")
    return weights, pos


def _huf_build_dtable(weights: list[int]):
    """Canonical Huffman decode table: index by `tablelog` peeked bits ->
    (symbol, nbits).  The last symbol's weight is implied: it completes
    sum(2^(w-1)) to the next power of two (RFC 8878 §4.2.1)."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("empty Huffman weights")
    tablelog = total.bit_length()  # smallest log with 2^log > total
    remainder = (1 << tablelog) - total
    if remainder & (remainder - 1):
        raise ValueError("corrupt Huffman weights")
    last_w = remainder.bit_length()
    weights = weights + [last_w]
    maxw = max(weights)
    # fill in weight-ascending order (longest codes at the low indices),
    # ties by symbol value; a weight-w symbol spans 2^(w-1) cells
    table = [None] * (1 << tablelog)
    posn = 0
    for w in range(1, maxw + 1):
        nbits = tablelog + 1 - w
        span = 1 << (w - 1)
        for sym, sw in enumerate(weights):
            if sw == w:
                table[posn:posn + span] = [(sym, nbits)] * span
                posn += span
    if posn != len(table):
        raise ValueError("Huffman table underfilled")
    return table, tablelog


def _huf_decode_stream(data: bytes, table, tablelog: int, out_n: int) -> bytes:
    """One Huffman-coded stream: peek tablelog bits (zero-padded past the
    stream start), emit, consume the symbol's code length."""
    bits = _RBits(data)
    out = bytearray()
    while len(out) < out_n:
        if bits.navail >= tablelog:
            idx = (bits.val >> (bits.navail - tablelog)) & ((1 << tablelog) - 1)
        elif bits.navail > 0:
            idx = (bits.val & ((1 << bits.navail) - 1)) << (tablelog - bits.navail)
        else:
            idx = 0
        sym, nb = table[idx]
        bits.read(nb)  # overflow-safe consume
        out.append(sym)
    return bytes(out)


# ---- literals / sequences ---------------------------------------------

_LL_BASE = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
            16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512,
            1024, 2048, 4096, 8192, 16384, 32768, 65536]
_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11,
                       12, 13, 14, 15, 16]
_ML_BASE = [x + 3 for x in range(32)] + [35, 37, 39, 41, 43, 47, 51, 59,
                                         67, 83, 99, 131, 259, 515, 1027,
                                         2051, 4099, 8195, 16387, 32771,
                                         65539]
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11,
                       12, 13, 14, 15, 16]

_LL_DEFAULT = [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2,
               2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1]
_ML_DEFAULT = [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1]
_OF_DEFAULT = [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, -1, -1, -1, -1, -1]

_LL_DTABLE = _fse_build_dtable(_LL_DEFAULT, 6)
_ML_DTABLE = _fse_build_dtable(_ML_DEFAULT, 6)
_OF_DTABLE = _fse_build_dtable(_OF_DEFAULT, 5)


def _read_literals(block: bytes, pos: int, ctx: dict):
    b0 = block[pos]
    ltype = b0 & 3
    sf = (b0 >> 2) & 3
    if ltype in (0, 1):  # Raw / RLE
        if sf in (0, 2):
            rs = b0 >> 3
            pos += 1
        elif sf == 1:
            rs = (b0 >> 4) | (block[pos + 1] << 4)
            pos += 2
        else:
            rs = (b0 >> 4) | (block[pos + 1] << 4) | (block[pos + 2] << 12)
            pos += 3
        if ltype == 0:
            lits = block[pos:pos + rs]
            pos += rs
        else:
            lits = bytes([block[pos]]) * rs
            pos += 1
        return lits, pos
    # Compressed (2) / Treeless (3)
    if sf == 0:
        h = block[pos] | (block[pos + 1] << 8) | (block[pos + 2] << 16)
        rs = (h >> 4) & 0x3FF
        cs = (h >> 14) & 0x3FF
        pos += 3
        nstreams = 1
    elif sf == 1:
        h = block[pos] | (block[pos + 1] << 8) | (block[pos + 2] << 16)
        rs = (h >> 4) & 0x3FF
        cs = (h >> 14) & 0x3FF
        pos += 3
        nstreams = 4
    elif sf == 2:
        h = (block[pos] | (block[pos + 1] << 8) | (block[pos + 2] << 16)
             | (block[pos + 3] << 24))
        rs = (h >> 4) & 0x3FFF
        cs = (h >> 18) & 0x3FFF
        pos += 4
        nstreams = 4
    else:
        h = int.from_bytes(block[pos:pos + 5], "little")
        rs = (h >> 4) & 0x3FFFF
        cs = (h >> 22) & 0x3FFFF
        pos += 5
        nstreams = 4
    payload = block[pos:pos + cs]
    pos += cs
    p = 0
    if ltype == 2:
        weights, p = _huf_read_weights(payload, 0)
        ctx["huf"] = _huf_build_dtable(weights)
    if ctx.get("huf") is None:
        raise ValueError("treeless literals with no previous table")
    table, tlog = ctx["huf"]
    if nstreams == 1:
        lits = _huf_decode_stream(payload[p:], table, tlog, rs)
    else:
        s1, s2, s3 = struct.unpack_from("<HHH", payload, p)
        p += 6
        sizes = [s1, s2, s3, len(payload) - p - s1 - s2 - s3]
        outs = []
        per = (rs + 3) // 4
        lens = [per, per, per, rs - 3 * per]
        for k in range(4):
            outs.append(_huf_decode_stream(payload[p:p + sizes[k]],
                                           table, tlog, lens[k]))
            p += sizes[k]
        lits = b"".join(outs)
    return lits, pos


def _seq_table(block: bytes, pos: int, mode: int, default, acc_default,
               max_sym, prev_key, ctx: dict):
    if mode == 0:
        return default, acc_default, pos
    if mode == 1:  # RLE: single symbol, 0-bit table
        sym = block[pos]
        return [(sym, 0, 0)], 0, pos + 1
    if mode == 2:
        norm, acc, pos = _fse_read_ncount(block, pos, max_sym)
        table = _fse_build_dtable(norm, acc)
        ctx[prev_key] = (table, acc)
        return table, acc, pos
    if prev_key not in ctx:
        raise ValueError("repeat mode with no previous table")
    table, acc = ctx[prev_key]
    return table, acc, pos


def _decode_block(block: bytes, out: bytearray, ctx: dict):
    lits, pos = _read_literals(block, 0, ctx)
    # sequences header
    b0 = block[pos]
    pos += 1
    if b0 == 0:
        out += lits
        return
    if b0 < 128:
        nseq = b0
    elif b0 < 255:
        nseq = ((b0 - 128) << 8) + block[pos]
        pos += 1
    else:
        nseq = block[pos] + (block[pos + 1] << 8) + 0x7F00
        pos += 2
    modes = block[pos]
    pos += 1
    ll_t, ll_acc, pos = _seq_table(block, pos, (modes >> 6) & 3, _LL_DTABLE,
                                   6, 35, "ll", ctx)
    of_t, of_acc, pos = _seq_table(block, pos, (modes >> 4) & 3, _OF_DTABLE,
                                   5, 31, "of", ctx)
    ml_t, ml_acc, pos = _seq_table(block, pos, (modes >> 2) & 3, _ML_DTABLE,
                                   6, 52, "ml", ctx)
    bits = _RBits(block[pos:])
    ll_s = _FSEState(ll_t, ll_acc, bits)
    of_s = _FSEState(of_t, of_acc, bits)
    ml_s = _FSEState(ml_t, ml_acc, bits)
    rep = ctx.setdefault("rep", [1, 4, 8])
    lpos = 0
    for i in range(nseq):
        of_code = of_s.symbol()
        ml_code = ml_s.symbol()
        ll_code = ll_s.symbol()
        of_val = (1 << of_code) + bits.read(of_code)
        ml = _ML_BASE[ml_code] + bits.read(_ML_BITS[ml_code])
        ll = _LL_BASE[ll_code] + bits.read(_LL_BITS[ll_code])
        # repeat-offset resolution (RFC 8878 §3.1.1.5)
        if of_val > 3:
            offset = of_val - 3
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        else:
            idx = of_val - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = rep[0]
            elif idx == 1:
                offset = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            elif idx == 2:
                offset = rep[2]
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            else:  # idx == 3: repeat offset 1 minus one
                offset = rep[0] - 1
                if offset <= 0:
                    raise ValueError("invalid repeat offset")
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
        out += lits[lpos:lpos + ll]
        lpos += ll
        # overlap-safe match copy
        start = len(out) - offset
        if start < 0:
            raise ValueError("offset beyond window")
        for k in range(ml):
            out.append(out[start + k])
        if i < nseq - 1:
            ll_s.update(bits)
            ml_s.update(bits)
            of_s.update(bits)
    out += lits[lpos:]


def decompress_native(data: bytes) -> bytes:
    """Decode one zstd frame (pure Python, RFC 8878)."""
    if len(data) < 4:
        raise ValueError("not a zstd frame")
    magic = struct.unpack("<I", data[:4])[0]
    if magic != 0xFD2FB528:
        if 0x184D2A50 <= magic <= 0x184D2A5F:  # skippable frame
            size = struct.unpack("<I", data[4:8])[0]
            return decompress_native(data[8 + size:])
        raise ValueError("bad zstd magic")
    fhd = data[4]
    fcs_flag = fhd >> 6
    single = (fhd >> 5) & 1
    checksum = (fhd >> 2) & 1
    pos = 5
    if not single:
        pos += 1
    pos += (0, 1, 2, 4)[fhd & 3]
    pos += (1 if single else 0, 2, 4, 8)[fcs_flag] if (fcs_flag or single) else 0
    out = bytearray()
    ctx: dict = {}
    while True:
        bh = data[pos] | (data[pos + 1] << 8) | (data[pos + 2] << 16)
        pos += 3
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 0:
            out += data[pos:pos + bsize]
            pos += bsize
        elif btype == 1:
            out += bytes([data[pos]]) * bsize
            pos += 1
        elif btype == 2:
            _decode_block(data[pos:pos + bsize], out, ctx)
            pos += bsize
        else:
            raise ValueError("reserved block type")
        if last:
            break
    if checksum:
        pos += 4
    return bytes(out)
