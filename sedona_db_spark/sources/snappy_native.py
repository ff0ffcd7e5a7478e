"""Raw Snappy block-format codec — no external deps.

Blosc chunks with the snappy inner codec (compressor code 2) carry raw
snappy blocks; this decoder lets the Zarr reader open them natively.
Implemented from the public Snappy format description
(google/snappy format_description.txt):

- preamble: uncompressed length as a little-endian varint;
- elements: tag byte whose low 2 bits select the type —
  00 literal (length 1..60 inline, 61..64 -> 1..4 extra length bytes),
  01 copy with 1-byte offset (len 4..11, offset 11 bits),
  10 copy with 2-byte offset, 11 copy with 4-byte offset.

Cross-validated against pyarrow's bundled snappy in both directions in
``tests/test_sources_wave2.py`` (pyarrow-compressed data decodes here;
data compressed here decodes through pyarrow).
"""

from __future__ import annotations


def _read_varint(src: bytes, pos: int) -> tuple[int, int]:
    val = 0
    shift = 0
    while True:
        b = src[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7
        if shift > 35:
            raise ValueError("bad snappy varint")


def snappy_decompress(src: bytes) -> bytes:
    """Raw snappy block -> bytes."""
    n, pos = _read_varint(src, 0)
    out = bytearray()
    ln = len(src)
    while pos < ln:
        tag = src[pos]
        pos += 1
        kind = tag & 0x3
        if kind == 0:                              # literal
            length = (tag >> 2) + 1
            if length > 60:
                nb = length - 60
                length = int.from_bytes(src[pos:pos + nb], "little") + 1
                pos += nb
            out += src[pos:pos + length]
            pos += length
            continue
        if kind == 1:                              # copy, 1-byte offset
            length = ((tag >> 2) & 0x7) + 4
            offset = ((tag >> 5) << 8) | src[pos]
            pos += 1
        elif kind == 2:                            # copy, 2-byte offset
            length = (tag >> 2) + 1
            offset = int.from_bytes(src[pos:pos + 2], "little")
            pos += 2
        else:                                      # copy, 4-byte offset
            length = (tag >> 2) + 1
            offset = int.from_bytes(src[pos:pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("corrupt snappy stream (bad offset)")
        start = len(out) - offset
        if offset >= length:                       # non-overlapping: slice
            out += out[start:start + length]
        else:
            for i in range(length):                # overlap-safe byte copy
                out.append(out[start + i])
    if len(out) != n:
        raise ValueError(
            f"snappy length mismatch: got {len(out)}, expected {n}")
    return bytes(out)


def snappy_compress(src: bytes) -> bytes:
    """Greedy hash-match snappy encoder (for fixtures and the writer).
    Emits standard literal / copy-1 / copy-2 elements; always a valid
    stream for any input."""
    out = bytearray()
    n = len(src)
    # varint length preamble
    v = n
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            break

    def emit_literal(start: int, end: int) -> None:
        while start < end:
            run = min(end - start, 1 << 16)
            if run <= 60:
                out.append((run - 1) << 2)
            else:
                nb = 1 if run <= 256 else 2
                out.append((59 + nb) << 2)  # tag length 60/61 = 1/2 bytes
                out.extend((run - 1).to_bytes(nb, "little"))
            out.extend(src[start:start + run])
            start += run

    table: dict[bytes, int] = {}
    pos = 0
    lit_start = 0
    while pos + 4 <= n:
        key = src[pos:pos + 4]
        cand = table.get(key)
        table[key] = pos
        if cand is not None and pos - cand <= 0xFFFF:
            length = 4
            maxlen = min(n - pos, 64)
            while (length < maxlen
                   and src[cand + length] == src[pos + length]):
                length += 1
            emit_literal(lit_start, pos)
            offset = pos - cand
            if length <= 11 and offset < 2048:
                out.append(0x1 | ((length - 4) << 2) | ((offset >> 8) << 5))
                out.append(offset & 0xFF)
            else:
                out.append(0x2 | ((length - 1) << 2))
                out.extend(offset.to_bytes(2, "little"))
            pos += length
            lit_start = pos
        else:
            pos += 1
    emit_literal(lit_start, n)
    return bytes(out)
