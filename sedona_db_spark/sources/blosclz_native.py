"""BloscLZ (blosc inner codec 0) — from-scratch decoder + encoder.

Format: the public c-blosc ``blosclz.c`` instruction stream (a FastLZ
level-1 derivative).  A chunk is a sequence of instructions, each selected
by a control byte:

- ``ctrl < 32``: literal run of ``ctrl + 1`` bytes copied verbatim.
- ``ctrl >= 32``: back-reference.  ``len = (ctrl >> 5) - 1`` (3 bits);
  when the 3-bit field is 7 the length extends with add-on bytes, each
  adding its value, chained while the add-on is 255.  The copy length is
  ``len + 3``.  Offset: ``ofs = (ctrl & 31) << 8`` plus a following byte
  ``code``; the match source is ``op - ofs - code - 1`` (distance >= 1,
  max 8191).  When ``code == 255`` AND the 5-bit field is all-ones, a far
  match follows: a 16-bit big-endian offset ``fofs`` replaces the base and
  the source is ``op - fofs - 8191 - 1``.
- The FIRST control byte of a stream carries only its low 5 bits (always
  a literal run); overlapping copies replay already-written output.

Oracle status (documented honestly): this container has NO blosclz
producer (no libblosc, no numcodecs, no fixture payloads in the
reference), so unlike the repo's other codecs there is no ecosystem
cross-validation.  Correctness rests on (a) instruction-level vectors
hand-assembled per the format above with independently computed expected
output, (b) roundtrip property tests through the repo's own greedy
encoder across data classes, and (c) the blosc container tests, whose
headers/filters are shared with the four ecosystem-validated inner
codecs.  Reference parity: the reference reads blosclz Zarr chunks
through its vendored c-blosc (rust/sedona-raster-zarr).
"""

from __future__ import annotations

MAX_DISTANCE = 8191


def blosclz_decompress(src: bytes, out_size: int) -> bytes:
    """Decode one blosclz-compressed block to exactly ``out_size`` bytes."""
    ip = 0
    n = len(src)
    out = bytearray()
    if n == 0:
        if out_size:
            raise ValueError("empty blosclz input")
        return b""
    ctrl = src[ip] & 31
    ip += 1
    while True:
        if ctrl >= 32:
            length = (ctrl >> 5) - 1
            ofs = (ctrl & 31) << 8
            if length == 6:           # 3-bit field was 7: extended length
                while True:
                    code = src[ip]
                    ip += 1
                    length += code
                    if code != 255:
                        break
            code = src[ip]
            ip += 1
            ref = len(out) - ofs - code
            if code == 255 and ofs == (31 << 8):
                fofs = (src[ip] << 8) | src[ip + 1]
                ip += 2
                ref = len(out) - fofs - MAX_DISTANCE
            ref -= 1                  # distance is 1-based
            length += 3
            if ref < 0:
                raise ValueError("blosclz back-reference before start")
            if ref == len(out) - 1:   # run of the previous byte
                out.extend(out[ref:ref + 1] * length)
            else:
                for _ in range(length):   # overlap-safe byte copy
                    out.append(out[ref])
                    ref += 1
        else:
            count = ctrl + 1
            if ip + count > n:
                raise ValueError("truncated blosclz literal run")
            out += src[ip:ip + count]
            ip += count
        if ip >= n:
            break
        ctrl = src[ip]
        ip += 1
    if len(out) != out_size:
        raise ValueError(
            f"blosclz output size mismatch: {len(out)} != {out_size}")
    return bytes(out)


def _emit_literals(out: bytearray, buf: bytes, start: int, end: int) -> None:
    i = start
    while i < end:
        run = min(32, end - i)
        out.append(run - 1)
        out += buf[i:i + run]
        i += run


def blosclz_compress(src: bytes) -> bytes:
    """Greedy blosclz encoder (hash-chain-free: scan for the longest match
    at the previous occurrence of a 3-byte prefix).  Produces streams any
    conforming decoder accepts; optimality is not a goal — the Zarr writer
    path only needs valid output."""
    n = len(src)
    out = bytearray()
    if n == 0:
        return b""
    table: dict[bytes, int] = {}
    anchor = 0               # start of pending literal run
    i = 0
    # the first instruction must be a literal run (first ctrl & 31)
    first = True
    while i + 3 <= n:
        key = src[i:i + 3]
        cand = table.get(key)
        table[key] = i
        # dist01 = distance - 1; near form encodes [0, MAX_DISTANCE-1],
        # the all-ones pattern (== MAX_DISTANCE) is the far-match marker,
        # far form reaches MAX_DISTANCE + 65535
        dist01 = None if cand is None else i - cand - 1
        if (cand is not None and dist01 <= MAX_DISTANCE + 0xFFFF
                and not (first and anchor == i)):
            # extend the match
            length = 3
            limit = n - i
            while length < limit and src[cand + length] == src[i + length]:
                length += 1
            _emit_literals(out, src, anchor, i)
            first = False
            lfield = length - 3
            far = dist01 >= MAX_DISTANCE
            if far:
                ofs_hi, code = 31, 255
            else:
                ofs_hi, code = dist01 >> 8, dist01 & 255
            if lfield < 6:
                out.append(((lfield + 1) << 5) | ofs_hi)
            else:
                out.append((7 << 5) | ofs_hi)
                rem = lfield - 6
                while rem >= 255:
                    out.append(255)
                    rem -= 255
                out.append(rem)
            out.append(code)
            if far:
                fofs = dist01 - MAX_DISTANCE
                out.append((fofs >> 8) & 255)
                out.append(fofs & 255)
            i += length
            anchor = i
        else:
            i += 1
    _emit_literals(out, src, anchor, n)
    return bytes(out)
