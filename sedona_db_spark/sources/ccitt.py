"""CCITT Group 3 / Group 4 bilevel fax codecs (TIFF compressions 2/3/4).

The reference reads fax-compressed TIFFs through GDAL
(/root/reference/rust/sedona-raster-gdal/src/lib.rs:21-35); GDAL is
unavailable here, so the coders are implemented directly from the public
ITU-T T.4 (MH/MR) and T.6 (MMR) recommendations:

- compression 2  — "CCITT RLE": Modified Huffman 1-D rows, each row
  starting on a byte boundary, no EOL codes;
- compression 3  — Group 3: EOL-delimited rows; 1-D always, 2-D rows
  (tag bit after EOL) when T4Options bit 0 is set; optional fill bits;
- compression 4  — Group 4: pure 2-D (MMR) coding against a reference
  line, terminated by EOFB.

Both directions are provided (decode for reading, encode for the writer
and fixtures) and cross-validated against libtiff's fax codec in
``tests/test_raster.py`` — libtiff-written files must decode natively
and natively-written files must read back through ``TIFFReadScanline``.

Pixel convention follows TIFF PhotometricInterpretation 0 (MinIsWhite,
the fax default): decoded arrays hold 0 = white, 1 = black.
"""

from __future__ import annotations

import numpy as np

# ITU-T T.4 Modified Huffman run-length code tables: run -> (bits, nbits).
# Terminating codes (0..63) and makeup codes (64..1728) are per-colour;
# the extended makeup codes (1792..2560) are shared by both colours.
_WHITE_CODES = {
    0: ("00110101"), 1: ("000111"), 2: ("0111"), 3: ("1000"),
    4: ("1011"), 5: ("1100"), 6: ("1110"), 7: ("1111"),
    8: ("10011"), 9: ("10100"), 10: ("00111"), 11: ("01000"),
    12: ("001000"), 13: ("000011"), 14: ("110100"), 15: ("110101"),
    16: ("101010"), 17: ("101011"), 18: ("0100111"), 19: ("0001100"),
    20: ("0001000"), 21: ("0010111"), 22: ("0000011"), 23: ("0000100"),
    24: ("0101000"), 25: ("0101011"), 26: ("0010011"), 27: ("0100100"),
    28: ("0011000"), 29: ("00000010"), 30: ("00000011"), 31: ("00011010"),
    32: ("00011011"), 33: ("00010010"), 34: ("00010011"), 35: ("00010100"),
    36: ("00010101"), 37: ("00010110"), 38: ("00010111"), 39: ("00101000"),
    40: ("00101001"), 41: ("00101010"), 42: ("00101011"), 43: ("00101100"),
    44: ("00101101"), 45: ("00000100"), 46: ("00000101"), 47: ("00001010"),
    48: ("00001011"), 49: ("01010010"), 50: ("01010011"), 51: ("01010100"),
    52: ("01010101"), 53: ("00100100"), 54: ("00100101"), 55: ("01011000"),
    56: ("01011001"), 57: ("01011010"), 58: ("01011011"), 59: ("01001010"),
    60: ("01001011"), 61: ("00110010"), 62: ("00110011"), 63: ("00110100"),
    64: ("11011"), 128: ("10010"), 192: ("010111"), 256: ("0110111"),
    320: ("00110110"), 384: ("00110111"), 448: ("01100100"),
    512: ("01100101"), 576: ("01101000"), 640: ("01100111"),
    704: ("011001100"), 768: ("011001101"), 832: ("011010010"),
    896: ("011010011"), 960: ("011010100"), 1024: ("011010101"),
    1088: ("011010110"), 1152: ("011010111"), 1216: ("011011000"),
    1280: ("011011001"), 1344: ("011011010"), 1408: ("011011011"),
    1472: ("010011000"), 1536: ("010011001"), 1600: ("010011010"),
    1664: ("011000"), 1728: ("010011011"),
}
_BLACK_CODES = {
    0: ("0000110111"), 1: ("010"), 2: ("11"), 3: ("10"),
    4: ("011"), 5: ("0011"), 6: ("0010"), 7: ("00011"),
    8: ("000101"), 9: ("000100"), 10: ("0000100"), 11: ("0000101"),
    12: ("0000111"), 13: ("00000100"), 14: ("00000111"),
    15: ("000011000"), 16: ("0000010111"), 17: ("0000011000"),
    18: ("0000001000"), 19: ("00001100111"), 20: ("00001101000"),
    21: ("00001101100"), 22: ("00000110111"), 23: ("00000101000"),
    24: ("00000010111"), 25: ("00000011000"), 26: ("000011001010"),
    27: ("000011001011"), 28: ("000011001100"), 29: ("000011001101"),
    30: ("000001101000"), 31: ("000001101001"), 32: ("000001101010"),
    33: ("000001101011"), 34: ("000011010010"), 35: ("000011010011"),
    36: ("000011010100"), 37: ("000011010101"), 38: ("000011010110"),
    39: ("000011010111"), 40: ("000001101100"), 41: ("000001101101"),
    42: ("000011011010"), 43: ("000011011011"), 44: ("000001010100"),
    45: ("000001010101"), 46: ("000001010110"), 47: ("000001010111"),
    48: ("000001100100"), 49: ("000001100101"), 50: ("000001010010"),
    51: ("000001010011"), 52: ("000000100100"), 53: ("000000110111"),
    54: ("000000111000"), 55: ("000000100111"), 56: ("000000101000"),
    57: ("000001011000"), 58: ("000001011001"), 59: ("000000101011"),
    60: ("000000101100"), 61: ("000001011010"), 62: ("000001100110"),
    63: ("000001100111"),
    64: ("0000001111"), 128: ("000011001000"), 192: ("000011001001"),
    256: ("000001011011"), 320: ("000000110011"), 384: ("000000110100"),
    448: ("000000110101"), 512: ("0000001101100"), 576: ("0000001101101"),
    640: ("0000001001010"), 704: ("0000001001011"), 768: ("0000001001100"),
    832: ("0000001001101"), 896: ("0000001110010"), 960: ("0000001110011"),
    1024: ("0000001110100"), 1088: ("0000001110101"),
    1152: ("0000001110110"), 1216: ("0000001110111"),
    1280: ("0000001010010"), 1344: ("0000001010011"),
    1408: ("0000001010100"), 1472: ("0000001010101"),
    1536: ("0000001011010"), 1600: ("0000001011011"),
    1664: ("0000001100100"), 1728: ("0000001100101"),
}
_EXT_CODES = {  # shared extended makeup, 1792..2560
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

_EOL = "000000000001"

# decode maps: (nbits, value) -> run
def _decode_map(codes):
    m = {}
    for run, bits in codes.items():
        m[(len(bits), int(bits, 2))] = run
    for run, bits in _EXT_CODES.items():
        m[(len(bits), int(bits, 2))] = run
    return m


_WHITE_DEC = _decode_map(_WHITE_CODES)
_BLACK_DEC = _decode_map(_BLACK_CODES)
_MAX_CODE_LEN = 14


class _BitReader:
    """MSB-first bit reader over bytes."""

    __slots__ = ("bits", "pos", "n")

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0
        self.n = len(self.bits)

    def read_run(self, white: bool) -> int:
        """One complete MH run length (makeup chain + terminating code)."""
        total = 0
        dec = _WHITE_DEC if white else _BLACK_DEC
        while True:
            run = self._read_code(dec)
            total += run
            if run < 64:
                return total
            # makeup code: a terminating code must follow

    def _read_code(self, dec) -> int:
        acc = 0
        ln = 0
        while ln < _MAX_CODE_LEN:
            if self.pos >= self.n:
                raise ValueError("truncated CCITT stream")
            acc = (acc << 1) | int(self.bits[self.pos])
            self.pos += 1
            ln += 1
            run = dec.get((ln, acc))
            if run is not None:
                return run
        raise ValueError(f"bad CCITT code near bit {self.pos}")

    def peek(self, k: int) -> int:
        end = min(self.pos + k, self.n)
        v = 0
        for i in range(self.pos, end):
            v = (v << 1) | int(self.bits[i])
        v <<= k - (end - self.pos)
        return v

    def skip(self, k: int) -> None:
        self.pos += k

    def align_byte(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def sync_eol(self) -> bool:
        """Scan forward to just past the next EOL (tolerates fill bits).
        Returns False when the stream is exhausted instead."""
        zeros = 0
        while self.pos < self.n:
            b = int(self.bits[self.pos])
            self.pos += 1
            if b == 0:
                zeros += 1
            elif zeros >= 11:
                return True
            else:
                zeros = 0
        return False


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, bits: str) -> None:
        for c in bits:
            self.acc = (self.acc << 1) | (c == "1")
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def write_run(self, run: int, white: bool) -> None:
        codes = _WHITE_CODES if white else _BLACK_CODES
        while run > 2623:  # 2560 makeup + 63 terminating
            self.write(_EXT_CODES[2560])
            run -= 2560
        if run >= 64:
            makeup = min(run & ~63, 1728) if run < 1792 else (run & ~63)
            if makeup >= 1792:
                self.write(_EXT_CODES[makeup])
            else:
                self.write(codes[makeup])
            run -= makeup
        self.write(codes[run])

    def align_byte(self) -> None:
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.out.append(self.acc)
            self.acc = 0
            self.nbits = 0

    def getvalue(self) -> bytes:
        self.align_byte()
        return bytes(self.out)


def _transitions(row: np.ndarray) -> list[int]:
    """Changing-element positions of a 0/1 row (first element treated as a
    change from an imaginary white pixel before the row)."""
    diff = np.flatnonzero(np.diff(np.concatenate(([0], row))))
    return diff.tolist()


def _row_from_transitions(trans: list[int], width: int) -> np.ndarray:
    row = np.zeros(width, dtype=np.uint8)
    for i in range(0, len(trans), 2):
        start = trans[i]
        end = trans[i + 1] if i + 1 < len(trans) else width
        row[start:end] = 1
    return row


def _decode_row_1d(br: _BitReader, width: int) -> list[int]:
    """One MH-coded row -> transition positions."""
    trans = []
    pos = 0
    white = True
    while pos < width:
        run = br.read_run(white)
        pos += run
        if pos > width:
            raise ValueError("CCITT run overflows row width")
        trans.append(pos)
        white = not white
    if trans and trans[-1] == width:
        trans.pop()
    return trans


def _decode_row_2d(br: _BitReader, ref: list[int], width: int) -> list[int]:
    """One 2-D (MR/MMR) coded row against reference transitions."""
    cur: list[int] = []
    a0 = -1
    color_white = True
    nref = len(ref)
    base = 0                # monotone scan pointer (a0 never decreases)
    while a0 < width:
        # b1: first reference transition > a0 whose parity matches the
        # next transition to be coded (even index = white->black)
        while base < nref and ref[base] <= a0:
            base += 1
        idx = base
        if (idx & 1) != (len(cur) & 1):
            idx += 1
        b1 = ref[idx] if idx < nref else width
        b2 = ref[idx + 1] if idx + 1 < nref else width

        # mode code
        if br.peek(1) == 0b1:                       # V0
            br.skip(1)
            a1 = b1
            cur.append(a1)
            a0 = a1
            color_white = not color_white
        elif br.peek(3) == 0b011:                   # VR1
            br.skip(3)
            cur.append(b1 + 1)
            a0 = b1 + 1
            color_white = not color_white
        elif br.peek(3) == 0b010:                   # VL1
            br.skip(3)
            cur.append(b1 - 1)
            a0 = b1 - 1
            color_white = not color_white
        elif br.peek(3) == 0b001:                   # H: two MH runs
            br.skip(3)
            start = max(a0, 0)
            r1 = br.read_run(color_white)
            r2 = br.read_run(not color_white)
            a1 = start + r1
            a2 = a1 + r2
            cur.append(a1)
            cur.append(a2)
            a0 = a2
        elif br.peek(4) == 0b0001:                  # P (pass)
            br.skip(4)
            a0 = b2
        elif br.peek(6) == 0b000011:                # VR2
            br.skip(6)
            cur.append(b1 + 2)
            a0 = b1 + 2
            color_white = not color_white
        elif br.peek(6) == 0b000010:                # VL2
            br.skip(6)
            cur.append(b1 - 2)
            a0 = b1 - 2
            color_white = not color_white
        elif br.peek(7) == 0b0000011:               # VR3
            br.skip(7)
            cur.append(b1 + 3)
            a0 = b1 + 3
            color_white = not color_white
        elif br.peek(7) == 0b0000010:               # VL3
            br.skip(7)
            cur.append(b1 - 3)
            a0 = b1 - 3
            color_white = not color_white
        else:
            raise ValueError(f"bad 2-D mode code near bit {br.pos}")
    while cur and cur[-1] >= width:
        cur.pop()
    return cur


def g4_decode(data: bytes, width: int, height: int) -> np.ndarray:
    """T.6 (Group 4 MMR) -> (height, width) uint8, 0=white 1=black."""
    br = _BitReader(data)
    ref: list[int] = []           # all-white reference line above row 0
    out = np.zeros((height, width), dtype=np.uint8)
    for r in range(height):
        cur = _decode_row_2d(br, ref, width)
        out[r] = _row_from_transitions(cur, width)
        ref = cur
    return out


def g4_encode(arr: np.ndarray) -> bytes:
    """(h, w) 0/1 array -> T.6 stream (EOFB-terminated)."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape
    bw = _BitWriter()
    ref: list[int] = []
    for r in range(h):
        cur = _transitions(arr[r])
        _encode_row_2d(bw, cur, ref, w)
        ref = cur
    bw.write(_EOL + _EOL)  # EOFB
    return bw.getvalue()


def _encode_row_2d(bw: _BitWriter, cur: list[int], ref: list[int],
                   width: int) -> None:
    a0 = -1
    color_white = True
    ncur = len(cur)
    nref = len(ref)
    ci = 0           # monotone pointers: a0 never decreases
    rbase = 0
    while a0 < width:
        # a1: next transition on the coding line beyond a0; transitions
        # alternate colours, so no parity fix-up is needed on cur
        while ci < ncur and cur[ci] <= a0:
            ci += 1
        a1 = cur[ci] if ci < ncur else width
        a2 = cur[ci + 1] if ci + 1 < ncur else width
        while rbase < nref and ref[rbase] <= a0:
            rbase += 1
        idx = rbase
        if (idx & 1) != (ci & 1):
            idx += 1
        b1 = ref[idx] if idx < nref else width
        b2 = ref[idx + 1] if idx + 1 < nref else width

        if b2 < a1:                                  # pass
            bw.write("0001")
            a0 = b2
        elif abs(a1 - b1) <= 3:                      # vertical
            bw.write({0: "1", 1: "011", 2: "000011", 3: "0000011",
                      -1: "010", -2: "000010", -3: "0000010"}[a1 - b1])
            a0 = a1
            color_white = not color_white
        else:                                        # horizontal
            start = max(a0, 0)
            bw.write("001")
            bw.write_run(a1 - start, color_white)
            bw.write_run(a2 - a1, not color_white)
            a0 = a2


def mh_decode(data: bytes, width: int, height: int) -> np.ndarray:
    """TIFF compression 2 (Modified Huffman RLE): 1-D rows, each row
    starting on a byte boundary, no EOLs."""
    br = _BitReader(data)
    out = np.zeros((height, width), dtype=np.uint8)
    for r in range(height):
        br.align_byte()
        out[r] = _row_from_transitions(_decode_row_1d(br, width), width)
    return out


def mh_encode(arr: np.ndarray) -> bytes:
    arr = np.asarray(arr, dtype=np.uint8)
    bw = _BitWriter()
    for r in range(arr.shape[0]):
        bw.align_byte()
        _encode_row_1d(bw, arr[r])
    return bw.getvalue()


def _encode_row_1d(bw: _BitWriter, row: np.ndarray) -> None:
    trans = _transitions(row)
    width = len(row)
    pos = 0
    white = True
    for t in trans + [width]:
        if t == pos and not white:
            # zero-length white run never happens except leading black
            pass
        bw.write_run(t - pos, white)
        pos = t
        white = not white
        if pos >= width:
            break


def g3_decode(data: bytes, width: int, height: int,
              two_d: bool = False) -> np.ndarray:
    """TIFF compression 3 (Group 3): EOL-delimited rows; with ``two_d``
    each EOL carries a tag bit selecting 1-D (1) or 2-D (0) coding for
    the following row."""
    br = _BitReader(data)
    out = np.zeros((height, width), dtype=np.uint8)
    ref: list[int] = []
    for r in range(height):
        if not br.sync_eol():
            raise ValueError(f"missing G3 EOL before row {r}")
        if two_d:
            tag = br.peek(1)
            br.skip(1)
            if tag == 1:
                cur = _decode_row_1d(br, width)
            else:
                cur = _decode_row_2d(br, ref, width)
        else:
            cur = _decode_row_1d(br, width)
        out[r] = _row_from_transitions(cur, width)
        ref = cur
    return out


def g3_encode(arr: np.ndarray, two_d: bool = False,
              k: int = 2) -> bytes:
    """Group 3 encoder. 1-D always, or T.4 2-D with a 1-D row every
    ``k`` rows (the K parameter; tag bit after each EOL)."""
    arr = np.asarray(arr, dtype=np.uint8)
    bw = _BitWriter()
    ref: list[int] = []
    for r in range(arr.shape[0]):
        bw.write(_EOL)
        if two_d:
            if r % k == 0:
                bw.write("1")
                _encode_row_1d(bw, arr[r])
            else:
                bw.write("0")
                _encode_row_2d(bw, _transitions(arr[r]), ref, arr.shape[1])
            ref = _transitions(arr[r])
        else:
            _encode_row_1d(bw, arr[r])
    # RTC: six consecutive EOLs
    for _ in range(6):
        bw.write(_EOL)
    return bw.getvalue()
