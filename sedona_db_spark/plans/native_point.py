"""Bit-exact native (pure whole-stage-codegen) coordinate extraction
from 2D little-endian WKB points.

A 2D point's WKB is 21 bytes: byte-order (0x01 = little-endian), uint32
type tag (1), then x and y as IEEE-754 doubles.  Spark SQL has no
reinterpret-bytes-as-double builtin, so the doubles are reconstructed
from their bit pattern with integer arithmetic that is exact at every
step:

- the 8 coordinate bytes are hex-encoded (``hex(substring(..))``),
  byte-reversed textually into big-endian order, and split into two
  32-bit halves via ``conv(.., 16, 10)`` (each half < 2^32, so the
  bigint cast cannot overflow — one 64-bit conv would);
- sign / exponent / mantissa come out of the halves with div/mod
  (exact on bigint);
- the value is rebuilt as ``(1 + mant/2^52) * 2^(e-1023)``: ``mant``
  (< 2^52) casts to double exactly, division by 2^52 is exact, the
  1 + frac sum fits 53 significand bits exactly, and the final multiply
  scales by a power of two (exact, no rounding).  Subnormals take
  ``mant * 2^-1074`` (exact for the same reason), Inf/NaN are emitted
  literally.  A randomized roundtrip test pins bit-equality against the
  Python ST_X/ST_Y kernels over normals, subnormals, zeros, infinities
  and NaN (tests/test_native_point.py).

Callers must only substitute these for ST_X/ST_Y/distance kernels under
a point CERTIFICATE (plan-level ST_Point constructor proof, or a
write-time-verified layout property): the guard returns NULL for
anything that is not a 21-byte LE point WKB, which is correct for the
certified NULL-geometry case but NOT a general ST_X implementation
(big-endian input, Z/M points and empties must keep taking the kernel).
"""

from __future__ import annotations

# 0x01 (little-endian) + uint32 1 (point); X'..' literal form
_PT_HEADER_HEX = "0101000000"

# byte-reverse a 16-char hex string (little-endian bytes -> big-endian)
_X_OFF = 6    # 1-indexed offset of x's 8 bytes in the 21-byte WKB
_Y_OFF = 14


def _u32(col: str, off: int, hi_half: bool) -> str:
    """SQL for the big-endian hi/lo 32-bit half of the double at
    1-indexed byte offset ``off`` of binary column ``col``, as BIGINT.

    Little-endian storage means the MOST significant byte is the LAST
    of the 8: hi half = bytes 8..5 reversed, lo half = bytes 4..1."""
    h = f"hex(substring({col}, {off}, 8))"
    chars = (15, 13, 11, 9) if hi_half else (7, 5, 3, 1)
    be = " || ".join(f"substr({h}, {i}, 2)" for i in chars)
    return f"CAST(conv({be}, 16, 10) AS BIGINT)"


def _double_bits(col: str, off: int) -> str:
    """SQL reconstructing the IEEE-754 double stored little-endian at
    byte offset ``off`` of ``col``.  Exact for every double (see module
    docstring)."""
    hi = _u32(col, off, True)
    lo = _u32(col, off, False)
    sign = f"IF({hi} >= 2147483648, -1.0D, 1.0D)"
    exp = f"(({hi} DIV 1048576) % 2048)"
    mant = f"((({hi} % 1048576) * 4294967296) + {lo})"
    frac = f"(CAST({mant} AS DOUBLE) / 4503599627370496.0D)"
    return (
        f"CASE WHEN {exp} = 0 THEN "
        f"{sign} * CAST({mant} AS DOUBLE) * POW(2.0D, -1074.0D) "
        f"WHEN {exp} = 2047 THEN "
        f"IF({mant} = 0, {sign} * CAST('Infinity' AS DOUBLE), "
        f"CAST('NaN' AS DOUBLE)) "
        f"ELSE {sign} * (1.0D + {frac}) "
        f"* POW(2.0D, CAST({exp} - 1023 AS DOUBLE)) END"
    )


def point_guard_sql(col: str) -> str:
    """Boolean SQL: ``col`` is a 21-byte little-endian 2D point WKB."""
    return (f"(length({col}) = 21 AND "
            f"substring({col}, 1, 5) = X'{_PT_HEADER_HEX}')")


def _is_nan_sql(col: str, off: int) -> str:
    """Boolean SQL: the double at byte offset ``off`` is a NaN bit
    pattern (exp all-ones, mantissa non-zero)."""
    hi = _u32(col, off, True)
    lo = _u32(col, off, False)
    return (f"((({hi} DIV 1048576) % 2048) = 2047 AND "
            f"((({hi} % 1048576) * 4294967296) + {lo}) != 0)")


def point_nan_free_sql(col: str) -> str:
    """Boolean SQL: certified point WKB with non-NaN coordinates.

    The ST_Point kernel (functions/kernels.py k_point) returns NULL for
    any NaN input, so a plan-certified column never stores NaN coords —
    write-time certification (certify_point_table) must enforce the same
    invariant, because the kernels treat NaN-coordinate points as empty
    (ST_X/ST_Y -> NULL) while the native extraction would yield NaN."""
    return (f"({point_guard_sql(col)} AND NOT {_is_nan_sql(col, _X_OFF)} "
            f"AND NOT {_is_nan_sql(col, _Y_OFF)})")


def point_x_sql(col: str) -> str:
    """Native x of a certified LE point WKB column (NULL otherwise)."""
    return (f"(CASE WHEN {point_guard_sql(col)} THEN "
            f"{_double_bits(col, _X_OFF)} END)")


def point_y_sql(col: str) -> str:
    """Native y of a certified LE point WKB column (NULL otherwise)."""
    return (f"(CASE WHEN {point_guard_sql(col)} THEN "
            f"{_double_bits(col, _Y_OFF)} END)")
