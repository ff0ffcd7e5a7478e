"""Native GIF87a/89a codec — no PIL/giflib dependency at runtime.

The multimodal pipeline treats GIF as a first-class image/animation
container (the reference routes images through its GDAL/Python layer;
GDAL's GIF driver serves the same role there).  Implemented from the
public GIF89a specification:

- logical screen descriptor + global/local color tables;
- image descriptors incl. the 4-pass row interlace;
- GIF-variant LZW (LSB-first bit packing, variable 3..12-bit codes,
  clear/end codes, NO early-change — unlike TIFF's LZW);
- graphic control extensions (transparency index, frame delay);
- multi-frame animations with per-frame disposal compositing
  (methods 0/1 draw-over, 2 restore-background, 3 restore-previous).

Cross-validated against giflib (libgif.so) in both directions in
``tests/test_operators.py``: giflib-written files decode natively and
natively-written files read back through DGifSlurp.
"""

from __future__ import annotations

import numpy as np

_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def _lzw_decode_gif(data: bytes, min_code_size: int, npix: int) -> np.ndarray:
    """GIF LZW stream -> palette indices (LSB-first packing)."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1

    reset()
    out = bytearray()
    acc = nbits = 0
    prev = b""
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = b""
                continue
            if code == end:
                return np.frombuffer(bytes(out[:npix]), np.uint8).copy()
            if not prev:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                if len(table) < 4096:
                    table.append(entry)
            else:
                raise ValueError("corrupt GIF LZW stream")
            out += entry
            prev = entry
            if len(table) >= (1 << width) and width < 12:
                width += 1
            if len(out) >= npix:
                return np.frombuffer(bytes(out[:npix]), np.uint8).copy()
    return np.frombuffer(bytes(out[:npix].ljust(npix, b"\0")),
                         np.uint8).copy()


def _lzw_encode_gif(indices: np.ndarray, min_code_size: int) -> bytes:
    """Palette indices -> GIF LZW stream (for the writer/fixtures)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    nxt = end + 1
    emit(clear, width)
    cur = b""
    for v in indices.tobytes():
        cand = cur + bytes([v])
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        table[cand] = nxt
        nxt += 1
        if nxt - 1 == (1 << width) and width < 12:
            width += 1
        if nxt >= 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            nxt = end + 1
            width = min_code_size + 1
        cur = bytes([v])
    if cur:
        emit(table[cur], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif(payload: bytes):
    """GIF bytes -> list of (frame, delay_cs) with frame (h, w, 4) uint8
    RGBA, frames composited per the GIF89a disposal model onto the full
    logical screen."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    import struct as _st
    sw, sh, flags, _bg, _aspect = _st.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x7)
        gct = np.frombuffer(payload, np.uint8, count=n * 3,
                            offset=pos).reshape(n, 3)
        pos += n * 3
    frames = []
    screen = np.zeros((sh, sw, 4), np.uint8)     # transparent screen
    transparent = None
    delay = 0
    disposal = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:                        # trailer
            break
        if block == 0x21:                        # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:                    # graphic control
                sz = payload[pos]
                gflags, delay = _st.unpack_from("<BH", payload, pos + 1)
                transparent = payload[pos + 4] if gflags & 1 else None
                disposal = (gflags >> 2) & 0x7
                pos += sz + 1
            while payload[pos] != 0:             # skip sub-blocks
                pos += payload[pos] + 1
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, w, h, iflags = _st.unpack_from("<HHHHB", payload, pos)
        pos += 9
        cmap = gct
        if iflags & 0x80:                        # local color table
            n = 2 << (iflags & 0x7)
            cmap = np.frombuffer(payload, np.uint8, count=n * 3,
                                 offset=pos).reshape(n, 3)
            pos += n * 3
        if cmap is None:
            raise ValueError("GIF image without a color table")
        min_code = payload[pos]
        pos += 1
        lzw = bytearray()
        while payload[pos] != 0:                 # data sub-blocks
            sz = payload[pos]
            lzw += payload[pos + 1:pos + 1 + sz]
            pos += sz + 1
        pos += 1
        idx = _lzw_decode_gif(bytes(lzw), min_code, w * h).reshape(h, w)
        if iflags & 0x40:                        # de-interlace rows
            de = np.zeros_like(idx)
            src = 0
            for (start, step) in _INTERLACE_PASSES:
                nrows = len(range(start, h, step))
                de[start::step] = idx[src:src + nrows]
                src += nrows
            idx = de
        rgba = np.dstack([cmap[idx],
                          np.full((h, w), 255, np.uint8)])
        if transparent is not None:
            rgba[idx == transparent, 3] = 0
        prev_screen = screen.copy()
        patch = screen[top:top + h, left:left + w]
        opaque = rgba[:, :, 3] == 255
        patch[opaque] = rgba[opaque]
        frames.append((screen.copy(), delay))
        if disposal == 2:                        # restore background
            screen[top:top + h, left:left + w] = 0
        elif disposal == 3:                      # restore previous
            screen = prev_screen
        transparent = None
        delay = 0
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def encode_gif(frames, palette: np.ndarray, delays=None,
               interlace: bool = False) -> bytes:
    """Palette-indexed frames [(h, w) uint8 arrays] + (n, 3) palette ->
    animated GIF89a bytes (global color table, no transparency);
    ``interlace`` stores rows in the 4-pass order."""
    import struct as _st
    palette = np.asarray(palette, np.uint8)
    if palette.ndim != 2 or palette.shape[1] != 3:
        raise ValueError("palette must be (n, 3) uint8")
    nbits = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    n = 1 << nbits
    pal = np.zeros((n, 3), np.uint8)
    pal[:len(palette)] = palette
    sh, sw = frames[0].shape
    out = bytearray(b"GIF89a")
    out += _st.pack("<HHBBB", sw, sh, 0x80 | (nbits - 1), 0, 0)
    out += pal.tobytes()
    delays = delays or [0] * len(frames)
    min_code = max(2, nbits)
    for fr, delay in zip(frames, delays):
        fr = np.asarray(fr, np.uint8)
        if fr.max(initial=0) >= len(palette):
            raise ValueError("frame index outside palette")
        if len(frames) > 1:
            out += _st.pack("<BBBBHBB", 0x21, 0xF9, 4, 0, delay, 0, 0)
        out += _st.pack("<BHHHHB", 0x2C, 0, 0, fr.shape[1], fr.shape[0],
                        0x40 if interlace else 0)
        out.append(min_code)
        rows = (np.concatenate([fr[s::j] for (s, j) in _INTERLACE_PASSES
                                if fr[s::j].size])
                if interlace else fr)
        lzw = _lzw_encode_gif(rows.ravel(), min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
