"""PNG codec in pure numpy + stdlib zlib — decoder and encoder.

PNG's only compression dependency is DEFLATE, and ``zlib`` ships with the
Python stdlib, so unlike MP3/MP4 there is no container limitation excusing
a stub: this implements the format for real from the public spec
(RFC 2083 / W3C PNG). Scope: the non-interlaced 8-bit color types that
cover practically every PNG a corpus contains — grayscale (0), RGB (2),
palette (3), gray+alpha (4), RGBA (6) — with all five scanline filters
(None/Sub/Up/Average/Paeth). 16-bit channels and Adam7 interlacing raise
``UnsupportedPngError``; callers fall back to the digest path exactly like
the baseline-JPEG profile gate.

Alpha handling: decode returns RGB; alpha is composited over black
(deterministic, branch-free) so every downstream stage keeps the one
(H, W, 3) uint8 contract of operators/imagecodec.py.

The encoder always writes 8-bit RGB, filter 0, one IDAT, fixed zlib level
(9) — deterministic bytes for identical pixels, which the exactness
discipline elsewhere relies on. PNG is lossless, so decode(encode(x)) == x
bit-for-bit (pinned in tests/test_pngcodec.py) — stronger than the JPEG
roundtrip bound.

Unfiltering is row-sequential by necessity (each row references the
previous reconstructed row) but vectorized within the row for the Sub/
Average/Paeth recurrences where possible; at scale this runs inside
Arrow-batched mapInPandas workers like every other codec here.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


class UnsupportedPngError(ValueError):
    """Valid PNG, but outside the 8-bit non-interlaced scope."""


def _chunks(data: bytes):
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        length = struct.unpack_from(">I", data, pos)[0]
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        yield ctype, body
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IEND":
            return


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """raw: (h, 1 + stride) filtered scanlines → (h, stride) recon bytes."""
    recon = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub — sequential in x by bpp lanes
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up — fully vectorized
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                ul = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (cur[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"png: unknown filter type {ftype}")
        recon[y] = cur.astype(np.uint8)
        prev = cur
    return recon


# Adam7 pass geometry: (x_start, y_start, x_step, y_step) per pass.
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W, 3) uint8 RGB. Supports bit depths 8 and 16 (16
    downconverts via the high byte, the spec's sample depth rescale) and
    both interlace methods (none / Adam7). Raises UnsupportedPngError for
    sub-byte depths (1/2/4-bit), ValueError on corrupt data."""
    if data[:8] != _SIG:
        raise ValueError("png: bad signature")
    ihdr = None
    palette = None
    trns = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            w, h, depth, ctype_n, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            ihdr = (w, h, depth, ctype_n, comp, filt, interlace)
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(body, np.uint8)
        elif ctype == b"IDAT":
            idat += body
    if ihdr is None or not idat:
        raise ValueError("png: missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("png: nonstandard compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"png: bad interlace method {interlace}")
    if depth not in (8, 16):
        raise UnsupportedPngError(f"png: bit depth {depth}")
    if depth == 16 and color == 3:
        raise ValueError("png: 16-bit palette is invalid")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"png: bad color type {color}")
    bpp = channels * (depth // 8)
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)

    def unfilter_block(block: np.ndarray, bh: int, bw: int) -> np.ndarray:
        """Filtered scanlines of a (bh, bw)-pixel region → (bh, bw,
        channels) uint8 samples (16-bit keeps the high byte)."""
        stride = bw * bpp
        recon = _unfilter(block.reshape(bh, stride + 1), bh, stride, bpp)
        if depth == 16:
            recon = recon.reshape(bh, bw, channels, 2)[:, :, :, 0]
        return recon.reshape(bh, bw, channels)

    if interlace == 0:
        if raw.size != h * (w * bpp + 1):
            raise ValueError("png: wrong decompressed size")
        px = unfilter_block(raw, h, w)
    else:  # Adam7: seven independently-filtered sub-images, scattered back
        px = np.zeros((h, w, channels), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            size = ph * (pw * bpp + 1)
            if pos + size > raw.size:
                raise ValueError("png: wrong decompressed size (interlaced)")
            sub = unfilter_block(raw[pos : pos + size], ph, pw)
            px[y0::dy, x0::dx] = sub
            pos += size
        if pos != raw.size:
            raise ValueError("png: trailing interlaced data")
    if color == 0:  # gray
        return np.repeat(px, 3, axis=2)
    if color == 2:  # rgb
        return px.copy()
    if color == 3:  # palette
        if palette is None:
            raise ValueError("png: palette image without PLTE")
        idx = px[:, :, 0]
        if idx.max() >= palette.shape[0]:
            raise ValueError("png: palette index out of range")
        rgb = palette[idx]
        if trns is not None:  # composite paletted alpha over black
            a = np.full(palette.shape[0], 255, np.uint8)
            a[: trns.size] = trns
            alpha = a[idx].astype(np.uint16)
            rgb = ((rgb.astype(np.uint16) * alpha[:, :, None]) // 255).astype(
                np.uint8
            )
        return rgb
    if color == 4:  # gray + alpha → composite over black
        g = px[:, :, 0].astype(np.uint16)
        a = px[:, :, 1].astype(np.uint16)
        g = ((g * a) // 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    # color == 6: RGBA → composite over black
    rgb = px[:, :, :3].astype(np.uint16)
    a = px[:, :, 3:4].astype(np.uint16)
    return ((rgb * a) // 255).astype(np.uint8)


def encode_png(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → PNG bytes (8-bit RGB, filter 0, zlib level 9).
    Deterministic; decode_png(encode_png(x)) == x exactly (lossless)."""
    arr = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w = arr.shape[:2]
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), arr.reshape(h, w * 3)], axis=1
    ).tobytes()

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )
