"""PNG codec (operators/pngcodec.py): lossless roundtrip plus decoder
pins against HAND-FILTERED streams — the test forward-applies each of the
five scanline filters itself, so the unfilter path is checked against an
independent construction, not against the encoder it ships with.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from etl_expenses_spark.operators.imagecodec import decode_image
from etl_expenses_spark.operators.pngcodec import (
    UnsupportedPngError,
    decode_png,
    encode_png,
)

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png(w, h, color, raw, extra=b""):
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _SIG + _chunk(b"IHDR", ihdr) + extra
        + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    )


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _forward_filter(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Independently apply the spec's forward filters row by row."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int32)
    out = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = ftypes[y % len(ftypes)]
        cur = flat[y]
        line = np.zeros(stride, np.int32)
        for x in range(stride):
            left = cur[x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) >> 1
            else:
                pred = _paeth(int(left), int(up), int(ul))
            line[x] = (cur[x] - pred) & 0xFF
        out.append(f)
        out += line.astype(np.uint8).tobytes()
        prev = cur
    return bytes(out)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 5) % 256, (xx * 7) % 256, ((yy * xx) + 3) % 256], axis=2
    ).astype(np.uint8)


def test_lossless_roundtrip_exact():
    img = _gradient(23, 31)
    assert np.array_equal(decode_png(encode_png(img)), img)
    # determinism: identical pixels -> identical bytes
    assert encode_png(img) == encode_png(img)


def test_all_five_filters_unfilter_correctly():
    img = _gradient(10, 9)
    # cycle every filter type across rows, built independently of encode_png
    raw = _forward_filter(img, ftypes=[0, 1, 2, 3, 4])
    data = _png(9, 10, 2, raw)
    assert np.array_equal(decode_png(data), img)


def test_grayscale_and_alpha_color_types():
    g = ((np.arange(48) * 11) % 256).astype(np.uint8).reshape(6, 8)
    raw = _forward_filter(g[:, :, None], ftypes=[0])
    assert np.array_equal(
        decode_png(_png(8, 6, 0, raw)), np.repeat(g[:, :, None], 3, axis=2)
    )
    # RGBA: alpha composites over black
    rgba = np.zeros((4, 4, 4), np.uint8)
    rgba[:, :, 0] = 200
    rgba[:, :, 3] = 128
    raw = _forward_filter(rgba, ftypes=[0])
    dec = decode_png(_png(4, 4, 6, raw))
    assert dec[0, 0, 0] == (200 * 128) // 255 and dec[0, 0, 1] == 0


def test_palette_color_type():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = (np.arange(12) % 3).astype(np.uint8).reshape(3, 4)
    raw = _forward_filter(idx[:, :, None], ftypes=[0])
    data = _png(4, 3, 3, raw, extra=_chunk(b"PLTE", pal.tobytes()))
    dec = decode_png(data)
    assert np.array_equal(dec, pal[idx])


def test_16bit_decodes_via_high_byte():
    img = _gradient(6, 7)
    # hand-build 16-bit RGB: each 8-bit sample s becomes (s << 8) | s,
    # the spec's exact 8->16 rescale; decoder must return the high byte
    wide = img.astype(np.uint16)
    wide = (wide << 8) | wide
    h, w = img.shape[:2]
    raw = bytearray()
    be = wide.reshape(h, w * 3).astype(">u2")
    for y in range(h):
        raw.append(0)  # filter None
        raw += be[y].tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
    data = (
        _SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), img)


def _adam7_passes(h, w):
    for x0, y0, dx, dy in [
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ]:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        yield x0, y0, dx, dy, pw, ph


def test_adam7_interlaced_decodes():
    img = _gradient(13, 11)  # non-multiple-of-8 dims exercise empty passes
    h, w = img.shape[:2]
    raw = bytearray()
    for x0, y0, dx, dy, pw, ph in _adam7_passes(h, w):
        if pw == 0 or ph == 0:
            continue
        sub = img[y0::dy, x0::dx]  # (ph, pw, 3)
        for y in range(ph):
            raw.append(0)  # filter None per pass scanline
            raw += sub[y].tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)  # interlace=1
    data = (
        _SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), img)


def test_out_of_scope_raises_and_dispatch_guards():
    img = _gradient(5, 5)
    # sub-byte depth -> UnsupportedPngError
    ihdr = struct.pack(">IIBBBBB", 5, 5, 4, 0, 0, 0, 0)
    data = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(b"x")) + _chunk(b"IEND", b"")
    with pytest.raises(UnsupportedPngError):
        decode_png(data)
    # decode_image dispatch: real PNG decodes, corrupt returns None
    enc = encode_png(img)
    assert np.array_equal(decode_image(enc), img)
    assert decode_image(enc[:40]) is None
    assert decode_image(data) is None  # 4-bit falls back, no raise
