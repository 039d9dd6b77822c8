"""GIF codec in pure numpy + stdlib — decoder (GIF87a/89a) and a minimal
encoder for roundtrip testing.

Completes the stdlib-decodable image matrix (PPM/PGM/BMP/JPEG/PNG/GIF):
GIF's only algorithmic dependency is LZW with variable-width codes, which
is ~60 lines of bit logic. Decoder scope: first frame of any GIF87a/89a —
global/local color tables, the 4-pass GIF interlace, transparency from the
graphic control extension (composited over black, keeping the (H, W, 3)
uint8 contract of operators/imagecodec.py), and frames smaller than the
logical screen (placed at their offset on black). Later animation frames
are out of scope by design: a curation pipeline featurizes the poster
frame; full animation decode needs disposal-method compositing that
belongs in a real media library.

The encoder writes a single full-size frame with a 256-entry global color
table; colors are quantized to the web-safe 6×7×6 cube — lossy quantization
(like JPEG), but deterministic, so tests pin the EXACT quantized pixels and
the codec roundtrips its own palette losslessly.

All bit twiddling is little-endian per the spec: LZW codes pack LSB-first
into the sub-block byte stream (the opposite of JPEG's MSB-first Huffman).
"""

from __future__ import annotations

import struct

import numpy as np


def _subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block chain starting at pos; returns (bytes,
    position after the terminator)."""
    out = bytearray()
    n = len(data)
    while pos < n:
        size = data[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        out += data[pos : pos + size]
        pos += size
    raise ValueError("gif: unterminated sub-block chain")


def _lzw_decode(data: bytes, min_code_size: int, expect: int) -> np.ndarray:
    """Variable-width LZW (LSB-first) → uint8 index array of length expect."""
    clear = 1 << min_code_size
    end = clear + 1
    # dictionary as (prefix_code, suffix_byte); roots are implicit
    prefix = np.full(4096, -1, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    out = np.zeros(expect, dtype=np.uint8)
    out_n = 0

    def reset():
        return clear + 2, min_code_size + 1

    next_code, width = reset()
    bitbuf = 0
    bitcnt = 0
    pos = 0
    n = len(data)
    prev = -1
    stack = bytearray()
    while out_n < expect:
        while bitcnt < width:
            if pos >= n:
                raise ValueError("gif: LZW stream truncated")
            bitbuf |= data[pos] << bitcnt
            bitcnt += 8
            pos += 1
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        bitcnt -= width
        if code == clear:
            next_code, width = reset()
            prev = -1
            continue
        if code == end:
            break
        if prev < 0:
            if code >= clear:
                raise ValueError("gif: bad first LZW code")
            out[out_n] = code
            out_n += 1
            prev = code
            continue
        # expand code (KwKwK: code == next_code means prev + first(prev))
        c = code
        if c == next_code:
            c = prev
            stack.append(0)  # placeholder for the repeated first byte
        elif c > next_code:
            raise ValueError("gif: LZW code out of range")
        while c >= clear:
            stack.append(suffix[c])
            c = prefix[c]
        first = c
        if stack and code == next_code:
            stack[0] = first
        stack.append(first)
        stack.reverse()
        take = min(len(stack), expect - out_n)
        out[out_n : out_n + take] = np.frombuffer(
            bytes(stack[:take]), dtype=np.uint8
        )
        out_n += take
        stack.clear()
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = first
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    if out_n != expect:
        raise ValueError("gif: LZW produced wrong pixel count")
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → (H, W, 3) uint8 RGB of the FIRST frame, composited over
    black. Raises ValueError on corrupt data."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    if len(data) < 13:
        raise ValueError("gif: truncated header")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, size * 3, pos).reshape(-1, 3)
        pos += size * 3
    transparent = -1
    n = len(data)
    while pos < n:
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if pos >= n:
                raise ValueError("gif: truncated extension")
            label = data[pos]
            pos += 1
            if label == 0xF9 and pos < n and data[pos] >= 4:
                # graphic control: transparency flag + index
                gflags = data[pos + 1]
                if gflags & 0x01:
                    transparent = data[pos + 4]
            _, pos = _subblocks(data, pos)
            continue
        if b == 0x2C:  # image descriptor — decode this (first) frame
            if pos + 9 > n:
                raise ValueError("gif: truncated image descriptor")
            ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos)
            pos += 9
            ct = gct
            if iflags & 0x80:  # local color table
                size = 2 << (iflags & 0x07)
                ct = np.frombuffer(data, np.uint8, size * 3, pos).reshape(-1, 3)
                pos += size * 3
            if ct is None:
                raise ValueError("gif: no color table")
            if iw == 0 or ih == 0 or ix + iw > sw or iy + ih > sh:
                raise ValueError("gif: frame exceeds logical screen")
            if pos >= n:
                raise ValueError("gif: missing LZW data")
            min_code = data[pos]
            pos += 1
            if not 2 <= min_code <= 11:
                raise ValueError("gif: bad LZW minimum code size")
            lzw, pos = _subblocks(data, pos)
            idx = _lzw_decode(lzw, min_code, iw * ih).reshape(ih, iw)
            if iflags & 0x40:  # 4-pass GIF interlace
                de = np.zeros_like(idx)
                rows = np.concatenate([
                    np.arange(0, ih, 8), np.arange(4, ih, 8),
                    np.arange(2, ih, 4), np.arange(1, ih, 2),
                ])
                de[rows] = idx
                idx = de
            if idx.max() >= ct.shape[0]:
                raise ValueError("gif: palette index out of range")
            frame = ct[idx]
            if 0 <= transparent < ct.shape[0]:
                frame = frame * (idx != transparent)[:, :, None]
            out = np.zeros((sh, sw, 3), dtype=np.uint8)
            out[iy : iy + ih, ix : ix + iw] = frame
            return out
        raise ValueError(f"gif: unknown block 0x{b:02x}")
    raise ValueError("gif: no image data")


# ------------------------------------------------------------- encoder

# web-safe-ish 6x7x6 cube (252 colors) — deterministic quantization grid
_QR, _QG, _QB = 6, 7, 6


def quantize_gif_palette(rgb: np.ndarray) -> np.ndarray:
    """The exact pixels decode_gif(encode_gif(x)) returns — the encoder's
    deterministic 6×7×6 quantization applied to x."""
    x = rgb.astype(np.int32)
    r = (x[:, :, 0] * (_QR - 1) + 127) // 255
    g = (x[:, :, 1] * (_QG - 1) + 127) // 255
    b = (x[:, :, 2] * (_QB - 1) + 127) // 255
    out = np.stack(
        [r * 255 // (_QR - 1), g * 255 // (_QG - 1), b * 255 // (_QB - 1)],
        axis=2,
    )
    return out.astype(np.uint8)


def encode_gif(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → single-frame GIF89a with a fixed 6×7×6 palette.
    Deterministic; decode roundtrips to quantize_gif_palette(rgb)."""
    h, w = rgb.shape[:2]
    x = rgb.astype(np.int32)
    r = (x[:, :, 0] * (_QR - 1) + 127) // 255
    g = (x[:, :, 1] * (_QG - 1) + 127) // 255
    b = (x[:, :, 2] * (_QB - 1) + 127) // 255
    idx = (r * _QG * _QB + g * _QB + b).astype(np.uint16).reshape(-1)

    pal = np.zeros((256, 3), dtype=np.uint8)
    k = 0
    for ri in range(_QR):
        for gi in range(_QG):
            for bi in range(_QB):
                pal[k] = (
                    ri * 255 // (_QR - 1),
                    gi * 255 // (_QG - 1),
                    bi * 255 // (_QB - 1),
                )
                k += 1

    # LZW encode with 8-bit roots
    min_code = 8
    clear, end = 256, 257
    table: dict[tuple[int, int], int] = {}
    next_code = 258
    width = 9
    out = bytearray()
    bitbuf = 0
    bitcnt = 0

    def emit(code: int):
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    emit(clear)
    prev = int(idx[0])
    for v in idx[1:]:
        v = int(v)
        key = (prev, v)
        code = table.get(key)
        if code is not None:
            prev = code
            continue
        emit(prev)
        if next_code < 4096:
            table[key] = next_code
            next_code += 1
            # the encoder's table runs ONE insertion ahead of the decoder's
            # (decoder learns each entry a code late), so it bumps the code
            # width one step later: when next_code == 2^width + 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear)
            table.clear()
            next_code = 258
            width = 9
        prev = v
    emit(prev)
    emit(end)
    if bitcnt:
        out.append(bitbuf & 0xFF)

    data = bytearray(b"GIF89a")
    data += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # GCT, 256 entries
    data += pal.tobytes()
    data += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    data.append(min_code)
    for i in range(0, len(out), 255):
        block = out[i : i + 255]
        data.append(len(block))
        data += block
    data += b"\x00\x3b"
    return bytes(data)
