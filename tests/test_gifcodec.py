"""GIF codec (operators/gifcodec.py): LZW roundtrip through the shipped
encoder, plus decoder pins for the features the encoder does NOT emit —
interlacing, transparency, sub-frame placement — built by hand-editing
the container around the encoder's LZW stream, so those paths are checked
independently.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from etl_expenses_spark.operators.gifcodec import (
    decode_gif,
    encode_gif,
    quantize_gif_palette,
)
from etl_expenses_spark.operators.imagecodec import decode_image

# encoder layout constants: 6-byte sig + 7-byte LSD + 256*3 GCT
_DESC_OFF = 6 + 7 + 768  # offset of the 0x2C image separator
_FLAGS_OFF = _DESC_OFF + 9  # descriptor's packed-flags byte


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 9) % 256, (xx * 5) % 256, ((yy + 2 * xx)) % 256], axis=2
    ).astype(np.uint8)


def test_roundtrip_is_exact_quantization():
    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (7, 5), (33, 47)]:
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        assert np.array_equal(decode_gif(encode_gif(img)), quantize_gif_palette(img))


def test_palette_exact_second_roundtrip_and_determinism():
    img = quantize_gif_palette(_gradient(20, 30))
    enc = encode_gif(img)
    assert enc == encode_gif(img)
    assert np.array_equal(decode_gif(enc), img)  # lossless on own palette


def test_dictionary_reset_path():
    # >4096 LZW entries forces a mid-stream clear + width reset
    img = np.random.default_rng(5).integers(0, 256, (150, 220, 3), np.uint8)
    assert np.array_equal(decode_gif(encode_gif(img)), quantize_gif_palette(img))


def _gif_interlace_rows(h):
    return np.concatenate([
        np.arange(0, h, 8), np.arange(4, h, 8),
        np.arange(2, h, 4), np.arange(1, h, 2),
    ])


def test_interlaced_frame_decodes():
    img = quantize_gif_palette(_gradient(13, 9))
    rows = _gif_interlace_rows(13)
    # store rows in pass order, then flag the frame as interlaced: the
    # decoder must undo the permutation
    enc = bytearray(encode_gif(img[rows]))
    assert enc[_DESC_OFF] == 0x2C
    enc[_FLAGS_OFF] |= 0x40
    assert np.array_equal(decode_gif(bytes(enc)), img)


def test_transparency_composites_to_black():
    img = quantize_gif_palette(_gradient(6, 8))
    # palette index of the pixel at (0, 0) becomes transparent
    q = img[0, 0]
    enc = encode_gif(img)
    # recover the index: 6x7x6 cube layout r*42 + g*6 + b on the grid
    r = int(q[0]) * 5 // 255
    g = int(q[1]) * 6 // 255
    b = int(q[2]) * 5 // 255
    t_idx = r * 42 + g * 6 + b
    gce = b"\x21\xf9\x04\x01\x00\x00" + bytes([t_idx]) + b"\x00"
    patched = enc[:_DESC_OFF] + gce + enc[_DESC_OFF:]
    dec = decode_gif(patched)
    mask = np.all(img == q, axis=2)
    assert mask[0, 0]
    assert (dec[mask] == 0).all()
    assert np.array_equal(dec[~mask], img[~mask])


def test_subframe_is_placed_on_black_canvas():
    img = quantize_gif_palette(_gradient(4, 6))
    enc = bytearray(encode_gif(img))
    # grow the logical screen to 10x8 and offset the frame to (2, 3)
    struct.pack_into("<HH", enc, 6, 8, 10)      # screen w=8, h=10
    struct.pack_into("<HH", enc, _DESC_OFF + 1, 2, 3)  # frame left=2, top=3
    dec = decode_gif(bytes(enc))
    assert dec.shape == (10, 8, 3)
    assert np.array_equal(dec[3:7, 2:8], img)
    assert dec[:3].sum() == 0 and dec[7:].sum() == 0


def test_dispatch_and_corruption_guards():
    img = _gradient(9, 9)
    enc = encode_gif(img)
    out = decode_image(enc)
    assert out is not None and np.array_equal(out, quantize_gif_palette(img))
    assert decode_image(enc[: len(enc) // 2]) is None
    assert decode_image(b"GIF89a" + b"\x01" * 20) is None
    with pytest.raises(ValueError):
        decode_gif(b"GIF88a" + bytes(20))
