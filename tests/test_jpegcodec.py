"""Baseline JPEG codec (operators/jpegcodec.py): self-contained roundtrip
pins — no PIL/ffmpeg exists in the container, so the encoder is the test
oracle for the decoder (and vice versa): a bug in either side breaks the
reconstruction bounds below, which are set by the mathematics of the
quantization tables, not by the implementation.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from etl_expenses_spark.operators.imagecodec import decode_image
from etl_expenses_spark.operators.jpegcodec import (
    UnsupportedJpegError,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 4) % 256, (xx * 3) % 256, ((yy + xx) * 2) % 256], axis=2
    ).astype(np.uint8)


def test_solid_color_roundtrips_exactly():
    # a flat block is DC-only: quantization cannot lose it
    img = np.full((16, 16, 3), (200, 64, 30), dtype=np.uint8)
    for subsample in (False, True):
        dec = decode_jpeg(encode_jpeg(img, quality=90, subsample=subsample))
        assert dec.shape == img.shape
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


def test_gradient_roundtrip_within_quantization_error():
    img = _gradient(37, 53)  # odd dims exercise edge padding + crop
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == img.shape
    diff = np.abs(dec.astype(int) - img.astype(int))
    assert diff.max() <= 4
    assert diff.mean() < 1.0


def test_420_subsampling_roundtrip():
    img = _gradient(37, 53)
    dec = decode_jpeg(encode_jpeg(img, quality=95, subsample=True))
    assert dec.shape == img.shape
    # chroma is halved: luma stays tight, chroma error bounded
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 12


def test_noise_survives_lossy_roundtrip_sanely():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=75))
    assert dec.shape == img.shape
    # lossy but correlated: mean error far below the ~85 of random output
    assert np.abs(dec.astype(float) - img).mean() < 30


def test_encode_is_deterministic():
    img = _gradient(40, 24)
    assert encode_jpeg(img, quality=80) == encode_jpeg(img, quality=80)


def test_progressive_decodes_identically_to_baseline():
    """VERDICT r12 #4: progressive (SOF2) is an entropy-level
    reorganization of the same quantized coefficients, so its decode must
    be BIT-IDENTICAL to the baseline decode of the same image — across
    4:4:4/4:2:0, odd sizes (padded-vs-actual block grids differ in 4:2:0),
    quality levels, and both random and gradient content. The 10-scan
    libjpeg-style script exercises DC+AC first passes, two-level Y
    refinement, spectral selection bands, and EOB/ZRL runs."""
    rng = np.random.default_rng(7)
    for (h, w) in [(8, 8), (20, 20), (17, 23), (33, 41), (5, 70)]:
        for subsample in (False, True):
            for q in (50, 90, 100):
                img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                base = decode_jpeg(encode_jpeg(img, quality=q,
                                               subsample=subsample))
                prog = decode_jpeg(encode_jpeg_progressive(
                    img, quality=q, subsample=subsample))
                assert np.array_equal(base, prog), (h, w, subsample, q)
    grad = _gradient(41, 29)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(grad, quality=85)),
        decode_jpeg(encode_jpeg_progressive(grad, quality=85)),
    )


def test_progressive_restart_intervals_roundtrip():
    """DRI + RSTn inside progressive scans: DC prediction and EOB runs
    reset per restart group (T.81 E.1.4) — still bit-identical to the
    baseline decode, for interval sizes that land mid-row and mid-band."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (33, 41, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=80, subsample=True))
    for ri in (1, 3, 7):
        prog = decode_jpeg(encode_jpeg_progressive(
            img, quality=80, subsample=True, restart_interval=ri))
        assert np.array_equal(base, prog), ri


def test_progressive_encode_is_deterministic_and_tagged_sof2():
    img = _gradient(24, 40)
    a = encode_jpeg_progressive(img, quality=80)
    assert a == encode_jpeg_progressive(img, quality=80)
    assert b"\xff\xc2" in a and b"\xff\xc0" not in a  # SOF2, no SOF0


def test_arithmetic_coding_still_raises_unsupported():
    # SOF9 (arithmetic sequential) stays out of scope
    sof9 = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    data = b"\xff\xd8" + b"\xff\xc9" + struct.pack(">H", 2 + len(sof9)) + sof9
    with pytest.raises(UnsupportedJpegError):
        decode_jpeg(data)


def test_decode_image_dispatches_jpeg_and_rejects_corrupt():
    img = _gradient(16, 16)
    enc = encode_jpeg(img, quality=90)
    arr = decode_image(enc)
    assert arr is not None and arr.shape == (16, 16, 3)
    # truncated stream -> None (digest fallback), never an exception
    assert decode_image(enc[: len(enc) // 2]) is None
    # SOF2 header with no scan data -> corrupt -> None via the same guard
    sof2 = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    bad = b"\xff\xd8" + b"\xff\xc2" + struct.pack(">H", 2 + len(sof2)) + sof2
    assert decode_image(bad) is None
    # a real progressive stream now decodes (no digest fallback)
    prog = decode_image(encode_jpeg_progressive(img, quality=90))
    assert prog is not None and prog.shape == (16, 16, 3)


def test_quality_knob_trades_size_for_error():
    img = _gradient(48, 48)
    lo, hi = encode_jpeg(img, quality=30), encode_jpeg(img, quality=95)
    assert len(lo) < len(hi)
    err_lo = np.abs(decode_jpeg(lo).astype(float) - img).mean()
    err_hi = np.abs(decode_jpeg(hi).astype(float) - img).mean()
    assert err_hi < err_lo
