"""Property tests for the image codec layer (hypothesis).

Two contracts a 100 TB corpus demands of a decode stage:

1. ROBUSTNESS — `decode_image` NEVER raises, whatever bytes arrive
   (truncated files, random garbage wearing a real magic prefix). One
   corrupt object must become a digest-fallback row, not a dead Spark
   task. (This fuzz found a real crash: truncated P5/P6 payloads raised
   ValueError out of np.frombuffer — fixed in round 5.)
2. FIDELITY — PNG roundtrips are bit-exact for arbitrary pixels
   (lossless), and JPEG q100 roundtrips stay within the mathematical
   quantization bound for arbitrary pixels (all-ones quantizers: the
   coefficient round-off is at most 0.5 per coefficient, so the spatial
   error is small and bounded, plus YCbCr integer rounding).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_expenses_spark.operators.imagecodec import decode_image
from etl_expenses_spark.operators.jpegcodec import decode_jpeg, encode_jpeg
from etl_expenses_spark.operators.pngcodec import decode_png, encode_png

_MAGICS = [
    b"",
    b"P6",
    b"P5",
    b"P3",
    b"BM",
    b"\xff\xd8",
    b"\x89PNG\r\n\x1a\n",
    b"GIF89a",
    b"GIF87a",
]


@settings(max_examples=200, deadline=None)
@given(
    prefix=st.sampled_from(_MAGICS),
    junk=st.binary(min_size=0, max_size=300),
)
def test_decode_image_never_raises(prefix, junk):
    out = decode_image(prefix + junk)
    assert out is None or (out.ndim == 3 and out.shape[2] == 3)


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**32 - 1),
    cut=st.floats(0.0, 1.0),
)
def test_truncated_real_encodings_never_raise(h, w, seed, cut):
    from etl_expenses_spark.operators.gifcodec import encode_gif

    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)
    for enc in (encode_png(img), encode_jpeg(img, quality=80), encode_gif(img)):
        out = decode_image(enc[: int(len(enc) * cut)])
        assert out is None or (out.ndim == 3 and out.shape[2] == 3)


@settings(max_examples=200, deadline=None)
@given(
    prefix=st.sampled_from([b"", b"RIFF", b"YUV4MPEG2 ", b"YUV4MPEG2 W"]),
    junk=st.binary(min_size=0, max_size=200),
)
def test_audio_video_decoders_never_raise(prefix, junk):
    """Same robustness contract for the WAV and Y4M decoders (this fuzz
    found a real crash: a Y4M header with non-numeric W/H tokens raised
    out of int() — fixed in round 5)."""
    from etl_expenses_spark.operators.audiocodec import decode_wav
    from etl_expenses_spark.operators.videocodec import decode_y4m

    decode_wav(prefix + junk)
    decode_y4m(prefix + junk)


@settings(max_examples=30, deadline=None)
@given(cut=st.floats(0.0, 1.0), seed=st.integers(0, 2**16))
def test_truncated_wav_y4m_never_raise(cut, seed):
    from etl_expenses_spark.operators.audiocodec import decode_wav, encode_wav
    from etl_expenses_spark.operators.videocodec import decode_y4m, encode_y4m

    rng = np.random.default_rng(seed)
    wav = encode_wav(rng.integers(-500, 500, 400).astype(np.int16), 8000)
    y4m = encode_y4m(rng.integers(0, 256, (3, 6, 8)).astype(np.uint8))
    decode_wav(wav[: int(len(wav) * cut)])
    decode_y4m(y4m[: int(len(y4m) * cut)])


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**32 - 1),
)
def test_png_roundtrip_lossless_for_arbitrary_pixels(h, w, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    seed=st.integers(0, 2**32 - 1),
)
def test_jpeg_q100_roundtrip_bounded_for_arbitrary_pixels(h, w, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=100))
    assert dec.shape == img.shape
    # all-ones quantizers: worst-case spatial error from coefficient
    # rounding + two integer color conversions stays far below this
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 16


@settings(max_examples=200, deadline=None)
@given(
    prefix=st.sampled_from(
        [b"", b"RIFF", b"RIFF\x00\x00\x00\x00WAVE", b"FORM", b"OggS", b"fLaC"]
    ),
    junk=st.binary(min_size=0, max_size=300),
)
def test_decode_wav_never_raises(prefix, junk):
    """The audio dispatch (PCM / G.711 / IMA-ADPCM) must turn any bytes —
    including a valid RIFF/WAVE head with garbage fmt geometry (zero
    block_align, absurd channel counts, truncated ADPCM blocks) — into
    None or a well-formed (samples, rate), never an exception."""
    from etl_expenses_spark.operators.audiocodec import decode_wav

    out = decode_wav(prefix + junk)
    if out is not None:
        samples, rate = out
        assert samples.ndim == 2 and rate > 0


@settings(max_examples=80, deadline=None)
@given(
    n=st.integers(1, 3000),
    rate=st.sampled_from([8000, 16000, 44100]),
    block=st.sampled_from([None, 64, 256, 1024]),
    cut=st.floats(0.0, 1.0),
)
def test_truncated_adpcm_never_raises(n, rate, block, cut):
    from etl_expenses_spark.operators.audiocodec import (
        decode_wav,
        encode_ima_adpcm_wav,
    )

    sig = (np.sin(np.arange(n) * 0.05) * 12000).astype(np.int16)
    wav = encode_ima_adpcm_wav(sig, rate, block_align=block)
    decode_wav(wav[: int(len(wav) * cut)])  # must not raise
