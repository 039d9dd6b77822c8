"""Real image codecs in pure numpy: PPM (P6/P3), PGM (P5), BMP (24-bit
BI_RGB), JPEG (operators/jpegcodec.py — full T.81 sequential AND
progressive decoder + encoder built from the public spec), PNG
(operators/pngcodec.py — stdlib-zlib DEFLATE, all five scanline filters
and color types, 8/16-bit, Adam7; decoder + encoder), and GIF87a/89a
first-frame (operators/gifcodec.py — variable-width LZW, interlace,
transparency; decoder + quantizing encoder).

The container ships no PIL/ffmpeg, but these formats are fully decodable
with stdlib + numpy, which makes the multimodal image path REAL
end-to-end: decode → resize → re-encode → feature-extract, all inside
Arrow-batched ``mapInPandas`` workers (operators/multimodal.py).
Remaining fallback formats: arithmetic-coded/12-bit JPEG, sub-byte-depth
PNG, and the compressed audio/video containers (MP3/AAC, MP4/H.264) that
genuinely need codec libraries this container lacks.

All ops are deterministic (nearest-neighbor resampling, exact integer
means) so results are stable across partitionings and retries — the same
bit-exactness discipline as the rest of the engine.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_image(data: bytes) -> np.ndarray | None:
    """bytes → (H, W, 3) uint8 RGB array, or None if the format is not one
    of the supported real codecs (PPM P6/P3, PGM P5 grayscale — the
    payload video frame-sampling emits — BMP 24-bit uncompressed,
    baseline JPEG, PNG, and GIF first-frame). Grayscale decodes to RGB with replicated channels so
    every downstream stage sees one array contract. Corrupt or
    out-of-profile payloads return None (callers fall back to the
    deterministic digest path), never raise."""
    if data[:2] in (b"P6", b"P3", b"P5"):
        return _decode_ppm(data)
    if data[:2] == b"BM":
        return _decode_bmp(data)
    if data[:2] == b"\xff\xd8":
        from etl_expenses_spark.operators.jpegcodec import decode_jpeg

        try:
            return decode_jpeg(data)
        except (ValueError, IndexError, struct.error):
            return None  # corrupt stream or non-baseline profile
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from etl_expenses_spark.operators.gifcodec import decode_gif

        try:
            return decode_gif(data)
        except (ValueError, IndexError, struct.error):
            return None  # corrupt stream
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        import zlib

        from etl_expenses_spark.operators.pngcodec import decode_png

        try:
            return decode_png(data)
        except (ValueError, IndexError, struct.error, zlib.error):
            return None  # corrupt stream or sub-byte bit depth
    return None


def _decode_ppm(data: bytes) -> np.ndarray | None:
    # header: magic, whitespace/comments, width, height, maxval
    tokens: list[bytes] = []
    i = 2
    n = len(data)
    while len(tokens) < 3 and i < n:
        while i < n and data[i : i + 1].isspace():
            i += 1
        if i < n and data[i : i + 1] == b"#":  # comment to EOL
            while i < n and data[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < n and not data[j : j + 1].isspace():
            j += 1
        tokens.append(data[i:j])
        i = j
    if len(tokens) < 3:
        return None
    try:
        w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    except ValueError:
        return None
    if w <= 0 or h <= 0 or maxval <= 0 or maxval > 255:
        return None
    if data[:2] == b"P5":
        i += 1  # single whitespace after maxval
        if len(data) - i < w * h:  # truncated payload (frombuffer raises)
            return None
        pix = np.frombuffer(data, dtype=np.uint8, count=w * h, offset=i)
        return np.repeat(pix.reshape(h, w, 1), 3, axis=2)
    if data[:2] == b"P6":
        i += 1  # single whitespace after maxval
        if len(data) - i < w * h * 3:  # truncated payload
            return None
        pix = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=i)
        return pix.reshape(h, w, 3).copy()
    vals = data[i:].split()
    if len(vals) < w * h * 3:
        return None
    arr = np.array([int(v) for v in vals[: w * h * 3]], dtype=np.uint8)
    return arr.reshape(h, w, 3)


def _decode_bmp(data: bytes) -> np.ndarray | None:
    if len(data) < 54:
        return None
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size < 40:
        return None  # BITMAPCOREHEADER etc. — out of scope
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    flipped = h > 0  # positive height → bottom-up row order
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    need = pixel_off + stride * h
    if len(data) < need:
        return None
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=pixel_off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flipped:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary PPM (P6) bytes."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample to (height, width)."""
    h, w = arr.shape[:2]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return arr[rows][:, cols]


def image_features(arr: np.ndarray) -> list[float]:
    """8 real content features: per-channel mean and std (6), aspect ratio,
    and luma mean — the classic cheap embedding for dedup/clustering before
    a learned model enters the pipeline. All values in [0, 1]-ish ranges,
    computed in float64 with fixed order (bit-stable)."""
    x = arr.astype(np.float64) / 255.0
    means = x.reshape(-1, 3).mean(axis=0)
    stds = x.reshape(-1, 3).std(axis=0)
    h, w = arr.shape[:2]
    aspect = w / h
    luma = float(0.2126 * means[0] + 0.7152 * means[1] + 0.0722 * means[2])
    return [float(v) for v in (*means, *stds, aspect, luma)]
