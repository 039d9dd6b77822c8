"""Real video codec in pure stdlib+numpy: YUV4MPEG2 (.y4m), uncompressed.

Same philosophy as operators/imagecodec.py and audiocodec.py: no ffmpeg in
the container, but Y4M — the interchange format every encoder toolchain
speaks — is a plain-text header plus raw planar frames, fully parseable
with numpy. That makes the multimodal video path REAL end to end:
decode → frame-sample (actual luma planes re-encoded as PGM images, which
feed straight back into the image featurizer) → feature-extract, all
inside Arrow-batched ``mapInPandas`` workers (operators/multimodal.py).
Compressed containers (MP4/H.264, WebM/VP9) still require a codec library
and keep the deterministic-fake fallback there.

Supported colorspaces: C420 (and its jpeg/mpeg2/paldv tags), C422, C444,
Cmono — i.e. everything ffmpeg emits for ``-pix_fmt yuv420p/422p/444p/gray``.
Only the luma (Y) plane is materialized: downstream features are
luma-based, and skipping chroma keeps the decode allocation-light.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"

# colorspace tag → (chroma_width_divisor, chroma_height_divisor, n_chroma_planes)
_CHROMA = {
    b"420": (2, 2, 2),
    b"422": (2, 1, 2),
    b"444": (1, 1, 2),
    b"mono": (1, 1, 0),
}


def _parse_header(line: bytes) -> tuple[int, int, tuple[int, int, int]] | None:
    width = height = 0
    chroma = _CHROMA[b"420"]  # Y4M default when C is absent
    for tok in line.split(b" ")[1:]:
        if not tok:
            continue
        key, val = tok[:1], tok[1:]
        if key == b"W":
            if not val.isdigit():  # garbage header (fuzz-found crash)
                return None
            width = int(val)
        elif key == b"H":
            if not val.isdigit():
                return None
            height = int(val)
        elif key == b"C":
            base = b"mono" if val.startswith(b"mono") else val[:3]
            if base not in _CHROMA:
                return None  # e.g. C420p10 — bit depths out of scope
            if base != b"mono" and val not in (base, base + b"jpeg", base + b"mpeg2", base + b"paldv", b"420p", b"422p", b"444p"):
                # unknown suffix (e.g. 444alpha adds a 4th plane) — refuse
                if val != base:
                    return None
            chroma = _CHROMA[base]
    if width <= 0 or height <= 0:
        return None
    return width, height, chroma


def decode_y4m(data: bytes) -> tuple[np.ndarray, int, int] | None:
    """bytes → ((n_frames, H, W) uint8 luma stack, width, height), or None
    if the payload is not a parseable 8-bit Y4M stream."""
    if not data.startswith(_MAGIC):
        return None
    nl = data.find(b"\n")
    if nl < 0:
        return None
    parsed = _parse_header(data[:nl])
    if parsed is None:
        return None
    width, height, (cw, ch, planes) = parsed
    y_size = width * height
    frame_size = y_size + planes * ((width // cw) * (height // ch))
    frames: list[np.ndarray] = []
    pos = nl + 1
    n = len(data)
    while pos < n:
        fnl = data.find(b"\n", pos)
        if fnl < 0 or data[pos : pos + 5] != b"FRAME":
            return None  # truncated / corrupt frame marker
        pos = fnl + 1
        if pos + frame_size > n:
            return None  # truncated frame payload
        y = np.frombuffer(data, dtype=np.uint8, count=y_size, offset=pos)
        frames.append(y.reshape(height, width).copy())
        pos += frame_size
    if not frames:
        return None
    return np.stack(frames), width, height


def encode_y4m(
    frames: np.ndarray, chroma: bytes = b"420", fps: tuple[int, int] = (25, 1)
) -> bytes:
    """(n_frames, H, W) uint8 luma → Y4M bytes with neutral (128) chroma.
    The inverse of decode_y4m's luma extraction; also the test-fixture
    factory (a real encoder would carry real chroma planes)."""
    n_frames, height, width = frames.shape
    cw, ch, planes = _CHROMA[chroma if chroma in _CHROMA else b"420"]
    ctag = b"mono" if chroma == b"mono" else chroma
    out = bytearray(
        _MAGIC
        + b" W%d H%d F%d:%d Ip A1:1 C%s\n" % (width, height, fps[0], fps[1], ctag)
    )
    pad = b"\x80" * (planes * (width // cw) * (height // ch))
    for f in frames:
        out += b"FRAME\n"
        out += f.astype(np.uint8).tobytes()
        out += pad
    return bytes(out)


def encode_pgm(frame: np.ndarray) -> bytes:
    """(H, W) uint8 luma → binary PGM (P5) — the single-frame payload
    emitted by frame sampling; decodable by imagecodec.decode_image."""
    h, w = frame.shape
    return b"P5\n%d %d\n255\n" % (w, h) + frame.astype(np.uint8).tobytes()


def video_features(frames: np.ndarray, width: int, height: int) -> list[float]:
    """8 real content features over the luma stack: mean/std luma, mean
    absolute inter-frame delta (motion proxy), scene-cut ratio (frames
    whose mean luma jumps > 16/255), aspect ratio, frame count, spatial
    gradient energy (detail proxy), first-vs-last frame delta (loop/static
    detector). float64 fixed-order reductions (bit-stable)."""
    x = frames.astype(np.float64) / 255.0
    mean = float(x.mean())
    std = float(x.std())
    if frames.shape[0] > 1:
        deltas = np.abs(np.diff(x, axis=0))
        motion = float(deltas.mean())
        frame_means = x.mean(axis=(1, 2))
        cuts = float(np.count_nonzero(np.abs(np.diff(frame_means)) > 16.0 / 255.0))
        cut_ratio = cuts / (frames.shape[0] - 1)
        endpoints = float(np.abs(x[-1] - x[0]).mean())
    else:
        motion = cut_ratio = endpoints = 0.0
    grad = float(np.abs(np.diff(x, axis=2)).mean()) if width > 1 else 0.0
    return [
        mean,
        std,
        motion,
        cut_ratio,
        width / height,
        float(frames.shape[0]),
        grad,
        endpoints,
    ]
