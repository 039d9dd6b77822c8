"""Real audio codec in pure stdlib+numpy: RIFF/WAVE PCM (16-bit), plus
G.711 companded WAV (u-law format 7, A-law format 6 — decoded to int16
through the closed-form expansion, the telephony corpus staple).

Same philosophy as operators/imagecodec.py: the container ships no
librosa/soundfile/ffmpeg, but canonical PCM WAV is fully parseable with
``struct`` + numpy, which makes the multimodal audio path REAL end to end:
decode → chunk (sample-exact slices re-encoded as standalone WAV) →
feature-extract, all inside Arrow-batched ``mapInPandas`` workers
(operators/multimodal.py). Compressed formats (MP3/AAC/Opus) still require a codec library and keep
the deterministic-fake fallback there.

Everything is deterministic (integer sample math, float64 reductions in
fixed order) so results are stable across partitionings and retries.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_wav(data: bytes) -> tuple[np.ndarray, int] | None:
    """bytes → ((n_samples, n_channels) int16 array, sample_rate), or None
    if not an uncompressed 16-bit PCM RIFF/WAVE payload.

    Walks the RIFF chunk list (fmt / data may be preceded by LIST, fact,
    cue chunks — real recorder output often has them)."""
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    pcm = None
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        return None
    audio_format, channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if channels < 1 or sample_rate <= 0:
        return None
    if audio_format in (6, 7) and bits == 8:  # G.711 A-law / u-law
        usable = len(pcm) - (len(pcm) % channels)
        if usable <= 0:
            return None
        raw = np.frombuffer(pcm, dtype=np.uint8, count=usable)
        lut = _ALAW_LUT if audio_format == 6 else _ULAW_LUT
        return lut[raw].reshape(-1, channels).copy(), sample_rate
    if audio_format != 1 or bits != 16:
        return None
    usable = len(pcm) - (len(pcm) % (2 * channels))
    if usable <= 0:
        return None
    samples = np.frombuffer(pcm, dtype="<i2", count=usable // 2)
    return samples.reshape(-1, channels).copy(), sample_rate


def _build_ulaw_lut() -> np.ndarray:
    """G.711 u-law byte → int16 PCM (the ITU expansion: bias 0x84,
    3-bit exponent, 4-bit mantissa, complemented on the wire)."""
    out = np.zeros(256, dtype=np.int16)
    for b in range(256):
        u = ~b & 0xFF
        sign = u & 0x80
        exp = (u >> 4) & 0x07
        man = u & 0x0F
        mag = ((man << 3) + 0x84) << exp
        mag -= 0x84
        out[b] = -mag if sign else mag
    return out


def _build_alaw_lut() -> np.ndarray:
    """G.711 A-law byte → int16 PCM (the classic reference expansion:
    0x55 XOR on the wire; sign bit SET means positive)."""
    out = np.zeros(256, dtype=np.int16)
    for b in range(256):
        a = b ^ 0x55
        i = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg:
            i = (i + 0x108) << (seg - 1)
        else:
            i += 8
        out[b] = i if (a & 0x80) else -i
    return out


_ULAW_LUT = _build_ulaw_lut()
_ALAW_LUT = _build_alaw_lut()


def _nearest_level_encoder(lut: np.ndarray):
    """Exact inverse quantizer for a 256-level companding LUT: maps each
    int16 sample to the byte whose decoded level is NEAREST (ties toward
    the lower level) — by construction, decode(encode(x)) is the closest
    representable G.711 level to x, and re-encoding a decoded signal is a
    fixpoint."""
    order = np.argsort(lut.astype(np.int32), kind="stable")
    levels = lut.astype(np.int32)[order]

    def enc(x: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(levels, x)
        lo = np.clip(pos - 1, 0, 255)
        hi = np.clip(pos, 0, 255)
        pick_hi = (levels[hi] - x) < (x - levels[lo])
        return order[np.where(pick_hi, hi, lo)].astype(np.uint8)

    return enc


def encode_g711_wav(samples: np.ndarray, sample_rate: int, law: str = "ulaw") -> bytes:
    """(n,) or (n, ch) int16 → companded 8-bit WAV (format 7 u-law or 6
    A-law). The compander is the exact nearest-level inverse of the decode
    LUT, so roundtrip error is exactly the G.711 quantization step."""
    if samples.ndim == 1:
        samples = samples[:, None]
    channels = samples.shape[1]
    flat = samples.astype(np.int32).reshape(-1)
    if law == "ulaw":
        enc = _ULAW_ENC(flat)
        fmt_code = 7
    elif law == "alaw":
        enc = _ALAW_ENC(flat)
        fmt_code = 6
    else:
        raise ValueError("law must be 'ulaw' or 'alaw'")
    payload = enc.astype(np.uint8).tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(payload))
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH", 16, fmt_code, channels, sample_rate,
            sample_rate * channels, channels, 8,
        )
        + b"data"
        + struct.pack("<I", len(payload))
    )
    return hdr + payload


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n_samples, n_channels) int16 → canonical 44-byte-header PCM WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    channels = samples.shape[1]
    pcm = samples.astype("<i2").tobytes()
    block_align = 2 * channels
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, channels, sample_rate,
            sample_rate * block_align, block_align, 16,
        )
        + b"data"
        + struct.pack("<I", len(pcm))
    )
    return hdr + pcm


def duration_ms(samples: np.ndarray, sample_rate: int) -> int:
    """Integer milliseconds covered by the sample block (floor)."""
    return (samples.shape[0] * 1000) // sample_rate


def slice_wav(
    samples: np.ndarray, sample_rate: int, start_ms: int, end_ms: int
) -> np.ndarray:
    """Sample-exact [start_ms, end_ms) window. Boundaries are
    floor(ms * rate / 1000), so adjacent chunks tile the track with no
    overlap and no dropped samples."""
    lo = (start_ms * sample_rate) // 1000
    hi = (end_ms * sample_rate) // 1000
    return samples[lo:hi]


def audio_features(samples: np.ndarray, sample_rate: int) -> list[float]:
    """8 real content features — the classic cheap descriptor vector for
    audio dedup/quality-binning before a learned embedding enters the
    pipeline: RMS level, peak level, zero-crossing rate, spectral centroid
    (normalized to Nyquist), low-band energy share (<1 kHz), duration in
    seconds, channel count, DC offset. float64 fixed-order reductions
    (bit-stable)."""
    mono = samples.astype(np.float64).mean(axis=1) / 32768.0
    n = mono.shape[0]
    if n == 0:
        return [0.0] * 8
    rms = float(np.sqrt(np.mean(mono * mono)))
    peak = float(np.max(np.abs(mono)))
    zcr = float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) / max(
        n - 1, 1
    )
    spec = np.abs(np.fft.rfft(mono))
    power = spec * spec
    total = float(power.sum())
    freqs = np.fft.rfftfreq(n, d=1.0 / sample_rate)
    if total > 0.0:
        centroid = float((freqs * power).sum() / total) / (sample_rate / 2.0)
        low_share = float(power[freqs < 1000.0].sum() / total)
    else:
        centroid = 0.0
        low_share = 0.0
    dc = float(mono.mean())
    return [
        rms,
        peak,
        zcr,
        centroid,
        low_share,
        n / sample_rate,
        float(samples.shape[1]),
        dc,
    ]


def make_tone(
    freq_hz: float,
    ms: int,
    sample_rate: int = 16000,
    channels: int = 1,
    amplitude: float = 0.5,
) -> bytes:
    """Deterministic sine-tone WAV generator (test fixture factory)."""
    n = (ms * sample_rate) // 1000
    t = np.arange(n, dtype=np.float64) / sample_rate
    wave = np.round(amplitude * 32767.0 * np.sin(2.0 * np.pi * freq_hz * t))
    mono = wave.astype(np.int16)
    return encode_wav(np.repeat(mono[:, None], channels, axis=1), sample_rate)


_ULAW_ENC = _nearest_level_encoder(_ULAW_LUT)
_ALAW_ENC = _nearest_level_encoder(_ALAW_LUT)
