"""Real audio codec in pure stdlib+numpy: RIFF/WAVE PCM (16-bit),
G.711 companded WAV (u-law format 7, A-law format 6 — decoded to int16
through the closed-form expansion, the telephony corpus staple), and
IMA/DVI ADPCM (format 0x11, 4-bit adaptive delta PCM — the game-audio
and voice-archive workhorse), with a block-vectorized decoder whose
interpreter cost is O(samples_per_block) regardless of duration.

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
    fact_samples = None
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"fact" and len(body) >= 4:
            fact_samples = int.from_bytes(body[0:4], "little")
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
    if audio_format == 0x11 and bits == 4:  # IMA/DVI ADPCM
        block_align = fmt[4]
        decoded = decode_ima_adpcm(pcm, channels, block_align)
        if decoded is None:
            return None
        # the encoder zero-pads the final block; the fact chunk records
        # the true sample count — honor it so decode(encode(x)) is
        # length-preserving and features agree with the container probe
        if fact_samples is not None and 0 < fact_samples <= decoded.shape[0]:
            decoded = decoded[:fact_samples]
        return decoded, sample_rate
    if audio_format != 1 or bits != 16:
        return None
    usable = len(pcm) - (len(pcm) % (2 * channels))
    if usable <= 0:
        return None
    samples = np.frombuffer(pcm, dtype="<i2", count=usable // 2)
    return samples.reshape(-1, channels).copy(), sample_rate


def decode_aiff(data: bytes) -> tuple[np.ndarray, int] | None:
    """AIFF (FORM/AIFF) 16-bit big-endian PCM → ((n, ch) int16, rate).
    COMM supplies channels/frames/bits and the sample rate as an 80-bit
    IEEE extended float (decoded exactly); SSND carries offset+blocksize
    then interleaved big-endian samples. Returns None for AIFC compressed
    variants or non-16-bit depth."""
    if len(data) < 12 or data[:4] != b"FORM" or data[8:12] != b"AIFF":
        return None
    pos = 12
    channels = bits = rate = 0
    frames = 0
    pcm = None
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        csz = int.from_bytes(data[pos + 4 : pos + 8], "big")
        body = data[pos + 8 : pos + 8 + csz]
        if cid == b"COMM" and len(body) >= 18:
            channels = int.from_bytes(body[0:2], "big")
            frames = int.from_bytes(body[2:6], "big")
            bits = int.from_bytes(body[6:8], "big")
            exp = (int.from_bytes(body[8:10], "big") & 0x7FFF) - 16383
            mant = int.from_bytes(body[10:18], "big")
            rate = int(mant * (2.0 ** (exp - 63))) if mant else 0
        elif cid == b"SSND" and len(body) >= 8:
            off = int.from_bytes(body[0:4], "big")
            pcm = body[8 + off :]
        pos += 8 + csz + (csz & 1)
    if not rate or not channels or bits != 16 or pcm is None:
        return None
    usable = len(pcm) - (len(pcm) % (2 * channels))
    if usable <= 0:
        return None
    samples = np.frombuffer(pcm, dtype=">i2", count=usable // 2)
    out = samples.reshape(-1, channels)[: frames or None]
    return out.astype(np.int16), rate


def encode_aiff(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) or (n, ch) int16 → AIFF with an exact 80-bit extended-float
    rate (fixture + interchange writer)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    nframes, channels = samples.shape
    import math

    e = math.floor(math.log2(sample_rate))
    mant = int(sample_rate / (2**e) * (1 << 63))
    comm = (
        b"COMM"
        + (18).to_bytes(4, "big")
        + struct.pack(">hIh", channels, nframes, 16)
        + struct.pack(">H", 16383 + e)
        + mant.to_bytes(8, "big")
    )
    pcm = samples.astype(">i2").tobytes()
    ssnd = b"SSND" + (8 + len(pcm)).to_bytes(4, "big") + b"\x00" * 8 + pcm
    body = b"AIFF" + comm + ssnd
    return b"FORM" + len(body).to_bytes(4, "big") + body


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


# ---------------------------------------------------------------------------
# IMA / DVI ADPCM (WAVE format 0x11) — 4 bits/sample adaptive delta PCM,
# the game-audio / telephony archive staple. Blocks are independent
# (each opens with a full predictor+step-index header), which is exactly
# what makes the format distributable — and lets the decoder vectorize
# ACROSS blocks: the Python loop runs once per in-block sample position
# with numpy ops over all blocks at once, so decode cost per payload is
# O(samples_per_block) interpreter steps regardless of duration.
# ---------------------------------------------------------------------------

_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)
_IMA_STEP = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int32,
)


def _ima_reconstruct(nib: np.ndarray, pred: np.ndarray, idx: np.ndarray):
    """One IMA step for a vector of streams: nibble + (pred, idx) state →
    new (pred, idx). The diff formula is the spec's shift-add form
    (step/8 + step/4·b0 + step/2·b1 + step·b2), bit-exact vs reference
    decoders."""
    step = _IMA_STEP[idx]
    diff = step >> 3
    diff = diff + np.where(nib & 1, step >> 2, 0)
    diff = diff + np.where(nib & 2, step >> 1, 0)
    diff = diff + np.where(nib & 4, step, 0)
    diff = np.where(nib & 8, -diff, diff)
    pred = np.clip(pred + diff, -32768, 32767)
    idx = np.clip(idx + _IMA_INDEX[nib & 7], 0, 88)
    return pred, idx


def _ima_channel_nibbles(blocks: np.ndarray, channels: int, ch: int) -> np.ndarray:
    """(n_blocks, block_align) uint8 → (n_blocks, n_samples-1) nibble
    stream for one channel. IMA interleaves 4-byte words round-robin per
    channel after the per-channel 4-byte headers; within a byte the LOW
    nibble is the earlier sample."""
    body = blocks[:, 4 * channels :]
    words = body.reshape(blocks.shape[0], -1, 4)
    mine = words[:, ch::channels, :].reshape(blocks.shape[0], -1)
    nib = np.empty((mine.shape[0], mine.shape[1] * 2), dtype=np.uint8)
    nib[:, 0::2] = mine & 0x0F
    nib[:, 1::2] = mine >> 4
    return nib


def decode_ima_adpcm(pcm: bytes, channels: int, block_align: int) -> np.ndarray | None:
    """ADPCM data chunk → (n_samples, channels) int16. Partial trailing
    blocks are dropped (the tolerant-reader norm). Returns None on
    geometry that can't be ADPCM (block too small / not word-aligned)."""
    if channels < 1 or block_align < 4 * channels + 4 * channels:
        return None
    if (block_align - 4 * channels) % (4 * channels) != 0:
        return None
    n_blocks = len(pcm) // block_align
    if n_blocks == 0:
        return None
    blocks = np.frombuffer(pcm, dtype=np.uint8, count=n_blocks * block_align)
    blocks = blocks.reshape(n_blocks, block_align)
    spb = (block_align - 4 * channels) * 2 // channels + 1
    out = np.empty((n_blocks, spb, channels), dtype=np.int16)
    for ch in range(channels):
        hdr = blocks[:, 4 * ch : 4 * ch + 4]
        pred = (
            hdr[:, 0].astype(np.int32) | (hdr[:, 1].astype(np.int32) << 8)
        ).astype(np.int16).astype(np.int32)
        idx = np.clip(hdr[:, 2].astype(np.int32), 0, 88)
        out[:, 0, ch] = pred
        nib = _ima_channel_nibbles(blocks, channels, ch)
        for t in range(spb - 1):
            pred, idx = _ima_reconstruct(nib[:, t].astype(np.int32), pred, idx)
            out[:, t + 1, ch] = pred
    return out.reshape(-1, channels)


def encode_ima_adpcm_wav(
    samples: np.ndarray, sample_rate: int, block_align: int | None = None
) -> bytes:
    """(n,) or (n, ch) int16 → IMA ADPCM WAV (format 0x11) with the
    canonical fmt-extension (wSamplesPerBlock) and fact chunk. Encoder
    state selection is the spec quantizer (successive step halving), run
    block-vectorized like the decoder. The tail is zero-padded to a whole
    block; the fact chunk records the true sample count."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    if n == 0:
        raise ValueError("empty signal")
    if block_align is None:
        block_align = 256 * channels
    # Same geometry check as decode_ima_adpcm: the data body must pack into
    # whole 4-byte channel words, else the nibble-pair packing below would
    # die on a numpy shape mismatch instead of a clear error (r5 ADVICE).
    if block_align <= 4 * channels or (block_align - 4 * channels) % (4 * channels) != 0:
        raise ValueError(
            f"block_align {block_align} invalid for {channels} channel(s): "
            f"need 4*channels header + a multiple of 4*channels data bytes"
        )
    spb = (block_align - 4 * channels) * 2 // channels + 1
    n_blocks = -(-n // spb)
    padded = np.zeros((n_blocks * spb, channels), dtype=np.int32)
    padded[:n] = samples.astype(np.int32)
    grid = padded.reshape(n_blocks, spb, channels)
    blocks = np.zeros((n_blocks, block_align), dtype=np.uint8)
    for ch in range(channels):
        sig = grid[:, :, ch]
        pred = sig[:, 0].copy()
        # Seed each block's step index from its own mean |first difference|
        # (stored in the block header, so decoders are agnostic to the
        # choice). A zero seed would slew-rate-limit the first ~20 samples
        # of every block while the index climbs from step 7.
        mean_d = np.abs(np.diff(sig, axis=1)).mean(axis=1)
        idx = np.clip(
            np.searchsorted(_IMA_STEP, np.maximum(mean_d, 1.0)), 0, 88
        ).astype(np.int32)
        blocks[:, 4 * ch] = pred & 0xFF
        blocks[:, 4 * ch + 1] = (pred >> 8) & 0xFF
        blocks[:, 4 * ch + 2] = idx
        nib = np.empty((n_blocks, spb - 1), dtype=np.uint8)
        for t in range(spb - 1):
            target = sig[:, t + 1]
            step = _IMA_STEP[idx]
            diff = target - pred
            sign = np.where(diff < 0, 8, 0)
            mag = np.abs(diff)
            code = np.zeros(n_blocks, dtype=np.int32)
            for bit, shift in ((4, 0), (2, 1), (1, 2)):
                thresh = step >> shift
                take = mag >= thresh
                code |= np.where(take, bit, 0)
                mag = np.where(take, mag - thresh, mag)
            nibble = sign | code
            pred, idx = _ima_reconstruct(nibble, pred, idx)
            nib[:, t] = nibble
        packed = (nib[:, 0::2] | (nib[:, 1::2] << 4)).astype(np.uint8)
        words = packed.reshape(n_blocks, -1, 4)
        body = blocks[:, 4 * channels :].reshape(n_blocks, -1, 4)
        body[:, ch::channels, :] = words
    payload = blocks.tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 52 + len(payload))
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHHHH", 20, 0x11, channels, sample_rate,
            (sample_rate * block_align + spb - 1) // spb, block_align, 4,
            2, spb,
        )
        + b"fact"
        + struct.pack("<II", 4, n)
        + b"data"
        + struct.pack("<I", len(payload))
    )
    return hdr + payload
