"""Baseline JPEG (ITU-T T.81 sequential DCT, Annex K tables) in pure
numpy + stdlib — both decoder and encoder.

Why it exists: the container ships no PIL/ffmpeg, but JPEG is the one
format a 100 TB image corpus cannot avoid, so the image pipeline's decode
stage should be real, not a digest fake (round-4 verdict item #6). This
module implements the baseline profile end-to-end from the public spec:

- decoder: SOI/APP*/COM/DQT/DHT/DRI/SOF0/SOS parsing, canonical Huffman
  decode, DC prediction + restart intervals, dequantization, inverse
  zigzag, 8×8 IDCT (separable orthonormal DCT-III via one 8×8 matrix),
  chroma upsampling for any (h, v) sampling factors incl. 4:2:0/4:2:2,
  YCbCr→RGB (BT.601 full-range, the JFIF convention), uint8 clip.
- encoder: quality-scaled Annex K quantization tables, 4:4:4 or 4:2:0
  sampling, forward DCT, zigzag, Annex K Huffman tables, byte stuffing.

Everything is deterministic (fixed float64 op order, integer rounding via
np.round) so decode(encode(x)) is bit-stable across partitionings and
retries — the contract every other codec in operators/imagecodec.py obeys.

Scope (documented): baseline sequential (SOF0/1) AND progressive (SOF2)
DCT, 8-bit, Huffman — progressive implements T.81 Annex G spectral
selection + successive approximation for both DC and AC bands (first and
refinement passes, EOB runs, restart intervals), with coefficients
accumulated across scans and one shared reconstruction (dequant → IDCT →
upsample → YCbCr→RGB). A progressive ENCODER (`encode_jpeg_progressive`)
emits a libjpeg-style 10-scan script so the roundtrip is testable without
external codecs; because progressive is an entropy-level reorganization
of the same quantized coefficients, its decode is bit-identical to the
baseline decode of the same image — the property the tests pin.
Arithmetic coding, 12-bit, lossless, and hierarchical modes raise
``UnsupportedJpegError`` — callers (operators/multimodal.py) treat that
exactly like an unknown format and fall back to the deterministic digest
path, so a mixed corpus never crashes the job.

Performance note: entropy decode is bit-serial Python — the honest cost of
a pure-Python codec. It runs inside Arrow-batched ``mapInPandas`` workers,
so at scale it parallelizes per-core like any Pandas UDF; swap in a native
codec (PIL/turbojpeg) by replacing `decode_jpeg` when the cluster image has
one. The block math (DCT/IDCT/quant) is vectorized numpy over all blocks
at once.
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np


class UnsupportedJpegError(ValueError):
    """Valid JPEG, but outside the baseline-sequential scope."""


# ---------------------------------------------------------------- tables

# zigzag order: index i holds the raster position of the i-th zigzag coeff
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 quantization tables (luminance, chrominance), raster order.
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# Annex K.3 Huffman specs: (BITS counts per code length 1..16, HUFFVAL).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix: forward = D @ x, inverse = D.T @ X
_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0)
_D *= 0.5
_D[0, :] *= 1.0 / np.sqrt(2.0)


def _dct2(blocks: np.ndarray) -> np.ndarray:
    """(N, 8, 8) spatial → (N, 8, 8) DCT coefficients."""
    return _D @ blocks @ _D.T


def _idct2(blocks: np.ndarray) -> np.ndarray:
    """(N, 8, 8) DCT coefficients → spatial."""
    return _D.T @ blocks @ _D


# ---------------------------------------------------------------- huffman


@lru_cache(maxsize=64)
def _build_decode_table_cached(
    bits: tuple[int, ...], vals: tuple[int, ...]
) -> dict[tuple[int, int], int]:
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_decode_table(bits, vals) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman: {(length, code) -> value}. Memoized — a
    corpus decode sees the same (usually Annex K) tables millions of
    times, and rebuilding them dominated the per-small-image decode
    profile (4 DHT segments per file)."""
    return _build_decode_table_cached(tuple(bits), tuple(vals))


@lru_cache(maxsize=64)
def _build_encode_table_cached(
    bits: tuple[int, ...], vals: tuple[int, ...]
) -> dict[int, tuple[int, int]]:
    return {
        v: (c, l)
        for (l, c), v in _build_decode_table_cached(bits, vals).items()
    }


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """{value -> (code, length)} (memoized like the decode table)."""
    return _build_encode_table_cached(tuple(bits), tuple(vals))


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing
    and restart-marker awareness."""

    __slots__ = ("data", "pos", "bitbuf", "bitcnt")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.bitcnt = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                # restart marker reached mid-read: spec says pad with 1s
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.bitcnt += 8
                return
            else:
                # EOI or another marker — pad
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.bitcnt += 8
                return
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.bitcnt += 8

    def read_bit(self) -> int:
        if self.bitcnt == 0:
            self._fill()
        self.bitcnt -= 1
        return (self.bitbuf >> self.bitcnt) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_restart(self) -> None:
        """Drop partial bits and consume one RSTn marker."""
        self.bitbuf = 0
        self.bitcnt = 0
        d = self.data
        # scan to the marker (should be immediate modulo stuffing)
        while self.pos < len(d) - 1:
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("jpeg: expected restart marker")


def _decode_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------- decoder


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes → (H, W, 3) uint8 RGB (grayscale replicates channels).

    Baseline sequential (SOF0/1) and progressive (SOF2) Huffman; raises
    UnsupportedJpegError for arithmetic/12-bit/lossless/hierarchical
    streams and ValueError for corrupt data.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, components)
    progressive = False
    prog_coeffs = None  # comp id -> (by, bx, 8, 8) int32, across scans
    restart_interval = 0
    pos = 2
    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            raise ValueError("jpeg: bad marker alignment")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8:  # spurious SOI
            continue
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # stray RST
            continue
        seglen = struct.unpack_from(">H", data, pos)[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq != 0:
                    raise UnsupportedJpegError("jpeg: 16-bit quant tables")
                tbl = np.frombuffer(seg, np.uint8, 64, i).astype(np.float64)
                qt[tq] = tbl[UNZIGZAG].reshape(8, 8)
                i += 64
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_table(bits, vals)
                i += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline(+ext), SOF2 prog
            precision = seg[0]
            if precision != 8:
                raise UnsupportedJpegError("jpeg: non-8-bit precision")
            h, w = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                tq = seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise UnsupportedJpegError(
                f"jpeg: SOF{marker - 0xC0} not baseline/progressive"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs = seg[1 + 2 * c]
                tt = seg[2 + 2 * c]
                scan.append({"id": cs, "td": tt >> 4, "ta": tt & 0x0F})
            if not progressive:
                return _decode_scan(
                    data, pos + seglen, frame, scan, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            a = seg[3 + 2 * ns]
            if prog_coeffs is None:
                _, _, mcux, mcuy = _mcu_geometry(frame)
                prog_coeffs = {
                    c["id"]: np.zeros(
                        (mcuy * c["v"], mcux * c["h"], 8, 8), dtype=np.int32
                    )
                    for c in frame[2]
                }
            pos = _decode_progressive_scan(
                data, pos + seglen, frame, scan, ss, se, a >> 4, a & 0x0F,
                prog_coeffs, huff_dc, huff_ac, restart_interval,
            )
            continue  # pos already sits at the next marker
        pos += seglen
    if prog_coeffs is not None:
        return _reconstruct(frame, prog_coeffs, qt)
    raise ValueError("jpeg: no scan data")


def _mcu_geometry(frame):
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    return hmax, vmax, -(-w // (8 * hmax)), -(-h // (8 * vmax))


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    h, w, comps = frame
    by_id = {c["id"]: c for c in comps}
    hmax, vmax, mcux, mcuy = _mcu_geometry(frame)
    coeffs = {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 8, 8), dtype=np.float64)
        for c in comps
    }
    br = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count == restart_interval:
                br.align_to_restart()
                pred = {c["id"]: 0 for c in comps}
                mcu_count = 0
            for sc in scan:
                c = by_id[sc["id"]]
                dct_tbl = huff_dc[sc["td"]]
                act_tbl = huff_ac[sc["ta"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, dtype=np.float64)
                        t = _decode_huff(br, dct_tbl)
                        diff = _extend(br.read_bits(t), t)
                        pred[c["id"]] += diff
                        blk[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, act_tbl)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            blk[ZIGZAG[k]] = _extend(br.read_bits(s), s)
                            k += 1
                        coeffs[c["id"]][
                            my * c["v"] + by, mx * c["h"] + bx
                        ] = blk.reshape(8, 8)
            mcu_count += 1
    return _reconstruct(frame, coeffs, qt)


def _reconstruct(frame, coeffs, qt):
    """Shared back half of both decode modes: per-component dequantize +
    IDCT (vectorized over all blocks), chroma upsample, crop, color."""
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out_planes = []
    for c in comps:
        cf = coeffs[c["id"]]
        q = qt[c["tq"]]
        by, bx = cf.shape[:2]
        blocks = cf.reshape(-1, 8, 8).astype(np.float64) * q
        spatial = _idct2(blocks) + 128.0
        grid = spatial.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(
            by * 8, bx * 8
        )
        # upsample to full MCU-padded resolution, then crop to (h, w)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            grid = np.repeat(np.repeat(grid, ry, axis=0), rx, axis=1)
        out_planes.append(grid[:h, :w])
    if len(out_planes) == 1:
        y = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    if len(out_planes) != 3:
        raise UnsupportedJpegError("jpeg: CMYK/other component counts")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------------------- progressive


def _next_marker(data: bytes, pos: int) -> int:
    """Position of the next real marker (not a stuffed 0x00, not RSTn) at
    or after ``pos`` — the end of a scan's entropy-coded segment."""
    n = len(data)
    while pos < n - 1:
        if data[pos] == 0xFF and data[pos + 1] != 0x00 and not (
            0xD0 <= data[pos + 1] <= 0xD7
        ):
            return pos
        pos += 1
    return n


def _decode_progressive_scan(data, pos, frame, scan, ss, se, ah, al,
                             coeffs, huff_dc, huff_ac, restart_interval):
    """One SOS of a progressive frame (T.81 Annex G): a DC or AC spectral
    band, first pass (Ah=0) or successive-approximation refinement
    (Ah>0), decoded into the persistent per-component coefficient grids.
    Returns the stream position of the marker after the entropy data.

    Band/geometry rules (G.2): a DC scan may interleave components in MCU
    order (covering the MCU-padded block grid); an AC scan carries exactly
    one component, non-interleaved, over that component's ACTUAL block
    grid (ceil(comp_size/8)) — padded MCU blocks are only ever coded by
    interleaved DC scans. Restart intervals reset DC prediction and the
    EOB run, counted per MCU (interleaved) or per block (otherwise)."""
    h, w, comps = frame
    by_id = {c["id"]: c for c in comps}
    hmax, vmax, mcux, mcuy = _mcu_geometry(frame)
    br = _BitReader(data, pos)
    eobrun = 0
    if ss == 0:  # DC band
        if se != 0:
            raise ValueError("jpeg: DC scan with Se != 0")
        pred = {sc["id"]: 0 for sc in scan}

        def dc_unit(sc, cf, by, bx):
            if ah == 0:
                t = _decode_huff(br, huff_dc[sc["td"]])
                pred[sc["id"]] += _extend(br.read_bits(t), t)
                cf[by, bx, 0, 0] = pred[sc["id"]] << al
            elif br.read_bit():
                cf[by, bx, 0, 0] |= 1 << al

        if len(scan) > 1:  # interleaved: MCU order over the padded grid
            mcu_count = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and mcu_count == restart_interval:
                        br.align_to_restart()
                        pred = {sc["id"]: 0 for sc in scan}
                        mcu_count = 0
                    for sc in scan:
                        c = by_id[sc["id"]]
                        cf = coeffs[c["id"]]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                dc_unit(sc, cf, my * c["v"] + by,
                                        mx * c["h"] + bx)
                    mcu_count += 1
        else:  # single component: its actual block grid, MCU = one block
            sc = scan[0]
            c = by_id[sc["id"]]
            cf = coeffs[c["id"]]
            cy, cx = _actual_blocks(frame, c)
            mcu_count = 0
            for by in range(cy):
                for bx in range(cx):
                    if restart_interval and mcu_count == restart_interval:
                        br.align_to_restart()
                        pred = {sc["id"]: 0}
                        mcu_count = 0
                    dc_unit(sc, cf, by, bx)
                    mcu_count += 1
    else:  # AC band: exactly one component, non-interleaved
        if len(scan) != 1:
            raise ValueError("jpeg: interleaved AC scan")
        sc = scan[0]
        c = by_id[sc["id"]]
        tbl = huff_ac[sc["ta"]]
        cf = coeffs[c["id"]]
        cy, cx = _actual_blocks(frame, c)
        mcu_count = 0
        for by in range(cy):
            for bx in range(cx):
                if restart_interval and mcu_count == restart_interval:
                    br.align_to_restart()
                    eobrun = 0
                    mcu_count = 0
                blk = cf[by, bx].reshape(64)
                if ah == 0:
                    eobrun = _ac_first(br, tbl, blk, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine(br, tbl, blk, ss, se, al, eobrun)
                mcu_count += 1
    return _next_marker(data, br.pos)


def _actual_blocks(frame, c):
    """(rows, cols) of a component's real block grid — ceil of the
    downsampled component size over 8 (T.81 A.1.1), NOT the MCU-padded
    grid non-interleaved scans never cover."""
    h, w, comps = frame
    hmax = max(k["h"] for k in comps)
    vmax = max(k["v"] for k in comps)
    comp_h = -(-(h * c["v"]) // vmax)
    comp_w = -(-(w * c["h"]) // hmax)
    return -(-comp_h // 8), -(-comp_w // 8)


def _ac_first(br, tbl, blk, ss, se, al, eobrun):
    """First pass of an AC band (G.1.2.2): zero-run/size symbols place
    ``value << Al``; EOBn symbols start a run of end-of-band blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(br, tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            eobrun = (1 << r) - 1  # this block is part of the run
            if r:
                eobrun += br.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("jpeg: AC band overflow")
        blk[ZIGZAG[k]] = _extend(br.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine(br, tbl, blk, ss, se, al, eobrun):
    """Successive-approximation refinement of an AC band (G.1.2.3):
    one correction bit per already-nonzero coefficient crossed, newly
    nonzero coefficients appear as ±(1 << Al), and EOB runs carry
    correction bits through the rest of the band."""
    p1, m1 = 1 << al, -1 << al

    def correct(zz):
        if br.read_bit():
            v = int(blk[zz])
            if (v & p1) == 0:
                blk[zz] = v + (p1 if v >= 0 else m1)

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huff(br, tbl)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                newval = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("jpeg: refinement size != 1")
                newval = p1 if br.read_bit() else m1
            # advance over r zero-history coefficients, correcting the
            # nonzero-history ones crossed on the way
            while k <= se:
                zz = ZIGZAG[k]
                if blk[zz] != 0:
                    correct(zz)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                blk[ZIGZAG[k]] = newval
            k += 1
    if eobrun > 0:
        while k <= se:  # correction bits through the rest of the band
            zz = ZIGZAG[k]
            if blk[zz] != 0:
                correct(zz)
            k += 1
        eobrun -= 1
    return eobrun


# ---------------------------------------------------------------- encoder


class _BitWriter:
    __slots__ = ("out", "bitbuf", "bitcnt")

    def __init__(self):
        self.out = bytearray()
        self.bitbuf = 0
        self.bitcnt = 0

    def write(self, code: int, length: int) -> None:
        self.bitbuf = (self.bitbuf << length) | (code & ((1 << length) - 1))
        self.bitcnt += length
        while self.bitcnt >= 8:
            self.bitcnt -= 8
            b = (self.bitbuf >> self.bitcnt) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.bitcnt:
            pad = 8 - self.bitcnt
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a base table; clamp to [1, 255]."""
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    t = np.floor((q * s + 50) / 100)
    return np.clip(t, 1, 255)


def _mag_cat(v: int) -> int:
    """Magnitude category (bit length of |v|)."""
    return int(abs(v)).bit_length()


def _encode_block(bw, zz, pred, dc_tbl, ac_tbl):
    """Entropy-encode one zigzagged, quantized block; returns new DC pred."""
    dc = int(zz[0])
    diff = dc - pred
    t = _mag_cat(diff)
    code, length = dc_tbl[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    # AC coefficients
    run = 0
    last_nz = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = nz[-1] + 1 if nz.size else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tbl[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _mag_cat(v)
        code, length = ac_tbl[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_tbl[0x00]  # EOB
        bw.write(code, length)
    return dc


def _component_blocks(plane: np.ndarray) -> np.ndarray:
    """(H8, W8) float plane (multiple-of-8 dims) → (N, 8, 8) blocks in
    raster MCU order for a single-sampling component."""
    h8, w8 = plane.shape
    return (
        plane.reshape(h8 // 8, 8, w8 // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _pad_to(img: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate pad a 2-D plane to multiples of (mh, mw)."""
    h, w = img.shape
    ph = (-h) % mh
    pw = (-w) % mw
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw)), mode="edge")
    return img


def _encode_prep(rgb: np.ndarray, quality: int, subsample: bool) -> dict:
    """Shared encoder front end (baseline and progressive emit the SAME
    quantized coefficients — progressive is an entropy-level reordering):
    color transform, optional 4:2:0 downsample, padding, DCT, quantize."""
    h, w = rgb.shape[:2]
    x = rgb.astype(np.float64)
    r, g, b = x[:, :, 0], x[:, :, 1], x[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b

    ql = _quality_scale(QT_LUMA, quality)
    qc = _quality_scale(QT_CHROMA, quality)
    ql2, qc2 = ql.reshape(8, 8), qc.reshape(8, 8)

    if subsample:
        yh, yv, mh, mw = 2, 2, 16, 16
        yp = _pad_to(y, 16, 16)
        # 2x2 box average then pad to 8 — deterministic chroma downsample
        cbp = _pad_to(cb, 2, 2)
        crp = _pad_to(cr, 2, 2)
        cbs = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean((1, 3))
        crs = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean((1, 3))
        cbs = _pad_to(cbs, 8, 8)
        crs = _pad_to(crs, 8, 8)
    else:
        yh, yv, mh, mw = 1, 1, 8, 8
        yp = _pad_to(y, 8, 8)
        cbs = _pad_to(cb, 8, 8)
        crs = _pad_to(cr, 8, 8)

    def quantized_zz(plane: np.ndarray, q2: np.ndarray) -> np.ndarray:
        blocks = _component_blocks(plane)
        coeff = _dct2(blocks) / q2
        qz = np.round(coeff).astype(np.int64)
        return qz.reshape(-1, 64)[:, ZIGZAG]  # -> zigzag order per block

    return {
        "h": h, "w": w, "yh": yh, "yv": yv,
        "ql": ql, "qc": qc,
        "yzz": quantized_zz(yp, ql2),
        "cbzz": quantized_zz(cbs, qc2),
        "crzz": quantized_zz(crs, qc2),
        "ybw": yp.shape[1] // 8,  # y blocks per padded row
        "cbw": cbs.shape[1] // 8,
        "mcux": yp.shape[1] // mw,
        "mcuy": yp.shape[0] // mh,
    }


def _frame_headers(p: dict, sof_marker: int) -> bytearray:
    """SOI + APP0/JFIF + DQT×2 + SOFn + the four Annex K DHT segments."""

    def dqt(tid: int, tbl: np.ndarray) -> bytes:
        zz = tbl.reshape(64)[ZIGZAG].astype(np.uint8)
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz.tobytes()

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x01\x01"
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += dqt(0, p["ql"])
    out += dqt(1, p["qc"])
    sof = struct.pack(">BHHB", 8, p["h"], p["w"], 3)
    sof += bytes([1, (p["yh"] << 4) | p["yv"], 0])
    sof += bytes([2, 0x11, 1])
    sof += bytes([3, 0x11, 1])
    out += bytes([0xFF, sof_marker]) + struct.pack(">H", 2 + len(sof)) + sof
    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
    out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    return out


def encode_jpeg(rgb: np.ndarray, quality: int = 90, subsample: bool = False) -> bytes:
    """(H, W, 3) uint8 RGB → baseline JFIF bytes (4:4:4, or 4:2:0 when
    ``subsample``). Deterministic for identical inputs."""
    p = _encode_prep(rgb, quality, subsample)
    yh, yv = p["yh"], p["yv"]
    yzz, cbzz, crzz = p["yzz"], p["cbzz"], p["crzz"]
    ybw, cbw = p["ybw"], p["cbw"]
    mcux, mcuy = p["mcux"], p["mcuy"]

    dc_l = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)

    bw = _BitWriter()
    pred = {"y": 0, "cb": 0, "cr": 0}
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(yv):
                for bx in range(yh):
                    idx = (my * yv + by) * ybw + (mx * yh + bx)
                    pred["y"] = _encode_block(bw, yzz[idx], pred["y"], dc_l, ac_l)
            cidx = my * cbw + mx
            pred["cb"] = _encode_block(bw, cbzz[cidx], pred["cb"], dc_c, ac_c)
            pred["cr"] = _encode_block(bw, crzz[cidx], pred["cr"], dc_c, ac_c)
    bw.flush()

    out = _frame_headers(p, 0xC0)
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------ progressive encoder

# libjpeg's default scan script (jcparam.c): DC first at Al=1 interleaved,
# AC first passes split Y into a 1-5 band then 6-63 (chroma whole-band),
# then successive-approximation refinements down to Al=0 for every band.
# Exercises every progressive decode path: spectral selection, DC+AC
# first, DC+AC refinement, multi-level Y refinement.
# Rows: (comp, ss, se, ah, al) with comp None = all components (DC scan).
_PROGRESSIVE_SCRIPT = (
    (None, 0, 0, 0, 1),
    (0, 1, 5, 0, 2),
    (1, 1, 63, 0, 1),
    (2, 1, 63, 0, 1),
    (0, 6, 63, 0, 2),
    (0, 1, 63, 2, 1),
    (None, 0, 0, 1, 0),
    (1, 1, 63, 1, 0),
    (2, 1, 63, 1, 0),
    (0, 1, 63, 1, 0),
)


def _emit_ac_first_block(bw, blk, tbl, ss, se, al):
    """First-pass AC band of one block (G.1.2.2 encoder side): values are
    divided by 2^Al toward zero (sign-magnitude shift, the T.81 point
    transform for AC); EOB is emitted per block (symbol 0x00 = run of 1)
    because the Annex K tables carry no EOBn>1 symbols — valid, just less
    compressed than a tuned-table encoder."""
    vals = []
    for k in range(ss, se + 1):
        v = int(blk[k])
        a = abs(v) >> al
        vals.append(a if v >= 0 else -a)
    last = -1
    for i, v in enumerate(vals):
        if v:
            last = i
    run = 0
    for i in range(last + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = tbl[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _mag_cat(v)
        code, length = tbl[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < se - ss:
        code, length = tbl[0x00]  # EOB
        bw.write(code, length)


def _emit_ac_refine_block(bw, blk, tbl, ss, se, al):
    """Refinement AC band of one block (G.1.2.3 encoder side, the libjpeg
    encode_mcu_AC_refine structure with the EOB run flushed per block):
    newly-nonzero coefficients (|v| >> Al == 1) emit run/size-1 symbols +
    a sign bit; previously-nonzero ones buffer their correction bit
    (|v| >> Al) & 1, appended after the next emitted symbol."""
    absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
    eobpos = -1
    for i, t in enumerate(absv):
        if t == 1:
            eobpos = i
    run = 0
    corr: list[int] = []
    for i, t in enumerate(absv):
        if t == 0:
            run += 1
            continue
        while run > 15 and i <= eobpos:
            code, length = tbl[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
            for b in corr:
                bw.write(b, 1)
            corr = []
        if t > 1:  # already visible at the previous level: correction bit
            corr.append(t & 1)
            continue
        # newly nonzero at this level
        code, length = tbl[(run << 4) | 1]
        bw.write(code, length)
        bw.write(1 if int(blk[ss + i]) >= 0 else 0, 1)
        for b in corr:
            bw.write(b, 1)
        corr = []
        run = 0
    if run > 0 or corr:
        code, length = tbl[0x00]  # EOB (run of 1) + trailing corrections
        bw.write(code, length)
        for b in corr:
            bw.write(b, 1)


def encode_jpeg_progressive(
    rgb: np.ndarray, quality: int = 90, subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(H, W, 3) uint8 RGB → progressive (SOF2) JFIF bytes with the
    libjpeg-style 10-scan script. Emits the SAME quantized coefficients
    as ``encode_jpeg`` — progressive is a lossless entropy-level
    reorganization, so ``decode_jpeg`` of this stream is bit-identical
    to decoding the baseline stream of the same image (the tested
    contract). ``restart_interval`` > 0 emits a DRI segment and RSTn
    markers every that many MCUs (interleaved DC scans) / blocks (all
    other scans), resetting DC prediction per T.81 — the hook the
    decoder's progressive restart path is tested through.
    Deterministic for identical inputs."""
    p = _encode_prep(rgb, quality, subsample)
    h, w, yh, yv = p["h"], p["w"], p["yh"], p["yv"]
    mcux, mcuy = p["mcux"], p["mcuy"]

    dc_l = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)

    def ceil_div(a, b):
        return -(-a // b)

    # chroma component size = ceil(dim / sampling), per T.81 A.1.1
    c_acy = ceil_div(ceil_div(h, yv), 8)
    c_acx = ceil_div(ceil_div(w, yh), 8)
    # per component: scan id, coefficient rows (padded raster order),
    # padded blocks-per-row, sampling, tables, actual (non-padded) grid
    comps = [
        {"cid": 1, "zz": p["yzz"], "bw": p["ybw"], "h": yh, "v": yv,
         "dc": dc_l, "ac": ac_l, "td": 0, "ta": 0,
         "acy": ceil_div(h, 8), "acx": ceil_div(w, 8)},
        {"cid": 2, "zz": p["cbzz"], "bw": p["cbw"], "h": 1, "v": 1,
         "dc": dc_c, "ac": ac_c, "td": 1, "ta": 1,
         "acy": c_acy, "acx": c_acx},
        {"cid": 3, "zz": p["crzz"], "bw": p["cbw"], "h": 1, "v": 1,
         "dc": dc_c, "ac": ac_c, "td": 1, "ta": 1,
         "acy": c_acy, "acx": c_acx},
    ]

    out = _frame_headers(p, 0xC2)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    for comp_sel, ss, se, ah, al in _PROGRESSIVE_SCRIPT:
        bw = _BitWriter()

        def maybe_restart(unit_idx: int) -> bool:
            """Emit RSTn before this unit when a restart group just ended
            (T.81 E.1.4: marker index cycles 0-7 per scan)."""
            if not (restart_interval and unit_idx
                    and unit_idx % restart_interval == 0):
                return False
            bw.flush()
            bw.out += bytes(
                [0xFF, 0xD0 + ((unit_idx // restart_interval - 1) % 8)]
            )
            return True

        if comp_sel is None:  # DC scan, interleaved over the padded grid
            sos = bytearray([3])
            for c in comps:
                sos += bytes([c["cid"], c["td"] << 4])
            sos += bytes([ss, se, (ah << 4) | al])
            pred = {c["cid"]: 0 for c in comps}
            for m in range(mcuy * mcux):
                if maybe_restart(m):
                    pred = {c["cid"]: 0 for c in comps}
                my, mx = divmod(m, mcux)
                for c in comps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            idx = (my * c["v"] + by) * c["bw"] \
                                + (mx * c["h"] + bx)
                            dc = int(c["zz"][idx][0]) >> al
                            if ah == 0:
                                diff = dc - pred[c["cid"]]
                                pred[c["cid"]] = dc
                                t = _mag_cat(diff)
                                code, length = c["dc"][t]
                                bw.write(code, length)
                                if t:
                                    bw.write(
                                        diff if diff >= 0
                                        else diff + (1 << t) - 1, t)
                            else:
                                bw.write(dc & 1, 1)
        else:  # AC scan: one component, its actual block grid
            c = comps[comp_sel]
            sos = bytearray([1, c["cid"], c["ta"]])
            sos += bytes([ss, se, (ah << 4) | al])
            for m in range(c["acy"] * c["acx"]):
                maybe_restart(m)  # per-block EOB flush: no encoder state
                by, bx = divmod(m, c["acx"])
                blk = c["zz"][by * c["bw"] + bx]
                if ah == 0:
                    _emit_ac_first_block(bw, blk, c["ac"], ss, se, al)
                else:
                    _emit_ac_refine_block(bw, blk, c["ac"], ss, se, al)
        bw.flush()
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + bytes(sos)
        out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
