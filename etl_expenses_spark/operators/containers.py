"""Container metadata extraction WITHOUT decode: ISO-BMFF (MP4) box walk,
MPEG-1 Layer III (MP3) frame-header scan, and a unified header-only
``probe_media`` census over every format this engine knows.

Rationale: decoding H.264 or MP3 audio needs codec libraries this
container lacks — but the *container* layer is plain structured bytes,
and at 100 TB the first query on a media corpus is a census: format,
duration, resolution, codec fourcc, frame count, bitrate. None of that
requires touching a single compressed sample. This module makes the
census REAL for the two dominant wire formats whose payloads we cannot
decode (.mp4, .mp3), and header-only (no pixel/sample materialization)
for the formats we can (PNG/JPEG/GIF/BMP/PPM/WAV/Y4M).

Reference parity: the reference treats attachments as opaque blobs with
filename/size predicates only (gmail_pipeline/main.py attachment walk);
this is the training-data-pipeline extension layer the multimodal brief
calls for, same MEDIA_SCHEMA plumbing as operators/multimodal.py.

Scale shape: ``probe_media`` is one Arrow-batched ``mapInPandas`` stage —
header bytes only, O(boxes) per MP4 and O(frames) per MP3 with no
allocation proportional to media size; downstream census aggregates are
ordinary shuffled groupBys on the tiny probe rows.

All parsers return ``None`` on any malformed/truncated/garbage input —
never raise — matching the fuzz contract of the codec modules
(tests/test_codec_properties.py).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# ISO-BMFF (MP4 / MOV / 3GP) — box walk
# ---------------------------------------------------------------------------


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for each box in
    data[start:end]. Handles 64-bit largesize (size==1) and to-end-of-file
    (size==0). Stops silently on any malformed size."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(data[pos : pos + 4], "big")
        fourcc = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                return
            size = int.from_bytes(data[pos + 8 : pos + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            return
        yield fourcc, pos + hdr, pos + size
        pos += size


def _find_box(data: bytes, start: int, end: int, fourcc: bytes):
    for fc, s, e in _iter_boxes(data, start, end):
        if fc == fourcc:
            return s, e
    return None


def _timed_header(data: bytes, s: int, e: int, v1_off: int, v0_off: int):
    """(timescale, duration) from an mvhd/mdhd payload; None if truncated.
    v0: u32 duration at v0_off; v1: u64 duration at v1_off (64-bit
    creation/modification times shift everything by 8 bytes)."""
    if e - s < 4:
        return None
    if data[s] == 1:
        if e - s < v1_off + 8:
            return None
        ts = int.from_bytes(data[s + v1_off - 4 : s + v1_off], "big")
        dur = int.from_bytes(data[s + v1_off : s + v1_off + 8], "big")
    else:
        if e - s < v0_off + 4:
            return None
        ts = int.from_bytes(data[s + v0_off - 4 : s + v0_off], "big")
        dur = int.from_bytes(data[s + v0_off : s + v0_off + 4], "big")
    return (ts, dur) if ts > 0 else None


def parse_mp4(data: bytes) -> dict | None:
    """Metadata census of an ISO-BMFF file: brand, movie duration, and
    per-track (handler, codec fourcc, width/height, sample count,
    duration). Never raises; returns None unless a valid ftyp box leads.

    Box layout per ISO/IEC 14496-12: moov/mvhd holds the movie timescale
    and duration (version 0 = 32-bit fields, version 1 = 64-bit);
    trak/tkhd ends with 16.16 fixed-point width/height; trak/mdia/hdlr
    carries the 'vide'/'soun' handler; stbl/stsd's first sample entry
    starts with the codec fourcc; stbl/stsz carries the sample count.

    FRAGMENTED MP4 (the DASH/HLS segment layout — what a real video lake
    mostly contains): when moov carries mvex, sample counts live in the
    movie fragments instead of stbl — each top-level moof/traf pairs a
    tfhd (track_id) with trun boxes (sample_count). The walk sums trun
    counts per track and takes the whole-movie duration from mvex/mehd
    when mvhd says 0, so probe output is layout-agnostic."""
    n = len(data)
    if n < 12:
        return None
    ftyp = _find_box(data, 0, n, b"ftyp")
    if ftyp is None or data[4:8] != b"ftyp":
        return None
    fs, fe = ftyp
    brand = data[fs : fs + 4].decode("ascii", "replace") if fe - fs >= 4 else None

    moov = _find_box(data, 0, n, b"moov")
    out: dict = {"brand": brand, "duration_ms": None, "tracks": []}
    if moov is None:
        return out
    ms, me = moov

    mvhd = _find_box(data, ms, me, b"mvhd")
    movie_timescale = None
    if mvhd is not None:
        td = _timed_header(data, mvhd[0], mvhd[1], 24, 16)
        if td is not None:
            movie_timescale = td[0]
            out["duration_ms"] = td[1] * 1000 // td[0]

    mvex = _find_box(data, ms, me, b"mvex")
    if mvex is not None and not out["duration_ms"] and movie_timescale:
        mehd = _find_box(data, mvex[0], mvex[1], b"mehd")
        if mehd is not None and mehd[1] - mehd[0] >= 8:
            s = mehd[0]
            if data[s] == 1 and mehd[1] - s >= 12:
                frag_dur = int.from_bytes(data[s + 4 : s + 12], "big")
            else:
                frag_dur = int.from_bytes(data[s + 4 : s + 8], "big")
            out["duration_ms"] = frag_dur * 1000 // movie_timescale

    for fc, ts_, te_ in _iter_boxes(data, ms, me):
        if fc != b"trak":
            continue
        trk: dict = {
            "handler": None,
            "codec": None,
            "width": None,
            "height": None,
            "n_samples": None,
            "duration_ms": None,
            "timescale": None,
            "track_id": None,
        }
        tkhd = _find_box(data, ts_, te_, b"tkhd")
        if tkhd is not None and tkhd[1] - tkhd[0] >= 8:
            # width/height are the last two 16.16 fixed-point u32s
            w = int.from_bytes(data[tkhd[1] - 8 : tkhd[1] - 4], "big") >> 16
            h = int.from_bytes(data[tkhd[1] - 4 : tkhd[1]], "big") >> 16
            if w:
                trk["width"] = w
            if h:
                trk["height"] = h
            # track_id: after version/flags + creation/modification times
            # (v0: 4+4+4 -> offset 12; v1: 4+8+8 -> offset 20)
            tid_off = 20 if data[tkhd[0]] == 1 else 12
            if tkhd[1] - tkhd[0] >= tid_off + 4:
                trk["track_id"] = int.from_bytes(
                    data[tkhd[0] + tid_off : tkhd[0] + tid_off + 4], "big"
                )
        mdia = _find_box(data, ts_, te_, b"mdia")
        if mdia is not None:
            ds, de = mdia
            mdhd = _find_box(data, ds, de, b"mdhd")
            if mdhd is not None:
                td = _timed_header(data, mdhd[0], mdhd[1], 24, 16)
                if td is not None:
                    trk["duration_ms"] = td[1] * 1000 // td[0]
                    trk["timescale"] = td[0]  # soun tracks: the sample rate
            hdlr = _find_box(data, ds, de, b"hdlr")
            if hdlr is not None and hdlr[1] - hdlr[0] >= 12:
                trk["handler"] = data[hdlr[0] + 8 : hdlr[0] + 12].decode(
                    "ascii", "replace"
                )
            minf = _find_box(data, ds, de, b"minf")
            stbl = minf and _find_box(data, minf[0], minf[1], b"stbl")
            if stbl:
                stsd = _find_box(data, stbl[0], stbl[1], b"stsd")
                if stsd is not None and stsd[1] - stsd[0] >= 16:
                    trk["codec"] = data[stsd[0] + 12 : stsd[0] + 16].decode(
                        "ascii", "replace"
                    )
                stsz = _find_box(data, stbl[0], stbl[1], b"stsz")
                if stsz is not None and stsz[1] - stsz[0] >= 12:
                    trk["n_samples"] = int.from_bytes(
                        data[stsz[0] + 8 : stsz[0] + 12], "big"
                    )
        out["tracks"].append(trk)

    # fragmented layout: sum trun sample_counts per track from every moof
    frag_counts: dict[int, int] = {}
    for fc, fs_, fe_ in _iter_boxes(data, 0, n):
        if fc != b"moof":
            continue
        for tc, trs, tre in _iter_boxes(data, fs_, fe_):
            if tc != b"traf":
                continue
            tfhd = _find_box(data, trs, tre, b"tfhd")
            if tfhd is None or tfhd[1] - tfhd[0] < 8:
                continue
            tid = int.from_bytes(data[tfhd[0] + 4 : tfhd[0] + 8], "big")
            for rc, rs, re_ in _iter_boxes(data, trs, tre):
                if rc == b"trun" and re_ - rs >= 8:
                    frag_counts[tid] = frag_counts.get(tid, 0) + int.from_bytes(
                        data[rs + 4 : rs + 8], "big"
                    )
    if frag_counts:
        for trk in out["tracks"]:
            if not trk["n_samples"] and trk["track_id"] in frag_counts:
                trk["n_samples"] = frag_counts[trk["track_id"]]
    return out


def _box(fourcc: bytes, *payload: bytes) -> bytes:
    body = b"".join(payload)
    return (len(body) + 8).to_bytes(4, "big") + fourcc + body


def _full(fourcc: bytes, version: int, payload: bytes) -> bytes:
    return _box(fourcc, bytes([version, 0, 0, 0]), payload)


def encode_minimal_mp4(
    width: int,
    height: int,
    n_video_samples: int,
    duration_ms: int,
    codec: str = "avc1",
    audio_samples: int = 0,
    audio_rate: int = 48000,
    version1: bool = False,
    mdat: bytes = b"",
) -> bytes:
    """Minimal-but-valid ISO-BMFF muxer for fixtures and oracle queries:
    ftyp + moov(mvhd, video trak, optional audio trak) + mdat. The sample
    tables carry real counts (stsz/stts) but the mdat payload is caller
    bytes — we mux containers, we don't synthesize H.264. ``version1``
    emits 64-bit mvhd/mdhd to exercise the v1 parse path."""
    timescale = 1000
    dur = duration_ms  # at timescale 1000, ms == ticks

    def timed(v1: bool, ts: int, d: int) -> bytes:
        if v1:
            return struct.pack(">QQIQ", 0, 0, ts, d)
        return struct.pack(">IIII", 0, 0, ts, d)

    ver = 1 if version1 else 0

    def trak(handler: bytes, fourcc: bytes, w: int, h: int, n: int, ts: int) -> bytes:
        tkhd = _full(
            b"tkhd",
            0,
            struct.pack(">IIIII", 0, 0, 1, 0, dur)
            + b"\x00" * 52
            + struct.pack(">II", w << 16, h << 16),
        )
        mdhd = _full(b"mdhd", ver, timed(version1, ts, dur * ts // 1000) + b"\x00" * 4)
        hdlr = _full(b"hdlr", 0, b"\x00" * 4 + handler + b"\x00" * 12 + b"\x00")
        entry = _box(fourcc, b"\x00" * 70)
        stsd = _full(b"stsd", 0, struct.pack(">I", 1) + entry)
        stts = _full(b"stts", 0, struct.pack(">III", 1, n, max(1, ts * dur // (1000 * max(n, 1)))))
        stsz = _full(b"stsz", 0, struct.pack(">II", 1, n))  # uniform size 1
        stsc = _full(b"stsc", 0, struct.pack(">IIII", 1, 1, max(n, 1), 1))
        stco = _full(b"stco", 0, struct.pack(">I", 0))
        stbl = _box(b"stbl", stsd, stts, stsc, stsz, stco)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd, hdlr, minf)
        return _box(b"trak", tkhd, mdia)

    mvhd = _full(b"mvhd", ver, timed(version1, timescale, dur) + b"\x00" * 80)
    traks = [trak(b"vide", codec.encode("ascii"), width, height, n_video_samples, 30000)]
    if audio_samples:
        traks.append(trak(b"soun", b"mp4a", 0, 0, audio_samples, audio_rate))
    moov = _box(b"moov", mvhd, *traks)
    ftyp = _box(b"ftyp", b"isom", struct.pack(">I", 512), b"isomiso2mp41")
    return ftyp + moov + _box(b"mdat", mdat)


def encode_fragmented_mp4(
    width: int,
    height: int,
    samples_per_fragment: int,
    n_fragments: int,
    duration_ms: int,
    codec: str = "avc1",
) -> bytes:
    """Fixture muxer for the DASH/HLS layout: moov carries mvex(mehd+trex)
    and an EMPTY sample table (stsz count 0, mvhd duration 0 — as real
    packagers emit); frame counts live only in the moof/traf/trun chain,
    one moof+mdat pair per fragment."""
    timescale = 1000

    def trak() -> bytes:
        tkhd = _full(
            b"tkhd",
            0,
            struct.pack(">IIIII", 0, 0, 1, 0, 0)
            + b"\x00" * 52
            + struct.pack(">II", width << 16, height << 16),
        )
        mdhd = _full(b"mdhd", 0, struct.pack(">IIII", 0, 0, 30000, 0) + b"\x00" * 4)
        hdlr = _full(b"hdlr", 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"\x00")
        entry = _box(codec.encode("ascii"), b"\x00" * 70)
        stsd = _full(b"stsd", 0, struct.pack(">I", 1) + entry)
        stbl = _box(
            b"stbl",
            stsd,
            _full(b"stts", 0, struct.pack(">I", 0)),
            _full(b"stsc", 0, struct.pack(">I", 0)),
            _full(b"stsz", 0, struct.pack(">II", 0, 0)),
            _full(b"stco", 0, struct.pack(">I", 0)),
        )
        return _box(b"trak", tkhd, _box(b"mdia", mdhd, hdlr, _box(b"minf", stbl)))

    mvhd = _full(b"mvhd", 0, struct.pack(">IIII", 0, 0, timescale, 0) + b"\x00" * 80)
    mehd = _full(b"mehd", 0, struct.pack(">I", duration_ms))  # ticks == ms
    trex = _full(b"trex", 0, struct.pack(">IIIII", 1, 1, 0, 0, 0))
    moov = _box(b"moov", mvhd, _box(b"mvex", mehd, trex), trak())
    ftyp = _box(b"ftyp", b"iso5", struct.pack(">I", 512), b"iso5dash")
    frags = b""
    for i in range(n_fragments):
        mfhd = _full(b"mfhd", 0, struct.pack(">I", i + 1))
        tfhd = _full(b"tfhd", 0, struct.pack(">I", 1))
        trun = _full(b"trun", 0, struct.pack(">I", samples_per_fragment))
        frags += _box(b"moof", mfhd, _box(b"traf", tfhd, trun)) + _box(b"mdat")
    return ftyp + moov + frags


# ---------------------------------------------------------------------------
# Matroska / WebM — EBML walk (the other half of the video lake)
# ---------------------------------------------------------------------------

_EBML_MAGIC = b"\x1a\x45\xdf\xa3"
_MKV_SEGMENT = 0x18538067
_MKV_INFO = 0x1549A966
_MKV_TIMESTAMPSCALE = 0x2AD7B1
_MKV_DURATION = 0x4489
_MKV_TRACKS = 0x1654AE6B
_MKV_TRACKENTRY = 0xAE
_MKV_TRACKTYPE = 0x83
_MKV_CODECID = 0x86
_MKV_VIDEO = 0xE0
_MKV_PIXELWIDTH = 0xB0
_MKV_PIXELHEIGHT = 0xBA
_MKV_AUDIO = 0xE1
_MKV_SAMPLINGFREQ = 0xB5


def _ebml_vint(data: bytes, pos: int, keep_marker: bool):
    """EBML variable-length integer at ``pos`` → (value, next_pos) or
    None. IDs keep the length-marker bit; sizes strip it (an all-ones
    size means 'unknown/to-end' and comes back as None value)."""
    if pos >= len(data):
        return None
    first = data[pos]
    if first == 0:
        return None
    length = 8 - first.bit_length() + 1
    if pos + length > len(data):
        return None
    raw = int.from_bytes(data[pos : pos + length], "big")
    if keep_marker:
        return raw, pos + length
    val = raw - (1 << (7 * length))
    if val == (1 << (7 * length)) - 1:  # all value bits set: unknown size
        return None, pos + length
    return val, pos + length


def _ebml_children(data: bytes, start: int, end: int):
    """Yield (element_id, payload_start, payload_end); unknown-size
    elements extend to the region end (the live-stream convention)."""
    pos = start
    while pos < end:
        got = _ebml_vint(data, pos, keep_marker=True)
        if got is None:
            return
        eid, pos = got
        got = _ebml_vint(data, pos, keep_marker=False)
        if got is None:
            return
        size, pos = got
        pend = end if size is None else pos + size
        if pend > end:
            return
        yield eid, pos, pend
        pos = pend


def _ebml_uint(data: bytes, s: int, e: int) -> int:
    return int.from_bytes(data[s:e], "big") if e > s else 0


def _ebml_float(data: bytes, s: int, e: int) -> float | None:
    if e - s == 4:
        return struct.unpack(">f", data[s:e])[0]
    if e - s == 8:
        return struct.unpack(">d", data[s:e])[0]
    return None


def parse_mkv(data: bytes) -> dict | None:
    """Header-only Matroska/WebM census: duration (Info/Duration ×
    TimestampScale), per-track type/codec/dimensions/sample-rate from the
    Tracks element. Pure EBML varint walking; never raises, None unless
    the EBML magic leads."""
    if data[:4] != _EBML_MAGIC:
        return None
    out: dict = {"duration_ms": None, "tracks": []}
    for eid, s, e in _ebml_children(data, 0, len(data)):
        if eid != _MKV_SEGMENT:
            continue
        for cid, cs, ce in _ebml_children(data, s, e):
            if cid == _MKV_INFO:
                scale = 1_000_000  # default: ticks are 1 ms
                dur = None
                for iid, is_, ie in _ebml_children(data, cs, ce):
                    if iid == _MKV_TIMESTAMPSCALE:
                        scale = _ebml_uint(data, is_, ie)
                    elif iid == _MKV_DURATION:
                        dur = _ebml_float(data, is_, ie)
                if dur is not None and scale:
                    out["duration_ms"] = int(dur * scale / 1_000_000)
            elif cid == _MKV_TRACKS:
                for tid, ts, te in _ebml_children(data, cs, ce):
                    if tid != _MKV_TRACKENTRY:
                        continue
                    trk = {
                        "type": None,
                        "codec": None,
                        "width": None,
                        "height": None,
                        "sample_rate": None,
                    }
                    for fid, fs, fe in _ebml_children(data, ts, te):
                        if fid == _MKV_TRACKTYPE:
                            trk["type"] = {1: "video", 2: "audio"}.get(
                                _ebml_uint(data, fs, fe)
                            )
                        elif fid == _MKV_CODECID:
                            trk["codec"] = data[fs:fe].decode("ascii", "replace")
                        elif fid == _MKV_VIDEO:
                            for vid, vs, ve in _ebml_children(data, fs, fe):
                                if vid == _MKV_PIXELWIDTH:
                                    trk["width"] = _ebml_uint(data, vs, ve)
                                elif vid == _MKV_PIXELHEIGHT:
                                    trk["height"] = _ebml_uint(data, vs, ve)
                        elif fid == _MKV_AUDIO:
                            for aid, as_, ae in _ebml_children(data, fs, fe):
                                if aid == _MKV_SAMPLINGFREQ:
                                    f = _ebml_float(data, as_, ae)
                                    if f:
                                        trk["sample_rate"] = int(f)
                    out["tracks"].append(trk)
    return out


def _ebml_encode_vint(value: int) -> bytes:
    """Encode a size vint (marker bit in the leading byte)."""
    for length in range(1, 9):
        if value < (1 << (7 * length)) - 1:
            return (value | (1 << (7 * length))).to_bytes(length, "big")
    raise ValueError("vint too large")


def _ebml_el(eid: int, payload: bytes) -> bytes:
    id_len = (eid.bit_length() + 7) // 8
    return eid.to_bytes(id_len, "big") + _ebml_encode_vint(len(payload)) + payload


def encode_minimal_mkv(
    width: int,
    height: int,
    duration_ms: int,
    codec: str = "V_VP9",
    audio_rate: int | None = None,
) -> bytes:
    """Fixture muxer: EBML header + Segment(Info(TimestampScale,
    Duration), Tracks(video entry [+ audio entry])). No clusters — the
    probe is header-only by design."""
    ebml_hdr = _EBML_MAGIC + _ebml_encode_vint(0)
    info = _ebml_el(
        _MKV_INFO,
        _ebml_el(_MKV_TIMESTAMPSCALE, (1_000_000).to_bytes(3, "big"))
        + _ebml_el(_MKV_DURATION, struct.pack(">d", float(duration_ms))),
    )
    video_entry = _ebml_el(
        _MKV_TRACKENTRY,
        _ebml_el(_MKV_TRACKTYPE, b"\x01")
        + _ebml_el(_MKV_CODECID, codec.encode("ascii"))
        + _ebml_el(
            _MKV_VIDEO,
            _ebml_el(_MKV_PIXELWIDTH, width.to_bytes(2, "big"))
            + _ebml_el(_MKV_PIXELHEIGHT, height.to_bytes(2, "big")),
        ),
    )
    entries = video_entry
    if audio_rate:
        entries += _ebml_el(
            _MKV_TRACKENTRY,
            _ebml_el(_MKV_TRACKTYPE, b"\x02")
            + _ebml_el(_MKV_CODECID, b"A_OPUS")
            + _ebml_el(
                _MKV_AUDIO,
                _ebml_el(_MKV_SAMPLINGFREQ, struct.pack(">f", float(audio_rate))),
            ),
        )
    segment = _ebml_el(_MKV_SEGMENT, info + _ebml_el(_MKV_TRACKS, entries))
    return ebml_hdr + segment


# ---------------------------------------------------------------------------
# Ogg (Opus / Vorbis) — page scan
# ---------------------------------------------------------------------------


def parse_ogg(data: bytes) -> dict | None:
    """Ogg census: codec from the first page's payload magic (OpusHead /
    Vorbis id header), duration from the LAST page's granule position —
    the standard trick: granules are absolute sample counts (48 kHz ticks
    for Opus, native rate for Vorbis), so the tail page alone dates the
    whole stream. Scans backward from EOF for the final 'OggS' capture,
    so cost is O(tail), not O(file)."""
    if data[:4] != b"OggS" or len(data) < 28:
        return None
    seg_n = data[26]
    payload_at = 27 + seg_n
    head = data[payload_at : payload_at + 16]
    if head[:8] == b"OpusHead":
        codec, rate = "opus", 48000  # granules are always 48 kHz for Opus
    elif head[:7] == b"\x01vorbis" and len(head) >= 16:
        codec = "vorbis"
        rate = int.from_bytes(data[payload_at + 12 : payload_at + 16], "little")
    else:
        codec, rate = None, 0
    last = data.rfind(b"OggS")
    duration_ms = None
    n_samples = None
    if last >= 0 and last + 14 <= len(data):
        granule = int.from_bytes(data[last + 6 : last + 14], "little", signed=True)
        if granule > 0 and rate:
            n_samples = granule
            duration_ms = granule * 1000 // rate
    return {
        "codec": codec,
        "sample_rate": rate or None,
        "n_samples": n_samples,
        "duration_ms": duration_ms,
    }


def encode_minimal_ogg(
    n_samples: int,
    codec: str = "opus",
    sample_rate: int = 48000,
    tags: dict | None = None,
) -> bytes:
    """Fixture muxer: a first Ogg page carrying the codec id header, an
    optional OpusTags comment page, and a final page whose granule
    position is ``n_samples``."""

    def page(granule: int, seq: int, payload: bytes, htype: int) -> bytes:
        # proper lacing: 255-byte segments + a terminating short segment
        segs = []
        rest = len(payload)
        while rest >= 255:
            segs.append(255)
            rest -= 255
        segs.append(rest)  # 0..254 terminates the packet
        return (
            b"OggS\x00"
            + bytes([htype])
            + granule.to_bytes(8, "little", signed=True)
            + (1).to_bytes(4, "little")  # serial
            + seq.to_bytes(4, "little")
            + b"\x00\x00\x00\x00"  # crc (probe doesn't verify)
            + bytes([len(segs)])
            + bytes(segs)
            + payload
        )

    if codec == "opus":
        idhdr = b"OpusHead" + b"\x01\x02" + b"\x00" * 9
    else:
        idhdr = (
            b"\x01vorbis"
            + b"\x00" * 4  # version
            + b"\x02"  # channels
            + sample_rate.to_bytes(4, "little")
            + b"\x00" * 12
        )
    mid = b""
    if tags:
        magic = b"OpusTags" if codec == "opus" else b"\x03vorbis"
        mid = page(0, 1, magic + _vorbis_comment_block(tags), 0x00)
    return (
        page(0, 0, idhdr, 0x02)
        + mid
        + page(n_samples, 2 if mid else 1, b"\x00", 0x04)
    )


# ---------------------------------------------------------------------------
# FLAC — STREAMINFO block (the lossless-audio archive staple)
# ---------------------------------------------------------------------------


def parse_flac_streaminfo(data: bytes) -> dict | None:
    """'fLaC' magic + first metadata block (STREAMINFO, type 0, 34 bytes):
    bits 80..99 sample rate, 100..102 channels-1, 103..107 bps-1,
    108..143 total samples. Header-only; returns None on anything else."""
    if data[:4] != b"fLaC" or len(data) < 4 + 4 + 34:
        return None
    if data[4] & 0x7F != 0:  # first block must be STREAMINFO
        return None
    si = data[8:42]
    word = int.from_bytes(si[10:18], "big")
    rate = word >> 44
    channels = ((word >> 41) & 0x7) + 1
    total = word & ((1 << 36) - 1)
    if rate == 0:
        return None
    return {
        "sample_rate": rate,
        "channels": channels,
        "n_samples": total,
        "duration_ms": total * 1000 // rate,
    }


def _vorbis_comment_block(tags: dict) -> bytes:
    body = (0).to_bytes(4, "little")  # empty vendor string
    body += len(tags).to_bytes(4, "little")
    for k, v in tags.items():
        entry = f"{k.upper()}={v}".encode("utf-8")
        body += len(entry).to_bytes(4, "little") + entry
    return body


def encode_flac_streaminfo(
    sample_rate: int, n_samples: int, channels: int = 2, tags: dict | None = None
) -> bytes:
    """Fixture muxer: a valid fLaC header + STREAMINFO (+ an optional
    VORBIS_COMMENT block carrying ``tags``); no audio frames — the probe
    never reads past the metadata blocks."""
    word = (sample_rate << 44) | ((channels - 1) << 41) | (16 - 1) << 36 | n_samples
    si = (
        struct.pack(">HH", 4096, 4096)  # min/max blocksize
        + b"\x00" * 6  # min/max framesize (24-bit each, unset)
        + word.to_bytes(8, "big")
        + b"\x00" * 16  # md5 of raw samples (unset)
    )
    if not tags:
        return b"fLaC" + b"\x80" + len(si).to_bytes(3, "big") + si
    vc = _vorbis_comment_block(tags)
    return (
        b"fLaC"
        + b"\x00" + len(si).to_bytes(3, "big") + si
        + b"\x84" + len(vc).to_bytes(3, "big") + vc
    )


# ---------------------------------------------------------------------------
# MPEG-1 Layer III (.mp3) — frame-header scan
# ---------------------------------------------------------------------------

# MPEG-1 Layer III bitrate table (kbps), index 0 = free, 15 = bad
_MP3_BITRATES = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0]
_MP3_RATES = [44100, 48000, 32000, 0]
_MP3_SAMPLES_PER_FRAME = 1152


def _syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def parse_mp3(data: bytes) -> dict | None:
    """Frame-header scan of an MPEG-1 Layer III stream: frame count, sample
    rate, duration, average bitrate, VBR flag. Skips a leading ID3v2 tag
    (syncsafe size). Walks frame to frame by the computed frame length —
    O(frames), zero sample decode. Returns None when no valid frame is
    found; stops (rather than resyncing) at trailing garbage after the
    first frame, the standard tolerant-reader behavior."""
    n = len(data)
    pos = 0
    if n >= 10 and data[:3] == b"ID3":
        pos = 10 + _syncsafe(data[6:10])
    frames = 0
    kbps_sum = 0
    kbps_set: set[int] = set()
    rate = 0
    while pos + 4 <= n:
        h = data[pos : pos + 4]
        # sync (11 bits) + MPEG-1 (version bits 11) + Layer III (bits 01)
        if h[0] == 0xFF and (h[1] & 0xFE) == 0xFA:
            kbps = _MP3_BITRATES[(h[2] >> 4) & 0xF]
            sr = _MP3_RATES[(h[2] >> 2) & 0x3]
            pad = (h[2] >> 1) & 1
            if kbps and sr and (rate == 0 or sr == rate):
                frames += 1
                kbps_sum += kbps
                kbps_set.add(kbps)
                rate = sr
                pos += 144 * kbps * 1000 // sr + pad
                continue
        if frames == 0:
            pos += 1  # hunt for first sync
        else:
            break  # trailing tag/garbage after a valid stream
    if frames == 0:
        return None
    return {
        "n_frames": frames,
        "sample_rate": rate,
        "duration_ms": frames * _MP3_SAMPLES_PER_FRAME * 1000 // rate,
        "bitrate_kbps": kbps_sum // frames,
        "vbr": len(kbps_set) > 1,
    }


def encode_mp3_frames(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    id3_size: int = 0,
    vbr_alternate: int = 0,
) -> bytes:
    """Fixture muxer: a syntactically valid MPEG-1 Layer III stream of
    ``n_frames`` silent (zero-payload) frames, optionally fronted by an
    ID3v2 tag of ``id3_size`` body bytes and alternating every other frame
    to ``vbr_alternate`` kbps to plant a VBR stream."""
    bi = {v: i for i, v in enumerate(_MP3_BITRATES) if v}
    si = {v: i for i, v in enumerate(_MP3_RATES) if v}
    out = bytearray()
    if id3_size:
        out += b"ID3\x04\x00\x00" + bytes(
            [(id3_size >> 21) & 0x7F, (id3_size >> 14) & 0x7F, (id3_size >> 7) & 0x7F, id3_size & 0x7F]
        )
        out += b"\x00" * id3_size
    for i in range(n_frames):
        kbps = vbr_alternate if (vbr_alternate and i % 2) else bitrate_kbps
        flen = 144 * kbps * 1000 // sample_rate
        hdr = bytes(
            [0xFF, 0xFB, (bi[kbps] << 4) | (si[sample_rate] << 2), 0x00]
        )
        out += hdr + b"\x00" * (flen - 4)
    return bytes(out)


# ---------------------------------------------------------------------------
# WARC — the web-archive record format (what Common Crawl ships).
# THE ingestion format for web-scale text corpora: records are
# "WARC/1.x" header blocks (named fields incl. Content-Length) followed
# by exactly Content-Length body bytes, concatenated; on the wire each
# record is usually its own gzip member (multi-member .warc.gz).
# ---------------------------------------------------------------------------


def parse_warc(data: bytes, max_records: int | None = None) -> list[dict] | None:
    """Record listing of a WARC file: (type, uri, date, content_length)
    per record. Accepts uncompressed WARC and multi-member .warc.gz
    (each member inflated with stdlib zlib). The walk skips each body by
    its declared Content-Length — O(records) header parsing, no content
    interpretation. Returns None unless a WARC/ header leads; stops
    cleanly at truncation/garbage."""
    import zlib

    if data[:2] == b"\x1f\x8b":
        # multi-member gzip: inflate members until the stream is consumed
        out = bytearray()
        rest = bytes(data)
        try:
            while rest[:2] == b"\x1f\x8b":
                d = zlib.decompressobj(wbits=31)
                out += d.decompress(rest)
                rest = d.unused_data
        except zlib.error:
            pass
        data = bytes(out)
    if data[:5] != b"WARC/":
        return None
    records = []
    pos = 0
    n = len(data)
    while pos < n and data[pos : pos + 5] == b"WARC/":
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        rec: dict = {"type": None, "uri": None, "date": None, "content_length": None}
        for line in data[pos:hdr_end].split(b"\r\n")[1:]:
            if b":" not in line:
                continue
            k, v = line.split(b":", 1)
            key = k.strip().lower()
            val = v.strip().decode("utf-8", "replace")
            if key == b"warc-type":
                rec["type"] = val
            elif key == b"warc-target-uri":
                rec["uri"] = val
            elif key == b"warc-date":
                rec["date"] = val
            elif key == b"content-length":
                try:
                    rec["content_length"] = int(val)
                except ValueError:
                    rec["content_length"] = None
        # a record counts only when its declared body is sane AND fully
        # present: negative lengths would walk the cursor backward
        # (infinite loop), absurd ones overflow downstream int64 columns,
        # and a truncated final body must not be reported at its declared
        # size — all three are malformed-input stops, not records
        cl = rec["content_length"]
        if cl is None or cl < 0 or cl > (1 << 62):
            break
        body_start = hdr_end + 4
        if body_start + cl > n:
            break
        records.append(rec)
        if max_records is not None and len(records) >= max_records:
            break
        # body, then skip the record-terminating blank lines (tolerant:
        # real writers vary between exactly two CRLFs and a few extras)
        pos = body_start + cl
        while pos < n and data[pos] in (0x0D, 0x0A):
            pos += 1
    return records or None


def encode_warc(
    records: list[tuple[str, str, bytes]], gzip_members: bool = False
) -> bytes:
    """Fixture muxer: (warc_type, target_uri, body) triples → a spec-shaped
    WARC file, optionally with each record as its own gzip member (the
    Common Crawl layout)."""
    import gzip as _gzip

    out = bytearray()
    for rtype, uri, body in records:
        hdr = (
            f"WARC/1.0\r\n"
            f"WARC-Type: {rtype}\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
            f"Content-Length: {len(body)}\r\n"
            f"\r\n"
        ).encode()
        rec = hdr + body + b"\r\n\r\n"
        out += _gzip.compress(rec) if gzip_members else rec
    return bytes(out)


WARC_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("rec_type", T.StringType()),
        T.StructField("uri", T.StringType()),
        T.StructField("content_length", T.LongType()),
    ]
)


def extract_warc_records(media: DataFrame) -> DataFrame:
    """Distributed WARC record listing: one row per record per payload —
    the first table a crawl-ingestion pipeline builds (URL census, size
    profile, response/request mix) before any content parsing. Arrow-
    batched mapInPandas; per-payload cost is O(records), bodies skipped
    by declared length."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, types, uris, lens = [], [], [], []
            for mid, payload in zip(b["media_id"], b["payload"]):
                for r in parse_warc(bytes(payload)) or []:
                    ids.append(int(mid))
                    types.append(r["type"])
                    uris.append(r["uri"])
                    lens.append(r["content_length"])
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "rec_type": types,
                    "uri": uris,
                    "content_length": pd.array(lens, dtype="Int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(gen, schema=WARC_SCHEMA)


# ---------------------------------------------------------------------------
# Media tags — ID3v2 text frames and Vorbis comments (FLAC / Ogg).
# Title/artist/album metadata is curation signal (tag-level dedup, source
# attribution) a 100 TB audio lake extracts at ingest, no decode needed.
# ---------------------------------------------------------------------------

_ID3_KEYS = {
    "TIT2": "title",
    "TPE1": "artist",
    "TALB": "album",
    "TDRC": "date",
    "TYER": "date",
    "TCON": "genre",
    "TRCK": "track",
}

# ID3v2.2 used 3-character frame ids with 3-byte sizes
_ID3V22_KEYS = {
    "TT2": "title",
    "TP1": "artist",
    "TAL": "album",
    "TYE": "date",
    "TCO": "genre",
    "TRK": "track",
}


def _id3_text(enc: int, raw: bytes) -> str:
    if enc == 0:
        s = raw.decode("latin-1", "replace")
    elif enc == 1:
        s = raw.decode("utf-16", "replace")
    elif enc == 2:
        s = raw.decode("utf-16-be", "replace")
    else:
        s = raw.decode("utf-8", "replace")
    return s.rstrip("\x00")


def parse_id3v2_tags(data: bytes) -> dict | None:
    """Text frames from an ID3v2.3/2.4 tag: TIT2/TPE1/TALB/TDRC/TCON/TRCK
    → canonical keys, all four text encodings handled. v2.4 frame sizes
    are syncsafe, v2.3 plain — dispatched on the version byte."""
    if data[:3] != b"ID3" or len(data) < 10:
        return None
    ver = data[3]
    end = min(10 + _syncsafe(data[6:10]), len(data))
    pos = 10
    if ver == 2:  # ID3v2.2: 3-char ids, 3-byte sizes, no frame flags
        out22: dict[str, str] = {}
        while pos + 6 <= end:
            fid = data[pos : pos + 3]
            if fid == b"\x00\x00\x00":
                break
            size = int.from_bytes(data[pos + 3 : pos + 6], "big")
            if size <= 0 or pos + 6 + size > end:
                break
            key = _ID3V22_KEYS.get(fid.decode("latin-1", "replace"))
            if key and key not in out22:
                body = data[pos + 6 : pos + 6 + size]
                text = _id3_text(body[0], body[1:])
                if text:
                    out22[key] = text
            pos += 6 + size
        return out22 or None
    if data[5] & 0x40:  # extended header present: skip it
        if pos + 4 > len(data):
            return None
        ext = (
            _syncsafe(data[pos : pos + 4])
            if ver >= 4
            else int.from_bytes(data[pos : pos + 4], "big")
        )
        pos += ext if ver >= 4 else ext + 4
    out: dict[str, str] = {}
    end = min(end, len(data))
    while pos + 10 <= end:
        fid = data[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break
        raw_size = data[pos + 4 : pos + 8]
        size = _syncsafe(raw_size) if ver >= 4 else int.from_bytes(raw_size, "big")
        if size <= 0 or pos + 10 + size > end:
            break
        if fid[:1] == b"T" and size >= 1:
            key = _ID3_KEYS.get(fid.decode("latin-1"))
            if key and key not in out:
                body = data[pos + 10 : pos + 10 + size]
                text = _id3_text(body[0], body[1:])
                if text:
                    out[key] = text
        pos += 10 + size
    return out or None


def encode_id3v2_tags(tags: dict, version: int = 4) -> bytes:
    """Fixture muxer: an ID3v2.3 or v2.4 tag block carrying the given
    canonical keys as UTF-8 (v2.4) / UTF-16 (v2.3) text frames. Prepend
    to an MP3 stream."""
    rev = {v: k for k, v in _ID3_KEYS.items() if k != "TYER"}
    body = b""
    for key, value in tags.items():
        fid = rev[key].encode("latin-1")
        if version >= 4:
            payload = b"\x03" + value.encode("utf-8")
            size = bytes(
                [(len(payload) >> 21) & 0x7F, (len(payload) >> 14) & 0x7F,
                 (len(payload) >> 7) & 0x7F, len(payload) & 0x7F]
            )
        else:
            payload = b"\x01" + value.encode("utf-16")  # BOM included
            size = len(payload).to_bytes(4, "big")
        body += fid + size + b"\x00\x00" + payload
    hdr = b"ID3" + bytes([version, 0, 0]) + bytes(
        [(len(body) >> 21) & 0x7F, (len(body) >> 14) & 0x7F,
         (len(body) >> 7) & 0x7F, len(body) & 0x7F]
    )
    return hdr + body


def _vorbis_comments(data: bytes, pos: int, end: int) -> dict:
    """The shared Vorbis-comment structure: vendor string + N 'KEY=value'
    UTF-8 comments, all length-prefixed little-endian."""
    out: dict[str, str] = {}
    if pos + 4 > end:
        return out
    vlen = int.from_bytes(data[pos : pos + 4], "little")
    pos += 4 + vlen
    if pos + 4 > end:
        return out
    count = int.from_bytes(data[pos : pos + 4], "little")
    pos += 4
    for _ in range(count):
        if pos + 4 > end:
            break
        clen = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4
        if pos + clen > end:
            break
        entry = data[pos : pos + clen].decode("utf-8", "replace")
        pos += clen
        if "=" in entry:
            k, v = entry.split("=", 1)
            out.setdefault(k.lower(), v)
    return out


_ILST_KEYS = {
    b"\xa9nam": "title",
    b"\xa9ART": "artist",
    b"\xa9alb": "album",
    b"\xa9day": "date",
    b"\xa9gen": "genre",
}


def _parse_mp4_ilst(data: bytes) -> dict:
    """iTunes-style tags: moov/udta/meta(full)/ilst; each item box holds a
    'data' full-box whose flags==1 payload is UTF-8 text after 4 reserved
    bytes."""
    out: dict[str, str] = {}
    moov = _find_box(data, 0, len(data), b"moov")
    udta = moov and _find_box(data, moov[0], moov[1], b"udta")
    meta = udta and _find_box(data, udta[0], udta[1], b"meta")
    ilst = meta and _find_box(data, meta[0] + 4, meta[1], b"ilst")
    if not ilst:
        return out
    for fc, s, e in _iter_boxes(data, ilst[0], ilst[1]):
        key = _ILST_KEYS.get(fc)
        if not key:
            continue
        db = _find_box(data, s, e, b"data")
        if db and db[1] - db[0] > 8 and data[db[0] : db[0] + 4] == b"\x00\x00\x00\x01":
            text = data[db[0] + 8 : db[1]].decode("utf-8", "replace")
            if text:
                out.setdefault(key, text)
    return out


def extract_tags(data: bytes) -> dict:
    """Best-effort tag dict for any known audio/video payload: ID3v2.2-2.4
    (MP3), VORBIS_COMMENT metadata block (FLAC), OpusTags / Vorbis comment
    header (Ogg), and iTunes-style ilst atoms (MP4/M4A). Empty dict when
    none present; never raises."""
    try:
        if len(data) >= 12 and data[4:8] == b"ftyp":
            return _parse_mp4_ilst(data)
        if data[:3] == b"ID3":
            return parse_id3v2_tags(data) or {}
        if data[:4] == b"fLaC":
            pos = 4
            while pos + 4 <= len(data):
                hdr = data[pos]
                blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
                if hdr & 0x7F == 4:  # VORBIS_COMMENT
                    return _vorbis_comments(data, pos + 4, min(pos + 4 + blen, len(data)))
                pos += 4 + blen
                if hdr & 0x80:  # last block
                    break
            return {}
        if data[:4] == b"OggS":
            for magic, skip in ((b"OpusTags", 8), (b"\x03vorbis", 7)):
                at = data.find(magic, 0, 65536)
                if at >= 0:
                    return _vorbis_comments(data, at + skip, len(data))
            return {}
    except Exception:
        pass
    return {}


TAGS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("key", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)


def extract_media_tags(media: DataFrame) -> DataFrame:
    """Distributed tag extraction: one (media_id, key, value) row per tag.
    Arrow-batched mapInPandas, header-only — the audio-lake metadata
    table (tag-level dedup, source attribution) built at ingest cost."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, keys, vals = [], [], []
            for mid, payload in zip(b["media_id"], b["payload"]):
                for k, v in extract_tags(bytes(payload)).items():
                    ids.append(int(mid))
                    keys.append(k)
                    vals.append(v)
            yield pd.DataFrame({"media_id": ids, "key": keys, "value": vals})

    return media.select("media_id", "payload").mapInPandas(gen, schema=TAGS_SCHEMA)


# ---------------------------------------------------------------------------
# Archives — ZIP central directory & tar header walk (document lakes
# receive bundles; the census must see inside without extracting)
# ---------------------------------------------------------------------------


def parse_zip_listing(data: bytes) -> list[dict] | None:
    """ZIP member listing from the central directory: (name, compressed /
    uncompressed sizes, method) per entry. Finds EOCD by scanning the tail
    (the spec-mandated way — the comment field makes the offset variable),
    then walks the central directory records. O(directory), never inflates
    a single byte. Returns None unless a plausible ZIP structure is found."""
    if len(data) < 22 or data[:2] != b"PK":
        return None
    tail_start = max(0, len(data) - 65536 - 22)
    eocd = data.rfind(b"PK\x05\x06", tail_start)
    if eocd < 0 or eocd + 22 > len(data):
        return None
    n_entries = int.from_bytes(data[eocd + 10 : eocd + 12], "little")
    cd_off = int.from_bytes(data[eocd + 16 : eocd + 20], "little")
    # ZIP64: >65535 members or a >4 GiB directory offset store sentinel
    # values (0xFFFF / 0xFFFFFFFF) in the classic EOCD and the real 64-bit
    # fields in a ZIP64 EOCD record, located via the 20-byte locator that
    # sits immediately before the classic EOCD (APPNOTE 4.3.14-15). Without
    # this the census silently truncates exactly the large bundles a 100 TB
    # document lake receives (r5 ADVICE).
    if n_entries == 0xFFFF or cd_off == 0xFFFFFFFF:
        loc = eocd - 20
        if loc < 0 or data[loc : loc + 4] != b"PK\x06\x07":
            return None
        z64 = int.from_bytes(data[loc + 8 : loc + 16], "little")
        if z64 + 56 > len(data) or data[z64 : z64 + 4] != b"PK\x06\x06":
            return None
        n_entries = int.from_bytes(data[z64 + 32 : z64 + 40], "little")
        cd_off = int.from_bytes(data[z64 + 48 : z64 + 56], "little")
    out = []
    pos = cd_off
    for _ in range(n_entries):
        if pos + 46 > len(data) or data[pos : pos + 4] != b"PK\x01\x02":
            return out or None
        method = int.from_bytes(data[pos + 10 : pos + 12], "little")
        csize = int.from_bytes(data[pos + 20 : pos + 24], "little")
        usize = int.from_bytes(data[pos + 24 : pos + 28], "little")
        nlen = int.from_bytes(data[pos + 28 : pos + 30], "little")
        xlen = int.from_bytes(data[pos + 30 : pos + 32], "little")
        clen = int.from_bytes(data[pos + 32 : pos + 34], "little")
        name = data[pos + 46 : pos + 46 + nlen].decode("utf-8", "replace")
        if csize == 0xFFFFFFFF or usize == 0xFFFFFFFF:
            # Per-entry ZIP64 extra field (id 0x0001): 64-bit sizes appear
            # in sentinel order — uncompressed first, then compressed.
            extra = data[pos + 46 + nlen : pos + 46 + nlen + xlen]
            ep = 0
            while ep + 4 <= len(extra):
                eid = int.from_bytes(extra[ep : ep + 2], "little")
                esz = int.from_bytes(extra[ep + 2 : ep + 4], "little")
                if eid == 0x0001:
                    body = extra[ep + 4 : ep + 4 + esz]
                    bp = 0
                    if usize == 0xFFFFFFFF and bp + 8 <= len(body):
                        usize = int.from_bytes(body[bp : bp + 8], "little")
                        bp += 8
                    if csize == 0xFFFFFFFF and bp + 8 <= len(body):
                        csize = int.from_bytes(body[bp : bp + 8], "little")
                    break
                ep += 4 + esz
        out.append(
            {
                "name": name,
                "compressed": csize,
                "uncompressed": usize,
                "method": {0: "store", 8: "deflate"}.get(method, f"m{method}"),
            }
        )
        pos += 46 + nlen + xlen + clen
    return out


def parse_tar_listing(data: bytes) -> list[dict] | None:
    """Tar member listing: walk the 512-byte header blocks (name at 0,
    octal size at 124, typeflag at 156, 'ustar' magic at 257), skipping
    each member's content blocks. Stops at the zero-block terminator or
    any malformed header. Returns None unless the first block is a valid
    ustar header."""
    if len(data) < 512 or data[257:262] != b"ustar":
        return None
    out = []
    pos = 0
    while pos + 512 <= len(data):
        block = data[pos : pos + 512]
        if block == b"\x00" * 512:
            break
        if block[257:262] != b"ustar" and out:
            break
        name = block[:100].split(b"\x00", 1)[0].decode("utf-8", "replace")
        try:
            size = int(block[124:136].split(b"\x00", 1)[0].strip() or b"0", 8)
        except ValueError:
            break
        kind = {48: "file", 53: "dir", 50: "symlink"}.get(block[156], "other")
        if not name:
            break
        out.append({"name": name, "size": size, "kind": kind})
        pos += 512 + ((size + 511) // 512) * 512
    return out or None


# ---------------------------------------------------------------------------
# Unified header-only probe
# ---------------------------------------------------------------------------

PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("container", T.StringType()),
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("orientation", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

_EMPTY = {
    "container": "unknown",
    "codec": None,
    "width": None,
    "height": None,
    "sample_rate": None,
    "n_frames": None,
    "duration_ms": None,
    "orientation": None,
}


def _parse_exif_orientation(seg: bytes) -> int | None:
    """EXIF orientation (tag 0x0112) from an APP1 payload: 'Exif\\0\\0'
    + TIFF header (II/MM endianness, magic 42, IFD0 offset) + IFD0 entry
    scan. The one metadata field an image pipeline must honor before any
    resize/crop stage. Returns 1–8, or None when absent/malformed."""
    if seg[:6] != b"Exif\x00\x00" or len(seg) < 14:
        return None
    t = seg[6:]
    if t[:2] == b"II":
        bo = "little"
    elif t[:2] == b"MM":
        bo = "big"
    else:
        return None
    if int.from_bytes(t[2:4], bo) != 42:
        return None
    ifd = int.from_bytes(t[4:8], bo)
    if ifd + 2 > len(t):
        return None
    count = int.from_bytes(t[ifd : ifd + 2], bo)
    for i in range(count):
        e = ifd + 2 + 12 * i
        if e + 12 > len(t):
            return None
        if int.from_bytes(t[e : e + 2], bo) == 0x0112:
            v = int.from_bytes(t[e + 8 : e + 10], bo)
            return v if 1 <= v <= 8 else None
    return None


def _probe_jpeg(d: bytes) -> dict | None:
    if d[:2] != b"\xff\xd8":
        return None
    pos = 2
    n = len(d)
    orientation = None
    while pos + 4 <= n:
        if d[pos] != 0xFF:
            return None
        marker = d[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seglen = int.from_bytes(d[pos + 2 : pos + 4], "big")
        if marker == 0xE1 and orientation is None:
            # Only the FIRST APP1 carrying a value wins: cameras/Adobe
            # commonly emit EXIF APP1 then XMP APP1, and letting the later
            # non-EXIF segment overwrite would drop the orientation.
            orientation = _parse_exif_orientation(d[pos + 4 : pos + 2 + seglen])
        if marker in (0xC0, 0xC1, 0xC2) and pos + 9 <= n:
            return {
                **_EMPTY,
                "container": "jpeg",
                "codec": "progressive" if marker == 0xC2 else "baseline",
                "height": int.from_bytes(d[pos + 5 : pos + 7], "big"),
                "width": int.from_bytes(d[pos + 7 : pos + 9], "big"),
                "n_frames": 1,
                "orientation": orientation,
            }
        if seglen < 2:
            return None
        pos += 2 + seglen
    return None


def _probe_wav(d: bytes) -> dict | None:
    if len(d) < 44 or d[:4] != b"RIFF" or d[8:12] != b"WAVE":
        return None
    pos = 12
    fmt_tag = rate = block = channels = spb = 0
    data_size = fact_samples = None
    while pos + 8 <= len(d):
        cid = d[pos : pos + 4]
        csz = int.from_bytes(d[pos + 4 : pos + 8], "little")
        if cid == b"fmt " and pos + 24 <= len(d):
            fmt_tag = int.from_bytes(d[pos + 8 : pos + 10], "little")
            channels = int.from_bytes(d[pos + 10 : pos + 12], "little")
            rate = int.from_bytes(d[pos + 12 : pos + 16], "little")
            block = int.from_bytes(d[pos + 20 : pos + 22], "little")
            if csz >= 20 and pos + 28 <= len(d):
                spb = int.from_bytes(d[pos + 26 : pos + 28], "little")
        elif cid == b"fact" and csz >= 4 and pos + 12 <= len(d):
            fact_samples = int.from_bytes(d[pos + 8 : pos + 12], "little")
        elif cid == b"data":
            data_size = min(csz, len(d) - pos - 8)
        pos += 8 + csz + (csz & 1)
    if not rate or data_size is None or not block:
        return None
    if fmt_tag == 0x11:  # IMA ADPCM: frames come from samples-per-block
        if not spb and channels:
            spb = (block - 4 * channels) * 2 // channels + 1
        n = fact_samples if fact_samples is not None else (data_size // block) * spb
    else:
        n = data_size // block
    return {
        **_EMPTY,
        "container": "wav",
        "codec": {1: "pcm_s16", 6: "alaw", 7: "ulaw", 0x11: "ima_adpcm"}.get(
            fmt_tag, f"fmt{fmt_tag}"
        ),
        "sample_rate": rate,
        "n_frames": n,
        "duration_ms": n * 1000 // rate,
    }


def _probe_webp(d: bytes) -> dict | None:
    """WebP dims from the first chunk: VP8 (lossy keyframe header),
    VP8L (14-bit packed), or VP8X (24-bit minus-one canvas)."""
    if len(d) < 25 or d[:4] != b"RIFF" or d[8:12] != b"WEBP":
        return None
    fourcc = d[12:16]
    if fourcc == b"VP8 ":
        # keyframe: 3-byte frame tag, then 9D 01 2A, then dims (14 bits)
        if len(d) < 30 or d[23:26] != b"\x9d\x01\x2a":
            return None
        w = int.from_bytes(d[26:28], "little") & 0x3FFF
        h = int.from_bytes(d[28:30], "little") & 0x3FFF
        codec = "vp8"
    elif fourcc == b"VP8L":
        if d[20] != 0x2F:
            return None
        bits = int.from_bytes(d[21:25], "little")
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
        codec = "vp8l"
    elif fourcc == b"VP8X":
        if len(d) < 30:
            return None
        w = int.from_bytes(d[24:27], "little") + 1
        h = int.from_bytes(d[27:30], "little") + 1
        codec = "vp8x"
    else:
        return None
    return {**_EMPTY, "container": "webp", "codec": codec,
            "width": w, "height": h, "n_frames": 1}


def _probe_heif(d: bytes) -> dict | None:
    """AVIF/HEIC dims: ISO-BMFF meta/iprp/ipco/ispe (image spatial
    extents — width/height u32 after the full-box header). The brand
    (avif/heic/mif1) names the codec."""
    if len(d) < 16 or d[4:8] != b"ftyp":
        return None
    brand = d[8:12]
    if brand not in (b"avif", b"avis", b"heic", b"heix", b"mif1"):
        return None
    meta = _find_box(d, 0, len(d), b"meta")
    if meta is None:
        return None
    # meta is a FULL box: children start after version/flags
    iprp = _find_box(d, meta[0] + 4, meta[1], b"iprp")
    ipco = iprp and _find_box(d, iprp[0], iprp[1], b"ipco")
    ispe = ipco and _find_box(d, ipco[0], ipco[1], b"ispe")
    w = h = None
    if ispe and ispe[1] - ispe[0] >= 12:
        w = int.from_bytes(d[ispe[0] + 4 : ispe[0] + 8], "big")
        h = int.from_bytes(d[ispe[0] + 8 : ispe[0] + 12], "big")
    return {**_EMPTY, "container": "heif",
            "codec": brand.decode("ascii", "replace").strip(),
            "width": w, "height": h, "n_frames": 1}


def _probe_avi(d: bytes) -> dict | None:
    """AVI dims/frame-count from the avih main header (RIFF 'AVI ' →
    LIST hdrl → avih: microsec/frame u32 at +0, total frames u32 at +16,
    width/height u32 at +32/+36)."""
    if len(d) < 12 or d[:4] != b"RIFF" or d[8:12] != b"AVI ":
        return None
    at = d.find(b"avih", 12, 4096)
    if at < 0 or at + 48 > len(d):
        return None
    s = at + 8  # past fourcc + chunk size
    usec_pf = int.from_bytes(d[s : s + 4], "little")
    frames = int.from_bytes(d[s + 16 : s + 20], "little")
    w = int.from_bytes(d[s + 32 : s + 36], "little")
    h = int.from_bytes(d[s + 36 : s + 40], "little")
    return {
        **_EMPTY,
        "container": "avi",
        "codec": "riff",
        "width": w or None,
        "height": h or None,
        "n_frames": frames or None,
        "duration_ms": (frames * usec_pf) // 1000 if frames and usec_pf else None,
    }


def _probe_aiff(d: bytes) -> dict | None:
    """AIFF audio census from the COMM chunk: channels (u16), frame count
    (u32), bits (u16), then the sample rate as an 80-bit IEEE extended
    float (sign+15-bit exponent, 64-bit mantissa) — decoded exactly."""
    if len(d) < 12 or d[:4] != b"FORM" or d[8:12] not in (b"AIFF", b"AIFC"):
        return None
    pos = 12
    while pos + 8 <= len(d):
        cid = d[pos : pos + 4]
        csz = int.from_bytes(d[pos + 4 : pos + 8], "big")
        if cid == b"COMM" and csz >= 18 and pos + 26 <= len(d):
            s = pos + 8
            frames = int.from_bytes(d[s + 2 : s + 6], "big")
            ext = d[s + 8 : s + 18]
            exp = (int.from_bytes(ext[:2], "big") & 0x7FFF) - 16383
            mant = int.from_bytes(ext[2:10], "big")
            rate = int(mant * (2.0 ** (exp - 63))) if mant else 0
            if rate <= 0:
                return None
            return {
                **_EMPTY,
                "container": "aiff",
                "codec": "pcm_be",
                "sample_rate": rate,
                "n_frames": frames,
                "duration_ms": frames * 1000 // rate,
            }
        pos += 8 + csz + (csz & 1)
    return None


def _probe_tiff(d: bytes) -> dict | None:
    """TIFF dims from IFD0: ImageWidth (tag 256) / ImageLength (257),
    SHORT or LONG values, both byte orders — the scanned-document staple."""
    if d[:4] not in (b"II*\x00", b"MM\x00*"):
        return None
    bo = "little" if d[:2] == b"II" else "big"
    if len(d) < 8:
        return None
    ifd = int.from_bytes(d[4:8], bo)
    if ifd + 2 > len(d):
        return None
    count = int.from_bytes(d[ifd : ifd + 2], bo)
    w = h = None
    for i in range(count):
        e = ifd + 2 + 12 * i
        if e + 12 > len(d):
            break
        tag = int.from_bytes(d[e : e + 2], bo)
        typ = int.from_bytes(d[e + 2 : e + 4], bo)
        if tag in (256, 257):
            val = int.from_bytes(
                d[e + 8 : e + 10] if typ == 3 else d[e + 8 : e + 12], bo
            )
            if tag == 256:
                w = val
            else:
                h = val
    if w is None and h is None:
        return None
    return {
        **_EMPTY,
        "container": "tiff",
        "codec": "ifd",
        "width": w,
        "height": h,
        "n_frames": 1,
    }


def _probe_ppm(d: bytes) -> dict | None:
    if d[:2] not in (b"P5", b"P6", b"P3"):
        return None
    toks: list[int] = []
    pos = 2
    while len(toks) < 2 and pos < len(d) and pos < 64:
        if d[pos : pos + 1] == b"#":
            while pos < len(d) and d[pos] not in (10, 13):
                pos += 1
        elif d[pos : pos + 1].isdigit():
            start = pos
            while pos < len(d) and d[pos : pos + 1].isdigit():
                pos += 1
            toks.append(int(d[start:pos]))
        else:
            pos += 1
    if len(toks) < 2:
        return None
    return {
        **_EMPTY,
        "container": "pnm",
        "codec": d[:2].decode(),
        "width": toks[0],
        "height": toks[1],
        "n_frames": 1,
    }


def probe_bytes(d: bytes) -> dict:
    """Header-only metadata for any payload this engine recognizes.
    Dispatch by magic bytes; O(header) work, no pixel/sample decode.
    Unknown/garbage bytes come back as container='unknown' — never raises."""
    try:
        if len(d) >= 12 and d[4:8] == b"ftyp":
            hf = _probe_heif(d)
            if hf is not None:
                return hf
            m = parse_mp4(d)
            if m is not None:
                vid = next(
                    (t for t in m["tracks"] if t["handler"] == "vide"), None
                )
                aud = next(
                    (t for t in m["tracks"] if t["handler"] == "soun"), None
                )
                return {
                    **_EMPTY,
                    "container": "mp4",
                    "codec": (vid or aud or {}).get("codec"),
                    "width": vid["width"] if vid else None,
                    "height": vid["height"] if vid else None,
                    "sample_rate": aud["timescale"] if aud else None,
                    "n_frames": vid["n_samples"] if vid else None,
                    "duration_ms": m["duration_ms"],
                }
        if d[:8] == b"\x89PNG\r\n\x1a\n" and len(d) >= 24:
            return {
                **_EMPTY,
                "container": "png",
                "codec": f"type{d[25]}" if len(d) > 25 else None,
                "width": int.from_bytes(d[16:20], "big"),
                "height": int.from_bytes(d[20:24], "big"),
                "n_frames": 1,
            }
        if d[:6] in (b"GIF87a", b"GIF89a") and len(d) >= 10:
            return {
                **_EMPTY,
                "container": "gif",
                "codec": d[3:6].decode(),
                "width": int.from_bytes(d[6:8], "little"),
                "height": int.from_bytes(d[8:10], "little"),
                "n_frames": 1,
            }
        if d[:4] == _EBML_MAGIC:
            mk = parse_mkv(d)
            if mk is not None:
                vid = next((t for t in mk["tracks"] if t["type"] == "video"), None)
                aud = next((t for t in mk["tracks"] if t["type"] == "audio"), None)
                return {
                    **_EMPTY,
                    "container": "mkv",
                    "codec": (vid or aud or {}).get("codec"),
                    "width": vid["width"] if vid else None,
                    "height": vid["height"] if vid else None,
                    "sample_rate": aud["sample_rate"] if aud else None,
                    "duration_ms": mk["duration_ms"],
                }
        if d[:5] == b"%PDF-":
            # version from the header comment; object count from the xref
            # trailer's /Size (always near EOF per spec) — O(tail) only,
            # preserving the census's payload-size-independent contract
            ver = d[5:8].decode("ascii", "replace").rstrip()
            n_objs = None
            tail = d[-2048:]
            at = tail.rfind(b"/Size")
            if at >= 0:
                seg = tail[at + 5 : at + 20]
                i = 0
                while i < len(seg) and seg[i] in b" \t\r\n":
                    i += 1
                j = i
                while j < len(seg) and 48 <= seg[j] <= 57:
                    j += 1
                if j > i:
                    n_objs = int(seg[i:j])
            return {
                **_EMPTY,
                "container": "pdf",
                "codec": ver,
                "n_frames": n_objs,
            }
        if d[:5] == b"WARC/":
            # bounded walk keeps the census payload-size-independent: a
            # record count is reported only when the file has fewer than
            # the cap (same spirit as the gzip branch's bounded peek)
            _CAP = 1000
            recs = parse_warc(d, max_records=_CAP)
            if recs is not None:
                return {**_EMPTY, "container": "warc", "codec": "plain",
                        "n_frames": len(recs) if len(recs) < _CAP else None}
        if d[:4] == b"Obj\x01":
            # Avro object container: header + block-skip walk — record
            # count comes from block headers, no datum is decoded
            from etl_expenses_spark.operators.avrocodec import probe_avro

            av = probe_avro(d)
            if av is not None:
                return {**_EMPTY, "container": "avro", "codec": av["codec"],
                        "n_frames": av["n_records"]}
        if d[:2] == b"\x1f\x8b":
            # peek the first member's first bytes only (bounded inflate):
            # a .warc.gz must census as warc, not generic gzip
            import zlib

            try:
                head = zlib.decompressobj(wbits=31).decompress(bytes(d[:4096]), 16)
            except zlib.error:
                head = b""
            if head[:5] == b"WARC/":
                return {**_EMPTY, "container": "warc", "codec": "gzip"}
            # gzip: ISIZE trailer = uncompressed size mod 2^32, surfaced
            # in n_frames (the census "how big when inflated" signal)
            usize = int.from_bytes(d[-4:], "little") if len(d) >= 18 else None
            return {**_EMPTY, "container": "gzip", "codec": "deflate",
                    "n_frames": usize}
        if d[:10] == b"\xff\x06\x00\x00sNaPpY":
            # snappy framing stream: chunk-skip walk, no CRC/decompress
            from etl_expenses_spark.operators.snappy import probe_snappy_frame

            sf = probe_snappy_frame(d)
            if sf is not None:
                return {**_EMPTY, "container": "snappy-frame",
                        "codec": "snappy", "n_frames": sf["n_chunks"]}
        if d[:4] == b"\x28\xb5\x2f\xfd":
            return {**_EMPTY, "container": "zstd"}
        if d[:6] == b"\xfd7zXZ\x00":
            return {**_EMPTY, "container": "xz"}
        if d[:2] == b"PK":
            zl = parse_zip_listing(d)
            if zl is not None:
                methods = {e["method"] for e in zl}
                return {
                    **_EMPTY,
                    "container": "zip",
                    "codec": methods.pop() if len(methods) == 1 else "mixed",
                    "n_frames": len(zl),  # members
                }
        if len(d) >= 512 and d[257:262] == b"ustar":
            tl = parse_tar_listing(d)
            if tl is not None:
                return {
                    **_EMPTY,
                    "container": "tar",
                    "codec": "ustar",
                    "n_frames": len(tl),
                }
        if d[:4] == b"OggS":
            og = parse_ogg(d)
            if og is not None:
                return {
                    **_EMPTY,
                    "container": "ogg",
                    "codec": og["codec"],
                    "sample_rate": og["sample_rate"],
                    "n_frames": og["n_samples"],
                    "duration_ms": og["duration_ms"],
                }
        fl = parse_flac_streaminfo(d)
        if fl is not None:
            return {
                **_EMPTY,
                "container": "flac",
                "codec": f"pcm{fl['channels']}ch",
                "sample_rate": fl["sample_rate"],
                "n_frames": fl["n_samples"],
                "duration_ms": fl["duration_ms"],
            }
        # BMP's 2-byte "BM" is the weakest magic here — checked only after
        # every strong-magic format (a tar whose first member is named
        # "BM..." must census as tar, not bmp)
        if d[:2] == b"BM" and len(d) >= 26:
            return {
                **_EMPTY,
                "container": "bmp",
                "codec": "rgb24",
                "width": int.from_bytes(d[18:22], "little"),
                "height": abs(
                    int.from_bytes(d[22:26], "little", signed=True)
                ),
                "n_frames": 1,
            }
        jp = _probe_jpeg(d)
        if jp is not None:
            return jp
        pn = _probe_ppm(d)
        if pn is not None:
            return pn
        wp = _probe_webp(d)
        if wp is not None:
            return wp
        av = _probe_avi(d)
        if av is not None:
            return av
        wv = _probe_wav(d)
        if wv is not None:
            return wv
        af = _probe_aiff(d)
        if af is not None:
            return af
        tf = _probe_tiff(d)
        if tf is not None:
            return tf
        if d[:9] == b"YUV4MPEG2":
            from etl_expenses_spark.operators.videocodec import _parse_header

            nl = d.find(b"\n")
            hdr = _parse_header(d[:nl]) if nl > 0 else None
            if hdr is not None:
                w, h, (cw, ch, ncp) = hdr
                fsize = w * h + ncp * ((w // cw) * (h // ch))
                # walk FRAME headers (they may carry parameters, so each
                # header is variable-length up to its newline) — O(frames)
                # pointer hops, matching decode_y4m's tolerance
                n = 0
                pos = nl + 1
                while pos + 5 <= len(d) and d[pos : pos + 5] == b"FRAME":
                    fh = d.find(b"\n", pos)
                    if fh < 0 or fh + 1 + fsize > len(d):
                        break
                    n += 1
                    pos = fh + 1 + fsize
                return {
                    **_EMPTY,
                    "container": "y4m",
                    "codec": "yuv",
                    "width": w,
                    "height": h,
                    "n_frames": n,
                }
        mp = parse_mp3(d)
        if mp is not None:
            return {
                **_EMPTY,
                "container": "mp3",
                "codec": "vbr" if mp["vbr"] else "cbr",
                "sample_rate": mp["sample_rate"],
                "n_frames": mp["n_frames"],
                "duration_ms": mp["duration_ms"],
            }
    except Exception:
        pass
    return dict(_EMPTY)


def probe_media(media: DataFrame) -> DataFrame:
    """Distributed media census: one row of header-derived metadata per
    payload. Arrow-batched mapInPandas; the probe reads headers only, so
    per-row cost is independent of payload size — the scan is I/O-bound
    at 100 TB and the census aggregate downstream shuffles only the tiny
    probe rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            probes = [probe_bytes(bytes(p)) for p in b["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"].astype("int64"),
                    "container": [p["container"] for p in probes],
                    "codec": [p["codec"] for p in probes],
                    "width": pd.array([p["width"] for p in probes], dtype="Int32"),
                    "height": pd.array([p["height"] for p in probes], dtype="Int32"),
                    "sample_rate": pd.array(
                        [p["sample_rate"] for p in probes], dtype="Int32"
                    ),
                    "n_frames": pd.array(
                        [p["n_frames"] for p in probes], dtype="Int64"
                    ),
                    "duration_ms": pd.array(
                        [p["duration_ms"] for p in probes], dtype="Int64"
                    ),
                    "orientation": pd.array(
                        [p["orientation"] for p in probes], dtype="Int32"
                    ),
                    "n_bytes": b["payload"].map(len).astype("int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(gen, schema=PROBE_SCHEMA)
