"""Container-metadata layer: ISO-BMFF box walk + MP3 frame scan + probe.

Contracts (same as the codec modules):
1. ROUNDTRIP — every field the fixture muxers plant comes back exactly
   from the parsers (both 32-bit v0 and 64-bit v1 MP4 box variants,
   CBR and VBR MP3, with and without an ID3v2 prefix).
2. ROBUSTNESS — parse/probe NEVER raise, whatever bytes arrive
   (hypothesis fuzz over magic-prefixed garbage and truncations).
3. CENSUS — probe_bytes dispatches every format this engine encodes to
   the right container with header-only metadata.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_expenses_spark.operators.containers import (
    encode_minimal_mp4,
    encode_mp3_frames,
    parse_mp3,
    parse_mp4,
    probe_bytes,
)


class TestMp4:
    def test_roundtrip_v0(self):
        b = encode_minimal_mp4(
            640, 360, 240, 8000, codec="avc1", audio_samples=384000, audio_rate=48000
        )
        m = parse_mp4(b)
        assert m["brand"] == "isom"
        assert m["duration_ms"] == 8000
        vid, aud = m["tracks"]
        assert (vid["handler"], vid["codec"]) == ("vide", "avc1")
        assert (vid["width"], vid["height"]) == (640, 360)
        assert vid["n_samples"] == 240
        assert vid["duration_ms"] == 8000
        assert (aud["handler"], aud["codec"]) == ("soun", "mp4a")
        assert aud["n_samples"] == 384000

    def test_roundtrip_v1_64bit_boxes(self):
        m = parse_mp4(
            encode_minimal_mp4(1920, 1080, 50, 2500, codec="hvc1", version1=True)
        )
        assert m["duration_ms"] == 2500
        assert m["tracks"][0]["codec"] == "hvc1"
        assert m["tracks"][0]["width"] == 1920

    def test_largesize_box(self):
        # rewrite the mdat box header to use size==1 + 64-bit largesize
        b = encode_minimal_mp4(64, 64, 10, 1000, mdat=b"x" * 32)
        idx = b.rindex(b"mdat") - 4
        size = int.from_bytes(b[idx : idx + 4], "big")
        patched = (
            b[:idx]
            + (1).to_bytes(4, "big")
            + b"mdat"
            + (size + 8).to_bytes(8, "big")
            + b[idx + 8 :]
        )
        assert parse_mp4(patched)["duration_ms"] == 1000

    def test_fragmented_mp4_counts_trun_samples(self):
        from etl_expenses_spark.operators.containers import encode_fragmented_mp4

        f = encode_fragmented_mp4(1280, 720, 48, 10, 16000)
        m = parse_mp4(f)
        vid = m["tracks"][0]
        # stbl is empty (as DASH packagers emit): frames come from the
        # 10 moof/traf/trun fragments, duration from mvex/mehd
        assert vid["n_samples"] == 480
        assert (vid["width"], vid["height"]) == (1280, 720)
        assert m["duration_ms"] == 16000
        p = probe_bytes(f)
        assert (p["container"], p["n_frames"], p["duration_ms"]) == (
            "mp4",
            480,
            16000,
        )
        for cut in range(0, len(f), 11):
            parse_mp4(f[:cut])  # never raises

    def test_not_mp4(self):
        assert parse_mp4(b"") is None
        assert parse_mp4(b"\x00" * 64) is None
        assert parse_mp4(b"RIFF\x00\x00\x00\x00WAVE") is None

    def test_truncations_never_raise(self):
        b = encode_minimal_mp4(320, 240, 24, 1000, audio_samples=1000)
        for cut in range(0, len(b), 7):
            parse_mp4(b[:cut])  # must not raise; value unspecified


class TestMp3:
    def test_cbr_roundtrip(self):
        m = parse_mp3(encode_mp3_frames(100, 128, 44100, id3_size=57))
        assert m == {
            "n_frames": 100,
            "sample_rate": 44100,
            "duration_ms": 100 * 1152 * 1000 // 44100,
            "bitrate_kbps": 128,
            "vbr": False,
        }

    def test_vbr_average(self):
        m = parse_mp3(encode_mp3_frames(10, 128, 32000, vbr_alternate=64))
        assert m["vbr"] is True
        assert m["bitrate_kbps"] == (5 * 128 + 5 * 64) // 10
        assert m["sample_rate"] == 32000

    @pytest.mark.parametrize("sr", [44100, 48000, 32000])
    def test_all_mpeg1_rates(self, sr):
        m = parse_mp3(encode_mp3_frames(7, 192, sr))
        assert (m["n_frames"], m["sample_rate"]) == (7, sr)
        assert m["duration_ms"] == 7 * 1152 * 1000 // sr

    def test_leading_junk_then_sync(self):
        raw = b"\x00junk\xff\x00" + encode_mp3_frames(5, 64, 44100)
        assert parse_mp3(raw)["n_frames"] == 5

    def test_trailing_garbage_stops_clean(self):
        raw = encode_mp3_frames(5, 64, 44100) + b"TAG" + b"\x01" * 128
        assert parse_mp3(raw)["n_frames"] == 5

    def test_no_frames(self):
        assert parse_mp3(b"") is None
        assert parse_mp3(b"ID3\x04\x00\x00\x00\x00\x00\x05hello") is None


class TestFlac:
    def test_streaminfo_roundtrip(self):
        from etl_expenses_spark.operators.containers import (
            encode_flac_streaminfo,
            parse_flac_streaminfo,
        )

        fl = encode_flac_streaminfo(44100, 441000, channels=2)
        assert parse_flac_streaminfo(fl) == {
            "sample_rate": 44100,
            "channels": 2,
            "n_samples": 441000,
            "duration_ms": 10000,
        }
        p = probe_bytes(fl)
        assert (p["container"], p["sample_rate"], p["duration_ms"]) == (
            "flac",
            44100,
            10000,
        )
        mono = encode_flac_streaminfo(96000, 96000 * 7, channels=1)
        assert parse_flac_streaminfo(mono)["duration_ms"] == 7000
        assert parse_flac_streaminfo(b"fLaC") is None
        assert parse_flac_streaminfo(b"") is None
        for cut in range(len(fl)):
            parse_flac_streaminfo(fl[:cut])  # never raises


class TestMkv:
    def test_roundtrip(self):
        from etl_expenses_spark.operators.containers import (
            encode_minimal_mkv,
            parse_mkv,
        )

        b = encode_minimal_mkv(1920, 1080, 42000, codec="V_AV1", audio_rate=48000)
        m = parse_mkv(b)
        assert m["duration_ms"] == 42000
        vid, aud = m["tracks"]
        assert (vid["type"], vid["codec"], vid["width"], vid["height"]) == (
            "video",
            "V_AV1",
            1920,
            1080,
        )
        assert (aud["type"], aud["codec"], aud["sample_rate"]) == (
            "audio",
            "A_OPUS",
            48000,
        )
        p = probe_bytes(b)
        assert (p["container"], p["codec"], p["sample_rate"]) == (
            "mkv",
            "V_AV1",
            48000,
        )

    def test_unknown_size_segment(self):
        # live-stream convention: segment size all-ones = to-end-of-file
        from etl_expenses_spark.operators.containers import (
            encode_minimal_mkv,
            parse_mkv,
        )

        b = encode_minimal_mkv(640, 480, 9000)
        idx = b.index(bytes.fromhex("18538067")) + 4
        ln = 8 - b[idx].bit_length() + 1
        patched = b[:idx] + bytes([0xFF]) + b[idx + ln :]
        assert parse_mkv(patched)["duration_ms"] == 9000

    def test_truncations_and_garbage_never_raise(self):
        from etl_expenses_spark.operators.containers import (
            encode_minimal_mkv,
            parse_mkv,
        )

        b = encode_minimal_mkv(64, 48, 500, audio_rate=8000)
        for cut in range(len(b)):
            parse_mkv(b[:cut])
        assert parse_mkv(b"\x1a\x45\xdf\xa3" + b"\x00" * 8) is not None
        assert parse_mkv(b"nope") is None


class TestWebImages:
    """WebP and AVIF/HEIC — the web-scrape image formats: dims without
    decode (fixtures built to spec byte layouts)."""

    @staticmethod
    def _riff(fourcc, chunk):
        payload = b"WEBP" + fourcc + len(chunk).to_bytes(4, "little") + chunk
        return b"RIFF" + len(payload).to_bytes(4, "little") + payload

    def test_webp_all_three_variants(self):
        vp8 = self._riff(
            b"VP8 ",
            b"\x00\x00\x00\x9d\x01\x2a"
            + (320).to_bytes(2, "little")
            + (240).to_bytes(2, "little"),
        )
        bits = 499 | (699 << 14)  # (w-1) | (h-1)<<14
        vp8l = self._riff(b"VP8L", b"\x2f" + bits.to_bytes(4, "little"))
        vp8x = self._riff(
            b"VP8X",
            b"\x00" * 4
            + (1023).to_bytes(3, "little")
            + (767).to_bytes(3, "little"),
        )
        for payload, codec, w, h in (
            (vp8, "vp8", 320, 240),
            (vp8l, "vp8l", 500, 700),
            (vp8x, "vp8x", 1024, 768),
        ):
            p = probe_bytes(payload)
            assert (p["container"], p["codec"], p["width"], p["height"]) == (
                "webp",
                codec,
                w,
                h,
            ), codec
            for cut in range(len(payload)):
                probe_bytes(payload[:cut])  # never raises

    def test_avif_heic_ispe_dims(self):
        import struct

        from etl_expenses_spark.operators.containers import _box, _full

        ispe = _full(b"ispe", 0, struct.pack(">II", 800, 600))
        meta = _full(b"meta", 0, _box(b"iprp", _box(b"ipco", ispe)))
        for brand in (b"avif", b"heic"):
            f = _box(b"ftyp", brand, b"\x00" * 4, brand + b"mif1") + meta
            p = probe_bytes(f)
            assert (p["container"], p["codec"], p["width"], p["height"]) == (
                "heif",
                brand.decode(),
                800,
                600,
            )
        # a video ftyp must NOT be captured by the heif branch
        assert probe_bytes(encode_minimal_mp4(64, 48, 10, 1000))["container"] == "mp4"


class TestLegacyAV:
    def test_avi_avih_header(self):
        import struct

        avih_body = (
            struct.pack("<IIII", 33367, 0, 0, 0)
            + struct.pack("<I", 720)
            + b"\x00" * 12
            + struct.pack("<II", 640, 480)
            + b"\x00" * 16
        )
        avih = b"avih" + len(avih_body).to_bytes(4, "little") + avih_body
        hdrl = b"LIST" + (len(avih) + 4).to_bytes(4, "little") + b"hdrl" + avih
        avi = b"RIFF" + (len(hdrl) + 4).to_bytes(4, "little") + b"AVI " + hdrl
        p = probe_bytes(avi)
        assert (p["container"], p["width"], p["height"], p["n_frames"]) == (
            "avi",
            640,
            480,
            720,
        )
        assert p["duration_ms"] == 720 * 33367 // 1000
        for cut in range(0, len(avi), 5):
            probe_bytes(avi[:cut])  # never raises

    def test_aiff_comm_extended_float_rate(self):
        import math
        import struct

        def ext80(rate):
            e = math.floor(math.log2(rate))
            mant = int(rate / (2**e) * (1 << 63))
            return struct.pack(">H", 16383 + e) + mant.to_bytes(8, "big")

        for rate in (8000, 22050, 44100, 48000, 96000):
            comm = (
                b"COMM"
                + (18).to_bytes(4, "big")
                + struct.pack(">hIh", 2, rate * 2, 16)
                + ext80(rate)
            )
            aiff = b"FORM" + (len(comm) + 4).to_bytes(4, "big") + b"AIFF" + comm
            p = probe_bytes(aiff)
            assert (p["container"], p["sample_rate"], p["duration_ms"]) == (
                "aiff",
                rate,
                2000,
            ), rate


class TestMediaTags:
    TAGS = {"title": "Canción de prueba", "artist": "Ensayo", "album": "Demo"}

    def test_id3v2_both_versions_and_encodings(self):
        from etl_expenses_spark.operators.containers import (
            encode_id3v2_tags,
            extract_tags,
        )

        for ver in (4, 3):  # v2.4 = UTF-8 frames, v2.3 = UTF-16 w/ BOM
            mp3 = encode_id3v2_tags(self.TAGS, version=ver) + encode_mp3_frames(
                5, 128, 44100
            )
            assert extract_tags(mp3) == self.TAGS
            assert parse_mp3(mp3)["n_frames"] == 5  # scan still skips the tag

    def test_flac_vorbis_comment_block(self):
        from etl_expenses_spark.operators.containers import (
            encode_flac_streaminfo,
            extract_tags,
            parse_flac_streaminfo,
        )

        fl = encode_flac_streaminfo(44100, 441000, tags={"title": "Pista", "artist": "A&B"})
        assert extract_tags(fl) == {"title": "Pista", "artist": "A&B"}
        assert parse_flac_streaminfo(fl)["duration_ms"] == 10000  # probe unchanged

    def test_ogg_opustags(self):
        from etl_expenses_spark.operators.containers import (
            encode_minimal_ogg,
            extract_tags,
            parse_ogg,
        )

        o = encode_minimal_ogg(96000, "opus", tags={"title": "Opuscule"})
        assert extract_tags(o) == {"title": "Opuscule"}
        assert parse_ogg(o)["duration_ms"] == 2000

    def test_id3v22_three_char_frames(self):
        from etl_expenses_spark.operators.containers import extract_tags

        body = b""
        for fid, v in ((b"TT2", "Old School"), (b"TP1", "Retro")):
            payload = b"\x00" + v.encode("latin-1")
            body += fid + len(payload).to_bytes(3, "big") + payload
        size = len(body)
        tag = b"ID3\x02\x00\x00" + bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        ) + body
        mp3 = tag + encode_mp3_frames(3, 64, 44100)
        assert extract_tags(mp3) == {"title": "Old School", "artist": "Retro"}
        assert parse_mp3(mp3)["n_frames"] == 3

    def test_mp4_ilst_atoms(self):
        from etl_expenses_spark.operators.containers import (
            _box,
            _full,
            encode_minimal_mp4,
            extract_tags,
        )

        items = b""
        for fc, v in ((b"\xa9nam", "Película"), (b"\xa9ART", "Estudio")):
            items += _box(
                fc, _box(b"data", b"\x00\x00\x00\x01" + b"\x00" * 4 + v.encode())
            )
        udta = _box(b"udta", _full(b"meta", 0, _box(b"ilst", items)))
        base = encode_minimal_mp4(320, 180, 24, 1000)
        midx = base.index(b"moov") - 4
        msize = int.from_bytes(base[midx : midx + 4], "big")
        tagged = (
            base[:midx]
            + (msize + len(udta)).to_bytes(4, "big")
            + b"moov"
            + base[midx + 8 : midx + msize]
            + udta
            + base[midx + msize :]
        )
        assert extract_tags(tagged) == {"title": "Película", "artist": "Estudio"}
        assert probe_bytes(tagged)["duration_ms"] == 1000  # probe unaffected
        assert extract_tags(base) == {}

    def test_untagged_and_garbage_give_empty(self):
        from etl_expenses_spark.operators.containers import extract_tags

        assert extract_tags(encode_mp3_frames(3, 64, 44100)) == {}
        assert extract_tags(b"") == {}
        assert extract_tags(b"ID3\x04\x00\x00\x00\x00\x00\x02xx") == {}

    @settings(max_examples=150, deadline=None)
    @given(
        prefix=st.sampled_from([b"ID3", b"fLaC", b"OggS", b""]),
        junk=st.binary(max_size=150),
    )
    def test_extract_never_raises(self, prefix, junk):
        from etl_expenses_spark.operators.containers import extract_tags

        assert isinstance(extract_tags(prefix + junk), dict)


class TestArchives:
    """Archive listings are cross-checked against stdlib zipfile/tarfile
    OUTPUT (independent writers), not against our own muxers."""

    def test_zip_listing_matches_stdlib_writer(self):
        import io
        import zipfile

        from etl_expenses_spark.operators.containers import parse_zip_listing

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
            z.writestr("docs/a.txt", "hello world " * 50)
            z.writestr("docs/b.json", '{"x": 1}')
            z.writestr("stored.bin", b"\x00" * 10, compress_type=zipfile.ZIP_STORED)
        zb = buf.getvalue()
        got = parse_zip_listing(zb)
        assert [e["name"] for e in got] == ["docs/a.txt", "docs/b.json", "stored.bin"]
        assert got[0]["uncompressed"] == 600 and got[0]["method"] == "deflate"
        assert got[2]["method"] == "store"
        p = probe_bytes(zb)
        assert (p["container"], p["codec"], p["n_frames"]) == ("zip", "mixed", 3)
        for cut in range(0, len(zb), 7):
            parse_zip_listing(zb[:cut])  # never raises

    def test_zip64_eocd_and_per_entry_sizes(self):
        # ZIP64 (r5 ADVICE): >65535 members / >4 GiB offsets put sentinels
        # in the classic EOCD and the real values in a ZIP64 EOCD record.
        # Rewrite a stdlib zip's tail into the ZIP64 layout and check the
        # walk recovers the identical listing via the 64-bit fields.
        import io
        import struct
        import zipfile

        from etl_expenses_spark.operators.containers import parse_zip_listing

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
            z.writestr("docs/a.txt", "hello world " * 50)
            z.writestr("stored.bin", b"\x00" * 10, compress_type=zipfile.ZIP_STORED)
        zb = buf.getvalue()
        classic = parse_zip_listing(zb)
        eocd = zb.rfind(b"PK\x05\x06")
        n = int.from_bytes(zb[eocd + 10 : eocd + 12], "little")
        cd_size = int.from_bytes(zb[eocd + 12 : eocd + 16], "little")
        cd_off = int.from_bytes(zb[eocd + 16 : eocd + 20], "little")
        z64_off = eocd  # record replaces the classic EOCD position
        z64 = (
            b"PK\x06\x06" + struct.pack("<Q", 44) + struct.pack("<HH", 45, 45)
            + struct.pack("<II", 0, 0) + struct.pack("<QQQQ", n, n, cd_size, cd_off)
        )
        loc = b"PK\x06\x07" + struct.pack("<IQI", 0, z64_off, 1)
        sentinel_eocd = (
            b"PK\x05\x06" + b"\x00" * 4 + b"\xff\xff\xff\xff"
            + struct.pack("<I", cd_size) + b"\xff\xff\xff\xff" + b"\x00\x00"
        )
        zb64 = zb[:eocd] + z64 + loc + sentinel_eocd
        assert parse_zip_listing(zb64) == classic
        assert probe_bytes(zb64)["container"] == "zip"
        # sentinel EOCD with NO locator → None, never a bogus listing
        assert parse_zip_listing(zb[:eocd] + sentinel_eocd) is None
        for cut in range(len(zb), len(zb64), 5):
            parse_zip_listing(zb64[:cut])  # never raises

        # per-entry ZIP64 extra field: 0xFFFFFFFF sizes resolved from the
        # 0x0001 extra (uncompressed first, then compressed)
        name = b"huge.bin"
        extra = struct.pack("<HH", 0x0001, 16) + struct.pack(
            "<QQ", 5_000_000_000, 4_900_000_000
        )
        cde = (
            b"PK\x01\x02" + struct.pack("<HHHH", 45, 45, 0, 0)
            + struct.pack("<HHIII", 0, 0, 0, 0xFFFFFFFF, 0xFFFFFFFF)
            + struct.pack("<HHHHHII", len(name), len(extra), 0, 0, 0, 0, 0)
            + name + extra
        )
        eocd_small = (
            b"PK\x05\x06" + b"\x00" * 4 + struct.pack("<HH", 1, 1)
            + struct.pack("<II", len(cde), 0) + b"\x00\x00"
        )
        got = parse_zip_listing(cde + eocd_small)
        assert got == [
            {
                "name": "huge.bin",
                "compressed": 4_900_000_000,
                "uncompressed": 5_000_000_000,
                "method": "store",
            }
        ]

    def test_tar_listing_matches_stdlib_writer(self):
        import io
        import tarfile

        from etl_expenses_spark.operators.containers import parse_tar_listing

        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as t:
            for name, content in [("a.txt", b"x" * 700), ("dir/b.bin", b"y" * 10)]:
                info = tarfile.TarInfo(name)
                info.size = len(content)
                t.addfile(info, io.BytesIO(content))
        tb = buf.getvalue()
        got = parse_tar_listing(tb)
        assert got == [
            {"name": "a.txt", "size": 700, "kind": "file"},
            {"name": "dir/b.bin", "size": 10, "kind": "file"},
        ]
        assert probe_bytes(tb)["container"] == "tar"
        for cut in range(0, len(tb), 64):
            parse_tar_listing(tb[:cut])  # never raises

    def test_xlsx_payload_probes_as_zip(self):
        # OOXML is a zip on the wire; the byte census must say so
        from etl_expenses_spark.sources.xlsx import make_xlsx

        x = make_xlsx([["c1"], [1]])
        assert probe_bytes(x)["container"] == "zip"

    def test_document_lake_formats(self):
        import gzip

        from etl_expenses_spark.pdftext import make_pdf

        pdf = make_pdf(["Ticket 1 total 9.99", "page two"])
        p = probe_bytes(pdf)
        assert p["container"] == "pdf" and p["codec"].startswith("1.")
        assert p["n_frames"] and p["n_frames"] > 0  # trailer /Size

        g = gzip.compress(b"hello world " * 1000)
        pg = probe_bytes(g)
        assert (pg["container"], pg["codec"], pg["n_frames"]) == (
            "gzip",
            "deflate",
            12000,  # ISIZE trailer
        )
        assert probe_bytes(b"\x28\xb5\x2f\xfdxxxx")["container"] == "zstd"
        assert probe_bytes(b"\xfd7zXZ\x00rest")["container"] == "xz"

    def test_not_archives(self):
        from etl_expenses_spark.operators.containers import (
            parse_tar_listing,
            parse_zip_listing,
        )

        assert parse_zip_listing(b"PK\x03\x04 but truncated") is None
        assert parse_zip_listing(b"") is None
        assert parse_tar_listing(b"\x00" * 1024) is None


class TestRoundtripProperties:
    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(16, 4096),
        h=st.integers(16, 4096),
        n=st.integers(1, 100000),
        dur=st.integers(1, 10**7),
        v1=st.booleans(),
    )
    def test_mp4_any_planted_values_roundtrip(self, w, h, n, dur, v1):
        m = parse_mp4(encode_minimal_mp4(w, h, n, dur, version1=v1))
        t = m["tracks"][0]
        assert (t["width"], t["height"], t["n_samples"]) == (w, h, n)
        assert m["duration_ms"] == dur

    @settings(max_examples=60, deadline=None)
    @given(
        spf=st.integers(1, 5000),
        nf=st.integers(1, 64),
        dur=st.integers(1, 10**7),
    )
    def test_fmp4_any_planted_values_roundtrip(self, spf, nf, dur):
        from etl_expenses_spark.operators.containers import encode_fragmented_mp4

        m = parse_mp4(encode_fragmented_mp4(640, 360, spf, nf, dur))
        assert m["tracks"][0]["n_samples"] == spf * nf
        assert m["duration_ms"] == dur

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(1, 65535),
        h=st.integers(1, 65535),
        dur=st.integers(0, 10**8),
        rate=st.integers(1, 384000),
    )
    def test_mkv_any_planted_values_roundtrip(self, w, h, dur, rate):
        from etl_expenses_spark.operators.containers import (
            encode_minimal_mkv,
            parse_mkv,
        )

        m = parse_mkv(encode_minimal_mkv(w, h, dur, audio_rate=rate))
        vid, aud = m["tracks"]
        assert (vid["width"], vid["height"]) == (w, h)
        assert m["duration_ms"] == dur
        assert aud["sample_rate"] == rate

    @settings(max_examples=60, deadline=None)
    @given(
        rate=st.sampled_from([8000, 22050, 44100, 48000, 96000, 192000]),
        n=st.integers(0, 2**36 - 1),
        ch=st.integers(1, 8),
    )
    def test_flac_any_planted_values_roundtrip(self, rate, n, ch):
        from etl_expenses_spark.operators.containers import (
            encode_flac_streaminfo,
            parse_flac_streaminfo,
        )

        m = parse_flac_streaminfo(encode_flac_streaminfo(rate, n, channels=ch))
        assert (m["sample_rate"], m["n_samples"], m["channels"]) == (rate, n, ch)

    @settings(max_examples=60, deadline=None)
    @given(
        nf=st.integers(1, 500),
        kbps=st.sampled_from([32, 64, 96, 128, 192, 256, 320]),
        sr=st.sampled_from([44100, 48000, 32000]),
        id3=st.integers(0, 500),
    )
    def test_mp3_any_planted_values_roundtrip(self, nf, kbps, sr, id3):
        m = parse_mp3(encode_mp3_frames(nf, kbps, sr, id3_size=id3))
        assert (m["n_frames"], m["bitrate_kbps"], m["sample_rate"]) == (
            nf,
            kbps,
            sr,
        )


class TestOgg:
    def test_opus_and_vorbis(self):
        from etl_expenses_spark.operators.containers import (
            encode_minimal_ogg,
            parse_ogg,
        )

        o = encode_minimal_ogg(96000, "opus")
        assert parse_ogg(o) == {
            "codec": "opus",
            "sample_rate": 48000,
            "n_samples": 96000,
            "duration_ms": 2000,
        }
        v = encode_minimal_ogg(88200, "vorbis", 44100)
        assert parse_ogg(v)["duration_ms"] == 2000
        assert parse_ogg(v)["codec"] == "vorbis"
        p = probe_bytes(o)
        assert (p["container"], p["codec"], p["duration_ms"]) == (
            "ogg",
            "opus",
            2000,
        )
        for cut in range(len(o)):
            parse_ogg(o[:cut])  # never raises
        assert parse_ogg(b"OggS" + b"\x00" * 10) is None or True


class TestProbe:
    def test_census_dispatch(self):
        from etl_expenses_spark.operators.audiocodec import make_tone
        from etl_expenses_spark.operators.gifcodec import encode_gif
        from etl_expenses_spark.operators.imagecodec import encode_ppm
        from etl_expenses_spark.operators.jpegcodec import encode_jpeg
        from etl_expenses_spark.operators.pngcodec import encode_png
        from etl_expenses_spark.operators.videocodec import encode_y4m

        arr = np.full((7, 9, 3), 50, np.uint8)
        cases = {
            "mp4": encode_minimal_mp4(320, 180, 24, 1000),
            "mp3": encode_mp3_frames(4, 128, 48000),
            "pnm": encode_ppm(arr),
            "png": encode_png(arr),
            "jpeg": encode_jpeg(arr),
            "gif": encode_gif(arr),
            "wav": make_tone(440.0, 1500, sample_rate=8000),
            "y4m": encode_y4m(np.full((4, 6, 8), 9, np.uint8)),
        }
        for want, payload in cases.items():
            assert probe_bytes(payload)["container"] == want, want
        for img in ("pnm", "png", "jpeg", "gif"):
            p = probe_bytes(cases[img])
            assert (p["width"], p["height"]) == (9, 7), img
        assert probe_bytes(cases["wav"])["duration_ms"] == 1500
        mp4_audio = encode_minimal_mp4(
            320, 180, 24, 1000, audio_samples=48000, audio_rate=48000
        )
        assert probe_bytes(mp4_audio)["sample_rate"] == 48000
        assert probe_bytes(cases["y4m"])["n_frames"] == 4
        assert probe_bytes(cases["mp4"])["n_frames"] == 24
        assert probe_bytes(b"\x00\x01garbage")["container"] == "unknown"

    @pytest.mark.parametrize("bo,orient", [("little", 6), ("big", 8), ("little", 1)])
    def test_exif_orientation(self, bo, orient):
        from etl_expenses_spark.operators.jpegcodec import encode_jpeg

        # build APP1: Exif\0\0 + TIFF header + IFD0 with one orientation tag
        e = b"II" if bo == "little" else b"MM"
        tiff = (
            e
            + (42).to_bytes(2, bo)
            + (8).to_bytes(4, bo)  # IFD0 at offset 8
            + (1).to_bytes(2, bo)  # one entry
            + (0x0112).to_bytes(2, bo)
            + (3).to_bytes(2, bo)  # SHORT
            + (1).to_bytes(4, bo)
            + orient.to_bytes(2, bo)
            + b"\x00\x00"
            + (0).to_bytes(4, bo)  # next IFD
        )
        payload = b"Exif\x00\x00" + tiff
        app1 = b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload
        jpg = encode_jpeg(np.full((8, 8, 3), 99, np.uint8))
        tagged = jpg[:2] + app1 + jpg[2:]
        p = probe_bytes(tagged)
        assert (p["container"], p["orientation"]) == ("jpeg", orient)
        assert probe_bytes(jpg)["orientation"] is None  # untagged

    def test_exif_then_xmp_app1_keeps_orientation(self):
        # the common camera/Adobe layout: EXIF APP1 followed by an XMP APP1.
        # A later non-EXIF APP1 must not erase the already-found value
        # (r5 ADVICE: unconditional overwrite reported orientation=None).
        from etl_expenses_spark.operators.jpegcodec import encode_jpeg

        tiff = (
            b"II"
            + (42).to_bytes(2, "little")
            + (8).to_bytes(4, "little")
            + (1).to_bytes(2, "little")
            + (0x0112).to_bytes(2, "little")
            + (3).to_bytes(2, "little")
            + (1).to_bytes(4, "little")
            + (6).to_bytes(2, "little")
            + b"\x00\x00"
            + (0).to_bytes(4, "little")
        )
        exif = b"Exif\x00\x00" + tiff
        app1_exif = b"\xff\xe1" + (len(exif) + 2).to_bytes(2, "big") + exif
        xmp = b"http://ns.adobe.com/xap/1.0/\x00<x:xmpmeta/>"
        app1_xmp = b"\xff\xe1" + (len(xmp) + 2).to_bytes(2, "big") + xmp
        jpg = encode_jpeg(np.full((8, 8, 3), 99, np.uint8))
        tagged = jpg[:2] + app1_exif + app1_xmp + jpg[2:]
        assert probe_bytes(tagged)["orientation"] == 6
        # reversed order still finds it (first APP1 has no EXIF value)
        swapped = jpg[:2] + app1_xmp + app1_exif + jpg[2:]
        assert probe_bytes(swapped)["orientation"] == 6

    def test_exif_malformed_never_raises(self):
        from etl_expenses_spark.operators.containers import _parse_exif_orientation

        assert _parse_exif_orientation(b"Exif\x00\x00XX") is None
        assert _parse_exif_orientation(b"Exif\x00\x00II\x2a\x00\xff\xff\xff\xff") is None
        assert _parse_exif_orientation(b"") is None

    @settings(max_examples=200, deadline=None)
    @given(
        prefix=st.sampled_from(
            [
                b"",
                b"\xff\xfb",
                b"ID3",
                b"\x00\x00\x00\x18ftyp",
                b"RIFF",
                b"P6",
                b"fLaC",
                b"\x1a\x45\xdf\xa3",
            ]
        ),
        junk=st.binary(max_size=120),
    )
    def test_probe_never_raises(self, prefix, junk):
        out = probe_bytes(prefix + junk)
        assert isinstance(out["container"], str)

    @settings(max_examples=60, deadline=None)
    @given(cut=st.integers(min_value=0, max_value=400), data=st.data())
    def test_probe_truncated_real_files(self, cut, data):
        which = data.draw(st.sampled_from(["mp4", "mp3"]))
        full = (
            encode_minimal_mp4(64, 48, 12, 500, audio_samples=100)
            if which == "mp4"
            else encode_mp3_frames(6, 96, 44100, id3_size=11)
        )
        probe_bytes(full[: min(cut, len(full))])  # must not raise


class TestTiff:
    def test_both_byte_orders(self):
        for bo, pre in (("little", b"II*\x00"), ("big", b"MM\x00*")):
            def entry(tag, val):
                return (
                    tag.to_bytes(2, bo) + (3).to_bytes(2, bo)
                    + (1).to_bytes(4, bo) + val.to_bytes(2, bo) + b"\x00\x00"
                )

            tif = (
                pre + (8).to_bytes(4, bo) + (2).to_bytes(2, bo)
                + entry(256, 2480) + entry(257, 3508) + (0).to_bytes(4, bo)
            )
            p = probe_bytes(tif)
            assert (p["container"], p["width"], p["height"]) == (
                "tiff", 2480, 3508,
            ), bo
            for cut in range(len(tif)):
                probe_bytes(tif[:cut])  # never raises


def test_probe_media_all_formats_through_spark(spark):
    """The full dispatch table through the Spark stage: one payload per
    known container format, one probe pass, every format lands in its own
    bucket with sane metadata. Locks the probe dispatch comprehensively —
    a new format colliding with an existing magic breaks this first."""
    import gzip
    import io
    import struct
    import tarfile
    import zipfile

    import numpy as np
    from pyspark.sql import Row

    from etl_expenses_spark.operators.audiocodec import (
        encode_aiff,
        encode_g711_wav,
        encode_ima_adpcm_wav,
        make_tone,
    )
    from etl_expenses_spark.operators.containers import (
        _box,
        _full,
        encode_flac_streaminfo,
        encode_fragmented_mp4,
        encode_minimal_mkv,
        encode_minimal_mp4,
        encode_minimal_ogg,
        encode_mp3_frames,
        probe_media,
    )
    from etl_expenses_spark.operators.gifcodec import encode_gif
    from etl_expenses_spark.operators.imagecodec import encode_ppm
    from etl_expenses_spark.operators.jpegcodec import encode_jpeg
    from etl_expenses_spark.operators.pngcodec import encode_png
    from etl_expenses_spark.operators.videocodec import encode_y4m
    from etl_expenses_spark.pdftext import make_pdf

    img = np.full((6, 8, 3), 120, np.uint8)
    tone = (np.sin(np.arange(800) * 0.1) * 9000).astype(np.int16)

    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as z:
        z.writestr("a.txt", "x" * 100)
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w") as t:
        info = tarfile.TarInfo("a.txt")
        info.size = 3
        t.addfile(info, io.BytesIO(b"abc"))

    ispe = _full(b"ispe", 0, struct.pack(">II", 80, 60))
    meta = _full(b"meta", 0, _box(b"iprp", _box(b"ipco", ispe)))
    heif = _box(b"ftyp", b"avif", b"\x00" * 4, b"avifmif1") + meta

    vp8l = (
        b"RIFF" + (13).to_bytes(4, "little") + b"WEBP" + b"VP8L"
        + (5).to_bytes(4, "little") + b"\x2f"
        + ((79) | (59 << 14)).to_bytes(4, "little")
    )

    avih_body = struct.pack("<IIII", 40000, 0, 0, 0) + struct.pack("<I", 10) \
        + b"\x00" * 12 + struct.pack("<II", 32, 24) + b"\x00" * 16
    avih = b"avih" + len(avih_body).to_bytes(4, "little") + avih_body
    hdrl = b"LIST" + (len(avih) + 4).to_bytes(4, "little") + b"hdrl" + avih
    avi = b"RIFF" + (len(hdrl) + 4).to_bytes(4, "little") + b"AVI " + hdrl

    def tiff():
        bo = "little"

        def entry(tag, val):
            return (
                tag.to_bytes(2, bo) + (3).to_bytes(2, bo)
                + (1).to_bytes(4, bo) + val.to_bytes(2, bo) + b"\x00\x00"
            )

        return (
            b"II*\x00" + (8).to_bytes(4, bo) + (2).to_bytes(2, bo)
            + entry(256, 40) + entry(257, 30) + (0).to_bytes(4, bo)
        )

    payloads = {
        "mp4": encode_minimal_mp4(64, 48, 10, 1000),
        "mp4-frag": encode_fragmented_mp4(64, 48, 5, 2, 500),
        "mkv": encode_minimal_mkv(64, 48, 700),
        "mp3": encode_mp3_frames(3, 64, 44100),
        "flac": encode_flac_streaminfo(48000, 4800),
        "ogg": encode_minimal_ogg(960, "opus"),
        "wav-pcm": make_tone(440.0, 100, sample_rate=8000),
        "wav-g711": encode_g711_wav(tone, 8000),
        "wav-adpcm": encode_ima_adpcm_wav(tone, 8000),
        "aiff": encode_aiff(tone, 8000),
        "pnm": encode_ppm(img),
        "png": encode_png(img),
        "jpeg": encode_jpeg(img),
        "gif": encode_gif(img),
        "y4m": encode_y4m(np.full((2, 4, 4), 7, np.uint8)),
        "webp": vp8l,
        "heif": heif,
        "tiff": tiff(),
        "avi": avi,
        "zip": zbuf.getvalue(),
        "tar": tbuf.getvalue(),
        "pdf": make_pdf(["hello"]),
        "gzip": gzip.compress(b"y" * 500),
        "unknown": b"\x00\x01mystery",
    }
    rows = [
        Row(media_id=i, payload=p) for i, p in enumerate(payloads.values())
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in probe_media(media).collect()}
    expected_containers = [
        "mp4", "mp4", "mkv", "mp3", "flac", "ogg", "wav", "wav", "wav",
        "aiff", "pnm", "png", "jpeg", "gif", "y4m", "webp", "heif", "tiff",
        "avi", "zip", "tar", "pdf", "gzip", "unknown",
    ]
    for i, want in enumerate(expected_containers):
        assert got[i].container == want, (list(payloads)[i], got[i])
    # spot metadata sanity across families
    assert got[15].width == 80 and got[15].height == 60  # webp vp8l
    assert got[16].codec == "avif"
    assert got[9].sample_rate == 8000  # aiff
    assert got[1].n_frames == 10  # fragmented mp4 truns


class TestReviewRegressions:
    """Pins for the round-5 code-review findings."""

    def test_adpcm_decode_is_length_preserving(self):
        import numpy as np

        from etl_expenses_spark.operators.audiocodec import (
            decode_wav,
            encode_ima_adpcm_wav,
        )

        sig = (np.sin(np.arange(3777) * 0.05) * 12000).astype(np.int16)
        dec, _ = decode_wav(encode_ima_adpcm_wav(sig, 8000))
        assert dec.shape[0] == 3777  # fact chunk honored, no padded tail

    def test_tar_with_bm_member_name_is_tar(self):
        import io
        import tarfile

        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as t:
            info = tarfile.TarInfo("BMlogo.bin")
            info.size = 4
            t.addfile(info, io.BytesIO(b"abcd"))
        p = probe_bytes(buf.getvalue())
        assert (p["container"], p["n_frames"]) == ("tar", 1)

    def test_ogg_long_tag_multisegment_lacing(self):
        from etl_expenses_spark.operators.containers import (
            encode_minimal_ogg,
            extract_tags,
            parse_ogg,
        )

        o = encode_minimal_ogg(96000, "opus", tags={"title": "x" * 600})
        assert extract_tags(o)["title"] == "x" * 600
        assert parse_ogg(o)["duration_ms"] == 2000

    def test_y4m_frame_parameters_counted(self):
        import numpy as np

        from etl_expenses_spark.operators.videocodec import encode_y4m

        y = encode_y4m(np.full((3, 4, 4), 9, np.uint8))
        withparams = y.replace(b"FRAME\n", b"FRAME Ip\n")
        assert probe_bytes(withparams)["n_frames"] == 3

    def test_tags_census_reaches_all_four_carriers(self):
        # (did // 10) % 4 over doc_id % 10 == 6 must cycle every carrier
        assert sorted({(d // 10) % 4 for d in range(6, 500, 10)}) == [0, 1, 2, 3]


class TestWarc:
    RECS = [
        ("warcinfo", "", b"software: test\r\n"),
        ("request", "http://example.com/a", b"GET /a HTTP/1.1\r\n\r\n"),
        ("response", "http://example.com/a", b"HTTP/1.1 200 OK\r\n\r\nhello"),
    ]

    def test_plain_and_gzip_members_identical(self):
        from etl_expenses_spark.operators.containers import (
            encode_warc,
            parse_warc,
        )

        plain = encode_warc(self.RECS)
        gz = encode_warc(self.RECS, gzip_members=True)
        got = parse_warc(plain)
        assert got == parse_warc(gz)
        assert [r["type"] for r in got] == ["warcinfo", "request", "response"]
        assert got[2]["uri"] == "http://example.com/a"
        assert got[2]["content_length"] == len(self.RECS[2][2])

    def test_probe_dispatch(self):
        from etl_expenses_spark.operators.containers import encode_warc

        p = probe_bytes(encode_warc(self.RECS))
        assert (p["container"], p["codec"], p["n_frames"]) == ("warc", "plain", 3)
        pg = probe_bytes(encode_warc(self.RECS, gzip_members=True))
        assert (pg["container"], pg["codec"]) == ("warc", "gzip")
        import gzip

        assert probe_bytes(gzip.compress(b"zzz" * 200))["container"] == "gzip"

    def test_max_records_bound(self):
        from etl_expenses_spark.operators.containers import (
            encode_warc,
            parse_warc,
        )

        many = encode_warc([("response", f"u{i}", b"b" * 10) for i in range(50)])
        assert len(parse_warc(many, max_records=7)) == 7

    @settings(max_examples=120, deadline=None)
    @given(junk=st.binary(max_size=300), cut=st.integers(0, 500))
    def test_never_raises(self, junk, cut):
        from etl_expenses_spark.operators.containers import (
            encode_warc,
            parse_warc,
        )

        parse_warc(b"WARC/" + junk)
        parse_warc(b"\x1f\x8b" + junk)
        full = encode_warc(self.RECS, gzip_members=True)
        parse_warc(full[: min(cut, len(full))])


def test_extract_warc_records_through_spark(spark):
    from pyspark.sql import Row

    from etl_expenses_spark.operators.containers import (
        encode_warc,
        extract_warc_records,
    )

    rows = [
        Row(media_id=1, payload=encode_warc(TestWarc.RECS)),
        Row(media_id=2, payload=encode_warc(TestWarc.RECS, gzip_members=True)),
        Row(media_id=3, payload=b"not a warc"),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        (r.media_id, r.rec_type, r.content_length)
        for r in extract_warc_records(media).collect()
    }
    assert len(got) == 6  # 3 records from each of the two warcs, none from junk
    assert {m for m, _, _ in got} == {1, 2}


class TestWarcReviewRegressions:
    """Pins for the second review pass on the WARC walk."""

    def test_negative_content_length_terminates(self):
        from etl_expenses_spark.operators.containers import parse_warc

        assert parse_warc(b"WARC/1.0\r\nContent-Length: -33\r\n\r\n") is None

    def test_absurd_content_length_dropped(self):
        from etl_expenses_spark.operators.containers import parse_warc

        assert (
            parse_warc(
                b"WARC/1.0\r\nContent-Length: 99999999999999999999999\r\n\r\nhi"
            )
            is None
        )

    def test_truncated_body_not_reported(self):
        from etl_expenses_spark.operators.containers import (
            encode_warc,
            parse_warc,
        )

        full = encode_warc(
            [("response", "u", b"abc"), ("response", "u2", b"defgh")]
        )
        got = parse_warc(full[:-8])  # cuts into the last record's body
        assert len(got) == 1 and got[0]["content_length"] == 3

    def test_probe_walk_is_bounded(self):
        from etl_expenses_spark.operators.containers import encode_warc

        many = encode_warc([("response", f"u{i}", b"b") for i in range(1200)])
        p = probe_bytes(many)
        assert (p["container"], p["n_frames"]) == ("warc", None)  # capped
        few = encode_warc([("response", "u", b"b")] * 5)
        assert probe_bytes(few)["n_frames"] == 5

    def test_extract_degrades_cleanly_on_poison_rows(self, spark):
        from pyspark.sql import Row

        from etl_expenses_spark.operators.containers import (
            encode_warc,
            extract_warc_records,
        )

        rows = [
            Row(media_id=1, payload=encode_warc([("response", "u", b"ok")])),
            Row(media_id=2,
                payload=b"WARC/1.0\r\nContent-Length: -33\r\n\r\n"),
            Row(media_id=3,
                payload=b"WARC/1.0\r\nContent-Length: 99999999999999999999999\r\n\r\nhi"),
        ]
        media = spark.createDataFrame(rows, "media_id long, payload binary")
        got = extract_warc_records(media).collect()
        assert [r.media_id for r in got] == [1]  # poison rows yield nothing
