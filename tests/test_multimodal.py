"""Multimodal plumbing tests: binary columns + mapInPandas stages with the
stubbed decode (deterministic fakes — real codecs absent by design)."""

from __future__ import annotations

from pyspark.sql import Row

from etl_expenses_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_and_featurize,
    frame_sample,
)


def _media(spark):
    rows = [
        Row(media_id=1, kind="image", payload=b"img-bytes-1",
            meta=Row(width=64, height=48, sample_rate=None, n_frames=None,
                     duration_ms=None)),
        Row(media_id=2, kind="audio", payload=b"wav-bytes-2",
            meta=Row(width=None, height=None, sample_rate=16000, n_frames=None,
                     duration_ms=12500)),
        Row(media_id=3, kind="video", payload=b"mp4-bytes-3",
            meta=Row(width=320, height=240, sample_rate=None, n_frames=25,
                     duration_ms=1000)),
        Row(media_id=4, kind="image", payload=b"img-bytes-1",  # same content as 1
            meta=Row(width=64, height=48, sample_rate=None, n_frames=None,
                     duration_ms=None)),
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def test_featurize_deterministic_and_typed(spark):
    out = decode_and_featurize(_media(spark))
    assert [f.name for f in out.schema.fields] == ["media_id", "kind", "n_bytes", "feature"]
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 4
    assert all(len(r.feature) == FEATURE_DIM for r in rows.values())
    assert rows[1].feature == rows[4].feature, "same payload → same feature (content identity)"
    assert rows[1].feature != rows[2].feature
    assert rows[1].n_bytes == len(b"img-bytes-1")


def test_frame_sample_explodes_videos_only(spark):
    frames = frame_sample(_media(spark), every_n=10).collect()
    assert {r.media_id for r in frames} == {3}
    assert sorted(r.frame_no for r in frames) == [0, 10, 20]
    assert all(isinstance(bytes(r.frame), bytes) and len(bytes(r.frame)) == 32 for r in frames)


def test_resize_updates_payload_and_meta_together(spark):
    from etl_expenses_spark.operators.multimodal import resize_images

    out = resize_images(_media(spark), width=224, height=224)
    rows = {r.media_id: r for r in out.collect()}
    # images only
    assert set(rows) == {1, 4}
    for r in rows.values():
        assert (r.meta.width, r.meta.height) == (224, 224)
        assert len(bytes(r.payload)) == (224 * 224) // 1024
    # deterministic: identical source payload → identical resized payload
    assert bytes(rows[1].payload) == bytes(rows[4].payload)
    # schema identical to MEDIA_SCHEMA (stage is composable with itself)
    assert out.schema == _media(spark).schema


def test_imagecodec_ppm_bmp_roundtrip():
    """Real codec unit coverage: BMP and PPM decode to identical pixels,
    PPM survives an encode/decode roundtrip, resize is exact on solid
    quadrants."""
    import struct

    import numpy as np

    from etl_expenses_spark.operators.imagecodec import (
        decode_image,
        encode_ppm,
        image_features,
        resize_nearest,
    )

    # 4x2 image: left half red, right half blue
    arr = np.zeros((2, 4, 3), dtype=np.uint8)
    arr[:, :2] = [255, 0, 0]
    arr[:, 2:] = [0, 0, 255]

    assert np.array_equal(decode_image(encode_ppm(arr)), arr)

    # hand-built 24-bit BMP (bottom-up, BGR, 4-byte row padding)
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    px = bytearray()
    for row in arr[::-1]:
        for r, g, b in row:
            px += bytes([b, g, r])
        px += b"\x00" * (stride - w * 3)
    bmp = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(px), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 2835, 2835, 0, 0)
        + px
    )
    assert np.array_equal(decode_image(bmp), arr)

    big = resize_nearest(arr, 8, 4)
    assert big.shape == (4, 8, 3)
    assert (big[:, :4] == [255, 0, 0]).all() and (big[:, 4:] == [0, 0, 255]).all()

    feats = image_features(arr)
    assert len(feats) == 8
    assert abs(feats[0] - 0.5) < 1e-12 and feats[1] == 0.0  # mean R/G of half-red
    assert feats[6] == 2.0  # aspect ratio w/h


def test_real_image_path_through_spark_stages(spark):
    """PPM payloads take the REAL decode path in both mapInPandas stages:
    features reflect pixel content and resize emits a decodable PPM with
    matching meta."""
    import numpy as np
    from pyspark.sql import Row

    from etl_expenses_spark.operators.imagecodec import decode_image, encode_ppm
    from etl_expenses_spark.operators.multimodal import resize_images

    red = np.full((4, 4, 3), [255, 0, 0], dtype=np.uint8)
    green = np.full((6, 2, 3), [0, 255, 0], dtype=np.uint8)
    rows = [
        Row(media_id=10, kind="image", payload=encode_ppm(red),
            meta=Row(width=4, height=4, sample_rate=None, n_frames=None, duration_ms=None)),
        Row(media_id=11, kind="image", payload=encode_ppm(green),
            meta=Row(width=2, height=6, sample_rate=None, n_frames=None, duration_ms=None)),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)

    feats = {r.media_id: r.feature for r in decode_and_featurize(media).collect()}
    assert feats[10][0] == 1.0 and feats[10][1] == 0.0  # solid red: mean R=1, G=0
    assert feats[11][1] == 1.0 and feats[11][0] == 0.0  # solid green

    out = {r.media_id: r for r in resize_images(media, width=8, height=8).collect()}
    for mid, src in ((10, red), (11, green)):
        arr = decode_image(bytes(out[mid].payload))
        assert arr is not None and arr.shape == (8, 8, 3)
        assert (arr == src[0, 0]).all()  # solid color preserved exactly
        assert (out[mid].meta.width, out[mid].meta.height) == (8, 8)


def test_real_jpeg_path_through_spark_stages(spark):
    """Baseline JPEG payloads take the REAL decode path end-to-end: the
    featurizer reads actual pixel statistics (not the digest fake) and
    resize decodes the JPEG, resamples, and re-encodes a decodable PPM."""
    import numpy as np
    from pyspark.sql import Row

    from etl_expenses_spark.operators.imagecodec import decode_image
    from etl_expenses_spark.operators.jpegcodec import encode_jpeg
    from etl_expenses_spark.operators.multimodal import resize_images

    blue = np.full((24, 16, 3), [0, 0, 255], dtype=np.uint8)
    jpg = encode_jpeg(blue, quality=90)
    rows = [
        Row(media_id=30, kind="image", payload=jpg,
            meta=Row(width=16, height=24, sample_rate=None, n_frames=None,
                     duration_ms=None)),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)

    feats = {r.media_id: r.feature for r in decode_and_featurize(media).collect()}
    # solid blue: mean B ~ 1, mean R/G ~ 0 (within JPEG rounding)
    assert feats[30][2] > 0.98 and feats[30][0] < 0.02 and feats[30][1] < 0.02

    out = {r.media_id: r for r in resize_images(media, width=8, height=8).collect()}
    arr = decode_image(bytes(out[30].payload))
    assert arr is not None and arr.shape == (8, 8, 3)
    assert (np.abs(arr.astype(int) - blue[0, 0].astype(int)).max()) <= 1


def test_audio_chunk_windows_and_bounds(spark):
    from etl_expenses_spark.operators.multimodal import audio_chunk

    out = audio_chunk(_media(spark), chunk_ms=5000).collect()
    # 12500ms track -> chunks [0,5000) [5000,10000) [10000,12500)
    assert [(r.chunk_no, r.start_ms, r.end_ms) for r in sorted(out, key=lambda r: r.chunk_no)] == [
        (0, 0, 5000), (1, 5000, 10000), (2, 10000, 12500)
    ]
    assert all(r.media_id == 2 for r in out)       # only the audio row
    assert len({bytes(r.chunk) for r in out}) == 3  # chunk payloads distinct


def test_audiocodec_wav_roundtrip_and_features():
    """Real audio codec unit coverage: encode/decode is bit-exact, tone
    features reflect signal content (RMS, ZCR, spectral centroid)."""
    import numpy as np

    from etl_expenses_spark.operators.audiocodec import (
        audio_features,
        decode_wav,
        encode_wav,
        make_tone,
        slice_wav,
    )

    rng = np.random.default_rng(7)
    samples = rng.integers(-32768, 32767, size=(1600, 2), dtype=np.int16)
    decoded = decode_wav(encode_wav(samples, 8000))
    assert decoded is not None
    out, rate = decoded
    assert rate == 8000 and np.array_equal(out, samples)

    tone = decode_wav(make_tone(440.0, 1000, sample_rate=16000))
    assert tone is not None
    sig, rate = tone
    assert sig.shape == (16000, 1)
    rms, peak, zcr, centroid, low_share, dur_s, ch, dc = audio_features(sig, rate)
    assert abs(rms - 0.5 / 2**0.5) < 0.01      # sine RMS = A/sqrt(2)
    assert abs(zcr - 2 * 440 / 16000) < 0.005  # 2 crossings per cycle
    assert abs(centroid - 440 / 8000) < 0.01   # centroid at the tone, /Nyquist
    assert low_share > 0.99                    # 440 Hz < 1 kHz band
    assert dur_s == 1.0 and ch == 1.0 and abs(dc) < 1e-3

    # chunk slices tile the track exactly
    parts = [slice_wav(sig, rate, s, min(s + 300, 1000)) for s in range(0, 1000, 300)]
    assert np.array_equal(np.concatenate(parts), sig)

    assert decode_wav(b"RIFFxxxxWAVE") is None
    assert decode_wav(b"not audio at all") is None


def test_g711_companded_wav_decode():
    """u-law/A-law WAV (G.711, formats 7/6) decode through the same
    decode_wav entry: roundtrip error is bounded by the top-segment
    quantization step, re-encoding a decoded signal is a fixpoint, and
    the chunker consumes companded payloads like any PCM WAV."""
    import numpy as np

    from etl_expenses_spark.operators.audiocodec import (
        decode_wav,
        duration_ms,
        encode_g711_wav,
    )

    x = (np.sin(np.arange(8000) * 0.07) * 24000).astype(np.int16)
    for law in ("ulaw", "alaw"):
        wav = encode_g711_wav(x, 8000, law)
        dec = decode_wav(wav)
        assert dec is not None
        y, rate = dec
        assert rate == 8000 and y.shape == (8000, 1)
        err = np.abs(y[:, 0].astype(np.int32) - x.astype(np.int32))
        assert err.max() <= 512  # top-segment step / 2 for both laws
        # companding fixpoint: decoded levels re-encode to themselves
        y2, _ = decode_wav(encode_g711_wav(y[:, 0], 8000, law))
        assert np.array_equal(y, y2)
        assert duration_ms(y, rate) == 1000
    # stereo + truncated payloads stay well-behaved
    st = np.stack([x[:100], -x[:100]], axis=1)
    wav = encode_g711_wav(st, 8000, "ulaw")
    y, _ = decode_wav(wav)
    assert y.shape == (100, 2)
    assert decode_wav(wav[:50]) is None or True  # never raises


def test_ima_adpcm_wav_decode():
    """IMA/DVI ADPCM WAV (format 0x11) through the same decode_wav entry.
    Pins: (1) the block-vectorized decoder is BIT-EXACT against an
    independent scalar reference implementation of the spec recurrence;
    (2) encode→decode tracks a tone within normal ADPCM error (~30 dB
    SNR); (3) stereo word-interleave keeps channels separated; (4) the
    container probe reports the fact-chunk sample count, not block count."""
    import numpy as np

    from etl_expenses_spark.operators.audiocodec import (
        _IMA_INDEX,
        _IMA_STEP,
        decode_ima_adpcm,
        decode_wav,
        encode_ima_adpcm_wav,
    )
    from etl_expenses_spark.operators.containers import probe_bytes

    def ref_decode(pcm, channels, block_align):
        n_blocks = len(pcm) // block_align
        out = []
        for bi in range(n_blocks):
            blk = pcm[bi * block_align : (bi + 1) * block_align]
            state = []
            for ch in range(channels):
                pred = int.from_bytes(blk[4 * ch : 4 * ch + 2], "little", signed=True)
                state.append([pred, min(max(blk[4 * ch + 2], 0), 88), [pred]])
            body = blk[4 * channels :]
            nibs = {ch: [] for ch in range(channels)}
            for wi in range(len(body) // 4):
                for b in body[wi * 4 : wi * 4 + 4]:
                    nibs[wi % channels] += [b & 0xF, b >> 4]
            for ch in range(channels):
                pred, idx, seq = state[ch]
                for nb in nibs[ch]:
                    step = int(_IMA_STEP[idx])
                    diff = step >> 3
                    if nb & 1:
                        diff += step >> 2
                    if nb & 2:
                        diff += step >> 1
                    if nb & 4:
                        diff += step
                    if nb & 8:
                        diff = -diff
                    pred = max(-32768, min(32767, pred + diff))
                    idx = max(0, min(88, idx + int(_IMA_INDEX[nb & 7])))
                    seq.append(pred)
                state[ch] = [pred, idx, seq]
            for t in range(len(state[0][2])):
                out.append([state[ch][2][t] for ch in range(channels)])
        return np.array(out, dtype=np.int16)

    def data_chunk(wav):
        pos = 12
        while pos + 8 <= len(wav):
            cid = wav[pos : pos + 4]
            csz = int.from_bytes(wav[pos + 4 : pos + 8], "little")
            if cid == b"data":
                return wav[pos + 8 : pos + 8 + csz]
            pos += 8 + csz + (csz & 1)
        raise AssertionError("no data chunk")

    t = np.arange(4000) / 8000.0
    sig = np.round(10000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    wav = encode_ima_adpcm_wav(sig, 8000)
    dec, rate = decode_wav(wav)
    assert rate == 8000
    err = np.abs(dec[:4000, 0].astype(np.int32) - sig.astype(np.int32))
    snr = 10 * np.log10((sig.astype(float) ** 2).mean() / (err.astype(float) ** 2).mean())
    assert snr > 25.0 and err.max() < 1500
    assert np.array_equal(decode_ima_adpcm(data_chunk(wav), 1, 256), ref_decode(data_chunk(wav), 1, 256))

    l = np.round(8000 * np.sin(2 * np.pi * 300 * t)).astype(np.int16)
    r = np.round(6000 * np.sin(2 * np.pi * 1200 * t)).astype(np.int16)
    wavs = encode_ima_adpcm_wav(np.stack([l, r], axis=1), 16000)
    decs, _ = decode_wav(wavs)
    assert np.abs(decs[:4000, 0].astype(np.int32) - l.astype(np.int32)).max() < 1500
    assert np.abs(decs[:4000, 1].astype(np.int32) - r.astype(np.int32)).max() < 1500
    assert np.array_equal(decode_ima_adpcm(data_chunk(wavs), 2, 512), ref_decode(data_chunk(wavs), 2, 512))

    probe = probe_bytes(wav)
    assert (probe["codec"], probe["n_frames"], probe["duration_ms"]) == (
        "ima_adpcm",
        4000,
        500,
    )
    # truncated payloads never raise
    for cut in (0, 10, 45, 100, len(wav) - 3):
        decode_wav(wav[:cut])


def test_ima_adpcm_encoder_rejects_misaligned_block_align():
    # r5 ADVICE: the encoder must validate block_align geometry up front
    # (same check as the decoder) instead of dying in the nibble packing
    # with a numpy shape mismatch.
    import numpy as np
    import pytest

    from etl_expenses_spark.operators.audiocodec import encode_ima_adpcm_wav

    sig = np.zeros(100, dtype=np.int16)
    for bad in (10, 6, 4, 3):  # (bad - 4) % 4 != 0 or no data bytes
        with pytest.raises(ValueError, match="block_align"):
            encode_ima_adpcm_wav(sig, 8000, block_align=bad)
    with pytest.raises(ValueError, match="block_align"):
        encode_ima_adpcm_wav(
            np.zeros((100, 2), dtype=np.int16), 8000, block_align=12
        )  # stereo: (12 - 8) % 8 != 0
    # word-aligned geometries still encode fine
    assert encode_ima_adpcm_wav(sig, 8000, block_align=12)[:4] == b"RIFF"
    assert (
        encode_ima_adpcm_wav(
            np.zeros((100, 2), dtype=np.int16), 8000, block_align=16
        )[:4]
        == b"RIFF"
    )


def test_extract_media_tags_through_spark(spark):
    """The audio-lake metadata table: (media_id, key, value) rows from
    ID3v2 MP3, tagged FLAC, and OpusTags Ogg payloads through the
    Arrow-batched mapInPandas stage; untagged payloads contribute no
    rows."""
    from pyspark.sql import Row

    from etl_expenses_spark.operators.containers import (
        encode_flac_streaminfo,
        encode_id3v2_tags,
        encode_minimal_ogg,
        encode_mp3_frames,
        extract_media_tags,
    )

    rows = [
        Row(media_id=1,
            payload=encode_id3v2_tags({"title": "Uno", "artist": "A"})
            + encode_mp3_frames(3, 128, 44100)),
        Row(media_id=2,
            payload=encode_flac_streaminfo(48000, 48000, tags={"title": "Dos"})),
        Row(media_id=3,
            payload=encode_minimal_ogg(1000, "opus", tags={"artist": "Tres"})),
        Row(media_id=4, payload=encode_mp3_frames(3, 64, 44100)),  # untagged
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {(r.media_id, r.key, r.value) for r in extract_media_tags(media).collect()}
    assert got == {
        (1, "title", "Uno"),
        (1, "artist", "A"),
        (2, "title", "Dos"),
        (3, "artist", "Tres"),
    }


def test_videocodec_y4m_roundtrip():
    """Real video codec unit coverage: luma roundtrip across colorspaces,
    PGM frame encode feeds the image decoder, corrupt streams refuse."""
    import numpy as np

    from etl_expenses_spark.operators.imagecodec import decode_image
    from etl_expenses_spark.operators.videocodec import (
        decode_y4m,
        encode_pgm,
        encode_y4m,
        video_features,
    )

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, size=(5, 6, 8), dtype=np.uint8)
    for cs in (b"420", b"422", b"444", b"mono"):
        decoded = decode_y4m(encode_y4m(frames, chroma=cs))
        assert decoded is not None, cs
        stack, w, h = decoded
        assert (w, h) == (8, 6) and np.array_equal(stack, frames), cs

    pgm = encode_pgm(frames[0])
    img = decode_image(pgm)
    assert img is not None and np.array_equal(img[:, :, 0], frames[0])
    assert np.array_equal(img[:, :, 0], img[:, :, 2])  # replicated channels

    feats = video_features(frames, 8, 6)
    assert len(feats) == 8 and feats[5] == 5.0 and feats[4] == 8 / 6

    data = encode_y4m(frames)
    assert decode_y4m(data[: len(data) - 10]) is None  # truncated frame
    assert decode_y4m(b"YUV4MPEG2 W0 H0\n") is None
    assert decode_y4m(b"not video") is None


def test_real_audio_video_paths_through_spark_stages(spark):
    """WAV and Y4M payloads take the REAL paths in the mapInPandas stages:
    audio chunks are playable WAVs that tile the source track, sampled
    frames are pixel-exact PGMs, and featurize dispatches per modality."""
    import numpy as np
    from pyspark.sql import Row

    from etl_expenses_spark.operators.audiocodec import decode_wav, make_tone
    from etl_expenses_spark.operators.multimodal import audio_chunk
    from etl_expenses_spark.operators.videocodec import encode_y4m
    from etl_expenses_spark.operators.imagecodec import decode_image

    wav = make_tone(440.0, 12500, sample_rate=8000)
    frames = np.arange(25 * 4 * 4, dtype=np.uint64).reshape(25, 4, 4)
    y4m = encode_y4m((frames % 256).astype(np.uint8))
    rows = [
        Row(media_id=20, kind="audio", payload=wav,
            meta=Row(width=None, height=None, sample_rate=8000, n_frames=None,
                     duration_ms=None)),  # duration comes from the samples
        Row(media_id=21, kind="video", payload=y4m,
            meta=Row(width=4, height=4, sample_rate=None, n_frames=None,
                     duration_ms=None)),  # frame count comes from the stream
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)

    chunks = sorted(audio_chunk(media, chunk_ms=5000).collect(),
                    key=lambda r: r.chunk_no)
    assert [(r.chunk_no, r.start_ms, r.end_ms) for r in chunks] == [
        (0, 0, 5000), (1, 5000, 10000), (2, 10000, 12500)]
    src, rate = decode_wav(wav)
    parts = [decode_wav(bytes(r.chunk)) for r in chunks]
    assert all(p is not None and p[1] == rate for p in parts)
    assert np.array_equal(np.concatenate([p[0] for p in parts]), src)

    sampled = sorted(frame_sample(media, every_n=10).collect(),
                     key=lambda r: r.frame_no)
    assert [r.frame_no for r in sampled] == [0, 10, 20]
    for r in sampled:
        img = decode_image(bytes(r.frame))
        assert img is not None
        assert np.array_equal(img[:, :, 0],
                              (frames[r.frame_no] % 256).astype(np.uint8))

    feats = {r.media_id: r.feature for r in decode_and_featurize(media).collect()}
    assert abs(feats[20][5] - 12.5) < 1e-9   # audio: duration_s feature slot
    assert feats[21][5] == 25.0              # video: frame-count feature slot


def test_aiff_decode_and_featurize_path():
    """AIFF big-endian PCM: lossless roundtrip, features bit-identical to
    the same signal as little-endian WAV (endianness fully transparent),
    stereo interleave preserved, truncations never raise, and the
    container probe reports rate/duration."""
    import numpy as np

    from etl_expenses_spark.operators.audiocodec import (
        audio_features,
        decode_aiff,
        decode_wav,
        encode_aiff,
        encode_wav,
    )
    from etl_expenses_spark.operators.containers import probe_bytes
    from etl_expenses_spark.operators.multimodal import _feature_of

    t = np.arange(4000) / 8000.0
    sig = np.round(10000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    aiff = encode_aiff(sig, 8000)
    dec, rate = decode_aiff(aiff)
    assert rate == 8000 and np.array_equal(dec[:, 0], sig)
    assert audio_features(dec, rate) == audio_features(
        *decode_wav(encode_wav(sig, 8000))
    )
    assert _feature_of(aiff) == audio_features(dec, rate)  # dispatch wired
    st = np.stack([sig, -sig], axis=1)
    d2, _ = decode_aiff(encode_aiff(st, 16000))
    assert np.array_equal(d2, st)
    p = probe_bytes(aiff)
    assert (p["container"], p["sample_rate"], p["duration_ms"]) == (
        "aiff", 8000, 500,
    )
    for cut in range(0, len(aiff), 9):
        decode_aiff(aiff[:cut])
