"""Snappy block-format codec (operators/snappy.py) — spec pins.

No python-snappy exists in this container to cross-check against, so
correctness rests on (a) hand-assembled tag streams from the public format
description (literal, copy-1/2/4, overlapping RLE copy), (b) roundtrip
properties over adversarial inputs, and (c) the Avro spec's CRC-checked
snappy block integration.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_expenses_spark.operators.snappy import compress, decompress


# ---------------------------------------------------- hand-built vectors
def test_decode_literal_only():
    # preamble 5, tag (5-1)<<2 = literal of 5 bytes
    assert decompress(bytes([5, 4 << 2]) + b"hello") == b"hello"


def test_decode_copy1_rle():
    # "ab" literal then copy-1: offset 2, length 6 -> "abababab"
    blob = bytes([8, 1 << 2]) + b"ab" + bytes([((6 - 4) << 2) | 0x01, 2])
    assert decompress(blob) == b"abababab"


def test_decode_copy2():
    lit = b"0123456789"
    # copy-2: length 10, offset 10 -> doubles the literal
    blob = bytes([20, 9 << 2]) + lit + bytes([(10 - 1) << 2 | 0x02, 10, 0])
    assert decompress(blob) == lit * 2


def test_decode_copy4():
    lit = b"xy"
    blob = bytes([4, 1 << 2]) + lit + bytes([(2 - 1) << 2 | 0x03, 2, 0, 0, 0])
    assert decompress(blob) == b"xyxy"


def test_decode_single_byte_rle():
    # overlap smaller than length: offset 1, length 7 after 1-byte literal
    blob = bytes([8, 0]) + b"z" + bytes([(7 - 1) << 2 | 0x02, 1, 0])
    assert decompress(blob) == b"z" * 8


def test_length_mismatch_and_bad_offset_raise():
    with pytest.raises(ValueError, match="declared"):
        decompress(bytes([9, 4 << 2]) + b"hello")
    with pytest.raises(ValueError, match="offset"):
        decompress(bytes([4, 0]) + b"a" + bytes([(2 - 1) << 2 | 0x02, 9, 0]))


# ----------------------------------------------------------- roundtrips
@given(st.binary(max_size=4096))
@settings(max_examples=120, deadline=None)
def test_roundtrip_random(data):
    assert decompress(compress(data)) == data


@given(st.binary(min_size=1, max_size=24), st.integers(2, 600))
@settings(max_examples=60, deadline=None)
def test_roundtrip_repetitive_compresses(chunk, reps):
    data = chunk * reps
    blob = compress(data)
    assert decompress(blob) == data
    if len(data) > 256:
        assert len(blob) < len(data)  # matches actually found


def test_long_match_splitting():
    data = b"A" * 10000
    blob = compress(data)
    assert decompress(blob) == data
    assert len(blob) < 700


# ------------------------------------------------------ avro integration
def test_avro_snappy_block_roundtrip_and_crc():
    from etl_expenses_spark.operators.avrocodec import read_avro, write_avro

    schema = {"type": "record", "name": "R",
              "fields": [{"name": "s", "type": "string"}]}
    recs = [{"s": "the same string " * 4} for _ in range(300)]
    data = write_avro(recs, schema, codec="snappy", block_records=64)
    got_schema, back = read_avro(data)
    assert back == recs
    # flip one payload byte -> CRC (or decode) must fail loudly
    mid = len(data) // 2
    corrupt = data[:mid] + bytes([data[mid] ^ 0x01]) + data[mid + 1 :]
    with pytest.raises(ValueError):
        read_avro(corrupt)


# ------------------------------------------------------- framing format
def test_crc32c_known_vector():
    from etl_expenses_spark.operators.snappy import crc32c

    assert crc32c(b"123456789") == 0xE3069283  # the standard check value
    assert crc32c(b"") == 0


@given(st.binary(max_size=200000))
@settings(max_examples=20, deadline=None)
def test_frame_roundtrip(data):
    from etl_expenses_spark.operators.snappy import (
        frame_compress,
        frame_decompress,
    )

    assert frame_decompress(frame_compress(data)) == data


def test_frame_chunk_crc_and_padding():
    from etl_expenses_spark.operators.snappy import (
        FRAME_MAGIC,
        frame_compress,
        frame_decompress,
    )

    data = b"abc" * 100
    blob = bytearray(frame_compress(data))
    # inject a padding chunk (0xfe) mid-stream: must be skipped
    pad = bytes([0xFE, 3, 0, 0]) + b"xxx"
    blob2 = bytes(blob[: len(FRAME_MAGIC)]) + pad + bytes(blob[len(FRAME_MAGIC) :])
    assert frame_decompress(blob2) == data
    # corrupt one payload byte: CRC must catch it
    blob[-1] ^= 0x01
    with pytest.raises(ValueError, match="CRC|offset|declared|truncated"):
        frame_decompress(bytes(blob))
    # unskippable reserved chunk: must raise
    bad = bytes(blob2[: len(FRAME_MAGIC)]) + bytes([0x02, 1, 0, 0, 0])
    with pytest.raises(ValueError, match="unskippable"):
        frame_decompress(bad)


def test_frame_census_dispatch():
    from etl_expenses_spark.operators.containers import probe_bytes
    from etl_expenses_spark.operators.snappy import frame_compress

    blob = frame_compress(b"payload " * 50000)  # > 6 chunks
    got = probe_bytes(blob)
    assert got["container"] == "snappy-frame"
    assert got["codec"] == "snappy"
    assert got["n_frames"] == -(-400000 // 65536)
