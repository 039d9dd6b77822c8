"""Avro object-container codec (operators/avrocodec.py) — spec pins.

No avro/fastavro package exists in this container to cross-check against,
so correctness rests on (a) the spec's own zigzag test vectors, (b)
property-based roundtrips over the full supported type lattice, and (c)
torn-file / corruption behavior. The census integration (probe_bytes) and
the Spark-side roundtrip are pinned in the oracle-checked
`avro_roundtrip_orders` query.
"""

from __future__ import annotations

import io

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_expenses_spark.operators.avrocodec import (
    MAGIC,
    probe_avro,
    read_avro,
    read_long,
    write_avro,
    write_long,
    zigzag_encode,
)

SCHEMA = {
    "type": "record",
    "name": "T",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": "string"},
        {"name": "c", "type": "double"},
        {"name": "d", "type": ["null", "string"]},
        {"name": "e", "type": "boolean"},
        {"name": "f", "type": "bytes"},
        {"name": "g", "type": "int"},
        {"name": "h", "type": "float"},
    ],
}


def test_zigzag_spec_vectors():
    # Avro spec, "Binary Encoding / Primitive Types" example table
    assert [zigzag_encode(n) for n in (0, -1, 1, -2, 2, -64, 64)] == [
        0, 1, 2, 3, 4, 127, 128,
    ]


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=300)
def test_varint_roundtrip(n):
    out = io.BytesIO()
    write_long(out, n)
    got, pos = read_long(memoryview(out.getvalue()), 0)
    assert got == n and pos == len(out.getvalue())


_REC = st.fixed_dictionaries(
    {
        "a": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "b": st.text(max_size=40),
        "c": st.floats(allow_nan=False),
        "d": st.none() | st.text(max_size=10),
        "e": st.booleans(),
        "f": st.binary(max_size=30),
        "g": st.integers(min_value=-(2**31), max_value=2**31 - 1),
        # float32 field: values exactly representable in binary32
        "h": st.sampled_from([0.0, -0.0, 1.5, -2.25, 2.0**100, -(2.0**-100)]),
    }
)


@given(st.lists(_REC, max_size=25), st.sampled_from(["null", "deflate"]))
@settings(max_examples=60, deadline=None)
def test_container_roundtrip(recs, codec):
    data = write_avro(recs, SCHEMA, codec=codec, block_records=7)
    schema, back = read_avro(data)
    assert schema == SCHEMA
    assert back == recs


def test_probe_counts_without_decoding():
    recs = [{"a": i, "b": "x", "c": 0.5, "d": None, "e": True,
             "f": b"", "g": 1, "h": 1.0} for i in range(533)]
    data = write_avro(recs, SCHEMA, codec="deflate", block_records=100)
    p = probe_avro(data)
    assert p == {
        "container": "avro",
        "codec": "deflate",
        "schema_name": "T",
        "n_fields": 8,
        "n_records": 533,
        "n_blocks": 6,
    }


def test_probe_torn_tail_is_lenient_reader_raises():
    recs = [{"a": i, "b": "y" * 50, "c": 1.0, "d": "z", "e": False,
             "f": b"\x00" * 20, "g": 0, "h": 0.0} for i in range(400)]
    data = write_avro(recs, SCHEMA, codec="null", block_records=50)
    torn = data[: len(data) * 2 // 3]
    p = probe_avro(torn)
    assert p is not None and 0 < p["n_records"] < 400
    with pytest.raises(ValueError):
        read_avro(torn)


def test_sync_marker_mismatch_raises():
    recs = [{"a": 1, "b": "q", "c": 2.0, "d": None, "e": True,
             "f": b"ab", "g": 3, "h": 4.0}]
    data = bytearray(write_avro(recs, SCHEMA, codec="null"))
    data[-1] ^= 0xFF  # corrupt the trailing sync marker
    with pytest.raises(ValueError, match="sync"):
        read_avro(bytes(data))


def test_bad_magic_and_unknown_codec():
    assert probe_avro(b"NOPE" + b"\x00" * 64) is None
    with pytest.raises(ValueError, match="magic"):
        read_avro(b"NOPE" + b"\x00" * 64)
    with pytest.raises(ValueError, match="codec"):
        write_avro([], SCHEMA, codec="zstandard")


def test_census_dispatch_recognizes_avro():
    from etl_expenses_spark.operators.containers import probe_bytes

    recs = [{"a": 1, "b": "w", "c": 0.0, "d": None, "e": False,
             "f": b"", "g": 0, "h": 0.0}] * 12
    data = write_avro(recs, SCHEMA, codec="deflate")
    assert data[:4] == MAGIC
    got = probe_bytes(data)
    assert got["container"] == "avro"
    assert got["codec"] == "deflate"
    assert got["n_frames"] == 12


def test_decimal_logical_type_roundtrip():
    from decimal import Decimal

    dec_schema = {
        "type": "record", "name": "M",
        "fields": [
            {"name": "amount",
             "type": {"type": "bytes", "logicalType": "decimal",
                      "precision": 18, "scale": 2}},
            {"name": "opt",
             "type": ["null", {"type": "bytes", "logicalType": "decimal",
                               "precision": 10, "scale": 4}]},
        ],
    }
    recs = [
        {"amount": Decimal("0.00"), "opt": None},
        {"amount": Decimal("-0.01"), "opt": Decimal("123.4567")},
        {"amount": Decimal("123456789012345.67"), "opt": Decimal("-0.0001")},
        {"amount": Decimal("-128.00"), "opt": Decimal("1.2800")},  # 0x80 edges
        {"amount": Decimal("1.28"), "opt": Decimal("-655.3600")},
    ]
    data = write_avro(recs, dec_schema, codec="deflate")
    schema, back = read_avro(data)
    assert back == recs
    # encoding is the MINIMAL two's-complement form: -0.01 -> unscaled -1
    # must serialize to exactly one byte 0xFF
    import io as _io

    from etl_expenses_spark.operators.avrocodec import _write_datum

    buf = _io.BytesIO()
    _write_datum(buf, dec_schema["fields"][0]["type"], Decimal("-0.01"))
    assert buf.getvalue() == b"\x02\xff"  # length 1 (zigzag 2) + 0xFF
    buf = _io.BytesIO()
    _write_datum(buf, dec_schema["fields"][0]["type"], Decimal("1.28"))
    assert buf.getvalue() == b"\x04\x00\x80"  # 128 needs a sign byte


def test_schema_resolution_rules():
    """Spec §Schema Resolution: name matching, defaults, promotions,
    drops, and the illegal-narrowing error."""
    from etl_expenses_spark.operators.avrocodec import (
        read_avro_resolved,
        resolve_record,
    )

    old = {"type": "record", "name": "R", "fields": [
        {"name": "id", "type": "int"},
        {"name": "name", "type": "string"}]}
    new = {"type": "record", "name": "R", "fields": [
        {"name": "id", "type": "long"},                      # int -> long
        {"name": "name", "type": "bytes"},                   # string -> bytes
        {"name": "score", "type": ["null", "double"]},       # added nullable
        {"name": "tag", "type": "string", "default": "none"}]}  # w/ default
    data = write_avro([{"id": 7, "name": "a"}], old)
    assert read_avro_resolved(data, new) == [
        {"id": 7, "name": b"a", "score": None, "tag": "none"}
    ]
    # newer writer -> older reader: extra fields drop, but long->int must
    # refuse (illegal narrowing)
    data2 = write_avro(
        [{"id": 9, "name": b"x", "score": 1.5, "tag": "t"}], new
    )
    with pytest.raises(ValueError, match="long -> reader int"):
        read_avro_resolved(data2, old)
    # float widening and bytes->string
    w = {"type": "record", "name": "R", "fields": [
        {"name": "x", "type": "float"}, {"name": "b", "type": "bytes"}]}
    r = {"type": "record", "name": "R", "fields": [
        {"name": "x", "type": "double"}, {"name": "b", "type": "string"}]}
    assert resolve_record({"x": 1.5, "b": b"hi"}, w, r) == {"x": 1.5, "b": "hi"}
    # reader-only field without default and not nullable: error
    r2 = {"type": "record", "name": "R", "fields": [
        {"name": "x", "type": "double"}, {"name": "zz", "type": "long"}]}
    with pytest.raises(ValueError, match="no default"):
        resolve_record({"x": 1.0, "b": b""}, w, r2)


@given(st.lists(_REC, max_size=25), st.sampled_from(["null", "deflate"]))
@settings(max_examples=60, deadline=None)
def test_columnar_writer_byte_identical_and_columnar_reader_agrees(recs, codec):
    """r12 columnar fast path (VERDICT r11 #5): the numpy-vectorized
    writer must produce BYTE-IDENTICAL containers to the per-record
    reference writer (same blocks, same varints), and the compiled
    column reader must decode to exactly the reference reader's values —
    the per-record path IS the property-test twin."""
    from etl_expenses_spark.operators.avrocodec import (
        read_avro_columns,
        write_avro_columnar,
    )

    ref = write_avro(recs, SCHEMA, codec=codec, block_records=7)
    cols_in = {
        f["name"]: [r[f["name"]] for r in recs] for f in SCHEMA["fields"]
    }
    fast = (
        write_avro_columnar(cols_in, SCHEMA, codec=codec, block_records=7)
        if recs
        else None
    )
    if recs:
        assert fast == ref
    _, ref_records = read_avro(ref)
    _, cols = read_avro_columns(ref)
    for f in SCHEMA["fields"]:
        name = f["name"]
        got = cols[name]
        want = [r[name] for r in ref_records]
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g == w or (g != g and w != w)  # NaN-tolerant


def test_columnar_reader_falls_back_on_nested_schema():
    """Non-flat schemas (here: decimal logical type) take the reference
    decode path and still return columns."""
    from etl_expenses_spark.operators.avrocodec import read_avro_columns

    sch = {"type": "record", "name": "D", "fields": [
        {"name": "v", "type": {"type": "bytes", "logicalType": "decimal",
                               "precision": 10, "scale": 2}}]}
    from decimal import Decimal

    data = write_avro([{"v": Decimal("12.34")}, {"v": Decimal("-0.07")}], sch)
    _, cols = read_avro_columns(data)
    assert cols["v"] == [Decimal("12.34"), Decimal("-0.07")]
