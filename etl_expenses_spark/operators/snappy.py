"""Snappy block-format codec — pure Python, from the public format spec.

Implements Google's Snappy compressed block format
(https://github.com/google/snappy/blob/main/format_description.txt): a
varint uncompressed-length preamble followed by a tag stream of literals
and back-references (copy-1/2/4). The container ships no python-snappy, and
Snappy is the default block codec of half the Avro/Parquet lakes in the
wild — this module backs the ``snappy`` codec of operators/avrocodec.py
(which, per the Avro spec, suffixes each compressed block with the CRC32 of
the uncompressed data).

The compressor is a greedy LZ77 with a 4-byte hash table — the same
strategy as the reference C++ implementation's fast path. Any output it
produces is validated by the decompressor in the round-trip property tests;
an all-literals stream is also valid Snappy, so correctness never depends
on finding matches.
"""

from __future__ import annotations

_MAX_OFFSET = 65535  # we never emit copy-4; offsets fit copy-2's 16 bits


def _write_uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    n = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("snappy: truncated varint")
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy: varint too long")


def _emit_literal(out: bytearray, chunk: bytes) -> None:
    n = len(chunk) - 1
    if n < 60:
        out.append(n << 2)
    elif n < 1 << 8:
        out.append(60 << 2)
        out.append(n)
    elif n < 1 << 16:
        out.append(61 << 2)
        out += n.to_bytes(2, "little")
    elif n < 1 << 24:
        out.append(62 << 2)
        out += n.to_bytes(3, "little")
    else:
        out.append(63 << 2)
        out += n.to_bytes(4, "little")
    out += chunk


def _emit_copy(out: bytearray, offset: int, length: int) -> None:
    # copy-2 handles any length 1..64 and 16-bit offsets; split longer runs
    while length > 64:
        out.append(((64 - 1) << 2) | 0x02)
        out += offset.to_bytes(2, "little")
        length -= 64
    if length >= 4 and length <= 11 and offset < 2048:
        # copy-1: 3-bit (len-4), 11-bit offset
        out.append(((offset >> 8) << 5) | ((length - 4) << 2) | 0x01)
        out.append(offset & 0xFF)
    else:
        out.append(((length - 1) << 2) | 0x02)
        out += offset.to_bytes(2, "little")


def compress(data: bytes) -> bytes:
    out = bytearray(_write_uvarint(len(data)))
    n = len(data)
    if n == 0:
        return bytes(out)
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    while i + 4 <= n:
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= _MAX_OFFSET and \
                data[cand : cand + 4] == key:
            # extend the match
            m = 4
            while i + m < n and data[cand + m] == data[i + m]:
                m += 1
            if lit_start < i:
                _emit_literal(out, data[lit_start:i])
            _emit_copy(out, i - cand, m)
            i += m
            lit_start = i
        else:
            i += 1
    if lit_start < n:
        _emit_literal(out, data[lit_start:])
    return bytes(out)


def decompress(data: bytes) -> bytes:
    ulen, pos = _read_uvarint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 0x03
        if kind == 0x00:  # literal
            ln = tag >> 2
            if ln >= 60:
                extra = ln - 59
                if pos + extra > n:
                    raise ValueError("snappy: truncated literal length")
                ln = int.from_bytes(data[pos : pos + extra], "little")
                pos += extra
            ln += 1
            if pos + ln > n:
                raise ValueError("snappy: truncated literal")
            out += data[pos : pos + ln]
            pos += ln
            continue
        if kind == 0x01:  # copy-1
            length = ((tag >> 2) & 0x07) + 4
            if pos >= n:
                raise ValueError("snappy: truncated copy-1")
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 0x02:  # copy-2
            length = (tag >> 2) + 1
            if pos + 2 > n:
                raise ValueError("snappy: truncated copy-2")
            offset = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy-4
            length = (tag >> 2) + 1
            if pos + 4 > n:
                raise ValueError("snappy: truncated copy-4")
            offset = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy: copy offset out of range")
        # overlapping copies are legal and meaningful (RLE): byte-at-a-time
        # when the ranges overlap, slice otherwise
        start = len(out) - offset
        if offset >= length:
            out += out[start : start + length]
        else:
            for k in range(length):
                out.append(out[start + k])
    if len(out) != ulen:
        raise ValueError(
            f"snappy: declared {ulen} bytes, decoded {len(out)}"
        )
    return bytes(out)
