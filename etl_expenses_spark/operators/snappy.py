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


# ---------------------------------------------------------------------------
# Snappy FRAMING format (.sz) — the streamable chunked wrapper
# (framing_format.txt in the same public repo): a stream-identifier chunk
# followed by compressed/uncompressed data chunks of <= 64 KiB, each
# carrying a masked CRC32C (Castagnoli) of its uncompressed content.
# ---------------------------------------------------------------------------

FRAME_MAGIC = b"\xff\x06\x00\x00sNaPpY"
_MAX_CHUNK = 65536
_CRC32C_TABLE = None


def _crc32c_table():
    global _CRC32C_TABLE
    if _CRC32C_TABLE is None:
        poly = 0x82F63B78  # reflected Castagnoli
        tbl = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            tbl.append(c)
        _CRC32C_TABLE = tbl
    return _CRC32C_TABLE


def crc32c(data: bytes) -> int:
    tbl = _crc32c_table()
    c = 0xFFFFFFFF
    for b in data:
        c = tbl[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def frame_compress(data: bytes) -> bytes:
    out = bytearray(FRAME_MAGIC)
    for i in range(0, len(data), _MAX_CHUNK) or [0]:
        chunk = data[i : i + _MAX_CHUNK]
        crc = _masked_crc(chunk).to_bytes(4, "little")
        comp = compress(chunk)
        if len(comp) < len(chunk):  # spec: emit whichever is smaller
            body = crc + comp
            out.append(0x00)
        else:
            body = crc + chunk
            out.append(0x01)
        out += len(body).to_bytes(3, "little")
        out += body
    return bytes(out)


def frame_decompress(data: bytes) -> bytes:
    if data[: len(FRAME_MAGIC)] != FRAME_MAGIC:
        raise ValueError("snappy-frame: bad stream identifier")
    pos = len(FRAME_MAGIC)
    out = bytearray()
    n = len(data)
    while pos < n:
        if pos + 4 > n:
            raise ValueError("snappy-frame: truncated chunk header")
        kind = data[pos]
        ln = int.from_bytes(data[pos + 1 : pos + 4], "little")
        pos += 4
        if pos + ln > n:
            raise ValueError("snappy-frame: truncated chunk body")
        body = data[pos : pos + ln]
        pos += ln
        if kind in (0x00, 0x01):
            if ln < 4:
                raise ValueError("snappy-frame: chunk too short for CRC")
            crc = int.from_bytes(body[:4], "little")
            chunk = decompress(body[4:]) if kind == 0x00 else bytes(body[4:])
            if len(chunk) > _MAX_CHUNK:
                raise ValueError("snappy-frame: chunk exceeds 64 KiB limit")
            if _masked_crc(chunk) != crc:
                raise ValueError("snappy-frame: chunk CRC mismatch")
            out += chunk
        elif kind == 0xFE or 0x80 <= kind <= 0xFD:
            continue  # padding / skippable
        elif kind == 0xFF:
            if body != FRAME_MAGIC[4:]:
                raise ValueError("snappy-frame: bad repeated identifier")
        else:  # 0x02-0x7f: unskippable reserved
            raise ValueError(f"snappy-frame: unskippable chunk 0x{kind:02x}")
    return bytes(out)


def probe_snappy_frame(data: bytes, max_chunks: int = 100000) -> dict | None:
    """Header + chunk-skip census: chunk counts and declared sizes WITHOUT
    CRC verification or decompression — O(#chunks). None on wrong magic;
    lenient on a torn tail."""
    if data[: len(FRAME_MAGIC)] != FRAME_MAGIC:
        return None
    pos = len(FRAME_MAGIC)
    n = len(data)
    n_chunks = n_compressed = n_uncompressed = 0
    while pos + 4 <= n and n_chunks < max_chunks:
        kind = data[pos]
        ln = int.from_bytes(data[pos + 1 : pos + 4], "little")
        if pos + 4 + ln > n:
            break
        pos += 4 + ln
        n_chunks += 1
        if kind == 0x00:
            n_compressed += 1
        elif kind == 0x01:
            n_uncompressed += 1
    return {
        "container": "snappy-frame",
        "codec": "snappy",
        "n_chunks": n_chunks,
        "n_compressed": n_compressed,
        "n_uncompressed": n_uncompressed,
    }
