"""Minimal pure-Python PDF text extraction (no binary dependencies).

Replaces the round-1 UTF-8-fixture fallback with a REAL extractor for the
common machine-generated-receipt shape the reference ingests with
pdfplumber/PyPDF2 (`/root/reference/transform_data_pdf/
lambda_function.py:14-26`): simple (non-CID) fonts, FlateDecode or
uncompressed content streams, text drawn with Tj / ' / TJ and line breaks
via Td/TD/T*/ET. That covers store-ticket and report PDFs — the documents
the pipeline actually parses. Out of scope (raise or skip gracefully):
encrypted files, CID/Type0 composite fonts with CMaps, object streams
(PDF 1.5 compressed xref) — a scanned-image PDF yields no text here just
as it does in pdfplumber.

Design note for the engine: this runs INSIDE mapInPandas workers
(parsers.py) — one Python call per document, Arrow-batched, so the
distributed shape is identical to the pdfplumber path; only the per-byte
decoder differs.
"""

from __future__ import annotations

import re
import zlib

# object body:  "12 0 obj ... endobj"
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
# stream payload inside an object body (after the dict)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)

# PDF string escapes: \n \r \t \b \f \( \) \\ \ooo and line-continuation
_ESCAPES = {
    ord("n"): "\n",
    ord("r"): "\r",
    ord("t"): "\t",
    ord("b"): "\b",
    ord("f"): "\f",
    ord("("): "(",
    ord(")"): ")",
    ord("\\"): "\\",
}


def _decode_pdf_string(raw: bytes) -> str:
    """Decode a (...)-literal's bytes: process escapes, then Latin-1 (the
    simple-font/WinAnsi case; good for the ASCII+accents receipts target)."""
    out: list[str] = []
    i = 0
    n = len(raw)
    while i < n:
        b = raw[i]
        if b == 0x5C and i + 1 < n:  # backslash
            nxt = raw[i + 1]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if 0x30 <= nxt <= 0x37:  # octal \ddd (1-3 digits)
                j = i + 1
                digits = b""
                while j < n and len(digits) < 3 and 0x30 <= raw[j] <= 0x37:
                    digits += bytes([raw[j]])
                    j += 1
                out.append(chr(int(digits, 8) & 0xFF))
                i = j
                continue
            if nxt in (0x0A, 0x0D):  # line continuation
                i += 2
                if nxt == 0x0D and i < n and raw[i] == 0x0A:
                    i += 1
                continue
            out.append(chr(nxt))
            i += 2
            continue
        out.append(chr(b))
        i += 1
    return "".join(out)


def _iter_literal_string(data: bytes, start: int) -> tuple[bytes, int]:
    """Scan a ( ... ) literal starting at ``start`` (which points at '(').
    Returns (raw inner bytes, index after the closing paren). Handles
    nested parens and backslash escapes per the PDF spec."""
    depth = 0
    i = start
    n = len(data)
    buf = bytearray()
    while i < n:
        b = data[i]
        if b == 0x5C and i + 1 < n:  # escaped char — copy verbatim
            buf += data[i : i + 2]
            i += 2
            continue
        if b == 0x28:  # (
            depth += 1
            if depth > 1:
                buf.append(b)
            i += 1
            continue
        if b == 0x29:  # )
            depth -= 1
            if depth == 0:
                return bytes(buf), i + 1
            buf.append(b)
            i += 1
            continue
        buf.append(b)
        i += 1
    return bytes(buf), n  # unterminated — be lenient


_HEX_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def _extract_stream_text(content: bytes) -> str:
    """Walk a decoded content stream and emit the text drawn by Tj / ' / TJ,
    inserting newlines on the line-advancing operators (Td, TD, T*, ', and
    ET blocks) — the same vertical-position heuristic pdfplumber's simple
    layout mode reduces to for single-column receipts."""
    out: list[str] = []
    pending: list[str] = []  # strings since the last operator
    i = 0
    n = len(content)

    def flush_line() -> None:
        if out and out[-1] != "\n":
            out.append("\n")

    while i < n:
        b = content[i]
        if b == 0x28:  # ( literal string
            raw, i = _iter_literal_string(content, i)
            pending.append(_decode_pdf_string(raw))
            continue
        if b == 0x3C:  # < hex string (but << is a dict)
            if i + 1 < n and content[i + 1] == 0x3C:
                i += 2
                continue
            m = _HEX_RE.match(content, i)
            if m:
                hx = re.sub(rb"\s", b"", m.group(1))
                if len(hx) % 2:
                    hx += b"0"
                pending.append(bytes.fromhex(hx.decode("ascii")).decode("latin-1"))
                i = m.end()
                continue
            i += 1
            continue
        m = _OP_RE.match(content, i)
        if m:
            op = m.group(0)
            if op == b"Tj":
                out.extend(pending)
            elif op == b"'":
                flush_line()
                out.extend(pending)
            elif op == b"TJ":
                out.extend(pending)  # kerning numbers were skipped by the scan
            elif op in (b"Td", b"TD", b"T*"):
                flush_line()
            elif op == b"ET":
                flush_line()
            pending.clear()
            i = m.end()
            continue
        i += 1
    return "".join(out)


_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b")


def _decode_object_stream(body: bytes) -> bytes | None:
    """Return the decoded stream payload of one object body, or None if the
    object has no stream / an unsupported filter.

    The payload is sliced by the dict's direct /Length when present —
    scanning for ``endstream`` alone is WRONG for compressed data, whose
    bytes can legitimately end in ``\\r``/``\\n`` that a permissive
    ``\\r?\\n endstream`` regex would steal (seen in practice: an adler32
    checksum ending 0x0A 0x0D). Indirect /Length (``N 0 R``) falls back to
    the regex scan."""
    kw = body.find(b"stream")
    if kw < 0:
        return None
    head = body[:kw]
    lm = _LENGTH_RE.search(head)
    if lm and b"R" not in body[lm.end() : lm.end() + 4]:
        start = kw + len(b"stream")
        if body[start : start + 2] == b"\r\n":
            start += 2
        elif body[start : start + 1] == b"\n":
            start += 1
        payload = body[start : start + int(lm.group(1))]
    else:
        sm = _STREAM_RE.search(body)
        if not sm:
            return None
        payload = sm.group(1)
    if b"/FlateDecode" in head:
        try:
            return zlib.decompress(payload)
        except zlib.error:
            return None
    if b"/Filter" in head:  # DCT/LZW/ASCII85… — image or unsupported
        return None
    return payload


def extract_text(data: bytes) -> str:
    """All text content of a PDF byte string, pages concatenated in object
    order, lines separated by ``\\n`` — the shape
    ``transform_pdf_to_dataframe`` consumes (page texts joined by newlines,
    `/root/reference/transform_data_pdf/lambda_function.py:18-26`)."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF payload (missing %PDF magic)")
    pages: list[str] = []
    for m in _OBJ_RE.finditer(data):
        decoded = _decode_object_stream(m.group(3))
        if not decoded:
            continue
        if b"BT" not in decoded and b"Tj" not in decoded and b"TJ" not in decoded:
            continue  # image/xobject/font stream — no text operators
        text = _extract_stream_text(decoded)
        if text.strip():
            pages.append(text if text.endswith("\n") else text + "\n")
    return "".join(pages)


# --------------------------------------------------------------------------
# Tiny PDF writer — test infrastructure (real, spec-conformant output) so
# the extractor is exercised against genuine PDF bytes without binary deps.
# --------------------------------------------------------------------------


def _escape_pdf_string(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def make_pdf(pages: list[str], compress: bool = True) -> bytes:
    """Build a minimal valid PDF: one content stream per page, Helvetica,
    one Tj per line with Td line advances — the machine-generated-receipt
    shape. With ``compress`` the streams are FlateDecode, exercising the
    same decode path a real generator (reportlab, wkhtmltopdf) produces."""
    objects: list[bytes] = []

    def ref(idx: int) -> bytes:
        return f"{idx} 0 R".encode()

    n_pages = len(pages)
    # 1: catalog, 2: pages, 3..: page objects, then content streams, then font
    page_ids = [3 + i for i in range(n_pages)]
    content_ids = [3 + n_pages + i for i in range(n_pages)]
    font_id = 3 + 2 * n_pages

    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # obj 1
    kids = b" ".join(ref(p) for p in page_ids)
    objects.append(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count " + str(n_pages).encode() + b" >>"
    )  # obj 2
    for pid, cid in zip(page_ids, content_ids):
        objects.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents "
            + ref(cid)
            + b" /Resources << /Font << /F1 "
            + ref(font_id)
            + b" >> >> >>"
        )
    streams: list[bytes] = []
    for text in pages:
        ops = [b"BT /F1 10 Tf 36 756 Td"]
        for line in text.splitlines():
            ops.append(b"(" + _escape_pdf_string(line).encode("latin-1") + b") Tj 0 -12 Td")
        ops.append(b"ET")
        streams.append(b"\n".join(ops))
    for s in streams:
        if compress:
            z = zlib.compress(s)
            objects.append(
                b"<< /Length "
                + str(len(z)).encode()
                + b" /Filter /FlateDecode >>\nstream\n"
                + z
                + b"\nendstream"
            )
        else:
            objects.append(
                b"<< /Length " + str(len(s)).encode() + b" >>\nstream\n" + s + b"\nendstream"
            )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    buf = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(buf))
        buf += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += f"xref\n0 {len(objects) + 1}\n".encode()
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += f"{off:010d} 00000 n \n".encode()
    buf += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(buf)
