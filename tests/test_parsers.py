"""Golden-fixture tests for the parser UDTFs (rows-only ops, SURVEY.md §5)."""

from __future__ import annotations

from etl_expenses_spark.parsers import (
    html_tokens,
    parse_mail_record,
    parse_ticket_text,
    pdf_bytes_to_text,
)

TICKET_TEXT = """SUPERMERCADO EJEMPLO S.A.
Fecha 26/04/25 Hora 19:44
Local 001 P.V. 0003 Nro T. 778899
Caja 05
Bebidas
Agua Mineral 2L
2 x 850,00 (x) 1.700,00
Almacen
Arroz Largo' Fino
1 x 1.250,50 (x) 1.250,50
Carniceria
Carne Picada
0,482 x 5.600,00 (x) 2.699,20
AHORRO TOTAL $ 150,00
TOTAL 5.499,70
"""

MAIL_HTML = (
    "<html><body><table>"
    "<tr><td>Monto</td><td>$12.345,67</td></tr>"
    "<tr><td>Fecha</td><td>26/04/25</td></tr>"
    "<tr><td>Hora</td><td>19:44</td></tr>"
    "<tr><td>Comercio</td><td>MERPAGO*CAFE</td></tr>"
    "<tr><td>Cuotas</td><td>3</td></tr>"
    "<tr><td>Tarjeta Santander Visa</td><td>terminada en</td><td>1234</td></tr>"
    "</table></body></html>"
)


def test_parse_ticket_golden():
    items = parse_ticket_text(TICKET_TEXT)
    assert len(items) == 3
    agua, arroz, carne = items
    assert agua == {
        "nro_ticket": 778899,
        "fecha": "26/04/25",
        "categ": "Bebidas",
        "prod": "Agua Mineral 2L",
        "cant": 2,
        "peso": 0.0,
        "p_unit": 850.0,
        "p_total": 1700.0,
        "descuento": 150.0,
    }
    assert arroz["prod"] == "Arroz Largo' Fino"  # apostrophes survive (no SQL quoting layer)
    assert arroz["p_total"] == 1250.50
    # weight-sold item: cant=0, peso carries the fractional quantity
    assert carne["cant"] == 0 and carne["peso"] == 0.482
    assert carne["p_total"] == 2699.20
    assert all(i["categ"] for i in items), "category carry-forward"


def test_pdf_magic_gate():
    try:
        pdf_bytes_to_text(b"not a pdf")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    assert "hello" in pdf_bytes_to_text(b"%PDFhello")


def test_real_pdf_roundtrip_compressed():
    """Generate a REAL spec-conformant PDF (FlateDecode content streams,
    Helvetica, Tj/Td) from the ticket fixture and extract it back: the
    extracted lines must parse to the same items as the raw text."""
    from etl_expenses_spark.pdftext import make_pdf

    pdf = make_pdf([TICKET_TEXT], compress=True)
    assert pdf.startswith(b"%PDF-1.4") and b"FlateDecode" in pdf
    assert TICKET_TEXT.encode() not in pdf  # genuinely compressed, not embedded
    text = pdf_bytes_to_text(pdf)
    assert parse_ticket_text(text) == parse_ticket_text(TICKET_TEXT)


def test_real_pdf_multipage_uncompressed_and_escapes():
    from etl_expenses_spark.pdftext import extract_text, make_pdf

    pages = ["Page (one) has \\ escapes", "Fecha 26/04/25 Hora 19:44\nNro T. 42"]
    pdf = make_pdf(pages, compress=False)
    text = extract_text(pdf)
    assert "Page (one) has \\ escapes" in text
    assert "Fecha 26/04/25 Hora 19:44" in text
    lines = [ln for ln in text.splitlines() if ln]
    assert lines[-1] == "Nro T. 42"  # Td line advance → newline


def test_pdf_hex_strings_and_tj_arrays():
    """Hand-written content stream: hex strings, TJ arrays with kerning
    numbers, and the ' (move-and-show) operator."""
    import zlib

    content = b"BT /F1 10 Tf (AB) Tj <43443132> Tj T* [(kern) -120 (ed)] TJ (next) ' ET"
    z = zlib.compress(content)
    body = (
        b"%PDF-1.4\n1 0 obj\n<< /Length "
        + str(len(z)).encode()
        + b" /Filter /FlateDecode >>\nstream\n"
        + z
        + b"\nendstream\nendobj\n%%EOF"
    )
    from etl_expenses_spark.pdftext import extract_text

    text = extract_text(body)
    assert "ABCD12" in text.replace("\n", "")
    assert "kerned" in text  # TJ concatenates, kerning numbers skipped
    assert "next" in text.splitlines()[-1]  # ' starts a new line


def test_html_tokens_and_mail_record():
    toks = html_tokens(MAIL_HTML)
    assert "Monto" in toks and toks[toks.index("Monto") + 1] == "$12.345,67"
    rec = parse_mail_record("msg1", MAIL_HTML, "2025-04-26T20:00:00")
    assert rec["monto"] == 12345.67
    assert rec["divisa"] == "ARS"
    assert rec["fecha_pago"] == "26/04/25"
    assert rec["hora_pago"] == "19:44"
    assert rec["comercio"] == "MERPAGO*CAFE"
    assert rec["cuotas"] == 3
    assert rec["nro_tarjeta"] == "1234"
    assert rec["tarjeta"] == "Tarjeta Santander Visa"
    assert len(rec["id"]) == 32  # md5 natural key


def test_mail_record_usd_and_defaults():
    html = "<p>Monto</p><p>U$S 99,90</p><p>Fecha</p><p>1/2/25</p><p>Hora</p><p>9:05</p><p>Comercio</p><p>X</p><p>terminada en</p><p>9999</p>"
    rec = parse_mail_record("m2", html, "2025-01-01T00:00:00")
    assert rec["divisa"] == "USD" and rec["monto"] == 99.90
    assert rec["cuotas"] == 1  # default when absent (find_val(...) or 1)
