"""Pure-stdlib XLSX reading (S2) — zipfile + ElementTree, no openpyxl.

An .xlsx workbook is a zip of XML parts; the subset a settlement report
uses (`/root/reference/transform_data_mp/lambda_function.py:62`,
`load_data/lambda_function.py:276`) is: one worksheet of typed cells,
shared or inline strings, numbers and booleans. This module reads exactly
that subset — enough to replace ``pd.read_excel`` for the MP-report shape.
Formulas contribute their cached ``<v>`` value; style-driven date
formatting is NOT resolved (dates arrive as Excel serial numbers — parse
downstream like any other raw column, same discipline as the CSV path).

Scale note: workbooks are small (MBs) and arrive file-at-a-time; the
engine converts them to parquet bronze at ingest
(``readers.read_excel`` → ``pipelines``), so nothing downstream ever
touches XML. A directory of workbooks parallelizes per-file.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _col_index(ref: str) -> int:
    """'A1' → 0, 'BC12' → 54 (column letters only; row part ignored)."""
    m = _CELL_REF.match(ref)
    if not m:
        return 0
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _text_of(elem) -> str:
    """Concatenate every <t> descendant (rich-text runs split one string
    across multiple <r><t> nodes)."""
    parts = []
    for node in elem.iter():
        if _strip_ns(node.tag) == "t":
            parts.append(node.text or "")
    return "".join(parts)


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    return [_text_of(si) for si in root if _strip_ns(si.tag) == "si"]


def _sheet_targets(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet name, member path)] in workbook order, via the rels part."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {}
    for rel in rels:
        rid = rel.get("Id")
        target = rel.get("Target", "")
        if target.startswith("/"):
            target = target[1:]
        elif not target.startswith("xl/"):
            target = "xl/" + target
        rid_to_target[rid] = target
    out: list[tuple[str, str]] = []
    for node in wb.iter():
        if _strip_ns(node.tag) == "sheet":
            rid = next(
                (v for k, v in node.attrib.items() if k.endswith("}id") or k == "id"), None
            )
            target = rid_to_target.get(rid)
            if target:
                out.append((node.get("name", ""), target))
    if not out:  # rels missing/odd — fall back to sorted worksheet members
        sheets = sorted(
            n for n in zf.namelist() if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        out = [(f"Sheet{i + 1}", s) for i, s in enumerate(sheets)]
    return out


def _cell_value(cell, shared: list[str]):
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        return _text_of(cell)
    v = None
    for child in cell:
        if _strip_ns(child.tag) == "v":
            v = child.text or ""
            break
    if v is None:
        return None
    if ctype == "s":
        return shared[int(v)]
    if ctype == "str":  # cached formula string
        return v
    if ctype == "b":
        return v == "1"
    try:
        f = float(v)
    except ValueError:
        return v
    return int(f) if f.is_integer() and "e" not in v.lower() and "." not in v else f


def read_xlsx(source: str | bytes, sheet: str | int = 0) -> list[list]:
    """Worksheet → list of rows (lists, ragged rows right-padded with None).

    ``source`` is a path or the workbook bytes (the reference reads from an
    object store into memory first — same shape). ``sheet`` selects by
    0-based index or by name.
    """
    raw = io.BytesIO(source) if isinstance(source, (bytes, bytearray)) else source
    with zipfile.ZipFile(raw) as zf:
        shared = _shared_strings(zf)
        targets = _sheet_targets(zf)
        if isinstance(sheet, int):
            if sheet >= len(targets):
                raise ValueError(f"sheet index {sheet} out of range ({len(targets)} sheets)")
            member = targets[sheet][1]
        else:
            matches = [t for name, t in targets if name == sheet]
            if not matches:
                raise ValueError(f"no sheet named {sheet!r}; have {[n for n, _ in targets]}")
            member = matches[0]
        root = ET.fromstring(zf.read(member))
        rows: list[list] = []
        width = 0
        for row in root.iter():
            if _strip_ns(row.tag) != "row":
                continue
            cells: list = []
            for cell in row:
                if _strip_ns(cell.tag) != "c":
                    continue
                idx = _col_index(cell.get("r", ""))
                while len(cells) <= idx:
                    cells.append(None)
                cells[idx] = _cell_value(cell, shared)
            width = max(width, len(cells))
            rows.append(cells)
        for r in rows:
            r.extend([None] * (width - len(r)))
        return rows


# --------------------------------------------------------------------------
# Tiny XLSX writer — test infrastructure producing real workbooks (shared
# strings, typed cells) so the reader is exercised against genuine bytes.
# --------------------------------------------------------------------------

_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
</Relationships>"""

_WB = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="{name}" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""


def _xml_escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _col_letters(idx: int) -> str:
    letters = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        letters = chr(65 + rem) + letters
    return letters


def make_xlsx(rows: list[list], sheet_name: str = "report") -> bytes:
    """Build a real minimal workbook: strings go through sharedStrings
    (deduplicated, like Excel writes them), numbers/bools as typed cells."""
    shared: dict[str, int] = {}
    body: list[str] = []
    for rix, row in enumerate(rows, start=1):
        cells = []
        for cix, val in enumerate(row):
            if val is None:
                continue
            ref = f"{_col_letters(cix)}{rix}"
            if isinstance(val, bool):
                cells.append(f'<c r="{ref}" t="b"><v>{int(val)}</v></c>')
            elif isinstance(val, (int, float)):
                cells.append(f'<c r="{ref}"><v>{val}</v></c>')
            else:
                s = str(val)
                if s not in shared:
                    shared[s] = len(shared)
                cells.append(f'<c r="{ref}" t="s"><v>{shared[s]}</v></c>')
        body.append(f'<row r="{rix}">' + "".join(cells) + "</row>")
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>" + "".join(body) + "</sheetData></worksheet>"
    )
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{_xml_escape(s)}</t></si>" for s in shared)
        + "</sst>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CT)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        zf.writestr("xl/workbook.xml", _WB.format(name=_xml_escape(sheet_name)))
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml)
        zf.writestr("xl/sharedStrings.xml", sst)
    return buf.getvalue()
