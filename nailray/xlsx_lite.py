"""Minimal pure-stdlib XLSX reader/writer (zipfile + xml.etree).

Fallback engine for :func:`nailray.io.read_xlsx` / ``write_xlsx`` when
openpyxl is absent (this container). XLSX is a ZIP of XML parts
(ECMA-376 / ISO 29500, SpreadsheetML); the subset here covers what the
reference's XLSX path does (src/utils/io.rs:36-165, 216-322): one
worksheet, a header row, string / int / float cells.

Reader: parses ``xl/worksheets/sheet1.xml`` (first sheet listed in the
workbook), resolving shared strings (``t="s"``), inline strings
(``t="inlineStr"``), booleans (``t="b"``) and numbers. Writer: emits
inline strings — no sharedStrings table needed — and numeric cells.

Driver-sized by design, like the reference: one in-memory workbook.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_COL_RE = re.compile(r"([A-Z]+)(\d+)")
_INT_RE = re.compile(r"^-?\d+$")


def _col_index(ref: str) -> int:
    """'A1' → 0, 'B7' → 1, 'AA3' → 26."""
    m = _COL_RE.match(ref)
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def read_rows(path: str) -> list[list]:
    """All cell rows of the first worksheet (None for gaps)."""
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        sheet_name = next(
            (n for n in ("xl/worksheets/sheet1.xml",)
             if n in names),
            next((n for n in sorted(names)
                  if n.startswith("xl/worksheets/") and n.endswith(".xml")), None))
        if sheet_name is None:
            return []
        root = ET.fromstring(z.read(sheet_name))
    rows: list[list] = []
    for row_el in root.iter(f"{_NS}row"):
        cells: list = []
        for c in row_el.findall(f"{_NS}c"):
            ref = c.get("r")
            idx = _col_index(ref) if ref else len(cells)
            while len(cells) < idx:
                cells.append(None)
            t = c.get("t", "n")
            v_el = c.find(f"{_NS}v")
            if t == "inlineStr":
                is_el = c.find(f"{_NS}is")
                val = "".join(x.text or "" for x in is_el.iter(f"{_NS}t")) \
                    if is_el is not None else None
            elif v_el is None or v_el.text is None:
                val = None
            elif t == "s":
                val = shared[int(v_el.text)]
            elif t == "b":
                val = v_el.text == "1"
            elif t == "str":
                val = v_el.text
            else:  # numeric
                txt = v_el.text
                if _INT_RE.match(txt):
                    val = int(txt)  # exact — float() would round past 2^53
                else:
                    val = float(txt)
            cells.append(val)
        rows.append(cells)
    width = max((len(r) for r in rows), default=0)
    return [r + [None] * (width - len(r)) for r in rows]


_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType='
    '"application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>")
_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>")
_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>')
_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>")


def _cell_xml(value) -> str:
    import math

    if value is None:
        return "<c/>"
    if isinstance(value, bool):
        return f'<c t="b"><v>{int(value)}</v></c>'
    if isinstance(value, float) and not math.isfinite(value):
        return "<c/>"  # SpreadsheetML has no NaN/inf numeric — empty cell
    if isinstance(value, (int, float)):
        return f"<c><v>{value!r}</v></c>"
    return f'<c t="inlineStr"><is><t xml:space="preserve">{escape(str(value))}</t></is></c>'


def write_rows(path: str, rows: list[list]) -> None:
    """Write rows (first row = headers) as a single-sheet workbook."""
    body = "".join(
        "<row>" + "".join(_cell_xml(v) for v in r) + "</row>" for r in rows)
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{body}</sheetData></worksheet>")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
