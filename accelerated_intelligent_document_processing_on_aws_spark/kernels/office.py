"""Excel/Word structure extraction via stdlib zipfile + ElementTree (P6).

Reference semantics (``ocr/document_converter.py:164-381`` xlsx sheets →
markdown tables; ``:742-905`` docx headings/paragraphs/tables → markdown):
the reference uses openpyxl/python-docx, which are absent in this
environment — but OOXML is just zip+XML, so this kernel covers the
structural 80% the reference handles with stdlib only:

* xlsx — per sheet (workbook order), the cell grid as a markdown pipe
  table with the first row as header.  Cell types: shared strings
  (``t="s"``), inline strings (``t="inlineStr"``), formula/str
  (``t="str"``) and raw numeric ``<v>`` text.  Column gaps from ``r=``
  refs are filled with empty cells.
* docx — body blocks in order: paragraphs with ``Heading<N>`` styles as
  ``#``·N markdown headings, plain paragraphs as text, tables as pipe
  tables; blocks joined with blank lines.

``make_xlsx`` / ``make_docx`` are minimal writers used by tests/bench to
synthesize real OOXML payloads (inline strings only) — round-tripping
through an actual zip keeps the reader honest.

Pure-Python kernels; Spark wiring (binary column → markdown column via
pandas UDFs) lives in ``operators/transforms.py``.
"""

from __future__ import annotations

import io
import re
import zipfile
from typing import Dict, List, Sequence
from xml.etree import ElementTree as ET

NS_X = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
NS_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
NS_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"

_COL_RE = re.compile(r"^([A-Z]+)[0-9]+$")


def _esc(cell: str) -> str:
    return cell.replace("|", "\\|")


def _md_table(rows: List[List[str]]) -> str:
    """First row = header; same pipe-table shape as kernels/csv_table.py."""
    if not rows:
        return ""
    width = max(len(r) for r in rows)
    rows = [r + [""] * (width - len(r)) for r in rows]
    out = [
        "| " + " | ".join(_esc(c.strip()) for c in rows[0]) + " |",
        "|" + "|".join([" --- "] * width) + "|",
    ]
    for r in rows[1:]:
        out.append("| " + " | ".join(_esc(c.strip()) for c in r) + " |")
    return "\n".join(out)


def _col_index(ref: str) -> int:
    """'B7' -> 1 (0-based column)."""
    m = _COL_RE.match(ref)
    if not m:
        return -1
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _cell_text(c: ET.Element, shared: List[str]) -> str:
    t = c.get("t", "n")
    if t == "s":
        v = c.find(f"{NS_X}v")
        try:
            return shared[int(v.text)] if v is not None and v.text else ""
        except (ValueError, IndexError):
            return ""
    if t == "inlineStr":
        return "".join(el.text or "" for el in c.iter(f"{NS_X}t"))
    v = c.find(f"{NS_X}v")
    return v.text or "" if v is not None else ""


def xlsx_to_markdown(payload: bytes) -> str:
    """xlsx bytes → markdown: '## <sheet name>' + pipe table per sheet."""
    zf = zipfile.ZipFile(io.BytesIO(payload))
    names = set(zf.namelist())

    shared: List[str] = []
    if "xl/sharedStrings.xml" in names:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in root.findall(f"{NS_X}si"):
            shared.append("".join(el.text or "" for el in si.iter(f"{NS_X}t")))

    # sheet order comes from workbook.xml, but each sheet's WORKSHEET PART
    # is resolved through its r:id in xl/_rels/workbook.xml.rels — real
    # workbooks with reordered/deleted sheets do not follow the positional
    # sheet{i}.xml convention (round-2 ADVICE); position is only the
    # fallback when rels are absent.
    rels: Dict[str, str] = {}
    if "xl/_rels/workbook.xml.rels" in names:
        rroot = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in rroot.iter():
            if rel.tag.endswith("}Relationship") or rel.tag == "Relationship":
                rels[rel.get("Id", "")] = rel.get("Target", "")

    sheets: List[tuple] = []  # (name, r:id or None)
    if "xl/workbook.xml" in names:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        for sh in wb.iter(f"{NS_X}sheet"):
            sheets.append(
                (sh.get("name", f"Sheet{len(sheets) + 1}"), sh.get(f"{NS_R}id"))
            )

    out: List[str] = []
    for i, (sheet_name, rid) in enumerate(sheets or [("Sheet1", None)]):
        target = rels.get(rid) if rid else None
        if target:
            # targets are relative to xl/ ("worksheets/sheet2.xml") or
            # package-absolute ("/xl/worksheets/sheet2.xml")
            path = target.lstrip("/") if target.startswith("/") else "xl/" + target
        else:
            path = f"xl/worksheets/sheet{i + 1}.xml"
        if path not in names:
            continue
        root = ET.fromstring(zf.read(path))
        rows: List[List[str]] = []
        for row in root.iter(f"{NS_X}row"):
            cells: List[str] = []
            for c in row.findall(f"{NS_X}c"):
                pos = _col_index(c.get("r", ""))
                if pos < 0:
                    pos = len(cells)
                while len(cells) < pos:
                    cells.append("")
                cells.append(_cell_text(c, shared))
            rows.append(cells)
        if rows:
            out.append(f"## {sheet_name}\n{_md_table(rows)}")
    return "\n\n".join(out)


def docx_to_markdown(payload: bytes) -> str:
    """docx bytes → markdown: Heading<N> styles → #·N, paragraphs → text,
    tables → pipe tables; blocks joined with blank lines."""
    zf = zipfile.ZipFile(io.BytesIO(payload))
    root = ET.fromstring(zf.read("word/document.xml"))
    body = root.find(f"{NS_W}body")
    blocks: List[str] = []
    if body is None:
        return ""
    for el in body:
        if el.tag == f"{NS_W}p":
            text = "".join(t.text or "" for t in el.iter(f"{NS_W}t"))
            style_el = el.find(f"{NS_W}pPr/{NS_W}pStyle")
            style = style_el.get(f"{NS_W}val", "") if style_el is not None else ""
            m = re.match(r"Heading([1-6])$", style)
            if m:
                blocks.append("#" * int(m.group(1)) + " " + text)
            elif text:
                blocks.append(text)
        elif el.tag == f"{NS_W}tbl":
            rows = []
            for tr in el.findall(f"{NS_W}tr"):
                rows.append(
                    [
                        "".join(t.text or "" for t in tc.iter(f"{NS_W}t"))
                        for tc in tr.findall(f"{NS_W}tc")
                    ]
                )
            if rows:
                blocks.append(_md_table(rows))
    return "\n\n".join(blocks)


# ---------------------------------------------------------------- writers
# Minimal OOXML synthesis for tests/bench (inline strings only, no styles).

def _zip_bytes(files: Dict[str, str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, content in files.items():
            zf.writestr(name, content)
    return buf.getvalue()


def _xesc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def make_xlsx(sheets: Dict[str, Sequence[Sequence[str]]]) -> bytes:
    """{sheet name: row grid of strings} → minimal xlsx bytes."""
    files = {
        "[Content_Types].xml": (
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            "</Types>"
        ),
        "_rels/.rels": (
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>"
        ),
    }
    sheet_defs, rels = [], []
    for i, name in enumerate(sheets, 1):
        sheet_defs.append(f'<sheet name="{_xesc(name)}" sheetId="{i}" r:id="rId{i}"/>')
        rels.append(
            f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i}.xml"/>'
        )
    files["xl/workbook.xml"] = (
        '<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{''.join(sheet_defs)}</sheets></workbook>"
    )
    files["xl/_rels/workbook.xml.rels"] = (
        '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(rels)
        + "</Relationships>"
    )
    for i, (name, rows) in enumerate(sheets.items(), 1):
        xml_rows = []
        for ri, row in enumerate(rows, 1):
            cells = "".join(
                f'<c r="{chr(ord("A") + ci)}{ri}" t="inlineStr"><is><t>{_xesc(str(v))}</t></is></c>'
                for ci, v in enumerate(row)
            )
            xml_rows.append(f'<row r="{ri}">{cells}</row>')
        files[f"xl/worksheets/sheet{i}.xml"] = (
            '<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f"<sheetData>{''.join(xml_rows)}</sheetData></worksheet>"
        )
    return _zip_bytes(files)


def make_docx(blocks: Sequence[tuple]) -> bytes:
    """[('h1'|'h2'|'h3'|'p', text) | ('table', rows)] → minimal docx bytes."""
    parts: List[str] = []
    for kind, payload in blocks:
        if kind == "table":
            trs = "".join(
                "<w:tr>"
                + "".join(
                    f"<w:tc><w:p><w:r><w:t>{_xesc(str(c))}</w:t></w:r></w:p></w:tc>"
                    for c in row
                )
                + "</w:tr>"
                for row in payload
            )
            parts.append(f"<w:tbl>{trs}</w:tbl>")
        else:
            style = (
                f'<w:pPr><w:pStyle w:val="Heading{kind[1]}"/></w:pPr>'
                if kind.startswith("h")
                else ""
            )
            parts.append(
                f"<w:p>{style}<w:r><w:t>{_xesc(str(payload))}</w:t></w:r></w:p>"
            )
    doc = (
        '<?xml version="1.0"?><w:document '
        'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        f"<w:body>{''.join(parts)}</w:body></w:document>"
    )
    return _zip_bytes(
        {
            "[Content_Types].xml": (
                '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
                '<Default Extension="xml" ContentType="application/xml"/>'
                '<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
                "</Types>"
            ),
            "_rels/.rels": (
                '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
                '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
                "</Relationships>"
            ),
            "word/document.xml": doc,
        }
    )
