"""P6 office kernels: xlsx/docx structure extraction over real zip+XML."""

from __future__ import annotations

from accelerated_intelligent_document_processing_on_aws_spark.kernels.office import (
    docx_to_markdown,
    make_docx,
    make_xlsx,
    xlsx_to_markdown,
)


def test_xlsx_round_trip_single_sheet():
    payload = make_xlsx({"Data": [["a", "b"], ["1", "x|y"], ["2", "z"]]})
    assert xlsx_to_markdown(payload) == (
        "## Data\n"
        "| a | b |\n"
        "| --- | --- |\n"
        "| 1 | x\\|y |\n"
        "| 2 | z |"
    )


def test_xlsx_multi_sheet_order_preserved():
    payload = make_xlsx({"First": [["h"], ["v1"]], "Second": [["k"], ["v2"]]})
    md = xlsx_to_markdown(payload)
    assert md.index("## First") < md.index("## Second")
    assert "| v1 |" in md and "| v2 |" in md


def test_xlsx_xml_escaping_round_trips():
    payload = make_xlsx({"S": [["<tag>", 'a&b"c']]})
    md = xlsx_to_markdown(payload)
    assert "<tag>" in md and 'a&b"c' in md


def test_xlsx_shared_strings_and_numbers():
    """Hand-built sheet exercising shared-string (t=s) and numeric cells
    with a column gap (A, then C) — the reader must fill B with empty."""
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "xl/workbook.xml",
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            '<sheets><sheet name="S" sheetId="1"/></sheets></workbook>',
        )
        zf.writestr(
            "xl/sharedStrings.xml",
            '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            "<si><t>hello</t></si><si><r><t>wor</t></r><r><t>ld</t></r></si></sst>",
        )
        zf.writestr(
            "xl/worksheets/sheet1.xml",
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1" t="s"><v>1</v></c></row>'
            '<row r="2"><c r="A2"><v>42</v></c><c r="B2"><v>3.14</v></c></row>'
            "</sheetData></worksheet>",
        )
    md = xlsx_to_markdown(buf.getvalue())
    assert "| hello |  | world |" in md
    assert "| 42 | 3.14 |" in md


def test_docx_headings_paragraphs_tables():
    payload = make_docx(
        [
            ("h1", "Title"),
            ("p", "Some body text."),
            ("h2", "Section"),
            ("table", [["k", "v"], ["a", "1"]]),
        ]
    )
    assert docx_to_markdown(payload) == (
        "# Title\n\n"
        "Some body text.\n\n"
        "## Section\n\n"
        "| k | v |\n| --- | --- |\n| a | 1 |"
    )


def test_docx_empty_body():
    payload = make_docx([])
    assert docx_to_markdown(payload) == ""


def test_xlsx_sheets_resolved_via_rels_not_position():
    """Workbooks whose sheet parts do not follow the positional
    sheet{i}.xml convention (reordered/deleted sheets) must attach sheet
    NAMES to the right GRIDS via r:id -> workbook.xml.rels (round-2
    ADVICE finding)."""
    from accelerated_intelligent_document_processing_on_aws_spark.kernels.office import (
        _zip_bytes,
        xlsx_to_markdown,
    )

    ws = (
        '<?xml version="1.0"?><worksheet '
        'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        '<sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>{}</t></is></c>'
        "</row></sheetData></worksheet>"
    )
    payload = _zip_bytes(
        {
            "[Content_Types].xml": '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/></Types>',
            "xl/workbook.xml": (
                '<?xml version="1.0"?><workbook '
                'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
                'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
                '<sheets><sheet name="First" sheetId="1" r:id="rA"/>'
                '<sheet name="Second" sheetId="2" r:id="rB"/></sheets></workbook>'
            ),
            # deliberately CROSSED targets: First -> sheet9.xml, Second -> sheet1.xml
            "xl/_rels/workbook.xml.rels": (
                '<?xml version="1.0"?><Relationships '
                'xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
                '<Relationship Id="rA" Type="t" Target="worksheets/sheet9.xml"/>'
                '<Relationship Id="rB" Type="t" Target="/xl/worksheets/sheet1.xml"/>'
                "</Relationships>"
            ),
            "xl/worksheets/sheet9.xml": ws.format("alpha"),
            "xl/worksheets/sheet1.xml": ws.format("beta"),
        }
    )
    md = xlsx_to_markdown(payload)
    first = md.split("## Second")[0]
    assert "## First" in first and "alpha" in first and "beta" not in first
    assert "beta" in md.split("## Second")[1]
