"""Stdlib XLSX/PDF parsers (sources/officeparse.py): writer↔reader
round-trips plus hand-built fixtures for the parts the writer doesn't
emit (sharedStrings, uncompressed streams, TJ arrays, octal escapes).

Reference parity: the reference's text-layer PDF scope is
``src/palimpzest/tools/pdfparser.py:1-226``; its XLS row layout is
``iter_dataset.py:425-469``.
"""

import io
import zipfile
import zlib

import pytest

from palimpzest_ray.sources import officeparse as op

# ------------------------------------------------------------------ XLSX


def test_xlsx_roundtrip_types():
    sheets = {
        "mix": [
            ["name", "n", "x", "flag"],
            ["ada", 1, 2.5, True],
            ["grace", -3, 0.125, False],
            [None, None, None, None],
        ],
        "second": [["only"]],
    }
    got = op.read_xlsx(op.write_xlsx(sheets))
    assert list(got.keys()) == ["mix", "second"]
    assert got["mix"][0] == ["name", "n", "x", "flag"]
    assert got["mix"][1] == ["ada", 1, 2.5, True]
    assert got["mix"][2] == ["grace", -3, 0.125, False]
    # all-None row: writer emits no cells → reader sees an empty row
    assert got["mix"][3] == []
    assert got["second"] == [["only"]]


def test_xlsx_escaping_and_gaps():
    sheets = {"s": [["a<b>&c", None, "tail"]]}  # gap at column B
    got = op.read_xlsx(op.write_xlsx(sheets))
    assert got["s"] == [["a<b>&c", None, "tail"]]


def test_xlsx_shared_strings_fixture():
    """Hand-built workbook using sharedStrings (the path the writer
    doesn't take) + rich-text runs + a skipped column."""
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    sst = (
        f'<?xml version="1.0"?><sst {ns} count="2" uniqueCount="2">'
        "<si><t>plain</t></si>"
        "<si><r><t>ri</t></r><r><t>ch</t></r></si></sst>"
    )
    sheet = (
        f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c>'
        '<c r="C1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="B2"><v>42</v></c>'
        '<c r="C2" t="b"><v>1</v></c></row>'
        "</sheetData></worksheet>"
    )
    wb = (
        f'<?xml version="1.0"?><workbook {ns} xmlns:r="{rns}">'
        '<sheets><sheet name="fix" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?><Relationships '
        'xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        f'<Relationship Id="rId1" Type="{rns}/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    got = op.read_xlsx(buf.getvalue())
    assert got["fix"] == [["plain", None, "rich"], [None, 42, True]]


def test_col_index():
    assert [op._col_index(r) for r in ("A1", "B2", "Z9", "AA1", "AB12")] == [
        0, 1, 25, 26, 27,
    ]


# ------------------------------------------------------------------- PDF


@pytest.mark.parametrize("compress", [True, False])
def test_pdf_roundtrip(compress):
    pages = ["hello world", "line one\nline two\nline three", ""]
    got = op.extract_pdf_pages(op.write_pdf(pages, compress=compress))
    assert got == pages


def test_pdf_escapes_roundtrip():
    text = r"parens () and \backslash" + "\nsecond (nested (deep)) line"
    got = op.extract_pdf_pages(op.write_pdf([text]))
    assert got == [text]


def test_pdf_tj_array_and_hex_fixture():
    """Hand-built content stream: TJ array with kerning numbers, a hex
    string shown via ', and an octal escape."""
    content = (
        b"BT /F1 12 Tf [(ke) -120 (rn) 30 (ed)] TJ <68657821> ' "
        b"T* (oct\\101l) Tj ET"
    )
    stream = zlib.compress(content)
    blob = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Filter /FlateDecode /Length "
        + str(len(stream)).encode()
        + b" >>\nstream\n" + stream + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    )
    got = op.extract_pdf_pages(blob)
    assert got == ["kerned\nhex!\noctAl"]


def test_pdf_multi_content_streams_and_page_tree():
    """Pages nested under an intermediate /Pages node, page with an
    array of /Contents streams — document order preserved."""
    def stream_obj(num, content):
        return (
            b"%d 0 obj\n<< /Length %d >>\nstream\n" % (num, len(content))
            + content
            + b"\nendstream\nendobj\n"
        )

    blob = b"".join([
        b"%PDF-1.4\n",
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [7 0 R 6 0 R] /Count 2 >>\nendobj\n",
        b"7 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 7 0 R /Contents [4 0 R 5 0 R] >>\nendobj\n",
        stream_obj(4, b"BT (part one ) Tj ET"),
        stream_obj(5, b"BT (part two) Tj ET"),
        b"6 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 8 0 R >>\nendobj\n",
        stream_obj(8, b"BT (page B) Tj ET"),
        b"trailer\n<< /Size 9 /Root 1 0 R >>\n%%EOF\n",
    ])
    assert op.extract_pdf_pages(blob) == ["part one part two", "page B"]


def test_pdf_rejects_non_pdf():
    with pytest.raises(ValueError, match="not a PDF"):
        op.extract_pdf_pages(b"plain text")


def test_pdf_inline_dict_in_content_stream():
    """Marked-content operators carry inline <<...>> dicts; they must be
    skipped, not parsed as hex strings."""
    content = b"/OC <</MCID 0>> BDC BT (visible) Tj ET EMC"
    assert op._extract_strings(content) == "visible"
