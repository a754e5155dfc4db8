"""Pure-stdlib document parsers: XLSX (OOXML spreadsheet) and PDF text
extraction, plus minimal writers for fixtures.

Exists so `read_xls_files` / `read_pdf_files` (sources/files.py) have a
REAL parse kernel in containers without openpyxl / pypdf — `zipfile` +
`xml.etree` + `zlib` + `re` only. When the richer libraries are
importable the readers prefer them; this module is the dependency-free
floor (no charts/styles/formulas-evaluation for XLSX; simple-encoding
Tj/TJ text extraction for PDF — the same scope as the reference's
parser, ``src/palimpzest/tools/pdfparser.py:1-226``, which also only
extracts the text layer).

XLSX is a zip of XML parts: `xl/workbook.xml` names the sheets,
`xl/_rels/workbook.xml.rels` maps them to `xl/worksheets/sheetN.xml`,
and `xl/sharedStrings.xml` interns string cells. PDF is an object graph:
the trailer's /Root points at the catalog, /Pages → /Kids is the page
tree, each page's /Contents streams hold `(text) Tj` / `[...] TJ`
operators (FlateDecode-compressed or raw).
"""

from __future__ import annotations

import io
import re
import struct  # noqa: F401  (kept for parity with sibling codecs)
import zipfile
import zlib
from xml.etree import ElementTree

# ---------------------------------------------------------------------------
# XLSX
# ---------------------------------------------------------------------------


def _local(tag: str) -> str:
    """Strip the XML namespace: '{uri}name' → 'name'."""
    return tag.rsplit("}", 1)[-1]


def _node_text(el) -> str:
    """Concatenate all <t> descendants (plain and rich-text runs)."""
    return "".join(t.text or "" for t in el.iter() if _local(t.tag) == "t")


def _col_index(ref: str) -> int:
    """'A1' → 0, 'AB12' → 27. Cell refs are base-26 letters + row."""
    n = 0
    for ch in ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
    return n - 1


def _cell_value(cell, sst: list[str]):
    t = cell.get("t", "n")
    if t == "inlineStr":
        return _node_text(cell)
    v = None
    for ch in cell:
        if _local(ch.tag) == "v":
            v = ch.text or ""
            break
    if v is None:
        return None
    if t == "s":
        return sst[int(v)]
    if t == "b":
        return v == "1"
    if t in ("str", "e"):  # formula-result string / error literal
        return v
    # numeric: int when the lexical form is integral (sheet XML has no
    # int/float distinction; this matches openpyxl's coercion)
    try:
        return int(v)
    except ValueError:
        return float(v)


def read_xlsx(blob: bytes) -> dict[str, list[list]]:
    """XLSX bytes → {sheet_name: rows}, each row a list of
    str/int/float/bool/None padded per the sheet's cell refs (gaps are
    None; rows are NOT rectangularized across the sheet)."""
    zf = zipfile.ZipFile(io.BytesIO(blob))
    names = set(zf.namelist())

    sst: list[str] = []
    if "xl/sharedStrings.xml" in names:
        root = ElementTree.fromstring(zf.read("xl/sharedStrings.xml"))
        sst = [_node_text(si) for si in root if _local(si.tag) == "si"]

    rels: dict[str, str] = {}
    if "xl/_rels/workbook.xml.rels" in names:
        for rel in ElementTree.fromstring(zf.read("xl/_rels/workbook.xml.rels")):
            target = rel.get("Target", "")
            if target.startswith("/"):
                target = target[1:]
            elif not target.startswith("xl/"):
                target = "xl/" + target
            rels[rel.get("Id", "")] = target

    out: dict[str, list[list]] = {}
    wb = ElementTree.fromstring(zf.read("xl/workbook.xml"))
    sheet_no = 0
    for el in wb.iter():
        if _local(el.tag) != "sheet":
            continue
        sheet_no += 1
        name = el.get("name", f"Sheet{sheet_no}")
        rid = next((v for k, v in el.attrib.items() if _local(k) == "id"), None)
        part = rels.get(rid, f"xl/worksheets/sheet{sheet_no}.xml")
        if part not in names:
            out[name] = []
            continue
        rows: list[list] = []
        for row in ElementTree.fromstring(zf.read(part)).iter():
            if _local(row.tag) != "row":
                continue
            cells: list = []
            for c in row:
                if _local(c.tag) != "c":
                    continue
                ref = c.get("r")
                idx = _col_index(ref) if ref else len(cells)
                while len(cells) < idx:
                    cells.append(None)
                val = _cell_value(c, sst)
                if len(cells) == idx:
                    cells.append(val)
                else:
                    cells[idx] = val
            rows.append(cells)
        out[name] = rows
    return out


def write_xlsx(sheets: dict[str, list[list]]) -> bytes:
    """{sheet: rows} → minimal XLSX bytes (inline strings, no styles).
    Fixture writer for the reader's tests and for sinks that need a
    spreadsheet artifact without openpyxl."""

    def esc(s: str) -> str:
        return (
            s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )

    def col_ref(i: int) -> str:
        s = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            s = chr(ord("A") + r) + s
        return s

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    sheet_xml: list[str] = []
    for rows in sheets.values():
        body = []
        for ri, row in enumerate(rows, 1):
            cells = []
            for ci, v in enumerate(row):
                ref = f"{col_ref(ci)}{ri}"
                if v is None:
                    continue
                if isinstance(v, bool):
                    cells.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
                elif isinstance(v, (int, float)):
                    cells.append(f'<c r="{ref}"><v>{v}</v></c>')
                else:
                    cells.append(
                        f'<c r="{ref}" t="inlineStr"><is><t>{esc(str(v))}</t></is></c>'
                    )
            body.append(f'<row r="{ri}">{"".join(cells)}</row>')
        sheet_xml.append(
            f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
            f'{"".join(body)}</sheetData></worksheet>'
        )

    sheets_decl = "".join(
        f'<sheet name="{esc(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(sheets)
    )
    workbook = (
        f'<?xml version="1.0"?><workbook {ns} xmlns:r="{rns}">'
        f"<sheets>{sheets_decl}</sheets></workbook>"
    )
    rels = (
        '<?xml version="1.0"?><Relationships '
        'xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="{rns}/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheets))
        )
        + "</Relationships>"
    )
    ctypes = (
        '<?xml version="1.0"?><Types '
        'xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="xml" '
        'ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
            for i in range(len(sheets))
        )
        + "</Types>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", ctypes)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        for i, xml in enumerate(sheet_xml):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", xml)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# PDF text extraction
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)

# PDF literal-string escapes (\ooo handled separately)
_STR_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _parse_objects(data: bytes) -> dict[int, bytes]:
    """object number → body bytes (dict + optional stream). Later
    definitions win (incremental updates append re-definitions)."""
    return {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(data)}


def _dict_part(body: bytes) -> bytes:
    i = body.find(b"stream")
    return body if i < 0 else body[:i]


def _get_ref(body: bytes, key: bytes) -> int | None:
    m = re.search(re.escape(key) + rb"\s+(\d+)\s+\d+\s+R", body)
    return int(m.group(1)) if m else None


def _get_refs_array(body: bytes, key: bytes) -> list[int]:
    """Value of ``key``: either one ref or an array of refs."""
    m = re.search(re.escape(key) + rb"\s*\[(.*?)\]", body, re.DOTALL)
    if m:
        return [int(r.group(1)) for r in _REF_RE.finditer(m.group(1))]
    one = _get_ref(body, key)
    return [one] if one is not None else []


def _stream_bytes(body: bytes) -> bytes:
    m = _STREAM_RE.search(body)
    if not m:
        return b""
    raw = m.group(1)
    if b"/FlateDecode" in _dict_part(body):
        raw = zlib.decompress(raw)
    return raw


def _decode_pdf_string(raw: bytes) -> str:
    """Contents of a ( ) literal → text (escapes + octal); assumes a
    simple Latin-ish encoding — same scope as the reference parser."""
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt in _STR_ESCAPES:
                out += _STR_ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # \ooo octal, 1-3 digits
                j = i + 1
                while j < len(raw) and j < i + 4 and raw[j : j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            i += 2  # \<newline> and unknown escapes: drop the backslash
            continue
        out += c
        i += 1
    return out.decode("latin-1")


def _extract_strings(content: bytes) -> str:
    """Walk a content stream; collect text shown by Tj / ' / " / TJ.
    T* and the quote operators imply a line break."""
    chunks: list[str] = []
    i, n = 0, len(content)
    pending: str | None = None  # last balanced ( ) or < > string seen

    def flush(op: bytes):
        nonlocal pending
        if op in (b"'", b'"', b"T*"):
            chunks.append("\n")
        if pending is not None and op in (b"Tj", b"'", b'"'):
            chunks.append(pending)
        pending = None

    while i < n:
        c = content[i : i + 1]
        if c == b"(":  # literal string with nesting + escapes
            depth, j = 1, i + 1
            start = j
            while j < n and depth:
                cj = content[j : j + 1]
                if cj == b"\\":
                    j += 2
                    continue
                if cj == b"(":
                    depth += 1
                elif cj == b")":
                    depth -= 1
                j += 1
            pending = _decode_pdf_string(content[start : j - 1])
            i = j
        elif c == b"<":
            if content[i : i + 2] == b"<<":  # inline dict, not a string
                i += 2
                continue
            j = content.find(b">", i)
            if j < 0:
                break
            hexs = re.sub(rb"\s", b"", content[i + 1 : j])
            if len(hexs) % 2:
                hexs += b"0"
            try:
                pending = bytes.fromhex(hexs.decode("ascii")).decode("latin-1")
            except (ValueError, UnicodeDecodeError):
                pending = None  # not a hex string (e.g. stray operand)
            i = j + 1
        elif c == b"[":  # TJ array: strings interleaved with kerns
            j, depth = i + 1, 1
            parts: list[str] = []
            while j < n and depth:
                cj = content[j : j + 1]
                if cj == b"(":
                    d2, k = 1, j + 1
                    start = k
                    while k < n and d2:
                        ck = content[k : k + 1]
                        if ck == b"\\":
                            k += 2
                            continue
                        if ck == b"(":
                            d2 += 1
                        elif ck == b")":
                            d2 -= 1
                        k += 1
                    parts.append(_decode_pdf_string(content[start : k - 1]))
                    j = k
                    continue
                if cj == b"[":
                    depth += 1
                elif cj == b"]":
                    depth -= 1
                j += 1
            m = re.match(rb"\s*TJ", content[j:])
            if m:
                chunks.append("".join(parts))
                j += m.end()
            i = j
        elif c.isalpha() or c in (b"'", b'"', b"*"):
            m = re.match(rb"[A-Za-z'\"*]+", content[i:])
            op = m.group(0)
            if op in (b"Tj", b"'", b'"', b"T*"):
                flush(op)
            i += m.end()
        else:
            i += 1
    return "".join(chunks)


def _page_order(objs: dict[int, bytes], root: int) -> list[int]:
    """Walk the /Pages tree depth-first → page object numbers in
    document order (Kids may nest intermediate /Pages nodes)."""
    pages: list[int] = []
    seen: set[int] = set()

    def walk(num: int):
        if num in seen or num not in objs:
            return
        seen.add(num)
        body = _dict_part(objs[num])
        if re.search(rb"/Type\s*/Page\b(?!s)", body):
            pages.append(num)
            return
        for kid in _get_refs_array(body, b"/Kids"):
            walk(kid)

    walk(root)
    return pages


def extract_pdf_pages(blob: bytes) -> list[str]:
    """PDF bytes → per-page extracted text (simple encodings; the text
    layer only — images/fonts untouched)."""
    if not blob.startswith(b"%PDF"):
        raise ValueError("not a PDF: bad signature")
    objs = _parse_objects(blob)
    root_ref = None
    m = list(re.finditer(rb"/Root\s+(\d+)\s+\d+\s+R", blob))
    if m:
        root_ref = int(m[-1].group(1))
    pages_root = None
    if root_ref in objs:
        pages_root = _get_ref(_dict_part(objs[root_ref]), b"/Pages")
    if pages_root is None:  # damaged xref/trailer: fall back to scan order
        page_nums = [
            n for n, b in sorted(objs.items())
            if re.search(rb"/Type\s*/Page\b(?!s)", _dict_part(b))
        ]
    else:
        page_nums = _page_order(objs, pages_root)
    out: list[str] = []
    for num in page_nums:
        body = _dict_part(objs[num])
        content = b"".join(
            _stream_bytes(objs[r]) for r in _get_refs_array(body, b"/Contents")
            if r in objs
        )
        out.append(_extract_strings(content))
    return out


def write_pdf(pages: list[str], *, compress: bool = True) -> bytes:
    """Per-page text → minimal one-font PDF (Helvetica, Tj per line).
    Fixture writer; also a real artifact any viewer opens."""

    def esc(s: str) -> bytes:
        return (
            s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        ).encode("latin-1", errors="replace")

    objs: list[bytes] = []
    page_refs = []
    first_page_obj = 4  # 1 catalog, 2 pages, 3 font
    for i, text in enumerate(pages):
        lines = text.split("\n")
        ops = [b"BT /F1 12 Tf 50 760 Td 14 TL"]
        for j, ln in enumerate(lines):
            if j:
                ops.append(b"T*")
            ops.append(b"(" + esc(ln) + b") Tj")
        ops.append(b"ET")
        stream = b"\n".join(ops)
        filt = b""
        if compress:
            stream = zlib.compress(stream)
            filt = b"/Filter /FlateDecode "
        cnum = first_page_obj + 2 * i + 1
        pnum = first_page_obj + 2 * i
        page_refs.append(pnum)
        objs.append((
            b"%d 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>\nendobj\n"
        ) % (pnum, cnum))
        objs.append(
            b"%d 0 obj\n<< %s/Length %d >>\nstream\n" % (cnum, filt, len(stream))
            + stream
            + b"\nendstream\nendobj\n"
        )
    kids = b" ".join(b"%d 0 R" % p for p in page_refs)
    header = [
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [%s] /Count %d >>\nendobj\n"
        % (kids, len(pages)),
        b"3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n",
    ]
    body = header + objs
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for ob in body:
        offsets.append(len(out))
        out += ob
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(body) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(body) + 1, xref_at)
    )
    return bytes(out)
