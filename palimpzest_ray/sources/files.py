"""File-format sources: the reference's per-file reader family
(``TextFileDataset`` / ``HTMLFileDataset`` / ``PDFFileDataset`` /
``XLSFileDataset``, ``iter_dataset.py:216-511``) as streaming Ray Data
reads + parse ``map_batches`` stages.

Format sniffing parity: :func:`read_auto` mirrors ``get_local_source``
(``iter_dataset.py:514-539``) — extension-based dispatch.

PDF / XLSX parsing prefers pypdf / openpyxl when importable and falls
back to the in-repo stdlib parsers (``sources/officeparse.py``) — real
text/cell extraction either way. Only legacy binary .xls (BIFF) remains
dependency-gated.
"""

from __future__ import annotations

import os
from html.parser import HTMLParser

import pyarrow as pa
import ray.data as rd

TEXT_EXT = {".txt", ".md", ".rst"}
HTML_EXT = {".html", ".htm"}


def _with_names(batch: pa.Table, content_col: str) -> pa.Table:
    paths = batch["path"].to_pylist()
    return pa.table(
        {
            "filename": pa.array([os.path.basename(p) for p in paths]),
            "path": batch["path"],
            content_col: batch["bytes"],
        }
    )


def read_text_files(paths, encoding: str = "utf-8") -> rd.Dataset:
    """Directory/glob of text files → (filename, path, contents).

    One row per FILE (the reference's granularity, not per line)."""
    ds = rd.read_binary_files(paths, include_paths=True)

    def _decode(batch: pa.Table) -> pa.Table:
        t = _with_names(batch, "raw")
        contents = pa.array(
            [b.decode(encoding, errors="replace") for b in t["raw"].to_pylist()]
        )
        return t.drop_columns(["raw"]).append_column("contents", contents)

    return ds.map_batches(_decode, batch_format="pyarrow")


class _TextExtractor(HTMLParser):
    """Stdlib tag stripper (the container has no bs4; the reference uses
    bs4 ``get_text`` at ``iter_dataset.py:216-281``)."""

    SKIP = {"script", "style", "noscript"}

    def __init__(self):
        super().__init__()
        self.chunks: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in self.SKIP:
            self._skip_depth += 1

    def handle_endtag(self, tag):
        if tag in self.SKIP and self._skip_depth:
            self._skip_depth -= 1

    def handle_data(self, data):
        if not self._skip_depth and data.strip():
            self.chunks.append(data.strip())


def html_to_text(html: str) -> str:
    p = _TextExtractor()
    p.feed(html)
    return "\n".join(p.chunks)


def read_html_files(paths) -> rd.Dataset:
    """HTML files → (filename, path, html, text) with tags stripped."""
    ds = rd.read_binary_files(paths, include_paths=True)

    def _parse(batch: pa.Table) -> pa.Table:
        t = _with_names(batch, "raw")
        html = [b.decode("utf-8", errors="replace") for b in t["raw"].to_pylist()]
        text = [html_to_text(h) for h in html]
        return (
            t.drop_columns(["raw"])
            .append_column("html", pa.array(html))
            .append_column("text", pa.array(text))
        )

    return ds.map_batches(_parse, batch_format="pyarrow")


def read_csv_files(paths, **kw) -> rd.Dataset:
    return rd.read_csv(paths, **kw)


def read_json_files(paths, **kw) -> rd.Dataset:
    return rd.read_json(paths, **kw)


def read_pdf_files(paths) -> rd.Dataset:
    """PDF → per-page text (reference ``PDFFileDataset``,
    ``iter_dataset.py:326-382``). Prefers pypdf when importable; falls
    back to the in-repo stdlib extractor
    (:mod:`palimpzest_ray.sources.officeparse`) — a real text-layer
    parse either way."""
    ds = rd.read_binary_files(paths, include_paths=True)

    def _parse(batch: pa.Table) -> pa.Table:
        import io

        try:
            from pypdf import PdfReader

            def pages_of(blob):
                return [
                    p.extract_text() or "" for p in PdfReader(io.BytesIO(blob)).pages
                ]
        except ImportError:
            from palimpzest_ray.sources.officeparse import extract_pdf_pages as pages_of

        t = _with_names(batch, "raw")
        rows = []
        for name, path, blob in zip(
            t["filename"].to_pylist(), t["path"].to_pylist(), t["raw"].to_pylist()
        ):
            for i, text in enumerate(pages_of(blob)):
                rows.append({"filename": name, "path": path, "page": i, "text": text})
        return pa.Table.from_pylist(rows)

    return ds.map_batches(_parse, batch_format="pyarrow")


def read_xls_files(paths) -> rd.Dataset:
    """XLS(X) → per-sheet rows (reference ``XLSFileDataset``,
    ``iter_dataset.py:425-469``). Prefers openpyxl when importable;
    falls back to the in-repo stdlib XLSX parser
    (:mod:`palimpzest_ray.sources.officeparse`). Legacy binary .xls
    (BIFF) still needs openpyxl/xlrd and raises a clear error."""
    ds = rd.read_binary_files(paths, include_paths=True)

    def _parse(batch: pa.Table) -> pa.Table:
        import io

        try:
            from openpyxl import load_workbook

            def sheets_of(blob):
                wb = load_workbook(io.BytesIO(blob), read_only=True)
                return {
                    s: [list(r) for r in wb[s].iter_rows(values_only=True)]
                    for s in wb.sheetnames
                }
        except ImportError:
            from palimpzest_ray.sources import officeparse

            def sheets_of(blob):
                if blob[:4] != b"PK\x03\x04":
                    raise NotImplementedError(
                        "legacy binary .xls (BIFF) needs openpyxl/xlrd; the "
                        "stdlib fallback reads .xlsx (OOXML zip) only"
                    )
                return officeparse.read_xlsx(blob)

        t = _with_names(batch, "raw")
        rows = []
        for name, blob in zip(t["filename"].to_pylist(), t["raw"].to_pylist()):
            for sheet, sheet_rows in sheets_of(blob).items():
                for r in sheet_rows:
                    rows.append({"filename": name, "sheet": sheet,
                                 "cells": [str(c) for c in r]})
        return pa.Table.from_pylist(rows)

    return ds.map_batches(_parse, batch_format="pyarrow")


def read_auto(path: str) -> rd.Dataset:
    """Extension-sniffing dispatch (reference ``get_local_source``)."""
    ext = os.path.splitext(path)[1].lower()
    if os.path.isdir(path):
        exts = {os.path.splitext(f)[1].lower() for f in os.listdir(path)}
        ext = next(iter(exts)) if len(exts) == 1 else ext
    if ext in TEXT_EXT:
        return read_text_files(path)
    if ext in HTML_EXT:
        return read_html_files(path)
    if ext == ".csv":
        return read_csv_files(path)
    if ext in (".json", ".jsonl"):
        return read_json_files(path)
    if ext == ".pdf":
        return read_pdf_files(path)
    if ext in (".xls", ".xlsx"):
        return read_xls_files(path)
    if ext == ".parquet":
        return rd.read_parquet(path)
    return rd.read_binary_files(path, include_paths=True)


def infer_schema_from_file(path: str) -> pa.Schema:
    """Schema inference from a csv/json/parquet file — the analogue of
    the reference's ``SchemaBuilder.from_file``
    (``schemabuilder/schema_builder.py:22-60``), emitting an
    authoritative ``pa.Schema`` instead of a Pydantic model."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".parquet":
        import pyarrow.parquet as pq

        return pq.read_schema(path)
    if ext == ".csv":
        import pyarrow.csv as pacsv

        return pacsv.read_csv(path).schema
    if ext in (".json", ".jsonl", ".jsonld"):
        # jsonld is JSON with @context annotations — same inference
        # (reference handles it likewise, schema_builder.py:22-60)
        import pyarrow.json as pajson

        return pajson.read_json(path).schema
    if ext in (".yml", ".yaml"):
        import yaml

        with open(path) as f:
            data = yaml.safe_load(f)
        rows = data if isinstance(data, list) else [data]
        return pa.Table.from_pylist(rows).schema
    raise ValueError(f"cannot infer schema from {ext!r} file")
