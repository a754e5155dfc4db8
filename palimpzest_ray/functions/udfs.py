"""Sample UDF library — the user-extension surface the reference ships
in ``utils/udfs.py:14-60`` (url→file, file→xls, xls→tables), done as
BATCH transforms for ``Dataset.map_batches`` instead of per-record
dict→dict calls.

Environment gating: this container has no network, so ``url_to_file``
resolves only ``file://`` / local paths (the http path raises
``NotImplementedError`` with a clear message). The xls functions prefer
openpyxl/pandas when importable and otherwise parse .xlsx with the
in-repo stdlib reader (``sources/officeparse.py``) — a real parse
either way; only legacy binary .xls stays gated.

These are 1:1 and 1:N ConvertScan examples (reference semantics:
``convert.py:198-259`` merges declared new columns with the parent;
1:N returns a list of dicts — here a longer batch + repeated parent
keys, the vectorized explode convention used across the engine).
"""

from __future__ import annotations

import io
import os

import pyarrow as pa

try:  # openpyxl is absent in this container; gate, don't fail at import
    import openpyxl  # noqa: F401

    _HAS_OPENPYXL = True
except ImportError:
    _HAS_OPENPYXL = False

MAX_ROWS = 100


def url_to_file(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """1:1 convert: URL → (filename, contents). Local/file:// only —
    no network in this environment; an http(s) URL raises."""
    names, contents = [], []
    for url in batch[url_col].to_pylist():
        if url is None:
            names.append(None)
            contents.append(None)
            continue
        if url.startswith(("http://", "https://")):
            raise NotImplementedError(
                "network fetch is unavailable in this environment; "
                "pass file:// or local paths"
            )
        path = url[7:] if url.startswith("file://") else url
        names.append(os.path.basename(path))
        with open(path, "rb") as f:
            contents.append(f.read())
    return batch.append_column("filename", pa.array(names, pa.string())).append_column(
        "contents", pa.array(contents, pa.binary())
    )


def _sheets(blob: bytes) -> dict[str, list[list]]:
    """Workbook bytes → {sheet: rows}; openpyxl when present, else the
    stdlib .xlsx parser (legacy BIFF .xls then raises clearly)."""
    if _HAS_OPENPYXL:
        from openpyxl import load_workbook

        wb = load_workbook(io.BytesIO(blob), read_only=True)
        return {
            s: [list(r) for r in wb[s].iter_rows(values_only=True)]
            for s in wb.sheetnames
        }
    if blob[:4] != b"PK\x03\x04":
        raise NotImplementedError(
            "legacy binary .xls (BIFF) needs openpyxl; the stdlib fallback "
            "reads .xlsx (OOXML zip) only"
        )
    from palimpzest_ray.sources.officeparse import read_xlsx

    return read_xlsx(blob)


def file_to_xls(batch: pa.Table, contents_col: str = "contents") -> pa.Table:
    """1:1 convert: xls bytes → (number_sheets, sheet_names)."""
    n_sheets, sheet_names = [], []
    for blob in batch[contents_col].to_pylist():
        names = list(_sheets(blob).keys())
        n_sheets.append(len(names))
        sheet_names.append(names)
    return batch.append_column(
        "number_sheets", pa.array(n_sheets, pa.int64())
    ).append_column("sheet_names", pa.array(sheet_names, pa.list_(pa.string())))


def xls_to_tables(
    batch: pa.Table,
    contents_col: str = "contents",
    filename_col: str = "filename",
) -> pa.Table:
    """1:N convert (one output row per sheet): xls bytes → stringified
    rows + header + table name, reference layout (``utils/udfs.py:34-56``,
    rows capped at MAX_ROWS; first sheet row is the header)."""
    names, headers, rows_col, fnames = [], [], [], []
    for blob, fname in zip(
        batch[contents_col].to_pylist(), batch[filename_col].to_pylist()
    ):
        for sheet, sheet_rows in _sheets(blob).items():
            header = [str(c) for c in sheet_rows[0]] if sheet_rows else []
            rows_col.append(
                [[str(x) for x in row] for row in sheet_rows[1 : 1 + MAX_ROWS]]
            )
            headers.append(header)
            names.append(f"{os.path.basename(fname)}_{sheet}")
            fnames.append(fname)
    return pa.table(
        {
            "filename": pa.array(fnames, pa.string()),
            "name": pa.array(names, pa.string()),
            "header": pa.array(headers, pa.list_(pa.string())),
            "rows": pa.array(rows_col, pa.list_(pa.list_(pa.string()))),
        }
    )
