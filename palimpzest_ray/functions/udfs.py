"""Sample UDF library — the user-extension surface the reference ships
in ``utils/udfs.py:14-60`` (url→file, file→xls, xls→tables), done as
BATCH transforms for ``Dataset.map_batches`` instead of per-record
dict→dict calls.

Environment gating: this container has no network and no openpyxl, so
``url_to_file`` resolves only ``file://`` / local paths (the http path
raises ``NotImplementedError`` with a clear message) and the xls
functions raise unless openpyxl is importable — the batch plumbing
(schemas, 1:N explode layout) is real and tested either way.

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


def file_to_xls(batch: pa.Table, contents_col: str = "contents") -> pa.Table:
    """1:1 convert: xls bytes → (number_sheets, sheet_names)."""
    if not _HAS_OPENPYXL:
        raise NotImplementedError("openpyxl not available in this environment")
    import pandas as pd

    n_sheets, sheet_names = [], []
    for blob in batch[contents_col].to_pylist():
        xls = pd.ExcelFile(io.BytesIO(blob), engine="openpyxl")
        n_sheets.append(len(xls.sheet_names))
        sheet_names.append(list(xls.sheet_names))
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
    rows capped at MAX_ROWS)."""
    if not _HAS_OPENPYXL:
        raise NotImplementedError("openpyxl not available in this environment")
    import pandas as pd

    names, headers, rows_col, fnames = [], [], [], []
    for blob, fname in zip(
        batch[contents_col].to_pylist(), batch[filename_col].to_pylist()
    ):
        xls = pd.ExcelFile(io.BytesIO(blob), engine="openpyxl")
        for sheet in xls.sheet_names:
            df = pd.read_excel(io.BytesIO(blob), sheet_name=sheet, engine="openpyxl")
            rows_col.append(
                [[str(x) for x in row] for row in df.values[:MAX_ROWS]]
            )
            headers.append([str(c) for c in df.columns])
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
