"""Arrow schema management: canonical schemas + evolution with backfill.

The reference builds dynamic Pydantic models per operator and relies on
``union_schemas`` / ``relax_schema`` (reference
``src/palimpzest/core/lib/schemas.py:90-172``). Here the Arrow schema is
authoritative: schema *evolution* is handled by ``pa.unify_schemas``
plus null/default backfill for added columns (``conform``), applied
eagerly at the normalize stage so every downstream ``map_batches`` sees
one schema (SURVEY.md §7.5 item 5).
"""

from __future__ import annotations

import base64

import pyarrow as pa

# --- canonical table schemas (BASELINE.json input_hint) -----------------

#: Base-lake table of pre-tokenized training sequences.
SEQUENCE_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string(), nullable=False),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
    ]
)

#: CDC change-log table: sequence columns + (lsn, op). ``tokens``/``n_tok``
#: are null for DELETE events (tombstones).
CHANGELOG_SCHEMA = pa.schema(
    [
        pa.field("lsn", pa.int64(), nullable=False),
        pa.field("op", pa.string(), nullable=False),  # INSERT | UPDATE | DELETE
        pa.field("doc_id", pa.string(), nullable=False),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
    ]
)

#: Schema-evolution epoch adds these columns (FIXTURES.md §3).
EVOLVED_FIELDS = [
    pa.field("token_meta", pa.struct([("lang", pa.string()), ("quality", pa.float32())])),
    pa.field("shard", pa.int32()),
]

CHANGE_OPS = ("INSERT", "UPDATE", "DELETE")

# --- built-in schema catalog --------------------------------------------
# Arrow analogues of the reference's built-in Pydantic schemas
# (src/palimpzest/core/lib/schemas.py:181-267): the file/media/web
# shapes its readers emit, declared once so sources and user pipelines
# share column names and types. Binary payloads are opaque ``binary``
# columns with typed metadata (the multimodal convention).

FILE_SCHEMA = pa.schema(
    [pa.field("filename", pa.string()), pa.field("contents", pa.binary())]
)
TEXT_FILE_SCHEMA = pa.schema(
    [pa.field("filename", pa.string()), pa.field("contents", pa.string())]
)
URL_SCHEMA = pa.schema([pa.field("url", pa.string())])
DOWNLOAD_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("content", pa.binary()),
        pa.field("timestamp", pa.string()),
    ]
)
WEBPAGE_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("text", pa.string()),
        pa.field("html", pa.string()),
        pa.field("timestamp", pa.string()),
    ]
)
TABLE_SCHEMA = pa.schema(
    [
        pa.field("name", pa.string()),
        pa.field("header", pa.list_(pa.string())),
        pa.field("rows", pa.list_(pa.list_(pa.string()))),
        pa.field("filename", pa.string()),
    ]
)
IMAGE_FILE_SCHEMA = pa.schema(
    [
        pa.field("filename", pa.string()),
        pa.field("contents", pa.binary()),
        pa.field("mime", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
    ]
)
AUDIO_FILE_SCHEMA = pa.schema(
    [
        pa.field("filename", pa.string()),
        pa.field("contents", pa.binary()),
        pa.field("mime", pa.string()),
        pa.field("sample_rate", pa.int32()),
        pa.field("duration_s", pa.float32()),
    ]
)
PDF_FILE_SCHEMA = pa.schema(
    [
        pa.field("filename", pa.string()),
        pa.field("contents", pa.binary()),
        pa.field("text_contents", pa.string()),
    ]
)
XLS_FILE_SCHEMA = pa.schema(
    [
        pa.field("filename", pa.string()),
        pa.field("contents", pa.binary()),
        pa.field("sheet_names", pa.list_(pa.string())),
    ]
)

#: Internal (engine-managed) columns persisted in lake files; stripped
#: from user-facing reads. ``_lsn`` records the last LSN applied to each
#: row so replaying an old or duplicated log segment is idempotent
#: (last-writer-wins compares against it).
LSN_COL = "_lsn"
TOMBSTONE_COL = "_deleted"
INTERNAL_COLS = (LSN_COL, TOMBSTONE_COL)


# --- schema evolution ---------------------------------------------------


def unify(*schemas: pa.Schema) -> pa.Schema:
    """Unify schemas, permitting added columns (nulls backfilled later).

    Field order: first-seen order across the inputs, so evolving a lake
    appends new columns at the end — stable for Parquet readers.
    """
    return pa.unify_schemas(list(schemas), promote_options="permissive")


def conform(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project ``table`` onto ``schema``: add missing columns as typed
    nulls, reorder to schema order, and cast where needed.

    This is the columnar analogue of the reference's ``union_schemas``
    + Pydantic default backfill (``schemas.py:145-172``) and the core of
    schema evolution: pre-cutover change rows and never-updated base
    rows get nulls for added columns (FIXTURES.md §3).
    """
    n = table.num_rows
    cols = []
    for field in schema:
        if field.name in table.column_names:
            col = table.column(field.name)
            if col.type != field.type:
                col = col.cast(field.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, field.type))
    return pa.Table.from_arrays(cols, schema=schema)


def rename_to_logical(
    table: pa.Table, renames: "dict[str, str] | None"
) -> pa.Table:
    """Map a file's historical (physical) column names to the lake's
    current logical names — the read half of rename-without-rewrite
    (Delta column mapping, `alter_schema(rename=...)`). ``renames`` is
    the manifest's flattened ``{historical_name: current_name}`` map; a
    file written before the rename carries the old physical name, and
    this one simultaneous pass re-labels it so every consumer
    downstream of the read sees only logical names. A file that already
    carries the logical name is untouched (the guard makes the pass
    idempotent and safe on post-rename files)."""
    if not renames:
        return table
    names = table.column_names
    present = set(names)
    out = [
        tgt
        if (tgt := renames.get(c)) is not None and tgt not in present
        else c
        for c in names
    ]
    return table.rename_columns(out) if out != names else table


def physical_columns(
    file_names: "set[str] | frozenset[str]",
    wanted: "list[str]",
    renames: "dict[str, str] | None",
) -> "list[str]":
    """Translate a logical column request into the names actually
    present in one file: the logical name itself when the file has it,
    else any historical alias(es) recorded in ``renames``. Columns the
    file predates entirely simply drop out (conform null-backfills)."""
    inv: dict[str, list[str]] = {}
    for old, new in (renames or {}).items():
        inv.setdefault(new, []).append(old)
    out: list[str] = []
    for c in wanted:
        if c in file_names:
            out.append(c)
        else:
            out.extend(o for o in inv.get(c, ()) if o in file_names)
    return out


def schema_to_json(schema: pa.Schema) -> str:
    """Serialize a schema for the manifest (Arrow IPC bytes, base64)."""
    return base64.b64encode(schema.serialize().to_pybytes()).decode("ascii")


def schema_from_json(data: str) -> pa.Schema:
    buf = base64.b64decode(data.encode("ascii"))
    return pa.ipc.read_schema(pa.BufferReader(buf))


def drop_internal(table: pa.Table) -> pa.Table:
    keep = [c for c in table.column_names if c not in INTERNAL_COLS]
    return table.select(keep)
