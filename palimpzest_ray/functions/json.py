"""JSON extraction over string columns (duckdb ``json_extract_*``
semantics for simple ``$.a.b`` paths).

Arrow has no JSON kernels, so this is the one scalar family that is a
per-row pass — but the work per row is CPython's C ``json`` parser, and
it runs inside ``map_batches`` workers, so it distributes like any
other stage. At 100 TB you'd parse each document ONCE into typed
columns at ingest (``json_to_columns``) rather than re-extracting per
query — that helper is the scale path.

Reference cite: the closest analogue is the reference's per-record
field parsing in ``scan.py:95-124`` (dict validation), also per-row.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc


def _parse_path(path: str) -> list[str]:
    """'$.a.b' | 'a.b' -> ['a', 'b'] (simple object paths only)."""
    p = path[2:] if path.startswith("$.") else path.lstrip("$")
    keys = [k for k in p.split(".") if k]
    if not keys:
        raise ValueError(f"unsupported JSON path: {path!r}")
    return keys


def _extract_py(a, keys: list[str]):
    out = []
    loads = json.loads
    for chunk in a.chunks if isinstance(a, pa.ChunkedArray) else [a]:
        for s in chunk.to_pylist():
            if s is None:
                out.append(None)
                continue
            try:
                v = loads(s)
            except (ValueError, TypeError):
                out.append(None)
                continue
            for k in keys:
                if not isinstance(v, dict) or k not in v:
                    v = None
                    break
                v = v[k]
            out.append(v)
    return out


def json_extract_string(a, path: str):
    """duckdb ``json_extract_string``: scalars stringified as JSON text
    (87 -> '87', true -> 'true'), strings unquoted, objects/arrays as
    compact JSON, missing key / invalid JSON -> null."""
    vals = _extract_py(a, _parse_path(path))
    out = []
    for v in vals:
        if v is None:
            out.append(None)
        elif isinstance(v, str):
            out.append(v)
        elif isinstance(v, bool):
            out.append("true" if v else "false")
        elif isinstance(v, (dict, list)):
            out.append(json.dumps(v, separators=(",", ":")))
        else:
            out.append(json.dumps(v))
    return pa.array(out, pa.string())


def json_extract_int(a, path: str):
    """duckdb ``json_extract(...)::BIGINT``: integral values pass through;
    non-integral doubles round half-to-even (duckdb DOUBLE->BIGINT cast),
    not truncate-toward-zero."""
    vals = _extract_py(a, _parse_path(path))
    return pa.array(
        [
            (v if isinstance(v, int) else int(round(v)))
            if isinstance(v, (int, float)) and not isinstance(v, bool)
            else None
            for v in vals
        ],
        pa.int64(),
    )


def json_extract_double(a, path: str):
    vals = _extract_py(a, _parse_path(path))
    return pa.array(
        [float(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else None for v in vals],
        pa.float64(),
    )


def json_valid(a):
    def ok(s):
        if s is None:
            return None
        try:
            json.loads(s)
            return True
        except (ValueError, TypeError):
            return False

    vals = []
    for chunk in a.chunks if isinstance(a, pa.ChunkedArray) else [a]:
        vals.extend(ok(s) for s in chunk.to_pylist())
    return pa.array(vals, pa.bool_())


def json_to_columns(a, fields: dict[str, pa.DataType]):
    """Parse each document ONCE into typed arrays — the ingest-time
    scale path. ``fields`` maps top-level key -> Arrow type; returns
    ``{name: pa.Array}`` ready for ``Table.append_column``."""
    cols: dict[str, list] = {k: [] for k in fields}
    loads = json.loads
    for chunk in a.chunks if isinstance(a, pa.ChunkedArray) else [a]:
        for s in chunk.to_pylist():
            obj = None
            if s is not None:
                try:
                    obj = loads(s)
                except (ValueError, TypeError):
                    obj = None
            for k in fields:
                v = obj.get(k) if isinstance(obj, dict) else None
                cols[k].append(v)
    return {k: pa.array(vs, t) for (k, t), vs in zip(fields.items(), cols.values())}
