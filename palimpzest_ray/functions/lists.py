"""Vectorized list/array functions over Arrow ``list<T>`` columns.

The reference's only list-typed computation is elementwise sum/min/max
of list fields inside its groupby (``aggregate.py:65-122``) — done with
Python ``zip`` loops over materialized records. Here every per-row list
reduction is a segmented numpy reduce over the flattened child values
(``np.<op>.reduceat`` on the list offsets) — no Python loop, zero-copy
from the Arrow buffers.

Accumulation dtype: sums/means over float children accumulate in
float64 sequentially left-to-right, which is bit-identical to duckdb's
``list_sum`` over ``FLOAT[]`` (it also upcasts then accumulates in
order). Null semantics are duckdb's throughout: null ELEMENTS are
skipped (``list_sum([1, NULL, 2]) = 3``); empty, all-null, and null
lists reduce to NULL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def list_len(a):
    """Elements per row (SQL ``len(arr)``); null list -> null."""
    return pc.list_value_length(a)


def list_get(a, index: int, *, one_based: bool = False):
    """Element at ``index``; null when the row's list is too short or
    null (SQL ``arr[n]`` semantics — ``pc.list_element`` instead raises
    on any short row). Python 0-based by default; ``one_based=True``
    for the SQL convention."""
    i = index - 1 if one_based else index
    if i < 0:
        raise ValueError("negative indices unsupported")
    sl = pc.list_slice(a, i, i + 1)
    flat = pc.list_flatten(sl)  # exactly one value per row that has one
    has = pc.fill_null(pc.equal(pc.list_value_length(sl), 1), False)
    has = np.asarray(has.to_numpy(zero_copy_only=False), dtype=bool)
    idx = np.cumsum(has) - 1
    indices = pa.array(idx, pa.int64(), mask=~has)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return flat.take(indices)


def list_slice(a, start: int, stop: int | None = None):
    return pc.list_slice(a, start, stop)


def flatten(a):
    return pc.list_flatten(a)


def _segments(a):
    """(values, offsets, row_null_mask, element_valid_mask) for one
    combined ListArray. Null child elements surface as NaN after
    ``to_numpy`` (ints upcast to float64 when nulls are present)."""
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    offs = a.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    # A sliced (zero-copy offset) ListArray keeps the FULL child values
    # buffer while its offsets window into it: normalize to a compacted
    # view so segment reductions (reduceat uses only starts) can't run
    # past the logical end of the last row or start before the first.
    base = int(offs[0]) if len(offs) else 0
    end = int(offs[-1]) if len(offs) else 0
    values = a.values
    if base != 0 or end != len(values):
        values = values.slice(base, end - base)
        offs = offs - base
    vals = values.to_numpy(zero_copy_only=False)
    nulls = a.is_null().to_numpy(zero_copy_only=False)
    if values.null_count:
        valid = values.is_valid().to_numpy(zero_copy_only=False)
    else:
        valid = None  # fast path: no per-element masking needed
    return vals, offs, nulls, valid


def _segmented(a, ufunc, identity, cast_f64: bool = False):
    """Per-row reduce, skipping null elements (duckdb ``list_<agg>``
    semantics: ``list_sum([1, NULL, 2]) = 3``; an all-null or empty or
    null list yields NULL)."""
    vals, offs, nulls, valid = _segments(a)
    starts, ends = offs[:-1], offs[1:]
    if cast_f64 and vals.dtype != np.float64:
        vals = vals.astype(np.float64)
    # reduceat misbehaves on empty segments (returns vals[start]) and on a
    # trailing start == len(vals); clamp then mask those rows to null.
    safe = np.minimum(starts, max(len(vals) - 1, 0))
    if valid is None:
        n_valid = ends - starts
    else:
        vals = np.where(valid, vals, identity)
        vcum = np.concatenate([[0], np.cumsum(valid)])
        n_valid = vcum[ends] - vcum[starts]
    out = ufunc.reduceat(vals, safe) if len(vals) else np.zeros(len(starts), vals.dtype)
    mask = nulls | (n_valid == 0)
    arr = pa.array(out)
    return pc.if_else(pa.array(~mask), arr, pa.scalar(None, arr.type))


def list_sum(a):
    return _segmented(a, np.add, 0.0, cast_f64=True)


def list_min(a):
    return _segmented(a, np.minimum, np.inf)


def list_max(a):
    return _segmented(a, np.maximum, -np.inf)


def _valid_count(a):
    vals, offs, nulls, valid = _segments(a)
    starts, ends = offs[:-1], offs[1:]
    if valid is None:
        n = ends - starts
    else:
        vcum = np.concatenate([[0], np.cumsum(valid)])
        n = vcum[ends] - vcum[starts]
    return n, nulls


def list_mean(a):
    """duckdb ``list_avg``: mean over the NON-NULL elements."""
    s = list_sum(a)
    n, _ = _valid_count(a)
    nn = pa.array(n.astype(np.float64))
    return pc.divide(s, pc.if_else(pc.equal(nn, 0), pa.scalar(None, pa.float64()), nn))


def list_contains(a, value):
    """SQL ``list_contains`` — True/False per row, null list -> null;
    null elements never match (duckdb parity)."""
    vals, offs, nulls, _valid = _segments(a)
    starts, ends = offs[:-1], offs[1:]
    hit = vals == value  # NaN (null element) compares False
    cum = np.concatenate([[0], np.cumsum(hit)])
    out = cum[ends] > cum[starts]
    return pc.if_else(pa.array(~nulls), pa.array(out), pa.scalar(None, pa.bool_()))
