"""Vectorized columnar kernels used across the engine.

All kernels are Arrow/numpy/polars vectorized — no Python loop touches a
row in any hot path. The reference computes everything record-at-a-time
over Pydantic objects (SURVEY.md §1.1); these kernels are the columnar
replacements.
"""

from __future__ import annotations

import os

# MUST precede the polars import: polars sizes its global thread pool at
# import time. Every Ray worker process would otherwise start an
# all-cores pool (observed: 30 workers x 32 threads on a 32-CPU node ->
# 40%+ kernel time, CPUs half idle, 32-CPU runs SLOWER than 8-CPU).
os.environ.setdefault("POLARS_MAX_THREADS", "2")

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

_kernel_threads_tuned = False


def limit_kernel_threads(n: int = 2) -> None:
    """Cap Arrow's per-process thread pools (idempotent; call at the top
    of every hot map stage). Arrow defaults each worker to an
    all-hardware-cores pool — same oversubscription storm as polars."""
    global _kernel_threads_tuned
    if not _kernel_threads_tuned:
        pa.set_cpu_count(n)
        pa.set_io_thread_count(max(2, n))
        _kernel_threads_tuned = True

_HASH_SEED = 0x51_7C_C1_B7  # fixed => stable across processes / runs


def stable_hash(values: pa.Array | pa.ChunkedArray, seed: int = _HASH_SEED) -> np.ndarray:
    """Deterministic 64-bit hash of a column, vectorized via polars.

    Python's builtin ``hash`` is salted per process so it can never be a
    partition function on a cluster; polars' xxhash-based ``Series.hash``
    is stable for a fixed seed. Works for strings, ints, and list
    columns (hashes the whole list per row).
    """
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    s = pl.from_arrow(values)
    return s.hash(seed=seed).to_numpy().astype(np.uint64)


def duckdb_hash_i64(values: pa.Array | pa.ChunkedArray | np.ndarray) -> np.ndarray:
    """DuckDB's ``hash()`` for integer columns, vectorized in numpy —
    the 64-bit murmur finalizer from duckdb's public source
    (``src/include/duckdb/common/types/hash.hpp``, ``murmurhash64``).

    Purpose: a hash BOTH engines can compute, so hash-derived operators
    (HLL registers, deterministic sampling membership) can carry an
    EXACT DuckDB SQL oracle — ``hash(col)`` in SQL reproduces this
    bit-for-bit (asserted in tests). Integer inputs only; duckdb's
    string hash is a different algorithm. ``stable_hash`` (polars
    xxhash) remains the engine-internal default."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        values = values.to_numpy(zero_copy_only=False)
    x = np.ascontiguousarray(values, dtype=np.int64).view(np.uint64).copy()
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(32)
        x *= np.uint64(0xD6E8FEB86659FD93)
        x ^= x >> np.uint64(32)
        x *= np.uint64(0xD6E8FEB86659FD93)
        x ^= x >> np.uint64(32)
    return x


def stable_bucket(
    values: pa.Array | pa.ChunkedArray, num_buckets: int, seed: int = _HASH_SEED
) -> np.ndarray:
    """``hash(key) % P`` partition assignment (int32), the shuffle key for
    upserts / dedup / joins (SURVEY.md §7.4)."""
    return (stable_hash(values, seed) % np.uint64(num_buckets)).astype(np.int32)


def first_per_key(
    table: pa.Table,
    key: str,
    order: list[tuple[str, str]] | None = None,
) -> pa.Table:
    """Keep the first row per ``key`` after sorting by ``[key] + order``.

    Fully vectorized: one ``sort_indices`` + one adjacent-inequality scan.
    With ``order=[("lsn", "descending")]`` this is the last-writer-wins
    reduction — the combiner run per batch before a shuffle and again per
    partition after it, which is what bounds shuffle volume for hot keys
    (a hot ``doc_id`` collapses to one row per input block, the salting
    equivalent described in SURVEY.md §7.5 item 3).
    """
    if table.num_rows <= 1:
        return table
    keys_col = table.column(key)
    if pc.count_distinct(keys_col).as_py() == table.num_rows:
        # no duplicate keys — nothing to reduce; skip the sort AND the
        # payload-rearranging take() (the common case for insert-heavy
        # change batches, where tokens dominate the bytes moved)
        return table
    sort_keys = [(key, "ascending")] + (order or [])
    idx = pc.sort_indices(table, sort_keys=sort_keys)
    t = table.take(idx)
    keys = t.column(key).combine_chunks()
    # row i survives iff keys[i] != keys[i-1]
    neq = pc.not_equal(keys.slice(1), keys.slice(0, len(keys) - 1))
    mask = np.ones(len(keys), dtype=bool)
    mask[1:] = neq.to_numpy(zero_copy_only=False)
    return t.filter(pa.array(mask))


def top_n_per_key(
    table: pa.Table,
    keys: list[str],
    order: list[tuple[str, str]],
    n: int,
    rank_col: str | None = None,
) -> pa.Table:
    """Keep the first ``n`` rows per key group after sorting by
    ``keys + order`` — the generalization of :func:`first_per_key`
    (n=1). Fully vectorized: one sort + one adjacent-inequality scan.
    ``rank_col`` optionally emits the 1-based row number within the
    group. Usable both as the map-side combiner (bounds shuffle volume
    to ≤n rows per key per block) and as the per-group finisher."""
    if table.num_rows == 0:
        return table
    sort_keys = [(k, "ascending") for k in keys] + list(order)
    idx = pc.sort_indices(table, sort_keys=sort_keys)
    t = table.take(idx)
    m = t.num_rows
    new_run = np.zeros(m, dtype=bool)
    new_run[0] = True
    for k in keys:
        col = t.column(k).combine_chunks()
        neq = pc.not_equal(col.slice(1), col.slice(0, m - 1))
        # null vs null compares null — same run; null vs value differs
        neq = pc.coalesce(
            neq, pc.xor(pc.is_null(col.slice(1)), pc.is_null(col.slice(0, m - 1)))
        )
        new_run[1:] |= neq.to_numpy(zero_copy_only=False)
    pos = np.arange(m)
    rank = pos - np.maximum.accumulate(np.where(new_run, pos, 0))
    mask = rank < n
    out = t.filter(pa.array(mask))
    if rank_col is not None:
        out = out.append_column(rank_col, pa.array(rank[mask] + 1, pa.int64()))
    return out


def token_length(tokens: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """``n_tok`` derivation: ``pc.list_value_length`` (null-safe)."""
    return pc.list_value_length(tokens).cast(pa.int32())


def token_fingerprint(tokens: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Stable 64-bit fingerprint of each token array (for dedup /
    equality checks without shipping the full payload)."""
    return stable_hash(tokens)
