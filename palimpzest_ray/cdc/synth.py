"""Deterministic synthetic data: base lake + CDC change log.

Pure functions of ``(seed, n_rows)`` (FIXTURES.md §6) — no wall clock,
no unseeded RNG. Generation is fully vectorized (numpy arrays ->
``pa.ListArray.from_arrays``), so bench-scale logs (10^6+ events)
generate in seconds; large logs are written in chunks so generation
memory stays bounded.

Workload shape (FIXTURES.md §1-3):
- base table: ``doc-{i:08d}`` keys, token arrays of length 8-512 with
  values in [0, 50257).
- change log: strictly increasing ``lsn``; op mix 50/35/15
  INSERT/UPDATE/DELETE; Zipf(s=1.1)-skewed ``doc_id`` over existing ∪
  new keys (hot-key skew is intentional); DELETE rows carry null
  tokens/n_tok; an optional evolution epoch adds ``token_meta`` /
  ``shard`` columns after a cutover fraction.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from palimpzest_ray.schemas import SEQUENCE_SCHEMA

VOCAB = 50257
MIN_LEN, MAX_LEN = 8, 512
SOURCES = np.array(["web", "books", "code", "wiki"])
EVOLVED_SOURCES = np.array(["web", "books", "code", "wiki", "synthetic"])
LANGS = np.array(["en", "de", "fr", "es", "zh"])


def _doc_ids(idx: np.ndarray) -> pa.Array:
    # vectorized f"doc-{i:08d}"
    return pa.array(np.char.add("doc-", np.char.zfill(idx.astype("U8"), 8)))


def _token_lists(rng: np.random.Generator, n: int) -> tuple[pa.ListArray, np.ndarray]:
    lens = rng.integers(MIN_LEN, MAX_LEN + 1, size=n, dtype=np.int64)
    # float32 random + scale instead of bounded integers: ~50x faster for
    # the ~260-token-per-row draws that dominate bench-scale generation
    # (Lemire bounded rejection is ~1µs/value at this width; the float
    # path is SIMD). Uniformity loss (float32 grid) is irrelevant here.
    values = (
        rng.random(int(lens.sum()), dtype=np.float32) * VOCAB
    ).astype(np.int32)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    arr = pa.LargeListArray.from_arrays(pa.array(offsets, type=pa.int64()), pa.array(values))
    # canonical type is list<int32>; cast keeps offsets int32 (fine below 2^31 values per chunk)
    return arr.cast(pa.list_(pa.int32())), lens.astype(np.int32)


def make_base_table(n_rows: int, seed: int = 42) -> pa.Table:
    """Base lake: unique doc_ids ``doc-00000000..``, seeded token arrays."""
    rng = np.random.default_rng(seed)
    tokens, lens = _token_lists(rng, n_rows)
    return pa.table(
        {
            "doc_id": _doc_ids(np.arange(n_rows, dtype=np.int64)),
            "tokens": tokens,
            "n_tok": pa.array(lens),
            "source": pa.array(SOURCES[rng.integers(0, len(SOURCES), n_rows)]),
        }
    ).cast(SEQUENCE_SCHEMA)


def make_change_table(
    n_events: int,
    n_base: int,
    seed: int = 43,
    start_lsn: int = 1,
    zipf_s: float = 1.1,
    new_key_space: int | None = None,
    evolved: bool = False,
    op_mix: tuple[float, float, float] = (0.50, 0.35, 0.15),
) -> pa.Table:
    """One chunk of the CDC log.

    Keys are Zipf-skewed ranks mapped over ``[0, n_base + new_key_space)``
    so updates hit existing rows, inserts create new ones, and a handful
    of hot keys receive a large share of events (skew-handling test).
    With ``evolved=True`` the chunk carries the schema-evolution columns.
    """
    rng = np.random.default_rng(seed)
    key_space = n_base + (new_key_space if new_key_space is not None else max(n_base // 2, 4))
    # Zipf ranks can exceed key_space; fold back in. Rank 1 = hottest key.
    ranks = rng.zipf(zipf_s, size=n_events)
    key_idx = (ranks - 1) % key_space
    # shuffle which physical key is "hot" (deterministic permutation)
    perm = rng.permutation(key_space)
    key_idx = perm[key_idx]

    ops = rng.choice(np.array(["INSERT", "UPDATE", "DELETE"]), size=n_events, p=list(op_mix))
    is_delete = ops == "DELETE"

    tokens, lens = _token_lists(rng, n_events)
    # tombstones: null tokens/n_tok — take() with null indices yields nulls.
    take_idx = pa.array(np.arange(n_events, dtype=np.int64), mask=is_delete)
    tokens = tokens.take(take_idx)
    n_tok = pa.array(lens, mask=is_delete)

    src_pool = EVOLVED_SOURCES if evolved else SOURCES
    source = pa.array(
        np.where(is_delete, None, src_pool[rng.integers(0, len(src_pool), n_events)])
    )

    cols = {
        "lsn": pa.array(np.arange(start_lsn, start_lsn + n_events, dtype=np.int64)),
        "op": pa.array(ops),
        "doc_id": _doc_ids(key_idx.astype(np.int64)),
        "tokens": tokens,
        "n_tok": n_tok,
        "source": source,
    }
    if evolved:
        lang = pa.array(np.where(is_delete, None, LANGS[rng.integers(0, len(LANGS), n_events)]))
        quality = pa.array(
            rng.random(n_events, dtype=np.float32), type=pa.float32(), mask=is_delete
        )
        cols["token_meta"] = pa.StructArray.from_arrays(
            [lang, quality], names=["lang", "quality"], mask=pa.array(is_delete)
        )
        cols["shard"] = pa.array(rng.integers(0, 64, n_events, dtype=np.int32), mask=is_delete)
    return pa.table(cols)


def write_base_lake(path: str, n_rows: int, seed: int = 42, chunk_rows: int = 200_000) -> None:
    """Write the base table as Parquet in bounded-memory chunks."""
    os.makedirs(path, exist_ok=True)
    writer = None
    for i, lo in enumerate(range(0, n_rows, chunk_rows)):
        n = min(chunk_rows, n_rows - lo)
        rng = np.random.default_rng((seed, i))
        tokens, lens = _token_lists(rng, n)
        t = pa.table(
            {
                "doc_id": _doc_ids(np.arange(lo, lo + n, dtype=np.int64)),
                "tokens": tokens,
                "n_tok": pa.array(lens),
                "source": pa.array(SOURCES[rng.integers(0, len(SOURCES), n)]),
            }
        ).cast(SEQUENCE_SCHEMA)
        if writer is None:
            writer = pq.ParquetWriter(os.path.join(path, "base.parquet"), t.schema)
        writer.write_table(t, row_group_size=32768)
    if writer is not None:
        writer.close()


def write_change_log(
    path: str,
    n_events: int,
    n_base: int,
    seed: int = 43,
    chunk_rows: int = 200_000,
    evolve_after: float | None = None,
    start_lsn: int = 1,
    **kw,
) -> None:
    """Write the change log as multiple Parquet files (one per chunk) —
    the on-disk shape of a binlog/WAL tail, and what lets
    ``read_parquet`` parallelize the read at any scale.

    ``evolve_after``: fraction of the log after which chunks carry the
    evolved schema (mid-stream schema change).
    """
    os.makedirs(path, exist_ok=True)
    n_chunks = max(1, -(-n_events // chunk_rows))
    for i, lo in enumerate(range(0, n_events, chunk_rows)):
        n = min(chunk_rows, n_events - lo)
        evolved = evolve_after is not None and (i / n_chunks) >= evolve_after
        t = make_change_table(
            n, n_base, seed=(seed * 1_000_003 + i) % (2**31), start_lsn=lo + start_lsn, evolved=evolved, **kw
        )
        pq.write_table(t, os.path.join(path, f"changes-{i:05d}.parquet"), row_group_size=32768)
