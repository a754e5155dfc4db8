"""Order-insensitive lake content digests: replica verification.

``sync_replica`` / subscription consumers converge by LWW — but an
operator running a replica fleet wants a cheap PROOF of convergence,
not a faith statement. ``lake_digest`` streams the live state once
(pruned columns, map-side combine — one u64 per block crosses the
cluster) and folds every row into a commutative 64-bit digest:

- per column, a seeded xxhash (``functions.tokens.stable_hash`` —
  strings, ints, floats, bools and whole ``list`` payloads per row),
  the seed derived from the COLUMN NAME so transposed columns cannot
  cancel;
- per row, the column hashes mix multiplicatively (odd constants) and
  xor — order of rows then cannot matter because blocks combine by
  64-bit SUM, so the digest is independent of partition count, block
  order and physical layout: a 4-partition source and a 64-partition
  replica of the same logical state digest identically.

Equal digests are an overwhelming (not cryptographic) indicator of
equality — a 64-bit accumulator is collision-scarce for fleet
verification, and deliberate forgery is out of scope (an operator
verifying their own replicas). ``verify_replica`` compares two lakes
and reports per-side row counts and digests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["lake_digest", "verify_replica"]

_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _row_hashes(batch: pa.Table, columns: list[str]) -> np.ndarray:
    from palimpzest_ray.functions.tokens import stable_hash

    acc = np.full(batch.num_rows, _MIX, dtype=np.uint64)
    for c in columns:
        seed = int(
            stable_hash(pa.array([c]))[0] | np.uint64(1)
        )  # odd, name-derived
        h = stable_hash(batch[c], seed=seed % (1 << 63))
        acc = (acc * _MIX) ^ h
    return acc


def lake_digest(
    lake_root: str,
    *,
    version: int | None = None,
    tag: str | None = None,
    columns: list[str] | None = None,
) -> dict:
    """Digest of the LIVE state at a version/tag (default head).
    ``columns`` restricts the digest to a projection (compare replicas
    that carry only a column subset)."""
    from palimpzest_ray.cdc.engine import final_state

    ds = final_state(lake_root, version=version, tag=tag, columns=columns)

    def _combine(batch: pa.Table) -> pa.Table:
        from palimpzest_ray.functions.tokens import limit_kernel_threads

        limit_kernel_threads()
        cols = columns or sorted(batch.column_names)
        if batch.num_rows == 0:
            return pa.table(
                {"n": pa.array([0], pa.int64()),
                 "d": pa.array([0], pa.uint64())}
            )
        h = _row_hashes(batch, cols)
        return pa.table(
            {
                "n": pa.array([batch.num_rows], pa.int64()),
                # u64 wrap-around sum — commutative block combine
                "d": pa.array([int(np.sum(h, dtype=np.uint64))],
                              pa.uint64()),
            }
        )

    total = np.uint64(0)
    rows = 0
    for b in ds.map_batches(_combine, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=4096
    ):
        rows += int(np.sum(b["n"].to_numpy(zero_copy_only=False)))
        total = total + np.uint64(
            np.sum(b["d"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        )
    return {"rows": rows, "digest": f"{int(total):016x}"}


def verify_replica(
    src_root: str,
    dst_root: str,
    *,
    src_version: int | None = None,
    dst_version: int | None = None,
    columns: list[str] | None = None,
) -> dict:
    """Compare two lakes' live content (layout-independent). Returns
    ``{"match": bool, "src": {...}, "dst": {...}}`` — the operator's
    convergence proof after ``sync_replica`` / subscription catch-up."""
    a = lake_digest(src_root, version=src_version, columns=columns)
    b = lake_digest(dst_root, version=dst_version, columns=columns)
    return {"match": a == b, "src": a, "dst": b}
