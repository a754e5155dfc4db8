"""Deterministic sampling and dataset splitting for training pipelines.

All operators here are HASH-based, not RNG-based: membership is a pure
function of ``(key, seed)``, so results are identical across runs,
cluster shapes, block layouts, and retries — the property that matters
for reproducible training sets. (Ray's ``random_sample`` re-draws per
execution; these never do.) And because membership travels with the
key, a train/val split can never leak a key across sides even when the
same key appears in many rows or many input files.

No shuffle anywhere: each operator is one vectorized ``map_batches``
filter over the engine's ``stable_hash`` (polars xxhash, fixed seed).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from palimpzest_ray.functions.tokens import duckdb_hash_i64, stable_hash

_SCALE = float(2**64)
_DUCKDB_MOD = 1_000_000  # membership granularity of the SQL-exact mode


def _unit_hash(
    values: pa.Array | pa.ChunkedArray, seed: int, hash_fn: str = "stable"
) -> np.ndarray:
    """Map each value to a deterministic uniform float in [0, 1).

    ``hash_fn="duckdb"`` (integer key columns; ``seed`` ignored — duckdb
    ``hash()`` is unseeded) quantizes membership to 1e-6 via
    ``hash(key) % 1_000_000``, so a DuckDB oracle states the identical
    predicate: ``WHERE hash(key) % 1000000 < round(frac * 1e6)``."""
    if hash_fn == "duckdb":
        return (
            (duckdb_hash_i64(values) % np.uint64(_DUCKDB_MOD)).astype(np.float64)
            / _DUCKDB_MOD
        )
    return stable_hash(values, seed=seed & 0x7FFFFFFF).astype(np.float64) / _SCALE


def _quantize(fraction: float, hash_fn: str) -> float:
    """In duckdb mode the effective threshold is an integer count of
    1e-6 buckets — mirror the oracle's ``round(frac * 1e6)`` exactly."""
    if hash_fn == "duckdb":
        return round(fraction * _DUCKDB_MOD) / _DUCKDB_MOD
    return fraction


def deterministic_sample(
    ds: rd.Dataset, key: str, fraction: float, seed: int = 0,
    hash_fn: str = "stable",
) -> rd.Dataset:
    """Keep rows with ``hash(key, seed)/2^64 < fraction``. Same key ⇒
    same decision everywhere (all rows of a duplicated key survive or
    drop together)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    fraction = _quantize(fraction, hash_fn)

    def _f(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pa.array(_unit_hash(batch[key], seed, hash_fn) < fraction)
        )

    return ds.map_batches(_f, batch_format="pyarrow")


def stratified_sample(
    ds: rd.Dataset,
    strata_col: str,
    fractions: dict[str, float],
    key: str,
    default: float = 0.0,
    seed: int = 0,
    hash_fn: str = "stable",
) -> rd.Dataset:
    """Per-stratum sampling rates (e.g. downsample web, keep all code):
    row survives iff ``hash(key) < fractions[stratum]``. Strata absent
    from ``fractions`` use ``default``."""
    fractions = {s: _quantize(f, hash_fn) for s, f in fractions.items()}
    default = _quantize(default, hash_fn)

    def _f(batch: pa.Table) -> pa.Table:
        u = _unit_hash(batch[key], seed, hash_fn)
        strata = batch[strata_col].to_pylist()
        thresh = np.array([fractions.get(s, default) for s in strata])
        return batch.filter(pa.array(u < thresh))

    return ds.map_batches(_f, batch_format="pyarrow")


def hash_split(
    ds: rd.Dataset, key: str, val_fraction: float, seed: int = 0,
    hash_fn: str = "stable",
) -> tuple[rd.Dataset, rd.Dataset]:
    """Leakage-safe train/val split: a key lands wholly on one side,
    deterministically. Returns ``(train, val)``."""
    if not 0.0 <= val_fraction <= 1.0:
        raise ValueError("val_fraction must be in [0, 1]")
    val_fraction = _quantize(val_fraction, hash_fn)

    def _side(val: bool):
        def _f(batch: pa.Table) -> pa.Table:
            in_val = _unit_hash(batch[key], seed, hash_fn) < val_fraction
            return batch.filter(pa.array(in_val if val else ~in_val))

        return _f

    return (
        ds.map_batches(_side(False), batch_format="pyarrow"),
        ds.map_batches(_side(True), batch_format="pyarrow"),
    )
