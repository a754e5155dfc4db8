"""Training-data mixing: deterministic epoch shuffle, fractional-weight
upsampling, and the distributed global-row-number utility they share.

These complete the corpus-prep family (sampling.py handles keep/drop
decisions; this module handles ORDER and REPETITION): a training run
needs a reproducible global permutation per epoch and per-source
repetition factors (e.g. "wiki ×2.3, web ×0.8"), both as pure
functions of (key, seed) so results are identical across runs, cluster
shapes, block layouts, and retries — Ray's ``random_shuffle`` re-draws
per execution and is layout-dependent; these never are.

Scale design: ``global_row_number`` is the same range-bucket
distributed prefix sum as sequence packing (stages/packing.py) — a
bounded key sample picks quantile boundaries, per-bucket counts (one
tiny row each) cumsum on the driver, ranks finish bucket-locally. No
full-data driver pull anywhere; upsampling is a pure per-batch
``np.repeat`` (no shuffle at all).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from palimpzest_ray.functions.tokens import duckdb_hash_i64
from palimpzest_ray.stages.sampling import _quantize, _unit_hash

_SAMPLE_CAP = 65536


def global_row_number(
    ds: rd.Dataset,
    order_cols: list[str],
    *,
    out: str = "pos",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Append a 0-based dense global rank over ``order_cols``
    (ascending). ``order_cols`` must define a TOTAL order (include a
    unique tiebreaker) — with ties the ranking of tied rows would
    depend on input layout, same as SQL ``row_number()``.

    Buckets must each fit one ``map_groups`` task; size ``num_buckets``
    to the data (same contract as the shuffle-join width)."""
    first = order_cols[0]
    # pinned: count, key sample, bucket counts, and ranking all read it
    ds = ds.materialize()
    n = ds.count()
    if n == 0:
        def _empty(batch: pa.Table) -> pa.Table:
            return batch.append_column(out, pa.array([], pa.int64()))

        return ds.map_batches(_empty, batch_format="pyarrow")
    step = max(1, n // _SAMPLE_CAP)

    def _thin(batch: pa.Table) -> pa.Table:
        return batch.select([first]).take(
            pa.array(range(0, batch.num_rows, step), pa.int64())
        )

    sample = np.sort(
        np.array(
            [r[first] for r in ds.map_batches(_thin, batch_format="pyarrow").take_all()]
        )
    )
    nb = min(num_buckets, sample.size)
    bounds = sample[np.linspace(0, sample.size - 1, nb + 1).astype(np.int64)][1:-1]

    def _with_bucket(batch: pa.Table) -> pa.Table:
        keys = batch[first].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_bucket", pa.array(np.searchsorted(bounds, keys, side="right"), pa.int64())
        )

    wide = ds.map_batches(_with_bucket, batch_format="pyarrow")
    counts = np.zeros(nb, dtype=np.int64)
    for r in wide.groupby("_bucket").count().take_all():
        counts[r["_bucket"]] = r["count()"]
    bases = np.zeros(nb, dtype=np.int64)
    np.cumsum(counts[:-1], out=bases[1:])

    def _rank(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bucket = group["_bucket"][0].as_py()
        group = group.take(
            pc.sort_indices(group, sort_keys=[(c, "ascending") for c in order_cols])
        )
        pos = bases[bucket] + np.arange(group.num_rows, dtype=np.int64)
        return group.drop_columns(["_bucket"]).append_column(
            out, pa.array(pos, pa.int64())
        )

    return wide.groupby("_bucket").map_groups(_rank, batch_format="pyarrow")


def deterministic_shuffle(
    ds: rd.Dataset,
    key: str,
    *,
    seed: int = 0,
    out: str = "pos",
    hash_fn: str = "stable",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Epoch shuffle: a reproducible global permutation as an explicit
    position column — rank over ``(hash(key xor seed), key)``. The key
    must be unique (it is the tiebreaker making the order total).
    Different seeds give independent permutations (epochs).

    ``hash_fn="duckdb"`` (integer keys) makes the permutation
    SQL-exact: ``row_number() over (order by hash(xor(key, seed)), key)
    - 1`` in DuckDB reproduces ``pos`` bit-for-bit."""

    def _with_hash(batch: pa.Table) -> pa.Table:
        keys = batch[key]
        if hash_fn == "duckdb":
            k = keys.to_numpy(zero_copy_only=False).astype(np.int64) ^ np.int64(seed)
            h = duckdb_hash_i64(k)
        else:
            h = (_unit_hash(keys, seed, hash_fn) * (2.0**53)).astype(np.uint64)
        return batch.append_column("_h", pa.array(h, pa.uint64()))

    ranked = global_row_number(
        ds.map_batches(_with_hash, batch_format="pyarrow"),
        ["_h", key],
        out=out,
        num_buckets=num_buckets,
    )

    def _drop(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(["_h"])

    return ranked.map_batches(_drop, batch_format="pyarrow")


def upsample_by_weight(
    ds: rd.Dataset,
    stratum_col: str,
    weights: dict[str, float],
    *,
    key: str,
    default: float = 1.0,
    seed: int = 0,
    out: str = "copy_idx",
    hash_fn: str = "stable",
) -> rd.Dataset:
    """Per-stratum repetition for training mixtures: a row with weight
    ``w`` appears ``floor(w)`` times plus one more when
    ``hash(key, seed) < frac(w)`` — so a 2.3× source repeats every row
    twice and a deterministic 30% of rows three times. ``out`` numbers
    the copies 0..k-1 (distinct rows for downstream shuffles). Weight 0
    (or a fractional weight whose hash draw misses) drops the row —
    upsampling and downsampling in one operator.

    Pure per-batch ``np.repeat``: no shuffle, no state. In
    ``hash_fn="duckdb"`` mode the DuckDB oracle is
    ``unnest(generate_series(0, copies - 1))`` over the same closed
    form."""
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for stratum {s!r}")
    if default < 0:
        raise ValueError("negative default weight")

    def _rep(batch: pa.Table) -> pa.Table:
        # dictionary-encode the stratum column so the Python weight-dict
        # lookup runs once per DISTINCT stratum (a handful), not per row
        enc = pc.dictionary_encode(batch[stratum_col])
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        per_val = np.array(
            [weights.get(s, default) for s in enc.dictionary.to_pylist()],
            dtype=np.float64,
        )
        base_v = np.floor(per_val)
        frac_v = np.array([_quantize(f, hash_fn) for f in per_val - base_v])
        codes = enc.indices
        if codes.null_count:  # null stratum -> default weight (as before)
            per_val = np.append(per_val, default)
            base_v = np.append(base_v, np.floor(default))
            frac_v = np.append(frac_v, _quantize(default - np.floor(default), hash_fn))
            codes = codes.fill_null(len(per_val) - 1)
        code_np = codes.to_numpy(zero_copy_only=False).astype(np.int64)
        base = base_v[code_np]
        frac = frac_v[code_np]
        extra = _unit_hash(batch[key], seed, hash_fn) < frac
        copies = (base + extra).astype(np.int64)
        idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), copies)
        taken = batch.take(pa.array(idx, pa.int64()))
        # copy index within each repeated row: arange minus the start
        # offset of its source row, vectorized
        starts = np.zeros(batch.num_rows + 1, dtype=np.int64)
        np.cumsum(copies, out=starts[1:])
        copy_idx = np.arange(len(idx), dtype=np.int64) - starts[idx]
        return taken.append_column(out, pa.array(copy_idx, pa.int64()))

    return ds.map_batches(_rep, batch_format="pyarrow")
