"""Distributed exact-key ingest screen: which candidate rows are NEW?

``engine.contains_keys`` answers key existence from the driver — right
for probe sets up to ~1e5 keys. An ingest pipeline asks the same
question about its whole stream ("drop everything we already hold"),
where the probe set is lake-sized and a driver loop is the anti-pattern
the scale rules forbid. This module is the streaming answer:

1. **Bloom phase** (``map_batches`` tasks, per-worker memoized state):
   each worker process loads the pinned manifest once and lazily caches
   the per-file key-Bloom sidecars (KBs each) for the partitions its
   batches route to. A key
   whose routed chain answers "absent" in EVERY file is PROVABLY new —
   it exits here, touching no parquet and never entering a shuffle. For
   mostly-new ingest (the crawl steady state) that is ~99% of rows at
   ~1% false-positive rate.
2. **Confirm phase**: only the "maybe present" residue pays the
   distributed shuffle anti-join against the lake's live keys at the
   same pinned version. False positives (and genuinely-present keys,
   and tombstoned keys whose files still hold their ghost) are resolved
   exactly here — tombstoned keys count as NEW (they are not live),
   matching ``contains_keys``.

Correctness does not depend on the sidecars at all: a missing sidecar
just routes its file's keys to the confirm phase (read-as-before), and
blooms are one-sided, so no live key can sneak past phase 1. Lakes
partitioned by a non-key column skip phase 1 entirely (their sidecars
index the routing column, not the key) and run the pure anti-join.

Caveat: the result unions the two phase outputs, each a branch off the
same mapped input — Ray Data re-executes the upstream per branch, so
feed a re-readable source (a parquet read / a materialized dataset),
not a one-shot generator.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from palimpzest_ray.cdc.engine import final_state, load_latest_manifest

_MAYBE = "__maybe_in_lake"


class _BloomScreen:
    """Per-worker stage state: mark each row "maybe present" unless its
    routed chain's sidecars prove absence. Instantiated inside plain
    ``map_batches`` TASKS and memoized per worker process (see
    ``_screen_for``) — same discipline as ``MergeApplier``: tasks
    recover from worker death via lineage retry with no actor-restart
    hazard (ray#53727), while process reuse keeps the manifest parse and
    sidecar byte cache warm across batches."""

    def __init__(self, lake_root: str, version: int):
        from palimpzest_ray.cdc.manifest import load_manifest

        m = load_manifest(lake_root, version)
        self.key = m.key
        self.num_partitions = m.num_partitions
        self.chains = {p: m.chain(lake_root, p) for p in m.parts}
        self._blooms: dict[str, bytes | None] = {}

    def _bloom(self, path: str) -> bytes | None:
        if path not in self._blooms:
            from palimpzest_ray.cdc.bloom import BLOOM_SUFFIX

            try:
                with open(path + BLOOM_SUFFIX, "rb") as f:
                    self._blooms[path] = f.read()
            except FileNotFoundError:
                self._blooms[path] = None
        return self._blooms[path]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from palimpzest_ray.cdc.bloom import bloom_might_contain
        from palimpzest_ray.functions.tokens import stable_bucket

        keys = batch[self.key]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        maybe = np.zeros(batch.num_rows, dtype=bool)
        valid = pc.is_valid(keys).to_numpy(zero_copy_only=False)
        if valid.any():
            buckets = stable_bucket(keys, self.num_partitions)
            for p in np.unique(buckets[valid]):
                chain = self.chains.get(int(p))
                if not chain:
                    continue  # partition never written: provably new
                sel = valid & (buckets == p)
                routed = keys.filter(pa.array(sel))
                part_maybe = np.zeros(len(routed), dtype=bool)
                for path in chain:
                    blob = self._bloom(path)
                    if blob is None:
                        part_maybe[:] = True  # can't prove; confirm phase
                        break
                    part_maybe |= bloom_might_contain(blob, routed)
                maybe[np.flatnonzero(sel)] = part_maybe
        return batch.append_column(_MAYBE, pa.array(maybe))


#: worker-process memo: committed versions are immutable, so state keyed
#: by (lake_root, version) never goes stale; bounded to a handful of
#: lakes per worker
_SCREEN_CACHE: dict[tuple[str, int], _BloomScreen] = {}


def _screen_for(lake_root: str, version: int) -> _BloomScreen:
    k = (lake_root, version)
    s = _SCREEN_CACHE.get(k)
    if s is None:
        while len(_SCREEN_CACHE) >= 4:
            _SCREEN_CACHE.pop(next(iter(_SCREEN_CACHE)))
        s = _SCREEN_CACHE[k] = _BloomScreen(lake_root, version)
    return s


def screen_new_keys(
    lake_root: str,
    ds,
    *,
    version: int | None = None,
):
    """Rows of ``ds`` whose lake-key is NOT live in the lake at the
    pinned ``version`` (default: current head — pinned up front so both
    phases agree while writers advance). Returns a
    :class:`palimpzest_ray.dataset.Dataset`; row order is not defined.
    Null-key rows pass through as new (nothing null is ever live)."""
    from palimpzest_ray.dataset import Dataset as PzDataset

    m = load_latest_manifest(lake_root)
    if m is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    pinned = m.version if version is None else version
    if isinstance(ds, PzDataset):
        ds = ds.ray
    key = m.key

    live = PzDataset(final_state(lake_root, version=pinned, columns=[key]))

    if m.partition_key is not None and m.partition_key != key:
        # sidecars index the routing column, not the key: no phase 1
        return PzDataset(ds).anti_join(live, key, strategy="shuffle")

    def _mark(batch: pa.Table) -> pa.Table:
        return _screen_for(lake_root, pinned)(batch)

    marked = ds.map_batches(_mark, batch_format="pyarrow")
    new = PzDataset(marked).filter(
        batch_fn=lambda b: b.filter(pc.invert(b[_MAYBE])).drop_columns([_MAYBE])
    )
    residue = PzDataset(marked).filter(
        batch_fn=lambda b: b.filter(b[_MAYBE]).drop_columns([_MAYBE])
    )
    confirmed = residue.anti_join(live, key, strategy="shuffle")
    return new.union(confirmed)
