"""Per-data-file key Bloom sidecars: point lookups that provably skip files.

The lake is hash-partitioned on its key, so :func:`palimpzest_ray.cdc.engine.lookup`
already reads at most one partition CHAIN per key. What routing cannot
answer is *absence*: a lookup for a key that was never written still
opens the routed partition's base file (and every delta in its chain)
just to find nothing. At 1e5 partitions on object storage, existence
checks — dedup-at-ingest screening, anti-joins against the lake,
"has this doc been deleted?" probes — pay a full chain read per miss.

Each committed data file therefore carries an OPTIONAL tiny sidecar at
``<file>.bloom`` (written by the merge tasks from the exact key set of
the staged file, promoted atomically alongside it by ``commit_version``):
a classic Bloom filter over the file's keys, ~10 bits/key → ≈1% false
positives at k=7 hashes. The contract is strictly one-sided:

- bloom says "absent"  → the key is PROVABLY not in the file; skip it.
- bloom says "present" → maybe; read the file (false positives only
  cost the read we would have done anyway).
- sidecar missing      → unknown; read the file. Every pre-bloom lake,
  cloned lake, or hand-copied file keeps working unchanged.

Tombstoned keys are included on purpose: a delta file's tombstone must
be SEEN by chain resolution to kill its base row, so a file that holds
only a tombstone for key k must still answer "maybe" for k.

Hashes start from the engine's stable 64-bit xxhash (``functions.
tokens.stable_hash`` — process-independent), but BOTH probe bases are
splitmix64-finalized rather than using the raw hash: partition routing
is ``stable_hash % P``, so inside one partition every file key AND
every routed probe key shares the same residue mod P — a raw-``h1``
probe position would inherit that congruence (m is a multiple of 64,
hence of P for power-of-two P) and its effective bit density rises P×,
inflating the false-positive rate. Two independent finalizations
(distinct xor constants) break the correlation. Deterministic: same
key set → same sidecar bytes.

The reference has no lake/point-lookup machinery at all (its closest
analogue is the chromadb index handle on ``TopKOp``,
``/root/reference/src/palimpzest/query/operators/topk.py:73``); Bloom
sidecars are this engine's native answer to key-existence probes at
1e5-partition scale, in the spirit of Iceberg's puffin blobs / DuckDB's
row-group Bloom filters.
"""

from __future__ import annotations

import os
import struct
import uuid
from functools import lru_cache

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from palimpzest_ray.functions.tokens import stable_hash

_MAGIC = b"PZBF1\n"
BLOOM_SUFFIX = ".bloom"
BITS_PER_KEY = 10
NUM_HASHES = 7


def _mix(h: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 finalizer over ``h ^ salt`` — independent-enough probe
    bases for Kirsch–Mitzenmacher double hashing (probe_i = g1 + i*g2
    mod m needs only two base hashes). Both bases are finalized (never
    the raw ``stable_hash``): routing is ``stable_hash % P``, so raw-h1
    positions would carry the partition's mod-P congruence into the
    bitmap and multiply the false-positive rate by ~P."""
    x = h.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x ^= np.uint64(salt)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def _probe_bases(keys: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    h = stable_hash(keys)
    return _mix(h, 0x9E3779B97F4A7C15), _mix(h, 0xC2B2AE3D27D4EB4F)


def bloom_build(keys: pa.Array | pa.ChunkedArray) -> bytes:
    """Serialize a Bloom filter over ``keys`` (nulls ignored, duplicates
    collapse). Layout: 6-byte magic, ``<IQ`` (k, m_bits), bitmap."""
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    keys = pc.unique(keys.drop_null())
    n = max(1, len(keys))
    m = ((BITS_PER_KEY * n + 63) // 64) * 64  # multiple of 64 bits, ≥64
    bits = np.zeros(m // 8, dtype=np.uint8)
    if len(keys):
        h1, h2 = _probe_bases(keys)
        for i in range(NUM_HASHES):
            with np.errstate(over="ignore"):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
            np.bitwise_or.at(
                bits,
                (pos >> np.uint64(3)).astype(np.int64),
                (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
            )
    return _MAGIC + struct.pack("<IQ", NUM_HASHES, m) + bits.tobytes()


def bloom_might_contain(blob: bytes, keys: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Per-key membership test: False = provably absent, True = maybe
    present. Vectorized across the whole probe set."""
    if not blob.startswith(_MAGIC):
        raise ValueError("not a PZBF1 bloom sidecar")
    k, m = struct.unpack_from("<IQ", blob, len(_MAGIC))
    bits = np.frombuffer(blob, dtype=np.uint8, offset=len(_MAGIC) + 12)
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    h1, h2 = _probe_bases(keys)
    acc = np.ones(len(keys), dtype=bool)
    for i in range(k):
        with np.errstate(over="ignore"):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
        byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
        acc &= (byte >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1) > 0
    return acc


def write_bloom_sidecar(parquet_path: str, keys: pa.Array | pa.ChunkedArray) -> None:
    """Write ``<parquet_path>.bloom`` atomically (tmp+rename, idempotent
    under task retries like the data file it describes)."""
    blob = bloom_build(keys)
    tmp = f"{parquet_path}{BLOOM_SUFFIX}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, parquet_path + BLOOM_SUFFIX)


@lru_cache(maxsize=4096)
def _load_bloom_cached(sidecar_path: str) -> bytes | None:
    try:
        with open(sidecar_path, "rb") as f:
            return f.read()
    except FileNotFoundError:
        return None


def load_bloom(parquet_path: str) -> bytes | None:
    """Sidecar bytes for a COMMITTED data file, or None if absent.
    Committed files are immutable (new versions get new paths), so a
    process-level LRU on the path is safe."""
    return _load_bloom_cached(parquet_path + BLOOM_SUFFIX)
