"""Key-Bloom sidecars: absent-key lookups open ZERO parquet files.

The lake's hash routing bounds a lookup to one partition chain per key;
the per-file Bloom sidecar (``cdc/bloom.py``) additionally proves
*absence*, so existence probes against a 1e5-partition lake cost a KB
sidecar read instead of an MB chain read. These tests pin the filter's
one-sided contract (no false negatives ever), the sidecar lifecycle
(merge → promote → compact → vacuum → clone), and the read-spy proof
that a miss opens no data file.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from palimpzest_ray.cdc import apply_changes
from palimpzest_ray.cdc.bloom import (
    BLOOM_SUFFIX,
    bloom_build,
    bloom_might_contain,
)
from palimpzest_ray.cdc.engine import final_state_table, lookup
from palimpzest_ray.cdc.manifest import load_latest_manifest

from tests.test_cdc_engine import (  # noqa: F401
    _seed_lake,
    _write,
    base_and_changes,
)


def test_bloom_no_false_negatives_and_low_fpp():
    keys = pa.array([f"doc-{i}" for i in range(5000)])
    blob = bloom_build(keys)
    assert bloom_might_contain(blob, keys).all()  # one-sided: never FN
    absent = pa.array([f"nope-{i}" for i in range(5000)])
    fpp = bloom_might_contain(blob, absent).mean()
    assert fpp < 0.05  # 10 bits/key, k=7 → ~1% expected
    # int keys hash through the same stable path
    ikeys = pa.array(np.arange(1000), pa.int64())
    iblob = bloom_build(ikeys)
    assert bloom_might_contain(iblob, ikeys).all()
    assert bloom_might_contain(iblob, pa.array([10**9 + 7], pa.int64())).mean() < 0.1


def test_every_committed_data_file_has_a_sidecar(tmp_path, tmp_lake, base_and_changes):
    base, changes = base_and_changes
    _seed_lake(tmp_path, tmp_lake, base)
    p = _write(tmp_path, "log/changes.parquet", changes)
    apply_changes(p, tmp_lake, num_partitions=8)
    m = load_latest_manifest(tmp_lake)
    files = m.data_files(tmp_lake)
    assert files and all(os.path.exists(f + BLOOM_SUFFIX) for f in files)


def test_absent_key_lookup_opens_zero_parquet_files(
    tmp_path, tmp_lake, base_and_changes, monkeypatch
):
    import pyarrow.parquet as real_pq

    base, changes = base_and_changes
    _seed_lake(tmp_path, tmp_lake, base)
    p = _write(tmp_path, "log/changes.parquet", changes)
    apply_changes(p, tmp_lake, num_partitions=8)

    calls = {"n": 0}
    orig = real_pq.read_table

    def counting(path, *a, **k):
        calls["n"] += 1
        return orig(path, *a, **k)

    monkeypatch.setattr(real_pq, "read_table", counting)
    got = lookup(tmp_lake, [f"definitely-absent-{i}" for i in range(20)])
    assert got.num_rows == 0
    # 20 absent keys over 8 partitions: bloom may false-positive a file
    # or two, but routing alone would have read ~8 chains
    assert calls["n"] <= 2

    # present keys still resolve exactly (pushdown + bloom change nothing)
    calls["n"] = 0
    state = final_state_table(tmp_lake)
    live = sorted(state["doc_id"].to_pylist())[:5]
    got = lookup(tmp_lake, live)
    assert got["doc_id"].to_pylist() == live
    assert calls["n"] >= 1


def test_delta_tombstone_still_kills_base_row_with_blooms(tmp_path, tmp_lake):
    """A delta file holding ONLY a tombstone for key k must answer
    "maybe k" — else lookup would skip it and resurrect the base row."""
    seg1 = pa.table(
        {
            "lsn": pa.array([1, 2, 3], pa.int64()),
            "op": ["INSERT"] * 3,
            "doc_id": ["a", "b", "c"],
            "tokens": pa.array([[1], [2], [3]], pa.list_(pa.int32())),
            "n_tok": pa.array([1, 1, 1], pa.int32()),
            "source": ["s"] * 3,
        }
    )
    seg2 = pa.table(
        {
            "lsn": pa.array([4], pa.int64()),
            "op": ["DELETE"],
            "doc_id": ["b"],
            "tokens": pa.array([None], pa.list_(pa.int32())),
            "n_tok": pa.array([None], pa.int32()),
            "source": pa.array([None], pa.string()),
        }
    )
    apply_changes(_write(tmp_path, "l1/a.parquet", seg1), tmp_lake, num_partitions=2)
    apply_changes(
        _write(tmp_path, "l2/b.parquet", seg2), tmp_lake, num_partitions=2,
        mode="delta",
    )
    got = lookup(tmp_lake, ["a", "b", "c"])
    assert got["doc_id"].to_pylist() == ["a", "c"]


def test_bloom_indexes_the_routing_column(tmp_path, tmp_lake, monkeypatch):
    """A lake partitioned by a DIFFERENT column than its LWW key (the
    token-index shape) gets sidecars over the ROUTING column — the only
    column ``lookup`` can probe on such a lake (routing hashes the
    probed values). Absent routing values open zero files; present ones
    resolve exactly. Keyed-on-posting-id blooms would instead prove
    false absence for every token probe (the regression this pins)."""
    import pyarrow.parquet as real_pq

    seg = pa.table(
        {
            "lsn": pa.array(list(range(1, 9)), pa.int64()),
            "op": ["INSERT"] * 8,
            "doc_id": [f"t{t}:d{d}" for t in range(4) for d in range(2)],
            "tokens": pa.array([[i] for i in range(8)], pa.list_(pa.int32())),
            "n_tok": pa.array([1] * 8, pa.int32()),
            "source": [f"src-{t}" for t in range(4) for _ in range(2)],
        }
    )
    apply_changes(
        _write(tmp_path, "l/seg.parquet", seg), tmp_lake,
        num_partitions=4, partition_key="source",
    )

    calls = {"n": 0}
    orig = real_pq.read_table

    def counting(path, *a, **k):
        calls["n"] += 1
        return orig(path, *a, **k)

    monkeypatch.setattr(real_pq, "read_table", counting)
    # absent routing values: bloom (over `source`) proves absence
    got = lookup(tmp_lake, [f"absent-{i}" for i in range(12)], key="source")
    assert got.num_rows == 0 and calls["n"] == 0
    # present routing values resolve exactly through the bloom
    calls["n"] = 0
    got = lookup(tmp_lake, ["src-0", "src-3"], key="source")
    assert sorted(got["doc_id"].to_pylist()) == [
        "t0:d0", "t0:d1", "t3:d0", "t3:d1",
    ]
    assert calls["n"] >= 1


def test_contains_keys_matches_lookup_and_skips_reads(
    tmp_path, tmp_lake, base_and_changes, monkeypatch
):
    import pyarrow.parquet as real_pq

    from palimpzest_ray.cdc.engine import contains_keys

    base, changes = base_and_changes
    _seed_lake(tmp_path, tmp_lake, base)
    p = _write(tmp_path, "log/changes.parquet", changes)
    apply_changes(p, tmp_lake, num_partitions=8)

    state = final_state_table(tmp_lake)
    live = sorted(state["doc_id"].to_pylist())
    probe = live[:3] + [f"missing-{i}" for i in range(30)] + live[-2:]
    got = contains_keys(tmp_lake, probe)
    want = {k: k in set(live) for k in probe}
    assert dict(zip(got["doc_id"].to_pylist(),
                    got["exists"].to_pylist())) == want
    # a tombstoned key (deleted, never re-upserted) answers absent
    ever = set(
        pa.concat_arrays(
            [base["doc_id"].combine_chunks(), changes["doc_id"].combine_chunks()]
        ).to_pylist()
    )
    dead = sorted(ever - set(live))
    if dead:
        g2 = contains_keys(tmp_lake, dead[:3])
        assert not pa.compute.any(g2["exists"]).as_py()
    # all-absent probes open zero data files (bloom-proven)
    calls = {"n": 0}
    orig = real_pq.read_table

    def counting(path, *a, **k):
        calls["n"] += 1
        return orig(path, *a, **k)

    monkeypatch.setattr(real_pq, "read_table", counting)
    g3 = contains_keys(tmp_lake, [f"nope-{i}" for i in range(10)])
    assert not pa.compute.any(g3["exists"]).as_py()
    assert calls["n"] <= 1


def test_bloom_lifecycle_compact_vacuum_clone(tmp_path, tmp_lake, base_and_changes):
    from palimpzest_ray.cdc.engine import compact_deltas
    from palimpzest_ray.cdc.manifest import vacuum
    from palimpzest_ray.cdc.snapshot import clone_lake

    base, changes = base_and_changes
    _seed_lake(tmp_path, tmp_lake, base)
    p = _write(tmp_path, "log/changes.parquet", changes)
    apply_changes(p, tmp_lake, num_partitions=8, mode="delta")
    compact_deltas(tmp_lake)
    m = load_latest_manifest(tmp_lake)
    files = m.data_files(tmp_lake)
    assert all(os.path.exists(f + BLOOM_SUFFIX) for f in files)

    vacuum(tmp_lake, keep_versions=1)
    # superseded files AND their sidecars are gone; current ones remain
    data_root = os.path.join(tmp_lake, "data")
    on_disk = {
        os.path.join(tmp_lake, "data", v, fn)
        for v in os.listdir(data_root)
        for fn in os.listdir(os.path.join(data_root, v))
    }
    want = set(files) | {f + BLOOM_SUFFIX for f in files}
    assert on_disk == want

    clone = str(tmp_path / "clone")
    clone_lake(tmp_lake, clone)
    cm = load_latest_manifest(clone)
    assert all(os.path.exists(f + BLOOM_SUFFIX) for f in cm.data_files(clone))
    # and the clone's lookups agree with the source's
    keys = sorted(final_state_table(tmp_lake)["doc_id"].to_pylist())[:4]
    assert lookup(clone, keys).equals(lookup(tmp_lake, keys))
