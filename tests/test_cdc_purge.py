"""GDPR hard delete: purge_keys removes every physical trace of a key
set from ALL retained versions (time travel included), keeps counters /
zone maps / Bloom sidecars consistent (fsck-clean), optionally retains
nulled tombstones as the LWW barrier, and scrubs the dead letter
without regressing the tail watermark."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import (
    apply_changes,
    final_state_table,
    fsck,
    load_latest_manifest,
    lookup,
    purge_keys,
)
from palimpzest_ray.cdc.manifest import load_manifest


def _mk_lake(tmp_path, P=4, n=80, name="lake", delta_epoch=True) -> str:
    lake = str(tmp_path / name)
    boot = pa.table(
        {
            "lsn": pa.array(range(1, n + 1), pa.int64()),
            "op": pa.array(["INSERT"] * n),
            "doc_id": pa.array([f"d{i:04d}" for i in range(n)]),
            "tokens": pa.array(
                [[i, i + 1] for i in range(n)], pa.list_(pa.int32())
            ),
            "n_tok": pa.array([i % 9 for i in range(n)], pa.int32()),
            "source": pa.array([f"s{i % 3}" for i in range(n)]),
        }
    )
    p = str(tmp_path / f"{name}-boot.parquet")
    pq.write_table(boot, p)
    apply_changes(p, lake, num_partitions=P)
    # epoch 2: update every 4th key, delete every 7th — in DELTA mode so
    # retained chains exist
    upd_ids = [i for i in range(n) if i % 4 == 0]
    del_ids = [i for i in range(n) if i % 7 == 3]
    ep2 = pa.concat_tables(
        [
            pa.table(
                {
                    "lsn": pa.array([1000 + i for i in upd_ids], pa.int64()),
                    "op": pa.array(["UPDATE"] * len(upd_ids)),
                    "doc_id": pa.array([f"d{i:04d}" for i in upd_ids]),
                    "tokens": pa.array(
                        [[9, 9, i] for i in upd_ids], pa.list_(pa.int32())
                    ),
                    "n_tok": pa.array([3] * len(upd_ids), pa.int32()),
                    "source": pa.array(["upd"] * len(upd_ids)),
                }
            ),
            pa.table(
                {
                    "lsn": pa.array([2000 + i for i in del_ids], pa.int64()),
                    "op": pa.array(["DELETE"] * len(del_ids)),
                    "doc_id": pa.array([f"d{i:04d}" for i in del_ids]),
                    "tokens": pa.nulls(len(del_ids), pa.list_(pa.int32())),
                    "n_tok": pa.nulls(len(del_ids), pa.int32()),
                    "source": pa.nulls(len(del_ids), pa.string()),
                }
            ),
        ]
    )
    p2 = str(tmp_path / f"{name}-ep2.parquet")
    pq.write_table(ep2, p2)
    apply_changes(p2, lake, mode="delta" if delta_epoch else "rewrite")
    return lake


def _raw_key_hits(lake: str, keys: set[str]) -> int:
    """Count physical rows for the keys across EVERY parquet file under
    the lake (data + quarantine) — the forgetting proof."""
    hits = 0
    for root, _dirs, files in os.walk(lake):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(root, f))
            if "doc_id" in t.column_names:
                hits += pc.sum(
                    pc.cast(
                        pc.is_in(t["doc_id"], value_set=pa.array(list(keys))),
                        pa.int64(),
                    )
                ).as_py() or 0
    return hits


def test_full_forget_across_versions(tmp_path, ray_session):
    from palimpzest_ray.cdc import final_state

    lake = _mk_lake(tmp_path)
    before = final_state_table(lake)
    # a live key, an updated key, and an already-tombstoned key
    targets = {"d0001", "d0004", "d0003"}  # d0003: 3 % 7 == 3 -> deleted
    res = purge_keys(lake, sorted(targets))
    assert res["rows_removed"] >= 3
    assert res["files_rewritten"] >= 1

    # head: purged keys gone, everything else byte-identical
    after = final_state_table(lake)
    keep = before.filter(
        pc.invert(pc.is_in(before["doc_id"], value_set=pa.array(sorted(targets))))
    )
    assert after.equals(keep)

    # every retained version forgets them — time travel included
    latest = load_latest_manifest(lake)
    for v in range(1, latest.version + 1):
        t = final_state(lake, version=v).to_pandas()
        assert not set(t["doc_id"]) & targets
        assert lookup(lake, sorted(targets), key="doc_id", version=v).num_rows == 0

    # physically gone from every file
    assert _raw_key_hits(lake, targets) == 0

    # consistency: counters, zone maps, blooms all validate
    rep = fsck(lake, deep=True)
    assert rep["ok"], rep["errors"]
    for v in range(1, latest.version + 1):
        rep = fsck(lake, version=v, deep=True)
        assert rep["ok"], rep["errors"]

    # idempotent re-run: nothing left to rewrite, still clean
    res2 = purge_keys(lake, sorted(targets))
    assert res2["files_rewritten"] == 0
    assert res2["rows_removed"] == 0
    assert fsck(lake, deep=True)["ok"]


def test_purge_updates_counters_and_zone_maps(tmp_path, ray_session):
    from palimpzest_ray.cdc import lake_count, lake_minmax

    lake = _mk_lake(tmp_path)
    latest = load_latest_manifest(lake)
    # purge the doc_id that is the global string MAX so the zone map
    # must stop exposing it
    mm0 = lake_minmax(lake, ["doc_id"])
    top = mm0["doc_id"][1]
    purge_keys(lake, [top])
    mm1 = lake_minmax(lake, ["doc_id"])
    assert mm1["doc_id"][1] < top
    m = load_latest_manifest(lake)
    for e in m.parts.values():
        if e.col_stats and "doc_id" in e.col_stats:
            assert e.col_stats["doc_id"][1] != top
    # metadata COUNT(*) agrees with data at every retained version
    from palimpzest_ray.cdc import final_state

    for v in range(1, latest.version + 1):
        assert lake_count(lake, version=v) == final_state(lake, version=v).count()


def test_keep_tombstones_nulls_payload_and_keeps_barrier(
    tmp_path, ray_session
):
    lake = _mk_lake(tmp_path)
    target = "d0008"  # live at head (8 % 4 == 0 -> updated, not deleted)
    res = purge_keys(lake, [target], keep_tombstones=True)
    assert res["tombstones_kept_nulled"] >= 1

    # the key is dead at head
    assert lookup(lake, [target], key="doc_id").num_rows == 0
    # physical rows for the key are ONLY nulled tombstones
    found = 0
    for root, _dirs, files in os.walk(lake):
        for f in files:
            if not f.endswith(".parquet") or "_quarantine" in root:
                continue
            t = pq.read_table(os.path.join(root, f))
            if "doc_id" not in t.column_names:
                continue
            rows = t.filter(pc.equal(t["doc_id"], target))
            for r in rows.to_pylist():
                found += 1
                assert r.get("_deleted") is True
                assert r.get("source") is None and r.get("tokens") is None
    assert found >= 1
    assert fsck(lake, deep=True)["ok"]

    # the LWW barrier stands: a late event BELOW the tombstone's LSN
    # does not resurrect the key
    late = pa.table(
        {
            "lsn": pa.array([5], pa.int64()),  # far below the barrier
            "op": pa.array(["UPDATE"]),
            "doc_id": pa.array([target]),
            "tokens": pa.array([[1]], pa.list_(pa.int32())),
            "n_tok": pa.array([1], pa.int32()),
            "source": pa.array(["late"]),
        }
    )
    p = str(tmp_path / "late.parquet")
    pq.write_table(late, p)
    apply_changes(p, lake)
    assert lookup(lake, [target], key="doc_id").num_rows == 0


def test_full_forget_drops_barrier(tmp_path, ray_session):
    lake = _mk_lake(tmp_path)
    target = "d0003"  # tombstoned in epoch 2
    purge_keys(lake, [target])  # full forget: barrier gone
    late = pa.table(
        {
            "lsn": pa.array([5], pa.int64()),
            "op": pa.array(["UPDATE"]),
            "doc_id": pa.array([target]),
            "tokens": pa.array([[1]], pa.list_(pa.int32())),
            "n_tok": pa.array([1], pa.int32()),
            "source": pa.array(["fresh"]),
        }
    )
    p = str(tmp_path / "late.parquet")
    pq.write_table(late, p)
    apply_changes(p, lake)
    t = lookup(lake, [target], key="doc_id", columns=["source"])
    assert t["source"].to_pylist() == ["fresh"]


def test_purge_scrubs_quarantine_without_watermark_regress(
    tmp_path, ray_session
):
    from palimpzest_ray.cdc import read_quarantine
    from palimpzest_ray.cdc.engine import quarantine_watermark

    lake = _mk_lake(tmp_path)
    bad = pa.table(
        {
            "lsn": pa.array([9000, 9001], pa.int64()),
            "op": pa.array(["UPDATE", "UPDATE"]),
            "doc_id": pa.array(["d0002", "d0005"]),
            "tokens": pa.array([[1], [2]], pa.list_(pa.int32())),
            "n_tok": pa.array([-5, -6], pa.int32()),
            "source": pa.array(["x", "y"]),
        }
    )
    p = str(tmp_path / "bad.parquet")
    pq.write_table(bad, p)
    apply_changes(
        p, lake,
        expectations=[("tok_nonneg", [("n_tok", ">=", 0)])],
        quarantine=True,
    )
    wm0 = quarantine_watermark(lake)
    assert wm0 == 9001
    res = purge_keys(lake, ["d0005"])
    assert res["quarantine_rows_removed"] == 1
    q = read_quarantine(lake)
    assert "d0005" not in set(q["doc_id"].to_pylist())
    assert "d0002" in set(q["doc_id"].to_pylist())
    # the tail position survives even though the max-LSN event was purged
    assert quarantine_watermark(lake) == 9001


def test_purge_refuses_branches_and_empty(tmp_path, ray_session):
    from palimpzest_ray.cdc.branch import create_branch

    lake = _mk_lake(tmp_path)
    br = create_branch(lake, "b1")
    with pytest.raises(ValueError, match="branches exist"):
        purge_keys(lake, ["d0001"])
    with pytest.raises(ValueError, match="cannot purge a branch"):
        purge_keys(br, ["d0001"])
    with pytest.raises(ValueError, match="non-empty"):
        purge_keys(lake, [])


def test_purge_composite_key_tuples(tmp_path, ray_session):
    lake = str(tmp_path / "clake")
    n = 40
    log = pa.table(
        {
            "lsn": pa.array(range(1, n + 1), pa.int64()),
            "op": pa.array(["INSERT"] * n),
            "source": pa.array([f"s{i % 2}" for i in range(n)]),
            "bucket": pa.array([i % 5 for i in range(n)], pa.int64()),
            "val": pa.array(range(n), pa.int64()),
        }
    )
    apply_changes(log, lake, key=("source", "bucket"), num_partitions=4)
    res = purge_keys(lake, [("s0", 2), ("s1", 3)])
    # 2 live images + the 2 audit tombstones tombstone_first just wrote
    assert res["rows_removed"] == 4
    t = final_state_table(lake)
    pairs = set(zip(t["source"].to_pylist(), t["bucket"].to_pylist()))
    assert ("s0", 2) not in pairs and ("s1", 3) not in pairs
    assert fsck(lake, deep=True)["ok"]


def test_purge_where_predicate_forget(tmp_path, ray_session):
    """purge_where: 'erase every row of source s1' — predicate selects
    the live keys, purge_keys forgets them everywhere."""
    from palimpzest_ray.cdc import purge_where

    lake = _mk_lake(tmp_path)
    before = final_state_table(lake)
    victims = set(
        before.filter(pc.equal(before["source"], "s1"))["doc_id"].to_pylist()
    )
    assert victims
    res = purge_where(lake, [("source", "==", "s1")])
    assert res["keys"] == len(victims)
    after = final_state_table(lake)
    assert not set(after["doc_id"].to_pylist()) & victims
    assert _raw_key_hits(lake, victims) == 0
    assert fsck(lake, deep=True)["ok"]

    # no matches: clean no-op
    res2 = purge_where(lake, [("source", "==", "nope")])
    assert res2["keys"] == 0

    # the mass-forget guard
    with pytest.raises(ValueError, match="max_keys"):
        purge_where(lake, [("n_tok", ">=", 0)], max_keys=3)
