"""Distributed exact-key ingest screen (cdc/screen.py): output ==
brute-force anti-join in every regime (mostly-new, mostly-present,
tombstones, nulls, missing sidecars, non-key-partitioned lakes)."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from palimpzest_ray.cdc import (
    apply_changes,
    final_state_table,
    make_base_table,
    screen_new_keys,
)


def _write(tmp_path, name, table):
    p = os.path.join(str(tmp_path), name)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    pq.write_table(table, p)
    return p


def _mk_lake(tmp_path, lake, n=400):
    base = make_base_table(n, seed=31)
    boot = pa.table(
        {
            "lsn": pa.array([0] * base.num_rows, pa.int64()),
            "op": pa.array(["INSERT"] * base.num_rows),
            **{c: base[c] for c in base.column_names},
        }
    )
    apply_changes(_write(tmp_path, "boot/log.parquet", boot), lake, num_partitions=8)
    return base


def _screen_ids(lake, cand, **kw):
    out = screen_new_keys(lake, rd.from_arrow(cand), **kw).to_arrow()
    return sorted(out["doc_id"].to_pylist())


def test_mostly_new_and_mostly_present(tmp_path, ray_session):
    lake = str(tmp_path / "lake")
    _mk_lake(tmp_path, lake)
    live = set(final_state_table(lake)["doc_id"].to_pylist())

    # mostly new: fresh ids + a handful of present ones
    cand = pa.table(
        {
            "doc_id": pa.array(
                [f"cand-{i:05d}" for i in range(500)] + sorted(live)[:7]
            ),
            "payload": pa.array(list(range(507)), pa.int64()),
        }
    )
    want = sorted(k for k in cand["doc_id"].to_pylist() if k not in live)
    assert _screen_ids(lake, cand) == want

    # mostly present: the whole live set + 3 fresh
    cand2 = pa.table({"doc_id": pa.array(sorted(live) + ["zz-a", "zz-b", "zz-c"])})
    assert _screen_ids(lake, cand2) == ["zz-a", "zz-b", "zz-c"]


def test_tombstoned_keys_are_new_and_nulls_pass(tmp_path, ray_session):
    lake = str(tmp_path / "lake")
    _mk_lake(tmp_path, lake)
    live = sorted(final_state_table(lake)["doc_id"].to_pylist())
    dead = live[:5]
    log = pa.table(
        {
            "lsn": pa.array([10_000 + i for i in range(5)], pa.int64()),
            "op": ["DELETE"] * 5,
            "doc_id": dead,
            "tokens": pa.array([None] * 5, pa.list_(pa.int32())),
            "n_tok": pa.array([None] * 5, pa.int32()),
            "source": pa.array([None] * 5, pa.string()),
        }
    )
    apply_changes(_write(tmp_path, "del/log.parquet", log), lake, num_partitions=8)
    # a tombstoned key's ghost still lives in the files (bloom says
    # maybe) but it is NOT live -> it must screen as new; null passes
    cand = pa.table({"doc_id": pa.array(dead + [None, "fresh-1"] + live[5:8])})
    got = screen_new_keys(lake, rd.from_arrow(cand)).to_arrow()
    ids = got["doc_id"].to_pylist()
    assert sorted(x for x in ids if x is not None) == sorted(dead + ["fresh-1"])
    assert ids.count(None) == 1


def test_missing_sidecars_fall_back_exact(tmp_path, ray_session):
    lake = str(tmp_path / "lake")
    _mk_lake(tmp_path, lake)
    for b in glob.glob(os.path.join(lake, "data", "*", "*.bloom")):
        os.unlink(b)
    live = set(final_state_table(lake)["doc_id"].to_pylist())
    cand = pa.table(
        {"doc_id": pa.array([f"n-{i}" for i in range(50)] + sorted(live)[:5])}
    )
    want = sorted(k for k in cand["doc_id"].to_pylist() if k not in live)
    assert _screen_ids(lake, cand) == want


def test_non_key_partitioned_lake_uses_pure_antijoin(tmp_path, ray_session):
    lake = str(tmp_path / "lake")
    seg = pa.table(
        {
            "lsn": pa.array([1, 2, 3, 4], pa.int64()),
            "op": ["INSERT"] * 4,
            "doc_id": ["a", "b", "c", "d"],
            "tokens": pa.array([[1]] * 4, pa.list_(pa.int32())),
            "n_tok": pa.array([1] * 4, pa.int32()),
            "source": ["s1", "s1", "s2", "s2"],
        }
    )
    apply_changes(
        _write(tmp_path, "l/seg.parquet", seg), lake,
        num_partitions=4, partition_key="source",
    )
    cand = pa.table({"doc_id": pa.array(["a", "x", "d", "y"])})
    assert _screen_ids(lake, cand) == ["x", "y"]


def test_pinned_version_ignores_later_commits(tmp_path, ray_session):
    from palimpzest_ray.cdc import load_latest_manifest

    lake = str(tmp_path / "lake")
    _mk_lake(tmp_path, lake)
    v1 = load_latest_manifest(lake).version
    log = pa.table(
        {
            "lsn": pa.array([99_999], pa.int64()),
            "op": ["INSERT"],
            "doc_id": ["late-arrival"],
            "tokens": pa.array([[1]], pa.list_(pa.int32())),
            "n_tok": pa.array([1], pa.int32()),
            "source": ["s"],
        }
    )
    apply_changes(_write(tmp_path, "late/log.parquet", log), lake, num_partitions=8)
    cand = pa.table({"doc_id": pa.array(["late-arrival"])})
    assert _screen_ids(lake, cand, version=v1) == ["late-arrival"]  # not at v1
    assert _screen_ids(lake, cand) == []  # head sees it
