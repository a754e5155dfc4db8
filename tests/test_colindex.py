"""Secondary column index (cdc/colindex.py): build == brute force,
refresh == rebuild after update/delete/insert epochs, lookup_by reads a
consistent pinned snapshot, null values are never indexed."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import (
    apply_changes,
    build_column_index,
    final_state_table,
    lookup_by,
    make_base_table,
    make_change_table,
    refresh_column_index,
)


def _write(tmp_path, name, table):
    p = os.path.join(str(tmp_path), name)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    pq.write_table(table, p)
    return p


def _seed(tmp_path, lake, n_base=300):
    base = make_base_table(n_base, seed=21)
    boot = pa.table(
        {
            "lsn": pa.array([0] * base.num_rows, pa.int64()),
            "op": pa.array(["INSERT"] * base.num_rows),
            **{c: base[c] for c in base.column_names},
        }
    )
    apply_changes(_write(tmp_path, "boot/log.parquet", boot), lake, num_partitions=8)


def _brute(lake, values, columns=None):
    t = final_state_table(lake)
    t = t.filter(pc.is_in(t["source"], value_set=pa.array(values)))
    if columns is not None:
        t = t.select(["doc_id"] + [c for c in columns if c != "doc_id"])
    return t.sort_by("doc_id")


def test_build_and_lookup_matches_filter(tmp_path):
    lake = str(tmp_path / "lake")
    idx = str(tmp_path / "idx")
    _seed(tmp_path, lake)
    build_column_index(lake, idx, "source", num_partitions=8)
    vals = sorted(set(final_state_table(lake)["source"].to_pylist()))[:2]
    got = lookup_by(lake, idx, vals)
    want = _brute(lake, vals)
    got = got.select(sorted(got.column_names))
    want = want.select(sorted(want.column_names))
    assert got.equals(want) and got.num_rows > 0
    # absent value: empty, correct schema
    empty = lookup_by(lake, idx, ["no-such-source"], columns=["n_tok"])
    assert empty.num_rows == 0 and set(empty.column_names) >= {"doc_id", "n_tok"}
    # rebuild into an existing root: refused
    with pytest.raises(ValueError, match="already holds"):
        build_column_index(lake, idx, "source", num_partitions=8)


def test_refresh_equals_rebuild_after_epochs(tmp_path):
    lake = str(tmp_path / "lake")
    idx = str(tmp_path / "idx")
    idx2 = str(tmp_path / "idx_rebuilt")
    _seed(tmp_path, lake)
    build_column_index(lake, idx, "source", num_partitions=8)

    log2 = make_change_table(1200, 300, seed=22, start_lsn=1, new_key_space=60)
    apply_changes(_write(tmp_path, "e2/log.parquet", log2), lake, num_partitions=8)
    r = refresh_column_index(lake, idx)
    assert r["refreshed"] and r["index_events"] > 0

    build_column_index(lake, idx2, "source", num_partitions=8)
    vals = sorted(set(final_state_table(lake)["source"].to_pylist()))
    for v in vals:
        a = lookup_by(lake, idx, [v])
        b = lookup_by(lake, idx2, [v])
        assert a.equals(b)
        assert a.equals(_brute(lake, [v]))

    # second epoch composes; no-op refresh fast path
    log3 = make_change_table(600, 360, seed=23, start_lsn=5000)
    apply_changes(_write(tmp_path, "e3/log.parquet", log3), lake, num_partitions=8)
    refresh_column_index(lake, idx)
    assert lookup_by(lake, idx, vals[:1]).equals(_brute(lake, vals[:1]))
    assert refresh_column_index(lake, idx)["refreshed"] is False


def test_value_transitions_and_nulls(tmp_path):
    """A doc whose value changes moves between index entries; a deleted
    doc leaves; a null value is never indexed (and a doc updated TO null
    leaves its old entry)."""
    lake = str(tmp_path / "lake")
    idx = str(tmp_path / "idx")
    boot = pa.table(
        {
            "lsn": pa.array([0, 0, 0], pa.int64()),
            "op": ["INSERT"] * 3,
            "doc_id": ["a", "b", "c"],
            "tokens": pa.array([[1], [2], [3]], pa.list_(pa.int32())),
            "n_tok": pa.array([1, 1, 1], pa.int32()),
            "source": pa.array(["red", "red", None]),  # c: null, unindexed
        }
    )
    apply_changes(_write(tmp_path, "b/log.parquet", boot), lake, num_partitions=2)
    build_column_index(lake, idx, "source", num_partitions=4)
    assert lookup_by(lake, idx, ["red"])["doc_id"].to_pylist() == ["a", "b"]

    log = pa.table(
        {
            "lsn": pa.array([1, 2, 3], pa.int64()),
            "op": ["UPDATE", "DELETE", "UPDATE"],
            "doc_id": ["a", "b", "c"],
            "tokens": pa.array([[1], None, [3]], pa.list_(pa.int32())),
            "n_tok": pa.array([1, None, 1], pa.int32()),
            "source": pa.array(["blue", None, "red"]),  # a moves, c gains
        }
    )
    apply_changes(_write(tmp_path, "d/log.parquet", log), lake, num_partitions=2)
    refresh_column_index(lake, idx)
    assert lookup_by(lake, idx, ["red"])["doc_id"].to_pylist() == ["c"]
    assert lookup_by(lake, idx, ["blue"])["doc_id"].to_pylist() == ["a"]

    # a → null: old entry dies, nothing replaces it
    log2 = pa.table(
        {
            "lsn": pa.array([4], pa.int64()),
            "op": ["UPDATE"],
            "doc_id": ["a"],
            "tokens": pa.array([[1]], pa.list_(pa.int32())),
            "n_tok": pa.array([1], pa.int32()),
            "source": pa.array([None], pa.string()),
        }
    )
    apply_changes(_write(tmp_path, "d2/log.parquet", log2), lake, num_partitions=2)
    refresh_column_index(lake, idx)
    assert lookup_by(lake, idx, ["blue"]).num_rows == 0
    assert lookup_by(lake, idx, ["red"])["doc_id"].to_pylist() == ["c"]


def test_lookup_by_is_pinned_snapshot(tmp_path):
    """lookup_by reads the lake AT THE INDEX's recorded version: commits
    after the last refresh are invisible until the next refresh — the
    two hops can never disagree about which docs match."""
    lake = str(tmp_path / "lake")
    idx = str(tmp_path / "idx")
    _seed(tmp_path, lake, n_base=100)
    build_column_index(lake, idx, "source", num_partitions=4)
    vals = sorted(set(final_state_table(lake)["source"].to_pylist()))[:1]
    before = lookup_by(lake, idx, vals)

    log = make_change_table(400, 100, seed=24, start_lsn=1)
    apply_changes(_write(tmp_path, "e/log.parquet", log), lake, num_partitions=8)
    assert lookup_by(lake, idx, vals).equals(before)  # still the old snapshot
    refresh_column_index(lake, idx)
    assert lookup_by(lake, idx, vals).equals(_brute(lake, vals))
