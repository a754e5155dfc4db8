"""lake_count: exact COUNT(*) from manifest metadata (zero parquet I/O)
and the predicate fallback's pruned counting scan."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import (
    apply_changes,
    delete_where,
    final_state_table,
    lake_count,
    make_base_table,
    make_change_table,
)


def _boot(tmp_path, lake, base, nparts=8):
    boot = pa.table(
        {
            "lsn": pa.array([0] * base.num_rows, pa.int64()),
            "op": pa.array(["INSERT"] * base.num_rows),
            **{c: base[c] for c in base.column_names},
        }
    )
    p = os.path.join(str(tmp_path), "boot.parquet")
    pq.write_table(boot, p)
    apply_changes(p, lake, num_partitions=nparts)


def test_lake_count_metadata_only(tmp_path, tmp_lake, monkeypatch):
    base = make_base_table(300, seed=3)
    _boot(tmp_path, tmp_lake, base)
    ch = make_change_table(1_500, 300, seed=4)
    log = os.path.join(str(tmp_path), "log.parquet")
    pq.write_table(ch, log)
    apply_changes(log, tmp_lake, num_partitions=8)
    # delta chain + DML so `rows` is exercised through every mutator
    ch2 = make_change_table(400, 300, seed=5, start_lsn=10_000)
    log2 = os.path.join(str(tmp_path), "log2.parquet")
    pq.write_table(ch2, log2)
    apply_changes(log2, tmp_lake, num_partitions=8, mode="delta")
    delete_where(tmp_lake, [("source", "==", "web")], mode="delta")

    want = final_state_table(tmp_lake).num_rows

    # zero-I/O proof: any parquet DATA read fails the test
    import palimpzest_ray.cdc.engine as eng

    def _boom(*a, **k):  # pragma: no cover - should never run
        raise AssertionError("metadata-only count read a parquet file")

    monkeypatch.setattr(eng.pq, "read_table", _boom)
    assert lake_count(tmp_lake) == want


def test_lake_count_predicate_and_version(tmp_path, tmp_lake):
    base = make_base_table(200, seed=6)
    _boot(tmp_path, tmp_lake, base)
    state1 = final_state_table(tmp_lake)
    n_books = sum(1 for s in state1["source"].to_pylist() if s == "books")
    assert lake_count(
        tmp_lake, predicate=[("source", "==", "books")]
    ) == n_books
    delete_where(tmp_lake, [("source", "==", "books")])
    assert lake_count(tmp_lake) == state1.num_rows - n_books
    # time travel: version 1 still counts the pre-delete state
    assert lake_count(tmp_lake, version=1) == state1.num_rows
    with pytest.raises(FileNotFoundError):
        lake_count(str(tmp_path / "nope"))
