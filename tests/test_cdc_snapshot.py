"""Snapshot export (plain parquet publication) and lake cloning."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import (
    apply_changes,
    clone_lake,
    export_snapshot,
    final_state_table,
    load_latest_manifest,
    make_base_table,
    make_change_table,
    read_snapshot,
)


def _mk_lake(tmp_path, *, delta: bool = True) -> str:
    lake = str(tmp_path / "lake")
    base = make_base_table(400, seed=3)
    boot = pa.table(
        {
            "lsn": pa.array([0] * base.num_rows, pa.int64()),
            "op": pa.array(["INSERT"] * base.num_rows),
            **{c: base[c] for c in base.column_names},
        }
    )
    os.makedirs(str(tmp_path / "boot"))
    pq.write_table(boot, str(tmp_path / "boot" / "l.parquet"))
    apply_changes(str(tmp_path / "boot"), lake, num_partitions=8)
    log = make_change_table(800, 400, seed=4)
    os.makedirs(str(tmp_path / "log"))
    pq.write_table(log, str(tmp_path / "log" / "l.parquet"))
    apply_changes(
        str(tmp_path / "log"), lake, mode="delta" if delta else "rewrite"
    )
    return lake


def test_export_snapshot_plain_parquet_equals_state(tmp_path, ray_session):
    lake = _mk_lake(tmp_path)  # live delta chains at export time
    out = str(tmp_path / "snap")
    meta = export_snapshot(lake, out)
    want = final_state_table(lake)
    assert meta["rows"] == want.num_rows
    # engine-less read: plain pyarrow over the published files
    got = pa.concat_tables(
        [pq.read_table(os.path.join(out, f)) for f in meta["files"]]
    ).sort_by("doc_id")
    want = want.select(got.column_names).sort_by("doc_id")
    assert got.num_rows == want.num_rows
    for c in got.column_names:
        assert got[c].combine_chunks().equals(
            want[c].cast(got[c].type).combine_chunks()
        ), c
    # no internal columns, no tombstone rows
    assert "_lsn" not in got.column_names and "_deleted" not in got.column_names
    # ray-side convenience reader agrees
    assert read_snapshot(out).count() == want.num_rows
    # idempotent re-export
    meta2 = export_snapshot(lake, out)
    assert meta2 == meta


def test_export_snapshot_column_pruned(tmp_path, ray_session):
    lake = _mk_lake(tmp_path)
    out = str(tmp_path / "snap")
    meta = export_snapshot(lake, out, columns=["doc_id", "n_tok"])
    got = pq.read_table(os.path.join(out, meta["files"][0]))
    assert got.column_names == ["doc_id", "n_tok"]
    with pytest.raises(ValueError, match="not in lake schema"):
        export_snapshot(lake, str(tmp_path / "s2"), columns=["nope"])
    with pytest.raises(FileNotFoundError, match="_SNAPSHOT"):
        read_snapshot(str(tmp_path / "s2"))


def test_clone_lake_independent_and_chain_preserving(tmp_path, ray_session):
    lake = _mk_lake(tmp_path)
    m_src = load_latest_manifest(lake)
    assert any(e.deltas for e in m_src.parts.values())
    dst = str(tmp_path / "fork")
    mc = clone_lake(lake, dst)
    assert mc.version == 1
    assert mc.max_lsn == m_src.max_lsn  # tail resumes from the same LSN
    assert any(e.deltas for e in mc.parts.values())  # chains preserved
    before = final_state_table(lake)
    got = final_state_table(dst)
    assert got.sort_by("doc_id").equals(
        before.select(got.column_names).sort_by("doc_id").cast(got.schema)
    )
    # divergence: apply to the clone only
    log = make_change_table(300, 400, seed=9, start_lsn=10_000)
    os.makedirs(str(tmp_path / "log2"))
    pq.write_table(log, str(tmp_path / "log2" / "l.parquet"))
    apply_changes(str(tmp_path / "log2"), dst, mode="delta")
    assert final_state_table(lake).equals(before)  # source untouched
    assert load_latest_manifest(dst).max_lsn > m_src.max_lsn
    with pytest.raises(FileExistsError):
        clone_lake(lake, dst)
