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


def test_clustered_snapshot_prunes_row_groups(tmp_path, ray_session):
    """cluster_by sorts each exported partition so row-group min/max
    stats on the cluster column become tight — a predicate scan of the
    clustered snapshot touches fewer row groups than the key-sorted
    one, with identical content."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from palimpzest_ray.cdc import apply_changes, export_snapshot
    from palimpzest_ray.schemas import CHANGELOG_SCHEMA

    n = 200_000
    rng = np.random.default_rng(3)
    rows = pa.table(
        {
            "lsn": pa.array(np.arange(n), pa.int64()),
            "op": pa.array(["INSERT"] * n),
            "doc_id": pa.array([f"d{i:07d}" for i in rng.permutation(n)]),
            "tokens": pa.nulls(n, pa.list_(pa.int32())),
            "n_tok": pa.array(rng.integers(0, 1000, n), pa.int32()),
            "source": pa.array([f"s{i % 5}" for i in range(n)]),
        }
    ).cast(CHANGELOG_SCHEMA)
    lake = os.path.join(str(tmp_path), "lake")
    apply_changes(rd.from_arrow(rows), lake, num_partitions=2,
                  change_schema=CHANGELOG_SCHEMA)

    plain = os.path.join(str(tmp_path), "snap_plain")
    clustered = os.path.join(str(tmp_path), "snap_clustered")
    export_snapshot(lake, plain, columns=["doc_id", "n_tok"])
    meta = export_snapshot(lake, clustered, columns=["doc_id", "n_tok"],
                           cluster_by=["n_tok"])
    assert meta["cluster_by"] == ["n_tok"]

    def matching_row_groups(d):
        hit = 0
        for f in sorted(os.listdir(d)):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(d, f)).metadata
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(1).statistics
                if st.min <= 3 and st.max >= 3:  # n_tok == 3
                    hit += 1
        return hit

    assert matching_row_groups(clustered) < matching_row_groups(plain)

    # identical content (order-insensitive)
    a = pq.read_table(plain).sort_by("doc_id")
    b = pq.read_table(clustered).sort_by("doc_id")
    assert a.equals(b)
