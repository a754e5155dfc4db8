"""lake_history: per-version summaries from manifests alone."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from palimpzest_ray.cdc import apply_changes, lake_history, vacuum


def _log(rows, tmp_path, name):
    t = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("lsn", pa.int64()), ("op", pa.string()),
             ("doc_id", pa.string()), ("n_tok", pa.int32())]
        ),
    )
    p = os.path.join(str(tmp_path), name)
    pq.write_table(t, p)
    return p


def test_history_matches_apply_results(tmp_path, tmp_lake, monkeypatch):
    r1 = apply_changes(
        _log(
            [
                {"lsn": i, "op": "INSERT", "doc_id": f"d{i}", "n_tok": i}
                for i in range(1, 8)
            ],
            tmp_path, "e1.parquet",
        ),
        tmp_lake, num_partitions=4,
    )
    r2 = apply_changes(
        _log(
            [
                {"lsn": 10, "op": "UPDATE", "doc_id": "d1", "n_tok": 99},
                {"lsn": 11, "op": "DELETE", "doc_id": "d2", "n_tok": None},
            ],
            tmp_path, "e2.parquet",
        ),
        tmp_lake, num_partitions=4,
    )
    # metadata-only claim: no parquet is opened
    monkeypatch.setattr(
        pq, "read_table",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("data I/O")),
    )
    hist = lake_history(tmp_lake)
    assert [h["version"] for h in hist] == [2, 1]
    v2, v1 = hist
    assert v1["rows"] == 7 and v1["tombstones"] == 0 and v1["max_lsn"] == 7
    assert v2["rows"] == 6 and v2["tombstones"] == 1 and v2["max_lsn"] == 11
    # per-version deltas recover the ApplyResult counters
    assert v1["rows_upserted"] == r1.rows_upserted
    assert v2["rows_upserted"] == r2.rows_upserted
    assert v2["rows_deleted"] == r2.rows_deleted
    assert v2["parts_changed"] == r2.partitions_rewritten
    assert all(h["wall_time"] > 0 for h in hist)

    # limit returns only the newest N
    assert [h["version"] for h in lake_history(tmp_lake, limit=1)] == [2]


def test_history_survives_vacuum_window(tmp_path, tmp_lake):
    for i in range(4):
        apply_changes(
            _log(
                [{"lsn": 100 + i, "op": "INSERT",
                  "doc_id": f"x{i}", "n_tok": i}],
                tmp_path, f"a{i}.parquet",
            ),
            tmp_lake, num_partitions=2,
        )
    vacuum(tmp_lake, keep_versions=2)
    hist = lake_history(tmp_lake)
    assert [h["version"] for h in hist] == [4, 3]
    # v3 is the earliest retained: its predecessor manifest is gone, so
    # its delta is reported against an empty lake — every partition
    # that holds data counts as changed
    from palimpzest_ray.cdc import load_manifest

    assert hist[1]["parts_changed"] == len(load_manifest(tmp_lake, 3).parts)


def test_timestamp_as_of(tmp_path, tmp_lake):
    """TIMESTAMP AS OF (manifest.version_as_of + reader as_of=): the
    commit wall-clock lives IN the manifest (committed_at), so
    resolution survives copies where mtimes do not."""
    import shutil

    import pyarrow.parquet as pq
    import pytest

    from palimpzest_ray.cdc import (
        apply_changes,
        commit_time,
        final_state_table,
        version_as_of,
    )

    def _ev(lsn, doc, tok):
        return pa.table(
            {
                "lsn": pa.array([lsn], pa.int64()),
                "op": pa.array(["INSERT"]),
                "doc_id": pa.array([doc]),
                "n_tok": pa.array([tok], pa.int32()),
            }
        )

    apply_changes(_ev(1, "a", 1), tmp_lake, num_partitions=2)
    apply_changes(_ev(2, "b", 2), tmp_lake, num_partitions=2)
    t1, t2 = commit_time(tmp_lake, 1), commit_time(tmp_lake, 2)
    assert t1 <= t2
    assert version_as_of(tmp_lake, t1) == 1 if t1 < t2 else 2
    assert version_as_of(tmp_lake, t2) == 2
    assert version_as_of(tmp_lake, t2 + 3600) == 2
    with pytest.raises(ValueError, match="no retained version"):
        version_as_of(tmp_lake, t1 - 3600)
    got = final_state_table(tmp_lake, as_of=t2)
    assert got.num_rows == 2
    with pytest.raises(ValueError, match="not both"):
        final_state_table(tmp_lake, version=1, as_of=t2)
    # the stamp survives a copy (mtimes reset, committed_at does not)
    cp = str(tmp_path / "copied_lake")
    shutil.copytree(tmp_lake, cp)
    for f in os.listdir(cp):
        os.utime(os.path.join(cp, f))  # clobber mtimes
    assert commit_time(cp, 1) == t1 and version_as_of(cp, t2) == 2


def test_vacuum_time_based_retention(tmp_path, tmp_lake):
    """keep_hours unions with keep_versions: versions committed inside
    the window survive however small keep_versions is; a burst of
    commits cannot age history out early."""
    import json
    import time

    from palimpzest_ray.cdc.manifest import (
        _atomic_write,
        load_latest_manifest,
        load_manifest,
    )

    for v in range(4):
        apply_changes(
            _log(
                [{"lsn": 10 * v + 1, "op": "INSERT",
                  "doc_id": f"d{v}", "n_tok": v}],
                tmp_path, f"l{v}.parquet",
            ),
            tmp_lake, num_partitions=2,
        )
    # backdate v1/v2 far outside the window; v3/v4 stay recent
    now = time.time()
    for v, age_h in [(1, 100.0), (2, 90.0), (3, 0.2), (4, 0.0)]:
        m = load_manifest(tmp_lake, v)
        m.committed_at = now - age_h * 3600.0
        _atomic_write(
            os.path.join(tmp_lake, f"MANIFEST-v{v}.json"), m.to_json()
        )

    res = vacuum(tmp_lake, keep_versions=1, keep_hours=24.0)
    assert res.versions_dropped == [1, 2]
    # v3 survived ONLY because of the time window
    assert load_manifest(tmp_lake, 3) is not None
    assert load_latest_manifest(tmp_lake).version == 4
    # outside any window the count floor still keeps the head
    res2 = vacuum(tmp_lake, keep_versions=1, keep_hours=0.05)
    assert res2.versions_dropped == [3]
    assert load_latest_manifest(tmp_lake).version == 4
