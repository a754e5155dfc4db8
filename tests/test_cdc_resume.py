"""Checkpoint/resume + exactly-once semantics of the CDC engine."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import (
    apply_changes,
    final_state_table,
    load_latest_manifest,
    make_base_table,
    make_change_table,
    sequential_replay,
)

N_BASE, N_EVENTS = 500, 2_000


def _bootstrap(tmp_path, lake, base):
    boot = pa.table(
        {
            "lsn": pa.array([0] * base.num_rows, pa.int64()),
            "op": pa.array(["INSERT"] * base.num_rows),
            **{c: base[c] for c in base.column_names},
        }
    )
    p = os.path.join(str(tmp_path), "boot.parquet")
    pq.write_table(boot, p)
    apply_changes(p, lake, num_partitions=8)


def test_failure_then_resume_converges(tmp_path, tmp_lake):
    """Inject a failure in one partition's merge; rerun with the same
    run_id: finished partitions are skipped (resumed from checkpoint)
    and the final state equals the oracle replay."""
    base = make_base_table(N_BASE, seed=42)
    changes = make_change_table(N_EVENTS, N_BASE, seed=43)
    _bootstrap(tmp_path, tmp_lake, base)
    log = os.path.join(str(tmp_path), "changes.parquet")
    pq.write_table(changes, log)

    with pytest.raises(Exception):
        apply_changes(
            log, tmp_lake, num_partitions=8, run_id="run-a", fail_parts=(3,)
        )
    # some partitions checkpointed before the failure
    staging = os.path.join(tmp_lake, ".staging", "run-a")
    done_before = [f for f in os.listdir(staging) if f.endswith(".done.json")]

    res = apply_changes(log, tmp_lake, num_partitions=8, run_id="run-a")
    # >=: in-flight merge tasks may still land sidecars between the
    # failure propagating and the staging listing above
    assert res.partitions_resumed >= len(done_before) > 0
    assert res.partitions_rewritten + res.partitions_resumed == 8

    got = final_state_table(tmp_lake)
    want = sequential_replay(base, changes)
    got = got.sort_by("doc_id")
    want = want.select(got.column_names).sort_by("doc_id")
    assert got.num_rows == want.num_rows
    for col in got.column_names:
        assert got[col].combine_chunks().equals(
            want[col].cast(got[col].type).combine_chunks()
        ), col


def test_crash_before_commit_leaves_previous_version(tmp_path, tmp_lake):
    """A failed run must not disturb the committed lake (version flip is
    the last, atomic step)."""
    base = make_base_table(N_BASE, seed=42)
    _bootstrap(tmp_path, tmp_lake, base)
    v1 = load_latest_manifest(tmp_lake)
    before = final_state_table(tmp_lake, user_columns_only=False)

    changes = make_change_table(N_EVENTS, N_BASE, seed=43)
    log = os.path.join(str(tmp_path), "changes.parquet")
    pq.write_table(changes, log)
    with pytest.raises(Exception):
        apply_changes(log, tmp_lake, num_partitions=8, run_id="run-b", fail_parts=(0,))

    assert load_latest_manifest(tmp_lake).version == v1.version
    assert final_state_table(tmp_lake, user_columns_only=False).equals(before)


def test_replay_outputs_byte_identical(tmp_path, tmp_lake):
    """Two independent applies of the same log from the same base lake
    produce byte-identical partition files (canonical sort + fixed
    writer settings, SURVEY.md §7.5 item 2)."""
    base = make_base_table(N_BASE, seed=42)
    changes = make_change_table(N_EVENTS, N_BASE, seed=43)
    log = os.path.join(str(tmp_path), "changes.parquet")
    pq.write_table(changes, log)

    lakes = [tmp_lake + "-x", tmp_lake + "-y"]
    for lake in lakes:
        _bootstrap(tmp_path, lake, base)
        apply_changes(log, lake, num_partitions=8)

    m0, m1 = (load_latest_manifest(lk) for lk in lakes)
    assert sorted(m0.parts) == sorted(m1.parts)
    for p in m0.parts:
        b0 = open(os.path.join(lakes[0], m0.parts[p].file), "rb").read()
        b1 = open(os.path.join(lakes[1], m1.parts[p].file), "rb").read()
        assert b0 == b1, f"partition {p} bytes differ"


def test_lineage_metrics(tmp_path, tmp_lake):
    """Manifest records per-partition applied-LSN watermarks and
    upsert/delete counters (north-rule lineage)."""
    base = make_base_table(N_BASE, seed=42)
    changes = make_change_table(N_EVENTS, N_BASE, seed=43)
    _bootstrap(tmp_path, tmp_lake, base)
    log = os.path.join(str(tmp_path), "changes.parquet")
    pq.write_table(changes, log)
    res = apply_changes(log, tmp_lake, num_partitions=8)

    m = load_latest_manifest(tmp_lake)
    assert m.max_lsn == N_EVENTS  # global watermark = last LSN in the log
    assert all(e.max_lsn > 0 for e in m.parts.values())
    total_rows = sum(e.rows for e in m.parts.values())
    assert total_rows == final_state_table(tmp_lake).num_rows
    assert res.rows_upserted > 0 and res.rows_deleted >= 0


def test_vacuum_retention(tmp_path):
    """Three applies -> three versions; vacuum(keep=1) drops old
    manifests and unreferenced files but keeps carried-forward ones;
    final state unchanged."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from palimpzest_ray.cdc.engine import apply_changes, final_state_table
    from palimpzest_ray.cdc.manifest import load_latest_manifest, vacuum

    lake = str(tmp_path / "lake")

    def _log(i, rows):
        p = str(tmp_path / f"log{i}.parquet")
        pq.write_table(pa.Table.from_pylist(rows), p)
        return p

    apply_changes(_log(1, [
        {"lsn": 1, "op": "INSERT", "doc_id": "a", "tokens": [1], "n_tok": 1, "source": "w"},
        {"lsn": 2, "op": "INSERT", "doc_id": "b", "tokens": [2], "n_tok": 1, "source": "w"},
    ]), lake, num_partitions=4)
    apply_changes(_log(2, [
        {"lsn": 3, "op": "UPDATE", "doc_id": "a", "tokens": [9], "n_tok": 1, "source": "w"},
    ]), lake, num_partitions=4)
    apply_changes(_log(3, [
        {"lsn": 4, "op": "INSERT", "doc_id": "c", "tokens": [3], "n_tok": 1, "source": "w"},
    ]), lake, num_partitions=4)

    before = final_state_table(lake).sort_by("doc_id").to_pylist()
    m = load_latest_manifest(lake)
    assert m.version == 3
    res = vacuum(lake, keep_versions=1)
    assert res.versions_dropped == [1, 2]
    assert res.files_deleted >= 1 and res.bytes_reclaimed > 0
    # old manifests gone, latest intact, referenced old files survive
    assert not os.path.exists(os.path.join(lake, "MANIFEST-v1.json"))
    assert load_latest_manifest(lake).version == 3
    for f in load_latest_manifest(lake).data_files(lake):
        assert os.path.exists(f), f
    after = final_state_table(lake).sort_by("doc_id").to_pylist()
    assert after == before
    # completed-run staging dirs were cleaned
    assert res.staging_runs_cleaned >= 3 or not glob.glob(
        os.path.join(lake, ".staging", "*", "*.parquet")
    )
    # idempotent
    res2 = vacuum(lake, keep_versions=1)
    assert res2.files_deleted == 0 and res2.versions_dropped == []


def test_commit_cas_detects_concurrent_writer(tmp_path):
    """Two runs planning against the same base version: the second
    commit raises instead of silently dropping the first's merge."""
    import pyarrow as pa
    import pytest as _pytest

    from palimpzest_ray.cdc.manifest import (
        ConcurrentCommitError,
        PartEntry,
        commit_version,
    )

    lake = str(tmp_path / "lake")
    staging = str(tmp_path / "stg")
    os.makedirs(lake), os.makedirs(staging)
    schema = pa.schema([pa.field("doc_id", pa.string())])

    import pyarrow.parquet as _pq

    for name in ("a.parquet", "b.parquet"):
        _pq.write_table(pa.table({"doc_id": pa.array(["x"])}), os.path.join(staging, name))
    commit_version(lake, staging, {0: PartEntry("a.parquet", 1, 1)}, {}, 4, schema, 0)
    with _pytest.raises(ConcurrentCommitError, match="advanced to v1"):
        commit_version(lake, staging, {1: PartEntry("b.parquet", 2, 1)}, {}, 4, schema, 0)


def test_stale_sidecars_discarded_when_base_advances(tmp_path):
    """Crash run A -> apply log B (lake advances) -> resume A with the
    same run_id: A's sidecars were merged against the old base, so they
    are discarded and A redoes its work; final state == replay(A ∪ B)."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from palimpzest_ray.cdc import (
        apply_changes,
        final_state_table,
        sequential_replay,
    )
    from palimpzest_ray.cdc.synth import write_change_log

    lake = str(tmp_path / "lake")
    la = str(tmp_path / "a")
    lb = str(tmp_path / "b")
    write_change_log(la, 3_000, 500, seed=61, chunk_rows=1_500)
    write_change_log(lb, 3_000, 500, seed=62, start_lsn=3_001, chunk_rows=1_500)

    with pytest.raises(RuntimeError):
        apply_changes(la, lake, num_partitions=4, run_id="runA", fail_parts=(1,))
    apply_changes(lb, lake, num_partitions=4)  # interleaved writer
    res = apply_changes(la, lake, num_partitions=4, run_id="runA")  # resume A
    assert res.partitions_resumed == 0  # stale sidecars were NOT reused

    changes = pa.concat_tables(
        [
            pq.read_table(f)
            for f in sorted(glob.glob(la + "/*.parquet")) + sorted(glob.glob(lb + "/*.parquet"))
        ],
        promote_options="permissive",
    )
    got = final_state_table(lake).sort_by("doc_id")
    want = sequential_replay(None, changes).sort_by("doc_id")
    assert got.equals(want.select(got.column_names).cast(got.schema))


def test_suggest_num_partitions(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from palimpzest_ray.cdc import apply_changes, suggest_num_partitions

    lake = str(tmp_path / "lake")
    rows = [
        {"lsn": i + 1, "op": "INSERT", "doc_id": f"d{i}", "tokens": [i] * 50,
         "n_tok": 50, "source": "w"}
        for i in range(2_000)
    ]
    p = str(tmp_path / "log.parquet")
    pq.write_table(pa.Table.from_pylist(rows), p)
    apply_changes(p, lake, num_partitions=4)
    # tiny lake → floor wins; a 1-byte target forces the size-based path
    assert suggest_num_partitions(lake, target_mb=512) == 8
    big = suggest_num_partitions(lake, target_mb=512, min_partitions=1)
    assert big == 1


def test_run_report_persisted(tmp_path):
    import glob
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from palimpzest_ray.cdc import apply_changes

    lake = str(tmp_path / "lake")
    rows = [
        {"lsn": 1, "op": "INSERT", "doc_id": "a", "tokens": [1], "n_tok": 1, "source": "w"}
    ]
    p = str(tmp_path / "log.parquet")
    pq.write_table(pa.Table.from_pylist(rows), p)
    apply_changes(p, lake, num_partitions=2, run_id="audit1")
    with open(os.path.join(lake, ".runs", "audit1.json")) as f:
        rep = _json.load(f)
    assert rep["version"] == 1 and rep["events_seen"] == 1
    assert rep["lineage"] and all("max_lsn" in d for d in rep["lineage"])


def test_killed_merge_worker_converges_via_task_retry(tmp_path, tmp_lake):
    """Kill one merge worker process mid-apply (SIGKILL via die_once —
    a hard death, not an exception): the apply must still SUCCEED in
    one call, because merges run as plain tasks that Ray retries via
    lineage after worker death (no actor-restart dependency on evicted
    constructor args, ray#53727). Result equals the sequential oracle."""
    base = make_base_table(N_BASE, seed=7)
    changes = make_change_table(N_EVENTS, N_BASE, seed=8)
    _bootstrap(tmp_path, tmp_lake, base)
    log = os.path.join(str(tmp_path), "changes.parquet")
    pq.write_table(changes, log)

    marker = os.path.join(str(tmp_path), "die_once_marker")
    res = apply_changes(log, tmp_lake, num_partitions=8, die_once=marker)
    assert os.path.exists(marker), "fault was never injected"
    assert res.partitions_rewritten + res.partitions_resumed == 8

    got = final_state_table(tmp_lake)
    want = sequential_replay(base, changes)
    got_d = {r["doc_id"]: r["tokens"] for r in got.to_pylist()}
    want_d = {r["doc_id"]: r["tokens"] for r in want.to_pylist()}
    assert got_d == want_d


def test_auto_compaction_bounds_files_and_preserves_state(tmp_path, tmp_lake):
    """N small applies with auto_compact: superseded files stay bounded
    (vacuum trigger), the live layout re-buckets toward the advised
    partition count (resize trigger with a tiny target), and the final
    state is byte-identical to a lake that never compacted."""
    from palimpzest_ray.cdc import (
        CompactionPolicy,
        auto_compact,
        load_latest_manifest,
        superseded_files,
    )

    base = make_base_table(300, seed=11)
    _bootstrap(tmp_path, tmp_lake, base)
    plain = os.path.join(str(tmp_path), "plain_lake")
    _bootstrap(tmp_path, plain, base)

    policy = CompactionPolicy(
        target_file_mb=1,  # tiny target => advisor collapses partitions
        resize_factor=2.0,
        max_superseded_files=4,
        keep_versions=1,
        min_partitions=2,
    )
    logs = []
    for i in range(4):
        chg = make_change_table(400, 300, seed=100 + i)
        chg = chg.set_column(
            chg.column_names.index("lsn"),
            "lsn",
            pa.array((np.asarray(chg["lsn"]) + i * 10_000).tolist(), pa.int64()),
        )
        p = os.path.join(str(tmp_path), f"chg{i}.parquet")
        pq.write_table(chg, p)
        logs.append(p)
        apply_changes(p, tmp_lake, num_partitions=8, auto_compact=policy)
        apply_changes(p, plain, num_partitions=8)

    # superseded debt bounded: strictly fewer stale files than the
    # 4-apply x 8-partition worst case, and under the trigger + one round
    stale = superseded_files(tmp_lake, policy.keep_versions)
    assert len(stale) < policy.max_superseded_files + 8

    # resize trigger fired at least once: tiny lake collapsed toward
    # min_partitions
    m = load_latest_manifest(tmp_lake)
    assert m.num_partitions < 8

    # a direct auto_compact call with a zero-tolerance vacuum trigger
    # reclaims everything unreferenced
    report = auto_compact(
        tmp_lake, CompactionPolicy(max_superseded_files=1, keep_versions=1,
                                   target_file_mb=1, min_partitions=2,
                                   resize_factor=100.0)
    )
    assert report["files_deleted"] >= 0
    assert superseded_files(tmp_lake, 1) == []

    got = final_state_table(tmp_lake)
    want = final_state_table(plain)
    gd = {r["doc_id"]: r["tokens"] for r in got.to_pylist()}
    wd = {r["doc_id"]: r["tokens"] for r in want.to_pylist()}
    assert gd == wd
