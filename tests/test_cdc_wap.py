"""Write-audit-publish: staged commits that audits gate.

``apply_changes(audit=True)`` fully writes a version without moving
LATEST; auditors read it via ``version=``; ``publish_version`` is a
pure pointer flip (the staged slot blocks every other writer, so the
planned base is still the head); ``discard_version`` abandons it.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import (
    apply_changes,
    discard_version,
    final_state_table,
    lake_count,
    load_latest_manifest,
    publish_version,
    read_quarantine,
    vacuum,
)
from palimpzest_ray.cdc.manifest import ConcurrentCommitError


def _log(rows, tmp_path, name):
    t = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("lsn", pa.int64()),
                ("op", pa.string()),
                ("doc_id", pa.string()),
                ("n_tok", pa.int32()),
            ]
        ),
    )
    p = os.path.join(str(tmp_path), name)
    pq.write_table(t, p)
    return p


def _boot(tmp_path, lake):
    apply_changes(
        _log(
            [
                {"lsn": 1, "op": "INSERT", "doc_id": "a", "n_tok": 5},
                {"lsn": 2, "op": "INSERT", "doc_id": "b", "n_tok": 7},
            ],
            tmp_path, "boot.parquet",
        ),
        lake, num_partitions=2,
    )


def test_wap_stage_audit_publish(tmp_path, tmp_lake):
    _boot(tmp_path, tmp_lake)
    res = apply_changes(
        _log(
            [
                {"lsn": 3, "op": "UPDATE", "doc_id": "a", "n_tok": 9},
                {"lsn": 4, "op": "DELETE", "doc_id": "b", "n_tok": None},
            ],
            tmp_path, "e2.parquet",
        ),
        tmp_lake, num_partitions=2, audit=True,
    )
    staged = res.manifest.version
    assert staged == 2
    # head readers see the pre-stage state; auditors see the staged one
    assert load_latest_manifest(tmp_lake).version == 1
    assert sorted(final_state_table(tmp_lake)["doc_id"].to_pylist()) == [
        "a", "b",
    ]
    audited = final_state_table(tmp_lake, version=staged)
    assert audited.to_pylist() == [{"doc_id": "a", "n_tok": 9}]
    assert lake_count(tmp_lake, version=staged) == 1
    # publish: pointer flip only; state byte-equal to the audit read
    m = publish_version(tmp_lake, staged)
    assert m.version == load_latest_manifest(tmp_lake).version == 2
    assert final_state_table(tmp_lake).equals(audited)


def test_wap_staged_slot_blocks_other_writers(tmp_path, tmp_lake):
    _boot(tmp_path, tmp_lake)
    res = apply_changes(
        _log([{"lsn": 3, "op": "INSERT", "doc_id": "c", "n_tok": 1}],
             tmp_path, "stage.parquet"),
        tmp_lake, num_partitions=2, audit=True,
    )
    with pytest.raises(ConcurrentCommitError, match="staged"):
        apply_changes(
            _log([{"lsn": 4, "op": "INSERT", "doc_id": "d", "n_tok": 2}],
                 tmp_path, "other.parquet"),
            tmp_lake, num_partitions=2,
        )
    # publish unblocks; the blocked write then lands as v3
    publish_version(tmp_lake, res.manifest.version)
    apply_changes(
        _log([{"lsn": 4, "op": "INSERT", "doc_id": "d", "n_tok": 2}],
             tmp_path, "other2.parquet"),
        tmp_lake, num_partitions=2,
    )
    assert load_latest_manifest(tmp_lake).version == 3
    assert sorted(final_state_table(tmp_lake)["doc_id"].to_pylist()) == [
        "a", "b", "c", "d",
    ]


def test_wap_discard_reclaims_and_frees_slot(tmp_path, tmp_lake):
    _boot(tmp_path, tmp_lake)
    res = apply_changes(
        _log([{"lsn": 3, "op": "INSERT", "doc_id": "bad", "n_tok": -1}],
             tmp_path, "stage.parquet"),
        tmp_lake, num_partitions=2, audit=True, quarantine=True,
    )
    staged = res.manifest.version
    discard_version(tmp_lake, staged)
    assert not os.path.exists(
        os.path.join(tmp_lake, f"MANIFEST-v{staged}.json")
    )
    assert not os.path.isdir(os.path.join(tmp_lake, "data", f"v{staged}"))
    assert read_quarantine(tmp_lake).num_rows == 0  # dead letter withdrawn
    # the slot is free again: the next commit takes v2 cleanly
    apply_changes(
        _log([{"lsn": 4, "op": "INSERT", "doc_id": "c", "n_tok": 3}],
             tmp_path, "next.parquet"),
        tmp_lake, num_partitions=2,
    )
    assert load_latest_manifest(tmp_lake).version == staged
    assert sorted(final_state_table(tmp_lake)["doc_id"].to_pylist()) == [
        "a", "b", "c",
    ]
    # guards: can't discard published versions, can't publish out of order
    with pytest.raises(ValueError, match="published"):
        discard_version(tmp_lake, staged)
    with pytest.raises(ConcurrentCommitError, match="head"):
        publish_version(tmp_lake, staged + 5)


def test_wap_survives_vacuum_mid_audit(tmp_path, tmp_lake):
    _boot(tmp_path, tmp_lake)
    # advance head a few times so vacuum has something to drop
    for i, lsn in enumerate((3, 4, 5)):
        apply_changes(
            _log([{"lsn": lsn, "op": "UPDATE", "doc_id": "a",
                   "n_tok": 10 + i}], tmp_path, f"e{lsn}.parquet"),
            tmp_lake, num_partitions=2,
        )
    res = apply_changes(
        _log([{"lsn": 9, "op": "INSERT", "doc_id": "z", "n_tok": 1}],
             tmp_path, "stage.parquet"),
        tmp_lake, num_partitions=2, audit=True,
    )
    staged = res.manifest.version
    vacuum(tmp_lake, keep_versions=1)
    # the staged version's files survived the vacuum; publish still works
    audited = final_state_table(tmp_lake, version=staged)
    publish_version(tmp_lake, staged)
    assert final_state_table(tmp_lake).equals(audited)
    assert sorted(final_state_table(tmp_lake)["doc_id"].to_pylist()) == [
        "a", "b", "z",
    ]


def test_restore_version_rollback(tmp_path, tmp_lake):
    """Delta-RESTORE: pointer rollback to a retained version; the next
    commit overwrites the debris; vacuum reclaims debris files AND
    drops debris manifests (time travel can't point at deleted files)."""
    _boot(tmp_path, tmp_lake)
    v1_state = final_state_table(tmp_lake)
    apply_changes(
        _log([{"lsn": 3, "op": "DELETE", "doc_id": "a", "n_tok": None}],
             tmp_path, "e2.parquet"),
        tmp_lake, num_partitions=2,
    )
    assert final_state_table(tmp_lake).num_rows == 1
    from palimpzest_ray.cdc import restore_version

    m = restore_version(tmp_lake, 1)
    assert m.version == load_latest_manifest(tmp_lake).version == 1
    assert final_state_table(tmp_lake).equals(v1_state)
    with pytest.raises(ValueError, match="restore forward"):
        restore_version(tmp_lake, 9)
    # the next commit takes v2 again, overwriting the debris manifest
    apply_changes(
        _log([{"lsn": 4, "op": "INSERT", "doc_id": "c", "n_tok": 3}],
             tmp_path, "e3.parquet"),
        tmp_lake, num_partitions=2,
    )
    assert load_latest_manifest(tmp_lake).version == 2
    assert sorted(final_state_table(tmp_lake)["doc_id"].to_pylist()) == [
        "a", "b", "c",
    ]
    # rollback again, then vacuum: debris manifest v2 is dropped
    restore_version(tmp_lake, 1)
    rep = vacuum(tmp_lake, keep_versions=1)
    assert 2 in rep.versions_dropped
    assert not os.path.exists(os.path.join(tmp_lake, "MANIFEST-v2.json"))
    assert final_state_table(tmp_lake).equals(v1_state)


def test_restore_refuses_under_staged(tmp_path, tmp_lake):
    _boot(tmp_path, tmp_lake)
    apply_changes(
        _log([{"lsn": 3, "op": "INSERT", "doc_id": "c", "n_tok": 1}],
             tmp_path, "stage.parquet"),
        tmp_lake, num_partitions=2, audit=True,
    )
    from palimpzest_ray.cdc import restore_version

    with pytest.raises(ConcurrentCommitError, match="staged"):
        restore_version(tmp_lake, 1)


def test_audited_apply_pass_and_fail(tmp_path, tmp_lake):
    from palimpzest_ray.cdc import AuditFailed, audited_apply

    _boot(tmp_path, tmp_lake)
    # pass: net growth, custom audit sees the staged state
    seen = {}

    def _audit(lake, v):
        seen["rows"] = final_state_table(lake, version=v).num_rows
        return True

    res = audited_apply(
        _log([{"lsn": 3, "op": "INSERT", "doc_id": "c", "n_tok": 1}],
             tmp_path, "grow.parquet"),
        tmp_lake, num_partitions=2,
        max_delete_frac=0.5, audits=[("probe", _audit)],
    )
    assert seen["rows"] == 3
    assert load_latest_manifest(tmp_lake).version == res.manifest.version == 2
    # fail: deleting 2 of 3 rows breaches max_delete_frac; head unmoved,
    # the staged version discarded, the slot free
    with pytest.raises(AuditFailed, match="max_delete_frac"):
        audited_apply(
            _log(
                [
                    {"lsn": 4, "op": "DELETE", "doc_id": "a", "n_tok": None},
                    {"lsn": 5, "op": "DELETE", "doc_id": "b", "n_tok": None},
                ],
                tmp_path, "purge.parquet",
            ),
            tmp_lake, num_partitions=2, max_delete_frac=0.5,
        )
    assert load_latest_manifest(tmp_lake).version == 2
    assert not os.path.exists(os.path.join(tmp_lake, "MANIFEST-v3.json"))
    assert sorted(final_state_table(tmp_lake)["doc_id"].to_pylist()) == [
        "a", "b", "c",
    ]
    # a failing custom audit with keep_staged_on_fail leaves it staged
    with pytest.raises(AuditFailed, match="veto") as ei:
        audited_apply(
            _log([{"lsn": 6, "op": "INSERT", "doc_id": "d", "n_tok": 2}],
                 tmp_path, "veto.parquet"),
            tmp_lake, num_partitions=2,
            audits=[("veto", lambda lake, v: False)],
            keep_staged_on_fail=True,
        )
    staged = ei.value.staged_version
    assert os.path.exists(os.path.join(tmp_lake, f"MANIFEST-v{staged}.json"))
    assert final_state_table(tmp_lake, version=staged).num_rows == 4
    discard_version(tmp_lake, staged)


def test_ingest_lag_inspector(tmp_path, tmp_lake):
    """ingest_lag reads only footers: before any apply it reports the
    whole log pending; after tailing everything it reports caught_up;
    a new log file reopens exactly its own rows as lag."""
    from palimpzest_ray.cdc import ingest_lag, tail_once

    log_dir = os.path.join(str(tmp_path), "log")
    os.makedirs(log_dir)
    t1 = pa.table(
        {
            "lsn": pa.array([1, 2, 3], pa.int64()),
            "op": pa.array(["INSERT"] * 3),
            "doc_id": pa.array(["a", "b", "c"]),
            "n_tok": pa.array([1, 2, 3], pa.int32()),
        }
    )
    pq.write_table(t1, os.path.join(log_dir, "000.parquet"))
    lag0 = ingest_lag(log_dir, tmp_lake)
    assert lag0["lag_events"] == 3 and lag0["watermark"] is None
    tail_once(log_dir, tmp_lake, num_partitions=2)
    lag1 = ingest_lag(log_dir, tmp_lake)
    assert lag1["caught_up"] and lag1["watermark"] == 3
    assert lag1["log_max_lsn"] == 3 and lag1["files_pending"] == 0
    t2 = pa.table(
        {
            "lsn": pa.array([4, 5], pa.int64()),
            "op": pa.array(["INSERT"] * 2),
            "doc_id": pa.array(["d", "e"]),
            "n_tok": pa.array([4, 5], pa.int32()),
        }
    )
    pq.write_table(t2, os.path.join(log_dir, "001.parquet"))
    lag2 = ingest_lag(log_dir, tmp_lake)
    assert lag2["lag_events"] == 2 and lag2["files_pending"] == 1
    assert lag2["log_max_lsn"] == 5 and not lag2["caught_up"]


def test_audited_apply_quarantine_and_schema_guardrails(tmp_path, tmp_lake):
    from palimpzest_ray.cdc import AuditFailed, audited_apply

    _boot(tmp_path, tmp_lake)
    # quarantine-rate breach: 2 of 3 events dead-letter (> 50%)
    with pytest.raises(AuditFailed, match="max_quarantine_frac"):
        audited_apply(
            _log(
                [
                    {"lsn": 3, "op": "BAD", "doc_id": "x", "n_tok": 1},
                    {"lsn": 4, "op": "BAD", "doc_id": "y", "n_tok": 2},
                    {"lsn": 5, "op": "INSERT", "doc_id": "c", "n_tok": 3},
                ],
                tmp_path, "feedbreak.parquet",
            ),
            tmp_lake, num_partitions=2,
            quarantine=True, max_quarantine_frac=0.5,
        )
    assert load_latest_manifest(tmp_lake).version == 1
    assert read_quarantine(tmp_lake).num_rows == 0  # discarded with the stage
    # schema drift: a new column rides the feed; locked apply rejects it
    drift = pa.table(
        {
            "lsn": pa.array([6], pa.int64()),
            "op": pa.array(["INSERT"]),
            "doc_id": pa.array(["d"]),
            "n_tok": pa.array([4], pa.int32()),
            "surprise": pa.array(["?!"]),
        }
    )
    p = os.path.join(str(tmp_path), "drift.parquet")
    pq.write_table(drift, p)
    with pytest.raises(AuditFailed, match="schema_locked"):
        audited_apply(p, tmp_lake, num_partitions=2, schema_locked=True)
    assert load_latest_manifest(tmp_lake).version == 1
    assert "surprise" not in load_latest_manifest(tmp_lake).schema.names
    # the same drift passes unlocked (ordinary evolution)
    res = audited_apply(p, tmp_lake, num_partitions=2)
    assert "surprise" in res.manifest.schema.names
