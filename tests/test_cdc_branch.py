"""Zero-copy branches + three-way partition-level merge.

A branch is a sub-lake whose v1 manifest references the parent's files
by relative path (no bytes copied); applies on it are isolated; merge
reconciles partition-by-partition against the pinned fork base —
fast-forward when the parent stood still, branch/parent entries when
only one side moved, MergeConflict when both did.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import (
    MergeConflict,
    apply_changes,
    create_branch,
    delete_branch,
    final_state_table,
    list_branches,
    load_latest_manifest,
    merge_branch,
    vacuum,
)
from palimpzest_ray.cdc.oracle import sequential_replay


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


def _boot(tmp_path, lake, n=6):
    apply_changes(
        _log(
            [
                {"lsn": i, "op": "INSERT", "doc_id": f"doc-{i:03d}", "n_tok": i}
                for i in range(1, n + 1)
            ],
            tmp_path, "boot.parquet",
        ),
        lake, num_partitions=4,
    )


def _state(lake, **kw):
    t = final_state_table(lake, **kw)
    return sorted(t.to_pylist(), key=lambda r: r["doc_id"])


def test_branch_is_zero_copy_and_isolated(tmp_path, tmp_lake):
    _boot(tmp_path, tmp_lake)
    broot = create_branch(tmp_lake, "dev")
    assert list_branches(tmp_lake) == ["dev"]
    # zero copy: the branch owns no data files yet
    assert glob.glob(os.path.join(broot, "data", "**", "*.parquet")) == []
    assert _state(broot) == _state(tmp_lake)

    # branch apply is invisible to the parent; parent apply invisible
    # to the branch
    apply_changes(
        _log(
            [{"lsn": 10, "op": "UPDATE", "doc_id": "doc-001", "n_tok": 99}],
            tmp_path, "b1.parquet",
        ),
        broot, num_partitions=4,
    )
    assert {r["doc_id"]: r["n_tok"] for r in _state(broot)}["doc-001"] == 99
    assert {r["doc_id"]: r["n_tok"] for r in _state(tmp_lake)}["doc-001"] == 1
    delete_branch(tmp_lake, "dev")
    assert list_branches(tmp_lake) == []
    assert _state(tmp_lake)[0]["n_tok"] == 1  # parent untouched


def test_fast_forward_merge_equals_replay(tmp_path, tmp_lake):
    _boot(tmp_path, tmp_lake)
    broot = create_branch(tmp_lake, "ff")
    log2 = [
        {"lsn": 10, "op": "UPDATE", "doc_id": "doc-002", "n_tok": 22},
        {"lsn": 11, "op": "DELETE", "doc_id": "doc-003", "n_tok": None},
        {"lsn": 12, "op": "INSERT", "doc_id": "doc-new", "n_tok": 7},
    ]
    apply_changes(_log(log2, tmp_path, "e2.parquet"), broot, num_partitions=4)
    m = merge_branch(tmp_lake, "ff", delete=True)
    assert m.version == 2 and load_latest_manifest(tmp_lake).version == 2
    # merged state == linear replay of both logs
    full = [
        {"lsn": i, "op": "INSERT", "doc_id": f"doc-{i:03d}", "n_tok": i}
        for i in range(1, 7)
    ] + log2
    oracle = sequential_replay(
        None,
        pa.Table.from_pylist(
            full,
            schema=pa.schema(
                [("lsn", pa.int64()), ("op", pa.string()),
                 ("doc_id", pa.string()), ("n_tok", pa.int32())]
            ),
        ),
        key="doc_id",
    )
    got = {r["doc_id"]: r["n_tok"] for r in _state(tmp_lake)}
    want = {
        r["doc_id"]: r["n_tok"]
        for r in oracle.to_pylist()
    }
    assert got == want
    assert list_branches(tmp_lake) == []  # delete=True dropped it
    # the merged version reads even though the branch dir is gone
    # (branch-local files were promoted into the parent's data tree)
    assert len(_state(tmp_lake)) == len(want)


def test_disjoint_merge_and_conflict(tmp_path, tmp_lake):
    _boot(tmp_path, tmp_lake, n=12)
    m1 = load_latest_manifest(tmp_lake)
    # find two keys in DIFFERENT partitions by probing the router: use
    # doc ids and check which partition each landed in via key lookup
    from palimpzest_ray.cdc.engine import lookup

    part_of = {}
    for i in range(1, 13):
        doc = f"doc-{i:03d}"
        part_of[doc] = None
    # derive partitions from per-partition files: apply a single-key
    # update on a branch and see which partition's entry changed
    broot = create_branch(tmp_lake, "dev")
    apply_changes(
        _log(
            [{"lsn": 20, "op": "UPDATE", "doc_id": "doc-001", "n_tok": 101}],
            tmp_path, "bx.parquet",
        ),
        broot, num_partitions=4,
    )
    bhead = load_latest_manifest(broot)
    changed_on_branch = {
        p
        for p in bhead.parts
        if (bhead.parts[p].file, tuple(bhead.parts[p].deltas))
        != (
            os.path.join("..", "..", m1.parts[p].file),
            tuple(
                os.path.join("..", "..", d) for d in m1.parts[p].deltas
            ),
        )
    }
    assert len(changed_on_branch) == 1
    # parent moves a DIFFERENT key: find one that lands elsewhere by
    # trying candidates until the changed partition differs
    for i in range(2, 13):
        doc = f"doc-{i:03d}"
        probe = create_branch(tmp_lake, "probe")
        apply_changes(
            _log(
                [{"lsn": 21, "op": "UPDATE", "doc_id": doc, "n_tok": 1}],
                tmp_path, "probe.parquet",
            ),
            probe, num_partitions=4,
        )
        ph = load_latest_manifest(probe)
        probe_changed = {
            p
            for p in ph.parts
            if ph.parts[p].file != os.path.join("..", "..", m1.parts[p].file)
        }
        delete_branch(tmp_lake, "probe")
        if probe_changed != changed_on_branch:
            disjoint_doc = doc
            break
    else:
        pytest.skip("all probe keys hash to one partition")

    # disjoint: parent updates disjoint_doc, branch updated doc-001
    apply_changes(
        _log(
            [{"lsn": 30, "op": "UPDATE", "doc_id": disjoint_doc, "n_tok": 200}],
            tmp_path, "p2.parquet",
        ),
        tmp_lake, num_partitions=4,
    )
    merged = merge_branch(tmp_lake, "dev", delete=True)
    got = {r["doc_id"]: r["n_tok"] for r in _state(tmp_lake)}
    assert got["doc-001"] == 101 and got[disjoint_doc] == 200
    assert merged.version == load_latest_manifest(tmp_lake).version

    # conflict: both sides touch the SAME key
    b2 = create_branch(tmp_lake, "clash")
    apply_changes(
        _log(
            [{"lsn": 40, "op": "UPDATE", "doc_id": "doc-005", "n_tok": 1}],
            tmp_path, "c1.parquet",
        ),
        b2, num_partitions=4,
    )
    apply_changes(
        _log(
            [{"lsn": 41, "op": "UPDATE", "doc_id": "doc-005", "n_tok": 2}],
            tmp_path, "c2.parquet",
        ),
        tmp_lake, num_partitions=4,
    )
    with pytest.raises(MergeConflict):
        merge_branch(tmp_lake, "clash")
    delete_branch(tmp_lake, "clash")


def test_parent_vacuum_protects_branch_referenced_files(tmp_path, tmp_lake):
    _boot(tmp_path, tmp_lake)
    broot = create_branch(tmp_lake, "pin")
    # advance the parent well past the retention window so v1's files
    # are only referenced by the branch
    for i in range(5):
        apply_changes(
            _log(
                [
                    {
                        "lsn": 100 + i,
                        "op": "UPDATE",
                        "doc_id": f"doc-{(i % 6) + 1:03d}",
                        "n_tok": 100 + i,
                    }
                ],
                tmp_path, f"adv{i}.parquet",
            ),
            tmp_lake, num_partitions=4,
        )
    before = _state(broot)
    vacuum(tmp_lake, keep_versions=1)
    # branch still reads its fork state byte-for-byte
    assert _state(broot) == before
    # releasing the branch lets the next vacuum reclaim
    delete_branch(tmp_lake, "pin")
    res = vacuum(tmp_lake, keep_versions=1)
    assert res.files_deleted > 0


def test_merge_unifies_evolved_schema(tmp_path, tmp_lake):
    _boot(tmp_path, tmp_lake)
    broot = create_branch(tmp_lake, "evo")
    evolved = pa.Table.from_pylist(
        [
            {
                "lsn": 50,
                "op": "INSERT",
                "doc_id": "doc-evo",
                "n_tok": 3,
                "lang": "en",
            }
        ],
        schema=pa.schema(
            [("lsn", pa.int64()), ("op", pa.string()),
             ("doc_id", pa.string()), ("n_tok", pa.int32()),
             ("lang", pa.string())]
        ),
    )
    p = os.path.join(str(tmp_path), "evo.parquet")
    pq.write_table(evolved, p)
    apply_changes(p, broot, num_partitions=4)
    m = merge_branch(tmp_lake, "evo", delete=True)
    assert "lang" in m.schema.names
    rows = {r["doc_id"]: r.get("lang") for r in _state(tmp_lake)}
    assert rows["doc-evo"] == "en" and rows["doc-001"] is None
