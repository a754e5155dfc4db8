"""Merge-on-read (delta) apply mode: byte-equality vs the rewrite twin,
chain-aware readers, compaction, and the predicate-soundness trap.

The contract under test: ``apply_changes(mode="delta")`` must be
observationally IDENTICAL to ``mode="rewrite"`` — same final state,
same lineage counters, same watermarks — while writing only
change-sized files per apply (the 10^10-event steady state).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import (
    CompactionPolicy,
    apply_changes,
    auto_compact,
    compact_deltas,
    final_state,
    final_state_table,
    load_latest_manifest,
    lookup,
    make_base_table,
    make_change_table,
    net_changes_since,
    sequential_replay,
    vacuum,
)

N_BASE = 600
N_EVENTS = 1_500
P = 8


def _write(tmp_path, name: str, table: pa.Table) -> str:
    p = os.path.join(str(tmp_path), name)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    pq.write_table(table, p)
    return p


def _bootstrap(tmp_path, lake: str, base: pa.Table, tag: str) -> None:
    log = pa.table(
        {
            "lsn": pa.array([0] * base.num_rows, pa.int64()),
            "op": pa.array(["INSERT"] * base.num_rows),
            **{c: base[c] for c in base.column_names},
        }
    )
    apply_changes(_write(tmp_path, f"{tag}/boot.parquet", log), lake, num_partitions=P)


def _assert_equal(got: pa.Table, want: pa.Table):
    got, want = got.sort_by("doc_id"), want.select(got.column_names).sort_by("doc_id")
    assert got.num_rows == want.num_rows, (got.num_rows, want.num_rows)
    for col in got.column_names:
        g = got[col].combine_chunks()
        w = want[col].cast(got[col].type).combine_chunks()
        assert g.equals(w), f"column {col} differs"


@pytest.fixture()
def epochs():
    base = make_base_table(N_BASE, seed=7)
    e1 = make_change_table(N_EVENTS, N_BASE, seed=8, start_lsn=1)
    e2 = make_change_table(N_EVENTS, N_BASE, seed=9, start_lsn=N_EVENTS + 1)
    e3 = make_change_table(
        N_EVENTS, N_BASE, seed=10, start_lsn=2 * N_EVENTS + 1, evolved=True
    )
    return base, [e1, e2, e3]


def _twin_lakes(tmp_path, base):
    d, r = str(tmp_path / "delta_lake"), str(tmp_path / "rewrite_lake")
    _bootstrap(tmp_path, d, base, "bd")
    _bootstrap(tmp_path, r, base, "br")
    return d, r


def test_delta_equals_rewrite_twin_with_evolution(tmp_path, epochs):
    """Three epochs (the last schema-evolved): state AND lineage
    counters identical between delta and rewrite lakes."""
    base, logs = epochs
    dlake, rlake = _twin_lakes(tmp_path, base)
    for i, log in enumerate(logs):
        p = _write(tmp_path, f"log{i}/chunk.parquet", log)
        rd_ = apply_changes(p, dlake, mode="delta")
        rr = apply_changes(p, rlake, mode="rewrite")
        assert rd_.rows_upserted == rr.rows_upserted, f"epoch {i} upserted"
        assert rd_.rows_deleted == rr.rows_deleted, f"epoch {i} deleted"
        assert rd_.manifest.max_lsn == rr.manifest.max_lsn
        # effective per-partition stats match the rewrite twin exactly
        for part, e in rd_.manifest.parts.items():
            tw = rr.manifest.parts[part]
            assert (e.rows, e.tombstones) == (tw.rows, tw.tombstones), f"part {part}"
    m = load_latest_manifest(dlake)
    assert any(e.deltas for e in m.parts.values()), "no chains formed"
    # every delta file is change-sized, never lake-sized
    for e in m.parts.values():
        for dfile in e.deltas:
            assert pq.ParquetFile(os.path.join(dlake, dfile)).metadata.num_rows <= N_EVENTS
    _assert_equal(final_state_table(dlake), final_state_table(rlake))
    # and both match the sequential oracle
    oracle = sequential_replay(base, pa.concat_tables(logs, promote_options="permissive"))
    _assert_equal(final_state_table(dlake), oracle)


def test_delta_streaming_reader_and_lookup(tmp_path, epochs):
    base, logs = epochs
    dlake = str(tmp_path / "lake")
    _bootstrap(tmp_path, dlake, base, "b")
    for i, log in enumerate(logs[:2]):
        apply_changes(_write(tmp_path, f"l{i}/c.parquet", log), dlake, mode="delta")
    want = final_state_table(dlake)
    # streaming Dataset read resolves chains to the same rows
    got = pa.concat_tables(
        [pa.Table.from_pandas(final_state(dlake).to_pandas(), preserve_index=False)]
    ).cast(want.schema)
    _assert_equal(got, want)
    # column-pruned read too
    pruned = final_state(dlake, columns=["doc_id", "n_tok"]).to_pandas()
    assert sorted(pruned.columns) == ["doc_id", "n_tok"]
    assert len(pruned) == want.num_rows
    # lookup: an updated key returns its NEWEST value; a deleted key none
    keys = want["doc_id"].to_pylist()[:3]
    got_rows = lookup(dlake, keys)
    _assert_equal(got_rows, want.filter(pc.is_in(want["doc_id"], pa.array(keys))))
    all_keys = set(f"doc-{i:08d}" for i in range(N_BASE))
    deleted = sorted(all_keys - set(want["doc_id"].to_pylist()))[:2]
    if deleted:
        assert lookup(dlake, deleted).num_rows == 0


def test_compact_deltas_identical_state_and_vacuum(tmp_path, epochs):
    base, logs = epochs
    dlake = str(tmp_path / "lake")
    _bootstrap(tmp_path, dlake, base, "b")
    for i, log in enumerate(logs):
        apply_changes(_write(tmp_path, f"l{i}/c.parquet", log), dlake, mode="delta")
    before = final_state_table(dlake)
    m0 = load_latest_manifest(dlake)
    chained = [p for p, e in m0.parts.items() if e.deltas]
    assert chained
    # live chain files survive an aggressive vacuum (they are referenced)
    vacuum(dlake, keep_versions=1)
    _assert_equal(final_state_table(dlake), before)
    rep = compact_deltas(dlake)
    assert rep["parts_compacted"] == len(chained)
    m1 = load_latest_manifest(dlake)
    assert all(not e.deltas for e in m1.parts.values())
    _assert_equal(final_state_table(dlake), before)
    # per-partition stats carried exactly through the fold
    for p in chained:
        assert (m1.parts[p].rows, m1.parts[p].tombstones) == (
            m0.parts[p].rows,
            m0.parts[p].tombstones,
        )
    # the folded chains become unreferenced and reclaimable
    v = vacuum(dlake, keep_versions=1)
    assert v.files_deleted > 0
    _assert_equal(final_state_table(dlake), before)


def test_rewrite_apply_compacts_touched_chains(tmp_path, epochs):
    """Modes mix freely: a rewrite apply on a chained lake folds the
    chains it touches and the state still matches an all-rewrite twin."""
    base, logs = epochs
    dlake, rlake = _twin_lakes(tmp_path, base)
    for i, log in enumerate(logs[:2]):
        p = _write(tmp_path, f"l{i}/c.parquet", log)
        apply_changes(p, dlake, mode="delta")
        apply_changes(p, rlake, mode="rewrite")
    p = _write(tmp_path, "l2/c.parquet", logs[2])
    apply_changes(p, dlake, mode="rewrite")
    apply_changes(p, rlake, mode="rewrite")
    m = load_latest_manifest(dlake)
    touched = {
        int(pp)
        for pp, e in m.parts.items()
        if e.file.startswith(f"data/v{m.version}/")
    }
    assert touched and all(not m.parts[p].deltas for p in touched)
    _assert_equal(final_state_table(dlake), final_state_table(rlake))


def test_auto_compact_bounds_chain_length(tmp_path):
    base = make_base_table(N_BASE, seed=11)
    dlake = str(tmp_path / "lake")
    _bootstrap(tmp_path, dlake, base, "b")
    policy = CompactionPolicy(
        max_delta_files=3,
        resize_factor=1e9,  # never re-bucket in this test
        max_superseded_files=10**9,  # never vacuum in this test
    )
    logs = []
    for i in range(8):
        log = make_change_table(200, N_BASE, seed=20 + i, start_lsn=1 + i * 200)
        logs.append(log)
        apply_changes(
            _write(tmp_path, f"l{i}/c.parquet", log),
            dlake,
            mode="delta",
            auto_compact=policy,
        )
        m = load_latest_manifest(dlake)
        assert max(len(e.deltas) for e in m.parts.values()) < policy.max_delta_files
    oracle = sequential_replay(
        base, pa.concat_tables(logs, promote_options="permissive")
    )
    _assert_equal(final_state_table(dlake), oracle)


def test_auto_compact_hook_fires_from_apply(tmp_path):
    """The opportunistic hook reports the delta fold in ApplyResult."""
    base = make_base_table(200, seed=12)
    dlake = str(tmp_path / "lake")
    _bootstrap(tmp_path, dlake, base, "b")
    policy = CompactionPolicy(
        max_delta_files=2, resize_factor=1e9, max_superseded_files=10**9
    )
    r1 = apply_changes(
        _write(tmp_path, "l0/c.parquet", make_change_table(300, 200, seed=30)),
        dlake, mode="delta", auto_compact=policy,
    )
    assert not r1.compaction.get("delta_parts_compacted")
    r2 = apply_changes(
        _write(
            tmp_path, "l1/c.parquet", make_change_table(300, 200, seed=31, start_lsn=301)
        ),
        dlake, mode="delta", auto_compact=policy,
    )
    assert r2.compaction.get("delta_parts_compacted", 0) > 0


def test_delta_resume_after_partition_failure(tmp_path):
    base = make_base_table(N_BASE, seed=13)
    dlake, rlake = str(tmp_path / "d"), str(tmp_path / "r")
    _bootstrap(tmp_path, dlake, base, "bd")
    _bootstrap(tmp_path, rlake, base, "br")
    log = make_change_table(N_EVENTS, N_BASE, seed=14)
    p = _write(tmp_path, "l/c.parquet", log)
    with pytest.raises(RuntimeError, match="merge"):
        apply_changes(p, dlake, mode="delta", run_id="run1", fail_parts=(3,))
    assert load_latest_manifest(dlake).version == 1  # no commit
    res = apply_changes(p, dlake, mode="delta", run_id="run1")
    assert res.partitions_resumed > 0
    apply_changes(p, rlake, mode="rewrite")
    _assert_equal(final_state_table(dlake), final_state_table(rlake))


def test_delta_old_segment_arrival_is_noop(tmp_path):
    """A late-arriving segment strictly BELOW every key's persisted
    ``_lsn`` writes no files (every change loses) yet still commits a
    consistent version. (Equal-LSN replay instead ties toward the
    change side — same contract as the rewrite merge — and is
    idempotent by content equality.)"""
    base = make_base_table(300, seed=15)
    dlake = str(tmp_path / "lake")
    _bootstrap(tmp_path, dlake, base, "b")
    log = make_change_table(500, 300, seed=16, start_lsn=1000)
    apply_changes(_write(tmp_path, "l/c.parquet", log), dlake, mode="delta")
    before = final_state_table(dlake)
    m_before = load_latest_manifest(dlake)
    # the same events as an out-of-order segment 999 LSNs earlier: every
    # key's winner here is strictly older than its persisted row
    stale = log.set_column(
        0, "lsn", pc.subtract(log["lsn"], pa.scalar(999, pa.int64()))
    )
    res = apply_changes(
        _write(tmp_path, "stale/c.parquet", stale), dlake, mode="delta"
    )
    assert res.rows_upserted == 0 and res.rows_deleted == 0
    m_after = load_latest_manifest(dlake)
    # replay added nothing to any chain
    assert {p_: tuple(e.deltas) for p_, e in m_after.parts.items()} == {
        p_: tuple(e.deltas) for p_, e in m_before.parts.items()
    }
    _assert_equal(final_state_table(dlake), before)


def test_net_changes_since_across_deltas(tmp_path):
    base = make_base_table(300, seed=17)
    dlake = str(tmp_path / "lake")
    _bootstrap(tmp_path, dlake, base, "b")
    v1 = load_latest_manifest(dlake).version
    for i in range(2):
        log = make_change_table(400, 300, seed=18 + i, start_lsn=1 + i * 400)
        apply_changes(_write(tmp_path, f"l{i}/c.parquet", log), dlake, mode="delta")
    feed_dir = str(tmp_path / "feed")
    net_changes_since(dlake, v1).write_parquet(feed_dir)
    # applying the feed to a replica of v1 converges it to latest
    replica = str(tmp_path / "replica")
    _bootstrap(tmp_path, replica, base, "rb")
    apply_changes(feed_dir, replica, mode="delta")
    _assert_equal(final_state_table(replica), final_state_table(dlake))


def test_predicate_on_delta_lake_sees_only_final_values(tmp_path):
    """The soundness trap: a delta overwrites a predicate-matching base
    row with a non-matching value — the old value must NOT surface."""
    base = pa.table(
        {
            "doc_id": pa.array([f"doc-{i:08d}" for i in range(8)]),
            "tokens": pa.array([[1, 2]] * 8, pa.list_(pa.int32())),
            "n_tok": pa.array([2] * 8, pa.int32()),
            "source": pa.array(["web"] * 8),
        }
    )
    dlake = str(tmp_path / "lake")
    _bootstrap(tmp_path, dlake, base, "b")
    # move doc 0 out of 'web'; delete doc 1; add doc 9 into 'web'
    log = pa.table(
        {
            "lsn": pa.array([1, 2, 3], pa.int64()),
            "op": pa.array(["UPDATE", "DELETE", "INSERT"]),
            "doc_id": pa.array(["doc-00000000", "doc-00000001", "doc-00000009"]),
            "tokens": pa.array([[9], None, [7, 7]], pa.list_(pa.int32())),
            "n_tok": pa.array([1, None, 2], pa.int32()),
            "source": pa.array(["book", None, "web"]),
        }
    )
    apply_changes(_write(tmp_path, "l/c.parquet", log), dlake, mode="delta")
    got = (
        final_state(dlake, predicate=[("source", "==", "web")])
        .to_pandas()
        .sort_values("doc_id")
    )
    want = {f"doc-{i:08d}" for i in range(2, 8)} | {"doc-00000009"}
    assert set(got["doc_id"]) == want
    assert (got["source"] == "web").all()


def test_streaming_chain_resolver_equals_in_memory(tmp_path, monkeypatch):
    """final_state over delta chains with the base forced down the
    bounded-memory streaming path: same rows, tombstones dropped,
    predicates exact, internal-column reads (CDF path) intact."""
    import palimpzest_ray.cdc.engine as eng

    base, logs = (
        make_base_table(500, seed=21),
        [
            make_change_table(700, 500, seed=22, start_lsn=1),
            make_change_table(700, 500, seed=23, start_lsn=701),
        ],
    )
    dlake = str(tmp_path / "lake")
    _bootstrap(tmp_path, dlake, base, "b")
    for i, log in enumerate(logs):
        apply_changes(_write(tmp_path, f"l{i}/c.parquet", log), dlake, mode="delta")
    want = final_state_table(dlake)

    monkeypatch.setattr(eng, "RESOLVE_STREAM_THRESHOLD_ROWS", 8)
    import ray

    refs = final_state(dlake).to_arrow_refs()
    got = pa.concat_tables(
        [t for t in ray.get(refs) if t.num_rows], promote_options="permissive"
    )
    _assert_equal(got.cast(want.schema), want)
    # predicate through the streaming path stays exact
    srcs = want["source"].to_pylist()
    pick = srcs[0]
    got_p = final_state(dlake, predicate=[("source", "==", pick)]).take_all()
    want_n = sum(1 for s in srcs if s == pick)
    assert len(got_p) == want_n and all(r["source"] == pick for r in got_p)
    # CDF read (internal columns) through the streaming path
    feed_rows = net_changes_since(dlake, 1).take_all()
    assert all("lsn" in r and "op" in r for r in feed_rows)
