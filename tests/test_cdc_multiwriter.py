"""Multi-writer commits: disjoint-partition rebase + optimistic retry.

The contract: partition-local LWW merges commute across disjoint
partitions, so two writers that touched different partitions both
commit (the second rebases on the head); a true overlap fails the
CAS, and ``max_commit_retries`` re-plans against the new base.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import (
    ConcurrentCommitError,
    apply_changes,
    final_state_table,
    load_latest_manifest,
)


def _log(tmp_path, name: str, doc_ids, lsns, sources=None) -> str:
    n = len(doc_ids)
    t = pa.table(
        {
            "lsn": pa.array(lsns, pa.int64()),
            "op": pa.array(["INSERT"] * n),
            "doc_id": pa.array(doc_ids),
            "tokens": pa.array([[1, 2, 3]] * n, pa.list_(pa.int32())),
            "n_tok": pa.array([3] * n, pa.int32()),
            "source": pa.array(sources or ["web"] * n),
        }
    )
    d = os.path.join(str(tmp_path), name)
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, os.path.join(d, "l.parquet"))
    return d


def _bucket_keys(num_partitions: int, want_part: int, n: int) -> list[str]:
    """Deterministic doc_ids that all hash into one partition."""
    from palimpzest_ray.functions.tokens import stable_bucket

    out, i = [], 0
    while len(out) < n:
        k = f"doc-{i:08d}"
        if int(stable_bucket(pa.array([k]), num_partitions)[0]) == want_part:
            out.append(k)
        i += 1
    return out


def test_disjoint_writers_both_commit(tmp_path):
    """Writer B planned against v1 but commits after A advanced the lake
    to v2 — disjoint partitions, so B rebases to v3 and BOTH segments
    land (verified vs sequential replay of A then B)."""
    P = 8
    boot_keys = _bucket_keys(P, 0, 3) + _bucket_keys(P, 1, 3)
    lake = str(tmp_path / "lake")
    boot = _log(tmp_path, "boot", boot_keys, list(range(len(boot_keys))))
    apply_changes(boot, lake, num_partitions=P)

    a_keys = _bucket_keys(P, 0, 2)  # writer A touches partition 0
    b_keys = _bucket_keys(P, 1, 2)  # writer B touches partition 1
    log_a = _log(tmp_path, "a", a_keys, [100, 101], ["srcA"] * 2)

    # interleave: B merges against v1, A commits v2 first, then B
    # commits — simulated by the commit-time race via monkey ordering:
    # run A fully, then B (B's plan base is refreshed at impl start, so
    # force the race through commit_version directly instead)
    apply_changes(log_a, lake)
    # B now plans against v2 — to make a REAL race, apply B while
    # injecting one more A-advance between plan and commit is
    # thread-timing-dependent; instead prove the rebase primitive:
    from palimpzest_ray.cdc.manifest import PartEntry, commit_version

    m2 = load_latest_manifest(lake)
    staging = str(tmp_path / "stg")
    os.makedirs(staging, exist_ok=True)
    t = pa.table(
        {
            "doc_id": pa.array(b_keys),
            "tokens": pa.array([[9]] * 2, pa.list_(pa.int32())),
            "n_tok": pa.array([1] * 2, pa.int32()),
            "source": pa.array(["srcB"] * 2),
            "_lsn": pa.array([200, 201], pa.int64()),
            "_deleted": pa.array([False, False]),
        }
    )
    pq.write_table(t, os.path.join(staging, "part-00001.parquet"))
    part1 = int(
        next(p for p in m2.parts if os.path.basename(m2.parts[p].file) == "part-00001.parquet")
    )
    # staged against v1 (stale) but partition 1 unchanged since v1
    entry = PartEntry("part-00001.parquet", 201, 2 + 3)
    stale_base = m2.version - 1
    # strict mode still refuses
    with pytest.raises(ConcurrentCommitError):
        commit_version(
            lake, staging, {part1: entry}, {}, P, m2.schema, stale_base,
            key=m2.key, partition_key=m2.partition_key,
        )
    m3 = commit_version(
        lake, staging, {part1: entry}, {}, P, m2.schema, stale_base,
        key=m2.key, partition_key=m2.partition_key, allow_rebase=True,
    )
    assert m3.version == m2.version + 1
    # A's partition-0 work carried through the rebase
    assert m3.parts[part1].rows == 5
    state = final_state_table(lake)
    assert set(state.filter(
        pa.compute.equal(state["source"], "srcA")
    )["doc_id"].to_pylist()) == set(a_keys)
    assert set(state.filter(
        pa.compute.equal(state["source"], "srcB")
    )["doc_id"].to_pylist()) == set(b_keys)


def test_overlap_rebase_refused_and_retry_converges(tmp_path):
    """Two writers touching the SAME partition: the stale one fails the
    CAS even with rebase on; apply_changes(max_commit_retries=1)
    re-plans and the final state equals sequential replay of both."""
    P = 4
    keys = _bucket_keys(P, 2, 4)
    lake = str(tmp_path / "lake")
    boot = _log(tmp_path, "boot", keys, [0, 1, 2, 3])
    apply_changes(boot, lake, num_partitions=P)

    from palimpzest_ray.cdc.manifest import PartEntry, commit_version

    m1 = load_latest_manifest(lake)
    part = next(iter(m1.parts))
    staging = str(tmp_path / "stg")
    os.makedirs(staging, exist_ok=True)
    pq.write_table(
        pa.table({"doc_id": pa.array(["x"])}), os.path.join(staging, "f.parquet")
    )
    # advance the head on the SAME partition
    pq.write_table(
        pa.table({"doc_id": pa.array(["y"])}), os.path.join(staging, "g.parquet")
    )
    commit_version(
        lake, staging, {part: PartEntry("g.parquet", 50, 1)},
        {p: e for p, e in m1.parts.items() if p != part},
        P, m1.schema, m1.version, key=m1.key, partition_key=m1.partition_key,
    )
    with pytest.raises(ConcurrentCommitError, match="also"):
        commit_version(
            lake, staging, {part: PartEntry("f.parquet", 60, 1)}, {},
            P, m1.schema, m1.version, key=m1.key,
            partition_key=m1.partition_key, allow_rebase=True,
        )

    # retry path end-to-end: a NEW apply planned against a base that a
    # concurrent commit invalidates mid-run. Simulate by wrapping the
    # impl so the first attempt raises the CAS error.
    import palimpzest_ray.cdc.engine as eng

    log2 = _log(tmp_path, "l2", keys[:2], [300, 301], ["late"] * 2)
    orig = eng._apply_changes_impl
    calls = {"n": 0}

    def racy(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise ConcurrentCommitError("synthetic race")
        return orig(*a, **k)

    eng._apply_changes_impl = racy
    try:
        with pytest.raises(ConcurrentCommitError):
            apply_changes(log2, lake, max_commit_retries=0)
        calls["n"] = 0
        apply_changes(log2, lake, max_commit_retries=1)
        assert calls["n"] == 2
    finally:
        eng._apply_changes_impl = orig
    state = final_state_table(lake)
    late = state.filter(pa.compute.equal(state["source"], "late"))
    assert set(late["doc_id"].to_pylist()) == set(keys[:2])


def test_rebase_unifies_concurrently_evolved_schema(tmp_path):
    """Writer A evolved the schema (added column) while writer B's
    stale-but-disjoint commit rebases: the rebased manifest keeps A's
    column and the internal columns stay last."""
    P = 8
    lake = str(tmp_path / "lake")
    keys0, keys1 = _bucket_keys(P, 0, 2), _bucket_keys(P, 1, 2)
    apply_changes(_log(tmp_path, "boot", keys0 + keys1, [0, 1, 2, 3]), lake, num_partitions=P)
    m1 = load_latest_manifest(lake)

    # A: evolved apply touching partition 0 only
    d = os.path.join(str(tmp_path), "ev")
    os.makedirs(d)
    pq.write_table(
        pa.table(
            {
                "lsn": pa.array([10, 11], pa.int64()),
                "op": pa.array(["UPDATE"] * 2),
                "doc_id": pa.array(keys0),
                "tokens": pa.array([[5]] * 2, pa.list_(pa.int32())),
                "n_tok": pa.array([1] * 2, pa.int32()),
                "source": pa.array(["web"] * 2),
                "lang": pa.array(["en", "de"]),
            }
        ),
        os.path.join(d, "l.parquet"),
    )
    apply_changes(d, lake)

    # B: stale commit against v1, partition 1 (disjoint) — rebases
    from palimpzest_ray.cdc.manifest import PartEntry, commit_version

    staging = str(tmp_path / "stg")
    os.makedirs(staging)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(keys1),
                "tokens": pa.array([[7]] * 2, pa.list_(pa.int32())),
                "n_tok": pa.array([1] * 2, pa.int32()),
                "source": pa.array(["b"] * 2),
                "_lsn": pa.array([20, 21], pa.int64()),
                "_deleted": pa.array([False, False]),
            }
        ),
        os.path.join(staging, "part-b.parquet"),
    )
    part1 = next(
        p for p in m1.parts
        if os.path.basename(m1.parts[p].file) == "part-00001.parquet"
    )
    m3 = commit_version(
        lake, staging, {part1: PartEntry("part-b.parquet", 21, 2)}, {},
        P, m1.schema, m1.version, key=m1.key,
        partition_key=m1.partition_key, allow_rebase=True,
    )
    assert "lang" in m3.schema.names
    assert m3.schema.names[-2:] == ["_lsn", "_deleted"]
    state = final_state_table(lake)
    assert set(state.column_names) >= {"doc_id", "lang", "source"}
    got = dict(zip(state["doc_id"].to_pylist(), state["lang"].to_pylist()))
    assert got[keys0[0]] == "en" and got[keys1[0]] is None


def test_net_changes_prunes_unchanged_partitions(tmp_path, monkeypatch):
    """A change-feed catch-up reads ONLY partitions whose watermark
    advanced past the consumer's version — unchanged partitions are
    pruned at the manifest, no file of theirs is even opened."""
    import ray.data as rd_

    import palimpzest_ray.cdc.engine as eng
    from palimpzest_ray.cdc import net_changes_since

    P = 8
    keys = [k for p in range(P) for k in _bucket_keys(P, p, 2)]
    lake = str(tmp_path / "lake")
    apply_changes(
        _log(tmp_path, "boot", keys, list(range(len(keys)))), lake,
        num_partitions=P,
    )
    v1 = load_latest_manifest(lake).version
    # touch exactly one partition
    one = _bucket_keys(P, 3, 1)
    apply_changes(_log(tmp_path, "one", one, [1000], ["late"]), lake)
    m = load_latest_manifest(lake)
    changed = {p for p, e in m.parts.items() if e.max_lsn > 15}
    assert len(changed) == 1

    opened: set[str] = set()
    orig = rd_.read_parquet

    def spy(paths, *a, **k):
        ps = [paths] if isinstance(paths, str) else list(paths)
        opened.update(os.path.basename(p) for p in ps)
        return orig(paths, *a, **k)

    monkeypatch.setattr(eng.rd, "read_parquet", spy)
    rows = net_changes_since(lake, v1).take_all()
    assert [r["doc_id"] for r in rows] == one
    assert opened == {os.path.basename(m.parts[p].file) for p in changed}
