"""CDC engine correctness vs the sequential-replay oracle.

The gate from BASELINE.json: per-row token-array equality of the final
lake state against a single-process sequential replay (FIXTURES.md §4).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import (
    apply_changes,
    final_state_table,
    make_base_table,
    make_change_table,
    sequential_replay,
)

N_BASE = 1_000
N_EVENTS = 5_000


def _write(tmp_path, name: str, table: pa.Table) -> str:
    p = os.path.join(str(tmp_path), name)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    pq.write_table(table, p)
    return p


def _assert_tables_equal(got: pa.Table, want: pa.Table):
    got = got.sort_by("doc_id")
    want = want.select(got.column_names).sort_by("doc_id")
    assert got.num_rows == want.num_rows, (got.num_rows, want.num_rows)
    for col in got.column_names:
        g, w = got[col].combine_chunks(), want[col].cast(got[col].type).combine_chunks()
        assert g.equals(w), f"column {col} differs"


@pytest.fixture(scope="module")
def base_and_changes():
    base = make_base_table(N_BASE, seed=42)
    changes = make_change_table(N_EVENTS, N_BASE, seed=43)
    return base, changes


def _seed_lake(tmp_path, tmp_lake, base):
    """Bootstrap the lake with the base table (an INSERT-only change log)."""
    bootstrap = pa.table(
        {
            "lsn": pa.array([0] * base.num_rows, pa.int64()),
            "op": pa.array(["INSERT"] * base.num_rows),
            **{c: base[c] for c in base.column_names},
        }
    )
    p = _write(tmp_path, "bootstrap/log.parquet", bootstrap)
    apply_changes(p, tmp_lake, num_partitions=8)


def test_final_state_matches_sequential_replay(tmp_path, tmp_lake, base_and_changes):
    base, changes = base_and_changes
    _seed_lake(tmp_path, tmp_lake, base)
    log = _write(tmp_path, "log/changes.parquet", changes)

    res = apply_changes(log, tmp_lake, num_partitions=8)
    got = final_state_table(tmp_lake)
    want = sequential_replay(base, changes)

    _assert_tables_equal(got, want)
    assert res.events_seen == N_EVENTS
    assert res.rows_upserted > 0 and res.rows_deleted > 0


def test_replay_is_idempotent(tmp_path, tmp_lake, base_and_changes):
    """Applying the identical log twice converges to identical state
    (duplicate-LSN replay, FIXTURES.md §2)."""
    base, changes = base_and_changes
    _seed_lake(tmp_path, tmp_lake, base)
    log = _write(tmp_path, "log/changes.parquet", changes)

    apply_changes(log, tmp_lake, num_partitions=8)
    first = final_state_table(tmp_lake, user_columns_only=False)
    apply_changes(log, tmp_lake, num_partitions=8)
    second = final_state_table(tmp_lake, user_columns_only=False)
    assert first.equals(second)


def test_split_log_equals_single_log(tmp_path, tmp_lake, base_and_changes):
    """Applying the log in two sequential segments == applying it whole."""
    base, changes = base_and_changes
    _seed_lake(tmp_path, tmp_lake, base)
    half = changes.num_rows // 2
    p1 = _write(tmp_path, "log/a.parquet", changes.slice(0, half))
    p2 = _write(tmp_path, "log/b.parquet", changes.slice(half))
    apply_changes(p1, tmp_lake, num_partitions=8)
    apply_changes(p2, tmp_lake, num_partitions=8)
    got = final_state_table(tmp_lake)
    want = sequential_replay(base, changes)
    _assert_tables_equal(got, want)


def test_empty_lake_bootstrap(tmp_path, tmp_lake, base_and_changes):
    """Applying changes to an empty lake == replay over empty base
    (UPDATE/DELETE of missing keys are upsert/no-op)."""
    _, changes = base_and_changes
    log = _write(tmp_path, "log/changes.parquet", changes)
    apply_changes(log, tmp_lake, num_partitions=8)
    got = final_state_table(tmp_lake)
    want = sequential_replay(None, changes)
    _assert_tables_equal(got, want)


def test_missing_lsn_op_columns_rejected_on_driver(tmp_path, tmp_lake):
    """A plain table (no lsn/op) is rejected with a clear driver-side
    error, not a worker-side KeyError mid-pipeline."""
    t = pa.table({"doc_id": ["a", "b"], "n_tok": [1, 2]})
    log = _write(tmp_path, "log/plain.parquet", t)
    with pytest.raises(ValueError, match="lsn.*op|missing required column"):
        apply_changes(log, tmp_lake, num_partitions=4)


def test_schema_evolution_backfill(tmp_path, tmp_lake, base_and_changes):
    """Post-cutover events carry token_meta/shard; pre-cutover rows and
    never-updated base rows read back with nulls (FIXTURES.md §3)."""
    base, changes = base_and_changes
    _seed_lake(tmp_path, tmp_lake, base)
    evolved = make_change_table(
        1_000, N_BASE, seed=77, start_lsn=N_EVENTS + 1, evolved=True
    )
    p1 = _write(tmp_path, "log/a.parquet", changes)
    p2 = _write(tmp_path, "log/b.parquet", evolved)

    apply_changes([p1, p2], tmp_lake, num_partitions=8)
    got = final_state_table(tmp_lake)
    assert "token_meta" in got.column_names and "shard" in got.column_names

    combined = pa.concat_tables([changes, evolved], promote_options="permissive")
    want = sequential_replay(base, combined)
    _assert_tables_equal(got, want)
    # rows never touched post-cutover have null evolved columns
    assert got["shard"].null_count > 0


def test_tombstone_then_reinsert(tmp_path, tmp_lake):
    """DELETE then higher-LSN INSERT in one log -> row present; the
    reverse -> absent."""
    rows = [
        {"lsn": 1, "op": "INSERT", "doc_id": "a", "tokens": [1, 2], "n_tok": 2, "source": "web"},
        {"lsn": 2, "op": "DELETE", "doc_id": "a", "tokens": None, "n_tok": None, "source": None},
        {"lsn": 3, "op": "INSERT", "doc_id": "a", "tokens": [3], "n_tok": 1, "source": "web"},
        {"lsn": 4, "op": "INSERT", "doc_id": "b", "tokens": [9], "n_tok": 1, "source": "web"},
        {"lsn": 5, "op": "DELETE", "doc_id": "b", "tokens": None, "n_tok": None, "source": None},
        {"lsn": 6, "op": "DELETE", "doc_id": "zzz-missing", "tokens": None, "n_tok": None, "source": None},
    ]
    from palimpzest_ray.schemas import CHANGELOG_SCHEMA

    log = _write(tmp_path := tmp_path, "log/t.parquet", pa.Table.from_pylist(rows, CHANGELOG_SCHEMA))
    apply_changes(log, tmp_lake, num_partitions=4)
    got = final_state_table(tmp_lake)
    assert got["doc_id"].to_pylist() == ["a"]
    assert got["tokens"].to_pylist() == [[3]]


def test_apply_changes_accepts_ray_dataset(tmp_lake):
    """The change source can be a prepared ``ray.data.Dataset`` (e.g. a
    Kafka-fed or transformed stream), not just parquet paths."""
    import ray.data as rd

    from palimpzest_ray.schemas import CHANGELOG_SCHEMA

    rows = [
        {"lsn": 1, "op": "INSERT", "doc_id": "x", "tokens": [1], "n_tok": 1, "source": "web"},
        {"lsn": 2, "op": "UPDATE", "doc_id": "x", "tokens": [2, 3], "n_tok": 2, "source": "web"},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows, CHANGELOG_SCHEMA))
    res = apply_changes(ds, tmp_lake, num_partitions=2)
    got = final_state_table(tmp_lake)
    assert got["tokens"].to_pylist() == [[2, 3]]
    assert res.partitions_rewritten >= 1
    # lineage rows carry per-partition watermarks + merge timing
    assert all("max_lsn" in d and "merge_ms" in d for d in res.lineage)


def test_dataset_input_mixed_schema_epochs(tmp_path, tmp_lake):
    """A prepared Dataset whose blocks span a schema-evolution cutover:
    ``ds.schema()`` under-reports (first block only), so the caller must
    pass the unified ``change_schema`` — and forgetting it fails loudly
    instead of silently dropping the evolved columns."""
    import glob

    import ray.data as rd

    from palimpzest_ray.cdc.synth import write_change_log

    log = os.path.join(str(tmp_path), "log")
    write_change_log(log, 4_000, 600, seed=7, evolve_after=0.5, chunk_rows=1_000)
    files = sorted(glob.glob(os.path.join(log, "*.parquet")))
    unified = pa.unify_schemas(
        [pq.read_schema(f) for f in files], promote_options="permissive"
    )
    ds = rd.read_parquet(files)
    res = apply_changes(ds, tmp_lake, num_partitions=4, change_schema=unified)
    assert res.events_seen == 0  # streaming input: count unknown up front
    changes = pa.concat_tables(
        [pq.read_table(f) for f in files], promote_options="default"
    )
    _assert_tables_equal(final_state_table(tmp_lake), sequential_replay(None, changes))

    # without change_schema the undeclared evolved columns are an error
    with pytest.raises(Exception, match="change_schema"):
        apply_changes(
            rd.read_parquet(files),
            os.path.join(str(tmp_path), "lake2"),
            num_partitions=4,
        )


def test_num_partitions_is_a_lake_property(tmp_path, tmp_lake):
    """A later apply passing a different num_partitions must not
    re-bucket against the old layout (it would duplicate every updated
    key that moved buckets) — the manifest's P wins."""
    rows1 = [
        {"lsn": i + 1, "op": "INSERT", "doc_id": f"d{i}", "tokens": [i], "n_tok": 1, "source": "w"}
        for i in range(50)
    ]
    p1 = _write(tmp_path, "l1.parquet", pa.Table.from_pylist(rows1))
    apply_changes(p1, tmp_lake, num_partitions=8)
    rows2 = [
        {"lsn": 100 + i, "op": "UPDATE", "doc_id": f"d{i}", "tokens": [99], "n_tok": 1, "source": "w"}
        for i in range(50)
    ]
    p2 = _write(tmp_path, "l2.parquet", pa.Table.from_pylist(rows2))
    res = apply_changes(p2, tmp_lake, num_partitions=4)  # conflicting P
    assert res.manifest.num_partitions == 8
    t = final_state_table(tmp_lake)
    assert t.num_rows == 50
    assert all(v == [99] for v in t["tokens"].to_pylist())


def test_repartition_lake_preserves_state_and_layout(tmp_path, tmp_lake):
    """Re-bucketing to a new P preserves the exact state (incl. evolved
    columns and per-row _lsn watermarks), updates the manifest layout,
    and later applies adopt it."""
    from palimpzest_ray.cdc import repartition_lake
    from palimpzest_ray.cdc.synth import write_change_log

    log = os.path.join(str(tmp_path), "log")
    write_change_log(log, 4_000, 600, seed=11, evolve_after=0.5, chunk_rows=1_000)
    apply_changes(log, tmp_lake, num_partitions=8)
    before = final_state_table(tmp_lake, user_columns_only=False).sort_by("doc_id")

    res = repartition_lake(tmp_lake, 3)
    assert res.manifest.num_partitions == 3
    assert len(res.manifest.parts) <= 3
    after = final_state_table(tmp_lake, user_columns_only=False).sort_by("doc_id")
    assert after.equals(before)

    # a later apply adopts the new layout and stays correct
    log2 = os.path.join(str(tmp_path), "log2")
    write_change_log(log2, 2_000, 600, seed=12, start_lsn=4_001, chunk_rows=1_000)
    res2 = apply_changes(log2, tmp_lake, num_partitions=99)
    assert res2.manifest.num_partitions == 3

    import glob

    import pyarrow.parquet as _pq

    changes = pa.concat_tables(
        [_pq.read_table(f) for f in sorted(glob.glob(log + "/*.parquet")) + sorted(glob.glob(log2 + "/*.parquet"))],
        promote_options="permissive",
    )
    _assert_tables_equal(final_state_table(tmp_lake), sequential_replay(None, changes))


def test_tail_once_incremental_ingest(tmp_path, tmp_lake):
    """Binlog-tail loop: a growing log dir re-scanned with tail_once
    applies only events past the watermark; already-applied files are
    footer-pruned; an iteration with nothing new is a version no-op."""
    from palimpzest_ray.cdc import load_latest_manifest, tail_once
    from palimpzest_ray.cdc.synth import write_change_log

    log = os.path.join(str(tmp_path), "log")
    write_change_log(log, 3_000, 500, seed=31, chunk_rows=1_500)
    r1 = tail_once(log, tmp_lake, num_partitions=4)
    assert r1.events_seen == 3_000
    v1 = load_latest_manifest(tmp_lake).version

    # log grows: two more chunks past the watermark (write_change_log
    # names chunks from 0, so stage them aside and move in under new names)
    side = os.path.join(str(tmp_path), "side")
    write_change_log(side, 2_000, 500, seed=32, start_lsn=3_001, chunk_rows=1_000)
    import glob as _g
    import shutil as _sh

    for f in sorted(_g.glob(os.path.join(side, "*.parquet"))):
        _sh.move(f, os.path.join(log, "tail-" + os.path.basename(f)))
    r2 = tail_once(log, tmp_lake, num_partitions=4)
    assert 0 < r2.events_seen <= 2_000 + 3_000
    v2 = load_latest_manifest(tmp_lake).version
    assert v2 == v1 + 1

    # nothing new: no-op, version unchanged
    r3 = tail_once(log, tmp_lake, num_partitions=4)
    assert r3.events_seen == 0 and r3.partitions_rewritten == 0
    assert load_latest_manifest(tmp_lake).version == v2

    # final state equals full sequential replay of the whole dir
    import glob

    files = sorted(glob.glob(os.path.join(log, "*.parquet")))
    changes = pa.concat_tables(
        [pq.read_table(f) for f in files], promote_options="permissive"
    )
    _assert_tables_equal(final_state_table(tmp_lake), sequential_replay(None, changes))


def test_local_apply_equals_distributed(tmp_path, tmp_lake, base_and_changes, monkeypatch):
    """exchange='auto' routes small logs driver-locally (zero Ray
    executions); the committed state must be EXACTLY what every
    distributed exchange produces, in both modes, and the threshold
    must route big logs back to Ray."""
    from palimpzest_ray.cdc import engine as eng

    base, changes = base_and_changes
    boot = pa.table(
        {
            "lsn": pa.array([0] * base.num_rows, pa.int64()),
            "op": pa.array(["INSERT"] * base.num_rows),
            **{c: base[c] for c in base.column_names},
        }
    )
    bp = _write(tmp_path, "boot/log.parquet", boot)
    cp = _write(tmp_path, "log/changes.parquet", changes)

    states = {}
    for ex in ("local", "ray", "fs"):
        lake = os.path.join(str(tmp_path), f"lake-{ex}")
        for mode, log in (("rewrite", bp), ("delta", cp)):
            r = apply_changes(log, lake, num_partitions=8, exchange=ex, mode=mode)
        states[ex] = final_state_table(lake, user_columns_only=False)
        if ex == "local":
            assert r.stats.startswith("local")
    assert states["local"].equals(states["ray"])
    assert states["local"].equals(states["fs"])
    _assert_tables_equal(
        final_state_table(os.path.join(str(tmp_path), "lake-local")),
        sequential_replay(base, changes),
    )

    # a driver-side pa.Table input applies locally and lands the same
    # state (the refresh-commit idiom)
    lake_t = os.path.join(str(tmp_path), "lake-table")
    apply_changes(boot, lake_t, num_partitions=8)
    r_t = apply_changes(changes, lake_t, num_partitions=8, mode="delta")
    assert r_t.stats.startswith("local")
    assert final_state_table(lake_t, user_columns_only=False).equals(
        states["local"]
    )

    # auto respects the byte threshold: tiny threshold -> distributed
    monkeypatch.setattr(eng, "LOCAL_APPLY_MAX_BYTES", 1)
    r2 = apply_changes(cp, os.path.join(str(tmp_path), "lake-local"),
                       num_partitions=8)
    assert not r2.stats.startswith("local")
    # explicit local with a Dataset input refuses
    import pytest as _pytest
    import ray.data as rd

    with _pytest.raises(ValueError, match="parquet path"):
        apply_changes(rd.from_arrow(changes),
                      os.path.join(str(tmp_path), "lake-local"),
                      num_partitions=8, exchange="local")


def test_run_report_retention(tmp_path, tmp_lake, monkeypatch):
    """.runs keeps only the newest RUN_REPORTS_KEEP reports — a
    forever-tailing lake must not accumulate one file per commit."""
    from palimpzest_ray.cdc import engine as eng

    monkeypatch.setattr(eng, "RUN_REPORTS_KEEP", 3)
    seg = pa.table(
        {
            "lsn": pa.array([1], pa.int64()),
            "op": ["INSERT"],
            "doc_id": ["a"],
            "tokens": pa.array([[1]], pa.list_(pa.int32())),
            "n_tok": pa.array([1], pa.int32()),
            "source": ["s"],
        }
    )
    for i in range(6):
        log = seg.set_column(0, "lsn", pa.array([i + 1], pa.int64()))
        apply_changes(_write(tmp_path, f"l{i}/log.parquet", log),
                      tmp_lake, num_partitions=2)
    runs = [f for f in os.listdir(os.path.join(tmp_lake, ".runs"))
            if f.endswith(".json")]
    assert len(runs) == 3


def test_tail_follow_drains_then_stops(tmp_path, tmp_lake):
    """Daemon mode: tail_follow commits per poll that finds events, a
    producer feeding the log between commits is drained, and the loop
    exits on idle_stop once the producer is done. Final state == full
    sequential replay; the hook fires once per committed version."""
    import glob as _g
    import shutil as _sh

    from palimpzest_ray.cdc import load_latest_manifest, tail_follow
    from palimpzest_ray.cdc.synth import write_change_log

    log = os.path.join(str(tmp_path), "log")
    write_change_log(log, 2_000, 400, seed=41, chunk_rows=1_000)
    side = os.path.join(str(tmp_path), "side")
    write_change_log(side, 1_000, 400, seed=42, start_lsn=2_001, chunk_rows=500)
    pending = sorted(_g.glob(os.path.join(side, "*.parquet")))

    seen_versions = []

    def produce_more(res):
        seen_versions.append(load_latest_manifest(tmp_lake).version)
        if pending:  # the "producer": one more segment arrives post-commit
            f = pending.pop(0)
            _sh.move(f, os.path.join(log, "tail-" + os.path.basename(f)))

    results = tail_follow(
        log, tmp_lake, poll_interval=0.05, idle_stop=2,
        on_commit=produce_more, num_partitions=4,
    )
    # initial batch + 2 produced segments = 3 committing iterations
    assert len(results) == 3 and len(seen_versions) == 3
    assert seen_versions == sorted(set(seen_versions))
    files = sorted(_g.glob(os.path.join(log, "*.parquet")))
    changes = pa.concat_tables(
        [pq.read_table(f) for f in files], promote_options="permissive"
    )
    _assert_tables_equal(final_state_table(tmp_lake), sequential_replay(None, changes))

    # stop_file requested before any poll: no-op, and the guard refuses
    # an unbounded loop
    stop = os.path.join(str(tmp_path), "STOP")
    open(stop, "w").close()
    assert tail_follow(log, tmp_lake, stop_file=stop, num_partitions=4) == []
    import pytest as _pytest

    with _pytest.raises(ValueError, match="stop condition"):
        tail_follow(log, tmp_lake, idle_stop=None)


def test_persisted_tombstones_make_segments_commutative(tmp_path, tmp_lake):
    """A deleted key cannot be resurrected by a late-arriving OLDER
    segment (tombstones persist in lake files); retention compaction
    via repartition_lake(drop_tombstones_below=...) removes them once
    out-of-order arrivals below the watermark are impossible."""
    from palimpzest_ray.cdc import load_latest_manifest, repartition_lake
    from palimpzest_ray.cdc.engine import final_state
    from palimpzest_ray.schemas import CHANGELOG_SCHEMA

    new = [
        {"lsn": 10, "op": "INSERT", "doc_id": "a", "tokens": [1], "n_tok": 1, "source": "w"},
        {"lsn": 20, "op": "DELETE", "doc_id": "b", "tokens": None, "n_tok": None, "source": None},
    ]
    old = [  # lower LSNs, applied AFTER
        {"lsn": 5, "op": "INSERT", "doc_id": "b", "tokens": [7], "n_tok": 1, "source": "w"},
        {"lsn": 6, "op": "UPDATE", "doc_id": "a", "tokens": [8], "n_tok": 1, "source": "w"},
    ]
    p_new = _write(tmp_path, "new.parquet", pa.Table.from_pylist(new, CHANGELOG_SCHEMA))
    p_old = _write(tmp_path, "old.parquet", pa.Table.from_pylist(old, CHANGELOG_SCHEMA))
    apply_changes(p_new, tmp_lake, num_partitions=4)
    apply_changes(p_old, tmp_lake, num_partitions=4)

    got = final_state_table(tmp_lake)
    assert got["doc_id"].to_pylist() == ["a"]  # b stays dead, a keeps lsn-10 row
    assert got["tokens"].to_pylist() == [[1]]
    m = load_latest_manifest(tmp_lake)
    assert sum(e.tombstones for e in m.parts.values()) == 1

    # raw read shows the tombstone; compaction below watermark drops it
    import ray.data as rd  # noqa: F401

    raw = final_state(tmp_lake, user_columns_only=False, include_tombstones=True)
    assert raw.count() == 2
    res = repartition_lake(tmp_lake, 4, drop_tombstones_below=21)
    assert sum(e.tombstones for e in res.manifest.parts.values()) == 0
    assert final_state_table(tmp_lake)["doc_id"].to_pylist() == ["a"]


@pytest.mark.parametrize("exchange", ["ray", "fs"])
def test_streaming_merge_equals_in_memory(tmp_path, exchange):
    """Forcing the bounded-memory streaming merge-join (threshold=1 row)
    yields the same final state as the in-memory merge, including
    tombstones, schema evolution, and a follow-up apply."""
    from palimpzest_ray.cdc.synth import write_change_log

    log1 = os.path.join(str(tmp_path), "l1")
    log2 = os.path.join(str(tmp_path), "l2")
    write_change_log(log1, 4_000, 700, seed=81, evolve_after=0.5, chunk_rows=1_000)
    write_change_log(log2, 2_000, 700, seed=82, start_lsn=4_001, chunk_rows=1_000)

    lakes = {}
    for mode, thresh in (("mem", 4_000_000), ("stream", 1)):
        lake = os.path.join(str(tmp_path), f"lake_{mode}_{exchange}")
        for log in (log1, log2):
            apply_changes(
                log, lake, num_partitions=4,
                exchange=exchange, streaming_threshold_rows=thresh,
            )
        lakes[mode] = final_state_table(lake, user_columns_only=False).sort_by("doc_id")
    assert lakes["stream"].equals(lakes["mem"])

    import glob

    changes = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(log1 + "/*.parquet")) + sorted(glob.glob(log2 + "/*.parquet"))],
        promote_options="permissive",
    )
    lake = os.path.join(str(tmp_path), f"lake_stream_{exchange}")
    _assert_tables_equal(final_state_table(lake), sequential_replay(None, changes))


def test_extreme_hot_key_skew(tmp_path, tmp_lake):
    """80% of events hitting ONE doc_id (beyond any Zipf draw): the
    per-block combiner collapses the hot key before the shuffle and the
    final state still matches the oracle."""
    import numpy as np

    from palimpzest_ray.schemas import CHANGELOG_SCHEMA

    rng = np.random.default_rng(5)
    n = 20_000
    keys = np.where(rng.random(n) < 0.8, "hot", None)
    keys = [k if k is not None else f"d{rng.integers(0, 500)}" for k in keys]
    rows = [
        {"lsn": i + 1, "op": "UPDATE", "doc_id": k,
         "tokens": [int(i % 97)], "n_tok": 1, "source": "w"}
        for i, k in enumerate(keys)
    ]
    t = pa.Table.from_pylist(rows, CHANGELOG_SCHEMA)
    log = _write(tmp_path, "hot.parquet", t)
    apply_changes(log, tmp_lake, num_partitions=8)
    _assert_tables_equal(final_state_table(tmp_lake), sequential_replay(None, t))


def test_jsonl_change_source(tmp_path, tmp_lake):
    """A JSONL binlog tail applies identically to the parquet path."""
    import json as _json

    from palimpzest_ray.schemas import CHANGELOG_SCHEMA
    from palimpzest_ray.sources.changelog import read_jsonl_changes

    rows = [
        {"lsn": 1, "op": "INSERT", "doc_id": "a", "tokens": [1, 2], "n_tok": 2, "source": "web"},
        {"lsn": 2, "op": "UPDATE", "doc_id": "a", "tokens": [3], "n_tok": 1, "source": "web"},
        {"lsn": 3, "op": "INSERT", "doc_id": "b", "tokens": [4], "n_tok": 1, "source": "code"},
        {"lsn": 4, "op": "DELETE", "doc_id": "b", "tokens": None, "n_tok": None, "source": None},
    ]
    p = os.path.join(str(tmp_path), "log.jsonl")
    with open(p, "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    ds = read_jsonl_changes(p)
    apply_changes(ds, tmp_lake, num_partitions=2, change_schema=CHANGELOG_SCHEMA)
    got = final_state_table(tmp_lake)
    assert got["doc_id"].to_pylist() == ["a"]
    assert got["tokens"].to_pylist() == [[3]]


def test_debezium_change_source(tmp_path, tmp_lake):
    """A Debezium JSONL topic dump round-trips (write → unwrap equals
    the normalized log) and applies identically to the parquet path —
    including a deletes-only file whose ``after`` infers as null."""
    from palimpzest_ray.schemas import CHANGELOG_SCHEMA
    from palimpzest_ray.sources.changelog import (
        read_debezium_changes,
        write_debezium_jsonl,
    )

    log = pa.Table.from_pylist(
        [
            {"lsn": 1, "op": "INSERT", "doc_id": "a", "tokens": [1, 2],
             "n_tok": 2, "source": "web"},
            {"lsn": 2, "op": "UPDATE", "doc_id": "a", "tokens": [3],
             "n_tok": 1, "source": "web"},
            {"lsn": 3, "op": "INSERT", "doc_id": "b", "tokens": [4],
             "n_tok": 1, "source": "code"},
        ],
        CHANGELOG_SCHEMA,
    )
    dels = pa.Table.from_pylist(
        [{"lsn": 4, "op": "DELETE", "doc_id": "b", "tokens": None,
          "n_tok": None, "source": None}],
        CHANGELOG_SCHEMA,
    )
    d1 = os.path.join(str(tmp_path), "topic-a")
    d2 = os.path.join(str(tmp_path), "topic-dels")  # after == all-null
    write_debezium_jsonl(log, d1)
    write_debezium_jsonl(dels, d2)

    ds = read_debezium_changes([d1, d2])
    got_log = pa.concat_tables(
        ds.iter_batches(batch_format="pyarrow", batch_size=1024)
    ).sort_by("lsn")
    assert got_log.equals(pa.concat_tables([log, dels]))

    apply_changes(ds, tmp_lake, num_partitions=2,
                  change_schema=CHANGELOG_SCHEMA)
    got = final_state_table(tmp_lake)
    assert got["doc_id"].to_pylist() == ["a"]
    assert got["tokens"].to_pylist() == [[3]]


def test_debezium_rejects_unknown_op():
    from palimpzest_ray.sources.changelog import unwrap_debezium

    batch = pa.Table.from_pylist(
        [{"op": "x", "after": {"doc_id": "a"}, "source": {"lsn": 1}}]
    )
    with pytest.raises(ValueError, match="unknown Debezium op"):
        unwrap_debezium(batch)


def test_time_travel_and_net_change_feed(tmp_path, tmp_lake):
    """Versioned reads (time travel) and the net change feed: applying
    net_changes_since(v1) to a replica of v1 converges it to latest."""
    import shutil

    import ray.data as rd  # noqa: F401

    from palimpzest_ray.cdc import apply_changes, net_changes_since
    from palimpzest_ray.cdc.engine import final_state
    from palimpzest_ray.cdc.synth import write_change_log

    l1 = os.path.join(str(tmp_path), "l1")
    l2 = os.path.join(str(tmp_path), "l2")
    write_change_log(l1, 3_000, 500, seed=41, chunk_rows=1_500)
    write_change_log(l2, 3_000, 500, seed=42, start_lsn=3_001, chunk_rows=1_500)
    apply_changes(l1, tmp_lake, num_partitions=4)
    v1_state = final_state_table(tmp_lake)
    apply_changes(l2, tmp_lake, num_partitions=4)

    # time travel: version=1 reproduces the state after the first apply
    tt = (
        final_state(tmp_lake, version=1)
        .take_all()
    )
    assert sorted(r["doc_id"] for r in tt) == v1_state["doc_id"].to_pylist()

    # change feed re-applied to a replica of v1 converges to latest
    replica = os.path.join(str(tmp_path), "replica")
    shutil.copytree(tmp_lake, replica)
    # rewind the replica to v1
    with open(os.path.join(replica, "LATEST"), "w") as f:
        f.write("1")
    feed = net_changes_since(tmp_lake, 1)
    assert feed.count() > 0
    apply_changes(feed.materialize(), replica, num_partitions=4)
    got = final_state_table(replica).sort_by("doc_id")
    want = final_state_table(tmp_lake).sort_by("doc_id")
    assert got.equals(want)


def test_fs_and_ray_exchange_equivalent(tmp_path):
    """The two merge-exchange transports (object-store hash repartition
    vs filesystem spill) produce identical lake contents, including
    internal columns."""
    from palimpzest_ray.cdc.synth import write_change_log

    log = os.path.join(str(tmp_path), "log")
    write_change_log(log, 6_000, 900, seed=17, evolve_after=0.5, chunk_rows=2_000)
    tables = {}
    for ex in ("ray", "fs"):
        lake = os.path.join(str(tmp_path), f"lake_{ex}")
        apply_changes(log, lake, num_partitions=4, exchange=ex)
        tables[ex] = final_state_table(lake, user_columns_only=False).sort_by("doc_id")
    assert tables["ray"].equals(tables["fs"])


def test_streaming_merge_insert_only_distinct_keys(tmp_path):
    """Regression: an insert-only change segment (every key touched once)
    takes first_per_key's all-distinct fast path, which returns ARRIVAL
    order — the streaming merge must sort explicitly before its
    searchsorted chunking or it silently corrupts the lake."""
    from palimpzest_ray.schemas import CHANGELOG_SCHEMA

    lake = str(tmp_path / "lake")
    base_rows = [
        {"lsn": i + 1, "op": "INSERT", "doc_id": f"base-{i:05d}", "tokens": [i],
         "n_tok": 1, "source": "w"}
        for i in range(1_000)
    ]
    p1 = _write(tmp_path, "l1.parquet", pa.Table.from_pylist(base_rows, CHANGELOG_SCHEMA))
    apply_changes(p1, lake, num_partitions=2)

    # new distinct keys, deliberately NOT in sorted order
    import random

    rng = random.Random(3)
    new_keys = [f"new-{i:05d}" for i in range(500)]
    rng.shuffle(new_keys)
    seg = [
        {"lsn": 10_000 + i, "op": "INSERT", "doc_id": k, "tokens": [i],
         "n_tok": 1, "source": "w"}
        for i, k in enumerate(new_keys)
    ]
    p2 = _write(tmp_path, "l2.parquet", pa.Table.from_pylist(seg, CHANGELOG_SCHEMA))
    apply_changes(p2, lake, num_partitions=2, streaming_threshold_rows=1)

    combined = pa.concat_tables(
        [pq.read_table(p1), pq.read_table(p2)], promote_options="permissive"
    )
    _assert_tables_equal(final_state_table(lake), sequential_replay(None, combined))
    # key-sorted invariant survives for the NEXT streaming merge
    from palimpzest_ray.cdc.manifest import load_latest_manifest

    m = load_latest_manifest(lake)
    for f in m.data_files(lake):
        keys = pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
        assert keys == sorted(keys), f


def test_mid_stream_dtype_widening_and_derived_n_tok(tmp_path, tmp_lake):
    """A later log segment may widen column dtypes (int32 -> int64
    values too large for the old type, list<int32> -> list<int64>
    tokens) and omit the precomputed ``n_tok``: the unified footer
    schema promotes permissively, normalize derives ``n_tok`` from
    ``tokens``, and LWW converges."""
    seg1 = pa.table(
        {
            "lsn": pa.array([1, 2, 3], pa.int64()),
            "op": ["INSERT"] * 3,
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "v": pa.array([10, 20, 30], pa.int32()),
            "tokens": pa.array([[1], [2], [3]], pa.list_(pa.int32())),
        }
    )
    seg2 = pa.table(
        {
            "lsn": pa.array([4, 5], pa.int64()),
            "op": ["UPDATE", "INSERT"],
            "doc_id": pa.array([2, 4], pa.int64()),
            "v": pa.array([2_000_000_000_000, 40], pa.int64()),
            "tokens": pa.array([[2, 2], [4]], pa.list_(pa.int64())),
        }
    )
    _write(tmp_path, "wlog/a.parquet", seg1)
    _write(tmp_path, "wlog/b.parquet", seg2)
    apply_changes(os.path.join(str(tmp_path), "wlog"), tmp_lake, num_partitions=2)
    got = final_state_table(tmp_lake).sort_by("doc_id")
    assert got.schema.field("v").type == pa.int64()
    assert got.num_rows == 4
    rows = {r["doc_id"]: r for r in got.to_pylist()}
    assert rows[2]["v"] == 2_000_000_000_000 and rows[2]["tokens"] == [2, 2]
    assert rows[2]["n_tok"] == 2 and rows[1]["n_tok"] == 1
    assert rows[4]["v"] == 40


def test_combined_list_apply_equals_sequential(tmp_path, tmp_lake, base_and_changes):
    """ONE apply over [bootstrap, log] (the bench cold-start path) ==
    seeding then applying — the initial load is just another LWW epoch."""
    base, changes = base_and_changes
    bootstrap = pa.table(
        {
            "lsn": pa.array(range(-base.num_rows, 0), pa.int64()),
            "op": pa.array(["INSERT"] * base.num_rows),
            **{c: base[c] for c in base.column_names},
        }
    )
    p_boot = _write(tmp_path, "log/boot.parquet", bootstrap)
    p_log = _write(tmp_path, "log/tail.parquet", changes)
    apply_changes([p_boot, p_log], tmp_lake, num_partitions=8)
    got = final_state_table(tmp_lake)
    want = sequential_replay(base, changes)
    _assert_tables_equal(got, want)


def test_lookup_reads_only_needed_partitions(tmp_path, base_and_changes, monkeypatch):
    """Point reads: exact rows for live keys, nothing for deleted or
    unknown keys, evolved columns backfilled — touching at most one
    partition file per key, never the whole lake."""
    import pyarrow.parquet as real_pq

    from palimpzest_ray.cdc import lookup
    from palimpzest_ray.cdc.engine import final_state_table

    base, changes = base_and_changes
    lake = str(tmp_path / "lake")
    _seed_lake(tmp_path, lake, base)
    p = _write(tmp_path, "log/changes.parquet", changes)
    apply_changes(p, lake, num_partitions=16)

    state = final_state_table(lake)
    live = {r["doc_id"]: r for r in state.to_pylist()}
    live_keys = sorted(live)[:3]
    all_ids = set(base["doc_id"].to_pylist())
    deleted = sorted(all_ids - set(live))[:1]
    ask = live_keys + deleted + ["doc-does-not-exist"]

    calls = {"n": 0}
    orig = real_pq.read_table

    def counting(path, *a, **k):
        calls["n"] += 1
        return orig(path, *a, **k)

    monkeypatch.setattr(real_pq, "read_table", counting)
    got = lookup(lake, ask)
    assert calls["n"] <= len(ask)  # partition pruning, not a scan
    assert got["doc_id"].to_pylist() == sorted(live_keys)
    for r in got.to_pylist():
        assert r["tokens"] == live[r["doc_id"]]["tokens"]

    # pruned columns + evolved backfill + missing keys -> empty table
    cols = [c for c in state.column_names if c not in ("doc_id", "tokens")]
    pruned = lookup(lake, live_keys, columns=cols[:2])
    assert set(pruned.column_names) == {"doc_id"} | set(cols[:2])
    empty = lookup(lake, ["nope-1", "nope-2"])
    assert empty.num_rows == 0 and "doc_id" in empty.column_names


def test_key_history_scd2(tmp_path, tmp_lake):
    """Temporal reads: per-version rows via partition-pruned lookups,
    carried-forward versions collapsed by writer-LSN equality, deleted
    keys stop appearing, vacuumed versions are skipped gracefully."""
    import ray.data as rd

    from palimpzest_ray.cdc import apply_changes, key_history, vacuum
    from palimpzest_ray.schemas import CHANGELOG_SCHEMA

    def ev(lsn, op, d, tok=None):
        return {"lsn": lsn, "op": op, "doc_id": d, "tokens": tok,
                "n_tok": len(tok) if tok else None,
                "source": "w" if op != "DELETE" else None}

    def _apply(rows, **kw):
        apply_changes(
            rd.from_arrow(pa.Table.from_pylist(rows, CHANGELOG_SCHEMA)),
            tmp_lake, change_schema=CHANGELOG_SCHEMA, **kw)

    _apply([ev(1, "INSERT", "a", [1]), ev(2, "INSERT", "b", [2])],
           num_partitions=2)
    _apply([ev(3, "UPDATE", "a", [1, 1])])
    _apply([ev(4, "DELETE", "b"), ev(5, "INSERT", "c", [3])], mode="delta")

    h = key_history(tmp_lake, ["a", "b", "c"], columns=["n_tok"])
    rows = [(r["doc_id"], r["_version"], r["n_tok"]) for r in h.to_pylist()]
    assert rows == [("a", 1, 1), ("a", 2, 2), ("b", 1, 1), ("c", 3, 1)]

    # without collapsing, 'a' also appears carried forward at v3
    h_all = key_history(tmp_lake, ["a"], columns=["n_tok"],
                        changes_only=False)
    assert [r["_version"] for r in h_all.to_pylist()] == [1, 2, 3]
    assert len({r["_lsn"] for r in h_all.to_pylist()}) == 2

    # vacuum drops v1: history silently starts at the oldest retained
    vacuum(tmp_lake, keep_versions=2)
    h2 = key_history(tmp_lake, ["a", "b", "c"], columns=["n_tok"])
    vs = sorted({r["_version"] for r in h2.to_pylist()})
    assert vs == [2, 3]
    assert ("b", 2) in {(r["doc_id"], r["_version"]) for r in h2.to_pylist()}


def test_export_changes_debezium_roundtrip(tmp_path, tmp_lake):
    """Change-feed export symmetry: export the net feed as Debezium
    JSONL, re-ingest it through read_debezium_changes onto a replica
    pinned at the base version — the replica converges to the latest
    state (the wire format carries the full catch-up)."""
    import json as _json

    import ray.data as rd

    from palimpzest_ray.cdc import apply_changes
    from palimpzest_ray.cdc.snapshot import clone_lake
    from palimpzest_ray.schemas import CHANGELOG_SCHEMA
    from palimpzest_ray.sources.changelog import (
        export_changes,
        read_exported_changes,
    )

    def ev(lsn, op, d, tok=None):
        return {"lsn": lsn, "op": op, "doc_id": d, "tokens": tok,
                "n_tok": len(tok) if tok else None,
                "source": "w" if op != "DELETE" else None}

    apply_changes(
        rd.from_arrow(pa.Table.from_pylist(
            [ev(1, "INSERT", "a", [1]), ev(2, "INSERT", "b", [2])],
            CHANGELOG_SCHEMA)),
        tmp_lake, num_partitions=2, change_schema=CHANGELOG_SCHEMA)
    replica = os.path.join(str(tmp_path), "replica")
    clone_lake(tmp_lake, replica)

    apply_changes(
        rd.from_arrow(pa.Table.from_pylist(
            [ev(3, "UPDATE", "a", [9, 9]), ev(4, "DELETE", "b"),
             ev(5, "INSERT", "c", [3])],
            CHANGELOG_SCHEMA)),
        tmp_lake, change_schema=CHANGELOG_SCHEMA, mode="delta")

    out = os.path.join(str(tmp_path), "topic_out")
    meta = export_changes(tmp_lake, 1, out, format="debezium")
    assert meta["events"] == 3 and meta["to_version"] == 2
    prov = _json.load(open(os.path.join(out, "_CHANGES.json")))
    assert prov["files"] == meta["files"] and len(prov["files"]) >= 1

    apply_changes(
        read_exported_changes(out), replica,
        change_schema=CHANGELOG_SCHEMA)
    got = final_state_table(replica).sort_by("doc_id")
    want = final_state_table(tmp_lake).sort_by("doc_id")
    assert got.equals(want)
