"""Accumulating (delta-counter) apply semantics end-to-end
(cdc/patch.py apply_accumulate): UPDATE events carry DELTAS on the
declared sum columns, folded to absolute full-image rows against the
live lake, committed through the ordinary exactly-once apply.

Pinned against a naive per-event Python replay, through chunking,
merge-on-read delta mode, and the watermark consumption contract
(raw delta events are NOT idempotent — the tail path's ``since_lsn``
is what makes re-reads safe)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import (
    apply_accumulate,
    apply_changes,
    final_state_table,
)

USER_COLS = ["views", "score", "source"]
SUM_COLS = ("views", "score")
COUNTER_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("views", pa.int64()),
        pa.field("score", pa.float64()),
        pa.field("source", pa.string()),
    ]
)


def _counter_base(n: int) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([f"doc-{i:04d}" for i in range(n)]),
            "views": pa.array([10 * i for i in range(n)], pa.int64()),
            "score": pa.array([float(i) / 2 for i in range(n)], pa.float64()),
            "source": pa.array([f"s{i % 3}" for i in range(n)]),
        }
    )


def _bootstrap(tmp_path, lake: str, base: pa.Table) -> None:
    boot = pa.table(
        {
            "lsn": pa.array([0] * base.num_rows, pa.int64()),
            "op": pa.array(["INSERT"] * base.num_rows),
            **{c: base[c] for c in base.column_names},
        }
    )
    p = os.path.join(str(tmp_path), "boot_acc.parquet")
    pq.write_table(boot, p)
    apply_changes(p, lake, num_partitions=8)


def _rand_events(n: int, keys: list[str], seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    ops = rng.choice(["INSERT", "UPDATE", "UPDATE", "UPDATE", "DELETE"], n)
    rows = []
    for i in range(n):
        op = str(ops[i])
        row = {
            "lsn": 100 + i,
            "op": op,
            "doc_id": str(rng.choice(keys)),
            "views": None,
            "score": None,
            "source": None,
        }
        if op == "INSERT":
            row["views"] = int(rng.integers(0, 50))
            row["score"] = float(rng.integers(0, 8)) / 2
            row["source"] = f"s{i % 5}"
        elif op == "UPDATE":
            if rng.random() < 0.7:
                row["views"] = int(rng.integers(-5, 9))
            if rng.random() < 0.5:
                row["score"] = float(rng.integers(-4, 4)) / 2
            if rng.random() < 0.3:
                row["source"] = f"u{i % 4}"
        rows.append(row)
    return pa.Table.from_pylist(
        rows,
        pa.schema(
            [pa.field("lsn", pa.int64()), pa.field("op", pa.string())]
            + list(COUNTER_SCHEMA)
        ),
    )


def _naive(base: pa.Table, events: pa.Table) -> pa.Table:
    state = {r["doc_id"]: {c: r[c] for c in USER_COLS} for r in base.to_pylist()}
    for row in sorted(events.to_pylist(), key=lambda r: r["lsn"]):
        k, op = row["doc_id"], row["op"]
        if op == "DELETE":
            state.pop(k, None)
        elif op == "INSERT":
            state[k] = {c: row[c] for c in USER_COLS}
        else:
            cur = state.get(k, {c: None for c in USER_COLS})
            for c in USER_COLS:
                if row[c] is None:
                    continue
                if c in SUM_COLS:
                    cur[c] = row[c] if cur[c] is None else cur[c] + row[c]
                else:
                    cur[c] = row[c]
            state[k] = cur
    return pa.Table.from_pylist(
        [{"doc_id": k, **v} for k, v in sorted(state.items())],
        COUNTER_SCHEMA,
    )


@pytest.mark.parametrize("fold", ["local", "ray"])
def test_apply_accumulate_end_to_end(tmp_path, tmp_lake, fold):
    base = _counter_base(30)
    _bootstrap(tmp_path, tmp_lake, base)
    keys = base["doc_id"].to_pylist() + [f"new-{i}" for i in range(5)]
    events = _rand_events(300, keys, seed=7)
    apply_accumulate(
        events, tmp_lake, sum_cols=SUM_COLS, num_partitions=8, fold=fold
    )
    got = final_state_table(tmp_lake).sort_by("doc_id").select(
        [f.name for f in COUNTER_SCHEMA]
    )
    assert got.cast(COUNTER_SCHEMA).equals(_naive(base, events))


def test_accumulate_chunked_equals_oneshot(tmp_path, tmp_lake):
    base = _counter_base(20)
    _bootstrap(tmp_path, tmp_lake, base)
    keys = base["doc_id"].to_pylist() + ["n-0"]
    events = _rand_events(200, keys, seed=11)
    apply_accumulate(
        events, tmp_lake, sum_cols=SUM_COLS, num_partitions=8, chunk_events=48
    )
    lake2 = str(tmp_path / "lake2")
    _bootstrap(tmp_path, lake2, base)
    apply_accumulate(events, lake2, sum_cols=SUM_COLS, num_partitions=8)
    assert (
        final_state_table(tmp_lake)
        .sort_by("doc_id")
        .equals(final_state_table(lake2).sort_by("doc_id"))
    )


def test_accumulate_delta_mode_equals_rewrite(tmp_path, tmp_lake):
    base = _counter_base(20)
    _bootstrap(tmp_path, tmp_lake, base)
    events = _rand_events(150, base["doc_id"].to_pylist(), seed=13)
    apply_accumulate(
        events, tmp_lake, sum_cols=SUM_COLS, num_partitions=8, mode="delta"
    )
    lake2 = str(tmp_path / "lake2")
    _bootstrap(tmp_path, lake2, base)
    apply_accumulate(events, lake2, sum_cols=SUM_COLS, num_partitions=8)
    assert (
        final_state_table(tmp_lake)
        .sort_by("doc_id")
        .equals(final_state_table(lake2).sort_by("doc_id"))
    )


def test_accumulate_watermark_consumption_contract(tmp_path, tmp_lake):
    """The documented hazard, pinned: re-applying raw delta events
    double-adds; the tail path's since_lsn makes the re-read a no-op."""
    base = _counter_base(4)
    _bootstrap(tmp_path, tmp_lake, base)
    ev = pa.Table.from_pylist(
        [
            {"lsn": 100, "op": "UPDATE", "doc_id": "doc-0001",
             "views": 5, "score": None, "source": None},
        ],
        pa.schema(
            [pa.field("lsn", pa.int64()), pa.field("op", pa.string())]
            + list(COUNTER_SCHEMA)
        ),
    )
    apply_accumulate(ev, tmp_lake, sum_cols=SUM_COLS, num_partitions=8)

    def views() -> int:
        t = final_state_table(tmp_lake)
        return t.filter(
            pa.compute.equal(t["doc_id"], "doc-0001")
        )["views"][0].as_py()

    assert views() == 15
    # watermarked re-read: version no-op, value unchanged
    r = apply_accumulate(
        ev, tmp_lake, sum_cols=SUM_COLS, num_partitions=8, since_lsn=100
    )
    assert r.rows_upserted == 0 and views() == 15
    # blind raw re-apply: double-add (why the contract demands the
    # watermark for accumulate feeds)
    apply_accumulate(ev, tmp_lake, sum_cols=SUM_COLS, num_partitions=8)
    assert views() == 20


def test_accumulate_requires_sum_cols():
    with pytest.raises(ValueError, match="at least one sum/max/min"):
        apply_accumulate(pa.table({"lsn": [1]}), "/tmp/x", sum_cols=())


def test_producer_txn_idempotence(tmp_path, tmp_lake):
    """Delta txnAppId/txnVersion: a replayed (app, version) batch
    no-ops even for NON-idempotent accumulate feeds, where LWW alone
    cannot dedup a re-sent delta."""
    from palimpzest_ray.cdc.manifest import load_latest_manifest

    base = _counter_base(4)
    _bootstrap(tmp_path, tmp_lake, base)
    ev = pa.Table.from_pylist(
        [{"lsn": 100, "op": "UPDATE", "doc_id": "doc-0001",
          "views": 5, "score": None, "source": None}],
        pa.schema(
            [pa.field("lsn", pa.int64()), pa.field("op", pa.string())]
            + list(COUNTER_SCHEMA)
        ),
    )

    def views() -> int:
        t = final_state_table(tmp_lake)
        return t.filter(
            pa.compute.equal(t["doc_id"], "doc-0001")
        )["views"][0].as_py()

    r1 = apply_accumulate(
        ev, tmp_lake, sum_cols=SUM_COLS, num_partitions=8,
        txn=("ingestor", 7),
    )
    assert views() == 15
    m = load_latest_manifest(tmp_lake)
    assert m.app_versions == {"ingestor": 7}
    # blind producer retry of the SAME txn: no-op, no double-add
    r2 = apply_accumulate(
        ev, tmp_lake, sum_cols=SUM_COLS, num_partitions=8,
        txn=("ingestor", 7),
    )
    assert r2.manifest.version == r1.manifest.version and views() == 15
    # an OLDER txn version also no-ops; a NEWER one applies
    r3 = apply_accumulate(
        ev, tmp_lake, sum_cols=SUM_COLS, num_partitions=8,
        txn=("ingestor", 6),
    )
    assert r3.manifest.version == r1.manifest.version and views() == 15
    apply_accumulate(
        ev, tmp_lake, sum_cols=SUM_COLS, num_partitions=8,
        txn=("ingestor", 8),
    )
    assert views() == 20
    # independent producers keep independent watermarks
    apply_accumulate(
        ev, tmp_lake, sum_cols=SUM_COLS, num_partitions=8,
        txn=("other-app", 1),
    )
    assert views() == 25
    m = load_latest_manifest(tmp_lake)
    assert m.app_versions == {"ingestor": 8, "other-app": 1}
    import pytest

    with pytest.raises(ValueError, match="app_id: str"):
        apply_changes(ev, tmp_lake, num_partitions=8, txn=(1, "x"))


def test_txn_on_chunked_patch_stamps_final_chunk(tmp_path, tmp_lake):
    from palimpzest_ray.cdc.manifest import load_latest_manifest

    base = _counter_base(10)
    _bootstrap(tmp_path, tmp_lake, base)
    events = _rand_events(120, base["doc_id"].to_pylist(), seed=3)
    from palimpzest_ray.cdc import apply_patches

    apply_patches(
        events, tmp_lake, chunk_events=40, txn=("loader", 1)
    )
    after = final_state_table(tmp_lake)
    assert load_latest_manifest(tmp_lake).app_versions == {"loader": 1}
    # full-batch replay with the same txn: no-op, state unchanged
    apply_patches(events, tmp_lake, chunk_events=40, txn=("loader", 1))
    assert final_state_table(tmp_lake).equals(after)
