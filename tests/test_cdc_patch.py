"""Partial-image (patch) update semantics (cdc/patch.py).

The fold's contract: per key, per column, the latest set (non-null)
value after the last full-image barrier wins; barriers (INSERT/DELETE)
reset; the lake base is the implicit earliest barrier. Pinned here
against a deliberately naive per-event Python replay.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import (
    apply_changes,
    apply_patches,
    final_state_table,
    fold_patch_events,
    make_base_table,
)

USER_COLS = ["tokens", "n_tok", "source"]


def _naive_patch_replay(base: pa.Table | None, events: pa.Table) -> dict:
    """Per-event reference: dict state, patch = set non-null columns."""
    state: dict = {}
    if base is not None:
        for row in base.to_pylist():
            state[row["doc_id"]] = {c: row.get(c) for c in USER_COLS}
    order = np.lexsort(
        (np.arange(events.num_rows), events["lsn"].to_numpy())
    )
    for i in order:
        row = events.slice(int(i), 1).to_pylist()[0]
        k, op = row["doc_id"], row["op"]
        if op == "DELETE":
            state.pop(k, None)
        elif op == "INSERT":
            state[k] = {c: row.get(c) for c in USER_COLS}
        else:  # UPDATE patch
            cur = state.get(k, {c: None for c in USER_COLS})
            for c in USER_COLS:
                if row.get(c) is not None:
                    cur[c] = row[c]
            state[k] = cur
    return state


def _rand_events(n: int, keys: list[str], seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    ops = rng.choice(["INSERT", "UPDATE", "UPDATE", "DELETE"], size=n)
    key_arr = rng.choice(keys, size=n)
    tok_set = rng.random(n) < 0.5
    ntk_set = rng.random(n) < 0.5
    src_set = rng.random(n) < 0.5
    tokens = pa.array(
        [
            [int(x) for x in rng.integers(0, 99, rng.integers(1, 4))]
            if (tok_set[i] or ops[i] == "INSERT")
            else None
            for i in range(n)
        ],
        pa.list_(pa.int32()),
    )
    # INSERTs are full images: every column explicitly present-or-null;
    # for UPDATEs a null column means absent
    n_tok = pa.array(
        [int(rng.integers(0, 999)) if ntk_set[i] else None for i in range(n)],
        pa.int32(),
    )
    source = pa.array(
        [f"s{int(rng.integers(0, 5))}" if src_set[i] else None for i in range(n)]
    )
    is_del = ops == "DELETE"
    mask = pa.array(is_del)
    return pa.table(
        {
            "lsn": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            "op": pa.array(ops),
            "doc_id": pa.array(key_arr),
            "tokens": tokens.take(
                pa.array(np.arange(n, dtype=np.int64), mask=is_del)
            ),
            "n_tok": pc.if_else(mask, pa.nulls(n, pa.int32()), n_tok),
            "source": pc.if_else(mask, pa.nulls(n, pa.string()), source),
        }
    )


def _fold_as_state(out: pa.Table) -> dict:
    state = {}
    for row in out.to_pylist():
        if row["op"] == "DELETE":
            continue
        state[row["doc_id"]] = {c: row.get(c) for c in USER_COLS}
    return state


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_fold_matches_naive_reference(seed):
    base = make_base_table(12, seed=42)
    keys = base["doc_id"].to_pylist() + [f"new-{i}" for i in range(4)]
    events = _rand_events(300, keys, seed)
    out = fold_patch_events(events, base)
    got = _fold_as_state(out)
    # base rows untouched by events are NOT re-emitted by the fold;
    # overlay fold output over base for full-state comparison
    want = _naive_patch_replay(base, events)
    touched = set(events["doc_id"].to_pylist())
    deleted = {
        r["doc_id"] for r in out.to_pylist() if r["op"] == "DELETE"
    }
    for k in touched:
        assert got.get(k) == want.get(k), k
        if k not in got:
            assert k in deleted or k not in want
    # live keys the fold reports exactly once, DELETEs carry no payload
    assert len(out["doc_id"].to_pylist()) == len(set(out["doc_id"].to_pylist()))


def test_patch_carries_tokens_forward_and_resets_on_insert():
    base = pa.table(
        {
            "doc_id": ["a"],
            "tokens": pa.array([[7, 8, 9]], pa.list_(pa.int32())),
            "n_tok": pa.array([3], pa.int32()),
            "source": ["web"],
        }
    )
    events = pa.table(
        {
            "lsn": pa.array([5, 6, 7], pa.int64()),
            "op": ["UPDATE", "INSERT", "UPDATE"],
            "doc_id": ["a", "a", "a"],
            "tokens": pa.array([None, [1], None], pa.list_(pa.int32())),
            "n_tok": pa.array([None, 1, None], pa.int32()),
            "source": ["patched", None, "post"],
        }
    )
    # patch at 5 keeps tokens [7,8,9]; INSERT at 6 RESETS source to its
    # explicit null; patch at 7 sets it again
    out = fold_patch_events(events, base).to_pylist()
    assert out == [
        {"lsn": 7, "op": "UPDATE", "doc_id": "a", "tokens": [1],
         "n_tok": 1, "source": "post"}
    ]
    # and without the INSERT, the token array carries forward exactly
    out2 = fold_patch_events(events.slice(0, 1), base).to_pylist()[0]
    assert out2["tokens"] == [7, 8, 9] and out2["source"] == "patched"


def test_patch_resurrects_after_delete_and_upserts_absent_key():
    events = pa.table(
        {
            "lsn": pa.array([1, 2, 3], pa.int64()),
            "op": ["DELETE", "UPDATE", "UPDATE"],
            "doc_id": ["gone", "gone", "fresh"],
            "tokens": pa.array([None, None, None], pa.list_(pa.int32())),
            "n_tok": pa.array([None, 4, 9], pa.int32()),
            "source": [None, None, None],
        }
    )
    base = pa.table(
        {
            "doc_id": ["gone"],
            "tokens": pa.array([[1]], pa.list_(pa.int32())),
            "n_tok": pa.array([1], pa.int32()),
            "source": ["web"],
        }
    )
    out = {r["doc_id"]: r for r in fold_patch_events(events, base).to_pylist()}
    # resurrection starts from EMPTY, not the pre-delete image
    assert out["gone"]["n_tok"] == 4 and out["gone"]["source"] is None
    assert out["gone"]["tokens"] is None and out["gone"]["op"] == "UPDATE"
    assert out["fresh"]["n_tok"] == 9 and out["fresh"]["op"] == "UPDATE"
    # trailing DELETE emits a tombstone with null payload
    out2 = fold_patch_events(events.slice(0, 1), base).to_pylist()[0]
    assert out2["op"] == "DELETE" and out2["tokens"] is None


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


def _state_table(state: dict, schema: pa.Schema) -> pa.Table:
    rows = []
    for k, v in sorted(state.items()):
        v = dict(v)
        if v.get("n_tok") is None and v.get("tokens") is not None:
            # the apply's normalize derives n_tok from tokens when null
            v["n_tok"] = len(v["tokens"])
        rows.append({"doc_id": k, **v})
    return pa.Table.from_pylist(rows, schema=schema)


@pytest.mark.parametrize("fold", ["local", "ray"])
def test_apply_patches_end_to_end(tmp_path, tmp_lake, fold):
    base = make_base_table(40, seed=42)
    _bootstrap(tmp_path, tmp_lake, base)
    keys = base["doc_id"].to_pylist() + [f"new-{i}" for i in range(6)]
    events = _rand_events(400, keys, seed=9)
    events = events.set_column(
        0, "lsn", pc.add(events["lsn"], pa.scalar(100, pa.int64()))
    )
    apply_patches(events, tmp_lake, num_partitions=8, fold=fold)
    got = final_state_table(tmp_lake).sort_by("doc_id")
    want = _state_table(
        _naive_patch_replay(base, events), got.schema
    )
    assert got.equals(want)  # token-array equality included

    # idempotent replay: same batch again converges to the same bytes
    apply_patches(events, tmp_lake, num_partitions=8, fold=fold)
    again = final_state_table(tmp_lake).sort_by("doc_id")
    assert again.equals(want)


def test_apply_patches_chunked_equals_oneshot(tmp_path, tmp_lake):
    base = make_base_table(30, seed=42)
    _bootstrap(tmp_path, tmp_lake, base)
    keys = base["doc_id"].to_pylist() + ["n-0", "n-1"]
    events = _rand_events(250, keys, seed=17)
    events = events.set_column(
        0, "lsn", pc.add(events["lsn"], pa.scalar(100, pa.int64()))
    )
    apply_patches(events, tmp_lake, num_partitions=8, chunk_events=60)
    got = final_state_table(tmp_lake).sort_by("doc_id")
    lake2 = str(tmp_path / "lake2")
    _bootstrap(tmp_path, lake2, base)
    apply_patches(events, lake2, num_partitions=8)
    assert got.equals(final_state_table(lake2).sort_by("doc_id"))


def test_apply_patches_delta_mode_and_new_column(tmp_path, tmp_lake):
    """Patches compose with merge-on-read AND schema evolution: a patch
    batch carrying a brand-new column evolves the lake; untouched rows
    read null for it."""
    base = make_base_table(20, seed=42)
    _bootstrap(tmp_path, tmp_lake, base)
    k0, k1 = base["doc_id"].to_pylist()[:2]
    events = pa.table(
        {
            "lsn": pa.array([100, 101], pa.int64()),
            "op": ["UPDATE", "UPDATE"],
            "doc_id": [k0, k1],
            "quality": pa.array([0.5, None], pa.float32()),
            "source": pa.array([None, "evolved"]),
        }
    )
    apply_patches(events, tmp_lake, num_partitions=8, mode="delta")
    got = final_state_table(tmp_lake)
    rows = {r["doc_id"]: r for r in got.to_pylist()}
    b = {r["doc_id"]: r for r in base.to_pylist()}
    assert rows[k0]["quality"] == pytest.approx(0.5)
    assert rows[k0]["source"] == b[k0]["source"]  # carried forward
    assert rows[k0]["tokens"] == b[k0]["tokens"]
    assert rows[k1]["quality"] is None and rows[k1]["source"] == "evolved"
    untouched = base["doc_id"].to_pylist()[5]
    assert rows[untouched]["quality"] is None
    assert rows[untouched]["tokens"] == b[untouched]["tokens"]


def test_tail_follows_patch_log(tmp_path, tmp_lake):
    """tail_once(patch=True): watermark-filtered patch segments apply
    incrementally; a poll with nothing new is a version no-op."""
    from palimpzest_ray.cdc import load_latest_manifest, tail_once

    base = make_base_table(25, seed=42)
    _bootstrap(tmp_path, tmp_lake, base)
    log = tmp_path / "patchlog"
    log.mkdir()
    k0, k1 = base["doc_id"].to_pylist()[:2]

    def _seg(name, lsn, key, src):
        pq.write_table(
            pa.table(
                {
                    "lsn": pa.array([lsn], pa.int64()),
                    "op": ["UPDATE"],
                    "doc_id": [key],
                    "source": pa.array([src]),
                }
            ),
            str(log / name),
        )

    _seg("s0.parquet", 100, k0, "tail-a")
    r1 = tail_once(str(log), tmp_lake, patch=True, num_partitions=8)
    assert r1.manifest.version == 2 and r1.rows_upserted == 1
    _seg("s1.parquet", 101, k1, "tail-b")
    r2 = tail_once(str(log), tmp_lake, patch=True, num_partitions=8)
    assert r2.manifest.version == 3
    # idle poll: no new events past the watermark, version unchanged
    r3 = tail_once(str(log), tmp_lake, patch=True, num_partitions=8)
    assert r3.events_seen == 0
    assert load_latest_manifest(tmp_lake).version == 3
    rows = {r["doc_id"]: r for r in final_state_table(tmp_lake).to_pylist()}
    b = {r["doc_id"]: r for r in base.to_pylist()}
    assert rows[k0]["source"] == "tail-a" and rows[k0]["tokens"] == b[k0]["tokens"]
    assert rows[k1]["source"] == "tail-b"


def test_fold_rejects_bad_input():
    ev = pa.table(
        {"lsn": pa.array([1], pa.int64()), "op": ["PATCH"], "doc_id": ["a"],
         "n_tok": pa.array([1], pa.int32())}
    )
    with pytest.raises(ValueError, match="op outside"):
        fold_patch_events(ev)
    with pytest.raises(ValueError, match="missing required"):
        fold_patch_events(ev.drop_columns(["op"]))
