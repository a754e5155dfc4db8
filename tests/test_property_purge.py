"""Property-based purge correctness: across random epoch histories and
random purge sets, purge_keys leaves every retained version equal to
its pre-purge state minus the purged keys, keeps the lake fsck-clean,
and forgets the keys physically everywhere."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from palimpzest_ray.cdc import (
    apply_changes,
    final_state_table,
    fsck,
    load_latest_manifest,
    purge_keys,
)

KEYS = [f"k{i}" for i in range(12)]


def _events(ops, lsn0):
    rows = []
    for i, (key_i, op) in enumerate(ops):
        rows.append(
            {
                "lsn": lsn0 + i,
                "op": op,
                "doc_id": KEYS[key_i],
                "v": (lsn0 + i) % 101 if op != "DELETE" else None,
            }
        )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("lsn", pa.int64()), ("op", pa.string()),
             ("doc_id", pa.string()), ("v", pa.int64())]
        ),
    )


epoch = st.lists(
    st.tuples(st.integers(0, len(KEYS) - 1),
              st.sampled_from(["INSERT", "UPDATE", "DELETE"])),
    min_size=1, max_size=10,
)


@pytest.mark.usefixtures("ray_session")
@given(
    epochs=st.lists(epoch, min_size=1, max_size=3),
    modes=st.lists(st.sampled_from(["rewrite", "delta"]), min_size=3,
                   max_size=3),
    purge_idx=st.sets(st.integers(0, len(KEYS) - 1), min_size=1,
                      max_size=4),
    keep_tomb=st.booleans(),
)
@settings(max_examples=12, deadline=None)
def test_purge_random_histories(tmp_path_factory, epochs, modes,
                                purge_idx, keep_tomb):
    tmp = tmp_path_factory.mktemp("purge_prop")
    lake = str(tmp / "lake")
    # first epoch must introduce at least one key as INSERT so the
    # lake exists; force op of the first event
    lsn = 1
    for e, ops in enumerate(epochs):
        if e == 0:
            ops = [(ops[0][0], "INSERT")] + ops[1:]
        t = _events(ops, lsn)
        lsn += len(ops) + 5
        apply_changes(
            t, lake, num_partitions=3, mode=modes[e % len(modes)],
            exchange="local",
        )
    purged = sorted({KEYS[i] for i in purge_idx})
    parr = pa.array(purged)

    head = load_latest_manifest(lake)
    pre = {
        v: final_state_table(lake, version=v)
        for v in range(1, head.version + 1)
    }
    purge_keys(lake, purged, keep_tombstones=keep_tomb)

    latest = load_latest_manifest(lake)
    for v in range(1, head.version + 1):
        want = pre[v].filter(
            pc.invert(pc.is_in(pre[v]["doc_id"], value_set=parr))
        )
        got = final_state_table(lake, version=v)
        assert got.equals(want), (v, purged)
    # tombstone_first may have added a delete commit; its state equals
    # the head minus purged keys too (covered when head.version bumped)
    for v in range(head.version + 1, latest.version + 1):
        got = final_state_table(lake, version=v)
        assert not set(got["doc_id"].to_pylist()) & set(purged)

    rep = fsck(lake, deep=True)
    assert rep["ok"], rep["errors"]

    # physical forgetting: no live image anywhere; under keep_tomb the
    # only surviving rows are nulled tombstones
    for root, _d, files in os.walk(lake):
        for f in files:
            if not f.endswith(".parquet") or "_quarantine" in root:
                continue
            t = pq.read_table(os.path.join(root, f))
            if "doc_id" not in t.column_names:
                continue
            rows = t.filter(pc.is_in(t["doc_id"], value_set=parr))
            if keep_tomb:
                for r in rows.to_pylist():
                    assert r.get("_deleted") is True
                    assert r.get("v") is None
            else:
                assert rows.num_rows == 0

    # idempotent re-run
    res2 = purge_keys(lake, purged, keep_tombstones=keep_tomb)
    assert res2["rows_removed"] == 0
    assert fsck(lake, deep=True)["ok"]
