"""JSON-topic tailing: consumed-file ledger pruning + watermark dedup.

JSON has no footer stats, so tail_once(format="jsonl"/"debezium")
prunes with a basename→size ledger: unchanged files are skipped
without parsing, grown files re-parse fully and the LSN watermark
drops their already-applied lines. The ledger is economy, never
correctness — deleting it just re-parses into a watermark no-op.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest

from palimpzest_ray.cdc import final_state_table, load_latest_manifest, tail_once


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _rows(lsns, prefix="doc"):
    return [
        {"lsn": i, "op": "INSERT", "doc_id": f"{prefix}-{i:03d}",
         "tokens": [i, i + 1], "n_tok": 2, "source": "wiki"}
        for i in lsns
    ]


def test_jsonl_tail_ledger_and_growth(tmp_path, tmp_lake):
    topic = os.path.join(str(tmp_path), "topic")
    os.makedirs(topic)
    seg0 = os.path.join(topic, "000.jsonl")
    _write_jsonl(seg0, _rows(range(1, 6)))
    r1 = tail_once(topic, tmp_lake, format="jsonl", num_partitions=2)
    assert final_state_table(tmp_lake).num_rows == 5
    v1 = r1.manifest.version
    ledger = json.load(open(os.path.join(tmp_lake, ".consumed.json")))
    assert ledger == {"000.jsonl": os.path.getsize(seg0)}

    # unchanged topic: ledger prunes everything — version no-op
    r2 = tail_once(topic, tmp_lake, format="jsonl", num_partitions=2)
    assert r2.manifest.version == v1 and r2.events_seen == 0

    # the active segment GROWS: re-parsed fully, old lines deduped by
    # the watermark, only the new ones land
    _write_jsonl(seg0, _rows(range(1, 9)))
    r3 = tail_once(topic, tmp_lake, format="jsonl", num_partitions=2)
    assert r3.manifest.version == v1 + 1
    assert final_state_table(tmp_lake).num_rows == 8

    # a rotation adds a new segment; only it is parsed (capture the
    # file list the reader receives to prove the ledger pruned 000)
    _write_jsonl(os.path.join(topic, "001.jsonl"), _rows(range(9, 12)))
    import palimpzest_ray.sources.changelog as chlog

    seen_paths = []
    orig = chlog.read_jsonl_changes

    def _spy(paths, *a, **kw):
        seen_paths.append(list(paths))
        return orig(paths, *a, **kw)

    chlog.read_jsonl_changes = _spy
    try:
        r4 = tail_once(topic, tmp_lake, format="jsonl", num_partitions=2)
    finally:
        chlog.read_jsonl_changes = orig
    assert final_state_table(tmp_lake).num_rows == 11
    assert [os.path.basename(p) for p in seen_paths[0]] == ["001.jsonl"]

    # lost ledger: everything re-parses, watermark makes it a no-op
    os.unlink(os.path.join(tmp_lake, ".consumed.json"))
    r5 = tail_once(topic, tmp_lake, format="jsonl", num_partitions=2)
    assert r5.manifest.version == r4.manifest.version
    assert final_state_table(tmp_lake).num_rows == 11


def test_debezium_tail(tmp_path, tmp_lake):
    from palimpzest_ray.sources.changelog import write_debezium_jsonl

    topic = os.path.join(str(tmp_path), "topic")
    os.makedirs(topic)
    t = pa.table(
        {
            "lsn": pa.array([1, 2, 3], pa.int64()),
            "op": pa.array(["INSERT", "INSERT", "DELETE"]),
            "doc_id": pa.array(["a", "b", "a"]),
            "tokens": pa.array([[1], [2, 2], None], pa.list_(pa.int32())),
            "n_tok": pa.array([1, 2, None], pa.int32()),
            "source": pa.array(["w", "w", None]),
        }
    )
    write_debezium_jsonl(t, topic)
    tail_once(topic, tmp_lake, format="debezium", num_partitions=2)
    state = final_state_table(tmp_lake)
    assert state["doc_id"].to_pylist() == ["b"]
    # idempotent second poll: ledger-pruned no-op
    r = tail_once(topic, tmp_lake, format="debezium", num_partitions=2)
    assert r.events_seen == 0
    assert load_latest_manifest(tmp_lake).version == 1


def test_maxwell_roundtrip_and_tail(tmp_path, ray_session):
    """Maxwell envelope ingest: fixture round trip equals the parquet
    replay; synthesized xid LSNs order correctly when no position is
    present; tail --format maxwell follows the topic."""
    import pyarrow.compute as pc

    from palimpzest_ray.cdc import apply_changes, final_state_table, tail_once
    from palimpzest_ray.sources.changelog import (
        read_maxwell_changes,
        unwrap_maxwell,
        write_maxwell_jsonl,
    )

    changes = pa.table(
        {
            "lsn": pa.array([1, 2, 3, 10, 11], pa.int64()),
            "op": pa.array(
                ["INSERT", "INSERT", "INSERT", "UPDATE", "DELETE"]
            ),
            "doc_id": pa.array(["a", "b", "c", "a", "b"]),
            "n_tok": pa.array([1, 2, 3, 9, None], pa.int32()),
        }
    )
    topic = str(tmp_path / "topic")
    write_maxwell_jsonl(changes, topic, lines_per_file=3)

    lake_m = str(tmp_path / "lake_m")
    r = tail_once(topic, lake_m, format="maxwell", num_partitions=2)
    assert r.rows_upserted >= 1
    lake_p = str(tmp_path / "lake_p")
    apply_changes(changes, lake_p, num_partitions=2)
    # the maxwell path conforms to the full CHANGELOG_SCHEMA; compare
    # on the columns the parquet twin carries
    want = final_state_table(lake_p)
    got = final_state_table(lake_m).select(want.column_names)
    assert got.cast(want.schema).equals(want)

    # second poll: consumed-file ledger + watermark no-op
    r2 = tail_once(topic, lake_m, format="maxwell", num_partitions=2)
    assert r2.rows_upserted == 0

    # no position/lsn: xid-synthesized LSNs keep commit order
    env = pa.table(
        {
            "type": pa.array(["insert", "update", "delete"]),
            "xid": pa.array([5, 7, 9], pa.int64()),
            "data": pa.array(
                [
                    {"doc_id": "z", "n_tok": 1},
                    {"doc_id": "z", "n_tok": 2},
                    {"doc_id": "z", "n_tok": None},
                ],
                pa.struct([("doc_id", pa.string()), ("n_tok", pa.int32())]),
            ),
        }
    )
    out = unwrap_maxwell(env)
    assert out["op"].to_pylist() == ["INSERT", "UPDATE", "DELETE"]
    lsns = out["lsn"].to_pylist()
    assert lsns == sorted(lsns) and len(set(lsns)) == 3
    # delete keeps its key, nulls its payload
    assert out["doc_id"].to_pylist()[-1] == "z"
    assert out["n_tok"].to_pylist()[-1] is None

    with pytest.raises(ValueError, match="unknown Maxwell"):
        unwrap_maxwell(
            pa.table({"type": pa.array(["truncate"]),
                      "xid": pa.array([1], pa.int64())})
        )


def test_maxwell_positionless_cross_batch_lsn(tmp_path, ray_session):
    """ADVICE r3 (changelog.py:360): a position-less Maxwell feed whose
    single transaction spans Ray's ~1024-row batch boundary must get a
    GLOBAL file-order row index — a per-batch index restarting at 0
    would collide/invert LSNs and LWW could keep a stale image.  Feed:
    one xid, 3000 updates of ONE key, n_tok = file-order rank; the
    final state must hold the LAST image (n_tok=2999), and the lsn
    column must be a strictly increasing permutation in file order."""
    from palimpzest_ray.cdc import apply_changes
    from palimpzest_ray.sources.changelog import read_maxwell_changes

    n = 3000
    topic = tmp_path / "mtopic"
    topic.mkdir()
    # two rolled files: file order is commit order across files too
    half = n // 2
    for fi, lo in enumerate((0, half)):
        with open(topic / f"maxwell-{fi:05d}.jsonl", "w") as f:
            for i in range(lo, lo + half):
                f.write(json.dumps({
                    "type": "update" if i else "insert",
                    "xid": 1,
                    "data": {"doc_id": "hot", "n_tok": i, "source": "s"},
                }) + "\n")

    feed = read_maxwell_changes(str(topic))
    tbl = feed.to_arrow_refs()
    import pyarrow.compute as pc
    import ray
    tbl = pa.concat_tables([ray.get(r) for r in tbl])
    assert tbl.num_rows == n
    # sort by the synthesized lsn: n_tok must come back in exact file
    # order 0..n-1 (distinct, monotone — no per-batch restart)
    order = pc.sort_indices(tbl, sort_keys=[("lsn", "ascending")])
    got = pc.take(tbl["n_tok"], order).to_pylist()
    assert got == list(range(n))
    assert len(set(tbl["lsn"].to_pylist())) == n

    lake = str(tmp_path / "lake")
    apply_changes(feed, lake, num_partitions=2)
    state = final_state_table(lake)
    assert state.num_rows == 1
    assert state["n_tok"].to_pylist() == [n - 1]
