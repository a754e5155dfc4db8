"""Ingest data-quality gate: expectations + dead-letter quarantine.

Malformed change events (bad op, null lsn, null key) and rows failing
named expectations route to ``<lake>/_quarantine/`` with per-row
reasons instead of poisoning the commit; the healthy rows apply
exactly as if the bad ones never existed. Checked against duckdb on
both the lake side and the dead-letter side, across the local and
distributed exchanges.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import (
    apply_changes,
    final_state_table,
    read_quarantine,
    tail_once,
)


def _mixed_log(n: int = 60) -> pa.Table:
    """Deterministic log with disjoint violation classes:
    i%10==3 → invalid op; i%10==5 → null lsn; i%10==7 → null key;
    i%10==9 → n_tok<=0 (expectation); everything else healthy INSERTs.
    """
    lsn, op, key, n_tok, src = [], [], [], [], []
    for i in range(n):
        m = i % 10
        lsn.append(None if m == 5 else i + 1)
        op.append("UPSERT" if m == 3 else "INSERT")
        key.append(None if m == 7 else f"doc-{i:04d}")
        n_tok.append(-1 if m == 9 else 10 + i)
        src.append("wiki" if i % 2 else "web")
    return pa.table(
        {
            "lsn": pa.array(lsn, pa.int64()),
            "op": pa.array(op),
            "doc_id": pa.array(key),
            "n_tok": pa.array(n_tok, pa.int32()),
            "source": pa.array(src),
        }
    )


EXPECT = [("positive_n_tok", [("n_tok", ">", 0)])]


def _good_oracle(log: pa.Table) -> pa.Table:
    con = duckdb.connect()
    con.register("log", log)
    out = con.execute(
        """select doc_id, n_tok, source from log
           where op in ('INSERT','UPDATE','DELETE')
             and lsn is not null and doc_id is not null
             and (op = 'DELETE' or coalesce(n_tok > 0, false))
           order by doc_id"""
    ).arrow()
    con.close()
    return out


def _apply(tmp_path, log, lake, **kw):
    p = os.path.join(str(tmp_path), "log.parquet")
    pq.write_table(log, p)
    return apply_changes(p, lake, num_partitions=4, **kw)


@pytest.mark.parametrize("exchange", ["local", "ray", "fs"])
def test_quarantine_routes_and_state_matches_oracle(
    tmp_path, tmp_lake, exchange
):
    log = _mixed_log()
    res = _apply(
        tmp_path, log, tmp_lake,
        expectations=EXPECT, quarantine=True, exchange=exchange,
    )
    # lake state == replay of only the healthy events
    got = final_state_table(tmp_lake).sort_by("doc_id")
    want = _good_oracle(log)
    assert (
        got.select(["doc_id", "n_tok", "source"]).to_pydict()
        == want.to_pydict()
    )
    # dead letter has exactly the bad rows, with the right reasons
    q = read_quarantine(tmp_lake)
    assert res.rows_quarantined == q.num_rows == 24  # 6 per class
    reasons = dict(
        zip(
            (q["lsn"].to_pylist()),
            q["_errors"].to_pylist(),
        )
    )
    assert reasons[4] == "invalid_op"  # i=3 → lsn 4
    assert reasons[None] == "null_lsn"  # i%10==5 rows
    assert reasons[8] == "null_key"  # i=7 → lsn 8
    assert reasons[10] == "positive_n_tok"  # i=9 → lsn 10
    assert res.quarantine_file and os.path.exists(res.quarantine_file)
    # versioned read matches the all-files read for a single commit
    assert read_quarantine(
        tmp_lake, version=res.manifest.version
    ).num_rows == q.num_rows


def test_violations_fail_without_quarantine(tmp_path, tmp_lake):
    log = _mixed_log(20)
    with pytest.raises(ValueError, match="op outside"):
        _apply(tmp_path, log, tmp_lake, exchange="local")
    healthy_but_negative = pa.table(
        {
            "lsn": pa.array([1, 2], pa.int64()),
            "op": pa.array(["INSERT", "INSERT"]),
            "doc_id": pa.array(["a", "b"]),
            "n_tok": pa.array([5, -2], pa.int32()),
        }
    )
    with pytest.raises(ValueError, match="positive_n_tok"):
        _apply(
            tmp_path, healthy_but_negative, tmp_lake,
            expectations=EXPECT, exchange="local",
        )


def test_deletes_exempt_from_expectations(tmp_path, tmp_lake):
    """A DELETE usually carries no payload — expectations must not
    quarantine it. Its null n_tok would fail positive_n_tok."""
    log = pa.table(
        {
            "lsn": pa.array([1, 2, 3], pa.int64()),
            "op": pa.array(["INSERT", "INSERT", "DELETE"]),
            "doc_id": pa.array(["a", "b", "a"]),
            "n_tok": pa.array([5, 7, None], pa.int32()),
        }
    )
    res = _apply(
        tmp_path, log, tmp_lake,
        expectations=EXPECT, quarantine=True, exchange="local",
    )
    assert res.rows_quarantined == 0
    t = final_state_table(tmp_lake)
    assert sorted(t["doc_id"].to_pylist()) == ["b"]


def test_tail_does_not_requarantine_watermarked_events(tmp_path, tmp_lake):
    """Following a log with quarantine on: a second poll over the same
    files is a no-op on BOTH sides. The manifest watermark covers only
    healthy merges, so tail_once folds in quarantine_watermark() —
    without it, a bad event holding the log's tail position would be
    re-quarantined into a fresh commit on every poll, forever. (Null-lsn
    events inside a not-yet-consumed file remain at-least-once on the
    dead-letter side — the Debezium caveat.)"""
    log_dir = os.path.join(str(tmp_path), "log")
    os.makedirs(log_dir)
    first = _mixed_log(40)
    # drop null-lsn rows for the clean half of the claim
    first = first.filter(first["lsn"].is_valid())
    pq.write_table(first, os.path.join(log_dir, "000.parquet"))
    r1 = tail_once(
        log_dir, tmp_lake,
        num_partitions=4, expectations=EXPECT, quarantine=True,
    )
    assert r1.rows_quarantined == 12  # 3 classes x 4 (null_lsn removed)
    v1 = r1.manifest.version
    r2 = tail_once(
        log_dir, tmp_lake,
        num_partitions=4, expectations=EXPECT, quarantine=True,
    )
    # nothing past the watermark: no new version, no new dead letter
    assert r2.manifest.version == v1
    assert read_quarantine(tmp_lake).num_rows == 12


def test_quarantine_delta_mode_and_empty_read(tmp_path, tmp_lake):
    log = _mixed_log(30)
    res = _apply(
        tmp_path, log, tmp_lake,
        expectations=EXPECT, quarantine=True, exchange="local", mode="delta",
    )
    assert res.rows_quarantined == 12
    got = final_state_table(tmp_lake).sort_by("doc_id")
    assert (
        got.select(["doc_id", "n_tok", "source"]).to_pydict()
        == _good_oracle(log).to_pydict()
    )
    # a lake that never quarantined reads back an empty, typed table
    clean = str(tmp_path / "clean_lake")
    good_only = pa.table(
        {
            "lsn": pa.array([1, 2], pa.int64()),
            "op": pa.array(["INSERT", "INSERT"]),
            "doc_id": pa.array(["a", "b"]),
            "n_tok": pa.array([5, 7], pa.int32()),
        }
    )
    pq.write_table(good_only, os.path.join(str(tmp_path), "good.parquet"))
    apply_changes(
        os.path.join(str(tmp_path), "good.parquet"), clean, num_partitions=2,
        expectations=EXPECT, quarantine=True,
    )
    assert read_quarantine(clean).num_rows == 0


def test_replay_quarantine_fix_and_converge(tmp_path, tmp_lake):
    """DLQ reprocessing: quarantine -> fix -> replay through the SAME
    gate; repaired rows merge at their ORIGINAL LSNs, still-bad rows
    dead-letter again, and replaying twice converges by LWW."""
    import pyarrow.compute as pc

    from palimpzest_ray.cdc import (
        add_constraint,
        apply_changes,
        final_state_table,
        read_quarantine,
        replay_quarantine,
    )

    schema = pa.schema(
        [pa.field("lsn", pa.int64()), pa.field("op", pa.string()),
         pa.field("doc_id", pa.string()), pa.field("n_tok", pa.int32())]
    )

    def _ev(rows):
        return pa.Table.from_pylist(
            [{"lsn": r[0], "op": r[1], "doc_id": r[2], "n_tok": r[3]}
             for r in rows], schema,
        )

    apply_changes(
        _ev([(i, "INSERT", f"d{i}", 10 * i) for i in range(1, 5)]),
        tmp_lake, num_partitions=4,
    )
    add_constraint(tmp_lake, "nonneg", [("n_tok", ">=", 0)])
    # two violators (negative) + one structurally dead (null key)
    bad = pa.Table.from_pylist(
        [
            {"lsn": 100, "op": "UPDATE", "doc_id": "d1", "n_tok": -5},
            {"lsn": 101, "op": "UPDATE", "doc_id": "d2", "n_tok": -9},
            {"lsn": 102, "op": "UPDATE", "doc_id": None, "n_tok": 3},
        ],
        schema,
    )
    r = apply_changes(bad, tmp_lake, num_partitions=4, quarantine=True)
    assert r.rows_quarantined == 3

    def fix(batch: pa.Table) -> pa.Table:
        # clamp negatives to 0; drop the row that has no key
        batch = batch.filter(pc.is_valid(batch["doc_id"]))
        i = batch.column_names.index("n_tok")
        return batch.set_column(
            i, pa.field("n_tok", pa.int32()),
            pc.max_element_wise(
                batch["n_tok"], pa.scalar(0, pa.int32())
            ),
        )

    r2 = replay_quarantine(tmp_lake, version=r.manifest.version, fix=fix)
    assert r2.rows_upserted == 2
    d = {row["doc_id"]: row["n_tok"]
         for row in final_state_table(tmp_lake).to_pylist()}
    assert d["d1"] == 0 and d["d2"] == 0 and d["d3"] == 30
    # replay again: LWW converges, nothing changes
    replay_quarantine(tmp_lake, version=r.manifest.version, fix=fix)
    assert {row["doc_id"]: row["n_tok"]
            for row in final_state_table(tmp_lake).to_pylist()} == d
    # unfixed replay: the same gate rejects again (or re-quarantines)
    import pytest

    with pytest.raises(ValueError, match="constraint:nonneg|null"):
        replay_quarantine(tmp_lake, version=r.manifest.version)
    r3 = replay_quarantine(
        tmp_lake, version=r.manifest.version, quarantine=True,
        num_partitions=4,
    )
    assert r3.rows_quarantined == 3
    q = read_quarantine(tmp_lake, version=r3.manifest.version)
    assert q.num_rows == 3
