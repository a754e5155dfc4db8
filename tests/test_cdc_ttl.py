"""Row TTL: stored expiry policy enforced as exactly-once deletes."""

from __future__ import annotations

import os

from datetime import datetime, timedelta

import pyarrow as pa
import pytest

from palimpzest_ray.cdc import (
    apply_changes,
    apply_ttl,
    drop_ttl,
    final_state_table,
    get_ttl,
    load_latest_manifest,
    set_ttl,
)


def test_ttl_policy_and_enforcement(tmp_path, ray_session):
    """set_ttl stores the policy; apply_ttl expires exactly the stale
    slice as an ordinary exactly-once DELETE; later enforcements with a
    later clock expire the next slice; no-op commits nothing."""
    lake = str(tmp_path / "lake")
    t0 = datetime(2026, 1, 1)
    n = 40
    feed = pa.table(
        {
            "lsn": pa.array(range(1, n + 1), pa.int64()),
            "op": pa.array(["INSERT"] * n),
            "doc_id": pa.array([f"d{i:03d}" for i in range(n)]),
            "ts": pa.array(
                [t0 + timedelta(hours=i) for i in range(n)],
                pa.timestamp("us"),
            ),
            "n_tok": pa.array(list(range(n)), pa.int32()),
        }
    )
    apply_changes(feed, lake, num_partitions=4)
    pol = set_ttl(lake, "ts", keep_seconds=20 * 3600)
    assert get_ttl(lake) == pol

    # enforcement clock: t0 + 30h, keep 20h -> rows older than t0+10h
    now1 = (t0 + timedelta(hours=30)).timestamp()
    r1 = apply_ttl(lake, now=now1)
    assert r1.rows_deleted == 10
    t = final_state_table(lake)
    assert t.num_rows == 30
    assert min(t["ts"].to_pylist()) == t0 + timedelta(hours=10)

    # same clock again: nothing newly stale, no version committed
    v = load_latest_manifest(lake).version
    r2 = apply_ttl(lake, now=now1)
    assert r2.rows_deleted == 0
    assert load_latest_manifest(lake).version == v

    # later clock expires the next slice
    r3 = apply_ttl(lake, now=(t0 + timedelta(hours=35)).timestamp())
    assert r3.rows_deleted == 5
    assert final_state_table(lake).num_rows == 25

    drop_ttl(lake)
    with pytest.raises(FileNotFoundError):
        apply_ttl(lake, now=now1)


def test_ttl_numeric_column(tmp_path, ray_session):
    """TTL over a numeric 'age' column (epoch-seconds style)."""
    lake = str(tmp_path / "lake")
    feed = pa.table(
        {
            "lsn": pa.array([1, 2, 3], pa.int64()),
            "op": pa.array(["INSERT"] * 3),
            "doc_id": pa.array(["a", "b", "c"]),
            "created": pa.array([100, 200, 300], pa.int64()),
        }
    )
    apply_changes(feed, lake, num_partitions=2)
    set_ttl(lake, "created", keep_seconds=150)
    r = apply_ttl(lake, now=350)  # cutoff 200: only created=100 expires
    assert r.rows_deleted == 1
    assert final_state_table(lake)["doc_id"].to_pylist() == ["b", "c"]


def test_ttl_validations(tmp_path, ray_session):
    lake = str(tmp_path / "lake")
    feed = pa.table(
        {
            "lsn": pa.array([1], pa.int64()),
            "op": pa.array(["INSERT"]),
            "doc_id": pa.array(["a"]),
            "label": pa.array(["x"]),
            "n": pa.array([1], pa.int64()),
        }
    )
    apply_changes(feed, lake, num_partitions=2)
    with pytest.raises(ValueError, match="temporal/numeric"):
        set_ttl(lake, "label", 10)
    with pytest.raises(ValueError, match="unknown"):
        set_ttl(lake, "nope", 10)
    with pytest.raises(ValueError, match="key/partition"):
        set_ttl(lake, "doc_id", 10)
    with pytest.raises(ValueError, match="positive"):
        set_ttl(lake, "n", 0)


def test_rollup_ttl_downsample_then_expire(tmp_path, ray_session):
    """apply_rollup: stale rows aggregate into an accumulating rollup
    lake then expire from the source; successive enforcements FOLD into
    the same rollup rows; a crash between rollup and delete cannot
    double-count (producer-txn no-op)."""
    from palimpzest_ray.cdc import apply_rollup

    lake = str(tmp_path / "lake")
    roll = str(tmp_path / "roll")
    n = 60
    feed = pa.table(
        {
            "lsn": pa.array(range(1, n + 1), pa.int64()),
            "op": pa.array(["INSERT"] * n),
            "doc_id": pa.array([f"e{i:03d}" for i in range(n)]),
            "age": pa.array(list(range(n)), pa.int64()),  # "hours old"
            "kind": pa.array([f"k{i % 3}" for i in range(n)]),
            "val": pa.array([float(i % 7) for i in range(n)], pa.float64()),
        }
    )
    apply_changes(feed, lake, num_partitions=4)

    aggs = {"n_ev": ("count", None), "sum_val": ("sum", "val"),
            "max_val": ("max", "val")}
    # enforcement 1: keep age >= 20 (expire age < 20)
    r1 = apply_rollup(
        lake, roll, ttl_col="age", keep_seconds=0, now=20,
        group_col="kind", aggs=aggs, num_partitions=2,
    )
    assert r1["rows_rolled"] == 20 and r1["rows_deleted"] == 20
    assert final_state_table(lake).num_rows == 40

    def _expect(lo, hi):
        out = {}
        for i in range(lo, hi):
            k = f"k{i % 3}"
            c, s, m = out.get(k, (0, 0.0, None))
            v = float(i % 7)
            out[k] = (c + 1, s + v, v if m is None else max(m, v))
        return out

    def _roll_state():
        t = final_state_table(roll)
        return {
            r["kind"]: (r["n_ev"], r["sum_val"], r["max_val"])
            for r in t.to_pylist()
        }

    got = _roll_state()
    exp = _expect(0, 20)
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert got[k][1] == pytest.approx(exp[k][1])
        assert got[k][2] == pytest.approx(exp[k][2])

    # enforcement 2: advance the window — the next slice FOLDS in
    r2 = apply_rollup(
        lake, roll, ttl_col="age", keep_seconds=0, now=35,
        group_col="kind", aggs=aggs, num_partitions=2,
    )
    assert r2["rows_rolled"] == 15
    got = _roll_state()
    exp = _expect(0, 35)
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert got[k][1] == pytest.approx(exp[k][1])

    # crash replay: the delete already ran, so the slice is empty — noop
    r3 = apply_rollup(
        lake, roll, ttl_col="age", keep_seconds=0, now=35,
        group_col="kind", aggs=aggs, num_partitions=2,
    )
    assert r3["noop"] is True
    assert _roll_state() == got

    # crash BETWEEN rollup-apply and delete: simulate by re-applying
    # the same slice under the same producer txn — watermark no-op
    from palimpzest_ray.cdc.manifest import load_latest_manifest
    from palimpzest_ray.cdc.patch import apply_accumulate

    # direct double-send of enforcement-2's feed with its txn stamp:
    dup = pa.table(
        {
            "lsn": pa.array([10_000], pa.int64()),
            "op": pa.array(["UPDATE"]),
            "kind": pa.array(["k0"]),
            "n_ev": pa.array([999], pa.int64()),
            "sum_val": pa.array([999.0], pa.float64()),
            "max_val": pa.array([999.0], pa.float64()),
        }
    )
    # the txn recorded at enforcement 2 was (rollup:<abs roll>, v_src);
    # re-sending at or below that version no-ops
    m = load_latest_manifest(roll)
    assert m.app_versions  # the producer watermark is recorded
    app_id, v_used = next(iter(m.app_versions.items()))
    apply_accumulate(
        dup, roll, key="kind", num_partitions=2,
        sum_cols=("n_ev", "sum_val"), max_cols=("max_val",),
        txn=(app_id, v_used),
    )
    assert _roll_state() == got  # no double-count

    with pytest.raises(ValueError, match="not mergeable"):
        apply_rollup(
            lake, roll, ttl_col="age", keep_seconds=0, now=40,
            group_col="kind", aggs={"a": ("avg", "val")},
        )


def test_cli_rollup_and_digest(tmp_path, capsys, ray_session):
    import json as _json

    from palimpzest_ray import cli

    lake = str(tmp_path / "lake")
    feed = pa.table(
        {
            "lsn": pa.array(range(1, 21), pa.int64()),
            "op": pa.array(["INSERT"] * 20),
            "doc_id": pa.array([f"e{i}" for i in range(20)]),
            "age": pa.array(list(range(20)), pa.int64()),
            "kind": pa.array([f"k{i % 2}" for i in range(20)]),
            "val": pa.array([float(i) for i in range(20)], pa.float64()),
        }
    )
    apply_changes(feed, lake, num_partitions=2)
    roll = str(tmp_path / "roll")
    assert cli.main([
        "rollup", lake, roll, "--ttl-col", "age",
        "--keep-seconds", "0", "--now", "10",
        "--group-col", "kind",
        "--agg", "n", "count", "-",
        "--agg", "sum_val", "sum", "val",
    ]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows_rolled"] == 10 and out["rows_deleted"] == 10

    assert cli.main(["digest", lake]) == 0
    d1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d1["rows"] == 10 and len(d1["digest"]) == 16


def test_daemon_loop_with_ttl_maintenance(tmp_path, ray_session):
    """The production composition: tail_follow drains a growing log
    while on_commit enforces the stored TTL — expiry rides the ingest
    loop, no second scheduler."""
    from palimpzest_ray.cdc import apply_ttl, set_ttl, tail_follow

    lake = str(tmp_path / "lake")
    log = str(tmp_path / "log")
    os.makedirs(log)
    import pyarrow.parquet as pq

    def _seg(name, lo, hi):
        pq.write_table(
            pa.table(
                {
                    "lsn": pa.array(range(lo, hi), pa.int64()),
                    "op": pa.array(["INSERT"] * (hi - lo)),
                    "doc_id": pa.array([f"e{i:03d}" for i in range(lo, hi)]),
                    "age": pa.array(list(range(lo, hi)), pa.int64()),
                }
            ),
            os.path.join(log, name),
        )

    _seg("seg-000.parquet", 0, 20)

    enforced = []

    def _maintain(res):
        from palimpzest_ray.cdc import get_ttl

        if get_ttl(lake) is None:
            set_ttl(lake, "age", keep_seconds=10)
        r = apply_ttl(lake, now=res.manifest.max_lsn)
        enforced.append(r.rows_deleted)

    results = tail_follow(
        log, lake, poll_interval=0.1, idle_stop=2,
        on_commit=_maintain, num_partitions=2,
    )
    assert len(results) >= 1
    # after segment 1 (ages 0..19, clock 19, keep 10): ages < 9 expired
    t = final_state_table(lake)
    assert min(t["age"].to_pylist()) >= 9

    # producer writes more; a second follow drains and re-enforces
    _seg("seg-001.parquet", 20, 35)
    tail_follow(
        log, lake, poll_interval=0.1, idle_stop=2,
        on_commit=_maintain, num_partitions=2,
    )
    t = final_state_table(lake)
    assert max(t["age"].to_pylist()) == 34
    assert min(t["age"].to_pylist()) >= 24  # clock 34, keep 10
    assert sum(enforced) > 0
