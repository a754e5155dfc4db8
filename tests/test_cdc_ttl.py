"""Row TTL: stored expiry policy enforced as exactly-once deletes."""

from __future__ import annotations

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
