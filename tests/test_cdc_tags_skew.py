"""Version tags (named savepoints, vacuum-pinned) and the
partition-skew inspector (manifest counters only)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import (
    apply_changes,
    drop_tag,
    final_state_table,
    lake_skew,
    list_tags,
    resolve_tag,
    tag_version,
    vacuum,
)
from palimpzest_ray.cdc.manifest import load_manifest


def _apply(tmp_path, lake, rows, name):
    t = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("lsn", pa.int64()), ("op", pa.string()),
             ("doc_id", pa.string()), ("n_tok", pa.int32())]
        ),
    )
    p = os.path.join(str(tmp_path), name)
    pq.write_table(t, p)
    return apply_changes(p, lake, num_partitions=4)


def test_tag_read_vacuum_pin_and_force(tmp_path, ray_session):
    lake = str(tmp_path / "lake")
    _apply(tmp_path, lake, [
        {"lsn": i + 1, "op": "INSERT", "doc_id": f"d{i:03d}", "n_tok": i}
        for i in range(20)
    ], "boot.parquet")
    tag_version(lake, "training-cut")  # pins v1
    for e in range(3):
        _apply(tmp_path, lake, [
            {"lsn": 100 + e, "op": "UPDATE", "doc_id": "d000", "n_tok": e}
        ], f"u{e}.parquet")

    # tagged read resolves through every reader entry point
    assert resolve_tag(lake, "training-cut") == 1
    t = final_state_table(lake, tag="training-cut")
    assert t.filter(
        pa.compute.equal(t["doc_id"], "d000")
    )["n_tok"].to_pylist() == [0]
    from palimpzest_ray.cdc import final_state

    assert final_state(lake, tag="training-cut").count() == 20
    with pytest.raises(ValueError, match="exactly one"):
        final_state_table(lake, tag="training-cut", version=2)

    # vacuum keeps the tagged version however aggressive the count floor
    res = vacuum(lake, keep_versions=1)
    assert res.versions_dropped == []
    assert load_manifest(lake, 1) is not None

    # a savepoint does not silently move
    with pytest.raises(ValueError, match="already exists"):
        tag_version(lake, "training-cut", 2)
    tag_version(lake, "training-cut", 2, force=True)
    assert list_tags(lake) == {"training-cut": 2}

    # dropping the tag releases retention
    drop_tag(lake, "training-cut")
    res2 = vacuum(lake, keep_versions=1)
    assert 1 in res2.versions_dropped
    with pytest.raises(FileNotFoundError):
        resolve_tag(lake, "training-cut")
    with pytest.raises(ValueError, match="invalid tag name"):
        tag_version(lake, "../evil")


def test_lake_skew_reports_hot_partition(tmp_path, ray_session):
    lake = str(tmp_path / "lake")
    # heavy skew: 4/5 of keys share one routing value via partition_key
    n = 200
    feed = pa.table(
        {
            "lsn": pa.array(range(1, n + 1), pa.int64()),
            "op": pa.array(["INSERT"] * n),
            "doc_id": pa.array([f"d{i:04d}" for i in range(n)]),
            "shard": pa.array(
                ["hot" if i % 5 else f"cold{i}" for i in range(n)]
            ),
            "n_tok": pa.array([1] * n, pa.int32()),
        }
    )
    apply_changes(
        feed, lake, num_partitions=8, partition_key="shard"
    )
    rep = lake_skew(lake)
    assert rep["rows_total"] == n
    assert rep["num_partitions"] == 8
    assert rep["skewed"] is True
    assert rep["rows_max"] >= 160  # the hot bucket
    assert rep["hot_partitions"][0]["rows"] == rep["rows_max"]
    assert rep["cv"] > 1.0

    # a balanced lake is not flagged
    lake2 = str(tmp_path / "lake2")
    apply_changes(
        feed.drop_columns(["shard"]), lake2, num_partitions=8
    )
    rep2 = lake_skew(lake2)
    assert rep2["skewed"] is False
    assert rep2["rows_total"] == n


def test_cli_tag_and_skew(tmp_path, capsys, ray_session):
    from palimpzest_ray import cli

    lake = str(tmp_path / "lake")
    _apply(tmp_path, lake, [
        {"lsn": 1, "op": "INSERT", "doc_id": "a", "n_tok": 1}
    ], "boot.parquet")
    assert cli.main(["tag", lake, "create", "v1-cut"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["version"] == 1
    assert cli.main(["tag", lake, "list"]) == 0
    assert json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    ) == {"v1-cut": 1}
    assert cli.main(["skew", lake]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows_total"] == 1
    assert cli.main(["tag", lake, "drop", "v1-cut"]) == 0


def test_find_orphans(tmp_path, capsys, ray_session):
    import shutil

    from palimpzest_ray import cli
    from palimpzest_ray.cdc import find_orphans

    lake = str(tmp_path / "lake")
    _apply(tmp_path, lake, [
        {"lsn": i + 1, "op": "INSERT", "doc_id": f"d{i}", "n_tok": i}
        for i in range(8)
    ], "boot.parquet")
    rep = find_orphans(lake)
    assert rep["orphans"] == []
    assert rep["files_referenced"] > 0

    # a stray copy inside the data dir is an orphan; vacuum reclaims it
    m = load_manifest(lake, 1)
    src = next(iter(m.parts.values())).file
    stray = os.path.join(lake, "data", "v1", "stray-copy.parquet")
    shutil.copyfile(os.path.join(lake, src), stray)
    rep2 = find_orphans(lake)
    assert rep2["orphans"] == [os.path.join("data", "v1", "stray-copy.parquet")]
    assert rep2["bytes"] > 0
    from palimpzest_ray.cdc import vacuum

    vacuum(lake, keep_versions=1)
    assert not os.path.exists(stray)
    assert find_orphans(lake)["orphans"] == []

    assert cli.main(["orphans", lake]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["orphans"] == []
