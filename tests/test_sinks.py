"""Versioned Parquet sink: atomic manifest flip, partitioned layout."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from palimpzest_ray import sinks


def _ds(vals):
    return rd.from_arrow(
        pa.table({"k": pa.array([v % 3 for v in vals]), "v": pa.array(vals)})
    )


def test_versioned_write_read_roundtrip(tmp_path):
    root = str(tmp_path / "out")
    m1 = sinks.write_versioned(_ds(range(100)), root)
    assert m1["version"] == 1 and m1["files"]
    got = sinks.read_versioned(root).take_all()
    assert sorted(r["v"] for r in got) == list(range(100))

    m2 = sinks.write_versioned(_ds(range(50)), root)
    assert m2["version"] == 2
    got = sinks.read_versioned(root).take_all()
    assert len(got) == 50  # readers see only the committed version


def test_partitioned_layout(tmp_path):
    root = str(tmp_path / "part")
    m = sinks.write_versioned(_ds(range(30)), root, partition_cols=["k"])
    subdirs = {f.split(os.sep)[0] for f in m["files"]}
    assert subdirs == {"k=0", "k=1", "k=2"}
    got = sinks.read_versioned(root).take_all()
    assert len(got) == 30


def test_write_partitioned_resumable_crash_then_resume(tmp_path):
    import pyarrow.parquet as pq

    from palimpzest_ray.sinks import (
        _partition_key,
        read_manifest,
        write_partitioned_resumable,
    )

    df = pd.DataFrame(
        {"region": ["eu", "us", "ap"] * 40, "v": range(120)}
    )
    root = str(tmp_path / "out")
    bad = _partition_key("us")

    with pytest.raises(Exception):
        write_partitioned_resumable(
            rd.from_pandas(df), root, "region", run_id="r1", fail_keys=(bad,)
        )
    assert read_manifest(root) is None  # nothing committed

    # finished partitions survive in staging with .done sidecars
    staging = tmp_path / "out" / "_staging" / "r1"
    done_before = {
        d.name: (d / "part-0.parquet").stat().st_mtime_ns
        for d in staging.iterdir()
        if (d / ".done").exists()
    }
    assert len(done_before) >= 1 and bad not in done_before

    m = write_partitioned_resumable(rd.from_pandas(df), root, "region", run_id="r1")
    assert m["version"] == 1 and len(m["partitions"]) == 3
    # previously-done partitions were NOT rewritten (mtime unchanged)
    final = tmp_path / "out" / "v1"
    for name, mtime in done_before.items():
        assert (final / name / "part-0.parquet").stat().st_mtime_ns == mtime
    # and only the straggler's rows were written this run
    assert m["rows_written_this_run"] == 40
    total = sum(
        pq.read_table(str(final / p / "part-0.parquet")).num_rows
        for p in m["partitions"]
    )
    assert total == 120


def test_version_recovers_from_unmanifested_dir(tmp_path):
    """Crash window: the vN directory flip succeeded but the manifest
    write did not. A rerun must pick N+1 from the filesystem instead of
    trusting the (stale/absent) manifest and ENOTEMPTY-ing on vN."""
    root = str(tmp_path / "out")
    os.makedirs(os.path.join(root, "v1"))
    with open(os.path.join(root, "v1", "part-0.parquet"), "wb") as f:
        f.write(b"orphan")  # committed-looking dir, no manifest
    assert sinks.read_manifest(root) is None

    m = sinks.write_versioned(_ds(list(range(30))), root)
    assert m["version"] == 2  # skipped the orphaned v1
    assert sinks.read_versioned(root).count() == 30

    # and the same discipline holds for the resumable partitioned sink
    import ray.data as rd
    df = pd.DataFrame({"region": ["a"] * 5 + ["b"] * 5, "v": range(10)})
    m2 = sinks.write_partitioned_resumable(
        rd.from_pandas(df), root, "region", run_id="rX"
    )
    assert m2["version"] == 3
