"""Versioned Parquet sink: atomic manifest flip, partitioned layout."""

from __future__ import annotations

import os

import pyarrow as pa
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
