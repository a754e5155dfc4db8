"""Idempotent, versioned Parquet sink for generic pipelines.

The reference has NO sinks — results are returned in memory
(``records.py:424-425``; SURVEY.md §2.3 "sinks: none"). At 100 TB a
sink must be (a) partitioned — never one giant file, (b) atomic — a
failed run leaves the previous version readable and no partial version
visible, (c) resumable — rerunning lands in a fresh staging dir.

Layout::

    <root>/v{N}/part-*.parquet       immutable data files of version N
    <root>/_staging/<run_id>/        in-flight writes (invisible)
    <root>/_manifest.json            {"version": N, "dir": "vN", "files": [...]} — the commit

The manifest flip (``os.replace`` of a temp file) is the only commit
point; readers resolve the manifest first, so they never observe a
half-written version. The same discipline as the CDC lake manifest
(``cdc/manifest.py``), minus per-partition lineage.
"""

from __future__ import annotations

import json
import os
import uuid

import ray.data as rd


def write_versioned(
    ds: rd.Dataset,
    root: str,
    *,
    partition_cols: list[str] | None = None,
    run_id: str | None = None,
    **write_kwargs,
) -> dict:
    """Write ``ds`` as the next version of ``root``; returns the manifest."""
    os.makedirs(root, exist_ok=True)
    prev = read_manifest(root)
    version = (prev["version"] + 1) if prev else 1
    run_id = run_id or uuid.uuid4().hex[:12]
    staging = os.path.join(root, "_staging", run_id)
    os.makedirs(staging, exist_ok=True)

    if partition_cols:
        ds.write_parquet(staging, partition_cols=partition_cols, **write_kwargs)
    else:
        ds.write_parquet(staging, **write_kwargs)

    final_dir = os.path.join(root, f"v{version}")
    os.replace(staging, final_dir)

    files = sorted(
        os.path.relpath(os.path.join(dp, f), final_dir)
        for dp, _, fs in os.walk(final_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    manifest = {"version": version, "dir": f"v{version}", "files": files}
    tmp = os.path.join(root, f"_manifest.json.tmp-{run_id}")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(root, "_manifest.json"))  # the commit
    return manifest


def read_manifest(root: str) -> dict | None:
    p = os.path.join(root, "_manifest.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def read_versioned(root: str, **read_kwargs) -> rd.Dataset:
    """Read the committed version as a streaming Dataset."""
    manifest = read_manifest(root)
    if manifest is None:
        raise FileNotFoundError(f"no committed version under {root}")
    base = os.path.join(root, manifest["dir"])
    return rd.read_parquet(
        [os.path.join(base, f) for f in manifest["files"]], **read_kwargs
    )
