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


def _next_version(root: str) -> int:
    """Next version number, trusting BOTH the manifest and the
    filesystem: a crash between the ``os.replace(staging, vN)`` flip and
    the manifest write leaves a committed-looking ``vN`` directory with
    no manifest row — a rerun that trusted the manifest alone would pick
    version N again and ``os.replace`` onto the non-empty dir (ENOTEMPTY,
    unrecoverable without manual cleanup). Scanning ``v*`` dirs makes the
    rerun land on N+1; the stale un-manifested dir is harmless garbage."""
    import re

    prev = read_manifest(root)
    base = prev["version"] if prev else 0
    for d in os.listdir(root):
        m = re.fullmatch(r"v(\d+)", d)
        if m:
            base = max(base, int(m.group(1)))
    return base + 1


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
    version = _next_version(root)
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


def _partition_key(value) -> str:
    """Path-safe directory name for a partition value."""
    import re

    s = "NULL" if value is None else str(value)
    safe = re.sub(r"[^A-Za-z0-9_.=-]", "_", s)[:80]
    import hashlib

    return f"{safe}-{hashlib.sha1(s.encode()).hexdigest()[:8]}"


def write_partitioned_resumable(
    ds: rd.Dataset,
    root: str,
    partition_col: str,
    *,
    run_id: str,
    fail_keys: tuple = (),
    **write_kwargs,
) -> dict:
    """Per-partition RESUMABLE write: one directory per distinct
    ``partition_col`` value, each committed with its own ``.done``
    sidecar the moment it finishes — a rerun with the same ``run_id``
    skips finished partitions BEFORE the shuffle (their rows never
    leave the scan) and only re-writes the stragglers. The version
    flip at the end is the single atomic commit, exactly as
    :func:`write_versioned`. This is the relational-layer twin of the
    CDC lake's sidecar resume (``cdc/engine.py``).

    ``fail_keys`` is a test hook: raise while writing those partitions.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(root, exist_ok=True)
    staging = os.path.join(root, "_staging", run_id)
    os.makedirs(staging, exist_ok=True)
    done = {
        d
        for d in os.listdir(staging)
        if os.path.exists(os.path.join(staging, d, ".done"))
    }

    if done:  # prune finished partitions at the read — no wasted shuffle
        def _prune(batch: pa.Table) -> pa.Table:
            keys = pa.array(
                [_partition_key(v) for v in batch[partition_col].to_pylist()]
            )
            return batch.filter(pc.invert(pc.is_in(keys, value_set=pa.array(sorted(done)))))

        ds = ds.map_batches(_prune, batch_format="pyarrow")

    def _write(group: pa.Table) -> pa.Table:
        val = group[partition_col][0].as_py()
        key = _partition_key(val)
        if key in fail_keys:
            raise RuntimeError(f"injected failure for partition {key}")
        pdir = os.path.join(staging, key)
        os.makedirs(pdir, exist_ok=True)
        pq.write_table(group, os.path.join(pdir, "part-0.parquet"), **write_kwargs)
        with open(os.path.join(pdir, ".done"), "w") as f:
            f.write("ok")
        return pa.table({"partition": [key], "rows": [group.num_rows]})

    stats = ds.groupby(partition_col).map_groups(_write, batch_format="pyarrow").take_all()

    version = _next_version(root)
    final_dir = os.path.join(root, f"v{version}")
    os.replace(staging, final_dir)
    parts = sorted(
        d for d in os.listdir(final_dir)
        if os.path.exists(os.path.join(final_dir, d, ".done"))
    )
    manifest = {
        "version": version,
        "dir": f"v{version}",
        "partitions": parts,
        "files": [os.path.join(d, "part-0.parquet") for d in parts],
        "rows_written_this_run": sum(r["rows"] for r in stats),
    }
    tmp = os.path.join(root, "_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(root, "_manifest.json"))
    return manifest
