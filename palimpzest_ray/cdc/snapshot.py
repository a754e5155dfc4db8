"""Snapshot publication and lake cloning.

Two lake-level primitives a 100-TB operator reaches for weekly:

- :func:`export_snapshot` — publish a committed version as PLAIN
  partitioned parquet (tombstones dropped, internal columns stripped,
  delta chains resolved) so engine-less consumers — a trainer reading
  with ``ray.data.read_parquet``, DuckDB, pandas — get a consistent
  point-in-time table without knowing anything about manifests.
- :func:`clone_lake` — a consistent, writable copy of a committed
  version as a NEW lake (fresh version 1), preserving chains, zone
  maps and watermarks. Backup/restore and the dev-fork workflow
  ("branch the lake, test the migration, throw it away").

Both are partition-parallel (one task per partition over Ray Data) and
idempotently re-runnable: exports stage through tmp+rename, clones copy
only manifest-referenced files.
"""

from __future__ import annotations

import json
import time as _time
import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from palimpzest_ray.cdc.engine import _read_chain, _resolve_chain
from palimpzest_ray.cdc.manifest import (
    LakeManifest,
    PartEntry,
    load_latest_manifest,
    load_manifest,
    _atomic_write,
)
from palimpzest_ray.functions.tokens import limit_kernel_threads
from palimpzest_ray.schemas import LSN_COL, TOMBSTONE_COL, schema_to_json

SNAPSHOT_META = "_SNAPSHOT.json"


def _manifest(lake_root: str, version: int | None) -> LakeManifest:
    m = (
        load_manifest(lake_root, version)
        if version is not None
        else load_latest_manifest(lake_root)
    )
    if m is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    return m


def export_snapshot(
    lake_root: str,
    out_dir: str,
    *,
    version: int | None = None,
    columns: list[str] | None = None,
    cluster_by: list[str] | None = None,
) -> dict:
    """Write a committed version as plain partitioned parquet.

    One task per partition resolves its base+delta chain, drops
    tombstones and the internal ``_lsn``/``_deleted`` columns, prunes
    to ``columns`` if given, and writes ``part-{p:05d}.parquet`` via
    tmp+rename — re-running an interrupted export converges to the same
    bytes (resolution is deterministic). A ``_SNAPSHOT.json`` manifest
    records provenance (source lake, version, key, row count) and is
    written LAST, so its presence marks a complete snapshot.

    ``cluster_by``: sort each exported partition by these columns
    before writing — the Delta-OPTIMIZE-style read layout: row-group
    min/max stats on the cluster columns become tight, so predicate
    scans of the snapshot skip most row groups. This lives HERE and
    not on the live lake because the merge contract owns base-file
    order (bases must stay key-sorted for chain resolution and
    streaming merges); a snapshot has no chains to resolve, so any
    serving order is safe.
    """
    m = _manifest(lake_root, version)
    os.makedirs(out_dir, exist_ok=True)
    key = m.key
    user_fields = [
        f for f in m.schema if f.name not in (LSN_COL, TOMBSTONE_COL)
    ]
    if columns is not None:
        want = set(columns)
        missing = want - {f.name for f in user_fields}
        if missing:
            raise ValueError(f"snapshot columns not in lake schema: {sorted(missing)}")
        user_fields = [f for f in user_fields if f.name in want]
    out_schema = pa.schema(user_fields)
    if cluster_by:
        bad = set(cluster_by) - {f.name for f in user_fields}
        if bad:
            raise ValueError(
                f"cluster_by columns not in the exported schema: {sorted(bad)}"
            )
    # resolution internals: key + lsn + tombstone always read
    read_cols = list(
        dict.fromkeys([f.name for f in user_fields] + [key, LSN_COL, TOMBSTONE_COL])
    )
    resolve_schema = pa.schema(
        [f for f in m.schema if f.name in read_cols]
    )
    chains = {p: m.chain(lake_root, p) for p in m.parts}
    out_json = schema_to_json(out_schema)
    renames = m.renames

    def _export(batch: pa.Table) -> pa.Table:
        limit_kernel_threads()
        from palimpzest_ray.schemas import conform, schema_from_json

        osch = schema_from_json(out_json)
        rows = []
        for p in batch["part"].to_pylist():
            r = _resolve_chain(
                _read_chain(chains[p], columns=read_cols, renames=renames),
                key,
                resolve_schema,
            )
            if TOMBSTONE_COL in r.column_names:
                r = r.filter(
                    pc.invert(pc.coalesce(r[TOMBSTONE_COL], pa.scalar(False)))
                )
            r = conform(r, osch)
            if cluster_by:
                r = r.sort_by([(c, "ascending") for c in cluster_by])
            fname = f"part-{p:05d}.parquet"
            tmp = os.path.join(out_dir, fname + f".tmp-{uuid.uuid4().hex[:8]}")
            pq.write_table(r, tmp, compression="snappy", row_group_size=64 * 1024)
            os.replace(tmp, os.path.join(out_dir, fname))
            rows.append({"part": int(p), "rows": int(r.num_rows), "file": fname})
        return pa.Table.from_pylist(rows)

    parts = sorted(m.parts)
    ids = rd.from_arrow(
        pa.table({"part": pa.array(parts, pa.int32())})
    ).repartition(max(1, len(parts)))
    lineage = ids.map_batches(
        _export, batch_format="pyarrow", batch_size=None
    ).take_all()
    meta = {
        "source_lake": os.path.abspath(lake_root),
        "source_version": m.version,
        "key": key,
        "num_partitions": m.num_partitions,
        "rows": int(sum(d["rows"] for d in lineage)),
        "files": sorted(d["file"] for d in lineage),
        "columns": [f.name for f in user_fields],
        "cluster_by": list(cluster_by) if cluster_by else [],
    }
    _atomic_write(os.path.join(out_dir, SNAPSHOT_META), json.dumps(meta, indent=1))
    return meta


def read_snapshot(out_dir: str, **read_kwargs) -> rd.Dataset:
    """Stream a published snapshot back (any parquet reader works; this
    is the Ray Data convenience, refusing incomplete exports)."""
    meta_path = os.path.join(out_dir, SNAPSHOT_META)
    if not os.path.exists(meta_path):
        raise FileNotFoundError(
            f"{out_dir} has no {SNAPSHOT_META} — export incomplete or not a snapshot"
        )
    with open(meta_path) as f:
        meta = json.load(f)
    files = [os.path.join(out_dir, fn) for fn in meta["files"]]
    return rd.read_parquet(files, **read_kwargs)


def clone_lake(
    src_root: str, dst_root: str, *, version: int | None = None
) -> LakeManifest:
    """Consistent writable copy of a committed version as a NEW lake.

    Copies exactly the files the source manifest references (base files
    plus delta chains, order preserved) into ``dst_root/data/v1/`` and
    writes a fresh version-1 manifest carrying over rows, tombstone
    counts, zone maps and per-partition watermarks — so a tail against
    the clone resumes from the same LSN. The clone is independent:
    applies to either lake never touch the other. Driver-side file
    copies here; on object storage this is a server-side copy per file,
    still no data pass through the engine.
    """
    m = _manifest(src_root, version)
    if os.path.exists(os.path.join(dst_root, "LATEST")):
        raise FileExistsError(f"{dst_root} is already a lake; refusing to overwrite")
    data_dir = os.path.join(dst_root, "data", "v1")
    os.makedirs(data_dir, exist_ok=True)

    def _copy(rel: str, new_name: str) -> str:
        dst_rel = os.path.join("data", "v1", new_name)
        shutil.copy2(os.path.join(src_root, rel), os.path.join(dst_root, dst_rel))
        # key-Bloom sidecar travels with its data file (optional)
        if os.path.exists(os.path.join(src_root, rel) + ".bloom"):
            shutil.copy2(
                os.path.join(src_root, rel) + ".bloom",
                os.path.join(dst_root, dst_rel) + ".bloom",
            )
        return dst_rel

    parts: dict[int, PartEntry] = {}
    for p, e in sorted(m.parts.items()):
        base_rel = _copy(e.file, f"part-{p:05d}.parquet")
        delta_rels = [
            _copy(d, f"part-{p:05d}-delta-{i}.parquet")
            for i, d in enumerate(e.deltas)
        ]
        parts[p] = PartEntry(
            file=base_rel,
            max_lsn=e.max_lsn,
            rows=e.rows,
            tombstones=e.tombstones,
            deltas=delta_rels,
            col_stats=e.col_stats,
        )
    clone = LakeManifest(
        version=1,
        num_partitions=m.num_partitions,
        schema=m.schema,
        parts=parts,
        key=m.key,
        partition_key=m.partition_key,
        key_cols=m.key_cols,
        constraints=m.constraints,
        generated=m.generated,
        renames=m.renames,
        committed_at=_time.time(),
    )
    _atomic_write(os.path.join(dst_root, "MANIFEST-v1.json"), clone.to_json())
    _atomic_write(os.path.join(dst_root, "LATEST"), "1")
    return clone
