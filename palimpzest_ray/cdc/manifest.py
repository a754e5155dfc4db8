"""Versioned Parquet-lake manifest: exactly-once commit + checkpoint.

Lake layout::

    lake_root/
      data/v{N}/part-{P:05d}.parquet   # immutable data files per version
      MANIFEST-v{N}.json               # partition -> (file, max_lsn, stats)
      LATEST                           # atomic pointer: current version

Exactly-once protocol (SURVEY.md §7.5 item 1):

1. Workers write partition outputs to a per-run *staging* directory
   (``.staging/{run_id}/part-*.parquet``) with a ``.done.json`` sidecar
   recording the partition watermark — written via tmp-file +
   ``os.replace`` so a partition is either fully present or absent.
2. The driver moves staged files into ``data/v{N+1}/``, writes
   ``MANIFEST-v{N+1}.json``, then atomically flips ``LATEST``.
   A crash anywhere before the flip leaves the previous version intact;
   re-running resumes from the staging sidecars (checkpoint), and
   last-writer-wins makes any double-application idempotent.

Partitions untouched by a run carry forward by *reference* (their entry
points at the previous version's file) — only changed partitions are
rewritten, which is what makes incremental ingest cheap at 10^10 events.

The manifest doubles as per-partition lineage: applied-LSN watermark,
rows, rows_upserted, rows_deleted per partition (north-rule metrics).
"""

from __future__ import annotations

import dataclasses
import json
import os

import pyarrow as pa

from palimpzest_ray.schemas import schema_from_json, schema_to_json


@dataclasses.dataclass
class PartEntry:
    file: str  # lake-root-relative path
    max_lsn: int
    rows: int
    rows_upserted: int = 0
    rows_deleted: int = 0


@dataclasses.dataclass
class LakeManifest:
    version: int
    num_partitions: int
    schema: pa.Schema
    parts: dict[int, PartEntry]

    @property
    def max_lsn(self) -> int:
        return max((e.max_lsn for e in self.parts.values()), default=0)

    def data_files(self, lake_root: str) -> list[str]:
        return [os.path.join(lake_root, self.parts[p].file) for p in sorted(self.parts)]

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "num_partitions": self.num_partitions,
                "schema": schema_to_json(self.schema),
                "parts": {
                    str(p): dataclasses.asdict(e) for p, e in sorted(self.parts.items())
                },
            },
            indent=1,
        )

    @staticmethod
    def from_json(data: str) -> "LakeManifest":
        d = json.loads(data)
        return LakeManifest(
            version=d["version"],
            num_partitions=d["num_partitions"],
            schema=schema_from_json(d["schema"]),
            parts={int(p): PartEntry(**e) for p, e in d["parts"].items()},
        )


def _atomic_write(path: str, data: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def load_latest_manifest(lake_root: str) -> LakeManifest | None:
    ptr = os.path.join(lake_root, "LATEST")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        version = int(f.read().strip())
    with open(os.path.join(lake_root, f"MANIFEST-v{version}.json")) as f:
        return LakeManifest.from_json(f.read())


def commit_version(
    lake_root: str,
    staging_dir: str,
    new_parts: dict[int, PartEntry],
    carried: dict[int, PartEntry],
    num_partitions: int,
    schema: pa.Schema,
    prev_version: int,
) -> LakeManifest:
    """Promote staged partition files to version ``prev_version + 1`` and
    atomically flip ``LATEST``. ``new_parts`` entries have ``file`` set to
    their staging filename; carried entries keep their old paths."""
    version = prev_version + 1
    data_dir = os.path.join(lake_root, "data", f"v{version}")
    os.makedirs(data_dir, exist_ok=True)
    parts: dict[int, PartEntry] = dict(carried)
    for p, entry in new_parts.items():
        src = os.path.join(staging_dir, entry.file)
        rel = os.path.join("data", f"v{version}", f"part-{p:05d}.parquet")
        os.replace(src, os.path.join(lake_root, rel))
        parts[p] = dataclasses.replace(entry, file=rel)
    manifest = LakeManifest(
        version=version, num_partitions=num_partitions, schema=schema, parts=parts
    )
    _atomic_write(os.path.join(lake_root, f"MANIFEST-v{version}.json"), manifest.to_json())
    _atomic_write(os.path.join(lake_root, "LATEST"), str(version))
    return manifest
