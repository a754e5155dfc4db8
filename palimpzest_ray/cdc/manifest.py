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
A merge-on-read apply (``apply_changes(mode="delta")``) goes further:
touched partitions append a small delta file
(``data/v{N}/part-{P:05d}-delta.parquet``) to their entry's ``deltas``
chain instead of rewriting the base, so apply cost is proportional to
the CHANGES, not the lake; readers LWW-resolve base+chain per key and
compaction (``compact_deltas`` / ``auto_compact``) folds chains back
into a single base file.

The manifest doubles as per-partition lineage: applied-LSN watermark,
rows, rows_upserted, rows_deleted per partition (north-rule metrics).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time as _time

import pyarrow as pa

from palimpzest_ray.schemas import schema_from_json, schema_to_json


@dataclasses.dataclass
class PartEntry:
    file: str  # lake-root-relative path (the partition's BASE file)
    max_lsn: int
    rows: int
    rows_upserted: int = 0
    rows_deleted: int = 0
    tombstones: int = 0  # persisted delete markers (excluded from rows)
    # merge-on-read delta chain, oldest -> newest (lake-root-relative).
    # A delta apply appends a file of LWW-collapsed change rows here
    # instead of rewriting the base; readers resolve base+deltas by
    # (_lsn desc, chain position desc) per key. ``rows``/``tombstones``
    # always describe the EFFECTIVE resolved state, not the base file.
    deltas: list[str] = dataclasses.field(default_factory=list)
    # manifest-level zone map: {column: [min, max]} over the partition's
    # scalar columns (int/float/string/bool; non-null values), computed
    # at write time. Lets ``final_state(predicate=...)`` prune whole
    # partitions on the DRIVER with zero parquet-footer round trips —
    # at 1e5 files on object storage, footer reads ARE the scan cost.
    # None = unknown (pre-stats manifest); a column absent from the
    # dict is also unknown (all-null, non-scalar, or pre-evolution) —
    # both fall back to footer-level pruning, never to a wrong skip.
    col_stats: dict | None = None


@dataclasses.dataclass
class LakeManifest:
    version: int
    num_partitions: int
    schema: pa.Schema
    parts: dict[int, PartEntry]
    # the lake's identity contract: LWW key and (optional) partition
    # routing column — persisted so later applies / repartition cannot
    # silently run with mismatched keys (pre-field manifests default)
    key: str = "doc_id"
    partition_key: str | None = None
    # composite-key lakes: the component columns `key` was synthesized
    # from (cdc.keys encoding); None on single-column-key lakes
    key_cols: tuple[str, ...] | None = None
    # persistent table constraints (Delta ADD CONSTRAINT analog):
    # name -> predicate in the expectations mini-language
    # [("col", op, value), ...]; enforced on every apply
    constraints: dict | None = None
    # generated columns (Delta GENERATED ALWAYS AS analog): column
    # name -> cdc.expr JSON expression, recomputed on every apply
    generated: dict | None = None
    # commit wall-clock (epoch seconds), written INTO the manifest so
    # TIMESTAMP-AS-OF survives copies/rsync where mtimes do not; None
    # on pre-field manifests (readers fall back to file mtime)
    committed_at: float | None = None
    # producer transaction watermarks (Delta txnAppId/txnVersion):
    # app_id -> highest producer version applied; a replayed batch at
    # or below its watermark no-ops — exactly-once for NON-idempotent
    # (accumulate) feeds under producer retries
    app_versions: dict | None = None
    # rename-without-rewrite (Delta column-mapping analog): flattened
    # {historical_physical_name: current_logical_name}. Data files
    # written before an `alter_schema(rename=...)` keep their old
    # column names on disk; every read maps them to the current
    # logical names (schemas.rename_to_logical), and compaction /
    # rewrite materializes the logical name physically. Historical
    # names stay reserved: re-adding one as a fresh column is refused.
    renames: dict | None = None

    @property
    def max_lsn(self) -> int:
        return max((e.max_lsn for e in self.parts.values()), default=0)

    def data_files(self, lake_root: str) -> list[str]:
        """Every data file this version references: each partition's
        base file plus its merge-on-read delta chain (vacuum-referenced
        set, size advisor input)."""
        out: list[str] = []
        for p in sorted(self.parts):
            e = self.parts[p]
            out.append(os.path.join(lake_root, e.file))
            out.extend(os.path.join(lake_root, d) for d in e.deltas)
        return out

    def chain(self, lake_root: str, part: int) -> list[str]:
        """One partition's read chain in resolution order: base first,
        then deltas oldest -> newest (later position wins LWW ties)."""
        e = self.parts[part]
        return [os.path.join(lake_root, e.file)] + [
            os.path.join(lake_root, d) for d in e.deltas
        ]

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "num_partitions": self.num_partitions,
                "key": self.key,
                "partition_key": self.partition_key,
                "key_cols": list(self.key_cols) if self.key_cols else None,
                "constraints": self.constraints or None,
                "generated": self.generated or None,
                "committed_at": self.committed_at,
                "app_versions": self.app_versions or None,
                "renames": self.renames or None,
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
            key=d.get("key", "doc_id"),
            partition_key=d.get("partition_key"),
            key_cols=tuple(d["key_cols"]) if d.get("key_cols") else None,
            constraints={
                # conjunct lists round-trip as tuples; {"expr": ...}
                # CHECK expressions stay verbatim JSON
                n: pred if isinstance(pred, dict) else [tuple(p) for p in pred]
                for n, pred in d["constraints"].items()
            }
            if d.get("constraints")
            else None,
            generated=d.get("generated") or None,
            committed_at=d.get("committed_at"),
            app_versions=d.get("app_versions") or None,
            renames=d.get("renames") or None,
        )


def merge_col_stats(base: dict | None, delta: dict | None) -> dict | None:
    """Union two partition zone maps (a delta append widens the chain's
    ranges, never narrows them). ``None`` on either side means unknown
    → unknown. A column present on only one side keeps that side's
    range: the other side holds no non-null values for it.
    """
    if base is None or delta is None:
        return None
    out = {k: list(v) for k, v in base.items()}
    for k, (lo, hi) in delta.items():
        if k in out:
            out[k] = [min(out[k][0], lo), max(out[k][1], hi)]
        else:
            out[k] = [lo, hi]
    return out


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
    return load_manifest(lake_root, version)


def load_manifest(lake_root: str, version: int) -> LakeManifest:
    """Load a specific committed version (time travel) — any version
    :func:`vacuum` has not yet dropped."""
    path = os.path.join(lake_root, f"MANIFEST-v{version}.json")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"version {version} not found under {lake_root} (vacuumed or never committed)"
        )
    with open(path) as f:
        return LakeManifest.from_json(f.read())


@dataclasses.dataclass
class VacuumResult:
    versions_dropped: list[int]
    files_deleted: int
    bytes_reclaimed: int
    staging_runs_cleaned: int


def vacuum(
    lake_root: str,
    keep_versions: int = 2,
    clean_staging: bool = True,
    staging_grace_s: float = 3600.0,
    keep_hours: float | None = None,
) -> VacuumResult:
    """Retention cleanup: drop manifests older than the last
    ``keep_versions`` and delete data files no retained manifest
    references. Because untouched partitions carry forward by reference,
    a file under ``data/v{old}/`` may still back the LATEST version —
    referenced-set subtraction, never directory age, decides deletion.

    ``keep_hours`` adds TIME-based retention (the Delta
    ``RETAIN n HOURS`` idea, off the authoritative ``committed_at``
    stamps, not file mtimes): every version committed within the window
    is ALSO retained, however many that is — so ``keep_versions=1,
    keep_hours=168`` keeps the head plus a week of time travel, and a
    burst of commits cannot age history out early. The two floors
    union; neither ever drops the head.

    Durable subscriptions (``cdc.subs``) add a third floor: every
    version at or above the OLDEST cursor is retained, so a slow
    consumer can always still poll its feed — the Kafka
    retention-vs-consumer-lag contract. ``subscription_lag`` names the
    laggard; drop or advance it to release retention.

    ``clean_staging`` removes staging run dirs that hold no parquet
    anywhere (completed runs leave only sidecars after their files were
    promoted — fs-exchange spill checkpoints under ``exchange/`` count
    as parquet and are kept) and are older than ``staging_grace_s``
    (don't delete a just-started live run's staging from under it);
    incomplete runs keep their staging for resume.

    Driver-side metadata operation (file renames/unlinks only — no data
    pass), safe to run concurrently with readers of retained versions;
    never runs while an ``apply_changes`` is mid-commit on the same lake.
    """
    latest = load_latest_manifest(lake_root)
    if latest is None:
        return VacuumResult([], 0, 0, 0)
    keep = max(1, keep_versions)
    lo = latest.version - keep + 1  # retain versions [lo, latest]
    if keep_hours is not None:
        import time as _time

        cutoff = _time.time() - keep_hours * 3600.0
        v = latest.version
        while v >= 1:
            # walk back while versions are still inside the window
            # (an already-vacuumed gap ends the walk — commits are
            # time-ordered, so nothing older can be in the window)
            try:
                if commit_time(lake_root, v) < cutoff:
                    break
            except FileNotFoundError:
                break
            lo = min(lo, v)
            v -= 1
    from palimpzest_ray.cdc.subs import min_subscription_version

    sub_floor = min_subscription_version(lake_root)
    if sub_floor is not None:
        lo = min(lo, sub_floor)
    tag_floor = min_tag_version(lake_root)
    if tag_floor is not None:
        lo = min(lo, tag_floor)
    referenced: set[str] = set()
    # staged (write-audit-publish) manifests live ABOVE LATEST until
    # published — their files must survive a vacuum run mid-audit.
    # Only MARKED versions count: unmarked above-LATEST manifests are
    # rollback debris whose files are fair game.
    staged = [
        v
        for f in os.listdir(lake_root)
        if f.startswith(".staged-v")
        and (v := int(f[len(".staged-v"):])) > latest.version
    ]
    for v in list(range(max(1, lo), latest.version + 1)) + staged:
        p = os.path.join(lake_root, f"MANIFEST-v{v}.json")
        if os.path.exists(p):
            with open(p) as f:
                m = LakeManifest.from_json(f.read())
            for e in m.parts.values():
                referenced.add(os.path.normpath(e.file))
                referenced.update(os.path.normpath(d) for d in e.deltas)
    # zero-copy branches pin parent files their manifests still
    # reference — a branch head may point at a file no retained parent
    # manifest does (the fork predates the retention window)
    from palimpzest_ray.cdc.branch import branch_referenced_files

    referenced |= branch_referenced_files(lake_root)

    files_deleted = bytes_reclaimed = 0
    data_root = os.path.join(lake_root, "data")
    if os.path.isdir(data_root):
        for vdir in sorted(os.listdir(data_root)):
            full_vdir = os.path.join(data_root, vdir)
            for fn in os.listdir(full_vdir):
                rel = os.path.normpath(os.path.join("data", vdir, fn))
                # a .bloom sidecar lives and dies with its data file
                stem = rel[: -len(".bloom")] if rel.endswith(".bloom") else rel
                if stem not in referenced:
                    fp = os.path.join(lake_root, rel)
                    bytes_reclaimed += os.path.getsize(fp)
                    os.unlink(fp)
                    files_deleted += 1
            if not os.listdir(full_vdir):
                os.rmdir(full_vdir)

    dropped = []
    # above-LATEST manifests without a staged marker are rollback
    # debris (restore_version) whose files were just reclaimed — drop
    # the manifests too so time travel can't point at deleted files
    debris = [
        v
        for f in os.listdir(lake_root)
        if f.startswith("MANIFEST-v") and f.endswith(".json")
        and (v := int(f[len("MANIFEST-v"):-len(".json")])) > latest.version
        and v not in staged
    ]
    for v in list(range(1, max(1, lo))) + debris:
        p = os.path.join(lake_root, f"MANIFEST-v{v}.json")
        if os.path.exists(p):
            os.unlink(p)
            dropped.append(v)

    cleaned = 0
    staging_root = os.path.join(lake_root, ".staging")
    if clean_staging and os.path.isdir(staging_root):
        import shutil
        import time

        for run in os.listdir(staging_root):
            rd_dir = os.path.join(staging_root, run)
            # A run dir is only garbage when it holds no parquet
            # ANYWHERE (fs-exchange spills live under exchange/__part=*/
            # and are a resume checkpoint) AND it is old enough that a
            # live apply can't be mid-flight in it.
            has_parquet = any(
                f.endswith(".parquet")
                for _, _, fs in os.walk(rd_dir)
                for f in fs
            )
            age_s = time.time() - os.path.getmtime(rd_dir)
            if not has_parquet and age_s > staging_grace_s:
                shutil.rmtree(rd_dir)
                cleaned += 1
    return VacuumResult(dropped, files_deleted, bytes_reclaimed, cleaned)


def find_orphans(lake_root: str) -> dict:
    """Read-only inverse of :func:`vacuum`'s referenced-set
    subtraction: data files on disk that NO retained manifest, staged
    (write-audit-publish) version or branch references — debris from
    crashed stagings, manual copies, or versions vacuum already
    dropped. Lists, never deletes (``vacuum`` is the reclaimer);
    driver-side metadata walk, no Ray session, no data read."""
    latest = load_latest_manifest(lake_root)
    if latest is None:
        return {"orphans": [], "bytes": 0, "files_referenced": 0}
    referenced: set[str] = set()
    for f in os.listdir(lake_root):
        if f.startswith("MANIFEST-v") and f.endswith(".json"):
            with open(os.path.join(lake_root, f)) as fh:
                m = LakeManifest.from_json(fh.read())
            for e in m.parts.values():
                referenced.add(os.path.normpath(e.file))
                referenced.update(os.path.normpath(d) for d in e.deltas)
    from palimpzest_ray.cdc.branch import branch_referenced_files

    referenced |= branch_referenced_files(lake_root)
    orphans: list[str] = []
    nbytes = 0
    data_root = os.path.join(lake_root, "data")
    if os.path.isdir(data_root):
        for vdir in sorted(os.listdir(data_root)):
            for fn in sorted(os.listdir(os.path.join(data_root, vdir))):
                rel = os.path.normpath(os.path.join("data", vdir, fn))
                stem = rel[: -len(".bloom")] if rel.endswith(".bloom") else rel
                if stem not in referenced:
                    orphans.append(rel)
                    nbytes += os.path.getsize(os.path.join(lake_root, rel))
    return {
        "orphans": orphans,
        "bytes": nbytes,
        "files_referenced": len(referenced),
    }


class ConcurrentCommitError(RuntimeError):
    """Another writer committed a version between this run's read of
    LATEST and its commit. Nothing was written; re-run the apply against
    the new base (LWW makes re-application idempotent)."""


#: sentinel: commit_version carries the head's constraints forward by
#: default; only the constraint DDL paths pass an explicit value
_CARRY = object()


def _fold_txn(
    head_versions: dict | None, txn: tuple[str, int] | None
) -> dict | None:
    """Merge this commit's producer txn into the HEAD's watermarks —
    under the commit lock, so two racing producers cannot both record
    the same (app, version). A stale txn raises: the caller's retry
    re-enters apply_changes, which no-ops at its own watermark check."""
    out = dict(head_versions or {})
    if txn is not None:
        app, ver = txn
        prev = out.get(app)
        if prev is not None and int(prev) >= int(ver):
            raise ConcurrentCommitError(
                f"producer txn ({app!r}, {ver}) already applied "
                f"(watermark {prev}) — a concurrent retry won the race; "
                "re-running the apply converges as a no-op"
            )
        out[app] = int(ver)
    return out or None


def commit_version(
    lake_root: str,
    staging_dir: str,
    new_parts: dict[int, PartEntry],
    carried: dict[int, PartEntry],
    num_partitions: int,
    schema: pa.Schema,
    prev_version: int,
    key: str = "doc_id",
    partition_key: str | None = None,
    delta_parts: dict[int, PartEntry] | None = None,
    allow_rebase: bool = False,
    publish: bool = True,
    key_cols: tuple[str, ...] | None = None,
    constraints: "dict | None | object" = _CARRY,
    generated: "dict | None | object" = _CARRY,
    txn: tuple[str, int] | None = None,
    renames: "dict | None | object" = _CARRY,
) -> LakeManifest:
    """Promote staged partition files to version ``prev_version + 1`` and
    atomically flip ``LATEST``. ``new_parts`` entries have ``file`` set to
    their staging filename; carried entries keep their old paths.

    ``publish=False`` is the write half of write-audit-publish: the
    version's data files are promoted and its manifest written, but
    ``LATEST`` does not move — readers of the head never see it, while
    auditors read it explicitly via ``version=``. Exactly one staged
    version may exist at a time (it holds the ``LATEST+1`` slot; any
    concurrent commit raises :class:`ConcurrentCommitError` until it is
    published or discarded — see :func:`publish_version` /
    :func:`discard_version`), which is what keeps publish a pure
    pointer flip: the staged version's planned base IS the head.

    ``delta_parts`` entries are merge-on-read appends: the staged file
    is promoted as ``part-{p}-delta.parquet`` and APPENDED to the
    partition's existing chain (base file carried by reference) —
    unless the partition has no prior entry, in which case the staged
    file simply becomes the base. Entry stats (rows/tombstones/
    counters) were computed against the effective resolved state by
    the merge worker and are adopted as-is; ``max_lsn`` advances
    monotonically (never regresses the carried watermark).

    The compare-and-swap: commit runs under an exclusive ``flock`` on
    ``.commit.lock`` and re-reads LATEST inside it — if another writer
    advanced the lake since this run planned against ``prev_version``,
    raise :class:`ConcurrentCommitError` BEFORE touching anything (a
    blind flip would silently drop the other writer's merge, since both
    runs carried forward partitions from the same base).

    ``allow_rebase``: Iceberg-style optimistic rebase for DISJOINT
    concurrent writers. When the lake advanced but every staged
    partition's entry (base file + delta chain) is bit-identical
    between the version this run planned against and the current head
    — i.e. the other writer(s) touched only OTHER partitions — the
    commit replays on top of the head instead of failing: carried
    partitions come from the head, schemas unify, the version is
    head+1. Any overlap (same partition touched, a re-bucket, a
    changed key contract) still raises; partition-local LWW merges
    commute across disjoint partitions, so the rebased state equals
    either serial order."""
    import fcntl

    from palimpzest_ray.schemas import INTERNAL_COLS
    from palimpzest_ray.schemas import unify as _unify

    lock_path = os.path.join(lake_root, ".commit.lock")
    with open(lock_path, "w") as lock:
        fcntl.flock(lock.fileno(), fcntl.LOCK_EX)
        current = load_latest_manifest(lake_root)
        current_version = current.version if current else 0
        if current_version != prev_version:
            staged = set(new_parts) | set(delta_parts or {})

            def _conflict(msg: str) -> ConcurrentCommitError:
                return ConcurrentCommitError(
                    f"lake advanced to v{current_version} while this run "
                    f"planned against v{prev_version}; {msg}"
                )

            if not allow_rebase or current is None:
                raise _conflict("re-run the apply against the new base")
            if current.num_partitions != num_partitions or (
                current.key,
                current.partition_key,
                current.key_cols,
            ) != (key, partition_key, tuple(key_cols) if key_cols else None):
                raise _conflict(
                    "layout/key contract changed underneath — re-run"
                )
            try:
                planned = (
                    load_manifest(lake_root, prev_version)
                    if prev_version > 0
                    else None
                )
            except FileNotFoundError:
                raise _conflict("planned base vacuumed mid-run — re-run")

            def _chain_of(m, p):
                e = (m.parts.get(p) if m is not None else None)
                return None if e is None else (e.file, tuple(e.deltas))

            moved = [
                p for p in staged
                if _chain_of(planned, p) != _chain_of(current, p)
            ]
            if moved:
                raise _conflict(
                    f"staged partition(s) {sorted(moved)[:5]} were also "
                    "changed by the other writer — re-run against the "
                    "new base"
                )
            # disjoint: rebase on top of the head. Unify USER columns
            # (head's first — stable order) and keep the internal
            # columns last, the lake-schema invariant every writer and
            # reader assumes.
            internal = [f for f in schema if f.name in INTERNAL_COLS]
            user_now = pa.schema(
                [f for f in current.schema if f.name not in INTERNAL_COLS]
            )
            user_mine = pa.schema(
                [f for f in schema if f.name not in INTERNAL_COLS]
            )
            schema = pa.schema(list(_unify(user_now, user_mine)) + internal)
            carried = {p: e for p, e in current.parts.items() if p not in staged}
            prev_version = current_version
        version = prev_version + 1
        if os.path.exists(_staged_marker(lake_root, version)):
            # an unpublished write-audit-publish commit holds this slot.
            # (An above-LATEST manifest WITHOUT a marker is rollback
            # debris — LATEST rewound by hand — and is overwritten.)
            raise ConcurrentCommitError(
                f"staged (unpublished) version v{version} exists on "
                f"{lake_root}; publish_version or discard_version it "
                "before committing"
            )
        data_dir = os.path.join(lake_root, "data", f"v{version}")
        os.makedirs(data_dir, exist_ok=True)

        def _promote(src: str, dst: str) -> None:
            # a staged data file travels with its optional key-Bloom
            # sidecar (<file>.bloom) — same atomic rename discipline
            os.replace(src, dst)
            if os.path.exists(src + ".bloom"):
                os.replace(src + ".bloom", dst + ".bloom")

        parts: dict[int, PartEntry] = dict(carried)
        for p, entry in new_parts.items():
            src = os.path.join(staging_dir, entry.file)
            rel = os.path.join("data", f"v{version}", f"part-{p:05d}.parquet")
            _promote(src, os.path.join(lake_root, rel))
            # a full rewrite supersedes the whole chain
            parts[p] = dataclasses.replace(entry, file=rel, deltas=[])
        for p, entry in (delta_parts or {}).items():
            src = os.path.join(staging_dir, entry.file)
            base = (current.parts.get(p) if current else None)
            if base is None:
                # first data for this partition: the "delta" IS the base
                rel = os.path.join("data", f"v{version}", f"part-{p:05d}.parquet")
                _promote(src, os.path.join(lake_root, rel))
                parts[p] = dataclasses.replace(entry, file=rel, deltas=[])
            else:
                rel = os.path.join(
                    "data", f"v{version}", f"part-{p:05d}-delta.parquet"
                )
                _promote(src, os.path.join(lake_root, rel))
                parts[p] = dataclasses.replace(
                    entry,
                    file=base.file,
                    deltas=base.deltas + [rel],
                    max_lsn=max(base.max_lsn, entry.max_lsn),
                    col_stats=merge_col_stats(base.col_stats, entry.col_stats),
                )
        manifest = LakeManifest(
            version=version, num_partitions=num_partitions, schema=schema,
            parts=parts, key=key, partition_key=partition_key,
            key_cols=tuple(key_cols) if key_cols else None,
            constraints=(
                (current.constraints if current else None)
                if constraints is _CARRY
                else constraints
            ),
            generated=(
                (current.generated if current else None)
                if generated is _CARRY
                else generated
            ),
            committed_at=_time.time(),
            app_versions=_fold_txn(
                current.app_versions if current else None, txn
            ),
            renames=(
                (current.renames if current else None)
                if renames is _CARRY
                else renames
            ),
        )
        _atomic_write(
            os.path.join(lake_root, f"MANIFEST-v{version}.json"), manifest.to_json()
        )
        if publish:
            _atomic_write(os.path.join(lake_root, "LATEST"), str(version))
        else:
            _atomic_write(_staged_marker(lake_root, version), "staged")
    return manifest


def _staged_marker(lake_root: str, version: int) -> str:
    """Marker distinguishing a staged write-audit-publish version from
    rollback debris (an above-LATEST manifest left by rewinding LATEST,
    which a new commit legitimately overwrites)."""
    return os.path.join(lake_root, f".staged-v{version}")


def publish_version(lake_root: str, version: int) -> LakeManifest:
    """Publish a staged (write-audit-publish) version: flip ``LATEST``
    to it. A pure pointer flip — the staged commit already holds the
    ``head+1`` slot and blocked every other writer, so its planned base
    is still the head; nothing can have moved underneath it."""
    import fcntl

    with open(os.path.join(lake_root, ".commit.lock"), "w") as lock:
        fcntl.flock(lock.fileno(), fcntl.LOCK_EX)
        current = load_latest_manifest(lake_root)
        head = current.version if current else 0
        if version != head + 1:
            raise ConcurrentCommitError(
                f"cannot publish v{version}: head is v{head} "
                f"(staged versions publish in order, head+1 first)"
            )
        m = load_manifest(lake_root, version)  # must exist
        _atomic_write(os.path.join(lake_root, "LATEST"), str(version))
        try:  # absent if the stage crashed between manifest and marker
            os.unlink(_staged_marker(lake_root, version))
        except FileNotFoundError:
            pass
    return m


def restore_version(lake_root: str, version: int) -> LakeManifest:
    """Delta-RESTORE-style rollback: point ``LATEST`` back at a retained
    older version. Pure pointer flip — no data moves; versions above the
    restore point become rollback debris that the next commit overwrites
    (and vacuum's referenced-set subtraction reclaims). Refuses if the
    target manifest was vacuumed or a staged (write-audit-publish)
    version exists (publish or discard it first — restoring underneath
    an audit would silently invalidate its planned base)."""
    import fcntl

    with open(os.path.join(lake_root, ".commit.lock"), "w") as lock:
        fcntl.flock(lock.fileno(), fcntl.LOCK_EX)
        current = load_latest_manifest(lake_root)
        head = current.version if current else 0
        if version > head:
            raise ValueError(
                f"cannot restore forward: v{version} is above head v{head}"
            )
        staged = [f for f in os.listdir(lake_root) if f.startswith(".staged-v")]
        if staged:
            raise ConcurrentCommitError(
                f"staged version(s) {staged} exist; publish or discard "
                "before restoring"
            )
        m = load_manifest(lake_root, version)  # raises if vacuumed
        _atomic_write(os.path.join(lake_root, "LATEST"), str(version))
    return m


def discard_version(lake_root: str, version: int) -> None:
    """Abandon a staged (unpublished) version: delete its manifest and
    every data file that ONLY it references (carried-by-reference files
    belong to published versions and stay). Refuses to touch anything
    at or below ``LATEST``."""
    import fcntl
    import shutil

    with open(os.path.join(lake_root, ".commit.lock"), "w") as lock:
        fcntl.flock(lock.fileno(), fcntl.LOCK_EX)
        current = load_latest_manifest(lake_root)
        head = current.version if current else 0
        if version <= head:
            raise ValueError(
                f"v{version} is published (head v{head}); use vacuum for "
                "retention, not discard_version"
            )
        mpath = os.path.join(lake_root, f"MANIFEST-v{version}.json")
        if not os.path.exists(_staged_marker(lake_root, version)):
            raise FileNotFoundError(
                f"v{version} is not a staged version (no marker); "
                "rollback debris is reclaimed by overwrite, not discard"
            )
        if os.path.exists(mpath):
            os.unlink(mpath)
        os.unlink(_staged_marker(lake_root, version))
        # the staged version's own data dir holds exactly the files no
        # published manifest can reference (promotion is per-version)
        shutil.rmtree(
            os.path.join(lake_root, "data", f"v{version}"), ignore_errors=True
        )
        q = os.path.join(lake_root, "_quarantine", f"v{version:06d}.parquet")
        if os.path.exists(q):
            os.unlink(q)


def commit_time(lake_root: str, version: int) -> float:
    """Wall-clock commit time of a retained version: the manifest's
    own ``committed_at`` where present (survives copies), else the
    manifest file's mtime (pre-field manifests)."""
    m = load_manifest(lake_root, version)
    if m.committed_at is not None:
        return float(m.committed_at)
    return os.path.getmtime(
        os.path.join(lake_root, f"MANIFEST-v{version}.json")
    )


def version_as_of(lake_root: str, ts: float) -> int:
    """TIMESTAMP AS OF (the Delta idea): the newest retained version
    committed at or before ``ts`` (epoch seconds). O(retained
    versions) manifest reads, zero data I/O. Raises if ``ts`` predates
    every retained version (vacuumed or before the lake existed)."""
    latest = load_latest_manifest(lake_root)
    if latest is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    best, best_t = None, None
    for f in os.listdir(lake_root):
        if f.startswith("MANIFEST-v") and f.endswith(".json"):
            v = int(f[len("MANIFEST-v"):-len(".json")])
            if v > latest.version:  # staged/debris above head excluded
                continue
            t = commit_time(lake_root, v)
            if t <= ts and (best is None or (t, v) > (best_t, best)):
                best, best_t = v, t
    if best is None:
        raise ValueError(
            f"no retained version committed at or before ts={ts} "
            f"(earliest retained commits later, or was vacuumed)"
        )
    return best


# --- version tags (Iceberg tags / named savepoints) ---------------------

_TAGS_DIR = "_tags"


def _tag_path(lake_root: str, name: str) -> str:
    if not name or "/" in name or name.startswith("."):
        raise ValueError(f"invalid tag name {name!r}")
    return os.path.join(lake_root, _TAGS_DIR, f"{name}.json")


def tag_version(
    lake_root: str,
    name: str,
    version: int | None = None,
    *,
    force: bool = False,
) -> dict:
    """Name a retained version (the Iceberg TAG idea): ``release-3``,
    ``pre-migration``, ``training-cut-08`` — a human handle readers
    resolve instead of a raw number. One tiny JSON file, no Ray
    session; ``vacuum`` retains every version at or above the OLDEST
    tag (same floor mechanism as subscriptions), so a tagged training
    cut cannot be aged out underneath a reproducibility claim.
    ``force=True`` moves an existing tag; by default re-tagging is
    refused (a savepoint that silently moves is worse than none)."""
    latest = load_latest_manifest(lake_root)
    if latest is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    v = latest.version if version is None else int(version)
    if v < 1 or v > latest.version:
        raise ValueError(
            f"version {v} outside retained range [1, {latest.version}]"
        )
    load_manifest(lake_root, v)  # must be retained
    p = _tag_path(lake_root, name)
    if os.path.exists(p) and not force:
        raise ValueError(
            f"tag {name!r} already exists (force=True to move it)"
        )
    os.makedirs(os.path.dirname(p), exist_ok=True)
    import time as _time

    tag = {"name": name, "version": v, "created_at": _time.time()}
    _atomic_write(p, json.dumps(tag))
    return tag


def resolve_tag(lake_root: str, name: str) -> int:
    p = _tag_path(lake_root, name)
    if not os.path.exists(p):
        raise FileNotFoundError(f"no tag {name!r} under {lake_root}")
    with open(p) as fh:
        return int(json.load(fh)["version"])


def drop_tag(lake_root: str, name: str) -> None:
    os.unlink(_tag_path(lake_root, name))


def list_tags(lake_root: str) -> dict[str, int]:
    d = os.path.join(lake_root, _TAGS_DIR)
    if not os.path.isdir(d):
        return {}
    out: dict[str, int] = {}
    for f in sorted(os.listdir(d)):
        if f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                t = json.load(fh)
            out[t["name"]] = int(t["version"])
    return out


def min_tag_version(lake_root: str) -> int | None:
    tags = list_tags(lake_root)
    return min(tags.values()) if tags else None


def lake_skew(
    lake_root: str, *, hot_threshold: float = 2.0
) -> dict:
    """Partition-balance inspector from manifest counters alone — zero
    data I/O, no Ray session. The operational question at 10^10 events
    is "did a hot key family pile into one bucket": per-partition LIVE
    row counts give min/p50/p99/max/mean, the coefficient of variation,
    the top-5 heaviest partitions, and a flag when the heaviest exceeds
    ``hot_threshold``× the mean — the signal to re-check the routing
    column (or salt it) and ``repartition_lake``. Delta-chain lengths
    are reported alongside (a long chain is compaction debt, not key
    skew — different remedy)."""
    m = load_latest_manifest(lake_root)
    if m is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    rows = {p: e.rows for p, e in m.parts.items()}
    chains = {p: len(e.deltas) for p, e in m.parts.items() if e.deltas}
    # partitions with no entry yet hold zero rows
    counts = [rows.get(p, 0) for p in range(m.num_partitions)]
    counts_sorted = sorted(counts)
    n = len(counts)
    total = sum(counts)
    mean = total / n if n else 0.0

    def _pct(q: float) -> int:
        if not counts_sorted:
            return 0
        i = min(n - 1, max(0, round(q * (n - 1))))
        return counts_sorted[int(i)]

    if n and mean > 0:
        var = sum((c - mean) ** 2 for c in counts) / n
        cv = (var ** 0.5) / mean
    else:
        cv = 0.0
    top = sorted(rows.items(), key=lambda kv: -kv[1])[:5]
    mx = counts_sorted[-1] if counts_sorted else 0
    return {
        "num_partitions": m.num_partitions,
        "rows_total": total,
        "rows_min": counts_sorted[0] if counts_sorted else 0,
        "rows_p50": _pct(0.50),
        "rows_p99": _pct(0.99),
        "rows_max": mx,
        "rows_mean": round(mean, 1),
        "cv": round(cv, 4),
        "hot_partitions": [
            {"part": p, "rows": r} for p, r in top if r > 0
        ],
        "skewed": bool(mean > 0 and mx > hot_threshold * mean),
        "delta_chain_partitions": len(chains),
        "max_delta_chain": max(chains.values()) if chains else 0,
    }


def lake_history(
    lake_root: str, *, limit: int | None = None
) -> list[dict]:
    """Delta-DESCRIBE-HISTORY analog: one summary row per RETAINED
    version, newest first, computed purely from manifests — O(retained
    versions) JSON reads, zero data I/O, no Ray session.

    Each row reports the version's effective state (``rows``,
    ``tombstones``, ``max_lsn``, ``num_partitions``, ``schema_cols``)
    plus its DELTA against the previous retained version:
    ``parts_changed`` (entries whose base+chain identity moved) and
    ``rows_upserted`` / ``rows_deleted`` summed over exactly those
    changed entries — carried-by-reference partitions keep their old
    counters, so summing over changed entries recovers the per-commit
    numbers the apply reported. The earliest retained version has no
    predecessor: its delta fields are reported against an empty lake
    (every partition "changed"), honest for v1 and a lower-bound note
    for a vacuumed-ahead-of window. ``wall_time`` is the manifest
    file's mtime (commit time on this filesystem).

    ``limit`` returns only the newest N rows (still one manifest read
    per returned row plus one for each row's predecessor)."""
    latest = load_latest_manifest(lake_root)
    if latest is None:
        return []
    versions = []
    for f in os.listdir(lake_root):
        if f.startswith("MANIFEST-v") and f.endswith(".json"):
            v = int(f[len("MANIFEST-v"):-len(".json")])
            if v <= latest.version:  # staged/debris above head excluded
                versions.append(v)
    versions.sort(reverse=True)
    if limit is not None:
        versions = versions[: limit + 1]  # +1: predecessors for deltas

    manifests = {v: load_manifest(lake_root, v) for v in versions}
    out: list[dict] = []
    for i, v in enumerate(versions):
        if limit is not None and i >= limit:
            break
        m = manifests[v]
        prev = manifests.get(v - 1)  # None for v1 or vacuumed-below

        def _sig(mm, p):
            e = None if mm is None else mm.parts.get(p)
            return None if e is None else (e.file, tuple(e.deltas))

        changed = [
            p for p in m.parts if _sig(m, p) != _sig(prev, p)
        ]
        out.append(
            {
                "version": v,
                "rows": int(sum(e.rows for e in m.parts.values())),
                "tombstones": int(
                    sum(e.tombstones for e in m.parts.values())
                ),
                "max_lsn": int(m.max_lsn),
                "num_partitions": m.num_partitions,
                "schema_cols": len(m.schema.names),
                "parts_changed": len(changed),
                "rows_upserted": int(
                    sum(m.parts[p].rows_upserted for p in changed)
                ),
                "rows_deleted": int(
                    sum(m.parts[p].rows_deleted for p in changed)
                ),
                "wall_time": (
                    float(m.committed_at)
                    if m.committed_at is not None
                    else os.path.getmtime(
                        os.path.join(lake_root, f"MANIFEST-v{v}.json")
                    )
                ),
            }
        )
    return out
