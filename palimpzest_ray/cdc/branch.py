"""Zero-copy lake branches with three-way partition-level merge.

LakeFS/Nessie-style branching expressed in this lake's own terms: a
branch is a SUB-LAKE under ``<lake>/.branches/<name>/`` whose version-1
manifest references the parent's data files by relative path — no byte
is copied at branch time (contrast :func:`~.snapshot.clone_lake`, a
physical copy). Because the branch is a complete lake root, every
capability works on it unchanged and isolated: ``apply_changes``,
merge-on-read deltas, write-audit-publish, time travel, quarantine,
compaction — the branch's commits land under its OWN ``data/v{N}``
directories, never the parent's.

The dev-fork workflow this enables at 100 TB::

    b = create_branch(lake, "migration-test")     # O(partitions) metadata
    apply_changes(new_feed, b, ...)               # isolated experiment
    merge_branch(lake, "migration-test")          # publish, or
    delete_branch(lake, "migration-test")         # throw it away

Merge is a THREE-WAY, partition-granular reconciliation against the
fork-point manifest (snapshotted into the branch as ``FORK-BASE.json``
at create time, so merge never depends on parent retention):

- partition unchanged on the branch  → parent's current entry wins
- partition unchanged on the parent  → branch entry wins (its
  branch-local files are promoted into the parent's next version dir;
  files it still shares with the parent stay by reference)
- changed on BOTH                    → :class:`MergeConflict` — LWW
  replay does not commute once the same key range diverged on both
  sides, so the operator must re-apply one side's feed on top of the
  other (the same rule :func:`~.manifest.commit_version`'s
  ``allow_rebase`` enforces for concurrent writers)

Disjoint merges are safe for the same reason disjoint rebases are:
partition-local LWW merges commute across partitions, so the merged
state equals either serial application order. The merge commit runs
under the parent's commit lock, respects staged (write-audit-publish)
markers, and unifies user schemas (parent's column order first) so a
branch that evolved the schema merges like any other apply.

Parent ``vacuum`` protection: a branch references parent files the
parent's own retained manifests may stop referencing. ``vacuum`` calls
:func:`branch_referenced_files` so the referenced-set subtraction sees
them (see ``manifest.vacuum``); deleting a branch releases its pins.

Reference parity note: the reference engine has no lake/branch notion —
this is engine infrastructure the north rule's "resumable, exactly-once
lake" mandate implies once multiple feeds share one lake.
"""

from __future__ import annotations

import dataclasses
import json
import time as _time
import os
import shutil

import pyarrow as pa

from palimpzest_ray.cdc.manifest import (
    ConcurrentCommitError,
    LakeManifest,
    PartEntry,
    _atomic_write,
    load_latest_manifest,
    load_manifest,
)

BRANCHES_DIR = ".branches"
FORK_BASE = "FORK-BASE.json"


class MergeConflict(RuntimeError):
    """Both the parent and the branch changed the same partition(s)
    since the fork point. Partition-local LWW merges only commute when
    the two sides touched DISJOINT partitions; re-apply one side's
    change feed on top of the other instead of merging."""


def _branch_root(lake_root: str, name: str) -> str:
    if not name or "/" in name or name.startswith("."):
        raise ValueError(f"invalid branch name {name!r}")
    return os.path.join(lake_root, BRANCHES_DIR, name)


def create_branch(
    lake_root: str, name: str, *, version: int | None = None
) -> str:
    """Fork a committed version as a zero-copy branch; returns the
    branch root (a full lake root — pass it to any engine function).

    O(partitions) metadata: the branch's v1 manifest points every entry
    at the parent's files via relative paths; ``FORK-BASE.json`` pins
    the fork-point entry chains for the three-way merge."""
    src = (
        load_manifest(lake_root, version)
        if version is not None
        else load_latest_manifest(lake_root)
    )
    if src is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    root = _branch_root(lake_root, name)
    if os.path.exists(os.path.join(root, "LATEST")):
        raise FileExistsError(f"branch {name!r} already exists on {lake_root}")
    os.makedirs(root, exist_ok=True)
    # parent data seen from the branch root: ../../<rel>
    up = os.path.join("..", "..")
    parts = {
        p: dataclasses.replace(
            e,
            file=os.path.join(up, e.file),
            deltas=[os.path.join(up, d) for d in e.deltas],
        )
        for p, e in src.parts.items()
    }
    m = LakeManifest(
        version=1,
        num_partitions=src.num_partitions,
        schema=src.schema,
        parts=parts,
        key=src.key,
        partition_key=src.partition_key,
        key_cols=src.key_cols,
        constraints=src.constraints,
        generated=src.generated,
        renames=src.renames,
        committed_at=_time.time(),
    )
    _atomic_write(os.path.join(root, "MANIFEST-v1.json"), m.to_json())
    _atomic_write(
        os.path.join(root, FORK_BASE),
        json.dumps(
            {"fork_version": src.version, "manifest": src.to_json()}, indent=1
        ),
    )
    _atomic_write(os.path.join(root, "LATEST"), "1")
    return root


def list_branches(lake_root: str) -> list[str]:
    bdir = os.path.join(lake_root, BRANCHES_DIR)
    if not os.path.isdir(bdir):
        return []
    return sorted(
        n
        for n in os.listdir(bdir)
        if os.path.exists(os.path.join(bdir, n, "LATEST"))
    )


def delete_branch(lake_root: str, name: str) -> None:
    """Drop a branch: removes its metadata and its OWN data files (the
    parent files it referenced are merely un-pinned)."""
    root = _branch_root(lake_root, name)
    if not os.path.exists(os.path.join(root, "LATEST")):
        raise FileNotFoundError(f"no branch {name!r} on {lake_root}")
    shutil.rmtree(root)


def branch_referenced_files(lake_root: str) -> set[str]:
    """Parent-root-relative (normalized) paths of every parent data
    file ANY branch manifest still references — the set the parent's
    ``vacuum`` must treat as live. Walks branches recursively (a branch
    can itself have branches); each level contributes the references
    that resolve into THIS lake_root's data tree."""
    out: set[str] = set()
    bdir = os.path.join(lake_root, BRANCHES_DIR)
    if not os.path.isdir(bdir):
        return out
    for name in os.listdir(bdir):
        broot = os.path.join(bdir, name)
        if not os.path.isdir(broot):
            continue
        for fn in os.listdir(broot):
            if not (fn.startswith("MANIFEST-v") and fn.endswith(".json")):
                continue
            with open(os.path.join(broot, fn)) as f:
                m = LakeManifest.from_json(f.read())
            for e in m.parts.values():
                for rel in [e.file, *e.deltas]:
                    resolved = os.path.normpath(os.path.join(broot, rel))
                    parent_rel = os.path.relpath(resolved, lake_root)
                    if not parent_rel.startswith(".."):
                        out.add(os.path.normpath(parent_rel))
        # a sub-branch of this branch may reference files it shares
        # with THIS parent through two levels of ../..
        for rel in branch_referenced_files(broot):
            resolved = os.path.normpath(os.path.join(broot, rel))
            parent_rel = os.path.relpath(resolved, lake_root)
            if not parent_rel.startswith(".."):
                out.add(os.path.normpath(parent_rel))
    return out


def _chain_sig(m: LakeManifest | None, p: int, root: str, lake_root: str):
    """Partition chain identity as parent-root-normalized paths, so a
    branch entry that still points (via ../..) at the same parent files
    compares equal to the parent's own entry."""
    e = None if m is None else m.parts.get(p)
    if e is None:
        return None
    def _norm(rel: str) -> str:
        return os.path.normpath(
            os.path.relpath(os.path.normpath(os.path.join(root, rel)), lake_root)
        )
    return (_norm(e.file), tuple(_norm(d) for d in e.deltas))


def merge_branch(
    lake_root: str, name: str, *, delete: bool = False
) -> LakeManifest:
    """Three-way merge of a branch's head back into the parent as the
    parent's next version. Fast-forwards when the parent has not moved
    since the fork; otherwise reconciles partition-by-partition and
    raises :class:`MergeConflict` on any partition both sides changed.
    ``delete=True`` drops the branch after a successful merge."""
    import fcntl

    from palimpzest_ray.schemas import INTERNAL_COLS
    from palimpzest_ray.schemas import unify as _unify

    broot = _branch_root(lake_root, name)
    bhead = load_latest_manifest(broot)
    if bhead is None:
        raise FileNotFoundError(f"no branch {name!r} on {lake_root}")
    with open(os.path.join(broot, FORK_BASE)) as f:
        fork = LakeManifest.from_json(json.load(f)["manifest"])

    with open(os.path.join(lake_root, ".commit.lock"), "w") as lock:
        fcntl.flock(lock.fileno(), fcntl.LOCK_EX)
        head = load_latest_manifest(lake_root)
        if head is None:
            raise FileNotFoundError(f"no committed lake version under {lake_root}")
        if head.num_partitions != bhead.num_partitions or (
            head.key,
            head.partition_key,
        ) != (bhead.key, bhead.partition_key):
            raise MergeConflict(
                "layout/key contract diverged between parent and branch "
                "(re-bucket or key change) — merge cannot reconcile; "
                "re-apply the branch's feed on the parent instead"
            )
        if (head.renames or {}) != (bhead.renames or {}):
            # a rename on one side re-labels columns its files still
            # carry physically; merging mismatched maps would read one
            # side's data under the wrong logical names
            raise MergeConflict(
                "column renames diverged between parent and branch — "
                "apply the same alter_schema(rename=...) on both sides "
                "(or re-apply the branch's feed on the parent) first"
            )
        version = head.version + 1
        if os.path.exists(os.path.join(lake_root, f".staged-v{version}")):
            raise ConcurrentCommitError(
                f"staged (unpublished) version v{version} exists on "
                f"{lake_root}; publish or discard it before merging"
            )

        conflicts: list[int] = []
        take_branch: list[int] = []
        parts: dict[int, PartEntry] = {}
        for p in sorted(set(head.parts) | set(bhead.parts)):
            base_sig = _chain_sig(fork, p, lake_root, lake_root)
            head_sig = _chain_sig(head, p, lake_root, lake_root)
            br_sig = _chain_sig(bhead, p, broot, lake_root)
            if br_sig == base_sig:  # branch untouched -> parent wins
                if p in head.parts:
                    parts[p] = head.parts[p]
            elif head_sig == base_sig:  # parent untouched -> branch wins
                take_branch.append(p)
            else:
                conflicts.append(p)
        if conflicts:
            raise MergeConflict(
                f"partition(s) {conflicts[:8]} changed on both parent and "
                f"branch since the fork (v{fork.version}); re-apply one "
                "side's feed on the other instead of merging"
            )

        data_dir = os.path.join(lake_root, "data", f"v{version}")
        os.makedirs(data_dir, exist_ok=True)

        def _adopt(rel_from_branch: str, new_name: str) -> str:
            """Bring one branch-entry file into the parent namespace:
            shared parent files stay by reference; branch-local files
            are promoted (hard-link, falling back to copy — the branch
            may keep running) into the new version dir, Bloom sidecars
            riding along."""
            resolved = os.path.normpath(os.path.join(broot, rel_from_branch))
            parent_rel = os.path.normpath(os.path.relpath(resolved, lake_root))
            # shared = inside the PARENT's data tree (a branch-local
            # file is also under lake_root lexically, via .branches/)
            if parent_rel.split(os.sep)[0] == "data":
                return parent_rel  # shared — zero copy
            dst_rel = os.path.join("data", f"v{version}", new_name)
            dst = os.path.join(lake_root, dst_rel)
            for src_p, dst_p in [(resolved, dst)] + (
                [(resolved + ".bloom", dst + ".bloom")]
                if os.path.exists(resolved + ".bloom")
                else []
            ):
                try:
                    os.link(src_p, dst_p)
                except (OSError, NotImplementedError):
                    shutil.copy2(src_p, dst_p)
            return dst_rel

        for p in take_branch:
            e = bhead.parts.get(p)
            if e is None:  # partition vanished on the branch (never happens
                continue  # today — entries persist — but be total)
            parts[p] = dataclasses.replace(
                e,
                file=_adopt(e.file, f"part-{p:05d}.parquet"),
                deltas=[
                    _adopt(d, f"part-{p:05d}-delta-{i}.parquet")
                    for i, d in enumerate(e.deltas)
                ],
            )

        internal = [f for f in head.schema if f.name in INTERNAL_COLS]
        user_head = pa.schema(
            [f for f in head.schema if f.name not in INTERNAL_COLS]
        )
        user_branch = pa.schema(
            [f for f in bhead.schema if f.name not in INTERNAL_COLS]
        )
        schema = pa.schema(list(_unify(user_head, user_branch)) + internal)
        merged = LakeManifest(
            version=version,
            num_partitions=head.num_partitions,
            schema=schema,
            parts=parts,
            key=head.key,
            partition_key=head.partition_key,
            key_cols=head.key_cols,
            constraints=head.constraints,
            generated=head.generated,
            renames=head.renames,
            committed_at=_time.time(),
        )
        _atomic_write(
            os.path.join(lake_root, f"MANIFEST-v{version}.json"),
            merged.to_json(),
        )
        _atomic_write(os.path.join(lake_root, "LATEST"), str(version))
    if delete:
        delete_branch(lake_root, name)
    return merged
