"""GDPR hard delete: purge keys from ALL retained history.

``delete_keys`` tombstones a key — the value disappears from the HEAD,
but every retained version (time travel), the tombstone row itself (it
carries the key, and whatever payload the DELETE event shipped), the
dead-letter files and the zone-map metadata still hold the data.
``purge_keys`` is the right-to-be-forgotten completion: rewrite exactly
the data files that physically contain the keys — across every
retained version, staged (write-audit-publish) versions included — so
NO retained read (``final_state(version=)``, ``lookup``,
``key_history``, ``net_changes_since``, quarantine readback) returns
them, without dropping history versions the way ``vacuum`` would.

Scale shape (the 100-TB story): candidate files come from each
manifest's own routing — ``stable_bucket(key) % P`` per version (P may
differ across a repartition), hidden-partition transforms re-derived
driver-side — so a purge of k keys over V retained versions opens
O(k·V) partition chains, never a scan; per-file key-Bloom sidecars then
skip chain files that provably lack every purged key WITHOUT reading
them, and only files that physically contain a purged row are
rewritten (tmp + atomic rename, original key order preserved so the
merge contract's sorted-base invariant holds). Counters and zone maps
for candidate partitions are RECOMPUTED from the post-scrub chains
(resolved live/tombstone counts via the same resolver ``fsck``
validates with; column ranges from parquet footer stats, which after
the rewrite cannot contain a purged value) — an absolute recompute, so
a crashed purge re-run converges instead of double-decrementing.

Unlike a commit, purge MUTATES retained versions in place — that is
the point of the operation — under the same exclusive commit lock as
``apply_changes``, so no apply, WAP publish or second purge interleaves.

Two modes:

- ``keep_tombstones=False`` (default, full forget): every physical row
  of a purged key is removed, including DELETE tombstones — the key
  string itself is forgotten. A later event for the key is a fresh
  insert (no LWW barrier remains).
- ``keep_tombstones=True`` (contamination purge): tombstone rows keep
  their key + routing column but every other payload column is nulled
  in place; live images are removed. The key stays DEAD — a late
  out-of-order event below the tombstone's LSN still loses — but its
  values are gone. Keys live at the head get a ``delete_keys`` commit
  first (``tombstone_first``) so the forget is itself audit-visible in
  ``lake_history``.

Out of scope by design (documented, not silent): derived lakes (token
/ column / IVF indexes, views, clones, snapshots) are separate lakes —
purge each with its own ``purge_keys`` call or rebuild it; a lake with
live branches is refused (branch manifests pin parent files; merge or
delete branches first), as is purging a branch itself (it references
the parent's files). Likewise DOWNSTREAM CONSUMERS: a subscription
replica (``cdc.subs`` / ``sync_replica``) that already applied the
keys holds its own copy, and the purge produces no change-feed rows
(the keys are absent from every version, so ``net_changes_since``
cannot mention them) — run ``purge_keys`` on each replica with the
same key set to complete the forget across the fleet.
"""

from __future__ import annotations

import fcntl
import glob
import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from palimpzest_ray.cdc.bloom import (
    bloom_might_contain,
    load_bloom,
    write_bloom_sidecar,
)
from palimpzest_ray.cdc.manifest import (
    LakeManifest,
    _atomic_write,
    load_latest_manifest,
    load_manifest,
)
from palimpzest_ray.schemas import LSN_COL, TOMBSTONE_COL

__all__ = ["purge_keys", "purge_where"]


def _routed_partitions(m: LakeManifest, karr: pa.Array) -> list[int]:
    """Partitions of THIS manifest's layout that could hold the keys —
    the same pruning contract as ``lookup`` (hash routing on the key,
    hidden-partition transform re-derivation, or every partition when
    the routing column is not derivable from the key)."""
    from palimpzest_ray.functions.tokens import stable_bucket

    route_col = m.partition_key or m.key
    if route_col == m.key:
        buckets = stable_bucket(karr, m.num_partitions)
    else:
        gexpr = (m.generated or {}).get(m.partition_key)
        if gexpr is not None:
            from palimpzest_ray.cdc.expr import eval_expr, expr_columns

            if expr_columns(gexpr) <= {m.key}:
                pvals = eval_expr(pa.table({m.key: karr}), gexpr)
                buckets = stable_bucket(pvals, m.num_partitions)
            else:
                buckets = None
        else:
            buckets = None
    if buckets is None:
        return sorted(m.parts)
    return sorted(set(np.unique(buckets).tolist()) & set(m.parts))


def _scrub_file(
    path: str,
    key: str,
    keys_set: pa.Array,
    keep_tombstones: bool,
    route_col: str,
) -> dict:
    """Rewrite one data file without (or with nulled) purged-key rows;
    atomic tmp+rename, sidecar rebuilt AFTER the data flip (a stale
    wider Bloom is false-positive-only — never a dropped row). Returns
    ``{"removed": n, "nulled": n}``; an untouched file is not
    rewritten. Physical column names are preserved (a pre-rename file
    stays a pre-rename file; the key column is never renamable)."""
    blob = load_bloom(path)
    # the sidecar indexes the ROUTING column; screen with it only when
    # that is the key being purged
    if blob is not None and route_col == key:
        if not bloom_might_contain(blob, keys_set).any():
            return {"removed": 0, "nulled": 0}
    t = pq.read_table(path)
    hit = pc.is_in(t[key], value_set=keys_set)
    n_hit = pc.sum(pc.cast(hit, pa.int64())).as_py() or 0
    if not n_hit:
        return {"removed": 0, "nulled": 0}
    removed = nulled = 0
    if keep_tombstones and TOMBSTONE_COL in t.column_names:
        dead = pc.coalesce(t[TOMBSTONE_COL], pa.scalar(False))
        drop = pc.and_(hit, pc.invert(dead))
        null_mask = pc.and_(hit, dead)
        nulled = pc.sum(pc.cast(null_mask, pa.int64())).as_py() or 0
        keep_cols = {key, route_col, LSN_COL, TOMBSTONE_COL}
        if nulled:
            # take-with-null-indices nulls the masked positions for ANY
            # type (pc.if_else cannot splice nested/list columns)
            nm = null_mask.to_numpy(zero_copy_only=False)
            idx = pa.array(np.arange(t.num_rows, dtype=np.int64), mask=nm)
            cols = []
            for f in t.schema:
                col = t[f.name].combine_chunks()
                if f.name not in keep_cols:
                    col = col.take(idx)
                cols.append(col)
            t = pa.Table.from_arrays(cols, schema=t.schema)
        t = t.filter(pc.invert(drop))
        removed = n_hit - nulled
    else:
        t = t.filter(pc.invert(hit))
        removed = n_hit
    tmp = path + f".purge-{uuid.uuid4().hex[:8]}"
    # same writer settings as the merge (snappy, 64k row groups) so the
    # rewritten file keeps the lookup-pruning granularity of the original
    pq.write_table(t, tmp, compression="snappy", row_group_size=64 * 1024)
    os.replace(tmp, path)
    if blob is not None:
        # rebuild from the surviving routing values so a purged key
        # probe provably skips this file from now on
        if route_col in t.column_names:
            write_bloom_sidecar(path, t[route_col].combine_chunks())
    return {"removed": removed, "nulled": nulled}


def _footer_stats(files: list[str]) -> dict | None:
    """Zone map recompute: {col: [min, max]} unioned over the chain
    files' parquet row-group statistics. Post-scrub footers cannot
    contain a purged value, and footer ranges bound every physical row,
    so the result is a valid (possibly wider-than-resolved) zone map —
    the same direction write-time stats err. Columns without stats
    (nested, all-null) drop out = unknown, never a wrong prune."""
    agg: dict[str, list] = {}
    complete: set[str] | None = None
    for f in files:
        md = pq.ParquetFile(f).metadata
        per_file_ok: dict[str, bool] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for i in range(g.num_columns):
                c = g.column(i)
                name = c.path_in_schema
                if "." in name:  # nested leaf — not a scalar column
                    continue
                st = c.statistics
                if (
                    st is None
                    or not st.has_min_max
                    or st.min is None
                    or st.max is None
                    or not isinstance(st.min, (int, float, str, bool))
                ):
                    per_file_ok[name] = False
                    continue
                per_file_ok.setdefault(name, True)
                cur = agg.get(name)
                if cur is None:
                    agg[name] = [st.min, st.max]
                else:
                    if st.min < cur[0]:
                        cur[0] = st.min
                    if st.max > cur[1]:
                        cur[1] = st.max
        ok_here = {n for n, ok in per_file_ok.items() if ok}
        complete = ok_here if complete is None else (complete & ok_here)
    # a column must have stats in EVERY file of the chain, else some
    # rows are unbounded and the entry must say "unknown"
    out = {c: agg[c] for c in sorted(complete or ()) if c in agg}
    return out or None


def purge_keys(
    lake_root: str,
    keys: list,
    *,
    keep_tombstones: bool = False,
    tombstone_first: bool = True,
    include_quarantine: bool = True,
) -> dict:
    """Hard-delete ``keys`` from every retained version's data files
    (see module docstring). Returns a summary dict. Idempotent: a
    re-run (including after a crash mid-purge) rewrites nothing and
    re-converges the candidate partitions' counters."""
    from palimpzest_ray.cdc.engine import (
        _read_chain,
        _resolve_chain,
        _tombstone_count,
        delete_keys,
    )

    if not keys:
        raise ValueError("purge_keys needs a non-empty key list")
    head = load_latest_manifest(lake_root)
    if head is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    if os.path.exists(os.path.join(lake_root, "FORK-BASE.json")):
        raise ValueError(
            "cannot purge a branch — it references the parent lake's "
            "files; purge the parent (which refuses while branches "
            "exist) after merging or deleting branches"
        )
    bdir = os.path.join(lake_root, ".branches")
    if os.path.isdir(bdir) and any(
        not e.startswith(".") for e in os.listdir(bdir)
    ):
        raise ValueError(
            "cannot purge while branches exist — branch manifests pin "
            "this lake's files; merge or delete branches first"
        )
    if head.key_cols and keys and isinstance(keys[0], (tuple, list)):
        from palimpzest_ray.cdc.keys import encode_key_tuples

        keys = encode_key_tuples(keys)

    key = head.key
    karr = pa.array(list(dict.fromkeys(keys))).cast(
        head.schema.field(key).type
    )

    # audit-visible forget: tombstone still-live keys through the
    # ordinary exactly-once commit BEFORE the scrub, so lake_history
    # records when the key died (full-forget then removes the
    # tombstone row itself; keep mode retains it as the LWW barrier)
    if tombstone_first:
        from palimpzest_ray.cdc.engine import lookup as _lookup

        live = _lookup(lake_root, karr.to_pylist(), key=key, columns=[])
        if live.num_rows:
            delete_keys(lake_root, live[key].to_pylist())

    lock_path = os.path.join(lake_root, ".commit.lock")
    with open(lock_path, "w") as lock:
        fcntl.flock(lock.fileno(), fcntl.LOCK_EX)
        latest = load_latest_manifest(lake_root)
        versions: list[int] = []
        for v in range(1, latest.version + 1):
            try:
                load_manifest(lake_root, v)
                versions.append(v)
            except FileNotFoundError:  # vacuumed
                continue
        for f in os.listdir(lake_root):  # staged WAP versions
            if f.startswith(".staged-v"):
                v = int(f[len(".staged-v"):])
                if v not in versions and os.path.exists(
                    os.path.join(lake_root, f"MANIFEST-v{v}.json")
                ):
                    versions.append(v)
        versions.sort()

        manifests = {v: load_manifest(lake_root, v) for v in versions}
        # (version, part) candidates by each layout's own routing, and
        # the distinct files their chains reference (shared across
        # versions — each file scrubbed once)
        touched: dict[int, list[int]] = {}
        files: dict[str, None] = {}
        for v, m in manifests.items():
            parts = _routed_partitions(m, karr)
            touched[v] = parts
            for p in parts:
                for f in m.chain(lake_root, p):
                    files[f] = None
        route_col = head.partition_key or head.key
        results = _scrub_files(
            list(files), key, karr, keep_tombstones, route_col
        )
        rows_removed = sum(r["removed"] for r in results.values())
        rows_nulled = sum(r["nulled"] for r in results.values())

        # absolute counter + zone-map recompute for every candidate
        # partition (idempotent — a crashed run's re-run converges)
        narrow = pa.schema(
            [
                head.schema.field(key),
                pa.field(LSN_COL, pa.int64()),
                pa.field(TOMBSTONE_COL, pa.bool_()),
            ]
        )
        for v in versions:
            m = manifests[v]
            changed = False
            for p in touched[v]:
                chain = m.chain(lake_root, p)
                r = _resolve_chain(
                    _read_chain(
                        chain, columns=list(narrow.names), renames=m.renames
                    ),
                    key,
                    narrow,
                )
                tombs = _tombstone_count(r)
                live = r.num_rows - tombs
                e = m.parts[p]
                if (live, tombs) != (e.rows, e.tombstones):
                    e.rows, e.tombstones = live, tombs
                    changed = True
                new_stats = _footer_stats(chain)
                if e.col_stats != new_stats:
                    e.col_stats = new_stats
                    changed = True
            if changed:
                _atomic_write(
                    os.path.join(lake_root, f"MANIFEST-v{v}.json"),
                    m.to_json(),
                )

        q_removed = 0
        if include_quarantine:
            q_removed = _scrub_quarantine(lake_root, key, karr)

    return {
        "keys": len(karr),
        "versions": len(versions),
        "files_scanned": len(files),
        "files_rewritten": sum(
            1 for r in results.values() if r["removed"] or r["nulled"]
        ),
        "rows_removed": rows_removed,
        "tombstones_kept_nulled": rows_nulled,
        "quarantine_rows_removed": q_removed,
    }


def _scrub_files(
    files: list[str],
    key: str,
    karr: pa.Array,
    keep_tombstones: bool,
    route_col: str,
) -> dict[str, dict]:
    """Scrub each candidate file once — Ray task pool when a session is
    up and the file list is worth the dispatch, else a driver loop."""
    import ray

    if len(files) > 4 and ray.is_initialized():
        fn = ray.remote(num_cpus=1)(_scrub_file)
        kref = ray.put(karr)
        futs = {
            f: fn.remote(f, key, kref, keep_tombstones, route_col)
            for f in files
        }
        return {f: ray.get(fut) for f, fut in futs.items()}
    return {
        f: _scrub_file(f, key, karr, keep_tombstones, route_col)
        for f in files
    }


def _scrub_quarantine(lake_root: str, key: str, karr: pa.Array) -> int:
    """Remove purged-key rows from the dead-letter files. The tailing
    watermark is persisted FIRST (``_quarantine/WATERMARK.json``) so
    removing the highest-LSN quarantined event cannot regress
    ``quarantine_watermark`` and make ``tail_once`` re-read a consumed
    log position."""
    from palimpzest_ray.cdc.engine import quarantine_watermark

    qdir = os.path.join(lake_root, "_quarantine")
    qfiles = sorted(glob.glob(os.path.join(qdir, "v*.parquet")))
    if not qfiles:
        return 0
    wm = quarantine_watermark(lake_root)
    if wm is not None:
        _atomic_write(
            os.path.join(qdir, "WATERMARK.json"),
            json.dumps({"max_lsn": int(wm)}),
        )
    removed = 0
    for f in qfiles:
        t = pq.read_table(f)
        if key not in t.column_names:
            continue
        hit = pc.is_in(
            t[key].cast(karr.type, safe=False), value_set=karr
        )
        n = pc.sum(pc.cast(hit, pa.int64())).as_py() or 0
        if not n:
            continue
        t = t.filter(pc.invert(hit))
        tmp = f + f".purge-{uuid.uuid4().hex[:8]}"
        pq.write_table(t, tmp)
        os.replace(tmp, f)
        removed += n
    return removed


def purge_where(
    lake_root: str,
    predicate: list[tuple],
    *,
    max_keys: int = 1_000_000,
    **purge_kwargs,
) -> dict:
    """Predicate-driven forget — "erase every row of user X": collect
    the LIVE keys matching the conjuncts (zone-map-pruned scan of only
    the key + predicate columns) and :func:`purge_keys` them. The key
    set materializes driver-side (purge routing needs it), so
    ``max_keys`` guards against a predicate that matches half the lake
    — raise it deliberately for a known-large forget, or split the
    predicate. Note the predicate selects by the LIVE state: a key
    whose matching rows are all historical (since overwritten) is not
    selected — pass it to ``purge_keys`` explicitly."""
    from palimpzest_ray.cdc.engine import final_state

    head = load_latest_manifest(lake_root)
    if head is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    import pyarrow.compute as _pc

    keys: list = []
    ds = final_state(lake_root, columns=[head.key], predicate=predicate)
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=65536):
        keys.extend(_pc.unique(b[head.key]).to_pylist())
        if len(keys) > max_keys:
            raise ValueError(
                f"predicate matches more than max_keys={max_keys} keys — "
                "raise max_keys for a deliberate mass forget, or narrow "
                "the predicate"
            )
    if not keys:
        return {
            "keys": 0, "versions": 0, "files_scanned": 0,
            "files_rewritten": 0, "rows_removed": 0,
            "tombstones_kept_nulled": 0, "quarantine_rows_removed": 0,
        }
    return purge_keys(lake_root, sorted(set(keys)), **purge_kwargs)
