"""Content-based change routing: one upstream feed → N lakes, atomically.

The Debezium ``ContentBasedRouter`` / topic-routing story in this
lake's terms: a single change log whose events belong to different
tables (multi-tenant topics, type-discriminated envelopes, hot/cold
splits) is split by FIRST-MATCH-WINS predicates and each slice applied
to its own lake through the ordinary exactly-once path — then ONE
catalog commit pins every resulting version, so a downstream snapshot
reader either sees the whole routed transaction or none of it
(``catalog.commit_transaction`` crash semantics).

Scale shape: the split is ONE streaming pass over the feed —
``map_batches`` tasks evaluate every route predicate per batch (the
same ``_expect_mask`` evaluator the ingest gate uses: conjunct lists or
full ``cdc.expr`` CHECK expressions) and write each slice to its own
staging directory as the pass runs; the N applies then read only their
own slice. Cost is feed + slices moved once each, never N scans of the
feed. Route predicates should be functions of columns EVERY event
carries (the key, an envelope/type column): a DELETE with a minimal
payload evaluates an absent column as no-match and falls through to
later routes / the default — the same absent-column rule as the gate.
"""

from __future__ import annotations

import dataclasses
import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

__all__ = ["RouteResult", "route_changes"]


@dataclasses.dataclass
class RouteResult:
    snapshot: object  # CatalogSnapshot
    events_in: int
    events_routed: dict[str, int]
    events_dropped: int


def _feed_dataset(changes) -> rd.Dataset:
    if isinstance(changes, rd.Dataset):
        return changes
    if isinstance(changes, pa.Table):
        return rd.from_arrow(changes)
    paths = [changes] if isinstance(changes, str) else list(changes)
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(
                sorted(
                    os.path.join(p, f)
                    for f in os.listdir(p)
                    if f.endswith(".parquet")
                )
            )
        else:
            files.append(p)
    return rd.read_parquet(files)


def route_changes(
    changes,
    catalog_root: str,
    routes: "dict[str, list | dict]",
    lakes: dict[str, str],
    *,
    default: str | None = None,
    drop_unmatched: bool = False,
    apply_kwargs: dict[str, dict] | None = None,
    work_dir: str | None = None,
) -> RouteResult:
    """Split ``changes`` by first-match-wins ``routes`` (insertion
    order; name → predicate in the expectations mini-language
    ``[("col", op, value), ...]`` or ``{"expr": ...}``), apply each
    slice to ``lakes[name]``, and publish ONE catalog version pinning
    all of them. Unmatched events go to ``default`` (a route name
    without a predicate of its own is fine), are counted-and-dropped
    under ``drop_unmatched=True``, or fail the routing — BEFORE any
    lake applies, so a mis-routed feed never half-commits.

    Returns the catalog snapshot plus per-route event counts. Empty
    slices still pin their lake's current version (a routed transaction
    is a consistent cut over ALL its tables)."""
    from palimpzest_ray.cdc.catalog import commit_transaction
    from palimpzest_ray.cdc.engine import _expect_mask

    if not routes:
        raise ValueError("route_changes needs at least one route")
    unknown = set(routes) - set(lakes)
    if unknown:
        raise ValueError(f"routes name lakes that are not mapped: {sorted(unknown)}")
    if default is not None and default not in lakes:
        raise ValueError(f"default route {default!r} is not a mapped lake")
    if default is not None and drop_unmatched:
        raise ValueError("pass default= or drop_unmatched=True, not both")

    names = list(routes)
    work = work_dir or os.path.join(
        catalog_root, ".routing", uuid.uuid4().hex[:12]
    )
    slice_dirs = {n: os.path.join(work, n) for n in names}
    if default is not None and default not in slice_dirs:
        slice_dirs[default] = os.path.join(work, default)
    for d in slice_dirs.values():
        os.makedirs(d, exist_ok=True)

    import pyarrow.compute as pc

    preds = {n: routes[n] for n in names}

    def _split(batch: pa.Table) -> pa.Table:
        from palimpzest_ray.functions.tokens import limit_kernel_threads

        limit_kernel_threads()
        order = sorted(slice_dirs)
        if batch.num_rows == 0:
            return pa.table({"in": pa.array([], pa.int64()),
                             "unmatched": pa.array([], pa.int64()),
                             **{n: pa.array([], pa.int64())
                                for n in order}})
        taken = pa.nulls(batch.num_rows, pa.bool_()).fill_null(False)
        counts = {}
        tag = uuid.uuid4().hex[:12]
        for n in names:
            m = pc.coalesce(_expect_mask(batch, preds[n]), pa.scalar(False))
            m = pc.and_(m, pc.invert(taken))
            taken = pc.or_(taken, m)
            part = batch.filter(m)
            counts[n] = part.num_rows
            if part.num_rows:
                pq.write_table(
                    part, os.path.join(slice_dirs[n], f"s-{tag}.parquet")
                )
        rest = batch.filter(pc.invert(taken))
        unmatched = rest.num_rows
        if unmatched and default is not None:
            pq.write_table(
                rest, os.path.join(slice_dirs[default], f"r-{tag}.parquet")
            )
            counts[default] = counts.get(default, 0) + unmatched
            unmatched = 0
        return pa.table(
            {
                "in": pa.array([batch.num_rows], pa.int64()),
                "unmatched": pa.array([unmatched], pa.int64()),
                **{
                    n: pa.array([counts.get(n, 0)], pa.int64())
                    for n in order
                },
            }
        )

    try:
        tallies = _feed_dataset(changes).map_batches(
            _split, batch_format="pyarrow"
        )
        tally = pa.concat_tables(
            tallies.iter_batches(batch_format="pyarrow", batch_size=4096)
        )
        import pyarrow.compute as _pc

        events_in = _pc.sum(tally["in"]).as_py() or 0
        unmatched = _pc.sum(tally["unmatched"]).as_py() or 0
        routed = {
            n: _pc.sum(tally[n]).as_py() or 0 for n in slice_dirs
        }
        if unmatched and not drop_unmatched:
            raise ValueError(
                f"{unmatched} event(s) matched no route — add a route, "
                "pass default=, or drop_unmatched=True"
            )
        slices = {
            n: d for n, d in slice_dirs.items()
            if any(f.endswith(".parquet") for f in os.listdir(d))
        }
        # a route that received no events still pins its lake's current
        # version (a consistent cut) — but a lake that does not exist
        # yet has nothing to pin, so leave it out of this transaction
        from palimpzest_ray.cdc.manifest import load_latest_manifest

        txn_lakes = {
            n: root
            for n, root in lakes.items()
            if n in slices or load_latest_manifest(root) is not None
        }
        snap = commit_transaction(
            catalog_root, slices, txn_lakes, apply_kwargs=apply_kwargs
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return RouteResult(
        snapshot=snap,
        events_in=events_in,
        events_routed=routed,
        events_dropped=unmatched if drop_unmatched else 0,
    )
