"""Ingest-time stream enrichment: broadcast dimension lookup.

The classic CDC-pipeline step Flink calls a temporal/lookup join: a
fact event stream (orders, clicks, doc updates) is enriched with
attributes from a SMALL dimension (customers, sources, schemas) AT
INGEST, so the lake stores denormalized rows and no reader ever pays
the join. Ray-Data-first shape: the dimension is loaded ONCE on the
driver (pruned to the key + requested columns), ``ray.put`` into the
object store, and every ``map_batches`` task reads it zero-copy from
its node's store — the fact stream moves once, the dimension never
re-ships per batch, and there is NO shuffle (the canonical
broadcast-join answer to a small-side equi-join at 100 TB of facts).

Per batch the lookup is two vectorized kernels: ``pc.index_in`` of the
feed's join column against the dimension key, then one ``take`` per
attached column (a null index takes a null — left-join semantics for
free). No acero, so nested payload columns (token arrays) ride along
untouched.

DELETE events pass through un-dropped under every mode: a tombstone
must reach the lake whether or not its key still matches the dimension
(its attached columns are null like any other missing payload).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

__all__ = ["apply_enriched", "enrich_changes"]


def _dim_table(source, source_key: str, columns: list[str], version):
    """Load the dimension: a pyarrow Table as-is, or a lake root read
    through ``final_state_table`` (pruned to key + columns, optionally
    time-travel pinned so re-runs enrich against the same cut)."""
    if isinstance(source, pa.Table):
        t = source
    else:
        from palimpzest_ray.cdc.engine import final_state_table

        t = final_state_table(
            source, version=version
        )
    need = [source_key] + [c for c in columns if c != source_key]
    missing = [c for c in need if c not in t.column_names]
    if missing:
        raise ValueError(f"dimension lacks column(s) {missing}")
    t = t.select(need)
    if t[source_key].null_count:
        raise ValueError(f"dimension key {source_key!r} has null(s)")
    n_keys = pc.count_distinct(t[source_key]).as_py()
    if n_keys != t.num_rows:
        raise ValueError(
            f"dimension key {source_key!r} is not unique "
            f"({t.num_rows} rows, {n_keys} distinct) — a lookup join "
            "needs one row per key (pre-aggregate the dimension)"
        )
    return t.combine_chunks()


def enrich_changes(
    changes,
    *,
    source,
    on: str,
    columns: list[str],
    source_key: str | None = None,
    how: str = "left",
    version: int | None = None,
) -> rd.Dataset:
    """Attach ``columns`` from the dimension ``source`` (a lake root or
    a small pyarrow Table) to every event of ``changes``, joining the
    feed's ``on`` column against ``source_key`` (default: ``on``).

    ``how``: ``"left"`` (default) — unmatched events keep null
    attributes; ``"inner"`` — unmatched NON-DELETE events are dropped
    (DELETEs always pass: a tombstone must reach the lake);
    ``"strict"`` — an unmatched non-DELETE event fails the run (the
    referential-integrity gate). Returns the enriched feed as a
    Dataset, directly consumable by ``apply_changes``."""
    from palimpzest_ray.cdc.router import _feed_dataset

    if how not in ("left", "inner", "strict"):
        raise ValueError(f"how={how!r} (use left / inner / strict)")
    skey = source_key or on
    dim = _dim_table(source, skey, columns, version)
    attach = [c for c in columns if c != skey]
    dim_ref = ray.put(dim)

    def _enrich(batch: pa.Table) -> pa.Table:
        from palimpzest_ray.functions.tokens import limit_kernel_threads

        limit_kernel_threads()
        clash = [c for c in attach if c in batch.column_names]
        if clash:
            raise ValueError(
                f"enrichment column(s) {clash} already exist in the feed"
            )
        if on not in batch.column_names:
            raise ValueError(f"feed lacks the join column {on!r}")
        d = ray.get(dim_ref)  # zero-copy from the node's object store
        probe = batch[on]
        if probe.type != d[skey].type:
            probe = probe.cast(d[skey].type)
        idx = pc.index_in(probe, value_set=d[skey])
        out = batch
        for c in attach:
            out = out.append_column(c, d[c].take(idx))
        if how == "left":
            return out
        matched = idx.is_valid()
        is_del = (
            pc.coalesce(
                pc.equal(batch["op"], pa.scalar("DELETE")), pa.scalar(False)
            )
            if "op" in batch.column_names
            else pa.nulls(batch.num_rows, pa.bool_()).fill_null(False)
        )
        bad = pc.and_(pc.invert(matched), pc.invert(is_del))
        n_bad = pc.sum(pc.cast(bad, pa.int64())).as_py() or 0
        if how == "strict" and n_bad:
            sample = batch.filter(bad)[on].slice(0, 5).to_pylist()
            raise ValueError(
                f"{n_bad} non-DELETE event(s) match no dimension row "
                f"(e.g. {on}={sample}) — fix the feed or use how='left'"
            )
        return out.filter(pc.invert(bad)) if n_bad else out

    return _feed_dataset(changes).map_batches(
        _enrich, batch_format="pyarrow"
    )


def apply_enriched(
    changes,
    lake_root: str,
    *,
    source,
    on: str,
    columns: list[str],
    source_key: str | None = None,
    how: str = "left",
    version: int | None = None,
    **apply_kwargs,
):
    """One-call ``enrich_changes`` → ``apply_changes``."""
    from palimpzest_ray.cdc.engine import apply_changes

    feed = enrich_changes(
        changes, source=source, on=on, columns=columns,
        source_key=source_key, how=how, version=version,
    )
    return apply_changes(feed, lake_root, **apply_kwargs)
