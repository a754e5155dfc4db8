"""Secondary VALUE index on any scalar lake column, as a derived lake.

The lake's hash partitioning answers point probes by its key; zone maps
(``engine.zone_prune_files``) prune range scans where the column
happens to correlate with write order. What neither answers cheaply is
a selective equality probe on an arbitrary unclustered column — ``WHERE
source = 'web'`` over a 100-TB lake is otherwise a full scan with
per-file min/max that never excludes anything for a high-churn column.

Same trick as the inverted token index (:mod:`palimpzest_ray.cdc.index`),
one dimension simpler because the column is scalar: index rows
``(entry_id = value␟doc, value, doc_id)`` are a DERIVED LAKE keyed on
``entry_id`` (the LWW identity) but PARTITIONED by ``value`` — legal
because the partition column is a pure function of the key — so an
equality probe reads ≤ 1 index partition per value, then fetches the
matching docs through the key-pruned, Bloom-assisted
:func:`engine.lookup`. Both hops are O(result), never O(lake). Being a
lake, the index inherits exactly-once commits, resume, tombstones,
time travel and vacuum; refresh is change-feed-driven and rewrites only
the value partitions that changed.

The entry separator is U+001F (unit separator), not ``:`` — values are
arbitrary user strings and the LWW identity must not be forgeable by a
value/doc pair that happens to contain the delimiter.

Reference: the closest machinery is the chromadb handle on ``TopKOp``
(``/root/reference/src/palimpzest/query/operators/topk.py:73``) — an
external index service; this is the lake-native equivalent for exact
equality, in the spirit of Hyperspace/DB secondary indexes.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from palimpzest_ray.cdc.engine import (
    apply_changes,
    final_state,
    load_latest_manifest,
    lookup,
    net_changes_since,
)

_META = "_column_index.json"
_SEP = "\x1f"


def _meta_path(index_root: str) -> str:
    return os.path.join(index_root, _META)


def _load_meta(index_root: str) -> dict:
    with open(_meta_path(index_root)) as f:
        return json.load(f)


def _store_meta(index_root: str, meta: dict) -> None:
    tmp = _meta_path(index_root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _meta_path(index_root))


def _entry_schema(value_type: pa.DataType) -> pa.Schema:
    return pa.schema(
        [
            pa.field("lsn", pa.int64()),
            pa.field("op", pa.string()),
            pa.field("entry_id", pa.string()),
            pa.field("value", value_type),
            pa.field("doc_id", pa.string()),
        ]
    )


def _entries(lsn, op, value, doc) -> pa.Table:
    """The ONE place entry identity is formatted — build and refresh must
    agree or LWW identity diverges between the two paths. Inputs are
    equal-length Arrow arrays; ``op`` may be a scalar string."""
    if isinstance(value, pa.ChunkedArray):
        value = value.combine_chunks()
    if isinstance(doc, pa.ChunkedArray):
        doc = doc.combine_chunks()
    entry = pc.binary_join_element_wise(
        pc.cast(value, pa.string()), doc, _SEP
    )
    n = len(doc)
    if isinstance(op, str):
        op = pa.array([op] * n, pa.string())
    return pa.table(
        {
            "lsn": lsn,
            "op": op,
            "entry_id": entry,
            "value": value,
            "doc_id": doc,
        },
        schema=_entry_schema(value.type),
    )


def build_column_index(
    lake_root: str,
    index_root: str,
    column: str,
    *,
    key: str = "doc_id",
    num_partitions: int = 32,
) -> dict:
    """Full build: one index entry per live (value, doc) pair. Rows with
    a NULL value are not indexed (equality never matches NULL)."""
    manifest = load_latest_manifest(lake_root)
    if manifest is None:
        raise FileNotFoundError(f"no committed lake under {lake_root}")
    if load_latest_manifest(index_root) is not None:
        raise ValueError(
            f"{index_root} already holds an index lake — use "
            "refresh_column_index to catch it up, or a new index_root"
        )
    value_type = manifest.schema.field(column).type
    docs = final_state(lake_root, columns=[key, column])

    def _explode(batch: pa.Table) -> pa.Table:
        live = batch.filter(pc.is_valid(batch[column]))
        return _entries(
            pa.array(np.zeros(live.num_rows, dtype=np.int64)),
            "INSERT",
            live[column],
            live[key],
        )

    events = docs.map_batches(_explode, batch_format="pyarrow")
    apply_changes(
        events,
        index_root,
        key="entry_id",
        partition_key="value",
        num_partitions=num_partitions,
        change_schema=_entry_schema(value_type),
    )
    meta = {
        "lake_version": manifest.version,
        "key": key,
        "column": column,
        "num_partitions": num_partitions,
    }
    _store_meta(index_root, meta)
    return meta


def refresh_column_index(lake_root: str, index_root: str) -> dict:
    """Incremental catch-up from the lake's change feed: DELETE the old
    entry where a changed doc's value changed (or the doc died), UPSERT
    the new value's entry. Fully vectorized — the feed is scalar-valued,
    so the set-diff of the token index collapses to two masks. Only
    value partitions that changed are rewritten."""
    meta = _load_meta(index_root)
    base_v = meta["lake_version"]
    key, column = meta["key"], meta["column"]
    latest = load_latest_manifest(lake_root)
    if latest.version == base_v:
        return {"refreshed": False, "lake_version": base_v}
    value_type = latest.schema.field(column).type
    from palimpzest_ray.dataset import Dataset as PzDataset

    feed = PzDataset(
        net_changes_since(lake_root, base_v).map_batches(
            lambda b: b.select(["lsn", "op", key, column]),
            batch_format="pyarrow",
        )
    )
    old_state = PzDataset(
        final_state(lake_root, version=base_v, columns=[key, column])
    ).rename_columns({column: "_old_value"})
    # pin the O(changes) feed: it is consumed twice (changed-key
    # projection + the join) and the join's schema probe would run the
    # lazy semi-join once for the probe and again for data (the
    # lazy-join hazard measured on diff_lakes / _agg_distributed)
    feed = PzDataset(feed._ds.materialize())
    changed_keys = feed.project([key]).distinct([key])
    old_changed = PzDataset(
        old_state.semi_join(changed_keys, key)._ds.materialize()
    )
    joined = feed.join(old_changed, on=key, how="left")

    def _emit(batch: pa.Table) -> pa.Table:
        old = batch["_old_value"]
        if isinstance(old, pa.ChunkedArray):
            old = old.combine_chunks()
        # a DELETE feed row has no live value regardless of its payload
        is_upd = pc.equal(batch["op"], pa.scalar("UPDATE"))
        new = pc.if_else(is_upd, batch[column], pa.scalar(None, value_type))
        if isinstance(new, pa.ChunkedArray):
            new = new.combine_chunks()
        # null-safe "old entry must die": old exists AND (no new value OR
        # value changed) — not_equal is null when either side is, and a
        # valid-old/null-new pair IS a change, so nulls fill to True
        dead = pc.and_(
            pc.is_valid(old),
            pc.fill_null(pc.not_equal(old, new), True),
        )
        dels = batch.filter(dead)
        del_t = _entries(dels["lsn"], "DELETE", dels["_old_value"], dels[key])
        ups = batch.filter(pc.is_valid(new))
        ups_t = _entries(ups["lsn"], "UPDATE", ups[column], ups[key])
        return pa.concat_tables([del_t, ups_t])

    events = joined.ray.map_batches(_emit, batch_format="pyarrow").materialize()
    n_events = events.count()  # metadata-only on the pinned result
    if n_events:
        from palimpzest_ray.cdc.index import _small_or_ds

        apply_changes(
            _small_or_ds(events, n_events),
            index_root,
            key="entry_id",
            partition_key="value",
            num_partitions=meta["num_partitions"],
            change_schema=_entry_schema(value_type),
        )
    meta["lake_version"] = latest.version
    _store_meta(index_root, meta)
    return {"refreshed": True, "from_version": base_v,
            "lake_version": latest.version, "index_events": n_events}


def lookup_by(
    lake_root: str,
    index_root: str,
    values: list,
    *,
    columns: list[str] | None = None,
) -> pa.Table:
    """``WHERE column IN (values)`` without scanning the lake: hop 1
    reads ≤ ``len(values)`` index partitions (value-pruned, like any
    lake lookup), hop 2 fetches the named docs through the key-pruned,
    Bloom-assisted :func:`engine.lookup`. Both hops read the PINNED
    versions (the index's recorded lake version) so the result is a
    consistent snapshot even while writers advance the lake — refresh
    the index to see newer commits. O(result) end to end."""
    meta = _load_meta(index_root)
    latest = load_latest_manifest(lake_root)
    value_type = latest.schema.field(meta["column"]).type
    typed = pa.array(values).cast(value_type).to_pylist()
    hits = lookup(index_root, typed, key="value", columns=["doc_id"])
    doc_ids = pc.unique(hits["doc_id"]).to_pylist()
    if not doc_ids:
        schema = pa.schema(
            [f for f in latest.schema
             if columns is None or f.name in {meta["key"], *columns}]
        )
        return schema.empty_table()
    return lookup(
        lake_root, doc_ids, key=meta["key"],
        version=meta["lake_version"], columns=columns,
    )
