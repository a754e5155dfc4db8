"""Incrementally-maintained JOIN views over two CDC lakes.

`cdc/views.py` maintains GROUP-BY aggregates from the change feed;
this module does the same for the other big materialization: an
equi-join of two lakes on their LWW keys (the enrichment join —
documents ⋈ scores), kept current WITHOUT re-joining the world
(the Materialize / Delta-materialized-view idea, done lake-natively).

Shape:

- ``create_join_view`` pins both source versions and materializes the
  initial join with :func:`~palimpzest_ray.cdc.pjoin.join_lakes` —
  the ZERO-exchange co-partitioned plan — into an ordinary lake keyed
  on the left key, so the view inherits exactly-once commits, time
  travel, point lookups and its own change feed.
- ``refresh_join_view`` computes the CHANGED key set from both sides'
  :func:`~palimpzest_ray.cdc.engine.net_changes_since` feeds (pure
  metadata + pruned scan — unchanged partitions never read), fetches
  exactly those keys' live rows from each lake with partition-pruned
  :func:`~palimpzest_ray.cdc.engine.lookup`, recomputes their join
  rows with the SAME join kernel the initial build used
  (:func:`~palimpzest_ray.cdc.pjoin._nested_safe_join` — schema
  agreement by construction), and applies upserts + deletes to the
  view. Cost is O(changes), never O(lake).

Since both sides are keyed lakes, the join is 1:1 per key; ``how`` ∈
{inner, left} so every view row carries the left key (a right-only
row would have no key to live under). A crash between the view commit
and the pin update re-refreshes the same key set at a fresh LSN and
converges by LWW — the same idempotence story as aggregate views.

``left_on=`` generalizes to the STAR-SCHEMA join (fact.fk = dim.key):
the view stays keyed by the left (fact) key — still 1:1, the dim side
is keyed — but a dim change must ripple to every fact row referencing
it, which needs a reverse index. Creation builds a persistent column
index on the fact's fk (``cdc/colindex.py``) under the view; refresh
then resolves changed dim keys → affected fact keys through the index
(O(hits), partition-pruned), unions them with the fact's own changed
keys, and recomputes exactly that key set — never a rescan of either
lake.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from palimpzest_ray.cdc.engine import (
    apply_changes,
    load_latest_manifest,
    lookup,
    net_changes_since,
)
from palimpzest_ray.cdc.pjoin import _JOIN_TYPES, _nested_safe_join, join_lakes
from palimpzest_ray.schemas import INTERNAL_COLS as _INTERNAL

_META = "_JOIN_VIEW.json"


def _meta_path(view_root: str) -> str:
    return os.path.join(view_root, _META)


def _load_meta(view_root: str) -> dict:
    with open(_meta_path(view_root)) as fh:
        return json.load(fh)


def _store_meta(view_root: str, meta: dict) -> None:
    from palimpzest_ray.cdc.manifest import _atomic_write

    _atomic_write(_meta_path(view_root), json.dumps(meta, indent=1))


def _routing_key(m) -> str:
    if m.partition_key is not None and m.partition_key != m.key:
        raise ValueError(
            "join views require lakes routed by their own LWW key "
            f"(this lake is partitioned by {m.partition_key!r}) — the "
            "refresh fetches changed keys via key lookups"
        )
    return m.key


def create_join_view(
    view_root: str,
    left_root: str,
    right_root: str,
    *,
    how: str = "inner",
    columns_left: list[str] | None = None,
    columns_right: list[str] | None = None,
    right_suffix: str = "_right",
    num_partitions: int | None = None,
    left_on: str | None = None,
) -> dict:
    """Materialize ``left ⋈ right`` as a lake under ``view_root`` and
    pin both source versions for incremental refresh. Default joins the
    two LWW keys; ``left_on=`` joins a LEFT COLUMN against the right
    key (the star-schema fact⋈dim case) and builds the fk column index
    the refresh ripple needs. ``columns_*`` prune each side (keys and
    the fk always ride)."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"how={how!r}: join views support 'inner' and 'left' "
            "(every view row must carry the left key)"
        )
    ml = load_latest_manifest(left_root)
    mr = load_latest_manifest(right_root)
    if ml is None or mr is None:
        raise FileNotFoundError("both source lakes must be committed")
    kl, kr = _routing_key(ml), _routing_key(mr)
    if left_on is not None:
        if left_on not in [f.name for f in ml.schema]:
            raise ValueError(
                f"left_on={left_on!r} is not a column of {left_root}"
            )
        rows = _fk_join(
            left_root, right_root, how=how, left_on=left_on,
            kl=kl, kr=kr,
            columns_left=columns_left, columns_right=columns_right,
            right_suffix=right_suffix,
            version_left=ml.version, version_right=mr.version,
        )
    else:
        rows = join_lakes(
            left_root, right_root, how=how,
            columns_left=columns_left, columns_right=columns_right,
            right_suffix=right_suffix,
            version_left=ml.version, version_right=mr.version,
        )

    def _as_inserts(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lsn": pa.array([1] * batch.num_rows, pa.int64()),
                "op": pa.array(["INSERT"] * batch.num_rows),
                **{c: batch[c] for c in batch.column_names},
            }
        )

    feed = rows.map_batches(_as_inserts, batch_format="pyarrow")
    apply_changes(
        feed, view_root, key=kl,
        num_partitions=num_partitions or ml.num_partitions,
    )
    meta = {
        "left_root": os.path.abspath(left_root),
        "right_root": os.path.abspath(right_root),
        "how": how,
        "columns_left": columns_left,
        "columns_right": columns_right,
        "right_suffix": right_suffix,
        "left_key": kl,
        "right_key": kr,
        "left_version": ml.version,
        "right_version": mr.version,
        "left_on": left_on,
    }
    if left_on is not None:
        from palimpzest_ray.cdc.colindex import build_column_index

        idx_root = os.path.join(view_root, "_fkidx")
        build_column_index(
            left_root, idx_root, left_on, key=kl,
            num_partitions=min(32, ml.num_partitions),
        )
        meta["fk_index"] = idx_root
    _store_meta(view_root, meta)
    return meta


def _fk_join(
    left_root, right_root, *, how, left_on, kl, kr,
    columns_left, columns_right, right_suffix,
    version_left, version_right,
) -> rd.Dataset:
    """General fact⋈dim build: left joins on ``left_on`` against the
    right key — not co-partitioned, so this is the engine's auto
    broadcast/shuffle join (nested-payload-safe), not join_lakes'
    zero-exchange plan. Output columns match the refresh kernel's
    (_nested_safe_join) by construction: left columns, then right
    non-key columns with ``right_suffix`` on collisions."""
    from palimpzest_ray.cdc.engine import final_state
    from palimpzest_ray.dataset import Dataset

    cl = columns_left
    if cl is not None:
        cl = list(dict.fromkeys([kl, left_on, *cl]))
    cr = columns_right
    if cr is not None:
        cr = list(dict.fromkeys([kr, *cr]))
    lds = Dataset(final_state(left_root, columns=cl, version=version_left))
    rds = Dataset(final_state(right_root, columns=cr, version=version_right))

    def _ren(batch: pa.Table) -> pa.Table:
        return batch.rename_columns([
            left_on if c == kr else c for c in batch.column_names
        ])

    rds = rds.map_batches(_ren)
    return lds.join(
        rds, on=left_on, how=how, suffix=right_suffix
    )._ds


def read_join_view(view_root: str) -> rd.Dataset:
    from palimpzest_ray.cdc.engine import final_state

    return final_state(view_root)


def refresh_join_view(view_root: str) -> dict:
    """Catch the view up to both lakes' heads: changed keys only. With
    ``left_on`` (fact⋈dim), changed DIM keys resolve to affected FACT
    keys through the fk column index (refreshed to the fact head first
    — O(changes)), so the recomputed set is exact on both ripples."""
    meta = _load_meta(view_root)
    left_root, right_root = meta["left_root"], meta["right_root"]
    ml = load_latest_manifest(left_root)
    mr = load_latest_manifest(right_root)
    lv0, rv0 = meta["left_version"], meta["right_version"]
    if ml.version == lv0 and mr.version == rv0:
        return {**meta, "keys_refreshed": 0, "noop": True}
    kl, kr = meta["left_key"], meta["right_key"]
    left_on = meta.get("left_on")

    ktype = load_latest_manifest(view_root).schema.field(kl).type

    def _keys(root, v0, kcol, out_type) -> pa.ChunkedArray:
        feed = net_changes_since(root, v0).select_columns([kcol])
        batches = list(feed.iter_batches(batch_format="pyarrow"))
        if not batches:
            return pa.chunked_array([], out_type)
        t = pa.concat_tables(batches, promote_options="permissive")
        return t[kcol].cast(out_type)

    empty = pa.chunked_array([], ktype)
    keys_l = _keys(left_root, lv0, kl, ktype) if ml.version != lv0 else empty
    if left_on is None:
        keys_r = (
            _keys(right_root, rv0, kr, ktype)
            if mr.version != rv0 else empty
        )
    elif mr.version != rv0:
        # dim ripple: changed dim keys -> fact keys via the fk index
        from palimpzest_ray.cdc.colindex import refresh_column_index

        idx_root = meta["fk_index"]
        refresh_column_index(left_root, idx_root)
        rk_type = mr.schema.field(kr).type
        changed_dims = pc.unique(
            _keys(right_root, rv0, kr, rk_type)
        ).to_pylist()
        if changed_dims:
            hits = lookup(
                idx_root, changed_dims, key="value", columns=["doc_id"]
            )
            keys_r = hits["doc_id"].cast(ktype)
        else:
            keys_r = empty
    else:
        keys_r = empty
    if isinstance(keys_r, pa.Array):
        keys_r = pa.chunked_array([keys_r], ktype)
    karr = pc.unique(
        pa.chunked_array(list(keys_l.chunks) + list(keys_r.chunks), ktype)
    )
    if len(karr) == 0:
        meta.update(left_version=ml.version, right_version=mr.version)
        _store_meta(view_root, meta)
        return {**meta, "keys_refreshed": 0, "noop": True}
    keys = karr.to_pylist()
    cl = meta["columns_left"]
    if left_on is not None and cl is not None:
        cl = list(dict.fromkeys([left_on, *cl]))
    lt = lookup(
        left_root, keys, key=kl, columns=cl,
        version=ml.version,
    )
    if left_on is None:
        rt = lookup(
            right_root, keys, key=kr, columns=meta["columns_right"],
            version=mr.version,
        )
        joined = _nested_safe_join(
            lt, rt, kl, kr, _JOIN_TYPES[meta["how"]], meta["right_suffix"]
        )
    else:
        fks = pc.unique(pc.drop_null(lt[left_on])).to_pylist()
        rt = (
            lookup(
                right_root, fks, key=kr, columns=meta["columns_right"],
                version=mr.version,
            )
            if fks
            else mr.schema.empty_table().select(
                [kr] + (meta["columns_right"] or [
                    f.name for f in mr.schema
                    if f.name != kr and f.name not in _INTERNAL
                ])
            )
        )
        joined = _nested_safe_join(
            lt, rt, left_on, kr, _JOIN_TYPES[meta["how"]],
            meta["right_suffix"]
        )
    mv = load_latest_manifest(view_root)
    lsn = int(mv.max_lsn) + 1
    n = joined.num_rows
    ups = pa.table(
        {
            "lsn": pa.array([lsn] * n, pa.int64()),
            "op": pa.array(["UPDATE"] * n),
            **{c: joined[c] for c in joined.column_names},
        }
    )
    # keys that no longer produce a join row leave the view
    gone = pc.filter(
        karr, pc.invert(pc.is_in(karr, value_set=joined[kl].combine_chunks()))
    )
    dels = pa.table(
        {
            "lsn": pa.array([lsn] * len(gone), pa.int64()),
            "op": pa.array(["DELETE"] * len(gone)),
            kl: gone,
        }
    )
    feed = (
        pa.concat_tables([ups, dels], promote_options="default")
        if len(gone)
        else ups
    )
    apply_changes(
        feed, view_root, key=kl, num_partitions=mv.num_partitions,
        change_schema=feed.schema,
    )
    meta.update(left_version=ml.version, right_version=mr.version)
    _store_meta(view_root, meta)
    return {
        **meta,
        "keys_refreshed": len(keys),
        "rows_upserted": n,
        "rows_deleted": len(gone),
        "noop": False,
    }
