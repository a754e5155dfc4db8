"""Incremental inverted token index as a DERIVED LAKE: posting rows
``(posting_id="token:doc", token, doc_id)`` maintained by the same CDC
engine that maintains the document lake — which means the index gets
exactly-once commits, checkpoint/resume, tombstones, time travel and
vacuum for free instead of a bespoke index format.

Layout is the trick: the posting lake is keyed on ``posting_id`` (the
LWW identity) but PARTITIONED by ``token`` (``apply_changes
partition_key="token"``), so a search for a token reads exactly one
partition file out of P — the same pruning :func:`engine.lookup` does
for documents, applied to the token dimension. (Legal because the
partition column is a pure function of the key.)

Maintenance mirrors view refresh (cdc/views.py): the doc-lake change
feed names the changed doc_ids; their OLD postings come from the
time-traveled doc lake at the index's base version, their NEW postings
from the feed's live rows (old postings via a semi-join of the time-traveled
lake — distributed, churn can be lake-sized). The change log is then
``DELETE(old posting not in new)`` + ``UPSERT(new posting)``, applied
with each event carrying the doc's feed LSN — multi-epoch refreshes
stay correct because the feed is the NET diff.

Scale: posting volume ≈ Σ distinct tokens per doc. Everything is
``flat_map``-shaped (one pass over changed docs), the exchange is the
engine's keyed shuffle, and only partitions whose tokens changed are
rewritten (untouched partitions carry forward by manifest reference).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from palimpzest_ray.cdc.engine import (
    apply_changes,
    final_state,
    load_latest_manifest,
    net_changes_since,
)

_META = "_token_index.json"

_POSTING_SCHEMA = pa.schema(
    [
        pa.field("lsn", pa.int64()),
        pa.field("op", pa.string()),
        pa.field("posting_id", pa.string()),
        pa.field("token", pa.int64()),
        pa.field("doc_id", pa.string()),
    ]
)


def _small_or_ds(events: rd.Dataset, n_events: int):
    """A change-sized refresh feed below the small-commit threshold is
    pulled to the driver as one Arrow table so ``apply_changes`` can
    take its zero-Ray-execution local path; larger feeds stay a
    Dataset and go through the distributed exchange."""
    if n_events > 200_000:
        return events
    import ray as _ray

    tabs = [t for t in _ray.get(events.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tabs, promote_options="default")


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


def _event_table(lsns: list, ops: list, toks: list, docs: list) -> pa.Table:
    """The ONE place posting identity is formatted — build and refresh
    must agree on it or LWW identity diverges between the two paths."""
    return pa.table(
        {
            "lsn": pa.array(lsns, pa.int64()),
            "op": pa.array(ops, pa.string()),
            "posting_id": pa.array(
                [f"{t}:{d}" for t, d in zip(toks, docs)], pa.string()
            ),
            "token": pa.array(toks, pa.int64()),
            "doc_id": pa.array(docs, pa.string()),
        },
        schema=_POSTING_SCHEMA,
    )


def _postings_batch(doc_ids, tokens_col, lsns, op: str) -> pa.Table:
    """(doc, tokens[], lsn) rows → exploded distinct posting events."""
    toks = tokens_col
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = toks.offsets.to_numpy(zero_copy_only=False)
    vals = toks.values.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    ids = doc_ids.to_pylist()
    out_tok: list[int] = []
    out_doc: list[str] = []
    out_lsn: list[int] = []
    for i, d in enumerate(ids):
        uniq = np.unique(vals[offs[i] : offs[i + 1]])
        out_tok.extend(int(t) for t in uniq)
        out_doc.extend([d] * len(uniq))
        out_lsn.extend([int(lsns[i])] * len(uniq))
    return _event_table(out_lsn, [op] * len(out_tok), out_tok, out_doc)


def build_token_index(
    lake_root: str,
    index_root: str,
    *,
    key: str = "doc_id",
    tokens_col: str = "tokens",
    num_partitions: int = 32,
) -> dict:
    """Full build: explode the doc lake's current live rows into
    distinct (token, doc) postings and bootstrap the posting lake."""
    manifest = load_latest_manifest(lake_root)
    if manifest is None:
        raise FileNotFoundError(f"no committed lake under {lake_root}")
    if load_latest_manifest(index_root) is not None:
        # a rebuild's INSERTs (lsn=0) cannot supersede existing postings
        # for tokens docs have since lost — stale postings would stay
        # live. Refresh instead, or build into a fresh root.
        raise ValueError(
            f"{index_root} already holds a posting lake — use "
            "refresh_token_index to catch it up, or a new index_root"
        )
    docs = final_state(lake_root, columns=[key, tokens_col])

    def _explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return _postings_batch(
            batch[key].combine_chunks() if isinstance(batch[key], pa.ChunkedArray)
            else batch[key],
            batch[tokens_col],
            np.zeros(n, dtype=np.int64),
            "INSERT",
        )

    events = docs.map_batches(_explode, batch_format="pyarrow")
    apply_changes(
        events,
        index_root,
        key="posting_id",
        partition_key="token",
        num_partitions=num_partitions,
        change_schema=_POSTING_SCHEMA,
    )
    meta = {
        "lake_version": manifest.version,
        "key": key,
        "tokens_col": tokens_col,
        "num_partitions": num_partitions,
    }
    _store_meta(index_root, meta)
    return meta


def refresh_token_index(lake_root: str, index_root: str) -> dict:
    """Incremental catch-up from the doc-lake change feed: posting
    deletes for tokens a changed doc lost, upserts for its current
    tokens. Only token partitions that changed are rewritten."""
    meta = _load_meta(index_root)
    base_v = meta["lake_version"]
    key, tokens_col = meta["key"], meta["tokens_col"]
    latest = load_latest_manifest(lake_root)
    if latest.version == base_v:
        return {"refreshed": False, "lake_version": base_v}
    # Event generation is DISTRIBUTED — the churn since base_v can be
    # lake-sized, so nothing feed-shaped converges on the driver:
    #   feed (net changes: new token sets, keyed by doc)
    #   ⟕ old rows (time-traveled base semi-joined to changed keys)
    #   → per-doc set diff inside map_batches → posting change events.
    from palimpzest_ray.dataset import Dataset as PzDataset

    feed = PzDataset(
        net_changes_since(lake_root, base_v).map_batches(
            lambda b: b.select(["lsn", "op", key, tokens_col]),
            batch_format="pyarrow",
        )
    )
    old_state = PzDataset(
        final_state(lake_root, version=base_v, columns=[key, tokens_col])
    ).rename_columns({tokens_col: "_old_tokens"})
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
        lsns = batch["lsn"].to_pylist()
        ops = batch["op"].to_pylist()
        docs = batch[key].to_pylist()
        news = batch[tokens_col].to_pylist()
        olds = batch["_old_tokens"].to_pylist()
        rows_lsn, rows_op, rows_tok, rows_doc = [], [], [], []
        for lsn, op, d, new, old in zip(lsns, ops, docs, news, olds):
            new_s = set(new or []) if op == "UPDATE" else set()
            for t in sorted(set(old or []) - new_s):
                rows_lsn.append(lsn); rows_op.append("DELETE")
                rows_tok.append(int(t)); rows_doc.append(d)
            for t in sorted(new_s):
                rows_lsn.append(lsn); rows_op.append("UPDATE")
                rows_tok.append(int(t)); rows_doc.append(d)
        return _event_table(rows_lsn, rows_op, rows_tok, rows_doc)

    events = joined.ray.map_batches(_emit, batch_format="pyarrow").materialize()
    n_events = events.count()  # metadata-only on the pinned result
    if n_events:
        apply_changes(
            _small_or_ds(events, n_events),
            index_root,
            key="posting_id",
            partition_key="token",
            num_partitions=meta["num_partitions"],
            change_schema=_POSTING_SCHEMA,
        )
    meta["lake_version"] = latest.version
    _store_meta(index_root, meta)
    return {"refreshed": True, "from_version": base_v,
            "lake_version": latest.version, "posting_events": n_events}


def search_tokens(
    index_root: str, tokens: list[int], *, mode: str = "any"
) -> list[str]:
    """doc_ids containing ANY / ALL of ``tokens`` — a partition-pruned
    read of ≤ len(tokens) posting partitions (engine.lookup pruning on
    the token dimension), never an index scan."""
    if mode not in ("any", "all"):
        raise ValueError("mode must be 'any' or 'all'")
    # postings are keyed on posting_id but PARTITIONED by token, so
    # engine.lookup's pruning applies verbatim on the token dimension
    # (ONE partition-pruned read path, not a re-implementation)
    from palimpzest_ray.cdc.engine import lookup

    t = lookup(index_root, [int(x) for x in tokens], key="token",
               columns=["token", "doc_id"])
    hits: dict[str, set] = {}
    for tok, doc in zip(t["token"].to_pylist(), t["doc_id"].to_pylist()):
        hits.setdefault(doc, set()).add(tok)
    want = set(int(t) for t in tokens)
    if mode == "any":
        return sorted(hits)
    return sorted(d for d, s in hits.items() if want <= s)
