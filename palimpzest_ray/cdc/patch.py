"""Partial-image (patch) update semantics over the exactly-once apply.

Real CDC feeds often carry PARTIAL update images: Mongo change-stream
``updateDescription``, DynamoDB streams with projections, Debezium
sources configured without full row images (``REPLICA IDENTITY`` short
of FULL). An UPDATE event then means "SET the present columns, carry
everything else forward" — which the row-level LWW apply cannot express
(it replaces whole rows). The reference engine has no notion of row
state at all (one-shot pipelines, ``convert.py`` maps rows forward);
this is lake machinery the 100-TB CDC tier needs.

Design: LAYERED, not a new merge mode. :func:`fold_patch_events`
composes a patch batch column-wise in LSN order against the live base
rows of the patched keys (a partition-pruned :func:`~.engine.lookup`,
never a lake scan), producing ordinary FULL-image change rows — one per
key at the key's max LSN — which flow through
:func:`~.engine.apply_changes` unchanged, so the exactly-once manifest,
rewrite/delta modes, schema evolution, time travel, and multi-writer
rebase all inherit for free.

Algebra note (why the fold happens before the apply): column-wise LWW
is only associative when every collapsed value carries its own
per-column LSN — two pre-collapsed patch segments can interleave per
column (segment A's lsn-10 ``x`` beats segment B's lsn-5 ``x`` even
though B's row-max lsn is 20). Folding each batch against the
then-current base in LSN order sidesteps that per-column-provenance
bookkeeping. Larger-than-memory patch logs apply as sequential
LSN-ordered chunks (``chunk_events``), each bounded; wide batches keep
the fold off the driver via the key-partitioned distributed fold
(``fold="ray"``): every event for a key hashes to one partition, so
per-partition folds compose independently and each group's base fetch
prunes to exactly its own partition chain.

Semantics (pinned by tests/test_cdc_patch.py):

- ``UPDATE``: a NULL column is ABSENT — carried forward. Setting a
  column to NULL therefore requires a full ``INSERT`` image (or
  DELETE + patch); this is the Debezium partial-image / Mongo ``$set``
  convention.
- ``INSERT``: full image; its nulls are real nulls and RESET the row.
- ``DELETE``: tombstone; a LATER patch resurrects the key with only
  the patched columns set (Mongo upsert behavior).
- A patch of a key absent from the lake upserts a row with only the
  patched columns set.
- Ties at equal ``lsn`` resolve by input order (later event wins).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from palimpzest_ray.schemas import CHANGE_OPS, conform, unify

#: pseudo-LSN for base rows inside the fold: below every real LSN, so a
#: base row is an INSERT barrier that every event in the batch outranks
BASE_LSN = -(2**62)


def _as_aug(
    t: pa.Table,
    lsn: pa.Array | pa.ChunkedArray,
    op: pa.Array | pa.ChunkedArray,
    key: str,
    user_schema: pa.Schema,
) -> pa.Table:
    """Project ``t`` onto (lsn, op, <user_schema>) with typed nulls for
    columns it lacks."""
    body = conform(t, user_schema)
    out = pa.table(
        {"__lsn": lsn.cast(pa.int64()), "__op": op,
         **{c: body[c] for c in body.column_names}}
    )
    assert key in out.column_names
    return out


def fold_patch_events(
    events: pa.Table,
    base: pa.Table | None = None,
    *,
    key: str = "doc_id",
    lsn_col: str = "lsn",
    op_col: str = "op",
    user_schema: pa.Schema | None = None,
    sum_cols: tuple[str, ...] | list[str] = (),
    max_cols: tuple[str, ...] | list[str] = (),
    min_cols: tuple[str, ...] | list[str] = (),
) -> pa.Table:
    """Fold mixed INSERT / UPDATE-patch / DELETE events per key in LSN
    order into FULL-image change rows (one per key, at the key's max
    LSN), composing patches onto ``base`` (the patched keys' live lake
    rows) column-wise.

    Fully vectorized: one stable multi-key sort, then per-column
    "last non-null position per group" via ``np.maximum.reduceat`` and
    ONE ``take`` per column — no per-row Python, list/struct payloads
    (token arrays) move exactly once.

    ``sum_cols`` switches the named numeric columns to ACCUMULATE
    semantics (ClickHouse SummingMergeTree / Hudi merge-payload shape):
    an UPDATE's value there is a DELTA added to the current value
    rather than a replacement. Per key the folded value is the sum of
    every non-null delta AFTER the last barrier, plus the barrier
    image's own value when that barrier is an INSERT — and the base
    row enters the fold as an INSERT at ``BASE_LSN``, so a delta feed
    composes to ``current + Σ deltas`` exactly. A key with no
    contribution at all (e.g. resurrected with no delta for that
    column) folds to NULL — matching SQL's SUM over an empty set.
    Non-sum columns keep patch semantics (null = carried forward).

    ``max_cols`` / ``min_cols`` are the other two decomposable merge
    policies (ClickHouse AggregatingMergeTree's max/min states): an
    UPDATE's value is a CANDIDATE folded by running extremum over the
    same contribution window (after the last barrier, plus an INSERT
    barrier's own value), so "high-water mark" / "first-seen" columns
    maintain themselves through the ordinary change feed. The three
    policy sets must be disjoint; every policy column folds to NULL
    when the window is empty.
    """
    if events.num_rows == 0:
        return events
    sum_cols = tuple(sum_cols)
    max_cols = tuple(max_cols)
    min_cols = tuple(min_cols)
    policy = {c: "sum" for c in sum_cols}
    for cs, nm in ((max_cols, "max"), (min_cols, "min")):
        for c in cs:
            if c in policy:
                raise ValueError(
                    f"column {c!r} given more than one merge policy"
                )
            policy[c] = nm
    if key in policy or lsn_col in policy or op_col in policy:
        raise ValueError("merge-policy cols cannot include key/lsn/op")
    for c in (lsn_col, op_col, key):
        if c not in events.column_names:
            raise ValueError(f"patch events missing required column {c!r}")
    if events[lsn_col].null_count or events[key].null_count:
        raise ValueError("null lsn/key in patch events")
    ok = pc.is_in(events[op_col], value_set=pa.array(CHANGE_OPS))
    if events.num_rows - (pc.sum(ok.cast(pa.int64())).as_py() or 0):
        raise ValueError(f"patch events with op outside {CHANGE_OPS}")

    if user_schema is None:
        user_schema = pa.schema(
            [f for f in events.schema if f.name not in (lsn_col, op_col)]
        )
        if base is not None and base.num_rows:
            user_schema = unify(user_schema, base.schema)
    parts = [
        _as_aug(events, events[lsn_col], events[op_col], key, user_schema)
    ]
    if base is not None and base.num_rows:
        nb = base.num_rows
        parts.insert(
            0,
            _as_aug(
                base,
                pa.array(np.full(nb, BASE_LSN, dtype=np.int64)),
                pa.array(np.full(nb, "INSERT")),
                key,
                user_schema,
            ),
        )
    aug = (
        pa.concat_tables(parts, promote_options="default")
        if len(parts) > 1
        else parts[0]
    ).combine_chunks()
    n = aug.num_rows
    pos = np.arange(n, dtype=np.int64)
    # equal-lsn ties resolve by input order (base rows never tie: BASE_LSN)
    aug = aug.append_column("__pos", pa.array(pos))
    sidx = pc.sort_indices(
        aug,
        sort_keys=[(key, "ascending"), ("__lsn", "ascending"),
                   ("__pos", "ascending")],
    )
    keys_s = aug[key].combine_chunks().take(sidx)
    ops_s = aug["__op"].combine_chunks().take(sidx)
    lsn_s = aug["__lsn"].combine_chunks().take(sidx).to_numpy()

    first = np.ones(n, dtype=bool)
    if n > 1:
        first[1:] = pc.not_equal(
            keys_s.slice(1), keys_s.slice(0, n - 1)
        ).to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(first)
    counts = np.diff(np.append(starts, n))
    ends = np.append(starts[1:], n) - 1

    op_np = ops_s.to_numpy(zero_copy_only=False)
    is_barrier = op_np != "UPDATE"  # INSERT/DELETE are full images
    cand_b = np.where(is_barrier, pos, np.int64(-1))
    b = np.maximum.reduceat(cand_b, starts)  # last barrier per group
    b_row = np.repeat(b, counts)
    barrier_is_insert = (b >= 0) & (op_np[np.maximum(b, 0)] == "INSERT")
    final_delete = op_np[ends] == "DELETE"

    user_cols = [f.name for f in user_schema if f.name != key]
    for c, nm in policy.items():
        if c not in user_cols:
            raise ValueError(f"{nm}_cols column {c!r} not in the fold schema")
        t = user_schema.field(c).type
        if not (pa.types.is_integer(t) or pa.types.is_floating(t)):
            raise ValueError(f"{nm}_cols column {c!r} must be numeric, got {t}")
    bi_row = np.repeat(barrier_is_insert, counts)
    out_cols: dict[str, pa.Array] = {key: keys_s.take(pa.array(ends))}
    for c in user_cols:
        col_s = aug[c].combine_chunks().take(sidx)
        valid = pc.is_valid(col_s).to_numpy(zero_copy_only=False)
        if c in policy:
            # decomposable merge policy over the contribution window:
            # every non-null value AFTER the barrier, plus the barrier
            # image's own value when that barrier is an INSERT (the
            # base row included — sum IS "current + Σ deltas", max IS
            # the running high-water mark, etc.)
            contrib = valid & ((pos > b_row) | ((pos == b_row) & bi_row))
            t = user_schema.field(c).type
            is_int = pa.types.is_integer(t)
            nm = policy[c]
            if nm == "sum":
                neutral, ufunc = 0, np.add
            elif nm == "max":
                neutral = np.iinfo(np.int64).min if is_int else -np.inf
                ufunc = np.maximum
            else:
                neutral = np.iinfo(np.int64).max if is_int else np.inf
                ufunc = np.minimum
            acc = (
                pc.fill_null(col_s, 0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64 if is_int else np.float64)
            )
            sums = ufunc.reduceat(np.where(contrib, acc, neutral), starts)
            cnt = np.add.reduceat(contrib.astype(np.int64), starts)
            out_cols[c] = pa.array(
                sums, mask=(cnt == 0) | final_delete
            ).cast(t)
            continue
        # last position per group holding a value set AFTER the barrier
        cand = np.where(valid & (pos > b_row), pos, np.int64(-1))
        last_patch = np.maximum.reduceat(cand, starts)
        # else the barrier image itself (INSERT nulls stay null: j = b
        # still takes the null); DELETE barrier / no barrier ⇒ null
        j = np.where(
            last_patch >= 0, last_patch, np.where(barrier_is_insert, b, -1)
        )
        j = np.where(final_delete, np.int64(-1), j)  # tombstone payload
        out_cols[c] = col_s.take(pa.array(j, mask=j < 0))

    out = pa.table(
        {
            "lsn": pa.array(lsn_s[ends]),
            "op": pa.array(np.where(final_delete, "DELETE", "UPDATE")),
            **out_cols,
        }
    )
    # a base-only group (no event) cannot normally occur — the base is
    # fetched for patched keys — but a caller-supplied wider base must
    # not re-emit untouched rows
    live = lsn_s[ends] != BASE_LSN
    if not live.all():
        out = out.filter(pa.array(live))
    return out


def _load_events(changes) -> pa.Table:
    from palimpzest_ray.cdc.engine import _expand_paths

    if isinstance(changes, pa.Table):
        return changes
    if isinstance(changes, rd.Dataset):
        return pa.concat_tables(
            changes.iter_batches(batch_format="pyarrow", batch_size=65536),
            promote_options="permissive",
        )
    files = _expand_paths(changes)
    return pa.concat_tables(
        [pq.read_table(f) for f in files], promote_options="permissive"
    )


def apply_patches(
    changes: str | list[str] | pa.Table | rd.Dataset,
    lake_root: str,
    *,
    key: str = "doc_id",
    chunk_events: int | None = None,
    fold: str = "auto",
    since_lsn: int | None = None,
    sum_cols: tuple[str, ...] | list[str] = (),
    max_cols: tuple[str, ...] | list[str] = (),
    min_cols: tuple[str, ...] | list[str] = (),
    **apply_kwargs,
):
    """Apply a partial-image (patch) change batch to the lake.

    Folds the batch to full-image change rows (see module docstring)
    and commits them through :func:`~.engine.apply_changes` — one
    exactly-once commit per chunk. Replaying the same batch converges
    (composed rows re-fold to identical content at identical LSNs; the
    equal-LSN merge tie rewrites equal bytes).

    ``chunk_events`` bounds memory for very large patch logs: the batch
    applies as sequential LSN-ordered chunks, each folded against the
    then-current lake — sequential composition is exactly per-event
    replay, so any chunking converges to the same state.

    ``fold`` picks where composition runs: ``"local"`` on the driver
    (change-sized batches — the steady state), ``"ray"`` as a
    key-partitioned distributed fold (``groupby(bucket).map_groups``;
    each group's base fetch prunes to its own partition chain),
    ``"auto"`` by batch size against the engine's driver-local bound.
    Returns the last chunk's :class:`~.engine.ApplyResult`.
    """
    from palimpzest_ray.cdc.engine import (
        LOCAL_APPLY_MAX_BYTES,
        apply_changes,
        load_latest_manifest,
        lookup,
    )

    from palimpzest_ray.cdc.engine import ApplyResult

    events = _load_events(changes)
    _m0 = load_latest_manifest(lake_root)
    if _m0 is not None and _m0.renames:
        # column-mapping: a patch from an un-migrated producer may
        # carry a renamed column under its historical name — the fold
        # must see logical names (its carry-forward is column-wise)
        from palimpzest_ray.schemas import rename_to_logical

        both = [
            o for o, n in _m0.renames.items()
            if o in events.column_names and n in events.column_names
        ]
        if both:
            raise ValueError(
                f"patch feed carries renamed column(s) under both names: "
                f"{both} — drop one"
            )
        events = rename_to_logical(events, _m0.renames)
    if since_lsn is not None and events.num_rows:
        # tail semantics: only events past the committed watermark
        events = events.filter(
            pc.greater(events["lsn"].cast(pa.int64()), pa.scalar(since_lsn))
        )
    if events.num_rows == 0:
        if since_lsn is not None:
            from palimpzest_ray.cdc.engine import load_latest_manifest

            prev = load_latest_manifest(lake_root)
            if prev is None:
                raise FileNotFoundError("empty patch log and no committed version")
            return ApplyResult(prev, 0, 0, 0, 0, 0)
        raise ValueError("empty patch batch")
    events = events.sort_by("lsn")  # chunk boundaries must be LSN-ordered
    chunks: list[pa.Table] = (
        [events]
        if not chunk_events
        else [
            events.slice(i, chunk_events)
            for i in range(0, events.num_rows, chunk_events)
        ]
    )
    from palimpzest_ray.schemas import LSN_COL, TOMBSTONE_COL

    events_user = pa.schema(
        [f for f in events.schema if f.name not in ("lsn", "op")]
    )
    caller_schema = apply_kwargs.pop("change_schema", None)
    # A producer txn must cover the WHOLE batch: stamping chunk 1 would
    # make later chunks no-op at the watermark check, so it goes on the
    # FINAL chunk only. A crash mid-chunks leaves the txn unrecorded and
    # the retry re-runs — idempotent for plain patches (SETs); for
    # sum_cols the retry must pass since_lsn = the lake watermark (the
    # tail idiom, see apply_accumulate's consumption contract).
    txn = apply_kwargs.pop("txn", None)
    result = None
    for ci, chunk in enumerate(chunks):
        chunk_txn = txn if ci + 1 == len(chunks) else None
        manifest = load_latest_manifest(lake_root)
        pinned = manifest.version if manifest is not None else None
        # one unified user schema for every fold group, so distributed
        # groups (some with empty bases) emit identical block schemas
        target_user = events_user
        if manifest is not None:
            target_user = unify(
                events_user,
                pa.schema(
                    [f for f in manifest.schema
                     if f.name not in (LSN_COL, TOMBSTONE_COL)]
                ),
            )
        composed_schema = pa.schema(
            [pa.field("lsn", pa.int64()), pa.field("op", pa.string())]
            + list(target_user)
        )

        def _fold_group(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return composed_schema.empty_table()
            keys = pc.unique(batch[key]).to_pylist()
            base = (
                lookup(lake_root, keys, key=key, version=pinned)
                if pinned is not None
                else None
            )
            out = fold_patch_events(
                batch, base, key=key, user_schema=target_user,
                sum_cols=sum_cols, max_cols=max_cols, min_cols=min_cols,
            )
            return conform(out, composed_schema)

        mode = fold
        if mode == "auto":
            mode = "local" if chunk.nbytes <= LOCAL_APPLY_MAX_BYTES else "ray"
        if mode == "local":
            composed: pa.Table | rd.Dataset = _fold_group(chunk)
        elif mode == "ray":
            from palimpzest_ray.functions.tokens import stable_bucket

            nparts = (
                manifest.num_partitions
                if manifest is not None
                else apply_kwargs.get("num_partitions", 32)
            )
            ds = rd.from_arrow(chunk)
            ds = ds.map_batches(
                lambda b: b.append_column(
                    "__fold_part", pa.array(stable_bucket(b[key], nparts))
                ),
                batch_format="pyarrow",
            )
            composed = (
                ds.groupby("__fold_part")
                .map_groups(
                    lambda g: _fold_group(g.drop_columns(["__fold_part"])),
                    batch_format="pyarrow",
                )
            )
        else:
            raise ValueError(f"fold={fold!r} not in ('auto', 'local', 'ray')")
        result = apply_changes(
            composed,
            lake_root,
            key=key,
            change_schema=caller_schema or composed_schema,
            txn=chunk_txn,
            **apply_kwargs,
        )
    return result


def apply_accumulate(
    changes: str | list[str] | pa.Table | rd.Dataset,
    lake_root: str,
    *,
    sum_cols: tuple[str, ...] | list[str] = (),
    max_cols: tuple[str, ...] | list[str] = (),
    min_cols: tuple[str, ...] | list[str] = (),
    **patch_kwargs,
):
    """Apply a DELTA (accumulating-counter) change batch to the lake —
    the ClickHouse ``SummingMergeTree`` / Hudi merge-payload semantics
    expressed through the exactly-once apply.

    ``sum_cols`` columns on UPDATE events carry DELTAS added to the
    key's current value; INSERT resets to the event's absolute image;
    DELETE tombstones (a later delta resurrects, summing from empty =
    NULL start + deltas). Every other column keeps patch semantics
    (null = carried forward). The batch folds to absolute full-image
    rows against the live lake (:func:`fold_patch_events` with
    ``sum_cols``) and commits through :func:`~.engine.apply_changes`,
    so exactly-once, rewrite/delta modes, schema evolution, time
    travel and multi-writer rebase all inherit.

    CONSUMPTION CONTRACT: unlike full-image LWW (and unlike patches,
    whose SETs are naturally idempotent), re-applying the same RAW
    delta events would double-add. The COMPOSED commit itself is
    idempotent (absolute values at the keys' max LSNs — a crash-rerun
    of the same call converges via LWW), but a caller re-feeding old
    events must pass ``since_lsn`` (the lake watermark), exactly as
    ``tail_once`` does. Accumulate feeds should be consumed through
    the watermarked tail path, never blind re-reads of the topic.
    (``max_cols`` / ``min_cols`` candidates, unlike sum deltas, ARE
    idempotent under re-read — extremum is absorbing — but a mixed
    feed inherits the strictest contract.)

    ``max_cols`` / ``min_cols`` fold by running extremum instead — the
    AggregatingMergeTree max/min states: high-water marks (latest
    event-time seen, max severity) and first-seen marks (min
    first_seen_lsn) maintain themselves from the raw feed. The three
    policy sets must be disjoint.
    """
    if not (sum_cols or max_cols or min_cols):
        raise ValueError(
            "apply_accumulate requires at least one sum/max/min column"
        )
    return apply_patches(
        changes, lake_root, sum_cols=sum_cols, max_cols=max_cols,
        min_cols=min_cols, **patch_kwargs,
    )
