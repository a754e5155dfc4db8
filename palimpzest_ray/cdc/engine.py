"""The CDC / incremental-ingest engine (the north-rule headline).

Pipeline (all Ray Data, streaming, zero-copy Arrow batches)::

    ray.data.read_parquet(change_log)                     # prune at the read
      -> map_batches(normalize)        # validate ops, derive n_tok,
                                       #   conform to unified schema,
                                       #   assign part = hash(doc_id) % P,
                                       #   fused per-block LWW combiner
                                       #   (bounds shuffle volume; hot keys
                                       #   collapse to 1 row per block)
      -> repartition(keys=["__part"])  # the one all-to-all exchange
                                       #   (scoped HASH_SHUFFLE — key
                                       #   co-location without a sort)
      -> map_batches(MergeApplier)     # stateful merge actor pool: each
                                       #   block holds whole partitions;
                                       #   fused single-take LWW vs base,
                                       #   tombstones, staged Parquet
                                       #   write + .done sidecar
      -> (driver) commit manifest      # exactly-once version flip

Design notes for 10^10 events / 100 TB:

- The per-batch combiner is the skew treatment: a Zipf-hot ``doc_id``
  contributes at most one row per input block to the shuffle, so the
  shuffle stays balanced; a second LWW pass inside the merge resolves
  across blocks. This replaces explicit key-salting with a strictly
  cheaper algebraic combine — LWW is commutative and associative per
  key, so order between partitions and between blocks is free
  (SURVEY.md §4 "Ordering"; the reference's nondeterministic
  ``as_completed`` ordering at ``parallel_execution_strategy.py:65`` is
  the anti-pattern this avoids).
- Each partition merge is independent and writes its own staged file +
  watermark sidecar, so a failed run resumes by skipping finished
  partitions (checkpoint/resume), and reruns are idempotent: LWW
  against the persisted ``_lsn`` column means applying the same events
  twice converges to the same bytes.
- Memory: a merge holds one partition's latest-change memtable plus its
  base partition — until the base outgrows ``streaming_threshold_rows``,
  when it switches to the bounded-memory streaming merge-join
  (``MergeApplier._merge_streaming``): peak memory = one base batch +
  the partition's LWW-reduced changes, regardless of partition size.
  ``num_partitions`` then only tunes parallelism and file sizes, not a
  memory ceiling.
- Replay contract: applying whole log segments is COMMUTATIVE, not
  just events within one — tombstones are persisted (payload-null rows
  with ``_deleted=true``), so a late-arriving older segment can never
  resurrect a deleted key. Tombstone retention is explicit:
  ``repartition_lake(drop_tombstones_below=wm)`` compacts them away
  once no out-of-order segment below ``wm`` can still arrive.

Capability lineage vs the reference: replaces Palimpzest's in-memory
operator state (``join.py:274-276`` retained inputs, ``distinct.py:12``
seen-set) with keyed shuffles + partition-scoped state, per SURVEY.md §4.
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
import shutil
import uuid
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from palimpzest_ray.cdc.bloom import (
    bloom_might_contain,
    load_bloom,
    write_bloom_sidecar,
)
from palimpzest_ray.cdc.manifest import (
    _CARRY,
    LakeManifest,
    PartEntry,
    commit_version,
    load_latest_manifest,
)
from palimpzest_ray.functions.tokens import (
    first_per_key,
    limit_kernel_threads,
    stable_bucket,
    token_length,
)
from palimpzest_ray.schemas import (
    CHANGE_OPS,
    LSN_COL,
    TOMBSTONE_COL,
    conform,
    drop_internal,
    physical_columns,
    rename_to_logical,
    unify,
)

PART_COL = "__part"
SRC_COL = "__is_change"
#: pseudo-partition id that routes rows failing validation through the
#: ordinary exchange to the dead-letter writer instead of a merge
QUARANTINE_PART = -1
#: per-row diagnostics column on quarantined events (comma-joined names
#: of the failed checks, in check order); all-null on healthy rows while
#: they share blocks with quarantined ones
ERRORS_COL = "_errors"
#: exchange="auto" applies change logs at or below this many input bytes
#: driver-locally (zero Ray executions — the frequent-small-epoch fast
#: path); larger logs take the distributed exchange
LOCAL_APPLY_MAX_BYTES = 32 << 20
#: newest run reports kept under <lake>/.runs (older ones are pruned at
#: each apply so a forever-tailing lake never accumulates them unboundedly)
RUN_REPORTS_KEEP = 512
#: final_state switches a delta-bearing partition to the streaming
#: chain resolver when its BASE file exceeds this many rows (same
#: bound class as MergeApplier's streaming_threshold_rows)
RESOLVE_STREAM_THRESHOLD_ROWS = 4_000_000


def _tombstone_count(table: pa.Table) -> int:
    """Rows marked deleted (null-tolerant; old files lack the column)."""
    if TOMBSTONE_COL not in table.column_names:
        return 0
    return int(
        pc.sum(
            pc.coalesce(table[TOMBSTONE_COL], pa.scalar(False)).cast(pa.int64())
        ).as_py()
        or 0
    )


def lww_latest(table: pa.Table, key: str = "doc_id", lsn: str = "lsn") -> pa.Table:
    """Last-writer-wins reduction: keep the max-``lsn`` row per key.

    Ties (duplicate-LSN replay) break toward the change side via the
    ``__is_change`` marker when present — deterministic either way
    because a duplicated LSN carries identical content.
    """
    order = [(lsn, "descending")]
    if SRC_COL in table.column_names:
        order.append((SRC_COL, "descending"))
    return first_per_key(table, key, order)


_SEQ_COL = "__seq"


def _resolve_chain(tables: list[pa.Table], key: str, schema: pa.Schema) -> pa.Table:
    """LWW-resolve a base+delta chain onto ``schema``.

    ``tables`` arrive in chain order (base first, deltas oldest ->
    newest); each holds at most one row per key (the merge and the
    delta writer both collapse). One fused sort by
    ``(key asc, _lsn desc, chain-seq desc)`` + adjacent-inequality
    first-per-key — the same single-payload-take shape as
    ``MergeApplier._merge``. Later chain position breaks ``_lsn`` ties
    (a replayed duplicate LSN carries identical content, so the
    tie-break is for determinism, not correctness). Output keeps
    tombstone marker rows; callers filter.
    """
    if len(tables) == 1:
        return conform(tables[0], schema)
    parts = []
    for seq, t in enumerate(tables):
        t = conform(t, schema)
        parts.append(
            t.append_column(
                _SEQ_COL, pa.array(np.full(t.num_rows, seq, dtype=np.int32))
            )
        )
    both = pa.concat_tables(parts).combine_chunks()
    if both.num_rows <= 1:
        return both.drop_columns([_SEQ_COL])
    idx = pc.sort_indices(
        both,
        sort_keys=[
            (key, "ascending"),
            (LSN_COL, "descending"),
            (_SEQ_COL, "descending"),
        ],
    )
    keys_sorted = both[key].combine_chunks().take(idx)
    n = len(keys_sorted)
    first = np.ones(n, dtype=bool)
    neq = pc.not_equal(keys_sorted.slice(1), keys_sorted.slice(0, n - 1))
    first[1:] = neq.to_numpy(zero_copy_only=False)
    winner_idx = idx.filter(pa.array(first))
    return both.take(winner_idx).drop_columns([_SEQ_COL])


def _resolve_chain_stream(
    files: list[str],
    key: str,
    schema: pa.Schema,
    batch_rows: int = 128 * 1024,
    renames: dict | None = None,
):
    """Bounded-memory chain resolution for a larger-than-memory BASE:
    the reader-side analogue of ``MergeApplier._merge_streaming``.

    Deltas are change-sized (the compaction contract bounds the chain),
    so they resolve in memory first — one winner per key, key-sorted,
    with later chain position breaking ``_lsn`` ties. The base file is
    canonically key-sorted and key-unique, so streaming it batch by
    batch and LWW-merging each batch against the delta keys in its key
    range yields globally key-sorted output with peak memory = one base
    batch + the resolved deltas. Yields :class:`pa.Table` chunks.
    """
    delta_tables = [
        conform(t, schema) for t in _read_chain(files[1:], renames=renames)
    ]
    # resolve among the deltas (chain order = seq order; base excluded)
    deltas = (
        _resolve_chain(delta_tables, key, schema)
        if delta_tables
        else schema.empty_table()
    )
    dk = np.array(deltas[key].to_pylist(), dtype=object)
    order = np.argsort(dk, kind="stable")
    deltas = deltas.take(pa.array(order))
    dk = dk[order]

    ci = 0
    pf = pq.ParquetFile(files[0])
    for rb in pf.iter_batches(batch_size=batch_rows):
        bt = rename_to_logical(pa.Table.from_batches([rb]), renames)
        if bt.num_rows == 0:
            continue
        bmax = bt[key][-1].as_py()
        j = int(np.searchsorted(dk, bmax, side="right"))
        chunk = deltas.slice(ci, j - ci)
        ci = j
        if chunk.num_rows:
            # base first (seq 0), delta chunk later (seq 1) — delta
            # wins ties, same contract as the in-memory resolver
            yield _resolve_chain([bt, chunk], key, schema)
        else:
            yield conform(bt, schema)
    leftover = deltas.slice(ci)
    if leftover.num_rows:
        yield leftover


def _read_chain(
    files: list[str],
    columns: list[str] | None = None,
    renames: dict | None = None,
) -> list[pa.Table]:
    """Read a partition chain, pruning each file to the ``columns`` it
    actually has (a carried base may predate an evolved column).
    ``renames`` is the manifest's column-mapping: a logical column
    request is translated to the historical name a pre-rename file
    carries, and every table comes back under logical names — so no
    consumer downstream of a chain read ever sees a physical alias."""
    out = []
    for f in files:
        rc = None
        if columns is not None:
            present = set(pq.read_schema(f).names)
            rc = physical_columns(present, columns, renames)
        out.append(rename_to_logical(pq.read_table(f, columns=rc), renames))
    return out


def _lake_rows_as_changes(t: pa.Table) -> pa.Table:
    """Re-shape persisted lake rows (``_lsn``/``_deleted``) as change
    events — how delta files fold into a rewrite/streaming merge."""
    dead = (
        pc.coalesce(t[TOMBSTONE_COL], pa.scalar(False))
        if TOMBSTONE_COL in t.column_names
        else pa.array(np.zeros(t.num_rows, dtype=bool))
    )
    user = [c for c in t.column_names if c not in (LSN_COL, TOMBSTONE_COL)]
    return pa.table(
        {
            "lsn": pc.coalesce(t[LSN_COL], pa.scalar(0)).cast(pa.int64()),
            "op": pc.if_else(dead, pa.scalar("DELETE"), pa.scalar("INSERT")),
            **{c: t[c] for c in user},
        }
    )


@dataclasses.dataclass
class ApplyResult:
    manifest: LakeManifest
    events_seen: int
    rows_upserted: int
    rows_deleted: int
    partitions_rewritten: int
    partitions_resumed: int
    stats: str = ""  # ray Dataset.stats() of the merge pipeline
    lineage: list = dataclasses.field(default_factory=list)  # per-partition rows
    compaction: dict | None = None  # auto_compact report, when requested
    rows_quarantined: int = 0  # dead-lettered events (quarantine=True)
    quarantine_file: str | None = None  # published dead-letter parquet


def _expand_paths(changes: str | list[str]) -> list[str]:
    paths = [changes] if isinstance(changes, str) else list(changes)
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(sorted(glob.glob(os.path.join(p, "*.parquet"))))
        else:
            files.append(p)
    if not files:
        raise FileNotFoundError(f"no parquet files under {changes}")
    return files


def _unified_change_schema(files: list[str]) -> pa.Schema:
    """Unify footer schemas across log files — a mid-stream schema
    evolution means early files lack the added columns, and Ray's
    ``read_parquet`` reports only one file's schema. Footer-only reads:
    cheap, and embarrassingly parallel if ever needed."""
    return unify(*[pq.read_schema(f) for f in files])


def _rename_schema(schema: pa.Schema, renames: dict) -> pa.Schema:
    """Translate a change feed's historical column names to the lake's
    current logical names (the producer-compat half of
    ``alter_schema(rename=...)``: an un-migrated upstream keeps sending
    the old name and its events still apply). A feed carrying BOTH an
    old name and its logical name is ambiguous — refused outright (a
    producer bug, not a row-level quality issue)."""
    present = set(schema.names)
    out = []
    for f in schema:
        tgt = renames.get(f.name)
        if tgt is None:
            out.append(f)
            continue
        if tgt in present:
            raise ValueError(
                f"change feed carries both {f.name!r} and its renamed "
                f"form {tgt!r} — drop one (the lake maps {f.name!r} -> "
                f"{tgt!r} since alter_schema(rename=...))"
            )
        out.append(pa.field(tgt, f.type))
    names = [f.name for f in out]
    dup = {n for n in names if names.count(n) > 1}
    if dup:
        raise ValueError(
            f"change feed columns collide after rename mapping: {sorted(dup)}"
        )
    return pa.schema(out)


def _normalize_factory(
    target_schema: pa.Schema,
    num_partitions: int,
    key: str,
    partition_key: str | None = None,
    expectations: list[tuple[str, list[tuple]]] | None = None,
    quarantine: bool = False,
    key_cols: tuple[str, ...] | None = None,
    generated: dict | None = None,
    renames: dict | None = None,
):
    """Stateless normalize stage: validate + conform + partition-assign.

    Columnar analogue of the reference's scan-time field validation
    (``scan.py:95-124``): op ∈ {INSERT,UPDATE,DELETE}, non-null
    lsn/doc_id, ``n_tok`` derived from ``tokens`` where missing.

    ``expectations`` are named data-quality predicates (the
    ``[("col", op, value)]`` mini-language) every non-DELETE event must
    satisfy; a null value fails its expectation (an "expect" gate, not a
    SQL CHECK). With ``quarantine=False`` any violation — structural or
    expectation — fails the apply. With ``quarantine=True`` violating
    rows are routed to the dead-letter pseudo-partition
    (:data:`QUARANTINE_PART`) with a per-row :data:`ERRORS_COL` reason
    string, and the apply proceeds with the healthy rows (the Debezium
    dead-letter-topic / expectations pattern).
    """
    expectations = list(expectations or [])

    def normalize(batch: pa.Table) -> pa.Table:
        limit_kernel_threads()
        if renames:
            # producer-compat column mapping: events arriving under a
            # historical name land in the renamed (logical) column. A
            # batch carrying both names is a producer bug — the schema
            # plan already refused it; the guard in rename_to_logical
            # keeps this a no-op in that unreachable case.
            batch = rename_to_logical(batch, renames)
        if key_cols:
            # synthesize the composite record key (cdc.keys encoding)
            # BEFORE the structural gate so a null component becomes a
            # null key and hits the same refusal/dead-letter path. An
            # incoming non-null key column wins (an exported change
            # feed from a composite lake already carries it — e.g. a
            # DELETE whose component payload was not exported).
            from palimpzest_ray.cdc.keys import composite_key_column

            has_key = key in batch.column_names
            if all(c in batch.column_names for c in key_cols):
                synth = composite_key_column(batch, key_cols)
                if has_key:
                    merged = pc.coalesce(batch[key], synth)
                    batch = batch.set_column(
                        batch.column_names.index(key),
                        pa.field(key, pa.string()), merged,
                    )
                else:
                    batch = batch.append_column(key, synth)
            elif not has_key:
                composite_key_column(batch, key_cols)  # raises with detail
        if "tokens" in batch.column_names:
            derived = token_length(batch["tokens"])
            if "n_tok" in batch.column_names:
                n_tok = pc.coalesce(batch["n_tok"].cast(pa.int32()), derived)
                batch = batch.set_column(
                    batch.column_names.index("n_tok"), pa.field("n_tok", pa.int32()), n_tok
                )
            else:
                batch = batch.append_column("n_tok", derived)
        if generated:
            # GENERATED ALWAYS AS: recompute every declared column —
            # an incoming value is overwritten, never trusted (Delta
            # enforces writer agreement; recomputing is the stronger
            # guarantee). A referenced column absent from this batch
            # (minimal DELETE payloads) evaluates to null. Runs BEFORE
            # the expectation gate so constraints may check generated
            # values.
            from palimpzest_ray.cdc.expr import eval_expr, expr_columns

            for gname, gexpr in generated.items():
                ftype = target_schema.field(gname).type
                if expr_columns(gexpr) - set(batch.column_names):
                    col = pa.nulls(batch.num_rows, ftype)
                else:
                    col = pc.cast(eval_expr(batch, gexpr), ftype)
                    if isinstance(col, pa.Scalar):  # constant expression
                        col = pa.nulls(batch.num_rows, ftype).fill_null(col)
                fld = pa.field(gname, ftype)
                if gname in batch.column_names:
                    batch = batch.set_column(
                        batch.column_names.index(gname), fld, col
                    )
                else:
                    batch = batch.append_column(fld, col)

        ok = pc.is_in(batch["op"], value_set=pa.array(CHANGE_OPS))
        if not quarantine:
            bad = batch.num_rows - (pc.sum(ok.cast(pa.int64())).as_py() or 0)
            if bad:
                raise ValueError(f"{bad} change events with op outside {CHANGE_OPS}")
            if batch["lsn"].null_count or batch[key].null_count:
                raise ValueError("null lsn/doc_id in change log")
            for name, pred in expectations:
                sat = _expect_mask(batch, pred)
                exempt = pc.coalesce(
                    pc.equal(batch["op"], pa.scalar("DELETE")), pa.scalar(False)
                )
                viol = pc.and_(pc.invert(sat), pc.invert(exempt))
                n_bad = pc.sum(viol.cast(pa.int64())).as_py() or 0
                if n_bad:
                    raise ValueError(
                        f"expectation {name!r} violated by {n_bad} event(s); "
                        "pass quarantine=True to dead-letter them instead"
                    )
            good, badt, reasons = batch, None, None
        else:
            # named checks in a fixed order; reasons join in this order
            checks: list[tuple[str, np.ndarray]] = [
                (
                    "invalid_op",
                    np.asarray(
                        pc.invert(pc.coalesce(ok, pa.scalar(False))).to_numpy(
                            zero_copy_only=False
                        )
                    ),
                ),
                ("null_lsn", batch["lsn"].is_null().to_numpy(zero_copy_only=False)),
                ("null_key", batch[key].is_null().to_numpy(zero_copy_only=False)),
            ]
            not_delete = pc.invert(
                pc.coalesce(
                    pc.equal(batch["op"], pa.scalar("DELETE")), pa.scalar(False)
                )
            ).to_numpy(zero_copy_only=False)
            for name, pred in expectations:
                sat = _expect_mask(batch, pred).to_numpy(zero_copy_only=False)
                checks.append((name, np.asarray(~sat) & np.asarray(not_delete)))
            bad_any = np.zeros(batch.num_rows, dtype=bool)
            for _, m in checks:
                bad_any |= m
            if bad_any.any():
                idx_bad = np.nonzero(bad_any)[0]
                # Python only over the (exceptional) bad rows
                reasons = [
                    ",".join(nm for nm, m in checks if m[i]) for i in idx_bad
                ]
                good = batch.filter(pa.array(~bad_any))
                badt = batch.take(pa.array(idx_bad))
            else:
                good, badt, reasons = batch, None, None

        extra = [c for c in batch.column_names if c not in target_schema.names]
        if extra:
            # Silently dropping undeclared columns would lose data on the
            # evolved side of a schema change; fail loudly instead.
            raise ValueError(
                f"change batch carries columns {extra} absent from the declared "
                f"change schema {target_schema.names}. When passing a prepared "
                "ray.data.Dataset whose blocks mix schema epochs, supply "
                "change_schema=pa.unify_schemas([...]) to apply_changes — "
                "ds.schema() only reflects the first block."
            )
        good = conform(good, target_schema)
        part = stable_bucket(good[partition_key or key], num_partitions)
        good = good.append_column(PART_COL, pa.array(part))
        # fused per-batch LWW combiner (module docstring: the skew
        # treatment) — same pass as normalize so the shuffle input is
        # produced in ONE map stage with no rebatching copies
        good = first_per_key(good, key, [("lsn", "descending")])
        if not quarantine:
            return good
        good = good.append_column(
            ERRORS_COL, pa.nulls(good.num_rows, pa.string())
        )
        if badt is None:
            return good
        badt = conform(badt, target_schema)
        badt = badt.append_column(
            PART_COL, pa.array(np.full(badt.num_rows, QUARANTINE_PART, np.int32))
        )
        badt = badt.append_column(ERRORS_COL, pa.array(reasons, pa.string()))
        return pa.concat_tables([good, badt])

    return normalize


def _spill_factory(spill_dir: str):
    """fs-exchange spill stage: write each batch's rows into per-part
    hive dirs (``__part=N/blk-*.parquet``). Idempotent under task
    retries: a duplicated spill file duplicates (doc_id, lsn) rows,
    which the merge's LWW collapses."""

    def spill(batch: pa.Table) -> pa.Table:
        limit_kernel_threads()
        if batch.num_rows == 0:
            return pa.table({"rows": pa.array([0], pa.int64())})
        idx = pc.sort_indices(batch, sort_keys=[(PART_COL, "ascending")])
        t = batch.take(idx).combine_chunks()
        parts = t[PART_COL].to_numpy(zero_copy_only=False)
        boundaries = np.flatnonzero(np.diff(parts, prepend=parts[0] - 1))
        blk = uuid.uuid4().hex[:12]
        for i, b0 in enumerate(boundaries):
            b1 = boundaries[i + 1] if i + 1 < len(boundaries) else len(parts)
            sub = t.slice(b0, b1 - b0).drop_columns([PART_COL])
            d = os.path.join(spill_dir, f"{PART_COL}={parts[b0]}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(
                sub, os.path.join(d, f"blk-{blk}.parquet"), compression="snappy"
            )
        return pa.table({"rows": pa.array([batch.num_rows], pa.int64())})

    return spill


class MergeApplier:
    """Stateful per-partition merge: memtable + LWW index + tombstones.

    Instantiated inside plain ``map_batches`` TASKS (state is only
    paths + a parsed schema — rebuilding per task is ~free, and tasks
    recover from worker death via lineage retry with no actor-restart
    hazard, ray#53727). This replaces the reference's process-wide
    Singleton + lock (``topk.py:21-37``). Each call receives ALL change rows for one
    partition (already batch-combined), merges them against the base
    partition file, and stages the output atomically. Returns a one-row
    lineage table (applied-LSN watermark + upsert/delete counters).
    """

    def __init__(
        self,
        lake_root: str,
        staging_dir: str,
        target_schema_json: str,
        base_chains: dict[int, list[str]],
        key: str = "doc_id",
        fail_parts: tuple[int, ...] = (),
        spill_dir: str | None = None,
        streaming_threshold_rows: int = 4_000_000,
        die_once: str | None = None,
        mode: str = "rewrite",
        bloom_col: str | None = None,
        renames: dict | None = None,
    ):
        from palimpzest_ray.schemas import schema_from_json

        # column-mapping: pre-rename base/chain files carry historical
        # names; every base read below maps them to logical names
        self.renames = renames
        self.lake_root = lake_root
        self.staging_dir = staging_dir
        # user cols + _lsn + _deleted
        self.target_schema = schema_from_json(target_schema_json)
        self.user_schema = pa.schema(
            [f for f in self.target_schema if f.name not in (LSN_COL, TOMBSTONE_COL)]
        )
        # lake-root-relative [base, *deltas] per partition
        self.base_chains = base_chains
        self.key = key
        # "rewrite": merge changes + chain into a fresh base file
        # (copy-on-write). "delta": stage only this apply's collapsed
        # winners as a chain append — O(changes) work per partition,
        # the merge-on-read steady state for frequent small applies.
        self.mode = mode
        # the column the key-Bloom sidecar indexes: the lake's ROUTING
        # column (partition_key or key) — the only column lookup() can
        # probe by, and therefore the only one worth a filter
        self.bloom_col = bloom_col or key
        self.fail_parts = set(fail_parts)
        self.spill_dir = spill_dir  # fs-exchange mode: batches carry part IDS
        # base partitions above this row count merge via the streaming
        # path (bounded memory) instead of one in-memory pass
        self.streaming_threshold_rows = streaming_threshold_rows
        # fault injection: path to a marker file; if set and absent, the
        # first merge call creates it and HARD-KILLS its worker process
        # (SIGKILL, not an exception) — tests use this to prove that a
        # dead merge worker converges via Ray task retry, not a rerun
        self.die_once = die_once

    #: lineage row schema (explicit — ``error`` is usually all-null)
    LINEAGE_SCHEMA = pa.schema(
        [
            pa.field("part", pa.int64()),
            pa.field("file", pa.string()),
            pa.field("max_lsn", pa.int64()),
            pa.field("rows", pa.int64()),
            pa.field("tombstones", pa.int64()),
            pa.field("rows_upserted", pa.int64()),
            pa.field("rows_deleted", pa.int64()),
            pa.field("merge_ms", pa.int64()),
            pa.field("delta", pa.bool_()),
            pa.field("col_stats", pa.string()),  # json zone map
            pa.field("error", pa.string()),
        ]
    )

    def __call__(self, block: pa.Table) -> pa.Table:
        """One hash-repartitioned block = the complete rows of one or
        more logical partitions (``repartition(keys=[__part])``
        guarantees a key never spans blocks). Splitting the block by
        partition here with one vectorized pass costs ~nothing — Ray's
        ``map_groups`` machinery for the same job measured ~20x the
        actual merge work (sorting/slicing every payload block).

        Per-partition errors are CONTAINED: returned as error lineage
        rows instead of raised. Raising would abort the whole streaming
        execution, discarding every other partition's checkpointed work
        — and an aborted execution leaves the session's shuffle fleet
        in a bad state (leaked aggregator CPU wedging later pipelines).
        The driver inspects lineage and raises AFTER healthy partitions
        have their sidecars; a rerun with the same run_id redoes only
        the failed partitions.
        """
        limit_kernel_threads()
        if self.die_once is not None and not os.path.exists(self.die_once):
            # o_EXCL: exactly one worker wins the marker and dies
            try:
                fd = os.open(self.die_once, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                os._exit(137)
            except FileExistsError:
                pass
        if block.num_rows == 0:
            return self.LINEAGE_SCHEMA.empty_table()
        out: list[pa.Table] = []
        if self.spill_dir is not None:
            # fs-exchange mode: the block is a list of partition ids;
            # each partition's combined changes live in its spill dir
            for part in block[PART_COL].to_pylist():
                try:
                    group = pq.read_table(
                        os.path.join(self.spill_dir, f"{PART_COL}={part}")
                    ).combine_chunks()
                    out.append(self._apply_one(group, int(part)))
                except Exception as e:  # noqa: BLE001 — containment is the point
                    out.append(
                        pa.Table.from_pylist(
                            [{"part": int(part), "error": f"{type(e).__name__}: {e}"}],
                            schema=self.LINEAGE_SCHEMA,
                        )
                    )
            return pa.concat_tables(out)
        block = block.combine_chunks()  # contiguous buffers: kernels ~10x faster
        parts = block[PART_COL].to_numpy(zero_copy_only=False)
        for part in np.unique(parts):
            group = block.filter(pa.array(parts == part))
            try:
                out.append(self._apply_one(group, int(part)))
            except Exception as e:  # noqa: BLE001 — containment is the point
                out.append(
                    pa.Table.from_pylist(
                        [{"part": int(part), "error": f"{type(e).__name__}: {e}"}],
                        schema=self.LINEAGE_SCHEMA,
                    )
                )
        return pa.concat_tables(out)

    def _apply_one(self, group: pa.Table, part: int) -> pa.Table:
        import time as _time

        _t0 = _time.monotonic()
        if part in self.fail_parts:
            raise RuntimeError(f"injected failure for partition {part}")

        if part == QUARANTINE_PART:
            return self._stage_quarantine(group, _t0)
        # cross-block LWW happens inside the fused _merge sort — no
        # separate pre-reduce pass (each take copies the token payload)
        drop = [
            c for c in (PART_COL, ERRORS_COL) if c in group.column_names
        ]  # PART_COL absent in fs-exchange reads; ERRORS_COL all-null on
        # healthy rows and only present under quarantine mode
        changes = (
            group.drop_columns(drop)
            if drop
            else group
        )

        if self.mode == "delta":
            return self._apply_one_delta(changes, part, _t0)

        chain = self.base_chains.get(part) or []
        full_chain = [os.path.join(self.lake_root, f) for f in chain]
        max_lsn = pc.max(changes["lsn"]).as_py() or 0

        # staged atomic write: tmp + rename, then .done sidecar
        fname = f"part-{part:05d}.parquet"
        out = os.path.join(self.staging_dir, fname)
        tmp = out + f".tmp-{uuid.uuid4().hex[:8]}"
        base_rows = (
            pq.ParquetFile(full_chain[0]).metadata.num_rows if full_chain else 0
        )
        if base_rows > self.streaming_threshold_rows:
            # larger-than-memory partition: streaming merge-join against
            # the key-sorted base file (SURVEY.md §7.5 item 3's flush
            # path) — memory bound = one base batch + this partition's
            # reduced changes. A delta chain folds into the change
            # memtable (deltas are change-sized by the compaction
            # contract, only the base streams); lineage counters then
            # include the folded delta rows — the rewrite doubles as a
            # chain compaction, so the inflation is the fold itself.
            if len(full_chain) > 1:
                ch_schema = pa.schema(
                    list(self.user_schema)
                    + [pa.field("lsn", pa.int64()), pa.field("op", pa.string())]
                )
                folded = [conform(changes, ch_schema)] + [
                    conform(_lake_rows_as_changes(t), ch_schema)
                    for t in _read_chain(full_chain[1:], renames=self.renames)
                ]
                changes = pa.concat_tables(folded)
            total_rows, tombstones, upserted, deleted, col_stats = (
                self._merge_streaming(full_chain[0], changes, tmp)
            )
            bloom_keys = None  # streaming path: narrow re-read below
        else:
            base = (
                _resolve_chain(
                    _read_chain(full_chain, renames=self.renames),
                    self.key,
                    self.target_schema,
                )
                if full_chain
                else None
            )
            merged, upserted, deleted = self._merge(base, changes)
            tombstones = _tombstone_count(merged)
            total_rows = merged.num_rows
            col_stats = _column_ranges(merged)
            # snappy, not zstd: the merge runs single-threaded inside an
            # actor (Ray pins worker OMP/Arrow threads); zstd encode was
            # a measurable chunk of the 7s/partition profile
            pq.write_table(
                merged, tmp, compression="snappy", row_group_size=64 * 1024
            )
            bloom_keys = merged[self.bloom_col]
        os.replace(tmp, out)
        # key Bloom sidecar: promoted with the file by commit_version so
        # lookup() can skip chain files that provably lack a key
        if bloom_keys is None:
            bloom_keys = pq.read_table(out, columns=[self.bloom_col])[
                self.bloom_col
            ]
        write_bloom_sidecar(out, bloom_keys)

        lineage = {
            "part": int(part),
            "file": fname,
            "max_lsn": int(max_lsn),
            "rows": total_rows - tombstones,  # live rows
            "tombstones": tombstones,
            "rows_upserted": int(upserted),
            "rows_deleted": int(deleted),
            "merge_ms": int((_time.monotonic() - _t0) * 1000),
            "delta": False,
            "col_stats": json.dumps(col_stats),
        }
        return self._finish_lineage(part, lineage)

    def _stage_quarantine(self, group: pa.Table, _t0: float) -> pa.Table:
        """Dead-letter writer: stage the quarantined events (original
        payload + per-row ``_errors`` reasons) as one parquet file.
        tmp+rename-atomic and deterministic, so task retries converge;
        the driver publishes it under ``<lake>/_quarantine/`` after the
        commit. The pseudo-partition lands wholly in one exchange block
        (hash repartition on ``__part``), so exactly one task runs this.
        """
        import time as _time

        drop = [c for c in (PART_COL,) if c in group.column_names]
        rows = group.drop_columns(drop) if drop else group
        # deterministic file content: quarantine order is LSN order
        # (nulls last) regardless of block arrival order
        rows = rows.sort_by([("lsn", "ascending")])
        fname = os.path.join(self.staging_dir, "quarantine.parquet")
        tmp = fname + f".tmp-{uuid.uuid4().hex[:8]}"
        pq.write_table(rows, tmp)
        os.replace(tmp, fname)
        lsns = rows["lsn"].drop_null()
        lineage = {
            "part": QUARANTINE_PART,
            "file": fname,
            "max_lsn": int(pc.max(lsns).as_py()) if len(lsns) else 0,
            "rows": rows.num_rows,
            "tombstones": 0,
            "rows_upserted": 0,
            "rows_deleted": 0,
            "merge_ms": int((_time.monotonic() - _t0) * 1000),
            "delta": False,
            "col_stats": None,
        }
        return self._finish_lineage(QUARANTINE_PART, lineage)

    def _finish_lineage(self, part: int, lineage: dict) -> pa.Table:
        side = os.path.join(self.staging_dir, f"part-{part:05d}.done.json")
        tmp = side + ".tmp"
        with open(tmp, "w") as f:
            json.dump(lineage, f)
        os.replace(tmp, side)
        return pa.Table.from_pylist(
            [{**lineage, "error": None}], schema=self.LINEAGE_SCHEMA
        )

    def _apply_one_delta(self, changes: pa.Table, part: int, _t0: float) -> pa.Table:
        """Merge-on-read apply: stage ONLY this apply's winning rows as
        a chain append — never reads or rewrites the base payload.

        Winner determination and lineage counters stay EXACT (identical
        to a rewrite apply) via a narrow read of the effective chain
        state — just ``(key, _lsn, _deleted)``, a few percent of a
        token-payload partition's bytes. Losing change rows (older than
        the key's persisted ``_lsn``) are dropped here exactly as the
        rewrite merge drops them; winners sort canonically by key so
        read-time resolution sees at most one row per key per file.
        """
        import time as _time

        ch_schema = pa.schema(
            list(self.user_schema)
            + [pa.field("lsn", pa.int64()), pa.field("op", pa.string())]
        )
        ch = conform(changes, ch_schema)
        ch = first_per_key(ch, self.key, [("lsn", "descending")])
        # canonical key order (first_per_key's all-distinct fast path
        # returns arrival order)
        ch = ch.take(pc.sort_indices(ch, sort_keys=[(self.key, "ascending")]))
        max_lsn = pc.max(ch["lsn"]).as_py() or 0

        def _np(a):
            if isinstance(a, pa.ChunkedArray):
                a = a.combine_chunks()
            return a.to_numpy(zero_copy_only=False)

        chain = self.base_chains.get(part) or []
        narrow_schema = pa.schema(
            [
                self.target_schema.field(self.key),
                pa.field(LSN_COL, pa.int64()),
                pa.field(TOMBSTONE_COL, pa.bool_()),
            ]
        )
        n = ch.num_rows
        if chain:
            nb = _resolve_chain(
                _read_chain(
                    [os.path.join(self.lake_root, f) for f in chain],
                    columns=[self.key, LSN_COL, TOMBSTONE_COL],
                    renames=self.renames,
                ),
                self.key,
                narrow_schema,
            )
        else:
            nb = narrow_schema.empty_table()
        if nb.num_rows:
            nb_lsn = _np(pc.coalesce(nb[LSN_COL], pa.scalar(0, pa.int64())))
            nb_dead = _np(pc.coalesce(nb[TOMBSTONE_COL], pa.scalar(False)))
            pos = _np(
                pc.index_in(
                    ch[self.key].combine_chunks(),
                    value_set=nb[self.key].combine_chunks(),
                ).cast(pa.float64())
            )
            present = ~np.isnan(pos)
            at = np.where(present, pos, 0).astype(np.int64)
            base_lsn = np.where(present, nb_lsn[at], np.int64(-1))
            base_dead = np.where(present, nb_dead[at], False)
            base_live_n = int((~nb_dead).sum())
            base_tombs = int(nb_dead.sum())
        else:
            present = np.zeros(n, dtype=bool)
            base_lsn = np.full(n, -1, dtype=np.int64)
            base_dead = np.zeros(n, dtype=bool)
            base_live_n = base_tombs = 0

        # ties toward the change side — same contract as _merge's
        # (lsn desc, __is_change desc) sort
        wins = _np(ch["lsn"]) >= base_lsn
        is_del = _np(pc.equal(ch["op"], pa.scalar("DELETE")))
        base_live = present & ~base_dead
        win_del = wins & is_del
        win_ups = wins & ~is_del
        upserted = int(win_ups.sum())
        deleted = int((win_del & base_live).sum())
        new_live = int((win_ups & ~base_live).sum())
        new_tombs = int((win_del & ~(present & base_dead)).sum())
        revived = int((win_ups & present & base_dead).sum())

        fname = None
        col_stats: dict = {}
        if wins.any():
            out = ch.filter(pa.array(wins))
            out = out.rename_columns(
                [LSN_COL if c == "lsn" else c for c in out.column_names]
            ).drop_columns(["op"])
            out = out.append_column(TOMBSTONE_COL, pa.array(is_del[wins]))
            out = conform(out, self.target_schema)
            col_stats = _column_ranges(out)
            fname = f"part-{part:05d}.parquet"
            path = os.path.join(self.staging_dir, fname)
            tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
            pq.write_table(out, tmp, compression="snappy", row_group_size=64 * 1024)
            os.replace(tmp, path)
            # tombstone keys included: a delta's DELETE row must still be
            # read by chain resolution, so its key answers "maybe"
            write_bloom_sidecar(path, out[self.bloom_col])
        # all-losers (old-segment replay): no file, nothing to commit —
        # the sidecar still marks the partition done for resume

        lineage = {
            "part": int(part),
            "file": fname,
            "max_lsn": int(max_lsn),
            "rows": base_live_n - deleted + new_live,  # effective live rows
            "tombstones": base_tombs + new_tombs - revived,
            "rows_upserted": upserted,
            "rows_deleted": deleted,
            "merge_ms": int((_time.monotonic() - _t0) * 1000),
            "delta": True,
            "col_stats": json.dumps(col_stats),
        }
        return self._finish_lineage(part, lineage)

    def _merge(self, base: pa.Table | None, changes: pa.Table) -> tuple[pa.Table, int, int]:
        """LWW merge of the change memtable into the base partition.

        Base rows participate as implicit upserts at their persisted
        ``_lsn``; concat -> max-lsn per key -> drop tombstone winners ->
        canonical sort by key (byte-identical output across replays,
        SURVEY.md §7.5 item 2).
        """
        ch_schema = pa.schema(
            list(self.user_schema)
            + [pa.field("lsn", pa.int64()), pa.field("op", pa.string())]
        )
        ch = conform(changes, ch_schema)
        ch = ch.append_column(SRC_COL, pa.array(np.ones(ch.num_rows, dtype=bool)))

        if base is not None and base.num_rows:
            lsn_col = (
                base[LSN_COL]
                if LSN_COL in base.column_names
                else pa.nulls(base.num_rows, pa.int64())
            )
            was_dead = (
                pc.coalesce(base[TOMBSTONE_COL], pa.scalar(False)).combine_chunks()
                if TOMBSTONE_COL in base.column_names
                else pa.array(np.zeros(base.num_rows, dtype=bool))
            )
            b = conform(base, self.user_schema)
            b = b.append_column("lsn", pc.coalesce(lsn_col, pa.scalar(0, pa.int64())))
            b = b.append_column(
                "op",
                pc.if_else(was_dead, pa.scalar("DELETE"), pa.scalar("INSERT")),
            )
            b = b.append_column(SRC_COL, pa.array(np.zeros(base.num_rows, dtype=bool)))
            both = pa.concat_tables([ch, b], promote_options="permissive")
        else:
            both = ch

        # Fused LWW + tombstone-drop + canonical key sort: ONE payload
        # take. Sorting by (key asc, lsn desc, change-side desc) makes
        # the first row per key the LWW winner AND leaves winners in key
        # order, so the old three passes (lww take, tombstone filter,
        # final sort take) collapse into index arithmetic on narrow
        # columns plus a single take of the token payload.
        idx = pc.sort_indices(
            both,
            sort_keys=[
                (self.key, "ascending"),
                ("lsn", "descending"),
                (SRC_COL, "descending"),
            ],
        )
        keys_sorted = both[self.key].combine_chunks().take(idx)
        n = len(keys_sorted)
        first = np.ones(n, dtype=bool)
        if n > 1:
            neq = pc.not_equal(keys_sorted.slice(1), keys_sorted.slice(0, n - 1))
            first[1:] = neq.to_numpy(zero_copy_only=False)
        winner_idx = idx.filter(pa.array(first))

        ops_w = both["op"].combine_chunks().take(winner_idx)
        src_w = both[SRC_COL].combine_chunks().take(winner_idx)
        is_del = pc.equal(ops_w, pa.scalar("DELETE"))

        # lineage stats from the narrow columns only
        n_change_w = pc.sum(src_w.cast(pa.int64())).as_py() or 0
        del_and_change = pc.and_(is_del, src_w)
        n_del_winners = pc.sum(del_and_change.cast(pa.int64())).as_py() or 0
        upserted = n_change_w - n_del_winners
        if base is not None and base.num_rows and n_del_winners:
            live_base_keys = (
                base[self.key].combine_chunks().filter(pc.invert(was_dead))
                if TOMBSTONE_COL in base.column_names
                else base[self.key].combine_chunks()
            )
            deleted_keys = keys_sorted.filter(pa.array(first)).filter(del_and_change)
            in_base = pc.is_in(deleted_keys, value_set=live_base_keys)
            deleted = pc.sum(in_base.cast(pa.int64())).as_py() or 0
        else:
            deleted = 0

        # Tombstone winners are PERSISTED (payload-null rows with
        # _deleted=true), not dropped: a late-arriving older segment
        # can then never resurrect a deleted key, which makes applying
        # whole log segments commutative — not just events within one.
        out = both.take(winner_idx)  # the one payload copy, key-sorted
        out = out.rename_columns(
            [LSN_COL if c == "lsn" else c for c in out.column_names]
        ).drop_columns(["op", SRC_COL])
        out = out.append_column(TOMBSTONE_COL, is_del)
        out = conform(out, self.target_schema)
        return out, upserted, deleted

    def _merge_streaming(
        self, base_path: str, changes: pa.Table, tmp_path: str
    ) -> tuple[int, int, int, int]:
        """Bounded-memory merge for a larger-than-memory base partition.

        The base file is canonically key-sorted (every merge writes it
        that way), so this is a streaming merge-join: reduce this
        partition's changes to one LWW winner per key (small — bounded
        by the log segment, not the lake), then walk the base file batch
        by batch, merging each batch with the change keys that fall in
        its key range and appending the result to a ParquetWriter.
        Leftover change keys beyond the base's maximum flush at the end.
        Peak memory = one base batch + the reduced changes; output is
        globally key-sorted because chunk key ranges ascend.

        Returns ``(total_rows, tombstones, upserted, deleted, col_stats)``.
        """
        from palimpzest_ray.cdc.manifest import merge_col_stats
        ch_schema = pa.schema(
            list(self.user_schema)
            + [pa.field("lsn", pa.int64()), pa.field("op", pa.string())]
        )
        ch = conform(changes, ch_schema)
        ch = first_per_key(ch, self.key, [("lsn", "descending")])
        # Sort explicitly: first_per_key's all-distinct-keys fast path
        # returns ARRIVAL order (tokens.py), and searchsorted on an
        # unsorted key array would slice wrong change chunks.
        ch = ch.take(pc.sort_indices(ch, sort_keys=[(self.key, "ascending")]))
        ch_keys = np.array(ch[self.key].to_pylist(), dtype=object)

        total = tombs = ups = dels = 0
        col_stats: dict = {}
        writer = pq.ParquetWriter(tmp_path, self.target_schema, compression="snappy")
        try:
            ci = 0
            pf = pq.ParquetFile(base_path)
            for rb in pf.iter_batches(batch_size=128 * 1024):
                bt = rename_to_logical(
                    pa.Table.from_batches([rb]), self.renames
                )
                bmax = bt[self.key][-1].as_py()
                j = int(np.searchsorted(ch_keys, bmax, side="right"))
                chunk = ch.slice(ci, j - ci)
                ci = j
                merged, u, d = self._merge(bt, chunk) if chunk.num_rows else (
                    conform(bt, self.target_schema), 0, 0
                )
                writer.write_table(merged)
                total += merged.num_rows
                tombs += _tombstone_count(merged)
                ups += u
                dels += d
                col_stats = merge_col_stats(col_stats, _column_ranges(merged))
            leftover = ch.slice(ci)
            if leftover.num_rows:
                merged, u, d = self._merge(None, leftover)
                writer.write_table(merged)
                total += merged.num_rows
                tombs += _tombstone_count(merged)
                ups += u
                dels += d
                col_stats = merge_col_stats(col_stats, _column_ranges(merged))
        finally:
            writer.close()
        return total, tombs, ups, dels, col_stats


def apply_changes(
    changes: str | list[str] | pa.Table | rd.Dataset,
    lake_root: str,
    *,
    num_partitions: int = 32,
    key: "str | Sequence[str]" = "doc_id",
    run_id: str | None = None,
    resume: bool = True,
    merge_concurrency: int | None = None,
    fail_parts: tuple[int, ...] = (),
    exchange: str = "auto",
    change_schema: pa.Schema | None = None,
    since_lsn: int | None = None,
    streaming_threshold_rows: int = 4_000_000,
    partition_key: str | None = None,
    _rebucket: bool = False,
    die_once: str | None = None,
    auto_compact: "CompactionPolicy | bool | None" = None,
    mode: str = "rewrite",
    max_commit_retries: int = 0,
    expectations: list[tuple[str, list[tuple]]] | None = None,
    quarantine: bool = False,
    audit: bool = False,
    txn: tuple[str, int] | None = None,
    generated: dict | None = None,
) -> ApplyResult:
    """Apply a change log to the lake (see :func:`_apply_changes_impl`).

    ``audit=True`` is write-audit-publish (the Iceberg WAP pattern):
    the version is fully written — data promoted, manifest committed,
    dead letter published — but ``LATEST`` does not move, so head
    readers never see it. Audit it through any reader's ``version=``
    (``final_state_table``, ``lake_count``, ``fsck``,
    ``read_quarantine``), then
    :func:`~palimpzest_ray.cdc.manifest.publish_version` (a pure
    pointer flip — the staged commit holds the head+1 slot, blocking
    other writers, so nothing moves underneath it) or
    :func:`~palimpzest_ray.cdc.manifest.discard_version`. Vacuum
    preserves staged versions' files mid-audit.

    ``expectations`` / ``quarantine`` are the ingest data-quality gate
    (Debezium dead-letter topic / Delta Live Tables expectations):
    named ``[("col", op, value)]`` predicates every non-DELETE event
    must satisfy, plus the always-on structural checks (op ∈
    INSERT/UPDATE/DELETE, non-null lsn and key). ``quarantine=False``
    fails the apply on any violation; ``quarantine=True`` routes
    violating events — with a per-row ``_errors`` reason column — to
    ``<lake>/_quarantine/v{version:06d}.parquet`` through the same
    exchange and commits the healthy rows. Read back with
    :func:`read_quarantine`. Dead-letter delivery is per-commit
    diagnostics: replaying an already-applied log re-quarantines its
    bad rows under the new version (the healthy side stays idempotent
    via LWW; watermarked tailing never re-reads old events anyway).

    Multi-writer behavior: commits rebase automatically over concurrent
    writers that touched DISJOINT partitions (partition-local LWW
    merges commute, so the result equals either serial order); a true
    overlap raises :class:`ConcurrentCommitError`. With
    ``max_commit_retries > 0`` the apply then re-plans against the new
    head and re-runs, up to that many times — the stale-sidecar guard
    makes the redo exact, and LWW makes it idempotent.

    ``mode="delta"`` switches to merge-on-read: touched partitions
    append a small file of this apply's LWW winners to their delta
    chain instead of rewriting the base — apply cost proportional to
    the CHANGES, not the lake, which is the steady state for frequent
    small applies against a 100-TB lake. Readers resolve chains
    transparently; :func:`compact_deltas` (or the ``auto_compact``
    ``max_delta_files`` trigger) folds chains back into the base.
    Modes mix freely on one lake: a later ``rewrite`` apply compacts
    the chains it touches.

    ``exchange`` picks how normalized rows reach their partition merge:
    ``"auto"`` (default) applies parquet logs at or below
    ``LOCAL_APPLY_MAX_BYTES`` DRIVER-LOCALLY — same normalize / merge /
    staging / CAS-commit code, zero Ray executions, which removes the
    ~1.4s fixed cost that dominates frequent small commits (view/index
    refresh, MERGE INTO, DML, ``tail_follow`` polls; measured 22x on a
    200-event epoch) — and routes everything else through ``"ray"``
    (object-store hash exchange). ``"fs"`` spills hive-partitioned
    through lake storage (the token-payload-friendly exchange);
    ``"local"`` forces the driver path. Fault injection always runs
    distributed.

    ``auto_compact`` (True for defaults, or a :class:`CompactionPolicy`)
    evaluates the compaction triggers AFTER a successful commit —
    metadata-only when nothing fires, a re-bucket/vacuum when it does.
    The steady-state idiom for frequent small applies: files stay near
    the target size and superseded versions never accumulate unbounded.

    Runs under a scoped HASH_SHUFFLE context: the merge exchange needs
    key co-location, not sort order — measured 3-5x faster than the
    default sort shuffle on token-payload rows. The scope restores the
    session default on exit (``context.hash_shuffle_scope`` caveat)."""
    import contextlib

    from palimpzest_ray.context import hash_shuffle_scope

    with contextlib.ExitStack() as stack:
        stack.enter_context(hash_shuffle_scope())
        if isinstance(changes, rd.Dataset):
            # A caller-prepared Dataset captured its DataContext at
            # creation — before this scope; retarget that copy too.
            stack.enter_context(hash_shuffle_scope(changes.context))
        from palimpzest_ray.cdc.manifest import ConcurrentCommitError

        attempts = max(0, max_commit_retries) + 1
        for attempt in range(attempts):
            try:
                result = _apply_changes_impl(
                    changes,
                    lake_root,
                    num_partitions=num_partitions,
                    key=key,
                    run_id=run_id,
                    resume=resume,
                    merge_concurrency=merge_concurrency,
                    fail_parts=fail_parts,
                    exchange=exchange,
                    change_schema=change_schema,
                    since_lsn=since_lsn,
                    streaming_threshold_rows=streaming_threshold_rows,
                    partition_key=partition_key,
                    _rebucket=_rebucket,
                    die_once=die_once,
                    mode=mode,
                    expectations=expectations,
                    quarantine=quarantine,
                    audit=audit,
                    txn=txn,
                    generated=generated,
                )
                break
            except ConcurrentCommitError:
                if attempt + 1 >= attempts or isinstance(changes, rd.Dataset):
                    # a caller Dataset may be single-shot; don't re-run it
                    raise
    if auto_compact and not _rebucket and not audit:
        # never recurse from a re-bucket; never compact an unpublished
        # staged version (compaction commits, which the staged slot blocks)
        policy = auto_compact if isinstance(auto_compact, CompactionPolicy) else None
        result.compaction = globals()["auto_compact"](
            lake_root, policy, exchange=exchange
        )
    return result


class AuditFailed(RuntimeError):
    """An :func:`audited_apply` guardrail rejected the staged version.

    ``failures`` lists the failing checks; ``staged_version`` is the
    version that was discarded (or left staged with
    ``keep_staged_on_fail=True`` for inspection)."""

    def __init__(self, failures: list[str], staged_version: int, kept: bool):
        self.failures = failures
        self.staged_version = staged_version
        self.kept = kept
        state = "kept staged for inspection" if kept else "discarded"
        super().__init__(
            f"audit failed for staged v{staged_version} ({state}): "
            + "; ".join(failures)
        )


def audited_apply(
    changes,
    lake_root: str,
    *,
    audits: list[tuple] | None = None,
    max_delete_frac: float | None = None,
    min_rows: int | None = None,
    max_quarantine_frac: float | None = None,
    schema_locked: bool = False,
    keep_staged_on_fail: bool = False,
    **apply_kwargs,
) -> ApplyResult:
    """One-call write-audit-publish: stage the apply (``audit=True``),
    run guardrails against the staged version, publish on pass /
    discard on fail (:class:`AuditFailed`).

    Built-in guardrails are METADATA-ONLY (manifest row counters — zero
    data I/O, the same counters fsck --deep validates): ``min_rows``
    floors the staged live-row count; ``max_delete_frac`` rejects a
    commit that would shrink the table by more than the given fraction
    — the classic safety rail against a runaway DELETE feed.
    ``max_quarantine_frac`` rejects the commit when the ingest gate
    dead-lettered more than that fraction of the events it saw (a
    sudden spike means the FEED broke, not the data — better to hold
    the commit than to publish a half-empty epoch). ``schema_locked``
    rejects a staged version whose user schema differs from the head's
    — the rail against surprise schema drift riding an upstream
    producer deploy (explicit evolution goes through ``alter_schema``
    or an unlocked apply). ``audits``
    adds custom checks ``(name, fn(lake_root, staged_version) -> bool)``
    — run anything over the staged state via the ``version=`` readers;
    an exception counts as a failure. ``keep_staged_on_fail=True``
    leaves the rejected version staged (still holding the commit slot)
    so an operator can inspect it with ``final_state_table(version=)``
    before discarding by hand."""
    from palimpzest_ray.cdc.manifest import discard_version, publish_version

    prev = load_latest_manifest(lake_root)
    prev_version = prev.version if prev else 0
    prev_rows = sum(e.rows for e in prev.parts.values()) if prev else 0
    res = apply_changes(changes, lake_root, audit=True, **apply_kwargs)
    if res.manifest.version == prev_version:
        return res  # watermark no-op: nothing staged, nothing to audit
    staged = res.manifest.version
    new_rows = sum(e.rows for e in res.manifest.parts.values())
    failures: list[str] = []
    if min_rows is not None and new_rows < min_rows:
        failures.append(f"min_rows: staged has {new_rows} < {min_rows}")
    if max_delete_frac is not None and prev_rows:
        dropped = prev_rows - new_rows
        if dropped > 0 and dropped / prev_rows > max_delete_frac:
            failures.append(
                f"max_delete_frac: commit drops {dropped}/{prev_rows} rows "
                f"({dropped / prev_rows:.1%} > {max_delete_frac:.1%})"
            )
    if max_quarantine_frac is not None and res.events_seen:
        frac = res.rows_quarantined / res.events_seen
        if frac > max_quarantine_frac:
            failures.append(
                f"max_quarantine_frac: gate dead-lettered "
                f"{res.rows_quarantined}/{res.events_seen} events "
                f"({frac:.1%} > {max_quarantine_frac:.1%})"
            )
    if schema_locked and prev is not None:
        def _user(s):
            return [
                (f.name, str(f.type))
                for f in s
                if f.name not in (LSN_COL, TOMBSTONE_COL)
            ]

        if _user(res.manifest.schema) != _user(prev.schema):
            drift = set(_user(res.manifest.schema)) ^ set(_user(prev.schema))
            failures.append(
                f"schema_locked: staged user schema differs from head "
                f"(drift: {sorted(drift)})"
            )
    for name, fn in audits or []:
        try:
            ok = fn(lake_root, staged)
        except Exception as e:  # noqa: BLE001 — a crashed audit is a veto
            ok = False
            failures.append(f"{name}: raised {type(e).__name__}: {e}")
            continue
        if not ok:
            failures.append(f"{name}: returned {ok!r}")
    if failures:
        if not keep_staged_on_fail:
            discard_version(lake_root, staged)
        raise AuditFailed(failures, staged, keep_staged_on_fail)
    res.manifest = publish_version(lake_root, staged)
    return res


def _apply_changes_impl(
    changes: str | list[str] | pa.Table | rd.Dataset,
    lake_root: str,
    *,
    num_partitions: int = 32,
    key: str | Sequence[str] = "doc_id",
    run_id: str | None = None,
    resume: bool = True,
    merge_concurrency: int | None = None,
    fail_parts: tuple[int, ...] = (),
    exchange: str = "auto",
    change_schema: pa.Schema | None = None,
    since_lsn: int | None = None,
    streaming_threshold_rows: int = 4_000_000,
    partition_key: str | None = None,
    _rebucket: bool = False,
    die_once: str | None = None,
    mode: str = "rewrite",
    expectations: list[tuple[str, list[tuple]]] | None = None,
    quarantine: bool = False,
    audit: bool = False,
    txn: tuple[str, int] | None = None,
    generated: dict | None = None,
) -> ApplyResult:
    """Apply a change log to the lake; commit a new version exactly-once.

    ``partition_key`` routes rows to partitions by a DIFFERENT column
    than the LWW identity ``key`` (default: the key itself). Legal only
    when the partition column is a pure function of the key (e.g. a
    derived postings lake keyed on ``"token:doc"`` but partitioned by
    ``token`` so searches prune) — every row of a key must land in one
    partition. Use the same value on every apply to a given lake.

    ``since_lsn`` drops events with ``lsn <= since_lsn`` at normalize
    time — the binlog-tail idiom: pass the manifest's ``max_lsn`` to
    re-scan a log directory incrementally (see :func:`tail_once`).
    Correct by the replay contract (LWW makes re-application idempotent
    anyway; the filter just cuts the work).

    ``changes`` may be parquet path(s), a driver-side ``pyarrow.Table``
    (the refresh-commit idiom; small tables apply locally under
    ``exchange="auto"``), or a prepared ``ray.data.Dataset``.
    For a Dataset whose blocks mix schema epochs, pass ``change_schema``
    (the unified schema) — ``ds.schema()`` only reflects the first block,
    and normalize refuses batches with undeclared columns.
    ``run_id`` names the staging/checkpoint directory: re-running with
    the same ``run_id`` after a failure skips partitions whose
    ``.done.json`` sidecar exists (checkpoint/resume). ``fail_parts``
    injects failures (tests only).
    """
    if mode not in ("rewrite", "delta"):
        raise ValueError(f"mode must be 'rewrite' or 'delta', got {mode!r}")
    key_cols: tuple[str, ...] | None = None
    if not isinstance(key, str):
        # composite record key (Hudi ComplexKeyGenerator shape): the
        # lake is keyed on a synthesized injective string column built
        # from the named components at normalize time (cdc/keys.py)
        from palimpzest_ray.cdc.keys import COMPOSITE_KEY_COL

        key_cols = tuple(key)
        if not key_cols or not all(isinstance(c, str) for c in key_cols):
            raise ValueError(f"composite key must name columns, got {key!r}")
        bad = [c for c in key_cols if c in ("lsn", "op", COMPOSITE_KEY_COL)]
        if bad:
            raise ValueError(f"composite key may not include {bad}")
        key = COMPOSITE_KEY_COL
    os.makedirs(lake_root, exist_ok=True)
    prev = load_latest_manifest(lake_root)
    prev_version = prev.version if prev else 0
    if prev is not None and prev.num_partitions != num_partitions and not _rebucket:
        # The partition layout is a property of the LAKE, fixed at
        # creation: bucketing changes with a different P would merge
        # them against the wrong base partitions and duplicate every
        # carried-forward key that moved buckets. Adopt the manifest's;
        # repartition_lake() is the sanctioned way to change it.
        num_partitions = prev.num_partitions
    if txn is not None:
        app, ver = txn
        if not isinstance(app, str) or not isinstance(ver, int):
            raise ValueError(f"txn must be (app_id: str, version: int), got {txn!r}")
        applied = (prev.app_versions or {}).get(app) if prev else None
        if applied is not None and int(applied) >= ver:
            # producer idempotence (Delta txnAppId/txnVersion): this
            # batch (or a later one) from this producer is already in —
            # the replay no-ops even for NON-idempotent accumulate
            # feeds, where LWW alone cannot dedup a re-sent delta
            return ApplyResult(prev, 0, 0, 0, 0, 0)
    if generated is not None and prev is not None:
        if (prev.generated or {}) != generated:
            raise ValueError(
                "generated= on apply_changes is a CREATION-TIME property; "
                "this lake exists — evolve it with add_generated_column "
                "(or pass the manifest's own specs verbatim)"
            )
        generated = None  # identical re-statement: the manifest's win
    if prev is not None and (key, partition_key, key_cols) != (
        prev.key, prev.partition_key, prev.key_cols,
    ):
        # The identity contract is ALSO a property of the lake (a
        # derived posting lake is keyed on posting_id / partitioned by
        # token): applying with a different key would LWW-collapse
        # distinct rows and mis-bucket carried-forward state. Fail loud.
        raise ValueError(
            f"lake {lake_root} is keyed on key={prev.key!r}, "
            f"partition_key={prev.partition_key!r}; this apply passed "
            f"key={key!r}, partition_key={partition_key!r} — pass the "
            "lake's own contract (or build a new root)"
        )

    events_seen = 0
    if isinstance(changes, (str, list)):
        files = _expand_paths(changes)
        metas = {f: pq.ParquetFile(f).metadata for f in files}
        if since_lsn is not None:
            # footer-stat file pruning: a tail re-scan skips log files
            # wholly at-or-below the watermark without reading them.
            # Files lacking lsn statistics (0-row rotations, stats
            # disabled) are KEPT — the per-batch filter still applies,
            # so conservatism costs a read, never correctness.
            def _past_watermark(md) -> bool:
                if md.num_rows == 0:
                    return False
                lsn_idx = md.schema.to_arrow_schema().get_field_index("lsn")
                mx = None
                for g in range(md.num_row_groups):
                    st = md.row_group(g).column(lsn_idx).statistics
                    if st is None or st.max is None:
                        return True  # unknown — keep
                    mx = st.max if mx is None else max(mx, st.max)
                return mx is not None and mx > since_lsn

            files = [f for f in files if _past_watermark(metas[f])]
            if not files:
                if prev is None:
                    raise FileNotFoundError("empty log and no committed version")
                return ApplyResult(prev, 0, 0, 0, 0, 0)
        change_schema = _unified_change_schema(files)
        # NB: with since_lsn this counts SCANNED rows of kept files; rows
        # at-or-below the watermark are filtered later in normalize, so
        # events_seen is an upper bound on applied events.
        events_seen = sum(metas[f].num_rows for f in files)
        # few large blocks, not many small ones: every block is an
        # object-store mmap/munmap round trip, which costs TLB
        # shootdowns across ALL cores (brutal inside microVMs); bigger
        # blocks also make the per-block LWW combiner more effective
        import ray as _ray

        _ncpu = int(_ray.cluster_resources().get("CPU", 4))
        ds = rd.read_parquet(files, override_num_blocks=max(len(files), 2 * _ncpu))
    elif isinstance(changes, pa.Table):
        # driver-side event table (the refresh paths materialize their
        # change-sized feeds anyway): routes to the local path when
        # small, otherwise promoted to a Dataset for the exchange
        events_seen = changes.num_rows
        if change_schema is None:
            change_schema = changes.schema
        ds = None  # decided below by exchange routing
    else:
        ds = changes
        if change_schema is None:
            change_schema = ds.schema().base_schema

    missing = [c for c in ("lsn", "op") if change_schema.get_field_index(c) < 0]
    if missing:
        raise ValueError(
            f"change log is missing required column(s) {missing}: inputs to "
            "apply_changes must be change events with lsn:int64 and op:string "
            "(INSERT/UPDATE/DELETE). For an initial load, tag the base table "
            "as an INSERT-only epoch (op='INSERT', lsn below the log's range)."
        )

    if prev is not None and prev.renames:
        # column-mapping: a not-yet-migrated producer may still send a
        # renamed column under its historical name — translate the
        # change schema to logical names at plan time so unification
        # never re-introduces an old physical name as a fresh column
        change_schema = _rename_schema(change_schema, prev.renames)

    # unified target schema: previous lake schema ∪ incoming change schema
    user_change = pa.schema([f for f in change_schema if f.name not in ("lsn", "op")])
    if prev is not None:
        prev_user = pa.schema(
            [f for f in prev.schema if f.name not in (LSN_COL, TOMBSTONE_COL)]
        )
        user_schema = unify(prev_user, user_change)
    else:
        user_schema = user_change
    if "tokens" in user_schema.names and "n_tok" not in user_schema.names:
        # normalize derives n_tok from tokens; declare it so the derived
        # column passes the undeclared-column guard on logs that carry
        # tokens but no precomputed n_tok
        user_schema = user_schema.append(pa.field("n_tok", pa.int32()))
    if key_cols is not None:
        missing_kc = [c for c in key_cols if c not in user_schema.names]
        if missing_kc and key not in user_schema.names:
            raise ValueError(
                f"composite key component(s) {missing_kc} absent from the "
                f"change schema {user_schema.names} (and no pre-synthesized "
                f"{key!r} column present)"
            )
        if key not in user_schema.names:
            user_schema = user_schema.append(pa.field(key, pa.string()))
    if generated:
        # creation-time generated columns (hidden-partitioning shape:
        # partition_key may name one): validate each expr against the
        # change schema, infer its type from an empty evaluation, and
        # declare the field so normalize's recompute passes the
        # undeclared-column guard
        from palimpzest_ray.cdc.expr import eval_expr, expr_columns

        for gname, gexpr in generated.items():
            if gname in user_schema.names:
                raise ValueError(
                    f"generated column {gname!r} collides with a change "
                    "schema column"
                )
            bad = expr_columns(gexpr) & set(generated)
            if bad:
                raise ValueError(
                    f"generated expression for {gname!r} may not reference "
                    f"generated column(s) {sorted(bad)}"
                )
            probe = eval_expr(user_schema.empty_table(), gexpr)
            gtype = (
                probe.type if hasattr(probe, "type") else pa.scalar(None).type
            )
            if pa.types.is_null(gtype):
                raise ValueError(
                    f"cannot infer the type of generated column {gname!r}; "
                    "wrap the expression in ['cast', ..., 'type']"
                )
            user_schema = user_schema.append(pa.field(gname, gtype))
    norm_schema = pa.schema(
        [pa.field("lsn", pa.int64()), pa.field("op", pa.string())] + list(user_schema)
    )
    lake_schema = pa.schema(
        list(user_schema)
        + [pa.field(LSN_COL, pa.int64()), pa.field(TOMBSTONE_COL, pa.bool_())]
    )

    # ---- staging / checkpoint
    run_id = run_id or uuid.uuid4().hex[:12]
    staging_dir = os.path.join(lake_root, ".staging", run_id)
    os.makedirs(staging_dir, exist_ok=True)
    base_marker = os.path.join(staging_dir, "base_version")
    if os.path.exists(base_marker):
        with open(base_marker) as fh:
            staged_base = int(fh.read().strip())
        if staged_base != prev_version:
            # Sidecars were merged against an older base version (the
            # lake advanced between crash and resume): committing them
            # would drop the interleaved writer's rows. Discard and
            # redo this run against the current base.
            for f in os.listdir(staging_dir):
                if f != "base_version":
                    p = os.path.join(staging_dir, f)
                    shutil.rmtree(p) if os.path.isdir(p) else os.unlink(p)
    with open(base_marker, "w") as fh:
        fh.write(str(prev_version))
    done: dict[int, dict] = {}
    if resume:
        for f in os.listdir(staging_dir):
            if f.endswith(".done.json"):
                with open(os.path.join(staging_dir, f)) as fh:
                    d = json.load(fh)
                done[int(d["part"])] = d

    base_chains = (
        {}
        if _rebucket  # the whole state flows through the log; no base merge
        else {
            p: [e.file] + list(e.deltas)
            for p, e in (prev.parts.items() if prev else {}.items())
        }
    )

    # batch_size=None => one batch per input block: Ray must NOT coalesce
    # blocks from different schema epochs before normalize unifies them
    # (its internal concat cannot unify struct columns missing on one
    # side). After normalize every block has the unified schema. The
    # per-block LWW combiner is fused into normalize.
    if prev is not None and prev.constraints:
        # persistent table constraints join the apply's gate exactly
        # like caller expectations (add_constraint — the Delta
        # ADD CONSTRAINT analog); deterministic order for reason strings
        expectations = list(expectations or []) + [
            (f"constraint:{n}", pred)
            for n, pred in sorted(prev.constraints.items())
        ]
    normalize_fn = _normalize_factory(
        norm_schema, num_partitions, key, partition_key,
        expectations=expectations, quarantine=quarantine, key_cols=key_cols,
        generated=prev.generated if prev is not None else generated,
        renames=prev.renames if prev is not None else None,
    )
    done_set = (
        pa.array(np.array(sorted(done), dtype=np.int32)) if done else None
    )

    def _norm_skip(batch: pa.Table) -> pa.Table:
        if since_lsn is not None:
            keep = pc.greater(batch["lsn"], pa.scalar(since_lsn))
            if quarantine:
                # a null-lsn event can't be watermark-compared — keep it
                # so it reaches the dead letter instead of vanishing
                keep = pc.or_kleene(keep, batch["lsn"].is_null())
            batch = batch.filter(keep)
        batch = normalize_fn(batch)
        if done_set is not None:
            batch = batch.filter(
                pc.invert(pc.is_in(batch[PART_COL], value_set=done_set))
            )
        return batch

    if exchange == "auto":
        # Small-batch fast path (see apply_changes docstring): parquet
        # logs and driver-side event tables at or below the threshold
        # run the whole apply in-process; fault injection keeps the
        # distributed machinery it targets.
        if fail_parts or die_once is not None:
            local_ok = False
        elif isinstance(changes, (str, list)):
            local_ok = (
                sum(os.path.getsize(f) for f in files) <= LOCAL_APPLY_MAX_BYTES
            )
        elif isinstance(changes, pa.Table):
            local_ok = changes.nbytes <= LOCAL_APPLY_MAX_BYTES
        else:
            local_ok = False
        exchange = "local" if local_ok else "ray"
    if ds is None and exchange != "local":
        ds = rd.from_arrow(changes)  # big driver table -> the exchange

    pipeline = (
        None
        if exchange == "local"
        else ds.map_batches(_norm_skip, batch_format="pyarrow", batch_size=None)
    )

    from palimpzest_ray.schemas import schema_to_json

    if merge_concurrency is None:
        # Cap merge width below the cluster so the read / normalize /
        # shuffle stages always keep CPUs (a width equal to the whole
        # cluster starved upstream stages when this was an actor pool;
        # kept as the exchange-width heuristic).
        import ray as _ray

        ncpu = int(_ray.cluster_resources().get("CPU", 4))
        merge_concurrency = max(1, min(num_partitions, max(1, ncpu - 2)))
    # Merge runs as a TASK pool, not an actor pool: MergeApplier state
    # is just paths + a parsed schema (rebuilt per task for ~free), and
    # tasks recover from a dead worker via lineage-based retry — no
    # actor-restart dependency on possibly-evicted constructor args
    # (ray#53727; the actor-pool form warned about exactly that in
    # every bench tail). Retries are safe: staged writes are
    # tmp+rename-atomic per partition and LWW makes re-merging
    # idempotent.
    merge_ctor = {
        "lake_root": lake_root,
        "staging_dir": staging_dir,
        "target_schema_json": schema_to_json(lake_schema),
        "base_chains": base_chains,
        "key": key,
        "fail_parts": fail_parts,
        "streaming_threshold_rows": streaming_threshold_rows,
        "die_once": die_once,
        "mode": mode,
        "bloom_col": partition_key or key,
        "renames": prev.renames if prev is not None else None,
    }
    lineage_ds = None
    if exchange == "local":
        if not isinstance(changes, (str, list, pa.Table)):
            raise ValueError(
                "exchange='local' needs parquet path(s) or a pyarrow "
                "Table; pass exchange='auto' (or 'ray'/'fs') for "
                "Dataset inputs"
            )
        import pyarrow as _pa

        cpu_before, io_before = _pa.cpu_count(), _pa.io_thread_count()
        try:
            norm = (
                [_norm_skip(changes)]
                if isinstance(changes, pa.Table)
                else [_norm_skip(pq.read_table(f)) for f in files]
            )
            normalized = pa.concat_tables(norm, promote_options="default")
            # one in-process call; MergeApplier splits partitions itself
            # and CONTAINS per-partition errors as lineage rows, exactly
            # as the distributed block merge does
            lineage_rows = MergeApplier(**merge_ctor)(normalized).to_pylist()
        finally:
            # MergeApplier caps Arrow's process-wide pools for worker
            # hygiene; this is the driver — restore them
            import palimpzest_ray.functions.tokens as _tok

            _pa.set_cpu_count(cpu_before)
            _pa.set_io_thread_count(io_before)
            _tok._kernel_threads_tuned = False
        stats = "local (driver-side small-batch apply)"
    elif exchange == "fs":
        # Exchange through lake storage instead of the object store:
        # spill the normalized+combined changes hive-partitioned by
        # __part (sequential parquet writes, embarrassingly parallel),
        # then run one merge task per partition reading its spill dir.
        # ~10x less exchange CPU than the object-store shuffle on
        # token-payload rows, and the spill doubles as a shuffle
        # checkpoint. Cluster assumption: lake_root is shared storage —
        # already true (base files and staging live there too).
        # Idempotent under task retries: a duplicated spill file
        # duplicates (doc_id, lsn) rows, which LWW collapses.
        spill_dir = os.path.join(staging_dir, "exchange")
        os.makedirs(spill_dir, exist_ok=True)
        # Hand-rolled partitioned spill, FUSED with normalize into a
        # single map stage over the read: the token payload never
        # crosses the object store (read -> normalize -> spill happen in
        # one task; output is a one-row marker). One sort+take per
        # batch, then contiguous per-partition slices written
        # sequentially. Ray's write_parquet(partition_cols=...) splits
        # with per-value filters (64 full-column scans per block) and
        # measured ~8x this CPU at high task concurrency.
        spill_fn = _spill_factory(spill_dir)

        def _norm_spill(batch: pa.Table) -> pa.Table:
            return spill_fn(_norm_skip(batch))

        marker = ds.map_batches(
            _norm_spill, batch_format="pyarrow", batch_size=None
        ).sum("rows")
        del marker  # value unused; the sum drives the execution
        part_dirs = sorted(
            d for d in os.listdir(spill_dir) if d.startswith(f"{PART_COL}=")
        )
        parts_present = [
            p
            for d in part_dirs
            if (p := int(d.split("=")[1])) not in done
            # a crashed attempt's spill dirs persist for ALL partitions;
            # re-merging done ones is idempotent but pure waste
        ]
        ids = rd.from_arrow(
            pa.table({PART_COL: pa.array(parts_present, pa.int32())})
        ).repartition(max(1, len(parts_present)))
        ctor = dict(merge_ctor, spill_dir=spill_dir)

        def _merge_task(batch: pa.Table) -> pa.Table:
            return MergeApplier(**ctor)(batch)

        lineage_ds = ids.map_batches(
            _merge_task, batch_format="pyarrow", batch_size=None
        )
    else:
        # Object-store exchange: hash repartition on the partition id —
        # each logical partition lands wholly in one output block; the
        # merge is a plain map_batches over whole blocks (MergeApplier
        # splits multi-partition blocks itself). This replaces
        # groupby().map_groups, whose group-splitting machinery measured
        # ~20x the actual merge work at bench scale.
        exchange_blocks = min(num_partitions, max(merge_concurrency * 4, 8))
        parted = pipeline.repartition(exchange_blocks, keys=[PART_COL])

        def _merge_block(batch: pa.Table) -> pa.Table:
            return MergeApplier(**merge_ctor)(batch)

        lineage_ds = parted.map_batches(
            _merge_block, batch_format="pyarrow", batch_size=None
        )
    # Lineage is tiny (<= num_partitions rows) — safe to materialize.
    if lineage_ds is not None:
        lineage_rows = lineage_ds.take_all()
        stats = lineage_ds.stats()

    failed = [d for d in lineage_rows if d.get("error")]
    if failed:
        # no commit — previous version stays live (exactly-once); the
        # healthy partitions' sidecars remain for resume under run_id
        msgs = "; ".join(f"part {d['part']}: {d['error']}" for d in failed[:5])
        raise RuntimeError(
            f"{len(failed)} partition merge(s) failed "
            f"(run_id={run_id!r} keeps completed partitions for resume): {msgs}"
        )
    lineage_rows = [d for d in lineage_rows if d.get("file")]
    # dead-letter rows ride the same lineage channel but are not lake
    # partitions: pull them out before PartEntry construction
    quar_rows = [
        d
        for d in list(done.values()) + lineage_rows
        if int(d["part"]) == QUARANTINE_PART
    ]
    lineage_rows = [d for d in lineage_rows if int(d["part"]) != QUARANTINE_PART]

    new_parts: dict[int, PartEntry] = {}
    delta_parts: dict[int, PartEntry] = {}
    for d in list(done.values()) + lineage_rows:
        if not d.get("file"):
            continue  # delta apply where every change lost — a no-op
        if int(d["part"]) == QUARANTINE_PART:
            continue  # resumed dead-letter sidecar
        entry = PartEntry(
            file=d["file"],
            max_lsn=int(d["max_lsn"]),
            rows=int(d["rows"]),
            rows_upserted=int(d["rows_upserted"]),
            rows_deleted=int(d["rows_deleted"]),
            tombstones=int(d.get("tombstones", 0)),
            col_stats=(
                json.loads(d["col_stats"]) if d.get("col_stats") else None
            ),
        )
        (delta_parts if d.get("delta") else new_parts)[int(d["part"])] = entry

    if (
        not new_parts
        and not delta_parts
        and not quar_rows
        and prev is not None
        and not _rebucket
    ):
        # every event filtered (watermark) or LWW-lost: a version bump
        # would churn the manifest for identical content — no-op instead
        # (mirrors the pruned-log early return)
        shutil.rmtree(staging_dir, ignore_errors=True)
        return ApplyResult(prev, events_seen, 0, 0, 0, len(done))

    touched = set(new_parts) | set(delta_parts)
    carried = (
        {}
        if _rebucket  # old-layout partitions must not leak into the new manifest
        else {
            p: e
            for p, e in (prev.parts.items() if prev else {}.items())
            if p not in touched
        }
    )
    manifest = commit_version(
        lake_root, staging_dir, new_parts, carried, num_partitions,
        lake_schema, prev_version, key=key, partition_key=partition_key,
        delta_parts=delta_parts, allow_rebase=not _rebucket,
        publish=not audit, key_cols=key_cols, txn=txn,
        generated=generated if (prev is None and generated) else _CARRY,
    )
    # publish the dead letter under the committed version (before the
    # staging rmtree; per-commit diagnostics — see apply_changes notes)
    rows_quarantined, quarantine_file = 0, None
    if quar_rows:
        qdir = os.path.join(lake_root, "_quarantine")
        os.makedirs(qdir, exist_ok=True)
        quarantine_file = os.path.join(
            qdir, f"v{manifest.version:06d}.parquet"
        )
        os.replace(quar_rows[0]["file"], quarantine_file)
        rows_quarantined = int(quar_rows[0]["rows"])
    shutil.rmtree(staging_dir, ignore_errors=True)

    staged = list(new_parts.values()) + list(delta_parts.values())
    result = ApplyResult(
        manifest=manifest,
        events_seen=events_seen,
        rows_upserted=sum(e.rows_upserted for e in staged),
        rows_deleted=sum(e.rows_deleted for e in staged),
        partitions_rewritten=len(lineage_rows),
        partitions_resumed=len(done),
        stats=stats,
        lineage=lineage_rows,
        rows_quarantined=rows_quarantined,
        quarantine_file=quarantine_file,
    )
    # Persist the run report (north-rule lineage discipline): summary +
    # per-partition watermarks/counters/timings, auditable after the
    # driver is gone. Tiny (≤ num_partitions rows), one file per run.
    runs_dir = os.path.join(lake_root, ".runs")
    os.makedirs(runs_dir, exist_ok=True)
    report = {
        "run_id": run_id,
        "version": manifest.version,
        "events_seen": events_seen,
        "rows_upserted": result.rows_upserted,
        "rows_deleted": result.rows_deleted,
        "partitions_rewritten": result.partitions_rewritten,
        "partitions_resumed": result.partitions_resumed,
        "max_lsn": manifest.max_lsn,
        "rows_quarantined": rows_quarantined,
        "lineage": lineage_rows,
    }
    tmp_report = os.path.join(runs_dir, f"{run_id}.json.tmp")
    with open(tmp_report, "w") as f:
        json.dump(report, f, indent=1)
    os.replace(tmp_report, os.path.join(runs_dir, f"{run_id}.json"))
    # retention: a tail_follow lake commits forever — keep the newest
    # RUN_REPORTS_KEEP reports (by mtime; run ids are random, names
    # don't sort) so .runs never grows unboundedly
    reports = [
        os.path.join(runs_dir, f)
        for f in os.listdir(runs_dir)
        if f.endswith(".json")
    ]
    if len(reports) > RUN_REPORTS_KEEP:
        reports.sort(key=os.path.getmtime)
        for old in reports[:-RUN_REPORTS_KEEP]:
            try:
                os.unlink(old)
            except OSError:
                pass  # concurrent writer pruned it first
    return result


def suggest_num_partitions(
    lake_root: str, target_mb: int = 512, *, min_partitions: int = 8
) -> int:
    """Partition-count advisor for :func:`repartition_lake`: current
    lake bytes / target file size, from manifest-referenced file sizes
    only (no data pass). At 100 TB with 512 MB targets this lands at
    ~200k partitions — the granularity that keeps merges partition-local
    and worker-heap-sized."""
    m = load_latest_manifest(lake_root)
    if m is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    total = sum(os.path.getsize(f) for f in m.data_files(lake_root))
    return max(min_partitions, -(-total // (target_mb * 1024 * 1024)))


def fsck(lake_root: str, *, version: int | None = None, deep: bool = False) -> dict:
    """Lake integrity audit (driver-side, metadata-first): verify that
    every referenced file exists, per-entry row/tombstone counts match
    the data, keys are unique within a resolved partition, every row
    hashes into its partition, and zone maps bound their columns.
    ``deep=False`` checks existence + footer row counts only (no data
    read); ``deep=True`` reads each partition chain and verifies the
    resolved invariants. Returns ``{"ok": bool, "errors": [...],
    "files": n, "rows": n}`` — never raises on findings."""
    from palimpzest_ray.cdc.manifest import load_manifest as _load
    from palimpzest_ray.functions.tokens import stable_bucket

    m = (
        _load(lake_root, version)
        if version is not None
        else load_latest_manifest(lake_root)
    )
    if m is None:
        return {"ok": False, "errors": ["no committed version"], "files": 0, "rows": 0}
    errors: list[str] = []
    files = rows = 0
    for p, e in sorted(m.parts.items()):
        chain = m.chain(lake_root, p)
        missing = [f for f in chain if not os.path.exists(f)]
        if missing:
            errors.append(f"part {p}: missing file(s) {missing}")
            continue
        files += len(chain)
        if not deep:
            rows += e.rows
            continue
        # Bloom sidecars must honor the one-sided contract for EVERY key
        # physically in their file (tombstones included): a false
        # negative would silently drop rows from lookups — the only
        # bloom failure mode that corrupts results rather than costing a
        # read. Checked per FILE (pre-resolution), since lookup consults
        # sidecars per chain file.
        bloom_col = m.partition_key or m.key
        chain_tabs = _read_chain(chain, renames=m.renames)
        for path, t in zip(chain, chain_tabs):
            blob = load_bloom(path)
            if blob is None or t.num_rows == 0:
                continue  # missing sidecar = legal (read-as-before)
            try:
                maybe = bloom_might_contain(blob, t[bloom_col].combine_chunks())
            except Exception as exc:  # truncated / foreign bytes
                errors.append(f"part {p}: unreadable bloom sidecar for "
                              f"{os.path.basename(path)} ({exc})")
                continue
            if not maybe.all():
                errors.append(
                    f"part {p}: bloom sidecar for {os.path.basename(path)} "
                    f"denies {int((~maybe).sum())} key(s) present in the "
                    "file (false negatives — lookups would drop rows)"
                )
        r = _resolve_chain(chain_tabs, m.key, m.schema)
        tombs = _tombstone_count(r)
        live = r.num_rows - tombs
        rows += live
        if (live, tombs) != (e.rows, e.tombstones):
            errors.append(
                f"part {p}: entry says rows={e.rows}/tombstones={e.tombstones}, "
                f"data resolves to {live}/{tombs}"
            )
        keys = r[m.key]
        if pc.count_distinct(keys).as_py() != r.num_rows:
            errors.append(f"part {p}: duplicate keys after resolution")
        route = r[m.partition_key] if m.partition_key else keys
        buckets = stable_bucket(route.combine_chunks(), m.num_partitions)
        if r.num_rows and not (buckets == p).all():
            errors.append(f"part {p}: rows routed to foreign partitions")
        lsn = r[LSN_COL]
        if r.num_rows and pc.max(lsn).as_py() > e.max_lsn:
            errors.append(f"part {p}: row _lsn above the entry watermark")
        if e.col_stats:
            for c, (lo, hi) in e.col_stats.items():
                if c not in r.column_names:
                    continue
                mm = pc.min_max(r[c])
                cl, ch_ = mm["min"].as_py(), mm["max"].as_py()
                try:
                    if cl is not None and (cl < lo or ch_ > hi):
                        errors.append(
                            f"part {p}: zone map [{lo}, {hi}] does not bound "
                            f"column {c!r} data [{cl}, {ch_}]"
                        )
                except TypeError:
                    pass
    return {"ok": not errors, "errors": errors, "files": files, "rows": rows}


def read_quarantine(
    lake_root: str, *, version: int | None = None
) -> pa.Table:
    """Read the dead-letter table: events rejected by ingest validation
    (``apply_changes(..., quarantine=True)``), each with its original
    payload and the ``_errors`` reason column. ``version=`` narrows to
    the file published by that commit; default is every retained
    dead-letter file (column-unified — quarantine schemas may evolve
    with the change schema)."""
    qdir = os.path.join(lake_root, "_quarantine")
    if version is not None:
        files = [os.path.join(qdir, f"v{version:06d}.parquet")]
        if not os.path.exists(files[0]):
            raise FileNotFoundError(
                f"no quarantined events for version {version} under {qdir}"
            )
    else:
        files = sorted(glob.glob(os.path.join(qdir, "v*.parquet")))
        if not files:
            return pa.table(
                {
                    "lsn": pa.array([], pa.int64()),
                    "op": pa.array([], pa.string()),
                    ERRORS_COL: pa.array([], pa.string()),
                }
            )
    tables = [pq.read_table(f) for f in files]
    return pa.concat_tables(tables, promote_options="default")


def replay_quarantine(
    lake_root: str,
    *,
    version: int | None = None,
    fix=None,
    **apply_kwargs,
) -> "ApplyResult":
    """Reprocess the dead letter (the Debezium DLQ-replay story): read
    the quarantined events (``version=`` narrows to one commit's file;
    default every retained file), apply ``fix(batch) -> batch`` —
    repair lsn/op/key, clamp values, or DROP unsalvageable rows — and
    feed the result back through :func:`apply_changes`, i.e. through
    the SAME structural + expectation + constraint gate that rejected
    them. Events that are still bad fail the replay (or dead-letter
    again under ``quarantine=True`` — pass it explicitly). Events keep
    their ORIGINAL LSNs: a repaired late row merges into LWW order
    exactly where it belongs, and replaying an already-repaired event
    stays idempotent. The dead-letter files themselves are per-commit
    diagnostics and are not consumed by the replay — re-running with
    the same inputs converges via LWW."""
    q = read_quarantine(lake_root, version=version)
    if ERRORS_COL in q.column_names:
        q = q.drop_columns([ERRORS_COL])
    if fix is not None:
        n_in = q.num_rows
        q = fix(q)
        if not isinstance(q, pa.Table):
            raise TypeError("fix(batch) must return a pyarrow.Table")
        if q.num_rows > n_in:
            raise ValueError(
                "fix(batch) may repair or drop rows, not invent them "
                f"({n_in} in, {q.num_rows} out)"
            )
    if q.num_rows == 0:
        m = load_latest_manifest(lake_root)
        if m is None:
            raise FileNotFoundError(
                f"no committed lake version under {lake_root}"
            )
        return ApplyResult(m, 0, 0, 0, 0, 0)
    return apply_changes(q, lake_root, **apply_kwargs)


def _safe_widen(src: pa.DataType, dst: pa.DataType) -> bool:
    """True iff dst can represent EVERY src value exactly (the type
    promotions alter_schema(widen=...) admits)."""
    import pyarrow.types as pt

    if src.equals(dst):
        return False
    if pt.is_integer(src) and pt.is_integer(dst):
        if pt.is_signed_integer(src) and pt.is_unsigned_integer(dst):
            return False  # negatives don't fit
        if pt.is_signed_integer(src) == pt.is_signed_integer(dst):
            return dst.bit_width > src.bit_width
        # unsigned -> signed needs strictly more bits
        return dst.bit_width > src.bit_width
    if pt.is_floating(src) and pt.is_floating(dst):
        return dst.bit_width > src.bit_width
    if pt.is_integer(src) and pt.is_floating(dst):
        mantissa = {16: 11, 32: 24, 64: 53}.get(dst.bit_width, 0)
        magnitude = src.bit_width - (1 if pt.is_signed_integer(src) else 0)
        return magnitude <= mantissa
    return False


def alter_schema(
    lake_root: str,
    *,
    add: list[pa.Field] | None = None,
    drop: list[str] | None = None,
    rename: dict[str, str] | None = None,
    widen: dict[str, pa.DataType] | None = None,
) -> LakeManifest:
    """Metadata-only schema DDL: commit a new version whose schema has
    the ``add`` fields appended (null-backfilled at read for every
    existing row — same machinery as log-driven evolution) and the
    ``drop`` columns removed. No data file is touched: readers conform
    every file to the manifest schema, so a dropped column vanishes
    immediately (logical drop) and is physically removed from each
    partition at its next rewrite/compaction. Time travel still shows
    the column at prior versions. The LWW key, the partition key and
    the internal columns cannot be dropped.

    Evolution still wins going forward: a dropped column that later
    change logs STILL CARRY is re-introduced by schema unification (as
    any new column would be), and ``n_tok`` on a tokens table is
    re-derived by normalize on the next apply — dropping it is a no-op
    by the sequence-table contract.

    ``rename`` — ``{old: new}`` — is rename-WITHOUT-rewrite (the Delta
    column-mapping idea): no data file is touched; the manifest records
    a flattened ``{historical_name: logical_name}`` map and every read
    re-labels pre-rename files' columns on the fly (compaction /
    rewrite materializes the new name physically). Producer compat:
    change feeds still arriving under the OLD name keep applying — the
    ingest maps them to the logical column (a feed carrying both names
    is refused). Historical names stay reserved: ``add`` of one is
    refused. Not renamable: the LWW key, composite-key components, the
    partition column, internal columns, ``tokens``/``n_tok`` on a
    sequence lake (normalize derives them by name), generated columns
    (drop + re-add to re-derive), and columns referenced by a
    constraint or generated expression (drop the reference first).

    ``widen`` — ``{col: wider_type}`` — is lossless type widening
    (Delta type-widening): metadata-only; readers cast narrow stored
    values at conform time. Allowed: int8→int16→int32→int64 (and the
    unsigned chain, or unsigned→signed with strictly more bits),
    float32→float64, and int/uint of ≤32 bits→float64 (≤16→float32) —
    every value-preserving promotion, nothing lossy (int64→float64 is
    refused). Not widenable: the key, key components, the partition
    column (routing hashes raw values), and generated columns (their
    type derives from the expression)."""
    m = load_latest_manifest(lake_root)
    if m is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    add = list(add or [])
    drop = list(drop or [])
    rename = dict(rename or {})
    widen = dict(widen or {})
    names = set(m.schema.names)
    historical = set((m.renames or {}))  # reserved physical names
    protected = {m.key, m.partition_key, LSN_COL, TOMBSTONE_COL} - {None}
    protected |= set(m.key_cols or ())
    bad = [c for c in drop if c in protected]
    if bad:
        raise ValueError(f"cannot drop protected column(s) {bad}")
    missing = [c for c in drop if c not in names]
    if missing:
        raise ValueError(f"drop of unknown column(s) {missing}")
    clash = [f.name for f in add if f.name in names and f.name not in drop]
    if clash:
        raise ValueError(f"added column(s) already exist: {clash}")
    reserved = [f.name for f in add if f.name in historical]
    if reserved:
        raise ValueError(
            f"added column name(s) {reserved} are reserved historical "
            "names of renamed columns (pre-rename files still carry them "
            "physically) — pick different names"
        )
    gen0 = m.generated or {}
    if rename or widen:
        from palimpzest_ray.cdc.expr import expr_columns as _exc

        touched_rw = set(rename) | set(widen)
        overlap = touched_rw & (set(drop) | {f.name for f in add})
        if overlap:
            raise ValueError(
                f"column(s) {sorted(overlap)} appear in more than one DDL "
                "role in a single alter_schema call — split the calls"
            )
        referenced: dict[str, str] = {}
        for n, gexpr in gen0.items():
            for c in _exc(gexpr):
                referenced.setdefault(c, f"generated column {n!r}")
        for n, pred in (m.constraints or {}).items():
            cset = (
                _exc(pred["expr"])
                if isinstance(pred, dict)
                else {c for c, _o, _v in pred}
            )
            for c in cset:
                referenced.setdefault(c, f"constraint {n!r}")
    for old_name, new_name in rename.items():
        if old_name in protected:
            raise ValueError(f"cannot rename protected column {old_name!r}")
        if old_name in ("tokens", "n_tok") and "tokens" in names:
            raise ValueError(
                "cannot rename tokens/n_tok on a sequence lake — "
                "normalize derives n_tok from tokens by name"
            )
        if old_name not in names:
            raise ValueError(f"rename of unknown column {old_name!r}")
        if old_name in gen0:
            raise ValueError(
                f"cannot rename generated column {old_name!r} — drop it "
                "and re-add under the new name (the expression re-derives "
                "its values)"
            )
        if old_name in referenced:
            raise ValueError(
                f"column {old_name!r} is referenced by {referenced[old_name]};"
                " drop that first"
            )
        if new_name in names or new_name in historical:
            raise ValueError(
                f"rename target {new_name!r} collides with an existing "
                "column or a reserved historical name"
            )
        if not new_name or new_name in (LSN_COL, TOMBSTONE_COL):
            raise ValueError(f"invalid rename target {new_name!r}")
    tgt_counts = list(rename.values())
    dup_tgt = {t for t in tgt_counts if tgt_counts.count(t) > 1}
    if dup_tgt:
        raise ValueError(f"rename targets collide: {sorted(dup_tgt)}")
    add_clash = [t for t in rename.values() if t in {f.name for f in add}]
    if add_clash:
        raise ValueError(
            f"rename target(s) {add_clash} collide with added column(s)"
        )
    for col, new_type in widen.items():
        if col in protected:
            raise ValueError(f"cannot widen protected column {col!r}")
        if col not in names:
            raise ValueError(f"widen of unknown column {col!r}")
        if col in gen0:
            raise ValueError(
                f"cannot widen generated column {col!r} — its type derives "
                "from the expression"
            )
        cur = m.schema.field(col).type
        if not _safe_widen(cur, new_type):
            raise ValueError(
                f"widen {col!r}: {cur} -> {new_type} is not a lossless "
                "promotion (allowed: wider ints of the same or higher "
                "signedness class, float32->float64, small ints->float)"
            )
    gen = dict(m.generated or {})
    if drop and (gen or m.constraints):
        from palimpzest_ray.cdc.expr import expr_columns

        for n, gexpr in gen.items():
            used = expr_columns(gexpr) & set(drop)
            if used:
                raise ValueError(
                    f"column(s) {sorted(used)} are referenced by generated "
                    f"column {n!r}; drop it first"
                )
        for n, pred in (m.constraints or {}).items():
            cset = (
                expr_columns(pred["expr"])
                if isinstance(pred, dict)
                else {c for c, _o, _v in pred}
            )
            used = cset & set(drop)
            if used:
                raise ValueError(
                    f"column(s) {sorted(used)} are referenced by constraint "
                    f"{n!r}; drop it first"
                )
        # dropping a generated column drops its spec with it
        gen = {n: e for n, e in gen.items() if n not in drop}
    internal = [f for f in m.schema if f.name in (LSN_COL, TOMBSTONE_COL)]
    user = [
        f
        for f in m.schema
        if f.name not in (LSN_COL, TOMBSTONE_COL) and f.name not in drop
    ]
    if widen:
        # metadata-only: readers conform() stored narrow values up
        user = [
            pa.field(f.name, widen[f.name], nullable=f.nullable,
                     metadata=f.metadata)
            if f.name in widen else f
            for f in user
        ]
    if rename:
        user = [
            f.with_name(rename[f.name]) if f.name in rename else f
            for f in user
        ]
    schema = pa.schema(user + add + internal)
    extra = {}
    if rename:
        # flatten the column-mapping: a historical name whose CURRENT
        # logical name is being renamed now maps straight to the newest
        # name (a file carries exactly one vintage of a column's name,
        # so one-hop translation at read time stays sufficient)
        flat = {
            old: rename.get(cur, cur) for old, cur in (m.renames or {}).items()
        }
        flat.update(rename)
        extra["renames"] = flat
    # a zero-file commit through the same CAS path: parts carry forward
    staging = os.path.join(lake_root, ".staging", f"ddl-{uuid.uuid4().hex[:8]}")
    os.makedirs(staging, exist_ok=True)
    try:
        manifest = commit_version(
            lake_root, staging, {}, dict(m.parts), m.num_partitions,
            schema, m.version, key=m.key, partition_key=m.partition_key,
            key_cols=m.key_cols, generated=gen or None, **extra,
        )
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    # dropped columns' zone-map entries are stale — scrub them so a
    # predicate on a re-added column never prunes off old ranges;
    # renamed columns' entries re-key to the logical name (widened
    # entries keep their values — the promotion is order-preserving)
    touched = set(drop) | {f.name for f in add}
    if touched or rename:
        from palimpzest_ray.cdc.manifest import _atomic_write

        for e in manifest.parts.values():
            if e.col_stats:
                for c in touched:
                    e.col_stats.pop(c, None)
                for old_name, new_name in rename.items():
                    if old_name in e.col_stats:
                        e.col_stats[new_name] = e.col_stats.pop(old_name)
        _atomic_write(
            os.path.join(lake_root, f"MANIFEST-v{manifest.version}.json"),
            manifest.to_json(),
        )
    return manifest


_EXPECT_OPS = ("==", "!=", ">=", ">", "<=", "<", "in")


def add_constraint(
    lake_root: str,
    name: str,
    predicate: list[tuple] | None = None,
    *,
    expr=None,
    verify: bool = True,
) -> LakeManifest:
    """Persistent table constraint (the Delta Lake ``ALTER TABLE ADD
    CONSTRAINT`` idea): ``predicate`` — conjuncts in the expectations
    mini-language ``[("col", op, value), ...]`` — is stored in the
    manifest and from then on EVERY apply to this lake enforces it
    exactly like a caller-supplied expectation (fail the apply, or
    dead-letter the violating events under ``quarantine=True``). The
    apply's DELETE exemption holds: a tombstone carries no payload to
    check.

    ``verify=True`` (default, matching Delta) first proves the EXISTING
    live rows satisfy the predicate via a zone-map-pruned counting scan
    over only the predicate columns (metadata-only total minus
    satisfying count); a violated constraint is refused rather than
    stored. The DDL itself is a zero-file metadata commit through the
    same CAS path as :func:`alter_schema`.

    Instead of conjuncts, pass ``expr=`` — a full
    :mod:`~palimpzest_ray.cdc.expr` boolean expression (disjunctions,
    arithmetic, cross-column comparisons): the Delta CHECK-constraint
    generality. Verification then scans only the referenced columns."""
    m = load_latest_manifest(lake_root)
    if m is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    if m.constraints and name in m.constraints:
        raise ValueError(f"constraint {name!r} already exists")
    if (predicate is None) == (expr is None):
        raise ValueError("pass exactly one of predicate= or expr=")
    if expr is not None:
        from palimpzest_ray.cdc.expr import expr_columns, validate_expr

        user = pa.schema(
            [f for f in m.schema if f.name not in (LSN_COL, TOMBSTONE_COL)]
        )
        validate_expr(expr, user)
        stored = {"expr": expr}
        if verify:
            refs = sorted(expr_columns(expr)) or [m.key]
            ds = final_state(lake_root, columns=refs)

            def _nbad(batch: pa.Table) -> pa.Table:
                ok = _expect_mask(batch, stored)
                n_ok = pc.sum(pc.cast(ok, pa.int64())).as_py() or 0
                return pa.table(
                    {"bad": pa.array([batch.num_rows - n_ok], pa.int64())}
                )

            bad = ds.map_batches(
                _nbad, batch_format="pyarrow"
            ).sum("bad") or 0
            if bad:
                raise ValueError(
                    f"constraint {name!r} is violated by {bad} existing "
                    "live row(s); fix the data first "
                    "(or pass verify=False to enforce only going forward)"
                )
        new = dict(m.constraints or {})
        new[name] = stored
        return _commit_constraints(lake_root, m, new)
    predicate = [tuple(p) for p in predicate]
    if not predicate:
        raise ValueError("constraint predicate must have >= 1 conjunct")
    for p in predicate:
        if len(p) != 3:
            raise ValueError(f"conjunct {p!r} is not (col, op, value)")
        col, op, _v = p
        if col not in m.schema.names:
            raise ValueError(
                f"constraint column {col!r} not in lake schema "
                f"{[f.name for f in m.schema]}"
            )
        if op not in _EXPECT_OPS:
            raise ValueError(f"unknown predicate op {op!r} (use {_EXPECT_OPS})")
    if verify:
        total = lake_count(lake_root)
        satisfied = lake_count(lake_root, predicate=predicate)
        if satisfied != total:
            raise ValueError(
                f"constraint {name!r} is violated by {total - satisfied} "
                f"existing live row(s); fix the data first "
                "(or pass verify=False to enforce only going forward)"
            )
    new = dict(m.constraints or {})
    new[name] = predicate
    return _commit_constraints(lake_root, m, new)


def _commit_constraints(
    lake_root: str, m: LakeManifest, new: dict
) -> LakeManifest:
    staging = os.path.join(lake_root, ".staging", f"ddl-{uuid.uuid4().hex[:8]}")
    os.makedirs(staging, exist_ok=True)
    try:
        return commit_version(
            lake_root, staging, {}, dict(m.parts), m.num_partitions,
            m.schema, m.version, key=m.key, partition_key=m.partition_key,
            key_cols=m.key_cols, constraints=new,
        )
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def add_generated_column(
    lake_root: str,
    field: pa.Field,
    expr,
    *,
    backfill_existing: bool = True,
) -> LakeManifest:
    """Generated column (the Delta Lake ``GENERATED ALWAYS AS`` idea):
    ``field`` is added to the schema and ``expr`` — a
    :mod:`palimpzest_ray.cdc.expr` JSON expression over the lake's
    columns — is stored in the manifest; from then on EVERY apply
    recomputes the column for each incoming row (an incoming value is
    overwritten, never trusted — the strong form of Delta's
    writer-agreement check), before the expectation gate so persistent
    constraints may reference it.

    ``backfill_existing=True`` (default) immediately fills the column
    for every existing live row as one exactly-once UPDATE commit
    (:func:`backfill`, reads pruned to the referenced columns);
    otherwise existing rows read NULL until their next update.

    The expression is validated now (unknown columns / ops / arity are
    refused at DDL time) and may not reference itself or other
    generated columns (one evaluation pass per batch, no topological
    ordering to get wrong)."""
    from palimpzest_ray.cdc.expr import expr_columns, validate_expr

    m = load_latest_manifest(lake_root)
    if m is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    if field.name in m.schema.names:
        raise ValueError(f"column {field.name!r} already exists")
    refs = expr_columns(expr)
    gen_refs = refs & set(m.generated or {}) | ({field.name} & refs)
    if gen_refs:
        raise ValueError(
            f"generated expression may not reference generated column(s) "
            f"{sorted(gen_refs)}"
        )
    user = pa.schema(
        [f for f in m.schema if f.name not in (LSN_COL, TOMBSTONE_COL)]
    )
    validate_expr(expr, user)  # refuses unknown cols/ops at DDL time
    m = alter_schema(lake_root, add=[field])
    new = dict(m.generated or {})
    new[field.name] = expr
    staging = os.path.join(lake_root, ".staging", f"ddl-{uuid.uuid4().hex[:8]}")
    os.makedirs(staging, exist_ok=True)
    try:
        m = commit_version(
            lake_root, staging, {}, dict(m.parts), m.num_partitions,
            m.schema, m.version, key=m.key, partition_key=m.partition_key,
            key_cols=m.key_cols, generated=new,
        )
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    if backfill_existing and sum(e.rows for e in m.parts.values()):
        from palimpzest_ray.cdc.expr import eval_expr

        in_cols = sorted(refs)

        def _fill(batch: pa.Table) -> pa.Table:
            col = pc.cast(eval_expr(batch, expr), field.type)
            if isinstance(col, pa.Scalar):
                col = pa.nulls(batch.num_rows, field.type).fill_null(col)
            return pa.table({field.name: col})

        backfill(lake_root, _fill, input_cols=in_cols,
                 output_cols=[field.name])
        m = load_latest_manifest(lake_root)
    return m


def drop_constraint(lake_root: str, name: str) -> LakeManifest:
    """Remove a persistent constraint (zero-file metadata commit).
    Time travel still shows it at prior versions."""
    m = load_latest_manifest(lake_root)
    if m is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    if not m.constraints or name not in m.constraints:
        raise ValueError(
            f"no constraint {name!r} on this lake "
            f"(have: {sorted(m.constraints or {})})"
        )
    new = {n: p for n, p in m.constraints.items() if n != name}
    staging = os.path.join(lake_root, ".staging", f"ddl-{uuid.uuid4().hex[:8]}")
    os.makedirs(staging, exist_ok=True)
    try:
        return commit_version(
            lake_root, staging, {}, dict(m.parts), m.num_partitions,
            m.schema, m.version, key=m.key, partition_key=m.partition_key,
            key_cols=m.key_cols, constraints=new or None,
        )
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def _dml_feed_schema(m: LakeManifest, cols: list[str]) -> pa.Schema:
    user = [f for f in m.schema if f.name in cols]
    return pa.schema(
        [pa.field("lsn", pa.int64()), pa.field("op", pa.string())] + user
    )


def delete_where(
    lake_root: str,
    predicate: list[tuple] | None = None,
    *,
    expr=None,
    mode: str = "delta",
    run_id: str | None = None,
) -> ApplyResult:
    """SQL-DELETE over the lake: tombstone every live row matching the
    predicate, as one exactly-once commit. The scan is the pruned
    :func:`final_state` read (manifest zone maps → footers → fragment
    filter), the write is an ordinary change-log apply of DELETE events
    at ``max_lsn + 1`` — so deletion inherits LWW idempotence,
    time travel (the prior version still shows the rows), resume and
    the merge-on-read cost model (``mode="delta"`` stages only
    tombstone rows). All deletes share one LSN: LWW is per key, and a
    single statement has no internal order.

    ``expr=`` accepts a full :mod:`~palimpzest_ray.cdc.expr` boolean
    expression instead of conjuncts (disjunctions, arithmetic,
    cross-column comparisons); the scan then prunes its read to the
    referenced columns but cannot zone-prune files the way conjuncts
    do — prefer conjuncts when the shape allows."""
    m = load_latest_manifest(lake_root)
    if m is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    if (predicate is None) == (expr is None):
        raise ValueError("pass exactly one of predicate or expr=")
    key = m.key
    lsn = int(m.max_lsn) + 1
    if expr is not None:
        from palimpzest_ray.cdc.expr import expr_columns, validate_expr

        user = pa.schema(
            [f for f in m.schema if f.name not in (LSN_COL, TOMBSTONE_COL)]
        )
        validate_expr(expr, user)
        refs = sorted(expr_columns(expr) | {key})
        scan = final_state(lake_root, columns=refs)
        stored = {"expr": expr}

        def _match(batch: pa.Table) -> pa.Table:
            return batch.filter(_expect_mask(batch, stored))

        matches = scan.map_batches(_match, batch_format="pyarrow")
    else:
        matches = final_state(lake_root, columns=[key], predicate=predicate)

    def _as_deletes(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "lsn": pa.array(np.full(n, lsn, dtype=np.int64)),
                "op": pa.array(["DELETE"] * n),
                key: batch[key],
            }
        )

    feed = matches.map_batches(_as_deletes, batch_format="pyarrow")
    return apply_changes(
        feed,
        lake_root,
        key=key,
        partition_key=m.partition_key,
        mode=mode,
        run_id=run_id,
        change_schema=_dml_feed_schema(m, [key]),
    )


def update_where(
    lake_root: str,
    predicate: list[tuple],
    set_values: dict,
    *,
    mode: str = "delta",
    run_id: str | None = None,
) -> ApplyResult:
    """SQL-UPDATE over the lake: rewrite the SET columns of every live
    row matching the predicate, one exactly-once commit at
    ``max_lsn + 1``. Reads only the key + the columns the row must
    carry forward (full user row — an UPDATE event replaces the row
    under LWW), applies ``set_values`` vectorized, feeds the apply.

    A SET value may be a :class:`~palimpzest_ray.cdc.expr.Expr`
    wrapping a DSL expression over the row's columns —
    ``SET n_tok = n_tok + 1`` is ``{"n_tok": Expr(["add", ["col",
    "n_tok"], 1])}``; a plain value stays a constant assignment."""
    from palimpzest_ray.cdc.expr import Expr, eval_expr, expr_columns

    m = load_latest_manifest(lake_root)
    if m is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    key = m.key
    user_cols = [f.name for f in m.schema if f.name not in (LSN_COL, TOMBSTONE_COL)]
    unknown = set(set_values) - set(user_cols)
    if unknown:
        raise ValueError(f"SET columns not in lake schema: {sorted(unknown)}")
    if key in set_values:
        raise ValueError(f"cannot SET the LWW key {key!r}")
    if m.key_cols and set(set_values) & set(m.key_cols):
        raise ValueError(
            f"cannot SET composite-key component(s) "
            f"{sorted(set(set_values) & set(m.key_cols))} — the record "
            "key is immutable (DELETE + INSERT to re-key)"
        )
    for c, v in set_values.items():
        if isinstance(v, Expr):
            bad = expr_columns(v.expr) - set(user_cols)
            if bad:
                raise ValueError(
                    f"SET expression for {c!r} references unknown "
                    f"column(s) {sorted(bad)}"
                )
    lsn = int(m.max_lsn) + 1
    matches = final_state(lake_root, columns=user_cols, predicate=predicate)

    def _as_updates(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {
            "lsn": pa.array(np.full(n, lsn, dtype=np.int64)),
            "op": pa.array(["UPDATE"] * n),
        }
        for c in user_cols:
            if c in set_values:
                v = set_values[c]
                typ = batch[c].type if c in batch.column_names else None
                if isinstance(v, Expr):
                    col = pc.cast(eval_expr(batch, v.expr), typ)
                    if isinstance(col, pa.Scalar):
                        col = pa.nulls(n, typ).fill_null(col)
                    cols[c] = col
                else:
                    cols[c] = pa.array([v] * n, typ)
            else:
                cols[c] = batch[c]
        return pa.table(cols)

    feed = matches.map_batches(_as_updates, batch_format="pyarrow")
    return apply_changes(
        feed,
        lake_root,
        key=key,
        partition_key=m.partition_key,
        mode=mode,
        run_id=run_id,
        change_schema=_dml_feed_schema(m, user_cols),
    )


def delete_keys(
    lake_root: str,
    keys: list,
    *,
    mode: str = "delta",
    run_id: str | None = None,
) -> ApplyResult:
    """Tombstone an explicit key set (the right-to-be-forgotten /
    contamination-purge primitive — compose with
    ``stages.text.decontaminate_tokens(mode="flag")`` to find the
    keys). One DELETE event per key at ``max_lsn + 1``."""
    m = load_latest_manifest(lake_root)
    if m is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    key = m.key
    if m.key_cols and keys and isinstance(keys[0], (tuple, list)):
        from palimpzest_ray.cdc.keys import encode_key_tuples

        keys = encode_key_tuples(keys)
    lsn = int(m.max_lsn) + 1
    karr = pa.array(list(keys))
    # on a composite lake the feed carries the synthesized _ckey
    # directly (no component payload needed — an exported _ckey wins
    # over re-synthesis), while the apply states the lake's own
    # identity contract (the key TUPLE)
    feed = pa.table(
        {
            "lsn": pa.array(np.full(len(karr), lsn, dtype=np.int64)),
            "op": pa.array(["DELETE"] * len(karr)),
            key: karr.cast(m.schema.field(key).type),
        }
    )
    return apply_changes(
        rd.from_arrow(feed),
        lake_root,
        key=m.key_cols if m.key_cols else key,
        partition_key=m.partition_key,
        mode=mode,
        run_id=run_id,
        change_schema=_dml_feed_schema(m, [key]),
    )


def backfill(
    lake_root: str,
    fn,
    *,
    input_cols: list[str],
    output_cols: list[str],
    predicate: list[tuple] | None = None,
    mode: str = "delta",
    run_id: str | None = None,
) -> ApplyResult:
    """Computed UPDATE over the lake: ``SET out_cols = fn(batch)`` for
    every live row (optionally predicate-pruned) — the missing half of
    DML next to :func:`update_where`'s constant SET, and the natural
    partner of :func:`alter_schema`: add a column as metadata-only DDL,
    then backfill its values in one exactly-once commit at
    ``max_lsn + 1``.

    ``fn(batch: pa.Table) -> pa.Table`` receives the key +
    ``input_cols`` (vectorized, per batch) and must return exactly
    ``output_cols``, row-aligned. Columns the row must carry forward
    are read alongside (an UPDATE event replaces the whole row under
    LWW) — reads stay pruned to key + carried + input columns."""
    m = load_latest_manifest(lake_root)
    if m is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    key = m.key
    user_cols = [
        f.name for f in m.schema if f.name not in (LSN_COL, TOMBSTONE_COL)
    ]
    unknown = set(output_cols) - set(user_cols)
    if unknown:
        raise ValueError(
            f"output_cols not in lake schema (alter_schema first?): "
            f"{sorted(unknown)}"
        )
    if key in output_cols:
        raise ValueError(f"cannot backfill the LWW key {key!r}")
    missing_in = set(input_cols) - set(user_cols)
    if missing_in:
        raise ValueError(f"input_cols not in lake schema: {sorted(missing_in)}")
    lsn = int(m.max_lsn) + 1
    read_cols = list(dict.fromkeys(user_cols))  # full row carries forward
    matches = final_state(lake_root, columns=read_cols, predicate=predicate)

    def _as_updates(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        computed = fn(batch.select([key] + [c for c in input_cols if c != key]))
        got = set(computed.column_names)
        if got != set(output_cols) or computed.num_rows != n:
            raise ValueError(
                f"backfill fn must return exactly {output_cols} "
                f"({n} rows); got {sorted(got)} ({computed.num_rows})"
            )
        cols = {
            "lsn": pa.array(np.full(n, lsn, dtype=np.int64)),
            "op": pa.array(["UPDATE"] * n),
        }
        for c in user_cols:
            if c in output_cols:
                cols[c] = computed[c].cast(m.schema.field(c).type)
            else:
                cols[c] = batch[c]
        return pa.table(cols)

    feed = matches.map_batches(_as_updates, batch_format="pyarrow")
    return apply_changes(
        feed,
        lake_root,
        key=key,
        partition_key=m.partition_key,
        mode=mode,
        run_id=run_id,
        change_schema=_dml_feed_schema(m, user_cols),
    )


def merge_into(
    lake_root: str,
    source: pa.Table,
    *,
    when_matched: str = "update",
    when_not_matched: str = "insert",
    update_cols: list[str] | None = None,
    mode: str = "delta",
    run_id: str | None = None,
) -> ApplyResult:
    """SQL MERGE INTO for a source micro-batch: one exactly-once commit
    at ``max_lsn + 1`` implementing the Delta/Iceberg merge matrix —
    ``when_matched`` ∈ {"update", "delete", "skip"},
    ``when_not_matched`` ∈ {"insert", "skip"}.

    Match detection is a partition-pruned :func:`lookup` of the
    source's keys (≤ len(source) partition chains read, never a lake
    scan — the same serving-path pruning point lookups use), which also
    fetches the existing rows so ``update_cols`` can rewrite a COLUMN
    SUBSET while unlisted columns carry forward (an UPDATE event
    replaces the whole row under LWW, so partial updates must splice).
    The symmetric case (update+insert, all columns) needs no match
    detection at all — it IS the engine's upsert; use a plain
    :func:`apply_changes` for big symmetric sources.

    ``source`` must hold the lake's key column plus any payload columns
    it asserts; missing payload columns null-fill on insert and carry
    forward on update."""
    if when_matched not in ("update", "delete", "skip"):
        raise ValueError("when_matched must be update|delete|skip")
    if when_not_matched not in ("insert", "skip"):
        raise ValueError("when_not_matched must be insert|skip")
    m = load_latest_manifest(lake_root)
    if m is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    key = m.key
    if key not in source.column_names:
        raise ValueError(f"source is missing the lake key column {key!r}")
    user_cols = [
        f.name for f in m.schema if f.name not in (LSN_COL, TOMBSTONE_COL)
    ]
    if update_cols is not None:
        unknown = set(update_cols) - set(user_cols)
        if unknown:
            raise ValueError(
                f"update_cols not in lake schema: {sorted(unknown)}"
            )
        if key in update_cols:
            raise ValueError(f"cannot update the LWW key {key!r}")
        missing = set(update_cols) - set(source.column_names)
        if missing:
            raise ValueError(
                f"update_cols missing from source: {sorted(missing)}"
            )
    lsn = int(m.max_lsn) + 1
    skeys = source[key].to_pylist()
    if len(set(skeys)) != len(skeys):
        raise ValueError("source has duplicate keys — MERGE is ambiguous")
    existing = lookup(lake_root, skeys, key=key, columns=user_cols)
    matched_keys = set(existing[key].to_pylist())
    src_matched = pa.array(
        [k in matched_keys for k in skeys], pa.bool_()
    )

    payload = [c for c in user_cols if c != key]
    events: list[pa.Table] = []

    def _rows(tbl: pa.Table, op: str, cols: dict) -> pa.Table:
        n = tbl.num_rows
        out = {
            "lsn": pa.array(np.full(n, lsn, dtype=np.int64)),
            "op": pa.array([op] * n),
            key: tbl[key].cast(m.schema.field(key).type),
        }
        for c in payload:
            out[c] = cols[c]
        return pa.table(out)

    def _payload_from(tbl: pa.Table) -> dict:
        n = tbl.num_rows
        return {
            c: (
                tbl[c].cast(m.schema.field(c).type)
                if c in tbl.column_names
                else pa.nulls(n, m.schema.field(c).type)
            )
            for c in payload
        }

    if when_not_matched == "insert":
        ins = source.filter(pc.invert(src_matched))
        if ins.num_rows:
            events.append(_rows(ins, "INSERT", _payload_from(ins)))
    if when_matched == "delete":
        dl = source.filter(src_matched)
        if dl.num_rows:
            n = dl.num_rows
            events.append(
                _rows(
                    dl, "DELETE",
                    {c: pa.nulls(n, m.schema.field(c).type) for c in payload},
                )
            )
    elif when_matched == "update":
        upd = source.filter(src_matched)
        if upd.num_rows:
            if update_cols is None:
                cols = _payload_from(upd)
            else:
                # splice: listed columns from source, the rest from the
                # existing row (fetched by the same lookup)
                old = {
                    r[key]: r for r in existing.to_pylist()
                }
                cols = {}
                ukeys = upd[key].to_pylist()
                for c in payload:
                    if c in update_cols:
                        cols[c] = upd[c].cast(m.schema.field(c).type)
                    else:
                        cols[c] = pa.array(
                            [old[k2][c] for k2 in ukeys],
                            m.schema.field(c).type,
                        )
            events.append(_rows(upd, "UPDATE", cols))
    if not events:
        return ApplyResult(
            manifest=m, events_seen=0, rows_upserted=0, rows_deleted=0,
            partitions_rewritten=0, partitions_resumed=0,
        )
    feed = pa.concat_tables(events)
    return apply_changes(
        rd.from_arrow(feed),
        lake_root,
        key=key,
        partition_key=m.partition_key,
        mode=mode,
        run_id=run_id,
        change_schema=_dml_feed_schema(m, user_cols),
    )


def key_history(
    lake_root: str,
    keys: list,
    *,
    key: str | None = None,
    columns: list[str] | None = None,
    changes_only: bool = True,
) -> pa.Table:
    """Temporal read: every retained VERSION of the given keys — the
    SCD2 view a warehouse derives with effective-date columns, read
    here directly off the manifest history. For each un-vacuumed
    version the keys are fetched with the partition-pruned
    :func:`lookup` (≤ len(keys) partition chains per version, never a
    scan); a deleted key contributes no row at versions where it is
    tombstoned, so its disappearance IS the deletion record.

    Output columns: ``_version`` (manifest version), ``_lsn`` (the
    row's writer LSN) + the key + requested columns, ordered by
    (key, _version). ``changes_only=True`` collapses consecutive
    versions whose row did not change (same ``_lsn`` — every write
    carries a fresh LSN, so LSN equality ⟺ the row was carried
    forward), turning V versions into just the change points."""
    from palimpzest_ray.cdc.manifest import load_manifest

    latest = load_latest_manifest(lake_root)
    if latest is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    key = key or latest.key
    versions = []
    for v in range(1, latest.version + 1):
        try:
            load_manifest(lake_root, v)
            versions.append(v)
        except FileNotFoundError:  # vacuumed
            continue
    pieces = []
    want_cols = columns
    for v in versions:
        t = lookup(lake_root, keys, key=key, version=v,
                   columns=want_cols, keep_lsn=True)
        if t.num_rows:
            pieces.append(
                t.append_column(
                    "_version", pa.array(np.full(t.num_rows, v, np.int64))
                )
            )
    if not pieces:
        empty = pa.table({key: pa.array([], latest.schema.field(key).type)})
        return empty.append_column(
            "_version", pa.array([], pa.int64())
        )
    out = pa.concat_tables(pieces, promote_options="permissive")
    order = pc.sort_indices(
        out, sort_keys=[(key, "ascending"), ("_version", "ascending")]
    )
    out = out.take(order)
    if changes_only and out.num_rows:
        ks = out[key].to_numpy(zero_copy_only=False) \
            if not pa.types.is_string(out[key].type) \
            else np.array(out[key].to_pylist(), dtype=object)
        lsns = out["_lsn"].to_numpy(zero_copy_only=False)
        keep = np.ones(out.num_rows, bool)
        keep[1:] = (ks[1:] != ks[:-1]) | (lsns[1:] != lsns[:-1])
        out = out.filter(pa.array(keep))
    return out


def quarantine_watermark(lake_root: str) -> int | None:
    """Highest LSN ever dead-lettered (footer stats only — no data
    read). Tailing must treat a quarantined event as CONSUMED: the
    manifest's ``max_lsn`` covers only healthy merges, so a bad event
    holding the log's tail position would be re-read — and
    re-quarantined into a fresh commit — on every poll without this."""
    files = sorted(
        glob.glob(os.path.join(lake_root, "_quarantine", "v*.parquet"))
    )
    mx: int | None = None
    # purge_keys persists the pre-scrub high-water here so removing a
    # dead-lettered event cannot regress the tail position
    wfile = os.path.join(lake_root, "_quarantine", "WATERMARK.json")
    if os.path.exists(wfile):
        with open(wfile) as fh:
            mx = int(json.load(fh)["max_lsn"])
    for f in files:
        md = pq.ParquetFile(f).metadata
        if md.num_rows == 0:
            continue
        idx = md.schema.to_arrow_schema().get_field_index("lsn")
        if idx < 0:
            continue
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            if st is not None and st.max is not None:
                mx = st.max if mx is None else max(mx, st.max)
    return mx


def ingest_lag(log_dir: str | list[str], lake_root: str) -> dict:
    """Replication lag: how far the lake trails the log, from parquet
    FOOTER stats only (no data read — O(files) metadata, callable from
    a monitor at any frequency). ``lag_events`` is an upper bound: the
    row count of every row group not provably at-or-below the
    watermark (row-group granularity; files wholly below cost nothing
    and count nothing). ``watermark`` covers quarantined events too —
    consumed is consumed, whichever side of the gate they landed on."""
    files = _expand_paths(log_dir)
    prev = load_latest_manifest(lake_root)
    watermark = prev.max_lsn if prev is not None else None
    qw = quarantine_watermark(lake_root)
    if qw is not None:
        watermark = qw if watermark is None else max(watermark, qw)
    log_max = None
    lag_rows = 0
    files_pending = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        if md.num_rows == 0:
            continue
        idx = md.schema.to_arrow_schema().get_field_index("lsn")
        pending = False
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics if idx >= 0 else None
            gmax = st.max if st is not None and st.max is not None else None
            if gmax is not None:
                log_max = gmax if log_max is None else max(log_max, gmax)
            if watermark is None or gmax is None or gmax > watermark:
                lag_rows += md.row_group(g).num_rows
                pending = True
        files_pending += pending
    return {
        "watermark": watermark,
        "log_max_lsn": log_max,
        "lag_events": lag_rows,  # upper bound (row-group granularity)
        "files_pending": files_pending,
        "files_total": len(files),
        "caught_up": lag_rows == 0,
    }


def _consumed_ledger_path(lake_root: str) -> str:
    return os.path.join(lake_root, ".consumed.json")


def _load_consumed(lake_root: str) -> dict:
    try:
        with open(_consumed_ledger_path(lake_root)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return {}


def _record_consumed(lake_root: str, files: list[str]) -> None:
    ledger = _load_consumed(lake_root)
    for f in files:
        try:
            ledger[os.path.basename(f)] = os.path.getsize(f)
        except OSError:
            continue  # rotated away mid-poll; re-read next time
    tmp = _consumed_ledger_path(lake_root) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(ledger, fh)
    os.replace(tmp, _consumed_ledger_path(lake_root))


def tail_once(
    log_dir: str | list[str],
    lake_root: str,
    patch: bool = False,
    format: str = "parquet",
    transform=None,
    **apply_kwargs,
) -> ApplyResult:
    """One binlog-tail iteration: apply every event past the lake's
    committed watermark (``manifest.max_lsn``) from ``log_dir`` and
    commit. Idempotent — a crashed/duplicated tail converges by LWW —
    and cheap: log files wholly at-or-below the watermark are pruned by
    parquet footer stats without being read. Call in a loop (or from a
    scheduler) to follow a growing log directory; each iteration with
    new events commits one version, iterations with none are no-ops.

    ``patch=True`` treats the log as PARTIAL-image updates (Mongo /
    Debezium partial feeds) and routes through
    :func:`~palimpzest_ray.cdc.patch.apply_patches` — null columns
    carry forward instead of overwriting. Add ``sum_cols=(...)`` to
    tail an ACCUMULATING delta feed (``apply_accumulate`` semantics);
    the watermark here is exactly what makes raw delta re-reads safe
    for a non-idempotent feed.

    ``format="jsonl"`` / ``"debezium"`` tails a JSON topic directory.
    JSON has no footer stats, so pruning uses a consumed-file ledger
    (``<lake>/.consumed.json``: basename → size): a file whose size is
    unchanged since it was applied is skipped without being parsed; a
    GROWN file (the active segment) re-parses fully and the LSN
    watermark drops its already-applied lines — so the ledger is pure
    economy, never correctness (a lost ledger just re-parses
    everything into a watermark no-op). The ledger updates after the
    commit; a crash between the two re-parses once and converges.

    ``transform=`` — a ``Dataset -> Dataset`` hook applied to the
    pending feed BETWEEN read and apply: the composition point for
    ingest-time enrichment (``enrich_changes`` partially applied),
    custom filtering, or envelope rewrites in the daemon loop. The
    watermark file pruning still runs first (the transform only sees
    events the tail would apply); row-level watermark filtering still
    runs after (a transform cannot resurrect consumed events). Not
    supported with ``patch=True`` (the patch fold consumes raw
    partial images)."""
    prev = load_latest_manifest(lake_root)
    watermark = prev.max_lsn if prev is not None else None
    if apply_kwargs.get("quarantine"):
        qw = quarantine_watermark(lake_root)
        if qw is not None:
            watermark = qw if watermark is None else max(watermark, qw)
    if patch or format == "patch":
        if transform is not None:
            raise ValueError(
                "transform= is not supported with patch=True — the "
                "patch fold consumes raw partial images"
            )
        from palimpzest_ray.cdc.patch import apply_patches

        return apply_patches(
            log_dir, lake_root, since_lsn=watermark, **apply_kwargs
        )
    if format in ("jsonl", "debezium", "maxwell"):
        from palimpzest_ray.schemas import CHANGELOG_SCHEMA
        from palimpzest_ray.sources.changelog import (
            read_debezium_changes,
            read_jsonl_changes,
            read_maxwell_changes,
        )

        dirs = [log_dir] if isinstance(log_dir, str) else list(log_dir)
        files: list[str] = []
        for d in dirs:
            if os.path.isdir(d):
                files.extend(
                    os.path.join(d, f)
                    for f in sorted(os.listdir(d))
                    if f.endswith((".json", ".jsonl"))
                )
            else:
                files.append(d)
        ledger = _load_consumed(lake_root)
        pending = [
            f
            for f in files
            if ledger.get(os.path.basename(f)) != os.path.getsize(f)
        ]
        if not pending:
            if prev is None:
                raise FileNotFoundError("empty topic and no committed version")
            return ApplyResult(prev, 0, 0, 0, 0, 0)
        reader = {
            "debezium": read_debezium_changes,
            "maxwell": read_maxwell_changes,
            "jsonl": read_jsonl_changes,
        }[format]
        feed = reader(pending)
        if transform is not None:
            feed = transform(feed)
        res = apply_changes(
            feed, lake_root,
            since_lsn=watermark,
            change_schema=apply_kwargs.pop("change_schema", CHANGELOG_SCHEMA),
            **apply_kwargs,
        )
        _record_consumed(lake_root, pending)
        return res
    if transform is not None:
        # build the pending feed ourselves so the transform sees a
        # Dataset; reproduce the footer-stat file pruning apply_changes
        # does for path inputs (a tail re-scan must stay cheap)
        files = _expand_paths(log_dir)
        if watermark is not None:
            kept = []
            for f in files:
                md = pq.ParquetFile(f).metadata
                if md.num_rows == 0:
                    continue
                idx = md.schema.to_arrow_schema().get_field_index("lsn")
                mx = None
                unknown = False
                for g in range(md.num_row_groups):
                    st = md.row_group(g).column(idx).statistics
                    if st is None or st.max is None:
                        unknown = True
                        break
                    mx = st.max if mx is None else max(mx, st.max)
                if unknown or (mx is not None and mx > watermark):
                    kept.append(f)
            files = kept
        if not files:
            if prev is None:
                raise FileNotFoundError("empty log and no committed version")
            return ApplyResult(prev, 0, 0, 0, 0, 0)
        feed = transform(rd.read_parquet(files))
        return apply_changes(
            feed, lake_root, since_lsn=watermark, **apply_kwargs
        )
    return apply_changes(log_dir, lake_root, since_lsn=watermark, **apply_kwargs)


def tail_follow(
    log_dir: str | list[str],
    lake_root: str,
    *,
    poll_interval: float = 2.0,
    idle_stop: int | None = 3,
    max_commits: int | None = None,
    stop_file: str | None = None,
    on_commit=None,
    **apply_kwargs,
) -> list[ApplyResult]:
    """Follow a growing log directory: loop :func:`tail_once` until a
    stop condition, committing one lake version per iteration that finds
    events past the watermark. The driver-side daemon mode of the ingest
    story (a scheduler/cron owns restarts; every iteration is idempotent
    by LWW, so kill-anywhere is safe).

    Stop conditions (at least one must be set — an unconditionally
    infinite loop is the caller's own ``while True``):

    - ``idle_stop``: N consecutive polls with no new events ("the
      producer drained" — the batch-backfill exit).
    - ``max_commits``: stop after N committing iterations.
    - ``stop_file``: path whose existence requests a cooperative stop
      (checked each iteration; the operational kill switch).

    ``on_commit(result)`` fires after each committed version — the hook
    downstream maintenance rides on (refresh a view / index, kick
    ``auto_compact``, export a change feed). Polls that find nothing
    skip the sleep only when the previous poll committed (drain fast
    while the producer is ahead; back off when caught up).
    """
    import time as _time

    if idle_stop is None and max_commits is None and stop_file is None:
        raise ValueError(
            "tail_follow needs a stop condition: idle_stop, max_commits "
            "or stop_file"
        )
    results: list[ApplyResult] = []
    idle = 0
    while True:
        if stop_file is not None and os.path.exists(stop_file):
            break
        res = tail_once(log_dir, lake_root, **apply_kwargs)
        committed = res.events_seen > 0
        if committed:
            idle = 0
            results.append(res)
            if on_commit is not None:
                on_commit(res)
            if max_commits is not None and len(results) >= max_commits:
                break
        else:
            idle += 1
            if idle_stop is not None and idle >= idle_stop:
                break
            _time.sleep(poll_interval)
    return results


def repartition_lake(
    lake_root: str,
    new_num_partitions: int,
    *,
    run_id: str | None = None,
    exchange: str = "ray",
    drop_tombstones_below: int | None = None,
) -> ApplyResult:
    """Re-bucket the lake to a new partition count — the sanctioned way
    to change the layout as data grows (``apply_changes`` pins P to the
    manifest's). Streams the current state back through the apply
    machinery as a change log carrying each row's persisted ``_lsn``
    (so watermarks survive) — live rows as INSERTs, persisted tombstones
    as DELETEs so deleted keys stay dead under the new layout — bucketed
    under the new P with no base merge; commits as the next version,
    exactly-once like any apply. Old-layout files become unreferenced
    and are reclaimed by :func:`vacuum`.

    ``drop_tombstones_below``: also compact away tombstones with
    ``_lsn`` below the given watermark — safe once no out-of-order log
    segment below it can still arrive (tombstone retention)."""
    prev = load_latest_manifest(lake_root)
    if prev is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    user_fields = [f for f in prev.schema if f.name not in (LSN_COL, TOMBSTONE_COL)]
    change_schema = pa.schema(
        [pa.field("lsn", pa.int64()), pa.field("op", pa.string())] + user_fields
    )

    def _as_changes(batch: pa.Table) -> pa.Table:
        lsn = batch[LSN_COL].cast(pa.int64())
        dead = (
            pc.coalesce(batch[TOMBSTONE_COL], pa.scalar(False))
            if TOMBSTONE_COL in batch.column_names
            else pa.array(np.zeros(batch.num_rows, dtype=bool))
        )
        out = pa.table(
            {
                "lsn": lsn,
                "op": pc.if_else(dead, pa.scalar("DELETE"), pa.scalar("INSERT")),
                **{f.name: batch[f.name] for f in user_fields},
            }
        )
        if drop_tombstones_below is not None:
            expired = pc.and_(
                dead, pc.less(lsn, pa.scalar(drop_tombstones_below, pa.int64()))
            )
            out = out.filter(pc.invert(expired))
        return out

    state = final_state(
        lake_root, user_columns_only=False, include_tombstones=True
    ).map_batches(_as_changes, batch_format="pyarrow")
    return apply_changes(
        state,
        lake_root,
        num_partitions=new_num_partitions,
        key=prev.key_cols if prev.key_cols else prev.key,
        partition_key=prev.partition_key,
        run_id=run_id,
        exchange=exchange,
        change_schema=change_schema,
        _rebucket=True,
    )


def _column_ranges(table: pa.Table) -> dict:
    """Per-column [min, max] over the scalar predicate-eligible columns
    (int/float/string/bool) — the manifest-level zone map a merge
    worker computes at write time. Nulls are ignored; an all-null or
    non-scalar column is simply absent (readers treat absence as
    unknown, never as prunable)."""
    out: dict = {}
    for f in table.schema:
        if f.name in (LSN_COL, TOMBSTONE_COL, PART_COL, "lsn", "op"):
            continue
        t = f.type
        if not (
            pa.types.is_integer(t)
            or pa.types.is_floating(t)
            or pa.types.is_string(t)
            or pa.types.is_large_string(t)
            or pa.types.is_boolean(t)
        ):
            continue
        col = table[f.name]
        if len(col) == 0 or col.null_count == len(col):
            continue
        mm = pc.min_max(col)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        if lo is None or (isinstance(lo, float) and lo != lo):  # all-null / NaN
            continue
        out[f.name] = [lo, hi]
    return out


def _range_may_match(lo, hi, op: str, value) -> bool:
    """Can any row satisfy ``col <op> value`` given the column's
    [min, max]? Incomparable types → maybe (True)."""
    try:
        if op == "==":
            return lo <= value <= hi
        if op == "!=":
            return not (lo == value == hi)
        if op == ">=":
            return hi >= value
        if op == ">":
            return hi > value
        if op == "<=":
            return lo <= value
        if op == "<":
            return lo < value
        if op == "in":
            return any(lo <= v <= hi for v in value)
    except TypeError:
        return True
    return True


def _alias_names(col: str, renames: dict | None) -> list[str]:
    """A logical column plus every historical physical name that maps
    to it (column-mapping): the names under which pre-rename files and
    pre-rename manifest entries may carry this column's data/stats."""
    if not renames:
        return [col]
    return [col] + [old for old, new in renames.items() if new == col]


def _entry_may_match(
    entry: PartEntry, predicate: list[tuple], renames: dict | None = None
) -> bool:
    """Driver-side partition pruning off the manifest zone map — no
    parquet footer is opened for a pruned partition (at 1e5 files on
    object storage the footer round trips ARE the planning cost). A
    missing map or missing column is unknown → keep; the footer-level
    :func:`zone_prune_files` still runs on survivors.

    ``_lsn`` predicates prune off the partition WATERMARK: every row's
    ``_lsn`` is at most the entry's ``max_lsn`` (rows come from changes
    whose lsn the apply's watermark bounds; re-buckets recompute it) —
    so a change-feed catch-up (``net_changes_since``) touches only
    partitions that actually advanced past the consumer's version."""
    cs = entry.col_stats
    for col, op, v in predicate:
        if col == LSN_COL:
            if not _range_may_match(-(2**62), entry.max_lsn, op, v):
                return False
            continue
        if cs is None:
            continue
        r = next(
            (rr for a in _alias_names(col, renames) if (rr := cs.get(a)) is not None),
            None,
        )
        if r is not None and not _range_may_match(r[0], r[1], op, v):
            return False
    return True


def _stats_may_match(stats, op: str, value) -> bool:
    """Can any row in a row group satisfy ``col <op> value`` given its
    parquet min/max statistics? Missing/untyped stats → maybe (True)."""
    if stats is None or not stats.has_min_max:
        return True
    return _range_may_match(stats.min, stats.max, op, value)


def zone_prune_files(
    files: list[str], predicate: list[tuple], renames: dict | None = None
) -> tuple[list[str], int, int]:
    """File-level zone-map pruning: keep a file only if SOME row group's
    min/max statistics can satisfy EVERY conjunct. A file lacking a
    predicate column entirely (pre-evolution epoch) is pruned — those
    rows are null there and a comparison never matches NULL. Returns
    (kept files, row groups scanned as maybe-matching, total row
    groups) — the counters are what tests assert. Footer-only reads;
    the exact row filter still runs inside the scan (pushdown via the
    arrow fragment filter), so pruning is a pure I/O optimization,
    never a semantics change."""
    kept: list[str] = []
    rg_match = rg_total = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        # column-mapping: a pre-rename file carries the predicate
        # column's data under a historical name — prune by THOSE stats
        cidx = {
            col: next(
                (idx[a] for a in _alias_names(col, renames) if a in idx), None
            )
            for col, _op, _v in predicate
        }
        if any(i is None for i in cidx.values()):
            rg_total += md.num_row_groups
            continue
        file_hit = False
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            rg_total += 1
            if all(
                _stats_may_match(g.column(cidx[col]).statistics, op, v)
                for col, op, v in predicate
            ):
                rg_match += 1
                file_hit = True
        if file_hit:
            kept.append(f)
    return kept, rg_match, rg_total


def _predicate_expr(predicate: list[tuple], name_map: dict | None = None):
    """The exact pyarrow dataset expression for the conjuncts — pushed
    into the parquet scan (arrow skips non-matching row groups by
    stats, then filters rows exactly). ``name_map`` translates logical
    column names to the physical names one file group actually carries
    (column-mapping: pre-rename files)."""
    import pyarrow.dataset as pds

    expr = None
    for col, op, v in predicate:
        f = pds.field((name_map or {}).get(col, col))
        e = {
            "==": lambda: f == v,
            "!=": lambda: f != v,
            ">=": lambda: f >= v,
            ">": lambda: f > v,
            "<=": lambda: f <= v,
            "<": lambda: f < v,
            "in": lambda: f.isin(list(v)),
        }[op]()
        expr = e if expr is None else (expr & e)
    return expr


def _predicate_mask(table: pa.Table, predicate: list[tuple]):
    """Boolean mask for the conjuncts (null comparisons → False), the
    shared evaluator behind post-resolution filters and ingest
    expectations. A column absent from the table evaluates as all-null
    (→ False): an ingest batch that doesn't carry a constrained column
    is inserting NULL there, which fails the constraint — lake readers
    conform to the manifest schema first, so absence never occurs on
    the read side for a schema-validated predicate."""
    mask = None
    for col, op, v in predicate:
        c = (
            table[col]
            if col in table.column_names
            else pa.nulls(table.num_rows)
        )
        m = {
            "==": lambda: pc.equal(c, v),
            "!=": lambda: pc.not_equal(c, v),
            ">=": lambda: pc.greater_equal(c, v),
            ">": lambda: pc.greater(c, v),
            "<=": lambda: pc.less_equal(c, v),
            "<": lambda: pc.less(c, v),
            "in": lambda: pc.is_in(c, value_set=pa.array(list(v))),
        }[op]()
        m = pc.coalesce(m, pa.scalar(False))
        mask = m if mask is None else pc.and_(mask, m)
    return mask


def _expect_mask(table: pa.Table, pred):
    """Expectation-gate evaluator: ``pred`` is either a conjunct list
    (the mini-language, via :func:`_predicate_mask`) or ``{"expr": e}``
    — a full :mod:`~palimpzest_ray.cdc.expr` CHECK expression. A
    referenced column absent from the batch evaluates as violated
    (inserting NULL into a checked column), mirroring the conjunct
    path's absent-column rule."""
    if isinstance(pred, dict):
        from palimpzest_ray.cdc.expr import eval_expr, expr_columns

        e = pred["expr"]
        if expr_columns(e) - set(table.column_names):
            return pa.nulls(table.num_rows, pa.bool_()).fill_null(False)
        m = eval_expr(table, e)
        if isinstance(m, pa.Scalar):
            return pa.nulls(table.num_rows, pa.bool_()).fill_null(
                pa.scalar(bool(m.as_py()))
            )
        return pc.fill_null(pc.cast(m, pa.bool_()), False)
    return _predicate_mask(table, pred)


def _filter_predicate(table: pa.Table, predicate: list[tuple]) -> pa.Table:
    """Exact post-resolution filter for delta-bearing partitions —
    the fragment-scan pushdown cannot run before LWW resolution there
    (pre-filtering a chain file could drop a base row whose delta
    successor fails the predicate, resurrecting the base value)."""
    mask = _predicate_mask(table, predicate)
    return table.filter(mask) if mask is not None else table


@dataclasses.dataclass
class CompactionPolicy:
    """Triggers for :func:`auto_compact` (round-3 ask #7). Both checks
    are metadata-only (manifest + file sizes) so evaluating the policy
    after every apply costs microseconds; actual work happens only when
    a trigger fires.

    - ``resize_factor``: re-bucket when the advisor's partition count
      (:func:`suggest_num_partitions` at ``target_file_mb``) drifts
      from the manifest's by at least this factor either way — the lake
      grew (files ballooning past the target) or shrank/never filled
      (a swarm of tiny files paying per-file overhead on every scan).
    - ``max_superseded_files``: vacuum once this many on-disk data
      files are no longer referenced by the retained versions — the
      "frequent small commits" debt (every apply supersedes each
      touched partition's previous file).
    - ``tombstone_watermark``: forwarded to the re-bucket so tombstones
      below it compact away (retention contract as in
      :func:`repartition_lake`)."""

    target_file_mb: int = 512
    resize_factor: float = 4.0
    max_superseded_files: int = 64
    keep_versions: int = 2
    min_partitions: int = 8
    tombstone_watermark: int | None = None
    # merge-on-read debt: fold a partition's delta chain back into its
    # base once it reaches this many files (bounds both read-time
    # resolution work and the per-apply narrow stats read)
    max_delta_files: int = 8


def superseded_files(lake_root: str, keep_versions: int = 2) -> list[str]:
    """Data files on disk that none of the retained (last
    ``keep_versions``) manifests reference — what vacuum would delete.
    Metadata-only."""
    from palimpzest_ray.cdc.manifest import load_manifest as _load

    latest = load_latest_manifest(lake_root)
    if latest is None:
        return []
    referenced: set[str] = set()
    for v in range(max(1, latest.version - max(1, keep_versions) + 1),
                   latest.version + 1):
        try:
            m = _load(lake_root, v)
        except FileNotFoundError:
            continue
        referenced.update(os.path.normpath(f) for f in m.data_files(lake_root))
    stale = []
    data_root = os.path.join(lake_root, "data")
    for root, _dirs, names in os.walk(data_root):
        for n in names:
            if n.endswith(".parquet"):
                p = os.path.normpath(os.path.join(root, n))
                if p not in referenced:
                    stale.append(p)
    return sorted(stale)


def auto_compact(
    lake_root: str,
    policy: CompactionPolicy | None = None,
    *,
    exchange: str = "ray",
) -> dict:
    """Evaluate the compaction policy and run whatever fired: a
    re-bucket to the advised partition count (byte-identical state —
    it flows through the same LWW apply machinery) and/or a vacuum of
    superseded files. Returns what happened. ``apply_changes`` calls
    this opportunistically when given ``auto_compact=``; it is also a
    valid standalone maintenance entry point (CLI/cron)."""
    from palimpzest_ray.cdc.manifest import vacuum

    policy = policy or CompactionPolicy()
    m = load_latest_manifest(lake_root)
    if m is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    report: dict = {"repartitioned_to": None, "files_deleted": 0}
    suggested = suggest_num_partitions(
        lake_root, policy.target_file_mb, min_partitions=policy.min_partitions
    )
    P = m.num_partitions
    if suggested >= P * policy.resize_factor or suggested * policy.resize_factor <= P:
        repartition_lake(
            lake_root,
            suggested,
            exchange=exchange,
            drop_tombstones_below=policy.tombstone_watermark,
        )
        report["repartitioned_to"] = suggested
    if report["repartitioned_to"] is not None:
        m = load_latest_manifest(lake_root)  # re-bucket cleared all chains
    longest = max((len(e.deltas) for e in m.parts.values()), default=0)
    if longest >= policy.max_delta_files:
        cr = compact_deltas(lake_root, min_deltas=policy.max_delta_files)
        report["delta_parts_compacted"] = cr["parts_compacted"]
    stale = superseded_files(lake_root, policy.keep_versions)
    if len(stale) >= policy.max_superseded_files:
        vr = vacuum(lake_root, keep_versions=policy.keep_versions)
        report["files_deleted"] = vr.files_deleted
        report["bytes_reclaimed"] = vr.bytes_reclaimed
    return report


def compact_deltas(
    lake_root: str,
    *,
    parts: list[int] | None = None,
    min_deltas: int = 1,
    run_id: str | None = None,
) -> dict:
    """Fold merge-on-read delta chains back into single base files.

    One task per selected partition LWW-resolves its chain (the same
    resolution every reader applies, so the folded state is identical
    by construction) and stages a fresh key-sorted base; the commit
    replaces the chains atomically as the next version. No logical
    change: counters are zero and watermarks carry forward; the old
    chain files become unreferenced and are reclaimed by vacuum.
    Selection: partitions with at least ``min_deltas`` chained files,
    optionally restricted to ``parts``."""
    m = load_latest_manifest(lake_root)
    if m is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    want = set(parts) if parts is not None else None
    targets = sorted(
        p
        for p, e in m.parts.items()
        if len(e.deltas) >= max(1, min_deltas) and (want is None or p in want)
    )
    if not targets:
        return {"parts_compacted": 0, "version": m.version}
    run_id = run_id or uuid.uuid4().hex[:12]
    staging_dir = os.path.join(lake_root, ".staging", run_id)
    os.makedirs(staging_dir, exist_ok=True)
    chains = {p: m.chain(lake_root, p) for p in targets}
    key = m.key
    renames = m.renames
    bloom_col = m.partition_key or m.key  # sidecars index the routing column
    from palimpzest_ray.schemas import schema_to_json

    schema_json = schema_to_json(m.schema)

    def _compact(batch: pa.Table) -> pa.Table:
        limit_kernel_threads()
        from palimpzest_ray.schemas import schema_from_json

        sch = schema_from_json(schema_json)
        rows = []
        for p in batch["part"].to_pylist():
            # winner indices ascend in key order, so the resolved table
            # is already canonically key-sorted (column-mapping applies
            # at the read, so the rewrite MATERIALIZES logical names)
            r = _resolve_chain(
                _read_chain(chains[p], renames=renames), key, sch
            )
            fname = f"part-{p:05d}.parquet"
            out = os.path.join(staging_dir, fname)
            tmp = out + f".tmp-{uuid.uuid4().hex[:8]}"
            pq.write_table(r, tmp, compression="snappy", row_group_size=64 * 1024)
            os.replace(tmp, out)
            write_bloom_sidecar(out, r[bloom_col])
            tombs = _tombstone_count(r)
            rows.append(
                {
                    "part": int(p),
                    "file": fname,
                    "rows": int(r.num_rows - tombs),
                    "tombstones": int(tombs),
                    "col_stats": json.dumps(_column_ranges(r)),
                }
            )
        return pa.Table.from_pylist(rows)

    ids = rd.from_arrow(
        pa.table({"part": pa.array(targets, pa.int32())})
    ).repartition(len(targets))
    lineage = ids.map_batches(
        _compact, batch_format="pyarrow", batch_size=None
    ).take_all()
    new_parts: dict[int, PartEntry] = {}
    for d in lineage:
        p = int(d["part"])
        e = m.parts[p]
        new_parts[p] = PartEntry(
            file=d["file"],
            max_lsn=e.max_lsn,
            rows=int(d["rows"]),
            tombstones=int(d["tombstones"]),
            col_stats=json.loads(d["col_stats"]),
        )
    carried = {p: e for p, e in m.parts.items() if p not in new_parts}
    manifest = commit_version(
        lake_root, staging_dir, new_parts, carried, m.num_partitions,
        m.schema, m.version, key=m.key, partition_key=m.partition_key,
        allow_rebase=True,  # disjoint concurrent applies commute
        key_cols=m.key_cols,
    )
    shutil.rmtree(staging_dir, ignore_errors=True)
    return {"parts_compacted": len(new_parts), "version": manifest.version}


def final_state(
    lake_root: str,
    *,
    user_columns_only: bool = True,
    include_tombstones: bool = False,
    version: int | None = None,
    columns: list[str] | None = None,
    predicate: list[tuple] | None = None,
    as_of: float | None = None,
    tag: str | None = None,
) -> rd.Dataset:
    """Read a committed lake version as a streaming Dataset, unifying
    per-file schemas — carried-forward partitions may predate an
    evolution epoch, so added columns are null-backfilled at read.
    Persisted tombstones are filtered out unless ``include_tombstones``
    (raw physical rows, for rebucketing/compaction). ``version`` time
    travels to any version :func:`vacuum` has not dropped (default:
    latest). ``columns`` prunes the parquet read to the named USER
    columns (+ the internal columns the filter needs) — pass it when a
    consumer doesn't touch the token payload (e.g. aggregate views:
    group/value columns are bytes, tokens are megabytes).

    ``predicate`` — a conjunction of ``(col, op, value)`` with op in
    {==, !=, <, <=, >, >=, in} — is pushed down TWICE (round-3 ask #6):
    file-level zone maps (:func:`zone_prune_files` skips whole files by
    row-group min/max footer stats, plus files predating the column)
    and the arrow fragment filter (row-group skip + exact row filter
    inside the scan). A 100-TB user's first query is ``WHERE source = X
    AND date BETWEEN ...`` — with a matching ``partition_key`` the scan
    touches only that key's partition files.

    ``as_of`` is TIMESTAMP AS OF (epoch seconds): resolved to the
    newest version committed at or before it via the manifests' own
    ``committed_at`` stamps (mutually exclusive with ``version``)."""
    if tag is not None:
        if version is not None or as_of is not None:
            raise ValueError("pass exactly one of version=/as_of=/tag=")
        from palimpzest_ray.cdc.manifest import resolve_tag

        version = resolve_tag(lake_root, tag)
    if as_of is not None:
        if version is not None:
            raise ValueError("pass version= or as_of=, not both")
        from palimpzest_ray.cdc.manifest import version_as_of

        version = version_as_of(lake_root, as_of)
    if version is not None:
        from palimpzest_ray.cdc.manifest import load_manifest

        manifest = load_manifest(lake_root, version)
    else:
        manifest = load_latest_manifest(lake_root)
    if manifest is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    key = manifest.key
    # merge-on-read split: partitions without a delta chain stream
    # straight off their base file (each key lives in exactly one
    # file); delta-bearing partitions go through a per-partition LWW
    # resolver stage.
    part_items = sorted(manifest.parts.items())
    renames = manifest.renames
    if predicate:
        # manifest-level zone maps first: prune whole partitions on the
        # driver with no footer I/O (the footer pass below only sees
        # survivors — at 1e5 files the round trips are the plan cost)
        part_items = [
            (p, e)
            for p, e in part_items
            if _entry_may_match(e, predicate, renames)
        ]
    plain_files = [
        os.path.join(lake_root, e.file) for _p, e in part_items if not e.deltas
    ]
    chain_parts = sorted(p for p, e in part_items if e.deltas)
    schema = manifest.schema
    read_filter = None
    if predicate:
        plain_files, _rg_match, _rg_total = zone_prune_files(
            plain_files, predicate, renames
        )
        # chain-level pruning: every final-state row is SOME chain
        # file's row, so a partition whose whole chain cannot match
        # cannot produce a matching winner. (Per-file pruning inside a
        # kept chain would be unsound — see _filter_predicate.)
        chain_parts = [
            p
            for p in chain_parts
            if zone_prune_files(manifest.chain(lake_root, p), predicate, renames)[0]
        ]
        read_filter = _predicate_expr(predicate)
        if not plain_files and not chain_parts:
            base = pa.schema(
                [f for f in schema if columns is None or f.name in columns]
            )
            if user_columns_only:
                base = pa.schema(
                    [f for f in base if f.name not in (LSN_COL, TOMBSTONE_COL)]
                )
            return rd.from_arrow(base.empty_table())
    read_cols = None
    if columns is not None:
        internal = [TOMBSTONE_COL] if not include_tombstones else []
        if not user_columns_only:
            internal = [LSN_COL, TOMBSTONE_COL]
        read_cols = list(dict.fromkeys(list(columns) + internal))
        keep = [f for f in schema if f.name in read_cols]
        schema = pa.schema(keep)

    def _conform(batch: pa.Table) -> pa.Table:
        t = conform(rename_to_logical(batch, renames), schema)
        if not include_tombstones and TOMBSTONE_COL in t.column_names:
            t = t.filter(
                pc.invert(pc.coalesce(t[TOMBSTONE_COL], pa.scalar(False)))
            )
            if columns is not None and TOMBSTONE_COL not in columns:
                t = t.drop_columns([TOMBSTONE_COL])
        return drop_internal(t) if user_columns_only else t

    import pyarrow.parquet as pq

    streams: list[rd.Dataset] = []
    fkw = {"filter": read_filter} if read_filter is not None else {}
    pcols = [c for c, _o, _v in (predicate or [])]
    # column-mapping: when a predicate column has historical aliases,
    # the single fragment filter cannot name pre-rename files' physical
    # columns — group files by footer names and translate per group
    pred_aliased = any(len(_alias_names(c, renames)) > 1 for c in pcols)
    if plain_files and read_cols is None and not pred_aliased:
        streams.append(
            rd.read_parquet(plain_files, **fkw).map_batches(
                _conform, batch_format="pyarrow"
            )
        )
    elif plain_files:
        # Parquet-level pruning: only the named columns leave storage. A
        # carried-forward file may predate an evolved column, and
        # read_parquet errors on a missing column — so group files by which
        # requested columns their footer actually has (footer reads are
        # metadata-only) and read each group with its own pruned list
        # (translated to the file's physical names under column-mapping);
        # conform() null-backfills the gaps, then the groups union.
        groups: dict[tuple, list[str]] = {}
        for f in plain_files:
            names = set(pq.read_schema(f).names)
            rc = (
                tuple(physical_columns(names, read_cols, renames))
                if read_cols is not None
                else None
            )
            nmap = (
                tuple(
                    (c, next((a for a in _alias_names(c, renames) if a in names), c))
                    for c in pcols
                )
                if pred_aliased
                else ()
            )
            groups.setdefault((rc, nmap), []).append(f)
        for (rc, nmap), fl in groups.items():
            gkw = (
                {"filter": _predicate_expr(predicate, dict(nmap))}
                if pred_aliased and predicate
                else fkw
            )
            streams.append(
                rd.read_parquet(
                    fl, columns=list(rc) if rc else None, **gkw
                ).map_batches(_conform, batch_format="pyarrow")
            )
    if chain_parts:
        # one resolver task per delta-bearing partition: read the chain
        # (pruned to the requested columns + the resolution internals),
        # LWW-resolve, filter exactly, conform to the plain path's shape
        pred_cols = [c for c, _o, _v in (predicate or [])]
        resolve_names = (
            None
            if read_cols is None
            else list(
                dict.fromkeys(
                    read_cols + [key, LSN_COL, TOMBSTONE_COL] + pred_cols
                )
            )
        )
        resolve_schema = pa.schema(
            [
                f
                for f in manifest.schema
                if resolve_names is None or f.name in resolve_names
            ]
        )
        chains = {p: manifest.chain(lake_root, p) for p in chain_parts}
        pred = list(predicate) if predicate else None

        def _resolve_part(batch: pa.Table):
            limit_kernel_threads()
            yielded = False
            for p in batch["part"].to_pylist():
                files = chains[p]
                base_rows = pq.ParquetFile(files[0]).metadata.num_rows
                if base_rows > RESOLVE_STREAM_THRESHOLD_ROWS:
                    # larger-than-memory base: stream it (reader-side
                    # analogue of _merge_streaming); deltas stay small
                    # by the compaction contract. Column pruning note:
                    # the streaming path reads the base unpruned via
                    # iter_batches, so prune after; acceptable because
                    # this path exists for memory, not I/O, bounds.
                    chunks = _resolve_chain_stream(
                        files, key, resolve_schema, renames=renames
                    )
                else:
                    chunks = [
                        _resolve_chain(
                            _read_chain(
                                files, columns=resolve_names, renames=renames
                            ),
                            key,
                            resolve_schema,
                        )
                    ]
                for r in chunks:
                    if pred:
                        r = _filter_predicate(r, pred)
                    out = _conform(r)
                    if out.num_rows:
                        yielded = True
                        yield out
            if not yielded:
                yield _conform(resolve_schema.empty_table())

        ids = rd.from_arrow(
            pa.table({"part": pa.array(chain_parts, pa.int32())})
        ).repartition(len(chain_parts))
        streams.append(
            ids.map_batches(_resolve_part, batch_format="pyarrow", batch_size=None)
        )
    if not streams:
        base = pa.schema([f for f in schema if columns is None or f.name in columns])
        if user_columns_only:
            base = pa.schema(
                [f for f in base if f.name not in (LSN_COL, TOMBSTONE_COL)]
            )
        return rd.from_arrow(base.empty_table())
    return streams[0].union(*streams[1:]) if len(streams) > 1 else streams[0]


def lake_count(
    lake_root: str,
    *,
    predicate: list[tuple] | None = None,
    version: int | None = None,
) -> int:
    """Exact live-row count of a committed lake version.

    Without a predicate this is PURE METADATA — the manifest's
    per-partition ``rows`` counters (which track the EFFECTIVE resolved
    state through rewrite applies, delta chains, DML, and compaction —
    fsck's deep mode validates them against the data) sum in O(P) with
    zero parquet I/O. ``SELECT COUNT(*)`` over a 100-TB lake answers
    from one JSON file. With a predicate it falls back to a
    zone-map-pruned counting scan reading ONLY the predicate columns.
    """
    if version is not None:
        from palimpzest_ray.cdc.manifest import load_manifest

        manifest = load_manifest(lake_root, version)
    else:
        manifest = load_latest_manifest(lake_root)
    if manifest is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    if not predicate:
        return sum(e.rows for e in manifest.parts.values())
    cols = list(dict.fromkeys(c for c, _o, _v in predicate))
    ds = final_state(
        lake_root, version=version, predicate=predicate, columns=cols
    )
    return ds.count()


def lake_minmax(
    lake_root: str,
    columns: list[str] | str,
    *,
    version: int | None = None,
) -> dict:
    """Exact per-column ``[min, max]`` over the lake's LIVE rows,
    answered from manifest zone maps wherever that is provably exact.

    A partition's zone map equals its live-row range exactly when the
    partition is chain-free AND tombstone-free (stats are computed over
    the merged partition at write time; a tombstone keeps its key — and
    whatever payload the DELETE event carried — so its presence makes
    the stats a bound, not the answer; a delta chain can shadow the
    base's extremes). Those partitions contribute in O(1) metadata.
    Every other partition falls back to a pruned chain resolve reading
    only the requested columns — so right after compaction with
    tombstone retention passed, the whole answer is metadata, and a
    delta-heavy lake still returns the exact value. All-null columns
    report ``[None, None]``.
    """
    from palimpzest_ray.cdc.pjoin import _live_partition

    if isinstance(columns, str):
        columns = [columns]
    if version is not None:
        from palimpzest_ray.cdc.manifest import load_manifest

        manifest = load_manifest(lake_root, version)
    else:
        manifest = load_latest_manifest(lake_root)
    if manifest is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    for c in columns:
        idx = manifest.schema.get_field_index(c)
        if idx < 0:
            raise KeyError(f"column {c!r} not in lake schema")
        t = manifest.schema.field(idx).type
        if not (
            pa.types.is_integer(t)
            or pa.types.is_floating(t)
            or pa.types.is_string(t)
            or pa.types.is_large_string(t)
            or pa.types.is_boolean(t)
        ):
            raise TypeError(f"min/max needs a scalar column; {c!r} is {t}")

    out: dict = {c: [None, None] for c in columns}

    def _fold(c, lo, hi):
        cur = out[c]
        cur[0] = lo if cur[0] is None else min(cur[0], lo)
        cur[1] = hi if cur[1] is None else max(cur[1], hi)

    scan_parts: list[int] = []
    for p, e in sorted(manifest.parts.items()):
        clean = not e.deltas and e.tombstones == 0 and e.col_stats is not None
        if e.rows == 0 and e.tombstones == 0 and not e.deltas:
            continue
        if clean and all(
            c in e.col_stats or e.rows == 0 for c in columns
        ):
            # a clean partition missing a column's stats means that
            # column is all-null there — contributes nothing
            for c in columns:
                if c in e.col_stats:
                    _fold(c, *e.col_stats[c])
        else:
            scan_parts.append(p)
    for p in scan_parts:
        t = _live_partition(
            lake_root,
            manifest.chain(lake_root, p),
            manifest.key,
            manifest.schema,
            columns,
            manifest.renames,
        )
        for c in columns:
            col = t[c]
            if len(col) == 0 or col.null_count == len(col):
                continue
            mm = pc.min_max(col)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            if lo is not None:
                _fold(c, lo, hi)
    return {c: tuple(v) for c, v in out.items()}


def net_changes_between(
    lake_root: str, from_version: int, to_version: int
) -> rd.Dataset:
    """Net changes between two COMMITTED versions — the
    version-bounded form of :func:`net_changes_since`: the
    ``to_version`` state's rows with ``from_version.max_lsn < _lsn``
    (tombstones as DELETEs). Applying it to a replica of
    ``from_version`` converges it to ``to_version`` even while the
    source lake has already moved past — what a consistent-cut
    consumer (catalog subscriptions) replays. ``from_version=0`` is
    the EMPTY-lake baseline: the feed is the full ``to_version`` state
    as upserts — how a table that joined a catalog after a consumer
    subscribed bootstraps through the same poll path."""
    from palimpzest_ray.cdc.manifest import load_manifest

    if to_version < from_version:
        raise ValueError(
            f"to_version {to_version} precedes from_version {from_version}"
        )
    if from_version == 0:
        watermark = -(1 << 63)  # below any lsn: everything is new
        predicate = None
    else:
        watermark = load_manifest(lake_root, from_version).max_lsn
        predicate = [(LSN_COL, ">", int(watermark))]
    raw = final_state(
        lake_root,
        user_columns_only=False,
        include_tombstones=True,
        version=to_version,
        predicate=predicate,
    )
    return raw.map_batches(
        _feed_factory(watermark), batch_format="pyarrow"
    )


def _feed_factory(watermark: int):
    def _feed(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.greater(batch[LSN_COL], pa.scalar(watermark, pa.int64()))
        )
        dead = pc.coalesce(batch[TOMBSTONE_COL], pa.scalar(False))
        op = pc.if_else(dead, pa.scalar("DELETE"), pa.scalar("UPDATE"))
        return pa.table(
            {
                "lsn": batch[LSN_COL].cast(pa.int64()),
                "op": op,
                **{
                    c: batch[c]
                    for c in batch.column_names
                    if c not in (LSN_COL, TOMBSTONE_COL)
                },
            }
        )

    return _feed


def net_changes_since(lake_root: str, version: int) -> rd.Dataset:
    """Change feed: the NET changes between committed ``version`` and
    the latest version, as a change-log-shaped Dataset (``lsn``, ``op``
    ∈ {UPDATE, DELETE} — UPDATE has upsert semantics engine-wide, so the
    feed is directly re-appliable via ``apply_changes``) — what a
    downstream consumer replays to catch up. Pure metadata + filter: every lake row
    carries its writer's ``_lsn``, so "changed since v" is exactly the
    latest rows with ``_lsn > v.max_lsn`` (tombstones become DELETEs).
    Intermediate overwritten states are not reconstructed — this is the
    net diff, the same contract as Delta/Iceberg CDF for compacted
    history. Applying the feed to a replica of ``version`` converges it
    to the latest state."""
    from palimpzest_ray.cdc.manifest import load_manifest

    watermark = load_manifest(lake_root, version).max_lsn
    # the _lsn predicate prunes UNCHANGED partitions at the manifest
    # (entry max_lsn ≤ watermark → no row can qualify), then unchanged
    # files/row groups at the parquet footers, then exact rows in the
    # scan — a catch-up on a 100-TB lake reads only what moved
    raw = final_state(
        lake_root,
        user_columns_only=False,
        include_tombstones=True,
        predicate=[(LSN_COL, ">", int(watermark))],
    )
    return raw.map_batches(
        _feed_factory(watermark), batch_format="pyarrow"
    )


def final_state_table(
    lake_root: str,
    *,
    user_columns_only: bool = True,
    version: int | None = None,
    as_of: float | None = None,
    tag: str | None = None,
) -> pa.Table:
    """Materialized, canonically sorted final state (tests / small lakes
    only — the streaming path is :func:`final_state`). ``version=`` time
    travel includes staged (unpublished write-audit-publish) versions —
    the audit read. ``as_of=`` is TIMESTAMP AS OF (epoch seconds)."""
    from palimpzest_ray.cdc.manifest import load_manifest

    if tag is not None:
        if version is not None or as_of is not None:
            raise ValueError("pass exactly one of version=/as_of=/tag=")
        from palimpzest_ray.cdc.manifest import resolve_tag

        version = resolve_tag(lake_root, tag)
    if as_of is not None:
        if version is not None:
            raise ValueError("pass version= or as_of=, not both")
        from palimpzest_ray.cdc.manifest import version_as_of

        version = version_as_of(lake_root, as_of)
    manifest = (
        load_manifest(lake_root, version)
        if version is not None
        else load_latest_manifest(lake_root)
    )
    if manifest is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    tables = [
        _resolve_chain(
            _read_chain(manifest.chain(lake_root, p), renames=manifest.renames),
            manifest.key,
            manifest.schema,
        )
        for p in sorted(manifest.parts)
    ]
    t = pa.concat_tables(tables) if tables else manifest.schema.empty_table()
    if TOMBSTONE_COL in t.column_names:
        t = t.filter(pc.invert(pc.coalesce(t[TOMBSTONE_COL], pa.scalar(False))))
    if user_columns_only:
        t = drop_internal(t)
    return t.sort_by(manifest.key)


def lookup(
    lake_root: str,
    keys: list,
    *,
    key: str = "doc_id",
    version: int | None = None,
    columns: list[str] | None = None,
    keep_lsn: bool = False,
) -> pa.Table:
    """Point/key-set read from the lake WITHOUT scanning it: the lake is
    hash-partitioned on ``key`` (``stable_bucket(key) % P``), so a
    lookup reads at most ``len(keys)`` partition files out of P —
    O(total/P) bytes per key — then filters exactly. The serving-side
    complement to :func:`apply_changes` (a consumer fetching specific
    documents from a 100-TB lake must not pay a table scan).

    Tombstoned keys return no row (they are deleted). ``columns`` prunes
    each file's read to the named user columns; evolved columns missing
    from carried-forward files are null-backfilled. Deterministic: same
    keys, same version → same table (sorted by ``key``).

    ``keep_lsn=True`` keeps the internal ``_lsn`` column (each live
    row's writer LSN) — what :func:`key_history` uses to collapse
    carried-forward versions."""
    import pyarrow.parquet as pq_

    from palimpzest_ray.cdc.manifest import load_manifest
    from palimpzest_ray.functions.tokens import stable_bucket

    if version is not None:
        manifest = load_manifest(lake_root, version)
    else:
        manifest = load_latest_manifest(lake_root)
    if manifest is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    if manifest.key_cols and keys and isinstance(keys[0], (tuple, list)):
        # composite-key lake: accept key TUPLES, encode to the lake's
        # synthesized key strings (cdc.keys) and look those up
        from palimpzest_ray.cdc.keys import encode_key_tuples

        keys = encode_key_tuples(keys)
        key = manifest.key
    karr = pa.array(keys)
    schema = manifest.schema
    if columns is not None:
        want = list(dict.fromkeys([key] + list(columns)))
        schema = pa.schema([f for f in schema if f.name in want])
    out_schema = pa.schema(
        [f for f in schema if f.name not in (LSN_COL, TOMBSTONE_COL)]
        + ([pa.field(LSN_COL, pa.int64())] if keep_lsn else [])
    )
    need = (
        None
        if columns is None
        else list(dict.fromkeys([key] + list(columns) + [LSN_COL, TOMBSTONE_COL]))
    )
    resolve_schema = pa.schema(
        [f for f in manifest.schema if need is None or f.name in need]
    )
    out: list[pa.Table] = []
    # sidecar Blooms index the lake's ROUTING column — consult them only
    # when that's the column being probed (e.g. the token index lake is
    # keyed on posting_id but partitioned/probed by token; its sidecars
    # hold token hashes, so a posting_id probe must ignore them)
    use_bloom = key == (manifest.partition_key or manifest.key)
    route_col = manifest.partition_key or manifest.key
    if key == route_col:
        buckets = stable_bucket(karr, manifest.num_partitions)
    elif key == manifest.key and manifest.partition_key:
        # hidden partitioning: the routing column is a STORED generated
        # transform of the key, so a key probe re-derives its partition
        # value driver-side and keeps O(keys) pruning; without such a
        # transform the probe must consider every partition (correct,
        # just unpruned — pass the partition column's values instead)
        gexpr = (manifest.generated or {}).get(manifest.partition_key)
        from palimpzest_ray.cdc.expr import eval_expr, expr_columns

        if gexpr is not None and expr_columns(gexpr) <= {manifest.key}:
            pvals = eval_expr(pa.table({manifest.key: karr}), gexpr)
            buckets = stable_bucket(pvals, manifest.num_partitions)
        else:
            buckets = None
    else:
        buckets = None  # probing a non-routing column: no pruning
    part_ids = (
        sorted(manifest.parts) if buckets is None else np.unique(buckets)
    )
    for p in part_ids:
        entry = manifest.parts.get(int(p))
        if entry is None:
            continue
        routed = (  # keys this chain could hold
            karr if buckets is None else karr.filter(pa.array(buckets == p))
        )
        tabs = []
        for path in manifest.chain(lake_root, int(p)):
            # key-Bloom sidecar: skip a chain file that PROVABLY holds
            # none of the routed keys — an absent-key probe then opens
            # zero parquet files for this partition (the sidecar is KBs;
            # the chain is MBs). Missing sidecar = read as before.
            blob = load_bloom(path) if use_bloom else None
            if blob is not None and not bloom_might_contain(blob, routed).any():
                continue
            rc = None
            if need is not None:
                present = set(pq_.read_schema(path).names)
                rc = physical_columns(present, need, manifest.renames)
            # predicate pushdown on the key: base files are key-sorted
            # (merge contract), so row-group min/max stats prune most of
            # the file for point probes; the exact filter still runs.
            # (The key column is never renamable, so the filter's name
            # is valid in every chain file.)
            t = rename_to_logical(
                pq_.read_table(
                    path, columns=rc, filters=pc.field(key).isin(routed)
                ),
                manifest.renames,
            )
            tabs.append(t.filter(pc.is_in(t[key], value_set=karr)))
        if not tabs:
            continue
        # LWW-resolve ACROSS the chain before dropping tombstones — a
        # delta tombstone must kill its base row, and a delta upsert
        # must shadow it, neither of which a per-file filter can do
        r = _resolve_chain(tabs, key, resolve_schema)
        if TOMBSTONE_COL in r.column_names:
            r = r.filter(pc.invert(pc.coalesce(r[TOMBSTONE_COL], pa.scalar(False))))
        out.append(conform(r, out_schema))
    if not out:
        return out_schema.empty_table()
    return pa.concat_tables(out, promote_options="default").sort_by(key)


def contains_keys(
    lake_root: str,
    keys: list,
    *,
    key: str = "doc_id",
    version: int | None = None,
) -> pa.Table:
    """Vectorized key-existence probe: ``(key, exists)`` for every input
    key, deduplicated and sorted. ``exists`` is live presence — a
    tombstoned (deleted) key reads False, exactly like :func:`lookup`
    returning no row.

    This is the anti-join screen a 100-TB ingest pipeline runs before
    admitting a candidate batch ("which of these doc_ids are already in
    the corpus?"). Cost shape: hash routing bounds the probe to one
    partition chain per key, and the per-file key-Bloom sidecars
    (:mod:`palimpzest_ray.cdc.bloom`) prove absence without opening the
    file — so the common screening case (mostly-new keys) reads KBs of
    sidecar instead of MBs of chain, and the residue that must be
    confirmed reads only the key + tombstone columns under a pushed-down
    key filter. The reference has no lake machinery; its closest probe
    is re-running a filter over the full source (``FilteredScan``).
    """
    karr = pc.unique(pa.array(keys).drop_null())
    found = lookup(lake_root, karr.to_pylist(), key=key, version=version,
                   columns=[])
    exists = pc.is_in(karr, value_set=found[key])
    t = pa.table({key: karr, "exists": exists})
    return t.sort_by(key)
