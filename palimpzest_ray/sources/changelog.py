"""Change-log sources beyond Parquet.

Real binlog/WAL tails are frequently JSON lines (Debezium, Maxwell,
DynamoDB streams). ``read_jsonl_changes`` turns a JSONL directory into
the same normalized change Dataset ``apply_changes`` consumes —
``ray.data.read_json`` streams the files, a vectorized ``conform``
casts every block onto the declared change schema (JSON integers
arrive as int64; token arrays become ``list<int32>``), so the CDC
engine sees identical input regardless of wire format.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from palimpzest_ray.schemas import CHANGELOG_SCHEMA, conform


def read_jsonl_changes(
    paths: str | list[str],
    schema: pa.Schema = CHANGELOG_SCHEMA,
) -> rd.Dataset:
    """Stream a JSONL change log as a conformed Dataset.

    Pass the result to ``apply_changes(ds, ..., change_schema=schema)``
    — supplying the schema explicitly matters for mixed-epoch logs
    (``ds.schema()`` reflects only the first block)."""

    def _conform(batch: pa.Table) -> pa.Table:
        return conform(batch, schema)

    return rd.read_json(paths).map_batches(_conform, batch_format="pyarrow")


# --- Debezium-style envelopes -------------------------------------------
# The de-facto wire format for database CDC: one JSON object per change
# with ``op`` ∈ {c(reate), u(pdate), d(elete), r(ead/snapshot)}, the row
# image under ``after`` (``before`` for deletes), and the log position
# under ``source.lsn``. ``read_debezium_changes`` unwraps that envelope
# into the engine's normalized change schema entirely with Arrow
# struct-field kernels — no Python-per-row parsing — so a Debezium
# topic dump applies exactly like a native parquet log.

_DBZ_CODES = ("c", "u", "d", "r")
_DBZ_TO_OP = ("INSERT", "UPDATE", "DELETE", "INSERT")


def _struct_col(
    batch: pa.Table, col: str, name: str, n: int
) -> pa.ChunkedArray | pa.Array:
    """``batch[col].{name}`` as an array, or typed-null when the column
    or field is absent / inferred as null (e.g. a file of only deletes
    infers ``after`` as null type)."""
    if col not in batch.column_names:
        return pa.nulls(n)
    arr = batch.column(col)
    if pa.types.is_null(arr.type):
        return pa.nulls(n)
    if not pa.types.is_struct(arr.type) or arr.type.get_field_index(name) < 0:
        return pa.nulls(n)
    return pc.struct_field(arr.combine_chunks(), name)


def _coalesce_nullsafe(a, b):
    """``coalesce`` that tolerates untyped-null operands."""
    if pa.types.is_null(a.type):
        return b
    if pa.types.is_null(b.type):
        return a
    return pc.coalesce(a, b.cast(a.type))


def unwrap_debezium(batch: pa.Table, schema: pa.Schema = CHANGELOG_SCHEMA,
                    key: str = "doc_id") -> pa.Table:
    """One envelope batch → normalized change rows (vectorized).

    Accepts both flat envelopes and Kafka-Connect ``{"payload": {...}}``
    wrapping. ``lsn`` comes from ``source.lsn`` (falling back to a
    top-level ``lsn``); the key column coalesces ``after.key`` with
    ``before.key`` so delete events (null ``after``) keep their key;
    every other payload column reads from ``after`` — null for deletes,
    which is exactly the engine's tombstone convention.
    """
    if "payload" in batch.column_names and pa.types.is_struct(
        batch.column("payload").type
    ):
        env = batch.column("payload").combine_chunks()
        batch = pa.Table.from_arrays(
            [pc.struct_field(env, f.name) for f in env.type],
            names=[f.name for f in env.type],
        )
    n = batch.num_rows
    if "op" not in batch.column_names:
        if n == 0:  # over-provisioned read task emitted an empty block
            return conform(batch.select([]), schema)
        raise ValueError("not a Debezium envelope: no 'op' column")
    codes = pc.utf8_lower(batch.column("op").cast(pa.string()))
    idx = pc.index_in(codes, value_set=pa.array(_DBZ_CODES))
    if n and pc.any(pc.is_null(idx)).as_py():
        bad = pc.filter(codes, pc.is_null(idx)).unique().to_pylist()
        raise ValueError(f"unknown Debezium op codes: {bad}")
    ops = pc.take(pa.array(_DBZ_TO_OP), idx)

    lsn = _struct_col(batch, "source", "lsn", n)
    if pa.types.is_null(lsn.type) and "lsn" in batch.column_names:
        lsn = batch.column("lsn")

    cols: dict[str, object] = {"lsn": lsn, "op": ops}
    for field in schema:
        if field.name in ("lsn", "op"):
            continue
        val = _struct_col(batch, "after", field.name, n)
        if field.name == key:
            val = _coalesce_nullsafe(val, _struct_col(batch, "before", key, n))
        cols[field.name] = val
    return conform(pa.table(cols), schema)


def read_debezium_changes(
    paths: str | list[str],
    schema: pa.Schema = CHANGELOG_SCHEMA,
    key: str = "doc_id",
) -> rd.Dataset:
    """Stream a Debezium JSONL topic dump as a conformed change Dataset
    ready for ``apply_changes(ds, ..., change_schema=schema)``."""

    def _unwrap(batch: pa.Table) -> pa.Table:
        return unwrap_debezium(batch, schema, key=key)

    return rd.read_json(paths).map_batches(_unwrap, batch_format="pyarrow")


def write_debezium_jsonl(
    changes: pa.Table,
    out_dir: str,
    *,
    key: str = "doc_id",
    lines_per_file: int = 100_000,
    connector: str = "synthetic",
) -> list[str]:
    """Render a normalized change table as Debezium JSONL files —
    the test/demo fixture encoder (driver-side, not a hot path; the
    scale path is parquet logs). Deterministic: ``ts_ms`` mirrors the
    lsn. Returns the file paths written."""
    os.makedirs(out_dir, exist_ok=True)
    op_to_code = {"INSERT": "c", "UPDATE": "u", "DELETE": "d"}
    payload_cols = [c for c in changes.column_names if c not in ("lsn", "op")]
    paths: list[str] = []
    rows = changes.to_pylist()
    for fi in range(0, max(len(rows), 1), lines_per_file):
        path = os.path.join(out_dir, f"topic-{fi // lines_per_file:05d}.jsonl")
        with open(path, "w") as f:
            for r in rows[fi : fi + lines_per_file]:
                code = op_to_code[r["op"]]
                row_img = {c: r[c] for c in payload_cols}
                env = {
                    "payload": {
                        "op": code,
                        "before": {key: r[key]} if code == "d" else None,
                        "after": None if code == "d" else row_img,
                        "source": {"lsn": r["lsn"], "connector": connector},
                        "ts_ms": r["lsn"],
                    }
                }
                f.write(json.dumps(env, separators=(",", ":")) + "\n")
        paths.append(path)
    return paths


def export_changes(
    lake_root: str,
    since_version: int,
    out_dir: str,
    *,
    format: str = "debezium",
    key: str = "doc_id",
    connector: str = "palimpzest_ray",
) -> dict:
    """The ingest symmetry: publish the lake's NET change feed since a
    committed version as JSONL topic files a non-engine consumer can
    tail — ``format="debezium"`` renders the standard envelope
    (``read_debezium_changes`` round-trips it), ``"jsonl"`` flat change
    rows. One file per feed block (tmp+rename, re-export converges),
    ``_CHANGES.json`` provenance written last. The feed itself is the
    engine's ``net_changes_since`` (manifest-level pruning of unchanged
    partitions), so exporting a small catch-up from a huge lake costs
    O(changes)."""
    import uuid

    from palimpzest_ray.cdc.engine import net_changes_since
    from palimpzest_ray.cdc.manifest import _atomic_write, load_latest_manifest

    if format not in ("debezium", "jsonl"):
        raise ValueError("format must be debezium|jsonl")
    latest = load_latest_manifest(lake_root)
    os.makedirs(out_dir, exist_ok=True)
    feed = net_changes_since(lake_root, since_version)

    def _write(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"file": pa.array([], pa.string()),
                             "events": pa.array([], pa.int64())})
        op_to_code = {"INSERT": "c", "UPDATE": "u", "DELETE": "d"}
        payload_cols = [
            c for c in batch.column_names if c not in ("lsn", "op")
        ]
        name = f"changes-{uuid.uuid4().hex[:12]}.jsonl"
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        with open(tmp, "w") as f:
            for r in batch.to_pylist():
                if format == "jsonl":
                    f.write(json.dumps(r, separators=(",", ":")) + "\n")
                    continue
                code = op_to_code[r["op"]]
                env = {
                    "payload": {
                        "op": code,
                        "before": {key: r[key]} if code == "d" else None,
                        "after": (
                            None if code == "d"
                            else {c: r[c] for c in payload_cols}
                        ),
                        "source": {"lsn": r["lsn"], "connector": connector},
                        "ts_ms": r["lsn"],
                    }
                }
                f.write(json.dumps(env, separators=(",", ":")) + "\n")
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"file": pa.array([name]),
                         "events": pa.array([batch.num_rows], pa.int64())})

    parts = list(
        feed.map_batches(_write, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    lineage = (
        pa.concat_tables(parts) if parts
        else pa.table({"file": pa.array([], pa.string()),
                       "events": pa.array([], pa.int64())})
    )
    meta = {
        "source_lake": os.path.abspath(lake_root),
        "since_version": since_version,
        "to_version": latest.version,
        "format": format,
        "events": int(pc.sum(lineage["events"]).as_py() or 0),
        "files": sorted(lineage["file"].to_pylist()),
    }
    _atomic_write(os.path.join(out_dir, "_CHANGES.json"),
                  json.dumps(meta, indent=1))
    return meta


def read_exported_changes(out_dir: str, schema: pa.Schema = CHANGELOG_SCHEMA,
                          key: str = "doc_id") -> rd.Dataset:
    """Consume an :func:`export_changes` directory: the provenance file
    names the data files and format, so the reader never confuses
    ``_CHANGES.json`` for a topic file."""
    with open(os.path.join(out_dir, "_CHANGES.json")) as f:
        meta = json.load(f)
    paths = [os.path.join(out_dir, n) for n in meta["files"]]
    if not paths:
        return rd.from_arrow(schema.empty_table())
    if meta["format"] == "debezium":
        return read_debezium_changes(paths, schema, key=key)
    return read_jsonl_changes(paths, schema)


# --- Maxwell (Zendesk maxwell-daemon) wire format ----------------------

_MAXWELL_TO_OP = {
    "insert": "INSERT",
    "bootstrap-insert": "INSERT",
    "update": "UPDATE",
    "delete": "DELETE",
}


def unwrap_maxwell(
    batch: pa.Table,
    schema: pa.Schema = CHANGELOG_SCHEMA,
    key: str = "doc_id",
    lsn_base: int = 0,
    row_index=None,
) -> pa.Table:
    """One Maxwell JSON batch → normalized change rows (vectorized).

    Maxwell envelopes (``{"type": "insert|update|delete", "ts", "xid",
    "data": {row image}, "old": {prior values}}`` — public format docs:
    maxwells-daemon.io/dataformat) carry no log sequence number, only a
    commit id. LSN synthesis: an explicit ``position``/``lsn`` field
    wins when present; otherwise ``xid * 2^20 + row-index-within-this-
    read`` (``lsn_base`` offsets the index across chunked reads;
    callers that batch arbitrarily pass the true global file-order
    index per row via ``row_index`` instead — :func:`read_maxwell_changes`
    does, because Ray splits a feed into ~1024-row batches and a
    per-batch ``arange`` restarting at 0 would let two events of one
    transaction that straddle a batch boundary collide or invert) —
    monotone in commit order, distinct per event, deterministic for a
    given topic dump. Why this is safe at any size: Maxwell writes
    events in commit order, so ``xid`` is non-decreasing in file order
    and the row index is strictly increasing — the synthesized lsn is
    then STRICTLY monotone for the whole feed (each step adds at least
    1; an xid step adds ≥2^20 more), with no overflow cliff even for
    transactions beyond 2^20 events. The 2^20 stride exists for the
    OTHER caller: chunked reads that unwrap independently with unknown
    bases stay globally ordered because xid dominates the index. ``data`` is the row image for every type —
    Maxwell deletes ship the deleted row — so the key always reads
    from ``data.key`` and non-key payload columns null out on deletes
    (the engine's tombstone convention)."""
    n = batch.num_rows
    if "type" not in batch.column_names:
        if n == 0:
            return conform(batch.select([]), schema)
        raise ValueError("not a Maxwell envelope: no 'type' column")
    codes = pc.utf8_lower(batch.column("type").cast(pa.string()))
    types = list(_MAXWELL_TO_OP)
    idx = pc.index_in(codes, value_set=pa.array(types))
    if n and pc.any(pc.is_null(idx)).as_py():
        bad = pc.filter(codes, pc.is_null(idx)).unique().to_pylist()
        raise ValueError(f"unknown Maxwell types: {bad}")
    ops = pc.take(pa.array([_MAXWELL_TO_OP[t] for t in types]), idx)

    lsn = None
    for cand in ("position", "lsn"):
        if cand in batch.column_names:
            lsn = batch.column(cand).cast(pa.int64())
            break
    if lsn is None:
        if "xid" not in batch.column_names:
            raise ValueError(
                "Maxwell envelope carries neither position/lsn nor xid — "
                "no deterministic ordering is derivable"
            )
        import numpy as np

        xid = batch.column("xid").cast(pa.int64())
        if row_index is not None:
            idx_in = pa.array(
                np.asarray(row_index, dtype=np.int64) + lsn_base
            )
        else:
            idx_in = pa.array(
                np.arange(lsn_base, lsn_base + n, dtype=np.int64)
            )
        lsn = pc.add(
            pc.multiply(xid, pa.scalar(1 << 20, pa.int64())), idx_in
        )

    is_del = pc.equal(ops, pa.scalar("DELETE"))
    cols: dict[str, object] = {"lsn": lsn, "op": ops}
    for field in schema:
        if field.name in ("lsn", "op"):
            continue
        val = _struct_col(batch, "data", field.name, n)
        if field.name != key and n:
            # deletes carry the full prior image; the engine's
            # tombstone convention is a null payload
            val = pc.if_else(
                is_del,
                pa.nulls(n, val.type if not pa.types.is_null(val.type)
                         else field.type),
                val,
            )
        cols[field.name] = val
    return conform(pa.table(cols), schema)


def _expand_jsonl_paths(paths: str | list[str]) -> list[str]:
    """Directories → their files (sorted: Maxwell rolls files in name
    order, so sorted names ARE commit order), files pass through."""
    out: list[str] = []
    for p in [paths] if isinstance(paths, str) else paths:
        if os.path.isdir(p):
            out.extend(
                os.path.join(p, n)
                for n in sorted(os.listdir(p))
                if not n.startswith("_") and not n.startswith(".")
            )
        else:
            out.append(p)
    return out


def _maxwell_has_position(paths: list[str]) -> bool:
    """Peek the first envelope: does this dump carry an explicit
    ``position``/``lsn``?  All-or-nothing per dump (a feed that mixes
    positioned and position-less envelopes has no coherent order)."""
    for p in paths:
        with open(p, "rb") as f:
            for line in f:
                line = line.strip()
                if line:
                    env = json.loads(line)
                    return "position" in env or "lsn" in env
    return True  # empty dump: fast path handles it


def read_maxwell_changes(
    paths: str | list[str],
    schema: pa.Schema = CHANGELOG_SCHEMA,
    key: str = "doc_id",
) -> rd.Dataset:
    """Stream a Maxwell JSONL topic dump as a conformed change Dataset
    (the third wire format next to plain JSONL and Debezium).

    When envelopes carry ``position``/``lsn``, this is a plain
    vectorized ``read_json`` → unwrap per batch.  When they do NOT
    (stock Maxwell has only ``xid``), the synthesized LSN needs the
    GLOBAL file-order row index — Ray hands ``map_batches`` ~1024-row
    slices, and a per-batch index restarting at 0 lets two events of
    one transaction that straddle a batch boundary collide or invert,
    so LWW could keep a stale image.  The position-less path therefore
    parses one file per task tagging ``(_file_seq, _row_in_file)``,
    cumsums per-file row counts on the driver (one int per file — the
    same bounded-driver-state shape as stages/packing.py's prefix sum),
    and feeds the exact global index into :func:`unwrap_maxwell` via
    ``row_index``.  The parsed feed is pinned once (materialize) so
    files parse exactly once; only this degenerate wire format pays
    that, and it spills to the object store rather than the driver."""
    flat = _expand_jsonl_paths(paths)
    if not flat:
        return rd.from_arrow(schema.empty_table())

    if _maxwell_has_position(flat):
        def _unwrap(batch: pa.Table) -> pa.Table:
            return unwrap_maxwell(batch, schema, key=key)

        return rd.read_json(flat).map_batches(_unwrap, batch_format="pyarrow")

    import numpy as np
    import pyarrow.json as pj

    items = [{"_file_seq": i, "_path": p} for i, p in enumerate(flat)]

    def _parse(batch: pa.Table) -> pa.Table:
        tabs = []
        for seq, path in zip(
            batch["_file_seq"].to_pylist(), batch["_path"].to_pylist()
        ):
            if os.path.getsize(path) == 0:
                continue
            t = pj.read_json(path)
            n = t.num_rows
            t = t.append_column(
                "_file_seq", pa.array(np.full(n, seq, dtype=np.int64))
            )
            t = t.append_column(
                "_row_in_file", pa.array(np.arange(n, dtype=np.int64))
            )
            tabs.append(t)
        if not tabs:
            return pa.table({"_file_seq": pa.array([], pa.int64()),
                             "_row_in_file": pa.array([], pa.int64())})
        return pa.concat_tables(tabs, promote_options="permissive")

    raw = rd.from_items(items).map_batches(
        _parse, batch_size=1, batch_format="pyarrow"
    ).materialize()
    counts = np.zeros(len(flat), dtype=np.int64)
    for r in raw.groupby("_file_seq").count().take_all():
        counts[r["_file_seq"]] = r["count()"]
    bases = np.zeros(len(flat), dtype=np.int64)
    np.cumsum(counts[:-1], out=bases[1:])

    def _unwrap_global(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return conform(batch.select([]), schema)
        seq = batch["_file_seq"].to_numpy(zero_copy_only=False)
        rif = batch["_row_in_file"].to_numpy(zero_copy_only=False)
        gidx = bases[seq] + rif
        body = batch.drop_columns(["_file_seq", "_row_in_file"])
        return unwrap_maxwell(body, schema, key=key, row_index=gidx)

    return raw.map_batches(_unwrap_global, batch_format="pyarrow")


def write_maxwell_jsonl(
    changes: pa.Table,
    out_dir: str,
    *,
    key: str = "doc_id",
    lines_per_file: int = 100_000,
    database: str = "synthetic",
    table: str = "docs",
) -> list[str]:
    """Render a normalized change table as Maxwell JSONL files — the
    test/demo fixture encoder (driver-side). ``position`` mirrors the
    lsn so the round trip is exact."""
    os.makedirs(out_dir, exist_ok=True)
    op_to_type = {"INSERT": "insert", "UPDATE": "update", "DELETE": "delete"}
    payload_cols = [c for c in changes.column_names if c not in ("lsn", "op")]
    paths: list[str] = []
    rows = changes.to_pylist()
    for fi in range(0, max(len(rows), 1), lines_per_file):
        path = os.path.join(out_dir, f"maxwell-{fi // lines_per_file:05d}.jsonl")
        with open(path, "w") as f:
            for r in rows[fi : fi + lines_per_file]:
                env = {
                    "database": database,
                    "table": table,
                    "type": op_to_type[r["op"]],
                    "ts": r["lsn"],
                    "xid": r["lsn"],
                    "position": r["lsn"],
                    "data": {c: r[c] for c in payload_cols},
                }
                f.write(json.dumps(env) + "\n")
        paths.append(path)
    return paths
