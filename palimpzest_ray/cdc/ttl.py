"""Row TTL: a stored expiry policy the maintenance loop enforces.

The ClickHouse ``TTL ts + INTERVAL n`` idea in this lake's terms: the
policy — "rows whose ``col`` is older than ``keep_seconds`` expire" —
is DECLARED once and stored with the lake (``_policy/ttl.json``, one
tiny JSON; operational config, not data semantics, so it is not a
versioned commit), and ``apply_ttl`` enforces it as an ordinary
``delete_where`` — a zone-map-pruned scan of ONLY the TTL column plus
one exactly-once DELETE commit, inheriting LWW idempotence, time
travel (the pre-expiry version still shows the rows until vacuum) and
merge-on-read staging. Hook ``apply_ttl`` into ``tail_follow``'s
``on_commit`` (or a scheduler) and expiry runs continuously; a no-op
enforcement (nothing expired) commits nothing.

``now=`` pins the clock for deterministic tests/oracles; production
callers omit it. Expiry compares against the column's own timeline, so
a replayed old log segment cannot "resurrect" expired rows past the
next enforcement — and because expiry is a DELETE, LWW keeps the
tombstone winning over any late event below it."""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa

from palimpzest_ray.cdc.manifest import _atomic_write, load_latest_manifest

__all__ = ["apply_rollup", "apply_ttl", "drop_ttl", "get_ttl", "set_ttl"]


def _ttl_path(lake_root: str) -> str:
    return os.path.join(lake_root, "_policy", "ttl.json")


def set_ttl(lake_root: str, col: str, keep_seconds: float) -> dict:
    """Declare the expiry policy: rows with ``col`` older than
    ``keep_seconds`` (vs enforcement time) expire. ``col`` must be a
    timestamp or numeric column; the LWW key and partition column are
    refused (expiring the identity of a live row is a purge, not a
    TTL)."""
    m = load_latest_manifest(lake_root)
    if m is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    if col not in m.schema.names:
        raise ValueError(f"unknown TTL column {col!r}")
    if col in {m.key, m.partition_key} | set(m.key_cols or ()):
        raise ValueError(f"cannot set TTL on key/partition column {col!r}")
    t = m.schema.field(col).type
    if not (pa.types.is_temporal(t) or pa.types.is_integer(t)
            or pa.types.is_floating(t)):
        raise ValueError(f"TTL column {col!r} must be temporal/numeric, not {t}")
    if keep_seconds <= 0:
        raise ValueError("keep_seconds must be positive")
    pol = {"col": col, "keep_seconds": float(keep_seconds)}
    os.makedirs(os.path.dirname(_ttl_path(lake_root)), exist_ok=True)
    _atomic_write(_ttl_path(lake_root), json.dumps(pol))
    return pol


def get_ttl(lake_root: str) -> dict | None:
    p = _ttl_path(lake_root)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def drop_ttl(lake_root: str) -> None:
    os.unlink(_ttl_path(lake_root))


def apply_ttl(
    lake_root: str, *, now: float | None = None, mode: str = "delta"
):
    """Enforce the stored policy: tombstone every live row whose TTL
    column is older than ``now - keep_seconds``. Returns the
    ``delete_where`` ApplyResult (``rows_deleted == 0`` commits
    nothing). Idempotent per cutoff; each later enforcement uses a
    later cutoff and expires the next slice."""
    from palimpzest_ray.cdc.engine import delete_where

    pol = get_ttl(lake_root)
    if pol is None:
        raise FileNotFoundError(f"no TTL policy under {lake_root} (set_ttl)")
    m = load_latest_manifest(lake_root)
    t = m.schema.field(pol["col"]).type
    ts = time.time() if now is None else float(now)
    cutoff_s = ts - pol["keep_seconds"]
    if pa.types.is_temporal(t):
        # plain-Python datetime: parquet footer stats and pyarrow
        # compute kernels both compare against it directly
        from datetime import datetime, timezone

        cutoff = datetime.fromtimestamp(cutoff_s, tz=timezone.utc)
        if getattr(t, "tz", None) is None:
            cutoff = cutoff.replace(tzinfo=None)
    else:
        cutoff = cutoff_s if pa.types.is_floating(t) else int(cutoff_s)
    return delete_where(
        lake_root, [(pol["col"], "<", cutoff)], mode=mode
    )


def apply_rollup(
    lake_root: str,
    rollup_root: str,
    *,
    ttl_col: str,
    keep_seconds: float,
    group_col: str,
    aggs: dict,
    now: float | None = None,
    num_partitions: int = 8,
    mode: str = "delta",
) -> dict:
    """Downsample-then-expire — the ClickHouse ``TTL ... GROUP BY``
    idea: rows of the source older than ``now - keep_seconds`` are
    AGGREGATED per ``group_col`` into a rollup lake, then deleted from
    the source. Detail stays for the hot window; history survives as
    group aggregates.

    ``aggs``: ``{out_col: (fn, value_col)}`` with fn ∈
    {"count", "sum", "min", "max"} — the MERGEABLE aggregates, because
    successive enforcements must fold into the same rollup rows: the
    rollup lake is an ACCUMULATING lake (``apply_accumulate``) where
    counts/sums arrive as deltas (`sum_cols`) and extremes as
    candidates (`max_cols`/`min_cols`). AVG is deliberately absent —
    store sum + count and divide at read.

    Exactly-once under crashes by composition: the rollup apply is
    stamped with a producer transaction ``("rollup:<dst>", source
    head version)``, so a crash between the rollup commit and the
    source delete re-runs into a watermark no-op before the
    (idempotent) delete proceeds — the slice can never double-count.
    Returns ``{"rows_rolled", "groups", "rows_deleted", "noop"}``."""
    import numpy as np
    import pyarrow.compute as pc

    from palimpzest_ray.cdc.engine import delete_where, final_state
    from palimpzest_ray.cdc.manifest import load_latest_manifest as _llm
    from palimpzest_ray.cdc.patch import apply_accumulate

    for out, (fn, _c) in aggs.items():
        if fn not in ("count", "sum", "min", "max"):
            raise ValueError(
                f"aggregate {fn!r} ({out}) is not mergeable across "
                "enforcements — use count/sum/min/max (store sum+count "
                "for avg)"
            )
    src = _llm(lake_root)
    if src is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    t = src.schema.field(ttl_col).type
    ts = time.time() if now is None else float(now)
    cutoff_s = ts - keep_seconds
    if pa.types.is_temporal(t):
        from datetime import datetime, timezone

        cutoff = datetime.fromtimestamp(cutoff_s, tz=timezone.utc)
        if getattr(t, "tz", None) is None:
            cutoff = cutoff.replace(tzinfo=None)
    else:
        cutoff = cutoff_s if pa.types.is_floating(t) else int(cutoff_s)
    predicate = [(ttl_col, "<", cutoff)]

    need = list(dict.fromkeys(
        [group_col] + [c for _o, (f, c) in aggs.items() if f != "count" and c]
    ))
    stale = final_state(lake_root, columns=need, predicate=predicate)

    # per-group partials for THIS slice (map-side combine, tiny shuffle)
    def _partial(batch: pa.Table) -> pa.Table:
        from palimpzest_ray.functions.tokens import limit_kernel_threads

        limit_kernel_threads()
        # arrow group_by handles the empty batch and keeps column types
        gb = batch.group_by([group_col])
        arrow_aggs = []
        for out, (fn, col) in aggs.items():
            if fn == "count":
                arrow_aggs.append((group_col, "count"))
            else:
                arrow_aggs.append((col, fn))
        res = gb.aggregate(arrow_aggs)
        # canonical output names
        cols = {group_col: res[group_col]}
        for out, (fn, col) in aggs.items():
            src_name = (
                f"{group_col}_count" if fn == "count" else f"{col}_{fn}"
            )
            cols[out] = res[src_name]
        return pa.table(cols)

    batches = list(
        stale.map_batches(_partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=65536
        )
    )
    if not batches or sum(b.num_rows for b in batches) == 0:
        return {"rows_rolled": 0, "groups": 0, "rows_deleted": 0,
                "noop": True}
    parts = pa.concat_tables(batches, promote_options="permissive")
    # reduce the partials driver-side (group-sized, tiny)
    gb = parts.group_by([group_col])
    red_aggs = []
    for out, (fn, _c) in aggs.items():
        red_aggs.append((out, "sum" if fn in ("count", "sum") else fn))
    red = gb.aggregate(red_aggs)
    cols = {group_col: red[group_col]}
    rows_rolled = 0
    for out, (fn, _c) in aggs.items():
        nm = f"{out}_sum" if fn in ("count", "sum") else f"{out}_{fn}"
        cols[out] = red[nm]
        if fn == "count":
            rows_rolled = int(pc.sum(red[nm]).as_py() or 0)
    slice_aggs = pa.table(cols)

    feed = pa.table(
        {
            "lsn": pa.array(
                np.full(slice_aggs.num_rows, int(src.max_lsn) + 1,
                        dtype=np.int64)
            ),
            "op": pa.array(["UPDATE"] * slice_aggs.num_rows),
            **{c: slice_aggs[c] for c in slice_aggs.column_names},
        }
    )
    sum_cols = tuple(o for o, (f, _c) in aggs.items() if f in ("count", "sum"))
    max_cols = tuple(o for o, (f, _c) in aggs.items() if f == "max")
    min_cols = tuple(o for o, (f, _c) in aggs.items() if f == "min")
    apply_accumulate(
        feed, rollup_root,
        key=group_col,
        num_partitions=num_partitions,
        sum_cols=sum_cols, max_cols=max_cols, min_cols=min_cols,
        txn=(f"rollup:{os.path.abspath(rollup_root)}", src.version),
    )
    res = delete_where(lake_root, predicate, mode=mode)
    return {
        "rows_rolled": rows_rolled,
        "groups": slice_aggs.num_rows,
        "rows_deleted": res.rows_deleted,
        "noop": False,
    }
