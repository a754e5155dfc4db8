"""Windowed aggregates over event streams (batch-replay semantics).

The reference is batch-only — no windows, watermarks, or late-data
handling (SURVEY.md §2.3 "Streaming-only concepts"). These operators
give the batch-replay equivalents, built from the engine's own
primitives (one keyed shuffle each):

- :func:`tumbling_window` — fixed-size time buckets: assign
  ``window_start = floor(ts / w) * w`` vectorized in ``map_batches``,
  then an ordinary ``groupby`` aggregate. Streaming analogue: the
  window id is the partition key, late data lands in its (still
  reconstructible) bucket — replay converges because assignment is a
  pure function of the timestamp.
- :func:`session_windows` — gap-based sessions per key:
  ``groupby(key).map_groups`` sorts one key's events and splits where
  the gap exceeds ``gap``; a cumulative sum over the gap mask numbers
  the sessions. State never leaves one group invocation.

Both are duckdb-oracle-checkable (``__ray_entry__`` q17/q18).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def _epoch_us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Epoch microseconds as int64 numpy, unit-correct for any timestamp
    resolution (a [ms]/[s] column cast straight to int64 would be
    silently treated as microseconds — 1000x-off windows, no error)."""
    t = col.type
    if not pa.types.is_timestamp(t):
        raise TypeError(
            f"window timestamp column must be a timestamp type, got {t}"
        )
    return col.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
        zero_copy_only=False
    )


def add_tumbling_window(
    batch: pa.Table, ts_col: str, window_s: int, out_col: str = "window_start"
) -> pa.Table:
    """Vectorized window assignment: floor-of-epoch timestamp. Numpy
    ``//`` floors (Arrow integer divide truncates toward zero, putting
    pre-1970 events in the wrong window)."""
    epoch_us = _epoch_us(batch[ts_col])
    w_us = window_s * 1_000_000
    start = (epoch_us // w_us) * w_us
    return batch.append_column(
        out_col, pa.array(start).cast(pa.timestamp("us"))
    )


def tumbling_window(
    ds: rd.Dataset,
    ts_col: str,
    window_s: int,
    keys: list[str],
    aggs,
) -> rd.Dataset:
    """Tumbling-window aggregate: one shuffle keyed on (window, keys)."""
    win = ds.map_batches(
        lambda b: add_tumbling_window(b, ts_col, window_s), batch_format="pyarrow"
    )
    return win.groupby(["window_start", *keys]).aggregate(*aggs)


def add_sliding_windows(
    batch: pa.Table,
    ts_col: str,
    window_s: int,
    hop_s: int,
    out_col: str = "window_start",
) -> pa.Table:
    """Vectorized sliding (hopping) window assignment: each event lands
    in up to ``ceil(window/hop)`` windows, emitted as replicated rows
    with a ``window_start`` column: every window ``ws`` (a hop multiple)
    with ``ws <= ts < ws + window``. Any (window, hop) pair works;
    hop == window degenerates to tumbling.

    Like :func:`add_tumbling_window`, assignment is a pure function of
    the timestamp, so replay converges and late data lands in its
    reconstructible buckets. The fan-out factor (≤ window/hop) is the
    shuffle-volume cost of overlap — keep hop ≥ window/4 at 100 TB.
    """
    if window_s <= 0 or hop_s <= 0:
        raise ValueError("window_s and hop_s must be positive")
    ts = _epoch_us(batch[ts_col])
    w_us = window_s * 1_000_000
    h_us = hop_s * 1_000_000
    k = -(-w_us // h_us)  # max windows per event
    # newest window containing ts: floor(ts/hop)*hop; walk back k-1 hops
    newest = (ts // h_us) * h_us
    ws = newest[:, None] - np.arange(k)[None, :] * h_us  # (n, k)
    valid = (ts[:, None] - ws) < w_us  # ws <= ts always holds
    rows = np.repeat(np.arange(len(ts)), valid.sum(axis=1))
    starts = ws[valid]
    out = batch.take(pa.array(rows))
    return out.append_column(out_col, pa.array(starts).cast(pa.timestamp("us")))


def sliding_window(
    ds: rd.Dataset,
    ts_col: str,
    window_s: int,
    hop_s: int,
    keys: list[str],
    aggs,
) -> rd.Dataset:
    """Sliding-window aggregate: replicate-assign in ``map_batches``,
    then one shuffle keyed on (window, keys)."""
    win = ds.map_batches(
        lambda b: add_sliding_windows(b, ts_col, window_s, hop_s),
        batch_format="pyarrow",
    )
    return win.groupby(["window_start", *keys]).aggregate(*aggs)


def session_windows(
    ds: rd.Dataset,
    ts_col: str,
    key: str,
    gap_s: float,
) -> rd.Dataset:
    """Sessionization: per ``key``, events sorted by time split into
    sessions wherever the inter-event gap exceeds ``gap_s``. Output one
    row per session: key, session_id (1-based per key, in time order),
    session_start, session_end, n_events.

    All state lives inside one group invocation (SURVEY.md §4's rule for
    stateful steps); skewed keys cost one big group, not a hot actor.
    """
    gap_us = int(gap_s * 1_000_000)

    def _sessions(group: pa.Table) -> pa.Table:
        g = group.sort_by(ts_col).combine_chunks()
        ts = _epoch_us(g[ts_col])
        n = len(ts)
        new_session = np.ones(n, dtype=np.int64)
        if n > 1:
            new_session[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        sid = np.cumsum(new_session)
        starts = np.flatnonzero(new_session)
        ends = np.append(starts[1:], n) - 1
        return pa.table(
            {
                key: pa.array([g[key][0].as_py()] * len(starts), g[key].type),
                "session_id": pa.array(np.arange(1, len(starts) + 1)),
                "session_start": pa.array(ts[starts]).cast(pa.timestamp("us")),
                "session_end": pa.array(ts[ends]).cast(pa.timestamp("us")),
                "n_events": pa.array(ends - starts + 1),
            }
        )

    return ds.groupby(key).map_groups(_sessions, batch_format="pyarrow")


def funnel(
    ds: rd.Dataset,
    steps: list[str],
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> pa.Table:
    """Ordered funnel: how many ``key`` entities completed step 1, then
    step 2 strictly after it, then step 3 after that, ... (the classic
    product-analytics sequence query; absent from the reference and
    Ray Data).

    Per-entity matching is one ``groupby(key)`` shuffle of the narrow
    (key, ts, type) projection; inside each group the chain is resolved
    with numpy min-scans, no row loop. Returns a driver-side table of
    ``(step, n_entities)`` — output is one row per step, so collecting
    it is not a materialization concern."""
    narrow = ds.select_columns([key, ts_col, type_col])
    n_steps = len(steps)

    def _chain(group: pa.Table) -> pa.Table:
        ts = _epoch_us(group[ts_col])
        et = group[type_col].to_numpy(zero_copy_only=False)
        reached = np.zeros(n_steps, dtype=np.int64)
        t_prev = -np.inf
        for i, step in enumerate(steps):
            m = (et == step) & (ts > t_prev)
            if not m.any():
                break
            t_prev = ts[m].min()
            reached[i] = 1
        return pa.table({"__step": pa.array(np.arange(n_steps, dtype=np.int64)),
                         "__hit": pa.array(reached)})

    from ray.data.aggregate import Sum

    counts = (
        narrow.groupby(key)
        .map_groups(_chain, batch_format="pyarrow")
        .groupby("__step")
        .aggregate(Sum("__hit", alias_name="n_entities"))
    )
    by_step = {r["__step"]: r["n_entities"] for r in counts.take_all()}
    # an empty input (or steps nobody reached) still yields one row per
    # step with a 0 count — matching the SQL oracle's shape
    return pa.table(
        {
            "step": pa.array(list(steps)),
            "step_idx": pa.array(range(1, n_steps + 1), pa.int64()),
            "n_entities": pa.array(
                [int(by_step.get(i, 0)) for i in range(n_steps)], pa.int64()
            ),
        }
    )
