"""Fluent relational layer over ``ray.data.Dataset``.

API parity with the reference's ``Dataset`` fluent surface
(``src/palimpzest/core/data/dataset.py:246-686``): filter, map /
add_columns / flat_map, project, distinct, groupby, join, global
aggregates (count/average/sum/min/max), limit, plus engine-side
additions the reference lacks (sort, top-k, union, semi/anti join).

Reference semantics preserved (SURVEY.md §7.5 item 7):
- ``distinct`` keeps the *first* occurrence per key
  (``distinct.py:43-45``) — here made deterministic by an explicit
  tie-break ordering instead of arrival order.
- join duplicate (non-key) columns rename with ``_right``
  (``schemas.py:163-166``).
- groupby aggregate output columns are named ``"func(field)"``
  (``groupbysig.py:55-59``).
- ``average``/``sum`` silently skip unparseable values
  (``aggregate.py:245-251``).

Execution is Ray-Data-native throughout: row UDFs are accepted for
reference compatibility but run inside ``map_batches`` (one Python call
per row only in that compat path); every built-in operator is
vectorized Arrow. Wide operators (distinct / groupby / shuffle join /
sort) are keyed shuffles; small-side joins broadcast via ``ray.put``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from palimpzest_ray.functions.tokens import first_per_key, stable_hash

RIGHT_SUFFIX = "_right"

#: join(strategy="auto") broadcasts a right side estimated at or below
#: this many in-memory bytes. The bound is ABSOLUTE, not data-relative:
#: broadcast cost is driver memory + one object-store copy read by
#: every task, which is the same machine cost at every corpus scale.
BROADCAST_EST_BYTES = 2 << 20  # 2 MiB
_JOIN_BUCKET = "__jbucket"
_JOIN_SIDE = "__jside"


def _capped(fn):
    """Wrap a batch fn so the worker's Arrow thread pool is capped
    before the first kernel runs (see ``functions.tokens.
    limit_kernel_threads`` — uncapped per-worker pools oversubscribe
    the node and, in microVM sandboxes, trigger kernel-time storms).
    Callable classes (actor stages) are left as-is."""
    if isinstance(fn, type):
        return fn
    import functools

    from palimpzest_ray.functions.tokens import limit_kernel_threads

    @functools.wraps(fn)
    def wrapped(batch):
        limit_kernel_threads()
        return fn(batch)

    return wrapped


# --------------------------------------------------------------------------
# sources
# --------------------------------------------------------------------------


def read_parquet(paths, columns: list[str] | None = None, **kw) -> "Dataset":
    """Parquet source with column pruning at the read (pass ``columns``).

    Footer metadata is stripped in a read-fused map: pandas-written
    parquet carries a dict-bearing schema blob that makes ``pa.Schema``
    unhashable, which breaks Ray's schema dedup early-exit (log spam in
    every worker + full unify work per block pair). ``batch_size=None``
    keeps one zero-copy batch per block.

    Also stamps ``_est_bytes`` — the estimated in-memory size of the
    SELECTED columns from parquet footer statistics — which
    :meth:`Dataset.join`'s ``strategy="auto"`` uses to pick broadcast
    vs shuffle without user annotations (VERDICT r2 ask #5).
    """
    if "schema" not in kw:
        # pass the footer schema with its metadata dropped: blocks then
        # leave the READ op already hashable, killing the worker-side
        # "Failed to hash the schemas" warning that a post-read strip
        # map cannot reach (it fires inside ReadParquet->SplitBlocks)
        stripped = _stripped_footer_schema(paths)
        if stripped is not None:
            if columns is not None:  # schema must match the projection
                stripped = pa.schema(
                    [stripped.field(c) for c in columns if c in stripped.names]
                )
            kw["schema"] = stripped
    ds = rd.read_parquet(paths, columns=columns, **kw)
    out = Dataset(
        ds.map_batches(_strip_schema_metadata, batch_format="pyarrow", batch_size=None)
    )
    out._est_bytes, out._est_rows = _estimate_parquet_stats(paths, columns)
    return out


def _stripped_footer_schema(paths) -> pa.Schema | None:
    """First file's footer schema minus schema-level metadata; None when
    the footer can't be read cheaply (mixed/remote inputs) or carries no
    metadata (nothing to strip — let Ray infer as usual)."""
    import os as _os

    try:
        p = paths if isinstance(paths, str) else list(paths)[0]
        if _os.path.isdir(p):
            for root, _dirs, names in _os.walk(p):
                pq_names = sorted(n for n in names if n.endswith(".parquet"))
                if pq_names:
                    p = _os.path.join(root, pq_names[0])
                    break
        import pyarrow.parquet as _pq

        schema = _pq.read_schema(p)
        return schema.remove_metadata() if schema.metadata else None
    except Exception:
        return None


def _estimate_parquet_stats(
    paths, columns: list[str] | None
) -> tuple[int | None, int | None]:
    """(bytes, rows) estimate of the selected columns, from parquet
    footers. Bounded plan-time cost: at most 8 footers are read; the
    rest extrapolate by on-disk file size (uniform-format assumption —
    exactly how a catalog would scale row-group stats). Rows feed the
    join-output upper bound that lets ``strategy="auto"`` broadcast
    DERIVED small sides (a dimension-chain join stays provably tiny)."""
    import os as _os

    try:
        plist = [paths] if isinstance(paths, str) else list(paths)
        files: list[str] = []
        for p in plist:
            if _os.path.isdir(p):
                for root, _dirs, names in _os.walk(p):
                    files += [
                        _os.path.join(root, n)
                        for n in names
                        if n.endswith(".parquet")
                    ]
            else:
                files.append(p)
        if not files:
            return None, None
        import pyarrow.parquet as _pq

        sample = files[:8]
        est = 0
        rows = 0
        for f in sample:
            md = _pq.ParquetFile(f).metadata
            rows += md.num_rows
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    if columns is None or col.path_in_schema.split(".")[0] in columns:
                        est += col.total_uncompressed_size
        disk_sample = sum(_os.path.getsize(f) for f in sample)
        disk_total = disk_sample + sum(_os.path.getsize(f) for f in files[8:])
        if disk_sample:
            est = int(est * disk_total / disk_sample)
            rows = int(rows * disk_total / disk_sample)
        return est, rows
    except Exception:
        return None, None  # estimate only — never fail a read over it


def _strip_schema_metadata(batch: pa.Table) -> pa.Table:
    return batch.replace_schema_metadata(None)


def from_pandas(df: pd.DataFrame) -> "Dataset":
    # go through Arrow so every block is a pa.Table (pandas-backed blocks
    # trip several Ray 2.49 paths, e.g. PandasBlockSchema vs pa.Schema)
    return from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def from_arrow(table: pa.Table) -> "Dataset":
    out = Dataset(rd.from_arrow(table))
    out._est_bytes = table.nbytes  # exact, not an estimate
    out._est_rows = table.num_rows
    return out


def from_items(items: list[dict]) -> "Dataset":
    return Dataset(rd.from_items(items))


# --------------------------------------------------------------------------


def _nullsafe_gk(batch: pa.Table, keys: list[str]) -> "pa.Array":
    """Null-safe composite group key: per key a null flag + a
    length-prefixed string encoding (collision-free). Ray's sort-based
    shuffle cannot order blocks whose key columns mix nulls and values
    (`'<' not supported between NoneType and str` in
    ``sort_and_partition``) — grouping on this surrogate sidesteps the
    sort; the typed key columns ride along and are recovered with Min
    (constant within a group)."""
    parts = []
    for k in keys:
        sv = pc.cast(batch[k], pa.string())
        enc = pc.binary_join_element_wise(
            "V", pc.cast(pc.utf8_length(sv), pa.string()), ":", sv, ""
        )
        parts.append(pc.if_else(pc.is_valid(sv), enc, pa.scalar("N")))
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(*parts, "")


def _range_reduce(vals: np.ndarray, starts: np.ndarray, ends: np.ndarray, red):
    """Per-row reduce of ``vals[starts[i]:ends[i]]`` (non-empty windows)
    via a sparse table (range-min-query): O(n log n) build, O(1) per
    query as two overlapping power-of-two spans; the only Python loop
    is over the ≤ log2(n) distinct span widths."""
    n = len(vals)
    w = ends - starts
    assert (w > 0).all()
    kmax = int(np.floor(np.log2(w.max()))) if n else 0
    st = [vals]
    for k in range(1, kmax + 1):
        prev = st[-1]
        span = 1 << (k - 1)
        st.append(red(prev[: len(prev) - span], prev[span:]))
    out = np.empty(n, dtype=vals.dtype)
    ks = np.floor(np.log2(w)).astype(np.int64)
    for k in np.unique(ks):
        m = ks == k
        span = 1 << k
        tab = st[k]
        out[m] = red(tab[starts[m]], tab[ends[m] - span])
    return out


_WINDOW_KINDS = (
    "sum", "max", "min", "avg", "count", "row_number", "rank",
    "dense_rank", "percent_rank", "cume_dist", "ntile",
    "first_value", "last_value",
)

_WINDOW_ACC = {
    "sum": np.cumsum,
    "max": np.maximum.accumulate,
    "min": np.minimum.accumulate,
}

# kinds whose running state carries across order-range buckets (the
# distributed low-cardinality window path), and the cardinality at or
# below which "auto" picks it — above, one map_groups task per group
# is already parallel enough and needs no extra pass.
_WINDOW_BUCKETED_KINDS = (
    "sum", "count", "avg", "min", "max", "row_number",
    "rank", "percent_rank", "cume_dist", "ntile",
    "dense_rank", "first_value", "last_value",
)
_WINDOW_LOW_CARD = 256
# rolling windows wider than this never take the bucketed path: tail
# candidates approach whole batches and the carry stops being "narrow"
_ROLL_BUCKETED_MAX_WINDOW = 1024
# auto picks the bucketed paths only when one partition-key group is
# genuinely bigger than a sane task's HEAP (~1 GiB in-memory) — the
# hazard is bytes, not rows (measured: a 4M-row/80MB narrow group is
# 2.7x faster through map_groups than through the bucketed pass; a
# token-payload group at corpus scale is gigabytes and must split)
_WINDOW_BUCKETED_MIN_GROUP_BYTES = 1 << 30


def _rolling_kernel(vals, n: int, kind: str, w: int) -> np.ndarray:
    """ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW over one sorted
    run: sum/avg via prefix-sum differences, min/max via a
    sliding_window_view reduction, count positionally. ``vals`` is
    ignored for count."""
    pos = np.arange(n, dtype=np.int64)
    cnt = np.minimum(pos + 1, w)
    if kind == "count":
        return cnt
    if kind in ("sum", "avg"):
        cs = np.concatenate([[0.0], np.cumsum(vals.astype(np.float64))])
        s = cs[pos + 1] - cs[np.maximum(pos + 1 - w, 0)]
        return s / cnt if kind == "avg" else s
    red = np.minimum if kind == "min" else np.maximum
    head = red.accumulate(vals[: min(w - 1, n)]) if w > 1 else vals[:0]
    if n >= w:
        tail = red.reduce(
            np.lib.stride_tricks.sliding_window_view(vals, w), axis=1
        )
        return np.concatenate([head, tail])
    return head


def _bucket_by_order(
    mat: rd.Dataset, n: int, first: str, num_buckets: int
) -> tuple[rd.Dataset, int]:
    """Shared preamble of the distributed window paths: bounded value
    sample of the first order column → quantile bucket bounds (rows
    with equal keys share a bucket, so full-tuple ties never straddle
    buckets) → ``_bucket`` tag per row. ``num_buckets`` is a FLOOR: at
    scale buckets grow with the data so one (bucket, group) slice
    stays a sane task (~2M rows) — 64 fixed buckets over 10^10 rows
    would put ~160M rows in a task; the cap keeps the driver's carry
    table tiny either way. Null order keys follow SQL's ASC default
    NULLS LAST via the same is-null-flag + filled-copy trick as
    ``Dataset.sort(null_safe=True)``: every null/NaN-order row lands
    in ONE dedicated final bucket past the value range. All nulls are
    full-tuple ties on the first order key, so they never straddle
    buckets and the ranking kinds' cross-bucket tie carry stays exact
    (the per-slice ``sort_indices``/tie-flag kernels already place
    NaN/NaT/None last and rank them as peers — r5, closes the
    'bucketed refuses null order keys' gap from VERDICT r4)."""
    step = max(1, n // 65536)

    def _thin(batch: pa.Table) -> pa.Table:
        return batch.select([first]).take(
            pa.array(range(0, batch.num_rows, step), pa.int64())
        )

    vals = [
        r[first]
        for r in mat.map_batches(_thin, batch_format="pyarrow").take_all()
    ]
    nonnull = [
        v for v in vals
        if v is not None and not (isinstance(v, float) and v != v)
    ]
    nb = max(num_buckets, min(4096, n // 2_000_000))
    nb = max(1, min(nb, max(len(nonnull), 1)))
    if nonnull:
        sample = np.sort(np.array(nonnull))
        bounds = sample[
            np.linspace(0, sample.size - 1, nb + 1).astype(np.int64)
        ][1:-1]
    else:  # every sampled key null: one value bucket, all rows tie
        bounds = np.array([], dtype=np.int64)
    null_bucket = nb  # reserved (possibly empty) — NULLS LAST

    def _with_bucket(batch: pa.Table) -> pa.Table:
        arr = batch[first].combine_chunks()
        mask = pc.is_null(arr, nan_is_null=True)
        if batch.num_rows and pc.any(mask).as_py():
            sent = _null_sentinel(arr.type)
            if sent is None:  # nested order type: cannot fill
                raise ValueError(
                    f"bucketed window: nested order column {first!r} "
                    "with nulls is unsupported — use strategy='groups'"
                )
            keys = pc.fill_null(arr, pa.scalar(sent, arr.type)).to_numpy(
                zero_copy_only=False
            )
            bk = np.searchsorted(bounds, keys, side="right").astype(np.int64)
            bk[mask.to_numpy(zero_copy_only=False)] = null_bucket
        else:
            keys = arr.to_numpy(zero_copy_only=False)
            bk = np.searchsorted(bounds, keys, side="right").astype(np.int64)
        return batch.append_column("_bucket", pa.array(bk, pa.int64()))

    return mat.map_batches(_with_bucket, batch_format="pyarrow"), nb + 1




def _window_kind_values(g: pa.Table, kind: str, col: str | None, order: list[str], k):
    """One window function over an already-ORDER-sorted group ``g``;
    returns the result column aligned to ``g``'s row order. Vectorized
    numpy throughout (see :meth:`Dataset.window_cum` for semantics)."""
    n = g.num_rows
    if kind in ("row_number", "count"):
        return pa.array(np.arange(1, n + 1, dtype=np.int64))
    if kind == "ntile":
        # SQL ntile: the first (rows % k) buckets get one extra row
        q_, r_ = divmod(n, k)
        i = np.arange(n, dtype=np.int64)
        if q_ == 0:  # more buckets than rows: one row per bucket
            return pa.array(i + 1)
        big = r_ * (q_ + 1)
        return pa.array(
            np.where(i < big, i // (q_ + 1) + 1, r_ + (i - big) // q_ + 1).astype(
                np.int64
            )
        )
    if kind == "first_value":
        return g[col].take(pa.array(np.zeros(n, dtype=np.int64)))
    if kind == "last_value":
        return g[col].take(pa.array(np.full(n, n - 1, dtype=np.int64)))
    if kind in ("rank", "dense_rank", "percent_rank", "cume_dist"):
        # new-group flags over the sorted order tuple
        flag = np.zeros(n, dtype=bool)
        if n:
            flag[0] = True
        for o in order:
            a = g[o].combine_chunks().to_numpy(zero_copy_only=False)
            neq = a[1:] != a[:-1]
            # nulls surface as NaN/NaT, and NaN != NaN is True — but SQL
            # ranks null order keys as ties.
            if a.dtype.kind == "f":
                neq &= ~(np.isnan(a[1:]) & np.isnan(a[:-1]))
            elif a.dtype.kind in "Mm":
                neq &= ~(np.isnat(a[1:]) & np.isnat(a[:-1]))
            flag[1:] |= neq
        if kind == "dense_rank":
            return pa.array(np.cumsum(flag).astype(np.int64))
        if kind == "cume_dist":
            # rows ≤ current under the order (ties share the value): the
            # END position of each tie group, over n
            gid = np.cumsum(flag) - 1
            ends = np.cumsum(np.bincount(gid, minlength=gid[-1] + 1 if n else 0))
            return pa.array(ends[gid].astype(np.float64) / n)
        pos = np.where(flag, np.arange(n, dtype=np.int64), 0)
        rnk = np.maximum.accumulate(pos) + 1
        if kind == "percent_rank":
            return pa.array((rnk - 1) / (n - 1) if n > 1 else np.zeros(n))
        return pa.array(rnk)
    vals = g[col].combine_chunks().to_numpy(zero_copy_only=False)
    if kind == "avg":
        return pa.array(
            np.cumsum(vals.astype(np.float64)) / np.arange(1, n + 1, dtype=np.float64)
        )
    return pa.array(_WINDOW_ACC[kind](vals))


class Dataset:
    """Thin immutable wrapper; every method returns a new ``Dataset``."""

    def __init__(self, ds: rd.Dataset):
        self._ds = ds
        #: estimated in-memory bytes (None = unknown). Stamped by the
        #: sources (parquet footers / arrow nbytes), carried through
        #: row-preserving-or-shrinking ops via _with_est, and consumed
        #: by join(strategy="auto") to pick broadcast vs shuffle. A
        #: conservative OVER-estimate is fine (worst case: a shuffle
        #: where broadcast was possible); unknown always means shuffle.
        self._est_bytes: int | None = None
        #: estimated row count, same contract (upper bound or None) —
        #: joins need rows, not just bytes, to bound their output
        self._est_rows: int | None = None
        #: column-name hint for 0-row results: Ray's schema() is
        #: unreliable once a pipeline ends empty (None, or the
        #: pre-Project schema), so project() records the selection and
        #: to_arrow()'s empty fallback re-applies it
        self._proj_cols: list[str] | None = None

    def _with_est(self, ds: rd.Dataset) -> "Dataset":
        out = Dataset(ds)
        out._est_bytes = self._est_bytes
        out._est_rows = self._est_rows
        out._proj_cols = self._proj_cols
        return out

    # ---- plumbing ----
    @property
    def ray(self) -> rd.Dataset:
        return self._ds

    def to_pandas(self, limit: int | None = None) -> pd.DataFrame:
        if limit is not None:
            if limit == 0:  # falsy != unlimited: schema-only empty frame
                base = self._ds.schema()
                return (
                    base.base_schema.empty_table().to_pandas()
                    if base
                    else pd.DataFrame()
                )
            return self._ds.to_pandas(limit=limit)
        # via Arrow so a 0-row result keeps its columns (ray's
        # to_pandas returns a columnless frame for empty datasets)
        t = self.to_arrow()
        df = t.to_pandas()
        for i, f in enumerate(t.schema):
            # arrow→pandas turns list cells into numpy arrays; keep the
            # python lists ray's own to_pandas produced
            if (
                pa.types.is_list(f.type)
                or pa.types.is_large_list(f.type)
                or pa.types.is_fixed_size_list(f.type)
            ):
                df[f.name] = t.column(i).to_pylist()
        return df

    def to_arrow(self) -> pa.Table:
        tables = [
            b
            for b in self._ds.iter_batches(batch_format="pyarrow", batch_size=65536)
        ]
        if not tables:
            base = self._ds.schema()
            empty = base.base_schema.empty_table() if base else pa.table({})
            if self._proj_cols is not None:
                keep = [c for c in self._proj_cols if c in empty.column_names]
                empty = (
                    empty.select(keep)
                    if len(keep) == len(self._proj_cols)
                    else pa.schema(
                        [pa.field(c, pa.null()) for c in self._proj_cols]
                    ).empty_table()
                )
            return empty
        return pa.concat_tables(tables, promote_options="permissive")

    def take_all(self):
        return self._ds.take_all()

    def schema(self):
        return self._ds.schema()

    def write_parquet(self, path: str, **kw) -> None:
        self._ds.write_parquet(path, **kw)

    def stats(self) -> str:
        s = self._ds.stats()
        from palimpzest_ray.generators import cluster_usage

        u = cluster_usage()
        if u.get("calls"):
            s += (
                f"\nLLM usage (cluster): calls={int(u['calls'])}, "
                f"tokens={int(u.get('total_tokens', 0))}, "
                f"cost=${u.get('cost_usd', 0.0):.6f}"
            )
        return s

    def describe(self, cols: list[str] | None = None, *, bins: int = 8192) -> pa.Table:
        """Per-numeric-column summary (pandas/Spark ``describe`` parity
        shape): count / mean / std / min / q25 / median / q75 / max —
        one combiner aggregate pass for the moments plus the
        histogram-sketch quantiles (``stages.sketches.approx_quantiles``,
        error ≤ one bin of the value range; exact min/max). Returns a
        small driver-side table (one row per column)."""
        from ray.data.aggregate import Count, Max, Mean, Min, Std

        FIELDS = ("column", "count", "mean", "std", "min", "q25", "median", "q75", "max")
        schema = _arrow_schema(self._ds)
        if cols is None:
            cols = [
                f.name
                for f in schema
                if pa.types.is_integer(f.type) or pa.types.is_floating(f.type)
            ]
        if not cols:
            return pa.table(
                {"column": pa.array([], pa.string())}
                | {k: pa.array([], pa.float64()) for k in FIELDS[1:]}
            )
        aggs = []
        for c in cols:
            aggs += [
                Count(c, alias_name=f"n_{c}", ignore_nulls=True),
                Mean(c, alias_name=f"mean_{c}"),
                Std(c, ddof=1, alias_name=f"std_{c}"),
                Min(c, alias_name=f"min_{c}"),
                Max(c, alias_name=f"max_{c}"),
            ]
        row = self._ds.aggregate(*aggs)

        def _f(v):  # all-null columns / empty datasets: aggregates are None
            return None if v is None or (isinstance(v, float) and np.isnan(v)) else float(v)

        # ONE histogram pass for every column whose range is non-degenerate
        # (reusing the min/max the aggregate pass just computed)
        edges = {}
        for c in cols:
            lo, hi = _f(row[f"min_{c}"]), _f(row[f"max_{c}"])
            if lo is not None and hi is not None and lo < hi:
                edges[c] = np.linspace(lo, hi, bins + 1)

        totals = {c: np.zeros(bins, dtype=np.int64) for c in edges}
        if edges:
            hist_cols = list(edges)

            def _hist(batch: pa.Table) -> pa.Table:
                arrays = []
                for c in hist_cols:
                    v = batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
                    counts, _ = np.histogram(v[~np.isnan(v)], bins=edges[c])
                    arrays.append(pa.array([counts.astype(np.int64)]))
                return pa.table(arrays, names=hist_cols)

            for b in self._ds.map_batches(_hist, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None
            ):
                for c in hist_cols:
                    for counts in b[c].to_pylist():
                        totals[c] += np.asarray(counts, dtype=np.int64)

        def _q(c, q):
            lo, hi = _f(row[f"min_{c}"]), _f(row[f"max_{c}"])
            if lo is None:
                return None
            if c not in edges:  # constant column (or single value)
                return lo
            cum = np.cumsum(totals[c])
            i = int(np.searchsorted(cum, q * cum[-1], side="left"))
            return float(edges[c][min(i + 1, bins)])

        out = {k: [] for k in FIELDS}
        for c in cols:
            out["column"].append(c)
            out["count"].append(int(row[f"n_{c}"] or 0))
            out["mean"].append(_f(row[f"mean_{c}"]))
            out["std"].append(_f(row[f"std_{c}"]))
            out["min"].append(_f(row[f"min_{c}"]))
            out["q25"].append(_q(c, 0.25))
            out["median"].append(_q(c, 0.5))
            out["q75"].append(_q(c, 0.75))
            out["max"].append(_f(row[f"max_{c}"]))
        return pa.table(out)

    def explain(self) -> str:
        """The lazy logical plan as text — the plan-as-data discipline
        the reference keeps via content-hashed ``logical_op_id``s
        (SURVEY §2.4); per-operator execution metrics come from
        :meth:`stats` after the pipeline has been consumed."""
        return str(self._ds)

    # ---- projections / maps ----

    def project(self, cols: list[str]) -> "Dataset":
        """Column projection (reference ``ProjectOp``, ``project.py:8-53``)."""
        out = self._with_est(self._ds.select_columns(cols))
        out._proj_cols = list(cols)
        return out

    select_columns = project

    def rename_columns(self, mapping: dict[str, str]) -> "Dataset":
        return self._with_est(_rename(self._ds, mapping))

    def map_batches(self, fn, **kw) -> "Dataset":
        """Vectorized batch transform — the preferred hot path."""
        kw.setdefault("batch_format", "pyarrow")
        return Dataset(self._ds.map_batches(_capped(fn), **kw))

    def map(self, udf: Callable[[dict], dict], **kw) -> "Dataset":
        """Row-dict UDF map, 1:1 (reference ``NonLLMConvert``,
        ``convert.py:198-259``). The UDF's output dict is merged over the
        input row (parent fields preserved, reference ``union_schemas``
        merge). Compat path: executes inside ``map_batches`` but calls
        Python once per row — prefer :meth:`map_batches`."""

        def _apply(batch: pa.Table) -> pa.Table:
            rows = batch.to_pylist()
            out = [{**r, **udf(r)} for r in rows]
            return pa.Table.from_pylist(out)

        kw.setdefault("batch_format", "pyarrow")
        return Dataset(self._ds.map_batches(_apply, **kw))

    add_columns = map

    def flat_map(self, udf: Callable[[dict], list[dict]], **kw) -> "Dataset":
        """Row-dict UDF, 1:N (reference ``Cardinality.ONE_TO_MANY``)."""

        def _apply(batch: pa.Table) -> pa.Table:
            out = []
            for r in batch.to_pylist():
                for child in udf(r):
                    out.append({**r, **child})
            return pa.Table.from_pylist(out)

        kw.setdefault("batch_format", "pyarrow")
        return Dataset(self._ds.map_batches(_apply, **kw))

    def with_column(self, name: str, fn: Callable[[pa.Table], pa.Array]) -> "Dataset":
        """Vectorized computed column: ``fn(batch) -> Array``."""

        def _apply(batch: pa.Table) -> pa.Table:
            col = fn(batch)
            if name in batch.column_names:
                return batch.set_column(batch.column_names.index(name), name, col)
            return batch.append_column(name, col)

        return Dataset(self._ds.map_batches(_apply, batch_format="pyarrow"))

    def explode(self, list_col: str, out_col: str | None = None) -> "Dataset":
        """Vectorized 1:N explode of a list column (flat_map fast path):
        parent rows repeated via ``take`` on list parent indices."""
        out_col = out_col or list_col

        def _apply(batch: pa.Table) -> pa.Table:
            col = batch[list_col].combine_chunks()
            flat = pc.list_flatten(col)
            parents = pc.list_parent_indices(col)
            others = batch.drop_columns([list_col]).take(parents)
            return others.append_column(out_col, flat)

        return Dataset(self._ds.map_batches(_apply, batch_format="pyarrow"))

    # ---- filters ----

    def filter(
        self,
        fn: Callable[[dict], bool] | None = None,
        expr: str | None = None,
        batch_fn: Callable[[pa.Table], pa.Table] | None = None,
    ) -> "Dataset":
        """Filter (reference ``NonLLMFilter``, ``filter.py:125-162``).

        ``expr``: Ray expression string (vectorized, pushdown-friendly).
        ``batch_fn``: vectorized ``Table -> Table``. ``fn``: row-dict
        predicate compat path.
        """
        if expr is not None:
            return self._with_est(self._ds.filter(expr=expr))
        if batch_fn is not None:
            return self._with_est(
                self._ds.map_batches(batch_fn, batch_format="pyarrow")
            )
        assert fn is not None

        def _apply(batch: pa.Table) -> pa.Table:
            mask = pa.array([bool(fn(r)) for r in batch.to_pylist()])
            return batch.filter(mask)

        return self._with_est(self._ds.map_batches(_apply, batch_format="pyarrow"))

    # ---- distinct / limit / sort / union ----

    def distinct(
        self,
        cols: list[str] | None = None,
        order_by: list[str] | None = None,
        *,
        null_safe: bool = False,
    ) -> "Dataset":
        """Exact dedup on ``cols`` (default: all columns), keep-first
        semantics (reference ``distinct.py:43-45``). The reference keeps
        the first *arrival*; under a distributed shuffle arrival order is
        meaningless, so determinism comes from ``order_by`` (default: the
        remaining columns, ascending) — hash-partition on the key then
        per-group first, no global mutable seen-set (SURVEY.md §2.3).
        ``null_safe=True`` allows null key values (SQL DISTINCT keeps one
        null row) — see :meth:`groupby`.
        """
        ds = self._ds
        schema = ds.schema()
        all_cols = list(schema.names)
        key_cols = cols or all_cols
        tie = order_by or [c for c in all_cols if c not in key_cols]

        def _first(group: pa.Table) -> pa.Table:
            if group.num_rows <= 1:
                return group
            if tie:
                group = group.sort_by([(c, "ascending") for c in tie])
            return group.slice(0, 1)

        return GroupedDataset(ds, key_cols, null_safe=null_safe).map_groups(
            _first, batch_format="pyarrow"
        )

    def limit(self, n: int) -> "Dataset":
        """Streaming limit — the executor early-stops upstream work
        (reference enforces this in the driver loop,
        ``parallel_execution_strategy.py:179-191``)."""
        return self._with_est(self._ds.limit(n))

    def sort(self, key, descending: bool = False, *, null_safe: bool = False) -> "Dataset":
        """Global sort (range shuffle). Absent in the reference
        (SURVEY.md §2.3 'global sort: absent'). ``null_safe=True``
        implements duckdb's default NULLS LAST for null-bearing sort
        keys (Ray's range shuffle otherwise crashes comparing null
        against a value): each key is split into an is-null flag plus a
        null-filled copy, sorted (flag, value), then projected away."""
        if not null_safe:
            return self._with_est(self._ds.sort(key, descending=descending))
        keys = [key] if isinstance(key, str) else list(key)
        desc = (
            [descending] * len(keys) if isinstance(descending, bool) else list(descending)
        )
        schema = _arrow_schema(self._ds)
        zero = {}
        for k in keys:
            t = schema.field(k).type
            s = _null_sentinel(t)
            if s is None:
                raise ValueError(f"null_safe sort unsupported for nested key {k!r}")
            zero[k] = pa.scalar(s, t)

        def _derive(batch: pa.Table) -> pa.Table:
            for i, k in enumerate(keys):
                batch = batch.append_column(
                    f"__sn{i}", pc.cast(pc.is_null(batch[k]), pa.int8())
                )
                batch = batch.append_column(f"__sv{i}", pc.fill_null(batch[k], zero[k]))
            return batch

        sort_cols, sort_desc = [], []
        for i in range(len(keys)):
            sort_cols += [f"__sn{i}", f"__sv{i}"]
            sort_desc += [False, desc[i]]  # NULLS LAST regardless of direction
        derived = [c for i in range(len(keys)) for c in (f"__sn{i}", f"__sv{i}")]
        out = self._ds.map_batches(_derive, batch_format="pyarrow").sort(
            sort_cols, descending=sort_desc
        )
        return Dataset(out).map_batches(lambda b: b.drop_columns(derived))

    def topk(self, k: int, key, descending: bool = True) -> "Dataset":
        """Relational top-k = sort + streaming limit."""
        return Dataset(self._ds.sort(key, descending=descending).limit(k))

    def union(self, *others: "Dataset") -> "Dataset":
        return Dataset(self._ds.union(*[o._ds for o in others]))

    def random_sample(self, fraction: float, seed: int | None = None) -> "Dataset":
        return Dataset(self._ds.random_sample(fraction, seed=seed))

    def repartition(self, n: int, shuffle: bool = False) -> "Dataset":
        return Dataset(self._ds.repartition(n, shuffle=shuffle))

    # ---- group-by & aggregates ----

    def groupby(
        self, cols: str | list[str], *, null_safe: bool = False
    ) -> "GroupedDataset":
        """Grouped view. ``null_safe=True`` groups via an encoded
        surrogate key so key columns may contain nulls (SQL GROUP BY
        semantics; Ray's sort shuffle otherwise crashes on mixed
        null/value key blocks) at the cost of a string key exchange —
        leave off for null-free keys."""
        return GroupedDataset(
            self._ds,
            [cols] if isinstance(cols, str) else list(cols),
            null_safe=null_safe,
        )

    def count(self) -> int:
        """Global count (reference ``CountAggregateOp``)."""
        return self._ds.count()

    def _numeric(self, col: str) -> rd.Dataset:
        """Coerce ``col`` to float64, silently skipping unparseable values
        (reference ``aggregate.py:245-251`` semantics)."""

        def _coerce(batch: pa.Table) -> pa.Table:
            arr = batch[col]
            if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
                vals = pd.to_numeric(arr.to_pandas(), errors="coerce")
                arr = pa.array(vals, type=pa.float64())
            else:
                arr = arr.cast(pa.float64())
            return pa.table({col: arr})

        return self._ds.map_batches(_coerce, batch_format="pyarrow")

    def average(self, col: str) -> float:
        return self._numeric(col).mean(col)

    mean = average

    def sum(self, col: str):
        return self._numeric(col).sum(col)

    def min(self, col: str):
        return self._ds.min(col)

    def max(self, col: str):
        return self._ds.max(col)

    # ---- joins ----

    def join(
        self,
        other: "Dataset",
        on: str | list[str],
        how: str = "inner",
        *,
        strategy: str = "auto",
        num_buckets: int | None = None,
        salt: int = 1,
        suffix: str = RIGHT_SUFFIX,
    ) -> "Dataset":
        """Equi-join (reference ``RelationalJoin``, ``join.py:179-286``,
        minus its in-memory nested loop). Duplicate non-key columns on
        the right are renamed with ``_right`` (``schemas.py:163-166``).

        ``strategy="auto"`` (default) picks from the RIGHT side's size
        estimate (parquet footer stats stamped by ``read_parquet`` and
        carried through row-preserving ops): estimated ≤
        ``BROADCAST_EST_BYTES`` → broadcast, bigger or UNKNOWN (any
        derived pipeline) → shuffle. A stale hand-picked broadcast is
        the classic 100-TB scale-killer; auto never broadcasts a side
        it cannot bound.

        ``strategy="broadcast"``: materialize the (small) right side
        once, ``ray.put`` it, and merge per batch inside ``map_batches``
        — no shuffle; the idiom for dimension tables.
        ``strategy="shuffle"``: bucketed cogroup hash join — both sides
        tagged with ``hash(key) % B``, unioned, ``groupby(bucket)``, and
        merged per bucket; scales to two large sides. Skewed keys salt
        naturally across buckets only if keys are diverse; for a single
        pathological hot key prefer broadcast of the side containing it.

        Null keys follow ANSI SQL: a null never matches anything (not
        even another null); inner drops null-key rows, left/right/outer
        emit them unmatched on their preserved side — identical on the
        acero and pandas kernels and both strategies.

        ``salt=N`` (shuffle, how in inner/left only): split each bucket
        into N sub-buckets — left rows round-robin, right rows
        replicated ×N — so one hot key fans across N tasks instead of
        bounding the join on one. Costs N× the right side's shuffle
        volume; use when both sides are too big to broadcast AND the
        key is skewed (``stages.sketches.heavy_hitters`` finds such
        keys).

        ``num_buckets=None`` (default) sizes the shuffle from plan
        metadata: ~256 MB of estimated in-memory input per cogroup
        task (floor 32, cap 65536) — so the same call works at sf0.01
        and at 100 TB, where a fixed 32 would put terabytes in one
        ``map_groups`` task. Pass an int to pin it.
        """
        on = [on] if isinstance(on, str) else list(on)
        how = {"outer": "outer", "full": "outer", "full_outer": "outer"}.get(how, how)
        assert how in ("inner", "left", "right", "outer"), how
        if strategy == "auto":
            est = other._est_bytes
            strategy = (
                "broadcast"
                if est is not None and est <= BROADCAST_EST_BYTES
                else "shuffle"
            )
        if salt > 1 and (strategy != "shuffle" or how not in ("inner", "left")):
            raise ValueError(
                "salt requires strategy='shuffle' and how in ('inner', 'left'): "
                "a replicated right row cannot prove itself globally unmatched"
            )

        # pin any side whose schema probe would double-execute it (an
        # all-to-all upstream with no metadata schema) — see
        # _pin_for_probe; lazy read/map chains stay streaming
        left_ds, right_ds = _pin_for_probe(self._ds), _pin_for_probe(other._ds)
        left_names = _arrow_schema(left_ds).names
        right_names = _arrow_schema(right_ds).names
        collisions = [c for c in right_names if c in left_names and c not in on]
        if collisions:
            right_ds = _rename(right_ds, {c: c + suffix for c in collisions})
            right_names = [c + suffix if c in collisions else c for c in right_names]

        # Join-output upper bound: every left row may match every right
        # row, plus each side's unmatched rows — rows ≤ |L|·|R| + |L| +
        # |R|, bytes ≤ rows · (bytes/row L + bytes/row R). Loose for
        # fact joins (harmless: huge bound → downstream shuffles), but
        # TIGHT for dimension chains — nation⋈region stays provably
        # KB-sized, so a later join(strategy="auto") against it still
        # broadcasts instead of paying a full shuffle for a 100-row
        # side (the q05 star-join regression this fixes).
        lb, lr = self._est_bytes, self._est_rows
        rb, rr = other._est_bytes, other._est_rows
        est_bytes = est_rows = None
        if None not in (lb, lr, rb, rr) and lr > 0 and rr > 0:
            est_rows = lr * rr + lr + rr
            est_bytes = int(est_rows * (lb / lr + rb / rr))
        if strategy == "broadcast":
            out = Dataset(_broadcast_join(left_ds, right_ds, on, how))
        else:
            out = Dataset(
                _shuffle_join(left_ds, right_ds, on, how, num_buckets, salt)
            )
        out._est_bytes, out._est_rows = est_bytes, est_rows
        return out

    def asof_join(
        self,
        other: "Dataset",
        *,
        on: str,
        by: str | list[str],
        how: str = "left",
        suffix: str = RIGHT_SUFFIX,
    ) -> "Dataset":
        """As-of join: for each left row, the right row with the greatest
        ``on`` (timestamp) ≤ the left row's ``on``, within equal ``by``
        keys. Absent from the reference (its only joins are equi/semantic,
        ``join.py``); Ray Data lacks it too — composed here per SURVEY.md
        guidance as tag → union → ``groupby(by)`` cogroup with a
        vectorized ``searchsorted`` per group. Partitioning assumption:
        one ``by`` group fits in a task (same contract as ``map_groups``).

        ``how``: "left" keeps unmatched left rows (right cols null),
        "inner" drops them. Right-side column collisions get ``suffix``.
        """
        assert how in ("left", "inner"), how
        by = [by] if isinstance(by, str) else list(by)
        left_ds, right_ds = self._ds, other._ds
        # Resolve each side's schema ONCE on the driver. schema() on a
        # lazy transformed dataset executes a limit-1 run (~0.5-1s);
        # capturing a Dataset in the pad closures re-ran that inference
        # inside workers per task — it dominated this join's wall time.
        l_schema = _arrow_schema(left_ds)
        r_schema = _arrow_schema(right_ds)
        left_names = list(l_schema.names)
        right_names = list(r_schema.names)
        collisions = [c for c in right_names if c in left_names and c not in by]
        if collisions:
            right_ds = _rename(right_ds, {c: c + suffix for c in collisions})
            right_names = [c + suffix if c in collisions else c for c in right_names]
            r_schema = pa.schema(
                [
                    pa.field(c + suffix if c in collisions else c, f.type)
                    for c, f in zip(r_schema.names, r_schema)
                ]
            )
        r_on = on + suffix if on in collisions else on
        l_only = [c for c in left_names if c not in by]
        r_only = [c for c in right_names if c not in by]

        lt = left_ds.map_batches(
            lambda b: _pad_columns(b, r_only, r_schema).append_column(
                _JOIN_SIDE, pa.array(np.zeros(b.num_rows, dtype=np.int8))
            ).replace_schema_metadata(None),
            batch_format="pyarrow",
        )
        rt = right_ds.map_batches(
            lambda b: _pad_columns(b, l_only, l_schema).append_column(
                _JOIN_SIDE, pa.array(np.ones(b.num_rows, dtype=np.int8))
            ).replace_schema_metadata(None),
            batch_format="pyarrow",
        )
        both = lt.union(rt)
        out_names = list(dict.fromkeys(by + l_only + r_only))

        def _asof(group: pa.Table) -> pa.Table:
            g = group.combine_chunks()
            side = g[_JOIN_SIDE].to_numpy(zero_copy_only=False)
            lrows = g.filter(pa.array(side == 0)).select(by + l_only)
            rrows = g.filter(pa.array(side == 1)).select(by + r_only)
            empty = pa.table(
                {c: pa.nulls(0, g[c].type) for c in out_names}
            )
            if lrows.num_rows == 0:
                return empty
            if rrows.num_rows == 0:
                matched = lrows
                for c in r_only:
                    matched = matched.append_column(c, pa.nulls(lrows.num_rows, g[c].type))
                return matched.select(out_names) if how == "left" else empty
            rs = rrows.sort_by(r_on)
            r_ts = rs[r_on].cast(pa.int64()).to_numpy(zero_copy_only=False)
            l_ts = lrows[on].cast(pa.int64()).to_numpy(zero_copy_only=False)
            idx = np.searchsorted(r_ts, l_ts, side="right") - 1
            has = idx >= 0
            take_idx = pa.array(np.where(has, idx, 0), mask=~has)
            picked = rs.select(r_only).take(take_idx)
            out = lrows
            for c in r_only:
                out = out.append_column(c, picked[c])
            if how == "inner":
                out = out.filter(pa.array(has))
            return out.select(out_names)

        return Dataset(both.groupby(by).map_groups(_asof, batch_format="pyarrow"))

    def interval_join(
        self,
        other: "Dataset",
        *,
        on: str,
        between: tuple[str, str],
        by: str | list[str],
        how: str = "inner",
        suffix: str = RIGHT_SUFFIX,
    ) -> "Dataset":
        """Keyed interval join — the SCALE path next to the broadcast
        band-table :meth:`range_join` (both sides may be large; the
        interval side shuffles with the rows): pair each left row with EVERY right
        row whose ``[between[0], between[1]]`` interval contains the
        left row's ``on`` value, within equal ``by`` keys — SQL
        ``l.on BETWEEN r.start AND r.end`` (inclusive both ends; a NULL
        value or bound never matches). Absent from the reference and
        from Ray Data — composed per SURVEY.md guidance as tag → union
        → ``groupby(by)`` cogroup with a CHUNKED vectorized membership
        mask per group (memory O(chunk × n_right), never the full
        n_left × n_right bitmap). Partitioning assumption: one ``by``
        group fits in a task (same contract as ``asof_join``).

        ``how``: "inner" keeps matched pairs only; "left" also emits
        unmatched left rows with null right columns."""
        assert how in ("left", "inner"), how
        by = [by] if isinstance(by, str) else list(by)
        left_ds, right_ds = self._ds, other._ds
        l_schema = _arrow_schema(left_ds)
        r_schema = _arrow_schema(right_ds)
        left_names = list(l_schema.names)
        right_names = list(r_schema.names)
        collisions = [c for c in right_names if c in left_names and c not in by]
        if collisions:
            right_ds = _rename(right_ds, {c: c + suffix for c in collisions})
            right_names = [c + suffix if c in collisions else c for c in right_names]
            r_schema = pa.schema(
                [
                    pa.field(c + suffix if c in collisions else c, f.type)
                    for c, f in zip(r_schema.names, r_schema)
                ]
            )
        r_start = between[0] + suffix if between[0] in collisions else between[0]
        r_end = between[1] + suffix if between[1] in collisions else between[1]
        l_only = [c for c in left_names if c not in by]
        r_only = [c for c in right_names if c not in by]

        lt = left_ds.map_batches(
            lambda b: _pad_columns(b, r_only, r_schema).append_column(
                _JOIN_SIDE, pa.array(np.zeros(b.num_rows, dtype=np.int8))
            ).replace_schema_metadata(None),
            batch_format="pyarrow",
        )
        rt = right_ds.map_batches(
            lambda b: _pad_columns(b, l_only, l_schema).append_column(
                _JOIN_SIDE, pa.array(np.ones(b.num_rows, dtype=np.int8))
            ).replace_schema_metadata(None),
            batch_format="pyarrow",
        )
        both = lt.union(rt)
        out_names = list(dict.fromkeys(by + l_only + r_only))

        def _rj(group: pa.Table) -> pa.Table:
            g = group.combine_chunks()
            side = g[_JOIN_SIDE].to_numpy(zero_copy_only=False)
            lrows = g.filter(pa.array(side == 0)).select(by + l_only)
            rrows = g.filter(pa.array(side == 1)).select(by + r_only)
            empty = pa.table({c: pa.nulls(0, g[c].type) for c in out_names})
            if lrows.num_rows == 0:
                return empty
            if rrows.num_rows == 0:
                if how != "left":
                    return empty
                matched = lrows
                for c in r_only:
                    matched = matched.append_column(
                        c, pa.nulls(lrows.num_rows, g[c].type)
                    )
                return matched.select(out_names)
            lv = lrows[on].combine_chunks().to_numpy(zero_copy_only=False)
            rs = rrows[r_start].combine_chunks().to_numpy(zero_copy_only=False)
            re_ = rrows[r_end].combine_chunks().to_numpy(zero_copy_only=False)
            li_parts, ri_parts = [], []
            chunk = max(1, 4_000_000 // max(1, len(rs)))
            with np.errstate(invalid="ignore"):
                for i0 in range(0, len(lv), chunk):
                    sub = lv[i0 : i0 + chunk]
                    m = (sub[:, None] >= rs[None, :]) & (sub[:, None] <= re_[None, :])
                    li, ri = np.nonzero(m)
                    li_parts.append(li + i0)
                    ri_parts.append(ri)
            li = np.concatenate(li_parts)
            ri = np.concatenate(ri_parts)
            out = lrows.take(pa.array(li))
            picked = rrows.select(r_only).take(pa.array(ri))
            for c in r_only:
                out = out.append_column(c, picked[c])
            if how == "left":
                unmatched = np.setdiff1d(
                    np.arange(lrows.num_rows, dtype=np.int64), li
                )
                if len(unmatched):
                    extra = lrows.take(pa.array(unmatched))
                    for c in r_only:
                        extra = extra.append_column(
                            c, pa.nulls(len(unmatched), g[c].type)
                        )
                    out = pa.concat_tables([out, extra])
            return out.select(out_names)

        return Dataset(both.groupby(by).map_groups(_rj, batch_format="pyarrow"))

    def semi_join(
        self, other: "Dataset", on: str | list[str], *, strategy: str = "broadcast"
    ) -> "Dataset":
        """Keep rows whose key appears in ``other``.

        ``strategy="broadcast"`` (default): ship ``other``'s key set via
        ``ray.put`` once, vectorized ``is_in`` per batch — no shuffle;
        right for dimension-sized key sets. ``strategy="shuffle"``: when
        the key set itself is too big for one node, inner-join against
        ``other``'s distinct keys through the bucketed cogroup join —
        two keyed shuffles, nothing materializes on the driver.

        Null keys DIFFER between strategies: broadcast follows set-op
        semantics (null matches null, like SQL INTERSECT/EXCEPT, which
        ``intersect``/``except_`` rely on); shuffle follows equi-join
        semantics (null never matches, like SQL ``= ``). Filter null
        keys first if the distinction matters on the shuffle path."""
        on = [on] if isinstance(on, str) else list(on)
        if strategy == "shuffle":
            return self.join(
                other.project(on).distinct(), on=on, how="inner", strategy="shuffle"
            )
        return self._semi_anti(other, on, anti=False)

    def anti_join(
        self, other: "Dataset", on: str | list[str], *, strategy: str = "broadcast"
    ) -> "Dataset":
        """Keep rows whose key does NOT appear in ``other``. Strategies
        as in :meth:`semi_join`; the shuffle path left-joins a marker
        column onto ``other``'s distinct keys and keeps null-marker rows."""
        on = [on] if isinstance(on, str) else list(on)
        if strategy == "shuffle":
            marker = "__semi_m"
            keys = other.project(on).distinct().with_column(
                marker, lambda b: pa.array(np.ones(b.num_rows, dtype=np.int8))
            )
            joined = self.join(keys, on=on, how="left", strategy="shuffle")

            def _keep_unmatched(batch: pa.Table) -> pa.Table:
                return batch.filter(pc.is_null(batch[marker])).drop_columns([marker])

            return Dataset(
                joined._ds.map_batches(_keep_unmatched, batch_format="pyarrow")
            )
        return self._semi_anti(other, on, anti=True)

    def unpivot(
        self,
        id_cols: list[str],
        value_cols: list[str],
        var_name: str = "variable",
        value_name: str = "value",
        include_nulls: bool = False,
    ) -> "Dataset":
        """Wide→long reshape (melt): one output row per (input row,
        value column). Pure per-batch transform — one strip per value
        column, concatenated; no shuffle. Value columns are cast to a
        common type (unify order). Null-valued cells are DROPPED unless
        ``include_nulls`` — matching SQL ``UNPIVOT``'s default, so the
        q25 oracle stays exact on nullable columns."""
        if not value_cols:
            raise ValueError("value_cols must be non-empty")

        def _melt(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            ids = batch.select(id_cols)
            common = pa.unify_schemas(
                [pa.schema([pa.field("v", batch[c].type)]) for c in value_cols],
                promote_options="permissive",
            ).field("v").type
            strips = []
            for c in value_cols:
                t = ids.append_column(
                    var_name,
                    pa.DictionaryArray.from_arrays(
                        pa.array(np.zeros(n, dtype=np.int32)), pa.array([c])
                    ).cast(pa.string()),
                ).append_column(value_name, batch[c].cast(common))
                if not include_nulls:
                    t = t.filter(pc.is_valid(t[value_name]))
                strips.append(t)
            return pa.concat_tables(strips)

        return Dataset(self._ds.map_batches(_melt, batch_format="pyarrow"))

    def pivot(
        self,
        index: str | list[str],
        columns_from: str,
        values_from: str,
        categories: list[str],
        agg: str = "sum",
    ) -> "Dataset":
        """Long→wide reshape: one output column per ``categories`` value,
        aggregated with ``agg`` (sum/count/min/max) per ``index`` group.
        ``categories`` must be EXPLICIT — discovering them would need a
        full pass before the plan exists; at 100 TB the category set is
        metadata the caller already has. Output columns are named
        ``{values_from}_{category}``.

        Implementation: vectorized masked projection per batch (value
        where category matches, else null) then ONE ordinary groupby
        aggregate — the pivot itself adds no shuffle."""
        from ray.data.aggregate import Count, Max, Min, Sum

        index = [index] if isinstance(index, str) else list(index)
        aggs_cls = {"sum": Sum, "count": Count, "min": Min, "max": Max}
        if agg not in aggs_cls:
            raise ValueError(f"agg must be one of {sorted(aggs_cls)}")

        out_cols = {c: f"{values_from}_{c}" for c in categories}

        def _mask(batch: pa.Table) -> pa.Table:
            cols = {c: batch[c] for c in index}
            v = batch[values_from]
            tags = batch[columns_from]
            for cat, name in out_cols.items():
                cols[name] = pc.if_else(
                    pc.equal(tags, pa.scalar(cat)), v, pa.nulls(batch.num_rows, v.type)
                )
            return pa.table(cols)

        masked = self._ds.map_batches(_mask, batch_format="pyarrow")
        cls = aggs_cls[agg]
        aggs = [
            cls(name, alias_name=name, ignore_nulls=True)
            if agg == "count"
            else cls(name, alias_name=name)
            for name in out_cols.values()
        ]
        return Dataset(masked.groupby(index).aggregate(*aggs))

    def top_n_per_group(
        self,
        keys: str | list[str],
        n: int,
        order_by: list[tuple[str, str]],
        rank_col: str | None = None,
    ) -> "Dataset":
        """Analytic top-n per group (``row_number() over (partition by
        keys order by ...) <= n``), absent from both the reference and
        Ray Data. Two stages: a map-side combiner keeps ≤n rows per key
        per block BEFORE the shuffle (so a hot key ships n rows per
        block, not its whole group), then ``groupby(keys).map_groups``
        finishes and optionally emits the 1-based ``rank_col``.
        ``order_by`` must be deterministic (include a tiebreaker) for
        reproducible ranks."""
        from palimpzest_ray.functions.tokens import top_n_per_key

        keys = [keys] if isinstance(keys, str) else list(keys)
        order = list(order_by)

        def _combine(batch: pa.Table) -> pa.Table:
            return top_n_per_key(batch, keys, order, n)

        def _finish(group: pa.Table) -> pa.Table:
            return top_n_per_key(group, keys, order, n, rank_col=rank_col)

        ds = self._ds.map_batches(_combine, batch_format="pyarrow")
        return Dataset(ds.groupby(keys).map_groups(_finish, batch_format="pyarrow"))

    def window_shift(
        self,
        col: str,
        periods: int = 1,
        *,
        by: str | list[str],
        order: str | list[str],
        out: str | None = None,
        null_safe: bool = False,
    ) -> "Dataset":
        """SQL ``LAG`` (``periods`` > 0) / ``LEAD`` (``periods`` < 0)
        within ``by``-groups ordered by ``order``: adds column ``out``
        (default ``{col}_lag{p}`` / ``{col}_lead{p}``) holding the value
        ``periods`` rows back/ahead, null at group edges. Absent from
        both the reference and Ray Data; one keyed shuffle, vectorized
        sort+take per group (null-masked indices — no pandas NaN
        promotion, int columns stay int). ``order`` must be unique
        within a group for deterministic output. Partitioning
        assumption: one ``by`` group fits in a task."""
        assert periods != 0, "periods must be nonzero (positive=lag, negative=lead)"
        by = [by] if isinstance(by, str) else list(by)
        order = [order] if isinstance(order, str) else list(order)
        name = out or f"{col}_{'lag' if periods > 0 else 'lead'}{abs(periods)}"

        def _shift(group: pa.Table) -> pa.Table:
            idx = pc.sort_indices(group, sort_keys=[(o, "ascending") for o in order])
            g = group.take(idx)
            n = g.num_rows
            src = np.arange(n, dtype=np.int64) - periods
            mask = (src < 0) | (src >= n)
            take_idx = pa.array(np.clip(src, 0, max(n - 1, 0)), mask=mask)
            return g.append_column(name, g[col].take(take_idx))

        return GroupedDataset(self._ds, by, null_safe=null_safe).map_groups(
            _shift, batch_format="pyarrow"
        )

    def window_cum(
        self,
        col: str,
        kind: str = "sum",
        *,
        by: str | list[str],
        order: str | list[str],
        out: str | None = None,
        n: int | None = None,
        null_safe: bool = False,
    ) -> "Dataset":
        """Running window aggregate per group, SQL ``<agg>(col) OVER
        (PARTITION BY by ORDER BY order ROWS UNBOUNDED PRECEDING)``:
        ``kind`` ∈ sum / max / min / avg / count / row_number / rank /
        dense_rank / percent_rank / cume_dist / ntile / first_value /
        last_value (the ranking/distribution kinds ignore ``col``'s
        values and rank on the ``order`` tuple itself, with SQL tie
        semantics; ``ntile`` needs ``n``; ``first_value`` is the
        partition's first value under the default SQL frame, and
        ``last_value`` uses the full-partition frame — ROWS UNBOUNDED
        PRECEDING AND UNBOUNDED FOLLOWING — since the default frame
        makes it degenerately equal to the current row).
        Vectorized numpy accumulate per group; null values propagate
        into the running result (pass a null-free measure, as SQL's
        null-skipping running agg isn't replicated). Same determinism
        and partitioning contract as :meth:`window_shift`."""
        return self.window([(kind, col, out, n)], by=by, order=order, null_safe=null_safe)

    def window(
        self,
        specs: list[tuple],
        *,
        by: str | list[str],
        order: str | list[str],
        null_safe: bool = False,
        strategy: str = "auto",
        num_buckets: int = 64,
    ) -> "Dataset":
        """N window functions over the SAME partition key in ONE keyed
        shuffle (vs N shuffles for N chained :meth:`window_cum` calls —
        the scale rule "pick one partitioning key and reuse it").

        ``specs``: list of ``(kind, col, out[, n[, order_override]])``
        tuples; ``order_override`` lets a spec sort differently within
        the shared partition (results are inverse-permuted back, so all
        output columns stay row-aligned). Kinds and semantics as in
        :meth:`window_cum`.

        ``strategy``: ``"groups"`` = one ``map_groups`` task per
        partition-key group (fine when there are many groups — q28's
        ``by=l_orderkey``); ``"bucketed"`` = the range-bucketed
        distributed prefix sum (same bounded-driver-state shape as
        stages/packing.py:139 / stages/mixing.py:33) for LOW-cardinality
        keys, where one group would otherwise materialize in a single
        task (q106's ``by="source"`` holds ~a quarter of the corpus per
        group at 100 TB); ``"auto"`` (default) pins the input once and
        probes the key cardinality — ≤ ``_WINDOW_LOW_CARD`` distinct
        groups, every spec carryable AND an average group bigger than
        a sane task's heap (``_WINDOW_BUCKETED_MIN_GROUP_BYTES``, ~1
        GiB in-memory) → bucketed, else groups (a megabyte-scale group
        per task is both fine and faster — measured 2.7x at 16M narrow
        rows; force ``strategy="bucketed"`` to override).
        Bucketed supports kinds sum/count/avg/min/max/row_number/rank/
        percent_rank/cume_dist/ntile with a shared ``order`` (no
        per-spec override) and non-null order keys — the ranking kinds
        carry on counts alone because full-tuple ties never straddle
        order-range buckets; dense_rank (needs distinct counts, which
        don't fold map-side) and first/last_value (need value lookups)
        fall back to groups."""
        by = [by] if isinstance(by, str) else list(by)
        order = [order] if isinstance(order, str) else list(order)
        norm: list[tuple] = []
        for spec in specs:
            kind, col, out = spec[0], spec[1], spec[2] if len(spec) > 2 else None
            k = spec[3] if len(spec) > 3 else None
            sp_order = spec[4] if len(spec) > 4 else None
            assert kind in _WINDOW_KINDS, kind
            if kind == "ntile":
                assert k is not None and k >= 1, "ntile needs n >= 1"
            ranking = kind in (
                "row_number", "rank", "dense_rank", "percent_rank",
                "cume_dist", "ntile",
            )
            if not out:
                if ranking:
                    out = kind
                elif kind in ("first_value", "last_value"):
                    out = f"{col}_{kind}"
                else:
                    out = f"{col}_cum{kind}"
            if sp_order is None:
                sp_order = order
            elif isinstance(sp_order, str):
                sp_order = [sp_order]
            norm.append((kind, col, out, k, list(sp_order)))

        assert strategy in ("auto", "groups", "bucketed"), strategy
        carryable = all(
            kind in _WINDOW_BUCKETED_KINDS and sp_order == order
            for kind, _c, _o, _k, sp_order in norm
        )
        src = self
        auto = strategy == "auto"
        if auto:
            if null_safe or not carryable:
                strategy = "groups"
            else:
                src, strategy, _ng = self._window_low_card_probe(by, order)
        if strategy == "bucketed":
            if not carryable:
                raise ValueError(
                    "strategy='bucketed' supports kinds "
                    f"{_WINDOW_BUCKETED_KINDS} with the shared order only"
                )
            try:
                return src._window_bucketed(norm, by, order, num_buckets)
            except (ValueError, ray.exceptions.RayTaskError):
                # ADVICE r4: the bucket tagger raises task-side, which
                # surfaces as RayTaskError (the ValueError dual-wrap is
                # version-dependent) — catch both. Null order keys are
                # bucketed-supported since r5 (NULLS-LAST bucket), so
                # this fallback now guards only the nested-order-type-
                # with-nulls case the probe's prefix cannot prove.
                if not auto:  # explicit ask: surface the contract error
                    raise

        def _win(group: pa.Table) -> pa.Table:
            cache: dict[tuple, tuple] = {}
            for kind, col, out, k, sp_order, in norm:
                key = tuple(sp_order)
                if key not in cache:
                    idx = pc.sort_indices(
                        group, sort_keys=[(o, "ascending") for o in sp_order]
                    )
                    idx_np = idx.to_numpy(zero_copy_only=False).astype(np.int64)
                    inv = np.empty(len(idx_np), dtype=np.int64)
                    inv[idx_np] = np.arange(len(idx_np), dtype=np.int64)
                    cache[key] = (group.take(idx), pa.array(inv))
                g, inv = cache[key]
                res = _window_kind_values(g, kind, col, sp_order, k)
                group = group.append_column(out, res.take(inv))
            return group

        return GroupedDataset(src._ds, by, null_safe=null_safe).map_groups(
            _win, batch_format="pyarrow"
        )

    def _window_low_card_probe(
        self, by: list[str], order: list[str]
    ) -> tuple["Dataset", str, int]:
        """Decide groups vs bucketed: >LOW_CARD distinct keys in a 64k
        prefix proves high cardinality without a shuffle OR a pin
        (q28's by=l_orderkey short-circuits here and streams straight
        into the groupby — the prefix probe re-executes 64k rows of
        lineage, which is cheaper than pinning everything); only a
        low-card-looking prefix materializes and pays the exact narrow
        count. Null order keys are bucketed-safe since r5 (they route
        to a dedicated NULLS-LAST bucket, matching the groups path's
        null-tie ranking) — only a null on a NESTED order type, which
        the fill-copy trick cannot expand, forces groups here. Returns
        (possibly-pinned src, strategy, n_groups or -1)."""
        first_o = order[0]
        head = self._ds.select_columns(
            list(dict.fromkeys([*by, first_o]))
        ).limit(65536).take_all()
        distinct = len({tuple(r[c] for c in by) for r in head})
        if distinct > _WINDOW_LOW_CARD:
            return self, "groups", -1
        has_null_order = any(
            r[first_o] is None
            or (isinstance(r[first_o], float) and r[first_o] != r[first_o])
            for r in head
        )
        if has_null_order:
            t = _arrow_schema(self._ds).field(first_o).type
            if _null_sentinel(t) is None:
                return self, "groups", -1
        # prefix distinct is a LOWER bound on n_groups, so
        # size/distinct is an UPPER bound on bytes/group: when even
        # that bound is under the threshold, groups is safe without
        # pinning or counting anything (the 16M-narrow-rows case — a
        # full groupby count here cost more than the window itself)
        est = _estimate_bytes(self._ds)
        lo_groups = max(distinct, 1)
        if (
            est is not None
            and est // lo_groups < _WINDOW_BUCKETED_MIN_GROUP_BYTES
        ):
            return self, "groups", -1
        # pin once — the probes and the window both read it
        src = Dataset(self._ds.materialize())
        size = src._ds.size_bytes() or 0
        if size // lo_groups < _WINDOW_BUCKETED_MIN_GROUP_BYTES:
            return src, "groups", -1
        n_groups = src._ds.groupby(by).count().count()
        big_groups = (
            0 < n_groups <= _WINDOW_LOW_CARD
            and size // n_groups >= _WINDOW_BUCKETED_MIN_GROUP_BYTES
        )
        return src, ("bucketed" if big_groups else "groups"), n_groups

    def _window_bucketed(
        self,
        norm: list[tuple],
        by: list[str],
        order: list[str],
        num_buckets: int,
        debug: dict | None = None,
    ) -> "Dataset":
        """Distributed running windows for low-cardinality partition
        keys: range-bucket the ORDER key (bounded value sample →
        quantile bounds; rows with equal order keys share a bucket, so
        the global sort order is bucket-major AND full-tuple ties never
        straddle buckets — which is why the ranking kinds carry on
        counts alone), fold per-(bucket, group) partial aggregates
        MAP-SIDE (pyarrow group_by per batch, driver folds the tiny
        partial rows — no second shuffle), cumsum the partials into
        exclusive carry-ins, then the ONE keyed shuffle finishes each
        (bucket, group) slice locally with the carry added. Work per
        task is ~n/(buckets × groups) rows; driver state is the carry
        table only."""
        mat = self._ds.materialize()
        n = mat.count()
        if n == 0:  # same shape as the groups path on empty input
            return Dataset(mat)
        wide, nb = _bucket_by_order(mat, n, order[0], num_buckets)

        # map-side partials: per-batch (bucket, group) count/sum/min/max
        # — a few tiny rows per batch; the driver folds them. No shuffle.
        # Only the VALUE kinds contribute measure columns (the ranking
        # kinds carry a col slot they never read — q38 passes a DATE
        # there, which sum/min/max partials must not touch).
        cols = sorted({
            c for k_, c, *_ in norm
            if c is not None and k_ in ("sum", "avg", "min", "max")
        })
        gb_aggs = [("_bucket", "count")] + [
            (c, f) for c in cols for f in ("sum", "min", "max")
        ]

        def _partial(batch: pa.Table) -> pa.Table:
            return batch.group_by(["_bucket", *by]).aggregate(gb_aggs)

        partial_tab = pa.concat_tables(
            wide.map_batches(_partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=65536
            ),
            promote_options="permissive",
        )
        fold = partial_tab.group_by(["_bucket", *by]).aggregate(
            [("_bucket_count", "sum")]
            + [(f"{c}_{f}", f if f != "sum" else "sum")
               for c in cols for f in ("sum", "min", "max")]
        )
        rows = fold.sort_by("_bucket").to_pylist()
        carry: dict[tuple, dict] = {}
        run: dict[tuple, dict] = {}
        for r in rows:
            g = tuple(r[c] for c in by)
            acc = run.setdefault(
                g,
                {"n": 0, **{c: {"s": 0, "lo": None, "hi": None}
                            for c in cols}},
            )
            carry[(r["_bucket"], g)] = {
                "n": acc["n"],
                **{c: dict(acc[c]) for c in cols},
            }
            acc["n"] += r["_bucket_count_sum"]
            for c in cols:
                v = r.get(f"{c}_sum_sum")
                if v is not None:
                    acc[c]["s"] += v
                lo, hi = r.get(f"{c}_min_min"), r.get(f"{c}_max_max")
                if lo is not None:
                    acc[c]["lo"] = (
                        lo if acc[c]["lo"] is None else min(acc[c]["lo"], lo)
                    )
                if hi is not None:
                    acc[c]["hi"] = (
                        hi if acc[c]["hi"] is None else max(acc[c]["hi"], hi)
                    )
        totals = {g: acc["n"] for g, acc in run.items()}

        # extras pass (only when a kind needs it): dense_rank needs the
        # count of DISTINCT order tuples in prior buckets (distinct
        # counts ADD exactly across buckets — tuples never straddle),
        # first/last_value need one value per group. One NARROW shuffle
        # of order + needed value columns, nb × groups tiny rows back.
        dense_needed = any(k_ == "dense_rank" for k_, *_ in norm)
        fl_cols = sorted({
            c for k_, c, *_ in norm
            if k_ in ("first_value", "last_value") and c is not None
        })
        dense_carry: dict[tuple, int] = {}
        group_first: dict[tuple, dict] = {}
        group_last: dict[tuple, dict] = {}
        if dense_needed or fl_cols:
            sel = list(dict.fromkeys(
                ["_bucket", *by, *order] + fl_cols
            ))

            def _extra(g: pa.Table) -> pa.Table:
                idx_ = pc.sort_indices(
                    g, sort_keys=[(o, "ascending") for o in order]
                )
                t_ = g.take(idx_)
                m_ = t_.num_rows
                flag = np.zeros(m_, dtype=bool)
                if m_:
                    flag[0] = True
                for o in order:
                    a = t_[o].to_numpy(zero_copy_only=False)
                    neq = a[1:] != a[:-1]
                    if a.dtype.kind == "f":
                        neq &= ~(np.isnan(a[1:]) & np.isnan(a[:-1]))
                    elif a.dtype.kind in "Mm":
                        neq &= ~(np.isnat(a[1:]) & np.isnat(a[:-1]))
                    flag[1:] |= neq
                row = {
                    "_bucket": t_["_bucket"].slice(0, 1),
                    **{c: t_[c].slice(0, 1) for c in by},
                    "__nd": pa.array([int(flag.sum())], pa.int64()),
                }
                for c in fl_cols:
                    row[f"__first_{c}"] = t_[c].slice(0, 1)
                    row[f"__last_{c}"] = t_[c].slice(m_ - 1, 1)
                return pa.table(row)

            extra_rows = (
                wide.map_batches(
                    lambda b: b.select(sel), batch_format="pyarrow"
                )
                .groupby(["_bucket", *by])
                .map_groups(_extra, batch_format="pyarrow")
                .take_all()
            )
            extra_rows.sort(key=lambda r: r["_bucket"])
            run_nd: dict[tuple, int] = {}
            for r in extra_rows:
                g = tuple(r[c] for c in by)
                dense_carry[(r["_bucket"], g)] = run_nd.get(g, 0)
                run_nd[g] = run_nd.get(g, 0) + r["__nd"]
                if g not in group_first:
                    group_first[g] = {
                        c: r[f"__first_{c}"] for c in fl_cols
                    }
                group_last[g] = {c: r[f"__last_{c}"] for c in fl_cols}

        if debug is not None:  # test seam: the decomposition, observable
            debug["n_buckets"] = nb
            debug["n_slices"] = len(carry)
            by_slice: dict[tuple, int] = {}
            for r in rows:
                k = (r["_bucket"], tuple(r[c] for c in by))
                by_slice[k] = by_slice.get(k, 0) + r["_bucket_count_sum"]
            debug["max_slice_rows"] = max(by_slice.values(), default=0)

        def _finish(group: pa.Table) -> pa.Table:
            bucket = group["_bucket"][0].as_py()
            g = tuple(group[c][0].as_py() for c in by)
            cin = carry[(bucket, g)]
            n_tot = totals[g]
            idx = pc.sort_indices(
                group, sort_keys=[(o, "ascending") for o in order]
            )
            gt = group.take(idx)
            m = gt.num_rows
            pos1 = np.arange(1, m + 1, dtype=np.int64) + cin["n"]
            rank_cache: np.ndarray | None = None

            def _local_flags() -> np.ndarray:
                flag = np.zeros(m, dtype=bool)
                if m:
                    flag[0] = True
                for o in order:
                    a = gt[o].combine_chunks().to_numpy(
                        zero_copy_only=False
                    )
                    neq = a[1:] != a[:-1]
                    if a.dtype.kind == "f":
                        neq &= ~(np.isnan(a[1:]) & np.isnan(a[:-1]))
                    elif a.dtype.kind in "Mm":
                        neq &= ~(np.isnat(a[1:]) & np.isnat(a[:-1]))
                    flag[1:] |= neq
                return flag

            for kind, col, out, k, _o in norm:
                if kind in ("row_number", "count"):
                    res = pa.array(pos1)
                elif kind in ("rank", "percent_rank", "cume_dist"):
                    # full-tuple ties are bucket-co-located, so every
                    # prior-bucket row is strictly smaller: global rank
                    # = prior count + slice-local rank
                    flag = _local_flags()
                    if kind == "cume_dist":
                        gid = np.cumsum(flag) - 1
                        ends = np.cumsum(np.bincount(
                            gid, minlength=(gid[-1] + 1) if m else 0
                        ))
                        res = pa.array(
                            (cin["n"] + ends[gid]).astype(np.float64)
                            / n_tot
                        )
                    else:
                        pos = np.where(
                            flag, np.arange(m, dtype=np.int64), 0
                        )
                        rnk = np.maximum.accumulate(pos) + 1 + cin["n"]
                        if kind == "percent_rank":
                            res = pa.array(
                                (rnk - 1) / (n_tot - 1) if n_tot > 1
                                else np.zeros(m)
                            )
                        else:
                            res = pa.array(rnk)
                elif kind == "dense_rank":
                    flag = _local_flags()
                    res = pa.array(
                        np.cumsum(flag).astype(np.int64)
                        + dense_carry[(bucket, g)]
                    )
                elif kind in ("first_value", "last_value"):
                    src_v = (
                        group_first if kind == "first_value"
                        else group_last
                    )[g][col]
                    res = pa.array([src_v] * m, type=gt[col].type)
                elif kind == "ntile":
                    pos0 = pos1 - 1
                    q_, r_ = divmod(n_tot, k)
                    if q_ == 0:
                        res = pa.array(pos0 + 1)
                    else:
                        big = r_ * (q_ + 1)
                        res = pa.array(np.where(
                            pos0 < big, pos0 // (q_ + 1) + 1,
                            r_ + (pos0 - big) // q_ + 1,
                        ).astype(np.int64))
                else:
                    vals = gt[col].combine_chunks().to_numpy(
                        zero_copy_only=False
                    )
                    if kind == "sum":
                        res = pa.array(np.cumsum(vals) + cin[col]["s"])
                    elif kind == "avg":
                        res = pa.array(
                            (np.cumsum(vals.astype(np.float64))
                             + float(cin[col]["s"]))
                            / pos1.astype(np.float64)
                        )
                    elif kind == "min":
                        acc_v = np.minimum.accumulate(vals)
                        if cin[col]["lo"] is not None:
                            acc_v = np.minimum(acc_v, cin[col]["lo"])
                        res = pa.array(acc_v)
                    else:  # max
                        acc_v = np.maximum.accumulate(vals)
                        if cin[col]["hi"] is not None:
                            acc_v = np.maximum(acc_v, cin[col]["hi"])
                        res = pa.array(acc_v)
                gt = gt.append_column(out, res)
            return gt.drop_columns(["_bucket"])

        return Dataset(
            wide.groupby(["_bucket", *by]).map_groups(
                _finish, batch_format="pyarrow"
            )
        )

    def window_rolling(
        self,
        col: str,
        kind: str = "sum",
        *,
        window: int,
        by: str | list[str],
        order: str | list[str],
        out: str | None = None,
        null_safe: bool = False,
        strategy: str = "auto",
        num_buckets: int = 64,
    ) -> "Dataset":
        """Moving-frame window aggregate, SQL ``<agg>(col) OVER
        (PARTITION BY by ORDER BY order ROWS BETWEEN window-1 PRECEDING
        AND CURRENT ROW)``: ``kind`` ∈ sum / avg / min / max / count.
        Head rows see a shrinking frame, exactly as SQL. Vectorized per
        group: sum/avg via prefix-sum differences, min/max via a
        ``sliding_window_view`` reduction — no Python row loop. Null
        handling as :meth:`window_cum` (pass a null-free measure).

        ``strategy`` as in :meth:`window`: low-cardinality partition
        keys route to the bucketed distributed path — each task sees
        one order-range slice plus the previous buckets' last ``w-1``
        NARROW rows as carry (order + measure columns only, folded
        from map-side per-batch tail candidates; driver state is
        buckets × groups × (w-1) narrow rows, guarded ≤ 4M) — instead
        of materializing a whole group per task."""
        assert kind in ("sum", "avg", "min", "max", "count"), kind
        assert window >= 1, "window must be >= 1 rows"
        by = [by] if isinstance(by, str) else list(by)
        order = [order] if isinstance(order, str) else list(order)
        name = out or f"{col}_roll{kind}{window}"
        w = int(window)
        assert strategy in ("auto", "groups", "bucketed"), strategy

        src = self
        auto = strategy == "auto"
        if auto:
            if null_safe or w > _ROLL_BUCKETED_MAX_WINDOW:
                strategy = "groups"
            else:
                src, strategy, n_groups = self._window_low_card_probe(
                    by, order
                )
                if strategy == "bucketed":
                    # driver carry memory: nb x groups x (w-1) narrow
                    # tail rows must stay small
                    n_rows = src._ds.count()
                    nb_est = max(num_buckets, min(4096, n_rows // 2_000_000))
                    if nb_est * n_groups * (w - 1) > 4_000_000:
                        strategy = "groups"
        if strategy == "bucketed":
            try:
                return src._window_rolling_bucketed(
                    col, kind, w, by, order, name, num_buckets
                )
            except (ValueError, ray.exceptions.RayTaskError):
                # see window(): task-side tagger errors arrive wrapped
                if not auto:
                    raise

        def _roll(group: pa.Table) -> pa.Table:
            idx = pc.sort_indices(group, sort_keys=[(o, "ascending") for o in order])
            g = group.take(idx)
            n = g.num_rows
            vals = (
                None if kind == "count"
                else g[col].combine_chunks().to_numpy(zero_copy_only=False)
            )
            return g.append_column(
                name, pa.array(_rolling_kernel(vals, n, kind, w))
            )

        return GroupedDataset(src._ds, by, null_safe=null_safe).map_groups(
            _roll, batch_format="pyarrow"
        )

    def _window_rolling_bucketed(
        self,
        col: str,
        kind: str,
        w: int,
        by: list[str],
        order: list[str],
        out: str,
        num_buckets: int,
        debug: dict | None = None,
    ) -> "Dataset":
        """Distributed rolling windows for low-cardinality keys: the
        running-agg trick doesn't apply (a moving frame forgets), so
        each (bucket, group) slice instead receives the previous
        buckets' last ``w-1`` rows as a NARROW carry (order + measure
        columns only — the token payload never travels) and computes
        the shared :func:`_rolling_kernel` over carry+slice, keeping
        the slice's outputs. Carry construction is map-side: per batch,
        per (bucket, group), the last ``w-1`` rows by order are tail
        CANDIDATES (top-k is mergeable); the driver folds candidates
        streaming and cumulates them bucket-major — prior buckets'
        rows are all strictly earlier in order, so the cumulative tail
        is concat-then-keep-last."""
        mat = self._ds.materialize()
        n = mat.count()
        if n == 0:
            return Dataset(mat)
        wide, nb = _bucket_by_order(mat, n, order[0], num_buckets)
        tail_k = w - 1
        need_vals = kind != "count"
        narrow = list(dict.fromkeys(
            ["_bucket", *by, *order] + ([col] if need_vals else [])
        ))

        # exact per-(bucket, group) tails via a NARROW shuffle (order +
        # measure columns only — the wide payload shuffles once, for
        # the finish pass; a map-side candidate scheme degenerates when
        # input batches are unsorted: every short run is a candidate
        # and the whole dataset streams to the driver)
        def _tail_group(g: pa.Table) -> pa.Table:
            idx = pc.sort_indices(
                g, sort_keys=[(o, "ascending") for o in order]
            )
            m = g.num_rows
            return g.take(idx).slice(max(0, m - tail_k), m)

        buf: dict[tuple, list] = {}
        if tail_k:
            tail_rows = (
                wide.map_batches(
                    lambda b: b.select(narrow), batch_format="pyarrow"
                )
                .groupby(["_bucket", *by])
                .map_groups(_tail_group, batch_format="pyarrow")
                .take_all()
            )
            for r in tail_rows:
                key = (r["_bucket"], tuple(r[c] for c in by))
                buf.setdefault(key, []).append((
                    tuple(r[o] for o in order),
                    r[col] if need_vals else None,
                ))
            # NULLS LAST, matching sort_indices' at_end placement —
            # a raw tuple sort would TypeError on None vs value
            for lst in buf.values():
                lst.sort(key=lambda t: tuple(
                    (v is None, 0 if v is None else v) for v in t[0]
                ))

        # cumulate bucket-major: carry[(b, g)] = last tail_k rows of
        # ALL buckets < b (prior rows are strictly earlier in order)
        carry: dict[tuple, tuple] = {}
        running: dict[tuple, list] = {}
        # bucket-ascending is the only order that matters (cumulation
        # is per group); sorting full keys would compare group tuples,
        # which crashes on a null group key next to strings
        for (bucket, g) in sorted(buf, key=lambda k: k[0]):
            prior = running.get(g, [])
            carry[(bucket, g)] = (
                len(prior),
                np.array([v for _o, v in prior]) if need_vals else None,
            )
            merged = prior + buf[(bucket, g)]
            running[g] = merged[-tail_k:] if tail_k else []

        if debug is not None:
            debug["n_buckets"] = nb
            debug["n_slices"] = len(buf) if tail_k else -1
            debug["carry_rows"] = sum(len(v) for v in running.values())

        def _fin(group: pa.Table) -> pa.Table:
            bucket = group["_bucket"][0].as_py()
            g = tuple(group[c][0].as_py() for c in by)
            t_len, t_vals = carry.get((bucket, g), (0, None))
            idx = pc.sort_indices(
                group, sort_keys=[(o, "ascending") for o in order]
            )
            gt = group.take(idx)
            m = gt.num_rows
            if need_vals:
                vals = gt[col].combine_chunks().to_numpy(
                    zero_copy_only=False
                )
                cat = (
                    np.concatenate([t_vals.astype(vals.dtype), vals])
                    if t_len else vals
                )
            else:
                cat = None
            res = _rolling_kernel(cat, t_len + m, kind, w)[t_len:]
            return gt.append_column(out, pa.array(res)).drop_columns(
                ["_bucket"]
            )

        return Dataset(
            wide.groupby(["_bucket", *by]).map_groups(
                _fin, batch_format="pyarrow"
            )
        )

    def window_rolling_time(
        self,
        col: str,
        kind: str = "sum",
        *,
        interval: str,
        by: str | list[str],
        ts: str,
        out: str | None = None,
        null_safe: bool = False,
    ) -> "Dataset":
        """TIME-based moving frame, SQL ``<agg>(col) OVER (PARTITION BY
        by ORDER BY ts RANGE BETWEEN <interval> PRECEDING AND CURRENT
        ROW)``: ``kind`` ∈ sum / avg / count / min / max. SQL RANGE
        semantics exactly — the frame covers every row whose timestamp
        lies in ``[ts - interval, ts]``, INCLUDING later peer rows that
        share the current timestamp, and null measure values are
        SKIPPED (an all-null frame yields null; ``count`` counts
        non-null values). Vectorized per group: both frame edges come
        from ``searchsorted`` over the sorted epoch array; sum / avg /
        count from prefix-sum differences over null-masked values,
        min / max from a sparse-table range query (``_range_reduce``,
        integer dtypes preserved) — variable-width frames with no row
        loop. ``ts`` values are truncated to microseconds; the interval
        must be an exact microsecond multiple.

        Partitioning contract: one ``by`` group fits in a task (no
        bucketed path here — a RANGE frame's carry is every prior row
        within ``interval`` of the bucket boundary, which is bounded by
        data DENSITY, not row count, so a narrow carry cannot be
        guaranteed; pre-bucket by a coarser time column and
        :meth:`union` when a group outgrows a task)."""
        assert kind in ("sum", "avg", "count", "min", "max"), kind
        by = [by] if isinstance(by, str) else list(by)
        td = pd.Timedelta(interval)
        assert td.value % 1000 == 0, (
            f"interval {interval!r} has sub-microsecond precision; "
            "timestamps are compared at microsecond resolution"
        )
        delta_us = int(td.value // 1000)
        assert delta_us >= 0, "interval must be non-negative"
        name = out or f"{col}_roll_{kind}_{interval.replace(' ', '')}"

        def _roll_t(group: pa.Table) -> pa.Table:
            idx = pc.sort_indices(group, sort_keys=[(ts, "ascending")])
            g = group.take(idx)
            # safe=False: ns-precision inputs truncate to µs (documented)
            t = pc.cast(
                pc.cast(g[ts], pa.timestamp("us"), safe=False), pa.int64()
            ).to_numpy(zero_copy_only=False)
            start = np.searchsorted(t, t - delta_us, side="left")
            end = np.searchsorted(t, t, side="right")  # last peer inclusive
            vcol = g[col].combine_chunks()
            valid = np.asarray(
                pc.is_valid(vcol).to_numpy(zero_copy_only=False), dtype=bool
            )
            vcum = np.concatenate([[0], np.cumsum(valid)])
            nvalid = (vcum[end] - vcum[start]).astype(np.int64)
            empty = nvalid == 0
            if kind == "count":
                res = pa.array(nvalid)
            elif kind in ("min", "max"):
                vals = vcol.to_numpy(zero_copy_only=False)
                red = np.minimum if kind == "min" else np.maximum
                if valid.all() and np.issubdtype(vals.dtype, np.integer):
                    r = _range_reduce(vals, start, end, red)  # exact ints
                else:
                    f = vals.astype(np.float64)  # nulls already NaN
                    fill = np.inf if kind == "min" else -np.inf
                    f = np.where(valid, f, fill)
                    r = _range_reduce(f, start, end, red)
                res = pa.array(r, mask=empty) if empty.any() else pa.array(r)
            else:
                vals = vcol.to_numpy(zero_copy_only=False).astype(np.float64)
                vals = np.where(valid, vals, 0.0)  # SQL skips null measures
                cs = np.concatenate([[0.0], np.cumsum(vals)])
                s = cs[end] - cs[start]
                if kind == "avg":
                    r = s / np.where(empty, 1, nvalid)
                else:
                    r = s
                res = pa.array(r, mask=empty) if empty.any() else pa.array(r)
            return g.append_column(name, res)

        return GroupedDataset(self._ds, by, null_safe=null_safe).map_groups(
            _roll_t, batch_format="pyarrow"
        )

    def intersect(self, other: "Dataset", *, strategy: str = "broadcast") -> "Dataset":
        """SQL ``INTERSECT``: distinct rows of ``self`` present in
        ``other`` (set semantics over all columns — NULLs compare
        EQUAL, unlike ``=``). Built from the engine's own primitives —
        distinct (hash-partitioned keep-first) + semi-join on the full
        column tuple. ``strategy="broadcast"`` for an ``other`` whose
        distinct rows fit one node; ``strategy="shuffle"`` keeps both
        sides distributed (nullable flat columns are expanded into
        (filled, is_null) pairs so null==null survives the equi-join
        shuffle, which follows SQL ``=`` semantics; nested columns
        can't be expanded — their nulls won't match on this path)."""
        if strategy == "shuffle":
            return self._null_safe_set_op(other, anti=False)
        cols = [f.name for f in _arrow_schema(self._ds)]
        return self.distinct().semi_join(other, on=cols, strategy=strategy)

    def except_(self, other: "Dataset", *, strategy: str = "broadcast") -> "Dataset":
        """SQL ``EXCEPT``: distinct rows of ``self`` absent from
        ``other``. Same construction (and strategy/NULL notes) as
        :meth:`intersect`, with the anti-join."""
        if strategy == "shuffle":
            return self._null_safe_set_op(other, anti=True)
        cols = [f.name for f in _arrow_schema(self._ds)]
        return self.distinct().anti_join(other, on=cols, strategy=strategy)

    def _null_safe_set_op(self, other: "Dataset", anti: bool) -> "Dataset":
        """Shuffle-path INTERSECT/EXCEPT with SQL set-op NULL equality:
        every nullable flat column ``c`` becomes (``c`` null-filled with
        a type sentinel, ``c__nn`` is-null flag) on BOTH sides, the
        semi/anti equi-join runs on the expanded key list (where
        (sentinel, 1) == (sentinel, 1) makes null match null while
        (sentinel, 0) keeps a real sentinel-valued row distinct), and
        the flags then restore the nulls and drop."""
        schema = _arrow_schema(self._ds)
        cols = list(schema.names)
        plan = [(c, schema.field(c).type, _null_sentinel(schema.field(c).type)) for c in cols]
        on2 = [c for c in cols] + [c + "__nn" for c, _, s in plan if s is not None]

        a = Dataset(
            self.distinct()._ds.map_batches(
                _expand_null_flags(plan), batch_format="pyarrow"
            )
        )
        b = Dataset(
            other._ds.map_batches(_expand_null_flags(plan), batch_format="pyarrow")
        )
        joined = a.anti_join(b, on=on2, strategy="shuffle") if anti else a.semi_join(
            b, on=on2, strategy="shuffle"
        )
        restored = joined._ds.map_batches(
            _restore_null_flags(plan), batch_format="pyarrow"
        )
        return Dataset(restored).project(cols)

    def intersect_all(self, other: "Dataset", *, strategy: str = "shuffle") -> "Dataset":
        """SQL ``INTERSECT ALL`` (bag semantics): each distinct row
        appears ``min(count_left, count_right)`` times. See
        :meth:`_bag_set_op` for the distributed construction."""
        return self._bag_set_op(other, intersect=True, strategy=strategy)

    def except_all(self, other: "Dataset", *, strategy: str = "shuffle") -> "Dataset":
        """SQL ``EXCEPT ALL`` (bag semantics): each distinct row appears
        ``max(count_left - count_right, 0)`` times."""
        return self._bag_set_op(other, intersect=False, strategy=strategy)

    def _bag_set_op(self, other: "Dataset", *, intersect: bool, strategy: str) -> "Dataset":
        """Bag INTERSECT/EXCEPT ALL: reduce each side to one row per
        distinct tuple + its multiplicity (null-safe surrogate key, so
        nulls compare EQUAL as in SQL set ops), equi-join the two count
        tables on the surrogate (a STRING key — no null/order issues),
        and vectorized-repeat each surviving row to its output
        multiplicity. Shuffles only the reduced count tables."""
        from ray.data.aggregate import Count, Min

        schema = _arrow_schema(self._ds)
        cols = list(schema.names)
        target = pa.schema([schema.field(c) for c in cols])

        def _enc(batch: pa.Table) -> pa.Table:
            # blocks whose column is entirely null infer Arrow type
            # `null` (pandas provenance); conform to the dataset schema
            # so the downstream join kernel sees one type per column
            batch = batch.select(cols).cast(target)
            return batch.append_column("__gk", _nullsafe_gk(batch, cols))

        def _conform(batch: pa.Table) -> pa.Table:
            # aggregate output blocks whose Min(c) came out all-null can
            # re-degrade c to Arrow type `null`; pin the dataset types
            for c in cols:
                i = batch.column_names.index(c)
                if batch.schema.field(i).type != schema.field(c).type:
                    batch = batch.set_column(
                        i, c, batch[c].cast(schema.field(c).type)
                    )
            return batch

        lc = GroupedDataset(
            self._ds.map_batches(_enc, batch_format="pyarrow"), ["__gk"]
        ).aggregate(
            *(Min(c, alias_name=c) for c in cols), Count(alias_name="__cl")
        ).map_batches(_conform)
        rc = GroupedDataset(
            other._ds.map_batches(_enc, batch_format="pyarrow"), ["__gk"]
        ).aggregate(Count(alias_name="__cr"))
        joined = lc.join(rc, on="__gk", how="left", strategy=strategy)

        def _replicate(batch: pa.Table) -> pa.Table:
            cl = batch["__cl"].to_numpy(zero_copy_only=False).astype(np.int64)
            cr_raw = batch["__cr"].to_numpy(zero_copy_only=False)
            cr = np.nan_to_num(cr_raw.astype(np.float64), nan=0.0).astype(np.int64)
            reps = np.minimum(cl, cr) if intersect else np.maximum(cl - cr, 0)
            idx = np.repeat(np.arange(len(cl), dtype=np.int64), reps)
            return batch.select(cols).take(pa.array(idx))

        return joined.map_batches(_replicate)

    def range_join(
        self,
        intervals: pa.Table,
        value_col: str,
        lo_col: str,
        hi_col: str,
        *,
        how: str = "inner",
    ) -> "Dataset":
        """Interval (range) join: match each row where
        ``lo <= value < hi``, for a SMALL broadcast ``intervals`` table
        (absent from both the reference and Ray Data). Overlapping
        intervals fan rows out (one output row per match); ``how="left"``
        keeps unmatched rows with null interval columns.

        Broadcast via ``ray.put`` once, vectorized candidate masking per
        batch (n×m comparisons on numpy views — fine for the band-table
        use case; a large interval side needs range-bucketing both
        sides on a shared grid instead)."""
        if how not in ("inner", "left"):
            raise ValueError(f"how must be inner|left, got {how!r}")
        ref = ray.put(intervals)

        def _rj(batch: pa.Table) -> pa.Table:
            iv = ray.get(ref)
            v = batch[value_col].to_numpy(zero_copy_only=False)
            lo = iv[lo_col].to_numpy(zero_copy_only=False)
            hi = iv[hi_col].to_numpy(zero_copy_only=False)
            m = (v[:, None] >= lo[None, :]) & (v[:, None] < hi[None, :])
            li, ri = np.nonzero(m)
            out = batch.take(pa.array(li))
            right = iv.take(pa.array(ri))
            for name in right.column_names:
                out = out.append_column(
                    name if name not in batch.column_names else f"{name}_right",
                    right[name],
                )
            if how == "left":
                unmatched = np.flatnonzero(~m.any(axis=1))
                if len(unmatched):
                    pad = batch.take(pa.array(unmatched))
                    for f in iv.schema:
                        pad = pad.append_column(
                            f.name
                            if f.name not in batch.column_names
                            else f"{f.name}_right",
                            pa.nulls(len(unmatched), f.type),
                        )
                    out = pa.concat_tables([out, pad])
            return out

        return Dataset(self._ds.map_batches(_rj, batch_format="pyarrow"))

    def cross_join(self, other: "Dataset", *, suffix: str = RIGHT_SUFFIX) -> "Dataset":
        """Cartesian product with a SMALL broadcast right side (absent
        from the reference — its ``NestedLoopsJoin`` cross product exists
        only to feed an LLM pair filter, ``join.py:395-489``).

        The right side is materialized once, shipped via ``ray.put``,
        and the product is built per left batch with two vectorized
        ``take`` calls — no shuffle. Output size is |L|x|R| rows: keep
        the right side to dimension-table scale (a large-x-large cross
        product is wrong at any scale, not a missing feature). Duplicate
        right column names take the ``_right`` suffix (join parity)."""
        left_names = _arrow_schema(self._ds).names
        right_tbl = _to_table(other._ds).combine_chunks()
        right_tbl = right_tbl.rename_columns(
            [c + suffix if c in left_names else c for c in right_tbl.column_names]
        )
        ref = ray.put(right_tbl)

        def _cj(batch: pa.Table) -> pa.Table:
            right = ray.get(ref)
            n, m = len(batch), len(right)
            if m == 0 or n == 0:
                empty = [pa.chunked_array([], f.type) for f in batch.schema] + [
                    pa.chunked_array([], f.type) for f in right.schema
                ]
                return pa.table(empty, names=batch.column_names + right.column_names)
            li = np.repeat(np.arange(n, dtype=np.int64), m)
            ri = np.tile(np.arange(m, dtype=np.int64), n)
            out = batch.take(pa.array(li))
            rt = right.take(pa.array(ri))
            for name in rt.column_names:
                out = out.append_column(name, rt[name])
            return out

        return Dataset(self._ds.map_batches(_cj, batch_format="pyarrow"))

    def grouping_sets(
        self,
        keys: list[str],
        sets: list[list[str]],
        funcs: list[tuple[str, str]],
    ) -> "Dataset":
        """SQL ``GROUP BY GROUPING SETS``: one aggregate pass at the
        finest level (all ``keys``, map-side partial combine — see
        ``GroupedDataset.aggregate``), then each requested set
        re-aggregates the *already-reduced* fine table, so the full
        input is shuffled exactly once no matter how many sets.

        ``funcs`` follows the reference agg signature ``(func, field)``
        with func in count/sum/min/max/average (``average`` is
        decomposed into re-aggregable sum+count partials); output
        columns are named ``"func(field)"`` (reference
        ``groupbysig.py:55-59``). Rolled-up key columns are NULL, as in
        SQL — groups whose key value is itself NULL are merged with the
        rollup row at coarser levels (same caveat as SQL without
        ``GROUPING()``)."""
        from ray.data.aggregate import Count, Max, Min, Sum

        keys = list(keys)
        sets = [list(s) for s in sets]
        for s in sets:
            if not set(s) <= set(keys):
                raise ValueError(f"grouping set {s} not a subset of keys {keys}")

        schema = _arrow_schema(self._ds)
        key_types = {k: schema.field(k).type for k in keys}

        # decompose funcs into re-aggregable partials over the fine level
        partial: dict[tuple[str, str], str] = {}  # (kind, field) -> partial col

        def pcol(kind: str, field: str) -> str:
            return partial.setdefault((kind, field), f"__gs{len(partial)}")

        plan: list[tuple] = []  # (func, out_name, partial cols...)
        for func, field in funcs:
            name = f"{func}({field})"
            if func == "count":
                plan.append(("count", name, pcol("count", field)))
            elif func == "sum":
                plan.append(("sum", name, pcol("sum", field)))
            elif func == "min":
                plan.append(("min", name, pcol("min", field)))
            elif func == "max":
                plan.append(("max", name, pcol("max", field)))
            elif func == "average":
                plan.append(
                    ("average", name, pcol("sum", field), pcol("count", field))
                )
            else:
                raise ValueError(f"unsupported grouping-sets func {func!r}")

        def _agg_obj(kind: str, col: str, alias: str):
            if kind == "count":
                return Count(col, alias_name=alias, ignore_nulls=True)
            if kind == "sum":
                return Sum(col, alias_name=alias)
            if kind == "min":
                return Min(col, alias_name=alias)
            return Max(col, alias_name=alias)

        fine = self.groupby(keys, null_safe=True).aggregate(
            *(_agg_obj(kind, field, p) for (kind, field), p in partial.items())
        )

        # ONE re-aggregation shuffle for every level: replicate each
        # (already-reduced) fine row once per level — rolled-up keys
        # nulled — then a single groupby on a null-safe composite key
        # (Ray's sort shuffle cannot order mixed null/value key blocks),
        # recovering the typed key columns via Min (constant per group).
        # N levels cost 2 shuffles total instead of N; replicating the
        # reduced table is cheap, replicating the INPUT would not be.
        reagg_kind = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
        pcols = list(partial.values())
        level_sets = list(enumerate(sets))

        def _replicate(batch: pa.Table) -> pa.Table:
            n = len(batch)
            parts = []
            for li, s in level_sets:
                arrays = [
                    pc.cast(batch[k], key_types[k])
                    if k in s
                    else pa.nulls(n, key_types[k])
                    for k in keys
                ]
                arrays += [batch[p] for p in pcols]
                arrays.append(pa.array(np.full(n, li, dtype=np.int32)))
                parts.append(pa.table(arrays, names=keys + pcols + ["__lvl"]))
            return pa.concat_tables(parts)

        reagg = (
            fine.map_batches(_replicate)
            .groupby(keys + ["__lvl"], null_safe=True)
            .aggregate(
                *(
                    _agg_obj(reagg_kind[kind], p, p)
                    for (kind, _), p in partial.items()
                ),
            )
        )
        out_names = keys + [step[1] for step in plan]

        def _finish(batch: pa.Table) -> pa.Table:
            arrays = [pc.cast(batch[k], key_types[k]) for k in keys]
            for step in plan:
                if step[0] == "average":
                    _, _, ps, pcnt = step
                    arrays.append(
                        pc.divide(
                            pc.cast(batch[ps], pa.float64()),
                            pc.cast(batch[pcnt], pa.float64()),
                        )
                    )
                elif step[0] == "count":
                    arrays.append(pc.cast(batch[step[2]], pa.int64()))
                else:
                    arrays.append(batch[step[2]])
            return pa.table(arrays, names=out_names)

        return reagg.map_batches(_finish)

    def rollup(self, keys: list[str], funcs: list[tuple[str, str]]) -> "Dataset":
        """SQL ``GROUP BY ROLLUP``: hierarchy prefixes of ``keys`` —
        ``(k1..kn), (k1..kn-1), ..., (k1), ()`` — via
        :meth:`grouping_sets` (one input shuffle total)."""
        sets = [list(keys)[:i] for i in range(len(keys), -1, -1)]
        return self.grouping_sets(list(keys), sets, funcs)

    def cube(self, keys: list[str], funcs: list[tuple[str, str]]) -> "Dataset":
        """SQL ``GROUP BY CUBE``: all 2^n subsets of ``keys`` via
        :meth:`grouping_sets` (one input shuffle total)."""
        from itertools import combinations

        keys = list(keys)
        sets = [
            list(c) for r in range(len(keys), -1, -1) for c in combinations(keys, r)
        ]
        return self.grouping_sets(keys, sets, funcs)

    def _semi_anti(self, other: "Dataset", on, anti: bool) -> "Dataset":
        on = [on] if isinstance(on, str) else list(on)
        keys = other._ds.select_columns(on).unique(on[0]) if len(on) == 1 else None
        if len(on) == 1 and not keys:
            # empty key set (unique() yields None/[]): semi keeps
            # nothing, anti keeps everything
            if anti:
                return Dataset(self._ds)
            return Dataset(
                self._ds.map_batches(
                    lambda b: b.slice(0, 0), batch_format="pyarrow"
                )
            )
        if len(on) == 1:
            key_set = pa.array(sorted(keys, key=lambda x: (x is None, x)))
            ref = ray.put(key_set)
            col = on[0]

            def _flt(batch: pa.Table) -> pa.Table:
                ks = ray.get(ref)
                mask = pc.is_in(batch[col], value_set=ks)
                if anti:
                    mask = pc.invert(mask)
                return batch.filter(mask)

            return Dataset(self._ds.map_batches(_flt, batch_format="pyarrow"))
        # multi-key: encode the key tuple as ONE string per row (each
        # field length-prefixed — an unambiguous prefix code, so no
        # concatenation collisions) and run vectorized is_in on it.
        # Nulls encode to a dedicated token, preserving this path's
        # set-op semantics (null matches null). The key-side encoding
        # runs distributed; only the distinct encoded strings broadcast.
        def _enc_batch(batch: pa.Table) -> pa.Table:
            return pa.table({"__k": _encode_composite_key(batch, on)})

        keyset = sorted(
            set(
                other._ds.select_columns(on)
                .map_batches(_enc_batch, batch_format="pyarrow")
                .unique("__k")
            )
        )
        ref = ray.put(pa.array(keyset, pa.string()))

        def _flt2(batch: pa.Table) -> pa.Table:
            ks = ray.get(ref)
            mask = pc.is_in(_encode_composite_key(batch, on), value_set=ks)
            if anti:
                mask = pc.invert(mask)
            return batch.filter(mask)

        return Dataset(self._ds.map_batches(_flt2, batch_format="pyarrow"))


# --------------------------------------------------------------------------
# join internals
# --------------------------------------------------------------------------


def _encode_composite_key(batch: pa.Table, cols: list[str]) -> pa.Array:
    """One collision-free string per row for a multi-column key: every
    field is length-prefixed (``V<len>:<text>``; null → ``N``), making
    the concatenation an unambiguous prefix code — vectorized Arrow
    kernels end-to-end, no per-row Python. Used by the broadcast
    semi/anti path so multi-key membership is a single ``is_in``."""
    parts: list = []
    for c in cols:
        arr = batch[c]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        s = pc.cast(arr, pa.string())
        enc = pc.binary_join_element_wise(
            "V", pc.cast(pc.utf8_length(s), pa.string()), ":", s, ""
        )
        parts.append(pc.fill_null(enc, "N"))
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(*parts, "")


def _has_all_to_all(ds: rd.Dataset) -> bool:
    """Whether the plan contains an all-to-all exchange (aggregate /
    sort / shuffle / repartition). For such plans, a SCHEMA PROBE
    executes the FULL pipeline and the later consumption executes it
    AGAIN — Ray caches the schema but not the blocks (measured: a 4M-
    row groupby aggregate costs 16.9s to probe and 15.9s more to
    consume). Plain read/map chains probe from metadata or one block
    and must stay lazy (pinning them would break pipelining)."""
    try:
        from ray.data._internal.logical.operators.all_to_all_operator import (  # noqa: E501
            AbstractAllToAll,
        )

        def visit(node) -> bool:
            if isinstance(node, AbstractAllToAll):
                return True
            return any(visit(d) for d in node.input_dependencies)

        return visit(ds._logical_plan.dag)
    except Exception:
        return False


def _pin_for_probe(ds: rd.Dataset) -> rd.Dataset:
    """Materialize a dataset whose schema probe would double-execute it
    (all-to-all upstream AND no metadata schema) so probe + consumption
    share blocks. The join paths call this on both sides before their
    collision-rename probes — the engine-wide fix for the lazy-join 2x
    (first found on _agg_distributed / diff_lakes, r5)."""
    try:
        if ds.schema(fetch_if_missing=False) is not None:
            return ds
    except Exception:
        return ds
    if _has_all_to_all(ds):
        return ds.materialize()
    return ds


def _arrow_schema(ds: rd.Dataset) -> pa.Schema:
    """Arrow schema of a dataset, tolerating pandas-backed blocks
    (whose ``schema().base_schema`` is a PandasBlockSchema)."""
    base = ds.schema().base_schema
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for n, t in zip(base.names, base.types):
        try:
            at = pa.from_numpy_dtype(t)
        except (pa.ArrowNotImplementedError, TypeError, ValueError):
            at = pa.string()
        fields.append(pa.field(n, at))
    return pa.schema(fields)

def _rename(ds: rd.Dataset, mapping: dict[str, str]) -> rd.Dataset:
    """Rename via a pyarrow map_batches — ``Dataset.rename_columns``
    breaks on pandas-backed blocks in Ray 2.49."""

    def _r(batch: pa.Table) -> pa.Table:
        return batch.rename_columns([mapping.get(c, c) for c in batch.column_names])

    return ds.map_batches(_r, batch_format="pyarrow")


def _null_sentinel(t: pa.DataType):
    """A fill value for null-expansion of set-op keys (any constant of
    the type works — the companion is-null flag keeps a real
    sentinel-valued row distinct from a null). None = inexpandable
    (nested types)."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return ""
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return b""
    if pa.types.is_boolean(t):
        return False
    if pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_decimal(t):
        return 0
    if pa.types.is_temporal(t):
        return 0
    return None


def _expand_null_flags(plan: list[tuple]):
    """Batch fn: for each (col, type, sentinel) with a sentinel, replace
    nulls by the sentinel and append an int8 ``col__nn`` is-null flag."""

    def _e(batch: pa.Table) -> pa.Table:
        for c, _, sent in plan:
            if sent is None:
                continue
            col = batch[c]
            flag = pc.cast(pc.is_null(col), pa.int8())
            filled = pc.fill_null(col, pa.scalar(sent, batch.schema.field(c).type))
            batch = batch.set_column(batch.schema.get_field_index(c), c, filled)
            batch = batch.append_column(c + "__nn", flag)
        return batch

    return _e


def _restore_null_flags(plan: list[tuple]):
    """Inverse of :func:`_expand_null_flags`: re-null flagged values and
    drop the flag columns."""

    def _r(batch: pa.Table) -> pa.Table:
        for c, _, sent in plan:
            if sent is None:
                continue
            mask = pc.equal(batch[c + "__nn"], pa.scalar(1, pa.int8()))
            t = batch.schema.field(c).type
            col = pc.if_else(mask, pa.scalar(None, t), batch[c])
            batch = batch.set_column(batch.schema.get_field_index(c), c, col)
        return batch.drop_columns([c + "__nn" for c, _, s in plan if s is not None])

    return _r


def _unify_key_casts(
    on: list[str], lschema: pa.Schema, rschema: pa.Schema
) -> dict[str, pa.DataType]:
    """Promoted type per key column whose dtype drifted across sides
    (int32-vs-int64 parquet drift, pandas int-vs-float contamination):
    acero rejects mismatched key types outright, pandas would upcast
    silently, and polars' xxhash buckets int-vs-float values of equal
    magnitude differently — every join path must cast both sides to the
    promoted type BEFORE hashing or probing."""
    casts: dict[str, pa.DataType] = {}
    for c in on:
        lt, rt = lschema.field(c).type, rschema.field(c).type
        if lt != rt:
            casts[c] = pa.unify_schemas(
                [pa.schema([pa.field(c, lt)]), pa.schema([pa.field(c, rt)])],
                promote_options="permissive",
            ).field(c).type
    return casts


def _cast_key_columns(batch: pa.Table, key_casts: dict[str, pa.DataType]) -> pa.Table:
    for c, t in key_casts.items():
        batch = batch.set_column(batch.schema.get_field_index(c), c, batch[c].cast(t))
    return batch


def _apply_key_casts_schema(schema: pa.Schema, key_casts: dict[str, pa.DataType]) -> pa.Schema:
    return pa.schema(
        [pa.field(f.name, key_casts.get(f.name, f.type)) for f in schema]
    )


def _broadcast_join(left: rd.Dataset, right: rd.Dataset, on: list[str], how: str) -> rd.Dataset:
    """Small right side: ship once via ``ray.put``, hash-join per batch.

    The per-batch kernel is Arrow acero (``pa.Table.join`` — zero
    pandas conversion, typed-null output) when both schemas are flat;
    acero rejects nested (list/struct/map) non-key columns, so token-
    array payloads join NARROW — keys + a row index per side through
    acero — and re-attach payloads via ``take`` (SURVEY §7.5.4: token
    arrays never round-trip through pandas). ``base_how`` is always
    inner/left here, so the left index is never null and left columns
    take through exactly; unmatched right rows pad as typed nulls.

    right/outer joins additionally require emitting right rows that
    matched nothing anywhere — tracked per-batch is impossible without
    global state, so for how in (right, outer) we invert: broadcast
    LEFT-join from the right side would have the same issue. Instead we
    run the matched part per batch and compute the unmatched right rows
    with one distributed semi-join pass at the end.
    """
    right_tbl = _to_table(right).combine_chunks()
    lschema = _arrow_schema(left)
    key_casts = _unify_key_casts(on, lschema, right_tbl.schema)
    if key_casts:
        right_tbl = right_tbl.cast(
            _apply_key_casts_schema(right_tbl.schema, key_casts)
        )
    ref = ray.put(right_tbl)

    base_how = {"right": "inner", "outer": "left"}.get(how, how)
    flat = all(not pa.types.is_nested(f.type) for f in right_tbl.schema) and all(
        not pa.types.is_nested(f.type) for f in lschema
    )
    acero_how = {"inner": "inner", "left": "left outer"}[base_how]
    _ri = "__pz_ri"
    rk_ref = (
        None
        if flat
        else ray.put(
            right_tbl.select(on).append_column(
                _ri,
                pa.array(np.arange(right_tbl.num_rows, dtype=np.int64)),
            )
        )
    )
    r_only_b = [c for c in right_tbl.column_names if c not in on]

    def _merge(batch: pa.Table) -> pa.Table:
        batch = _cast_key_columns(batch, key_casts)
        if flat:
            out = batch.join(
                ray.get(ref), keys=on, join_type=acero_how, use_threads=False
            )
            return out.replace_schema_metadata(None)
        _li = "__pz_li"
        lk = batch.select(on).append_column(
            _li, pa.array(np.arange(batch.num_rows, dtype=np.int64))
        )
        idx = lk.join(
            ray.get(rk_ref), keys=on, join_type=acero_how, use_threads=False
        )
        lidx = idx[_li].combine_chunks()
        ridx = idx[_ri].combine_chunks()
        rt = ray.get(ref)
        cols = {
            c: batch[c].combine_chunks().take(lidx)
            for c in batch.column_names
        }
        for c in r_only_b:
            cols[c] = rt[c].take(ridx)
        return pa.table(cols).replace_schema_metadata(None)

    out = left.map_batches(_merge, batch_format="pyarrow")

    if how in ("right", "outer"):
        # unmatched right rows: right anti-join left on key. The probe
        # set is built ONCE on the driver — SQL semantics drop null keys
        # from it (a null-key right row matches nothing, so it is always
        # unmatched; keeping nulls would let is_in / tuple lookup
        # "match" null against null) — then shipped via ray.put so the
        # per-batch kernel does zero set construction.
        left_keys = _to_table(left.select_columns(on))
        if key_casts:
            left_keys = left_keys.cast(
                _apply_key_casts_schema(left_keys.schema, key_casts)
            )
        if len(on) == 1:
            lref = ray.put(left_keys[on[0]].combine_chunks().drop_null())
        else:
            lref = ray.put(
                frozenset(
                    t
                    for t in (
                        tuple(r.values()) for r in left_keys.to_pylist()
                    )
                    if None not in t
                )
            )

        def _unmatched(batch: pa.Table) -> pa.Table:
            batch = _cast_key_columns(batch, key_casts)
            probe = ray.get(lref)
            if len(on) == 1:
                mask = pc.invert(pc.is_in(batch[on[0]], value_set=probe))
                rem = batch.filter(pc.fill_null(mask, True))
            else:
                cols = [batch[c].to_pylist() for c in on]
                rem = batch.filter(pa.array([t not in probe for t in zip(*cols)]))
            return rem.replace_schema_metadata(None)

        unmatched = right.map_batches(_unmatched, batch_format="pyarrow")
        out = _union_aligned(out, unmatched)
    return out


_TARGET_BUCKET_BYTES = 256 << 20  # ~256 MB estimated in-memory input per cogroup task
_MAX_AUTO_BUCKETS = 1 << 16


def _estimate_bytes(ds: rd.Dataset) -> int | None:
    """Upper-bound byte estimate from logical-plan metadata ONLY — never
    triggers execution. Parquet reads carry an in-memory size estimate;
    transforms report unknown, so walk to their inputs and sum (maps/
    filters/projections only shrink or keep data, making the source
    size a safe upper bound for shuffle sizing). None when no source
    reports a size (e.g. from_items)."""

    def visit(node) -> int | None:
        try:
            m = node.infer_metadata()
            if m.size_bytes is not None:
                return m.size_bytes
            deps = node.input_dependencies
        except Exception:
            return None
        if not deps:
            return None
        total = 0
        for d in deps:
            s = visit(d)
            if s is None:
                return None
            total += s
        return total

    try:
        return visit(ds._plan._logical_plan.dag)
    except Exception:
        return None


def _auto_buckets(left: rd.Dataset, right: rd.Dataset) -> int:
    """Shuffle width for the cogroup join: enough buckets that each
    ``map_groups`` task sees ~``_TARGET_BUCKET_BYTES`` of input, floor
    32 (parallelism at toy scale), cap ``_MAX_AUTO_BUCKETS``. Unknown
    sizes fall back to the floor — callers joining two opaque huge
    inputs should pass ``num_buckets`` explicitly."""
    lb, rb = _estimate_bytes(left), _estimate_bytes(right)
    if lb is None and rb is None:
        return 32
    total = (lb or 0) + (rb or 0)
    return int(min(_MAX_AUTO_BUCKETS, max(32, -(-total // _TARGET_BUCKET_BYTES))))


def _join_nested_tables(
    lf: pa.Table,
    rf: pa.Table,
    on: list[str],
    acero_how: str,
    out_schema: pa.Schema,
) -> pa.Table:
    """Equi-join two tables that may carry NESTED non-key columns,
    acero-only: acero rejects list/struct/map payloads, so join keys +
    a per-side row index through ``pa.Table.join`` and re-attach the
    payloads with ``take`` (a null index — the unmatched side of an
    outer join — takes as a typed-null row). Null-key and coalesced-key
    semantics are exactly acero's, i.e. ANSI SQL; token arrays never
    round-trip through pandas (SURVEY §7.5.4)."""
    li, ri = "__pz_li", "__pz_ri"
    l_only = [c for c in lf.column_names if c not in on]
    r_only = [c for c in rf.column_names if c not in on]
    lk = lf.select(on).append_column(
        li, pa.array(np.arange(lf.num_rows, dtype=np.int64))
    )
    rk = rf.select(on).append_column(
        ri, pa.array(np.arange(rf.num_rows, dtype=np.int64))
    )
    idx = lk.join(rk, keys=on, join_type=acero_how, use_threads=False)
    cols = {c: idx[c] for c in on}
    for c in l_only:
        cols[c] = lf[c].combine_chunks().take(idx[li].combine_chunks())
    for c in r_only:
        cols[c] = rf[c].combine_chunks().take(idx[ri].combine_chunks())
    return (
        pa.table({c: cols[c] for c in out_schema.names})
        .cast(out_schema)
        .replace_schema_metadata(None)
    )


def _shuffle_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: list[str],
    how: str,
    num_buckets: int | None,
    salt: int = 1,
) -> rd.Dataset:
    """Bucketed cogroup hash join: hash-partition both sides on the key,
    join each bucket inside ``map_groups`` (SURVEY.md §7.4).

    ``salt > 1`` splits every bucket into ``salt`` sub-buckets: left
    rows round-robin across them, right rows are REPLICATED into all of
    them — the remedy for a hot key whose single bucket would otherwise
    bound the join on one task. Right-side cost multiplies by ``salt``,
    so salt only when the right side is the smaller one. Only valid for
    how in (inner, left): each left row still lands in exactly one
    sub-bucket, but a right row can no longer prove itself globally
    unmatched.
    """
    if num_buckets is None:
        num_buckets = _auto_buckets(left, right)
    # resolve schemas ONCE (each schema() on a lazy dataset costs a
    # limit-1 execution; see _pad_columns docstring)
    lschema, rschema = _arrow_schema(left), _arrow_schema(right)
    l_only = [c for c in lschema.names if c not in on]
    r_only = [c for c in rschema.names if c not in on]

    key_casts = _unify_key_casts(on, lschema, rschema)
    if key_casts:
        lschema = _apply_key_casts_schema(lschema, key_casts)
        rschema = _apply_key_casts_schema(rschema, key_casts)

    def _tag(side: int):
        def _t(batch: pa.Table) -> pa.Table:
            batch = _cast_key_columns(batch, key_casts)
            key = batch[on[0]] if len(on) == 1 else pa.StructArray.from_arrays(
                [batch[c].combine_chunks() for c in on], names=on
            )
            h = stable_hash(key)
            b = (h % np.uint64(num_buckets)).astype(np.int64)
            n = batch.num_rows
            if salt > 1 and side == 0:
                # per-batch deterministic offset: without it the
                # round-robin restarts at sub-bucket 0 every batch, so
                # small batches would pile a hot key onto the low
                # sub-buckets while still paying full right replication
                off = int(h.sum() % np.uint64(salt))
                b = b * salt + ((off + np.arange(n, dtype=np.int64)) % salt)
            elif salt > 1:
                # replicate the right side into every sub-bucket
                batch = pa.concat_tables([batch] * salt)
                b = np.concatenate([b * salt + i for i in range(salt)])
                n = batch.num_rows
            batch = batch.append_column(_JOIN_BUCKET, pa.array(b))
            batch = batch.append_column(
                _JOIN_SIDE, pa.array(np.full(n, side, dtype=np.int8))
            )
            # parquet footers written by pandas carry a metadata blob
            # with dicts, which breaks Ray's schema hashing/dedup
            return batch.replace_schema_metadata(None)

        return _t

    lt = left.map_batches(_tag(0), batch_format="pyarrow")
    rt = right.map_batches(_tag(1), batch_format="pyarrow")
    # align schemas for union: add each side's missing columns as nulls
    lt = lt.map_batches(lambda b: _pad_columns(b, r_only, rschema), batch_format="pyarrow")
    rt = rt.map_batches(lambda b: _pad_columns(b, l_only, lschema), batch_format="pyarrow")
    both = lt.union(rt)

    out_schema = pa.schema(
        [lschema.field(c) for c in on + l_only] + [rschema.field(c) for c in r_only]
    )
    # per-bucket kernel: acero hash join on flat schemas (zero pandas,
    # typed nulls); nested payloads (acero rejects list/struct non-key
    # columns) join NARROW — keys + a row index per side through acero,
    # payloads re-attached via take (null index -> null row, exactly
    # outer-join semantics). Token arrays never round-trip through
    # pandas (SURVEY §7.5.4); same acero null-key semantics both paths.
    flat = all(not pa.types.is_nested(f.type) for f in out_schema)
    acero_how = {
        "inner": "inner",
        "left": "left outer",
        "right": "right outer",
        "outer": "full outer",
    }[how]

    def _cogroup_arrow(group: pa.Table) -> pa.Table:
        side = group[_JOIN_SIDE]
        lf = group.filter(pc.equal(side, 0)).select(on + l_only)
        rf = group.filter(pc.equal(side, 1)).select(on + r_only)
        out = lf.join(rf, keys=on, join_type=acero_how, use_threads=False)
        return out.select(out_schema.names).replace_schema_metadata(None)

    def _cogroup_arrow_nested(group: pa.Table) -> pa.Table:
        side = group[_JOIN_SIDE]
        lf = group.filter(pc.equal(side, 0)).select(on + l_only)
        rf = group.filter(pc.equal(side, 1)).select(on + r_only)
        return _join_nested_tables(lf, rf, on, acero_how, out_schema)

    grouped = both.groupby(_JOIN_BUCKET)
    kernel = _cogroup_arrow if flat else _cogroup_arrow_nested
    return grouped.map_groups(kernel, batch_format="pyarrow")


def _pad_columns(batch: pa.Table, missing: list[str], schema: pa.Schema) -> pa.Table:
    """Append ``missing`` columns as typed nulls. ``schema`` must be a
    resolved ``pa.Schema`` — never pass a Dataset here: resolving its
    schema inside a worker closure re-executes lineage per task."""
    for name in missing:
        field = schema.field(name)
        batch = batch.append_column(field.name, pa.nulls(batch.num_rows, field.type))
    return batch


def _to_table(ds: rd.Dataset) -> pa.Table:
    tables = list(ds.iter_batches(batch_format="pyarrow", batch_size=65536))
    if not tables:
        return _arrow_schema(ds).empty_table()
    return pa.concat_tables(tables, promote_options="permissive")


def _union_aligned(a: rd.Dataset, b: rd.Dataset) -> rd.Dataset:
    """Union two datasets whose column sets may differ (outer-join
    unmatched side lacks the other side's columns): pad with nulls."""
    a_schema = _arrow_schema(a)
    b_schema = _arrow_schema(b)
    names = list(dict.fromkeys(list(a_schema.names) + list(b_schema.names)))

    def _align(schema_from: pa.Schema, other: pa.Schema):
        def _f(batch: pa.Table) -> pa.Table:
            for n in names:
                if n not in batch.column_names:
                    f = other.field(n) if n in other.names else schema_from.field(n)
                    batch = batch.append_column(n, pa.nulls(batch.num_rows, f.type))
            return batch.select(names)

        return _f

    return a.map_batches(_align(a_schema, b_schema), batch_format="pyarrow").union(
        b.map_batches(_align(b_schema, a_schema), batch_format="pyarrow")
    )


# --------------------------------------------------------------------------
# grouped data
# --------------------------------------------------------------------------

_AGG_FUNCS = ("count", "sum", "average", "min", "max", "list", "set")


class GroupedDataset:
    """Grouped view: reference ``GroupByAggregate`` semantics
    (``aggregate.py:33-189``) on Ray Data's shuffle groupby."""

    def __init__(self, ds: rd.Dataset, keys: list[str], null_safe: bool = False):
        self._ds = ds
        self._keys = keys
        self._null_safe = null_safe

    def aggregate(self, *aggs) -> Dataset:
        """Aggregate with ``ray.data`` aggregate objects
        (``Sum/Count/Mean/Min/Max(col, alias_name=...)``).

        Standard algebraic aggs run as map-side partials (pyarrow
        ``group_by`` per batch) + a final groupby over ``blocks x
        groups`` partial rows — Ray's sort-based aggregate shuffles
        every input row, the combiner shuffles only the partials.
        Unknown aggregate objects fall through to Ray's path."""
        if self._null_safe:
            return self._null_safe_aggregate(aggs)
        combined = self._combined_aggregate(aggs)
        if combined is not None:
            return combined
        return Dataset(self._ds.groupby(self._keys).aggregate(*aggs))

    def _null_safe_aggregate(self, aggs) -> Dataset:
        """Group on the encoded surrogate (see :func:`_nullsafe_gk`),
        recover the typed key columns via Min (constant per group)."""
        from ray.data.aggregate import Min

        keys = self._keys

        def _add(batch: pa.Table) -> pa.Table:
            return batch.append_column("__gk", _nullsafe_gk(batch, keys))

        enc = self._ds.map_batches(_add, batch_format="pyarrow")
        inner = GroupedDataset(enc, ["__gk"]).aggregate(
            *(Min(k, alias_name=k) for k in keys), *aggs
        )
        return inner.map_batches(
            lambda b: b.drop_columns(["__gk"]), batch_format="pyarrow"
        )

    def _combined_aggregate(self, aggs) -> Dataset | None:
        from ray.data.aggregate import Count, Max, Mean, Min, Sum

        keys = self._keys
        partial: dict[tuple, str] = {}  # (col, fn, skip_nulls) -> partial col
        plan: list[tuple] = []  # ("col"|"mean", out_name, partial cols...)

        def pcol(col, fn, skip) -> str:
            return partial.setdefault((col, fn, skip), f"__pagg_{len(partial)}")

        for o in aggs:
            if type(o) not in (Sum, Count, Mean, Min, Max):
                return None
            col = o._target_col_name
            skip = bool(getattr(o, "_ignore_nulls", True))
            name = o.name
            if type(o) is Count:
                p = (
                    pcol(None, "count_all", True)
                    if col is None or not skip
                    else pcol(col, "count", True)
                )
                plan.append(("sum", name, p))
            elif type(o) is Sum:
                plan.append(("sum", name, pcol(col, "sum", skip)))
            elif type(o) is Min:
                plan.append(("min", name, pcol(col, "min", skip)))
            elif type(o) is Max:
                plan.append(("max", name, pcol(col, "max", skip)))
            else:  # Mean: partial (sum, valid count), finish sum/sum
                plan.append(
                    ("mean", name, pcol(col, "sum", skip), pcol(col, "count", True))
                )

        partial_keys = list(partial)  # plain tuples: FunctionOptions don't pickle
        pnames = list(partial.values())

        def _partial(batch: pa.Table) -> pa.Table:
            specs = []
            for col, fn, skip in partial_keys:
                if fn == "count_all":
                    specs.append(([], "count_all"))
                elif fn == "count":
                    specs.append((col, "count"))  # only_valid: None-skip
                else:
                    specs.append(
                        (col, fn, pc.ScalarAggregateOptions(skip_nulls=skip))
                    )
            out = batch.group_by(keys, use_threads=False).aggregate(specs)
            # output is keys + one column per spec, positionally
            return out.rename_columns(keys + pnames)

        finals = []
        for (col, fn, skip), pname in partial.items():
            if fn == "min":
                finals.append(Min(pname, alias_name=pname, ignore_nulls=skip))
            elif fn == "max":
                finals.append(Max(pname, alias_name=pname, ignore_nulls=skip))
            else:  # counts and sums both re-sum; count partials are never null
                finals.append(Sum(pname, alias_name=pname, ignore_nulls=skip))

        out_names = list(keys) + [step[1] for step in plan]

        def _finish(batch: pa.Table) -> pa.Table:
            arrays = [batch[k] for k in keys]
            for step in plan:
                if step[0] == "mean":
                    _, _, ps, pcnt = step
                    arrays.append(
                        pc.divide(
                            pc.cast(batch[ps], pa.float64()),
                            pc.cast(batch[pcnt], pa.float64()),
                        )
                    )
                else:
                    arrays.append(batch[step[2]])
            return pa.table(arrays, names=out_names)

        reduced = (
            self._ds.map_batches(_partial, batch_format="pyarrow")
            .groupby(keys)
            .aggregate(*finals)
        )
        return Dataset(reduced.map_batches(_finish, batch_format="pyarrow"))

    def agg(
        self, funcs: list[tuple[str, str]], *, strategy: str = "auto"
    ) -> Dataset:
        """Reference-parity aggregate: ``funcs`` is a list of
        ``(func, field)`` with func in count/sum/average/min/max/list/set;
        output columns are named ``"func(field)"``
        (reference ``groupbysig.py:55-59``). None values are skipped
        (``aggregate.py:65-122``).

        ``strategy`` governs the HOLISTIC kinds (median /
        count_distinct / mode / string_agg / list / set — the algebraic
        kinds always run the map-side-combiner path): ``"groups"`` =
        one ``map_groups`` task per group (every group must fit a
        task); ``"distributed"`` = median through the narrow
        :meth:`quantile` shuffle, count_distinct through
        :meth:`nunique`, mode through the (keys, value) count-reduce
        :meth:`mode` — no whole-group materialization anywhere — with
        the parts equi-joined back on the keys (string_agg/list/set
        REFUSE: their output is itself O(group), there is no scale
        path); ``"auto"`` (default) keeps groups unless the cheap
        footer-estimate + 64k-prefix key-cardinality probe says one
        group exceeds a sane task heap
        (``_WINDOW_BUCKETED_MIN_GROUP_BYTES``), in which case it
        auto-routes the distributable kinds and LOUDLY warns when a
        kind with no scale path pins it to groups (VERDICT r4
        'What's wrong #1')."""
        from ray.data.aggregate import Count, Max, Mean, Min, Std, Sum

        assert strategy in ("auto", "groups", "distributed"), strategy
        known = {
            "count", "sum", "average", "min", "max", "stddev", "var",
            "median", "count_distinct", "string_agg", "mode", "list", "set",
        }
        for func, _ in funcs:
            if func not in known:
                raise ValueError(f"unsupported agg func {func!r}")
        # list/set/median/count_distinct/string_agg are non-algebraic:
        # they need the full group (for a distributed count-distinct
        # that avoids the holistic path, see :meth:`nunique`)
        post = [
            (f, fld, f"{f}({fld})") for (f, fld) in funcs if f in ("list", "set")
        ]
        holistic = {"median", "count_distinct", "string_agg", "mode"}
        needs_groups = bool(post) or any(f in holistic for f, _ in funcs)

        if needs_groups and strategy == "auto":
            strategy = self._agg_holistic_probe(funcs, bool(post))
        if needs_groups and strategy == "distributed":
            return self._agg_distributed(funcs)

        if not needs_groups:
            ray_aggs = []
            var_cols: list[tuple[str, bool]] = []
            for func, field in funcs:
                name = f"{func}({field})"
                if func == "count":
                    ray_aggs.append(Count(field, alias_name=name, ignore_nulls=True))
                elif func == "sum":
                    ray_aggs.append(Sum(field, alias_name=name))
                elif func == "average":
                    ray_aggs.append(Mean(field, alias_name=name))
                elif func == "min":
                    ray_aggs.append(Min(field, alias_name=name))
                elif func == "max":
                    ray_aggs.append(Max(field, alias_name=name))
                else:  # stddev / var: Welford combiner, var finishes as std^2
                    ray_aggs.append(Std(field, ddof=1, alias_name=name))
                    var_cols.append((name, func == "var"))
            out = self.aggregate(*ray_aggs)  # combiner path
            if var_cols:
                def _finish_std(t: pa.Table) -> pa.Table:
                    for c, square in var_cols:
                        col = t[c]
                        if square:
                            col = pc.multiply(col, col)
                        # Ray's Std yields NaN for size-1 groups; SQL
                        # stddev_samp is NULL there (and the holistic
                        # path below already returns None) — normalize.
                        col = pc.if_else(
                            pc.is_nan(col), pa.scalar(None, pa.float64()), col
                        )
                        t = t.set_column(t.column_names.index(c), c, col)
                    return t

                out = out.map_batches(_finish_std, batch_format="pyarrow")
            return out

        # fold any scalar aggs into the same map_groups pass
        keys = self._keys
        scalar = [(f, fld) for (f, fld) in funcs if f not in ("list", "set")]

        def _group(g: pd.DataFrame) -> pd.DataFrame:
            out = {k: [g[k].iloc[0]] for k in keys}
            for func, field in scalar:
                col = g[field].dropna()
                name = f"{func}({field})"
                if func == "count":
                    out[name] = [len(col)]
                elif func == "sum":
                    out[name] = [col.sum()]
                elif func == "average":
                    out[name] = [col.mean()]
                elif func == "min":
                    out[name] = [col.min()]
                elif func == "max":
                    out[name] = [col.max()]
                elif func == "median":
                    # linear interpolation — duckdb median()/quantile_cont
                    # parity for numeric columns
                    out[name] = [col.median()] if len(col) else [None]
                elif func == "stddev":
                    out[name] = [col.std(ddof=1)] if len(col) > 1 else [None]
                elif func == "var":
                    out[name] = [col.var(ddof=1)] if len(col) > 1 else [None]
                elif func == "count_distinct":
                    out[name] = [col.nunique()]
                elif func == "mode":
                    # most frequent value; tie-break = smallest value
                    # (deterministic — duckdb's tie pick is arrival-order)
                    if len(col):
                        vc = col.value_counts()
                        out[name] = [vc[vc == vc.max()].index.min()]
                    else:
                        out[name] = [None]
                elif func == "string_agg":
                    # duckdb string_agg(x, ',' ORDER BY x) parity: order
                    # by the NATIVE value (numeric cols sort numerically,
                    # not lexicographically), then stringify
                    out[name] = [",".join(str(v) for v in col.sort_values())]
            for func, field, name in post:
                vals = [v for v in g[field].tolist() if v is not None]
                out[name] = [sorted(set(vals))] if func == "set" else [vals]
            return pd.DataFrame(out)

        return self.map_groups(_group, batch_format="pandas")

    def nunique(self, field: str, out: str | None = None) -> Dataset:
        """Distributed SQL ``COUNT(DISTINCT field)`` per group — the
        scale path for ``agg([("count_distinct", field)])``: project
        down to ``keys + [field]``, drop SQL-ignored null values, exact
        distinct on the pair (one hash-partitioned shuffle whose reduce
        output is at most one row per distinct pair), then a cheap
        count over the already-reduced pairs. No group ever needs to
        fit in one task, unlike the holistic agg path."""
        from ray.data.aggregate import Count, Sum

        name = out or f"count_distinct({field})"
        keys = self._keys
        narrow = Dataset(self._ds.select_columns(keys + [field]))
        if self._null_safe:
            # null GROUP keys: the surrogate-encoded path — the field
            # leg rides the same encoding so null values stay distinct
            # from sentinel-valued rows
            pairs = narrow.distinct(null_safe=True)
            flagged = pairs.with_column(
                "__nn",
                lambda t: pc.cast(pc.is_valid(t[field]), pa.int64()),
            )
            return GroupedDataset(
                flagged._ds, keys, null_safe=True
            ).aggregate(Sum("__nn", alias_name=name))
        # native-typed fast path (r5): drop SQL-ignored null values up
        # front so the pair distinct runs on native key types (the
        # null-safe surrogate encoding is O(n) string building —
        # measured ~2x this whole operator at 16M rows); groups whose
        # values are ALL null are re-added as 0 via the combiner-count
        # keys spine (SQL COUNT(DISTINCT x) semantics, matching the
        # holistic path).
        nonnull = narrow.filter(
            batch_fn=lambda t: t.filter(pc.is_valid(t[field]))
        )
        counts = GroupedDataset(
            nonnull.distinct()._ds, keys
        ).aggregate(Count(field, alias_name=name, ignore_nulls=False))
        spine = GroupedDataset(narrow._ds, keys).aggregate(
            Count(keys[0], alias_name="__n", ignore_nulls=False)
        ).project(keys)
        joined = spine.join(
            Dataset(counts._ds.materialize()), on=keys, how="left"
        )
        return joined.with_column(
            name,
            lambda t: pc.fill_null(
                pc.cast(t[name], pa.int64()), pa.scalar(0, pa.int64())
            ),
        ).project(keys + [name])

    _AGG_DISTRIBUTABLE = {
        "count", "sum", "average", "min", "max", "stddev", "var",
        "median", "count_distinct", "mode",
    }

    def _agg_holistic_probe(self, funcs, has_post: bool) -> str:
        """auto routing for holistic grouped aggs (the same
        bytes-per-group hazard model as the window probe,
        :meth:`Dataset._window_low_card_probe`): footer byte estimate
        ÷ 64k-prefix distinct keys is an UPPER bound on bytes/group —
        only when even that bound exceeds a sane task heap does the
        holistic path become a scale risk. Cheap by construction: no
        probe at all when the estimate is unknown or small."""
        est = _estimate_bytes(self._ds)
        if est is None or est < _WINDOW_BUCKETED_MIN_GROUP_BYTES:
            return "groups"
        head = self._ds.select_columns(self._keys).limit(65536).take_all()
        distinct = len({tuple(r[k] for k in self._keys) for r in head})
        if (
            distinct > _WINDOW_LOW_CARD
            or est // max(distinct, 1) < _WINDOW_BUCKETED_MIN_GROUP_BYTES
        ):
            return "groups"
        undistributable = has_post or self._null_safe or any(
            f not in self._AGG_DISTRIBUTABLE for f, _ in funcs
        )
        if undistributable:
            import warnings

            reason = (
                "null-safe grouping" if self._null_safe
                else "string_agg/list/set have no scale path "
                     "(their output is itself O(group))"
            )
            warnings.warn(
                f"holistic grouped aggregate over ~{distinct} keys with "
                f"~{est // max(distinct, 1) >> 20} MiB/group estimated: "
                f"one group per task may not fit in memory, but {reason}"
                " keeps it on strategy='groups'. Pre-aggregate or"
                " restructure the query.",
                stacklevel=3,
            )
            return "groups"
        return "distributed"

    def _agg_distributed(self, funcs: list[tuple[str, str]]) -> Dataset:
        """Scale path for holistic grouped aggregates (VERDICT r4
        'What's wrong #1'): median → the narrow per-group
        :meth:`quantile` kernel, count_distinct → the pair-distinct
        :meth:`nunique` shuffle, mode → the :meth:`mode` count-reduce;
        the algebraic kinds keep the map-side combiner. Parts are
        inner-joined back on the group keys (every part preserves
        every group, including all-null-value groups) and projected to
        the declared column order. No whole-group materialization at
        any size; string_agg/list/set refuse (output is O(group))."""
        keys = self._keys
        bad = sorted({
            f for f, _ in funcs if f not in self._AGG_DISTRIBUTABLE
        })
        if bad:
            raise ValueError(
                f"agg(strategy='distributed') has no scale path for "
                f"{bad} — their output is O(group); use "
                "strategy='groups'"
            )
        if self._null_safe:
            raise ValueError(
                "agg(strategy='distributed') does not support "
                "null_safe grouping (the part joins are equi-joins); "
                "use strategy='groups'"
            )
        algebraic = [
            (f, fld) for f, fld in funcs
            if f not in ("median", "count_distinct", "mode")
        ]
        # pin the NARROW projection once — the k part-pipelines would
        # otherwise each re-execute the upstream lineage (k input scans
        # instead of one); parts re-read object-store blocks instead
        cols = list(dict.fromkeys(keys + [fld for _, fld in funcs]))
        src = GroupedDataset(
            self._ds.select_columns(cols).materialize(), keys,
            null_safe=self._null_safe,
        )
        parts: list[Dataset] = []
        if algebraic:
            parts.append(src.agg(algebraic, strategy="groups"))
        medians = {
            f"median({fld})": fld for f, fld in funcs if f == "median"
        }
        for name, fld in medians.items():
            parts.append(src.quantile(fld, {name: 0.5}))
        for f, fld in funcs:
            if f == "count_distinct":
                parts.append(src.nunique(fld))
            elif f == "mode":
                parts.append(src.mode(fld))
        # pin each part before joining: the join path probes schemas,
        # which executes a lazy aggregate once for the probe and again
        # for the data (measured 2x the whole plan). Parts are
        # result-sized — one row per group — so pinning is free.
        parts = [Dataset(p._ds.materialize()) for p in parts]
        out = parts[0]
        for p in parts[1:]:
            out = out.join(p, on=keys, how="inner")
        return out.project(keys + [f"{f}({fld})" for f, fld in funcs])

    def mode(self, field: str, out: str | None = None) -> Dataset:
        """Distributed SQL-style ``mode(field)`` per group — the scale
        path for ``agg([("mode", field)])``: drop SQL-ignored null
        values up front (so the pair groupby stays on NATIVE key types
        — the null-safe surrogate-key encoding costs O(n) string
        building, measured 20x the whole operator at 16M rows), count
        rows per (keys, value) pair with the map-side combiner (only
        distinct pairs cross the exchange), then argmax = combiner Max
        over pair counts + an equi-join filter + combiner Min over the
        tied values (the deterministic smallest-value tie-break the
        holistic path uses; duckdb's native mode() picks by arrival
        order, which is not reproducible). Groups whose values are ALL
        null are re-added with a null mode via a left join from the
        distinct-keys spine. No group ever materializes in one task.
        Null GROUP keys need ``null_safe=True`` grouping, which keeps
        the surrogate path throughout."""
        from ray.data.aggregate import Count, Max, Min, Sum

        name = out or f"mode({field})"
        keys = self._keys
        narrow = Dataset(self._ds.select_columns(keys + [field]))
        if self._null_safe:
            # null group keys: the surrogate-encoded (slower) path
            flagged = narrow.with_column(
                "__one",
                lambda t: pc.cast(pc.is_valid(t[field]), pa.int64()),
            )
            cnt = GroupedDataset(
                flagged._ds, keys + [field], null_safe=True
            ).aggregate(Sum("__one", alias_name="__cnt"))
            mx = GroupedDataset(cnt._ds, keys, null_safe=True).aggregate(
                Max("__cnt", alias_name="__mx")
            )
            best = cnt.join(mx, on=keys, how="inner").filter(
                batch_fn=lambda t: t.filter(
                    pc.equal(t["__cnt"], t["__mx"])
                )
            )
            return GroupedDataset(
                best._ds, keys, null_safe=True
            ).aggregate(Min(field, alias_name=name))
        nonnull = narrow.filter(
            batch_fn=lambda t: t.filter(pc.is_valid(t[field]))
        )
        # pin the pair counts: they feed BOTH the max and the join —
        # lazy lineage would re-execute the full input scan twice
        # (measured 5x the operator at 16M rows). Size is bounded by
        # the number of distinct (keys, value) pairs, the same reduce
        # bound nunique lives with.
        cnt = Dataset(
            GroupedDataset(nonnull._ds, keys + [field]).aggregate(
                Count(field, alias_name="__cnt", ignore_nulls=False)
            )._ds.materialize()
        )
        mx = GroupedDataset(cnt._ds, keys).aggregate(
            Max("__cnt", alias_name="__mx")
        )
        best = cnt.join(mx, on=keys, how="inner").filter(
            batch_fn=lambda t: t.filter(pc.equal(t["__cnt"], t["__mx"]))
        )
        modes = GroupedDataset(best._ds, keys).aggregate(
            Min(field, alias_name=name)
        )
        # all-null groups: re-add from the keys spine (map-side
        # combiner count — only blocks x groups partial rows shuffle,
        # unlike a distinct() which exchanges every key row)
        spine = GroupedDataset(narrow._ds, keys).aggregate(
            Count(keys[0], alias_name="__n", ignore_nulls=False)
        ).project(keys)
        return spine.join(modes, on=keys, how="left")

    def quantile(
        self,
        col: str,
        qs: float | dict[str, float] = 0.5,
        *,
        discrete: bool = False,
    ) -> Dataset:
        """Exact per-group quantiles (duckdb parity): linear
        interpolation = ``quantile_cont`` / ``median``; pass
        ``discrete=True`` for ``quantile_disc`` (an actual element,
        numpy ``inverted_cdf``). ``qs`` is a quantile or a
        ``{output_name: q}`` mapping (one shuffle for all of them).

        Exact quantiles are holistic — they need every group value in
        one place — so this shuffles, but only the narrow
        ``keys + [col]`` projection (pruned here, before the exchange).
        Nulls/NaNs are skipped; an all-null group yields null. For a
        sketch that avoids shuffling the column at all, see
        ``stages.sketches.approx_quantiles``."""
        if isinstance(qs, float):
            qs = {f"quantile({col})": qs}
        keys = self._keys
        items = list(qs.items())
        method = "inverted_cdf" if discrete else "linear"
        narrow = self._ds.select_columns(keys + [col])

        def _g(t: pa.Table) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            arrays = [t[k].slice(0, 1) for k in keys]
            for _, q in items:
                arrays.append(
                    pa.array(
                        [float(np.quantile(v, q, method=method)) if len(v) else None],
                        pa.float64(),
                    )
                )
            return pa.table(arrays, names=keys + [name for name, _ in items])

        return GroupedDataset(narrow, keys, null_safe=self._null_safe).map_groups(
            _g, batch_format="pyarrow"
        )

    def corr(
        self,
        x: str,
        y: str,
        *,
        kinds: dict[str, str] | None = None,
    ) -> Dataset:
        """Per-group correlation/covariance — fully ALGEBRAIC: one
        map_batches derives the pair moments (xy, x², y², null-pair
        masked), the existing combiner groupby sums them, and a closed
        form finishes — no holistic group materialization at any size.

        ``kinds`` maps output name -> one of ``corr`` / ``covar_samp``
        / ``covar_pop`` / ``regr_slope`` / ``regr_intercept`` /
        ``regr_r2`` / ``regr_count`` / ``regr_avgx`` / ``regr_avgy``
        (default ``{"corr(x,y)": "corr"}``; for the regr_* family ``y``
        is the dependent variable, SQL argument order
        ``regr_*(y, x)`` maps to ``corr(x=<indep>, y=<dep>)``). SQL
        semantics: rows where either side is null are skipped; groups
        with < 2 pairs yield null for the sample statistics.

        Numerics: the closed form is the textbook one-pass formula —
        fine at double precision for data whose mean is within ~1e6 of
        its spread; re-center upstream for pathological scales."""
        from ray.data.aggregate import Sum

        kinds = kinds or {f"corr({x},{y})": "corr"}
        _CORR_KINDS = (
            "corr", "covar_samp", "covar_pop", "regr_slope",
            "regr_intercept", "regr_r2", "regr_count", "regr_avgx", "regr_avgy",
        )
        for k in kinds.values():
            if k not in _CORR_KINDS:
                raise ValueError(f"unsupported corr kind {k!r}")
        keys = self._keys

        def _derive(t: pa.Table) -> pa.Table:
            ok = pc.and_(pc.is_valid(t[x]), pc.is_valid(t[y]))
            vx = pc.if_else(ok, pc.cast(t[x], pa.float64()), pa.scalar(None, pa.float64()))
            vy = pc.if_else(ok, pc.cast(t[y], pa.float64()), pa.scalar(None, pa.float64()))
            return pa.table(
                {
                    **{k: t[k] for k in keys},
                    "__sx": vx,
                    "__sy": vy,
                    "__sxy": pc.multiply(vx, vy),
                    "__sxx": pc.multiply(vx, vx),
                    "__syy": pc.multiply(vy, vy),
                    "__np": pc.cast(ok, pa.int64()),
                }
            )

        moments = GroupedDataset(
            self._ds.map_batches(_derive, batch_format="pyarrow"),
            keys,
            null_safe=self._null_safe,
        ).aggregate(
            Sum("__sx", alias_name="__sx"),
            Sum("__sy", alias_name="__sy"),
            Sum("__sxy", alias_name="__sxy"),
            Sum("__sxx", alias_name="__sxx"),
            Sum("__syy", alias_name="__syy"),
            Sum("__np", alias_name="__np"),
        )
        names = list(kinds.items())

        def _finish(t: pa.Table) -> pa.Table:
            n = t["__np"].to_numpy(zero_copy_only=False).astype(np.float64)
            sx = t["__sx"].to_numpy(zero_copy_only=False).astype(np.float64)
            sy = t["__sy"].to_numpy(zero_copy_only=False).astype(np.float64)
            sxy = t["__sxy"].to_numpy(zero_copy_only=False).astype(np.float64)
            sxx = t["__sxx"].to_numpy(zero_copy_only=False).astype(np.float64)
            syy = t["__syy"].to_numpy(zero_copy_only=False).astype(np.float64)
            arrays = [t[k] for k in keys]
            with np.errstate(invalid="ignore", divide="ignore"):
                vxx = n * sxx - sx * sx  # n² · var_pop(x)
                for _, kind in names:
                    if kind == "covar_pop":
                        v = np.where(n >= 1, (sxy - sx * sy / n) / n, np.nan)
                    elif kind == "covar_samp":
                        v = np.where(n >= 2, (sxy - sx * sy / n) / (n - 1), np.nan)
                    elif kind == "regr_slope":
                        v = np.where(vxx > 0, (n * sxy - sx * sy) / vxx, np.nan)
                    elif kind == "regr_intercept":
                        slope = np.where(vxx > 0, (n * sxy - sx * sy) / vxx, np.nan)
                        v = np.where(n >= 1, (sy - slope * sx) / n, np.nan)
                    elif kind == "regr_r2":
                        # duckdb/postgres: constant y (vyy == 0) with a
                        # varying x is a perfect fit -> 1.0; constant x
                        # (vxx == 0) is undefined -> null
                        vyy = n * syy - sy * sy
                        den = vxx * vyy
                        v = np.where(
                            vxx > 0,
                            np.where(
                                vyy > 0,
                                np.square(n * sxy - sx * sy)
                                / np.where(den > 0, den, 1.0),
                                1.0,
                            ),
                            np.nan,
                        )
                    elif kind == "regr_count":
                        v = n
                    elif kind == "regr_avgx":
                        v = np.where(n >= 1, sx / n, np.nan)
                    elif kind == "regr_avgy":
                        v = np.where(n >= 1, sy / n, np.nan)
                    else:  # corr
                        den = np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
                        v = np.where(
                            (n >= 2) & (den > 0), (n * sxy - sx * sy) / den, np.nan
                        )
                    arrays.append(pa.array(v, pa.float64(), mask=np.isnan(v)))
            return pa.table(arrays, names=keys + [nm for nm, _ in names])

        return moments.map_batches(_finish)

    def map_groups(self, fn, **kw) -> Dataset:
        if self._null_safe:
            keys = self._keys

            def _add(batch: pa.Table) -> pa.Table:
                return batch.append_column("__gk", _nullsafe_gk(batch, keys))

            kw.setdefault("batch_format", "pyarrow")
            fmt = kw["batch_format"]
            if fmt not in ("pandas", "pyarrow"):
                raise ValueError(
                    f"null_safe map_groups supports pandas/pyarrow, not {fmt!r}"
                )

            def _fn(group):
                if fmt == "pandas":
                    return fn(group.drop(columns=["__gk"]))
                return fn(group.drop_columns(["__gk"]))

            enc = self._ds.map_batches(_add, batch_format="pyarrow")
            return Dataset(enc.groupby(["__gk"]).map_groups(_fn, **kw))
        kw.setdefault("batch_format", "pyarrow")
        return Dataset(self._ds.groupby(self._keys).map_groups(fn, **kw))
