"""Mergeable sketch aggregates — approximate distinct count and
quantiles at 100 TB scale.

The reference has no sketches or approximate aggregates (SURVEY.md §2.3
"Aggregations": every agg materializes all records in one process).
These operators follow the partial-aggregate discipline the engine uses
everywhere: each ``map_batches`` task reduces its blocks to a tiny
commutative summary (16 KB HLL registers / a histogram vector), and the
driver merges per-block summaries — bulk data never converges anywhere.

- :func:`hll_distinct` — HyperLogLog (Flajolet et al., 2007) with the
  small-range linear-counting correction. Registers merge by elementwise
  max, so block order, retries, and replays are all free (same algebra
  argument as the CDC engine's LWW merge). Error ≈ 1.04/sqrt(2^p).
- :func:`approx_quantiles` — two-pass fixed-grid histogram: pass 1 is a
  ``min/max`` aggregate (shuffle-free), pass 2 bins every block onto the
  shared grid; the driver sums histograms and interpolates. Error is
  bounded by one bin width of the value range.

Determinism: hashing is the engine's ``stable_hash`` (polars xxhash,
fixed seed), so estimates are bit-identical across runs and cluster
shapes — unlike e.g. duckdb's ``approx_count_distinct``, which is why
the driver check is rows-only and pytest holds the error-bound oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from palimpzest_ray.functions.tokens import (
    duckdb_hash_i64,
    limit_kernel_threads,
    stable_hash,
)

_HLL_HASHES = {"stable": stable_hash, "duckdb": duckdb_hash_i64}


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of uint64 (no float rounding traps —
    ``log2`` misplaces the top bit for values near 2^53+)."""
    n = np.zeros(w.shape, np.int64)
    w = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = w >= (np.uint64(1) << np.uint64(shift))
        n[big] += shift
        w[big] >>= np.uint64(shift)
    return n + (w > 0)


def hll_registers_for_batch(
    values: pa.Array | pa.ChunkedArray, p: int = 12, hash_fn: str = "stable"
) -> np.ndarray:
    """One batch → its HLL register array (uint8[2^p]).

    ``hash_fn="duckdb"`` (integer columns only) uses the
    duckdb-reproducible murmur so a DuckDB SQL oracle can rebuild the
    identical registers from ``hash(col)``."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    values = values.drop_null()  # COUNT(DISTINCT) ignores nulls
    if len(values) == 0:
        return np.zeros(1 << p, dtype=np.uint8)
    h = _HLL_HASHES[hash_fn](values)  # uint64
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)  # remaining bits in the top positions
    # rho = leading zeros within 64 bits + 1; w==0 → 64-p+1 (max)
    rho = np.where(w > 0, 64 - _bit_length_u64(w) + 1, 64 - p + 1).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Flajolet estimator + small-range linear counting.

    The harmonic sum runs in EXACT integer arithmetic (``sum 2^-reg``
    rescaled by ``2^B``, B = max rho): the float ``exp2`` sum is
    order-dependent once register exponents span > 52 bits, which would
    make the estimate depend on merge order. The integer path is
    deterministic AND bit-reproducible by a SQL oracle computing the
    same ``alpha*m^2*2^B / S`` expression (see ``d10``/``d16``)."""
    m = len(regs)
    p = int(m).bit_length() - 1
    B = 64 - p + 1  # max possible rho
    counts = np.bincount(regs.astype(np.int64), minlength=B + 1)
    S = sum(int(c) << (B - r) for r, c in enumerate(counts) if c)  # exact
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m * 2.0**B / float(S)
    if est <= 2.5 * m:
        zeros = int(counts[0])
        if zeros:
            return float(m) * np.log(float(m) / zeros)
    return float(est)


def hll_estimate_int(regs: np.ndarray) -> int:
    """``floor(est + 0.5)`` — the rounding a SQL oracle can reproduce
    exactly (duckdb ``round()`` is half-away, Python ``round()`` is
    half-even; ``floor(x + 0.5)`` is the same IEEE op chain in both)."""
    return int(np.floor(hll_estimate(regs) + 0.5))


def hll_sketch(
    ds: rd.Dataset, col: str, p: int = 12, hash_fn: str = "stable"
) -> np.ndarray:
    """Distributed sketch build: every block reduces to one register row
    (2^p bytes as ``pa.binary``); the driver folds them with elementwise
    max. Only ~num_blocks × 2^p bytes ever reach the driver."""

    def _sk(batch: pa.Table) -> pa.Table:
        limit_kernel_threads()
        regs = hll_registers_for_batch(batch[col], p, hash_fn)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    merged = np.zeros(1 << p, dtype=np.uint8)
    sk = ds.map_batches(_sk, batch_format="pyarrow")
    for b in sk.iter_batches(batch_format="pyarrow", batch_size=None):
        for buf in b["regs"].to_pylist():
            np.maximum(merged, np.frombuffer(buf, dtype=np.uint8), out=merged)
    return merged


def hll_distinct(
    ds: rd.Dataset, col: str, p: int = 12, hash_fn: str = "stable"
) -> float:
    """Approximate COUNT(DISTINCT col); error ≈ 1.04/sqrt(2^p)."""
    return hll_estimate(hll_sketch(ds, col, p, hash_fn))


def approx_quantiles(
    ds: rd.Dataset,
    col: str,
    quantiles: list[float],
    bins: int = 8192,
) -> list[float]:
    """Approximate quantiles via a shared fixed grid: the error bound is
    one bin width of the (min, max) range. Two linear passes, no
    shuffle; histogram vectors (``bins`` × int64) merge by addition.

    The bin rule is the closed form ``floor((v - lo) / (hi - lo) * bins)``
    (clipped to [0, bins-1]) and the estimate is the bin's right edge
    ``lo + (hi - lo) * (i + 1) / bins`` — both single IEEE-double
    expressions, so any engine evaluating the same formula (e.g. a
    DuckDB SQL oracle, see ``__ray_entry__.d11``) reproduces the sketch
    bit-for-bit."""
    from ray.data.aggregate import Max, Min

    row = ds.aggregate(Min(col, alias_name="lo"), Max(col, alias_name="hi"))
    lo, hi = float(row["lo"]), float(row["hi"])
    if lo == hi:
        return [lo] * len(quantiles)

    def _hist(batch: pa.Table) -> pa.Table:
        limit_kernel_threads()
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        idx = np.floor((v - lo) / (hi - lo) * bins).astype(np.int64)
        np.clip(idx, 0, bins - 1, out=idx)
        counts = np.bincount(idx, minlength=bins)
        return pa.table({"counts": pa.array([counts.astype(np.int64)])})

    total = np.zeros(bins, dtype=np.int64)
    for b in ds.map_batches(_hist, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for c in b["counts"].to_pylist():
            total += np.asarray(c, dtype=np.int64)
    cum = np.cumsum(total)
    n = cum[-1]
    out = []
    for q in quantiles:
        target = q * n
        i = int(np.searchsorted(cum, target, side="left"))
        out.append(lo + (hi - lo) * (min(i + 1, bins) * 1.0) / bins)
    return out


def heavy_hitters(
    ds: rd.Dataset,
    col: str,
    k: int = 10,
    *,
    cap_per_block: int = 4096,
    driver_cap: int = 65536,
) -> pa.Table:
    """Approximate top-``k`` most frequent values of ``col`` (heavy
    hitters), space-saving style: every block reduces to its exact value
    counts truncated to the top ``cap_per_block`` (recording the largest
    dropped count as that block's undercount bound), and the driver
    folds summaries into a capped accumulator. Nothing bulk converges:
    driver traffic is ≤ ``cap_per_block`` entries per block, driver
    memory ≤ 2×``driver_cap`` entries (trimmed back to ``driver_cap``
    with the same largest-dropped-count bookkeeping; the 2× slack
    amortizes the sort to once per ``driver_cap`` insertions).

    Returns ``(value, count, count_hi)`` sorted by count desc then value
    asc, limited to ``k``: ``count`` is the observed sum (a lower bound
    on the true frequency), ``count_hi`` adds the undercount bounds of
    every summary/compaction that could have dropped the value. When
    ``cap_per_block`` ≥ per-block distinct values (and no driver
    compaction fires) both bounds are exact and equal the GROUP BY
    counts. Any value with true frequency above the k-th ``count`` plus
    the total dropped bound is guaranteed present (Metwally et al.,
    space-saving; Misra–Gries merge).

    The reference has no frequency estimation; this is the hot-key
    detector companion to the CDC engine's skew handling (a salting /
    ``suggest_num_partitions`` advisory can be driven from its output).
    """
    import pyarrow.compute as pc

    def _counts(batch: pa.Table) -> pa.Table:
        limit_kernel_threads()
        vc = pc.value_counts(batch[col].combine_chunks())
        values, counts = vc.field("values"), vc.field("counts")
        err = 0
        if len(values) > cap_per_block:
            order = pc.sort_indices(
                pa.table({"c": counts}), sort_keys=[("c", "descending")]
            )
            keep = order.slice(0, cap_per_block)
            err = counts.take(order.slice(cap_per_block, 1))[0].as_py()
            values, counts = values.take(keep), counts.take(keep)
        return pa.table(
            {
                "values": pa.array([values.to_pylist()]),
                "counts": pa.array([counts.cast(pa.int64()).to_pylist()]),
                "err": pa.array([err], pa.int64()),
            }
        )

    acc: dict = {}          # value -> [count, err_present]
    total_err = 0           # sum of all summary + compaction bounds

    def _compact():
        # amortized: let the accumulator grow to 2x before trimming back
        # to driver_cap, so the O(n log n) sort runs once per driver_cap
        # insertions instead of once per block summary
        nonlocal total_err
        if len(acc) <= 2 * driver_cap:
            return
        ranked = sorted(acc.items(), key=lambda kv: kv[1][0], reverse=True)
        dropped_max = ranked[driver_cap][1][0]
        for v, _ in ranked[driver_cap:]:
            del acc[v]
        total_err += dropped_max

    for b in ds.map_batches(_counts, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for values, counts, err in zip(
            b["values"].to_pylist(), b["counts"].to_pylist(), b["err"].to_pylist()
        ):
            for v, c in zip(values, counts):
                ent = acc.get(v)
                if ent is None:
                    acc[v] = [c, err]
                else:
                    ent[0] += c
                    ent[1] += err
            total_err += err
            _compact()

    # count desc, value asc (nulls last) — native comparison so numeric
    # columns match an ORDER BY count DESC, value ASC oracle; str()
    # fallback only if the column somehow mixes incomparable types
    try:
        top = sorted(
            acc.items(), key=lambda kv: (-kv[1][0], kv[0] is None, kv[0])
        )[:k]
    except TypeError:
        top = sorted(acc.items(), key=lambda kv: (-kv[1][0], str(kv[0])))[:k]
    return pa.table(
        {
            "value": pa.array([v for v, _ in top]),
            "count": pa.array([e[0] for _, e in top], pa.int64()),
            "count_hi": pa.array(
                [e[0] + (total_err - e[1]) for _, e in top], pa.int64()
            ),
        }
    )


def bloom_bitmap(
    ds: rd.Dataset, col: str, *, num_bits: int = 1 << 23, hashes: int = 5
) -> np.ndarray:
    """Distributed Bloom filter build over ``col``: each block reduces
    to its OR'd bitmap (``num_bits``/8 bytes), the driver ORs summaries
    — same mergeable-summary discipline as :func:`hll_sketch`. Double
    hashing (h1 + i·h2 mod m) from the engine's stable xxhash, so the
    filter is deterministic across runs and layouts.

    Size ``num_bits`` ≈ 10 bits/key for ~1% false positives (m/n=10,
    k=5 optimal-ish); the bitmap must fit a worker comfortably — 2^23
    bits = 1 MiB covers ~800k keys, 2^30 = 128 MiB covers ~100M keys.
    """
    assert num_bits % 64 == 0

    def _positions(values) -> np.ndarray:
        h1 = stable_hash(values)
        h2 = stable_hash(values, seed=0xB10F)
        # odd step so h2 cycles the full ring regardless of m
        step = (h2 | np.uint64(1))
        idx = np.empty((hashes, len(h1)), dtype=np.uint64)
        for i in range(hashes):
            idx[i] = (h1 + np.uint64(i) * step) % np.uint64(num_bits)
        return idx.reshape(-1)

    def _bm(batch: pa.Table) -> pa.Table:
        limit_kernel_threads()
        bits = np.zeros(num_bits // 64, dtype=np.uint64)
        pos = _positions(batch[col].combine_chunks())
        np.bitwise_or.at(
            bits, (pos // np.uint64(64)).astype(np.int64),
            np.uint64(1) << (pos % np.uint64(64)),
        )
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    merged = np.zeros(num_bits // 64, dtype=np.uint64)
    for b in ds.map_batches(_bm, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for buf in b["bits"].to_pylist():
            np.bitwise_or(merged, np.frombuffer(buf, dtype=np.uint64), out=merged)
    return merged


def bloom_contains(
    bitmap: np.ndarray, values, *, num_bits: int = 1 << 23, hashes: int = 5
) -> np.ndarray:
    """Vectorized membership probe: True = probably present (false
    positives at the filter's rate), False = DEFINITELY absent."""
    h1 = stable_hash(values)
    h2 = stable_hash(values, seed=0xB10F)
    step = (h2 | np.uint64(1))
    ok = np.ones(len(h1), dtype=bool)
    for i in range(hashes):
        pos = (h1 + np.uint64(i) * step) % np.uint64(num_bits)
        word = bitmap[(pos // np.uint64(64)).astype(np.int64)]
        ok &= (word >> (pos % np.uint64(64))) & np.uint64(1) != 0
    return ok


def bloom_prefilter(
    ds: rd.Dataset,
    keys: rd.Dataset,
    col: str,
    *,
    key_col: str | None = None,
    num_bits: int = 1 << 23,
    hashes: int = 5,
) -> rd.Dataset:
    """Keep rows of ``ds`` whose ``col`` is PROBABLY in
    ``keys[key_col]``: a superset of the exact semi-join (never a false
    negative). The scale path when the key side is too big for an exact
    broadcast key set but its Bloom bitmap fits (10 bits/key): ``keys``
    never materializes anywhere — only OR'd bitmaps move. Compose with
    an exact semi/anti join on the (much smaller) survivor set when
    exactness matters; for anti-join, filter on the INVERTED probe
    locally instead (false positives there would drop real rows — use
    this only as the matching-side reducer)."""
    import ray

    bm = bloom_bitmap(keys, key_col or col, num_bits=num_bits, hashes=hashes)
    ref = ray.put(bm)

    def _probe(batch: pa.Table) -> pa.Table:
        limit_kernel_threads()
        mask = bloom_contains(
            ray.get(ref), batch[col].combine_chunks(),
            num_bits=num_bits, hashes=hashes,
        )
        return batch.filter(pa.array(mask))

    return ds.map_batches(_probe, batch_format="pyarrow")


def hll_distinct_by(
    ds: rd.Dataset,
    keys: str | list[str],
    col: str,
    p: int = 12,
    *,
    null_safe: bool = False,
    hash_fn: str = "stable",
) -> rd.Dataset:
    """Per-group approximate COUNT(DISTINCT col) — the sketch analogue
    of ``GroupedDataset.nunique``. Each block reduces every group it
    contains to one 2^p-byte register row, so the groupby shuffle moves
    ``O(blocks × groups-per-block × 2^p)`` bytes regardless of how many
    distinct values exist; registers max-merge in ``map_groups``.
    Error ≈ 1.04/sqrt(2^p). Deterministic (stable_hash)."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def _sk(batch: pa.Table) -> pa.Table:
        limit_kernel_threads()
        # null rows are excluded from registers below (sel[valid[sel]]);
        # fill first so hashing never casts NaN to int64
        col_filled = pa.compute.fill_null(
            batch[col], pa.scalar(0).cast(batch[col].type)
        )
        h = _HLL_HASHES[hash_fn](col_filled)
        m = 1 << p
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        w = h << np.uint64(p)
        rho = np.where(w > 0, 64 - _bit_length_u64(w) + 1, 64 - p + 1).astype(np.uint8)
        # segment the batch by group (one numpy pass per group present):
        # Arrow-native composite-key encode + dictionary_encode replaces
        # the former pandas to_pandas()+factorize hop (same
        # first-occurrence code order, zero pandas conversion)
        from palimpzest_ray.dataset import _encode_composite_key

        enc = pa.compute.dictionary_encode(_encode_composite_key(batch, keys))
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        bounds = np.flatnonzero(np.diff(codes[order], prepend=-1))
        regs_out, key_rows = [], []
        valid = np.asarray(
            pa.compute.is_valid(batch[col]).to_numpy(zero_copy_only=False), dtype=bool
        )
        for s, e in zip(bounds, np.append(bounds[1:], len(order))):
            sel = order[s:e]
            sel = sel[valid[sel]]  # COUNT(DISTINCT) ignores nulls
            regs = np.zeros(m, dtype=np.uint8)
            if len(sel):
                np.maximum.at(regs, idx[sel], rho[sel])
            regs_out.append(regs.tobytes())
            key_rows.append(order[s])
        tk = batch.select(keys).take(pa.array(np.array(key_rows, dtype=np.int64)))
        return tk.append_column("__regs", pa.array(regs_out, pa.binary()))

    partial = ds.map_batches(_sk, batch_format="pyarrow")
    out_col = f"approx_nunique({col})"

    def _merge(group: pa.Table) -> pa.Table:
        merged = np.zeros(1 << p, dtype=np.uint8)
        for buf in group["__regs"].to_pylist():
            np.maximum(merged, np.frombuffer(buf, dtype=np.uint8), out=merged)
        head = group.select(keys).slice(0, 1)
        return head.append_column(
            out_col, pa.array([hll_estimate_int(merged)], pa.int64())
        )

    if null_safe:  # null group keys crash Ray's sort shuffle otherwise
        from palimpzest_ray.dataset import GroupedDataset

        return GroupedDataset(partial, keys, null_safe=True).map_groups(
            _merge, batch_format="pyarrow"
        ).ray
    return partial.groupby(keys).map_groups(_merge, batch_format="pyarrow")


def hll_oracle_sql(
    table: str, col: str, *, p: int, out: str, group: str | None = None
) -> str:
    """DuckDB SQL that reproduces ``sketches.hll_*(hash_fn="duckdb")``
    bit-for-bit: rebuild registers from ``hash(col)``, harmonic sum as
    an exact HUGEINT scaled by 2^B, then ONE float expression with the
    same literal casts and left-to-right operation order as
    ``hll_estimate`` (both engines: alpha * m * m * 2^B / double(S),
    then floor(x + 0.5))."""
    m = 1 << p
    B = 64 - p + 1
    g_sel, g_by, g_out = "", "", ""
    if group:
        g_sel, g_by, g_out = f"{group}, ", f"group by {group}", f"{group}, "
    return f"""
        with h as (
          select {g_sel}hash({col}) as hv
          from {table} where {col} is not null
        ),
        r as (
          select {g_sel}hv >> (64 - {p}) as idx,
                 hv % (1::UBIGINT << (64 - {p})) as rem
          from h
        ),
        regs as (
          select {g_sel}idx,
                 max(case when rem = 0 then {B}
                     else (64 - {p}) - length(bin(rem)) + 1 end) as reg
          from r group by {g_sel}idx
        ),
        s as (
          select {g_sel}count(*) as nz,
                 sum(cast((1::UBIGINT << ({B} - reg)) as HUGEINT)) as s_nz
          from regs {g_by}
        )
        select {g_out}cast(floor(
            (0.7213::DOUBLE / (1::DOUBLE + 1.079::DOUBLE / {m}::DOUBLE))
            * {m} * {m} * 2.0^{B}
            / cast(s_nz + cast(({m} - nz) as HUGEINT)
                   * cast((1::UBIGINT << {B}) as HUGEINT) as DOUBLE)
            + 0.5) as BIGINT) as "{out}"
        from s
    """
