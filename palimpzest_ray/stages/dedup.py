"""Deduplication stages for training-data pipelines.

Five families, each Ray-Data-first (SURVEY.md §2.3 lists near-dedup as
absent from the reference — ``EmbeddingJoin`` at ``join.py:492+`` is the
closest machinery; these are engine additions):

- :func:`exact_dedup` — hash-partition on the key columns, keep the row
  with the smallest ``order_col`` per key (``groupby.map_groups``; no
  global seen-set, unlike the reference's sequential ``distinct.py:12``).
- :func:`minhash_lsh_dedup` — word-shingle → MinHash signature → banded
  LSH buckets (one ``groupby`` on the band key) → per-bucket candidate
  pairs verified by estimated Jaccard → union-find clusters → keep the
  min-id representative per cluster.
- :func:`simhash_dedup` — 64-bit SimHash over word hashes, Hamming-ball
  candidates via 4×16-bit band tables, verified by true Hamming
  distance.
- :func:`ngram_jaccard_pairs` — exact word-n-gram Jaccard for a set of
  candidate pairs (the exact-verify path behind MinHash).
- :func:`embedding_neardup` — random-hyperplane LSH buckets over an
  embedding column, per-bucket pairwise cosine ≥ threshold.

Scale notes (100 TB framing): signatures are fixed-width (64×u64 =
512 B/doc) so the LSH shuffle moves signatures + ids, never text.
Cluster resolution is two-path (:func:`_drop_by_pair_table`): small
candidate-pair sets take the driver union-find fast path; above the
pair limit (a dup-heavy corpus can emit billions of pairs) clustering
runs as distributed connected components
(:func:`duplicate_ids_distributed` — min-label edge contraction with
pointer doubling, all groupby/cogroup, driver holds only round
counters) and the drop set applies via a shuffle anti-join.
Oversized LSH buckets (degenerate content, e.g. empty strings) are
capped at ``max_bucket`` candidates per bucket and reported, not
silently exploded into O(g²) pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from palimpzest_ray.functions.tokens import stable_hash

_P1 = np.uint64(0x9E3779B185EBCA87)  # golden-ratio mixing constants
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def exact_dedup(
    ds: rd.Dataset, key_cols: list[str], order_col: str
) -> rd.Dataset:
    """Keep the row with the smallest ``order_col`` per ``key_cols``
    group — the distributed keep-first (reference ``distinct.py:43-45``
    keeps first *arrival*; we make it deterministic)."""

    def _first(group: pa.Table) -> pa.Table:
        if group.num_rows <= 1:
            return group
        return group.sort_by(order_col).slice(0, 1)

    return ds.groupby(key_cols).map_groups(_first, batch_format="pyarrow")


# --------------------------------------------------------------------------
# shared vectorized shingling / signatures
# --------------------------------------------------------------------------


def _word_hashes(
    col: pa.ChunkedArray | pa.Array, hash_fn: str = "stable"
) -> tuple[np.ndarray, np.ndarray]:
    """(flat word hashes, parent doc index per word), fully vectorized:
    lowercase → split on whitespace runs → hash each word.

    ``hash_fn="stable"`` (default) is polars xxhash — the fast
    engine-internal path. ``hash_fn="fnv"`` is FNV-1a-64 over unicode
    CODEPOINTS — chosen because a SQL oracle can restate it verbatim
    (``list_reduce`` over ``unicode(char)`` with HUGEINT wraparound),
    making hash-derived operators (SimHash) exactly checkable cross
    engine."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    words = pc.split_pattern_regex(pc.utf8_lower(col), r"\s+")
    flat = pc.list_flatten(words)
    parents = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, pa.scalar("")).to_numpy(zero_copy_only=False)
    h = _fnv1a_codepoints(flat) if hash_fn == "fnv" else stable_hash(flat)
    return h[keep], parents[keep]


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _fnv1a_codepoints(flat: pa.Array) -> np.ndarray:
    """FNV-1a-64 per string over its unicode codepoints, vectorized
    across strings (numpy UCS-4 grid; the only loop is over character
    POSITIONS, bounded by the longest word). Cross-engine oracle hash —
    see ``_word_hashes(hash_fn="fnv")``."""
    n = len(flat)
    if n == 0:
        return np.empty(0, np.uint64)
    arr = np.array(flat.to_pylist(), dtype="U")
    if arr.dtype.itemsize == 0:  # every string empty
        return np.full(n, _FNV_OFFSET, np.uint64)
    grid = arr.view(np.uint32).reshape(n, -1)
    h = np.full(n, _FNV_OFFSET, np.uint64)
    for j in range(grid.shape[1]):
        c = grid[:, j].astype(np.uint64)
        live = c != 0  # UCS-4 pads with NUL; real NULs can't be in words
        h[live] = (h[live] ^ c[live]) * _FNV_PRIME
    return h


def _shingle_hashes(
    h: np.ndarray, parents: np.ndarray, shingle: int
) -> tuple[np.ndarray, np.ndarray]:
    """Rolling word-n-gram hashes (uint64, wraparound mixing) within doc
    boundaries. Returns (shingle hashes, parent doc per shingle).

    Docs with fewer than ``shingle`` words get ONE synthetic shingle — a
    position-weighted mix of all their word hashes — so distinct short
    docs stay distinct. (The previous all-sentinel signature made every
    short doc band with every other short doc: unrelated 2-word docs
    est_jaccard'd at 1.0 and were mass-deleted as duplicates.)"""
    n = len(h)
    if n == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    boundaries = np.flatnonzero(np.diff(parents, prepend=parents[0] - 1))
    seg_len = np.diff(np.append(boundaries, n))
    outs_h, outs_p = [], []
    if n >= shingle:
        acc = h[: n - shingle + 1] * _P1
        for j in range(1, shingle):
            # explicit mod-2^64 for the scalar weight: numpy warns on
            # SCALAR uint64 overflow even though wraparound is the point
            w = np.uint64((j * int(_P3) + int(_P2)) & 0xFFFFFFFFFFFFFFFF)
            acc = acc ^ (h[j : n - shingle + 1 + j] * w)
        valid = parents[: n - shingle + 1] == parents[shingle - 1 :]
        outs_h.append(acc[valid])
        outs_p.append(parents[: n - shingle + 1][valid])
    short = seg_len < shingle
    if short.any():
        pos = (np.arange(n) - np.repeat(boundaries, seg_len)).astype(np.uint64)
        weighted = h * (_P2 + pos * _P3)
        mix = np.bitwise_xor.reduceat(weighted, boundaries) * _P1
        outs_h.append(mix[short])
        outs_p.append(parents[boundaries][short])
    # each parent lives wholly in one group, so per-parent contiguity
    # (what _minhash_signatures' reduceat needs) survives the concat
    return np.concatenate(outs_h), np.concatenate(outs_p)


def _minhash_signatures(
    sh: np.ndarray, parents: np.ndarray, num_rows: int, num_perm: int, seed: int
) -> np.ndarray:
    """(num_rows, num_perm) uint64 MinHash matrix; docs with no shingles
    get the sentinel max value (never matching anything)."""
    sig = np.full((num_rows, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(sh) == 0:
        return sig
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 63, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
    # (n_shingles, num_perm) permuted hashes, uint64 wraparound
    H = sh[:, None] * a[None, :] + b[None, :]
    # segment-min per doc: shingles arrive grouped by parent (flat order)
    boundaries = np.flatnonzero(np.diff(parents, prepend=parents[0] - 1))
    mins = np.minimum.reduceat(H, boundaries, axis=0)
    sig[parents[boundaries]] = mins
    return sig


def _band_keys(sig: np.ndarray, bands: int) -> np.ndarray:
    """(num_rows, bands) uint64 band keys: fold each band's rows with
    wraparound mixing, band index mixed in so bands never collide."""
    n, num_perm = sig.shape
    r = num_perm // bands
    out = np.empty((n, bands), dtype=np.uint64)
    for b in range(bands):
        # fold in Python ints masked to 64 bits: uint64 *scalar* ops warn
        # on wraparound (array ops don't), and the wraparound is intended
        acc = np.full(n, (b * int(_P3) + int(_P1)) & 0xFFFFFFFFFFFFFFFF, dtype=np.uint64)
        for j in range(r):
            acc = (acc ^ sig[:, b * r + j]) * _P2
        out[:, b] = acc
    return out


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------


def minhash_signature_ds(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle: int = 3,
    seed: int = 7,
) -> rd.Dataset:
    """id + fixed-width MinHash signature per document (the narrow table
    every later stage shuffles — never the text)."""

    def _sig(batch: pa.Table) -> pa.Table:
        h, parents = _word_hashes(batch[text_col])
        sh, sp = _shingle_hashes(h, parents, shingle)
        sig = _minhash_signatures(sh, sp, batch.num_rows, num_perm, seed)
        return pa.table(
            {
                id_col: batch[id_col],
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sig.reshape(-1)), num_perm
                ),
            }
        )

    return ds.map_batches(_sig, batch_format="pyarrow")


def _bucket_overflow_stats(
    banded: rd.Dataset, key_col: str, max_bucket: int,
    stats: dict, label: str,
) -> rd.Dataset:
    """No silent caps: fill ``stats`` with the truncation the
    ``max_bucket`` cap will apply — how many buckets overflow and how
    many candidate rows the cap drops — and WARN when nonzero (a user
    auditing dedup recall must see it). Pins the banded feed once so
    the count pass and the pair pass share the same execution; the
    overflow reduction is distributed (per-batch partials, driver sums
    a handful of ints)."""
    mat = banded.materialize()
    cnt = mat.groupby(key_col).count()

    def _partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        over = b.filter(_pc.greater(b["count()"], max_bucket))
        dropped = _pc.sum(
            _pc.subtract(over["count()"], max_bucket)
        ).as_py() if over.num_rows else 0
        return pa.table({
            "buckets": pa.array([over.num_rows], pa.int64()),
            "dropped_rows": pa.array([dropped or 0], pa.int64()),
        })

    totals = {"buckets": 0, "dropped_rows": 0}
    for r in cnt.map_batches(_partial, batch_format="pyarrow").take_all():
        totals["buckets"] += r["buckets"]
        totals["dropped_rows"] += r["dropped_rows"]
    stats["overflow_buckets"] = totals["buckets"]
    stats["dropped_rows"] = totals["dropped_rows"]
    stats["max_bucket"] = max_bucket
    if totals["buckets"]:
        import logging

        logging.getLogger("palimpzest_ray.dedup").warning(
            "%s: %d LSH bucket(s) exceed max_bucket=%d; %d candidate "
            "row(s) truncated (recall loss) — raise max_bucket for an "
            "exact contract",
            label, totals["buckets"], max_bucket, totals["dropped_rows"],
        )
    return mat


def minhash_candidate_pairs(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 3,
    threshold: float = 0.8,
    seed: int = 7,
    max_bucket: int = 256,
    stats: dict | None = None,
) -> rd.Dataset:
    """Candidate duplicate pairs with estimated Jaccard ≥ ``threshold``.

    ``stats`` (optional dict): filled with ``overflow_buckets`` /
    ``dropped_rows`` / ``max_bucket`` — the truncation the cap applies
    to degenerate buckets, warned when nonzero (no silent caps).

    One wide step: ``groupby`` on the LSH band key. Pair verification
    (signature agreement fraction) happens inside the bucket group where
    both signatures are already co-located — no second shuffle.
    Output: (id_a, id_b, est_jaccard), id_a < id_b, exact-deduped.
    """
    sigs = minhash_signature_ds(
        ds, text_col=text_col, id_col=id_col, num_perm=num_perm,
        shingle=shingle, seed=seed,
    )

    def _bands(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sig = np.asarray(batch["sig"].combine_chunks().flatten()).reshape(n, num_perm)
        keys = _band_keys(sig, bands)
        ids = batch[id_col]
        out_ids = ids.combine_chunks().take(
            pa.array(np.repeat(np.arange(n), bands))
        )
        return pa.table(
            {
                id_col: out_ids,
                "band_key": pa.array(keys.reshape(-1)),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.repeat(sig, bands, axis=0).reshape(-1)), num_perm
                ),
            }
        )

    banded = sigs.map_batches(_bands, batch_format="pyarrow")
    if stats is not None:
        banded = _bucket_overflow_stats(
            banded, "band_key", max_bucket, stats, "minhash_candidate_pairs"
        )

    def _pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], group[id_col].type),
                "id_b": pa.array([], group[id_col].type),
                "est_jaccard": pa.array([], pa.float64()),
            }
        )
        g = group.num_rows
        if g < 2:
            return empty
        if g > max_bucket:  # degenerate bucket — cap, don't explode O(g²)
            group = group.slice(0, max_bucket)
            g = max_bucket
        sig = np.asarray(group["sig"].combine_chunks().flatten()).reshape(g, num_perm)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        ii, jj = np.triu_indices(g, k=1)
        est = (sig[ii] == sig[jj]).mean(axis=1)
        keep = est >= threshold
        if not keep.any():
            return empty
        a, b = ids[ii[keep]], ids[jj[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {
                "id_a": pa.array(lo, group[id_col].type),
                "id_b": pa.array(hi, group[id_col].type),
                "est_jaccard": pa.array(est[keep]),
            }
        )

    pairs = banded.groupby("band_key").map_groups(_pairs, batch_format="pyarrow")
    # same pair surfaces from multiple bands — exact-dedup on (id_a,id_b)
    return exact_dedup(pairs, ["id_a", "id_b"], "est_jaccard")


# --------------------------------------------------------------------------
# duplicate-cluster resolution: driver union-find (small pair sets) or
# distributed connected components (pair sets too big for one process)
# --------------------------------------------------------------------------


_CC_BUCKETS = 32  # cogroup width for the CC kernels (few LARGE groups)


def _relabel_column(
    data: rd.Dataset, col: str, keep: list[str], mapping: rd.Dataset,
    *, flag: bool = False,
) -> rd.Dataset:
    """Replace ``data[col]`` with ``mapping[parent]`` wherever the value
    appears as ``mapping[child]`` — one bucketed cogroup hash join
    (the engine's ``_shuffle_join``: vectorized per-bucket merge, NOT
    per-key Python), so nothing broadcasts and no driver
    materialization happens. ``keep`` columns ride along. ``flag=True``
    appends ``__chg`` (1 where remapped) for fixpoint detection.
    ``mapping`` children must be unique (they are: built by a min
    aggregate)."""
    from palimpzest_ray.dataset import _shuffle_join

    def _prep_map(b: pa.Table) -> pa.Table:
        return pa.table({col: b["child"], "__new": b["parent"]})

    m = mapping.map_batches(_prep_map, batch_format="pyarrow")
    joined = _shuffle_join(
        data.select_columns([col] + keep), m, [col], "left", _CC_BUCKETS, 1
    )

    def _fin(b: pa.Table) -> pa.Table:
        hit = pc.is_valid(b["__new"])
        out = pa.table({col: pc.if_else(hit, b["__new"], b[col])})
        for k in keep:
            out = out.append_column(k, b[k])
        if flag:
            out = out.append_column("__chg", pc.cast(hit, pa.int64()))
        return out

    return joined.map_batches(_fin, batch_format="pyarrow")


def _bucketed_group_agg(
    ds: rd.Dataset, keys: list[str], agg_fn, bucket_key: str | None = None
) -> rd.Dataset:
    """Hash-bucket on ``keys`` (``_CC_BUCKETS`` coarse buckets), then run
    a VECTORIZED arrow aggregation per bucket inside ``map_groups`` —
    the scale-correct shape when the key cardinality is huge (millions
    of per-key ``map_groups`` calls would be per-row Python)."""
    bucket_key = bucket_key or keys[0]

    def _bk(b: pa.Table) -> pa.Table:
        h = stable_hash(b[bucket_key])
        if len(keys) > 1:
            for k in keys[1:]:
                h = (h * _P1) ^ stable_hash(b[k])
        return b.append_column(
            "__bk", pa.array((h % np.uint64(_CC_BUCKETS)).astype(np.int32))
        )

    def _agg(g: pa.Table) -> pa.Table:
        return agg_fn(g.drop_columns(["__bk"]))

    return (
        ds.map_batches(_bk, batch_format="pyarrow")
        .groupby("__bk")
        .map_groups(_agg, batch_format="pyarrow")
    )


def duplicate_ids_distributed(
    pairs: rd.Dataset,
    *,
    col_a: str = "id_a",
    col_b: str = "id_b",
    max_rounds: int = 32,
) -> rd.Dataset:
    """Distributed connected components over duplicate pairs: every id
    that is NOT its component's minimum, with the driver holding only
    round counters — the scale path when the candidate-pair volume
    would sink a driver-side union-find (billions of pairs on a
    dup-heavy corpus).

    Min-label edge contraction with pointer doubling:
      1. parent(hi) = min(lo) over hi's edges  (one groupby) — every
         ``hi`` so parented is a duplicate (it lost to a smaller id).
      2. path-compress the parent map against itself (pointer doubling,
         O(log chain) cogroups) so a chain contracts in one round.
      3. rewrite both edge endpoints through the compressed map, drop
         self-edges, dedup, repeat.
    Each round at least halves the remaining graph; duplicate ids are
    emitted incrementally (a node relabeled away never reappears).
    Pair/edge datasets are materialized per round — they are the sparse
    candidate set, never the corpus."""
    edges = pairs.select_columns([col_a, col_b]).materialize()
    drop_parts: list[rd.Dataset] = []

    def _min_parent(t: pa.Table) -> pa.Table:
        g = t.group_by(col_b).aggregate([(col_a, "min")])
        return pa.table({"child": g[col_b], "parent": g[f"{col_a}_min"]})

    def _distinct_edges(t: pa.Table) -> pa.Table:
        return t.group_by([col_a, col_b]).aggregate([])

    for _ in range(max_rounds):
        if edges.count() == 0:
            break

        P = _bucketed_group_agg(edges, [col_b], _min_parent).materialize()
        drop_parts.append(P.select_columns(["child"]))

        # pointer doubling: parent <- P[parent] until fixpoint
        for _ in range(max_rounds):
            P2 = _relabel_column(P, "parent", ["child"], P, flag=True).materialize()
            changed = P2.sum("__chg")
            P = P2.drop_columns(["__chg"]).materialize()
            if not changed:
                break

        # rewrite endpoints through the compressed map
        e = _relabel_column(edges, col_a, [col_b], P)
        e = _relabel_column(e, col_b, [col_a], P)

        def _norm(b: pa.Table) -> pa.Table:
            a, c = b[col_a].combine_chunks(), b[col_b].combine_chunks()
            swap = pc.greater(a, c)
            lo = pc.if_else(swap, c, a)
            hi = pc.if_else(swap, a, c)
            t = pa.table({col_a: lo, col_b: hi})
            return t.filter(pc.not_equal(t[col_a], t[col_b]))

        edges = _bucketed_group_agg(
            e.map_batches(_norm, batch_format="pyarrow"),
            [col_a, col_b],
            _distinct_edges,
        ).materialize()
    else:
        raise RuntimeError(
            f"connected components did not converge in {max_rounds} rounds"
        )

    if not drop_parts:
        first = pairs.select_columns([col_a])
        return first.map_batches(
            lambda b: pa.table({"child": b[col_a].slice(0, 0)}),
            batch_format="pyarrow",
        )
    out = drop_parts[0]
    for part in drop_parts[1:]:
        out = out.union(part)
    return out


def _drop_by_pair_table(
    ds: rd.Dataset,
    pair_tbl: rd.Dataset,
    id_col: str,
    *,
    distributed: bool | None = None,
    driver_pair_limit: int = 200_000,
) -> rd.Dataset:
    """Resolve duplicate clusters and drop non-representatives.
    ``distributed=None`` auto-selects: pair sets below
    ``driver_pair_limit`` use the driver union-find fast path; above it
    (or when forced) clustering runs as distributed connected
    components and the drop set is applied via a SHUFFLE anti-join —
    nothing pair- or drop-sized ever converges on the driver."""
    if distributed is None:
        # count() would otherwise execute the whole LSH pipeline once for
        # the path choice and AGAIN for the chosen path — pin the pair
        # table first (pairs are narrow: two id columns)
        pair_tbl = pair_tbl.materialize()
        distributed = pair_tbl.count() > driver_pair_limit
    if not distributed:
        pairs = [(r["id_a"], r["id_b"]) for r in pair_tbl.take_all()]
        return _drop_duplicates_by_pairs(ds, pairs, id_col)
    drops = duplicate_ids_distributed(pair_tbl)

    from palimpzest_ray.dataset import Dataset as _Pz

    drops_ds = _Pz(
        drops.map_batches(
            lambda b: pa.table({id_col: b["child"]}), batch_format="pyarrow"
        )
    )
    return _Pz(ds).anti_join(drops_ds, id_col, strategy="shuffle").ray


def _drop_duplicates_by_pairs(
    ds: rd.Dataset, pairs: list[tuple], id_col: str
) -> rd.Dataset:
    """Union-find over duplicate pairs → drop everything but the min-id
    representative of each cluster. The small-pair-set fast path of
    :func:`_drop_by_pair_table`; the drop set broadcasts via
    ``ray.put``."""
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    drop = sorted({x for x in parent if find(x) != x})
    if not drop:
        return ds
    ref = ray.put(pa.array(drop))

    def _flt(batch: pa.Table) -> pa.Table:
        d = ray.get(ref)
        return batch.filter(pc.invert(pc.is_in(batch[id_col], value_set=d)))

    return ds.map_batches(_flt, batch_format="pyarrow")


def minhash_lsh_dedup(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 3,
    threshold: float = 0.8,
    seed: int = 7,
    distributed: bool | None = None,
) -> rd.Dataset:
    """Full near-dedup: LSH candidates → cluster → keep min-id per
    cluster. Returns the surviving subset of ``ds``. Clustering runs
    driver-side for small pair sets, as distributed connected
    components above the pair limit (``distributed`` forces either)."""
    pair_tbl = minhash_candidate_pairs(
        ds, text_col=text_col, id_col=id_col, num_perm=num_perm,
        bands=bands, shingle=shingle, threshold=threshold, seed=seed,
    )
    return _drop_by_pair_table(ds, pair_tbl, id_col, distributed=distributed)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash_ds(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "stable",
) -> rd.Dataset:
    """id + 64-bit SimHash per document (vectorized bit-vote).

    ``hash_fn="fnv"`` swaps the word hash for FNV-1a over codepoints so
    the signature is a pure function a DuckDB oracle can restate
    exactly (contract query q58); ``"stable"`` is the fast default."""

    def _sim(batch: pa.Table) -> pa.Table:
        h, parents = _word_hashes(batch[text_col], hash_fn)
        votes = np.zeros((batch.num_rows, 64), dtype=np.int64)
        if len(h):
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                np.int64
            ) * 2 - 1
            boundaries = np.flatnonzero(np.diff(parents, prepend=parents[0] - 1))
            sums = np.add.reduceat(bits, boundaries, axis=0)
            votes[parents[boundaries]] = sums
        bits = (votes > 0).astype(np.uint64)
        sh = (bits << np.arange(64, dtype=np.uint64)[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        return pa.table({id_col: batch[id_col], "simhash": pa.array(sh)})

    return ds.map_batches(_sim, batch_format="pyarrow")


def simhash_pairs(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 256,
    hash_fn: str = "stable",
    stats: dict | None = None,
) -> rd.Dataset:
    """All pairs with SimHash Hamming distance ≤ ``max_hamming``:
    ``(id_a, id_b, hamming)``, ``id_a < id_b``.

    Pigeonhole banding: 64 bits split into 4 16-bit bands — two hashes
    within Hamming 3 agree EXACTLY on at least one band, so recall is
    1 by construction (not probabilistic); ``groupby`` each band value,
    verify true Hamming in-bucket. The only completeness caveat is
    ``max_bucket`` (degenerate buckets are capped, not exploded O(g²));
    raise it when an exact contract needs every pair. ``stats`` as in
    :func:`minhash_candidate_pairs` — truncation reported, not silent."""
    sh = simhash_ds(ds, text_col=text_col, id_col=id_col, hash_fn=hash_fn)

    def _bands(batch: pa.Table) -> pa.Table:
        h = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(h)
        keys = np.empty((n, 4), dtype=np.uint64)
        for b in range(4):
            keys[:, b] = ((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)) | (
                np.uint64(b) << np.uint64(32)
            )
        ids = batch[id_col].combine_chunks().take(
            pa.array(np.repeat(np.arange(n), 4))
        )
        return pa.table(
            {
                id_col: ids,
                "band_key": pa.array(keys.reshape(-1)),
                "simhash": pa.array(np.repeat(h, 4)),
            }
        )

    banded = sh.map_batches(_bands, batch_format="pyarrow")
    if stats is not None:
        banded = _bucket_overflow_stats(
            banded, "band_key", max_bucket, stats, "simhash_pairs"
        )

    def _pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], group[id_col].type),
                "id_b": pa.array([], group[id_col].type),
                "hamming": pa.array([], pa.int64()),
            }
        )
        g = group.num_rows
        if g < 2:
            return empty
        if g > max_bucket:
            group = group.slice(0, max_bucket)
            g = max_bucket
        h = group["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        ii, jj = np.triu_indices(g, k=1)
        x = h[ii] ^ h[jj]
        ham = np.zeros(len(x), dtype=np.int64)
        while x.any():
            ham += (x & 1).astype(np.int64)
            x >>= np.uint64(1)
        keep = ham <= max_hamming
        if not keep.any():
            return empty
        a, b = ids[ii[keep]], ids[jj[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {
                "id_a": pa.array(lo, group[id_col].type),
                "id_b": pa.array(hi, group[id_col].type),
                "hamming": pa.array(ham[keep]),
            }
        )

    return exact_dedup(
        banded.groupby("band_key").map_groups(_pairs, batch_format="pyarrow"),
        ["id_a", "id_b"],
        "hamming",
    )


def simhash_dedup(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 256,
    distributed: bool | None = None,
) -> rd.Dataset:
    """Near-dedup by SimHash Hamming distance ≤ ``max_hamming``:
    cluster the :func:`simhash_pairs` output, keep min-id per cluster."""
    pair_tbl = simhash_pairs(
        ds, text_col=text_col, id_col=id_col,
        max_hamming=max_hamming, max_bucket=max_bucket,
    )
    return _drop_by_pair_table(ds, pair_tbl, id_col, distributed=distributed)


# --------------------------------------------------------------------------
# exact n-gram Jaccard (verification path)
# --------------------------------------------------------------------------


def ngram_jaccard_pairs(
    ds: rd.Dataset,
    candidate_pairs: list[tuple],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle: int = 3,
) -> pa.Table:
    """Exact word-n-gram Jaccard for given (id_a, id_b) pairs — the
    exact-verify companion to MinHash estimates. Texts of only the
    touched ids are fetched via a broadcast semi-filter (never a full
    materialization of ``ds``)."""
    touched = sorted({x for p in candidate_pairs for x in p})
    ref = ray.put(pa.array(touched))

    def _flt(batch: pa.Table) -> pa.Table:
        t = ray.get(ref)
        return batch.select([id_col, text_col]).filter(
            pc.is_in(batch[id_col], value_set=t)
        )

    small = ds.map_batches(_flt, batch_format="pyarrow").take_all()
    sets: dict = {}
    for r in small:
        h, parents = _word_hashes(pa.array([r[text_col]]))
        sh, _ = _shingle_hashes(h, parents, shingle)
        sets[r[id_col]] = set(sh.tolist())
    rows = []
    for a, b in candidate_pairs:
        sa, sb = sets.get(a, set()), sets.get(b, set())
        union = len(sa | sb)
        rows.append(
            {
                "id_a": a,
                "id_b": b,
                "jaccard": (len(sa & sb) / union) if union else 0.0,
            }
        )
    return pa.Table.from_pylist(rows)


# --------------------------------------------------------------------------
# embedding near-dup
# --------------------------------------------------------------------------


def embedding_neardup(
    ds: rd.Dataset,
    *,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    num_planes: int = 12,
    seed: int = 11,
    max_bucket: int = 4096,
    distributed: bool | None = None,
    stats: dict | None = None,
) -> rd.Dataset:
    """Near-dedup on cosine similarity ≥ ``threshold``.

    Random-hyperplane LSH buckets (sign bits of ``num_planes``
    projections) co-locate near vectors; per-bucket pairwise cosine is a
    numpy matmul. One ``groupby`` shuffle of (id, bucket, normalized
    vector). Higher recall ⇒ lower ``num_planes`` or multi-probe; this
    single-table variant is the deterministic baseline. ``stats`` as
    in :func:`minhash_candidate_pairs` — truncation reported, not
    silent."""
    planes_by_dim: dict[int, np.ndarray] = {}

    def _bucket(batch: pa.Table) -> pa.Table:
        emb = batch[emb_col].combine_chunks()
        if batch.num_rows == 0:
            return batch.append_column("__bucket", pa.array([], pa.uint64()))
        dim = len(emb[0])
        V = np.asarray(emb.flatten(), dtype=np.float32).reshape(batch.num_rows, dim)
        if dim not in planes_by_dim:
            planes_by_dim[dim] = np.random.default_rng(seed).standard_normal(
                (dim, num_planes)
            )
        signs = (V @ planes_by_dim[dim]) > 0
        key = (signs.astype(np.uint64) << np.arange(num_planes, dtype=np.uint64)).sum(
            axis=1, dtype=np.uint64
        )
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        Vn = (V / norms).astype(np.float32)
        return pa.table(
            {
                id_col: batch[id_col],
                "bucket": pa.array(key),
                "vec": pa.FixedSizeListArray.from_arrays(pa.array(Vn.reshape(-1)), dim),
            }
        )

    bucketed = ds.map_batches(_bucket, batch_format="pyarrow")
    if stats is not None:
        bucketed = _bucket_overflow_stats(
            bucketed, "bucket", max_bucket, stats, "embedding_neardup"
        )

    def _pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], group[id_col].type),
                "id_b": pa.array([], group[id_col].type),
                "cosine": pa.array([], pa.float64()),
            }
        )
        g = group.num_rows
        if g < 2:
            return empty
        if g > max_bucket:
            group = group.slice(0, max_bucket)
            g = max_bucket
        dim = len(group["vec"][0])
        V = np.asarray(group["vec"].combine_chunks().flatten()).reshape(g, dim)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        S = V @ V.T
        ii, jj = np.triu_indices(g, k=1)
        cos = S[ii, jj]
        keep = cos >= threshold
        if not keep.any():
            return empty
        a, b = ids[ii[keep]], ids[jj[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {
                "id_a": pa.array(lo, group[id_col].type),
                "id_b": pa.array(hi, group[id_col].type),
                "cosine": pa.array(cos[keep].astype(np.float64)),
            }
        )

    pair_tbl = bucketed.groupby("bucket").map_groups(_pairs, batch_format="pyarrow")
    return _drop_by_pair_table(ds, pair_tbl, id_col, distributed=distributed)


# --------------------------------------------------------------------------
# exact-by-construction pair detection (contract-grade oracles)
# --------------------------------------------------------------------------


def exact_jaccard_pairs(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle: int = 3,
    threshold: float = 0.8,
) -> rd.Dataset:
    """ALL pairs with exact word-``shingle``-gram Jaccard ≥ ``threshold``:
    ``(id_a, id_b, jaccard)``, ``id_a < id_b``.

    Candidate generation is the inverted-index route — pairs sharing at
    least one shingle — whose recall is 1 BY CONSTRUCTION for any
    threshold > 0 (J(a,b) > 0 requires a shared shingle), so the output
    is a pure function of the data that a DuckDB oracle states directly
    (shingle self-join; contract query q57). MinHash-LSH
    (:func:`minhash_candidate_pairs`) is the probabilistic scale path
    for corpora where hot shingles make the inverted index skewed;
    pytest proves its r=1 candidate set covers this exact pair set on
    the test corpora.

    Fully distributed on the engine's proven exchanges (no alpha hash
    shuffle — chained hash exchanges wedge at low CPU headroom, see
    ``context.hash_shuffle_scope``): explode (doc, shingle) with the
    doc's set size riding along each row (no sizes join), SELF-JOIN on
    the shingle hash through the bucketed-cogroup path (acero kernels)
    to emit one co-occurrence row per shared shingle, then a combined
    map-side-partial groupby on the pair counts the intersection;
    jaccard = c / (na + nb - c).
    """

    def _explode(batch: pa.Table) -> pa.Table:
        h, parents = _word_hashes(batch[text_col])
        sh, sp = _shingle_hashes(h, parents, shingle)
        empty = pa.table(
            {
                id_col: pa.array([], batch[id_col].type),
                "sh": pa.array([], pa.uint64()),
                "nsz": pa.array([], pa.int64()),
            }
        )
        if len(sh) == 0:
            return empty
        order = np.lexsort((sh, sp))
        sh, sp = sh[order], sp[order]
        keep = np.ones(len(sh), bool)
        keep[1:] = (sh[1:] != sh[:-1]) | (sp[1:] != sp[:-1])
        sh, sp = sh[keep], sp[keep]
        # per-doc DISTINCT shingle count, aligned to each exploded row
        b0 = np.flatnonzero(np.diff(sp, prepend=sp[0] - 1))
        cnt = np.diff(np.append(b0, len(sp)))
        nsz = np.repeat(cnt, cnt)
        ids = batch[id_col].combine_chunks().take(pa.array(sp))
        return pa.table(
            {id_col: ids, "sh": pa.array(sh), "nsz": pa.array(nsz, pa.int64())}
        )

    from ray.data.aggregate import Count, Min

    from palimpzest_ray.dataset import Dataset as _Pz
    from palimpzest_ray.dataset import GroupedDataset as _Grouped

    def _side(prefix: str):
        def _m(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    f"id_{prefix}": batch[id_col],
                    "sh": batch["sh"],
                    f"n{prefix}": batch["nsz"],
                }
            )

        return _m

    # pin the exploded band stream: BOTH join sides consume it, so the
    # lazy shingle+minhash pass would run twice. Narrow by construction
    # (band hash + id + signature length only), object-store-cheap.
    exploded = ds.map_batches(
        _explode, batch_format="pyarrow"
    ).materialize()
    left = _Pz(exploded.map_batches(_side("a"), batch_format="pyarrow"))
    right = _Pz(exploded.map_batches(_side("b"), batch_format="pyarrow"))
    cooc = (
        left.join(right, on="sh", how="inner", strategy="shuffle")
        .filter(batch_fn=lambda b: b.filter(pc.less(b["id_a"], b["id_b"])))
        .ray
    )
    agg = _Grouped(cooc, ["id_a", "id_b"]).aggregate(
        Count(alias_name="c"), Min("na", alias_name="na"), Min("nb", alias_name="nb")
    )

    def _finish(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = batch["na"].to_numpy(zero_copy_only=False)
        nb = batch["nb"].to_numpy(zero_copy_only=False)
        j = c / (na + nb - c)
        keep = j >= threshold
        return pa.table(
            {
                "id_a": batch["id_a"].filter(pa.array(keep)),
                "id_b": batch["id_b"].filter(pa.array(keep)),
                "jaccard": pa.array(j[keep], pa.float64()),
            }
        )

    return agg.ray.map_batches(_finish, batch_format="pyarrow")


def cosine_dup_pairs(
    ds: rd.Dataset,
    *,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.99,
    round_to: int = 3,
) -> rd.Dataset:
    """ALL pairs with cosine ≥ ``threshold``: ``(id_a, id_b, score)``
    where ``score = round(cos * 10^round_to)`` int64 — the integer
    scaling that makes a float similarity bit-comparable with a SQL
    ``list_cosine_similarity`` oracle (same tactic as
    :func:`similarity.knn_search` ``int_scores``); the ≥ test runs on
    the ROUNDED value on both sides so the boundary is consistent.

    Exact baseline: the normalized matrix is broadcast once
    (``ray.put``) and every batch matmuls against it — distributed
    compute, no shuffle, recall 1 by construction. Right for corpora up
    to millions of vectors (the broadcast side is n×dim×8 bytes);
    :func:`embedding_neardup` (hyperplane-LSH buckets) is the
    approximate path beyond that."""
    from palimpzest_ray.stages.similarity import _normalize, _vectors

    ids_parts: list[np.ndarray] = []
    vec_parts: list[np.ndarray] = []
    for b in ds.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            ids_parts.append(b[id_col].to_numpy(zero_copy_only=False))
            vec_parts.append(_vectors(b, emb_col))
    if not ids_parts:
        return rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "score": pa.array([], pa.int64()),
                }
            )
        )
    ids_all = np.concatenate(ids_parts)
    A = _normalize(np.concatenate(vec_parts).astype(np.float64))
    ref = ray.put((ids_all, A))
    bar = int(round(threshold * 10.0**round_to))
    scale = 10.0**round_to

    def _pairs(batch: pa.Table) -> pa.Table:
        idsA, Am = ray.get(ref)
        Vb = _normalize(_vectors(batch, emb_col).astype(np.float64))
        ids_b = batch[id_col].to_numpy(zero_copy_only=False)
        S = np.round((Vb @ Am.T) * scale)
        mask = (S >= bar) & (ids_b[:, None] < idsA[None, :])
        bi, ai = np.nonzero(mask)
        return pa.table(
            {
                "id_a": pa.array(ids_b[bi], batch[id_col].type),
                "id_b": pa.array(idsA[ai], batch[id_col].type),
                "score": pa.array(S[bi, ai].astype(np.int64)),
            }
        )

    return ds.map_batches(_pairs, batch_format="pyarrow")


def repeated_kgram_spans(
    ds: rd.Dataset,
    *,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    k: int = 8,
    min_docs: int = 2,
) -> rd.Dataset:
    """Exact cross-document duplicate SPANS: every position where a
    document's ``k``-token window also occurs in ≥ ``min_docs`` DISTINCT
    documents (itself included) — the detection core of
    suffix-array-style training-data dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL 2022), done with
    rolling hashes instead of a suffix array so it distributes:

    1. per batch: rolling k-gram hashes over the flattened list column
       (same mixing as ``_shingle_hashes``, windows never span doc
       boundaries), emitting ``(gram, doc, pos)`` span rows;
    2. distinct-doc counts per gram: per-block (gram, doc) dedupe, then
       the coarse-bucket vectorized reduce with arrow
       ``count_distinct``;
    3. grams with ≥ min_docs distinct docs broadcast back
       (``ray.put``) and filter the span rows.

    Output ``(doc_id, pos)`` — 0-based window starts, one row per
    repeated position. Hash-collision caveat: two distinct k-grams
    colliding at uint64 would over-report (~2^-64 per pair; the q102
    oracle relies on this the same way q57 does). Scale note: step 3's
    repeated-gram set is corpus-duplication-sized; beyond broadcast
    scale, swap the ``is_in`` for a keyed semi-join on ``gram``.
    """

    def _span_rows(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "gram": pa.array([], pa.int64()),
                id_col: pa.array([], batch[id_col].type),
                "pos": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        col = batch[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
        n = len(flat)
        if n < k:
            return empty
        h = flat.astype(np.uint64)
        # rolling k-gram mix — the _shingle_hashes formula, kept
        # positional (no short-doc branch: docs shorter than k have no
        # k-gram to repeat)
        acc = h[: n - k + 1] * _P1
        for j in range(1, k):
            w = np.uint64((j * int(_P3) + int(_P2)) & 0xFFFFFFFFFFFFFFFF)
            acc = acc ^ (h[j : n - k + 1 + j] * w)
        valid = parents[: n - k + 1] == parents[k - 1 :]
        starts = np.flatnonzero(valid)
        if len(starts) == 0:
            return empty
        par = parents[starts]
        offs = col.offsets.to_numpy().astype(np.int64)
        pos = starts - offs[par]
        ids = col_ids = batch[id_col]
        if isinstance(col_ids, pa.ChunkedArray):
            ids = col_ids.combine_chunks()
        return pa.table(
            {
                "gram": pa.array(acc[valid].view(np.int64)),
                id_col: ids.take(pa.array(par)),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    spans = ds.map_batches(_span_rows, batch_format="pyarrow")

    def _gram_doc(batch: pa.Table) -> pa.Table:
        t = batch.select(["gram", id_col])
        return t.group_by(["gram", id_col], use_threads=False).aggregate([])

    def _count_docs(g: pa.Table) -> pa.Table:
        # per-bucket: distinct (gram, doc) again (cross-block dupes),
        # then docs-per-gram
        d = g.group_by(["gram", id_col], use_threads=False).aggregate([])
        out = (
            d.group_by(["gram"], use_threads=False)
            .aggregate([(id_col, "count")])
            .rename_columns(["gram", "n_docs"])
        )
        return out.filter(pc.greater_equal(out["n_docs"], min_docs))

    gram_docs = spans.map_batches(_gram_doc, batch_format="pyarrow")
    repeated = _bucketed_group_agg(gram_docs, ["gram"], _count_docs)
    rep_parts = list(
        repeated.iter_batches(batch_format="pyarrow", batch_size=65536)
    )
    rep_tbl = (
        pa.concat_tables(rep_parts) if rep_parts
        else pa.table({"gram": pa.array([], pa.int64())})
    )
    rep_ref = ray.put(
        rep_tbl["gram"].combine_chunks()
        if rep_tbl.num_rows
        else pa.array([], pa.int64())
    )

    def _filter(batch: pa.Table) -> pa.Table:
        rep = ray.get(rep_ref)
        if batch.num_rows == 0 or len(rep) == 0:
            return pa.table(
                {
                    id_col: pa.array([], batch[id_col].type),
                    "pos": pa.array([], pa.int64()),
                }
            )
        keep = pc.is_in(batch["gram"], value_set=rep)
        out = batch.filter(keep)
        return out.select([id_col, "pos"])

    return spans.map_batches(_filter, batch_format="pyarrow")


def remove_spans(
    ds: rd.Dataset,
    spans: pa.Table,
    *,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    k: int = 8,
) -> rd.Dataset:
    """Cut the flagged ``k``-token windows OUT of each document — the
    second half of Lee-et-al-style dedup (:func:`repeated_kgram_spans`
    finds the spans, this removes them). Overlapping spans merge
    naturally via an interval delta array (+1 at each span start, -1
    after its end, cumsum > 0 = covered): one vectorized pass per
    batch, no per-token Python. Adds ``n_removed`` (tokens cut).

    ``spans`` is the (doc_id, pos) table (broadcast via ``ray.put`` —
    span tables are duplication-sized; a keyed cogroup is the
    beyond-broadcast path)."""
    spans_ref = ray.put(spans)

    def _cut(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(
                "n_removed", pa.array([], pa.int32())
            )
        col = batch[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.values.to_numpy(zero_copy_only=False)
        offs = col.offsets.to_numpy().astype(np.int64)
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        sp = ray.get(spans_ref)
        here = sp.filter(pc.is_in(sp[id_col], value_set=ids))
        delta = np.zeros(len(flat) + 1, dtype=np.int64)
        if here.num_rows:
            row_of = pc.index_in(here[id_col], value_set=ids).to_numpy(
                zero_copy_only=False
            )
            pos = here["pos"].to_numpy(zero_copy_only=False)
            starts = offs[row_of] + pos
            np.add.at(delta, starts, 1)
            np.add.at(delta, starts + k, -1)  # windows never cross docs
        covered = np.cumsum(delta[:-1]) > 0
        keep = ~covered
        removed_per_doc = np.zeros(batch.num_rows, dtype=np.int64)
        if covered.any():
            cums = np.concatenate([[0], np.cumsum(covered)])
            removed_per_doc = cums[offs[1:]] - cums[offs[:-1]]
        new_lens = np.diff(offs) - removed_per_doc
        new_offs = np.zeros(len(offs), dtype=np.int64)
        np.cumsum(new_lens, out=new_offs[1:])
        cleaned = pa.LargeListArray.from_arrays(
            pa.array(new_offs, pa.int64()),
            pa.array(flat[keep].astype(np.int32), pa.int32()),
        ).cast(pa.list_(pa.int32()))
        i = batch.column_names.index(tokens_col)
        return batch.set_column(i, tokens_col, cleaned).append_column(
            "n_removed", pa.array(removed_per_doc.astype(np.int32))
        )

    return ds.map_batches(_cut, batch_format="pyarrow")
