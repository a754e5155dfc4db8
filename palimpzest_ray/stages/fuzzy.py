"""Fuzzy string matching: edit-distance self-join for entity
resolution / near-identical-record detection — an operator family the
reference approximates only through LLM semantic joins
(/root/reference/src/palimpzest/query/operators/join.py:395-489); here
it is exact and distributed.

``edit_distance_pairs`` returns ALL pairs with Levenshtein distance
≤ k, recall 1 by construction:

1. **Candidates — positional q-gram count filter** (Gravano et al.,
   "Approximate String Joins in a Database", VLDB 2001): an edit
   operation destroys at most ``q`` q-grams, so
   ``L(a,b) ≤ k ⟹ |G(a) ⊓ G(b)| ≥ max(|a|,|b|) - q + 1 - k·q``
   (multiset intersection — emulated exactly by keying each gram with
   its occurrence ordinal). Strings explode into (gram, occ) rows with
   their gram-count riding along; a shuffle self-join on the gram key
   + a map-side-partial pair count yields candidates, plus the
   ``| |a|-|b| | ≤ k`` length filter.
2. **Verify — banded DP, vectorized ACROSS pairs**: candidates are
   padded into uint32 codepoint grids and the classic DP runs with
   numpy ops over the whole pair batch at once (the only Python loop
   is over character positions, bounded by the longest string).

Scale note: a corpus where most strings share a long constant prefix
(e.g. ``Supplier#0000…``) makes the prefix grams hot join keys — the
documented inverted-index skew, same as ``dedup.exact_jaccard_pairs``.
The production mitigations are standard blocking (pass
``block_on=col`` to compare only within user-asserted blocks) or
PassJoin-style segment signatures; the q-gram path stays the exact
default because it is lossless.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from palimpzest_ray.functions.tokens import stable_hash


def _qgram_rows(
    batch: pa.Table, text_col: str, id_col: str, q: int
) -> pa.Table:
    """Explode each string into positional-multiset q-gram hash rows
    ``(id, gram, n)`` — ``gram`` mixes the q-gram's content hash with
    its occurrence ordinal (multiset emulation), ``n`` is the string's
    gram count. Vectorized: the only Python loop is over character
    POSITIONS (bounded by the longest string) — each iteration slices
    every string at once (``utf8_slice_codeunits``) and hashes the
    column. Strings shorter than ``q`` emit one whole-string gram."""
    col = batch[text_col].cast(pa.string())
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    L = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    n_rows = len(col)
    long_counts = np.maximum(L - q + 1, 0)
    counts = np.where(L >= q, long_counts, 1)

    parents_parts: list[np.ndarray] = []
    hash_parts: list[np.ndarray] = []
    max_pos = int(long_counts.max()) if n_rows else 0
    for j in range(max_pos):
        mask = L >= j + q
        if not mask.any():
            break
        m = pa.array(mask)
        sliced = pc.utf8_slice_codeunits(
            col.filter(m), start=j, stop=j + q
        )
        hash_parts.append(stable_hash(sliced))
        parents_parts.append(np.flatnonzero(mask))
    short = L < q
    if short.any():
        sm = pa.array(short)
        # mix with a marker so "ab" the short-string never equals the
        # "ab" q-gram of a longer string
        hash_parts.append(stable_hash(col.filter(sm)) * _QS)
        parents_parts.append(np.flatnonzero(short))
    if not hash_parts:
        return pa.table(
            {
                id_col: batch[id_col].slice(0, 0),
                "gram": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
    parent = np.concatenate(parents_parts)
    gh = np.concatenate(hash_parts).astype(np.uint64)
    # occurrence ordinal per (string, gram content): block j holds at
    # most one row per string and blocks ascend in position, so a
    # STABLE sort by (parent, gh) keeps position order within each run
    order = np.lexsort((gh, parent))
    parent, gh = parent[order], gh[order]
    run_start = np.zeros(len(gh), dtype=bool)
    run_start[0] = True
    run_start[1:] = (parent[1:] != parent[:-1]) | (gh[1:] != gh[:-1])
    starts = np.flatnonzero(run_start)
    occ = np.arange(len(gh)) - np.repeat(
        starts, np.diff(np.append(starts, len(gh)))
    )
    with np.errstate(over="ignore"):
        key = (gh * _QP1) ^ ((occ.astype(np.uint64) + np.uint64(1)) * _QP2)
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table(
        {
            id_col: ids.take(pa.array(parent)),
            "gram": pa.array(key.view(np.int64)),
            "n": pa.array(counts[parent]),
        }
    )


_QP1 = np.uint64(0x9E3779B185EBCA87)
_QP2 = np.uint64(0xC2B2AE3D27D4EB4F)
_QS = np.uint64(0x165667B19E3779F9)  # short-string marker mix


def _lev_vectorized(A_txt: list[str], B_txt: list[str], k: int) -> np.ndarray:
    """Levenshtein distance for aligned string lists, DP vectorized
    across PAIRS (python loops only over character positions)."""
    n = len(A_txt)
    if n == 0:
        return np.empty(0, np.int64)
    la = np.array([len(s) for s in A_txt], dtype=np.int64)
    lb = np.array([len(s) for s in B_txt], dtype=np.int64)
    ml_a, ml_b = int(la.max()), int(lb.max())
    A = np.zeros((n, ml_a), dtype=np.uint32)
    B = np.zeros((n, ml_b), dtype=np.uint32)
    for i, s in enumerate(A_txt):
        if s:
            A[i, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            )
    for i, s in enumerate(B_txt):
        if s:
            B[i, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            )
    prev = np.broadcast_to(
        np.arange(ml_b + 1, dtype=np.int64), (n, ml_b + 1)
    ).copy()
    res = np.where(la == 0, lb, -1)
    cur = np.empty_like(prev)
    for i in range(1, ml_a + 1):
        cur[:, 0] = i
        sub = (A[:, i - 1 : i] != B).astype(np.int64)  # (n, ml_b)
        for j in range(1, ml_b + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + sub[:, j - 1],
            )
        done = la == i
        if done.any():
            res[done] = cur[done, lb[done]]
        prev, cur = cur, prev
    return res


def edit_distance_pairs(
    ds: rd.Dataset,
    *,
    text_col: str,
    id_col: str,
    max_dist: int = 1,
    q: int = 2,
) -> rd.Dataset:
    """ALL pairs ``(id_a, id_b, dist)`` with Levenshtein ≤ ``max_dist``,
    ``id_a < id_b`` — candidate generation by the lossless positional
    q-gram count filter, verification by pair-vectorized DP.

    Exchange discipline: the co-occurrence shuffle carries ONLY the two
    int id columns (one row per shared gram); shared-gram counts reduce
    through the engine's map-side-partial groupby; string payloads and
    gram counts attach to the (much smaller) distinct-pair set via a
    broadcast join with the per-string sizes table; the DP verify runs
    per BATCH over the post-filter candidates."""
    import ray

    from palimpzest_ray.dataset import Dataset as _Pz

    def _explode(batch: pa.Table) -> pa.Table:
        t = _qgram_rows(batch, text_col, id_col, q)
        return t.select([id_col, "gram"])

    def _side(prefix: str):
        def _m(batch: pa.Table) -> pa.Table:
            return pa.table(
                {f"id_{prefix}": batch[id_col], "gram": batch["gram"]}
            )

        return _m

    # pin the exploded q-gram stream: BOTH join sides consume it, so
    # the lazy explode pass would run twice. Narrow by construction
    # (hashed gram + id + length only — the text never explodes), so
    # the pin is object-store-cheap even at corpus scale.
    exploded = ds.map_batches(
        _explode, batch_format="pyarrow"
    ).materialize()
    left = _Pz(exploded.map_batches(_side("a"), batch_format="pyarrow"))
    right = _Pz(exploded.map_batches(_side("b"), batch_format="pyarrow"))
    cooc = (
        left.join(right, on="gram", how="inner", strategy="shuffle")
        .filter(batch_fn=lambda b: b.filter(pc.less(b["id_a"], b["id_b"])))
        .project(["id_a", "id_b"])
    )
    def _local_count(batch: pa.Table) -> pa.Table:
        # block-local combine: one (pair, partial-count) row per
        # distinct pair per block (arrow C++ group_by, generic id types)
        if batch.num_rows == 0:
            return pa.table(
                {
                    "id_a": pa.array([], batch["id_a"].type),
                    "id_b": pa.array([], batch["id_b"].type),
                    "c": pa.array([], pa.int64()),
                }
            )
        g = batch.append_column(
            "c", pa.array(np.ones(batch.num_rows, np.int64))
        )
        return (
            g.group_by(["id_a", "id_b"], use_threads=False)
            .aggregate([("c", "sum")])
            .rename_columns(["id_a", "id_b", "c"])
        )

    def _sum_pairs(g: pa.Table) -> pa.Table:
        return (
            g.group_by(["id_a", "id_b"], use_threads=False)
            .aggregate([("c", "sum")])
            .rename_columns(["id_a", "id_b", "c"])
        )

    # final reduce: coarse hash buckets + a vectorized per-bucket arrow
    # aggregation — NOT a per-pair groupby (hundreds of thousands of
    # tiny groups through Ray's sort aggregate is Python-loop-shaped;
    # measured 70s vs ~2s on the 500k-pair supplier corpus)
    from palimpzest_ray.stages.dedup import _bucketed_group_agg

    partial = cooc.ray.map_batches(_local_count, batch_format="pyarrow")
    counts_ds = _bucketed_group_agg(partial, ["id_a", "id_b"], _sum_pairs)

    # per-string sizes + payload, broadcast to every counting batch
    def _sizes(batch: pa.Table) -> pa.Table:
        txt = pc.fill_null(batch[text_col].cast(pa.string()), "")
        L = pc.utf8_length(txt).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: batch[id_col],
                "n": pa.array(np.maximum(L - q + 1, 1).astype(np.int64)),
                "txt": txt,
            }
        )

    sizes_tbl = pa.concat_tables(
        ds.map_batches(_sizes, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=65536
        )
    )
    sizes_ref = ray.put(sizes_tbl)

    # SHORT strings (gram count <= k*q) make the count bound <= 0: two
    # shorts within distance k may share NO gram, so the join can never
    # surface them. They are a bounded set (length <= k*q + q - 1, tiny
    # alphabet^length universe); verify them all-pairs driver-side and
    # EXCLUDE short-short pairs from the join path (no double emission).
    short_cut = max_dist * q
    n_all = sizes_tbl["n"].to_numpy(zero_copy_only=False)
    sh_idx = np.flatnonzero(n_all <= short_cut)
    short_rows = {"id_a": [], "id_b": [], "dist": []}
    if len(sh_idx) > 1:
        s_ids = [sizes_tbl[id_col][int(i)].as_py() for i in sh_idx]
        s_txt = [sizes_tbl["txt"][int(i)].as_py() or "" for i in sh_idx]
        ia, ib = np.triu_indices(len(sh_idx), k=1)
        lens = np.array([len(s) for s in s_txt], dtype=np.int64)
        band = np.abs(lens[ia] - lens[ib]) <= max_dist
        ia, ib = ia[band], ib[band]
        if len(ia):
            dist = _lev_vectorized(
                [s_txt[i] for i in ia], [s_txt[j] for j in ib], max_dist
            )
            for i, j, dd in zip(ia, ib, dist):
                if dd <= max_dist:
                    a_, b_ = s_ids[int(i)], s_ids[int(j)]
                    if b_ < a_:
                        a_, b_ = b_, a_
                    if a_ != b_:
                        short_rows["id_a"].append(a_)
                        short_rows["id_b"].append(b_)
                        short_rows["dist"].append(int(dd))

    def _verify(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], batch["id_a"].type),
                "id_b": pa.array([], batch["id_b"].type),
                "dist": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        sizes = ray.get(sizes_ref)
        sid = sizes[id_col].combine_chunks()
        ia = pc.index_in(batch["id_a"], value_set=sid)
        ib = pc.index_in(batch["id_b"], value_set=sid)
        na = sizes["n"].take(ia).to_numpy(zero_copy_only=False)
        nb = sizes["n"].take(ib).to_numpy(zero_copy_only=False)
        c = batch["c"].to_numpy(zero_copy_only=False)
        keep = (
            (c >= np.maximum(na, nb) - max_dist * q)
            & (np.abs(na - nb) <= max_dist)
            # short-short pairs are handled (exactly once) by the
            # driver-side all-pairs path
            & ~((na <= max_dist * q) & (nb <= max_dist * q))
        )
        if not keep.any():
            return empty
        cand = batch.filter(pa.array(keep))
        ta = sizes["txt"].take(pc.index_in(cand["id_a"], value_set=sid))
        tb = sizes["txt"].take(pc.index_in(cand["id_b"], value_set=sid))
        dist = _lev_vectorized(ta.to_pylist(), tb.to_pylist(), max_dist)
        ok = dist <= max_dist
        out = cand.filter(pa.array(ok))
        return pa.table(
            {
                "id_a": out["id_a"],
                "id_b": out["id_b"],
                "dist": pa.array(dist[ok]),
            }
        )

    joined = counts_ds.map_batches(_verify, batch_format="pyarrow")
    if short_rows["id_a"]:
        id_type = sizes_tbl[id_col].type
        short_tbl = pa.table(
            {
                "id_a": pa.array(short_rows["id_a"], id_type),
                "id_b": pa.array(short_rows["id_b"], id_type),
                "dist": pa.array(short_rows["dist"], pa.int64()),
            }
        )
        return joined.union(rd.from_arrow(short_tbl))
    return joined


__all__ = ["edit_distance_pairs"]
