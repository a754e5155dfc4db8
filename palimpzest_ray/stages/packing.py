"""Sequence packing: concatenate per-document token arrays (plus an EOS
separator) in a deterministic global order and chunk the stream into
fixed-length training sequences — the standard GPT-style "concat and
chunk" batch prep for pre-tokenized corpora.

The reference has no packing operator (its pipelines stop at per-record
converts); this is one of the engine-mandated large-scale
training-data operations, over the same token-array payload as the CDC
north rule (BASELINE.json input_hint: ``tokens:array<int32>``).

Distributed design (the whole point — a driver-side concat is the
anti-pattern):

1. **Range-bucket the order column.** A deterministic sample of the
   order keys (every k-th key per block, capped) gives quantile
   boundaries; each doc gets a bucket id such that bucket i's keys all
   precede bucket i+1's. Buckets are the unit of parallelism for the
   prefix sum — each must fit one ``map_groups`` task (the ``num_buckets``
   knob; same contract as the shuffle-join bucket width).
2. **Distributed prefix sum.** Per-bucket token totals (one tiny row
   per bucket) come back to the driver, a cumulative sum over B values
   gives each bucket's base offset — the only driver-side state, O(B).
3. **Piece emission.** ``groupby(bucket).map_groups``: sort the bucket
   by the order key, running-sum the per-doc widths, add the bucket
   base → every document knows its global start offset and can emit
   its (seq_id, pos, piece) spans locally. A doc crossing a sequence
   boundary emits one piece per overlapped sequence. Each token is
   shipped exactly once.
4. **Reassembly.** ``groupby(seq_id).map_groups`` sorts the handful of
   pieces per sequence by position and concatenates. ``drop_last``
   discards the trailing partial sequence (training convention).

Skew note: bucket sizes track the key-sample quantiles, so a Zipf-hot
key RANGE still lands in one bucket; packing order is user-chosen and
usually synthetic/uniform (doc_id), which is the assumption documented
here. Sequences themselves are uniform by construction (seq_len).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

_SAMPLE_CAP = 65536


def add_char_tokens(
    batch: pa.Table, text_col: str = "text", out_col: str = "tokens"
) -> pa.Table:
    """Character-level tokenizer: text → list<int32> of Unicode
    codepoints. Deterministic and SQL-expressible
    (``unicode(substr(text, i, 1))``), so packing pipelines built on it
    carry an exact DuckDB oracle. Null text → empty list."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    texts = col.to_pylist()
    bufs = [t.encode("utf-32-le") if t else b"" for t in texts]
    vals = np.frombuffer(b"".join(bufs), dtype="<i4")
    lens = np.fromiter((len(b) >> 2 for b in bufs), np.int64, count=len(bufs))
    offsets = np.zeros(len(bufs) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    tokens = pa.LargeListArray.from_arrays(
        pa.array(offsets, pa.int64()), pa.array(vals, pa.int32())
    ).cast(pa.list_(pa.int32()))
    return batch.append_column(out_col, tokens)


def _order_key_sample(ds: rd.Dataset, order_col: str) -> np.ndarray:
    """Deterministic bounded sample of the order keys: every k-th key
    per block (k sized from the dataset count), ≤ _SAMPLE_CAP total."""
    n = ds.count()
    step = max(1, n // _SAMPLE_CAP)

    def _thin(batch: pa.Table) -> pa.Table:
        return batch.select([order_col]).take(
            pa.array(range(0, batch.num_rows, step), pa.int64())
        )

    keys = ds.map_batches(_thin, batch_format="pyarrow").take_all()
    return np.sort(np.array([r[order_col] for r in keys]))


def pack_sequences(
    ds: rd.Dataset,
    seq_len: int,
    *,
    tokens_col: str = "tokens",
    order_col: str = "doc_id",
    eos_id: int = 0,
    drop_last: bool = True,
    num_buckets: int = 64,
) -> rd.Dataset:
    """(order_col, tokens list<int32>) rows → (seq_id:int64,
    tokens:list<int32>) fixed-length sequences, packed in ascending
    ``order_col`` order with ``eos_id`` appended after every document.

    ``order_col`` must be unique per row (it defines the packing
    order); duplicates would make the layout nondeterministic.
    """
    # Pin the input: the plan below reads it four times (count, key
    # sample, bucket totals, piece emission) and Ray re-executes a lazy
    # plan per action — pinning trades object-store residency (which
    # can spill) for 4x recompute of everything upstream.
    ds = ds.materialize()
    sample = _order_key_sample(ds, order_col)
    if sample.size == 0:
        return rd.from_arrow(
            pa.table({"seq_id": pa.array([], pa.int64()),
                      "tokens": pa.array([], pa.list_(pa.int32()))})
        )
    nb = min(num_buckets, sample.size)
    # quantile boundaries: bucket i covers keys < boundaries[i]
    bounds = sample[np.linspace(0, sample.size - 1, nb + 1).astype(np.int64)][1:-1]

    def _bucket_of(keys: np.ndarray) -> np.ndarray:
        return np.searchsorted(bounds, keys, side="right").astype(np.int64)

    def _widths(batch: pa.Table) -> pa.Table:
        toks = batch[tokens_col]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        w = np.diff(offs) + 1  # +1: the EOS appended after every doc
        keys = batch[order_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                order_col: batch[order_col],
                tokens_col: toks,
                "_w": pa.array(w, pa.int64()),
                "_bucket": pa.array(_bucket_of(keys), pa.int64()),
            }
        )

    wide = ds.map_batches(_widths, batch_format="pyarrow")

    # ---- distributed prefix sum: O(num_buckets) driver state --------
    totals_rows = wide.groupby("_bucket").sum("_w").take_all()
    totals = np.zeros(nb, dtype=np.int64)
    for r in totals_rows:
        totals[r["_bucket"]] = r["sum(_w)"]
    bases = np.zeros(nb, dtype=np.int64)
    np.cumsum(totals[:-1], out=bases[1:])

    piece_schema = pa.schema(
        [
            pa.field("seq_id", pa.int64()),
            pa.field("_pos", pa.int64()),
            pa.field("_piece", pa.list_(pa.int32())),
        ]
    )

    def _emit_pieces(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bucket = group["_bucket"][0].as_py()
        group = group.take(pc.sort_indices(group, sort_keys=[(order_col, "ascending")]))
        w = group["_w"].to_numpy(zero_copy_only=False)
        starts = bases[bucket] + np.cumsum(w) - w
        toks = group[tokens_col]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        vals = toks.values.to_numpy(zero_copy_only=False).astype(np.int32, copy=False)
        seq_ids: list[int] = []
        poss: list[int] = []
        pieces: list[np.ndarray] = []
        for i in range(group.num_rows):
            doc = np.empty(w[i], dtype=np.int32)
            doc[:-1] = vals[offs[i] : offs[i + 1]]
            doc[-1] = eos_id
            pos = int(starts[i])
            taken = 0
            while taken < w[i]:
                room = seq_len - (pos % seq_len)
                span = min(room, w[i] - taken)
                seq_ids.append(pos // seq_len)
                poss.append(pos)
                pieces.append(doc[taken : taken + span])
                pos += span
                taken += span
        flat = (
            np.concatenate(pieces) if pieces else np.empty(0, dtype=np.int32)
        )
        po = np.zeros(len(pieces) + 1, dtype=np.int64)
        np.cumsum([len(p) for p in pieces], out=po[1:])
        return pa.table(
            {
                "seq_id": pa.array(seq_ids, pa.int64()),
                "_pos": pa.array(poss, pa.int64()),
                "_piece": pa.ListArray.from_arrays(
                    pa.array(po, pa.int64()).cast(pa.int32()),
                    pa.array(flat, pa.int32()),
                ),
            },
            schema=piece_schema,
        )

    pieces = wide.groupby("_bucket").map_groups(
        _emit_pieces, batch_format="pyarrow"
    )

    def _assemble(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        group = group.take(pc.sort_indices(group, sort_keys=[("_pos", "ascending")]))
        col = group["_piece"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        merged = col.values.to_numpy(zero_copy_only=False).astype(np.int32, copy=False)
        if drop_last and len(merged) < seq_len:
            return pa.table(
                {"seq_id": pa.array([], pa.int64()),
                 "tokens": pa.array([], pa.list_(pa.int32()))}
            )
        return pa.table(
            {
                "seq_id": group["seq_id"][:1],
                "tokens": pa.ListArray.from_arrays(
                    pa.array([0, len(merged)], pa.int32()),
                    pa.array(merged, pa.int32()),
                ),
            }
        )

    return pieces.groupby("seq_id").map_groups(_assemble, batch_format="pyarrow")


def pack_sequences_reference(
    table: pa.Table,
    seq_len: int,
    *,
    tokens_col: str = "tokens",
    order_col: str = "doc_id",
    eos_id: int = 0,
    drop_last: bool = True,
) -> list[tuple[int, list[int]]]:
    """Sequential in-memory oracle for tests: sort, concat, chunk."""
    import pyarrow.compute as pc

    table = table.take(pc.sort_indices(table, sort_keys=[(order_col, "ascending")]))
    stream: list[int] = []
    for toks in table[tokens_col].to_pylist():
        stream.extend(toks or [])
        stream.append(eos_id)
    out = []
    for s in range(0, len(stream), seq_len):
        chunk = stream[s : s + seq_len]
        if drop_last and len(chunk) < seq_len:
            break
        out.append((s // seq_len, chunk))
    return out


def token_pair_counts(
    ds: rd.Dataset,
    *,
    tokens_col: str = "tokens",
    top_k: int | None = None,
) -> rd.Dataset:
    """Adjacent token-pair frequencies over the corpus — the counting
    step of ONE BPE merge selection (Sennrich et al., ACL 2016:
    repeatedly merge the most frequent adjacent pair). Tokenizer
    induction at 100 TB is exactly this loop, and each iteration is one
    streaming pass here:

    - per batch: flatten the list column zero-copy, form adjacent
      pairs with a boundary mask (no pair spans two documents), pack
      ``(a << 32) | b`` into one int64 code, ``np.unique`` the block —
      each block reduces to its distinct pairs;
    - final reduce: coarse-bucket vectorized arrow aggregation
      (``dedup._bucketed_group_agg`` — never per-pair Ray groups);
    - ``top_k``: global sort on (cnt desc, tok_a, tok_b) + limit.

    Token ids must be non-negative and < 2^31 (any real vocab id;
    validated). Output ``(tok_a, tok_b, cnt)`` int32/int32/int64.
    """
    from palimpzest_ray.stages.dedup import _bucketed_group_agg

    def _partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"code": pa.array([], pa.int64()),
             "cnt": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        col = batch[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vals = col.values.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(vals) == 0:
            return empty
        if vals.min() < 0 or vals.max() >= (1 << 31):
            raise ValueError("token ids must be in [0, 2^31)")
        offsets = col.offsets.to_numpy()
        a, b = vals[:-1], vals[1:]
        # boundary mask: drop the pair straddling each list edge
        mask = np.ones(len(vals) - 1, dtype=bool) if len(vals) > 1 else \
            np.zeros(0, dtype=bool)
        edges = offsets[1:-1]  # interior boundaries
        mask[edges[(edges > 0) & (edges < len(vals))] - 1] = False
        code = (a[mask] << np.int64(32)) | b[mask]
        if len(code) == 0:
            return empty
        u, cnt = np.unique(code, return_counts=True)
        return pa.table(
            {"code": pa.array(u), "cnt": pa.array(cnt.astype(np.int64))}
        )

    def _sum_codes(g: pa.Table) -> pa.Table:
        return (
            g.group_by(["code"], use_threads=False)
            .aggregate([("cnt", "sum")])
            .rename_columns(["code", "cnt"])
        )

    partial = ds.map_batches(_partial, batch_format="pyarrow")
    counts = _bucketed_group_agg(partial, ["code"], _sum_codes)

    def _unpack(batch: pa.Table) -> pa.Table:
        code = batch["code"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "tok_a": pa.array((code >> np.int64(32)).astype(np.int32)),
                "tok_b": pa.array(
                    (code & np.int64(0xFFFFFFFF)).astype(np.int32)
                ),
                "cnt": batch["cnt"],
            }
        )

    out = counts.map_batches(_unpack, batch_format="pyarrow")
    if top_k is not None:
        # sort key: cnt desc, then (tok_a, tok_b) asc — expressed as one
        # ascending composite (negate cnt; pair code is already ordered)
        def _sort_key(batch: pa.Table) -> pa.Table:
            cnt = batch["cnt"].to_numpy(zero_copy_only=False)
            code = (
                batch["tok_a"].to_numpy(zero_copy_only=False).astype(np.int64)
                << np.int64(32)
            ) | batch["tok_b"].to_numpy(zero_copy_only=False).astype(np.int64)
            return batch.append_column("__neg", pa.array(-cnt)).append_column(
                "__code", pa.array(code)
            )

        out = (
            out.map_batches(_sort_key, batch_format="pyarrow")
            .sort(["__neg", "__code"])
            .limit(top_k)
            .map_batches(
                lambda b: b.drop_columns(["__neg", "__code"]),
                batch_format="pyarrow",
            )
        )
    return out


def apply_merge_batch(
    batch: pa.Table,
    pair: tuple[int, int],
    new_id: int,
    *,
    tokens_col: str = "tokens",
) -> pa.Table:
    """Replace every non-overlapping occurrence of ``pair`` with
    ``new_id`` inside each token list (left-to-right, the BPE rule),
    vectorized: one boundary-masked match pass + an overlap fix-up
    (a run like [x,x,x] for pair (x,x) merges once, greedily)."""
    col = batch[tokens_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = col.values.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = col.offsets.to_numpy().astype(np.int64)
    n = len(vals)
    if n < 2:
        return batch
    a, b = pair
    hit = (vals[:-1] == a) & (vals[1:] == b)
    edges = offsets[1:-1]
    hit[edges[(edges > 0) & (edges < n)] - 1] = False
    # greedy left-to-right: a hit at i disables a hit at i+1 (overlap);
    # runs only matter when a == b (otherwise hits can't be adjacent)
    if a == b and hit.any():
        idx = np.flatnonzero(hit)
        keep = np.ones(len(idx), dtype=bool)
        for k in range(1, len(idx)):  # bounded by hits in a run
            if idx[k] == idx[k - 1] + 1 and keep[k - 1]:
                keep[k] = False
        hit[:] = False
        hit[idx[keep]] = True
    if not hit.any():
        return batch
    out = vals.copy()
    out[np.flatnonzero(hit)] = new_id
    drop = np.zeros(n, dtype=bool)
    drop[np.flatnonzero(hit) + 1] = True
    # new per-list lengths after dropping merged right-halves
    # (cumsum indexing is safe for empty lists, unlike reduceat)
    cums = np.concatenate([[0], np.cumsum(drop)])
    dropped_per_list = cums[offsets[1:]] - cums[offsets[:-1]]
    new_lens = np.diff(offsets) - dropped_per_list
    new_offsets = np.zeros(len(offsets), dtype=np.int64)
    np.cumsum(new_lens, out=new_offsets[1:])
    merged = pa.LargeListArray.from_arrays(
        pa.array(new_offsets, pa.int64()),
        pa.array(out[~drop].astype(np.int32), pa.int32()),
    ).cast(pa.list_(pa.int32()))
    i = batch.column_names.index(tokens_col)
    return batch.set_column(i, tokens_col, merged)


def apply_bpe(
    ds: rd.Dataset,
    merges: list[tuple[int, int, int]],
    *,
    tokens_col: str = "tokens",
) -> rd.Dataset:
    """ENCODE a corpus with a learned merge table — the inference half
    of :func:`learn_bpe`, shaped for scale: ONE streaming ``map_batches``
    pass over the corpus, looping the merge rules in learned order
    inside the batch fn (each rule exhaustively via the vectorized
    :func:`apply_merge_batch`), with none of the per-rule corpus
    re-materialization the training loop needs.

    Applying each rule exhaustively once, in learned order, equals the
    classic iterative min-rank encode: a merge only creates adjacencies
    involving its fresh ``new_id``, whose own pairs were learned LATER,
    so no earlier rule can newly apply after its pass (and a rule can
    never re-enable itself — ``new_id`` is fresh). The equivalence is
    pinned against a pure-python iterative reference in
    ``tests/test_packing.py``."""
    rules = [(int(a), int(b), int(n)) for a, b, n in merges]

    def _encode(batch: pa.Table) -> pa.Table:
        for a, b, nid in rules:
            batch = apply_merge_batch(batch, (a, b), nid, tokens_col=tokens_col)
        return batch

    return ds.map_batches(_encode, batch_format="pyarrow")


def learn_bpe(
    ds: rd.Dataset,
    n_merges: int,
    *,
    tokens_col: str = "tokens",
    next_id: int | None = None,
) -> list[tuple[int, int, int]]:
    """Distributed BPE training loop (Sennrich et al., ACL 2016): each
    iteration counts adjacent pairs with :func:`token_pair_counts`
    (one streaming pass), picks the most frequent (tie-break: smaller
    pair code), assigns it the next vocab id, and rewrites the corpus
    with :func:`apply_merge_batch`. Returns the merge table
    ``[(tok_a, tok_b, new_id), ...]``.

    The corpus is re-materialized per iteration (BPE is inherently
    iterative); at 100 TB you run few merges per job and checkpoint the
    corpus between them — the merge table itself is tiny state."""
    merges: list[tuple[int, int, int]] = []
    cur = ds
    for _ in range(n_merges):
        top = token_pair_counts(cur, tokens_col=tokens_col, top_k=1)
        rows = top.take_all()
        if not rows or rows[0]["cnt"] < 2:
            break
        a, b = int(rows[0]["tok_a"]), int(rows[0]["tok_b"])
        if next_id is None:
            mx = cur.map_batches(
                lambda t: pa.table({"m": pa.array([
                    int(pa.compute.max(pa.compute.list_flatten(
                        t[tokens_col].combine_chunks()
                        if isinstance(t[tokens_col], pa.ChunkedArray)
                        else t[tokens_col])).as_py() or 0)
                ], pa.int64())}),
                batch_format="pyarrow",
            )
            next_id = max(r["m"] for r in mx.take_all()) + 1
        nid = next_id
        next_id += 1
        merges.append((a, b, nid))
        cur = cur.map_batches(
            lambda t, _p=(a, b), _n=nid: apply_merge_batch(
                t, _p, _n, tokens_col=tokens_col
            ),
            batch_format="pyarrow",
        ).materialize()
    return merges
