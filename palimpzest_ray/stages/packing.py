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
