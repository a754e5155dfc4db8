"""Sequence packing (stages/packing.py): exact equivalence with the
sequential concat-and-chunk reference, layout invariance, boundary
crossing, drop_last semantics, char tokenizer."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from palimpzest_ray.stages import packing


def _tok_table(n_docs: int, seed: int = 0) -> pa.Table:
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n_docs):
        ln = int(rng.integers(0, 40))
        docs.append(rng.integers(1, 1000, size=ln).astype(np.int32).tolist())
    return pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "tokens": pa.array(docs, pa.list_(pa.int32())),
        }
    )


def _run(table, seq_len, **kw):
    got = packing.pack_sequences(rd.from_arrow(table), seq_len, **kw).take_all()
    return sorted((r["seq_id"], list(r["tokens"])) for r in got)


def test_pack_matches_sequential_reference():
    t = _tok_table(200, seed=1)
    exp = packing.pack_sequences_reference(t, 64)
    assert _run(t, 64) == sorted(exp)
    # every full sequence has exactly seq_len tokens and ids are dense
    got = _run(t, 64)
    assert all(len(toks) == 64 for _, toks in got)
    assert [s for s, _ in got] == list(range(len(got)))


def test_pack_layout_invariant():
    """Same rows, shuffled input order + different block structure →
    identical packed output (the order column defines the layout)."""
    t = _tok_table(150, seed=2)
    perm = np.random.default_rng(9).permutation(t.num_rows)
    shuffled = t.take(pa.array(perm))
    ds = rd.from_arrow(shuffled).repartition(7)
    got = sorted(
        (r["seq_id"], list(r["tokens"]))
        for r in packing.pack_sequences(ds, 50, num_buckets=5).take_all()
    )
    assert got == sorted(packing.pack_sequences_reference(t, 50))


def test_pack_doc_crossing_boundaries():
    """One doc longer than seq_len must span multiple sequences."""
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "tokens": pa.array(
                [list(range(1, 26)), [90, 91]], pa.list_(pa.int32())
            ),
        }
    )
    got = _run(t, 10, eos_id=0, drop_last=False)
    exp = packing.pack_sequences_reference(t, 10, drop_last=False)
    assert got == sorted(exp)
    # doc 0 (25 toks + EOS) fills seqs 0,1 and spills into 2
    assert got[0][1] == list(range(1, 11))
    assert got[2][1][:6] == [21, 22, 23, 24, 25, 0]


def test_pack_drop_last_and_empty_docs():
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "tokens": pa.array([[], [5, 6, 7], None], pa.list_(pa.int32())),
        }
    )
    # stream: [EOS] [5 6 7 EOS] [EOS] = 6 tokens
    full = _run(t, 4, drop_last=False)
    assert full == [(0, [0, 5, 6, 7]), (1, [0, 0])]
    assert _run(t, 4, drop_last=True) == [(0, [0, 5, 6, 7])]


def test_pack_custom_eos_and_bucket_count():
    t = _tok_table(80, seed=3)
    exp = packing.pack_sequences_reference(t, 32, eos_id=-1)
    assert _run(t, 32, eos_id=-1, num_buckets=200) == sorted(exp)


def test_add_char_tokens():
    batch = pa.table({"text": ["ab", "", None, "héllo"]})
    out = packing.add_char_tokens(batch)
    toks = out["tokens"].to_pylist()
    assert toks[0] == [97, 98]
    assert toks[1] == [] and toks[2] == []
    assert toks[3] == [ord(c) for c in "héllo"]


# --------------------------------------------------------------------------
# BPE: pair counting + merge loop
# --------------------------------------------------------------------------


def _bpe_ref(docs: list[list[int]], n_merges: int, next_id: int):
    """Pure-python BPE reference: count pairs, merge most frequent
    (tie-break smaller (a, b)), greedy left-to-right application."""
    from collections import Counter

    docs = [list(d) for d in docs]
    merges = []
    for _ in range(n_merges):
        cnt = Counter()
        for d in docs:
            for x, y in zip(d, d[1:]):
                cnt[(x, y)] += 1
        if not cnt:
            break
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), _ = best
        merges.append((a, b, next_id))
        for di, d in enumerate(docs):
            out, i = [], 0
            while i < len(d):
                if i + 1 < len(d) and d[i] == a and d[i + 1] == b:
                    out.append(next_id)
                    i += 2
                else:
                    out.append(d[i])
                    i += 1
            docs[di] = out
        next_id += 1
    return merges, docs


def test_token_pair_counts_matches_brute_force(ray_session):
    import numpy as np
    import ray.data as rd

    from palimpzest_ray.stages.packing import token_pair_counts

    rng = np.random.default_rng(17)
    docs = [rng.integers(0, 6, rng.integers(0, 9)).tolist() for _ in range(80)]
    t = pa.table(
        {"doc_id": pa.array(range(len(docs)), pa.int64()),
         "tokens": pa.array(docs, pa.list_(pa.int32()))}
    )
    got = {
        (r["tok_a"], r["tok_b"]): r["cnt"]
        for r in token_pair_counts(
            rd.from_arrow(t).repartition(7)
        ).take_all()
    }
    from collections import Counter

    exp = Counter()
    for d in docs:
        for x, y in zip(d, d[1:]):
            exp[(x, y)] += 1
    assert got == dict(exp)


def test_learn_bpe_matches_reference(ray_session):
    import numpy as np
    import ray.data as rd

    from palimpzest_ray.stages.packing import apply_merge_batch, learn_bpe

    rng = np.random.default_rng(23)
    docs = [rng.integers(0, 4, rng.integers(2, 14)).tolist()
            for _ in range(60)]
    t = pa.table(
        {"doc_id": pa.array(range(len(docs)), pa.int64()),
         "tokens": pa.array(docs, pa.list_(pa.int32()))}
    )
    merges = learn_bpe(rd.from_arrow(t).repartition(5), 4, next_id=100)
    exp_merges, exp_docs = _bpe_ref(docs, 4, 100)
    assert merges == exp_merges

    # applying the learned merges reproduces the reference corpus
    cur = t
    for a, b, nid in merges:
        cur = apply_merge_batch(cur, (a, b), nid)
    assert cur["tokens"].to_pylist() == exp_docs


def _bpe_encode_ref(doc: list[int], merges: list[tuple[int, int, int]]):
    """Classic ITERATIVE min-rank encode (subword-nmt shape): find the
    lowest-rank applicable rule, apply it exhaustively, repeat until
    none applies — the reference apply_bpe's ordered single pass must
    equal."""
    rank = {(a, b): (i, n) for i, (a, b, n) in enumerate(merges)}
    d = list(doc)
    while True:
        present = {(x, y) for x, y in zip(d, d[1:]) if (x, y) in rank}
        if not present:
            return d
        a, b = min(present, key=lambda p: rank[p][0])
        nid = rank[(a, b)][1]
        out, i = [], 0
        while i < len(d):
            if i + 1 < len(d) and d[i] == a and d[i + 1] == b:
                out.append(nid)
                i += 2
            else:
                out.append(d[i])
                i += 1
        d = out


def test_apply_bpe_streaming_encode_matches_iterative(ray_session):
    """apply_bpe (one streaming pass, rules in learned order) equals
    the iterative min-rank encode on a corpus the rules were NOT
    learned from — the inference half of the BPE story."""
    import numpy as np
    import ray.data as rd

    from palimpzest_ray.stages.packing import apply_bpe, learn_bpe

    rng = np.random.default_rng(29)
    train = [rng.integers(0, 4, rng.integers(2, 14)).tolist() for _ in range(60)]
    tt = pa.table(
        {"doc_id": pa.array(range(len(train)), pa.int64()),
         "tokens": pa.array(train, pa.list_(pa.int32()))}
    )
    merges = learn_bpe(rd.from_arrow(tt).repartition(5), 6, next_id=100)
    assert len(merges) >= 4  # enough rules to chain (new ids re-merge)

    fresh = [rng.integers(0, 4, rng.integers(0, 20)).tolist() for _ in range(80)]
    ft = pa.table(
        {"doc_id": pa.array(range(len(fresh)), pa.int64()),
         "tokens": pa.array(fresh, pa.list_(pa.int32()))}
    )
    got = (
        apply_bpe(rd.from_arrow(ft).repartition(7), merges)
        .sort("doc_id").take_all()
    )
    want = [_bpe_encode_ref(d, merges) for d in fresh]
    assert [r["tokens"] for r in got] == want

    # and on the training corpus it reproduces learn_bpe's final state
    exp_merges, exp_docs = _bpe_ref(train, 6, 100)
    got_t = apply_bpe(rd.from_arrow(tt), merges).sort("doc_id").take_all()
    assert [r["tokens"] for r in got_t] == exp_docs


def test_apply_merge_greedy_runs(ray_session):
    from palimpzest_ray.stages.packing import apply_merge_batch

    t = pa.table(
        {"tokens": pa.array([[7, 7, 7, 7, 7], [7, 7], [1], []],
                            pa.list_(pa.int32()))}
    )
    out = apply_merge_batch(t, (7, 7), 9)
    # greedy left-to-right: [77,77,7] -> [9,9,7]; [7,7] -> [9]
    assert out["tokens"].to_pylist() == [[9, 9, 7], [9], [1], []]
