"""Dedup-at-ingest (cdc/dedup_ingest.py): screening new documents
against a corpus lake via its shingle posting index — exactness vs a
brute-force oracle, admit/re-screen convergence, incremental index
maintenance through corpus updates, and the partition-pruned read
shape."""

import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from palimpzest_ray.cdc import dedup_ingest as DI


def _brute_force_survivors(
    corpus: pa.Table, batch: pa.Table, threshold: float, shingle: int = 3
) -> list:
    """Oracle: exact per-pair Jaccard over distinct shingle-hash sets
    computed by the same shingle_table (hash-level ground truth)."""
    cs = DI.shingle_table(corpus, shingle=shingle)
    bs = DI.shingle_table(batch, shingle=shingle)
    c_sets = [set(x) for x in cs["shingles"].to_pylist()]
    out = []
    for bid, sh in zip(bs["doc_id"].to_pylist(), bs["shingles"].to_pylist()):
        b_set = set(sh)
        dup = any(
            b_set and c and len(b_set & c) / len(b_set | c) >= threshold
            for c in c_sets
        )
        if not dup:
            out.append(bid)
    return out


CORPUS = pa.table(
    {
        "doc_id": ["c1", "c2", "c3", "c4"],
        "text": [
            "the quick brown fox jumps over the lazy dog",
            "machine learning models need clean data pipelines every day",
            "short doc",
            "an entirely different corpus entry about geology and rocks",
        ],
        "source": ["a", "a", "b", "b"],
    }
)

BATCH = pa.table(
    {
        "doc_id": ["n1", "n2", "n3", "n4", "n5"],
        "text": [
            "the quick brown fox jumps over the lazy dog",  # exact dup c1
            "machine learning models need clean data pipelines every week",
            "completely unrelated sentence about astronomy and stars",
            "short doc",  # exact dup c3 (short-doc synthetic shingle)
            "",  # wordless: no shingles, never a dup
        ],
        "source": ["x"] * 5,
    }
)


@pytest.fixture()
def corpus_lake(tmp_path):
    cr = os.path.join(str(tmp_path), "corpus")
    ir = os.path.join(str(tmp_path), "idx")
    DI.init_corpus(
        rd.from_arrow(CORPUS), cr, ir, num_partitions=4, index_partitions=4
    )
    return cr, ir


def test_screen_matches_brute_force(corpus_lake):
    cr, ir = corpus_lake
    for t in (0.5, 0.8, 1.0):
        got = sorted(
            DI.screen(cr, ir, BATCH, threshold=t)["unique"]["doc_id"]
            .to_pylist()
        )
        assert got == sorted(_brute_force_survivors(CORPUS, BATCH, t)), t


def test_screen_reports_pairs_with_exact_jaccard(corpus_lake):
    cr, ir = corpus_lake
    dups = DI.screen(cr, ir, BATCH, threshold=0.5)["dups"]
    by_pair = {
        (r["new_id"], r["corpus_id"]): r["jaccard"]
        for r in dups.to_pylist()
    }
    assert by_pair[("n1", "c1")] == 1.0
    assert by_pair[("n4", "c3")] == 1.0
    # n2 vs c2: 9-word docs → 7 shingles each, 6 shared → 6/(7+7-6)
    assert by_pair[("n2", "c2")] == pytest.approx(6 / 8)
    assert ("n3", "c4") not in by_pair


def test_admit_then_rescreen_all_dups(corpus_lake):
    cr, ir = corpus_lake
    res = DI.admit(cr, ir, BATCH, threshold=0.5)
    assert res["admitted"] == res["unique"].num_rows
    assert res["admitted"] + res["rejected"] == BATCH.num_rows
    admitted_ids = set(res["unique"]["doc_id"].to_pylist())
    # every admitted doc (with any shingles) now self-matches at J=1;
    # previously-rejected docs still match their corpus originals
    res2 = DI.screen(cr, ir, BATCH, threshold=0.5)
    survivors2 = set(res2["unique"]["doc_id"].to_pylist())
    assert survivors2 <= {"n5"}  # wordless doc can never match
    self_pairs = {
        (r["new_id"], r["corpus_id"])
        for r in res2["dups"].to_pylist()
    }
    for d in admitted_ids - {"n5"}:
        assert (d, d) in self_pairs


def test_admit_is_lww_idempotent(corpus_lake):
    cr, ir = corpus_lake
    DI.admit(cr, ir, BATCH, threshold=0.5)
    again = DI.admit(cr, ir, BATCH, threshold=0.5)
    assert again["admitted"] <= 1  # only the wordless doc can re-admit
    res = DI.screen(cr, ir, BATCH, threshold=0.5)
    assert res["dups"].num_rows > 0


def test_corpus_update_reflected_after_refresh(corpus_lake, tmp_path):
    """UPDATE a corpus doc through the ordinary CDC path, refresh the
    posting index, and screening must see the NEW text."""
    from palimpzest_ray.cdc import apply_changes
    from palimpzest_ray.cdc.engine import load_latest_manifest
    from palimpzest_ray.cdc.index import refresh_token_index

    cr, ir = corpus_lake
    new_text = "a completely rewritten corpus entry about oceans"
    t = DI.shingle_table(
        pa.table({"doc_id": ["c1"], "text": [new_text], "source": ["a"]})
    )
    lsn = int(load_latest_manifest(cr).max_lsn) + 1
    ev = pa.table(
        {
            "lsn": pa.array([lsn], pa.int64()),
            "op": pa.array(["UPDATE"]),
            "doc_id": t["doc_id"],
            "shingles": t["shingles"],
            "n_sh": t["n_sh"],
            "source": t["source"],
        }
    )
    apply_changes(rd.from_arrow(ev), cr, change_schema=DI.CORPUS_SCHEMA)
    refresh_token_index(cr, ir)

    probe = pa.table(
        {
            "doc_id": ["p1", "p2"],
            "text": [
                "the quick brown fox jumps over the lazy dog",  # OLD c1
                new_text,  # NEW c1
            ],
            "source": ["x", "x"],
        }
    )
    res = DI.screen(cr, ir, probe, threshold=0.9)
    assert res["unique"]["doc_id"].to_pylist() == ["p1"]
    assert {r["new_id"] for r in res["dups"].to_pylist()} == {"p2"}


def test_shingle_table_short_and_empty_docs():
    t = DI.shingle_table(
        pa.table(
            {
                "doc_id": ["a", "b", "c"],
                "text": ["one two", "one two", ""],
            }
        )
    )
    sh = t["shingles"].to_pylist()
    assert sh[0] == sh[1] and len(sh[0]) == 1  # synthetic short shingle
    assert sh[2] == []
    assert t["n_sh"].to_pylist() == [1, 1, 0]


def test_screen_prune_is_lossless_random():
    """Randomized: the count-prune (c >= ceil(t*|A|)) never drops a true
    duplicate — screen == brute force on a seeded corpus with heavy
    word overlap."""
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]

    def mk(n):
        return [
            " ".join(rng.choice(vocab, size=rng.integers(3, 12)))
            for _ in range(n)
        ]

    corpus = pa.table(
        {"doc_id": [f"c{i}" for i in range(40)], "text": mk(40)}
    )
    batch = pa.table(
        {"doc_id": [f"n{i}" for i in range(25)], "text": mk(25)}
    )
    import tempfile

    work = tempfile.mkdtemp(prefix="dedup_rand_")
    cr, ir = os.path.join(work, "c"), os.path.join(work, "i")
    DI.init_corpus(rd.from_arrow(corpus), cr, ir,
                   num_partitions=4, index_partitions=4)
    for t in (0.3, 0.6, 0.9):
        got = sorted(
            DI.screen(cr, ir, batch, threshold=t)["unique"]["doc_id"]
            .to_pylist()
        )
        assert got == sorted(_brute_force_survivors(corpus, batch, t)), t


# --------------------------------------------------------------------------
# repeated k-gram spans (cross-document duplicate detection)
# --------------------------------------------------------------------------


def test_repeated_spans_matches_brute_force():
    from collections import Counter

    from palimpzest_ray.stages.dedup import repeated_kgram_spans

    rng = np.random.default_rng(6)
    docs = [rng.integers(0, 5, rng.integers(0, 15)).tolist()
            for _ in range(50)]
    t = pa.table(
        {"doc_id": pa.array(range(len(docs)), pa.int64()),
         "tokens": pa.array(docs, pa.list_(pa.int32()))}
    )
    k = 4
    got = sorted(
        (r["doc_id"], r["pos"])
        for r in repeated_kgram_spans(
            rd.from_arrow(t).repartition(7), k=k, min_docs=2
        ).take_all()
    )
    gram_docs: dict[tuple, set] = {}
    for di, d in enumerate(docs):
        for i in range(len(d) - k + 1):
            gram_docs.setdefault(tuple(d[i: i + k]), set()).add(di)
    exp = sorted(
        (di, i)
        for di, d in enumerate(docs)
        for i in range(len(d) - k + 1)
        if len(gram_docs[tuple(d[i: i + k])]) >= 2
    )
    assert got == exp
    del Counter


def test_repeated_spans_min_docs_and_self_repeat():
    from palimpzest_ray.stages.dedup import repeated_kgram_spans

    t = pa.table(
        {"doc_id": pa.array([0, 1], pa.int64()),
         # (7,7) repeats WITHIN doc0 only — min_docs counts DISTINCT
         # docs, so it must not flag
         "tokens": pa.array([[7, 7, 7], [1, 2]], pa.list_(pa.int32()))}
    )
    res = repeated_kgram_spans(rd.from_arrow(t), k=2, min_docs=2)
    assert res.take_all() == []
    res3 = repeated_kgram_spans(rd.from_arrow(t), k=2, min_docs=1)
    got = sorted((r["doc_id"], r["pos"]) for r in res3.take_all())
    assert got == [(0, 0), (0, 1), (1, 0)]


def test_remove_spans_overlap_merge_and_counts():
    from palimpzest_ray.stages.dedup import remove_spans

    t = pa.table(
        {"doc_id": pa.array([0, 1, 2], pa.int64()),
         "tokens": pa.array(
             [[1, 2, 3, 4, 5, 6], [7, 8, 9], [1, 1]], pa.list_(pa.int32())
         )}
    )
    # doc0: spans at pos 0 and 2 with k=3 -> covered [0,3) U [2,5) = [0,5)
    spans = pa.table(
        {"doc_id": pa.array([0, 0], pa.int64()),
         "pos": pa.array([0, 2], pa.int64())}
    )
    out = pa.concat_tables(
        remove_spans(rd.from_arrow(t), spans, k=3).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("doc_id")
    assert out["tokens"].to_pylist() == [[6], [7, 8, 9], [1, 1]]
    assert out["n_removed"].to_pylist() == [5, 0, 0]


def test_detect_then_remove_leaves_no_repeats():
    """After cutting, re-detection finds nothing (fixpoint on this
    corpus shape)."""
    from palimpzest_ray.stages.dedup import remove_spans, repeated_kgram_spans

    shared = list(range(30, 40))
    docs = [
        shared + [1, 2, 3],
        [5, 6] + shared,
        [9, 9, 9, 9, 9, 9, 9, 9, 9, 9, 9, 9],
    ]
    t = pa.table(
        {"doc_id": pa.array(range(3), pa.int64()),
         "tokens": pa.array(docs, pa.list_(pa.int32()))}
    )
    k = 10
    spans = pa.Table.from_pylist(
        repeated_kgram_spans(rd.from_arrow(t), k=k, min_docs=2).take_all(),
        pa.schema([("doc_id", pa.int64()), ("pos", pa.int64())]),
    )
    assert spans.num_rows == 2  # the shared run, once per doc
    cleaned = remove_spans(rd.from_arrow(t), spans, k=k).materialize()
    again = repeated_kgram_spans(
        cleaned, k=k, min_docs=2
    ).take_all()
    assert again == []
    rows = pa.concat_tables(
        cleaned.iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("doc_id")
    assert rows["tokens"].to_pylist()[0] == [1, 2, 3]
    assert rows["tokens"].to_pylist()[1] == [5, 6]
    assert rows["tokens"].to_pylist()[2] == docs[2]  # within-doc only
