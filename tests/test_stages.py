"""Stage tests: text analysis, dedup families, similarity search,
multimodal plumbing — small deterministic inputs with exact oracles
(mirrors the reference's small-in-memory-table test style,
``tests/pytest/test_distinct.py:19-35``)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from palimpzest_ray.stages import dedup, multimodal, similarity, text

DOCS = [
    ("the cat sat on the mat and the dog slept", "en"),
    ("der hund und die katze das ist nicht gut", "de"),
    ("le chat et la maison les portes des villes", "fr"),
    ("el perro los gatos las casas una cosa que bien", "es"),
    ("zzz qqq xxx", "und"),
]


def _docs_ds():
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(DOCS)), pa.int64()),
                "text": pa.array([t for t, _ in DOCS]),
            }
        )
    )


# ---------------------------------------------------------------- text


def test_token_counts_match_python_split():
    t = pa.table({"text": pa.array(["a b  c", "", "one two three"])})
    out = text.add_token_counts(t)
    assert out["n_ws_tokens"].to_pylist() == [
        len(s.split(" ")) for s in t["text"].to_pylist()
    ]
    assert out["n_bpe_tokens"].to_pylist() == [3, 0, 3]


def test_word_stats():
    t = pa.table({"text": pa.array(["Abc 123!"])})
    out = text.add_word_stats(t)
    row = out.to_pylist()[0]
    assert row["n_words"] == 2
    assert row["n_alpha"] == 3
    assert row["n_digit"] == 3
    assert row["n_space"] == 1
    assert row["quality_ppm"] == int(3 * 1e6 / 8)


def test_language_id():
    t = pa.table({"text": pa.array([d for d, _ in DOCS])})
    out = text.add_language_id(t)
    assert out["lang_pred"].to_pylist() == [l for _, l in DOCS]


def test_language_id_sql_matches(tmp_path):
    import duckdb

    t = pa.table({"text": pa.array([d for d, _ in DOCS])})
    expr = text.language_id_sql("text")
    got = duckdb.connect().execute(f"select {expr} as lang_pred from t").df()
    assert got["lang_pred"].tolist() == [l for _, l in DOCS]


def test_fingerprint_deterministic():
    t = pa.table({"text": pa.array(["same", "same", "other"])})
    fp = text.add_fingerprint(t)["fp"].to_pylist()
    assert fp[0] == fp[1] != fp[2]


# ---------------------------------------------------------------- dedup


def _dup_table():
    base = "the quick brown fox jumps over the lazy dog again and again " * 4
    near = base.replace("lazy", "sleepy", 1)
    other = "completely different content about ray data streaming engines " * 4
    return pa.table(
        {
            "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
            "text": pa.array([base, base, near, other]),
        }
    )


def test_exact_dedup_keeps_min_id():
    ds = rd.from_arrow(_dup_table())
    out = dedup.exact_dedup(ds, ["text"], "doc_id").take_all()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [10, 12, 13]


def test_minhash_lsh_dedup_drops_near_dup():
    ds = rd.from_arrow(_dup_table())
    out = dedup.minhash_lsh_dedup(ds, threshold=0.5)
    ids = sorted(r["doc_id"] for r in out.take_all())
    assert ids == [10, 13]  # 11 exact-dup of 10, 12 near-dup of 10


def test_minhash_pairs_estimates():
    ds = rd.from_arrow(_dup_table())
    pairs = dedup.minhash_candidate_pairs(ds, threshold=0.5).take_all()
    by_pair = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs}
    assert by_pair[(10, 11)] == 1.0  # identical text => identical signature


def test_ngram_jaccard_exact():
    ds = rd.from_arrow(_dup_table())
    out = dedup.ngram_jaccard_pairs(ds, [(10, 11), (10, 13)]).to_pylist()
    assert out[0]["jaccard"] == 1.0
    assert out[1]["jaccard"] < 0.1


def test_simhash_dedup():
    ds = rd.from_arrow(_dup_table())
    out = dedup.simhash_dedup(ds, max_hamming=3)
    ids = sorted(r["doc_id"] for r in out.take_all())
    assert 10 in ids and 13 in ids and 11 not in ids


def test_embedding_neardup():
    rng = np.random.default_rng(0)
    V = rng.standard_normal((20, 8)).astype(np.float32)
    V[7] = V[3] + 1e-4  # near-identical pair
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(20), pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(V.reshape(-1)), 8
                ),
            }
        )
    )
    out = dedup.embedding_neardup(ds, threshold=0.999)
    ids = sorted(r["vec_id"] for r in out.take_all())
    assert 3 in ids and 7 not in ids and len(ids) == 19


# ---------------------------------------------------------------- similarity


def test_knn_matches_numpy_oracle():
    rng = np.random.default_rng(1)
    V = rng.standard_normal((100, 16)).astype(np.float32)
    Q = rng.standard_normal((3, 16)).astype(np.float32)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(100), pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(V.reshape(-1)), 16
                ),
            }
        )
    )
    got = similarity.knn_search(ds, Q, k=5).take_all()
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    S = Qn @ Vn.T
    for qi in range(3):
        expect = list(np.argsort(-S[qi])[:5])
        mine = [
            r["vec_id"]
            for r in sorted(
                (r for r in got if r["query_idx"] == qi), key=lambda r: r["rank"]
            )
        ]
        assert mine == expect


def test_lsh_knn_finds_self():
    rng = np.random.default_rng(2)
    V = rng.standard_normal((50, 8)).astype(np.float32)
    Q = V[17:18].copy()
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(50), pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(V.reshape(-1)), 8
                ),
            }
        )
    )
    got = similarity.lsh_knn_search(ds, Q, k=3).take_all()
    top = next(r for r in got if r["rank"] == 1)
    assert top["vec_id"] == 17 and top["score"] == 1.0


def test_ivf_knn_full_probe_equals_exact():
    """nprobe = nlist probes every list -> identical ids to brute force."""
    rng = np.random.default_rng(3)
    V = rng.standard_normal((200, 16)).astype(np.float32)
    Q = rng.standard_normal((3, 16)).astype(np.float32)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(200), pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(V.reshape(-1)), 16
                ),
            }
        )
    )
    exact = similarity.knn_search(ds, Q, k=5).take_all()
    ivf = similarity.ivf_knn_search(
        ds, Q, k=5, nlist=8, nprobe=8, train_size=200, iters=5
    ).take_all()
    for qi in range(3):
        e = {r["vec_id"] for r in exact if r["query_idx"] == qi}
        g = {r["vec_id"] for r in ivf if r["query_idx"] == qi}
        assert e == g, qi


def test_ivf_knn_finds_self_with_partial_probe():
    rng = np.random.default_rng(4)
    V = rng.standard_normal((300, 8)).astype(np.float32)
    Q = V[42:43].copy()
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(300), pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(V.reshape(-1)), 8
                ),
            }
        )
    )
    got = similarity.ivf_knn_search(
        ds, Q, k=3, nlist=16, nprobe=4, train_size=300, iters=5
    ).take_all()
    top = next(r for r in got if r["rank"] == 1)
    # the query's own vector is always in its probed list
    assert top["vec_id"] == 42 and top["score"] == 1.0


# ---------------------------------------------------------------- multimodal


def test_image_decode_stub_schema():
    blobs = [b"fakejpg-%d" % i * 10 for i in range(5)]
    ds = rd.from_arrow(
        multimodal.table_from_blobs([f"img{i}.jpg" for i in range(5)], blobs, "image/jpeg")
    )
    out = multimodal.decode_images(ds, concurrency=1, feature_dim=8)
    rows = out.take_all()
    assert len(rows) == 5
    assert len(rows[0]["image_feat"]) == 8
    assert rows[0]["width"] >= 1 and rows[0]["height"] >= 1
    # deterministic: same payload -> same features
    again = multimodal.decode_images(ds, concurrency=1, feature_dim=8).take_all()
    assert np.allclose(rows[0]["image_feat"], again[0]["image_feat"])


def test_frame_sample_explodes():
    blobs = [b"vid-%d" % i * 10 for i in range(3)]
    ds = rd.from_arrow(
        multimodal.table_from_blobs([f"v{i}.mp4" for i in range(3)], blobs, "video/mp4")
    )
    rows = multimodal.sample_frames(ds, concurrency=1, num_frames=4).take_all()
    assert len(rows) == 12
    assert sorted({r["frame_idx"] for r in rows}) == [0, 1, 2, 3]
    assert "content" not in rows[0]


def test_audio_duration():
    blobs = [b"\0" * 64_000]
    ds = rd.from_arrow(multimodal.table_from_blobs(["a.wav"], blobs, "audio/wav"))
    rows = multimodal.audio_features(ds, concurrency=1).take_all()
    assert rows[0]["duration_s"] == pytest.approx(2.0)


def test_infer_schema_yaml_and_jsonld(tmp_path):
    import pyarrow as pa

    from palimpzest_ray.sources.files import infer_schema_from_file

    y = tmp_path / "s.yml"
    y.write_text("- name: a\n  score: 1.5\n- name: b\n  score: 2.0\n")
    sch = infer_schema_from_file(str(y))
    assert sch.field("name").type == pa.string()
    assert sch.field("score").type == pa.float64()

    j = tmp_path / "s.jsonld"
    j.write_text('{"@context": "http://schema.org", "name": "x", "n": 3}\n')
    sch2 = infer_schema_from_file(str(j))
    assert "name" in sch2.names and "n" in sch2.names


def test_builtin_schema_catalog():
    import pyarrow as pa

    from palimpzest_ray import schemas as S

    for sch in (
        S.FILE_SCHEMA, S.TEXT_FILE_SCHEMA, S.URL_SCHEMA, S.DOWNLOAD_SCHEMA,
        S.WEBPAGE_SCHEMA, S.TABLE_SCHEMA, S.IMAGE_FILE_SCHEMA,
        S.AUDIO_FILE_SCHEMA, S.PDF_FILE_SCHEMA, S.XLS_FILE_SCHEMA,
    ):
        assert isinstance(sch, pa.Schema) and len(sch) >= 1
        assert sch.empty_table().num_rows == 0  # constructible
    # file readers emit the declared text-file shape
    assert set(S.TEXT_FILE_SCHEMA.names) == {"filename", "contents"}


def test_minhash_short_docs_not_mass_deduped():
    """Regression: sub-shingle-length docs must NOT all collapse into
    one duplicate cluster (the sentinel signature did exactly that)."""
    import pyarrow as pa
    import ray.data as rd

    from palimpzest_ray.stages.dedup import minhash_lsh_dedup

    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(6)]),
            "text": pa.array(
                ["hi there", "bye now", "totally different", "hi there",
                 "one", "two"]
            ),
        }
    )
    kept = sorted(
        r["doc_id"]
        for r in minhash_lsh_dedup(rd.from_arrow(t), threshold=0.8).take_all()
    )
    # only the exact short-dup pair (d0,d3) collapses; d1/d2/d4/d5 survive
    assert len(kept) == 5 and ("d0" in kept) != ("d3" in kept)


def test_tumbling_window_pre_epoch_floor():
    import datetime as dt

    import pyarrow as pa

    from palimpzest_ray.stages.windows import add_sliding_windows, add_tumbling_window

    ts = pa.array([dt.datetime(1969, 12, 31, 23, 59, 59, 999999)], pa.timestamp("us"))
    t = pa.table({"ts": ts})
    out = add_tumbling_window(t, "ts", 1)
    assert out["window_start"][0].as_py() == dt.datetime(1969, 12, 31, 23, 59, 59)
    # hop==window degenerates to tumbling, including pre-epoch
    out2 = add_sliding_windows(t, "ts", 1, 1)
    assert out2["window_start"][0].as_py() == dt.datetime(1969, 12, 31, 23, 59, 59)


def test_window_unit_normalization_and_type_error():
    import pyarrow as pa
    import pytest as _pytest

    from palimpzest_ray.stages.windows import add_tumbling_window

    ms = pa.table({"ts": pa.array([60_000], pa.timestamp("ms"))})  # 60s
    out = add_tumbling_window(ms, "ts", 60)
    assert out["window_start"][0].as_py().minute == 1  # unit-correct
    with _pytest.raises(TypeError, match="timestamp type"):
        add_tumbling_window(pa.table({"ts": pa.array([1])}), "ts", 60)


def test_render_row_column_collision():
    import pyarrow as pa
    import ray.data as rd

    from palimpzest_ray.stages import semantic as S

    ds = rd.from_arrow(pa.table({"row": pa.array(["A", "B"])}))
    out = S.sem_map(
        ds,
        fields=["echo"],
        template="val={row}",
        generator_factory=S.mock_generator(lambda p: '{"echo": "%s"}' % p),
    ).take_all()
    # the column named "row" wins over the whole-row JSON
    assert [r["echo"] for r in out] == ["val=A", "val=B"]


def test_calibrate_margin_widens_band():
    import numpy as np

    from palimpzest_ray.stages import semantic as S

    def embed(texts):
        m = {"a": [1.0, 0.0], "a2": [0.9, 0.1], "b": [0.0, 1.0]}
        return np.array([m[t] for t in texts], dtype=np.float32)

    lo0, hi0 = S.calibrate_similarity_thresholds(
        [("a", "a2", True), ("a", "b", False)], embed_fn=embed
    )
    lo, hi = S.calibrate_similarity_thresholds(
        [("a", "a2", True), ("a", "b", False)], embed_fn=embed, margin=0.05
    )
    assert lo > lo0 and hi < hi0  # margin WIDENS the generator band


def test_funnel_strict_ordering():
    import pandas as pd

    from palimpzest_ray.stages import windows as W

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 2, 3, 3],
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-03",   # 1: full funnel
                 "2024-01-03", "2024-01-02", "2024-01-01",   # 2: purchase BEFORE click
                 "2024-01-01", "2024-01-02"]                 # 3: signup+click only
            ),
            "event_type": ["signup", "click", "purchase",
                           "signup", "click", "purchase",
                           "signup", "click"],
        }
    )
    out = W.funnel(rd.from_pandas(df), ["signup", "click", "purchase"]).to_pylist()
    got = {r["step"]: r["n_entities"] for r in out}
    # user 2 has no click after its signup -> stops at step 1
    assert got == {"signup": 3, "click": 2, "purchase": 1}
    assert [r["step_idx"] for r in out] == [1, 2, 3]


def test_redact_pii_matches_duckdb_and_kinds():
    import duckdb

    from palimpzest_ray.stages import text as T2

    docs = pa.table({"text": pa.array([
        "mail a.b+c@ex-ample.co.uk or call +1 (555) 123-4567",
        "ssn 123-45-6789 ip 10.0.0.255 card 4111 1111 1111 1111",
        "clean text", None,
    ])})
    got = T2.redact_pii(docs)["text_redacted"].to_pylist()
    con = duckdb.connect(); con.register("docs", docs)
    want = [r[0] for r in con.execute(
        f"select {T2.redact_pii_sql()} from docs").fetchall()]
    assert got == want
    assert got[0] == "mail <EMAIL> or call <PHONE>"
    # kind subset leaves other PII untouched
    only_email = T2.redact_pii(docs, kinds=["email"])["text_redacted"].to_pylist()
    assert "<EMAIL>" in only_email[0] and "123-4567" in only_email[0]


def test_ivf_persistent_index_build_once_query_many(tmp_path, monkeypatch):
    """Reference ChromaIndex parity (index_dataset.py:8-60): build ONCE,
    query repeatedly with byte-identical results and NO quantizer
    retrain; probes read only the probed lists' files."""
    rng = np.random.default_rng(9)
    V = rng.standard_normal((500, 12)).astype(np.float32)
    Q = V[:2].copy()
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(500), pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(V.reshape(-1)), 12
                ),
            }
        )
    )
    root = str(tmp_path / "ivf")
    m = similarity.build_ivf_index(ds, root, nlist=8, train_size=500, iters=5)
    assert m["num_rows"] == 500 and m["nlist"] == 8 and m["dim"] == 12

    # no retrain on query: poison the trainer after build
    def _boom(*a, **k):
        raise AssertionError("quantizer retrained on query path")

    monkeypatch.setattr(similarity, "_spherical_kmeans", _boom)

    key = lambda rows: sorted(
        (r["query_idx"], r["vec_id"], r["rank"], r["score"]) for r in rows
    )
    r1 = similarity.ivf_index_search(root, Q, k=5, nprobe=3).take_all()
    r2 = similarity.ivf_index_search(root, Q, k=5, nprobe=3).take_all()
    assert key(r1) == key(r2) and len(r1) == 10

    # full probe == exact brute force
    full = similarity.ivf_index_search(root, Q, k=5, nprobe=8).take_all()
    exact = similarity.knn_search(ds, Q, k=5).take_all()
    assert key(full) == key(exact)


def test_ivf_empty_train_raises_clearly():
    empty = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
            }
        )
    )
    with pytest.raises(ValueError, match="empty"):
        similarity.ivf_knn_search(empty, np.ones((1, 4), np.float32), k=1)


def _cc_pairs_table(pairs):
    a = pa.array([p[0] for p in pairs], pa.int64())
    b = pa.array([p[1] for p in pairs], pa.int64())
    return rd.from_arrow(pa.table({"id_a": a, "id_b": b}))


def test_distributed_connected_components_matches_union_find():
    """duplicate_ids_distributed == the driver union-find drop set on
    chains, stars, and singleton edges — including a long path (the
    worst case for naive min propagation; pointer doubling contracts
    it in O(log n) rounds)."""
    import numpy as np

    rng = np.random.default_rng(5)
    pairs = []
    # long path (worst case for naive min propagation)
    pairs += [(i, i + 1) for i in range(12)]
    # stars with random centers
    for c in range(1000, 1004):
        pairs += [(c * 7, c * 7 + k) for k in range(1, 6)]
    # random sparse edges
    extra = rng.integers(10_000, 10_400, size=(24, 2))
    pairs += [(int(min(a, b)), int(max(a, b))) for a, b in extra if a != b]

    # driver union-find ground truth
    parent = {}

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
    expected = sorted(x for x in parent if find(x) != x)

    got = sorted(
        r["child"] for r in dedup.duplicate_ids_distributed(_cc_pairs_table(pairs)).take_all()
    )
    assert got == expected


def test_minhash_dedup_distributed_equals_driver_path():
    """Forcing the distributed clustering path yields the same surviving
    set as the driver union-find on an exact-duplicate corpus."""
    texts = [f"unique document number {i} with words" for i in range(12)]
    texts += ["the same duplicated text appears here many times"] * 6
    ids = [f"doc_{i:04d}" for i in range(len(texts))]
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    a = {
        r["doc_id"]
        for r in dedup.minhash_lsh_dedup(ds, distributed=False).take_all()
    }
    b = {
        r["doc_id"]
        for r in dedup.minhash_lsh_dedup(ds, distributed=True).take_all()
    }
    assert a == b and len(b) == 13  # 12 uniques + one duplicate representative


def test_chunk_text_overlap_reconstruction():
    """Neighboring chunks share exactly `overlap` chars; concatenating
    de-overlapped chunks rebuilds the document."""
    t = pa.table({"doc_id": [1], "text": ["x" * 5 + "abcdefghijKLMNOPQRST"]})
    out = text.chunk_text(t, chunk_size=8, overlap=3)
    chunks = out["chunk"].to_pylist()
    full = t["text"][0].as_py()
    rebuilt = chunks[0] + "".join(c[3:] for c in chunks[1:])
    assert rebuilt == full
    for a, b in zip(chunks, chunks[1:]):
        assert a[-3:] == b[:3] or len(b) < 3
    with pytest.raises(ValueError, match="overlap"):
        text.chunk_text(t, chunk_size=4, overlap=4)


def test_normalize_text_canonical_forms():
    import unicodedata

    decomposed = unicodedata.normalize("NFD", "Café")
    out = text.normalize_text(pa.table({"text": [decomposed, "A  \t B ", None]}))
    assert out["text_norm"].to_pylist() == ["café", "a b", None]


def test_decontaminate_methods_agree_and_match_oracle(ray_session):
    """contains and ngram paths produce identical clean sets, equal to
    the DuckDB restatement; word boundaries respected (no mid-word
    hits); snippets shorter than the shingle width still work."""
    import duckdb
    import ray.data as rd

    from palimpzest_ray.stages.text import decontaminate, decontaminate_sql

    docs = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(8)]),
            "text": pa.array(
                [
                    "The Quick  brown fox jumps",
                    "quickly browned food",  # mid-word: clean
                    "data quality matters a lot here",
                    "short",
                    ("filler words " * 10) + "data quality late",
                    "ends with quick brown",
                    "QUICK BROWN starts it off",
                    "   ",  # whitespace-only
                ]
            ),
        }
    )
    snips = ["quick brown", "data quality", "absent phrase zz"]
    ds = rd.from_arrow(docs)
    got_c = sorted(
        decontaminate(ds, snips, method="contains").to_pandas()["doc_id"]
    )
    got_n = sorted(decontaminate(ds, snips, method="ngram").to_pandas()["doc_id"])
    t = docs  # noqa: F841 — duckdb scans it
    want = [
        r[0]
        for r in duckdb.sql(
            "select doc_id from t where "
            + decontaminate_sql(snips)
            + " order by doc_id"
        ).fetchall()
    ]
    assert got_c == got_n == want == ["d1", "d3", "d7"]
    flagged = decontaminate(ds, snips, mode="flag").to_pandas()
    assert sorted(flagged[flagged.contaminated]["doc_id"]) == [
        "d0", "d2", "d4", "d5", "d6",
    ]
    # empty snippet list: everything clean, both modes
    assert decontaminate(ds, [], method="ngram").count() == 8
    f2 = decontaminate(ds, ["  "], mode="flag").to_pandas()
    assert not f2["contaminated"].any()


def test_decontaminate_tokens_subsequence_semantics(ray_session):
    """Token-level: contiguous subsequence only (order matters, no
    gaps), null token rows kept, snippets longer than the doc never
    match, verify removes hash-candidate false positives."""
    import numpy as np
    import ray.data as rd

    from palimpzest_ray.stages.text import decontaminate_tokens

    docs = pa.table(
        {
            "doc_id": pa.array(list("abcdefg")),
            "tokens": pa.array(
                [
                    [1, 2, 3, 4],
                    [4, 3, 2, 1],      # reversed: clean
                    [1, 3],            # gap: clean
                    None,              # null payload: kept
                    [5] * 30 + [1, 2, 3],
                    [1, 2],            # shorter than snippet: clean
                    [],
                ],
                pa.list_(pa.int32()),
            ),
        }
    )
    import ray

    ds = rd.from_arrow(docs)
    clean = pa.concat_tables(
        ray.get(decontaminate_tokens(ds, [[1, 2, 3]]).to_arrow_refs())
    )
    assert sorted(clean["doc_id"].to_pylist()) == ["b", "c", "d", "f", "g"]
    # brute-force cross-check on random data
    rng = np.random.default_rng(5)
    toks = [rng.integers(0, 9, size=rng.integers(0, 25)).tolist() for _ in range(60)]
    snips = [[1, 2], [3, 4, 5], [7, 7, 7]]
    t2 = pa.table(
        {
            "doc_id": pa.array([f"r{i}" for i in range(60)]),
            "tokens": pa.array(toks, pa.list_(pa.int32())),
        }
    )

    def brute(seq, s):
        return any(seq[i : i + len(s)] == s for i in range(len(seq) - len(s) + 1))

    want = sorted(
        f"r{i}" for i, seq in enumerate(toks) if not any(brute(seq, s) for s in snips)
    )
    got = sorted(
        decontaminate_tokens(rd.from_arrow(t2), snips, ngram_width=2).to_pandas()[
            "doc_id"
        ]
    )
    assert got == want


def test_lsh_bucket_overflow_reported_not_silent(ray_session, caplog):
    """VERDICT r3 #5: degenerate LSH buckets (e.g. many identical
    texts) are capped at max_bucket — and the truncation is REPORTED
    via the stats dict and a warning, never silent. Identical docs all
    land in the same band buckets, so with max_bucket=8 and 30 clones
    every band overflows by 22 rows."""
    import logging

    import ray.data as rd

    from palimpzest_ray.stages.dedup import minhash_candidate_pairs

    n = 30
    ds = rd.from_items(
        [{"doc_id": i, "text": "the same degenerate text " * 5}
         for i in range(n)]
    )
    stats: dict = {}
    with caplog.at_level(logging.WARNING, logger="palimpzest_ray.dedup"):
        pairs = minhash_candidate_pairs(
            ds, id_col="doc_id", max_bucket=8, bands=4, num_perm=16,
            stats=stats,
        ).take_all()
    assert stats["max_bucket"] == 8
    assert stats["overflow_buckets"] >= 1
    # every band key holds all 30 clones; each truncates 22 rows
    assert stats["dropped_rows"] >= 22
    assert any("truncated" in r.message for r in caplog.records)
    # capped bucket still yields pairs among the retained 8
    assert len(pairs) == 8 * 7 // 2

    # clean corpus: zero overflow, no warning
    ds2 = rd.from_items(
        [{"doc_id": i, "text": f"totally unique text {i} {i*7}"}
         for i in range(20)]
    )
    stats2: dict = {}
    minhash_candidate_pairs(
        ds2, id_col="doc_id", max_bucket=256, stats=stats2
    ).take_all()
    assert stats2["overflow_buckets"] == 0
    assert stats2["dropped_rows"] == 0


def test_index_adapter_reference_contract(ray_session, tmp_path):
    """Reference BaseIndex.search parity (index_dataset.py:24-50): one
    embedding -> list of results, batch -> list of lists; IVFIndex over
    the persistent artifact matches ivf_index_search at full probe;
    index_factory dispatches path/chroma-like/BaseIndex."""
    import numpy as np
    import ray.data as rd

    from palimpzest_ray.stages.similarity import (
        BaseIndex,
        ChromaIndex,
        IVFIndex,
        build_ivf_index,
        index_factory,
        ivf_index_search,
    )

    rng = np.random.default_rng(3)
    n, dim = 400, 16
    V = rng.standard_normal((n, dim)).astype(np.float32)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": V[i].tolist()} for i in range(n)]
    )
    path = str(tmp_path / "ivf")
    build_ivf_index(ds, path, nlist=8, train_size=400)

    idx = index_factory(path)
    assert isinstance(idx, IVFIndex)
    q = V[7].tolist()
    one = idx.search(q, results_per_query=5)
    assert [r["rank"] for r in one] == [1, 2, 3, 4, 5]
    assert one[0]["match_id"] == 7  # self-match at rank 1

    # batch form: list of lists, order preserved
    batch = idx.search([V[7].tolist(), V[11].tolist()], results_per_query=3)
    assert len(batch) == 2 and batch[0][0]["match_id"] == 7
    assert batch[1][0]["match_id"] == 11

    # full probe == the distributed search path, exactly
    exact = IVFIndex(path, nprobe=8)
    got = exact.search(q, results_per_query=5)
    want = ivf_index_search(path, np.array([q]), k=5, nprobe=8).to_pandas()
    want = want.sort_values("rank")
    assert [r["match_id"] for r in got] == want["vec_id"].tolist()
    assert [r["score"] for r in got] == want["score"].tolist()

    # chroma-like duck type: raw response shape passes through per query
    class FakeChroma:
        def query(self, query_embeddings, n_results):
            return {
                "ids": [[f"id{j}" for j in range(n_results)]
                        for _ in query_embeddings],
                "distances": [[0.1 * j for j in range(n_results)]
                              for _ in query_embeddings],
            }

    ch = index_factory(FakeChroma())
    assert isinstance(ch, ChromaIndex)
    r1 = ch.search(q, results_per_query=2)
    assert r1 == {"ids": ["id0", "id1"], "distances": [0.0, 0.1]}
    rb = ch.search([q, q], results_per_query=1)
    assert rb == [{"ids": ["id0"], "distances": [0.0]}] * 2

    assert index_factory(ch) is ch  # BaseIndex passthrough
    with pytest.raises(TypeError, match="Unsupported index type"):
        index_factory(42)
    assert isinstance(ch, BaseIndex)
