"""Round-3 exact-oracle formulations of the approximate-dedup family
(q57-q60): candidate generation + exact-threshold verify, so each
output is a pure function of the data a SQL oracle can state.

Covers the guarantees the driver rows rely on:
- FNV-1a-64 codepoint hash is bit-identical to the DuckDB expression
  the q58 oracle embeds.
- MinHash r=1 candidate pairs COVER the exact Jaccard>=0.8 pair set
  (the recall proof behind q57's semi-join formulation).
- exact_jaccard_pairs equals an independent brute-force computation.
- simhash pigeonhole pairs equal all-pairs brute force (recall 1).
- cosine_dup_pairs equals numpy brute force.
- lsh_knn_search(probe="all") equals exact knn_search.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _docs():
    return rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def test_fnv_matches_duckdb_expression(ray_session):
    import duckdb

    from palimpzest_ray.stages.dedup import _fnv1a_codepoints

    words = ["hello", "the", "a", "", "München", "日本語", "x" * 40, "mixedCase"]
    eng = _fnv1a_codepoints(pa.array(words)).tolist()
    con = duckdb.connect()
    got = [
        r[0]
        for r in con.execute(
            """
            select list_reduce(
              list_prepend(14695981039346656037::HUGEINT,
                           list_transform(range(1, length(w)+1), i -> unicode(w[i]))),
              (h, c) -> ((xor(h::UBIGINT, c::UBIGINT))::HUGEINT
                         * 1099511628211::HUGEINT)
                        % 18446744073709551616::HUGEINT
            )::UBIGINT from (select unnest($words) as w)
            """,
            {"words": words},
        ).fetchall()
    ]
    # duckdb's list_reduce over an empty char list returns the init value
    assert eng == got


def _brute_jaccard_pairs(threshold: float) -> dict[tuple[int, int], float]:
    """Driver-side reference: per-doc shingle sets via the engine's own
    hashing primitives, then ALL-pairs Jaccard (no candidate step)."""
    from palimpzest_ray.stages.dedup import _shingle_hashes, _word_hashes

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    h, parents = _word_hashes(t["text"])
    sh, sp = _shingle_hashes(h, parents, 3)
    ids = t["doc_id"].to_numpy()
    sets: dict[int, set] = {}
    for s, p in zip(sh.tolist(), sp.tolist()):
        sets.setdefault(int(ids[p]), set()).add(s)
    out = {}
    keys = sorted(sets)
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if not inter:
                continue
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= threshold:
                out[(a, b)] = j
    return out


def test_exact_jaccard_pairs_matches_brute_force(ray_session):
    from palimpzest_ray.stages.dedup import exact_jaccard_pairs

    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in exact_jaccard_pairs(_docs(), threshold=0.8).take_all()
    }
    want = _brute_jaccard_pairs(0.8)
    assert got == want and len(got) > 0


def test_minhash_r1_candidates_cover_exact_pairs(ray_session):
    """The recall proof behind q57: with r=1 (bands == num_perm) a true
    pair at Jaccard s is missed with probability (1-s)^64 — assert the
    miss count is exactly zero on the test corpus."""
    from palimpzest_ray.stages.dedup import minhash_candidate_pairs

    cand = {
        (r["id_a"], r["id_b"])
        for r in minhash_candidate_pairs(
            _docs(), num_perm=64, bands=64, threshold=0.0, max_bucket=1_000_000
        ).take_all()
    }
    exact = set(_brute_jaccard_pairs(0.8))
    assert exact and exact <= cand


def test_simhash_pairs_match_all_pairs_brute_force(ray_session):
    """Pigeonhole banding has recall 1 for Hamming <= 3 by construction;
    verify against all-pairs xor/popcount in numpy (fnv mode, the q58
    contract configuration)."""
    from palimpzest_ray.stages.dedup import simhash_ds, simhash_pairs

    sig = {
        r["doc_id"]: r["simhash"]
        for r in simhash_ds(_docs(), hash_fn="fnv").take_all()
    }
    ids = sorted(sig)
    want = set()
    arr = np.array([sig[i] for i in ids], dtype=np.uint64)
    ii, jj = np.triu_indices(len(ids), k=1)
    x = arr[ii] ^ arr[jj]
    ham = np.zeros(len(x), np.int64)
    while x.any():
        ham += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    for a, b, hm in zip(ii[ham <= 3], jj[ham <= 3], ham[ham <= 3]):
        want.add((ids[a], ids[b], int(hm)))
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_pairs(
            _docs(), max_hamming=3, hash_fn="fnv", max_bucket=1_000_000
        ).take_all()
    }
    assert got == want and len(got) > 0


def test_cosine_dup_pairs_match_brute_force(ray_session):
    from palimpzest_ray.stages.dedup import cosine_dup_pairs

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    V = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    ids = t["vec_id"].to_numpy()
    S = np.round(V @ V.T * 1000)
    ii, jj = np.triu_indices(len(ids), k=1)
    keep = S[ii, jj] >= 430
    want = {
        (int(ids[a]), int(ids[b]), int(s))
        for a, b, s in zip(ii[keep], jj[keep], S[ii, jj][keep])
    }
    emb = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    got = {
        (r["id_a"], r["id_b"], r["score"])
        for r in cosine_dup_pairs(emb, threshold=0.43).take_all()
    }
    assert got == want and len(got) > 0


def test_lsh_probe_all_equals_exact_knn(ray_session):
    from palimpzest_ray.stages.similarity import knn_search, lsh_knn_search

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = t.sort_by("vec_id")
    Q = np.array(t["embedding"].to_pylist()[:2], dtype=np.float64)
    emb = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    kw = dict(k=10, dtype=np.float64, round_to=3, int_scores=True)
    exact = knn_search(emb, Q, **kw).take_all()
    viaLsh = lsh_knn_search(emb, Q, probe="all", **kw).take_all()
    key = lambda r: (r["query_idx"], r["rank"])  # noqa: E731
    assert sorted(viaLsh, key=key) == sorted(exact, key=key)
