"""Fuzzy edit-distance join (stages/fuzzy.py): vectorized DP equals a
reference implementation; the q-gram count filter is lossless (pair
sets equal brute force across thresholds, alphabets, and lengths)."""

import itertools
import random

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from palimpzest_ray.stages.fuzzy import _lev_vectorized, edit_distance_pairs


def _lev_ref(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, d[0] = d[0], i
        for j in range(1, lb + 1):
            cur = min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev, d[j] = d[j], cur
    return d[lb]


def test_lev_vectorized_matches_reference_random():
    rng = random.Random(7)
    A = ["".join(rng.choice("abcd") for _ in range(rng.randint(0, 9)))
         for _ in range(300)]
    B = ["".join(rng.choice("abcd") for _ in range(rng.randint(0, 9)))
         for _ in range(300)]
    got = _lev_vectorized(A, B, 3)
    exp = np.array([_lev_ref(a, b) for a, b in zip(A, B)])
    assert (got == exp).all()


def test_lev_vectorized_unicode_and_empty():
    A = ["", "héllo", "naïve", "日本語のテキスト"]
    B = ["abc", "hello", "naive", "日本語テキスト"]
    got = _lev_vectorized(A, B, 5)
    assert got.tolist() == [3, 1, 1, 1]


def _brute_pairs(texts, k):
    return sorted(
        (i, j, _lev_ref(texts[i], texts[j]))
        for i, j in itertools.combinations(range(len(texts)), 2)
        if _lev_ref(texts[i], texts[j]) <= k
    )


@pytest.mark.parametrize("k", [0, 1, 2])
def test_edit_distance_pairs_equals_brute_force(k):
    rng = random.Random(31 + k)
    # heavy-overlap corpus: mutations of a few stems + noise strings
    stems = ["alpha beta", "gamma#0001", "zz"]
    texts = []
    for _ in range(60):
        s = list(rng.choice(stems))
        for _ in range(rng.randint(0, 2)):
            op = rng.choice("sid")
            p = rng.randrange(max(len(s), 1))
            if op == "s" and s:
                s[p] = rng.choice("abx#")
            elif op == "i":
                s.insert(p, rng.choice("abx#"))
            elif s:
                del s[p]
        texts.append("".join(s))
    t = pa.table(
        {"sid": pa.array(range(len(texts)), pa.int64()),
         "name": pa.array(texts)}
    )
    res = edit_distance_pairs(
        rd.from_arrow(t), text_col="name", id_col="sid", max_dist=k
    )
    got = sorted((r["id_a"], r["id_b"], r["dist"]) for r in res.take_all())
    assert got == _brute_pairs(texts, k)


def test_edit_distance_pairs_string_ids():
    t = pa.table(
        {"sid": pa.array(["x", "y", "z"]),
         "name": pa.array(["abcd", "abce", "qqqq"])}
    )
    res = edit_distance_pairs(
        rd.from_arrow(t), text_col="name", id_col="sid", max_dist=1
    )
    rows = [(r["id_a"], r["id_b"], r["dist"]) for r in res.take_all()]
    assert rows == [("x", "y", 1)]
