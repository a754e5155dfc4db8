"""Mixing ops (stages/mixing.py): global row numbers vs a sequential
sort, shuffle permutation properties + duckdb-SQL exactness, weighted
upsampling closed form."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd

from palimpzest_ray.stages import mixing


def _docs(n=300, seed=0):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "source": pa.array(
                rng.choice(["web", "wiki", "code"], size=n).tolist()
            ),
        }
    )


def test_global_row_number_matches_sort():
    t = _docs(500, seed=1)
    perm = np.random.default_rng(3).permutation(t.num_rows)
    ds = rd.from_arrow(t.take(pa.array(perm))).repartition(9)
    got = mixing.global_row_number(ds, ["doc_id"], num_buckets=7).take_all()
    assert sorted((r["doc_id"], r["pos"]) for r in got) == [
        (i, i) for i in range(500)
    ]


def test_global_row_number_multi_col_and_empty():
    t = pa.table(
        {
            "a": pa.array([2, 1, 1, 2], pa.int64()),
            "b": pa.array([0, 9, 3, 1], pa.int64()),
        }
    )
    got = mixing.global_row_number(rd.from_arrow(t), ["a", "b"]).take_all()
    by_pos = {r["pos"]: (r["a"], r["b"]) for r in got}
    assert [by_pos[i] for i in range(4)] == [(1, 3), (1, 9), (2, 0), (2, 1)]
    empty = rd.from_arrow(t.slice(0, 0))
    assert mixing.global_row_number(empty, ["a"]).take_all() == []


def test_deterministic_shuffle_is_permutation_and_layout_invariant():
    t = _docs(400, seed=2)
    a = mixing.deterministic_shuffle(rd.from_arrow(t), "doc_id", seed=7).take_all()
    perm = np.random.default_rng(5).permutation(t.num_rows)
    b = mixing.deterministic_shuffle(
        rd.from_arrow(t.take(pa.array(perm))).repartition(11), "doc_id", seed=7,
        num_buckets=5,
    ).take_all()
    pa_ = {r["doc_id"]: r["pos"] for r in a}
    pb = {r["doc_id"]: r["pos"] for r in b}
    assert pa_ == pb
    assert sorted(pa_.values()) == list(range(400))
    # a different seed gives a different permutation
    c = mixing.deterministic_shuffle(rd.from_arrow(t), "doc_id", seed=8).take_all()
    assert {r["doc_id"]: r["pos"] for r in c} != pa_


def test_deterministic_shuffle_duckdb_exact():
    t = _docs(250, seed=4)
    got = mixing.deterministic_shuffle(
        rd.from_arrow(t), "doc_id", seed=99, hash_fn="duckdb"
    ).take_all()
    con = duckdb.connect()
    con.register("t", t)
    exp = dict(
        con.execute(
            "select doc_id, row_number() over "
            "(order by hash(xor(doc_id, 99)), doc_id) - 1 from t"
        ).fetchall()
    )
    assert {r["doc_id"]: r["pos"] for r in got} == exp


def test_upsample_by_weight_closed_form():
    t = _docs(600, seed=6)
    w = {"web": 0.5, "wiki": 2.25, "code": 1.0}
    got = mixing.upsample_by_weight(
        rd.from_arrow(t), "source", w, key="doc_id", hash_fn="duckdb"
    ).take_all()
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(
        """
        select doc_id, source, unnest(generate_series(0, copies - 1)) as copy_idx
        from (
          select doc_id, source,
                 cast(floor(w) as bigint) + case when hash(doc_id) % 1000000
                   < round((w - floor(w)) * 1000000) then 1 else 0 end as copies
          from (select doc_id, source,
                  case source when 'web' then 0.5 when 'wiki' then 2.25
                       else 1.0 end as w from t) s
        ) c
        """
    ).fetchall()
    assert sorted((r["doc_id"], r["source"], r["copy_idx"]) for r in got) == sorted(exp)
    # every wiki doc appears at least twice; web docs at most once
    counts = {}
    for r in got:
        counts[r["doc_id"]] = counts.get(r["doc_id"], 0) + 1
    srcs = dict(zip(t["doc_id"].to_pylist(), t["source"].to_pylist()))
    for d, c in counts.items():
        if srcs[d] == "wiki":
            assert c in (2, 3)
        elif srcs[d] == "web":
            assert c == 1
        else:
            assert c == 1
    # copy indices are dense per row
    idx = {}
    for r in got:
        idx.setdefault(r["doc_id"], []).append(r["copy_idx"])
    assert all(sorted(v) == list(range(len(v))) for v in idx.values())


def test_upsample_weight_validation():
    import pytest

    with pytest.raises(ValueError, match="negative"):
        mixing.upsample_by_weight(
            rd.from_arrow(_docs(4)), "source", {"web": -1.0}, key="doc_id"
        )
