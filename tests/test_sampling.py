"""Deterministic hash sampling: reproducible, key-stable, proportional."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from palimpzest_ray.stages import sampling as S


def _docs(n=20_000):
    return pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(n)]),
            "source": pa.array(["web", "code", "wiki", "books"][i % 4] for i in range(n)),
        }
    )


def test_deterministic_sample_reproducible_and_proportional():
    t = _docs()
    a = S.deterministic_sample(rd.from_arrow(t), "doc_id", 0.3, seed=7).take_all()
    b = S.deterministic_sample(rd.from_arrow(t).repartition(8), "doc_id", 0.3, seed=7).take_all()
    ka, kb = sorted(r["doc_id"] for r in a), sorted(r["doc_id"] for r in b)
    assert ka == kb  # block layout cannot change membership
    assert abs(len(ka) / t.num_rows - 0.3) < 0.02
    c = S.deterministic_sample(rd.from_arrow(t), "doc_id", 0.3, seed=8).take_all()
    assert sorted(r["doc_id"] for r in c) != ka  # seed changes the draw


def test_stratified_sample_rates():
    t = _docs()
    out = S.stratified_sample(
        rd.from_arrow(t), "source", {"web": 0.1, "code": 1.0}, key="doc_id"
    ).take_all()
    by = {}
    for r in out:
        by.setdefault(r["source"], []).append(r)
    assert abs(len(by.get("web", [])) / 5000 - 0.1) < 0.03
    assert len(by["code"]) == 5000  # keep-all stratum
    assert "wiki" not in by and "books" not in by  # default 0.0


def test_hash_split_partitions_keys_exactly():
    t = _docs(5_000)
    train, val = S.hash_split(rd.from_arrow(t), "doc_id", 0.2, seed=3)
    ktrain = {r["doc_id"] for r in train.take_all()}
    kval = {r["doc_id"] for r in val.take_all()}
    assert ktrain.isdisjoint(kval)
    assert len(ktrain) + len(kval) == 5_000
    assert abs(len(kval) / 5_000 - 0.2) < 0.03
    # duplicated keys never straddle the split
    dup = pa.concat_tables([t, t])
    tr2, va2 = S.hash_split(rd.from_arrow(dup), "doc_id", 0.2, seed=3)
    assert {r["doc_id"] for r in tr2.take_all()} == ktrain
    assert {r["doc_id"] for r in va2.take_all()} == kval


def test_duckdb_mode_membership_matches_sql():
    """hash_fn="duckdb" sampling == the literal SQL WHERE clause the
    d12 oracle states (hash(key) % 1e6 < round(rate*1e6))."""
    import duckdb
    import ray.data as rd

    from palimpzest_ray.stages.sampling import (
        deterministic_sample,
        hash_split,
        stratified_sample,
    )

    keys = np.arange(1, 5001, dtype=np.int64)
    strata = np.where(keys % 3 == 0, "a", np.where(keys % 3 == 1, "b", "c"))
    t = pa.table({"k": keys, "s": strata})
    ds = rd.from_arrow(t)
    con = duckdb.connect()
    con.register("t", t)

    got = sorted(
        r["k"]
        for r in deterministic_sample(ds, "k", 0.3, hash_fn="duckdb").take_all()
    )
    exp = [r[0] for r in con.sql(
        "select k from t where hash(k) % 1000000 < 300000 order by k"
    ).fetchall()]
    assert got == exp and 0 < len(got) < 5000

    got = sorted(
        r["k"]
        for r in stratified_sample(
            ds, "s", {"a": 0.1, "b": 1.0}, key="k", default=0.5, hash_fn="duckdb"
        ).take_all()
    )
    exp = [r[0] for r in con.sql(
        """select k from t where hash(k) % 1000000 <
           case s when 'a' then 100000 when 'b' then 1000000 else 500000 end
           order by k"""
    ).fetchall()]
    assert got == exp

    tr, va = hash_split(ds, "k", 0.2, hash_fn="duckdb")
    tr_k = {r["k"] for r in tr.take_all()}
    va_k = {r["k"] for r in va.take_all()}
    assert tr_k | va_k == set(keys.tolist()) and not (tr_k & va_k)
    exp_va = {r[0] for r in con.sql(
        "select k from t where hash(k) % 1000000 < 200000"
    ).fetchall()}
    assert va_k == exp_va
