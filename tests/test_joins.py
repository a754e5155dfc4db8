"""Join semantics (FIXTURES.md §5b): inner/left/right/outer, the
``_right`` duplicate-column rename (reference ``schemas.py:163-166``),
unmatched-row emission (``join.py:118-169``), semi/anti joins, and
broadcast == shuffle equivalence."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import palimpzest_ray as pzr

CUSTOMERS = pd.DataFrame(
    {
        "cust_id": [1, 2, 3, 4, 5, 6],
        "name": ["c-a", "c-b", "c-c", "c-d", "c-e", "c-f"],
        "segment": ["x", "y", "x", "y", "x", "y"],
    }
)
# orders: two rows reference missing customer 99; duplicate `name` column
ORDERS = pd.DataFrame(
    {
        "order_id": list(range(10)),
        "cust_id": [1, 1, 2, 3, 3, 3, 4, 5, 99, 99],
        "total": [float(i) * 10 for i in range(10)],
        "name": [f"o-{i}" for i in range(10)],
    }
)


def _pd_oracle(how: str) -> pd.DataFrame:
    right = CUSTOMERS.rename(columns={"name": "name_right"})
    return ORDERS.merge(right, on="cust_id", how=how)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return (
        df[cols]
        .sort_values(cols, key=lambda s: s.astype(str))
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("how", ["inner", "left", "right", "outer"])
@pytest.mark.parametrize("strategy", ["shuffle", "broadcast"])
def test_join_matches_pandas(how, strategy):
    left = pzr.from_pandas(ORDERS)
    right = pzr.from_pandas(CUSTOMERS)
    got = left.join(right, on="cust_id", how=how, strategy=strategy).to_pandas()
    # duplicate non-key column renamed with _right
    assert "name_right" in got.columns
    want = _pd_oracle(how)
    g, w = _normalize(got), _normalize(want)
    assert len(g) == len(w), (how, strategy, len(g), len(w))
    for col in w.columns:
        gv = g[col].astype("float64") if w[col].dtype.kind == "f" else g[col]
        assert (
            gv.fillna("<na>").astype(str).tolist()
            == w[col].fillna("<na>").astype(str).tolist()
        ), (how, strategy, col)


def test_semi_anti_join():
    left = pzr.from_pandas(CUSTOMERS)
    right = pzr.from_pandas(ORDERS)
    semi = left.semi_join(right, on="cust_id").to_pandas()
    assert sorted(semi["cust_id"]) == [1, 2, 3, 4, 5]
    anti = left.anti_join(right, on="cust_id").to_pandas()
    assert sorted(anti["cust_id"]) == [6]


def test_multi_key_join():
    a = pzr.from_pandas(pd.DataFrame({"k1": [1, 1, 2], "k2": ["a", "b", "a"], "v": [10, 20, 30]}))
    b = pzr.from_pandas(pd.DataFrame({"k1": [1, 2, 2], "k2": ["a", "a", "z"], "w": [7, 8, 9]}))
    got = a.join(b, on=["k1", "k2"], how="inner").to_pandas().sort_values("v")
    assert got[["v", "w"]].values.tolist() == [[10, 7], [30, 8]]


def test_intersect_except():
    import pyarrow as pa

    import palimpzest_ray.dataset as pzd

    a = pzd.from_arrow(pa.table({"k": pa.array([1, 1, 2, 3], pa.int64())}))
    b = pzd.from_arrow(pa.table({"k": pa.array([2, 3, 3, 4], pa.int64())}))
    assert sorted(r["k"] for r in a.intersect(b).take_all()) == [2, 3]
    assert sorted(r["k"] for r in a.except_(b).take_all()) == [1]
    # multi-column set semantics
    c = pzd.from_arrow(pa.table({"k": pa.array([1, 1, 2]), "s": pa.array(["x", "x", "y"])}))
    d = pzd.from_arrow(pa.table({"k": pa.array([1]), "s": pa.array(["x"])}))
    assert c.intersect(d).take_all() == [{"k": 1, "s": "x"}]
    assert c.except_(d).take_all() == [{"k": 2, "s": "y"}]


def test_range_join_inner_left_and_overlap():
    import pyarrow as pa

    import palimpzest_ray.dataset as pzd

    rows = pzd.from_arrow(pa.table({"id": pa.array([1, 2, 3]), "v": pa.array([5.0, 15.0, 99.0])}))
    iv = pa.table(
        {
            "lo": pa.array([0.0, 10.0, 12.0]),
            "hi": pa.array([10.0, 20.0, 30.0]),
            "band": pa.array(["a", "b", "c"]),
        }
    )
    got = sorted(
        (r["id"], r["band"]) for r in rows.range_join(iv, "v", "lo", "hi").take_all()
    )
    assert got == [(1, "a"), (2, "b"), (2, "c")]  # overlap fans out
    left = sorted(
        (r["id"], r["band"])
        for r in rows.range_join(iv, "v", "lo", "hi", how="left").take_all()
    )
    assert left == [(1, "a"), (2, "b"), (2, "c"), (3, None)]


def test_semi_anti_shuffle_strategy_matches_broadcast():
    import pyarrow as pa

    import pyarrow as pa

    import palimpzest_ray.dataset as pzd

    left = pzd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 4, 5], pa.int64()), "v": pa.array(list("abcde"))})
    )
    right = pzd.from_arrow(pa.table({"k": pa.array([2, 2, 4, 9], pa.int64())}))
    for op in ("semi_join", "anti_join"):
        b = sorted(r["k"] for r in getattr(left, op)(right, on="k").take_all())
        s = sorted(r["k"] for r in getattr(left, op)(right, on="k", strategy="shuffle").take_all())
        assert b == s, (op, b, s)
    assert sorted(r["k"] for r in left.semi_join(right, on="k", strategy="shuffle").take_all()) == [2, 4]
    # shuffle path preserves left payload columns
    rows = left.anti_join(right, on="k", strategy="shuffle").take_all()
    assert sorted((r["k"], r["v"]) for r in rows) == [(1, "a"), (3, "c"), (5, "e")]
    # set ops ride the same strategies
    a = pzd.from_arrow(pa.table({"k": pa.array([1, 1, 2, 3], pa.int64())}))
    c = pzd.from_arrow(pa.table({"k": pa.array([2, 3, 4], pa.int64())}))
    assert sorted(r["k"] for r in a.intersect(c, strategy="shuffle").take_all()) == [2, 3]
    assert sorted(r["k"] for r in a.except_(c, strategy="shuffle").take_all()) == [1]


NULLKEY_LEFT = pd.DataFrame({"k": [1, 2, None, None, 4], "lv": list("abcde")})
NULLKEY_RIGHT = pd.DataFrame({"k": [2, None, 4, 5], "rv": list("XYZW")})


@pytest.mark.parametrize("how", ["inner", "left", "right", "outer"])
@pytest.mark.parametrize("strategy", ["shuffle", "broadcast"])
@pytest.mark.parametrize("nested", [False, True])
def test_join_null_keys_sql_semantics(how, strategy, nested):
    """SQL equi-join semantics: a null key matches NOTHING — not even
    another null. Inner drops null-key rows; left/right/outer emit them
    unmatched on their preserved side. Covers the acero kernel (flat)
    and the pandas fallback (nested list payload) on both strategies,
    against a duckdb oracle."""
    duckdb = pytest.importorskip("duckdb")
    lf, rf = NULLKEY_LEFT.copy(), NULLKEY_RIGHT.copy()
    if nested:
        lf["ltok"] = [[i] for i in range(len(lf))]
        rf["rtok"] = [[9 - i] for i in range(len(rf))]
    con = duckdb.connect()
    con.register("lf", lf)
    con.register("rf", rf)
    sqlhow = {
        "inner": "JOIN",
        "left": "LEFT JOIN",
        "right": "RIGHT JOIN",
        "outer": "FULL OUTER JOIN",
    }[how]
    extra = ", lf.ltok, rf.rtok" if nested else ""
    keycol = (
        "COALESCE(lf.k, rf.k)"
        if how == "outer"
        else ("rf.k" if how == "right" else "lf.k")
    )
    want = con.execute(
        f"SELECT {keycol} AS k, lf.lv, rf.rv{extra} "
        f"FROM lf {sqlhow} rf ON lf.k = rf.k"
    ).df()
    got = (
        pzr.from_pandas(lf)
        .join(pzr.from_pandas(rf), on="k", how=how, strategy=strategy)
        .to_pandas()
    )

    def _rows(df: pd.DataFrame) -> list[tuple]:
        def canon(v):
            if v is None or (np.isscalar(v) and pd.isna(v)):
                return "<na>"
            if isinstance(v, (list, np.ndarray)):
                return str([float(x) for x in v])
            return str(float(v)) if isinstance(v, (int, float, np.number)) else str(v)

        cols = sorted(df.columns)
        return sorted(tuple(canon(v) for v in row) for row in df[cols].itertuples(index=False))

    assert _rows(got) == _rows(want), (how, strategy, nested)


@pytest.mark.parametrize("how", ["inner", "right", "outer"])
@pytest.mark.parametrize("strategy", ["shuffle", "broadcast"])
def test_join_key_dtype_drift(how, strategy):
    """int32 vs int64 key columns (common parquet drift across files)
    must join correctly on both strategies — acero rejects mismatched
    key types unless unified first."""
    import pyarrow as pa

    lf = pa.table({"k": pa.array([1, 2, 3], pa.int32()), "lv": ["a", "b", "c"]})
    rf = pa.table({"k": pa.array([2, 3, 4], pa.int64()), "rv": ["X", "Y", "Z"]})
    got = (
        pzr.from_arrow(lf)
        .join(pzr.from_arrow(rf), on="k", how=how, strategy=strategy)
        .to_pandas()
    )
    want_rows = {
        "inner": {(2, "b", "X"), (3, "c", "Y")},
        "right": {(2, "b", "X"), (3, "c", "Y"), (4, None, "Z")},
        "outer": {(1, "a", None), (2, "b", "X"), (3, "c", "Y"), (4, None, "Z")},
    }[how]
    got_rows = {
        (int(r.k), None if pd.isna(r.lv) else r.lv, None if pd.isna(r.rv) else r.rv)
        for r in got.itertuples(index=False)
    }
    assert got_rows == want_rows, (how, strategy, got_rows)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_shuffle_join_equals_unsalted(how):
    """salt=N fans a hot key across N sub-buckets (left round-robin,
    right replicated) without changing the result."""
    import pyarrow as pa

    rng = np.random.default_rng(3)
    n = 5_000
    # 80% of left rows share one hot key
    keys = np.where(rng.random(n) < 0.8, 7, rng.integers(0, 50, n))
    lf = pa.table({"k": pa.array(keys, pa.int64()), "lv": pa.array(np.arange(n))})
    rf = pa.table(
        {"k": pa.array(np.arange(60), pa.int64()), "rv": pa.array(np.arange(60) * 10)}
    )
    base = (
        pzr.from_arrow(lf)
        .join(pzr.from_arrow(rf), on="k", how=how, strategy="shuffle")
        .to_pandas()
    )
    salted = (
        pzr.from_arrow(lf)
        .join(pzr.from_arrow(rf), on="k", how=how, strategy="shuffle", salt=8)
        .to_pandas()
    )
    key = ["k", "lv", "rv"]
    b = base[key].sort_values(key).reset_index(drop=True)
    s = salted[key].sort_values(key).reset_index(drop=True)
    assert len(b) == len(s) == (n if how == "left" else (keys < 60).sum())
    assert b.equals(s)


def test_salt_rejected_for_unprovable_hows():
    a = pzr.from_pandas(NULLKEY_LEFT)
    b = pzr.from_pandas(NULLKEY_RIGHT)
    for bad in (dict(how="right"), dict(how="outer"), dict(strategy="broadcast")):
        with pytest.raises(ValueError, match="salt"):
            a.join(b, on="k", salt=4, **{"how": "inner", **bad})


def test_shuffle_join_int_float_key_drift():
    """int64 vs float64 key drift must still match: xxhash hashes
    2 and 2.0 differently, so without unification every match would be
    silently dropped."""
    import pyarrow as pa

    lf = pa.table({"k": pa.array([1.0, 2.0, 3.0], pa.float64()), "lv": ["a", "b", "c"]})
    rf = pa.table({"k": pa.array([2, 3, 4], pa.int64()), "rv": ["X", "Y", "Z"]})
    for strat in ("shuffle", "broadcast"):
        got = (
            pzr.from_arrow(lf)
            .join(pzr.from_arrow(rf), on="k", how="inner", strategy=strat)
            .to_pandas()
        )
        assert sorted(zip(got["lv"], got["rv"])) == [("b", "X"), ("c", "Y")], strat


def test_set_ops_null_rows_both_strategies():
    """SQL INTERSECT/EXCEPT treat NULLs as EQUAL (set semantics, unlike
    ``=``): the shuffle path expands nullable columns into
    (filled, is_null) pairs so null==null survives its equi-join."""
    import pyarrow as pa

    import palimpzest_ray.dataset as pzd

    a = pa.table({"k": [1, None, 2, None], "s": ["x", "y", None, None]})
    b = pa.table({"k": [None, 2, 3, None], "s": ["y", None, "z", None]})
    want_intersect = {(2, None), (None, "y"), (None, None)}
    want_except = {(1, "x")}
    for strat in ("broadcast", "shuffle"):
        gi = {
            (r["k"], r["s"])
            for r in pzd.from_arrow(a).intersect(pzd.from_arrow(b), strategy=strat).take_all()
        }
        ge = {
            (r["k"], r["s"])
            for r in pzd.from_arrow(a).except_(pzd.from_arrow(b), strategy=strat).take_all()
        }
        assert gi == want_intersect, (strat, gi)
        assert ge == want_except, (strat, ge)


def test_semi_anti_empty_key_set():
    """semi-join vs an empty other keeps nothing; anti keeps all."""
    import pyarrow as pa

    import palimpzest_ray.dataset as pzd

    left = pzd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64()), "v": ["a", "b"]}))
    empty = pzd.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    assert left.semi_join(empty, on="k").take_all() == []
    assert sorted(r["k"] for r in left.anti_join(empty, on="k").take_all()) == [1, 2]


def test_multikey_semi_anti_null_semantics_and_vectorized_encoding():
    """Broadcast path: set-op semantics (a null KEY TUPLE matches an
    identical null tuple — what intersect/except build on). Shuffle
    path: ANSI equi-join semantics (null never matches). Also covers
    the length-prefix encoding against concatenation collisions."""
    import pyarrow as pa

    import palimpzest_ray.dataset as pzd

    left = pzd.from_arrow(
        pa.table(
            {
                "a": ["x", "x", None, "ab", "a"],
                "b": ["y", "q", None, "c", "bc"],
                "v": [1, 2, 3, 4, 5],
            }
        )
    )
    right = pzd.from_arrow(
        pa.table({"a": ["x", None, "ab"], "b": ["y", None, "c"]})
    )
    # broadcast: ("x","y") and ("ab","c") match; (None,None) matches
    # (None,None); ("a","bc") must NOT match "ab","c" (no concat
    # collision: V1:aV2:bc != V2:abV1:c)
    semi = sorted(r["v"] for r in left.semi_join(right, ["a", "b"]).ray.take_all())
    assert semi == [1, 3, 4]
    anti = sorted(r["v"] for r in left.anti_join(right, ["a", "b"]).ray.take_all())
    assert anti == [2, 5]

    # shuffle path: ANSI — the null tuple never matches
    semi_sh = sorted(
        r["v"]
        for r in left.semi_join(right, ["a", "b"], strategy="shuffle").ray.take_all()
    )
    assert semi_sh == [1, 4]
    anti_sh = sorted(
        r["v"]
        for r in left.anti_join(right, ["a", "b"], strategy="shuffle").ray.take_all()
    )
    assert anti_sh == [2, 3, 5]


def test_multikey_semi_join_mixed_types():
    import pyarrow as pa

    import palimpzest_ray.dataset as pzd

    left = pzd.from_arrow(
        pa.table({"k1": [1, 2, None, 4], "k2": [1.5, 2.5, 3.5, None], "v": [1, 2, 3, 4]})
    )
    right = pzd.from_arrow(pa.table({"k1": [2, None], "k2": [2.5, 3.5]}))
    semi = sorted(r["v"] for r in left.semi_join(right, ["k1", "k2"]).ray.take_all())
    assert semi == [2, 3]  # (None, 3.5) matches (None, 3.5): set-op semantics


def test_auto_bucket_sizing_from_plan_metadata():
    """num_buckets=None derives the shuffle width from plan-metadata
    size estimates without triggering execution; unknown sizes fall
    back to the floor."""
    import ray.data as rd

    import palimpzest_ray.dataset as pzd
    from palimpzest_ray.dataset import _auto_buckets, _estimate_bytes

    li = rd.read_parquet("/root/testdata/sf0.001/lineitem.parquet")
    est = _estimate_bytes(li)
    assert est is not None and est > 0
    # projections/maps lose node metadata but the walk reaches the read
    pruned = li.select_columns(["l_orderkey"]).map_batches(
        lambda b: b, batch_format="pyarrow"
    )
    assert _estimate_bytes(pruned) == est
    # tiny inputs floor at 32; the cap and target drive big inputs
    assert _auto_buckets(li, li) == 32
    tiny = rd.from_items([{"k": 1}])
    assert _estimate_bytes(tiny) == 8  # in-memory sources report too
    assert _auto_buckets(tiny, tiny) == 32
    # joins with the default still produce correct results
    a = pzd.Dataset(li.select_columns(["l_orderkey", "l_quantity"]))
    b = pzd.Dataset(
        rd.read_parquet(
            "/root/testdata/sf0.001/orders.parquet", columns=["o_orderkey"]
        )
    ).rename_columns({"o_orderkey": "l_orderkey"})
    n = a.join(b, on="l_orderkey", how="inner", strategy="shuffle").ray.count()
    assert n == li.count()


def test_auto_join_strategy_selection(ray_session):
    """strategy="auto" (round-3): broadcast for a footer-estimated
    dimension read (nation/region-sized), shuffle for a fact-sized read
    (orders) and for ANY derived pipeline (unknown estimate)."""
    import palimpzest_ray.dataset as pzd

    sf = "/root/testdata/sf0.01"
    nation = pzd.read_parquet(f"{sf}/nation.parquet")
    orders = pzd.read_parquet(f"{sf}/orders.parquet")
    assert nation._est_bytes is not None
    assert nation._est_bytes <= pzd.BROADCAST_EST_BYTES
    # orders at sf0.01 is small too — the pruned-read estimate is what
    # scales; simulate the fact side crossing the bound
    big = pzd.read_parquet(f"{sf}/orders.parquet")
    big._est_bytes = pzd.BROADCAST_EST_BYTES + 1

    # estimates survive the prep chain (rename/project/filter/limit)
    prep = nation.rename_columns({"n_regionkey": "r_regionkey"}).project(
        ["n_nationkey", "n_name", "r_regionkey"]
    )
    assert prep._est_bytes == nation._est_bytes
    # a derived (map_batches) pipeline loses the bound -> conservative
    derived = nation.map_batches(lambda b: b)
    assert derived._est_bytes is None

    calls = {}
    import palimpzest_ray.dataset as m

    orig_b, orig_s = m._broadcast_join, m._shuffle_join

    def spy_b(*a, **k):
        calls["strategy"] = "broadcast"
        return orig_b(*a, **k)

    def spy_s(*a, **k):
        calls["strategy"] = "shuffle"
        return orig_s(*a, **k)

    m._broadcast_join, m._shuffle_join = spy_b, spy_s
    try:
        orders.rename_columns({"o_custkey": "n_nationkey"}).join(
            nation, on="n_nationkey"
        )
        assert calls["strategy"] == "broadcast"
        nation.join(
            big.rename_columns({"o_custkey": "n_nationkey"}), on="n_nationkey"
        )
        assert calls["strategy"] == "shuffle"
        nation.join(
            derived.rename_columns({"n_name": "nm"}), on="n_nationkey"
        )
        assert calls["strategy"] == "shuffle"

        # a JOINED dimension chain keeps a product-bounded estimate —
        # nation⋈region is provably ≤ |N|·|R|+|N|+|R| rows, so the next
        # auto hop still broadcasts it (the q05 star-join shape)
        region = pzd.read_parquet(f"{sf}/region.parquet")
        nr = nation.rename_columns({"n_regionkey": "r_regionkey"}).join(
            region, on="r_regionkey"
        )
        assert nr._est_rows is not None and nr._est_rows <= 25 * 5 + 30
        assert nr._est_bytes is not None
        big.rename_columns({"o_custkey": "n_nationkey"}).join(
            nr, on="n_nationkey"
        )
        assert calls["strategy"] == "broadcast"
        # ...but a fact-sized product bound stays a shuffle: the bound
        # for big⋈nr is huge, so joining AGAINST that result shuffles
        fact_chain = big.rename_columns({"o_custkey": "n_nationkey"}).join(
            nr, on="n_nationkey"
        )
        assert fact_chain._est_bytes > pzd.BROADCAST_EST_BYTES
        nation.join(
            fact_chain.rename_columns({"n_name": "nm2"}), on="n_nationkey"
        )
        assert calls["strategy"] == "shuffle"
    finally:
        m._broadcast_join, m._shuffle_join = orig_b, orig_s


def test_interval_join_keyed(ray_session):
    """Keyed interval join: every containing interval matches (unlike
    asof's latest-only), bounds inclusive, nulls never match, how=left
    pads unmatched."""
    import pyarrow as pa

    import palimpzest_ray.dataset as pzd

    left = pzd.from_arrow(
        pa.table(
            {
                "k": ["a", "a", "a", "b", "b"],
                "v": pa.array([5, 15, None, 5, 50], pa.int64()),
                "lid": [0, 1, 2, 3, 4],
            }
        )
    )
    right = pzd.from_arrow(
        pa.table(
            {
                "k": ["a", "a", "b"],
                "lo": pa.array([0, 4, 100], pa.int64()),
                "hi": pa.array([10, 20, 200], pa.int64()),
                "rid": [10, 11, 12],
            }
        )
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in left.interval_join(
            right, on="v", between=("lo", "hi"), by="k"
        ).take_all()
    )
    # v=5 in [0,10] and [4,20]; v=15 in [4,20]; null v never; b has no
    # containing interval
    assert got == [(0, 10), (0, 11), (1, 11)]

    got_left = sorted(
        (r["lid"], r["rid"])
        for r in left.interval_join(
            right, on="v", between=("lo", "hi"), by="k", how="left"
        ).take_all()
    )
    assert got_left == [
        (0, 10), (0, 11), (1, 11), (2, None), (3, None), (4, None)
    ]


@pytest.mark.parametrize("how", ["inner", "left", "right", "outer"])
@pytest.mark.parametrize("strategy", ["shuffle", "broadcast"])
def test_nested_payload_join_zero_copy(how, strategy, ray_session):
    """VERDICT r3 #3: token-array (list<int32>) payloads ride BOTH join
    strategies without a pandas round trip — narrow-key acero join +
    take re-attach. Byte-level token equality and exact list dtype vs a
    DuckDB oracle, null keys included (SQL: null matches nothing)."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from palimpzest_ray.dataset import Dataset

    if strategy == "broadcast" and how in ("right", "outer"):
        # broadcast runs matched part + distributed unmatched pass
        pass
    left = pa.table({
        "doc_id": pa.array(["a", "b", "b", None, "d"]),
        "tokens": pa.array(
            [[1, 2], [3], [4, 5, 6], [7], None],
            pa.list_(pa.int32()),
        ),
        "n_tok": pa.array([2, 1, 3, 1, 0], pa.int32()),
    })
    right = pa.table({
        "doc_id": pa.array(["a", "b", None, "e"]),
        "meta": pa.array([[10.5], [20.5], [30.5], None],
                         pa.list_(pa.float64())),
        "flag": pa.array([True, False, True, None]),
    })
    got = (
        Dataset(rd.from_arrow(left).repartition(3))
        .join(Dataset(rd.from_arrow(right).repartition(2)),
              on="doc_id", how=how, strategy=strategy, num_buckets=4)
        .to_arrow()
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    jt = {"inner": "join", "left": "left join",
          "right": "right join", "outer": "full join"}[how]
    want = con.execute(
        f"select coalesce(l.doc_id, r.doc_id) as doc_id, l.tokens, "
        f"l.n_tok, r.meta, r.flag from l {jt} r using (doc_id)"
    ).arrow()
    def canon(t):
        t = t.select(sorted(t.column_names))
        keys = [(c, "ascending") for c in
                ("doc_id", "n_tok", "flag")]
        import pyarrow.compute as pc
        return t.take(pc.sort_indices(t, sort_keys=keys))
    got_c, want_c = canon(got), canon(want.cast(got.schema))
    assert got_c.equals(want_c), f"{how}/{strategy}:\n{got_c.to_pydict()}\nvs\n{want_c.to_pydict()}"
    # dtype witness: the list payload kept its exact arrow type
    assert got.schema.field("tokens").type == pa.list_(pa.int32())
