"""Scalar function library (strings/datetime) and OLAP extensions
(rollup / cube / grouping sets, exact group quantiles, cross join) —
duckdb is the oracle throughout.

The reference has no scalar-function layer (SURVEY.md §2.3 "Scalar
functions": all row-level computation there is a UDF or an LLM call);
these are the vectorized pyarrow.compute replacements.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import palimpzest_ray.dataset as pzd
from palimpzest_ray.functions import datetime as D
from palimpzest_ray.functions import strings as S


def canon(d: pd.DataFrame) -> pd.DataFrame:
    d = d[sorted(d.columns)]
    return d.sort_values(by=list(d.columns), ignore_index=True, na_position="last")


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


STRS = pa.array(["Hello-World", "a-b-c", None, "", "  pad  ", "1-URGENT x9"])


def test_string_kernels_match_duckdb(con):
    df = pd.DataFrame({"s": STRS.to_pylist()})
    cases = [
        (S.upper(STRS), "upper(s)"),
        (S.lower(STRS), "lower(s)"),
        (S.length(STRS), "length(s)"),
        (S.reverse(STRS), "reverse(s)"),
        (S.trim(STRS), "trim(s)"),
        (S.substr(STRS, 2, 3), "substr(s, 2, 3)"),
        (S.substr(STRS, -3), "substr(s, -3)"),
        (S.replace(STRS, "-", "_"), "replace(s, '-', '_')"),
        # NB: duckdb's split_part returns '' even for NULL input (its one
        # non-null-propagating string fn); ours propagates null like every
        # other kernel — the CASE makes the oracle null-propagating too.
        (
            S.split_part(STRS, "-", 2),
            "case when s is null then null else split_part(s, '-', 2) end",
        ),
        (
            S.split_part(STRS, "-", 5),
            "case when s is null then null else split_part(s, '-', 5) end",
        ),
        (S.regexp_extract(STRS, r"(\d+)"), "regexp_extract(s, '(\\d+)', 1)"),
        (S.contains(STRS, "-"), "contains(s, '-')"),
        (S.starts_with(STRS, "a"), "starts_with(s, 'a')"),
        (S.lpad(STRS, 12, "*"), "lpad(s, 12, '*')"),
    ]
    for got, sql in cases:
        want = [r[0] for r in con.execute(f"select {sql} from df").fetchall()]
        assert got.to_pylist() == want, sql


def test_concat_ws_skips_nulls_like_duckdb(con):
    a = pa.array(["a", None, None])
    b = pa.array([None, None, None])
    c = pa.array(["b", "c", None])
    got = S.concat_ws("|", a, b, c).to_pylist()
    assert got == ["a|b", "c", ""]
    # concat (||-style): null propagates
    assert S.concat(a, c).to_pylist() == ["ab", None, None]


TS = pa.array(
    pd.to_datetime(
        ["2024-03-15 13:45:59", "2023-12-31 23:59:59", None, "2024-01-01 00:00:00"]
    )
)


def test_datetime_kernels_match_duckdb(con):
    df = pd.DataFrame({"t": pd.Series(TS.to_pandas())})
    cases = [
        (D.year(TS), "year(t)"),
        (D.month(TS), "month(t)"),
        (D.day(TS), "day(t)"),
        (D.hour(TS), "hour(t)"),
        (D.day_of_week(TS), "dayofweek(t)"),
        (D.iso_day_of_week(TS), "isodow(t)"),
        (D.day_of_year(TS), "dayofyear(t)"),
        (D.quarter(TS), "quarter(t)"),
        (D.epoch_seconds(TS), "epoch(t)::BIGINT"),
        (D.date_trunc(TS, "month"), "date_trunc('month', t)::TIMESTAMP"),
        (D.date_trunc(TS, "week"), "date_trunc('week', t)::TIMESTAMP"),
        (D.date_trunc(TS, "hour"), "date_trunc('hour', t)::TIMESTAMP"),
        (D.to_date(TS), "t::DATE"),
        (D.date_diff_days(TS, TS), "datediff('day', t, t)"),
    ]
    for got, sql in cases:
        want = [r[0] for r in con.execute(f"select {sql} from df").fetchall()]
        got_py = got.to_pylist()
        if "TIMESTAMP" in sql:
            got_py = [
                None if pd.isna(v) else v.to_pydatetime() for v in pd.Series(got_py)
            ]
        assert got_py == want, sql


def test_try_strptime_nulls_bad_rows():
    out = D.try_strptime(pa.array(["2024-01-02", "nope", None]))
    assert out.to_pylist()[1] is None and out.to_pylist()[2] is None
    assert out.to_pylist()[0] == pd.Timestamp("2024-01-02")


def test_date_add_days_roundtrip():
    shifted = D.date_add_days(TS, 40)
    assert D.date_diff_days(TS, shifted).to_pylist() == [40, 40, None, 40]


# --------------------------------------------------------------------------
# OLAP: rollup / cube / grouping sets, quantiles, cross join
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def olap_df():
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y", "z"], 300),
            "b": rng.choice(["p", "q"], 300),
            "v": rng.integers(0, 100, 300).astype(float),
        }
    )
    df.loc[5, "v"] = np.nan
    return df


def test_rollup_matches_duckdb(con, olap_df):
    df = olap_df
    got = (
        pzd.from_pandas(df)
        .rollup(["a", "b"], [("count", "v"), ("sum", "v"), ("min", "v"), ("max", "v")])
        .to_pandas()
    )
    want = con.execute(
        'select a, b, count(v) as "count(v)", sum(v) as "sum(v)", '
        'min(v) as "min(v)", max(v) as "max(v)" from df group by rollup(a, b)'
    ).df()
    pd.testing.assert_frame_equal(canon(got), canon(want), check_dtype=False)


def test_cube_with_average_matches_duckdb(con, olap_df):
    df = olap_df
    got = pzd.from_pandas(df).cube(["a", "b"], [("count", "v"), ("average", "v")]).to_pandas()
    want = con.execute(
        'select a, b, count(v) as "count(v)", avg(v) as "average(v)" '
        "from df group by cube(a, b)"
    ).df()
    pd.testing.assert_frame_equal(canon(got), canon(want), check_dtype=False)


def test_grouping_sets_subset_validation(olap_df):
    with pytest.raises(ValueError, match="not a subset"):
        pzd.from_pandas(olap_df).grouping_sets(["a"], [["b"]], [("count", "v")])


def test_group_quantile_and_median_match_duckdb(con, olap_df):
    df = olap_df
    ds = pzd.from_pandas(df)
    got = ds.groupby(["a"]).quantile("v", {"q25": 0.25, "med": 0.5, "q75": 0.75}).to_pandas()
    want = con.execute(
        "select a, quantile_cont(v, 0.25) as q25, median(v) as med, "
        "quantile_cont(v, 0.75) as q75 from df group by a"
    ).df()
    pd.testing.assert_frame_equal(canon(got), canon(want), check_dtype=False)

    got2 = ds.groupby(["a"]).agg([("median", "v"), ("count", "v")]).to_pandas()
    want2 = con.execute(
        'select a, median(v) as "median(v)", count(v) as "count(v)" from df group by a'
    ).df()
    pd.testing.assert_frame_equal(canon(got2), canon(want2), check_dtype=False)


def test_all_null_group_quantile_is_null():
    df = pd.DataFrame({"a": ["x", "x", "y"], "v": [np.nan, np.nan, 1.0]})
    got = pzd.from_pandas(df).groupby(["a"]).quantile("v", {"med": 0.5}).to_pandas()
    got = got.set_index("a")["med"]
    assert np.isnan(got["x"]) and got["y"] == 1.0


def test_cross_join_product_and_suffix():
    left = pzd.from_pandas(pd.DataFrame({"k": [1, 2, 3], "a": ["l1", "l2", "l3"]}))
    right = pzd.from_pandas(pd.DataFrame({"r": ["u", "w"], "a": ["r1", "r2"]}))
    out = left.cross_join(right).to_pandas()
    assert len(out) == 6
    assert sorted(out.columns) == ["a", "a_right", "k", "r"]
    assert set(zip(out["k"], out["r"])) == {(i, j) for i in (1, 2, 3) for j in ("u", "w")}


# --------------------------------------------------------------------------
# Window frames, ranking, dispersion aggregates, count-distinct, string_agg
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def win_df():
    rng = np.random.default_rng(11)
    n = 400
    return pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c", "d"], n),
            "o": rng.permutation(n),  # unique order key
            "v": rng.integers(0, 50, n).astype(float),
        }
    )


@pytest.mark.parametrize("kind,sqlagg", [
    ("sum", "sum(v)"), ("avg", "avg(v)"), ("min", "min(v)"),
    ("max", "max(v)"), ("count", "count(v)"),
])
def test_window_rolling_matches_duckdb(con, win_df, kind, sqlagg):
    df = win_df
    got = (
        pzd.from_pandas(df)
        .window_rolling("v", kind, window=3, by="g", order="o", out="w")
        .to_pandas()
    )
    want = con.execute(
        f"select g, o, v, {sqlagg} over (partition by g order by o "
        "rows between 2 preceding and current row) as w from df"
    ).df()
    pd.testing.assert_frame_equal(canon(got), canon(want), check_dtype=False)


def test_window_rolling_window_one_and_short_group(con):
    df = pd.DataFrame({"g": ["a", "a", "b"], "o": [1, 2, 1], "v": [5.0, 7.0, 9.0]})
    got = (
        pzd.from_pandas(df)
        .window_rolling("v", "max", window=5, by="g", order="o", out="w")
        .to_pandas()
    )
    want = con.execute(
        "select g, o, v, max(v) over (partition by g order by o "
        "rows between 4 preceding and current row) as w from df"
    ).df()
    pd.testing.assert_frame_equal(canon(got), canon(want), check_dtype=False)
    one = (
        pzd.from_pandas(df)
        .window_rolling("v", "sum", window=1, by="g", order="o", out="w")
        .to_pandas()
    )
    assert list(one.sort_values(["g", "o"])["w"]) == [5.0, 7.0, 9.0]


def test_window_cum_rank_kinds_match_duckdb(con):
    # ties in the order column exercise rank vs dense_rank vs row_number
    df = pd.DataFrame(
        {
            "g": ["a"] * 6 + ["b"] * 3,
            "o": [10, 10, 20, 20, 20, 30, 5, 5, 5],
            "u": range(9),  # unique tiebreak for row_number determinism
        }
    )
    ds = pzd.from_pandas(df)
    got = (
        ds.window_cum("o", "rank", by="g", order="o", out="rnk")
        .window_cum("o", "dense_rank", by="g", order="o", out="drnk")
        .to_pandas()
    )
    want = con.execute(
        "select g, o, u, rank() over (partition by g order by o) as rnk, "
        "dense_rank() over (partition by g order by o) as drnk from df"
    ).df()
    pd.testing.assert_frame_equal(canon(got), canon(want), check_dtype=False)


def test_window_cum_avg_count_match_duckdb(con, win_df):
    df = win_df
    got = (
        pzd.from_pandas(df)
        .window_cum("v", "avg", by="g", order="o", out="ravg")
        .window_cum("v", "count", by="g", order="o", out="rcnt")
        .to_pandas()
    )
    want = con.execute(
        "select g, o, v, avg(v) over (partition by g order by o "
        "rows unbounded preceding) as ravg, "
        "count(v) over (partition by g order by o rows unbounded preceding) as rcnt "
        "from df"
    ).df()
    pd.testing.assert_frame_equal(canon(got), canon(want), check_dtype=False)


def test_stddev_var_algebraic_matches_duckdb(con, olap_df):
    df = olap_df
    got = (
        pzd.from_pandas(df)
        .groupby(["a"])
        .agg([("stddev", "v"), ("var", "v"), ("count", "v")])
        .to_pandas()
    )
    want = con.execute(
        'select a, stddev_samp(v) as "stddev(v)", var_samp(v) as "var(v)", '
        'count(v) as "count(v)" from df group by a'
    ).df()
    pd.testing.assert_frame_equal(
        canon(got), canon(want), check_dtype=False, atol=1e-9, check_exact=False
    )


def test_stddev_holistic_path_with_median(con, olap_df):
    df = olap_df
    got = (
        pzd.from_pandas(df)
        .groupby(["a"])
        .agg([("stddev", "v"), ("median", "v")])
        .to_pandas()
    )
    want = con.execute(
        'select a, stddev_samp(v) as "stddev(v)", median(v) as "median(v)" '
        "from df group by a"
    ).df()
    pd.testing.assert_frame_equal(
        canon(got), canon(want), check_dtype=False, atol=1e-9, check_exact=False
    )


def test_nunique_scale_path_and_holistic_agree(con, olap_df):
    df = olap_df.copy()
    df.loc[10:20, "b"] = None  # count(distinct) ignores nulls
    ds = pzd.from_pandas(df)
    got = ds.groupby(["a"]).nunique("b", out="n").to_pandas()
    want = con.execute("select a, count(distinct b) as n from df group by a").df()
    pd.testing.assert_frame_equal(canon(got), canon(want), check_dtype=False)
    hol = (
        ds.groupby(["a"]).agg([("count_distinct", "b")]).to_pandas()
        .rename(columns={"count_distinct(b)": "n"})
    )
    pd.testing.assert_frame_equal(canon(hol), canon(want), check_dtype=False)


def test_string_agg_matches_duckdb(con):
    df = pd.DataFrame({"g": ["x", "x", "y", "x"], "s": ["b", "a", "c", None]})
    got = pzd.from_pandas(df).groupby(["g"]).agg([("string_agg", "s")]).to_pandas()
    want = con.execute(
        "select g, string_agg(s, ',' order by s) as \"string_agg(s)\" "
        "from df group by g"
    ).df()
    pd.testing.assert_frame_equal(canon(got), canon(want), check_dtype=False)


def test_nunique_keeps_all_null_groups(con):
    # a group whose field is entirely null must yield a 0-count row,
    # not vanish (SQL COUNT(DISTINCT) semantics; also what the holistic
    # path returns)
    df = pd.DataFrame({"g": ["x", "x", "y"], "b": [None, None, "s"]})
    ds = pzd.from_pandas(df)
    got = ds.groupby(["g"]).nunique("b", out="n").to_pandas()
    want = con.execute("select g, count(distinct b) as n from df group by g").df()
    pd.testing.assert_frame_equal(canon(got), canon(want), check_dtype=False)


def test_rank_ties_null_order_keys(con):
    # numeric order column with nulls: SQL ranks nulls as ONE tie group
    df = pd.DataFrame(
        {"g": ["a"] * 4 + ["b"] * 3, "o": [1.0, None, None, 2.0, None, None, 1.0],
         "u": range(7)}
    )
    got = (
        pzd.from_pandas(df)
        .window_cum("o", "rank", by="g", order="o", out="rnk")
        .window_cum("o", "dense_rank", by="g", order="o", out="drnk")
        .to_pandas()
    )
    want = con.execute(
        "select g, o, u, rank() over (partition by g order by o) as rnk, "
        "dense_rank() over (partition by g order by o) as drnk from df"
    ).df()
    pd.testing.assert_frame_equal(canon(got), canon(want), check_dtype=False)


def test_stddev_size_one_group_is_null_both_paths(con):
    df = pd.DataFrame({"g": ["x", "y", "y"], "v": [3.0, 1.0, 2.0]})
    ds = pzd.from_pandas(df)
    alg = ds.groupby(["g"]).agg([("stddev", "v"), ("var", "v")]).to_pandas()
    hol = ds.groupby(["g"]).agg([("stddev", "v"), ("median", "v")]).to_pandas()
    x_alg = alg.set_index("g").loc["x"]
    x_hol = hol.set_index("g").loc["x"]
    # SQL stddev_samp of one row is NULL — never NaN, on either path
    assert pd.isna(x_alg["stddev(v)"]) and pd.isna(x_alg["var(v)"])
    assert pd.isna(x_hol["stddev(v)"])
    want = con.execute(
        'select g, stddev_samp(v) as "stddev(v)" from df group by g'
    ).df()
    assert pd.isna(want.set_index("g").loc["x", "stddev(v)"])


def test_string_agg_numeric_orders_numerically(con):
    df = pd.DataFrame({"g": ["x"] * 3, "v": [1, 10, 2]})
    got = pzd.from_pandas(df).groupby(["g"]).agg([("string_agg", "v")]).to_pandas()
    assert got["string_agg(v)"][0] == "1,2,10"
    want = con.execute(
        "select g, string_agg(v, ',' order by v) as s from df group by g"
    ).df()
    assert got["string_agg(v)"][0] == want["s"][0]


def test_window_distribution_kinds_match_duckdb(con):
    # ties included: percent_rank/cume_dist must share values across ties
    df = pd.DataFrame(
        {
            "g": ["a"] * 6 + ["b"] * 3 + ["c"],
            "o": [10, 10, 20, 20, 20, 30, 5, 6, 7, 1],
            "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0],
            "u": range(10),
        }
    )
    ds = pzd.from_pandas(df)
    got = (
        ds.window_cum("v", "percent_rank", by="g", order="o", out="pr")
        .window_cum("v", "cume_dist", by="g", order="o", out="cd")
        .window_cum("v", "ntile", by="g", order=["o", "u"], out="nt", n=4)
        .window_cum("v", "first_value", by="g", order=["o", "u"], out="fv")
        .window_cum("v", "last_value", by="g", order=["o", "u"], out="lv")
        .to_pandas()
    )
    want = con.execute(
        "select g, o, v, u,"
        " percent_rank() over (partition by g order by o) as pr,"
        " cume_dist() over (partition by g order by o) as cd,"
        " ntile(4) over (partition by g order by o, u) as nt,"
        " first_value(v) over (partition by g order by o, u) as fv,"
        " last_value(v) over (partition by g order by o, u"
        "   rows between unbounded preceding and unbounded following) as lv"
        " from df"
    ).df()
    pd.testing.assert_frame_equal(canon(got), canon(want), check_dtype=False)


def test_window_multispec_equals_chained():
    # one-shuffle window([...]) == N chained window_cum calls, including
    # a per-spec order override
    df = pd.DataFrame(
        {"g": ["a", "a", "a", "b", "b"], "o": [3, 1, 2, 2, 1],
         "o2": [1, 2, 3, 1, 2], "v": [10.0, 20.0, 30.0, 40.0, 50.0]}
    )
    ds = pzd.from_pandas(df)
    multi = ds.window(
        [("sum", "v", "rs"), ("rank", None, "rnk"), ("first_value", "v", "fv", None, "o2")],
        by="g", order="o",
    ).to_pandas()
    chained = (
        ds.window_cum("v", "sum", by="g", order="o", out="rs")
        .window_cum("v", "rank", by="g", order="o", out="rnk")
        .window_cum("v", "first_value", by="g", order="o2", out="fv")
        .to_pandas()
    )
    pd.testing.assert_frame_equal(canon(multi), canon(chained), check_dtype=False)


def test_like_ilike_regexp_matches(con):
    vals = ["Hello", "hello world", None, "h_llo", "xyz"]
    df = pd.DataFrame({"s": vals})
    a = pa.array(vals)
    assert (
        S.like(a, "h%o").to_pylist()
        == [r[0] for r in con.execute("select s like 'h%o' from df").fetchall()]
    )
    assert (
        S.ilike(a, "h%o").to_pylist()
        == [r[0] for r in con.execute("select s ilike 'h%o' from df").fetchall()]
    )
    assert (
        S.regexp_matches(a, "h.l").to_pylist()
        == [r[0] for r in con.execute("select regexp_matches(s, 'h.l') from df").fetchall()]
    )


def test_mode_agg_and_tie_break(con):
    df = pd.DataFrame(
        {"g": ["x"] * 5 + ["y"] * 2, "v": ["b", "b", "a", "a", "c", "z", None]}
    )
    got = pzd.from_pandas(df).groupby(["g"]).agg([("mode", "v")]).to_pandas()
    got = got.set_index("g")["mode(v)"]
    assert got["x"] == "a"  # b/a tie at 2 -> smallest value wins
    assert got["y"] == "z"  # nulls ignored
    # unique-mode case matches duckdb's mode() exactly
    df2 = pd.DataFrame({"g": ["x"] * 4, "v": [1, 1, 1, 2]})
    got2 = pzd.from_pandas(df2).groupby(["g"]).agg([("mode", "v")]).to_pandas()
    want2 = con.execute('select g, mode(v) as "mode(v)" from df2 group by g').df()
    pd.testing.assert_frame_equal(canon(got2), canon(want2), check_dtype=False)


def test_explain_shows_plan():
    ds = pzd.from_pandas(pd.DataFrame({"a": [1, 2]})).filter(expr="a > 1")
    plan = ds.explain()
    assert "Filter" in plan or "filter" in plan


def test_rollup_multiblock_with_null_data_keys(con):
    """The single-shuffle re-aggregation must survive multi-block
    layouts (Ray's sort shuffle can't order mixed null/value keys —
    hence the composite-key encoding) and keep data-null key groups
    distinct from rollup-null rows per level."""
    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y", None], size=500).tolist(),
            "b": rng.choice(["p", "q"], size=500).tolist(),
            "v": rng.integers(0, 100, size=500).astype(float),
        }
    )
    ds = pzd.Dataset(pzd.from_pandas(df).ray.repartition(7))
    got = (
        ds.cube(["a", "b"], [("count", "v"), ("sum", "v"), ("average", "v")])
        .to_pandas()
    )
    want = con.execute(
        'select a, b, count(v) as "count(v)", sum(v) as "sum(v)", '
        'avg(v) as "average(v)" from df group by cube(a, b)'
    ).df()
    # NB: SQL CUBE emits BOTH the data-null group row and the rollup row
    # with the same null-key tuple; compare as sorted multisets.
    pd.testing.assert_frame_equal(
        canon(got), canon(want), check_dtype=False, atol=1e-9, check_exact=False
    )


def test_null_safe_groupby_aggregate_and_map_groups(con):
    """SQL GROUP BY with null keys across many blocks — the sort-shuffle
    crash case; null_safe groups them correctly on both paths."""
    from ray.data.aggregate import Count, Sum

    rng = np.random.default_rng(6)
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", None], size=400).tolist(),
            "v": rng.integers(0, 50, size=400).astype(np.int64),
        }
    )
    ds = pzd.Dataset(pzd.from_pandas(df).ray.repartition(9))
    got = (
        ds.groupby("k", null_safe=True)
        .aggregate(Count("v", alias_name="n"), Sum("v", alias_name="s"))
        .to_pandas()
    )
    want = con.execute(
        "select k, count(v) as n, sum(v) as s from df group by k"
    ).df()
    pd.testing.assert_frame_equal(canon(got), canon(want), check_dtype=False)

    def _g(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": [g["k"].iloc[0]], "s": [g["v"].sum()]})

    got2 = (
        ds.groupby("k", null_safe=True)
        .map_groups(_g, batch_format="pandas")
        .to_pandas()
    )
    want2 = want.rename(columns={"n": "drop"}).drop(columns=["drop"])
    pd.testing.assert_frame_equal(canon(got2), canon(want2), check_dtype=False)


def test_distinct_and_sort_null_safe(con):
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y", None], 300).tolist(),
            "b": rng.integers(0, 3, 300).astype(np.int64),
        }
    )
    ds = pzd.Dataset(pzd.from_pandas(df).ray.repartition(7))
    got = ds.distinct(null_safe=True).to_pandas()
    want = con.execute("select distinct a, b from df").df()
    pd.testing.assert_frame_equal(canon(got), canon(want), check_dtype=False)

    srt = ds.sort(["a", "b"], null_safe=True).to_pandas().reset_index(drop=True)
    want_srt = con.execute(
        "select * from df order by a nulls last, b nulls last"
    ).df()
    pd.testing.assert_frame_equal(srt, want_srt, check_dtype=False)
    # descending direction with NULLS LAST, duckdb default
    srt_d = (
        ds.sort(["a"], descending=True, null_safe=True)
        .to_pandas()["a"].reset_index(drop=True)
    )
    want_d = con.execute("select a from df order by a desc nulls last").df()["a"]
    pd.testing.assert_series_equal(srt_d, want_d, check_dtype=False)


def test_window_null_safe_partition_keys(con):
    df = pd.DataFrame(
        {
            "g": ["a", "a", None, None, "b"],
            "o": [1, 2, 1, 2, 1],
            "v": [10.0, 20.0, 30.0, 40.0, 50.0],
        }
    )
    ds = pzd.Dataset(pzd.from_pandas(df).ray.repartition(3))
    got = ds.window_cum(
        "v", "sum", by="g", order="o", out="rs", null_safe=True
    ).to_pandas()
    want = con.execute(
        "select g, o, v, sum(v) over (partition by g order by o"
        "  rows unbounded preceding) as rs from df"
    ).df()
    pd.testing.assert_frame_equal(canon(got), canon(want), check_dtype=False)


def test_quantile_disc_matches_duckdb(con, olap_df):
    df = olap_df
    got = (
        pzd.from_pandas(df)
        .groupby(["a"])
        .quantile("v", {"q5d": 0.5, "q25d": 0.25}, discrete=True)
        .to_pandas()
    )
    want = con.execute(
        "select a, quantile_disc(v, 0.5) as q5d, quantile_disc(v, 0.25) as q25d "
        "from df group by a"
    ).df()
    pd.testing.assert_frame_equal(canon(got), canon(want), check_dtype=False)


def test_corr_covar_match_duckdb(con):
    rng = np.random.default_rng(8)
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y", "z"], 400).tolist(),
            "a": rng.standard_normal(400),
            "b": rng.standard_normal(400),
        }
    )
    df.loc[5:40, "a"] = None  # null pairs skipped
    df.loc[df["g"] == "z", "b"] = None  # group with zero pairs -> nulls
    ds = pzd.Dataset(pzd.from_pandas(df).ray.repartition(7))
    got = (
        ds.groupby(["g"])
        .corr("a", "b", kinds={"c": "corr", "cs": "covar_samp", "cp": "covar_pop"})
        .to_pandas()
    )
    want = con.execute(
        "select g, corr(a,b) as c, covar_samp(a,b) as cs, covar_pop(a,b) as cp "
        "from df group by g"
    ).df()
    pd.testing.assert_frame_equal(
        canon(got), canon(want), check_dtype=False, atol=1e-10, check_exact=False
    )


def test_regr_family_matches_duckdb(con):
    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y"], 300).tolist(),
            "a": rng.standard_normal(300),          # independent (x)
        }
    )
    df["b"] = 2.5 * df["a"] + rng.standard_normal(300) * 0.3  # dependent (y)
    df.loc[3:30, "a"] = None
    ds = pzd.Dataset(pzd.from_pandas(df).ray.repartition(5))
    got = (
        ds.groupby(["g"])
        .corr("a", "b", kinds={
            "sl": "regr_slope", "ic": "regr_intercept", "r2": "regr_r2",
            "n": "regr_count", "ax": "regr_avgx", "ay": "regr_avgy",
        })
        .to_pandas()
    )
    want = con.execute(
        "select g, regr_slope(b, a) as sl, regr_intercept(b, a) as ic, "
        "regr_r2(b, a) as r2, cast(regr_count(b, a) as double) as n, "
        "regr_avgx(b, a) as ax, regr_avgy(b, a) as ay from df group by g"
    ).df()
    pd.testing.assert_frame_equal(
        canon(got), canon(want), check_dtype=False, atol=1e-10, check_exact=False
    )


def test_bag_set_ops_match_duckdb(con):
    rng = np.random.default_rng(10)
    l = pd.DataFrame(
        {"a": rng.choice(["x", "y", None], 200).tolist(),
         "b": rng.integers(0, 3, 200).astype(np.int64)}
    )
    r = pd.DataFrame(
        {"a": rng.choice(["x", "y", None], 150).tolist(),
         "b": rng.integers(0, 3, 150).astype(np.int64)}
    )
    dl = pzd.Dataset(pzd.from_pandas(l).ray.repartition(5))
    dr = pzd.Dataset(pzd.from_pandas(r).ray.repartition(4))
    got_i = dl.intersect_all(dr).to_pandas()
    want_i = con.execute("select * from l intersect all select * from r").df()
    pd.testing.assert_frame_equal(canon(got_i), canon(want_i), check_dtype=False)
    got_e = dl.except_all(dr).to_pandas()
    want_e = con.execute("select * from l except all select * from r").df()
    pd.testing.assert_frame_equal(canon(got_e), canon(want_e), check_dtype=False)


def test_review_fixes_null_safe_surfaces(con):
    """Round-2 review regressions: timestamp null-safe sort, null-safe
    holistic agg + nunique, regr_r2 constant-y, empty funnel."""
    import ray.data as rd

    from palimpzest_ray.stages import windows as W
    from palimpzest_ray.stages.sketches import hll_distinct_by

    # timestamp sort key with nulls, NULLS LAST
    df = pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-02", None, "2024-01-01", None]),
         "v": [1, 2, 3, 4]}
    )
    srt = (
        pzd.Dataset(pzd.from_pandas(df).ray.repartition(3))
        .sort(["ts"], null_safe=True).to_pandas()
    )
    assert srt["v"].tolist()[:2] == [3, 1] and srt["ts"].isna().tolist()[2:] == [True, True]

    # holistic agg + nunique honor null_safe on null group keys
    gdf = pd.DataFrame(
        {"g": ["a", None, "a", None, "b"] * 20,
         "v": np.arange(100, dtype=np.float64)}
    )
    ds = pzd.Dataset(pzd.from_pandas(gdf).ray.repartition(7))
    med = ds.groupby("g", null_safe=True).agg([("median", "v")]).to_pandas()
    want_med = con.execute(
        'select g, median(v) as "median(v)" from gdf group by g'
    ).df()
    pd.testing.assert_frame_equal(canon(med), canon(want_med), check_dtype=False)
    nun = ds.groupby("g", null_safe=True).nunique("v", out="n").to_pandas()
    want_n = con.execute("select g, count(distinct v) as n from gdf group by g").df()
    pd.testing.assert_frame_equal(canon(nun), canon(want_n), check_dtype=False)

    # regr_r2: constant y + varying x -> 1.0 (duckdb parity)
    rdf = pd.DataFrame({"g": ["x"] * 4, "a": [1.0, 2.0, 3.0, 4.0], "b": [7.0] * 4})
    r2 = (
        pzd.from_pandas(rdf).groupby(["g"]).corr("a", "b", kinds={"r2": "regr_r2"})
        .to_pandas()["r2"][0]
    )
    want_r2 = con.execute("select regr_r2(b, a) from rdf").fetchone()[0]
    assert r2 == want_r2 == 1.0

    # grouped HLL with null keys
    hh = {
        r["g"]: r["approx_nunique(v)"]
        for r in hll_distinct_by(
            pzd.from_pandas(gdf).ray.repartition(5), "g", "v", null_safe=True
        ).take_all()
    }
    assert set(map(str, hh)) == {"a", "b", "None"} and all(v > 0 for v in hh.values())

    # empty funnel -> zero rows per step
    empty = rd.from_pandas(
        pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                      "ts": pd.Series([], dtype="datetime64[us]"),
                      "event_type": pd.Series([], dtype="object")})
    )
    out = W.funnel(empty, ["signup", "click"]).to_pylist()
    assert [(r["step"], r["n_entities"]) for r in out] == [("signup", 0), ("click", 0)]


def test_describe_summary(con):
    df = pd.DataFrame(
        {"a": np.arange(1000, dtype=np.float64), "b": np.ones(1000), "s": ["x"] * 1000}
    )
    t = pzd.from_pandas(df).describe()
    rows = {r["column"]: r for r in t.to_pylist()}
    assert set(rows) == {"a", "b"}  # string column excluded
    ra = rows["a"]
    assert ra["count"] == 1000 and ra["min"] == 0.0 and ra["max"] == 999.0
    assert ra["mean"] == pytest.approx(499.5)
    assert ra["std"] == pytest.approx(df["a"].std(), rel=1e-9)
    assert ra["median"] == pytest.approx(499.5, abs=1.0)  # sketch: 1-bin error
    assert rows["b"]["std"] == pytest.approx(0.0, abs=1e-12)


def test_describe_edge_cases():
    # all-null column, constant column, no-numeric-columns, empty frame
    df = pd.DataFrame(
        {"a": pd.Series([None, None], dtype="float64"), "b": [5.0, 5.0], "s": ["x", "y"]}
    )
    rows = {r["column"]: r for r in pzd.from_pandas(df).describe().to_pylist()}
    assert rows["a"]["count"] == 0 and rows["a"]["mean"] is None and rows["a"]["median"] is None
    assert rows["b"]["median"] == 5.0 and rows["b"]["q25"] == 5.0
    assert pzd.from_pandas(pd.DataFrame({"s": ["x"]})).describe().num_rows == 0


def test_window_rolling_time_matches_duckdb(con):
    rng = np.random.default_rng(11)
    n = 300
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b"], n).tolist(),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 30 * 24, n), unit="h"),
            "v": rng.integers(0, 100, n).astype(np.float64),
        }
    )
    # duplicate timestamps exercise RANGE peer inclusion
    df.loc[1, "ts"] = df.loc[0, "ts"]; df.loc[1, "g"] = df.loc[0, "g"]
    ds = pzd.Dataset(pzd.from_pandas(df).ray.repartition(5))
    got = (
        ds.window_rolling_time("v", "sum", interval="6 days", by="g", ts="ts", out="rs")
        .window_rolling_time("v", "avg", interval="6 days", by="g", ts="ts", out="ra")
        .window_rolling_time("v", "count", interval="6 days", by="g", ts="ts", out="rc")
        .to_pandas()
    )
    want = con.execute(
        "select g, ts, v,"
        " sum(v) over w as rs, avg(v) over w as ra, count(v) over w as rc"
        " from df window w as (partition by g order by ts"
        "   range between interval 6 days preceding and current row)"
    ).df()
    pd.testing.assert_frame_equal(
        canon(got), canon(want), check_dtype=False, atol=1e-9, check_exact=False
    )


def test_window_rolling_time_minmax_matches_duckdb(con):
    rng = np.random.default_rng(12)
    n = 400
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b"], n).tolist(),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 40 * 24, n), unit="h"),
            "v": rng.standard_normal(n) * 50,
        }
    )
    ds = pzd.Dataset(pzd.from_pandas(df).ray.repartition(4))
    got = (
        ds.window_rolling_time("v", "min", interval="3 days", by="g", ts="ts", out="rmin")
        .window_rolling_time("v", "max", interval="3 days", by="g", ts="ts", out="rmax")
        .to_pandas()
    )
    want = con.execute(
        "select g, ts, v, min(v) over w as rmin, max(v) over w as rmax"
        " from df window w as (partition by g order by ts"
        "   range between interval 3 days preceding and current row)"
    ).df()
    pd.testing.assert_frame_equal(
        canon(got), canon(want), check_dtype=False, atol=1e-12, check_exact=False
    )


def test_range_reduce_oracle():
    # brute-force oracle over random variable windows
    rng = np.random.default_rng(13)
    from palimpzest_ray.dataset import _range_reduce

    for trial in range(20):
        n = int(rng.integers(1, 200))
        vals = rng.standard_normal(n)
        starts = rng.integers(0, n, size=n)
        widths = rng.integers(1, n + 1, size=n)
        ends = np.minimum(starts + widths, n)
        starts = np.minimum(starts, ends - 1)
        got = _range_reduce(vals, starts, ends, np.minimum)
        want = np.array([vals[s:e].min() for s, e in zip(starts, ends)])
        np.testing.assert_array_equal(got, want)


def test_window_rolling_time_null_measures_match_duckdb(con):
    # null measures are SKIPPED; all-null frames yield NULL; count
    # counts non-null values (SQL parity)
    df = pd.DataFrame(
        {
            "g": ["a"] * 6,
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-03",
                 "2024-01-10", "2024-01-11", "2024-01-12"]
            ),
            "v": [1.0, None, 3.0, None, None, 6.0],
        }
    )
    ds = pzd.from_pandas(df)
    got = (
        ds.window_rolling_time("v", "sum", interval="2 days", by="g", ts="ts", out="rs")
        .window_rolling_time("v", "avg", interval="2 days", by="g", ts="ts", out="ra")
        .window_rolling_time("v", "count", interval="2 days", by="g", ts="ts", out="rc")
        .window_rolling_time("v", "min", interval="2 days", by="g", ts="ts", out="rmin")
        .to_pandas()
    )
    want = con.execute(
        "select g, ts, v, sum(v) over w as rs, avg(v) over w as ra,"
        " count(v) over w as rc, min(v) over w as rmin"
        " from df window w as (partition by g order by ts"
        "   range between interval 2 days preceding and current row)"
    ).df()
    pd.testing.assert_frame_equal(canon(got), canon(want), check_dtype=False)
    # integer dtype preserved on the exact path
    di = pd.DataFrame({"g": ["a"] * 3, "ts": pd.to_datetime(
        ["2024-01-01", "2024-01-02", "2024-01-03"]), "v": [2**53 + 1, 2**53, 5]})
    gi = pzd.from_pandas(di).window_rolling_time(
        "v", "max", interval="5 days", by="g", ts="ts", out="m"
    ).to_pandas().sort_values("ts")
    assert gi["m"].tolist() == [2**53 + 1, 2**53 + 1, 2**53 + 1]


def test_agg_distributed_matches_groups_and_duckdb(con):
    """r5 (VERDICT r4 'What's wrong #1'): the distributed holistic agg
    path — median via the narrow quantile kernel, count_distinct via
    the pair-distinct shuffle, mode via the (keys, value) count-reduce
    + combiner argmax — must equal the per-group holistic path AND
    DuckDB, including dtypes, null measures and all-null groups."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from palimpzest_ray.dataset import Dataset

    rng = np.random.default_rng(11)
    n = 20_000
    vals = rng.integers(0, 50, n).astype("float64")
    vals[rng.random(n) < 0.05] = np.nan
    tab = pa.table({
        "g": pa.array([f"s{v}" for v in rng.integers(0, 5, n)]),
        "x": pa.array(
            [None if v != v else int(v) for v in vals], pa.int64()
        ),
        "s": pa.array(
            [f"v{int(v) % 7}" if v == v else None for v in vals]
        ),
    })
    ds = Dataset(rd.from_arrow(tab).repartition(8))
    funcs = [("count", "x"), ("sum", "x"), ("average", "x"),
             ("median", "x"), ("count_distinct", "s"), ("mode", "s"),
             ("min", "x"), ("max", "x")]
    a = ds.groupby("g").agg(funcs, strategy="distributed").to_pandas()
    b = ds.groupby("g").agg(funcs, strategy="groups").to_pandas()
    a = a[sorted(a.columns)].sort_values("g", ignore_index=True)
    b = b[sorted(b.columns)].sort_values("g", ignore_index=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    con.register("t_aggdist", tab.to_pandas())
    o = con.execute("""
      with c as (
        select g, s, count(*) n from t_aggdist
        where s is not null group by 1, 2
      ),
      m as (
        select g, s as mode_s,
               row_number() over (
                 partition by g order by n desc, s asc
               ) rn
        from c
      )
      select t.g, count(x) as "count(x)", sum(x) as "sum(x)",
             avg(x) as "average(x)", median(x) as "median(x)",
             count(distinct s) as "count_distinct(s)",
             min(m.mode_s) as "mode(s)",
             min(x) as "min(x)", max(x) as "max(x)"
      from t_aggdist t left join m on t.g = m.g and m.rn = 1
      group by t.g, m.mode_s
    """).df()
    o = o[sorted(o.columns)].sort_values("g", ignore_index=True)
    pd.testing.assert_frame_equal(a, o, check_dtype=False)

    # all-null measure group: survives every part with null results
    tab2 = pa.table({
        "g": pa.array(["a"] * 5 + ["b"] * 3),
        "x": pa.array([1, 2, 2, None, 3] + [None] * 3, pa.int64()),
    })
    ds2 = Dataset(rd.from_arrow(tab2))
    f2 = [("median", "x"), ("mode", "x"), ("count_distinct", "x")]
    a2 = ds2.groupby("g").agg(f2, strategy="distributed").to_pandas()
    b2 = ds2.groupby("g").agg(f2, strategy="groups").to_pandas()
    pd.testing.assert_frame_equal(
        a2[sorted(a2.columns)].sort_values("g", ignore_index=True),
        b2[sorted(b2.columns)].sort_values("g", ignore_index=True),
        check_dtype=False,
    )
    row_b = a2.set_index("g").loc["b"]
    assert pd.isna(row_b["median(x)"]) and pd.isna(row_b["mode(x)"])
    assert row_b["count_distinct(x)"] == 0

    # mode tie-break: smallest value among max counts, deterministically
    tab3 = pa.table({"g": ["z"] * 4, "x": pa.array([7, 7, 3, 3])})
    ds3 = Dataset(rd.from_arrow(tab3))
    m3 = ds3.groupby("g").mode("x").to_pandas()
    assert m3["mode(x)"].tolist() == [3]

    # no scale path for string_agg/list/set: loud refusal when pinned
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no scale path"):
        ds3.groupby("g").agg([("string_agg", "x")],
                             strategy="distributed")


def test_agg_auto_probe_routes_and_warns(monkeypatch, tmp_path):
    """The auto probe (footer estimate + 64k-prefix key cardinality):
    with the task-heap threshold forced to 0, a parquet-backed
    low-cardinality groupby auto-routes median/mode/count_distinct to
    the distributed path (same results), and a string_agg in the mix
    pins it to groups with a LOUD warning."""
    import warnings

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import palimpzest_ray.dataset as pzd

    rng = np.random.default_rng(13)
    n = 5_000
    tab = pa.table({
        "g": pa.array([f"k{v}" for v in rng.integers(0, 3, n)]),
        "x": pa.array(rng.integers(0, 40, n).astype(np.int64)),
    })
    p = tmp_path / "probe.parquet"
    pq.write_table(tab, p)
    monkeypatch.setattr(pzd, "_WINDOW_BUCKETED_MIN_GROUP_BYTES", 0)
    ds = pzd.read_parquet(str(p))
    gb = ds.groupby("g")
    assert gb._agg_holistic_probe(
        [("median", "x")], has_post=False
    ) == "distributed"
    a = gb.agg([("median", "x"), ("mode", "x")]).to_pandas()
    b = gb.agg([("median", "x"), ("mode", "x")],
               strategy="groups").to_pandas()
    pd.testing.assert_frame_equal(
        a[sorted(a.columns)].sort_values("g", ignore_index=True),
        b[sorted(b.columns)].sort_values("g", ignore_index=True),
        check_dtype=False,
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        gb.agg([("median", "x"), ("string_agg", "x")]).to_pandas()
    assert any("no scale path" in str(x.message) for x in w)


def test_agg_distributed_parity_randomized_configs():
    """Randomized parity sweep for the distributed holistic path:
    multi-column keys, string/date/float measure types, varying null
    densities — distributed == groups on every configuration."""
    import datetime as dt

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from palimpzest_ray.dataset import Dataset

    for seed, null_p in [(1, 0.0), (2, 0.15), (3, 0.6)]:
        rng = np.random.default_rng(seed)
        n = 4_000
        mask = rng.random(n) < null_p
        t = pa.table({
            "k1": pa.array(rng.choice(["a", "b", "c"], n)),
            "k2": pa.array(rng.integers(0, 3, n).astype(np.int64)),
            "f": pa.array(
                [None if m else float(v) for m, v in
                 zip(mask, rng.normal(100, 10, n))],
                pa.float64(),
            ),
            "s": pa.array(
                [None if m else f"s{int(v)}" for m, v in
                 zip(mask, rng.integers(0, 40, n))]
            ),
            "d": pa.array(
                [None if m else dt.date(2024, 1, 1 + int(v))
                 for m, v in zip(mask, rng.integers(0, 28, n))],
                pa.date32(),
            ),
        })
        ds = Dataset(rd.from_arrow(t).repartition(6))
        funcs = [("median", "f"), ("mode", "s"), ("mode", "d"),
                 ("count_distinct", "s"), ("count_distinct", "d"),
                 ("count", "f"), ("max", "d")]
        gb = ds.groupby(["k1", "k2"])
        a = gb.agg(funcs, strategy="distributed").to_pandas()
        b = gb.agg(funcs, strategy="groups").to_pandas()
        key = ["k1", "k2"]
        a = a[sorted(a.columns)].sort_values(key, ignore_index=True)
        b = b[sorted(b.columns)].sort_values(key, ignore_index=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
