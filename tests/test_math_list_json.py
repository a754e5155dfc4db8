"""Math / list / JSON scalar families vs duckdb — edge cases the
contract queries (q39-q41) don't reach: nulls, empty lists, negative
mod, missing JSON keys, invalid JSON documents.

No Ray needed: these kernels are plain Arrow-in/Arrow-out (they run
inside map_batches in the engine, but parity holds at the array level).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from palimpzest_ray.functions import json as J
from palimpzest_ray.functions import lists as L
from palimpzest_ray.functions import math as M


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


NUMS = pa.array([2.5, -2.5, 0.05, -0.05, 1.15, None, 0.0, 123.456])


def test_math_kernels_match_duckdb(con):
    df = pd.DataFrame({"x": NUMS.to_pylist()})
    cases = [
        (M.abs_(NUMS), "abs(x)"),
        (M.round_(NUMS), "round(x, 0)"),
        (M.round_(NUMS, 1), "round(x, 1)"),
        (M.ceil(NUMS), "ceil(x)"),
        (M.floor(NUMS), "floor(x)"),
        (M.trunc(NUMS), "trunc(x)"),
        (M.exp(NUMS), "exp(x)"),
        (M.power(NUMS, pa.scalar(2.0)), "power(x, 2)"),
        (M.sign(NUMS), "cast(sign(x) as double)"),
    ]
    for got, sql in cases:
        want = [r[0] for r in con.execute(f"select {sql} from df").fetchall()]
        assert got.to_pylist() == want, sql


def test_mod_matches_sql_trunc_remainder(con):
    a = pa.array([7, -7, 7, -7, 0, None], pa.int64())
    b = pa.array([3, 3, -3, -3, 5, 2], pa.int64())
    df = pd.DataFrame({"a": a.to_pylist(), "b": b.to_pylist()})
    want = [r[0] for r in con.execute("select a % b from df").fetchall()]
    assert M.mod(a, b).to_pylist() == want
    # float mod too
    fa = pa.array([7.5, -7.5, 7.5], pa.float64())
    fb = pa.array([2.0, 2.0, -2.0], pa.float64())
    dff = pd.DataFrame({"a": fa.to_pylist(), "b": fb.to_pylist()})
    wantf = [r[0] for r in con.execute("select a % b from dff").fetchall()]
    assert M.mod(fa, fb).to_pylist() == wantf


def test_greatest_least_clamp(con):
    a = pa.array([1.0, 9.0, None])
    b = pa.array([5.0, 2.0, 3.0])
    df = pd.DataFrame({"a": a.to_pylist(), "b": b.to_pylist()})
    assert (
        M.greatest(a, b).to_pylist()
        == [r[0] for r in con.execute("select greatest(a, b) from df").fetchall()]
    )
    assert (
        M.least(a, b).to_pylist()
        == [r[0] for r in con.execute("select least(a, b) from df").fetchall()]
    )
    assert M.clamp(pa.array([1, 5, 99]), 2, 10).to_pylist() == [2, 5, 10]


LISTS = pa.array(
    [[1.5, 2.5, -3.0], [], None, [42.0], [0.1, 0.2, 0.3]],
    pa.list_(pa.float32()),
)


def test_list_reductions_match_duckdb(con):
    df = pd.DataFrame({"v": LISTS.to_pylist()})
    con.register("lists_df", pa.table({"v": LISTS}))
    cases = [
        (L.list_len(LISTS), "len(v)"),
        (pa.array(L.list_sum(LISTS)), "cast(list_sum(v) as double)"),
        (pa.array(L.list_min(LISTS)), "list_min(v)"),
        (pa.array(L.list_max(LISTS)), "list_max(v)"),
    ]
    for got, sql in cases:
        want = [r[0] for r in con.execute(f"select {sql} from lists_df").fetchall()]
        g = got.to_pylist()
        assert len(g) == len(want)
        for gv, wv in zip(g, want):
            if gv is None or wv is None:
                # duckdb list_sum([]) is NULL; ours too
                assert gv == wv, sql
            else:
                assert gv == pytest.approx(wv, rel=1e-6), sql


def test_list_get_and_contains():
    one = L.list_get(LISTS, 1, one_based=True).to_pylist()
    assert one[0] == 1.5 and one[3] == 42.0 and one[4] == pytest.approx(0.1, rel=1e-6)
    got = L.list_get(LISTS, 0).to_pylist()
    assert got[0] == 1.5 and got[3] == 42.0 and got[2] is None
    c = L.list_contains(LISTS, np.float32(42.0)).to_pylist()
    assert c == [False, False, None, True, False]


def test_list_mean_empty_is_null():
    m = L.list_mean(LISTS).to_pylist()
    assert m[1] is None and m[2] is None
    assert m[3] == 42.0
    assert m[0] == pytest.approx((1.5 + 2.5 - 3.0) / 3)


JDOCS = pa.array(
    [
        '{"k": 87, "s": "hi", "b": true, "o": {"n": 1}}',
        '{"k": 0}',
        '{"other": 1}',
        "not json",
        None,
        '{"k": -3.5}',
    ]
)


def test_json_extract_string_matches_duckdb(con):
    df = pd.DataFrame({"j": JDOCS.to_pylist()})
    got = J.json_extract_string(JDOCS, "$.k").to_pylist()
    want = [
        r[0]
        for r in con.execute(
            "select case when json_valid(j) then json_extract_string(j, '$.k') end from df"
        ).fetchall()
    ]
    assert got == want
    # nested path + object stringification
    assert J.json_extract_string(JDOCS, "$.o.n").to_pylist()[0] == "1"
    assert J.json_extract_string(JDOCS, "$.o").to_pylist()[0] == '{"n":1}'
    assert J.json_extract_string(JDOCS, "$.b").to_pylist()[0] == "true"


def test_json_extract_typed_and_valid():
    # -3.5 -> -4: duckdb DOUBLE->BIGINT rounds half-to-even, not toward zero
    assert J.json_extract_int(JDOCS, "$.k").to_pylist() == [87, 0, None, None, None, -4]
    assert J.json_extract_double(JDOCS, "$.k").to_pylist() == [87.0, 0.0, None, None, None, -3.5]
    assert J.json_valid(JDOCS).to_pylist() == [True, True, True, False, None, True]


def test_json_to_columns_parse_once():
    cols = J.json_to_columns(JDOCS, {"k": pa.float64(), "s": pa.string()})
    assert cols["k"].to_pylist() == [87.0, 0.0, None, None, None, -3.5]
    assert cols["s"].to_pylist() == ["hi", None, None, None, None, None]


def test_segmented_reduce_layout_invariance():
    """Chunked vs combined list columns give identical reductions."""
    chunked = pa.chunked_array([LISTS.slice(0, 2), LISTS.slice(2)])
    for fn in (L.list_sum, L.list_min, L.list_max, L.list_len):
        assert pa.array(fn(chunked)).to_pylist() == pa.array(fn(LISTS)).to_pylist()


def test_substr_edge_windows_match_duckdb(con):
    s = pa.array(["abcdef"])
    from palimpzest_ray.functions import strings as S

    cases = [(-3, 5), (-1, 3), (0, 2), (-10, 3), (-10, 12), (2, 0), (2, -1), (3, 2)]
    for start, length in cases:
        got = S.substr(s, start, length).to_pylist()[0]
        want = con.execute(f"select substr('abcdef', {start}, {length})").fetchone()[0]
        assert got == want, (start, length, got, want)


def test_mod_zero_divisor_is_null(con):
    a = pa.array([7, -7, 0], pa.int64())
    b = pa.array([0, 2, 0], pa.int64())
    assert M.mod(a, b).to_pylist() == [None, -1, None]
    assert M.mod(a, 0).to_pylist() == [None, None, None]
    fa = pa.array([7.5]); 
    assert M.mod(fa, pa.array([0.0])).to_pylist() == [None]
    assert con.execute("select 7 % 0").fetchone()[0] is None


def test_list_aggs_skip_null_elements(con):
    lv = pa.array([[1.0, None, 2.0], [None], [3.0]], pa.list_(pa.float64()))
    con.register("lv_df", pa.table({"v": lv}))
    assert pa.array(L.list_sum(lv)).to_pylist() == [3.0, None, 3.0]
    assert pa.array(L.list_min(lv)).to_pylist() == [1.0, None, 3.0]
    assert pa.array(L.list_max(lv)).to_pylist() == [2.0, None, 3.0]
    assert pa.array(L.list_mean(lv)).to_pylist() == [1.5, None, 3.0]
    want = con.execute(
        "select list_sum(v), list_min(v), list_max(v), list_avg(v) from lv_df"
    ).fetchall()
    assert [w[0] for w in want] == [3.0, None, 3.0]
    # null elements never match list_contains (duckdb parity)
    assert L.list_contains(lv, 2.0).to_pylist() == [True, False, False]


def test_concat_ws_all_literals_raises_clearly():
    from palimpzest_ray.functions import strings as S

    with pytest.raises(ValueError, match="array argument"):
        S.concat_ws("|", "a", "b")


def test_sample_udf_library_plumbing(tmp_path):
    """Reference utils/udfs.py analogue: url_to_file over local paths;
    xls functions gated behind openpyxl (absent here)."""
    from palimpzest_ray.functions import udfs

    p = tmp_path / "doc.bin"
    p.write_bytes(b"hello")
    batch = pa.table({"url": [f"file://{p}", str(p), None]})
    out = udfs.url_to_file(batch)
    assert out["filename"].to_pylist() == ["doc.bin", "doc.bin", None]
    assert out["contents"].to_pylist() == [b"hello", b"hello", None]
    with pytest.raises(NotImplementedError, match="network"):
        udfs.url_to_file(pa.table({"url": ["https://x.invalid/a"]}))
    if not udfs._HAS_OPENPYXL:
        # only legacy binary .xls (non-zip bytes) stays dependency-gated
        with pytest.raises(NotImplementedError, match="BIFF"):
            udfs.file_to_xls(pa.table({"contents": [b"\xd0\xcf\x11\xe0 not a zip"]}))


def test_xls_udfs_stdlib_fallback():
    from palimpzest_ray.functions import udfs
    from palimpzest_ray.sources.officeparse import write_xlsx

    blob = write_xlsx(
        {
            "people": [["name", "age"], ["ada", 36], ["grace", 45]],
            "empty": [],
        }
    )
    out = udfs.file_to_xls(pa.table({"contents": [blob]}))
    assert out["number_sheets"].to_pylist() == [2]
    assert out["sheet_names"].to_pylist() == [["people", "empty"]]
    tabs = udfs.xls_to_tables(pa.table({"contents": [blob], "filename": ["f.xlsx"]}))
    byname = {n: i for i, n in enumerate(tabs["name"].to_pylist())}
    i = byname["f.xlsx_people"]
    assert tabs["header"].to_pylist()[i] == ["name", "age"]
    assert tabs["rows"].to_pylist()[i] == [["ada", "36"], ["grace", "45"]]


def test_list_reductions_on_sliced_arrays():
    """A zero-copy sliced ListArray keeps the full child buffer; the
    trailing segment must still end at the list's logical end (and the
    leading one start at its logical start), not the buffer's."""
    arr = pa.array([[3.0, 4.0], [1.0, 2.0, 4.0], [100.0, 200.0]])
    s = arr.slice(0, 2)
    assert L.list_sum(s).to_pylist() == [7.0, 7.0]
    assert L.list_min(s).to_pylist() == [3.0, 1.0]
    assert L.list_max(s).to_pylist() == [4.0, 4.0]
    assert L.list_mean(s).to_pylist() == [3.5, 7.0 / 3]
    mid = arr.slice(1, 1)  # non-zero leading offset
    assert L.list_sum(mid).to_pylist() == [7.0]
    assert L.list_max(mid).to_pylist() == [4.0]
    # nulls and empties inside the slice keep duckdb semantics
    arr2 = pa.array([[1.0, None], [], None, [5.0]])
    assert L.list_sum(arr2.slice(0, 3)).to_pylist() == [1.0, None, None]
    assert L.list_sum(arr2.slice(2, 2)).to_pylist() == [None, 5.0]


def test_json_extract_int_rounds_half_to_even(con):
    """duckdb json_extract(...)::BIGINT goes through DOUBLE->BIGINT,
    which rounds half-to-even — not truncation toward zero."""
    docs = ['{"a": 8.9}', '{"a": -8.9}', '{"a": 8.5}', '{"a": 9.5}',
            '{"a": -8.5}', '{"a": 7}', '{"a": "x"}', None]
    got = J.json_extract_int(pa.array(docs), "$.a").to_pylist()
    exp = [
        r[0]
        for r in con.execute(
            "SELECT TRY_CAST(json_extract(d, '$.a') AS BIGINT) FROM (SELECT UNNEST(?) d)",
            [docs],
        ).fetchall()
    ]
    assert got == exp
