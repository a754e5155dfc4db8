"""Data profiling (stages/profile.py): exact counts/extremes/sums per
column, HLL approx-distinct, duckdb-mode parity with profile_sql."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from palimpzest_ray.stages.profile import profile_sql, profile_table

T = pa.table(
    {
        "k": pa.array([1, 2, 2, 3, None], pa.int64()),
        "v": pa.array([1.5, None, 2.25, -4.0, 0.0], pa.float64()),
        "s": pa.array(["b", "a", None, "c", "a"]),
    }
)


def test_profile_exact_stats():
    t = profile_table(rd.from_arrow(T), ["k", "v", "s"], p=6)
    rows = {r["column"]: r for r in t.to_pylist()}
    assert rows["k"]["n_rows"] == 5 and rows["k"]["n_nonnull"] == 4
    assert rows["k"]["min_c"] == 100 and rows["k"]["max_c"] == 300
    assert rows["k"]["sum_c"] == 800
    assert rows["v"]["min_c"] == -400 and rows["v"]["max_c"] == 225
    assert rows["v"]["sum_c"] == -25  # 1.5+2.25-4.0+0.0 = -0.25
    assert rows["s"]["min_str"] == "a" and rows["s"]["max_str"] == "c"
    assert rows["s"]["min_c"] is None and rows["s"]["sum_c"] is None
    # stable-hash HLL: small sets estimate near-exactly
    assert rows["k"]["approx_distinct"] >= 3
    assert rows["s"]["approx_distinct"] >= 3


def test_profile_duckdb_mode_matches_sql_oracle():
    # distinct count must sit above the 2.5m linear-counting gate
    # (the ln() branch is libm-dependent — the d16 convention)
    rng = np.random.default_rng(9)
    T = pa.table(
        {
            "k": pa.array(rng.integers(0, 5_000, 8_000), pa.int64()),
            "v": pa.array(rng.normal(size=8_000)),
            "s": pa.array([f"s{i % 11}" for i in range(8_000)]),
        }
    )
    t = profile_table(
        rd.from_arrow(T), ["k", "v", "s"], p=6, hash_fn="duckdb"
    )
    con = duckdb.connect()
    con.register("t", T)
    exp = con.execute(
        profile_sql("t", {"k": "int", "v": "float", "s": "str"}, p=6)
    ).arrow()
    got = t.to_pandas().sort_values("column", ignore_index=True)
    want = exp.to_pandas().sort_values("column", ignore_index=True)
    import pandas as pd

    pd.testing.assert_frame_equal(
        got, want.astype(got.dtypes.to_dict()), check_exact=True
    )
    # duckdb mode: non-integer columns report null approx
    rows = {r["column"]: r for r in t.to_pylist()}
    assert rows["v"]["approx_distinct"] is None
    assert rows["s"]["approx_distinct"] is None
    assert rows["k"]["approx_distinct"] is not None


def test_profile_rejects_unsupported():
    t2 = T.append_column("lst", pa.array([[1]] * 5, pa.list_(pa.int64())))
    with pytest.raises(ValueError, match="numeric/string"):
        profile_table(rd.from_arrow(t2), ["lst"])
    with pytest.raises(ValueError, match="unknown column"):
        profile_table(rd.from_arrow(T), ["ghost"])


def test_profile_scales_to_blocks():
    """Layout invariance: same profile regardless of block structure."""
    rng = np.random.default_rng(4)
    big = pa.table(
        {
            "k": pa.array(rng.integers(0, 1000, 20_000), pa.int64()),
            "v": pa.array(rng.normal(size=20_000)),
            "s": pa.array(
                [f"s{int(x) % 37}" for x in rng.integers(0, 37, 20_000)]
            ),
        }
    )
    one = profile_table(rd.from_arrow(big), ["k", "v", "s"], p=8)
    many = profile_table(
        rd.from_arrow(big).repartition(13), ["k", "v", "s"], p=8
    )
    assert one.equals(many)
