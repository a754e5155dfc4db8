"""Sketch aggregates: HLL distinct within its error bound and
deterministic; histogram quantiles within one bin width."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from palimpzest_ray.stages import sketches as K


def _docs_ds(n_distinct: int, dups: int = 3) -> rd.Dataset:
    ids = [f"doc-{i:08d}" for i in range(n_distinct)] * dups
    return rd.from_arrow(pa.table({"doc_id": pa.array(ids)})).repartition(8)


def test_hll_within_error_bound_and_deterministic():
    n = 50_000
    ds = _docs_ds(n)
    est1 = K.hll_distinct(ds, "doc_id", p=12)
    est2 = K.hll_distinct(_docs_ds(n), "doc_id", p=12)
    rel_err = abs(est1 - n) / n
    assert rel_err < 0.05, rel_err  # 3σ at p=12 is ~4.9%
    assert est1 == est2  # stable hash ⇒ bit-identical across runs


def test_hll_small_range_linear_counting():
    ds = rd.from_arrow(pa.table({"k": pa.array([f"x{i}" for i in range(100)] * 5)}))
    est = K.hll_distinct(ds, "k", p=12)
    assert abs(est - 100) / 100 < 0.02  # linear counting is near-exact here


def test_hll_merge_partition_invariant():
    """Register merge is commutative/associative: any block layout gives
    the same sketch."""
    t = pa.table({"k": pa.array([f"v{i}" for i in range(10_000)])})
    a = K.hll_sketch(rd.from_arrow(t).repartition(2), "k")
    b = K.hll_sketch(rd.from_arrow(t).repartition(16), "k")
    assert np.array_equal(a, b)


def test_approx_quantiles_within_bin_width():
    rng = np.random.default_rng(7)
    v = rng.normal(100.0, 15.0, 200_000)
    ds = rd.from_arrow(pa.table({"v": pa.array(v)})).repartition(8)
    qs = [0.1, 0.5, 0.9, 0.99]
    got = K.approx_quantiles(ds, "v", qs, bins=4096)
    want = np.quantile(v, qs)
    bin_w = (v.max() - v.min()) / 4096
    for g, w in zip(got, want):
        assert abs(g - w) <= 2 * bin_w, (g, w)


def test_approx_quantiles_constant_column():
    ds = rd.from_arrow(pa.table({"v": pa.array([3.5] * 100)}))
    assert K.approx_quantiles(ds, "v", [0.0, 0.5, 1.0]) == [3.5, 3.5, 3.5]


def _zipf_values(n: int = 20_000, seed: int = 5) -> list[str]:
    rng = np.random.default_rng(seed)
    z = np.minimum(rng.zipf(1.3, n), 500)
    return [f"w{int(v):04d}" for v in z]


def test_heavy_hitters_exact_when_uncapped():
    import duckdb
    import pandas as pd

    vals = _zipf_values()
    ds = rd.from_arrow(pa.table({"w": pa.array(vals)})).repartition(8)
    got = K.heavy_hitters(ds, "w", k=10)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"w": vals}))
    want = con.execute(
        "SELECT w AS value, COUNT(*) AS count FROM t "
        "GROUP BY w ORDER BY count DESC, value ASC LIMIT 10"
    ).arrow()
    assert got.column("value").to_pylist() == want.column("value").to_pylist()
    assert got.column("count").to_pylist() == want.column("count").to_pylist()
    # uncapped: bounds are tight
    assert got.column("count_hi").to_pylist() == got.column("count").to_pylist()


def test_heavy_hitters_capped_bounds_contain_truth():
    from collections import Counter

    vals = _zipf_values(seed=9)
    true = Counter(vals)
    ds = rd.from_arrow(pa.table({"w": pa.array(vals)})).repartition(8)
    got = K.heavy_hitters(ds, "w", k=5, cap_per_block=16, driver_cap=24)
    rows = got.to_pylist()
    # the undisputed top value survives truncation and compaction,
    # and every reported [count, count_hi] interval contains the truth
    top_true = max(true.items(), key=lambda kv: kv[1])[0]
    assert rows[0]["value"] == top_true
    for r in rows:
        assert r["count"] <= true[r["value"]] <= r["count_hi"], r


def test_heavy_hitters_deterministic_across_layouts():
    vals = _zipf_values(seed=13)
    t = pa.table({"w": pa.array(vals)})
    a = K.heavy_hitters(rd.from_arrow(t).repartition(4), "w", k=8)
    b = K.heavy_hitters(rd.from_arrow(t).repartition(16), "w", k=8)
    assert a.column("value").to_pylist() == b.column("value").to_pylist()
    assert a.column("count").to_pylist() == b.column("count").to_pylist()


def test_heavy_hitters_numeric_tiebreak_matches_sql():
    """count DESC, value ASC with NATIVE comparison: 9 beats 10 on a
    tie (str ordering would say '10' < '9')."""
    vals = [9] * 3 + [10] * 3 + [7] * 5
    ds = rd.from_arrow(pa.table({"n": pa.array(vals, pa.int64())}))
    got = K.heavy_hitters(ds, "n", k=2)
    assert got.column("value").to_pylist() == [7, 9]
    assert got.column("count").to_pylist() == [5, 3]


def test_bloom_prefilter_no_false_negatives_and_low_fp():
    keys = rd.from_arrow(
        pa.table({"k": pa.array([f"key-{i}" for i in range(1000)])})
    ).repartition(4)
    probe = rd.from_arrow(
        pa.table({"k": pa.array([f"key-{i}" for i in range(5000)])})
    ).repartition(4)
    out = K.bloom_prefilter(probe, keys, "k", num_bits=1 << 16)
    kept = {r["k"] for r in out.take_all()}
    # every true member survives
    assert all(f"key-{i}" in kept for i in range(1000))
    # false-positive rate near theory (~1% at 65k bits / 1k keys / 5 hashes)
    fp = len(kept) - 1000
    assert fp / 4000 < 0.05, fp
    # deterministic across layouts
    out2 = K.bloom_prefilter(probe.repartition(9), keys.repartition(2), "k", num_bits=1 << 16)
    assert {r["k"] for r in out2.take_all()} == kept


def test_hll_distinct_by_groups_within_bound():
    """Per-group HLL vs exact nunique; all-null group reports 0."""
    import pandas as pd

    rng = np.random.default_rng(9)
    n = 20_000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], size=n),
            "v": rng.integers(0, 5000, size=n).astype(str),
        }
    )
    df.loc[df["g"] == "c", "v"] = None  # an all-null group
    ds = rd.from_pandas(df)
    got = {
        r["g"]: r["approx_nunique(v)"]
        for r in K.hll_distinct_by(ds, "g", "v", p=12).take_all()
    }
    exact = df.groupby("g")["v"].nunique().to_dict()
    assert got["c"] == 0
    for g in ("a", "b"):
        err = abs(got[g] - exact[g]) / exact[g]
        assert err < 0.05, (g, got[g], exact[g])
    # deterministic across layouts
    got2 = {
        r["g"]: r["approx_nunique(v)"]
        for r in K.hll_distinct_by(
            rd.from_pandas(df).repartition(7), "g", "v", p=12
        ).take_all()
    }
    assert got == got2


def test_duckdb_hash_matches_duckdb():
    """functions.tokens.duckdb_hash_i64 == duckdb's hash() bit-for-bit
    (the contract that makes d10/d12/d16's EXACT SQL oracles possible)."""
    import duckdb

    from palimpzest_ray.functions.tokens import duckdb_hash_i64

    vals = [0, 1, 42, -1, -42, 123456789, 2**62, -(2**62), 2**63 - 1]
    got = duckdb_hash_i64(np.array(vals, dtype=np.int64))
    exp = [
        r[0]
        for r in duckdb.connect()
        .execute("select hash(x) from (select unnest(?) x)", [vals])
        .fetchall()
    ]
    assert [int(v) for v in got] == [int(v) for v in exp]


def test_hll_duckdb_mode_matches_sql_oracle():
    """End-to-end: the distributed HLL estimate equals the DuckDB SQL
    register-rebuild oracle exactly (integer-scaled estimator, floor+0.5
    rounding, identical literal casts)."""
    import duckdb
    import ray.data as rd

    from palimpzest_ray.stages.sketches import hll_estimate_int, hll_sketch

    n, p = 20_000, 8
    keys = np.arange(1, n + 1, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"k": keys}))
    est = hll_estimate_int(hll_sketch(ds, "k", p=p, hash_fn="duckdb"))

    import __ray_entry__ as E

    sql = E._hll_oracle_sql("t", "k", p=p, out="e").replace(
        "from t", "from (select unnest(range(1, 20001))::BIGINT as k) t", 1
    )
    con = duckdb.connect()
    exp = con.sql(sql).fetchall()[0][0]
    assert est == exp
    # sanity: the estimate is within HLL error of truth
    assert abs(est - n) / n < 5 * 1.04 / np.sqrt(2**p)
