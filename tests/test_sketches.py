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
