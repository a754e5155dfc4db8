"""Relational-layer parity tests (FIXTURES.md §5a; reference
``tests/pytest/test_distinct.py`` / ``test_filter.py`` / ``test_map.py``
patterns)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

import palimpzest_ray as pzr


@pytest.fixture()
def people():
    return pzr.from_pandas(
        pd.DataFrame(
            {
                "person_id": [1, 1, 2, 3, 4],
                "name": ["Alice", "Alice", "Bob", "Bob", "Charlie"],
                "age": [25, 25, 30, 30, 35],
            }
        )
    )


def test_distinct_all_columns(people):
    # reference distinct.py:43-45 — distinct over all cols -> 4 rows
    out = people.distinct().to_pandas()
    assert len(out) == 4


def test_distinct_subset_keeps_first(people):
    # distinct(["name","age"]) -> 3 rows, keep-first by person_id
    out = (
        people.distinct(["name", "age"], order_by=["person_id"])
        .to_pandas()
        .sort_values("person_id")
    )
    assert len(out) == 3
    assert sorted(out["person_id"].tolist()) == [1, 2, 4]


def test_filter_expr_and_udf(people):
    assert people.filter(expr="age > 28").count() == 3
    assert people.filter(fn=lambda r: r["name"].startswith("A")).count() == 2
    import pyarrow.compute as pc

    assert (
        people.filter(batch_fn=lambda t: t.filter(pc.equal(t["age"], 30))).count() == 2
    )


def test_map_merges_parent_fields(people):
    # reference NonLLMConvert semantics: UDF output merged over input row
    out = people.map(lambda r: {"age2": r["age"] * 2}).to_pandas()
    assert set(out.columns) == {"person_id", "name", "age", "age2"}
    assert (out["age2"] == out["age"] * 2).all()


def test_flat_map_one_to_many(people):
    out = people.flat_map(lambda r: [{"i": i} for i in range(2)])
    assert out.count() == 10


def test_explode_vectorized():
    ds = pzr.from_arrow(
        pa.table({"k": ["a", "b"], "vals": [[1, 2, 3], [4]]})
    )
    out = ds.explode("vals", out_col="v").to_pandas().sort_values("v")
    assert out["v"].tolist() == [1, 2, 3, 4]
    assert out["k"].tolist() == ["a", "a", "a", "b"]


def test_project_limit_union(people):
    assert people.project(["name"]).to_pandas().columns.tolist() == ["name"]
    assert people.limit(2).count() == 2
    assert people.union(people).count() == 10


def test_sort_topk(people):
    out = people.distinct(["person_id"]).topk(2, "age").to_pandas()
    assert out["age"].tolist() == [35, 30]


def test_global_aggregates(people):
    assert people.count() == 5
    assert people.sum("age") == 145
    assert people.average("age") == pytest.approx(29.0)
    assert people.min("age") == 25
    assert people.max("age") == 35


def test_average_skips_unparseable():
    # reference aggregate.py:245-251 — unparseable values silently skipped
    ds = pzr.from_items(
        [{"x": "1.5"}, {"x": "oops"}, {"x": "2.5"}, {"x": None}]
    )
    assert ds.average("x") == pytest.approx(2.0)
    assert ds.sum("x") == pytest.approx(4.0)


def test_groupby_parity_naming(people):
    # reference groupbysig.py:55-59 — output columns named "func(field)"
    out = (
        people.groupby("name")
        .agg([("count", "person_id"), ("average", "age"), ("max", "age")])
        .to_pandas()
        .sort_values("name")
    )
    assert "count(person_id)" in out.columns
    assert "average(age)" in out.columns
    assert out[out["name"] == "Alice"]["count(person_id)"].iloc[0] == 2


def test_groupby_list_set_aggs(people):
    out = (
        people.groupby("name")
        .agg([("list", "age"), ("set", "age")])
        .to_pandas()
        .sort_values("name")
    )
    alice = out[out["name"] == "Alice"].iloc[0]
    assert alice["list(age)"] == [25, 25]
    assert alice["set(age)"] == [25]


def test_top_n_per_group_with_ranks():
    import pyarrow as pa

    import palimpzest_ray.dataset as pzd

    t = pa.table(
        {
            "k": pa.array(["a", "a", "a", "a", "b", "b"]),
            "v": pa.array([5, 9, 7, 9, 1, 2], pa.int64()),
            "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        }
    )
    out = (
        pzd.from_arrow(t)
        .top_n_per_group("k", 2, [("v", "descending"), ("id", "ascending")], rank_col="rnk")
        .take_all()
    )
    got = sorted((r["k"], r["rnk"], r["id"]) for r in out)
    # ties on v=9 broken by id ascending
    assert got == [("a", 1, 2), ("a", 2, 4), ("b", 1, 6), ("b", 2, 5)]


def test_unpivot_melt():
    import pyarrow as pa

    import palimpzest_ray.dataset as pzd

    t = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "a": pa.array([10, 20], pa.int64()),
            "b": pa.array([1.5, None], pa.float64()),
        }
    )
    out = pzd.from_arrow(t).unpivot(["id"], ["a", "b"]).take_all()
    got = sorted((r["id"], r["variable"], r["value"]) for r in out)
    # null cells dropped by default (SQL UNPIVOT semantics)
    assert got == [
        (1, "a", 10.0),
        (1, "b", 1.5),
        (2, "a", 20.0),
    ]
    out2 = pzd.from_arrow(t).unpivot(["id"], ["a", "b"], include_nulls=True).take_all()
    assert sorted(
        (r["id"], r["variable"], r["value"]) for r in out2
    ) == got + [(2, "b", None)]


def test_pivot_sum_and_count():
    import pyarrow as pa

    import palimpzest_ray.dataset as pzd

    t = pa.table(
        {
            "k": pa.array(["u1", "u1", "u1", "u2"]),
            "tag": pa.array(["a", "b", "a", "b"]),
            "v": pa.array([1.0, 2.0, 3.0, 4.0]),
        }
    )
    out = {
        r["k"]: r
        for r in pzd.from_arrow(t)
        .pivot("k", "tag", "v", categories=["a", "b"], agg="sum")
        .take_all()
    }
    assert out["u1"]["v_a"] == 4.0 and out["u1"]["v_b"] == 2.0
    assert out["u2"]["v_a"] is None and out["u2"]["v_b"] == 4.0
    cnt = {
        r["k"]: r
        for r in pzd.from_arrow(t)
        .pivot("k", "tag", "v", categories=["a", "b"], agg="count")
        .take_all()
    }
    assert cnt["u1"]["v_a"] == 2 and cnt["u2"]["v_a"] == 0


def test_project_schema_survives_empty_result():
    # Ray's schema() is unreliable once a pipeline ends empty (None or
    # the pre-Project schema); project() must still yield exactly the
    # selected columns on a 0-row result (driver-contract canon sorts
    # on them)
    import palimpzest_ray.dataset as pzd

    t = pa.table({"a": [1, 2], "b": ["x", "y"], "c": [1.0, 2.0]})
    ds = (
        pzd.from_arrow(t)
        .filter(batch_fn=lambda b: b.filter(pa.array([False] * b.num_rows)))
        .project(["a", "b"])
    )
    out = ds.to_arrow()
    assert out.num_rows == 0 and out.column_names == ["a", "b"]
    df = ds.to_pandas()
    assert list(df.columns) == ["a", "b"] and len(df) == 0
