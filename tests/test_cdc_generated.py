"""Generated columns (cdc/engine.py add_generated_column — the Delta
GENERATED ALWAYS AS idea) over the JSON expression language
(cdc/expr.py): stored in the manifest, recomputed on EVERY apply
(incoming values overwritten), backfilled for existing rows as one
exactly-once UPDATE, interoperating with persistent constraints and
time travel."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import (
    add_constraint,
    add_generated_column,
    alter_schema,
    apply_changes,
    final_state_table,
)
from palimpzest_ray.cdc.expr import eval_expr, expr_columns, validate_expr
from palimpzest_ray.cdc.manifest import load_latest_manifest

SCHEMA = pa.schema(
    [
        pa.field("lsn", pa.int64()),
        pa.field("op", pa.string()),
        pa.field("doc_id", pa.string()),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
    ]
)


def _ev(rows: list[tuple]) -> pa.Table:
    return pa.Table.from_pylist(
        [
            {"lsn": r[0], "op": r[1], "doc_id": r[2], "n_tok": r[3],
             "source": r[4]}
            for r in rows
        ],
        SCHEMA,
    )


def _boot(tmp_path, lake: str) -> None:
    ev = _ev([(i, "INSERT", f"d{i}", 10 * i + 1, f"s{i % 2}") for i in range(1, 6)])
    p = os.path.join(str(tmp_path), "boot.parquet")
    pq.write_table(ev, p)
    apply_changes(p, lake, num_partitions=4)


# ---- expression language unit behavior ----

def test_eval_expr_kernels():
    t = pa.table(
        {
            "a": pa.array([7, -7, 10, None], pa.int64()),
            "b": pa.array([3, 3, 4, 5], pa.int64()),
            "s": pa.array(["Ab", "cD", None, "ef"]),
        }
    )
    assert eval_expr(t, ["mod", ["col", "a"], 3]).to_pylist() == [1, -1, 1, None]
    assert eval_expr(t, ["div", ["col", "a"], ["col", "b"]]).to_pylist() == [
        2, -2, 2, None,
    ]
    assert eval_expr(
        t, ["if", ["ge", ["col", "a"], 0], ["lit", "pos"], ["lit", "neg"]]
    ).to_pylist() == ["pos", "neg", "pos", None]
    # duckdb/Postgres greatest: nulls ignored, all-null -> null
    assert eval_expr(
        t, ["greatest", ["col", "a"], ["col", "b"]]
    ).to_pylist() == [7, 3, 10, 5]
    assert eval_expr(t, ["lower", ["col", "s"]]).to_pylist() == [
        "ab", "cd", None, "ef",
    ]
    assert eval_expr(
        t, ["concat", ["col", "s"], ["lit", "!"]]
    ).to_pylist() == ["Ab!", "cD!", None, "ef!"]
    assert eval_expr(t, ["substr", ["col", "s"], 0, 1]).to_pylist() == [
        "A", "c", None, "e",
    ]
    assert eval_expr(
        t, ["cast", ["coalesce", ["col", "a"], 0], "int32"]
    ).type == pa.int32()
    assert expr_columns(["add", ["col", "a"], ["mod", ["col", "b"], 2]]) == {
        "a", "b",
    }
    with pytest.raises(ValueError, match="unknown expression op"):
        eval_expr(t, ["frobnicate", 1])
    with pytest.raises(ValueError, match="unknown column"):
        validate_expr(["col", "zz"], t.schema)
    with pytest.raises(ValueError, match="takes 2"):
        eval_expr(t, ["add", 1])


# ---- generated columns end-to-end ----

def test_generated_column_backfill_and_future_applies(tmp_path, tmp_lake):
    _boot(tmp_path, tmp_lake)
    expr = ["mod", ["col", "n_tok"], 7]
    m = add_generated_column(
        tmp_lake, pa.field("tok_bucket", pa.int32()), expr
    )
    assert m.generated == {"tok_bucket": expr}
    t = final_state_table(tmp_lake)
    d = {r["doc_id"]: r for r in t.to_pylist()}
    assert all(d[k]["tok_bucket"] == d[k]["n_tok"] % 7 for k in d)
    # future applies recompute — and OVERWRITE a lying incoming value
    feed = pa.table(
        {
            "lsn": pa.array([100], pa.int64()),
            "op": pa.array(["UPDATE"]),
            "doc_id": pa.array(["d1"]),
            "n_tok": pa.array([23], pa.int32()),
            "source": pa.array(["s9"]),
            "tok_bucket": pa.array([999], pa.int32()),  # lies
        }
    )
    apply_changes(feed, tmp_lake, num_partitions=4)
    t = final_state_table(tmp_lake)
    row = {r["doc_id"]: r for r in t.to_pylist()}["d1"]
    assert row["tok_bucket"] == 23 % 7
    # time travel: the pre-DDL version has no generated column
    assert "tok_bucket" not in final_state_table(
        tmp_lake, version=1
    ).column_names


def test_generated_without_backfill_reads_null_until_update(tmp_path, tmp_lake):
    _boot(tmp_path, tmp_lake)
    add_generated_column(
        tmp_lake, pa.field("flag", pa.string()),
        ["if", ["ge", ["col", "n_tok"], 21], ["lit", "big"], ["lit", "small"]],
        backfill_existing=False,
    )
    t = final_state_table(tmp_lake)
    assert t["flag"].null_count == t.num_rows
    apply_changes(
        _ev([(200, "UPDATE", "d1", 5, "s")]), tmp_lake, num_partitions=4
    )
    d = {r["doc_id"]: r["flag"] for r in final_state_table(tmp_lake).to_pylist()}
    assert d["d1"] == "small" and d["d2"] is None


def test_generated_feeds_constraints_and_drop_guards(tmp_path, tmp_lake):
    _boot(tmp_path, tmp_lake)
    add_generated_column(
        tmp_lake, pa.field("tok_bucket", pa.int32()),
        ["mod", ["col", "n_tok"], 7],
    )
    # a persistent constraint on the GENERATED value gates the apply
    # existing buckets are {11,21,31,41,51} % 7 = {4,0,3,6,2} — never 5
    add_constraint(tmp_lake, "bucket_ne5", [("tok_bucket", "!=", 5)])
    with pytest.raises(ValueError, match="constraint:bucket_ne5"):
        apply_changes(
            _ev([(300, "INSERT", "x", 12, "s")]),  # 12 % 7 = 5
            tmp_lake, num_partitions=4,
        )
    # the referenced base column cannot be dropped under either spec
    with pytest.raises(ValueError, match="referenced by generated"):
        alter_schema(tmp_lake, drop=["n_tok"])
    # dropping the generated column itself removes its spec
    with pytest.raises(ValueError, match="referenced by constraint"):
        alter_schema(tmp_lake, drop=["tok_bucket"])
    from palimpzest_ray.cdc import drop_constraint

    drop_constraint(tmp_lake, "bucket_ne5")
    alter_schema(tmp_lake, drop=["tok_bucket"])
    assert load_latest_manifest(tmp_lake).generated is None


def test_generated_ddl_refusals(tmp_path, tmp_lake):
    _boot(tmp_path, tmp_lake)
    with pytest.raises(ValueError, match="already exists"):
        add_generated_column(
            tmp_lake, pa.field("n_tok", pa.int32()), ["lit", 1]
        )
    with pytest.raises(ValueError, match="unknown column"):
        add_generated_column(
            tmp_lake, pa.field("g", pa.int32()), ["mod", ["col", "zz"], 2]
        )
    add_generated_column(
        tmp_lake, pa.field("g1", pa.int32()), ["mod", ["col", "n_tok"], 2]
    )
    with pytest.raises(ValueError, match="may not reference generated"):
        add_generated_column(
            tmp_lake, pa.field("g2", pa.int32()), ["add", ["col", "g1"], 1]
        )


def test_generated_delete_with_minimal_payload(tmp_path, tmp_lake):
    _boot(tmp_path, tmp_lake)
    add_generated_column(
        tmp_lake, pa.field("tok_bucket", pa.int32()),
        ["mod", ["col", "n_tok"], 7],
    )
    # a DELETE feed not carrying the referenced column still applies
    feed = pa.table(
        {
            "lsn": pa.array([400], pa.int64()),
            "op": pa.array(["DELETE"]),
            "doc_id": pa.array(["d2"]),
        }
    )
    apply_changes(feed, tmp_lake, num_partitions=4)
    assert "d2" not in {
        r["doc_id"] for r in final_state_table(tmp_lake).to_pylist()
    }


def test_creation_time_generated_hidden_partitioning(tmp_path, tmp_lake):
    """generated= at lake creation + partition_key naming the generated
    column — Iceberg hidden partitioning: the feed never carries the
    partition column, routing stays stable across epochs and DELETEs
    (the expr is a pure function of the key)."""
    from palimpzest_ray.cdc import lookup

    spec = {"pfx": ["substr", ["col", "doc_id"], 0, 1]}

    def _feed(rows):
        return pa.Table.from_pylist(
            [
                {"lsn": r[0], "op": r[1], "doc_id": r[2], "n_tok": r[3]}
                for r in rows
            ],
            pa.schema(
                [pa.field("lsn", pa.int64()), pa.field("op", pa.string()),
                 pa.field("doc_id", pa.string()),
                 pa.field("n_tok", pa.int32())]
            ),
        )

    e1 = _feed([(i, "INSERT", f"{i % 4}k{i}", 10 * i) for i in range(1, 21)])
    apply_changes(
        e1, tmp_lake, num_partitions=4, partition_key="pfx", generated=spec
    )
    m = load_latest_manifest(tmp_lake)
    assert m.generated == spec and m.partition_key == "pfx"
    t = final_state_table(tmp_lake)
    assert t["pfx"].to_pylist() == [d[0] for d in t["doc_id"].to_pylist()]
    # epoch 2 through the SAME hidden partitioning: update + delete
    e2 = _feed([(100, "UPDATE", "1k1", 999), (101, "DELETE", "2k2", None)])
    apply_changes(e2, tmp_lake, num_partitions=4, partition_key="pfx")
    d = {r["doc_id"]: r["n_tok"] for r in final_state_table(tmp_lake).to_pylist()}
    assert d["1k1"] == 999 and "2k2" not in d and len(d) == 19
    # point lookups prune by the key as usual
    assert lookup(tmp_lake, ["1k1"])["n_tok"].to_pylist() == [999]
    # re-stating the same specs is fine; different specs are refused
    apply_changes(
        _feed([(102, "UPDATE", "3k3", 7)]), tmp_lake, num_partitions=4,
        partition_key="pfx", generated=spec,
    )
    with pytest.raises(ValueError, match="CREATION-TIME"):
        apply_changes(
            _feed([(103, "UPDATE", "3k3", 8)]), tmp_lake, num_partitions=4,
            partition_key="pfx",
            generated={"pfx": ["substr", ["col", "doc_id"], 1, 1]},
        )
    # untyped-inference refusal: a null literal has no type
    with pytest.raises(ValueError, match="cannot infer"):
        apply_changes(
            e1, str(tmp_path / "lake2"), num_partitions=4,
            generated={"g": ["lit", None]},
        )
