"""Persistent table constraints (cdc/engine.py add_constraint /
drop_constraint — the Delta Lake ALTER TABLE ADD CONSTRAINT idea):
stored in the manifest, enforced by EVERY subsequent apply exactly
like caller expectations (fail, or dead-letter under quarantine),
verified against existing live rows at add time, carried through
clone/branch, dropped as a metadata commit with time travel."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import (
    add_constraint,
    apply_changes,
    clone_lake,
    drop_constraint,
    final_state_table,
    read_quarantine,
)
from palimpzest_ray.cdc.manifest import load_latest_manifest, load_manifest

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
    """rows: (lsn, op, doc, n_tok, source)"""
    return pa.Table.from_pylist(
        [
            {"lsn": r[0], "op": r[1], "doc_id": r[2], "n_tok": r[3],
             "source": r[4]}
            for r in rows
        ],
        SCHEMA,
    )


def _boot(tmp_path, lake: str) -> None:
    ev = _ev([(i, "INSERT", f"d{i}", 10 * i + 1, "s0") for i in range(1, 6)])
    p = os.path.join(str(tmp_path), "boot.parquet")
    pq.write_table(ev, p)
    apply_changes(p, lake, num_partitions=4)


def test_constraint_enforced_on_every_apply(tmp_path, tmp_lake):
    _boot(tmp_path, tmp_lake)
    m = add_constraint(tmp_lake, "tok_positive", [("n_tok", ">", 0)])
    assert m.constraints == {"tok_positive": [("n_tok", ">", 0)]}
    # violating apply fails...
    bad = _ev([(100, "UPDATE", "d1", 0, "s1")])
    with pytest.raises(ValueError, match="constraint:tok_positive"):
        apply_changes(bad, tmp_lake, num_partitions=4)
    # ...or dead-letters under quarantine, healthy rows commit
    mixed = _ev(
        [(101, "UPDATE", "d1", -5, "s1"), (102, "UPDATE", "d2", 7, "s1")]
    )
    r = apply_changes(mixed, tmp_lake, num_partitions=4, quarantine=True)
    assert r.rows_quarantined == 1
    q = read_quarantine(tmp_lake)
    assert q["_errors"].to_pylist() == ["constraint:tok_positive"]
    t = final_state_table(tmp_lake)
    d = {r["doc_id"]: r["n_tok"] for r in t.to_pylist()}
    assert d["d1"] == 11 and d["d2"] == 7  # d1 untouched, d2 updated
    # DELETE exemption: a tombstone carries no payload to check
    apply_changes(
        _ev([(103, "DELETE", "d3", None, None)]), tmp_lake, num_partitions=4
    )
    assert "d3" not in {
        r["doc_id"] for r in final_state_table(tmp_lake).to_pylist()
    }


def test_add_constraint_verifies_existing_rows(tmp_path, tmp_lake):
    _boot(tmp_path, tmp_lake)  # n_tok in {11,21,31,41,51}
    with pytest.raises(ValueError, match="violated by 2 existing"):
        add_constraint(tmp_lake, "tok_big", [("n_tok", ">", 21)])
    # verify=False stores it anyway (forward-only enforcement)
    add_constraint(tmp_lake, "tok_big", [("n_tok", ">", 21)], verify=False)
    with pytest.raises(ValueError, match="constraint:tok_big"):
        apply_changes(
            _ev([(200, "INSERT", "d9", 5, "s")]), tmp_lake, num_partitions=4
        )


def test_missing_column_in_feed_counts_as_null_violation(tmp_path, tmp_lake):
    _boot(tmp_path, tmp_lake)
    add_constraint(tmp_lake, "has_source", [("source", "!=", "")])
    narrow = pa.table(
        {
            "lsn": pa.array([300], pa.int64()),
            "op": pa.array(["INSERT"]),
            "doc_id": pa.array(["d9"]),
            "n_tok": pa.array([5], pa.int32()),
        }
    )
    with pytest.raises(ValueError, match="constraint:has_source"):
        apply_changes(narrow, tmp_lake, num_partitions=4)


def test_drop_constraint_and_time_travel(tmp_path, tmp_lake):
    _boot(tmp_path, tmp_lake)
    add_constraint(tmp_lake, "tok_positive", [("n_tok", ">", 0)])
    v_with = load_latest_manifest(tmp_lake).version
    drop_constraint(tmp_lake, "tok_positive")
    m = load_latest_manifest(tmp_lake)
    assert m.constraints is None
    assert load_manifest(tmp_lake, v_with).constraints is not None
    # enforcement gone
    apply_changes(
        _ev([(400, "UPDATE", "d1", -1, "s")]), tmp_lake, num_partitions=4
    )
    with pytest.raises(ValueError, match="no constraint"):
        drop_constraint(tmp_lake, "tok_positive")


def test_constraint_survives_clone_and_refusals(tmp_path, tmp_lake):
    _boot(tmp_path, tmp_lake)
    add_constraint(
        tmp_lake, "src_known", [("source", "in", ["s0", "s1"])]
    )
    dst = str(tmp_path / "clone")
    clone_lake(tmp_lake, dst)
    with pytest.raises(ValueError, match="constraint:src_known"):
        apply_changes(
            _ev([(500, "INSERT", "x", 1, "evil")]), dst, num_partitions=4
        )
    with pytest.raises(ValueError, match="already exists"):
        add_constraint(tmp_lake, "src_known", [("n_tok", ">", 0)])
    with pytest.raises(ValueError, match="not in lake schema"):
        add_constraint(tmp_lake, "c2", [("nope", ">", 0)])
    with pytest.raises(ValueError, match="unknown predicate op"):
        add_constraint(tmp_lake, "c3", [("n_tok", "~", 0)])


def test_expr_constraint_cross_column_check(tmp_path, tmp_lake):
    """CHECK expressions beyond conjuncts: a cross-column disjunction
    gates every apply, verify scans only referenced columns."""
    _boot(tmp_path, tmp_lake)  # n_tok = 10*i + 1, source s0
    # CHECK (n_tok > 5 OR source == 's0'): existing rows satisfy
    expr = ["or", ["gt", ["col", "n_tok"], 5], ["eq", ["col", "source"], "s0"]]
    m = add_constraint(tmp_lake, "chk", expr=expr)
    assert m.constraints == {"chk": {"expr": expr}}
    # violating row: n_tok <= 5 AND source != s0
    with pytest.raises(ValueError, match="constraint:chk"):
        apply_changes(
            _ev([(600, "INSERT", "x", 2, "s9")]), tmp_lake, num_partitions=4
        )
    # satisfying rows pass through both arms of the disjunction
    apply_changes(
        _ev([(601, "INSERT", "y", 2, "s0"), (602, "INSERT", "z", 9, "s9")]),
        tmp_lake, num_partitions=4,
    )
    # verify=True refuses an expr the existing data violates
    with pytest.raises(ValueError, match="violated by"):
        add_constraint(
            tmp_lake, "chk2", expr=["lt", ["col", "n_tok"], 50]
        )
    # the stored expr round-trips through manifest JSON
    from palimpzest_ray.cdc.manifest import load_latest_manifest

    assert load_latest_manifest(tmp_lake).constraints["chk"] == {"expr": expr}


def test_update_where_with_expression_set(tmp_path, tmp_lake):
    from palimpzest_ray.cdc import Expr, update_where

    _boot(tmp_path, tmp_lake)  # n_tok in {11,21,31,41,51}
    update_where(
        tmp_lake, [("n_tok", ">", 25)],
        {"n_tok": Expr(["add", ["col", "n_tok"], 100]),
         "source": Expr(["concat", ["col", "source"], ["lit", "!"]])},
    )
    t = final_state_table(tmp_lake)
    d = {r["doc_id"]: (r["n_tok"], r["source"]) for r in t.to_pylist()}
    assert d["d1"] == (11, "s0") and d["d2"] == (21, "s0")  # untouched
    assert d["d3"] == (131, "s0!") and d["d5"] == (151, "s0!")
    with pytest.raises(ValueError, match="unknown column"):
        update_where(
            tmp_lake, [("n_tok", ">", 0)],
            {"n_tok": Expr(["add", ["col", "zz"], 1])},
        )


def test_expr_constraint_quarantine_reason(tmp_path, tmp_lake):
    """An expression CHECK dead-letters with its constraint:<name>
    reason through the quarantine branch, same as conjunct gates."""
    _boot(tmp_path, tmp_lake)
    add_constraint(
        tmp_lake, "chk",
        expr=["or", ["gt", ["col", "n_tok"], 5],
              ["eq", ["col", "source"], "s0"]],
    )
    mixed = _ev(
        [(700, "INSERT", "bad", 2, "s9"), (701, "INSERT", "good", 9, "s9")]
    )
    r = apply_changes(mixed, tmp_lake, num_partitions=4, quarantine=True)
    assert r.rows_quarantined == 1
    q = read_quarantine(tmp_lake)
    assert q["_errors"].to_pylist() == ["constraint:chk"]
    assert q["doc_id"].to_pylist() == ["bad"]
    live = {r["doc_id"] for r in final_state_table(tmp_lake).to_pylist()}
    assert "good" in live and "bad" not in live
