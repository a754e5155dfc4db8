"""Property-based duckdb-parity check for the expression DSL
(cdc/expr.py): hypothesis generates random expression trees, renders
each one BOTH as a DSL value and as the equivalent duckdb SQL, and
asserts `eval_expr` over an arrow table equals duckdb over the same
table — the exact claim every expression-bearing oracle
(generated columns, CHECK constraints, computed DML) rests on.

Known aligned semantics (asserted here): C-style integer div/mod
(truncation, sign of the dividend), Kleene booleans, null-propagating
comparisons/arithmetic/concat, Postgres greatest/least (nulls
ignored), 0-based DSL substr == 1-based SQL substr. The one
deliberate divergence — CASE WHEN NULL takes the ELSE branch while
pc.if_else(null) yields null — is fenced by generating only
null-coalesced conditions, as the engine's own docs advise."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from palimpzest_ray.cdc.expr import eval_expr

TABLE = pa.table(
    {
        "a": pa.array([7, -7, 0, None, 123, -5, 2, 9], pa.int64()),
        "b": pa.array([3, -3, 5, 4, None, 11, -2, 1], pa.int64()),
        "x": pa.array([0.5, -1.25, 3.0, None, 2.5, 0.0, -0.5, 1.75]),
        "s": pa.array(["Ab", "", None, "héllo", "x\ny", "CAPS", "q", "zz"]),
    }
)


@st.composite
def int_exprs(draw, depth=0):
    """(dsl, sql) pairs of integer-valued expressions."""
    if depth >= 3 or draw(st.booleans()):
        leaf = draw(st.sampled_from(
            [("a", "a"), ("b", "b")] +
            [(n, str(n)) for n in (-4, -1, 0, 2, 7, 100)]
        ))
        if isinstance(leaf[0], str):
            return ["col", leaf[0]], leaf[1]
        return ["lit", leaf[0]], leaf[1]
    op = draw(st.sampled_from(["add", "sub", "mul", "div", "mod",
                               "abs", "neg", "greatest", "least", "if"]))
    ld, ls = draw(int_exprs(depth + 1))
    if op in ("abs", "neg"):
        return [op, ld], (f"abs({ls})" if op == "abs" else f"-({ls})")
    rd_, rs = draw(int_exprs(depth + 1))
    if op in ("div", "mod"):
        # non-zero, non-null denominator: both engines' div/0 behavior
        # is an error path, not a value to compare
        k = draw(st.sampled_from([2, 3, -3, 7]))
        sym = "//" if op == "div" else "%"
        return [op, ld, k], f"(({ls}) {sym} ({k}))"
    if op in ("greatest", "least"):
        return [op, ld, rd_], f"{op}(({ls}), ({rs}))"
    if op == "if":
        cd, cs = draw(bool_exprs(depth + 1))
        return (
            ["if", ["coalesce", cd, False], ld, rd_],
            f"(case when coalesce(({cs}), false) then ({ls}) "
            f"else ({rs}) end)",
        )
    sym = {"add": "+", "sub": "-", "mul": "*"}[op]
    return [op, ld, rd_], f"(({ls}) {sym} ({rs}))"


@st.composite
def bool_exprs(draw, depth=0):
    if depth >= 3:
        ld, ls = draw(int_exprs(3))
        return ["ge", ld, 0], f"(({ls}) >= 0)"
    op = draw(st.sampled_from(["eq", "ne", "lt", "le", "gt", "ge",
                               "and", "or", "not"]))
    if op in ("and", "or"):
        ad, as_ = draw(bool_exprs(depth + 1))
        bd, bs = draw(bool_exprs(depth + 1))
        return [op, ad, bd], f"(({as_}) {op} ({bs}))"
    if op == "not":
        ad, as_ = draw(bool_exprs(depth + 1))
        return ["not", ad], f"(not ({as_}))"
    ld, ls = draw(int_exprs(depth + 1))
    rd_, rs = draw(int_exprs(depth + 1))
    sym = {"eq": "=", "ne": "!=", "lt": "<", "le": "<=",
           "gt": ">", "ge": ">="}[op]
    return [op, ld, rd_], f"(({ls}) {sym} ({rs}))"


@st.composite
def str_exprs(draw, depth=0):
    if depth >= 2 or draw(st.booleans()):
        leaf = draw(st.sampled_from(
            [("col", "s", "s"), ("lit", "A!", "'A!'"), ("lit", "", "''")]
        ))
        return list(leaf[:2]), leaf[2]
    op = draw(st.sampled_from(["lower", "upper", "concat", "substr"]))
    ld, ls = draw(str_exprs(depth + 1))
    if op in ("lower", "upper"):
        return [op, ld], f"{op}({ls})"
    if op == "substr":
        start = draw(st.integers(0, 3))
        ln = draw(st.integers(0, 4))
        return (
            ["substr", ld, start, ln],
            f"substr(({ls}), {start + 1}, {ln})",
        )
    rd_, rs = draw(str_exprs(depth + 1))
    return ["concat", ld, rd_], f"(({ls}) || ({rs}))"


def _compare(dsl, sql):
    got = eval_expr(TABLE, dsl)
    got = (
        pd.Series([got.as_py()] * TABLE.num_rows)
        if isinstance(got, pa.Scalar)
        else got.to_pandas()
    )
    con = duckdb.connect()
    con.register("t", TABLE)
    want = con.execute(f"select {sql} as v from t").df()["v"]
    con.close()
    g = got.tolist()
    w = want.tolist()
    norm = lambda v: (  # noqa: E731 — unify NaN/None and int/float reps
        None
        if v is None or (isinstance(v, float) and v != v)
        else (float(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else v)
    )
    assert [norm(v) for v in g] == [norm(v) for v in w], (dsl, sql, g, w)


@given(int_exprs())
@settings(max_examples=200, deadline=None)
def test_int_expr_matches_duckdb(pair):
    _compare(*pair)


@given(bool_exprs())
@settings(max_examples=150, deadline=None)
def test_bool_expr_matches_duckdb(pair):
    _compare(*pair)


@given(str_exprs())
@settings(max_examples=150, deadline=None)
def test_str_expr_matches_duckdb(pair):
    _compare(*pair)


def test_length_and_cast_match_duckdb():
    _compare(["length", ["col", "s"]], "length(s)")
    _compare(
        ["cast", ["col", "a"], "string"], "cast(a as varchar)"
    )
    _compare(["floor", ["col", "x"]], "floor(x)")
    _compare(["ceil", ["col", "x"]], "ceil(x)")
    _compare(["coalesce", ["col", "a"], ["col", "b"]], "coalesce(a, b)")


def test_new_ops_duckdb_parity():
    """Targeted duckdb parity for the predicate extensions: is_null,
    IN over a literal list (Kleene null probe), trim, starts_with /
    ends_with / contains — the ops NOT NULL and membership CHECK
    constraints are written with."""
    import duckdb

    from palimpzest_ray.cdc.expr import eval_expr

    t = pa.table(
        {
            "s": pa.array(["  ab ", "xy", None, "abz", ""]),
            "n": pa.array([1, 5, None, 7, 2], pa.int64()),
        }
    )
    con = duckdb.connect()
    con.register("t", t)

    cases = [
        (["is_null", ["col", "n"]], "n is null"),
        (["not", ["is_null", ["col", "s"]]], "s is not null"),
        (["in", ["col", "n"], [1, 7, 9]], "n in (1, 7, 9)"),
        (["trim", ["col", "s"]], "trim(s)"),
        (["starts_with", ["col", "s"], "ab"], "starts_with(s, 'ab')"),
        (["ends_with", ["col", "s"], "z"], "s like '%z'"),
        (["contains", ["col", "s"], "b"], "contains(s, 'b')"),
    ]
    for expr, sql in cases:
        got = eval_expr(t, expr)
        want = con.execute(f"select {sql} from t").fetchall()
        got_py = (
            got.to_pylist()
            if not isinstance(got, pa.Scalar)
            else [got.as_py()] * t.num_rows
        )
        assert got_py == [r[0] for r in want], (expr, sql, got_py, want)

    # literal-list enforcement: a sub-expression is refused
    import pytest as _pytest

    with _pytest.raises(ValueError, match="literal list"):
        eval_expr(t, ["in", ["col", "n"], ["col", "n"]])
    with _pytest.raises(ValueError, match="literal list"):
        eval_expr(t, ["in", ["col", "n"], []])


def test_not_null_check_constraint_end_to_end(tmp_path, ray_session):
    """The gap the extension closes: a persistent NOT NULL CHECK."""
    import pyarrow.parquet as pq

    from palimpzest_ray.cdc import add_constraint, apply_changes

    lake = str(tmp_path / "lake")
    boot = pa.table(
        {
            "lsn": pa.array([1, 2], pa.int64()),
            "op": pa.array(["INSERT", "INSERT"]),
            "doc_id": pa.array(["a", "b"]),
            "label": pa.array(["x", "y"]),
        }
    )
    apply_changes(boot, lake, num_partitions=2)
    add_constraint(
        lake, "label_not_null",
        expr=["not", ["is_null", ["col", "label"]]],
    )
    bad = pa.table(
        {
            "lsn": pa.array([9], pa.int64()),
            "op": pa.array(["UPDATE"]),
            "doc_id": pa.array(["a"]),
            "label": pa.nulls(1, pa.string()),
        }
    )
    p = str(tmp_path / "bad.parquet")
    pq.write_table(bad, p)
    with _raises_constraint():
        apply_changes(p, lake)


def _raises_constraint():
    import pytest as _pytest

    return _pytest.raises(ValueError, match="label_not_null")
