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
