"""A tiny JSON-serializable columnar expression language.

Delta Lake persists generated-column / CHECK expressions as SQL text in
the table metadata; this lake persists them as nested JSON lists and
evaluates them with pyarrow.compute kernels — no SQL parser, no Python
callables in the manifest, fully vectorized per batch.

Grammar (every expression is a list; scalars are shorthand literals)::

    ["col", name]                    column reference
    ["lit", value]                   literal (int/float/str/bool/None)
    ["add"|"sub"|"mul"|"div"|"mod", a, b]
    ["neg"|"abs", a]
    ["eq"|"ne"|"lt"|"le"|"gt"|"ge", a, b]      (null -> null, Kleene)
    ["and"|"or", a, b]               Kleene logic
    ["not", a]
    ["if", cond, then, else]
    ["coalesce", a, b, ...]
    ["greatest"|"least", a, b, ...]
    ["lower"|"upper"|"length", s]    utf8 kernels
    ["concat", a, b, ...]            string concat (null -> null)
    ["substr", s, start, len]        0-based, vectorized slice
    ["floor"|"ceil", a]
    ["cast", a, "int32"|"int64"|"float32"|"float64"|"string"|"bool"]
    ["is_null", a]                   SQL IS NULL (never null itself)
    ["in", a, [v1, v2, ...]]         SQL IN over a LITERAL list
                                     (null probe -> null, Kleene)
    ["trim", s]                      both-side whitespace trim
    ["starts_with"|"ends_with"|"contains", s, "literal"]

``div`` on integers is integer division and ``mod`` the matching
C-style remainder (sign of the dividend) — duckdb's ``//`` / ``%``
semantics, so SQL oracles restate expressions verbatim.

A bare int/float/str/bool in an operand position is sugar for
``["lit", x]``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_TYPES = {
    "int8": pa.int8(), "int16": pa.int16(), "int32": pa.int32(),
    "int64": pa.int64(), "float32": pa.float32(), "float64": pa.float64(),
    "string": pa.string(), "bool": pa.bool_(),
}

#: every op name, for disambiguating "in"'s literal list from a
#: sub-expression (a string literal list may not START with one)
_ALL_OPS = frozenset(
    "col lit add sub mul div mod neg abs eq ne lt le gt ge and or not "
    "if coalesce greatest least lower upper length concat substr floor "
    "ceil cast is_null in trim starts_with ends_with contains".split()
)

_BINOPS = {
    "add": pc.add, "sub": pc.subtract, "mul": pc.multiply,
    "eq": pc.equal, "ne": pc.not_equal, "lt": pc.less,
    "le": pc.less_equal, "gt": pc.greater, "ge": pc.greater_equal,
    "and": pc.and_kleene, "or": pc.or_kleene,
}


def validate_expr(expr, schema: pa.Schema) -> None:
    """Static check (column existence, arity, known ops) so a bad
    expression is refused at DDL time, not on the first apply."""
    eval_expr(schema.empty_table(), expr)


def expr_columns(expr, out: set | None = None) -> set:
    """Every column name an expression references."""
    out = set() if out is None else out
    if isinstance(expr, list):
        if expr and expr[0] == "col":
            out.add(expr[1])
        else:
            for e in expr[1:]:
                expr_columns(e, out)
    return out


def eval_expr(table: pa.Table, expr):
    """Evaluate over one batch; returns an Array/ChunkedArray (or a
    Scalar for literal-only expressions) of length ``table.num_rows``."""
    if isinstance(expr, (int, float, str, bool)) or expr is None:
        return pa.scalar(expr)
    if not isinstance(expr, (list, tuple)) or not expr:
        raise ValueError(f"malformed expression {expr!r}")
    op, *args = expr
    if op == "col":
        (name,) = args
        if name not in table.column_names:
            raise ValueError(
                f"expression references unknown column {name!r} "
                f"(have {table.column_names})"
            )
        return table[name]
    if op == "lit":
        (v,) = args
        return pa.scalar(v)
    if op == "in":
        # membership against a LITERAL list — SQL `col IN (...)`; the
        # list is data, not a sub-expression, so it is not evaluated
        _arity(op, args, 2)
        vals = args[1]
        if (
            not isinstance(vals, (list, tuple))
            or not vals
            or not all(isinstance(x, (int, float, str, bool)) for x in vals)
            or (isinstance(vals[0], str) and vals[0] in _ALL_OPS)
        ):
            raise ValueError(
                '"in" takes a non-empty literal list as its 2nd operand '
                "(a value list, not a sub-expression; a STRING list whose "
                "first value collides with an op name is not supported)"
            )
        probe = eval_expr(table, args[0])
        mask = pc.is_in(probe, value_set=pa.array(list(vals)))
        if isinstance(probe, pa.Scalar):
            if not probe.is_valid:
                return pa.scalar(None, pa.bool_())
            return mask
        # is_in yields false for nulls; SQL IN yields NULL (Kleene)
        return pc.if_else(
            pc.is_null(probe), pa.scalar(None, pa.bool_()), mask
        )
    a = [eval_expr(table, e) for e in args]
    if op in _BINOPS:
        _arity(op, a, 2)
        return _BINOPS[op](a[0], a[1])
    if op == "div":
        _arity(op, a, 2)
        return pc.divide(a[0], a[1])
    if op == "mod":
        _arity(op, a, 2)
        q = pc.divide(a[0], a[1])  # integer divide truncates toward 0
        if pa.types.is_floating(_type_of(q)):
            q = pc.trunc(q)
        return pc.subtract(a[0], pc.multiply(q, a[1]))
    if op == "neg":
        _arity(op, a, 1)
        return pc.negate(a[0])
    if op == "abs":
        _arity(op, a, 1)
        return pc.abs(a[0])
    if op == "not":
        _arity(op, a, 1)
        return pc.invert(a[0])
    if op == "if":
        _arity(op, a, 3)
        return pc.if_else(a[0], a[1], a[2])
    if op == "coalesce":
        return pc.coalesce(*a)
    if op == "greatest":
        # duckdb/Postgres semantics: nulls ignored, all-null -> null
        return pc.max_element_wise(*a, skip_nulls=True)
    if op == "least":
        return pc.min_element_wise(*a, skip_nulls=True)
    if op == "lower":
        _arity(op, a, 1)
        return pc.utf8_lower(a[0])
    if op == "upper":
        _arity(op, a, 1)
        return pc.utf8_upper(a[0])
    if op == "length":
        _arity(op, a, 1)
        return pc.utf8_length(a[0])
    if op == "concat":
        return pc.binary_join_element_wise(
            *[pc.cast(x, pa.string()) for x in a], "",
            null_handling="emit_null",
        )
    if op == "substr":
        _arity(op, a, 3)
        start, ln = _as_py(a[1], "substr start"), _as_py(a[2], "substr len")
        return pc.utf8_slice_codeunits(a[0], start, start + ln)
    if op == "floor":
        _arity(op, a, 1)
        return pc.floor(a[0])
    if op == "ceil":
        _arity(op, a, 1)
        return pc.ceil(a[0])
    if op == "cast":
        _arity(op, a, 2)
        t = _as_py(a[1], "cast type")
        if t not in _TYPES:
            raise ValueError(f"unknown cast type {t!r} (use {sorted(_TYPES)})")
        return pc.cast(a[0], _TYPES[t])
    if op == "is_null":
        _arity(op, a, 1)
        v = a[0]
        if isinstance(v, pa.Scalar):
            return pa.scalar(not v.is_valid)
        return pc.is_null(v)
    if op == "trim":
        _arity(op, a, 1)
        return pc.utf8_trim_whitespace(a[0])
    if op == "starts_with":
        _arity(op, a, 2)
        return pc.starts_with(a[0], pattern=_as_py(a[1], "starts_with"))
    if op == "ends_with":
        _arity(op, a, 2)
        return pc.ends_with(a[0], pattern=_as_py(a[1], "ends_with"))
    if op == "contains":
        _arity(op, a, 2)
        return pc.match_substring(a[0], pattern=_as_py(a[1], "contains"))
    raise ValueError(f"unknown expression op {op!r}")


def _arity(op: str, args: list, n: int) -> None:
    if len(args) != n:
        raise ValueError(f"{op!r} takes {n} operand(s), got {len(args)}")


def _as_py(v, what: str):
    if isinstance(v, pa.Scalar):
        return v.as_py()
    raise ValueError(f"{what} must be a literal")


def _type_of(v):
    return v.type


class Expr:
    """Marker wrapping a DSL expression for APIs whose plain values
    mean constants (``update_where``'s SET dict): ``{"n_tok":
    Expr(["add", ["col", "n_tok"], 1])}`` increments, ``{"n_tok": 5}``
    assigns."""

    __slots__ = ("expr",)

    def __init__(self, expr):
        self.expr = expr

    def __repr__(self) -> str:  # error messages
        return f"Expr({self.expr!r})"
