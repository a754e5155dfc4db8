"""Vectorized math functions (SQL-semantics wrappers over
``pyarrow.compute``).

Same catalog idea as :mod:`palimpzest_ray.functions.strings` — the
reference has no scalar layer (SURVEY.md §2.3 "Scalar functions"; all
row math there is a Python UDF, e.g. the hand-rolled mean parse loop in
``aggregate.py:192-268``). Each function takes and returns
``pa.Array | pa.ChunkedArray`` and matches duckdb/ANSI SQL semantics
where pyarrow's defaults diverge:

- ``round``: SQL rounds half AWAY from zero; pyarrow defaults to
  banker's rounding — we pass ``half_towards_infinity``.
- ``mod``: SQL ``%`` is the truncated-division remainder (sign follows
  the dividend), which is what Arrow integer division composes to.
- ``sign``: duckdb returns an integer; we keep Arrow's same-dtype
  result and let callers cast (the contract queries do).

Null propagation everywhere (Arrow kernel semantics == SQL).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def abs_(a):
    return pc.abs(a)


def round_(a, ndigits: int = 0):
    """SQL ``round()``: half away from zero."""
    return pc.round(a, ndigits, round_mode="half_towards_infinity")


def ceil(a):
    return pc.ceil(a)


def floor(a):
    return pc.floor(a)


def trunc(a):
    return pc.trunc(a)


def sqrt(a):
    return pc.sqrt(a)


def ln(a):
    return pc.ln(a)


def log10(a):
    return pc.log10(a)


def log2(a):
    return pc.log2(a)


def exp(a):
    return pc.exp(a)


def power(a, b):
    return pc.power(a, b)


def sign(a):
    """Sign in the input dtype (cast to int to match duckdb's integer)."""
    return pc.sign(a)


def mod(a, b):
    """Truncated-division remainder — SQL ``a % b`` (sign of dividend).

    Arrow integer ``divide`` already truncates toward zero, so
    ``a - (a // b) * b`` is exactly the C-style remainder duckdb uses.
    Floats go through ``trunc(a / b)``.
    """
    a = pa.array(a) if not isinstance(a, (pa.Array, pa.ChunkedArray)) else a
    # SQL: x % 0 is NULL (duckdb), never a divide-by-zero error
    if isinstance(b, (pa.Array, pa.ChunkedArray)):
        b = pc.if_else(pc.equal(b, 0), pa.scalar(None, b.type), b)
    else:
        bv = b.as_py() if isinstance(b, pa.Scalar) else b
        if bv == 0:
            return pa.nulls(len(a), a.type)
    if pa.types.is_floating(a.type):
        q = pc.trunc(pc.divide(a, b))
    else:
        q = pc.divide(a, b)
    return pc.subtract(a, pc.multiply(q, b))


def greatest(*arrays):
    """Row-wise max of N columns. duckdb/Postgres ``greatest`` skips
    nulls (null only when ALL args are null) — so do we."""
    return pc.max_element_wise(*arrays, skip_nulls=True)


def least(*arrays):
    return pc.min_element_wise(*arrays, skip_nulls=True)


def sin(a):
    return pc.sin(a)


def cos(a):
    return pc.cos(a)


def tan(a):
    return pc.tan(a)


def atan2(y, x):
    return pc.atan2(y, x)


def clamp(a, lo, hi):
    """``least(greatest(a, lo), hi)`` — the banding idiom."""
    return pc.min_element_wise(pc.max_element_wise(a, lo), hi)
