"""Composite (multi-column) record keys for the CDC lake.

The lake's LWW identity is ONE column (`manifest.key`) — everything
downstream (hash routing, per-partition merge, Bloom sidecars, point
lookups, history) keys on it. Real change feeds often carry composite
primary keys, so `apply_changes(key=("a", "b"))` synthesizes a single
string column (:data:`COMPOSITE_KEY_COL`) from the named components
with an INJECTIVE, order-preserving-per-component encoding, and the
lake proceeds keyed on that column — the Hudi ``ComplexKeyGenerator``
idea (public docs: hudi.apache.org key generation) re-done columnar.

Injectivity is over tuples from a FIXED column-type signature (what a
lake guarantees: each component column has one type, and schema
unification refuses int↔string/bool flips). The canonical
stringification deliberately maps int ``0`` and str ``"0"`` to the
same text — those can only meet across DIFFERENT schemas, never
within one lake's key space.

Encoding: each component is stringified canonically (utf8 as-is,
integers in decimal, bool as true/false), then ``\\`` -> ``\\\\`` and
the separator ``\\x1f`` -> ``\\\\x1f`` are escaped, and components are
joined with the (now unambiguous) separator. Injectivity: the only
unescaped separators in the output are component boundaries, and the
escape map is prefix-free, so decode is unique; two distinct tuples
can never collide (tested adversarially in
``tests/test_cdc_composite.py``).

A NULL component yields a NULL key (Arrow null propagation through the
join kernel) — the engine's existing structural gate then rejects it
(or dead-letters it under ``quarantine=True``): a primary-key
component may not be null, same as SQL.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc

#: reserved name of the synthesized key column on composite-key lakes
COMPOSITE_KEY_COL = "_ckey"

#: component separator (ASCII unit separator — never in normal text,
#: and escaped when it is)
KEY_SEP = "\x1f"


def _stringify(col: pa.ChunkedArray | pa.Array, name: str) -> pa.ChunkedArray:
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        s = col
    elif pa.types.is_integer(t) or pa.types.is_boolean(t):
        s = pc.cast(col, pa.string())
    else:
        raise TypeError(
            f"composite key component {name!r} has type {t}; components "
            "must be string, integer, or bool (floats and nested types "
            "are not canonical key material)"
        )
    s = pc.replace_substring(s, pattern="\\", replacement="\\\\")
    return pc.replace_substring(s, pattern=KEY_SEP, replacement="\\" + KEY_SEP)


def composite_key_column(
    batch: pa.Table, key_cols: Sequence[str]
) -> pa.ChunkedArray | pa.Array:
    """Vectorized synthesized key for one batch: escape + join the
    component columns. Null in any component -> null key (the caller's
    null-key gate owns the refusal)."""
    missing = [c for c in key_cols if c not in batch.column_names]
    if missing:
        raise ValueError(
            f"composite key component(s) {missing} missing from change "
            f"batch columns {batch.column_names}"
        )
    parts = [_stringify(batch[c], c) for c in key_cols]
    if len(parts) == 1:  # degenerate but legal
        return parts[0]
    return pc.binary_join_element_wise(
        *parts, KEY_SEP, null_handling="emit_null"
    )


def encode_key_tuple(values: Sequence) -> str:
    """Driver-side scalar twin of :func:`composite_key_column` for
    point lookups: encode one key tuple to its ``_ckey`` string."""
    out = []
    for v in values:
        if v is None:
            raise ValueError("composite key components may not be null")
        if isinstance(v, bool):
            s = "true" if v else "false"
        elif isinstance(v, (int,)):
            s = str(v)
        elif isinstance(v, str):
            s = v
        else:
            raise TypeError(
                f"composite key component {v!r} must be str/int/bool"
            )
        out.append(s.replace("\\", "\\\\").replace(KEY_SEP, "\\" + KEY_SEP))
    return KEY_SEP.join(out)


def encode_key_tuples(tuples: Sequence[Sequence]) -> list[str]:
    return [encode_key_tuple(t) for t in tuples]


def decode_key_string(s: str) -> list[str]:
    """Inverse of :func:`encode_key_tuple` (string components): split
    on unescaped separators and unescape. The escape map is prefix-free
    (``\\`` escapes exactly the next char), so the decomposition is
    unique — the injectivity the encoder's tests prove."""
    out: list[str] = []
    cur: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            cur.append(s[i + 1])
            i += 2
            continue
        if c == KEY_SEP:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    out.append("".join(cur))
    return out
