"""Vectorized string functions (SQL-semantics wrappers over
``pyarrow.compute``).

The reference has NO scalar-function library — every row-level
computation there is a Python UDF or an LLM call (SURVEY.md §2.3,
"Scalar functions"). This catalog is the columnar replacement: each
function takes and returns ``pa.Array | pa.ChunkedArray`` (zero-copy
where the kernel allows) and is meant to be composed inside
``Dataset.with_column`` / ``map_batches``. Semantics match duckdb/ANSI
SQL where the two could diverge (1-based ``substr``; ``split_part``
returning '' out of range; null propagation everywhere).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc



def upper(a):
    return pc.utf8_upper(a)


def lower(a):
    return pc.utf8_lower(a)


def length(a):
    """Character (not byte) length, as SQL ``length()``."""
    return pc.utf8_length(a)


def reverse(a):
    return pc.utf8_reverse(a)


def capitalize(a):
    return pc.utf8_capitalize(a)


def trim(a, chars: str | None = None):
    return pc.utf8_trim(a, chars) if chars else pc.utf8_trim_whitespace(a)


def ltrim(a, chars: str | None = None):
    return pc.utf8_ltrim(a, chars) if chars else pc.utf8_ltrim_whitespace(a)


def rtrim(a, chars: str | None = None):
    return pc.utf8_rtrim(a, chars) if chars else pc.utf8_rtrim_whitespace(a)


def lpad(a, width: int, fill: str = " "):
    return pc.utf8_lpad(a, width, padding=fill)


def rpad(a, width: int, fill: str = " "):
    return pc.utf8_rpad(a, width, padding=fill)


def substr(a, start: int, length: int | None = None):
    """SQL ``substr``: 1-based ``start`` (negative counts from the end,
    duckdb-style), optional length.

    duckdb edge semantics, all matched (probed against duckdb 1.x):
    a negative ``length`` swaps the window (``substr('abcdef',2,-1)`` =
    'a'); ``start=0`` consumes one unit of length before position 1;
    a from-the-end window that crosses the string end is truncated
    ('def' for ``substr('abcdef',-3,5)``), and one that stays wholly
    before position 1 is '' (``substr('abcdef',-10,3)``)."""
    if length is None:
        off = start - 1 if start > 0 else start
        return pc.utf8_slice_codeunits(a, off)
    if length < 0:  # duckdb: negative length walks backwards from start
        start, length = start + length, -length
    if start > 0:
        off = start - 1
        return pc.utf8_slice_codeunits(a, off, off + length)
    if start == 0:  # position 0 doesn't exist; it still consumes length
        return pc.utf8_slice_codeunits(a, 0, max(length - 1, 0))
    # start < 0: python-style from-the-end slice reproduces duckdb's
    # clamping ([start:start+length) when the stop is still from-the-end,
    # [start:] when the window runs past the end of the string)
    if start + length < 0:
        return pc.utf8_slice_codeunits(a, start, start + length)
    return pc.utf8_slice_codeunits(a, start)


def replace(a, pattern: str, replacement: str):
    """Literal (non-regex) replace, as SQL ``replace()``."""
    return pc.replace_substring(a, pattern=pattern, replacement=replacement)


def regexp_replace(a, pattern: str, replacement: str):
    return pc.replace_substring_regex(a, pattern=pattern, replacement=replacement)


def _name_groups(pattern: str) -> str:
    """Rewrite unnamed capturing groups ``(`` to named ``(?P<gN>`` —
    ``pc.extract_regex`` only accepts named groups."""
    out, i, n, g = [], 0, len(pattern), 0
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            out.append(pattern[i : i + 2])
            i += 2
            continue
        if c == "(" and not pattern.startswith("(?", i):
            g += 1
            out.append(f"(?P<g{g}>")
        else:
            out.append(c)
        i += 1
    return "".join(out)


def regexp_extract(a, pattern: str, group: int = 1):
    """First match of capture ``group`` (0 = whole match); null rows stay
    null, non-matching rows yield ``''`` (duckdb ``regexp_extract``
    parity). Character classes containing ``(`` are not supported by
    the group-naming rewrite."""
    if group == 0:
        pattern = f"({pattern})"
        group = 1
    st = pc.extract_regex(a, pattern=_name_groups(pattern))
    if isinstance(st, pa.ChunkedArray):
        st = st.combine_chunks()
    # struct.field() exposes undefined child values at null (non-match)
    # slots — mask explicitly: non-match -> '', null input -> null
    vals = pc.if_else(pc.is_valid(st), st.field(f"g{group}"), pa.scalar("", pa.string()))
    return pc.if_else(pc.is_valid(a), vals, pa.scalar(None, pa.string()))


def contains(a, pattern: str, *, regex: bool = False):
    if regex:
        return pc.match_substring_regex(a, pattern)
    return pc.match_substring(a, pattern)


def starts_with(a, prefix: str):
    return pc.starts_with(a, prefix)


def ends_with(a, suffix: str):
    return pc.ends_with(a, suffix)


def split_part(a, delimiter: str, index: int):
    """SQL ``split_part``: 1-based ``index``; out-of-range yields ''
    (duckdb parity), null input stays null.

    Out-of-range safety without a row loop: append ``index`` copies of
    the delimiter before splitting, so every row has at least ``index``
    (possibly empty) parts and ``list_element`` never raises; in-range
    parts are unaffected."""
    if index < 1:
        raise ValueError("split_part index is 1-based")
    padded = pc.binary_join_element_wise(
        a, delimiter * index, "", null_handling="emit_null"
    )
    parts = pc.split_pattern(padded, pattern=delimiter)
    return pc.list_element(parts, index - 1)


def concat(*arrays, sep: str = ""):
    """Element-wise concatenation; null in any input nulls the row (SQL
    ``||``). Accepts arrays and Python string literals mixed."""
    return pc.binary_join_element_wise(
        *arrays, sep, null_handling="emit_null"
    )


def concat_ws(sep: str, *arrays):
    """``concat_ws``: null inputs are skipped, not propagated (duckdb
    parity: all-null rows yield ``''``).

    NOT ``binary_join_element_wise(null_handling="skip")`` — that kernel
    *removes* rows whose every input is null (observed on pyarrow 17–21:
    output shorter than input), which silently misaligns columns.
    Instead a vectorized fold: two kernels per argument."""
    lens = [len(a) for a in arrays if not isinstance(a, str)]
    if not lens:
        raise ValueError(
            "concat_ws needs at least one array argument (all-literal "
            "concatenation has no row count to broadcast to)"
        )
    n = lens[0]
    result = None
    started = None
    for a in arrays:
        if isinstance(a, str):
            a = pa.array([a] * n, pa.string())
        elif pa.types.is_null(a.type):  # all-null untyped array
            a = a.cast(pa.string())
        present = pc.is_valid(a)
        filled = pc.fill_null(a, "")
        if result is None:
            result = filled
            started = present
            continue
        joined = pc.binary_join_element_wise(
            result, filled, sep, null_handling="emit_null"
        )
        result = pc.if_else(present, pc.if_else(started, joined, filled), result)
        started = pc.or_(started, present)
    return result


def like(a, pattern: str):
    """SQL ``LIKE`` (case-sensitive; ``%``/``_`` wildcards)."""
    return pc.match_like(a, pattern)


def ilike(a, pattern: str):
    """SQL ``ILIKE`` — case-insensitive LIKE."""
    return pc.match_like(a, pattern, ignore_case=True)


def regexp_matches(a, pattern: str):
    """duckdb ``regexp_matches``: True where the pattern matches
    anywhere in the string (RE2-style search, not full-match)."""
    return pc.match_substring_regex(a, pattern)
