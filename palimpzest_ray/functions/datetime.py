"""Vectorized date/time functions (SQL-semantics wrappers over
``pyarrow.compute`` temporal kernels).

Companion to :mod:`palimpzest_ray.functions.strings` — the reference
has no scalar-function layer at all (SURVEY.md §2.3); these are the
columnar date kernels a lake pipeline needs (partitioning by day/month,
windowing by epoch, retention math). All functions take and return
``pa.Array | pa.ChunkedArray``; duckdb-parity choices are noted where
conventions differ (day-of-week numbering, trunc output type).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_TRUNC_UNITS = {
    "second",
    "minute",
    "hour",
    "day",
    "week",
    "month",
    "quarter",
    "year",
}


def year(a):
    return pc.cast(pc.year(a), pa.int64())


def month(a):
    return pc.cast(pc.month(a), pa.int64())


def day(a):
    return pc.cast(pc.day(a), pa.int64())


def hour(a):
    return pc.cast(pc.hour(a), pa.int64())


def minute(a):
    return pc.cast(pc.minute(a), pa.int64())


def second(a):
    return pc.cast(pc.second(a), pa.int64())


def day_of_year(a):
    return pc.cast(pc.day_of_year(a), pa.int64())


def day_of_week(a):
    """duckdb ``dayofweek`` numbering: Sunday=0 .. Saturday=6."""
    return pc.cast(
        pc.day_of_week(a, count_from_zero=True, week_start=7), pa.int64()
    )


def iso_day_of_week(a):
    """ISO numbering: Monday=1 .. Sunday=7 (duckdb ``isodow``)."""
    return pc.cast(
        pc.day_of_week(a, count_from_zero=False, week_start=1), pa.int64()
    )


def week_of_year(a):
    return pc.cast(pc.iso_week(a), pa.int64())


def quarter(a):
    return pc.cast(pc.quarter(a), pa.int64())


def date_trunc(a, unit: str):
    """SQL ``date_trunc(unit, ts)`` — floor to the unit boundary; output
    stays a timestamp (duckdb parity; 'week' floors to Monday)."""
    if unit not in _TRUNC_UNITS:
        raise ValueError(f"unit must be one of {sorted(_TRUNC_UNITS)}")
    if unit == "week":
        return pc.floor_temporal(a, unit="week", week_starts_monday=True)
    return pc.floor_temporal(a, unit=unit)


def epoch_seconds(a):
    """Seconds since the Unix epoch as int64 (duckdb ``epoch(ts)``,
    truncated toward negative infinity for sub-second timestamps)."""
    us = pc.cast(pc.cast(a, pa.timestamp("us")), pa.int64())
    return pc.floor(pc.divide(pc.cast(us, pa.float64()), 1_000_000.0)).cast(
        pa.int64()
    )


def to_date(a):
    """Truncate a timestamp to a ``date32``."""
    return pc.cast(a, pa.date32())


def strftime(a, fmt: str = "%Y-%m-%d %H:%M:%S"):
    return pc.strftime(a, format=fmt)


def strptime(a, fmt: str = "%Y-%m-%d", unit: str = "us"):
    """Parse strings to timestamps; unparseable rows raise (pass
    ``error_is_null=True`` semantics via :func:`try_strptime`)."""
    return pc.strptime(a, format=fmt, unit=unit)


def try_strptime(a, fmt: str = "%Y-%m-%d", unit: str = "us"):
    """Like :func:`strptime` but unparseable rows become null (duckdb
    ``try_strptime``)."""
    return pc.strptime(a, format=fmt, unit=unit, error_is_null=True)


def date_add_days(a, days: int):
    """Shift a timestamp/date by whole days (negative = past)."""
    unit_type = a.type
    if pa.types.is_date(unit_type):
        return pc.cast(
            pc.add(pc.cast(a, pa.int32()), pa.scalar(days, pa.int32())),
            unit_type,
        )
    step = pa.scalar(days * 86_400_000_000, pa.duration("us"))
    return pc.add(pc.cast(a, pa.timestamp("us")), step)


def date_diff_days(a, b):
    """Whole-day difference ``b - a`` (duckdb ``datediff('day', a, b)``
    counts day-boundary crossings, so both sides are floored to days
    first)."""
    da = pc.cast(pc.cast(a, pa.date32()), pa.int32())
    db = pc.cast(pc.cast(b, pa.date32()), pa.int32())
    return pc.cast(pc.subtract(db, da), pa.int64())
