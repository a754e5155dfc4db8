"""Data profiling: one ``describe``-style summary table per column set
(Spark ``DataFrame.describe`` / Deequ-profile parity — absent in the
reference, which has no column statistics surface at all).

``profile_table`` emits one row per column with exact counts/extremes
plus a mergeable approximate distinct count:

- counts, min/max, sum come from ONE global combined-aggregate pass
  (the engine's map-side-partial + tiny final reduce);
- numeric extremes/sums are integer-scaled (``*100`` cents convention)
  so the driver oracle compares bit-stably across engines; string
  extremes stay strings in their own columns;
- ``approx_distinct`` is the HyperLogLog register sketch
  (``sketches.hll_sketch``) — with ``hash_fn="duckdb"`` the SQL oracle
  rebuilds the registers from ``hash(col)`` verbatim, so even the
  approximation is exactly checkable (the d10/d16 tactic).

At 100 TB this is the profile you run after every ingest epoch: one
streaming pass for the aggregates + one pruned single-column pass per
HLL sketch, no shuffle wider than blocks × columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from palimpzest_ray.stages.sketches import hll_estimate_int, hll_sketch


def _is_numeric(t: pa.DataType) -> bool:
    return (
        pa.types.is_integer(t)
        or pa.types.is_floating(t)
        or pa.types.is_decimal(t)
    )


def profile_table(
    ds: rd.Dataset,
    cols: list[str],
    *,
    p: int = 6,
    hash_fn: str = "stable",
    scale: int = 100,
) -> pa.Table:
    """One row per column:
    ``(column, n_rows, n_nonnull, min_c / max_c / sum_c`` (int-scaled,
    numeric columns), ``min_str / max_str`` (string columns),
    ``approx_distinct)``. Unsupported column types raise."""
    from ray.data.aggregate import Count, Max, Min, Sum

    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    for c in cols:
        if c not in types:
            raise ValueError(f"unknown column {c!r}")
        if not (_is_numeric(types[c]) or pa.types.is_string(types[c])):
            raise ValueError(
                f"profile_table supports numeric/string columns, "
                f"{c!r} is {types[c]}"
            )

    aggs = [Count(alias_name="__n")]
    for c in cols:
        aggs.append(Count(c, ignore_nulls=True, alias_name=f"__nn_{c}"))
        aggs.append(Min(c, alias_name=f"__min_{c}"))
        aggs.append(Max(c, alias_name=f"__max_{c}"))
        if _is_numeric(types[c]):
            aggs.append(Sum(c, alias_name=f"__sum_{c}"))
    row = ds.aggregate(*aggs)

    def _c(v):
        return (
            None if v is None else int(np.floor(float(v) * scale + 0.5))
        )

    out = {
        "column": [], "n_rows": [], "n_nonnull": [],
        "min_c": [], "max_c": [], "sum_c": [],
        "min_str": [], "max_str": [], "approx_distinct": [],
    }
    for c in cols:
        num = _is_numeric(types[c])
        # the duckdb-reproducible hash (exact oracles) is integer-only;
        # non-integer columns report a null approx under that mode
        if hash_fn == "duckdb" and not pa.types.is_integer(types[c]):
            regs = None
        else:
            regs = hll_sketch(ds, c, p=p, hash_fn=hash_fn)
        out["column"].append(c)
        out["n_rows"].append(int(row["__n"]))
        out["n_nonnull"].append(int(row[f"__nn_{c}"]))
        out["min_c"].append(_c(row[f"__min_{c}"]) if num else None)
        out["max_c"].append(_c(row[f"__max_{c}"]) if num else None)
        out["sum_c"].append(_c(row[f"__sum_{c}"]) if num else None)
        out["min_str"].append(None if num else row[f"__min_{c}"])
        out["max_str"].append(None if num else row[f"__max_{c}"])
        out["approx_distinct"].append(
            None if regs is None else hll_estimate_int(regs)
        )
    return pa.table(
        {
            "column": pa.array(out["column"], pa.string()),
            "n_rows": pa.array(out["n_rows"], pa.int64()),
            "n_nonnull": pa.array(out["n_nonnull"], pa.int64()),
            "min_c": pa.array(out["min_c"], pa.int64()),
            "max_c": pa.array(out["max_c"], pa.int64()),
            "sum_c": pa.array(out["sum_c"], pa.int64()),
            "min_str": pa.array(out["min_str"], pa.string()),
            "max_str": pa.array(out["max_str"], pa.string()),
            "approx_distinct": pa.array(
                out["approx_distinct"], pa.int64()
            ),
        }
    )


def profile_sql(
    table: str,
    kinds: dict[str, str],
    *,
    p: int = 6,
    scale: int = 100,
) -> str:
    """DuckDB restatement of :func:`profile_table` for oracles —
    requires the engine side to run ``hash_fn="duckdb"``. ``kinds``
    maps each column to ``"int" | "float" | "str"`` (approx_distinct
    is null for non-integer columns under the duckdb hash, mirroring
    the engine)."""
    from palimpzest_ray.stages.sketches import hll_oracle_sql

    parts = []
    for c, kind in kinds.items():
        if kind in ("int", "float"):
            mn = f"cast(floor(min({c}) * {scale} + 0.5) as bigint)"
            mx = f"cast(floor(max({c}) * {scale} + 0.5) as bigint)"
            sm = f"cast(floor(sum({c}) * {scale} + 0.5) as bigint)"
            ms, xs = "cast(null as varchar)", "cast(null as varchar)"
        else:
            mn, mx, sm = (
                "cast(null as bigint)", "cast(null as bigint)",
                "cast(null as bigint)",
            )
            ms, xs = f"min({c})", f"max({c})"
        if kind == "int":
            hll = hll_oracle_sql(table, c, p=p, out="ad")
            ad = f'(select "ad" from ({hll}))'
        else:
            ad = "cast(null as bigint)"
        parts.append(
            f"""select '{c}' as "column", count(*) as n_rows,
                count({c}) as n_nonnull,
                {mn} as min_c, {mx} as max_c, {sm} as sum_c,
                {ms} as min_str, {xs} as max_str,
                {ad} as approx_distinct
                from {table}"""
        )
    return " union all ".join(parts)


__all__ = ["profile_table", "profile_sql"]
