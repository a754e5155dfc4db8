"""Storage-partitioned join: join two co-partitioned lakes with ZERO
exchange.

Both lakes hash-route rows by ``stable_bucket(key) % P`` (the same
seeded hash engine-wide), so when one lake's partition count divides
the other's, every join key pair is already CO-LOCATED: fine partition
``j`` can only match coarse partition ``j % P_coarse``, because
``h % Pc == (h % Pf) % Pc`` whenever ``Pc | Pf``. The join is then one
independent task per fine partition — each task reads exactly two
partition chains, LWW-resolves them, and hash-joins locally. No
``groupby``, no repartition, no driver materialization: at 100 TB this
is the difference between an all-to-all shuffle of both tables and a
metadata-planned map stage (Spark's storage-partitioned join / Iceberg
bucket-join shape, stated here in Ray Data terms).

Outer joins stay globally correct without duplication: each coarse-side
row belongs to exactly ONE fine bucket (its ``hash % P_fine``), and the
task for that bucket filters the coarse partition down to exactly those
rows — so a coarse row is seen by exactly one task, and an unmatched
row surfaces exactly once.

Cost shape: with ``P_left == P_right`` every file is read once. With
``Pc | Pf`` the coarse side's chains are read ``Pf / Pc`` times (each
read pruned by the parquet key filter); when that fan-out is too high,
``repartition_lake`` one side to align first.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from palimpzest_ray.schemas import LSN_COL, TOMBSTONE_COL, conform

_JOIN_TYPES = {
    "inner": "inner",
    "left": "left outer",
    "right": "right outer",
    "outer": "full outer",
}


def _live_partition(
    lake_root: str,
    chain: list[str] | None,
    key: str,
    schema: pa.Schema,
    columns: list[str] | None,
    renames: dict | None = None,
) -> pa.Table:
    """One partition's LIVE rows (chain LWW-resolved, tombstones
    dropped), pruned to ``columns`` (+key)."""
    from palimpzest_ray.cdc.engine import _read_chain, _resolve_chain

    want = (
        None
        if columns is None
        else list(dict.fromkeys([key] + columns + [LSN_COL, TOMBSTONE_COL]))
    )
    out_schema = pa.schema(
        [f for f in schema
         if (want is None or f.name in want)
         and f.name not in (LSN_COL, TOMBSTONE_COL)]
    )
    if not chain:
        return out_schema.empty_table()
    resolve_schema = pa.schema(
        [f for f in schema if want is None or f.name in want]
    )
    r = _resolve_chain(
        _read_chain(chain, columns=want, renames=renames), key, resolve_schema
    )
    if TOMBSTONE_COL in r.column_names:
        r = r.filter(pc.invert(pc.coalesce(r[TOMBSTONE_COL], pa.scalar(False))))
    return conform(r, out_schema)


def _nested_safe_join(
    lt: pa.Table,
    rt: pa.Table,
    kl: str,
    kr: str,
    join_type: str,
    right_suffix: str,
) -> pa.Table:
    """Hash-join that tolerates nested payload columns (token arrays,
    structs), which acero's join kernel rejects: join the NARROW
    columns plus per-side row indices, then reattach each nested
    column with one ``take`` (null join indices yield nulls — exactly
    outer-join semantics). The wide payload moves once, post-join."""
    heavy_l = [
        c for c in lt.column_names
        if c != kl and pa.types.is_nested(lt.schema.field(c).type)
    ]
    heavy_r = [
        c for c in rt.column_names
        if c != kr and pa.types.is_nested(rt.schema.field(c).type)
    ]
    if not heavy_l and not heavy_r:
        return lt.join(
            rt, keys=[kl], right_keys=[kr], join_type=join_type,
            right_suffix=right_suffix,
        )
    ln = lt.drop_columns(heavy_l).append_column(
        "__li", pa.array(np.arange(lt.num_rows, dtype=np.int64))
    )
    rn = rt.drop_columns(heavy_r).append_column(
        "__ri", pa.array(np.arange(rt.num_rows, dtype=np.int64))
    )
    out = ln.join(
        rn, keys=[kl], right_keys=[kr], join_type=join_type,
        right_suffix=right_suffix,
    )
    li = out["__li"].combine_chunks()
    ri = out["__ri"].combine_chunks()
    taken_names = set(out.column_names)
    for c in heavy_l:
        out = out.append_column(c, lt[c].combine_chunks().take(li))
    for c in heavy_r:
        name = c + right_suffix if c in lt.column_names else c
        assert name not in taken_names
        out = out.append_column(name, rt[c].combine_chunks().take(ri))
    out = out.drop_columns(["__li", "__ri"])
    # restore the acero column order: left columns, then right non-keys
    left_order = [c for c in lt.column_names]
    right_order = [
        (c + right_suffix if c in lt.column_names else c)
        for c in rt.column_names
        if c != kr
    ]
    return out.select(
        [c for c in left_order + right_order if c in out.column_names]
    )


def join_lakes(
    left_root: str,
    right_root: str,
    *,
    how: str = "inner",
    columns_left: list[str] | None = None,
    columns_right: list[str] | None = None,
    right_suffix: str = "_right",
    version_left: int | None = None,
    version_right: int | None = None,
) -> rd.Dataset:
    """Equi-join two lakes on their routing keys without a shuffle.

    Joins ``left.key == right.key`` (each lake's partition/routing
    column). Requires co-partitioning: one partition count must divide
    the other and the key types must match — otherwise this raises with
    the ``repartition_lake`` remedy, because silently falling back to a
    shuffle would hide an asymptotic regression.

    ``how`` ∈ {inner, left, right, outer} (SQL semantics; live rows
    only — tombstoned keys join as absent). Returns a streaming Dataset
    of one map task per fine partition.
    """
    from palimpzest_ray.cdc.engine import load_latest_manifest
    from palimpzest_ray.cdc.manifest import load_manifest
    from palimpzest_ray.functions.tokens import stable_bucket

    if how not in _JOIN_TYPES:
        raise ValueError(f"how={how!r} not in {sorted(_JOIN_TYPES)}")

    def _load(root, version):
        m = (
            load_manifest(root, version)
            if version is not None
            else load_latest_manifest(root)
        )
        if m is None:
            raise FileNotFoundError(f"no committed lake version under {root}")
        return m

    ml, mr = _load(left_root, version_left), _load(right_root, version_right)
    kl, kr = ml.partition_key or ml.key, mr.partition_key or mr.key
    tl = ml.schema.field(kl).type
    tr = mr.schema.field(kr).type
    if tl != tr:
        raise ValueError(
            f"routing key types differ ({kl}:{tl} vs {kr}:{tr}); their hash "
            "spaces are unrelated, so the lakes are not co-partitioned"
        )
    pl, pr = ml.num_partitions, mr.num_partitions
    if pl % pr and pr % pl:
        raise ValueError(
            f"partition counts {pl} and {pr} are not divisible either way; "
            "co-partitioning needs Pc | Pf — repartition_lake one side "
            "(e.g. to the other's count) first"
        )
    pf = max(pl, pr)
    left_fine = pl == pf

    chains_l = {p: ml.chain(left_root, p) for p in ml.parts}
    chains_r = {p: mr.chain(right_root, p) for p in mr.parts}
    join_type = _JOIN_TYPES[how]
    sl, sr = ml.schema, mr.schema
    ren_l, ren_r = ml.renames, mr.renames

    def _join_part(batch: pa.Table):
        from palimpzest_ray.functions.tokens import limit_kernel_threads

        limit_kernel_threads()
        empty = None
        for j in batch["part"].to_pylist():
            jl = j if left_fine else j % pl
            jr = j % pr if left_fine else j
            lt = _live_partition(
                left_root, chains_l.get(jl), kl, sl, columns_left, ren_l
            )
            rt = _live_partition(
                right_root, chains_r.get(jr), kr, sr, columns_right, ren_r
            )
            # a coarse-side row belongs to exactly one fine bucket:
            # filter the wider-read side to THIS task's bucket so
            # fan-out reads never duplicate outer-join rows
            if pl != pr:
                coarse = rt if left_fine else lt
                ck = kr if left_fine else kl
                if coarse.num_rows:
                    keep = stable_bucket(coarse[ck], pf) == j
                    coarse = coarse.filter(pa.array(keep))
                if left_fine:
                    rt = coarse
                else:
                    lt = coarse
            out = _nested_safe_join(
                lt, rt, kl, kr, join_type, right_suffix
            )
            if out.num_rows:
                yield out.sort_by(kl)
            elif empty is None:
                empty = out
        if empty is not None:
            yield empty

    ids = rd.from_arrow(
        pa.table({"part": pa.array(np.arange(pf, dtype=np.int32))})
    ).repartition(pf)
    return ids.map_batches(_join_part, batch_format="pyarrow", batch_size=None)


#: "func(col)" aggregate spec → arrow TableGroupBy function
_AGG_FUNCS = {
    "count": "count",
    "sum": "sum",
    "min": "min",
    "max": "max",
    "avg": "mean",
    "mean": "mean",
    "stddev": "stddev",
    "var": "variance",
    "count_distinct": "count_distinct",
}


def aggregate_lake(
    lake_root: str,
    aggs: list[str],
    *,
    by: str | None = None,
    version: int | None = None,
) -> rd.Dataset:
    """GROUP BY the lake's ROUTING column with ZERO exchange.

    Every row of one routing value lives in exactly one partition
    (``stable_bucket(routing) % P``), so grouping by that column needs
    no shuffle at all: one task per partition LWW-resolves its chain
    and aggregates locally, and the per-partition results are already
    globally complete — including HOLISTIC aggregates (count_distinct,
    stddev) that a shuffle plan would need a full exchange or sketch
    for. The payoff case is a derived lake partitioned by a grouping
    column (``apply_changes(partition_key=...)``: per-source corpus
    stats, postings per token, vectors per IVF list).

    ``aggs`` uses the engine-wide ``"func(col)"`` naming (``count(*)``,
    ``sum(n_tok)``, ``avg``/``min``/``max``/``stddev``/``var``/
    ``count_distinct``); output columns carry the spec string as their
    name so SQL oracles align. ``by`` defaults to the routing column
    and REFUSES anything else — grouping on a non-routing column is not
    co-located, and silently shuffling would hide the asymptotic cliff
    (read through ``final_state`` + an ordinary groupby instead).
    """
    from palimpzest_ray.cdc.engine import load_latest_manifest
    from palimpzest_ray.cdc.manifest import load_manifest

    m = (
        load_manifest(lake_root, version)
        if version is not None
        else load_latest_manifest(lake_root)
    )
    if m is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    routing = m.partition_key or m.key
    by = by or routing
    if by != routing:
        raise ValueError(
            f"aggregate_lake groups by the routing column {routing!r}; "
            f"{by!r} is not co-located — use final_state + groupby for "
            "arbitrary grouping columns"
        )
    specs: list[tuple] = []  # (arrow_col, arrow_func, out_name)
    need_cols: list[str] = []
    for s in aggs:
        fn, _, rest = s.partition("(")
        col = rest.rstrip(")").strip()
        fn = fn.strip()
        if fn not in _AGG_FUNCS:
            raise ValueError(f"unsupported aggregate {s!r}")
        if fn == "count" and col == "*":
            specs.append(([], "count_all", None, s))
        else:
            if m.schema.get_field_index(col) < 0:
                raise KeyError(f"column {col!r} not in lake schema")
            # SQL (duckdb-oracle) convention: SAMPLE stddev/variance.
            # (flag, not a pc.VarianceOptions — options don't pickle;
            # the worker builds them)
            sample = _AGG_FUNCS[fn] in ("stddev", "variance")
            specs.append((col, _AGG_FUNCS[fn], sample, s))
            need_cols.append(col)
    need_cols = list(dict.fromkeys(need_cols))
    chains = {p: m.chain(lake_root, p) for p in m.parts}
    schema = m.schema
    lake_renames = m.renames
    lake_key = m.key  # chain LWW resolution key (NOT the grouping column)

    def _agg_part(batch: pa.Table):
        from palimpzest_ray.functions.tokens import limit_kernel_threads

        limit_kernel_threads()
        empty = None
        for p in batch["part"].to_pylist():
            t = _live_partition(
                lake_root, chains.get(p), lake_key, schema,
                list(dict.fromkeys([by] + need_cols)), lake_renames,
            )
            out = t.group_by([by]).aggregate(
                [
                    ((c, f, pc.VarianceOptions(ddof=1)) if o else (c, f))
                    for c, f, o, _n in specs
                ]
            )
            arrow_names = [
                ("count_all" if f == "count_all" else f"{c}_{f}")
                for c, f, _o, _n in specs
            ]
            out = out.select([by] + arrow_names).rename_columns(
                [by] + [n for _c, _f, _o, n in specs]
            )
            if out.num_rows:
                yield out.sort_by(by)
            elif empty is None:
                empty = out
        if empty is not None:
            yield empty

    ids = rd.from_arrow(
        pa.table({"part": pa.array(np.arange(m.num_partitions, dtype=np.int32))})
    ).repartition(m.num_partitions)
    return ids.map_batches(_agg_part, batch_format="pyarrow", batch_size=None)
