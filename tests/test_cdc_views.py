"""Incremental view maintenance (cdc/views.py): refresh == full
recompute after arbitrary update/delete/insert epochs, group
drop/appear, no-op fast path, vacuum guard, unsupported-agg guard."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import apply_changes, final_state_table, make_base_table, make_change_table
from palimpzest_ray.cdc import views


def _write(tmp_path, name, table):
    p = os.path.join(str(tmp_path), name)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    pq.write_table(table, p)
    return p


def _seed(tmp_path, lake, n_base=400):
    base = make_base_table(n_base, seed=42)
    boot = pa.table(
        {
            "lsn": pa.array([0] * base.num_rows, pa.int64()),
            "op": pa.array(["INSERT"] * base.num_rows),
            **{c: base[c] for c in base.column_names},
        }
    )
    apply_changes(_write(tmp_path, "boot/log.parquet", boot), lake, num_partitions=8)


def _recompute(lake) -> dict:
    """Oracle: per-source (count, sum n_tok) from the live final state."""
    t = final_state_table(lake)
    out: dict = {}
    for src, n in zip(t["source"].to_pylist(), t["n_tok"].to_pylist()):
        c, s = out.get(src, (0, 0))
        out[src] = (c + 1, s + n)
    return out


def _view_dict(view_root) -> dict:
    rows = views.read_view(view_root).take_all()
    return {
        r["source"]: (r["n_docs"], r["total_tok"], r["avg_tok"]) for r in rows
    }


AGGS = {"n_docs": ("count", None), "total_tok": ("sum", "n_tok"),
        "avg_tok": ("avg", "n_tok")}


def test_refresh_equals_recompute(tmp_path):
    lake = str(tmp_path / "lake")
    view = str(tmp_path / "view")
    _seed(tmp_path, lake)
    views.create_view(lake, view, group_col="source", aggs=AGGS)
    assert {k: v[:2] for k, v in _view_dict(view).items()} == _recompute(lake)

    # epoch 2: zipf-hot updates, deletes, brand-new keys
    log2 = make_change_table(2000, 400, seed=7, start_lsn=1, new_key_space=100)
    apply_changes(_write(tmp_path, "e2/log.parquet", log2), lake, num_partitions=8)
    r = views.refresh_view(lake, view)
    assert r["refreshed"] and r["from_version"] < r["lake_version"]
    got = _view_dict(view)
    exp = _recompute(lake)
    assert {k: v[:2] for k, v in got.items()} == exp
    for src, (c, s, avg) in got.items():
        assert avg == pytest.approx(s / c)

    # epoch 3 on top — refresh composes across multiple epochs
    log3 = make_change_table(1500, 500, seed=8, start_lsn=3000, evolved=True)
    apply_changes(_write(tmp_path, "e3/log.parquet", log3), lake, num_partitions=8)
    views.refresh_view(lake, view)
    assert {k: v[:2] for k, v in _view_dict(view).items()} == _recompute(lake)

    # no-op refresh: already caught up
    assert views.refresh_view(lake, view) == {
        "refreshed": False,
        "lake_version": views._load_meta(view)["lake_version"],
    }


def test_group_dropped_when_all_rows_deleted(tmp_path):
    lake = str(tmp_path / "lake")
    view = str(tmp_path / "view")
    base = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c"]),
            "tokens": pa.array([[1], [2, 3], [4]], pa.list_(pa.int32())),
            "n_tok": pa.array([1, 2, 1], pa.int32()),
            "source": pa.array(["s1", "s1", "s2"]),
        }
    )
    boot = pa.table(
        {
            "lsn": pa.array([0, 0, 0], pa.int64()),
            "op": pa.array(["INSERT"] * 3),
            **{c: base[c] for c in base.column_names},
        }
    )
    apply_changes(_write(tmp_path, "b/log.parquet", boot), lake, num_partitions=2)
    views.create_view(lake, view, group_col="source", aggs=AGGS)
    # delete every s2 row; move doc b from s1 to s1 (update in place)
    log = pa.table(
        {
            "lsn": pa.array([1, 2], pa.int64()),
            "op": pa.array(["DELETE", "UPDATE"]),
            "doc_id": pa.array(["c", "b"]),
            "tokens": pa.array([None, [9, 9, 9]], pa.list_(pa.int32())),
            "n_tok": pa.array([None, 3], pa.int32()),
            "source": pa.array([None, "s3"]),
        }
    )
    apply_changes(_write(tmp_path, "d/log.parquet", log), lake, num_partitions=2)
    views.refresh_view(lake, view)
    got = _view_dict(view)
    assert set(got) == {"s1", "s3"}  # s2 dropped, s3 appeared (group move)
    assert got["s1"] == (1, 1, 1.0)
    assert got["s3"] == (1, 3, 3.0)


def test_vacuumed_base_raises(tmp_path):
    from palimpzest_ray.cdc.manifest import vacuum

    lake = str(tmp_path / "lake")
    view = str(tmp_path / "view")
    _seed(tmp_path, lake, n_base=100)
    views.create_view(lake, view, group_col="source", aggs=AGGS)
    for i in range(3):  # advance the lake 3 versions past the view base
        log = make_change_table(200, 100, seed=10 + i, start_lsn=1 + 200 * i)
        apply_changes(_write(tmp_path, f"v{i}/log.parquet", log), lake,
                      num_partitions=4)
    vacuum(lake, keep_versions=1)
    with pytest.raises(ValueError, match="recreate the view"):
        views.refresh_view(lake, view)


def test_unsupported_agg_rejected(tmp_path):
    lake = str(tmp_path / "lake")
    _seed(tmp_path, lake, n_base=50)
    # min/max are supported now (affected-group recompute); a genuinely
    # unmaintainable aggregate still fails loudly
    with pytest.raises(ValueError, match="not maintainable"):
        views.create_view(
            lake, str(tmp_path / "v"), group_col="source",
            aggs={"m": ("median", "n_tok")},
        )


def test_crashed_refresh_is_not_double_applied(tmp_path, monkeypatch):
    """Crash between the data write and the _view.json flip must leave
    the view consistent: the pointer still pins the OLD data version, so
    the retried refresh recomputes the same delta once, not twice."""
    lake = str(tmp_path / "lake")
    view = str(tmp_path / "view")
    _seed(tmp_path, lake, n_base=200)
    views.create_view(lake, view, group_col="source", aggs=AGGS)
    log2 = make_change_table(800, 200, seed=21, start_lsn=1)
    apply_changes(_write(tmp_path, "e2/log.parquet", log2), lake, num_partitions=4)

    real_store = views._store_meta

    def _boom(*a, **k):
        raise RuntimeError("simulated crash before pointer flip")

    monkeypatch.setattr(views, "_store_meta", _boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        views.refresh_view(lake, view)  # data v2 written, pointer NOT
    monkeypatch.setattr(views, "_store_meta", real_store)

    views.refresh_view(lake, view)  # retry succeeds against pinned v1
    assert {k: v[:2] for k, v in _view_dict(view).items()} == _recompute(lake)


def test_sql_null_semantics(tmp_path):
    """sum/avg skip null values like SQL: a group with some nulls uses
    only the non-null rows in both sum and the avg denominator; an
    all-null group reports NULL for sum and avg but still counts rows;
    refresh preserves the semantics when nulls are updated in/out.
    (Uses a 'score' column — n_tok is engine-derived from tokens and
    can never be null in the lake.)"""
    lake = str(tmp_path / "lake")
    view = str(tmp_path / "view")
    base = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c", "d"]),
            "tokens": pa.array([[1], [2], [3], [4]], pa.list_(pa.int32())),
            "n_tok": pa.array([1, 1, 1, 1], pa.int32()),
            "source": pa.array(["s1", "s1", "s2", "s2"]),
            "score": pa.array([10.0, None, None, None], pa.float64()),
        }
    )
    boot = pa.table(
        {
            "lsn": pa.array([0] * 4, pa.int64()),
            "op": pa.array(["INSERT"] * 4),
            **{c: base[c] for c in base.column_names},
        }
    )
    apply_changes(_write(tmp_path, "b/log.parquet", boot), lake, num_partitions=2)
    aggs = {"n_docs": ("count", None), "total": ("sum", "score"),
            "mean": ("avg", "score")}
    views.create_view(lake, view, group_col="source", aggs=aggs)

    def _d():
        rows = views.read_view(view).take_all()
        return {r["source"]: (r["n_docs"], r["total"], r["mean"]) for r in rows}

    got = _d()
    # s1: 2 rows, one null value -> sum 10, avg 10 (denominator 1, not 2)
    assert got["s1"] == (2, 10.0, 10.0)
    # s2: all-null values -> NULL sum and avg, but count(*) still 2
    assert got["s2"] == (2, None, None)

    # update: the null in s1 becomes 20; s2's 'c' gains a value
    log = pa.table(
        {
            "lsn": pa.array([1, 2], pa.int64()),
            "op": pa.array(["UPDATE", "UPDATE"]),
            "doc_id": pa.array(["b", "c"]),
            "tokens": pa.array([[9], [8]], pa.list_(pa.int32())),
            "n_tok": pa.array([1, 1], pa.int32()),
            "source": pa.array(["s1", "s2"]),
            "score": pa.array([20.0, 5.0], pa.float64()),
        }
    )
    apply_changes(_write(tmp_path, "e/log.parquet", log), lake, num_partitions=2)
    views.refresh_view(lake, view)
    got = _d()
    assert got["s1"] == (2, 30.0, 15.0)
    assert got["s2"] == (2, 5.0, 5.0)


def test_minmax_view_affected_group_recompute(tmp_path):
    """min/max views refresh by affected-group recompute: a retracted
    group maximum (the max row deleted or updated DOWN) is re-derived
    from the latest lake — the failure a delta-only path cannot see —
    while untouched groups carry forward byte-identically."""
    import duckdb

    lake = str(tmp_path / "lake")
    view = str(tmp_path / "view")
    _seed(tmp_path, lake)
    aggs = {
        "n_docs": ("count", None),
        "min_tok": ("min", "n_tok"),
        "max_tok": ("max", "n_tok"),
        "total_tok": ("sum", "n_tok"),
    }
    views.create_view(lake, view, group_col="source", aggs=aggs)

    def _expect():
        t = final_state_table(lake)
        return {
            r["source"]: (r["n_docs"], r["min_tok"], r["max_tok"], r["total_tok"])
            for r in duckdb.sql(
                """select source, count(*) n_docs,
                          cast(min(n_tok) as double) min_tok,
                          cast(max(n_tok) as double) max_tok,
                          cast(sum(n_tok) as double) total_tok
                   from t group by source"""
            ).fetchdf().to_dict("records")
        }

    def _got():
        rows = views.read_view(view).take_all()
        return {
            r["source"]: (r["n_docs"], r["min_tok"], r["max_tok"], r["total_tok"])
            for r in rows
        }

    assert _got() == _expect()

    # epoch 2: churn incl. deletes of current extrema (Zipf-hot keys)
    log2 = make_change_table(2000, 400, seed=17, start_lsn=1, new_key_space=100)
    apply_changes(_write(tmp_path, "e2/log.parquet", log2), lake, num_partitions=8)
    r = views.refresh_view(lake, view)
    assert r["refreshed"]
    assert _got() == _expect()

    # epoch 3: surgically retract one group's maximum
    t = final_state_table(lake)
    import pyarrow.compute as pc

    src0 = t["source"][0].as_py()
    grp = t.filter(pc.equal(t["source"], src0))
    mx_i = pc.index(grp["n_tok"], pc.max(grp["n_tok"])).as_py()
    victim = grp["doc_id"][mx_i].as_py()
    kill = pa.table(
        {
            "lsn": pa.array([10_000], pa.int64()),
            "op": pa.array(["DELETE"]),
            "doc_id": pa.array([victim]),
            "tokens": pa.array([None], pa.list_(pa.int32())),
            "n_tok": pa.array([None], pa.int32()),
            "source": pa.array([None], pa.string()),
        }
    )
    apply_changes(_write(tmp_path, "e3/log.parquet", kill), lake, num_partitions=8)
    views.refresh_view(lake, view)
    assert _got() == _expect()  # the retracted max is re-derived


def test_filtered_view_refresh_equals_recompute(tmp_path):
    """where= makes a FILTERED view: only predicate-satisfying rows
    contribute; rows entering/leaving the filtered set across epochs
    come out as ordinary deltas and refresh == recreate throughout."""

    def _filtered_recompute(lake) -> dict:
        t = final_state_table(lake)
        out: dict = {}
        for src, n in zip(t["source"].to_pylist(), t["n_tok"].to_pylist()):
            if n is None or n < 40:
                continue
            c, s = out.get(src, (0, 0))
            out[src] = (c + 1, s + n)
        return out

    lake = str(tmp_path / "lake")
    view = str(tmp_path / "view")
    _seed(tmp_path, lake)
    where = [("n_tok", ">=", 40)]
    m = views.create_view(
        lake, view, group_col="source", aggs=AGGS, where=where
    )
    assert m["where"] == [list(where[0])]
    assert {k: v[:2] for k, v in _view_dict(view).items()} == \
        _filtered_recompute(lake)

    # epochs with updates that cross the threshold both ways, deletes,
    # and fresh keys
    log2 = make_change_table(2000, 400, seed=9, start_lsn=1,
                             new_key_space=100)
    apply_changes(_write(tmp_path, "e2/log.parquet", log2), lake,
                  num_partitions=8)
    views.refresh_view(lake, view)
    assert {k: v[:2] for k, v in _view_dict(view).items()} == \
        _filtered_recompute(lake)

    log3 = make_change_table(1500, 500, seed=10, start_lsn=3000)
    apply_changes(_write(tmp_path, "e3/log.parquet", log3), lake,
                  num_partitions=8)
    views.refresh_view(lake, view)
    got = {k: v[:2] for k, v in _view_dict(view).items()}
    exp = _filtered_recompute(lake)
    assert got == exp

    # filtered min/max views take the affected-group recompute path
    view2 = str(tmp_path / "view2")
    views.create_view(
        lake, view2, group_col="source",
        aggs={"n_docs": ("count", None), "top_tok": ("max", "n_tok")},
        where=where,
    )
    log4 = make_change_table(800, 300, seed=11, start_lsn=6000)
    apply_changes(_write(tmp_path, "e4/log.parquet", log4), lake,
                  num_partitions=8)
    views.refresh_view(lake, view2)
    t = final_state_table(lake)
    exp_mm: dict = {}
    for src, n in zip(t["source"].to_pylist(), t["n_tok"].to_pylist()):
        if n is None or n < 40:
            continue
        c, mx = exp_mm.get(src, (0, None))
        exp_mm[src] = (c + 1, n if mx is None else max(mx, n))
    rows = views.read_view(view2).take_all()
    got_mm = {r["source"]: (r["n_docs"], r["top_tok"]) for r in rows}
    assert got_mm == exp_mm


def test_multicolumn_group_view(tmp_path):
    """group_col as a LIST: GROUP BY (source, bucket) via the injective
    composite key; refresh == recreate across epochs; read_view decodes
    back to the original typed columns; min/max takes the pruned
    affected-group path."""
    lake = str(tmp_path / "lake")
    _seed(tmp_path, lake)
    # give rows a second (int) group dimension derived from n_tok
    from palimpzest_ray.cdc import add_generated_column

    add_generated_column(
        lake, pa.field("bucket", pa.int64()),
        ["mod", ["col", "n_tok"], 3],
    )

    def _recompute2(lake) -> dict:
        t = final_state_table(lake)
        out: dict = {}
        for src, b, n in zip(
            t["source"].to_pylist(), t["bucket"].to_pylist(),
            t["n_tok"].to_pylist(),
        ):
            c, s = out.get((src, b), (0, 0))
            out[(src, b)] = (c + 1, s + n)
        return out

    view = str(tmp_path / "view")
    views.create_view(
        lake, view, group_col=["source", "bucket"],
        aggs={"n_docs": ("count", None), "total_tok": ("sum", "n_tok")},
    )

    def _got(view_root) -> dict:
        rows = views.read_view(view_root).take_all()
        assert all(isinstance(r["bucket"], int) for r in rows)
        return {
            (r["source"], r["bucket"]): (r["n_docs"], r["total_tok"])
            for r in rows
        }

    assert _got(view) == _recompute2(lake)

    log2 = make_change_table(2000, 400, seed=12, start_lsn=1,
                             new_key_space=100)
    apply_changes(_write(tmp_path, "e2/log.parquet", log2), lake,
                  num_partitions=8)
    views.refresh_view(lake, view)
    assert _got(view) == _recompute2(lake)

    # min/max multi-column view: affected-group recompute path
    view2 = str(tmp_path / "view2")
    views.create_view(
        lake, view2, group_col=["source", "bucket"],
        aggs={"n_docs": ("count", None), "top_tok": ("max", "n_tok")},
    )
    log3 = make_change_table(1000, 300, seed=13, start_lsn=4000)
    apply_changes(_write(tmp_path, "e3/log.parquet", log3), lake,
                  num_partitions=8)
    views.refresh_view(lake, view2)
    t = final_state_table(lake)
    exp_mm: dict = {}
    for src, b, n in zip(
        t["source"].to_pylist(), t["bucket"].to_pylist(),
        t["n_tok"].to_pylist(),
    ):
        c, mx = exp_mm.get((src, b), (0, None))
        exp_mm[(src, b)] = (c + 1, n if mx is None else max(mx, n))
    rows = views.read_view(view2).take_all()
    got_mm = {
        (r["source"], r["bucket"]): (r["n_docs"], r["top_tok"])
        for r in rows
    }
    assert got_mm == exp_mm

    # a float group component is refused up front
    flake = str(tmp_path / "flake")
    apply_changes(
        pa.table(
            {
                "lsn": pa.array([1], pa.int64()),
                "op": pa.array(["INSERT"]),
                "doc_id": pa.array(["a"]),
                "score": pa.array([1.5], pa.float64()),
                "grp": pa.array(["g"]),
            }
        ),
        flake, num_partitions=2,
    )
    with pytest.raises(ValueError, match="string/int/bool"):
        views.create_view(
            flake, str(tmp_path / "v3"),
            group_col=["grp", "score"],
            aggs={"n": ("count", None)},
        )
