"""Incrementally-maintained JOIN views (cdc/jview.py): initial build
via the zero-exchange co-partitioned join, refresh touching ONLY the
changed keys from both change feeds, equivalence against a full
re-join at every step, and the crash/idempotence contract."""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import (
    apply_changes,
    create_join_view,
    final_state_table,
    refresh_join_view,
)

DOCS = pa.schema(
    [pa.field("lsn", pa.int64()), pa.field("op", pa.string()),
     pa.field("doc_id", pa.string()), pa.field("n_tok", pa.int32())]
)
SCORES = pa.schema(
    [pa.field("lsn", pa.int64()), pa.field("op", pa.string()),
     pa.field("doc_id", pa.string()), pa.field("score", pa.float64())]
)


def _ev(schema, rows):
    names = [f.name for f in schema]
    return pa.Table.from_pylist(
        [dict(zip(names, r)) for r in rows], schema
    )


def _oracle(left_lake, right_lake, how) -> pa.Table:
    lt = final_state_table(left_lake)
    rt = final_state_table(right_lake)
    con = duckdb.connect()
    con.register("l", lt)
    con.register("r", rt)
    jt = "inner" if how == "inner" else "left"
    t = con.execute(
        f"select l.doc_id, l.n_tok, r.score from l {jt} join r using "
        "(doc_id) order by l.doc_id"
    ).arrow()
    con.close()
    return t


def _view_table(view_root) -> pa.Table:
    t = final_state_table(view_root).sort_by("doc_id")
    return t.select(["doc_id", "n_tok", "score"])


@pytest.mark.parametrize("how", ["inner", "left"])
def test_join_view_create_refresh_matches_full_rejoin(tmp_path, how):
    left = str(tmp_path / "docs")
    right = str(tmp_path / "scores")
    view = str(tmp_path / f"view_{how}")
    apply_changes(
        _ev(DOCS, [(i, "INSERT", f"d{i}", 10 * i) for i in range(1, 9)]),
        left, num_partitions=4,
    )
    apply_changes(
        _ev(SCORES, [(i, "INSERT", f"d{i}", i / 2) for i in range(1, 6)]),
        right, num_partitions=4,
    )
    meta = create_join_view(view, left, right, how=how)
    assert meta["left_version"] == 1 and meta["right_version"] == 1
    assert _view_table(view).equals(
        _oracle(left, right, how).cast(_view_table(view).schema)
    )
    # epoch 2 on BOTH sides: updates, deletes, inserts
    apply_changes(
        _ev(DOCS, [
            (100, "UPDATE", "d1", 999),   # left value change
            (101, "DELETE", "d2", None),  # left row gone -> view row gone
            (102, "INSERT", "d9", 90),    # new left row
        ]),
        left, num_partitions=4,
    )
    apply_changes(
        _ev(SCORES, [
            (100, "UPDATE", "d3", 7.5),   # right value change
            (101, "DELETE", "d4", None),  # right gone: inner drops, left nulls
            (102, "INSERT", "d7", 0.25),  # right row for an unmatched left
        ]),
        right, num_partitions=4,
    )
    r = refresh_join_view(view)
    assert not r["noop"] and r["keys_refreshed"] == 6
    assert _view_table(view).equals(
        _oracle(left, right, how).cast(_view_table(view).schema)
    )
    # idempotent: nothing moved -> no-op refresh
    r2 = refresh_join_view(view)
    assert r2["noop"] and r2["keys_refreshed"] == 0


def test_join_view_crash_between_commit_and_pin_converges(tmp_path):
    from palimpzest_ray.cdc import jview

    left = str(tmp_path / "docs")
    right = str(tmp_path / "scores")
    view = str(tmp_path / "view")
    apply_changes(
        _ev(DOCS, [(i, "INSERT", f"d{i}", i) for i in range(1, 5)]),
        left, num_partitions=2,
    )
    apply_changes(
        _ev(SCORES, [(i, "INSERT", f"d{i}", float(i)) for i in range(1, 5)]),
        right, num_partitions=2,
    )
    create_join_view(view, left, right, how="inner")
    apply_changes(
        _ev(DOCS, [(100, "UPDATE", "d1", 77)]), left, num_partitions=2
    )
    # crash: view committed but pins NOT updated
    orig = jview._store_meta
    calls = {"n": 0}

    def dying(view_root, meta):
        calls["n"] += 1
        raise RuntimeError("crash before pin update")

    jview._store_meta = dying
    try:
        with pytest.raises(RuntimeError):
            refresh_join_view(view)
    finally:
        jview._store_meta = orig
    # rerun re-refreshes the same keys at a fresh LSN and converges
    r = refresh_join_view(view)
    assert r["keys_refreshed"] == 1
    assert _view_table(view).equals(
        _oracle(left, right, "inner").cast(_view_table(view).schema)
    )


def test_join_view_refusals(tmp_path):
    left = str(tmp_path / "docs")
    apply_changes(
        _ev(DOCS, [(1, "INSERT", "d1", 1)]), left, num_partitions=2
    )
    with pytest.raises(ValueError, match="inner.*left|'inner' and 'left'"):
        create_join_view(str(tmp_path / "v"), left, left, how="outer")


FACTS = pa.schema(
    [pa.field("lsn", pa.int64()), pa.field("op", pa.string()),
     pa.field("doc_id", pa.string()), pa.field("dim_id", pa.string()),
     pa.field("qty", pa.int32())]
)
DIMS = pa.schema(
    [pa.field("lsn", pa.int64()), pa.field("op", pa.string()),
     pa.field("doc_id", pa.string()), pa.field("label", pa.string())]
)


def _fk_oracle(left_lake, right_lake, how) -> pa.Table:
    lt = final_state_table(left_lake)
    rt = final_state_table(right_lake)
    con = duckdb.connect()
    con.register("l", lt)
    con.register("r", rt)
    jt = "inner" if how == "inner" else "left"
    t = con.execute(
        f"select l.doc_id, l.dim_id, l.qty, r.label from l {jt} join r "
        "on l.dim_id = r.doc_id order by l.doc_id"
    ).arrow()
    con.close()
    return t


@pytest.mark.parametrize("how", ["inner", "left"])
def test_fk_join_view_star_schema_ripples(tmp_path, ray_session, how):
    """left_on= (fact.dim_id = dim.key): dim changes ripple to every
    referencing fact through the fk column index; fact fk-repointing,
    dim deletion (inner drops / left nulls), and fact deletion all
    converge to the full re-join at each refresh; second refresh
    no-ops."""
    facts = str(tmp_path / "facts")
    dims = str(tmp_path / "dims")
    view = str(tmp_path / f"fkview_{how}")
    apply_changes(
        _ev(FACTS, [
            (i, "INSERT", f"f{i}", f"D{i % 3}", i) for i in range(1, 9)
        ]),
        facts, num_partitions=4,
    )
    apply_changes(
        _ev(DIMS, [(i, "INSERT", f"D{i}", f"lab{i}") for i in range(3)]),
        dims, num_partitions=2,
    )
    meta = create_join_view(view, facts, dims, how=how, left_on="dim_id")
    assert meta["left_on"] == "dim_id" and "fk_index" in meta

    def check():
        got = final_state_table(view).sort_by("doc_id").select(
            ["doc_id", "dim_id", "qty", "label"])
        want = _fk_oracle(facts, dims, how)
        assert got.cast(want.schema).equals(want), (
            f"{got.to_pydict()} vs {want.to_pydict()}")

    check()

    # 1. dim update ripples to all its facts; one fact re-points; one
    #    new fact references a brand-new dim
    apply_changes(_ev(DIMS, [
        (10, "INSERT", "D1", "lab1-v2"),
        (11, "INSERT", "D9", "lab9"),
    ]), dims)
    apply_changes(_ev(FACTS, [
        (10, "INSERT", "f2", "D9", 22),
        (11, "INSERT", "f9", "D9", 99),
    ]), facts)
    r = refresh_join_view(view)
    assert not r["noop"] and r["keys_refreshed"] >= 4
    check()

    # 2. dim deletion: inner drops its facts' rows, left nulls them;
    #    fact deletion leaves the view
    apply_changes(_ev(DIMS, [(12, "DELETE", "D0", None)]), dims)
    apply_changes(_ev(FACTS, [(12, "DELETE", "f1", None, None)]), facts)
    r2 = refresh_join_view(view)
    assert not r2["noop"]
    check()

    # 3. idempotence: nothing changed, refresh no-ops
    r3 = refresh_join_view(view)
    assert r3["noop"]


def test_view_over_join_view_composition(tmp_path, ray_session):
    """The join view IS a lake, so the aggregate-view machinery
    composes on top of it unchanged: facts ⋈ dims (fk) -> GROUP BY
    dim label SUM(qty), both layers refreshed incrementally after a
    second epoch, each equal to the SQL recompute."""
    from palimpzest_ray.cdc import create_view, read_view, refresh_view

    facts = str(tmp_path / "facts")
    dims = str(tmp_path / "dims")
    jv = str(tmp_path / "jv")
    agg = str(tmp_path / "agg")
    apply_changes(
        _ev(FACTS, [
            (i, "INSERT", f"f{i}", f"D{i % 2}", 10 + i)
            for i in range(1, 7)
        ]),
        facts, num_partitions=2,
    )
    apply_changes(
        _ev(DIMS, [(i, "INSERT", f"D{i}", f"lab{i}") for i in range(2)]),
        dims, num_partitions=2,
    )
    create_join_view(jv, facts, dims, how="inner", left_on="dim_id")
    create_view(jv, agg, group_col="label",
                aggs={"total_qty": ("sum", "qty")})

    def check():
        got = read_view(agg)
        t = pa.concat_tables(got.iter_batches(batch_format="pyarrow"))
        t = t.select(["label", "total_qty"]).sort_by("label")
        lt = final_state_table(facts)
        rt = final_state_table(dims)
        con = duckdb.connect()
        con.register("l", lt)
        con.register("r", rt)
        want = con.execute(
            "select r.label, sum(l.qty) as total_qty from l "
            "join r on l.dim_id = r.doc_id group by r.label "
            "order by r.label"
        ).arrow()
        con.close()
        assert t.cast(want.schema).equals(want), (
            t.to_pydict(), want.to_pydict())

    check()
    # epoch 2: a dim relabel (ripples through BOTH layers), a fact
    # re-point, and a fact delete
    apply_changes(_ev(DIMS, [(10, "INSERT", "D1", "lab1-v2")]), dims)
    apply_changes(_ev(FACTS, [
        (10, "INSERT", "f2", "D1", 99),
        (11, "DELETE", "f3", None, None),
    ]), facts)
    refresh_join_view(jv)
    refresh_view(jv, agg)
    check()


def test_fk_view_survives_vacuum_fsck_orphans(tmp_path, ray_session):
    """The fk column index lives INSIDE the view root (_fkidx): the
    view's own vacuum / fsck / orphan scan must neither flag nor
    reclaim it, and refresh keeps working after a vacuum."""
    from palimpzest_ray.cdc import find_orphans, vacuum
    from palimpzest_ray.cdc.engine import fsck

    facts = str(tmp_path / "f")
    dims = str(tmp_path / "d")
    view = str(tmp_path / "v")
    apply_changes(
        _ev(FACTS, [(i, "INSERT", f"f{i}", f"D{i % 2}", i)
                    for i in range(1, 7)]),
        facts, num_partitions=2,
    )
    apply_changes(
        _ev(DIMS, [(i, "INSERT", f"D{i}", f"L{i}") for i in range(2)]),
        dims, num_partitions=2,
    )
    create_join_view(view, facts, dims, how="inner", left_on="dim_id")
    apply_changes(_ev(DIMS, [(10, "INSERT", "D1", "L1v2")]), dims)
    refresh_join_view(view)

    assert find_orphans(view)["orphans"] == []
    v = vacuum(view, keep_versions=1)
    assert v.versions_dropped == [1]
    assert fsck(view)["ok"]
    apply_changes(_ev(DIMS, [(11, "INSERT", "D0", "L0v2")]), dims)
    r = refresh_join_view(view)
    assert r["rows_upserted"] == 3  # D0's facts recomputed
    got = final_state_table(view)
    assert got.num_rows == 6


def test_fk_view_all_facts_deleted_epoch(tmp_path, ray_session):
    """Review r4: a refresh epoch where EVERY changed fact key was
    deleted (lt empty, no fks to fetch) must not leak the manifest's
    internal _lsn/_deleted columns into the feed via the empty-rt
    fallback — the view schema stays user-only and the keys leave."""
    facts = str(tmp_path / "f")
    dims = str(tmp_path / "d")
    view = str(tmp_path / "v")
    apply_changes(
        _ev(FACTS, [(i, "INSERT", f"f{i}", "D0", i) for i in (1, 2)]),
        facts, num_partitions=2,
    )
    apply_changes(
        _ev(DIMS, [(0, "INSERT", "D0", "L0")]), dims, num_partitions=2,
    )
    create_join_view(view, facts, dims, how="inner", left_on="dim_id")
    apply_changes(
        _ev(FACTS, [(9, "DELETE", "f1", None, None),
                    (10, "DELETE", "f2", None, None)]),
        facts,
    )
    r = refresh_join_view(view)
    assert r["rows_deleted"] == 2 and r["rows_upserted"] == 0
    t = final_state_table(view)
    assert t.num_rows == 0
    assert not any(c.startswith("_") for c in t.column_names), (
        t.column_names)


def test_fk_join_view_random_epochs(tmp_path, ray_session):
    """Randomized (seeded) epochs over the fk join view: facts and
    dims evolve through 3 rounds of mixed inserts/updates/deletes and
    fk re-points; after every refresh the view equals the full SQL
    re-join. Deterministic RNG — failures reproduce."""
    import numpy as np

    rng = np.random.default_rng(17)
    facts = str(tmp_path / "f")
    dims = str(tmp_path / "d")
    view = str(tmp_path / "v")
    n_dims = 5
    apply_changes(
        _ev(FACTS, [
            (i, "INSERT", f"f{i}", f"D{rng.integers(n_dims)}",
             int(rng.integers(100)))
            for i in range(1, 21)
        ]),
        facts, num_partitions=4,
    )
    apply_changes(
        _ev(DIMS, [(i, "INSERT", f"D{i}", f"L{i}")
                   for i in range(n_dims)]),
        dims, num_partitions=2,
    )
    create_join_view(view, facts, dims, how="left", left_on="dim_id")
    lsn = 100
    live_facts = set(range(1, 21))
    live_dims = set(range(n_dims))
    for _epoch in range(3):
        fev, dev = [], []
        for _ in range(6):
            r = rng.random()
            if r < 0.5 and live_facts:  # fact upsert / re-point
                k = int(rng.choice(sorted(live_facts)))
                fev.append((lsn, "INSERT", f"f{k}",
                            f"D{rng.integers(n_dims + 2)}",
                            int(rng.integers(100))))
            elif r < 0.7 and len(live_facts) > 2:
                k = int(rng.choice(sorted(live_facts)))
                live_facts.discard(k)
                fev.append((lsn, "DELETE", f"f{k}", None, None))
            elif r < 0.9:  # dim upsert (maybe brand-new)
                k = int(rng.integers(n_dims + 2))
                live_dims.add(k)
                dev.append((lsn, "INSERT", f"D{k}",
                            f"L{k}e{_epoch}"))
            elif len(live_dims) > 1:
                k = int(rng.choice(sorted(live_dims)))
                live_dims.discard(k)
                dev.append((lsn, "DELETE", f"D{k}", None))
            lsn += 1
        if fev:
            apply_changes(_ev(FACTS, fev), facts)
        if dev:
            apply_changes(_ev(DIMS, dev), dims)
        refresh_join_view(view)
        got = final_state_table(view).sort_by("doc_id").select(
            ["doc_id", "dim_id", "qty", "label"])
        want = _fk_oracle(facts, dims, "left")
        assert got.cast(want.schema).equals(want), (
            _epoch, got.to_pydict(), want.to_pydict())
