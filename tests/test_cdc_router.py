"""Content-based change routing: one feed → N lakes by first-match
predicates, one streaming split pass, one atomic catalog commit."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import final_state_table, route_changes
from palimpzest_ray.cdc.catalog import read_table, snapshot


def _feed(tmp_path, n=90, name="feed"):
    t = pa.table(
        {
            "lsn": pa.array(range(1, n + 1), pa.int64()),
            "op": pa.array(["INSERT"] * n),
            "doc_id": pa.array([f"d{i:04d}" for i in range(n)]),
            "n_tok": pa.array([i % 11 for i in range(n)], pa.int32()),
            "source": pa.array(
                ["web" if i % 3 == 0 else ("book" if i % 3 == 1 else "code")
                 for i in range(n)]
            ),
        }
    )
    p = str(tmp_path / f"{name}.parquet")
    pq.write_table(t, p)
    return t, p


def test_route_first_match_and_atomic_catalog(tmp_path, ray_session):
    t, p = _feed(tmp_path)
    cat = str(tmp_path / "cat")
    lakes = {n: str(tmp_path / n) for n in ("web", "book", "rest")}
    res = route_changes(
        p, cat,
        routes={
            "web": [("source", "==", "web")],
            "book": [("source", "==", "book")],
        },
        lakes=lakes,
        default="rest",
        apply_kwargs={n: {"num_partitions": 2} for n in lakes},
    )
    assert res.events_in == 90
    assert res.events_routed["web"] == 30
    assert res.events_routed["book"] == 30
    assert res.events_routed["rest"] == 30
    assert res.events_dropped == 0

    # each lake holds exactly its slice
    for name, pred in [("web", "web"), ("book", "book"), ("rest", "code")]:
        got = final_state_table(lakes[name])
        want = t.filter(pc.equal(t["source"], pred))
        assert got.num_rows == want.num_rows
        assert set(got["doc_id"].to_pylist()) == set(
            want["doc_id"].to_pylist()
        )
        # catalog snapshot reads the same cut
        assert read_table(cat, name).count() == want.num_rows

    # ONE catalog version pins all three
    snap = snapshot(cat)
    assert snap.version == 1
    assert set(snap.pins) == {"web", "book", "rest"}


def test_route_overlapping_predicates_first_wins(tmp_path, ray_session):
    t, p = _feed(tmp_path)
    cat = str(tmp_path / "cat")
    lakes = {"small": str(tmp_path / "small"), "all": str(tmp_path / "all")}
    res = route_changes(
        p, cat,
        routes={
            "small": [("n_tok", "<", 3)],      # matches first
            "all": [("n_tok", ">=", 0)],       # would match everything
        },
        lakes=lakes,
        apply_kwargs={n: {"num_partitions": 2} for n in lakes},
    )
    n_small = pc.sum(
        pc.cast(pc.less(t["n_tok"], 3), pa.int64())
    ).as_py()
    assert res.events_routed["small"] == n_small
    assert res.events_routed["all"] == 90 - n_small
    small = final_state_table(lakes["small"])
    assert pc.max(small["n_tok"]).as_py() < 3
    # disjoint split covers the feed exactly once
    assert small.num_rows + final_state_table(lakes["all"]).num_rows == 90


def test_route_unmatched_refuses_before_any_apply(tmp_path, ray_session):
    _t, p = _feed(tmp_path)
    cat = str(tmp_path / "cat")
    lakes = {"web": str(tmp_path / "web")}
    with pytest.raises(ValueError, match="matched no route"):
        route_changes(
            p, cat,
            routes={"web": [("source", "==", "web")]},
            lakes=lakes,
            apply_kwargs={"web": {"num_partitions": 2}},
        )
    # nothing half-committed: no lake, no catalog version
    assert not os.path.exists(os.path.join(lakes["web"], "LATEST"))
    assert not os.path.exists(os.path.join(cat, "CATALOG-v1.json"))

    res = route_changes(
        p, cat,
        routes={"web": [("source", "==", "web")]},
        lakes=lakes,
        drop_unmatched=True,
        apply_kwargs={"web": {"num_partitions": 2}},
    )
    assert res.events_routed["web"] == 30
    assert res.events_dropped == 60


def test_route_second_epoch_pins_unrouted_lake(tmp_path, ray_session):
    """A later routed transaction whose feed only touches ONE lake
    still pins the others' current versions — every catalog snapshot
    is a full consistent cut."""
    t, p = _feed(tmp_path)
    cat = str(tmp_path / "cat")
    lakes = {"web": str(tmp_path / "web"), "other": str(tmp_path / "other")}
    kw = {n: {"num_partitions": 2} for n in lakes}
    route_changes(
        p, cat,
        routes={"web": [("source", "==", "web")]}, lakes=lakes,
        default="other", apply_kwargs=kw,
    )
    upd = pa.table(
        {
            "lsn": pa.array([10_000], pa.int64()),
            "op": pa.array(["UPDATE"]),
            "doc_id": pa.array(["d0000"]),
            "n_tok": pa.array([999], pa.int32()),
            "source": pa.array(["web"]),
        }
    )
    p2 = str(tmp_path / "feed2.parquet")
    pq.write_table(upd, p2)
    res2 = route_changes(
        p2, cat,
        routes={"web": [("source", "==", "web")]}, lakes=lakes,
        default="other", apply_kwargs=kw,
    )
    assert res2.events_routed["web"] == 1
    snap = snapshot(cat)
    assert snap.version == 2
    assert set(snap.pins) == {"web", "other"}
    # time travel: catalog v1 still reads the pre-update web state
    old = read_table(cat, "web", catalog_version=1).to_pandas()
    assert old[old.doc_id == "d0000"].n_tok.iloc[0] != 999
    new = read_table(cat, "web").to_pandas()
    assert new[new.doc_id == "d0000"].n_tok.iloc[0] == 999


def test_route_expr_predicate_and_delete_falls_through(
    tmp_path, ray_session
):
    """A full cdc.expr route predicate works, and a DELETE whose
    payload lacks the routed column falls through to the default."""
    cat = str(tmp_path / "cat")
    lakes = {"long": str(tmp_path / "long"), "rest": str(tmp_path / "rest")}
    kw = {n: {"num_partitions": 2} for n in lakes}
    feed = pa.table(
        {
            "lsn": pa.array([1, 2, 3], pa.int64()),
            "op": pa.array(["INSERT", "INSERT", "INSERT"]),
            "doc_id": pa.array(["a", "b", "c"]),
            "n_tok": pa.array([10, 2, 8], pa.int32()),
        }
    )
    route_changes(
        feed, cat,
        routes={"long": {"expr": ["ge", ["col", "n_tok"], 5]}},
        lakes=lakes, default="rest", apply_kwargs=kw,
    )
    assert set(
        final_state_table(lakes["long"])["doc_id"].to_pylist()
    ) == {"a", "c"}
    # DELETE with minimal payload (no n_tok column): absent column is
    # no-match — lands on the default, where its key lives... but here
    # key "a" lives in "long"; the router is content-based, so the
    # operator must route deletes by a column DELETEs carry. Show the
    # fall-through contract explicitly:
    dele = pa.table(
        {
            "lsn": pa.array([9], pa.int64()),
            "op": pa.array(["DELETE"]),
            "doc_id": pa.array(["b"]),
        }
    )
    res = route_changes(
        dele, cat,
        routes={"long": {"expr": ["ge", ["col", "n_tok"], 5]}},
        lakes=lakes, default="rest", apply_kwargs=kw,
    )
    assert res.events_routed["rest"] == 1
    # "b" lived in rest, so the delete lands where the row is
    assert "b" not in set(
        final_state_table(lakes["rest"])["doc_id"].to_pylist()
    )


def test_route_crash_mid_fanout_catalog_unchanged(tmp_path, ray_session):
    """A crash after SOME lake applies leaves the catalog unchanged
    (snapshot readers see the pre-transaction cut) and the re-run
    converges — commit_transaction's contract witnessed through the
    router."""
    import palimpzest_ray.cdc.catalog as catmod

    t, p = _feed(tmp_path)
    cat = str(tmp_path / "cat")
    lakes = {"web": str(tmp_path / "web"), "rest": str(tmp_path / "rest")}
    kw = {n: {"num_partitions": 2} for n in lakes}

    real_apply = catmod.apply_changes
    calls = {"n": 0}

    def _boom(changes, lake_root, **kwargs):
        calls["n"] += 1
        if calls["n"] == 2:  # first lake lands, second dies
            raise RuntimeError("induced crash mid-fanout")
        return real_apply(changes, lake_root, **kwargs)

    catmod.apply_changes = _boom
    try:
        with pytest.raises(RuntimeError, match="induced"):
            route_changes(
                p, cat,
                routes={"web": [("source", "==", "web")]},
                lakes=lakes, default="rest", apply_kwargs=kw,
            )
    finally:
        catmod.apply_changes = real_apply
    # no catalog version exists — readers cannot see the half-applied cut
    assert not os.path.exists(os.path.join(cat, "CATALOG-v1.json"))

    # re-run converges: both lakes correct, ONE catalog version
    res = route_changes(
        p, cat,
        routes={"web": [("source", "==", "web")]},
        lakes=lakes, default="rest", apply_kwargs=kw,
    )
    assert res.events_routed["web"] == 30
    assert snapshot(cat).version == 1
    got = final_state_table(lakes["web"])
    want = t.filter(pc.equal(t["source"], "web"))
    assert set(got["doc_id"].to_pylist()) == set(want["doc_id"].to_pylist())
    assert final_state_table(lakes["rest"]).num_rows == 60


@pytest.mark.usefixtures("ray_session")
def test_route_partition_property(tmp_path_factory):
    """Property: under random predicate sets with a default, routing is
    a PARTITION of the feed — every event lands in exactly one lake and
    the union of all lakes equals the feed."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    thresholds = st.lists(
        st.integers(0, 10), min_size=1, max_size=3, unique=True
    )

    @given(ts=thresholds)
    @settings(max_examples=6, deadline=None)
    def check(ts):
        tmp = tmp_path_factory.mktemp("routeprop")
        n = 40
        feed = pa.table(
            {
                "lsn": pa.array(range(1, n + 1), pa.int64()),
                "op": pa.array(["INSERT"] * n),
                "doc_id": pa.array([f"d{i:03d}" for i in range(n)]),
                "v": pa.array([i % 11 for i in range(n)], pa.int64()),
            }
        )
        routes = {
            f"r{i}": [("v", "<", t)] for i, t in enumerate(sorted(ts))
        }
        lakes = {k: str(tmp / k) for k in routes}
        lakes["rest"] = str(tmp / "rest")
        res = route_changes(
            feed, str(tmp / "cat"), routes=routes, lakes=lakes,
            default="rest",
            apply_kwargs={k: {"num_partitions": 2} for k in lakes},
        )
        assert res.events_in == n
        assert sum(res.events_routed.values()) == n
        seen: list[str] = []
        for k, root in lakes.items():
            if os.path.exists(os.path.join(root, "LATEST")):
                seen.extend(
                    final_state_table(root)["doc_id"].to_pylist()
                )
        assert sorted(seen) == sorted(feed["doc_id"].to_pylist())

    check()
