"""Catalog-level subscriptions: consistent multi-table change feeds
with per-lake retention floors and poll/ack redelivery."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import (
    apply_changes,
    final_state_table,
    list_subscriptions,
    vacuum,
)
from palimpzest_ray.cdc.catalog import (
    catalog_ack,
    catalog_poll,
    catalog_subscribe,
    catalog_unsubscribe,
    commit_transaction,
    read_table,
)


def _feed(tmp_path, name, rows):
    t = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("lsn", pa.int64()), ("op", pa.string()),
             ("doc_id", pa.string()), ("v", pa.int64())]
        ),
    )
    p = os.path.join(str(tmp_path), name)
    pq.write_table(t, p)
    return p


def _collect(ds) -> pa.Table:
    return pa.concat_tables(
        ds.iter_batches(batch_format="pyarrow", batch_size=4096)
    )


def test_catalog_subscription_consistent_replication(
    tmp_path, ray_session
):
    cat = str(tmp_path / "cat")
    lakes = {"a": str(tmp_path / "a"), "b": str(tmp_path / "b")}
    kw = {n: {"num_partitions": 2} for n in lakes}
    commit_transaction(
        cat,
        {
            "a": _feed(tmp_path, "a1.parquet", [
                {"lsn": i, "op": "INSERT", "doc_id": f"d{i}", "v": i}
                for i in range(1, 6)
            ]),
            "b": _feed(tmp_path, "b1.parquet", [
                {"lsn": i, "op": "INSERT", "doc_id": f"x{i}", "v": 10 * i}
                for i in range(1, 4)
            ]),
        },
        lakes, apply_kwargs=kw,
    )
    cur = catalog_subscribe(cat, "mirror")
    assert cur["catalog_version"] == 1
    # per-lake retention subscriptions were registered
    assert list_subscriptions(lakes["a"]) == {"cat-mirror-a": 1}
    assert list_subscriptions(lakes["b"]) == {"cat-mirror-b": 1}

    # bootstrap replicas at the subscribed cut
    from palimpzest_ray.cdc.snapshot import clone_lake

    reps = {n: str(tmp_path / f"rep_{n}") for n in lakes}
    for n in lakes:
        clone_lake(lakes[n], reps[n])

    # caught up: every feed None
    feeds, token = catalog_poll(cat, "mirror")
    assert feeds == {"a": None, "b": None} and token == 1

    # one cross-table transaction + one a-only transaction
    commit_transaction(
        cat,
        {
            "a": _feed(tmp_path, "a2.parquet", [
                {"lsn": 100, "op": "UPDATE", "doc_id": "d1", "v": 999},
                {"lsn": 101, "op": "DELETE", "doc_id": "d2", "v": None},
            ]),
            "b": _feed(tmp_path, "b2.parquet", [
                {"lsn": 100, "op": "INSERT", "doc_id": "x9", "v": 90},
            ]),
        },
        lakes, apply_kwargs=kw,
    )
    commit_transaction(
        cat,
        {"a": _feed(tmp_path, "a3.parquet", [
            {"lsn": 200, "op": "UPDATE", "doc_id": "d3", "v": -1},
        ])},
        lakes, apply_kwargs=kw,
    )

    feeds, token = catalog_poll(cat, "mirror")
    assert token == 3
    assert feeds["a"] is not None and feeds["b"] is not None
    # crash-before-ack: identical redelivery
    feeds2, token2 = catalog_poll(cat, "mirror")
    assert token2 == token
    ta, ta2 = _collect(feeds["a"]), _collect(feeds2["a"])
    assert ta.sort_by("doc_id").equals(ta2.sort_by("doc_id"))

    for n in lakes:
        apply_changes(_collect(feeds2[n]) if n == "b" else ta, reps[n])
    catalog_ack(cat, "mirror", token)

    # replicas equal the catalog-head cuts of their tables
    for n in lakes:
        want = _collect(read_table(cat, n))
        assert final_state_table(reps[n]).equals(
            want.sort_by("doc_id").select(
                final_state_table(reps[n]).column_names
            )
        )

    # retention floors advanced with the ack
    assert list_subscriptions(lakes["a"]) == {"cat-mirror-a": 3}
    vacuum(lakes["a"], keep_versions=1)

    # table untouched since the cut: poll None for it
    feeds3, _ = catalog_poll(cat, "mirror")
    assert feeds3 == {"a": None, "b": None}

    catalog_unsubscribe(cat, "mirror")
    assert list_subscriptions(lakes["a"]) == {}
    with pytest.raises(FileNotFoundError):
        catalog_poll(cat, "mirror")


def test_catalog_subscribe_all_or_nothing_and_dup(tmp_path, ray_session):
    cat = str(tmp_path / "cat")
    lakes = {"a": str(tmp_path / "a")}
    commit_transaction(
        cat,
        {"a": _feed(tmp_path, "a1.parquet", [
            {"lsn": 1, "op": "INSERT", "doc_id": "d1", "v": 1},
        ])},
        lakes, apply_kwargs={"a": {"num_partitions": 2}},
    )
    catalog_subscribe(cat, "m")
    with pytest.raises(ValueError, match="already exists"):
        catalog_subscribe(cat, "m")
    # the failed duplicate left no extra per-lake cursors behind
    assert list_subscriptions(lakes["a"]) == {"cat-m-a": 1}


def test_catalog_ack_registers_new_table(tmp_path, ray_session):
    """ADVICE r3 (catalog.py:257): a table added to the catalog AFTER
    catalog_subscribe must be registered on the next ack — per-lake
    retention subscription created, and the poll after that ack
    delivering its FULL pinned state as upserts (from_v=0 baseline)."""
    cat = str(tmp_path / "cat")
    lakes = {"a": str(tmp_path / "a"), "c": str(tmp_path / "c")}
    kw = {n: {"num_partitions": 2} for n in lakes}
    commit_transaction(
        cat,
        {"a": _feed(tmp_path, "a1.parquet", [
            {"lsn": i, "op": "INSERT", "doc_id": f"d{i}", "v": i}
            for i in range(1, 4)
        ])},
        {"a": lakes["a"]}, apply_kwargs=kw,
    )
    catalog_subscribe(cat, "m")

    # a NEW table joins the catalog after the cursor exists
    commit_transaction(
        cat,
        {"c": _feed(tmp_path, "c1.parquet", [
            {"lsn": i, "op": "INSERT", "doc_id": f"n{i}", "v": 100 + i}
            for i in range(1, 3)
        ])},
        lakes, apply_kwargs=kw,
    )
    feeds, tok = catalog_poll(cat, "m")
    assert "c" not in feeds  # not yet registered: cursor predates it
    cur = catalog_ack(cat, "m", tok)
    assert "c" in cur["tables"] and cur["tables"]["c"]["from_v"] == 0
    # retention floor now protects the new lake for this consumer
    assert "cat-m-c" in list_subscriptions(lakes["c"])

    # next cycle: full pinned state of c arrives as upserts
    feeds2, tok2 = catalog_poll(cat, "m")
    assert feeds2["a"] is None  # unchanged
    got = _collect(feeds2["c"])
    assert sorted(got["doc_id"].to_pylist()) == ["n1", "n2"]
    assert set(got["op"].to_pylist()) <= {"UPDATE", "INSERT"}
    cur2 = catalog_ack(cat, "m", tok2)
    assert cur2["tables"]["c"]["from_v"] >= 1
    # and a further poll is quiet
    feeds3, _ = catalog_poll(cat, "m")
    assert feeds3["c"] is None


def test_catalog_ack_registers_vacuumed_new_table(tmp_path, ray_session):
    """Review r4: a table that joins the catalog AFTER its early
    versions were vacuumed must still register on ack — the retention
    subscription pins the EARLIEST RETAINED version, not a hardcoded
    v1 (which would FileNotFoundError and wedge the cursor forever)."""
    from palimpzest_ray.cdc import vacuum

    cat = str(tmp_path / "cat")
    lakes = {"a": str(tmp_path / "a"), "c": str(tmp_path / "c")}
    kw = {n: {"num_partitions": 2} for n in lakes}
    commit_transaction(
        cat,
        {"a": _feed(tmp_path, "a1.parquet", [
            {"lsn": 1, "op": "INSERT", "doc_id": "d1", "v": 1}])},
        {"a": lakes["a"]}, apply_kwargs=kw,
    )
    catalog_subscribe(cat, "m")

    # the new lake accumulates 3 versions, then v1/v2 are vacuumed,
    # BEFORE it joins the catalog
    for i in range(1, 4):
        commit_transaction(
            cat,
            {"c": _feed(tmp_path, f"c{i}.parquet", [
                {"lsn": i, "op": "INSERT", "doc_id": f"n{i}",
                 "v": 100 + i}])},
            lakes, apply_kwargs=kw,
        )
    vacuum(lakes["c"], keep_versions=1)

    feeds, tok = catalog_poll(cat, "m")
    cur = catalog_ack(cat, "m", tok)  # must not raise
    assert cur["tables"]["c"]["from_v"] == 0
    feeds2, tok2 = catalog_poll(cat, "m")
    got = _collect(feeds2["c"])
    assert sorted(got["doc_id"].to_pylist()) == ["n1", "n2", "n3"]
    catalog_ack(cat, "m", tok2)
