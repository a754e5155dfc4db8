"""Multi-lake catalog (cdc/catalog.py): atomic cross-table snapshots —
a crash between lake applies is invisible to catalog readers; re-run
converges and publishes; snapshot reads are consistent cuts."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest
import ray.data as rd

from palimpzest_ray.cdc import apply_changes
from palimpzest_ray.cdc import catalog as CAT
from palimpzest_ray.schemas import CHANGELOG_SCHEMA


def _events(rows):
    return pa.Table.from_pylist(rows, CHANGELOG_SCHEMA)


def _ev(lsn, op, doc, tok=None, src="w"):
    return {
        "lsn": lsn, "op": op, "doc_id": doc,
        "tokens": tok, "n_tok": len(tok) if tok else None,
        "source": src if op != "DELETE" else None,
    }


@pytest.fixture()
def two_lakes(tmp_path):
    a = os.path.join(str(tmp_path), "orders_lake")
    b = os.path.join(str(tmp_path), "items_lake")
    cat = os.path.join(str(tmp_path), "catalog")
    apply_changes(
        rd.from_arrow(_events([_ev(1, "INSERT", "o1", [1])])),
        a, num_partitions=2, change_schema=CHANGELOG_SCHEMA,
    )
    apply_changes(
        rd.from_arrow(_events([_ev(1, "INSERT", "i1", [2])])),
        b, num_partitions=2, change_schema=CHANGELOG_SCHEMA,
    )
    CAT.commit_catalog(cat, {"orders": (a, None), "items": (b, None)})
    return a, b, cat


def test_snapshot_pins_consistent_cut(two_lakes, tmp_path):
    a, b, cat = two_lakes
    snap1 = CAT.snapshot(cat)
    assert snap1.version == 1
    assert snap1.pin("orders")[1] == 1 and snap1.pin("items")[1] == 1

    # transaction touching BOTH lakes
    snap2 = CAT.commit_transaction(
        cat,
        {
            "orders": rd.from_arrow(_events([_ev(2, "INSERT", "o2", [3])])),
            "items": rd.from_arrow(_events([_ev(2, "INSERT", "i2", [4])])),
        },
        {"orders": a, "items": b},
        apply_kwargs={
            "orders": {"change_schema": CHANGELOG_SCHEMA},
            "items": {"change_schema": CHANGELOG_SCHEMA},
        },
    )
    assert snap2.version == 2
    # old snapshot still reads the OLD cut of both tables
    old_orders = CAT.read_table(cat, "orders", catalog_version=1)
    old_items = CAT.read_table(cat, "items", catalog_version=1)
    assert sorted(
        r["doc_id"] for r in old_orders.take_all()
    ) == ["o1"]
    assert sorted(r["doc_id"] for r in old_items.take_all()) == ["i1"]
    new_orders = CAT.read_table(cat, "orders")
    assert sorted(
        r["doc_id"] for r in new_orders.take_all()
    ) == ["o1", "o2"]


def test_crashed_transaction_invisible_then_rerun_publishes(two_lakes):
    a, b, cat = two_lakes

    # crash AFTER lake 'orders' applied, BEFORE the catalog commit:
    # simulate by applying one lake directly (no catalog commit)
    apply_changes(
        rd.from_arrow(_events([_ev(3, "INSERT", "o3", [9])])),
        a, change_schema=CHANGELOG_SCHEMA,
    )
    # catalog readers still see the old cut
    assert CAT.snapshot(cat).version == 1
    got = sorted(
        r["doc_id"] for r in CAT.read_table(cat, "orders").take_all()
    )
    assert got == ["o1"]  # o3 is committed to the lake but unpublished

    # re-run the FULL transaction (the orders apply is LWW-idempotent)
    snap = CAT.commit_transaction(
        cat,
        {
            "orders": rd.from_arrow(_events([_ev(3, "INSERT", "o3", [9])])),
            "items": rd.from_arrow(_events([_ev(3, "INSERT", "i3", [8])])),
        },
        {"orders": a, "items": b},
        apply_kwargs={
            "orders": {"change_schema": CHANGELOG_SCHEMA},
            "items": {"change_schema": CHANGELOG_SCHEMA},
        },
    )
    assert snap.version == 2
    got = sorted(
        r["doc_id"] for r in CAT.read_table(cat, "orders").take_all()
    )
    assert got == ["o1", "o3"]
    got_i = sorted(
        r["doc_id"] for r in CAT.read_table(cat, "items").take_all()
    )
    assert got_i == ["i1", "i3"]


def test_transaction_carries_untouched_tables(two_lakes):
    a, b, cat = two_lakes
    snap = CAT.commit_transaction(
        cat,
        {"orders": rd.from_arrow(_events([_ev(5, "INSERT", "o5", [1])]))},
        {"orders": a},
        apply_kwargs={"orders": {"change_schema": CHANGELOG_SCHEMA}},
    )
    # 'items' pin carried forward from the previous catalog version
    assert snap.pin("items")[1] == 1
    assert snap.pin("orders")[1] == 2


def test_lookup_table_pins_version(two_lakes):
    a, b, cat = two_lakes
    CAT.commit_transaction(
        cat,
        {"orders": rd.from_arrow(
            _events([_ev(6, "UPDATE", "o1", [5, 5])]))},
        {"orders": a},
        apply_kwargs={"orders": {"change_schema": CHANGELOG_SCHEMA}},
    )
    old = CAT.lookup_table(cat, "orders", ["o1"], catalog_version=1)
    new = CAT.lookup_table(cat, "orders", ["o1"])
    assert old["tokens"].to_pylist() == [[1]]
    assert new["tokens"].to_pylist() == [[5, 5]]


def test_unknown_table_and_empty_catalog(tmp_path):
    with pytest.raises(FileNotFoundError):
        CAT.snapshot(os.path.join(str(tmp_path), "nope"))
    cat = os.path.join(str(tmp_path), "cat")
    lake = os.path.join(str(tmp_path), "lake")
    apply_changes(
        rd.from_arrow(_events([_ev(1, "INSERT", "x", [1])])),
        lake, num_partitions=2, change_schema=CHANGELOG_SCHEMA,
    )
    CAT.commit_catalog(cat, {"t": (lake, None)})
    with pytest.raises(KeyError, match="not in catalog"):
        CAT.snapshot(cat).pin("ghost")
