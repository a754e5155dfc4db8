"""Property-based column-mapping equivalence: a lake that renames (and
widens) mid-history reads EXACTLY like a twin lake that never did —
modulo the column names — whatever mix of old-name and new-name feeds
arrives afterwards. This is the whole-read-path claim the rename
machinery makes (chain reads, conform, zone maps, per-file pruning)
checked against randomized histories rather than scripted ones."""

from __future__ import annotations

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from palimpzest_ray.cdc import (
    alter_schema,
    apply_changes,
    final_state_table,
    fsck,
    load_latest_manifest,
)

KEYS = [f"k{i}" for i in range(10)]


def _events(ops, lsn0, val_col):
    rows = []
    for i, (key_i, op) in enumerate(ops):
        rows.append(
            {
                "lsn": lsn0 + i,
                "op": op,
                "doc_id": KEYS[key_i],
                val_col: (lsn0 + i) % 97 if op != "DELETE" else None,
            }
        )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("lsn", pa.int64()), ("op", pa.string()),
             ("doc_id", pa.string()), (val_col, pa.int32())]
        ),
    )


epoch = st.lists(
    st.tuples(st.integers(0, len(KEYS) - 1),
              st.sampled_from(["INSERT", "UPDATE", "DELETE"])),
    min_size=1, max_size=8,
)


@pytest.mark.usefixtures("ray_session")
@given(
    epochs=st.lists(epoch, min_size=2, max_size=4),
    ddl_after=st.integers(0, 1),
    modes=st.lists(st.sampled_from(["rewrite", "delta"]), min_size=4,
                   max_size=4),
    old_name_after=st.lists(st.booleans(), min_size=4, max_size=4),
    widen_too=st.booleans(),
)
@settings(max_examples=10, deadline=None)
def test_rename_twin_equivalence(tmp_path_factory, epochs, ddl_after,
                                 modes, old_name_after, widen_too):
    tmp = tmp_path_factory.mktemp("ren_prop")
    lake_a = str(tmp / "plain")    # never renames; column stays "val"
    lake_b = str(tmp / "renamed")  # renames val -> metric mid-history
    ddl_at = min(ddl_after, len(epochs) - 2)  # after this epoch index

    lsn = 1
    for e, ops in enumerate(epochs):
        if e == 0:
            ops = [(ops[0][0], "INSERT")] + ops[1:]
        mode = modes[e % len(modes)]
        ta = _events(ops, lsn, "val")
        apply_changes(ta, lake_a, num_partitions=3, mode=mode,
                      exchange="local")
        # twin B: identical events; after the DDL the producer randomly
        # keeps the old name or migrates to the new one
        if e <= ddl_at:
            bcol = "val"
        else:
            bcol = "val" if old_name_after[e % 4] else "metric"
        tb = _events(ops, lsn, bcol)
        if e > ddl_at and widen_too:
            tb = tb.set_column(
                tb.column_names.index(bcol),
                pa.field(bcol, pa.int64()),
                tb[bcol].cast(pa.int64()),
            )
        apply_changes(tb, lake_b, num_partitions=3, mode=mode,
                      exchange="local")
        if e == ddl_at:
            kw = {"rename": {"val": "metric"}}
            if widen_too:
                kw["widen"] = {"val": pa.int64()}
            alter_schema(lake_b, **kw)
        lsn += len(ops) + 3

    a = final_state_table(lake_a)
    b = final_state_table(lake_b)
    assert b.column_names == ["doc_id", "metric"]
    a_as_b = a.rename_columns(["doc_id", "metric"])
    if widen_too:
        a_as_b = a_as_b.set_column(
            1, pa.field("metric", pa.int64()),
            a_as_b["metric"].cast(pa.int64()),
        )
    assert b.equals(a_as_b)

    # per-version equivalence AFTER the DDL version on B: version k of
    # B (k > ddl version) corresponds to version k-... — version
    # numbering differs by the DDL commit, so compare only the heads
    # plus fsck-deep the renamed lake at every version
    head_b = load_latest_manifest(lake_b)
    for v in range(1, head_b.version + 1):
        rep = fsck(lake_b, version=v, deep=True)
        assert rep["ok"], (v, rep["errors"])
