"""lake_count: exact COUNT(*) from manifest metadata (zero parquet I/O)
and the predicate fallback's pruned counting scan."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import (
    apply_changes,
    delete_where,
    final_state_table,
    lake_count,
    make_base_table,
    make_change_table,
)


def _boot(tmp_path, lake, base, nparts=8):
    boot = pa.table(
        {
            "lsn": pa.array([0] * base.num_rows, pa.int64()),
            "op": pa.array(["INSERT"] * base.num_rows),
            **{c: base[c] for c in base.column_names},
        }
    )
    p = os.path.join(str(tmp_path), "boot.parquet")
    pq.write_table(boot, p)
    apply_changes(p, lake, num_partitions=nparts)


def test_lake_count_metadata_only(tmp_path, tmp_lake, monkeypatch):
    base = make_base_table(300, seed=3)
    _boot(tmp_path, tmp_lake, base)
    ch = make_change_table(1_500, 300, seed=4)
    log = os.path.join(str(tmp_path), "log.parquet")
    pq.write_table(ch, log)
    apply_changes(log, tmp_lake, num_partitions=8)
    # delta chain + DML so `rows` is exercised through every mutator
    ch2 = make_change_table(400, 300, seed=5, start_lsn=10_000)
    log2 = os.path.join(str(tmp_path), "log2.parquet")
    pq.write_table(ch2, log2)
    apply_changes(log2, tmp_lake, num_partitions=8, mode="delta")
    delete_where(tmp_lake, [("source", "==", "web")], mode="delta")

    want = final_state_table(tmp_lake).num_rows

    # zero-I/O proof: any parquet DATA read fails the test
    import palimpzest_ray.cdc.engine as eng

    def _boom(*a, **k):  # pragma: no cover - should never run
        raise AssertionError("metadata-only count read a parquet file")

    monkeypatch.setattr(eng.pq, "read_table", _boom)
    assert lake_count(tmp_lake) == want


def test_lake_minmax_metadata_when_clean(tmp_path, tmp_lake, monkeypatch):
    """Chain-free tombstone-free lake: min/max answers from zone maps
    with zero parquet I/O and equals the scan truth."""
    base = make_base_table(250, seed=8)
    _boot(tmp_path, tmp_lake, base)
    from palimpzest_ray.cdc import lake_minmax

    state = final_state_table(tmp_lake)
    want_n = (
        min(state["n_tok"].to_pylist()), max(state["n_tok"].to_pylist())
    )
    want_s = (
        min(state["source"].to_pylist()), max(state["source"].to_pylist())
    )
    import palimpzest_ray.cdc.engine as eng

    def _boom(*a, **k):  # pragma: no cover
        raise AssertionError("clean-lake minmax read a parquet file")

    monkeypatch.setattr(eng.pq, "read_table", _boom)
    got = lake_minmax(tmp_lake, ["n_tok", "source"])
    assert got["n_tok"] == want_n and got["source"] == want_s
    with pytest.raises(TypeError, match="scalar column"):
        lake_minmax(tmp_lake, "tokens")
    with pytest.raises(KeyError):
        lake_minmax(tmp_lake, "nope")


def test_lake_minmax_falls_back_when_extreme_deleted(tmp_path, tmp_lake):
    """Deleting the row holding the global max must change the answer —
    the tombstone-bearing partition takes the exact resolve path (the
    stale zone map is a bound, not the answer)."""
    base = make_base_table(120, seed=9)
    _boot(tmp_path, tmp_lake, base)
    from palimpzest_ray.cdc import delete_keys, lake_minmax

    state = final_state_table(tmp_lake)
    rows = state.to_pylist()
    mx = max(r["n_tok"] for r in rows)
    doomed = [r["doc_id"] for r in rows if r["n_tok"] == mx]
    delete_keys(tmp_lake, doomed, mode="delta")  # tombstones + chains
    survivors = [r["n_tok"] for r in rows if r["doc_id"] not in set(doomed)]
    got = lake_minmax(tmp_lake, "n_tok")["n_tok"]
    assert got == (min(survivors), max(survivors))
    assert got[1] < mx
    # time travel still sees the old extreme
    assert lake_minmax(tmp_lake, "n_tok", version=1)["n_tok"][1] == mx


def test_lake_count_predicate_and_version(tmp_path, tmp_lake):
    base = make_base_table(200, seed=6)
    _boot(tmp_path, tmp_lake, base)
    state1 = final_state_table(tmp_lake)
    n_books = sum(1 for s in state1["source"].to_pylist() if s == "books")
    assert lake_count(
        tmp_lake, predicate=[("source", "==", "books")]
    ) == n_books
    delete_where(tmp_lake, [("source", "==", "books")])
    assert lake_count(tmp_lake) == state1.num_rows - n_books
    # time travel: version 1 still counts the pre-delete state
    assert lake_count(tmp_lake, version=1) == state1.num_rows
    with pytest.raises(FileNotFoundError):
        lake_count(str(tmp_path / "nope"))
