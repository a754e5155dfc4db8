"""Incremental inverted token index (cdc/index.py): build == brute
force, refresh == rebuild after update/delete/insert epochs, any/all
search semantics, partition-pruned reads."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import apply_changes, final_state_table, make_base_table, make_change_table
from palimpzest_ray.cdc import index as tix


def _write(tmp_path, name, table):
    p = os.path.join(str(tmp_path), name)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    pq.write_table(table, p)
    return p


def _seed(tmp_path, lake, n_base=300):
    base = make_base_table(n_base, seed=11)
    boot = pa.table(
        {
            "lsn": pa.array([0] * base.num_rows, pa.int64()),
            "op": pa.array(["INSERT"] * base.num_rows),
            **{c: base[c] for c in base.column_names},
        }
    )
    apply_changes(_write(tmp_path, "boot/log.parquet", boot), lake, num_partitions=8)


def _brute(lake, tokens, mode):
    t = final_state_table(lake)
    hits = {}
    for d, toks in zip(t["doc_id"].to_pylist(), t["tokens"].to_pylist()):
        s = set(toks or [])
        got = s & set(tokens)
        if got:
            hits[d] = got
    if mode == "any":
        return sorted(hits)
    return sorted(d for d, s in hits.items() if set(tokens) <= s)


def _some_tokens(lake, k=3):
    t = final_state_table(lake)
    toks = t["tokens"].to_pylist()
    return sorted({toks[0][0], toks[1][0], toks[2][0]})[:k]


def test_build_and_search_matches_brute_force(tmp_path):
    lake = str(tmp_path / "lake")
    idx = str(tmp_path / "idx")
    _seed(tmp_path, lake)
    tix.build_token_index(lake, idx, num_partitions=8)
    probe = _some_tokens(lake)
    for mode in ("any", "all"):
        assert tix.search_tokens(idx, probe, mode=mode) == _brute(lake, probe, mode)
    with pytest.raises(ValueError, match="any"):
        tix.search_tokens(idx, probe, mode="nope")


def test_refresh_equals_rebuild_after_epochs(tmp_path):
    lake = str(tmp_path / "lake")
    idx = str(tmp_path / "idx")
    idx2 = str(tmp_path / "idx_rebuilt")
    _seed(tmp_path, lake)
    tix.build_token_index(lake, idx, num_partitions=8)

    log2 = make_change_table(1200, 300, seed=12, start_lsn=1, new_key_space=60)
    apply_changes(_write(tmp_path, "e2/log.parquet", log2), lake, num_partitions=8)
    r = tix.refresh_token_index(lake, idx)
    assert r["refreshed"] and r["posting_events"] > 0

    tix.build_token_index(lake, idx2, num_partitions=8)
    probe = _some_tokens(lake)
    for mode in ("any", "all"):
        got = tix.search_tokens(idx, probe, mode=mode)
        assert got == tix.search_tokens(idx2, probe, mode=mode)
        assert got == _brute(lake, probe, mode)

    # second epoch composes; no-op refresh fast path
    log3 = make_change_table(600, 360, seed=13, start_lsn=5000)
    apply_changes(_write(tmp_path, "e3/log.parquet", log3), lake, num_partitions=8)
    tix.refresh_token_index(lake, idx)
    probe = _some_tokens(lake)
    assert tix.search_tokens(idx, probe) == _brute(lake, probe, "any")
    assert tix.refresh_token_index(lake, idx)["refreshed"] is False


def test_deleted_doc_leaves_the_index(tmp_path):
    lake = str(tmp_path / "lake")
    idx = str(tmp_path / "idx")
    base = pa.table(
        {
            "doc_id": pa.array(["a", "b"]),
            "tokens": pa.array([[7, 8], [7, 9]], pa.list_(pa.int32())),
            "n_tok": pa.array([2, 2], pa.int32()),
            "source": pa.array(["s", "s"]),
        }
    )
    boot = pa.table(
        {
            "lsn": pa.array([0, 0], pa.int64()),
            "op": pa.array(["INSERT"] * 2),
            **{c: base[c] for c in base.column_names},
        }
    )
    apply_changes(_write(tmp_path, "b/log.parquet", boot), lake, num_partitions=2)
    tix.build_token_index(lake, idx, num_partitions=4)
    assert tix.search_tokens(idx, [7]) == ["a", "b"]
    log = pa.table(
        {
            "lsn": pa.array([1, 2], pa.int64()),
            "op": pa.array(["DELETE", "UPDATE"]),
            "doc_id": pa.array(["a", "b"]),
            "tokens": pa.array([None, [9, 10]], pa.list_(pa.int32())),
            "n_tok": pa.array([None, 2], pa.int32()),
            "source": pa.array([None, "s"]),
        }
    )
    apply_changes(_write(tmp_path, "d/log.parquet", log), lake, num_partitions=2)
    tix.refresh_token_index(lake, idx)
    assert tix.search_tokens(idx, [7]) == []          # a deleted, b lost 7
    assert tix.search_tokens(idx, [9, 10], mode="all") == ["b"]
    assert tix.search_tokens(idx, [8]) == []


def test_lake_key_contract_enforced_and_repartition_safe(tmp_path):
    """The manifest persists (key, partition_key); a mismatched apply
    fails loudly instead of LWW-collapsing distinct rows, rebuilding
    into an existing index root is refused, and repartition_lake
    forwards the stored contract so the posting lake survives it."""
    lake = str(tmp_path / "lake")
    idx = str(tmp_path / "idx")
    _seed(tmp_path, lake, n_base=120)
    tix.build_token_index(lake, idx, num_partitions=4)
    probe = _some_tokens(lake)
    before = tix.search_tokens(idx, probe)

    # wrong-contract apply on the posting lake: refused
    bad = pa.table(
        {
            "lsn": pa.array([99], pa.int64()),
            "op": pa.array(["DELETE"]),
            "doc_id": pa.array(["x"]),
        }
    )
    with pytest.raises(ValueError, match="keyed on"):
        apply_changes(_write(tmp_path, "bad/log.parquet", bad), idx,
                      num_partitions=4)

    # rebuild into an existing root: refused
    with pytest.raises(ValueError, match="already holds"):
        tix.build_token_index(lake, idx, num_partitions=4)

    # repartition keeps identity AND token-pruned search correctness
    from palimpzest_ray.cdc import repartition_lake

    repartition_lake(idx, 9)
    assert tix.search_tokens(idx, probe) == before


def test_lookup_all_miss_schema_is_user_only(tmp_path):
    from palimpzest_ray.cdc import lookup

    lake = str(tmp_path / "lake")
    _seed(tmp_path, lake, n_base=10)
    t = lookup(lake, ["definitely-not-a-doc"])
    assert t.num_rows == 0
    assert not any(c.startswith("_") for c in t.column_names)
