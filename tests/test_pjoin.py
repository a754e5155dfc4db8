"""Storage-partitioned join (cdc/pjoin.py): zero-exchange equi-join of
co-partitioned lakes, checked against a driver-side arrow join of the
full resolved tables."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import (
    apply_changes,
    delete_keys,
    final_state_table,
    join_lakes,
)
from palimpzest_ray.cdc.synth import make_base_table

_ARROW_HOW = {
    "inner": "inner",
    "left": "left outer",
    "right": "right outer",
    "outer": "full outer",
}


def _boot(tmp_path, lake, table, nparts, tag):
    boot = pa.table(
        {
            "lsn": pa.array([0] * table.num_rows, pa.int64()),
            "op": pa.array(["INSERT"] * table.num_rows),
            **{c: table[c] for c in table.column_names},
        }
    )
    p = os.path.join(str(tmp_path), f"boot-{tag}.parquet")
    pq.write_table(boot, p)
    apply_changes(p, lake, num_partitions=nparts)


def _pair(tmp_path, pl, pr, n=160):
    base = make_base_table(n, seed=5)
    lake_a = str(tmp_path / f"a{pl}")
    _boot(tmp_path, lake_a, base, pl, f"a{pl}")
    half = base.filter(pa.array([i % 2 == 0 for i in range(n)]))
    scores = pa.table(
        {
            "doc_id": half["doc_id"],
            "score": pa.array(
                [i % 10 for i in range(half.num_rows)], pa.int32()
            ),
        }
    )
    lake_b = str(tmp_path / f"b{pr}")
    _boot(tmp_path, lake_b, scores, pr, f"b{pr}")
    return lake_a, lake_b


def _collect(ds) -> pa.Table:
    return pa.concat_tables(
        ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20)
    ).combine_chunks()


@pytest.mark.parametrize("pl,pr", [(8, 8), (8, 4), (4, 8)])
@pytest.mark.parametrize("how", ["inner", "left", "right", "outer"])
def test_join_lakes_matches_arrow_join(tmp_path, how, pl, pr):
    lake_a, lake_b = _pair(tmp_path, pl, pr)
    ds = join_lakes(
        lake_a, lake_b, how=how,
        columns_left=["n_tok", "source"], columns_right=["score"],
    )
    got = _collect(ds).sort_by("doc_id")
    a = final_state_table(lake_a).select(["doc_id", "n_tok", "source"])
    b = final_state_table(lake_b).select(["doc_id", "score"])
    want = a.join(b, keys=["doc_id"], join_type=_ARROW_HOW[how]).sort_by(
        "doc_id"
    )
    assert got.select(want.column_names).equals(want.combine_chunks())


def test_join_lakes_excludes_tombstones_and_plans_map_only(tmp_path):
    lake_a, lake_b = _pair(tmp_path, 8, 8, n=80)
    dead = final_state_table(lake_b)["doc_id"].to_pylist()[:10]
    delete_keys(lake_b, dead)
    ds = join_lakes(lake_a, lake_b, how="inner", columns_right=["score"])
    # zero-exchange shape: the plan is MapBatches over the tiny id
    # table — no Sort / HashShuffle / Aggregate over data
    plan = str(ds)
    assert "MapBatches(_join_part)" in plan
    assert "Sort" not in plan and "Aggregate" not in plan
    got = _collect(ds)
    assert set(dead).isdisjoint(got["doc_id"].to_pylist())
    b_live = final_state_table(lake_b)
    assert got.num_rows == b_live.num_rows


def test_join_lakes_refuses_incompatible(tmp_path):
    lake_a, _ = _pair(tmp_path, 8, 8, n=40)
    base = make_base_table(20, seed=6)
    odd = str(tmp_path / "odd")
    _boot(tmp_path, odd, base, 3, "odd")  # 3 ∤ 8 and 8 ∤ 3
    with pytest.raises(ValueError, match="not divisible"):
        join_lakes(lake_a, odd)
    intkeys = pa.table(
        {"doc_id": pa.array([1, 2, 3], pa.int64()),
         "score": pa.array([1, 2, 3], pa.int32())}
    )
    ik = str(tmp_path / "ik")
    _boot(tmp_path, ik, intkeys, 8, "ik")
    with pytest.raises(ValueError, match="key types differ"):
        join_lakes(lake_a, ik)
