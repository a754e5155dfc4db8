"""aggregate_lake: zero-exchange GROUP BY the routing column, including
holistic aggregates, checked against duckdb over the resolved state."""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import (
    aggregate_lake,
    apply_changes,
    delete_where,
    final_state_table,
)
from palimpzest_ray.cdc.synth import make_base_table, make_change_table


def _boot(tmp_path, lake, base, **kw):
    boot = pa.table(
        {
            "lsn": pa.array([0] * base.num_rows, pa.int64()),
            "op": pa.array(["INSERT"] * base.num_rows),
            **{c: base[c] for c in base.column_names},
        }
    )
    p = os.path.join(str(tmp_path), "boot.parquet")
    pq.write_table(boot, p)
    apply_changes(p, lake, **kw)


def _collect(ds) -> pa.Table:
    return pa.concat_tables(
        ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20)
    ).combine_chunks()


SPECS = ["count(*)", "sum(n_tok)", "avg(n_tok)", "min(n_tok)",
         "max(n_tok)", "count_distinct(doc_id)", "stddev(n_tok)"]
SQL = """
  select source, count(*) as "count(*)", sum(n_tok) as "sum(n_tok)",
         avg(n_tok) as "avg(n_tok)", min(n_tok) as "min(n_tok)",
         max(n_tok) as "max(n_tok)",
         count(distinct doc_id) as "count_distinct(doc_id)",
         stddev_samp(n_tok) as "stddev(n_tok)"
  from t group by source order by source
"""


def _check(lake):
    got = _collect(aggregate_lake(lake, SPECS)).sort_by("source")
    # private connection: duckdb.arrow(...).query("t", ...) would create a
    # persistent view named "t" in the shared default connection, shadowing
    # every later test's replacement-scan of a local variable `t`
    con = duckdb.connect()
    con.register("t", final_state_table(lake))
    want = con.execute(SQL).arrow()
    con.close()
    g, w = got.to_pydict(), want.to_pydict()
    assert g["source"] == w["source"]
    for k in SPECS:
        if k in ("avg(n_tok)", "stddev(n_tok)"):
            assert all(
                abs(a - b) < 1e-9 for a, b in zip(g[k], w[k])
            ), k
        else:
            assert g[k] == w[k], k


def test_aggregate_lake_matches_duckdb_and_survives_mutation(
    tmp_path, tmp_lake
):
    base = make_base_table(400, seed=12)
    _boot(tmp_path, tmp_lake, base, num_partitions=8,
          partition_key="source")
    _check(tmp_lake)
    # tombstones + delta chains must not change the answer's contract
    delete_where(tmp_lake, [("n_tok", "<", 50)], mode="delta")
    _check(tmp_lake)
    # plan shape: one map stage over partition ids, no exchange
    plan = str(aggregate_lake(tmp_lake, ["count(*)"]))
    assert "MapBatches(_agg_part)" in plan
    assert "Sort" not in plan and "Aggregate" not in plan


def test_aggregate_lake_refuses_non_routing_group(tmp_path, tmp_lake):
    base = make_base_table(60, seed=13)
    _boot(tmp_path, tmp_lake, base, num_partitions=4,
          partition_key="source")
    with pytest.raises(ValueError, match="not co-located"):
        aggregate_lake(tmp_lake, ["count(*)"], by="n_tok")
    with pytest.raises(ValueError, match="unsupported aggregate"):
        aggregate_lake(tmp_lake, ["median(n_tok)"])
    with pytest.raises(KeyError):
        aggregate_lake(tmp_lake, ["sum(nope)"])
