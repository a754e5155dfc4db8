"""Ingest-time broadcast enrichment: feed × small dimension with
index_in/take lookup semantics, DELETE pass-through, and the three
match modes."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import (
    apply_changes,
    apply_enriched,
    enrich_changes,
    final_state_table,
)


def _dim():
    return pa.table(
        {
            "cust": pa.array([10, 20, 30], pa.int64()),
            "name": pa.array(["ann", "bob", "cat"]),
            "tier": pa.array(["gold", "silver", "gold"]),
        }
    )


def _feed(n=12):
    return pa.table(
        {
            "lsn": pa.array(range(1, n + 1), pa.int64()),
            "op": pa.array(["INSERT"] * n),
            "doc_id": pa.array([f"o{i:03d}" for i in range(n)]),
            # 40 matches nothing
            "cust": pa.array([(10, 20, 30, 40)[i % 4] for i in range(n)],
                             pa.int64()),
            "tokens": pa.array(
                [[i, i] for i in range(n)], pa.list_(pa.int32())
            ),
        }
    )


def _collect(ds) -> pa.Table:
    return pa.concat_tables(
        ds.iter_batches(batch_format="pyarrow", batch_size=4096)
    )


def test_left_enrich_and_apply(tmp_path, ray_session):
    lake = str(tmp_path / "lake")
    res = apply_enriched(
        _feed(), lake,
        source=_dim(), on="cust", columns=["name", "tier"],
        num_partitions=4,
    )
    assert res.rows_upserted == 12
    t = final_state_table(lake).sort_by("doc_id")
    by = dict(zip(t["cust"].to_pylist(), zip(t["name"].to_pylist(),
                                             t["tier"].to_pylist())))
    assert by[10] == ("ann", "gold")
    assert by[20] == ("bob", "silver")
    assert by[40] == (None, None)  # left: unmatched keeps nulls
    # nested token payloads rode along untouched
    assert t["tokens"][0].as_py() == [0, 0]


def test_inner_drops_unmatched_but_keeps_deletes(tmp_path, ray_session):
    feed = _feed()
    dele = pa.table(
        {
            "lsn": pa.array([99], pa.int64()),
            "op": pa.array(["DELETE"]),
            "doc_id": pa.array(["o000"]),
            "cust": pa.array([40], pa.int64()),  # unmatched key
            "tokens": pa.nulls(1, pa.list_(pa.int32())),
        }
    )
    out = _collect(enrich_changes(
        pa.concat_tables([feed, dele]),
        source=_dim(), on="cust", columns=["name"], how="inner",
    ))
    # 9 matched inserts + the DELETE (its cust=40 matches nothing)
    assert out.num_rows == 10
    ops = out.filter(pc.equal(out["cust"], 40))["op"].to_pylist()
    assert ops == ["DELETE"]


def test_strict_refuses_unmatched(ray_session):
    with pytest.raises(Exception, match="match no dimension row"):
        _collect(enrich_changes(
            _feed(), source=_dim(), on="cust", columns=["name"],
            how="strict",
        ))
    # strict passes once every non-DELETE key matches
    ok = _feed().filter(pc.not_equal(_feed()["cust"], 40))
    out = _collect(enrich_changes(
        ok, source=_dim(), on="cust", columns=["name"], how="strict",
    ))
    assert out.num_rows == ok.num_rows


def test_dimension_from_lake_with_version_pin(tmp_path, ray_session):
    dim_lake = str(tmp_path / "dim")
    boot = pa.table(
        {
            "lsn": pa.array([1, 2, 3], pa.int64()),
            "op": pa.array(["INSERT"] * 3),
            "doc_id": pa.array(["10", "20", "30"]),
            "name": pa.array(["ann", "bob", "cat"]),
        }
    )
    apply_changes(boot, dim_lake, num_partitions=2)
    upd = pa.table(
        {
            "lsn": pa.array([9], pa.int64()),
            "op": pa.array(["UPDATE"]),
            "doc_id": pa.array(["10"]),
            "name": pa.array(["ANN2"]),
        }
    )
    apply_changes(upd, dim_lake)
    feed = pa.table(
        {
            "lsn": pa.array([1], pa.int64()),
            "op": pa.array(["INSERT"]),
            "doc_id": pa.array(["x"]),
            "cust": pa.array(["10"]),
        }
    )
    now = _collect(enrich_changes(
        feed, source=dim_lake, on="cust", source_key="doc_id",
        columns=["name"],
    ))
    assert now["name"].to_pylist() == ["ANN2"]
    # version pin: enrich against the pre-update dimension cut
    old = _collect(enrich_changes(
        feed, source=dim_lake, on="cust", source_key="doc_id",
        columns=["name"], version=1,
    ))
    assert old["name"].to_pylist() == ["ann"]


def test_enrich_validations(ray_session):
    dup = pa.table(
        {"cust": pa.array([1, 1], pa.int64()), "name": pa.array(["a", "b"])}
    )
    with pytest.raises(ValueError, match="not unique"):
        _collect(enrich_changes(
            _feed(), source=dup, on="cust", columns=["name"]
        ))
    with pytest.raises(ValueError, match="lacks column"):
        _collect(enrich_changes(
            _feed(), source=_dim(), on="cust", columns=["nope"]
        ))
    clash = _feed().append_column("name", pa.array(["x"] * 12))
    with pytest.raises(Exception, match="already exist"):
        _collect(enrich_changes(
            clash, source=_dim(), on="cust", columns=["name"]
        ))


def test_tail_with_enrich_transform(tmp_path, ray_session):
    """The daemon composition: tail_once(transform=...) enriches each
    pending micro-batch before the watermarked apply."""
    import functools

    from palimpzest_ray.cdc import tail_once

    lake = str(tmp_path / "lake")
    log = str(tmp_path / "log")
    os.makedirs(log)

    def _seg(name, lsns, custs):
        pq.write_table(
            pa.table(
                {
                    "lsn": pa.array(lsns, pa.int64()),
                    "op": pa.array(["INSERT"] * len(lsns)),
                    "doc_id": pa.array([f"o{i}" for i in lsns]),
                    "cust": pa.array(custs, pa.int64()),
                }
            ),
            os.path.join(log, name),
        )

    enrich = functools.partial(
        enrich_changes, source=_dim(), on="cust", columns=["tier"]
    )
    _seg("seg-000.parquet", [1, 2], [10, 20])
    r1 = tail_once(log, lake, transform=enrich, num_partitions=2)
    assert r1.rows_upserted == 2
    _seg("seg-001.parquet", [3], [30])
    r2 = tail_once(log, lake, transform=enrich, num_partitions=2)
    assert r2.rows_upserted == 1
    # caught up: watermark no-op, transform sees nothing
    r3 = tail_once(log, lake, transform=enrich, num_partitions=2)
    assert r3.rows_upserted == 0
    t = final_state_table(lake).sort_by("doc_id")
    assert t["tier"].to_pylist() == ["gold", "silver", "gold"]

    from palimpzest_ray.cdc import apply_patches  # noqa: F401
    with pytest.raises(ValueError, match="not supported with patch"):
        tail_once(log, lake, patch=True, transform=enrich)
