"""Lake DML: delete_where / update_where / delete_keys — predicate-
pruned scans feeding exactly-once LWW applies."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import (
    apply_changes,
    delete_keys,
    delete_where,
    final_state_table,
    load_latest_manifest,
    update_where,
)


def _mk_lake(tmp_path, P=8) -> str:
    lake = str(tmp_path / "lake")
    n = 120
    boot = pa.table(
        {
            "lsn": pa.array([0] * n, pa.int64()),
            "op": pa.array(["INSERT"] * n),
            "doc_id": pa.array([f"d{i:04d}" for i in range(n)]),
            "tokens": pa.array([[i, i + 1] for i in range(n)], pa.list_(pa.int32())),
            "n_tok": pa.array([2] * n, pa.int32()),
            "source": pa.array([f"s{i % 4}" for i in range(n)]),
        }
    )
    p = str(tmp_path / "boot.parquet")
    pq.write_table(boot, p)
    apply_changes(p, lake, num_partitions=P)
    return lake


def test_delete_where_matches_filter_and_time_travels(tmp_path, ray_session):
    lake = _mk_lake(tmp_path)
    before = final_state_table(lake)
    v1 = load_latest_manifest(lake).version
    res = delete_where(lake, [("source", "==", "s2")])
    assert res.rows_deleted == 30
    after = final_state_table(lake)
    keep = before.filter(pc.not_equal(before["source"], "s2"))
    assert after.sort_by("doc_id").equals(
        keep.sort_by("doc_id").cast(after.schema)
    )
    # time travel: the prior version still shows every row
    from palimpzest_ray.cdc import final_state

    old = final_state(lake, version=v1)
    assert old.count() == before.num_rows
    # idempotent: re-running deletes nothing new
    assert delete_where(lake, [("source", "==", "s2")]).rows_deleted == 0


def test_update_where_rewrites_set_columns_only(tmp_path, ray_session):
    lake = _mk_lake(tmp_path)
    before = final_state_table(lake)
    res = update_where(
        lake, [("source", "==", "s1")], {"source": "curated", "n_tok": 9}
    )
    assert res.rows_upserted == 30
    after = final_state_table(lake).sort_by("doc_id")
    b = before.sort_by("doc_id")
    was_s1 = pc.equal(b["source"], "s1")
    # untouched rows identical; touched rows have SET values, carried payload
    assert after.num_rows == b.num_rows
    for i in range(after.num_rows):
        if was_s1[i].as_py():
            assert after["source"][i].as_py() == "curated"
            assert after["n_tok"][i].as_py() == 9
            assert after["tokens"][i].as_py() == b["tokens"][i].as_py()
        else:
            assert after["source"][i].as_py() == b["source"][i].as_py()
            assert after["n_tok"][i].as_py() == b["n_tok"][i].as_py()
    with pytest.raises(ValueError, match="cannot SET"):
        update_where(lake, [("source", "==", "s1")], {"doc_id": "x"})
    with pytest.raises(ValueError, match="not in lake schema"):
        update_where(lake, [("source", "==", "s1")], {"nope": 1})


def test_delete_keys_purges_and_stays_delta_sized(tmp_path, ray_session):
    lake = _mk_lake(tmp_path)
    m0 = load_latest_manifest(lake)
    victims = ["d0000", "d0007", "d0099", "never-existed"]
    res = delete_keys(lake, victims)
    assert res.rows_deleted == 3  # the phantom key deletes nothing
    after = final_state_table(lake)
    assert set(victims[:3]).isdisjoint(set(after["doc_id"].to_pylist()))
    m1 = load_latest_manifest(lake)
    # delta mode: the touched partitions appended tombstone-only files
    grew = [p for p, e in m1.parts.items() if len(e.deltas) > len(m0.parts[p].deltas)]
    assert grew
    for p in grew:
        f = os.path.join(lake, m1.parts[p].deltas[-1])
        assert pq.ParquetFile(f).metadata.num_rows <= len(victims)


def test_alter_schema_ddl(tmp_path, ray_session):
    """Metadata-only add/drop: immediate logical effect, time travel
    intact, physical removal at the next rewrite, later logs may
    re-introduce a dropped column, protected columns refuse."""
    import pyarrow.parquet as pq_

    from palimpzest_ray.cdc import alter_schema, compact_deltas, final_state

    lake = _mk_lake(tmp_path)
    v1 = load_latest_manifest(lake).version

    m = alter_schema(
        lake, add=[pa.field("quality", pa.float32())], drop=["source"]
    )
    assert "quality" in m.schema.names and "source" not in m.schema.names
    after = final_state_table(lake)
    assert "source" not in after.column_names
    assert after["quality"].null_count == after.num_rows  # backfilled
    # time travel still shows the dropped column
    old = final_state(lake, version=v1).take(1)[0]
    assert "source" in old
    # the DDL touched no data file
    m1 = load_latest_manifest(lake)
    assert {e.file for e in m1.parts.values()} == {
        e.file for e in load_latest_manifest(lake).parts.values()
    }
    # physical removal on the next rewrite of a partition; the log
    # does NOT carry the dropped column (else evolution would
    # legitimately re-introduce it)
    upd = pa.table(
        {
            "lsn": pa.array([999], pa.int64()),
            "op": pa.array(["UPDATE"]),
            "doc_id": pa.array(["d0000"]),
            "tokens": pa.array([[9]], pa.list_(pa.int32())),
            "quality": pa.array([0.5], pa.float32()),
        }
    )
    p = str(tmp_path / "u.parquet")
    pq_.write_table(upd, p)
    apply_changes(p, lake)  # rewrite mode folds + rewrites touched parts
    m2 = load_latest_manifest(lake)
    rewritten = next(
        e for e in m2.parts.values() if e.file.startswith(f"data/v{m2.version}/")
    )
    fschema = pq_.read_schema(os.path.join(lake, rewritten.file))
    assert "source" not in fschema.names and "quality" in fschema.names

    import pytest as _pytest

    with _pytest.raises(ValueError, match="protected"):
        alter_schema(lake, drop=["doc_id"])
    with _pytest.raises(ValueError, match="unknown"):
        alter_schema(lake, drop=["nope"])
    with _pytest.raises(ValueError, match="already exist"):
        alter_schema(lake, add=[pa.field("quality", pa.float32())])


def test_fsck_clean_and_detects_tampering(tmp_path, ray_session):
    from palimpzest_ray.cdc import delete_where, fsck

    lake = _mk_lake(tmp_path)
    delete_where(lake, [("source", "==", "s3")], mode="delta")
    rep = fsck(lake, deep=True)
    assert rep["ok"], rep["errors"]
    assert rep["rows"] == 90 and rep["files"] > 8

    # tamper: overwrite one delta file with a foreign-keyed row
    m = load_latest_manifest(lake)
    p, e = next((p, e) for p, e in m.parts.items() if e.deltas)
    bad = pa.table(
        {
            "doc_id": pa.array(["zz-not-in-this-bucket"]),
            "tokens": pa.array([[1]], pa.list_(pa.int32())),
            "n_tok": pa.array([1], pa.int32()),
            "source": pa.array(["x"]),
            "_lsn": pa.array([10**6], pa.int64()),
            "_deleted": pa.array([False]),
        }
    )
    pq.write_table(bad, os.path.join(lake, e.deltas[-1]))
    rep2 = fsck(lake, deep=True)
    assert not rep2["ok"]
    assert any("foreign" in x or "watermark" in x or "rows=" in x for x in rep2["errors"])

    # a FALSE-NEGATIVE bloom sidecar (the only bloom failure mode that
    # drops rows instead of costing a read) is caught by the deep audit
    from palimpzest_ray.cdc.bloom import BLOOM_SUFFIX, bloom_build

    base_file = os.path.join(lake, e.file)
    wrong = bloom_build(pa.array(["only-this-key"]))
    with open(base_file + BLOOM_SUFFIX, "wb") as f:
        f.write(wrong)
    from palimpzest_ray.cdc.bloom import _load_bloom_cached

    _load_bloom_cached.cache_clear()  # committed files are immutable; tampering isn't
    repb = fsck(lake, deep=True)
    assert not repb["ok"] and any("false negatives" in x for x in repb["errors"])
    with open(base_file + BLOOM_SUFFIX, "wb") as f:
        f.write(b"garbage")
    _load_bloom_cached.cache_clear()
    repc = fsck(lake, deep=True)
    assert not repc["ok"] and any("unreadable bloom" in x for x in repc["errors"])
    os.unlink(base_file + BLOOM_SUFFIX)  # missing sidecar = legal again
    _load_bloom_cached.cache_clear()

    # missing file detected even in shallow mode
    os.unlink(os.path.join(lake, e.deltas[-1]))
    rep3 = fsck(lake)
    assert not rep3["ok"] and any("missing" in x for x in rep3["errors"])


# --------------------------------------------------------------------------
# MERGE INTO
# --------------------------------------------------------------------------


def test_merge_into_update_insert_full_row(tmp_path, ray_session):
    from palimpzest_ray.cdc import merge_into

    lake = _mk_lake(tmp_path)
    src = pa.table(
        {
            "doc_id": pa.array(["d0001", "new1"]),
            "tokens": pa.array([[9], [7, 7]], pa.list_(pa.int32())),
            "n_tok": pa.array([1, 2], pa.int32()),
            "source": pa.array(["m", "m"]),
        }
    )
    merge_into(lake, src)
    st = final_state_table(lake)
    rows = {r["doc_id"]: r for r in st.to_pylist()}
    assert rows["d0001"]["tokens"] == [9] and rows["d0001"]["source"] == "m"
    assert rows["new1"]["tokens"] == [7, 7]
    assert len(rows) == 121


def test_merge_into_update_cols_splices(tmp_path, ray_session):
    from palimpzest_ray.cdc import merge_into

    lake = _mk_lake(tmp_path)
    src = pa.table(
        {"doc_id": pa.array(["d0002"]), "source": pa.array(["patched"])}
    )
    merge_into(lake, src, update_cols=["source"])
    r = final_state_table(lake).filter(
        pc.equal(final_state_table(lake)["doc_id"], "d0002")
    ).to_pylist()[0]
    assert r["source"] == "patched"
    assert r["tokens"] == [2, 3] and r["n_tok"] == 2  # carried forward


def test_merge_into_delete_matched_skip_unmatched(tmp_path, ray_session):
    from palimpzest_ray.cdc import merge_into

    lake = _mk_lake(tmp_path)
    src = pa.table({"doc_id": pa.array(["d0003", "ghost"])})
    res = merge_into(lake, src, when_matched="delete",
                     when_not_matched="skip")
    assert res.rows_deleted == 1
    ids = set(final_state_table(lake)["doc_id"].to_pylist())
    assert "d0003" not in ids and "ghost" not in ids
    assert len(ids) == 119


def test_merge_into_insert_only_ignores_matched(tmp_path, ray_session):
    from palimpzest_ray.cdc import merge_into

    lake = _mk_lake(tmp_path)
    src = pa.table(
        {
            "doc_id": pa.array(["d0004", "fresh"]),
            "n_tok": pa.array([99, 5], pa.int32()),
        }
    )
    merge_into(lake, src, when_matched="skip")
    rows = {r["doc_id"]: r for r in final_state_table(lake).to_pylist()}
    assert rows["d0004"]["n_tok"] == 2  # untouched
    assert rows["fresh"]["n_tok"] == 5
    assert rows["fresh"]["tokens"] is None  # absent column null-fills


def test_merge_into_rerun_converges(tmp_path, ray_session):
    from palimpzest_ray.cdc import merge_into

    lake = _mk_lake(tmp_path)
    src = pa.table(
        {
            "doc_id": pa.array(["d0005", "neo"]),
            "tokens": pa.array([[1], [2]], pa.list_(pa.int32())),
            "n_tok": pa.array([1, 1], pa.int32()),
            "source": pa.array(["m", "m"]),
        }
    )
    merge_into(lake, src)
    first = final_state_table(lake).sort_by("doc_id")
    merge_into(lake, src)  # second statement at a later LSN
    second = final_state_table(lake).sort_by("doc_id")
    assert first.equals(second)


def test_merge_into_refusals(tmp_path, ray_session):
    from palimpzest_ray.cdc import merge_into

    lake = _mk_lake(tmp_path)
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_into(lake, pa.table({"doc_id": pa.array(["a", "a"])}))
    with pytest.raises(ValueError, match="missing the lake key"):
        merge_into(lake, pa.table({"nope": pa.array(["a"])}))
    with pytest.raises(ValueError, match="update_cols not in lake"):
        merge_into(lake, pa.table({"doc_id": pa.array(["a"])}),
                   update_cols=["bogus"])
    with pytest.raises(ValueError, match="cannot update the LWW key"):
        merge_into(lake, pa.table({"doc_id": pa.array(["a"])}),
                   update_cols=["doc_id"])
    with pytest.raises(ValueError, match="missing from source"):
        merge_into(lake, pa.table({"doc_id": pa.array(["a"])}),
                   update_cols=["source"])


# --------------------------------------------------------------------------
# backfill (computed UPDATE)
# --------------------------------------------------------------------------


def test_backfill_computed_column_after_ddl(tmp_path, ray_session):
    import numpy as np

    from palimpzest_ray.cdc import alter_schema, backfill

    lake = _mk_lake(tmp_path)
    alter_schema(lake, add=[pa.field("tok_sum", pa.int64())])

    def f(batch):
        col = batch["tokens"].combine_chunks()
        v = col.values.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = col.offsets.to_numpy().astype(np.int64)
        cums = np.concatenate([[0], np.cumsum(v)])
        return pa.table({"tok_sum": pa.array(cums[offs[1:]] - cums[offs[:-1]])})

    res = backfill(lake, f, input_cols=["tokens"], output_cols=["tok_sum"])
    assert res.rows_upserted == 120
    st = final_state_table(lake).sort_by("doc_id")
    # tokens were [i, i+1] -> sum 2i+1; carried columns intact
    assert st["tok_sum"].to_pylist() == [2 * i + 1 for i in range(120)]
    assert st["n_tok"].to_pylist() == [2] * 120
    # time travel: the pre-backfill version still reads null buckets
    from palimpzest_ray.cdc.engine import final_state

    import pyarrow as pa_
    old = pa_.concat_tables(
        final_state(lake, version=2).iter_batches(
            batch_format="pyarrow", batch_size=None)
    )
    assert old["tok_sum"].null_count == old.num_rows


def test_backfill_predicate_pruned(tmp_path, ray_session):
    from palimpzest_ray.cdc import backfill

    lake = _mk_lake(tmp_path)

    def f(batch):
        n = batch.num_rows
        return pa.table({"source": pa.array(["flagged"] * n)})

    backfill(lake, f, input_cols=["source"], output_cols=["source"],
             predicate=[("source", "==", "s1")])
    st = final_state_table(lake)
    srcs = st["source"].to_pylist()
    assert srcs.count("flagged") == 30 and "s1" not in srcs


def test_backfill_refusals(tmp_path, ray_session):
    from palimpzest_ray.cdc import backfill

    lake = _mk_lake(tmp_path)
    with pytest.raises(ValueError, match="output_cols not in lake"):
        backfill(lake, lambda b: b, input_cols=["n_tok"],
                 output_cols=["ghost"])
    with pytest.raises(ValueError, match="cannot backfill the LWW key"):
        backfill(lake, lambda b: b, input_cols=["n_tok"],
                 output_cols=["doc_id"])
    with pytest.raises(Exception, match="must return exactly"):
        backfill(lake, lambda b: pa.table({"wrong": pa.array([1])}),
                 input_cols=["n_tok"], output_cols=["n_tok"])
