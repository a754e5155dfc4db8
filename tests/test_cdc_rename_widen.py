"""Rename-without-rewrite (column mapping) and lossless type widening:
``alter_schema(rename=..., widen=...)`` are metadata-only commits; every
reader maps pre-DDL files' physical names/types to the current logical
schema on the fly, producers still sending the historical name keep
applying, and the next rewrite materializes the logical form."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import (
    alter_schema,
    apply_changes,
    final_state,
    final_state_table,
    load_latest_manifest,
    lookup,
)


def _mk_lake(tmp_path, P=4, name="lake") -> str:
    lake = str(tmp_path / name)
    n = 60
    boot = pa.table(
        {
            "lsn": pa.array(range(1, n + 1), pa.int64()),
            "op": pa.array(["INSERT"] * n),
            "doc_id": pa.array([f"d{i:04d}" for i in range(n)]),
            "tokens": pa.array(
                [[i, i + 1] for i in range(n)], pa.list_(pa.int32())
            ),
            "n_tok": pa.array([2] * n, pa.int32()),
            "source": pa.array([f"s{i % 3}" for i in range(n)]),
            "score": pa.array([float(i % 7) for i in range(n)], pa.float32()),
        }
    )
    p = str(tmp_path / f"{name}-boot.parquet")
    pq.write_table(boot, p)
    apply_changes(p, lake, num_partitions=P)
    return lake


def _apply(tmp_path, lake, table, name):
    p = str(tmp_path / f"{name}.parquet")
    pq.write_table(table, p)
    return apply_changes(p, lake)


def test_rename_without_rewrite_reads_and_time_travel(tmp_path, ray_session):
    lake = _mk_lake(tmp_path)
    before = final_state_table(lake)
    m0 = load_latest_manifest(lake)
    files0 = {
        e.file: os.path.getmtime(os.path.join(lake, e.file))
        for e in m0.parts.values()
    }

    m = alter_schema(lake, rename={"source": "origin"})
    assert "origin" in m.schema.names and "source" not in m.schema.names
    assert m.renames == {"source": "origin"}
    # metadata-only: every data file untouched
    m1 = load_latest_manifest(lake)
    assert {e.file for e in m1.parts.values()} == set(files0)
    for f, mt in files0.items():
        assert os.path.getmtime(os.path.join(lake, f)) == mt

    after = final_state_table(lake)
    assert "source" not in after.column_names
    assert after["origin"].equals(before["source"])

    # point lookup under the logical name, pruned to it
    t = lookup(lake, ["d0005"], key="doc_id", columns=["origin"])
    assert t["origin"].to_pylist() == ["s2"]

    # predicate read under the logical name: zone maps + fragment
    # filter must translate to the historical physical name
    got = (
        final_state(lake, predicate=[("origin", "==", "s1")])
        .to_pandas()
        .sort_values("doc_id")
    )
    want = before.filter(pc.equal(before["source"], "s1"))
    assert list(got["doc_id"]) == want["doc_id"].to_pylist()
    assert set(got["origin"]) == {"s1"}

    # time travel: the pre-rename version still reads under "source"
    old = final_state_table(lake, version=m0.version)
    assert "source" in old.column_names and "origin" not in old.column_names


def test_rename_producer_compat_and_both_names_refused(tmp_path, ray_session):
    lake = _mk_lake(tmp_path)
    alter_schema(lake, rename={"source": "origin"})

    # an un-migrated producer still sends the OLD name — applies into
    # the logical column
    upd_old = pa.table(
        {
            "lsn": pa.array([1000], pa.int64()),
            "op": pa.array(["UPDATE"]),
            "doc_id": pa.array(["d0000"]),
            "source": pa.array(["legacy"]),
        }
    )
    _apply(tmp_path, lake, upd_old, "old-name")
    t = lookup(lake, ["d0000"], key="doc_id", columns=["origin"])
    assert t["origin"].to_pylist() == ["legacy"]
    m = load_latest_manifest(lake)
    assert "source" not in m.schema.names  # unification didn't resurrect it

    # a migrated producer sends the new name — same column
    upd_new = upd_old.set_column(
        upd_old.column_names.index("source"),
        pa.field("origin", pa.string()),
        pa.array(["modern"]),
    ).set_column(0, pa.field("lsn", pa.int64()), pa.array([1001], pa.int64()))
    _apply(tmp_path, lake, upd_new, "new-name")
    t = lookup(lake, ["d0000"], key="doc_id", columns=["origin"])
    assert t["origin"].to_pylist() == ["modern"]

    # both names in one feed is a producer bug — refused outright
    both = pa.table(
        {
            "lsn": pa.array([1002], pa.int64()),
            "op": pa.array(["UPDATE"]),
            "doc_id": pa.array(["d0001"]),
            "source": pa.array(["x"]),
            "origin": pa.array(["y"]),
        }
    )
    p = str(tmp_path / "both.parquet")
    pq.write_table(both, p)
    with pytest.raises(ValueError, match="both"):
        apply_changes(p, lake)

    # re-adding the historical name as a fresh column is refused
    with pytest.raises(ValueError, match="reserved"):
        alter_schema(lake, add=[pa.field("source", pa.string())])


def test_rename_chain_flattens_and_compaction_materializes(
    tmp_path, ray_session
):
    from palimpzest_ray.cdc import compact_deltas

    lake = _mk_lake(tmp_path)
    before = final_state_table(lake)
    alter_schema(lake, rename={"source": "origin"})
    # an epoch between the two renames, so some files carry "origin"
    upd = pa.table(
        {
            "lsn": pa.array([2000], pa.int64()),
            "op": pa.array(["UPDATE"]),
            "doc_id": pa.array(["d0002"]),
            "origin": pa.array(["mid"]),
        }
    )
    p = str(tmp_path / "mid.parquet")
    pq.write_table(upd, p)
    apply_changes(p, lake, mode="delta")
    m = alter_schema(lake, rename={"origin": "provenance"})
    # flattened one-hop map: both vintages translate directly
    assert m.renames == {"source": "provenance", "origin": "provenance"}
    after = final_state_table(lake)
    want = before["source"].to_pylist()
    want[2] = "mid"
    assert after["provenance"].to_pylist() == want

    # reverting to a reserved historical name is refused
    with pytest.raises(ValueError, match="reserved|collides"):
        alter_schema(lake, rename={"provenance": "source"})

    # compaction rewrites DELTA-BEARING partitions and materializes the
    # logical name there (clean partitions keep their historical files)
    m_pre = load_latest_manifest(lake)
    dirty = {p for p, e in m_pre.parts.items() if e.deltas}
    assert dirty
    compact_deltas(lake)
    m2 = load_latest_manifest(lake)
    for p in dirty:
        names = pq.read_schema(os.path.join(lake, m2.parts[p].file)).names
        assert "provenance" in names
        assert "source" not in names and "origin" not in names
    assert final_state_table(lake)["provenance"].to_pylist() == want

    # a full rewrite (repartition) materializes it EVERYWHERE
    from palimpzest_ray.cdc import repartition_lake

    repartition_lake(lake, 4)
    m3 = load_latest_manifest(lake)
    for e in m3.parts.values():
        names = pq.read_schema(os.path.join(lake, e.file)).names
        assert "provenance" in names
        assert "source" not in names and "origin" not in names
    assert final_state_table(lake)["provenance"].to_pylist() == want


def test_rename_validations(tmp_path, ray_session):
    from palimpzest_ray.cdc import add_constraint, add_generated_column

    lake = _mk_lake(tmp_path)
    with pytest.raises(ValueError, match="protected"):
        alter_schema(lake, rename={"doc_id": "id"})
    with pytest.raises(ValueError, match="unknown"):
        alter_schema(lake, rename={"nope": "x"})
    with pytest.raises(ValueError, match="collides"):
        alter_schema(lake, rename={"source": "score"})
    with pytest.raises(ValueError, match="collide"):
        alter_schema(lake, rename={"source": "x", "score": "x"})
    with pytest.raises(ValueError, match="more than one DDL role"):
        alter_schema(lake, rename={"source": "x"}, drop=["source"])
    with pytest.raises(ValueError, match="collide"):
        alter_schema(
            lake, rename={"source": "x"}, add=[pa.field("x", pa.string())]
        )
    with pytest.raises(ValueError, match="tokens/n_tok"):
        alter_schema(lake, rename={"n_tok": "len"})
    add_generated_column(
        lake,
        pa.field("score2", pa.float64()),
        ["add", ["col", "score"], 1.0],
        backfill_existing=False,
    )
    with pytest.raises(ValueError, match="generated"):
        alter_schema(lake, rename={"score2": "s2"})
    with pytest.raises(ValueError, match="referenced by"):
        alter_schema(lake, rename={"score": "points"})
    add_constraint(lake, "src_ok", [("source", "!=", "zz")])
    with pytest.raises(ValueError, match="referenced by"):
        alter_schema(lake, rename={"source": "origin"})


def test_widen_metadata_only_and_values_preserved(tmp_path, ray_session):
    lake = _mk_lake(tmp_path)
    before = final_state_table(lake)
    m0 = load_latest_manifest(lake)
    files0 = {e.file for e in m0.parts.values()}

    m = alter_schema(
        lake, widen={"n_tok": pa.int64(), "score": pa.float64()}
    )
    assert m.schema.field("n_tok").type == pa.int64()
    assert m.schema.field("score").type == pa.float64()
    assert {e.file for e in m.parts.values()} == files0  # no rewrite

    after = final_state_table(lake)
    assert after["n_tok"].type == pa.int64()
    assert after["n_tok"].to_pylist() == before["n_tok"].to_pylist()
    assert after["score"].to_pylist() == pytest.approx(
        before["score"].to_pylist()
    )

    # a producer still sending the narrow type keeps applying
    upd = pa.table(
        {
            "lsn": pa.array([3000], pa.int64()),
            "op": pa.array(["UPDATE"]),
            "doc_id": pa.array(["d0003"]),
            "n_tok": pa.array([2**40], pa.int64()),  # needs the width
        }
    )
    _apply(tmp_path, lake, upd, "wide-val")
    t = lookup(lake, ["d0003"], key="doc_id", columns=["n_tok"])
    assert t["n_tok"].to_pylist() == [2**40]
    narrow = pa.table(
        {
            "lsn": pa.array([3001], pa.int64()),
            "op": pa.array(["UPDATE"]),
            "doc_id": pa.array(["d0004"]),
            "n_tok": pa.array([7], pa.int32()),
        }
    )
    _apply(tmp_path, lake, narrow, "narrow-val")
    t = lookup(lake, ["d0004"], key="doc_id", columns=["n_tok"])
    assert t["n_tok"].type == pa.int64()
    assert t["n_tok"].to_pylist() == [7]


def test_widen_validations(tmp_path, ray_session):
    lake = _mk_lake(tmp_path)
    for col_, bad in [
        ("n_tok", pa.int16()),       # narrowing
        ("n_tok", pa.float32()),     # int32 -> float32 loses precision
        ("score", pa.float32()),     # same type: not a widen
        ("source", pa.int64()),      # string -> int is not a promotion
    ]:
        with pytest.raises(ValueError, match="lossless|unknown"):
            alter_schema(lake, widen={col_: bad})
    with pytest.raises(ValueError, match="protected"):
        alter_schema(lake, widen={"doc_id": pa.large_string()})
    with pytest.raises(ValueError, match="unknown"):
        alter_schema(lake, widen={"nope": pa.int64()})


def test_widen_then_int64_to_float_refused(tmp_path, ray_session):
    lake = _mk_lake(tmp_path)
    alter_schema(lake, widen={"n_tok": pa.int64()})
    with pytest.raises(ValueError, match="lossless"):
        alter_schema(lake, widen={"n_tok": pa.float64()})


def test_rename_and_widen_one_call_and_patch_feed(tmp_path, ray_session):
    from palimpzest_ray.cdc import apply_patches

    lake = _mk_lake(tmp_path)
    before = final_state_table(lake)
    m = alter_schema(
        lake, rename={"source": "origin"}, widen={"n_tok": pa.int64()}
    )
    assert m.schema.field("n_tok").type == pa.int64()
    assert "origin" in m.schema.names

    # a partial-image patch still arriving under the OLD name folds
    # into the logical column
    patch = pa.table(
        {
            "lsn": pa.array([4000, 4001], pa.int64()),
            "op": pa.array(["UPDATE", "UPDATE"]),
            "doc_id": pa.array(["d0000", "d0001"]),
            "source": pa.array(["patched", None]),
            "n_tok": pa.array([None, 99], pa.int64()),
        }
    )
    p = str(tmp_path / "patch.parquet")
    pq.write_table(patch, p)
    apply_patches(p, lake)
    t = lookup(
        lake, ["d0000", "d0001"], key="doc_id", columns=["origin", "n_tok"]
    ).sort_by("doc_id")
    # null patch values carry the base forward
    assert t["origin"].to_pylist() == ["patched", before["source"][1].as_py()]
    assert t["n_tok"].to_pylist() == [before["n_tok"][0].as_py(), 99]


def test_rename_survives_clone_branch_and_merge_conflict(
    tmp_path, ray_session
):
    from palimpzest_ray.cdc.branch import MergeConflict, create_branch, merge_branch
    from palimpzest_ray.cdc.snapshot import clone_lake

    lake = _mk_lake(tmp_path)
    alter_schema(lake, rename={"source": "origin"})

    dst = str(tmp_path / "clone")
    clone_lake(lake, dst)
    assert load_latest_manifest(dst).renames == {"source": "origin"}
    assert final_state_table(dst)["origin"].equals(
        final_state_table(lake)["origin"]
    )

    br = create_branch(lake, "br")
    assert load_latest_manifest(br).renames == {"source": "origin"}
    # divergent renames on the branch conflict at merge
    alter_schema(br, rename={"origin": "provenance"})
    upd = pa.table(
        {
            "lsn": pa.array([5000], pa.int64()),
            "op": pa.array(["UPDATE"]),
            "doc_id": pa.array(["d0005"]),
            "provenance": pa.array(["branched"]),
        }
    )
    p = str(tmp_path / "br-upd.parquet")
    pq.write_table(upd, p)
    apply_changes(p, br)
    with pytest.raises(MergeConflict, match="rename"):
        merge_branch(lake, "br")


def test_rename_zone_maps_rekeyed_and_minmax(tmp_path, ray_session):
    from palimpzest_ray.cdc import lake_minmax

    lake = _mk_lake(tmp_path)
    m = alter_schema(lake, rename={"score": "points"})
    for e in m.parts.values():
        if e.col_stats:
            assert "score" not in e.col_stats
            assert "points" in e.col_stats
    mm = lake_minmax(lake, ["points"])
    assert mm["points"] == (0.0, 6.0)
