"""Zone-map predicate pushdown for lake scans (round-3 ask #6):
``final_state(predicate=...)`` must (a) return exactly what a full
scan + filter returns, (b) SKIP files whose row-group min/max stats
cannot match, (c) skip files that predate an evolved predicate column
(their rows are null there), and (d) count row-group matches so the
pruning is assertable, not asserted."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from palimpzest_ray.cdc import (
    apply_changes,
    final_state,
    load_latest_manifest,
    zone_prune_files,
)


def _mk_lake(tmp_path, with_evolution: bool = False) -> str:
    """Lake partitioned by ``source`` (8 sources, 8 partitions), keys
    routed so each source lands wholly in one partition file."""
    lake = str(tmp_path / "lake")
    n = 160
    src = [f"s{i % 8}" for i in range(n)]
    boot = pa.table(
        {
            "lsn": pa.array([0] * n, pa.int64()),
            "op": pa.array(["INSERT"] * n),
            "doc_id": pa.array([f"d{i:04d}" for i in range(n)]),
            "source": pa.array(src),
            "score": pa.array([float(i) for i in range(n)]),
        }
    )
    p = str(tmp_path / "boot.parquet")
    pq.write_table(boot, p)
    apply_changes(p, lake, num_partitions=8, partition_key="source")
    if with_evolution:
        # epoch 2 touches ONLY source s1 rows and adds column `extra`:
        # every other partition file is carried forward WITHOUT it
        upd = pa.table(
            {
                "lsn": pa.array([1] * 4, pa.int64()),
                "op": pa.array(["UPDATE"] * 4),
                "doc_id": pa.array([f"d{i:04d}" for i in (1, 9, 17, 25)]),
                "source": pa.array(["s1"] * 4),
                "score": pa.array([1.0, 9.0, 17.0, 25.0]),
                "extra": pa.array([10, 20, 30, 40], pa.int64()),
            }
        )
        p2 = str(tmp_path / "upd.parquet")
        pq.write_table(upd, p2)
        apply_changes(p2, lake, num_partitions=8, partition_key="source")
    return lake


def _rows(ds):
    return sorted(
        (r["doc_id"], r["source"], r["score"]) for r in ds.take_all()
    )


def test_predicate_scan_matches_full_scan_filter(tmp_path, ray_session):
    lake = _mk_lake(tmp_path)
    pred = [("source", "==", "s3"), ("score", ">=", 40.0)]
    got = _rows(final_state(lake, predicate=pred))
    full = final_state(lake).take_all()
    want = sorted(
        (r["doc_id"], r["source"], r["score"])
        for r in full
        if r["source"] == "s3" and r["score"] >= 40.0
    )
    assert got == want and len(got) > 0


def test_zone_maps_skip_files(tmp_path, ray_session):
    """source-partitioned files are single-valued in source, so the
    equality predicate must keep at most a couple of the 8 files."""
    lake = _mk_lake(tmp_path)
    files = load_latest_manifest(lake).data_files(lake)
    kept, rg_match, rg_total = zone_prune_files(files, [("source", "==", "s3")])
    # 8 sources hash into >=2 partition files; s3's rows live in ONE
    assert len(files) >= 2
    assert 1 <= len(kept) < len(files)
    assert rg_match < rg_total


def test_scan_opens_only_kept_files(tmp_path, ray_session, monkeypatch):
    """The pruned final_state read must never open a pruned file —
    asserted by intercepting fragment construction paths."""
    lake = _mk_lake(tmp_path)
    files = load_latest_manifest(lake).data_files(lake)
    kept, _m, _t = zone_prune_files(files, [("source", "==", "s3")])
    opened: set[str] = set()
    import ray.data as rd

    orig = rd.read_parquet

    def spy(paths, *a, **k):
        ps = [paths] if isinstance(paths, str) else list(paths)
        opened.update(os.path.basename(p) for p in ps)
        return orig(paths, *a, **k)

    monkeypatch.setattr(rd, "read_parquet", spy)
    import palimpzest_ray.cdc.engine as eng

    monkeypatch.setattr(eng.rd, "read_parquet", spy)
    got = final_state(lake, predicate=[("source", "==", "s3")]).take_all()
    assert opened == {os.path.basename(f) for f in kept}
    assert len(got) == 20  # 160 rows / 8 sources


def test_evolved_column_predicate_prunes_old_epoch_files(tmp_path, ray_session):
    lake = _mk_lake(tmp_path, with_evolution=True)
    files = load_latest_manifest(lake).data_files(lake)
    kept, _m, _t = zone_prune_files(files, [("extra", ">=", 10)])
    # only s1's partition was rewritten with the evolved column
    assert len(kept) == 1
    got = sorted(
        r["doc_id"] for r in final_state(lake, predicate=[("extra", ">=", 20)]).take_all()
    )
    assert got == ["d0009", "d0017", "d0025"]


def test_row_group_counters(tmp_path):
    """A sorted multi-row-group file: only the stats-matching groups
    count as scannable."""
    t = pa.table({"v": pa.array(range(100), pa.int64())})
    f = str(tmp_path / "rg.parquet")
    pq.write_table(t, f, row_group_size=10)
    kept, rg_match, rg_total = zone_prune_files([f], [("v", ">=", 95)])
    assert kept == [f] and rg_total == 10 and rg_match == 1
    kept2, m2, t2 = zone_prune_files([f], [("v", ">", 1000)])
    assert kept2 == [] and m2 == 0 and t2 == 10


def test_empty_match_keeps_schema(tmp_path, ray_session):
    lake = _mk_lake(tmp_path)
    out = final_state(lake, predicate=[("source", "==", "nope")])
    assert out.take_all() == []
    assert set(out.schema().names) >= {"doc_id", "source", "score"}


def test_manifest_col_stats_recorded(tmp_path, ray_session):
    """Every merge writes a manifest-level zone map for the scalar
    columns; the delta promotion unions ranges instead of replacing."""
    lake = _mk_lake(tmp_path)
    m = load_latest_manifest(lake)
    for e in m.parts.values():
        assert e.col_stats is not None
        assert set(e.col_stats) >= {"doc_id", "source", "score"}
        lo, hi = e.col_stats["score"]
        assert lo <= hi

    # a delta apply that pushes one source's score ABOVE the old max
    upd = pa.table(
        {
            "lsn": pa.array([5], pa.int64()),
            "op": pa.array(["UPDATE"]),
            "doc_id": pa.array(["d0003"]),
            "source": pa.array(["s3"]),
            "score": pa.array([9999.0]),
        }
    )
    p = str(tmp_path / "d.parquet")
    pq.write_table(upd, p)
    apply_changes(p, lake, partition_key="source", mode="delta")
    m2 = load_latest_manifest(lake)
    part = next(p_ for p_, e in m2.parts.items() if e.deltas)
    cs = m2.parts[part].col_stats
    assert cs["score"][1] == 9999.0  # widened by the delta
    assert cs["score"][0] == m.parts[part].col_stats["score"][0]  # kept


def test_manifest_stats_prune_without_footer_reads(tmp_path, ray_session, monkeypatch):
    """Partitions excluded by the manifest zone map must not even have
    their parquet footers opened — the driver prunes from metadata."""
    lake = _mk_lake(tmp_path)
    import palimpzest_ray.cdc.engine as eng

    footer_opens: list[str] = []
    orig_pf = eng.pq.ParquetFile

    def spy_pf(path, *a, **k):
        footer_opens.append(os.path.basename(str(path)))
        return orig_pf(path, *a, **k)

    monkeypatch.setattr(eng.pq, "ParquetFile", spy_pf)
    got = final_state(lake, predicate=[("source", "==", "s3")]).take_all()
    assert len(got) == 20
    m = load_latest_manifest(lake)
    surviving = [
        e for e in m.parts.values()
        if eng._entry_may_match(e, [("source", "==", "s3")])
    ]
    # string min/max is a RANGE: a partition holding s1 and s7 keeps a
    # ['s1','s7'] map that contains 's3' lexicographically, so it
    # survives conservatively — but most partitions prune with zero
    # footer I/O, and only survivors may be footer-checked
    assert len(surviving) < len(m.parts)
    assert set(footer_opens) <= {
        os.path.basename(e.file) for e in surviving
    }


def test_manifest_stats_prune_on_delta_chain_is_sound(tmp_path, ray_session):
    """A delta moves a row INTO the predicate range: the partition's
    unioned zone map must keep it scannable (pruning by the base's old
    range would lose the row)."""
    lake = _mk_lake(tmp_path)
    upd = pa.table(
        {
            "lsn": pa.array([7], pa.int64()),
            "op": pa.array(["UPDATE"]),
            "doc_id": pa.array(["d0005"]),  # source s5
            "source": pa.array(["s5"]),
            "score": pa.array([5555.0]),
        }
    )
    p = str(tmp_path / "d2.parquet")
    pq.write_table(upd, p)
    apply_changes(p, lake, partition_key="source", mode="delta")
    got = final_state(lake, predicate=[("score", ">=", 5000.0)]).take_all()
    assert [(r["doc_id"], r["score"]) for r in got] == [("d0005", 5555.0)]


def test_entry_may_match_unknown_is_kept():
    from palimpzest_ray.cdc.engine import _entry_may_match
    from palimpzest_ray.cdc.manifest import PartEntry

    pred = [("score", ">=", 100.0)]
    # pre-stats manifest: unknown -> keep
    assert _entry_may_match(PartEntry("f", 0, 1, col_stats=None), pred)
    # column absent from the map: unknown -> keep
    assert _entry_may_match(PartEntry("f", 0, 1, col_stats={"x": [0, 1]}), pred)
    # range excludes -> prune
    assert not _entry_may_match(
        PartEntry("f", 0, 1, col_stats={"score": [0.0, 50.0]}), pred
    )
