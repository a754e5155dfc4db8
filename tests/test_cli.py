"""CLI entry point: each command runs and prints one JSON line."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_cli_apply_state_vacuum(tmp_path, capsys):
    from palimpzest_ray import cli
    from palimpzest_ray.cdc.synth import write_change_log

    log = os.path.join(str(tmp_path), "log")
    lake = os.path.join(str(tmp_path), "lake")
    write_change_log(log, 2_000, 400, seed=13, chunk_rows=1_000)

    assert cli.main(["apply", log, lake, "--num-partitions", "4"]) == 0
    applied = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert applied["version"] == 1 and applied["events_seen"] == 2_000

    assert cli.main(["state", lake]) == 0
    state = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert state["version"] == 1 and state["num_partitions"] == 4
    assert state["rows"] == applied["rows_upserted"]

    assert cli.main(["tail", log, lake]) == 0
    tailed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert tailed["events_seen"] == 0  # nothing past the watermark

    assert cli.main(["vacuum", lake, "--keep", "1"]) == 0
    vac = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert vac["versions_dropped"] == []  # only one version exists


def test_cli_views_and_index(tmp_path, capsys):
    from palimpzest_ray import cli
    from palimpzest_ray.cdc import final_state_table
    from palimpzest_ray.cdc.synth import write_change_log

    log = os.path.join(str(tmp_path), "log")
    lake = os.path.join(str(tmp_path), "lake")
    view = os.path.join(str(tmp_path), "view")
    idx = os.path.join(str(tmp_path), "idx")
    write_change_log(log, 1_500, 300, seed=21, chunk_rows=1_000)
    assert cli.main(["apply", log, lake, "--num-partitions", "4"]) == 0
    capsys.readouterr()

    assert cli.main([
        "view-create", lake, view, "--group-col", "source",
        "--count", "n_docs", "--sum", "total_tok=n_tok",
    ]) == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["group_col"] == "source"
    assert cli.main(["view-refresh", lake, view]) == 0
    refreshed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert refreshed["refreshed"] is False  # already at head

    assert cli.main(["index-build", lake, idx, "--num-partitions", "4"]) == 0
    capsys.readouterr()
    state = final_state_table(lake)
    tok = state["tokens"][0][0].as_py()
    doc = state["doc_id"][0].as_py()
    assert cli.main(["index-search", idx, str(tok)]) == 0
    hit = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert doc in hit["doc_ids"] and hit["n_docs"] >= 1
    assert cli.main(["index-refresh", lake, idx]) == 0
    assert (
        json.loads(capsys.readouterr().out.strip().splitlines()[-1])["refreshed"]
        is False
    )

    # secondary column index lifecycle mirrors the token index's
    cidx = os.path.join(str(tmp_path), "cidx")
    assert cli.main([
        "colindex-build", lake, cidx, "source", "--num-partitions", "4"
    ]) == 0
    capsys.readouterr()
    import pyarrow.compute as _pc

    src = state["source"][0].as_py()
    want = state.filter(
        _pc.equal(state["source"], src)
    )["doc_id"].to_pylist()
    assert cli.main([
        "colindex-lookup", lake, cidx, src, "--columns", "source"
    ]) == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["rows"]
    assert sorted(r["doc_id"] for r in rows) == sorted(want)
    assert cli.main(["colindex-refresh", lake, cidx]) == 0
    assert (
        json.loads(capsys.readouterr().out.strip().splitlines()[-1])["refreshed"]
        is False
    )

    # ingest screen: 4 fresh candidates + 2 already-present keys -> 4 new
    import pyarrow as pa
    import pyarrow.parquet as _pq

    cand = pa.table(
        {"doc_id": pa.array([f"screen-{i}" for i in range(4)]
                            + state["doc_id"].to_pylist()[:2])}
    )
    cpath = os.path.join(str(tmp_path), "cand.parquet")
    _pq.write_table(cand, cpath)
    outdir = os.path.join(str(tmp_path), "screened")
    assert cli.main(["screen", lake, cpath, "--out", outdir]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["new_rows"] == 4
    got = _pq.read_table(outdir)
    assert sorted(got["doc_id"].to_pylist()) == [f"screen-{i}" for i in range(4)]


def test_cli_delta_mode_and_compact(tmp_path, capsys):
    """apply --mode delta forms chains (visible in state), compact
    --max-delta-files folds them, state rows unchanged."""
    from palimpzest_ray import cli
    from palimpzest_ray.cdc.synth import write_change_log

    log1 = os.path.join(str(tmp_path), "log1")
    log2 = os.path.join(str(tmp_path), "log2")
    lake = os.path.join(str(tmp_path), "lake")
    write_change_log(log1, 1_000, 300, seed=31, chunk_rows=1_000)
    write_change_log(log2, 1_000, 300, seed=32, chunk_rows=1_000, start_lsn=1_001)

    assert cli.main(["apply", log1, lake, "--num-partitions", "4"]) == 0
    capsys.readouterr()
    assert cli.main(["apply", log2, lake, "--mode", "delta"]) == 0
    capsys.readouterr()
    assert cli.main(["state", lake]) == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["delta_files"] > 0
    assert cli.main([
        "compact", lake, "--max-delta-files", "1",
        "--target-file-mb", "512", "--max-superseded-files", "1000000",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["delta_parts_compacted"] > 0
    assert cli.main(["state", lake]) == 0
    st2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st2["delta_files"] == 0 and st2["rows"] == st["rows"]


def test_cli_dml(tmp_path, capsys):
    from palimpzest_ray import cli
    from palimpzest_ray.cdc import final_state_table
    from palimpzest_ray.cdc.synth import write_change_log

    log = os.path.join(str(tmp_path), "log")
    lake = os.path.join(str(tmp_path), "lake")
    write_change_log(log, 1_000, 300, seed=41, chunk_rows=1_000)
    assert cli.main(["apply", log, lake, "--num-partitions", "4"]) == 0
    capsys.readouterr()
    before = final_state_table(lake)
    src0 = before["source"][0].as_py()
    n0 = sum(1 for s in before["source"].to_pylist() if s == src0)

    assert cli.main(
        ["update-where", lake, "--where", "source", "==", src0,
         "--set", "source=curated"]
    ) == 0
    upd = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert upd["rows_upserted"] == n0
    assert cli.main(
        ["delete-where", lake, "--where", "source", "==", "curated"]
    ) == 0
    dele = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert dele["rows_deleted"] == n0
    after = final_state_table(lake)
    assert "curated" not in set(after["source"].to_pylist())
    assert after.num_rows == before.num_rows - n0


def test_cli_patch(tmp_path, capsys):
    from palimpzest_ray import cli
    from palimpzest_ray.cdc import final_state_table
    from palimpzest_ray.cdc.synth import write_change_log

    log = os.path.join(str(tmp_path), "log")
    lake = os.path.join(str(tmp_path), "lake")
    write_change_log(log, 500, 200, seed=47, chunk_rows=500)
    assert cli.main(["apply", log, lake, "--num-partitions", "4"]) == 0
    capsys.readouterr()
    before = final_state_table(lake)
    k = before["doc_id"][0].as_py()
    patch = pa.table(
        {
            "lsn": pa.array([10_000], pa.int64()),
            "op": ["UPDATE"],
            "doc_id": [k],
            "source": pa.array(["patched"]),
        }
    )
    pfile = os.path.join(str(tmp_path), "patch.parquet")
    pq.write_table(patch, pfile)
    assert cli.main(["patch", pfile, lake]) == 0
    json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    after = {r["doc_id"]: r for r in final_state_table(lake).to_pylist()}
    want = {r["doc_id"]: r for r in before.to_pylist()}
    assert after[k]["source"] == "patched"
    assert after[k]["tokens"] == want[k]["tokens"]  # carried forward
    for key2 in list(want)[1:5]:
        assert after[key2] == want[key2]


def test_cli_count(tmp_path, capsys):
    from palimpzest_ray import cli
    from palimpzest_ray.cdc import final_state_table
    from palimpzest_ray.cdc.synth import write_change_log

    log = os.path.join(str(tmp_path), "log")
    lake = os.path.join(str(tmp_path), "lake")
    write_change_log(log, 800, 250, seed=48, chunk_rows=800)
    assert cli.main(["apply", log, lake, "--num-partitions", "4"]) == 0
    capsys.readouterr()
    state = final_state_table(lake)
    assert cli.main(["count", lake]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"rows": state.num_rows, "metadata_only": True}
    src0 = state["source"][0].as_py()
    n0 = sum(1 for s in state["source"].to_pylist() if s == src0)
    assert cli.main(["count", lake, "--where", "source", "==", src0]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"rows": n0, "metadata_only": False}
    assert cli.main(["minmax", lake, "n_tok", "source"]) == 0
    mm = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    nts = state["n_tok"].to_pylist()
    assert mm["n_tok"] == [min(nts), max(nts)]


def test_cli_debezium_apply_and_dedup_and_ivf(tmp_path, capsys):
    """Round-3 surface: --format debezium apply, dedup-init/screen/admit,
    ivf-build/refresh/search — one JSON line each."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from palimpzest_ray import cli
    from palimpzest_ray.schemas import CHANGELOG_SCHEMA
    from palimpzest_ray.sources.changelog import write_debezium_jsonl

    # -- debezium apply
    log = pa.Table.from_pylist(
        [
            {"lsn": 1, "op": "INSERT", "doc_id": "a", "tokens": [1, 2],
             "n_tok": 2, "source": "w"},
            {"lsn": 2, "op": "DELETE", "doc_id": "a", "tokens": None,
             "n_tok": None, "source": None},
            {"lsn": 3, "op": "INSERT", "doc_id": "b", "tokens": [7],
             "n_tok": 1, "source": "w"},
        ],
        CHANGELOG_SCHEMA,
    )
    topic = os.path.join(str(tmp_path), "topic")
    lake = os.path.join(str(tmp_path), "lake")
    write_debezium_jsonl(log, topic)
    assert cli.main(["apply", topic, lake, "--num-partitions", "2",
                     "--format", "debezium"]) == 0
    applied = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # events_seen is footer-derived (0 for streamed Dataset inputs);
    # the state assertions below are the real check
    assert applied["rows_upserted"] == 1 and applied["version"] == 1
    from palimpzest_ray.cdc.engine import final_state_table

    st = final_state_table(lake)
    assert st["doc_id"].to_pylist() == ["b"]
    assert st["tokens"].to_pylist() == [[7]]

    # -- dedup corpus lifecycle
    docs = pa.table(
        {
            "doc_id": ["c1", "c2"],
            "text": ["alpha beta gamma delta", "epsilon zeta eta theta"],
            "source": ["s", "s"],
        }
    )
    docs_p = os.path.join(str(tmp_path), "docs.parquet")
    pq.write_table(docs, docs_p)
    corpus = os.path.join(str(tmp_path), "corpus")
    index = os.path.join(str(tmp_path), "shingle_idx")
    assert cli.main(["dedup-init", docs_p, corpus, index,
                     "--num-partitions", "2"]) == 0
    init = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert init["corpus_rows"] == 2

    batch = pa.table(
        {
            "doc_id": ["n1", "n2"],
            "text": ["alpha beta gamma delta", "totally novel words here"],
            "source": ["x", "x"],
        }
    )
    batch_p = os.path.join(str(tmp_path), "batch.parquet")
    pq.write_table(batch, batch_p)
    assert cli.main(["dedup-screen", corpus, index, batch_p,
                     "--threshold", "0.5"]) == 0
    scr = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert scr == {"batch_rows": 2, "unique": 1, "dup_pairs": 1}
    assert cli.main(["dedup-admit", corpus, index, batch_p,
                     "--threshold", "0.5"]) == 0
    adm = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert adm["admitted"] == 1 and adm["rejected"] == 1

    # -- ivf lifecycle over a tiny vector lake
    import ray.data as rd

    from palimpzest_ray.cdc import apply_changes

    rng = np.random.default_rng(2)
    V = rng.normal(size=(40, 8)).astype(np.float32)
    vec_schema = pa.schema(
        [("lsn", pa.int64()), ("op", pa.string()),
         ("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
    )
    ev = pa.table(
        {
            "lsn": pa.array(range(40), pa.int64()),
            "op": pa.array(["INSERT"] * 40),
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array([v.tolist() for v in V],
                                  pa.list_(pa.float32())),
        }
    ).cast(vec_schema)
    vlake = os.path.join(str(tmp_path), "vecs")
    ivf = os.path.join(str(tmp_path), "ivf")
    apply_changes(rd.from_arrow(ev), vlake, key="vec_id",
                  num_partitions=2, change_schema=vec_schema)
    assert cli.main(["ivf-build", vlake, ivf, "--nlist", "4"]) == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["nlist"] == 4
    assert cli.main(["ivf-refresh", vlake, ivf]) == 0
    ref = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ref["refreshed"] is False  # nothing changed yet
    qp = os.path.join(str(tmp_path), "queries.parquet")
    pq.write_table(
        pa.table({"embedding": pa.array([V[0].tolist()],
                                        pa.list_(pa.float32()))}),
        qp,
    )
    assert cli.main(["ivf-search", ivf, qp, "--k", "3",
                     "--nprobe", "4"]) == 0
    hits = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert hits["queries"] == 1 and hits["hits"][0]["vec_id"] == 0


def test_cli_merge(tmp_path, capsys):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from palimpzest_ray import cli
    from palimpzest_ray.cdc.engine import final_state_table
    from palimpzest_ray.schemas import CHANGELOG_SCHEMA

    load = pa.Table.from_pylist(
        [{"lsn": i, "op": "INSERT", "doc_id": f"d{i}", "tokens": [i],
          "n_tok": 1, "source": "w"} for i in range(3)],
        CHANGELOG_SCHEMA,
    )
    boot = os.path.join(str(tmp_path), "boot.parquet")
    pq.write_table(load, boot)
    lake = os.path.join(str(tmp_path), "lake")
    assert cli.main(["apply", boot, lake, "--num-partitions", "2"]) == 0
    capsys.readouterr()

    src = pa.table(
        {"doc_id": pa.array(["d1", "n1"]), "source": pa.array(["m", "m"]),
         "n_tok": pa.array([5, 5], pa.int32())}
    )
    srcp = os.path.join(str(tmp_path), "src.parquet")
    pq.write_table(src, srcp)
    assert cli.main(["merge", srcp, lake, "--update-cols", "source"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows_upserted"] == 2
    rows = {r["doc_id"]: r for r in final_state_table(lake).to_pylist()}
    assert rows["d1"]["source"] == "m" and rows["d1"]["n_tok"] == 1
    assert rows["n1"]["n_tok"] == 5


def test_cli_history_and_catalog(tmp_path, capsys):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from palimpzest_ray import cli
    from palimpzest_ray.schemas import CHANGELOG_SCHEMA

    def mk(rows, name):
        p = os.path.join(str(tmp_path), name)
        pq.write_table(pa.Table.from_pylist(rows, CHANGELOG_SCHEMA), p)
        return p

    lake = os.path.join(str(tmp_path), "lake")
    assert cli.main(["apply", mk(
        [{"lsn": 1, "op": "INSERT", "doc_id": "a", "tokens": [1],
          "n_tok": 1, "source": "w"}], "l1.parquet"
    ), lake, "--num-partitions", "2"]) == 0
    assert cli.main(["apply", mk(
        [{"lsn": 2, "op": "UPDATE", "doc_id": "a", "tokens": [2, 2],
          "n_tok": 2, "source": "w"}], "l2.parquet"
    ), lake]) == 0
    capsys.readouterr()

    assert cli.main(["history", lake, "a"]) == 0
    hist = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [r["_version"] for r in hist["rows"]] == [1, 2]
    assert hist["rows"][1]["n_tok"] == 2

    cat = os.path.join(str(tmp_path), "cat")
    assert cli.main(["catalog-commit", cat, f"docs={lake}"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["version"] == 1 and out["pins"]["docs"]["version"] == 2
    assert cli.main(["catalog-show", cat]) == 0
    shown = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert shown == out


def test_cli_quarantine_gate(tmp_path, capsys):
    from palimpzest_ray import cli

    log = pa.table(
        {
            "lsn": pa.array([1, 2, 3], pa.int64()),
            "op": pa.array(["INSERT", "BAD", "INSERT"]),
            "doc_id": pa.array(["a", "b", "c"]),
            "n_tok": pa.array([5, 6, -1], pa.int32()),
        }
    )
    p = os.path.join(str(tmp_path), "log.parquet")
    pq.write_table(log, p)
    lake = os.path.join(str(tmp_path), "lake")
    assert cli.main([
        "apply", p, lake, "--num-partitions", "2",
        "--expect", "pos_tok", "n_tok", ">", "0", "--quarantine",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows_quarantined"] == 2 and out["rows_upserted"] == 1
    assert cli.main(["quarantine", lake]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert json.loads(lines[0])["rows"] == 2
    reasons = {json.loads(ln)["_errors"] for ln in lines[1:]}
    assert reasons == {"invalid_op", "pos_tok"}


def test_cli_wap_publish_discard(tmp_path, capsys):
    from palimpzest_ray import cli

    def mk(rows, name):
        t = pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [("lsn", pa.int64()), ("op", pa.string()),
                 ("doc_id", pa.string()), ("n_tok", pa.int32())]
            ),
        )
        p = os.path.join(str(tmp_path), name)
        pq.write_table(t, p)
        return p

    lake = os.path.join(str(tmp_path), "lake")
    assert cli.main([
        "apply", mk([{"lsn": 1, "op": "INSERT", "doc_id": "a", "n_tok": 1}],
                    "l1.parquet"),
        lake, "--num-partitions", "2",
    ]) == 0
    capsys.readouterr()
    assert cli.main([
        "apply", mk([{"lsn": 2, "op": "INSERT", "doc_id": "b", "n_tok": 2}],
                    "l2.parquet"),
        lake, "--num-partitions", "2", "--audit",
    ]) == 0
    staged = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert staged["version"] == 2
    assert cli.main(["state", lake]) == 0
    head = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert head["version"] == 1  # stage invisible to the head
    assert cli.main(["publish", lake, "2"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["published"] == 2
    # stage another and discard it
    assert cli.main([
        "apply", mk([{"lsn": 3, "op": "INSERT", "doc_id": "c", "n_tok": 3}],
                    "l3.parquet"),
        lake, "--num-partitions", "2", "--audit",
    ]) == 0
    capsys.readouterr()
    assert cli.main(["discard", lake, "3"]) == 0
    assert json.loads(capsys.readouterr().out.strip())["discarded"] == 3
    assert cli.main(["state", lake]) == 0
    assert json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    )["version"] == 2


def test_cli_branch_lifecycle(tmp_path, capsys):
    from palimpzest_ray import cli
    from palimpzest_ray.cdc import final_state_table
    from palimpzest_ray.cdc.synth import write_change_log

    log = os.path.join(str(tmp_path), "log")
    log2 = os.path.join(str(tmp_path), "log2")
    lake = os.path.join(str(tmp_path), "lake")
    write_change_log(log, 2_000, 400, seed=13, chunk_rows=1_000)
    write_change_log(
        log2, 500, 400, seed=14, chunk_rows=500, start_lsn=3_000
    )
    assert cli.main(["apply", log, lake, "--num-partitions", "4"]) == 0
    capsys.readouterr()

    assert cli.main(["branch", lake, "create", "dev"]) == 0
    broot = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["root"]
    assert cli.main(["branch", lake, "list"]) == 0
    assert json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    )["branches"] == ["dev"]

    before = final_state_table(lake)
    assert cli.main(["apply", log2, broot, "--num-partitions", "4"]) == 0
    capsys.readouterr()
    assert final_state_table(lake).equals(before)  # isolated

    assert cli.main(["branch", lake, "merge", "dev"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["merged"] == "dev"
    assert final_state_table(lake).num_rows >= before.num_rows
    assert cli.main(["branch", lake, "list"]) == 0
    assert json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    )["branches"] == []


def test_cli_constraint(tmp_path, capsys):
    from palimpzest_ray import cli
    from palimpzest_ray.cdc.synth import write_change_log

    log = os.path.join(str(tmp_path), "log")
    lake = os.path.join(str(tmp_path), "lake")
    write_change_log(log, 1_000, 200, seed=5, chunk_rows=1_000)
    assert cli.main(["apply", log, lake, "--num-partitions", "4"]) == 0
    capsys.readouterr()

    assert cli.main(
        ["constraint", lake, "add", "tok_nonneg",
         "--where", "n_tok", ">=", "0"]
    ) == 0
    added = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "tok_nonneg" in added["constraints"]

    assert cli.main(["constraint", lake, "list"]) == 0
    listed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert listed == {"tok_nonneg": [["n_tok", ">=", 0]]}

    assert cli.main(["constraint", lake, "drop", "tok_nonneg"]) == 0
    dropped = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert dropped["constraints"] == {}


def test_cli_constraint_expr(tmp_path, capsys):
    from palimpzest_ray import cli
    from palimpzest_ray.cdc.synth import write_change_log

    log = os.path.join(str(tmp_path), "log")
    lake = os.path.join(str(tmp_path), "lake")
    write_change_log(log, 800, 150, seed=9, chunk_rows=800)
    assert cli.main(["apply", log, lake, "--num-partitions", "4"]) == 0
    capsys.readouterr()
    assert cli.main(
        ["constraint", lake, "add", "chk",
         "--expr", '["ge", ["col", "n_tok"], 0]']
    ) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["constraints"]["chk"] == {"expr": ["ge", ["col", "n_tok"], 0]}


def test_cli_generated_and_expr_delete(tmp_path, capsys):
    from palimpzest_ray import cli
    from palimpzest_ray.cdc import final_state_table
    from palimpzest_ray.cdc.synth import write_change_log

    log = os.path.join(str(tmp_path), "log")
    lake = os.path.join(str(tmp_path), "lake")
    write_change_log(log, 1_000, 200, seed=31, chunk_rows=1_000)
    assert cli.main(["apply", log, lake, "--num-partitions", "4"]) == 0
    capsys.readouterr()

    assert cli.main(
        ["generated", lake, "add", "tok_bucket", "int32",
         "--expr", '["mod", ["col", "n_tok"], 5]']
    ) == 0
    added = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "tok_bucket" in added["generated"]
    t = final_state_table(lake)
    assert t["tok_bucket"].to_pylist() == [
        v % 5 for v in t["n_tok"].to_pylist()
    ]

    assert cli.main(["generated", lake, "list"]) == 0
    listed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert listed == {"tok_bucket": ["mod", ["col", "n_tok"], 5]}

    before = final_state_table(lake).num_rows
    assert cli.main(
        ["delete-where", lake, "--expr", '["eq", ["col", "tok_bucket"], 3]']
    ) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    after = final_state_table(lake)
    assert res["rows_deleted"] > 0
    assert after.num_rows == before - res["rows_deleted"]
    assert 3 not in set(after["tok_bucket"].to_pylist())


def test_cli_alter_rename_widen(tmp_path, capsys):
    from palimpzest_ray import cli
    from palimpzest_ray.cdc import final_state_table
    from palimpzest_ray.cdc.synth import write_change_log

    log = os.path.join(str(tmp_path), "log")
    lake = os.path.join(str(tmp_path), "lake")
    write_change_log(log, 1_000, 200, seed=43, chunk_rows=1_000)
    assert cli.main(["apply", log, lake, "--num-partitions", "4"]) == 0
    capsys.readouterr()
    before = final_state_table(lake)

    assert cli.main(
        ["alter", lake,
         "--rename", "source", "origin",
         "--widen", "n_tok", "int64",
         "--add", "quality", "float64"]
    ) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["renames"] == {"source": "origin"}
    assert out["columns"]["n_tok"] == "int64"
    assert out["columns"]["quality"] == "double"
    after = final_state_table(lake)
    assert after["origin"].to_pylist() == before["source"].to_pylist()
    assert after["n_tok"].type == pa.int64()
    assert after["quality"].null_count == after.num_rows

    assert cli.main(["alter", lake, "--drop", "quality"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "quality" not in out["columns"]
    with pytest.raises(SystemExit):
        cli.main(["alter", lake])
    with pytest.raises(SystemExit):
        cli.main(["alter", lake, "--widen", "n_tok", "complex128"])


def test_cli_purge(tmp_path, capsys):
    from palimpzest_ray import cli
    from palimpzest_ray.cdc import final_state_table, fsck
    from palimpzest_ray.cdc.synth import write_change_log

    log = os.path.join(str(tmp_path), "log")
    lake = os.path.join(str(tmp_path), "lake")
    write_change_log(log, 1_000, 200, seed=44, chunk_rows=1_000)
    assert cli.main(["apply", log, lake, "--num-partitions", "4"]) == 0
    capsys.readouterr()
    before = final_state_table(lake)
    victim = before["doc_id"][0].as_py()

    assert cli.main(["purge", lake, victim]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows_removed"] >= 1
    after = final_state_table(lake)
    assert victim not in set(after["doc_id"].to_pylist())
    assert fsck(lake, deep=True)["ok"]


def test_cli_all_subcommands_parse(capsys):
    """Every subcommand's parser builds and prints help without error —
    the regression net against argparse wiring typos."""
    import re

    from palimpzest_ray import cli

    with pytest.raises(SystemExit) as exc:
        cli.main(["--help"])
    assert exc.value.code == 0
    help_text = capsys.readouterr().out
    m = re.search(r"\{([a-z0-9,-]+)\}", help_text)
    assert m, "no subcommand list in --help"
    cmds = m.group(1).split(",")
    assert len(cmds) >= 50
    for cmd in cmds:
        with pytest.raises(SystemExit) as e2:
            cli.main([cmd, "--help"])
        assert e2.value.code == 0, cmd
        capsys.readouterr()


def test_cli_diff_converged_and_custom_key(tmp_path, capsys, ray_session):
    """Review r4: `diff` on already-converged replicas prints
    {"events": 0, ...} instead of crashing on an empty feed, and
    --key X --apply repairs a lake keyed on a non-default column."""
    import json as _json

    import pyarrow as pa

    from palimpzest_ray import cli
    from palimpzest_ray.cdc import apply_changes

    sch = pa.schema([("lsn", pa.int64()), ("op", pa.string()),
                     ("user_id", pa.string()), ("v", pa.int64())])
    rows = [{"lsn": i, "op": "INSERT", "user_id": f"u{i}", "v": i}
            for i in range(1, 5)]
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    apply_changes(pa.Table.from_pylist(rows, sch), src,
                  num_partitions=2, key="user_id")
    drift = [dict(r) for r in rows[:3]]
    drift[0]["v"] = 99
    apply_changes(pa.Table.from_pylist(drift, sch), dst,
                  num_partitions=2, key="user_id")

    assert cli.main(["diff", src, dst, "--key", "user_id",
                     "--apply"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["events"] == 2 and out["verify"]["match"]

    # converged: empty feed, no crash
    assert cli.main(["diff", src, dst, "--key", "user_id"]) == 0
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2 == {"events": 0, "upserts": 0, "deletes": 0}
