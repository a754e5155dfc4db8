"""CLI entry point: each command runs and prints one JSON line."""

from __future__ import annotations

import json
import os


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
