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
