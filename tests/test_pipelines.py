"""Flagship CDC demo pipeline (documents → tokenized lake → 2 epochs)."""

from __future__ import annotations

import pyarrow.compute as pc

from palimpzest_ray.pipelines.cdc_demo import (
    expected_final_rowcount,
    run_cdc_demo,
)

SF = "/root/testdata/sf0.001"


def test_cdc_demo_final_state(tmp_path):
    ds = run_cdc_demo(SF, work_dir=str(tmp_path))
    rows = ds.take_all()
    assert len(rows) == expected_final_rowcount(SF)
    by_id = {r["doc_id"]: r for r in rows}
    # deleted keys (num % 5 == 0) are gone
    assert "doc-00000000" not in by_id and "doc-00000005" not in by_id
    # updated keys (num % 5 == 1) have reversed tokens — check invariant
    r = by_id["doc-00000001"]
    assert r["n_tok"] == len(r["tokens"])
    # inserted keys exist with synthetic source
    assert by_id["new-00000000"]["source"] == "synthetic"
    # n_tok invariant holds everywhere
    assert all(r["n_tok"] == len(r["tokens"]) for r in rows)


def test_cdc_demo_deterministic(tmp_path):
    a = run_cdc_demo(SF, work_dir=str(tmp_path / "a"))
    b = run_cdc_demo(SF, work_dir=str(tmp_path / "b"))
    ta = a.take_all()
    tb = b.take_all()
    ka = sorted((r["doc_id"], tuple(r["tokens"])) for r in ta)
    kb = sorted((r["doc_id"], tuple(r["tokens"])) for r in tb)
    assert ka == kb
