"""Flagship demo: CDC upsert lake driven by the testdata documents table.

Deterministically derives the north-rule input shape
``(doc_id:string, tokens:list<int32>, n_tok:int32, source:string)``
from ``documents.parquet`` (tokens = stable word hashes mod vocab),
then exercises the full CDC engine: initial load → second change log
with UPDATE / DELETE / INSERT mix → exactly-once apply → final state.

Everything is a pure function of the input table, so the expected final
state is computable row-by-row (used by the pytest oracle and by the
driver's rows-check).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from palimpzest_ray.cdc.engine import apply_changes, final_state
from palimpzest_ray.functions.tokens import stable_hash

VOCAB = 50257


def demo_workdir(sf_dir: str, kind: str) -> str:
    """Content-keyed scratch root (input path + size + mtime), WIPED on
    each call: repeated contract/bench runs reuse ONE directory per
    (demo, input) instead of leaking a fresh mkdtemp every invocation."""
    import hashlib

    st = os.stat(os.path.join(sf_dir, "documents.parquet"))
    tag = hashlib.sha1(
        f"{sf_dir}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:10]
    work = os.path.join(tempfile.gettempdir(), f"pz_{kind}_{tag}")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    return work


def tokenize_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """documents row → sequence-table row (vectorized): tokens are
    stable 64-bit word hashes folded into [0, VOCAB)."""
    words = pc.split_pattern_regex(pc.utf8_lower(batch[text_col]), r"\s+")
    flat = pc.list_flatten(words)
    offsets_len = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    tok = (stable_hash(flat) % np.uint64(VOCAB)).astype(np.int32)
    offsets = np.zeros(len(offsets_len) + 1, dtype=np.int32)
    np.cumsum(offsets_len, out=offsets[1:])
    tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(tok))
    ids = batch["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    doc_ids = pa.array(np.char.add("doc-", np.char.zfill(ids.astype("U8"), 8)))
    return pa.table(
        {
            "doc_id": doc_ids,
            "tokens": tokens,
            "n_tok": pc.list_value_length(tokens).cast(pa.int32()),
            "source": batch["source"],
            "num": pa.array(ids),  # numeric id, drives the change mix below
        }
    )


def _change_log_from_base(base: pa.Table) -> pa.Table:
    """Deterministic second-epoch changes: num%5==0 → DELETE,
    num%5==1 → UPDATE (tokens reversed), num>=max-9 → fresh INSERTs."""
    num = base["num"].to_numpy(zero_copy_only=False)
    lsn0 = int(num.max()) + 1

    del_mask = (num % 5) == 0
    upd_mask = (num % 5) == 1

    del_tbl = base.filter(pa.array(del_mask))
    upd_tbl = base.filter(pa.array(upd_mask))

    rows = []
    lsn = lsn0
    for r in del_tbl.select(["doc_id"]).to_pylist():
        rows.append(
            {"lsn": lsn, "op": "DELETE", "doc_id": r["doc_id"], "tokens": None,
             "n_tok": None, "source": None}
        )
        lsn += 1
    for r in upd_tbl.select(["doc_id", "tokens", "source"]).to_pylist():
        toks = list(reversed(r["tokens"]))
        rows.append(
            {"lsn": lsn, "op": "UPDATE", "doc_id": r["doc_id"], "tokens": toks,
             "n_tok": len(toks), "source": r["source"]}
        )
        lsn += 1
    for i in range(10):  # fresh inserts beyond the existing key space
        toks = [int(x) for x in np.arange(8) + i]
        rows.append(
            {"lsn": lsn, "op": "INSERT", "doc_id": f"new-{i:08d}", "tokens": toks,
             "n_tok": len(toks), "source": "synthetic"}
        )
        lsn += 1
    schema = pa.schema(
        [
            pa.field("lsn", pa.int64()),
            pa.field("op", pa.string()),
            pa.field("doc_id", pa.string()),
            pa.field("tokens", pa.list_(pa.int32())),
            pa.field("n_tok", pa.int32()),
            pa.field("source", pa.string()),
        ]
    )
    return pa.Table.from_pylist(rows, schema=schema)


def prepare_demo_inputs(sf_dir: str, work: str) -> tuple[str, str, str]:
    """Tokenize documents.parquet and stage the two demo change epochs;
    returns (lake_root, log1_dir, log2_dir)."""
    lake = os.path.join(work, "lake")
    shutil.rmtree(lake, ignore_errors=True)

    seqs = (
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text", "source"])
        .map_batches(tokenize_batch, batch_format="pyarrow")
    )
    base = pa.concat_tables(
        seqs.iter_batches(batch_format="pyarrow", batch_size=65536)
    ).sort_by("num")

    # epoch 1: initial load — every base row is an INSERT at lsn=num
    load = pa.table(
        {
            "lsn": base["num"].cast(pa.int64()),
            "op": pa.array(["INSERT"] * base.num_rows),
            "doc_id": base["doc_id"],
            "tokens": base["tokens"],
            "n_tok": base["n_tok"],
            "source": base["source"],
        }
    )
    log_dir = os.path.join(work, "log1")
    os.makedirs(log_dir, exist_ok=True)
    pq.write_table(load, os.path.join(log_dir, "log-000.parquet"))

    # epoch 2: deterministic UPDATE/DELETE/INSERT mix
    log2_dir = os.path.join(work, "log2")
    os.makedirs(log2_dir, exist_ok=True)
    pq.write_table(
        _change_log_from_base(base), os.path.join(log2_dir, "log-000.parquet")
    )
    return lake, log_dir, log2_dir


def run_cdc_demo(
    sf_dir: str, work_dir: str | None = None, num_partitions: int = 8
) -> rd.Dataset:
    """documents.parquet → tokenized base lake → apply change log →
    final state Dataset (streaming read of the committed lake)."""
    work = work_dir or demo_workdir(sf_dir, "cdc_demo")
    lake, log1, log2 = prepare_demo_inputs(sf_dir, work)
    apply_changes(log1, lake, num_partitions=num_partitions)
    apply_changes(log2, lake, num_partitions=num_partitions)
    return final_state(lake)


def run_cdc_delta_demo(
    sf_dir: str, work_dir: str | None = None, num_partitions: int = 8
) -> rd.Dataset:
    """Merge-on-read variant of the flagship demo: initial load
    (rewrite), then the epoch-2 change mix split across TWO delta
    applies with a chain compaction between them — so the returned
    final state reads through a LIVE delta chain and the pipeline
    witnesses delta append, compact_deltas and the chain resolver in
    one run. Final state is identical to :func:`run_cdc_demo`'s by the
    mode-equivalence contract (tests/test_cdc_delta.py), so it shares
    the cdc_replay SQL oracle."""
    from palimpzest_ray.cdc.engine import compact_deltas

    work = work_dir or demo_workdir(sf_dir, "cdc_delta_demo")
    lake, log1, log2 = prepare_demo_inputs(sf_dir, work)
    apply_changes(log1, lake, num_partitions=num_partitions)
    log = pq.read_table(os.path.join(log2, "log-000.parquet"))
    half = log.num_rows // 2
    for name, part in (("log2a", log.slice(0, half)), ("log2b", log.slice(half))):
        d = os.path.join(work, name)
        os.makedirs(d, exist_ok=True)
        pq.write_table(part, os.path.join(d, "log-000.parquet"))
    apply_changes(os.path.join(work, "log2a"), lake, mode="delta")
    compact_deltas(lake)
    apply_changes(os.path.join(work, "log2b"), lake, mode="delta")
    return final_state(lake)


def run_cdc_view_demo(
    sf_dir: str, work_dir: str | None = None, num_partitions: int = 8
) -> rd.Dataset:
    """Incremental-view-maintenance demo: materialize a per-source
    aggregate view at epoch 1, apply the epoch-2 change mix, then
    REFRESH the view from the change feed (cdc/views.py — deltas of
    changed keys only, never a lake rescan). Returns the refreshed
    view; its exact oracle is the cdc_replay closed form grouped by
    source."""
    from palimpzest_ray.cdc import views

    work = work_dir or demo_workdir(sf_dir, "cdc_view_demo")
    lake, log1, log2 = prepare_demo_inputs(sf_dir, work)
    view = os.path.join(work, "view")
    apply_changes(log1, lake, num_partitions=num_partitions)
    views.create_view(
        lake, view, group_col="source",
        aggs={"n_docs": ("count", None), "total_tok": ("sum", "n_tok")},
    )
    apply_changes(log2, lake, num_partitions=num_partitions)
    views.refresh_view(lake, view)

    def _int_sum(batch: pa.Table) -> pa.Table:
        # stored sums are float64; n_tok sums are integral — emit int64
        # to match the SQL oracle's sum(int) type
        return pa.table(
            {
                "source": batch["source"],
                "n_docs": batch["n_docs"],
                "total_tok": pc.cast(pc.round(batch["total_tok"]), pa.int64()),
            }
        )

    return views.read_view(view).map_batches(_int_sum, batch_format="pyarrow")


def expected_final_rowcount(sf_dir: str) -> int:
    """Pure-function oracle for the demo's final row count."""
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
    num = t["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    deleted = int(((num % 5) == 0).sum())
    return len(num) - deleted + 10
