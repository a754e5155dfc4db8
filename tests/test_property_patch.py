"""Property-based tests (hypothesis) for the patch-fold ALGEBRA
(cdc/patch.py) — checked on hundreds of random mixed logs without
paying a Ray apply per example:

1. fold == the naive per-event patch replay (UPDATE sets non-null
   columns; INSERT resets; DELETE tombstones; resurrection composes
   from empty).
2. Sequential chunk composition: folding any LSN-ordered split, with
   the intermediate folded state carried as the next chunk's base,
   equals one-shot folding — the claim ``chunk_events`` rests on.
3. Permutation invariance: input row order never matters when LSNs
   are unique.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from palimpzest_ray.cdc.patch import fold_patch_events

USER = ["tokens", "n_tok", "source"]
SCHEMA = pa.schema(
    [
        pa.field("lsn", pa.int64()),
        pa.field("op", pa.string()),
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
    ]
)
BASE_SCHEMA = pa.schema([f for f in SCHEMA if f.name not in ("lsn", "op")])


@st.composite
def patch_logs(draw):
    n = draw(st.integers(1, 50))
    n_keys = draw(st.integers(1, 6))
    seed = draw(st.integers(0, 2**16))
    rng = np.random.default_rng(seed)
    lsns = rng.permutation(n) + 1
    rows = []
    for i in range(n):
        k = f"k{int(rng.integers(0, n_keys))}"
        op = ["INSERT", "UPDATE", "UPDATE", "DELETE"][int(rng.integers(0, 4))]
        if op == "DELETE":
            tok, ntk, src = None, None, None
        elif op == "INSERT":  # full image, genuine nulls allowed
            tok = rng.integers(0, 9, int(rng.integers(0, 3))).tolist()
            ntk = int(rng.integers(0, 99)) if rng.random() < 0.7 else None
            src = f"s{i % 3}" if rng.random() < 0.7 else None
        else:  # patch: null = absent
            tok = (
                rng.integers(0, 9, int(rng.integers(0, 3))).tolist()
                if rng.random() < 0.4
                else None
            )
            ntk = int(rng.integers(0, 99)) if rng.random() < 0.5 else None
            src = f"s{i % 3}" if rng.random() < 0.5 else None
        rows.append(
            {"lsn": int(lsns[i]), "op": op, "doc_id": k,
             "tokens": tok, "n_tok": ntk, "source": src}
        )
    base_rows = [
        {"doc_id": f"k{j}", "tokens": [j], "n_tok": j, "source": "base"}
        for j in range(n_keys)
        if rng.random() < 0.6  # some keys absent from the base
    ]
    return (
        pa.Table.from_pylist(rows, SCHEMA),
        pa.Table.from_pylist(base_rows, BASE_SCHEMA),
    )


def _naive(base: pa.Table, events: pa.Table) -> dict:
    state = {
        r["doc_id"]: {c: r[c] for c in USER} for r in base.to_pylist()
    }
    for row in sorted(events.to_pylist(), key=lambda r: r["lsn"]):
        k, op = row["doc_id"], row["op"]
        if op == "DELETE":
            state.pop(k, None)
        elif op == "INSERT":
            state[k] = {c: row[c] for c in USER}
        else:
            cur = state.get(k, {c: None for c in USER})
            for c in USER:
                if row[c] is not None:
                    cur[c] = row[c]
            state[k] = cur
    return state


def _fold_state(base: pa.Table, events: pa.Table) -> dict:
    """Fold output overlaid on untouched base rows = full final state."""
    state = {
        r["doc_id"]: {c: r[c] for c in USER} for r in base.to_pylist()
    }
    for r in fold_patch_events(events, base).to_pylist():
        if r["op"] == "DELETE":
            state.pop(r["doc_id"], None)
        else:
            state[r["doc_id"]] = {c: r[c] for c in USER}
    return state


@given(patch_logs())
@settings(max_examples=150, deadline=None)
def test_fold_equals_naive_replay(log):
    events, base = log
    assert _fold_state(base, events) == _naive(base, events)


@given(patch_logs(), st.integers(0, 49))
@settings(max_examples=150, deadline=None)
def test_chunked_fold_composes(log, cut):
    """Split at any LSN boundary; fold chunk 1, materialize its state,
    fold chunk 2 against THAT — equals the one-shot fold. (Tombstones
    between chunks: a key deleted in chunk 1 is simply absent from the
    carried base, which is exactly what lookup() returns.)"""
    events, base = log
    ordered = events.sort_by("lsn")
    cut = min(cut, ordered.num_rows)
    first, second = ordered.slice(0, cut), ordered.slice(cut)
    if first.num_rows and second.num_rows:
        mid = _fold_state(base, first)
        mid_table = pa.Table.from_pylist(
            [{"doc_id": k, **v} for k, v in sorted(mid.items())],
            BASE_SCHEMA,
        )
        got = _fold_state(mid_table, second)
    elif first.num_rows:
        got = _fold_state(base, first)
    else:
        got = _fold_state(base, second)
    assert got == _naive(base, events)


@given(patch_logs(), st.integers(0, 2**16))
@settings(max_examples=100, deadline=None)
def test_fold_is_permutation_invariant(log, seed):
    events, base = log
    perm = np.random.default_rng(seed).permutation(events.num_rows)
    shuffled = events.take(pa.array(perm))
    assert _fold_state(base, shuffled) == _fold_state(base, events)
