"""Property-based tests (hypothesis) for the ACCUMULATE fold algebra
(cdc/patch.py fold_patch_events(sum_cols=...)) — the SummingMergeTree /
Hudi merge-payload semantics, checked on hundreds of random mixed logs
without paying a Ray apply per example:

1. fold == the naive per-event accumulate replay (UPDATE adds non-null
   deltas on sum columns and patches the rest; INSERT resets; DELETE
   tombstones; resurrection sums from empty = NULL until a delta).
2. Sequential chunk composition: folding any LSN-ordered split with the
   intermediate folded state carried as the next chunk's base equals
   one-shot folding — the monoid claim ``chunk_events`` rests on (a
   later reset discards earlier sums; otherwise sums add).
3. Permutation invariance when LSNs are unique (addition commutes; the
   barrier is an LSN-order fact, not an input-order fact).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from palimpzest_ray.cdc.patch import fold_patch_events

USER = ["cnt", "score", "source"]
SUM_COLS = ("cnt", "score")
SCHEMA = pa.schema(
    [
        pa.field("lsn", pa.int64()),
        pa.field("op", pa.string()),
        pa.field("doc_id", pa.string()),
        pa.field("cnt", pa.int32()),
        pa.field("score", pa.float64()),
        pa.field("source", pa.string()),
    ]
)
BASE_SCHEMA = pa.schema([f for f in SCHEMA if f.name not in ("lsn", "op")])


@st.composite
def accum_logs(draw):
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
            cnt, sco, src = None, None, None
        elif op == "INSERT":  # full image, genuine nulls allowed
            cnt = int(rng.integers(-9, 99)) if rng.random() < 0.7 else None
            sco = float(rng.integers(0, 8)) / 2 if rng.random() < 0.7 else None
            src = f"s{i % 3}" if rng.random() < 0.7 else None
        else:  # delta on sum cols, patch on the rest: null = absent
            cnt = int(rng.integers(-9, 9)) if rng.random() < 0.5 else None
            sco = float(rng.integers(-4, 4)) / 2 if rng.random() < 0.5 else None
            src = f"s{i % 3}" if rng.random() < 0.5 else None
        rows.append(
            {"lsn": int(lsns[i]), "op": op, "doc_id": k,
             "cnt": cnt, "score": sco, "source": src}
        )
    base_rows = [
        {"doc_id": f"k{j}", "cnt": 10 * j, "score": float(j), "source": "base"}
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
                if row[c] is None:
                    continue
                if c in SUM_COLS:
                    cur[c] = row[c] if cur[c] is None else cur[c] + row[c]
                else:
                    cur[c] = row[c]
            state[k] = cur
    return state


def _fold_state(base: pa.Table, events: pa.Table) -> dict:
    state = {
        r["doc_id"]: {c: r[c] for c in USER} for r in base.to_pylist()
    }
    for r in fold_patch_events(events, base, sum_cols=SUM_COLS).to_pylist():
        if r["op"] == "DELETE":
            state.pop(r["doc_id"], None)
        else:
            state[r["doc_id"]] = {c: r[c] for c in USER}
    return state


@given(accum_logs())
@settings(max_examples=150, deadline=None)
def test_accum_fold_equals_naive_replay(log):
    events, base = log
    assert _fold_state(base, events) == _naive(base, events)


@given(accum_logs(), st.integers(0, 49))
@settings(max_examples=150, deadline=None)
def test_accum_chunked_fold_composes(log, cut):
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


@given(accum_logs(), st.integers(0, 2**16))
@settings(max_examples=100, deadline=None)
def test_accum_fold_is_permutation_invariant(log, seed):
    events, base = log
    perm = np.random.default_rng(seed).permutation(events.num_rows)
    shuffled = events.take(pa.array(perm))
    assert _fold_state(base, shuffled) == _fold_state(base, events)


def test_sum_cols_validation():
    import pytest

    ev = pa.Table.from_pylist(
        [{"lsn": 1, "op": "UPDATE", "doc_id": "a",
          "cnt": 1, "score": 1.0, "source": "s"}],
        SCHEMA,
    )
    with pytest.raises(ValueError, match="key/lsn/op"):
        fold_patch_events(ev, sum_cols=("doc_id",))
    with pytest.raises(ValueError, match="must be numeric"):
        fold_patch_events(ev, sum_cols=("source",))
    with pytest.raises(ValueError, match="not in the fold schema"):
        fold_patch_events(ev, sum_cols=("missing",))


# ---- max/min merge policies (AggregatingMergeTree extremum states) ----

MAX_COLS = ("cnt",)
MIN_COLS = ("score",)


def _naive_ext(base: pa.Table, events: pa.Table) -> dict:
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
                if row[c] is None:
                    continue
                if c in MAX_COLS:
                    cur[c] = row[c] if cur[c] is None else max(cur[c], row[c])
                elif c in MIN_COLS:
                    cur[c] = row[c] if cur[c] is None else min(cur[c], row[c])
                else:
                    cur[c] = row[c]
            state[k] = cur
    return state


def _fold_state_ext(base: pa.Table, events: pa.Table) -> dict:
    state = {
        r["doc_id"]: {c: r[c] for c in USER} for r in base.to_pylist()
    }
    folded = fold_patch_events(
        events, base, max_cols=MAX_COLS, min_cols=MIN_COLS
    )
    for r in folded.to_pylist():
        if r["op"] == "DELETE":
            state.pop(r["doc_id"], None)
        else:
            state[r["doc_id"]] = {c: r[c] for c in USER}
    return state


@given(accum_logs())
@settings(max_examples=150, deadline=None)
def test_extremum_fold_equals_naive_replay(log):
    events, base = log
    assert _fold_state_ext(base, events) == _naive_ext(base, events)


@given(accum_logs(), st.integers(0, 49))
@settings(max_examples=100, deadline=None)
def test_extremum_chunked_fold_composes(log, cut):
    events, base = log
    ordered = events.sort_by("lsn")
    cut = min(cut, ordered.num_rows)
    first, second = ordered.slice(0, cut), ordered.slice(cut)
    if first.num_rows and second.num_rows:
        mid = _fold_state_ext(base, first)
        mid_table = pa.Table.from_pylist(
            [{"doc_id": k, **v} for k, v in sorted(mid.items())],
            BASE_SCHEMA,
        )
        got = _fold_state_ext(mid_table, second)
    elif first.num_rows:
        got = _fold_state_ext(base, first)
    else:
        got = _fold_state_ext(base, second)
    assert got == _naive_ext(base, events)


@given(accum_logs(), st.integers(0, 2**16))
@settings(max_examples=100, deadline=None)
def test_extremum_fold_is_permutation_invariant(log, seed):
    events, base = log
    perm = np.random.default_rng(seed).permutation(events.num_rows)
    shuffled = events.take(pa.array(perm))
    assert _fold_state_ext(base, shuffled) == _fold_state_ext(base, events)


def test_policy_sets_must_be_disjoint():
    import pytest

    ev = pa.Table.from_pylist(
        [{"lsn": 1, "op": "UPDATE", "doc_id": "a",
          "cnt": 1, "score": 1.0, "source": "s"}],
        SCHEMA,
    )
    with pytest.raises(ValueError, match="more than one merge policy"):
        fold_patch_events(ev, sum_cols=("cnt",), max_cols=("cnt",))
