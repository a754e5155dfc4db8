"""Property-based tests (hypothesis) for the CDC engine's ALGEBRA —
the claims everything distributed rests on, checked on hundreds of
random logs without paying a Ray apply per example:

1. LWW reduction == the sequential replay oracle's survivor set.
2. Segment-split commutativity: replaying any prefix/suffix split,
   with PERSISTED tombstones carried between segments, equals one-shot
   replay (the apply-per-epoch correctness core).
3. Permutation invariance: row order never matters (the engine's
   nondeterministic block order is free).
4. Duplicate-LSN idempotence: replaying any subset of events again
   changes nothing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from palimpzest_ray.cdc.engine import lww_latest
from palimpzest_ray.cdc.oracle import sequential_replay
from palimpzest_ray.schemas import CHANGELOG_SCHEMA


@st.composite
def change_logs(draw):
    """Random change log: few hot keys (collisions guaranteed), ops
    INSERT/UPDATE/DELETE (deletes of missing keys included), unique
    LSNs handed out in shuffled order so arrival order != lsn order."""
    n = draw(st.integers(1, 60))
    n_keys = draw(st.integers(1, 8))
    seed = draw(st.integers(0, 2**16))
    rng = np.random.default_rng(seed)
    lsns = rng.permutation(n) + 1
    rows = []
    for i in range(n):
        k = f"k{int(rng.integers(0, n_keys))}"
        op = ["INSERT", "UPDATE", "DELETE"][int(rng.integers(0, 3))]
        tok = None if op == "DELETE" else rng.integers(
            0, 100, int(rng.integers(0, 4))
        ).tolist()
        rows.append(
            {
                "lsn": int(lsns[i]),
                "op": op,
                "doc_id": k,
                "tokens": tok,
                "n_tok": None if tok is None else len(tok),
                "source": None if op == "DELETE" else f"s{int(lsns[i]) % 3}",
            }
        )
    return pa.Table.from_pylist(rows, CHANGELOG_SCHEMA)


def _live(table: pa.Table) -> list[dict]:
    """Canonical comparable form of a final state."""
    cols = ["doc_id", "tokens", "n_tok", "source"]
    return sorted(
        (
            {c: r[c] for c in cols}
            for r in table.select(
                [c for c in cols if c in table.column_names]
            ).to_pylist()
        ),
        key=lambda r: r["doc_id"],
    )


def _lww_final(changes: pa.Table) -> pa.Table:
    """Pure LWW reduction to live rows (what the merge computes)."""
    top = lww_latest(changes, key="doc_id", lsn="lsn")
    import pyarrow.compute as pc

    live = top.filter(pc.invert(pc.equal(top["op"], "DELETE")))
    return live.drop_columns(["lsn", "op"])


@given(change_logs())
@settings(max_examples=150, deadline=None)
def test_lww_reduction_equals_sequential_replay(log):
    got = _live(_lww_final(log))
    want = _live(sequential_replay(None, log))
    assert got == want


@given(change_logs(), st.integers(0, 2**16))
@settings(max_examples=100, deadline=None)
def test_permutation_invariance(log, perm_seed):
    rng = np.random.default_rng(perm_seed)
    perm = log.take(pa.array(rng.permutation(log.num_rows)))
    assert _live(_lww_final(perm)) == _live(_lww_final(log))


@given(change_logs(), st.integers(0, 60))
@settings(max_examples=100, deadline=None)
def test_segment_split_commutes_with_persisted_tombstones(log, cut):
    """Replay(seg1) then replay(seg2 over survivors+tombstones) ==
    one-shot replay — the reason out-of-order SEGMENTS are safe as
    long as tombstones persist (FIXTURES.md §2). The inter-segment
    state must keep the max-lsn row per key INCLUDING deletions, which
    is exactly what the lake's persisted `_deleted` rows are."""
    cut = cut % (log.num_rows + 1)
    seg1, seg2 = log.slice(0, cut), log.slice(cut)
    state1 = lww_latest(seg1, key="doc_id", lsn="lsn")  # incl. tombstones
    combined = pa.concat_tables(
        [state1, seg2], promote_options="permissive"
    )
    got = _live(_lww_final(combined))
    assert got == _live(_lww_final(log))


@given(change_logs(), st.integers(0, 2**16))
@settings(max_examples=100, deadline=None)
def test_duplicate_replay_idempotent(log, seed):
    rng = np.random.default_rng(seed)
    mask = rng.random(log.num_rows) < 0.5
    dup = pa.concat_tables([log, log.filter(pa.array(mask))])
    assert _live(_lww_final(dup)) == _live(_lww_final(log))
