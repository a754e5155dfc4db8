"""Sequential-replay oracle for the CDC engine (test-only).

Single-process, row-at-a-time replay: sort the change log by ``lsn``,
apply into a dict keyed by ``doc_id`` (FIXTURES.md §4). The distributed
engine's final state must match per-row — including token-array
equality (BASELINE.json input_hint). Deliberately naive: correctness
reference, never a performance path.
"""

from __future__ import annotations

import pyarrow as pa

from palimpzest_ray.schemas import unify


def sequential_replay(
    base: pa.Table | None,
    changes: pa.Table,
    key: str = "doc_id",
) -> pa.Table:
    """Replay ``changes`` (any row order; sorted by lsn here) over
    ``base``; return the final table sorted by key.

    Semantics under test (FIXTURES.md §2): last-writer-wins by max
    ``lsn`` per key; DELETE = tombstone (row absent); UPDATE/INSERT of a
    missing key = upsert; replaying duplicate LSNs is idempotent.
    """
    schema = changes.schema
    user_fields = [f for f in schema if f.name not in ("lsn", "op")]
    if base is not None:
        unified = unify(pa.schema(user_fields), base.schema)
    else:
        unified = pa.schema(user_fields)

    state: dict[str, tuple[int, dict]] = {}
    if base is not None:
        for row in base.to_pylist():
            state[row[key]] = (-1, {f.name: row.get(f.name) for f in unified})

    rows = changes.sort_by("lsn").to_pylist()
    for row in rows:
        lsn = row["lsn"]
        k = row[key]
        prev = state.get(k)
        if prev is not None and prev[0] > lsn:
            continue  # stale (only possible on duplicate/overlapping replay)
        if row["op"] == "DELETE":
            state.pop(k, None)
            # a tombstone also wins over any lower-lsn late arrival; the
            # dict-based oracle replays in lsn order so dropping is enough
        else:
            state[k] = (lsn, {f.name: row.get(f.name) for f in unified})

    final_rows = sorted((v[1] for v in state.values()), key=lambda r: r[key])
    return pa.Table.from_pylist(final_rows, schema=unified)
