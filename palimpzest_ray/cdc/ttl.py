"""Row TTL: a stored expiry policy the maintenance loop enforces.

The ClickHouse ``TTL ts + INTERVAL n`` idea in this lake's terms: the
policy — "rows whose ``col`` is older than ``keep_seconds`` expire" —
is DECLARED once and stored with the lake (``_policy/ttl.json``, one
tiny JSON; operational config, not data semantics, so it is not a
versioned commit), and ``apply_ttl`` enforces it as an ordinary
``delete_where`` — a zone-map-pruned scan of ONLY the TTL column plus
one exactly-once DELETE commit, inheriting LWW idempotence, time
travel (the pre-expiry version still shows the rows until vacuum) and
merge-on-read staging. Hook ``apply_ttl`` into ``tail_follow``'s
``on_commit`` (or a scheduler) and expiry runs continuously; a no-op
enforcement (nothing expired) commits nothing.

``now=`` pins the clock for deterministic tests/oracles; production
callers omit it. Expiry compares against the column's own timeline, so
a replayed old log segment cannot "resurrect" expired rows past the
next enforcement — and because expiry is a DELETE, LWW keeps the
tombstone winning over any late event below it."""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa

from palimpzest_ray.cdc.manifest import _atomic_write, load_latest_manifest

__all__ = ["apply_ttl", "drop_ttl", "get_ttl", "set_ttl"]


def _ttl_path(lake_root: str) -> str:
    return os.path.join(lake_root, "_policy", "ttl.json")


def set_ttl(lake_root: str, col: str, keep_seconds: float) -> dict:
    """Declare the expiry policy: rows with ``col`` older than
    ``keep_seconds`` (vs enforcement time) expire. ``col`` must be a
    timestamp or numeric column; the LWW key and partition column are
    refused (expiring the identity of a live row is a purge, not a
    TTL)."""
    m = load_latest_manifest(lake_root)
    if m is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    if col not in m.schema.names:
        raise ValueError(f"unknown TTL column {col!r}")
    if col in {m.key, m.partition_key} | set(m.key_cols or ()):
        raise ValueError(f"cannot set TTL on key/partition column {col!r}")
    t = m.schema.field(col).type
    if not (pa.types.is_temporal(t) or pa.types.is_integer(t)
            or pa.types.is_floating(t)):
        raise ValueError(f"TTL column {col!r} must be temporal/numeric, not {t}")
    if keep_seconds <= 0:
        raise ValueError("keep_seconds must be positive")
    pol = {"col": col, "keep_seconds": float(keep_seconds)}
    os.makedirs(os.path.dirname(_ttl_path(lake_root)), exist_ok=True)
    _atomic_write(_ttl_path(lake_root), json.dumps(pol))
    return pol


def get_ttl(lake_root: str) -> dict | None:
    p = _ttl_path(lake_root)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def drop_ttl(lake_root: str) -> None:
    os.unlink(_ttl_path(lake_root))


def apply_ttl(
    lake_root: str, *, now: float | None = None, mode: str = "delta"
):
    """Enforce the stored policy: tombstone every live row whose TTL
    column is older than ``now - keep_seconds``. Returns the
    ``delete_where`` ApplyResult (``rows_deleted == 0`` commits
    nothing). Idempotent per cutoff; each later enforcement uses a
    later cutoff and expires the next slice."""
    from palimpzest_ray.cdc.engine import delete_where

    pol = get_ttl(lake_root)
    if pol is None:
        raise FileNotFoundError(f"no TTL policy under {lake_root} (set_ttl)")
    m = load_latest_manifest(lake_root)
    t = m.schema.field(pol["col"]).type
    ts = time.time() if now is None else float(now)
    cutoff_s = ts - pol["keep_seconds"]
    if pa.types.is_temporal(t):
        # plain-Python datetime: parquet footer stats and pyarrow
        # compute kernels both compare against it directly
        from datetime import datetime, timezone

        cutoff = datetime.fromtimestamp(cutoff_s, tz=timezone.utc)
        if getattr(t, "tz", None) is None:
            cutoff = cutoff.replace(tzinfo=None)
    else:
        cutoff = cutoff_s if pa.types.is_floating(t) else int(cutoff_s)
    return delete_where(
        lake_root, [(pol["col"], "<", cutoff)], mode=mode
    )
