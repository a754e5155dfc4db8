"""Durable change-feed subscriptions: the consumer-group story.

``net_changes_since(lake, v)`` answers "what changed since version v"
— but a real downstream consumer (a replica, an index builder, a
training-data exporter) needs a DURABLE cursor it does not have to
track itself, redelivery when it crashes mid-processing, and a
guarantee that retention cleanup cannot age out the versions it still
needs. That is Kafka's consumer-group offset, done lake-natively:

- ``create_subscription(lake, name)`` pins a named cursor at a manifest
  version (default: the current head — "changes from now on"; or any
  retained ``from_version`` for a backfill-then-follow start).
- ``poll_subscription(lake, name)`` returns the net change feed from
  the cursor to the CURRENT head plus the head version as the ack
  token. Delivery is at-least-once by construction: the cursor moves
  only on ``ack_subscription(lake, name, token)``, so a consumer that
  crashes mid-processing re-polls the same feed — and because the feed
  is a keyed LWW change log, re-applying it anywhere is idempotent.
- ``vacuum`` retains every version at or above the OLDEST subscription
  cursor (the slowest consumer bounds retention, exactly like Kafka's
  log retention vs consumer lag); ``subscription_lag`` makes the
  laggard visible so an operator can fix or drop it.

Cursors are one tiny JSON file each under ``<lake>/_subs/`` — no Ray
session, no data I/O; the poll itself is ``net_changes_since``'s
manifest-pruned read (unchanged partitions never open)."""

from __future__ import annotations

import json
import os

import ray.data as rd

from palimpzest_ray.cdc.manifest import (
    _atomic_write,
    load_latest_manifest,
    load_manifest,
)

__all__ = [
    "ack_subscription",
    "create_subscription",
    "drop_subscription",
    "list_subscriptions",
    "poll_subscription",
    "subscription_lag",
]

_SUBS_DIR = "_subs"


def _sub_path(lake_root: str, name: str) -> str:
    if not name or "/" in name or name.startswith("."):
        raise ValueError(f"invalid subscription name {name!r}")
    return os.path.join(lake_root, _SUBS_DIR, f"{name}.json")


def _load_sub(lake_root: str, name: str) -> dict:
    p = _sub_path(lake_root, name)
    if not os.path.exists(p):
        raise FileNotFoundError(
            f"no subscription {name!r} under {lake_root}"
        )
    with open(p) as fh:
        return json.load(fh)


def create_subscription(
    lake_root: str, name: str, *, from_version: int | None = None,
    dst: str | None = None,
) -> dict:
    """Pin a named durable cursor. ``from_version=None`` starts at the
    CURRENT head (the consumer sees changes from now on — bootstrap the
    initial state separately via ``clone_lake``/``export_snapshot`` at
    the same version for a consistent handoff). An explicit retained
    ``from_version`` starts the feed there instead. ``dst`` records the
    consumer's destination path in the cursor JSON so ``sync_replica``
    can prove ownership (ADVICE r4: a name collision alone must not let
    one replica adopt another's cursor)."""
    head = load_latest_manifest(lake_root)
    if head is None:
        raise FileNotFoundError(f"no committed lake version under {lake_root}")
    v = head.version if from_version is None else int(from_version)
    if v < 1 or v > head.version:
        raise ValueError(
            f"from_version {v} outside retained range [1, {head.version}]"
        )
    load_manifest(lake_root, v)  # must be retained (not vacuumed)
    p = _sub_path(lake_root, name)
    if os.path.exists(p):
        raise ValueError(f"subscription {name!r} already exists")
    os.makedirs(os.path.dirname(p), exist_ok=True)
    sub = {"name": name, "version": v}
    if dst is not None:
        sub["dst"] = dst
    _atomic_write(p, json.dumps(sub))
    return sub


def poll_subscription(
    lake_root: str, name: str
) -> tuple[rd.Dataset | None, int]:
    """The net change feed from the cursor to the current head, plus
    the head version — the ACK TOKEN. Returns ``(None, cursor)`` when
    the consumer is caught up (no commit since the cursor). The feed is
    directly re-appliable via ``apply_changes`` (UPDATE upserts,
    DELETE tombstones) and safe to redeliver."""
    from palimpzest_ray.cdc.engine import net_changes_since

    sub = _load_sub(lake_root, name)
    head = load_latest_manifest(lake_root)
    if head.version <= sub["version"]:
        return None, sub["version"]
    return net_changes_since(lake_root, sub["version"]), head.version


def ack_subscription(lake_root: str, name: str, token: int) -> dict:
    """Advance the cursor to ``token`` (the head version a poll
    returned). Acking backwards is refused — redelivery is the POLL's
    job, not a cursor rewind (drop and recreate to replay history)."""
    sub = _load_sub(lake_root, name)
    head = load_latest_manifest(lake_root)
    t = int(token)
    if t < sub["version"]:
        raise ValueError(
            f"ack token {t} is behind the cursor ({sub['version']})"
        )
    if t > head.version:
        raise ValueError(f"ack token {t} is above the head ({head.version})")
    sub["version"] = t
    _atomic_write(_sub_path(lake_root, name), json.dumps(sub))
    return sub


def drop_subscription(lake_root: str, name: str) -> None:
    os.unlink(_sub_path(lake_root, name))


def list_subscriptions(lake_root: str) -> dict[str, int]:
    d = os.path.join(lake_root, _SUBS_DIR)
    if not os.path.isdir(d):
        return {}
    out: dict[str, int] = {}
    for f in sorted(os.listdir(d)):
        if f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                sub = json.load(fh)
            out[sub["name"]] = sub["version"]
    return out


def min_subscription_version(lake_root: str) -> int | None:
    """The slowest consumer's cursor — vacuum's retention floor."""
    subs = list_subscriptions(lake_root)
    return min(subs.values()) if subs else None


def sync_replica(
    src_root: str, dst_root: str, *, name: str | None = None
) -> dict:
    """One-call replica maintenance: the first call CLONES the source
    at its current head and pins a subscription at the same version
    (the consistent handoff); every later call polls the cursor,
    applies the net feed to the replica and acks — O(changes) catch-up,
    at-least-once safe (a crash between apply and ack redelivers and
    the LWW apply converges). Run it from cron/`tail_follow(on_commit)`
    and the replica follows the source. Returns
    ``{"bootstrapped": bool, "applied": rows, "version": cursor}``.

    The default cursor name hashes the ABSOLUTE dst path (ADVICE r3:
    a basename-only default collides for two replicas whose dst dirs
    share a basename, and the second bootstrap's drop-and-recreate
    would silently destroy the first consumer's cursor — its unacked
    changes never redelivered). The orphan restart below is therefore
    safe: an existing cursor under this name belongs to THIS dst path,
    so if the dst lake is gone the cursor is provably orphaned."""
    import hashlib

    ap = os.path.abspath(dst_root)
    if name is None:
        base = os.path.basename(ap)
        legacy = "replica-" + base
        sub_name = (
            f"replica-{base}-{hashlib.sha1(ap.encode()).hexdigest()[:8]}"
        )
        # migration: a pre-hash cursor keeps working under its old name
        # — but ONLY when it provably belongs to THIS dst (ADVICE r4:
        # a new replica whose dst basename matches an old consumer and
        # whose dst lake exists, e.g. seeded by clone, must not adopt
        # the other consumer's cursor). A dst-less cursor (written
        # before dst stamping) is claimed by its first adopter and
        # stamped so any later basename collision is rejected.
        lp = _sub_path(src_root, legacy)
        if not os.path.exists(_sub_path(src_root, sub_name)) and \
                os.path.exists(lp) and \
                load_latest_manifest(dst_root) is not None:
            with open(lp) as fh:
                lsub = json.load(fh)
            ldst = lsub.get("dst")
            if ldst == ap:
                sub_name = legacy
            elif ldst is None:
                lsub["dst"] = ap
                _atomic_write(lp, json.dumps(lsub))
                sub_name = legacy
    else:
        sub_name = name
    if load_latest_manifest(dst_root) is None:
        from palimpzest_ray.cdc.snapshot import clone_lake

        try:
            sub = create_subscription(src_root, sub_name, dst=ap)
        except ValueError:
            # a cursor from a deleted replica: restart the handoff
            drop_subscription(src_root, sub_name)
            sub = create_subscription(src_root, sub_name, dst=ap)
        clone_lake(src_root, dst_root)
        return {
            "bootstrapped": True, "applied": 0, "version": sub["version"]
        }
    import pyarrow as pa

    if not os.path.exists(_sub_path(src_root, sub_name)):
        # replica seeded out-of-band (e.g. clone_lake) with no cursor:
        # late-pin at the replica's OWN head version — the clone carried
        # the source manifests, so every change since then redelivers
        # from there (raises if that version is vacuumed or diverged)
        v = load_latest_manifest(dst_root).version
        create_subscription(src_root, sub_name, from_version=v, dst=ap)
    feed, token = poll_subscription(src_root, sub_name)
    if feed is None:
        return {"bootstrapped": False, "applied": 0, "version": token}
    from palimpzest_ray.cdc.engine import apply_changes

    tab = pa.concat_tables(
        feed.iter_batches(batch_format="pyarrow", batch_size=65536)
    )
    apply_changes(tab, dst_root)
    ack_subscription(src_root, sub_name, token)
    return {
        "bootstrapped": False, "applied": tab.num_rows, "version": token
    }


def subscription_lag(lake_root: str, name: str) -> dict:
    """How far a consumer trails the head: versions behind and events
    behind (head max_lsn - cursor max_lsn) — manifests only, no data
    read. The operator's view of which laggard is blocking vacuum."""
    sub = _load_sub(lake_root, name)
    head = load_latest_manifest(lake_root)
    pinned = load_manifest(lake_root, sub["version"])
    return {
        "name": name,
        "version": sub["version"],
        "head_version": head.version,
        "versions_behind": head.version - sub["version"],
        "events_behind": int(head.max_lsn) - int(pinned.max_lsn),
    }
