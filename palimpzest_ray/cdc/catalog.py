"""Multi-lake CATALOG: atomic cross-table snapshots.

A real CDC stream carries TRANSACTIONS that span tables (an order row
and its lineitem rows commit together upstream). Each lake's manifest
commit is atomic per lake, but a reader joining two lakes mid-ingest
could see table A at epoch 2 and table B at epoch 1 — a cut no
upstream transaction ever produced. The catalog closes that gap the
lakehouse way (Iceberg REST catalog / Delta commit coordinator): a
tiny versioned JSON that PINS a consistent set of (lake, version)
pairs, committed with the same flock-CAS discipline as a manifest.

- Writers: :func:`commit_transaction` applies each table's change set
  (ordinary exactly-once ``apply_changes`` — LWW idempotence makes
  crash-rerun safe), then publishes ONE catalog version naming every
  lake's new manifest version. A crash between lake applies leaves the
  catalog at the previous version: catalog readers never observe the
  partial transaction, and the rerun converges and publishes.
- Readers: :func:`snapshot` resolves a catalog version to its pins;
  :func:`read_table` / :func:`lookup_table` are ``final_state`` /
  ``lookup`` with the pinned ``version`` forced — time travel across
  ALL tables with one number.

The catalog stores only names → (root, version): bytes are never
copied, vacuum per lake still applies (keep enough versions for the
catalog snapshots you serve).
"""

from __future__ import annotations

import dataclasses
import fcntl
import json
import os

import pyarrow as pa

from palimpzest_ray.cdc.engine import apply_changes, final_state, lookup
from palimpzest_ray.cdc.manifest import (
    ConcurrentCommitError,
    _atomic_write,
    load_latest_manifest,
)

_PTR = "CATALOG-LATEST"


@dataclasses.dataclass
class CatalogSnapshot:
    version: int
    pins: dict[str, dict]  # name -> {"root": str, "version": int}

    def pin(self, name: str) -> tuple[str, int]:
        if name not in self.pins:
            raise KeyError(
                f"table {name!r} not in catalog (has {sorted(self.pins)})"
            )
        p = self.pins[name]
        return p["root"], int(p["version"])


def _cat_path(root: str, version: int) -> str:
    return os.path.join(root, f"CATALOG-v{version}.json")


def latest_version(catalog_root: str) -> int:
    ptr = os.path.join(catalog_root, _PTR)
    if not os.path.exists(ptr):
        return 0
    with open(ptr) as f:
        return int(f.read().strip())


def snapshot(catalog_root: str, version: int | None = None) -> CatalogSnapshot:
    v = latest_version(catalog_root) if version is None else version
    if v == 0:
        raise FileNotFoundError(f"no catalog committed under {catalog_root}")
    path = _cat_path(catalog_root, v)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"catalog version {v} not found under {catalog_root}"
        )
    with open(path) as f:
        d = json.load(f)
    return CatalogSnapshot(version=d["version"], pins=d["pins"])


def commit_catalog(
    catalog_root: str, pins: dict[str, tuple[str, int | None]]
) -> CatalogSnapshot:
    """Publish one catalog version pinning each named lake at an
    explicit manifest version (``None`` = its current latest). The
    flock-CAS mirrors the manifest's: concurrent catalog commits
    serialize; a commit whose base moved raises."""
    os.makedirs(catalog_root, exist_ok=True)
    resolved: dict[str, dict] = {}
    for name, (root, v) in sorted(pins.items()):
        if v is None:
            m = load_latest_manifest(root)
            if m is None:
                raise FileNotFoundError(f"no committed lake under {root}")
            v = m.version
        resolved[name] = {"root": os.path.abspath(root), "version": int(v)}
    lock_path = os.path.join(catalog_root, ".catalog.lock")
    with open(lock_path, "w") as lock:
        fcntl.flock(lock.fileno(), fcntl.LOCK_EX)
        head = latest_version(catalog_root)
        new_v = head + 1
        path = _cat_path(catalog_root, new_v)
        if os.path.exists(path):  # pragma: no cover - CAS safety net
            raise ConcurrentCommitError(
                f"catalog version {new_v} already exists"
            )
        _atomic_write(
            path, json.dumps({"version": new_v, "pins": resolved})
        )
        _atomic_write(os.path.join(catalog_root, _PTR), str(new_v))
    return CatalogSnapshot(version=new_v, pins=resolved)


def commit_transaction(
    catalog_root: str,
    changes: dict[str, object],
    lakes: dict[str, str],
    *,
    apply_kwargs: dict[str, dict] | None = None,
    carry_unchanged: bool = True,
) -> CatalogSnapshot:
    """Apply one upstream TRANSACTION that spans tables, atomically for
    catalog readers: each named change set runs through the ordinary
    exactly-once ``apply_changes`` on its lake, then ONE catalog commit
    pins every resulting version (plus, with ``carry_unchanged``, the
    current version of catalog tables this transaction didn't touch).

    Crash semantics: a failure after some lake applies leaves the
    catalog unchanged — snapshot readers still see the pre-transaction
    cut. Re-running the same transaction converges (LWW idempotence,
    per-partition resume) and publishes. There is no rollback of lake
    internals, and none is needed: un-published versions are invisible
    to catalog readers and reclaimable by vacuum.

    ``changes``: name → change source (path(s) or a Ray Dataset).
    ``lakes``: name → lake root (must cover every key in ``changes``).
    """
    missing = set(changes) - set(lakes)
    if missing:
        raise ValueError(f"changes name lakes that are not mapped: {sorted(missing)}")
    kw = apply_kwargs or {}
    pins: dict[str, tuple[str, int | None]] = {}
    for name in sorted(changes):
        res = apply_changes(changes[name], lakes[name], **kw.get(name, {}))
        pins[name] = (lakes[name], res.manifest.version)
    if carry_unchanged:
        try:
            prev = snapshot(catalog_root)
        except FileNotFoundError:
            prev = None
        if prev is not None:
            for name, p in prev.pins.items():
                pins.setdefault(name, (p["root"], p["version"]))
    for name, root in lakes.items():
        pins.setdefault(name, (root, None))
    return commit_catalog(catalog_root, pins)


def read_table(
    catalog_root: str,
    name: str,
    *,
    catalog_version: int | None = None,
    **final_state_kwargs,
):
    """``final_state`` of one catalog table at the catalog snapshot's
    pinned version — every table read through the same snapshot is a
    transactionally-consistent cut."""
    snap = snapshot(catalog_root, catalog_version)
    root, v = snap.pin(name)
    return final_state(root, version=v, **final_state_kwargs)


def lookup_table(
    catalog_root: str,
    name: str,
    keys: list,
    *,
    catalog_version: int | None = None,
    **lookup_kwargs,
) -> pa.Table:
    snap = snapshot(catalog_root, catalog_version)
    root, v = snap.pin(name)
    return lookup(root, keys, version=v, **lookup_kwargs)


__all__ = [
    "CatalogSnapshot",
    "commit_catalog",
    "commit_transaction",
    "latest_version",
    "lookup_table",
    "read_table",
    "snapshot",
]


# --- catalog subscriptions: consistent multi-table change feeds --------

def catalog_subscribe(
    catalog_root: str, name: str, *, from_version: int | None = None
) -> dict:
    """Durable MULTI-TABLE cursor: pins a catalog version (default:
    the current head) AND creates a per-lake subscription on every
    pinned table at its pinned manifest version — so each lake's
    vacuum retention floor (``cdc.subs``) automatically protects
    exactly the versions this consumer still needs. The consumer-group
    idea lifted to the transactional cut: a poll delivers, per table,
    the net changes between two CONSISTENT catalog snapshots — never a
    torn read across tables."""
    from palimpzest_ray.cdc.subs import (
        create_subscription,
        drop_subscription,
    )

    snap = snapshot(catalog_root, from_version)
    subs = {}
    made = []
    try:
        for t in sorted(snap.pins):
            root, v = snap.pin(t)
            sub_name = f"cat-{name}-{t}"
            create_subscription(root, sub_name, from_version=v)
            made.append((root, sub_name))
            subs[t] = {"root": root, "sub": sub_name, "from_v": v}
    except Exception:
        for root, sub_name in made:  # all-or-nothing registration
            drop_subscription(root, sub_name)
        raise
    cur = {"name": name, "catalog_version": snap.version, "tables": subs}
    p = os.path.join(catalog_root, "_subs", f"{name}.json")
    if os.path.exists(p):
        for root, sub_name in made:
            drop_subscription(root, sub_name)
        raise ValueError(f"catalog subscription {name!r} already exists")
    os.makedirs(os.path.dirname(p), exist_ok=True)
    _atomic_write(p, json.dumps(cur))
    return cur


def _load_cat_sub(catalog_root: str, name: str) -> dict:
    p = os.path.join(catalog_root, "_subs", f"{name}.json")
    if not os.path.exists(p):
        raise FileNotFoundError(
            f"no catalog subscription {name!r} under {catalog_root}"
        )
    with open(p) as fh:
        return json.load(fh)


def catalog_poll(catalog_root: str, name: str) -> tuple[dict, int]:
    """Per-table net change feeds from the cursor's catalog snapshot to
    the CURRENT catalog head — both consistent cuts, so a consumer
    applying every feed sees whole routed transactions, never half.
    Returns ``({table: Dataset | None}, head_catalog_version)`` — the
    ack token; ``None`` for tables whose pin did not move. At-least-
    once: the cursor advances only on :func:`catalog_ack`. A table
    added to the catalog after the cursor is registered by the next
    :func:`catalog_ack` (which creates its per-lake retention
    subscription) and then contributes its FULL pinned state as
    upserts on the poll cycle after that ack — ``from_v=0`` is the
    empty-lake baseline ``net_changes_between`` bootstraps from."""
    from palimpzest_ray.cdc.engine import net_changes_between

    cur = _load_cat_sub(catalog_root, name)
    old = snapshot(catalog_root, cur["catalog_version"])
    head = snapshot(catalog_root)
    feeds: dict = {}
    for t, info in sorted(cur["tables"].items()):
        if t not in head.pins:
            feeds[t] = None  # table left the catalog; nothing to replay
            continue
        root = info["root"]
        v_old = info.get("from_v")
        if v_old is None:  # pre-from_v cursor on disk: legacy path
            root, v_old = old.pin(t)
        root2, v_new = head.pin(t)
        if os.path.abspath(root2) != os.path.abspath(root):
            # table re-rooted since registration: its version numbers
            # belong to ANOTHER lake's history — deliver nothing until
            # the next ack re-registers it against the new root
            feeds[t] = None
            continue
        feeds[t] = (
            None
            if v_new <= v_old
            else net_changes_between(root, v_old, v_new)
        )
    return feeds, head.version


def catalog_ack(catalog_root: str, name: str, token: int) -> dict:
    """Advance the multi-table cursor to catalog version ``token``,
    advance every per-lake retention subscription to that snapshot's
    pinned versions (releasing vacuum floors table by table), and
    REGISTER any table that joined the catalog since the cursor was
    created: it gets a per-lake subscription (retention protection
    from its earliest retained version) and ``from_v=0``, so the next
    poll delivers its full pinned state as upserts through the same
    feed path (ADVICE r3: new tables used to be silently dropped)."""
    from palimpzest_ray.cdc.subs import ack_subscription, create_subscription

    cur = _load_cat_sub(catalog_root, name)
    t_snap = snapshot(catalog_root, int(token))
    if int(token) < cur["catalog_version"]:
        raise ValueError(
            f"ack token {token} is behind the cursor "
            f"({cur['catalog_version']})"
        )
    def _register(t: str, root: str) -> None:
        """Per-lake retention floor for a table the cursor has not
        consumed yet: pin the EARLIEST RETAINED version (version 1 may
        be vacuumed — probing it would FileNotFoundError and wedge the
        cursor forever), and mark from_v=0 so the next poll delivers
        the full pinned state as upserts."""
        import glob as _g

        sub_name = f"cat-{name}-{t}"
        retained = sorted(
            int(os.path.basename(p_)[len("MANIFEST-v"):-len(".json")])
            for p_ in _g.glob(os.path.join(root, "MANIFEST-v*.json"))
        )
        try:
            create_subscription(
                root, sub_name, from_version=retained[0] if retained else 1
            )
        except ValueError:
            pass  # debris from the table previously leaving the catalog
        cur["tables"][t] = {"root": root, "sub": sub_name, "from_v": 0}

    for t, info in sorted(cur["tables"].items()):
        if t in t_snap.pins:
            root, v = t_snap.pin(t)
            if os.path.abspath(root) != os.path.abspath(info["root"]):
                # the table left and rejoined under a DIFFERENT lake:
                # the old cursor entry is for another lake's history —
                # re-register against the new root (full re-delivery)
                from palimpzest_ray.cdc.subs import drop_subscription

                try:
                    drop_subscription(info["root"], info["sub"])
                except FileNotFoundError:
                    pass
                _register(t, root)
                continue
            ack_subscription(info["root"], info["sub"], v)
            info["from_v"] = v
    for t in sorted(set(t_snap.pins) - set(cur["tables"])):
        root, _v = t_snap.pin(t)
        _register(t, root)
    cur["catalog_version"] = int(token)
    _atomic_write(
        os.path.join(catalog_root, "_subs", f"{name}.json"),
        json.dumps(cur),
    )
    return cur


def catalog_unsubscribe(catalog_root: str, name: str) -> None:
    from palimpzest_ray.cdc.subs import drop_subscription

    cur = _load_cat_sub(catalog_root, name)
    for _t, info in cur["tables"].items():
        try:
            drop_subscription(info["root"], info["sub"])
        except FileNotFoundError:
            pass
    os.unlink(os.path.join(catalog_root, "_subs", f"{name}.json"))
