"""Durable change-feed subscriptions: named cursors with at-least-once
poll/ack delivery, vacuum retention pinned to the slowest consumer."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from palimpzest_ray.cdc import (
    ack_subscription,
    apply_changes,
    create_subscription,
    drop_subscription,
    final_state_table,
    list_subscriptions,
    poll_subscription,
    subscription_lag,
    vacuum,
)
from palimpzest_ray.cdc.manifest import load_manifest


def _log(tmp_path, name, rows):
    t = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("lsn", pa.int64()), ("op", pa.string()),
             ("doc_id", pa.string()), ("n_tok", pa.int32())]
        ),
    )
    p = os.path.join(str(tmp_path), name)
    pq.write_table(t, p)
    return p


def _boot(tmp_path, lake, n=30):
    apply_changes(
        _log(tmp_path, "boot.parquet", [
            {"lsn": i + 1, "op": "INSERT",
             "doc_id": f"d{i:03d}", "n_tok": i}
            for i in range(n)
        ]),
        lake, num_partitions=4,
    )


def test_poll_ack_replica_convergence(tmp_path, ray_session):
    """The headline loop: clone at the cursor, poll, apply the feed to
    the replica, ack — the replica equals the source head."""
    from palimpzest_ray.cdc.snapshot import clone_lake

    lake = str(tmp_path / "lake")
    _boot(tmp_path, lake)
    create_subscription(lake, "replica")
    replica = str(tmp_path / "replica")
    clone_lake(lake, replica)  # consistent handoff at the cursor

    # caught up: nothing to deliver
    feed, token = poll_subscription(lake, "replica")
    assert feed is None

    # two more epochs on the source
    apply_changes(
        _log(tmp_path, "e2.parquet", [
            {"lsn": 100 + i, "op": "UPDATE",
             "doc_id": f"d{i:03d}", "n_tok": 999}
            for i in range(0, 30, 3)
        ]),
        lake,
    )
    apply_changes(
        _log(tmp_path, "e3.parquet", [
            {"lsn": 200, "op": "DELETE", "doc_id": "d001", "n_tok": None},
            {"lsn": 201, "op": "INSERT", "doc_id": "new1", "n_tok": 7},
        ]),
        lake,
    )
    feed, token = poll_subscription(lake, "replica")
    assert feed is not None
    tab = pa.concat_tables(
        feed.iter_batches(batch_format="pyarrow", batch_size=4096)
    )
    # the net feed carries exactly the changed keys
    assert set(tab["op"].to_pylist()) == {"UPDATE", "DELETE"}

    # crash before ack: re-poll redelivers the SAME feed
    feed2, token2 = poll_subscription(lake, "replica")
    tab2 = pa.concat_tables(
        feed2.iter_batches(batch_format="pyarrow", batch_size=4096)
    )
    assert token2 == token
    assert tab2.sort_by("doc_id").equals(tab.sort_by("doc_id"))

    apply_changes(tab, replica)
    ack_subscription(lake, "replica", token)
    assert final_state_table(replica).equals(final_state_table(lake))
    # caught up again
    feed3, _ = poll_subscription(lake, "replica")
    assert feed3 is None

    # re-applying the acked feed is harmless (at-least-once contract)
    apply_changes(tab, replica)
    assert final_state_table(replica).equals(final_state_table(lake))


def test_vacuum_retains_slowest_cursor(tmp_path, ray_session):
    lake = str(tmp_path / "lake")
    _boot(tmp_path, lake)
    create_subscription(lake, "slow")  # pinned at v1
    for e in range(3):
        apply_changes(
            _log(tmp_path, f"u{e}.parquet", [
                {"lsn": 1000 + 10 * e, "op": "UPDATE",
                 "doc_id": "d000", "n_tok": e}
            ]),
            lake,
        )
    res = vacuum(lake, keep_versions=1)
    assert res.versions_dropped == []  # the cursor pins v1..v4
    assert load_manifest(lake, 1) is not None

    lag = subscription_lag(lake, "slow")
    assert lag["versions_behind"] == 3
    assert lag["events_behind"] > 0

    # advance the cursor: retention releases
    feed, token = poll_subscription(lake, "slow")
    ack_subscription(lake, "slow", token)
    res2 = vacuum(lake, keep_versions=1)
    assert res2.versions_dropped == [1, 2, 3]

    # dropping the sub removes the floor entirely
    drop_subscription(lake, "slow")
    assert list_subscriptions(lake) == {}


def test_subscription_validations(tmp_path, ray_session):
    lake = str(tmp_path / "lake")
    _boot(tmp_path, lake)
    create_subscription(lake, "a")
    with pytest.raises(ValueError, match="already exists"):
        create_subscription(lake, "a")
    with pytest.raises(ValueError, match="outside retained"):
        create_subscription(lake, "b", from_version=99)
    with pytest.raises(ValueError, match="invalid subscription name"):
        create_subscription(lake, "../evil")
    with pytest.raises(FileNotFoundError):
        poll_subscription(lake, "nope")
    with pytest.raises(ValueError, match="above the head"):
        ack_subscription(lake, "a", 99)
    apply_changes(
        _log(tmp_path, "u.parquet",
             [{"lsn": 500, "op": "UPDATE", "doc_id": "d000", "n_tok": 1}]),
        lake,
    )
    _feed, token = poll_subscription(lake, "a")
    ack_subscription(lake, "a", token)
    with pytest.raises(ValueError, match="behind the cursor"):
        ack_subscription(lake, "a", 1)


def test_cli_sub_roundtrip(tmp_path, capsys, ray_session):
    import json as _json

    from palimpzest_ray import cli

    lake = str(tmp_path / "lake")
    _boot(tmp_path, lake)
    assert cli.main(["sub", lake, "create", "c1"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"name": "c1", "version": 1}
    apply_changes(
        _log(tmp_path, "u.parquet",
             [{"lsn": 500, "op": "UPDATE", "doc_id": "d000", "n_tok": 1}]),
        lake,
    )
    assert cli.main(["sub", lake, "lag", "c1"]) == 0
    lag = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert lag["versions_behind"] == 1
    assert cli.main(["sub", lake, "ack", "c1", "--token", "2"]) == 0
    capsys.readouterr()
    assert cli.main(["sub", lake, "list"]) == 0
    subs = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert subs == {"c1": 2}
    assert cli.main(["sub", lake, "drop", "c1"]) == 0


def test_sync_replica_lifecycle(tmp_path, ray_session):
    """One-call replica maintenance: bootstrap (clone + subscribe),
    incremental catch-ups, caught-up no-ops, convergence."""
    from palimpzest_ray.cdc import sync_replica

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _boot(tmp_path, src)

    r0 = sync_replica(src, dst)
    assert r0["bootstrapped"] and r0["applied"] == 0
    assert final_state_table(dst).equals(final_state_table(src))

    # changes on the source; next sync applies exactly the net feed
    apply_changes(
        _log(tmp_path, "u1.parquet", [
            {"lsn": 900, "op": "UPDATE", "doc_id": "d000", "n_tok": 77},
            {"lsn": 901, "op": "DELETE", "doc_id": "d001", "n_tok": None},
        ]),
        src,
    )
    r1 = sync_replica(src, dst)
    assert not r1["bootstrapped"] and r1["applied"] == 2
    assert final_state_table(dst).equals(final_state_table(src))

    # caught up: no-op
    r2 = sync_replica(src, dst)
    assert r2["applied"] == 0
    assert final_state_table(dst).equals(final_state_table(src))


def test_cli_ttl_and_sync(tmp_path, capsys, ray_session):
    import json as _json

    from palimpzest_ray import cli

    lake = str(tmp_path / "lake")
    _boot(tmp_path, lake, n=10)
    assert cli.main(
        ["ttl", lake, "set", "n_tok", "--keep-seconds", "5"]
    ) == 0
    pol = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert pol["col"] == "n_tok"
    # n_tok values are 0..9; now=12, keep=5 -> expire n_tok < 7
    assert cli.main(["ttl", lake, "apply", "--now", "12"]) == 0
    summ = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summ["rows_deleted"] == 7
    assert cli.main(["ttl", lake, "show"]) == 0
    capsys.readouterr()
    assert cli.main(["ttl", lake, "drop"]) == 0
    capsys.readouterr()

    dst = str(tmp_path / "replica")
    assert cli.main(["sync", lake, dst]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["bootstrapped"] is True
    assert cli.main(["sync", lake, dst]) == 0
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["applied"] == 0


def test_lake_digest_and_verify_replica(tmp_path, ray_session):
    """Digest is layout-independent (partition count, block order),
    detects a single changed value, and proves replica convergence."""
    from palimpzest_ray.cdc import (
        lake_digest,
        repartition_lake,
        sync_replica,
        verify_replica,
    )

    src = str(tmp_path / "src")
    _boot(tmp_path, src, n=40)
    d0 = lake_digest(src)
    assert d0["rows"] == 40

    # replica fleet loop: bootstrap + catch-up, then PROVE convergence
    dst = str(tmp_path / "dst")
    sync_replica(src, dst)
    apply_changes(
        _log(tmp_path, "u.parquet", [
            {"lsn": 900, "op": "UPDATE", "doc_id": "d000", "n_tok": 5},
            {"lsn": 901, "op": "DELETE", "doc_id": "d001", "n_tok": None},
        ]),
        src,
    )
    assert verify_replica(src, dst)["match"] is False  # replica behind
    sync_replica(src, dst)
    rep = verify_replica(src, dst)
    assert rep["match"] is True
    assert rep["src"] == rep["dst"]

    # layout independence: re-bucket the replica; content digest holds
    repartition_lake(dst, 7)
    assert verify_replica(src, dst)["match"] is True

    # sensitivity: one value differs -> different digest
    apply_changes(
        _log(tmp_path, "u2.parquet", [
            {"lsn": 950, "op": "UPDATE", "doc_id": "d002", "n_tok": 6},
        ]),
        dst,
    )
    assert verify_replica(src, dst)["match"] is False

    # projection digest: compare only shared columns
    rep2 = verify_replica(src, dst, columns=["doc_id"])
    assert rep2["match"] is True  # keys identical, payload diverged


@pytest.mark.usefixtures("ray_session")
def test_subscription_random_interleaving_property(tmp_path_factory):
    """Property: across random interleavings of source commits, polls,
    acks, and crash-before-ack drops, a consumer that finally drains
    its cursor converges the replica to the source — at-least-once
    delivery composed with LWW idempotence."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from palimpzest_ray.cdc.snapshot import clone_lake

    op_seq = st.lists(
        st.sampled_from(["commit", "sync", "crashpoll", "noop"]),
        min_size=3, max_size=10,
    )

    @given(ops=op_seq)
    @settings(max_examples=8, deadline=None)
    def check(ops):
        tmp = tmp_path_factory.mktemp("subprop")
        src = str(tmp / "src")
        dst = str(tmp / "dst")
        _boot(tmp, src, n=15)
        create_subscription(src, "c")
        clone_lake(src, dst)
        lsn = 100
        for op in ops:
            if op == "commit":
                apply_changes(
                    _log(tmp, f"u{lsn}.parquet", [
                        {"lsn": lsn, "op": "UPDATE",
                         "doc_id": f"d{lsn % 15:03d}", "n_tok": lsn},
                        {"lsn": lsn + 1, "op": "DELETE",
                         "doc_id": f"d{(lsn + 3) % 15:03d}", "n_tok": None},
                    ]),
                    src,
                )
                lsn += 10
            elif op == "sync":
                feed, token = poll_subscription(src, "c")
                if feed is not None:
                    tab = pa.concat_tables(feed.iter_batches(
                        batch_format="pyarrow", batch_size=4096))
                    apply_changes(tab, dst)
                    ack_subscription(src, "c", token)
            elif op == "crashpoll":
                # poll, apply, CRASH before ack — redelivery must heal
                feed, _token = poll_subscription(src, "c")
                if feed is not None:
                    tab = pa.concat_tables(feed.iter_batches(
                        batch_format="pyarrow", batch_size=4096))
                    apply_changes(tab, dst)
        # final drain
        feed, token = poll_subscription(src, "c")
        if feed is not None:
            tab = pa.concat_tables(feed.iter_batches(
                batch_format="pyarrow", batch_size=4096))
            apply_changes(tab, dst)
            ack_subscription(src, "c", token)
        assert final_state_table(dst).equals(final_state_table(src))

    check()


def test_sync_replica_same_basename_no_collision(tmp_path, ray_session):
    """ADVICE r3 (subs.py:172): two replicas whose dst dirs share a
    basename must not share the default cursor — the second bootstrap
    used to drop-and-recreate the first consumer's subscription,
    losing its unacked changes. The default name now hashes the
    absolute dst path."""
    import pyarrow as pa
    import ray.data as rd

    from palimpzest_ray.cdc import (
        apply_changes,
        final_state_table,
        list_subscriptions,
        sync_replica,
    )
    from palimpzest_ray.schemas import CHANGELOG_SCHEMA

    src = str(tmp_path / "src")
    rows = [
        {"lsn": i, "op": "INSERT", "doc_id": f"d{i}", "tokens": [i],
         "n_tok": 1, "source": "w"}
        for i in range(1, 4)
    ]
    apply_changes(
        rd.from_arrow(pa.Table.from_pylist(rows, CHANGELOG_SCHEMA)),
        src, num_partitions=2, change_schema=CHANGELOG_SCHEMA,
    )
    dst1 = str(tmp_path / "siteA" / "replica")
    dst2 = str(tmp_path / "siteB" / "replica")
    sync_replica(src, dst1)
    subs_after_first = dict(list_subscriptions(src))
    sync_replica(src, dst2)  # same basename, different path
    subs_after_second = dict(list_subscriptions(src))
    # first consumer's cursor survived; two distinct cursors exist
    assert set(subs_after_first) <= set(subs_after_second)
    assert len(subs_after_second) == 2

    # both replicas independently catch up on new changes
    more = [{"lsn": 10, "op": "UPDATE", "doc_id": "d1",
             "tokens": [9, 9], "n_tok": 2, "source": "w"}]
    apply_changes(
        rd.from_arrow(pa.Table.from_pylist(more, CHANGELOG_SCHEMA)),
        src, num_partitions=2, change_schema=CHANGELOG_SCHEMA,
    )
    r1 = sync_replica(src, dst1)
    r2 = sync_replica(src, dst2)
    assert r1["applied"] >= 1 and r2["applied"] >= 1
    for dst in (dst1, dst2):
        st = final_state_table(dst)
        row = {d: n for d, n in zip(st["doc_id"].to_pylist(),
                                    st["n_tok"].to_pylist())}
        assert row["d1"] == 2


def test_diff_lakes_repair_and_prove(tmp_path, ray_session):
    """Table diff as a re-appliable feed (cdc/digest.py diff_lakes):
    two lakes with NO shared version history — dst drifted by a manual
    extra insert, a divergent update, and a missing row (src-only) —
    converge via apply_changes(diff_lakes(src, dst), dst); proof by
    verify_replica digest equality. Tokens (list<int32>) ride the diff
    feed intact."""
    import pyarrow as pa
    import ray.data as rd

    from palimpzest_ray.cdc import apply_changes, final_state_table
    from palimpzest_ray.cdc.digest import diff_lakes, verify_replica
    from palimpzest_ray.schemas import CHANGELOG_SCHEMA

    def mk(rows, root):
        apply_changes(
            rd.from_arrow(pa.Table.from_pylist(rows, CHANGELOG_SCHEMA)),
            root, num_partitions=2, change_schema=CHANGELOG_SCHEMA,
        )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    base = [
        {"lsn": i, "op": "INSERT", "doc_id": f"d{i}", "tokens": [i, i],
         "n_tok": 2, "source": "w"}
        for i in range(1, 6)
    ]
    mk(base, src)
    # dst drifts: d1 diverges, d9 is a foreign extra, d5 is missing
    drifted = [dict(r) for r in base if r["doc_id"] != "d5"]
    drifted[0] = {"lsn": 1, "op": "INSERT", "doc_id": "d1",
                  "tokens": [99], "n_tok": 1, "source": "w"}
    drifted.append({"lsn": 6, "op": "INSERT", "doc_id": "d9",
                    "tokens": [9], "n_tok": 1, "source": "x"})
    mk(drifted, dst)

    feed = diff_lakes(src, dst)
    tab = pa.concat_tables(
        feed.iter_batches(batch_format="pyarrow", batch_size=4096)
    )
    ops = dict(zip(tab["doc_id"].to_pylist(), tab["op"].to_pylist()))
    assert ops == {"d1": "UPDATE", "d5": "UPDATE", "d9": "DELETE"}
    # minimality: unchanged keys emit nothing
    assert tab.num_rows == 3

    apply_changes(tab, dst, change_schema=CHANGELOG_SCHEMA)
    rep = verify_replica(src, dst)
    assert rep["match"], rep
    st = final_state_table(dst).sort_by("doc_id")
    assert st["doc_id"].to_pylist() == [f"d{i}" for i in range(1, 6)]
    assert st.filter(
        pa.compute.equal(st["doc_id"], "d1")
    )["tokens"].to_pylist() == [[1, 1]]

    # fixpoint: a second diff is empty
    feed2 = diff_lakes(src, dst)
    assert sum(
        b.num_rows for b in feed2.iter_batches(batch_format="pyarrow")
    ) == 0


def test_diff_lakes_schema_evolution(tmp_path, ray_session):
    """diff_lakes across a schema gap: src carries a column dst has
    never seen (evolution happened on the source only). Every src row
    digests differently (the column participates), so the repair feed
    re-upserts them all; apply evolves dst's schema and the digests
    converge with the new column populated."""
    import pyarrow as pa
    import ray.data as rd

    from palimpzest_ray.cdc import apply_changes, final_state_table
    from palimpzest_ray.cdc.digest import diff_lakes, verify_replica

    sch_old = pa.schema([
        ("lsn", pa.int64()), ("op", pa.string()),
        ("doc_id", pa.string()), ("n_tok", pa.int32()),
    ])
    sch_new = pa.schema(list(sch_old) + [pa.field("lang", pa.string())])
    old_rows = [
        {"lsn": i, "op": "INSERT", "doc_id": f"d{i}", "n_tok": i}
        for i in range(1, 4)
    ]
    new_rows = [dict(r, lang=f"L{r['lsn']}") for r in old_rows]

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    apply_changes(
        rd.from_arrow(pa.Table.from_pylist(new_rows, sch_new)),
        src, num_partitions=2, change_schema=sch_new,
    )
    apply_changes(
        rd.from_arrow(pa.Table.from_pylist(old_rows, sch_old)),
        dst, num_partitions=2, change_schema=sch_old,
    )
    feed = pa.concat_tables(diff_lakes(src, dst).iter_batches(
        batch_format="pyarrow", batch_size=4096))
    assert set(feed["op"].to_pylist()) == {"UPDATE"}
    assert feed.num_rows == 3 and "lang" in feed.column_names
    apply_changes(feed, dst)
    assert verify_replica(src, dst)["match"]
    st = final_state_table(dst).sort_by("doc_id")
    assert st["lang"].to_pylist() == ["L1", "L2", "L3"]


def test_sync_replica_legacy_cursor_ownership(tmp_path, ray_session):
    """ADVICE r4 (subs.py): a NEW replica whose dst basename matches a
    pre-hash legacy consumer and whose dst lake already exists (seeded
    by clone) must NOT adopt the other consumer's cursor. Cursors now
    record the absolute dst path; a dst-less legacy cursor is claimed
    (and stamped) by its first adopter, after which any basename
    collision is rejected and falls to the hashed name."""
    import json
    import os

    import pyarrow as pa
    import ray.data as rd

    from palimpzest_ray.cdc import apply_changes, sync_replica
    from palimpzest_ray.cdc.snapshot import clone_lake
    from palimpzest_ray.cdc.subs import _sub_path, _load_sub
    from palimpzest_ray.schemas import CHANGELOG_SCHEMA

    src = str(tmp_path / "src")
    rows = [
        {"lsn": i, "op": "INSERT", "doc_id": f"d{i}", "tokens": [i],
         "n_tok": 1, "source": "w"}
        for i in range(1, 4)
    ]
    apply_changes(
        rd.from_arrow(pa.Table.from_pylist(rows, CHANGELOG_SCHEMA)),
        src, num_partitions=2, change_schema=CHANGELOG_SCHEMA,
    )
    # the TRUE legacy consumer: pre-hash cursor {name, version} only,
    # its replica bootstrapped out-of-band at v1
    dst_a = str(tmp_path / "siteA" / "replica")
    clone_lake(src, dst_a)
    legacy = _sub_path(src, "replica-replica")
    os.makedirs(os.path.dirname(legacy), exist_ok=True)
    with open(legacy, "w") as fh:
        json.dump({"name": "replica-replica", "version": 1}, fh)

    # owner syncs first: adopts its old cursor AND stamps the dst path
    sync_replica(src, dst_a)
    stamped = _load_sub(src, "replica-replica")
    assert stamped["dst"] == os.path.abspath(dst_a)
    v_owner = stamped["version"]

    # impostor: same basename, different path, lake seeded by clone
    dst_b = str(tmp_path / "siteB" / "replica")
    clone_lake(src, dst_b)
    sync_replica(src, dst_b)
    # the legacy cursor was NOT adopted (version/dst untouched) and the
    # impostor got its own hashed cursor
    after = _load_sub(src, "replica-replica")
    assert after["dst"] == os.path.abspath(dst_a)
    assert after["version"] == v_owner
    from palimpzest_ray.cdc import list_subscriptions

    hashed = [n for n in list_subscriptions(src)
              if n.startswith("replica-replica-")]
    assert len(hashed) == 1

    # fresh bootstraps also record their dst in the cursor
    dst_c = str(tmp_path / "siteC" / "rep2")
    sync_replica(src, dst_c)
    (name_c,) = [n for n in list_subscriptions(src)
                 if n.startswith("replica-rep2-")]
    assert _load_sub(src, name_c)["dst"] == os.path.abspath(dst_c)
