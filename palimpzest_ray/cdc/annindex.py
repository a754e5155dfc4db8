"""Incrementally-maintained IVF vector index as a DERIVED LAKE.

``stages.similarity.build_ivf_index`` is build-once/query-many: a new
or re-embedded vector means a full rebuild. At 100-TB corpus scale the
embedding column CHANGES — documents arrive, get re-embedded, get
deleted — so the index must follow the lake the way the inverted token
index (``cdc.index``) does: as a derived lake refreshed from the change
feed.

Layout (same trick as the posting lake): assignment rows
``(assign_id="list:vec", list_id, vec_id, embedding)`` keyed on
``assign_id`` (the LWW identity — immutable: it names one vector IN one
list) and PARTITIONED by ``list_id``, so probing a query's ``nprobe``
nearest centroids reads exactly those list partitions out of P — the
``engine.lookup`` pruning applied to the centroid dimension. The
embedding rides in the assignment row, so a probe returns vectors
directly (the lake IS the clustered layout — no second fetch).

The coarse quantizer (spherical k-means centroids) is trained once at
build and FROZEN across refreshes — standard IVF practice (FAISS
``add``/``remove_ids`` never retrain); re-train = rebuild into a fresh
root. A re-embedded vector whose nearest centroid moved emits
``DELETE(old_list:vec)`` + ``UPSERT(new_list:vec)`` — both lists'
partitions rewrite, everything else carries forward by manifest
reference.

Search at ``nprobe=nlist`` degrades to exact brute force over the
CURRENT lake state, which is what makes the contract query (q95)
exactly SQL-checkable after update/delete epochs.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from palimpzest_ray.cdc.engine import (
    apply_changes,
    final_state,
    load_latest_manifest,
    lookup,
    net_changes_since,
)
from palimpzest_ray.stages.similarity import (
    _normalize,
    _spherical_kmeans,
    _strip_to_batch,
    _vectors,
)

_META = "_ivf_lake.json"

def assign_schema(id_type: pa.DataType = pa.string()) -> pa.Schema:
    """The assignment-lake change schema; ``vec_id`` keeps the SOURCE
    lake's key type (an int key must tie-break numerically in search,
    not lexicographically)."""
    return pa.schema(
        [
            pa.field("lsn", pa.int64()),
            pa.field("op", pa.string()),
            pa.field("assign_id", pa.string()),
            pa.field("list_id", pa.int64()),
            pa.field("vec_id", id_type),
            pa.field("embedding", pa.list_(pa.float32())),
        ]
    )


#: default-typed convenience instance (string keys)
ASSIGN_SCHEMA = assign_schema()


def _meta_path(root: str) -> str:
    return os.path.join(root, _META)


def _load_meta(root: str) -> dict:
    with open(_meta_path(root)) as f:
        return json.load(f)


def _store_meta(root: str, meta: dict) -> None:
    tmp = _meta_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _meta_path(root))


def _centroids_path(root: str) -> str:
    return os.path.join(root, "_centroids.parquet")


def load_centroids(root: str) -> np.ndarray:
    t = pq.read_table(_centroids_path(root))
    return np.array(t["centroid"].to_pylist(), dtype=np.float32)


def _assign(C: np.ndarray, V: np.ndarray) -> np.ndarray:
    """Nearest-centroid list id per (normalized) vector — one matmul."""
    return (
        _normalize(V.astype(np.float32)) @ C.T
    ).argmax(axis=1).astype(np.int64)


def _events_table(
    lsns, ops, lists, vecs, embs: list | None,
    id_type: pa.DataType = pa.string(),
) -> pa.Table:
    n = len(lsns)
    aid = pa.array(
        [f"{li:06d}:{v}" for li, v in zip(lists, vecs)], pa.string()
    )
    emb_arr = (
        pa.array(embs, pa.list_(pa.float32()))
        if embs is not None
        else pa.nulls(n, pa.list_(pa.float32()))
    )
    return pa.table(
        {
            "lsn": pa.array(lsns, pa.int64()),
            "op": pa.array(ops, pa.string()),
            "assign_id": aid,
            "list_id": pa.array(lists, pa.int64()),
            "vec_id": pa.array(vecs, id_type),
            "embedding": emb_arr,
        }
    ).cast(assign_schema(id_type))


def build_ivf_lake(
    lake_root: str,
    ivf_root: str,
    *,
    key: str = "vec_id",
    emb_col: str = "embedding",
    nlist: int = 64,
    train_size: int = 10_000,
    iters: int = 10,
    seed: int = 13,
    num_partitions: int | None = None,
) -> dict:
    """Train the frozen quantizer on the vector lake's live rows and
    bootstrap the assignment lake (one partition-pruned probe target
    per centroid list)."""
    manifest = load_latest_manifest(lake_root)
    if manifest is None:
        raise FileNotFoundError(f"no committed lake under {lake_root}")
    if load_latest_manifest(ivf_root) is not None:
        raise ValueError(
            f"{ivf_root} already holds an IVF lake — use "
            "refresh_ivf_lake, or a new root"
        )
    id_type = manifest.schema.field(key).type
    vecs = final_state(lake_root, columns=[key, emb_col])
    train = _vectors(_strip_to_batch(vecs, emb_col, train_size), emb_col)
    C = _spherical_kmeans(
        train.astype(np.float32), nlist, iters, seed
    ).astype(np.float32)
    os.makedirs(ivf_root, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "list_id": pa.array(range(len(C)), pa.int64()),
                "centroid": pa.array(
                    [c.tolist() for c in C], pa.list_(pa.float32())
                ),
            }
        ),
        _centroids_path(ivf_root),
    )

    def _emit(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return _events_table([], [], [], [], [], id_type)
        Cl = load_centroids(ivf_root)
        V = _vectors(batch, emb_col)
        lists = _assign(Cl, V)
        ids = batch[key].to_pylist()
        return _events_table(
            np.zeros(n, dtype=np.int64),
            ["INSERT"] * n,
            lists,
            ids,
            batch[emb_col].cast(pa.list_(pa.float32())).to_pylist(),
            id_type,
        )

    events = (
        final_state(lake_root, columns=[key, emb_col])
        .map_batches(_emit, batch_format="pyarrow")
    )
    apply_changes(
        events,
        ivf_root,
        key="assign_id",
        partition_key="list_id",
        num_partitions=num_partitions or min(int(nlist), 64),
        change_schema=assign_schema(id_type),
    )
    meta = {
        "lake_version": manifest.version,
        "key": key,
        "emb_col": emb_col,
        "nlist": int(nlist),
        "num_partitions": int(num_partitions or min(int(nlist), 64)),
    }
    _store_meta(ivf_root, meta)
    return meta


def refresh_ivf_lake(lake_root: str, ivf_root: str) -> dict:
    """Catch the assignment lake up with the vector lake's change feed:
    changed keys' OLD list comes from re-assigning the time-traveled
    embedding with the frozen centroids (no assignment-lake read), the
    NEW list from the feed's live embedding. Only list partitions that
    gained or lost members rewrite."""
    meta = _load_meta(ivf_root)
    base_v = meta["lake_version"]
    key, emb_col = meta["key"], meta["emb_col"]
    latest = load_latest_manifest(lake_root)
    if latest.version == base_v:
        return {"refreshed": False, "lake_version": base_v}
    id_type = latest.schema.field(key).type
    from palimpzest_ray.dataset import Dataset as PzDataset

    feed = PzDataset(
        net_changes_since(lake_root, base_v).map_batches(
            lambda b: b.select(["lsn", "op", key, emb_col]),
            batch_format="pyarrow",
        )
    )
    old_state = PzDataset(
        final_state(lake_root, version=base_v, columns=[key, emb_col])
    ).rename_columns({emb_col: "_old_emb"})
    # pin the O(changes) feed: it is consumed twice (changed-key
    # projection + the join) and the join's schema probe would run the
    # lazy semi-join once for the probe and again for data (the
    # lazy-join hazard measured on diff_lakes / _agg_distributed)
    feed = PzDataset(feed._ds.materialize())
    changed = feed.project([key]).distinct([key])
    old_changed = PzDataset(old_state.semi_join(changed, key)._ds.materialize())
    joined = feed.join(old_changed, on=key, how="left")
    cpath = _centroids_path(ivf_root)

    def _emit(batch: pa.Table) -> pa.Table:
        C = np.array(
            pq.read_table(cpath)["centroid"].to_pylist(), dtype=np.float32
        )
        lsns = batch["lsn"].to_pylist()
        ops = batch["op"].to_pylist()
        vids = batch[key].to_pylist()
        news = batch[emb_col].to_pylist()
        olds = batch["_old_emb"].to_pylist()
        e_lsn, e_op, e_list, e_vec, e_emb = [], [], [], [], []
        for lsn, op, vid, new, old in zip(lsns, ops, vids, news, olds):
            old_list = (
                int(_assign(C, np.array([old], dtype=np.float32))[0])
                if old is not None
                else None
            )
            new_list = (
                int(_assign(C, np.array([new], dtype=np.float32))[0])
                if (op == "UPDATE" and new is not None)
                else None
            )
            if old_list is not None and old_list != new_list:
                e_lsn.append(lsn); e_op.append("DELETE")
                e_list.append(old_list); e_vec.append(vid)
                e_emb.append(None)
            if new_list is not None:
                e_lsn.append(lsn); e_op.append("UPDATE")
                e_list.append(new_list); e_vec.append(vid)
                e_emb.append(new)
        return _events_table(e_lsn, e_op, e_list, e_vec, e_emb, id_type)

    events = joined.ray.map_batches(_emit, batch_format="pyarrow").materialize()
    n_events = events.count()
    if n_events:
        from palimpzest_ray.cdc.index import _small_or_ds

        apply_changes(
            _small_or_ds(events, n_events),
            ivf_root,
            key="assign_id",
            partition_key="list_id",
            num_partitions=meta["num_partitions"],
            change_schema=assign_schema(id_type),
        )
    meta["lake_version"] = latest.version
    _store_meta(ivf_root, meta)
    return {"refreshed": True, "from_version": base_v,
            "lake_version": latest.version, "assign_events": n_events}


def ivf_lake_search(
    ivf_root: str,
    queries: np.ndarray,
    *,
    k: int = 10,
    nprobe: int = 8,
    dtype=np.float64,
    round_to: int = 6,
    int_scores: bool = False,
) -> pa.Table:
    """Cosine top-k over the probed lists: rank centroids per query,
    read the UNION of probed list partitions (``engine.lookup`` pruning
    on the list dimension — ≤ nprobe×nq partition files, never a
    scan), one matmul over the candidates. ``nprobe=nlist`` = exact.

    Output ``(query_idx, vec_id, score, rank)`` with the engine's
    standard tie-break (score desc, vec_id asc) and optional integer
    score scaling — the cross-engine-comparable convention."""
    C = load_centroids(ivf_root).astype(dtype)
    Q = _normalize(np.asarray(queries, dtype=dtype))
    nprobe = min(nprobe, len(C))
    probed = np.unique(np.argsort(-(Q @ C.T), axis=1)[:, :nprobe].reshape(-1))
    cand = lookup(
        ivf_root,
        [int(x) for x in probed],
        key="list_id",
        columns=["vec_id", "embedding"],
    )
    from palimpzest_ray.stages.similarity import _batch_topk

    top = _batch_topk(
        cand, Q, k=k, emb_col="embedding", id_col="vec_id",
        dtype=dtype, round_to=round_to, int_scores=int_scores,
    )
    # _batch_topk emits per-query selections in rank order
    nq = len(Q)
    per_q = top.num_rows // max(nq, 1) if nq else 0
    rank = pa.array(
        np.tile(np.arange(1, per_q + 1, dtype=np.int64), nq)
        if top.num_rows
        else np.empty(0, np.int64)
    )
    return top.append_column("rank", rank)


__all__ = [
    "ASSIGN_SCHEMA",
    "build_ivf_lake",
    "refresh_ivf_lake",
    "ivf_lake_search",
    "load_centroids",
]
