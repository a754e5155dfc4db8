"""Dedup-at-ingest: screen NEW documents against an existing corpus
WITHOUT rescanning it — the steady-state shape of training-data
deduplication at 100 TB, where the corpus is huge and append-mostly and
each ingest micro-batch must answer "is this a (near-)duplicate of
anything we already hold?" in time proportional to the BATCH, not the
corpus.

Composition, not new machinery:

- the corpus is an ordinary CDC lake (``cdc.engine``) whose rows carry
  the doc's DISTINCT word-shingle hash set (``shingles: list<int64>``)
  and its size ``n_sh`` — exactly-once commits, resume, tombstones and
  time travel come for free;
- the shingle INVERTED INDEX over that lake is the derived posting lake
  of ``cdc.index`` (postings keyed ``token:doc``, partitioned by
  token), maintained incrementally from the corpus change feed;
- screening a batch is a partition-pruned ``lookup`` of the batch's
  shingles against the posting lake: the join of (batch shingle → doc)
  with (posting shingle → corpus doc) counts EXACT intersection sizes
  |A∩B| per (new, corpus) pair — because both sides are per-doc
  DISTINCT — so exact Jaccard falls out as ``c / (n_a + n_b - c)``
  with only a second narrow lookup for the candidates' ``n_sh``.
  Recall is 1 BY CONSTRUCTION for any threshold > 0 (J > 0 requires a
  shared shingle), the same guarantee ``stages.dedup.
  exact_jaccard_pairs`` gives in the batch setting — no minhash
  probability, so a DuckDB oracle can state the semantics directly.

Admission (``admit``) applies the survivors as ordinary INSERT events
at ``manifest.max_lsn + 1`` and catches the posting index up through
``refresh_token_index`` — re-screening an admitted batch therefore
reports every row as a duplicate of itself, and re-admitting is
LWW-idempotent.

Within-batch duplicates are deliberately NOT resolved here: compose
``stages.dedup.exact_dedup`` / ``minhash_lsh_dedup`` as a pre-step —
screening semantics stay a pure function of (corpus, batch), which is
what makes the contract query (q94) exactly checkable.

Reference anchor: the verify-after-prune shape of ``EmbeddingJoin``
(/root/reference/src/palimpzest/query/operators/join.py:492-822), done
incrementally against lake state instead of per-run.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from palimpzest_ray.cdc.engine import (
    apply_changes,
    load_latest_manifest,
    lookup,
)
from palimpzest_ray.cdc.index import (
    build_token_index,
    refresh_token_index,
)
from palimpzest_ray.stages.dedup import _shingle_hashes, _word_hashes

CORPUS_SCHEMA = pa.schema(
    [
        pa.field("lsn", pa.int64()),
        pa.field("op", pa.string()),
        pa.field("doc_id", pa.string()),
        pa.field("shingles", pa.list_(pa.int64())),
        pa.field("n_sh", pa.int32()),
        pa.field("source", pa.string()),
    ]
)


def shingle_table(
    batch: pa.Table,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle: int = 3,
) -> pa.Table:
    """``(doc_id, shingles, n_sh, source?)`` per row — the doc's
    DISTINCT word-``shingle``-gram hash set (uint64 bits stored as
    int64), fully vectorized. Mirrors ``exact_jaccard_pairs``'s
    explode, folded back per doc."""
    n = batch.num_rows
    h, parents = _word_hashes(batch[text_col])
    sh, sp = _shingle_hashes(h, parents, shingle)
    if len(sh):
        order = np.lexsort((sh, sp))
        sh, sp = sh[order], sp[order]
        keep = np.ones(len(sh), bool)
        keep[1:] = (sh[1:] != sh[:-1]) | (sp[1:] != sp[:-1])
        sh, sp = sh[keep], sp[keep]
        values = sh.view(np.int64)
    else:
        sp = np.empty(0, np.int64)
        values = np.empty(0, np.int64)
    # (sp, values) are sorted by doc — per-doc list offsets fall out of
    # one searchsorted, no per-doc Python loop
    offsets = np.searchsorted(sp, np.arange(n + 1), side="left")
    shingles = pa.LargeListArray.from_arrays(
        pa.array(offsets.astype(np.int64)), pa.array(values, pa.int64())
    ).cast(pa.list_(pa.int64()))
    cols = {
        id_col: batch[id_col].cast(pa.string()),
        "shingles": shingles,
        "n_sh": pa.array(np.diff(offsets).astype(np.int32)),
    }
    if "source" in batch.column_names and text_col != "source":
        cols["source"] = batch["source"]
    return pa.table(cols)


def init_corpus(
    docs: rd.Dataset,
    corpus_root: str,
    index_root: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle: int = 3,
    num_partitions: int = 16,
    index_partitions: int = 32,
) -> dict:
    """Bootstrap the corpus lake (shingle sets as payload) from a doc
    Dataset, then build its shingle posting index. ``docs`` must be
    duplicate-free on ``id_col`` (it IS the corpus)."""

    def _events(batch: pa.Table) -> pa.Table:
        t = shingle_table(
            batch, text_col=text_col, id_col=id_col, shingle=shingle
        )
        n = t.num_rows
        cols = {
            "lsn": pa.nulls(n, pa.int64()).fill_null(0),
            "op": pa.nulls(n, pa.string()).fill_null("INSERT"),
            "doc_id": t[id_col],
            "shingles": t["shingles"],
            "n_sh": t["n_sh"],
        }
        cols["source"] = (
            t["source"] if "source" in t.column_names
            else pa.nulls(n, pa.string())
        )
        return pa.table(cols)

    events = docs.map_batches(_events, batch_format="pyarrow")
    r = apply_changes(
        events, corpus_root,
        num_partitions=num_partitions, change_schema=CORPUS_SCHEMA,
    )
    build_token_index(
        corpus_root, index_root,
        tokens_col="shingles", num_partitions=index_partitions,
    )
    return {"corpus_rows": int(r.rows_upserted)}


def screen(
    corpus_root: str,
    index_root: str,
    batch: pa.Table,
    *,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle: int = 3,
) -> dict:
    """Screen one ingest micro-batch against the corpus.

    Returns ``{"unique": Table, "dups": Table(new_id, corpus_id,
    jaccard)}``. Cost: one partition-pruned posting lookup over the
    batch's distinct shingles + one narrow ``n_sh`` lookup over the
    candidate corpus docs — never a corpus scan."""
    sig = shingle_table(
        batch, text_col=text_col, id_col=id_col, shingle=shingle
    )
    new_ids = sig[id_col].to_pylist()
    n_sh = sig["n_sh"].to_numpy(zero_copy_only=False).astype(np.int64)
    flat = sig["shingles"].combine_chunks()
    q_vals = flat.values.to_numpy(zero_copy_only=False)
    q_parent = np.repeat(
        np.arange(len(new_ids)), np.diff(flat.offsets.to_numpy())
    )
    dup_mask = np.zeros(len(new_ids), dtype=bool)
    dups_rows: dict[str, list] = {"new_id": [], "corpus_id": [], "jaccard": []}
    if len(q_vals):
        postings = lookup(
            index_root,
            np.unique(q_vals).tolist(),
            key="token",
            columns=["token", "doc_id"],
        )
        if postings.num_rows:
            p_tok = postings["token"].to_numpy(zero_copy_only=False)
            p_doc_codes, corpus_ids = _codes(postings["doc_id"])
            # join batch shingles with postings on the shingle hash:
            # each match row is one SHARED DISTINCT shingle of one
            # (new, corpus) pair — counting rows per pair is |A∩B|.
            order = np.argsort(p_tok, kind="stable")
            p_tok, p_doc_codes = p_tok[order], p_doc_codes[order]
            lo = np.searchsorted(p_tok, q_vals, side="left")
            hi = np.searchsorted(p_tok, q_vals, side="right")
            cnt = hi - lo
            if cnt.sum():
                # vectorized multi-range gather of the matched postings
                total = int(cnt.sum())
                starts = np.repeat(lo, cnt)
                off = np.arange(total) - np.repeat(
                    np.cumsum(cnt) - cnt, cnt
                )
                take = starts + off
                pair_new = np.repeat(q_parent, cnt)
                pair_doc = p_doc_codes[take]
                code = pair_new.astype(np.int64) * len(corpus_ids) + pair_doc
                uniq, c = np.unique(code, return_counts=True)
                u_new = (uniq // len(corpus_ids)).astype(np.int64)
                u_doc = (uniq % len(corpus_ids)).astype(np.int64)
                # exact-prune: J >= t needs c >= t*|A| (|A∪B| >= |A|)
                keep = c >= np.ceil(threshold * n_sh[u_new]).astype(np.int64)
                u_new, u_doc, c = u_new[keep], u_doc[keep], c[keep]
                if len(u_new):
                    cand_ids = [corpus_ids[i] for i in np.unique(u_doc)]
                    sizes_t = lookup(
                        corpus_root, cand_ids, columns=["n_sh"]
                    )
                    size_of = dict(
                        zip(
                            sizes_t["doc_id"].to_pylist(),
                            sizes_t["n_sh"].to_pylist(),
                        )
                    )
                    nb = np.array(
                        [size_of.get(corpus_ids[i], 0) for i in u_doc],
                        dtype=np.int64,
                    )
                    jac = c / (n_sh[u_new] + nb - c)
                    hit = jac >= threshold
                    for i_new, i_doc, j in zip(
                        u_new[hit], u_doc[hit], jac[hit]
                    ):
                        dup_mask[i_new] = True
                        dups_rows["new_id"].append(new_ids[i_new])
                        dups_rows["corpus_id"].append(corpus_ids[i_doc])
                        dups_rows["jaccard"].append(float(j))
    unique = batch.filter(pa.array(~dup_mask))
    dups = pa.table(
        {
            "new_id": pa.array(dups_rows["new_id"], pa.string()),
            "corpus_id": pa.array(dups_rows["corpus_id"], pa.string()),
            "jaccard": pa.array(dups_rows["jaccard"], pa.float64()),
        }
    )
    return {"unique": unique, "dups": dups}


def _codes(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, list[str]]:
    d = col.combine_chunks().dictionary_encode()
    return (
        d.indices.to_numpy(zero_copy_only=False).astype(np.int64),
        d.dictionary.to_pylist(),
    )


def admit(
    corpus_root: str,
    index_root: str,
    batch: pa.Table,
    *,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle: int = 3,
    mode: str = "delta",
) -> dict:
    """Screen, then admit the survivors: INSERT events at
    ``max_lsn + 1`` (merge-on-read by default — an ingest micro-batch
    stages O(batch) bytes) and an incremental posting-index refresh.
    Returns the screen result plus admission counters."""
    res = screen(
        corpus_root, index_root, batch,
        threshold=threshold, text_col=text_col, id_col=id_col,
        shingle=shingle,
    )
    uniq = res["unique"]
    if uniq.num_rows:
        m = load_latest_manifest(corpus_root)
        lsn = int(m.max_lsn) + 1
        t = shingle_table(
            uniq, text_col=text_col, id_col=id_col, shingle=shingle
        )
        n = t.num_rows
        events = pa.table(
            {
                "lsn": pa.array(
                    np.arange(lsn, lsn + n, dtype=np.int64)
                ),
                "op": pa.array(["INSERT"] * n),
                "doc_id": t[id_col],
                "shingles": t["shingles"],
                "n_sh": t["n_sh"],
                "source": (
                    t["source"] if "source" in t.column_names
                    else pa.nulls(n, pa.string())
                ),
            }
        )
        # events is already a driver-side table: the small-commit local
        # path applies it with zero Ray executions
        apply_changes(
            events, corpus_root,
            change_schema=CORPUS_SCHEMA, mode=mode,
        )
        refresh_token_index(corpus_root, index_root)
    res["admitted"] = int(uniq.num_rows)
    res["rejected"] = int(batch.num_rows - uniq.num_rows)
    return res


def screen_sql(
    threshold: float,
    *,
    new_pred: str,
    corpus_pred: str,
    table: str = "documents",
    shingle: int = 3,
) -> str:
    """DuckDB restatement of :func:`screen`'s survivor set over one
    source table split by predicates — the q94 oracle. Word shingles
    and the short-doc synthetic shingle mirror ``_shingle_hashes``
    (as strings; the engine's uint64 mixing is collision-free at
    contract scale, the same argument q57 relies on)."""
    assert shingle == 3, "oracle is written for 3-gram shingles"
    return f"""
        with toks as (
          select doc_id, {new_pred} as is_new, {corpus_pred} as is_corpus,
                 list_filter(regexp_split_to_array(lower(text), '\\s+'),
                             x -> x <> '') as ws
          from {table}),
        sh as (
          select distinct doc_id, is_new, is_corpus,
                 ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] as s
          from toks, unnest(range(1, len(ws)-1)) as t(i)
          where len(ws) >= 3
          union
          select distinct doc_id, is_new, is_corpus,
                 'SHORT:' || array_to_string(ws, ' ') as s
          from toks where len(ws) between 1 and 2),
        sizes as (select doc_id, count(*) as n from sh group by doc_id),
        inter as (
          select a.doc_id as new_id, b.doc_id as corpus_id, count(*) as c
          from sh a join sh b on a.s = b.s
          where a.is_new and b.is_corpus
          group by 1, 2),
        dup as (
          select distinct new_id from inter
          join sizes na on na.doc_id = inter.new_id
          join sizes nb on nb.doc_id = inter.corpus_id
          where cast(c as double) / (na.n + nb.n - c) >= {threshold})
        select t.doc_id from toks t
        where t.is_new and t.doc_id not in (select new_id from dup)
    """


__all__ = [
    "CORPUS_SCHEMA",
    "shingle_table",
    "init_corpus",
    "screen",
    "admit",
    "screen_sql",
]
