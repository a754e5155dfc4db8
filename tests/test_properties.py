"""Property-based tests (hypothesis) for the pure vectorized kernels.

The engine's correctness rests on algebraic properties — LWW reduction
is order-insensitive, partitioning is stable, rank selection matches
the obvious row-at-a-time oracle — so these are checked over random
inputs, not just fixtures. No Ray involved: pure Arrow/numpy functions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from palimpzest_ray.functions.tokens import (
    first_per_key,
    stable_bucket,
    top_n_per_key,
)

_keys = st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=40)


def _table(keys: list[str], seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    n = len(keys)
    return pa.table(
        {
            "k": pa.array(keys),
            "lsn": pa.array(rng.permutation(n).astype(np.int64)),
            "v": pa.array(rng.integers(0, 10, n).astype(np.int64)),
        }
    )


@given(_keys, st.integers(0, 2**16))
@settings(max_examples=60, deadline=None)
def test_first_per_key_is_max_lsn_row(keys, seed):
    t = _table(keys, seed)
    got = first_per_key(t, "k", [("lsn", "descending")]).to_pandas()
    want = (
        t.to_pandas()
        .sort_values(["k", "lsn"], ascending=[True, False])
        .drop_duplicates("k", keep="first")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.sort_values("k").reset_index(drop=True), want
    )


@given(_keys, st.integers(0, 2**16), st.integers(0, 2**16))
@settings(max_examples=40, deadline=None)
def test_first_per_key_permutation_invariant(keys, seed, perm_seed):
    """The LWW reduction commutes with any row shuffle — the property
    that makes block/arrival order free engine-wide."""
    t = _table(keys, seed)
    perm = np.random.default_rng(perm_seed).permutation(t.num_rows)
    shuffled = t.take(pa.array(perm))
    a = first_per_key(t, "k", [("lsn", "descending")]).sort_by("k")
    b = first_per_key(shuffled, "k", [("lsn", "descending")]).sort_by("k")
    assert a.equals(b)


@given(_keys, st.integers(0, 2**16), st.integers(1, 5))
@settings(max_examples=60, deadline=None)
def test_top_n_per_key_matches_pandas_oracle(keys, seed, n):
    t = _table(keys, seed)
    got = (
        top_n_per_key(t, ["k"], [("lsn", "descending")], n, rank_col="rnk")
        .to_pandas()
        .sort_values(["k", "rnk"])
        .reset_index(drop=True)
    )
    df = t.to_pandas().sort_values(["k", "lsn"], ascending=[True, False])
    want = df.groupby("k", sort=True).head(n).reset_index(drop=True)
    want["rnk"] = want.groupby("k").cumcount() + 1
    pd.testing.assert_frame_equal(got, want)


@given(_keys, st.integers(0, 2**16), st.integers(1, 5))
@settings(max_examples=40, deadline=None)
def test_top_n_combiner_then_finish_equals_one_shot(keys, seed, n):
    """Running the ≤n-per-key combiner on arbitrary splits, then
    finishing on the concatenation, equals one global pass — the
    algebra behind Dataset.top_n_per_group's two stages."""
    t = _table(keys, seed)
    cut = t.num_rows // 2
    parts = [t.slice(0, cut), t.slice(cut)]
    order = [("lsn", "descending")]
    combined = pa.concat_tables(
        [top_n_per_key(p, ["k"], order, n) for p in parts if p.num_rows]
    )
    two_stage = top_n_per_key(combined, ["k"], order, n).sort_by("k")
    one_shot = top_n_per_key(t, ["k"], order, n).sort_by("k")
    assert two_stage.equals(one_shot)


@given(st.lists(st.text(min_size=0, max_size=12), min_size=1, max_size=50))
@settings(max_examples=50, deadline=None)
def test_stable_bucket_deterministic_and_in_range(ids):
    arr = pa.array(ids)
    b1 = stable_bucket(arr, 32)
    b2 = stable_bucket(arr, 32)
    assert np.array_equal(b1, b2)
    assert ((b1 >= 0) & (b1 < 32)).all()
    # equal keys always co-locate (python-dict grouping, not pandas —
    # pandas folds '' and '\x00' into one groupby key)
    groups: dict[str, set] = {}
    for k, b in zip(ids, b1):
        groups.setdefault(k, set()).add(int(b))
    assert all(len(v) == 1 for v in groups.values())


_nullable_keys = st.lists(
    st.one_of(st.none(), st.integers(0, 5)), min_size=0, max_size=12
)


@given(_nullable_keys, _nullable_keys, st.sampled_from(["inner", "left", "right", "outer"]))
@settings(max_examples=60, deadline=None)
def test_join_nested_kernel_sql_null_semantics(lkeys, rkeys, how):
    """The nested-payload join kernel (narrow-key acero + take, the
    kernel behind every shuffle-join bucket with list payloads) follows
    ANSI SQL on random null-bearing keys: null matches nothing,
    preserved sides emit null-key rows unmatched, and the LIST payload
    rides through intact. Oracle: duckdb's own join."""
    import duckdb
    import pyarrow as pa

    from palimpzest_ray.dataset import _join_nested_tables

    lf = pa.table({
        "k": pa.array([None if np.isnan(x) else float(x) for x in
                       pd.array(lkeys, dtype="Float64").to_numpy(
                           dtype="float64", na_value=np.nan)],
                      pa.float64()),
        "lv": pa.array([[i, i + 1] for i in range(len(lkeys))],
                       pa.list_(pa.int32())),
    })
    rf = pa.table({
        "k": pa.array([None if np.isnan(x) else float(x) for x in
                       pd.array(rkeys, dtype="Float64").to_numpy(
                           dtype="float64", na_value=np.nan)],
                      pa.float64()),
        "rv": pa.array(range(len(rkeys)), pa.int64()),
    })
    acero_how = {"inner": "inner", "left": "left outer",
                 "right": "right outer", "outer": "full outer"}[how]
    out_schema = pa.schema([("k", pa.float64()),
                            ("lv", pa.list_(pa.int32())),
                            ("rv", pa.int64())])
    got = _join_nested_tables(lf, rf, ["k"], acero_how, out_schema)
    assert got.schema.field("lv").type == pa.list_(pa.int32())
    con = duckdb.connect()
    con.register("lf", lf)
    con.register("rf", rf)
    sqlhow = {"inner": "JOIN", "left": "LEFT JOIN",
              "right": "RIGHT JOIN", "outer": "FULL OUTER JOIN"}[how]
    keycol = {"inner": "lf.k", "left": "lf.k", "right": "rf.k",
              "outer": "COALESCE(lf.k, rf.k)"}[how]
    want = con.execute(
        f"SELECT {keycol} AS k, lf.lv, rf.rv FROM lf {sqlhow} rf ON lf.k = rf.k"
    ).arrow().cast(out_schema)
    con.close()
    import pyarrow.compute as pc

    def canon(t):
        flat = t.append_column("_l0", pa.array(
            [v[0] if v is not None and len(v) else None
             for v in t["lv"].to_pylist()], pa.int64()))
        return flat.take(pc.sort_indices(
            flat, sort_keys=[("k", "ascending"), ("_l0", "ascending"),
                             ("rv", "ascending")]))
    assert canon(got).equals(canon(want))


# ---------------------------------------------------------------- windows

_orders = st.lists(
    st.one_of(st.integers(-3, 3), st.none()), min_size=1, max_size=25
)


@given(_orders, st.integers(0, 2**16), st.integers(1, 5))
@settings(max_examples=50, deadline=None)
def test_window_kind_values_match_duckdb(orders, seed, k):
    """Every window kind vs a duckdb single-partition oracle on random
    tie/null-bearing order keys. Sorted by (o, u) — a valid layout for
    ORDER BY o (ranking kinds look only at o; position kinds use the
    full unique tuple on both sides)."""
    import duckdb
    import pyarrow.compute as pc

    from palimpzest_ray.dataset import _window_kind_values

    rng = np.random.default_rng(seed)
    n = len(orders)
    t = pa.table(
        {
            "o": pa.array(orders, pa.int64()),
            "u": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array(rng.integers(-5, 6, n).astype(np.float64)),
        }
    )
    idx = pc.sort_indices(t, sort_keys=[("o", "ascending"), ("u", "ascending")])
    g = t.take(idx)

    con = duckdb.connect()
    df = t.to_pandas()
    want = con.execute(
        "select u,"
        " rank() over (order by o) as rnk,"
        " dense_rank() over (order by o) as drnk,"
        " percent_rank() over (order by o) as pr,"
        " cume_dist() over (order by o) as cd,"
        " row_number() over (order by o, u) as rn,"
        f" ntile({k}) over (order by o, u) as nt,"
        " sum(v) over (order by o, u rows unbounded preceding) as rs,"
        " avg(v) over (order by o, u rows unbounded preceding) as ra,"
        " first_value(v) over (order by o, u) as fv,"
        " last_value(v) over (order by o, u"
        "   rows between unbounded preceding and unbounded following) as lv"
        " from df"
    ).df().sort_values("u").reset_index(drop=True)

    u_sorted = g["u"].to_numpy(zero_copy_only=False)
    kinds = [
        ("rank", None, ["o"], None, "rnk"),
        ("dense_rank", None, ["o"], None, "drnk"),
        ("percent_rank", None, ["o"], None, "pr"),
        ("cume_dist", None, ["o"], None, "cd"),
        ("row_number", None, ["o", "u"], None, "rn"),
        ("ntile", None, ["o", "u"], k, "nt"),
        ("sum", "v", ["o", "u"], None, "rs"),
        ("avg", "v", ["o", "u"], None, "ra"),
        ("first_value", "v", ["o", "u"], None, "fv"),
        ("last_value", "v", ["o", "u"], None, "lv"),
    ]
    for kind, col, order, kk, want_col in kinds:
        res = pa.array(_window_kind_values(g, kind, col, order, kk))
        got = pd.Series(res.to_pylist(), index=u_sorted).sort_index()
        expect = want.set_index("u")[want_col].sort_index()
        np.testing.assert_allclose(
            got.to_numpy(dtype=np.float64),
            expect.to_numpy(dtype=np.float64),
            rtol=1e-12, atol=1e-12,
            err_msg=f"{kind} (k={kk})",
        )


# ----------------------------------------------------- round-2 additions


@given(
    st.lists(st.integers(0, 50), min_size=0, max_size=30),
    st.integers(2, 20),
    st.integers(0, 2**16),
)
@settings(max_examples=60, deadline=None)
def test_packing_reference_covers_every_token_once(doc_lens, seq_len, seed):
    """The sequential packing oracle itself: with drop_last=False the
    chunks partition the stream exactly; every chunk except possibly
    the last has seq_len tokens; doc boundaries carry EOS."""
    from palimpzest_ray.stages.packing import pack_sequences_reference

    rng = np.random.default_rng(seed)
    t = pa.table(
        {
            "doc_id": pa.array(range(len(doc_lens)), pa.int64()),
            "tokens": pa.array(
                [rng.integers(1, 100, n).astype(np.int32).tolist() for n in doc_lens],
                pa.list_(pa.int32()),
            ),
        }
    )
    out = pack_sequences_reference(t, seq_len, drop_last=False)
    total = sum(doc_lens) + len(doc_lens)  # + one EOS per doc
    assert sum(len(c) for _, c in out) == total
    assert all(len(c) == seq_len for _, c in out[:-1])
    stream = [tok for _, c in out for tok in c]
    assert stream.count(0) >= len(doc_lens)  # every EOS present


@given(
    st.lists(st.text(alphabet="ab \t\nCé", max_size=12), min_size=1, max_size=20),
    st.integers(2, 10),
    st.integers(0, 8),
)
@settings(max_examples=60, deadline=None)
def test_chunk_text_partitions_with_overlap(texts, chunk_size, overlap):
    """Chunks tile the document: chunk i starts at i*step, all chunks
    except the last are full-size when the text is long enough, and
    de-overlapped concatenation rebuilds the text."""
    from palimpzest_ray.stages.text import chunk_text

    if overlap >= chunk_size:
        overlap = chunk_size - 1
    step = chunk_size - overlap
    t = pa.table({"doc_id": pa.array(range(len(texts))), "text": pa.array(texts)})
    out = chunk_text(t, chunk_size=chunk_size, overlap=overlap)
    df = out.to_pandas()
    for doc_id, grp in df.groupby("doc_id"):
        text = texts[doc_id]
        grp = grp.sort_values("chunk_idx")
        chunks = list(grp["chunk"])
        assert list(grp["chunk_start"]) == [i * step for i in range(len(chunks))]
        rebuilt = chunks[0] + "".join(c[overlap:] for c in chunks[1:])
        assert rebuilt == text or (text == "" and chunks == [""])
        n_exp = max(1, -(-max(len(text) - overlap, 1) // step))
        assert len(chunks) == n_exp


@given(
    st.lists(
        st.tuples(st.sampled_from(["x", "y", "z"]), st.integers(0, 1000)),
        min_size=1, max_size=40, unique_by=lambda t: t[1],
    ),
    st.floats(0.0, 4.0),
)
@settings(max_examples=60, deadline=None)
def test_upsample_copy_counts_match_closed_form(rows, w):
    """copies(key) == floor(w) + [hash_unit(key) < frac(w)] exactly."""
    import ray
    if not ray.is_initialized():
        return  # session fixture owns Ray; skip under collection oddities
    import ray.data as rd

    from palimpzest_ray.stages.mixing import upsample_by_weight
    from palimpzest_ray.stages.sampling import _unit_hash

    t = pa.table(
        {
            "source": pa.array([r[0] for r in rows]),
            "doc_id": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    out = upsample_by_weight(
        rd.from_arrow(t), "source", {"x": w}, key="doc_id", default=1.0, seed=3
    ).take_all()
    counts: dict[int, int] = {}
    for r in out:
        counts[r["doc_id"]] = counts.get(r["doc_id"], 0) + 1
    hu = _unit_hash(t["doc_id"], 3)
    for i, (src, did) in enumerate(rows):
        ww = w if src == "x" else 1.0
        exp = int(np.floor(ww)) + (1 if hu[i] < (ww - np.floor(ww)) else 0)
        assert counts.get(did, 0) == exp


@given(
    st.sets(st.integers(0, 30), min_size=1, max_size=15),
    st.sets(st.integers(0, 30), min_size=0, max_size=15),
    st.sets(st.integers(0, 30), min_size=0, max_size=10),
)
@settings(max_examples=8, deadline=None)
def test_diff_lakes_converges_on_random_drift(
    src_keys, dst_keys, drift_keys
):
    """Property: for ANY pair of lake states (random key sets, random
    subset of shared keys drifted in payload), diff_lakes emits exactly
    one event per differing key — upserts for src-only/drifted keys,
    deletes for dst-only — and applying it converges dst to src
    (digest-proven). The diff is minimal: identical keys emit nothing."""
    import tempfile

    import pyarrow as pa
    import ray.data as rd

    from palimpzest_ray.cdc import apply_changes
    from palimpzest_ray.cdc.digest import diff_lakes, verify_replica
    from palimpzest_ray.schemas import CHANGELOG_SCHEMA

    def rows(keys, drifted=frozenset()):
        return [
            {"lsn": k + 1, "op": "INSERT", "doc_id": f"k{k:02d}",
             "tokens": [k, 7] if k in drifted else [k],
             "n_tok": 2 if k in drifted else 1, "source": "s"}
            for k in sorted(keys)
        ]

    with tempfile.TemporaryDirectory() as work:
        src, dst = f"{work}/src", f"{work}/dst"
        apply_changes(
            rd.from_arrow(pa.Table.from_pylist(rows(src_keys),
                                               CHANGELOG_SCHEMA)),
            src, num_partitions=2, change_schema=CHANGELOG_SCHEMA,
        )
        apply_changes(
            rd.from_arrow(pa.Table.from_pylist(
                rows(dst_keys, frozenset(drift_keys)), CHANGELOG_SCHEMA,
            )) if dst_keys else
            rd.from_arrow(pa.Table.from_pylist(
                rows({99}), CHANGELOG_SCHEMA)),  # empty dst: seed a row
            dst, num_partitions=2, change_schema=CHANGELOG_SCHEMA,
        )
        eff_dst = dst_keys if dst_keys else {99}
        eff_drift = (set(drift_keys) & eff_dst) if dst_keys else set()
        feed = pa.concat_tables(diff_lakes(src, dst).iter_batches(
            batch_format="pyarrow", batch_size=4096))
        want_up = (src_keys - eff_dst) | (eff_drift & src_keys)
        want_del = eff_dst - src_keys
        got = dict(zip(feed["doc_id"].to_pylist(), feed["op"].to_pylist()))
        key = lambda k: f"k{k:02d}"
        assert got == {
            **{key(k): "UPDATE" for k in want_up},
            **{key(k): "DELETE" for k in want_del},
        }
        if feed.num_rows:
            apply_changes(feed, dst, change_schema=CHANGELOG_SCHEMA)
        assert verify_replica(src, dst)["match"]


@given(
    st.integers(2, 5),           # groups
    st.integers(2, 9),           # num_buckets
    st.integers(0, 25),          # order-key value range (0 => all tie)
    st.sampled_from(["sum", "min", "max", "avg", "rank", "dense_rank",
                     "cume_dist", "row_number"]),
)
@settings(max_examples=10, deadline=None)
def test_window_bucketed_random_parity(n_groups, nb, orange, kind):
    """Property: for random group counts, bucket widths, tie densities
    (down to ALL order keys equal) and every carryable kind, the
    bucketed distributed window equals the map_groups window exactly
    (values and dtypes). Ties use value-kind guards: sum/avg/min/max
    get a unique order (tie order is undefined for running values),
    ranking kinds keep the tied key (that's what they carry)."""
    import ray.data as rd

    from palimpzest_ray.dataset import Dataset

    rng = np.random.default_rng(nb * 1000 + n_groups * 10 + orange)
    n = 3000
    ranking = kind in ("rank", "dense_rank", "cume_dist")
    o = rng.integers(0, orange + 1, n).astype(np.int64)
    t = pa.table({
        "g": pa.array(rng.integers(0, n_groups, n).astype(np.int64)),
        "o": pa.array(o),
        "u": pa.array(rng.permutation(n).astype(np.int64)),
        "v": pa.array(rng.integers(-9, 9, n).astype(np.int64)),
    })
    order = ["o"] if ranking else ["o", "u"]
    ds = Dataset(rd.from_arrow(t).repartition(5))
    spec = [(kind, None if ranking or kind == "row_number" else "v",
             "res")]
    a = ds.window(spec, by="g", order=order, strategy="bucketed",
                  num_buckets=nb).to_pandas()
    b = ds.window(spec, by="g", order=order,
                  strategy="groups").to_pandas()
    key = ["g", "o", "u"]
    if ranking:
        # tied rows share the result: compare per (g, o)
        ka = a.groupby(["g", "o"])["res"].agg(["first", "nunique"])
        kb = b.groupby(["g", "o"])["res"].agg(["first", "nunique"])
        assert (ka["nunique"] == 1).all() and (kb["nunique"] == 1).all()
        pd.testing.assert_series_equal(ka["first"], kb["first"])
    else:
        a = a[sorted(a.columns)].sort_values(key, ignore_index=True)
        b = b[sorted(b.columns)].sort_values(key, ignore_index=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=True,
                                      check_exact=(kind != "avg"))
