"""Driver-contract self-check: runs every ``queries()`` entry and
compares against ``oracle_sql()`` via duckdb the way the driver does
(row count + column names + order-insensitive values). Usage::

    python tools/check_contract.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    import palimpzest_ray.dataset as pzd

    if isinstance(res, pzd.Dataset):
        return res.to_pandas()  # keeps columns on 0-row results
    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from palimpzest_ray import quiet

    quiet()
    import __ray_entry__ as e

    argv = [a for a in sys.argv[1:] if a != "--strict-dtype"]
    strict_dtype = "--strict-dtype" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    aliases = getattr(e, "_ALIASES", {})
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if not only and name in aliases:
            continue  # same callable as its legacy key — skip the rerun
        t0 = time.time()
        try:
            mine = canon(to_df(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(mine)} (rows-only, no oracle) [{dt:.1f}s]")
            continue
        try:
            theirs = canon(con.execute(oracles[name]).df())
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL raised {ex}")
            n_fail += 1
            continue
        if list(mine.columns) != list(theirs.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} != {list(theirs.columns)}")
            n_fail += 1
            continue
        if len(mine) != len(theirs):
            print(f"FAIL {name}: rows {len(mine)} != {len(theirs)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(
                mine, theirs, check_dtype=False, check_exact=True
            )
            note = ""
            if strict_dtype:
                # The driver's value hash is representation-sensitive:
                # DuckDB HUGEINT/DECIMAL surfaces as float64/object in
                # pandas while the engine emits int64 — values equal,
                # hashes differ. Flag every such column.
                mism = [
                    (c, str(mine[c].dtype), str(theirs[c].dtype))
                    for c in mine.columns
                    if mine[c].dtype != theirs[c].dtype
                ]
                if mism:
                    # leading FAIL so a failing audit cannot read as
                    # passing when the trailing note is skimmed over
                    print(
                        f"FAIL {name}: values exact but DTYPE-MISMATCH "
                        f"{mism} [{dt:.1f}s]"
                    )
                    n_fail += 1
                    continue
            print(f"ok   {name}: rows={len(mine)} exact-match [{dt:.1f}s]{note}")
        except AssertionError as ex:
            print(f"FAIL {name}: values differ: {str(ex).splitlines()[-1]}")
            n_fail += 1
    print("FAILURES:", n_fail)
    return 1 if n_fail else 0


if __name__ == "__main__":
    rc = main()
    import ray

    ray.shutdown()
    sys.exit(rc)
