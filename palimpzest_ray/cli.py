"""Command-line entry point for the CDC lake engine.

The ergonomic analogue of the reference's demo/CLI path
(``demos/simple-demo.py:1-80`` → argparse → dataset → run): one command
per lake operation, each printing a single JSON line so shells and
schedulers can consume results. Owns its Ray session (guarded init —
the library itself never calls ``ray.init``).

Usage::

    python -m palimpzest_ray.cli apply  CHANGES LAKE [--num-partitions P]
    python -m palimpzest_ray.cli tail   LOG_DIR LAKE
    python -m palimpzest_ray.cli state  LAKE
    python -m palimpzest_ray.cli vacuum LAKE [--keep N]
    python -m palimpzest_ray.cli repartition LAKE NEW_P
                                 [--drop-tombstones-below LSN]
    python -m palimpzest_ray.cli view-create  LAKE VIEW --group-col C
                                 [--count N] [--sum OUT=COL] [--avg OUT=COL]
    python -m palimpzest_ray.cli view-refresh LAKE VIEW
    python -m palimpzest_ray.cli index-build   LAKE INDEX [--num-partitions P]
    python -m palimpzest_ray.cli index-refresh LAKE INDEX
    python -m palimpzest_ray.cli index-search  INDEX TOKEN [TOKEN...] [--all]
    python -m palimpzest_ray.cli apply CHANGES LAKE --format debezium|jsonl
    python -m palimpzest_ray.cli dedup-init   DOCS.parquet CORPUS INDEX
    python -m palimpzest_ray.cli dedup-screen CORPUS INDEX BATCH.parquet
    python -m palimpzest_ray.cli dedup-admit  CORPUS INDEX BATCH.parquet
    python -m palimpzest_ray.cli ivf-build    LAKE IVF [--nlist N]
    python -m palimpzest_ray.cli ivf-refresh  LAKE IVF
    python -m palimpzest_ray.cli ivf-search   IVF QUERIES.parquet [--k K]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def _ensure_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kw = {"address": "local", "include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus:
            kw["num_cpus"] = num_cpus
        ray.init(**kw)
    from palimpzest_ray import quiet

    quiet()


def _apply_summary(res) -> dict:
    return {
        "version": res.manifest.version,
        "num_partitions": res.manifest.num_partitions,
        "max_lsn": res.manifest.max_lsn,
        "events_seen": res.events_seen,
        "rows_upserted": res.rows_upserted,
        "rows_deleted": res.rows_deleted,
        "partitions_rewritten": res.partitions_rewritten,
        "partitions_resumed": res.partitions_resumed,
        "rows_quarantined": getattr(res, "rows_quarantined", 0),
    }


def _add_gate(p) -> None:
    """Shared ingest data-quality-gate flags (apply / tail)."""
    p.add_argument(
        "--expect", action="append", nargs=4, default=None,
        metavar=("NAME", "COL", "OP", "VALUE"),
        help="named expectation every non-DELETE event must satisfy "
        "(OP one of == != > >= < <=; VALUE parsed as JSON)",
    )
    p.add_argument(
        "--quarantine", action="store_true",
        help="dead-letter violating events to <lake>/_quarantine/ "
        "instead of failing the apply",
    )
    p.add_argument(
        "--audit", action="store_true",
        help="write-audit-publish: commit the version WITHOUT moving "
        "LATEST; inspect it via --version, then publish/discard",
    )


def _gate_kwargs(args) -> dict:
    out: dict = {}
    if getattr(args, "expect", None):
        def _v(v: str):
            try:
                return json.loads(v)
            except (json.JSONDecodeError, ValueError):
                return v

        out["expectations"] = [
            (name, [(col, op, _v(v))]) for name, col, op, v in args.expect
        ]
    if getattr(args, "quarantine", False):
        out["quarantine"] = True
    if getattr(args, "audit", False):
        out["audit"] = True
    return out


def _arrow_type(name: str):
    """Console-friendly scalar type names for DDL subcommands."""
    import pyarrow as _pa

    types = {
        "int8": _pa.int8(), "int16": _pa.int16(), "int32": _pa.int32(),
        "int64": _pa.int64(), "uint8": _pa.uint8(), "uint16": _pa.uint16(),
        "uint32": _pa.uint32(), "uint64": _pa.uint64(),
        "float32": _pa.float32(), "float64": _pa.float64(),
        "string": _pa.string(), "bool": _pa.bool_(),
    }
    if name not in types:
        raise SystemExit(f"unknown type {name!r} (use {sorted(types)})")
    return types[name]


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="palimpzest_ray.cli", description=__doc__)
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("apply", help="apply a change log to the lake")
    p.add_argument("changes")
    p.add_argument("lake")
    p.add_argument("--num-partitions", type=int, default=32)
    p.add_argument("--exchange", choices=["ray", "fs"], default="ray")
    p.add_argument("--run-id", default=None)
    p.add_argument("--since-lsn", type=int, default=None)
    p.add_argument(
        "--mode", choices=["rewrite", "delta"], default="rewrite",
        help="delta = merge-on-read chain append (apply cost ~ changes)",
    )
    p.add_argument(
        "--format", choices=["parquet", "jsonl", "debezium", "maxwell"],
        default="parquet",
        help="wire format of CHANGES (jsonl = flat change rows, "
        "debezium = envelope with op c/u/d/r + before/after, "
        "maxwell = type/data envelope with synthesized xid LSNs)",
    )
    _add_gate(p)

    p = sub.add_parser(
        "patch",
        help="apply a PARTIAL-image change log (null column = carry "
        "forward; Mongo/Debezium partial-update semantics)",
    )
    p.add_argument("changes")
    p.add_argument("lake")
    p.add_argument("--num-partitions", type=int, default=32)
    p.add_argument("--mode", choices=["rewrite", "delta"], default="rewrite")
    p.add_argument(
        "--chunk-events", type=int, default=None,
        help="fold+apply in LSN-ordered chunks of this many events",
    )

    p = sub.add_parser("tail", help="apply everything past the lake watermark")
    p.add_argument("log_dir")
    p.add_argument("lake")
    p.add_argument("--num-partitions", type=int, default=32)
    p.add_argument("--mode", choices=["rewrite", "delta"], default="rewrite")
    p.add_argument(
        "--format", choices=["parquet", "patch", "jsonl", "debezium",
                             "maxwell"],
        default="parquet",
        help="patch = partial row images (null column carries forward); "
        "jsonl/debezium/maxwell = JSON topic dirs (consumed-file "
        "ledger pruning)",
    )
    _add_gate(p)

    p = sub.add_parser(
        "quarantine",
        help="print dead-lettered events (apply/tail --quarantine)",
    )
    p.add_argument("lake")
    p.add_argument("--version", type=int, default=None)
    p.add_argument("--limit", type=int, default=20)

    p = sub.add_parser(
        "publish", help="flip LATEST to a staged (apply --audit) version"
    )
    p.add_argument("lake")
    p.add_argument("version", type=int)

    p = sub.add_parser(
        "discard", help="abandon a staged (apply --audit) version"
    )
    p.add_argument("lake")
    p.add_argument("version", type=int)

    p = sub.add_parser(
        "restore", help="roll LATEST back to a retained older version"
    )
    p.add_argument("lake")
    p.add_argument("version", type=int)

    p = sub.add_parser(
        "lag", help="replication lag of the lake behind a log directory"
    )
    p.add_argument("log_dir")
    p.add_argument("lake")

    p = sub.add_parser("state", help="print the committed manifest summary")
    p.add_argument("lake")

    p = sub.add_parser("vacuum", help="drop old versions and unreferenced files")
    p.add_argument("lake")
    p.add_argument("--keep", type=int, default=2)
    p.add_argument(
        "--keep-hours", type=float, default=None,
        help="ALSO retain every version committed within the window "
        "(time-based retention off committed_at stamps)",
    )

    p = sub.add_parser("repartition", help="re-bucket the lake to a new P")
    p.add_argument("lake")
    p.add_argument("new_num_partitions", type=int)
    p.add_argument("--drop-tombstones-below", type=int, default=None)

    p = sub.add_parser(
        "compact", help="evaluate the compaction policy; re-bucket/vacuum if it fires"
    )
    p.add_argument("lake")
    p.add_argument("--target-file-mb", type=int, default=512)
    p.add_argument("--max-superseded-files", type=int, default=64)
    p.add_argument("--keep", type=int, default=2)
    p.add_argument("--min-partitions", type=int, default=8)
    p.add_argument("--drop-tombstones-below", type=int, default=None)
    p.add_argument("--max-delta-files", type=int, default=8)

    def _add_where(p, required: bool = True):
        p.add_argument(
            "--where", action="append", nargs=3, required=required,
            metavar=("COL", "OP", "VALUE"),
            help="conjunct, repeatable; VALUE parsed as JSON then string",
        )
        p.add_argument("--mode", choices=["rewrite", "delta"], default="delta")

    p = sub.add_parser(
        "count",
        help="exact live-row count (pure metadata without --where)",
    )
    p.add_argument("lake")
    p.add_argument("--version", type=int, default=None)
    p.add_argument(
        "--where", action="append", nargs=3, default=None,
        metavar=("COL", "OP", "VALUE"),
        help="optional conjunct, repeatable (switches to a pruned scan)",
    )

    p = sub.add_parser(
        "minmax",
        help="exact per-column min/max (zone maps where provably exact)",
    )
    p.add_argument("lake")
    p.add_argument("columns", nargs="+")
    p.add_argument("--version", type=int, default=None)

    p = sub.add_parser("delete-where", help="tombstone rows matching a predicate")
    p.add_argument("lake")
    _add_where(p, required=False)
    p.add_argument(
        "--expr", default=None,
        help="cdc.expr JSON boolean expression (instead of --where)",
    )

    p = sub.add_parser("update-where", help="SET columns on matching rows")
    p.add_argument("lake")
    _add_where(p)
    p.add_argument(
        "--set", action="append", required=True, metavar="COL=VALUE",
        help="repeatable; VALUE parsed as JSON then string",
    )

    p = sub.add_parser(
        "snapshot", help="publish a version as plain partitioned parquet"
    )
    p.add_argument("lake")
    p.add_argument("out_dir")
    p.add_argument("--version", type=int, default=None)
    p.add_argument("--columns", nargs="+", default=None)
    p.add_argument("--cluster-by", nargs="+", default=None,
                   help="sort each partition by these columns (read layout)")

    p = sub.add_parser(
        "export-changes",
        help="publish the net change feed since a version as JSONL topics",
    )
    p.add_argument("lake")
    p.add_argument("since_version", type=int)
    p.add_argument("out_dir")
    p.add_argument("--format", choices=["debezium", "jsonl"],
                   default="debezium")

    p = sub.add_parser("clone", help="copy a committed version as a new lake")
    p.add_argument("lake")
    p.add_argument("dst")
    p.add_argument("--version", type=int, default=None)

    p = sub.add_parser(
        "branch",
        help="zero-copy branch ops: create/list/delete/merge",
    )
    p.add_argument("lake")
    p.add_argument(
        "action", choices=["create", "list", "delete", "merge"],
    )
    p.add_argument("name", nargs="?", default=None)
    p.add_argument("--version", type=int, default=None,
                   help="fork point for create (default: head)")
    p.add_argument("--keep", action="store_true",
                   help="merge: keep the branch afterwards (default drops it)")

    p = sub.add_parser(
        "log", help="per-version commit summary from manifests (git-log style)"
    )
    p.add_argument("lake")
    p.add_argument("--limit", type=int, default=None)

    p = sub.add_parser(
        "constraint",
        help="persistent CHECK constraints: add / drop / list",
    )
    p.add_argument("lake")
    p.add_argument("action", choices=["add", "drop", "list"])
    p.add_argument("name", nargs="?", default=None)
    p.add_argument(
        "--where", action="append", nargs=3, default=None,
        metavar=("COL", "OP", "VALUE"),
        help="conjunct, repeatable (add); VALUE parsed as JSON then string",
    )
    p.add_argument(
        "--no-verify", action="store_true",
        help="skip the existing-rows check (enforce forward only)",
    )
    p.add_argument(
        "--expr", default=None,
        help="CHECK expression as cdc.expr JSON (instead of --where)",
    )

    p = sub.add_parser(
        "generated",
        help="generated columns (GENERATED ALWAYS AS): add / list",
    )
    p.add_argument("lake")
    p.add_argument("action", choices=["add", "list"])
    p.add_argument("name", nargs="?", default=None)
    p.add_argument("type", nargs="?", default=None,
                   help="arrow type name (int32/int64/float64/string/bool)")
    p.add_argument("--expr", default=None, help="cdc.expr JSON expression")
    p.add_argument(
        "--no-backfill", action="store_true",
        help="existing rows read NULL until their next update",
    )

    p = sub.add_parser(
        "ttl",
        help="row TTL policy: set / show / drop / apply "
        "(stored expiry enforced as exactly-once deletes)",
    )
    p.add_argument("lake")
    p.add_argument("action", choices=["set", "show", "drop", "apply"])
    p.add_argument("col", nargs="?", default=None)
    p.add_argument("--keep-seconds", type=float, default=None)
    p.add_argument(
        "--now", type=float, default=None,
        help="apply: pin the enforcement clock (epoch seconds)",
    )

    p = sub.add_parser(
        "rollup",
        help="downsample-then-expire: aggregate stale rows into an "
        "accumulating rollup lake, then delete them from the source",
    )
    p.add_argument("lake")
    p.add_argument("rollup_lake")
    p.add_argument("--ttl-col", required=True)
    p.add_argument("--keep-seconds", type=float, required=True)
    p.add_argument("--group-col", required=True)
    p.add_argument(
        "--agg", action="append", nargs=3, required=True,
        metavar=("OUT", "FN", "COL"),
        help="mergeable aggregate (FN in count/sum/min/max; COL "
        "ignored for count — pass '-'), repeatable",
    )
    p.add_argument("--now", type=float, default=None)

    p = sub.add_parser(
        "digest",
        help="order-insensitive content digest of the live state "
        "(replica convergence proof)",
    )
    p.add_argument("lake")
    p.add_argument("--version", type=int, default=None)
    p.add_argument("--columns", nargs="+", default=None)

    p = sub.add_parser(
        "sync",
        help="replica maintenance: first call clones + subscribes, "
        "later calls poll/apply/ack the net changes",
    )
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--name", default=None)

    p = sub.add_parser(
        "diff",
        help="table diff: the minimal change feed converging DST to "
        "SRC's live state (repair drifted replicas with no shared "
        "history); --apply applies it and verifies by digest",
    )
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--key", default="doc_id")
    p.add_argument("--apply", action="store_true")

    p = sub.add_parser(
        "tag",
        help="named savepoints: create / drop / list (vacuum retains "
        "tagged versions)",
    )
    p.add_argument("lake")
    p.add_argument("action", choices=["create", "drop", "list"])
    p.add_argument("name", nargs="?", default=None)
    p.add_argument("--version", type=int, default=None)
    p.add_argument("--force", action="store_true",
                   help="create: move an existing tag")

    p = sub.add_parser(
        "orphans",
        help="list data files no retained manifest/staged version/"
        "branch references (read-only; vacuum reclaims)",
    )
    p.add_argument("lake")

    p = sub.add_parser(
        "skew",
        help="partition-balance report from manifest counters "
        "(zero data I/O)",
    )
    p.add_argument("lake")

    p = sub.add_parser(
        "sub",
        help="durable change-feed subscriptions: create / ack / drop / "
        "list / lag (consumer-group cursors; vacuum retains the "
        "slowest cursor's versions)",
    )
    p.add_argument("lake")
    p.add_argument(
        "action", choices=["create", "ack", "drop", "list", "lag"]
    )
    p.add_argument("name", nargs="?", default=None)
    p.add_argument(
        "--from-version", type=int, default=None,
        help="create: start the feed at a retained version "
        "(default: the current head)",
    )
    p.add_argument(
        "--token", type=int, default=None,
        help="ack: the head version a poll returned",
    )

    p = sub.add_parser(
        "purge",
        help="GDPR hard delete: remove keys from ALL retained versions' "
        "data files (history rewrite, fsck-consistent)",
    )
    p.add_argument("lake")
    p.add_argument("keys", nargs="+", help="key values (JSON-parsed, then string)")
    p.add_argument(
        "--keep-tombstones", action="store_true",
        help="retain nulled tombstones as the LWW barrier "
        "(contamination purge) instead of full forget",
    )
    p.add_argument(
        "--skip-quarantine", action="store_true",
        help="leave dead-letter files untouched",
    )

    p = sub.add_parser(
        "alter",
        help="schema DDL: add / drop / rename / widen columns "
        "(metadata-only commit, no data file touched)",
    )
    p.add_argument("lake")
    p.add_argument(
        "--add", action="append", nargs=2, default=None,
        metavar=("NAME", "TYPE"),
        help="append a column (null-backfilled at read), repeatable",
    )
    p.add_argument(
        "--drop", action="append", default=None, metavar="NAME",
        help="drop a column logically (physical removal at next rewrite)",
    )
    p.add_argument(
        "--rename", action="append", nargs=2, default=None,
        metavar=("OLD", "NEW"),
        help="rename WITHOUT rewrite (column mapping), repeatable",
    )
    p.add_argument(
        "--widen", action="append", nargs=2, default=None,
        metavar=("COL", "TYPE"),
        help="lossless type widening (e.g. int32 -> int64), repeatable",
    )

    p = sub.add_parser("fsck", help="lake integrity audit (add --deep to read data)")
    p.add_argument("lake")
    p.add_argument("--deep", action="store_true")
    p.add_argument("--version", type=int, default=None)

    p = sub.add_parser("view-create", help="materialize an aggregate view")
    p.add_argument("lake")
    p.add_argument("view")
    p.add_argument("--group-col", required=True)
    p.add_argument("--count", default=None, metavar="OUT")
    p.add_argument("--sum", action="append", default=[], metavar="OUT=COL")
    p.add_argument("--avg", action="append", default=[], metavar="OUT=COL")
    p.add_argument("--min", action="append", default=[], metavar="OUT=COL")
    p.add_argument("--max", action="append", default=[], metavar="OUT=COL")

    p = sub.add_parser("view-refresh", help="catch a view up to the lake head")
    p.add_argument("lake")
    p.add_argument("view")

    p = sub.add_parser(
        "jview-create",
        help="materialize an incrementally-maintained JOIN view "
        "(key-to-key, or --left-on FK for the star-schema fact-dim "
        "case with its fk-index ripple)",
    )
    p.add_argument("view")
    p.add_argument("left")
    p.add_argument("right")
    p.add_argument("--how", choices=["inner", "left"], default="inner")
    p.add_argument("--left-on", default=None,
                   help="fact-side foreign-key column joining the "
                   "right lake's key (default: join the two keys)")
    p.add_argument("--num-partitions", type=int, default=None)

    p = sub.add_parser(
        "jview-refresh",
        help="catch a join view up to both lakes' heads "
        "(changed keys only; dim changes ripple via the fk index)",
    )
    p.add_argument("view")

    p = sub.add_parser("index-build", help="build the inverted token index")
    p.add_argument("lake")
    p.add_argument("index")
    p.add_argument("--num-partitions", type=int, default=32)

    p = sub.add_parser("index-refresh", help="catch the index up to the lake head")
    p.add_argument("lake")
    p.add_argument("index")

    p = sub.add_parser("index-search", help="doc_ids containing the tokens")
    p.add_argument("index")
    p.add_argument("tokens", type=int, nargs="+")
    p.add_argument("--all", action="store_true", help="require ALL tokens")

    p = sub.add_parser(
        "colindex-build", help="build a secondary value index on a column"
    )
    p.add_argument("lake")
    p.add_argument("index")
    p.add_argument("column")
    p.add_argument("--num-partitions", type=int, default=32)

    p = sub.add_parser(
        "colindex-refresh", help="catch the column index up to the lake head"
    )
    p.add_argument("lake")
    p.add_argument("index")

    p = sub.add_parser(
        "colindex-lookup", help="rows WHERE column IN values, index-pruned"
    )
    p.add_argument("lake")
    p.add_argument("index")
    p.add_argument("values", nargs="+")
    p.add_argument("--columns", nargs="*", default=None)

    p = sub.add_parser(
        "screen", help="rows of a candidate parquet whose key is NOT in the lake"
    )
    p.add_argument("lake")
    p.add_argument("candidates", help="parquet file/dir of candidate rows")
    p.add_argument("--out", default=None,
                   help="write surviving rows as parquet here (default: count only)")

    p = sub.add_parser(
        "history", help="SCD2 key history: every retained version of keys"
    )
    p.add_argument("lake")
    p.add_argument("keys", nargs="+")
    p.add_argument("--all-versions", action="store_true",
                   help="include carried-forward versions")

    p = sub.add_parser(
        "catalog-commit",
        help="pin lakes at their current versions: NAME=LAKE_ROOT ...",
    )
    p.add_argument("catalog")
    p.add_argument("pins", nargs="+", metavar="NAME=LAKE_ROOT")

    p = sub.add_parser("catalog-show", help="print a catalog snapshot")
    p.add_argument("catalog")
    p.add_argument("--version", type=int, default=None)

    p = sub.add_parser("merge", help="SQL MERGE INTO from a source parquet")
    p.add_argument("source", help="parquet with the lake key + payload cols")
    p.add_argument("lake")
    p.add_argument("--when-matched", choices=["update", "delete", "skip"],
                   default="update")
    p.add_argument("--when-not-matched", choices=["insert", "skip"],
                   default="insert")
    p.add_argument("--update-cols", default=None,
                   help="comma-separated column subset to update")
    p.add_argument("--mode", choices=["rewrite", "delta"], default="delta")

    p = sub.add_parser(
        "dedup-init", help="bootstrap a dedup corpus lake + shingle index"
    )
    p.add_argument("docs", help="parquet of (doc_id, text[, source])")
    p.add_argument("corpus")
    p.add_argument("index")
    p.add_argument("--num-partitions", type=int, default=16)

    p = sub.add_parser(
        "dedup-screen",
        help="screen a batch parquet against the corpus (no admission)",
    )
    p.add_argument("corpus")
    p.add_argument("index")
    p.add_argument("batch", help="parquet of (doc_id, text[, source])")
    p.add_argument("--threshold", type=float, default=0.8)

    p = sub.add_parser(
        "dedup-admit", help="screen a batch, admit survivors, refresh index"
    )
    p.add_argument("corpus")
    p.add_argument("index")
    p.add_argument("batch")
    p.add_argument("--threshold", type=float, default=0.8)

    p = sub.add_parser(
        "ivf-build", help="build the incremental IVF index over a vector lake"
    )
    p.add_argument("lake")
    p.add_argument("ivf")
    p.add_argument("--nlist", type=int, default=64)
    p.add_argument("--key", default="vec_id")
    p.add_argument("--emb-col", default="embedding")

    p = sub.add_parser("ivf-refresh", help="catch the IVF index up to the lake")
    p.add_argument("lake")
    p.add_argument("ivf")

    p = sub.add_parser(
        "ivf-search", help="cosine top-k for query vectors from a parquet file"
    )
    p.add_argument("ivf")
    p.add_argument("queries", help="parquet with an embedding list column")
    p.add_argument("--emb-col", default="embedding")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--nprobe", type=int, default=8)

    args = ap.parse_args(argv)

    if args.cmd == "state":
        from palimpzest_ray.cdc import load_latest_manifest

        m = load_latest_manifest(args.lake)
        if m is None:
            print(json.dumps({"version": 0, "parts": 0}))
            return 0
        print(
            json.dumps(
                {
                    "version": m.version,
                    "num_partitions": m.num_partitions,
                    "max_lsn": m.max_lsn,
                    "parts": len(m.parts),
                    "rows": sum(e.rows for e in m.parts.values()),
                    "tombstones": sum(e.tombstones for e in m.parts.values()),
                    "delta_files": sum(len(e.deltas) for e in m.parts.values()),
                    "columns": list(m.schema.names),
                }
            )
        )
        return 0

    if args.cmd == "vacuum":
        from palimpzest_ray.cdc import vacuum

        print(json.dumps(dataclasses.asdict(vacuum(
            args.lake, keep_versions=args.keep, keep_hours=args.keep_hours
        ))))
        return 0

    if args.cmd == "compact":
        from palimpzest_ray.cdc import CompactionPolicy, auto_compact

        policy = CompactionPolicy(
            target_file_mb=args.target_file_mb,
            max_superseded_files=args.max_superseded_files,
            keep_versions=args.keep,
            min_partitions=args.min_partitions,
            tombstone_watermark=args.drop_tombstones_below,
            max_delta_files=args.max_delta_files,
        )
        print(json.dumps(auto_compact(args.lake, policy)))
        return 0

    if args.cmd == "index-search":
        from palimpzest_ray.cdc import search_tokens

        docs = search_tokens(args.index, args.tokens,
                             mode="all" if args.all else "any")
        print(json.dumps({"tokens": args.tokens, "n_docs": len(docs),
                          "doc_ids": docs}))
        return 0
    if args.cmd == "screen":
        import ray.data as rd

        from palimpzest_ray.cdc import screen_new_keys

        new = screen_new_keys(args.lake, rd.read_parquet(args.candidates))
        if args.out:
            new.ray.write_parquet(args.out)
            import pyarrow.dataset as pads

            n = pads.dataset(args.out).count_rows()
        else:
            n = new.count()
        print(json.dumps({"new_rows": int(n), "out": args.out}))
        return 0
    if args.cmd == "colindex-build":
        from palimpzest_ray.cdc import build_column_index

        print(json.dumps(build_column_index(
            args.lake, args.index, args.column,
            num_partitions=args.num_partitions)))
        return 0
    if args.cmd == "colindex-refresh":
        from palimpzest_ray.cdc import refresh_column_index

        print(json.dumps(refresh_column_index(args.lake, args.index)))
        return 0
    if args.cmd == "colindex-lookup":
        from palimpzest_ray.cdc import lookup_by

        t = lookup_by(args.lake, args.index, args.values,
                      columns=args.columns)
        print(json.dumps({"n_rows": t.num_rows,
                          "rows": t.to_pylist()}, default=str))
        return 0

    if args.cmd == "fsck":
        from palimpzest_ray.cdc import fsck

        rep = fsck(args.lake, version=args.version, deep=args.deep)
        print(json.dumps(rep))
        return 0 if rep["ok"] else 1
    if args.cmd == "clone":
        from palimpzest_ray.cdc import clone_lake

        mc = clone_lake(args.lake, args.dst, version=args.version)
        print(json.dumps({"version": mc.version, "parts": len(mc.parts),
                          "max_lsn": mc.max_lsn}))
        return 0

    if args.cmd == "count":
        from palimpzest_ray.cdc import lake_count

        pred = None
        if args.where:
            def _cv(v: str):
                try:
                    return json.loads(v)
                except (json.JSONDecodeError, ValueError):
                    return v

            pred = [(c, op, _cv(v)) for c, op, v in args.where]
            _ensure_ray(args.num_cpus)  # metadata-only path needs no Ray
        n = lake_count(args.lake, predicate=pred, version=args.version)
        print(json.dumps({"rows": n, "metadata_only": pred is None}))
        return 0

    if args.cmd in ("publish", "discard", "restore"):
        # pointer ops — no Ray session
        from palimpzest_ray.cdc import (
            discard_version,
            publish_version,
            restore_version,
        )

        if args.cmd == "publish":
            m = publish_version(args.lake, args.version)
            print(json.dumps({"published": m.version}))
        elif args.cmd == "restore":
            m = restore_version(args.lake, args.version)
            print(json.dumps({"restored": m.version}))
        else:
            discard_version(args.lake, args.version)
            print(json.dumps({"discarded": args.version}))
        return 0

    if args.cmd == "log":  # manifest reads only — no Ray session
        from palimpzest_ray.cdc import lake_history

        for row in lake_history(args.lake, limit=args.limit):
            print(json.dumps(row))
        return 0

    if args.cmd == "branch":  # metadata ops — no Ray session
        from palimpzest_ray.cdc import (
            create_branch,
            delete_branch,
            list_branches,
            merge_branch,
        )

        if args.action != "list" and not args.name:
            print("branch {create,delete,merge} requires a NAME")
            return 2
        if args.action == "create":
            root = create_branch(args.lake, args.name, version=args.version)
            print(json.dumps({"branch": args.name, "root": root}))
        elif args.action == "list":
            print(json.dumps({"branches": list_branches(args.lake)}))
        elif args.action == "delete":
            delete_branch(args.lake, args.name)
            print(json.dumps({"deleted": args.name}))
        else:
            m = merge_branch(args.lake, args.name, delete=not args.keep)
            print(json.dumps({"merged": args.name, "version": m.version,
                              "parts": len(m.parts)}))
        return 0

    if args.cmd == "lag":  # footer stats only — no Ray session
        from palimpzest_ray.cdc import ingest_lag

        print(json.dumps(ingest_lag(args.log_dir, args.lake)))
        return 0

    if args.cmd == "quarantine":  # pure file read — no Ray session
        from palimpzest_ray.cdc import read_quarantine

        q = read_quarantine(args.lake, version=args.version)
        print(json.dumps({"rows": q.num_rows}))
        for row in q.slice(0, args.limit).to_pylist():
            row.pop("tokens", None)  # payload too wide for a console
            print(json.dumps(row, default=str))
        return 0

    if args.cmd == "minmax":
        from palimpzest_ray.cdc import lake_minmax

        mm = lake_minmax(args.lake, args.columns, version=args.version)
        print(json.dumps({c: list(v) for c, v in mm.items()}))
        return 0

    if args.cmd == "ttl":
        from palimpzest_ray.cdc import apply_ttl, drop_ttl, get_ttl, set_ttl

        if args.action == "show":
            print(json.dumps(get_ttl(args.lake)))
        elif args.action == "drop":
            drop_ttl(args.lake)
            print(json.dumps({"dropped": True}))
        elif args.action == "set":
            if not (args.col and args.keep_seconds):
                raise SystemExit("ttl set needs COL --keep-seconds N")
            print(json.dumps(set_ttl(
                args.lake, args.col, args.keep_seconds
            )))
        else:  # apply
            _ensure_ray(args.num_cpus)
            res = apply_ttl(args.lake, now=args.now)
            print(json.dumps(_apply_summary(res)))
        return 0

    if args.cmd == "rollup":
        from palimpzest_ray.cdc import apply_rollup

        _ensure_ray(args.num_cpus)
        aggs = {
            out: (fn, None if col == "-" else col)
            for out, fn, col in args.agg
        }
        print(json.dumps(apply_rollup(
            args.lake, args.rollup_lake,
            ttl_col=args.ttl_col, keep_seconds=args.keep_seconds,
            group_col=args.group_col, aggs=aggs, now=args.now,
        )))
        return 0

    if args.cmd == "digest":
        from palimpzest_ray.cdc import lake_digest

        _ensure_ray(args.num_cpus)
        print(json.dumps(lake_digest(
            args.lake, version=args.version, columns=args.columns
        )))
        return 0

    if args.cmd == "sync":
        from palimpzest_ray.cdc import sync_replica

        _ensure_ray(args.num_cpus)
        print(json.dumps(sync_replica(args.src, args.dst, name=args.name)))
        return 0

    if args.cmd == "diff":
        import pyarrow as _pa

        from palimpzest_ray.cdc import apply_changes, diff_lakes, verify_replica

        _ensure_ray(args.num_cpus)
        feed = diff_lakes(args.src, args.dst, key=args.key)
        batches = list(
            feed.iter_batches(batch_format="pyarrow", batch_size=65536)
        )
        # converged replicas (the common "check for drift" call) yield
        # ZERO batches — concat_tables([]) would raise
        tab = _pa.concat_tables(batches) if batches else None
        ops = tab["op"].to_pylist() if tab is not None else []
        out = {"events": len(ops),
               "upserts": ops.count("UPDATE"),
               "deletes": ops.count("DELETE")}
        if args.apply and tab is not None and tab.num_rows:
            apply_changes(tab, args.dst, key=args.key)
        if args.apply:
            # convergence is defined over the SOURCE's columns (the
            # authority); a dst-only column is untouched by the repair
            from palimpzest_ray.cdc.manifest import load_latest_manifest
            from palimpzest_ray.schemas import INTERNAL_COLS

            src_cols = sorted(
                f.name
                for f in load_latest_manifest(args.src).schema
                if f.name not in INTERNAL_COLS
            )
            out["verify"] = verify_replica(
                args.src, args.dst, columns=src_cols
            )
        print(json.dumps(out))
        return 0

    if args.cmd == "tag":  # pure metadata, no Ray session
        from palimpzest_ray.cdc import drop_tag, list_tags, tag_version

        if args.action == "list":
            print(json.dumps(list_tags(args.lake)))
        elif not args.name:
            raise SystemExit(f"tag {args.action} needs NAME")
        elif args.action == "create":
            print(json.dumps(tag_version(
                args.lake, args.name, args.version, force=args.force
            )))
        else:
            drop_tag(args.lake, args.name)
            print(json.dumps({"dropped": args.name}))
        return 0

    if args.cmd == "orphans":  # pure metadata, no Ray session
        from palimpzest_ray.cdc import find_orphans

        print(json.dumps(find_orphans(args.lake)))
        return 0

    if args.cmd == "skew":  # pure metadata, no Ray session
        from palimpzest_ray.cdc import lake_skew

        print(json.dumps(lake_skew(args.lake)))
        return 0

    if args.cmd == "sub":  # pure metadata, no Ray session
        from palimpzest_ray.cdc import (
            ack_subscription,
            create_subscription,
            drop_subscription,
            list_subscriptions,
            subscription_lag,
        )

        if args.action == "list":
            print(json.dumps(list_subscriptions(args.lake)))
            return 0
        if not args.name:
            raise SystemExit(f"sub {args.action} needs NAME")
        if args.action == "create":
            print(json.dumps(create_subscription(
                args.lake, args.name, from_version=args.from_version
            )))
        elif args.action == "ack":
            if args.token is None:
                raise SystemExit("sub ack needs --token")
            print(json.dumps(ack_subscription(
                args.lake, args.name, args.token
            )))
        elif args.action == "drop":
            drop_subscription(args.lake, args.name)
            print(json.dumps({"dropped": args.name}))
        else:
            print(json.dumps(subscription_lag(args.lake, args.name)))
        return 0

    if args.cmd == "purge":
        from palimpzest_ray.cdc import purge_keys

        def _jval(s: str):
            try:
                return json.loads(s)
            except (json.JSONDecodeError, ValueError):
                return s

        _ensure_ray(args.num_cpus)  # tombstone_first commits an apply
        res = purge_keys(
            args.lake,
            [_jval(k) for k in args.keys],
            keep_tombstones=args.keep_tombstones,
            include_quarantine=not args.skip_quarantine,
        )
        print(json.dumps(res))
        return 0

    if args.cmd == "alter":  # pure metadata commit, no Ray session
        from palimpzest_ray.cdc import alter_schema

        kw = {}
        if args.add:
            import pyarrow as _pa

            kw["add"] = [
                _pa.field(n, _arrow_type(t)) for n, t in args.add
            ]
        if args.drop:
            kw["drop"] = list(args.drop)
        if args.rename:
            kw["rename"] = {old: new for old, new in args.rename}
        if args.widen:
            kw["widen"] = {c: _arrow_type(t) for c, t in args.widen}
        if not kw:
            raise SystemExit(
                "alter needs at least one of --add/--drop/--rename/--widen"
            )
        m = alter_schema(args.lake, **kw)
        print(json.dumps(
            {
                "version": m.version,
                "columns": {
                    f.name: str(f.type) for f in m.schema
                },
                "renames": m.renames or {},
            }
        ))
        return 0

    if args.cmd == "generated":
        from palimpzest_ray.cdc import add_generated_column
        from palimpzest_ray.cdc.manifest import load_latest_manifest

        if args.action == "list":  # pure metadata, no Ray session
            m = load_latest_manifest(args.lake)
            print(json.dumps((m.generated if m else None) or {}))
            return 0
        if not (args.name and args.type and args.expr):
            raise SystemExit("generated add needs NAME TYPE --expr JSON")
        import pyarrow as _pa

        if not args.no_backfill:
            _ensure_ray(args.num_cpus)  # backfill scans the lake
        m = add_generated_column(
            args.lake, _pa.field(args.name, _arrow_type(args.type)),
            json.loads(args.expr),
            backfill_existing=not args.no_backfill,
        )
        print(json.dumps(
            {"version": m.version, "generated": m.generated or {}}
        ))
        return 0

    if args.cmd == "constraint":
        from palimpzest_ray.cdc import add_constraint, drop_constraint
        from palimpzest_ray.cdc.manifest import load_latest_manifest

        if args.action == "list":  # pure metadata, no Ray session
            m = load_latest_manifest(args.lake)
            print(json.dumps((m.constraints if m else None) or {}))
            return 0
        if not args.name:
            raise SystemExit("constraint add/drop needs NAME")
        if args.action == "drop":
            m = drop_constraint(args.lake, args.name)
        else:
            if bool(args.where) == bool(args.expr):
                raise SystemExit(
                    "constraint add needs exactly one of "
                    "--where COL OP VALUE / --expr JSON"
                )

            def _cval(v: str):
                try:
                    return json.loads(v)
                except (json.JSONDecodeError, ValueError):
                    return v

            if not args.no_verify:
                _ensure_ray(args.num_cpus)  # verify scans the lake
            if args.expr:
                m = add_constraint(
                    args.lake, args.name, expr=json.loads(args.expr),
                    verify=not args.no_verify,
                )
            else:
                m = add_constraint(
                    args.lake, args.name,
                    [(c, op, _cval(v)) for c, op, v in args.where],
                    verify=not args.no_verify,
                )
        print(json.dumps(
            {"version": m.version, "constraints": m.constraints or {}}
        ))
        return 0

    _ensure_ray(args.num_cpus)
    if args.cmd in ("delete-where", "update-where"):
        from palimpzest_ray.cdc import delete_where, update_where

        def _val(v: str):
            try:
                return json.loads(v)
            except (json.JSONDecodeError, ValueError):
                return v

        pred = [(c, op, _val(v)) for c, op, v in (args.where or [])]
        if args.cmd == "delete-where":
            dexpr = getattr(args, "expr", None)
            if bool(pred) == bool(dexpr):
                raise SystemExit(
                    "delete-where needs exactly one of --where / --expr"
                )
            res = delete_where(
                args.lake, pred or None,
                expr=json.loads(dexpr) if dexpr else None, mode=args.mode,
            )
        else:
            sets = {}
            for spec in args.set:
                c, _, v = spec.partition("=")
                if not _:
                    raise SystemExit(f"--set expects COL=VALUE, got {spec!r}")
                sets[c] = _val(v)
            res = update_where(args.lake, pred, sets, mode=args.mode)
        print(json.dumps({
            "version": res.manifest.version,
            "rows_upserted": res.rows_upserted,
            "rows_deleted": res.rows_deleted,
        }))
        return 0
    if args.cmd == "snapshot":
        from palimpzest_ray.cdc import export_snapshot

        meta = export_snapshot(
            args.lake, args.out_dir, version=args.version,
            columns=args.columns, cluster_by=args.cluster_by,
        )
        print(json.dumps({k: meta[k] for k in ("source_version", "rows", "columns")}))
        return 0
    if args.cmd == "view-create":
        from palimpzest_ray.cdc import create_view

        aggs: dict[str, tuple] = {}
        if args.count:
            aggs[args.count] = ("count", None)
        for spec, fn in (
            [(x, "sum") for x in args.sum]
            + [(x, "avg") for x in args.avg]
            + [(x, "min") for x in args.min]
            + [(x, "max") for x in args.max]
        ):
            out, _, col = spec.partition("=")
            if not col:
                raise SystemExit(f"--{fn} expects OUT=COL, got {spec!r}")
            aggs[out] = (fn, col)
        if not aggs:
            raise SystemExit("view-create needs one of --count/--sum/--avg/--min/--max")
        meta = create_view(args.lake, args.view, group_col=args.group_col, aggs=aggs)
        print(json.dumps(meta))
        return 0
    if args.cmd == "view-refresh":
        from palimpzest_ray.cdc import refresh_view

        print(json.dumps(refresh_view(args.lake, args.view)))
        return 0
    if args.cmd == "jview-create":
        from palimpzest_ray.cdc import create_join_view

        print(json.dumps(create_join_view(
            args.view, args.left, args.right, how=args.how,
            left_on=args.left_on, num_partitions=args.num_partitions,
        )))
        return 0
    if args.cmd == "jview-refresh":
        from palimpzest_ray.cdc import refresh_join_view

        print(json.dumps(refresh_join_view(args.view)))
        return 0
    if args.cmd == "index-build":
        from palimpzest_ray.cdc import build_token_index

        print(json.dumps(build_token_index(args.lake, args.index,
                                           num_partitions=args.num_partitions)))
        return 0
    if args.cmd == "index-refresh":
        from palimpzest_ray.cdc import refresh_token_index

        print(json.dumps(refresh_token_index(args.lake, args.index)))
        return 0
    if args.cmd == "export-changes":
        from palimpzest_ray.sources.changelog import export_changes

        print(json.dumps(export_changes(
            args.lake, args.since_version, args.out_dir,
            format=args.format,
        )))
        return 0
    if args.cmd == "history":
        from palimpzest_ray.cdc import key_history

        t = key_history(args.lake, args.keys,
                        changes_only=not args.all_versions)
        print(json.dumps({"rows": t.to_pylist()}, default=str))
        return 0
    if args.cmd == "catalog-commit":
        from palimpzest_ray.cdc import catalog as _cat

        pins = {}
        for spec in args.pins:
            name, _, root = spec.partition("=")
            if not root:
                raise SystemExit(f"bad pin {spec!r}: want NAME=LAKE_ROOT")
            pins[name] = (root, None)
        snap = _cat.commit_catalog(args.catalog, pins)
        print(json.dumps({"version": snap.version, "pins": snap.pins}))
        return 0
    if args.cmd == "catalog-show":
        from palimpzest_ray.cdc import catalog as _cat

        snap = _cat.snapshot(args.catalog, args.version)
        print(json.dumps({"version": snap.version, "pins": snap.pins}))
        return 0
    if args.cmd == "merge":
        import pyarrow.parquet as pq_

        from palimpzest_ray.cdc import merge_into

        res = merge_into(
            args.lake,
            pq_.read_table(args.source),
            when_matched=args.when_matched,
            when_not_matched=args.when_not_matched,
            update_cols=(
                args.update_cols.split(",") if args.update_cols else None
            ),
            mode=args.mode,
        )
        print(json.dumps(_apply_summary(res)))
        return 0
    if args.cmd == "dedup-init":
        import ray.data as rd

        from palimpzest_ray.cdc import dedup_ingest as DI

        print(json.dumps(DI.init_corpus(
            rd.read_parquet(args.docs), args.corpus, args.index,
            num_partitions=args.num_partitions,
        )))
        return 0
    if args.cmd in ("dedup-screen", "dedup-admit"):
        import pyarrow.parquet as pq_

        from palimpzest_ray.cdc import dedup_ingest as DI

        batch = pq_.read_table(args.batch)
        fn = DI.admit if args.cmd == "dedup-admit" else DI.screen
        res = fn(args.corpus, args.index, batch, threshold=args.threshold)
        out = {
            "batch_rows": batch.num_rows,
            "unique": res["unique"].num_rows,
            "dup_pairs": res["dups"].num_rows,
        }
        if args.cmd == "dedup-admit":
            out["admitted"] = res["admitted"]
            out["rejected"] = res["rejected"]
        print(json.dumps(out))
        return 0
    if args.cmd == "ivf-build":
        from palimpzest_ray.cdc import annindex as AI

        print(json.dumps(AI.build_ivf_lake(
            args.lake, args.ivf, key=args.key, emb_col=args.emb_col,
            nlist=args.nlist,
        )))
        return 0
    if args.cmd == "ivf-refresh":
        from palimpzest_ray.cdc import annindex as AI

        print(json.dumps(AI.refresh_ivf_lake(args.lake, args.ivf)))
        return 0
    if args.cmd == "ivf-search":
        import numpy as np
        import pyarrow.parquet as pq_

        from palimpzest_ray.cdc import annindex as AI

        Q = np.array(
            pq_.read_table(args.queries, columns=[args.emb_col])[
                args.emb_col
            ].to_pylist(),
            dtype=np.float64,
        )
        t = AI.ivf_lake_search(args.ivf, Q, k=args.k, nprobe=args.nprobe)
        print(json.dumps({"queries": len(Q), "hits": t.to_pylist()}))
        return 0
    if args.cmd == "apply":
        from palimpzest_ray.cdc import apply_changes

        changes = args.changes
        extra = {}
        if args.format in ("jsonl", "debezium", "maxwell"):
            from palimpzest_ray.schemas import CHANGELOG_SCHEMA
            from palimpzest_ray.sources.changelog import (
                read_debezium_changes,
                read_jsonl_changes,
                read_maxwell_changes,
            )

            reader = {
                "debezium": read_debezium_changes,
                "maxwell": read_maxwell_changes,
                "jsonl": read_jsonl_changes,
            }[args.format]
            changes = reader(args.changes)
            extra["change_schema"] = CHANGELOG_SCHEMA
        res = apply_changes(
            changes,
            args.lake,
            num_partitions=args.num_partitions,
            exchange=args.exchange,
            run_id=args.run_id,
            since_lsn=args.since_lsn,
            mode=args.mode,
            **extra,
            **_gate_kwargs(args),
        )
    elif args.cmd == "patch":
        from palimpzest_ray.cdc import apply_patches

        res = apply_patches(
            args.changes,
            args.lake,
            num_partitions=args.num_partitions,
            mode=args.mode,
            chunk_events=args.chunk_events,
        )
    elif args.cmd == "tail":
        from palimpzest_ray.cdc import tail_once

        res = tail_once(
            args.log_dir, args.lake,
            format=args.format,
            num_partitions=args.num_partitions, mode=args.mode,
            **_gate_kwargs(args),
        )
    elif args.cmd == "repartition":
        from palimpzest_ray.cdc import repartition_lake

        res = repartition_lake(
            args.lake,
            args.new_num_partitions,
            drop_tombstones_below=args.drop_tombstones_below,
        )
    else:  # pragma: no cover
        raise SystemExit(2)
    print(json.dumps(_apply_summary(res)))
    return 0


if __name__ == "__main__":
    import ray

    code = main()
    if ray.is_initialized():
        ray.shutdown()
    sys.exit(code)
