"""Change-log sources beyond Parquet.

Real binlog/WAL tails are frequently JSON lines (Debezium, Maxwell,
DynamoDB streams). ``read_jsonl_changes`` turns a JSONL directory into
the same normalized change Dataset ``apply_changes`` consumes —
``ray.data.read_json`` streams the files, a vectorized ``conform``
casts every block onto the declared change schema (JSON integers
arrive as int64; token arrays become ``list<int32>``), so the CDC
engine sees identical input regardless of wire format.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from palimpzest_ray.schemas import CHANGELOG_SCHEMA, conform


def read_jsonl_changes(
    paths: str | list[str],
    schema: pa.Schema = CHANGELOG_SCHEMA,
) -> rd.Dataset:
    """Stream a JSONL change log as a conformed Dataset.

    Pass the result to ``apply_changes(ds, ..., change_schema=schema)``
    — supplying the schema explicitly matters for mixed-epoch logs
    (``ds.schema()`` reflects only the first block)."""

    def _conform(batch: pa.Table) -> pa.Table:
        return conform(batch, schema)

    return rd.read_json(paths).map_batches(_conform, batch_format="pyarrow")
