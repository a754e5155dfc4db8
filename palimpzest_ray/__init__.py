"""palimpzest_ray — a Ray-Data-native data-processing engine.

A from-scratch engine with the query/data-processing capabilities of
mitdbg/palimpzest (see /root/repo/SURVEY.md), re-expressed Ray-Data-first:

- ``palimpzest_ray.Dataset``: a fluent relational layer over
  ``ray.data.Dataset`` (filter/map/flat_map/distinct/groupby/join/limit/
  project/aggregates/sort/union) with the reference's semantics
  (distinct keeps first occurrence, join duplicate columns rename with
  ``_right``, groupby output columns named ``"func(field)"``).
- ``palimpzest_ray.cdc``: the headline CDC / incremental-ingest engine —
  binlog/WAL-style change log -> hash-partitioned last-writer-wins upsert
  into a versioned Parquet lake with schema evolution, exactly-once
  manifest commit, and checkpoint/resume (BASELINE.json north rule).
- ``palimpzest_ray.stages``: training-data pipeline stages — dedup
  (exact / MinHash-LSH / SimHash / embedding), text analysis, similarity
  search, multimodal plumbing.

Everything is built on public Ray Data / Apache Arrow APIs only.
"""

from palimpzest_ray.context import configure_ray_data, quiet
from palimpzest_ray.dataset import (
    Dataset,
    from_arrow,
    from_items,
    from_pandas,
    read_parquet,
)
from palimpzest_ray.generators import OpenAIConfig, openai_generator
from palimpzest_ray.optimizer import (
    LabeledValidator,
    MaxQuality,
    MinCost,
    MinTime,
    Policy,
    SemCandidate,
    SemStage,
    Validator,
    construct_policy_from_kwargs,
    optimize,
    optimize_and_run,
)

__all__ = [
    "Dataset",
    "read_parquet",
    "from_pandas",
    "from_arrow",
    "from_items",
    "configure_ray_data",
    "quiet",
    "OpenAIConfig",
    "openai_generator",
    "Policy",
    "MaxQuality",
    "MinCost",
    "MinTime",
    "construct_policy_from_kwargs",
    "Validator",
    "LabeledValidator",
    "SemCandidate",
    "SemStage",
    "optimize",
    "optimize_and_run",
]

__version__ = "0.1.0"
