from palimpzest_ray.cdc.engine import (
    ApplyResult,
    apply_changes,
    final_state,
    zone_prune_files,
    final_state_table,
    lookup,
    lww_latest,
    net_changes_since,
    repartition_lake,
    suggest_num_partitions,
    tail_once,
)
from palimpzest_ray.cdc.manifest import (
    ConcurrentCommitError,
    LakeManifest,
    VacuumResult,
    load_latest_manifest,
    load_manifest,
    vacuum,
)
from palimpzest_ray.cdc.oracle import sequential_replay
from palimpzest_ray.cdc.views import create_view, read_view, refresh_view
from palimpzest_ray.cdc.index import build_token_index, refresh_token_index, search_tokens
from palimpzest_ray.cdc.synth import (
    make_base_table,
    make_change_table,
    write_base_lake,
    write_change_log,
)

__all__ = [
    "apply_changes",
    "final_state",
    "zone_prune_files",
    "final_state_table",
    "lww_latest",
    "lookup",
    "repartition_lake",
    "net_changes_since",
    "load_manifest",
    "tail_once",
    "suggest_num_partitions",
    "ApplyResult",
    "LakeManifest",
    "ConcurrentCommitError",
    "load_latest_manifest",
    "vacuum",
    "VacuumResult",
    "sequential_replay",
    "create_view",
    "refresh_view",
    "read_view",
    "build_token_index",
    "refresh_token_index",
    "search_tokens",
    "make_base_table",
    "make_change_table",
    "write_base_lake",
    "write_change_log",
]
