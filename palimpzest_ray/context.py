"""Ray Data execution-context helpers.

The library never calls ``ray.init()`` / ``ray.shutdown()`` — the
driver (or ``bench.py`` / the pytest session fixture) owns the Ray
session. These helpers only tune the ``DataContext`` of the current
session for headless batch execution.
"""

from __future__ import annotations


import contextlib


_HASH_SHUFFLE_FIELDS = (
    "shuffle_strategy",
    "default_hash_shuffle_parallelism",
    "max_hash_shuffle_aggregators",
    "hash_shuffle_operator_actor_num_cpus_per_partition_override",
    "hash_aggregate_operator_actor_num_cpus_per_partition_override",
)


@contextlib.contextmanager
def hash_shuffle_scope(ctx=None):
    """Temporarily switch keyed exchanges to HASH_SHUFFLE, restoring the
    default on exit. Scoped, not global, on purpose: Ray 2.49's hash
    shuffle (alpha) wedges a session when several shuffles contend at
    low CPU headroom (observed: chained groupbys hanging at num_cpus=4
    after unrelated pipelines ran), so only the CDC engine — whose
    merge exchange measures 3-5x faster under hash partitioning — opts
    in, around its own fully-consumed pipelines.

    ``ctx`` defaults to the session's current ``DataContext``; pass a
    specific one (e.g. ``dataset.context`` — every ``ray.data.Dataset``
    captures a context copy at creation) to retarget an already-built
    pipeline."""
    from ray.data import DataContext

    ctx = ctx or DataContext.get_current()
    saved = tuple(getattr(ctx, f) for f in _HASH_SHUFFLE_FIELDS)
    use_hash_shuffle(ctx)
    try:
        yield
    finally:
        for f, v in zip(_HASH_SHUFFLE_FIELDS, saved):
            setattr(ctx, f, v)


def use_hash_shuffle(ctx=None) -> None:
    """Switch groupby/repartition exchanges to HASH_SHUFFLE.

    The default sort-based shuffle globally sorts by the key — measured
    3-5x slower than hash partitioning for the CDC merge exchange on
    payload-heavy (token list) rows, and sorting is semantically
    unnecessary for every keyed exchange this engine performs (LWW
    merge, distinct, cogroup join all need co-location, not order).
    Prefer :func:`hash_shuffle_scope` (see its caveat).
    """
    import ray
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = ctx or DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # Size the aggregator-actor fleet to the cluster. The defaults
    # (64-way parallelism, 0.25 CPU per partition => 16 CPUs of
    # aggregators) STALL clusters smaller than ~16 CPUs: aggregators
    # can't all start and the exchange never finalizes (observed hang at
    # num_cpus=4). Scale partitions and aggregators with the cluster;
    # fractional CPUs keep aggregators schedulable alongside the map
    # stages and the merge actor pool. Cap aggregators at a QUARTER of
    # the cluster, not the whole of it: at aggregators == ncpu the
    # actor fleet itself saturates the CPU bank and the upstream map
    # stage never runs (reproduced wedge at num_cpus=16 with 16
    # aggregators; ncpu//4 both unwedges it and leaves the exchange
    # throughput unchanged — the aggregator work is memcpy-bound, a
    # handful of actors keep up with any map width).
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:
        ncpu = 4
    ctx.default_hash_shuffle_parallelism = max(8, 2 * ncpu)
    ctx.max_hash_shuffle_aggregators = max(2, ncpu // 4)
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.25
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.25


def configure_ray_data(
    *,
    target_max_block_size: int | None = None,
    preserve_order: bool = False,
    progress_bars: bool = False,
) -> None:
    """Tune the Ray Data ``DataContext`` for this session.

    ``target_max_block_size`` matters for token-sequence tables: rows
    carry KB-sized ``list<int32>`` payloads, so block sizing must be
    byte-aware (SURVEY.md §7.5 item 4). ``preserve_order=False`` lets the
    streaming executor run out of order — all our wide operators are
    order-insensitive by design (LWW keys on ``lsn``, not arrival order).
    """
    from ray.data import DataContext

    ctx = DataContext.get_current()
    if target_max_block_size is not None:
        ctx.target_max_block_size = target_max_block_size
    ctx.execution_options.preserve_order = preserve_order
    ctx.enable_progress_bars = progress_bars
    # Keep per-execution INFO logging out of test / bench output.
    try:
        ctx.execution_options.verbose_progress = False
    except AttributeError:
        pass


def quiet() -> None:
    """Silence Ray Data progress bars / per-execution log lines."""
    import logging

    configure_ray_data(progress_bars=False)
    for name in ("ray.data", "ray"):
        logging.getLogger(name).setLevel(logging.ERROR)
