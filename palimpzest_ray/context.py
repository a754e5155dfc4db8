"""Ray Data execution-context helpers.

The library never calls ``ray.init()`` / ``ray.shutdown()`` — the
driver (or ``bench.py`` / the pytest session fixture) owns the Ray
session. These helpers only tune the ``DataContext`` of the current
session for headless batch execution.
"""

from __future__ import annotations


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
