"""Ray Data execution-context defaults for nailray pipelines.

Centralizes the knobs that matter at 100 TB scale: block size, ordering,
progress noise. Callers may override; nothing here initializes Ray.
"""

from __future__ import annotations

import os


def configure(quiet: bool = True, target_max_block_size: int | None = None) -> None:
    """Apply nailray's DataContext defaults (idempotent).

    - ``preserve_order=False``: nailray carries an explicit ``row_id``
      column where order matters (head/tail/dedup-keep-first), so the
      scheduler is free to reorder blocks for throughput.
    - block size default kept at Ray's 128 MiB; the encode pipeline
      lowers it per-stage for multi-MB ``content`` rows.
    """
    from ray.data import DataContext

    ctx = DataContext.get_current()
    if quiet:
        import logging

        logging.getLogger("ray.data").setLevel(logging.WARNING)
        # empty partial blocks (e.g. an all-filtered batch) trigger benign
        # "RefBundle with a different schema" warnings per stream boundary
        logging.getLogger(
            "ray.data._internal.execution.streaming_executor_state"
        ).setLevel(logging.ERROR)
        ctx.enable_progress_bars = False
        try:
            ctx.execution_options.verbose_progress = False
        except Exception:
            pass
    ctx.execution_options.preserve_order = False
    if target_max_block_size is not None:
        ctx.target_max_block_size = target_max_block_size


def default_num_cpus() -> int:
    """Parallelism level for scripts that own a Ray session (bench/CLI)."""
    return int(os.environ.get("RAY_GRAFT_CPUS", "32"))
