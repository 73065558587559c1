"""Per-process Ray Data execution tuning, applied by entry points (bench,
tests, CLI, driver contract) — never by library functions, which stay pure.

Note on shuffle strategy: Ray 2.49's HASH_SHUFFLE backend measured ~1.5×
faster than the default sort-based shuffle on this engine's bucketed
groupbys, but its aggregator ACTORS reserve CPUs and can starve the map
stages on small clusters (observed executor stall at num_cpus=4), so the
default sort shuffle is kept. Revisit with explicit aggregator sizing.
"""

from __future__ import annotations

import logging


def apply_data_context() -> None:
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
