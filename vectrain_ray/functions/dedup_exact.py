"""Exact deduplication — the building block the KG pipeline uses to make
duplicate re-sent turns idempotent (the reference instead duplicates on every
re-run: fresh uuid per written point, qdrant/store.go:32 + TODO store.go:45).

Pattern (ray_guide): vectorized per-batch combiner first (drop duplicates
inside each batch — removes the common same-block duplicates for free), then
hash-partition on the key and keep the deterministic first row per group.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def _batch_drop_dups(key_cols):
    def fn(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pandas(
            df.drop_duplicates(subset=list(key_cols), keep="first"),
            preserve_index=False,
        )

    return fn


def dedup_exact(ds, key_cols, sort_within: list[str] | None = None):
    """Distinct rows by ``key_cols``; deterministic winner = first row after
    sorting the group by ``sort_within`` (default: the key itself)."""
    key_cols = list(key_cols)
    order = sort_within or key_cols

    def first_per_group(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order, kind="stable").head(1)

    pre = ds.map_batches(_batch_drop_dups(key_cols), batch_format="pyarrow")
    return pre.groupby(key_cols).map_groups(first_per_group, batch_format="pandas")
