"""Stage 3 — entity canonicalization (the shuffle-heavy stage).

The reference has no groupby/dedup at all (SURVEY.md §2.6); this implements
the north-rule's "groupby(surface_form) alias resolution + union-find merge
of near-duplicate clusters" with explicit skew handling:

  1. **Partial pre-aggregation** inside ``map_batches``: each batch collapses
     to at most one row per (surface_norm, surface_form) via a vectorized
     pyarrow ``group_by`` BEFORE the all-to-all exchange. A Zipf-hot surface
     form therefore contributes ≤ #batches rows to the shuffle instead of
     #mentions rows — this is the combiner that defuses hot-key skew (the
     salted-key two-phase aggregate of SURVEY.md §7 step 6).
  2. ``groupby("surface_norm")`` over the partials → per-norm stats
     (canonical surface = most frequent original casing, alias set, count).
  3. ``groupby("merge_key")`` → equivalence clusters (corp-suffix rule),
     entity_id = stable hash of the merge key (idempotent across runs —
     answers reference TODO qdrant/store.go:45).
  4. Optional **union-find** merge of extra near-duplicate candidate pairs
     (e.g. embedding-cosine pairs from functions.dedup) — pairs are provably
     few, so the union-find runs driver-side over cluster representatives
     only (state/unionfind.py), then re-maps entity ids via a broadcast dict.

Output: a mapping Dataset (surface_norm → entity_id, canonical_name) small
enough to broadcast with ``ray.put`` for the linking stage; at ≥10^8 entities
shard the dict by ``crc_bucket(norm, K)`` and give each linker actor its
shard (documented partitioning assumption).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .. import rules
from ..state.unionfind import UnionFind


def add_surface_norm(batch: pa.Table, col: str = "surface_form",
                     out: str = "surface_norm") -> pa.Table:
    """Vectorized mirror of rules.normalize_surface (RE2 kernels)."""
    x = pc.utf8_lower(pc.fill_null(batch[col], ""))
    # \p{L}\p{N}_ mirrors Python's Unicode \w (RE2's \w is ASCII-only)
    x = pc.replace_substring_regex(x, r"[^\p{L}\p{N}_\s]", "")
    x = pc.replace_substring_regex(x, r"\s+", " ")
    x = pc.utf8_trim_whitespace(x)
    return batch.append_column(out, x)


def partial_surface_counts(batch: pa.Table) -> pa.Table:
    """Combiner: batch of mentions → ≤1 row per (surface_norm, surface_form)
    with a partial count. Runs fully in Arrow C++."""
    batch = add_surface_norm(batch)
    g = batch.select(["surface_norm", "surface_form"]).group_by(
        ["surface_norm", "surface_form"]
    )
    out = g.aggregate([("surface_form", "count")])
    return out.rename_columns(["surface_norm", "surface_form", "cnt"])


def merge_norm_group(g: pd.DataFrame) -> pd.DataFrame:
    """Final aggregate for one surface_norm: canonical surface = highest
    total count (ties → lexicographic, deterministic)."""
    totals = g.groupby("surface_form", sort=True)["cnt"].sum().sort_values(
        ascending=False, kind="stable"
    )
    norm = g["surface_norm"].iloc[0]
    return pd.DataFrame(
        {
            "surface_norm": [norm],
            "canonical_surface": [totals.index[0]],
            "n_mentions": [int(totals.sum())],
            "aliases": [sorted(totals.index)],
            "merge_key": [rules.canonical_merge_key(norm)],
        }
    )


def cluster_group(g: pd.DataFrame) -> pd.DataFrame:
    """One merge_key cluster → mapping rows (one per member norm).

    entity_id is a pure function of merge_key → byte-identical across runs
    and partitionings."""
    key = g["merge_key"].iloc[0]
    eid = rules.stable_id("ent", key)
    heaviest = g.sort_values(["n_mentions", "surface_norm"],
                             ascending=[False, True], kind="stable").iloc[0]
    return pd.DataFrame(
        {
            "surface_norm": g["surface_norm"],
            "entity_id": eid,
            "canonical_name": heaviest["canonical_surface"],
            "n_mentions": g["n_mentions"],
            "aliases": g["aliases"],
        }
    )


def build_mapping(mentions_ds, extra_pairs: list[tuple[str, str]] | None = None):
    """mentions Dataset → mapping Dataset
    (surface_norm, entity_id, canonical_name, n_mentions, aliases).

    ``extra_pairs``: optional (surface_norm_a, surface_norm_b) near-duplicate
    candidates from a similarity pass; merged via driver-side union-find.
    """
    partials = mentions_ds.map_batches(
        partial_surface_counts, batch_format="pyarrow", batch_size=8192
    )
    norm_stats = partials.groupby("surface_norm").map_groups(
        merge_norm_group, batch_format="pandas"
    )
    mapping = norm_stats.groupby("merge_key").map_groups(
        cluster_group, batch_format="pandas"
    )
    if extra_pairs:
        mapping = _apply_union_find(mapping, extra_pairs)
    return mapping


def _apply_union_find(mapping_ds, pairs: list[tuple[str, str]]):
    """Merge entity clusters connected by ``pairs`` (norm↔norm).

    The pair list is small by construction (near-dup candidates that survived
    verification), so union-find runs on the driver; the re-map is a
    broadcast dict applied in ``map_batches`` — no extra shuffle.
    """
    import ray

    # representative entity per norm for the norms that appear in pairs
    touched = {n for p in pairs for n in p}
    rep = (
        mapping_ds.map_batches(
            lambda t: t.filter(pc.is_in(t["surface_norm"], pa.array(sorted(touched)))),
            batch_format="pyarrow",
        )
        .select_columns(["surface_norm", "entity_id", "canonical_name", "n_mentions"])
        .to_pandas()
    )
    norm2eid = dict(zip(rep["surface_norm"], rep["entity_id"]))
    uf = UnionFind()
    for a, b in pairs:
        ea, eb = norm2eid.get(a), norm2eid.get(b)
        if ea and eb:
            uf.union(ea, eb)
    # winner of each merged set: deterministic = heaviest member, tie → min id
    weight = rep.groupby("entity_id")["n_mentions"].sum().to_dict()
    name = dict(zip(rep["entity_id"], rep["canonical_name"]))
    groups: dict[str, list[str]] = {}
    for eid in set(norm2eid.values()):
        groups.setdefault(uf.find(eid), []).append(eid)
    remap: dict[str, tuple[str, str]] = {}
    for members in groups.values():
        if len(members) < 2:
            continue
        winner = sorted(members, key=lambda e: (-weight.get(e, 0), e))[0]
        new_eid = rules.stable_id("ent*", *sorted(members))
        for e in members:
            remap[e] = (new_eid, name[winner])
    if not remap:
        return mapping_ds
    remap_ref = ray.put(remap)

    class Remap:
        def __init__(self):
            self.remap = ray.get(remap_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            eids = t["entity_id"].to_pylist()
            names = t["canonical_name"].to_pylist()
            for i, e in enumerate(eids):
                if e in self.remap:
                    eids[i], names[i] = self.remap[e]
            t = t.set_column(t.schema.get_field_index("entity_id"), "entity_id",
                             pa.array(eids, pa.string()))
            return t.set_column(t.schema.get_field_index("canonical_name"),
                                "canonical_name", pa.array(names, pa.string()))

    return mapping_ds.map_batches(Remap, batch_format="pyarrow", concurrency=2)
