"""Stage 5 — graph materialization: deduplicated node/edge tables.

Replaces the reference's Qdrant upsert sink (W1/W2,
internal/app/storages/qdrant/store.go:13-51 + the rebatcher
pipeline.go:182-221) with idempotent Parquet tables:

  * edge identity is (src_id, pred, dst_id) — weights aggregate with the
    partial+final pattern (combiner in map_batches → small groupby), so the
    all-to-all exchange moves pre-collapsed rows, not one row per triple;
  * provenance (conv_id, turn_idx) is carried as a capped, deterministic
    sample (first PROV_CAP in (conv_id, turn_idx) order);
  * every id is a stable hash → re-running writes byte-identical tables
    (the reference's TODO qdrant/store.go:45).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

PROV_CAP = 20


def partial_edges(batch: pa.Table) -> pa.Table:
    """Combiner: linked-triples batch → ≤1 row per (src_id, dst_id, pred)
    with partial weight + provenance sample ("conv|turn" strings)."""
    df = batch.select(["subj_id", "obj_id", "pred", "conv_id", "turn_idx"]).to_pandas()
    df["prov"] = df["conv_id"] + "|" + df["turn_idx"].astype(str)
    g = df.groupby(["subj_id", "obj_id", "pred"], sort=False)
    out = g.agg(
        weight=("prov", "size"),
        prov=("prov", lambda s: sorted(s)[:PROV_CAP]),
    ).reset_index()
    out = out.rename(columns={"subj_id": "src_id", "obj_id": "dst_id"})
    return pa.table(
        {
            "src_id": pa.array(out["src_id"], pa.string()),
            "dst_id": pa.array(out["dst_id"], pa.string()),
            "pred": pa.array(out["pred"], pa.string()),
            "weight": pa.array(out["weight"], pa.int64()),
            "prov": pa.array(out["prov"], pa.list_(pa.string())),
        }
    )


def _prov_sort_key(p: str):
    conv, turn = p.rsplit("|", 1)
    return (conv, int(turn))


def finalize_edge_group(g: pd.DataFrame) -> pd.DataFrame:
    """Final aggregate for one (src_id, dst_id, pred): sum weights, merge +
    cap provenance deterministically."""
    prov: list[str] = []
    for lst in g["prov"]:
        prov.extend(lst)
    prov = sorted(set(prov), key=_prov_sort_key)[:PROV_CAP]
    return pd.DataFrame(
        {
            "src_id": [g["src_id"].iloc[0]],
            "dst_id": [g["dst_id"].iloc[0]],
            "pred": [g["pred"].iloc[0]],
            "weight": [int(g["weight"].sum())],
            "prov": [prov],
        }
    )


def edges_from_linked(linked_ds):
    """linked triples Dataset → edges Dataset (prov as "conv|turn" strings;
    promote to list<struct> at the final write projection)."""
    partials = linked_ds.map_batches(
        partial_edges, batch_format="pyarrow", batch_size=16384
    )
    return partials.groupby(["src_id", "dst_id", "pred"]).map_groups(
        finalize_edge_group, batch_format="pandas"
    )


def prov_to_struct(batch: pa.Table) -> pa.Table:
    """prov list<string "conv|turn"> → provenance list<struct<conv_id,turn_idx>>."""
    prov = batch["prov"].to_pylist()
    structs = [
        [
            {"conv_id": p.rsplit("|", 1)[0], "turn_idx": int(p.rsplit("|", 1)[1])}
            for p in (lst or [])
        ]
        for lst in prov
    ]
    arr = pa.array(
        structs,
        pa.list_(pa.struct([("conv_id", pa.string()), ("turn_idx", pa.int32())])),
    )
    batch = batch.drop_columns(["prov"])
    return batch.append_column("provenance", arr)


def partial_degrees(batch: pa.Table) -> pa.Table:
    """Combiner for node degree: edges batch → (entity_id, partial degree)."""
    ids = pa.concat_arrays(
        [batch["src_id"].combine_chunks(), batch["dst_id"].combine_chunks()]
    )
    t = pa.table({"entity_id": ids}).group_by("entity_id").aggregate(
        [("entity_id", "count")]
    )
    return t.rename_columns(["entity_id", "degree"])


def unpack_aliases(batch: pa.Table) -> pa.Table:
    """aliases_packed string → aliases list<string> (post-join projection)."""
    packed = batch["aliases_packed"].to_pylist()
    lists = [(p.split("\x1f") if p else []) for p in packed]
    batch = batch.drop_columns(["aliases_packed"])
    return batch.append_column("aliases", pa.array(lists, pa.list_(pa.string())))


_NODE_UNION_COLS = ["entity_id", "surface_norm", "canonical_name",
                    "n_mentions", "aliases_packed", "degree"]


def _mapping_row_for_union(batch: pa.Table) -> pa.Table:
    """mapping rows → node-union schema (degree null)."""
    n = batch.num_rows
    aliases = batch["aliases"].to_pylist()
    return pa.table(
        {
            "entity_id": batch["entity_id"],
            "surface_norm": batch["surface_norm"],
            "canonical_name": batch["canonical_name"],
            "n_mentions": pc.cast(batch["n_mentions"], pa.int64()),
            "aliases_packed": pa.array(
                ["\x1f".join(a or []) for a in aliases], pa.string()
            ),
            "degree": pa.nulls(n, pa.int64()),
        }
    )


def _degree_row_for_union(batch: pa.Table) -> pa.Table:
    """(entity_id, degree) partial rows → node-union schema."""
    n = batch.num_rows
    return pa.table(
        {
            "entity_id": batch["entity_id"],
            "surface_norm": pa.nulls(n, pa.string()),
            "canonical_name": pa.nulls(n, pa.string()),
            "n_mentions": pa.nulls(n, pa.int64()),
            "aliases_packed": pa.nulls(n, pa.string()),
            "degree": pc.cast(batch["degree"], pa.int64()),
        }
    )


def _merge_node_union_group(g: pd.DataFrame) -> pd.DataFrame:
    """One entity_id: mapping rows (canonical/alias info) + degree rows."""
    m = g[g["canonical_name"].notna()]
    deg = int(g["degree"].fillna(0).sum())
    if m.empty:  # degree row for an entity absent from mapping (shouldn't happen)
        return pd.DataFrame()
    heaviest = m.sort_values(["n_mentions", "surface_norm"],
                             ascending=[False, True], kind="stable").iloc[0]
    aliases: set[str] = set()
    for p in m["aliases_packed"]:
        if p:
            aliases.update(p.split("\x1f"))
    return pd.DataFrame(
        {
            "entity_id": [g["entity_id"].iloc[0]],
            "canonical_name": [heaviest["canonical_name"]],
            "aliases": [sorted(aliases)],
            "n_mentions": [int(m["n_mentions"].sum())],
            "degree": [deg],
        }
    )


def nodes_with_degree(mapping_ds, degree_partials_ds):
    """nodes table = mapping ∪ degree-partials → one groupby(entity_id).

    Join-free: both inputs are pre-aggregated/narrow, the union is cheap, and
    a single hash-partitioned groupby merges them — no pyarrow-join payload
    type limits, robust to empty inputs, one all-to-all over small data.
    """
    left = mapping_ds.map_batches(_mapping_row_for_union, batch_format="pyarrow")
    right = degree_partials_ds.map_batches(_degree_row_for_union, batch_format="pyarrow")
    return left.union(right).groupby("entity_id").map_groups(
        _merge_node_union_group, batch_format="pandas"
    )


