"""The flagship pipeline: transcripts → knowledge graph (nodes/, edges/).

Ray-Data recast of the reference's Source → Embedder → Storage topology
(internal/app/pipeline/pipeline.go:69-103 — bounded channels between one
consume goroutine, N embed workers, one store goroutine). The streaming
executor replaces the hand-rolled channels (backpressure for free); the
embed worker pool becomes a map_batches actor pool; the store batcher
becomes write_parquet block coalescing.

Dataflow (each → is a streaming stage; ONE scan of the 100 TB input):

  read_parquet(conv_id, turn_idx, text)           # column-pruned read
    → filter_nonempty_text                        # admission rule (S3/T2)
    → extract_batch                               # mentions+triples, 1 pass
    → write extracted/ (narrow intermediate)      # branch point + resume unit
  extracted → mentions → dedup(mention_id) → HashingEncoder pool → mentions/
  extracted(dedup'd mentions) → canonicalize (partial-agg + groupby) → mapping
  mapping → ray.put broadcast index
  extracted → triples → dedup(row_id) → EntityLinker pool → triples/
  linked → partial_edges combiner → groupby → edges/
  mapping ∪ degree-partials → groupby(entity_id) → nodes/

Scale notes: the only all-to-all exchanges are over (a) the extracted
intermediate (≪ input), (b) pre-combined partial aggregates. The embedding
column exists only on the mentions output path and never enters a shuffle
(SURVEY.md §7 hard parts — wide rows).
"""

from __future__ import annotations

import os

import ray
import ray.data as rd

from ..functions.dedup_exact import dedup_exact
from ..stages import canonicalize, materialize
from ..stages.encode import HashingEncoder
from ..stages.extract import (
    extract_batch,
    filter_nonempty_text,
    mentions_table,
    triples_table,
)
from ..stages.link import EntityLinker, build_link_index


def run_kg(
    transcripts,
    out_dir: str | None = None,
    dim: int = 64,
    batch_size: int = 4096,
    encoder_concurrency: int = 4,
    linker_concurrency: int = 4,
    write_outputs: bool = True,
) -> dict:
    """Run the full KG-construction pipeline.

    transcripts: parquet path/dir or a ray.data.Dataset.
    Returns dict with Datasets: mentions, triples (linked), nodes, edges,
    mapping — plus output paths when written.
    """
    # an actor pool that reserves every CPU starves the task-pool stages
    # feeding it (ray_guide: "a pool that reserves every CPU … serializes");
    # cap each pool so ≥2 CPUs stay free for reads/extraction/writes
    total_cpus = int(ray.cluster_resources().get("CPU", 4))
    encoder_concurrency = max(1, min(encoder_concurrency, total_cpus - 2))
    linker_concurrency = max(1, min(linker_concurrency, total_cpus - 2))

    if isinstance(transcripts, str):
        ds = rd.read_parquet(transcripts, columns=["conv_id", "turn_idx", "text"])
    else:
        ds = transcripts.select_columns(["conv_id", "turn_idx", "text"])

    extracted = ds.map_batches(
        filter_nonempty_text, batch_format="pyarrow", batch_size=batch_size
    ).map_batches(extract_batch, batch_format="pyarrow", batch_size=batch_size)

    # Branch point: persist the narrow intermediate once (resume unit) —
    # avoids re-scanning the full input for the mention and triple branches.
    if out_dir and write_outputs:
        ext_path = os.path.join(out_dir, "extracted")
        extracted.write_parquet(ext_path)
        extracted = rd.read_parquet(ext_path)
    else:
        extracted = extracted.materialize()  # test scale only

    # --- mention branch -> canonicalization ------------------------------
    # dedup once, pin the (narrow, no-embedding) result: it feeds BOTH the
    # canonicalization groupby and the encoder. (The partitioned runner
    # (pipelines/resume.py) writes this to parquet instead — use that path
    # when the mention table exceeds object-store memory.)
    mentions = extracted.map_batches(mentions_table, batch_format="pyarrow")
    mentions = dedup_exact(mentions, ["mention_id"]).materialize()

    # mapping is small (one row per distinct surface form) and consumed by
    # three downstreams (broadcast index, nodes, optional write) → pin it.
    mapping = canonicalize.build_mapping(mentions).materialize()
    mapping_df = mapping.to_pandas()  # entity table: small vs corpus; shard at >=1e8 entities
    if "surface_norm" not in mapping_df.columns:  # zero-mention corpus
        import pandas as pd

        mapping_df = pd.DataFrame(
            columns=["surface_norm", "entity_id", "canonical_name"]
        )
    index_ref = ray.put(build_link_index(mapping_df, dim=dim))

    mentions_emb = mentions.map_batches(
        HashingEncoder,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=encoder_concurrency,
    )

    # --- triple branch -> linking -> edges -------------------------------
    triples = extracted.map_batches(triples_table, batch_format="pyarrow")
    triples = dedup_exact(triples, ["row_id"])
    linked = triples.map_batches(
        EntityLinker,
        fn_constructor_kwargs={"index_ref": index_ref, "dim": dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=linker_concurrency,
    )
    # linked feeds BOTH the triples output and edge aggregation → pin it
    # (write+read-back when a sink dir exists, else object store).
    if out_dir and write_outputs:
        tr_path = os.path.join(out_dir, "triples")
        linked.write_parquet(tr_path)
        linked = rd.read_parquet(tr_path)
    else:
        linked = linked.materialize()

    # edges is consumed twice (edge table + degree computation) → pin the
    # (small, pre-aggregated) result instead of re-running the linker branch
    edges = materialize.edges_from_linked(linked).materialize()
    edges_out = edges.map_batches(materialize.prov_to_struct, batch_format="pyarrow")

    # --- nodes + degree (join-free: union + one groupby) ------------------
    degree_partials = edges.map_batches(
        materialize.partial_degrees, batch_format="pyarrow"
    )
    nodes = materialize.nodes_with_degree(mapping, degree_partials)

    result: dict = {
        "mentions": mentions_emb,
        "triples": linked,
        "edges": edges_out,
        "nodes": nodes,
        "mapping": mapping,
    }

    if out_dir and write_outputs:
        paths = {"triples": os.path.join(out_dir, "triples")}
        for name in ("mentions", "edges", "nodes"):
            p = os.path.join(out_dir, name)
            result[name].write_parquet(p)
            paths[name] = p
            result[name] = rd.read_parquet(p)
        result["paths"] = paths
    return result

