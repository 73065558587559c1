"""Source connectors — the reference's pluggable source surface (S1–S6,
internal/app/factory/factory.go:13-39) recast as a reader registry over
Ray Data's native readers.

The reference's Kafka partition-consumption from OffsetBeginning
(kafka/client.go:49-92) maps to a full partitioned-parquet scan; its
"resume offsets" role is played by the per-partition manifests
(state/manifest.py). JSON wire ingestion (T1: fetch_messages.go:33-34)
maps to read_json with schema enforcement.
"""

from __future__ import annotations

import ray.data as rd

from ..schema import TRANSCRIPT_SCHEMA


def _strip_meta(t):
    # pandas-written parquet carries a b'pandas' schema-metadata blob;
    # metadata-bearing schemas are unhashable, which spams every downstream
    # shuffle with Ray's "Failed to hash the schemas" worker warning and
    # defeats unify_schemas' early exit. O(1) zero-copy, fused into the read.
    return t.replace_schema_metadata(None)


def read_transcripts(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """Column-pruned partitioned-parquet transcript read (S1/S2)."""
    return rd.read_parquet(path, columns=columns).map_batches(
        _strip_meta, batch_format="pyarrow")


def read_wire_entities_json(path: str) -> rd.Dataset:
    """JSON-lines wire records (the reference's Kafka/HTTP Entity payloads,
    pkg/types/entity.go:3-11) — schema enforced downstream by
    normalize_wire_entities."""
    return rd.read_json(path)


def read_wire_entities_parquet(path: str) -> rd.Dataset:
    return rd.read_parquet(path)


READERS = {
    "parquet": read_transcripts,
    "json": read_wire_entities_json,
}


def get_reader(kind: str):
    """Open registry — the factory surface (factory.go:13-39); unknown kinds
    raise just like the reference's default case (factory.go:20-22)."""
    try:
        return READERS[kind]
    except KeyError:
        raise ValueError(f"unknown source type: {kind!r} "
                         f"(have {sorted(READERS)})") from None


__all__ = ["read_transcripts", "read_wire_entities_json",
           "read_wire_entities_parquet", "get_reader", "TRANSCRIPT_SCHEMA"]
