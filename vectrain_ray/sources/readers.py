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

import glob
import os

import pyarrow as pa
import ray.data as rd

from ..schema import TRANSCRIPT_SCHEMA


def _stripped_schema(path: str, columns: list[str] | None):
    """Metadata-free schema from ONE footer: pandas-written parquet carries
    a b'pandas' schema-metadata blob; a schema with metadata is unhashable,
    which defeats Ray's unify_schemas early exit and spams every downstream
    shuffle with 'Failed to hash the schemas' worker warnings. Passing the
    stripped schema to read_parquet fixes it at the source at zero runtime
    cost (no extra operator, metadata-only count() stays a footer read)."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                                 recursive=True))
        if not files:
            return None
        # hive-partitioned layouts (key=value dirs) carry columns that are
        # NOT in any file footer; an explicit footer-only schema would
        # silently drop them — let Ray infer instead
        rel = os.path.relpath(files[0], path)
        if any("=" in part for part in rel.split(os.sep)[:-1]):
            return None
        path = files[0]
    sch = pq.read_schema(path).remove_metadata()
    if columns is not None:
        sch = pa.schema([sch.field(c) for c in columns])
    return sch


def read_transcripts(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """Column-pruned partitioned-parquet transcript read (S1/S2)."""
    return rd.read_parquet(path, columns=columns,
                           schema=_stripped_schema(path, columns))


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
