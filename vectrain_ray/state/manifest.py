"""Per-partition lineage manifests + exact resume (SURVEY.md §4).

The reference has NO checkpointing: a restart re-reads Kafka from
OffsetBeginning (kafka/client.go:77-80) and re-writes every point under a
fresh UUID (qdrant/store.go:32) → duplicates. Here:

  * the input is sharded by crc_bucket(conv_id, P) — a conversation never
    spans shards (the groupby-key invariant);
  * each shard's outputs are written to ``<out>/<table>/part=K/`` and a
    manifest JSON is committed LAST to ``<out>/_manifest/part-K.json``
    (write-tmp + atomic os.replace). Missing manifest ⇒ the shard is
    re-processed and its output directories overwritten — the kill-between
    -write-and-commit case therefore converges to the same bytes;
  * the manifest records the input fingerprint (shard file sizes), row
    counts and wall time — the per-partition lineage + metrics the north
    rule requires. A fingerprint mismatch on resume forces re-processing.
"""

from __future__ import annotations

import json
import os
import shutil
import time


def _fingerprint(paths: list[str]) -> str:
    """name:size:mtime_ns per input file — size alone would treat a file
    rewritten in place with identical byte length as unchanged and silently
    serve stale outputs on resume."""
    parts = []
    for p in sorted(paths):
        st = os.stat(p)
        parts.append(f"{os.path.basename(p)}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(parts)


class PartitionManifest:
    def __init__(self, out_dir: str):
        self.dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, part: int) -> str:
        return os.path.join(self.dir, f"part-{part:05d}.json")

    def is_done(self, part: int, input_paths: list[str]) -> bool:
        p = self._path(part)
        if not os.path.exists(p):
            return False
        try:
            rec = json.load(open(p))
        except (json.JSONDecodeError, OSError):
            return False  # torn manifest ⇒ not done
        return rec.get("input_fingerprint") == _fingerprint(input_paths)

    def commit(self, part: int, input_paths: list[str], metrics: dict) -> None:
        """Atomically commit AFTER the partition's outputs are durable."""
        rec = {
            "part": part,
            "input_fingerprint": _fingerprint(input_paths),
            "committed_at": time.time(),
            **metrics,
        }
        tmp = self._path(part) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._path(part))

    def load(self, part: int) -> dict | None:
        p = self._path(part)
        return json.load(open(p)) if os.path.exists(p) else None

    def invalidate(self, part: int) -> None:
        """Force re-processing of one partition (its outputs stay on disk
        until the re-run's clear_partition_outputs — crash-safe either way,
        since only the manifest gates doneness)."""
        try:
            os.remove(self._path(part))
        except FileNotFoundError:
            pass

    def completed_parts(self) -> list[int]:
        out = []
        for f in sorted(os.listdir(self.dir)):
            if f.startswith("part-") and f.endswith(".json"):
                out.append(int(f[5:-5]))
        return out


def clear_partition_outputs(out_dir: str, tables: list[str], part: int) -> None:
    """Remove any half-written output dirs for a shard before re-processing."""
    for t in tables:
        p = os.path.join(out_dir, t, f"part={part}")
        if os.path.exists(p):
            shutil.rmtree(p)


def partition_output_dir(out_dir: str, table: str, part: int) -> str:
    return os.path.join(out_dir, table, f"part={part}")
