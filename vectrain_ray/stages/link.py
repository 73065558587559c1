"""Stage 4 — entity linking (stateful actor pool, broadcast index).

Recast of the reference's per-record Qdrant similarity store (write-only ANN,
internal/app/storages/qdrant/store.go) into an actual *lookup* stage: each
actor holds the entity index — built ONCE in ``__init__`` from objects
broadcast with ``ray.put`` — and links a whole Arrow batch per call.

Index = (a) exact dict surface_norm → (entity_id, canonical_name) and
(b) a dense matrix of entity-name embeddings for fuzzy fallback: misses are
encoded with the same deterministic HashingEncoder and matched brute-force
cosine top-1 (numpy matmul per batch of *misses only*). This is the
broadcast-small-side join analogue — no shuffle. At ≥10^8 entities, shard
the dict/matrix by crc_bucket(norm, K) with one actor pool per shard
(partitioning assumption; SURVEY.md §7 step 5).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import rules
from .encode import encode_texts


def build_link_index(mapping_df, dim: int = 64):
    """mapping (pandas: surface_norm, entity_id, canonical_name) →
    (norm2ent dict, names list, L2-normalized name matrix). Driver-side;
    result objects go into ``ray.put`` once."""
    norm2ent = {
        n: (e, c)
        for n, e, c in zip(
            mapping_df["surface_norm"], mapping_df["entity_id"],
            mapping_df["canonical_name"],
        )
    }
    norms = list(mapping_df["surface_norm"])
    mat = encode_texts(norms, dim=dim) if norms else np.zeros((0, dim), np.float32)
    return norm2ent, norms, mat


class EntityLinker:
    """map_batches actor: adds ``<col>_id`` for each configured surface col."""

    def __init__(self, index_ref, cols=("subj", "obj"), dim: int = 64,
                 fuzzy_threshold: float = 0.85):
        import ray

        self.norm2ent, self.norms, self.mat = ray.get(index_ref)
        self.cols = cols
        self.dim = dim
        self.threshold = fuzzy_threshold

    def _link_values(self, values: list) -> tuple[list, list]:
        """surfaces → (entity_ids, canonical_names); dict hit, else fuzzy
        top-1 cosine, else deterministic new id from the merge key."""
        eids: list = [None] * len(values)
        names: list = [None] * len(values)
        miss_idx: list[int] = []
        miss_norm: list[str] = []
        for i, v in enumerate(values):
            if v is None:
                continue
            norm = rules.normalize_surface(v)
            hit = self.norm2ent.get(norm)
            if hit is not None:
                eids[i], names[i] = hit
            else:
                miss_idx.append(i)
                miss_norm.append(norm)
        if miss_idx and len(self.norms):
            q = encode_texts(miss_norm, dim=self.dim)  # (m, d), normalized
            sims = q @ self.mat.T  # cosine: both sides unit
            best = np.argmax(sims, axis=1)
            for j, i in enumerate(miss_idx):
                if sims[j, best[j]] >= self.threshold:
                    eids[i], names[i] = self.norm2ent[self.norms[best[j]]]
                else:
                    key = rules.canonical_merge_key(miss_norm[j])
                    eids[i] = rules.stable_id("ent", key)
                    names[i] = values[i]
        elif miss_idx:
            for j, i in enumerate(miss_idx):
                key = rules.canonical_merge_key(miss_norm[j])
                eids[i] = rules.stable_id("ent", key)
                names[i] = values[i]
        return eids, names

    def __call__(self, batch: pa.Table) -> pa.Table:
        for col in self.cols:
            # link each DISTINCT surface once per batch, then fan back out
            vals = batch[col].to_pylist()
            uniq = sorted({v for v in vals if v is not None})
            eids_u, _ = self._link_values(uniq)
            lut = dict(zip(uniq, eids_u))
            batch = batch.append_column(
                f"{col}_id", pa.array([lut.get(v) for v in vals], pa.string())
            )
        return batch
