"""Multimodal (image/audio/video) column handling.

Payloads are opaque ``binary`` columns with typed metadata travelling beside
them; decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages. The actual codec work is STUBBED (no image/audio
libraries in this container): each actor exposes

  * ``fake=True``  — deterministic stand-in decode (bytes → seeded feature
    tensor) so the Ray-side plumbing (schema, batch size, actor signature,
    fixed-size-list output layout, small-batch memory behavior) is REAL and
    tested;
  * ``fake=False`` — raises NotImplementedError("requires Pillow/librosa…")
    at the decode call site, exactly where a real codec would plug in.

Large binary rows: run these stages with SMALL batch_size (64–256) and let
block splitting handle memory — see ray_guide "Memory-aware" pitfalls.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),  # -1 when unknown/not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def make_fake_media_table(n: int, kind: str = "image", seed: int = 7) -> pa.Table:
    """Deterministic fake media rows for tests/benchmarks (payload = seeded
    pseudo-random bytes; NO external data)."""
    rng = np.random.RandomState(seed)
    payloads = [rng.bytes(256 + int(rng.randint(0, 512))) for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array([f"{kind}-{i:06d}" for i in range(n)]),
            "kind": pa.array([kind] * n),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array([f"{kind}/fake"] * n),
            "width": pa.array([64] * n, pa.int32()),
            "height": pa.array([64] * n, pa.int32()),
            "duration_ms": pa.array([0 if kind == "image" else 1000] * n, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def _bytes_to_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake 'decode': payload bytes → unit-norm float32 vector
    (seeded from the payload digest, so identical bytes ⇒ identical features
    across actors/runs)."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=4).digest(), "big")
    rng = np.random.RandomState(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    return v / max(np.linalg.norm(v), 1e-30)


class ImageDecoder:
    """Actor-pool stage: payload → decoded feature tensor (fixed_size_list).

    Real path would be: PIL.Image.open(BytesIO(payload)) → resize →
    np.asarray — one batch at a time, batch_size small (binary rows are
    wide). Stub keeps the exact same signature/schema."""

    def __init__(self, dim: int = 128, fake: bool = True):
        self.dim = dim
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "real image decode requires Pillow (not in this container); "
                "construct with fake=True for the deterministic stand-in"
            )
        feats = np.stack(
            [_bytes_to_features(p, self.dim)
             for p in batch["payload"].to_pylist()]
        )
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), pa.float32()), self.dim
        )
        out = batch.drop_columns(["payload"])  # drop wide bytes ASAP
        return out.append_column("features", arr)


class AudioFeaturizer:
    """Actor-pool stage: audio payload → frame-level features, one row per
    frame (flat output — list lengths vary per clip)."""

    def __init__(self, frame_ms: int = 250, dim: int = 32, fake: bool = True):
        self.frame_ms, self.dim, self.fake = frame_ms, dim, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "real audio decode requires librosa/soundfile; use fake=True"
            )
        ids, frames, feats = [], [], []
        for mid, payload, dur in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            n_frames = max(1, (dur or 0) // self.frame_ms)
            for f in range(n_frames):
                ids.append(mid)
                frames.append(f)
                feats.append(_bytes_to_features(payload + f.to_bytes(4, "big"),
                                                self.dim))
        mat = np.stack(feats) if feats else np.zeros((0, self.dim), np.float32)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1), pa.float32()), self.dim
        )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(frames, pa.int32()),
                "features": arr,
            }
        )


class VideoFrameSampler:
    """Actor-pool stage: sample every Nth frame deterministically; emits
    (media_id, frame_idx, frame_payload_hash) — the plumbing for a real
    frame extractor (ffmpeg) with identical row layout."""

    def __init__(self, every_ms: int = 500, fake: bool = True):
        self.every_ms, self.fake = every_ms, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("real frame sampling requires ffmpeg")
        ids, frames, hashes = [], [], []
        for mid, payload, dur in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            for i, _t in enumerate(range(0, max(dur or 0, 1), self.every_ms)):
                ids.append(mid)
                frames.append(i)
                hashes.append(zlib.crc32(payload + i.to_bytes(4, "big")))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(frames, pa.int32()),
                "frame_hash": pa.array(hashes, pa.int64()),
            }
        )
