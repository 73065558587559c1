"""Multimodal (image/audio/video) column handling.

Payloads are opaque ``binary`` columns with typed metadata travelling beside
them; decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages. The actual codec work is STUBBED (no image/audio
libraries in this container): each actor exposes

  * ``fake=True``  — deterministic stand-in decode (bytes → seeded feature
    tensor) so the Ray-side plumbing (schema, batch size, actor signature,
    fixed-size-list output layout, small-batch memory behavior) is REAL and
    tested;
  * ``fake=False`` — the REAL decode path, import-guarded: uses Pillow /
    soundfile / ffmpeg when installed and raises NotImplementedError (from
    the ImportError) when not. The container this repo is tested in has
    none of them, so the real paths are exercised only where the libs
    exist; tests skip cleanly otherwise.

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

    Real path (``fake=False``): PIL.Image.open(BytesIO(payload)) → grayscale
    → resize to (dim, 1) → unit-norm pixel vector — import-guarded, one
    batch at a time, batch_size small (binary rows are wide). The fake path
    keeps the exact same signature/schema."""

    def __init__(self, dim: int = 128, fake: bool = True):
        self.dim = dim
        self.fake = fake
        if not fake:
            try:
                from PIL import Image  # noqa: F401 — load once per actor
            except ImportError as exc:
                raise NotImplementedError(
                    "real image decode requires Pillow (not installed); "
                    "construct with fake=True for the deterministic stand-in"
                ) from exc
            self._Image = Image

    def _decode_real(self, payload: bytes) -> np.ndarray:
        import io

        img = self._Image.open(io.BytesIO(payload)).convert("L")
        img = img.resize((self.dim, 1))
        v = np.asarray(img, dtype=np.float32).reshape(-1)[: self.dim]
        return v / max(np.linalg.norm(v), 1e-30)

    def __call__(self, batch: pa.Table) -> pa.Table:
        decode = (_bytes_to_features if self.fake
                  else lambda p, _d: self._decode_real(p))
        feats = np.stack(
            [decode(p, self.dim) for p in batch["payload"].to_pylist()]
        ) if batch.num_rows else np.zeros((0, self.dim), np.float32)
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
        if not fake:
            try:
                import soundfile  # noqa: F401 — load once per actor
            except ImportError as exc:
                raise NotImplementedError(
                    "real audio decode requires soundfile; use fake=True"
                ) from exc
            self._sf = soundfile

    def _frames_real(self, payload: bytes) -> np.ndarray:
        """Decode PCM, split into frame_ms windows, per-window energy
        histogram of dim bins (a real featurizer would swap in MFCCs)."""
        import io

        wav, sr = self._sf.read(io.BytesIO(payload), dtype="float32")
        if wav.ndim > 1:
            wav = wav.mean(axis=1)
        step = max(1, int(sr * self.frame_ms / 1000))
        n = max(1, len(wav) // step)
        out = np.zeros((n, self.dim), np.float32)
        for f in range(n):
            win = wav[f * step:(f + 1) * step]
            hist, _ = np.histogram(win, bins=self.dim, range=(-1.0, 1.0))
            v = hist.astype(np.float32)
            out[f] = v / max(np.linalg.norm(v), 1e-30)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            ids, frames, feats = [], [], []
            for mid, payload in zip(batch["media_id"].to_pylist(),
                                    batch["payload"].to_pylist()):
                fr = self._frames_real(payload)
                for f in range(len(fr)):
                    ids.append(mid)
                    frames.append(f)
                    feats.append(fr[f])
            mat = (np.stack(feats) if feats
                   else np.zeros((0, self.dim), np.float32))
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
        if not fake:
            import shutil

            if shutil.which("ffmpeg") is None:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg on PATH")

    def _frames_real(self, payload: bytes) -> list[int]:
        """ffmpeg: decode the container from stdin, emit one raw gray frame
        every ``every_ms``; returns crc32 of each frame's pixels (same row
        layout as the fake path)."""
        import subprocess

        proc = subprocess.run(
            ["ffmpeg", "-v", "error", "-i", "pipe:0",
             "-vf", f"fps=1000/{self.every_ms},format=gray",
             "-f", "rawvideo", "pipe:1"],
            input=payload, capture_output=True, check=True,
        )
        raw = proc.stdout
        # frame size unknown without probing; hash fixed 64 KiB strides as a
        # per-frame-ish fingerprint (deterministic, bounded)
        stride = 65536
        return [zlib.crc32(raw[i:i + stride])
                for i in range(0, max(len(raw), 1), stride)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            ids, frames, hashes = [], [], []
            for mid, payload in zip(batch["media_id"].to_pylist(),
                                    batch["payload"].to_pylist()):
                for i, h in enumerate(self._frames_real(payload)):
                    ids.append(mid)
                    frames.append(i)
                    hashes.append(h)
            return pa.table(
                {
                    "media_id": pa.array(ids, pa.string()),
                    "frame_idx": pa.array(frames, pa.int32()),
                    "frame_hash": pa.array(hashes, pa.int64()),
                }
            )
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
