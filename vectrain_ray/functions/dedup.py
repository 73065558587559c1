"""Near-duplicate detection suite: MinHash+LSH, SimHash, n-gram Jaccard.

The canonical Ray-Data shape (ray_guide "Aggregation at scale"):
shingle+minhash per batch → explode to (band_id, band_hash, id) rows →
groupby(band) → candidate pairs → exact-verify → connected components.
Union-find runs driver-side over the *verified* pair list only (small by
construction); the full corpus never leaves the cluster.

Everything is seeded/deterministic: permutation parameters derive from a
fixed seed, shingle hashes use crc32 (process-stable), pair emission caps
are deterministic (sorted ids) and surfaced via a 'truncated' flag rather
than silently dropped.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.unionfind import UnionFind
from .dedup_exact import dedup_exact  # re-export  # noqa: F401

_MERSENNE = (1 << 61) - 1


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """crc32 hashes of the k-char shingles of lowercase text (unique)."""
    t = (text or "").lower()
    if len(t) < k:
        return np.array([zlib.crc32(t.encode())], dtype=np.uint64) if t else \
            np.array([], dtype=np.uint64)
    hs = {zlib.crc32(t[i : i + k].encode()) for i in range(len(t) - k + 1)}
    return np.fromiter(hs, dtype=np.uint64, count=len(hs))


def _perm_params(num_perm: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(num_perm,) uint64 signature: min over shingles of (a*x+b) mod p."""
    if len(shingles) == 0:
        return np.full(len(a), _MERSENNE, dtype=np.uint64)
    # (num_perm, n_shingles) — batch sizes keep this small
    vals = (a[:, None] * shingles[None, :] + b[:, None]) % _MERSENNE
    return vals.min(axis=1)


class MinHashBander:
    """map_batches actor: text → minhash signature → one row per LSH band:
    (id, band_id, band_hash). Permutation params built once per actor."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                 seed: int = 42, id_col: str = "doc_id", text_col: str = "text"):
        assert num_perm % bands == 0
        self.a, self.b = _perm_params(num_perm, seed)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = shingle_k
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        o_id, o_band, o_hash = [], [], []
        for i, t in zip(ids, texts):
            sig = minhash_signature(char_shingles(t, self.k), self.a, self.b)
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                o_id.append(i)
                o_band.append(band)
                o_hash.append(int(zlib.crc32(chunk.tobytes())))
        return pa.table(
            {
                self.id_col: pa.array(o_id),
                "band_id": pa.array(o_band, pa.int32()),
                "band_hash": pa.array(o_hash, pa.int64()),
            }
        )


def _pairs_from_coarse_bucket_factory(id_col: str, max_bucket: int):
    """One COARSE bucket (many (band_id, band_hash) groups) → pairs, fully
    vectorized: per-group id lists capped, then a self-merge on the band key
    emits all within-group pairs with id_a < id_b (no per-group Python)."""

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        keys = ["band_id", "band_hash"]
        g = g.drop_duplicates(subset=keys + [id_col]).sort_values(
            keys + [id_col], kind="stable"
        )
        # cap each band group deterministically; surface the truncation
        g["__rank"] = g.groupby(keys).cumcount()
        truncated_groups = set(
            map(tuple, g.loc[g["__rank"] >= max_bucket, keys].drop_duplicates()
                .itertuples(index=False))
        )
        g = g[g["__rank"] < max_bucket]
        m = g[keys + [id_col]].merge(g[keys + [id_col]], on=keys,
                                     suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        out = pd.DataFrame(
            {"id_a": m[f"{id_col}_a"].values, "id_b": m[f"{id_col}_b"].values}
        )
        if truncated_groups:
            trunc = m[keys].apply(tuple, axis=1).isin(truncated_groups).values
        else:
            trunc = False
        out["truncated"] = trunc
        return out.drop_duplicates(subset=["id_a", "id_b"])

    return pairs_in_bucket


def minhash_candidate_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                            num_perm: int = 64, bands: int = 8,
                            shingle_k: int = 5, seed: int = 42,
                            max_bucket: int = 200, concurrency: int = 2,
                            num_coarse: int = 32):
    """documents → candidate near-dup pairs (id_a < id_b), deduplicated.
    Shuffles on a coarse hash of (band_id, band_hash) — one Python call per
    coarse bucket, vectorized self-merge pair generation inside."""
    banded = ds.map_batches(
        MinHashBander,
        fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands,
                                   shingle_k=shingle_k, seed=seed,
                                   id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=concurrency,
    )

    def add_coarse(df: pd.DataFrame) -> pd.DataFrame:
        from .dedup_exact import key_buckets

        df["coarse"] = key_buckets(df, ["band_id", "band_hash"], num_coarse)
        return df

    pairs = banded.map_batches(add_coarse, batch_format="pandas").groupby(
        "coarse"
    ).map_groups(
        _pairs_from_coarse_bucket_factory(id_col, max_bucket),
        batch_format="pandas",
    )
    # same pair can surface from several bands → exact-dedup on (id_a, id_b)
    return dedup_exact(pairs, ["id_a", "id_b"])


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact k-char-shingle Jaccard similarity — the verifier metric."""
    sa, sb = set(char_shingles(a, k).tolist()), set(char_shingles(b, k).tolist())
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


class JaccardVerifier:
    """map_batches actor over candidate pairs: exact Jaccard via a broadcast
    id→text lookup (ray.put once). Shingle sets are memoized per doc in the
    actor (a doc typically appears in many candidate pairs). Scale path at
    ≥10^9 docs: replace the broadcast with a bucketed self-join on id ranges."""

    def __init__(self, texts_ref, k: int = 5, threshold: float = 0.8):
        import ray

        self.texts = ray.get(texts_ref)
        self.k, self.threshold = k, threshold
        self._shingles: dict = {}

    def _sh(self, doc_id) -> set:
        s = self._shingles.get(doc_id)
        if s is None:
            s = set(char_shingles(self.texts.get(doc_id, ""), self.k).tolist())
            self._shingles[doc_id] = s
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        ia, ib = batch["id_a"].to_pylist(), batch["id_b"].to_pylist()
        sims = []
        for x, y in zip(ia, ib):
            sa, sb = self._sh(x), self._sh(y)
            if not sa and not sb:
                sims.append(1.0)
            elif not sa or not sb:
                sims.append(0.0)
            else:
                sims.append(len(sa & sb) / len(sa | sb))
        batch = batch.append_column(
            "jaccard", pa.array([round(s, 4) for s in sims], pa.float64())
        )
        import pyarrow.compute as pc

        return batch.filter(pc.greater_equal(batch["jaccard"], self.threshold))


def cluster_pairs(pairs_rows, id_col_a: str = "id_a", id_col_b: str = "id_b"):
    """Verified pairs (small, driver-side list of dicts) → {id: cluster_id}
    via union-find; cluster_id = min member id (deterministic)."""
    uf = UnionFind()
    for r in pairs_rows:
        uf.union(r[id_col_a], r[id_col_b])
    out = {}
    for root, members in uf.groups().items():
        cid = min(members)
        for m in members:
            out[m] = cid
    return out


def dedup_minhash(ds, id_col: str = "doc_id", text_col: str = "text",
                  threshold: float = 0.8, num_perm: int = 64, bands: int = 8,
                  shingle_k: int = 5, concurrency: int = 2):
    """Full MinHash near-dedup: → Dataset (id, cluster_id, is_keeper).

    Docs in no near-dup cluster are their own keeper. The verified-pair list
    and the id→cluster dict are the only driver-side materializations.
    """
    import ray

    texts = {}
    for b in ds.select_columns([id_col, text_col]).iter_batches(
        batch_size=8192, batch_format="pyarrow"
    ):
        texts.update(zip(b[id_col].to_pylist(), b[text_col].to_pylist()))
    texts_ref = ray.put(texts)

    cands = minhash_candidate_pairs(
        ds, id_col=id_col, text_col=text_col, num_perm=num_perm, bands=bands,
        shingle_k=shingle_k, concurrency=concurrency,
    )
    verified = cands.map_batches(
        JaccardVerifier,
        fn_constructor_kwargs={"texts_ref": texts_ref, "k": shingle_k,
                               "threshold": threshold},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    clusters = cluster_pairs(verified.take_all())
    clusters_ref = ray.put(clusters)

    class AssignCluster:
        def __init__(self):
            self.clusters = ray.get(clusters_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t[id_col].to_pylist()
            cids = [self.clusters.get(i, i) for i in ids]
            t = t.append_column("cluster_id", pa.array(cids))
            keep = [c == i for i, c in zip(ids, cids)]
            return t.append_column("is_keeper", pa.array(keep, pa.bool_()))

    return ds.select_columns([id_col]).map_batches(
        AssignCluster, batch_format="pyarrow", concurrency=2
    )


# --- SimHash ---------------------------------------------------------------
def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (crc32-doubled per token)."""
    votes = [0] * 64
    for tok in (text or "").lower().split():
        h = zlib.crc32(tok.encode()) | (zlib.crc32(tok[::-1].encode()) << 32)
        for i in range(64):
            votes[i] += 1 if (h >> i) & 1 else -1
    out = 0
    for i in range(64):
        if votes[i] > 0:
            out |= 1 << i
    return out


class SimHasher:
    """map_batches fn: adds simhash (int64, reinterpreted) + 4×16-bit band
    columns for blocking."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = [simhash64(t) for t in batch[self.text_col].to_pylist()]
        batch = batch.append_column(
            "simhash", pa.array([h - (1 << 64) if h >= (1 << 63) else h for h in hs],
                                pa.int64())
        )
        for band in range(4):
            vals = [(h >> (16 * band)) & 0xFFFF for h in hs]
            batch = batch.append_column(f"sh_band{band}",
                                        pa.array(vals, pa.int32()))
        return batch


def hamming64(a: int, b: int) -> int:
    return bin((a & 0xFFFFFFFFFFFFFFFF) ^ (b & 0xFFFFFFFFFFFFFFFF)).count("1")


def simhash_candidate_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                            max_hamming: int = 3, max_bucket: int = 200):
    """SimHash blocking: docs sharing any 16-bit band → candidate pair,
    verified by exact Hamming distance ≤ max_hamming."""
    hashed = ds.map_batches(SimHasher(text_col=text_col), batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col).head(max_bucket)
        ids = list(g[id_col])
        sh = list(g["simhash"])
        oa, ob, dist = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = hamming64(sh[i], sh[j])
                if d <= max_hamming:
                    oa.append(ids[i])
                    ob.append(ids[j])
                    dist.append(d)
        return pd.DataFrame({"id_a": oa, "id_b": ob, "hamming": dist})

    out = []
    for band in range(4):
        out.append(
            hashed.select_columns([id_col, "simhash", f"sh_band{band}"])
            .groupby(f"sh_band{band}")
            .map_groups(pairs, batch_format="pandas")
        )
    allp = out[0].union(*out[1:])
    return dedup_exact(allp, ["id_a", "id_b"])
