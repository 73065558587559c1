"""Network vector-store sink — the reference's Qdrant writer (W1) as a
pluggable actor-pool stage with an injectable client.

Reference semantics mirrored (internal/app/storages/qdrant/store.go,
client.go):

  * ensure-collection: existence check + create with (size, distance)
    before the first upsert (checkCollection, store.go:92-114) — here done
    ONCE per writer actor in ``__init__`` (the reference re-checks per
    Store() call; once-per-actor is the same guarantee without an RPC per
    batch).
  * typed payload projection with zero values for missing/empty fields
    (getPayload, store.go:53-89; zeroValues client.go:17-22) — reuses
    ``sources.wire.typed_projection``, the same rule T4 kernel.
  * batched upsert (store.go:40-48) — one client call per Arrow batch.
  * DETERMINISTIC point ids from the business key, so re-running the
    pipeline overwrites points instead of duplicating them — fixing the
    reference's ``uuid.New()`` per point (store.go:32, TODO store.go:45,
    "check duplicates, because they will be overwritten").

Client protocol (duck-typed, injectable — the OllamaEncoder transport /
broker client pattern; production would wrap qdrant-client, pgvector, …)::

    client.collection_exists(name) -> bool
    client.create_collection(name, dim, distance) -> None
    client.upsert(collection, ids: list[str],
                  vectors: list[list[float]], payloads: list[dict]) -> None

``InMemoryVectorStore`` is a process-shared reference implementation (a
named detached-scope Ray actor), used by tests and usable as a local sink.

Scale notes: the writer is a ``map_batches`` ACTOR pool (client built once
per actor, not per batch); the embedding column flows straight from the
encode stage to the sink without entering any shuffle; upserts are
idempotent by id so Ray task retries are safe (exactly-once effect).
"""

from __future__ import annotations

import pyarrow as pa

from .. import rules
from ..sources.wire import typed_projection


class VectorStoreWriter:
    """Actor-pool sink stage: (id cols, embedding, payload cols) → upsert.

    Emits a tiny per-batch summary table (collection, n_upserted) so the
    consuming Dataset materializes counts, never the vectors."""

    def __init__(self, client_factory, collection: str, dim: int,
                 payload_fields: dict[str, str] | None = None,
                 distance: str = "cosine",
                 vector_col: str = "embedding",
                 id_cols: tuple[str, ...] = ("entity_id",)):
        if distance not in ("cosine", "euclid", "dot"):
            # the reference's config validation (client.go:37)
            raise ValueError(f"unsupported distance {distance!r}")
        self.collection = collection
        self.dim = dim
        self.payload_fields = payload_fields or {}
        self.vector_col = vector_col
        self.id_cols = tuple(id_cols)
        self.client = client_factory()  # once per actor
        # ensure-collection (store.go:92-114). Pool actors race this check:
        # two actors can both see exists()==False, so a duplicate-create
        # from a real client (qdrant raises 409) is re-checked — create is
        # effectively create-if-missing regardless of client semantics.
        if not self.client.collection_exists(collection):
            try:
                self.client.create_collection(collection, dim, distance)
            except Exception:
                if not self.client.collection_exists(collection):
                    raise

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"collection": pa.array([], pa.string()),
                             "n_upserted": pa.array([], pa.int64())})
        # deterministic point ids (fixes TODO store.go:45)
        key_cols = [batch[c].to_pylist() for c in self.id_cols]
        ids = [rules.stable_id("pt", *vals) for vals in zip(*key_cols)]
        vectors = batch[self.vector_col].to_pylist()
        bad = next((i for i, v in enumerate(vectors)
                    if v is None or len(v) != self.dim), None)
        if bad is not None:
            raise ValueError(
                f"vector at row {bad} has dim "
                f"{None if vectors[bad] is None else len(vectors[bad])}, "
                f"collection expects {self.dim}")
        if self.payload_fields:
            payload_tbl = typed_projection(batch, self.payload_fields)
            payloads = payload_tbl.to_pylist()
        else:
            payloads = [{} for _ in ids]
        self.client.upsert(self.collection, ids, vectors, payloads)
        return pa.table({
            "collection": pa.array([self.collection], pa.string()),
            "n_upserted": pa.array([batch.num_rows], pa.int64()),
        })


def write_vectors(ds, client_factory, collection: str, dim: int,
                  payload_fields: dict[str, str] | None = None,
                  distance: str = "cosine", vector_col: str = "embedding",
                  id_cols: tuple[str, ...] = ("entity_id",),
                  concurrency: int = 4, batch_size: int = 1024) -> int:
    """Stream a Dataset into the store; returns total rows upserted.

    The batch size is the reference's storage rebatcher knob (W2) — size it
    so batch × dim × 4 bytes stays well under the actor heap."""
    import ray

    # an actor pool reserving every CPU starves the upstream read tasks and
    # deadlocks the streaming executor on small clusters — leave headroom
    total_cpus = int(ray.cluster_resources().get("CPU", 4))
    concurrency = max(1, min(concurrency, total_cpus - 2))
    summaries = ds.map_batches(
        VectorStoreWriter,
        fn_constructor_kwargs=dict(
            client_factory=client_factory, collection=collection, dim=dim,
            payload_fields=payload_fields, distance=distance,
            vector_col=vector_col, id_cols=id_cols),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )
    import pyarrow.compute as pc

    total = 0
    for b in summaries.iter_batches(batch_format="pyarrow"):
        total += pc.sum(b["n_upserted"]).as_py() if b.num_rows else 0
    return total


# --- reference client implementation (and the tests' "network" store) ------
def _store_actor_cls():
    import ray

    @ray.remote(num_cpus=0)
    class _VectorStoreActor:
        """The 'server': collections of id → (vector, payload)."""

        def __init__(self):
            self.collections: dict[str, dict] = {}

        def collection_exists(self, name):
            return name in self.collections

        def create_collection(self, name, dim, distance):
            # create-if-missing is idempotent across concurrent writers
            self.collections.setdefault(
                name, {"dim": dim, "distance": distance, "points": {}})

        def upsert(self, collection, ids, vectors, payloads):
            col = self.collections[collection]
            if any(len(v) != col["dim"] for v in vectors):
                raise ValueError("vector dim mismatch")
            for i, v, p in zip(ids, vectors, payloads):
                col["points"][i] = (list(v), dict(p))

        def count(self, collection):
            return len(self.collections[collection]["points"])

        def get(self, collection, point_id):
            return self.collections[collection]["points"].get(point_id)

    return _VectorStoreActor


class InMemoryVectorStore:
    """Client wrapper over a NAMED Ray actor — every writer actor in the
    pool talks to the same 'server', like a real network store."""

    def __init__(self, name: str = "vectrain_vector_store"):
        import ray

        self._actor = _store_actor_cls().options(
            name=name, get_if_exists=True, lifetime="detached").remote()
        self._ray = ray

    def collection_exists(self, name):
        return self._ray.get(self._actor.collection_exists.remote(name))

    def create_collection(self, name, dim, distance):
        self._ray.get(self._actor.create_collection.remote(name, dim, distance))

    def upsert(self, collection, ids, vectors, payloads):
        self._ray.get(
            self._actor.upsert.remote(collection, ids, vectors, payloads))

    def count(self, collection):
        return self._ray.get(self._actor.count.remote(collection))

    def get(self, collection, point_id):
        return self._ray.get(self._actor.get.remote(collection, point_id))


class QdrantVectorStoreClient:
    """Real Qdrant binding for the client protocol — import-guarded like
    functions/multimodal.py's codecs (qdrant-client is not in this
    container; the contract test drives the mapping with an injected fake
    SDK module instead).

    Mirrors the reference's client (internal/app/storages/qdrant/client.go):
    collection create with (size, distance) (client.go:55-68, distance map
    client.go:24-35) and batched point upsert (store.go:40-48).

    One instance per writer actor → one gRPC/HTTP connection per actor,
    exactly the reference's one-client-per-store topology."""

    _DISTANCE = {"cosine": "Cosine", "euclid": "Euclid", "dot": "Dot"}

    def __init__(self, url: str = "http://localhost:6333",
                 api_key: str | None = None, timeout: float = 10.0,
                 _sdk=None):
        if _sdk is None:  # pragma: no cover — exercised via injected fake
            try:
                import qdrant_client as _sdk  # noqa: PLC0415
            except ImportError as exc:
                raise ImportError(
                    "QdrantVectorStoreClient needs the 'qdrant-client' "
                    "package; use kind='memory' (InMemoryVectorStore) when "
                    "it is unavailable") from exc
        self._sdk = _sdk
        self._client = _sdk.QdrantClient(url=url, api_key=api_key,
                                         timeout=timeout)

    def collection_exists(self, name):
        return bool(self._client.collection_exists(name))

    def create_collection(self, name, dim, distance):
        m = self._sdk.models
        self._client.create_collection(
            collection_name=name,
            vectors_config=m.VectorParams(
                size=dim, distance=getattr(m.Distance,
                                           self._DISTANCE[distance].upper(),
                                           self._DISTANCE[distance])),
        )

    def upsert(self, collection, ids, vectors, payloads):
        m = self._sdk.models
        self._client.upsert(
            collection_name=collection,
            points=[m.PointStruct(id=i, vector=list(v), payload=dict(p))
                    for i, v, p in zip(ids, vectors, payloads)],
        )


# Open registry — the reference's storage factory surface (factory.go:31-38);
# production registers real network clients here (qdrant, pgvector, ...)
VECTOR_STORES = {"memory": InMemoryVectorStore,
                 "qdrant": QdrantVectorStoreClient}


def push_mentions(out_dir: str, cfg: dict,
                  parts: list[int] | None = None) -> int:
    """Post-run sink step: stream ``out_dir/mentions`` (embedded by the
    encoder stage) into the configured vector store — the reference's
    embed→store tail (pipeline.go:181-209) as a separate idempotent pass
    over the durable parquet, so a crash mid-push just re-upserts.

    ``parts`` bounds the read to specific ``mentions/part=K`` partitions
    (the stream driver's O(delta) per-poll push); None = the whole table.

    cfg keys: kind (registry), collection, dim, fields?, distance?,
    concurrency?, batch_size?, options? (client constructor kwargs)."""
    import os

    import pyarrow.compute as pc
    import ray.data as rd

    try:
        cls = VECTOR_STORES[cfg.get("kind", "memory")]
    except KeyError:
        raise ValueError(
            f"unknown vector store kind {cfg.get('kind')!r} "
            f"(have {sorted(VECTOR_STORES)})") from None
    opts = dict(cfg.get("options", {}))
    if parts is not None:
        if not parts:
            return 0
        import glob

        # expand to files: read_parquet rejects directories inside a list
        paths = [f for p in parts for f in sorted(glob.glob(
            os.path.join(out_dir, "mentions", f"part={p}", "*.parquet")))]
        if not paths:
            return 0
        ds = rd.read_parquet(paths)
    else:
        ds = rd.read_parquet(os.path.join(out_dir, "mentions"))
    # dead-lettered rows (encoder error column, null embedding) stay in the
    # parquet for inspection but never reach the store
    ds = ds.map_batches(
        lambda t: t.filter(pc.is_valid(t["embedding"])),
        batch_format="pyarrow")
    return write_vectors(
        ds, lambda: cls(**opts), cfg["collection"], dim=int(cfg["dim"]),
        payload_fields=cfg.get("fields"),
        distance=cfg.get("distance", "cosine"),
        vector_col="embedding", id_cols=("mention_id",),
        concurrency=int(cfg.get("concurrency", 4)),
        batch_size=int(cfg.get("batch_size", 1024)))
