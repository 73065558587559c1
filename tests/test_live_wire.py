"""Live-wire smoke tests for the REAL client adapters.

SKIPPED BY DEFAULT — CI carries the injected-fake contract tests
(tests/test_real_clients.py, tests/test_broker.py); these tests exercise
the same adapters against REAL services over real sockets. To run them:

    docker compose -f deploy/docker-compose.smoke.yml up -d --wait
    docker compose -f deploy/docker-compose.smoke.yml exec ollama \
        ollama pull nomic-embed-text        # once, for the encoder test
    pip install confluent-kafka qdrant-client
    VECTRAIN_LIVE_SMOKE=1 python -m pytest tests/test_live_wire.py -v

Each test additionally importorskips its SDK, so a partially-provisioned
box (say Kafka up but no qdrant-client wheel) runs what it can. Endpoints
are overridable via VECTRAIN_KAFKA_BOOTSTRAP / VECTRAIN_QDRANT_URL /
VECTRAIN_OLLAMA_ENDPOINT for non-compose setups.

This is the wire-mapping check the fakes can't give: the reference ships
the same three live integrations (internal/app/sources/kafka/client.go,
internal/app/storages/qdrant/client.go,
internal/app/embedders/ollama/embed_message.go).
"""

import json
import os
import time
import uuid

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("VECTRAIN_LIVE_SMOKE") != "1",
    reason="live-wire smoke: needs deploy/docker-compose.smoke.yml running "
           "and VECTRAIN_LIVE_SMOKE=1",
)

KAFKA = os.environ.get("VECTRAIN_KAFKA_BOOTSTRAP", "localhost:9092")
QDRANT = os.environ.get("VECTRAIN_QDRANT_URL", "http://localhost:6333")
OLLAMA = os.environ.get("VECTRAIN_OLLAMA_ENDPOINT",
                        "http://localhost:11434/api/embed")


def test_kafka_live_fetch_and_landing(tmp_path):
    """Produce JSON turns to a real broker, then drive the full
    KafkaBrokerClient → BrokerConsumer → landing-parquet path twice to
    prove the committed-offset resume against real watermarks."""
    ck = pytest.importorskip("confluent_kafka")
    from confluent_kafka.admin import AdminClient, NewTopic

    from vectrain_ray.sources.broker import BrokerConsumer, KafkaBrokerClient

    topic = f"vectrain-smoke-{uuid.uuid4().hex[:8]}"
    admin = AdminClient({"bootstrap.servers": KAFKA})
    admin.create_topics([NewTopic(topic, num_partitions=2,
                                  replication_factor=1)])[topic].result(30)

    prod = ck.Producer({"bootstrap.servers": KAFKA})
    for i in range(10):
        prod.produce(topic, partition=i % 2, value=json.dumps(
            {"conv_id": f"c{i // 3}", "turn_idx": i,
             "text": f"alice met bob in paris {i}"}).encode())
    prod.flush(30)

    client = KafkaBrokerClient(topic, bootstrap_servers=KAFKA,
                               poll_timeout=3.0)
    try:
        assert client.partitions() == [0, 1]
        assert client.earliest(0) == 0
        consumer = BrokerConsumer(client, str(tmp_path))
        got = consumer.poll_once()
        assert got["rows"] == 10
        # resume: the committed per-partition offsets make the next poll
        # empty rather than a replay (the reference's landing semantics)
        assert consumer.poll_once()["rows"] == 0

        prod.produce(topic, partition=0, value=json.dumps(
            {"conv_id": "c9", "turn_idx": 99, "text": "late turn"}).encode())
        prod.flush(30)
        deadline = time.time() + 15
        rows = 0
        while rows == 0 and time.time() < deadline:
            rows = consumer.poll_once()["rows"]
        assert rows == 1
    finally:
        client.close()

    import pyarrow.dataset as pads
    t = pads.dataset(str(tmp_path), format="parquet").to_table()
    assert t.num_rows == 11
    assert set(t.column_names) >= {"conv_id", "turn_idx", "text"}


def test_qdrant_live_create_upsert_search():
    """Create a collection, upsert through the adapter, read it back with
    a raw client search — pins the (size, distance) and PointStruct wire
    mapping against a real server."""
    qc = pytest.importorskip("qdrant_client")

    from vectrain_ray.stages.vector_store import QdrantVectorStoreClient

    coll = f"vectrain_smoke_{uuid.uuid4().hex[:8]}"
    store = QdrantVectorStoreClient(url=QDRANT)
    assert store.collection_exists(coll) is False
    store.create_collection(coll, dim=4, distance="cosine")
    assert store.collection_exists(coll) is True

    ids = [str(uuid.uuid4()) for _ in range(3)]
    vecs = np.eye(3, 4, dtype=np.float32)
    store.upsert(coll, ids, vecs,
                 [{"surface_norm": f"s{i}"} for i in range(3)])
    # idempotent re-upsert (the reference's at-least-once store contract)
    store.upsert(coll, ids, vecs,
                 [{"surface_norm": f"s{i}"} for i in range(3)])

    raw = qc.QdrantClient(url=QDRANT)
    assert raw.count(coll).count == 3
    hits = raw.query_points(coll, query=[1.0, 0.0, 0.0, 0.0],
                            limit=1, with_payload=True).points
    assert hits[0].id == ids[0]
    assert hits[0].payload["surface_norm"] == "s0"
    raw.delete_collection(coll)


def test_ollama_live_embed_batch():
    """One batched POST against a real embedding server; the adapter's
    Vector-xor-Err contract must hold for a mixed empty/non-empty batch."""
    import urllib.error
    import urllib.request

    try:  # reachability probe, not an SDK (stdlib transport)
        urllib.request.urlopen(OLLAMA.rsplit("/api/", 1)[0], timeout=3)
    except (urllib.error.URLError, OSError):
        pytest.skip(f"no embedding server at {OLLAMA}")

    from vectrain_ray.stages.encode import OllamaEncoder

    enc = OllamaEncoder(dim=64, endpoint=OLLAMA, timeout_sec=60.0)
    mat, errs = enc._encode_texts(["alice met bob", "", "bob left paris"])
    assert mat.shape == (3, 64)
    assert errs == [None, "empty_text", None]
    # unit-normalised non-empty rows, zero row for the dead letter
    assert np.allclose(np.linalg.norm(mat[[0, 2]], axis=1), 1.0, atol=1e-5)
    assert np.linalg.norm(mat[1]) == 0.0
