"""Contract tests for the import-guarded REAL client adapters
(KafkaBrokerClient, QdrantVectorStoreClient): the SDKs are not in this
container, so each test injects a fake SDK module and drives the adapter
through the same consumer/writer paths the in-memory fakes carry in CI —
pinning the wire mapping (config keys, seek/assign, distance enum, point
construction) and that real + fake clients share the duck-typed protocol."""

import inspect
import json
import types

import pytest

from vectrain_ray.sources.broker import BrokerConsumer, KafkaBrokerClient
from vectrain_ray.stages.vector_store import (
    InMemoryVectorStore,
    QdrantVectorStoreClient,
    VectorStoreWriter,
)


# --- fake confluent_kafka SDK ----------------------------------------------
class _FakeKafkaError:
    _PARTITION_EOF = -191

    def __init__(self, code):
        self._code = code

    def code(self):
        return self._code

    def __str__(self):
        return f"KafkaError({self._code})"


class _FakeMessage:
    def __init__(self, offset, value, err=None):
        self._offset, self._value, self._err = offset, value, err

    def offset(self):
        return self._offset

    def value(self):
        return self._value

    def error(self):
        return self._err


class _FakeConsumer:
    """Broker with two partitions; replays from the seeked offset."""

    def __init__(self, conf):
        self.conf = conf
        self.log = {0: [], 1: []}
        self.low = {0: 0, 1: 0}
        self._assigned = None
        self.closed = False

    def list_topics(self, topic):
        part_meta = {p: object() for p in self.log}
        topics = {topic: types.SimpleNamespace(partitions=part_meta,
                                               error=None)}
        return types.SimpleNamespace(topics=topics)

    def assign(self, tps):
        self._assigned = tps[0]

    def consume(self, num_messages, timeout):
        tp = self._assigned
        msgs = [m for m in self.log[tp.partition] if m.offset() >= tp.offset]
        out = msgs[:num_messages]
        # subsequent consume() calls continue from after what was returned
        if out:
            self._assigned = types.SimpleNamespace(
                topic=tp.topic, partition=tp.partition,
                offset=out[-1].offset() + 1)
        return out

    def get_watermark_offsets(self, tp):
        return self.low[tp.partition], len(self.log[tp.partition])

    def close(self):
        self.closed = True


def _fake_kafka_sdk():
    sdk = types.SimpleNamespace()
    sdk.Consumer = _FakeConsumer
    sdk.TopicPartition = lambda topic, partition, offset=0: (
        types.SimpleNamespace(topic=topic, partition=partition, offset=offset))
    sdk.KafkaError = _FakeKafkaError
    return sdk


def _rec(i):
    return json.dumps({"conv_id": f"c{i}", "turn_idx": i,
                       "text": f"turn {i}"}).encode()


def test_kafka_client_config_and_partition_discovery():
    sdk = _fake_kafka_sdk()
    cli = KafkaBrokerClient("turns", bootstrap_servers="b:9092",
                            group_id="g1", _sdk=sdk)
    conf = cli._consumer.conf
    assert conf["bootstrap.servers"] == "b:9092"
    assert conf["group.id"] == "g1"
    assert conf["enable.auto.commit"] is False  # offsets are OURS
    assert cli.partitions() == [0, 1]


def test_kafka_client_fetch_seeks_and_batches():
    sdk = _fake_kafka_sdk()
    cli = KafkaBrokerClient("turns", _sdk=sdk)
    cli._consumer.log[0] = [_FakeMessage(i, _rec(i)) for i in range(5)]
    assert cli.fetch(0, 0, 10) == [(i, _rec(i)) for i in range(5)]
    assert cli.fetch(0, 3, 10) == [(3, _rec(3)), (4, _rec(4))]  # seek
    assert cli.fetch(0, 5, 10) == []  # caught up
    assert cli.fetch(1, 0, 10) == []  # empty partition
    assert cli.earliest(0) == 0
    cli.close()
    assert cli._consumer.closed


def test_kafka_client_fetch_raises_on_broker_error_but_eats_eof():
    sdk = _fake_kafka_sdk()
    cli = KafkaBrokerClient("turns", _sdk=sdk)
    cli._consumer.log[0] = [
        _FakeMessage(0, _rec(0)),
        _FakeMessage(1, None, err=_FakeKafkaError(_FakeKafkaError._PARTITION_EOF)),
    ]
    assert cli.fetch(0, 0, 10) == [(0, _rec(0))]  # EOF terminates cleanly
    cli._consumer.log[0][1] = _FakeMessage(1, None, err=_FakeKafkaError(42))
    with pytest.raises(RuntimeError, match="kafka fetch error"):
        cli.fetch(0, 0, 10)


def test_kafka_client_through_broker_consumer_exactly_once(tmp_path):
    """The real adapter satisfies the SAME consumer the fakes drive:
    land → commit → re-poll is idempotent, per-partition offsets advance."""
    import pyarrow.parquet as pq

    sdk = _fake_kafka_sdk()
    cli = KafkaBrokerClient("turns", _sdk=sdk)
    cli._consumer.log[0] = [_FakeMessage(i, _rec(i)) for i in range(4)]
    cli._consumer.log[1] = [_FakeMessage(i, _rec(10 + i)) for i in range(2)]
    bc = BrokerConsumer(cli, str(tmp_path))
    out = bc.poll_once()
    assert out["rows"] == 6
    assert bc.poll_once()["rows"] == 0  # nothing new → no re-ingest
    t = pq.read_table(str(tmp_path))
    assert t.num_rows == 6
    assert sorted(t["turn_idx"].to_pylist()) == [0, 1, 2, 3, 10, 11]


def test_kafka_truncation_reset_via_real_adapter(tmp_path):
    sdk = _fake_kafka_sdk()
    cli = KafkaBrokerClient("turns", _sdk=sdk)
    # retention deleted offsets 0-2: log starts at 3
    cli._consumer.log[0] = [_FakeMessage(i, _rec(i)) for i in range(3, 6)]
    cli._consumer.low[0] = 3
    cli._consumer.log[1] = []
    bc = BrokerConsumer(cli, str(tmp_path))
    out = bc.poll_once()
    assert out["rows"] == 3  # reset to earliest instead of stalling
    assert out["positions"][0] == 6


# --- fake qdrant_client SDK --------------------------------------------------
class _FakeQdrantServer:
    def __init__(self):
        self.collections = {}


class _FakeQdrantClient:
    server = None  # class-level: shared across "connections"

    def __init__(self, url=None, api_key=None, timeout=None):
        self.url, self.api_key, self.timeout = url, api_key, timeout
        if _FakeQdrantClient.server is None:
            _FakeQdrantClient.server = _FakeQdrantServer()
        self._s = _FakeQdrantClient.server

    def collection_exists(self, name):
        return name in self._s.collections

    def create_collection(self, collection_name, vectors_config):
        if collection_name in self._s.collections:
            raise RuntimeError("409: collection already exists")  # real 409
        self._s.collections[collection_name] = {
            "cfg": vectors_config, "points": {}}

    def upsert(self, collection_name, points):
        col = self._s.collections[collection_name]
        for p in points:
            col["points"][p.id] = (p.vector, p.payload)


def _fake_qdrant_sdk():
    _FakeQdrantClient.server = None
    models = types.SimpleNamespace(
        VectorParams=lambda size, distance: types.SimpleNamespace(
            size=size, distance=distance),
        PointStruct=lambda id, vector, payload: types.SimpleNamespace(
            id=id, vector=vector, payload=payload),
        Distance=types.SimpleNamespace(COSINE="Cosine", EUCLID="Euclid",
                                       DOT="Dot"),
    )
    return types.SimpleNamespace(QdrantClient=_FakeQdrantClient,
                                 models=models)


def test_qdrant_client_maps_distance_and_points():
    sdk = _fake_qdrant_sdk()
    cli = QdrantVectorStoreClient(url="http://q:6333", timeout=3, _sdk=sdk)
    assert cli._client.url == "http://q:6333"
    assert not cli.collection_exists("m")
    cli.create_collection("m", 4, "cosine")
    assert cli.collection_exists("m")
    cfg = _FakeQdrantClient.server.collections["m"]["cfg"]
    assert (cfg.size, cfg.distance) == (4, "Cosine")  # enum mapping
    cli.upsert("m", ["a", "b"], [[1, 0, 0, 0], [0, 1, 0, 0]],
               [{"k": 1}, {}])
    pts = _FakeQdrantClient.server.collections["m"]["points"]
    assert pts["a"] == ([1, 0, 0, 0], {"k": 1})


def test_qdrant_duplicate_create_survives_writer_race():
    """Two pool actors both see exists()==False; the second create raises
    409 — VectorStoreWriter re-checks existence and proceeds."""
    sdk = _fake_qdrant_sdk()
    factory = lambda: QdrantVectorStoreClient(_sdk=sdk)  # noqa: E731
    w1 = VectorStoreWriter(factory, "race", dim=2)
    w2 = VectorStoreWriter(factory, "race", dim=2)  # duplicate create → 409
    import pyarrow as pa

    t = pa.table({"entity_id": ["e1"], "embedding": [[0.5, 0.5]]})
    w1(t)
    w2(t)
    assert len(_FakeQdrantClient.server.collections["race"]["points"]) == 1


def test_real_and_fake_clients_share_protocol_signatures():
    """The duck-typed protocol is pinned: every protocol method exists on
    the real adapters with the same positional parameters as the fakes CI
    runs on (broker tests' client fakes / InMemoryVectorStore)."""

    def params(cls, name):
        return [p for p in inspect.signature(
            getattr(cls, name)).parameters if p != "self"]

    for m in ("collection_exists", "create_collection", "upsert"):
        assert params(QdrantVectorStoreClient, m) == params(
            InMemoryVectorStore, m), m
    assert params(KafkaBrokerClient, "partitions") == []
    assert params(KafkaBrokerClient, "fetch") == [
        "partition", "offset", "max_messages"]
    assert params(KafkaBrokerClient, "earliest") == ["partition"]


def test_real_clients_import_guard_message():
    """Without an injected SDK and without the package installed, the
    adapters raise ImportError pointing at the fallback."""
    for cls, kwargs, missing in (
            (KafkaBrokerClient, {"topic": "t"}, "confluent-kafka"),
            (QdrantVectorStoreClient, {}, "qdrant-client")):
        try:
            cls(**kwargs)
        except ImportError as exc:
            assert missing in str(exc)
        else:  # pragma: no cover — only if the SDK IS installed
            pass
