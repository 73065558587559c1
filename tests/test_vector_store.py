"""Vector-store sink (stages/vector_store.py) — the reference's Qdrant
writer role (store.go:13-51, client.go:55-68) with an injectable client."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vectrain_ray.stages.vector_store import (
    InMemoryVectorStore,
    VectorStoreWriter,
    write_vectors,
)


class LocalFake:
    """In-process fake for direct (non-Ray) writer unit tests."""

    def __init__(self):
        self.collections = {}
        self.create_calls = 0

    def collection_exists(self, name):
        return name in self.collections

    def create_collection(self, name, dim, distance):
        self.create_calls += 1
        self.collections[name] = {"dim": dim, "distance": distance,
                                  "points": {}}

    def upsert(self, collection, ids, vectors, payloads):
        for i, v, p in zip(ids, vectors, payloads):
            self.collections[collection]["points"][i] = (v, p)


def _media_batch(n=6, dim=4):
    rng = np.random.RandomState(3)
    return pa.table({
        "entity_id": pa.array([f"e{i}" for i in range(n)]),
        "embedding": pa.array(rng.rand(n, dim).tolist(),
                              pa.list_(pa.float64())),
        "name": pa.array([f"Entity {i}" if i % 2 else "" for i in range(n)]),
        "degree": pa.array([str(i * 10) if i % 3 else "" for i in range(n)]),
    })


def test_writer_deterministic_ids_and_typed_payload_zeros():
    fake = LocalFake()
    w = VectorStoreWriter(lambda: fake, "col", dim=4,
                          payload_fields={"name": "string", "degree": "int",
                                          "absent": "float"})
    batch = _media_batch()
    out1 = w(batch)
    assert out1["n_upserted"].to_pylist() == [6]
    assert fake.create_calls == 1  # ensure-collection ran once, in __init__
    pts = fake.collections["col"]["points"]
    assert len(pts) == 6
    # rerun: same ids -> overwrite, never duplicate (fixes TODO store.go:45)
    w(batch)
    assert len(fake.collections["col"]["points"]) == 6
    # typed zero values for missing/empty payload fields (store.go:53-89)
    some = next(iter(pts.values()))[1]
    assert set(some) == {"name", "degree", "absent"}
    vals = [p for _, p in pts.values()]
    assert any(p["name"] == "" for p in vals)  # empty string -> zero string
    assert any(p["degree"] == 0 for p in vals)  # empty -> 0
    assert all(p["absent"] == 0.0 for p in vals)  # undeclared column -> 0.0


def test_writer_rejects_wrong_dim_and_distance():
    fake = LocalFake()
    with pytest.raises(ValueError, match="distance"):
        VectorStoreWriter(lambda: fake, "c", dim=4, distance="hamming")
    w = VectorStoreWriter(lambda: fake, "c", dim=5)
    with pytest.raises(ValueError, match="dim"):
        w(_media_batch(dim=4))


def test_write_vectors_actor_pool_to_shared_store():
    """e2e: a Dataset streams through a 2-actor writer pool into ONE shared
    named-actor store; re-running upserts idempotently."""
    t = _media_batch(n=40, dim=8)
    ds = rd.from_arrow(t)
    factory = lambda: InMemoryVectorStore("vr_test_store")  # noqa: E731
    n = write_vectors(ds, factory, "kg_nodes", dim=8,
                      payload_fields={"name": "string"},
                      concurrency=2, batch_size=8)
    assert n == 40
    store = InMemoryVectorStore("vr_test_store")
    assert store.collection_exists("kg_nodes")
    assert store.count("kg_nodes") == 40

    # rerun the whole write: counts unchanged (deterministic ids)
    n2 = write_vectors(rd.from_arrow(t), factory, "kg_nodes", dim=8,
                       payload_fields={"name": "string"},
                       concurrency=2, batch_size=8)
    assert n2 == 40
    assert store.count("kg_nodes") == 40

    # a concrete point round-trips vector + payload
    from vectrain_ray import rules

    pid = rules.stable_id("pt", "e1")
    vec, payload = store.get("kg_nodes", pid)
    assert len(vec) == 8 and payload == {"name": "Entity 1"}


def test_spec_wires_vector_store_push(tmp_path):
    """run_from_spec with sink.vector_store pushes embedded mentions into
    the named store after the parquet commit; rerun stays idempotent."""
    from vectrain_ray.config import PipelineSpec, run_from_spec
    from vectrain_ray.synth import write_transcripts

    src = str(tmp_path / "in")
    write_transcripts(src, num_convs=10, turns_per_conv=5, seed=17,
                      num_files=2)
    spec = PipelineSpec.from_dict({
        "source": {"path": src},
        "sink": {"out_dir": str(tmp_path / "out"), "num_parts": 2,
                 "vector_store": {"kind": "memory", "collection": "m",
                                  "dim": 64, "fields": {"surface_form":
                                                        "string"},
                                  "options": {"name": "vr_spec_store"},
                                  "concurrency": 2}},
    })
    m1 = run_from_spec(spec)
    assert m1["vectors_pushed"] > 0
    store = InMemoryVectorStore("vr_spec_store")
    assert store.count("m") == m1["vectors_pushed"]
    m2 = run_from_spec(spec)  # rerun: same ids, same count
    assert store.count("m") == m1["vectors_pushed"]
    assert m2["vectors_pushed"] == m1["vectors_pushed"]


def test_spec_rejects_bad_vector_store():
    from vectrain_ray.config import PipelineSpec

    # "qdrant" is a REGISTERED kind since the import-guarded adapter landed
    # (stages/vector_store.py QdrantVectorStoreClient) — the unknown-kind
    # rejection needs a kind no registry entry claims
    with pytest.raises(ValueError, match="vector_store.kind"):
        PipelineSpec.from_dict({
            "source": {"path": "/x"},
            "sink": {"out_dir": "/y",
                     "vector_store": {"kind": "no_such_store",
                                      "collection": "c", "dim": 8}},
        }).validate()
    with pytest.raises(ValueError, match="collection"):
        PipelineSpec.from_dict({
            "source": {"path": "/x"},
            "sink": {"out_dir": "/y", "vector_store": {"dim": 8}},
        }).validate()


def test_stream_path_pushes_vectors_per_microbatch(tmp_path):
    """Regression (review finding): sink.vector_store must not be silently
    ignored on the stream path — each micro-batch pushes the (rewritten)
    mentions idempotently."""
    from vectrain_ray.config import PipelineSpec, stream_driver_from_spec
    from vectrain_ray.synth import write_transcripts

    src = str(tmp_path / "in")
    write_transcripts(src, num_convs=8, turns_per_conv=4, seed=29,
                      num_files=2)
    spec = PipelineSpec.from_dict({
        "source": {"path": src},
        "sink": {"out_dir": str(tmp_path / "out"), "num_parts": 2,
                 "vector_store": {"kind": "memory", "collection": "sm",
                                  "dim": 64,
                                  "options": {"name": "vr_stream_store"}}},
    })
    drv = stream_driver_from_spec(spec, poll_sec=0.01)
    m1 = drv.poll_once()
    assert m1["ran_pipeline"] and m1["vectors_pushed"] > 0
    store = InMemoryVectorStore("vr_stream_store")
    assert store.count("sm") == m1["vectors_pushed"]
    # idle poll: no re-push, store unchanged
    m2 = drv.poll_once()
    assert not m2["ran_pipeline"]
    assert store.count("sm") == m1["vectors_pushed"]


def test_spec_rejects_unknown_vector_store_keys():
    from vectrain_ray.config import PipelineSpec

    with pytest.raises(ValueError, match="unknown sink.vector_store key"):
        PipelineSpec.from_dict({
            "source": {"path": "/x"},
            "sink": {"out_dir": "/y",
                     "vector_store": {"kind": "memory", "collection": "c",
                                      "dim": 8, "feilds": {}}},
        }).validate()


def test_stream_push_is_delta_not_corpus(tmp_path):
    """O(delta): a trickle append re-pushes only the rewritten mention
    partitions, not the whole corpus; the store still converges to the
    full mention set."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as _pq

    from vectrain_ray.config import PipelineSpec, stream_driver_from_spec
    from vectrain_ray.synth import write_transcripts

    src = str(tmp_path / "in")
    write_transcripts(src, num_convs=16, turns_per_conv=4, seed=61,
                      num_files=3)
    spec = PipelineSpec.from_dict({
        "source": {"path": src},
        "sink": {"out_dir": str(tmp_path / "out"), "num_parts": 4,
                 "vector_store": {"kind": "memory", "collection": "d",
                                  "dim": 64,
                                  "options": {"name": "vr_delta_store"}}},
    })
    drv = stream_driver_from_spec(spec, poll_sec=0.01)
    m1 = drv.poll_once()
    total_after_m1 = InMemoryVectorStore("vr_delta_store").count("d")
    assert m1["vectors_pushed"] == total_after_m1 > 0

    # trickle: ONE new conversation -> at most one shard's mentions change
    t = pa.table({
        "conv_id": pa.array(["convZ-1"] * 2),
        "turn_idx": pa.array([0, 1], pa.int32()),
        "role": pa.array(["user", "assistant"]),
        "text": pa.array(["Zzyx Corp acquired Qwerty Labs.",
                          "Zzyx Corp is based in Oslo."]),
        "tool": pa.array([None, None], pa.string()),
        "ts": pa.array([1, 2], pa.int64()).cast(pa.timestamp("us")),
    })
    _pq.write_table(t, os.path.join(src, "zz_late.parquet"))
    m2 = drv.poll_once()
    assert m2["ran_pipeline"]
    # pushed only the touched partition(s): far less than the corpus
    assert 0 < m2["vectors_pushed"] < m1["vectors_pushed"]
    store = InMemoryVectorStore("vr_delta_store")
    assert store.count("d") > total_after_m1  # new mentions arrived
