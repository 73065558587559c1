"""Broker source adapter (sources/broker.py) — the reference's Kafka
consumer semantics (kafka/client.go:49-92, fetch_messages.go:45-84) behind
an injectable client.

VERDICT r2 item 4 done-criterion: a fake broker delivering out-of-order /
duplicate batches produces byte-identical output to a plain one-shot run."""

from __future__ import annotations

import glob
import json
import os
import random

import pandas as pd
import pyarrow.parquet as pq

from vectrain_ray.pipelines.resume import run_kg_resumable
from vectrain_ray.pipelines.stream import StreamDriver
from vectrain_ray.sources.broker import BrokerConsumer, decode_entity_json
from vectrain_ray.synth import generate_transcripts, write_transcripts


class FakeBroker:
    """At-least-once, unordered fake: per-partition append-only logs.

    fetch() shuffles the returned window (seeded), duplicates some
    messages within it, and — when ``redeliver_from_zero`` is set — also
    re-delivers the whole log from offset 0 regardless of the requested
    start (the post-rebalance replay case)."""

    def __init__(self, num_partitions: int = 3, seed: int = 7,
                 redeliver_from_zero: bool = False):
        self.logs: dict[int, list[bytes]] = {p: [] for p in range(num_partitions)}
        self.rng = random.Random(seed)
        self.redeliver_from_zero = redeliver_from_zero

    def produce(self, partition: int, value: bytes) -> None:
        self.logs[partition].append(value)

    def partitions(self) -> list[int]:
        return sorted(self.logs)

    def fetch(self, partition, offset, max_messages):
        start = 0 if self.redeliver_from_zero else offset
        window = [(o, v) for o, v in enumerate(self.logs[partition])
                  if o >= start][:max_messages]
        dups = [m for m in window if self.rng.random() < 0.3]
        out = window + dups
        self.rng.shuffle(out)
        return out


def _produce_transcripts(broker: FakeBroker, table) -> None:
    """Round-robin the corpus rows over the broker partitions as JSON
    messages (extra keys exercise the unknown-keys-dropped rule)."""
    nparts = len(broker.partitions())
    for i, rec in enumerate(table.to_pylist()):
        msg = {"conv_id": rec["conv_id"], "turn_idx": rec["turn_idx"],
               "text": rec["text"], "extra_key": "dropped"}
        broker.produce(i % nparts, json.dumps(msg).encode())


def _read_sorted(out_dir: str, tbl: str) -> pd.DataFrame:
    df = pq.read_table(os.path.join(out_dir, tbl)).to_pandas()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def test_broker_out_of_order_dups_to_kg_equals_oneshot(tmp_path):
    corpus = generate_transcripts(num_convs=18, turns_per_conv=6, seed=41)
    broker = FakeBroker(num_partitions=3, seed=7)
    _produce_transcripts(broker, corpus)

    landing = str(tmp_path / "landing")
    consumer = BrokerConsumer(broker, landing)
    assert consumer.connect() == [0, 1, 2]
    m = consumer.poll_once()
    assert m["rows"] == corpus.num_rows  # dups/shuffle collapsed to exact

    # landed rows = the corpus, exactly once: each partition file holds
    # every offset exactly once (the corpus itself legitimately contains
    # duplicate re-sent turns — exactly-once is an OFFSET property)
    landed = pq.read_table(landing).to_pandas()
    assert len(landed) == corpus.num_rows
    for f in glob.glob(os.path.join(landing, "*.parquet")):
        offs = pq.read_table(f)["_broker_offset"].to_pylist()
        assert offs == sorted(set(offs)), f

    out_b = str(tmp_path / "out_broker")
    StreamDriver(landing, out_b, num_parts=3, poll_sec=0.01).poll_once()

    # one-shot reference over the same rows written as plain parquet
    plain = str(tmp_path / "plain")
    write_transcripts(plain, num_convs=18, turns_per_conv=6, seed=41,
                      num_files=2)
    out_p = str(tmp_path / "out_plain")
    run_kg_resumable(plain, out_p, num_parts=3)

    for tbl in ("edges", "nodes", "triples"):
        pd.testing.assert_frame_equal(
            _read_sorted(out_b, tbl), _read_sorted(out_p, tbl), obj=tbl)

    # caught up: an idle broker poll is a no-op with no new files
    m2 = consumer.poll_once()
    assert m2["rows"] == 0 and m2["files"] == []


def test_crash_before_offset_commit_replays_idempotently(tmp_path):
    """The crash window: landing file flushed, offset commit lost →
    a RESTARTED consumer (fresh instance, empty offset store) re-fetches
    from the beginning and REPLACES its own files; rows stay exact."""
    corpus = generate_transcripts(num_convs=8, turns_per_conv=5, seed=42)
    broker = FakeBroker(num_partitions=2, seed=3)
    _produce_transcripts(broker, corpus)

    landing = str(tmp_path / "landing")
    c1 = BrokerConsumer(broker, landing)
    c1.poll_once()
    for f in glob.glob(os.path.join(landing, "_broker_offset_p*.json")):
        os.remove(f)  # simulate: flush durable, commit lost

    c2 = BrokerConsumer(broker, landing)  # restart
    m = c2.poll_once()
    assert m["rows"] == corpus.num_rows  # re-fetched all...
    landed = pq.read_table(landing).to_pandas()
    assert len(landed) == corpus.num_rows  # ...but files were replaced
    assert len(glob.glob(os.path.join(landing, "*.parquet"))) == 2


def test_committed_redelivery_is_dropped(tmp_path):
    """Post-rebalance replay: the broker re-delivers offsets below the
    committed position; the consumer drops them all (no rows, no files)."""
    corpus = generate_transcripts(num_convs=6, turns_per_conv=4, seed=9)
    broker = FakeBroker(num_partitions=2, seed=5)
    _produce_transcripts(broker, corpus)
    landing = str(tmp_path / "landing")
    consumer = BrokerConsumer(broker, landing)
    m1 = consumer.poll_once()
    assert m1["rows"] == corpus.num_rows

    broker.redeliver_from_zero = True  # replay everything from 0
    m2 = consumer.poll_once()
    assert m2["rows"] == 0 and m2["files"] == []
    assert len(pq.read_table(landing)) == corpus.num_rows


def test_restart_resumes_from_committed_offsets(tmp_path):
    """The group.id role: a new consumer instance over the same landing
    dir resumes from the committed positions, ingesting ONLY the delta."""
    corpus = generate_transcripts(num_convs=10, turns_per_conv=4, seed=2)
    n_total = corpus.num_rows
    half = corpus.slice(0, n_total // 2)
    rest = corpus.slice(n_total // 2)

    broker = FakeBroker(num_partitions=2, seed=11)
    _produce_transcripts(broker, half)
    landing = str(tmp_path / "landing")
    m1 = BrokerConsumer(broker, landing).poll_once()
    assert m1["rows"] == half.num_rows

    _produce_transcripts(broker, rest)  # appended while "down"
    m2 = BrokerConsumer(broker, landing).poll_once()  # restart
    assert m2["rows"] == rest.num_rows
    assert len(pq.read_table(landing)) == n_total


def test_entity_decode_backfills_id_from_uuid():
    """fetch_messages.go:71-73: empty id ← uuid."""
    t = decode_entity_json([
        json.dumps({"id": "", "uuid": "u-1", "text": "a"}).encode(),
        json.dumps({"uuid": "u-2", "text": "b"}).encode(),
        json.dumps({"id": "keep", "uuid": "u-3", "text": "c"}).encode(),
    ])
    assert t["id"].to_pylist() == ["u-1", "u-2", "keep"]


def test_pump_loop_interleaves_and_stops(tmp_path):
    """run(): broker poll → micro-batch KG, bounded by idle_stop_after."""
    corpus = generate_transcripts(num_convs=8, turns_per_conv=4, seed=6)
    broker = FakeBroker(num_partitions=2, seed=1)
    _produce_transcripts(broker, corpus)
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    consumer = BrokerConsumer(broker, landing)
    driver = StreamDriver(landing, out, num_parts=2, poll_sec=0.01)
    hist = consumer.run(driver, idle_stop_after=1)
    assert hist[0]["broker_rows"] == corpus.num_rows
    assert hist[0]["ran_pipeline"] is True
    assert hist[-1]["broker_rows"] == 0
    assert os.path.exists(os.path.join(out, "_FINAL_DONE"))


class GappyBroker:
    """Delivers offset 2 one poll LATE: first fetch from 0 returns
    [0, 1, 3]; later fetches return the full window."""

    def __init__(self):
        self.values = [json.dumps({"conv_id": f"c{i}", "turn_idx": 0,
                                   "text": f"Msg {i}"}).encode()
                       for i in range(4)]
        self.first = True

    def partitions(self):
        return [0]

    def fetch(self, partition, offset, max_messages):
        out = [(o, v) for o, v in enumerate(self.values) if o >= offset]
        if self.first:
            self.first = False
            out = [(o, v) for o, v in out if o != 2]
        return out


def test_late_arrival_in_gap_is_never_dropped(tmp_path):
    """complete_log (default): a hole in the fetch window is a LATE
    message — the position advances only through the contiguous prefix,
    so the late offset lands on the next poll instead of being skipped."""
    landing = str(tmp_path / "landing")
    consumer = BrokerConsumer(GappyBroker(), landing)
    m1 = consumer.poll_once()
    assert m1["rows"] == 2  # offsets 0,1 only — NOT 3 past the gap
    assert m1["positions"][0] == 2
    m2 = consumer.poll_once()  # gap filled → 2,3 land
    assert m2["rows"] == 2 and m2["positions"][0] == 4
    landed = pq.read_table(landing)
    assert sorted(landed["_broker_offset"].to_pylist()) == [0, 1, 2, 3]


def test_compacted_log_mode_advances_past_holes(tmp_path):
    """complete_log=False: offset holes are real (log compaction) — the
    position advances past them instead of stalling the partition."""
    broker = GappyBroker()

    class Holey:
        def partitions(self):
            return [0]

        def fetch(self, partition, offset, max_messages):
            return [(o, v) for o, v in enumerate(broker.values)
                    if o >= offset and o != 2]  # offset 2 is GONE

    c = BrokerConsumer(Holey(), str(tmp_path / "l2"), complete_log=False)
    m = c.poll_once()
    assert m["rows"] == 3 and m["positions"][0] == 4  # no stall
    m2 = c.poll_once()
    assert m2["rows"] == 0  # and no re-fetch loop


def test_disjoint_owners_share_landing_without_clobber(tmp_path):
    """Two consumers owning disjoint partitions land into ONE directory;
    per-partition offset files mean neither commit clobbers the other,
    and a restart resumes both correctly."""
    corpus = generate_transcripts(num_convs=8, turns_per_conv=4, seed=31)
    broker = FakeBroker(num_partitions=2, seed=13)
    _produce_transcripts(broker, corpus)

    class View:
        def __init__(self, part):
            self.part = part

        def partitions(self):
            return [self.part]

        def fetch(self, partition, offset, max_messages):
            return broker.fetch(partition, offset, max_messages)

    landing = str(tmp_path / "landing")
    a = BrokerConsumer(View(0), landing)
    b = BrokerConsumer(View(1), landing)
    ra, rb = a.poll_once(), b.poll_once()
    assert ra["rows"] + rb["rows"] == corpus.num_rows

    # restart BOTH: positions intact, nothing re-fetched, no duplicates
    a2, b2 = BrokerConsumer(View(0), landing), BrokerConsumer(View(1), landing)
    assert a2.poll_once()["rows"] == 0
    assert b2.poll_once()["rows"] == 0
    assert len(pq.read_table(landing)) == corpus.num_rows


def test_truncated_log_resets_to_earliest_instead_of_stalling(tmp_path):
    """Retention expiry: the committed position falls below the broker's
    earliest retained offset. A client exposing earliest() triggers the
    auto.offset.reset-style jump (with the gap logged as unrecoverable);
    ingestion continues instead of stalling forever."""
    msgs = [json.dumps({"conv_id": f"c{i}", "turn_idx": 0,
                        "text": f"Msg {i}"}).encode() for i in range(8)]

    class Truncated:
        retained_from = 0

        def partitions(self):
            return [0]

        def earliest(self, partition):
            return self.retained_from

        def fetch(self, partition, offset, max_messages):
            lo = max(offset, self.retained_from)
            return [(o, v) for o, v in enumerate(msgs) if o >= lo]

    landing = str(tmp_path / "landing")
    broker = Truncated()
    consumer = BrokerConsumer(broker, landing)
    m1 = consumer.poll_once()
    assert m1["rows"] == 8

    # simulate: consumer down, retention deleted everything < 12, and 4
    # new messages (8..11) ALSO expired before we came back
    msgs.extend(json.dumps({"conv_id": f"c{i}", "turn_idx": 0,
                            "text": f"Msg {i}"}).encode() for i in range(8, 16))
    broker.retained_from = 12
    c2 = BrokerConsumer(broker, landing)  # restart at committed 8 < 12
    m2 = c2.poll_once()
    assert m2["rows"] == 4  # offsets 12..15; 8..11 are gone, logged
    assert m2["positions"][0] == 16
    landed = pq.read_table(landing)
    assert sorted(landed["_broker_offset"].to_pylist()) == \
        list(range(8)) + [12, 13, 14, 15]
