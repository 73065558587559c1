"""Streaming-broker source adapter — the reference's Kafka consumer (S1)
behind an injectable client, completing the StreamDriver recast with a real
connector surface.

Reference semantics mirrored (internal/app/sources/kafka/client.go:49-92,
fetch_messages.go:45-84, pipeline.go:147-180,234):

  * Connect() assigns ALL topic partitions from OffsetBeginning
    (client.go:76-87) — here: ``connect()`` lists ``client.partitions()``
    and starts every partition at offset 0 unless the offset store (the
    ``group.id`` role) already holds a committed position.
  * FetchBatch pulls up to N messages and JSON-decodes each
    (fetch_messages.go:45-84); an empty ``id`` is backfilled from ``uuid``
    (fetch_messages.go:71-73) — here both live in the pluggable decoder.
  * Offsets are tracked per item and acknowledged only AFTER the
    downstream processed the batch (AfterProcessHook, pipeline.go:234) —
    here ``poll_once()`` commits the offset store only AFTER the landing
    parquet flush is durable (tmp + os.replace), so a crash in the window
    re-fetches and REPLACES its own partial output, never duplicates it.

The broker wire is at-least-once and unordered; this adapter makes ingest
exactly-once and deterministic:

  * within a fetch, messages are sorted by offset and de-duplicated
    (keep-first per offset);
  * offsets below the committed position (re-delivery after a rebalance)
    are dropped;
  * each poll lands ONE parquet file per partition named
    ``broker_p{part}_o{first}_{last}.parquet`` — the deterministic
    ``broker_p{part}_o{first}_`` PREFIX is the idempotency key: a retry of
    the same (possibly since-grown) range deletes its own prefix before
    writing, exactly like stream._SrcFilenameProvider.

The landing directory is the one ``pipelines/stream.StreamDriver`` watches,
so broker → landing → micro-batch KG is end-to-end exactly-once: this
adapter owns wire→file, the StreamDriver's offset store owns file→shards,
and the per-shard manifests own shards→graph.

The injectable-client pattern is the same one ``stages/encode.OllamaEncoder``
uses for its HTTP transport: production plugs a real consumer (e.g.
confluent-kafka, not in this container), tests plug a fake that re-delivers
and shuffles (tests/test_broker.py).

Client protocol (duck-typed)::

    client.partitions() -> list[int]
    client.fetch(partition: int, offset: int, max_messages: int)
        -> list[tuple[int, bytes]]          # (offset, value) pairs;
        # may be out of order, may repeat offsets, may re-deliver
        # already-committed offsets; empty list = caught up.
"""

from __future__ import annotations

import glob
import json
import logging
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..logs import log_event

_LOG = logging.getLogger("vectrain_ray.broker")

TRANSCRIPT_WIRE_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("text", pa.string()),
])

ENTITY_WIRE_SCHEMA = pa.schema([
    ("id", pa.string()),
    ("uuid", pa.string()),
    ("text", pa.string()),
])


def decode_transcript_json(values: list[bytes]) -> pa.Table:
    """JSON transcript turns → Arrow; unknown keys dropped, missing keys
    null (the unknown-payload-keys-dropped rule, qdrant/store.go:53-89).
    Malformed JSON errors loudly — the reference fails the fetch on
    unmarshal errors (fetch_messages.go:66-69)."""
    convs, turns, texts = [], [], []
    for v in values:
        rec = json.loads(v)
        if not isinstance(rec, dict):
            raise ValueError(f"broker record must be a JSON object: {v!r}")
        convs.append(rec.get("conv_id"))
        ti = rec.get("turn_idx")
        turns.append(None if ti is None else int(ti))
        texts.append(rec.get("text"))
    return pa.table({
        "conv_id": pa.array(convs, pa.string()),
        "turn_idx": pa.array(turns, pa.int32()),
        "text": pa.array(texts, pa.string()),
    })


def decode_entity_json(values: list[bytes]) -> pa.Table:
    """JSON wire entities (pkg/types/entity.go:3-11) with the reference's
    ID backfill: empty/missing id ← uuid (fetch_messages.go:71-73)."""
    ids, uuids, texts = [], [], []
    for v in values:
        rec = json.loads(v)
        if not isinstance(rec, dict):
            raise ValueError(f"broker record must be a JSON object: {v!r}")
        rid = rec.get("id") or ""
        ruuid = rec.get("uuid") or ""
        ids.append(rid if rid else ruuid)
        uuids.append(ruuid)
        texts.append(rec.get("text"))
    return pa.table({
        "id": pa.array(ids, pa.string()),
        "uuid": pa.array(uuids, pa.string()),
        "text": pa.array(texts, pa.string()),
    })


DECODERS = {
    "transcript": decode_transcript_json,
    "entity": decode_entity_json,
}


class BrokerConsumer:
    """Exactly-once landing-file ingest from an at-least-once broker client.

    One consumer instance per landing directory (the consumer-group
    analogue). The offset store is ONE FILE PER PARTITION
    (``_broker_offset_p{part}.json``) — partition ownership is disjoint
    across consumer processes (Kafka's model), so owners never touch each
    other's files and a commit can never clobber a sibling's position.
    Filenames embed the partition, so landing files never collide either.

    ``complete_log=True`` (default) treats the partition as a gapless log
    (Kafka's contract): a fetch window with a missing offset means that
    message is LATE, so the position only advances through the contiguous
    prefix and the gap is re-fetched next poll — no late message is ever
    dropped. Set ``complete_log=False`` for sources whose offset space has
    real holes (log compaction), where waiting on a gap would stall the
    partition forever; positions then advance past gaps.
    """

    def __init__(self, client, landing_dir: str, decode="transcript",
                 complete_log: bool = True):
        os.makedirs(landing_dir, exist_ok=True)
        self.client = client
        self.landing_dir = landing_dir
        self.decode = DECODERS[decode] if isinstance(decode, str) else decode
        self.complete_log = complete_log
        self._positions: dict[int, int] | None = None
        self._gap_polls: dict[int, int] = {}  # consecutive stalled polls

    # --- offset store (the group.id committed-offsets role) --------------
    # '_'-prefixed so pyarrow dataset discovery over the landing dir
    # ignores them (default ignore_prefixes = ['.', '_'])
    def _offset_path(self, part: int) -> str:
        return os.path.join(self.landing_dir,
                            f"_broker_offset_p{part:04d}.json")

    def _load_offset(self, part: int) -> int:
        path = self._offset_path(part)
        if os.path.exists(path):
            return int(json.load(open(path))["position"])
        return 0

    def _commit_offset(self, part: int) -> None:
        path = self._offset_path(part)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"position": self._positions[part]}, f)
        os.replace(tmp, path)

    # --- lifecycle ---------------------------------------------------------
    def connect(self) -> list[int]:
        """Assign all partitions; start each at its committed offset, or
        OffsetBeginning (0) when the group has none (client.go:76-87)."""
        parts = sorted(self.client.partitions())
        self._positions = {p: self._load_offset(p) for p in parts}
        log_event(_LOG, f"broker connected: {len(parts)} partitions",
                  partitions=parts, positions=dict(self._positions))
        return parts

    # --- one poll ------------------------------------------------------------
    def poll_once(self, max_messages: int = 10_000) -> dict:
        """Fetch → normalize → land → commit, per partition.

        Returns {"rows": n, "files": [...], "positions": {...}}. Crash
        anywhere before the final commit is safe: the landing write is
        atomic (tmp+replace) and prefix-idempotent, and un-committed
        offsets are simply re-fetched next poll.
        """
        if self._positions is None:
            self.connect()
        rows_total, files = 0, []
        for part in sorted(self._positions):
            start = self._positions[part]
            msgs = self.client.fetch(part, start, max_messages)
            if not msgs:
                continue
            # at-least-once wire → exactly-once ingest: order by offset,
            # keep-first per offset, drop already-committed re-deliveries
            seen: set[int] = set()
            cleaned: list[tuple[int, bytes]] = []
            for off, val in sorted(msgs, key=lambda m: m[0]):
                if off < start or off in seen:
                    continue
                seen.add(off)
                cleaned.append((off, val))
            if self.complete_log:
                # gapless log: a hole in the window is a LATE message, not
                # a missing offset — process only the contiguous prefix and
                # re-fetch the rest next poll (cumulative ack), so the late
                # message can never be skipped past
                upto = 0
                while (upto < len(cleaned)
                       and cleaned[upto][0] == start + upto):
                    upto += 1
                if upto == 0 and cleaned:
                    # nothing at `start` although the broker HAS later
                    # offsets: either late data (wait) or the log was
                    # truncated past our position (retention expiry) —
                    # waiting on a truncated log would stall forever.
                    # Kafka resolves this via OffsetOutOfRange +
                    # auto.offset.reset; here the client may expose
                    # earliest(partition) for the same decision.
                    earliest = getattr(self.client, "earliest", None)
                    if earliest is not None and earliest(part) > start:
                        e = earliest(part)
                        log_event(_LOG,
                                  f"partition {part} truncated: committed "
                                  f"position {start} < earliest {e}; "
                                  f"resetting (offsets {start}..{e - 1} "
                                  f"are unrecoverable)",
                                  partition=part, committed=start,
                                  earliest=e, level="warning")
                        self._positions[part] = e
                        self._commit_offset(part)
                        upto = 0
                        while (upto < len(cleaned)
                               and cleaned[upto][0] == e + upto):
                            upto += 1
                    else:
                        self._gap_polls[part] = self._gap_polls.get(part, 0) + 1
                        if self._gap_polls[part] % 10 == 0:
                            log_event(_LOG,
                                      f"partition {part} waiting on offset "
                                      f"{start} for {self._gap_polls[part]} "
                                      "polls (late message, or a truncated "
                                      "log on a client without earliest())",
                                      partition=part, committed=start,
                                      next_available=cleaned[0][0],
                                      level="warning")
                else:
                    self._gap_polls.pop(part, None)
                cleaned = cleaned[:upto]
            if not cleaned:
                continue
            first, last = cleaned[0][0], cleaned[-1][0]
            table = self.decode([v for _, v in cleaned])
            table = table.append_column(
                "_broker_offset",
                pa.array([o for o, _ in cleaned], pa.int64()))
            # idempotency key = deterministic prefix; a crash-window retry
            # whose range grew still replaces its own partial output
            prefix = f"broker_p{part:04d}_o{first:012d}_"
            for old in glob.glob(
                    os.path.join(self.landing_dir, prefix + "*.parquet")):
                os.remove(old)
            path = os.path.join(self.landing_dir,
                                f"{prefix}{last:012d}.parquet")
            tmp = path + ".tmp"
            pq.write_table(table, tmp)
            os.replace(tmp, path)  # durable BEFORE the offset commit
            self._positions[part] = last + 1
            self._commit_offset(part)  # the AfterProcessHook ack
            rows_total += table.num_rows
            files.append(path)
        if rows_total:
            log_event(_LOG, f"broker poll landed {rows_total} rows",
                      rows=rows_total, files=len(files))
        return {"rows": rows_total, "files": files,
                "positions": dict(self._positions)}

    def run(self, driver, max_iterations: int | None = None,
            idle_stop_after: int | None = None,
            max_messages: int = 10_000) -> list[dict]:
        """Pump loop: broker poll → StreamDriver micro-batch, interleaved —
        the reference's consume loop (pipeline.go:147-180) with the KG
        pipeline as the processor. Bounded stop conditions for tests; omit
        both to run forever like the reference."""
        history, idle, it = [], 0, 0
        while True:
            b = self.poll_once(max_messages=max_messages)
            m = driver.poll_once()
            m["broker_rows"] = b["rows"]
            history.append(m)
            idle = idle + 1 if b["rows"] == 0 else 0
            it += 1
            if max_iterations is not None and it >= max_iterations:
                return history
            if idle_stop_after is not None and idle >= idle_stop_after:
                return history


class KafkaBrokerClient:
    """Real Kafka binding for the client protocol — import-guarded like
    functions/multimodal.py's codecs (confluent-kafka is not in this
    container; the contract test drives the mapping with an injected fake
    SDK module instead).

    Mirrors the reference's consumer (internal/app/sources/kafka/client.go):
    metadata-discovered partitions assigned explicitly (client.go:49-62),
    reads positioned by OUR offset store rather than the broker's committed
    group offsets (the poll-from-beginning + resume-from-landing semantics,
    client.go:63-74), batched value polls (client.go:76-92). Messages with
    broker-side errors fail the fetch loudly, like the reference's
    unmarshal failures (fetch_messages.go:66-69).

    One instance per BrokerConsumer → one broker connection per consumer
    process; fetch() seeks, so interleaved partitions are safe."""

    def __init__(self, topic: str,
                 bootstrap_servers: str = "localhost:9092",
                 group_id: str = "vectrain", poll_timeout: float = 1.0,
                 _sdk=None):
        if _sdk is None:  # pragma: no cover — exercised via injected fake
            try:
                import confluent_kafka as _sdk  # noqa: PLC0415
            except ImportError as exc:
                raise ImportError(
                    "KafkaBrokerClient needs the 'confluent-kafka' package; "
                    "inject a fake client (tests/test_broker.py) or use the "
                    "parquet/push sources when it is unavailable") from exc
        self._sdk = _sdk
        self.topic = topic
        self.poll_timeout = poll_timeout
        self._consumer = _sdk.Consumer({
            "bootstrap.servers": bootstrap_servers,
            "group.id": group_id,
            # offsets are OURS (BrokerConsumer's per-partition files commit
            # after the durable landing flush) — never the broker's
            "enable.auto.commit": False,
            "auto.offset.reset": "earliest",
        })

    def partitions(self) -> list[int]:
        meta = self._consumer.list_topics(self.topic)
        topic_meta = meta.topics[self.topic]
        if getattr(topic_meta, "error", None):
            raise RuntimeError(
                f"topic metadata error for {self.topic!r}: {topic_meta.error}")
        return sorted(topic_meta.partitions.keys())

    def fetch(self, partition: int, offset: int,
              max_messages: int) -> list[tuple[int, bytes]]:
        tp = self._sdk.TopicPartition(self.topic, partition, offset)
        self._consumer.assign([tp])
        out: list[tuple[int, bytes]] = []
        while len(out) < max_messages:
            msgs = self._consumer.consume(
                num_messages=max_messages - len(out),
                timeout=self.poll_timeout)
            if not msgs:
                break  # caught up
            for m in msgs:
                err = m.error()
                if err is not None:
                    if getattr(err, "code", lambda: None)() == getattr(
                            self._sdk.KafkaError, "_PARTITION_EOF", object()):
                        return out
                    raise RuntimeError(f"kafka fetch error: {err}")
                out.append((m.offset(), m.value()))
        return out

    def earliest(self, partition: int) -> int:
        """Low watermark — BrokerConsumer calls this to recover from
        truncation (retention deleted the committed position)."""
        lo, _hi = self._consumer.get_watermark_offsets(
            self._sdk.TopicPartition(self.topic, partition))
        return int(lo)

    def close(self) -> None:
        self._consumer.close()
