"""HTTP push source (sources/push.py) — the reference's /source/send echo
server (http/client.go:78-112): empty-text 400, bounded queue with 429
backpressure, landing-file durability, tail flush on stop. Pure stdlib —
no Ray involvement (ingest is decoupled from processing)."""

from __future__ import annotations

import glob
import json
import os
import urllib.error
import urllib.request

import pyarrow.parquet as pq
import pytest

from vectrain_ray.sources.push import PushServer


def _post(url: str, doc: dict) -> tuple[int, dict]:
    req = urllib.request.Request(
        url, data=json.dumps(doc).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=5) as r:
            return r.status, json.load(r)
    except urllib.error.HTTPError as e:
        return e.code, json.load(e)


def _get(url: str) -> tuple[int, dict]:
    try:
        with urllib.request.urlopen(url, timeout=5) as r:
            return r.status, json.load(r)
    except urllib.error.HTTPError as e:
        return e.code, json.load(e)


def test_push_accept_reject_and_landing_files(tmp_path):
    landing = str(tmp_path / "landing")
    srv = PushServer(landing, flush_rows=10, flush_sec=0.05).start()
    try:
        base = f"http://{srv.host}:{srv.port}"
        code, doc = _get(base + "/api/health")
        assert code == 200 and doc["status"] == "ok"

        for i in range(25):
            code, doc = _post(base + "/source/send",
                              {"conv_id": "c1", "turn_idx": i,
                               "text": f"turn {i}", "junk_key": "dropped"})
            assert code == 200 and doc["status"] == "queued"

        # empty text → 400, exactly the reference's admission rule
        code, _ = _post(base + "/source/send",
                        {"conv_id": "c1", "turn_idx": 99, "text": ""})
        assert code == 400
        code, _ = _post(base + "/source/send", {"bad": "record",
                                                "turn_idx": "zzz"})
        assert code == 400
    finally:
        srv.stop()

    files = sorted(glob.glob(os.path.join(landing, "*.parquet")))
    assert files  # tail flush wrote the remainder
    t = pq.read_table(files)
    assert t.num_rows == 25
    assert sorted(t["turn_idx"].to_pylist()) == list(range(25))
    assert t.schema.names == ["conv_id", "turn_idx", "text"]  # junk dropped
    assert not glob.glob(os.path.join(landing, ".*.tmp"))  # atomic publish


def test_push_backpressure_429(tmp_path):
    landing = str(tmp_path / "landing")
    srv = PushServer(landing, queue_cap=5)
    # flusher not started → queue fills → 429 (stop() still drains)
    srv.start(auto_flush=False)
    try:
        base = f"http://{srv.host}:{srv.port}"
        codes = [
            _post(base + "/source/send",
                  {"conv_id": "c", "turn_idx": i, "text": "x"})[0]
            for i in range(12)
        ]
        assert 429 in codes  # queue_full backpressure (client.go:99-111)
        assert srv.rejected_full > 0
    finally:
        srv.stop()
    # every ACCEPTED row is durable, every 429'd row is not
    t = pq.read_table(sorted(glob.glob(os.path.join(landing, "*.parquet"))))
    assert t.num_rows == codes.count(200) == srv.accepted


def test_push_feeds_stream_driver(tmp_path):
    """End-to-end ingest surface: push records over HTTP → landing files →
    StreamDriver poll processes them exactly once."""
    pytest.importorskip("ray")
    from vectrain_ray.pipelines.stream import StreamDriver

    landing = str(tmp_path / "landing")
    srv = PushServer(landing, flush_rows=100, flush_sec=0.05).start()
    try:
        base = f"http://{srv.host}:{srv.port}"
        for conv in range(3):
            for i in range(4):
                _post(base + "/source/send",
                      {"conv_id": f"conv-{conv}", "turn_idx": i,
                       "text": f"Alice Smith met Bob Jones in turn {i}."})
    finally:
        srv.stop()

    out = str(tmp_path / "out")
    drv = StreamDriver(landing, out, num_parts=2, poll_sec=0.01)
    m = drv.poll_once()
    assert m["rows_in"] == 12 and m["ran_pipeline"]
    nodes = pq.read_table(os.path.join(out, "nodes"))
    assert nodes.num_rows > 0
    # idempotent: nothing new → no-op
    assert drv.poll_once()["ran_pipeline"] is False
