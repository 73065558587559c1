"""Control-plane HTTP API (control.py) — the reference's runner routes
(internal/http/routes.go:17-23, handlers/runner.go): start/stop/health/
configuration, plus the status + Prometheus metrics surfaces (D8)."""

from __future__ import annotations

import json
import os
import time
import urllib.request

import pytest

from vectrain_ray.config import PipelineSpec
from vectrain_ray.control import ControlServer, _prometheus_lines
from vectrain_ray.synth import write_transcripts


def _req(port: int, path: str, method: str = "GET"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", method=method,
        data=b"" if method == "POST" else None)
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:  # 4xx still carries a body
        return e.code, e.read()


@pytest.fixture()
def server(tmp_path):
    landing = str(tmp_path / "landing")
    write_transcripts(landing, num_convs=8, turns_per_conv=4, seed=17,
                      num_files=2)
    spec = PipelineSpec.from_dict(
        {"source": {"path": landing},
         "sink": {"out_dir": str(tmp_path / "out"), "num_parts": 2}})
    srv = ControlServer(spec, port=0).start()
    yield srv
    srv.stop()


def test_health_configuration_and_404(server):
    code, body = _req(server.port, "/api/health")
    assert code == 200
    doc = json.loads(body)
    assert doc["status"] == "ok" and doc["running"] is False

    code, body = _req(server.port, "/api/configuration", method="POST")
    assert code == 200
    cfg = json.loads(body)
    assert cfg["sink"]["num_parts"] == 2  # the validated spec, echoed back
    code2, body2 = _req(server.port, "/api/configuration")  # GET alias
    assert code2 == 200 and json.loads(body2) == cfg

    assert _req(server.port, "/api/nope")[0] == 404


def test_start_processes_stop_is_graceful_and_idempotent(server, ray_session):
    out_dir = server.spec.sink.out_dir
    code, body = _req(server.port, "/api/start", method="POST")
    assert code == 200 and json.loads(body)["status"] == "started"
    # double-start → 409 (one loop per daemon, like the reference pipeline)
    assert _req(server.port, "/api/start", method="POST")[0] == 409

    deadline = time.time() + 120
    while time.time() < deadline:
        doc = json.loads(_req(server.port, "/api/status")[1])
        if doc.get("finalized") and doc.get("stream", {}).get(
                "files_ingested", 0) >= 2:
            break
        time.sleep(0.5)
    else:
        pytest.fail(f"loop never finalized: {doc}")
    assert json.loads(_req(server.port, "/api/health")[1])["running"] is True

    code, body = _req(server.port, "/api/stop", method="POST")
    assert code == 200 and json.loads(body)["status"] == "stopped"
    assert json.loads(_req(server.port, "/api/health")[1])["running"] is False
    # graceful: committed output survives the stop
    assert os.path.exists(os.path.join(out_dir, "_FINAL_DONE"))
    # idempotent second stop
    code, body = _req(server.port, "/api/stop", method="POST")
    assert code == 200 and json.loads(body)["status"] == "stopped"

    # metrics surface (D8): pipeline counters, Prometheus text format
    code, body = _req(server.port, "/metrics")
    assert code == 200
    text = body.decode()
    assert "vectrain_stream_files_ingested 2" in text
    assert 'vectrain_phase_rows{phase="p1"}' in text
    assert 'vectrain_phase_rows{phase="p3"}' in text
    assert "vectrain_finalized 1" in text
    # exposition validity: exactly ONE '# TYPE' line per metric family
    # (expfmt parsers reject the whole scrape on a second one)
    type_lines = [ln for ln in text.splitlines() if ln.startswith("# TYPE")]
    assert len(type_lines) == len(set(type_lines)), type_lines


def test_prometheus_lines_empty_state():
    text = _prometheus_lines({"out_dir": "/nope", "exists": False})
    assert text.startswith("# TYPE vectrain_finalized gauge")
    assert "vectrain_finalized 0" in text


def test_standalone_metrics_port(tmp_path):
    """D8 parity: /metrics on its OWN listener (the reference's standalone
    prometheus port, internal/infra/monitoring/prometheus.go:17-32) —
    scrapes work there, API routes do not."""
    landing = str(tmp_path / "landing")
    write_transcripts(landing, num_convs=4, turns_per_conv=3, seed=23,
                      num_files=1)
    spec = PipelineSpec.from_dict(
        {"source": {"path": landing},
         "sink": {"out_dir": str(tmp_path / "out"), "num_parts": 1}})
    srv = ControlServer(spec, port=0, metrics_port=0).start()
    try:
        assert srv.metrics_port and srv.metrics_port != srv.port
        code, body = _req(srv.metrics_port, "/metrics")
        assert code == 200 and b"vectrain_" in body
        code, _ = _req(srv.metrics_port, "/api/health")
        assert code == 404  # metrics listener serves ONLY /metrics
        code, _ = _req(srv.port, "/metrics")
        assert code == 200  # main listener still serves it too
    finally:
        srv.stop()
