"""Structured logging (logs.py) — the reference's zap tee (D9,
logger.go:11-69): console + JSON-lines file, structured fields, phase
timers, and the resumable runner emitting commit events into it."""

from __future__ import annotations

import json
import logging
import os


def _read_jsonl(path):
    return [json.loads(x) for x in open(path)]


def test_json_file_and_fields(tmp_path):
    from vectrain_ray.logs import log_event, phase_timer, setup_logging

    lg = setup_logging(str(tmp_path), console_level=logging.CRITICAL)
    log_event(lg, "ingest", part=3, rows=42)
    with phase_timer(lg, "extract"):
        pass
    try:
        with phase_timer(lg, "boom"):
            raise ValueError("x")
    except ValueError:
        pass
    lines = _read_jsonl(tmp_path / "logs" / "engine.jsonl")
    assert lines[0]["part"] == 3 and lines[0]["rows"] == 42
    assert lines[1]["phase"] == "extract" and lines[1]["ok"] is True
    assert lines[2]["phase"] == "boom" and lines[2]["ok"] is False
    assert all("ts" in x and "level" in x for x in lines)


def test_setup_idempotent(tmp_path):
    from vectrain_ray.logs import log_event, setup_logging

    lg = setup_logging(str(tmp_path), console_level=logging.CRITICAL)
    lg = setup_logging(str(tmp_path), console_level=logging.CRITICAL)
    log_event(lg, "once")
    lines = _read_jsonl(tmp_path / "logs" / "engine.jsonl")
    assert sum(1 for x in lines if x["msg"] == "once") == 1  # no dup handlers


def test_resumable_runner_emits_commit_events(tmp_path):
    import ray.data as rd

    from vectrain_ray.logs import setup_logging
    from vectrain_ray.pipelines.resume import run_kg_resumable
    from vectrain_ray import synth

    inp = str(tmp_path / "in")
    rd.from_arrow(synth.generate_transcripts(8, 4, seed=13)).write_parquet(inp)
    out = str(tmp_path / "out")
    setup_logging(out, console_level=logging.CRITICAL)
    run_kg_resumable(inp, out, num_parts=2)
    lines = _read_jsonl(os.path.join(out, "logs", "engine.jsonl"))
    p1 = [x for x in lines if x.get("phase") == "p1"]
    p3 = [x for x in lines if x.get("phase") == "p3"]
    assert {x["part"] for x in p1} == {0, 1}
    assert {x["part"] for x in p3} == {0, 1}
    assert all(x["rows_out"] > 0 for x in p1)
