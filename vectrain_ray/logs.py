"""Structured logging — the reference's zap tee recast (D9,
internal/infra/logger/logger.go:11-69: JSON file + console split by level).

``setup_logging(out_dir)`` installs two handlers on the ``vectrain_ray``
logger tree:

  * console: human one-liners at INFO+ (the reference's console core);
  * ``<out_dir>/logs/engine.jsonl``: one JSON object per record at DEBUG+
    (the reference's JSON file core) — machine-parseable lineage of a run,
    next to the data it produced.

Library code logs through ``logging.getLogger("vectrain_ray.<mod>")`` as
usual; only entry points call setup (same ownership rule as ray.init).
Worker-side logs flow through Ray's own log aggregation; this file is the
DRIVER's structured record (phase timings, partition commits, stream polls).
"""

from __future__ import annotations

import json
import logging
import os
import time


class JsonLineFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        extra = getattr(record, "fields", None)
        doc = dict(extra) if isinstance(extra, dict) else {}
        # envelope keys win — structured fields must not clobber them
        doc.update({
            "ts": round(record.created, 3),
            "level": record.levelname,
            "logger": record.name,
            "msg": record.getMessage(),
        })
        if record.exc_info:
            doc["exc"] = self.formatException(record.exc_info)
        return json.dumps(doc, default=str)


def setup_logging(out_dir: str | None = None,
                  console_level: int = logging.INFO) -> logging.Logger:
    """Idempotent: reconfigures the vectrain_ray root logger's handlers."""
    lg = logging.getLogger("vectrain_ray")
    lg.setLevel(logging.DEBUG)
    lg.propagate = False
    for h in list(lg.handlers):
        lg.removeHandler(h)
        h.close()  # reconfiguration must not leak file descriptors
    con = logging.StreamHandler()
    con.setLevel(console_level)
    con.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(name)s %(message)s"))
    lg.addHandler(con)
    if out_dir:
        ldir = os.path.join(out_dir, "logs")
        os.makedirs(ldir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(ldir, "engine.jsonl"))
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(JsonLineFormatter())
        lg.addHandler(fh)
    return lg


def log_event(logger: logging.Logger, msg: str, **fields) -> None:
    """Structured event: fields land as top-level JSON keys in the file
    sink (console shows only the message)."""
    logger.info(msg, extra={"fields": fields})


def phase_timer(logger: logging.Logger, phase: str):
    """Context manager logging a phase's wall time as a structured event."""
    class _Timer:
        def __enter__(self):
            self.t0 = time.time()
            return self

        def __exit__(self, exc_type, exc, tb):
            log_event(logger, f"phase {phase} "
                      f"{'failed' if exc else 'done'}",
                      phase=phase,
                      wall_sec=round(time.time() - self.t0, 3),
                      ok=exc is None)
            return False

    return _Timer()
