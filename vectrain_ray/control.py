"""Control-plane HTTP API — the reference's runner routes, recast.

Mirrors internal/http/routes.go:17-23 + handlers/runner.go (D6):

    GET  /api/health         → liveness + loop state
    POST /api/start          → start the continuous ingest loop (409 if running)
    POST /api/stop           → graceful stop (idempotent; joins the loop)
    POST /api/configuration  → the validated pipeline spec (runner.go:42-48
                               returns cfg on POST; GET also accepted here)
    GET  /api/status         → per-phase/per-partition metrics from COMMITTED
                               state only (run._status — scrapable JSON)
    GET  /metrics            → Prometheus text format (D8). The reference
                               exposes only Go-runtime collectors
                               (internal/infra/monitoring/prometheus.go:22-26);
                               this serves actual PIPELINE counters: polls,
                               files/rows ingested, per-phase wall seconds,
                               output table rows.

Stdlib http.server only (no web framework in this container), same idiom as
sources/push.py. The server owns NO Ray session: ``serve`` (run.py) holds
the single session, the loop thread reuses it, and /api/stop only stops the
LOOP — the process and session stay up for the next /api/start, matching
the reference where start/stop toggle the pipeline inside a live daemon.
"""

from __future__ import annotations

import json
import threading
from dataclasses import asdict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _prometheus_lines(status_doc: dict) -> str:
    """Committed-state status document → Prometheus exposition text.
    Only counters/gauges derivable from durable state: restart-safe and
    identical no matter which process serves them. Exposition rule: exactly
    ONE '# TYPE' line per metric family (expfmt parsers reject a second one
    and fail the whole scrape), so all samples of a family are grouped
    under a single header."""
    lines = [
        "# TYPE vectrain_finalized gauge",
        f"vectrain_finalized {int(bool(status_doc.get('finalized')))}",
    ]
    stream = status_doc.get("stream") or {}
    for k in ("files_ingested", "rows_ingested"):
        if k in stream:
            lines += [f"# TYPE vectrain_stream_{k} counter",
                      f"vectrain_stream_{k} {stream[k]}"]
    phases = status_doc.get("phases") or {}
    for family, value_of in (
        ("vectrain_phase_wall_seconds",
         lambda d: d.get("total_wall_sec", 0)),
        ("vectrain_phase_rows", lambda d: d.get("total_rows", 0)),
        ("vectrain_phase_completed_parts",
         lambda d: len(d.get("completed_parts", []))),
    ):
        if phases:
            lines.append(f"# TYPE {family} gauge")
            lines += ['%s{phase="%s"} %s' % (family, phase, value_of(doc))
                      for phase, doc in phases.items()]
    out_rows = status_doc.get("output_rows") or {}
    if out_rows:
        lines.append("# TYPE vectrain_output_rows gauge")
        lines += ['vectrain_output_rows{table="%s"} %s' % (tbl, rows)
                  for tbl, rows in out_rows.items()]
    return "\n".join(lines) + "\n"


class ControlServer:
    """start/stop/health/configuration/status/metrics over one StreamDriver.

    The loop runs in a daemon thread; /api/stop sets ``stop_event`` which the
    driver checks BETWEEN micro-batches (graceful — the in-flight batch
    commits its manifests, so stop+start is lossless, unlike the reference's
    Stop which can drop the un-acked tail, SURVEY.md §3)."""

    def __init__(self, spec, host: str = "127.0.0.1", port: int = 0,
                 metrics_port: int | None = None):
        self.spec = spec
        self.stop_event = threading.Event()
        self._loop_t: threading.Thread | None = None
        self._lock = threading.Lock()  # handler threads race start/stop
        self.polls = 0
        self.loop_error: str | None = None
        self._status_cache: tuple[dict, int | None, float] | None = None
        server_self = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _reply(self, code: int, doc: dict, text: str | None = None):
                body = (text.encode() if text is not None
                        else json.dumps(doc).encode())
                self.send_response(code)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4" if text is not None
                                 else "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/api/health":
                    self._reply(200, server_self.health())
                elif self.path == "/api/status":
                    self._reply(200, server_self.status())
                elif self.path == "/api/configuration":
                    self._reply(200, asdict(server_self.spec))
                elif self.path == "/metrics":
                    self._reply(200, {},
                                text=_prometheus_lines(server_self.status()))
                else:
                    self._reply(404, {"error": "not found"})

            def do_POST(self):
                if self.path == "/api/start":
                    code, doc = server_self.start_loop()
                    self._reply(code, doc)
                elif self.path == "/api/stop":
                    self._reply(200, server_self.stop_loop())
                elif self.path == "/api/configuration":
                    self._reply(200, asdict(server_self.spec))
                else:
                    self._reply(404, {"error": "not found"})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address

        # Standalone metrics listener (the reference serves /metrics on its
        # OWN port, isolated from the app server — internal/infra/monitoring/
        # prometheus.go:17-32): a scrape stays responsive even when the
        # control plane is busy. Opt-in via metrics_port (0 = ephemeral).
        self._metrics_httpd = None
        self.metrics_port: int | None = None
        if metrics_port is not None:

            class MetricsHandler(BaseHTTPRequestHandler):
                def log_message(self, *args):  # quiet
                    pass

                def do_GET(self):
                    if self.path != "/metrics":
                        self.send_response(404)
                        self.send_header("Content-Length", "0")
                        self.end_headers()
                        return
                    body = _prometheus_lines(server_self.status()).encode()
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "text/plain; version=0.0.4")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)

            self._metrics_httpd = ThreadingHTTPServer(
                (host, metrics_port), MetricsHandler)
            self.metrics_port = self._metrics_httpd.server_address[1]

    # --- loop control -----------------------------------------------------
    def _running(self) -> bool:
        return self._loop_t is not None and self._loop_t.is_alive()

    def _loop(self):
        try:
            from .config import stream_driver_from_spec

            drv = stream_driver_from_spec(self.spec)
            def _bump(_m):  # live progress for /api/health mid-run
                self.polls += 1

            drv.run(stop_event=self.stop_event, on_poll=_bump)
        except BaseException as exc:  # noqa: BLE001 — surface via /api/health
            self.loop_error = f"{type(exc).__name__}: {exc}"

    def start_loop(self) -> tuple[int, dict]:
        with self._lock:
            if self._running():
                return 409, {"status": "already_running"}  # Start is not
                # re-entrant: one loop per daemon, like the reference's
                # single pipeline instance
            self.stop_event.clear()
            self.loop_error = None
            self._loop_t = threading.Thread(target=self._loop, daemon=True)
            self._loop_t.start()
            return 200, {"status": "started"}

    def stop_loop(self, join_timeout: float = 600.0) -> dict:
        with self._lock:
            t = self._loop_t
            if t is None or not t.is_alive():
                return {"status": "stopped", "polls": self.polls}  # idempotent
            self.stop_event.set()
        t.join(timeout=join_timeout)  # graceful: waits out the in-flight
        # micro-batch (manifests commit last)
        return {"status": "stopped" if not t.is_alive() else "stopping",
                "polls": self.polls}

    # --- documents --------------------------------------------------------
    def health(self) -> dict:
        doc = {"status": "ok", "running": self._running(),
               "polls": self.polls}
        if self.loop_error:
            doc["status"] = "error"
            doc["loop_error"] = self.loop_error
        return doc

    def status(self) -> dict:
        """Status doc with a short TTL cache: _status globs the output dir
        and reads every parquet footer + manifest, which is fine as a
        one-shot CLI but not per-scrape on a daemon (a 15s Prometheus
        interval against a 25M-turn out_dir would re-open hundreds of files
        forever). 5s TTL bounds the cost; a finalized idle out_dir is
        additionally immutable, so its cached doc is reused until the
        _FINAL_DONE mtime changes (a new run invalidates it)."""
        import os
        import time

        from .run import _status

        running = self._running()
        marker = os.path.join(self.spec.sink.out_dir, "_FINAL_DONE")
        try:
            mkey = os.stat(marker).st_mtime_ns
        except OSError:
            mkey = None
        now = time.monotonic()
        cached = self._status_cache
        if cached is not None:
            doc, key, at = cached
            fresh = (now - at) < 5.0 or (
                not running and key == mkey and mkey is not None)
            if fresh and key == mkey:
                out = dict(doc)
                out["running"] = running
                return out
        doc = _status(self.spec.sink.out_dir)
        self._status_cache = (doc, mkey, now)
        doc = dict(doc)
        doc["running"] = running
        return doc

    # --- lifecycle --------------------------------------------------------
    def start(self) -> "ControlServer":
        self._serve_t = threading.Thread(target=self._httpd.serve_forever,
                                         daemon=True)
        self._serve_t.start()
        if self._metrics_httpd is not None:
            self._metrics_t = threading.Thread(
                target=self._metrics_httpd.serve_forever, daemon=True)
            self._metrics_t.start()
        return self

    def stop(self) -> None:
        """Shut the HTTP side, then the loop (graceful, tail committed)."""
        self._httpd.shutdown()
        if self._metrics_httpd is not None:
            self._metrics_httpd.shutdown()
        self.stop_loop()
        self._httpd.server_close()
        if self._metrics_httpd is not None:
            self._metrics_httpd.server_close()
