"""HTTP push source + control plane — the reference's echo server recast.

Mirrors internal/app/sources/http/client.go:78-112 (POST /source/send:
JSON → record, empty-text 400, bounded queue, **429 when full**) and
internal/http/routes.go:17-23 (/api/health, /api/status). Stdlib-only
(http.server) — no web framework in this container.

Dataflow: accepted records go into a bounded in-memory queue; a flusher
thread drains them into parquet micro-batch files in a LANDING DIRECTORY —
the same directory pipelines/stream.StreamDriver watches. Push ingest is
therefore fully decoupled from processing: the HTTP server provides
admission control (the reference's only admission operator), the landing
files provide durability, and the stream driver's offset store provides
exactly-once processing. At scale, run many push servers writing to the
same (prefix-partitioned) landing area; files are the unit of ingest.

    srv = PushServer(landing_dir, queue_cap=1000, flush_rows=500)
    srv.start()            # serves on 127.0.0.1:<port>
    ... POST /source/send {"conv_id": "...", "turn_idx": 0, "text": "..."}
    srv.stop()             # drains the queue to a final file

Record schema = the transcript input hint (conv_id, turn_idx, text; extra
keys ignored — the reference's unknown-payload-keys-dropped semantics,
qdrant/store.go:53-89).
"""

from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pyarrow.parquet as pq

_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("text", pa.string()),
])


class PushServer:
    """Bounded-queue push-ingest server writing landing parquet files."""

    def __init__(self, landing_dir: str, host: str = "127.0.0.1",
                 port: int = 0, queue_cap: int = 1000, flush_rows: int = 500,
                 flush_sec: float = 1.0, status_out_dir: str | None = None):
        import os

        os.makedirs(landing_dir, exist_ok=True)
        self.landing_dir = landing_dir
        self.queue: queue.Queue = queue.Queue(maxsize=queue_cap)
        self.flush_rows = flush_rows
        self.flush_sec = flush_sec
        self.status_out_dir = status_out_dir
        self.accepted = 0
        self.rejected_full = 0
        self.rejected_bad = 0
        self._counter_lock = threading.Lock()  # handler threads race +=
        self._files_written = 0
        self._stop = threading.Event()
        self._status_at = 0.0  # TTL cache — same rationale as control.py:
        self._status_doc: dict = {}  # a scrape must not re-open every
        self._status_lock = threading.Lock()  # footer per request
        server_self = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _reply(self, code: int, doc: dict):
                body = json.dumps(doc).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/api/health":
                    self._reply(200, {"status": "ok",
                                      "queued": server_self.queue.qsize(),
                                      "accepted": server_self.accepted})
                elif self.path == "/api/status":
                    out = server_self.status_out_dir
                    if not out:
                        self._reply(200,
                                    {"error": "no status_out_dir configured"})
                    else:
                        self._reply(200, server_self._status_cached(out))
                else:
                    self._reply(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/source/send":
                    self._reply(404, {"error": "not found"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    if n < 0 or n > 10_000_000:
                        # admission control includes the BODY: a huge (or
                        # negative → read-to-EOF) Content-Length must not
                        # buffer unbounded bytes in the handler thread
                        with server_self._counter_lock:
                            server_self.rejected_bad += 1
                        self._reply(413, {"error": "body too large"})
                        return
                    rec = json.loads(self.rfile.read(n))
                    if not isinstance(rec, dict):  # '[1,2]' / '"x"' → 400
                        raise ValueError("record must be a JSON object")
                    text = rec.get("text", "")
                    if not isinstance(text, str) or text == "":
                        with server_self._counter_lock:
                            server_self.rejected_bad += 1
                        self._reply(400, {"error": "empty text"})  # client.go:90-97
                        return
                    cv = rec.get("conv_id")
                    # JSON null → "" (str(None) would mint a fake "None"
                    # conversation; stream.py buckets null conv as "" too)
                    row = {"conv_id": "" if cv is None else str(cv),
                           "turn_idx": int(rec.get("turn_idx", 0)),
                           "text": text}
                except (ValueError, TypeError, json.JSONDecodeError):
                    with server_self._counter_lock:
                        server_self.rejected_bad += 1
                    self._reply(400, {"error": "bad record"})
                    return
                try:
                    server_self.queue.put_nowait(row)
                except queue.Full:
                    with server_self._counter_lock:
                        server_self.rejected_full += 1
                    self._reply(429, {"error": "queue_full"})  # client.go:99-111
                    return
                with server_self._counter_lock:
                    server_self.accepted += 1
                self._reply(200, {"status": "queued"})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address

    def _status_cached(self, out_dir: str, ttl: float = 5.0) -> dict:
        from ..run import _status

        with self._status_lock:
            now = time.time()
            if now - self._status_at > ttl:
                try:
                    self._status_doc = _status(out_dir)
                except Exception as exc:  # noqa: BLE001 — scrape-safe
                    self._status_doc = {"error": f"{type(exc).__name__}: "
                                                 f"{exc}"}
                self._status_at = now
            return self._status_doc

    # --- flusher ----------------------------------------------------------
    def _flush(self, rows: list) -> None:
        if not rows:
            return
        import os

        t = pa.Table.from_pylist(rows, schema=_SCHEMA)
        name = f"push_{int(time.time() * 1000):013d}_{self._files_written:06d}.parquet"
        tmp = os.path.join(self.landing_dir, "." + name + ".tmp")
        pq.write_table(t, tmp)
        os.replace(tmp, os.path.join(self.landing_dir, name))  # atomic:
        # the stream driver never sees a half-written landing file
        self._files_written += 1

    def _flusher_loop(self):
        # buf is bounded by flush_rows, so total in-memory rows are bounded
        # by queue_cap + flush_rows — the queue cap is the REAL backpressure
        # bound (if the flusher can't keep up, producers get 429s)
        buf: list = []
        last = time.time()
        while True:
            try:
                buf.append(self.queue.get(timeout=0.05))
            except queue.Empty:
                if self._stop.is_set():
                    self._flush(buf)  # tail flush (pipeline.go:193-209)
                    return
            if len(buf) >= self.flush_rows or (
                    buf and time.time() - last >= self.flush_sec):
                self._flush(buf)
                buf, last = [], time.time()

    # --- lifecycle --------------------------------------------------------
    def start(self, auto_flush: bool = True) -> "PushServer":
        """``auto_flush=False`` starts only the HTTP side (tests use it to
        exercise the 429 path deterministically; stop() still drains)."""
        self._serve_t = threading.Thread(target=self._httpd.serve_forever,
                                         daemon=True)
        self._serve_t.start()
        self._flush_t = None
        if auto_flush:
            self._flush_t = threading.Thread(target=self._flusher_loop,
                                             daemon=True)
            self._flush_t.start()
        return self

    def stop(self) -> None:
        """Graceful: stop accepting, drain the queue to a final landing file
        (the reference's tail flush, pipeline.go:193-209)."""
        self._httpd.shutdown()
        # join in-flight handler threads BEFORE stopping the flusher: a
        # handler mid-do_POST may still enqueue + ack a row, and the tail
        # flush must include every acknowledged row (ThreadingHTTPServer
        # tracks handler threads; server_close joins them)
        self._httpd.server_close()
        self._stop.set()
        if self._flush_t is not None:
            self._flush_t.join(timeout=30)
        else:
            self._flusher_loop()  # drain inline
