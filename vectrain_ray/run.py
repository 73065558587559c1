"""CLI entry point — the reference's ``vectrain --config=…`` + HTTP control
plane recast (cmd/vectrain/main.go:28-121; internal/http/routes.go:17-23).

Subcommands (the D6 control-plane surface):

    python -m vectrain_ray.run run    --config pipeline.json [--num-cpus N]
    python -m vectrain_ray.run stream --config pipeline.json [--num-cpus N]
                                      [--max-iterations N] [--idle-stop-after N]
                                      [--poll-sec S]
    python -m vectrain_ray.run status --out-dir OUT
    python -m vectrain_ray.run serve  --config pipeline.json [--port P]
                                      [--autostart]   # HTTP control plane
                                      # (control.py: /api/start /api/stop
                                      #  /api/health /api/status /metrics)

``run`` = the reference's /api/start (one bounded pipeline); ``stream`` =
the unbounded micro-batch loop (the Kafka consume loop; stop with SIGINT or
the bounded flags — the /api/stop analogue, since checkpointed state makes
kill+rerun lossless); ``status`` = the health/introspection + metrics
endpoint (routes.go /health, monitoring/prometheus.go): it reads ONLY the
committed manifests/offset store — no Ray session — and prints per-phase,
per-partition metrics as one JSON document, suitable for scraping.

This module OWNS its Ray session (guarded init + shutdown); library code
never initialises Ray.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _status(out_dir: str) -> dict:
    """Assemble the introspection document from committed state only."""
    from .state.manifest import PartitionManifest

    doc: dict = {"out_dir": out_dir, "exists": os.path.isdir(out_dir)}
    if not doc["exists"]:
        return doc
    phases: dict = {}
    for name, key in (("p1_extract", "p1"), ("p3_link", "p3")):
        mdir = os.path.join(out_dir, name, "_manifest")
        if not os.path.isdir(mdir):
            continue
        man = PartitionManifest(os.path.join(out_dir, name))
        # the pipeline may invalidate a manifest between completed_parts()
        # and load() (mapping rebuild) — treat a vanished part as absent
        parts = {}
        for p in man.completed_parts():
            try:
                meta = man.load(p)
            except OSError:
                meta = None
            if meta is not None:
                parts[p] = meta
        phases[key] = {
            "completed_parts": sorted(parts),
            "partitions": parts,
            "total_wall_sec": round(
                sum(v.get("wall_sec", 0) for v in parts.values()), 3),
            "total_rows": sum(
                v.get("rows_out", v.get("triples_out", 0))
                for v in parts.values()),
        }
    doc["phases"] = phases
    doc["mapping_done"] = os.path.exists(
        os.path.join(out_dir, "mapping", "_DONE"))
    doc["finalized"] = os.path.exists(os.path.join(out_dir, "_FINAL_DONE"))
    offsets_path = os.path.join(out_dir, "stream_offsets.json")
    if os.path.exists(offsets_path):
        offsets = {k: v for k, v in json.load(open(offsets_path)).items()
                   if not k.startswith("__")}  # skip the __completed__ marker
        doc["stream"] = {
            "files_ingested": len(offsets),
            "rows_ingested": sum(v.get("rows", 0) for v in offsets.values()),
            "last_ingested_at": max(
                (v.get("ingested_at", 0) for v in offsets.values()),
                default=None),
        }
    out_rows: dict = {}
    for tbl in ("edges", "nodes"):
        files = glob.glob(os.path.join(out_dir, tbl, "**", "*.parquet"),
                          recursive=True)
        if files:
            import pyarrow.parquet as pq

            n = 0
            for f in files:
                try:  # finalize may be rewriting these files concurrently
                    n += pq.read_metadata(f).num_rows
                except Exception:  # noqa: BLE001 — half-written/removed
                    continue
            out_rows[tbl] = n
    doc["output_rows"] = out_rows
    return doc


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    # back-compat: bare `--config …` means `run --config …`
    if argv and argv[0].startswith("--"):
        argv = ["run"] + argv

    ap = argparse.ArgumentParser(prog="vectrain-ray")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_run = sub.add_parser("run", help="one bounded pipeline run")
    p_run.add_argument("--config", required=True)
    p_run.add_argument("--num-cpus", type=int, default=None)
    p_st = sub.add_parser("stream", help="unbounded micro-batch watch loop")
    p_st.add_argument("--config", required=True)
    p_st.add_argument("--num-cpus", type=int, default=None)
    p_st.add_argument("--max-iterations", type=int, default=None)
    p_st.add_argument("--idle-stop-after", type=int, default=None)
    p_st.add_argument("--poll-sec", type=float, default=2.0)
    p_q = sub.add_parser("status", help="introspection from committed state")
    p_q.add_argument("--out-dir", required=True)
    p_p = sub.add_parser("push", help="HTTP push-ingest server → landing dir")
    p_p.add_argument("--landing-dir", required=True)
    p_p.add_argument("--port", type=int, default=8080)
    p_p.add_argument("--queue-cap", type=int, default=1000)
    p_p.add_argument("--status-out-dir", default=None)
    p_sv = sub.add_parser("serve", help="control-plane HTTP daemon "
                          "(/api/start /api/stop /api/health /metrics)")
    p_sv.add_argument("--config", required=True)
    p_sv.add_argument("--num-cpus", type=int, default=None)
    p_sv.add_argument("--port", type=int, default=8081)
    p_sv.add_argument("--metrics-port", type=int, default=None,
                      help="serve /metrics on its OWN port, isolated from "
                      "the control plane (the reference's standalone "
                      "prometheus listener); 0 = ephemeral")
    p_sv.add_argument("--autostart", action="store_true",
                      help="begin the ingest loop immediately")
    p_qr = sub.add_parser("query", help="run a registered operator pipeline "
                          "over a testdata dir")
    p_qr.add_argument("--name", default=None,
                      help="operator name (omit with --list)")
    p_qr.add_argument("--list", action="store_true",
                      help="list registered operators and exit")
    p_qr.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_qr.add_argument("--out", default=None,
                      help="write result parquet here instead of printing")
    p_qr.add_argument("--limit", type=int, default=20,
                      help="rows to print when not writing")
    p_qr.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    if args.cmd == "status":  # no Ray session needed
        print(json.dumps(_status(args.out_dir)))
        return 0

    if args.cmd == "query":
        from .pipelines.queries import QUERIES

        if args.list or not args.name:
            print(json.dumps({"operators": sorted(QUERIES)}))
            return 0
        if args.name not in QUERIES:
            print(json.dumps({"error": f"unknown operator {args.name!r}",
                              "operators": sorted(QUERIES)}))
            return 2

        import ray

        owns = not ray.is_initialized()
        if owns:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, ignore_reinit_error=True,
                     logging_level="ERROR")
        from .tuning import apply_data_context

        apply_data_context()
        try:
            # every registered operator returns a ray.data.Dataset; pin it
            # ONCE — lazy Datasets re-execute per consumer, so count() after
            # write/limit would otherwise run the whole pipeline twice
            res = QUERIES[args.name](args.sf_dir).materialize()
            n = res.count()
            if args.out:
                res.write_parquet(args.out)
                print(json.dumps({"status": "ok", "name": args.name,
                                  "rows": n, "out": args.out}))
                return 0
            df = res.limit(args.limit).to_pandas()
            print(json.dumps({"status": "ok", "name": args.name, "rows": n,
                              "head": json.loads(
                                  df.to_json(orient="records",
                                             date_format="iso"))}))
            return 0
        finally:
            if owns:
                ray.shutdown()

    if args.cmd == "push":  # no Ray session needed (ingest is decoupled)
        import time

        from .sources.push import PushServer

        srv = PushServer(args.landing_dir, port=args.port,
                         queue_cap=args.queue_cap,
                         status_out_dir=args.status_out_dir).start()
        print(json.dumps({"status": "serving", "host": srv.host,
                          "port": srv.port}), flush=True)
        try:
            while True:
                time.sleep(1)
        except KeyboardInterrupt:
            pass
        finally:
            srv.stop()  # tail flush
        print(json.dumps({"status": "stopped", "accepted": srv.accepted,
                          "rejected_full": srv.rejected_full}))
        return 0

    from .config import PipelineSpec, run_from_spec

    spec = PipelineSpec.load(args.config)  # fail fast, before ray.init

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from .tuning import apply_data_context

    apply_data_context()
    from .logs import setup_logging

    setup_logging(spec.sink.out_dir)
    try:
        if args.cmd == "serve":
            import time

            from .control import ControlServer

            srv = ControlServer(spec, port=args.port,
                                metrics_port=args.metrics_port).start()
            if args.autostart:
                srv.start_loop()
            print(json.dumps({"status": "serving", "host": srv.host,
                              "port": srv.port,
                              "metrics_port": srv.metrics_port,
                              "running": args.autostart}), flush=True)
            try:
                while True:
                    time.sleep(1)
            except KeyboardInterrupt:
                pass
            finally:
                srv.stop()  # graceful: in-flight micro-batch commits
            print(json.dumps({"status": "stopped", "polls": srv.polls}))
            return 0
        if args.cmd == "stream":
            from .config import stream_driver_from_spec

            drv = stream_driver_from_spec(spec, poll_sec=args.poll_sec)
            history = drv.run(max_iterations=args.max_iterations,
                              idle_stop_after=args.idle_stop_after)
            print(json.dumps({"status": "ok", "polls": len(history),
                              "new_files": sum(h["new_files"]
                                               for h in history)}))
            return 0
        metrics = run_from_spec(spec)
        print(json.dumps({"status": "ok", **{k: v for k, v in metrics.items()
                                             if isinstance(v, (int, str, list))}}))
        return 0
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
