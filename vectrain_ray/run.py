"""CLI entry point — the reference's ``vectrain --config=…`` recast
(cmd/vectrain/main.go:28-121): load+validate config, run the pipeline,
exit cleanly. Job control (the reference's /api/start|stop HTTP plane, D6)
is ``ray job submit / stop``; pause/resume is checkpoint + relaunch
(pipelines/resume.py).

    python -m vectrain_ray.run --config pipeline.json [--num-cpus N]

This module OWNS its Ray session (guarded init + shutdown); library code
never initialises Ray.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="vectrain-ray")
    ap.add_argument("--config", required=True, help="pipeline spec (YAML/JSON)")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

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
    try:
        metrics = run_from_spec(spec)
        print(json.dumps({"status": "ok", **{k: v for k, v in metrics.items()
                                             if isinstance(v, (int, str, list))}}))
        return 0
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
