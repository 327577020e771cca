"""CLI entry point — the ``ray job submit`` target (north_rule):

    ray job submit --working-dir . -- python -m geotrellis_ray.run --config job.json
    # or locally:
    python -m geotrellis_ray.run --config job.json [--num-cpus 32]

The config is a pipeline spec (see pipelines/spec.py). Owns its Ray session
(guarded init — the test/driver contexts never route through here).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="pipeline spec JSON file")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kw = {"address": "local", "include_dashboard": False, "ignore_reinit_error": True,
              "logging_level": "ERROR"}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(**kw)
    try:
        from .pipelines.spec import run_spec

        with open(args.config) as f:
            spec = json.load(f)
        t0 = time.monotonic()
        ds = run_spec(spec)
        n = ds.count() if ds is not None else 0
        wall = time.monotonic() - t0
        print(json.dumps({"rows": n, "wall_sec": round(wall, 3)}))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
