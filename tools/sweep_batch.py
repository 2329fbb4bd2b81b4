#!/usr/bin/env python
"""Batch-size / steps-in-flight / flag headroom sweep (PERF_NOTES round 3).

Runs bench.run() across configurations to answer:
- does a bigger ray batch (with grad_accum scaled to keep HBM fits)
  amortize the fixed row-issue cost sub-linearly?
- does keeping 2 steps in flight hide the per-step host sync RTT?
- does --triplane_line_matmul (one-hot MXU line rows) win in the full step?

Usage: python tools/sweep_batch.py [--quick]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer iters")
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of sweep names")
    args = ap.parse_args()

    import bench

    iters = 5 if args.quick else 10
    # line_matmul and steps_in_flight=2 are the DEFAULTS now (landed round
    # 3); the ablation entries explicitly turn them OFF so the contrasts
    # stay measurable
    sweeps = [
        ("default", dict()),
        ("no_line_matmul", dict(
            arg_overrides={"triplane_line_matmul": False})),
        ("flight1", dict(steps_in_flight=1)),
        ("no_line_matmul_flight1", dict(
            steps_in_flight=1,
            arg_overrides={"triplane_line_matmul": False})),
        ("acc1", dict(grad_accum=1)),
        ("batch_2048_acc4", dict(n_rand=2048, events_n_rand=8192,
                                 grad_accum=4)),
        ("batch_4096_acc8", dict(n_rand=4096, events_n_rand=16384,
                                 grad_accum=8)),
        ("batch_2048_acc2", dict(n_rand=2048, events_n_rand=8192,
                                 grad_accum=2)),
    ]
    only = set(args.only.split(",")) if args.only else None

    results = {}
    for name, kw in sweeps:
        if only and name not in only:
            continue
        try:
            res = bench.run(iters=iters, **kw)
            results[name] = {
                "rays_per_sec": round(res["rays_per_sec"], 1),
                "step_s": round(res["step_seconds"], 4),
                "rays_per_iter": res["rays_per_iter"],
                "eval_rays_per_sec": round(res["eval_rays_per_sec"], 1),
            }
        except Exception as e:  # OOM etc. — record, keep sweeping
            results[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
