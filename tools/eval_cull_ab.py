#!/usr/bin/env python
"""A/B eval renders with vs without the transmittance cull on ONE checkpoint.

--fine_cull_capacity (PERF_NOTES.md round 4) is a train-time lever by
default; --fine_cull_eval extends it to eval/test renders. This tool bounds
what that costs: load one trained checkpoint (tools/validate_train.py
output), render the held-out views with the full reference-protocol fine
pass and with the culled pass (same capacity/eps as training), and report
Δ(PSNR/SSIM/LPIPS) against ground truth plus the pixel-level difference
between the two renders and the wall-clock per arm. Unlike the bf16 A/B
(tools/eval_bf16_ab.py), the cull is a call-time static — both arms run in
one process as two separately-jitted chunk programs.

Usage:
    python tools/eval_cull_ab.py [--scene S] [--logdir L] [--capacity 0.25]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from validate_train import add_scene_args, make_cli  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capacity", type=float, default=0.25)
    ap.add_argument("--eps", type=float, default=1e-3)
    add_scene_args(ap)
    args = ap.parse_args()

    import numpy as np

    from evdeblurnerf_tpu.config import parse_args
    from evdeblurnerf_tpu.train.checkpoint import CheckpointManager
    from evdeblurnerf_tpu.train.evaluate import (apply_crf_host,
                                                 build_chunk_renderer,
                                                 render_poses)
    from evdeblurnerf_tpu.train.loop import (build_datasets, build_model,
                                             build_initial_state)
    from evdeblurnerf_tpu.utils.metrics import compute_img_metric

    cli = make_cli(args, iters=1) + [
        "--fine_cull_capacity", str(args.capacity),
        "--fine_cull_eps", str(args.eps)]
    targs = parse_args(cli)
    llff, _ = build_datasets(targs)
    _, _, model, crf = build_model(targs, llff)
    state, _ = build_initial_state(targs, llff, model, crf,
                                   crf_identity_prefit=False)
    ckpt_dir = os.path.join(args.logdir, "vtrain", "checkpoints")
    restored = CheckpointManager(ckpt_dir).restore_latest(state)
    assert restored is not None, f"no checkpoint under {ckpt_dir}"
    step, state = int(restored[0]), restored[1]

    variables = {"params": state.params["nerf"]}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    gt = np.asarray(llff.test_images)

    results = {}
    for arm, cull in (("full", False), ("cull", True)):
        chunk_fn = build_chunk_renderer(model, fine_cull=cull)
        # warm render (compile) then timed render
        for timed in (False, True):
            t0 = time.time()
            rgbs, _ = render_poses(variables, chunk_fn, llff.test_poses,
                                   llff.h, llff.w, llff.K, chunk=targs.chunk)
            dt = time.time() - t0
        rgbs = apply_crf_host(crf, state.params["crf"], rgbs)
        out = {"arm": arm, "step": step, "render_s": round(dt, 3)}
        for name in ("mse", "psnr", "ssim", "lpips"):
            v = compute_img_metric(rgbs, gt, metric=name)
            if v is not None:
                out[name] = float(v)
        results[arm] = (out, rgbs)
        print(json.dumps(out), flush=True)

    a, ra = results["full"]
    b, rb = results["cull"]
    pix = np.abs(ra.astype(np.float64) - rb.astype(np.float64))
    print(f"\ncheckpoint step {step}; capacity {args.capacity} "
          f"eps {args.eps}; held-out views {ra.shape[0]} @ "
          f"{ra.shape[1]}x{ra.shape[2]}")
    print(f"{'metric':>8} {'full pass':>12} {'culled':>12} "
          f"{'delta (cull-full)':>18}")
    for k in ("mse", "psnr", "ssim", "lpips", "render_s"):
        if k in a and k in b:
            print(f"{k:>8} {a[k]:>12.6f} {b[k]:>12.6f} {b[k] - a[k]:>18.6f}")
    print(f"pixel |cull-full|: mean {pix.mean():.2e}, p99 "
          f"{np.percentile(pix, 99):.2e}, max {pix.max():.2e}")


if __name__ == "__main__":
    main()
