#!/usr/bin/env python
"""A/B the default bf16 eval-render chain vs f32 on an IDENTICAL checkpoint.

VERDICT r3 Weak #3: test metrics are computed from bf16-chain eval renders
by default (`triplane_bf16` + the eval-only `_eval_bf16` gate routes
interpolation arithmetic and the double-angle PE through bf16), but the
quality gate was a 2k-iter *training* A/B — the metric-measurement bias of
the eval chain itself was never bounded. The reference's eval protocol is
f32 end-to-end (ref: run_nerf.py:642-709).

This tool loads ONE trained checkpoint (from tools/validate_train.py) and
renders the held-out views twice — once with the default bf16 chain, once
with EVDN_EVAL_F32_INTERP=1 (the chain's escape hatch) — and reports
Δ(PSNR/SSIM/LPIPS) between the two metric sets plus the pixel-level
difference between the two renders. The env var is read at trace time, so
each arm runs in its own subprocess.

Usage:
    python tools/eval_bf16_ab.py [--scene S] [--logdir L]     # both arms
    python tools/eval_bf16_ab.py --arm bf16|f32 ...           # one arm
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from validate_train import add_scene_args, make_cli  # noqa: E402


def run_arm(args, arm: str):
    import jax
    import numpy as np

    from evdeblurnerf_tpu.config import parse_args
    from evdeblurnerf_tpu.train.checkpoint import CheckpointManager
    from evdeblurnerf_tpu.train.evaluate import (apply_crf_host,
                                                 build_chunk_renderer,
                                                 render_poses)
    from evdeblurnerf_tpu.train.loop import (build_datasets, build_model,
                                             build_initial_state)
    from evdeblurnerf_tpu.utils.metrics import compute_img_metric

    cli = make_cli(args, iters=1)
    targs = parse_args(cli)
    llff, _ = build_datasets(targs)
    _, _, model, crf = build_model(targs, llff)
    # no CRF identity pre-fit here: the restored checkpoint overwrites all
    # params anyway and the pre-fit costs a minute of TPU compile
    state, _ = build_initial_state(targs, llff, model, crf,
                                   crf_identity_prefit=False)
    ckpt_dir = os.path.join(args.logdir, "vtrain", "checkpoints")
    restored = CheckpointManager(ckpt_dir).restore_latest(state)
    assert restored is not None, f"no checkpoint under {ckpt_dir}"
    step, state = int(restored[0]), restored[1]

    variables = {"params": state.params["nerf"]}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    chunk_fn = build_chunk_renderer(model)
    rgbs, _ = render_poses(variables, chunk_fn, llff.test_poses,
                           llff.h, llff.w, llff.K, chunk=targs.chunk)
    rgbs = apply_crf_host(crf, state.params["crf"], rgbs)
    gt = np.asarray(llff.test_images)

    out = {"arm": arm, "step": step,
           "f32_env": os.environ.get("EVDN_EVAL_F32_INTERP", "")}
    for name in ("mse", "psnr", "ssim", "lpips"):
        v = compute_img_metric(rgbs, gt, metric=name)
        if v is not None:
            out[name] = float(v)
    np.save(os.path.join(args.logdir, f"render_{arm}.npy"), rgbs)
    print(json.dumps(out))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", choices=["bf16", "f32"])
    add_scene_args(ap)
    args = ap.parse_args()

    if args.arm:
        env = args.arm == "f32"
        got = os.environ.get("EVDN_EVAL_F32_INTERP", "")
        assert bool(got) == env, (args.arm, got)
        run_arm(args, args.arm)
        return

    import numpy as np

    results = {}
    for arm in ("bf16", "f32"):
        env = dict(os.environ)
        env.pop("EVDN_EVAL_F32_INTERP", None)
        if arm == "f32":
            env["EVDN_EVAL_F32_INTERP"] = "1"
        cmd = [sys.executable, os.path.abspath(__file__), "--arm", arm,
               "--scene", args.scene, "--logdir", args.logdir]
        p = subprocess.run(cmd, env=env, capture_output=True, text=True)
        if p.returncode:
            sys.stderr.write(p.stdout + p.stderr)
            raise SystemExit(f"{arm} arm failed")
        results[arm] = json.loads(p.stdout.strip().splitlines()[-1])
        print(f"[{arm}] {results[arm]}", flush=True)

    a, b = results["bf16"], results["f32"]
    assert a["step"] == b["step"]
    r_bf16 = np.load(os.path.join(args.logdir, "render_bf16.npy"))
    r_f32 = np.load(os.path.join(args.logdir, "render_f32.npy"))
    pix = np.abs(r_bf16.astype(np.float64) - r_f32.astype(np.float64))
    print(f"\ncheckpoint step {a['step']}; held-out views "
          f"{r_bf16.shape[0]} @ {r_bf16.shape[1]}x{r_bf16.shape[2]}")
    print(f"{'metric':>8} {'bf16 chain':>12} {'f32 chain':>12} "
          f"{'delta (bf16-f32)':>18}")
    for k in ("mse", "psnr", "ssim", "lpips"):
        if k in a and k in b:
            print(f"{k:>8} {a[k]:>12.6f} {b[k]:>12.6f} {a[k] - b[k]:>18.6f}")
    print(f"pixel |bf16-f32|: mean {pix.mean():.2e}, p99 "
          f"{np.percentile(pix, 99):.2e}, max {pix.max():.2e}")


if __name__ == "__main__":
    main()
