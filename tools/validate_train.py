#!/usr/bin/env python
"""Reproducible training-quality validation on the synthetic scene.

Generates the blur+events synthetic scene (tests/synthetic.py) at a
medium resolution and trains the full method (RBK+AWP+EGM+EDI+CRF) for
--iters iterations via the standard CLI pipeline, printing the held-out
metrics trajectory. Used after perf changes that touch backward numerics
to confirm the trajectory still matches PERF_NOTES.md's tables.

Usage: python tools/validate_train.py [--iters 2000] [--scene /tmp/scene]
       [--logdir /tmp/vtrain] [extra run_nerf flags...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# honor an explicit JAX_PLATFORMS even when a sitecustomize pre-pins the
# backend via jax.config (the env var alone is silently overridden there)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def add_scene_args(ap):
    ap.add_argument("--scene", default="/tmp/vtrain_scene")
    ap.add_argument("--logdir", default="/tmp/vtrain_logs")
    ap.add_argument("--h", type=int, default=96)
    ap.add_argument("--w", type=int, default=128)
    ap.add_argument("--n_imgs", type=int, default=6)
    ap.add_argument("--geometry", default="sphere",
                    choices=["sphere", "boxes"],
                    help="synthetic scene geometry (boxes = two boxes + "
                         "ground plane; second-scene screen for the "
                         "sampling-cull defaults)")
    ap.add_argument("--cdavis", action="store_true",
                    help="color-DAVIS path: rectified float event coords + "
                         "ev_map, Bayer one-hot color EGM, color-pos-neg "
                         "BII CRF features (ref cdavis configs)")
    ap.add_argument("--kernel", default="rbk",
                    choices=["rbk", "dsk", "pbe", "none"],
                    help="blur-kernel profile: rbk = RBK+AWP (every "
                         "published reference config); dsk/pbe = the "
                         "ancestral kernels without AWP (matching the "
                         "round-3 long-horizon validation runs); none = "
                         "sharp-frame ablation. Shared by "
                         "tools/run_reference_e2e.py so both frameworks "
                         "get the identical flag set")


def ensure_scene(args):
    if not os.path.exists(os.path.join(args.scene, "events.h5")):
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "tests"))
        from synthetic import make_synthetic_scene
        make_synthetic_scene(args.scene, n_imgs=args.n_imgs, h=args.h,
                             w=args.w, focal=float(args.w),
                             poses_per_image=4, seed=0,
                             rectified_coords=args.cdavis,
                             geometry=getattr(args, "geometry", "sphere"))
        print("scene written to", args.scene, flush=True)


def make_cli(args, iters):
    """The validation run's full flag set (shared with tools/eval_bf16_ab.py
    so the A/B rebuilds the EXACT training configuration)."""
    cli = [
        "--expname", "vtrain",
        "--basedir", args.logdir,
        "--datadir", args.scene,
        "--dataset_type", "llff",
        "--factor", "1", "--llffhold", "6",
        "--events_tms_unit", "us", "--events_tms_files_unit", "us",
        "--no_wandb",
        "--N_iters", str(iters),
        "--N_rand", "256", "--N_samples", "64", "--N_importance", "64",
        "--mode", "c2f",
        "--coarse_n_voxels", "1000000", "--fine_n_voxels", "8000000",
    ]
    kernel = getattr(args, "kernel", "rbk")
    if kernel == "rbk":
        cli += [
            "--kernel_type", "RBK", "--kernel_ptnum", "5",
            "--kernel_rbk_use_origin",
            "--kernel_use_awp", "--kernel_img_embed", "32",
            # every published AWP config sets sam_emb_width=64; the
            # reference MAM hardcodes Linear(64,32) (ref
            # networks/dpnerf/mam.py:60) and CRASHES at the options
            # default of 32, so 64 is the only width the reference can
            # actually run -- required for run_reference_e2e.py
            "--kernel_awp_sam_emb_width", "64",
        ]
    elif kernel in ("dsk", "pbe"):
        cli += [
            "--kernel_type", kernel.upper(), "--kernel_ptnum", "5",
            "--kernel_img_embed", "32",
        ]
    else:
        cli += ["--kernel_type", "none"]
    cli += [
        "--kernel_start_iter", "300",
        "--use_viewdirs",
        "--use_events", "--events_N_rand", "1024", "--add_event_egm",
        "--tone_mapping_events_type", "learn",
        "--tone_mapping_type", "gamma",
        "--i_testset", "500", "--i_print", "100", "--i_weights", "100000",
        "--lrate_decay", "10",
    ]
    if args.cdavis:
        cli += [
            "--event_egm_use_colorevents",
            "--event_egm_use_color_weights", "0.4 0.2 0.4",
            "--event_egm_color_weights_start_iter", "300",
            "--tone_mapping_events_add_bii", "color-pos-neg",
        ]
    return cli


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    add_scene_args(ap)
    args, extra = ap.parse_known_args()
    ensure_scene(args)

    from evdeblurnerf_tpu.config import parse_args
    from evdeblurnerf_tpu.train.loop import train

    train(parse_args(make_cli(args, args.iters) + extra))


if __name__ == "__main__":
    main()
