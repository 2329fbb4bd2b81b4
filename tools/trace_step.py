#!/usr/bin/env python
"""Capture a jax.profiler trace of the full train step and print the
per-HLO-op time aggregation (via xprof's hlo_stats converter).

Usage: python tools/trace_step.py [outdir]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step():
    """Same workload as bench.py; returns a zero-arg callable running one
    full train step with host sync."""
    import jax
    import numpy as np

    from evdeblurnerf_tpu.config import default_args
    from evdeblurnerf_tpu.models.renderer import RenderConfig
    from evdeblurnerf_tpu.models.system import (EvDeblurNeRF,
                                                kernel_config_from_args)
    from evdeblurnerf_tpu.models.tonemapping import TonemappingTransform
    from evdeblurnerf_tpu.train.optim import build_optimizer
    from evdeblurnerf_tpu.train.state import create_train_state
    from evdeblurnerf_tpu.train.step import (build_train_step,
                                             compute_schedule_weights)
    from evdeblurnerf_tpu.utils.misc import annealing_interpolator

    rng = np.random.default_rng(0)
    H, W, focal = 480, 640, 500.0
    N_RAND, PTNUM, EV_N = 1024, 10, 4096
    args = default_args(
        N_rand=N_RAND, events_N_rand=EV_N,
        N_samples=64, N_importance=64, mode="c2f",
        kernel_type="RBK", kernel_ptnum=PTNUM, kernel_rbk_use_origin=True,
        kernel_use_awp=True, kernel_img_embed=32,
        kernel_rbk_extra_feat_ch=0, kernel_start_iter=0,
        use_viewdirs=True, use_events=True, add_event_egm=True,
        add_event_egm_stages=["stage0", "stage1"],
        tone_mapping_events_type="learn",
        tone_mapping_events_add_bii="pos-neg",
        lrate=5e-3, lrate_decay=10, seed=0,
        remat=False, grad_accum=int(os.environ.get('GRAD_ACCUM', '2')),
        triplane_line_matmul=os.environ.get(
            'LINE_MATMUL', '1') not in ('0', 'false', 'False', ''),
    )
    args.events_threshold_pos = args.events_threshold
    args.events_threshold_neg = args.events_threshold
    cfg = RenderConfig(
        mode="c2f", N_samples=64, N_importance=64, use_viewdirs=True,
        multires=10, multires_views=4, ndc=True, near=0.0, far=1.0,
        H=H, W=W, focal=focal,
        aabb=((-1.6, -1.7, -1.0), (1.7, 1.6, 1.0)),
        coarse_n_voxels=16777248, fine_n_voxels=134217984,
        coarse_app_n_comp=(64, 16, 16), fine_app_n_comp=(64, 16, 16),
        coarse_hidden_dim=64, coarse_hidden_dim_color=64,
        fine_hidden_dim=256, fine_hidden_dim_color=256,
        fine_geo_feat_dim=128, coarse_app_dim=32, fine_app_dim=32,
        kernel_feat_cnl=15, kernel_type="RBK", use_awp=True,
        triplane_bf16=args.triplane_bf16,
        triplane_line_matmul=args.triplane_line_matmul,
        # trace the production default (culled fine pass) unless
        # FINE_CULL=0 asks for the reference-exact step
        fine_cull_capacity=float(os.environ.get(
            "FINE_CULL", args.fine_cull_capacity)),
        fine_cull_eps=args.fine_cull_eps)
    kcfg = kernel_config_from_args(args)
    K = ((focal, 0.0, W / 2), (0.0, focal, H / 2), (0.0, 0.0, 1.0))
    model = EvDeblurNeRF(cfg=cfg, kcfg=kcfg, num_images=30, K=K)
    crf = TonemappingTransform(map_type_rgb="none", map_type_event="learn",
                               extra_features_event=2)

    def make_rays(n, seed):
        r = np.random.default_rng(seed)
        o = r.normal(size=(n, 3)).astype(np.float32) * 0.05
        d = r.normal(size=(n, 3)).astype(np.float32)
        d[:, 2] = -np.abs(d[:, 2]) - 0.5
        return np.stack([o, d], axis=-1)

    batch = {
        "rays": make_rays(N_RAND, 0),
        "rays_x": rng.uniform(0, W, N_RAND).astype(np.float32),
        "rays_y": rng.uniform(0, H, N_RAND).astype(np.float32),
        "images_idx": rng.integers(0, 30, N_RAND).astype(np.int32),
        "poses": np.broadcast_to(
            np.concatenate([np.eye(3), np.zeros((3, 1))], -1),
            (N_RAND, 3, 4)).astype(np.float32),
        "rgbsf": rng.uniform(0, 1, (N_RAND, 3)).astype(np.float32),
    }
    ev_batch = {
        "events_rays_start": make_rays(EV_N, 1),
        "events_rays_end": make_rays(EV_N, 2),
        "events_pos_pol_cumsum": rng.integers(0, 3, EV_N).astype(np.float32),
        "events_neg_pol_cumsum": -rng.integers(0, 3, EV_N).astype(np.float32),
    }
    key = jax.random.PRNGKey(0)
    tx = build_optimizer(args.lrate, args.lrate_decay)
    rays_info = {k: batch[k] for k in
                 ("images_idx", "rays_x", "rays_y", "poses")}
    state = create_train_state(model, crf, tx, key, batch["rays"], rays_info)
    batch = jax.device_put(batch)
    ev_batch = jax.device_put(ev_batch)
    sw = compute_schedule_weights(
        args, 0, kernel_end_warmup_iter=-1, w_kernel=lambda s: 1.0,
        w_pts0_target=lambda s: 0.0,
        w_events_egm=annealing_interpolator(1.0, 1.0, None, "constant"),
        fine_loss_weight=0.1, events_active=True)
    step_fn = build_train_step(model, crf, tx, args)

    cell = {"state": state}

    do_cull = cfg.fine_cull_capacity > 0.0

    def one():
        cell["state"], aux = step_fn(cell["state"], batch, ev_batch, key, sw,
                                     force_naive=False, events_active=True,
                                     fine_cull=do_cull)
        return float(aux["loss"])

    return one


def main():
    import jax
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_step"
    one = build_step()
    for _ in range(2):
        one()
    with jax.profiler.trace(outdir):
        for _ in range(2):
            one()
    print("trace written to", outdir, flush=True)

    pbs = sorted(glob.glob(outdir + "/**/*.xplane.pb", recursive=True))
    print("xplane files:", pbs, flush=True)
    if not pbs:
        return
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data(pbs, "hlo_stats", {})
    out_csv = os.path.join(outdir, "hlo_stats.csv")
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    with open(out_csv, "w") as f:
        f.write(data)
    print("wrote", out_csv, flush=True)


if __name__ == "__main__":
    main()
