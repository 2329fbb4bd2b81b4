#!/usr/bin/env python
"""Capture a jax.profiler trace of the eval render chunk and print the
per-HLO-op time aggregation (same converter as trace_step.py).

Usage: python tools/trace_eval.py [outdir]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import numpy as np

    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_eval"

    # Reuse the bench model: same fields/shapes as the official eval number.
    import bench
    from evdeblurnerf_tpu.config import default_args
    from evdeblurnerf_tpu.models.renderer import RenderConfig  # noqa: F401
    from evdeblurnerf_tpu.train.evaluate import build_chunk_renderer

    res_holder = {}

    # bench.run builds everything; we only need the model + trained-state
    # shapes, so rebuild the minimal pieces here instead of timing a run.
    from evdeblurnerf_tpu.models.system import (EvDeblurNeRF,
                                                kernel_config_from_args)
    from evdeblurnerf_tpu.models.tonemapping import TonemappingTransform
    from evdeblurnerf_tpu.train.optim import build_optimizer
    from evdeblurnerf_tpu.train.state import create_train_state

    H, W, focal = 480, 640, 500.0
    args = default_args(
        N_rand=1024, events_N_rand=4096, N_samples=64, N_importance=64,
        mode="c2f", kernel_type="RBK", kernel_ptnum=10,
        kernel_rbk_use_origin=True, kernel_use_awp=True, kernel_img_embed=32,
        kernel_rbk_extra_feat_ch=0, kernel_start_iter=0, use_viewdirs=True,
        seed=0)
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
        triplane_line_matmul=args.triplane_line_matmul)
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

    rng = np.random.default_rng(0)
    rays = make_rays(1024, 0)
    rays_info = {
        "images_idx": rng.integers(0, 30, 1024).astype(np.int32),
        "rays_x": rng.uniform(0, W, 1024).astype(np.float32),
        "rays_y": rng.uniform(0, H, 1024).astype(np.float32),
        "poses": np.broadcast_to(
            np.concatenate([np.eye(3), np.zeros((3, 1))], -1),
            (1024, 3, 4)).astype(np.float32),
    }
    key = jax.random.PRNGKey(0)
    tx = build_optimizer(args.lrate, args.lrate_decay)
    state = create_train_state(model, crf, tx, key, rays, rays_info)

    chunk_fn = build_chunk_renderer(model)
    eval_chunk = int(os.environ.get("EVAL_CHUNK", "16384"))
    eval_rays = jax.device_put(make_rays(eval_chunk, 3))
    variables = {"params": state.params["nerf"]}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    import time
    rgb, depth, _ = chunk_fn(variables, eval_rays)
    np.asarray(rgb)
    t0 = time.perf_counter()
    n = 8
    pending = []
    for _ in range(n):
        rgb, depth, _ = chunk_fn(variables, eval_rays)
        pending.append((rgb, depth))
        if len(pending) > 4:
            r, d = pending.pop(0)
            np.asarray(r), np.asarray(d)
    for r, d in pending:
        np.asarray(r), np.asarray(d)
    dt = (time.perf_counter() - t0) / n
    print(f"eval chunk {eval_chunk}: {dt * 1e3:.1f} ms "
          f"({eval_chunk / dt:,.0f} rays/s)", flush=True)

    with jax.profiler.trace(outdir):
        pending = []
        for _ in range(4):
            rgb, depth, _ = chunk_fn(variables, eval_rays)
            pending.append((rgb, depth))
        for r, d in pending:
            np.asarray(r), np.asarray(d)
    print("trace written to", outdir, flush=True)

    pbs = sorted(glob.glob(outdir + "/**/*.xplane.pb", recursive=True))
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
