#!/usr/bin/env python
"""Measured same-host comparison against the ACTUAL PyTorch reference.

BASELINE.md's ``vs_baseline`` denominator is an A100 *estimate*; this tool
adds a *measurement*: the reference implementation (torch CPU,
/root/reference) and this framework run the same training iteration —
identical model dimensions (paper field sizes, RBK ptnum=5 + AWP), the
same ray count, the same loss ladder (image MSE + AWP fine blend + TV +
align; events/pts0 off on both sides) — on the same host CPU, single
thread, and we report per-iteration wall time + rays/s for each.

This is NOT the headline benchmark and single-core CPU is NOT neutral
ground: torch ships hand-written C++ CPU kernels (grid_sample, fused
Adam) while XLA:CPU code-generates scatter/gather loops, so the
reference wins on this host (measured 1.6x at small grids, ~5x once
grid-sized bookkeeping dominates). The value of the measurement is the
sanity anchor: per-iteration wall times are within small constant
factors on identical hardware, i.e. the two implementations do the
same order of work per iteration and the A100-estimate denominator in
bench.py is not off by an order of magnitude. The accelerator story is
the TPU bench, where the roles (and kernel maturity) invert.

Usage: JAX_PLATFORMS=cpu python tools/bench_reference_cpu.py [iters]
Reference entry points exercised: networks/renderer.py NeRFAll.forward
(train mode), the run_nerf.py:448-504 loss assembly, loss.backward(),
Adam step.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")

# shared workload: paper model dims, small ray batch (1 CPU core).
# EVDN_BENCH_SMALL_GRIDS=1 shrinks the voxel grids 64x to separate
# per-ray compute from grid-sized bookkeeping (TV loss + Adam moments +
# dense table-gradient buffers scale with the grid, not the rays).
SMALL = bool(os.environ.get("EVDN_BENCH_SMALL_GRIDS"))
COARSE_VOX = 262144 if SMALL else 16777248
FINE_VOX = 2097152 if SMALL else 134217984
N_RAND = 32
N_SAMPLES = 64
N_IMPORTANCE = 64
PTNUM = 5
NUM_IMAGES = 30
H, W, FOCAL = 480, 640, 500.0
K = ((FOCAL, 0.0, W / 2), (0.0, FOCAL, H / 2), (0.0, 0.0, 1.0))
AABB = ((-1.6, -1.7, -1.0), (1.7, 1.6, 1.0))
FINE_LOSS_WEIGHT = 0.1
TV_W, ALIGN_W = 1e-5, 1e-5


def make_rays(n, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    rays_o = rng.normal(size=(n, 3)).astype(np.float32) * 0.05
    rays_d = rng.normal(size=(n, 3)).astype(np.float32)
    rays_d[:, 2] = -np.abs(rays_d[:, 2]) - 0.5
    return np.stack([rays_o, rays_d], axis=-1), rng


def bench_reference(iters):
    import numpy as np

    import make_reference_fixtures as mrf  # installs shims + ref sys.path
    import torch

    torch.set_num_threads(1)
    from networks.dpnerf.awp import AdaptiveWeightProposal
    from networks.dpnerf.blurmodel import RigidBlurringModel
    from networks.embedding import ViewEmbedding
    from networks.renderer import NeRFAll

    args = mrf.ArgsNS(
        mode="c2f", netdepth=8, netwidth=256, netdepth_fine=8,
        netwidth_fine=256, use_viewdirs=True, multires=10, multires_views=4,
        N_importance=N_IMPORTANCE, kernel_type="RBK", kernel_use_awp=True,
        bounding_box=(torch.tensor(AABB[0]), torch.tensor(AABB[1])),
        coarse_num_layers=2, coarse_hidden_dim=64, kernel_feat_cnl=15,
        coarse_num_layers_color=3, coarse_hidden_dim_color=64,
        rgb_add_bias=False, coarse_app_dim=32, coarse_app_n_comp=[64, 16, 16],
        coarse_n_voxels=COARSE_VOX, render_rmnearplane=0,
        coarse_app_actfn="none", fine_num_layers=2, fine_hidden_dim=256,
        fine_geo_feat_dim=128, fine_num_layers_color=3,
        fine_hidden_dim_color=256, fine_app_dim=32,
        fine_app_n_comp=[64, 16, 16], fine_n_voxels=FINE_VOX,
        fine_app_actfn="none", rgb_activate="sigmoid",
        sigma_activate="relu")

    view_embed = ViewEmbedding(num_embed=NUM_IMAGES, embed_dim=32,
                               init_params="zero")
    kernelnet = RigidBlurringModel(
        feat_ch=0, num_motion=PTNUM - 1, D_r=1, W_r=32, D_v=1, W_v=32,
        D_w=1, W_w=32, output_ch_r=3, output_ch_v=3, rv_window=0.2,
        use_origin=True, view_embed=view_embed, W=32)
    awpnet = AdaptiveWeightProposal(
        input_ch=128, num_motion=PTNUM - 1, use_origin=True,
        D_sam=2, W_sam=64, D_mot=1, W_mot=32,
        dir_freq=2, rgb_freq=2, depth_freq=3, ray_dir_freq=2,
        view_feature_ch=32)
    nerf = NeRFAll(args, kernelnet, awpnet)
    nerf.train()

    rays, rng = make_rays(N_RAND)
    rays_t = mrf.T(rays)
    ri = {
        "rays_x": mrf.T(rng.uniform(0, W, N_RAND).astype(np.float32))[:, None],
        "rays_y": mrf.T(rng.uniform(0, H, N_RAND).astype(np.float32))[:, None],
        "images_idx": torch.from_numpy(
            rng.integers(0, NUM_IMAGES, N_RAND).astype(np.int64))[:, None],
        "poses": mrf.T(np.broadcast_to(
            np.concatenate([np.eye(3), np.zeros((3, 1))], -1),
            (N_RAND, 3, 4)).astype(np.float32).copy()),
    }
    target = torch.rand(N_RAND, 3)
    K_t = torch.tensor(K, dtype=torch.float32)
    render_kwargs = dict(N_samples=N_SAMPLES, N_importance=N_IMPORTANCE,
                         perturb=0.0, raw_noise_std=0.0, ndc=True,
                         near=0.0, far=1.0, use_viewdirs=True, retraw=False)
    opt = torch.optim.Adam(nerf.parameters(), lr=5e-3)

    def one_iter():
        opt.zero_grad()
        rgb, rgb1, other_loss, other_tensors = nerf(
            H, W, K_t, chunk=1 << 20, rays=rays_t, rays_info=ri,
            force_naive=False, **render_kwargs)
        # run_nerf.py:448-504 ladder (events/pts0 off)
        loss = torch.nn.functional.mse_loss(rgb, target)
        if rgb1 is not None:
            loss = loss + torch.nn.functional.mse_loss(rgb1, target)
        if other_tensors.get("rgb_awp") is not None:
            fine = torch.nn.functional.mse_loss(
                other_tensors["rgb_awp"], target)
            loss = loss * (1 - FINE_LOSS_WEIGHT) + fine * FINE_LOSS_WEIGHT
        if "TV" in other_loss:
            loss = loss + other_loss["TV"] * TV_W
        if "align" in other_loss:
            loss = loss + other_loss["align"] * ALIGN_W
        loss.backward()
        opt.step()
        return float(loss.detach())

    one_iter()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        one_iter()
    dt = (time.perf_counter() - t0) / iters
    return dt


def bench_ours(iters):
    import jax

    jax.config.update("jax_platforms", "cpu")
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

    args = default_args(
        N_rand=N_RAND, N_samples=N_SAMPLES, N_importance=N_IMPORTANCE,
        mode="c2f", kernel_type="RBK", kernel_ptnum=PTNUM,
        kernel_rbk_use_origin=True, kernel_use_awp=True,
        kernel_img_embed=32, kernel_rbk_extra_feat_ch=0,
        kernel_start_iter=0, use_viewdirs=True,
        kernel_awp_sam_emb_depth=2, kernel_awp_sam_emb_width=64,
        kernel_awp_mot_emb_depth=1, kernel_awp_mot_emb_width=32,
        kernel_tv_loss_weight=TV_W, kernel_align_weight=ALIGN_W,
        lrate=5e-3, lrate_decay=10, seed=0, perturb=0.0,
        grad_accum=1, triplane_bf16=False, triplane_line_matmul=False)
    cfg = RenderConfig(
        mode="c2f", N_samples=N_SAMPLES, N_importance=N_IMPORTANCE,
        use_viewdirs=True, multires=10, multires_views=4, ndc=True,
        near=0.0, far=1.0, H=H, W=W, focal=FOCAL, perturb=0.0,
        aabb=AABB, coarse_n_voxels=COARSE_VOX, fine_n_voxels=FINE_VOX,
        coarse_app_n_comp=(64, 16, 16), fine_app_n_comp=(64, 16, 16),
        coarse_hidden_dim=64, coarse_hidden_dim_color=64,
        fine_hidden_dim=256, fine_hidden_dim_color=256,
        fine_geo_feat_dim=128, coarse_app_dim=32, fine_app_dim=32,
        kernel_feat_cnl=15, kernel_type="RBK", use_awp=True)
    kcfg = kernel_config_from_args(args)
    model = EvDeblurNeRF(cfg=cfg, kcfg=kcfg, num_images=NUM_IMAGES, K=K)
    crf = TonemappingTransform(map_type_rgb="none", map_type_event="none")

    rays, rng = make_rays(N_RAND)
    batch = {
        "rays": rays,
        "rays_x": rng.uniform(0, W, N_RAND).astype(np.float32),
        "rays_y": rng.uniform(0, H, N_RAND).astype(np.float32),
        "images_idx": rng.integers(0, NUM_IMAGES, N_RAND).astype(np.int32),
        "poses": np.broadcast_to(
            np.concatenate([np.eye(3), np.zeros((3, 1))], -1),
            (N_RAND, 3, 4)).astype(np.float32).copy(),
        "rgbsf": np.random.default_rng(5).uniform(
            0, 1, (N_RAND, 3)).astype(np.float32),
    }
    key = jax.random.PRNGKey(0)
    tx = build_optimizer(args.lrate, args.lrate_decay)
    rays_info = {k: batch[k] for k in
                 ("images_idx", "rays_x", "rays_y", "poses")}
    state = create_train_state(model, crf, tx, key, batch["rays"], rays_info)
    step_fn = build_train_step(model, crf, tx, args)
    sw = compute_schedule_weights(
        args, 0, kernel_end_warmup_iter=-1, w_kernel=lambda s: 1.0,
        w_pts0_target=lambda s: 0.0,
        w_events_egm=annealing_interpolator(1.0, 1.0, None, "constant"),
        fine_loss_weight=FINE_LOSS_WEIGHT, events_active=False)

    state, aux = step_fn(state, batch, None, key, sw,
                         force_naive=False, events_active=False)  # compile
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, aux = step_fn(state, batch, None, key, sw,
                             force_naive=False, events_active=False)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    dt_ours = bench_ours(iters)
    print(f"ours  (jax CPU, 1 thread): {dt_ours * 1e3:8.1f} ms/iter "
          f"({N_RAND * PTNUM / dt_ours:,.0f} expanded rays/s)")
    dt_ref = bench_reference(iters)
    print(f"ref (torch CPU, 1 thread): {dt_ref * 1e3:8.1f} ms/iter "
          f"({N_RAND * PTNUM / dt_ref:,.0f} expanded rays/s)")
    print(f"ratio ref/ours: {dt_ref / dt_ours:.2f}x")


if __name__ == "__main__":
    main()
