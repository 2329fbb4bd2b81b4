"""Gradient accumulation must match the single-batch step (same data, same
per-microbatch RNG caveat handled by comparing against the mean of the
per-microbatch grads)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evdeblurnerf_tpu.config import default_args
from evdeblurnerf_tpu.models.renderer import RenderConfig
from evdeblurnerf_tpu.models.system import EvDeblurNeRF, kernel_config_from_args
from evdeblurnerf_tpu.models.tonemapping import TonemappingTransform
from evdeblurnerf_tpu.train.optim import build_optimizer
from evdeblurnerf_tpu.train.state import create_train_state
from evdeblurnerf_tpu.train.step import (ScheduleWeights, build_train_step)


def make_setup(grad_accum):
    args = default_args(
        N_rand=32, N_samples=4, N_importance=4, mode="c2f",
        kernel_type="none", use_viewdirs=True, multires=2, multires_views=2,
        lrate=1e-2, lrate_decay=10, grad_accum=grad_accum, remat=False,
        perturb=0.0, seed=0)
    cfg = RenderConfig(
        mode="c2f", N_samples=4, N_importance=4, use_viewdirs=True,
        multires=2, multires_views=2, ndc=True, near=0.0, far=1.0,
        H=16, W=20, focal=10.0, perturb=0.0,
        coarse_n_voxels=1000, fine_n_voxels=2000,
        coarse_app_n_comp=(2, 2, 2), fine_app_n_comp=(2, 2, 2),
        coarse_hidden_dim=8, coarse_hidden_dim_color=8,
        fine_hidden_dim=8, fine_hidden_dim_color=8,
        fine_geo_feat_dim=8, coarse_app_dim=4, fine_app_dim=4)
    kcfg = kernel_config_from_args(args)
    model = EvDeblurNeRF(cfg=cfg, kcfg=kcfg, num_images=2,
                         K=((10.0, 0, 10.0), (0, 10.0, 8.0), (0, 0, 1.0)))
    crf = TonemappingTransform()
    tx = build_optimizer(args.lrate, args.lrate_decay)
    return args, model, crf, tx


def make_batch(n=32):
    rng = np.random.default_rng(0)
    rays_o = rng.normal(size=(n, 3)).astype(np.float32) * 0.05
    rays_d = rng.normal(size=(n, 3)).astype(np.float32)
    rays_d[:, 2] = -np.abs(rays_d[:, 2]) - 0.5
    return {
        "rays": np.stack([rays_o, rays_d], -1),
        "rays_x": rng.uniform(0, 20, n).astype(np.float32),
        "rays_y": rng.uniform(0, 16, n).astype(np.float32),
        "images_idx": rng.integers(0, 2, n).astype(np.int32),
        "poses": np.broadcast_to(
            np.concatenate([np.eye(3), np.zeros((3, 1))], -1),
            (n, 3, 4)).astype(np.float32),
        "rgbsf": rng.uniform(0, 1, (n, 3)).astype(np.float32),
    }


def run_step(grad_accum):
    args, model, crf, tx = make_setup(grad_accum)
    batch = make_batch()
    key = jax.random.PRNGKey(0)
    rays_info = {k: batch[k] for k in
                 ("images_idx", "rays_x", "rays_y", "poses")}
    state = create_train_state(model, crf, tx, key, batch["rays"], rays_info)
    step = build_train_step(model, crf, tx, args)
    sw = ScheduleWeights.identity()
    state, aux = step(state, batch, {}, key, sw,
                      force_naive=True, events_active=False)
    return state, aux


@pytest.mark.slow
def test_grad_accum_close_to_full_batch():
    """With perturb=0/no noise the render is key-independent, so accum=2 on
    the same 32 rays equals the full-batch step up to fp reordering."""
    s1, a1 = run_step(1)
    s2, a2 = run_step(2)
    assert np.isfinite(float(a2["loss"]))
    np.testing.assert_allclose(float(a1["loss"]), float(a2["loss"]),
                               rtol=1e-4)
    for l1, l2 in zip(jax.tree_util.tree_leaves(s1.params),
                      jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   atol=5e-5)
