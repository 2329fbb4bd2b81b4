"""Transmittance-culled fine sampling (--fine_cull_capacity).

TPU-native approximation with no reference counterpart: the fine pass
evaluates only the samples still visible under the coarse pass's
transmittance, compacted per ray to a fixed lane budget (the step is
row-issue-bound, so fewer samples per ray is the row-count lever —
PERF_NOTES.md round 4). The --fine_cull_capacity flag defaults 0.25
(production training uses it; 0 restores reference-exact sampling, and
every parity/lockstep test pins 0); these tests pin its exactness
envelope and training integration.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import oracle_common as oc  # noqa: E402
from evdeblurnerf_tpu.config import default_args  # noqa: E402
from evdeblurnerf_tpu.models.renderer import (RenderConfig,  # noqa: E402
                                              Renderer)


def _mk_renderer(**over):
    base = dict(mode="c2f", N_samples=8, N_importance=8, perturb=0.0,
                use_viewdirs=True, multires=4, multires_views=2, ndc=True,
                near=0.0, far=1.0, H=oc.H, W=oc.W, focal=oc.FOCAL,
                aabb=oc.AABB, coarse_n_voxels=4096, fine_n_voxels=8192,
                coarse_app_n_comp=(4, 2, 2), fine_app_n_comp=(4, 2, 2),
                coarse_hidden_dim=8, coarse_hidden_dim_color=8,
                fine_hidden_dim=8, fine_hidden_dim_color=8,
                fine_geo_feat_dim=8, coarse_app_dim=8, fine_app_dim=8,
                kernel_feat_cnl=15)
    base.update(over)
    return Renderer(cfg=RenderConfig(**base))


def _rays(n=24, seed=3):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n, 3)).astype(np.float32) * 0.05
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    return jnp.asarray(np.stack([o, d], axis=-1))


def test_full_capacity_cull_matches_baseline():
    """capacity=1.0 + eps=0 selects EVERY sample — the culled program must
    reproduce the baseline fine pass (same sample set, same sorted
    compositing) to f32 reduction noise."""
    rend = _mk_renderer()
    rend_cull = _mk_renderer(fine_cull_capacity=1.0, fine_cull_eps=0.0)
    rays = _rays()
    variables = rend.init(jax.random.PRNGKey(0), jax.random.PRNGKey(1),
                          rays, is_train=False)

    base = rend.apply(variables, jax.random.PRNGKey(7), rays, is_train=True,
                      perturb=0.0, method=Renderer.render)
    cull = rend_cull.apply(variables, jax.random.PRNGKey(7), rays,
                           is_train=True, perturb=0.0, fine_cull=True,
                           method=Renderer.render)
    np.testing.assert_allclose(cull["rgb_map"], base["rgb_map"],
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(cull["depth_map"], base["depth_map"],
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.sort(cull["z_vals"], -1),
                               np.sort(base["z_vals"], -1), rtol=1e-6)
    # flag off at call time -> bitwise the baseline program
    off = rend_cull.apply(variables, jax.random.PRNGKey(7), rays,
                          is_train=True, perturb=0.0, fine_cull=False,
                          method=Renderer.render)
    np.testing.assert_array_equal(off["rgb_map"], base["rgb_map"])


def test_cull_select_drops_occluded_keeps_deepest():
    """Selection rule on a synthetic saturating ray: samples behind the
    opaque surface are culled, shallow ones kept, the ray's deepest sample
    always kept; an unsaturated ray keeps everything (backfill order)."""
    rend = _mk_renderer(N_samples=16, N_importance=0,
                        fine_cull_capacity=0.5, fine_cull_eps=1e-3)
    Sc = 16
    z_coarse = jnp.broadcast_to(jnp.linspace(0.1, 1.0, Sc), (2, Sc))
    # ray 0: opaque wall at sample 4 (weights sum to 1 there)
    w0 = np.zeros(Sc, np.float32)
    w0[4] = 1.0
    # ray 1: empty (tiny uniform weights)
    w1 = np.full(Sc, 1e-5, np.float32)
    weights = jnp.asarray(np.stack([w0, w1]))
    z_cat = z_coarse  # no importance samples; selection over the same lanes

    sel = rend.apply(
        rend.init(jax.random.PRNGKey(0), jax.random.PRNGKey(1), _rays(2),
                  is_train=False),
        z_cat, z_coarse, weights, method=Renderer._cull_select)
    sel = np.asarray(sel)
    assert sel.shape == (2, 8)
    # ray 0: survivors are lanes 0..4 (T=1 up to and incl. the wall sample)
    # + the always-kept deepest lane 15; spare capacity backfills with the
    # shallowest culled lanes 5, 6
    assert set(sel[0]) == {0, 1, 2, 3, 4, 15, 5, 6}
    # ray 1: nothing culled (16 survivors > capacity 8) -> even Bresenham
    # decimation by depth rank, keeping full depth coverage incl. deepest
    assert set(sel[1]) == {1, 3, 5, 7, 9, 11, 13, 15}


def test_eval_render_chunk_fine_cull():
    """--fine_cull_eval path: the deterministic eval chunk render accepts
    the static fine_cull toggle; full-capacity cull matches the full pass
    to reduction noise and a real capacity stays within the eps-bounded
    color envelope (eval has perturb=0, so selection is deterministic)."""
    rend = _mk_renderer(fine_cull_capacity=1.0, fine_cull_eps=0.0)
    rays = _rays()
    variables = rend.init(jax.random.PRNGKey(0), jax.random.PRNGKey(1),
                          rays, is_train=False)

    def chunk(r, cull):
        ret = r.apply(variables, jax.random.PRNGKey(0), rays,
                      is_train=False, perturb=0.0, fine_cull=cull,
                      method=Renderer.render)
        return np.asarray(ret["rgb_map"])

    base = chunk(rend, False)
    np.testing.assert_allclose(chunk(rend, True), base,
                               rtol=2e-5, atol=2e-6)
    # a lossy capacity still renders finite, in-range colors near baseline
    rend_half = _mk_renderer(fine_cull_capacity=0.5, fine_cull_eps=1e-3)
    half = chunk(rend_half, True)
    assert np.all(np.isfinite(half))
    # untrained fields are near-transparent: eps-bounded culling cannot
    # move the composite far (the bound is loose on purpose — the real
    # quality gate is tools/eval_cull_ab.py on a trained checkpoint)
    assert float(np.abs(half - base).max()) < 0.15


@pytest.mark.slow
def test_train_smoke_with_fine_cull(tmp_path):
    """End-to-end training phases across the fine_cull_start_iter boundary
    (naive -> kernel -> culled), loss finite, AWP consumes the compacted
    per-sample features."""
    from synthetic import make_synthetic_scene
    from evdeblurnerf_tpu.train.loop import train

    basedir = tmp_path / "scene"
    make_synthetic_scene(str(basedir))
    args = default_args(
        expname="cullsmoke", basedir=str(tmp_path), datadir=str(basedir),
        factor=None, llffhold=3, dataset_type="llff", seed=0,
        N_rand=64, chunk=512, N_samples=8, N_importance=8,
        use_viewdirs=True, multires=4, multires_views=2,
        lrate=5e-3, lrate_decay=10, N_iters=12, mode="c2f",
        coarse_n_voxels=4096, fine_n_voxels=8192,
        coarse_app_n_comp=[4, 2, 2], fine_app_n_comp=[4, 2, 2],
        coarse_hidden_dim=16, coarse_hidden_dim_color=16,
        fine_hidden_dim=16, fine_hidden_dim_color=16,
        fine_geo_feat_dim=16, coarse_app_dim=8, fine_app_dim=8,
        kernel_type="RBK", kernel_ptnum=3, kernel_rbk_use_origin=True,
        kernel_use_awp=True, kernel_start_iter=2,
        fine_cull_capacity=0.5, fine_cull_start_iter=6,
        events_tms_unit="us", events_tms_files_unit="us", no_wandb=True,
        i_print=4, i_tensorboard=10 ** 9, i_weights=10 ** 9,
        i_testset=10 ** 9, i_video=10 ** 9)
    state = train(args)
    assert int(state.step) == 12
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
