"""Tiled matmul gather (round-3 forward prototype): exactness vs the
reference bilinear sampler, including spilled points, in Pallas interpret
mode on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from evdeblurnerf_tpu.ops.tiled_gather import (GROUP, group_origins,
                                               morton_code_2d,
                                               tiled_plane_gather,
                                               tiled_plane_gather_with_fallback)


def _reference(plane_hwc, fu, fv):
    H, W, C = plane_hwc.shape
    u0 = np.clip(np.floor(fu), 0, W - 2).astype(np.int64)
    v0 = np.clip(np.floor(fv), 0, H - 2).astype(np.int64)
    au = (fu - u0)[:, None]
    av = (fv - v0)[:, None]
    p = np.asarray(plane_hwc)
    return (p[v0, u0] * (1 - au) * (1 - av) + p[v0, u0 + 1] * au * (1 - av)
            + p[v0 + 1, u0] * (1 - au) * av + p[v0 + 1, u0 + 1] * au * av)


def _clustered_points(rng, n_groups, H, W, spread=6.0):
    """Morton-sorted-like input: each group clusters around a centroid."""
    fu, fv = [], []
    for _ in range(n_groups):
        cu = rng.uniform(2, W - 3)
        cv = rng.uniform(2, H - 3)
        fu.append(np.clip(rng.normal(cu, spread, GROUP), 0, W - 1.001))
        fv.append(np.clip(rng.normal(cv, spread, GROUP), 0, H - 1.001))
    return (np.concatenate(fu).astype(np.float32),
            np.concatenate(fv).astype(np.float32))


def test_tiled_gather_matches_reference_no_spills():
    rng = np.random.default_rng(0)
    H, W, C = 96, 80, 16
    plane = rng.normal(size=(H, W, C)).astype(np.float32)
    fu, fv = _clustered_points(rng, n_groups=5, H=H, W=W, spread=4.0)
    oy, ox, ok = group_origins(jnp.asarray(fu), jnp.asarray(fv), H, W, 32, 32)
    assert bool(ok.all()), "test setup should not spill"
    out = tiled_plane_gather(jnp.asarray(plane), jnp.asarray(fu),
                             jnp.asarray(fv), oy, ox, TH=32, TW=32,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(out), _reference(plane, fu, fv),
                               rtol=1e-5, atol=1e-5)


def test_tiled_gather_with_spill_fallback():
    rng = np.random.default_rng(1)
    H, W, C = 96, 80, 8
    plane = rng.normal(size=(H, W, C)).astype(np.float32)
    fu, fv = _clustered_points(rng, n_groups=6, H=H, W=W, spread=5.0)
    # inject outliers: ~5% of points far from their group
    n = fu.shape[0]
    out_idx = rng.choice(n, n // 20, replace=False)
    fu[out_idx] = rng.uniform(0, W - 1.001, out_idx.size)
    fv[out_idx] = rng.uniform(0, H - 1.001, out_idx.size)
    out = tiled_plane_gather_with_fallback(
        jnp.asarray(plane), jnp.asarray(fu), jnp.asarray(fv), TH=32, TW=32,
        interpret=True)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), _reference(plane, fu, fv),
                               rtol=1e-5, atol=1e-5)


def test_spill_capacity_poisons():
    rng = np.random.default_rng(2)
    H, W, C = 64, 64, 8
    plane = rng.normal(size=(H, W, C)).astype(np.float32)
    # fully random points: nearly everything spills tiny 8x8 tiles
    fu = rng.uniform(0, W - 1.001, 4 * GROUP).astype(np.float32)
    fv = rng.uniform(0, H - 1.001, 4 * GROUP).astype(np.float32)
    out = tiled_plane_gather_with_fallback(
        jnp.asarray(plane), jnp.asarray(fu), jnp.asarray(fv), TH=8, TW=8,
        spill_capacity_frac=0.01, interpret=True)
    assert np.isnan(np.asarray(out)).any(), \
        "over-capacity spills must poison, not silently corrupt"


def test_morton_code_orders_locally():
    u = jnp.asarray([0, 1, 0, 1, 200], jnp.uint32)
    v = jnp.asarray([0, 0, 1, 1, 200], jnp.uint32)
    codes = np.asarray(morton_code_2d(u, v))
    assert codes[4] > codes[:4].max()
    assert len(set(codes.tolist())) == 5
