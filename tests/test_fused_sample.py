"""Fused-kernel tri-plane sampling vs the packed jnp reference path."""

import jax
import jax.numpy as jnp
import numpy as np

from evdeblurnerf_tpu.ops import fused_sample, triplane


def _grids(rng, comps=(8, 4, 4), hwd=(17, 19, 13)):
    H, W, D = hwd
    dims = [(comps[0], H, W), (comps[1], D, H), (comps[2], D, W)]
    ldims = [(comps[0], D), (comps[1], W), (comps[2], H)]
    planes = [jnp.asarray(rng.normal(size=s), jnp.float32) for s in dims]
    lines = [jnp.asarray(rng.normal(size=s), jnp.float32) for s in ldims]
    return planes, lines


def _ref(planes, lines, xyz):
    pp, pl_ = triplane.pack_grids(planes, lines)
    return triplane.triplane_features_packed(pp, pl_, xyz)


def test_fused_forward_matches_packed():
    rng = np.random.default_rng(0)
    planes, lines = _grids(rng)
    # include out-of-range coords to exercise the zeros-padding masks
    xyz = jnp.asarray(rng.uniform(-1.3, 1.3, (777, 3)), jnp.float32)
    got = fused_sample.fused_triplane_features(planes, lines, xyz)
    want = _ref(planes, lines, xyz)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_fused_grads_match_packed():
    rng = np.random.default_rng(1)
    planes, lines = _grids(rng)
    xyz = jnp.asarray(rng.uniform(-1.2, 1.2, (513, 3)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(513, 16)), jnp.float32)

    def f_fused(planes, lines, xyz):
        return jnp.sum(
            fused_sample.fused_triplane_features(planes, lines, xyz) * cot)

    def f_ref(planes, lines, xyz):
        return jnp.sum(_ref(planes, lines, xyz) * cot)

    g = jax.grad(f_fused, argnums=(0, 1, 2))(planes, lines, xyz)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(planes, lines, xyz)
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_fused_bf16_close():
    rng = np.random.default_rng(2)
    planes, lines = _grids(rng)
    xyz = jnp.asarray(rng.uniform(-1.0, 1.0, (256, 3)), jnp.float32)
    got = fused_sample.fused_triplane_features(planes, lines, xyz, True)
    want = _ref(planes, lines, xyz)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-2, atol=3e-2)
