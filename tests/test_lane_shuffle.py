"""Lane-shuffle kernels: Pallas (interpret mode on CPU) vs jnp semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evdeblurnerf_tpu.ops import lane_shuffle as ls


@pytest.mark.parametrize("shape,s2", [((37, 128), 128), ((64, 63), 64),
                                      ((200, 100), 50)])
def test_lane_take_2d_matches_jnp(shape, s2):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    idx = jnp.asarray(rng.integers(0, shape[1], (shape[0], s2)), jnp.int32)
    got = ls._lane_take_2d(x, idx, interpret=True)
    want = jnp.take_along_axis(x, idx, axis=-1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_lane_take_3d_matches_jnp():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(13, 32, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 128, (13, 128)), jnp.int32)
    got = ls._lane_take_3d(x, idx, interpret=True)
    want = jnp.take_along_axis(x, idx[:, None, :], axis=-1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_permute_lanes_grad_roundtrip():
    rng = np.random.default_rng(2)
    R, S = 9, 64
    x = jnp.asarray(rng.normal(size=(R, S)), jnp.float32)
    keys = jnp.asarray(rng.normal(size=(R, S)), jnp.float32)
    _, perm, inv = ls.sort_with_perm(keys)
    # perm/inv really are inverses
    iota = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (R, S))
    np.testing.assert_array_equal(
        np.asarray(jnp.take_along_axis(perm, inv, axis=-1)), np.asarray(iota))

    def f(x):
        return jnp.sum(jnp.sin(ls.permute_lanes(x, perm, inv)) * 2.0)

    def f_ref(x):
        return jnp.sum(jnp.sin(jnp.take_along_axis(x, perm, axis=-1)) * 2.0)

    g = jax.grad(f)(x)
    g_ref = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-6)


def test_permute_lanes_3d_grad():
    rng = np.random.default_rng(3)
    R, C, S = 5, 8, 32
    x = jnp.asarray(rng.normal(size=(R, C, S)), jnp.float32)
    keys = jnp.asarray(rng.normal(size=(R, S)), jnp.float32)
    _, perm, inv = ls.sort_with_perm(keys)

    def f(x):
        return jnp.sum(ls.permute_lanes(x, perm, inv) ** 2)

    def f_ref(x):
        return jnp.sum(jnp.take_along_axis(x, perm[:, None, :], axis=-1) ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(f)(x)),
                               np.asarray(jax.grad(f_ref)(x)), atol=1e-6)


def test_cdf_take_matches_jnp():
    # call-site shapes from sample_pdf: cdf and bins are both [R, M] and
    # above reaches M-1 unclamped
    rng = np.random.default_rng(4)
    R, M, N = 33, 63, 64
    cdf = jnp.asarray(np.sort(rng.uniform(size=(R, M)), axis=-1), jnp.float32)
    bins = jnp.asarray(rng.normal(size=(R, M)), jnp.float32)
    inds = jnp.asarray(rng.integers(0, M + 1, (R, N)), jnp.int32)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(M - 1, inds)
    got = ls.cdf_take(cdf, bins, below, above, interpret=True)
    want = (jnp.take_along_axis(cdf, below, axis=-1),
            jnp.take_along_axis(cdf, above, axis=-1),
            jnp.take_along_axis(bins, below, axis=-1),
            jnp.take_along_axis(bins, above, axis=-1))
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_take_impl_wide_axis_falls_back():
    # sample axes wider than 128 lanes must route to the jnp path (e.g.
    # N_samples + N_importance = 256) instead of crashing at trace time
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(7, 200)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 200, (7, 200)), jnp.int32)
    got = ls._take_impl(x, idx, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(jnp.take_along_axis(x, idx, axis=-1)))
    cdf = jnp.asarray(np.sort(rng.uniform(size=(4, 200)), axis=-1),
                      jnp.float32)
    bins = jnp.asarray(rng.normal(size=(4, 200)), jnp.float32)
    b = jnp.asarray(rng.integers(0, 200, (4, 32)), jnp.int32)
    a = jnp.asarray(rng.integers(0, 200, (4, 32)), jnp.int32)
    got = ls.cdf_take(cdf, bins, b, a, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got[0]), np.asarray(jnp.take_along_axis(cdf, b, axis=-1)))
