"""Packed-gather tri-plane path must match the 4-corner reference path
exactly (values and gradients), including out-of-range coordinates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evdeblurnerf_tpu.ops import triplane


@pytest.fixture(scope="module")
def grids():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    planes = [jax.random.normal(ks[0], (8, 13, 17)),
              jax.random.normal(ks[1], (4, 9, 17)),
              jax.random.normal(ks[2], (4, 9, 13))]
    lines = [jax.random.normal(ks[3], (8, 9)),
             jax.random.normal(ks[4], (4, 13)),
             jax.random.normal(ks[5], (4, 17))]
    return planes, lines


def coords(n=500, lo=-1.3, hi=1.3, seed=1):
    # deliberately includes out-of-range (|c| > 1) points: the reference
    # zeros-pads there (ref: voxnerf.py grid_sample padding_mode zeros)
    return jax.random.uniform(jax.random.PRNGKey(seed), (n, 3),
                              minval=lo, maxval=hi)


def test_plane_packed_matches_reference(grids):
    planes, _ = grids
    xyz = coords()
    for plane in planes:
        packed = triplane.pack_plane(plane)
        ref = triplane.grid_sample_2d(plane, xyz[:, 0], xyz[:, 1])
        got = triplane.grid_sample_2d_packed(
            packed, plane.shape[1], plane.shape[2], xyz[:, 0], xyz[:, 1])
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-6)


def test_line_packed_matches_reference(grids):
    _, lines = grids
    xyz = coords()
    for line in lines:
        packed = triplane.pack_line(line)
        ref = triplane.grid_sample_1d(line, xyz[:, 2])
        got = triplane.grid_sample_1d_packed(packed, line.shape[1],
                                             xyz[:, 2])
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-6)


def test_triplane_features_packed_matches(grids):
    planes, lines = grids
    xyz = coords()
    ref = triplane.triplane_features(planes, lines, xyz)
    pp, pl_ = triplane.pack_grids(planes, lines)
    got = triplane.triplane_features_packed(pp, pl_, xyz)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


@pytest.mark.slow
def test_packed_gradients_match(grids):
    planes, lines = grids
    xyz = coords(n=200)
    g = jax.random.normal(jax.random.PRNGKey(7),
                          (200, sum(p.shape[0] for p in planes)))

    def loss_ref(planes, lines):
        return jnp.sum(triplane.triplane_features(planes, lines, xyz) * g)

    def loss_packed(planes, lines):
        pp, pl_ = triplane.pack_grids(planes, lines)
        return jnp.sum(triplane.triplane_features_packed(pp, pl_, xyz) * g)

    gr = jax.grad(loss_ref, argnums=(0, 1))(planes, lines)
    gp = jax.grad(loss_packed, argnums=(0, 1))(planes, lines)
    for a, b in zip(jax.tree_util.tree_leaves(gr),
                    jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_exact_grid_points(grids):
    """At exact texel centers both paths return the texel value."""
    planes, _ = grids
    plane = planes[0]
    C, H, W = plane.shape
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    gx = xs.ravel() / (W - 1) * 2 - 1
    gy = ys.ravel() / (H - 1) * 2 - 1
    packed = triplane.pack_plane(plane)
    got = triplane.grid_sample_2d_packed(packed, H, W, gx, gy)
    expect = jnp.moveaxis(plane, 0, -1).reshape(-1, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=1e-6)


def test_bf16_forward_close_exact_backward():
    """bf16 table gathers: forward within bf16 rounding of the f32 path,
    backward (table gradient) exactly the f32 scatter-add."""
    import jax

    from evdeblurnerf_tpu.ops.triplane import (grid_sample_2d_packed,
                                               pack_plane)

    rng = np.random.default_rng(0)
    plane = jnp.asarray(rng.normal(size=(8, 12, 10)), jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, 257), jnp.float32)
    y = jnp.asarray(rng.uniform(-1, 1, 257), jnp.float32)
    packed = pack_plane(plane)
    H, W = plane.shape[1], plane.shape[2]

    f32 = grid_sample_2d_packed(packed, H, W, x, y)
    f16 = grid_sample_2d_packed(packed, H, W, x, y, table_bf16=True)
    np.testing.assert_allclose(np.asarray(f16), np.asarray(f32),
                               rtol=2e-2, atol=2e-2)

    g = jnp.asarray(rng.normal(size=f32.shape), jnp.float32)

    def loss(packed, bf16):
        out = grid_sample_2d_packed(packed, H, W, x, y, table_bf16=bf16)
        return jnp.sum(out * g)

    d32 = jax.grad(loss)(packed, False)
    d16 = jax.grad(loss)(packed, True)
    # identical scatter-adds: the custom VJP routes the f32 cotangent
    # straight into the f32 table gradient
    np.testing.assert_array_equal(np.asarray(d16), np.asarray(d32))


def test_line_matmul_matches_gather():
    """One-hot MXU line path: f32 mode is exact vs the gather path in both
    directions (incl. the y-gradient through the slot weights); bf16 mode
    matches the bf16 gather forward exactly and stays close in backward."""
    import jax

    from evdeblurnerf_tpu.ops.triplane import (grid_sample_1d_packed,
                                               pack_line)

    rng = np.random.default_rng(3)
    line = jnp.asarray(rng.normal(size=(6, 33)), jnp.float32)
    y = jnp.asarray(rng.uniform(-1.2, 1.2, 301), jnp.float32)  # incl. OOB
    packed = pack_line(line)
    D = line.shape[1]

    ref = grid_sample_1d_packed(packed, D, y)
    got = grid_sample_1d_packed(packed, D, y, line_matmul=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    # bf16 forward: one-hot rows through a bf16 table == bf16 gather rows
    ref16 = grid_sample_1d_packed(packed, D, y, table_bf16=True)
    got16 = grid_sample_1d_packed(packed, D, y, table_bf16=True,
                                  line_matmul=True)
    np.testing.assert_allclose(np.asarray(got16), np.asarray(ref16),
                               atol=1e-6)

    g = jnp.asarray(rng.normal(size=ref.shape), jnp.float32)

    def loss(packed, y, mm, bf16=False):
        out = grid_sample_1d_packed(packed, D, y, table_bf16=bf16,
                                    line_matmul=mm)
        return jnp.sum(out * g)

    d_ref = jax.grad(loss, argnums=(0, 1))(packed, y, False)
    d_got = jax.grad(loss, argnums=(0, 1))(packed, y, True)
    np.testing.assert_allclose(np.asarray(d_got[0]), np.asarray(d_ref[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_got[1]), np.asarray(d_ref[1]),
                               atol=1e-5)

    # bf16 backward: rows are bf16-rounded pre-accumulate — close, not equal
    d16_ref = jax.grad(loss)(packed, y, False, True)
    d16_got = jax.grad(loss)(packed, y, True, True)
    np.testing.assert_allclose(np.asarray(d16_got), np.asarray(d16_ref),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.fast
def test_compute_bf16_matches_bf16_tables(grids):
    """Eval-only bf16 interpolation arithmetic: same tent weights and
    bf16-rounded table values as the table_bf16 f32-arithmetic path, so
    outputs agree to a few bf16 ulps (the extra roundings of the 4-term
    FMA). Exercised by render_chunk when table_bf16 and not is_train."""
    planes, lines = grids
    xyz = coords()
    pp, pl_ = triplane.pack_grids(planes, lines)
    ref = triplane.triplane_features_packed(pp, pl_, xyz, table_bf16=True)
    for line_matmul in (False, True):
        got = triplane.triplane_features_packed(
            pp, pl_, xyz, table_bf16=True, line_matmul=line_matmul,
            compute_bf16=True)
        assert got.dtype == jnp.bfloat16
        scale = float(jnp.max(jnp.abs(ref)))
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref),
            atol=0.02 * scale,
            err_msg=f"compute_bf16 diverged (line_matmul={line_matmul})")

    # pre-cast tables (what voxnerf.sample does at eval) must agree too
    pp16, pl16 = triplane.pack_grids(
        [p.astype(jnp.bfloat16) for p in planes],
        [l.astype(jnp.bfloat16) for l in lines])
    got = triplane.triplane_features_packed(pp16, pl16, xyz,
                                            table_bf16=True,
                                            compute_bf16=True)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               atol=0.02 * scale)

