"""One-hot-matmul line-table gradients vs scatter-add reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evdeblurnerf_tpu.ops import line_matmul, triplane


@pytest.mark.parametrize("D,C,N", [(183, 128, 3000), (605, 32, 5000),
                                   (64, 16, 1024)])
def test_line_grad_matmul_matches_scatter(D, C, N):
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, D, N), jnp.int32)
    g = jnp.asarray(rng.normal(size=(N, C)), jnp.float32)
    got = line_matmul.line_grad_matmul(idx, g, D, interpret=True)
    want = jnp.zeros((D, C), jnp.float32).at[idx].add(g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_line_grad_matmul_default_precision_close():
    rng = np.random.default_rng(1)
    D, C, N = 305, 64, 4000
    idx = jnp.asarray(rng.integers(0, D, N), jnp.int32)
    g = jnp.asarray(rng.normal(size=(N, C)), jnp.float32)
    got = line_matmul.line_grad_matmul(idx, g, D, precision="default",
                                       interpret=True)
    want = jnp.zeros((D, C), jnp.float32).at[idx].add(g)
    # bf16 rounding of g: ~0.4% relative per element
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-2, atol=3e-2)


def test_take_rows_line_grad_matches_plain_take():
    """End-to-end through grid_sample_1d_packed: gradients w.r.t. the
    line table and the coordinates match the unpacked reference path."""
    rng = np.random.default_rng(2)
    C, D, N = 8, 33, 500
    line = jnp.asarray(rng.normal(size=(C, D)), jnp.float32)
    y = jnp.asarray(rng.uniform(-1.1, 1.1, N), jnp.float32)

    def f_packed(line, y):
        packed = triplane.pack_line(line)
        out = triplane.grid_sample_1d_packed(packed, D, y)
        return jnp.sum(jnp.sin(out))

    def f_ref(line, y):
        return jnp.sum(jnp.sin(triplane.grid_sample_1d(line, y)))

    gl, gy = jax.grad(f_packed, argnums=(0, 1))(line, y)
    gl_ref, gy_ref = jax.grad(f_ref, argnums=(0, 1))(line, y)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(gl_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_ref),
                               rtol=1e-5, atol=1e-5)


def test_interpret_env_dispatches_interpreter_on_cpu(monkeypatch):
    """EVDN_LANE_KERNELS_INTERPRET=1 on a CPU backend makes use_pallas()
    True; the backward must then run the kernel in interpret mode instead
    of issuing a Mosaic TPU lowering (which errors on CPU)."""
    from evdeblurnerf_tpu.ops import lane_shuffle

    monkeypatch.setenv("EVDN_LANE_KERNELS_INTERPRET", "1")
    assert lane_shuffle.use_pallas() and not lane_shuffle.on_tpu()
    rng = np.random.default_rng(3)
    D, C, N = 47, 16, 300
    table = jnp.asarray(rng.normal(size=(D, C)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, D, N), jnp.int32)
    g = jnp.asarray(rng.normal(size=(N, C)), jnp.float32)

    def f(t):
        return jnp.sum(line_matmul.take_rows_line(t, idx) * g)

    d_table = jax.grad(f)(table)
    want = jnp.zeros((D, C), jnp.float32).at[idx].add(g)
    np.testing.assert_allclose(np.asarray(d_table), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
