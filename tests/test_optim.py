"""Optimizer parity: lazy per-leaf Adam vs torch.optim.Adam.

The reference trains with one torch Adam over ALL modules
(ref: run_nerf.py:243-274), but schedule-gated components (the learned
CRF before tone_mapping_start_learn_iter, the blur kernel before
kernel_start_iter) produce ``p.grad is None`` until their gate opens, so
torch lazily creates their state and their first update uses bias
correction t=1. ``train/optim.py::scale_by_adam_lazy`` reproduces that
under jit by latching each leaf's count on its first nonzero gradient.
These tests pin the transformation against the actual torch optimizer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evdeblurnerf_tpu.train.optim import build_optimizer, scale_by_adam_lazy

torch = pytest.importorskip("torch")


def _torch_adam_traj(grads_per_step, init, lr=1e-2):
    """Run torch Adam over a dict of params; a grad of None for a step
    leaves that param's state uncreated (the reference's gated-module
    behavior)."""
    ps = {k: torch.nn.Parameter(torch.tensor(v)) for k, v in init.items()}
    opt = torch.optim.Adam(ps.values(), lr=lr, betas=(0.9, 0.999), eps=1e-8)
    out = []
    for grads in grads_per_step:
        opt.zero_grad(set_to_none=True)
        for k, g in grads.items():
            if g is not None:
                ps[k].grad = torch.tensor(g)
        opt.step()
        out.append({k: p.detach().numpy().copy() for k, p in ps.items()})
    return out


def _jax_adam_traj(grads_per_step, init, lr=1e-2):
    tx = scale_by_adam_lazy()
    params = {k: jnp.asarray(v) for k, v in init.items()}
    state = tx.init(params)
    out = []
    for grads in grads_per_step:
        g = {k: (jnp.zeros_like(params[k]) if grads[k] is None
                 else jnp.asarray(grads[k])) for k in params}
        updates, state = tx.update(g, state)
        params = {k: params[k] - lr * updates[k] for k in params}
        out.append({k: np.asarray(v) for k, v in params.items()})
    return out


def test_lazy_adam_matches_torch_with_gated_param():
    """Param 'b' receives no gradient for the first 5 steps (gate closed:
    grad None in torch, exact zeros here); both optimizers must agree on
    the whole trajectory, especially b's first post-gate updates."""
    rng = np.random.default_rng(0)
    init = {"a": rng.normal(size=(4, 3)).astype(np.float32),
            "b": rng.normal(size=(7,)).astype(np.float32)}
    n_steps = 12
    gate = 5
    grads = []
    for i in range(n_steps):
        grads.append({
            "a": rng.normal(size=(4, 3)).astype(np.float32),
            "b": (None if i < gate
                  else rng.normal(size=(7,)).astype(np.float32)),
        })
    ours = _jax_adam_traj(grads, init)
    ref = _torch_adam_traj(grads, init)
    for i in range(n_steps):
        for k in init:
            np.testing.assert_allclose(ours[i][k], ref[i][k],
                                       rtol=2e-5, atol=2e-7,
                                       err_msg=f"step {i} param {k}")
    # the gated param must not move before its gate opens
    for i in range(gate):
        np.testing.assert_array_equal(ours[i]["b"], init["b"])


def test_lazy_adam_counts_zero_grads_after_latch():
    """torch increments a param's step even on an all-zero grad tensor
    once its state exists; the latch must do the same (count > 0 keeps
    counting through numerically-zero grads)."""
    init = {"w": np.ones(3, np.float32)}
    grads = [{"w": np.ones(3, np.float32)},      # latch
             {"w": np.zeros(3, np.float32)},     # zero AFTER latch: counts
             {"w": np.ones(3, np.float32)}]
    ours = _jax_adam_traj(grads, init)
    ref = _torch_adam_traj(grads, init)
    for i in range(len(grads)):
        np.testing.assert_allclose(ours[i]["w"], ref[i]["w"],
                                   rtol=2e-5, atol=2e-7)


def test_build_optimizer_matches_torch_with_lr_decay():
    """Full chain (lazy Adam + the reference's exponential LR rule,
    ref run_nerf.py:603-613) vs torch Adam whose group lr is set per step
    by the same rule — including a gated param joining at step 3."""
    lrate, lrate_decay = 5e-3, 10
    rng = np.random.default_rng(1)
    init = {"a": rng.normal(size=(5,)).astype(np.float32),
            "b": rng.normal(size=(2, 2)).astype(np.float32)}
    n_steps, gate = 8, 3
    grads = [{"a": rng.normal(size=(5,)).astype(np.float32),
              "b": (None if i < gate
                    else rng.normal(size=(2, 2)).astype(np.float32))}
             for i in range(n_steps)]

    tx = build_optimizer(lrate, lrate_decay)
    params = {k: jnp.asarray(v) for k, v in init.items()}
    state = tx.init(params)
    ours = []
    for g in grads:
        gz = {k: (jnp.zeros_like(params[k]) if g[k] is None
                  else jnp.asarray(g[k])) for k in params}
        updates, state = tx.update(gz, state, params)
        import optax
        params = optax.apply_updates(params, updates)
        ours.append({k: np.asarray(v) for k, v in params.items()})

    ps = {k: torch.nn.Parameter(torch.tensor(v)) for k, v in init.items()}
    opt = torch.optim.Adam(ps.values(), lr=lrate)
    ref = []
    for i, g in enumerate(grads):
        # the reference sets the group lr from the GLOBAL step for every
        # param (run_nerf.py:603-613), gated or not
        for group in opt.param_groups:
            group["lr"] = lrate * (0.1 ** (i / (lrate_decay * 1000)))
        opt.zero_grad(set_to_none=True)
        for k, gv in g.items():
            if gv is not None:
                ps[k].grad = torch.tensor(gv)
        opt.step()
        ref.append({k: p.detach().numpy().copy() for k, p in ps.items()})

    for i in range(n_steps):
        for k in init:
            np.testing.assert_allclose(ours[i][k], ref[i][k],
                                       rtol=2e-5, atol=2e-7,
                                       err_msg=f"step {i} param {k}")
