"""Optimizer + learning-rate schedule.

Matches the reference's Adam setup (ref: run_nerf.py:243-274, 603-613):
linear warmup from ``lrate * warmup_factor`` over ``warmup_iters``, then
exponential decay ``lrate * 0.1^(step / (lrate_decay * 1000))``; optional
L2 weight decay on the color-net kernels only (torch-Adam style: the decay
term is added to the gradient *before* the moment updates, which is what the
``add_decayed_weights -> scale_by_adam_lazy`` chain below reproduces —
optax's ``adamw`` would decouple it and differ).

Bias-correction counts are PER-PARAMETER and lazily started, like torch:
torch.optim.Adam creates a param's state (``step = 0``) at the first
``step()`` call where ``p.grad is not None``, so a parameter group that
only joins the loss mid-training (the learned CRF at
``tone_mapping_start_learn_iter``, the blur kernel at
``kernel_start_iter``, the EGM branch at ``add_event_egm_startiter``)
takes its first update with bias correction ``t=1`` — roughly 2x the
step a global-count Adam would apply after a long gated stretch. A
single global optax count diverged from the reference by ~1e-3 relative
loss within one step of the CRF learn-start flip (measured by the
events-on lockstep recording); the per-leaf lazy count below restores
generation-time agreement. Under ``jit`` "grad is None" has no
equivalent, so a leaf's count latches on its first NONZERO gradient —
identical whenever the gated branch is disconnected from the loss (grads
exactly 0), which is how every schedule gate here behaves.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def lr_schedule(lrate: float, lrate_decay: int, warmup_iters: float = -1,
                warmup_factor: float = 0.1):
    """(ref: run_nerf.py:603-613)"""
    decay_steps = lrate_decay * 1000

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        decayed = lrate * (0.1 ** (step / decay_steps))
        if warmup_iters and warmup_iters > 0:
            scale = ((1 - warmup_factor) * step / warmup_iters
                     + warmup_factor)
            return jnp.where(step < warmup_iters, lrate * scale, decayed)
        return decayed

    return schedule


class ScaleByLazyAdamState(NamedTuple):
    """Per-leaf lazily-started Adam state. ``count`` is a pytree of int32
    scalars (one per leaf), unlike optax's single global count."""
    count: optax.Updates
    mu: optax.Updates
    nu: optax.Updates


def scale_by_adam_lazy(b1: float = 0.9, b2: float = 0.999,
                       eps: float = 1e-8) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` with torch's lazy per-param step counts
    (see module docstring). A leaf's count starts incrementing at its
    first nonzero gradient and every step thereafter (torch increments
    ``step`` even on numerically-zero grad tensors once state exists);
    until then the leaf's update is exactly zero."""

    def init(params):
        return ScaleByLazyAdamState(
            count=jax.tree.map(lambda p: jnp.zeros((), jnp.int32), params),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        del params
        new_count = jax.tree.map(
            lambda g, c: c + ((c > 0) | jnp.any(g != 0)).astype(jnp.int32),
            grads, state.count)
        new_mu = jax.tree.map(lambda g, m: b1 * m + (1 - b1) * g,
                              grads, state.mu)
        new_nu = jax.tree.map(lambda g, v: b2 * v + (1 - b2) * jnp.square(g),
                              grads, state.nu)

        def leaf_update(c, m, v):
            t = jnp.maximum(c, 1).astype(jnp.float32)
            mhat = m / (1 - b1 ** t)
            vhat = v / (1 - b2 ** t)
            u = mhat / (jnp.sqrt(vhat) + eps)
            return jnp.where(c > 0, u, jnp.zeros_like(u))

        updates = jax.tree.map(leaf_update, new_count, new_mu, new_nu)
        return updates, ScaleByLazyAdamState(new_count, new_mu, new_nu)

    return optax.GradientTransformation(init, update)


def colornet_kernel_mask(params):
    """Pytree mask selecting color-net kernels, the reference's
    weight-decay group (ref: run_nerf.py:244-247, regex
    ``\\.color_net\\.[0-9]+\\.weight``)."""
    import jax

    def leaf_mask(path, _leaf):
        keys = [getattr(p, "key", "") for p in path]
        in_colornet = any(str(k).startswith("color_net") for k in keys)
        return in_colornet and str(keys[-1]) == "kernel"

    return jax.tree_util.tree_map_with_path(leaf_mask, params)


def build_optimizer(lrate: float, lrate_decay: int, warmup_iters: float = -1,
                    warmup_factor: float = 0.1,
                    colornet_weightdecay=None, params=None,
                    clip_grads_norm=None) -> optax.GradientTransformation:
    """Adam(0.9, 0.999) with the reference schedule; pass ``params`` when
    ``colornet_weightdecay`` is set (mask construction needs the tree)."""
    chain = []
    if colornet_weightdecay:
        assert params is not None
        mask = colornet_kernel_mask(params)
        chain.append(optax.add_decayed_weights(colornet_weightdecay, mask))
    chain.append(scale_by_adam_lazy(b1=0.9, b2=0.999, eps=1e-8))
    chain.append(optax.scale_by_learning_rate(
        lr_schedule(lrate, lrate_decay, warmup_iters, warmup_factor)))
    return optax.chain(*chain)
