"""Optimizer + learning-rate schedule.

Matches the reference's Adam setup (ref: run_nerf.py:243-274, 603-613):
linear warmup from ``lrate * warmup_factor`` over ``warmup_iters``, then
exponential decay ``lrate * 0.1^(step / (lrate_decay * 1000))``; optional
L2 weight decay on the color-net kernels only (torch-Adam style: the decay
term is added to the gradient *before* the moment updates, which is what the
``add_decayed_weights -> scale_by_adam`` chain below reproduces — optax's
``adamw`` would decouple it and differ).
"""

from __future__ import annotations

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
    chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    chain.append(optax.scale_by_learning_rate(
        lr_schedule(lrate, lrate_decay, warmup_iters, warmup_factor)))
    return optax.chain(*chain)
