"""Hierarchical inverse-CDF sampling along rays (jit-safe, fixed shapes).

Equivalent to the reference's ``sample_pdf`` (ref: utils/rays.py:149-193)
but formulated TPU-first: the searchsorted inversion is a vectorized
broadcast-compare reduction (no data-dependent control flow), which XLA
fuses into a single VPU loop. Randomness comes from an explicit PRNG key,
natively fixing the reference's flagged cumsum non-determinism
(ref: utils/rays.py:153).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import lane_shuffle


def searchsorted_right(sorted_seq, values):
    """Batched ``searchsorted(..., side='right')``.

    sorted_seq: [..., M] ascending; values: [..., N].
    Returns int32 [..., N] = #{m : sorted_seq[m] <= v}.

    Implemented as a broadcast-compare sum: for the small per-ray bin counts
    used here (M <= 256) this is faster on TPU than a binary-search loop and
    has no gather/dynamic-slice in its gradient path.
    """
    return jnp.sum(
        (sorted_seq[..., None, :] <= values[..., :, None]).astype(jnp.int32),
        axis=-1)


def sample_pdf(key, bins, weights, N_samples, det=False):
    """Draw N_samples per ray from the piecewise-constant PDF over ``bins``.

    bins: [R, M] bin positions; weights: [R, M-1] unnormalized bin masses.
    Returns samples [R, N_samples]. Matches ref: utils/rays.py:149-193
    (same 1e-5 weight epsilon and degenerate-interval handling).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # [R, M]

    if det:
        u = jnp.linspace(0.0, 1.0, N_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (N_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (N_samples,),
                               dtype=cdf.dtype)

    inds = searchsorted_right(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    # one fused Pallas lane-gather pass on TPU (XLA lowers these four
    # take_along_axis to ~2.4M single-element row gathers, ~60 ms/step);
    # forward-only: the caller stop-gradients the result, matching the
    # reference's .detach() (ref: utils/rays.py:188)
    cdf_below, cdf_above, bins_below, bins_above = lane_shuffle.cdf_take(
        jax.lax.stop_gradient(cdf), jax.lax.stop_gradient(bins),
        below, above)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)
