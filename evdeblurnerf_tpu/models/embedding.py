"""Positional (frequency) encoding and per-image view embeddings.

Frequency encoding is a pure function (no params), matching
ref: networks/embedding.py:65-115: log-sampled bands 2^0..2^(m-1), per-band
[sin, cos], input prepended. View embeddings (ref: networks/embedding.py:6-62)
are flax modules.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .layers import TorchLinear


def positional_encoding_dim(multires: int, input_dim: int = 3,
                            include_input: bool = True) -> int:
    if multires <= 0:
        return input_dim
    return input_dim * ((1 if include_input else 0) + 2 * multires)


def positional_encoding(x, multires: int, include_input: bool = True,
                        double_angle: bool = False):
    """[..., D] -> [..., D*(1+2*multires)] with per-band [sin, cos] order.

    Computed as ONE stacked sin + ONE cos over [..., m, D] and an
    order-preserving reshape, instead of 2*m narrow per-band ops: on TPU
    each [N, 3] band tile-pads to the (sublane, lane) grid and the 2m+1-way
    concatenate reads them all back — measured ~10 ms/eval-chunk of sine
    fusions + concat at the paper scale (tools/trace_eval.py). Values and
    output order are bit-identical to the per-band form.

    ``double_angle`` replaces the 2m transcendentals with sin/cos of the
    base angle plus the double-angle recurrence
    ``sin 2a = 2 sin a cos a, cos 2a = 1 - 2 sin^2 a`` — 3 FMAs per band
    on the VPU instead of a polynomial transcendental per element. The
    recurrence runs in f32; the phase error roughly doubles per band
    (~2^m * 1 ulp ≈ 6e-5 after 10 bands), orders below bf16 resolution —
    used on the bf16 eval render path where the result is rounded to bf16
    anyway. NOT bit-identical to jnp.sin, so the exact path stays the
    default for training/parity.
    """
    if multires <= 0:
        return x
    D = x.shape[-1]
    if double_angle:
        xf = x.astype(jnp.float32)
        s, c = jnp.sin(xf), jnp.cos(xf)
        sins, coss = [s], [c]
        for _ in range(multires - 1):
            s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
            sins.append(s)
            coss.append(c)
        S = jnp.stack(sins, axis=-2)                   # [..., m, D]
        C = jnp.stack(coss, axis=-2)
        sc = jnp.stack([S, C], axis=-2)                # [..., m, 2, D]
    else:
        freqs = jnp.asarray(2.0 ** np.arange(multires, dtype=np.float32))
        scaled = x[..., None, :] * freqs[:, None]      # [..., m, D]
        sc = jnp.stack([jnp.sin(scaled), jnp.cos(scaled)], axis=-2)
    sc = sc.reshape(*x.shape[:-1], 2 * multires * D)   # [..., (sin_b, cos_b)*]
    sc = sc.astype(x.dtype)
    if not include_input:
        return sc
    return jnp.concatenate([x, sc], axis=-1)


class ViewEmbedding(nn.Module):
    """Per-training-image latent code table (ref: networks/embedding.py:6-32)."""

    num_embed: int
    embed_dim: int
    init_params: str = "zero"

    @property
    def out_channels(self):
        return self.embed_dim

    @nn.compact
    def __call__(self, idx):
        if self.init_params == "zero":
            init = nn.initializers.zeros
        elif self.init_params == "normal":
            init = nn.initializers.normal(stddev=1.0)
        elif self.init_params == "linspace":
            def init(key, shape, dtype=jnp.float32):
                lin = jnp.linspace(-1, 1, self.num_embed, dtype=dtype)
                return jnp.tile(lin[:, None], (1, self.embed_dim))
        else:
            raise ValueError(f"Unknown init_params: {self.init_params}")
        table = self.param("img_embed", init, (self.num_embed, self.embed_dim))
        return table[idx]


class ViewEmbeddingMLP(nn.Module):
    """Embedding table + skip-connected MLP, DP-NeRF style
    (ref: networks/embedding.py:35-62)."""

    num_embed: int
    embed_dim: int
    D: int
    W: int
    skips: tuple = (4,)
    init_params: str = "zero"

    @property
    def out_channels(self):
        return self.W

    @nn.compact
    def __call__(self, idx):
        embedded = ViewEmbedding(self.num_embed, self.embed_dim,
                                 self.init_params, name="table")(idx)
        h = embedded
        for i in range(self.D):
            h = TorchLinear(self.W, name=f"linear_{i}")(h)
            h = nn.relu(h)
            if i in self.skips:
                h = jnp.concatenate([embedded, h], -1)
        return h
