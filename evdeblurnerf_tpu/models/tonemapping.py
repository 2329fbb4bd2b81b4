"""Camera response functions (CRF) and tonemapping.

Reimplements ref: networks/tonemapping.py: two CRF heads (rgb + event), each
none / gamma / learned-residual-MLP ``sigmoid(0.1*MLP([x, extra]) + x)``,
plus luma conversion. The identity pre-fit (3000 inner Adam steps at build
time, ref: tonemapping.py:29-57) is a single jitted ``lax.scan`` here, so it
costs well under a second instead of a progress-bar loop.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from .layers import TorchLinear

LUMA_WEIGHTS = {
    "rec601": (0.299, 0.587, 0.114),
    "rec709": (0.2126, 0.7152, 0.0722),
}


class CRF(nn.Module):
    """One response-function head (ref: tonemapping.py:7-93)."""

    map_type: str = "none"            # none | gamma | learn
    gamma: float = 2.2
    extra_features: int = 0

    @nn.compact
    def __call__(self, x, x_feat: Optional[jnp.ndarray] = None,
                 skip_learn: bool = False):
        """x [..., 3] linear radiance -> encoded. ``x_feat``: [N, extra] or
        [N, 3, extra] per-ray CRF conditioning features (BII cumsums)."""
        assert self.map_type in ("none", "gamma", "learn")
        if self.map_type == "gamma":
            x = x ** (1.0 / self.gamma)

        if self.map_type != "learn":
            return x

        # Parameters must exist regardless of skip_learn so the param tree
        # is stable across the learn-start boundary.
        mlp = [TorchLinear(16, name="linear_0"),
               TorchLinear(16, name="linear_1"),
               TorchLinear(16, name="linear_2"),
               TorchLinear(1, name="linear_3")]

        def apply_mlp(inp):
            h = inp
            for i, layer in enumerate(mlp):
                h = layer(h)
                if i < 3:
                    h = nn.relu(h)
            return h

        ori_shape = x.shape
        x_in = x.reshape(-1, 1)
        if x_feat is not None and self.extra_features > 0:
            feat = x_feat.astype(x_in.dtype)
            if feat.ndim != 3:
                # per-ray features repeated over the 3 channels
                # (ref: tonemapping.py:76-78)
                feat = jnp.repeat(feat[:, None, :], 3, axis=1)
            feat = feat.reshape(-1, self.extra_features)
            x_feat_in = jnp.concatenate([x_in, feat], -1)
        else:
            x_feat_in = x_in
            if self.extra_features > 0:
                # zero-pad when no features provided (ref: tonemapping.py:83-86)
                pad = jnp.zeros((x_in.shape[0], self.extra_features), x_in.dtype)
                x_feat_in = jnp.concatenate([x_in, pad], -1)

        res_x = apply_mlp(x_feat_in) * 0.1
        x_out = jax.nn.sigmoid(res_x + x_in).reshape(ori_shape)
        if isinstance(skip_learn, bool):
            return x if skip_learn else x_out
        # traced boolean: select without recompiling at the learn-start
        # boundary (ref gates with a python step compare, run_nerf.py:443)
        return jnp.where(jnp.asarray(skip_learn), x, x_out)


class TonemappingTransform(nn.Module):
    """RGB + event CRF pair with luma conversion
    (ref: tonemapping.py:96-154)."""

    map_type_rgb: str = "none"
    map_type_event: str = "none"
    gamma: float = 2.2
    luma_standard: str = "rec601"
    extra_features_event: int = 0
    extra_features_rgb: int = 0

    def setup(self):
        self.tonemapping_rgb = CRF(self.map_type_rgb, self.gamma,
                                   self.extra_features_rgb)
        self.tonemapping_event = CRF(self.map_type_event, self.gamma,
                                     self.extra_features_event)

    def encode_rgb(self, x, skip_learn_crf=False, rgb_extra_feat=None):
        return self.tonemapping_rgb(x, x_feat=rgb_extra_feat,
                                    skip_learn=skip_learn_crf)

    def encode_luma(self, x, keep_rgb=False, tonemap_only=False,
                    skip_learn_crf=False, ev_extra_feat=None):
        x = self.tonemapping_event(x, x_feat=ev_extra_feat,
                                   skip_learn=skip_learn_crf)
        if not tonemap_only:
            if self.luma_standard in LUMA_WEIGHTS:
                w = LUMA_WEIGHTS[self.luma_standard]
                x = w[0] * x[..., 0:1] + w[1] * x[..., 1:2] + w[2] * x[..., 2:3]
            elif self.luma_standard == "avg":
                x = x.mean(axis=-1, keepdims=True)
            else:
                raise ValueError(f"Unknown luma_standard {self.luma_standard}")
            if keep_rgb:
                x = jnp.concatenate([x] * 3, axis=-1)
        return x

    def __call__(self, x, mode="encode_rgb", **kwargs):
        if mode == "encode_rgb":
            return self.encode_rgb(x, **kwargs)
        if mode == "encode_luma":
            return self.encode_luma(x, **kwargs)
        if mode == "init_all":
            # trace both heads so init materializes the full param tree
            return self.encode_rgb(x), self.encode_luma(x)
        raise RuntimeError(f"mode {mode!r} not recognized")


def crf_init_identity(crf_module: CRF, params, key, steps: int = 3000,
                      batch_size: int = 64, lr: float = 1e-2):
    """Pre-fit a learned CRF to the identity mapping.

    jitted ``lax.scan`` over ``steps`` Adam updates against y = x on uniform
    random inputs (ref: tonemapping.py:29-57; the torch loop's exact RNG
    stream is irrelevant — only the converged identity fit matters).
    Returns updated params.
    """
    if crf_module.map_type != "learn":
        return params

    tx = optax.adam(lr)

    def loss_fn(p, x):
        y = crf_module.apply({"params": p}, x)
        return jnp.mean((y - x) ** 2)

    @jax.jit
    def run(params, key):
        opt_state = tx.init(params)

        def step(carry, key_i):
            p, s = carry
            x = jax.random.uniform(key_i, (batch_size, 3))
            grads = jax.grad(loss_fn)(p, x)
            updates, s = tx.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), None

        keys = jax.random.split(key, steps)
        (params, _), _ = jax.lax.scan(step, (params, opt_state), keys)
        return params

    return run(params, key)
