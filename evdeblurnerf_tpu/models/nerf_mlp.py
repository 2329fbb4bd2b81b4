"""Vanilla NeRF MLP field (mode=nerf).

8x256 MLP with a skip connection and a view-direction head, matching
ref: networks/nerf.py:7-175 (same activation table, same feature-extraction
hooks for AWP). Raw layout: [rgb(3), sigma(1)] per sample, pre-activation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import ACTIVATIONS, TorchLinear


class NeRFMLP(nn.Module):
    D: int = 8
    W: int = 256
    skips: Tuple[int, ...] = (4,)
    use_viewdirs: bool = True
    rgb_add_bias: bool = True
    extract_feature: str = "after_linear"   # "before_linear" | "after_linear"

    @nn.compact
    def __call__(self, pts_embedded, views_embedded: Optional[jnp.ndarray]):
        """pts_embedded [..., C_pts], views_embedded [..., C_views] or None.

        Returns (raw [..., 4], feature [..., W] or None).
        (ref: networks/nerf.py:131-162)
        """
        h = pts_embedded
        for i in range(self.D):
            h = TorchLinear(self.W, name=f"pts_linear_{i}")(h)
            h = nn.relu(h)
            if i in self.skips:
                h = jnp.concatenate([pts_embedded, h], -1)

        feature_out = None
        if self.extract_feature == "before_linear":
            feature_out = h

        if self.use_viewdirs:
            alpha = TorchLinear(1, name="alpha_linear")(h)
            feature = TorchLinear(self.W, name="feature_linear")(h)
            if self.extract_feature == "after_linear":
                feature_out = feature
            h = jnp.concatenate([feature, views_embedded], -1)
            h = nn.relu(TorchLinear(self.W // 2, name="views_linear_0")(h))
            rgb = TorchLinear(
                3, name="rgb_linear",
                bias_mode="torch" if self.rgb_add_bias else "none")(h)
            raw = jnp.concatenate([rgb, alpha], -1)
        else:
            assert self.extract_feature != "after_linear"
            raw = TorchLinear(4, name="output_linear")(h)
        return raw, feature_out


def nerf_activations(rgb_activate: str, sigma_activate: str):
    return ACTIVATIONS[rgb_activate], ACTIVATIONS[sigma_activate]
