"""RBK rigid-blurring model (DP-NeRF).

TPU-native reimplementation of ref: networks/dpnerf/blurmodel.py: three MLP
branches over [view embedding, (optional PDRF ray features)] predict
per-image screw-motion parameters ``r``, ``v`` (``num_motion`` each,
initialized near zero via the reference's tiny xavier gain — whose formula actually yields bound 1e-5*6/(W+out), ~1.6e-6 at defaults, not the 1e-5 its comment claims; replicated exactly) and sigmoid-normalized composite
weights; rays are warped by the SE(3) exponential map per motion.

The reference's branch loops re-read the branch *input* at every layer
(ref: dpnerf/blurmodel.py:148-158), so with depth > 1 only the last layer
of each branch affects the output; this implementation replicates that
behavior exactly (all configs use depth 1, where it coincides with a
chained MLP).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..utils import se3
from .layers import TorchLinear, xavier_uniform_init


class RigidBlurringModel(nn.Module):
    """Screw-motion blur kernel; expands each ray into ``num_motion``(+1)
    rigidly-warped rays."""

    view_embed_cnl: int               # W in the reference ctor
    num_motion: int = 2
    D_r: int = 1
    W_r: int = 32
    D_v: int = 1
    W_v: int = 32
    D_w: int = 1
    W_w: int = 32
    output_ch_r: int = 3
    output_ch_v: int = 3
    feat_ch: int = 15                 # per-motion PDRF feature channels
    rv_window: float = 0.2
    use_origin: bool = True
    use_view_embed: bool = True

    @property
    def num_pt(self) -> int:
        return self.num_motion + 1 if self.use_origin else self.num_motion

    @property
    def total_feat_ch(self) -> int:
        # naive PDRF+RBK support concatenates per-motion features
        # (ref: dpnerf/blurmodel.py:25)
        return self.feat_ch * self.num_pt

    def setup(self):
        out_r = self.output_ch_r * self.num_motion
        out_v = self.output_ch_v * self.num_motion
        self.r_branch = [TorchLinear(self.W_r, name=f"r_branch_{i}")
                         for i in range(self.D_r)]
        # final r/v heads start near zero so training begins from the
        # identity motion. The gain formula is the reference's verbatim
        # (ref: dpnerf/blurmodel.py:38-45) INCLUDING its inverted factor:
        # the resulting uniform bound is 1e-5*6/(W+out) (~1.6e-6 at
        # defaults), not the 1e-5 the upstream comment claims.
        r_gain = 1e-5 / np.sqrt((self.W_r + out_r) / 6.0)
        self.r_linear = TorchLinear(out_r, kernel_init=xavier_uniform_init(r_gain),
                                    name="r_linear")
        self.v_branch = [TorchLinear(self.W_v, name=f"v_branch_{i}")
                         for i in range(self.D_v)]
        v_gain = 1e-5 / np.sqrt((self.W_v + out_v) / 6.0)
        self.v_linear = TorchLinear(out_v, kernel_init=xavier_uniform_init(v_gain),
                                    name="v_linear")
        self.w_branch = [TorchLinear(self.W_w, name=f"w_branch_{i}")
                         for i in range(self.D_w)]
        # one weight per output ray; the reference hardcodes num_motion+1
        # (ref: dpnerf/blurmodel.py:32,49), which only matches its own warp
        # output when use_origin=True — every published config. num_pt keeps
        # the use_origin=False path consistent too.
        self.w_linear = TorchLinear(self.num_pt, name="w_linear")

    def rbk_warp(self, rays, r, v):
        """Warp [N, 3, 2] rays by the per-motion screw transforms
        (ref: dpnerf/blurmodel.py:51-82). Returns [N, num_pt, 3, 2]."""
        N = rays.shape[0]
        # reshape [N, 3*num_motion] -> [N, 3, num_motion], motion i takes
        # every num_motion-th column (torch .reshape parity)
        r = r.reshape(N, 3, self.num_motion)
        v = v.reshape(N, 3, self.num_motion)
        rays_o, rays_d = rays[..., 0], rays[..., 1]
        pts_end = rays_o + rays_d

        # [N, num_motion, 4, 4] transforms, all motions at once
        rot = jnp.moveaxis(r, -1, 1)            # [N, num_motion, 3]
        trans = jnp.moveaxis(v, -1, 1)
        transform = se3.se3_transform_from_rot_trans(rot, trans)

        warped_o = se3.se3_warp_points(rays_o[:, None, :], transform)
        warped_end = se3.se3_warp_points(pts_end[:, None, :], transform)
        warped = jnp.stack([warped_o, warped_end - warped_o], -1)

        if self.use_origin:
            identity = jnp.stack([rays_o, rays_d], -1)[:, None]
            warped = jnp.concatenate([identity, warped], axis=1)
        return warped

    def rbk_warp_pose(self, poses, r, v):
        """Warp [N, 3, 4] camera poses per motion
        (ref: dpnerf/blurmodel.py:84-110). Returns [N, num_pt, 4, 4].

        API-parity surface: defined but UNCALLED upstream as well (the
        train path warps rays, not poses); tested for consistency with
        rbk_warp in tests/test_blur.py."""
        N = poses.shape[0]
        r = r.reshape(N, 3, self.num_motion)
        v = v.reshape(N, 3, self.num_motion)
        bottom = jnp.broadcast_to(jnp.eye(4)[None, -1:, :], (N, 1, 4))
        poses_h = jnp.concatenate([poses, bottom], axis=1)

        rot = jnp.moveaxis(r, -1, 1)
        trans = jnp.moveaxis(v, -1, 1)
        transform = se3.se3_transform_from_rot_trans(rot, trans)
        warped = se3.se3_warp_pose(poses_h[:, None], transform)
        if self.use_origin:
            warped = jnp.concatenate([poses_h[:, None], warped], axis=1)
        return warped

    def rbk_weighted_sum(self, rgb, depth, acc, extras, ccw):
        """Compose per-motion outputs with [N, num_pt] weights
        (ref: dpnerf/blurmodel.py:112-127).

        API-parity surface: upstream the renderer calls this
        (ref renderer.py:327-329); here the jitted renderer composes
        inline (models/renderer.py), so this is the standalone twin —
        tested against the inline form in tests/test_blur.py."""
        num_pt = self.num_pt

        def reduce(v):
            if v.ndim == 1:
                return jnp.sum(v.reshape(-1, num_pt) * ccw, axis=1)
            if v.ndim == 2:
                return jnp.sum(v.reshape(-1, num_pt, v.shape[-1])
                               * ccw[..., None], axis=1)
            return jnp.sum(v.reshape(-1, num_pt, v.shape[-2], v.shape[-1])
                           * ccw[..., None, None], axis=1)

        rgb = reduce(rgb)
        depth = reduce(depth)
        acc = reduce(acc)
        extras = {k: reduce(v) for k, v in extras.items()}
        return rgb, depth, acc, extras

    def __call__(self, rays, img_embed, feats: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, None]:
        """rays [N, 3, 2]; img_embed [N, C_view]; feats [N, total_feat_ch]
        or None. Returns (new_rays [N, num_pt, 3, 2], weight [N, num_pt],
        align=None). (ref: dpnerf/blurmodel.py:129-173)"""
        N = rays.shape[0]
        h = (img_embed if self.use_view_embed
             else jnp.zeros((N, 0), dtype=rays.dtype))
        if feats is None:
            feats = jnp.zeros((N, self.total_feat_ch), dtype=rays.dtype)
        else:
            feats = feats.reshape(N, self.total_feat_ch)
        h_branch = jnp.concatenate([h, feats], axis=-1)

        # reference-literal branch evaluation: every layer reads h_branch
        h_r = h_v = h_w = h_branch
        for layer in self.r_branch:
            h_r = nn.relu(layer(h_branch))
        for layer in self.v_branch:
            h_v = nn.relu(layer(h_branch))
        for layer in self.w_branch:
            h_w = nn.relu(layer(h_branch))

        r = self.r_linear(h_r) * self.rv_window
        v = self.v_linear(h_v) * self.rv_window
        weight = nn.sigmoid(self.w_linear(h_w))
        weight = weight / (jnp.sum(weight, axis=-1, keepdims=True) + 1e-10)

        new_rays = self.rbk_warp(rays, r, v)
        return new_rays, weight, None
