"""Adaptive Weight Proposal (AWP) + Motion Aggregation Module (MAM).

TPU-native reimplementation of ref: networks/dpnerf/awp.py and
networks/dpnerf/mam.py: per-sample fine features are embedded by a small
MLP, volumetrically integrated per motion, concatenated with the view
embedding + ray-direction PE, run through a motion-embedding MLP, refined
by CurveNet-style cross-motion attention (MAM), adaptive-avg-pooled and
mapped to sigmoid weights normalized per ray.

Layout note: the reference uses torch Conv1d/Conv2d with kernel_size=1,
which are channel-wise dense layers; here everything stays channels-last
([B, N, C] / [B, N, L, C]) and uses Dense, which XLA maps straight onto the
MXU without the transpose shuffling of the torch layout.

Reference quirk replicated on purpose: ``feature_integration`` runs its
transmittance cumprod over the *feature* axis (ref: awp.py:70-73, torch dim
-1 after a dim=-2 concat), not the sample axis. It feeds a learned
embedding, so the semantics are "a" fixed mixing, and parity requires the
exact same computation.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops import compositing
from .embedding import positional_encoding
from .layers import TorchLinear


class CorrelationModule(nn.Module):
    """Inter/intra-motion attention (ref: networks/dpnerf/mam.py:13-53).

    x: [B, N, C] global motion features; curves: [B, N, L, Cc] local
    per-sample features. Returns [B, N, C].
    """

    in_channel: int

    @nn.compact
    def __call__(self, x, curves, is_train: bool = True):
        mid = self.in_channel // 2
        B, N, L, Cc = curves.shape

        # line_conv_att: Conv2d(C->1, k=1) over channels (ref: mam.py:29,32)
        curves_att = TorchLinear(1, bias_mode="none",
                                 name="line_conv_att")(curves)  # [B,N,L,1]
        att = curves_att[..., 0]                                 # [B,N,L]
        # inter: softmax over L, sum over L -> [B, N, Cc]
        inter_w = nn.softmax(att, axis=-1)
        curver_inter = jnp.einsum("bnlc,bnl->bnc", curves, inter_w)
        # intra: softmax over N, sum over N -> [B, L, Cc]
        intra_w = nn.softmax(att, axis=-2)
        curves_intra = jnp.einsum("bnlc,bnl->blc", curves, intra_w)

        curver_inter = TorchLinear(mid, bias_mode="none",
                                   name="conva")(curver_inter)   # [B,N,mid]
        curves_intra = TorchLinear(mid, bias_mode="none",
                                   name="convb")(curves_intra)   # [B,L,mid]

        x_logits = TorchLinear(mid, bias_mode="none", name="convc")(x)
        # attention logits against inter (over motions) and intra (samples)
        x_inter = nn.softmax(
            jnp.einsum("bnm,bkm->bnk", x_logits, curver_inter), axis=-1)
        x_intra = nn.softmax(
            jnp.einsum("bnm,blm->bnl", x_logits, curves_intra), axis=-1)

        curver_inter = TorchLinear(mid, bias_mode="none",
                                   name="convn")(curver_inter)
        curves_intra = TorchLinear(mid, bias_mode="none",
                                   name="convl")(curves_intra)

        x_inter = jnp.einsum("bnk,bkm->bnm", x_inter, curver_inter)
        x_intra = jnp.einsum("bnl,blm->bnm", x_intra, curves_intra)

        curve_features = jnp.concatenate([x_inter, x_intra], -1)  # [B,N,2mid]
        h = TorchLinear(self.in_channel, bias_mode="none",
                        name="convd")(curve_features)
        # BatchNorm1d over [B*, C] stats per channel (ref: mam.py:26)
        h = nn.BatchNorm(use_running_average=not is_train, momentum=0.9,
                         epsilon=1e-5, axis_name=None,
                         name="convd_bn")(h)
        return nn.leaky_relu(x + h, negative_slope=0.2)


class MotionAggregationModule(nn.Module):
    """Wraps CorrelationModule with the local-feature projection
    (ref: networks/dpnerf/mam.py:56-84)."""

    in_channels: int
    num_motion: int

    @nn.compact
    def __call__(self, x_global, x_local, is_train: bool = True):
        """x_global: [B, num_pt, C]; x_local: [B*num_pt, S, D]. -> [B, num_pt, C]"""
        B, num_pt, _ = x_global.shape
        S = x_local.shape[1]
        x_local = x_local.reshape(B, num_pt, S, -1)
        x_local = TorchLinear(32, name="linear")(x_local)  # (ref: mam.py:60)
        return CorrelationModule(self.in_channels, name="Corr")(
            x_global, x_local, is_train=is_train)


class AdaptiveWeightProposal(nn.Module):
    """DP-NeRF adaptive weight proposal (ref: networks/dpnerf/awp.py:9-117)."""

    num_motion: int
    D_sam: int = 4
    W_sam: int = 32
    D_mot: int = 1
    W_mot: int = 32
    ray_dir_freq: int = 2
    use_origin: bool = True
    ccw_fine_scale: float = 0.05

    @property
    def output_ch(self) -> int:
        return self.num_motion + 1 if self.use_origin else self.num_motion

    def feature_integration(self, feat, z_vals, rays_d):
        """Reference-literal "volumetric" feature integration
        (ref: awp.py:49-77; see module docstring for the cumprod-axis quirk).

        feat: [N_ray, num_pt, S, D]; z_vals/rays_d: [N_ray*num_pt, S]/[.., 3].
        Returns [N_ray, num_pt, D].
        """
        N_ray, num_pt, S, D = feat.shape
        feat = feat.reshape(-1, S, D)
        dists = z_vals[..., 1:] - z_vals[..., :-1]
        dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

        alpha = 1.0 - jnp.exp(-feat[..., :-1, :] * dists[..., None])
        alpha = jnp.concatenate([alpha, jnp.zeros_like(alpha[:, :1])], axis=-2)
        # one-pass-backward cumprod (factors strictly positive); the
        # cumprod axis faithfully stays the feature axis (the quirk)
        trans = compositing._cumprod_lanes(
            jnp.concatenate([jnp.ones((alpha.shape[0], 1, alpha.shape[-1])),
                             1.0 - alpha + 1e-10], axis=-2))[:, :-1, :]
        weights = alpha * trans
        integrated = jnp.sum(weights * feat, axis=-2)
        return integrated.reshape(N_ray, num_pt, D)

    @nn.compact
    def __call__(self, depth_feature, z_vals, rays_d, view_feature,
                 is_train: bool = True):
        """depth_feature: [N_ray*num_pt, S, input_ch] per-sample fine
        features; z_vals: [N_ray*num_pt, S]; rays_d: [N_ray*num_pt, 3]
        (NDC); view_feature: [N_ray, C_view]. Returns ccw [N_ray, num_pt]
        normalized to sum 1."""
        num_pt = self.output_ch
        N_ray = depth_feature.shape[0] // num_pt
        S = depth_feature.shape[1]

        # sharp-ray view direction PE (ref: awp.py:86-89)
        viewdirs = rays_d.reshape(N_ray, num_pt, 3)[:, 0, :]
        viewdirs = viewdirs / jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)
        ray_dirs_embed = positional_encoding(viewdirs, self.ray_dir_freq)
        view_embedded = (jnp.concatenate([view_feature, ray_dirs_embed], -1)
                         if view_feature is not None else ray_dirs_embed)

        h = depth_feature
        for i in range(self.D_sam):
            h = nn.relu(TorchLinear(self.W_sam,
                                    name=f"sample_feature_embed_{i}")(h))
        h_local = h                                     # [N*pt, S, W_sam]

        h = self.feature_integration(
            h.reshape(N_ray, num_pt, S, self.W_sam), z_vals, rays_d)

        view_embedded = jnp.broadcast_to(
            view_embedded[:, None, :],
            (N_ray, num_pt, view_embedded.shape[-1]))
        h = jnp.concatenate([h, view_embedded], -1)
        # note: D_mot + 1 layers (ref: awp.py:41-43 appends D_mot extras)
        for i in range(self.D_mot + 1):
            h = nn.relu(TorchLinear(self.W_mot,
                                    name=f"motion_feature_embed_{i}")(h))

        h = MotionAggregationModule(self.W_mot, self.num_motion,
                                    name="MAM")(h, h_local, is_train=is_train)
        # adaptive_avg_pool1d over the motion axis (ref: awp.py:112)
        h = jnp.mean(h, axis=1)                          # [N_ray, W_mot]
        w = nn.sigmoid(TorchLinear(self.output_ch, name="w_linear")(h))
        return w / jnp.sum(w, -1, keepdims=True)
