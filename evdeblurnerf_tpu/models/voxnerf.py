"""PDRF coarse-to-fine voxel fields (mode=c2f): TensoRF-style factored
tri-plane/line appearance grids + small sigma/color MLPs.

TPU-native reimplementation of ref: networks/pdrf/voxnerf.py. Grid lookups go
through :mod:`evdeblurnerf_tpu.ops.triplane`; the two composite modes are:

* CRR ("composite-then-color", ``composite_feature=True``): integrate the
  per-sample geometry features over the ray, then run the color MLP once per
  ray (ref: voxnerf.py:223-239);
* FVR ("color-then-composite", ``composite_feature=False``): per-sample
  color, then alpha-composite (ref: voxnerf.py:240-257).
"""

from __future__ import annotations

from typing import Tuple

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from ..ops import compositing, lane_shuffle, triplane
from ..parallel import tp as tp_ctx
from .embedding import positional_encoding
from .layers import ACTIVATIONS, TorchLinear


def compute_grid_size(aabb_min, aabb_max, n_voxels) -> Tuple[int, int, int]:
    """Voxel count -> integer per-axis grid resolution
    (ref: voxnerf.py:86-93, torch ``.long()`` truncation)."""
    extent = np.asarray(aabb_max, np.float64) - np.asarray(aabb_min, np.float64)
    voxel_size = float((extent.prod() / n_voxels) ** (1.0 / 3.0))
    return tuple(int(x) for x in (extent / voxel_size))


class VoxelNeRF(nn.Module):
    """One field (coarse CRR or fine FVR stage).

    ``aabb``: ((min3), (max3)) static python tuple.
    """

    aabb: Tuple[Tuple[float, float, float], Tuple[float, float, float]]
    n_voxels: int
    app_n_comp: Tuple[int, ...] = (64, 16, 16)
    app_dim: int = 32
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    add_bias_color: bool = False
    multires: int = 10                 # positional encoding bands for pts
    multires_views: int = 4            # bands for view dirs
    extra_app_dim: int = 0             # coarse features forwarded to the fine net
    composite_feature: bool = True
    rgb_activate: str = "relu"         # applied to features in the CRR path
    sigma_activate: str = "relu"
    app_actfn: str = "none"
    render_rmnearplane: int = 0
    packed_sampling: bool = True       # neighbor-packed single-gather path
    table_bf16: bool = False           # bf16 forward gathers, f32 backward
    line_matmul: bool = False          # line rows via one-hot MXU matmul

    def setup(self):
        grid = compute_grid_size(self.aabb[0], self.aabb[1], self.n_voxels)
        self.grid_size = grid
        planes, lines = [], []
        for i in range(3):
            m0, m1 = triplane.MAT_MODE[i]
            vec = triplane.VEC_MODE[i]
            planes.append(self.param(
                f"app_plane_{i}",
                lambda key, shape: 0.1 * jax.random.normal(key, shape),
                (self.app_n_comp[i], grid[m1], grid[m0])))
            lines.append(self.param(
                f"app_line_{i}",
                lambda key, shape: 0.1 * jax.random.normal(key, shape),
                (self.app_n_comp[i], grid[vec])))
        self.app_plane = planes
        self.app_line = lines
        self.basis_mat = TorchLinear(self.app_dim, bias_mode="none",
                                     name="basis_mat")

        self.sigma_net = [
            TorchLinear(
                (1 + self.geo_feat_dim) if l == self.num_layers - 1
                else self.hidden_dim,
                bias_mode="none", name=f"sigma_net_{l}")
            for l in range(self.num_layers)]
        self.color_net = [
            TorchLinear(
                3 if l == self.num_layers_color - 1 else self.hidden_dim_color,
                bias_mode="torch" if self.add_bias_color else "none",
                name=f"color_net_{l}")
            for l in range(self.num_layers_color)]

    def normalize_coords(self, pts):
        """World points -> [-1, 1] grid coords (ref: voxnerf.py:203-206)."""
        aabb0 = jnp.asarray(self.aabb[0])
        inv_size = 2.0 / (jnp.asarray(self.aabb[1]) - aabb0)
        return (pts - aabb0) * inv_size - 1.0

    def _eval_bf16(self, is_train: bool) -> bool:
        """One gate for the whole bf16 eval chain (interp arithmetic AND
        the double-angle PE must toggle together); EVDN_EVAL_F32_INTERP=1
        restores f32 eval arithmetic (A/B escape for quality validation)."""
        return (self.table_bf16 and not is_train
                and not os.environ.get("EVDN_EVAL_F32_INTERP"))

    def sample(self, pts, is_train=True):
        """World pts [..., 3] -> appearance features [..., app_dim]
        (ref: voxnerf.py:132-151, 203-208).

        The packed path gathers one neighbor-packed row per plane/line
        instead of 4+2 (see ops/triplane.py); packing is a pure function of
        the params so XLA CSE computes it once per step across all sample()
        calls. Eval (``is_train=False`` with bf16 tables) keeps the whole
        interpolation chain in bf16 — the values are bf16-rounded by the
        gather either way, and the f32 converts/copies of the gathered
        rows were ~12% of the eval chunk (trace_eval.py)."""
        shape = pts.shape[:-1]
        xyz = self.normalize_coords(pts.reshape(-1, 3))
        # NOTE: routing this through the fused Pallas sampling kernels
        # (ops/fused_sample.py) was measured SLOWER at the paper-scale
        # step (fwd 281 vs 268 ms, bwd 1004 vs 671 ms): XLA's own fusion
        # of the select/weight chains into the gathers/scatters is
        # already near the intrinsic row-take/scatter cost, and the
        # kernel boundary forces extra materializations in the backward.
        # The jnp path below is the fast path; the kernels remain as a
        # tested, documented experiment.
        tp = tp_ctx.get_tp()
        if (tp is not None and self.packed_sampling
                and not self.is_initializing()):
            # Tensor-parallel tables (2-D data x model mesh, see
            # parallel/tp.py): the whole per-plane pipeline runs inside a
            # shard_map on component slices, with the basis contraction
            # folded in (its per-plane segments are K-blocks of the same
            # dot). Init always takes the standard path so the param tree
            # is identical with and without tp.
            mesh, dax, max_ = tp
            n_d, n_m = mesh.shape[dax], mesh.shape[max_]
            divisible = (xyz.shape[0] % n_d == 0
                         and all(int(p.shape[0]) % n_m == 0
                                 for p in self.app_plane))
            if divisible:
                compute_bf16 = self._eval_bf16(is_train)
                kernel = self.basis_mat.variables["params"]["kernel"]
                feats = triplane.triplane_features_tp(
                    self.app_plane, self.app_line, xyz, kernel,
                    mesh, dax, max_, table_bf16=self.table_bf16,
                    line_matmul=self.line_matmul,
                    compute_bf16=compute_bf16)
                feats = checkpoint_name(feats, "triplane_feats")
                return ACTIVATIONS[self.app_actfn](feats).reshape(
                    *shape, self.app_dim)
        if self.packed_sampling:
            compute_bf16 = self._eval_bf16(is_train)
            planes, lines = self.app_plane, self.app_line
            if compute_bf16:
                # cast BEFORE packing: halves the packed-table bytes the
                # eval program materializes (no f32 packed + bf16 view
                # pair), which keeps the small tables VMEM-promotable
                planes = [p.astype(jnp.bfloat16) for p in planes]
                lines = [l.astype(jnp.bfloat16) for l in lines]
            pp, pl_ = triplane.pack_grids(planes, lines)
            if (not is_train and xyz.shape[0] <= 1_500_000
                    and not os.environ.get("EVDN_EVAL_SHARED_PACK")):
                # Eval at <=16k-ray chunks: give THIS sample() call its own
                # packed tables instead of CSE-sharing one pack across the
                # whole chunk. There the shared pack's lifetime spans both
                # render passes and XLA's alternate-memory pass evicts one
                # coarse table to HBM mid-program (measured: that gather
                # runs 11.3 ms vs 1.95 ms for its VMEM-resident siblings;
                # per-call packs cut the 16k chunk 126.7 -> 118.6 ms,
                # tools/trace_eval.py). At 32k-ray chunks no eviction
                # happens and the barrier only costs (~1.4% on the bench),
                # so the re-pack is gated on the traced point count; train
                # always keeps the shared pack (fwd+bwd reuse it and HBM
                # there is dominated by the scatters).
                pp, pl_ = jax.lax.optimization_barrier((tuple(pp),
                                                        tuple(pl_)))
            if (os.environ.get("EVDN_FOLD_BASIS")
                    and not self.is_initializing()):
                # layout-copy experiment (VERDICT r3 #7): fold the basis
                # matmul into per-plane dots so the gather epilogues feed
                # the MXU directly and the [N, sum(C)] concat at the
                # {1,0}-gather -> {0,1}-dot boundary disappears. Numerics:
                # blocked K-contraction of the same products (f32 grouping
                # only). Measurement decides whether this becomes a flag.
                kernel = self.basis_mat.variables["params"]["kernel"]
                feats = triplane.triplane_features_packed_folded(
                    pp, pl_, xyz, kernel, table_bf16=self.table_bf16,
                    line_matmul=self.line_matmul,
                    compute_bf16=compute_bf16)
                feats = checkpoint_name(feats, "triplane_feats")
                return ACTIVATIONS[self.app_actfn](feats).reshape(
                    *shape, self.app_dim)
            feats = triplane.triplane_features_packed(
                pp, pl_, xyz, table_bf16=self.table_bf16,
                line_matmul=self.line_matmul,
                compute_bf16=compute_bf16)
        else:
            feats = triplane.triplane_features(self.app_plane, self.app_line,
                                               xyz)
        # named for remat policies: gathers are the expensive op on TPU
        # (~20 ns/row floor; see PERF_NOTES.md)
        feats = checkpoint_name(feats, "triplane_feats")
        feats = self.basis_mat(feats)
        return ACTIVATIONS[self.app_actfn](feats).reshape(*shape, self.app_dim)

    def density(self, pts):
        """Raw (pre-activation) sigma at world pts [..., 3] — the sigma-net
        head of :meth:`__call__` without compositing or color. Used by the
        occupancy-grid refresh (ops/occupancy.py); evaluated in eval mode
        (no noise; bf16 chain if configured — the grid is a dilated
        threshold, insensitive to bf16 rounding)."""
        shape = pts.shape[:-1]
        fts = self.sample(pts, is_train=False)
        pe = positional_encoding(pts.reshape(-1, 3), self.multires,
                                 double_angle=self._eval_bf16(False))
        h = jnp.concatenate([fts.reshape(pe.shape[0], -1), pe], -1)
        for l, layer in enumerate(self.sigma_net):
            h = layer(h)
            if l != self.num_layers - 1:
                h = nn.relu(h)
        return h[..., 0].reshape(shape)

    def tv_loss_app(self):
        """(ref: voxnerf.py:126-130)"""
        return triplane.tv_loss_app(self.app_plane, self.app_line)

    def __call__(self, pts, viewdirs, fts, z_vals, rays_d, noise=None,
                 is_train=True, perm=None, inv_perm=None):
        """Field evaluation + compositing (ref: voxnerf.py:210-259).

        pts [R, S, 3]; viewdirs [R, 3] or None; fts [R, S, C_app] sampled
        features (possibly coarse+fine concat); z_vals [R, S]; rays_d [R, 3];
        noise: optional [R, S-1] sigma noise.

        ``perm``: optional [R, S] int32. When given, per-sample inputs
        (pts/fts) are in an UNSORTED order while ``z_vals`` is sorted, with
        ``z_vals[r, i] == z_cat[r, perm[r, i]]``. The pointwise field eval
        runs in the unsorted order; only the compositing scalars are
        permuted (lane-dimension shuffles — far cheaper on TPU than
        re-gathering table rows at sorted positions, see PERF_NOTES.md).
        Outputs are ordered exactly as the presorted path: weights and the
        FVR per-sample features align with the sorted ``z_vals``.

        Returns (color, depth, acc, weights, feature_map): color is [R, 3].
        In the FVR path ``feature_map`` is the per-sample sigma-net features
        [R, S, geo_feat_dim] (consumed by AWP, ref: voxnerf.py:220-221);
        in the CRR path it is the ray-integrated feature [R, geo_feat_dim]
        (consumed by the PBE kernel, ref: voxnerf.py:229 where raw2outputs
        overwrites feature_map with the composited features).
        """
        R, S = pts.shape[0], pts.shape[1]
        # bf16 eval renders (same gate as sample()'s compute_bf16): PE via
        # the double-angle recurrence — FMAs instead of 2m transcendentals
        # (~13 ms of sine fusions per eval chunk, tools/trace_eval.py); its
        # ~1e-5 f32 phase error vanishes under the bf16 rounding
        da = self._eval_bf16(is_train)
        pts_embedded = positional_encoding(pts.reshape(R * S, 3),
                                           self.multires, double_angle=da)
        h = jnp.concatenate([fts.reshape(R * S, -1), pts_embedded], -1)
        for l, layer in enumerate(self.sigma_net):
            h = layer(h)
            if l != self.num_layers - 1:
                h = nn.relu(h)

        feature_map = h[..., 1:].reshape(R, S, -1)
        sigma = h[..., 0].reshape(R, S)
        sigma_act = ACTIVATIONS[self.sigma_activate]

        rm_mask = None
        if not is_train and self.render_rmnearplane > 0:
            rm_mask = compositing.rmnearplane_mask(z_vals, self.render_rmnearplane)

        if perm is not None:
            # sigma to sorted order, weights back to the unsorted (cat)
            # order for the per-sample reductions — both single-vreg lane
            # gathers (ops/lane_shuffle.py; the inverse move previously
            # paid a full lax.sort on (perm, weights))
            sigma_sorted = lane_shuffle.permute_lanes(sigma, perm, inv_perm)
            weights = compositing.compute_weights(
                sigma_sorted, z_vals, rays_d, sigma_act, noise=noise,
                rmnearplane_mask=rm_mask)
            weights_cat = lane_shuffle.permute_lanes(weights, inv_perm, perm)
        else:
            weights = compositing.compute_weights(
                sigma, z_vals, rays_d, sigma_act, noise=noise,
                rmnearplane_mask=rm_mask)
            weights_cat = weights

        if self.composite_feature:
            # CRR: composite the (activated) geometry features over the ray,
            # then color once per ray.
            feat_act = ACTIVATIONS[self.rgb_activate](feature_map)
            feat_ray, _, _ = compositing.composite(
                weights_cat, feat_act, z_vals)
            depth_map = jnp.sum(weights * z_vals, -1)
            acc_map = jnp.sum(weights, -1)

            dirs_embedded = positional_encoding(viewdirs, self.multires_views,
                                                double_angle=da)
            hc = jnp.concatenate([feat_ray, dirs_embedded], -1)
            for l, layer in enumerate(self.color_net):
                hc = layer(hc)
                if l != self.num_layers_color - 1:
                    hc = nn.relu(hc)
            color = jax.nn.sigmoid(hc)
            feature_map = feat_ray
        else:
            # FVR: per-sample color, then composite.
            dirs = jnp.broadcast_to(viewdirs[:, None, :], (R, S, 3))
            dirs_embedded = positional_encoding(dirs.reshape(R * S, 3),
                                                self.multires_views,
                                                double_angle=da)
            hc = jnp.concatenate([h[..., 1:], dirs_embedded], -1)
            for l, layer in enumerate(self.color_net):
                hc = layer(hc)
                if l != self.num_layers_color - 1:
                    hc = nn.relu(hc)
            color_s = jax.nn.sigmoid(hc).reshape(R, S, 3)

            # rgb_activate is 'none' in this path (ref: voxnerf.py:289-291)
            color_s = ACTIVATIONS[self.rgb_activate](color_s)
            color, _, _ = compositing.composite(weights_cat, color_s, z_vals)
            depth_map = jnp.sum(weights * z_vals, -1)
            acc_map = jnp.sum(weights, -1)
            if perm is not None:
                # per-sample features to sorted order for AWP ([R, C, S]
                # lane shuffles); dead-code eliminated whenever the caller
                # drops the feature output
                feature_map = lane_shuffle.permute_lanes(
                    feature_map.transpose(0, 2, 1), perm,
                    inv_perm).transpose(0, 2, 1)

        return color, depth_map, acc_map, weights, feature_map
