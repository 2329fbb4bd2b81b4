"""Renderer: field assembly + volumetric ray rendering.

TPU-native counterpart of the reference's ``NeRFAll`` orchestrator
(ref: networks/renderer.py:14-626). Differences by design:

* everything here is jit-safe with fixed shapes; chunking for memory is done
  by the *caller* splitting fixed-size ray batches (evaluation) — inside a
  training step the whole batch renders as one fused XLA program;
* randomness (stratified jitter, sigma noise, PDF draws) comes from explicit
  PRNG keys;
* the hierarchical resample re-evaluates the grids at the sorted merged
  depths directly instead of gather-reordering cached features
  (pointwise identical, ref: renderer.py:205-213, but avoids the gather).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import compositing, lane_shuffle, occupancy
from ..ops.sample_pdf import sample_pdf
from ..utils.rays import get_ndc_rays
from .embedding import positional_encoding
from .layers import ACTIVATIONS
from .nerf_mlp import NeRFMLP
from .voxnerf import VoxelNeRF


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render/model configuration (hashable; safe as a jit constant)."""

    mode: str = "c2f"
    N_samples: int = 64
    N_importance: int = 64
    perturb: float = 1.0
    use_viewdirs: bool = True
    multires: int = 10
    multires_views: int = 4
    raw_noise_std: float = 0.0
    white_bkgd: bool = False
    lindisp: bool = False
    ndc: bool = True
    near: float = 0.0
    far: float = 1.0
    H: int = 0
    W: int = 0
    focal: float = 0.0
    render_rmnearplane: int = 0
    rgb_activate: str = "sigmoid"
    sigma_activate: str = "relu"
    rgb_add_bias: bool = False
    # vanilla NeRF MLPs
    netdepth: int = 8
    netwidth: int = 256
    netdepth_fine: int = 8
    netwidth_fine: int = 256
    # c2f voxel fields
    aabb: Tuple[Tuple[float, float, float], Tuple[float, float, float]] = (
        (-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))
    coarse_num_layers: int = 2
    coarse_num_layers_color: int = 3
    coarse_hidden_dim: int = 64
    coarse_hidden_dim_color: int = 64
    coarse_app_dim: int = 32
    coarse_app_n_comp: Tuple[int, ...] = (64, 16, 16)
    coarse_n_voxels: int = 16777248
    coarse_app_actfn: str = "none"
    fine_num_layers: int = 2
    fine_num_layers_color: int = 3
    fine_hidden_dim: int = 256
    fine_hidden_dim_color: int = 256
    fine_app_dim: int = 32
    fine_geo_feat_dim: int = 128
    fine_app_n_comp: Tuple[int, ...] = (64, 16, 16)
    fine_n_voxels: int = 134217984
    fine_app_actfn: str = "none"
    # TPU-native: bf16 forward table gathers (the gather backward stays an
    # exact f32 scatter-add; with line_matmul the LINE backward inherits
    # bf16 unless EVDN_LINE_GRAD_PRECISION=highest — see ops/triplane.py);
    # off by default for exact f32 parity
    triplane_bf16: bool = False
    # TPU-native approximation (train-only, phase-gated by
    # --fine_cull_start_iter; this RenderConfig field defaults 0 = exact,
    # but config.py's --fine_cull_capacity flag defaults 0.25 since the
    # round-4 30k screen, so default TRAINING uses the approximation —
    # pass --fine_cull_capacity 0 for reference-exact sampling):
    # transmittance-culled fine sampling — the
    # fine pass evaluates only the samples still visible under the COARSE
    # pass's transmittance (T > fine_cull_eps), compacted per ray to a
    # fixed capacity*S_all lane budget. Occluded samples contribute
    # exactly alpha=0 in the reference too (up to eps), so the per-ray
    # color error is bounded by eps; the win is row COUNT — the step is
    # row-issue-bound at ~14-20 ns/row (PERF_NOTES.md), and this removes
    # the gathers, scatters and MLP FLOPs of every culled sample.
    fine_cull_capacity: float = 0.0
    fine_cull_eps: float = 1e-3
    # TPU-native approximation (train-only, phase-gated by
    # --coarse_cull_start_iter): occupancy-grid culled COARSE sampling —
    # evaluate the coarse field only at stratified samples inside occupied
    # voxels of a periodically refreshed G^3 occupancy grid
    # (ops/occupancy.py), plus an every-``occ_probe_stride``-th-lane probe
    # floor (whole-ray coverage so a stale grid self-corrects), compacted
    # per ray to capacity*N_samples lanes with the same Bresenham
    # decimation as the fine cull. 0 = reference-exact coarse sampling.
    coarse_cull_capacity: float = 0.0
    occ_grid_size: int = 64
    occ_eps: float = 1e-4
    occ_dilate: int = 1
    occ_probe_stride: int = 8
    # TPU-native: line-table rows via one-hot MXU matmul (backward becomes
    # a matmul instead of a scatter-add)
    triplane_line_matmul: bool = False
    # kernel / AWP wiring (ref: renderer.py:26-39)
    kernel_type: str = "none"
    kernel_feat_cnl: int = 15
    use_awp: bool = False

    @property
    def composite_feature_coarse(self) -> bool:
        return self.kernel_type == "PBE"

    @property
    def composite_feature_fine(self) -> bool:
        return False

    @property
    def extract_feature(self) -> str:
        return "before_linear" if self.use_awp else "after_linear"


def config_from_args(args, aabb, H, W, focal, near, far) -> RenderConfig:
    """Build a RenderConfig from parsed flags + dataset-derived values."""
    return RenderConfig(
        mode=args.mode,
        N_samples=args.N_samples,
        N_importance=args.N_importance,
        perturb=args.perturb,
        use_viewdirs=args.use_viewdirs,
        multires=args.multires,
        multires_views=args.multires_views,
        raw_noise_std=args.raw_noise_std,
        white_bkgd=args.white_bkgd,
        lindisp=args.lindisp,
        ndc=not args.no_ndc,
        near=float(near), far=float(far),
        H=int(H), W=int(W), focal=float(focal),
        render_rmnearplane=args.render_rmnearplane,
        triplane_bf16=getattr(args, "triplane_bf16", False),
        triplane_line_matmul=getattr(args, "triplane_line_matmul", False),
        fine_cull_capacity=getattr(args, "fine_cull_capacity", 0.0) or 0.0,
        fine_cull_eps=getattr(args, "fine_cull_eps", 1e-3),
        coarse_cull_capacity=getattr(args, "coarse_cull_capacity", 0.0)
        or 0.0,
        occ_grid_size=getattr(args, "occ_grid_size", 64),
        occ_eps=getattr(args, "occ_eps", 1e-4),
        occ_dilate=getattr(args, "occ_dilate", 1),
        occ_probe_stride=getattr(args, "occ_probe_stride", 8),
        rgb_activate=args.rgb_activate,
        sigma_activate=args.sigma_activate,
        rgb_add_bias=args.rgb_add_bias,
        netdepth=args.netdepth, netwidth=args.netwidth,
        netdepth_fine=args.netdepth_fine, netwidth_fine=args.netwidth_fine,
        aabb=(tuple(float(v) for v in aabb[0]),
              tuple(float(v) for v in aabb[1])),
        coarse_num_layers=args.coarse_num_layers,
        coarse_num_layers_color=args.coarse_num_layers_color,
        coarse_hidden_dim=args.coarse_hidden_dim,
        coarse_hidden_dim_color=args.coarse_hidden_dim_color,
        coarse_app_dim=args.coarse_app_dim,
        coarse_app_n_comp=tuple(args.coarse_app_n_comp or (64, 16, 16)),
        coarse_n_voxels=args.coarse_n_voxels,
        coarse_app_actfn=args.coarse_app_actfn,
        fine_num_layers=args.fine_num_layers,
        fine_num_layers_color=args.fine_num_layers_color,
        fine_hidden_dim=args.fine_hidden_dim,
        fine_hidden_dim_color=args.fine_hidden_dim_color,
        fine_app_dim=args.fine_app_dim,
        fine_geo_feat_dim=args.fine_geo_feat_dim,
        fine_app_n_comp=tuple(args.fine_app_n_comp or (64, 16, 16)),
        fine_n_voxels=args.fine_n_voxels,
        fine_app_actfn=args.fine_app_actfn,
        kernel_type=args.kernel_type,
        kernel_feat_cnl=args.kernel_feat_cnl,
        use_awp=args.kernel_use_awp,
    )


def _capacity_select_sorted(keep_s: jnp.ndarray, S_keep: int) -> jnp.ndarray:
    """Fixed-capacity selection from a keep mask in ascending-depth lane
    order; shared by the transmittance fine cull and the occupancy coarse
    cull.

    keep_s [R, S] bool (sorted-depth domain). The single deepest lane is
    ALWAYS a survivor so the compositor's pinned last-alpha sample stays
    the ray's true far sample. Under overflow the survivors are DECIMATED
    evenly by depth rank (Bresenham: survivor of rank r is selected iff
    floor(r*K/n) > floor((r-1)*K/n)) — preserving depth coverage of the
    kept interval at a coarser step; tail-truncation instead cost -5 dB at
    capacity 0.25 (PERF_NOTES round 4). Spare capacity backfills first
    with unselected survivors, then with the shallowest culled lanes
    (real evaluations — strictly more accurate than padding). Returns
    int32 positions [R, S_keep] into the sorted domain, ordered by
    (priority, depth), NOT by depth — callers re-sort as needed. All ops
    lane-dimension (one lane sort, no row gathers).
    """
    S_all = keep_s.shape[-1]
    keep_s = keep_s.at[..., -1].set(True)
    rank = jnp.cumsum(keep_s.astype(jnp.int32), -1)            # [R, S_all]
    n_surv = rank[..., -1:]
    sel_s = keep_s & ((rank * S_keep) // jnp.maximum(n_surv, 1)
                      > ((rank - 1) * S_keep) // jnp.maximum(n_surv, 1))
    # priority 0: decimation-selected survivors; 1: unselected survivors
    # (backfill); 2: culled — each ascending in z (the sorted-domain
    # position breaks ties)
    prio = jnp.where(sel_s, 0, jnp.where(keep_s, 1, 2))
    pos = jnp.broadcast_to(jnp.arange(S_all, dtype=jnp.int32), prio.shape)
    _, perm2, _ = lane_shuffle.sort_with_perm(
        (prio * S_all + pos).astype(jnp.float32))
    return perm2[..., :S_keep]


class Renderer(nn.Module):
    """Coarse(+fine) radiance fields and the per-ray rendering pipeline."""

    cfg: RenderConfig

    def setup(self):
        cfg = self.cfg
        if cfg.mode == "c2f":
            self.mlp_coarse = VoxelNeRF(
                aabb=cfg.aabb, n_voxels=cfg.coarse_n_voxels,
                app_n_comp=cfg.coarse_app_n_comp, app_dim=cfg.coarse_app_dim,
                num_layers=cfg.coarse_num_layers,
                hidden_dim=cfg.coarse_hidden_dim,
                geo_feat_dim=cfg.kernel_feat_cnl,
                num_layers_color=cfg.coarse_num_layers_color,
                hidden_dim_color=cfg.coarse_hidden_dim_color,
                add_bias_color=cfg.rgb_add_bias,
                multires=cfg.multires, multires_views=cfg.multires_views,
                composite_feature=cfg.composite_feature_coarse,
                rgb_activate="relu", sigma_activate="relu",
                app_actfn=cfg.coarse_app_actfn,
                table_bf16=cfg.triplane_bf16,
                line_matmul=cfg.triplane_line_matmul,
                render_rmnearplane=cfg.render_rmnearplane,
                name="mlp_coarse")
            if cfg.N_importance > 0:
                self.mlp_fine = VoxelNeRF(
                    aabb=cfg.aabb, n_voxels=cfg.fine_n_voxels,
                    app_n_comp=cfg.fine_app_n_comp, app_dim=cfg.fine_app_dim,
                    num_layers=cfg.fine_num_layers,
                    hidden_dim=cfg.fine_hidden_dim,
                    geo_feat_dim=cfg.fine_geo_feat_dim,
                    num_layers_color=cfg.fine_num_layers_color,
                    hidden_dim_color=cfg.fine_hidden_dim_color,
                    add_bias_color=cfg.rgb_add_bias,
                    multires=cfg.multires, multires_views=cfg.multires_views,
                    composite_feature=cfg.composite_feature_fine,
                    rgb_activate="none", sigma_activate="relu",
                    app_actfn=cfg.fine_app_actfn,
                    table_bf16=cfg.triplane_bf16,
                    line_matmul=cfg.triplane_line_matmul,
                    render_rmnearplane=cfg.render_rmnearplane,
                    name="mlp_fine")
            else:
                self.mlp_fine = None
        elif cfg.mode == "nerf":
            self.mlp_coarse = NeRFMLP(
                D=cfg.netdepth, W=cfg.netwidth,
                use_viewdirs=cfg.use_viewdirs, rgb_add_bias=cfg.rgb_add_bias,
                extract_feature=cfg.extract_feature, name="mlp_coarse")
            if cfg.N_importance > 0:
                self.mlp_fine = NeRFMLP(
                    D=cfg.netdepth_fine, W=cfg.netwidth_fine,
                    use_viewdirs=cfg.use_viewdirs,
                    rgb_add_bias=cfg.rgb_add_bias,
                    extract_feature=cfg.extract_feature, name="mlp_fine")
            else:
                self.mlp_fine = None
        else:
            raise NotImplementedError(f"mode {cfg.mode}")

    # ------------------------------------------------------------------
    # vanilla NeRF field eval + composite (ref: networks/nerf.py:74-175)
    # ------------------------------------------------------------------
    def _run_nerf_field(self, mlp, pts, viewdirs, z_vals, rays_d, noise,
                        is_train, composite_feature):
        cfg = self.cfg
        R, S = pts.shape[0], pts.shape[1]
        pts_embedded = positional_encoding(pts.reshape(R * S, 3), cfg.multires)
        views_embedded = None
        if cfg.use_viewdirs:
            dirs = jnp.broadcast_to(viewdirs[:, None, :], (R, S, 3))
            views_embedded = positional_encoding(dirs.reshape(R * S, 3),
                                                 cfg.multires_views)
        raw, feature = mlp(pts_embedded, views_embedded)
        raw = raw.reshape(R, S, -1)
        feature = feature.reshape(R, S, -1) if feature is not None else None

        rgb = ACTIVATIONS[cfg.rgb_activate](raw[..., :3])
        sigma = raw[..., 3]
        rm_mask = None
        if not is_train and cfg.render_rmnearplane > 0:
            rm_mask = compositing.rmnearplane_mask(z_vals, cfg.render_rmnearplane)
        weights = compositing.compute_weights(
            sigma, z_vals, rays_d, ACTIVATIONS[cfg.sigma_activate],
            noise=noise, rmnearplane_mask=rm_mask)
        rgb_map, depth_map, acc_map = compositing.composite(
            weights, rgb, z_vals, white_bkgd=cfg.white_bkgd)
        if composite_feature and feature is not None:
            feature_map = jnp.sum(weights[..., None] * feature, -2)
        else:
            feature_map = feature
        return rgb_map, depth_map, acc_map, weights, feature_map

    # ------------------------------------------------------------------
    # z sampling (ref: renderer.py:163-178)
    # ------------------------------------------------------------------
    def _sample_z(self, key, R, near, far, perturb):
        cfg = self.cfg
        t_vals = jnp.linspace(0.0, 1.0, cfg.N_samples)
        if not cfg.lindisp:
            z_vals = near * (1.0 - t_vals) + far * t_vals
        else:
            z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
        z_vals = jnp.broadcast_to(z_vals, (R, cfg.N_samples))
        if perturb > 0.0:
            mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
            upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
            lower = jnp.concatenate([z_vals[..., :1], mids], -1)
            t_rand = jax.random.uniform(key, z_vals.shape)
            z_vals = lower + (upper - lower) * t_rand
        return z_vals

    def _noise(self, key, shape, is_train):
        if self.cfg.raw_noise_std > 0.0 and is_train:
            return jax.random.normal(key, shape) * self.cfg.raw_noise_std
        return None

    def _unpack_rays(self, rays):
        """[R, 3, 2] packed rays -> (rays_o, rays_d, viewdirs) with viewdir
        normalization + NDC projection (ref: renderer.py:399-466); shared
        by render() and the PBE stage-0 coarse_render()."""
        cfg = self.cfg
        rays_o, rays_d = rays[..., 0], rays[..., 1]
        viewdirs = None
        if cfg.use_viewdirs:
            viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1,
                                                keepdims=True)
        if cfg.ndc:
            rays_o, rays_d = get_ndc_rays(cfg.H, cfg.W, cfg.focal, 1.0,
                                          rays_o, rays_d)
        return rays_o, rays_d, viewdirs

    def _resolve_perturb(self, perturb, is_train):
        return (self.cfg.perturb if is_train else 0.0) \
            if perturb is None else perturb

    def _coarse_setup(self, k_strat, k_noise, rays_o, rays_d, is_train,
                      perturb):
        """Stratified coarse z-samples, world points, and sigma noise —
        the common preamble of render_rays() and coarse_render().

        ``perturb`` must already be resolved to a float (the fine pass's
        ``det=(perturb == 0.0)`` needs the same resolved value — a None
        slipping through makes it silently non-deterministic)."""
        cfg = self.cfg
        R = rays_o.shape[0]
        assert perturb is not None
        near = jnp.full((R, 1), cfg.near)
        far = jnp.full((R, 1), cfg.far)
        z_vals = self._sample_z(k_strat, R, near, far, perturb)
        pts = (rays_o[..., None, :]
               + rays_d[..., None, :] * z_vals[..., :, None])
        noise = self._noise(k_noise, (R, cfg.N_samples - 1), is_train)
        return z_vals, pts, noise

    # ------------------------------------------------------------------
    # core per-batch rendering (ref: renderer.py:129-264)
    # ------------------------------------------------------------------
    def _cull_select(self, z_cat, z_coarse, weights_coarse):
        """Per-ray fixed-capacity selection of the fine-pass samples still
        visible under the coarse transmittance (see RenderConfig.
        fine_cull_capacity).

        z_cat [R, S_all] (unsorted stratified++importance), z_coarse
        [R, Sc] (sorted), weights_coarse [R, Sc]. Returns int32 lane
        indices [R, S_keep] into z_cat — the kept set, NOT depth-ordered
        (the caller re-sorts the selected depths as usual).

        Selection: coarse transmittance BEFORE each sample, T(z) = 1 -
        cumsum(w)[#coarse samples strictly before z] (w_i = T_i*alpha_i so
        the partial sums telescope to 1 - T). Keep T > eps; the single
        deepest sample of the ray is ALWAYS a survivor so the compositor's
        pinned last-alpha sample (ops/compositing.py) stays the ray's true
        far sample on unsaturated rays. Under OVERFLOW (more survivors
        than capacity — the normal case early in training, when coarse
        density is still diffuse and T decays slowly) the survivors are
        DECIMATED evenly by depth rank (Bresenham: survivor of rank r is
        selected iff floor(r*K/n) > floor((r-1)*K/n)), which preserves
        depth coverage of the whole visible interval at a coarser step —
        the compositing deltas between consecutive kept samples absorb the
        dropped ones. Tail-truncating instead (the round-4 first cut) made
        the pinned far sample absorb ALL the transmittance past the
        capacity cutoff and cost -5 dB at capacity 0.25 on the 2k-iter
        A/B (PERF_NOTES.md round 4). Spare capacity backfills first with
        unselected survivors, then with the shallowest culled samples
        (real evaluations — strictly more accurate than padding). All
        lane-dimension ops (two lane sorts, no row gathers).
        """
        cfg = self.cfg
        S_all = z_cat.shape[-1]
        # the keep budget is a fraction of the REFERENCE fine workload
        # (N_samples + N_importance), independent of how many coarse
        # candidates survive an upstream coarse cull — so the two cull
        # knobs compose without shrinking each other's budget
        S_keep = min(S_all, max(8, int(round(
            cfg.fine_cull_capacity * (cfg.N_samples + cfg.N_importance)))))
        # work in the depth-sorted lane domain END-TO-END: T(z) depends
        # on the z VALUE alone, so the keep mask is computed directly on
        # the sorted depths. T before each sample = 1 - sum_j w_j
        # [z > z_coarse_j] (w_i = T_i*alpha_i telescopes to 1 - T) as
        # ONE fused masked reduce — the earlier cumsum + two per-lane
        # take_along_axis formulation paid the scalar row-issue floor
        # twice (~13% of the whole culled train step, profiled in
        # PERF_NOTES round 4).
        z_sorted, perm_z, _ = lane_shuffle.sort_with_perm(z_cat)
        occl = jnp.where(z_sorted[..., :, None] > z_coarse[..., None, :],
                         weights_coarse[..., None, :], 0.0)
        T = 1.0 - jnp.sum(occl, -1)                            # [R, S_all]
        keep_s = T > cfg.fine_cull_eps
        sel_pos = _capacity_select_sorted(keep_s, S_keep)
        return jax.lax.stop_gradient(
            jnp.take_along_axis(perm_z, sel_pos, -1))

    def _coarse_cull_select(self, occ_grid, pts):
        """Occupancy keep-mask + fixed-capacity selection for the coarse
        pass: positions [R, Kc] (ascending depth) into the stratified lane
        set. keep = occupied-voxel samples | an every-probe_stride-th lane
        floor (whole-ray coverage: density drifting up inside culled
        voxels is re-observed and the grid self-corrects at the next
        refresh) | the deepest lane (pinned far sample); decimated /
        backfilled to capacity exactly like the fine cull."""
        cfg = self.cfg
        Kc = min(cfg.N_samples, max(8, int(round(
            cfg.coarse_cull_capacity * cfg.N_samples))))
        occ = occupancy.lookup_bits(
            occ_grid, self.mlp_coarse.normalize_coords(pts))
        probe = (jnp.arange(cfg.N_samples, dtype=jnp.int32)
                 % max(1, cfg.occ_probe_stride)) == 0
        keep = (occ > 0.5) | probe[None, :]
        sel_pos = _capacity_select_sorted(keep, Kc)
        return jax.lax.stop_gradient(jnp.sort(sel_pos, axis=-1))

    def render_rays(self, key, rays_o, rays_d, viewdirs, is_train=True,
                    perturb: Optional[float] = None, fine_cull: bool = False,
                    coarse_cull: bool = False, occ_grid=None):
        """Render a fixed-size ray batch.

        rays_o/rays_d: [R, 3] (already NDC if applicable); viewdirs [R, 3]
        or None. ``fine_cull`` (static): enable the transmittance-culled
        fine pass (c2f mode, train phases past --fine_cull_start_iter).
        ``coarse_cull`` (static) + ``occ_grid`` (traced [G*G, G] bits):
        enable the occupancy-culled coarse pass (train phases past
        --coarse_cull_start_iter). Returns a dict with
        rgb/depth/acc/weights (+ coarse rgb0... and per-sample fine
        features for AWP).
        """
        cfg = self.cfg
        R = rays_o.shape[0]
        perturb = self._resolve_perturb(perturb, is_train)
        k_strat, k_pdf, k_noise_c, k_noise_f = jax.random.split(key, 4)
        z_vals, pts, noise_c = self._coarse_setup(
            k_strat, k_noise_c, rays_o, rays_d, is_train, perturb)
        ret = {}
        fine_cull = (fine_cull and cfg.mode == "c2f"
                     and cfg.fine_cull_capacity > 0.0
                     and cfg.N_importance > 0)
        coarse_cull = (coarse_cull and occ_grid is not None
                       and cfg.mode == "c2f"
                       and cfg.coarse_cull_capacity > 0.0 and is_train)
        if coarse_cull:
            sel_pos = self._coarse_cull_select(occ_grid, pts)
            z_vals = jnp.take_along_axis(z_vals, sel_pos, -1)
            pts = (rays_o[..., None, :]
                   + rays_d[..., None, :] * z_vals[..., :, None])
            # fresh iid noise at the culled width (the full-width draw
            # above is discarded; same key, different shape)
            noise_c = self._noise(k_noise_c, (R, z_vals.shape[-1] - 1),
                                  is_train)

        if cfg.mode == "c2f":
            ft_coarse = self.mlp_coarse.sample(pts, is_train)
            rgb_map, depth_map, acc_map, weights, feature = self.mlp_coarse(
                pts, viewdirs, ft_coarse, z_vals, rays_d, noise_c, is_train)

            if fine_cull:
                ret.update(rgb0=rgb_map, depth0=depth_map, acc0=acc_map)
                z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
                z_samples = sample_pdf(k_pdf, z_mid, weights[..., 1:-1],
                                       cfg.N_importance, det=(perturb == 0.0))
                z_samples = jax.lax.stop_gradient(z_samples)
                z_cat = jnp.concatenate([z_vals, z_samples], -1)
                sel = self._cull_select(z_cat, z_vals, weights)
                z_sel = jnp.take_along_axis(z_cat, sel, -1)
                S_keep = z_sel.shape[-1]
                z_all, perm, inv_perm = lane_shuffle.sort_with_perm(z_sel)
                pts_sel = (rays_o[..., None, :]
                           + rays_d[..., None, :] * z_sel[..., :, None])
                # coarse features re-sampled at the selected depths: for the
                # kept stratified lanes the gathers hit the exact texels of
                # ft_coarse above (XLA CSE cannot merge them — different
                # index sets — but S_keep coarse rows < the baseline's
                # N_importance rows whenever capacity*S_all < N_importance
                # + kept-stratified, and the uniform path keeps the code
                # one-shape)
                ft = jnp.concatenate(
                    [self.mlp_coarse.sample(pts_sel, is_train),
                     self.mlp_fine.sample(pts_sel, is_train)], -1)
                noise_f = self._noise(k_noise_f, (R, S_keep - 1), is_train)
                rgb_map, depth_map, acc_map, weights, feature = self.mlp_fine(
                    pts_sel, viewdirs, ft, z_all, rays_d, noise_f, is_train,
                    perm=perm, inv_perm=inv_perm)
                z_vals = z_all
                ret["z_std"] = jnp.std(z_samples, axis=-1)
            elif cfg.N_importance > 0:
                ret.update(rgb0=rgb_map, depth0=depth_map, acc0=acc_map)

                z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
                z_samples = sample_pdf(k_pdf, z_mid, weights[..., 1:-1],
                                       cfg.N_importance, det=(perturb == 0.0))
                z_samples = jax.lax.stop_gradient(z_samples)

                # TPU-native fine pass: evaluate fields in UNSORTED
                # (stratified ++ importance) order and sort only the
                # compositing scalars on the lane dimension. This (a) reuses
                # the coarse-grid features already gathered for the
                # stratified depths — the dominant cost is table-row
                # gathers/scatters at a fixed ~10-26 ns/row (PERF_NOTES.md),
                # and re-gathering them at sorted order wastes
                # N_samples x 6 rows per ray in fwd AND bwd — and (b) turns
                # the feature reorder into lane-local shuffles instead of
                # row gathers. Pointwise equal to the reference's
                # sort-then-evaluate (renderer.py:205-213): same z values,
                # same pts floats, same MLP, same sorted-weight recurrence;
                # only reduction order differs (f32 noise).
                z_cat = jnp.concatenate([z_vals, z_samples], -1)
                S_all = z_cat.shape[-1]   # == N_samples + N_importance
                # unless the coarse pass was occupancy-culled upstream
                z_all, perm, inv_perm = lane_shuffle.sort_with_perm(z_cat)
                pts_new = (rays_o[..., None, :]
                           + rays_d[..., None, :] * z_samples[..., :, None])
                pts_cat = (rays_o[..., None, :]
                           + rays_d[..., None, :] * z_cat[..., :, None])
                ft = jnp.concatenate(
                    [jnp.concatenate([ft_coarse,
                                      self.mlp_coarse.sample(pts_new,
                                                             is_train)], 1),
                     self.mlp_fine.sample(pts_cat, is_train)], -1)
                noise_f = self._noise(k_noise_f, (R, S_all - 1), is_train)
                rgb_map, depth_map, acc_map, weights, feature = self.mlp_fine(
                    pts_cat, viewdirs, ft, z_all, rays_d, noise_f, is_train,
                    perm=perm, inv_perm=inv_perm)
                z_vals = z_all
                ret["z_std"] = jnp.std(z_samples, axis=-1)
        else:
            rgb_map, depth_map, acc_map, weights, feature = self._run_nerf_field(
                self.mlp_coarse, pts, viewdirs, z_vals, rays_d, noise_c,
                is_train, composite_feature=cfg.composite_feature_coarse)

            if cfg.N_importance > 0:
                ret.update(rgb0=rgb_map, depth0=depth_map, acc0=acc_map)
                z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
                z_samples = sample_pdf(k_pdf, z_mid, weights[..., 1:-1],
                                       cfg.N_importance, det=(perturb == 0.0))
                z_samples = jax.lax.stop_gradient(z_samples)
                z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], -1), -1)
                pts_all = (rays_o[..., None, :]
                           + rays_d[..., None, :] * z_all[..., :, None])
                S_all = cfg.N_samples + cfg.N_importance
                noise_f = self._noise(k_noise_f, (R, S_all - 1), is_train)
                rgb_map, depth_map, acc_map, weights, feature = \
                    self._run_nerf_field(
                        self.mlp_fine, pts_all, viewdirs, z_all, rays_d,
                        noise_f, is_train,
                        composite_feature=cfg.composite_feature_fine)
                z_vals = z_all
                ret["z_std"] = jnp.std(z_samples, axis=-1)

        ret.update(rgb_map=rgb_map, depth_map=depth_map, acc_map=acc_map,
                   weights=weights, z_vals=z_vals)
        if feature is not None:
            ret["depth_feature"] = feature
        return ret

    def render(self, key, rays, is_train=True, perturb=None,
               fine_cull=False, coarse_cull=False, occ_grid=None):
        """Pack + render rays given as [R, 3, 2] (o, d stacked on last dim),
        applying NDC projection and viewdir normalization
        (ref: renderer.py:399-466)."""
        cfg = self.cfg
        rays_o, rays_d, viewdirs = self._unpack_rays(rays)
        ret = self.render_rays(key, rays_o, rays_d, viewdirs,
                               is_train=is_train, perturb=perturb,
                               fine_cull=fine_cull,
                               coarse_cull=coarse_cull, occ_grid=occ_grid)
        if cfg.use_awp:
            ret["rays_d"] = rays_d
        return ret

    def coarse_render(self, key, rays, is_train=True, perturb=None,
                      coarse_cull=False, occ_grid=None):
        """Single coarse pass returning (rgb, per-sample features); used by
        the PBE kernel's stage-0 (ref: renderer.py:468-592)."""
        cfg = self.cfg
        rays_o, rays_d, viewdirs = self._unpack_rays(rays)
        perturb = self._resolve_perturb(perturb, is_train)
        k_strat, k_noise = jax.random.split(key)
        z_vals, pts, noise = self._coarse_setup(
            k_strat, k_noise, rays_o, rays_d, is_train, perturb)
        coarse_cull = (coarse_cull and occ_grid is not None
                       and cfg.mode == "c2f"
                       and cfg.coarse_cull_capacity > 0.0 and is_train)
        if coarse_cull:
            sel_pos = self._coarse_cull_select(occ_grid, pts)
            z_vals = jnp.take_along_axis(z_vals, sel_pos, -1)
            pts = (rays_o[..., None, :]
                   + rays_d[..., None, :] * z_vals[..., :, None])
            noise = self._noise(k_noise,
                                (rays.shape[0], z_vals.shape[-1] - 1),
                                is_train)
        if cfg.mode == "c2f":
            ft = self.mlp_coarse.sample(pts, is_train)
            rgb, _, _, _, feat = self.mlp_coarse(
                pts, viewdirs, ft, z_vals, rays_d, noise, is_train)
        else:
            rgb, _, _, _, feat = self._run_nerf_field(
                self.mlp_coarse, pts, viewdirs, z_vals, rays_d, noise,
                is_train, composite_feature=cfg.composite_feature_coarse)
        return rgb, feat

    def coarse_sigma_grid(self):
        """Raw coarse density at the occupancy-grid voxel centers
        [G, G, G] (c2f only) — the input to the periodic occupancy-grid
        refresh (ops/occupancy.py::grid_from_sigma)."""
        assert self.cfg.mode == "c2f", "occupancy grid requires c2f fields"
        centers = occupancy.voxel_centers(self.cfg.aabb,
                                          self.cfg.occ_grid_size)
        return self.mlp_coarse.density(centers)

    def tv_loss(self):
        """Grid TV regularizer x5 (ref: renderer.py:361-365)."""
        if self.cfg.mode != "c2f":
            return jnp.zeros(())
        total = self.mlp_coarse.tv_loss_app()
        if self.mlp_fine is not None:
            total = total + self.mlp_fine.tv_loss_app()
        return total * 5.0

    def __call__(self, key, rays, is_train=True):
        # default entry point for init/tracing
        return self.render(key, rays, is_train=is_train)
