"""Jitted training step: full loss assembly of the reference train loop.

Reimplements ref: run_nerf.py:423-613 as a single compiled XLA program per
(force_naive, events_active) phase. All *continuous* schedule gates — blur
loss on/off, pts0 blending, AWP coarse-to-fine mixing, align window, EGM
weight, CRF learn-start — enter as traced scalars in :class:`ScheduleWeights`
so stepping through schedule boundaries never recompiles; only the two
structural switches (kernel on, events on) are static.

Unified loss formula (provably equal to the reference's branch ladder):

    loss  = w_img * img_loss                       (ref :451-458)
    loss  = loss * cf + ff * awp_fine_loss         (ref :463-473)
    loss  = A * loss + B * pts0_loss               (ref :475-497)
    loss += TV * tv_w + align * w_align            (ref :499-504)
    loss += egm * w_egm                            (ref :507-591)

with (A, B) = (1, w_pts0) when the EDI prior drives, (w_kernel, 1-w_kernel)
during a non-step kernel warmup, (1, 0) otherwise; (cf, ff) = (1-flw, flw)
under AWP coarse-to-fine, (1, 1) plain AWP, (1, 0) without AWP.

Note: the reference's ``event_egm_use_awp`` branch is dead code — event
renders always run ``force_naive=True`` so ``rgb_awp`` never exists there
(ref: run_nerf.py:534-551, 572) — and is intentionally not reproduced.
"""

from __future__ import annotations

import functools
from typing import Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..utils.events import egm_loss


def img2mse(x, y):
    return jnp.mean((x - y) ** 2)


def mse2psnr(mse):
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


@flax.struct.dataclass
class ScheduleWeights:
    """Per-step continuous schedule values (all traced scalars)."""

    w_img: jnp.ndarray            # 1[i > blur_loss_after]
    loss_a: jnp.ndarray           # A in loss = A*loss + B*pts0
    w_pts0: jnp.ndarray           # B
    use_pts0_target: jnp.ndarray  # bool: pts0 loss targets the EDI prior
    cf: jnp.ndarray               # AWP blend of the base loss
    ff: jnp.ndarray               # AWP blend of the fine loss
    w_align: jnp.ndarray          # align weight inside its window, else 0
    w_egm: jnp.ndarray            # annealed EGM weight
    skip_learn_crf: jnp.ndarray   # bool: CRF still in identity mode
    color_weight: jnp.ndarray     # [3] per-Bayer-channel EGM weights

    @staticmethod
    def identity():
        one = jnp.ones(())
        zero = jnp.zeros(())
        return ScheduleWeights(
            w_img=one, loss_a=one, w_pts0=zero,
            use_pts0_target=jnp.zeros((), bool), cf=one, ff=zero,
            w_align=zero, w_egm=zero, skip_learn_crf=jnp.zeros((), bool),
            color_weight=jnp.ones((3,)))


def compute_schedule_weights(args, i: int, *, kernel_end_warmup_iter: int,
                             w_kernel, w_pts0_target, w_events_egm,
                             fine_loss_weight: float,
                             events_active: bool) -> ScheduleWeights:
    """Host-side mirror of the reference's per-iteration gate ladder
    (ref: run_nerf.py:437-504, 591). Returns numpy-backed ScheduleWeights."""
    import numpy as np

    use_pts0 = (args.use_pts0_prior is not None
                and args.pts0_target_start_iter <= i < args.pts0_target_end_iter)
    blur_active = i > args.blur_loss_after

    if args.kernel_use_awp and i >= args.kernel_start_iter:
        if args.kernel_awp_use_coarse_to_fine_opt:
            cf, ff = 1.0 - fine_loss_weight, fine_loss_weight
        else:
            cf, ff = 1.0, 1.0
    else:
        cf, ff = 1.0, 0.0

    pts0_active = ((args.kernel_start_warmup_mode != "step"
                    and args.kernel_start_iter <= i < kernel_end_warmup_iter)
                   or use_pts0)
    if pts0_active:
        w_pts0_override = 1.0 if i <= args.blur_loss_after else None
        if use_pts0:
            A = 1.0
            B = (w_pts0_override if w_pts0_override is not None
                 else w_pts0_target(i))
        else:
            A = w_kernel(i)
            B = 1.0 - A
    else:
        A, B = 1.0, 0.0

    w_align = (args.kernel_align_weight
               if args.align_start_iter <= i <= args.align_end_iter else 0.0)
    w_egm = float(w_events_egm(i) or 0.0) if events_active else 0.0

    cw = np.ones(3, np.float32)
    if (args.event_egm_use_color_weights is not None
            and i > args.event_egm_color_weights_start_iter):
        cw = np.asarray(args.event_egm_use_color_weights, np.float32)

    return ScheduleWeights(
        w_img=np.float32(1.0 if blur_active else 0.0),
        loss_a=np.float32(A), w_pts0=np.float32(B),
        use_pts0_target=np.bool_(use_pts0),
        cf=np.float32(cf), ff=np.float32(ff),
        w_align=np.float32(w_align), w_egm=np.float32(w_egm),
        skip_learn_crf=np.bool_(i < args.tone_mapping_start_learn_iter),
        color_weight=cw)


def build_train_step(model, crf_module, tx, args, return_grads=False):
    """Returns ``step(state, batch, ev_batch, key, sw, force_naive,
    events_active) -> (state, metrics)`` with jitted per-phase variants.

    ``return_grads``: test hook — include the raw gradient tree in the
    metrics dict (used by the DP-equivalence test)."""

    tv_weight = float(args.kernel_tv_loss_weight)
    thresh_neg = float(args.events_threshold_neg
                       if args.events_threshold_neg is not None
                       else args.events_threshold)
    thresh_pos = float(args.events_threshold_pos
                       if args.events_threshold_pos is not None
                       else args.events_threshold)
    egm_stages = tuple(args.add_event_egm_stages or ())
    if (getattr(args, "add_event_egm", False) and "stage1" not in egm_stages
            and args.N_importance <= 0):
        # 'stage0' supervises the coarse render of the dual-stage pass,
        # which doesn't exist with N_importance=0 — the reference is
        # equally silent here (run_nerf.py:560-564); we at least say it
        print("WARNING: --add_event_egm with stages", list(egm_stages),
              "and N_importance=0 — no stage matches, the event loss "
              "will be identically zero (add 'stage1' or N_importance>0)")
    add_bii = args.tone_mapping_events_add_bii
    color_events = bool(args.event_egm_use_colorevents)
    clip_norm = args.clip_grads_norm

    def apply_crf(params, x, sw, mode="encode_rgb", **kw):
        if x is None:
            return None
        return crf_module.apply({"params": params["crf"]}, x, mode=mode,
                                skip_learn_crf=sw.skip_learn_crf, **kw)

    # fallback matches the CLI default (config.py: remat=False — measured
    # strictly worse than --grad_accum 2 on v5e, PERF_NOTES.md)
    remat = bool(getattr(args, "remat", False))

    def nerf_apply(params, batch_stats, key, rays, rays_info, force_naive,
                   fine_cull=False, coarse_cull=False, occ_grid=None):
        def fwd(params, batch_stats, key, rays, rays_info):
            variables = {"params": params["nerf"]}
            kw = dict(force_naive=force_naive, return_pts0_rgb=True,
                      fine_cull=fine_cull, coarse_cull=coarse_cull,
                      occ_grid=occ_grid)
            if batch_stats:
                variables["batch_stats"] = batch_stats
                out, new_state = model.apply(
                    variables, key, rays, rays_info,
                    mutable=["batch_stats"], **kw)
                return out, new_state.get("batch_stats", batch_stats)
            out = model.apply(variables, key, rays, rays_info, **kw)
            return out, batch_stats

        if remat:
            # rematerialize EVERYTHING in the backward pass (fits the full
            # paper-scale step in one chip's HBM) — including the tri-plane
            # gathers, which is why this is measured strictly worse than
            # --grad_accum 2 (gathers are the dominant cost, ~20 ns/row
            # floor, and replay in the backward). The finer alternative,
            # save_only_these_names("triplane_feats") (the checkpoint_name
            # in voxnerf.sample exists for it), was measured to exceed v5e
            # HBM by 1.2G at paper scale (PERF_NOTES.md).
            fwd = jax.checkpoint(
                fwd, policy=jax.checkpoint_policies.nothing_saveable)
        return fwd(params, batch_stats, key, rays, rays_info)

    def ev_extra_feat(ev_batch):
        """CRF conditioning features from the BII cumsums
        (ref: run_nerf.py:521-532)."""
        neg = ev_batch["events_neg_pol_cumsum"]
        pos = ev_batch["events_pos_pol_cumsum"]
        if add_bii == "pos-neg":
            return jnp.stack([neg, pos], axis=-1)
        if add_bii == "color-pos-neg":
            cmask = ev_batch["events_color_map"]
            cneg = jnp.where(cmask, neg[:, None], 0.0)
            cpos = jnp.where(cmask, pos[:, None], 0.0)
            return jnp.stack([cneg, cpos], axis=-1)      # [N, 3, 2]
        return None

    def loss_fn(params, batch_stats, key, batch, ev_batch, sw,
                force_naive: bool, events_active: bool,
                fine_cull: bool = False, coarse_cull: bool = False,
                occ_grid=None):
        # three-way split kept although only two keys are consumed (the two
        # event renders were merged into one 2x-batched render): dropping
        # the third key would shift the whole RNG stream and invalidate
        # recorded training trajectories for no benefit
        k_img, k_ev_start, _ = jax.random.split(key, 3)
        aux: Dict[str, jnp.ndarray] = {}

        rays_info = ({k: batch[k] for k in
                      ("images_idx", "rays_x", "rays_y", "poses")}
                     if not force_naive else None)
        (rgb, rgb1, extra_loss, extra_tensor), batch_stats = nerf_apply(
            params, batch_stats, k_img, batch["rays"], rays_info,
            force_naive, fine_cull=fine_cull, coarse_cull=coarse_cull,
            occ_grid=occ_grid)

        target = batch["rgbsf"]
        rgb_e = apply_crf(params, rgb, sw)
        rgb1_e = apply_crf(params, rgb1, sw)

        img_loss = img2mse(rgb_e, target)
        if rgb1_e is not None:
            img_loss = img_loss + img2mse(rgb1_e, target)
        aux["img_loss"] = img_loss
        aux["psnr"] = mse2psnr(img2mse(rgb_e, target))
        loss = sw.w_img * img_loss

        if "rgb_awp" in extra_tensor:
            fine_loss = img2mse(
                apply_crf(params, extra_tensor["rgb_awp"], sw), target)
            aux["awp_fine_loss"] = fine_loss
            loss = loss * sw.cf + fine_loss * sw.ff

        # pts0 / EDI-prior loss over the sharp mid-exposure rays
        pts0_target = target
        if "rgbsf_pts0" in batch:
            pts0_target = jnp.where(sw.use_pts0_target,
                                    batch["rgbsf_pts0"], target)
        pts0_loss = jnp.zeros(())
        for name in ("stage0_rgb_pts0", "stage1_rgb_pts0",
                     "stage1_rgb1_pts0"):
            if name in extra_tensor:
                pts0_loss = pts0_loss + img2mse(
                    apply_crf(params, extra_tensor[name], sw), pts0_target)
        aux["pts0_loss"] = pts0_loss
        # reference-literal quirk, replicated on purpose: the warmup-phase
        # "psnr" is mse2psnr of a SUM of up to three MSE terms (up to
        # 10*log10(3) dB below a true PSNR) — exactly what the reference
        # prints during i <= blur_loss_after (ref: run_nerf.py:488-489)
        aux["pts0_psnr"] = mse2psnr(pts0_loss)
        loss = sw.loss_a * loss + sw.w_pts0 * pts0_loss

        if "TV" in extra_loss:
            aux["tv_loss"] = jnp.mean(extra_loss["TV"])
            loss = loss + aux["tv_loss"] * tv_weight
        if "align" in extra_loss:
            aux["align_loss"] = jnp.mean(extra_loss["align"])
            loss = loss + aux["align_loss"] * sw.w_align

        if events_active:
            neg = ev_batch["events_neg_pol_cumsum"]
            pos = ev_batch["events_pos_pol_cumsum"]
            bii = thresh_neg * neg + thresh_pos * pos   # (ref :518-519)
            feat = ev_extra_feat(ev_batch)
            cmask = (ev_batch["events_color_map"].astype(jnp.float32)
                     if color_events else None)
            crf_kw = dict(ev_extra_feat=feat)
            if color_events:
                crf_kw["tonemap_only"] = True

            # one batched render for both exposure endpoints (the reference
            # runs two chunked renders, run_nerf.py:534-551; a single
            # 2x-batch halves fixed per-render costs on TPU)
            ev_rays = jnp.concatenate([ev_batch["events_rays_start"],
                                       ev_batch["events_rays_end"]], axis=0)
            (rgb_se, rgb1_se, _, _), batch_stats = nerf_apply(
                params, batch_stats, k_ev_start, ev_rays, None, True,
                fine_cull=fine_cull, coarse_cull=coarse_cull,
                occ_grid=occ_grid)
            s_rgb, e_rgb = jnp.split(rgb_se, 2, axis=0)
            s_rgb1, e_rgb1 = ((None, None) if rgb1_se is None
                              else jnp.split(rgb1_se, 2, axis=0))

            def luma(x):
                return apply_crf(params, x, sw, mode="encode_luma", **crf_kw)

            egm = jnp.zeros(())
            if "stage0" in egm_stages and s_rgb1 is not None:
                egm = egm + egm_loss(luma(s_rgb1), luma(e_rgb1), bii,
                                     color_mask=cmask,
                                     color_weight=sw.color_weight)
            if "stage1" in egm_stages:
                egm = egm + egm_loss(luma(s_rgb), luma(e_rgb), bii,
                                     color_mask=cmask,
                                     color_weight=sw.color_weight)
            aux["event_egm"] = egm
            loss = loss + egm * sw.w_egm

        aux["loss"] = loss
        return loss, (aux, batch_stats)

    accum = max(1, int(getattr(args, "grad_accum", 1) or 1))

    @functools.lru_cache(maxsize=None)
    def jitted(force_naive: bool, events_active: bool,
               fine_cull: bool = False, coarse_cull: bool = False):
        def step(state, batch, ev_batch, key, sw, occ_grid):
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            if accum == 1:
                (_, (aux, new_bs)), grads = grad_fn(
                    state.params, state.batch_stats, key, batch, ev_batch,
                    sw, force_naive, events_active, fine_cull, coarse_cull,
                    occ_grid)
            else:
                # microbatched gradient accumulation: halves (1/accum) the
                # activation peak with ZERO recompute — strictly better than
                # remat when the sequential microbatches fit HBM, because
                # the dominant tri-plane gathers then run exactly once in
                # fwd and once (as scatters) in bwd
                def split(x):
                    return x.reshape(accum, x.shape[0] // accum,
                                     *x.shape[1:])

                mb = (jax.tree_util.tree_map(split, batch),
                      jax.tree_util.tree_map(split, ev_batch))
                keys = jax.random.split(key, accum)

                def body(carry, xs):
                    bs, grads_acc, loss_acc = carry
                    b, e, k = xs
                    (_, (aux_i, bs)), g = grad_fn(
                        state.params, bs, k, b, e, sw,
                        force_naive, events_active, fine_cull, coarse_cull,
                        occ_grid)
                    grads_acc = jax.tree_util.tree_map(
                        lambda a, x: a + x, grads_acc, g)
                    return (bs, grads_acc, loss_acc + aux_i["loss"]), aux_i

                zero_grads = jax.tree_util.tree_map(jnp.zeros_like,
                                                    state.params)
                (new_bs, grads, loss_sum), auxes = jax.lax.scan(
                    body, (state.batch_stats, zero_grads, jnp.zeros(())),
                    (mb[0], mb[1], keys))
                grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
                aux = jax.tree_util.tree_map(lambda x: x[-1], auxes)
                aux["loss"] = loss_sum / accum
            if not getattr(args, "no_log_grads_norm", False):
                # per-parameter L2 grad norms (ref: utils/grads.py:5-17,
                # logged by default, run_nerf.py:736-773). Computed every
                # step (the reference computes at i_tensorboard cadence):
                # the reductions re-read the ~200 MB gradient tree the Adam
                # update streams anyway — well under 1 ms of the step — and
                # only the scalars transfer, lazily, at logging cadence.
                # --no_log_grads_norm removes them entirely.
                for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
                    name = "/".join(str(getattr(p, "key", p)) for p in path)
                    aux[f"grads/{name}"] = jnp.sqrt(jnp.sum(leaf * leaf))
                aux["grads/total"] = optax.global_norm(grads)
            if return_grads:
                # test hook (DP-equivalence): raw pre-clip gradient tree
                aux["grads_tree"] = grads
            if clip_norm is not None:
                # clip only the nerf tree (ref: run_nerf.py:596-599)
                gnorm = optax.global_norm(grads["nerf"])
                scale = jnp.minimum(1.0, clip_norm / (gnorm + 1e-6))
                grads = {**grads,
                         "nerf": jax.tree_util.tree_map(
                             lambda g: g * scale, grads["nerf"])}
                aux["grad_norm"] = gnorm
            state = state.apply_gradients(tx, grads, new_bs)
            return state, aux

        return jax.jit(step, donate_argnums=(0,))

    def step(state, batch, ev_batch, key, sw, force_naive: bool,
             events_active: bool, fine_cull: bool = False,
             coarse_cull: bool = False, occ_grid=None):
        if not events_active:
            ev_batch = {}
        if not coarse_cull:
            occ_grid = None
        return jitted(bool(force_naive), bool(events_active),
                      bool(fine_cull), bool(coarse_cull))(
            state, batch, ev_batch, key, sw, occ_grid)

    # diagnostics hook: the raw (params, ...) -> (loss, (aux, bs)) closure,
    # so tools can value_and_grad the exact production loss out-of-band
    step.loss_fn = loss_fn
    return step
