"""Experiment driver: the full train / eval / render-only lifecycle.

Counterpart of ref: run_nerf.py:33-780. Orchestration is host-side python;
every per-step computation runs inside the jitted train step
(:mod:`evdeblurnerf_tpu.train.step`), fed by a background prefetch thread
that assembles joint (image-ray + event) batches and shards them over the
device mesh.
"""

from __future__ import annotations

import os
import shutil
from typing import Optional

import jax
import numpy as np

from ..config import resolve_event_thresholds, write_args_txt
from ..data import (ImageBatchSampler, LLFFDataset, LLFFEventsDataset,
                    Prefetcher, RandomEventSampler, RandomRaySampler, endless)
from ..models.renderer import config_from_args
from ..models.system import EvDeblurNeRF, kernel_config_from_args
from ..models.tonemapping import TonemappingTransform
from ..ops import lane_shuffle
from ..parallel import (batch_sharding, create_mesh, replicated_sharding)
from ..parallel import multihost as mh_ctx
from ..parallel import tp as tp_ctx
from ..utils.logger import Logger
from ..utils.metrics import compute_img_metric, lpips_trunk_kind
from ..utils.misc import (annealing_interpolator,
                          exponential_scale_fine_loss_weight, seed_everything,
                          to8b)
from .checkpoint import CheckpointManager
from .evaluate import (apply_crf_host, build_chunk_renderer, depth_colormap,
                       render_poses)
from .optim import build_optimizer
from .state import create_train_state
from .step import build_train_step, compute_schedule_weights


def build_datasets(args):
    """LLFF + optional event dataset + EDI prior (ref: run_nerf.py:52-116)."""
    llff = LLFFDataset(args, args.datadir, args.factor, recenter=True,
                       bd_factor=args.bd_factor, spherify=args.spherify,
                       path_epi=args.render_epi,
                       pose_transform_allknown=args.pose_transform_allknown)
    ev = None
    if args.use_events:
        ev = LLFFEventsDataset(
            args, args.datadir, llff.h, llff.w, llff.K, args.factor,
            recenter=True, bd_factor=args.bd_factor, bd_scale=llff.scale,
            closest_bds=llff.closest_bds, furthest_bds=llff.furthest_bds,
            spherify=args.spherify,
            recenter_partial=llff.recenter_partial,
            spherify_partial=llff.spherify_partial,
            events_tms_unit=args.events_tms_unit,
            events_tms_files_unit=args.events_tms_files_unit,
            color_events=args.event_egm_use_colorevents)
        if args.use_pts0_prior == "edi":
            llff.set_pts0_prior(ev.compute_edi_prior(
                llff.i_train, llff.images, args.pts0_edi_steps,
                args.events_threshold_pos, args.events_threshold_neg))
    return llff, ev


def build_model(args, llff):
    cfg = config_from_args(args, llff.bounding_box, llff.h, llff.w,
                           llff.K[0][0], llff.near, llff.far)
    kcfg = kernel_config_from_args(args)
    K_static = tuple(tuple(float(v) for v in row) for row in np.asarray(llff.K))
    model = EvDeblurNeRF(cfg=cfg, kcfg=kcfg, num_images=llff.n_imgs,
                         K=K_static)
    crf = TonemappingTransform(
        map_type_rgb=args.tone_mapping_type,
        map_type_event=args.tone_mapping_events_type,
        gamma=args.tone_mapping_gamma,
        extra_features_event=(0 if args.tone_mapping_events_add_bii == "none"
                              else 2))
    return cfg, kcfg, model, crf


def _round_to_devices(n: int, n_dev: int, name: str,
                      grad_accum: int = 1) -> int:
    """Round the batch so each grad-accum MICROBATCH divides the mesh.

    The jitted step reshapes the batch into [grad_accum, n/grad_accum]
    microbatches and shards each one over the n_dev data axis, so the
    quantum is n_dev * grad_accum (not their lcm: with n_dev=8,
    grad_accum=2, n=1032 the lcm accepts 1032 but the 516-ray microbatch
    doesn't divide 8 — the lane-kernel shard_map would silently disable
    and GSPMD would all-gather around every pallas_call)."""
    quantum = n_dev * max(grad_accum, 1)
    if n % quantum:
        new = max(quantum, (n // quantum) * quantum)
        print(f"[parallel] rounding {name} {n} -> {new} "
              f"(multiple of {n_dev} devices x grad_accum={grad_accum})")
        return new
    return n


def _image_sampler_factory(args, llff):
    # One persistent sampler instance: its np.random.Generator state then
    # advances across epochs (torch RandomSampler semantics) instead of
    # replaying an identical permutation every epoch.
    if args.ray_sampling_mode == "images":
        sampler = ImageBatchSampler(
            llff.n_imgs, args.ray_sampling_images_num, args.N_rand,
            (llff.w, llff.h), seed=args.seed)
    else:
        sampler = RandomRaySampler(llff.n_rays, args.N_rand, seed=args.seed)
    return lambda: iter(sampler)


def run_test_renders(args, llff, model, crf, variables, crf_params,
                     chunk_fn, mesh, step, logger, expdir,
                     skip_learn_crf: bool):
    """Held-out view eval (ref: run_nerf.py:642-709).

    Renders at the full ``--chunk`` (default 32768): the reference halves
    the chunk at test time (ref: run_nerf.py:658, a CUDA memory heuristic);
    chunking is value-invisible, and on v5e the full chunk is measured
    faster (coarse tables stay VMEM-promoted, fixed per-program cost
    amortized — see PERF_NOTES.md round 3).
    """
    rgbs, depths = render_poses(variables, chunk_fn, llff.test_poses,
                                llff.h, llff.w, llff.K,
                                chunk=args.chunk, mesh=mesh)
    if not mh_ctx.is_primary():
        # multi-host: only the SPMD render above needs every process; the
        # CRF, metric stack (incl. LPIPS), files, images and the metrics
        # log belong to process 0 (apply_crf_host is process-local)
        return {}
    rgbs = apply_crf_host(crf, crf_params, rgbs,
                          skip_learn_crf=skip_learn_crf)
    gt = np.asarray(llff.test_images)

    metrics = {}
    for name in ("mse", "psnr", "ssim", "lpips"):
        v = compute_img_metric(rgbs, gt, metric=name)
        if v is not None:
            metrics[f"test/{name}"] = v
    # fallback-trunk LPIPS values are self-consistent but NOT comparable to
    # published LPIPS(alex); mark every persisted copy (JSONL + txt), not
    # just a one-time stderr warning, so a user diffing metrics against the
    # paper is never silently misled
    lpips_trunk = lpips_trunk_kind() if "test/lpips" in metrics else None
    if lpips_trunk == "fallback":
        metrics["test/lpips_trunk_fallback"] = 1.0
    logger.scalars(metrics, step)

    testdir = os.path.join(expdir, f"testset_{step:06d}")
    os.makedirs(testdir, exist_ok=True)
    import imageio.v2 as imageio

    for i in range(rgbs.shape[0]):
        imageio.imwrite(os.path.join(testdir, f"{i:03d}.png"), to8b(rgbs[i]))
        logger.image(f"test/pred_{i}", rgbs[i], step)
    logger.image("test/gt_0", gt[0], step)
    logger.image("test/depth_0", depth_colormap(depths[0]) / 255.0, step)
    logger.image("test/err_0",
                 np.abs(rgbs[0] - gt[0]).clip(0, 1), step)

    with open(os.path.join(expdir, "test_metrics.txt"), "a") as f:
        parts = " ".join(f"{k.split('/')[1]}={v:.5f}"
                         for k, v in metrics.items()
                         if k != "test/lpips_trunk_fallback")
        if lpips_trunk is not None:
            parts += f" lpips_trunk={lpips_trunk}"
        f.write(f"iter {step}: {parts}\n")
    return metrics


def run_video_render(args, llff, crf, variables, crf_params, chunk_fn, mesh,
                     step, logger, skip_learn_crf: bool):
    """Spiral/EPI novel-view video (ref: run_nerf.py:711-734)."""
    rgbs, depths = render_poses(variables, chunk_fn, llff.render_poses,
                                llff.h, llff.w, llff.K,
                                chunk=args.chunk,
                                render_factor=args.render_factor, mesh=mesh)
    if not mh_ctx.is_primary():
        return rgbs, depths
    rgbs = apply_crf_host(crf, crf_params, rgbs,
                          skip_learn_crf=skip_learn_crf)
    logger.video("video/rgb", rgbs, step)
    disps = np.stack([depth_colormap(d) / 255.0 for d in depths])
    logger.video("video/disp", disps, step)
    return rgbs, depths


def build_initial_state(args, llff, model, crf, crf_identity_prefit=None):
    """Fresh TrainState + optimizer exactly as training constructs them.

    This is also the checkpoint-restore TEMPLATE: anything restoring a
    training checkpoint (resume, ``--ft_path``, serving export) must build
    the optimizer the same way — ``--colornet_weightdecay`` prepends
    ``optax.add_decayed_weights`` and changes the opt_state tree structure.
    Returns ``(state, tx)``.
    """
    init_batch = llff.batch(next(iter(
        RandomRaySampler(llff.n_rays, args.N_rand, seed=args.seed))))
    rays_info = {k: init_batch[k] for k in
                 ("images_idx", "rays_x", "rays_y", "poses")}
    key = jax.random.PRNGKey(args.seed)

    if crf_identity_prefit is None:
        crf_identity_prefit = args.tone_mapping_learn_init_identity
    tx_probe = build_optimizer(args.lrate, args.lrate_decay,
                               args.lrate_warmup_iters,
                               args.lrate_warmup_factor)
    state = create_train_state(
        model, crf, tx_probe, key, init_batch["rays"], rays_info,
        crf_identity_prefit=crf_identity_prefit)
    if args.colornet_weightdecay:
        tx = build_optimizer(args.lrate, args.lrate_decay,
                             args.lrate_warmup_iters,
                             args.lrate_warmup_factor,
                             colornet_weightdecay=args.colornet_weightdecay,
                             params=state.params)
        state = state.replace(opt_state=tx.init(state.params))
    else:
        tx = tx_probe
    return state, tx


def train(args, max_iters: Optional[int] = None):
    """Full training lifecycle; returns the final TrainState (for tests).

    The tp/lane-kernel meshes are process-global routing state; clear them
    on ANY exit so later traces in the same process (library users, tests)
    don't shard over a mesh sized for a finished run."""
    try:
        return _train_impl(args, max_iters)
    finally:
        tp_ctx.set_tp_mesh(None)
        lane_shuffle.set_mesh(None)


def _train_impl(args, max_iters: Optional[int] = None):
    resolve_event_thresholds(args)

    from ..utils import compile_cache

    compile_cache.enable(getattr(args, "compilation_cache_dir", "auto"))

    if getattr(args, "matmul_precision", "default") != "default":
        # parity runs: exact f32 MXU passes (SURVEY §7 "beware default TPU
        # bf16 matmuls — set highest matmul precision for parity runs")
        jax.config.update("jax_default_matmul_precision",
                          args.matmul_precision)

    # Unsupported combination — fail BEFORE the (minutes-long on real data)
    # dataset build: component-sharded tables spanning hosts are not
    # addressable from the primary process at checkpoint time. Documented
    # in docs/PARITY.md "known intentional deviations".
    if (max(1, int(getattr(args, "tp_model_parallel", 1) or 1)) > 1
            and mh_ctx.is_multiprocess()):
        raise NotImplementedError(
            "--tp_model_parallel with multi-host training is not supported: "
            "checkpointing assumes the state is addressable from the "
            "primary process, which component-sharded tables spanning "
            "hosts are not. Train data-parallel across hosts (the voxel "
            "tables replicate), or tensor-parallel on a single host.")

    seed_everything(args.seed)
    llff, ev = build_datasets(args)
    cfg, kcfg, model, crf = build_model(args, llff)

    # Under multi-host training (parallel/multihost.py; enabled by calling
    # multihost.initialize() before train, e.g. via --multihost) every
    # process executes the same SPMD program; host side effects (files,
    # logging, prints) belong to process 0 only.
    primary = mh_ctx.is_primary()
    multiproc = mh_ctx.is_multiprocess()

    expdir = os.path.join(args.basedir, args.expname)
    os.makedirs(expdir, exist_ok=True)
    if primary:
        write_args_txt(args, os.path.join(expdir, "args.txt"))
        if args.config and os.path.exists(args.config):
            shutil.copyfile(args.config, os.path.join(expdir, "config.txt"))

    # mesh + batch sizes; the lane kernels shard over the same mesh
    # (shard_map, no GSPMD replication around pallas_call). With
    # --tp_model_parallel k > 1 the mesh is 2-D (data x model) and the
    # voxel tables (+ their Adam moments) shard over the model axis
    # (parallel/tp.py) — capacity for grids beyond one chip's HBM.
    tp_k = max(1, int(getattr(args, "tp_model_parallel", 1) or 1))
    assert not (tp_k > 1 and multiproc)   # rejected before build_datasets
    if tp_k > 1:
        n_total = len(jax.devices())
        if n_total % tp_k != 0:
            raise ValueError(
                f"--tp_model_parallel={tp_k} must divide the device count "
                f"({n_total})")
        mesh = tp_ctx.create_mesh_2d(n_total // tp_k, tp_k)
        tp_ctx.set_tp_mesh(mesh)
        for nc in (args.coarse_app_n_comp or (64, 16, 16),
                   args.fine_app_n_comp or (64, 16, 16)):
            if any(int(c) % tp_k for c in nc):
                print(f"WARNING: app_n_comp {tuple(nc)} not divisible by "
                      f"tp_model_parallel={tp_k}; that field falls back to "
                      "replicated (GSPMD) sampling")
    else:
        mesh = create_mesh()
        tp_ctx.set_tp_mesh(None)   # clear any mesh from a prior train()
    lane_shuffle.set_mesh(mesh if mesh.size > 1 else None)
    n_dev = int(mesh.shape[tp_ctx.DATA_AXIS])
    ga = args.grad_accum or 1
    args.N_rand = _round_to_devices(args.N_rand, n_dev, "N_rand",
                                    grad_accum=ga)
    args.events_N_rand = _round_to_devices(args.events_N_rand, n_dev,
                                           "events_N_rand", grad_accum=ga)

    # model/optimizer init from one representative batch
    sampler = endless(_image_sampler_factory(args, llff))
    state, tx = build_initial_state(args, llff, model, crf)

    # checkpoint auto-resume (ref: run_nerf.py:276-297)
    ckpt_dir = (args.ft_path if args.ft_path
                else os.path.join(expdir, "checkpoints"))
    ckpt = CheckpointManager(ckpt_dir)
    start = 0
    if not args.no_reload:
        restored = ckpt.restore_latest(state)
        if restored is not None:
            start, state = int(restored[0]), restored[1]
            print(f"Resumed from step {start}")
            if ev is not None:
                ev.global_step = start

    # W&B run-id persistence for resume (ref: run_nerf.py:292, the id is
    # stored in the checkpoint; here a sidecar json next to the checkpoints)
    import json

    wandb_id_path = os.path.join(expdir, "wandb_id.json")
    wandb_id = None
    if start > 0 and os.path.exists(wandb_id_path):
        with open(wandb_id_path) as f:
            wandb_id = json.load(f).get("wandb_id")
    logger = Logger(log_dir=args.tbdir or args.basedir, expname=args.expname,
                    use_wandb=not args.no_wandb and not args.render_only,
                    use_tensorboard=args.use_tensorboard, wandb_id=wandb_id,
                    args=args, enabled=primary)
    if logger.wandb_id is not None and primary:
        with open(wandb_id_path, "w") as f:
            json.dump({"wandb_id": logger.wandb_id}, f)

    # replicate state over the mesh; batches shard on the ray axis
    repl = replicated_sharding(mesh)
    data_shard = batch_sharding(mesh)
    if tp_k > 1:
        state = tp_ctx.shard_state_tp(state, mesh)
    elif multiproc:
        # device_put can't target devices of other processes; build
        # global replicated arrays instead (state is host-identical on
        # every process: same seed, same restored checkpoint)
        state = mh_ctx.replicate_global(state, mesh)
    else:
        state = jax.device_put(state, repl)

    chunk_fn = build_chunk_renderer(
        model, mesh=mesh,
        fine_cull=bool(args.fine_cull_eval and args.fine_cull_capacity > 0))

    def eval_variables(st):
        v = {"params": st.params["nerf"]}
        if st.batch_stats:
            v["batch_stats"] = st.batch_stats
        return v

    # ------------------------------------------------------------------
    # render-only (ref: run_nerf.py:337-414)
    # ------------------------------------------------------------------
    if args.render_only:
        poses = llff.test_poses if args.render_test else llff.render_poses
        name = "test" if args.render_test else "path"
        rgbs, depths = render_poses(eval_variables(state), chunk_fn, poses,
                                    llff.h, llff.w, llff.K,
                                    chunk=args.chunk,
                                    render_factor=args.render_factor,
                                    mesh=mesh, verbose=primary)
        if primary:
            rgbs = apply_crf_host(crf, state.params["crf"], rgbs,
                                  skip_learn_crf=False)
            outdir = os.path.join(expdir, f"renderonly_{name}_{start:06d}")
            ver = 0
            while os.path.exists(outdir + (f"_ver{ver}" if ver else "")):
                ver += 1
            outdir = outdir + (f"_ver{ver}" if ver else "")
            os.makedirs(outdir)
            import imageio.v2 as imageio

            for i in range(rgbs.shape[0]):
                imageio.imwrite(os.path.join(outdir, f"{i:03d}.png"),
                                to8b(rgbs[i]))
            np.save(os.path.join(outdir, "disp.npy"), depths)
            logger.video(f"renderonly/{name}", rgbs, start)
        logger.close()
        return state

    # ------------------------------------------------------------------
    # schedules (ref: run_nerf.py:121-142)
    # ------------------------------------------------------------------
    w_events_egm = annealing_interpolator(
        args.event_egm_weight, args.event_egm_weight_end,
        args.event_egm_weight_steps, args.event_egm_weight_scheduler) \
        if args.use_events else (lambda s: 0.0)
    w_pts0_target = annealing_interpolator(
        args.pts0_target_weight, args.pts0_target_weight_end,
        args.pts0_target_weight_steps, args.pts0_target_weight_scheduler) \
        if args.use_pts0_prior else (lambda s: 0.0)
    kernel_end_warmup_iter = -1
    w_kernel = lambda s: 1.0  # noqa: E731
    if args.kernel_start_warmup_mode != "step":
        kernel_end_warmup_iter = (args.kernel_start_iter
                                  + args.kernel_start_warmup_iters)
        w_kernel = annealing_interpolator(
            0.0, 1.0, kernel_end_warmup_iter, args.kernel_start_warmup_mode,
            start_step=args.kernel_start_iter)

    step_fn = build_train_step(model, crf, tx, args)

    # prefetch pipelines
    img_iter = sampler
    # multihost: rows land via the per-process put_fn; a sharding spanning
    # other processes' devices would be invalid to device_put directly, so
    # don't pass one
    put_fn = mh_ctx.batch_put_fn(mesh) if multiproc else None
    batch_shard = None if multiproc else data_shard
    img_prefetch = Prefetcher(lambda: llff.batch(next(img_iter)),
                              sharding=batch_shard, put_fn=put_fn)
    ev_prefetch = None
    if args.use_events and args.add_event_egm:
        ev_sampler = RandomEventSampler(len(ev), args.events_N_rand,
                                        seed=args.seed)
        ev_iter = endless(lambda: iter(ev_sampler))
        ev_prefetch = Prefetcher(lambda: ev.batch(next(ev_iter)),
                                 sharding=batch_shard, put_fn=put_fn)

    # occupancy-grid coarse cull: the grid is DERIVED state (a pure
    # function of the coarse params) — refreshed every occ_refresh_every
    # steps and on (re)start, never checkpointed. Replicated over the mesh
    # (G^3 bits, ~1 MB at G=64).
    occ_grid = None
    build_occ = None
    if (getattr(args, "coarse_cull_capacity", 0.0) or 0.0) > 0 \
            and args.mode == "c2f":
        from ..models.system import build_occ_grid

        build_occ = jax.jit(lambda variables: build_occ_grid(model,
                                                             variables))

    def refresh_occ_grid(state):
        grid = build_occ({"params": state.params["nerf"]})
        return jax.device_put(grid, replicated_sharding(mesh))

    # budget-sufficiency gate (host policy over two static programs): the
    # cull engages only while the expected kept-lane fraction fits the
    # capacity budget — on diffuse/dense grids the fixed budget would
    # decimate REAL samples (measured -0.8..-1.8 dB at 2k iters on the
    # dense sphere scene, PERF_NOTES round 5). Re-decided at every grid
    # refresh; both programs are compiled once, switching is free.
    from ..ops.occupancy import expected_keep_fraction
    occ_cull_engaged = False
    occ_frac = float("nan")

    N_iters = args.N_iters if max_iters is None else min(args.N_iters,
                                                         start + max_iters)
    # ref run_nerf.py:417: the flags set only the INITIAL value; the 10k
    # recomputes below hardcode 0.1/0.9 upstream (flag-dead end_ratio quirk)
    fine_loss_weight = args.kernel_awp_fine_loss_start_ratio
    base_key = jax.random.PRNGKey(args.seed + 1)

    try:
        for i in range(start, N_iters):
            is_last = i == N_iters - 1
            force_naive = i < args.kernel_start_iter
            fine_cull = (args.fine_cull_capacity > 0
                         and i >= args.fine_cull_start_iter)
            coarse_cull = (build_occ is not None
                           and i >= args.coarse_cull_start_iter)
            if coarse_cull and (occ_grid is None
                                or (i - args.coarse_cull_start_iter)
                                % args.occ_refresh_every == 0):
                occ_grid = refresh_occ_grid(state)
                occ_frac = float(np.asarray(occ_grid).mean())
                margin = getattr(args, "occ_gate_margin", 1.0)
                occ_cull_engaged = (
                    margin <= 0.0
                    or expected_keep_fraction(occ_frac, args.occ_probe_stride)
                    <= margin * args.coarse_cull_capacity)
                if primary:
                    logger.scalars(
                        {"train/occ_frac": occ_frac,
                         "train/coarse_cull_active":
                             float(occ_cull_engaged)}, i)
            coarse_cull = coarse_cull and occ_cull_engaged
            events_active = bool(
                args.add_event_egm and ev_prefetch is not None
                and (args.add_event_egm_startiter is None
                     or i >= args.add_event_egm_startiter))

            batch = next(img_prefetch)
            ev_batch = next(ev_prefetch) if events_active else None

            # reference-literal recompute (ref run_nerf.py:463-471): runs
            # only once the AWP render exists (kernel active, not the
            # pre-start naive phase), with start/end ratios HARDCODED
            # 0.1/0.9 upstream and an N_iters+1 horizon — quirks
            # replicated for trajectory parity
            if (args.kernel_use_awp and args.kernel_awp_use_coarse_to_fine_opt
                    and not force_naive and i % 10000 == 0):
                fine_loss_weight = exponential_scale_fine_loss_weight(
                    N_iters=args.N_iters + 1,
                    kernel_start_iter=args.kernel_start_iter,
                    start_ratio=0.1, end_ratio=0.9, iter=i)

            sw = compute_schedule_weights(
                args, i, kernel_end_warmup_iter=kernel_end_warmup_iter,
                w_kernel=w_kernel, w_pts0_target=w_pts0_target,
                w_events_egm=w_events_egm,
                fine_loss_weight=fine_loss_weight,
                events_active=events_active)
            step_key = jax.random.fold_in(base_key, i)

            # jax.profiler trace window (SURVEY §5: the reference has no
            # tracing; per-pose prints only)
            if i == args.profile_start_step:
                jax.profiler.start_trace(
                    args.profile_dir or os.path.join(expdir, "profile"))
            state, aux = step_fn(state, batch, ev_batch, step_key, sw,
                                 force_naive, events_active,
                                 fine_cull=fine_cull,
                                 coarse_cull=coarse_cull,
                                 occ_grid=occ_grid)
            if (args.profile_start_step >= 0
                    and i == args.profile_start_step
                    + args.profile_num_steps - 1):
                jax.block_until_ready(aux["loss"])
                jax.profiler.stop_trace()

            if (i % args.i_print == 0 or is_last) and primary:
                loss = float(aux["loss"])
                psnr = float(aux["psnr"] if i > args.blur_loss_after
                             else aux.get("pts0_psnr", aux["psnr"]))
                print(f"[{args.expname}] iter {i}: loss {loss:.5f} "
                      f"psnr {psnr:.2f}")
            if i % args.i_tensorboard == 0 or is_last:
                logger.scalars(
                    {f"train/{k}": float(v) for k, v in aux.items()
                     if np.ndim(v) == 0}, i)

            if (i % args.i_weights == 0 and i > 0) or is_last:
                # keyed by the post-update step count so resume continues
                # exactly where training left off. Multi-host: EVERY
                # process must call save — orbax runs a global sync
                # barrier inside CheckpointManager.save (a primary-only
                # call deadlocks the pod) and itself gates the actual
                # write to the primary host.
                ckpt.save(int(state.step), jax.device_get(state),
                          force=is_last)
            if (i % args.i_testset == 0 and i > 0) or is_last:
                run_test_renders(
                    args, llff, model, crf, eval_variables(state),
                    state.params["crf"], chunk_fn, mesh, i, logger, expdir,
                    skip_learn_crf=i < args.tone_mapping_start_learn_iter)
            if i % args.i_video == 0 and i > 0:
                run_video_render(
                    args, llff, crf, eval_variables(state),
                    state.params["crf"], chunk_fn, mesh, i, logger,
                    skip_learn_crf=i < args.tone_mapping_start_learn_iter)
    finally:
        img_prefetch.close()
        if ev_prefetch is not None:
            ev_prefetch.close()
        ckpt.wait()
        logger.close()

    return state
