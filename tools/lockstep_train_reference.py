#!/usr/bin/env python
"""Lockstep TRAINING parity against the actual PyTorch reference.

Starting from identical transplanted initial weights, run N full Adam
training steps on identical batches through BOTH implementations:

* ours: the real production step (`train/step.py` + `train/optim.py`),
  jax f32 CPU;
* reference: `networks/renderer.py` NeRFAll training forward + the literal
  run_nerf.py:448-504 loss ladder + loss.backward() + torch Adam with the
  run_nerf.py:603-613 exponential LR rule, torch f32 CPU.

Prints the per-step loss agreement and records the reference trajectory to
``tests/goldens/lockstep_<name>.npz`` so `tests/test_lockstep_train.py`
can replay our side against it without torch or the reference checkout.

Usage: JAX_PLATFORMS=cpu python tools/lockstep_train_reference.py [n_steps]
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")

# the env var alone is NOT enough: sitecustomize re-updates jax_platforms
# to "axon,cpu" (remote TPU tunnel), so the jax side of the lockstep would
# silently run on TPU hardware; force the config BEFORE any jax use
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import lockstep_common as lc  # noqa: E402
import oracle_common as oc  # noqa: E402


def run_reference_train(init_flat, n_steps):
    """Reference-side lockstep loop. Loss ladder: run_nerf.py:448-504
    (image MSE on rgb and rgb1, AWP c2f fine blend, TV); LR rule:
    run_nerf.py:603-613; optimizer: torch Adam (run_nerf.py:243-274,
    weight-decay group empty at these flags)."""
    import make_reference_fixtures as mrf  # installs shims + ref sys.path
    import torch

    torch.set_num_threads(2)
    nerf = mrf.build_reference(lc.NAME, mrf.Flat(init_flat))
    nerf.train()

    batches = lc.make_batches()
    K_t = torch.tensor(oc.K, dtype=torch.float32)
    render_kwargs = dict(N_samples=oc.N_SAMPLES, N_importance=oc.N_IMPORTANCE,
                         perturb=0.0, raw_noise_std=0.0, ndc=True,
                         near=0.0, far=1.0, use_viewdirs=True, retraw=False)
    opt = torch.optim.Adam(nerf.parameters(), lr=lc.LRATE,
                           betas=(0.9, 0.999), eps=1e-8)
    mse = torch.nn.functional.mse_loss

    def to_torch(batch):
        rays_t = mrf.T(batch["rays"])
        ri = {
            "rays_x": mrf.T(batch["rays_x"])[:, None],
            "rays_y": mrf.T(batch["rays_y"])[:, None],
            "images_idx": torch.from_numpy(
                batch["images_idx"].astype(np.int64))[:, None],
            "poses": mrf.T(batch["poses"]),
        }
        return rays_t, ri, mrf.T(batch["rgbsf"])

    eval_rays, _ = oc.make_inputs()
    eval_rays_t = mrf.T(eval_rays)

    def eval_render():
        nerf.eval()
        with torch.no_grad():
            e_rgb, _, _, _ = nerf.render(oc.H, oc.W, K_t, 1 << 20,
                                         rays=eval_rays_t, **render_kwargs)
        nerf.train()
        return np.asarray(e_rgb.detach())

    losses, eval_rgbs = [], []
    for i in range(n_steps):
        # optax's scale_by_schedule sees count=i at update i (0-based);
        # mirror that exactly (the reference applies the same formula with
        # its global_step, run_nerf.py:603-613)
        lr = lc.LRATE * (0.1 ** (i / (lc.LRATE_DECAY * 1000)))
        for g in opt.param_groups:
            g["lr"] = lr
        rays_t, ri, target = to_torch(batches[i % lc.N_BATCHES])
        opt.zero_grad()
        rgb, rgb1, other_loss, other_tensors = nerf(
            oc.H, oc.W, K_t, chunk=1 << 20, rays=rays_t, rays_info=ri,
            force_naive=False, return_pts0_rgb=True, **render_kwargs)
        img_loss = mse(rgb, target)
        if rgb1 is not None:
            img_loss = img_loss + mse(rgb1, target)
        loss = img_loss
        fine = mse(other_tensors["rgb_awp"], target)
        loss = (loss * (1.0 - lc.FINE_LOSS_WEIGHT)
                + fine * lc.FINE_LOSS_WEIGHT)
        loss = loss + other_loss["TV"] * lc.TV_W
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
        if (i + 1) % lc.RECORD_EVAL_EVERY == 0:
            eval_rgbs.append(eval_render())

    return np.asarray(losses, np.float64), np.stack(eval_rgbs)


def run_reference_train_ev(init_flat, n_steps):
    """Events-ON reference lockstep loop (VERDICT r3 Weak #4): the literal
    run_nerf.py:440-504 image ladder (incl. CRF encode_rgb) PLUS the
    run_nerf.py:507-591 event ladder — EGM on stage0+stage1, color events
    (tonemap_only), 'color-pos-neg' BII CRF conditioning, the CRF
    learn-start flip at lc.CRF_LEARN_START and the color-weight start at
    lc.CW_START — through the actual reference modules, torch f32 CPU."""
    import make_reference_fixtures as mrf  # installs shims + ref sys.path
    import torch
    from networks.tonemapping import TonemappingTransform
    from utils.events import egm_loss as ref_egm_loss

    torch.set_num_threads(2)
    nerf = mrf.build_reference(lc.NAME, mrf.Flat(
        {k: v for k, v in init_flat.items() if not k.startswith("crf/")}))
    nerf.train()

    # cdavis CRF (ref run_nerf.py:233-239): identity rgb, learned event CRF
    # with 2 BII features; params transplanted from our (pre-fit) init
    crf = TonemappingTransform(map_type_rgb="none", map_type_event="learn",
                               gamma=2.2, luma_standard="rec601",
                               init_learn_identity=False,
                               extra_features_event=2)
    crf_flat = mrf.Flat({k[len("crf/"):]: v for k, v in init_flat.items()
                         if k.startswith("crf/")})
    lin = crf.tonemapping_event.linear
    for j, li in enumerate([0, 2, 4, 6]):
        mrf.load_linear(lin[li], crf_flat, "tonemapping_event",
                        f"linear_{j}")
    assert not crf_flat.unused(prefix=""), crf_flat.unused(prefix="")

    batches = lc.make_batches()
    ev_batches = lc.make_ev_batches()
    K_t = torch.tensor(oc.K, dtype=torch.float32)
    render_kwargs = dict(N_samples=oc.N_SAMPLES, N_importance=oc.N_IMPORTANCE,
                         perturb=0.0, raw_noise_std=0.0, ndc=True,
                         near=0.0, far=1.0, use_viewdirs=True, retraw=False)
    # ref run_nerf.py:261: optimizer covers nerf AND crf parameters
    opt = torch.optim.Adam(list(nerf.parameters()) + list(crf.parameters()),
                           lr=lc.LRATE, betas=(0.9, 0.999), eps=1e-8)
    mse = torch.nn.functional.mse_loss
    thr_negpos = torch.tensor([[lc.EV_THRESH, lc.EV_THRESH]],
                              dtype=torch.float32)    # ref run_nerf.py:94

    def to_torch(batch):
        rays_t = mrf.T(batch["rays"])
        ri = {
            "rays_x": mrf.T(batch["rays_x"])[:, None],
            "rays_y": mrf.T(batch["rays_y"])[:, None],
            "images_idx": torch.from_numpy(
                batch["images_idx"].astype(np.int64))[:, None],
            "poses": mrf.T(batch["poses"]),
        }
        return rays_t, ri, mrf.T(batch["rgbsf"])

    eval_rays, _ = oc.make_inputs()
    eval_rays_t = mrf.T(eval_rays)

    def eval_render():
        nerf.eval()
        with torch.no_grad():
            e_rgb, _, _, _ = nerf.render(oc.H, oc.W, K_t, 1 << 20,
                                         rays=eval_rays_t, **render_kwargs)
        nerf.train()
        return np.asarray(e_rgb.detach())

    losses, egms, eval_rgbs = [], [], []
    for i in range(n_steps):
        lr = lc.LRATE * (0.1 ** (i / (lc.LRATE_DECAY * 1000)))
        for g in opt.param_groups:
            g["lr"] = lr
        skip_learn = i < lc.CRF_LEARN_START
        color_weight = (list(lc.COLOR_WEIGHTS) if i > lc.CW_START else None)

        rays_t, ri, target = to_torch(batches[i % lc.N_BATCHES])
        opt.zero_grad()
        # image ladder (ref run_nerf.py:440-504); encode_rgb is identity
        # here (tone_mapping_type=none) but called for faithfulness
        rgb, rgb1, other_loss, other_tensors = nerf(
            oc.H, oc.W, K_t, chunk=1 << 20, rays=rays_t, rays_info=ri,
            force_naive=False, return_pts0_rgb=True, **render_kwargs)
        rgb = crf(rgb, mode="encode_rgb", skip_learn_crf=skip_learn)
        rgb1 = (crf(rgb1, mode="encode_rgb", skip_learn_crf=skip_learn)
                if rgb1 is not None else None)
        img_loss = mse(rgb, target)
        if rgb1 is not None:
            img_loss = img_loss + mse(rgb1, target)
        loss = img_loss
        fine = mse(crf(other_tensors["rgb_awp"], mode="encode_rgb",
                       skip_learn_crf=skip_learn), target)
        loss = (loss * (1.0 - lc.FINE_LOSS_WEIGHT)
                + fine * lc.FINE_LOSS_WEIGHT)
        loss = loss + other_loss["TV"] * lc.TV_W

        # event ladder (ref run_nerf.py:507-591)
        ev = ev_batches[i % lc.N_BATCHES]
        neg = mrf.T(ev["events_neg_pol_cumsum"])
        pos = mrf.T(ev["events_pos_pol_cumsum"])
        cm = torch.from_numpy(ev["events_color_map"])
        cumsum_pols = torch.stack([neg, pos], dim=-1)
        bii = (thr_negpos * cumsum_pols).sum(-1)
        c_neg = neg.new_zeros([cm.shape[0], 3])
        c_pos = pos.new_zeros([cm.shape[0], 3])
        c_neg[cm] = neg
        c_pos[cm] = pos
        ev_feat = torch.stack([c_neg, c_pos], dim=-1)
        crf_kw = dict(skip_learn_crf=skip_learn, ev_extra_feat=ev_feat,
                      tonemap_only=True)

        egm = 0.0
        stage_lumas = []
        for rays_key in ("events_rays_start", "events_rays_end"):
            e_rgb, e_rgb0, _, _ = nerf(
                oc.H, oc.W, K_t, chunk=1 << 20, rays=mrf.T(ev[rays_key]),
                rays_info=None, force_naive=True,
                **{**render_kwargs, "retraw": True})
            stage_lumas.append((crf(e_rgb, mode="encode_luma", **crf_kw),
                                crf(e_rgb0, mode="encode_luma", **crf_kw)))
        (s_luma, s_luma0), (e_luma, e_luma0) = stage_lumas
        egm = egm + ref_egm_loss(s_luma0, e_luma0, bii, color_mask=cm,
                                 color_weight=color_weight)    # stage0
        egm = egm + ref_egm_loss(s_luma, e_luma, bii, color_mask=cm,
                                 color_weight=color_weight)    # stage1
        loss = loss + egm * lc.EV_W

        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
        egms.append(float(egm.detach()))
        if (i + 1) % lc.RECORD_EVAL_EVERY == 0:
            eval_rgbs.append(eval_render())

    evals = (np.stack(eval_rgbs) if eval_rgbs
             else np.zeros((0, oc.N, 3), np.float32))
    return (np.asarray(losses, np.float64), np.asarray(egms, np.float64),
            evals)


def main_events(n_steps):
    print(f"[ours] {n_steps} events-ON lockstep steps (jax f32 CPU) ...")
    losses_ours, egms_ours, evals_ours, init_flat = lc.run_ours_ev(n_steps)
    print(f"[ref ] {n_steps} events-ON lockstep steps (torch f32 CPU) ...")
    losses_ref, egms_ref, evals_ref = run_reference_train_ev(init_flat,
                                                             n_steps)

    rel = np.abs(losses_ours - losses_ref) / np.maximum(losses_ref, 1e-12)
    rel_e = np.abs(egms_ours - egms_ref) / np.maximum(np.abs(egms_ref),
                                                      1e-12)
    print(f"\n{'step':>5} {'loss ours':>12} {'loss ref':>12} {'rel':>10} "
          f"{'egm rel':>10}")
    marks = sorted(set([0, 1, 4, 9, lc.CRF_LEARN_START,
                        lc.CRF_LEARN_START + 1, 49, lc.CW_START,
                        lc.CW_START + 1, 99, n_steps - 1])
                   | set(range(0, n_steps, max(1, n_steps // 10))))
    for i in [m for m in marks if m < n_steps]:
        print(f"{i:>5} {losses_ours[i]:>12.6f} {losses_ref[i]:>12.6f} "
              f"{rel[i]:>10.2e} {rel_e[i]:>10.2e}")
    print(f"\nmax rel loss diff over {n_steps} steps: {rel.max():.3e} "
          f"(at step {int(rel.argmax())})")
    print(f"loss drop ours {losses_ours[0]:.4f} -> {losses_ours[-1]:.4f}, "
          f"ref {losses_ref[0]:.4f} -> {losses_ref[-1]:.4f}")
    for j in range(evals_ref.shape[0]):
        d = evals_ours[j] - evals_ref[j]
        mse = float((d ** 2).mean())
        psnr = -10 * np.log10(max(mse, 1e-12))
        print(f"eval render @step {(j + 1) * lc.RECORD_EVAL_EVERY}: "
              f"ours-vs-ref PSNR {psnr:.1f} dB, max|d| {np.abs(d).max():.2e}")

    path = lc.golden_path_ev()
    rec = {"losses_ref": losses_ref, "losses_ours_gen": losses_ours,
           "egms_ref": egms_ref, "egms_ours_gen": egms_ours,
           "evals_ref": evals_ref, "evals_ours_gen": evals_ours,
           "n_steps": np.int64(n_steps)}
    for k, v in init_flat.items():
        rec["init/" + k] = v
    np.savez_compressed(path, **rec)
    print(f"\nwrote {path}")


def main():
    argv = [a for a in sys.argv[1:]
            if a not in ("--selfdrift", "--events")]
    if "--events" in sys.argv:
        main_events(int(argv[0]) if argv else lc.EV_N_STEPS)
        return
    n_steps = int(argv[0]) if argv else lc.N_STEPS

    if "--selfdrift" in sys.argv:
        # Chaos control: the reference vs ITSELF with a 1e-6-relative
        # init perturbation. If its self-divergence at step N matches the
        # ours-vs-ref divergence, the lockstep drift is the problem's
        # intrinsic sensitivity (f32 + Adam at lr 5e-3), not a systematic
        # implementation difference.
        _, _, init_flat = lc.run_ours(1)
        losses_a, evals_a = run_reference_train(init_flat, n_steps)
        rng = np.random.default_rng(123)
        pert = {k: v * (1 + 1e-6 * rng.standard_normal(v.shape)
                        ).astype(v.dtype)
                for k, v in init_flat.items()}
        losses_b, evals_b = run_reference_train(pert, n_steps)
        rel = np.abs(losses_a - losses_b) / np.maximum(losses_a, 1e-12)
        for i in sorted(set([0, 9, 49, 99, 149, n_steps - 1])):
            if i < n_steps:
                print(f"self-drift step {i:>4}: rel loss diff {rel[i]:.2e}")
        d = evals_a[-1] - evals_b[-1]
        mse = float((d ** 2).mean())
        print(f"self-drift eval render @step {n_steps}: "
              f"PSNR {-10 * np.log10(max(mse, 1e-12)):.1f} dB, "
              f"max|d| {np.abs(d).max():.2e}")
        return

    print(f"[ours] {n_steps} lockstep steps (jax f32 CPU) ...")
    losses_ours, evals_ours, init_flat = lc.run_ours(n_steps)
    print(f"[ref ] {n_steps} lockstep steps (torch f32 CPU) ...")
    losses_ref, evals_ref = run_reference_train(init_flat, n_steps)

    rel = np.abs(losses_ours - losses_ref) / np.maximum(losses_ref, 1e-12)
    print(f"\n{'step':>5} {'loss ours':>12} {'loss ref':>12} {'rel':>10}")
    marks = sorted(set([0, 1, 4, 9, 24, 49, 99, n_steps - 1])
                   | set(range(0, n_steps, max(1, n_steps // 10))))
    for i in [m for m in marks if m < n_steps]:
        print(f"{i:>5} {losses_ours[i]:>12.6f} {losses_ref[i]:>12.6f} "
              f"{rel[i]:>10.2e}")
    print(f"\nmax rel loss diff over {n_steps} steps: {rel.max():.3e} "
          f"(at step {int(rel.argmax())})")
    print(f"loss drop ours {losses_ours[0]:.4f} -> {losses_ours[-1]:.4f}, "
          f"ref {losses_ref[0]:.4f} -> {losses_ref[-1]:.4f}")
    for j in range(evals_ref.shape[0]):
        d = evals_ours[j] - evals_ref[j]
        mse = float((d ** 2).mean())
        psnr = -10 * np.log10(max(mse, 1e-12))
        print(f"eval render @step {(j + 1) * lc.RECORD_EVAL_EVERY}: "
              f"ours-vs-ref PSNR {psnr:.1f} dB, max|d| {np.abs(d).max():.2e}")

    path = lc.golden_path()
    rec = {"losses_ref": losses_ref, "losses_ours_gen": losses_ours,
           "evals_ref": evals_ref, "evals_ours_gen": evals_ours,
           "n_steps": np.int64(n_steps)}
    for k, v in init_flat.items():
        rec["init/" + k] = v
    np.savez_compressed(path, **rec)
    print(f"\nwrote {path}")


if __name__ == "__main__":
    main()
