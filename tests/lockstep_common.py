"""Shared spec for the lockstep TRAINING parity harness.

The reference-oracle suite (oracle_common.py) pins a single forward and a
single backward against the actual PyTorch reference. This module extends
that to *training dynamics*: starting from identical transplanted weights,
both implementations run N full Adam steps on identical batches — our side
through the real production train step (`train/step.py::build_train_step` +
`train/optim.py::build_optimizer`), the reference side through its own
modules plus the literal run_nerf.py loss ladder — and the per-step loss
trajectories are compared.

Reference code exercised per step: networks/renderer.py:266-391 (training
forward), loss assembly run_nerf.py:448-504, loss.backward(), torch Adam +
the exponential LR rule run_nerf.py:603-613.

Both sides run f32 CPU with every stochastic knob off (perturb=0, no
pattern jitter, no sigma noise) so the only divergence source is
accumulated float drift between the two implementations' op orders.

`tools/lockstep_train_reference.py` runs both sides live and records the
reference trajectory into ``tests/goldens/lockstep_<name>.npz``;
`tests/test_lockstep_train.py` replays our side against the recording
(no torch / reference checkout needed at test time).
"""

import os

import numpy as np

import oracle_common as oc

NAME = "rbk_awp"
N_STEPS = 200
N_BATCHES = 8                  # cycled; emulates a (tiny) data stream
LRATE = 5e-3                   # paper lrate (configs/*: lrate = 5e-3)
LRATE_DECAY = 10               # paper decay horizon (10k steps)
TV_W = 1e-5                    # kernel_tv_loss_weight at its flag default
FINE_LOSS_WEIGHT = 0.1         # AWP c2f blend (ref run_nerf.py:417)
RECORD_EVAL_EVERY = 50

# ---------------------------------------------------------------------------
# events-ON variant (VERDICT r3 Weak #4): the cdavis-config ladder — RBK+AWP
# plus EGM loss on stage0+stage1, color events (tonemap_only), BII
# 'color-pos-neg' CRF conditioning, learned event CRF with an identity
# pre-fit and a mid-run learn-start flip, and mid-run color-weight start.
# Reference path exercised per step at generation: run_nerf.py:440-504
# (image ladder incl. CRF encode_rgb) + run_nerf.py:507-591 (event ladder).
# ---------------------------------------------------------------------------
EV_NAME = "rbk_awp_events"
EV_N_STEPS = 150
EV_N = 16                       # event rays per batch (per exposure end)
EV_W = 0.1                      # event_egm_weight (cdavis configs)
EV_THRESH = 0.25                # events_threshold (cdavis configs)
CRF_LEARN_START = 20            # tone_mapping_start_learn_iter (flips mid-run)
CW_START = 60                   # event_egm_color_weights_start_iter
COLOR_WEIGHTS = (0.4, 0.2, 0.4)  # event_egm_use_color_weights (cdavis)


def lockstep_args():
    """Oracle variant flags + the training knobs of this harness."""
    over = dict(oc.VARIANTS[NAME])
    over.update(
        lrate=LRATE, lrate_decay=LRATE_DECAY, grad_accum=1,
        triplane_bf16=False, triplane_line_matmul=False,
        kernel_tv_loss_weight=TV_W, kernel_align_weight=0.0,
        no_log_grads_norm=True)
    return oc.make_args(over)


def make_batches():
    """N_BATCHES fixed ray batches + targets, identical for both sides."""
    rng = np.random.default_rng(97)
    batches = []
    for _ in range(N_BATCHES):
        rays_o = rng.normal(size=(oc.N, 3)).astype(np.float32) * 0.05
        rays_d = rng.normal(size=(oc.N, 3)).astype(np.float32)
        rays_d[:, 2] = -np.abs(rays_d[:, 2]) - 0.5
        batches.append({
            "rays": np.stack([rays_o, rays_d], axis=-1),
            "rays_x": rng.uniform(0, oc.W, oc.N).astype(np.float32),
            "rays_y": rng.uniform(0, oc.H, oc.N).astype(np.float32),
            "images_idx": rng.integers(
                0, oc.NUM_IMAGES, oc.N).astype(np.int32),
            "poses": np.broadcast_to(
                np.concatenate([np.eye(3), np.zeros((3, 1))], -1),
                (oc.N, 3, 4)).astype(np.float32).copy(),
            "rgbsf": rng.uniform(0, 1, (oc.N, 3)).astype(np.float32),
        })
    return batches


def lockstep_ev_args():
    """Events-on flag set: the rbk_awp model plus the cdavis-style event
    ladder (add_event_egm stage0+stage1, color events, 'color-pos-neg' BII,
    learned event CRF, color weights with a start iter)."""
    over = dict(oc.VARIANTS[NAME])
    over.update(
        lrate=LRATE, lrate_decay=LRATE_DECAY, grad_accum=1,
        triplane_bf16=False, triplane_line_matmul=False,
        kernel_tv_loss_weight=TV_W, kernel_align_weight=0.0,
        no_log_grads_norm=True,
        blur_loss_after=-1,
        kernel_awp_use_coarse_to_fine_opt=True,
        use_events=True, add_event_egm=True,
        add_event_egm_stages=["stage0", "stage1"],
        add_event_egm_startiter=0,
        event_egm_use_colorevents=True,
        tone_mapping_type="none",
        tone_mapping_events_type="learn",
        tone_mapping_events_add_bii="color-pos-neg",
        tone_mapping_start_learn_iter=CRF_LEARN_START,
        tone_mapping_learn_init_identity=True,
        events_threshold=EV_THRESH,
        event_egm_weight=EV_W, event_egm_weight_end=EV_W,
        event_egm_use_color_weights=list(COLOR_WEIGHTS),
        event_egm_color_weights_start_iter=CW_START,
        events_N_rand=EV_N)
    return oc.make_args(over)


def make_ev_batches():
    """Fixed event batches, identical for both sides. Conventions mirror
    data/events.py::batch: polarity cumsums are SIGNED sums (neg <= 0),
    color_map is a one-hot Bayer mask [N, 3]."""
    rng = np.random.default_rng(53)

    def rays():
        o = rng.normal(size=(EV_N, 3)).astype(np.float32) * 0.05
        d = rng.normal(size=(EV_N, 3)).astype(np.float32)
        d[:, 2] = -np.abs(d[:, 2]) - 0.5
        return np.stack([o, d], axis=-1)

    batches = []
    for _ in range(N_BATCHES):
        cm = np.zeros((EV_N, 3), bool)
        cm[np.arange(EV_N), rng.integers(0, 3, EV_N)] = True
        batches.append({
            "events_rays_start": rays(),
            "events_rays_end": rays(),
            "events_neg_pol_cumsum": -rng.integers(
                0, 9, EV_N).astype(np.float32),
            "events_pos_pol_cumsum": rng.integers(
                0, 9, EV_N).astype(np.float32),
            "events_color_map": cm,
        })
    return batches


def build_ev_crf():
    """The cdavis CRF: identity rgb path, learned event CRF conditioned on
    2 BII features (ref: run_nerf.py:233-239 with tone_mapping_type=none,
    tone_mapping_events_type=learn, add_bii='color-pos-neg')."""
    from evdeblurnerf_tpu.models.tonemapping import TonemappingTransform

    return TonemappingTransform(map_type_rgb="none", map_type_event="learn",
                                gamma=2.2, luma_standard="rec601",
                                extra_features_event=2)


def make_sw_ev(args, i):
    """Per-step ScheduleWeights through the PRODUCTION gate ladder
    (train/step.py::compute_schedule_weights) — the learn-start flip at
    CRF_LEARN_START and the color-weight start at CW_START are what this
    harness exists to trajectory-verify."""
    from evdeblurnerf_tpu.train.step import compute_schedule_weights
    from evdeblurnerf_tpu.utils.misc import annealing_interpolator

    w_egm = annealing_interpolator(
        args.event_egm_weight, args.event_egm_weight_end,
        args.event_egm_weight_steps, args.event_egm_weight_scheduler)
    return compute_schedule_weights(
        args, i, kernel_end_warmup_iter=-1,
        w_kernel=lambda s: 1.0, w_pts0_target=lambda s: 0.0,
        w_events_egm=w_egm, fine_loss_weight=FINE_LOSS_WEIGHT,
        events_active=True)


def run_ours_ev(n_steps=EV_N_STEPS, init_flat=None):
    """Events-on lockstep through the real production step. Returns
    (losses, egms, eval_rgbs, init_flat); init_flat carries the CRF params
    under a ``crf/`` prefix (transplanted into the torch reference by
    tools/lockstep_train_reference.py --events)."""
    import jax
    import jax.numpy as jnp

    from evdeblurnerf_tpu.train.optim import build_optimizer
    from evdeblurnerf_tpu.train.state import create_train_state
    from evdeblurnerf_tpu.train.step import build_train_step

    args = lockstep_ev_args()
    model = oc.build_model(NAME)
    crf = build_ev_crf()
    tx = build_optimizer(LRATE, LRATE_DECAY)

    batches = make_batches()
    ev_batches = make_ev_batches()
    rays_info = {k: batches[0][k]
                 for k in ("images_idx", "rays_x", "rays_y", "poses")}
    state = create_train_state(model, crf, tx, jax.random.PRNGKey(5),
                               batches[0]["rays"], rays_info,
                               crf_identity_prefit=True)
    if init_flat is not None:
        tree = {"params": state.params["nerf"]}
        if state.batch_stats:
            tree["batch_stats"] = state.batch_stats
        nerf_flat = {k: v for k, v in init_flat.items()
                     if not k.startswith("crf/")}
        crf_flat = {k[len("crf/"):]: v for k, v in init_flat.items()
                    if k.startswith("crf/")}
        tree = oc.restore_like(tree, nerf_flat)
        params = dict(state.params)
        params["nerf"] = tree["params"]
        params["crf"] = oc.restore_like(state.params["crf"], crf_flat)
        state = state.replace(params=params,
                              batch_stats=tree.get("batch_stats",
                                                   state.batch_stats),
                              opt_state=tx.init(params))
    init = {"params": state.params["nerf"]}
    if state.batch_stats:
        init["batch_stats"] = state.batch_stats
    init_out = oc.flatten(init)
    init_out.update({"crf/" + k: v
                     for k, v in oc.flatten(state.params["crf"]).items()})

    step_fn = build_train_step(model, crf, tx, args)
    key = jax.random.PRNGKey(0)   # no stochastic op consumes it (perturb=0)

    losses, egms, eval_rgbs = [], [], []
    eval_rays, _ = oc.make_inputs()

    def eval_render(st):
        variables = {"params": st.params["nerf"]}
        if st.batch_stats:
            variables["batch_stats"] = st.batch_stats
        ret = model.apply(variables, jax.random.PRNGKey(0),
                          jnp.asarray(eval_rays), is_train=False, perturb=0.0,
                          method=lambda m, k, r, **kw: m.renderer.render(
                              k, r, **kw))
        return np.asarray(ret["rgb_map"])

    for i in range(n_steps):
        sw = make_sw_ev(args, i)
        state, aux = step_fn(state, batches[i % N_BATCHES],
                             ev_batches[i % N_BATCHES], key, sw,
                             force_naive=False, events_active=True)
        losses.append(float(aux["loss"]))
        egms.append(float(aux["event_egm"]))
        if (i + 1) % RECORD_EVAL_EVERY == 0:
            eval_rgbs.append(eval_render(state))

    evals = (np.stack(eval_rgbs) if eval_rgbs
             else np.zeros((0, oc.N, 3), np.float32))
    return (np.asarray(losses, np.float64), np.asarray(egms, np.float64),
            evals, init_out)


def golden_path_ev():
    return os.path.join(oc.GOLDEN_DIR, f"lockstep_{EV_NAME}.npz")


def make_schedule_weights():
    """Fixed mid-training gate values: kernel active, AWP c2f blend on,
    no warmup/pts0/events — the steady-state regime of the paper configs."""
    import jax.numpy as jnp

    from evdeblurnerf_tpu.train.step import ScheduleWeights

    return ScheduleWeights(
        w_img=jnp.ones(()), loss_a=jnp.ones(()), w_pts0=jnp.zeros(()),
        use_pts0_target=jnp.zeros((), bool),
        cf=jnp.asarray(1.0 - FINE_LOSS_WEIGHT),
        ff=jnp.asarray(FINE_LOSS_WEIGHT),
        w_align=jnp.zeros(()), w_egm=jnp.zeros(()),
        skip_learn_crf=jnp.zeros((), bool),
        color_weight=jnp.ones((3,)))


def run_ours(n_steps=N_STEPS, init_flat=None):
    """Train our side for ``n_steps``; returns (losses, eval_rgbs, init_flat).

    ``init_flat``: optional flat {keystr: array} (layout of
    ``oc.flatten({"params": nerf_params, "batch_stats": bs})``) to restore
    the initial weights from — used by the replay test so the recorded
    reference trajectory stays valid even if init RNG details change.
    """
    import jax
    import jax.numpy as jnp

    from evdeblurnerf_tpu.models.tonemapping import TonemappingTransform
    from evdeblurnerf_tpu.train.optim import build_optimizer
    from evdeblurnerf_tpu.train.state import create_train_state
    from evdeblurnerf_tpu.train.step import build_train_step

    args = lockstep_args()
    model = oc.build_model(NAME)
    crf = TonemappingTransform(map_type_rgb="none", map_type_event="none")
    tx = build_optimizer(LRATE, LRATE_DECAY)

    batches = make_batches()
    rays_info = {k: batches[0][k]
                 for k in ("images_idx", "rays_x", "rays_y", "poses")}
    state = create_train_state(model, crf, tx, jax.random.PRNGKey(5),
                               batches[0]["rays"], rays_info)
    if init_flat is not None:
        tree = {"params": state.params["nerf"]}
        if state.batch_stats:
            tree["batch_stats"] = state.batch_stats
        tree = oc.restore_like(tree, init_flat)
        params = dict(state.params)
        params["nerf"] = tree["params"]
        state = state.replace(params=params,
                              batch_stats=tree.get("batch_stats",
                                                   state.batch_stats),
                              opt_state=tx.init(params))
    init = {"params": state.params["nerf"]}
    if state.batch_stats:
        init["batch_stats"] = state.batch_stats
    init_out = oc.flatten(init)

    step_fn = build_train_step(model, crf, tx, args)
    sw = make_schedule_weights()
    key = jax.random.PRNGKey(0)   # no stochastic op consumes it (perturb=0)

    losses, eval_rgbs = [], []
    eval_rays, _ = oc.make_inputs()

    def eval_render(st):
        variables = {"params": st.params["nerf"]}
        if st.batch_stats:
            variables["batch_stats"] = st.batch_stats
        ret = model.apply(variables, jax.random.PRNGKey(0),
                          jnp.asarray(eval_rays), is_train=False, perturb=0.0,
                          method=lambda m, k, r, **kw: m.renderer.render(
                              k, r, **kw))
        return np.asarray(ret["rgb_map"])

    for i in range(n_steps):
        batch = batches[i % N_BATCHES]
        state, aux = step_fn(state, batch, None, key, sw,
                             force_naive=False, events_active=False)
        losses.append(float(aux["loss"]))
        if (i + 1) % RECORD_EVAL_EVERY == 0:
            eval_rgbs.append(eval_render(state))

    evals = (np.stack(eval_rgbs) if eval_rgbs
             else np.zeros((0, oc.N, 3), np.float32))
    return np.asarray(losses, np.float64), evals, init_out


def golden_path():
    return os.path.join(oc.GOLDEN_DIR, f"lockstep_{NAME}.npz")
