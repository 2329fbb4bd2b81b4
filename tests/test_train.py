"""End-to-end training smoke tests on the synthetic scene (CPU, 8 virtual
devices — the train step runs data-parallel over the mesh)."""

import os

import numpy as np
import pytest

from evdeblurnerf_tpu.config import default_args
from evdeblurnerf_tpu.train.loop import train
from synthetic import make_synthetic_scene

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    basedir = tmp_path_factory.mktemp("scene")
    truth = make_synthetic_scene(str(basedir))
    return str(basedir), truth


def tiny_args(scene_dir, logdir, **overrides):
    base = dict(
        expname="smoke", basedir=logdir, datadir=scene_dir, factor=None,
        llffhold=3, dataset_type="llff", seed=0,
        N_rand=128, chunk=512, N_samples=8, N_importance=8,
        use_viewdirs=True, multires=4, multires_views=2,
        lrate=5e-3, lrate_decay=10, N_iters=60,
        mode="c2f",
        coarse_n_voxels=4096, fine_n_voxels=8192,
        coarse_app_n_comp=[4, 2, 2], fine_app_n_comp=[4, 2, 2],
        coarse_hidden_dim=16, coarse_hidden_dim_color=16,
        fine_hidden_dim=16, fine_hidden_dim_color=16,
        fine_geo_feat_dim=16, coarse_app_dim=8, fine_app_dim=8,
        kernel_type="none",
        events_tms_unit="us", events_tms_files_unit="us",
        no_wandb=True,
        i_print=20, i_tensorboard=20, i_weights=50, i_testset=55,
        i_video=10 ** 9,
    )
    base.update(overrides)
    return default_args(**base)


def test_train_naive_smoke(scene, tmp_path):
    """Naive c2f training learns the synthetic scene: loss falls, the test
    render beats a constant-color baseline, checkpoints + metrics appear."""
    scene_dir, truth = scene
    args = tiny_args(scene_dir, str(tmp_path))
    state = train(args)
    assert int(state.step) == 60

    expdir = os.path.join(str(tmp_path), "smoke")
    assert os.path.exists(os.path.join(expdir, "args.txt"))
    assert os.path.exists(os.path.join(expdir, "test_metrics.txt"))
    assert os.path.exists(os.path.join(expdir, "metrics.jsonl"))
    testdir = os.path.join(expdir, "testset_000059")
    assert os.path.exists(testdir)

    import json

    losses, psnrs = [], []
    with open(os.path.join(expdir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec["tag"] == "train/loss":
                losses.append((rec["step"], rec["value"]))
            if rec["tag"] == "test/psnr":
                psnrs.append(rec["value"])
    assert losses[-1][1] < losses[0][1]
    assert np.isfinite(losses[-1][1])
    assert psnrs and psnrs[-1] > 8.0     # far better than random init


def test_train_resume(scene, tmp_path):
    scene_dir, _ = scene
    args = tiny_args(scene_dir, str(tmp_path), N_iters=30, i_weights=20,
                     i_testset=10 ** 9)
    train(args)
    # second call resumes from step 29 (last-iter checkpoint) and continues
    args2 = tiny_args(scene_dir, str(tmp_path), N_iters=35, i_weights=10 ** 9,
                      i_testset=10 ** 9)
    state = train(args2)
    assert int(state.step) == 35


def test_train_full_stack(scene, tmp_path):
    """RBK kernel + AWP + events EGM + EDI prior + learned event CRF: the
    whole loss ladder compiles and steps with finite outputs."""
    scene_dir, _ = scene
    args = tiny_args(
        scene_dir, str(tmp_path), expname="full",
        N_iters=8, i_weights=10 ** 9, i_testset=10 ** 9, i_print=2,
        kernel_type="RBK", kernel_ptnum=3, kernel_rbk_use_origin=True,
        kernel_use_awp=True,
        kernel_awp_sam_emb_width=8, kernel_awp_mot_emb_width=8,
        kernel_start_iter=2, kernel_img_embed=8,
        kernel_rbk_extra_feat_ch=0,
        use_events=True, add_event_egm=True, events_N_rand=64,
        add_event_egm_stages=["stage0", "stage1"],
        use_pts0_prior="edi", pts0_edi_steps=3,
        tone_mapping_events_type="learn",
        tone_mapping_learn_init_identity=True,
        tone_mapping_events_add_bii="pos-neg",
        event_accumulate_step_range=[1, 3],
        event_accumulate_step_range_end=[1, 3],
        clip_grads_norm=1.0,
    )
    state = train(args)
    assert int(state.step) == 8
    leaves = [np.asarray(x) for x in
              __import__("jax").tree_util.tree_leaves(state.params)]
    assert all(np.isfinite(x).all() for x in leaves)


def test_train_dsk_kernel(scene, tmp_path):
    """DSK (Deblur-NeRF) kernel path trains end to end (BASELINE config 4
    family; all published configs use RBK, DSK/PBE retained for parity)."""
    scene_dir, _ = scene
    args = tiny_args(
        scene_dir, str(tmp_path), expname="dsk",
        N_iters=6, i_weights=10 ** 9, i_testset=10 ** 9, i_print=2,
        kernel_type="DSK", kernel_ptnum=3, kernel_start_iter=2,
        kernel_img_embed=8, kernel_rand_embed=2, kernel_spatial_embed=2,
        kernel_align_weight=0.1, kernel_hwindow=5,
    )
    state = train(args)
    assert int(state.step) == 6
    import jax

    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]
    assert all(np.isfinite(x).all() for x in leaves)


def test_train_no_ndc(scene, tmp_path):
    """no_ndc branch: metric-depth near/far from the pose bounds, lindisp
    sampling, no NDC projection (ref: run_nerf.py:316-319)."""
    scene_dir, _ = scene
    args = tiny_args(scene_dir, str(tmp_path), expname="nondc",
                     N_iters=6, i_weights=10 ** 9, i_testset=10 ** 9,
                     no_ndc=True, lindisp=True)
    state = train(args)
    assert int(state.step) == 6
    import jax

    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]
    assert all(np.isfinite(x).all() for x in leaves)


def test_train_image_batch_sampling(scene, tmp_path):
    """ray_sampling_mode=images drives training through ImageBatchSampler
    (ref: run_nerf.py:64-68)."""
    scene_dir, _ = scene
    args = tiny_args(scene_dir, str(tmp_path), expname="imgsamp",
                     N_iters=5, i_weights=10 ** 9, i_testset=10 ** 9,
                     ray_sampling_mode="images", ray_sampling_images_num=2,
                     N_rand=64)
    state = train(args)
    assert int(state.step) == 5


def test_train_coarse_cull_smoke(scene, tmp_path):
    """Occupancy-grid coarse culling end to end through the production
    loop: the grid refresh fires at the activation step and at the
    refresh cadence, the culled step trains to finite params across the
    8-device DP mesh, and training still learns (loss falls)."""
    import json

    scene_dir, _ = scene
    args = tiny_args(
        scene_dir, str(tmp_path), expname="occul",
        N_iters=24, i_weights=10 ** 9, i_testset=10 ** 9, i_print=4,
        N_samples=16, N_importance=16,
        coarse_cull_capacity=0.5, coarse_cull_start_iter=4,
        occ_grid_size=16, occ_refresh_every=8, occ_probe_stride=8,
        occ_gate_margin=0.0,   # force-engage: this test pins the CULLED step
        fine_cull_capacity=0.25, fine_cull_start_iter=8,
    )
    state = train(args)
    assert int(state.step) == 24
    import jax

    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]
    assert all(np.isfinite(x).all() for x in leaves)
    losses = []
    with open(os.path.join(str(tmp_path), "occul", "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec["tag"] == "train/loss":
                losses.append(rec["value"])
    assert losses and losses[-1] < losses[0]


def _cull_active_log(logdir, expname):
    import json

    frac, active = [], []
    with open(os.path.join(logdir, expname, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec["tag"] == "train/occ_frac":
                frac.append(rec["value"])
            elif rec["tag"] == "train/coarse_cull_active":
                active.append(rec["value"])
    return frac, active


def test_coarse_cull_budget_gate(scene, tmp_path):
    """The budget-sufficiency gate (PERF_NOTES round 5): the cull engages
    only while expected_keep_fraction(occ_frac, probe_stride) fits
    margin * capacity. A tiny margin must disengage it (full coarse
    sampling, reference behavior); a huge margin must engage it. Both
    runs log the refresh-time gate decision."""
    scene_dir, _ = scene
    common = dict(
        N_iters=10, i_weights=10 ** 9, i_testset=10 ** 9, i_print=4,
        N_samples=16, N_importance=16,
        coarse_cull_capacity=0.5, coarse_cull_start_iter=2,
        occ_grid_size=16, occ_refresh_every=4, occ_probe_stride=8,
    )
    args = tiny_args(scene_dir, str(tmp_path), expname="gate_off",
                     occ_gate_margin=1e-6, **common)
    train(args)
    frac, active = _cull_active_log(str(tmp_path), "gate_off")
    assert frac and all(0.0 <= f <= 1.0 for f in frac)
    assert active and all(a == 0.0 for a in active), active

    args = tiny_args(scene_dir, str(tmp_path), expname="gate_on",
                     occ_gate_margin=1e6, **common)
    state = train(args)
    assert int(state.step) == 10
    _, active = _cull_active_log(str(tmp_path), "gate_on")
    assert active and all(a == 1.0 for a in active), active

    from evdeblurnerf_tpu.ops.occupancy import expected_keep_fraction
    assert expected_keep_fraction(0.0, 8) == pytest.approx(0.125)
    assert expected_keep_fraction(1.0, 8) == pytest.approx(1.0)
    assert expected_keep_fraction(0.12, 8) == pytest.approx(
        0.12 + 0.88 / 8)


def test_train_tp_smoke(scene, tmp_path):
    """--tp_model_parallel 2: the production loop on a 4x2 (data x model)
    mesh with component-sharded voxel tables steps to finite params, saves
    an orbax checkpoint of the distributed arrays, resumes from it, and
    the table params stay distributed (not replicated) on the mesh."""
    import jax

    from evdeblurnerf_tpu.parallel import tp as tpm

    scene_dir, _ = scene
    args = tiny_args(
        scene_dir, str(tmp_path), expname="tp",
        N_iters=4, i_weights=4, i_testset=10 ** 9, i_print=2,
        tp_model_parallel=2,
    )
    args2 = tiny_args(
        scene_dir, str(tmp_path), expname="tp",
        N_iters=6, i_weights=10 ** 9, i_testset=10 ** 9, i_print=2,
        tp_model_parallel=2,
    )
    try:
        train(args)          # saves a step-4 checkpoint (sharded tables)
        state = train(args2)  # restores it and continues to 6
    finally:
        tpm.set_tp_mesh(None)
    assert int(state.step) == 6
    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]
    assert all(np.isfinite(x).all() for x in leaves)
    pl0 = state.params["nerf"]["mlp_coarse"]["field"]["app_plane_0"] \
        if "field" in state.params["nerf"].get("mlp_coarse", {}) else None
    if pl0 is None:  # param tree layout: find any app_plane_0 leaf
        flat = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_leaves_with_path(state.params)}
        pl0 = next(v for k, v in flat.items() if "app_plane_0" in k)
    assert not pl0.sharding.is_fully_replicated
