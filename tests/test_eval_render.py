"""Render-only path, LPIPS scorer, and metric sanity tests."""

import os

import numpy as np
import pytest

from evdeblurnerf_tpu.utils.metrics import (compute_img_metric,
                                            structural_similarity)


def test_ssim_basics():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (32, 40, 3)).astype(np.float32)
    assert compute_img_metric(a, a, "ssim") == pytest.approx(1.0, abs=1e-6)
    b = np.clip(a + rng.normal(0, 0.2, a.shape), 0, 1).astype(np.float32)
    v = compute_img_metric(a, b, "ssim")
    assert 0.0 < v < 0.9
    # smooth images are structurally closer than noisy ones
    smooth = np.tile(np.linspace(0, 1, 40)[None, :, None], (32, 1, 3))
    smooth2 = np.clip(smooth + 0.05, 0, 1)
    assert compute_img_metric(smooth.astype(np.float32),
                              smooth2.astype(np.float32), "ssim") > v


def test_psnr_mse():
    a = np.zeros((8, 8, 3), np.float32)
    b = np.full((8, 8, 3), 0.1, np.float32)
    mse = compute_img_metric(a, b, "mse")
    # inputs are scaled to [-1, 1], so mse = (0.2)^2
    assert mse == pytest.approx(0.04, abs=1e-6)
    psnr = compute_img_metric(a, b, "psnr")
    assert psnr == pytest.approx(10 * np.log10(4.0 / 0.04), abs=1e-4)


def test_lpips_with_random_weights(tmp_path):
    """LPIPS pipeline runs end-to-end given a weight bundle (random weights
    here — the architecture + scoring path is what is under test)."""
    from evdeblurnerf_tpu.models.lpips import LPIPSScorer, _ALEX

    rng = np.random.default_rng(0)
    weights = {}
    c_in = 3
    for i, (c_out, k, _, _) in enumerate(_ALEX):
        weights[f"conv{i}_w"] = rng.normal(
            0, 0.05, (c_out, c_in, k, k)).astype(np.float32)
        weights[f"conv{i}_b"] = np.zeros(c_out, np.float32)
        c_in = c_out
    for i, (c_out, _, _, _) in enumerate(_ALEX):
        weights[f"lin{i}_w"] = np.abs(rng.normal(
            0, 0.01, (1, c_out, 1, 1))).astype(np.float32)
    path = os.path.join(str(tmp_path), "w.npz")
    np.savez(path, **weights)

    scorer = LPIPSScorer.from_npz(path)
    a = rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32)
    d_same = scorer(a, a)
    d_diff = scorer(a, b)
    assert d_same == pytest.approx(0.0, abs=1e-6)
    assert d_diff > d_same

    os.environ["EVDEBLURNERF_LPIPS_WEIGHTS"] = path
    try:
        assert LPIPSScorer.from_env() is not None
    finally:
        del os.environ["EVDEBLURNERF_LPIPS_WEIGHTS"]


@pytest.mark.slow
def test_render_only(tmp_path):
    """--render_only --render_test produces the versioned output directory
    with per-view PNGs and the disparity dump (ref: run_nerf.py:337-414)."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from synthetic import make_synthetic_scene
    from evdeblurnerf_tpu.config import default_args
    from evdeblurnerf_tpu.train.loop import train

    scene = os.path.join(str(tmp_path), "scene")
    os.makedirs(scene)
    make_synthetic_scene(scene)
    kw = dict(
        expname="ro", basedir=os.path.join(str(tmp_path), "logs"),
        datadir=scene, factor=None, llffhold=3, seed=0,
        N_rand=64, chunk=256, N_samples=4, N_importance=4,
        use_viewdirs=True, multires=2, multires_views=2,
        mode="c2f", coarse_n_voxels=1000, fine_n_voxels=2000,
        coarse_app_n_comp=[2, 2, 2], fine_app_n_comp=[2, 2, 2],
        coarse_hidden_dim=8, coarse_hidden_dim_color=8,
        fine_hidden_dim=8, fine_hidden_dim_color=8,
        fine_geo_feat_dim=8, coarse_app_dim=4, fine_app_dim=4,
        kernel_type="none", no_wandb=True,
        events_tms_unit="us", events_tms_files_unit="us",
        render_only=True, render_test=True,
    )
    train(default_args(**kw))
    outdir = os.path.join(str(tmp_path), "logs", "ro",
                          "renderonly_test_000000")
    assert os.path.isdir(outdir)
    assert os.path.exists(os.path.join(outdir, "000.png"))
    assert os.path.exists(os.path.join(outdir, "disp.npy"))
    # version suffix on re-run (never overwrite)
    train(default_args(**kw))
    assert os.path.isdir(outdir + "_ver1")
