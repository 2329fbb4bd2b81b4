"""Bitwise training determinism: the explicit-PRNG design replaces the
reference's deterministic-algorithms regime (ref: utils/misc.py:180-195,
options.py:5), so two runs with the same seed must match exactly."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from synthetic import make_synthetic_scene  # noqa: E402

from evdeblurnerf_tpu.config import default_args  # noqa: E402
from evdeblurnerf_tpu.train.loop import train  # noqa: E402

pytestmark = pytest.mark.slow


def _args(scene_dir, logdir, name):
    return default_args(
        expname=name, basedir=logdir, datadir=scene_dir, factor=None,
        llffhold=3, seed=3, N_rand=64, chunk=256, N_samples=4,
        N_importance=4, use_viewdirs=True, multires=2, multires_views=2,
        lrate=5e-3, lrate_decay=10, N_iters=10, raw_noise_std=1.0,
        mode="c2f", coarse_n_voxels=1000, fine_n_voxels=2000,
        coarse_app_n_comp=[2, 2, 2], fine_app_n_comp=[2, 2, 2],
        coarse_hidden_dim=8, coarse_hidden_dim_color=8,
        fine_hidden_dim=8, fine_hidden_dim_color=8,
        fine_geo_feat_dim=8, coarse_app_dim=4, fine_app_dim=4,
        kernel_type="RBK", kernel_ptnum=3, kernel_rbk_use_origin=True,
        kernel_img_embed=8, kernel_rbk_extra_feat_ch=0, kernel_start_iter=3,
        events_tms_unit="us", events_tms_files_unit="us", no_wandb=True,
        no_reload=True, i_print=5, i_tensorboard=10 ** 9,
        i_weights=10 ** 9, i_testset=10 ** 9, i_video=10 ** 9)


def test_same_seed_bitwise_identical(tmp_path):
    import jax

    scene = str(tmp_path / "scene")
    os.makedirs(scene)
    make_synthetic_scene(scene)

    s1 = train(_args(scene, str(tmp_path / "l1"), "d1"))
    s2 = train(_args(scene, str(tmp_path / "l2"), "d2"))
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
