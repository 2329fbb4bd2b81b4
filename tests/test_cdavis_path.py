"""CDAVIS real-data path: rectified float event coordinates via ev_map,
Bayer color events, llffhold_end split, color-weighted EGM — end to end
(BASELINE config 5)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from synthetic import make_synthetic_scene  # noqa: E402

from evdeblurnerf_tpu.config import default_args  # noqa: E402
from evdeblurnerf_tpu.data import LLFFDataset, LLFFEventsDataset  # noqa: E402


@pytest.fixture(scope="module")
def cdavis_scene(tmp_path_factory):
    basedir = tmp_path_factory.mktemp("cdavis")
    truth = make_synthetic_scene(str(basedir), rectified_coords=True)
    return str(basedir), truth


def cdavis_args(scene_dir, logdir, **overrides):
    base = dict(
        expname="cdavis", basedir=logdir, datadir=scene_dir, factor=None,
        llffhold=2, llffhold_end=True, pose_transform_allknown=True,
        seed=0, N_rand=64, chunk=256, N_samples=4, N_importance=4,
        use_viewdirs=True, multires=2, multires_views=2,
        lrate=5e-3, lrate_decay=10, N_iters=6,
        mode="c2f", coarse_n_voxels=1000, fine_n_voxels=2000,
        coarse_app_n_comp=[2, 2, 2], fine_app_n_comp=[2, 2, 2],
        coarse_hidden_dim=8, coarse_hidden_dim_color=8,
        fine_hidden_dim=8, fine_hidden_dim_color=8,
        fine_geo_feat_dim=8, coarse_app_dim=4, fine_app_dim=4,
        kernel_type="RBK", kernel_ptnum=3, kernel_rbk_use_origin=True,
        kernel_img_embed=8, kernel_rbk_extra_feat_ch=0, kernel_start_iter=2,
        use_events=True, add_event_egm=True, events_N_rand=32,
        event_egm_use_colorevents=True,
        event_egm_use_color_weights=[0.4, 0.2, 0.4],
        event_egm_color_weights_start_iter=2,
        add_event_egm_stages=["stage0", "stage1"],
        tone_mapping_events_type="learn",
        tone_mapping_events_add_bii="color-pos-neg",
        events_tms_unit="us", events_tms_files_unit="us",
        no_wandb=True, i_print=2, i_tensorboard=10 ** 9,
        i_weights=10 ** 9, i_testset=10 ** 9, i_video=10 ** 9,
    )
    base.update(overrides)
    return default_args(**base)


def test_float_coords_and_color_map(cdavis_scene, tmp_path):
    scene_dir, _ = cdavis_scene
    args = cdavis_args(scene_dir, str(tmp_path))
    llff = LLFFDataset(args, scene_dir, factor=None,
                       pose_transform_allknown=True)
    # llffhold_end: the LAST llffhold views are held out
    assert list(llff.i_test) == [4, 5]

    ev = LLFFEventsDataset(
        args, scene_dir, llff.h, llff.w, llff.K, factor=None,
        bd_scale=llff.scale, closest_bds=llff.closest_bds,
        furthest_bds=llff.furthest_bds,
        recenter_partial=llff.recenter_partial,
        spherify_partial=llff.spherify_partial,
        events_tms_unit="us", events_tms_files_unit="us", color_events=True)
    assert not ev.integer_coords          # float rectified coords detected
    assert ev.id_to_color_map is not None
    # every event coordinate id got exactly one Bayer color
    ev_ids = np.unique(ev.events[:, 0]).astype(np.int64)
    assert (ev.id_to_color_map[ev_ids].sum(axis=-1) == 1).all()

    batch = ev.batch(np.arange(16))
    assert batch["events_color_map"].shape == (16, 3)
    assert (batch["events_color_map"].sum(-1) == 1).all()
    # float coords: rays built without the +0.5 half-pixel recentering
    # (ref: data/loader_events.py:290-293, add_halfpix=integer_coords)
    assert np.isfinite(batch["events_rays_start"]).all()


@pytest.mark.slow
def test_cdavis_end_to_end(cdavis_scene, tmp_path):
    from evdeblurnerf_tpu.train.loop import train

    scene_dir, _ = cdavis_scene
    state = train(cdavis_args(scene_dir, str(tmp_path)))
    assert int(state.step) == 6
    import jax

    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]
    assert all(np.isfinite(x).all() for x in leaves)
