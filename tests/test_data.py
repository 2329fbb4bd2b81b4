"""Data-layer tests: LLFF loader, samplers, event dataset, prefetcher."""

import os
import numpy as np
import pytest

from evdeblurnerf_tpu.config import default_args
from evdeblurnerf_tpu.data import (ImageBatchSampler, LLFFDataset,
                                   LLFFEventsDataset, Prefetcher,
                                   RandomRaySampler, endless)
from synthetic import make_synthetic_scene

N_IMGS, H, W = 6, 24, 32


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    basedir = tmp_path_factory.mktemp("scene")
    truth = make_synthetic_scene(str(basedir))
    return str(basedir), truth


def make_llff(scene_dir, **overrides):
    args = default_args(llffhold=3, factor=None, use_viewdirs=True,
                        events_tms_files_unit="us", events_tms_unit="us",
                        **overrides)
    ds = LLFFDataset(args, scene_dir, factor=None, recenter=True,
                     bd_factor=0.75, spherify=False)
    return args, ds


def test_llff_loading(scene):
    scene_dir, truth = scene
    args, ds = make_llff(scene_dir)
    assert ds.h == H and ds.w == W
    # llffhold=3: test views 0,3; train the other 4
    assert list(ds.i_test) == [0, 3]
    assert ds.n_imgs == 4
    assert ds.images.shape == (4, H, W, 3)
    assert ds.poses.shape == (4, 3, 4)
    # NDC bounds
    assert ds.near == 0.0 and ds.far == 1.0
    assert ds.render_poses.shape[0] == 120
    # pixel values round-trip through png within quantization
    np.testing.assert_allclose(ds.test_images[0], truth["images"][0],
                               atol=2 / 255)


def test_llff_batch(scene):
    scene_dir, _ = scene
    args, ds = make_llff(scene_dir)
    ids = np.array([0, 1, W, ds.n_rays - 1])
    batch = ds.batch(ids)
    assert batch["rays"].shape == (4, 3, 2)
    assert batch["rgbsf"].shape == (4, 3)
    assert batch["poses"].shape == (4, 3, 4)
    # ray 0 = image 0, pixel (0,0); +0.5 centering
    assert batch["rays_x"][0] == 0.5 and batch["rays_y"][0] == 0.5
    assert batch["images_idx"][0] == 0
    assert batch["images_idx"][-1] == ds.n_imgs - 1
    # ray dirs derive from the pose: origin equals pose translation
    np.testing.assert_allclose(batch["rays"][0, :, 0], ds.poses[0, :, 3],
                               atol=1e-6)


def test_random_sampler_covers_epoch():
    s = RandomRaySampler(100, 32, seed=1)
    batches = list(iter(s))
    assert len(batches) == 3
    ids = np.concatenate(batches)
    assert len(np.unique(ids)) == 96   # no repeats within the epoch


def test_image_batch_sampler():
    s = ImageBatchSampler(num_imgs=4, same_imgs_size=2, batch_size=8,
                          image_resolution=(6, 5), seed=0)
    seen = set()
    for batch in s:
        assert len(batch) == 8
        imgs = np.unique(np.asarray(batch) // 30)
        assert len(imgs) == 2
        for rid in batch:
            assert rid not in seen   # no pixel reuse across the epoch
            seen.add(rid)


def test_events_dataset(scene):
    scene_dir, truth = scene
    args, llff = make_llff(scene_dir, use_events=True)
    ev = LLFFEventsDataset(args, scene_dir, llff.h, llff.w, llff.K,
                           factor=None, bd_scale=llff.scale,
                           closest_bds=llff.closest_bds,
                           furthest_bds=llff.furthest_bds,
                           recenter_partial=llff.recenter_partial,
                           spherify_partial=llff.spherify_partial,
                           events_tms_unit="us", events_tms_files_unit="us")
    assert ev.events.shape[1] == 4
    assert len(ev) > 0
    batch = ev.batch(np.arange(16))
    assert batch["events_rays_start"].shape == (16, 3, 2)
    assert batch["events_rays_end"].shape == (16, 3, 2)
    assert np.isfinite(batch["events_rays_start"]).all()
    # polarity cumsums have the right signs
    assert (batch["events_pos_pol_cumsum"] >= 0).all()
    assert (batch["events_neg_pol_cumsum"] <= 0).all()
    assert ((batch["events_pos_pol_cumsum"] != 0)
            | (batch["events_neg_pol_cumsum"] != 0)).all()
    # start/end rays differ (the camera moved between the pair)
    assert not np.allclose(batch["events_rays_start"],
                           batch["events_rays_end"])
    # annealing step counter advanced
    assert ev.global_step == 1


def test_events_edi_prior(scene):
    scene_dir, truth = scene
    args, llff = make_llff(scene_dir, use_events=True)
    ev = LLFFEventsDataset(args, scene_dir, llff.h, llff.w, llff.K,
                           factor=None, bd_scale=llff.scale,
                           closest_bds=llff.closest_bds,
                           furthest_bds=llff.furthest_bds,
                           recenter_partial=llff.recenter_partial,
                           spherify_partial=llff.spherify_partial,
                           events_tms_unit="us", events_tms_files_unit="us")
    priors = ev.compute_edi_prior(llff.i_train, llff.images, steps=5,
                                  cpos=0.2, cneg=0.2)
    assert priors.shape == llff.images.shape
    assert np.isfinite(priors).all()
    # EDI should move the blurry frames toward the sharp ones on average
    blur_err = np.abs(llff.images - truth["sharp"][llff.i_train]).mean()
    edi_err = np.abs(priors - truth["sharp"][llff.i_train]).mean()
    assert edi_err < blur_err * 1.25   # at minimum it must not blow up
    llff.set_pts0_prior(priors)
    batch = llff.batch(np.arange(8))
    assert batch["rgbsf_pts0"].shape == (8, 3)


def test_prefetcher(scene):
    scene_dir, _ = scene
    args, ds = make_llff(scene_dir)
    sampler = endless(lambda: iter(RandomRaySampler(ds.n_rays, 64, seed=0)))
    with Prefetcher(lambda: ds.batch(next(sampler))) as pf:
        b1 = next(pf)
        b2 = next(pf)
    assert b1["rays"].shape == (64, 3, 2)
    assert not np.allclose(np.asarray(b1["rays"]), np.asarray(b2["rays"]))


def test_prefetcher_error_propagates():
    def boom():
        raise RuntimeError("producer failed")

    with Prefetcher(boom) as pf:
        with pytest.raises(RuntimeError, match="producer failed"):
            next(pf)


def test_minify_factor(scene, tmp_path):
    """factor=2 generates images_2/ via cv2 INTER_AREA and halves the
    resolution + intrinsics (replaces the reference's ImageMagick _minify)."""
    import shutil

    scene_dir, _ = scene
    copy_dir = str(tmp_path / "scene2")
    shutil.copytree(scene_dir, copy_dir)
    args = default_args(llffhold=3, factor=2, use_viewdirs=True,
                        events_tms_files_unit="us", events_tms_unit="us")
    ds = LLFFDataset(args, copy_dir, factor=2)
    assert os.path.exists(os.path.join(copy_dir, "images_2"))
    assert (ds.h, ds.w) == (12, 16)
    full = LLFFDataset(default_args(llffhold=3, factor=None), copy_dir,
                       factor=None)
    np.testing.assert_allclose(ds.K[0][0], full.K[0][0] / 2, rtol=1e-6)
    batch = ds.batch(np.arange(4))
    assert batch["rays"].shape == (4, 3, 2)


def test_minify_lanczos_filter(scene, tmp_path):
    """--minify_filter lanczos routes minification through PIL LANCZOS
    (approximating the reference's ImageMagick mogrify shell-out, ref:
    utils/data.py:64-116); existing minified folders are reused verbatim."""
    import shutil

    from PIL import Image

    from evdeblurnerf_tpu.data.llff import imread, minify_images

    scene_dir, _ = scene
    copy_dir = str(tmp_path / "scene_lz")
    shutil.copytree(scene_dir, copy_dir)
    shutil.rmtree(os.path.join(copy_dir, "images_2"), ignore_errors=True)
    args = default_args(llffhold=3, factor=2, use_viewdirs=True,
                        minify_filter="lanczos",
                        events_tms_files_unit="us", events_tms_unit="us")
    ds = LLFFDataset(args, copy_dir, factor=2)
    assert (ds.h, ds.w) == (12, 16)
    files = sorted(os.listdir(os.path.join(copy_dir, "images_2")))
    got = imread(os.path.join(copy_dir, "images_2", files[0]))
    src = sorted(os.listdir(os.path.join(copy_dir, "images")))
    src_img = imread(os.path.join(copy_dir, "images", src[0]))
    want = np.asarray(Image.fromarray(src_img).resize(
        (src_img.shape[1] // 2, src_img.shape[0] // 2), Image.LANCZOS))
    np.testing.assert_array_equal(got[..., :3], want[..., :3])
    # reuse semantics: a second build with the other filter must NOT
    # regenerate (exactly like the reference's _minify short-circuit)
    before = os.path.getmtime(os.path.join(copy_dir, "images_2", files[0]))
    minify_images(copy_dir, 2, filt="area")
    assert os.path.getmtime(
        os.path.join(copy_dir, "images_2", files[0])) == before


def test_successor_sidecar(scene, tmp_path):
    """tools/preprocess_events.py writes a successor sidecar the dataset
    loads instead of re-scanning (and ignores when stale)."""
    import shutil
    import subprocess
    import sys as _sys

    scene_dir, _ = scene
    copy_dir = str(tmp_path / "scene_sc")
    shutil.copytree(scene_dir, copy_dir)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [_sys.executable, os.path.join(repo, "tools", "preprocess_events.py"),
         copy_dir, "--events_tms_unit", "us"],
        check=True, capture_output=True)
    assert os.path.exists(os.path.join(copy_dir, "events_sucessor.npz")) or \
        os.path.exists(os.path.join(copy_dir, "events_successor.npz"))

    args, llff = make_llff(copy_dir, use_events=True)
    ev = LLFFEventsDataset(args, copy_dir, llff.h, llff.w, llff.K,
                           factor=None, bd_scale=llff.scale,
                           closest_bds=llff.closest_bds,
                           furthest_bds=llff.furthest_bds,
                           recenter_partial=llff.recenter_partial,
                           spherify_partial=llff.spherify_partial,
                           events_tms_unit="us", events_tms_files_unit="us")
    # cross-check sidecar-loaded graph against a fresh scan
    from evdeblurnerf_tpu.ops.events_native import compute_successor

    succ, cnt, _, _ = compute_successor(ev.events[:, 0])
    np.testing.assert_array_equal(ev.events[:, 3], succ)
    np.testing.assert_array_equal(ev.events_num_successors, cnt)


def test_endless_raises_on_empty_epoch():
    """An epoch sampler that yields nothing must raise, not busy-spin with
    the prefetch consumer blocked forever (batch size > dataset size)."""
    import pytest

    from evdeblurnerf_tpu.data.pipeline import endless

    g = endless(lambda: iter([]))
    with pytest.raises(ValueError, match="no batches"):
        next(g)


def test_spherify_render_path_false_replays_identically():
    """render_path=False (the per-batch replay fast path) returns the same
    replayed poses as the full call."""
    import numpy as np

    from evdeblurnerf_tpu.utils import pose as pose_utils

    rng = np.random.default_rng(0)
    # plausible c2w poses around a ring
    poses = []
    for th in np.linspace(0, 2 * np.pi, 7)[:-1]:
        o = np.array([np.cos(th), np.sin(th), 0.3]) * 3.0
        z = o / np.linalg.norm(o)
        x = np.cross(np.array([0, 0, 1.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        poses.append(np.stack([x, y, z, o], 1))
    poses = np.stack(poses).astype(np.float32)
    hwf = np.broadcast_to(np.array([[32.], [40.], [50.]], np.float32),
                          (poses.shape[0], 3, 1))
    poses = np.concatenate([poses, hwf], -1)
    bds = np.broadcast_to(np.array([[2.0, 6.0]], np.float32),
                          (poses.shape[0], 2)).copy()

    reset, new_poses, bds1, state = pose_utils.spherify_poses(
        poses, bds.copy(), return_state=True)
    r_full, n_full, b_full = pose_utils.spherify_poses(
        poses, bds.copy(), state=state)
    r_fast, n_fast, b_fast = pose_utils.spherify_poses(
        poses, bds.copy(), state=state, render_path=False)
    np.testing.assert_array_equal(r_full, r_fast)
    np.testing.assert_array_equal(b_full, b_fast)
    assert n_fast is None and n_full is not None


def test_boxes_geometry_scene(tmp_path):
    """The second synthetic geometry (two boxes + ground plane) writes a
    loadable scene whose images differ structurally from the sphere
    fixture — used by the second-scene cull screens (PERF_NOTES round 5)."""
    d = str(tmp_path / "boxes")
    truth = make_synthetic_scene(d, geometry="boxes")
    assert truth["n_events"] > 0
    _, ds = make_llff(d)
    assert ds.images.shape[0] > 0  # train split of the 6 frames
    imgs = truth["images"]
    # multiple occupied islands: left-red box, right-blue box, bright floor
    left = imgs[:, 8:16, 4:12].mean(axis=(0, 1, 2))
    right = imgs[:, 6:12, 22:30].mean(axis=(0, 1, 2))
    assert left[0] > left[2] and right[2] > right[0], (left, right)
    assert imgs[:, -4:, :].mean() > imgs[:, :4, :].mean()  # floor vs sky
    sph = make_synthetic_scene(str(tmp_path / "sph"))["images"]
    assert np.abs(sph - imgs).mean() > 0.02
