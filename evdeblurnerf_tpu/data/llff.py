"""LLFF frame dataset + ray samplers (host side, numpy).

TPU-native counterpart of ref: data/loader.py and data/sampler_image_batch.py.
Design differences:

* pure-numpy batch assembly feeding fixed-shape device arrays through
  :mod:`evdeblurnerf_tpu.data.pipeline` (no torch DataLoader / worker
  processes — batch assembly is a vectorized gather, prefetch is a thread);
* image downscaling uses cv2 INTER_AREA in-process, cached to
  ``images_{factor}/`` on disk, replacing the reference's ImageMagick
  ``_minify`` shell-out (ref: utils/data.py:64-116) — existing minified
  directories are used as-is.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional

import numpy as np

from ..utils import pose as pose_utils
from ..utils.rays import HALF_PIX, get_rays_pix_np
from ..utils.voxels import get_bbox3d_for_llff


def imread(path: str) -> np.ndarray:
    import imageio.v2 as imageio

    if path.endswith("png"):
        try:
            return imageio.imread(path, ignoregamma=True)
        except TypeError:       # newer imageio dropped the flag
            return imageio.imread(path)
    return imageio.imread(path)


def minify_images(basedir: str, factor: int, filt: str = "area") -> str:
    """Ensure ``images_{factor}/`` exists, generating it from ``images/``
    if needed; returns the folder name. Existing minified folders are
    reused verbatim whatever produced them (exactly like the reference's
    ``_minify``, ref: utils/data.py:64-77).

    ``filt``: "area" (cv2 INTER_AREA, the fast default) or "lanczos"
    (PIL LANCZOS — approximates the reference's ImageMagick ``mogrify
    -resize`` shell-out, whose default downscale filter is Lanczos; use
    for real-data runs where input parity at the noise floor matters —
    measured ~34 dB INTER_AREA-vs-Lanczos delta on noisy content,
    tools/minify_delta.py)."""
    name = f"images_{factor}"
    imgdir = os.path.join(basedir, name)
    if os.path.exists(imgdir):
        return name
    srcdir = os.path.join(basedir, "images")
    if not os.path.exists(srcdir):
        raise FileNotFoundError(imgdir)
    os.makedirs(imgdir, exist_ok=True)
    files = [f for f in sorted(os.listdir(srcdir))
             if f.lower().endswith(("jpg", "jpeg", "png"))]
    for f in files:
        img = imread(os.path.join(srcdir, f))
        h, w = img.shape[:2]
        out_path = os.path.join(imgdir, os.path.splitext(f)[0] + ".png")
        if filt == "lanczos":
            from PIL import Image

            im = Image.fromarray(img).resize((w // factor, h // factor),
                                             Image.LANCZOS)
            im.save(out_path)
        elif filt == "area":
            import cv2

            out = cv2.resize(img, (w // factor, h // factor),
                             interpolation=cv2.INTER_AREA)
            cv2.imwrite(out_path, out[..., ::-1] if out.ndim == 3 else out)
        else:
            raise ValueError(f"unknown minify filter {filt!r}")
    return name


class LLFFDataset:
    """Loads an LLFF scene: minified images, poses, train/test split,
    recenter/spherify with replayable partial state, NDC bounds and the
    scene AABB (ref: data/loader.py:25-356)."""

    def __init__(self, args, basedir: str, factor: Optional[int] = 8,
                 recenter: bool = True, bd_factor: float = 0.75,
                 spherify: bool = False, path_epi: bool = False,
                 pose_transform_allknown: bool = False):
        self.args = args
        self.basedir = basedir
        self.factor = factor
        self.recenter = recenter
        self.bd_factor = bd_factor
        self.spherify = spherify
        self.path_epi = path_epi
        self.pose_transform_allknown = pose_transform_allknown

        data = self.load_data()
        self.factor = data["factor"]

        n_total = data["images"].shape[0]
        if args.llffhold_end:
            i_test = np.arange(n_total)[-args.llffhold:]
        else:
            i_test = np.arange(n_total)[::args.llffhold]
        i_train = np.array([i for i in range(n_total) if i not in i_test])
        self.i_train, self.i_val, self.i_test = i_train, i_test, i_test

        self.K = data["K"]
        self.images = data["images"][i_train]
        self.poses = data["poses"][i_train][:, :3, :4].astype(np.float32)
        self.pts0_images = None
        self.test_images = data["images"][i_test]
        self.test_poses = data["poses"][i_test][:, :3, :4].astype(np.float32)
        self.render_poses = data["render_poses"][:, :3, :4].astype(np.float32)

        self.scale = data["scale"]
        self.recenter_partial = data["recenter_partial"]
        self.spherify_partial = data["spherify_partial"]
        self.closest_bds = float(np.min(data["bds"]))
        self.furthest_bds = float(np.max(data["bds"]))

        self.n_imgs, self.h, self.w = self.images.shape[:3]
        self.n_rays = self.n_imgs * self.h * self.w

        if args.no_ndc:
            self.near = data.get("minbds", np.min(data["bds"])) * 0.9
            self.far = data.get("maxbds", np.max(data["bds"])) * 1.0
        else:
            self.near, self.far = 0.0, 1.0

        self.bounding_box = get_bbox3d_for_llff(
            data["poses"][:, :3, :4], data["poses"][0, :3, -1],
            near=0, far=1, is_ndc=not args.no_ndc)

    # ------------------------------------------------------------------
    # loading
    # ------------------------------------------------------------------
    def load_images(self, imgfolder: str):
        imgdir = os.path.join(self.basedir, imgfolder)
        if not os.path.exists(imgdir):
            raise FileNotFoundError(imgdir)
        files = [os.path.join(imgdir, f) for f in sorted(os.listdir(imgdir))
                 if f.lower().endswith(("jpg", "jpeg", "png"))]
        imgs = [imread(f)[..., :3].astype(np.float32) / 255.0 for f in files]
        imgs = np.stack(imgs, 0)
        if self.args.datadownsample > 0:
            import cv2

            s = 1.0 / self.args.datadownsample
            imgs = np.stack([cv2.resize(im, None, None, s, s, cv2.INTER_AREA)
                             for im in imgs], axis=0)
        return imgs, imgs[0].shape

    def load_poses(self, factor, imgshape, bd_factor=0.75, scale=None,
                   filename="poses_bounds.npy"):
        """(ref: data/loader.py:178-201): LLFF axis swap, hwf row update,
        bd-scaled translations."""
        poses_arr = np.load(os.path.join(self.basedir, filename))
        poses = poses_arr[:, :-2].reshape([-1, 3, 5])
        assert pose_utils.is_pure_rotation_matrix(poses[:, :3, :3])
        bds = poses_arr[:, -2:]
        poses[:, :2, 4] = np.array(imgshape[:2]).reshape([1, 2])
        poses[:, 2, 4] = poses[:, 2, 4] / factor
        poses = np.concatenate(
            [poses[..., 1:2], -poses[..., 0:1], poses[..., 2:]], -1)
        poses = poses.astype(np.float32)
        bds = bds.astype(np.float32)
        if scale is None:
            sc = 1.0 if bd_factor is None else 1.0 / (np.min(bds) * bd_factor)
        else:
            sc = scale
        poses[:, :3, 3] *= sc
        bds = bds * sc
        return poses, bds, sc

    def recenter_spherify_poses(self, poses, bds, recenter_partial=None,
                                spherify_partial=None):
        """(ref: data/loader.py:203-264) incl. the replay asserts."""
        avg_pose, spherify_state = None, None
        if self.recenter:
            if recenter_partial is not None:
                poses = pose_utils.recenter_poses(poses, c2w=recenter_partial)
                avg_pose = recenter_partial
            else:
                bck = poses.copy()
                poses, avg_pose = pose_utils.recenter_poses(poses,
                                                            return_c2w=True)
                assert np.allclose(
                    pose_utils.recenter_poses(bck, c2w=avg_pose), poses)

        if self.spherify:
            if spherify_partial is not None:
                poses, render_poses, bds = pose_utils.spherify_poses(
                    poses, bds, state=spherify_partial)
                spherify_state = spherify_partial
            else:
                bck_p, bck_b = poses.copy(), bds.copy()
                poses, render_poses, bds, spherify_state = \
                    pose_utils.spherify_poses(poses, bds, return_state=True)
                p2, r2, b2 = pose_utils.spherify_poses(bck_p, bck_b,
                                                       state=spherify_state)
                assert (np.allclose(poses, p2) and np.allclose(render_poses, r2)
                        and np.allclose(bds, b2))
        else:
            c2w = pose_utils.poses_avg(poses)
            up = pose_utils.normalize(poses[:, :3, 1].sum(0))
            close_depth, inf_depth = bds.min() * 0.9, bds.max() * 5.0
            dt = 0.75
            focal = 1.0 / ((1.0 - dt) / close_depth + dt / inf_depth)
            focal = focal * self.args.render_focuspoint_scale
            zdelta = close_depth * 0.2
            tt = poses[:, :3, 3]
            rads = np.percentile(np.abs(tt), 90, 0)
            rads[0] *= self.args.render_radius_scale
            rads[1] *= self.args.render_radius_scale
            render_poses = pose_utils.render_path_spiral(
                c2w, up, rads, focal, zdelta, zrate=0.5, rots=2, N=120)
            if self.path_epi:
                rads[0] = rads[0] / 2
                render_poses = pose_utils.render_path_epi(c2w, up, rads[0], 120)

        render_poses = np.array(render_poses).astype(np.float32)
        return poses, render_poses, avg_pose, spherify_state

    def get_pose_transform_data(self, factor, imgshape):
        """Derive the shared scale + recenter/spherify state, optionally from
        the full known-pose set (ref: data/loader.py:266-276)."""
        filename = ("all_poses_bounds.npy" if self.pose_transform_allknown
                    else "poses_bounds.npy")
        poses, bds, scale = self.load_poses(factor, imgshape,
                                            bd_factor=self.bd_factor,
                                            filename=filename)
        _, _, recenter_partial, spherify_partial = \
            self.recenter_spherify_poses(poses, bds)
        return scale, recenter_partial, spherify_partial, np.min(bds), np.max(bds)

    def load_data(self):
        data = {}
        if self.factor is not None:
            folder = minify_images(self.basedir, self.factor,
                                   filt=getattr(self.args, "minify_filter",
                                                "area"))
            factor = self.factor
        else:
            folder, factor = "images", 1
        data["images"], imgshape = self.load_images(folder)
        (scale, recenter_partial, spherify_partial, data["minbds"],
         data["maxbds"]) = self.get_pose_transform_data(factor, imgshape)

        poses, bds, scale2 = self.load_poses(factor, imgshape,
                                             bd_factor=self.bd_factor,
                                             scale=scale)
        assert scale2 == scale
        assert poses.shape[0] == data["images"].shape[0], \
            f"imgs {data['images'].shape[0]} != poses {poses.shape[0]}"
        data["bds"], data["scale"] = bds, scale

        (data["poses"], data["render_poses"], data["recenter_partial"],
         data["spherify_partial"]) = self.recenter_spherify_poses(
            poses, bds, recenter_partial=recenter_partial,
            spherify_partial=spherify_partial)
        data["render_poses"] = data["render_poses"][:, :3, :4]

        H, W, focal = data["poses"][0, :3, -1]
        # scales are identically 1 when --datadownsample > 0 (the hwf row
        # already holds the downsampled shape), so focal stays uncorrected
        # for the extra downsample — the reference behaves the same
        # (loader.py:167-171, 315-317); see docs/PARITY.md
        H_scale, W_scale = imgshape[0] / H, imgshape[1] / W
        data["K"] = np.array([[focal * W_scale, 0, 0.5 * W * W_scale],
                              [0, focal * H_scale, 0.5 * H * H_scale],
                              [0, 0, 1]])
        data["factor"] = factor
        return data

    # ------------------------------------------------------------------
    # batch assembly (ref: data/loader.py:325-356)
    # ------------------------------------------------------------------
    def set_pts0_prior(self, pts0_images: np.ndarray):
        pts0_images = np.asarray(pts0_images, dtype=np.float32)
        assert pts0_images.shape[0] == self.images.shape[0]
        self.pts0_images = pts0_images

    def __len__(self):
        return self.n_rays

    def batch(self, ray_ids: np.ndarray) -> dict:
        """Assemble a training ray batch from flat ray ids."""
        ray_ids = np.asarray(ray_ids)
        img_id, ray_y, ray_x = np.unravel_index(
            ray_ids, (self.n_imgs, self.h, self.w))
        poses = self.poses[img_id]
        rgbs = self.images[img_id, ray_y, ray_x]
        coords = np.stack([ray_x, ray_y], -1)
        rays_o, rays_d = get_rays_pix_np(coords, self.K, poses)

        out = {
            "rays": np.stack([rays_o, rays_d], axis=-1).astype(np.float32),
            "rays_x": (ray_x + HALF_PIX).astype(np.float32),
            "rays_y": (ray_y + HALF_PIX).astype(np.float32),
            "images_idx": img_id.astype(np.int32),
            "rgbsf": rgbs.reshape(-1, 3).astype(np.float32),
            "poses": poses.astype(np.float32),
        }
        if self.pts0_images is not None:
            out["rgbsf_pts0"] = self.pts0_images[img_id, ray_y, ray_x] \
                .reshape(-1, 3).astype(np.float32)
        return out

    __getitem__ = batch


class RandomRaySampler:
    """Epoch-permutation ray-id batches (torch RandomSampler + BatchSampler
    semantics, drop_last=True; ref: run_nerf.py:62-63)."""

    def __init__(self, n_rays: int, batch_size: int, seed: int = 0):
        self.n_rays = n_rays
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)

    def __iter__(self) -> Iterator[np.ndarray]:
        perm = self.rng.permutation(self.n_rays)
        n_full = self.n_rays // self.batch_size
        for i in range(n_full):
            yield perm[i * self.batch_size:(i + 1) * self.batch_size]


class ImageBatchSampler:
    """Draw each batch from only ``same_imgs_size`` images, without pixel
    reuse across an epoch (ref: data/sampler_image_batch.py:8-62)."""

    def __init__(self, num_imgs: int, same_imgs_size: int, batch_size: int,
                 image_resolution, seed: int = 0):
        assert batch_size % same_imgs_size == 0
        self.num_imgs = num_imgs
        self.batch_size = batch_size
        self.same_imgs_size = same_imgs_size
        self.image_w, self.image_h = image_resolution
        self.rng = np.random.default_rng(seed)

    def __iter__(self) -> Iterator[List[int]]:
        hw = self.image_h * self.image_w
        available = np.ones((self.num_imgs, hw), dtype=bool)
        img_batch = self.batch_size // self.same_imgs_size

        while True:
            counts = available.sum(axis=1)
            eligible = np.nonzero(counts >= img_batch)[0]
            if eligible.shape[0] < self.same_imgs_size:
                return
            img_idx = self.rng.choice(eligible, self.same_imgs_size,
                                      replace=False)
            rows = []
            for im in img_idx:
                pix = np.nonzero(available[im])[0]
                chosen = self.rng.choice(pix, img_batch, replace=False)
                available[im, chosen] = False
                rows.append(im * hw + chosen)
            yield np.concatenate(rows)
