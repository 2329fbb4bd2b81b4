"""Synthetic LLFF+events scene generator for tests.

Writes the exact on-disk layout the reference consumes
(ref: data/loader.py:178-201, data/loader_events.py:150-194):
``images_1/*.png`` + ``images_1/timestamps.npz``, ``poses_bounds.npy``,
``all_poses_bounds.npy``, ``all_timestamps.npy``, ``events.h5``.

The scene is a colored gradient sphere on a dark background seen by a
forward-facing rig translating along x; events are generated from the
log-intensity difference of consecutive renders, which makes the EGM data
physically consistent (enough) for smoke training.
"""

from __future__ import annotations

import os

import numpy as np


def _llff_ondisk_pose(c2w_final: np.ndarray, h: int, w: int,
                      focal: float) -> np.ndarray:
    """Invert the loader's axis swap (final = [p1, -p0, p2, p3, hwf]) so that
    loading reproduces ``c2w_final`` exactly (pre-scale)."""
    p = np.concatenate([
        -c2w_final[:, 1:2], c2w_final[:, 0:1], c2w_final[:, 2:4]], axis=1)
    hwf = np.array([h, w, focal], dtype=np.float64).reshape(3, 1)
    return np.concatenate([p, hwf], axis=1)          # [3, 5]


def _ray_box(rays_o, rays_d, lo, hi):
    """Slab-method ray/AABB hit. Returns (hit mask, t_near, entry-face
    normal) for axis-aligned box [lo, hi]; all inputs world-space."""
    inv = 1.0 / np.where(np.abs(rays_d) < 1e-9, 1e-9, rays_d)
    t0 = (lo - rays_o) * inv
    t1 = (hi - rays_o) * inv
    tmin_ax = np.minimum(t0, t1)
    tmax_ax = np.maximum(t0, t1)
    tn = tmin_ax.max(-1)
    tf = tmax_ax.min(-1)
    hit = (tf > np.maximum(tn, 1e-3))
    ax = np.argmax(tmin_ax, axis=-1)
    normal = np.zeros(rays_d.shape)
    idx = np.indices(ax.shape)
    normal[idx[0], idx[1], ax] = -np.sign(
        rays_d[idx[0], idx[1], ax])
    return hit, tn, normal


def _render_image(c2w: np.ndarray, h: int, w: int, focal: float,
                  geometry: str = "sphere") -> np.ndarray:
    """Tiny lambert-ish render: ``sphere`` = a unit sphere at (0, 0, -4)
    (the original fixture); ``boxes`` = two axis-aligned boxes at
    different depths above a ground plane — multiple occupied islands,
    large empty gaps, and a half-space floor, i.e. an occupancy/depth
    structure deliberately unlike the sphere's single centered blob
    (second-scene screen for the sampling-cull defaults)."""
    i, j = np.meshgrid(np.arange(w, dtype=np.float32),
                       np.arange(h, dtype=np.float32), indexing="xy")
    dirs = np.stack([(i + 0.5 - w / 2) / focal,
                     -(j + 0.5 - h / 2) / focal,
                     -np.ones_like(i)], -1)
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = np.broadcast_to(c2w[:3, 3], rays_d.shape).copy()
    img = np.stack([0.08 + 0.02 * i / w, 0.08 * np.ones_like(i),
                    0.10 + 0.02 * j / h], -1)
    light = np.array([0.40824829, 0.81649658, 0.40824829])

    if geometry == "sphere":
        center = np.array([0.0, 0.0, -4.0])
        radius = 1.2
        oc = rays_o - center
        b = np.sum(oc * rays_d, -1)
        c = np.sum(oc * oc, -1) - radius ** 2
        a = np.sum(rays_d * rays_d, -1)
        disc = b * b - a * c
        hit = disc > 0
        t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0.0))) / a, 0.0)
        pt = rays_o + t[..., None] * rays_d
        normal = (pt - center) / radius
        shade = np.clip(normal[..., 2] * 0.5 + 0.5, 0, 1)
        sphere_col = np.stack([0.9 * shade, 0.5 * shade + 0.2,
                               0.3 * shade], -1)
        img = np.where(hit[..., None], sphere_col, img)
    elif geometry == "boxes":
        t_best = np.full(i.shape, np.inf)
        for lo, hi, base in (
                (np.array([-1.5, -0.9, -4.3]), np.array([-0.3, 0.3, -3.4]),
                 np.array([0.85, 0.35, 0.25])),
                (np.array([0.2, -0.5, -5.6]), np.array([1.4, 0.9, -4.6]),
                 np.array([0.25, 0.55, 0.85]))):
            hit, tn, normal = _ray_box(rays_o, rays_d, lo, hi)
            closer = hit & (tn < t_best)
            shade = np.clip(normal @ light, 0.0, 1.0) * 0.7 + 0.3
            img = np.where(closer[..., None], base * shade[..., None], img)
            t_best = np.where(closer, tn, t_best)
        # ground plane y = -1.1 with a soft two-tone checker
        denom = np.where(np.abs(rays_d[..., 1]) < 1e-9, 1e-9, rays_d[..., 1])
        t_pl = (-1.1 - rays_o[..., 1]) / denom
        pl_hit = (t_pl > 1e-3) & (t_pl < t_best) & (t_pl < 8.0)
        px = rays_o[..., 0] + t_pl * rays_d[..., 0]
        pz = rays_o[..., 2] + t_pl * rays_d[..., 2]
        checker = ((np.floor(px * 1.5) + np.floor(pz * 1.5)) % 2)
        pl_col = np.where(checker[..., None] > 0.5,
                          np.array([0.55, 0.5, 0.45]),
                          np.array([0.35, 0.33, 0.3]))
        fade = np.clip(1.0 - (t_pl - 3.0) / 6.0, 0.3, 1.0)
        img = np.where(pl_hit[..., None], pl_col * fade[..., None], img)
    else:
        raise ValueError(f"unknown synthetic geometry {geometry!r}")
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def make_synthetic_scene(basedir: str, n_imgs: int = 6, h: int = 24,
                         w: int = 32, focal: float = 30.0,
                         poses_per_image: int = 4, exposure_frac: float = 0.5,
                         events_threshold: float = 0.2, seed: int = 0,
                         rectified_coords: bool = False,
                         geometry: str = "sphere"):
    """Write a synthetic scene under ``basedir``; returns a dict of the
    ground-truth arrays for assertions."""
    import cv2
    import h5py

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(basedir, "images_1"), exist_ok=True)
    os.makedirs(os.path.join(basedir, "images"), exist_ok=True)

    # camera path: translate along +x, slight y bob; look down -z
    n_all = n_imgs * poses_per_image
    all_t = np.linspace(0.0, 1.0, n_all)
    centers = np.stack([0.6 * all_t - 0.3,
                        0.05 * np.sin(all_t * 6.0),
                        np.zeros_like(all_t)], -1)
    c2ws = np.zeros((n_all, 3, 4))
    c2ws[:, :3, :3] = np.eye(3)
    c2ws[:, :3, 3] = centers

    near, far = 2.0, 7.0
    all_rows = np.stack([
        np.concatenate([_llff_ondisk_pose(c2ws[k], h, w, focal).ravel(),
                        [near, far]])
        for k in range(n_all)])
    np.save(os.path.join(basedir, "all_poses_bounds.npy"), all_rows)

    # image timestamps (us): one frame per poses_per_image knots
    t_us = (1000.0 + 1000.0 * np.arange(n_all)).astype(np.float64)
    np.save(os.path.join(basedir, "all_timestamps.npy"), t_us)
    img_knots = np.arange(n_imgs) * poses_per_image + poses_per_image // 2
    img_tms = t_us[img_knots]
    exp_half = 1000.0 * poses_per_image * exposure_frac / 2
    np.savez(os.path.join(basedir, "images_1", "timestamps.npz"),
             timestamps=img_tms,
             timestamps_start=img_tms - exp_half,
             timestamps_end=img_tms + exp_half)

    # blurry frames: average of renders across the exposure
    sharp, blurry = [], []
    for k in img_knots:
        subs = [_render_image(c2ws[np.clip(k + d, 0, n_all - 1)], h, w,
                              focal, geometry)
                for d in (-1, 0, 1)]
        sharp.append(subs[1])
        blurry.append(np.mean(subs, axis=0))
    images = np.stack(blurry)
    for i, img in enumerate(images):
        cv2.imwrite(os.path.join(basedir, "images_1", f"{i:03d}.png"),
                    (img[..., ::-1] * 255).astype(np.uint8))
        cv2.imwrite(os.path.join(basedir, "images", f"{i:03d}.png"),
                    (img[..., ::-1] * 255).astype(np.uint8))

    rows = all_rows[img_knots]
    np.save(os.path.join(basedir, "poses_bounds.npy"), rows)

    # events from log-intensity differences of a dense render sequence
    lum_w = np.array([0.299, 0.587, 0.114])
    xs, ys, ts, ps = [], [], [], []
    dense_t = np.linspace(t_us[0], t_us[-1], n_all * 4)
    prev_log = None
    prev_t = None
    for tq in dense_t:
        k = np.interp(tq, t_us, np.arange(n_all))
        k0 = int(np.floor(k))
        frac = k - k0
        c2w = c2ws[k0].copy()
        if k0 + 1 < n_all:
            c2w[:, 3] = (1 - frac) * c2ws[k0][:, 3] + frac * c2ws[k0 + 1][:, 3]
        img = _render_image(c2w, h, w, focal, geometry)
        log_img = np.log(img @ lum_w + 1e-3)
        if prev_log is not None:
            diff = log_img - prev_log
            n_ev = np.floor(np.abs(diff) / events_threshold).astype(np.int64)
            yy, xx = np.nonzero(n_ev)
            for y0, x0 in zip(yy, xx):
                cnt = min(int(n_ev[y0, x0]), 4)
                pol = 1 if diff[y0, x0] > 0 else -1
                tt = np.sort(rng.uniform(prev_t, tq, size=cnt))
                xs.extend([x0] * cnt)
                ys.extend([y0] * cnt)
                ts.extend(tt.tolist())
                ps.extend([pol] * cnt)
        prev_log, prev_t = log_img, tq

    order = np.argsort(np.asarray(ts, dtype=np.float64), kind="stable")
    xs_arr = np.asarray(xs, np.float64)[order]
    ys_arr = np.asarray(ys, np.float64)[order]
    if rectified_coords:
        # CDAVIS-style rectified float coordinates + the undistortion map
        # that produced them (ref: data/loader_events.py:221-232): pixel
        # (i, j) maps to rectified (i + dx(i,j), j + dy(i,j))
        def rect_x(i, j):
            return (i + 0.25 + 0.001 * j).astype(np.float32)

        def rect_y(i, j):
            return (j + 0.125 + 0.002 * i).astype(np.float32)

        xi, yi = xs_arr.astype(np.int64), ys_arr.astype(np.int64)
        xs_arr = rect_x(xi.astype(np.float64), yi.astype(np.float64))
        ys_arr = rect_y(xi.astype(np.float64), yi.astype(np.float64))
        ii, jj = np.meshgrid(np.arange(w, dtype=np.float64),
                             np.arange(h, dtype=np.float64), indexing="xy")
        np.savez(os.path.join(basedir, "ev_map.npz"),
                 inv_mapx=rect_x(ii, jj), inv_mapy=rect_y(ii, jj))
        with h5py.File(os.path.join(basedir, "events.h5"), "w") as f:
            f.create_dataset("x", data=xs_arr.astype(np.float32))
            f.create_dataset("y", data=ys_arr.astype(np.float32))
            f.create_dataset("t", data=np.asarray(ts, np.float64)[order])
            f.create_dataset("p", data=np.asarray(ps, np.int8)[order])
    else:
        with h5py.File(os.path.join(basedir, "events.h5"), "w") as f:
            f.create_dataset("x", data=xs_arr.astype(np.uint16))
            f.create_dataset("y", data=ys_arr.astype(np.uint16))
            f.create_dataset("t", data=np.asarray(ts, np.float64)[order])
            f.create_dataset("p", data=np.asarray(ps, np.int8)[order])

    return {"images": images, "sharp": np.stack(sharp), "c2ws": c2ws,
            "img_tms": img_tms, "n_events": len(xs)}
