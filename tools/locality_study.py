#!/usr/bin/env python
"""Locality study for a tiled tri-plane gather (round-3 kernel design).

Question: after sorting the step's rays by a Morton code of their midpoint
NDC position, how big are the plane-space bounding boxes of
(ray-block x sample-window) point groups, per projection, at the paper's
grid resolutions? If a fixed VMEM tile covers ~all groups, the gather (and
its scatter VJP) can run as per-group tile DMAs + in-VMEM interpolation
instead of per-point row gathers.

Uses the synthetic scene's real pixel rays + RBK-style warped variants
(small SE3 perturbations), NDC projection, stratified + importance-style
depths — the actual geometry the train step sees.
"""

import sys

import numpy as np

sys.path.insert(0, "tests")


def morton2(x, y, bits=16):
    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << 8)) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << 4)) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << 2)) & np.uint64(0x3333333333333333)
        v = (v | (v << 1)) & np.uint64(0x5555555555555555)
        return v
    return spread(x) | (spread(y) << np.uint64(1))


def main():
    from evdeblurnerf_tpu.utils.rays import get_rays_np

    rng = np.random.default_rng(0)
    H, W, focal = 480, 640, 500.0
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1.0]])

    # 30 random-ish forward-facing poses (LLFF style)
    n_imgs = 30
    poses = []
    for i in range(n_imgs):
        angle = rng.normal(0, 0.05, 3)
        cx, sx = np.cos(angle), np.sin(angle)
        R = (np.array([[1, 0, 0], [0, cx[0], -sx[0]], [0, sx[0], cx[0]]])
             @ np.array([[cx[1], 0, sx[1]], [0, 1, 0], [-sx[1], 0, cx[1]]]))
        t = rng.normal(0, 0.08, 3) * np.array([1, 1, 0.3])
        poses.append(np.concatenate([R, t[:, None]], 1))
    poses = np.stack(poses)

    N_RAND, PTNUM = 1024, 10
    img_idx = rng.integers(0, n_imgs, N_RAND)
    px = rng.integers(0, W, N_RAND)
    py = rng.integers(0, H, N_RAND)

    rays_o = np.zeros((N_RAND, 3), np.float32)
    rays_d = np.zeros((N_RAND, 3), np.float32)
    for i in range(N_RAND):
        ro, rd = get_rays_np(H, W, K, poses[img_idx[i]])
        rays_o[i] = ro[py[i], px[i]]
        rays_d[i] = rd[py[i], px[i]]

    # RBK-ish warp: ptnum small SE3 perturbations per ray (rot ~0.5deg,
    # trans ~1e-2 — converged-kernel scale)
    all_o, all_d = [rays_o], [rays_d]
    for p in range(PTNUM - 1):
        ang = rng.normal(0, 0.01, 3)
        Rm = (np.eye(3) + np.cross(np.eye(3), ang))
        all_o.append(rays_o + rng.normal(0, 0.01, 3).astype(np.float32))
        all_d.append(rays_d @ Rm.T.astype(np.float32))
    rays_o = np.concatenate(all_o)
    rays_d = np.concatenate(all_d)
    Nr = rays_o.shape[0]

    # NDC (ndc=True path)
    t = -(1.0 + rays_o[:, 2]) / rays_d[:, 2]
    rays_o = rays_o + t[:, None] * rays_d
    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[:, 0] / rays_o[:, 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[:, 1] / rays_o[:, 2]
    o2 = 1.0 + 2.0 / rays_o[:, 2]
    d0 = (-1.0 / (W / (2.0 * focal))
          * (rays_d[:, 0] / rays_d[:, 2] - rays_o[:, 0] / rays_o[:, 2]))
    d1 = (-1.0 / (H / (2.0 * focal))
          * (rays_d[:, 1] / rays_d[:, 2] - rays_o[:, 1] / rays_o[:, 2]))
    d2 = -2.0 / rays_o[:, 2]
    ndc_o = np.stack([o0, o1, o2], -1)
    ndc_d = np.stack([d0, d1, d2], -1)

    S = 128
    z = np.sort(rng.uniform(0, 1, (Nr, S)).astype(np.float32), axis=1)
    pts = ndc_o[:, None, :] + ndc_d[:, None, :] * z[..., None]   # [Nr,S,3]

    aabb_min = np.array([-1.6, -1.7, -1.0])
    aabb_max = np.array([1.7, 1.6, 1.0])
    xyz = np.clip((pts - aabb_min) / (aabb_max - aabb_min), 0, 1)  # [0,1]

    # Morton sort rays by midpoint xy
    mid = xyz[:, S // 2, :]
    code = morton2((mid[:, 0] * 65535).astype(np.uint32),
                   (mid[:, 1] * 65535).astype(np.uint32))
    order = np.argsort(code)
    xyz = xyz[order]

    for grid, tag in ((512, "fine"), (256, "coarse")):
        print(f"--- {tag} grid {grid}^2 planes ---")
        for proj, (a, b) in enumerate(((0, 1), (0, 2), (1, 2))):
            u = xyz[..., a] * (grid - 1)
            v = xyz[..., b] * (grid - 1)
            for RB, SW in ((8, 16), (16, 8), (8, 32), (32, 128)):
                nb = Nr // RB
                ns = S // SW
                uu = u[:nb * RB].reshape(nb, RB, ns, SW)
                vv = v[:nb * RB].reshape(nb, RB, ns, SW)
                du = uu.max(axis=(1, 3)) - uu.min(axis=(1, 3))
                dv = vv.max(axis=(1, 3)) - vv.min(axis=(1, 3))
                # tile sizes covering 50/95/99/100% of groups
                q = lambda x, p: np.percentile(x, p)
                print(f"  proj{proj} rays{RB}x samp{SW}: "
                      f"bbox u p50/p95/p99/max = "
                      f"{q(du,50):.0f}/{q(du,95):.0f}/{q(du,99):.0f}/"
                      f"{du.max():.0f}  "
                      f"v = {q(dv,50):.0f}/{q(dv,95):.0f}/{q(dv,99):.0f}/"
                      f"{dv.max():.0f}")


if __name__ == "__main__":
    main()
