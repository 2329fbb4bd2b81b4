"""LLFF pose math: averaging, recentering, spherification, render paths,
and a vectorized SLERP+cubic pose interpolator.

Host-side numpy, run once at dataset-build time. Behavior mirrors
ref: utils/data.py; the recenter/spherify functions expose a replayable
partial *state* so the exact same transform can be re-applied to other pose
sets (event poses), matching ref: utils/data.py:167-253.
"""

from __future__ import annotations

import numpy as np
from scipy.interpolate import interp1d
from scipy.spatial.transform import Rotation, Slerp


def is_pure_rotation_matrix(M: np.ndarray) -> bool:
    """Batched rotation-purity check (ref: utils/data.py:9-31)."""
    if M.shape[-2] != M.shape[-1]:
        return False
    if not np.all(np.isclose(np.linalg.det(M), 1.0)):
        return False
    MT = np.swapaxes(M, -2, -1)
    return bool(np.allclose(MT, np.linalg.inv(M), atol=5e-7))


def normalize(x):
    return x / np.linalg.norm(x)


def viewmatrix(z, up, pos):
    """Build a camera-to-world [3,4] from forward z, up hint, position
    (ref: utils/data.py:119-125)."""
    vec2 = normalize(z)
    vec0 = normalize(np.cross(up, vec2))
    vec1 = normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, pos], 1)


def poses_avg(poses):
    """Average pose of an LLFF [N,3,5] pose stack (ref: utils/data.py:128-136)."""
    hwf = poses[0, :3, -1:]
    center = poses[:, :3, 3].mean(0)
    vec2 = normalize(poses[:, :3, 2].sum(0))
    up = poses[:, :3, 1].sum(0)
    return np.concatenate([viewmatrix(vec2, up, center), hwf], 1)


def recenter_poses(poses, c2w=None, return_c2w=False):
    """Recenter poses about their average; pass ``c2w`` to replay a previous
    recenter exactly (ref: utils/data.py:167-183)."""
    poses_ = poses + 0
    bottom = np.reshape([0, 0, 0, 1.0], [1, 4])
    if c2w is None:
        c2w = poses_avg(poses)
        c2w = np.concatenate([c2w[:3, :4], bottom], -2)
    bottom = np.tile(np.reshape(bottom, [1, 1, 4]), [poses.shape[0], 1, 1])
    hom = np.concatenate([poses[:, :3, :4], bottom], -2)
    hom = np.linalg.inv(c2w) @ hom
    poses_[:, :3, :4] = hom[:, :3, :4]
    if return_c2w:
        return poses_, c2w
    return poses_


def spherify_poses(poses, bds, state=None, return_state=False,
                   render_path=True):
    """Spherify a 360 capture; the 5-tuple ``state`` makes the transform
    replayable on other pose sets (ref: utils/data.py:189-253).

    ``render_path=False`` skips building the 120-pose circular render path
    (pure replay — the event-batch pose interpolation calls this per
    prefetched batch and only needs ``poses_reset``)."""
    c2w, up, sc, radcircle, zh = state if state is not None else [None] * 5

    def p34_to_44(p):
        return np.concatenate(
            [p, np.tile(np.reshape(np.eye(4)[-1, :], [1, 1, 4]),
                        [p.shape[0], 1, 1])], 1)

    rays_d = poses[:, :3, 2:3]
    rays_o = poses[:, :3, 3:4]

    if state is None:
        def min_line_dist(rays_o, rays_d):
            A_i = np.eye(3) - rays_d * np.transpose(rays_d, [0, 2, 1])
            b_i = -A_i @ rays_o
            return np.squeeze(
                -np.linalg.inv((np.transpose(A_i, [0, 2, 1]) @ A_i).mean(0))
                @ b_i.mean(0))

        center = min_line_dist(rays_o, rays_d)
        up = (poses[:, :3, 3] - center).mean(0)
        vec0 = normalize(up)
        vec1 = normalize(np.cross([0.1, 0.2, 0.3], vec0))
        vec2 = normalize(np.cross(vec0, vec1))
        c2w = np.stack([vec1, vec2, vec0, center], 1)

    poses_reset = np.linalg.inv(p34_to_44(c2w[None])) @ p34_to_44(poses[:, :3, :4])

    if state is None:
        rad = np.sqrt(np.mean(np.sum(np.square(poses_reset[:, :3, 3]), -1)))
        sc = 1.0 / rad
        poses_reset[:, :3, 3] *= sc
        bds = bds * sc
        rad *= sc
        centroid = np.mean(poses_reset[:, :3, 3], 0)
        zh = centroid[2]
        radcircle = np.sqrt(rad ** 2 - zh ** 2)
    else:
        poses_reset[:, :3, 3] *= sc
        bds = bds * sc

    if render_path:
        new_poses = []
        for th in np.linspace(0.0, 2.0 * np.pi, 120):
            camorigin = np.array([radcircle * np.cos(th),
                                  radcircle * np.sin(th), zh])
            up_ = np.array([0, 0, -1.0])
            vec2 = normalize(camorigin)
            vec0 = normalize(np.cross(vec2, up_))
            vec1 = normalize(np.cross(vec2, vec0))
            new_poses.append(np.stack([vec0, vec1, vec2, camorigin], 1))
        new_poses = np.stack(new_poses, 0)

        new_poses = np.concatenate(
            [new_poses,
             np.broadcast_to(poses[0, :3, -1:],
                             new_poses[:, :3, -1:].shape)], -1)
    else:
        new_poses = None
    poses_reset = np.concatenate(
        [poses_reset[:, :3, :4],
         np.broadcast_to(poses[0, :3, -1:], poses_reset[:, :3, -1:].shape)], -1)

    if return_state:
        return poses_reset, new_poses, bds, [c2w, up, sc, radcircle, zh]
    return poses_reset, new_poses, bds


def render_path_spiral(c2w, up, rads, focal, zdelta, zrate, rots, N):
    """Spiral novel-view path (ref: utils/data.py:139-151)."""
    render_poses = []
    rads = np.array(list(rads) + [1.0])
    hwf = c2w[:, 4:5]
    for theta in np.linspace(0.0, 2.0 * np.pi * rots, N + 1)[:-1]:
        c = np.dot(c2w[:3, :4],
                   np.array([np.cos(theta), -np.sin(theta),
                             -np.sin(theta * zrate), 1.0]) * rads)
        z = normalize(c - np.dot(c2w[:3, :4], np.array([0, 0, -focal, 1.0])))
        render_poses.append(np.concatenate([viewmatrix(z, up, c), hwf], 1))
    return render_poses


def render_path_epi(c2w, up, rads, N):
    """Horizontal EPI sweep path (ref: utils/data.py:154-164)."""
    render_poses = []
    hwf = c2w[:, 4:5]
    for theta in np.linspace(-1, 1, N + 1)[:-1]:
        c = np.dot(c2w[:3, :4], np.array([theta, 0, 0, 1.0]) * rads)
        z = normalize(np.dot(c2w[:3, :4], np.array([0, 0, 1, 0.0])))
        render_poses.append(np.concatenate([viewmatrix(z, up, c), hwf], 1))
    return render_poses


def get_slerp_interpolator(tss, rots, trans):
    """SLERP rotations + cubic translations interpolator factory
    (ref: utils/data.py:34-61).

    Returns ``f(t) -> (rots [N,3,3], trans [N,3])``. Built on scipy for the
    knots; evaluation is fully vectorized so batch queries are cheap.
    """
    rot_interp = Slerp(tss, Rotation.from_matrix(rots))
    trans_interp = interp1d(x=tss, y=trans, axis=0, kind="cubic",
                            bounds_error=True)

    def interpolator(tq):
        tq = np.clip(np.asarray(tq, dtype=np.float64), tss[0], tss[-1])
        return rot_interp(tq).as_matrix(), trans_interp(tq)

    return interpolator
