"""SE(3) / SO(3) exponential maps, jit-safe jax.numpy.

Math follows Modern Robotics eqns 3.51 / 3.88, matching the reference's
torch implementation (ref: utils/rigid_warping.py:5-155) including the
``theta + 1e-10`` normalization epsilon used by the RBK blur kernel.
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(w):
    """[..., 3] -> [..., 3, 3] cross-product matrix
    (ref: utils/rigid_warping.py:112-132)."""
    zeros = jnp.zeros_like(w[..., 0])
    row0 = jnp.stack([zeros, -w[..., 2], w[..., 1]], -1)
    row1 = jnp.stack([w[..., 2], zeros, -w[..., 0]], -1)
    row2 = jnp.stack([-w[..., 1], w[..., 0], zeros], -1)
    return jnp.stack([row0, row1, row2], -2)


def exp_so3(w, theta):
    """Rodrigues rotation about unit axis ``w`` by angle ``theta``
    (ref: utils/rigid_warping.py:95-110)."""
    W = skew(w)
    theta = theta[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + jnp.sin(theta) * W + (1.0 - jnp.cos(theta)) * (W @ W)


def exp_se3(S, theta):
    """Screw-axis exponential map -> [..., 4, 4]
    (ref: utils/rigid_warping.py:72-93)."""
    w, v = S[..., :3], S[..., 3:]
    W = skew(w)
    R = exp_so3(w, theta)
    theta_ = theta[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=S.dtype), W.shape)
    p = (theta_ * eye + (1.0 - jnp.cos(theta_)) * W
         + (theta_ - jnp.sin(theta_)) * (W @ W)) @ v[..., None]
    return rp_to_se3(R, p)


def rp_to_se3(R, p):
    """(R [...,3,3], p [...,3,1]) -> homogeneous [...,4,4]
    (ref: utils/rigid_warping.py:134-148)."""
    Rp = jnp.concatenate([R, p], -1)
    bottom = jnp.zeros_like(Rp[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([Rp, bottom], -2)


def se3_transform_from_rot_trans(rot, trans, eps=1.0e-10):
    """Screw-motion transform from raw (rot, trans) 3-vectors
    (ref: utils/rigid_warping.py:18-30): theta = |rot|, the axis and
    translation are normalized by theta (+eps)."""
    theta = jnp.linalg.norm(rot, axis=-1) + eps
    rot_n = rot / theta[..., None]
    trans_n = trans / theta[..., None]
    screw = jnp.concatenate([rot_n, trans_n], -1)
    return exp_se3(screw, theta)


def to_homogeneous(v):
    return jnp.concatenate([v, jnp.ones_like(v[..., :1])], -1)


def from_homogeneous(v):
    return v[..., :3] / v[..., -1:]


def se3_warp_points(pts, transform):
    """Apply [...,4,4] transforms to [...,3] points
    (ref: utils/rigid_warping.py:32-49)."""
    warped = (transform @ to_homogeneous(pts)[..., None])[..., 0]
    return from_homogeneous(warped)


def se3_warp_pose(poses, transform):
    """Compose transforms with homogeneous poses
    (ref: utils/rigid_warping.py:51-64)."""
    return transform @ poses
