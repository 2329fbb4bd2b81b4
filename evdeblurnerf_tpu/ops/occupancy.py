"""Occupancy bit-grid for empty-space culling of the coarse pass.

TPU-native approximation with no reference counterpart (the reference
evaluates every stratified coarse sample through the voxel grids,
ref: networks/renderer.py:183-185, networks/pdrf/voxnerf.py:132-151).
The step is row-issue-bound (~10-26 ns per gathered/scattered table row,
PERF_NOTES.md) and the coarse table scatter-backward alone is ~29% of the
culled train step — but most stratified samples land in empty space where
the learned density is exactly zero under relu. A periodically refreshed
G^3 occupancy grid (thresholded coarse alpha, dilated one voxel) marks
those regions; the renderer then evaluates the coarse field only at
occupied samples plus an evenly-strided probe floor, compacted per ray to
a fixed lane budget (``RenderConfig.coarse_cull_capacity``).

The grid is DERIVED state: a pure function of the coarse parameters,
recomputed every ``--occ_refresh_every`` steps and at resume — it is not
checkpointed. Lookup layout is ``[G*G, G]`` so a sample costs one row
take ([G] row by (ix*G+iy)) plus one lane pick (iz): ~1 row per sample vs
the 6 packed rows + 6 scatter rows it saves for a culled sample.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def voxel_centers(aabb, grid_size: int) -> jnp.ndarray:
    """World-space centers of a ``G^3`` grid over ``aabb``; [G, G, G, 3]
    with axes indexed (ix, iy, iz), matching :func:`lookup_bits`."""
    lo = jnp.asarray(aabb[0], jnp.float32)
    hi = jnp.asarray(aabb[1], jnp.float32)
    G = grid_size
    t = (jnp.arange(G, dtype=jnp.float32) + 0.5) / G        # cell centers
    axes = [lo[a] + t * (hi[a] - lo[a]) for a in range(3)]
    gx, gy, gz = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack([gx, gy, gz], axis=-1)


def grid_from_sigma(sigma, delta: float, eps: float,
                    dilate: int = 1) -> jnp.ndarray:
    """Raw coarse density [G, G, G] -> occupancy bits [G*G, G] (f32 0/1).

    ``alpha = 1 - exp(-relu(sigma) * delta) > eps`` (delta = the typical
    per-sample compositing interval, (far-near)/N_samples — the same alpha
    a sample of that spacing would contribute, ops/compositing.py), then
    ``dilate`` rounds of 3^3 max-pooling so surfaces near voxel boundaries
    and still-moving geometry survive between refreshes.
    """
    G = sigma.shape[0]
    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * delta)
    occ = (alpha > eps).astype(jnp.float32)[None, ..., None]  # NHWDC-ish
    for _ in range(max(0, dilate)):
        occ = jax.lax.reduce_window(
            occ, -jnp.inf, jax.lax.max, (1, 3, 3, 3, 1), (1, 1, 1, 1, 1),
            "SAME")
    return occ[0, ..., 0].reshape(G * G, G)


def lookup_bits(grid: jnp.ndarray, xyz: jnp.ndarray) -> jnp.ndarray:
    """Occupancy bits at normalized coords.

    grid: [G*G, G] from :func:`grid_from_sigma`; xyz: [..., 3] in [-1, 1]
    (the voxel fields' ``normalize_coords`` frame). Out-of-range coords
    clamp to the boundary voxel. Returns f32 bits [...].
    """
    G = grid.shape[-1]
    shape = xyz.shape[:-1]
    xyz = xyz.reshape(-1, 3)
    idx = jnp.clip(((xyz + 1.0) * (0.5 * G)).astype(jnp.int32), 0, G - 1)
    rows = jnp.take(grid, idx[:, 0] * G + idx[:, 1], axis=0)   # [N, G]
    bits = jnp.take_along_axis(rows, idx[:, 2:3], axis=-1)[:, 0]
    return bits.reshape(shape)


def expected_keep_fraction(occupied_frac: float, probe_stride: int) -> float:
    """Expected fraction of stratified lanes the cull keeps: occupied
    lanes plus the every-``probe_stride``-th probe floor over the rest
    (host-side gate arithmetic; see train/loop.py's refresh gating)."""
    s = max(1, int(probe_stride))
    return float(occupied_frac) + (1.0 - float(occupied_frac)) / s
