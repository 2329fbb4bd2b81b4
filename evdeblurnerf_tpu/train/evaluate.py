"""Evaluation-time rendering: full poses through fixed-size jitted chunks.

Counterpart of ref: networks/renderer.py:594-626 (render_path) and the
test/video blocks of run_nerf.py:642-734. TPU-native shape discipline: rays
are flattened over all requested poses, padded to a multiple of the chunk
size (and of the mesh size under data-parallel eval — replacing the
reference's dummy-pose ``num_gpu`` padding, ref: run_nerf.py:357-359), and
rendered by one jit-compiled chunk program.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import numpy as np

from ..utils.rays import get_rays_np


def build_chunk_renderer(model, mesh=None):
    """Returns jitted ``chunk_fn(variables, rays[chunk, 3, 2])``."""

    def render_chunk(variables, rays):
        return model.apply(variables, rays, method=model.render_chunk)

    jit_kwargs = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        jit_kwargs["in_shardings"] = (NamedSharding(mesh, P()),
                                      NamedSharding(mesh, P("data")))
    return jax.jit(render_chunk, **jit_kwargs)


def render_poses(variables, chunk_fn, poses, H: int, W: int, K,
                 chunk: int = 16384, render_factor: int = 0,
                 mesh=None, verbose: bool = False):
    """Render each [3,4] pose; returns (rgbs [N,H,W,3], depths [N,H,W])."""
    if render_factor > 0:      # fast preview (ref: renderer.py:598-601)
        H, W = H // render_factor, W // render_factor
        K = np.array(K, np.float64).copy()
        K[:2, :] = K[:2, :] / render_factor

    n_dev = 1 if mesh is None else mesh.size
    chunk = -(-chunk // n_dev) * n_dev

    rgbs, depths = [], []
    for pi, c2w in enumerate(np.asarray(poses)):
        t0 = time.time()
        rays_o, rays_d = get_rays_np(H, W, K, c2w[:3, :4])
        rays = np.stack([rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)],
                        axis=-1)
        n = rays.shape[0]
        pad = -n % chunk
        if pad:
            rays = np.concatenate([rays, np.repeat(rays[-1:], pad, 0)], 0)
        rgb_parts, depth_parts = [], []
        for s in range(0, rays.shape[0], chunk):
            rgb, depth, _ = chunk_fn(variables, rays[s:s + chunk])
            rgb_parts.append(np.asarray(rgb))
            depth_parts.append(np.asarray(depth))
        rgb = np.concatenate(rgb_parts, 0)[:n].reshape(H, W, 3)
        depth = np.concatenate(depth_parts, 0)[:n].reshape(H, W)
        rgbs.append(rgb)
        depths.append(depth)
        if verbose:
            print(f"  pose {pi}: {time.time() - t0:.2f}s")
    return np.stack(rgbs), np.stack(depths)


def apply_crf_host(crf_module, crf_params, rgbs, skip_learn_crf=False):
    """Apply the rgb CRF to eval renders (ref: run_nerf.py:660)."""
    fn = jax.jit(lambda p, x: crf_module.apply(
        {"params": p}, x, mode="encode_rgb", skip_learn_crf=skip_learn_crf))
    return np.asarray(fn(crf_params, rgbs))


def depth_colormap(depth: np.ndarray, near: Optional[float] = None,
                   far: Optional[float] = None) -> np.ndarray:
    """Depth -> turbo-ish visualization via cv2 (ref: run_nerf.py:672-676)."""
    import cv2

    d = np.asarray(depth, np.float32)
    lo = np.min(d) if near is None else near
    hi = np.max(d) if far is None else far
    norm = np.clip((d - lo) / max(hi - lo, 1e-8), 0, 1)
    img = cv2.applyColorMap((norm * 255).astype(np.uint8),
                            cv2.COLORMAP_JET)
    return img[..., ::-1]
