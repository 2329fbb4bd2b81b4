"""Evaluation-time rendering: full poses through fixed-size jitted chunks.

Counterpart of ref: networks/renderer.py:594-626 (render_path) and the
test/video blocks of run_nerf.py:642-734. TPU-native shape discipline: rays
are flattened over all requested poses, padded to a multiple of the chunk
size (and of the mesh size under data-parallel eval — replacing the
reference's dummy-pose ``num_gpu`` padding, ref: run_nerf.py:357-359), and
rendered by one jit-compiled chunk program.
"""

from __future__ import annotations

import functools as _functools
import time
from typing import Optional

import jax
import numpy as np

from ..utils.rays import get_rays_np


def build_chunk_renderer(model, mesh=None, fine_cull: bool = False):
    """Returns jitted ``chunk_fn(variables, rays[chunk, 3, 2])``.

    ``fine_cull``: render with the transmittance-culled fine pass
    (--fine_cull_eval) — a static trace-time choice, so on/off renderers
    are separate compiled programs."""

    def render_chunk(variables, rays):
        return model.apply(variables, rays, method=model.render_chunk,
                           fine_cull=fine_cull)

    jit_kwargs = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        # variables inherit their placement (None): replicated under pure
        # DP, and component-sharded tables stay distributed under
        # --tp_model_parallel (parallel/tp.py) instead of being forced
        # back to a replicated copy per render
        jit_kwargs["in_shardings"] = (None,
                                      NamedSharding(mesh, P("data")))
        if jax.process_count() > 1:
            # multi-host eval: outputs come back replicated so every
            # process can np.asarray its local copy (the per-chunk
            # all-gather is noise next to the render itself), and host
            # ray chunks become global arrays before entering the jit
            from ..parallel import multihost as _mh

            jit_kwargs["out_shardings"] = NamedSharding(mesh, P())
            inner = jax.jit(render_chunk, **jit_kwargs)
            return lambda variables, rays: inner(
                variables, _mh.put_global(rays, mesh))
    return jax.jit(render_chunk, **jit_kwargs)


def render_poses(variables, chunk_fn, poses, H: int, W: int, K,
                 chunk: int = 16384, render_factor: int = 0,
                 mesh=None, verbose: bool = False, max_inflight: int = 4):
    """Render each [3,4] pose; returns (rgbs [N,H,W,3], depths [N,H,W]).

    All poses' rays are streamed through the jitted chunk program as one
    pipeline: jax dispatch is asynchronous, so between dispatches up to
    ``max_inflight`` undrained chunks sit on the device (momentarily one
    more right after a dispatch, while the host blocks on the oldest) —
    the per-chunk host sync of the naive loop (dispatch, then immediately
    ``np.asarray``) left the device idle during every host copy
    (PERF_NOTES.md round 3). Ref: networks/renderer.py:594-626 render_path.
    """
    from collections import deque

    if render_factor > 0:      # fast preview (ref: renderer.py:598-601)
        H, W = H // render_factor, W // render_factor
        K = np.array(K, np.float64).copy()
        K[:2, :] = K[:2, :] / render_factor

    n_dev = 1 if mesh is None else mesh.size
    chunk = -(-chunk // n_dev) * n_dev

    poses = np.asarray(poses)
    n_poses = poses.shape[0]
    n_per = H * W

    def ray_chunks():
        """Yield fixed-size ray chunks across the whole pose stream."""
        tail = None
        for c2w in poses:
            rays_o, rays_d = get_rays_np(H, W, K, c2w[:3, :4])
            rays = np.stack([rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)],
                            axis=-1)
            if tail is not None:
                rays = np.concatenate([tail, rays], 0)
                tail = None
            full = rays.shape[0] - rays.shape[0] % chunk
            for s in range(0, full, chunk):
                yield rays[s:s + chunk]
            if full < rays.shape[0]:
                tail = rays[full:]
        if tail is not None:
            pad = -tail.shape[0] % chunk
            yield np.concatenate([tail, np.repeat(tail[-1:], pad, 0)], 0)

    t0 = time.time()
    rgb_parts, depth_parts = [], []
    pending = deque()

    def drain_one():
        rgb, depth, _ = pending.popleft()
        rgb_parts.append(np.asarray(rgb))
        depth_parts.append(np.asarray(depth))

    for rays in ray_chunks():
        pending.append(chunk_fn(variables, rays))
        while len(pending) > max_inflight:  # bound undrained results
            drain_one()
    while pending:
        drain_one()

    rgb = np.concatenate(rgb_parts, 0)[:n_poses * n_per]
    depth = np.concatenate(depth_parts, 0)[:n_poses * n_per]
    if verbose:
        dt = time.time() - t0
        print(f"  rendered {n_poses} poses ({n_poses * n_per} rays) "
              f"in {dt:.2f}s ({n_poses * n_per / max(dt, 1e-9):,.0f} rays/s)")
    return (rgb.reshape(n_poses, H, W, 3),
            depth.reshape(n_poses, H, W))


@_functools.cache
def _crf_fn(crf_module, skip_learn_crf):
    return jax.jit(lambda p, x: crf_module.apply(
        {"params": p}, x, mode="encode_rgb", skip_learn_crf=skip_learn_crf))


def apply_crf_host(crf_module, crf_params, rgbs, skip_learn_crf=False):
    """Apply the rgb CRF to eval renders (ref: run_nerf.py:660). The jitted
    fn is cached per (module, skip) — a fresh ``jax.jit(lambda ...)`` per
    call would retrace and recompile at every testset/video cadence.

    Params are pulled to host first so this stays process-LOCAL under
    multi-host training: the primary calls it alone (train/loop.py), and a
    jit over process-spanning global arrays would require every process to
    participate."""
    crf_params = jax.device_get(crf_params)
    return np.asarray(_crf_fn(crf_module, skip_learn_crf)(crf_params, rgbs))


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
