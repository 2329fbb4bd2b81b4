#!/usr/bin/env python
"""TPU timing: tiled matmul gather vs packed row-take at paper scale.

Realistic point stream: LLFF-style pinhole rays + RBK-ish warps, NDC,
stratified depths, Morton-sorted rays (the same geometry as
tools/locality_study.py). One projection (XY, C=64) of the fine grid.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "tests")


def make_points(n_rand=1024, ptnum=10, S=128, seed=0):
    sys.path.insert(0, "/root/repo/tests")
    from locality_geometry import step_points_xyz

    return step_points_xyz(n_rand=n_rand, ptnum=ptnum, S=S, seed=seed)


def main():
    import jax
    import jax.numpy as jnp

    from evdeblurnerf_tpu.ops import triplane
    from evdeblurnerf_tpu.ops.tiled_gather import (
        GROUP, group_origins, tiled_plane_gather)

    xyz = make_points()                       # [N, 3] in [0, 1], Morton order
    N = (xyz.shape[0] // GROUP) * GROUP
    xyz = xyz[:N]
    print(f"N = {N}", flush=True)

    Hg = Wg = 512
    C = 64
    rng = np.random.default_rng(0)
    plane_small = jnp.asarray(rng.normal(size=(Hg, Wg, C)), jnp.float32)
    # pad channels to the 128-lane width: Mosaic requires HBM slices to be
    # lane-aligned, so the kernel DMAs full 128-channel rows (2x DMA waste
    # at C=64; acceptable if tiles are reused across groups)
    plane_hwc = jnp.pad(plane_small, ((0, 0), (0, 0), (0, 128 - C)))
    plane_chw = jnp.moveaxis(plane_small, -1, 0)

    fu = jnp.asarray(xyz[:, 0] * (Wg - 1), jnp.float32)
    fv = jnp.asarray(xyz[:, 1] * (Hg - 1), jnp.float32)

    def sync(x):
        _ = float(jnp.asarray(x).ravel()[0])

    def timeit(fn, *args, iters=5):
        for _ in range(2):
            sync(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            sync(fn(*args))
        return (time.perf_counter() - t0) / iters

    # baseline: packed row take
    x_norm = fu / (Wg - 1) * 2 - 1
    y_norm = fv / (Hg - 1) * 2 - 1

    @jax.jit
    def baseline(plane_chw, x, y):
        packed = triplane.pack_plane(plane_chw)
        return triplane.grid_sample_2d_packed(packed, Hg, Wg, x, y)

    t_base = timeit(baseline, plane_chw, x_norm, y_norm)
    print(f"packed row-take: {t_base*1e3:.1f} ms "
          f"({t_base/N*1e9:.1f} ns/pt)", flush=True)

    for TH, TW in ((32, 32), (64, 64), (48, 128)):
        oy, ox, ok = jax.jit(group_origins, static_argnums=(2, 3, 4, 5))(
            fu, fv, Hg, Wg, TH, TW)
        spill = 1.0 - float(jnp.mean(ok.astype(jnp.float32)))
        t = timeit(tiled_plane_gather, plane_hwc, fu, fv, oy, ox, TH, TW)
        # exactness on non-spilled points
        out = tiled_plane_gather(plane_hwc, fu, fv, oy, ox, TH=TH, TW=TW)
        ref = baseline(plane_chw, x_norm, y_norm)
        okm = np.asarray(ok)
        err = np.abs(np.asarray(out)[okm][:, :C]
                     - np.asarray(ref)[okm]).max()
        print(f"tiled {TH}x{TW}: {t*1e3:.1f} ms ({t/N*1e9:.1f} ns/pt), "
              f"spill {spill*100:.2f}%, max|err| {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
