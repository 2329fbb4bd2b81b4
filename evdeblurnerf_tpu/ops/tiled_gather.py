"""Morton-tiled matmul gather for tri-plane sampling (prototype).

Replaces per-point table-row gathers (row-count-bound at ~19 ns/row on
v5e, PERF_NOTES.md) with per-group tile DMAs + an MXU contraction:

1. rays are Morton-sorted once per step (free: 18k keys), so consecutive
   groups of ``GROUP=128`` sample points have tight plane-space bounding
   boxes (tools/locality_study.py: p95 ~44x39 texels on the XY projection
   of the paper's fine grid);
2. per group, the kernel DMAs the enclosing ``TH x TW`` tile of a
   channels-last plane into VMEM, builds the 4-corner tent-weight matrix
   [GROUP, TH*TW] in-register, and contracts it with the tile
   [TH*TW, C] on the MXU — bilinear interpolation as a matmul;
3. points whose 2x2 footprint falls outside their group's tile are
   reported in a spill mask; the caller patches them with a
   fixed-capacity XLA row-gather fallback (~1% of points).

This is the forward path of the round-3 plan; the backward (tile
accumulation with flush-on-change) is documented in PERF_NOTES.md.
ref: networks/pdrf/voxnerf.py:132-151 (the grid_sample this replaces).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128


def morton_code_2d(u, v, bits=16):
    """Interleave-bit Morton code of integer coords (uint32 in, uint32 out)."""
    def spread(x):
        x = x.astype(jnp.uint32) & jnp.uint32((1 << bits) - 1)
        x = (x | (x << 8)) & jnp.uint32(0x00FF00FF)
        x = (x | (x << 4)) & jnp.uint32(0x0F0F0F0F)
        x = (x | (x << 2)) & jnp.uint32(0x33333333)
        x = (x | (x << 1)) & jnp.uint32(0x55555555)
        return x
    return spread(u) | (spread(v) << jnp.uint32(1))


def group_origins(fu, fv, H, W, TH, TW):
    """Per-group tile origins [G, 2] (oy, ox) from point texel coords.

    Origin = clamped bbox min so the tile [oy:oy+TH, ox:ox+TW] stays in
    the plane; points are spilled (mask False) if their 2x2 footprint
    exceeds the tile.
    """
    G = fu.shape[0] // GROUP
    u0 = jnp.floor(fu).reshape(G, GROUP)
    v0 = jnp.floor(fv).reshape(G, GROUP)
    # center the tile on the group's median point: robust to the few
    # outliers a Morton-sorted stream still contains (a bbox-min anchor
    # would let one outlier spill the whole group)
    mu = jnp.median(u0, axis=1)
    mv = jnp.median(v0, axis=1)
    ox = jnp.clip((mu - TW // 2).astype(jnp.int32), 0, max(W - TW, 0))
    oy = jnp.clip((mv - TH // 2).astype(jnp.int32), 0, max(H - TH, 0))
    in_u = (u0 >= ox[:, None]) & (u0 + 1 <= ox[:, None] + TW - 1)
    in_v = (v0 >= oy[:, None]) & (v0 + 1 <= oy[:, None] + TH - 1)
    return oy, ox, (in_u & in_v).reshape(-1)


def _kernel(oy_ref, ox_ref, fu_ref, fv_ref, plane_ref, out_ref,
            tiles, sems, *, TH, TW, C):
    g = pl.program_id(0)
    n_g = pl.num_programs(0)

    def tile_dma(slot, gi):
        return pltpu.make_async_copy(
            plane_ref.at[pl.ds(oy_ref[gi], TH), pl.ds(ox_ref[gi], TW), :],
            tiles.at[slot], sems.at[slot])

    # double-buffered tile prefetch: per-group DMA latency (~us) would
    # otherwise dominate the ~10k-program grid
    @pl.when(g == 0)
    def _():
        tile_dma(0, 0).start()

    @pl.when(g + 1 < n_g)
    def _():
        tile_dma((g + 1) % 2, g + 1).start()

    slot = g % 2
    oy = oy_ref[g]
    ox = ox_ref[g]
    fu = fu_ref[0, 0, :] - ox.astype(jnp.float32)   # local coords [GROUP]
    fv = fv_ref[0, 0, :] - oy.astype(jnp.float32)
    u0 = jnp.floor(fu)
    v0 = jnp.floor(fv)
    au = fu - u0
    av = fv - v0
    # in-tile (non-spilled) points; spilled rows produce zeros
    ok = ((u0 >= 0) & (u0 + 1 <= TW - 1) & (v0 >= 0) & (v0 + 1 <= TH - 1))
    u0c = jnp.clip(u0, 0, TW - 2).astype(jnp.int32)
    v0c = jnp.clip(v0, 0, TH - 2).astype(jnp.int32)

    # separable tent weights: [GROUP, TH] x [GROUP, TW] one-hots are ~K/2
    # times cheaper to build than the fused [GROUP, TH*TW] matrix
    ty = jax.lax.broadcasted_iota(jnp.int32, (GROUP, TH), 1)
    tx = jax.lax.broadcasted_iota(jnp.int32, (GROUP, TW), 1)
    okf = ok.astype(jnp.float32)
    wy = ((ty == v0c[:, None]).astype(jnp.float32) * (1 - av)[:, None]
          + (ty == v0c[:, None] + 1).astype(jnp.float32) * av[:, None]
          ) * okf[:, None]
    wx = ((tx == u0c[:, None]).astype(jnp.float32) * (1 - au)[:, None]
          + (tx == u0c[:, None] + 1).astype(jnp.float32) * au[:, None])

    tile_dma(slot, g).wait()
    # y-contraction on the MXU, then the small x-contraction on the VPU
    a = jax.lax.dot_general(
        wy, tiles[slot].reshape(TH, TW * C),
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)           # [GROUP, TW*C]
    a = a.reshape(GROUP, TW, C)
    out_ref[:] = jnp.sum(a * wx[:, :, None], axis=1)


@functools.partial(jax.jit, static_argnames=("TH", "TW", "interpret"))
def tiled_plane_gather(plane_hwc, fu, fv, oy, ox, TH=64, TW=64,
                       interpret=False):
    """Bilinear-sample ``plane_hwc`` [H, W, C] at texel coords (fu, fv)
    [N], N a multiple of GROUP, with per-group tile origins (oy, ox) [G].

    Returns [N, C]; rows whose footprint spills the tile are zero (the
    caller patches them via the mask from :func:`group_origins`).
    """
    H, W, C = plane_hwc.shape
    N = fu.shape[0]
    G = N // GROUP
    # [G, 1, GROUP]: trailing (1, GROUP) satisfies the Pallas TPU rule that
    # the last two block dims divide (8, 128) or equal the array dims
    fu = fu.reshape(G, 1, GROUP)
    fv = fv.reshape(G, 1, GROUP)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 1, GROUP), lambda g, oy, ox: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, GROUP), lambda g, oy, ox: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((GROUP, C), lambda g, oy, ox: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, TH, TW, C), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel, TH=TH, TW=TW, C=C)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(oy, ox, fu, fv, plane_hwc)


def tiled_plane_gather_with_fallback(plane_hwc, fu, fv, TH=64, TW=64,
                                     spill_capacity_frac=0.125,
                                     interpret=False):
    """Full forward: tiled matmul gather + fixed-capacity XLA fallback for
    spilled points. Exact (f32) for every point as long as the spill count
    stays under capacity; excess spills poison the output with NaN rather
    than silently corrupting it."""
    H, W, C = plane_hwc.shape
    N = fu.shape[0]
    oy, ox, ok = group_origins(fu, fv, H, W, TH, TW)
    out = tiled_plane_gather(plane_hwc, fu, fv, oy, ox, TH=TH, TW=TW,
                             interpret=interpret)

    cap = max(GROUP, int(N * spill_capacity_frac))
    spill_idx = jnp.nonzero(~ok, size=cap, fill_value=0)[0]
    su = fu[spill_idx]
    sv = fv[spill_idx]
    u0 = jnp.clip(jnp.floor(su), 0, W - 2).astype(jnp.int32)
    v0 = jnp.clip(jnp.floor(sv), 0, H - 2).astype(jnp.int32)
    au = (su - u0)[:, None]
    av = (sv - v0)[:, None]
    flat = plane_hwc.reshape(H * W, C)
    r00 = jnp.take(flat, v0 * W + u0, axis=0)
    r01 = jnp.take(flat, v0 * W + u0 + 1, axis=0)
    r10 = jnp.take(flat, (v0 + 1) * W + u0, axis=0)
    r11 = jnp.take(flat, (v0 + 1) * W + u0 + 1, axis=0)
    vals = (r00 * (1 - au) * (1 - av) + r01 * au * (1 - av)
            + r10 * (1 - au) * av + r11 * au * av)
    # rows filled from slot 0 duplicates are harmless: scatter writes the
    # same correct value for point 0 repeatedly
    out = out.at[spill_idx].set(jnp.where(ok[spill_idx, None], out[spill_idx],
                                          vals))
    n_spill = jnp.sum(~ok)
    poison = jnp.where(n_spill <= cap, 1.0, jnp.nan)
    return out * poison
