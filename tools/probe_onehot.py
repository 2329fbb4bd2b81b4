#!/usr/bin/env python
"""Round-3 go/no-go probe: Mosaic one-hot build + MXU dot cost per point.

The Morton-tiled gather/scatter replaces row takes/scatters with
per-group one-hot matmuls against VMEM tiles. Its wall is the in-register
one-hot build (~N x K elements). This measures, per point, the cost of
building a [BLK, K] tent-weight one-hot (bf16 and f32) and contracting it
with a resident [K, C] tile — no DMA, VMEM-only — for the candidate tile
sizes. Compare against the 8-30 ns/row take/scatter costs it must beat.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def make_kernel(K, C, dtype, blk):
    def kernel(idx_ref, frac_ref, tile_ref, out_ref):
        idx = idx_ref[0]                              # [BLK, 1] int32
        fx = frac_ref[0]                              # [BLK, 1] f32
        iota = jax.lax.broadcasted_iota(jnp.int32, (blk, K), 1)
        # 2-corner tent one-hot along a row-window (the x part of the
        # separable build; the full 4-corner build is ~2x this)
        w = ((iota == idx).astype(dtype) * (1.0 - fx).astype(dtype)
             + (iota == idx + 1).astype(dtype) * fx.astype(dtype))
        out_ref[:] = jax.lax.dot_general(
            w, tile_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return kernel


@functools.partial(jax.jit, static_argnames=("K", "C", "dt", "blk"))
def run(idx, frac, tile, K, C, dt, blk):
    dtype = jnp.bfloat16 if dt == "bf16" else jnp.float32
    n = idx.shape[0] * idx.shape[1]
    return pl.pallas_call(
        make_kernel(K, C, dtype, blk),
        grid=(idx.shape[0],),
        in_specs=[
            pl.BlockSpec((1, blk, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, blk, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((K, C), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((blk, C), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((n, C), jnp.float32),
    )(idx, frac, tile)


def main():
    rng = np.random.default_rng(0)
    N = 1_048_576
    for K in (256, 1024, 4096):
        for C in (64,):
            for dt in ("bf16", "f32"):
                for blk in (256, 1024):
                    nb = N // blk
                    idx = jnp.asarray(
                        rng.integers(0, K - 1, (nb, blk, 1)), jnp.int32)
                    frac = jnp.asarray(
                        rng.uniform(0, 1, (nb, blk, 1)), jnp.float32)
                    tile = jnp.asarray(
                        rng.normal(size=(K, C)),
                        jnp.bfloat16 if dt == "bf16" else jnp.float32)
                    try:
                        o = run(idx, frac, tile, K, C, dt, blk)
                        float(o.ravel()[0])
                        t0 = time.perf_counter()
                        for _ in range(3):
                            o = run(idx, frac, tile, K, C, dt, blk)
                            float(o.ravel()[0])
                        dtms = (time.perf_counter() - t0) / 3 * 1e3
                        print(f"K={K:5d} C={C} {dt:4s} blk={blk:4d}: "
                              f"{dtms:7.2f} ms for {N} pts "
                              f"({dtms/N*1e6:6.2f} ns/pt)", flush=True)
                    except Exception as e:
                        print(f"K={K:5d} C={C} {dt:4s} blk={blk:4d}: "
                              f"FAIL {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
