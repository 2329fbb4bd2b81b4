#!/usr/bin/env python
"""Scatter-add floor probes (round-3 PERF_NOTES evidence).

The train step spends ~320 ms in XLA scatter-adds (table-gradient
accumulation) at a measured ~26 ns/row that is invariant to dtype, row
width, sortedness and table size. These probes bound what ANY alternative
row-placement scheme could achieve on this chip:

A. XLA baselines — scatter-add / scatter-set / gather at matched shapes,
   random vs sorted indices, two row widths; plus the argsort cost that any
   sorted-target scheme must pay.
B. Pallas per-row dynamic DMA — each row individually DMA'd from HBM to a
   dynamic row offset of an HBM output (8 DMAs in flight). This is the raw
   per-row descriptor-issue rate of the DMA engine with zero arithmetic:
   the speed of light for "place N rows at N arbitrary offsets".
C. Pallas grouped DMA — rows moved in contiguous groups of G to dynamic
   offsets: how much issue cost amortizes if a (hypothetical, sort-free)
   scheme could form contiguous runs.

Usage: python tools/probe_scatter.py [--interpret] [--n 2359296]
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync(out):
    # block_until_ready does NOT synchronize on remote backends (bench.py);
    # force a host transfer of one element instead
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timed(fn, *args, iters=5):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    # device executes in order: syncing the last output waits for all
    _sync(out)
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------------------
# A. XLA baselines
# ---------------------------------------------------------------------------

def xla_baselines(N, K, W, rng):
    rows = jnp.asarray(rng.normal(size=(N, W)), jnp.float32)
    idx_r = jnp.asarray(rng.integers(0, K, N), jnp.int32)
    idx_s = jnp.sort(idx_r)

    @jax.jit
    def scat_add(idx, rows):
        return jnp.zeros((K, W), jnp.float32).at[idx].add(rows)

    @jax.jit
    def scat_set(idx, rows):
        return jnp.zeros((K, W), jnp.float32).at[idx].set(
            rows, mode="promise_in_bounds")

    @jax.jit
    def gather(idx, table):
        return table.at[idx].get(mode="promise_in_bounds")

    @jax.jit
    def argsort(idx):
        return jnp.argsort(idx)

    table = jnp.asarray(rng.normal(size=(K, W)), jnp.float32)
    res = {
        "scatter_add/random": timed(scat_add, idx_r, rows),
        "scatter_add/sorted": timed(scat_add, idx_s, rows),
        "scatter_set/random": timed(scat_set, idx_r, rows),
        "gather/random": timed(gather, idx_r, table),
        "argsort_keys": timed(argsort, idx_r),
    }
    for name, t in res.items():
        print(f"  A[{name}] W={W}: {t * 1e3:7.2f} ms  ({t / N * 1e9:6.2f} ns/row)")
    return res


# ---------------------------------------------------------------------------
# B/C. Pallas dynamic-offset row DMA
# ---------------------------------------------------------------------------

def _dma_kernel(offs_ref, rows_hbm, out_hbm, sem, *, rows_per_block, group):
    """Move `rows_per_block` rows (in groups of `group` contiguous rows) from
    rows_hbm to dynamic offsets of out_hbm. 8 DMAs in flight round-robin.
    ``offs_ref``: this block's destination offsets (SMEM block slice)."""
    blk = pl.program_id(0)
    base = blk * rows_per_block
    n_moves = rows_per_block // group
    NSEM = 8

    def move(i, _):
        src = base + i * group
        dst = offs_ref[i]
        dma = pltpu.make_async_copy(
            rows_hbm.at[pl.ds(src, group)],
            out_hbm.at[pl.ds(dst, group)],
            sem.at[jax.lax.rem(i, NSEM)],
        )
        # wait for the DMA that used this slot 8 moves ago
        @pl.when(i >= NSEM)
        def _():
            pltpu.make_async_copy(
                rows_hbm.at[pl.ds(src, group)],
                out_hbm.at[pl.ds(dst, group)],
                sem.at[jax.lax.rem(i, NSEM)],
            ).wait()

        dma.start()
        return _

    jax.lax.fori_loop(0, n_moves, move, None)

    def drain(i, _):
        sl = jax.lax.rem(jnp.maximum(n_moves - NSEM, 0) + i, NSEM)
        src = base
        pltpu.make_async_copy(
            rows_hbm.at[pl.ds(src, group)],
            out_hbm.at[pl.ds(0, group)],
            sem.at[sl],
        ).wait()
        return _

    jax.lax.fori_loop(0, jnp.minimum(n_moves, NSEM), drain, None)


def pallas_row_dma(N, K, W, group, rng, interpret=False):
    rows_per_block = 4096
    assert N % rows_per_block == 0
    n_moves_total = N // group
    n_blocks = N // rows_per_block
    n_moves_block = rows_per_block // group
    # group-aligned destination offsets (last-write-wins; issue-rate probe),
    # padded per block to a 1024-aligned 1-D SMEM slice (Mosaic requires
    # s32 1-D blocks aligned to its T(1024) layout)
    pad = -(-n_moves_block // 1024) * 1024
    offs_np = (np.asarray(
        rng.integers(0, (K - group) // group, n_moves_total),
        np.int32) * group).reshape(n_blocks, n_moves_block)
    offs = jnp.asarray(np.pad(
        offs_np, ((0, 0), (0, pad - n_moves_block))).reshape(-1))

    rows = jnp.asarray(rng.normal(size=(N, W)), jnp.float32)

    kernel = functools.partial(_dma_kernel, rows_per_block=rows_per_block,
                               group=group)
    fn = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((pad,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((8,))],
        out_shape=jax.ShapeDtypeStruct((K, W), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    jfn = jax.jit(lambda o, r: fn(o, r))
    t = timed(jfn, offs, rows)
    print(f"  B/C[group={group:4d}] W={W}: {t * 1e3:7.2f} ms "
          f"({t / N * 1e9:6.2f} ns/row, {N * W * 4 * 2 / t / 1e9:6.1f} GB/s)")
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--n", type=int, default=2359296)   # fine-pass row count
    ap.add_argument("--k", type=int, default=262144)    # fine 512^2 plane
    ap.add_argument("--skip-xla", action="store_true")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    N, K = args.n, args.k
    if args.interpret:
        N, K = 8192, 4096

    print(f"probe_scatter: N={N} rows, K={K} table rows, "
          f"backend={jax.default_backend()}")
    if not args.skip_xla:
        for W in (64, 256):
            xla_baselines(N, K, W, rng)
    # Mosaic HBM slices must be 128-lane aligned; probe at W=128 (the
    # group-size curve is the signal; remote kernel compiles are ~10 min
    # each, so keep the set tight)
    for group in (1, 8, 64, 512):
        pallas_row_dma(N, K, 128, group, rng, interpret=args.interpret)


if __name__ == "__main__":
    main()
