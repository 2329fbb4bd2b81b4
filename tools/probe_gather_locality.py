#!/usr/bin/env python
"""Probe: can the eval fine-plane gather (fusion.6) beat 13.3 ns/row?

The 32k-ray eval chunk spends 56 ms in ONE gather: [4.19M] random rows
from a [366k, 256] bf16 table (187 MB — too big for a VMEM promotion, so
rows issue from HBM at the measured 13.3 ns/row floor). Two candidate
reformulations, probed at the exact shapes:

A. Index LOCALITY — eval rays are an image raster, so sample-major
   ordering makes consecutive indices hit neighboring texels. If HBM
   row-buffer locality amortizes row issue, a (free) transpose of the
   gather order wins. Probed with random / block-local / fully-sorted
   index streams.
B. Channel SPLIT — 4 tables of [366k, 64] bf16 (47 MB each) can be
   VMEM-promoted per-use (the 28-46 MB tables in the same program run at
   2-3.2 ns/row); 4x the row count at ~2-3 ns/row beats 1x at 13.3
   IF the promotion happens.

Usage: python tools/probe_gather_locality.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0][(0,) * 2])


def timed(fn, *args, iters=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    K, W, N = 366_025, 256, 4_194_304
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(K, W)), jnp.bfloat16)

    idx_random = rng.integers(0, K, N).astype(np.int32)
    idx_sorted = np.sort(idx_random)
    # block-local: sorted within 32k blocks (one "sample slab" of the
    # 32768-ray chunk), random across blocks — the realistic sample-major
    # eval pattern (adjacent rays -> neighboring texels, slabs far apart)
    blk = idx_random.reshape(128, 32_768).copy()
    blk.sort(axis=1)
    idx_block = blk.reshape(-1)

    take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    for name, idx in (("random", idx_random), ("block-local", idx_block),
                      ("sorted", idx_sorted)):
        d_idx = jnp.asarray(idx)
        dt = timed(take, table, d_idx)
        print(f"A gather [{N}] of [{K},{W}]bf16, {name:12s}: "
              f"{dt * 1e3:7.1f} ms  {dt / N * 1e9:6.2f} ns/row", flush=True)

    # B: channel split — 4 x [K, 64], same index vector, concat features
    parts = [jnp.asarray(rng.normal(size=(K, 64)), jnp.bfloat16)
             for _ in range(4)]

    @jax.jit
    def take_split(parts, i):
        return jnp.concatenate([jnp.take(p, i, axis=0) for p in parts], -1)

    d_idx = jnp.asarray(idx_random)
    dt = timed(take_split, parts, d_idx)
    print(f"B split 4x[{K},64]bf16 gather+concat, random: "
          f"{dt * 1e3:7.1f} ms  {dt / N * 1e9:6.2f} ns/row-equiv", flush=True)

    # B2: split WITHOUT the concat (sum features instead — isolates
    # whether the concat copy, not the gathers, dominates)
    @jax.jit
    def take_split_sum(parts, i):
        return sum(jnp.take(p, i, axis=0) for p in parts)

    dt = timed(take_split_sum, parts, d_idx)
    print(f"B2 split 4x gather+sum (no concat), random:   "
          f"{dt * 1e3:7.1f} ms  {dt / N * 1e9:6.2f} ns/row-equiv", flush=True)

    # C: narrower single table [K, 64] (47 MB) — does XLA promote a lone
    # 47 MB table at all, or were the fast small gathers promoted only
    # because the big program had spare VMEM windows?
    dt = timed(take, parts[0], d_idx)
    print(f"C single [{K},64]bf16 (47MB) gather, random:  "
          f"{dt * 1e3:7.1f} ms  {dt / N * 1e9:6.2f} ns/row", flush=True)


if __name__ == "__main__" and "--variants" not in sys.argv:
    sys.exit(main())


def variants():
    """Second-stage probes: realistic bilinear forms at fusion.6 shapes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    K, W, N = 366_025, 256, 4_194_304
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, K - 700, N).astype(np.int32))
    wts = jnp.asarray(rng.uniform(0, 1, (4, N)).astype(np.float32))

    # D: UNPACKED bilinear — one [K, 64] table (47 MB, promotable), four
    # corner index streams, weighted sum (the pre-packing formulation)
    base = jnp.asarray(rng.normal(size=(K, 64)), jnp.bfloat16)

    @jax.jit
    def unpacked(t, i, w):
        offs = (0, 1, 605, 606)
        acc = 0
        for k, o in enumerate(offs):
            acc = acc + w[k][:, None].astype(jnp.bfloat16) * \
                jnp.take(t, i + o, axis=0)
        return acc

    dt = timed(unpacked, base, idx, wts)
    print(f"D unpacked 4-idx gather of one [366k,64] + wsum: "
          f"{dt * 1e3:7.1f} ms  {dt / N * 1e9:6.2f} ns/row-eq", flush=True)

    # E: split into 2 x [K, 128] (94 MB each) — same idx, sum
    parts2 = [jnp.asarray(rng.normal(size=(K, 128)), jnp.bfloat16)
              for _ in range(2)]

    @jax.jit
    def take2(ps, i):
        return sum(jnp.take(p, i, axis=0) for p in ps)

    dt = timed(take2, parts2, idx)
    print(f"E split 2x[366k,128]bf16 gather+sum:            "
          f"{dt * 1e3:7.1f} ms  {dt / N * 1e9:6.2f} ns/row-eq", flush=True)

    # F: 4 corner tables [K, 64] (split-by-corner packing), same idx,
    # WEIGHTED sum — the drop-in replacement for the packed fusion.6
    parts4 = [jnp.asarray(rng.normal(size=(K, 64)), jnp.bfloat16)
              for _ in range(4)]

    @jax.jit
    def corner_wsum(ps, i, w):
        acc = 0
        for k, p in enumerate(ps):
            acc = acc + w[k][:, None].astype(jnp.bfloat16) * \
                jnp.take(p, i, axis=0)
        return acc

    dt = timed(corner_wsum, parts4, idx, wts)
    print(f"F corner-split 4x[366k,64] same-idx wsum:       "
          f"{dt * 1e3:7.1f} ms  {dt / N * 1e9:6.2f} ns/row-eq", flush=True)


if __name__ == "__main__" and "--variants" in sys.argv:
    variants()
