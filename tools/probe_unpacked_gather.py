#!/usr/bin/env python
"""Probe: packed [H*W, 4C] single-take vs unpacked [H*W, C] 4-take for the
fine XY plane at eval scale, with distractor tables approximating the real
chunk's VMEM pressure (coarse packed + fine XZ/YZ packed live alongside).

Motivation (round 3 eval trace): gathers whose source XLA promoted to VMEM
(S(1)) run at ~1.9-3.2 ns/row; the 187 MB packed fine-XY table stays in
HBM at 13.3 ns/row and is the single largest eval op (28 ms/chunk).
Unpacked bf16 is 47 MB — the same size class XLA demonstrably promotes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x), out)
    return (time.perf_counter() - t0) / iters


def main():
    H = W = 605
    C = 64
    N = 2_097_152
    rng = np.random.default_rng(0)

    unpacked = jnp.asarray(
        rng.normal(size=(H * W, C)).astype(np.float32)).astype(jnp.bfloat16)
    packed = jnp.asarray(
        rng.normal(size=(H * W, 4 * C)).astype(np.float32)).astype(jnp.bfloat16)
    # distractors ~ what else is VMEM-promotable in the real chunk
    dis1 = jnp.asarray(rng.normal(size=(302 * 302, 256)).astype(np.float32)
                       ).astype(jnp.bfloat16)          # coarse XY packed 47MB
    dis2 = jnp.asarray(rng.normal(size=(605 * 366, 64)).astype(np.float32)
                       ).astype(jnp.bfloat16)          # fine XZ packed 28MB
    dis3 = jnp.asarray(rng.normal(size=(605 * 366, 64)).astype(np.float32)
                       ).astype(jnp.bfloat16)          # fine YZ packed 28MB

    by = jnp.asarray(rng.integers(0, H - 1, N), jnp.int32)
    bx = jnp.asarray(rng.integers(0, W - 1, N), jnp.int32)
    din = jnp.asarray(rng.integers(0, 605 * 366 - 1, N), jnp.int32)
    w = jnp.asarray(rng.uniform(size=(N, 4)).astype(np.float32))

    @jax.jit
    def packed_take(packed, by, bx, w, dis1, dis2, dis3, din):
        rows = packed.at[by * W + bx].get(mode="promise_in_bounds")
        r = rows.astype(jnp.float32)
        out = (r[:, :C] * w[:, :1] + r[:, C:2*C] * w[:, 1:2]
               + r[:, 2*C:3*C] * w[:, 2:3] + r[:, 3*C:] * w[:, 3:])
        d = (dis1.at[din % (302 * 302)].get(mode="promise_in_bounds")[:, :C]
             .astype(jnp.float32)
             + dis2.at[din].get(mode="promise_in_bounds").astype(jnp.float32)
             + dis3.at[din].get(mode="promise_in_bounds").astype(jnp.float32))
        return (out + d).sum()

    @jax.jit
    def unpacked_take(unpacked, by, bx, w, dis1, dis2, dis3, din):
        i00 = by * W + bx
        r00 = unpacked.at[i00].get(mode="promise_in_bounds").astype(jnp.float32)
        r01 = unpacked.at[i00 + 1].get(mode="promise_in_bounds").astype(jnp.float32)
        r10 = unpacked.at[i00 + W].get(mode="promise_in_bounds").astype(jnp.float32)
        r11 = unpacked.at[i00 + W + 1].get(mode="promise_in_bounds").astype(jnp.float32)
        out = (r00 * w[:, :1] + r01 * w[:, 1:2]
               + r10 * w[:, 2:3] + r11 * w[:, 3:])
        d = (dis1.at[din % (302 * 302)].get(mode="promise_in_bounds")[:, :C]
             .astype(jnp.float32)
             + dis2.at[din].get(mode="promise_in_bounds").astype(jnp.float32)
             + dis3.at[din].get(mode="promise_in_bounds").astype(jnp.float32))
        return (out + d).sum()

    tp = timeit(packed_take, packed, by, bx, w, dis1, dis2, dis3, din)
    tu = timeit(unpacked_take, unpacked, by, bx, w, dis1, dis2, dis3, din)
    print(f"packed  1-take [H*W,256] (187MB): {tp*1e3:7.2f} ms "
          f"({tp/N*1e9:.1f} ns/pt)")
    print(f"unpacked 4-take [H*W,64] (47MB):  {tu*1e3:7.2f} ms "
          f"({tu/N*1e9:.1f} ns/pt)")

    # also without distractors (upper bound on promotion odds)
    zero = jnp.zeros((8, 64), jnp.bfloat16)

    @jax.jit
    def unpacked_solo(unpacked, by, bx, w):
        i00 = by * W + bx
        r00 = unpacked.at[i00].get(mode="promise_in_bounds").astype(jnp.float32)
        r01 = unpacked.at[i00 + 1].get(mode="promise_in_bounds").astype(jnp.float32)
        r10 = unpacked.at[i00 + W].get(mode="promise_in_bounds").astype(jnp.float32)
        r11 = unpacked.at[i00 + W + 1].get(mode="promise_in_bounds").astype(jnp.float32)
        return (r00 * w[:, :1] + r01 * w[:, 1:2]
                + r10 * w[:, 2:3] + r11 * w[:, 3:]).sum()

    ts = timeit(unpacked_solo, unpacked, by, bx, w)
    print(f"unpacked 4-take solo:             {ts*1e3:7.2f} ms "
          f"({ts/N*1e9:.1f} ns/pt)")


if __name__ == "__main__":
    main()
