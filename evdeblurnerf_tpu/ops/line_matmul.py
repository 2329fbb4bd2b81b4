"""Line-table gradient accumulation as an MXU one-hot matmul.

The VJP of a line-table row gather is a scatter-add of millions of rows
into a table of only 183-608 rows (the 1-D factors of the tri-plane
decomposition, ref: networks/pdrf/voxnerf.py:137-148). XLA's scatter-add
is row-count-bound (~15-30 ns/row; ~104 ms of the 0.94 s train step,
PERF_NOTES.md), while the same reduction is

    d_table[d, c] = sum_n [idx_n == d] * g[n, c],

i.e. ``onehot(idx)^T @ g`` — a dense matmul whose K dimension is the
point count and whose output fits in VMEM. This module implements that
reduction as a Pallas kernel with a sequential grid over point blocks
accumulating into the VMEM-resident output tile.

The binary one-hot is exact (0/1 in any dtype); the matmul accumulates
in f32. ``precision``:

* "highest" (default): g enters the MXU via its bf16x3 expansion —
  products with a 0/1 mask are exact, so d_table differs from the
  scatter only by f32 summation order;
* "default": g is rounded to bf16 (~0.4% per-element) — ~6x faster,
  gradient-noise-level error, enabled with the table_bf16 family flag.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .lane_shuffle import on_tpu, use_pallas

_BLK = 1024


def _grad_kernel(idx_ref, g_ref, out_ref, *, D, precision):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    idx = idx_ref[0]                                        # [BLK, 1] int32
    iota = jax.lax.broadcasted_iota(jnp.int32, (_BLK, D), 1)
    onehot = (iota == idx)
    g = g_ref[:]
    if precision == "default":
        onehot = onehot.astype(jnp.bfloat16)
        g = g.astype(jnp.bfloat16)
        prec = None
    else:
        onehot = onehot.astype(jnp.float32)
        prec = jax.lax.Precision.HIGHEST
    out_ref[:] += jax.lax.dot_general(
        onehot, g, dimension_numbers=(((0,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("D", "precision", "interpret"))
def line_grad_matmul(idx, g, D, precision="highest", interpret=False):
    """``zeros([D, C]).at[idx].add(g)`` as a blocked one-hot matmul.

    idx: [N] int32 in [0, D); g: [N, C] f32. Returns [D, C] f32.
    """
    N, C = g.shape
    pad = -N % _BLK
    # padded rows carry g == 0, so their (valid-index) one-hot rows add 0
    idx_p = jnp.pad(idx, (0, pad)).reshape(-1, _BLK, 1)
    g_p = jnp.pad(g, ((0, pad), (0, 0)))
    nblk = idx_p.shape[0]
    kernel = functools.partial(_grad_kernel, D=D, precision=precision)
    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, _BLK, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((_BLK, C), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((D, C), lambda b: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((D, C), jnp.float32),
        interpret=interpret,
    )(idx_p, g_p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def take_rows_line(table, idx, precision="highest", table_bf16=False):
    """Row gather from a small (line) table whose VJP runs on the MXU.

    Forward is a plain XLA row-take (fast, row-count-bound), optionally
    through a bf16 view of the table (the ``--triplane_bf16`` fast path,
    see triplane._take_rows_bf16); backward replaces the scatter-add
    with :func:`line_grad_matmul` on TPU.
    """
    return _fwd_take(table, idx, table_bf16)


def _fwd_take(table, idx, table_bf16):
    if table_bf16:
        return jnp.take(table.astype(jnp.bfloat16), idx, axis=0).astype(
            jnp.float32)
    return jnp.take(table, idx, axis=0)


def _take_fwd(table, idx, precision, table_bf16):
    return _fwd_take(table, idx, table_bf16), (idx, table.shape)


def _take_bwd(precision, table_bf16, res, g):
    idx, shape = res
    if use_pallas():
        d_table = line_grad_matmul(idx, g, shape[0], precision=precision,
                                    interpret=not on_tpu())
    else:
        d_table = jnp.zeros(shape, g.dtype).at[idx].add(g)
    return d_table, None


take_rows_line.defvjp(_take_fwd, _take_bwd)
