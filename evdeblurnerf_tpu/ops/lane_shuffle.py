"""Pallas lane-dimension shuffles (per-ray sample reordering).

The c2f renderer keeps per-sample tensors in UNSORTED (stratified ++
importance) order and moves only compositing scalars between orders
(models/renderer.py). XLA lowers ``jnp.take_along_axis`` over the sample
axis to a full row-gather — ~17-25 ns per *element* row on v5e, ~160 ms
of a 1.09 s train step (PERF_NOTES.md). On TPU the same shuffle is a
single-vreg lane gather (Mosaic ``tpu.dynamic_gather``), measured at
~2 ns/point: these kernels block [rows, 128] tiles through VMEM and do
the pick in-register.

Used for:
* sigma/weights order moves in ``VoxelNeRF.__call__`` (the inverse move
  previously paid a full ``lax.sort``);
* the AWP per-sample feature reorder ([R, C, S] blocks);
* the 4 inverse-CDF gathers in ``ops/sample_pdf.py`` (under
  ``stop_gradient`` in the train graph, so forward-only).

Gradients: a permutation gather's VJP is the gather by the inverse
permutation, so callers pass both (``permute_lanes``). The renderer
already owns both orders (it sorts once and inverts once per batch).

ref: networks/renderer.py:205-213 sorts then evaluates; this module is
part of the TPU-native reformulation that renders those row-gathers
unnecessary (see also models/renderer.py:306-318).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.sharding import PartitionSpec as P

from ..parallel.compat import shard_map_norep

LANES = 128
_BLOCK_ROWS = 1024


def _target_platform() -> str:
    """Platform the traced program will actually run on.

    ``jax.default_backend()`` reports the process-global default, which
    stays 'tpu' when the multichip dryrun pins ``jax_default_device`` to a
    virtual CPU device in the same process — keying off the pinned device
    (when set) is what makes the interpret decision match the real target.
    """
    dev = jax.config.jax_default_device
    if dev is not None:
        # jax also accepts a plain string here ('cpu', 'tpu:0', ...)
        if isinstance(dev, str):
            return dev.split(":")[0].lower()
        return dev.platform
    return jax.default_backend()


def use_pallas() -> bool:
    """Lane kernels run on TPU; CPU (tests, multichip dryrun) can opt into
    interpret mode via ``EVDN_LANE_KERNELS_INTERPRET=1`` (exact same kernel
    code path, Pallas interpreter backend) or falls back to jnp."""
    if os.environ.get("EVDN_DISABLE_LANE_KERNELS"):
        return False
    if _target_platform() == "tpu":
        return True
    return bool(os.environ.get("EVDN_LANE_KERNELS_INTERPRET"))


def on_tpu() -> bool:
    """True when the traced program targets a real TPU. Pallas callers must
    pass ``interpret=not on_tpu()`` to their ``pallas_call`` whenever
    ``use_pallas()`` is True: on a non-TPU target ``use_pallas()`` can be
    True via ``EVDN_LANE_KERNELS_INTERPRET``, and dispatching a
    non-interpreted Mosaic kernel there is a compile error."""
    return _target_platform() == "tpu"


def _interpret_default() -> bool:
    """Interpret-mode Pallas for non-TPU targets that opted in."""
    return (not on_tpu()
            and bool(os.environ.get("EVDN_LANE_KERNELS_INTERPRET")))


# ---------------------------------------------------------------------------
# SPMD composition: pallas_call has no GSPMD partitioning rule, so under a
# multi-device jit GSPMD would all-gather the operands around the kernel.
# Every kernel here is row-parallel (rows = rays), so the train loop
# registers its data-parallel mesh and the kernels wrap themselves in
# shard_map over the batch axis — each device runs the kernel on its own
# row shard, no collectives.
# ---------------------------------------------------------------------------

_MESH = None          # (Mesh, axis_name) registered by the train loop
_IN_SHARD_MAP = False  # guard against nested shard_map


def set_mesh(mesh, axis_name="data"):
    """Register the data-parallel mesh the lane kernels should shard over
    (None to clear). Called by the train loop / dryrun after mesh setup."""
    global _MESH
    _MESH = None if mesh is None else (mesh, axis_name)


def _shmap_rows(fn, n_in, n_out, rows):
    """Wrap ``fn`` (row-parallel, leading axis = rows) in shard_map over the
    registered mesh when the row count divides evenly; identity otherwise."""
    global _IN_SHARD_MAP
    if _MESH is None or _IN_SHARD_MAP:
        return fn
    mesh, axis = _MESH
    n_dev = mesh.shape[axis]
    if n_dev <= 1 or rows % n_dev != 0:
        return fn
    spec = P(axis)

    def wrapped(*args):
        global _IN_SHARD_MAP
        inner = shard_map_norep(
            fn, mesh=mesh, in_specs=(spec,) * n_in,
            out_specs=(spec,) * n_out if n_out > 1 else spec)
        _IN_SHARD_MAP = True
        try:
            return inner(*args)
        finally:
            _IN_SHARD_MAP = False

    return wrapped


# ---------------------------------------------------------------------------
# 2-D: x [M, S], idx [M, S2] -> out [M, S2]   (S, S2 <= 128)
# ---------------------------------------------------------------------------

def _take2d_kernel(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _lane_take_2d(x, idx, interpret=False):
    M, S = x.shape
    S2 = idx.shape[1]
    xp = jnp.pad(x, ((0, -M % _BLOCK_ROWS), (0, LANES - S)))
    ip = jnp.pad(idx, ((0, -M % _BLOCK_ROWS), (0, LANES - S2)))
    Mp = xp.shape[0]
    out = pl.pallas_call(
        _take2d_kernel,
        grid=(Mp // _BLOCK_ROWS,),
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, LANES), lambda m: (m, 0)),
            pl.BlockSpec((_BLOCK_ROWS, LANES), lambda m: (m, 0)),
        ],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, LANES), lambda m: (m, 0)),
        out_shape=jax.ShapeDtypeStruct((Mp, LANES), x.dtype),
        interpret=interpret,
    )(xp, ip)
    return out[:M, :S2]


# ---------------------------------------------------------------------------
# 3-D: x [R, C, S], idx [R, S2] -> out [R, C, S2]  (shared pick per ray)
# ---------------------------------------------------------------------------

def _take3d_kernel(x_ref, i_ref, o_ref, *, G):
    for g in range(G):
        idx = i_ref[g]                                   # [LANES]
        pick = jnp.broadcast_to(idx[None, :], x_ref.shape[1:])
        o_ref[g] = jnp.take_along_axis(x_ref[g], pick, axis=-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _lane_take_3d(x, idx, interpret=False):
    R, C, S = x.shape
    S2 = idx.shape[1]
    G = 8
    xp = jnp.pad(x, ((0, -R % G), (0, 0), (0, LANES - S)))
    ip = jnp.pad(idx, ((0, -R % G), (0, LANES - S2)))
    Rp = xp.shape[0]
    kernel = functools.partial(_take3d_kernel, G=G)
    out = pl.pallas_call(
        kernel,
        grid=(Rp // G,),
        in_specs=[
            pl.BlockSpec((G, C, LANES), lambda r: (r, 0, 0)),
            pl.BlockSpec((G, LANES), lambda r: (r, 0)),
        ],
        out_specs=pl.BlockSpec((G, C, LANES), lambda r: (r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Rp, C, LANES), x.dtype),
        interpret=interpret,
    )(xp, ip)
    return out[:R, :, :S2]


def _take_impl(x, idx, interpret=False, force_jnp=False):
    """Dispatch: Pallas lane gather on TPU, jnp elsewhere.

    The lane kernels hold one sample axis per 128-lane vreg, so configs
    with a sample axis wider than 128 (e.g. N_samples+N_importance > 128)
    take the jnp path — correct at any width, just without the kernel.
    """
    wide = x.shape[-1] > LANES or idx.shape[-1] > LANES
    if force_jnp or wide or not (use_pallas() or interpret):
        if x.ndim == 3:
            return jnp.take_along_axis(x, idx[:, None, :], axis=-1)
        return jnp.take_along_axis(x, idx, axis=-1)
    interpret = interpret or _interpret_default()
    take = _lane_take_3d if x.ndim == 3 else _lane_take_2d
    fn = _shmap_rows(functools.partial(take, interpret=interpret),
                     n_in=2, n_out=1, rows=x.shape[0])
    return fn(x, idx)


# ---------------------------------------------------------------------------
# differentiable permutation move
# ---------------------------------------------------------------------------

@jax.custom_vjp
def permute_lanes(x, perm, inv_perm):
    """``out[..., i] = x[..., perm[..., i]]`` along the last axis.

    x: [R, S] or [R, C, S]; perm/inv_perm: [R, S] int32 with
    ``perm[inv_perm] == iota`` (a true permutation — the VJP is the
    gather by ``inv_perm``). Sample axes wider than 128 lanes fall back
    to the jnp path (see ``_take_impl``).
    """
    return _take_impl(x, perm)


def _permute_fwd(x, perm, inv_perm):
    return permute_lanes(x, perm, inv_perm), (perm, inv_perm)


def _permute_bwd(res, g):
    perm, inv_perm = res
    return _take_impl(g, inv_perm), None, None


permute_lanes.defvjp(_permute_fwd, _permute_bwd)


def sort_with_perm(keys):
    """Sort ``keys`` [R, S] ascending; returns (sorted, perm, inv_perm)
    with ``sorted[i] == keys[perm[i]]``. One extra [R, S] integer sort
    buys the inverse, after which every order move in the batch is a
    lane gather instead of a sort or row gather."""
    R, S = keys.shape
    iota = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (R, S))
    sorted_keys, perm = jax.lax.sort((keys, iota), dimension=-1, num_keys=1)
    _, inv_perm = jax.lax.sort((perm, iota), dimension=-1, num_keys=1)
    return sorted_keys, perm, inv_perm


# ---------------------------------------------------------------------------
# forward-only fused inverse-CDF gathers (sample_pdf hot path)
# ---------------------------------------------------------------------------

def _cdf_kernel(cdf_ref, bins_ref, below_ref, above_ref,
                cb_ref, ca_ref, bb_ref, ba_ref):
    below = below_ref[:]
    above = above_ref[:]
    cb_ref[:] = jnp.take_along_axis(cdf_ref[:], below, axis=-1)
    ca_ref[:] = jnp.take_along_axis(cdf_ref[:], above, axis=-1)
    bb_ref[:] = jnp.take_along_axis(bins_ref[:], below, axis=-1)
    ba_ref[:] = jnp.take_along_axis(bins_ref[:], above, axis=-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cdf_take_pallas(cdf, bins, below, above, interpret=False):
    R, M = cdf.shape
    N = below.shape[1]
    B = _BLOCK_ROWS
    pad_r = -R % B
    cdfp = jnp.pad(cdf, ((0, pad_r), (0, LANES - M)))
    # at the sample_pdf call site cdf and bins have the same width [R, M];
    # pad independently anyway so the kernel tolerates either convention
    binsp = jnp.pad(bins, ((0, pad_r), (0, LANES - bins.shape[1])))
    belowp = jnp.pad(below, ((0, pad_r), (0, LANES - N)))
    abovep = jnp.pad(above, ((0, pad_r), (0, LANES - N)))
    Rp = cdfp.shape[0]
    spec = pl.BlockSpec((B, LANES), lambda m: (m, 0))
    sds = jax.ShapeDtypeStruct((Rp, LANES), cdf.dtype)
    outs = pl.pallas_call(
        _cdf_kernel,
        grid=(Rp // B,),
        in_specs=[spec] * 4,
        out_specs=[spec] * 4,
        out_shape=[sds] * 4,
        interpret=interpret,
    )(cdfp, binsp, belowp, abovep)
    return tuple(o[:R, :N] for o in outs)


def cdf_take(cdf, bins, below, above, interpret=False):
    """The four ``take_along_axis`` of inverse-CDF sampling in one pass.

    Forward-only (the caller's output sits under ``stop_gradient`` in the
    train graph, matching the reference's ``.detach()``,
    ref: utils/rays.py:188). Returns (cdf_below, cdf_above, bins_below,
    bins_above), each [R, N].
    """
    wide = max(cdf.shape[1], bins.shape[1], below.shape[1]) > LANES
    if wide or not (use_pallas() or interpret):
        cb = jnp.take_along_axis(cdf, below, axis=-1)
        ca = jnp.take_along_axis(cdf, above, axis=-1)
        bb = jnp.take_along_axis(bins, below, axis=-1)
        ba = jnp.take_along_axis(bins, above, axis=-1)
        return cb, ca, bb, ba
    interpret = interpret or _interpret_default()
    fn = _shmap_rows(functools.partial(_cdf_take_pallas, interpret=interpret),
                     n_in=4, n_out=4, rows=cdf.shape[0])
    return fn(cdf, bins, below, above)
