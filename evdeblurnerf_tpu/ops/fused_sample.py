"""Fused tri-plane sampling: all interpolation arithmetic in two Pallas
kernels, leaving XLA only pure row-takes and pure scatter-adds.

Motivation (v5e step traces, PERF_NOTES.md): with the packed sampling
written as jnp ops, XLA splinters the tent-weight/pair-select chains
into dozens of loop fusions plus layout copies (~190 ms fwd+bwd of a
0.94 s step), and fuses the backward epilogues INTO the scatter-adds,
which drags the scatters to 13-34 ns/row. Replacing single ops
piecemeal makes it worse (measured: a custom-VJP line-scatter swap cost
+240 ms by breaking those fusions differently). The stable design moves
the *entire* per-point interpolation into Pallas:

  forward:  f-coords + rows (6 XLA takes)  -> feats [N, C0+C1+C2]
  backward: f-coords + rows + g -> d_rows (6) + d_fcoords [N, 9]

Design notes (all measured, see PERF_NOTES.md round-2):
* the kernel consumes pre-scaled texel coordinates [N, 9] — a private
  dead-end array — NOT xyz [N, 3]: a Pallas operand forces a {1,0}
  layout, and routing the *shared* xyz through the kernel flipped the
  positional-encoding chains into 3-lane layouts (sin/cos 15 -> 267 ms);
* interpolation uses per-SLOT scalar weights: the packed row holds the
  (base, base+1) texel pair, so the corner weights collapse to slot
  weights via [N, 1] selects, and each projection is 4 wide FMAs
  (plane) + 2 (line) instead of a [N, C]-wide select ladder;
* residuals are f-coords + gathered rows only; the paper-scale step
  sits within ~2M of the 15.75G HBM ceiling.

Bilinear semantics match ops/triplane.grid_sample_{2d,1d}_packed
(same weights/validity; the slot-weight factoring reorders f32 adds, so
results agree to ~1e-6 relative rather than bitwise;
tests/test_fused_sample.py checks values and all three gradients).

ref: networks/pdrf/voxnerf.py:132-151 (the grid_sample pair this
implements), same conventions as ops/triplane.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from . import triplane
from .lane_shuffle import on_tpu

# rows per grid step; inputs + the [BLK, C]-wide live values must stay
# under the 16M scoped-vmem limit (bwd holds ~2x the fwd live set:
# 512 was measured 376K over for bwd, fine for fwd)
_BLK_F = 512
_BLK_B = 256


def _slot_weights(f, size):
    """Per-slot weights for a packed (base, base+1) pair at coord f.

    Returns (s0, s1): f's two tent weights (with zeros-padding validity)
    routed to the slots they land in. All [BLK, 1].
    """
    f0 = jnp.floor(f)
    frac = f - f0
    base = jnp.clip(f0, 0, size - 2)
    off0 = (f0 == base)                    # corner0 sits at slot0
    valid0 = ((f0 >= 0) & (f0 <= size - 1)).astype(f.dtype)
    valid1 = ((f0 + 1 >= 0) & (f0 + 1 <= size - 1)).astype(f.dtype)
    w0 = (1.0 - frac) * valid0
    w1 = frac * valid1
    s0 = jnp.where(off0, w0, w1)
    s1 = jnp.where(off0, w1, w0)
    return s0, s1


def _slot_weights_bwd(f, size, d_s0, d_s1):
    """d(loss)/d_f given slot-weight cotangents (mirror of _slot_weights)."""
    f0 = jnp.floor(f)
    base = jnp.clip(f0, 0, size - 2)
    off0 = (f0 == base)
    valid0 = ((f0 >= 0) & (f0 <= size - 1)).astype(f.dtype)
    valid1 = ((f0 + 1 >= 0) & (f0 + 1 <= size - 1)).astype(f.dtype)
    d_w0 = jnp.where(off0, d_s0, d_s1)
    d_w1 = jnp.where(off0, d_s1, d_s0)
    return -d_w0 * valid0 + d_w1 * valid1


def _proj_scalars(fc, i):
    """The (fx, fy, fl) columns of the coord block for projection i."""
    return fc[:, 3 * i:3 * i + 1], fc[:, 3 * i + 1:3 * i + 2], \
        fc[:, 3 * i + 2:3 * i + 3]


def _fwd_kernel(fc_ref, p0, p1, p2, l0, l1, l2, out_ref, *, all_sizes):
    fc = fc_ref[:]
    outs = []
    for i, (pr, lr) in enumerate(((p0, l0), (p1, l1), (p2, l2))):
        H, W, D = all_sizes[i]
        fx, fy, fl = _proj_scalars(fc, i)
        sx0, sx1 = _slot_weights(fx, W)
        sy0, sy1 = _slot_weights(fy, H)
        q0, q1 = _slot_weights(fl, D)
        rp = pr[:].astype(jnp.float32)
        rl = lr[:].astype(jnp.float32)
        C = rl.shape[-1] // 2
        pf = (rp[:, :C] * (sy0 * sx0) + rp[:, C:2 * C] * (sy0 * sx1)
              + rp[:, 2 * C:3 * C] * (sy1 * sx0)
              + rp[:, 3 * C:] * (sy1 * sx1))
        lf = rl[:, :C] * q0 + rl[:, C:] * q1
        outs.append(pf * lf)
    out_ref[:] = jnp.concatenate(outs, axis=-1)


def _bwd_kernel(fc_ref, p0, p1, p2, l0, l1, l2, g_ref,
                dp0, dp1, dp2, dl0, dl1, dl2, dfc_ref, *, all_sizes):
    fc = fc_ref[:]
    g = g_ref[:]
    d_cols = []
    off = 0
    for i, (pr, lr, dpr, dlr) in enumerate((
            (p0, l0, dp0, dl0), (p1, l1, dp1, dl1), (p2, l2, dp2, dl2))):
        H, W, D = all_sizes[i]
        fx, fy, fl = _proj_scalars(fc, i)
        sx0, sx1 = _slot_weights(fx, W)
        sy0, sy1 = _slot_weights(fy, H)
        q0, q1 = _slot_weights(fl, D)
        rp = pr[:].astype(jnp.float32)
        rl = lr[:].astype(jnp.float32)
        C = rl.shape[-1] // 2
        p00 = sy0 * sx0
        p01 = sy0 * sx1
        p10 = sy1 * sx0
        p11 = sy1 * sx1
        s00, s01 = rp[:, :C], rp[:, C:2 * C]
        s10, s11 = rp[:, 2 * C:3 * C], rp[:, 3 * C:]
        pf = s00 * p00 + s01 * p01 + s10 * p10 + s11 * p11
        lv0, lv1 = rl[:, :C], rl[:, C:]
        lf = lv0 * q0 + lv1 * q1
        gi = g[:, off:off + C]
        off += C
        d_pf = gi * lf
        d_lf = gi * pf
        dlr[:] = jnp.concatenate([d_lf * q0, d_lf * q1], -1)
        d_q0 = jnp.sum(d_lf * lv0, -1, keepdims=True)
        d_q1 = jnp.sum(d_lf * lv1, -1, keepdims=True)
        dpr[:] = jnp.concatenate(
            [d_pf * p00, d_pf * p01, d_pf * p10, d_pf * p11], -1)
        d_p00 = jnp.sum(d_pf * s00, -1, keepdims=True)
        d_p01 = jnp.sum(d_pf * s01, -1, keepdims=True)
        d_p10 = jnp.sum(d_pf * s10, -1, keepdims=True)
        d_p11 = jnp.sum(d_pf * s11, -1, keepdims=True)
        d_sx0 = d_p00 * sy0 + d_p10 * sy1
        d_sx1 = d_p01 * sy0 + d_p11 * sy1
        d_sy0 = d_p00 * sx0 + d_p01 * sx1
        d_sy1 = d_p10 * sx0 + d_p11 * sx1
        d_cols.append(_slot_weights_bwd(fx, W, d_sx0, d_sx1))
        d_cols.append(_slot_weights_bwd(fy, H, d_sy0, d_sy1))
        d_cols.append(_slot_weights_bwd(fl, D, d_q0, d_q1))
    dfc_ref[:] = jnp.concatenate(d_cols, -1)


def _specs(widths, blk):
    return [pl.BlockSpec((blk, w), lambda b: (b, 0)) for w in widths]


def _pad_rows(arrs, n_pad):
    return [jnp.pad(a, ((0, n_pad), (0, 0))) for a in arrs]


@functools.partial(jax.jit, static_argnames=("all_sizes", "interpret"))
def _fused_fwd_call(fcoords, rows, all_sizes, interpret=False):
    N = fcoords.shape[0]
    pad = -N % _BLK_F
    Cs = [r.shape[-1] // 4 for r in rows[:3]]
    inputs = _pad_rows([fcoords, *rows], pad)
    widths = [a.shape[-1] for a in inputs]
    kernel = functools.partial(_fwd_kernel, all_sizes=all_sizes)
    out = pl.pallas_call(
        kernel,
        grid=((N + pad) // _BLK_F,),
        in_specs=_specs(widths, _BLK_F),
        out_specs=pl.BlockSpec((_BLK_F, sum(Cs)), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((N + pad, sum(Cs)), jnp.float32),
        interpret=interpret,
    )(*inputs)
    return out[:N]


@functools.partial(jax.jit, static_argnames=("all_sizes", "interpret"))
def _fused_bwd_call(fcoords, rows, g, all_sizes, interpret=False):
    N = fcoords.shape[0]
    pad = -N % _BLK_B
    inputs = _pad_rows([fcoords, *rows, g], pad)
    widths = [a.shape[-1] for a in inputs]
    row_widths = [r.shape[-1] for r in rows]
    kernel = functools.partial(_bwd_kernel, all_sizes=all_sizes)
    outs = pl.pallas_call(
        kernel,
        grid=((N + pad) // _BLK_B,),
        in_specs=_specs(widths, _BLK_B),
        out_specs=_specs(row_widths + [9], _BLK_B),
        out_shape=[jax.ShapeDtypeStruct((N + pad, w), jnp.float32)
                   for w in row_widths]
        + [jax.ShapeDtypeStruct((N + pad, 9), jnp.float32)],
        interpret=interpret,
    )(*inputs)
    return [o[:N] for o in outs]


# ---------------------------------------------------------------------------
# public entry: custom-VJP sampling over packed grids
# ---------------------------------------------------------------------------

def _fcoords_and_indices(xyz, all_sizes):
    """Texel-space coords [N, 9] and the 6 take/scatter index streams
    ([N] int32 each). XLA side; [N]-wide lane-major chains."""
    fcols = []
    idxs = []
    for i in range(3):
        H, W, D = all_sizes[i]
        m0, m1 = triplane.MAT_MODE[i]
        v = triplane.VEC_MODE[i]
        fx = (xyz[:, m0] + 1.0) * 0.5 * (W - 1)
        fy = (xyz[:, m1] + 1.0) * 0.5 * (H - 1)
        fl = (xyz[:, v] + 1.0) * 0.5 * (D - 1)
        fcols += [fx, fy, fl]
        bx = jnp.clip(jnp.floor(fx), 0, W - 2).astype(jnp.int32)
        by = jnp.clip(jnp.floor(fy), 0, H - 2).astype(jnp.int32)
        bl = jnp.clip(jnp.floor(fl), 0, D - 2).astype(jnp.int32)
        idxs.append(by * W + bx)
        idxs.append(bl)
    return jnp.stack(fcols, axis=-1), idxs


def _d_fcoords_to_d_xyz(d_fc, all_sizes):
    """Chain d(texel coords) back to d(xyz) (pure [N]-wide math)."""
    d_xyz = [0.0, 0.0, 0.0]
    for i in range(3):
        H, W, D = all_sizes[i]
        m0, m1 = triplane.MAT_MODE[i]
        v = triplane.VEC_MODE[i]
        d_xyz[m0] += d_fc[:, 3 * i] * (0.5 * (W - 1))
        d_xyz[m1] += d_fc[:, 3 * i + 1] * (0.5 * (H - 1))
        d_xyz[v] += d_fc[:, 3 * i + 2] * (0.5 * (D - 1))
    return jnp.stack(d_xyz, axis=-1)


def _all_sizes(planes, lines):
    return tuple((planes[i].shape[1], planes[i].shape[2], lines[i].shape[1])
                 for i in range(3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_triplane_features(planes, lines, xyz, table_bf16=False):
    """Packed-grid tri-plane features with the fused-kernel fwd/bwd.

    planes/lines: raw grids ([C, H, W] / [C, D]) — packing happens
    inside so its transpose (the shifted-adds back to raw layout) stays
    in XLA where it streams. xyz: [N, 3] normalized to [-1, 1].
    Semantics equal ops/triplane.triplane_features_packed(pack_grids(.))
    to f32 reordering (~1e-6).
    """
    out, _ = _fused_fwd(planes, lines, xyz, table_bf16)
    return out


def _take6(pp, pl_, idxs):
    rows = [jnp.take(pp[i][0], idxs[2 * i], axis=0) for i in range(3)]
    rows += [jnp.take(pl_[i][0], idxs[2 * i + 1], axis=0) for i in range(3)]
    return rows


def _fused_fwd(planes, lines, xyz, table_bf16):
    sizes = _all_sizes(planes, lines)
    pp, pl_ = triplane.pack_grids(planes, lines)
    if table_bf16:
        pp = [(p.astype(jnp.bfloat16), h, w) for p, h, w in pp]
        pl_ = [(p.astype(jnp.bfloat16), d) for p, d in pl_]
    fcoords, idxs = _fcoords_and_indices(xyz, sizes)
    rows = _take6(pp, pl_, idxs)
    interpret = not on_tpu()
    out = _fused_fwd_call(fcoords, rows, sizes, interpret=interpret)
    res = (fcoords, rows, [p.shape for p in planes], [l.shape for l in lines])
    return out, res


def _fused_fwd_rule(planes, lines, xyz, table_bf16):
    return _fused_fwd(planes, lines, xyz, table_bf16)


def _fused_bwd_rule(table_bf16, res, g):
    fcoords, rows, plane_shapes, line_shapes = res
    sizes = tuple((ps[1], ps[2], ls[1])
                  for ps, ls in zip(plane_shapes, line_shapes))
    interpret = not on_tpu()
    outs = _fused_bwd_call(fcoords, rows, g, sizes, interpret=interpret)
    d_rows, d_fc = outs[:6], outs[6]

    # indices recomputed from the saved f-coords (cheap [N] chains)
    d_planes = []
    d_lines = []
    for i in range(3):
        H, W, D = sizes[i]
        fx = fcoords[:, 3 * i]
        fy = fcoords[:, 3 * i + 1]
        fl = fcoords[:, 3 * i + 2]
        bx = jnp.clip(jnp.floor(fx), 0, W - 2).astype(jnp.int32)
        by = jnp.clip(jnp.floor(fy), 0, H - 2).astype(jnp.int32)
        bl = jnp.clip(jnp.floor(fl), 0, D - 2).astype(jnp.int32)
        # scatter into the packed layout, then differentiate the packing
        # (cheap shifted adds) via jax.vjp of pack_plane/pack_line
        d_packed = jnp.zeros((H * W, 4 * plane_shapes[i][0]),
                             jnp.float32).at[by * W + bx].add(d_rows[i])
        _, vjp_fn = jax.vjp(triplane.pack_plane,
                            jnp.zeros(plane_shapes[i], jnp.float32))
        d_planes.append(vjp_fn(d_packed)[0])
        d_packed_l = jnp.zeros((D, 2 * line_shapes[i][0]),
                               jnp.float32).at[bl].add(d_rows[3 + i])
        _, vjp_fn = jax.vjp(triplane.pack_line,
                            jnp.zeros(line_shapes[i], jnp.float32))
        d_lines.append(vjp_fn(d_packed_l)[0])

    return d_planes, d_lines, _d_fcoords_to_d_xyz(d_fc, sizes)


fused_triplane_features.defvjp(_fused_fwd_rule, _fused_bwd_rule)
