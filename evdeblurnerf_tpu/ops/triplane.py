"""TensoRF tri-plane / line factored-grid sampling.

TPU-native replacement for the reference's ``F.grid_sample`` lookups
(ref: networks/pdrf/voxnerf.py:132-151): bilinear interpolation with
``align_corners=True`` semantics and zeros padding, written as 4 batched
row-gathers per plane so XLA lowers it to dynamic-gather + fused FMA on the
VPU. The gradient (scatter-add into the grids) falls out of autodiff and is
deterministic on XLA:TPU — the reference explicitly flags torch's
grid_sample backward as non-deterministic (ref: voxnerf.py:144).

Conventions match torch.nn.functional.grid_sample: a coordinate pair (x, y)
in [-1, 1] indexes (width, height) = (last, second-to-last) grid dims.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp

# line-table gradient precision under --triplane_bf16 + line_matmul:
# "default" lets autodiff reuse the bf16 forward dot form — the incoming
# gradients round to bf16 (~6x faster MXU pass; the measured and
# quality-validated default); "highest" forces an exact-f32 backward via
# custom_vjp (parity-debugging escape hatch). f32 tables are always exact.
LINE_GRAD_PRECISION = os.environ.get("EVDN_LINE_GRAD_PRECISION", "default")

# Plane/line axis assignment (ref: voxnerf.py:99-100).
MAT_MODE = ((0, 1), (0, 2), (1, 2))
VEC_MODE = (2, 1, 0)


def grid_sample_2d(plane, x, y):
    """Bilinear sample of ``plane`` [C, H, W] at (x, y) each [N] in [-1, 1].

    align_corners=True, zeros padding. Returns [N, C].
    """
    C, H, W = plane.shape
    fx = (x + 1.0) * 0.5 * (W - 1)
    fy = (y + 1.0) * 0.5 * (H - 1)

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx1 = fx - x0
    wy1 = fy - y0

    plane_flat = plane.reshape(C, H * W).T  # [H*W, C]

    out = 0.0
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        xi = x0 + dx
        yi = y0 + dy
        w = ((wx1 if dx else 1.0 - wx1) * (wy1 if dy else 1.0 - wy1))
        valid = ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1))
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        vals = jnp.take(plane_flat, yi_c * W + xi_c, axis=0)  # [N, C]
        out = out + (w * valid.astype(plane.dtype))[:, None] * vals
    return out


def grid_sample_1d(line, y):
    """Linear sample of ``line`` [C, D] at y [N] in [-1, 1].

    Equivalent to the reference's grid_sample over a [1, C, D, 1] grid with
    x pinned to 0 (ref: voxnerf.py:137-140, 147-148). Returns [N, C].
    """
    C, D = line.shape
    fy = (y + 1.0) * 0.5 * (D - 1)
    y0 = jnp.floor(fy)
    wy1 = fy - y0

    line_t = line.T  # [D, C]
    out = 0.0
    for dy in (0, 1):
        yi = y0 + dy
        w = wy1 if dy else 1.0 - wy1
        valid = (yi >= 0) & (yi <= D - 1)
        yi_c = jnp.clip(yi, 0, D - 1).astype(jnp.int32)
        vals = jnp.take(line_t, yi_c, axis=0)
        out = out + (w * valid.astype(line.dtype))[:, None] * vals
    return out


def triplane_features(planes: Sequence[jnp.ndarray], lines: Sequence[jnp.ndarray],
                      xyz: jnp.ndarray) -> jnp.ndarray:
    """Factored appearance features: concat_i plane_i(xy) * line_i(z).

    planes: 3 arrays [C_i, H_i, W_i]; lines: 3 arrays [C_i, D_i];
    xyz: [N, 3] normalized to [-1, 1]. Returns [N, sum(C_i)].
    (ref: voxnerf.py:132-151, before the basis matmul)
    """
    feats = []
    for i in range(3):
        m0, m1 = MAT_MODE[i]
        plane_feat = grid_sample_2d(planes[i], xyz[:, m0], xyz[:, m1])
        line_feat = grid_sample_1d(lines[i], xyz[:, VEC_MODE[i]])
        feats.append(plane_feat * line_feat)
    return jnp.concatenate(feats, axis=-1)


# ---------------------------------------------------------------------------
# neighbor-packed fast path
# ---------------------------------------------------------------------------
#
# TPU gathers cost a fixed ~10-25 ns per gathered row regardless of row
# width (measured on v5e: 2M-row takes of 64/128/256 floats all land within
# 2x), so the classic 4-corner + 2-end formulation above pays 18 gather ops
# per tri-plane sample. The packed path pre-concatenates each texel's
# (y,x),(y,x+1),(y+1,x),(y+1,x+1) block into one [H*W, 4C] row (lines:
# (d),(d+1) into [D, 2C]) once per step — a cheap shift+concat that XLA
# streams at HBM speed — and then needs ONE take per plane and per line:
# 6 gathers per sample, 3x fewer. The backward scatter benefits identically
# (one scatter-add of wide rows; the packing shifts transpose to cheap
# shifted adds under autodiff, deterministically).

@jax.custom_vjp
def _take_rows_bf16(table, idx):
    """Row gather through a bfloat16 view of ``table`` (f32 in/out).

    TPU row gathers are row-count-bound but still ~25% faster on bf16 rows
    (measured, PERF_NOTES.md); the one-time f32->bf16 cast of the table
    streams at HBM speed and is CSE'd across every sample() call in a step.
    The backward stays the exact f32 scatter-add — only forward *values*
    see bf16 rounding.
    """
    return table.astype(jnp.bfloat16).at[idx].get(
        mode="promise_in_bounds").astype(jnp.float32)


def _take_rows_bf16_fwd(table, idx):
    return _take_rows_bf16(table, idx), (idx, table.shape)


def _take_rows_bf16_bwd(res, g):
    idx, shape = res
    d_table = jnp.zeros(shape, jnp.float32).at[idx].add(g)
    return d_table, None


_take_rows_bf16.defvjp(_take_rows_bf16_fwd, _take_rows_bf16_bwd)


def _take_rows(table, idx, bf16=False, out_bf16=False):
    # indices are clipped in _axis_setup, so the gather can skip jnp.take's
    # default out-of-bounds fill — its guard is a [N, 4C]-wide select_n
    # measured at ~31 ms/step (zeros-padding validity lives in the weights)
    if out_bf16:
        # eval-only: rows stay bf16 so the interpolation FMAs run at
        # native bf16 width — the [N, 4C] f32 convert + layout copy of the
        # gathered rows alone cost ~8 ms per eval chunk (trace_eval.py).
        # No custom_vjp: this path is never differentiated.
        return table.astype(jnp.bfloat16).at[idx].get(
            mode="promise_in_bounds")
    if bf16:
        return _take_rows_bf16(table, idx)
    return table.at[idx].get(mode="promise_in_bounds")


def pack_plane(plane):
    """[C, H, W] -> [H*W, 4C] neighbor-packed rows (zero pad at + edges)."""
    p = jnp.moveaxis(plane, 0, -1)                    # [H, W, C]
    zx = jnp.zeros_like(p[:, :1])
    p01 = jnp.concatenate([p[:, 1:], zx], axis=1)     # (y, x+1)
    top = jnp.concatenate([p, p01], axis=-1)          # [H, W, 2C]
    zy = jnp.zeros_like(top[:1])
    bot = jnp.concatenate([top[1:], zy], axis=0)      # (y+1, ...)
    packed = jnp.concatenate([top, bot], axis=-1)     # [H, W, 4C]
    return packed.reshape(p.shape[0] * p.shape[1], -1)


def pack_line(line):
    """[C, D] -> [D, 2C] neighbor-packed rows."""
    p = line.T                                        # [D, C]
    z = jnp.zeros_like(p[:1])
    p1 = jnp.concatenate([p[1:], z], axis=0)
    return jnp.concatenate([p, p1], axis=-1)


def _axis_setup(f, size):
    """Shared floor/clip/weight/validity logic for one axis.

    Precondition: ``f`` is finite. The clip below keeps every index the
    gather sees in [0, size-2], which is what lets ``_take_rows`` use
    ``promise_in_bounds`` — but NaN/Inf coords (e.g. an upstream density
    blowup) cast to undefined int32 and would read arbitrary table rows
    silently. Training coords come from clipped NDC/AABB mapping and are
    finite by construction; the weights also zero out any out-of-domain
    contribution.

    Returns (base row index in [0, size-2], offset in {-1,0,1}, w0, w1)
    where w includes the zeros-padding validity, and ``offset`` says where
    the two needed texels sit inside the packed (base, base+1) pair:
    offset 0 -> (slot0, slot1); +1 -> corner0 at slot1 (corner1 invalid);
    -1 -> corner1 at slot0 (corner0 invalid).
    """
    f0 = jnp.floor(f)
    frac = f - f0
    base = jnp.clip(f0, 0, size - 2)
    offset = f0 - base                                # {-1, 0, +1} in range
    valid0 = (f0 >= 0) & (f0 <= size - 1)
    valid1 = (f0 + 1 >= 0) & (f0 + 1 <= size - 1)
    w0 = (1.0 - frac) * valid0
    w1 = frac * valid1
    return base.astype(jnp.int32), offset, w0, w1


def _slot_weights(f, size):
    """Per-slot weights for the packed (base, base+1) texel pair at f.

    The tent weights (with zeros-padding validity) are routed to the
    slots their corners land in via [N]-wide scalar selects, so the wide
    [N, C] work downstream is pure FMAs — no [N, C] select ladders
    (measured: the select_n fusions alone were ~31 ms/step).
    Returns (base_index, s0, s1).
    """
    b, off, w0, w1 = _axis_setup(f, size)
    off0 = (off == 0.0)
    s0 = jnp.where(off0, w0, w1)
    s1 = jnp.where(off0, w1, w0)
    return b, s0, s1


# NOTE on an investigated non-option (tools/probe_gather_locality.py):
# XLA VMEM-promotes small gather tables (the 28-46 MB coarse/16-comp
# tables run at 2-3 ns/row) while the 187 MB fine 64-comp plane pays the
# 13-15 ns/row HBM row-issue floor. Splitting it into four per-corner
# [H*W, C] slices (47 MB each, weighted-sum recombination) won 49.6 vs
# 62.6 ms in an isolated probe — but in the real eval program XLA could
# only promote ONE slice (the budget is already spent on the other
# tables); the remaining three paid full HBM row-issue on 4.19M rows
# EACH, and the chunk regressed 239 -> 351 ms. The single packed gather's
# one-row-issue-per-point is optimal under the actual VMEM budget.


def grid_sample_2d_packed(packed, H, W, x, y, table_bf16=False,
                          compute_bf16=False):
    """Bilinear sample from a neighbor-packed plane: one gather per point.

    packed: [H*W, 4C]; x, y: [N] in [-1, 1]. Same weights/validity as
    :func:`grid_sample_2d`; the slot-weight factoring reorders the f32
    accumulation (agreement to ~1e-6 relative). With ``table_bf16`` the
    gathered rows are bf16-rounded (backward stays exact f32, see
    _take_rows_bf16). ``compute_bf16`` (eval only, not differentiable)
    additionally runs the tent FMAs in bf16 — the values were already
    bf16-rounded by the gather, so this only adds ~3 more bf16 roundings
    to the 4-term sum while dropping the [N, 4C] f32 convert + layout
    copy and halving the FMA width.
    """
    C4 = packed.shape[-1]
    C = C4 // 4
    fx = (x + 1.0) * 0.5 * (W - 1)
    fy = (y + 1.0) * 0.5 * (H - 1)
    bx, sx0, sx1 = _slot_weights(fx, W)
    by, sy0, sy1 = _slot_weights(fy, H)

    rows = _take_rows(packed, by * W + bx, bf16=table_bf16,
                      out_bf16=compute_bf16)                  # [N, 4C]
    dt = rows.dtype if compute_bf16 else jnp.float32
    return (rows[:, :C] * (sy0 * sx0).astype(dt)[:, None]
            + rows[:, C:2 * C] * (sy0 * sx1).astype(dt)[:, None]
            + rows[:, 2 * C:3 * C] * (sy1 * sx0).astype(dt)[:, None]
            + rows[:, 3 * C:] * (sy1 * sx1).astype(dt)[:, None])


def _line_rows_matmul(packed, b, table_bf16):
    """Line-row lookup as an exact one-hot MXU matmul (plain XLA).

    ``onehot(b) @ packed``: 0/1 entries are exactly representable in bf16,
    so the bf16 MXU pass returns exactly the same rows as a gather through
    a bf16 table view; autodiff turns the backward into
    ``onehot^T @ d_rows`` — a second matmul instead of the ~9 ns/row
    scatter-add. The one-hot ([N, D], D = line resolution <= ~1k) is
    rematerialized in the backward (jax.checkpoint, saves only the int32
    indices) so it never lives across the fwd/bwd boundary.

    Unlike ops/line_matmul.py (the round-2 Pallas experiment that LOST in
    the full step), this is ordinary HLO: no custom_vjp fusion barrier, no
    Pallas operand layout pinning — XLA keeps fusing the sampling epilogues
    around it. f32 mode uses HIGHEST dot precision for exact-f32 parity.
    """
    D = packed.shape[0]
    dt = jnp.bfloat16 if table_bf16 else jnp.float32
    precision = None if table_bf16 else jax.lax.Precision.HIGHEST

    def take(packed, b):
        onehot = (b[:, None] == jnp.arange(D, dtype=b.dtype)[None, :])
        return jax.lax.dot(onehot.astype(dt), packed.astype(dt),
                           precision=precision,
                           preferred_element_type=jnp.float32)

    if table_bf16 and LINE_GRAD_PRECISION == "highest":
        # EVDN_LINE_GRAD_PRECISION=highest: bf16 forward rows, EXACT f32
        # backward (the incoming gradients are NOT rounded to bf16). Kept
        # off the default path: autodiff-through-dot is the measured form,
        # and a custom_vjp boundary cost the round-2 Pallas variant its
        # fused backward epilogues.
        @jax.custom_vjp
        def take_exact(packed, b):
            return take(packed, b)

        def fwd(packed, b):
            return take(packed, b), b

        def bwd(b, g):
            onehot = (b[:, None]
                      == jnp.arange(D, dtype=b.dtype)[None, :])
            d_packed = jax.lax.dot(
                onehot.astype(jnp.float32).T, g.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            return (d_packed, None)

        take_exact.defvjp(fwd, bwd)
        return take_exact(packed, b)

    return jax.checkpoint(
        take, policy=jax.checkpoint_policies.nothing_saveable)(packed, b)


def grid_sample_1d_packed(packed, D, y, table_bf16=False, line_matmul=False,
                          compute_bf16=False):
    """Linear sample from a neighbor-packed line: one gather per point.

    packed: [D, 2C]; y: [N] in [-1, 1]. Same weights as
    :func:`grid_sample_1d` (slot-weight factoring, see above).

    ``line_matmul`` routes the row lookup through :func:`_line_rows_matmul`
    (one-hot MXU matmul; backward is a matmul instead of a scatter-add).
    Note: the round-2 Pallas variant of this idea (ops/line_matmul.py) was
    measured SLOWER in the full step (1177 vs 939 ms) because its
    custom_vjp boundary broke XLA's fused backward epilogues; the plain-XLA
    form here has no such barrier. See PERF_NOTES.md.
    """
    C = packed.shape[-1] // 2
    fy = (y + 1.0) * 0.5 * (D - 1)
    b, s0, s1 = _slot_weights(fy, D)
    if line_matmul:
        rows = _line_rows_matmul(packed, b, table_bf16)   # [N, 2C]
        if compute_bf16:
            rows = rows.astype(jnp.bfloat16)
    else:
        rows = _take_rows(packed, b, bf16=table_bf16,
                          out_bf16=compute_bf16)          # [N, 2C]
    dt = rows.dtype if compute_bf16 else jnp.float32
    return (rows[:, :C] * s0.astype(dt)[:, None]
            + rows[:, C:] * s1.astype(dt)[:, None])


def pack_grids(planes, lines):
    """Pack all three plane/line grids; returns (packed_planes with (H, W),
    packed_lines with D) ready for :func:`triplane_features_packed`."""
    pp = [(pack_plane(p), p.shape[1], p.shape[2]) for p in planes]
    pl_ = [(pack_line(l), l.shape[1]) for l in lines]
    return pp, pl_


def triplane_features_packed(packed_planes, packed_lines, xyz,
                             table_bf16=False, line_matmul=False,
                             compute_bf16=False):
    """Packed-path equivalent of :func:`triplane_features`.

    ``compute_bf16`` keeps the whole interpolation chain (gathered rows,
    tent FMAs, plane*line product, concat) in bf16 — eval-only fast path,
    see :func:`grid_sample_2d_packed`.
    """
    feats = []
    for i in range(3):
        m0, m1 = MAT_MODE[i]
        packed, H, W = packed_planes[i]
        plane_feat = grid_sample_2d_packed(packed, H, W,
                                           xyz[:, m0], xyz[:, m1],
                                           table_bf16=table_bf16,
                                           compute_bf16=compute_bf16)
        packed_l, D = packed_lines[i]
        line_feat = grid_sample_1d_packed(packed_l, D, xyz[:, VEC_MODE[i]],
                                          table_bf16=table_bf16,
                                          line_matmul=line_matmul,
                                          compute_bf16=compute_bf16)
        feats.append(plane_feat * line_feat)
    return jnp.concatenate(feats, axis=-1)


def triplane_features_packed_folded(packed_planes, packed_lines, xyz,
                                    basis_kernel, table_bf16=False,
                                    line_matmul=False, compute_bf16=False):
    """:func:`triplane_features_packed` with the basis matmul FOLDED into
    per-plane dots: ``sum_i (plane_i(xy) * line_i(z)) @ kernel[seg_i]``.

    Same blocked K-contraction the tp path uses device-locally
    (:func:`triplane_features_tp`) — equivalent to
    ``triplane_features_packed(...) @ basis_kernel`` up to f32 summation
    grouping. The motivation on one chip is LAYOUT, not FLOPs: the
    ``[N, sum(C_i)]`` concat of gather-produced segments sits at the
    {1,0}-gather -> {0,1}-dot boundary where XLA inserts relayout copies
    (~110 ms/step, ~35 ms/eval-chunk budgeted in PERF_NOTES round 3);
    per-plane dots feed each gather's epilogue straight into its own MXU
    pass and the concat disappears. Returns ``[N, app_dim]``.
    """
    comps = [int(p[0].shape[-1]) // 4 for p in packed_planes]
    offs = [0, comps[0], comps[0] + comps[1], sum(comps)]
    out = None
    for i in range(3):
        m0, m1 = MAT_MODE[i]
        packed, H, W = packed_planes[i]
        pf = grid_sample_2d_packed(packed, H, W, xyz[:, m0], xyz[:, m1],
                                   table_bf16=table_bf16,
                                   compute_bf16=compute_bf16)
        packed_l, D = packed_lines[i]
        lf = grid_sample_1d_packed(packed_l, D, xyz[:, VEC_MODE[i]],
                                   table_bf16=table_bf16,
                                   line_matmul=line_matmul,
                                   compute_bf16=compute_bf16)
        seg = basis_kernel[offs[i]:offs[i + 1]]
        prod = pf * lf
        part = prod @ seg.astype(prod.dtype)
        out = part if out is None else out + part
    return out


def tv_loss_2d(x):
    """Total-variation regularizer on a [C, H, W] grid
    (ref: voxnerf.py:306-324 with batch_size=1)."""
    C, H, W = x.shape
    count_h = max(C * (H - 1) * W, 1)
    count_w = max(C * H * (W - 1), 1)
    h_tv = jnp.sum(jnp.square(x[:, 1:, :] - x[:, :-1, :]))
    w_tv = jnp.sum(jnp.square(x[:, :, 1:] - x[:, :, :-1]))
    return 2.0 * (h_tv / count_h + w_tv / count_w)


def tv_loss_1d(x):
    """TV on a [C, D] line grid; matches the reference applied to the
    [1, C, D, 1] line tensors (the width term is zero)."""
    C, D = x.shape
    count_h = max(C * (D - 1), 1)
    h_tv = jnp.sum(jnp.square(x[:, 1:] - x[:, :-1]))
    return 2.0 * (h_tv / count_h)


def tv_loss_app(planes, lines):
    """Aggregate grid TV: planes weighted 1e-2, lines 1e-3
    (ref: voxnerf.py:126-130)."""
    total = 0.0
    for plane, line in zip(planes, lines):
        total = total + tv_loss_2d(plane) * 1e-2 + tv_loss_1d(line) * 1e-3
    return total


# ---------------------------------------------------------------------------
# tensor-parallel sampling: tables sharded over a 2-D (data, model) mesh
# ---------------------------------------------------------------------------

from jax.sharding import PartitionSpec as _P

from ..parallel.compat import shard_map_norep


def triplane_features_tp(planes, lines, xyz, basis_kernel, mesh,
                         data_axis, model_axis, table_bf16=False,
                         line_matmul=False, compute_bf16=False):
    """Packed tri-plane sampling with component-sharded tables.

    One ``shard_map`` over the 2-D mesh: each device packs + samples its
    local ``C/k`` component slice of every plane/line for its local ray
    shard, contracts with its rows of the per-plane ``basis_mat`` segment,
    and a ``lax.psum`` over the model axis yields the ``[N, app_dim]``
    features. The 4C-neighbor packing would defeat a plain GSPMD
    annotation (packing concatenates along the sharded component axis ->
    all-gather); running the whole per-plane pipeline device-locally keeps
    the tables distributed with the psum of the small post-basis
    activations as the only forward collective. See parallel/tp.py for
    the design rationale.

    Equivalent to ``triplane_features_packed(...) @ basis_kernel`` up to
    f32 summation grouping (the per-plane partial dots are a blocked
    K-contraction of the same products).
    """
    comps = [int(p.shape[0]) for p in planes]
    offs = [0, comps[0], comps[0] + comps[1], sum(comps)]
    segs = [basis_kernel[offs[i]:offs[i + 1]] for i in range(3)]

    def local(xyz_l, p0, p1, p2, l0, l1, l2, s0, s1, s2):
        planes_l, lines_l = [p0, p1, p2], [l0, l1, l2]
        segs_l = [s0, s1, s2]
        if compute_bf16:
            planes_l = [p.astype(jnp.bfloat16) for p in planes_l]
            lines_l = [l.astype(jnp.bfloat16) for l in lines_l]
        pp, pl_ = pack_grids(planes_l, lines_l)
        out = None
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            packed, H, W = pp[i]
            pf = grid_sample_2d_packed(packed, H, W,
                                       xyz_l[:, m0], xyz_l[:, m1],
                                       table_bf16=table_bf16,
                                       compute_bf16=compute_bf16)
            packed_l, D = pl_[i]
            lf = grid_sample_1d_packed(packed_l, D, xyz_l[:, VEC_MODE[i]],
                                       table_bf16=table_bf16,
                                       line_matmul=line_matmul,
                                       compute_bf16=compute_bf16)
            part = (pf * lf) @ segs_l[i]
            out = part if out is None else out + part
        return jax.lax.psum(out, model_axis)

    tab3 = (_P(model_axis, None, None),) * 3
    vec2 = (_P(model_axis, None),) * 3
    in_specs = (_P(data_axis, None),) + tab3 + vec2 + vec2
    fn = shard_map_norep(local, mesh=mesh, in_specs=in_specs,
                         out_specs=_P(data_axis, None))
    return fn(xyz, *planes, *lines, *segs)
