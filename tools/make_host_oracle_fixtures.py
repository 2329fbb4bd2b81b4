#!/usr/bin/env python
"""Generate host-layer reference-oracle parity fixtures.

Runs the ACTUAL reference implementation's host-side code (/root/reference:
event-stream engine, EDI prior, LLFF pose math, ray generation, scene AABB,
schedule interpolators) on deterministic synthetic inputs, verifies our
implementations agree, and records the REFERENCE outputs to
tests/goldens/oracle_host.npz.

Reference code covered: utils/events.py:11-257 (loader, successor graph,
accumulators, k-hop gather), utils/edi.py:7-104, utils/data.py:34-253
(slerp/recenter/spherify/spiral/epi), utils/rays.py:8-148, utils/voxels.py:
46-79, utils/misc.py:9-55.

The reference's Numba kernels run as plain Python via an njit passthrough
stub; its TorchScript k-hop gather runs under torch CPU.

Usage: python tools/make_host_oracle_fixtures.py
"""

import os
import sys
import tempfile
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("EVDN_REFERENCE", "/root/reference")

sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, REPO)
sys.path.insert(0, REFERENCE)

import torch  # noqa: E402

# numba is absent here; the reference's @njit kernels are pure Python
# underneath — run them undecorated as the oracle
if "numba" not in sys.modules:
    _numba = types.ModuleType("numba")
    _numba.njit = lambda *a, **k: (a[0] if a and callable(a[0])
                                   else (lambda f: f))
    sys.modules["numba"] = _numba

# kornia is absent; the reference only uses create_meshgrid (utils/rays.py:3)
if "kornia" not in sys.modules:
    def _create_meshgrid(height, width, normalized_coordinates=True,
                         device=None, dtype=None):
        xs = torch.linspace(0, width - 1, width, dtype=dtype or torch.float32)
        ys = torch.linspace(0, height - 1, height,
                            dtype=dtype or torch.float32)
        if normalized_coordinates:
            xs = (xs / (width - 1) - 0.5) * 2
            ys = (ys / (height - 1) - 0.5) * 2
        gy, gx = torch.meshgrid(ys, xs, indexing="ij")
        return torch.stack([gx, gy], -1)[None]

    _kornia = types.ModuleType("kornia")
    _kornia.create_meshgrid = _create_meshgrid
    sys.modules["kornia"] = _kornia

# utils/voxels.py builds a module-level tensor with device='cuda'
# (BOX_OFFSETS, utils/voxels.py:7) — strip device kwargs during its import
_orig_tensor = torch.tensor


def _cpu_tensor(*a, **k):
    k.pop("device", None)
    return _orig_tensor(*a, **k)


torch.tensor = _cpu_tensor
import utils.voxels as ref_voxels  # noqa: E402
torch.tensor = _orig_tensor

import utils.data as ref_data  # noqa: E402
import utils.edi as ref_edi  # noqa: E402
import utils.events as ref_events  # noqa: E402
import utils.misc as ref_misc  # noqa: E402
import utils.rays as ref_rays  # noqa: E402

from scipy.spatial.transform import Rotation  # noqa: E402

from evdeblurnerf_tpu.ops import events_native as our_native  # noqa: E402
from evdeblurnerf_tpu.utils import edi as our_edi  # noqa: E402
from evdeblurnerf_tpu.utils import events as our_events  # noqa: E402
from evdeblurnerf_tpu.utils import misc as our_misc  # noqa: E402
from evdeblurnerf_tpu.utils import pose as our_pose  # noqa: E402
from evdeblurnerf_tpu.utils import rays as our_rays  # noqa: E402
from evdeblurnerf_tpu.utils import voxels as our_voxels  # noqa: E402

GOLDEN = os.path.join(REPO, "tests", "goldens", "oracle_host.npz")

payload = {}
checked = []


def put(group, name, value):
    payload[f"{group}/{name}"] = np.asarray(value)


def check(name, ours, ref, atol=1e-6, rtol=1e-6):
    ours, ref = np.asarray(ours), np.asarray(ref)
    assert ours.shape == ref.shape, (name, ours.shape, ref.shape)
    if np.issubdtype(ref.dtype, np.integer) or ref.dtype == bool:
        np.testing.assert_array_equal(ours, ref, err_msg=name)
    else:
        np.testing.assert_allclose(ours, ref, atol=atol, rtol=rtol,
                                   err_msg=name)
    checked.append(name)


# ---------------------------------------------------------------------------
# synthetic event streams (int and rectified-float coordinates)
# ---------------------------------------------------------------------------
rng = np.random.default_rng(20260817)
H_EV, W_EV = 24, 32
N_EV = 4000

# occupy only ~70% of pixels so the zero-event path is exercised; make sure
# the max x/y coordinates appear so ref's max-derived sensor size matches
occ = rng.choice(H_EV * W_EV, size=int(0.7 * H_EV * W_EV), replace=False)
occ = np.unique(np.concatenate([occ, [H_EV * W_EV - 1]]))
pix = rng.choice(occ, size=N_EV)
x_int = (pix % W_EV).astype(np.uint16)
y_int = (pix // W_EV).astype(np.uint16)
t_us = np.cumsum(rng.integers(0, 40, N_EV)).astype(np.int64)
pol = rng.choice(np.array([-1, 1], dtype=np.int8), size=N_EV)

x_float = np.clip(x_int.astype(np.float32)
                  + rng.uniform(-0.4, 0.4, N_EV).astype(np.float32),
                  0, W_EV - 1)
y_float = np.clip(y_int.astype(np.float32)
                  + rng.uniform(-0.4, 0.4, N_EV).astype(np.float32),
                  0, H_EV - 1)

put("in", "ev_x_int", x_int)
put("in", "ev_y_int", y_int)
put("in", "ev_x_float", x_float)
put("in", "ev_y_float", y_float)
put("in", "ev_t_us", t_us)
put("in", "ev_p", pol)
put("in", "ev_hw", [H_EV, W_EV])


def write_h5(path, x, y):
    import h5py

    with h5py.File(path, "w") as f:
        f["x"], f["y"], f["t"], f["p"] = x, y, t_us, pol


import contextlib  # noqa: E402


@contextlib.contextmanager
def np1_unique_semantics():
    """The reference targets numpy<2 (environment.yml), where
    ``np.unique(..., return_inverse=True)`` always returned a FLAT inverse;
    numpy 2.x keeps the input's shape. Restore the 1.x behavior while the
    reference loader runs (its [N,1] void-view unique at utils/events.py:58
    relies on it)."""
    orig = np.unique

    def unique_flat_inverse(*a, **k):
        out = orig(*a, **k)
        if k.get("return_inverse") and isinstance(out, tuple):
            inv_pos = 1 + bool(k.get("return_index"))
            out = tuple(o.ravel() if i == inv_pos else o
                        for i, o in enumerate(out))
        return out

    np.unique = unique_flat_inverse
    try:
        yield
    finally:
        np.unique = orig


with tempfile.TemporaryDirectory() as td:
    h5_int = os.path.join(td, "int.h5")
    h5_float = os.path.join(td, "float.h5")
    write_h5(h5_int, x_int, y_int)
    write_h5(h5_float, x_float, y_float)

    for tag, path, kw in (
            ("int", h5_int, {}),
            ("int_opt", h5_int, dict(optimize_ids=True)),
            ("float", h5_float, dict(coords_decimals=2))):
        with np1_unique_semantics():
            ref_ev, ref_noev, ref_i2c = ref_events.load_events_h5(
                path, H_EV, W_EV, events_tms_unit="us", **kw)
        our_ev, our_noev, our_i2c = our_events.load_events_h5(
            path, H_EV, W_EV, events_tms_unit="us", **kw)
        check(f"load_{tag}/events", our_ev, np.asarray(ref_ev, np.int64))
        check(f"load_{tag}/noev", our_noev, np.asarray(ref_noev, np.int64))
        check(f"load_{tag}/i2c", our_i2c, ref_i2c)
        put("ref", f"load_{tag}_events", np.asarray(ref_ev, np.int64))
        put("ref", f"load_{tag}_noev", np.asarray(ref_noev, np.int64))
        put("ref", f"load_{tag}_i2c", ref_i2c)

flat = payload["ref/load_int_opt_events"].astype(np.int64)  # [N,3] id,t,p

# successor graph (ref: utils/events.py:72-120, flat_xy=True)
suc, nsuc, latest, first = ref_events.compute_successor(flat, flat_xy=True)
o_suc, o_nsuc, o_latest, o_first = our_native.compute_successor(flat[:, 0])
check("successor/idx", o_suc, suc)
check("successor/num", o_nsuc, nsuc)
check("successor/latest", o_latest, latest.reshape(-1))
check("successor/first", o_first, first.reshape(-1))
put("ref", "successor_idx", suc)
put("ref", "successor_num", nsuc)
put("ref", "successor_latest", latest.reshape(-1))
put("ref", "successor_first", first.reshape(-1))

# count-based accumulation (ref: utils/events.py:123-171, flat_xy=True)
for n in (1, 3):
    acc = ref_events.accumulate_events(flat, n, flat_xy=True)
    check(f"accumulate_n{n}", our_native.accumulate_events(flat, n), acc)
    put("ref", f"accumulate_n{n}", acc)

# timestamp-grid accumulation (ref: utils/events.py:174-218, flat_xy=True)
grid_tms = np.linspace(int(t_us[0]), int(t_us[-1]) + 1, 40).astype(np.int64)
put("in", "grid_tms", grid_tms)
for n in (1, 2):
    acc, zeros = ref_events.accumulate_events_at_time(
        flat, grid_tms, n, flat_xy=True, return_zeroevents=True)
    o_acc, o_zeros = our_native.accumulate_events_at_time(
        flat, grid_tms, n, return_zeroevents=True)
    check(f"accumulate_at_time_n{n}/events", o_acc, acc)
    check(f"accumulate_at_time_n{n}/zeros", o_zeros, zeros)
    put("ref", f"at_time_n{n}_events", acc)
    put("ref", f"at_time_n{n}_zeros", zeros)

# k-hop gather (ref: utils/events.py:221-257, TorchScript), with a corrupted
# map variant exercising the invalid-successor latch
q_idx = rng.integers(0, N_EV, 512).astype(np.int64)
q_hops = rng.integers(0, 7, 512).astype(np.int64)
bad_map = suc.copy()
bad_map[rng.integers(0, N_EV, 200)] = -1
put("in", "gather_q_idx", q_idx)
put("in", "gather_q_hops", q_hops)
put("in", "gather_bad_map", bad_map)
for tag, smap in (("ok", suc), ("bad", bad_map)):
    r_idx, r_neg, r_pos = ref_events.gather_successor(
        torch.from_numpy(q_idx), torch.from_numpy(q_hops),
        torch.from_numpy(smap), torch.from_numpy(flat[:, 2]))
    o_idx, o_neg, o_pos = our_native.gather_successor(
        q_idx, q_hops, smap, flat[:, 2])
    check(f"gather_{tag}/idx", o_idx, r_idx.numpy())
    check(f"gather_{tag}/neg", o_neg, r_neg.numpy())
    check(f"gather_{tag}/pos", o_pos, r_pos.numpy())
    put("ref", f"gather_{tag}_idx", r_idx.numpy())
    put("ref", f"gather_{tag}_neg", r_neg.numpy())
    put("ref", f"gather_{tag}_pos", r_pos.numpy())

# ---------------------------------------------------------------------------
# EDI prior (ref: utils/edi.py:7-104)
# ---------------------------------------------------------------------------
H_E, W_E = 16, 20
n_e = 600
e_x = rng.uniform(0, W_E - 1.01, n_e).astype(np.float32)
e_y = rng.uniform(0, H_E - 1.01, n_e).astype(np.float32)
e_x[:50] = np.round(e_x[:50])  # exact-integer coords hit the floor==ceil rule
e_y[25:75] = np.round(e_y[25:75])
e_p = rng.choice(np.array([-1, 1], np.int8), n_e)
put("in", "edi_x", e_x)
put("in", "edi_y", e_y)
put("in", "edi_p", e_p)

for tag, kw in (("interp", dict(interpolate=True)),
                ("nearest", dict(interpolate=False)),
                ("color", dict(interpolate=True, color_events=True))):
    ref_bii = ref_edi.brightness_increment_image(
        e_x, e_y, e_p, W_E, H_E, 0.25, 0.3, **kw)
    our_bii = our_edi.brightness_increment_image(
        e_x, e_y, e_p, W_E, H_E, 0.25, 0.3, **kw)
    check(f"bii_{tag}", our_bii, ref_bii, atol=1e-5, rtol=1e-5)
    put("ref", f"bii_{tag}", ref_bii)

blurry = rng.uniform(0.05, 1.0, (H_E, W_E)).astype(np.float32)
bii_stack = np.stack([
    ref_edi.brightness_increment_image(
        e_x[i::8], e_y[i::8], e_p[i::8], W_E, H_E, 0.25, 0.3)
    for i in range(8)], axis=0)
put("in", "edi_blurry", blurry)
put("in", "edi_bii_stack", bii_stack)
ref_inner = ref_edi.inner_double_integral(bii_stack)
ref_sharp = ref_edi.deblur_double_integral(blurry, bii_stack)
ref_slow = np.stack(ref_edi.slowmo_double_integral(blurry, bii_stack))
check("edi/inner", our_edi.inner_double_integral(bii_stack), ref_inner)
check("edi/sharp", our_edi.deblur_double_integral(blurry, bii_stack),
      ref_sharp)
check("edi/slowmo", np.stack(our_edi.slowmo_double_integral(blurry,
                                                            bii_stack)),
      ref_slow)
put("ref", "edi_inner", ref_inner)
put("ref", "edi_sharp", ref_sharp)
put("ref", "edi_slowmo", ref_slow)

# ---------------------------------------------------------------------------
# LLFF pose math (ref: utils/data.py:34-253)
# ---------------------------------------------------------------------------
def make_poses(n, seed):
    r = np.random.default_rng(seed)
    rots = Rotation.random(n, random_state=int(r.integers(1 << 30)))
    mats = rots.as_matrix()
    trans = r.normal(0, 1.0, (n, 3, 1))
    hwf = np.broadcast_to(np.array([24.0, 32.0, 26.0])[:, None], (n, 3, 1))
    return np.concatenate([mats, trans, hwf], axis=-1)  # [n, 3, 5]


poses_a = make_poses(10, 1)
poses_b = make_poses(6, 2)
bds = np.stack([rng.uniform(0.5, 1.0, 10), rng.uniform(3.0, 6.0, 10)], -1)
bds_b = np.stack([rng.uniform(0.5, 1.0, 6), rng.uniform(3.0, 6.0, 6)], -1)
put("in", "poses_a", poses_a)
put("in", "poses_b", poses_b)
put("in", "bds_a", bds)
put("in", "bds_b", bds_b)

rp, rc2w = ref_data.recenter_poses(poses_a.copy(), return_c2w=True)
op, oc2w = our_pose.recenter_poses(poses_a.copy(), return_c2w=True)
check("recenter/poses", op, rp)
check("recenter/c2w", oc2w, rc2w)
rp_b = ref_data.recenter_poses(poses_b.copy(), c2w=rc2w)
check("recenter/replay", our_pose.recenter_poses(poses_b.copy(), c2w=oc2w),
      rp_b)
put("ref", "recenter_poses", rp)
put("ref", "recenter_c2w", rc2w)
put("ref", "recenter_replay", rp_b)

r_reset, r_new, r_bds, r_state = ref_data.spherify_poses(
    poses_a.copy(), bds.copy(), return_state=True)
o_reset, o_new, o_bds, o_state = our_pose.spherify_poses(
    poses_a.copy(), bds.copy(), return_state=True)
check("spherify/reset", o_reset, r_reset)
check("spherify/new", o_new, r_new)
check("spherify/bds", o_bds, r_bds)
for i, nm in enumerate(("c2w", "up", "sc", "radcircle", "zh")):
    if nm == "up":
        # reference quirk: its 120-pose loop reassigns `up` to the constant
        # [0,0,-1] before packing the state (utils/data.py:232), so the
        # returned `up` is not the scene up vector; replay never reads it.
        np.testing.assert_allclose(r_state[i], [0.0, 0.0, -1.0])
        continue
    check(f"spherify/state_{nm}", o_state[i], r_state[i])
r_reset_b, r_new_b, r_bds_b = ref_data.spherify_poses(
    poses_b.copy(), bds_b.copy(), state=r_state)
o_reset_b, o_new_b, o_bds_b = our_pose.spherify_poses(
    poses_b.copy(), bds_b.copy(), state=o_state)
check("spherify/replay_reset", o_reset_b, r_reset_b)
check("spherify/replay_new", o_new_b, r_new_b)
check("spherify/replay_bds", o_bds_b, r_bds_b)
put("ref", "spherify_reset", r_reset)
put("ref", "spherify_new", r_new)
put("ref", "spherify_bds", r_bds)
for i, nm in enumerate(("c2w", "up", "sc", "radcircle", "zh")):
    put("ref", f"spherify_state_{nm}", r_state[i])
put("ref", "spherify_replay_reset", r_reset_b)
put("ref", "spherify_replay_new", r_new_b)
put("ref", "spherify_replay_bds", r_bds_b)

c2w_avg = ref_data.poses_avg(poses_a)
check("poses_avg", our_pose.poses_avg(poses_a), c2w_avg)
put("ref", "poses_avg", c2w_avg)
up_vec = ref_data.normalize(poses_a[:, :3, 1].sum(0))
rads = np.array([0.4, 0.3, 0.08])
r_spiral = np.stack(ref_data.render_path_spiral(
    c2w_avg, up_vec, rads, focal=24.0, zdelta=0.2, zrate=0.5, rots=2, N=30))
o_spiral = np.stack(our_pose.render_path_spiral(
    c2w_avg, up_vec, rads, focal=24.0, zdelta=0.2, zrate=0.5, rots=2, N=30))
check("spiral", o_spiral, r_spiral)
put("ref", "spiral", r_spiral)
r_epi = np.stack(ref_data.render_path_epi(c2w_avg, up_vec, 0.5, N=20))
check("epi", np.stack(our_pose.render_path_epi(c2w_avg, up_vec, 0.5, N=20)),
      r_epi)
put("ref", "epi", r_epi)

tss = np.sort(rng.uniform(0, 1000, 6))
tss[0], tss[-1] = 0.0, 1000.0
knot_rots = Rotation.random(6, random_state=7).as_matrix()
knot_trans = rng.normal(0, 1, (6, 3))
tq = rng.uniform(-50, 1050, 40)
put("in", "slerp_tss", tss)
put("in", "slerp_rots", knot_rots)
put("in", "slerp_trans", knot_trans)
put("in", "slerp_tq", tq)
r_interp = ref_data._get_slerp_interpolator(tss, knot_rots, knot_trans)
r_rots, r_trans = r_interp(tq)
o_rots, o_trans = our_pose.get_slerp_interpolator(
    tss, knot_rots, knot_trans)(tq)
check("slerp/rots", o_rots, r_rots)
check("slerp/trans", o_trans, r_trans)
put("ref", "slerp_rots_out", r_rots)
put("ref", "slerp_trans_out", r_trans)

# ---------------------------------------------------------------------------
# ray generation + NDC + scene AABB (ref: utils/rays.py:8-148, voxels.py:46)
# ---------------------------------------------------------------------------
H_R, W_R, F_R = 12, 16, 14.0
K = np.array([[F_R, 0, W_R / 2], [0, F_R, H_R / 2], [0, 0, 1]], np.float32)
c2w = poses_a[0, :3, :4].astype(np.float32)
put("in", "rays_K", K)
put("in", "rays_c2w", c2w)

for half in (True, False):
    ro, rd = ref_rays.get_rays(H_R, W_R, K, torch.from_numpy(c2w),
                               add_halfpix=half)
    o_ro, o_rd = our_rays.get_rays_np(H_R, W_R, K, c2w, add_halfpix=half)
    check(f"get_rays_h{half}/o", o_ro, ro.numpy())
    check(f"get_rays_h{half}/d", o_rd, rd.numpy())
    put("ref", f"get_rays_h{int(half)}_o", ro.numpy())
    put("ref", f"get_rays_h{int(half)}_d", rd.numpy())

coords = np.stack([rng.uniform(0, W_R - 1, 50),
                   rng.uniform(0, H_R - 1, 50)], -1).astype(np.float32)
c2ws = poses_a[rng.integers(0, 10, 50), :3, :4].astype(np.float32)
put("in", "pix_coords", coords)
put("in", "pix_c2ws", c2ws)
ro, rd = ref_rays.get_rays_pix_np(coords, K, c2ws)
o_ro, o_rd = our_rays.get_rays_pix_np(coords, K, c2ws)
check("get_rays_pix/o", o_ro, ro)
check("get_rays_pix/d", o_rd, rd)
put("ref", "get_rays_pix_o", ro)
put("ref", "get_rays_pix_d", rd)

ro, rd = ref_rays.get_rays(H_R, W_R, K, torch.from_numpy(c2w))
ndc_o, ndc_d = ref_rays.get_ndc_rays(H_R, W_R, F_R, 1.0,
                                     ro.reshape(-1, 3), rd.reshape(-1, 3))
o_ro, o_rd = our_rays.get_rays_np(H_R, W_R, K, c2w)
o_ndc_o, o_ndc_d = our_rays.get_ndc_rays_np(
    H_R, W_R, F_R, 1.0, o_ro.reshape(-1, 3), o_rd.reshape(-1, 3))
check("ndc/o", o_ndc_o, ndc_o.numpy(), atol=1e-5, rtol=1e-5)
check("ndc/d", o_ndc_d, ndc_d.numpy(), atol=1e-5, rtol=1e-5)
put("ref", "ndc_o", ndc_o.numpy())
put("ref", "ndc_d", ndc_d.numpy())

for is_ndc in (True, False):
    r_min, r_max = ref_voxels.get_bbox3d_for_llff(
        poses_a[:, :3, :4].astype(np.float32), (H_R, W_R, F_R),
        near=0.0, far=1.0, is_ndc=is_ndc)
    o_min, o_max = our_voxels.get_bbox3d_for_llff(
        poses_a[:, :3, :4].astype(np.float32), (H_R, W_R, F_R),
        near=0.0, far=1.0, is_ndc=is_ndc)
    check(f"bbox_ndc{int(is_ndc)}/min", o_min, r_min.numpy(),
          atol=1e-5, rtol=1e-5)
    check(f"bbox_ndc{int(is_ndc)}/max", o_max, r_max.numpy(),
          atol=1e-5, rtol=1e-5)
    put("ref", f"bbox_ndc{int(is_ndc)}_min", r_min.numpy())
    put("ref", f"bbox_ndc{int(is_ndc)}_max", r_max.numpy())

# ---------------------------------------------------------------------------
# schedule interpolators (ref: utils/misc.py:9-55)
# ---------------------------------------------------------------------------
steps = np.arange(0, 120)
put("in", "sched_steps", steps)
for method in ("linear", "cosine", "constant"):
    rf = ref_misc.annealing_interpolator(0.2, 2.0, 90, method=method,
                                         start_step=10)
    of = our_misc.annealing_interpolator(0.2, 2.0, 90, method=method,
                                         start_step=10)
    r_vals = np.array([rf(int(s)) for s in steps], np.float64)
    o_vals = np.array([float(of(int(s))) for s in steps], np.float64)
    check(f"anneal_{method}", o_vals, r_vals)
    put("ref", f"anneal_{method}", r_vals)

r_w = np.array([ref_misc.exponential_scale_fine_loss_weight(
    30000, 1200, 0.1, 1.0, int(s)) for s in steps * 250], np.float64)
o_w = np.array([our_misc.exponential_scale_fine_loss_weight(
    30000, 1200, 0.1, 1.0, int(s)) for s in steps * 250], np.float64)
check("fine_loss_weight", o_w, r_w)
put("ref", "fine_loss_weight", r_w)

np.savez_compressed(GOLDEN, **payload)
size_kb = os.path.getsize(GOLDEN) / 1024
print(f"verified {len(checked)} host-layer outputs against the reference")
print(f"wrote {GOLDEN} ({size_kb:.0f} KiB, {len(payload)} arrays)")
