"""Host-layer parity against the recorded PyTorch/numpy reference.

tests/goldens/oracle_host.npz holds outputs produced by the ACTUAL reference
implementation (/root/reference: Numba kernels run as plain Python, the
TorchScript k-hop gather under torch CPU) on deterministic synthetic inputs —
generated and live-verified by tools/make_host_oracle_fixtures.py. These
tests replay our host-side implementations against those recorded numbers.

Reference code covered: utils/events.py:11-257 (HDF5 loader with float-coord
compaction, successor graph, count/timestamp accumulators, k-hop gather),
utils/edi.py:7-104 (bilinear splat BII, double-integral deblur/slowmo),
utils/data.py:34-253 (slerp factory, recenter/spherify with replay state,
spiral/EPI paths), utils/rays.py:8-148, utils/voxels.py:46-79,
utils/misc.py:9-55 (schedule interpolators).
"""

import os

import numpy as np
import pytest

from evdeblurnerf_tpu.ops import events_native
from evdeblurnerf_tpu.utils import edi, events, misc, pose, rays, voxels

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "oracle_host.npz")


@pytest.fixture(scope="module")
def ora():
    assert os.path.exists(GOLDEN), (
        "oracle_host.npz missing; regenerate with "
        "python tools/make_host_oracle_fixtures.py (needs torch + the "
        "reference checkout)")
    data = np.load(GOLDEN)
    return ({k[3:]: data[k] for k in data.files if k.startswith("in/")},
            {k[4:]: data[k] for k in data.files if k.startswith("ref/")})


def eq(ours, ref, atol=1e-6, rtol=1e-6, msg=""):
    ours, ref = np.asarray(ours), np.asarray(ref)
    assert ours.shape == ref.shape, (msg, ours.shape, ref.shape)
    if np.issubdtype(ref.dtype, np.integer) or ref.dtype == bool:
        np.testing.assert_array_equal(ours, ref, err_msg=msg)
    else:
        np.testing.assert_allclose(ours, ref, atol=atol, rtol=rtol,
                                   err_msg=msg)


def _write_event_h5(path, inp, coords):
    import h5py

    with h5py.File(path, "w") as f:
        f["x"] = inp[f"ev_x_{coords}"]
        f["y"] = inp[f"ev_y_{coords}"]
        f["t"] = inp["ev_t_us"]
        f["p"] = inp["ev_p"]


@pytest.mark.parametrize("tag,coords,kw", [
    ("int", "int", {}),
    ("int_opt", "int", dict(optimize_ids=True)),
    ("float", "float", dict(coords_decimals=2)),
])
def test_load_events_h5_matches_reference(ora, tmp_path, tag, coords, kw):
    inp, ref = ora
    h, w = inp["ev_hw"]
    path = str(tmp_path / "events.h5")
    _write_event_h5(path, inp, coords)
    ev, noev, i2c = events.load_events_h5(path, int(h), int(w),
                                          events_tms_unit="us", **kw)
    eq(ev, ref[f"load_{tag}_events"], msg=f"{tag} events")
    eq(noev, ref[f"load_{tag}_noev"], msg=f"{tag} zero-event ids")
    eq(i2c, ref[f"load_{tag}_i2c"], msg=f"{tag} id_to_coords")


def test_successor_graph_matches_reference(ora):
    _, ref = ora
    flat = ref["load_int_opt_events"].astype(np.int64)
    suc, nsuc, latest, first = events_native.compute_successor(flat[:, 0])
    eq(suc, ref["successor_idx"], msg="successor idx")
    eq(nsuc, ref["successor_num"], msg="successor counts")
    eq(latest, ref["successor_latest"], msg="first-event-per-pixel")
    eq(first, ref["successor_first"], msg="last-event-per-pixel")


@pytest.mark.parametrize("n", [1, 3])
def test_accumulate_events_matches_reference(ora, n):
    _, ref = ora
    flat = ref["load_int_opt_events"].astype(np.int64)
    eq(events_native.accumulate_events(flat, n), ref[f"accumulate_n{n}"],
       msg=f"accumulate n={n}")


@pytest.mark.parametrize("n", [1, 2])
def test_accumulate_at_time_matches_reference(ora, n):
    inp, ref = ora
    flat = ref["load_int_opt_events"].astype(np.int64)
    acc, zeros = events_native.accumulate_events_at_time(
        flat, inp["grid_tms"], n, return_zeroevents=True)
    eq(acc, ref[f"at_time_n{n}_events"], msg=f"at_time n={n} events")
    eq(zeros, ref[f"at_time_n{n}_zeros"], msg=f"at_time n={n} zeros")


@pytest.mark.parametrize("tag", ["ok", "bad"])
def test_gather_successor_matches_reference(ora, tag):
    inp, ref = ora
    flat = ref["load_int_opt_events"].astype(np.int64)
    smap = (ref["successor_idx"] if tag == "ok"
            else inp["gather_bad_map"]).astype(np.int64)
    idx, neg, pos = events_native.gather_successor(
        inp["gather_q_idx"], inp["gather_q_hops"], smap, flat[:, 2])
    eq(idx, ref[f"gather_{tag}_idx"], msg=f"gather {tag} idx")
    eq(neg, ref[f"gather_{tag}_neg"], msg=f"gather {tag} neg")
    eq(pos, ref[f"gather_{tag}_pos"], msg=f"gather {tag} pos")


@pytest.mark.parametrize("tag,kw", [
    ("interp", dict(interpolate=True)),
    ("nearest", dict(interpolate=False)),
    ("color", dict(interpolate=True, color_events=True)),
])
def test_bii_matches_reference(ora, tag, kw):
    inp, ref = ora
    h, w = inp["edi_blurry"].shape
    bii = edi.brightness_increment_image(
        inp["edi_x"], inp["edi_y"], inp["edi_p"], w, h, 0.25, 0.3, **kw)
    eq(bii, ref[f"bii_{tag}"], atol=1e-5, rtol=1e-5, msg=f"bii {tag}")


def test_edi_deblur_matches_reference(ora):
    inp, ref = ora
    blurry, bii = inp["edi_blurry"], inp["edi_bii_stack"]
    eq(edi.inner_double_integral(bii), ref["edi_inner"], msg="inner")
    eq(edi.deblur_double_integral(blurry, bii), ref["edi_sharp"],
       msg="deblur")
    eq(np.stack(edi.slowmo_double_integral(blurry, bii)), ref["edi_slowmo"],
       msg="slowmo")


def test_recenter_matches_reference(ora):
    inp, ref = ora
    poses_r, c2w = pose.recenter_poses(inp["poses_a"].copy(),
                                       return_c2w=True)
    eq(poses_r, ref["recenter_poses"], msg="recentered poses")
    eq(c2w, ref["recenter_c2w"], msg="recenter c2w")
    eq(pose.recenter_poses(inp["poses_b"].copy(), c2w=c2w),
       ref["recenter_replay"], msg="recenter replay on second pose set")


def test_spherify_matches_reference(ora):
    inp, ref = ora
    reset, new, bds, state = pose.spherify_poses(
        inp["poses_a"].copy(), inp["bds_a"].copy(), return_state=True)
    eq(reset, ref["spherify_reset"], msg="spherified poses")
    eq(new, ref["spherify_new"], msg="spherify render path")
    eq(bds, ref["spherify_bds"], msg="spherify bounds")
    for i, nm in enumerate(("c2w", "up", "sc", "radcircle", "zh")):
        if nm == "up":
            continue  # reference stores a loop-variable constant here
        eq(state[i], ref[f"spherify_state_{nm}"], msg=f"state {nm}")
    reset_b, new_b, bds_b = pose.spherify_poses(
        inp["poses_b"].copy(), inp["bds_b"].copy(), state=state)
    eq(reset_b, ref["spherify_replay_reset"], msg="replayed poses")
    eq(new_b, ref["spherify_replay_new"], msg="replayed render path")
    eq(bds_b, ref["spherify_replay_bds"], msg="replayed bounds")


def test_render_paths_match_reference(ora):
    inp, ref = ora
    c2w = pose.poses_avg(inp["poses_a"])
    eq(c2w, ref["poses_avg"], msg="poses_avg")
    up = pose.normalize(inp["poses_a"][:, :3, 1].sum(0))
    spiral = np.stack(pose.render_path_spiral(
        c2w, up, np.array([0.4, 0.3, 0.08]), focal=24.0, zdelta=0.2,
        zrate=0.5, rots=2, N=30))
    eq(spiral, ref["spiral"], msg="spiral path")
    epi = np.stack(pose.render_path_epi(c2w, up, 0.5, N=20))
    eq(epi, ref["epi"], msg="epi path")


def test_slerp_matches_reference(ora):
    inp, ref = ora
    rots, trans = pose.get_slerp_interpolator(
        inp["slerp_tss"], inp["slerp_rots"], inp["slerp_trans"])(
            inp["slerp_tq"])
    eq(rots, ref["slerp_rots_out"], msg="slerp rotations")
    eq(trans, ref["slerp_trans_out"], msg="cubic translations")


@pytest.mark.parametrize("half", [True, False])
def test_get_rays_matches_reference(ora, half):
    inp, ref = ora
    o, d = rays.get_rays_np(12, 16, inp["rays_K"], inp["rays_c2w"],
                            add_halfpix=half)
    eq(o, ref[f"get_rays_h{int(half)}_o"], msg="ray origins")
    eq(d, ref[f"get_rays_h{int(half)}_d"], msg="ray directions")


def test_get_rays_pix_matches_reference(ora):
    inp, ref = ora
    o, d = rays.get_rays_pix_np(inp["pix_coords"], inp["rays_K"],
                                inp["pix_c2ws"])
    eq(o, ref["get_rays_pix_o"], msg="pixel-ray origins")
    eq(d, ref["get_rays_pix_d"], msg="pixel-ray directions")


def test_ndc_rays_match_reference(ora):
    inp, ref = ora
    o, d = rays.get_rays_np(12, 16, inp["rays_K"], inp["rays_c2w"])
    ndc_o, ndc_d = rays.get_ndc_rays_np(
        12, 16, 14.0, 1.0, o.reshape(-1, 3), d.reshape(-1, 3))
    eq(ndc_o, ref["ndc_o"], atol=1e-5, rtol=1e-5, msg="ndc origins")
    eq(ndc_d, ref["ndc_d"], atol=1e-5, rtol=1e-5, msg="ndc directions")


@pytest.mark.parametrize("is_ndc", [True, False])
def test_bbox_matches_reference(ora, is_ndc):
    inp, ref = ora
    mn, mx = voxels.get_bbox3d_for_llff(
        inp["poses_a"][:, :3, :4].astype(np.float32), (12, 16, 14.0),
        near=0.0, far=1.0, is_ndc=is_ndc)
    eq(mn, ref[f"bbox_ndc{int(is_ndc)}_min"], atol=1e-5, rtol=1e-5,
       msg="aabb min")
    eq(mx, ref[f"bbox_ndc{int(is_ndc)}_max"], atol=1e-5, rtol=1e-5,
       msg="aabb max")


@pytest.mark.parametrize("method", ["linear", "cosine", "constant"])
def test_annealing_matches_reference(ora, method):
    inp, ref = ora
    f = misc.annealing_interpolator(0.2, 2.0, 90, method=method,
                                    start_step=10)
    vals = np.array([float(f(int(s))) for s in inp["sched_steps"]])
    eq(vals, ref[f"anneal_{method}"], msg=f"annealing {method}")


def test_fine_loss_weight_matches_reference(ora):
    inp, ref = ora
    vals = np.array([misc.exponential_scale_fine_loss_weight(
        30000, 1200, 0.1, 1.0, int(s)) for s in inp["sched_steps"] * 250])
    eq(vals, ref["fine_loss_weight"], msg="exponential fine-loss weight")
