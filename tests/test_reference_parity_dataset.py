"""Dataset-layer parity against the recorded PyTorch reference data layer.

tests/goldens/oracle_dataset.npz holds outputs produced by the ACTUAL
reference data layer (/root/reference: data/loader.py::LLFFDataset,
data/loader_events.py::LLFFEventsDataset, torch CPU) on the deterministic
synthetic scene — generated and live-verified by
tools/make_dataset_oracle_fixtures.py. These tests rebuild the same scene
and replay OUR data layer against the recording.

Covers ref: data/loader.py:25-356 (loading, split, recenter + partial
state, NDC bounds, AABB, ray-batch assembly), data/loader_events.py:19-326
(event ingestion, successor graph, deterministic and pinned-hop annealed
EGM pair sampling with SLERP'd poses), and the startup EDI prior
(data/loader_events.py:99-131).
"""

import os

import numpy as np
import pytest

from evdeblurnerf_tpu.config import default_args
from evdeblurnerf_tpu.data import LLFFDataset, LLFFEventsDataset
from synthetic import make_synthetic_scene

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "oracle_dataset.npz")

ANNEAL = dict(event_accumulate_step_range=[1, 10],
              event_accumulate_step_range_end=[5, 40],
              event_accumulate_step_end=30000,
              event_accumulate_step_scheduler="linear")


class FixedHops:
    def __init__(self, hops):
        self.hops = np.asarray(hops, np.int64)

    def integers(self, lo, hi, **kw):
        return self.hops


def make_args(**over):
    return default_args(llffhold=3, factor=None, use_viewdirs=True,
                        use_events=True, events_tms_files_unit="us",
                        events_tms_unit="us", **over)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    assert os.path.exists(GOLDEN), (
        "oracle_dataset.npz missing; regenerate with "
        "python tools/make_dataset_oracle_fixtures.py")
    data = np.load(GOLDEN)
    ref = {k: data[k] for k in data.files}
    scene = str(tmp_path_factory.mktemp("oracle_scene"))
    make_synthetic_scene(scene)
    args = make_args()
    llff = LLFFDataset(args, scene, factor=None, recenter=True,
                       bd_factor=0.75, spherify=False)
    return scene, args, llff, ref


def make_events(scene, llff, args):
    return LLFFEventsDataset(args, scene, llff.h, llff.w, llff.K,
                             factor=None, recenter=True, bd_factor=0.75,
                             bd_scale=llff.scale,
                             closest_bds=llff.closest_bds,
                             furthest_bds=llff.furthest_bds, spherify=False,
                             recenter_partial=llff.recenter_partial,
                             spherify_partial=llff.spherify_partial,
                             events_tms_unit="us",
                             events_tms_files_unit="us")


def eq(ours, ref, atol=1e-6, rtol=1e-6, msg=""):
    ours, ref = np.asarray(ours), np.asarray(ref)
    assert ours.shape == ref.shape, (msg, ours.shape, ref.shape)
    if np.issubdtype(ref.dtype, np.integer) or ref.dtype == bool:
        np.testing.assert_array_equal(ours, ref, err_msg=msg)
    else:
        np.testing.assert_allclose(ours, ref, atol=atol, rtol=rtol,
                                   err_msg=msg)


def test_llff_fields_match_reference(setup):
    _, _, llff, ref = setup
    eq(llff.images, ref["llff/images"], msg="train images")
    eq(llff.poses, ref["llff/poses"], msg="train poses")
    eq(llff.test_poses, ref["llff/test_poses"], msg="test poses")
    eq(llff.render_poses, ref["llff/render_poses"], msg="render poses")
    eq(llff.K, ref["llff/K"], msg="intrinsics")
    eq(llff.i_train, ref["llff/split_train"], msg="train split")
    eq(llff.i_test, ref["llff/split_test"], msg="test split")
    eq(llff.scale, ref["llff/scale"], msg="bd scale")
    eq([llff.near, llff.far], ref["llff/near_far"], msg="near/far")
    eq([llff.closest_bds, llff.furthest_bds], ref["llff/bds"], msg="bds")
    eq(np.stack(llff.bounding_box), ref["llff/bbox"], atol=1e-5, rtol=1e-5,
       msg="scene aabb")


def test_ray_batch_matches_reference(setup):
    _, _, llff, ref = setup
    batch = llff.batch(ref["in/ray_ids"])
    eq(batch["rays"], ref["batch/rays"], msg="rays")
    eq(batch["rays_x"], ref["batch/rays_x"].reshape(-1), msg="rays_x")
    eq(batch["rays_y"], ref["batch/rays_y"].reshape(-1), msg="rays_y")
    eq(batch["images_idx"].astype(np.int64),
       ref["batch/images_idx"].reshape(-1).astype(np.int64),
       msg="images_idx")
    eq(batch["rgbsf"], ref["batch/rgbsf"], msg="blur targets")
    eq(batch["poses"], ref["batch/poses"], msg="per-ray poses")


def test_event_arrays_match_reference(setup):
    scene, args, llff, ref = setup
    ev = make_events(scene, llff, args)
    eq(ev.events, ref["events/events"], msg="events (id, t, p, successor)")
    eq(ev.events_num_successors, ref["events/num_successors"],
       msg="successor counts")
    eq(ev.events_with_successor_idx, ref["events/with_successor_idx"],
       msg="eligible-event index")
    eq(ev.id_to_coords, ref["events/id_to_coords"], msg="id_to_coords")


def _check_sample(out, ref, tag):
    eq(out["events_pos_pol_cumsum"],
       ref[f"sample_{tag}/events_pos_pol_cumsum"].astype(np.float32),
       msg=f"{tag} pos cumsum")
    eq(out["events_neg_pol_cumsum"],
       ref[f"sample_{tag}/events_neg_pol_cumsum"].astype(np.float32),
       msg=f"{tag} neg cumsum")
    eq(out["events_rays_start"], ref[f"sample_{tag}/events_rays_start"],
       atol=1e-5, rtol=1e-5, msg=f"{tag} start rays")
    eq(out["events_rays_end"], ref[f"sample_{tag}/events_rays_end"],
       atol=1e-5, rtol=1e-5, msg=f"{tag} end rays")
    eq(out["events_coords_ids"].astype(np.int64),
       ref[f"sample_{tag}/events_coords_ids"].astype(np.int64),
       msg=f"{tag} coord ids")


def test_event_sampling_det_matches_reference(setup):
    scene, args, llff, ref = setup
    ev = make_events(scene, llff, args)
    ev_ids = ref["events/with_successor_idx"][ref["in/ev_sample_ids"]]
    _check_sample(ev.sample_events(ev_ids, 0), ref, "det")


def test_event_sampling_khop_matches_reference(setup):
    scene, args, llff, ref = setup
    ev = make_events(scene, llff, make_args(**ANNEAL))
    eq(ev.events_with_successor_idx, ref["events_k/with_successor_idx"],
       msg="annealed eligible-event index")
    ev._rng = FixedHops(ref["in/ev_hops_k"])
    out = ev.sample_events(ref["in/ev_sample_ids_k"],
                           int(ref["in/ev_step_k"]))
    _check_sample(out, ref, "khop")


def test_edi_prior_matches_reference(setup):
    scene, args, llff, ref = setup
    ev = make_events(scene, llff, args)
    prior = ev.compute_edi_prior(llff.i_train, llff.images, steps=5,
                                 cpos=0.2, cneg=0.25)
    eq(prior, ref["edi_prior"], atol=1e-5, rtol=1e-5, msg="EDI prior")
