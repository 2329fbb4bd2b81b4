#!/usr/bin/env python
"""Generate dataset-layer reference-oracle parity fixtures.

Builds the deterministic synthetic LLFF+events scene (tests/synthetic.py),
loads it with the ACTUAL reference data layer (/root/reference:
data/loader.py::LLFFDataset, data/loader_events.py::LLFFEventsDataset on
torch CPU), pulls deterministic ray batches / event-pair samples / the EDI
prior, verifies our data layer produces the same numbers, and records the
REFERENCE outputs to tests/goldens/oracle_dataset.npz.

Covers the whole §3.1/§3.3/§3.5 host data path: image+pose loading with
recenter + replayable partial state, NDC bounds, scene AABB, train/test
split, ray-batch assembly (ref: data/loader.py:325-356), event ingestion
with successor graph, annealed k-hop pair sampling with SLERP'd per-event
poses (ref: data/loader_events.py:259-326), and the startup EDI prior
(ref: data/loader_events.py:99-131).

The only nondeterminism in the reference path — the per-sample hop draw
(torch_randint_vec, data/loader_events.py:266) — is pinned by injecting a
recorded hop vector into BOTH implementations.

Usage: python tools/make_dataset_oracle_fixtures.py
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

# --- environment shims for the reference (same set as the other oracle
# generators): numba/kornia are absent, numpy 2.x removed np.bool, the
# voxels module builds a device='cuda' tensor at import, imageio dropped
# the ignoregamma kwarg the reference passes -------------------------------
if "numba" not in sys.modules:
    _numba = types.ModuleType("numba")
    _numba.njit = lambda *a, **k: (a[0] if a and callable(a[0])
                                   else (lambda f: f))
    sys.modules["numba"] = _numba

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

if not hasattr(np, "bool"):
    np.bool = bool  # reference uses the numpy<2 alias (loader_events.py:210)

torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self

_orig_tensor = torch.tensor


def _cpu_tensor(*a, **k):
    k.pop("device", None)
    return _orig_tensor(*a, **k)


torch.tensor = _cpu_tensor
import data.loader as ref_loader  # noqa: E402
import data.loader_events as ref_loader_events  # noqa: E402
torch.tensor = _orig_tensor


def _imread(f):
    import imageio.v2 as imageio

    if f.endswith("png"):
        try:
            return imageio.imread(f, ignoregamma=True)
        except TypeError:  # the kwarg the reference passes no longer exists
            return imageio.imread(f)
    return imageio.imread(f)


ref_loader.LLFFDataset.imread = staticmethod(_imread)

from evdeblurnerf_tpu.config import default_args  # noqa: E402
from evdeblurnerf_tpu.data import (LLFFDataset as OurLLFF,  # noqa: E402
                                   LLFFEventsDataset as OurEvents)
from synthetic import make_synthetic_scene  # noqa: E402

GOLDEN = os.path.join(REPO, "tests", "goldens", "oracle_dataset.npz")

payload = {}
checked = []


def put(name, value):
    payload[name] = np.asarray(value)


def check(name, ours, ref, atol=1e-6, rtol=1e-6):
    ours, ref = np.asarray(ours), np.asarray(ref)
    assert ours.shape == ref.shape, (name, ours.shape, ref.shape)
    if np.issubdtype(ref.dtype, np.integer) or ref.dtype == bool:
        np.testing.assert_array_equal(ours, ref, err_msg=name)
    else:
        np.testing.assert_allclose(ours, ref, atol=atol, rtol=rtol,
                                   err_msg=name)
    checked.append(name)


def T(x):
    return x.detach().cpu().numpy() if isinstance(x, torch.Tensor) else x


import contextlib  # noqa: E402


@contextlib.contextmanager
def np1_unique_semantics():
    """The reference targets numpy<2, where ``np.unique(...,
    return_inverse=True)`` returned a FLAT inverse; numpy 2.x keeps the
    input's shape. Its [N,1] void-view unique (utils/events.py:58) relies
    on the 1.x behavior — restore it while reference code runs."""
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


class FixedHops:
    """np.random.Generator stand-in that returns the pinned hop vector."""

    def __init__(self, hops):
        self.hops = np.asarray(hops, np.int64)

    def integers(self, lo, hi, **kw):
        assert np.all(self.hops >= lo) and np.all(self.hops < hi)
        return self.hops


def make_args(**over):
    return default_args(llffhold=3, factor=None, use_viewdirs=True,
                        use_events=True, events_tms_files_unit="us",
                        events_tms_unit="us", **over)


ANNEAL = dict(event_accumulate_step_range=[1, 10],
              event_accumulate_step_range_end=[5, 40],
              event_accumulate_step_end=30000,
              event_accumulate_step_scheduler="linear")

rng = np.random.default_rng(20260818)

with tempfile.TemporaryDirectory() as scene:
    make_synthetic_scene(scene)

    # ------------------------------------------------------------------
    # LLFF frame dataset (ref: data/loader.py)
    # ------------------------------------------------------------------
    args = make_args()
    rd = ref_loader.LLFFDataset(args, scene, factor=None, recenter=True,
                                bd_factor=0.75, spherify=False, device="cpu")
    od = OurLLFF(args, scene, factor=None, recenter=True, bd_factor=0.75,
                 spherify=False)

    check("llff/images", od.images, T(rd.images))
    check("llff/poses", od.poses, T(rd.poses))
    check("llff/test_poses", od.test_poses, T(rd.test_poses))
    check("llff/render_poses", od.render_poses, T(rd.render_poses))
    check("llff/K", od.K, rd.K)
    check("llff/split_train", od.i_train, rd.i_train)
    check("llff/split_test", od.i_test, rd.i_test)
    check("llff/scale", od.scale, rd.scale)
    check("llff/near_far", [od.near, od.far], [rd.near, rd.far])
    check("llff/bds", [od.closest_bds, od.furthest_bds],
          [rd.closest_bds, rd.furthest_bds])
    check("llff/bbox", np.stack(od.bounding_box),
          np.stack([T(b) for b in rd.bounding_box]), atol=1e-5, rtol=1e-5)
    for k in ("images", "poses", "test_poses", "render_poses", "K"):
        put(f"llff/{k}", T(getattr(rd, k)))
    put("llff/split_train", rd.i_train)
    put("llff/split_test", rd.i_test)
    put("llff/scale", rd.scale)
    put("llff/near_far", [rd.near, rd.far])
    put("llff/bds", [rd.closest_bds, rd.furthest_bds])
    put("llff/bbox", np.stack([T(b) for b in rd.bounding_box]))

    ray_ids = rng.choice(rd.n_rays, 64, replace=False)
    put("in/ray_ids", ray_ids)
    r_batch = rd[list(ray_ids)]
    o_batch = od.batch(ray_ids)
    check("batch/rays", o_batch["rays"], T(r_batch["rays"]))
    check("batch/rays_x", o_batch["rays_x"],
          T(r_batch["rays_x"]).reshape(-1))
    check("batch/rays_y", o_batch["rays_y"],
          T(r_batch["rays_y"]).reshape(-1))
    check("batch/images_idx", o_batch["images_idx"].astype(np.int64),
          T(r_batch["images_idx"]).reshape(-1).astype(np.int64))
    check("batch/rgbsf", o_batch["rgbsf"], T(r_batch["rgbsf"]))
    check("batch/poses", o_batch["poses"], T(r_batch["poses"]))
    for k, v in r_batch.items():
        put(f"batch/{k}", T(v))

    # ------------------------------------------------------------------
    # event dataset (ref: data/loader_events.py), deterministic (0,0)
    # window first, then the annealed k-hop branch with pinned hops
    # ------------------------------------------------------------------
    def build_ref_events(a):
        torch.tensor = _cpu_tensor
        try:
            with np1_unique_semantics():
                return ref_loader_events.LLFFEventsDataset(
                a, scene, rd.h, rd.w, rd.K, factor=None, recenter=True,
                bd_factor=0.75, bd_scale=rd.scale,
                closest_bds=rd.closest_bds, furthest_bds=rd.furthest_bds,
                spherify=False, recenter_partial=rd.recenter_partial,
                spherify_partial=rd.spherify_partial,
                events_tms_unit="us", events_tms_files_unit="us",
                color_events=False, device="cpu")
        finally:
            torch.tensor = _orig_tensor

    def build_our_events(a):
        return OurEvents(a, scene, od.h, od.w, od.K, factor=None,
                         recenter=True, bd_factor=0.75, bd_scale=od.scale,
                         closest_bds=od.closest_bds,
                         furthest_bds=od.furthest_bds, spherify=False,
                         recenter_partial=od.recenter_partial,
                         spherify_partial=od.spherify_partial,
                         events_tms_unit="us", events_tms_files_unit="us")

    rev = build_ref_events(args)
    oev = build_our_events(args)
    check("events/events", oev.events, T(rev.events))
    check("events/num_successors", oev.events_num_successors,
          T(rev.events_num_successors))
    check("events/with_successor_idx", oev.events_with_successor_idx,
          T(rev.events_with_successor_idx))
    check("events/id_to_coords", oev.id_to_coords, T(rev.id_to_coords))
    put("events/events", T(rev.events))
    put("events/num_successors", T(rev.events_num_successors))
    put("events/with_successor_idx", T(rev.events_with_successor_idx))
    put("events/id_to_coords", T(rev.id_to_coords))

    sample_ids = rng.choice(len(rev), 48, replace=False)
    put("in/ev_sample_ids", sample_ids)
    ev_ids = T(rev.events_with_successor_idx)[sample_ids]

    def compare_sample(tag, r_out, o_out):
        check(f"sample_{tag}/pos", o_out["events_pos_pol_cumsum"],
              T(r_out["events_pos_pol_cumsum"]).astype(np.float32))
        check(f"sample_{tag}/neg", o_out["events_neg_pol_cumsum"],
              T(r_out["events_neg_pol_cumsum"]).astype(np.float32))
        check(f"sample_{tag}/rays_start", o_out["events_rays_start"],
              T(r_out["events_rays_start"]), atol=1e-5, rtol=1e-5)
        check(f"sample_{tag}/rays_end", o_out["events_rays_end"],
              T(r_out["events_rays_end"]), atol=1e-5, rtol=1e-5)
        check(f"sample_{tag}/coords_ids",
              o_out["events_coords_ids"].astype(np.int64),
              T(r_out["events_coords_ids"]).astype(np.int64))
        for k in ("events_pos_pol_cumsum", "events_neg_pol_cumsum",
                  "events_rays_start", "events_rays_end",
                  "events_coords_ids"):
            put(f"sample_{tag}/{k}", T(r_out[k]))

    # deterministic single-successor branch (range (0,0), the flag default)
    compare_sample("det",
                   rev.sample_events(torch.from_numpy(ev_ids), 0),
                   oev.sample_events(ev_ids, 0))

    # annealed k-hop branch at a mid-schedule step, hops pinned both sides
    args_k = make_args(**ANNEAL)
    rev_k = build_ref_events(args_k)
    oev_k = build_our_events(args_k)
    check("events_k/with_successor_idx", oev_k.events_with_successor_idx,
          T(rev_k.events_with_successor_idx))
    put("events_k/with_successor_idx", T(rev_k.events_with_successor_idx))

    ev_ids_k = T(rev_k.events_with_successor_idx)[
        rng.choice(len(rev_k), min(48, len(rev_k)), replace=False)]
    STEP = 7500
    lo = int(rev_k.event_accum_min_step(STEP)) - 1
    hi = np.minimum(int(rev_k.event_accum_max_step(STEP)),
                    T(rev_k.events_num_successors)[ev_ids_k]) - 1
    hops = rng.integers(lo, np.maximum(hi, lo) + 1).astype(np.int64)
    put("in/ev_sample_ids_k", ev_ids_k)
    put("in/ev_hops_k", hops)
    put("in/ev_step_k", STEP)

    ref_loader_events.torch_randint_vec = (
        lambda mins, maxs, dtype: torch.from_numpy(hops))
    r_out = rev_k.sample_events(torch.from_numpy(ev_ids_k), STEP)
    oev_k._rng = FixedHops(hops)
    o_out = oev_k.sample_events(ev_ids_k, STEP)
    compare_sample("khop", r_out, o_out)

    # ------------------------------------------------------------------
    # EDI prior (ref: data/loader_events.py:99-131; startup call stack §3.5)
    # ------------------------------------------------------------------
    r_prior = T(rev.compute_edi_prior(rd.i_train, rd.images, 5, 0.2, 0.25))
    o_prior = oev.compute_edi_prior(od.i_train, od.images, steps=5,
                                    cpos=0.2, cneg=0.25)
    check("edi_prior", o_prior, r_prior, atol=1e-5, rtol=1e-5)
    put("edi_prior", r_prior)

np.savez_compressed(GOLDEN, **payload)
print(f"verified {len(checked)} dataset-layer outputs against the reference")
print(f"wrote {GOLDEN} ({os.path.getsize(GOLDEN) / 1024:.0f} KiB, "
      f"{len(payload)} arrays)")
