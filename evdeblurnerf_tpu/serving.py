"""Deployment: self-contained serialized renderers via ``jax.export``.

The reference ships inference as "clone the repo, rebuild the model in
Python, load a checkpoint, run render-only mode" (ref: run_nerf.py:337-414).
The TPU-native serving story is an ahead-of-time compiled artifact: the
eval render program (`models/system.py::render_chunk`, optionally with the
rgb CRF folded in) is lowered to StableHLO with the trained weights baked
in as constants, serialized, and reloaded by ``jax.export.deserialize`` —
no model code, checkpoint tree, or config file needed at serving time,
only JAX and this loader. The artifact pins its lowering platform(s) and
the fixed chunk shape (static shapes are the contract that made the
program fast in the first place).

File format (one file)::

    8 bytes   magic  b"EVDNSRV1"
    8 bytes   little-endian uint64: JSON header length
    N bytes   UTF-8 JSON header (chunk, platforms, camera intrinsics, ...)
    rest      ``jax.export`` serialized bytes

Typical flow::

    exported, meta = export_renderer(model, variables, chunk=32768,
                                     crf=crf, crf_params=params["crf"],
                                     meta={"H": H, "W": W, "K": K})
    save_renderer("scene.evdnsrv", exported, meta)
    ...
    r = load_renderer("scene.evdnsrv")
    rgb, depth, acc = r(rays)                  # one fixed-size chunk
    rgbs, depths = r.render_poses(poses)       # whole poses, pipelined

``tools/export_renderer.py`` is the CLI: experiment config + checkpoint
directory in, one artifact out.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_MAGIC = b"EVDNSRV1"
FORMAT_VERSION = 1


def make_render_fn(model, variables, crf=None, crf_params=None,
                   skip_learn_crf: bool = False, fine_cull: bool = False):
    """``rays [chunk,3,2] -> (rgb [chunk,3], depth, acc)`` with the trained
    weights closed over (they become artifact constants under export).

    Folding the rgb CRF into the chunk program is pointwise, so it is
    equivalent to the reference's post-render chunked CRF application
    (ref: run_nerf.py:660, networks/tonemapping.py:141-154).
    ``fine_cull`` bakes the transmittance-culled fine pass into the
    artifact (--fine_cull_eval; bound the quality delta with
    tools/eval_cull_ab.py before shipping it)."""

    def render(rays):
        rgb, depth, acc = model.apply(variables, rays,
                                      method=model.render_chunk,
                                      fine_cull=fine_cull)
        if crf is not None:
            rgb = crf.apply({"params": crf_params}, rgb, mode="encode_rgb",
                            skip_learn_crf=skip_learn_crf)
        return rgb, depth, acc

    return render


def export_renderer(model, variables, chunk: int = 32768, crf=None,
                    crf_params=None, skip_learn_crf: bool = False,
                    mesh=None, meta: Optional[dict] = None,
                    fine_cull: bool = False):
    """AOT-export the eval renderer; returns ``(exported, meta)``.

    ``meta`` entries (e.g. H/W/K/near/far) are merged into the header so
    the loader can rebuild camera rays without any config file.

    With ``mesh`` (a 1-D ``jax.sharding.Mesh``), the program is exported
    data-parallel: rays shard over the mesh axis, weights replicate as
    constants, outputs come back replicated. The artifact then requires
    exactly ``mesh.size`` devices at serving time (recorded in the header;
    the loader rebuilds the placement automatically)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    jit_kwargs = {}
    if mesh is not None:
        if chunk % mesh.size:
            raise ValueError(f"chunk={chunk} must divide over the "
                             f"{mesh.size}-device mesh")
        (axis,) = mesh.axis_names
        jit_kwargs = {"in_shardings": NamedSharding(mesh, P(axis)),
                      "out_shardings": NamedSharding(mesh, P())}
    fn = jax.jit(make_render_fn(model, variables, crf=crf,
                                crf_params=crf_params,
                                skip_learn_crf=skip_learn_crf,
                                fine_cull=fine_cull),
                 **jit_kwargs)
    spec = jax.ShapeDtypeStruct((int(chunk), 3, 2), jnp.float32)
    exported = jax.export.export(fn)(spec)
    header = {
        "format_version": FORMAT_VERSION,
        "chunk": int(chunk),
        "platforms": list(exported.platforms),
        "nr_devices": int(exported.nr_devices),
        "crf_folded": crf is not None,
        "skip_learn_crf": bool(skip_learn_crf),
        "fine_cull": bool(fine_cull),
        "jax_version": jax.__version__,
    }
    header.update(meta or {})
    return exported, header


def save_renderer(path: str, exported, meta: dict) -> None:
    blob = exported.serialize()
    head = json.dumps(meta).encode("utf-8")
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(head)))
        f.write(head)
        f.write(blob)


class ServingRenderer:
    """A deserialized render artifact: callable on one ray chunk, plus a
    pose-level convenience that streams chunks with bounded in-flight
    dispatch (same pipeline discipline as `train/evaluate.py`)."""

    def __init__(self, exported, meta: dict):
        self._exported = exported
        # jit once: a bare exported.call per chunk re-dispatches eagerly
        # (hashing the whole serialized module each call); jitted it is
        # one cached executable and chunks pipeline asynchronously
        self._call = jax.jit(exported.call)
        self.meta = dict(meta)
        self.chunk = int(meta["chunk"])
        self.platforms = tuple(meta.get("platforms", ()))
        self.nr_devices = int(meta.get("nr_devices", exported.nr_devices))
        self._sharding = None
        if self.nr_devices > 1:
            # data-parallel artifact: rebuild the ray placement it was
            # exported under (1-D mesh over the first nr_devices devices)
            from jax.sharding import (Mesh, NamedSharding,
                                      PartitionSpec as P)

            devs = jax.devices()
            if len(devs) < self.nr_devices:
                raise ValueError(
                    f"artifact was exported for {self.nr_devices} devices; "
                    f"this process has {len(devs)}")
            mesh = Mesh(np.array(devs[:self.nr_devices]), ("data",))
            self._sharding = NamedSharding(mesh, P("data"))

    def __call__(self, rays):
        if tuple(np.shape(rays)) != (self.chunk, 3, 2):
            raise ValueError(
                f"this artifact renders fixed chunks of shape "
                f"({self.chunk}, 3, 2); got {tuple(np.shape(rays))} — pad "
                f"or re-export with a different --export_chunk")
        if self._sharding is not None:
            # one sharded host transfer; jnp.asarray first would commit to
            # the default device and pay a second device->device reshard
            rays = jax.device_put(np.asarray(rays, np.float32),
                                  self._sharding)
        else:
            rays = jnp.asarray(rays, jnp.float32)
        return self._call(rays)

    def render_poses(self, poses, H: Optional[int] = None,
                     W: Optional[int] = None, K=None,
                     render_factor: int = 0, verbose: bool = False):
        """Render [N,3,4] camera poses -> (rgbs [N,H,W,3], depths [N,H,W]).

        H/W/K default to the values recorded at export time."""
        from .train.evaluate import render_poses as _render_poses

        H = int(H if H is not None else self.meta["H"])
        W = int(W if W is not None else self.meta["W"])
        K = np.asarray(K if K is not None else self.meta["K"], np.float64)
        return _render_poses(None, lambda _v, rays: self(rays), poses,
                             H, W, K, chunk=self.chunk,
                             render_factor=render_factor, verbose=verbose)


def export_experiment(args, out_path: str, chunk: int = 32768,
                      devices: int = 1) -> dict:
    """Config + checkpoint directory -> one serving artifact on disk.

    Rebuilds the model exactly as training would (same config +
    dataset-derived camera/AABB), restores the latest checkpoint from
    ``args.ft_path`` or ``args.basedir/args.expname/checkpoints``, folds
    the rgb CRF, and writes the artifact. ``devices > 1`` exports
    data-parallel over that many local devices (rays sharded, weights
    replicated). Returns the header metadata.
    Used by ``tools/export_renderer.py``.
    """
    import copy

    from . import config
    from .train.checkpoint import CheckpointManager
    from .train.loop import build_datasets, build_initial_state, build_model

    args = config.resolve_event_thresholds(copy.copy(args))

    # only the frame dataset is needed (camera/AABB/near-far); skip the
    # event-stream preprocessing + EDI prior an events experiment would
    # otherwise replay at export time
    dargs = copy.copy(args)
    dargs.use_events = False
    llff, _ = build_datasets(dargs)
    _, _, model, crf = build_model(args, llff)

    # the restore template must be built exactly as training built it
    # (optimizer chain structure included); prefit values are irrelevant —
    # the checkpoint overwrites them — so skip the CRF identity pre-fit
    state, _ = build_initial_state(args, llff, model, crf,
                                   crf_identity_prefit=False)

    ckpt_dir = (args.ft_path if args.ft_path
                else os.path.join(args.basedir, args.expname, "checkpoints"))
    mngr = CheckpointManager(ckpt_dir)
    try:
        restored = mngr.restore_latest(state)
    finally:
        mngr.close()
    if restored is None:
        raise FileNotFoundError(f"no checkpoint found under {ckpt_dir}")
    step, state = int(restored[0]), restored[1]

    variables = {"params": state.params["nerf"]}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    mesh = None
    if devices > 1:
        from .parallel import create_mesh

        avail = jax.devices()
        if len(avail) < devices:
            raise ValueError(
                f"export requested {devices} devices but this process has "
                f"{len(avail)} — the artifact would silently shard "
                f"differently than asked")
        mesh = create_mesh(avail[:devices])
    exported, meta = export_renderer(
        model, variables, chunk=chunk, mesh=mesh,
        crf=crf, crf_params=state.params["crf"],
        fine_cull=bool(getattr(args, "fine_cull_eval", False)
                       and getattr(args, "fine_cull_capacity", 0.0) > 0),
        # match the training-time render of this same checkpoint: the
        # learned CRF head only applies once training has reached
        # tone_mapping_start_learn_iter (train/loop.py render cadence)
        skip_learn_crf=step < args.tone_mapping_start_learn_iter,
        meta={"H": llff.h, "W": llff.w,
              "K": np.asarray(llff.K, np.float64).tolist(),
              "near": float(llff.near), "far": float(llff.far),
              "expname": args.expname, "step": step})
    save_renderer(out_path, exported, meta)
    return meta


def load_renderer(path: str) -> ServingRenderer:
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path} is not an EvDeblurNeRF serving "
                             f"artifact (bad magic {magic!r})")
        (head_len,) = struct.unpack("<Q", f.read(8))
        meta = json.loads(f.read(head_len).decode("utf-8"))
        blob = f.read()
    if meta.get("format_version", 0) > FORMAT_VERSION:
        raise ValueError(
            f"artifact format v{meta['format_version']} is newer than this "
            f"loader (v{FORMAT_VERSION})")
    exported = jax.export.deserialize(blob)
    return ServingRenderer(exported, meta)
