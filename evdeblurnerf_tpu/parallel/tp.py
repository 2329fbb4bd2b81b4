"""Tensor-parallel field sharding: a 2-D ``(data, model)`` device mesh.

The reference is strictly single-GPU; the DP mesh (``parallel/mesh.py``)
scales *throughput* over rays. This module adds the orthogonal axis:
sharding the factored voxel tables — the model's dominant memory
(params + grads + two Adam moments of every ``app_plane_i`` /
``app_line_i``) — over a second mesh axis so scene grids larger than one
chip's HBM become trainable.

Design (TPU-native, no reference counterpart):

* The packed-gather fast path (ops/triplane.py) concatenates the 4 texel
  neighbors along the component axis, so a GSPMD annotation on the raw
  ``[C, H, W]`` tables would re-gather (all-gather) the full table around
  every pack — useless for capacity. Instead the tp path runs the WHOLE
  per-plane sampling inside one ``shard_map`` over the ``(data, model)``
  mesh: each device packs and samples only its local ``C/k`` component
  slice for its local ray shard, contracts it with its local rows of the
  basis kernel (the per-plane segment of ``basis_mat``), and one
  ``lax.psum`` over the model axis produces the ``[N, app_dim]``
  features. Tables never move; the only collective is the psum of the
  small post-basis activations (+ the transposed psums autodiff inserts
  for the table/segment gradients over the data axis).
* Gathers on TPU are row-issue bound (~10-25 ns/row regardless of row
  width, PERF_NOTES.md), so slicing components does NOT speed sampling
  up — each model shard still issues every row. Tensor parallelism here
  buys memory capacity; the data axis buys speed. That honesty is why
  tp is opt-in (``create_mesh_2d``) rather than the default layout.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS  # single source of truth for the axis name

MODEL_AXIS = "model"

# (mesh, data_axis, model_axis) registered by the train loop / dryrun;
# VoxelNeRF.sample() routes through the shard_map tp path when set.
_TP = None


def set_tp_mesh(mesh: Optional[Mesh], data_axis: str = DATA_AXIS,
                model_axis: str = MODEL_AXIS) -> None:
    """Register (or clear, with None) the 2-D mesh for tp sampling."""
    global _TP
    if mesh is None:
        _TP = None
        return
    assert model_axis in mesh.axis_names and data_axis in mesh.axis_names, \
        (mesh.axis_names, data_axis, model_axis)
    _TP = (mesh, data_axis, model_axis)


def get_tp():
    """(mesh, data_axis, model_axis) or None."""
    return _TP


def create_mesh_2d(n_data: int, n_model: int,
                   devices: Optional[Sequence] = None,
                   data_axis: str = DATA_AXIS,
                   model_axis: str = MODEL_AXIS) -> Mesh:
    """``n_data x n_model`` mesh. The model axis should map to the faster
    ICI neighbors (it carries the per-step psums); with `jax.devices()`
    order on a TPU slice, adjacent device ids are ICI neighbors, so the
    model axis is the minor (fastest-varying) axis here."""
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) >= n_data * n_model, \
        f"need {n_data * n_model} devices, have {len(devices)}"
    grid = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (data_axis, model_axis))


def _is_table(path) -> bool:
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    return any(str(n).startswith(("app_plane_", "app_line_")) for n in names)


def tp_shardings(tree, mesh: Mesh, model_axis: str = MODEL_AXIS):
    """Pytree of NamedShardings for ``tree`` (params or a matching Adam
    moment tree): voxel tables whose component axis divides the model-axis
    size are sharded on that axis, everything else replicated.

    Used with ``jax.device_put`` on the train state; under jit the same
    placements act as in_shardings, so GSPMD keeps tables distributed and
    the shard_map tp path consumes them without any re-layout.
    """
    n_model = mesh.shape[model_axis]
    repl = NamedSharding(mesh, P())

    def one(path, leaf):
        if (_is_table(path) and hasattr(leaf, "ndim") and leaf.ndim >= 2
                and leaf.shape[0] % n_model == 0):
            return NamedSharding(
                mesh, P(model_axis, *([None] * (leaf.ndim - 1))))
        return repl

    return jax.tree_util.tree_map_with_path(one, tree)


def shard_state_tp(state, mesh: Mesh, model_axis: str = MODEL_AXIS):
    """Place a TrainState on the 2-D mesh: tables (and their optimizer
    moments, which mirror the param tree) model-sharded, rest replicated."""
    # params and each optax moment tree share the param tree structure, so
    # tp_shardings applies wherever the table names appear in the path.
    return jax.device_put(state, tp_shardings(state, mesh, model_axis))
