"""Device-mesh utilities: data-parallel sharding over ICI.

The reference is strictly single-GPU (its ``--num_gpu`` flag only pads
render-pose batches, ref: options.py:33, run_nerf.py:357-359); scaling here
is a first-class TPU-native design instead (SURVEY.md §2.8): a 1-D
``jax.sharding.Mesh`` over all chips, ray batches sharded on their leading
axis, parameters replicated. Gradients are reduced by XLA-inserted psums
when the jitted train step runs under these shardings — there is no
hand-written collective anywhere.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(devices: Optional[Sequence] = None,
                axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (ray) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, k: int) -> int:
    """Rays/poses padded up to a mesh-size multiple — the TPU-native
    equivalent of the reference's dummy-pose padding (ref: run_nerf.py:357)."""
    return -(-n // k) * k


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place a host batch on the mesh, leading axis sharded.

    Scalars / 0-d entries are replicated.
    """
    data = batch_sharding(mesh, axis_name)
    repl = replicated_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, repl)
        return jax.device_put(x, data)

    return jax.tree_util.tree_map(put, batch)
