"""Multi-host (multi-process) execution: DCN-scale data parallelism.

The reference is a single-process, single-GPU program (SURVEY.md §2.8 —
its ``--num_gpu`` flag only pads render-pose batches, ref:
options.py:33, run_nerf.py:357-359). On a TPU pod slice one Python
process runs per host; each process addresses only its local chips while
``jax.devices()`` spans the whole slice, and every jitted computation is
launched SPMD by all processes. This module is everything the rest of
the framework needs to run in that regime:

- :func:`initialize` — bring up the JAX distributed runtime (must run
  before the first backend touch).
- :func:`put_global` / :func:`replicate_global` — turn host batches /
  state into **global** arrays. Data loading is replicated-deterministic:
  every host assembles the same global batch from the same PRNG seed
  (batch assembly is a cheap vectorized numpy gather — the expensive
  event preprocessing is a one-time startup cost), and each process
  hands its addressable devices their rows via
  ``jax.make_array_from_callback``. No cross-host data exchange happens
  at all; gradient psums over DCN are inserted by XLA exactly as over
  ICI, and remain the only inter-host traffic in the hot loop.
- :func:`is_primary` — gate for host-side side effects (checkpoint
  writes, logging, image/video dumps), which run on process 0 only;
  the replicated model state makes process 0's copy complete.

Single-process behavior is identical with or without this module: every
helper degrades to a plain ``device_put``.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

_initialized = False


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    Must be called before anything queries a backend (``jax.devices()``,
    any jit). With no arguments, coordination parameters come from the
    environment — on Cloud TPU pods ``jax.distributed.initialize()``
    auto-detects everything; elsewhere set ``EVDN_COORDINATOR``,
    ``EVDN_NUM_PROCESSES`` and ``EVDN_PROCESS_ID`` (used by the
    multi-process CPU tests too).
    """
    global _initialized
    if _initialized:
        return
    coordinator = coordinator or os.environ.get("EVDN_COORDINATOR")
    if num_processes is None and os.environ.get("EVDN_NUM_PROCESSES"):
        num_processes = int(os.environ["EVDN_NUM_PROCESSES"])
    if process_id is None and os.environ.get("EVDN_PROCESS_ID"):
        process_id = int(os.environ["EVDN_PROCESS_ID"])
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _initialized = True


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that owns host-side side effects."""
    return jax.process_index() == 0


def _from_host(x, sharding) -> jax.Array:
    """Host value (same on every process) -> global array."""
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def put_global(tree, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Multi-host analog of :func:`parallel.mesh.shard_batch`.

    Every process must hold the SAME full host batch (deterministic
    sampling from a shared seed guarantees it); leading axes shard over
    ``axis_name``, scalars replicate.
    """
    data = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        return _from_host(x, repl if x.ndim == 0 else data)

    return jax.tree_util.tree_map(put, tree)


def replicate_global(tree, mesh: Mesh):
    """Replicate host-identical state (params/opt state) over all
    processes' devices. The leaves must be bitwise identical across
    processes — true for anything derived from the shared PRNG seed or
    restored from the shared checkpoint."""
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: _from_host(jax.device_get(x), repl), tree)


def batch_put_fn(mesh: Mesh,
                 axis_name: str = DATA_AXIS) -> Callable[[dict], dict]:
    """A ``put_fn`` for :class:`data.pipeline.Prefetcher`."""
    return lambda batch: put_global(batch, mesh, axis_name)
