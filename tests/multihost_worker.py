"""Worker process for tests/test_multihost.py.

Usage: python multihost_worker.py <process_id> <num_processes> <port> <out.npz>

Each process owns 4 virtual CPU devices (XLA_FLAGS set by the launching
test); together they form one global 8-device mesh coordinated over
127.0.0.1:<port> with gloo cross-process collectives — the CPU stand-in
for one-process-per-TPU-host pod execution (parallel/multihost.py).
Runs the same full RBK+AWP+EGM+CRF train step as tests/test_parallel.py
and (on the primary) dumps loss + gradients for the equivalence check.
"""

import os
import sys

pid, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4])

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(__file__))
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if repo not in sys.path:
    sys.path.insert(0, repo)

from evdeblurnerf_tpu.parallel import multihost  # noqa: E402

multihost.initialize(f"127.0.0.1:{port}", nproc, pid)

import numpy as np  # noqa: E402

from evdeblurnerf_tpu.parallel import create_mesh  # noqa: E402
from evdeblurnerf_tpu.train.optim import build_optimizer  # noqa: E402
from evdeblurnerf_tpu.train.state import create_train_state  # noqa: E402
from evdeblurnerf_tpu.train.step import (build_train_step,  # noqa: E402
                                         compute_schedule_weights)
from evdeblurnerf_tpu.utils.misc import annealing_interpolator  # noqa: E402
from test_parallel import _make_batches, _setup  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
assert len(jax.local_devices()) == 8 // nproc, len(jax.local_devices())

args, model, crf = _setup()
batch, ev_batch = _make_batches()
mesh = create_mesh()

key = jax.random.PRNGKey(0)
tx = build_optimizer(args.lrate, args.lrate_decay)
rays_info = {k: batch[k] for k in
             ("images_idx", "rays_x", "rays_y", "poses")}
state = create_train_state(model, crf, tx, key, batch["rays"], rays_info)

# snapshot the (deterministic, seed-derived) initial eval variables and a
# host ray batch for the multi-host eval-path check below
variables0 = {"params": jax.device_get(state.params["nerf"])}
if state.batch_stats:
    variables0["batch_stats"] = jax.device_get(state.batch_stats)
rays_host = np.asarray(batch["rays"])

state = multihost.replicate_global(state, mesh)
batch = multihost.put_global(batch, mesh)
ev_batch = multihost.put_global(ev_batch, mesh)

step_fn = build_train_step(model, crf, tx, args, return_grads=True)
sw = compute_schedule_weights(
    args, 0, kernel_end_warmup_iter=-1, w_kernel=lambda s: 1.0,
    w_pts0_target=lambda s: 0.0,
    w_events_egm=annealing_interpolator(1.0, 1.0, None, "constant"),
    fine_loss_weight=0.1, events_active=True)
state, aux = step_fn(state, batch, ev_batch, key, sw,
                     force_naive=False, events_active=True)

loss = float(aux["loss"])
grads = jax.device_get(aux["grads_tree"])

# multi-host EVAL path: build_chunk_renderer takes the process_count()>1
# branch (host chunks -> global arrays via put_global, outputs replicated
# so every process can read its local copy); the test compares the
# primary's render against an in-process single-device render of the
# same seed-derived initial variables
from evdeblurnerf_tpu.train.evaluate import build_chunk_renderer  # noqa: E402

chunk_fn = build_chunk_renderer(model, mesh=mesh)
v0_global = multihost.replicate_global(variables0, mesh)
eval_rgb, eval_depth, eval_acc = chunk_fn(v0_global, rays_host)
eval_rgb, eval_depth = np.asarray(eval_rgb), np.asarray(eval_depth)
assert np.isfinite(eval_rgb).all() and np.isfinite(eval_depth).all()

if multihost.is_primary():
    flat = {jax.tree_util.keystr(k): np.asarray(v)
            for k, v in jax.tree_util.tree_leaves_with_path(grads)}
    np.savez(out_path, loss=np.float64(loss), eval_rgb=eval_rgb,
             eval_depth=eval_depth, **flat)

# checkpoint round-trip under multi-process execution: EVERY process must
# call save (orbax runs a global sync barrier inside CheckpointManager.save;
# a primary-only call deadlocks — the regression the train loop fixes by
# not gating the save on is_primary) while orbax itself performs the write
# on the primary host only.
from evdeblurnerf_tpu.train.checkpoint import CheckpointManager  # noqa: E402

host_state = jax.device_get(state)
ckpt = CheckpointManager(out_path + ".ckpt")
ckpt.save(1, host_state, force=True)
ckpt.wait()
restored = ckpt.restore_latest(host_state)
assert restored is not None and int(restored[0]) == 1, restored
np.testing.assert_array_equal(
    np.asarray(jax.tree_util.tree_leaves(restored[1].params)[0]),
    np.asarray(jax.tree_util.tree_leaves(host_state.params)[0]))
ckpt.close()

print(f"proc {pid}: loss={loss}", flush=True)
