"""Multi-host (multi-process) data-parallel equivalence.

The reference is single-process/single-GPU (SURVEY.md §2.8); multi-host
DP is a TPU-native addition (parallel/multihost.py): one process per
host, global batches assembled deterministically on every host, rows
handed to local devices via ``jax.make_array_from_callback``, gradient
psums crossing processes (DCN on a real pod; gloo in this CPU test).

Here 2 subprocesses × 4 virtual CPU devices run the SAME full train step
as ``tests/test_parallel.py`` and must reproduce the in-process
8-device (and therefore single-device) loss and gradients; the worker
also saves + restores an orbax checkpoint with every process calling
``save`` (the all-process barrier contract the train loop relies on).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_step_matches_single_process(tmp_path):
    from test_parallel import _run_one_step

    port = _free_port()
    out = str(tmp_path / "proc0.npz")
    env = {**os.environ,
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4"}
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(TESTS_DIR, "multihost_worker.py"),
         str(pid), "2", str(port), out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    assert os.path.exists(out), logs[0][-4000:]

    assert os.path.isdir(out + ".ckpt"), "multi-process checkpoint missing"

    data = np.load(out)
    loss_mh = float(data["loss"])
    skip = {"loss", "eval_rgb", "eval_depth"}
    grads_mh = {k: data[k] for k in data.files if k not in skip}

    loss1, grads1 = _run_one_step(1)
    assert np.isfinite(loss1)
    # same tolerance rationale as test_parallel: cross-process psum
    # reduction order may differ from the unsharded sum
    np.testing.assert_allclose(loss_mh, loss1, rtol=1e-6, atol=1e-7)
    import jax

    # same tolerances as test_parallel._assert_grads_close, restated for
    # the npz dict form the worker dumps
    for path, leaf1 in jax.tree_util.tree_leaves_with_path(grads1):
        name = jax.tree_util.keystr(path)
        leaf1 = np.asarray(leaf1)
        leaf_mh = grads_mh[name]
        scale = max(np.abs(leaf1).max(), 1e-5)
        np.testing.assert_allclose(
            leaf_mh, leaf1, rtol=5e-3, atol=1e-2 * scale,
            err_msg=f"multi-process grad mismatch at {name}")

    # the multi-host EVAL branch of build_chunk_renderer (global ray
    # chunks + replicated outputs) must reproduce a plain single-device
    # render of the same seed-derived initial variables
    from test_parallel import _make_batches, _setup

    from evdeblurnerf_tpu.train.evaluate import build_chunk_renderer
    from evdeblurnerf_tpu.train.optim import build_optimizer
    from evdeblurnerf_tpu.train.state import create_train_state

    args, model, crf = _setup()
    batch, _ = _make_batches()
    rays_info = {k: batch[k] for k in
                 ("images_idx", "rays_x", "rays_y", "poses")}
    tx = build_optimizer(args.lrate, args.lrate_decay)
    state = create_train_state(model, crf, tx, jax.random.PRNGKey(0),
                               batch["rays"], rays_info)
    variables = {"params": state.params["nerf"]}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    rgb1, depth1, _ = build_chunk_renderer(model)(variables, batch["rays"])
    np.testing.assert_allclose(data["eval_rgb"], np.asarray(rgb1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(data["eval_depth"], np.asarray(depth1),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.fast
def test_tp_multihost_rejected_fast(tmp_path, monkeypatch):
    """--tp_model_parallel under multi-host training is an explicit,
    documented scope cut (docs/PARITY.md): train() must reject the
    combination with an actionable message BEFORE touching the dataset
    (the datadir here doesn't exist — reaching the loader would raise a
    different error)."""
    from evdeblurnerf_tpu.config import default_args
    from evdeblurnerf_tpu.parallel import multihost as mh
    from evdeblurnerf_tpu.train.loop import train

    monkeypatch.setattr(mh, "is_multiprocess", lambda: True)
    args = default_args(basedir=str(tmp_path), expname="tpmh",
                        datadir=str(tmp_path / "nonexistent"),
                        dataset_type="llff", tp_model_parallel=2)
    with pytest.raises(NotImplementedError, match="tp_model_parallel"):
        train(args)


@pytest.mark.fast
def test_singleprocess_helpers_degenerate():
    """Without a distributed runtime the multihost helpers must behave
    exactly like the plain single-process path."""
    import jax

    from evdeblurnerf_tpu.parallel import (create_mesh, is_multiprocess,
                                           is_primary, put_global,
                                           replicate_global)

    assert is_primary() and not is_multiprocess()
    mesh = create_mesh(jax.devices()[:8])
    batch = {"rays": np.arange(48, dtype=np.float32).reshape(16, 3),
             "scalar": np.float32(3.0)}
    g = put_global(batch, mesh)
    assert g["rays"].sharding.num_devices == 8
    assert g["scalar"].sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(g["rays"]), batch["rays"])
    r = replicate_global({"w": np.ones((4, 4), np.float32)}, mesh)
    assert r["w"].sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(r["w"]), 1.0)
