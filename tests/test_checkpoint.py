"""Checkpoint manager: versioned saves, latest-step restore, structure."""

import jax.numpy as jnp
import numpy as np

from evdeblurnerf_tpu.train.checkpoint import CheckpointManager


def test_save_restore_roundtrip(tmp_path):
    mngr = CheckpointManager(str(tmp_path / "ck"))
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "step": jnp.int32(7)}
    mngr.save(7, state)
    mngr.wait()
    assert mngr.latest_step() == 7

    template = {"params": {"w": jnp.zeros((2, 3))}, "step": jnp.int32(0)}
    step, restored = mngr.restore_latest(template)
    assert step == 7
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    assert int(restored["step"]) == 7


def test_multiple_versions_latest_wins(tmp_path):
    mngr = CheckpointManager(str(tmp_path / "ck"))
    for s in (5, 10, 15):
        mngr.save(s, {"x": jnp.full((2,), float(s))})
    mngr.wait()
    assert mngr.latest_step() == 15
    step, restored = mngr.restore_latest({"x": jnp.zeros((2,))})
    assert step == 15 and float(restored["x"][0]) == 15.0


def test_restore_empty_returns_none(tmp_path):
    mngr = CheckpointManager(str(tmp_path / "ck"))
    assert mngr.restore_latest({"x": jnp.zeros(1)}) is None
