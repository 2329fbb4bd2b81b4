"""Subprocess payload for the generation-env strict-window replay.

Runs our production train step for the first N lockstep steps in the SAME
environment the goldens were generated in — single-device f32 CPU, no
``xla_force_host_platform_device_count`` — so the measured strict
agreement window (docstring of test_lockstep_train.py) is re-verified by
CI instead of living only in the recorded artifact.

Usage: python lockstep_replay_child.py {noevents|events} N_STEPS OUT_NPZ
(invoked by tests/test_lockstep_train.py with a scrubbed env).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)
sys.path.insert(0, os.path.dirname(_here))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import lockstep_common as lc  # noqa: E402


def main():
    mode, n_steps, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    assert len(jax.devices()) == 1, (
        "generation-env replay needs a single CPU device; got "
        f"{jax.devices()} (XLA_FLAGS leaked into the child?)")
    if mode == "events":
        data = np.load(lc.golden_path_ev())
        init_flat = {k[len("init/"):]: data[k]
                     for k in data.files if k.startswith("init/")}
        losses, egms, _, _ = lc.run_ours_ev(n_steps, init_flat=init_flat)
        np.savez(out, losses=losses, egms=egms)
    else:
        data = np.load(lc.golden_path())
        init_flat = {k[len("init/"):]: data[k]
                     for k in data.files if k.startswith("init/")}
        losses, _, _ = lc.run_ours(n_steps, init_flat=init_flat)
        np.savez(out, losses=losses)


if __name__ == "__main__":
    main()
