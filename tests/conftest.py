"""Test configuration: force CPU JAX with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (and without the slow
remote-TPU tunnel present in some environments).

The environment may pre-register a remote TPU backend and force
``jax_platforms`` via sitecustomize, so we both set the env var and update
the jax config explicitly before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_collection_modifyitems(items):
    # every test not explicitly marked slow belongs to the fast tier, so
    # both `-m fast` and `-m "not slow"` select the <2-minute subset
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)
