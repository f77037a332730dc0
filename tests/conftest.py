"""Test configuration: CPU backend with 8 virtual devices for sharding tests."""

import os

# Must be set before jax initializes. Gives every test session a virtual
# 8-device mesh so multi-chip sharding paths execute without TPU hardware.
# (The driver environment pre-sets JAX_PLATFORMS=axon — the tunneled TPU —
# which would make every eager op a network round-trip; tests force CPU.)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone does not win against the pre-registered axon TPU plugin;
# the config update does.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="module", autouse=True)
def _bounded_live_executables():
    """Clear XLA compilation caches at every test-module boundary.

    XLA:CPU segfaults compiling large programs once hundreds of executables
    from earlier modules are live in the process (deterministic at
    full-suite scale only; any subset passes).  A single hand-placed clear
    before the biggest program (test_samplers) stopped being enough as the
    suite grew — the round-3 batched-refit programs pushed the trip point
    back into test_refit — so the bound is now enforced at every module
    boundary.  Cost: shared substrate kernels recompile per module
    (seconds), against a ~25-minute suite.
    """
    jax.clear_caches()
    yield
