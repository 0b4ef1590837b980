"""Test configuration: run on a virtual 8-device CPU mesh.

Tests exercise multi-chip sharding on host CPU (the driver separately
dry-runs the multichip path via __graft_entry__.dryrun_multichip);
benchmarks use the real TPU.

Note: the environment's sitecustomize registers the axon TPU backend at
interpreter start, so env vars alone are too late — we override the
platform via jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# MT_TPU_TESTS=1 keeps the real TPU backend so tests/test_pallas_tpu.py
# can exercise the hardware kernels (everything else stays CPU-runnable)
if not os.environ.get("MT_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
