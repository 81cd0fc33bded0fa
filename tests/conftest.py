"""Test configuration: run everything on a virtual 8-device CPU mesh so that
multi-chip sharding (pjit/shard_map collectives) is unit-testable without TPU
hardware.

Note: this environment pre-imports jax and pins the platform to the remote
TPU via sitecustomize, so setting JAX_PLATFORMS in the environment is not
enough — we must override the already-loaded config before the backend is
initialized.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# OCOCC_TEST_TPU=1 keeps the real backend so the suite (or hardware-only
# tests) can run on the chip
if os.environ.get("OCOCC_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running equivalence/training tests")
