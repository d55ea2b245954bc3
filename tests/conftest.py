"""Test configuration: run the suite on a simulated 8-device CPU mesh.

Mirrors the reference's CI strategy (plain pytest, analytic-vs-numeric cross-checks,
reference /root/reference/tests/) but adds multi-device coverage via XLA's host
platform device count, per SURVEY.md section 4.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's axon TPU plugin prepends "axon," to jax_platforms regardless of the
# env var; force the CPU backend explicitly so tests run on the 8-device fake mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
