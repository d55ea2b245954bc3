"""Test configuration: run the suite on a simulated 8-device CPU mesh.

Mirrors the reference's CI strategy (plain pytest, analytic-vs-numeric cross-checks,
reference /root/reference/tests/) but adds multi-device coverage via XLA's host
platform device count, per SURVEY.md section 4.
"""

import os

# OPENMCMC_TPU_TEST_BACKEND=tpu runs the suite on the real chip (used to exercise the
# TPU-gated statistical tests, e.g. `OPENMCMC_TPU_TEST_BACKEND=tpu pytest
# tests/test_fused_linreg.py`); default is the simulated 8-device CPU mesh.
_REAL_TPU = os.environ.get("OPENMCMC_TPU_TEST_BACKEND") == "tpu"

if not _REAL_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's axon TPU plugin prepends "axon," to jax_platforms regardless of the
# env var; force the CPU backend explicitly so tests run on the 8-device fake mesh.
if not _REAL_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: statistical test that needs the real chip PRNG; the only tests "
        "executed under OPENMCMC_TPU_TEST_BACKEND=tpu",
    )


def pytest_collection_modifyitems(config, items):
    """Real-chip runs execute ONLY the TPU-gated statistical tests.

    The rest of the suite is CPU coverage (interpret-mode kernel mirrors, the
    8-device fake mesh, host-bit statistical CI) and is pathological on the
    tunneled TPU backend: interpret-mode Pallas dispatches every kernel op
    eagerly through the tunnel at 10-40 ms each, so a 2-second CPU test runs
    for tens of minutes and can wedge the device for everything after it.
    TPU-gated tests carry the explicit ``tpu`` marker; a skipif written in the
    requires-TPU gating idiom without the marker is a collection error (it
    would otherwise be skipped on every backend and silently never run
    anywhere). Only the gating idiom is matched — a reversed-polarity skip
    that merely *mentions* TPU (e.g. "flaky on TPU tunnel") is left alone."""
    import re

    gating = re.compile(r"(requires?|needs?)\s+(the\s+)?(real\s+)?(chip|TPU)", re.IGNORECASE)
    for item in items:
        tpu_worded = any(
            gating.search(str(m.kwargs.get("reason", ""))) for m in item.iter_markers("skipif")
        )
        if tpu_worded and item.get_closest_marker("tpu") is None:
            raise pytest.UsageError(
                f"{item.nodeid}: TPU-gated skipif without @pytest.mark.tpu -- "
                "it would be skipped on every backend; add the marker"
            )
    if not _REAL_TPU:
        return
    skip = pytest.mark.skip(
        reason="CPU-suite test; OPENMCMC_TPU_TEST_BACKEND=tpu runs only the TPU-gated statistical tests"
    )
    for item in items:
        if item.get_closest_marker("tpu") is None:
            item.add_marker(skip)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
