"""Example 7: one huge GMRF sharded across the device mesh (sequence parallelism).

A 100,000-dimensional RW1 smoother conditional — far beyond what the reference's
SuperLU single-process solver handles interactively — sampled exactly with the
sequence axis sharded over all devices: local SPIKE solves + one tiny interface
all_gather + perturbation noise.

Run on real multi-chip hardware, or simulate:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/7_distributed_gmrf.py
"""

import os
import time

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the container's TPU plugin ignores the env var; force the CPU backend so the
    # documented simulation command works (same workaround as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from openmcmc_tpu.parallel import make_mesh, sample_rw1_canonical_sharded
from jax.sharding import NamedSharding, PartitionSpec as P


def main():
    mesh = make_mesh(axis_name="seq")
    n_dev = jax.device_count()
    n = 100_000 // n_dev * n_dev
    n_draws = 16
    print(f"{n}-dimensional GMRF over {n_dev} devices, {n_draws} draws")

    s = jnp.linspace(0.0, 1000.0, n)
    lam, tau = 50.0, 1.0
    rng = np.random.default_rng(0)
    y = jnp.asarray(np.sin(np.linspace(0, 60, n)) + rng.normal(0, 1.0, n))

    sharding = NamedSharding(mesh, P(None, "seq"))
    b = jax.device_put(jnp.broadcast_to(tau * y, (n_draws, n)), sharding)
    tau_diag = jax.device_put(jnp.broadcast_to(jnp.full((n,), tau), (n_draws, n)), sharding)

    @jax.jit
    def draw(key, b, tau_diag):
        return sample_rw1_canonical_sharded(key, b, s, lam, tau_diag, mesh, ridge=0.01)

    x = draw(jax.random.PRNGKey(0), b, tau_diag)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    x = draw(jax.random.PRNGKey(1), b, tau_diag)
    jax.block_until_ready(x)
    wall = time.perf_counter() - t0
    print(f"draw of {n_draws} x {n}-dim samples: {wall*1e3:.1f} ms; sharded over {len(x.sharding.device_set)} devices")
    print("posterior-draw head:", np.round(np.asarray(x[0, :5]), 3))
    print("finite:", bool(jnp.isfinite(x).all()))


if __name__ == "__main__":
    main()
