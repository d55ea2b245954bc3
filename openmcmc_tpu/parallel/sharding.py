"""Multi-device chain sharding over a TPU mesh.

The reference is single-process with no distributed layer (SURVEY.md section 2,
"Parallelism strategies": none). Here multi-device scaling is first-class:

- chains are the data-parallel axis, sharded over a 1-D (or the flattened) device mesh
  via ``jax.sharding.NamedSharding``; sampling is communication-free,
- pooled diagnostics (cross-chain ESS / R-hat terms) reduce over ICI with
  ``shard_map`` + ``psum`` collectives.

Chains are embarrassingly parallel, so the sampling loop itself never communicates:
XLA only inserts collectives for the pooled diagnostics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "chains") -> Mesh:
    """1-D mesh over (the first n) available devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_chains(tree, mesh: Mesh, axis_name: str = "chains"):
    """Place a chain-batched pytree with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(tree, sharding)


def pooled_mean_var(draws: jnp.ndarray, mesh: Mesh, axis_name: str = "chains"):
    """Cross-chain pooled mean/variance of sharded draws via ICI psum collectives.

    draws: (n_chains, ...) sharded on axis 0 over the mesh. Demonstrates the pooled
    diagnostics pattern (sampling stays communication-free; only reductions ride ICI).
    """
    from jax import shard_map

    n_total = draws.shape[0]

    def local(block):
        s = jax.lax.psum(jnp.sum(block, axis=0), axis_name)
        ss = jax.lax.psum(jnp.sum(block * block, axis=0), axis_name)
        mean = s / n_total
        var = ss / n_total - mean * mean
        return mean, var

    fn = shard_map(local, mesh=mesh, in_specs=P(axis_name), out_specs=(P(), P()))
    return fn(draws)


def make_mesh_2d(n_chain_devices: int, n_seq_devices: int) -> Mesh:
    """2-D (chains x seq) mesh: data parallelism over chains, sequence parallelism
    over the latent field (the DP x SP layout of the distributed smoother)."""
    devices = jax.devices()[: n_chain_devices * n_seq_devices]
    return Mesh(np.asarray(devices).reshape(n_chain_devices, n_seq_devices), ("chains", "seq"))
