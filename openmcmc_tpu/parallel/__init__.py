"""Device-mesh parallelism: chain sharding and pooled collectives."""

from openmcmc_tpu.parallel.sharding import make_mesh, pooled_mean_var, shard_chains

__all__ = ["make_mesh", "shard_chains", "pooled_mean_var"]
