"""Device-mesh parallelism: chain sharding and pooled collectives."""

from openmcmc_tpu.parallel.sharding import make_mesh, make_mesh_2d, pooled_mean_var, shard_chains

__all__ = ["make_mesh", "make_mesh_2d", "shard_chains", "pooled_mean_var"]

from openmcmc_tpu.parallel.distributed_gmrf import (  # noqa: E402
    sample_rw1_canonical_sharded,
    tridiag_solve_sharded,
)

__all__ += ["tridiag_solve_sharded", "sample_rw1_canonical_sharded"]

from openmcmc_tpu.parallel.smoother import (  # noqa: E402
    match_distributed_smoother,
    run_distributed_smoother,
)

__all__ += ["match_distributed_smoother", "run_distributed_smoother"]

from openmcmc_tpu.parallel.distributed import (  # noqa: E402
    allgather,
    initialize,
    is_multiprocess,
    local_chunk,
    put_global,
)

__all__ += ["initialize", "is_multiprocess", "put_global", "local_chunk", "allgather"]
