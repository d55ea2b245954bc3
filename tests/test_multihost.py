"""Multi-host (multi-process) mesh simulation: 2 CPU processes, one global mesh.

The reference has no distributed layer at all (SURVEY.md section 2); the
equivalent-to-build is the multi-host DCN path. Real pods are untestable here,
so this runs the subprocess-based simulation dryrun: 2 OS processes x 4 fake
CPU devices joined by jax.distributed.initialize (Gloo), chains sharded across
both processes through the ordinary MCMC(mesh=...) API, per-process local
shard reads, cross-process pooled diagnostics, and resume.
"""

import pathlib
import subprocess
import sys

SCRIPT = pathlib.Path(__file__).resolve().parent.parent / "scripts" / "dryrun_multihost.py"


def test_two_process_mesh_dryrun():
    out = subprocess.run(
        [sys.executable, str(SCRIPT)], capture_output=True, text=True, timeout=600
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "MULTIHOST DRYRUN OK" in out.stdout


def test_put_global_single_process_is_device_put():
    """Single-process put_global must behave exactly like jax.device_put."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from openmcmc_tpu.parallel.distributed import is_multiprocess, local_chunk, put_global
    from openmcmc_tpu.parallel.sharding import make_mesh

    assert not is_multiprocess()
    mesh = make_mesh()
    sharding = NamedSharding(mesh, P("chains"))
    x = np.arange(32, dtype=np.float32).reshape(16, 2)
    arr = put_global(x, sharding)
    assert arr.sharding.is_equivalent_to(sharding, 2)
    np.testing.assert_array_equal(np.asarray(arr), x)
    np.testing.assert_array_equal(local_chunk(arr), x)  # all shards addressable
    assert len(arr.addressable_shards) == len(jax.devices())
