"""Multi-host (DCN) scaling: one global mesh across processes, zero per-iteration
communication.

The reference is a single Python process on one CPU core; this framework's chain
parallelism extends across HOSTS: each process drives its local TPU devices,
``jax.distributed.initialize`` stitches the processes into one global mesh, and
the ordinary ``MCMC(mesh=...)`` API shards chains across all of them. Chains are
embarrassingly parallel, so nothing crosses DCN per iteration — only init-time
placement and end-of-run summary gathers.

On a real pod each host runs THIS SAME SCRIPT (jax.distributed.initialize
auto-detects coordinator/process_id from the pod environment and the worker()
body below is the whole program). Without pod hardware, running this file
simulates the topology: 2 OS processes x 4 fake CPU devices over Gloo, through
scripts/dryrun_multihost.py.

The host-boundary idioms (openmcmc_tpu.parallel.distributed):

    from openmcmc_tpu.parallel import distributed, make_mesh

    distributed.initialize()                  # once, before any device work
    m = MCMC(state, samplers, model, n_chains=65536, mesh=make_mesh(), ...)
    res = m.run()                             # chains sharded across ALL hosts

    local_draws = distributed.local_chunk(res.store["b"])   # my chains only
    pooled = distributed.allgather(local_draws.mean())      # cross-host summary

Run: python examples/12_multihost.py
"""

import subprocess
import sys
from pathlib import Path

if __name__ == "__main__":
    script = Path(__file__).resolve().parent.parent / "scripts" / "dryrun_multihost.py"
    print("simulating a 2-host x 4-device mesh (Gloo, fake CPU devices)...")
    sys.exit(subprocess.run([sys.executable, str(script)]).returncode)
