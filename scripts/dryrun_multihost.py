"""Multi-host (DCN) dryrun: 2 simulated processes x 4 CPU devices, one mesh.

Validates the multi-host scaling path end-to-end WITHOUT pod hardware
(SURVEY.md section 2 parallelism table: "multi-host DCN for slices"): two
OS processes each own 4 fake CPU devices, `jax.distributed.initialize`
(Gloo backend) stitches them into one 8-device global mesh, and the ordinary
`MCMC(mesh=...)` driver runs a GMRF smoother with chains sharded across BOTH
processes. Each process then reads only its local chain shard and the
processes cross-check a pooled posterior summary over the allgather wire.

Run: python scripts/dryrun_multihost.py            (parent: spawns 2 workers)
     python scripts/dryrun_multihost.py N PORT     (worker N, internal)

Exit code 0 + "MULTIHOST DRYRUN OK" on success.
"""

import os
import subprocess
import sys

# workers re-exec this file directly, so sys.path[0] is scripts/; make the
# repo root importable whether or not the package is pip-installed
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(process_id: int, port: int) -> None:
    import jax

    # the container presets JAX_PLATFORMS=axon and the plugin ignores the env
    # var (CLAUDE.md); force the CPU backend + fake device count BEFORE any
    # device query
    jax.config.update("jax_platforms", "cpu")
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    from openmcmc_tpu.parallel import distributed

    distributed.initialize(f"localhost:{port}", num_processes=2, process_id=process_id)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8 and jax.local_device_count() == 4

    import numpy as np

    from openmcmc_tpu.distributions import Gamma, Normal
    from openmcmc_tpu.linalg import gmrf
    from openmcmc_tpu.mcmc import MCMC
    from openmcmc_tpu.model import Model
    from openmcmc_tpu.parallel.sharding import make_mesh
    from openmcmc_tpu.parameters import ScaledMatrix
    from openmcmc_tpu.samplers import NormalGamma, NormalNormal

    # the reference's north-star workload (examples/4_GMRF_smoother.ipynb) at
    # tiny sizes: every process builds the identical model/data from the seed
    p = 24
    rng = np.random.default_rng(0)
    y = np.sin(np.linspace(0, 3, p)) + 0.1 * rng.standard_normal(p)
    P0 = gmrf.precision_temporal(np.arange(p, dtype=np.float64))
    mdl = Model(
        [
            Normal("y", mean="b", precision=ScaledMatrix("P_tau", "tau")),
            Normal("b", mean="mu", precision=ScaledMatrix("P_lam", "lam")),
            Gamma("lam", shape="a_lam", rate="b_lam"),
            Gamma("tau", shape="a_tau", rate="b_tau"),
        ]
    )
    state = {
        "y": y, "b": y.copy(), "mu": np.zeros(p),
        "P_lam": P0, "lam": 10.0, "a_lam": 10.0, "b_lam": 1.0,
        "P_tau": None, "tau": 1.0, "a_tau": 1.0, "b_tau": 1.0,
    }
    import jax.numpy as jnp

    from openmcmc_tpu.linalg import structured as st

    state["P_tau"] = st.Diagonal(jnp.ones(p))
    samplers = [NormalNormal("b", mdl), NormalGamma("lam", mdl), NormalGamma("tau", mdl)]

    n_chains = 16  # 2 per device across the 2-process mesh
    m = MCMC(dict(state), samplers, mdl, n_burn=5, n_iter=10, n_chains=n_chains,
             seed=0, mesh=make_mesh(), store_names=["b", "tau", "lam"])
    res = m.run(engine="generic")

    # every process touches ONLY its addressable chain shard
    local_b = distributed.local_chunk(res.store["b"])
    assert local_b.shape == (n_chains // 2, 10, p, 1), local_b.shape
    assert np.isfinite(local_b).all()
    local_lp = distributed.local_chunk(res.log_post)
    assert np.isfinite(local_lp).all()

    # pooled diagnostics across DCN: per-process posterior-mean summaries must
    # agree with the allgathered pooled value on every process
    local_mean = jnp.asarray(local_b.mean())
    gathered = np.asarray(distributed.allgather(local_mean))
    assert gathered.shape == (2,)
    pooled = float(gathered.mean())
    print(f"[proc {process_id}] local chains {local_b.shape[0]}, "
          f"local mean {float(local_mean):.4f}, pooled {pooled:.4f}", flush=True)

    # resume across the process-spanning mesh (put_global passes the already-
    # global final state straight through)
    res2 = m.run(engine="generic", resume=res)
    local_b2 = distributed.local_chunk(res2.store["b"])
    assert np.isfinite(local_b2).all()
    print(f"[proc {process_id}] resume ok", flush=True)

    # FUSED engine across the process-spanning mesh (VERDICT r5 item 6): the
    # smoother family must dispatch its fused engine under engine="auto" with
    # the chain mesh spanning both processes — one independent kernel per
    # device via shard_map, zero collectives. Validation is MATCH + COMPILE of
    # the whole sharded program: that is what differs on a real pod (sharding
    # layout, collective-free program construction, per-shard seed streams);
    # EXECUTING the kernels here would need interpret mode, whose emulation
    # callbacks deadlock under multi-controller shard_map (verified round 5 on
    # a trivial kernel) — the kernels' math runs in the single-process suite.
    from jax.experimental.pallas import tpu as pltpu

    from openmcmc_tpu.fused.dispatch import match_fused_engine

    m_f = MCMC(dict(state), samplers, mdl, n_burn=5, n_iter=10, n_chains=n_chains,
               seed=0, mesh=make_mesh(), store_names=["b", "tau", "lam"])
    with pltpu.force_tpu_interpret_mode():
        runner = match_fused_engine(m_f)
        assert runner is not None, "fused engine must match on the multihost mesh"
        assert runner.engine_name == "fused_smoother_spectral", runner.engine_name
        jax.jit(runner).lower(123).compile()
        out_shapes = jax.eval_shape(runner, 123)
    store_shapes = {k: tuple(v.shape) for k, v in out_shapes[0].items()}
    assert store_shapes["b"][:2] == (n_chains, 10), store_shapes
    print(f"[proc {process_id}] fused ok ({runner.engine_name}, compiled "
          f"{len(jax.devices())}-device program)", flush=True)


def _free_port() -> int:
    """Bind port 0 to get an OS-assigned free port for the coordinator.

    Deriving a port from the pid can collide with a live listener (another
    dryrun, anything in 29xxx), in which case both workers fail to rendezvous
    and the run only dies at the 600 s communicate() timeout. The socket is
    closed before the workers start: the tiny reuse race is far rarer than a
    pid-derived collision."""
    import socket

    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def parent() -> int:
    port = _free_port()
    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    rc = max(p.returncode for p in procs)
    for i, out in enumerate(outs):
        for line in out.splitlines():
            if line.startswith("[proc") or rc != 0:
                print(line)
    if rc == 0 and all("resume ok" in o and "fused ok" in o for o in outs):
        print("MULTIHOST DRYRUN OK")
        return 0
    print("MULTIHOST DRYRUN FAILED")
    return 1


if __name__ == "__main__":
    if len(sys.argv) == 3:
        worker(int(sys.argv[1]), int(sys.argv[2]))
    else:
        sys.exit(parent())
