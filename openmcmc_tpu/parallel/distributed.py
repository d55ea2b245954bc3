"""Multi-host (multi-process) mesh construction and data placement.

The reference is a single Python process (SURVEY.md section 2: no
multiprocessing/MPI/NCCL imports anywhere); its scaling ceiling is one CPU.
Here the chain-parallel design extends across HOSTS: each process drives its
own local TPU devices, `jax.distributed.initialize` stitches the processes
into one global device mesh, and the sampling loop stays communication-free
(chains are embarrassingly parallel) -- only pooled diagnostics and
checkpointing reduce across DCN.

The helpers in this module are the multi-host-safe versions of the
single-process idioms used by the driver:

- `initialize(...)`           -- `jax.distributed.initialize` wrapper (no-op
                                 when running single-process).
- `put_global(tree, sharding)`-- place HOST-IDENTICAL data (every process
                                 computes the same array, e.g. chain keys
                                 split from one seed) as a global sharded
                                 array. `jax.device_put` does this only in a
                                 single process; across processes the
                                 callback form hands each process exactly its
                                 addressable shards.
- `local_chunk(arr)`          -- this process's rows of a chain-sharded global
                                 array (the store/stats a user can touch
                                 without cross-host transfers).
- `allgather(tree)`           -- full cross-process gather via
                                 `jax.experimental.multihost_utils` (pooled
                                 diagnostics over a small summary, NOT the
                                 draw store).

Wire protocol: single-host meshes ride ICI; a multi-host mesh's chain axis
spans DCN, which is fine because nothing communicates per-iteration. Validated
in simulation by `scripts/dryrun_multihost.py` (2 CPU processes x 4 fake
devices, Gloo backend) and `tests/test_multihost.py`.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Join the cross-process runtime (call once, before any device work).

    On Cloud TPU pods the three arguments are auto-detected from the
    environment and may be omitted; in simulation (or on bare hosts) pass them
    explicitly. No-op when num_processes == 1 is requested explicitly."""
    if num_processes == 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def put_global(tree, sharding):
    """Place host-identical arrays as global arrays with the given sharding.

    Every process must hold the SAME full-size host values (the driver's
    inputs are deterministic functions of the seed/state, so they are); each
    process materializes only the shards it owns. Single-process: plain
    `jax.device_put` (cheaper -- no callback indirection)."""
    if not is_multiprocess():
        return jax.device_put(tree, sharding)

    def place(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x  # already global (e.g. resume state from a sharded run)
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

    return jax.tree.map(place, tree)


def local_chunk(arr) -> np.ndarray:
    """This process's contiguous rows of a leading-axis-sharded global array.

    After a sharded multi-host run, the draw store lives distributed across
    hosts; each host analyses (or serializes) its own chains without pulling
    the full store over DCN. Shards are ordered by their global row offset so
    the result is the contiguous [lo, hi) block this process owns."""
    shards = sorted(arr.addressable_shards, key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def allgather(tree):
    """Gather a (small) pytree from every process onto every process.

    For pooled cross-chain diagnostics: gather per-host SUMMARIES (means,
    variances, ESS terms), never the draw store itself."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)
