"""Profiling / tracing helpers.

The reference's only observability is a tqdm bar (SURVEY.md section 5, reference
mcmc.py:97). Here: jax.profiler capture around a run (view in TensorBoard or
xprof), and a named-scope context for annotating custom sweep phases so kernels show
up with meaningful names in the trace.
"""

from __future__ import annotations

import contextlib
from typing import Iterator

import jax


@contextlib.contextmanager
def trace_annotated(name: str) -> Iterator[None]:
    """Annotate a traced region so it appears as ``name`` in profiler output."""
    with jax.named_scope(name):
        yield


def profile_run(mcmc, log_dir: str):
    """Run an MCMC object under the JAX profiler; trace written to ``log_dir``.

    Compile the program first (one throwaway run) so the trace contains steady-state
    device execution rather than compilation.
    """
    result = mcmc.run()  # warm up / compile
    jax.block_until_ready(result.store)
    with jax.profiler.trace(log_dir):
        result = mcmc.run()
        jax.block_until_ready(result.store)
    return result
