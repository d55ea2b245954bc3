"""Numerical debugging: NaN/Inf guards for sampling runs.

The reference has no sanitizers (SURVEY.md section 5: single-threaded, no guard
rails beyond -inf log-densities). The TPU-native equivalents:

- ``check_result``: host-side audit of a finished MCMCResult -- locates the first
  non-finite draw per parameter and chain, the usual first step when a model blows up.
- ``nan_debug``: context manager enabling ``jax_debug_nans`` so the failing primitive
  is re-run un-jitted and raises at the exact operation (slow; debugging only).

For in-graph guarding, drive the model's log_p through ``jax.experimental.checkify``
manually -- the sampling loop itself stays guard-free for speed.
"""

from __future__ import annotations

import contextlib
from typing import Dict

import jax
import numpy as np


def check_result(result) -> Dict[str, dict]:
    """Audit an MCMCResult for non-finite draws; returns {name: report}.

    Report fields: ``bad_chains`` (chain indices containing any non-finite draw) and
    ``first_bad_iter`` (earliest offending iteration per bad chain).
    """
    report = {}
    items = dict(result.store)
    items["log_post"] = result.log_post
    for name, draws in items.items():
        arr = np.asarray(draws)
        flat = arr.reshape(arr.shape[0], arr.shape[1], -1) if arr.ndim > 2 else arr[..., None]
        bad = ~np.isfinite(flat).all(axis=2)  # (chains, iters)
        if bad.any():
            chains = np.where(bad.any(axis=1))[0]
            report[name] = {
                "bad_chains": chains.tolist(),
                "first_bad_iter": {int(c): int(np.argmax(bad[c])) for c in chains},
            }
    return report


@contextlib.contextmanager
def nan_debug():
    """Re-run under this to make the first NaN-producing primitive raise immediately."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
