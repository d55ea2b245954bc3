"""Checkpoint / resume for MCMC runs.

The reference has no persistence: results live in an in-memory store and a crash loses
the run (SURVEY.md section 5, reference mcmc.py:81-85). Here the sampling carry
(final chain states + per-chain PRNG keys + sampler statistics) is a complete
checkpoint; together with ``MCMC.run(resume=...)`` it gives crash-recovery and
incremental long runs.

Uses orbax when available (atomic, async-capable, cross-host), falling back to a
plain .npz snapshot.
"""

from __future__ import annotations

import os
import jax.numpy as jnp
import numpy as np

from openmcmc_tpu.mcmc import MCMCResult


_EMPTY = "__empty_dict__"


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        if not tree:
            # npz has no way to store an empty dict (e.g. a conjugate sampler's
            # stats); record a sentinel so the structure round-trips
            out[prefix + _EMPTY] = np.zeros(())
            return out
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if parts[-1] != _EMPTY:
            node[parts[-1]] = jnp.asarray(value)
    return tree


def save_checkpoint(path: str, result: MCMCResult, include_store: bool = False) -> None:
    """Persist the sampling carry (and optionally the draws) of a result.

    Args:
        path: directory (orbax) or .npz file path (numpy fallback).
        result: a finished MCMCResult.
        include_store: also persist the stored draws (can be large).
    """
    payload = {
        "final_state": result.final_state,
        "final_key": result.final_key,
        "stats": result.stats,
    }
    if include_store:
        payload["store"] = result.store
        payload["log_post"] = result.log_post

    if path.endswith(".npz"):
        np.savez(path, **_flatten(payload))
        return

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)


def load_checkpoint(path: str) -> MCMCResult:
    """Restore a checkpoint as an MCMCResult suitable for ``MCMC.run(resume=...)``.

    The store/log_post fields are empty unless the checkpoint was saved with
    include_store=True.
    """
    if path.endswith(".npz"):
        with np.load(path) as data:
            payload = _unflatten({k: data[k] for k in data.files})
    else:
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            payload = ckptr.restore(os.path.abspath(path))

    return MCMCResult(
        store=payload.get("store", {}),
        log_post=payload.get("log_post", jnp.zeros(())),
        stats=payload["stats"],
        final_state=payload["final_state"],
        final_key=jnp.asarray(payload["final_key"]).astype(jnp.uint32),
    )
