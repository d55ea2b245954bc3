"""Fully-fused random-walk Metropolis engine: the whole MH run in one Pallas launch.

Third fused family (after the conjugate smoother and linreg engines): a METROPOLIS
sampler, showing the one-launch pattern is not specific to conjugate Gibbs. Covers the
reference examples/2_samplers.ipynb workload (reference metropolis_hastings.py:176-269
driving mcmc.py:87): scalar location h with

    y_i ~ N(h, 1/tau)  (i = 1..N),    h ~ N(mu, 1/lam),

random-walk proposals h' = h + step * z. The data enters only through N, S1 = sum y,
S2 = sum y^2, so each iteration is ~15 scalar ops per chain: propose, one carried
log-density update (the current value rides the loop carry -- nothing is recomputed),
branchless accept. Log-posterior includes the full normalizing constants, matching
Model.log_p exactly. Chains ride the lane axis; draws stream to HBM via
double-buffered DMA.

Parity-tested against the generic driver in tests/test_fused_rw.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openmcmc_tpu.fused.prng import LOG_2PI, normal, uniform

BLOCK_B = 2048
OUT_ROWS = 8  # [h, log_post, accept_flag, 0...]


def _make_kernel(n_obs, mu, tau, lam, step, h0, n_burn, n_keep):
    # constants of the joint log-density (match Model.log_p)
    const = 0.5 * (n_obs * np.log(tau) - n_obs * LOG_2PI) + 0.5 * (np.log(lam) - LOG_2PI)

    def kernel(seed_ref, scal_ref, out_ref, stage_ref, sems):
        pid = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + pid)
        s1 = scal_ref[0]  # sum(y)
        s2 = scal_ref[1]  # sum(y^2)

        def log_post(h):
            quad_lik = s2 - 2.0 * h * s1 + n_obs * h * h
            return const - 0.5 * tau * quad_lik - 0.5 * lam * (h - mu) ** 2

        def iteration(it, carry):
            h, lp, acc = carry  # (1, BLOCK_B) rows
            z = normal((1, BLOCK_B))
            h_prop = h + step * z
            lp_prop = log_post(h_prop)
            accept = jnp.log(uniform((1, BLOCK_B))) < (lp_prop - lp)
            h_new = jnp.where(accept, h_prop, h)
            lp_new = jnp.where(accept, lp_prop, lp)
            # running accept count over burn + sampling, so the reported acceptance
            # rate uses the generic driver's counting window (accumulated from -n_burn)
            acc_new = acc + accept.astype(jnp.float32)

            @pl.when(it >= n_burn)
            def _():
                idx = it - n_burn
                slot = lax.rem(idx, 2)

                @pl.when(idx >= 2)
                def _():
                    pltpu.make_async_copy(
                        stage_ref.at[slot], out_ref.at[idx - 2, :, pl.ds(pid * BLOCK_B, BLOCK_B)], sems.at[slot]
                    ).wait()

                rows = [h_new, lp_new, accept.astype(jnp.float32), acc_new]
                rows += [jnp.zeros((1, BLOCK_B), jnp.float32)] * (OUT_ROWS - len(rows))
                stage_ref[pl.ds(slot, 1)] = jnp.concatenate(rows, axis=0)[None, :, :]
                pltpu.make_async_copy(
                    stage_ref.at[slot], out_ref.at[idx, :, pl.ds(pid * BLOCK_B, BLOCK_B)], sems.at[slot]
                ).start()

            return h_new, lp_new, acc_new

        h0_row = jnp.full((1, BLOCK_B), h0, jnp.float32)
        zero_row = jnp.zeros((1, BLOCK_B), jnp.float32)
        lax.fori_loop(0, n_burn + n_keep, iteration, (h0_row, log_post(h0_row), zero_row))

        for last in range(max(0, n_keep - 2), n_keep):
            slot = last % 2
            pltpu.make_async_copy(
                stage_ref.at[slot], out_ref.at[last, :, pl.ds(pid * BLOCK_B, BLOCK_B)], sems.at[slot]
            ).wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_burn", "n_iter", "n_chains", "mu", "tau", "lam", "step", "h0"),
)
def run_fused_rw(
    seed: int,
    y: jnp.ndarray,
    n_burn: int,
    n_iter: int,
    n_chains: int,
    mu: float,
    tau: float,
    lam: float,
    step: float = 0.2,
    h0: float = 0.0,
):
    """Run the full random-walk MH chain for h | y in one fused kernel.

    y: (N,) observations. Returns dict with h/log_post: (n_chains, n_iter),
    accept: (n_chains, n_iter) 0/1 flags, and accept_total: (n_chains,) accept
    counts accumulated over burn-in AND sampling (the generic driver's counting
    window; divide by n_burn + n_iter for the acceptance rate)."""
    y = jnp.asarray(y, jnp.float32).reshape(-1)
    n_obs = y.shape[0]
    scal = jnp.stack([jnp.sum(y), jnp.sum(y * y)]).astype(jnp.float32)

    b_total = n_chains + ((-n_chains) % BLOCK_B)
    kernel = _make_kernel(
        float(n_obs), float(mu), float(tau), float(lam), float(step), float(h0), n_burn, n_iter
    )
    (out,) = pl.pallas_call(
        kernel,
        grid=(b_total // BLOCK_B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),),
        out_shape=(jax.ShapeDtypeStruct((n_iter, OUT_ROWS, b_total), jnp.float32),),
        scratch_shapes=[
            pltpu.VMEM((2, OUT_ROWS, BLOCK_B), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(jnp.asarray([seed], jnp.int32), scal)

    draws = jnp.transpose(out[:, :, :n_chains], (2, 0, 1))
    return {
        "h": draws[:, :, 0],
        "log_post": draws[:, :, 1],
        "accept": draws[:, :, 2],
        "accept_total": draws[:, -1, 3],
    }
