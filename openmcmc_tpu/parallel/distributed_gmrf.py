"""Distributed GMRF: one very large tridiagonal system sharded across the mesh.

SURVEY.md section 2 identifies this as the closest analog of tensor/sequence
parallelism for this framework: instead of sharding chains, shard the *sequence
dimension* of a single huge RW1 GMRF across devices. The reference has no multi-device
capability at all; this is the stretch component built TPU-first.

Algorithm (SPIKE / Schur complement on block interfaces):

1. Each device owns a contiguous block of the tridiagonal system T x = r
   (diag ``a``, symmetric off-diagonal ``c``; the last ``c`` of each block couples to
   the next device's first unknown).
2. Locally (no communication): solve three interior tridiagonal systems
   T_k y = r_k, T_k u = e_first, T_k v = e_last with the log-depth scans.
3. Each device contributes 6 boundary scalars per chain; one ``all_gather`` over ICI
   builds the reduced (2D x 2D) interface system (D = number of devices), solved
   redundantly on every device (tiny batched dense solve).
4. Local back-substitution: x_k = y - c_left * u * l_{k-1} - c_right * v * f_{k+1}.

Communication: a single all_gather of O(D) scalars per chain -- the solve is
compute-local, interface-exchange-global, exactly the block-tridiagonal structure
the hardware mesh wants.

Sampling one huge smoother conditional (``sample_rw1_canonical_sharded``) uses
Papandreou & Yuille perturbation sampling: for Q = lam * D1' W D1 + diag(t),
    x = Q^{-1} (b + sqrt(lam) D1' W^{1/2} z1 + sqrt(t) z2),  z ~ N(0, I)
has exactly Cov = Q^{-1}, so the draw reduces to local noise (one ppermute for the
difference-operator boundary) plus the distributed solve.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from openmcmc_tpu.linalg import structured as st


def _batched_tridiag_chol(a: jnp.ndarray, c: jnp.ndarray):
    """Cholesky bands for batched tridiagonal systems. a, c: (..., m); c[..., -1] unused."""
    bands = jnp.stack([a, jnp.concatenate([c[..., :-1], jnp.zeros_like(c[..., :1])], axis=-1)], axis=0)
    out = st._tridiag_cholesky(bands)  # stacked (..., 2, m)
    return out[..., 0, :], out[..., 1, :]  # l_diag, l_off


def _batched_tridiag_solve(a: jnp.ndarray, c: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Solve T x = r for batched SPD tridiagonal T. a, c, r: (..., m)."""
    ld, loff = _batched_tridiag_chol(a, c)
    l_prev = jnp.concatenate([jnp.zeros_like(loff[..., :1]), loff[..., :-1]], axis=-1)
    # forward L w = r
    alpha_f = -l_prev / ld
    w = st._affine_scan(alpha_f, (r / ld)[..., None], reverse=False)[..., 0]
    # backward L^T x = w
    alpha_b = -loff / ld
    x = st._affine_scan(alpha_b, (w / ld)[..., None], reverse=True)[..., 0]
    return x


def tridiag_solve_sharded(
    a: jnp.ndarray,
    c: jnp.ndarray,
    rhs: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "seq",
    batch_axis: str = None,
) -> jnp.ndarray:
    """Solve T x = rhs with the sequence axis sharded over the mesh.

    a, c, rhs: (..., n) with n divisible by the mesh size; c[..., i] couples unknowns
    i and i+1 (c[..., n-1] must be 0). Returns x with the same sharding.

    ``batch_axis``: optional second mesh axis sharding the leading (chain) dimension —
    the combined DP x SP layout: interface collectives run within each chain group
    over ``axis_name`` only.
    """
    from jax import shard_map

    n_dev = mesh.shape[axis_name]

    def local(a_blk, c_blk, r_blk):
        # shapes (..., m); within-block coupling is c_blk[..., :-1], the last entry
        # couples to the next device (c_right); the previous device's last c is c_left
        m = a_blk.shape[-1]
        batch_shape = a_blk.shape[:-1]
        idx = lax.axis_index(axis_name)

        c_right = c_blk[..., -1]
        c_left = lax.ppermute(c_right, axis_name, [(i, (i + 1) % n_dev) for i in range(n_dev)])
        c_left = jnp.where(idx == 0, jnp.zeros_like(c_left), c_left)
        c_right = jnp.where(idx == n_dev - 1, jnp.zeros_like(c_right), c_right)

        e_first = jnp.zeros_like(a_blk).at[..., 0].set(1.0)
        e_last = jnp.zeros_like(a_blk).at[..., -1].set(1.0)
        y = _batched_tridiag_solve(a_blk, c_blk, r_blk)
        u = _batched_tridiag_solve(a_blk, c_blk, e_first)
        v = _batched_tridiag_solve(a_blk, c_blk, e_last)

        # 8 boundary scalars per chain -> all_gather the reduced interface system
        stats = jnp.stack(
            [y[..., 0], y[..., -1], u[..., 0], u[..., -1], v[..., 0], v[..., -1], c_left, c_right],
            axis=-1,
        )  # (..., 8)
        alls = lax.all_gather(stats, axis_name)  # (D, ..., 8)

        # assemble M s = q with s = [f_0, l_0, ..., f_{D-1}, l_{D-1}]
        two_d = 2 * n_dev
        eye = jnp.eye(two_d, dtype=a_blk.dtype)
        M = jnp.broadcast_to(eye, batch_shape + (two_d, two_d)).copy()
        q = jnp.zeros(batch_shape + (two_d,), a_blk.dtype)
        for k in range(n_dev):
            y0, ym, u0, um, v0, vm, cl, cr = [alls[k, ..., j] for j in range(8)]
            q = q.at[..., 2 * k].set(y0)
            q = q.at[..., 2 * k + 1].set(ym)
            if k > 0:
                M = M.at[..., 2 * k, 2 * (k - 1) + 1].set(cl * u0)
                M = M.at[..., 2 * k + 1, 2 * (k - 1) + 1].set(cl * um)
            if k < n_dev - 1:
                M = M.at[..., 2 * k, 2 * (k + 1)].set(cr * v0)
                M = M.at[..., 2 * k + 1, 2 * (k + 1)].set(cr * vm)
        s = jnp.linalg.solve(M, q[..., None])[..., 0]  # (..., 2D)

        # extract this device's neighbors' interface values
        l_prev = jnp.take(s, jnp.maximum(2 * (idx - 1) + 1, 0), axis=-1)
        l_prev = jnp.where(idx == 0, jnp.zeros_like(l_prev), l_prev)
        f_next = jnp.take(s, jnp.minimum(2 * (idx + 1), two_d - 1), axis=-1)
        f_next = jnp.where(idx == n_dev - 1, jnp.zeros_like(f_next), f_next)

        x = y - (c_left * l_prev)[..., None] * u - (c_right * f_next)[..., None] * v
        return x

    lead = [batch_axis] + [None] * (a.ndim - 2) if batch_axis else [None] * (a.ndim - 1)
    spec = P(*(lead + [axis_name]))
    fn = shard_map(local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    return fn(a, c, rhs)


def sample_rw1_canonical_sharded(
    key,
    b: jnp.ndarray,
    s: jnp.ndarray,
    lam,
    tau_diag: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "seq",
    ridge: float = 0.0,
    batch_axis: str = None,
) -> jnp.ndarray:
    """Draw x ~ N(Q^{-1} b, Q^{-1}) for one huge RW1 smoother precision, sharded.

    Q = lam * D1' W D1 + diag(tau_diag) (+ ridge * e_0 e_0'), with D1 the first
    difference operator on locations ``s`` and W = diag(1/diff(s)) -- exactly the
    reference's precision_irregular structure (reference gmrf.py:375-411) at a size no
    single device could hold. Perturbation sampling (Papandreou & Yuille 2010):
    local noise + one distributed solve; the only collectives are a ppermute (one
    boundary element of D1' z) and the interface all_gather of the solve.

    b, tau_diag: (..., n); s: (n,) locations; ``lam`` and ``ridge`` may be scalars
    or arrays broadcastable against the leading (chain) axes, e.g. per-chain
    sampled scales with shape (..., 1). Returns (..., n).
    """
    n = b.shape[-1]
    lam = jnp.asarray(lam, b.dtype)
    ridge = jnp.asarray(ridge, b.dtype)
    w = 1.0 / jnp.diff(s)  # (n-1,)
    w_pad = jnp.concatenate([w, jnp.zeros((1,), w.dtype)])  # per-edge weights, edge i: (i, i+1)

    # tridiagonal bands of Q = lam D1' W D1 + diag(tau) + ridge e0 e0'
    d0 = lam * (jnp.concatenate([w, jnp.zeros((1,))]) + jnp.concatenate([jnp.zeros((1,)), w])) + tau_diag
    one_hot0 = (jnp.arange(n) == 0).astype(b.dtype)
    d0 = d0 + ridge * one_hot0
    c = -lam * w_pad  # c[n-1] = 0

    k1, k2, k3 = jax.random.split(key, 3)
    z_edge = jax.random.normal(k1, b.shape, b.dtype)  # one noise per edge (last unused)
    z_node = jax.random.normal(k2, b.shape, b.dtype)
    z_ridge = jax.random.normal(k3, b.shape[:-1], b.dtype)
    # D1' W^{1/2} z: node i gets sqrt(w_i) z_i (from edge i) - sqrt(w_{i-1}) z_{i-1}
    contrib = jnp.sqrt(lam * w_pad) * z_edge
    shifted = jnp.roll(contrib, 1, axis=-1).at[..., 0].set(0.0)
    perturbation = -contrib + shifted
    # NOTE: jnp.roll on a sharded axis lowers to a collective permute under SPMD
    b_tilde = b + perturbation + jnp.sqrt(tau_diag) * z_node
    # the ridge term's own noise (sqrt(ridge) z at node 0), so Cov(b_tilde - b) = Q exactly
    b_tilde = b_tilde + jnp.sqrt(ridge) * z_ridge[..., None] * one_hot0

    a_full = jnp.broadcast_to(d0, b.shape)
    c_full = jnp.broadcast_to(c, b.shape)
    return tridiag_solve_sharded(a_full, c_full, b_tilde, mesh, axis_name, batch_axis=batch_axis)
