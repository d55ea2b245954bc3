"""Gaussian-kernel basis hooks for reversible-jump regression models.

The reference's flagship RJ workload (reference tests/test_reversible_jump.py and
examples) regresses on a variable-size Gaussian-kernel basis

    B[:, j] = normpdf(X; theta_j, omega_j)          (active columns j < count)

and rebuilds ``B`` inside the samplers' state-update hooks. Here those hooks are a
first-class object so that (1) every call site (tests, examples, benchmarks) shares
one implementation, and (2) the fused-engine dispatcher can RECOGNIZE the basis
construction structurally: a user-supplied lambda is an opaque callable, but a
:class:`GaussianKernelBasis` bound method tells :mod:`openmcmc_tpu.fused.dispatch`
exactly what the basis math is, enabling the one-launch fused RJ kernel
(:mod:`openmcmc_tpu.fused.rj`) under ``MCMC.run(engine="auto")``.

Padded static-shape convention (:mod:`openmcmc_tpu.padding`): theta/omega are
(1, n_max) with ZERO padding; B is (n_data, n_max) with zero padded columns.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from openmcmc_tpu import padding


class GaussianKernelBasis:
    """Hook bundle maintaining ``B[:, j] = normpdf(X; theta_j, omega_j)``.

    Args:
        x: state name of the (n_data, 1) evaluation points (constant data).
        matrix: state name of the padded (n_data, n_max) basis matrix.
        theta: state name of the padded (1, n_max) kernel locations.
        omega: state name of the padded (1, n_max) kernel scales.
        count: state name of the integer active count.

    Pass ``basis.birth`` / ``basis.death`` to :class:`ReversibleJump`'s
    ``state_birth_function`` / ``state_death_function`` and ``basis.move`` /
    ``basis.move_vec`` to the theta/omega :class:`RandomWalkLoop`'s
    ``state_update_function`` / ``vector_state_update_function``.
    """

    def __init__(self, x="X", matrix="B", theta="theta", omega="omega", count="n_basis"):
        self.x = x
        self.matrix = matrix
        self.theta = theta
        self.omega = omega
        self.count = count

    def make(self, X, theta, omega, count):
        """Full padded basis; padded columns are exactly zero."""
        om = jnp.where(omega > 0, omega, 1.0)
        B = jax.scipy.stats.norm.pdf(X, loc=theta, scale=om)
        return B * padding.active_mask(count, theta.shape[1], B.dtype)[None, :]

    # -- ReversibleJump hooks ------------------------------------------------

    def birth(self, key, current_state, prop_state):
        prop_state = dict(prop_state)
        prop_state[self.matrix] = self.make(
            prop_state[self.x], prop_state[self.theta], prop_state[self.omega], prop_state[self.count]
        )
        return prop_state, jnp.asarray(0.0), jnp.asarray(0.0)

    def death(self, key, current_state, prop_state, deletion_index):
        return self.birth(key, current_state, prop_state)

    # -- RandomWalkLoop hooks ------------------------------------------------

    def move(self, key, updates, state, i):
        """Sequential-path hook: a single-column proposal changes only column i."""
        updates = dict(updates)
        th = updates.get(self.theta, state[self.theta])
        om = updates.get(self.omega, state[self.omega])
        th_i = jax.lax.dynamic_slice_in_dim(th, i, 1, axis=1)
        om_i = jax.lax.dynamic_slice_in_dim(om, i, 1, axis=1)
        om_i = jnp.where(om_i > 0, om_i, 1.0)
        col = jax.scipy.stats.norm.pdf(state[self.x], loc=th_i, scale=om_i)
        active = (i < jnp.reshape(state[self.count], ())).astype(col.dtype)
        updates[self.matrix] = jax.lax.dynamic_update_slice_in_dim(
            state[self.matrix], col * active, i, axis=1
        )
        return updates, jnp.asarray(0.0), jnp.asarray(0.0)

    def move_vec(self, key, updates, state):
        """Vectorized-path hook: one full basis rebuild after the per-column accepts."""
        updates = dict(updates)
        th = updates.get(self.theta, state[self.theta])
        om = updates.get(self.omega, state[self.omega])
        updates[self.matrix] = self.make(state[self.x], th, om, state[self.count])
        return updates
