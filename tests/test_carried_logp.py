"""Carried current-state log-density for Metropolis samplers.

When no other sampler modifies an MH sampler's model inputs, the driver carries the
current conditional log-density in the stats pytree so each step evaluates only the
proposal. The carried value must be EXACT: log_p of the post-select state is, op for
op, either the proposal's or the current value, so runs with and without the carry
are bit-identical given the same keys."""

import jax
import jax.numpy as jnp
import numpy as np

from openmcmc_tpu.distributions import Normal
from openmcmc_tpu.mcmc import MCMC
from openmcmc_tpu.model import Model
from openmcmc_tpu.samplers import ManifoldMALA, RandomWalk


def _heights():
    mdl = Model(
        [
            Normal("y", mean="h", precision="tau"),
            Normal("h", mean="mu", precision="lambda"),
        ]
    )
    state = {
        "y": np.array([[150.0, 155.0, 190.0, 160.0, 173.0]]),
        "h": 170.0, "tau": jnp.eye(1) / 200.0, "mu": 160.0, "lambda": jnp.eye(1) / 100.0,
    }
    return mdl, state


def _run(sampler_cls, carry, **kw):
    mdl, state = _heights()
    sampler = sampler_cls("h", mdl, **kw)
    m = MCMC(state, [sampler], mdl, n_burn=10, n_iter=50, n_chains=8, seed=1)
    assert sampler.carry_logp  # single-sampler chain: enabled automatically
    if not carry:
        sampler.carry_logp = False
    return m.run()


def test_single_sampler_carry_enabled_and_bitexact():
    res_carry = _run(RandomWalk, carry=True, step=5.0)
    res_plain = _run(RandomWalk, carry=False, step=5.0)
    np.testing.assert_array_equal(np.asarray(res_carry.store["h"]), np.asarray(res_plain.store["h"]))
    assert "logp" in res_carry.stats["h"] and "logp" not in res_plain.stats["h"]
    # carried value equals the conditional log-density of the final state
    sampler = RandomWalk("h", _heights()[0], step=5.0)
    from openmcmc_tpu.mcmc import _coerce_state

    final = dict(_coerce_state(_heights()[1]))
    for k in res_carry.final_state:
        final[k] = res_carry.final_state[k][0]
    want = sampler._conditional_log_p(final)
    np.testing.assert_allclose(float(res_carry.stats["h"]["logp"][0]), float(want), rtol=1e-6)


def test_mmala_carry_bitexact():
    res_carry = _run(ManifoldMALA, carry=True, step=1.0)
    res_plain = _run(ManifoldMALA, carry=False, step=1.0)
    np.testing.assert_array_equal(np.asarray(res_carry.store["h"]), np.asarray(res_plain.store["h"]))


def test_multi_sampler_disables_carry():
    """A second sampler touching the model inputs must disable the carry."""
    mdl, state = _heights()
    rw_h = RandomWalk("h", mdl, step=5.0)
    rw_mu = RandomWalk("mu", mdl, step=2.0)
    MCMC(dict(state), [rw_h, rw_mu], mdl, n_burn=1, n_iter=2, n_chains=2, seed=0)
    # rw_h's conditional model depends on mu, which rw_mu updates -> no carry
    assert not rw_h.carry_logp
    # rw_mu's conditional model (prior of h given mu... i.e. Normal("h")) depends on h
    assert not rw_mu.carry_logp
