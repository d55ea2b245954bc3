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
    assert m._carry_logp == {"h"}  # single-sampler chain: enabled automatically
    if not carry:
        m._carry_logp = frozenset()
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
    m = MCMC(dict(state), [rw_h, rw_mu], mdl, n_burn=1, n_iter=2, n_chains=2, seed=0)
    # rw_h's conditional model depends on mu, which rw_mu updates -> no carry;
    # rw_mu's conditional model (prior of h given mu, i.e. Normal("h")) depends on h
    assert m._carry_logp == frozenset()


def test_sampler_reuse_across_mcmc_objects():
    """Carry is PER-RUN state: the same sampler instance used first in a
    single-sampler chain (carry on) and then in a multi-sampler sweep (carry off)
    must behave correctly in both — the second run's draws must be bit-identical
    to those of a fresh sampler that never saw the first MCMC."""
    mdl, state = _heights()
    rw_h = RandomWalk("h", mdl, step=5.0)

    m1 = MCMC(dict(state), [rw_h], mdl, n_burn=5, n_iter=20, n_chains=4, seed=3)
    assert m1._carry_logp == {"h"}
    res1 = m1.run()
    assert "logp" in res1.stats["h"]

    # reuse the SAME sampler instance in a sweep where carry must be off
    rw_mu = RandomWalk("mu", mdl, step=2.0)
    m2 = MCMC(dict(state), [rw_h, rw_mu], mdl, n_burn=5, n_iter=20, n_chains=4, seed=7)
    assert m2._carry_logp == frozenset()
    res2 = m2.run()
    assert "logp" not in res2.stats["h"]

    # fresh instances, same seeds: must match the reused-sampler run exactly
    m3 = MCMC(
        dict(state),
        [RandomWalk("h", mdl, step=5.0), RandomWalk("mu", mdl, step=2.0)],
        mdl, n_burn=5, n_iter=20, n_chains=4, seed=7,
    )
    res3 = m3.run()
    np.testing.assert_array_equal(np.asarray(res2.store["h"]), np.asarray(res3.store["h"]))
    np.testing.assert_array_equal(np.asarray(res2.store["mu"]), np.asarray(res3.store["mu"]))


def test_resume_reconciles_carried_logp():
    """Resuming a carry-on run in a sweep where carry is invalid must DROP the
    stale carried log-density (and vice versa seed a missing one)."""
    mdl, state = _heights()
    m1 = MCMC(dict(state), [RandomWalk("h", mdl, step=5.0)], mdl,
              n_burn=5, n_iter=10, n_chains=4, seed=3)
    res1 = m1.run()
    assert "logp" in res1.stats["h"]

    # resume into a sweep where h's inputs are moved by another sampler
    m2 = MCMC(
        dict(state),
        [RandomWalk("h", mdl, step=5.0), RandomWalk("mu", mdl, step=2.0)],
        mdl, n_burn=0, n_iter=10, n_chains=4, seed=9,
    )
    res1.stats.setdefault("mu", {"accept": jnp.zeros((4,), jnp.int32),
                                 "proposal": jnp.zeros((4,), jnp.int32)})
    res1.final_state.setdefault("mu", jnp.full((4, 1, 1), 160.0))
    res2 = m2.run(resume=res1)
    assert "logp" not in res2.stats["h"]

    # and the reverse: a carry-off run resumed into a single-sampler sweep
    m4 = MCMC(dict(state), [RandomWalk("h", mdl, step=5.0)], mdl,
              n_burn=0, n_iter=10, n_chains=4, seed=11)
    res2.stats.pop("mu"), res2.final_state.pop("mu")
    res4 = m4.run(resume=res2)
    assert "logp" in res4.stats["h"]
