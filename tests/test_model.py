"""Model tests, mirroring reference tests/test_model.py: log_p/grad sums over
components, conditional sub-model extraction."""

import jax.numpy as jnp
import numpy as np

from openmcmc_tpu.distributions import Gamma, Normal
from openmcmc_tpu.linalg import structured as st
from openmcmc_tpu.model import Model
from openmcmc_tpu.parameters import LinearCombination, ScaledMatrix


def _setup(rng):
    n, d = 8, 2
    state = {
        "y": jnp.asarray(rng.normal(size=(n, 1))),
        "X": jnp.asarray(rng.normal(size=(n, d))),
        "beta": jnp.asarray(rng.normal(size=(d, 1))),
        "tau": jnp.asarray([[2.0]]),
        "P_tau": st.Diagonal(jnp.ones(n)),
        "mu0": jnp.zeros((d, 1)),
        "P0": jnp.asarray(np.eye(d)),
        "a": jnp.asarray([[2.0]]),
        "b": jnp.asarray([[1.0]]),
    }
    dists = [
        Normal("y", mean=LinearCombination(form={"beta": "X"}), precision=ScaledMatrix("P_tau", "tau")),
        Normal("beta", mean="mu0", precision="P0"),
        Gamma("tau", shape="a", rate="b"),
    ]
    return Model(dists), state, dists


def test_log_p_is_sum_of_components(rng):
    mdl, state, dists = _setup(rng)
    total = float(mdl.log_p(state))
    parts = sum(float(d.log_p(state)) for d in dists)
    np.testing.assert_allclose(total, parts, rtol=1e-5)


def test_grad_log_p_is_sum(rng):
    mdl, state, dists = _setup(rng)
    grad, hess = mdl.grad_log_p(state, "beta")
    gsum = sum(np.asarray(d.grad_log_p(state, "beta", hessian_required=False)) for d in dists if "beta" in d.param_list)
    np.testing.assert_allclose(grad, gsum, rtol=1e-4, atol=1e-5)
    assert hess.shape == (2, 2)
    # grad-only mode matches
    grad_only = mdl.grad_log_p(state, "beta", hessian_required=False)
    np.testing.assert_allclose(grad, grad_only, rtol=1e-6)


def test_conditional(rng):
    mdl, state, _ = _setup(rng)
    sub = mdl.conditional("beta")
    assert set(sub.keys()) == {"y", "beta"}
    sub_tau = mdl.conditional("tau")
    assert set(sub_tau.keys()) == {"y", "tau"}
    assert set(mdl.conditional("X").keys()) == {"y"}


def test_response_mapping(rng):
    mdl, state, dists = _setup(rng)
    mdl2 = Model(dists, response={"y": "mean"})
    pred = getattr(mdl2["y"], "mean").predictor(state)
    np.testing.assert_allclose(pred, np.asarray(state["X"]) @ np.asarray(state["beta"]), rtol=1e-5)
