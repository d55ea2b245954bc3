"""Parameter form tests, mirroring reference tests/test_parameter.py: predictor values
and gradient shapes/values across all forms."""

import jax.numpy as jnp
import numpy as np
import pytest

from openmcmc_tpu.linalg import structured as st
from openmcmc_tpu.parameters import (
    Identity,
    LinearCombination,
    LinearCombinationWithTransform,
    MixtureParameterMatrix,
    MixtureParameterVector,
    ScaledMatrix,
)


@pytest.fixture
def state(rng):
    return {
        "beta": jnp.asarray(rng.normal(size=(3, 1))),
        "alpha": jnp.asarray(rng.normal(size=(2, 1))),
        "X": jnp.asarray(rng.normal(size=(10, 3))),
        "A": jnp.asarray(rng.normal(size=(10, 2))),
        "tau": jnp.asarray([[2.5]]),
        "P": jnp.asarray(np.eye(4)),
        "theta": jnp.asarray(rng.normal(size=(3, 1))),
        "lam": jnp.asarray([[1.0], [2.0], [3.0]]),
        "Z": jnp.asarray(np.array([[0], [2], [1], [0], [2]], dtype=np.int32)),
    }


def test_identity(state):
    p = Identity("beta")
    np.testing.assert_allclose(p.predictor(state), state["beta"])
    assert p.get_param_list() == ["beta"]
    np.testing.assert_allclose(p.grad(state, "beta"), np.eye(3))
    np.testing.assert_allclose(p.grad(state, "other"), np.zeros((3, 3)))


def test_identity_grad_raises_on_matrix(state):
    p = Identity("X")
    with pytest.raises(ValueError):
        p.grad(state, "X")


def test_linear_combination(state):
    p = LinearCombination(form={"beta": "X", "alpha": "A"})
    want = np.asarray(state["X"]) @ np.asarray(state["beta"]) + np.asarray(state["A"]) @ np.asarray(state["alpha"])
    np.testing.assert_allclose(p.predictor(state), want, rtol=1e-5)
    excl = p.predictor_conditional(state, term_to_exclude="beta")
    np.testing.assert_allclose(excl, np.asarray(state["A"]) @ np.asarray(state["alpha"]), rtol=1e-5)
    assert set(p.get_param_list()) == {"beta", "alpha", "X", "A"}
    assert set(p.get_grad_param_list()) == {"beta", "alpha"}
    np.testing.assert_allclose(p.grad(state, "beta"), np.asarray(state["X"]).T)


def test_linear_combination_with_transform(state):
    p = LinearCombinationWithTransform(form={"beta": "X"}, transform={"beta": True})
    want = np.asarray(state["X"]) @ np.exp(np.asarray(state["beta"]))
    np.testing.assert_allclose(p.predictor(state), want, rtol=1e-5)
    grad = p.grad(state, "beta")
    np.testing.assert_allclose(grad, np.exp(np.asarray(state["beta"])) * np.asarray(state["X"]).T, rtol=1e-5)
    p2 = LinearCombinationWithTransform(form={"beta": "X"}, transform={"beta": False})
    np.testing.assert_allclose(p2.grad(state, "beta"), np.asarray(state["X"]).T)


def test_scaled_matrix(state):
    p = ScaledMatrix(matrix="P", scalar="tau")
    pred = p.predictor(state)
    assert isinstance(pred, st.Dense)
    np.testing.assert_allclose(st.to_dense(pred), 2.5 * np.eye(4))
    np.testing.assert_allclose(st.to_dense(p.precision_unscaled(state)), np.eye(4))
    assert p.get_grad_param_list() == ["tau"]


def test_scaled_matrix_structured(state):
    bands = jnp.asarray([[2.0, 2.0, 2.0], [-1.0, -1.0, 0.0]])
    s = dict(state)
    s["P"] = st.Banded(bands)
    p = ScaledMatrix(matrix="P", scalar="tau")
    pred = p.predictor(s)
    assert isinstance(pred, st.Banded)
    np.testing.assert_allclose(pred.bands, 2.5 * bands)


def test_mixture_parameter_vector(state):
    p = MixtureParameterVector(param="lam", allocation="Z")
    np.testing.assert_allclose(p.predictor(state).ravel(), [1.0, 3.0, 2.0, 1.0, 3.0])
    grad = p.grad(state, "lam")
    # one-hot (n_components, n_data)
    want = np.array([[1, 0, 0, 1, 0], [0, 0, 1, 0, 0], [0, 1, 0, 0, 1]], dtype=float)
    np.testing.assert_allclose(grad, want)
    assert p.get_grad_param_list() == ["lam"]


def test_mixture_parameter_matrix(state):
    p = MixtureParameterMatrix(param="lam", allocation="Z")
    pred = p.predictor(state)
    assert isinstance(pred, st.Diagonal)
    np.testing.assert_allclose(pred.diag_, [1.0, 3.0, 2.0, 1.0, 3.0])
    mask = p.precision_unscaled(state, 2)
    np.testing.assert_allclose(mask.diag_, [0.0, 1.0, 0.0, 0.0, 1.0])
    with pytest.raises(TypeError):
        p.grad(state, "lam")
    assert p.get_grad_param_list() == []


def test_forms_are_static_config():
    """Forms must be hashable static config (usable as jit-static metadata)."""
    a = LinearCombination(form={"beta": "X"})
    b = LinearCombination(form={"beta": "X"})
    assert a == b and hash(a) == hash(b)
    assert hash(Identity("x")) == hash(Identity("x"))
