import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inference_tpu.models import (
    GaussianLikelihood,
    CauchyLikelihood,
    LogisticLikelihood,
)


def setup_data(seed=0):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 1, 8)
    y = 2.0 * x + 1.0 + rng.normal(0, 0.1, x.size)
    sigma = np.full(x.size, 0.1)

    def forward(theta):
        return theta[0] * jnp.asarray(x) + theta[1]

    def jacobian(theta):
        return jnp.stack([jnp.asarray(x), jnp.ones(x.size)], axis=1)

    return y, sigma, forward, jacobian


@pytest.mark.parametrize(
    "cls", [GaussianLikelihood, CauchyLikelihood, LogisticLikelihood]
)
def test_likelihood_autodiff_gradient_matches_jacobian_path(cls):
    y, sigma, forward, jacobian = setup_data()
    theta = jnp.array([1.8, 1.1])

    with_jac = cls(y, sigma, forward, forward_model_jacobian=jacobian)
    without_jac = cls(y, sigma, forward)

    assert np.isclose(float(with_jac(theta)), float(without_jac(theta)))
    g1 = np.asarray(with_jac.gradient(theta))
    g2 = np.asarray(without_jac.gradient(theta))
    assert np.allclose(g1, g2, rtol=1e-8)


@pytest.mark.parametrize(
    "cls", [GaussianLikelihood, CauchyLikelihood, LogisticLikelihood]
)
def test_likelihood_gradient_vs_finite_difference(cls):
    y, sigma, forward, _ = setup_data()
    L = cls(y, sigma, forward)
    theta = np.array([1.8, 1.1])
    grad = np.asarray(L.gradient(jnp.asarray(theta)))

    eps = 1e-6
    for i in range(2):
        t_plus = theta.copy()
        t_plus[i] += eps
        t_minus = theta.copy()
        t_minus[i] -= eps
        fd = (float(L(t_plus)) - float(L(t_minus))) / (2 * eps)
        assert np.isclose(grad[i], fd, rtol=1e-4)


def test_likelihood_cost_negation():
    y, sigma, forward, _ = setup_data()
    L = GaussianLikelihood(y, sigma, forward)
    theta = jnp.array([1.8, 1.1])
    assert np.isclose(float(L.cost(theta)), -float(L(theta)))
    assert np.allclose(
        np.asarray(L.cost_gradient(theta)), -np.asarray(L.gradient(theta))
    )


def test_likelihood_maximum_at_truth():
    """With zero noise, the likelihood peaks at the true parameters."""
    x = np.linspace(0, 1, 8)
    y = 2.0 * x + 1.0
    sigma = np.full(x.size, 0.1)

    def forward(theta):
        return theta[0] * jnp.asarray(x) + theta[1]

    L = GaussianLikelihood(y, sigma, forward)
    g = np.asarray(L.gradient(jnp.array([2.0, 1.0])))
    assert np.allclose(g, 0.0, atol=1e-8)


def test_likelihood_validation():
    y, sigma, forward, _ = setup_data()
    with pytest.raises(ValueError):
        GaussianLikelihood(y, sigma, forward_model="not callable")
    with pytest.raises(ValueError):
        GaussianLikelihood(y, sigma[:-1], forward)
    with pytest.raises(ValueError):
        GaussianLikelihood(y, -sigma, forward)


def test_likelihood_is_jittable():
    y, sigma, forward, _ = setup_data()
    L = GaussianLikelihood(y, sigma, forward)
    jitted = jax.jit(L)
    assert np.isclose(float(jitted(jnp.array([1.8, 1.1]))), float(L([1.8, 1.1])))
