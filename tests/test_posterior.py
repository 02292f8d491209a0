import numpy as np
import jax.numpy as jnp
import pytest

from inference_tpu.models import (
    GaussianLikelihood,
    GaussianPrior,
    Posterior,
)


def make_posterior(seed=0):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 1, 8)
    y = 2.0 * x + 1.0 + rng.normal(0, 0.1, x.size)

    def forward(theta):
        return theta[0] * jnp.asarray(x) + theta[1]

    likelihood = GaussianLikelihood(y, np.full(x.size, 0.1), forward)
    prior = GaussianPrior(
        mean=[2.0, 1.0], sigma=[5.0, 5.0], variable_indices=[0, 1]
    )
    return Posterior(likelihood=likelihood, prior=prior), likelihood, prior


def test_posterior_composition():
    posterior, likelihood, prior = make_posterior()
    theta = jnp.array([1.9, 1.1])
    assert np.isclose(
        float(posterior(theta)), float(likelihood(theta)) + float(prior(theta))
    )
    assert np.isclose(float(posterior.cost(theta)), -float(posterior(theta)))
    g = np.asarray(posterior.gradient(theta))
    expected = np.asarray(likelihood.gradient(theta)) + np.asarray(
        prior.gradient(theta)
    )
    assert np.allclose(g, expected)
    assert np.allclose(np.asarray(posterior.cost_gradient(theta)), -expected)


def test_generate_initial_guesses():
    posterior, _, _ = make_posterior()
    guesses = posterior.generate_initial_guesses(n_guesses=3, prior_samples=50)
    assert len(guesses) == 3
    # guesses are sorted by increasing cost
    costs = [float(posterior.cost(g)) for g in guesses]
    assert costs == sorted(costs)


def test_generate_initial_guesses_validation():
    posterior, _, _ = make_posterior()
    with pytest.raises(TypeError):
        posterior.generate_initial_guesses(n_guesses=1.5)
    with pytest.raises(ValueError):
        posterior.generate_initial_guesses(n_guesses=0)
    with pytest.raises(ValueError):
        posterior.generate_initial_guesses(n_guesses=10, prior_samples=5)
