"""Shared synthetic posteriors for the sampler tests (jax-traceable
rebuilds of the reference fixtures, reference: tests/mcmc/mcmc_utils.py)."""

import numpy as np
import jax.numpy as jnp

from inference_tpu.models import GaussianLikelihood, UniformPrior, Posterior


def rosenbrock(t):
    """Modified Rosenbrock with a Gaussian envelope."""
    x, y = t[0], t[1]
    x2 = x**2
    b = 15.0
    v = 3.0
    return -x2 - b * (y - x2) ** 2 - 0.5 * (x2 + y**2) / v**2


class ToroidalGaussian:
    """Gaussian ring in 3D; traceable, with an analytic gradient."""

    def __init__(self):
        self.r0 = 1.0
        self.eps = 0.05
        self.coeff = -0.5 / self.eps**2

    def __call__(self, theta):
        x, y, z = theta[0], theta[1], theta[2]
        r_sqr = z**2 + (jnp.sqrt(x**2 + y**2) - self.r0) ** 2
        return self.coeff * r_sqr

    def gradient(self, theta):
        x, y, z = theta[0], theta[1], theta[2]
        R = jnp.sqrt(x**2 + y**2)
        K = 1 - self.r0 / R
        g = jnp.array([K * x, K * y, z])
        return 2 * self.coeff * g


def line_posterior(seed: int = 1):
    """Straight-line fit posterior with Gaussian likelihood and uniform prior."""
    rng = np.random.default_rng(seed)
    x = np.linspace(1, 10, 10)
    gradient, offset = 2.0, 1.0
    sigma = 2.0
    y = gradient * x + offset + rng.normal(0.0, sigma, x.size)

    def forward(theta):
        return theta[0] * jnp.asarray(x) + theta[1]

    likelihood = GaussianLikelihood(
        y_data=y, sigma=np.full(x.size, sigma), forward_model=forward
    )
    prior = UniformPrior(
        lower=np.array([0.0, -5.0]),
        upper=np.array([5.0, 5.0]),
        variable_indices=[0, 1],
    )
    return Posterior(likelihood=likelihood, prior=prior)


def sliced_length(total: int, burn: int, thin: int) -> int:
    """Length of a python slice [burn::thin] over ``total`` elements."""
    return len(range(total)[burn::thin])
