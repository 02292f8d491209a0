"""Conditional-distribution approximations of a posterior.

TPU-native rebuild of the reference conditional tools
(reference: inference/approx/conditional.py:9-313): 1D conditional slices of
a posterior around a point, sampled and summarised via a piecewise-linear
inverse-transform sampler with a numerically-stable trapezium branch.

The adaptive mode-refinement and threshold-bracketing searches are
inherently sequential, but every batch of grid evaluations goes through a
vmapped posterior call so the compiled posterior is evaluated in parallel
across grid points where possible.
"""

import numpy as np
import jax
import jax.numpy as jnp
from numpy.random import default_rng
from scipy.integrate import simpson

from ..utils.wrap import is_traceable

rng = default_rng()


class Conditional:
    """Functor pinning all-but-one variable of a posterior."""

    def __init__(self, posterior, theta, variable_index: int):
        self.posterior = posterior
        self.theta = np.asarray(theta, dtype=float)
        self.variable_index = variable_index
        self._batched = None
        if is_traceable(posterior, self.theta):
            base = jnp.asarray(self.theta)

            def eval_batch(xs, index):
                def one(x):
                    return jnp.asarray(
                        self.posterior(base.at[index].set(x))
                    ).reshape(())

                return jax.vmap(one)(jnp.asarray(xs))

            self._batched = jax.jit(eval_batch, static_argnums=1)

    def __call__(self, x) -> float:
        t = self.theta.copy()
        t[self.variable_index] = x
        return float(self.posterior(t))

    def batch(self, xs) -> np.ndarray:
        """Evaluate the conditional at many points (vmapped when possible)."""
        xs = np.asarray(xs, dtype=float)
        if self._batched is not None:
            return np.asarray(self._batched(xs, self.variable_index))
        return np.array([self(x) for x in xs])


def binary_search(func, target, x, y, tol=0.05, max_itr=20) -> float:
    """Bisection for a point where ``func`` crosses ``target``."""
    x1, x2 = x
    y1, y2 = y
    assert (y1 < target < y2) or (y2 < target < y1)
    x_new = 0.5 * (x1 + x2)
    for _ in range(max_itr):
        x_new = 0.5 * (x1 + x2)
        y_new = func(x_new)
        if abs(y_new - target) < tol:
            break
        if (y1 < target < y_new) or (y_new < target < y1):
            x2, y2 = x_new, y_new
        else:
            x1, y1 = x_new, y_new
    return x_new


def trapezium_full(x, dh):
    b = dh - 1
    return (b + np.sqrt(b**2 + 4 * x * dh)) / (2 * dh)


def trapezium_near_zero(x, dh):
    return x + (1 - x) * x * dh


def trapezium_transform(x, dh):
    """
    Transform uniform random numbers on [0, 1] to trapezium-distributed
    numbers on [0, 1]; ``dh`` is the difference between the uniform and
    trapezium densities at x = 1. A series branch handles ``dh`` near zero
    (reference: conditional.py:61-90).
    """
    near_zero = np.abs(dh) < 1e-5
    if near_zero.any():
        stable = ~near_zero
        t = np.zeros(x.size)
        t[near_zero] = trapezium_near_zero(x[near_zero], dh[near_zero])
        t[stable] = trapezium_full(x[stable], dh[stable])
        return t
    return trapezium_full(x, dh)


def piecewise_linear_sample(x, probability_density, n_samples: int) -> np.ndarray:
    """
    Sample a 1D distribution evaluated on a grid by approximating the
    density as piecewise-linear (reference: conditional.py:93-135).
    """
    x = np.asarray(x, dtype=float)
    probability_density = np.asarray(probability_density, dtype=float)
    dx = x[1:] - x[:-1]
    if (dx <= 0.0).any():
        raise ValueError(
            "[ piecewise_linear_sample error ] The 'x' argument must be "
            "given in strictly ascending order."
        )
    if (probability_density < 0).any():
        raise ValueError(
            "[ piecewise_linear_sample error ] All values in the given "
            "'probability_density' array must be non-negative."
        )

    means = 0.5 * (probability_density[1:] + probability_density[:-1])
    delta = 0.5 * (probability_density[1:] - probability_density[:-1]) / means
    weights = means * dx
    weights = weights / weights.sum()
    inds = rng.choice(weights.size, size=n_samples, p=weights)
    trapz = trapezium_transform(rng.random(size=n_samples), delta[inds]) * dx[inds]
    return x[inds] + trapz


def evaluate_conditional(func: Conditional, points, grid_size: int = 64):
    """
    Refine the mode estimate, bracket the region of non-negligible
    probability mass (an 8-nat drop from the mode), and evaluate the
    normalised conditional on a uniform grid over it
    (reference: conditional.py:138-177).
    """
    points = np.asarray(points, dtype=float)
    p = func.batch(points)
    x = points.copy()
    threshold = 8.0

    # iteratively add points around the maximum to refine the mode position
    for _ in range(6):
        ind = min(max(int(p.argmax()), 1), p.size - 2)
        x1, x2 = 0.5 * (x[ind - 1] + x[ind]), 0.5 * (x[ind + 1] + x[ind])
        p1, p2 = func.batch([x1, x2])
        x = np.insert(x, [ind, ind + 1], [x1, x2])
        p = np.insert(p, [ind, ind + 1], [p1, p2])

    p_mode = p.max()
    p_target = p_mode - threshold
    inds = (p > p_target).nonzero()[0]
    lwr_ind = max(inds[0] - 1, 0)
    upr_ind = min(inds[-1] + 1, p.size - 1)

    if p[lwr_ind] >= p_target:
        x_lwr = x[lwr_ind]
    else:
        slc = slice(lwr_ind, lwr_ind + 2)
        x_lwr = binary_search(func, p_target, x[slc], p[slc])

    if p[upr_ind] >= p_target:
        x_upr = x[upr_ind]
    else:
        slc = slice(upr_ind - 1, upr_ind + 1)
        x_upr = binary_search(func, p_target, x[slc], p[slc])

    x_cond = np.linspace(x_lwr, x_upr, grid_size)
    p_cond = func.batch(x_cond)
    p_cond = np.exp(p_cond - p_mode)
    p_cond /= simpson(p_cond, x=x_cond)
    return x_cond, p_cond


def get_conditionals(posterior, bounds, conditioning_point, grid_size: int = 64):
    """
    Evaluate each 1D conditional distribution of the posterior around a
    given point, each on a uniform grid over the range containing
    non-negligible probability.

    :return: (axes, probabilities) arrays of shape (grid_size, n_variables).
    """
    conditioning_point = np.asarray(conditioning_point, dtype=float)
    conditional = Conditional(
        posterior=posterior, theta=conditioning_point, variable_index=0
    )

    n_params = conditioning_point.size
    n_search_points = 16

    axes = np.zeros([grid_size, n_params])
    prob = np.zeros([grid_size, n_params])
    for i in range(n_params):
        conditional.variable_index = i
        search_points = np.linspace(*bounds[i], n_search_points)
        if (search_points != conditioning_point[i]).all():
            index = np.searchsorted(search_points, conditioning_point[i])
            search_points = np.insert(search_points, index, conditioning_point[i])

        x_cond, p_cond = evaluate_conditional(
            func=conditional, points=search_points, grid_size=grid_size
        )
        axes[:, i] = x_cond
        prob[:, i] = p_cond
    return axes, prob


def conditional_sample(posterior, bounds, conditioning_point, n_samples: int):
    """
    Sample each 1D conditional and combine into approximate posterior
    samples, shape (n_samples, n_parameters). A reasonable approximation
    when the posterior is close to conditionally independent.
    """
    axes, probs = get_conditionals(
        posterior=posterior, bounds=bounds, conditioning_point=conditioning_point
    )
    grid_size, n_params = probs.shape
    samples = np.zeros([n_samples, n_params])
    for i in range(n_params):
        samples[:, i] = piecewise_linear_sample(axes[:, i], probs[:, i], n_samples)
    return samples


def conditional_moments(posterior, bounds, conditioning_point):
    """
    Means and variances of the 1D conditional distributions of the
    posterior around a given point.
    """
    axes, probs = get_conditionals(
        posterior=posterior, bounds=bounds, conditioning_point=conditioning_point
    )
    grid_size, n_params = probs.shape
    means = np.zeros(n_params)
    variances = np.zeros(n_params)
    for i in range(n_params):
        means[i] = simpson(y=axes[:, i] * probs[:, i], x=axes[:, i])
        variances[i] = simpson(
            y=(axes[:, i] - means[i]) ** 2 * probs[:, i], x=axes[:, i]
        )
    return means, variances
