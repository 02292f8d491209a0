import numpy as np
import jax.numpy as jnp
import pytest

from inference_tpu.approx import (
    get_conditionals,
    conditional_sample,
    conditional_moments,
    piecewise_linear_sample,
)


def make_gaussian_logp(variances=(1.0, 0.25), means=(0.5, -1.0)):
    icov = jnp.asarray(np.diag(1.0 / np.array(variances)))
    mu = jnp.asarray(np.array(means))

    def logp(t):
        d = jnp.asarray(t) - mu
        return -0.5 * d @ icov @ d

    return logp


def test_conditional_moments_match_closed_form():
    logp = make_gaussian_logp()
    means, variances = conditional_moments(
        logp,
        bounds=[(-5, 5), (-5, 5)],
        conditioning_point=np.array([0.5, -1.0]),
    )
    assert np.allclose(means, [0.5, -1.0], atol=0.02)
    assert np.allclose(variances, [1.0, 0.25], rtol=0.05)


def test_get_conditionals_normalised():
    from scipy.integrate import simpson

    logp = make_gaussian_logp()
    axes, probs = get_conditionals(
        logp, bounds=[(-5, 5), (-5, 5)], conditioning_point=np.array([0.5, -1.0])
    )
    assert axes.shape == probs.shape == (64, 2)
    for i in range(2):
        total = simpson(probs[:, i], x=axes[:, i])
        assert abs(total - 1.0) < 1e-6


def test_conditional_sample_statistics():
    logp = make_gaussian_logp()
    samples = conditional_sample(
        logp,
        bounds=[(-5, 5), (-5, 5)],
        conditioning_point=np.array([0.5, -1.0]),
        n_samples=40000,
    )
    assert samples.shape == (40000, 2)
    assert np.allclose(samples.mean(0), [0.5, -1.0], atol=0.05)
    assert np.allclose(samples.std(0), [1.0, 0.5], rtol=0.05)


def test_conditional_numpy_posterior():
    """Non-traceable posteriors fall back to per-point host evaluation."""

    def np_logp(t):
        t = np.asarray(t)
        return float(-0.5 * np.sum(t**2))

    means, variances = conditional_moments(
        np_logp, bounds=[(-5, 5), (-5, 5)], conditioning_point=np.zeros(2)
    )
    assert np.allclose(means, 0.0, atol=0.02)
    assert np.allclose(variances, 1.0, rtol=0.05)


def test_piecewise_linear_sample():
    # triangular density on [0, 1]
    x = np.linspace(0, 1, 100)
    p = 2 * x
    samples = piecewise_linear_sample(x, p, 50000)
    assert ((samples >= 0) & (samples <= 1)).all()
    assert abs(samples.mean() - 2.0 / 3.0) < 0.01


def test_piecewise_linear_sample_validation():
    with pytest.raises(ValueError):
        piecewise_linear_sample(np.array([1.0, 0.5]), np.array([1.0, 1.0]), 10)
    with pytest.raises(ValueError):
        piecewise_linear_sample(np.array([0.0, 1.0]), np.array([-1.0, 1.0]), 10)


def test_get_conditionals_compile_count():
    """The pinned-variable index is traced and batches are padded to fixed
    shapes, so a full get_conditionals call compiles at most two programs
    and the count does not grow with the number of variables."""
    from inference_tpu.approx.conditional import Conditional, evaluate_conditional

    for n_params in (2, 4):
        point = np.zeros(n_params)
        cond = Conditional(
            lambda t: -0.5 * jnp.sum(jnp.asarray(t) ** 2), point, 0
        )
        for i in range(n_params):
            cond.variable_index = i
            evaluate_conditional(cond, np.linspace(-5, 5, 17))
        assert cond.trace_count <= 2, (
            f"{cond.trace_count} compiles for {n_params} variables"
        )


def test_piecewise_linear_sample_zero_density_raises():
    """An all-zero (or underflowed) density must fail loudly instead of
    returning silently-NaN samples through the inverse CDF."""
    import numpy as np
    import pytest
    from inference_tpu.approx.conditional import piecewise_linear_sample

    x = np.linspace(0.0, 1.0, 32)
    with pytest.raises(ValueError):
        piecewise_linear_sample(x, np.zeros_like(x), 10)
