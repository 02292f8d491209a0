import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inference_tpu.models import (
    GaussianPrior,
    ExponentialPrior,
    UniformPrior,
    JointPrior,
)


def finite_difference(fn, theta, eps=1e-6):
    theta = np.asarray(theta, dtype=float)
    grad = np.zeros_like(theta)
    for i in range(theta.size):
        tp, tm = theta.copy(), theta.copy()
        tp[i] += eps
        tm[i] -= eps
        grad[i] = (float(fn(tp)) - float(fn(tm))) / (2 * eps)
    return grad


def test_gaussian_prior():
    prior = GaussianPrior(mean=[1.0, -2.0], sigma=[0.5, 2.0], variable_indices=[0, 1])
    theta = np.array([1.3, -1.0])
    # analytic value
    z = (np.array([1.0, -2.0]) - theta) / np.array([0.5, 2.0])
    expected = (
        -0.5 * (z**2).sum()
        - np.log([0.5, 2.0]).sum()
        - np.log(2 * np.pi)
    )
    assert np.isclose(float(prior(theta)), expected)
    # gradient check on the prior's own variables
    g = np.asarray(prior.gradient(jnp.asarray(theta)))
    fd = finite_difference(prior, theta)
    assert np.allclose(g, fd, rtol=1e-5)
    # sampling statistics
    samples = np.stack([prior.sample() for _ in range(4000)])
    assert np.allclose(samples.mean(0), [1.0, -2.0], atol=0.1)
    assert np.allclose(samples.std(0), [0.5, 2.0], rtol=0.15)


def test_exponential_prior():
    prior = ExponentialPrior(beta=[2.0, 0.5], variable_indices=[0, 1])
    theta = np.array([1.0, 0.2])
    lam = 1.0 / np.array([2.0, 0.5])
    expected = -(lam * theta).sum() + np.log(lam).sum()
    assert np.isclose(float(prior(theta)), expected)
    # outside support
    assert float(prior(np.array([-0.1, 0.2]))) == -1e100
    # gradient
    g = np.asarray(prior.gradient(jnp.asarray(theta)))
    assert np.allclose(g, -lam)
    # gradient is zero outside support
    g = np.asarray(prior.gradient(jnp.array([-0.1, 0.2])))
    assert g[0] == 0.0
    # sampling
    samples = np.stack([prior.sample() for _ in range(4000)])
    assert np.allclose(samples.mean(0), [2.0, 0.5], rtol=0.15)


def test_uniform_prior():
    prior = UniformPrior(lower=[0.0, -1.0], upper=[2.0, 1.0], variable_indices=[0, 1])
    inside = np.array([1.0, 0.0])
    expected = -np.log([2.0, 2.0]).sum()
    assert np.isclose(float(prior(inside)), expected)
    assert float(prior(np.array([3.0, 0.0]))) == -1e100
    assert np.allclose(np.asarray(prior.gradient(jnp.asarray(inside))), 0.0)
    samples = np.stack([prior.sample() for _ in range(2000)])
    assert (samples[:, 0] >= 0).all() and (samples[:, 0] <= 2).all()
    assert np.allclose(samples.mean(0), [1.0, 0.0], atol=0.1)


def test_joint_prior():
    components = [
        GaussianPrior(mean=1.0, sigma=0.5, variable_indices=[0]),
        ExponentialPrior(beta=2.0, variable_indices=[2]),
        UniformPrior(lower=0.0, upper=1.0, variable_indices=[1]),
    ]
    joint = JointPrior(components=components, n_variables=3)
    theta = np.array([1.2, 0.5, 0.7])
    expected = sum(float(c(jnp.asarray(theta))) for c in components)
    assert np.isclose(float(joint(theta)), expected)

    g = np.asarray(joint.gradient(jnp.asarray(theta)))
    fd = finite_difference(joint, theta)
    assert np.allclose(g, fd, rtol=1e-5, atol=1e-8)

    sample = joint.sample()
    assert sample.shape == (3,)
    assert 0.0 <= sample[1] <= 1.0
    assert sample[2] >= 0.0

    # bounds assembled in variable order
    assert joint.bounds[1] == (0.0, 1.0)
    assert joint.bounds[2] == (0.0, None)


def test_joint_prior_combines_same_type():
    components = [
        GaussianPrior(mean=1.0, sigma=0.5, variable_indices=[0]),
        GaussianPrior(mean=2.0, sigma=1.0, variable_indices=[1]),
    ]
    joint = JointPrior(components=components, n_variables=2)
    assert len(joint.components) == 1


def test_joint_prior_validation():
    with pytest.raises(ValueError):  # duplicate variable
        JointPrior(
            components=[
                GaussianPrior(mean=1.0, sigma=0.5, variable_indices=[0]),
                UniformPrior(lower=0.0, upper=1.0, variable_indices=[0]),
            ],
            n_variables=2,
        )
    with pytest.raises(ValueError):  # count mismatch
        JointPrior(
            components=[GaussianPrior(mean=1.0, sigma=0.5, variable_indices=[0])],
            n_variables=2,
        )
    with pytest.raises(TypeError):  # non-prior component
        JointPrior(components=[lambda x: 0.0], n_variables=1)


def test_prior_parameter_validation():
    with pytest.raises(ValueError):
        GaussianPrior(mean=[1.0, 2.0], sigma=[0.5], variable_indices=[0, 1])
    with pytest.raises(ValueError):
        GaussianPrior(mean=1.0, sigma=-0.5, variable_indices=[0])
    with pytest.raises(ValueError):
        GaussianPrior(mean=np.nan, sigma=0.5, variable_indices=[0])
    with pytest.raises(ValueError):
        ExponentialPrior(beta=0.0, variable_indices=[0])
    with pytest.raises(ValueError):
        UniformPrior(lower=1.0, upper=0.0, variable_indices=[0])
    with pytest.raises(ValueError):  # duplicate indices
        GaussianPrior(mean=[1.0, 2.0], sigma=[1.0, 1.0], variable_indices=[0, 0])


def test_priors_are_jittable():
    prior = GaussianPrior(mean=[1.0], sigma=[0.5], variable_indices=[0])
    jitted = jax.jit(prior)
    assert np.isclose(float(jitted(jnp.array([1.3]))), float(prior(np.array([1.3]))))
