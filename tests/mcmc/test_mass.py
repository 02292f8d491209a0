import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inference_tpu.mcmc.hmc.mass import (
    ScalarMass,
    VectorMass,
    MatrixMass,
    get_particle_mass,
)


def test_scalar_mass():
    m = ScalarMass(2.0, 3)
    r = jnp.array([1.0, 2.0, 3.0])
    assert np.allclose(np.asarray(m.get_velocity(r)), 2.0 * np.asarray(r))
    samples = np.stack(
        [
            np.asarray(m.sample_momentum(jax.random.PRNGKey(i), jnp.float64))
            for i in range(2000)
        ]
    )
    # momentum variance should be the mass = 1 / inv_mass
    assert np.allclose(samples.var(axis=0), 0.5, atol=0.05)


def test_vector_mass():
    inv_mass = np.array([1.0, 4.0])
    m = VectorMass(inv_mass, 2)
    r = jnp.array([1.0, 1.0])
    assert np.allclose(np.asarray(m.get_velocity(r)), inv_mass)
    samples = np.stack(
        [
            np.asarray(m.sample_momentum(jax.random.PRNGKey(i), jnp.float64))
            for i in range(2000)
        ]
    )
    assert np.allclose(samples.var(axis=0), 1.0 / inv_mass, rtol=0.2)


def test_matrix_mass():
    inv_mass = np.array([[1.0, 0.5], [0.5, 2.0]])
    m = MatrixMass(inv_mass, 2)
    r = jnp.array([1.0, 1.0])
    assert np.allclose(np.asarray(m.get_velocity(r)), inv_mass @ np.asarray(r))
    samples = np.stack(
        [
            np.asarray(m.sample_momentum(jax.random.PRNGKey(i), jnp.float64))
            for i in range(4000)
        ]
    )
    # momentum covariance should be M = inv(inv_mass)
    expected = np.linalg.inv(inv_mass)
    assert np.allclose(np.cov(samples.T), expected, atol=0.1)


def test_mass_validation():
    with pytest.raises(ValueError):
        VectorMass(np.array([1.0, -1.0]), 2)
    with pytest.raises(ValueError):
        VectorMass(np.array([1.0, 1.0, 1.0]), 2)
    with pytest.raises(ValueError):
        MatrixMass(np.array([[1.0, 0.5], [0.4, 2.0]]), 2)  # asymmetric
    with pytest.raises(ValueError):
        MatrixMass(np.eye(3), 2)  # wrong size


def test_get_particle_mass_dispatch():
    assert isinstance(get_particle_mass(1.0, 3), ScalarMass)
    assert isinstance(get_particle_mass(np.ones(3), 3), VectorMass)
    assert isinstance(get_particle_mass(np.eye(3), 3), MatrixMass)
