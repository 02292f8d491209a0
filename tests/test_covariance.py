import numpy as np
import jax.numpy as jnp
import pytest

from inference_tpu.gp import (
    SquaredExponential,
    RationalQuadratic,
    WhiteNoise,
    HeteroscedasticNoise,
    ChangePoint,
)
from inference_tpu.ops import scaled_sq_distances


def make_kernel(cls, seed=0, n=12, d=2):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 2, size=(n, d))
    y = rng.normal(size=n)
    k = cls() if not isinstance(cls, tuple) else ChangePoint(kernels=cls, axis=0)
    k.pass_spatial_data(jnp.asarray(x))
    k.estimate_hyperpar_bounds(jnp.asarray(y))
    return k, x


@pytest.mark.parametrize(
    "cls",
    [
        SquaredExponential,
        RationalQuadratic,
        WhiteNoise,
        HeteroscedasticNoise,
        (SquaredExponential, SquaredExponential),
    ],
)
def test_covariance_gradients_vs_finite_difference(cls):
    """Per-kernel dK/dtheta checks (reference: tests/test_covariance.py:7-33)."""
    k, x = make_kernel(cls)
    rng = np.random.default_rng(2)
    lwr = np.array([b[0] for b in k.bounds])
    upr = np.array([b[1] for b in k.bounds])
    theta = lwr + (upr - lwr) * rng.random(lwr.size)

    K, grads = k.covariance_and_gradients(jnp.asarray(theta))
    assert len(grads) == theta.size
    eps = 1e-6
    for i in range(theta.size):
        tp, tm = theta.copy(), theta.copy()
        tp[i] += eps
        tm[i] -= eps
        fd = (
            np.asarray(k.build_covariance(jnp.asarray(tp)))
            - np.asarray(k.build_covariance(jnp.asarray(tm)))
        ) / (2 * eps)
        assert np.allclose(np.asarray(grads[i]), fd, rtol=1e-4, atol=1e-7)


def test_sqexp_call_matches_build():
    k, x = make_kernel(SquaredExponential)
    theta = jnp.array([0.3, -0.2, 0.1])
    K_build = np.asarray(k.build_covariance(theta))
    K_call = np.asarray(k(jnp.asarray(x), jnp.asarray(x), theta))
    # build adds diagonal jitter
    assert np.allclose(K_build - K_call, np.diag(np.diag(K_build - K_call)))
    assert np.allclose(K_call, K_call.T)


def test_composite_covariance():
    k1, x = make_kernel(SquaredExponential)
    comp = SquaredExponential() + WhiteNoise()
    comp.pass_spatial_data(jnp.asarray(x))
    comp.estimate_hyperpar_bounds(jnp.asarray(np.random.default_rng(0).normal(size=12)))
    assert comp.n_params == 4
    theta = jnp.array([0.3, -0.2, 0.1, -1.0])
    K = np.asarray(comp.build_covariance(theta))
    parts = [c.build_covariance(theta[s]) for c, s in zip(comp.components, comp.slices)]
    assert np.allclose(K, sum(np.asarray(p) for p in parts))


def test_scaled_sq_distances_correctness():
    rng = np.random.default_rng(5)
    u = rng.normal(size=(7, 3))
    v = rng.normal(size=(9, 3))
    ls = np.array([0.5, 1.0, 2.0])
    D = np.asarray(scaled_sq_distances(u, v, ls))
    expected = (((u[:, None, :] - v[None, :, :]) / ls[None, None, :]) ** 2).sum(-1)
    assert np.allclose(D, expected, atol=1e-10)


def test_changepoint_kernel_regression():
    """A change-point kernel fits data whose scale length changes abruptly."""
    from inference_tpu.gp import GpRegressor

    rng = np.random.default_rng(8)
    x = np.linspace(0, 10, 40)
    y = np.where(x < 5, np.sin(3 * x), 0.2 * x) + rng.normal(0, 0.05, x.size)
    k = ChangePoint(kernels=(SquaredExponential, SquaredExponential), axis=0)
    gp = GpRegressor(x, y, y_err=np.full(x.size, 0.05), kernel=k)
    mu, sig = gp(np.array([2.0, 8.0]))
    assert abs(mu[0] - np.sin(6.0)) < 0.3
    assert abs(mu[1] - 1.6) < 0.3
