"""Numerical parity against the reference implementation on identical
inputs. These checks are deterministic (no sampling): likelihood/prior
values and gradients, GP marginal likelihoods/gradients/predictions, KDE
densities and HDIs computed by both implementations on the same data must
agree to float64 tolerance.
"""

import sys
import types

import numpy as np
import pytest


def _reference():
    mod = types.ModuleType("setuptools_scm")
    mod.get_version = lambda **k: "0.0.0"
    sys.modules.setdefault("setuptools_scm", mod)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        import inference  # noqa: F401

        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _reference(), reason="reference implementation not available"
)


def test_likelihood_value_parity():
    from inference.likelihoods import GaussianLikelihood as RefL
    from inference_tpu.models import GaussianLikelihood
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = np.linspace(0, 1, 12)
    y = 2 * x + 1 + rng.normal(0, 0.1, x.size)
    sigma = np.full(x.size, 0.1)

    def fwd_np(theta):
        return theta[0] * x + theta[1]

    def fwd_jax(theta):
        return theta[0] * jnp.asarray(x) + theta[1]

    def jac_np(theta):
        return np.stack([x, np.ones(x.size)], axis=1)

    ref = RefL(y, sigma, forward_model=fwd_np, forward_model_jacobian=jac_np)
    ours = GaussianLikelihood(y, sigma, forward_model=fwd_jax)

    for theta in [np.array([2.0, 1.0]), np.array([1.5, 0.2]), np.array([-1.0, 3.0])]:
        assert np.isclose(float(ours(theta)), ref(theta), rtol=1e-12)
        assert np.allclose(
            np.asarray(ours.gradient(theta)), ref.gradient(theta), rtol=1e-9
        )


def test_prior_value_parity():
    from inference.priors import (
        GaussianPrior as RefG,
        ExponentialPrior as RefE,
        UniformPrior as RefU,
        JointPrior as RefJ,
    )
    from inference_tpu.models import (
        GaussianPrior,
        ExponentialPrior,
        UniformPrior,
        JointPrior,
    )

    ref = RefJ(
        components=[
            RefG(mean=1.0, sigma=0.5, variable_indices=[0]),
            RefE(beta=2.0, variable_indices=[2]),
            RefU(lower=0.0, upper=1.0, variable_indices=[1]),
        ],
        n_variables=3,
    )
    ours = JointPrior(
        components=[
            GaussianPrior(mean=1.0, sigma=0.5, variable_indices=[0]),
            ExponentialPrior(beta=2.0, variable_indices=[2]),
            UniformPrior(lower=0.0, upper=1.0, variable_indices=[1]),
        ],
        n_variables=3,
    )

    for theta in [np.array([1.2, 0.5, 0.7]), np.array([0.0, 0.9, 2.0])]:
        assert np.isclose(float(ours(theta)), ref(theta), rtol=1e-12)
        assert np.allclose(
            np.asarray(ours.gradient(theta)), ref.gradient(theta), rtol=1e-9
        )


def test_gp_lml_and_prediction_parity():
    """LML values, gradients and predictions at fixed hyperparameters match
    the reference to float64 tolerance (the BASELINE.md 1e-8 contract)."""
    from inference.gp import GpRegressor as RefGp
    from inference_tpu.gp import GpRegressor

    rng = np.random.default_rng(3)
    x = np.linspace(0, 10, 30)
    y = np.sin(x) + 0.5 * x + rng.normal(0, 0.1, x.size)
    err = np.full(x.size, 0.1)
    theta = np.array([2.0, 0.3, 0.8])

    ref = RefGp(x, y, y_err=err, hyperpars=theta)
    ours = GpRegressor(x, y, y_err=err, hyperpars=theta)

    # marginal likelihood value
    for t in [theta, theta + 0.3, theta - 0.2]:
        assert np.isclose(
            ours.marginal_likelihood(t), ref.marginal_likelihood(t), rtol=1e-10
        )

    # gradient (autodiff vs the reference's analytic trace identities)
    for t in [theta, theta + 0.3]:
        _, g_ours = ours.marginal_likelihood_gradient(t)
        _, g_ref = ref.marginal_likelihood_gradient(t)
        assert np.allclose(g_ours, g_ref, rtol=1e-8)

    # LOO likelihood
    for t in [theta, theta + 0.3]:
        assert np.isclose(
            ours.loo_likelihood(t), ref.loo_likelihood(t), rtol=1e-10
        )

    # predictions
    xq = np.linspace(0.5, 9.5, 17)
    mu_ours, sig_ours = ours(xq)
    mu_ref, sig_ref = ref(xq)
    assert np.allclose(mu_ours, mu_ref, rtol=1e-9)
    assert np.allclose(sig_ours, sig_ref, rtol=1e-7)

    # full posterior
    mu_o, cov_o = ours.build_posterior(xq)
    mu_r, cov_r = ref.build_posterior(xq)
    assert np.allclose(mu_o, mu_r, rtol=1e-9)
    assert np.allclose(cov_o, cov_r, atol=1e-9)

    # LOO predictions
    mu_o, sig_o = ours.loo_predictions()
    mu_r, sig_r = ref.loo_predictions()
    assert np.allclose(mu_o, mu_r, rtol=1e-8)
    assert np.allclose(sig_o, sig_r, rtol=1e-8)


def test_gp_gradient_and_spatial_derivative_parity():
    from inference.gp import GpRegressor as RefGp
    from inference_tpu.gp import GpRegressor

    rng = np.random.default_rng(5)
    x = np.linspace(0, 10, 25)
    y = np.sin(x) + rng.normal(0, 0.05, x.size)
    err = np.full(x.size, 0.05)
    theta = np.array([1.0, 0.0, 0.5])

    ref = RefGp(x, y, y_err=err, hyperpars=theta)
    ours = GpRegressor(x, y, y_err=err, hyperpars=theta)

    q = np.array([[3.3], [7.1]])
    dmu_o, dcov_o = ours.gradient(q)
    dmu_r, dcov_r = ref.gradient(q)
    assert np.allclose(dmu_o, dmu_r, rtol=1e-7)
    assert np.allclose(dcov_o, dcov_r, rtol=1e-5, atol=1e-10)

    dm_o, dv_o = ours.spatial_derivatives(q)
    dm_r, dv_r = ref.spatial_derivatives(q)
    assert np.allclose(dm_o, dm_r, rtol=1e-7)
    assert np.allclose(dv_o, dv_r, rtol=1e-5, atol=1e-10)


def test_gp_inverter_parity():
    from inference.gp import GpLinearInverter as RefInv
    from inference_tpu.gp import GpLinearInverter

    rng = np.random.default_rng(1)
    n_params, n_data = 16, 12
    pos = np.linspace(0, 1, n_params).reshape(-1, 1)
    truth = np.exp(-0.5 * ((pos[:, 0] - 0.5) / 0.15) ** 2)
    A = rng.random((n_data, n_params)) / n_params
    y_err = np.full(n_data, 0.01)
    y = A @ truth + rng.normal(0, 0.01, n_data)

    ref = RefInv(y, y_err, A, pos)
    ours = GpLinearInverter(y, y_err, A, pos)
    theta = np.array([0.4, np.log(0.6), np.log(0.25)])

    assert np.isclose(
        ours.marginal_likelihood(theta), ref.marginal_likelihood(theta), rtol=1e-10
    )
    _, g_o = ours.marginal_likelihood_gradient(theta)
    _, g_r = ref.marginal_likelihood_gradient(theta)
    assert np.allclose(g_o, g_r, rtol=1e-8)

    mu_o, cov_o = ours.calculate_posterior(theta)
    mu_r, cov_r = ref.calculate_posterior(theta)
    assert np.allclose(mu_o, mu_r, rtol=1e-8, atol=1e-12)
    assert np.allclose(cov_o, cov_r, rtol=1e-6, atol=1e-12)


def test_kde_parity():
    from inference.pdf import GaussianKDE as RefKDE
    from inference_tpu.pdf import GaussianKDE

    sample = np.random.default_rng(2).normal(3.0, 1.5, 2000)
    ref = RefKDE(sample)
    ours = GaussianKDE(sample)

    assert np.isclose(ours.h, ref.h, rtol=1e-12)  # same Silverman bandwidth
    x = np.linspace(-1, 7, 50)
    # the reference prunes kernels beyond +-4 bandwidths (reference:
    # kde.py:76-94); ours is exact, so the tolerance here reflects the
    # reference's own truncation error (~1e-3 relative)
    assert np.allclose(np.asarray(ours(x)), ref(x), rtol=2e-3, atol=1e-6)
    assert np.allclose(np.asarray(ours.cdf(x)), ref.cdf(x), atol=1e-3)
    assert np.isclose(ours.mode, ref.mode, atol=5e-3)


def test_sample_hdi_parity():
    from inference.pdf import sample_hdi as ref_hdi
    from inference_tpu.pdf import sample_hdi

    rng = np.random.default_rng(4)
    sample = rng.normal(size=5000)
    for frac in [0.5, 0.6827, 0.95]:
        ours = sample_hdi(sample, frac)
        ref = ref_hdi(sample.copy(), frac)
        assert np.allclose(np.asarray(ours), ref)

    sample2d = rng.normal(size=(4000, 3))
    assert np.allclose(
        np.asarray(sample_hdi(sample2d, 0.9)), ref_hdi(sample2d.copy(), 0.9)
    )


def test_ess_parity():
    from inference.mcmc.utilities import effective_sample_size as ref_ess
    from inference_tpu.utils import effective_sample_size

    rng = np.random.default_rng(6)
    x = rng.normal(size=5000).cumsum() * 0.05 + rng.normal(size=5000)
    assert effective_sample_size(x) == ref_ess(x)


def test_bounds_parity():
    from inference.mcmc import Bounds as RefBounds
    from inference_tpu.mcmc import Bounds

    lower, upper = np.array([0.0, -1.0]), np.array([2.0, 1.0])
    ref = RefBounds(lower=lower, upper=upper)
    ours = Bounds(lower=lower, upper=upper)

    rng = np.random.default_rng(7)
    for _ in range(20):
        theta = rng.normal(0, 5, 2)
        assert np.allclose(np.asarray(ours.reflect(theta)), ref.reflect(theta))
        p_o, r_o = ours.reflect_momenta(theta)
        p_r, r_r = ref.reflect_momenta(theta)
        assert np.allclose(np.asarray(p_o), p_r)
        assert np.allclose(np.asarray(r_o), r_r)


@pytest.mark.slow
def test_gp_lml_parity_at_scale():
    """The BASELINE.md north-star contract evidenced AT SCALE: LML value
    and full hyperparameter gradient match the reference at N = 2048 in
    float64 (the N=30 test above checks formulas; this one checks that
    nothing degrades with size — conditioning, summation order, the
    matmul-free gradient identities)."""
    from inference.gp import GpRegressor as RefGp
    from inference_tpu.gp import GpRegressor

    rng = np.random.default_rng(11)
    n = 2048
    x = rng.uniform(0, 10, size=(n, 2))
    y = (
        np.sin(x[:, 0]) * np.cos(0.5 * x[:, 1])
        + rng.normal(0, 0.1, n)
    )
    err = np.full(n, 0.1)
    theta = np.array([1.5, 0.0, 0.2, 0.4])  # [mean, lnA, ln l1, ln l2]

    ref = RefGp(x, y, y_err=err, hyperpars=theta)
    ours = GpRegressor(x, y, y_err=err, hyperpars=theta)

    for t in [theta, theta + 0.25]:
        lml_ref = ref.marginal_likelihood(t)
        lml_ours = ours.marginal_likelihood(t)
        assert abs(lml_ours - lml_ref) / abs(lml_ref) < 1e-8

        _, g_ref = ref.marginal_likelihood_gradient(t)
        _, g_ours = ours.marginal_likelihood_gradient(t)
        scale = np.abs(g_ref).max()
        assert np.abs(np.asarray(g_ours) - g_ref).max() / scale < 1e-8
