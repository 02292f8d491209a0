import numpy as np
import pytest
from hypothesis import given, strategies as st, settings

from inference_tpu.pdf import GaussianKDE, UnimodalPdf, KDE2D, sample_hdi


def normal_sample(n=5000, mu=2.0, sigma=0.5, seed=0):
    return np.random.default_rng(seed).normal(mu, sigma, n)


def test_kde_moments_match_normal():
    s = normal_sample()
    kde = GaussianKDE(s)
    mu, var, skw, kur = kde.moments()
    assert abs(mu - 2.0) < 0.05
    assert abs(var - 0.25) < 0.05
    assert abs(skw) < 0.2
    assert abs(kur) < 0.3
    assert abs(kde.mode - 2.0) < 0.15


def test_kde_pdf_and_cdf_values():
    s = normal_sample(n=20000)
    kde = GaussianKDE(s)
    # pdf near the analytic density
    x = np.array([1.0, 2.0, 3.0])
    analytic = np.exp(-0.5 * ((x - 2.0) / 0.5) ** 2) / (0.5 * np.sqrt(2 * np.pi))
    assert np.allclose(kde(x), analytic, rtol=0.1)
    # cdf near the analytic cdf
    from scipy.stats import norm

    assert np.allclose(kde.cdf(x), norm.cdf(x, 2.0, 0.5), atol=0.02)
    # scalar input returns a scalar
    assert np.isscalar(float(kde(2.0)))


def test_kde_interval():
    s = normal_sample(n=10000)
    kde = GaussianKDE(s)
    lo, hi = kde.interval(0.9545)
    assert abs(lo - 1.0) < 0.1
    assert abs(hi - 3.0) < 0.1


def test_kde_cross_validation_bandwidth():
    s = normal_sample(n=1200, seed=3)
    kde = GaussianKDE(s, cross_validation=True)
    # CV bandwidth should be in the same ballpark as Silverman for a normal
    silverman = kde.simple_bandwidth_estimator()
    assert 0.2 * silverman < kde.h < 5 * silverman


def test_kde_validation():
    with pytest.raises(ValueError):
        GaussianKDE(np.array([1.0, 2.0]))  # too few samples


def test_kde_plot_summary():
    s = normal_sample(n=2000)
    kde = GaussianKDE(s)
    fig, ax = kde.plot_summary(show=False)


def test_kde2d():
    """KDE2D matches the reference's (unnormalised) product-kernel formula;
    only density ratios matter since it is used for plot contouring."""
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, 3000)
    y = rng.normal(0, 2, 3000)
    kde = KDE2D(x, y)
    v_mode = float(kde(np.array([0.0]), np.array([0.0])))
    v_off = float(kde(np.array([1.0]), np.array([2.0])))
    # density ratio between the mode and (1 sigma, 1 sigma) is exp(-1)
    assert abs(v_off / v_mode - np.exp(-1.0)) < 0.05
    vals = kde(np.array([0.0, 1.0]), np.array([0.0, 1.0]))
    assert len(np.atleast_1d(vals)) == 2


def test_unimodal_pdf_normal():
    s = normal_sample(n=4000)
    pdf = UnimodalPdf(s)
    mu, var, skw, kur = pdf.moments()
    assert abs(mu - 2.0) < 0.1
    assert abs(var - 0.25) < 0.08
    assert abs(pdf.mode - 2.0) < 0.15
    assert abs(pdf.cdf(2.0) - 0.5) < 0.05


def test_unimodal_pdf_skewed():
    """Exponentially-modified Gaussian: the unimodal fit captures the skew
    (reference: tests/test_pdf.py asserts moments of an EMG sample)."""
    rng = np.random.default_rng(5)
    s = rng.normal(0, 1, 4000) + rng.exponential(2.0, 4000)
    pdf = UnimodalPdf(s)
    mu, var, skw, kur = pdf.moments()
    # EMG(0, 1, 1/2): mean = 2, var = 5, skew = 2*8/5^1.5 ~ 1.43
    assert abs(mu - 2.0) < 0.3
    assert abs(var - 5.0) < 1.0
    assert 0.8 < skw < 2.0


def test_sample_hdi_1d():
    s = normal_sample(n=20000)
    lo, hi = sample_hdi(s, 0.9545)
    assert abs(lo - 1.0) < 0.08
    assert abs(hi - 3.0) < 0.08


def test_sample_hdi_2d_columns():
    rng = np.random.default_rng(2)
    s = rng.normal(size=(5000, 3)) * np.array([1.0, 2.0, 0.5])
    hdi = sample_hdi(s, 0.6827)
    assert hdi.shape == (2, 3)
    widths = hdi[1] - hdi[0]
    assert np.allclose(widths, 2 * np.array([1.0, 2.0, 0.5]), rtol=0.15)


@settings(max_examples=20, deadline=None)
@given(fraction=st.floats(min_value=0.05, max_value=0.95))
def test_sample_hdi_linear_ramp(fraction):
    """Property-based check on a linear ramp: the HDI width of uniform
    samples equals the requested fraction of the range."""
    s = np.linspace(0.0, 1.0, 1000)
    lo, hi = sample_hdi(s, fraction)
    assert 0.0 <= lo <= hi <= 1.0
    assert abs((hi - lo) - fraction) < 0.01


def test_sample_hdi_validation():
    s = normal_sample(n=100)
    with pytest.raises(ValueError):
        sample_hdi(s, 1.5)
    with pytest.raises(ValueError):
        sample_hdi(s, 0.0)
    with pytest.raises(ValueError):
        sample_hdi("not a sample", 0.5)
    with pytest.raises(ValueError):
        sample_hdi(np.zeros([2, 2, 2]), 0.5)
    with pytest.raises(ValueError):
        sample_hdi(np.array([1.0]), 0.5)
    with pytest.warns(UserWarning):
        sample_hdi(np.linspace(0, 1, 30), 0.95)


def test_unimodal_cdf_matches_adaptive_quadrature():
    """The batched Gauss-Legendre CDF must match adaptive quadrature of the
    PDF to high accuracy."""
    from scipy.integrate import quad

    rng = np.random.default_rng(1)
    pdf = UnimodalPdf(rng.gamma(4.0, 1.5, size=3000))
    xs = np.array([2.0, 5.0, 8.0, 12.0, 3.3])
    got = pdf.cdf(xs)
    ref = np.array(
        [
            quad(pdf, pdf.lwr_limit, v)[0] if v > pdf.lwr_limit else 0.0
            for v in xs
        ]
    )
    assert np.abs(got - ref).max() < 1e-7


def test_unimodal_cdf_below_lower_limit():
    """Queries below the support's lower limit contribute no mass, and do
    not inflate the CDF of later points (edge-clipping regression test)."""
    rng = np.random.default_rng(5)
    sample = rng.exponential(size=3000)
    pdf = UnimodalPdf(sample)
    x_far_below = pdf.lwr_limit - 10.0
    joint = pdf.cdf(np.array([x_far_below, 1.0]))
    alone = pdf.cdf(1.0)
    assert joint[0] <= 1e-12
    assert np.isclose(joint[1], alone, rtol=1e-9, atol=1e-12)
