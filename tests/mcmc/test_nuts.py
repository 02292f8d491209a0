"""NutsChain tests (beyond-reference sampler: the reference has no NUTS).

Statistical correctness is checked the same way the HMC tests do it —
moments of a known target — plus NUTS-specific behaviour: adaptive
trajectory lengths, divergence accounting, and checkpoint round-trips.

Fast-tier economics: every chain INSTANCE recompiles its step kernel
(the step closure is per-instance), and every distinct power-of-two
advance chunk compiles a separate scan — on the 1-CPU CI box those
compiles dominate the module. The fast tests therefore share two
module-scoped advanced chains (read-only consumers) and advance by
single power-of-two chunk sizes.
"""

import numpy as np
import pytest

from inference_tpu.mcmc import NutsChain
from mcmc_utils import ToroidalGaussian, sliced_length

COV = np.array([[2.0, 1.2], [1.2, 1.0]])
ICOV = np.linalg.inv(COV)


def gaussian_logp(t):
    return -0.5 * t @ ICOV @ t


def narrow_logp(t):
    return -0.5e6 * (t @ t)


def make_chain(n=300, seed=4, **kwargs):
    chain = NutsChain(
        posterior=ToroidalGaussian(),
        start=np.array([1.0, 0.1, 0.1]),
        display_progress=False,
        seed=seed,
        **kwargs,
    )
    chain.advance(n)
    return chain


@pytest.fixture(scope="module")
def toroidal_chain():
    """One advanced chain shared by every read-only consumer below (one
    step-kernel compile + one scan compile for the whole module)."""
    return make_chain(n=256)


@pytest.fixture(scope="module")
def divergent_chain():
    """A chain driven with a hopeless step size on a narrow target, so
    divergences are guaranteed; shared by the divergence-accounting
    tests (all read-only)."""
    chain = NutsChain(
        posterior=narrow_logp,
        start=np.array([0.5, 0.5]),
        epsilon=50.0,
        display_progress=False,
        seed=5,
    )
    chain.advance(32)
    return chain


def test_nuts_advance_and_slicing(toroidal_chain):
    chain = toroidal_chain
    assert chain.chain_length == 257
    for burn, thin in [(0, 1), (1, 1), (10, 3), (50, 7)]:
        expected = sliced_length(chain.chain_length, burn, thin)
        assert chain.get_sample(burn=burn, thin=thin).shape == (expected, 3)
        assert chain.get_probabilities(burn=burn, thin=thin).size == expected
    # trajectory bookkeeping is per-step and self-consistent
    depths = chain.tree_depths
    leaps = np.array(chain.leapfrog_steps)
    assert depths.shape == (257,)
    assert (depths[1:] >= 1).all() and (depths <= 10).all()
    # doublings before the last complete fully (2^(d-1) - 1 leaves), and
    # the final one adds at least one leaf before any early stop
    assert (leaps[1:] >= 2 ** (depths[1:] - 1)).all()


@pytest.mark.slow
def test_nuts_gaussian_covariance():
    """Sampled covariance matches a correlated Gaussian target."""
    chain = NutsChain(
        posterior=gaussian_logp,
        start=np.array([0.1, 0.1]),
        display_progress=False,
        seed=11,
    )
    chain.advance(2500)
    s = chain.get_sample(burn=500)
    assert np.abs(np.cov(s.T) - COV).max() < 0.25
    assert np.abs(s.mean(axis=0)).max() < 0.15
    # trajectory lengths adapt to sensible values on an easy target
    assert 1.0 < chain.tree_depths[500:].mean() < 6.0
    assert chain.n_divergences == 0


@pytest.mark.slow
def test_nuts_statistics():
    """Sampled radius distribution matches the toroidal target."""
    chain = make_chain(n=3000, seed=1)
    s = chain.get_sample(burn=500)
    radius = np.sqrt(s[:, 0] ** 2 + s[:, 1] ** 2)
    assert abs(radius.mean() - 1.0) < 0.05
    assert abs(s[:, 2].mean()) < 0.05
    assert abs(s[:, 2].std() - 0.05) < 0.02


@pytest.mark.slow
def test_nuts_user_gradient():
    posterior = ToroidalGaussian()
    chain = NutsChain(
        posterior=posterior,
        grad=posterior.gradient,
        start=np.array([1.0, 0.1, 0.1]),
        display_progress=False,
        seed=2,
    )
    chain.advance(500)
    s = chain.get_sample(burn=100)
    radius = np.sqrt(s[:, 0] ** 2 + s[:, 1] ** 2)
    assert abs(radius.mean() - 1.0) < 0.1


@pytest.mark.parametrize(
    "inverse_mass",
    [
        pytest.param(2.0, marks=pytest.mark.slow),
        pytest.param(np.array([1.0, 2.0, 0.5]), marks=pytest.mark.slow),
        np.diag([1.0, 2.0, 0.5]) + 0.1,  # full-matrix mass: the rich path
    ],
)
def test_nuts_mass_options(inverse_mass):
    chain = make_chain(n=64, inverse_mass=inverse_mass)
    assert chain.chain_length == 65
    assert np.isfinite(chain.get_probabilities()).all()


def test_nuts_divergence_counting(divergent_chain):
    """A hopeless step size on a narrow target produces divergences, which
    are counted without breaking the chain."""
    chain = divergent_chain
    assert chain.n_divergences > 0
    assert chain.n_divergences == int(chain.divergent_steps.sum())
    assert np.isfinite(chain.get_sample()).all()


def test_nuts_save_load(toroidal_chain, tmp_path):
    chain = toroidal_chain
    f = tmp_path / "nuts.npz"
    chain.save(str(f))
    loaded = NutsChain.load(str(f), posterior=ToroidalGaussian())
    assert np.allclose(loaded.get_sample(), chain.get_sample())
    assert np.allclose(loaded.get_probabilities(), chain.get_probabilities())
    assert loaded.n_divergences == chain.n_divergences
    assert loaded.max_depth == chain.max_depth
    loaded.advance(16)
    assert loaded.chain_length == chain.chain_length + 16


def test_nuts_plot_diagnostics(toroidal_chain):
    import matplotlib

    matplotlib.use("Agg")
    toroidal_chain.plot_diagnostics(show=False)


@pytest.mark.slow
def test_nuts_mode_and_estimate_mass():
    chain = make_chain(n=400, seed=3)
    mode = chain.mode()
    assert np.isfinite(mode).all()
    chain.estimate_mass(burn=100, diagonal=False)
    chain.advance(50)
    assert chain.chain_length == 451


def test_nuts_resave_preserves_divergences(divergent_chain, tmp_path):
    """Re-saving a chain that was loaded WITHOUT a posterior (so no live
    kernel state exists) must keep the cumulative divergence count
    (regression: the count was written as 0 whenever _state was None)."""
    n_div = divergent_chain.n_divergences
    assert n_div > 0
    f1, f2 = tmp_path / "a.npz", tmp_path / "b.npz"
    divergent_chain.save(str(f1))
    analysis_only = NutsChain.load(str(f1))  # no posterior
    analysis_only.save(str(f2))
    resumed = NutsChain.load(str(f2), posterior=narrow_logp)
    assert resumed.n_divergences == n_div
    assert int(resumed.divergent_steps.sum()) == n_div


def test_nuts_grad_cache_matches_position():
    """The state's cached tempered gradient always belongs to the state's
    current position (the transition starts integrating from it)."""
    import jax
    import jax.numpy as jnp

    chain = NutsChain(
        posterior=gaussian_logp,
        start=np.array([1.0, 0.5]),
        temperature=2.5,
        display_progress=False,
        seed=11,
    )
    chain.advance(32)
    st = chain._state
    expected = chain.inv_temp * np.asarray(
        jax.grad(gaussian_logp)(jnp.asarray(st.theta))
    )
    assert np.allclose(np.asarray(st.grad), expected, rtol=1e-5, atol=1e-6)


def test_nuts_replace_last_refreshes_grad_cache():
    """replace_last rewrites the state position; the cached tempered
    gradient must follow (regression: the next trajectory's first
    half-step integrated from the old position's gradient)."""
    import jax
    import jax.numpy as jnp

    chain = NutsChain(
        posterior=gaussian_logp,
        start=np.array([1.0, 0.5]),
        display_progress=False,
        seed=3,
    )
    chain.advance(8)
    new_theta = np.array([0.3, -0.2])
    chain.replace_last(new_theta)
    chain.replace_last_probability(float(gaussian_logp(jnp.asarray(new_theta))))
    expected = np.asarray(jax.grad(gaussian_logp)(jnp.asarray(new_theta)))
    assert np.allclose(np.asarray(chain._state.grad), expected, rtol=1e-6)
    chain.advance(8)
    assert np.isfinite(chain.get_probabilities()).all()


@pytest.mark.slow
def test_nuts_warmup_mass_adaptation_raises_ess():
    """Windowed diagonal mass estimation (ChainArray.warmup) on a badly
    scaled Gaussian: with identity mass, NUTS trajectories resolve the
    smallest scale and random-walk the largest (condition 1e4 here); the
    adapted mass must raise the worst-parameter ESS/step by >= 5x
    (VERDICT r3 item 9)."""
    import jax.numpy as jnp
    from inference_tpu.parallel import ChainArray

    scales = np.geomspace(1.0, 100.0, 6)  # variance condition = 1e4
    scales_j = jnp.asarray(scales)

    def logp(t):
        return -0.5 * jnp.sum((t / scales_j) ** 2)

    rng = np.random.default_rng(0)
    starts = rng.normal(size=(8, 6)) * scales[None, :]

    def worst_ess(ca):
        # chain-mean ESS of the worst-mixed parameter
        return float(ca.effective_sample_size().mean(axis=0).min())

    base = ChainArray("nuts", logp, starts, max_depth=6, seed=0, retry=False)
    base.advance(384)
    ess_identity = worst_ess(base)

    warm = ChainArray("nuts", logp, starts, max_depth=6, seed=0, retry=False)
    warm.warmup(n_steps=384, n_windows=3)
    assert not warm._history  # warmup samples are discarded
    # the adapted inverse mass tracks the true variances (ratio within
    # ~an order of magnitude across the 1e4-condition spread)
    im = np.asarray(warm._build_kwargs["inverse_mass"])
    ratio = im / scales**2
    assert ratio.max() / ratio.min() < 30.0
    warm.advance(384)
    ess_adapted = worst_ess(warm)

    assert ess_adapted >= 5.0 * ess_identity, (
        f"adapted ESS {ess_adapted:.1f} vs identity {ess_identity:.1f}"
    )


def test_warmup_validation_and_kind_gate():
    from inference_tpu.parallel import ChainArray

    starts = np.zeros((4, 2)) + 0.1
    ca = ChainArray(
        "gibbs", lambda t: -0.5 * (t**2).sum(), starts, seed=0, retry=False
    )
    with pytest.raises(ValueError, match="hmc"):
        ca.warmup(100)
    with pytest.raises(ValueError, match="hmc"):
        ca.set_inverse_mass(np.ones(2))
    hm = ChainArray(
        "hmc", lambda t: -0.5 * (t**2).sum(), starts, seed=0, retry=False
    )
    with pytest.raises(ValueError, match="n_windows"):
        hm.warmup(4, n_windows=4)


def test_warmup_window_sizes_cover_edge_counts():
    """The window decomposition stays valid for every input that passes
    validation: near the n_steps = 2 * n_windows boundary the >= 2 clamp
    used to inflate the total and the closing correction made the final
    window zero or NEGATIVE, crashing advance() with a negative scan
    length."""
    from inference_tpu.parallel.chain_array import _warmup_window_sizes

    for n_windows in range(1, 13):
        for n_steps in range(2 * n_windows, 2 * n_windows + 40):
            sizes = _warmup_window_sizes(n_steps, n_windows)
            assert sizes.sum() == n_steps, (n_steps, n_windows, sizes)
            assert (sizes >= 2).all(), (n_steps, n_windows, sizes)
    # large counts keep the expanding-window shape: the last window
    # dominates
    sizes = _warmup_window_sizes(500, 4)
    assert sizes[-1] == sizes.max() and sizes.sum() == 500
