import numpy as np
import pytest

from inference_tpu.mcmc import PcaChain
from mcmc_utils import rosenbrock, sliced_length, line_posterior



pytestmark = pytest.mark.slow  # measured >8 s per test on the CI mesh
def make_chain(n=300, seed=8, **kwargs):
    chain = PcaChain(
        posterior=rosenbrock,
        start=np.array([2.0, -4.0]),
        widths=np.array([0.2, 0.4]),
        display_progress=False,
        seed=seed,
        **kwargs,
    )
    chain.advance(n)
    return chain


def test_pca_advance_and_slicing():
    chain = make_chain(n=250)
    assert chain.chain_length == 251
    for burn, thin in [(0, 1), (1, 2), (50, 5)]:
        expected = sliced_length(chain.chain_length, burn, thin)
        assert chain.get_sample(burn=burn, thin=thin).shape == (expected, 2)


def test_pca_direction_updates():
    chain = make_chain(n=600)
    # updates scheduled at 100, 250, 475 for the default interval/growth
    assert chain.update_history[:3] == [100, 250, 475]
    # directions become orthonormal eigenvectors
    V = chain.directions
    assert np.allclose(V.T @ V, np.eye(2), atol=1e-8)


def test_pca_statistics():
    """PCA-Gibbs correctly samples a correlated Gaussian posterior."""
    posterior = line_posterior(seed=2)
    chain = PcaChain(
        posterior=posterior,
        start=np.array([2.0, 1.0]),
        widths=np.array([0.1, 0.1]),
        display_progress=False,
        seed=13,
    )
    chain.advance(8000)
    s = chain.get_sample(burn=2000)
    # posterior mean should be near the true parameters (gradient 2, offset 1)
    assert abs(s[:, 0].mean() - 2.0) < 0.3
    assert abs(s[:, 1].mean() - 1.0) < 1.5


def test_pca_bounds():
    chain = PcaChain(
        posterior=rosenbrock,
        start=np.array([0.5, 0.5]),
        widths=np.array([0.2, 0.4]),
        bounds=(np.zeros(2), np.ones(2)),
        display_progress=False,
        seed=3,
    )
    chain.advance(400)
    s = chain.get_sample()
    assert (s >= 0).all() and (s <= 1).all()


def test_pca_save_load(tmp_path):
    chain = make_chain(n=400)
    f = tmp_path / "pca.npz"
    chain.save(str(f))
    loaded = PcaChain.load(str(f), posterior=rosenbrock)

    assert loaded.chain_length == chain.chain_length
    assert np.array_equal(loaded.get_sample(), chain.get_sample())
    assert np.allclose(loaded.directions, chain.directions)
    assert loaded.next_update == chain.next_update
    loaded.advance(100)
    assert loaded.chain_length == chain.chain_length + 100


def test_pca_constraint_methods_warn():
    chain = make_chain(n=10)
    with pytest.warns(UserWarning):
        chain.set_non_negative(0)
    with pytest.warns(UserWarning):
        chain.set_boundaries(0, (0.0, 1.0))
