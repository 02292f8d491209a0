import numpy as np
import pytest

from inference_tpu.mcmc import HamiltonianChain, Bounds
from mcmc_utils import ToroidalGaussian, sliced_length


def make_chain(n=300, seed=4, **kwargs):
    posterior = ToroidalGaussian()
    chain = HamiltonianChain(
        posterior=posterior,
        start=np.array([1.0, 0.1, 0.1]),
        display_progress=False,
        seed=seed,
        **kwargs,
    )
    chain.advance(n)
    return chain


def test_hamiltonian_advance_and_slicing():
    chain = make_chain(n=150)
    assert chain.chain_length == 151
    for burn, thin in [(0, 1), (1, 1), (10, 3), (50, 7)]:
        expected = sliced_length(chain.chain_length, burn, thin)
        assert chain.get_sample(burn=burn, thin=thin).shape == (expected, 3)
        assert chain.get_probabilities(burn=burn, thin=thin).size == expected


@pytest.mark.slow
def test_hamiltonian_statistics():
    """Sampled radius distribution matches the toroidal target."""
    chain = make_chain(n=3000, seed=1)
    s = chain.get_sample(burn=500)
    radius = np.sqrt(s[:, 0] ** 2 + s[:, 1] ** 2)
    assert abs(radius.mean() - 1.0) < 0.05
    assert abs(s[:, 2].mean()) < 0.05
    assert abs(s[:, 2].std() - 0.05) < 0.02


@pytest.mark.slow
def test_hamiltonian_user_gradient():
    posterior = ToroidalGaussian()
    chain = HamiltonianChain(
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


def test_hamiltonian_bounded():
    posterior = ToroidalGaussian()
    bounds = Bounds(
        lower=np.array([0.0, -2.0, -2.0]), upper=np.array([2.0, 2.0, 2.0])
    )
    chain = HamiltonianChain(
        posterior=posterior,
        start=np.array([1.0, 0.1, 0.1]),
        bounds=bounds,
        display_progress=False,
        seed=3,
    )
    chain.advance(400)
    s = chain.get_sample()
    assert (s[:, 0] >= 0.0).all() and (s[:, 0] <= 2.0).all()
    assert (np.abs(s[:, 1:]) <= 2.0).all()


@pytest.mark.parametrize(
    "inverse_mass",
    [2.0, np.array([1.0, 2.0, 0.5]), np.diag([1.0, 2.0, 0.5])],
)
def test_hamiltonian_mass_options(inverse_mass):
    posterior = ToroidalGaussian()
    chain = HamiltonianChain(
        posterior=posterior,
        start=np.array([1.0, 0.1, 0.1]),
        inverse_mass=inverse_mass,
        display_progress=False,
        seed=5,
    )
    chain.advance(100)
    assert chain.chain_length == 101


@pytest.mark.slow
def test_hamiltonian_estimate_mass():
    chain = make_chain(n=300)
    chain.estimate_mass(burn=50, diagonal=True)
    chain.advance(100)
    assert chain.chain_length == 401
    chain.estimate_mass(burn=50, diagonal=False)
    chain.advance(100)
    assert chain.chain_length == 501


@pytest.mark.slow
def test_hamiltonian_save_load(tmp_path):
    chain = make_chain(n=200)
    f = tmp_path / "hmc.npz"
    chain.save(str(f))
    loaded = HamiltonianChain.load(str(f), posterior=ToroidalGaussian())

    assert loaded.chain_length == chain.chain_length
    assert np.array_equal(loaded.get_sample(), chain.get_sample())
    assert np.array_equal(loaded.get_probabilities(), chain.get_probabilities())
    assert loaded.ES.epsilon == chain.ES.epsilon
    loaded.advance(50)
    assert loaded.chain_length == chain.chain_length + 50


@pytest.mark.slow
def test_hamiltonian_save_load_bounds(tmp_path):
    posterior = ToroidalGaussian()
    bounds = Bounds(lower=np.full(3, -5.0), upper=np.full(3, 5.0))
    chain = HamiltonianChain(
        posterior=posterior,
        start=np.array([1.0, 0.1, 0.1]),
        bounds=bounds,
        display_progress=False,
        seed=6,
    )
    chain.advance(100)
    f = tmp_path / "hmc_bounds.npz"
    chain.save(str(f))
    loaded = HamiltonianChain.load(str(f), posterior=posterior)
    assert loaded.bounds is not None
    assert np.array_equal(loaded.bounds.lower, bounds.lower)
    assert np.array_equal(loaded.bounds.upper, bounds.upper)


@pytest.mark.slow
def test_hamiltonian_plot_diagnostics():
    chain = make_chain(n=200)
    chain.plot_diagnostics(show=False)


@pytest.mark.slow
def test_hamiltonian_mode_and_burn_in():
    chain = make_chain(n=500)
    burn = chain.estimate_burn_in()
    assert 0 <= burn <= 0.9 * chain.chain_length + 1
    mode = chain.mode()
    assert mode.shape == (3,)


def test_hamiltonian_steps_change_no_rebuild():
    """'steps' lives in the traced state: changing it must not rebuild the
    compiled kernel, and the recorded leapfrog counts must follow it."""
    posterior = ToroidalGaussian()
    # seeded: with repeat-until-accept a rejected proposal adds a full
    # extra leapfrog trajectory to the recorded count, so an unlucky
    # unseeded run can push the steps=10 regime's mean past the bound
    chain = HamiltonianChain(
        posterior=posterior, start=np.array([1.0, 0.1, 0.1]),
        display_progress=False, seed=0,
    )
    chain.advance(20)
    step_obj = chain._step
    first = np.concatenate(chain._leapfrog_chunks)[1:21]

    chain.steps = 10
    chain.advance(20)
    assert chain._step is step_obj  # same compiled kernel object
    second = np.concatenate(chain._leapfrog_chunks)[21:41]
    # per-attempt counts are steps +-10%, and each rejection adds a full
    # extra trajectory; the two regimes still sit near ~2x50 vs ~1.3x10
    assert first.mean() > 40 and second.mean() < 20
