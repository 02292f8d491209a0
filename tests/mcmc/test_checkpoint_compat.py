"""Checkpoint interoperability with the reference's .npz format: chains
saved by the reference load into the rebuild (and continue sampling), and
chains saved by the rebuild load into the reference for analysis."""

import sys
import types

import numpy as np
import pytest



pytestmark = pytest.mark.slow  # measured >8 s per test on the CI mesh
def _import_reference():
    mod = types.ModuleType("setuptools_scm")
    mod.get_version = lambda **k: "0.0.0"
    sys.modules.setdefault("setuptools_scm", mod)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        from inference.mcmc import GibbsChain as RefGibbs

        return RefGibbs
    except Exception:
        return None


def np_rosen(t):
    x, y = t[0], t[1]
    return float(-(x**2) - 15.0 * (y - x**2) ** 2 - 0.5 * (x**2 + y**2) / 9.0)


@pytest.fixture(scope="module")
def ref_gibbs():
    RefGibbs = _import_reference()
    if RefGibbs is None:
        pytest.skip("reference implementation not available")
    return RefGibbs


def test_load_reference_checkpoint_and_continue(ref_gibbs, tmp_path):
    from inference_tpu.mcmc import GibbsChain

    ref = ref_gibbs(
        np_rosen,
        start=np.array([2.0, 4.0]),
        widths=np.array([0.2, 0.4]),
        display_progress=False,
    )
    ref.advance(200)
    f = tmp_path / "ref_chain.npz"
    ref.save(str(f))

    ours = GibbsChain.load(str(f), posterior=np_rosen)
    assert ours.chain_length == ref.chain_length
    assert np.allclose(ours.get_sample(), ref.get_sample())
    assert np.allclose(ours.get_probabilities(), ref.get_probabilities())
    # the loaded adaptation state allows sampling to continue
    ours.advance(50)
    assert ours.chain_length == ref.chain_length + 50


def test_reference_loads_our_checkpoint(ref_gibbs, tmp_path):
    from inference_tpu.mcmc import GibbsChain

    ours = GibbsChain(
        np_rosen,
        start=np.array([2.0, 4.0]),
        widths=np.array([0.2, 0.4]),
        display_progress=False,
        seed=1,
    )
    ours.advance(200)
    f = tmp_path / "our_chain.npz"
    ours.save(str(f))

    loaded = ref_gibbs.load(str(f), posterior=np_rosen)
    assert loaded.chain_length == ours.chain_length
    assert np.allclose(loaded.get_sample(), ours.get_sample())
    assert np.allclose(loaded.get_probabilities(), ours.get_probabilities())
    # (advancing the loaded chain exercises a reference-side defect —
    # its own load() never reconstructs the progress printer — so the
    # interop contract here is load + analysis)


@pytest.fixture(scope="module")
def ref_mcmc():
    if _import_reference() is None:
        pytest.skip("reference implementation not available")
    import inference.mcmc as ref_mcmc_module

    return ref_mcmc_module


def rosen_grad(t):
    x, y = t[0], t[1]
    dx = -2 * x + 60.0 * x * (y - x**2) - x / 9.0
    dy = -30.0 * (y - x**2) - y / 9.0
    return np.array([dx, dy])


def test_pca_checkpoint_interop_both_directions(ref_mcmc, tmp_path):
    """PcaChain .npz round-trips both ways, including eigen-directions and
    blended covariance (reference: pca.py:185-278)."""
    from inference_tpu.mcmc import PcaChain

    ref = ref_mcmc.PcaChain(
        np_rosen, start=np.array([2.0, 4.0]), display_progress=False
    )
    ref.advance(150)  # past the first direction update
    f = tmp_path / "ref_pca.npz"
    ref.save(str(f))

    ours = PcaChain.load(str(f), posterior=np_rosen)
    assert ours.chain_length == ref.chain_length
    assert np.allclose(ours.get_sample(), ref.get_sample())
    assert np.allclose(ours.get_probabilities(), ref.get_probabilities())
    assert np.allclose(ours.directions, np.array(ref.directions))
    assert np.allclose(ours.covar, ref.covar)
    ours.advance(30)
    assert ours.chain_length == ref.chain_length + 30

    # our chain -> reference
    mine = PcaChain(
        np_rosen, start=np.array([2.0, 4.0]), display_progress=False, seed=3
    )
    mine.advance(150)
    g = tmp_path / "our_pca.npz"
    mine.save(str(g))
    loaded = ref_mcmc.PcaChain.load(str(g), posterior=np_rosen)
    assert loaded.chain_length == mine.chain_length
    assert np.allclose(loaded.get_sample(), mine.get_sample())
    assert np.allclose(
        np.array(loaded.directions), np.array(mine.directions)
    )


def test_hmc_checkpoint_interop_both_directions(ref_mcmc, tmp_path):
    """HamiltonianChain .npz round-trips both ways, including the
    epsilon-selector state and bounds (reference: hmc/__init__.py:410-469)."""
    from inference_tpu.mcmc import HamiltonianChain

    bounds = [np.array([-5.0, -5.0]), np.array([5.0, 10.0])]
    ref = ref_mcmc.HamiltonianChain(
        np_rosen,
        start=np.array([1.0, 2.0]),
        grad=rosen_grad,
        bounds=bounds,
        display_progress=False,
    )
    ref.steps = 10
    ref.advance(60)
    f = tmp_path / "ref_hmc.npz"
    ref.save(str(f))

    ours = HamiltonianChain.load(str(f), posterior=np_rosen)
    assert ours.chain_length == ref.chain_length
    assert np.allclose(ours.get_sample(), ref.get_sample())
    assert np.allclose(ours.get_probabilities(), ref.get_probabilities())
    assert np.isclose(float(ours.ES.epsilon), float(ref.ES.epsilon))
    assert np.allclose(ours.bounds.lower, bounds[0])
    assert np.allclose(ours.bounds.upper, bounds[1])
    ours.advance(20)
    assert ours.chain_length == ref.chain_length + 20
    # constraint survives the restore
    assert (np.asarray(ours.get_sample()) <= [5.0, 10.0]).all()

    # our chain -> reference
    mine = HamiltonianChain(
        np_rosen,
        start=np.array([1.0, 2.0]),
        bounds=bounds,
        display_progress=False,
        seed=4,
    )
    mine.steps = 10
    mine.advance(60)
    g = tmp_path / "our_hmc.npz"
    mine.save(str(g))
    loaded = ref_mcmc.HamiltonianChain.load(str(g), posterior=np_rosen)
    assert loaded.chain_length == mine.chain_length
    assert np.allclose(loaded.get_sample(), mine.get_sample())
    assert np.isclose(float(loaded.ES.epsilon), float(mine.ES.epsilon))


def test_ensemble_checkpoint_interop_both_directions(ref_mcmc, tmp_path):
    """EnsembleSampler .npz round-trips both ways
    (reference: ensemble.py:355-411)."""
    from inference_tpu.mcmc import EnsembleSampler

    # a gentle posterior: the Rosenbrock ridge drives walkers nearly
    # co-linear, which the (shared) start validation rejects on re-load
    def gauss(t):
        return float(-0.5 * (t[0] ** 2 + (t[1] - 1.0) ** 2 / 4.0))

    rng = np.random.default_rng(7)
    starts = rng.normal([0.0, 1.0], 0.5, size=(12, 2))
    # the reference stores (and mutates) the caller's array in place during
    # advance, so give it a copy to keep `starts` pristine for our sampler
    ref = ref_mcmc.EnsembleSampler(
        gauss, starting_positions=starts.copy(), display_progress=False
    )
    ref.advance(30)
    f = tmp_path / "ref_ens.npz"
    ref.save(str(f))

    ours = EnsembleSampler.load(str(f), posterior=gauss)
    assert np.allclose(ours.get_sample(), ref.get_sample())
    assert np.allclose(ours.get_probabilities(), ref.get_probabilities())
    ours.advance(10)
    assert ours.get_sample().shape[0] == ref.get_sample().shape[0] + 10 * 12

    # our sampler -> reference
    mine = EnsembleSampler(
        gauss, starting_positions=starts, display_progress=False, seed=5
    )
    mine.advance(30)
    g = tmp_path / "our_ens.npz"
    mine.save(str(g))
    loaded = ref_mcmc.EnsembleSampler.load(str(g), posterior=gauss)
    assert np.allclose(loaded.get_sample(), mine.get_sample())
    assert np.allclose(loaded.get_probabilities(), mine.get_probabilities())
