"""Checkpoint interoperability with the reference's .npz format: chains
saved by the reference load into the rebuild (and continue sampling), and
chains saved by the rebuild load into the reference for analysis."""

import sys
import types

import numpy as np
import pytest


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
