"""Tests for ParallelTempering and ChainPool — the reference has no tests
for its multiprocess tempering code (SURVEY.md section 4); this closes
that gap for the device-batched rebuild."""

import numpy as np
import jax.numpy as jnp
import pytest

from inference_tpu.mcmc import (
    GibbsChain,
    HamiltonianChain,
    ParallelTempering,
    ChainPool,
)

pytestmark = pytest.mark.slow  # measured >8 s per test on the CI mesh


def bimodal(t):
    x = t[0]
    return jnp.logaddexp(
        -0.5 * ((x + 4.0) / 0.5) ** 2,
        -0.5 * ((x - 4.0) / 0.5) ** 2 + jnp.log(0.5),
    )


def make_pt(temps=(1.0, 3.0, 10.0, 30.0), seed=0):
    chains = [
        GibbsChain(
            bimodal,
            start=np.array([4.0]),
            widths=np.array([0.3]),
            temperature=T,
            display_progress=False,
            seed=seed + i,
        )
        for i, T in enumerate(temps)
    ]
    return ParallelTempering(chains)


def test_pt_advance_lengths():
    pt = make_pt()
    pt.advance(200, swap_interval=10)
    chains = pt.return_chains()
    for c in chains:
        assert c.chain_length == 201
    pt.shutdown()


def test_pt_mode_hopping():
    """The cold chain must reach the second mode via replica exchange —
    the weighted bimodal target puts ~2/3 of its mass in the left mode."""
    pt = make_pt(seed=3)
    pt.advance(3000, swap_interval=10)
    cold = pt.return_chains()[0]
    s = cold.get_sample(burn=500)
    left_fraction = (s[:, 0] < 0).mean()
    assert 0.4 < left_fraction < 0.9
    pt.shutdown()


def test_pt_swap_bookkeeping():
    pt = make_pt()
    pt.advance(300, swap_interval=10)
    assert pt.attempted_swaps.sum() > pt.N_chains  # diagonal + attempts
    assert (pt.successful_swaps >= 0).all()
    assert (pt.successful_swaps <= pt.attempted_swaps).all()
    pt.shutdown()


def test_pt_tight_pairs():
    pt = make_pt()
    for _ in range(20):
        pairs = pt.tight_pairs()
        flat = [i for p in pairs for i in p]
        assert len(flat) == len(set(flat))  # no chain paired twice
        assert len(pairs) == pt.N_chains // 2
    pt.shutdown()


def test_pt_temperature_order_warning():
    chains = [
        GibbsChain(
            bimodal,
            start=np.array([4.0]),
            widths=np.array([0.3]),
            temperature=T,
            display_progress=False,
        )
        for T in [10.0, 1.0]
    ]
    with pytest.warns(UserWarning):
        pt = ParallelTempering(chains)
    pt.shutdown()


def test_pt_with_hmc_chains():
    def curved(t):
        return -0.5 * (t[0] ** 2 + (t[1] - t[0] ** 2) ** 2)

    chains = [
        HamiltonianChain(
            curved,
            start=np.array([0.5, 0.5]),
            temperature=T,
            display_progress=False,
            seed=i,
        )
        for i, T in enumerate([1.0, 5.0])
    ]
    pt = ParallelTempering(chains)
    pt.advance(100, swap_interval=10)
    for c in pt.return_chains():
        assert c.chain_length == 101
    pt.shutdown()


def test_chain_pool():
    chains = [
        GibbsChain(
            bimodal,
            start=np.array([4.0]),
            widths=np.array([0.3]),
            display_progress=False,
            seed=i,
        )
        for i in range(3)
    ]
    pool = ChainPool(chains)
    pool.advance(100)
    for c in chains:
        assert c.chain_length == 101


def test_parallel_tempering_heterogeneous_chains():
    """A mixed list of sampler classes advances each rung through its own
    kernel and swaps on the host (reference allows arbitrary chain types)."""
    start = np.array([4.0])
    temps = [1.0, 3.0, 10.0]
    chains = [
        GibbsChain(posterior=bimodal, start=start, temperature=temps[0],
                   display_progress=False),
        HamiltonianChain(posterior=bimodal, start=start,
                         temperature=temps[1], display_progress=False),
        GibbsChain(posterior=bimodal, start=start, temperature=temps[2],
                   display_progress=False),
    ]
    pt = ParallelTempering(chains=chains)
    assert pt._heterogeneous and not pt._fusable
    pt.advance(60, swap_interval=10)
    for c in pt.chains:
        assert c.chain_length == 61
        assert np.isfinite(c.get_probabilities(burn=0)).all()
    assert pt.attempted_swaps.sum() > len(temps)  # diagonal + attempts
