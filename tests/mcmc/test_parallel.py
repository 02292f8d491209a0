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


def test_pt_single_rung_degrades_gracefully():
    """A one-chain ladder runs without swaps instead of crashing in the
    fused pairing (regression)."""
    c = GibbsChain(bimodal, start=np.array([4.0]), widths=np.array([0.5]),
                   display_progress=False, seed=0)
    pt = ParallelTempering([c])
    pt.advance(50, swap_interval=10)
    assert pt.successful_swaps.sum() == 0
    chains = pt.return_chains()
    assert chains[0]._state is not None
    assert chains[0].chain_length == 51


def test_pt_heterogeneous_return_chains_keeps_states():
    """return_chains()/shutdown() must not destroy per-chain states on the
    heterogeneous path (regression: tree.map over None nulled them)."""
    c0 = GibbsChain(bimodal, start=np.array([4.0]), widths=np.array([0.5]),
                    display_progress=False, seed=1)
    c1 = HamiltonianChain(bimodal, start=np.array([4.0]), temperature=5.0,
                          display_progress=False, seed=2)
    c1.steps = 5
    pt = ParallelTempering([c0, c1])
    pt.advance(30, swap_interval=10)
    chains = pt.return_chains()
    assert all(c._state is not None for c in chains)
    chains[0].advance(10)  # still usable
    assert chains[0].chain_length == 41


def test_pt_mismatched_configs_use_per_chain_path():
    """Same-class rungs whose compiled-step settings differ must not share
    chains[0]'s kernel (regression: rung 2 silently ran with rung 1's
    configuration); they fall back to per-chain kernels."""
    c0 = HamiltonianChain(bimodal, start=np.array([4.0]),
                          display_progress=False, seed=3)
    c0.steps = 5
    c1 = HamiltonianChain(bimodal, start=np.array([4.0]), temperature=5.0,
                          display_progress=False, seed=4)
    c1.steps = 20  # different leapfrog budget -> different compiled step
    pt = ParallelTempering([c0, c1])
    assert pt._heterogeneous  # falls back to per-chain kernels
    pt.advance(40, swap_interval=10)
    assert all(c._state is not None for c in pt.return_chains())
    assert c0.chain_length == 41 and c1.chain_length == 41

    # identical configs still take the batched path
    c2 = HamiltonianChain(bimodal, start=np.array([4.0]),
                          display_progress=False, seed=5)
    c3 = HamiltonianChain(bimodal, start=np.array([4.0]), temperature=5.0,
                          display_progress=False, seed=6)
    pt2 = ParallelTempering([c2, c3])
    assert not pt2._heterogeneous


def test_pt_nuts_grad_cache_swaps():
    """NUTS rungs cache the tempered gradient in their kernel state; the
    fused on-device swap must permute and re-temper that cache in lockstep
    with the positions (regression: a stale gradient after an accepted swap
    corrupts the next trajectory's first half-step)."""
    import jax
    from inference_tpu.mcmc import NutsChain

    chains = [
        NutsChain(
            bimodal,
            start=np.array([4.0]),
            temperature=T,
            max_depth=5,
            display_progress=False,
            seed=3 + i,
        )
        for i, T in enumerate([1.0, 3.0, 10.0])
    ]
    pt = ParallelTempering(chains)
    pt.advance(120, swap_interval=5)
    assert not pt._heterogeneous
    assert pt.successful_swaps.sum() - np.trace(pt.successful_swaps) > 0
    st = pt._batched_state
    g_fn = jax.grad(bimodal)
    for k, it in enumerate(pt.inv_temps):
        expected = it * np.asarray(g_fn(jnp.asarray(np.asarray(st.theta[k]))))
        assert np.allclose(np.asarray(st.grad[k]), expected, rtol=1e-5, atol=1e-6)

    # the host swap() entry point applies the same permutation algebra
    for _ in range(10):
        pt.swap()
    st = pt._batched_state
    for k, it in enumerate(pt.inv_temps):
        expected = it * np.asarray(g_fn(jnp.asarray(np.asarray(st.theta[k]))))
        assert np.allclose(np.asarray(st.grad[k]), expected, rtol=1e-5, atol=1e-6)


def test_pt_nuts_heterogeneous_grad_refresh():
    """In a mixed-family ladder the swap partner carries no gradient, so a
    NUTS rung recomputes its cache after receiving a new position."""
    import jax
    from inference_tpu.mcmc import NutsChain

    nuts = NutsChain(
        bimodal,
        start=np.array([4.0]),
        temperature=1.0,
        display_progress=False,
        seed=0,
    )
    gibbs = GibbsChain(
        bimodal,
        start=np.array([-4.0]),
        widths=np.array([0.3]),
        temperature=5.0,
        display_progress=False,
        seed=1,
    )
    pt = ParallelTempering([nuts, gibbs])
    assert pt._heterogeneous
    pt.advance(60, swap_interval=5)
    st = nuts._state
    expected = nuts.inv_temp * np.asarray(
        jax.grad(bimodal)(jnp.asarray(np.asarray(st.theta)))
    )
    assert np.allclose(np.asarray(st.grad), expected, rtol=1e-5, atol=1e-6)


def test_pt_mixed_max_depth_routes_heterogeneous():
    """NutsChain rungs that differ only in max_depth cannot share one
    compiled step (regression: the batch silently used rung 0's depth)."""
    from inference_tpu.mcmc import NutsChain

    chains = [
        NutsChain(
            bimodal,
            start=np.array([4.0]),
            temperature=T,
            max_depth=d,
            display_progress=False,
            seed=i,
        )
        for i, (T, d) in enumerate([(1.0, 8), (5.0, 4)])
    ]
    pt = ParallelTempering(chains)
    assert pt._heterogeneous
