"""Cross-chain convergence diagnostics (split-R-hat family).

Beyond the reference: it diagnoses single chains only (FFT ESS,
reference inference/mcmc/utilities.py:83-95, and burn-in heuristics,
gibbs.py:577-592). The rebuild's chain batches make between-chain
potential-scale-reduction statistics natural; these tests pin the
estimators against their defining behaviours (converged -> ~1,
location/scale disagreement -> >> 1, heavy tails handled by rank
normalization)."""

import numpy as np
import pytest

from inference_tpu.utils import split_rhat, rank_normalized_rhat


def test_split_rhat_converged_chains_near_one():
    rng = np.random.default_rng(0)
    x = rng.normal(3.0, 2.0, size=(8, 800))  # iid draws: perfectly mixed
    r = float(split_rhat(x))
    assert 0.99 < r < 1.01
    rn = float(rank_normalized_rhat(x))
    assert 0.99 < rn < 1.01


def test_split_rhat_detects_location_disagreement():
    rng = np.random.default_rng(1)
    x = rng.normal(0.0, 1.0, size=(6, 400))
    x += np.linspace(-3, 3, 6)[:, None]  # chains stuck in different places
    assert float(split_rhat(x)) > 1.5
    assert float(rank_normalized_rhat(x)) > 1.5


def test_split_rhat_detects_within_chain_drift():
    """Splitting each chain in half makes a trending (non-stationary)
    chain disagree with itself even when all chains share the trend."""
    rng = np.random.default_rng(2)
    drift = np.linspace(0.0, 5.0, 600)
    x = rng.normal(0.0, 0.3, size=(6, 600)) + drift
    assert float(split_rhat(x)) > 1.5


def test_folded_rhat_detects_scale_disagreement():
    """Chains agreeing in location but not scale: the classic statistic
    is nearly blind (between-chain mean variance stays small) while the
    folded, rank-normalized variant flags it."""
    rng = np.random.default_rng(3)
    scales = np.array([0.2, 0.2, 0.2, 3.0, 3.0, 3.0])
    x = rng.normal(0.0, 1.0, size=(6, 500)) * scales[:, None]
    plain = float(split_rhat(x))
    folded = float(rank_normalized_rhat(x))
    assert folded > 1.2
    assert folded > plain


def test_rank_normalized_rhat_heavy_tails():
    """Cauchy draws have no variance, so the classic statistic is noise
    dominated by single extreme draws; the rank-based variant stays
    pinned near 1 for converged chains."""
    rng = np.random.default_rng(4)
    x = rng.standard_cauchy(size=(8, 1000))
    r = float(rank_normalized_rhat(x))
    assert 0.99 < r < 1.02


def test_rhat_batched_leading_axes():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(3, 4, 8, 200))  # e.g. (params, ..., chains, steps)
    r = np.asarray(split_rhat(x))
    rn = np.asarray(rank_normalized_rhat(x))
    assert r.shape == (3, 4) and rn.shape == (3, 4)
    assert np.all((r > 0.98) & (r < 1.05))
    assert np.all((rn > 0.98) & (rn < 1.05))


def test_constant_chains_report_converged():
    x = np.ones((4, 100))
    assert float(split_rhat(x)) == 1.0


def test_stuck_chains_at_distinct_values_flagged():
    """Chains each constant but at DIFFERENT values (0% acceptance from
    distinct starts): within-chain variance is exactly zero while the
    between-chain variance is not — the classic estimator must report
    +inf, not silently read 0/0 as 'converged'."""
    x = np.repeat(np.arange(4.0)[:, None], 100, axis=1)
    assert float(split_rhat(x)) == np.inf
    # batched: one stuck row, one converged-constant row
    batch = np.stack([x, np.ones((4, 100))])
    r = np.asarray(split_rhat(batch))
    assert r[0] == np.inf and r[1] == 1.0


def test_rank_normalization_tie_handling():
    """Heavily tied (discrete) iid draws: average ranks keep the
    statistic near 1 and exactly invariant to chain relabeling.
    Draw-order tie breaking would rank tied draws chain-major and
    inflate R-hat based on memory layout rather than mixing."""
    rng = np.random.default_rng(6)
    x = rng.integers(0, 4, size=(8, 500)).astype(float)  # 4 distinct values
    r = float(rank_normalized_rhat(x))
    assert 0.99 < r < 1.02
    # chain relabeling must not change the statistic at all
    r_rev = float(rank_normalized_rhat(x[::-1]))
    assert np.isclose(r, r_rev, rtol=0, atol=1e-12)


def test_rhat_validation_errors():
    with pytest.raises(ValueError):
        split_rhat(np.ones((1, 100)))  # needs >= 2 chains
    with pytest.raises(ValueError):
        split_rhat(np.ones((4, 3)))  # needs >= 4 steps to split
    with pytest.raises(ValueError):
        rank_normalized_rhat(np.ones(50))  # needs a chain axis


@pytest.mark.slow
def test_chain_array_rhat():
    """ChainArray.rhat: per-parameter statistic over the chain batch,
    near 1 for a well-mixed Gaussian run and large at initialisation
    when over-dispersed starts have not yet mixed."""
    import jax.numpy as jnp
    from inference_tpu.parallel import ChainArray

    cov = np.array([[1.0, 0.7], [0.7, 2.0]])
    icov = jnp.asarray(np.linalg.inv(cov))
    logp = lambda t: -0.5 * t @ icov @ t

    starts = np.random.default_rng(0).normal(0, 1, size=(32, 2))
    starts[:16] += 40.0  # two over-dispersed clusters
    ca = ChainArray("hmc", logp, starts, seed=1)
    ca.advance(12)
    early = ca.rhat()
    assert early.shape == (2,)
    assert np.all(early > 1.5)  # clusters have not merged in 12 steps

    ca.advance(400)
    late = ca.rhat(burn=250)
    assert np.all(late < 1.05)
    # the classic variant is exposed too
    late_plain = ca.rhat(burn=250, rank_normalized=False)
    assert np.all(late_plain < 1.05)


@pytest.mark.slow
def test_sharded_tempering_rhat():
    """Cold-rung R-hat across the chain lanes of a tempered run."""
    import jax.numpy as jnp
    from inference_tpu.parallel import ShardedTempering, tempering_mesh

    logp = lambda t: -0.5 * jnp.sum(t**2)
    mesh = tempering_mesh(n_rungs=4)
    pt = ShardedTempering(
        logp,
        np.zeros(2) + 0.5,
        temperatures=[1.0, 3.0, 10.0, 30.0],
        n_chains=16,
        mesh=mesh,
        seed=0,
    )
    pt.advance(400, swap_interval=10)
    r = pt.rhat(burn=100)
    assert r.shape == (2,)
    assert np.all(r < 1.1)
    # hot rungs are valid replicate sets of their own tempered target
    r_hot = pt.rhat(rung=3, burn=100, rank_normalized=False)
    assert r_hot.shape == (2,) and np.all(np.isfinite(r_hot))


@pytest.mark.slow
def test_chain_array_rhat_ensemble_walker_axis():
    """For the ensemble kind every walker is a replicate chain."""
    import jax.numpy as jnp
    from inference_tpu.parallel import ChainArray

    logp = lambda t: -0.5 * jnp.sum(t**2)
    starts = np.random.default_rng(2).normal(0, 1, size=(4, 16, 2))
    ca = ChainArray("ensemble", logp, starts, seed=3)
    # stretch-move walkers are strongly autocorrelated: give the batch
    # enough post-burn steps to mix before demanding R-hat ~ 1
    ca.advance(1200)
    r = ca.rhat(burn=600)
    assert r.shape == (2,)
    assert np.all(r < 1.1)
