"""Fused whole-trajectory HMC Pallas kernel (ops/hmc_fused.py).

The kernel is validated three ways: bit-level agreement with its
pure-jax mirror on identical random streams (interpret mode), correct
sampling statistics through the ChainArray facade, and configuration
gating (unsupported setups must raise for fused=True and silently fall
back for "auto")."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from inference_tpu.parallel import ChainArray
from inference_tpu.ops.hmc_fused import (
    plan_fused_hmc,
    fused_hmc_advance,
    _advance_mirror,
)


def _gaussian_logp(icov):
    A = jnp.asarray(icov, jnp.float32)
    return lambda t: -0.5 * t @ A @ t


def _make_state(n_chains, n_params, seed=3):
    """A vmapped HmcState batch, exactly as ChainArray builds it."""
    from inference_tpu.mcmc._kernels.hmc import init_hmc_state

    rng = np.random.default_rng(seed)
    icov = np.eye(n_params)
    logp = _gaussian_logp(icov)
    starts = jnp.asarray(
        rng.normal(0, 0.5, (n_chains, n_params)), jnp.float32
    )
    logp0 = jax.vmap(logp)(starts)
    keys = jax.random.split(jax.random.key(seed), n_chains)
    state = jax.vmap(
        lambda t0, p0, k: init_hmc_state(t0, p0, 0.2, k, steps=12)
    )(starts, logp0, keys)
    return state, logp


def test_fused_kernel_matches_mirror():
    """Interpret-mode Pallas kernel == pure-jax mirror, same randoms:
    final state and stored history agree to float32 roundoff."""
    state, logp = _make_state(128, 3)
    plan = plan_fused_hmc(logp, 3, steps=12, interpret=True)
    n = 11  # < one chunk, so both paths draw from fold_in(master, 0)

    s_pallas, h_pallas = fused_hmc_advance(plan, state, n, store=True)
    s_mirror, h_mirror = _advance_mirror(plan, state, n, store=True)

    np.testing.assert_allclose(
        np.asarray(s_pallas.theta), np.asarray(s_mirror.theta),
        rtol=2e-5, atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(s_pallas.logp), np.asarray(s_mirror.logp),
        rtol=2e-5, atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(s_pallas.eps.value), np.asarray(s_mirror.eps.value),
        rtol=1e-6,
    )
    assert np.array_equal(
        np.asarray(s_pallas.eps.num), np.asarray(s_mirror.eps.num)
    )
    for a, b in zip(h_pallas, h_mirror):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        )
    # the trajectory actually moved and some proposals were accepted
    assert np.any(np.asarray(s_pallas.theta) != np.asarray(state.theta))


def test_fused_kernel_store_false_matches_store_true():
    """store=False must advance the state identically to store=True."""
    state, logp = _make_state(128, 2)
    plan = plan_fused_hmc(logp, 2, steps=10, interpret=True)
    s1, _ = fused_hmc_advance(plan, state, 7, store=True)
    s2, none = fused_hmc_advance(plan, state, 7, store=False)
    assert none is None
    np.testing.assert_allclose(
        np.asarray(s1.theta), np.asarray(s2.theta), rtol=1e-6
    )


def test_fused_chunking_consistent_state_shape():
    """Advances longer than one kernel chunk run multiple invocations
    (including a remainder chunk) and keep shapes/dtypes intact."""
    state, logp = _make_state(128, 2)
    plan = plan_fused_hmc(logp, 2, steps=10, interpret=True)
    plan = plan._replace(chunk=4)
    s, hist = fused_hmc_advance(plan, state, 10, store=True)  # 2*4 + 2
    assert hist[0].shape == (10, 128, 2)
    assert hist[1].shape == (10, 128)
    assert s.theta.shape == state.theta.shape
    assert s.theta.dtype == state.theta.dtype


def test_fused_chain_array_statistics():
    """ChainArray('hmc', fused=True) samples the target distribution:
    pooled moments of a correlated 2D Gaussian within tolerance."""
    rng = np.random.default_rng(0)
    cov = np.array([[1.0, 0.6], [0.6, 1.0]])
    icov = jnp.asarray(np.linalg.inv(cov), jnp.float32)
    logp = lambda t: -0.5 * t @ icov @ t
    starts = rng.normal(0, 0.3, (128, 2))
    ca = ChainArray(
        "hmc", logp, starts, steps=12, epsilon=0.4, retry=False,
        fused=True, seed=7,
    )
    assert ca._fused_plan is not None
    ca.advance(400, store=True)
    sample = ca.get_sample(burn=100)
    assert abs(sample.mean(axis=0)).max() < 0.1
    est = np.cov(sample.T)
    np.testing.assert_allclose(est, cov, atol=0.15)
    # epsilon adaptation engaged (started at 0.4, must have moved for
    # at least some chains)
    eps = np.asarray(ca._state.eps.value)
    assert np.any(eps != np.float32(0.4))


def test_fused_diag_mass():
    """A diagonal inverse mass round-trips the fused path and samples a
    badly-scaled Gaussian correctly."""
    rng = np.random.default_rng(1)
    scales = np.array([1.0, 25.0])
    icov = jnp.asarray(np.diag(1.0 / scales**2), jnp.float32)
    logp = lambda t: -0.5 * t @ icov @ t
    starts = rng.normal(0, 0.1, (128, 2)) * scales
    ca = ChainArray(
        "hmc", logp, starts, steps=15, epsilon=0.5, retry=False,
        fused=True, seed=2, inverse_mass=scales**2,
    )
    assert ca._fused_plan is not None
    ca.advance(400, store=True)
    sample = ca.get_sample(burn=100)
    sd = sample.std(axis=0)
    np.testing.assert_allclose(sd, scales, rtol=0.25)


def test_fused_gating():
    """Unsupported configurations: fused=True raises with the reason,
    'auto' silently keeps the XLA kernel."""
    logp = lambda t: -0.5 * t @ t
    starts = np.zeros((8, 2)) + 0.1

    with pytest.raises(ValueError, match="retry"):
        ChainArray("hmc", logp, starts, retry=True, fused=True)
    with pytest.raises(ValueError, match="full-matrix"):
        ChainArray(
            "hmc", logp, starts, retry=False, fused=True,
            inverse_mass=np.eye(2),
        )
    with pytest.raises(ValueError, match="only available"):
        ChainArray("gibbs", logp, starts, fused=True)

    # auto on CPU: plan stays None, advance uses the XLA kernel
    ca = ChainArray("hmc", logp, starts, retry=False, fused="auto")
    assert ca._fused_plan is None
    ca.advance(3, store=True)
    assert ca.get_sample().shape == (24, 2)


def test_fused_small_batch_mirror_path():
    """Batches below one lane tile (K < 128) route through the mirror
    implementation transparently."""
    state, logp = _make_state(16, 2)
    plan = plan_fused_hmc(logp, 2, steps=10, interpret=True)
    s, hist = fused_hmc_advance(plan, state, 5, store=True)
    assert hist[0].shape == (5, 16, 2)
    assert s.theta.shape == (16, 2)


def test_fused_set_inverse_mass_rebuilds_plan():
    """set_inverse_mass on a fused ChainArray rebuilds the plan with the
    new diagonal mass."""
    logp = lambda t: -0.5 * t @ t
    starts = np.zeros((128, 2)) + 0.1
    ca = ChainArray(
        "hmc", logp, starts, retry=False, fused=True, seed=0
    )
    assert ca._fused_plan.inv_mass_diag is None
    ca.set_inverse_mass(np.array([1.0, 4.0]))
    assert ca._fused_plan.inv_mass_diag == (1.0, 4.0)
    ca.advance(3, store=True)
    assert ca.get_sample().shape == (3 * 128, 2)
