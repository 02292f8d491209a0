"""Multi-device tests on the virtual 8-device CPU mesh: chain-batch
sharding and collective replica-exchange (the reference has no multi-device
or tempering tests at all — SURVEY.md section 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inference_tpu.parallel import (
    chain_mesh,
    tempering_mesh,
    ChainArray,
    ShardedTempering,
)

pytestmark = pytest.mark.slow  # measured >8 s per test on the CI mesh


def correlated_gaussian():
    cov = np.array([[1.0, 0.7], [0.7, 2.0]])
    icov = jnp.asarray(np.linalg.inv(cov))

    def logp(t):
        return -0.5 * t @ icov @ t

    return logp, cov


def test_chain_array_hmc_statistics():
    logp, cov = correlated_gaussian()
    starts = np.random.default_rng(0).normal(0, 1, size=(64, 2))
    ca = ChainArray("hmc", logp, starts, seed=1)
    ca.advance(300)
    s = ca.get_sample(burn=100)
    assert np.allclose(s.mean(0), 0.0, atol=0.1)
    assert np.allclose(np.cov(s.T), cov, atol=0.3)


def test_chain_array_sharded_over_mesh():
    logp, cov = correlated_gaussian()
    mesh = chain_mesh()
    starts = np.random.default_rng(0).normal(0, 1, size=(16, 2))
    ca = ChainArray("hmc", logp, starts, mesh=mesh, seed=2)
    ca.advance(100)
    # state is sharded over all devices
    shards = ca._state.theta.sharding.device_set
    assert len(shards) == len(jax.devices())
    assert np.isfinite(ca.theta).all()


def test_chain_array_nuts_statistics():
    """kind='nuts' (beyond the reference): batched No-U-Turn chains sample
    the target through one vmapped compiled program."""
    logp, cov = correlated_gaussian()
    starts = np.random.default_rng(5).normal(0, 1, size=(64, 2))
    ca = ChainArray("nuts", logp, starts, seed=6, max_depth=8)
    ca.advance(300)
    s = ca.get_sample(burn=100)
    assert np.allclose(s.mean(0), 0.0, atol=0.1)
    assert np.allclose(np.cov(s.reshape(-1, 2).T), cov, atol=0.3)


def test_chain_array_nuts_sharded_over_mesh():
    logp, cov = correlated_gaussian()
    mesh = chain_mesh()
    starts = np.random.default_rng(1).normal(0, 1, size=(16, 2))
    ca = ChainArray("nuts", logp, starts, mesh=mesh, seed=4, max_depth=6)
    ca.advance(60)
    shards = ca._state.theta.sharding.device_set
    assert len(shards) == len(jax.devices())
    assert np.isfinite(ca.theta).all()


def test_chain_array_gibbs():
    logp, cov = correlated_gaussian()
    starts = np.random.default_rng(3).normal(0, 1, size=(32, 2))
    ca = ChainArray("gibbs", logp, starts, widths=0.5, seed=3)
    ca.advance(500)
    s = ca.get_sample(burn=100)  # burn applies to the step axis
    assert np.allclose(s.mean(0), 0.0, atol=0.15)


def test_chain_array_store_false():
    logp, _ = correlated_gaussian()
    starts = np.zeros((8, 2)) + 0.1
    ca = ChainArray("hmc", logp, starts, seed=4)
    ca.advance(50, store=False)
    assert ca.get_sample().shape == (0, 2)
    assert ca.theta.shape == (8, 2)


def test_sharded_tempering_mode_hopping():
    def bimodal(t):
        x = t[0]
        return jnp.logaddexp(
            -0.5 * ((x + 4.0) / 0.5) ** 2,
            -0.5 * ((x - 4.0) / 0.5) ** 2 + jnp.log(0.5),
        )

    mesh = tempering_mesh(n_rungs=4)
    st = ShardedTempering(
        bimodal,
        start=np.array([4.0]),
        temperatures=[1.0, 3.0, 10.0, 30.0],
        n_chains=8,
        mesh=mesh,
        seed=5,
    )
    accepted = st.advance(600, swap_interval=10)
    # swaps happen at a healthy rate
    assert 0.1 < accepted.mean() < 0.95
    # at least some cold-rung lanes reached the left mode (starting at +4)
    cold = st.cold_chain_positions()
    assert (cold < 0).any()
    assert np.isfinite(st.logp).all()


def test_tempering_mesh_validation():
    with pytest.raises(ValueError):
        tempering_mesh(n_rungs=3)  # does not divide 8
    mesh = tempering_mesh(n_rungs=2)

    def logp(t):
        return -0.5 * (t**2).sum()

    with pytest.raises(ValueError):
        ShardedTempering(
            logp,
            start=np.zeros(2),
            temperatures=[1.0, 2.0, 4.0],  # 3 rungs vs 2-rung mesh
            n_chains=4,
            mesh=mesh,
        )


def test_graft_entry_points():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    theta, logp = jax.jit(fn)(*args)
    assert theta.shape == (64, 10)
    assert np.isfinite(np.asarray(logp)).all()

    g.dryrun_multichip(8)


def test_chain_array_checkpoint_roundtrip(tmp_path):
    logp, _ = correlated_gaussian()
    starts = np.random.default_rng(0).normal(0, 1, size=(8, 2))
    ca = ChainArray("hmc", logp, starts, seed=6)
    ca.advance(50, store=False)
    f = tmp_path / "chains.npz"
    ca.save(str(f))
    theta_before = ca.theta.copy()

    ca2 = ChainArray("hmc", logp, starts, seed=99)
    ca2.restore(str(f))
    assert np.allclose(ca2.theta, theta_before)
    # restored state continues deterministically from the saved keys
    ca.advance(20, store=False)
    ca2.advance(20, store=False)
    assert np.allclose(ca.theta, ca2.theta)


def test_sharded_tempering_checkpoint_roundtrip(tmp_path):
    def logp(t):
        return -0.5 * (t**2).sum()

    mesh = tempering_mesh(n_rungs=2)
    st = ShardedTempering(
        logp,
        start=np.zeros(2),
        temperatures=[1.0, 5.0],
        n_chains=4,
        mesh=mesh,
        steps=5,
        seed=7,
    )
    st.advance(40, swap_interval=10)
    f = tmp_path / "pt.npz"
    st.save(str(f))
    theta_before = st.theta.copy()

    st2 = ShardedTempering(
        logp,
        start=np.zeros(2),
        temperatures=[1.0, 5.0],
        n_chains=4,
        mesh=mesh,
        steps=5,
        seed=123,
    )
    st2.restore(str(f))
    assert np.allclose(st2.theta, theta_before)


def test_chain_array_pca():
    """kind='pca' advances PCA-directed sweeps for every chain in one scan,
    with batched host eigendecomposition direction updates."""
    import jax.numpy as jnp

    def corr_gauss(t):
        a, b = t[0], t[1]
        return -0.5 * (a**2 + (10.0 * (b - a)) ** 2)

    starts = np.random.default_rng(0).normal(size=(16, 2))
    arr = ChainArray("pca", corr_gauss, starts, seed=3)
    arr.advance(64)
    d0 = np.asarray(arr._state.directions)
    arr.update_directions()
    d1 = np.asarray(arr._state.directions)
    assert d1.shape == (16, 2, 2)
    assert not np.allclose(d0, d1)  # directions adapted to the correlation
    arr.advance(64)
    sample = arr.get_sample(burn=32)
    assert np.isfinite(sample).all()
    # directions should align with the tight (1,1)/sqrt(2) ridge
    ridge = np.abs(d1[:, :, 1] @ np.array([1.0, 1.0]) / np.sqrt(2))
    assert np.isfinite(ridge).all()


@pytest.mark.parametrize("kind", ["gibbs", "metropolis", "pca"])
def test_chain_array_no_retry_correct_distribution(kind):
    """retry=False gives the textbook duplicate-on-reject kernel: the
    stationary distribution must still be correct."""
    def gauss(t):
        return -0.5 * ((t[0] / 1.5) ** 2 + t[1] ** 2)

    starts = np.random.default_rng(1).normal(size=(64, 2))
    # MetropolisChain widths only adapt via max-tries halving (reference
    # semantics), so give the textbook kernel a sensible width directly
    arr = ChainArray(kind, gauss, starts, seed=7, retry=False, widths=1.0)
    arr.advance(600)
    sample = arr.get_sample(burn=200)
    assert abs(sample[:, 0].std() - 1.5) < 0.15
    assert abs(sample[:, 1].std() - 1.0) < 0.12
    assert abs(sample.mean(axis=0)).max() < 0.12
    # duplicate-on-reject must actually produce duplicates
    h = np.concatenate(arr._history, axis=0)
    repeats = (h[1:] == h[:-1]).all(axis=-1).mean()
    assert repeats > 0.01


def test_chain_array_effective_sample_size():
    from inference_tpu.utils import effective_sample_size

    def gauss(t):
        return -0.5 * np.sum(np.asarray(t) ** 2) if isinstance(t, np.ndarray) else -0.5 * (t * t).sum()

    starts = np.random.default_rng(5).normal(size=(8, 3))
    arr = ChainArray("gibbs", lambda t: -0.5 * (t * t).sum(), starts, seed=2)
    arr.advance(300)
    ess = arr.effective_sample_size(burn=50)
    assert ess.shape == (8, 3)
    assert (ess > 1).all() and (ess <= 250).all()
    # batched estimator must match the host estimator per series
    h = np.concatenate(arr._history, axis=0)[50:]
    expect = effective_sample_size(h[:, 0, 0])
    assert abs(int(ess[0, 0]) - expect) <= 1


def bimodal_1d(t):
    x = t[0]
    return jnp.logaddexp(
        -0.5 * ((x + 4.0) / 0.5) ** 2,
        -0.5 * ((x - 4.0) / 0.5) ** 2 + jnp.log(0.5),
    )


def test_sharded_tempering_exact_step_accounting():
    """advance(n, interval) runs exactly n steps: remainder as a swap-free
    tail, n < interval runs no swaps (regression for the cycles bug)."""
    mesh = tempering_mesh(n_rungs=2)
    st = ShardedTempering(
        bimodal_1d,
        start=np.array([4.0]),
        temperatures=[1.0, 10.0],
        n_chains=4,
        mesh=mesh,
        steps=5,
        seed=0,
    )
    acc = st.advance(25, swap_interval=10)
    assert acc.shape[0] == 2  # two swaps
    assert sum(h.shape[0] for h in st._history) == 25
    acc = st.advance(3, swap_interval=10)
    assert acc.shape[0] == 0  # no swap fits in 3 steps
    assert sum(h.shape[0] for h in st._history) == 28


@pytest.mark.parametrize("kind,kwargs", [
    ("gibbs", dict(widths=0.5)),
    ("metropolis", dict(widths=0.5)),
    ("ensemble", dict(n_walkers=8, widths=1.0)),
    ("nuts", dict(max_depth=6)),
])
def test_sharded_tempering_kinds(kind, kwargs):
    """Every sampler family runs as tempering rungs with mode hopping."""
    mesh = tempering_mesh(n_rungs=4)
    st = ShardedTempering(
        bimodal_1d,
        start=np.array([4.0]),
        temperatures=[1.0, 3.0, 10.0, 30.0],
        n_chains=8,
        mesh=mesh,
        kind=kind,
        seed=5,
        **kwargs,
    )
    acc = st.advance(400, swap_interval=10)
    assert 0.1 < acc.mean() < 0.98
    assert (st.cold_chain_positions() < 0).any()  # started at +4
    sample = st.get_sample(rung=0, burn=100)
    assert sample.ndim == 2 and sample.shape[1] == 1
    assert np.isfinite(sample).all()
    # even-odd pairing: only adjacent rungs ever attempt swaps
    rates = st.swap_rate_matrix()
    attempted = st.attempted_swaps - np.identity(4)
    for i in range(4):
        for j in range(4):
            if attempted[i, j] > 0:
                assert abs(i - j) == 1
    assert rates[0, 1] > 0.0


def test_sharded_tempering_pca_direction_updates():
    def corr_gauss(t):
        a, b = t[0], t[1]
        return -0.5 * (a**2 + (10.0 * (b - a)) ** 2)

    mesh = tempering_mesh(n_rungs=2)
    st = ShardedTempering(
        corr_gauss,
        start=np.array([0.5, 0.5]),
        temperatures=[1.0, 5.0],
        n_chains=4,
        mesh=mesh,
        kind="pca",
        widths=0.3,
        seed=2,
    )
    st.advance(60, swap_interval=10)
    d0 = np.asarray(st._state.directions)
    st.update_directions()
    d1 = np.asarray(st._state.directions)
    assert d1.shape == (2, 4, 2, 2)
    assert not np.allclose(d0, d1)
    st.advance(30, swap_interval=10)
    assert np.isfinite(st.get_sample(0)).all()


def test_sharded_tempering_run_for():
    mesh = tempering_mesh(n_rungs=2)
    st = ShardedTempering(
        bimodal_1d,
        start=np.array([4.0]),
        temperatures=[1.0, 10.0],
        n_chains=4,
        mesh=mesh,
        steps=5,
        seed=1,
        display_progress=False,
    )
    st.run_for(minutes=2.0 / 60.0, swap_interval=5)
    stored = sum(h.shape[0] for h in st._history)
    assert stored >= 5  # at least the calibration cycle
    assert np.isfinite(st.get_sample(0)).all()


def test_sharded_tempering_swap_diagnostics():
    import matplotlib

    matplotlib.use("Agg")
    mesh = tempering_mesh(n_rungs=4)
    st = ShardedTempering(
        bimodal_1d,
        start=np.array([4.0]),
        temperatures=[1.0, 3.0, 10.0, 30.0],
        n_chains=4,
        mesh=mesh,
        steps=5,
        seed=3,
    )
    st.advance(100, swap_interval=10)
    fig = st.swap_diagnostics(show=False)
    assert len(fig.axes) == 2
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_chain_array_ensemble_statistics():
    """kind='ensemble': independent vmapped sub-ensembles sample the target
    (regression for the inverted stretch move, which collapsed ensembles)."""
    logp, cov = correlated_gaussian()
    starts = np.random.default_rng(0).normal(0, 1, size=(8, 16, 2))
    ca = ChainArray("ensemble", logp, starts, seed=1, retry=False)
    ca.advance(800)
    s = ca.get_sample(burn=400)
    assert np.allclose(s.mean(0), 0.0, atol=0.1)
    assert np.allclose(np.cov(s.T), cov, atol=0.25)


def test_chain_array_proposal_modes():
    """Per-parameter non-negative and reflecting-boundary proposals in the
    batch layer (reference: gibbs.py:97-122)."""
    def logp(t):
        return jnp.where(t[0] >= 0, -t[0], -jnp.inf) - 0.5 * t[1] ** 2

    starts = np.abs(np.random.default_rng(2).normal(1, 0.2, size=(32, 2)))
    ca = ChainArray(
        "gibbs", logp, starts, widths=0.5, non_negative=[True, False], seed=2
    )
    ca.advance(400)
    s = ca.get_sample(burn=100)
    assert (s[:, 0] >= 0).all()
    assert abs(s[:, 0].mean() - 1.0) < 0.2  # exponential mean

    flat = lambda t: jnp.asarray(0.0)
    ca2 = ChainArray(
        "metropolis",
        flat,
        np.full((16, 2), 0.5),
        widths=0.4,
        boundaries=(np.zeros(2), np.ones(2)),
        seed=3,
    )
    ca2.advance(300)
    s2 = ca2.get_sample(burn=50)
    assert s2.min() >= 0.0 and s2.max() <= 1.0
    assert np.allclose(s2.mean(0), 0.5, atol=0.1)


def test_chain_array_matrix_inverse_mass():
    """Full (P, P) inverse-mass HMC in the batch layer
    (reference: hmc/mass.py:57-94)."""
    logp, cov = correlated_gaussian()
    iM = np.linalg.inv(cov)
    starts = np.random.default_rng(4).normal(0, 1, size=(32, 2))
    ca = ChainArray("hmc", logp, starts, inverse_mass=iM, seed=4)
    ca.advance(300)
    s = ca.get_sample(burn=100)
    assert np.allclose(np.cov(s.T), cov, atol=0.3)
    with pytest.raises(ValueError):
        ChainArray("hmc", logp, starts, inverse_mass=np.ones((3, 3)))


def test_global_meshes_single_process():
    """The multi-host mesh helpers degrade gracefully to one process: all
    local devices, rungs on contiguous devices."""
    from inference_tpu.parallel import global_chain_mesh, global_tempering_mesh

    m = global_chain_mesh()
    assert m.devices.size == len(jax.devices())
    tm = global_tempering_mesh(n_rungs=4)
    assert dict(tm.shape) == {"rungs": 4, "chains": len(jax.devices()) // 4}
    with pytest.raises(ValueError):
        global_tempering_mesh(n_rungs=3)

    # the sharded tempering program runs on the global mesh layout
    st = ShardedTempering(
        bimodal_1d,
        start=np.array([4.0]),
        temperatures=[1.0, 3.0, 10.0, 30.0],
        n_chains=4,
        mesh=tm,
        steps=5,
        seed=0,
    )
    acc = st.advance(20, swap_interval=10)
    assert acc.shape == (2, 4, 4)
    assert np.isfinite(st.logp).all()


def test_swap_uniforms_independent_across_chain_shards():
    """Swap accept draws must be independent across 'chains'-axis device
    shards (regression: a replicated key repeated the same uniforms in
    every shard, correlating supposedly independent lanes)."""
    mesh = tempering_mesh(n_rungs=2)  # chains axis = 4 devices
    st = ShardedTempering(
        lambda t: jnp.asarray(0.0) * t.sum(),
        start=np.zeros(1),
        temperatures=[1.0, 2.0],
        n_chains=64,  # 16 lanes per shard
        mesh=mesh,
        steps=2,
        seed=0,
    )
    # engineer accept_prob = 0.5 on every lane: (it0-it1)*(a-b) = ln 2
    it = 1.0 / st.temperatures
    a_minus_b = np.log(2.0) / (it[0] - it[1])
    untempered = np.stack(
        [np.full(64, a_minus_b), np.zeros(64)]
    )  # rung-0 minus rung-1 difference = a_minus_b
    logp = jnp.asarray(untempered * it[:, None], st._state.theta.dtype)
    state = st._state._replace(logp=st._shard(logp))

    _, accept = st._swap_fns[0](state, jax.random.PRNGKey(7))
    accept = np.asarray(accept)[0]  # rung-0 row, 64 lanes
    blocks = accept.reshape(4, 16)  # one row per chains-shard
    assert 0 < accept.mean() < 1  # the test is actually stochastic
    # shards must NOT all draw the same lane pattern
    assert not all(
        np.array_equal(blocks[0], blocks[k]) for k in range(1, 4)
    )


def test_sharded_tempering_store_false_no_history():
    mesh = tempering_mesh(n_rungs=2)
    st = ShardedTempering(
        bimodal_1d,
        start=np.array([4.0]),
        temperatures=[1.0, 10.0],
        n_chains=4,
        mesh=mesh,
        steps=5,
        seed=1,
    )
    acc = st.advance(25, swap_interval=10, store=False)
    assert acc.shape[0] == 2
    assert not st._history
    assert st.get_sample(0).shape == (0, 1)
    # empty-return shape matches the stored-accept shape per kind
    st2 = ShardedTempering(
        bimodal_1d,
        start=np.array([4.0]),
        temperatures=[1.0, 10.0],
        n_chains=4,
        mesh=mesh,
        kind="ensemble",
        n_walkers=6,
        widths=1.0,
        seed=2,
    )
    empty = st2.advance(3, swap_interval=10)
    full = st2.advance(20, swap_interval=10)
    assert empty.shape[1:] == full.shape[1:]


def test_sharded_tempering_nuts_grad_cache_after_swaps():
    """The ppermute swap must exchange and re-temper the NUTS kernel's
    cached gradient alongside the positions (regression: a stale cache
    corrupts the first half-step of every post-swap trajectory)."""
    from inference_tpu.parallel import ShardedTempering, tempering_mesh

    mesh = tempering_mesh(n_rungs=4)
    st = ShardedTempering(
        bimodal_1d,
        start=np.array([4.0]),
        temperatures=[1.0, 3.0, 10.0, 30.0],
        n_chains=4,
        mesh=mesh,
        kind="nuts",
        max_depth=5,
        seed=7,
    )
    acc = st.advance(60, swap_interval=5)
    assert acc.mean() > 0.05  # swaps actually happened
    state = st._state
    theta = np.asarray(state.theta)          # (rungs, chains, P)
    grad = np.asarray(state.grad)            # (rungs, chains, P)
    inv_t = np.asarray(state.inv_temp)       # (rungs, chains)
    g_fn = jax.vmap(jax.vmap(jax.grad(bimodal_1d)))
    expected = inv_t[..., None] * np.asarray(g_fn(jnp.asarray(theta)))
    assert np.allclose(grad, expected, rtol=1e-5, atol=1e-6)
