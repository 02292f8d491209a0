import numpy as np
import pytest

from inference_tpu.gp import GpLinearInverter


def make_problem(seed=1, n_params=24, n_data=16):
    rng = np.random.default_rng(seed)
    pos = np.linspace(0, 1, n_params).reshape(-1, 1)
    truth = np.exp(-0.5 * ((pos[:, 0] - 0.5) / 0.15) ** 2)
    A = rng.random((n_data, n_params)) / n_params
    y_err = np.full(n_data, 0.01)
    y = A @ truth + rng.normal(0, 0.01, n_data)
    return y, y_err, A, pos, truth


def test_inverter_lml_gradient_vs_finite_difference():
    y, y_err, A, pos, _ = make_problem()
    inv = GpLinearInverter(y, y_err, A, pos)
    rng = np.random.default_rng(4)
    for _ in range(5):
        theta = np.array(
            [rng.normal(0.3, 0.2), np.log(rng.uniform(0.2, 1.0)),
             np.log(rng.uniform(0.05, 0.5))]
        )
        lml, grad = inv.marginal_likelihood_gradient(theta)
        eps = 1e-6
        for i in range(theta.size):
            tp, tm = theta.copy(), theta.copy()
            tp[i] += eps
            tm[i] -= eps
            fd = (inv.marginal_likelihood(tp) - inv.marginal_likelihood(tm)) / (
                2 * eps
            )
            assert np.isclose(grad[i], fd, rtol=1e-5, atol=1e-8)


def test_inverter_recovers_truth():
    y, y_err, A, pos, truth = make_problem()
    inv = GpLinearInverter(y, y_err, A, pos)
    theta0 = np.array([0.5, np.log(0.5), np.log(0.2)])
    best = inv.optimize_hyperparameters(theta0)
    mu, cov = inv.calculate_posterior(best)
    assert np.sqrt(np.mean((mu - truth) ** 2)) < 0.15
    assert cov.shape == (truth.size, truth.size)
    # posterior variances are positive
    assert (np.diag(cov) > 0).all()
    mu2 = inv.calculate_posterior_mean(best)
    assert np.allclose(mu, mu2)


def test_inverter_validation():
    y, y_err, A, pos, _ = make_problem()
    with pytest.raises(ValueError):
        GpLinearInverter(y, y_err, A[:, :, None], pos)  # 3D model matrix
    with pytest.raises(ValueError):
        GpLinearInverter(y, y_err[:-1], A, pos)  # size mismatch
    with pytest.raises(ValueError):
        GpLinearInverter(y[:-1], y_err[:-1], A, pos)  # wrong first dim
    with pytest.raises(ValueError):
        GpLinearInverter(y, y_err, A, pos[:-1])  # wrong param count
    inv = GpLinearInverter(y, y_err, A, pos)
    with pytest.raises(ValueError):
        inv.optimize_hyperparameters(np.ones(99))


def test_large_scale_inverter_matches_dense():
    """The matrix-free inverter reproduces the dense GpLinearInverter
    posterior mean on a problem small enough for both."""
    import jax.numpy as jnp
    from inference_tpu.gp import LargeScaleGpLinearInverter

    rng = np.random.default_rng(0)
    n_param, n_data = 300, 60
    positions = rng.uniform(0, 10, size=(n_param, 2))
    truth = np.sin(positions[:, 0]) * np.cos(0.5 * positions[:, 1])
    A = rng.normal(0, 1.0 / n_param, size=(n_data, n_param)) ** 2  # smooth-ish
    y_clean = A @ truth
    y_err = np.full(n_data, 0.05 * np.abs(y_clean).max() + 1e-3)
    y = y_clean + rng.normal(0, y_err)

    theta = np.array([0.0, 0.5, 0.5])
    inv = LargeScaleGpLinearInverter(
        y, y_err, A, positions, hyperpars=theta, block_size=128
    )
    assert inv.residual_norm() < 1e-5
    mean = inv.calculate_posterior_mean()

    # dense reference solution in float64
    d2 = (
        ((positions[:, None, :] - positions[None, :, :]) / np.exp(0.5)) ** 2
    ).sum(axis=2)
    K = np.exp(-0.5 * d2)
    S = np.diag(y_err**2)
    z = np.linalg.solve(S + A @ K @ A.T, y)
    dense_mean = K @ A.T @ z
    scale = np.abs(dense_mean).max()
    assert np.max(np.abs(mean - dense_mean)) / scale < 1e-3

    # variances at a few indices are positive and below the prior
    var = inv.posterior_variances(np.arange(5))
    assert (var > 0).all() and (var <= 1.0 + 1e-6).all()

    # forward prediction consistency
    pred = inv.predict_data()
    assert np.sqrt(np.mean((pred - y) ** 2)) < 3 * y_err.mean()


def test_large_scale_inverter_sharded():
    """Parameter rows shard over the device mesh."""
    import jax
    from inference_tpu.gp import LargeScaleGpLinearInverter
    from inference_tpu.parallel import chain_mesh

    rng = np.random.default_rng(1)
    n_param, n_data = 256, 40
    positions = rng.uniform(0, 8, size=(n_param, 2))
    truth = np.sin(positions[:, 0])
    A = np.abs(rng.normal(0, 1.0 / n_param, size=(n_data, n_param)))
    y = A @ truth + rng.normal(0, 0.01, n_data)

    mesh = chain_mesh(axis_name="rows")
    inv = LargeScaleGpLinearInverter(
        y, np.full(n_data, 0.01), A, positions,
        hyperpars=np.array([0.0, 0.0, 0.0]), block_size=64, mesh=mesh,
    )
    assert len(inv._x.sharding.device_set) == len(jax.devices())
    assert inv.residual_norm() < 1e-4
    assert np.isfinite(inv.calculate_posterior_mean()).all()


@pytest.mark.slow
def test_large_inverter_df64_solver():
    """solver='df64' routes the N-dimensional prior contraction through
    the pair-arithmetic Pallas matvec: at small noise the data-space
    residual (measured through the df64 matvec) reaches ~1e-7 where the
    float32 entry noise would floor a plain solve, and the posterior
    mean agrees with the float32 path."""
    import jax

    if not jax.config.read("jax_enable_x64"):
        pytest.skip("requires x64")
    rng = np.random.default_rng(5)
    m_data, n_par = 96, 256
    xp = rng.uniform(0, 6, size=(n_par, 2))
    A = rng.normal(size=(m_data, n_par)) / np.sqrt(n_par)
    truth = np.sin(xp[:, 0]) * np.cos(0.5 * xp[:, 1])
    y = A @ truth + 1e-3 * rng.normal(size=m_data)
    err = np.full(m_data, 1e-3)
    theta = np.array([0.0, 0.0, 0.0])

    from inference_tpu.gp import LargeScaleGpLinearInverter

    inv64 = LargeScaleGpLinearInverter(
        y, err, A, xp, theta, block_size=128, solver="df64",
        cg_tol=1e-9, cg_maxiter=4000,
    )
    assert hasattr(inv64, "z64")
    assert inv64.residual_norm_f64() < 1e-6

    inv32 = LargeScaleGpLinearInverter(
        y, err, A, xp, theta, block_size=128, solver="mixed",
        cg_tol=1e-9, cg_maxiter=4000,
    )
    m64 = inv64.calculate_posterior_mean()
    m32 = inv32.calculate_posterior_mean()
    scale = np.abs(m64).max()
    assert np.abs(m64 - m32).max() / scale < 1e-2

    with pytest.raises(ValueError):
        LargeScaleGpLinearInverter(
            y, err, A, xp, theta, solver="bogus"
        )


@pytest.mark.slow
def test_large_inverter_fit_improves_data_space_lml():
    """Matrix-free stochastic data-space LML fitting: Adam on
    Hutchinson-trace gradients through the blocked live-theta operator
    must improve the EXACT dense data-space marginal likelihood from a
    deliberately bad initialisation."""
    from inference_tpu.gp import LargeScaleGpLinearInverter

    rng = np.random.default_rng(5)
    m, n = 120, 200
    xp = rng.uniform(0, 10, size=(n, 2))
    truth = np.sin(xp[:, 0]) * np.cos(0.5 * xp[:, 1])
    # smooth local-averaging forward model
    centres = rng.uniform(0, 10, size=(m, 2))
    d2 = ((centres[:, None, :] - xp[None, :, :]) ** 2).sum(-1)
    A = np.exp(-0.5 * d2 / 0.5)
    A /= A.sum(axis=1, keepdims=True)
    err = np.full(m, 0.02)
    y = A @ truth + rng.normal(0, 0.02, m)

    def exact_lml(theta):
        amp2 = np.exp(2.0 * theta[0])
        ls = np.exp(theta[1:])
        dd = (((xp[:, None, :] - xp[None, :, :]) / ls) ** 2).sum(-1)
        K = amp2 * np.exp(-0.5 * dd)
        S = np.diag(err**2) + A @ K @ A.T
        _, logdet = np.linalg.slogdet(S)
        return -0.5 * y @ np.linalg.solve(S, y) - 0.5 * logdet

    theta0 = np.array([1.5, 1.5, 1.5])  # far from anything sensible
    inv = LargeScaleGpLinearInverter(
        y, err, A, xp, hyperpars=theta0, block_size=100,
    )
    theta_fit = inv.fit(
        n_steps=30, learning_rate=0.1, n_probes=8, seed=0
    )
    assert exact_lml(theta_fit) > exact_lml(theta0) + 10.0

    # a refit inverter at the fitted hyperparameters reconstructs well
    inv2 = LargeScaleGpLinearInverter(
        y, err, A, xp, hyperpars=theta_fit, block_size=100,
    )
    mean = inv2.calculate_posterior_mean()
    rms = np.sqrt(np.mean((mean - truth) ** 2))
    assert rms < 0.25

    with pytest.raises(ValueError):
        inv.fit(n_probes=0)


@pytest.mark.slow
def test_large_inverter_df64_on_sharded_mesh():
    """solver='df64' with a mesh runs the prior contraction through the
    row-sharded rectangular kernel; the data-space solve matches the
    single-device df64 instance to float64 rounding (identical per-row
    tile arithmetic)."""
    import jax
    from jax.sharding import Mesh

    if not jax.config.read("jax_enable_x64"):
        pytest.skip("requires x64")
    rng = np.random.default_rng(5)
    m_data, n_par = 96, 256
    xp = rng.uniform(0, 6, size=(n_par, 2))
    A = rng.normal(size=(m_data, n_par)) / np.sqrt(n_par)
    truth = np.sin(xp[:, 0]) * np.cos(0.5 * xp[:, 1])
    y = A @ truth + 1e-3 * rng.normal(size=m_data)
    err = np.full(m_data, 1e-3)
    theta = np.array([0.0, 0.0, 0.0])

    from inference_tpu.gp import LargeScaleGpLinearInverter

    kw = dict(block_size=128, solver="df64", cg_tol=1e-9, cg_maxiter=4000,
              store_entries=False)
    plain = LargeScaleGpLinearInverter(y, err, A, xp, theta, **kw)
    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    sharded = LargeScaleGpLinearInverter(y, err, A, xp, theta, mesh=mesh, **kw)
    assert sharded._entries is None
    assert sharded.residual_norm_f64() < 1e-6
    # the single-device path applies the hi/lo split as two matvec-kernel
    # calls, the mesh path as one two-column matmat: the contraction
    # roundings differ at the operator's own ~1e-8 noise, so the solves
    # agree to that level rather than bitwise
    scale = np.abs(plain.z64).max()
    assert np.abs(sharded.z64 - plain.z64).max() <= 1e-7 * scale


@pytest.mark.slow
def test_large_inverter_df64_predictions_match_dense_truth():
    """The df64 tier's posterior mean AND variances run at float64 end to
    end (regression: both previously routed through the f32 traced paths,
    flooring far above the data-space solve's accuracy at small noise)."""
    import jax

    if not jax.config.read("jax_enable_x64"):
        pytest.skip("requires x64")
    rng = np.random.default_rng(11)
    m_data, n_par = 96, 256
    xp = rng.uniform(0, 6, size=(n_par, 2))
    A = rng.normal(size=(m_data, n_par)) / np.sqrt(n_par)
    truth = np.sin(xp[:, 0]) * np.cos(0.5 * xp[:, 1])
    y = A @ truth + 1e-3 * rng.normal(size=m_data)
    err = np.full(m_data, 1e-3)
    theta = np.array([0.0, 0.0, 0.0])

    from inference_tpu.gp import LargeScaleGpLinearInverter

    inv = LargeScaleGpLinearInverter(
        y, err, A, xp, theta, block_size=128, solver="df64",
        cg_tol=1e-10, cg_maxiter=4000,
    )

    # dense float64 reference (the reference package's formulae)
    d2 = ((xp[:, None, :] - xp[None, :, :]) ** 2).sum(-1)
    K = np.exp(-0.5 * d2)
    S = A @ K @ A.T + np.diag(err**2)
    z_ref = np.linalg.solve(S, y)
    mean_ref = K @ A.T @ z_ref
    cov_ref = K - K @ A.T @ np.linalg.solve(S, A @ K)

    mu = inv.calculate_posterior_mean()
    # the achievable floor is the operator's ~1e-8 relative noise times
    # the data-space conditioning; measured 3e-7 here (the old f32 path
    # floored at ~1e-2 relative)
    assert np.abs(mu - mean_ref).max() < 1e-6

    idx = np.arange(0, n_par, 37)
    var = inv.posterior_variances(idx)
    var_ref = np.diag(cov_ref)[idx]
    # truth is ~sigma^2-scale against amp^2 = 1: demand absolute accuracy
    # far below the f32 floor (measured 1e-3+ through the f32 batched CG)
    assert np.abs(var - var_ref).max() < 1e-8


def test_large_inverter_kernel_validation():
    """Unsupported kernels raise informative errors at construction
    (compile-free checks kept in the fast tier)."""
    from inference_tpu.gp import (
        ChangePoint,
        LargeScaleGpLinearInverter,
        RationalQuadratic,
    )

    rng = np.random.default_rng(1)
    N, M = 50, 20
    x = np.linspace(0, 10, N).reshape(-1, 1)
    A = rng.normal(size=(M, N)) / N
    y = A @ np.sin(x[:, 0])
    err = np.full(M, 0.01)

    with pytest.raises(ValueError, match="not supported"):
        LargeScaleGpLinearInverter(
            y, err, A, x, hyperpars=[0.0, 0.0], kernel=ChangePoint
        )
    with pytest.raises(ValueError, match="SquaredExponential kernel only"):
        LargeScaleGpLinearInverter(
            y, err, A, x, hyperpars=[0.0, 0.5, 0.0],
            kernel=RationalQuadratic, solver="df64",
        )


@pytest.mark.slow
def test_large_inverter_kernel_generality():
    """RationalQuadratic and SquaredExponential()+WhiteNoise() priors run
    through the matrix-free inverter and match the dense GpLinearInverter
    posterior (VERDICT r3 item 5)."""
    from inference_tpu.gp import (
        GpLinearInverter,
        LargeScaleGpLinearInverter,
        RationalQuadratic,
        SquaredExponential,
        WhiteNoise,
    )

    rng = np.random.default_rng(1)
    N, M = 200, 60
    x = np.linspace(0, 10, N).reshape(-1, 1)
    A = rng.normal(size=(M, N)) / N
    y = A @ np.sin(x[:, 0]) + 0.01 * rng.normal(size=M)
    err = np.full(M, 0.01)

    for kernel, theta in [
        (RationalQuadratic, np.array([0.0, 0.5, 0.0])),
        (
            SquaredExponential() + WhiteNoise(),
            np.array([0.0, 0.0, np.log(0.3)]),
        ),
    ]:
        dense = GpLinearInverter(
            y, err, A, x, prior_covariance_function=kernel
        )
        mu_d, cov_d = dense.calculate_posterior(
            np.concatenate([[0.0], theta])
        )
        sd_d = np.sqrt(np.diag(np.asarray(cov_d)))
        big = LargeScaleGpLinearInverter(
            y, err, A, x, hyperpars=theta, kernel=kernel,
            block_size=64, cg_tol=1e-12,
        )
        mu_b = big.calculate_posterior_mean()
        sd_b = np.sqrt(big.posterior_variances(np.arange(N)))
        assert np.allclose(np.asarray(mu_d), mu_b, atol=1e-8)
        assert np.allclose(sd_d, sd_b, atol=1e-8)

        # the stochastic data-space fit runs on the generic theta path
        fitted = big.fit(n_steps=3, learning_rate=0.02)
        assert fitted.shape == theta.shape and np.all(np.isfinite(fitted))


@pytest.mark.slow
def test_large_inverter_stored_f32_tier():
    """store_entries='f32' (quantised stored entries for iterations,
    fused-kernel true-residual refreshes) reaches the pair tier's
    data-space residual and posterior mean at MODERATE data noise —
    the tier's documented domain: refinement contracts only while
    sigma_data^2 exceeds the prior's 2^-24 entry-quantisation scale
    (at sigma=1e-3 it was measured to stall at ~2e-3, which is why
    'auto' never selects it for the inverter)."""
    import jax

    if not jax.config.read("jax_enable_x64"):
        pytest.skip("requires x64")
    rng = np.random.default_rng(11)
    m_data, n_par = 96, 256
    xp = rng.uniform(0, 6, size=(n_par, 2))
    A = rng.normal(size=(m_data, n_par)) / np.sqrt(n_par)
    truth = np.sin(xp[:, 0]) * np.cos(0.5 * xp[:, 1])
    y = A @ truth + 0.05 * rng.normal(size=m_data)
    err = np.full(m_data, 0.05)
    theta = np.array([0.0, 0.0, 0.0])

    from inference_tpu.gp import LargeScaleGpLinearInverter

    inv_f32 = LargeScaleGpLinearInverter(
        y, err, A, xp, theta, block_size=128, solver="df64",
        cg_tol=1e-9, cg_maxiter=4000, store_entries="f32",
    )
    assert inv_f32._entries_f32 is not None
    assert inv_f32.residual_norm_f64() < 1e-7

    inv_pair = LargeScaleGpLinearInverter(
        y, err, A, xp, theta, block_size=128, solver="df64",
        cg_tol=1e-9, cg_maxiter=4000, store_entries=True,
    )
    m_f32 = inv_f32.calculate_posterior_mean()
    m_pair = inv_pair.calculate_posterior_mean()
    scale = np.abs(m_pair).max()
    assert np.abs(m_f32 - m_pair).max() / scale < 1e-6

    v_f32 = inv_f32.posterior_variances([0, 7, 100])
    v_pair = inv_pair.posterior_variances([0, 7, 100])
    assert np.allclose(v_f32, v_pair, rtol=1e-4, atol=1e-10)

    # 'auto' never selects the f32 tier here (small-noise stall)
    inv_auto = LargeScaleGpLinearInverter(
        y, err, A, xp, theta, block_size=128, solver="df64",
        cg_tol=1e-9, cg_maxiter=500, store_entries="auto",
    )
    assert inv_auto._entries_f32 is None

    with pytest.raises(ValueError):
        LargeScaleGpLinearInverter(
            y, err, A, xp, theta, solver="mixed", store_entries="f32"
        )
