import numpy as np
import pytest
import jax.numpy as jnp

from inference_tpu.gp import GpRegressor, LargeScaleGP


def make_problem(n=1200, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 10, size=(n, 2))
    y = np.sin(x[:, 0]) * np.cos(x[:, 1]) + rng.normal(0, 0.1, n)
    return x, y, np.full(n, 0.1)


def test_large_scale_matches_exact_gp():
    """Matrix-free CG predictions agree with the dense-factorisation GP."""
    x, y, err = make_problem()
    theta = np.array([0.0, 0.5, 0.5])
    mean_val = float(np.mean(y))

    exact = GpRegressor(x, y, y_err=err, hyperpars=np.array([mean_val, *theta]))
    big = LargeScaleGP(
        x, y, err, hyperpars=theta, mean_value=mean_val, block_size=512
    )
    assert big.residual_norm() < 1e-5

    q = np.random.default_rng(1).uniform(1, 9, size=(6, 2))
    mu_e, sig_e = exact(q)
    mu_b, sig_b = big(q, with_variance=True)
    assert np.allclose(mu_e, mu_b, atol=1e-4)
    assert np.allclose(sig_e, sig_b, atol=1e-4)


def test_large_scale_sharded_over_mesh():
    """Row-sharded matvecs produce the same solution on an 8-device mesh."""
    from inference_tpu.parallel import chain_mesh

    x, y, err = make_problem(n=1024)
    theta = np.array([0.0, 0.5, 0.5])
    plain = LargeScaleGP(x, y, err, hyperpars=theta, block_size=256)
    sharded = LargeScaleGP(
        x, y, err, hyperpars=theta, block_size=256, mesh=chain_mesh()
    )
    q = np.array([[3.0, 4.0], [7.0, 2.0]])
    assert np.allclose(plain(q), sharded(q), atol=1e-8)


def test_large_scale_prediction_accuracy():
    x, y, err = make_problem(n=2000, seed=2)
    big = LargeScaleGP(
        x, y, err, hyperpars=np.array([0.0, 0.3, 0.3]), block_size=512
    )
    q = np.random.default_rng(3).uniform(1, 9, size=(50, 2))
    mu = big(q)
    truth = np.sin(q[:, 0]) * np.cos(q[:, 1])
    assert np.sqrt(np.mean((mu - truth) ** 2)) < 0.1


def test_pivoted_cholesky_full_rank_exact():
    """At full rank the on-device pivoted Cholesky factor must reproduce
    the kernel matrix exactly (it is a complete factorisation)."""
    from inference_tpu.ops.pairwise import sqexp_covariance

    x, y, err = make_problem(n=200)
    gp = LargeScaleGP(
        x, y, err, hyperpars=np.array([0.0, 0.0, 0.0]), block_size=128,
        preconditioner="pivchol", preconditioner_rank=150,
    )
    U = np.asarray(gp._pivoted_cholesky(gp.n_points))
    K = np.asarray(gp._bk.rows(gp._x, gp._x, gp._theta))
    K = K * np.outer(gp._mask, gp._mask)
    assert np.abs(U @ U.T - K).max() < 1e-5


def test_preconditioner_options():
    x, y, err = make_problem(n=600)
    theta = np.array([0.0, 0.3, 0.3])
    for kind in ("pivchol", "nystrom"):
        gp = LargeScaleGP(
            x, y, err, hyperpars=theta, block_size=256,
            preconditioner=kind, preconditioner_rank=128,
        )
        assert gp.residual_norm() < 1e-5
    with pytest.raises(ValueError):
        LargeScaleGP(x, y, err, hyperpars=theta, preconditioner="bogus")


def test_dtype_override_float64():
    """dtype="float64" runs the whole solve in f64 (needed when the noise is
    tiny relative to the amplitude and f32 CG hits its arithmetic wall)."""
    x, y, err = make_problem(n=400)
    gp = LargeScaleGP(
        x, y, err, hyperpars=np.array([0.0, 0.3, 0.3]), block_size=128,
        preconditioner_rank=64, dtype="float64",
    )
    assert gp._x.dtype == np.float64
    assert gp.alpha.dtype == np.float64
    assert gp.residual_norm() < 1e-6


def test_iterative_refinement_small_noise():
    """Mixed-precision refinement reaches float64-level solves with all CG
    iterations in float32 — the sigma ~ 1e-2 regime where f32 CG alone
    cannot converge."""
    rng = np.random.default_rng(3)
    n = 512
    x = rng.uniform(0, 8, size=(n, 2))
    theta = np.array([0.0, 0.0, 0.0])  # amp 1, lengthscales 1
    y = np.sin(x[:, 0]) * np.cos(0.5 * x[:, 1])
    err = np.full(n, 0.01)  # sigma^2 = 1e-4 of the amplitude

    gp = LargeScaleGP(
        x, y, err, hyperpars=theta, block_size=128,
        preconditioner_rank=128, dtype="float32",
    )
    r32 = gp.residual_norm_f64()
    gp.refine(target=1e-9)
    r_refined = gp.residual_norm_f64()
    assert r_refined < 3e-9
    assert r_refined < r32 * 1e-2  # orders of magnitude beyond plain f32

    # the refined alpha matches the direct float64 dense solve
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(axis=2)
    K = np.exp(-0.5 * d2) + np.diag(err**2) + 1e-12 * np.eye(n)
    alpha_direct = np.linalg.solve(K, y - gp.mean_value)
    ours = np.asarray(gp.alpha64)[:n]
    # forward error is bounded by kappa * residual ~ 1e4 * 1e-9 = 1e-5
    assert np.max(np.abs(ours - alpha_direct)) / np.max(np.abs(alpha_direct)) < 3e-5


def test_refine_never_degrades():
    """When the inner f32 CG is beyond its conditioning limit, refine()
    keeps the best-residual iterate instead of returning a diverged one."""
    rng = np.random.default_rng(1)
    n = 1024
    x = rng.uniform(0, 10, size=(n, 2))
    y = np.sin(x[:, 0]) * np.cos(x[:, 1])
    err = np.full(n, 0.01)
    gp = LargeScaleGP(
        x, y, err, hyperpars=np.array([0.0, 0.0, 0.0]), block_size=128,
        preconditioner_rank=64, cg_maxiter=60, dtype="float32",
    )
    r0 = gp.residual_norm_f64(residual_backend="host")
    gp.refine(max_rounds=6, residual_backend="host")
    r1 = gp.residual_norm_f64(residual_backend="host")
    assert r1 <= r0 * (1 + 1e-12)


@pytest.mark.slow
def test_mixed_solver_beats_plain_cg_at_small_noise():
    """solver='mixed' (f64 scalar recurrences + true-residual restarts)
    makes honest progress where plain float32 CG diverges silently
    (at this size/conditioning plain CG returns a residual WORSE than
    the zero vector while reporting convergence)."""
    rng = np.random.default_rng(0)
    n = 4096
    x = rng.uniform(0, 10, size=(n, 2))
    y = np.sin(x[:, 0]) * np.cos(x[:, 1])
    err = np.full(n, 0.01)
    kwargs = dict(
        hyperpars=np.array([0.0, 0.0, 0.0]),
        preconditioner_rank=512, cg_maxiter=2000, dtype="float32",
    )
    plain = LargeScaleGP(x, y, err, solver="cg", **kwargs)
    mixed = LargeScaleGP(x, y, err, solver="mixed", **kwargs)
    r_plain = plain.residual_norm_f64(residual_backend="host")
    r_mixed = mixed.residual_norm_f64(residual_backend="host")
    assert r_plain > 0.5          # plain f32 CG has diverged here
    # exact floors depend on device count / reduction order; the robust
    # claim is strict dominance (observed 4-20x across configurations)
    assert r_mixed < 0.5 * r_plain
    with pytest.raises(ValueError):
        LargeScaleGP(x, y, err, solver="bogus", **kwargs)


@pytest.mark.slow
def test_df64_solver_small_noise():
    """solver='df64' (pair-arithmetic Pallas matvec + float64 CG vectors)
    reaches ~1e-9 single-solve residuals in the sigma=0.01 regime where
    float32 matvec entry noise floors the other solvers. Runs the real
    kernel logic through the Pallas interpreter on CPU; the on-chip
    figures at N=16k/50k are recorded in BENCH_NOTES.md."""
    rng = np.random.default_rng(7)
    n = 512
    x = rng.uniform(0, 8, size=(n, 2))
    y = np.sin(x[:, 0]) * np.cos(0.5 * x[:, 1])
    err = np.full(n, 0.01)
    gp = LargeScaleGP(
        x, y, err, hyperpars=np.array([0.0, 0.0, 0.0]), block_size=128,
        preconditioner_rank=128, solver="df64", cg_tol=1e-9,
        cg_maxiter=3000, dtype="float32",
    )
    assert hasattr(gp, "alpha64")
    res = gp.residual_norm_f64(residual_backend="host")
    # the matvec's own ~1e-8 noise sets the floor (an earlier bug built
    # the rhs from the float32 device copy, flooring this at eps32)
    assert res < 3e-8

    # the df64 residual backend agrees with the host float64 one
    res_df = gp.residual_norm_f64(residual_backend="df64")
    assert abs(res_df - res) < 1e-8

    # posterior means run through the host-f64 contraction with alpha64:
    # the f32 device dot floors at sqrt(n)*eps32*|alpha| ABSOLUTE error
    # (alpha ~ y/sigma^2 at small noise), measured 2.3e-2 on-chip at
    # N=16k before the fix. 300 queries also exercise the 256-wide
    # mean-chunk loop.
    q = rng.uniform(1, 7, size=(300, 2))
    mu = gp(q)
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    K = np.exp(-0.5 * d2) + np.diag(err**2 + 1e-12)
    d2q = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    Kqx = np.exp(-0.5 * d2q)
    mu_ref = Kqx @ np.linalg.solve(K, y - y.mean()) + y.mean()
    assert np.abs(np.asarray(mu) - mu_ref).max() < 1e-6


def test_host_pivoted_cholesky_quality():
    """The float64 host pivoted Cholesky (df64 preconditioner build) at
    full rank reproduces the kernel matrix to float64 accuracy — the
    float32 device build's ~eps32*amp^2*m accumulated error is what
    stalled the N=50k small-noise solve."""
    from inference_tpu.ops.pairwise import sqexp_covariance

    x, y, err = make_problem(n=200)
    gp = LargeScaleGP(
        x, y, err, hyperpars=np.array([0.0, 0.0, 0.0]), block_size=128,
        preconditioner="pivchol", preconditioner_rank=64, solver="df64",
        cg_maxiter=50,
    )
    U = gp._pivoted_cholesky_host(gp.n_points)
    d2 = ((gp._x_host[:, None, :] - gp._x_host[None, :, :]) ** 2).sum(axis=2)
    K = np.exp(-0.5 * d2) * np.outer(gp._mask, gp._mask)
    assert np.abs(U @ U.T - K).max() < 1e-10


def test_df64_preconditioner_f64_application():
    """The df64 solver's Woodbury preconditioner is built AND applied in
    float64. At sigma ~ 1e-2 the Woodbury core has condition
    ~ amp^2 N / sigma^2 and the w - U t / d subtraction cancels ~8
    digits: an f32 application stalls PCG at 1e-4..1e-6 even with an
    exact f64 matvec (the N=50k on-chip stall), while f64 application
    converges in <50 iterations. This pins the application against a
    dense float64 (D + U U^T)^{-1} to far beyond f32 reach, and the
    operand dtypes."""
    import jax
    import jax.numpy as jnp

    if not jax.config.read("jax_enable_x64"):
        pytest.skip("requires x64")
    rng = np.random.default_rng(11)
    n = 384
    x = rng.uniform(0, 8, size=(n, 2))
    y = np.sin(x[:, 0]) * np.cos(0.5 * x[:, 1])
    err = np.full(n, 0.01)
    gp = LargeScaleGP(
        x, y, err, hyperpars=np.array([0.0, 0.0, 0.0]), block_size=128,
        preconditioner_rank=96, solver="df64", cg_tol=1e-9,
        cg_maxiter=500, dtype="float32",
    )
    U64, Cinv, dinv = gp._precond64
    assert U64.dtype == jnp.float64
    assert Cinv.dtype == jnp.float64
    assert dinv.dtype == jnp.float64

    # dense float64 ground truth for (D + U U^T)^{-1} v
    U = gp._pivoted_cholesky_host(96)
    d = gp._sig_host + 1e-12
    A = np.diag(d) + U @ U.T
    v = rng.normal(size=n)
    truth = np.linalg.solve(A, v)

    # through the production application path itself
    from inference_tpu.gp.large_scale import woodbury_apply

    z = np.asarray(
        woodbury_apply(jnp.asarray(v), U64, dinv, Cinv, core_chol=False)
    )
    # the f32 cancellation noise on this quantity is ~eps32/sigma^2 ~ 1e-3
    # absolute; the f64 application must sit orders of magnitude below it
    assert np.abs(z - truth).max() < 1e-9 * np.abs(truth).max()


def test_df64_rejects_nystrom_preconditioner():
    """solver='df64' only supports the float64-built pivchol
    preconditioner; the f32 Nystrom build would silently reintroduce the
    small-noise stall."""
    x, y, err = make_problem(n=64)
    with pytest.raises(ValueError):
        LargeScaleGP(
            x, y, err, hyperpars=np.array([0.0, 0.0, 0.0]),
            block_size=64, solver="df64", preconditioner="nystrom",
        )


@pytest.mark.slow
def test_df64_small_noise_variances_match_dense_truth():
    """At sigma = 0.01 posterior variances are sigma^2-scale (~1e-5)
    while the f32 batched CG's floor is orders of magnitude above them
    (measured: absolute errors 1e-3+); the df64 tier must route variance
    solves through the double-float machinery and land at f64-level
    accuracy against a dense float64 solve."""
    import jax

    if not jax.config.read("jax_enable_x64"):
        pytest.skip("requires x64")
    rng = np.random.default_rng(2)
    n, sig = 640, 0.01
    x = rng.uniform(0, 8, size=(n, 2))
    y = np.sin(x[:, 0]) * np.cos(0.5 * x[:, 1]) + sig * rng.normal(size=n)
    q = rng.uniform(0, 8, size=(8, 2))

    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    K = np.exp(-0.5 * d2) + (sig**2 + 1e-12) * np.eye(n)
    d2q = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    Kq = np.exp(-0.5 * d2q)
    var_truth = 1.0 - np.einsum("ij,ij->i", Kq, np.linalg.solve(K, Kq.T).T)

    gp = LargeScaleGP(
        x, y, np.full(n, sig), hyperpars=np.array([0.0, 0.0, 0.0]),
        block_size=128, preconditioner_rank=160, solver="df64",
        cg_tol=1e-9, cg_maxiter=600,
    )
    _, sd = gp(q, with_variance=True)
    err = np.abs(sd**2 - var_truth)
    # truth is ~1e-5..1e-4 here; the df64 route must resolve it to far
    # better than its own scale (the f32 route misses by 1e-3+)
    assert err.max() < 1e-7


@pytest.mark.slow
def test_fit_improves_marginal_likelihood():
    """Matrix-free stochastic-gradient hyperparameter fitting: Adam on
    Hutchinson-trace LML gradients (one batched multi-RHS CG per step)
    must improve the EXACT dense log-marginal likelihood decisively from
    a deliberately bad initialisation — and beat even the
    data-generating hyperparameters (the LML optimum co-adapts the
    amplitude with larger lengthscales; measured here: fitted 599.6 vs
    508.2 at the generating scale vs -185.6 at the init)."""
    rng = np.random.default_rng(5)
    n = 400
    x = rng.uniform(0, 10, size=(n, 2))
    y = np.sin(x[:, 0]) * np.cos(x[:, 1]) + rng.normal(0, 0.1, n)
    err = np.full(n, 0.1)
    mean_val = float(y.mean())

    def exact_lml(theta):
        amp2 = np.exp(2.0 * theta[0])
        ls = np.exp(theta[1:])
        d2 = (((x[:, None, :] - x[None, :, :]) / ls) ** 2).sum(-1)
        K = amp2 * np.exp(-0.5 * d2) + np.diag(err**2 + amp2 * 1e-12)
        r = y - mean_val
        sign, logdet = np.linalg.slogdet(K)
        return -0.5 * r @ np.linalg.solve(K, r) - 0.5 * logdet

    theta0 = np.array([0.5, 1.2, 1.2])  # amp and lengthscales far off
    gp = LargeScaleGP(
        x, y, err, hyperpars=theta0, mean_value=mean_val, block_size=128,
        preconditioner_rank=0,
    )
    theta_fit = gp.fit(n_steps=100, learning_rate=0.1, n_probes=8, seed=0)

    l0, l1 = exact_lml(theta0), exact_lml(theta_fit)
    assert l1 > l0 + 100.0  # decisive improvement, not noise
    # better than the data-generating hyperparameters, not merely moved
    assert l1 > exact_lml(np.array([0.0, 0.0, 0.0]))
    # refit at the selected hyperparameters predicts well
    gp2 = LargeScaleGP(
        x, y, err, hyperpars=theta_fit, mean_value=mean_val,
        block_size=128, preconditioner_rank=128,
    )
    q = rng.uniform(1, 9, size=(40, 2))
    rms = np.sqrt(np.mean((gp2(q) - np.sin(q[:, 0]) * np.cos(q[:, 1])) ** 2))
    assert rms < 0.1


def test_fit_smoke_improves_data_fit():
    """Fast-tier smoke: a few stochastic-LML Adam steps run end to end
    and improve the exact LML from a bad init (the full convergence
    behaviour is the slow-tier test above)."""
    rng = np.random.default_rng(9)
    n = 200
    x = rng.uniform(0, 10, size=(n, 2))
    y = np.sin(x[:, 0]) * np.cos(x[:, 1]) + rng.normal(0, 0.1, n)
    err = np.full(n, 0.1)
    theta0 = np.array([0.6, 1.0, 1.0])
    gp = LargeScaleGP(
        x, y, err, hyperpars=theta0, block_size=100, preconditioner_rank=0
    )
    theta_fit = gp.fit(n_steps=8, learning_rate=0.1, n_probes=4, seed=1)

    def exact_lml(theta):
        amp2 = np.exp(2.0 * theta[0])
        ls = np.exp(theta[1:])
        d2 = (((x[:, None, :] - x[None, :, :]) / ls) ** 2).sum(-1)
        K = amp2 * np.exp(-0.5 * d2) + np.diag(err**2 + amp2 * 1e-12)
        r = y - gp.mean_value
        _, logdet = np.linalg.slogdet(K)
        return -0.5 * r @ np.linalg.solve(K, r) - 0.5 * logdet

    assert exact_lml(theta_fit) > exact_lml(theta0)


def test_fit_precond_refresh_inverts_live_theta_system():
    """The live-theta preconditioner refresh used by fit(): at near-full
    rank the pivoted-Cholesky factor is essentially exact, so applying
    the Woodbury preconditioner built at a NEW theta to the system
    matvec at that same theta must approximate the identity — while the
    stale construction-time preconditioner must not."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    n = 150
    x = rng.uniform(0, 10, size=(n, 2))
    y = np.sin(x[:, 0]) + rng.normal(0, 0.05, n)
    err = np.full(n, 0.05)
    gp = LargeScaleGP(
        x, y, err, hyperpars=np.array([0.0, 0.3, 0.3]), block_size=64,
        preconditioner_rank=140,
    )
    theta_new = jnp.asarray(np.array([0.4, 0.9, 0.7]), gp._x.dtype)

    def apply_M(pc, V):
        Up, dinv, Cinv = pc
        U_ = Up.astype(dinv.dtype)
        W = V.astype(dinv.dtype) * dinv[:, None]
        s = jnp.dot(Cinv, jnp.dot(U_.T, W))
        return W - dinv[:, None] * jnp.dot(U_, s)

    pc_fresh = gp._fit_precond(theta_new)
    pc_stale = gp._fit_precond(jnp.asarray(gp.hyperpars, gp._x.dtype))
    v = jnp.asarray(
        rng.normal(size=(gp._n_padded, 1)) * gp._mask[:, None], gp._x.dtype
    )
    Av = gp._system_matmat(theta_new, v)
    rel_fresh = float(
        jnp.linalg.norm(apply_M(pc_fresh, Av) - v) / jnp.linalg.norm(v)
    )
    rel_stale = float(
        jnp.linalg.norm(apply_M(pc_stale, Av) - v) / jnp.linalg.norm(v)
    )
    assert rel_fresh < 1e-2
    assert rel_stale > 10 * rel_fresh


def test_fit_preconditioned_with_refresh():
    """fit() under the low-rank preconditioner, with live-theta refreshes
    every 3 steps, runs end to end and improves the exact LML."""
    rng = np.random.default_rng(11)
    n = 200
    x = rng.uniform(0, 10, size=(n, 2))
    y = np.sin(x[:, 0]) * np.cos(x[:, 1]) + rng.normal(0, 0.1, n)
    err = np.full(n, 0.1)
    theta0 = np.array([0.6, 1.0, 1.0])
    gp = LargeScaleGP(
        x, y, err, hyperpars=theta0, block_size=100, preconditioner_rank=64
    )
    theta_fit = gp.fit(
        n_steps=8, learning_rate=0.1, n_probes=4, precond_every=3, seed=1
    )

    def exact_lml(theta):
        amp2 = np.exp(2.0 * theta[0])
        ls = np.exp(theta[1:])
        d2 = (((x[:, None, :] - x[None, :, :]) / ls) ** 2).sum(-1)
        K = amp2 * np.exp(-0.5 * d2) + np.diag(err**2 + amp2 * 1e-12)
        r = y - gp.mean_value
        _, logdet = np.linalg.slogdet(K)
        return -0.5 * r @ np.linalg.solve(K, r) - 0.5 * logdet

    assert exact_lml(theta_fit) > exact_lml(theta0)


def test_store_entries_validation():
    """store_entries=True off the df64 tier raises (the flag would be
    silently ignored otherwise); bad values raise."""
    x, y, err = make_problem(n=200)
    theta = np.array([0.0, 0.5, 0.5])
    with pytest.raises(ValueError):
        LargeScaleGP(x, y, err, hyperpars=theta, block_size=100,
                     solver="cg", store_entries=True)
    with pytest.raises(ValueError):
        LargeScaleGP(x, y, err, hyperpars=theta, block_size=100,
                     store_entries="yes")


def test_df64_chunk_floor_shrinks_with_n():
    """The watchdog chunk budget must not step-function into ~150 s
    chunks just under the old floor's knee: the floor follows the 30 s
    budget continuously down to 2 iterations."""
    from inference_tpu.ops.solvers import df64_chunk_iters

    prev = None
    # up to the tier's advertised single-chip reach (~1e5 points)
    for n in (16_384, 50_000, 80_000, 100_000):
        it = df64_chunk_iters(n)
        per_iter = 1.7e-9 * n * n
        # one chunk (it iterations + 2 refresh matvecs) stays well under
        # the ~2-4 min watchdog kill threshold; the attainable floor is
        # 4 matvecs (2 iterations + the refresh), ~68 s at N=1e5
        assert (it + 2) * per_iter < 90.0, (n, it)
        assert it >= 2
        if prev is not None:
            assert it <= prev
        prev = it


@pytest.mark.slow
def test_fit_matches_on_sharded_mesh():
    """fit() through mesh-sharded blocked matvecs follows the same
    optimisation trajectory as the unsharded instance (same probes,
    same steps — only the reduction order differs)."""
    from inference_tpu.parallel import chain_mesh

    x, y, err = make_problem(n=512, seed=4)
    theta0 = np.array([0.5, 1.0, 1.0])
    kw = dict(hyperpars=theta0, block_size=128, preconditioner_rank=64)
    plain = LargeScaleGP(x, y, err, **kw)
    sharded = LargeScaleGP(x, y, err, mesh=chain_mesh(), **kw)
    fit_kw = dict(n_steps=5, learning_rate=0.1, n_probes=4, seed=2)
    th_plain = plain.fit(**fit_kw)
    th_sharded = sharded.fit(**fit_kw)
    assert np.allclose(th_plain, th_sharded, atol=1e-3)


def test_fit_on_df64_instance():
    """fit() on a df64-tier instance: the initial preconditioner derives
    from the host-f64 _precond64 triple (no duplicate build) and the f32
    fit machinery runs unchanged."""
    import jax

    if not jax.config.read("jax_enable_x64"):
        pytest.skip("requires x64")
    rng = np.random.default_rng(6)
    n = 256
    x = rng.uniform(0, 8, size=(n, 2))
    y = np.sin(x[:, 0]) + rng.normal(0, 0.05, n)
    err = np.full(n, 0.05)
    gp = LargeScaleGP(
        x, y, err, hyperpars=np.array([0.5, 0.8, 0.8]), block_size=128,
        preconditioner_rank=64, solver="df64", dtype="float32",
    )
    th = gp.fit(n_steps=4, learning_rate=0.1, n_probes=4, seed=0)
    assert np.all(np.isfinite(th))
    assert not np.allclose(th, gp.hyperpars)  # it moved


@pytest.mark.slow
def test_df64_solver_on_sharded_mesh_matches_single_device():
    """solver='df64' on a mesh routes the pair-arithmetic matvec through
    the row-sharded rectangular kernel (each device computes its block of
    kernel rows against the replicated data). The per-row arithmetic is
    identical to the single-device fused kernel, so the whole solve must
    agree to float64 rounding."""
    import jax
    from jax.sharding import Mesh

    rng = np.random.default_rng(3)
    n = 512
    x = rng.uniform(0, 8, size=(n, 2))
    y = np.sin(x[:, 0]) * np.cos(0.5 * x[:, 1])
    err = np.full(n, 0.01)
    kw = dict(
        hyperpars=np.array([0.0, 0.0, 0.0]), block_size=128,
        preconditioner_rank=128, solver="df64", cg_tol=1e-9,
        cg_maxiter=2000, store_entries=False,
    )
    plain = LargeScaleGP(x, y, err, **kw)
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    sharded = LargeScaleGP(x, y, err, mesh=mesh, **kw)
    assert sharded._entries is None  # the stored tier is single-chip
    # identical tile arithmetic => the solves agree to f64 rounding
    assert np.abs(sharded.alpha64 - plain.alpha64).max() <= 1e-10 * np.abs(
        plain.alpha64
    ).max()
    assert sharded.residual_norm_f64(residual_backend="host") < 3e-8


# ---------------------------------------------------------------------- #
# kernel generality (block_kernels): RQ and +WhiteNoise on the f32/mixed
# tiers; unsupported kernels must fail loudly at construction
# ---------------------------------------------------------------------- #


@pytest.mark.slow
def test_rational_quadratic_matches_dense_gp():
    """kernel=RationalQuadratic fits+predicts through the matrix-free
    tier and matches the dense GpRegressor at the same hyperparameters
    (VERDICT r3 item 5; reference: inference/gp/covariance.py:282-368)."""
    from inference_tpu.gp import RationalQuadratic

    rng = np.random.default_rng(7)
    n = 2048
    x = rng.uniform(0, 10, size=(n, 2))
    y = np.sin(x[:, 0]) * np.cos(x[:, 1]) + rng.normal(0, 0.1, n)
    err = np.full(n, 0.1)
    theta = np.array([0.0, 0.5, 0.3, 0.3])
    mean_val = float(np.mean(y))

    dense = GpRegressor(
        x, y, y_err=err, kernel=RationalQuadratic,
        hyperpars=np.array([mean_val, *theta]),
    )
    big = LargeScaleGP(
        x, y, err, hyperpars=theta, kernel=RationalQuadratic,
        mean_value=mean_val, block_size=512, cg_tol=1e-8,
    )
    q = rng.uniform(1, 9, size=(8, 2))
    mu_d, sig_d = dense(q)
    mu_b, sig_b = big(q, with_variance=True)
    assert np.allclose(mu_d, mu_b, atol=1e-5)
    assert np.allclose(sig_d, sig_b, atol=1e-5)

    # the stochastic-LML fit runs through the generic theta path
    fitted = big.fit(n_steps=5, learning_rate=0.02)
    assert fitted.shape == theta.shape
    assert np.all(np.isfinite(fitted))


def test_white_noise_composition_matches_dense_gp():
    """SquaredExponential() + WhiteNoise() folds the noise variance into
    the system diagonal; predictions match the dense composite."""
    from inference_tpu.gp import SquaredExponential, WhiteNoise

    rng = np.random.default_rng(8)
    n = 400
    x = rng.uniform(0, 10, size=(n, 2))
    y = np.sin(x[:, 0]) + rng.normal(0, 0.1, n)
    err = np.full(n, 0.1)
    theta = np.array([0.0, 0.3, 0.3, np.log(0.05)])
    mean_val = float(np.mean(y))

    dense = GpRegressor(
        x, y, y_err=err, kernel=SquaredExponential() + WhiteNoise(),
        hyperpars=np.array([mean_val, *theta]),
    )
    big = LargeScaleGP(
        x, y, err, hyperpars=theta,
        kernel=SquaredExponential() + WhiteNoise(),
        mean_value=mean_val, block_size=128, preconditioner_rank=64,
        cg_tol=1e-10,
    )
    q = rng.uniform(1, 9, size=(8, 2))
    mu_d, sig_d = dense(q)
    mu_b, sig_b = big(q, with_variance=True)
    assert np.allclose(mu_d, mu_b, atol=1e-6)
    assert np.allclose(sig_d, sig_b, atol=1e-6)


def test_unsupported_kernels_error_at_construction():
    """ChangePoint / HeteroscedasticNoise / unsupported compositions and
    df64-with-RQ raise informative errors before any solve work."""
    from inference_tpu.gp import (
        ChangePoint,
        HeteroscedasticNoise,
        RationalQuadratic,
        SquaredExponential,
        WhiteNoise,
    )

    rng = np.random.default_rng(9)
    x = rng.uniform(0, 10, size=(64, 1))
    y = np.sin(x[:, 0])
    err = np.full(64, 0.1)

    with pytest.raises(ValueError, match="not supported"):
        LargeScaleGP(x, y, err, hyperpars=[0.0, 0.0], kernel=ChangePoint)
    with pytest.raises(ValueError, match="not supported"):
        LargeScaleGP(
            x, y, err, hyperpars=[0.0, 0.0], kernel=HeteroscedasticNoise
        )
    with pytest.raises(ValueError, match="Unsupported kernel composition"):
        LargeScaleGP(
            x, y, err, hyperpars=[0.0] * 5,
            kernel=SquaredExponential() + RationalQuadratic(),
        )
    with pytest.raises(ValueError, match="SquaredExponential kernel only"):
        LargeScaleGP(
            x, y, err, hyperpars=[0.0, 0.5, 0.0],
            kernel=RationalQuadratic, solver="df64",
        )
    # a +WhiteNoise composite is also outside the df64 tier
    with pytest.raises(ValueError, match="SquaredExponential kernel only"):
        LargeScaleGP(
            x, y, err, hyperpars=[0.0, 0.0, np.log(0.1)],
            kernel=SquaredExponential() + WhiteNoise(), solver="df64",
        )
    # hyperparameter-count validation names the kernel
    with pytest.raises(ValueError, match="RationalQuadratic"):
        LargeScaleGP(
            x, y, err, hyperpars=[0.0, 0.0], kernel=RationalQuadratic
        )


@pytest.mark.slow
def test_df64_stored_f32_tier_matches_pair_tier():
    """store_entries='f32' (round 4: pair-accurate entries rounded to one
    float32 word, CG iterating on the stored array with fused-kernel
    true-residual refreshes) reaches the same df64-level residual as the
    pair tier in the small-noise regime — the tier that extends stored
    entries past the pair tier's HBM cap (n ~ 20k) to n ~ 51k."""
    rng = np.random.default_rng(11)
    n = 512
    x = rng.uniform(0, 8, size=(n, 2))
    y = np.sin(x[:, 0]) * np.cos(0.5 * x[:, 1])
    err = np.full(n, 0.01)
    kwargs = dict(
        hyperpars=np.array([0.0, 0.0, 0.0]), block_size=128,
        preconditioner_rank=128, solver="df64", cg_tol=1e-9,
        cg_maxiter=3000, dtype="float32",
    )
    gp = LargeScaleGP(x, y, err, store_entries="f32", **kwargs)
    assert gp._entries_f32 is not None and gp._entries is None
    res = gp.residual_norm_f64(residual_backend="host")
    assert res < 3e-8

    gp_pair = LargeScaleGP(x, y, err, store_entries=True, **kwargs)
    assert gp_pair._entries is not None
    alpha_diff = np.abs(
        np.asarray(gp.alpha64) - np.asarray(gp_pair.alpha64)
    ).max() / np.abs(np.asarray(gp_pair.alpha64)).max()
    assert alpha_diff < 1e-6


def test_df64_auto_guard_refuses_unsound_f32_tier(monkeypatch):
    """store_entries='auto' in the stored-f32 size window falls back to
    the fused kernel (with a warning) when the tier's 2^-24 entry
    quantisation exceeds the noise scale: iterative refinement over the
    quantised operator is measured to stall there, and the default
    policy must not silently select an accuracy class the solve cannot
    deliver. Explicit store_entries='f32' keeps the override.

    The guard only engages past the pair tier's 20480-padded-row cap,
    so the constructor is necessarily huge — the training solve is
    stubbed out (a fused df64 solve at n=20k runs the interpret-mode
    Pallas kernel on CPU, which is effectively unbounded: it consumed
    >60 CPU-minutes in the fast tier before this stub)."""
    from inference_tpu.ops import solvers as solvers_mod

    monkeypatch.setattr(
        solvers_mod.Df64Solver,
        "solve",
        lambda self, b64, tol=1e-10, maxiter=2000, verbose=False: (
            jnp.zeros_like(b64),
            0,
        ),
    )

    rng = np.random.default_rng(3)
    n = 20608  # the first padded size past the pair tier's 20480 cap
    x = rng.uniform(0, 8, size=(n, 2))
    y = np.sin(x[:, 0])
    err = np.full(n, 1e-4)  # sigma^2 = 1e-8, far below the quantisation
    with pytest.warns(UserWarning, match="falling back to the fused"):
        gp = LargeScaleGP(
            x, y, err, hyperpars=np.array([0.0, 0.0, 0.0]),
            block_size=128, preconditioner_rank=8, solver="df64",
            dtype="float32",
        )
    assert gp._entries is None and gp._entries_f32 is None
    # (the explicit store_entries='f32' override is covered at a
    # CPU-tractable size by test_df64_stored_f32_tier_matches_pair_tier)
