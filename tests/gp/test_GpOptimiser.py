import numpy as np
import pytest

from inference_tpu.gp import (
    GpOptimiser,
    ExpectedImprovement,
    UpperConfidenceBound,
    MaxVariance,
)


def objective_1d(x):
    return -np.sin(3 * x) - 0.5 * (x - 2) ** 2 + 2


def objective_2d(v):
    x, y = v
    return -((x - 1.0) ** 2) - (y - 2.0) ** 2


@pytest.mark.parametrize(
    "acquisition", [ExpectedImprovement, UpperConfidenceBound, MaxVariance]
)
@pytest.mark.parametrize("optimizer", ["bfgs", "diffev"])
def test_gpo_1d_loop(acquisition, optimizer):
    x = np.array([0.5, 2.0, 3.5])
    y = objective_1d(x)
    opt = GpOptimiser(
        x, y, bounds=[(0.0, 4.0)], acquisition=acquisition, optimizer=optimizer
    )
    for _ in range(3):
        nx = opt.propose_evaluation()
        nx = float(np.atleast_1d(nx)[0])
        assert 0.0 <= nx <= 4.0
        opt.add_evaluation(np.array([nx]), np.array([objective_1d(nx)]))
    assert opt.y.size == 6
    assert len(opt.convergence_metric_history) == 3


def test_gpo_2d_loop():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 3, size=(5, 2))
    y = np.array([objective_2d(v) for v in x])
    opt = GpOptimiser(x, y, bounds=[(0.0, 3.0), (0.0, 3.0)])
    for _ in range(3):
        nx = np.asarray(opt.propose_evaluation())
        assert ((nx >= 0) & (nx <= 3)).all()
        opt.add_evaluation(nx, np.array([objective_2d(nx.flatten())]))
    assert opt.y.size == 8


def test_gpo_finds_maximum():
    x = np.array([0.5, 1.5, 2.5, 3.5])
    y = objective_1d(x)
    opt = GpOptimiser(x, y, bounds=[(0.0, 4.0)])
    for _ in range(5):
        nx = float(np.atleast_1d(opt.propose_evaluation())[0])
        opt.add_evaluation(np.array([nx]), np.array([objective_1d(nx)]))
    true_max = objective_1d(np.linspace(0, 4, 2000)).max()
    assert opt.y.max() > true_max - 0.05


def test_gpo_y_err_requirement():
    x = np.array([0.5, 2.0, 3.5])
    y = objective_1d(x)
    opt = GpOptimiser(x, y, bounds=[(0.0, 4.0)], y_err=np.full(3, 0.01))
    with pytest.raises(ValueError):
        opt.add_evaluation(np.array([1.0]), np.array([objective_1d(1.0)]))


def test_gpo_plot_results():
    x = np.array([0.5, 2.0, 3.5])
    y = objective_1d(x)
    opt = GpOptimiser(x, y, bounds=[(0.0, 4.0)])
    nx = float(np.atleast_1d(opt.propose_evaluation())[0])
    opt.add_evaluation(np.array([nx]), np.array([objective_1d(nx)]))
    opt.plot_results(show_plot=False)

@pytest.mark.slow
def test_gpo_device_proposal_matches_host():
    """The on-device vmapped acquisition multistart must find a proposal at
    least as good as the host multistart L-BFGS-B from the same seeds."""
    x = np.array([0.5, 1.5, 2.5, 3.5])
    y = objective_1d(x)
    opt = GpOptimiser(x, y, bounds=[(0.0, 4.0)])
    x_host, f_host = opt.multistart_bfgs()
    x_dev, f_dev = opt.multistart_device()
    assert 0.0 <= float(np.atleast_1d(x_dev)[0]) <= 4.0
    assert f_dev <= f_host + 1e-6


@pytest.mark.slow
def test_fused_device_iteration_state_consistency():
    """The device optimizer defers the refit into the next proposal (one
    fused dispatch). After the proposal the GP state must be identical to
    an explicit fit+set_hyperparameters at the same hyperparameters, and
    the history entries must match the eager path's semantics (acquisition
    value of the added point under the state that proposed it)."""
    import numpy as np

    def objective(x):
        x = np.atleast_1d(x)[0]
        return float(np.sin(2 * x) + 0.1 * x)

    x0 = np.array([1.0, 5.0, 9.0]).reshape(-1, 1)
    y0 = np.array([objective(v) for v in x0])
    bo = GpOptimiser(
        x0, y0, bounds=[(0.0, 10.0)], optimizer="device",
        acquisition=ExpectedImprovement,
    )
    for _ in range(3):
        nx = bo.propose_evaluation()
        bo.add_evaluation(np.atleast_1d(nx), np.array([objective(nx)]))
        assert bo._pending is not None  # refit deferred

    # flush through the public surface; state becomes current
    mu = bo(np.array([[2.5]]))
    assert bo._pending is None
    assert np.isfinite(mu).all()
    assert len(bo.acquisition_max_history) == 3
    assert len(bo.convergence_metric_history) == 3
    assert bo.iteration_history == [4, 5, 6]

    # the adopted fused state equals an explicit re-fit at the same theta
    import jax.numpy as jnp
    theta = bo.gp.hyperpars.copy()
    L_fused = np.asarray(bo.gp.L)
    alpha_fused = np.asarray(bo.gp.alpha)
    bo.gp.set_hyperparameters(theta)
    assert np.allclose(L_fused, np.asarray(bo.gp.L), atol=1e-6)
    assert np.allclose(alpha_fused, np.asarray(bo.gp.alpha), atol=1e-5)


@pytest.mark.slow
def test_deferred_history_flushes_on_plain_read():
    """The histories are reference-parity attributes users poll in
    stopping criteria: a plain read must settle the deferred device
    refit, never returning a list one entry short."""

    def objective(x):
        x = np.atleast_1d(x)[0]
        return float(np.sin(2 * x) + 0.1 * x)

    x0 = np.array([1.0, 5.0, 9.0]).reshape(-1, 1)
    y0 = np.array([objective(v) for v in x0])
    bo = GpOptimiser(
        x0, y0, bounds=[(0.0, 10.0)], optimizer="device",
        acquisition=ExpectedImprovement,
    )
    nx = bo.propose_evaluation()
    bo.add_evaluation(np.atleast_1d(nx), np.array([objective(nx)]))
    assert bo._pending is not None  # refit deferred
    # the plain attribute read flushes and reflects the new evaluation
    assert len(bo.convergence_metric_history) == 1
    assert bo._pending is None
    assert len(bo.acquisition_max_history) == 1
    assert bo.iteration_history == [4]
