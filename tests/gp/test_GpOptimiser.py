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
