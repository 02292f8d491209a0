import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pytest

from inference_tpu.plotting import (
    matrix_plot,
    trace_plot,
    hdi_plot,
    transition_matrix_plot,
)


def make_samples(n_params=3, n=500, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=n)
    return [base * (i + 1) + rng.normal(0, 0.5, n) for i in range(n_params)]


@pytest.mark.parametrize("style", ["contour", "hdi", "histogram", "scatter"])
def test_matrix_plot_styles(style):
    samples = make_samples()
    fig = matrix_plot(
        samples, show=False, plot_style=style, reference=[0.0, 0.0, 0.0]
    )
    assert len(fig.axes) == 6  # lower triangle of a 3x3 grid
    plt.close(fig)


def test_matrix_plot_validation():
    samples = make_samples()
    with pytest.raises(ValueError):
        matrix_plot(samples, labels=["a"], show=False)
    with pytest.raises(ValueError):
        matrix_plot(samples, reference=[0.0], show=False)
    with pytest.raises(ValueError):
        matrix_plot(samples, hdi_fractions=(1.5,), show=False)


def test_trace_plot():
    samples = make_samples()
    fig = trace_plot(samples, show=False)
    assert len(fig.axes) == 3
    plt.close(fig)


def test_hdi_plot():
    rng = np.random.default_rng(1)
    x = np.linspace(0, 1, 20)
    sample = x[None, :] + rng.normal(0, 0.1, size=(500, 20))
    ax = hdi_plot(x, sample, intervals=(0.65, 0.95))
    assert len(ax.collections) == 2
    plt.close("all")
    with pytest.raises(ValueError):
        hdi_plot(x, sample, intervals=(1.5,))
    with pytest.raises(ValueError):
        hdi_plot(x, np.zeros([7, 9]))


def test_transition_matrix_plot():
    matrix = np.array([[0.0, 0.5, 0.2], [0.0, 0.0, 0.4], [0.0, 0.0, 0.0]])
    ax = transition_matrix_plot(
        matrix=matrix, exclude_diagonal=True, upper_triangular=True
    )
    plt.close("all")
    with pytest.raises(TypeError):
        transition_matrix_plot(matrix=[[0, 1], [1, 0]])
    with pytest.raises(ValueError):
        transition_matrix_plot(matrix=np.zeros([2, 3]))
    with pytest.raises(ValueError):
        transition_matrix_plot(matrix=np.zeros([1, 1]))
