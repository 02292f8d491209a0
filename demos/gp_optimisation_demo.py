"""GpOptimiser demo (counterpart of reference: demos/scripts/GpOptimiser_demo.py):
Bayesian optimisation of an expensive 1D objective."""

import numpy as np
from inference_tpu import GpOptimiser


def expensive_objective(x):
    return -np.sin(3 * x) - 0.4 * (x - 2.0) ** 2 + 2.0


def main():
    x = np.array([0.5, 2.0, 3.8])
    y = expensive_objective(x)

    # optimizer="device" runs all multistart fits / acquisition maximisations
    # as single vmapped device programs (the fast path on accelerators)
    opt = GpOptimiser(x, y, bounds=[(0.0, 4.0)], optimizer="device")

    for i in range(8):
        new_x = float(np.atleast_1d(opt.propose_evaluation())[0])
        new_y = expensive_objective(new_x)
        opt.add_evaluation(np.array([new_x]), np.array([new_y]))
        print(f"iteration {i}: proposed x={new_x:.4f}, value={new_y:.4f}")

    grid = np.linspace(0, 4, 2000)
    print(f"\nbest found: {opt.y.max():.5f}")
    print(f"true max:   {expensive_objective(grid).max():.5f}")

    opt.plot_results(show_plot=False, filename="gp_optimisation.png")


if __name__ == "__main__":
    main()
