"""GpLinearInverter demo (counterpart of reference:
demos/gp_linear_inversion_demo.ipynb): deconvolution with a GP prior."""

import numpy as np
import matplotlib.pyplot as plt
from inference_tpu import GpLinearInverter


def main():
    rng = np.random.default_rng(3)
    n_params, n_data = 64, 48

    # ground truth: two gaussian humps on [0, 1]
    pos = np.linspace(0, 1, n_params).reshape(-1, 1)
    truth = np.exp(-0.5 * ((pos[:, 0] - 0.3) / 0.06) ** 2) + 0.6 * np.exp(
        -0.5 * ((pos[:, 0] - 0.7) / 0.1) ** 2
    )

    # forward model: gaussian blur + subsampling
    centres = np.linspace(0, 1, n_data)
    A = np.exp(-0.5 * ((centres[:, None] - pos[None, :, 0]) / 0.04) ** 2)
    A /= A.sum(axis=1, keepdims=True)

    y_err = np.full(n_data, 0.01)
    y = A @ truth + rng.normal(0, 0.01, n_data)

    inverter = GpLinearInverter(y, y_err, A, pos)
    theta0 = np.array([0.5, np.log(0.5), np.log(0.1)])
    best = inverter.optimize_hyperparameters(theta0)
    mu, cov = inverter.calculate_posterior(best)
    sig = np.sqrt(np.diag(cov))

    print(f"posterior rms error: {np.sqrt(np.mean((mu - truth) ** 2)):.4f}")

    plt.figure(figsize=(9, 5))
    plt.fill_between(pos[:, 0], mu - 2 * sig, mu + 2 * sig, alpha=0.25)
    plt.plot(pos[:, 0], mu, lw=2, label="posterior mean")
    plt.plot(pos[:, 0], truth, "k--", label="ground truth")
    plt.plot(centres, y, "r.", label="blurred data")
    plt.legend()
    plt.grid()
    plt.savefig("gp_inversion.png")
    print("saved gp_inversion.png")


if __name__ == "__main__":
    main()
