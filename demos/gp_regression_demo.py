"""GpRegressor demo (counterpart of reference: demos/gp_regression_demo.ipynb):
1D regression with uncertainties and hyperparameter selection."""

import numpy as np
import matplotlib.pyplot as plt
from inference_tpu import GpRegressor


def main():
    rng = np.random.default_rng(1)
    x = np.concatenate([np.linspace(0, 4, 12), np.linspace(6, 10, 12)])
    y = np.sin(x) + 0.1 * x**2 + rng.normal(0, 0.15, x.size)
    y_err = np.full(x.size, 0.15)

    gp = GpRegressor(x, y, y_err=y_err)
    print(gp)

    xq = np.linspace(-1, 11, 200)
    mu, sig = gp(xq)

    plt.figure(figsize=(9, 5))
    plt.fill_between(xq, mu - 2 * sig, mu + 2 * sig, alpha=0.2, label="2-sigma")
    plt.fill_between(xq, mu - sig, mu + sig, alpha=0.3, label="1-sigma")
    plt.plot(xq, mu, lw=2, label="GP mean")
    plt.errorbar(x, y, yerr=y_err, fmt="k.", label="data")
    plt.legend()
    plt.grid()
    plt.savefig("gp_regression.png")
    print("saved gp_regression.png")

    # leave-one-out sanity check
    loo_mu, loo_sig = gp.loo_predictions()
    z = (loo_mu - y) / loo_sig
    print(f"LOO standardised-residual std: {z.std():.2f} (should be ~1)")


if __name__ == "__main__":
    main()
