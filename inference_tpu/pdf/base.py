"""Abstract base class for 1D density estimators.

TPU-native rebuild of the reference ``DensityEstimator``
(reference: inference/pdf/base.py:8-169): ``interval`` refines a sample-HDI
seed by Nelder-Mead over (centre, width), and ``plot_summary`` renders the
estimate with summary statistics.
"""

from abc import ABC, abstractmethod

import numpy as np
from scipy.optimize import minimize
import matplotlib.pyplot as plt

from .hdi import sample_hdi


class DensityEstimator(ABC):
    sample: np.ndarray
    mode: float

    @abstractmethod
    def __call__(self, x):
        pass

    @abstractmethod
    def cdf(self, x):
        pass

    @abstractmethod
    def moments(self) -> tuple:
        pass

    def interval(self, fraction: float):
        """
        The highest-density interval: the shortest single interval
        containing ``fraction`` of the total probability.
        """
        if not 0.0 < fraction < 1.0:
            raise ValueError(
                f"[ {self.__class__.__name__} error ] The 'fraction' argument "
                f"must have a value greater than zero and less than one, but "
                f"the value given was {fraction}."
            )
        lwr, upr = sample_hdi(self.sample, fraction=fraction)
        c = 0.5 * (lwr + upr)
        w = upr - lwr

        simplex = np.array([[c, w], [c, 0.95 * w], [c - 0.05 * w, w]])
        weight = 0.2 / float(self(self.mode))
        result = minimize(
            fun=self.__hdi_cost,
            x0=simplex[0, :],
            method="Nelder-Mead",
            options={"initial_simplex": simplex},
            args=(fraction, weight),
        )
        c, w = result.x
        return c - 0.5 * w, c + 0.5 * w

    def __hdi_cost(self, theta, fraction, prob_weight):
        c, w = theta
        v = np.array([c - 0.5 * w, c + 0.5 * w])
        Pa, Pb = np.atleast_1d(self(v))
        Fa, Fb = np.atleast_1d(self.cdf(v))
        return (prob_weight * (Pa - Pb)) ** 2 + (Fb - Fa - fraction) ** 2

    def plot_summary(self, filename=None, show=True, label=None):
        """Plot the estimated PDF along with summary statistics."""
        sigma_1 = self.interval(fraction=0.68268)
        sigma_2 = self.interval(fraction=0.95449)
        mu, var, skw, kur = self.moments()
        s_min, s_max = sigma_2
        maxprob = float(self(self.mode))

        delta = 0.1 * (s_max - s_min)
        lwr = s_min - delta
        upr = s_max + delta
        while float(self(lwr)) / maxprob > 5e-3:
            lwr -= delta
        while float(self(upr)) / maxprob > 5e-3:
            upr += delta

        axis = np.linspace(lwr, upr, 500)

        fig, ax = plt.subplots(
            nrows=1,
            ncols=2,
            figsize=(10, 6),
            gridspec_kw={"width_ratios": [2, 1]},
        )
        pdf_vals = np.asarray(self(axis))
        ax[0].plot(axis, pdf_vals, lw=1, c="C0")
        ax[0].fill_between(axis, pdf_vals, color="C0", alpha=0.1)
        ax[0].plot([self.mode, self.mode], [0.0, maxprob], c="red", ls="dashed")
        ax[0].set_xlabel(label or "argument", fontsize=13)
        ax[0].set_ylabel("probability density", fontsize=13)
        ax[0].set_ylim([0.0, None])
        ax[0].grid()

        gap, h, x1, x2 = 0.05, 0.95, 0.35, 0.40

        def section_title(height, name):
            ax[1].text(0.0, height, name, ha="left", fontweight="bold")
            return height - gap

        def write_quantity(height, name, value):
            ax[1].text(x1, height, f"{name}:", ha="right")
            ax[1].text(x2, height, f"{value:.5G}", ha="left")
            return height - gap

        h = section_title(h, "Basics")
        h = write_quantity(h, "Mode", self.mode)
        h = write_quantity(h, "Mean", mu)
        h = write_quantity(h, "Standard dev", np.sqrt(var))
        h -= gap

        h = section_title(h, "Highest-density intervals")

        def write_sigma(height, name, sigma):
            ax[1].text(x1, height, name, ha="right")
            ax[1].text(
                x2,
                height,
                rf"{sigma[0]:.5G} $\rightarrow$ {sigma[1]:.5G}",
                ha="left",
            )
            return height - gap

        h = write_sigma(h, "1-sigma:", sigma_1)
        h = write_sigma(h, "2-sigma:", sigma_2)
        h -= gap

        h = section_title(h, "Higher moments")
        h = write_quantity(h, "Variance", var)
        h = write_quantity(h, "Skewness", skw)
        h = write_quantity(h, "Kurtosis", kur)

        ax[1].axis("off")

        plt.tight_layout()
        if filename is not None:
            plt.savefig(filename)
        if show:
            plt.show()

        return fig, ax
