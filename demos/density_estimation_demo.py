"""Density estimation demo (counterpart of reference:
demos/scripts/GaussianKDE_demo.py): KDE and parametric unimodal fits."""

import numpy as np
from inference_tpu import GaussianKDE, UnimodalPdf, sample_hdi


def main():
    rng = np.random.default_rng(2)
    # skewed sample: exponentially-modified gaussian
    sample = rng.normal(0, 1, 20000) + rng.exponential(3.0, 20000)

    kde = GaussianKDE(sample)
    mu, var, skw, kur = kde.moments()
    print(f"KDE:       mode={kde.mode:.3f} mean={mu:.3f} var={var:.3f} "
          f"skew={skw:.3f}")

    pdf = UnimodalPdf(sample)
    mu, var, skw, kur = pdf.moments()
    print(f"UnimodalPdf: mode={pdf.mode:.3f} mean={mu:.3f} var={var:.3f} "
          f"skew={skw:.3f}")

    lo, hi = sample_hdi(sample, 0.95)
    print(f"95% HDI from the sample: [{lo:.3f}, {hi:.3f}]")
    lo, hi = kde.interval(0.95)
    print(f"95% HDI from the KDE:    [{lo:.3f}, {hi:.3f}]")

    kde.plot_summary(show=False, filename="kde_summary.png")


if __name__ == "__main__":
    main()
