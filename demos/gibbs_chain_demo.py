"""GibbsChain demo: sampling a curved (Rosenbrock-like) posterior.

Counterpart of the reference demo (reference: demos/scripts/GibbsChain_demo.py):
the posterior here is written in jax, so the chain's step loop runs as a
single compiled program on the accelerator.
"""

import numpy as np
from inference_tpu import GibbsChain


def rosenbrock(t):
    x, y = t[0], t[1]
    x2 = x**2
    b = 15.0  # correlation strength
    v = 3.0   # variance of the gaussian envelope
    return -x2 - b * (y - x2) ** 2 - 0.5 * (x2 + y**2) / v**2


def main():
    chain = GibbsChain(posterior=rosenbrock, start=np.array([2.0, -4.0]), seed=0)
    chain.advance(150_000)

    burn = chain.estimate_burn_in()
    print(f"estimated burn-in: {burn}")

    sample = chain.get_sample(burn=burn, thin=10)
    print(f"sample shape: {sample.shape}")
    print(f"posterior means: {sample.mean(axis=0)}")

    chain.plot_diagnostics(show=False, filename="gibbs_diagnostics.png")
    chain.matrix_plot(burn=burn, thin=10, show=False, filename="gibbs_matrix.png")
    chain.trace_plot(burn=burn, thin=10, show=False, filename="gibbs_trace.png")

    pdf = chain.get_marginal(1, burn=burn, thin=10, unimodal=True)
    print(f"marginal of y: mode={pdf.mode:.3f}")


if __name__ == "__main__":
    main()
