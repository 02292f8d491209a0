"""NutsChain demo (beyond the reference — it has no No-U-Turn sampler):
the same toroidal density as the HamiltonianChain demo, but trajectory
lengths are chosen automatically by the U-turn criterion, so there is no
``steps`` parameter to tune. Compare with demos/hamiltonian_chain_demo.py
(counterpart of reference: demos/scripts/HamiltonianChain_demo.py)."""

import numpy as np
import jax.numpy as jnp
from inference_tpu import NutsChain


class ToroidalGaussian:
    def __init__(self, radius=1.0, thickness=0.05):
        self.r0 = radius
        self.coeff = -0.5 / thickness**2

    def __call__(self, theta):
        x, y, z = theta[0], theta[1], theta[2]
        r_sqr = z**2 + (jnp.sqrt(x**2 + y**2) - self.r0) ** 2
        return self.coeff * r_sqr


def main():
    posterior = ToroidalGaussian()
    chain = NutsChain(
        posterior=posterior, start=np.array([1.0, 0.1, 0.1]), seed=0
    )
    chain.advance(6000)

    sample = chain.get_sample(burn=1000)
    radius = np.sqrt(sample[:, 0] ** 2 + sample[:, 1] ** 2)
    print(f"mean ring radius: {radius.mean():.4f} (true 1.0)")
    print(f"z-thickness: {sample[:, 2].std():.4f} (true 0.05)")
    depths = chain.tree_depths[1000:]
    print(
        f"adaptive tree depth: mean {depths.mean():.2f}, "
        f"max {depths.max()} (2^depth - 1 leapfrog steps per transition)"
    )
    print(f"divergent transitions: {chain.n_divergences}")

    chain.plot_diagnostics(show=False, filename="nuts_diagnostics.png")
    chain.matrix_plot(burn=1000, show=False, filename="nuts_matrix.png")


if __name__ == "__main__":
    main()
