"""ParallelTempering demo: multimodal sampling with replica exchange
(counterpart of reference: demos/scripts/ParallelTempering_demo.py).
All temperature rungs advance inside one compiled device program."""

import numpy as np
import jax.numpy as jnp
from inference_tpu import GibbsChain, ParallelTempering


def multimodal_posterior(theta):
    x = theta[0]
    # two well-separated gaussian modes with 2:1 weights
    return jnp.logaddexp(
        -0.5 * ((x + 5.0) / 0.6) ** 2,
        -0.5 * ((x - 5.0) / 0.6) ** 2 + jnp.log(0.5),
    )


def main():
    temperatures = [1.0, 3.0, 10.0, 30.0, 100.0, 300.0]
    chains = [
        GibbsChain(
            posterior=multimodal_posterior,
            start=np.array([5.0]),
            widths=np.array([0.5]),
            temperature=T,
            display_progress=False,
            seed=i,
        )
        for i, T in enumerate(temperatures)
    ]

    pt = ParallelTempering(chains=chains)
    pt.run_for(minutes=0.5, swap_interval=10)

    cold_chain = pt.return_chains()[0]
    sample = cold_chain.get_sample(burn=100)
    left = (sample[:, 0] < 0).mean()
    print(f"\nfraction of cold-chain samples in the left mode: {left:.3f} "
          f"(target 2/3)")

    pt.swap_diagnostics()
    pt.shutdown()


if __name__ == "__main__":
    main()
