"""Vmapped chain-batch throughput: ChainArray Gibbs sweeps with and without
the repeat-until-accept retry loop (reference semantics vs textbook
duplicate-on-reject — reference: inference/mcmc/gibbs.py:627-656 advances
ONE chain per Python-level posterior call; here 1024 advance per dispatch).

Usage: python benchmarks/chain_batch_bench.py [n_chains] [n_dim]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from inference_tpu.parallel import ChainArray


def main():
    n_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_dim = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    def corr_gauss(t):
        d = t - jnp.roll(t, 1) * 0.5
        return -0.5 * jnp.sum(d * d)

    starts = np.random.default_rng(0).normal(size=(n_chains, n_dim))

    for retry in (True, False):
        arr = ChainArray("gibbs", corr_gauss, starts, seed=1, retry=retry)
        arr.advance(128, store=False)  # warm both timed scan lengths
        arr.advance(512, store=False)
        t0 = time.time()
        arr.advance(512, store=False)
        dt = time.time() - t0
        rate = n_chains * 512 / dt
        print(
            f"gibbs retry={retry}: {dt:.2f}s -> {rate:,.0f} chain-steps/s "
            f"({rate * n_dim:,.0f} parameter-updates/s)"
        )


if __name__ == "__main__":
    main()
