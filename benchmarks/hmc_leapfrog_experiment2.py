"""Apples-to-apples: production make_hmc_step vs the static-leapfrog
variant, same process, same posterior, 65k chains."""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inference_tpu.mcmc._kernels.hmc import (
    make_hmc_step,
    init_hmc_state,
    run_steps,
)

N_DIM = 10
N_CHAINS = 65536
N_TRANSITIONS = 64


def make_cov():
    rng = np.random.default_rng(42)
    A = rng.normal(size=(N_DIM, N_DIM)) / np.sqrt(N_DIM)
    return A @ A.T + np.eye(N_DIM)


def main():
    icov = jnp.asarray(np.linalg.inv(make_cov()), jnp.float32)

    def logp(t):
        return -0.5 * t @ icov @ t

    grad = jax.grad(logp)

    rng = np.random.default_rng(0)
    starts = jnp.asarray(rng.normal(0, 0.1, (N_CHAINS, N_DIM)), jnp.float32)
    logp0 = jax.vmap(logp)(starts)
    keys = jax.random.split(jax.random.key(1), N_CHAINS)

    step = make_hmc_step(logp, grad, retry=False)
    init = jax.vmap(
        lambda t0, p0, k: init_hmc_state(t0, p0, 0.25, k, steps=50)
    )
    state = init(starts, logp0, keys)
    vstep = jax.vmap(step)

    # warm
    s2, _ = run_steps(vstep, state, N_TRANSITIONS, False)
    float(s2.theta.sum())
    t0 = time.perf_counter()
    s2, _ = run_steps(vstep, state, N_TRANSITIONS, False)
    float(s2.theta.sum())
    dt = time.perf_counter() - t0
    rate = N_CHAINS * N_TRANSITIONS / dt
    print(f"production  : {dt:7.3f} s   {rate/1e6:8.1f} M attempts/s")


if __name__ == "__main__":
    main()
