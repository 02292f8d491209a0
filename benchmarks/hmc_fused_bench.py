"""Fused Pallas HMC kernel vs the XLA kernel on the headline workload
(10-dim correlated Gaussian, bench.py config), on the real chip.
Sweeps the kernel's lane width and dot-lowering policy."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from inference_tpu.parallel import ChainArray
from inference_tpu.ops import hmc_fused

N_DIM = 10
HMC_STEPS = 50


def make_cov():
    rng = np.random.default_rng(42)
    A = rng.normal(size=(N_DIM, N_DIM)) / np.sqrt(N_DIM)
    return A @ A.T + np.eye(N_DIM)


def measure(fused, n_chains=65536, steps=64, lanes=None, expand_all=False):
    jax.clear_caches()
    hmc_fused._CONVERT_CACHE.clear()
    hmc_fused._EXPAND_ALL_DOTS = expand_all
    icov = jnp.asarray(np.linalg.inv(make_cov()), jnp.float32)
    logp = lambda t: -0.5 * t @ icov @ t
    starts = np.random.default_rng(0).normal(0, 0.1, (n_chains, N_DIM))
    ca = ChainArray(
        "hmc", logp, starts, steps=HMC_STEPS, epsilon=0.25, seed=1,
        retry=False, fused=fused,
    )
    if fused and lanes:
        ca._fused_plan = ca._fused_plan._replace(lanes=lanes)
    ca.advance(steps, store=False)  # warm/compile
    float(jnp.sum(ca._state.theta))
    t0 = time.perf_counter()
    ca.advance(steps, store=False)
    # materialise a scalar: block_until_ready can return early here
    float(jnp.sum(ca._state.theta))
    dt = time.perf_counter() - t0
    return dt, n_chains * steps / dt


def main():
    variants = [
        ("xla", dict(fused=False)),
        ("fused_512", dict(fused="auto")),
        ("fused_512_vpu", dict(fused="auto", expand_all=True)),
        ("fused_1024", dict(fused="auto", lanes=1024)),
        ("fused_2048_vpu", dict(fused="auto", lanes=2048, expand_all=True)),
    ]
    for name, kw in variants:
        try:
            dt, rate = measure(**kw)
            print(f"{name:16s}: {dt:7.3f} s  {rate/1e6:8.1f} M attempts/s")
        except Exception as e:
            print(f"{name:16s}: FAILED {type(e).__name__}: {str(e)[:200]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
