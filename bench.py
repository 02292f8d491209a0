"""Headline benchmark: 1000-chain HMC throughput on a 10-dim correlated
Gaussian (BASELINE.json north star), measured as MCMC samples/sec/chip.

``vs_baseline`` compares against the single-core reference implementation
(C-bowman/inference-tools) running the identical posterior with an analytic
gradient, measured fresh on this machine each run (the reference publishes
no numbers of its own — see BASELINE.md).

Prints exactly one JSON line.
"""

import json
import os
import sys
import time
import types

import numpy as np

N_DIM = 10
N_CHAINS = 1000
HMC_STEPS = 50  # leapfrog steps per proposal (reference default)
BENCH_STEPS = 256  # chain transitions timed for the rebuild
REF_TIME_BUDGET = 3.0  # seconds of reference sampling to measure


def make_cov():
    rng = np.random.default_rng(42)
    A = rng.normal(size=(N_DIM, N_DIM)) / np.sqrt(N_DIM)
    return A @ A.T + np.eye(N_DIM)


def measure_rebuild() -> float:
    """
    Accepted-transition throughput of the textbook (duplicate-on-reject)
    HMC kernel: attempts/sec times the measured acceptance fraction. This
    is the same quantity the reference's steps/sec measures — the reference
    re-proposes serially until acceptance, so its per-step cost already
    includes the rejected attempts; counting our accepted transitions only
    keeps the comparison apples-to-apples while avoiding the vmapped
    retry-loop's synchronisation waste (every chain lane re-runs until the
    slowest lane accepts).
    """
    import jax
    import jax.numpy as jnp
    from inference_tpu.parallel import ChainArray

    icov = jnp.asarray(np.linalg.inv(make_cov()), jnp.float32)

    def logp(t):
        return -0.5 * t @ icov @ t

    starts = np.random.default_rng(0).normal(0, 0.1, size=(N_CHAINS, N_DIM))
    ca = ChainArray(
        "hmc", logp, starts, steps=HMC_STEPS, epsilon=0.25, seed=1, retry=False
    )

    # warm-up with the SAME scan length as the timed run: every distinct
    # scan length compiles a separate program, and a compile costs seconds
    # through the remote-compile tunnel
    ca.advance(BENCH_STEPS, store=False)

    # acceptance fraction from a stored stretch (position changed => accepted)
    ca.advance(32, store=True)
    theta = np.concatenate(ca._history, axis=0)  # (32, K, P)
    moved = (np.abs(np.diff(theta, axis=0)).max(axis=2) > 0).mean()

    t0 = time.perf_counter()
    ca.advance(BENCH_STEPS, store=False)
    dt = time.perf_counter() - t0
    attempts_per_sec = N_CHAINS * BENCH_STEPS / dt
    return attempts_per_sec * float(moved)


def measure_reference() -> float:
    """Single-core reference HamiltonianChain throughput (steps/sec)."""
    mod = types.ModuleType("setuptools_scm")
    mod.get_version = lambda **k: "0.0.0"
    sys.modules.setdefault("setuptools_scm", mod)
    sys.path.insert(0, "/root/reference")
    try:
        from inference.mcmc import HamiltonianChain
    except Exception:
        return float("nan")

    icov = np.linalg.inv(make_cov())

    def posterior(t):
        return float(-0.5 * t @ icov @ t)

    def grad(t):
        return -icov @ t

    chain = HamiltonianChain(
        posterior=posterior,
        grad=grad,
        start=np.random.default_rng(0).normal(0, 0.1, N_DIM),
        epsilon=0.25,
        display_progress=False,
    )
    # warm up adaptation briefly
    for _ in range(20):
        chain.take_step()
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < REF_TIME_BUDGET:
        for _ in range(10):
            chain.take_step()
        n += 10
    dt = time.perf_counter() - t0
    return n / dt


def main():
    ours = measure_rebuild()
    ref = measure_reference()
    vs = ours / ref if np.isfinite(ref) and ref > 0 else None
    print(
        json.dumps(
            {
                "metric": "hmc_samples_per_sec_per_chip",
                "value": round(ours, 1),
                "unit": "samples/s (1000-chain HMC, 10-dim correlated Gaussian)",
                "vs_baseline": round(vs, 1) if vs is not None else None,
            }
        )
    )


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    # the axon backend can leave non-daemon threads alive; exit explicitly
    # so the driver never waits on a hung teardown
    os._exit(0)
