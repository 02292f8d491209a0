"""Parallel-tempering throughput (BASELINE config #3): multimodal
posterior, 8 temperature rungs, swap_interval=10 — steps/sec/rung.

The rebuild advances all rungs inside one vmapped compiled program with
host-side swap tests; the reference spawns one OS process per rung and
synchronises through pipes.

Usage: python benchmarks/tempering_bench.py [n_steps]
"""

import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TEMPS = [1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0, 128.0]


def time_rebuild(n_steps):
    import jax.numpy as jnp
    from inference_tpu.mcmc import GibbsChain, ParallelTempering

    def bimodal(t):
        x = t[0]
        return jnp.logaddexp(
            -0.5 * ((x + 4.0) / 0.5) ** 2,
            -0.5 * ((x - 4.0) / 0.5) ** 2 + jnp.log(0.5),
        )

    chains = [
        GibbsChain(
            bimodal,
            start=np.array([4.0]),
            widths=np.array([0.3]),
            temperature=T,
            display_progress=False,
            seed=i,
        )
        for i, T in enumerate(TEMPS)
    ]
    pt = ParallelTempering(chains)
    pt.advance(n_steps, swap_interval=10)  # warm-up (compiles chunk shapes)
    t0 = time.perf_counter()
    pt.advance(n_steps, swap_interval=10)
    dt = time.perf_counter() - t0
    pt.shutdown()
    return n_steps / dt


def time_reference(n_steps):
    mod = types.ModuleType("setuptools_scm")
    mod.get_version = lambda **k: "0.0.0"
    sys.modules.setdefault("setuptools_scm", mod)
    sys.path.insert(0, "/root/reference")
    try:
        from inference.mcmc import GibbsChain as RefGibbs
        from inference.mcmc import ParallelTempering as RefPT
    except Exception:
        return None

    def bimodal(t):
        x = t[0]
        a = -0.5 * ((x + 4.0) / 0.5) ** 2
        b = -0.5 * ((x - 4.0) / 0.5) ** 2 + np.log(0.5)
        return float(np.logaddexp(a, b))

    chains = [
        RefGibbs(
            bimodal,
            start=np.array([4.0]),
            widths=np.array([0.3]),
            temperature=T,
            display_progress=False,
        )
        for T in TEMPS
    ]
    pt = RefPT(chains)
    pt.advance(100, swap_interval=10)  # warm-up
    t0 = time.perf_counter()
    pt.advance(n_steps, swap_interval=10)
    dt = time.perf_counter() - t0
    pt.shutdown()
    return n_steps / dt


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    ours = time_rebuild(n_steps)
    print(f"rebuild:   {ours:10,.0f} steps/s/rung x {len(TEMPS)} rungs")
    ref = time_reference(min(n_steps, 1000))
    if ref:
        print(f"reference: {ref:10,.0f} steps/s/rung "
              f"({len(TEMPS)} worker processes)")
        print(f"ratio:     {ours / ref:8.1f}x")


if __name__ == "__main__":
    main()
