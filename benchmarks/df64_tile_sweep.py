"""Tile-size sweep for the df64 pair-arithmetic matvec kernel.

Hypothesis (ROADMAP #1): the kernel is grid-overhead-bound, not
VPU-bound — at N=16,384 the default (128, 128) tiles give a 16,384-step
grid at ~25 us/step of measured per-step overhead (~0.4 s of the 0.70 s
total). Larger tiles shrink the grid quadratically while the pair
dataflow per entry is unchanged.

Usage: python benchmarks/df64_tile_sweep.py [N]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16_384

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    assert float(jnp.ones(8).sum()) == 8.0
    print(f"backend: {jax.default_backend()}, N={n}", flush=True)

    from inference_tpu.ops.df64 import split_f64, _sqexp_matvec_df64_pallas

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 10, size=(n, 2))
    uh, ul = split_f64(x)
    v = rng.normal(size=n).astype(np.float32)

    # float64 truth on host, row-chunked: the (N, N, D) broadcast form is
    # ~4 GB at N=16k and OOMs at 32k+
    u64 = uh.astype(np.float64) + ul.astype(np.float64)
    v64 = v.astype(np.float64)
    truth = np.empty(n)
    for lo in range(0, n, 2048):
        hi = min(lo + 2048, n)
        d2 = ((u64[lo:hi, None, :] - u64[None, :, :]) ** 2).sum(-1)
        truth[lo:hi] = np.exp(-0.5 * d2) @ v64
    tnorm = np.abs(truth).max()

    uh_d, ul_d, v_d = jnp.asarray(uh), jnp.asarray(ul), jnp.asarray(v)

    for tj, ti in [
        (128, 128), (256, 128), (128, 256), (256, 256),
        (512, 256), (256, 512), (512, 512), (1024, 512),
    ]:
        if n % tj or n % ti:
            continue
        try:
            f = lambda: _sqexp_matvec_df64_pallas(
                uh_d, ul_d, v_d, interpret=False, tj=tj, ti=ti
            )
            y = np.asarray(f())  # compile + correctness
            err = np.abs(y - truth).max() / tnorm
            t0 = time.perf_counter()
            reps = 3
            acc = 0.0
            for _ in range(reps):
                acc += float(np.asarray(f()).sum())
            dt = (time.perf_counter() - t0) / reps
            steps = (n // tj) * (n // ti)
            print(
                f"  tj={tj:5d} ti={ti:4d}: {dt*1e3:7.1f} ms  "
                f"({dt/n**2*1e9:.3f} ns/entry, {steps} grid steps)  "
                f"rel err {err:.2e}",
                flush=True,
            )
        except Exception as e:
            print(f"  tj={tj:5d} ti={ti:4d}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)


if __name__ == "__main__":
    main()
