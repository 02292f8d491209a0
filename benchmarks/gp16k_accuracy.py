"""On-chip accuracy of the N=16k GP path vs float64 host truth.

BASELINE.md's north-star contract is evidenced in two directions:
- tests/test_reference_parity.py::test_gp_lml_parity_at_scale checks the
  float64 formulas against the reference at N=2048;
- this script measures what the CHIP actually delivers at N=16384 in its
  float32 working precision: LML error and training-solve (alpha) error
  against an exact float64 host computation, before and after
  LargeScaleGP's refine().

Run on the TPU:  python benchmarks/gp16k_accuracy.py [n]
Results are recorded in BENCH_NOTES.md.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp


def make_data(n, d=2, seed=0, sigma=0.1):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 10, size=(n, d))
    y = np.sin(x[:, 0]) * np.cos(x[:, 1]) + rng.normal(0, sigma, n)
    return x, y, np.full(n, sigma)


def host_truth(x, y, err, theta):
    """Exact float64 LML and alpha on the host (same model as
    GpRegressor with SquaredExponential + ConstantMean at fixed theta)."""
    mean_val, ln_a, *ln_ls = theta
    amp2 = np.exp(2.0 * ln_a)
    ls = np.exp(np.asarray(ln_ls))
    xs = x / ls[None, :]
    sq = (xs**2).sum(axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (xs @ xs.T)
    K = amp2 * np.exp(-0.5 * np.maximum(d2, 0.0))
    K[np.diag_indices_from(K)] += err**2 + 1e-12 * amp2
    L = np.linalg.cholesky(K)
    r = y - mean_val
    v = np.linalg.solve(L, r)
    lml = -0.5 * (v @ v) - np.log(np.diag(L)).sum()
    alpha = np.linalg.solve(L.T, v)
    return lml, alpha


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    x, y, err = make_data(n)
    theta = np.array([0.0, 0.0, 0.5, 0.5])

    t0 = time.perf_counter()
    lml64, alpha64 = host_truth(x, y, err, theta)
    print(f"host f64 truth: lml={lml64:.10f}  ({time.perf_counter()-t0:.0f} s)")

    from inference_tpu.gp import GpRegressor

    # explicit float32: under an x64-enabled process the default would be
    # (TPU-emulated) float64, which is unusable at this N
    gp = GpRegressor(x, y, y_err=err, hyperpars=theta, dtype="float32")
    lml32 = gp.marginal_likelihood(theta)
    rel = abs(lml32 - lml64) / abs(lml64)
    print(f"chip f32 LML:   {lml32:.10f}  rel err {rel:.3e}")

    a32 = np.asarray(gp.alpha, np.float64)
    a_err = np.abs(a32 - alpha64).max() / np.abs(alpha64).max()
    print(f"chip f32 alpha: max rel err {a_err:.3e}")

    from inference_tpu.gp import LargeScaleGP

    big = LargeScaleGP(
        x, y, err, hyperpars=theta[1:], mean_value=theta[0], solver="mixed",
        cg_tol=1e-7, dtype="float32",
    )
    big.refine(target=1e-9)
    ar = np.asarray(big.alpha64)[:n]
    r_err = np.abs(ar - alpha64).max() / np.abs(alpha64).max()
    print(
        f"LargeScaleGP mixed+refine alpha: max rel err {r_err:.3e} "
        f"(f64 residual {big.residual_norm_f64():.3e})"
    )


if __name__ == "__main__":
    main()
