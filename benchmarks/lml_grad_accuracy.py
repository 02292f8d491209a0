"""Which float32 LML gradient is closer to float64 truth — autodiff
through the blocked Cholesky, or the analytic K^-1 backward?

The two chip paths disagree at the ~1% level in float32 at N=16,384
(benchmarks/lml_analytic_experiment.py); this measures both against a
host float64 evaluation of the same closed form (R&W eq. 5.8/5.9) so
the auto policy's accuracy cost (if any) is recorded, not guessed."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from benchmarks.lml_analytic_experiment import build_programs, make_data
from inference_tpu.gp.covariance import SquaredExponential

N = 8192


def host_f64_truth(theta, x, y, sig):
    """Float64 LML value + gradient by the reference's closed form."""
    import scipy.linalg as sla

    theta = np.asarray(theta, np.float64)
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    sig = np.asarray(sig, np.float64)
    amp2 = np.exp(2 * theta[0])
    ls = np.exp(theta[1:])
    d = (x[:, None, :] - x[None, :, :]) / ls[None, None, :]
    D2 = np.einsum("ijk,ijk->ij", d, d)
    K0 = amp2 * np.exp(-0.5 * D2)
    K = K0 + np.diag(sig)
    L = sla.cholesky(K, lower=True)
    v = sla.solve_triangular(L, y, lower=True)
    alpha = sla.solve_triangular(L.T, v, lower=False)
    value = -0.5 * v @ v - np.log(np.diag(L)).sum()
    iK = sla.cho_solve((L, True), np.eye(N))
    Q = np.outer(alpha, alpha) - iK
    # dK/dtheta0 = 2 K0; dK/dtheta_k = K0 * D2_k (per-dimension term)
    grads = [0.5 * np.sum(Q * (2 * K0))]
    for k in range(x.shape[1]):
        dk = (x[:, None, k] - x[None, :, k]) / ls[k]
        grads.append(0.5 * np.sum(Q * (K0 * dk * dk)))
    return value, np.asarray(grads)


def main():
    cov = SquaredExponential()
    theta = np.log([1.0, 1.2, 0.9]).astype(np.float32)
    x, y, sig = make_data(N)
    autodiff, analytic = build_programs(cov)
    _, g_auto = autodiff(jnp.asarray(theta), x, y, sig)
    _, g_ana = analytic(jnp.asarray(theta), x, y, sig)
    g_auto = np.asarray(g_auto, np.float64)
    g_ana = np.asarray(g_ana, np.float64)
    print("computing float64 host truth (O(N^3), minutes on one core)...")
    v64, g64 = host_f64_truth(theta, x, y, sig)
    rel = lambda g: np.max(np.abs(g - g64) / np.maximum(np.abs(g64), 1e-30))
    print(f"truth gradient      : {g64}")
    print(f"autodiff (blocked)  : {g_auto}  max rel err {rel(g_auto):.3e}")
    print(f"analytic (K^-1)     : {g_ana}  max rel err {rel(g_ana):.3e}")


if __name__ == "__main__":
    main()
