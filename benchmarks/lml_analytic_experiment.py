"""Analytic vs autodiff marginal-likelihood gradient on chip.

The round-4 flagship (N=16,384 LML value+gradient, 487 ms/eval) spends
~80% of its time in the blocked Cholesky's autodiff VJP (11.2 TFLOP/s —
BENCH_NOTES "Blocked vs XLA Cholesky crossover"). The gradient of the
LML w.r.t. the covariance matrix has the closed form
``Q = (alpha alpha^T - K^-1) / 2`` (R&W eq. 5.9; reference:
inference/gp/regression.py:544-567 computes exactly this on the host),
so the O(N^3) backward pass can instead be: one blocked triangular
INVERSE (``ops.linalg.blocked_tril_inverse``) + one triangular gram
product (``ops.linalg.tril_gram``) — pure HIGHEST-precision MXU matmuls
— with the hyperparameter pullback delegated to the assembly VJP (the
Pallas covariance kernel's custom backward). Same n^3 model flops as
Cholesky+VJP, but at matmul throughput; the forward factorisation can
also drop back to the XLA expander (the measured forward winner).

Measures, at N in {8192, 16384}:
  autodiff  — value_and_grad through blocked_cholesky(2048)  [today's auto]
  analytic  — expander forward + closed-form backward
and the max relative gradient disagreement between the two.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from inference_tpu.gp.covariance import SquaredExponential
from inference_tpu.ops.linalg import (
    add_diagonal,
    blocked_cholesky,
    blocked_tril_inverse,
    identity_like,
    tril_gram,
)

SIZES = (8192, 16384)
BLOCK = 2048


def make_data(n, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0.0, 10.0, size=(n, 2))
    y = (
        np.sin(x[:, 0]) * np.cos(0.5 * x[:, 1])
        + 0.1 * rng.normal(size=n)
    )
    sig = np.full(n, 0.1**2)
    return (
        jnp.asarray(x, jnp.float32),
        jnp.asarray(y, jnp.float32),
        jnp.asarray(sig, jnp.float32),
    )


def build_programs(cov):
    def assemble(theta, x, sig):
        return add_diagonal(cov.matrix(x, theta), sig)

    def lml_parts(K, y):
        L = jnp.linalg.cholesky(K)
        v = solve_triangular(L, y, lower=True)
        value = -0.5 * (v @ v) - jnp.log(jnp.diagonal(L)).sum()
        return value, L, v

    # ---- autodiff path (today's auto policy: blocked factor in the
    # gradient program) ----
    def lml_blocked(theta, x, y, sig):
        K = assemble(theta, x, sig)
        L = blocked_cholesky(K, block=BLOCK)
        v = solve_triangular(L, y, lower=True)
        return -0.5 * (v @ v) - jnp.log(jnp.diagonal(L)).sum()

    autodiff = jax.jit(jax.value_and_grad(lml_blocked))

    # ---- analytic path ----
    @jax.custom_vjp
    def lml_analytic(theta, x, y, sig):
        K = assemble(theta, x, sig)
        value, _, _ = lml_parts(K, y)
        return value

    def fwd(theta, x, y, sig):
        K = assemble(theta, x, sig)
        value, L, v = lml_parts(K, y)
        return value, (theta, x, y, sig, L, v)

    def bwd(res, g):
        theta, x, y, sig, L, v = res
        alpha = solve_triangular(L.T, v, lower=False)
        X = blocked_tril_inverse(L, block=BLOCK)
        iK = tril_gram(X, block=BLOCK)
        Q = 0.5 * (jnp.outer(alpha, alpha) - iK)
        _, pullback = jax.vjp(lambda th: assemble(th, x, sig), theta)
        (th_bar,) = pullback(Q)
        return (g * th_bar, None, None, None)

    lml_analytic.defvjp(fwd, bwd)
    analytic = jax.jit(jax.value_and_grad(lml_analytic))
    return autodiff, analytic


def timed(fn, args, reps=3):
    v, g = fn(*args)
    float(v)
    float(np.asarray(g).sum())
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        v, g = fn(*args)
        float(v)
        float(np.asarray(g).sum())
        best = min(best, time.perf_counter() - t0)
    return best, float(v), np.asarray(g)


def main():
    cov = SquaredExponential()
    theta = jnp.asarray(np.log([1.0, 1.2, 0.9]), jnp.float32)
    autodiff, analytic = build_programs(cov)
    for n in SIZES:
        x, y, sig = make_data(n)
        t_a, v_a, g_a = timed(autodiff, (theta, x, y, sig))
        t_b, v_b, g_b = timed(analytic, (theta, x, y, sig))
        rel = np.max(
            np.abs(g_a - g_b) / np.maximum(np.abs(g_a), 1e-30)
        )
        print(
            f"N={n:6d}: autodiff {t_a*1e3:8.1f} ms | analytic "
            f"{t_b*1e3:8.1f} ms | speedup {t_a/t_b:5.2f}x | "
            f"value diff {abs(v_a-v_b)/abs(v_a):.2e} | "
            f"grad max rel diff {rel:.2e}"
        )
        print(f"          grad_autodiff={g_a}  grad_analytic={g_b}")


if __name__ == "__main__":
    main()
