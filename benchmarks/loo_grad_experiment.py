"""LOO-likelihood gradient program: can the blocked triangular
inverse beat autodiff through cho_solve-of-identity?

The LOO objective (R&W eq. 5.10-5.12; reference:
inference/gp/regression.py:468-526) needs the FULL K^-1 in its forward
pass (per-point LOO variances are 1/diag(K^-1)). Today's auto policy
computes it as ``cho_solve((L, True), I)`` under autodiff with the
blocked factor. This measures replacing that with
``tril_gram(blocked_tril_inverse(L))`` — explicit-matmul inversion,
autodiff through plain matmuls — under both factorisations."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_solve

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
    y = np.sin(x[:, 0]) * np.cos(0.5 * x[:, 1]) + 0.1 * rng.normal(size=n)
    return (
        jnp.asarray(x, jnp.float32),
        jnp.asarray(y, jnp.float32),
        jnp.full(n, 0.1**2, jnp.float32),
    )


def build(cov, chol, inverse):
    def loo(theta, x, y, sig):
        K = add_diagonal(cov.matrix(x, theta), sig)
        L = chol(K)
        if inverse == "cho_solve":
            iK = cho_solve((L, True), identity_like(L))
        else:
            iK = tril_gram(
                blocked_tril_inverse(L, block=BLOCK), block=BLOCK
            )
        alpha = iK @ y
        var = 1.0 / jnp.diagonal(iK)
        return -0.5 * (var * alpha**2 + jnp.log(var)).sum()

    return jax.jit(jax.value_and_grad(loo))


def timed(fn, args, reps=3):
    v, g = fn(*args)
    float(v); float(np.asarray(g).sum())
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        v, g = fn(*args)
        float(v); float(np.asarray(g).sum())
        best = min(best, time.perf_counter() - t0)
    return best, float(v), np.asarray(g)


def main():
    cov = SquaredExponential()
    theta = jnp.asarray(np.log([1.0, 1.2, 0.9]), jnp.float32)
    blocked = lambda K: blocked_cholesky(K, block=BLOCK)
    variants = [
        ("blocked+cho_solve", build(cov, blocked, "cho_solve")),
        ("blocked+tril_inv", build(cov, blocked, "tril")),
        ("expander+tril_inv", build(cov, jnp.linalg.cholesky, "tril")),
    ]
    for n in SIZES:
        args = (theta,) + make_data(n)
        results = {}
        for name, fn in variants:
            try:
                dt, v, g = timed(fn, args)
                results[name] = (dt, v, g)
                print(f"N={n}: {name:20s} {dt*1e3:8.1f} ms  value={v:.2f}")
            except Exception as e:
                print(f"N={n}: {name:20s} FAILED {type(e).__name__}")
            sys.stdout.flush()
        if len(results) > 1:
            names = list(results)
            g0 = results[names[0]][2]
            for nm in names[1:]:
                rel = np.max(np.abs(results[nm][2] - g0)
                             / np.maximum(np.abs(g0), 1e-30))
                print(f"      grad rel diff {names[0]} vs {nm}: {rel:.2e}")


if __name__ == "__main__":
    main()
