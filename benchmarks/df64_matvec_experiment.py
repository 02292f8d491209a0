"""Experiment: double-float (two-f32) compensated covariance matvec.

The sigma=0.01, N>=16k GP regime needs matvec accuracy beyond plain
float32 (BENCH_NOTES: the mixed-precision solver is floored at
~eps32 x kappa), and emulated f64 at that scale crashes this backend's
TPU worker. This experiment measures how far two-float techniques get
with f32-only device ops:

1. plain f32 block matvec (the current production path);
2. blocked-compensated summation: f32 block partials combined with
   two-sum (error-free addition) pairs — kills cross-block accumulation
   error;
3. hi/lo split products (Dekker-style): K and v split into high/low
   f32 parts, the cross terms accumulated separately — recovers product
   rounding as well.

Ground truth is the host numpy float64 matvec. Run on the TPU:
    python benchmarks/df64_matvec_experiment.py [n]

MEASURED RESULT (N=8192, TPU v5e): all three variants give an identical
max relative error of 1.2e-5 at identical cost (~31 ms) — i.e. the
accumulation and product rounding are NOT the bottleneck; the error is
entirely the float32 KERNEL ENTRIES (exp of the f32 distance),
eps32 x sqrt(N) accumulated entry noise. Conclusion for the sigma=0.01
large-N regime: compensated summation is useless here; the lever is
evaluating the kernel entries themselves in double-float (pair-arithmetic
d2 + exp inside a Pallas kernel), which would cost ~10-20 f32 VPU ops per
entry (~10x the exp) and bring entry noise to ~1e-14.
(Control: re-evaluating the host truth on f32-truncated inputs leaves
all three errors unchanged at 1.22e-5 — input truncation is excluded;
the noise is genuinely the device-side f32 d2/exp evaluation.)
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax import lax

from inference_tpu.ops.pairwise import sqexp_covariance

_HI = jax.lax.Precision.HIGHEST


def make_problem(n, d=2, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 10, size=(n, d))
    v = rng.normal(size=n) * 1e4  # alpha-scale values (y / sigma^2)
    return x, v


def host_truth(x, v):
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(axis=2)
    K = np.exp(-0.5 * d2)
    return K @ v


def two_sum(a, b):
    """Error-free transformation: a + b = s + e exactly (Knuth)."""
    s = a + b
    bb = s - a
    e = (a - bb) + (b - (s - bb))
    return s, e


def split_hi(a, bits=12):
    """Dekker split: a = hi + lo with hi carrying the top mantissa bits."""
    c = jnp.float32(2**bits + 1) * a
    hi = c - (c - a)
    return hi, a - hi


def plain_f32(x, v, block):
    n = x.shape[0]
    xb = x.reshape(n // block, block, -1)

    def one(b):
        return jnp.dot(sqexp_covariance(b, x, 1.0, jnp.ones(2, jnp.float32)), v, precision=_HI)

    return lax.map(one, xb).reshape(n)


def compensated(x, v, block):
    """Per-row blocked summation over column blocks, combined with two-sum."""
    n = x.shape[0]
    xb = x.reshape(n // block, block, -1)
    vb = v.reshape(n // block, block)

    def one_row_block(rb):
        # partials over column blocks: (n_col_blocks, block_rows)
        def col(cb_and_v):
            cb, vcb = cb_and_v
            K = sqexp_covariance(rb, cb, 1.0, jnp.ones(2, jnp.float32))
            return jnp.dot(K, vcb, precision=_HI)

        partials = lax.map(col, (xb, vb))  # (n_blocks, block)

        def combine(carry, p):
            s, e = carry
            s, e_new = two_sum(s, p)
            return (s, e + e_new), None

        (s, e), _ = lax.scan(
            combine, (jnp.zeros(rb.shape[0], jnp.float32),) * 2, partials
        )
        return s + e

    return lax.map(one_row_block, xb).reshape(n)


def split_products(x, v, block):
    """Hi/lo split of K and v: y = Khi vhi + (Khi vlo + Klo vhi), each
    term block-compensated. Recovers most product rounding too."""
    n = x.shape[0]
    xb = x.reshape(n // block, block, -1)
    v_hi, v_lo = split_hi(v)
    vb_hi = v_hi.reshape(n // block, block)
    vb_lo = v_lo.reshape(n // block, block)

    def one_row_block(rb):
        def col(args):
            cb, vh, vl = args
            K = sqexp_covariance(rb, cb, 1.0, jnp.ones(2, jnp.float32))
            K_hi, K_lo = split_hi(K)
            main = jnp.dot(K_hi, vh, precision=_HI)
            corr = jnp.dot(K_hi, vl, precision=_HI) + jnp.dot(
                K_lo, vh + vl, precision=_HI
            )
            return main, corr

        mains, corrs = lax.map(col, (xb, vb_hi, vb_lo))

        def combine(carry, mp):
            s, e = carry
            m, c = mp
            s, e_new = two_sum(s, m)
            return (s, e + e_new + c), None

        (s, e), _ = lax.scan(
            combine,
            (jnp.zeros(rb.shape[0], jnp.float32),) * 2,
            (mains, corrs),
        )
        return s + e

    return lax.map(one_row_block, xb).reshape(n)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    block = 512
    x, v = make_problem(n)
    truth = host_truth(x, v)
    scale = np.abs(truth).max()

    xd = jnp.asarray(x, jnp.float32)
    vd = jnp.asarray(v, jnp.float32)

    for name, fn in [
        ("plain f32", plain_f32),
        ("block-compensated", compensated),
        ("hi/lo split products", split_products),
    ]:
        jfn = jax.jit(fn, static_argnames="block")
        out = np.asarray(jfn(xd, vd, block=block))  # compile
        t0 = time.perf_counter()
        out = np.asarray(jfn(xd, vd, block=block))
        dt = time.perf_counter() - t0
        err = np.abs(out - truth).max() / scale
        print(f"{name:24s}: max rel err {err:.3e}   ({dt*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
