"""Experiment: pair-accurate d^2 via error-free integer-word MXU matmuls.

The fused df64 kernels are pinned at ~1.7 ns/entry by the VPU
pair-arithmetic d^2 stage (see ROADMAP Deferred #1 — flop cuts, tiling,
ILP restructurings all measured no better). This experiment moves the
d^2 cross term to the MXU with an Ozaki-style ERROR-FREE split:

- each scaled coordinate is decomposed into NW=7 fixed-point words
  q_k * 2^(s-7(k+1)) with q_k integer, |q_k| <= 64 (s a global exponent
  from max|u|, known at build time);
- the cross term u_i . u_j = sum over scale classes c = a+b of EXACT
  matmuls: word products are integers <= 4096 and class sums are
  integers <= d*(c+1)*4096 < 2^24, so even the MXU's bf16-operand
  f32-accumulate path computes them EXACTLY (integers this small are
  exact in bf16, and f32 accumulation of integers < 2^24 is exact);
- the per-tile VPU work collapses to a short pair combine (4 two-sums +
  a plain tail) instead of the ~30-flop/dim serial error-free-transform
  chain, and the exp/accumulate stages are unchanged.

Accuracy: the word residual is 2^(s-49) per coordinate and all kept
class sums are exact, so |d2_words - d2_exact| ~ 1e-12 ABSOLUTE —
below the fused kernel's ~3e-10 relative target (validated standalone:
5.3e-12 at n=512, d=2, domain [0,10]).

Usage: python benchmarks/df64_mxu_d2_experiment.py [n ...]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

NW = 7     # fixed-point words per coordinate
BITS = 7   # magnitude bits per word

_TJ = 128
_TI = 128
_CHUNKS = 4


def build_words(u64):
    """(Wq, s): Wq is (n, NW*d) float32 holding the integer words
    word-major (columns [k*d:(k+1)*d] = word k of every dimension)."""
    n, d = u64.shape
    s = int(np.ceil(np.log2(np.abs(u64).max() + 1e-300))) + 1
    r = np.asarray(u64, np.float64).copy()
    cols = []
    for k in range(NW):
        scale = 2.0 ** (s - BITS * (k + 1))
        q = np.rint(r / scale)
        cols.append(q.astype(np.float32))
        r -= q * scale
    Wq = np.concatenate(cols, axis=1)  # (n, NW*d)
    return Wq, s


def build_norms(u64):
    """float32 pair of -0.5 |u|^2 (host f64, split exactly)."""
    m = -0.5 * (np.asarray(u64, np.float64) ** 2).sum(axis=1)
    nh = m.astype(np.float32)
    nl = (m - nh.astype(np.float64)).astype(np.float32)
    return nh, nl


def _matvec_mxu_kernel(d: int, s: int, tj: int, ti: int, chunks: int = _CHUNKS):
    from inference_tpu.ops.df64 import (
        _df_mul_f32_m,
        _exp_parts_m,
        _tree_pair_reduce,
        _two_sum_m,
        two_sum,
    )
    from jax.experimental import pallas as pl

    cs = tj // chunks
    scales = [
        np.float32(2.0 ** (2 * s - BITS * (c + 2))) for c in range(NW)
    ]

    def kernel(
        wj_ref, njh_ref, njl_ref, wi_ref, nih_ref, nil_ref, v_ref,
        out_hi_ref, out_lo_ref, acc_hi, acc_lo,
    ):
        j = pl.program_id(1)
        n_j = pl.num_programs(1)

        @pl.when(j == 0)
        def _():
            acc_hi[:] = jnp.zeros_like(acc_hi)
            acc_lo[:] = jnp.zeros_like(acc_lo)

        # class-c cross terms: EXACT matmuls of integer-valued words
        # (A = words 0..c of the reduction side, contiguous columns;
        #  B = words c..0 of the output side, reversed concat)
        wj = wj_ref[...]
        wi = wi_ref[...]
        C = []
        for c in range(NW):
            A = wj[:, : (c + 1) * d]
            B = jnp.concatenate(
                [wi[:, a * d : (a + 1) * d] for a in range(c, -1, -1)],
                axis=1,
            )
            C.append(jax.lax.dot_general(
                A, B, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))

        # -0.5 d^2 = (-0.5|u_j|^2) + (-0.5|u_i|^2) + sum_c C_c * k_c,
        # combined as a short pair chain: the three leading terms and
        # classes 0-2 carry error words; classes >= 3 are < 2^-21 of
        # the leading scale and ride a plain-f32 tail
        Njh = jnp.broadcast_to(njh_ref[...], (tj, ti))
        Nih = jnp.broadcast_to(nih_ref[...], (tj, ti))
        s1, e1 = two_sum(Njh, Nih)
        s2, e2 = two_sum(s1, C[0] * scales[0])
        s3, e3 = two_sum(s2, C[1] * scales[1])
        s4, e4 = two_sum(s3, C[2] * scales[2])
        tail = C[3] * scales[3]
        for c in range(4, NW):
            tail = tail + C[c] * scales[c]
        AH = s4
        AL = (
            (njl_ref[...] + nil_ref[...])
            + ((e1 + e2) + (e3 + e4))
            + tail
        )

        AHc = tuple(AH[c * cs : (c + 1) * cs] for c in range(chunks))
        ALc = tuple(AL[c * cs : (c + 1) * cs] for c in range(chunks))
        SC, QH, QL = _exp_parts_m(AHc, ALc)

        V = tuple(v_ref[c * cs : (c + 1) * cs] for c in range(chunks))
        TVH, TVL = _df_mul_f32_m(QH, QL, V)
        VB = tuple(
            jnp.broadcast_to(v, tvh.shape) for v, tvh in zip(V, TVH)
        )
        S, SE = _two_sum_m(VB, TVH)
        PH = tuple(x * sc for x, sc in zip(S, SC))
        PE = tuple((se + tvl) * sc for se, tvl, sc in zip(SE, TVL, SC))
        ACC = tuple(acc_hi[c * cs : (c + 1) * cs] for c in range(chunks))
        AH2, AE2 = _two_sum_m(ACC, PH)
        for c in range(chunks):
            lo = acc_lo[c * cs : (c + 1) * cs]
            acc_hi[c * cs : (c + 1) * cs] = AH2[c]
            acc_lo[c * cs : (c + 1) * cs] = lo + (AE2[c] + PE[c])

        @pl.when(j == n_j - 1)
        def _():
            rh, rl = _tree_pair_reduce(acc_hi[:], acc_lo[:])
            out_hi_ref[:] = rh
            out_lo_ref[:] = rl

    return kernel


@functools.partial(
    jax.jit, static_argnames=("d", "s", "interpret", "tj", "ti")
)
def _matvec_mxu_pallas(Wq, nh, nl, v, d, s, interpret=False, tj=_TJ, ti=_TI):
    from inference_tpu.ops.df64 import _x64_off_ctx
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = Wq.shape[0]
    n_j = n // tj
    n_i = n // ti
    kernel = _matvec_mxu_kernel(d, s, tj, ti)
    nh_row = nh.reshape(1, n)
    nl_row = nl.reshape(1, n)
    with _x64_off_ctx():
        out_hi, out_lo = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((n_i * 8, ti), jnp.float32),
                jax.ShapeDtypeStruct((n_i * 8, ti), jnp.float32),
            ),
            grid=(n_i, n_j),
            in_specs=[
                pl.BlockSpec((tj, NW * d), lambda i, j: (j, 0)),
                pl.BlockSpec((tj, 1), lambda i, j: (j, 0)),
                pl.BlockSpec((tj, 1), lambda i, j: (j, 0)),
                pl.BlockSpec((ti, NW * d), lambda i, j: (i, 0)),
                pl.BlockSpec((1, ti), lambda i, j: (0, i)),
                pl.BlockSpec((1, ti), lambda i, j: (0, i)),
                pl.BlockSpec((tj, 1), lambda i, j: (j, 0)),
            ],
            out_specs=(
                pl.BlockSpec((8, ti), lambda i, j: (i, 0)),
                pl.BlockSpec((8, ti), lambda i, j: (i, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((tj, ti), jnp.float32),
                pltpu.VMEM((tj, ti), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(
            Wq,
            nh.reshape(n, 1),
            nl.reshape(n, 1),
            Wq,
            nh_row,
            nl_row,
            v.reshape(n, 1),
        )
    ph = out_hi.reshape(n_i, 8, ti).astype(jnp.float64)
    plo = out_lo.reshape(n_i, 8, ti).astype(jnp.float64)
    return (ph + plo).sum(axis=1).reshape(n)


def sqexp_matvec_mxu(u64, v, interpret=None):
    """Reference-entry point for the experiment: y = E v with
    E_ij = exp(-0.5 ||u_i - u_j||^2), words built on the host."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Wq, s = build_words(u64)
    nh, nl = build_norms(u64)
    d = u64.shape[1]
    return _matvec_mxu_pallas(
        jnp.asarray(Wq), jnp.asarray(nh), jnp.asarray(nl),
        jnp.asarray(v, jnp.float32), d, s, interpret=interpret,
    )


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [8192, 16384]
    print(f"backend: {jax.default_backend()}", flush=True)

    from inference_tpu.ops.df64 import split_f64, sqexp_matvec_df64

    for n in sizes:
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 10, size=(n, 2))
        uh, ul = split_f64(x)
        u64 = uh.astype(np.float64) + ul.astype(np.float64)
        v = rng.normal(size=n).astype(np.float32)

        y_mxu = np.asarray(sqexp_matvec_mxu(u64, v))
        y_vpu = np.asarray(
            sqexp_matvec_df64(jnp.asarray(uh), jnp.asarray(ul), v)
        )
        # float64 host truth (blocked)
        y64 = np.zeros(n)
        B = 2048
        for i0 in range(0, n, B):
            blk = slice(i0, min(i0 + B, n))
            d2 = (
                (u64[blk, None, :] - u64[None, :, :]) ** 2
            ).sum(-1)
            y64[blk] = np.exp(-0.5 * d2) @ v.astype(np.float64)
        scale = np.abs(y64).max()
        print(
            f"n={n}: mxu rel err {np.abs(y_mxu - y64).max() / scale:.2e}, "
            f"vpu rel err {np.abs(y_vpu - y64).max() / scale:.2e}",
            flush=True,
        )

        if jax.default_backend() == "tpu":
            for name, fn in (
                ("mxu", lambda: sqexp_matvec_mxu(u64, v)),
                ("vpu", lambda: sqexp_matvec_df64(
                    jnp.asarray(uh), jnp.asarray(ul), v)),
            ):
                fn()  # warm
                t0 = time.perf_counter()
                reps = 3
                for _ in range(reps):
                    y = fn()
                float(jnp.asarray(y).sum())
                dt = (time.perf_counter() - t0) / reps
                print(
                    f"  {name}: {dt * 1e3:7.1f} ms "
                    f"({dt / n**2 * 1e9:.3f} ns/entry)",
                    flush=True,
                )


if __name__ == "__main__":
    main()
