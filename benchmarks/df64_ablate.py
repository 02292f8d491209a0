"""Ablation timing for the fused df64 matvec kernel stages.

The tile sweep shows ~1.75 ns/entry regardless of tile shape, i.e. the
kernel is not grid-bound; at ~150 f32 flops/entry that is ~2% of the
VPU — something inside the per-entry dataflow costs far more than its
flop count. This times stripped-down kernel variants on the chip to
attribute the cycles:

  d2        pair d^2 only, write high word
  d2exp32   pair d^2 + PLAIN float32 exp intrinsic + f32 accumulate
  d2exp     pair d^2 + pair exp parts, write scale*qh only
  noexp     pair d^2 + accumulate with q := d2 words (skips exp)
  full      the real kernel

Usage: python benchmarks/df64_ablate.py [N]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192

    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    assert float(jnp.ones(8).sum()) == 8.0
    print(f"backend: {jax.default_backend()}, N={n}", flush=True)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from inference_tpu.ops import df64 as D

    tj = ti = 128
    d = 2

    def make(kind):
        def kernel(ujh, ujl, uih, uil, v_ref, out_ref, acc):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                acc[:] = jnp.zeros_like(acc)

            v = v_ref[:]
            if kind == "d2s":
                # register-pressure probe: the same pair chain on (8, ti)
                # sublane slices so ~10 live temporaries fit in ~10 vregs
                two = jnp.float32(2.0)
                for s0 in range(0, tj, 8):
                    d2h = jnp.zeros((8, ti), jnp.float32)
                    d2e = jnp.zeros((8, ti), jnp.float32)
                    for k in range(d):
                        ah = ujh[s0 : s0 + 8, k][:, None]
                        al = ujl[s0 : s0 + 8, k][:, None]
                        bh = uih[:, k][None, :]
                        bl = uil[:, k][None, :]
                        s, e = D.two_sum(ah, -bh)
                        dl = e + (al - bl)
                        hh, hl = D.veltkamp_split(s)
                        p = s * s
                        pe = ((hh * hh - p) + two * (hh * hl)) + hl * hl
                        pe = pe + two * (s * dl)
                        d2h, ae = D.two_sum(d2h, p)
                        d2e = d2e + (ae + pe)
                    acc[s0 : s0 + 8] = acc[s0 : s0 + 8] + (
                        d2h + d2e * v[s0 : s0 + 8]
                    )
            elif kind == "d2b":
                # explicit broadcasts before the EFT chain
                d2h = jnp.zeros((tj, ti), jnp.float32)
                d2e = jnp.zeros((tj, ti), jnp.float32)
                two = jnp.float32(2.0)
                for k in range(d):
                    ah = jnp.broadcast_to(ujh[:, k][:, None], (tj, ti))
                    al = jnp.broadcast_to(ujl[:, k][:, None], (tj, ti))
                    bh = jnp.broadcast_to(uih[:, k][None, :], (tj, ti))
                    bl = jnp.broadcast_to(uil[:, k][None, :], (tj, ti))
                    s, e = D.two_sum(ah, -bh)
                    dl = e + (al - bl)
                    hh, hl = D.veltkamp_split(s)
                    p = s * s
                    pe = ((hh * hh - p) + two * (hh * hl)) + hl * hl
                    pe = pe + two * (s * dl)
                    d2h, ae = D.two_sum(d2h, p)
                    d2e = d2e + (ae + pe)
                acc[:] = acc[:] + d2h + d2e * v
            else:
                d2h, d2e = D._tile_sq_distance(ujh, ujl, uih, uil, d, tj, ti)
            if kind == "d2":
                acc[:] = acc[:] + d2h + d2e * v
            elif kind == "d2exp32":
                e = jnp.exp(-0.5 * d2h)
                acc[:] = acc[:] + e * v
            elif kind == "d2exp":
                scale, qh, ql = D.df_exp_neg_parts(-0.5 * d2h, -0.5 * d2e)
                acc[:] = acc[:] + scale * qh + ql * v
            elif kind == "noexp":
                # full accumulate dataflow with fake exp parts
                scale, qh, ql = jnp.ones_like(d2h), d2h, d2e
                tvh, tvl = D.df_mul_f32(qh, ql, v)
                s, se = D.two_sum(jnp.broadcast_to(v, tvh.shape), tvh)
                ph = s * scale
                pe = (se + tvl) * scale
                a_h, ae = D.two_sum(acc[:], ph)
                acc[:] = a_h + (ae + pe)

            @pl.when(j == pl.num_programs(1) - 1)
            def _():
                out_ref[:] = acc[: out_ref.shape[0]]

        return kernel

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 10, size=(n, d))
    uh, ul = D.split_f64(x)
    v = rng.normal(size=n).astype(np.float32)
    uh_d, ul_d = jnp.asarray(uh), jnp.asarray(ul)
    v_d = jnp.asarray(v.reshape(n, 1))

    def run(kind):
        kernel = make(kind)

        @jax.jit
        def f_inner(uh_d, ul_d, v_d):
            with D._x64_off_ctx():
                return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((n // ti * 8, ti), jnp.float32),
                grid=(n // ti, n // tj),
                in_specs=[
                    pl.BlockSpec((tj, d), lambda i, j: (j, 0)),
                    pl.BlockSpec((tj, d), lambda i, j: (j, 0)),
                    pl.BlockSpec((ti, d), lambda i, j: (i, 0)),
                    pl.BlockSpec((ti, d), lambda i, j: (i, 0)),
                    pl.BlockSpec((tj, 1), lambda i, j: (j, 0)),
                ],
                out_specs=pl.BlockSpec((8, ti), lambda i, j: (i, 0)),
                scratch_shapes=[pltpu.VMEM((tj, ti), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024,
                    dimension_semantics=("parallel", "arbitrary"),
                ),
                interpret=False,
            )(uh_d, ul_d, uh_d, ul_d, v_d)

        f = lambda: f_inner(uh_d, ul_d, v_d)
        y = f()
        float(jnp.sum(y))
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            y = f()
        float(jnp.sum(y))
        dt = (time.perf_counter() - t0) / reps
        print(
            f"  {kind:9s}: {dt*1e3:7.1f} ms ({dt/n**2*1e9:.3f} ns/entry)",
            flush=True,
        )

    kinds = sys.argv[2].split(",") if len(sys.argv) > 2 else (
        "d2", "d2b", "d2exp32", "d2exp", "noexp"
    )
    for kind in kinds:
        run(kind)

    # the real matvec for reference
    y = D._sqexp_matvec_df64_pallas(uh_d, ul_d, jnp.asarray(v), interpret=False)
    float(jnp.sum(y))
    t0 = time.perf_counter()
    for _ in range(3):
        y = D._sqexp_matvec_df64_pallas(
            uh_d, ul_d, jnp.asarray(v), interpret=False
        )
    float(jnp.sum(y))
    dt = (time.perf_counter() - t0) / 3
    print(f"  full     : {dt*1e3:7.1f} ms ({dt/n**2*1e9:.3f} ns/entry)", flush=True)


if __name__ == "__main__":
    main()
