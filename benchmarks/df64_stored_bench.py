"""Stored-entries df64 matvec vs the fused kernel on the real chip.

The fused kernel pays ~190 flops/entry of pair-arithmetic d^2 + exp per
matvec; storing the entries once as a float32 pair (8 bytes/entry of
HBM) leaves ~38 flops/entry per matvec. This measures the precompute
cost, per-matvec speedup and accuracy at several tile sizes.

Usage: python benchmarks/df64_stored_bench.py [N]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    _sync(out)
    return (time.perf_counter() - t0) / reps, out


def _sync(out):
    import jax.numpy as jnp

    arrs = out if isinstance(out, tuple) else (out,)
    # materialise a scalar: block_until_ready alone can return early on
    # this backend
    float(sum(jnp.sum(a[..., -1]) for a in arrs))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16_384

    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    assert float(jnp.ones(8).sum()) == 8.0
    print(f"backend: {jax.default_backend()}, N={n}", flush=True)

    from inference_tpu.ops.df64 import (
        split_f64,
        sqexp_matvec_df64,
        _sqexp_entries_df64_pallas,
        _sqexp_stored_matmat_pallas,
    )

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 10, size=(n, 2)) / 0.7
    uh, ul = split_f64(x)
    v = rng.normal(size=n).astype(np.float32)
    uh_d, ul_d = jnp.asarray(uh), jnp.asarray(ul)
    v_d = jnp.asarray(v)

    t_fused, y_fused = timed(sqexp_matvec_df64, uh_d, ul_d, v_d)
    print(f"fused matvec: {t_fused*1e3:.1f} ms", flush=True)

    for tj, ti in ((128, 128), (256, 256), (512, 256), (256, 512)):
        try:
            t_pre, (Eh, El) = timed(
                _sqexp_entries_df64_pallas, uh_d, ul_d,
                interpret=False, tj=tj, ti=ti, reps=1,
            )
            t_mv, Y = timed(
                _sqexp_stored_matmat_pallas, Eh, El, v_d.reshape(n, 1),
                interpret=False, tj=tj, ti=ti,
            )
            err = float(
                jnp.max(jnp.abs(Y[:, 0] - y_fused)) / jnp.max(jnp.abs(y_fused))
            )
            print(
                f"tiles ({tj},{ti}): precompute {t_pre*1e3:.0f} ms, "
                f"stored matvec {t_mv*1e3:.1f} ms "
                f"({t_fused/t_mv:.1f}x), err vs fused {err:.1e}",
                flush=True,
            )
        except Exception as e:
            print(f"tiles ({tj},{ti}): FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # multi-RHS through the stored entries (variance-solve shape)
    V = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    try:
        Eh, El = _sqexp_entries_df64_pallas(uh_d, ul_d, interpret=False)
        t_mm, _ = timed(_sqexp_stored_matmat_pallas, Eh, El, V)
        print(f"stored matmat q=8: {t_mm*1e3:.1f} ms "
              f"({t_mm/8*1e3:.2f} ms/col)", flush=True)
    except Exception as e:
        print(f"stored matmat q=8 FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
