"""Raw VPU op-throughput probe inside a Pallas TPU kernel.

The df64 ablation shows every kernel variant pinned at ~70 GFLOP/s of
f32 elementwise issue (~14 cycles per (8,128) vreg op) regardless of
dataflow shape. This measures the attainable ceiling directly: chains
of dependent vs independent mul/add ops on a (128, 128) f32 tile, no
broadcasts, no EFT structure.

Usage: python benchmarks/vpu_probe.py [n_ops] [n_chains]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_ops = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    variants = [1, 2, 4, 8]

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert float(jnp.ones(8).sum()) == 8.0
    print(f"backend: {jax.default_backend()}, ops/chain={n_ops}", flush=True)

    T = 128
    reps_grid = 512  # grid steps to amortise launch overhead

    def make(n_chains, mode="scalar"):
        def kernel(x_ref, o_ref, scratch):
            x = x_ref[:]
            chains = [x * jnp.float32(1.0 + 1e-6 * c) for c in range(n_chains)]
            c_mul = jnp.float32(0.9999999)
            c_add = jnp.float32(1e-7)
            if mode == "scalar":
                a = c_mul
                b = c_add
            elif mode == "vv":
                a = x * c_mul
                b = x * jnp.float32(1e-9)
            elif mode == "bcast":
                a = x[:, 0][:, None] * jnp.float32(1e-9) + c_mul
                b = x[0, :][None, :] * jnp.float32(1e-9)
            elif mode == "bcast_mat":
                scratch[:] = jnp.broadcast_to(
                    x[:, 0][:, None] * jnp.float32(1e-9) + c_mul, x.shape
                )
                a = scratch[:]
                b = x[0, :][None, :] * jnp.float32(1e-9)
            for _ in range(n_ops // 2):
                chains = [y * a for y in chains]
                chains = [y + b for y in chains]
            acc = chains[0]
            for y in chains[1:]:
                acc = acc + y
            o_ref[:] = acc

        return kernel

    x = jnp.asarray(np.random.default_rng(0).normal(size=(T, T)), jnp.float32)

    modes = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "scalar", "vv", "bcast", "bcast_mat"
    ]
    for mode in modes:
        for n_chains in variants:
            kernel = make(n_chains, mode)

            @jax.jit
            def f(x):
                return pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((T, T), jnp.float32),
                    grid=(reps_grid,),
                    in_specs=[pl.BlockSpec((T, T), lambda i: (0, 0))],
                    out_specs=pl.BlockSpec((T, T), lambda i: (0, 0)),
                    scratch_shapes=[pltpu.VMEM((T, T), jnp.float32)],
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("arbitrary",),
                    ),
                )(x)

            y = f(x)
            float(jnp.sum(y))
            t0 = time.perf_counter()
            reps = 10
            for _ in range(reps):
                y = f(x)
            float(jnp.sum(y))
            dt = (time.perf_counter() - t0) / reps
            total_ops = reps_grid * n_chains * n_ops * T * T
            print(
                f"  {mode:9s} chains={n_chains}: {dt*1e3:7.2f} ms  "
                f"{total_ops/dt/1e9:8.1f} GFLOP/s  "
                f"({dt*0.94e9/(total_ops/1024):.2f} cyc/vreg-op)",
                flush=True,
            )


if __name__ == "__main__":
    main()
