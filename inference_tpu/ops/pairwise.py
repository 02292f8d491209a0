"""Pairwise-distance and covariance-matrix assembly.

This replaces the reference's precomputed ``N x N x D`` displacement tensor
(reference: inference/gp/covariance.py:218-219) with on-the-fly assembly:

    D_ij = sum_k ((u_ik - v_jk) / l_k)^2
         = |u'_i|^2 + |v'_j|^2 - 2 u'_i . v'_j      (u' = u / l)

The cross term is a single matmul, which XLA tiles onto the MXU; memory is
O(N^2) (the kernel matrix itself) instead of O(N^2 D).

For large N on TPU a Pallas kernel fuses the exponential epilogue of the
squared-exponential covariance into the distance matmul, avoiding an extra
round-trip of the N x N distance matrix through HBM.
"""

from functools import partial

import jax
import jax.numpy as jnp

_TILE = 256  # pallas tile edge (multiple of the 128-lane requirement)
_PALLAS_MIN_N = 2048  # below this, plain XLA fusion is already optimal


def scaled_sq_distances(u, v, lengthscales):
    """
    Pairwise squared distances between rows of ``u`` (M, D) and ``v`` (N, D)
    after per-dimension scaling by ``lengthscales`` (D,). Returns (M, N).
    """
    u = jnp.atleast_2d(jnp.asarray(u))
    v = jnp.atleast_2d(jnp.asarray(v))
    ls = jnp.asarray(lengthscales)
    us = u / ls[None, :]
    vs = v / ls[None, :]
    uu = (us * us).sum(axis=1)
    vv = (vs * vs).sum(axis=1)
    cross = us @ vs.T
    # cancellation can leave tiny negative values (~ -1e-16); these are
    # harmless for the exp/power kernels applied downstream, and clamping
    # with max(d, 0) would corrupt second derivatives at d == 0 (jax
    # assigns the tie a 0.5 subgradient), so the raw value is returned
    return uu[:, None] + vv[None, :] - 2.0 * cross


def _sqexp_fallback(u, v, amplitude, lengthscales):
    d = scaled_sq_distances(u, v, lengthscales)
    return (amplitude**2) * jnp.exp(-0.5 * d)


def _sqexp_pallas(u, v, amplitude, lengthscales):
    """Tiled Pallas kernel: distance matmul + fused exp epilogue."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    u = jnp.asarray(u)
    v = jnp.asarray(v)
    m, d = u.shape
    n = v.shape[0]
    dtype = u.dtype

    us = (u / lengthscales[None, :]).astype(dtype)
    vs = (v / lengthscales[None, :]).astype(dtype)

    # pad rows to tile multiples (feature dim stays whole: D is small)
    mp = -(-m // _TILE) * _TILE
    np_ = -(-n // _TILE) * _TILE
    us_p = jnp.zeros((mp, d), dtype).at[:m].set(us)
    vs_p = jnp.zeros((np_, d), dtype).at[:n].set(vs)
    uu = (us_p * us_p).sum(axis=1, keepdims=True)           # (mp, 1)
    vv = (vs_p * vs_p).sum(axis=1, keepdims=True)           # (np, 1)

    amp_sq = jnp.asarray([[amplitude**2]], dtype)

    def kernel(us_ref, vs_ref, uu_ref, vv_ref, amp_ref, out_ref):
        cross = jnp.dot(
            us_ref[:], vs_ref[:].T, preferred_element_type=jnp.float32
        ).astype(dtype)
        dist = uu_ref[:] + vv_ref[:].T - 2.0 * cross
        out_ref[:] = amp_ref[0, 0] * jnp.exp(-0.5 * jnp.maximum(dist, 0.0))

    grid = (mp // _TILE, np_ // _TILE)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mp, np_), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE, d), lambda i, j: (i, 0)),
            pl.BlockSpec((_TILE, d), lambda i, j: (j, 0)),
            pl.BlockSpec((_TILE, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((_TILE, 1), lambda i, j: (j, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, _TILE), lambda i, j: (i, j)),
    )(us_p, vs_p, uu, vv, amp_sq)
    return out[:m, :n]


def sqexp_covariance(u, v, amplitude, lengthscales):
    """
    Squared-exponential covariance block
    ``A^2 exp(-0.5 sum_k ((u_ik - v_jk)/l_k)^2)``, using the fused Pallas
    kernel on TPU for large problems and plain XLA otherwise.
    """
    u = jnp.atleast_2d(jnp.asarray(u))
    v = jnp.atleast_2d(jnp.asarray(v))
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and u.shape[0] >= _PALLAS_MIN_N and v.shape[0] >= _PALLAS_MIN_N:
        return _sqexp_pallas(u, v, amplitude, jnp.asarray(lengthscales))
    return _sqexp_fallback(u, v, amplitude, jnp.asarray(lengthscales))
