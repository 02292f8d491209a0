"""Mixed-precision preconditioned conjugate gradients.

``jax.scipy.sparse.linalg.cg`` carries its residual by recursion; in
float32 at condition numbers ≳1e6 the recursive residual drifts from the
true one and the returned "solution" can be worse than the starting point
(observed on the small-noise GP systems in ``gp/large_scale.py``). This
solver keeps the expensive objects — vectors, the matvec, the
preconditioner — in float32, but:

- computes every scalar reduction (p·Ap, r·z, ‖r‖) in float64
  (elementwise-emulated f64 over an N-vector is cheap; it is the N×N f64
  *matvec programs* that are prohibitive on some backends), and
- recomputes the TRUE residual ``b - A x`` every ``restart_every``
  iterations, killing recursion drift outright.

This is the classic restarted mixed-precision PCG; combined with
``LargeScaleGP.refine()`` it extends float32 CG to condition numbers the
library's default solver cannot touch.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def mixed_pcg(matvec, b, M=None, tol=1e-6, maxiter=1000, restart_every=50):
    """
    Solve ``A x = b`` (A symmetric positive-definite, applied by
    ``matvec``) by preconditioned CG with float64 scalar recurrences and
    periodic true-residual restarts. Requires ``jax_enable_x64`` for the
    f64 scalars; vectors stay in ``b``'s dtype.

    Returns ``(x, info)`` with ``info = 0`` on convergence (mirroring the
    jax.scipy API shape; ``info`` is the final iteration count otherwise).
    """
    if not jax.config.read("jax_enable_x64"):
        raise ValueError(
            "mixed_pcg requires jax_enable_x64: without it the float64 "
            "scalar recurrences silently truncate to float32 and the "
            "solver loses exactly the precision it exists to provide"
        )
    if M is None:
        M = lambda v: v
    f64 = jnp.float64
    vdtype = b.dtype

    def dot64(u, v):
        return jnp.sum(u.astype(f64) * v.astype(f64))

    b_norm = jnp.sqrt(dot64(b, b))
    atol2 = (tol * b_norm) ** 2

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = M(r0)
    p0 = z0
    rz0 = dot64(r0, z0)

    def cond(s):
        i, x, r, z, p, rz, rr, ok = s
        return ok & (i < maxiter) & (rr > atol2)

    def body(s):
        i, x, r, z, p, rz, rr, ok = s
        Ap = matvec(p)
        pAp = dot64(p, Ap)
        # breakdown guard: a non-positive curvature in exact arithmetic is
        # impossible for SPD A; in float32 it signals total loss of
        # precision — stop with the current iterate
        ok = ok & (pAp > 0.0)
        alpha = jnp.where(pAp > 0.0, rz / pAp, 0.0)
        x = x + alpha.astype(vdtype) * p

        restart = (i % restart_every) == (restart_every - 1)

        def true_residual(_):
            return b - matvec(x)

        def recurrent_residual(_):
            return r - alpha.astype(vdtype) * Ap

        r = lax.cond(restart, true_residual, recurrent_residual, None)
        z = M(r)
        rz_new = dot64(r, z)
        rr = dot64(r, r)
        # after a true-residual restart the old direction (built from the
        # NOISY float32 recurrence) is no longer conjugate to the fresh
        # residual — reset to steepest descent. Measured on a kappa=1e6
        # SPD test: with the f32 matvec this reset is the difference
        # between a 7e-7 floor and outright divergence. (The opposite
        # holds in df64_pcg, whose matvec is accurate: there the refresh
        # is a tiny perturbation of the same Krylov process and the
        # direction must be KEPT — resetting wrecks convergence.)
        beta = jnp.where((rz != 0.0) & ~restart, rz_new / rz, 0.0)
        p = z + beta.astype(vdtype) * p
        return (i + 1, x, r, z, p, rz_new, rr, ok)

    init = (
        jnp.asarray(0, jnp.int32),
        x0,
        r0,
        z0,
        p0,
        rz0,
        dot64(r0, r0),
        jnp.asarray(True),
    )
    i, x, r, *_ = lax.while_loop(cond, body, init)
    rr = dot64(r, r)
    info = jnp.where(rr <= atol2, 0, i)
    return x, info


def df64_pcg(matvec64, b64, M=None, tol=1e-10, maxiter=2000, restart_every=50):
    """
    Preconditioned CG with **float64 iterate/residual vectors** and a
    double-float matvec: ``matvec64`` maps a *float32* vector to the
    float64 result of ``A v`` with ~1e-8 relative accuracy (e.g.
    ``ops.df64.sqexp_matvec_df64`` plus diagonal terms). This is the solver
    for the small-noise GP regime where ``mixed_pcg``'s float32 matvec
    noise (~1e-5 at N ~ 16k) exceeds the achievable residual:

    - x and r are float64 (elementwise f64 over N-vectors is cheap on TPU;
      it is N x N f64 *matvec programs* that are prohibitive),
    - search directions are applied through the matvec in float32 (a
      direction only needs eps32 relative accuracy),
    - every ``restart_every`` iterations the TRUE residual is recomputed
      as ``b - A x_hi - A x_lo`` with x split into a float32 pair, so the
      recurrence never drifts beyond the matvec's own ~1e-8 (the search
      direction and beta carry across the refresh — it is a perturbation
      of the same Krylov process, not a restart).

    Returns ``(x, info)`` with float64 ``x``; ``info = 0`` on convergence.
    """
    if not jax.config.read("jax_enable_x64"):
        raise ValueError(
            "df64_pcg requires jax_enable_x64 (float64 iterate vectors)"
        )
    if M is None:
        M = lambda v: v
    f32 = jnp.float32
    f64 = jnp.float64
    b64 = jnp.asarray(b64, f64)

    def true_residual(x):
        xh = x.astype(f32)
        xl = (x - xh.astype(f64)).astype(f32)
        return b64 - matvec64(xh) - matvec64(xl)

    def dot(u, v):
        return jnp.sum(u * v)

    b_norm = jnp.sqrt(dot(b64, b64))
    atol2 = (tol * b_norm) ** 2

    x0 = jnp.zeros_like(b64)
    r0 = b64
    z0 = M(r0.astype(f32)).astype(f64)
    p0 = z0
    rz0 = dot(r0, z0)

    def cond(s):
        i, x, r, z, p, rz, rr, ok = s
        return ok & (i < maxiter) & (rr > atol2)

    def body(s):
        i, x, r, z, p, rz, rr, ok = s
        Ap = matvec64(p.astype(f32))
        # the matvec consumed fl32(p): account for the truncation exactly
        # by treating the applied direction as fl32(p)
        p_applied = p.astype(f32).astype(f64)
        pAp = dot(p_applied, Ap)
        ok = ok & (pAp > 0.0)
        alpha = jnp.where(pAp > 0.0, rz / pAp, 0.0)
        x = x + alpha * p_applied

        restart = (i % restart_every) == (restart_every - 1)
        r = lax.cond(
            restart,
            lambda _: true_residual(x),
            lambda _: r - alpha * Ap,
            None,
        )
        z = M(r.astype(f32)).astype(f64)
        rz_new = dot(r, z)
        rr = dot(r, r)
        # beta kept across refreshes — see the note in mixed_pcg
        beta = jnp.where(rz != 0.0, rz_new / rz, 0.0)
        p = z + beta * p
        return (i + 1, x, r, z, p, rz_new, rr, ok)

    init = (
        jnp.asarray(0, jnp.int32),
        x0,
        r0,
        z0,
        p0,
        rz0,
        dot(r0, r0),
        jnp.asarray(True),
    )
    i, x, r, *_ = lax.while_loop(cond, body, init)
    rr = dot(r, r)
    info = jnp.where(rr <= atol2, 0, i)
    return x, info
