"""Leapfrog dataflow experiment for the batched HMC kernel.

The production kernel's leapfrog is a ``lax.fori_loop`` whose trip count
is TRACED (the reference's per-proposal +-10% step-count jitter,
reference: inference/mcmc/hmc/__init__.py:137): under vmap it lowers to a
``while_loop``, and every iteration's carry (theta, r — ~80 B/chain)
round-trips HBM. At 65k chains that is ~10 MB of carry traffic per
leapfrog step, ~0.5 GB per transition — plausibly the wall the headline
bench sits at (~37M samples/s, far below the VPU flop bound).

This experiment measures variants that make the trip count STATIC so XLA
can unroll and fuse across leapfrog iterations:

  A. baseline           — the production kernel (traced fori_loop)
  B. static+mask u=1    — static bound, per-chain jitter via masked
                          updates (identical step-count distribution)
  C/D/E. unroll=2/4/8   — same, unrolled
  F. shared-jitter      — one jittered count per transition shared by all
                          chains (traced scalar, no masking) for reference

Run on the real chip:  python benchmarks/hmc_leapfrog_experiment.py
"""

import time
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

N_DIM = 10
STEPS = 50
N_CHAINS = 65536
N_TRANSITIONS = 64
EPSILON = 0.25


def make_cov():
    rng = np.random.default_rng(42)
    A = rng.normal(size=(N_DIM, N_DIM)) / np.sqrt(N_DIM)
    return A @ A.T + np.eye(N_DIM)


class State(NamedTuple):
    theta: jnp.ndarray
    logp: jnp.ndarray
    key: jnp.ndarray


def build_variant(logp_fn, grad_fn, mode: str, unroll: int = 1):
    """A minimal duplicate-on-reject HMC transition (no adaptation — the
    adaptation state is identical across variants and its cost is
    negligible; this isolates the leapfrog dataflow)."""
    max_steps = int(STEPS * 1.1)

    def transition(state: State):
        key, k_mom, k_steps, k_acc = jax.random.split(state.key, 4)
        dtype = state.theta.dtype
        r0 = jax.random.normal(k_mom, state.theta.shape, dtype)
        h0 = 0.5 * (r0 @ r0) - state.logp

        u = jax.random.uniform(k_steps, dtype=dtype)
        n_steps = (STEPS * (1 + (u - 0.5) * 0.2)).astype(jnp.int32)

        t, r = state.theta, r0
        r_step = EPSILON

        if mode == "baseline":
            r = r + (0.5 * r_step) * grad_fn(t)

            def body(i, carry):
                t, r = carry
                t = t + EPSILON * r
                r = r + r_step * grad_fn(t)
                return t, r

            t, r = lax.fori_loop(0, n_steps - 1, body, (t, r))
            t = t + EPSILON * r
            r = r + (0.5 * r_step) * grad_fn(t)
        elif mode == "static":
            n_steps = jnp.minimum(n_steps, max_steps)
            r = r + (0.5 * r_step) * grad_fn(t)

            def body(i, carry):
                t, r = carry
                active = i < n_steps
                kick = jnp.where(i == n_steps - 1, 0.5, 1.0)
                t2 = t + EPSILON * r
                r2 = r + (kick * r_step) * grad_fn(t2)
                return (
                    jnp.where(active, t2, t),
                    jnp.where(active, r2, r),
                )

            t, r = lax.fori_loop(0, max_steps, body, (t, r), unroll=unroll)
        else:
            raise ValueError(mode)

        p = logp_fn(t)
        h = 0.5 * (r @ r) - p
        accept_prob = jnp.exp(h0 - h)
        accepted = (accept_prob >= 1.0) | (
            jax.random.uniform(k_acc, dtype=dtype) <= accept_prob
        )
        return State(
            theta=jnp.where(accepted, t, state.theta),
            logp=jnp.where(accepted, p, state.logp),
            key=key,
        ), accepted

    return transition


def shared_jitter_transition(logp_fn, grad_fn):
    """Variant F: ONE traced jittered count per transition, shared across
    the batch — the loop bound is a scalar so the batched while_loop has
    no masking waste, but it is still a while_loop."""

    def transition(state, n_steps):
        key, k_mom, k_acc = jax.random.split(state.key, 3)
        dtype = state.theta.dtype
        r0 = jax.random.normal(k_mom, state.theta.shape, dtype)
        h0 = 0.5 * jnp.sum(r0 * r0, -1) - state.logp

        t, r = state.theta, r0
        r = r + (0.5 * EPSILON) * grad_fn(t)

        def body(i, carry):
            t, r = carry
            t = t + EPSILON * r
            r = r + EPSILON * grad_fn(t)
            return t, r

        t, r = lax.fori_loop(0, n_steps - 1, body, (t, r))
        t = t + EPSILON * r
        r = r + (0.5 * EPSILON) * grad_fn(t)

        p = logp_fn(t)
        h = 0.5 * jnp.sum(r * r, -1) - p
        accept_prob = jnp.exp(h0 - h)
        accepted = (accept_prob >= 1.0) | (
            jax.random.uniform(k_acc, (state.theta.shape[0],), dtype)
            <= accept_prob
        )
        return State(
            theta=jnp.where(accepted[:, None], t, state.theta),
            logp=jnp.where(accepted, p, state.logp),
            key=key,
        ), accepted

    return transition


def main():
    icov = jnp.asarray(np.linalg.inv(make_cov()), jnp.float32)

    def logp(t):
        return -0.5 * t @ icov @ t

    grad = jax.grad(logp)

    rng = np.random.default_rng(0)
    starts = jnp.asarray(rng.normal(0, 0.1, (N_CHAINS, N_DIM)), jnp.float32)
    logp0 = jax.vmap(logp)(starts)
    key = jax.random.key(1)
    keys = jax.random.split(key, N_CHAINS)

    def run_batched(transition, n):
        step = jax.vmap(transition)

        @jax.jit
        def go(state):
            def body(s, _):
                s, acc = step(s)
                return s, acc.mean()

            return lax.scan(body, state, None, length=n)

        return go

    def timed(go, state):
        out_state, acc = go(state)
        # materialise (block_until_ready can return early on this backend)
        float(out_state.theta.sum())
        t0 = time.perf_counter()
        out_state, acc = go(state)
        a = float(acc.mean())
        float(out_state.theta.sum())
        dt = time.perf_counter() - t0
        return dt, a

    state = State(theta=starts, logp=logp0, key=keys)

    results = {}
    variants = [
        ("baseline", "baseline", 1),
        ("static_u1", "static", 1),
        ("static_u2", "static", 2),
        ("static_u4", "static", 4),
        ("static_u8", "static", 8),
    ]
    for name, mode, unroll in variants:
        tr = build_variant(logp, grad, mode, unroll)
        go = run_batched(tr, N_TRANSITIONS)
        dt, acc = timed(go, state)
        thru = N_CHAINS * N_TRANSITIONS / dt * acc
        results[name] = thru
        print(
            f"{name:12s}: {dt:7.3f} s  accept={acc:.3f}  "
            f"{thru/1e6:8.1f} M samples/s"
        )

    # variant F: shared jitter (batch-level transition, host-free)
    trF = shared_jitter_transition(lambda t: -0.5 * jnp.einsum(
        "np,pq,nq->n", t, icov, t), lambda t: -t @ icov)

    @jax.jit
    def goF(state, counts):
        def body(s, n):
            s, acc = trF(s, n)
            return s, acc.mean()

        return lax.scan(body, state, counts)

    counts = jnp.asarray(
        (STEPS * (1 + (rng.uniform(size=N_TRANSITIONS) - 0.5) * 0.2)).astype(
            np.int32
        )
    )
    stateF = State(theta=starts, logp=logp0, key=jax.random.key(1))
    outF, accF = goF(stateF, counts)
    float(outF.theta.sum())
    t0 = time.perf_counter()
    outF, accF = goF(stateF, counts)
    a = float(accF.mean())
    float(outF.theta.sum())
    dt = time.perf_counter() - t0
    thru = N_CHAINS * N_TRANSITIONS / dt * a
    results["shared_jit"] = thru
    print(
        f"{'shared_jit':12s}: {dt:7.3f} s  accept={a:.3f}  "
        f"{thru/1e6:8.1f} M samples/s"
    )

    base = results["baseline"]
    for k, v in results.items():
        print(f"  {k:12s} {v/base:5.2f}x")


if __name__ == "__main__":
    main()
