"""Compiled No-U-Turn sampler kernel (beyond the reference).

The reference has no NUTS implementation — its gradient-based sampler is
plain HMC with a fixed, jittered leapfrog step count (reference:
inference/mcmc/hmc/__init__.py:127-194). NUTS removes the trajectory-length
tuning parameter entirely, which matters at scale: a batched run cannot
hand-tune ``steps`` per posterior.

This is the *iterative* tree-building formulation (fixed ``max_depth``,
no recursion), chosen because recursion cannot compile under ``jit``:

- the doubling loop is a bounded ``lax.while_loop``; each doubling
  integrates ``2^depth`` leapfrog steps in a uniformly chosen direction;
- inside a doubling, U-turn checks for every complete dyadic subtree are
  performed against a fixed ``(max_depth + 1)``-slot checkpoint buffer:
  leaf ``i`` is written to every level ``j`` with ``i % 2^j == 0`` (a
  vectorised masked write), and after leaf ``i`` the levels with
  ``(i + 1) % 2^j == 0`` compare the leaf against their checkpoint — the
  exact set of subtree (start, end) pairs the recursive formulation checks;
- the proposal is drawn by progressive multinomial sampling within each
  new subtree, and the subtree winner replaces the trajectory candidate
  with probability ``min(1, exp(lse_new - lse_traj))`` (biased progressive
  sampling), so no slice variable is needed;
- step size adapts with the same branchless ``AdaptiveScale`` machinery
  as the HMC kernel, driven by the mean Metropolis statistic
  ``mean(min(1, exp(H0 - H_leaf)))`` over every leaf visited, with the
  standard NUTS target of 0.8.

Everything is fixed-shape, so the step vmaps over thousands of chains
(``ChainArray("nuts", ...)``) and shards over device meshes. Under vmap a
``while_loop`` runs until every lane finishes; lanes that stop doubling
early are masked, which is the standard cost of batched NUTS.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .common import AdaptiveScale, init_adaptive_scale, submit_accept_prob
from .hmc import (
    EPS_CHK_INT,
    EPS_GROWTH,
    EPS_VAR_FLOOR,
    EPS_POWER,
    EPS_MIN_ADJ,
    EPS_MAX_ADJ,
)

# step-size adaptation: NUTS targets the canonical 0.8 acceptance statistic;
# the remaining constants are imported from (shared with) the HMC kernel
NUTS_EPS_TARGET = 0.8


class NutsState(NamedTuple):
    theta: jnp.ndarray        # (P,) current position
    logp: jnp.ndarray         # () tempered log-probability at theta
    grad: jnp.ndarray         # (P,) tempered gradient at theta (cached so a
                              # transition starts without re-evaluating it;
                              # tempering swaps re-scale it like ``logp``)
    eps: AdaptiveScale        # step-size adaptation state
    key: jnp.ndarray          # PRNG key
    divergences: jnp.ndarray  # () int32 cumulative divergent transitions
    inv_temp: jnp.ndarray    # () inverse temperature (traced: rungs can be
                              # batched over a vmapped/sharded axis)


class NutsOutput(NamedTuple):
    theta: jnp.ndarray           # (P,)
    logp: jnp.ndarray            # ()
    leapfrog_steps: jnp.ndarray  # () int32 — leapfrog steps this transition
    tree_depth: jnp.ndarray     # () int32 — doublings performed
    epsilon: jnp.ndarray         # () step size after this transition
    divergent: jnp.ndarray       # () bool — transition hit a divergence


def init_nuts_state(
    theta0, logp0, epsilon, key, inv_temp=1.0, grad0=None
) -> NutsState:
    """``grad0`` is the *tempered* gradient ``inv_temp * d(logp)/d(theta)``
    at ``theta0`` — required, since the step starts integrating from the
    cached value rather than re-evaluating it every transition."""
    if grad0 is None:
        raise ValueError(
            "init_nuts_state requires grad0 (the tempered gradient of the "
            "log-posterior at theta0)"
        )
    theta0 = jnp.asarray(theta0)
    return NutsState(
        theta=theta0,
        logp=jnp.asarray(logp0, theta0.dtype),
        grad=jnp.asarray(grad0, theta0.dtype).reshape(theta0.shape),
        eps=init_adaptive_scale(
            jnp.asarray(epsilon, theta0.dtype), EPS_CHK_INT
        ),
        key=key,
        divergences=jnp.asarray(0, jnp.int32),
        inv_temp=jnp.asarray(inv_temp, theta0.dtype),
    )


def make_nuts_step(
    logp_fn,
    grad_fn=None,
    *,
    max_depth: int = 10,
    delta_max: float = 1000.0,
    mass_velocity=None,
    mass_sample=None,
):
    """
    Build the compiled single-transition NUTS step.

    :param logp_fn: traceable ``theta -> log-probability`` (untempered).
    :param grad_fn: optional gradient of ``logp_fn``; when omitted the
        value and gradient of each leaf are fused into one
        ``jax.value_and_grad`` evaluation (the fast path for traceable
        posteriors). Supply it for host-callback posteriors, where
        autodiff cannot see through the callback.
    :param max_depth: maximum number of trajectory doublings (the longest
        trajectory is ``2^max_depth - 1`` leapfrog steps).
    :param delta_max: energy-error threshold beyond which a leaf is
        declared divergent and the trajectory stops.
    :param mass_velocity: ``r -> velocity`` map (inverse-mass application).
    :param mass_sample: ``(key, dtype) -> momentum sample``.
    """
    if mass_velocity is None:
        mass_velocity = lambda r: r
    unit_momentum = mass_sample is None
    levels = jnp.arange(max_depth + 1, dtype=jnp.int32)
    level_size = jnp.left_shift(jnp.asarray(1, jnp.int32), levels)

    def step(state: NutsState):
        key, k_mom, k_step = jax.random.split(state.key, 3)
        dtype = state.theta.dtype
        inv_temp = state.inv_temp
        n_parameters = state.theta.shape[0]

        def tempered(t):
            return logp_fn(t) * inv_temp

        if grad_fn is None:
            value_and_grad = jax.value_and_grad(tempered)
        else:
            def value_and_grad(t):
                return tempered(t), inv_temp * grad_fn(t)

        epsilon = state.eps.value

        if unit_momentum:
            r0 = jax.random.normal(k_mom, state.theta.shape, dtype)
        else:
            r0 = mass_sample(k_mom, dtype)
        v0 = mass_velocity(r0)
        h0 = 0.5 * (r0 @ v0) - state.logp
        g0 = state.grad  # tempered gradient at theta, cached across steps

        class Inner(NamedTuple):
            key: jnp.ndarray
            i: jnp.ndarray             # leaf index within the subtree
            t: jnp.ndarray             # (P,) integration endpoint
            r: jnp.ndarray             # (P,) momentum at endpoint
            v: jnp.ndarray             # (P,) velocity at endpoint
            g: jnp.ndarray             # (P,) cached tempered gradient
            ckpt_t: jnp.ndarray        # (max_depth+1, P) subtree starts
            ckpt_v: jnp.ndarray        # (max_depth+1, P) start velocities
            cand_t: jnp.ndarray        # (P,) subtree multinomial candidate
            cand_logp: jnp.ndarray     # () tempered logp of the candidate
            cand_g: jnp.ndarray        # (P,) tempered gradient there
            lse_new: jnp.ndarray       # () log sum of subtree leaf weights
            turning: jnp.ndarray       # () bool
            diverging: jnp.ndarray     # () bool
            accept_sum: jnp.ndarray    # () sum of min(1, exp(lw))
            n_leaves: jnp.ndarray      # () int32

        def build_subtree(key, t, r, g, n_leaf, direction):
            """Integrate ``n_leaf`` leapfrog steps from (t, r, g), checking
            every complete dyadic subtree for a U-turn and drawing a
            multinomial candidate among the new leaves."""
            eps_signed = direction * epsilon

            def cond(c: Inner):
                return (c.i < n_leaf) & ~c.turning & ~c.diverging

            def body(c: Inner):
                key, k_take = jax.random.split(c.key)
                # one cached-gradient leapfrog step (a single fresh
                # gradient per leaf)
                r_half = c.r + (0.5 * eps_signed) * c.g
                t_new = c.t + eps_signed * mass_velocity(r_half)
                logp_new, g_new = value_and_grad(t_new)
                r_new = r_half + (0.5 * eps_signed) * g_new
                # the endpoint velocity is reused by every U-turn check
                # this leaf participates in (computed once per leaf rather
                # than re-applying the inverse mass per checkpoint row)
                v_new = mass_velocity(r_new)

                lw = h0 - (0.5 * (r_new @ v_new) - logp_new)
                lw = jnp.where(jnp.isfinite(lw), lw, -jnp.inf)
                diverging = lw < -delta_max

                # progressive multinomial candidate within the subtree
                lse = jnp.logaddexp(c.lse_new, lw)
                take = jax.random.uniform(k_take, dtype=dtype) < jnp.exp(
                    lw - lse
                )
                cand_t = jnp.where(take, t_new, c.cand_t)
                cand_logp = jnp.where(take, logp_new, c.cand_logp)
                cand_g = jnp.where(take, g_new, c.cand_g)

                # write leaf i into every level with i % 2^j == 0
                write = (c.i & (level_size - 1)) == 0
                ckpt_t = jnp.where(write[:, None], t_new[None, :], c.ckpt_t)
                ckpt_v = jnp.where(write[:, None], v_new[None, :], c.ckpt_v)

                # levels whose dyadic subtree completes at leaf i compare
                # their checkpoint (the subtree start) against this leaf;
                # level 0 (the leaf itself) is never checked
                check = (((c.i + 1) & (level_size - 1)) == 0) & (levels > 0)
                dtheta = direction * (t_new[None, :] - ckpt_t)
                turn_lvl = (jnp.sum(dtheta * ckpt_v, axis=-1) < 0.0) | (
                    jnp.sum(dtheta * v_new[None, :], axis=-1) < 0.0
                )
                turning = jnp.any(check & turn_lvl)

                return Inner(
                    key=key,
                    i=c.i + 1,
                    t=t_new,
                    r=r_new,
                    v=v_new,
                    g=g_new,
                    ckpt_t=ckpt_t,
                    ckpt_v=ckpt_v,
                    cand_t=cand_t,
                    cand_logp=cand_logp,
                    cand_g=cand_g,
                    lse_new=lse,
                    turning=turning,
                    diverging=diverging,
                    accept_sum=c.accept_sum
                    + jnp.minimum(jnp.exp(lw), 1.0),
                    n_leaves=c.n_leaves + 1,
                )

            init = Inner(
                key=key,
                i=jnp.asarray(0, jnp.int32),
                t=t,
                r=r,
                v=jnp.zeros_like(t),
                g=g,
                ckpt_t=jnp.zeros((max_depth + 1, n_parameters), dtype),
                ckpt_v=jnp.zeros((max_depth + 1, n_parameters), dtype),
                cand_t=t,
                cand_logp=jnp.asarray(-jnp.inf, dtype),
                cand_g=g,
                lse_new=jnp.asarray(-jnp.inf, dtype),
                turning=jnp.asarray(False),
                diverging=jnp.asarray(False),
                accept_sum=jnp.asarray(0.0, dtype),
                n_leaves=jnp.asarray(0, jnp.int32),
            )
            return lax.while_loop(cond, body, init)

        class Outer(NamedTuple):
            key: jnp.ndarray
            depth: jnp.ndarray
            t_minus: jnp.ndarray
            r_minus: jnp.ndarray
            v_minus: jnp.ndarray
            g_minus: jnp.ndarray
            t_plus: jnp.ndarray
            r_plus: jnp.ndarray
            v_plus: jnp.ndarray
            g_plus: jnp.ndarray
            prop_t: jnp.ndarray
            prop_logp: jnp.ndarray
            prop_g: jnp.ndarray
            lse_traj: jnp.ndarray
            stopped: jnp.ndarray     # () bool — U-turn or divergence seen
            divergent: jnp.ndarray   # () bool
            accept_sum: jnp.ndarray
            n_leaves: jnp.ndarray

        def outer_cond(c: Outer):
            return ~c.stopped & (c.depth < max_depth)

        def outer_body(c: Outer):
            key, k_dir, k_sub, k_merge = jax.random.split(c.key, 4)
            direction = jnp.where(
                jax.random.uniform(k_dir, dtype=dtype) < 0.5,
                jnp.asarray(-1.0, dtype),
                jnp.asarray(1.0, dtype),
            )
            backward = direction < 0
            t0 = jnp.where(backward, c.t_minus, c.t_plus)
            r0_ = jnp.where(backward, c.r_minus, c.r_plus)
            g0_ = jnp.where(backward, c.g_minus, c.g_plus)

            n_leaf = jnp.left_shift(jnp.asarray(1, jnp.int32), c.depth)
            sub = build_subtree(k_sub, t0, r0_, g0_, n_leaf, direction)

            ok = ~sub.turning & ~sub.diverging

            # biased progressive sampling between trajectory and subtree
            take_new = ok & (
                jax.random.uniform(k_merge, dtype=dtype)
                < jnp.exp(sub.lse_new - c.lse_traj)
            )
            prop_t = jnp.where(take_new, sub.cand_t, c.prop_t)
            prop_logp = jnp.where(take_new, sub.cand_logp, c.prop_logp)
            prop_g = jnp.where(take_new, sub.cand_g, c.prop_g)
            lse_traj = jnp.where(
                ok, jnp.logaddexp(c.lse_traj, sub.lse_new), c.lse_traj
            )

            # endpoints only move when the subtree is kept
            grow_minus = ok & backward
            grow_plus = ok & ~backward
            t_minus = jnp.where(grow_minus, sub.t, c.t_minus)
            r_minus = jnp.where(grow_minus, sub.r, c.r_minus)
            v_minus = jnp.where(grow_minus, sub.v, c.v_minus)
            g_minus = jnp.where(grow_minus, sub.g, c.g_minus)
            t_plus = jnp.where(grow_plus, sub.t, c.t_plus)
            r_plus = jnp.where(grow_plus, sub.r, c.r_plus)
            v_plus = jnp.where(grow_plus, sub.v, c.v_plus)
            g_plus = jnp.where(grow_plus, sub.g, c.g_plus)

            # whole-trajectory U-turn check on the merged endpoints
            dtheta = t_plus - t_minus
            turn_traj = (dtheta @ v_minus < 0.0) | (dtheta @ v_plus < 0.0)

            return Outer(
                key=key,
                depth=c.depth + 1,
                t_minus=t_minus,
                r_minus=r_minus,
                v_minus=v_minus,
                g_minus=g_minus,
                t_plus=t_plus,
                r_plus=r_plus,
                v_plus=v_plus,
                g_plus=g_plus,
                prop_t=prop_t,
                prop_logp=prop_logp,
                prop_g=prop_g,
                lse_traj=lse_traj,
                stopped=~ok | turn_traj,
                divergent=c.divergent | sub.diverging,
                accept_sum=c.accept_sum + sub.accept_sum,
                n_leaves=c.n_leaves + sub.n_leaves,
            )

        init = Outer(
            key=k_step,
            depth=jnp.asarray(0, jnp.int32),
            t_minus=state.theta,
            r_minus=r0,
            v_minus=v0,
            g_minus=g0,
            t_plus=state.theta,
            r_plus=r0,
            v_plus=v0,
            g_plus=g0,
            prop_t=state.theta,
            prop_logp=state.logp,
            prop_g=g0,
            lse_traj=jnp.asarray(0.0, dtype),
            stopped=jnp.asarray(False),
            divergent=jnp.asarray(False),
            accept_sum=jnp.asarray(0.0, dtype),
            n_leaves=jnp.asarray(0, jnp.int32),
        )
        final = lax.while_loop(outer_cond, outer_body, init)

        mean_accept = final.accept_sum / jnp.maximum(
            final.n_leaves.astype(dtype), 1.0
        )
        eps = submit_accept_prob(
            state.eps,
            mean_accept,
            target=NUTS_EPS_TARGET,
            growth_factor=EPS_GROWTH,
            adjust_power=EPS_POWER,
            adjust_min=EPS_MIN_ADJ,
            adjust_max=EPS_MAX_ADJ,
            var_floor=EPS_VAR_FLOOR,
        )

        new_state = NutsState(
            theta=final.prop_t,
            logp=final.prop_logp,
            grad=final.prop_g,
            eps=eps,
            key=key,
            divergences=state.divergences + final.divergent.astype(jnp.int32),
            inv_temp=state.inv_temp,
        )
        out = NutsOutput(
            theta=final.prop_t,
            logp=final.prop_logp,
            leapfrog_steps=final.n_leaves,
            tree_depth=final.depth,
            epsilon=eps.value,
            divergent=final.divergent,
        )
        return new_state, out

    return step


@partial(jax.jit, static_argnums=(0, 2, 3))
def run_steps(step, state, n_steps: int, store: bool = True):
    """Scan ``step`` for ``n_steps`` transitions (see the HMC kernel's
    ``run_steps`` for the ``store=False`` maximum-throughput path)."""
    if store:
        return lax.scan(lambda s, _: step(s), state, None, length=n_steps)
    return lax.scan(
        lambda s, _: (step(s)[0], None), state, None, length=n_steps
    )
