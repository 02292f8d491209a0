"""Shared branchless building blocks for the compiled sampler kernels.

The reference's adaptive control flow (growing check intervals, width
adjustments, repeat-until-accept loops — reference: gibbs.py:124-156,
hmc/epsilon.py:22-54) is data-dependent Python; here it becomes fixed-shape
state updates with ``jnp.where`` predicates so entire sampling runs compile
to a single ``lax.scan`` and vmap cleanly over thousands of chains.
"""

from typing import NamedTuple

import jax.numpy as jnp


class AdaptiveScale(NamedTuple):
    """
    State for the acceptance-rate-driven scale adaptation shared by the
    Metropolis proposal widths (reference: gibbs.py:124-156, target 0.25/0.5,
    check interval 100 growing x1.75, exponent 0.25, clip [0.1, 3]) and the
    HMC step size (reference: hmc/epsilon.py:22-54, target 0.65, check
    interval 15 growing x1.4, variance floor 0.03, exponent 0.15,
    clip [0.5, 2]).

    All fields may be scalars (HMC epsilon) or per-parameter vectors
    (Metropolis widths).
    """

    value: jnp.ndarray      # the adapted scale (sigma or epsilon)
    avg: jnp.ndarray        # running sum of submitted accept probabilities
    var: jnp.ndarray        # running sum of p*(1-p) terms
    num: jnp.ndarray        # int32 count of submissions since last reset
    chk_int: jnp.ndarray    # int32 current check interval


def init_adaptive_scale(value, chk_int):
    value = jnp.asarray(value)
    shape = value.shape
    return AdaptiveScale(
        value=value,
        avg=jnp.zeros(shape, value.dtype),
        var=jnp.zeros(shape, value.dtype),
        num=jnp.zeros(shape, jnp.int32),
        chk_int=jnp.full(shape, chk_int, jnp.int32),
    )


def submit_accept_prob(
    state: AdaptiveScale,
    p,
    *,
    target: float,
    growth_factor: float,
    adjust_power: float,
    adjust_min: float,
    adjust_max: float,
    var_floor: float = 0.0,
    mask=True,
):
    """
    Record an acceptance probability and, once the check interval is reached,
    either rescale ``value`` (when the observed rate is outside the 2-sigma
    band of the target under a normal approximation of the Poisson-binomial)
    or grow the check interval. ``mask`` gates the whole update (used for
    per-parameter updates inside vectorised sweeps).
    """
    p = jnp.asarray(p, state.value.dtype)
    fdtype = state.value.dtype
    mask = jnp.asarray(mask)

    num = state.num + mask.astype(jnp.int32)
    avg = state.avg + jnp.where(mask, p, 0.0)
    var_term = jnp.maximum(p * (1 - p), var_floor)
    var = state.var + jnp.where(mask, var_term, 0.0)

    due = mask & (num >= state.chk_int)

    nf = num.astype(fdtype)
    mu = jnp.where(due, avg / jnp.maximum(nf, 1.0), 0.5)
    std = jnp.sqrt(jnp.maximum(var, 0.0)) / jnp.maximum(nf, 1.0)

    in_band = (mu - 2 * std < target) & (target < mu + 2 * std)
    adjust = due & ~in_band
    grow = due & in_band

    # adjustment ratio (log target / log mu)^power, clipped; mu is clipped
    # slightly below 1 to keep log(mu) finite (the reference would produce
    # inf/nan here, but only for the measure-zero case mu == 1 exactly)
    mu_safe = jnp.clip(mu, 1e-12, 1.0 - 1e-12)
    ratio = jnp.log(jnp.asarray(target, fdtype)) / jnp.log(mu_safe)
    adj = jnp.clip(ratio**adjust_power, adjust_min, adjust_max)

    new_value = jnp.where(adjust, state.value * adj, state.value)
    # integer check-interval growth: int(growth * chk * 0.1) * 10 — the
    # reference's exact formula (reference: epsilon.py:46, gibbs.py:149).
    # Note it has a fixpoint at 20 for the HMC constants (15 -> 20 -> 20),
    # after which the band is re-tested every submission until an
    # adjustment resets the counters; this mirrors the reference exactly
    grown = (
        jnp.floor(growth_factor * state.chk_int.astype(fdtype) * 0.1).astype(jnp.int32)
        * 10
    )
    new_chk = jnp.where(grow, grown, state.chk_int)

    # counters reset only when the value was adjusted (reference semantics:
    # adjust_sigma/adjust_epsilon reset, the grow branch accumulates on)
    new_avg = jnp.where(adjust, 0.0, avg)
    new_var = jnp.where(adjust, 0.0, var)
    new_num = jnp.where(adjust, 0, num)

    return AdaptiveScale(new_value, new_avg, new_var, new_num, new_chk)


def rescale(state: AdaptiveScale, ratio, mask=True):
    """Directly rescale ``value`` and reset the counters (width halving)."""
    mask = jnp.asarray(mask)
    return AdaptiveScale(
        value=jnp.where(mask, state.value * ratio, state.value),
        avg=jnp.where(mask, 0.0, state.avg),
        var=jnp.where(mask, 0.0, state.var),
        num=jnp.where(mask, 0, state.num),
        chk_int=state.chk_int,
    )
