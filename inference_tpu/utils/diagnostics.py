"""Cross-chain convergence diagnostics (split-R-hat family).

The reference toolkit diagnoses convergence per chain only — FFT
effective sample size (reference: inference/mcmc/utilities.py:83-95)
and heuristic burn-in estimates (reference: inference/mcmc/gibbs.py:
577-592). It never runs enough chains for a between-chain statistic to
make sense. The rebuild's ``ChainArray`` runs thousands of chains per
chip, which makes the standard many-chain diagnostic — potential scale
reduction, R-hat — both natural and nearly free: everything here is one
batched fixed-shape program over a (..., n_chains, n_steps) array.

Implemented estimators:

- ``split_rhat``: classic Gelman–Rubin potential scale reduction with
  each chain split in half (so within-chain non-stationarity inflates
  the statistic, per Gelman et al., *Bayesian Data Analysis* 3rd ed.,
  eq. 11.4).
- ``rank_normalized_rhat``: the rank-normalized, folded variant of
  Vehtari, Gelman, Simpson, Carpenter & Bürkner (2021), *Rank-
  normalization, folding, and localization: an improved R-hat for
  assessing convergence of MCMC*. Robust to heavy tails (it is
  rank-based, so it exists even when the target has no finite
  variance) and sensitive to scale as well as location differences
  (via folding around the median).

Both accept arbitrary leading batch axes and are jit/vmap friendly
(fixed shapes, no data-dependent control flow).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import ndtri


def _split_chains(x):
    """(..., m, n) -> (..., 2m, n//2): split every chain in half.

    A trailing odd sample is dropped (the standard convention), keeping
    the two halves the same length so the result is one dense array.
    """
    m, n = x.shape[-2], x.shape[-1]
    half = n // 2
    if half < 2:
        raise ValueError(
            "[ split_rhat error ] chains must contain at least 4 samples "
            f"(got n_steps = {n})."
        )
    x = x[..., : 2 * half]
    return x.reshape(*x.shape[:-2], m, 2, half).reshape(
        *x.shape[:-2], 2 * m, half
    )


def _rhat_of_splits(z):
    """Potential scale reduction of already-split chains (..., m, n)."""
    n = z.shape[-1]
    chain_means = z.mean(axis=-1)
    chain_vars = z.var(axis=-1, ddof=1)
    w = chain_vars.mean(axis=-1)
    b_over_n = chain_means.var(axis=-1, ddof=1)
    var_plus = (n - 1) / n * w + b_over_n
    # w == 0 needs explicit gating rather than 0/0. Identical constant
    # chains (w == 0, b == 0) are converged by construction: report 1.
    # Chains that are each constant but at DIFFERENT values (w == 0,
    # b > 0 — e.g. fully-stuck samplers at distinct positions) are
    # maximally unconverged: report +inf, never 1.
    safe_w = jnp.where(w > 0.0, w, 1.0)
    stuck = jnp.where(b_over_n > 0.0, jnp.inf, 1.0)
    return jnp.where(w > 0.0, jnp.sqrt(var_plus / safe_w), stuck)


def split_rhat(x):
    """Split-R-hat over the last two axes of ``x`` (..., n_chains, n_steps).

    Values near 1 indicate the chains are sampling the same
    distribution and are individually stationary; the usual acceptance
    threshold is R-hat < 1.01 (Vehtari et al. 2021, §4.1). Returns an
    array of shape ``x.shape[:-2]``.
    """
    x = jnp.asarray(x)
    if x.ndim < 2 or x.shape[-2] < 2:
        raise ValueError(
            "[ split_rhat error ] expected (..., n_chains, n_steps) with "
            f"at least 2 chains, got shape {x.shape}."
        )
    return _rhat_of_splits(_split_chains(x))


def _rank_normalize(z):
    """Map pooled draws to normal scores over the last two axes.

    Fractional ranks use the Blom offset (r - 3/8)/(S + 1/4) recommended
    by Vehtari et al. (2021, eq. 14), then transform through the normal
    quantile function. Tied draws receive their AVERAGE rank (the
    midpoint of the tied run in the sorted order), so the statistic is
    invariant to memory layout for discrete/rounded data — breaking
    ties by pooled draw order would hand tied draws in different chains
    systematically ordered ranks (the pooled flat order is chain-major)
    and inflate R-hat for reasons unrelated to mixing.
    """
    m, n = z.shape[-2], z.shape[-1]
    s = m * n
    flat = z.reshape(-1, s)
    # average rank of x among the pooled draws: ties spanning 1-based
    # sorted positions [left+1, right] all get (left + right + 1) / 2.
    sorted_flat = jnp.sort(flat, axis=-1)
    left = jax.vmap(partial(jnp.searchsorted, side="left"))(sorted_flat, flat)
    right = jax.vmap(partial(jnp.searchsorted, side="right"))(sorted_flat, flat)
    ranks = 0.5 * (left + right + 1).astype(z.dtype)
    scores = ndtri((ranks - 0.375) / (s + 0.25))
    return scores.reshape(*z.shape[:-2], m, n)


def rank_normalized_rhat(x):
    """Rank-normalized, folded split-R-hat (Vehtari et al. 2021).

    The returned statistic is the elementwise maximum of

    - the *bulk* R-hat: split-R-hat of the rank-normal scores of the
      pooled draws (location/shape mixing, robust to heavy tails), and
    - the *tail* (folded) R-hat: the same statistic on
      ``|x - median(x)|``, which detects chains that agree in location
      but differ in scale.

    Accepts (..., n_chains, n_steps); returns ``x.shape[:-2]``.
    """
    x = jnp.asarray(x)
    if x.ndim < 2 or x.shape[-2] < 2:
        raise ValueError(
            "[ rank_normalized_rhat error ] expected (..., n_chains, "
            f"n_steps) with at least 2 chains, got shape {x.shape}."
        )
    z = _split_chains(x)
    bulk = _rhat_of_splits(_rank_normalize(z))
    folded = jnp.abs(z - jnp.median(z, axis=(-2, -1), keepdims=True))
    tail = _rhat_of_splits(_rank_normalize(folded))
    return jnp.maximum(bulk, tail)
