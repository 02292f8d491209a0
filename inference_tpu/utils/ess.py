"""Effective-sample-size estimation via FFT autocorrelation.

Numerics match the reference implementation
(reference: inference/mcmc/utilities.py:83-95): autocorrelation from
``irfft(|rfft(x - mean)|^2)``, truncated at its first negative value, with
ESS = N / (sum(f) / f[0]).

Both a host (numpy) version for diagnostics and a batched jax version for
on-device reductions over many chains are provided.
"""

import numpy as np
import jax.numpy as jnp


def effective_sample_size(x) -> int:
    """Estimate the effective sample size of a 1D series of samples."""
    x = np.asarray(x, dtype=float)
    f = np.fft.irfft(np.abs(np.fft.rfft(x - x.mean())) ** 2)
    f = f[: len(f) // 2]
    if f[0] <= 0.0:
        raise ValueError(
            "effective_sample_size requires a series with positive "
            "variance (a constant chain has no effective samples)"
            if f[0] == 0.0
            else "First element of the autocorrelation is negative"
        )
    cut = np.argmax(f < 0.0)
    if cut > 0:
        f = f[:cut]
    thin_factor = f.sum() / f[0]
    return int(len(x) / thin_factor)


def effective_sample_size_batched(x):
    """
    Batched device ESS over the trailing axis: ``x`` has shape (..., N) and
    the result has shape (...). Truncation at the first negative
    autocorrelation value is implemented with a cumulative mask so the whole
    computation stays fixed-shape (jit/vmap friendly).
    """
    x = jnp.asarray(x)
    n = x.shape[-1]
    centred = x - x.mean(axis=-1, keepdims=True)
    f = jnp.fft.irfft(jnp.abs(jnp.fft.rfft(centred, axis=-1)) ** 2, axis=-1)
    f = f[..., : f.shape[-1] // 2]
    # mask everything at/after the first negative value
    positive = f >= 0.0
    keep = jnp.cumprod(positive, axis=-1).astype(f.dtype)
    kept_sum = (f * keep).sum(axis=-1)
    # a constant (stuck) chain has f[..., 0] == 0; the host version raises
    # on non-positive autocorrelation, here the lane gets the sentinel 0
    # (no effective samples) instead of NaN -> int garbage
    f0 = f[..., 0]
    valid = f0 > 0.0
    thin_factor = kept_sum / jnp.where(valid, f0, 1.0)
    ess = jnp.where(valid & (thin_factor > 0.0), n / thin_factor, 0.0)
    return ess.astype(jnp.int32)
