"""Adapters between user posterior callables and jitted sampler kernels.

The sampler step loops are compiled with ``jax.jit``/``lax.scan``, so the
user's ``posterior(theta) -> float`` callable must be jax-traceable. Posteriors
written against numpy (as reference users do) are automatically wrapped with
``jax.pure_callback`` so they still work (at host-call speed) inside the
compiled loops; traceable posteriors run natively on device at full speed.

Validation semantics mirror the reference
(reference: inference/mcmc/base.py:266-296): the posterior must be callable
and return a finite scalar for the start point.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .dtypes import default_float


# Per-platform result of the one-time host-callback capability probe.
# Some backends (e.g. the axon TPU tunnel used for remote single-chip
# work) do not implement host callbacks at all, in which case a
# non-traceable posterior cannot run inside a compiled sampler loop on
# that backend and the user needs an actionable error, not a trace-time
# backend failure.
_CALLBACK_SUPPORT = {}


def callbacks_supported(platform: str = None) -> bool:
    """Whether ``jax.pure_callback`` works inside jitted code on the given
    platform (default: the active default backend). Probed once per
    platform with a tiny jitted identity callback and cached."""
    platform = platform or jax.default_backend()
    if platform not in _CALLBACK_SUPPORT:
        def probe(x):
            return jax.pure_callback(
                lambda v: np.asarray(v), jax.ShapeDtypeStruct((), x.dtype), x
            )

        try:
            # commit the operand to the probed platform so jit runs there
            x = jax.device_put(
                jnp.asarray(1.0, dtype=default_float()),
                jax.devices(platform)[0],
            )
            _CALLBACK_SUPPORT[platform] = bool(
                np.isfinite(float(jax.jit(probe)(x)))
            )
        except Exception:
            _CALLBACK_SUPPORT[platform] = False
    return _CALLBACK_SUPPORT[platform]


def is_traceable(fn, example) -> bool:
    """Check whether ``fn`` can be traced by jax on the example input."""
    try:
        out = jax.eval_shape(fn, jnp.asarray(example))
        return np.prod(out.shape, dtype=int) == 1
    except Exception:
        return False


def as_device_logp(fn, example):
    """
    Return a traceable scalar log-probability function. If ``fn`` is already
    jax-traceable it is returned (reshaped to a scalar); otherwise it is
    wrapped in a ``pure_callback`` that evaluates it on the host.
    """
    example = jnp.asarray(example, dtype=default_float())

    if is_traceable(fn, example):
        def logp(theta):
            return jnp.asarray(fn(theta), dtype=theta.dtype).reshape(())
        return logp

    if not callbacks_supported():
        raise RuntimeError(
            f"[ inference_tpu ] The given posterior is not jax-traceable "
            f"(it appears to use numpy or other host-only code), and the "
            f"active '{jax.default_backend()}' backend does not implement "
            f"host callbacks, so it cannot be evaluated inside a compiled "
            f"sampler loop on this device. Either (a) rewrite the "
            f"posterior with jax.numpy so it runs on the device at full "
            f"speed, or (b) run this chain on the CPU backend by calling "
            f"jax.config.update('jax_platforms', 'cpu') before any jax "
            f"operation — host-callback posteriors are supported there "
            f"at host-call speed."
        )

    result_shape = jax.ShapeDtypeStruct((), example.dtype)

    def host_eval(theta):
        return np.asarray(fn(np.asarray(theta)), dtype=theta.dtype).reshape(())

    def logp(theta):
        return jax.pure_callback(
            host_eval, result_shape, theta, vmap_method="sequential"
        )

    return logp


def validate_posterior(posterior, start, error_source: str = "MarkovChain"):
    """
    Eagerly validate the posterior callable on the start point: it must be
    callable and return a finite scalar (python float, numpy float or 0-d
    array — a relaxation of the reference's strict ``isinstance(prob, float)``
    check to admit jax scalar outputs).
    """
    if not callable(posterior):
        raise ValueError(
            f"[ {error_source} error ] The given 'posterior' is not a callable object."
        )

    prob = posterior(np.asarray(start, dtype=float))

    try:
        prob = float(prob)
    except (TypeError, ValueError):
        raise ValueError(
            f"[ {error_source} error ] The given 'posterior' must return a scalar "
            f"float-like value, but the returned value has type {type(prob)}."
        )

    if not np.isfinite(prob):
        raise ValueError(
            f"[ {error_source} error ] The given 'posterior' must return a finite "
            f"value for the given 'start' parameter values, but instead returns "
            f"{prob}."
        )
    return prob
