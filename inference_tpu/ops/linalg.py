"""Device linear-algebra helpers.

``jnp.eye(n)`` called inside a traced function is evaluated eagerly (it
depends on no tracers) and embedded into the compiled program as a dense
N x N constant — at N = 8192 that is a 256MB HLO literal, which makes
compilation payloads enormous. These helpers build identities and diagonal
updates *from traced operands*, so they lower to cheap device ops instead.
"""

import jax.numpy as jnp


def add_diagonal(K, value):
    """Return ``K + value * I`` without materialising an identity constant.

    ``value`` may be a scalar or a length-N vector."""
    n = K.shape[0]
    idx = jnp.arange(n)
    return K.at[idx, idx].add(value)


def identity_like(K):
    """An identity matrix with the shape/dtype of ``K``, built from ``K``
    (traced) rather than from a constant."""
    n = K.shape[0]
    idx = jnp.arange(n)
    return jnp.zeros_like(K).at[idx, idx].set(1.0)
