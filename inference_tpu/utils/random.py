"""PRNG-key discipline for the samplers.

The reference uses per-object unseeded ``numpy.random.default_rng()``
instances (reference: gibbs.py:30, hmc/__init__.py:79, ensemble.py:55);
here all randomness flows through explicitly threaded ``jax.random`` keys.
A fresh entropy-derived seed is used when none is supplied, matching the
reference's unseeded default behaviour while remaining reproducible when a
seed is given.
"""

import os
import numpy as np
import jax


def make_key(seed=None):
    """Create a jax PRNG key, drawing entropy from the OS if seed is None.
    Any Python integer is accepted (folded into 32 bits — numpy >= 2 raises
    on out-of-range uint32 casts, and 64-bit seeds from hashes/time_ns are
    common)."""
    if seed is None:
        seed = int.from_bytes(os.urandom(4), "little")
    return jax.random.PRNGKey(np.uint32(int(seed) % (2**32)))
