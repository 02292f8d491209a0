"""Lazy device-resident sample history for the chain facades.

The reference appends every step to Python lists on the host
(reference: gibbs.py:28,158-159). Round 1 replaced that with one bulk
device-to-host transfer per advance chunk — still the facade bottleneck on
slow links (the axon tunnel moves ~22 MB/s). Here chunks stay **on the
accelerator** until either a host view is requested (get_sample etc.) or
the accumulated device bytes exceed a threshold, so sampling throughput is
decoupled from history transfer entirely and transfers happen in large
consolidated blocks.
"""

import numpy as np

# offload device-held history once it exceeds this many bytes, bounding
# HBM growth on very long runs (the transfer is one consolidated block);
# tune per deployment: higher = fewer, larger offload stalls
DEVICE_HISTORY_LIMIT = 2**30


def _is_device(chunk) -> bool:
    return not isinstance(chunk, np.ndarray)


class LazyHistory:
    """
    An append-only sequence of array chunks (device or host) presenting a
    single concatenated numpy view on demand.
    """

    def __init__(self, *initial_chunks, limit_bytes: int = DEVICE_HISTORY_LIMIT):
        self._chunks = [np.asarray(c) for c in initial_chunks]
        self._device_bytes = 0
        self._limit = limit_bytes

    def append(self, chunk):
        self._chunks.append(chunk)
        if _is_device(chunk):
            self._device_bytes += chunk.nbytes

    @property
    def device_bytes(self) -> int:
        return self._device_bytes

    def over_limit(self) -> bool:
        return self._device_bytes > self._limit

    def fetch(self):
        """Move all device chunks to the host (one bulk transfer)."""
        import jax

        if self._device_bytes > 0 or any(_is_device(c) for c in self._chunks):
            self._chunks = [np.asarray(c) for c in jax.device_get(self._chunks)]
            self._device_bytes = 0

    def consolidated(self, reshape=None) -> np.ndarray:
        """
        The full history as one numpy array (cached). ``reshape`` maps each
        chunk before concatenation (e.g. flattening a walker axis).
        """
        self.fetch()
        if reshape is not None:
            self._chunks = [reshape(c) for c in self._chunks]
            reshape = None
        if len(self._chunks) > 1:
            self._chunks = [np.concatenate(self._chunks, axis=0)]
        if not self._chunks:
            return np.empty(0)
        return self._chunks[0]

    def set(self, array):
        """Replace the whole history with a host array."""
        self._chunks = [np.asarray(array)]
        self._device_bytes = 0

    def __bool__(self):
        return bool(self._chunks)
