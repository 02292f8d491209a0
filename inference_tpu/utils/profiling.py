"""Profiling and tracing helpers.

The reference has no runtime introspection beyond its progress printer
(SURVEY.md section 5); here a thin layer over ``jax.profiler`` provides
device traces viewable in Perfetto/TensorBoard, plus a lightweight
phase-timing accumulator for sampler runs.
"""

import time
from contextlib import contextmanager
from collections import defaultdict

import jax


@contextmanager
def device_trace(log_dir: str):
    """
    Capture a jax device trace (XLA ops, fusions, transfers) for everything
    executed inside the block::

        with device_trace("/tmp/trace"):
            chain.advance(10_000)

    View with TensorBoard or ui.perfetto.dev.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """
    Accumulates wall-clock time per named phase. Blocks on device work at
    phase exit so times reflect actual device execution, not dispatch.
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextmanager
    def phase(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            # barrier on every device: a default-device-only op would let
            # async work on other mesh devices leak into later phases.
            # The "+ 0" forces a compute op ordered after queued kernels —
            # a bare transfer is not ordered against in-flight compute.
            for dev in jax.devices():
                (jax.device_put(0.0, dev) + 0).block_until_ready()
            self.totals[name] += time.perf_counter() - start
            self.counts[name] += 1

    def summary(self) -> str:
        lines = ["[ PhaseTimer summary ]"]
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(
                f"  {name:>24}: {total:8.3f}s total, {n:5d} calls, "
                f"{1e3 * total / n:8.2f} ms/call"
            )
        return "\n".join(lines)
