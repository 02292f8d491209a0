import numpy as np
import jax.numpy as jnp

from inference_tpu.utils import PhaseTimer


def test_phase_timer_accumulates():
    timer = PhaseTimer()
    for _ in range(3):
        with timer.phase("matmul"):
            a = jnp.ones((64, 64))
            (a @ a).block_until_ready()
    with timer.phase("sum"):
        jnp.arange(100).sum().block_until_ready()

    assert timer.counts["matmul"] == 3
    assert timer.counts["sum"] == 1
    assert timer.totals["matmul"] > 0
    summary = timer.summary()
    assert "matmul" in summary and "sum" in summary
