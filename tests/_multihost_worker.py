"""Worker process for the multi-host smoke test (see test_multihost.py).

Run as:  python _multihost_worker.py <coordinator> <n_procs> <proc_id>

Each worker is its own jax "host" with 4 forced CPU devices; together the
processes form one 8-device multi-controller system over a localhost
coordinator — the CI-sized stand-in for a real multi-host TPU pod.
Prints one JSON line of results for the parent to assert on.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P


def main():
    coordinator, n_procs, proc_id = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from inference_tpu.parallel.multihost import (
        initialize_multihost,
        global_chain_mesh,
        global_tempering_mesh,
    )

    info = initialize_multihost(
        coordinator_address=coordinator,
        num_processes=n_procs,
        process_id=proc_id,
    )

    mesh = global_chain_mesh()
    # cross-process collective: every device contributes its index + 1;
    # the psum must see all 8 global devices (sum = 36)
    @jax.jit
    def collective_sum():
        def f(x):
            return jax.lax.psum(
                x * (jax.lax.axis_index("chains") + 1.0), "chains"
            )

        ones = jnp.ones((mesh.size, 1))
        return shard_map(
            f, mesh=mesh, in_specs=P("chains", None), out_specs=P(None, None)
        )(ones)

    psum_result = float(np.asarray(collective_sum())[0, 0])

    # a ChainArray advanced over the global mesh: 8 chains, one per device
    from inference_tpu.parallel import ChainArray
    from inference_tpu.parallel._kinds import positions_of

    starts = np.tile(np.array([1.0, -0.5]), (8, 1))
    ca = ChainArray(
        "gibbs",
        lambda t: -0.5 * jnp.sum(jnp.asarray(t) ** 2),
        starts,
        mesh=mesh,
        seed=7,
        retry=False,
    )
    ca.advance(64, store=False)

    @jax.jit
    def summary(state):
        pos, logp = positions_of(state)
        return jnp.mean(logp), jnp.mean(jnp.abs(pos - jnp.asarray(starts)))

    mean_logp, mean_move = map(float, summary(ca._state))

    # rung-contiguity of the global tempering mesh: each column (chains
    # lane) should hold rungs from ONE process where possible
    tmesh = global_tempering_mesh(4)
    col_procs = [
        len({d.process_index for d in tmesh.devices[:, c]})
        for c in range(tmesh.devices.shape[1])
    ]

    print(
        "RESULT "
        + json.dumps(
            {
                **info,
                "psum": psum_result,
                "mean_logp": mean_logp,
                "mean_move": mean_move,
                "tempering_col_procs": col_procs,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
