"""Sharded parallel tempering: replica-exchange over a device mesh.

The multi-chip form of ``inference_tpu.mcmc.ParallelTempering``: temperature
rungs are laid out along the 'rungs' axis of a ('rungs', 'chains') mesh and
swap proposals become **collective permutes** (``lax.ppermute``) over ICI —
the reference's pipe-synchronised process swaps
(reference: inference/mcmc/parallel.py:190-231) with no host round-trip.

Each (rung, chain-lane) pair holds an independent HMC chain; swap moves use
an even-odd pairing schedule where partner rungs exchange (position, logp)
blocks by ppermute and both sides reach the same Metropolis decision from a
shared folded key, so no extra communication is needed for the accept bit.
Chain lanes swap independently — the program advances C independent
replica-exchange ensembles at once.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..utils import make_key, default_float, as_device_logp
from ..mcmc._kernels import hmc as hmc_kernel


def _even_odd_perm(n_rungs: int, phase: int):
    """Partner permutation for even-odd replica-exchange pairing."""
    perm = []
    partner = {}
    for i in range(n_rungs):
        j = i + 1 - 2 * (i % 2) if phase == 0 else i - 1 + 2 * (i % 2)
        if 0 <= j < n_rungs:
            partner[i] = j
        else:
            partner[i] = i
        perm.append((i, partner[i]))
    return perm, partner


class ShardedTempering:
    """
    Replica-exchange HMC over a ('rungs', 'chains') device mesh.

    :param posterior: traceable log-probability callable.
    :param start: starting position, shape (n_parameters,).
    :param temperatures: increasing temperature ladder, one per rung. The
        number of rungs must match the mesh's 'rungs' axis size.
    :param n_chains: independent chain lanes per rung (sharded over the
        'chains' mesh axis).
    :param mesh: a ('rungs', 'chains') mesh (see
        ``inference_tpu.parallel.tempering_mesh``).
    :param steps: leapfrog steps per proposal.
    :param epsilon: initial leapfrog step size.
    :param seed: optional PRNG seed.
    """

    def __init__(
        self,
        posterior,
        start,
        temperatures,
        n_chains: int,
        mesh,
        steps: int = 50,
        epsilon: float = 0.1,
        retry: bool = False,
        seed=None,
    ):
        start = np.asarray(start, dtype=float)
        self.n_parameters = start.size
        self.temperatures = np.asarray(temperatures, dtype=float)
        self.n_rungs = self.temperatures.size
        self.n_chains = n_chains
        self.mesh = mesh

        if mesh.shape["rungs"] != self.n_rungs:
            raise ValueError(
                f"the mesh 'rungs' axis ({mesh.shape['rungs']}) must match "
                f"the number of temperature rungs ({self.n_rungs})"
            )
        if n_chains % mesh.shape["chains"] != 0:
            raise ValueError(
                "n_chains must be divisible by the mesh 'chains' axis size"
            )

        dtype = default_float()
        self._logp = as_device_logp(posterior, start)
        inv_temps = jnp.asarray(1.0 / self.temperatures, dtype)

        key = make_key(seed)
        self._swap_key, init_key = jax.random.split(key)
        keys = jax.random.split(init_key, self.n_rungs * n_chains).reshape(
            self.n_rungs, n_chains, -1
        )

        theta0 = jnp.broadcast_to(
            jnp.asarray(start, dtype), (self.n_rungs, n_chains, self.n_parameters)
        )
        p0 = self._logp(jnp.asarray(start, dtype))
        logp0 = jnp.broadcast_to(p0, (self.n_rungs, n_chains)) * inv_temps[:, None]

        init = jax.vmap(
            jax.vmap(
                lambda t, p, k, it: hmc_kernel.init_hmc_state(
                    t, p, epsilon, k, inv_temp=it, steps=steps
                ),
                in_axes=(0, 0, 0, None),
            ),
            in_axes=(0, 0, 0, 0),
        )
        state = init(theta0, logp0, keys, inv_temps)

        # shard: rungs axis over 'rungs', chain lanes over 'chains'
        def shard(x):
            spec = P("rungs", "chains", *([None] * (x.ndim - 2)))
            return jax.device_put(x, NamedSharding(mesh, spec))

        self._state = jax.tree.map(shard, state)

        # retry=False (textbook duplicate-on-reject) is the default here:
        # the point of this class is thousands of vmapped lanes per rung,
        # where a repeat-until-accept loop reruns every lane until the
        # slowest lane accepts
        step = hmc_kernel.make_hmc_step(
            self._logp,
            jax.grad(self._logp),
            mass_velocity=lambda r: r,
            mass_sample=lambda k, d: jax.random.normal(k, (self.n_parameters,), d),
            retry=retry,
        )
        self._vstep = jax.vmap(jax.vmap(step))
        self._advance_and_swap = self._build_advance_and_swap()
        self._swap_counter = 0

    def _build_advance_and_swap(self):
        mesh = self.mesh
        n_rungs = self.n_rungs
        vstep = self._vstep

        state_spec = jax.tree.map(
            lambda x: P("rungs", "chains", *([None] * (x.ndim - 2))),
            self._state,
        )

        def swap_shard(state, swap_key, phase):
            """Runs inside shard_map: one rung shard per device row."""
            perm, partner_map = _even_odd_perm(n_rungs, phase)
            rung = lax.axis_index("rungs")

            theta, logp, inv_temp = state.theta, state.logp, state.inv_temp
            # exchange (theta, logp, inv_temp) blocks with the partner rung
            theta_o = lax.ppermute(theta, "rungs", perm)
            logp_o = lax.ppermute(logp, "rungs", perm)
            inv_temp_o = lax.ppermute(inv_temp, "rungs", perm)

            partner_idx = jnp.asarray(
                [partner_map[i] for i in range(n_rungs)], jnp.int32
            )[rung]
            has_partner = partner_idx != rung

            d_beta = inv_temp - inv_temp_o
            d_logp = logp / inv_temp - logp_o / inv_temp_o
            accept_prob = jnp.exp(-d_beta * d_logp)

            # shared decision: both partners fold the swap key with the
            # lower rung index, so they draw identical uniforms per lane
            pair_id = jnp.minimum(rung, partner_idx)
            u_key = jax.random.fold_in(swap_key, pair_id)
            u = jax.random.uniform(u_key, logp.shape, logp.dtype)
            accept = has_partner & (u <= accept_prob)

            new_theta = jnp.where(accept[..., None], theta_o, theta)
            new_logp = jnp.where(
                accept, (logp_o / inv_temp_o) * inv_temp, logp
            )
            return state._replace(theta=new_theta, logp=new_logp), accept

        @partial(
            jax.jit,
            static_argnames=("n_steps", "phase"),
        )
        def advance_and_swap(state, swap_key, n_steps: int, phase: int):
            def body(s, _):
                s, _ = vstep(s)
                return s, None

            state, _ = lax.scan(body, state, None, length=n_steps)

            swap_fn = shard_map(
                lambda s, k: swap_shard(s, k, phase),
                mesh=mesh,
                in_specs=(state_spec, P()),
                out_specs=(state_spec, P("rungs", "chains")),
                check_rep=False,
            )
            state, accepted = swap_fn(state, swap_key)
            return state, accepted

        return advance_and_swap

    def advance(self, n: int, swap_interval: int = 10):
        """
        Advance all rungs ``n`` steps, proposing even-odd replica swaps
        every ``swap_interval`` steps.
        """
        cycles = max(n // swap_interval, 1)
        accepts = []
        for _ in range(cycles):
            self._swap_key, k = jax.random.split(self._swap_key)
            phase = self._swap_counter % 2
            self._state, accepted = self._advance_and_swap(
                self._state, k, swap_interval, phase
            )
            self._swap_counter += 1
            accepts.append(np.asarray(accepted))
        return np.stack(accepts)

    @property
    def theta(self) -> np.ndarray:
        """Positions, shape (n_rungs, n_chains, n_parameters)."""
        return np.asarray(self._state.theta)

    @property
    def logp(self) -> np.ndarray:
        """Tempered log-probabilities, shape (n_rungs, n_chains)."""
        return np.asarray(self._state.logp)

    def cold_chain_positions(self) -> np.ndarray:
        """Positions of the T=1 (first) rung, shape (n_chains, P)."""
        return self.theta[0]

    # ------------------------------------------------------------------ #
    # checkpoint / resume for long multi-chip runs
    # ------------------------------------------------------------------ #
    def save(self, filename: str):
        """Checkpoint the sharded replica-exchange state (gathered to the
        host as flat arrays)."""
        leaves, _ = jax.tree.flatten(self._state)
        items = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
        items["temperatures"] = self.temperatures
        items["n_chains"] = self.n_chains
        items["swap_counter"] = self._swap_counter
        np.savez(filename, **items)

    def restore(self, filename: str):
        """Restore a checkpoint saved by ``save`` into this instance
        (same mesh / temperatures / chain count), re-applying the
        rung x chain shardings."""
        D = np.load(filename)
        if int(D["n_chains"]) != self.n_chains or not np.allclose(
            D["temperatures"], self.temperatures
        ):
            raise ValueError(
                "[ ShardedTempering error ] checkpoint configuration does "
                "not match this instance."
            )
        leaves, treedef = jax.tree.flatten(self._state)
        new_leaves = [
            jnp.asarray(D[f"leaf_{i}"], v.dtype) for i, v in enumerate(leaves)
        ]
        state = jax.tree.unflatten(treedef, new_leaves)

        def shard(x):
            spec = P("rungs", "chains", *([None] * (x.ndim - 2)))
            return jax.device_put(x, NamedSharding(self.mesh, spec))

        self._state = jax.tree.map(shard, state)
        self._swap_counter = int(D["swap_counter"])
        return self
