"""No-U-Turn sampler facade (beyond the reference).

The reference's gradient-based sampler is plain HMC with a fixed,
jittered leapfrog step count (reference: inference/mcmc/hmc/__init__.py:
127-194) — trajectory length is a tuning parameter the user must get
right. ``NutsChain`` removes it: trajectories double until the path
turns back on itself (Hoffman & Gelman's No-U-Turn criterion), with the
step size adapted automatically exactly as in ``HamiltonianChain``.

The facade shares the ``HamiltonianChain`` machinery (lazy
device-resident history, epsilon change-point log, diagnostics,
mass-matrix handling); the kernel is the iterative fixed-``max_depth``
tree builder in ``inference_tpu.mcmc._kernels.nuts``, which compiles to
a single ``lax.scan`` per run and vmaps over chain batches
(``ChainArray("nuts", ...)``).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import default_float, is_traceable, make_key, as_device_logp
from .hmc import HamiltonianChain, EpsilonSelector, get_particle_mass
from ._kernels.common import AdaptiveScale
from ._kernels.nuts import (
    make_nuts_step,
    init_nuts_state,
    run_steps,
    NutsState,
)

__all__ = ["NutsChain"]


class NutsChain(HamiltonianChain):
    """
    No-U-Turn sampling with automatic step-size adaptation.

    Accepts the same arguments as ``HamiltonianChain`` except ``bounds``
    (reflecting bounds break the U-turn criterion — reparameterise the
    posterior instead) and with ``max_depth`` replacing the ``steps``
    attribute: trajectory length per transition is chosen automatically,
    up to ``2^max_depth - 1`` leapfrog steps.

    :param posterior: \
        A callable which takes the vector of model parameters and returns
        the posterior log-probability. jax-traceable posteriors run
        compiled on device with fused value-and-gradient leaf evaluations.

    :param start: \
        Parameter vector at which the chain starts.

    :param grad: \
        A callable returning the gradient of the log-posterior. If
        omitted, the gradient comes from jax autodiff of ``posterior``
        (or finite differences if the posterior is not traceable).

    :param epsilon: \
        Initial guess for the leapfrog time-step.

    :param temperature: \
        Chain temperature (used by parallel tempering).

    :param inverse_mass: \
        Scalar, vector (diagonal) or matrix inverse-mass.

    :param max_depth: \
        Maximum number of trajectory doublings per transition.

    :param display_progress: \
        Whether to print progress/ETA messages during sampling.

    :param seed: \
        Optional integer PRNG seed (fresh OS entropy when omitted).
    """

    def __init__(
        self,
        posterior: callable,
        start,
        grad: callable = None,
        epsilon: float = 0.1,
        temperature: float = 1.0,
        inverse_mass=None,
        max_depth: int = 10,
        display_progress=True,
        seed=None,
    ):
        self.max_depth = int(max_depth)
        super().__init__(
            posterior=posterior,
            start=start,
            grad=grad,
            epsilon=epsilon,
            temperature=temperature,
            bounds=None,
            inverse_mass=inverse_mass,
            display_progress=display_progress,
            seed=seed,
        )
        if start is not None:
            # swap the HMC state built by the parent for a NUTS state
            hs = self._state
            self._state = init_nuts_state(
                hs.theta,
                hs.logp,
                epsilon,
                self._key,
                inv_temp=self.inv_temp,
                grad0=self._tempered_state_grad(hs.theta),
            )
            self._depth_chunks = [np.array([0], dtype=int)]
            self._div_chunks = [np.array([False])]

    def _tempered_state_grad(self, theta):
        """The tempered log-posterior gradient at ``theta`` (the cached
        integration start the kernel carries in its state)."""
        start = np.asarray(theta)
        if self.user_grad is None and is_traceable(self.posterior, start):
            return self.inv_temp * jax.grad(self._logp)(
                jnp.asarray(theta, default_float())
            )
        grad_fn = self._gradient_fn(start)
        return self.inv_temp * jnp.asarray(grad_fn(start), default_float())

    def _refresh_state_grad(self):
        """Recompute the state's cached gradient after the position was
        rewritten externally (host tempering swaps between heterogeneous
        rungs, where the partner chain carries no gradient to exchange)."""
        if self._state is not None:
            self._state = self._state._replace(
                grad=self._tempered_state_grad(self._state.theta)
            )

    def replace_last(self, theta):
        # the kernel integrates from the cached gradient: a rewritten
        # position must refresh it or the next trajectory's first
        # half-step silently uses the old position's gradient
        super().replace_last(theta)
        self._refresh_state_grad()

    # ------------------------------------------------------------------ #
    # device execution
    # ------------------------------------------------------------------ #
    def _get_step(self):
        config = (self.max_depth, id(self.mass))
        if self._step is None or self._step_config != config:
            start = np.asarray(self._theta_chunks[0][0])
            # a traceable posterior with no user gradient takes the fused
            # value_and_grad path inside the kernel (grad_fn=None); host
            # callbacks and user gradients resolve as in HamiltonianChain
            if self.user_grad is None and is_traceable(self.posterior, start):
                grad_fn = None
            else:
                grad_fn = self._gradient_fn(start)
            self._step = make_nuts_step(
                self._logp,
                grad_fn,
                max_depth=self.max_depth,
                mass_velocity=self.mass.get_velocity,
                mass_sample=self.mass.sample_momentum,
            )
            self._step_config = config
        return self._step

    def _run_chunk(self, n: int):
        if self.posterior is None or self._logp is None:
            raise ValueError(
                "[ NutsChain error ] Cannot advance a chain loaded without "
                "a 'posterior' callable."
            )
        step = self._get_step()
        state, outs = run_steps(step, self._state, n)
        self._state = state
        self._absorb_outputs(outs)
        eps = state.eps
        self.ES.sync_counters(eps.avg, eps.var, eps.num, eps.chk_int)

    def _absorb_outputs(self, outs):
        self._depth_chunks.append(outs.tree_depth)
        self._div_chunks.append(outs.divergent)
        # the parent reads .theta/.logp/.leapfrog_steps/.epsilon — all
        # present on NutsOutput — and manages the device-history budget
        super()._absorb_outputs(outs)

    def _fetch_history(self):
        if self._device_history_bytes > 0:
            fetched = jax.device_get(
                (
                    self._theta_chunks,
                    self._prob_chunks,
                    self._leapfrog_chunks,
                    self._depth_chunks,
                    self._div_chunks,
                )
            )
            self._theta_chunks = [np.asarray(c) for c in fetched[0]]
            self._prob_chunks = [np.asarray(c) for c in fetched[1]]
            self._leapfrog_chunks = [np.asarray(c) for c in fetched[2]]
            self._depth_chunks = [np.asarray(c) for c in fetched[3]]
            self._div_chunks = [np.asarray(c) for c in fetched[4]]
            self._device_history_bytes = 0

    # ------------------------------------------------------------------ #
    # NUTS-specific history views
    # ------------------------------------------------------------------ #
    @property
    def tree_depths(self) -> np.ndarray:
        """Doublings performed at each chain step."""
        self._fetch_history()
        if len(self._depth_chunks) > 1:
            self._depth_chunks = [np.concatenate(self._depth_chunks)]
        return self._depth_chunks[0]

    @property
    def divergent_steps(self) -> np.ndarray:
        """Boolean flags marking transitions that hit a divergence."""
        self._fetch_history()
        if len(self._div_chunks) > 1:
            self._div_chunks = [np.concatenate(self._div_chunks)]
        return self._div_chunks[0]

    @property
    def n_divergences(self) -> int:
        """Total number of divergent transitions so far."""
        if self._state is None:
            return int(np.asarray(self.divergent_steps).sum())
        return int(self._state.divergences)

    # ------------------------------------------------------------------ #
    # checkpointing
    # ------------------------------------------------------------------ #
    def save(self, filename, compressed=False):
        self._drain_epsilon_trace()
        self._fetch_history()
        items = {
            "inv_mass": self.mass.inv_mass,
            "inv_temp": self.inv_temp,
            "theta": self._consolidated_theta(),
            "probs": self._consolidated_probs(),
            "leapfrog_steps": np.concatenate(self._leapfrog_chunks),
            "tree_depths": np.concatenate(self._depth_chunks),
            "divergent": np.concatenate(self._div_chunks),
            "divergences": (
                int(self._state.divergences)
                if self._state is not None
                else int(np.concatenate(self._div_chunks).sum())
            ),
            "n_parameters": self.n_parameters,
            "chain_length": self.chain_length,
            "max_depth": self.max_depth,
            "display_progress": self.display_progress,
        }
        items.update(self.ES.get_items())

        if compressed:
            np.savez_compressed(filename, **items)
        else:
            np.savez(filename, **items)

    @classmethod
    def load(cls, filename: str, posterior=None, grad=None, seed=None):
        from ..utils import ChainProgressPrinter

        D = np.load(filename)
        theta = np.asarray(D["theta"], dtype=float)
        chain = cls.__new__(cls)
        chain.posterior = posterior
        chain.user_grad = grad
        chain.inv_temp = float(D["inv_temp"])
        chain.temperature = 1.0 / chain.inv_temp
        chain.max_depth = int(D["max_depth"])
        chain.steps = 50          # unused; kept for shared diagnostics code
        chain.max_attempts = 200  # unused
        chain.bounds = None
        chain.n_parameters = int(D["n_parameters"])
        chain.chain_length = int(D["chain_length"])
        chain.mass = get_particle_mass(
            inverse_mass=np.asarray(D["inv_mass"]).squeeze()
            if np.asarray(D["inv_mass"]).ndim > 0
            else float(D["inv_mass"]),
            n_parameters=chain.n_parameters,
        )
        chain._theta_chunks = [theta]
        chain._prob_chunks = [np.asarray(D["probs"], dtype=float)]
        chain._leapfrog_chunks = [np.asarray(D["leapfrog_steps"], dtype=int)]
        chain._depth_chunks = [np.asarray(D["tree_depths"], dtype=int)]
        chain._div_chunks = [np.asarray(D["divergent"], dtype=bool)]
        chain._pending_eps = []
        chain._device_history_bytes = 0
        chain.ES = EpsilonSelector(1.0)
        chain.ES.load_items(D)
        chain._key = make_key(seed)
        chain._step = None
        chain._step_config = None
        chain.display_progress = bool(D["display_progress"])
        chain.ProgressPrinter = ChainProgressPrinter(
            display=chain.display_progress, leading_msg="advancing chain:"
        )

        if posterior is not None:
            dtype = default_float()
            start = theta[-1]
            chain._logp = as_device_logp(posterior, start)
            eps_state = AdaptiveScale(
                value=jnp.asarray(chain.ES.epsilon, dtype),
                avg=jnp.asarray(chain.ES.avg, dtype),
                var=jnp.asarray(chain.ES.var, dtype),
                num=jnp.asarray(int(chain.ES.num), jnp.int32),
                chk_int=jnp.asarray(chain.ES.chk_int, jnp.int32),
            )
            chain._state = NutsState(
                theta=jnp.asarray(start, dtype),
                logp=jnp.asarray(chain._prob_chunks[0][-1], dtype),
                grad=jnp.asarray(
                    chain._tempered_state_grad(start), dtype
                ),
                eps=eps_state,
                key=chain._key,
                divergences=jnp.asarray(int(D["divergences"]), jnp.int32),
                inv_temp=jnp.asarray(chain.inv_temp, dtype),
            )
        else:
            chain._logp = None
            chain._state = None
        return chain
