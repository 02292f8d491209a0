"""Gaussian-process (Bayesian) optimisation.

TPU-native rebuild of the reference ``GpOptimiser``
(reference: inference/gp/optimisation.py:14-292) with the same API:
``propose_evaluation`` maximises the acquisition by multistart BFGS with
autodiff gradients (or differential evolution), ``add_evaluation`` appends
the new datum and refits the GP from scratch, and ``plot_results`` shows the
convergence history.
"""

from collections.abc import Sequence
from inspect import isclass

import numpy as np
from scipy.optimize import differential_evolution, fmin_l_bfgs_b
import matplotlib.pyplot as plt

from .regression import GpRegressor
from .covariance import CovarianceFunction, SquaredExponential
from .acquisition import AcquisitionFunction, ExpectedImprovement
from .mean import MeanFunction, ConstantMean


class GpOptimiser:
    """
    Gaussian-process optimisation in one or more dimensions, for objective
    functions that are expensive to evaluate.

    :param x: initial evaluation positions, shape (n_points, n_dims).
    :param y: objective values at ``x``.
    :param bounds: iterable of (lower, upper) tuples per dimension.
    :param y_err: optional Gaussian errors on the y values.
    :param hyperpars: optional fixed hyperparameter values.
    :param kernel: covariance-function class or instance.
    :param mean: mean-function class or instance.
    :param cross_val: use LOO-CV instead of marginal likelihood.
    :param acquisition: acquisition-function class or instance
        (default ExpectedImprovement).
    :param optimizer: "bfgs" (host multistart L-BFGS-B), "diffev"
        (differential evolution), or "device" (all starts optimised in
        parallel on device via a vmapped BFGS, one dispatch per proposal —
        the fast path on remote accelerators).
    :param n_processes: accepted for API compatibility (runs serially
        against the accelerator).
    """

    def __init__(
        self,
        x,
        y,
        bounds: Sequence,
        y_err=None,
        hyperpars=None,
        kernel: CovarianceFunction = SquaredExponential,
        mean: MeanFunction = ConstantMean,
        cross_val: bool = False,
        acquisition: AcquisitionFunction = ExpectedImprovement,
        optimizer: str = "bfgs",
        n_processes: int = 1,
    ):
        self.x = x if isinstance(x, np.ndarray) else np.array(x)
        if self.x.ndim == 1:
            self.x = self.x.reshape([self.x.size, 1])
        self.y = y if isinstance(y, np.ndarray) else np.array(y)
        self.y_err = (
            y_err if isinstance(y_err, (np.ndarray, type(None))) else np.array(y_err)
        )

        self.bounds = bounds
        self.kernel = kernel
        self.mean = mean
        self.cross_val = cross_val
        self.n_processes = n_processes
        self.optimizer = optimizer

        # bucket padding: the optimisation loop refits on a growing dataset
        # every iteration; padding to a bucket keeps the compiled-program
        # shapes stable so refits reuse compilations
        self.pad_to = 64
        self.gp = GpRegressor(
            x=self.x,
            y=self.y,
            y_err=self.y_err,
            hyperpars=hyperpars,
            kernel=kernel,
            mean=mean,
            cross_val=cross_val,
            optimizer=self.optimizer,
            n_processes=self.n_processes,
            pad_to=self.pad_to,
        )

        self.acquisition = acquisition() if isclass(acquisition) else acquisition
        self.acquisition.update_gp(self.gp)
        self.mu_max = self.y.max()

        self.acquisition_max_history = []
        self.convergence_metric_history = []
        self.iteration_history = []

    def __call__(self, x):
        return self.gp(x)

    def add_evaluation(self, new_x, new_y, new_y_err=None):
        """
        Add the latest evaluation to the data set and re-train the
        Gaussian process (a full refit, including hyperparameters).
        """
        new_x = new_x if isinstance(new_x, np.ndarray) else np.array(new_x)
        if new_x.shape != (1, self.x.shape[1]):
            new_x = new_x.reshape((1, self.x.shape[1]))
        new_y = new_y if isinstance(new_y, np.ndarray) else np.array(new_y)
        good_type = isinstance(new_y_err, (np.ndarray, type(None)))
        new_y_err = new_y_err if good_type else np.array(new_y_err)

        # one acquisition evaluation serves both history entries
        acq_value = self.acquisition(new_x.squeeze())
        self.acquisition_max_history.append(acq_value)
        self.convergence_metric_history.append(
            self.acquisition.convergence_from_acquisition(acq_value)
        )
        self.iteration_history.append(self.y.size + 1)

        self.x = np.append(self.x, new_x, axis=0)
        self.y = np.append(self.y, new_y)

        if self.y_err is not None:
            if new_y_err is not None:
                self.y_err = np.append(self.y_err, new_y_err)
            else:
                raise ValueError(
                    "[ GpOptimiser error ] 'new_y_err' argument of the "
                    "'add_evaluation' method must be specified if the 'y_err' "
                    "argument was specified when the instance of GpOptimiser "
                    "was initialised."
                )

        # in-place data update: every compiled GP / acquisition program
        # takes the data as runtime arguments, so the refit reuses all
        # compilations while the padded shape (pad_to bucket) is unchanged
        self.gp.update_data(self.x, self.y, y_err=self.y_err)
        self.gp.set_hyperparameters(
            self.gp.fit(optimizer=self.optimizer, n_processes=self.n_processes)
        )
        self.mu_max = self.y.max()
        self.acquisition.update_gp(self.gp)

    def diff_evo(self):
        opt_result = differential_evolution(
            self.acquisition.opt_func, self.bounds, popsize=30
        )
        solution = opt_result.x
        funcval = opt_result.fun
        if hasattr(funcval, "__len__"):
            funcval = funcval[0]
        return solution, funcval

    def launch_bfgs(self, x0):
        return fmin_l_bfgs_b(
            self.acquisition.opt_func_gradient,
            x0,
            approx_grad=False,
            bounds=self.bounds,
            pgtol=1e-10,
        )

    def multistart_bfgs(self):
        starting_positions = self.acquisition.starting_positions(self.bounds)
        results = [self.launch_bfgs(x0) for x0 in starting_positions]
        best_result = sorted(results, key=lambda x: float(x[1]))[0]
        return best_result[0], float(best_result[1])

    def multistart_device(self):
        """
        Maximise the acquisition with every start running in parallel on
        device: a vmapped BFGS over sigmoid-bounded coordinates (one
        dispatch for all starts), followed by a second, tighter on-device
        BFGS refinement of the winner — no host optimiser loop at all.
        Replaces the host loop of ``multistart_bfgs``, which pays a device
        round-trip per objective evaluation per start.
        """
        import jax
        import jax.numpy as jnp
        from jax.scipy.optimize import minimize as jax_minimize

        lwr = np.array([b[0] for b in self.bounds], dtype=float)
        upr = np.array([b[1] for b in self.bounds], dtype=float)
        span = upr - lwr

        starts = np.asarray(self.acquisition.starting_positions(self.bounds))
        # map starts into unconstrained sigmoid coordinates, keeping them
        # off the boundary where the reparameterisation gradient vanishes
        frac = np.clip((starts - lwr) / span, 0.01, 0.99)
        z0 = np.log(frac / (1.0 - frac))
        # pad the start count to a bucket so the compiled program shape is
        # reused as the data set grows between iterations
        bucket = 16
        n_pad = -len(z0) % bucket
        if n_pad:
            z0 = np.concatenate([z0, np.repeat(z0[:1], n_pad, axis=0)])

        solver = getattr(self, "_ms_solver", None)
        if solver is None:
            objective = self.acquisition._objective

            def neg(z, lo, sp, st):
                return objective(lo + sp * jax.nn.sigmoid(z), st)

            def solve_one(z, lo, sp, st):
                res = jax_minimize(
                    neg, z, args=(lo, sp, st), method="BFGS",
                    options={"maxiter": 150},
                )
                return res.x, res.fun

            def solve_and_refine(z0, lo, sp, st):
                """All starts + winner refinement in ONE device program."""
                zs, fs = jax.vmap(
                    solve_one, in_axes=(0, None, None, None)
                )(z0, lo, sp, st)
                best = jnp.nanargmin(jnp.where(jnp.isfinite(fs), fs, jnp.inf))
                res = jax_minimize(
                    neg, zs[best], args=(lo, sp, st), method="BFGS",
                    options={"maxiter": 400, "gtol": 1e-10},
                )
                better = res.fun <= fs[best]
                return (
                    jnp.where(better, res.x, zs[best]),
                    jnp.where(better, res.fun, fs[best]),
                )

            solver = jax.jit(solve_and_refine)
            self._ms_solver = solver

        z_best, fun_val = solver(
            jnp.asarray(z0), jnp.asarray(lwr), jnp.asarray(span),
            self.acquisition.gp_state(),
        )
        x_best = lwr + span / (1.0 + np.exp(-np.asarray(z_best)))
        return np.clip(x_best, lwr, upr), float(fun_val)

    def propose_evaluation(self, optimizer=None):
        """
        Propose the next evaluation location by maximising the acquisition
        function.
        """
        opt = optimizer if optimizer is not None else self.optimizer
        if opt == "bfgs":
            proposed_ev, _ = self.multistart_bfgs()
        elif opt == "device":
            proposed_ev, _ = self.multistart_device()
        else:
            proposed_ev, _ = self.diff_evo()
        if hasattr(proposed_ev, "__len__") and len(proposed_ev) == 1:
            proposed_ev = proposed_ev[0]
        return proposed_ev

    def plot_results(self, filename: str = None, show_plot=True):
        fig = plt.figure(figsize=(10, 4))
        ax1 = fig.add_subplot(121)
        maxvals = np.maximum.accumulate(self.y)
        pad = np.ptp(maxvals) * 0.1 if np.ptp(maxvals) > 0 else 1.0
        iterations = np.arange(len(self.y)) + 1
        ax1.plot(iterations, maxvals, c="red", alpha=0.6, label="max observed value")
        ax1.plot(iterations, self.y, ".", label="function evaluations", markersize=10)
        ax1.set_xlabel("iteration")
        ax1.set_ylabel("function value")
        ax1.set_ylim([maxvals.min() - pad, maxvals.max() + pad])
        ax1.legend(loc=4)
        ax1.grid()

        ax2 = fig.add_subplot(122)
        ax2.plot(
            self.iteration_history, self.convergence_metric_history, c="C0", alpha=0.35
        )
        ax2.plot(
            self.iteration_history,
            self.convergence_metric_history,
            ".",
            c="C0",
            label=self.acquisition.convergence_description,
            markersize=10,
        )
        ax2.set_yscale("log")
        ax2.set_xlabel("iteration")
        ax2.set_ylabel("acquisition function value")
        ax2.set_xlim([0, None])
        ax2.set_title("Convergence summary")
        ax2.legend()
        ax2.grid()

        fig.tight_layout()

        if filename is not None:
            plt.savefig(filename)
        if show_plot:
            plt.show()
        else:
            plt.close()
