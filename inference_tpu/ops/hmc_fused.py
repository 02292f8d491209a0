"""Fused whole-trajectory HMC transitions as one Pallas kernel
(opt-in experiment — measured SLOWER than the XLA kernel on chip).

Motivation: the XLA-compiled HMC kernel (``mcmc/_kernels/hmc.py``) is
HBM-bandwidth-bound at large chain batches — every leapfrog iteration's
carry (position + momentum, ~80 B/chain) round-trips HBM because the
per-iteration gradient ``dot_general`` breaks XLA's loop-body fusion;
at 65k chains the loop sustains ~60% of HBM peak and unrolling does not
help (``benchmarks/hmc_leapfrog_experiment.py``). This kernel removes
that wall: each grid tile keeps its chains' position, momentum and
step-size-adaptation state in VMEM across EVERY leapfrog step of EVERY
transition in the chunk, so HBM traffic drops to the streamed random
numbers (~48 B/transition/chain versus ~8.8 KB of carry traffic per
transition it replaces).

Measured outcome (v5e chip, ``benchmarks/hmc_fused_bench.py``): the
bandwidth win does NOT translate — the kernel saturates at ~16.8M
attempts/s against the XLA kernel's ~41M on the 10-dim headline
workload, flat across lane widths 512-8192 and strictly worse with the
dots VPU-expanded (2M). The compute inside the kernel hits the same
Mosaic elementwise-dataflow throughput wall the df64 pair kernel
documented (ROADMAP Deferred #1): long per-iteration op chains lower at
a small fraction of what XLA's fused loop achieves on this chip
generation. ``ChainArray(fused=True)`` keeps the kernel available as an
opt-in experiment; the "auto" policy never selects it.

Randomness is generated OUTSIDE the kernel with the ordinary threefry
``jax.random`` (one fused XLA pass per chunk) and streamed in as
``(chunk, P, lanes)`` blocks: the TPU-resident PRNG
(``pltpu.prng_random_bits``) has no interpret-mode lowering, and
pre-generated bits keep the kernel bit-for-bit testable on CPU against
a pure-jax mirror while costing ~2% of the bandwidth the fusion saves.

Semantics mirror the ``retry=False`` (textbook duplicate-on-reject)
production kernel exactly — same per-proposal +-10% leapfrog-step
jitter (reference: inference/mcmc/hmc/__init__.py:137), same
``EpsilonSelector`` adaptation constants via the shared
``submit_accept_prob`` (reference: inference/mcmc/hmc/epsilon.py:18-43),
same tempering scaling of log-probability and force (reference:
hmc/__init__.py:167,181). The layout is transposed to ``(P, chains)``
so chains ride the 128-wide lane dimension.

Restrictions (the facade falls back to the XLA kernel otherwise):
``retry=False``, no reflecting bounds, unit/scalar/diagonal inverse
mass, traceable-and-Pallas-lowerable posterior, single device.
"""

import contextlib
import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mcmc._kernels.hmc import (
    EPS_TARGET,
    EPS_GROWTH,
    EPS_VAR_FLOOR,
    EPS_POWER,
    EPS_MIN_ADJ,
    EPS_MAX_ADJ,
)
from ..mcmc._kernels.common import AdaptiveScale, submit_accept_prob

_LANES = 512   # chains per grid tile (multiple of 128)
_CHUNK = 64    # transitions per kernel invocation (bounds VMEM)
_EXPAND_ALL_DOTS = False  # experiment knob: VPU-expand even legal matmuls


def _x64_off_ctx():
    """Trace f32 pallas kernels with x64 disabled (i64 grid indices do
    not legalize in Mosaic)."""
    try:
        from jax._src.config import enable_x64

        return enable_x64(False)
    except ImportError:  # pragma: no cover
        return contextlib.nullcontext()


def _transition_math(logp_cols, grad_cols, steps: int, max_steps: int):
    """The shared per-transition update on ``(P, lanes)`` position tiles
    and ``(1, lanes)`` per-chain scalars. Written once and traced both
    inside the Pallas kernel and in the pure-jax mirror
    (``_reference_chunk``) so the two stay definitionally identical.

    ``logp_cols``/``grad_cols`` map a ``(P, L)`` position tile to the
    column-batched posterior value ``(1, L)`` / gradient ``(P, L)`` —
    separate maps so the leapfrog evaluates ONLY the gradient chain."""

    def transition(
        t, lp, eps: AdaptiveScale, inv_temp, z, u_steps, u_acc, im=None
    ):
        """One duplicate-on-reject HMC transition.

        t: (P, L) positions; lp: (1, L) tempered log-probs;
        z: (P, L) standard normals; u_steps/u_acc: (1, L) uniforms;
        im: (P, 1) diagonal inverse mass VALUE or None (unit mass) —
        threaded as a value because a Pallas kernel cannot close over
        array constants. Returns (t, lp, eps, accepted, n_steps).
        """
        if im is None:
            velocity = lambda r: r
            mom_scale = None
        else:
            velocity = lambda r: im * r
            mom_scale = 1.0 / jnp.sqrt(im)

        def kinetic(r):
            return 0.5 * jnp.sum(r * velocity(r), axis=0, keepdims=True)

        r0 = z if mom_scale is None else mom_scale * z
        h0 = kinetic(r0) - lp

        n_steps = jnp.minimum(
            (steps * (1.0 + (u_steps - 0.5) * 0.2)).astype(jnp.int32),
            max_steps,
        )

        epsilon = eps.value
        r_step = inv_temp * epsilon
        r = r0 + (0.5 * r_step) * grad_cols(t)

        def body(i, carry):
            tc, rc = carry
            active = i < n_steps
            kick = jnp.where(i == n_steps - 1, 0.5, 1.0)
            t2 = tc + epsilon * velocity(rc)
            r2 = rc + (kick * r_step) * grad_cols(t2)
            return (
                jnp.where(active, t2, tc),
                jnp.where(active, r2, rc),
            )

        t_prop, r = lax.fori_loop(0, max_steps, body, (t, r))

        p = logp_cols(t_prop) * inv_temp
        h = kinetic(r) - p
        accept_prob = jnp.exp(h0 - h)
        submitted = jnp.where(
            jnp.isfinite(accept_prob), jnp.minimum(accept_prob, 1.0), 0.0
        )
        eps = submit_accept_prob(
            eps,
            submitted,
            target=EPS_TARGET,
            growth_factor=EPS_GROWTH,
            adjust_power=EPS_POWER,
            adjust_min=EPS_MIN_ADJ,
            adjust_max=EPS_MAX_ADJ,
            var_floor=EPS_VAR_FLOOR,
        )
        accepted = (accept_prob >= 1.0) | (u_acc <= accept_prob)
        t_new = jnp.where(accepted, t_prop, t)
        lp_new = jnp.where(accepted, p, lp)
        return t_new, lp_new, eps, accepted, n_steps

    return transition


def _batch_posterior(logp_fn):
    """Column-batched value-and-gradient map of a per-chain posterior:
    ``(P, L) -> ((1, L), (P, L))``."""
    vg = jax.vmap(
        jax.value_and_grad(logp_fn), in_axes=1, out_axes=(0, 1)
    )

    def vg_cols(t):
        v, g = vg(t)
        return v.reshape(1, t.shape[1]), g

    return vg_cols


_CONVERT_CACHE = {}


def _converted_posterior(logp_fn, P: int, lanes: int):
    """Closure-convert the column-batched posterior so arrays captured in
    the user's closure (data, inverse covariances, forward matrices)
    become explicit operands — a Pallas kernel cannot close over array
    constants, and threading them as runtime inputs also keeps them out
    of the compile payload (an HLO-constant N x N array broke remote
    compilation once already — see BENCH_NOTES "Practical notes")."""
    import weakref

    entry = _CONVERT_CACHE.get(id(logp_fn))
    if entry is None or entry[0]() is not logp_fn:
        try:
            ref = weakref.ref(logp_fn)
        except TypeError:  # some callables are not weakref-able
            ref = lambda fn=logp_fn: fn
        entry = (ref, {})
        _CONVERT_CACHE[id(logp_fn)] = entry
    by_shape = entry[1]
    key = (P, lanes)
    if key not in by_shape:
        vg_cols = _batch_posterior(logp_fn)
        example = jnp.zeros((P, lanes), jnp.float32)
        # jax.closure_convert hoists only differentiation tracers; trace
        # to jaxprs and hoist EVERY captured array constant. VALUE and
        # GRADIENT are traced separately so each jaxpr is dead-code
        # eliminated at trace time — the kernel evaluates the gradient
        # ~55 times per transition and the value once, and an interpreter
        # that walked one combined jaxpr would pay both costs every call.
        closed_v = jax.make_jaxpr(lambda t: vg_cols(t)[0])(example)
        closed_g = jax.make_jaxpr(lambda t: vg_cols(t)[1])(example)
        consts = tuple(
            jnp.asarray(c) for c in (*closed_v.consts, *closed_g.consts)
        )
        n_v = len(closed_v.consts)

        def pure_v(t, *cs):
            (v,) = _eval_jaxpr_debatched(closed_v.jaxpr, list(cs[:n_v]), t)
            return v

        def pure_g(t, *cs):
            (g,) = _eval_jaxpr_debatched(closed_g.jaxpr, list(cs[n_v:]), t)
            return g

        by_shape[key] = ((pure_v, pure_g), consts)
    return by_shape[key]


def _manual_dot_general(lhs, rhs, dimension_numbers, **_):
    """dot_general as broadcast-multiply + reduce. Used for the batched
    dots that vmapping a posterior over the lane axis produces (e.g. the
    per-column quadratic form ``t_i @ A @ t_i`` becomes a dot_general
    whose BATCH dimension is the lane axis) — Mosaic's dot lowering
    rejects those, and on the VPU the expansion is the natural form
    anyway. Memory cost is (batch, lhs_free, rhs_free, contract), which
    for lane-batched vector dots is just (lanes, P)."""
    (lc, rc), (lb, rb) = dimension_numbers
    if lhs.ndim == 0 or rhs.ndim == 0:
        # scalar-times-array dots (vmap emits these for constant
        # multiplies): plain broadcasting, no rank-0 reshapes (Mosaic
        # rejects scalar vector.broadcast ops)
        return lhs * rhs
    lhs_free = [d for d in range(lhs.ndim) if d not in set(lc) | set(lb)]
    rhs_free = [d for d in range(rhs.ndim) if d not in set(rc) | set(rb)]
    # transpose to (batch..., free..., contract...)
    l = jnp.transpose(lhs, list(lb) + lhs_free + list(lc))
    r = jnp.transpose(rhs, list(rb) + rhs_free + list(rc))
    B, M, N, C = len(lb), len(lhs_free), len(rhs_free), len(lc)
    # insert singleton axes so l is (B, M, 1*N, C) and r is (B, 1*M, N, C)
    for _i in range(N):
        l = jnp.expand_dims(l, B + M)
    for _i in range(M):
        r = jnp.expand_dims(r, B)
    out = l * r
    return out.sum(axis=tuple(range(out.ndim - C, out.ndim))) if C else out


def _eval_jaxpr_debatched(jaxpr, consts, *args):
    """Evaluate a jaxpr, rewriting every ``dot_general`` that carries
    batch dimensions into the elementwise expansion above (recursing
    into pjit/closed-call sub-jaxprs). All other primitives bind
    unchanged."""
    from jax.extend import core as jcore
    from jax import lax as jlax

    env = {}

    def read(a):
        return a.val if isinstance(a, jcore.Literal) else env[id(a)]

    def write(v, val):
        env[id(v)] = val

    for v, c in zip(jaxpr.constvars, consts):
        write(v, c)
    for v, a in zip(jaxpr.invars, args):
        write(v, a)

    def expand_dot(lhs, rhs, dims):
        """Mosaic's dot lowering accepts only the clean matmul form:
        unbatched, rank <= 2, exactly one contracting dim per side.
        Everything else (lane-batched quadratic forms, outer products,
        higher-rank dots from vmapped user code) expands to
        broadcast-multiply + reduce — which is also the natural VPU
        form at sampler-sized shapes. ``_EXPAND_ALL_DOTS`` additionally
        expands the legal small matmuls (an MXU dot with K, M ~ P is
        latency-bound; the expansion keeps the work on the VPU)."""
        if _EXPAND_ALL_DOTS:
            return True
        (lc, rc), (lb, rb) = dims
        return (
            bool(lb)
            or bool(rb)
            or len(lc) != 1
            or lhs.ndim > 2
            or rhs.ndim > 2
        )

    for eqn in jaxpr.eqns:
        invals = [read(a) for a in eqn.invars]
        prim = eqn.primitive
        if prim is jlax.dot_general_p and expand_dot(
            invals[0], invals[1], eqn.params["dimension_numbers"]
        ):
            out = _manual_dot_general(
                invals[0], invals[1], eqn.params["dimension_numbers"]
            )
            outvals = [out]
        elif (
            prim.name == "reshape"
            and tuple(eqn.params["new_sizes"]) == tuple(invals[0].shape)
        ):
            # identity reshapes (e.g. the scalar () -> () emitted by the
            # posterior wrapper's .reshape(())) crash Mosaic's
            # verification ('vector.broadcast' f32 -> f32); drop them
            outvals = [invals[0]]
        elif prim.name in ("pjit", "closed_call") and "jaxpr" in eqn.params:
            # inline pure call-like sub-jaxprs so their dots are also
            # rewritten; control-flow primitives (scan/while/cond) bind
            # unchanged — their bodies rarely contain lane-batched dots
            sub = eqn.params["jaxpr"]
            sub_jaxpr = sub.jaxpr if hasattr(sub, "jaxpr") else sub
            sub_consts = list(sub.consts) if hasattr(sub, "consts") else []
            outvals = _eval_jaxpr_debatched(sub_jaxpr, sub_consts, *invals)
        else:
            outvals = prim.bind(*invals, **eqn.params)
            if not prim.multiple_results:
                outvals = [outvals]
        for v, val in zip(eqn.outvars, outvals):
            write(v, val)

    return [read(v) for v in jaxpr.outvars]


def _as_2d(c):
    """Reshape a closure constant to >= 2 dims for TPU block layout."""
    c = jnp.asarray(c)
    if c.ndim == 0:
        return c.reshape(1, 1)
    if c.ndim == 1:
        return c.reshape(1, -1)
    if c.ndim == 2:
        return c
    return c.reshape(-1, c.shape[-1])


def _make_chunk_kernel(
    pure_vg, const_shapes, P: int, steps: int, chunk: int, store: bool,
    has_mass: bool,
):
    max_steps = max(int(steps * 1.1), 1)
    n_consts = len(const_shapes)

    def kernel(*refs):
        (
            theta_ref, logp_ref, ev_ref, ea_ref, evr_ref, en_ref, ec_ref,
            it_ref, z_ref, us_ref, ua_ref,
        ) = refs[:11]
        im_ref = refs[11] if has_mass else None
        n_lead = 12 if has_mass else 11
        const_refs = refs[n_lead:n_lead + n_consts]
        out_refs = refs[n_lead + n_consts:]
        (
            theta_o, logp_o, ev_o, ea_o, evr_o, en_o, ec_o,
        ) = out_refs[:7]
        hist_refs = out_refs[7:]

        consts = [
            cref[:].reshape(shape)
            for cref, shape in zip(const_refs, const_shapes)
        ]
        pure_v, pure_g = pure_vg
        transition = _transition_math(
            lambda t: pure_v(t, *consts),
            lambda t: pure_g(t, *consts),
            steps,
            max_steps,
        )
        inv_temp = it_ref[:]
        im = im_ref[:].reshape(P, 1) if has_mass else None

        def body(i, carry):
            t, lp, eps = carry
            z = z_ref[i]
            u_steps = us_ref[i]
            u_acc = ua_ref[i]
            t, lp, eps, _, n_steps = transition(
                t, lp, eps, inv_temp, z, u_steps, u_acc, im
            )
            if store:
                ht, hp, hs, he = hist_refs
                ht[i] = t
                hp[i] = lp
                hs[i] = n_steps
                he[i] = eps.value
            return (t, lp, eps)

        eps0 = AdaptiveScale(
            value=ev_ref[:], avg=ea_ref[:], var=evr_ref[:],
            num=en_ref[:], chk_int=ec_ref[:],
        )
        t, lp, eps = lax.fori_loop(
            0, chunk, body, (theta_ref[:], logp_ref[:], eps0)
        )
        theta_o[:] = t
        logp_o[:] = lp
        ev_o[:] = eps.value
        ea_o[:] = eps.avg
        evr_o[:] = eps.var
        en_o[:] = eps.num
        ec_o[:] = eps.chk_int

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "pure_vg", "const_shapes", "steps", "chunk", "store",
        "interpret", "lanes", "inv_mass_diag",
    ),
)
def _run_chunk(
    theta, logp, ev, ea, evr, en, ec, inv_temp, key, consts,
    *, pure_vg, const_shapes, steps, chunk, store, interpret, lanes,
    inv_mass_diag=None,
):
    """One fused chunk over all chains. Arrays arrive transposed/padded:
    theta (P, K), per-chain scalars (1, K); K a multiple of ``lanes``.
    The chunk's random numbers are drawn here (inside the compiled
    program) from ``key`` and streamed into the kernel as operands;
    ``consts`` are the posterior's closure-converted captured arrays."""
    P, K = theta.shape
    grid = (K // lanes,)
    has_mass = inv_mass_diag is not None
    kernel = _make_chunk_kernel(
        pure_vg, const_shapes, P, steps, chunk, store, has_mass
    )
    kz, ks, ka = jax.random.split(key, 3)
    f32_ = jnp.float32
    z = jax.random.normal(kz, (chunk, P, K), f32_)
    us = jax.random.uniform(ks, (chunk, 1, K), f32_)
    ua = jax.random.uniform(ka, (chunk, 1, K), f32_)

    mass_ops = (
        [jnp.asarray(inv_mass_diag, f32_).reshape(1, P)] if has_mass else []
    )
    consts_2d = [_as_2d(c) for c in consts]

    def col(block_rows):
        return pl.BlockSpec((block_rows, lanes), lambda i: (0, i))

    def stream(block_rows):
        return pl.BlockSpec(
            (chunk, block_rows, lanes), lambda i: (0, 0, i)
        )

    def const_spec(c):
        # every tile reads the whole constant
        return pl.BlockSpec(c.shape, lambda i: (0, 0))

    f32, i32 = jnp.float32, jnp.int32
    out_shape = [
        jax.ShapeDtypeStruct((P, K), f32),
        jax.ShapeDtypeStruct((1, K), f32),
        jax.ShapeDtypeStruct((1, K), f32),
        jax.ShapeDtypeStruct((1, K), f32),
        jax.ShapeDtypeStruct((1, K), f32),
        jax.ShapeDtypeStruct((1, K), i32),
        jax.ShapeDtypeStruct((1, K), i32),
    ]
    out_specs = [col(P)] + [col(1)] * 6
    if store:
        out_shape += [
            jax.ShapeDtypeStruct((chunk, P, K), f32),
            jax.ShapeDtypeStruct((chunk, 1, K), f32),
            jax.ShapeDtypeStruct((chunk, 1, K), i32),
            jax.ShapeDtypeStruct((chunk, 1, K), f32),
        ]
        out_specs += [stream(P), stream(1), stream(1), stream(1)]

    with _x64_off_ctx():
        outs = pl.pallas_call(
            kernel,
            out_shape=tuple(out_shape),
            grid=grid,
            in_specs=[
                col(P),          # theta
                col(1), col(1), col(1), col(1), col(1), col(1),
                col(1),          # inv_temp
                stream(P),       # z
                stream(1),       # u_steps
                stream(1),       # u_accept
            ]
            + [const_spec(c) for c in mass_ops]
            + [const_spec(c) for c in consts_2d],
            out_specs=tuple(out_specs),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel",),
            ),
            interpret=interpret,
        )(
            theta, logp, ev, ea, evr, en, ec, inv_temp, z, us, ua,
            *mass_ops, *consts_2d,
        )
    return outs


def _reference_chunk(
    theta, logp, eps, inv_temp, z, us, ua, *, logp_fn, steps, inv_mass_diag
):
    """Pure-jax mirror of one kernel chunk (same transition math, plain
    lax.scan over transitions) — the CPU/compat execution path and the
    exactness oracle for the Pallas kernel in tests."""
    max_steps = max(int(steps * 1.1), 1)
    vg_cols = _batch_posterior(logp_fn)
    transition = _transition_math(
        lambda t: vg_cols(t)[0], lambda t: vg_cols(t)[1], steps, max_steps
    )
    im = (
        None
        if inv_mass_diag is None
        else jnp.asarray(inv_mass_diag, jnp.float32).reshape(-1, 1)
    )

    def body(carry, xs):
        t, lp, e = carry
        zi, usi, uai = xs
        t, lp, e, _, n_steps = transition(
            t, lp, e, inv_temp, zi, usi, uai, im
        )
        return (t, lp, e), (t, lp, n_steps, e.value)

    (t, lp, e), hist = lax.scan(body, (theta, logp, eps), (z, us, ua))
    return t, lp, e, hist


class FusedHmc(NamedTuple):
    """Plan for fused advances over a ChainArray-style HMC state."""

    logp_fn: object
    steps: int
    inv_mass_diag: object   # None | (P,) ndarray
    lanes: int
    chunk: int
    interpret: bool


def plan_fused_hmc(
    logp_fn, n_parameters: int, *, steps: int, inverse_mass=None,
    lanes: int = _LANES, chunk: int = _CHUNK, interpret=None,
):
    """Validate the configuration and build a fused-advance plan, or
    raise ``ValueError`` describing why the fused path cannot apply."""
    if inverse_mass is None:
        im = None
    else:
        im = np.asarray(inverse_mass, dtype=np.float32)
        if im.ndim == 0:
            im = np.full(n_parameters, float(im), np.float32)
        if im.ndim != 1 or im.shape[0] != n_parameters:
            raise ValueError(
                "[ fused hmc ] only unit/scalar/diagonal inverse mass is "
                "supported by the fused kernel."
            )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return FusedHmc(
        logp_fn=logp_fn,
        steps=int(steps),
        inv_mass_diag=None if im is None else tuple(im.tolist()),
        lanes=int(lanes),
        chunk=int(chunk),
        interpret=bool(interpret),
    )


def fused_hmc_advance(plan: FusedHmc, state, n: int, store: bool):
    """Advance an ``HmcState`` batch ``n`` transitions through the fused
    kernel. Returns ``(new_state, (theta_hist, logp_hist, steps_hist,
    eps_hist) or None)`` with history shaped like the XLA kernel's scan
    outputs: ``(n, K, P)`` / ``(n, K)``."""
    K, P = state.theta.shape
    lanes = min(plan.lanes, 128 * max(1, K // 128)) if K >= 128 else K
    pad = (-K) % lanes if K >= 128 else 0
    if K < 128:
        # tiny batches: single tile of K lanes is illegal (<128); fall
        # back to the mirror implementation — it is the same math
        return _advance_mirror(plan, state, n, store)

    def prep(x, fill=None):
        x = jnp.asarray(x)
        if pad:
            tail = x[-1:] if fill is None else jnp.full_like(x[-1:], fill)
            x = jnp.concatenate(
                [x, jnp.broadcast_to(tail, (pad,) + x.shape[1:])], axis=0
            )
        return x

    theta = prep(state.theta).T                      # (P, Kp)
    f32 = jnp.float32
    row = lambda x: prep(x).reshape(1, -1)
    logp = row(state.logp).astype(f32)
    ev = row(state.eps.value).astype(f32)
    ea = row(state.eps.avg).astype(f32)
    evr = row(state.eps.var).astype(f32)
    en = row(state.eps.num)
    ec = row(state.eps.chk_int)
    it = row(state.inv_temp).astype(f32)
    theta = theta.astype(f32)
    Kp = theta.shape[1]

    master = state.key[0]
    n_chunks, rem = divmod(n, plan.chunk)

    pure_vg, consts = _converted_posterior(plan.logp_fn, P, lanes)
    kw = dict(
        pure_vg=pure_vg,
        const_shapes=tuple(tuple(c.shape) for c in consts),
        steps=plan.steps,
        store=store,
        interpret=plan.interpret,
        lanes=lanes,
        inv_mass_diag=plan.inv_mass_diag,
    )

    carry = (theta, logp, ev, ea, evr, en, ec)
    hists = []
    for j in range(n_chunks + (1 if rem else 0)):
        chunk = plan.chunk if j < n_chunks else rem
        outs = _run_chunk(
            *carry, it, jax.random.fold_in(master, j), tuple(consts),
            chunk=chunk, **kw
        )
        carry = outs[:7]
        if store:
            hists.append(outs[7:])

    theta, logp, ev, ea, evr, en, ec = carry
    dt = state.theta.dtype
    new_state = state._replace(
        theta=theta.T[:K].astype(dt),
        logp=logp.reshape(-1)[:K].astype(state.logp.dtype),
        eps=AdaptiveScale(
            value=ev.reshape(-1)[:K].astype(state.eps.value.dtype),
            avg=ea.reshape(-1)[:K].astype(state.eps.avg.dtype),
            var=evr.reshape(-1)[:K].astype(state.eps.var.dtype),
            num=en.reshape(-1)[:K],
            chk_int=ec.reshape(-1)[:K],
        ),
        key=jax.vmap(lambda k: jax.random.split(k, 1)[0])(state.key),
    )
    if not store:
        return new_state, None
    ht = jnp.concatenate([h[0] for h in hists], axis=0)  # (n, P, Kp)
    hp = jnp.concatenate([h[1] for h in hists], axis=0)  # (n, 1, Kp)
    hs = jnp.concatenate([h[2] for h in hists], axis=0)
    he = jnp.concatenate([h[3] for h in hists], axis=0)
    hist = (
        jnp.swapaxes(ht, 1, 2)[:, :K, :].astype(dt),   # (n, K, P)
        hp[:, 0, :K].astype(dt),                       # (n, K)
        hs[:, 0, :K],
        he[:, 0, :K].astype(dt),
    )
    return new_state, hist


def _advance_mirror(plan: FusedHmc, state, n: int, store: bool):
    """Same advance via the pure-jax mirror (tiny batches and non-TPU
    correctness paths)."""
    K, P = state.theta.shape
    f32 = jnp.float32
    theta = jnp.asarray(state.theta).T.astype(f32)
    row = lambda x: jnp.asarray(x).reshape(1, -1)
    eps = AdaptiveScale(
        value=row(state.eps.value).astype(f32),
        avg=row(state.eps.avg).astype(f32),
        var=row(state.eps.var).astype(f32),
        num=row(state.eps.num),
        chk_int=row(state.eps.chk_int),
    )
    it = row(state.inv_temp).astype(f32)
    master = state.key[0]
    kz, ks, ka = jax.random.split(jax.random.fold_in(master, 0), 3)
    z = jax.random.normal(kz, (n, P, K), f32)
    us = jax.random.uniform(ks, (n, 1, K), f32)
    ua = jax.random.uniform(ka, (n, 1, K), f32)
    im = (
        None
        if plan.inv_mass_diag is None
        else np.asarray(plan.inv_mass_diag, np.float32)
    )
    t, lp, e, hist = _reference_chunk(
        theta, row(state.logp).astype(f32), eps, it, z, us, ua,
        logp_fn=plan.logp_fn, steps=plan.steps, inv_mass_diag=im,
    )
    dt = state.theta.dtype
    new_state = state._replace(
        theta=t.T.astype(dt),
        logp=lp.reshape(-1).astype(state.logp.dtype),
        eps=AdaptiveScale(
            value=e.value.reshape(-1).astype(state.eps.value.dtype),
            avg=e.avg.reshape(-1).astype(state.eps.avg.dtype),
            var=e.var.reshape(-1).astype(state.eps.var.dtype),
            num=e.num.reshape(-1),
            chk_int=e.chk_int.reshape(-1),
        ),
        key=jax.vmap(lambda k: jax.random.split(k, 1)[0])(state.key),
    )
    if not store:
        return new_state, None
    ht, hp, hs, he = hist
    out = (
        jnp.swapaxes(ht, 1, 2).astype(dt),
        hp[:, 0, :].astype(dt),
        hs[:, 0, :],
        he[:, 0, :].astype(dt),
    )
    return new_state, out
