"""The adaptive Metropolis-Hastings kernel: a jitted, chunked ``lax.scan``.

This is the TPU-native rebuild of the reference's hot loop
(mcmc-fitting.lisp):
  - ``walker-take-step`` (1072-1095): propose via ``mean + L @ z``, accept
    iff ``prob1 > prob0`` or ``(prob1-prob0)/T > log U(0,1)`` (1091-1092).
  - ``walker-pretend-take-step`` (1097-1122): the greedy variant (no
    temperature term) used by the region-sampling tuner.
  - ``walker-adaptive-steps-full`` (862-942): cosine-oscillating annealing
    (877-878), acceptance-window L adaptation every 200 steps with the
    0.2-0.4 band and x0.1 / x1.9 rescales (929-942), covariance refresh
    with the Haario ``2.38^2/d`` factor applied to L (888-895).

TPU-first redesign (SURVEY §3.2/§7): one chain's mutable do-loop becomes a
``(W, d)`` walker *ensemble* advanced by a jitted ``lax.scan`` over a
200-step chunk.  Everything data-dependent inside the chunk is branchless
(`jnp.where`); adaptation happens at chunk boundaries inside the same jit
via masked updates, and the host driver (fit.py) only handles auto-stop,
logging, estop, and checkpointing between chunks — so the device never
waits on Python during the hot loop.

Covariance adaptation on device: instead of the reference's covariance of
diffs-of-forward-steps from a filtered history list (543, 614), the kernel
accumulates first/second moments of *accepted proposal displacements*
pooled over all walkers (the fixed-size on-device representation of
"recent accepted moves" — SURVEY §7 hard part b).  Under ``shard_map``
these moments are ``psum``-ed across devices, giving the single
cross-chain allreduce for pooled covariance adaptation in BASELINE.json.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax

from .ops.linalg import cholesky_clamped, haario_scale, moments_covariance

__all__ = ["FitConfig", "WalkerState", "init_state", "temperature_schedule", "build_chunk_runner"]


@dataclasses.dataclass(frozen=True)
class FitConfig:
    """All adaptation knobs, with the reference's exact defaults.

    Mirrors the keyword arguments + inline magic constants of
    ``walker-adaptive-steps-full`` (mcmc-fitting.lisp:862-942).  Frozen and
    hashable so it can be a jit static argument.
    """

    n_steps: int = 30000                 # walker-adaptive-steps default (946)
    temperature: float = 10.0            # wrapper default (947); -full default is 1d3 (862)
    chunk_size: int = 200                # adaptation cadence (929-931)
    accept_low: float = 0.2              # acceptance band (934)
    accept_high: float = 0.4
    scale_down: float = 0.1              # L rescale factors (940-942)
    scale_up: float = 1.9
    temp_period: int = 5000              # annealing divisor (878)
    settle_multiplier: int = 10          # steps-to-settle = 10*max(50, d) (873)
    settle_floor: int = 50
    auto: str | None = "prob-settle"     # :prob-settle | :slope-settle | None (862)
    max_history: int = 30000             # max-walker-length analogue (923-927)
    thin: int = 10                       # history thinning (device->host traffic)
    greedy: bool = False                 # pretend-take-step accept rule (1117)
    pooled_covariance: bool = True       # psum moments across shards (BASELINE.json)
    covariance_source: str = "moves"     # "moves" (reference policy) | "ensemble"
    jitter: float = 0.0                  # optional diagonal jitter on refresh

    def steps_to_settle(self, ndim: int) -> int:
        return self.settle_multiplier * max(self.settle_floor, ndim)

    def temp_steps(self, ndim: int) -> int:
        # temp-steps = max(n, 10*steps-to-settle) (875)
        return max(self.n_steps, 10 * self.steps_to_settle(ndim))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class WalkerState:
    """Ensemble chain state: the pytree that lives in the scan carry.

    The reference's mutable ``walker`` struct (mcmc-fitting.lisp:467-479)
    becomes this immutable batch-of-chains pytree; ``walker-modify``'s
    ``:add-step`` bookkeeping (549-555) becomes pure updates inside the
    scan.  ``W`` = walkers, ``d`` = parameters.
    """

    key: Any               # PRNG key
    position: Any          # (W, d) current params
    logprob: Any           # (W,) current log-posterior
    best_position: Any     # (W, d) per-walker most-likely params (503-505)
    best_logprob: Any      # (W,)
    l_matrix: Any          # (d, d) shared proposal factor (pooled adaptation)
    m_sum: Any             # (d,)  accepted-move moment accumulators
    m_outer: Any           # (d, d)
    m_count: Any           # ()    number of accepted moves pooled over walkers
    age: Any               # ()    lifetime steps (walker-age, 473)


def init_state(key, position, logprob, l_matrix) -> WalkerState:
    """Build the initial ensemble state (``walker-create``'s first step)."""
    W, d = position.shape
    dtype = position.dtype
    best_logprob = logprob
    return WalkerState(
        key=key,
        position=position,
        logprob=logprob,
        best_position=position,
        best_logprob=best_logprob,
        l_matrix=jnp.asarray(l_matrix, dtype),
        m_sum=jnp.zeros((d,), dtype),
        m_outer=jnp.zeros((d, d), dtype),
        m_count=jnp.zeros((), dtype),
        age=jnp.zeros((), jnp.int32),
    )


def temperature_schedule(i, ndim: int, config: FitConfig):
    """The cosine-oscillating annealing temperature (mcmc-fitting.lisp:878).

    ``temps[i] = max(1, cos(i * pi * (1 + 2*floor(TS/5000)) / (2*TS)) * T)``
    for ``i < TS`` (TS = temp-steps); 1 afterwards.  The odd multiplier
    makes the argument hit a cos zero exactly at ``i = TS``; the ``max``
    clamps the negative lobes so temperature oscillates between 1 and T
    with a ~``temp_period`` half-period (920-921).
    """
    ts = config.temp_steps(ndim)
    mult = 1 + 2 * (ts // config.temp_period)
    phase = i * math.pi * mult / (2.0 * ts)
    t = jnp.maximum(1.0, jnp.cos(phase) * config.temperature)
    return jnp.where(i < ts, t, 1.0)


def _neg_floor(dtype):
    """Large-negative stand-in for -inf that keeps (lp1-lp0)/T finite."""
    return jnp.asarray(jnp.finfo(dtype).min / 4, dtype)


def build_chunk_runner(log_posterior: Callable, ndim: int, config: FitConfig,
                       axis_name: str | None = None):
    """Compile the chunked MH scan for a given posterior.

    ``log_posterior(theta_vec) -> scalar`` evaluates ONE walker; it is
    vmapped here over the ``(W, d)`` batch so the likelihood reduction
    becomes one fused (W, N) elementwise block + masked sum per step.

    Returns ``run(state, start_step, temperature_override) -> (state, out)``
    where ``out`` is a dict of per-chunk metrics and thinned history.
    ``temperature_override``: <0 means "use the annealing schedule";
    otherwise a fixed temperature (the driver passes 1.0 once shutting
    down, mcmc-fitting.lisp:915).

    ``axis_name``: when running under ``shard_map``, the mesh axis to
    ``psum`` pooled moments/acceptance over (C24 rebuild).
    """
    batched_logpost = jax.vmap(log_posterior)
    settle = config.steps_to_settle(ndim)
    refresh_period = 2 * settle  # covariance refresh cadence (932)
    chunk = config.chunk_size
    thin = max(1, min(config.thin, chunk))
    keep = chunk // thin

    def pooled_mean(x):
        m = jnp.mean(x)
        if axis_name is not None and config.pooled_covariance:
            m = lax.pmean(m, axis_name)
        return m

    def pooled_sum(x):
        if axis_name is not None and config.pooled_covariance:
            return lax.psum(x, axis_name)
        return x

    def one_step(carry, i):
        state: WalkerState = carry
        dtype = state.position.dtype
        key, k_prop, k_accept = jax.random.split(state.key, 3)
        temp = temperature_schedule(state.age, ndim, config)

        z = jax.random.normal(k_prop, state.position.shape, dtype)
        proposal = state.position + jnp.einsum("ij,wj->wi", state.l_matrix, z)
        lp_prop = batched_logpost(proposal)
        # NaN/complex guard: the walker-check-for-complex-walks analogue
        # (483) — a non-finite posterior is treated as "reject hard".
        lp_prop = jnp.where(jnp.isfinite(lp_prop), lp_prop, _neg_floor(dtype))

        log_u = jnp.log(jax.random.uniform(k_accept, state.logprob.shape, dtype))
        if config.greedy:
            # walker-pretend-take-step accept rule (1117-1119)
            accept = lp_prop > state.logprob
        else:
            # walker-take-step accept rule (1091-1092)
            accept = (lp_prop > state.logprob) | ((lp_prop - state.logprob) / temp > log_u)

        acc = accept[:, None]
        new_position = jnp.where(acc, proposal, state.position)
        new_logprob = jnp.where(accept, lp_prop, state.logprob)

        # Accepted-move moments for covariance adaptation (pooled over W).
        delta = (proposal - state.position) * acc.astype(dtype)
        m_sum = state.m_sum + jnp.sum(delta, axis=0)
        m_outer = state.m_outer + jnp.einsum("wi,wj->ij", delta, delta)
        m_count = state.m_count + jnp.sum(accept.astype(dtype))

        # Most-likely-step tracking (553-555), per walker.
        better = new_logprob > state.best_logprob
        best_position = jnp.where(better[:, None], new_position, state.best_position)
        best_logprob = jnp.where(better, new_logprob, state.best_logprob)

        new_state = WalkerState(
            key=key,
            position=new_position,
            logprob=new_logprob,
            best_position=best_position,
            best_logprob=best_logprob,
            l_matrix=state.l_matrix,
            m_sum=m_sum,
            m_outer=m_outer,
            m_count=m_count,
            age=state.age + 1,
        )
        out = {
            "logprob_max": jnp.max(new_logprob),
            "logprob_mean": jnp.mean(new_logprob),
            "logprob_min": jnp.min(new_logprob),
            "accept_rate": jnp.mean(accept.astype(dtype)),
        }
        return new_state, out

    def adapt(state: WalkerState, chunk_accept, allow_refresh):
        """Chunk-boundary L update (mcmc-fitting.lisp:929-942), branchless."""
        dtype = state.position.dtype
        acc = pooled_mean(chunk_accept)
        d = ndim

        # Candidate refresh from pooled accepted-move covariance.
        if config.covariance_source == "ensemble":
            mean = pooled_mean_vec(state.position)
            centered = state.position - mean
            outer = pooled_sum(jnp.einsum("wi,wj->ij", centered, centered))
            count = pooled_sum(jnp.asarray(state.position.shape[0], dtype))
            cov = outer / count
            enough = count > d
        else:
            m_sum = pooled_sum(state.m_sum)
            m_outer = pooled_sum(state.m_outer)
            m_count = pooled_sum(state.m_count)
            cov = moments_covariance(m_sum, m_outer, m_count)
            enough = m_count > d
        if config.jitter > 0:
            cov = cov + config.jitter * jnp.eye(d, dtype=dtype)
        chol, ok = cholesky_clamped(cov)
        # Reference scales the L-matrix by 2.38^2/d (890) — replicated.
        candidate = jnp.asarray(haario_scale(d), dtype) * chol
        refresh_ok = ok & enough & allow_refresh

        in_band = (config.accept_low < acc) & (acc < config.accept_high)
        too_low = acc <= config.accept_low

        l_refreshed = jnp.where(refresh_ok, candidate, state.l_matrix)
        l_rescaled = jnp.where(
            too_low, config.scale_down * state.l_matrix, config.scale_up * state.l_matrix
        )
        new_l = jnp.where(in_band, l_refreshed, l_rescaled)

        # Reset move moments after a refresh so the window stays recent.
        reset = refresh_ok & in_band
        zero = jnp.zeros_like
        return dataclasses.replace(
            state,
            l_matrix=new_l.astype(dtype),
            m_sum=jnp.where(reset, zero(state.m_sum), state.m_sum),
            m_outer=jnp.where(reset, zero(state.m_outer), state.m_outer),
            m_count=jnp.where(reset, zero(state.m_count), state.m_count),
        )

    def pooled_mean_vec(x):
        m = jnp.mean(x, axis=0)
        if axis_name is not None and config.pooled_covariance:
            m = lax.pmean(m, axis_name)
        return m

    def run(state: WalkerState, adapt_enabled, allow_refresh):
        """One chunk: ``chunk_size`` MH steps + one adaptation update.

        ``adapt_enabled``/``allow_refresh`` are traced booleans so the
        driver can disable adaptation (walker-many-steps, 849-853) or
        refresh (during shutdown, 932) without recompiling.
        """
        state, trace = lax.scan(one_step, state, jnp.arange(chunk))
        chunk_accept = jnp.mean(trace["accept_rate"])
        adapted = adapt(state, chunk_accept, allow_refresh)
        state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(adapt_enabled, a, b), adapted, state
        )
        out = {
            "logprob_max": trace["logprob_max"],      # (chunk,)
            "logprob_mean": trace["logprob_mean"],    # (chunk,)
            "logprob_min": trace["logprob_min"],      # (chunk,)
            "accept_rate": chunk_accept,              # ()
        }
        return state, out

    def run_with_history(state: WalkerState, adapt_enabled, allow_refresh):
        """Chunk runner that also returns thinned position history.

        History is collected on device as ``(keep, W, d)`` (every
        ``thin``-th step) — the ring-buffer replacement for the
        reference's cons-list walk (SURVEY §3.3).
        """
        def one_step_hist(carry, i):
            st, out = one_step(carry, i)
            return st, (out, st.position, st.logprob)

        state, (trace, positions, logprobs) = lax.scan(
            one_step_hist, state, jnp.arange(chunk)
        )
        chunk_accept = jnp.mean(trace["accept_rate"])
        adapted = adapt(state, chunk_accept, allow_refresh)
        state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(adapt_enabled, a, b), adapted, state
        )
        # Thin on device before any host transfer.
        positions = positions[thin - 1 :: thin]      # (keep, W, d)
        logprobs = logprobs[thin - 1 :: thin]        # (keep, W)
        out = {
            "logprob_max": trace["logprob_max"],
            "logprob_mean": trace["logprob_mean"],
            "logprob_min": trace["logprob_min"],
            "accept_rate": chunk_accept,
            "positions": positions,
            "logprobs": logprobs,
        }
        return state, out

    return run, run_with_history
