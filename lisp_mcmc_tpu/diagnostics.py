"""Run diagnostics: metrics dict, convergence summary, failure detectors.

Rebuilds the reference's observability surface (SURVEY §5): the
``walker-get`` metric verbs (acceptance 506, likelihood trace 540,
stddev-params 525, covariance 541) become a structured per-run metrics
dict, extended with the ensemble statistics the single-chain reference
could not have (ESS, split R-hat across walkers) — the rebuild's primary
metric pair is chain-steps/sec and ESS/sec (BASELINE.md).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from .ops.reductions import effective_sample_size, split_rhat

__all__ = ["metrics", "ess_per_param", "ess_from_history", "rhat_per_param",
           "rhat_from_history", "summary", "trace_profile"]


def trace_profile(log_dir: str = "/tmp/lisp_mcmc_tpu_trace"):
    """Context manager: capture a ``jax.profiler`` trace of a fit.

    The rebuild's tracing subsystem (SURVEY §5: the reference had only ad
    hoc ``time`` forms in comment blocks, mcmc-fitting.lisp:59-63).  View
    the result with TensorBoard or Perfetto::

        with trace_profile("/tmp/fit_trace"):
            walker.adaptive_steps(30000)
    """
    import jax

    return jax.profiler.trace(log_dir)


def ess_per_param(walker, take: int | None = None) -> dict[str, float]:
    """Total effective sample size per parameter over all walkers."""
    pos, _ = walker._history(take)  # (T, W, d)
    return ess_from_history(jnp.asarray(pos), walker.spec.keys)


def ess_from_history(positions, keys) -> dict[str, float]:
    """ESS per parameter from a device-resident ``(T, W, d)`` history.

    The whole reduction runs on device; only ``d`` scalars transfer to the
    host (BASELINE.json: "diagnostics reduce on device before host
    transfer" — host round-trips of the raw history dominate otherwise).
    """
    positions = jnp.asarray(positions)
    return {
        k: float(effective_sample_size(positions[:, :, i]))
        for i, k in enumerate(keys)
    }


def rhat_per_param(walker, take: int | None = None) -> dict[str, float]:
    """Split R-hat per parameter across the walker ensemble."""
    pos, _ = walker._history(take)
    return rhat_from_history(pos, walker.spec.keys)


def rhat_from_history(positions, keys) -> dict[str, float]:
    """Split R-hat per parameter from an already-fetched (T, W, d) history."""
    positions = jnp.asarray(positions)
    return {
        k: float(split_rhat(positions[:, :, i])) for i, k in enumerate(keys)
    }


def metrics(walker, take: int | None = None, elapsed_seconds: float | None = None) -> dict[str, Any]:
    """Structured metrics snapshot for logging/observability.

    Includes the reference's per-run quantities (acceptance, best
    log-posterior, stddevs) plus ESS/R-hat and throughput when timing is
    provided.
    """
    lp_best, best = walker.most_likely_step()
    # One history fetch for everything below: _history concatenates the
    # whole retained (T, W, d) chunk list per call, which for a long run
    # is gigabytes of memory traffic — lp, ESS, and R-hat share it.
    pos, lp = walker._history(take)
    pos = jnp.asarray(pos)
    ess = ess_from_history(pos, walker.spec.keys)
    out = {
        "age": walker.age,
        "n_walkers": walker.n_walkers,
        "acceptance": walker.acceptance(take),
        "best_logprob": lp_best,
        "best_params": best,
        "logprob_quantiles": {
            "p05": float(np.quantile(lp, 0.05)),
            "p50": float(np.quantile(lp, 0.50)),
            "p95": float(np.quantile(lp, 0.95)),
        },
        "ess": ess,
        "min_ess": min(ess.values()) if ess else 0.0,
        "rhat": rhat_from_history(pos, walker.spec.keys),
    }
    if elapsed_seconds:
        out["chain_steps_per_sec"] = walker.age * walker.n_walkers / elapsed_seconds
        out["ess_per_sec"] = out["min_ess"] / elapsed_seconds
    return out


def summary(walker, take: int | None = None) -> str:
    """Human-readable fit report (the printed walker-step analogue,
    test.lisp:26-30)."""
    m = metrics(walker, take)
    lines = [
        f"walker ensemble: {m['n_walkers']} walkers x {m['age']} steps, "
        f"acceptance {m['acceptance']:.3f}",
        f"best log-posterior: {m['best_logprob']:.6f}",
        "params (best | R-hat | ESS):",
    ]
    for k in walker.spec.keys:
        lines.append(
            f"  {k:>12s} = {m['best_params'][k]: .8g}   "
            f"R-hat {m['rhat'][k]:.3f}   ESS {m['ess'][k]:.0f}"
        )
    return "\n".join(lines)
