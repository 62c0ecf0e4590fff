"""Prior system: flat priors, smooth bound penalties, constraint combinators.

Rebuilds the reference's prior layer (mcmc-fitting.lisp):
  - ``log-prior-flat`` (340-343): always 0.
  - ``prior-bounds-let`` macro (346-369): per-parameter (low, high) bounds
    with the smooth exterior penalty
        ``-1d10 * (exp(1d-5 * dist) - 1)``
    where ``dist`` is the distance to the *nearer* bound (358-360).  Inside
    the open interval the penalty is exactly 0.  The macro also exposes
    per-parameter penalties (``<name>-bound``) and their sum
    (``bounds-total``) so user priors can add extra terms.
  - data-dependent priors (``log-prior-fixer``, 837-840): a prior factory
    may return a specialized prior function when first called with data.
  - hard constraint style from ``nv-specific.lisp:31-34``: -1e9 penalties
    for inequality/ratio constraints between parameters.

TPU-first design: a prior is a pure function ``prior(params_dict, dataset)
-> scalar`` for one walker, vmapped over walkers by the kernel.  The bound
penalty is fully vectorized (`jnp.where`), so it fuses into the posterior
evaluation; there is no host-side control flow.
"""

from __future__ import annotations

from typing import Callable, Mapping

import jax.numpy as jnp

__all__ = [
    "log_prior_flat",
    "bound_penalty",
    "prior_bounds",
    "make_bounds_prior",
    "constraint_penalty",
    "combine_priors",
    "resolve_prior",
]

# Exact constants from mcmc-fitting.lisp:360.
_PENALTY_SCALE = -1e10
_PENALTY_RATE = 1e-5


def log_prior_flat(params, dataset=None):
    """``log-prior-flat`` (mcmc-fitting.lisp:340-343)."""
    return jnp.asarray(0.0)


def bound_penalty(value, low, high):
    """Smooth exterior penalty for one parameter (mcmc-fitting.lisp:358-360).

    0 inside the open interval (low, high); outside,
    ``-1e10 * (exp(1e-5 * min(|v-high|, |v-low|)) - 1)`` — an exponential
    gradient pointing back toward the feasible region.
    """
    value = jnp.asarray(value)
    dist = jnp.minimum(jnp.abs(value - high), jnp.abs(value - low))
    outside = _PENALTY_SCALE * (jnp.exp(_PENALTY_RATE * dist) - 1.0)
    inside = (low < value) & (value < high)
    return jnp.where(inside, 0.0, outside)


def prior_bounds(params: Mapping, bounds: Mapping[str, tuple]) -> dict:
    """Per-parameter penalties + total, the ``prior-bounds-let`` anaphora.

    Returns ``{"<name>_bound": penalty, ..., "bounds_total": sum}`` — the
    vectorized analogue of the macro's generated ``<name>-bound`` variables
    and ``bounds-total`` (mcmc-fitting.lisp:366-368).
    """
    out = {}
    total = jnp.asarray(0.0)
    for name, (low, high) in bounds.items():
        key = name[1:] if name.startswith(":") else name
        p = bound_penalty(params[key], low, high)
        out[f"{key}_bound"] = p
        total = total + p
    out["bounds_total"] = total
    return out


def make_bounds_prior(bounds: Mapping[str, tuple], extra: Callable | None = None):
    """Build a prior from a bounds table; the common ``prior-bounds-let`` use.

    ``extra(params, penalties, dataset) -> scalar`` may add constraint terms
    on top of ``penalties["bounds_total"]`` (e.g. nv-specific.lisp:31-34).
    """

    def prior(params, dataset=None):
        penalties = prior_bounds(params, bounds)
        total = penalties["bounds_total"]
        if extra is not None:
            total = total + extra(params, penalties, dataset)
        return total

    # Checkpointability: the closure carries its own recipe, so
    # checkpoint.py can serialize the bounds table (+ the extra's NAME,
    # resolved from a registry on load) instead of refusing closures.
    prior._bounds = dict(bounds)
    prior._extra = extra
    prior.__name__ = "bounds_prior"
    return prior


def constraint_penalty(satisfied, penalty=-1e9):
    """Hard constraint term: 0 when satisfied, ``penalty`` otherwise.

    The vectorized form of nv-specific.lisp:31-34's
    ``(if (> mu1 mu2) -1e9 0e0)`` constraints.
    """
    return jnp.where(satisfied, 0.0, penalty)


def combine_priors(*priors: Callable):
    """Sum several priors into one."""

    def prior(params, dataset=None):
        total = jnp.asarray(0.0)
        for p in priors:
            total = total + p(params, dataset)
        return total

    return prior


def resolve_prior(prior, params, dataset):
    """Resolve a data-dependent prior factory (``log-prior-fixer``, 837-840).

    If calling the prior yields a callable, that callable is the actual
    prior (specialized to the data); a numeric result means it already was.
    """
    result = prior(params, dataset)
    if callable(result):
        return result
    return prior
