"""Posterior predictive sampling and predictive checks.

The forward half of the predictive toolchain: WAIC/PSIS-LOO
(``diagnostics``) score models by *densities* of the observed points;
this module *generates* replicated datasets y_rep ~ p(y | theta_s) from
the posterior history and compares them to the observed data — the
classic posterior predictive check (Gelman, Meng & Stern 1996).  The
reference's nearest surface is the fit-envelope plot
(mcmc-fitting.lisp:1250-1257), which bands the *mean curve* only; the
predictive band here additionally carries the observation noise, so
"does the model explain the scatter?" becomes answerable, not just
"does the mean curve pass through?".

Noise models are dispatched on the same likelihood identities as
``likelihoods.pointwise_log_likelihood``: Gaussian likelihoods draw
``N(f(x, theta), sigma)``, the Poisson reduction draws
``Poisson(f(x, theta))``, and likelihoods built by
``create_log_likelihood_function`` require an explicit ``sampler=``
(their density carries no recipe for drawing).

All model evaluations run as one jitted vmap per dataset term on
device; only the (S, N) replicate matrix transfers to the host.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .likelihoods import (
    log_likelihood_normal,
    log_likelihood_normal_cutoff,
    log_likelihood_poisson,
)

__all__ = ["PredictiveDraws", "Prediction", "posterior_predictive",
           "prior_predictive", "predict", "ppc_pvalue"]


@dataclasses.dataclass(frozen=True)
class PredictiveDraws:
    """Replicated observations for one dataset term (real points only).

    ``x``: (N,) or (N, k) abscissae; ``y_obs``: (N,) the observed data;
    ``y_rep``: (S, N) posterior predictive replicates; ``mu``: (S, N)
    the noiseless model curves (the envelope's raw material).
    """

    term_index: int
    x: np.ndarray
    y_obs: np.ndarray
    y_rep: np.ndarray
    mu: np.ndarray

    def band(self, lo: float = 0.05, hi: float = 0.95):
        """Pointwise (lo, hi) predictive quantile band, each (N,)."""
        return (np.quantile(self.y_rep, lo, axis=0),
                np.quantile(self.y_rep, hi, axis=0))

    def coverage(self, lo: float = 0.05, hi: float = 0.95) -> float:
        """Fraction of observed points inside the (lo, hi) band.

        A calibrated model covers ~``hi - lo`` of its own data; far less
        means the noise model is too tight (or the fit is off), far more
        means ``data_error`` overstates the noise.
        """
        b_lo, b_hi = self.band(lo, hi)
        return float(np.mean((self.y_obs >= b_lo) & (self.y_obs <= b_hi)))


@dataclasses.dataclass(frozen=True)
class Prediction:
    """Posterior prediction on a caller-chosen grid.

    ``mu``: (S, N) posterior draws of the model curve at ``x``;
    ``y_rep``: (S, N) with observation noise added, or None when no
    noise level was given.  ``band`` uses ``y_rep`` when present (a
    prediction interval for new OBSERVATIONS), else ``mu`` (a credible
    interval for the CURVE) — quote the right one.
    """

    x: np.ndarray
    mu: np.ndarray
    y_rep: np.ndarray | None

    def mean(self):
        return self.mu.mean(axis=0)

    def band(self, lo: float = 0.05, hi: float = 0.95):
        src = self.y_rep if self.y_rep is not None else self.mu
        return (np.quantile(src, lo, axis=0), np.quantile(src, hi, axis=0))


def predict(walker, x, term_index: int | None = 0, noise=None,
            take: int | None = None, max_samples: int = 256,
            seed: int = 0) -> "Prediction | list[Prediction]":
    """Posterior prediction at NEW abscissae (interpolation/extrapolation).

    :func:`posterior_predictive` replicates at the dataset's own x;
    this evaluates the posterior curve family on any grid — the "what
    would we measure at x=...?" verb the reference's fit-envelope plot
    could only answer on its fixed 1000-point display grid
    (mcmc-fitting.lisp:1250-1257), and with real quantile bands rather
    than a min/max envelope.  ``noise``: a scalar (or (N,) array) sigma
    adds Gaussian observation noise so ``band()`` becomes a prediction
    interval for new observations; omitted, bands are credible
    intervals for the curve itself.  One vmap on device; only (S, N)
    transfers.

    Global multi-term fits (test.lisp:58-70): ``term_index=None``
    predicts EVERY term's model on the same grid from the same shared
    posterior draws (one list, one call); an integer picks one term.
    """
    _check_decomposable(walker, "predict")
    pos, _ = walker.steps(take)
    if pos.shape[0] == 0:
        raise ValueError("predict: no collected history")
    n_avail = pos.shape[0]
    idx = np.unique(np.linspace(0, n_avail - 1,
                                min(max_samples, n_avail)).astype(int))
    samples = jnp.asarray(np.asarray(pos)[idx], walker.dtype)
    terms = walker.terms if term_index is None \
        else [walker.terms[term_index]]
    x_arr = jnp.asarray(np.asarray(x, np.float64), walker.dtype)
    spec = walker.spec
    rng = np.random.default_rng(seed)

    out = []
    for term in terms:
        def curve(vec, xg, _t=term):
            return _t.fn(xg, spec.unflatten(vec))

        mu = np.asarray(jax.jit(jax.vmap(curve, in_axes=(0, None)))(
            samples, x_arr))
        y_rep = None
        if noise is not None:
            sigma = np.broadcast_to(np.asarray(noise, np.float64),
                                    mu.shape[1:])
            y_rep = mu + sigma * rng.standard_normal(mu.shape)
        out.append(Prediction(x=np.asarray(x), mu=mu, y_rep=y_rep))
    return out if term_index is None else out[0]


def _gaussian_sampler(key, mu, dataset):
    sigma = jnp.asarray(dataset.sigma)[None, : mu.shape[1]]
    return mu + sigma * jax.random.normal(key, mu.shape, mu.dtype)


def _poisson_sampler(key, mu, dataset):
    # Rates must be positive; the likelihood already implies it (log lam),
    # so clamp only to guard replicates at degenerate history rows.
    return jax.random.poisson(key, jnp.maximum(mu, 1e-300),
                              mu.shape).astype(mu.dtype)


_SAMPLERS = {
    log_likelihood_normal: _gaussian_sampler,
    log_likelihood_normal_cutoff: _gaussian_sampler,
    log_likelihood_poisson: _poisson_sampler,
}


def posterior_predictive(walker, take: int | None = None,
                         max_samples: int = 256, seed: int = 0,
                         sampler: Callable | None = None,
                         ) -> list[PredictiveDraws]:
    """Draw replicated datasets from the posterior history, per term.

    Thins the collected history to at most ``max_samples`` evenly spaced
    parameter vectors (same subsampling policy as ``diagnostics.waic``),
    evaluates each term's model curve as one vmap, and adds observation
    noise per the term's likelihood.  ``sampler(key, mu, dataset)`` (mu
    is the (S, N) model-curve block) overrides the noise model for ALL
    terms — required for ``create_log_likelihood_function`` customs.

    Same caveat as WAIC/LOO: the history must be posterior samples —
    burn the anneal phase first, or pass ``take=`` for the tail.
    """
    _check_decomposable(walker, "posterior_predictive")
    pos, _ = walker.steps(take)
    if pos.shape[0] == 0:
        raise ValueError("posterior_predictive: no collected history (run "
                         "adaptive_steps with collect_history=True first)")
    n_avail = pos.shape[0]
    idx = np.unique(np.linspace(0, n_avail - 1,
                                min(max_samples, n_avail)).astype(int))
    samples = jnp.asarray(np.asarray(pos)[idx], walker.dtype)
    return _replicate(walker, samples, seed, sampler, "posterior_predictive")


def prior_predictive(walker, bounds=None, n_samples: int = 256,
                     seed: int = 0, sampler: Callable | None = None,
                     prior=None) -> list[PredictiveDraws]:
    """Draw replicated datasets from the PRIOR — the before-fitting check.

    The first step of the standard Bayesian workflow: simulate what the
    model + prior claim data could look like *before* conditioning, and
    eyeball it against the observed scale (a prior whose replicates
    never reach the data's magnitude is fighting the fit; one orders of
    magnitude too wide wastes annealing).  Parameters draw uniformly
    from ``bounds``; when omitted, the bounds table is recovered from a
    :func:`~lisp_mcmc_tpu.make_bounds_prior` prior on the walker's
    terms.  Same noise-model dispatch as :func:`posterior_predictive`.
    """
    _check_decomposable(walker, "prior_predictive")
    from .priors import resolve_prior_spec

    spec = resolve_prior_spec(walker, prior, bounds)
    if spec is None:
        raise ValueError(
            "prior_predictive: pass bounds= or prior= (the walker's prior "
            "carries no recipe, so there is nothing to draw parameters "
            "from)")
    keys = walker.spec.keys
    missing = [k for k in keys if k not in spec]
    if missing:
        raise ValueError(f"prior_predictive: prior/bounds missing {missing}")
    rng = np.random.default_rng(seed)
    samples = jnp.asarray(spec.sample(rng, n_samples, keys), walker.dtype)
    return _replicate(walker, samples, seed, sampler, "prior_predictive")


def _check_decomposable(walker, name: str) -> None:
    if getattr(walker, "group_ids", None) is not None:
        raise ValueError(f"{name}: grouped/batched fits mix per-dataset "
                         "populations in one history; compute per dataset "
                         "(BatchedFit -> per-dataset walkers)")
    if getattr(walker, "_custom_log_post", None) is not None or \
            getattr(walker, "_custom_batched", None) is not None:
        raise ValueError(f"{name}: custom posteriors have no dataset terms "
                         "to replicate")


def _replicate(walker, samples, seed: int, sampler: Callable | None,
               name: str) -> list[PredictiveDraws]:
    """Shared back end: (S, d) parameter draws -> per-term PredictiveDraws."""
    import inspect

    spec = walker.spec
    out = []
    key = jax.random.PRNGKey(seed)
    for ti, term in enumerate(walker.terms):
        # Dispatch order: explicit sampler > a sampler the likelihood
        # carries (factory-built likelihoods, e.g. Student-t /
        # noise-scale) > library identity.
        draw = sampler \
            or getattr(term.likelihood, "_predictive_sampler", None) \
            or _SAMPLERS.get(term.likelihood)
        if draw is None:
            raise ValueError(
                f"{name}: no noise model for likelihood "
                f"{getattr(term.likelihood, '__name__', term.likelihood)!r}"
                " — pass sampler=(key, mu, dataset) -> y_rep")
        # Samplers whose noise depends on parameters (fitted noise
        # scale) take a 4th argument: the (S, d) draws as a params
        # pytree of (S,) leaves.
        wants_params = len(inspect.signature(draw).parameters) >= 4

        # Dataset arrays ride as jit ARGUMENTS, not closure constants
        # (CLAUDE.md invariant — keeps the persistent cache keyed on
        # shapes, not data values).
        def curves(vec, x, _t=term):
            return _t.fn(x, spec.unflatten(vec))

        mu = jax.jit(jax.vmap(curves, in_axes=(0, None)))(
            samples, term.dataset.x)                     # (S, P) padded
        key, sub = jax.random.split(key)
        if wants_params:
            params_s = jax.vmap(spec.unflatten)(samples)  # dict of (S,)
            y_rep = draw(sub, mu, term.dataset, params_s)
        else:
            y_rep = draw(sub, mu, term.dataset)
        n = term.dataset.n
        out.append(PredictiveDraws(
            term_index=ti,
            x=np.asarray(term.dataset.x)[:n],
            y_obs=np.asarray(term.dataset.y)[:n],
            y_rep=np.asarray(y_rep)[:, :n],
            mu=np.asarray(mu)[:, :n],
        ))
    return out


def ppc_pvalue(walker, stat: Callable[[np.ndarray], float] = np.std,
               take: int | None = None, max_samples: int = 256,
               seed: int = 0, sampler: Callable | None = None,
               draws: Sequence[PredictiveDraws] | None = None,
               ) -> dict[str, object]:
    """Posterior predictive p-value for a test statistic of the data.

    ``p = mean_s [ T(y_rep_s) >= T(y_obs) ]`` with all terms' real
    points pooled into one vector per replicate (per-term values are in
    ``"per_term"``).  A p near 0 or 1 means the model cannot reproduce
    that aspect of the data — e.g. ``stat=np.std`` near 0 says the data
    scatter exceeds anything the fitted noise model generates.  p ~ 0.5
    is perfect; because y_obs also shaped the posterior, the check is
    conservative (calibrated p clusters toward 0.5, never uniform).

    Pass ``draws=`` to reuse :func:`posterior_predictive` output across
    several statistics without re-simulating.
    """
    if draws is None:
        draws = posterior_predictive(walker, take=take,
                                     max_samples=max_samples, seed=seed,
                                     sampler=sampler)
    per_term = {}
    for d in draws:
        t_obs = float(stat(d.y_obs))
        t_rep = np.apply_along_axis(stat, 1, d.y_rep)
        per_term[d.term_index] = float(np.mean(t_rep >= t_obs))
    pooled_obs = float(stat(np.concatenate([d.y_obs for d in draws])))
    pooled_rep = np.apply_along_axis(
        stat, 1, np.concatenate([d.y_rep for d in draws], axis=1))
    return {"p": float(np.mean(pooled_rep >= pooled_obs)),
            "stat_obs": pooled_obs,
            "stat_rep_mean": float(pooled_rep.mean()),
            "per_term": per_term}
