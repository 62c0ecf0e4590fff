"""One-call pooling verdict: complete vs partial vs independent.

The reference leaves the cross-dataset modeling choice to the user —
fit every file independently (``dir->nv-walkers``,
nv-specific.lisp:58-66) or share parameters globally (the test.lisp:
52-78 multi-term fit) — and the hierarchical tier adds the middle
ground.  :func:`compare_pooling` answers "which should I use?" on the
actual data: it fits all three model classes

  - ``"pooled"``:   ONE parameter set shared by every dataset (the
    reference's global fit — S terms, same params),
  - ``"partial"``:  :class:`~lisp_mcmc_tpu.HierarchicalFit` (per-dataset
    params drawn from a population),
  - ``"independent"``: :class:`~lisp_mcmc_tpu.batched.BatchedFit`
    (every dataset on its own),

scores each by PSIS-LOO on the SAME dataset-major real-point axis, and
returns per-model elpd/se, stacking weights
(:func:`~lisp_mcmc_tpu.diagnostics.model_weights`), and pairwise
elpd differences with paired SEs.  elpd (predictive) rather than
evidence is the deliberate metric: it needs no prior declarations, is
comparable across the three parameterizations, and stacking weights
answer the "no single winner" case by combination; for an
evidence-based answer each fit object is returned fitted, so
``log_evidence``/``nested_sample`` run directly on it.

Planted-truth behavior (pinned in tests/test_pooling.py): an
identical-parameters grid scores pooled >= independent decisively; a
strongly heterogeneous grid scores pooled worst; a moderate-spread
sparse grid (the eight-schools regime) scores partial at or above both
extremes.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Mapping, Sequence

import numpy as np

__all__ = ["PoolingComparison", "compare_pooling"]


@dataclasses.dataclass(frozen=True)
class PoolingComparison:
    """Result of :func:`compare_pooling`.

    ``elpd``/``se``: PSIS-LOO per model; ``weights``: stacking weights
    over {pooled, partial, independent}; ``best``: highest-elpd model;
    ``decisive``: True when ``best`` beats the runner-up by more than
    2 paired SEs (the usual "clearly better" bar); ``pairwise``:
    ``{"a_vs_b": {"elpd_diff", "se_diff"}}``; ``results``/``fits``:
    the per-model :class:`LOOResult` and the fitted objects.
    """

    elpd: dict
    se: dict
    weights: dict
    best: str
    decisive: bool
    pairwise: dict
    results: dict
    fits: dict

    def __repr__(self):
        rows = ", ".join(
            f"{k}: {self.elpd[k]:.1f}±{self.se[k]:.1f} "
            f"(w={self.weights[k]:.2f})" for k in self.elpd)
        tag = "decisive" if self.decisive else "not decisive"
        return f"PoolingComparison(best={self.best!r} [{tag}]; {rows})"


def _anneal_then_cold_sample(fit, n_steps: int, burn_fraction: float):
    """The WAIC/LOO scoring recipe on an annealed fit (CLAUDE.md:
    "reset_to_most_likely + cold sampling phase first, or hot
    stragglers inflate p_waic ~1e6x"): all three compared models get
    the SAME budget (auto-stop off), restart at their best point — a
    plain reset() would keep hot-excursion walkers alive into the
    scored phase (review finding r5) — then a cold mala phase and a
    burn.  BatchedFit's override resets each dataset block to ITS OWN
    best (the per-dataset invariant); the hierarchical fit is one
    joint posterior, so the global argmax is the right restart."""
    fit.adaptive_steps(n_steps, auto=None)
    fit.reset_to_most_likely()
    fit.sampling_steps(max(2000, n_steps // 2), kernel="mala")
    fit.burn_steps(int(len(fit) * burn_fraction))


def _combined_loo(fit, max_samples: int):
    """Dataset-major concatenated LOOResult for a BatchedFit."""
    from .diagnostics import LOOResult

    parts = fit.loo_per_dataset(max_samples=max_samples)
    pointwise = np.concatenate([p.pointwise for p in parts])
    pareto_k = np.concatenate([p.pareto_k for p in parts])
    n = pointwise.size
    se = float(np.sqrt(n * pointwise.var(ddof=1))) if n > 1 else 0.0
    lppd = float(sum(p.lppd for p in parts))
    return LOOResult(
        elpd=float(pointwise.sum()),
        p_loo=float(lppd - pointwise.sum()), lppd=lppd, se=se,
        n_points=n, n_samples=min(p.n_samples for p in parts),
        pointwise=pointwise, pareto_k=pareto_k)


def compare_pooling(
    function: Callable,
    datasets: Sequence,
    params: Mapping,
    data_error=None,
    *,
    pooled: Sequence[str] | None = None,
    hyper: Mapping | None = None,
    local_priors: Mapping | None = None,
    log_likelihood=None,
    n_steps: int = 6000,
    n_walkers: int = 256,
    walkers_per_dataset: int = 64,
    burn_fraction: float = 0.5,
    max_samples: int = 256,
    seed: int = 0,
    method: str = "stacking",
    hierarchical_kwargs: Mapping | None = None,
) -> PoolingComparison:
    """Fit {pooled, partial, independent} on the same data and compare.

    ``params`` is one guess dict shared by the three builds; ``hyper``/
    ``local_priors``/``pooled``/``hierarchical_kwargs`` configure the
    partial-pooling model exactly as :class:`HierarchicalFit` takes
    them (``hierarchical_kwargs`` merges last — e.g.
    ``{"correlation": "full"}``).  ``log_likelihood`` applies to all
    three.  Each model runs the WAIC/LOO scoring recipe: anneal
    ``n_steps`` (auto-stop off — all three get the SAME budget), then
    ``reset_to_most_likely()``, a COLD mala sampling phase of
    ``max(2000, n_steps // 2)`` steps, and ``burn_fraction`` of it —
    scoring LOO from annealed rows or hot-straggler walkers trips the
    anneal invariant (CLAUDE.md; review finding r5).

    The three pointwise axes align by construction: the pooled global
    fit scores term-major (terms are the datasets, in order), the
    hierarchical fit scores dataset-major through its joint pointwise
    hook, and the independent per-dataset LOO results concatenate in
    dataset order — all the same mask>0 real-point axis.
    """
    from .batched import BatchedFit
    from .diagnostics import loo, model_weights
    from .fit import walker_create
    from .hierarchical import HierarchicalFit

    S = len(datasets)
    if S < 2:
        raise ValueError("compare_pooling: need >= 2 datasets (one "
                         "dataset has nothing to pool)")
    datasets = [tuple(d) for d in datasets]
    lls = [log_likelihood] * S if log_likelihood is not None else None

    fits, results = {}, {}

    # -- complete pooling: the reference's shared-parameter global fit --
    w_pool = walker_create(
        function=[function] * S, data=list(datasets), params=dict(params),
        data_error=data_error, log_likelihood=lls,
        n_walkers=n_walkers, seed=seed)
    _anneal_then_cold_sample(w_pool, n_steps, burn_fraction)
    fits["pooled"] = w_pool
    results["pooled"] = loo(w_pool, max_samples=max_samples)

    # -- partial pooling ------------------------------------------------
    h = HierarchicalFit(
        function, datasets, dict(params), data_error=data_error,
        pooled=pooled, hyper=hyper, local_priors=local_priors,
        log_likelihood=log_likelihood, n_walkers=n_walkers,
        seed=seed, **dict(hierarchical_kwargs or {}))
    _anneal_then_cold_sample(h, n_steps, burn_fraction)
    fits["partial"] = h
    results["partial"] = loo(h, max_samples=max_samples)

    # -- independent ----------------------------------------------------
    b = BatchedFit(
        function, datasets, dict(params), data_error=data_error,
        log_likelihood=log_likelihood,
        walkers_per_dataset=walkers_per_dataset, seed=seed)
    _anneal_then_cold_sample(b, n_steps, burn_fraction)
    fits["independent"] = b
    results["independent"] = _combined_loo(b, max_samples)

    names = list(results)
    n_pts = {k: results[k].n_points for k in names}
    if len(set(n_pts.values())) != 1:
        raise RuntimeError(
            f"compare_pooling: internal axis mismatch {n_pts} — the "
            "three models must score the same real-point axis")

    w = model_weights([results[k] for k in names], method=method,
                      seed=seed)
    weights = dict(zip(names, (float(x) for x in w)))
    elpd = {k: float(results[k].elpd) for k in names}
    se = {k: float(results[k].se) for k in names}
    order = sorted(names, key=lambda k: elpd[k], reverse=True)
    best, runner = order[0], order[1]

    pairwise = {}
    for i, a in enumerate(names):
        for bname in names[i + 1:]:
            d = results[a].pointwise - results[bname].pointwise
            n = d.size
            sd = float(np.sqrt(n * d.var(ddof=1))) if n > 1 else 0.0
            pairwise[f"{a}_vs_{bname}"] = {
                "elpd_diff": float(d.sum()), "se_diff": sd}
    key = f"{best}_vs_{runner}" if f"{best}_vs_{runner}" in pairwise \
        else f"{runner}_vs_{best}"
    gap = abs(pairwise[key]["elpd_diff"])
    decisive = gap > 2.0 * max(pairwise[key]["se_diff"], 1e-12)

    return PoolingComparison(elpd=elpd, se=se, weights=weights, best=best,
                             decisive=decisive, pairwise=pairwise,
                             results=results, fits=fits)
