"""Refit-CV on HierarchicalFit (round 4, verdict item #1).

The last loud refusal in the calibration layer: reloo/kfold on partial-
pooling fits.  Each leave-out posterior is the FULL joint non-centered
model (hypers + every dataset) with one point masked out of one
dataset's stacked block, built the way the round-3 global-fit version
was built (mask-based holdouts, cached constants exact by
reconstruction, K refits as adaptation groups of ONE grouped Walker —
``HierarchicalFit._refit_cv``).  These tests pin:

  - the masked leave-out JOINT posterior is EXACTLY the sliced-data
    hierarchical posterior (the correctness anchor, to 1e-9), under
    both Gaussian and student-t likelihoods;
  - reloo on a k-flagged hierarchical fit replaces flags with exact
    refits and kfold agrees (the pooled-vs-unpooled workflow end to
    end);
  - dataset VIEWS still refuse refit-CV (a view refit would drop the
    population prior — a different model than the one that flagged);
  - the holdout axis is the real-point (mask > 0) axis, aligned with
    loo's pareto_k indices even when a dataset carries INTERIOR masked
    points (advisor finding r3: the old axis was arange(sum n), which
    only coincided for prefix-form masks).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.diagnostics import _batched_refit, kfold, loo, reloo
from lisp_mcmc_tpu.fit import walker_create
from lisp_mcmc_tpu.hierarchical import HierarchicalFit
from lisp_mcmc_tpu.models import line
from lisp_mcmc_tpu.priors import Gaussian, LogNormal


HYPER = {"m": (Gaussian(2.0, 1.0), LogNormal(np.log(0.3), 0.5)),
         "b": (Gaussian(1.0, 1.0), LogNormal(np.log(0.3), 0.5))}


def _hier_data(rng, S=3, n=16, outlier=None):
    x = np.linspace(0.0, 10.0, n)
    ms = rng.normal(2.0, 0.3, S)
    datasets = [(x, m * x + 1.0 + rng.normal(0, 0.3, n)) for m in ms]
    if outlier is not None:
        datasets[0][1][5] += outlier
    return x, datasets


def _hier_fit(datasets, log_likelihood=None, n_walkers=64, seed=0):
    return HierarchicalFit(line, datasets, {"m": 1.5, "b": 0.5},
                           data_error=0.3, hyper=HYPER,
                           log_likelihood=log_likelihood,
                           n_walkers=n_walkers, seed=seed)


@pytest.mark.parametrize("ll", [None, "student_t"])
def test_hier_masked_holdout_matches_sliced(rng, ll):
    """The anchor: block-j's joint posterior (one point masked out of
    dataset 0) equals a fresh HierarchicalFit built on SLICED data, to
    1e-9 at an arbitrary walk vector — Gaussian and student-t."""
    log_likelihood = None if ll is None else mfit.make_student_t_likelihood(4.0)
    x, datasets = _hier_data(rng)
    h = _hier_fit(datasets, log_likelihood)
    h.adaptive_steps(400, auto=None)
    i_held = 5                       # dataset 0's point 5, real-point axis
    fit, _ = h._refit_cv("test", [np.arange(h._n_real_points) != i_held],
                         n_steps=200, temperature=2.0,
                         walkers_per_dataset=8, burn_fraction=0.3,
                         max_samples=16, seed=0)
    keep = np.arange(len(x)) != 5
    sliced = [(x[keep], datasets[0][1][keep])] + datasets[1:]
    ref = _hier_fit(sliced, log_likelihood, n_walkers=2)
    theta = jnp.asarray(np.asarray(h._best_vector()), fit.dtype)
    lp_blk = float(fit._custom_log_post(theta, 0, fit._posterior_data()))
    lp_ref = float(ref._log_post_one(theta, ref._posterior_data()))
    assert lp_blk == pytest.approx(lp_ref, abs=1e-9)


def test_hier_reloo_kfold_end_to_end(rng):
    """Pooled fit with one influential outlier: loo flags it, reloo
    refits it exactly (flag cleared), kfold agrees — all over the
    48-point dataset-major axis."""
    _, datasets = _hier_data(rng, outlier=4.0)
    h = _hier_fit(datasets, n_walkers=128)
    h.adaptive_steps(3000, auto=None)
    h.reset()
    h.sampling_steps(3000, kernel="chees")
    h.burn_steps(len(h) // 2)
    base = loo(h)
    assert base.n_points == 48
    # The outlier lives at real-point index 5 (dataset 0, point 5) and
    # must be among the flagged set.  Flag the top FEW k values, not
    # the single max: near-tied k estimates shift with CPU intra-op
    # thread scheduling under load, so a max-only threshold flaked in
    # the full-suite run while passing solo (r5).
    thresh = min(0.7, float(np.sort(base.pareto_k)[-4]) - 1e-6)
    flagged = np.where(base.pareto_k > thresh)[0]
    assert 1 <= flagged.size <= 8
    assert 5 in flagged
    # Budget note (r5): 16-walker/800-step refits of the joint
    # hierarchical posterior measured tail ESS = 16 (frozen chains,
    # R-hat 2.5) — the new convergence gate rightly refuses to merge
    # those; this budget passes the gate and the values are truly
    # exact.
    r = reloo(h, base, k_threshold=thresh, n_steps=2500, max_refits=8,
              walkers_per_dataset=64)
    assert np.isfinite(r.elpd)
    assert r.refit_failed == ()                        # gate passed
    assert float(r.pareto_k[flagged].max()) == 0.0     # exact now
    kf = kfold(h, k=4, n_steps=2500, walkers_per_dataset=64)
    assert np.isfinite(kf.elpd)
    assert kf.elpd == pytest.approx(r.elpd, abs=15.0)


def test_hier_view_still_refuses_refit(rng):
    """Refitting a dataset VIEW would drop the population prior — the
    loud refusal stays."""
    _, datasets = _hier_data(rng)
    h = _hier_fit(datasets, n_walkers=16)
    h.adaptive_steps(200, auto=None)
    with pytest.raises(ValueError, match="population prior"):
        kfold(h.dataset_view(0), k=4, n_steps=100)


def test_holdout_axis_is_real_point_axis(rng):
    """Advisor r3 finding: a term Dataset with an INTERIOR masked point
    must keep loo indices and held-out points aligned.  Holdout i on
    the real-point axis must zero the i-th mask>0 position — skipping
    interior masked points — pinned against a manual masked sum."""
    from lisp_mcmc_tpu.data import Dataset
    from lisp_mcmc_tpu.diagnostics import _refit_n_points
    from lisp_mcmc_tpu.likelihoods import pointwise_log_likelihood

    n = 20
    x = np.linspace(0.0, 10.0, n)
    y = 2.0 * x + 1.0 + rng.normal(0, 0.3, n)
    w = walker_create(function=line, data=(x, y),
                      params={"m": 1.5, "b": 0.5}, data_error=0.3,
                      n_walkers=16, seed=0, walker_jitter=0.05)
    # Carve an interior masked point (index 3) into the term's dataset.
    ds = w.terms[0].dataset
    mask = np.asarray(ds.mask, np.float64).copy()
    mask[3] = 0.0
    w.terms[0] = dataclasses.replace(
        w.terms[0],
        dataset=Dataset(x=ds.x, y=ds.y, sigma=ds.sigma,
                        mask=jnp.asarray(mask, np.asarray(ds.mask).dtype),
                        n=ds.n))
    w._runner_cache.clear()
    w.adaptive_steps(300, auto=None)
    n_real = _refit_n_points(w)
    assert n_real == n - 1
    assert loo(w).n_points == n_real
    # Hold out real-point 3 — which is PADDED position 4 (position 3 is
    # the interior masked point).  The misaligned axis would have
    # masked padded position 3 (a no-op) and kept point 4 in.
    i = 3
    fit, _ = _batched_refit(
        w, "test", [np.arange(n_real) != i], n_steps=100, temperature=2.0,
        walkers_per_dataset=8, burn_fraction=0.3, max_samples=8, seed=0)
    theta = fit.spec.flatten({"m": 2.1, "b": 0.9}, dtype=fit.dtype)
    pw = np.asarray(pointwise_log_likelihood(
        w.terms[0].likelihood, line, fit.spec.unflatten(theta),
        w.terms[0].dataset), np.float64)
    keep_padded = mask.copy()
    keep_padded[4] = 0.0                       # real-point 3 = padded 4
    manual = float(np.sum(pw * (keep_padded > 0)))
    lp_blk = float(fit._custom_log_post(theta, 0, fit._posterior_data()))
    # The refit prior (flat box recipe) contributes 0 inside the box.
    assert lp_blk == pytest.approx(manual, abs=1e-9)
