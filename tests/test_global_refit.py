"""Refit-CV on multi-term GLOBAL fits (r3 session 3).

The last "refit by hand" carve-out: reloo/kfold on shared-parameter
multi-dataset fits (the test.lisp:58-70 workflow).  Held-out points are
removed by MASK — each block's per-term Dataset is rebuilt with the
reduced mask so all cached constants are exact — and the K leave-out
posteriors (each the FULL T-term sum) run as adaptation groups of one
grouped Walker.  These tests pin:

  - the masked leave-out posterior is EXACTLY the sliced-data posterior
    (the mechanism's correctness anchor, to 1e-9);
  - reloo and kfold run on a two-dataset global fit and agree;
  - mixed per-term likelihoods (gaussian + student-t) refit correctly;
  - prior fixer semantics: the refit prior evaluates the ORIGINAL
    dataset (mcmc-fitting.lisp:837-845);
  - a term with no per-point form still refuses loudly.
"""

import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.diagnostics import (_global_batched_refit, kfold, loo,
                                       reloo)
from lisp_mcmc_tpu.fit import walker_create
from lisp_mcmc_tpu.models import line


def _global_fit(rng, n1=30, n2=24, outlier=None, likelihoods=None,
                log_prior=None, n_walkers=128):
    x1 = np.linspace(0.0, 10.0, n1)
    x2 = np.linspace(0.0, 8.0, n2)
    y1 = 2.0 * x1 + 1.0 + rng.normal(0, 0.3, n1)
    y2 = 2.0 * x2 + 1.0 + rng.normal(0, 0.3, n2)
    if outlier is not None:
        y1[4] += outlier
    w = walker_create(function=[line, line], data=[(x1, y1), (x2, y2)],
                      params={"m": 1.5, "b": 0.5}, data_error=0.3,
                      log_likelihood=likelihoods, log_prior=log_prior,
                      n_walkers=n_walkers, seed=0, walker_jitter=0.05)
    return w


def test_masked_holdout_posterior_matches_sliced(rng):
    """The anchor: _global_batched_refit's block-j posterior (point i
    masked out) equals a fresh global fit built on SLICED data, to
    1e-9 at an arbitrary parameter vector."""
    w = _global_fit(rng)
    w.adaptive_steps(600, auto=None)
    n1 = w.terms[0].dataset.n
    n_total = n1 + w.terms[1].dataset.n
    held = [3, n1 + 5]                      # one point in each term
    holdouts = [np.arange(n_total) != i for i in held]
    fit, _ = _global_batched_refit(
        w, "test", holdouts, n_steps=200, temperature=2.0,
        walkers_per_dataset=8, burn_fraction=0.3, max_samples=16, seed=0)
    theta = fit.spec.flatten({"m": 2.2, "b": 0.8}, dtype=fit.dtype)
    for j, i in enumerate(held):
        x1 = np.asarray(w.terms[0].dataset.x)[:n1]
        y1 = np.asarray(w.terms[0].dataset.y)[:n1]
        x2 = np.asarray(w.terms[1].dataset.x)[: n_total - n1]
        y2 = np.asarray(w.terms[1].dataset.y)[: n_total - n1]
        if i < n1:
            keep = np.arange(n1) != i
            data = [(x1[keep], y1[keep]), (x2, y2)]
        else:
            keep = np.arange(n_total - n1) != (i - n1)
            data = [(x1, y1), (x2[keep], y2[keep])]
        ref = walker_create(function=[line, line], data=data,
                            params={"m": 1.5, "b": 0.5}, data_error=0.3,
                            n_walkers=2, seed=0)
        lp_ref = ref.diagnose_params({"m": 2.2, "b": 0.8})
        lp_blk = float(fit._custom_log_post(theta, j,
                                            fit._posterior_data()))
        assert lp_blk == pytest.approx(lp_ref, abs=1e-9)


def test_global_reloo_kfold_agree(rng):
    """End to end on the test.lisp-style two-dataset fit with one
    influential outlier: exact reloo and exact kfold agree with each
    other (both over the 54-point concatenated axis)."""
    w = _global_fit(rng, outlier=4.0)
    w.adaptive_steps(4000)
    w.burn_steps(len(w) // 2)
    base = loo(w)
    assert base.n_points == 54
    thresh = min(0.7, float(base.pareto_k.max()) - 1e-6)
    r = reloo(w, base, k_threshold=thresh, n_steps=2500, max_refits=8)
    kf = kfold(w, k=4, n_steps=2500)
    assert np.isfinite(r.elpd) and np.isfinite(kf.elpd)
    assert int(np.sum(r.pareto_k < base.pareto_k)) >= 1
    assert kf.elpd == pytest.approx(r.elpd, abs=8.0)


def test_global_refit_mixed_likelihoods(rng):
    """Per-term likelihoods survive the refit: term 1 gaussian, term 2
    student-t — block posteriors match sliced refits built with the
    same mixed likelihood list."""
    lls = [None, mfit.make_student_t_likelihood(4.0)]
    w = _global_fit(rng, likelihoods=lls)
    w.adaptive_steps(600, auto=None)
    n1 = w.terms[0].dataset.n
    n_total = n1 + w.terms[1].dataset.n
    i = n1 + 2                                   # a student-t point
    fit, _ = _global_batched_refit(
        w, "test", [np.arange(n_total) != i], n_steps=200,
        temperature=2.0, walkers_per_dataset=8, burn_fraction=0.3,
        max_samples=16, seed=0)
    x1 = np.asarray(w.terms[0].dataset.x)[:n1]
    y1 = np.asarray(w.terms[0].dataset.y)[:n1]
    x2 = np.asarray(w.terms[1].dataset.x)[: n_total - n1]
    y2 = np.asarray(w.terms[1].dataset.y)[: n_total - n1]
    keep = np.arange(n_total - n1) != (i - n1)
    ref = walker_create(function=[line, line],
                        data=[(x1, y1), (x2[keep], y2[keep])],
                        params={"m": 1.5, "b": 0.5}, data_error=0.3,
                        log_likelihood=lls, n_walkers=2, seed=0)
    theta = fit.spec.flatten({"m": 2.1, "b": 0.9}, dtype=fit.dtype)
    lp_blk = float(fit._custom_log_post(theta, 0, fit._posterior_data()))
    assert lp_blk == pytest.approx(
        ref.diagnose_params({"m": 2.1, "b": 0.9}), abs=1e-9)


def test_global_refit_threads_data_dependent_prior(rng):
    """The prior terms evaluate against the ORIGINAL (unreduced)
    datasets — fixer semantics: a prior reading dataset.n must see the
    full point count in every leave-out block."""
    import jax.numpy as jnp

    def n_reading_prior(params, dataset):
        # contributes -n_real; with the ORIGINAL dataset that is a
        # CONSTANT across blocks even though each block masks one point
        if dataset is None:
            return jnp.asarray(0.0)
        return -jnp.sum(dataset.mask)

    w = _global_fit(rng, log_prior=n_reading_prior)
    w.adaptive_steps(400, auto=None)
    n_total = sum(t.dataset.n for t in w.terms)
    fit, _ = _global_batched_refit(
        w, "test", [np.arange(n_total) != 0, np.arange(n_total) != 1],
        n_steps=200, temperature=2.0, walkers_per_dataset=8,
        burn_fraction=0.3, max_samples=16, seed=0)
    theta = fit.spec.flatten({"m": 2.0, "b": 1.0}, dtype=fit.dtype)
    lp0 = float(fit._custom_log_post(theta, 0, fit._posterior_data()))
    lp1 = float(fit._custom_log_post(theta, 1, fit._posterior_data()))
    # Manual reconstruction: masked likelihood sums + the prior read
    # from the ORIGINAL (full-n) datasets — if the refit had handed the
    # prior the REDUCED dataset, each -sum(mask) term would be one
    # point short and both checks would miss by exactly 1.0.
    from lisp_mcmc_tpu.likelihoods import pointwise_log_likelihood

    def manual(block_i):
        total = 0.0
        off = 0
        for t in w.terms:
            pw = np.asarray(pointwise_log_likelihood(
                t.likelihood, t.fn, fit.spec.unflatten(theta), t.dataset))
            nreal = t.dataset.n
            keep = np.arange(n_total) != block_i
            seg = keep[off:off + nreal]
            total += float(np.sum(pw[:nreal][seg]))
            total += -float(nreal)               # prior on ORIGINAL
            off += nreal
        return total

    assert lp0 == pytest.approx(manual(0), abs=1e-9)
    assert lp1 == pytest.approx(manual(1), abs=1e-9)


def test_global_refit_refuses_no_per_point_form(rng):
    import jax.numpy as jnp

    def custom_reduction(fn, params, dataset):
        mu = fn(dataset.x, params)
        return -jnp.sum(jnp.abs(dataset.y - mu) * dataset.mask)

    w = _global_fit(rng, likelihoods=[None, custom_reduction],
                    n_walkers=16)
    w.adaptive_steps(200, auto=None)
    with pytest.raises(ValueError, match="per-point form"):
        kfold(w, k=4, n_steps=200)


def test_single_term_refit_keeps_per_point_closures_aligned(rng):
    """The r3s3 review finding: slicing holdouts out misaligned
    per-point likelihood closures (make_x_error_likelihood with a
    per-point sigma_x array padded its full-length sigma_x against the
    sliced grid).  Mask-based holdouts keep positions fixed: the
    block posterior must equal a sliced refit whose sigma_x was sliced
    IN STEP with the data, to 1e-9."""
    n = 24
    x_true = np.linspace(0.0, 10.0, n)
    sigma_x = np.full(n, 0.1)
    sigma_x[::3] = 0.8                       # strongly heterogeneous
    x_obs = x_true + rng.normal(0, 1.0, n) * sigma_x
    y = 2.0 * x_true + 1.0 + rng.normal(0, 0.2, n)
    w = walker_create(function=line, data=(x_obs, y),
                      params={"m": 1.5, "b": 0.5}, data_error=0.2,
                      log_likelihood=mfit.make_x_error_likelihood(sigma_x),
                      n_walkers=32, seed=0, walker_jitter=0.05)
    w.adaptive_steps(400, auto=None)
    i = 2                                    # held-out interior point
    from lisp_mcmc_tpu.diagnostics import _batched_refit

    fit, _ = _batched_refit(
        w, "test", [np.arange(n) != i], n_steps=200, temperature=2.0,
        walkers_per_dataset=8, burn_fraction=0.3, max_samples=16, seed=0)
    keep = np.arange(n) != i
    ref = walker_create(
        function=line, data=(x_obs[keep], y[keep]),
        params={"m": 1.5, "b": 0.5}, data_error=0.2,
        log_likelihood=mfit.make_x_error_likelihood(sigma_x[keep]),
        n_walkers=2, seed=0)
    theta = fit.spec.flatten({"m": 2.1, "b": 0.9}, dtype=fit.dtype)
    lp_blk = float(fit._custom_log_post(theta, 0, fit._posterior_data()))
    assert lp_blk == pytest.approx(
        ref.diagnose_params({"m": 2.1, "b": 0.9}), abs=1e-9)
