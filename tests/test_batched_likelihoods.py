"""Custom likelihoods through BatchedFit (r3 session 3).

BatchedFit's hot path is the Gaussian z-sum against the cached dataset
constants; every OTHER library/factory likelihood rides a stacked-
``Dataset`` vmap path evaluating the same ``likelihood(fn, params,
dataset)`` contract the single-fit Walker uses.  These tests pin:

  - exact per-block posterior agreement with the single-fit path
    (student-t, noise-scale, Poisson);
  - the default Gaussian path is BITWISE untouched by the new kwarg;
  - robust fits on scan grids actually resist per-dataset outliers;
  - reloo / kfold on non-Gaussian fits (the restriction this lifts);
  - batched checkpoint round-trip records the likelihood name and
    demands explicit re-supply for factory closures (the reference's
    walker-load contract, mcmc-fitting.lisp:996-997).
"""

import os
import tempfile

import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.batched import BatchedFit
from lisp_mcmc_tpu.checkpoint import batched_load, batched_save
from lisp_mcmc_tpu.diagnostics import kfold, loo, reloo, waic
from lisp_mcmc_tpu.fit import walker_create
from lisp_mcmc_tpu.likelihoods import (
    log_likelihood_normal,
    log_likelihood_poisson,
    make_noise_scale_likelihood,
    make_student_t_likelihood,
)
from lisp_mcmc_tpu.models import line


def _lines(rng, n_sets=3, n=40, outlier=None):
    datasets = []
    for s in range(n_sets):
        x = np.linspace(0.0, 10.0, n + 4 * s)        # ragged lengths
        y = 2.0 * x + 1.0 + rng.normal(0.0, 0.5, x.size)
        if outlier is not None:
            y[3] += outlier
        datasets.append((x, y))
    return datasets


def test_batched_matches_single_fit_posterior_exactly(rng):
    """Per-block log-posterior == the single-fit Walker's, to 1e-9,
    for each non-Gaussian family (the stacked-Dataset path evaluates
    the identical likelihood contract)."""
    datasets = _lines(rng)
    theta = np.array([2.1, 0.9])
    cases = [
        (make_student_t_likelihood(4.0), {"m": 1.5, "b": 0.5}, 0.5),
        (make_noise_scale_likelihood(), {"m": 1.5, "b": 0.5,
                                         "noise_scale": 1.0}, 1.0),
    ]
    for likelihood, params, err in cases:
        fit = BatchedFit(line, datasets, params, data_error=err,
                         log_likelihood=likelihood,
                         walkers_per_dataset=8, seed=0)
        vec = np.array([params[k] if k not in ("m", "b")
                        else {"m": 2.1, "b": 0.9}[k] for k in fit.spec.keys])
        for s, data in enumerate(datasets):
            w = walker_create(function=line, data=data, params=params,
                              data_error=err, log_likelihood=likelihood,
                              n_walkers=2, seed=0)
            lp_single = w.diagnose_params(dict(zip(fit.spec.keys, vec)))
            lp_block = float(fit._custom_log_post(
                fit.spec.flatten(dict(zip(fit.spec.keys, vec)),
                                 dtype=fit.dtype),
                s, fit._posterior_data()))
            assert lp_single == pytest.approx(lp_block, abs=1e-9)


def test_batched_poisson_counts(rng):
    """Poisson likelihood through the batched path: exact per-block lp
    and a sane rate recovery."""
    x = np.linspace(0.0, 10.0, 48)
    datasets = []
    for rate in (3.0, 8.0):
        lam = rate + 0.5 * x
        datasets.append((x, rng.poisson(lam).astype(float)))
    params = {"m": 0.4, "b": 4.0}
    fit = BatchedFit(line, datasets, params,
                     log_likelihood=log_likelihood_poisson,
                     log_prior=mfit.make_bounds_prior(
                         {"m": (0.01, 5.0), "b": (0.1, 30.0)}),
                     walkers_per_dataset=64, seed=1)
    for s, data in enumerate(datasets):
        w = walker_create(function=line, data=data, params=params,
                          log_likelihood=log_likelihood_poisson,
                          n_walkers=2, seed=0)
        lp_single = w.diagnose_params({"m": 0.45, "b": 5.0})
        lp_block = float(fit._custom_log_post(
            fit.spec.flatten({"m": 0.45, "b": 5.0}, dtype=fit.dtype),
            s, fit._posterior_data()))
        assert lp_single == pytest.approx(lp_block, abs=1e-9)
    fit.adaptive_steps(4000, auto=None)
    for s, truth in enumerate((3.0, 8.0)):
        best = fit.best_params_per_dataset()[s]
        assert best["b"] == pytest.approx(truth, abs=2.0)


def test_default_gaussian_path_bitwise_unchanged(rng):
    """Passing log_likelihood=log_likelihood_normal (or nothing) keeps
    the specialized z-sum path: identical states after identical runs."""
    datasets = _lines(rng)
    kw = dict(data_error=0.5, walkers_per_dataset=16, seed=3)
    fa = BatchedFit(line, datasets, {"m": 1.5, "b": 0.5}, **kw)
    fb = BatchedFit(line, datasets, {"m": 1.5, "b": 0.5},
                    log_likelihood=log_likelihood_normal, **kw)
    fa.adaptive_steps(800, auto=None)
    fb.adaptive_steps(800, auto=None)
    assert np.array_equal(np.asarray(fa.state.position),
                          np.asarray(fb.state.position))
    assert np.array_equal(np.asarray(fa.state.logprob),
                          np.asarray(fb.state.logprob))


def test_student_t_batch_resists_outliers(rng):
    """The reason to want robust likelihoods on a scan grid: a gross
    outlier per spectrum drags the Gaussian batch fit but not the
    student-t one."""
    datasets = _lines(rng, outlier=30.0)
    guess = {"m": 1.5, "b": 0.5}
    robust = BatchedFit(line, datasets, guess, data_error=0.5,
                        log_likelihood=make_student_t_likelihood(4.0),
                        walkers_per_dataset=64, seed=4)
    gauss = BatchedFit(line, datasets, guess, data_error=0.5,
                       walkers_per_dataset=64, seed=4)
    robust.adaptive_steps(4000, auto=None)
    gauss.adaptive_steps(4000, auto=None)
    for s in range(len(datasets)):
        m_rob = robust.best_params_per_dataset()[s]["m"]
        m_gau = gauss.best_params_per_dataset()[s]["m"]
        assert abs(m_rob - 2.0) < abs(m_gau - 2.0)
        assert m_rob == pytest.approx(2.0, abs=0.15)


def test_per_dataset_toolchain_uses_custom_likelihood(rng):
    """dataset_view terms carry the custom likelihood, so per-dataset
    WAIC/LOO score under it (not the Gaussian)."""
    datasets = _lines(rng)
    fit = BatchedFit(line, datasets, {"m": 1.5, "b": 0.5}, data_error=0.5,
                     log_likelihood=make_student_t_likelihood(4.0),
                     walkers_per_dataset=48, seed=5)
    fit.adaptive_steps(3000, auto=None)
    view = fit.dataset_view(1)
    assert view.terms[0].likelihood.__name__.startswith("student_t")
    w = waic(view)
    assert np.isfinite(w.elpd)
    res = loo(view)
    assert np.isfinite(res.elpd)


def test_reloo_kfold_on_student_t_fit(rng):
    """The restriction this session lifts: exact refit-CV on a
    non-Gaussian fit.  reloo and kfold must agree with each other (both
    exact) even when PSIS-LOO is unreliable."""
    x = np.linspace(0.0, 10.0, 30)
    y = 2.0 * x + 1.0 + rng.standard_t(4, x.size) * 0.5
    w = walker_create(function=line, data=(x, y),
                      params={"m": 1.5, "b": 0.5}, data_error=0.5,
                      log_likelihood=make_student_t_likelihood(4.0),
                      n_walkers=256, seed=0)
    w.adaptive_steps(4000)
    base = loo(w)
    thresh = min(0.7, float(base.pareto_k.max()) - 1e-6)
    r = reloo(w, base, k_threshold=thresh, n_steps=3000, max_refits=40)
    kf = kfold(w, k=5, n_steps=3000)
    assert np.isfinite(r.elpd) and np.isfinite(kf.elpd)
    assert kf.elpd == pytest.approx(r.elpd, abs=8.0)


def test_kfold_on_noise_scale_fit(rng):
    """kfold under a fitted-noise likelihood runs and lands near the
    analytic Gaussian elpd scale."""
    x = np.linspace(0.0, 10.0, 32)
    sigma_true = 0.7
    y = 2.0 * x + 1.0 + rng.normal(0.0, sigma_true, x.size)
    w = walker_create(function=line, data=(x, y),
                      params={"m": 1.5, "b": 0.5, "noise_scale": 1.0},
                      data_error=1.0,
                      log_likelihood=make_noise_scale_likelihood(),
                      log_prior=mfit.make_bounds_prior(
                          {"noise_scale": (1e-2, 1e2)}),
                      n_walkers=256, seed=1)
    w.adaptive_steps(4000)
    kf = kfold(w, k=4, n_steps=3000)
    # iid-Gaussian elpd/point ~ -(log(2 pi sigma^2) + 1)/2 = -1.06
    assert kf.elpd / x.size == pytest.approx(-1.06, abs=0.6)


def test_unsupported_custom_reduction_refused(rng):
    """A likelihood with no recoverable per-point form still fails
    loudly at the refit boundary."""
    def custom_reduction(fn, params, dataset):
        mu = fn(dataset.x, params)
        return -jnp_sum_abs(mu, dataset)

    import jax.numpy as jnp

    def jnp_sum_abs(mu, dataset):
        return jnp.sum(jnp.abs(dataset.y - mu) * dataset.mask)

    x = np.linspace(0.0, 5.0, 16)
    y = 2.0 * x + 1.0
    w = walker_create(function=line, data=(x, y),
                      params={"m": 1.5, "b": 0.5}, data_error=0.5,
                      log_likelihood=custom_reduction, n_walkers=8, seed=0)
    w.adaptive_steps(200, auto=None)
    with pytest.raises(ValueError, match="per-point form"):
        kfold(w, k=4, n_steps=200)


def test_batched_checkpoint_roundtrip_custom_likelihood(rng, tmp_path):
    """Header records the likelihood name; factory closures demand
    explicit re-supply; restored fit evaluates bitwise-identically."""
    datasets = _lines(rng, n_sets=2)
    fit = BatchedFit(line, datasets, {"m": 1.5, "b": 0.5}, data_error=0.5,
                     log_likelihood=make_student_t_likelihood(4.0),
                     walkers_per_dataset=16, seed=6)
    fit.adaptive_steps(500, auto=None)
    path = os.path.join(tmp_path, "ck.npz")
    batched_save(fit, path)
    # `line` is a registry model, so the ONLY unresolvable name is the
    # factory likelihood — load must refuse (None) until it is supplied.
    assert batched_load(path, quiet=True) is None
    back = batched_load(path, log_likelihood=make_student_t_likelihood(4.0),
                        quiet=True)
    assert back is not None
    assert np.array_equal(np.asarray(fit.state.position),
                          np.asarray(back.state.position))
    theta = fit.spec.flatten({"m": 2.0, "b": 1.0}, dtype=fit.dtype)
    a = float(fit._custom_log_post(theta, 0, fit._posterior_data()))
    b = float(back._custom_log_post(theta, 0, back._posterior_data()))
    assert a == pytest.approx(b, abs=0.0)


def test_gaussian_batched_checkpoint_format_still_loads(rng, tmp_path):
    """The rewritten batched_save derives arrays from the per-dataset
    Datasets; the plain Gaussian round-trip must stay exact (guards the
    format against the source-of-truth switch)."""
    datasets = _lines(rng, n_sets=2)
    fit = BatchedFit(line, datasets, {"m": 1.5, "b": 0.5}, data_error=0.5,
                     walkers_per_dataset=16, seed=7)
    fit.adaptive_steps(500, auto=None)
    path = os.path.join(tmp_path, "ck.npz")
    batched_save(fit, path)
    back = batched_load(path, quiet=True)
    assert back is not None
    assert np.array_equal(np.asarray(fit.state.position),
                          np.asarray(back.state.position))
    for a, b in zip(fit._datasets, back._datasets):
        assert a.n == b.n
        # sigma saves directly (not via 1/inv_sigma): bitwise round-trip
        assert np.array_equal(np.asarray(a.sigma)[: a.n],
                              np.asarray(b.sigma)[: b.n])


def test_per_dataset_predictive_under_custom_likelihood(rng):
    """posterior_predictive_per_dataset / loo_pit_per_dataset ride the
    factory's predictive sampler (t tails, params-aware noise-scale):
    coverage lands near nominal on well-specified robust fits."""
    datasets = []
    for s in range(3):
        x = np.linspace(0, 10, 40)
        y = 2.0 * x + 1.0 + 0.5 * rng.standard_t(4, x.size)
        datasets.append((x, y))
    fit = BatchedFit(line, datasets, {"m": 1.5, "b": 0.5}, data_error=0.5,
                     log_likelihood=make_student_t_likelihood(4.0),
                     walkers_per_dataset=48, seed=0)
    fit.adaptive_steps(3000, auto=None)
    fit.burn_steps(len(fit) // 2)
    for d in fit.posterior_predictive_per_dataset():
        assert 0.75 <= d.coverage() <= 1.0
    for r in fit.loo_pit_per_dataset():
        assert getattr(r, "ok", True) in (True, False)   # runs, verdicts

    ns = BatchedFit(line, datasets,
                    {"m": 1.5, "b": 0.5, "noise_scale": 1.0},
                    data_error=1.0,
                    log_likelihood=make_noise_scale_likelihood(),
                    log_prior=mfit.make_bounds_prior(
                        {"noise_scale": (1e-2, 1e2)}),
                    walkers_per_dataset=48, seed=1)
    ns.adaptive_steps(3000, auto=None)
    ns.burn_steps(len(ns) // 2)
    for d in ns.posterior_predictive_per_dataset():
        assert 0.75 <= d.coverage() <= 1.0


def test_x_error_likelihood_through_batched(rng):
    """Errors-in-variables (York/ODR profile form, autodiff df/dx)
    rides the stacked-Dataset path: batched fits beat the naive
    Gaussian's diluted slopes on every block."""
    from lisp_mcmc_tpu.likelihoods import make_x_error_likelihood

    datasets = []
    for s in range(3):
        x_true = np.linspace(0, 10, 50)
        x_obs = x_true + rng.normal(0, 0.6, 50)
        y = 2.0 * x_true + 1.0 + rng.normal(0, 0.2, 50)
        datasets.append((x_obs, y))
    kw = dict(data_error=0.2, walkers_per_dataset=64, seed=0)
    york = BatchedFit(line, datasets, {"m": 1.5, "b": 0.5},
                      log_likelihood=make_x_error_likelihood(0.6), **kw)
    naive = BatchedFit(line, datasets, {"m": 1.5, "b": 0.5}, **kw)
    york.adaptive_steps(4000, auto=None)
    naive.adaptive_steps(4000, auto=None)
    for s in range(3):
        m_y = york.best_params_per_dataset()[s]["m"]
        m_n = naive.best_params_per_dataset()[s]["m"]
        assert abs(m_y - 2.0) < abs(m_n - 2.0)


def test_reloo_kfold_on_dataset_view(rng):
    """Refit-CV on a BatchedFit block: dataset_view exposes the block's
    OWN best params as the refit seed (the batch-global argmax could
    be another dataset's optimum), so reloo/kfold run per dataset."""
    x = np.linspace(0.0, 10.0, 30)
    datasets = [(x, 2.0 * x + 1.0 + rng.normal(0, 0.3, 30)),
                (x, 0.5 * x - 1.0 + rng.normal(0, 0.3, 30))]
    fit = BatchedFit(line, datasets, {"m": 1.0, "b": 0.0},
                     data_error=0.3, walkers_per_dataset=64, seed=0)
    fit.adaptive_steps(3000, auto=None)
    fit.burn_steps(len(fit) // 2)
    view = fit.dataset_view(1)
    assert view.most_likely_params()["m"] == pytest.approx(0.5, abs=0.2)
    base = loo(view)
    th = min(0.7, float(base.pareto_k.max()) - 1e-6)
    r = reloo(view, base, k_threshold=th, n_steps=1500, max_refits=4)
    kf = kfold(view, k=4, n_steps=1500)
    assert np.isfinite(r.elpd) and np.isfinite(kf.elpd)
