"""WAIC predictive model comparison (diagnostics.waic).

Validates the pointwise decomposition against the dataset reductions,
the effective-parameter count on a conjugate fit, and that paired
comparison prefers the generating model.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu import diagnostics
from lisp_mcmc_tpu.data import Dataset
from lisp_mcmc_tpu.likelihoods import (
    create_log_likelihood_function,
    log_likelihood_normal,
    log_likelihood_normal_cutoff,
    log_likelihood_poisson,
    log_normal,
    pointwise_log_likelihood,
)
from lisp_mcmc_tpu.models import line


def _line_data(n=100, noise=0.5, seed=0):
    rng = np.random.default_rng(seed)
    x = np.linspace(0.0, 10.0, n)
    y = 2.0 * x + 1.0 + noise * rng.standard_normal(n)
    return x, y


def test_pointwise_sums_to_reduction():
    x, y = _line_data()
    ds = Dataset.create(x, y, 0.5)        # padded to lane multiple
    p = {"m": 2.1, "b": 0.7}
    for lik in (log_likelihood_normal, log_likelihood_normal_cutoff):
        total = float(lik(line, p, ds))
        pw = np.asarray(pointwise_log_likelihood(lik, line, p, ds))
        assert pw.shape == ds.mask.shape
        # padded lanes contribute exactly 0
        assert np.all(pw[np.asarray(ds.mask) == 0.0] == 0.0)
        assert float(pw.sum()) == pytest.approx(total, rel=1e-12)
    # poisson (positive rates)
    ds_p = Dataset.create(x, np.round(np.abs(y)) + 1.0)
    p_pos = {"m": 0.1, "b": 3.0}
    total = float(log_likelihood_poisson(line, p_pos, ds_p))
    pw = np.asarray(pointwise_log_likelihood(
        log_likelihood_poisson, line, p_pos, ds_p))
    assert float(pw.sum()) == pytest.approx(total, rel=1e-12)
    # HOF-built likelihoods carry their own pointwise form
    hof = create_log_likelihood_function(log_normal)
    total = float(hof(line, p, ds))
    pw = np.asarray(pointwise_log_likelihood(hof, line, p, ds))
    assert float(pw.sum()) == pytest.approx(total, rel=1e-12)
    # custom reductions without one raise
    with pytest.raises(ValueError, match="per-point"):
        pointwise_log_likelihood(lambda f, p, d: 0.0, line, p, ds)


def _fit(model, params, x, y, noise, n_steps=4000, seed=0):
    w = mfit.walker_create(
        function=model, data=(x, y), params=params, data_error=noise,
        n_walkers=128, seed=seed, walker_jitter=0.1)
    w.adaptive_steps(n_steps, auto=None, temperature=1.0)
    # WAIC needs posterior samples: drop the adaptation/burn-in steps.
    w.burn_steps(n_steps // 2)
    return w


def test_waic_line_fit_effective_params():
    x, y = _line_data()
    w = _fit(line, {"m": 2.0, "b": 1.0}, x, y, 0.5)
    r = diagnostics.waic(w)
    # d=2 free parameters, flat prior, N=100 -> p_waic ~ 2
    assert 1.0 < r.p_waic < 4.0, r
    assert r.n_points == 100          # padding excluded
    assert r.elpd < r.lppd            # penalty is positive
    assert r.se > 0.0
    assert r.waic == pytest.approx(-2.0 * r.elpd)
    assert r.n_samples > 100
    # the line's elpd should be near the true-model predictive density:
    # N * E[log N(eps; 0, 0.5)] ~ -72.6 for this seed's draws
    assert -95.0 < r.elpd < -55.0, r


def test_waic_compare_prefers_generating_model():
    x, y = _line_data()
    w_line = _fit(line, {"m": 2.0, "b": 1.0}, x, y, 0.5)
    # wrong model: constant-only (1-param polynomial)
    from lisp_mcmc_tpu.models import polynomial
    w_const = _fit(polynomial, {"c0": 10.0}, x, y, 0.5)
    r_line = diagnostics.waic(w_line)
    r_const = diagnostics.waic(w_const)
    cmp = diagnostics.waic_compare(r_line, r_const)
    assert cmp["elpd_diff"] > 0
    assert cmp["elpd_diff"] > 2.0 * cmp["se_diff"]   # decisively better


def test_waic_global_fit_counts_all_datasets():
    x1, y1 = _line_data(n=60, seed=1)
    x2, y2 = _line_data(n=40, seed=2)
    w = mfit.walker_create(
        function=[line, line], data=[(x1, y1), (x2, y2)],
        params={"m": 2.0, "b": 1.0}, data_error=0.5,
        n_walkers=128, seed=0, walker_jitter=0.1)
    w.adaptive_steps(2000, auto=None, temperature=1.0)
    r = diagnostics.waic(w)
    assert r.n_points == 100
    assert np.isfinite(r.elpd)


def test_waic_guards():
    from lisp_mcmc_tpu.fit import Walker
    from lisp_mcmc_tpu.params import ParamSpec

    def custom(theta, data):
        return -jnp.sum(theta ** 2)

    w = Walker([], ParamSpec(("a", "b")), np.asarray([0.0, 0.0]),
               n_walkers=32, seed=3, walker_jitter=0.1,
               log_posterior=custom)
    with pytest.raises(ValueError, match="custom"):
        diagnostics.waic(w)
    # grouped/batched fits mix per-dataset populations in one history
    x, y = _line_data(n=40)
    bf = mfit.BatchedFit(line, [(x, y), (x, y + 1.0)],
                         {"m": 2.0, "b": 1.0}, data_error=0.5,
                         walkers_per_dataset=64, seed=0)
    bf.adaptive_steps(400, auto=None, temperature=1.0)
    with pytest.raises(ValueError, match="grouped"):
        diagnostics.waic(bf)
