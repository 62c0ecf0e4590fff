"""PSIS-LOO cross-validation (diagnostics.loo).

Validates the generalized-Pareto tail fit on synthetic GPD draws, LOO's
agreement with WAIC on a well-specified fit, the Pareto-k diagnostics,
and the paired comparison.
"""

import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu import diagnostics
from lisp_mcmc_tpu.diagnostics import _gpd_fit, _gpd_quantile, _psis_smooth
from lisp_mcmc_tpu.models import line


@pytest.mark.parametrize("k_true", [0.1, 0.3, 0.7, 1.2])
def test_gpd_fit_recovers_shape(k_true):
    rng = np.random.default_rng(42)
    errs = []
    for _ in range(10):
        u = rng.uniform(size=1000)
        x = np.sort(_gpd_quantile(u, k_true, 1.0))
        k_hat, sigma = _gpd_fit(x)
        assert np.isfinite(k_hat) and sigma > 0.0
        errs.append(k_hat - k_true)
    assert abs(np.mean(errs)) < 0.1, (k_true, errs)


def test_gpd_quantile_exponential_limit():
    p = np.asarray([0.1, 0.5, 0.9])
    np.testing.assert_allclose(_gpd_quantile(p, 0.0, 2.0),
                               -2.0 * np.log1p(-p), rtol=1e-12)
    # k -> 0 continuity
    np.testing.assert_allclose(_gpd_quantile(p, 1e-13, 2.0),
                               _gpd_quantile(p, 0.0, 2.0), rtol=1e-6)


def test_psis_smooth_edges():
    rng = np.random.default_rng(0)
    # well-behaved ratios: finite k, weights bounded by raw max (0)
    lw, k = _psis_smooth(rng.standard_normal(2000))
    assert np.isfinite(k) and k < 0.7
    assert lw.max() == pytest.approx(0.0)
    assert np.isfinite(lw).all()
    # degenerate tails are flagged, not smoothed
    assert _psis_smooth(np.zeros(100))[1] == np.inf
    assert _psis_smooth(rng.standard_normal(10))[1] == np.inf


def _line_data(n=100, noise=0.5, seed=0):
    rng = np.random.default_rng(seed)
    x = np.linspace(0.0, 10.0, n)
    y = 2.0 * x + 1.0 + noise * rng.standard_normal(n)
    return x, y


def _fit(model, params, x, y, noise, n_steps=4000, seed=0):
    w = mfit.walker_create(
        function=model, data=(x, y), params=params, data_error=noise,
        n_walkers=128, seed=seed, walker_jitter=0.1)
    w.adaptive_steps(n_steps, auto=None, temperature=1.0)
    w.burn_steps(n_steps // 2)
    return w


def test_loo_agrees_with_waic_on_wellspecified_fit():
    x, y = _line_data()
    w = _fit(line, {"m": 2.0, "b": 1.0}, x, y, 0.5)
    r_loo = diagnostics.loo(w)
    r_waic = diagnostics.waic(w)
    # On a 2-param conjugate-like fit both estimate the same elpd.
    assert r_loo.elpd == pytest.approx(r_waic.elpd, abs=2.0)
    assert 1.0 < r_loo.p_loo < 4.0, r_loo
    assert r_loo.n_points == 100
    assert r_loo.se > 0.0
    assert r_loo.looic == pytest.approx(-2.0 * r_loo.elpd)
    # no point is pathologically influential here
    assert r_loo.pareto_k.shape == (100,)
    assert r_loo.n_bad_k <= 2, r_loo
    assert np.isfinite(r_loo.pointwise).all()


def test_loo_compare_prefers_generating_model():
    x, y = _line_data()
    w_line = _fit(line, {"m": 2.0, "b": 1.0}, x, y, 0.5)
    from lisp_mcmc_tpu.models import polynomial
    w_const = _fit(polynomial, {"c0": 10.0}, x, y, 0.5)
    cmp = diagnostics.loo_compare(diagnostics.loo(w_line),
                                  diagnostics.loo(w_const))
    assert cmp["elpd_diff"] > 2.0 * cmp["se_diff"]
    with pytest.raises(ValueError, match="different data"):
        diagnostics.loo_compare(diagnostics.loo(w_line),
                                diagnostics.loo(_fit(line, {"m": 2.0, "b": 1.0},
                                                     *_line_data(n=40), 0.5)))


def test_loo_flags_influential_outlier():
    # One wild outlier with a tight claimed error bar: its importance
    # ratios must be heavy-tailed (high k) relative to the clean points.
    x, y = _line_data(n=60, noise=0.2, seed=3)
    y = y.copy()
    y[30] += 6.0                     # 30-sigma outlier
    w = _fit(line, {"m": 2.0, "b": 1.0}, x, y, 0.2)
    r = diagnostics.loo(w)
    k_out = r.pareto_k[30]
    others = np.delete(r.pareto_k, 30)
    assert k_out > np.percentile(others[np.isfinite(others)], 95), r
    # outlier is also the worst-predicted point
    assert np.argmin(r.pointwise) == 30


def test_loo_guards_match_waic():
    x, y = _line_data(n=40)
    bf = mfit.BatchedFit(line, [(x, y), (x, y + 1.0)],
                         {"m": 2.0, "b": 1.0}, data_error=0.5,
                         walkers_per_dataset=64, seed=0)
    bf.adaptive_steps(400, auto=None, temperature=1.0)
    with pytest.raises(ValueError, match="loo: grouped"):
        diagnostics.loo(bf)
