"""Posterior predictive sampling and checks (predictive.py, ppc_plot).

The forward complement of WAIC/LOO: replicate datasets from the
posterior and compare against observed data (coverage, predictive
p-values).  Calibration tests use well-specified fits (coverage near
the band's nominal level, p away from 0/1); misspecification tests
fit with an understated noise model and require the check to fire.
"""

import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.models import line


def _fit(noise=0.2, data_error=0.2, n_steps=3000, seed=0, n=60):
    rng = np.random.default_rng(seed)
    x = np.linspace(0.0, 10.0, n)
    y = 2.0 * x + 1.0 + rng.normal(0, noise, n)
    w = mfit.walker_create(
        function=line, data=(x, y), params={"m": 1.5, "b": 0.5},
        data_error=data_error, n_walkers=16, seed=seed, walker_jitter=0.05,
    )
    w.adaptive_steps(n_steps, auto=None)
    w.burn_steps(len(w) // 2)
    return w, x, y


@pytest.fixture(scope="module")
def calibrated():
    return _fit()


def test_draw_shapes_and_mean(calibrated):
    w, x, y = calibrated
    (d,) = mfit.posterior_predictive(w, max_samples=128)
    assert d.y_rep.shape == (d.mu.shape[0], x.size)
    assert d.x.shape == (x.size,)
    np.testing.assert_allclose(d.y_obs, y)
    # Replicate mean tracks the true curve.
    np.testing.assert_allclose(d.y_rep.mean(axis=0), 2.0 * x + 1.0,
                               atol=0.25)
    # Replicates carry observation noise: pointwise spread ~ sigma.
    assert 0.1 < d.y_rep.std(axis=0).mean() < 0.4


def test_calibrated_coverage_and_pvalue(calibrated):
    w, _, _ = calibrated
    (d,) = mfit.posterior_predictive(w, max_samples=256)
    assert d.coverage(0.05, 0.95) == pytest.approx(0.9, abs=0.12)
    res = mfit.ppc_pvalue(w, stat=np.std, draws=[d])
    assert 0.03 < res["p"] < 0.97
    assert res["per_term"][0] == res["p"]


def test_understated_noise_fails_check():
    """data_error 4x smaller than the true noise: the predictive band is far
    too tight — coverage collapses and the std-statistic p-value pins
    at ~0 (observed scatter exceeds every replicate's)."""
    w, _, _ = _fit(noise=0.8, data_error=0.2, seed=1)
    (d,) = mfit.posterior_predictive(w, max_samples=256)
    assert d.coverage(0.05, 0.95) < 0.75
    # np.std is trend-dominated here (the 2x slope dwarfs the noise), so
    # use a roughness statistic that strips the smooth trend.
    rough = lambda v: float(np.mean(np.abs(np.diff(v))))
    res = mfit.ppc_pvalue(w, stat=rough, draws=[d])
    assert res["p"] < 0.05


def test_poisson_predictive_counts():
    rng = np.random.default_rng(2)
    x = np.linspace(0.0, 10.0, 50)
    lam = 3.0 * x + 5.0
    y = rng.poisson(lam).astype(float)
    w = mfit.walker_create(
        function=line, data=(x, y), params={"m": 2.0, "b": 3.0},
        log_likelihood=mfit.log_likelihood_poisson,
        n_walkers=16, seed=2, walker_jitter=0.05,
    )
    w.adaptive_steps(3000, auto=None)
    w.burn_steps(len(w) // 2)
    (d,) = w.posterior_predictive(max_samples=128)
    # Counts: non-negative integers with Poisson-scale spread.
    assert np.all(d.y_rep >= 0)
    np.testing.assert_allclose(d.y_rep, np.round(d.y_rep))
    mid = d.y_rep[:, 25]
    assert mid.var() == pytest.approx(lam[25], rel=0.6)


def test_custom_likelihood_requires_sampler(calibrated):
    w, x, y = calibrated
    import jax.numpy as jnp

    custom = mfit.create_log_likelihood_function(
        lambda y_, mu, s: -0.5 * ((y_ - mu) / s) ** 2)
    w2 = mfit.walker_create(
        function=line, data=(x, y), params={"m": 2.0, "b": 1.0},
        data_error=0.2, log_likelihood=custom, n_walkers=8, seed=3,
    )
    w2.adaptive_steps(500, auto=None)
    with pytest.raises(ValueError, match="no noise model"):
        mfit.posterior_predictive(w2)
    # Explicit sampler unblocks it.
    import jax

    def sampler(key, mu, dataset):
        return mu + 0.2 * jax.random.normal(key, mu.shape, mu.dtype)

    (d,) = mfit.posterior_predictive(w2, sampler=sampler, max_samples=32)
    assert d.y_rep.shape[1] == x.size


def test_fresh_walker_replicates_from_ensemble():
    """steps() falls back to the live ensemble when no history was
    collected, so a fresh walker replicates from its initial positions
    (prior-predictive-ish) rather than erroring."""
    x = np.linspace(0, 1, 10)
    w = mfit.walker_create(function=line, data=(x, 2 * x),
                           params={"m": 1.0, "b": 0.0}, data_error=0.1,
                           n_walkers=8, seed=0)
    (d,) = mfit.posterior_predictive(w)
    assert d.y_rep.shape == (8, 10)


def test_prior_predictive_explicit_bounds(calibrated):
    w, x, _ = calibrated
    (d,) = w.prior_predictive(bounds={"m": (0.5, 3.0), "b": (-2.0, 2.0)},
                              n_samples=200)
    assert d.y_rep.shape == (200, x.size)
    # Prior replicates span far wider than any one posterior: the slope
    # range [0.5, 3] alone moves y(10) across [5, 30].
    assert d.y_rep[:, -1].std() > 3.0
    # All curves stay inside what the bounds allow (+noise slack).
    assert d.mu[:, -1].max() <= 3.0 * 10.0 + 2.0 + 1e-9
    assert d.mu[:, -1].min() >= 0.5 * 10.0 - 2.0 - 1e-9


def test_prior_predictive_recovers_bounds_from_prior():
    x = np.linspace(0.0, 10.0, 30)
    w = mfit.walker_create(
        function=line, data=(x, 2.0 * x + 1.0),
        params={"m": 1.5, "b": 0.5}, data_error=0.2, n_walkers=8, seed=0,
        log_prior=mfit.make_bounds_prior({"m": (1.0, 3.0), "b": (0.0, 2.0)}),
    )
    (d,) = w.prior_predictive(n_samples=64)
    assert d.y_rep.shape == (64, 30)
    # Without a bounds table anywhere, it must refuse.
    w2 = mfit.walker_create(
        function=line, data=(x, 2.0 * x + 1.0),
        params={"m": 1.5, "b": 0.5}, data_error=0.2, n_walkers=8, seed=0,
    )
    with pytest.raises(ValueError, match="bounds"):
        w2.prior_predictive()


def test_metrics_and_summary_carry_mcse(calibrated):
    from lisp_mcmc_tpu import diagnostics

    w, _, _ = calibrated
    m = diagnostics.metrics(w)
    assert set(m["mcse"]) == {"m", "b"}
    assert all(v > 0 for v in m["mcse"].values())
    s = diagnostics.summary(w)
    assert "MCSE" in s


def test_predict_on_new_grid(calibrated):
    """predict() evaluates the posterior curve family at NEW x — the
    credible band must be tight near the data and widen under
    extrapolation, and the prediction interval (noise=) must be wider
    than the curve band and contain fresh observations."""
    w, x, _ = calibrated
    grid = np.array([2.0, 5.0, 12.0, 20.0])     # last two extrapolate
    p = w.predict(grid, max_samples=256)
    assert p.mu.shape == (p.mu.shape[0], 4)
    assert p.y_rep is None
    np.testing.assert_allclose(p.mean(), 2.0 * grid + 1.0, atol=0.3)
    lo, hi = p.band()
    width = hi - lo
    assert width[3] > width[1]                   # extrapolation widens
    # With observation noise: prediction interval for new data.
    pn = w.predict(grid, noise=0.2, max_samples=256)
    lo_n, hi_n = pn.band()
    assert np.all(hi_n - lo_n > width)
    assert np.all(hi_n - lo_n > 2 * 1.6 * 0.2 * 0.8)


def test_ppc_plot_saves(calibrated, tmp_path):
    w, _, _ = calibrated
    path = str(tmp_path / "ppc.png")
    w.ppc_plot(max_samples=64, filename=path)
    import os

    assert os.path.getsize(path) > 0
