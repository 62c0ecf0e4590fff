"""Multi-start gradient optimization (Walker.optimize)."""

import jax.numpy as jnp
import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.models import gaussian_peak, line
from lisp_mcmc_tpu.priors import make_bounds_prior


def test_optimize_line_reaches_least_squares():
    """On a linear model with normal likelihood the MAP is the exact
    least-squares solution; Adam should land on it to high precision."""
    rng = np.random.default_rng(0)
    x = np.linspace(0.0, 10.0, 60)
    y = 2.0 * x + 1.0 + 0.05 * rng.standard_normal(60)
    w = mfit.walker_create(
        function=line, data=(x, y), params={"m": 0.3, "b": -1.0},
        data_error=0.05, n_walkers=32, seed=0, walker_jitter=0.3)
    lp0 = float(jnp.max(w.state.logprob))
    w.optimize(800, learning_rate=0.05)
    lp1, best = w.most_likely_step()
    A = np.stack([x, np.ones_like(x)], axis=1)
    m_ls, b_ls = np.linalg.lstsq(A, y, rcond=None)[0]
    assert lp1 > lp0
    assert best["m"] == pytest.approx(m_ls, abs=2e-3)
    assert best["b"] == pytest.approx(b_ls, abs=1e-2)


def test_optimize_never_degrades_walkers():
    """Walkers whose ascent ends worse (or non-finite) keep their state."""
    x = np.linspace(0.0, 10.0, 30)
    y = 2.0 * x + 1.0
    w = mfit.walker_create(
        function=line, data=(x, y), params={"m": 2.0, "b": 1.0},
        data_error=0.1, n_walkers=16, seed=1, walker_jitter=0.5)
    lp_before = np.asarray(w.state.logprob).copy()
    w.optimize(50, learning_rate=0.3)
    lp_after = np.asarray(w.state.logprob)
    assert np.all(lp_after >= lp_before - 1e-9)
    assert np.all(np.isfinite(lp_after))


def test_optimize_polishes_after_anneal():
    """The production recipe: a short anneal finds the basin, optimize
    sharpens the MAP past what finite-acceptance MH reaches."""
    rng = np.random.default_rng(3)
    x = np.linspace(-5.0, 5.0, 80)
    true = {"scale": 2.0, "x0": 0.7, "sigma": 1.3, "bg0": 0.2}
    y = np.asarray(gaussian_peak(x, true)) + 0.02 * rng.standard_normal(80)
    w = mfit.walker_create(
        function=gaussian_peak, data=(x, y),
        # x0 guess must be nonzero-magnitude: walker jitter, the proposal
        # L diag, and optimize()'s whitening scales all derive from
        # parameter magnitudes (reference policy, mcmc-fitting.lisp:899).
        params={"scale": 1.0, "x0": 0.3, "sigma": 2.0, "bg0": 0.1},
        data_error=0.02, n_walkers=64, seed=2, walker_jitter=0.2)
    w.adaptive_steps(3000, auto=None)
    lp_mh, _ = w.most_likely_step()
    w.optimize(500)
    lp_opt, best = w.most_likely_step()
    assert lp_opt >= lp_mh
    assert best["x0"] == pytest.approx(true["x0"], abs=0.02)
    # sigma enters the model squared; the +/- modes are equivalent.
    assert abs(best["sigma"]) == pytest.approx(true["sigma"], abs=0.05)


def test_optimize_respects_bounds_penalty():
    """The smooth exterior penalty's gradient keeps ascent inside."""
    x = np.linspace(0.0, 10.0, 30)
    y = 2.0 * x + 1.0
    w = mfit.walker_create(
        function=line, data=(x, y), params={"m": 1.4, "b": 0.5},
        data_error=0.1, log_prior=make_bounds_prior({"m": (0.0, 1.5)}),
        n_walkers=16, seed=4, walker_jitter=0.05)
    w.optimize(400)
    _, best = w.most_likely_step()
    assert 0.0 < best["m"] <= 1.5 + 1e-6


def test_optimize_batched_fit_per_dataset():
    """optimize() inherits through BatchedFit's aux path: every
    dataset's walkers ascend their own posterior."""
    rng = np.random.default_rng(0)
    x = np.linspace(0.0, 10.0, 40)
    datasets = [(x, (2.0 + i) * x + 1.0 + 0.05 * rng.standard_normal(40))
                for i in range(3)]
    fit = mfit.BatchedFit(line, datasets, {"m": 1.0, "b": 0.5},
                          data_error=0.05, walkers_per_dataset=16, seed=0)
    fit.optimize(600)
    best = fit.best_params_per_dataset()
    for i, b in enumerate(best):
        assert b["m"] == pytest.approx(2.0 + i, abs=0.02)


def test_optimize_rounds_refit_scales():
    """On stiff posteriors successive rounds (scales refit to the
    improved ensemble) keep gaining where one long run stalls."""
    rng = np.random.default_rng(5)
    x = np.linspace(0.0, 10.0, 50)
    y = 2.0 * x + 1.0 + 1e-4 * rng.standard_normal(50)
    w1 = mfit.walker_create(
        function=line, data=(x, y), params={"m": 0.5, "b": 2.0},
        data_error=1e-4, n_walkers=32, seed=0, walker_jitter=0.4)
    w2 = mfit.walker_create(
        function=line, data=(x, y), params={"m": 0.5, "b": 2.0},
        data_error=1e-4, n_walkers=32, seed=0, walker_jitter=0.4)
    w1.optimize(200, rounds=1)
    w2.optimize(200, rounds=3)
    lp1 = float(w1.most_likely_step()[0])
    lp2 = float(w2.most_likely_step()[0])
    assert lp2 >= lp1
    A = np.stack([x, np.ones_like(x)], axis=1)
    m_ls, b_ls = np.linalg.lstsq(A, y, rcond=None)[0]
    best = w2.most_likely_params()
    assert best["m"] == pytest.approx(m_ls, rel=1e-4)


def test_optimize_validates_args():
    x = np.linspace(0.0, 1.0, 10)
    w = mfit.walker_create(
        function=line, data=(x, x), params={"m": 1.0, "b": 0.0},
        data_error=0.1, n_walkers=8, seed=0)
    with pytest.raises(ValueError):
        w.optimize(0)
