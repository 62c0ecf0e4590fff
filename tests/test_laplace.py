"""Laplace approximation (evidence.laplace_approx): the third evidence
estimator (ladder stepping-stone / SMC / Laplace) and instant curvature
uncertainties — one jax.hessian at the MAP."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.models import line


def _gaussian_walker(cov, mean=(1.0, -2.0), bounds=None, n_walkers=64):
    prec = np.linalg.inv(np.asarray(cov))
    mean = np.asarray(mean)

    def model(x, p):
        return jnp.zeros_like(x)

    def loglik(fn, params, dataset):
        v = jnp.stack([params["a"], params["b"]]) - jnp.asarray(mean)
        return -0.5 * v @ jnp.asarray(prec) @ v

    kw = {}
    if bounds is not None:
        kw["log_prior"] = mfit.make_bounds_prior(bounds)
    w = mfit.walker_create(
        function=model, data=([0.0, 1.0], [0.0, 0.0]),
        params={"a": 0.5, "b": -1.0}, log_likelihood=loglik,
        n_walkers=n_walkers, seed=0, walker_jitter=0.3, **kw)
    w.adaptive_steps(4000, temperature=1.0, auto=None)
    return w


def test_laplace_exact_on_gaussian():
    """A Gaussian posterior is its own Laplace expansion: the curvature
    covariance must equal the target covariance and log_z must equal the
    analytic normalization over the bounds box."""
    cov = np.array([[2.0, 0.6], [0.6, 0.5]])
    bounds = {"a": (-30.0, 30.0), "b": (-30.0, 30.0)}
    w = _gaussian_walker(cov, bounds=bounds)
    w.optimize(400)
    res = w.laplace_approx()
    assert res.n_clamped == 0
    np.testing.assert_allclose(res.cov, cov, rtol=1e-3, atol=1e-4)
    assert res.sd["a"] == pytest.approx(math.sqrt(2.0), rel=1e-3)
    # Analytic: integral of exp(loglik) = 2*pi*sqrt(det cov) (mass well
    # inside the box), V = 60*60, and lp_map ~ 0 at the mode.
    expected = math.log(2 * math.pi * math.sqrt(np.linalg.det(cov))) \
        - math.log(60.0 * 60.0)
    assert res.log_z == pytest.approx(expected, abs=1e-3)


def test_laplace_crosschecks_ladder_evidence():
    """Laplace and the stepping-stone ladder must agree on a clean
    Gaussian target (this is the DESIGN.md 'Laplace anchor', now in the
    test suite as a public-API cross-check)."""
    cov = np.array([[1.0, 0.0], [0.0, 0.25]])
    bounds = {"a": (-20.0, 20.0), "b": (-20.0, 20.0)}
    w = _gaussian_walker(cov, bounds=bounds, n_walkers=256)
    lap = w.laplace_approx()
    ladder = w.log_evidence(n_steps=12000, rungs=16, t_max=1e4)
    assert lap.log_z == pytest.approx(ladder.log_z, abs=0.35)


def test_laplace_without_bounds_no_logz():
    w = _gaussian_walker(np.eye(2))
    res = w.laplace_approx()
    assert res.log_z is None
    assert res.sd["a"] == pytest.approx(1.0, rel=1e-2)


def test_laplace_flags_degenerate_direction():
    """A posterior flat along one coordinate must clamp that eigenvalue
    and report it rather than returning a confident wrong covariance."""
    def model(x, p):
        return jnp.zeros_like(x)

    def loglik(fn, params, dataset):
        return -0.5 * params["a"] ** 2   # b unconstrained

    w = mfit.walker_create(
        function=model, data=([0.0, 1.0], [0.0, 0.0]),
        params={"a": 0.5, "b": -1.0}, log_likelihood=loglik,
        n_walkers=32, seed=0, walker_jitter=0.3)
    w.adaptive_steps(1000, temperature=1.0, auto=None)
    res = w.laplace_approx()
    assert res.n_clamped >= 1


def test_laplace_per_dataset_batched():
    """One vmapped Hessian gives every dataset's curvature + evidence;
    per-dataset sds match the closed-form least-squares covariance and
    the single-fit laplace_approx on the same data."""
    rng = np.random.default_rng(0)
    x = np.linspace(0.0, 10.0, 50)
    noises = [0.1, 0.4]
    datasets = [(x, 2.0 * x + 1.0 + rng.normal(0, s, 50)) for s in noises]
    bounds = {"m": (0.0, 4.0), "b": (-5.0, 5.0)}
    fit = mfit.BatchedFit(line, datasets, {"m": 1.8, "b": 0.8},
                          data_error=noises,
                          log_prior=mfit.make_bounds_prior(bounds),
                          walkers_per_dataset=32, seed=0,
                          walker_jitter=0.02)
    fit.adaptive_steps(3000, auto=None)
    fit.optimize(300)
    results = fit.laplace_per_dataset()
    assert len(results) == 2
    X = np.column_stack([x, np.ones_like(x)])
    for res, s in zip(results, noises):
        exact = s**2 * np.linalg.inv(X.T @ X)
        assert res.n_clamped == 0
        assert res.sd["m"] == pytest.approx(math.sqrt(exact[0, 0]), rel=1e-2)
        assert res.sd["b"] == pytest.approx(math.sqrt(exact[1, 1]), rel=1e-2)
        assert res.log_z is not None and np.isfinite(res.log_z)
    # The noisier dataset has wider parameter uncertainty.
    assert results[1].sd["m"] > 2 * results[0].sd["m"]

    # Cross-check dataset 0 against the single-fit estimator.
    w = mfit.walker_create(function=line, data=datasets[0],
                           params={"m": 1.8, "b": 0.8}, data_error=0.1,
                           log_prior=mfit.make_bounds_prior(bounds),
                           n_walkers=32, seed=0, walker_jitter=0.02)
    w.adaptive_steps(3000, auto=None)
    w.optimize(300)
    single = w.laplace_approx()
    assert results[0].log_z == pytest.approx(single.log_z, abs=0.05)

    # Plain laplace_approx on a multi-dataset batch must redirect.
    with pytest.raises(ValueError, match="laplace_per_dataset"):
        fit.laplace_approx()


def test_laplace_on_line_fit_matches_least_squares():
    """Linear-Gaussian model: the Laplace covariance is EXACT — it must
    reproduce the closed-form least-squares parameter covariance
    sigma^2 (X^T X)^-1 (a stronger anchor than the finite MCMC run,
    which this test measured ~2x under-dispersed at short budgets)."""
    rng = np.random.default_rng(0)
    x = np.linspace(0.0, 10.0, 60)
    y = 2.0 * x + 1.0 + rng.normal(0, 0.2, 60)
    w = mfit.walker_create(function=line, data=(x, y),
                           params={"m": 1.5, "b": 0.5}, data_error=0.2,
                           n_walkers=64, seed=0, walker_jitter=0.05)
    w.adaptive_steps(6000, auto=None)
    w.optimize(300)
    res = w.laplace_approx()
    X = np.column_stack([x, np.ones_like(x)])
    exact = 0.2**2 * np.linalg.inv(X.T @ X)
    assert res.sd["m"] == pytest.approx(math.sqrt(exact[0, 0]), rel=1e-3)
    assert res.sd["b"] == pytest.approx(math.sqrt(exact[1, 1]), rel=1e-3)
