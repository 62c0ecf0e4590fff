"""Batched nested sampling (nested.py): the fourth evidence estimator.

Anchored to analytic Gaussian/bimodal integrals (the bookkeeping this
suite pins caught two real bugs during development: linear-vs-harmonic
order-statistic shrinkage at large k_batch, and the refill threshold
being the surviving minimum instead of the highest deleted likelihood —
each a multi-sigma evidence bias on these very tests' targets).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.models import line
from lisp_mcmc_tpu.nested import nested_sample

BOUNDS2 = {"a": (-20.0, 20.0), "b": (-20.0, 20.0)}
BOX_VOL = 40.0 * 40.0


def _walker(loglik, bounds=BOUNDS2):
    def model(x, p):
        return jnp.zeros_like(x)

    return mfit.walker_create(
        function=model, data=([0.0, 1.0], [0.0, 0.0]),
        params={"a": 0.5, "b": -1.0}, log_likelihood=loglik,
        log_prior=mfit.make_bounds_prior(bounds),
        n_walkers=8, seed=0, walker_jitter=0.1)


def _gaussian_loglik(cov, mean=(1.0, -2.0)):
    prec = np.linalg.inv(np.asarray(cov))
    mean = np.asarray(mean)

    def loglik(fn, params, dataset):
        v = jnp.stack([params["a"], params["b"]]) - jnp.asarray(mean)
        return -0.5 * v @ jnp.asarray(prec) @ v

    return loglik


def test_gaussian_evidence_and_posterior():
    cov = np.array([[2.0, 0.6], [0.6, 0.5]])
    w = _walker(_gaussian_loglik(cov))
    res = nested_sample(w, n_live=512, seed=0)
    analytic = math.log(2 * math.pi * math.sqrt(np.linalg.det(cov))) \
        - math.log(BOX_VOL)
    assert res.log_z == pytest.approx(analytic, abs=3 * res.log_z_err)
    assert res.log_z_err < 0.2
    draws = res.posterior_draws(4000, seed=0)
    np.testing.assert_allclose(draws.mean(axis=0), [1.0, -2.0], atol=0.1)
    np.testing.assert_allclose(np.cov(draws.T), cov, rtol=0.25, atol=0.05)
    assert res.ess > 500


def test_correlated_narrow_gaussian():
    """Strong correlation + small volume: the DE refill moves must track
    the shrinking anisotropic region (this is where a spherical-proposal
    refill would stall)."""
    cov = np.array([[1.0, 0.98], [0.98, 1.0]]) * 0.01
    w = _walker(_gaussian_loglik(cov))
    res = nested_sample(w, n_live=512, seed=0)
    analytic = math.log(2 * math.pi * math.sqrt(np.linalg.det(cov))) \
        - math.log(BOX_VOL)
    assert res.log_z == pytest.approx(analytic, abs=4 * res.log_z_err)


def test_bimodal_mass_split():
    """Equal-weight well-separated modes: evidence counts BOTH (a
    single-chain sampler stuck in one mode reads log 2 low), and the
    posterior draws split ~50/50."""
    sep, s = 10.0, 0.5

    def loglik(fn, params, dataset):
        a, b = params["a"], params["b"]
        return jnp.logaddexp(
            -0.5 * ((a - sep / 2) ** 2 + b ** 2) / s**2,
            -0.5 * ((a + sep / 2) ** 2 + b ** 2) / s**2) \
            - math.log(2.0)

    w = _walker(loglik)
    res = nested_sample(w, n_live=1024, seed=0)
    analytic = math.log(2 * math.pi * s**2) - math.log(BOX_VOL)
    assert res.log_z == pytest.approx(analytic, abs=4 * res.log_z_err)
    draws = res.posterior_draws(4000, seed=1)
    frac_hi = float(np.mean(draws[:, 0] > 0))
    assert 0.3 < frac_hi < 0.7


def test_unequal_mass_split():
    """90/10 mass ratio: the posterior draws must reproduce it (weights,
    not just support)."""
    sep, s = 10.0, 0.5

    def loglik(fn, params, dataset):
        a, b = params["a"], params["b"]
        return jnp.logaddexp(
            math.log(0.9) - 0.5 * ((a - sep / 2) ** 2 + b ** 2) / s**2,
            math.log(0.1) - 0.5 * ((a + sep / 2) ** 2 + b ** 2) / s**2)

    w = _walker(loglik)
    res = nested_sample(w, n_live=1024, seed=0)
    draws = res.posterior_draws(6000, seed=2)
    frac_hi = float(np.mean(draws[:, 0] > 0))
    assert frac_hi == pytest.approx(0.9, abs=0.08)


def test_agrees_with_laplace_on_line_fit():
    """Fourth-estimator cross-check on a real fit: nested log_z within
    a few error bars of the (exact, linear-Gaussian) Laplace log_z."""
    rng = np.random.default_rng(0)
    x = np.linspace(0.0, 10.0, 40)
    y = 2.0 * x + 1.0 + rng.normal(0, 0.2, 40)
    bounds = {"m": (0.0, 4.0), "b": (-5.0, 5.0)}
    w = mfit.walker_create(
        function=line, data=(x, y), params={"m": 1.5, "b": 0.5},
        data_error=0.2, log_prior=mfit.make_bounds_prior(bounds),
        n_walkers=32, seed=0, walker_jitter=0.05)
    w.adaptive_steps(2000, auto=None)
    w.optimize(200)
    lap = w.laplace_approx()
    res = w.nested_sample(n_live=512, seed=0)
    assert res.log_z == pytest.approx(lap.log_z, abs=0.3)


def test_validation():
    w = _walker(_gaussian_loglik(np.eye(2)))
    with pytest.raises(ValueError, match="missing"):
        nested_sample(w, bounds={"a": (-1, 1)})
    with pytest.raises(ValueError, match="k_batch"):
        nested_sample(w, n_live=64, k_batch=60)

    # No bounds table anywhere -> must refuse.
    def model(x, p):
        return jnp.zeros_like(x)

    w2 = mfit.walker_create(
        function=model, data=([0.0, 1.0], [0.0, 0.0]),
        params={"a": 0.5, "b": -1.0},
        log_likelihood=_gaussian_loglik(np.eye(2)),
        n_walkers=8, seed=0)
    with pytest.raises(ValueError, match="bounds"):
        nested_sample(w2)


def test_nan_likelihood_region_floored():
    """A posterior that returns NaN somewhere in the box (e.g. a model
    driving log(rate) negative) must not poison the live set: a NaN
    sorts as the best point forever and the run would burn max_iter
    rounds to return log_z = NaN before the init floor existed."""
    def loglik(fn, params, dataset):
        a, b = params["a"], params["b"]
        # NaN for a > 0 (half the box), a clean Gaussian elsewhere.
        return jnp.log(-a) * 0.0 - 0.5 * ((a + 3.0) ** 2 + b ** 2)

    w = _walker(loglik)
    res = nested_sample(w, n_live=256, seed=0, max_iter=400)
    assert np.isfinite(res.log_z)
    assert res.n_iter < 400
    draws = res.posterior_draws(2000, seed=0)
    assert np.all(draws[:, 0] < 0)           # mass on the finite side
    assert draws[:, 0].mean() == pytest.approx(-3.0, abs=0.3)


def test_donor_span_validation():
    w = _walker(_gaussian_loglik(np.eye(2)))
    with pytest.raises(ValueError, match="affine subspace"):
        nested_sample(w, n_live=6, k_batch=3)


def test_insertion_rank_diagnostic_present():
    """Healthy runs carry a non-degenerate insertion-rank uniformity p.
    (Measured blind spot, documented in the module: clone-correlation
    passes this test; only directional refill bias fails it.)"""
    w = _walker(_gaussian_loglik(np.eye(2)))
    res = nested_sample(w, n_live=256, seed=0)
    assert 0.001 < res.insertion_p <= 1.0


def test_ensemble_untouched():
    w = _walker(_gaussian_loglik(np.eye(2)))
    before = np.asarray(w.state.position).copy()
    nested_sample(w, n_live=256, seed=0)
    np.testing.assert_array_equal(before, np.asarray(w.state.position))
