"""Evidence estimation off the tempering ladder (evidence.py).

Validated against analytic marginal likelihoods: for likelihood
``L(theta) = N(theta; mu, sigma^2 I)`` (a normalized density in theta)
under a uniform prior on a box of volume V that contains essentially all
the Gaussian mass, ``Z = int L dtheta / V = (1 - eps) / V``.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.priors import make_bounds_prior


def _gaussian_walker(d, sigma, half_width, n_walkers=256, seed=0):
    keys = [f"p{i}" for i in range(d)]

    def model(x, p):
        return jnp.zeros_like(x)

    def loglik(fn, params, dataset):
        v = jnp.stack([params[k] for k in keys])
        return (-0.5 * jnp.sum(v * v) / sigma**2
                - 0.5 * d * math.log(2.0 * math.pi * sigma**2))

    bounds = {k: (-half_width, half_width) for k in keys}
    return mfit.walker_create(
        function=model, data=([0.0, 1.0], [0.0, 0.0]),
        params={k: 0.1 for k in keys}, log_likelihood=loglik,
        log_prior=make_bounds_prior(bounds),
        n_walkers=n_walkers, seed=seed, walker_jitter=0.3,
    )


def test_log_evidence_matches_analytic_gaussian():
    d, sigma, a = 2, 0.5, 4.0
    w = _gaussian_walker(d, sigma, a)
    res = w.log_evidence(n_steps=16000, rungs=16, t_max=1e4)
    true_log_z = -d * math.log(2 * a)     # box [-4, 4]^2 holds all the mass
    assert res.log_z == pytest.approx(true_log_z, abs=0.25), res
    # TI cross-check agrees with stepping-stone on a smooth unimodal target.
    assert res.log_z_ti == pytest.approx(res.log_z, abs=0.35), res
    # Diagnostics are sane: tail closure small, rungs ordered cold->hot.
    assert abs(res.tail) < 0.1
    assert res.betas[0] == pytest.approx(1.0)
    assert np.all(np.diff(res.betas) < 0)
    assert res.error < 0.2


def test_bayes_factor_prefers_narrower_box():
    """Same likelihood, 4x larger prior box -> evidence smaller by
    log(4) per dimension; the Bayes factor should say so."""
    d, sigma = 1, 0.5
    w_small = _gaussian_walker(d, sigma, 2.0, seed=1)
    w_big = _gaussian_walker(d, sigma, 8.0, seed=2)
    res_small = w_small.log_evidence(n_steps=12000, rungs=8, t_max=1e4)
    res_big = w_big.log_evidence(n_steps=12000, rungs=8, t_max=1e4)
    lb, err = mfit.log_bayes_factor(res_small, res_big)
    assert lb == pytest.approx(math.log10(4.0), abs=0.2), (lb, err)
    assert err < 0.2


def test_log_evidence_prior_seeded():
    """bounds= re-draws the start uniform in the box; on an easy target
    the estimate still matches the analytic value."""
    d, sigma, a = 1, 0.5, 2.0
    w = _gaussian_walker(d, sigma, a, seed=7)
    bounds = {"p0": (-a, a)}
    res = w.log_evidence(n_steps=12000, rungs=8, t_max=1e4, bounds=bounds)
    assert res.log_z == pytest.approx(-math.log(2 * a), abs=0.3), res


def test_log_evidence_ignores_prior_history():
    """History from earlier untempered runs must not be misread as
    ladder rungs (regression: stale cold-chain rows inflated log Z)."""
    d, sigma, a = 1, 0.5, 2.0
    w = _gaussian_walker(d, sigma, a, seed=9)
    # Accumulate substantial untempered history first.
    w.adaptive_steps(8000, temperature=1.0, auto=None)
    res = w.log_evidence(n_steps=12000, rungs=8, t_max=1e4)
    assert res.log_z == pytest.approx(-math.log(2 * a), abs=0.3), res


def test_log_evidence_validates_args():
    w = _gaussian_walker(1, 0.5, 2.0, n_walkers=32)
    with pytest.raises(ValueError):
        w.log_evidence(rungs=1)
    with pytest.raises(ValueError):
        w.log_evidence(burn=1.0)
    with pytest.raises(ValueError, match="missing"):
        w.log_evidence(rungs=8, bounds={})


def test_truncated_ladder_closes_by_prior_mc():
    """The [0, beta_min] closure must be MEASURED, not assumed: on the
    closed-form banana target (volume-preserving shear of a Gaussian,
    log Z = log(2 pi * 0.25) - log V) a t_max=30 ladder leaves 1.4+ nats
    of evidence mass below its hottest rung.  The prior-MC stepping
    stone recovers it (measured: the old linear closure read -3.07 with
    a deceptive +-0.007 error; truth is -4.518)."""

    def model(x, p):
        return jnp.zeros_like(x)

    def loglik(fn, params, dataset):
        t1, t2 = params["t1"], params["t2"]
        return -0.5 * t1 ** 2 - 0.5 * ((t2 - t1 ** 2) / 0.25) ** 2

    bounds = {"t1": (-6.0, 6.0), "t2": (-2.0, 10.0)}
    truth = math.log(2 * math.pi * 0.25) - math.log(12.0 * 12.0)
    w = mfit.walker_create(
        function=model, data=([0.0, 1.0], [0.0, 0.0]),
        params={"t1": 0.5, "t2": 0.5}, log_likelihood=loglik,
        log_prior=make_bounds_prior(bounds),
        n_walkers=512, seed=0, walker_jitter=0.5)
    w.adaptive_steps(6000, temperature=2.0, auto=None)
    res = w.log_evidence(n_steps=6000, rungs=8, t_max=30.0)
    # the closure honestly reports the mass below the hottest rung...
    assert res.tail < -1.0, res
    # ...and both estimators land on the closed form
    assert res.log_z == pytest.approx(truth, abs=0.25), res
    assert res.log_z_ti == pytest.approx(truth, abs=0.35), res
