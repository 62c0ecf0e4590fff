"""Profile-likelihood confidence intervals (profile.py).

Anchored to the linear-Gaussian case where the profile is exactly
quadratic (CI must match the closed-form least-squares +-1.96 sd) and a
nonlinear case where asymmetry is real.
"""

import math

import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.models import exponential_decay, line


@pytest.fixture(scope="module")
def line_fit():
    rng = np.random.default_rng(0)
    x = np.linspace(0.0, 10.0, 60)
    y = 2.0 * x + 1.0 + rng.normal(0, 0.2, 60)
    w = mfit.walker_create(function=line, data=(x, y),
                           params={"m": 1.5, "b": 0.5}, data_error=0.2,
                           n_walkers=32, seed=0, walker_jitter=0.05)
    w.adaptive_steps(3000, auto=None)
    w.optimize(300)
    return w, x


def test_profile_matches_least_squares(line_fit):
    """Linear-Gaussian: the profile is an exact parabola, so the 95%
    likelihood-ratio interval equals MAP +- 1.96 sd_ls."""
    w, x = line_fit
    res = w.profile_likelihood("m", n_grid=25)
    lo, hi, bl, bh = res.ci(0.95)
    assert bl and bh
    X = np.column_stack([x, np.ones_like(x)])
    sd = 0.2 * math.sqrt(np.linalg.inv(X.T @ X)[0, 0])
    m_hat = w.most_likely_params()["m"]
    assert lo == pytest.approx(m_hat - 1.96 * sd, abs=0.2 * sd)
    assert hi == pytest.approx(m_hat + 1.96 * sd, abs=0.2 * sd)
    # The profile maximum sits at (grid point nearest) the MAP.
    assert res.at_max == pytest.approx(m_hat, abs=(res.grid[1] - res.grid[0]))
    # Each pinned re-optimization recovers the conditional optimum: the
    # profile curve is concave with its max in the interior.
    assert res.profile_lp.argmax() not in (0, len(res.grid) - 1)


def test_profile_asymmetric_on_decay_rate(line_fit):
    """Exponential decay tau: curvature differs on the two sides of the
    optimum, so the profile CI is genuinely asymmetric (the symmetric
    Laplace sd cannot represent this)."""
    rng = np.random.default_rng(1)
    x = np.linspace(0.0, 6.0, 40)
    y = 2.0 * np.exp(-x / 1.5) + 0.1 + 0.05 * rng.standard_normal(40)
    w = mfit.walker_create(function=exponential_decay, data=(x, y),
                           params={"scale": 1.5, "tau": 2.0, "bg0": 0.2},
                           data_error=0.05, n_walkers=32, seed=0,
                           walker_jitter=0.05)
    w.adaptive_steps(3000, auto=None)
    w.optimize(300)
    res = w.profile_likelihood("tau", n_grid=31, span=5.0)
    lo, hi, bl, bh = res.ci(0.95)
    assert bl and bh
    assert lo < 1.5 < hi                      # truth covered
    t_hat = res.at_max
    assert (hi - t_hat) != pytest.approx(t_hat - lo, rel=0.05)  # asymmetry


def test_profile_grid_limited_flags(line_fit):
    w, _ = line_fit
    m_hat = w.most_likely_params()["m"]
    # A grid entirely inside the CI: no crossing, flags must say so.
    tight = np.linspace(m_hat - 1e-5, m_hat + 1e-5, 7)
    res = w.profile_likelihood("m", grid=tight)
    lo, hi, bl, bh = res.ci(0.95)
    assert not bl and not bh
    assert "grid-limited" in repr(res)


def test_profile_survives_nan_region():
    """A default grid that reaches outside a parameter's domain (here
    noise_scale <= 0 -> log(k) NaN) must not poison the profile: NaN
    start evaluations are floored, the finite grid points optimize, and
    the CI comes back finite (review finding, round 2)."""
    rng = np.random.default_rng(5)
    x = np.linspace(0.0, 10.0, 50)
    y = 2.0 * x + 1.0 + rng.normal(0, 0.3, 50)
    w = mfit.walker_create(
        function=line, data=(x, y),
        params={"m": 1.5, "b": 0.5, "noise_scale": 1.0}, data_error=1.0,
        log_likelihood=mfit.make_noise_scale_likelihood(),
        log_prior=mfit.make_bounds_prior({"noise_scale": (1e-3, 1e3)}),
        n_walkers=32, seed=0, walker_jitter=0.05)
    w.adaptive_steps(3000, auto=None)
    w.optimize(200)
    k_hat = w.most_likely_params()["noise_scale"]
    # Grid deliberately spanning into k <= 0.
    grid = np.linspace(-0.1, 2.5 * k_hat, 25)
    res = w.profile_likelihood("noise_scale", grid=grid)
    assert np.isfinite(res.lp_max)
    lo, hi, bl, bh = res.ci(0.95)
    assert np.isfinite(lo) and np.isfinite(hi)
    assert lo < k_hat < hi
    assert lo > 0.0                       # CI never extends into NaN-land


def test_profile_validation(line_fit):
    w, _ = line_fit
    with pytest.raises(ValueError, match="unknown parameter"):
        w.profile_likelihood("nope")
