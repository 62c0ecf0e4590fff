"""Tempered SMC sampler (smc.py)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.priors import make_bounds_prior


def _flat_model(x, p):
    return jnp.zeros_like(x)


def _make_walker(loglik, bounds, n_walkers=512, seed=0, guess=None, config=None):
    params = guess or {k: 0.5 * (lo + hi) for k, (lo, hi) in bounds.items()}
    return mfit.walker_create(
        function=_flat_model, data=([0.0, 1.0], [0.0, 0.0]),
        params=params, log_likelihood=loglik,
        log_prior=make_bounds_prior(bounds),
        n_walkers=n_walkers, seed=seed, walker_jitter=0.1, config=config)


def test_smc_evidence_matches_analytic_gaussian():
    """Same analytic target as test_evidence: Z = mass/V for a normalized
    Gaussian likelihood under a uniform box prior."""
    sigma, a = 0.5, 4.0
    bounds = {"p0": (-a, a), "p1": (-a, a)}

    def loglik(fn, params, dataset):
        v = jnp.stack([params["p0"], params["p1"]])
        return -0.5 * jnp.sum(v * v) / sigma**2 - math.log(2 * math.pi * sigma**2)

    w = _make_walker(loglik, bounds)
    res = w.smc_sample(bounds, n_move=400)
    true_log_z = -2 * math.log(2 * a)
    assert res.log_z == pytest.approx(true_log_z, abs=0.25), res
    assert res.betas[0] == 0.0 and res.betas[-1] == pytest.approx(1.0)
    assert np.all(np.diff(res.betas) > 0)
    # The ensemble ends distributed as the posterior.
    pos = np.asarray(w.state.position)
    assert abs(pos.mean()) < 0.12
    assert pos.std() == pytest.approx(sigma, rel=0.15)


def test_smc_preserves_multimodal_mass():
    """Two well-separated modes with 2:1 mass ratio: resampling keeps the
    population split by posterior weight, where annealed MH typically
    collapses into one basin."""
    bounds = {"p0": (-10.0, 10.0)}
    s = 0.3
    log_w1, log_w2 = math.log(2.0 / 3.0), math.log(1.0 / 3.0)

    def loglik(fn, params, dataset):
        v = params["p0"]
        g1 = log_w1 - 0.5 * (v - 5.0) ** 2 / s**2
        g2 = log_w2 - 0.5 * (v + 5.0) ** 2 / s**2
        return jnp.logaddexp(g1, g2) - math.log(math.sqrt(2 * math.pi) * s)

    w = _make_walker(loglik, bounds, n_walkers=1024, seed=1)
    res = w.smc_sample(bounds, n_move=200, seed=3)
    pos = np.asarray(w.state.position)[:, 0]
    frac_right = float((pos > 0).mean())
    assert frac_right == pytest.approx(2.0 / 3.0, abs=0.08), frac_right
    # Evidence for a normalized likelihood on a box: Z = 1/V.
    assert res.log_z == pytest.approx(-math.log(20.0), abs=0.3), res


def test_smc_batched_per_dataset_evidence():
    """Grouped fits: each dataset's block is its own particle population
    with its own evidence; narrower-peak data must score lower log Z."""
    from lisp_mcmc_tpu.models import gaussian_peak

    rng = np.random.default_rng(0)
    x = np.linspace(-4.0, 4.0, 64)

    def spec(scale):
        y = np.asarray(gaussian_peak(x, {"scale": scale, "x0": 0.4,
                                         "sigma": 1.0, "bg0": 0.1}))
        return x, y + 0.02 * rng.standard_normal(64)

    bounds = {"scale": (0.1, 4.0), "x0": (-3.0, 3.0),
              "sigma": (0.3, 3.0), "bg0": (-1.0, 1.0)}
    fit = mfit.BatchedFit(gaussian_peak, [spec(2.0), spec(1.0)],
                          {"scale": 1.0, "x0": 0.3, "sigma": 1.0, "bg0": 0.1},
                          data_error=0.02, walkers_per_dataset=256, seed=0,
                          log_prior=make_bounds_prior(bounds))
    res = fit.smc_sample(bounds, n_move=200, seed=2)
    assert res.log_z_per_group is not None and len(res.log_z_per_group) == 2
    assert res.log_z == pytest.approx(res.log_z_per_group.sum())
    # Both datasets fit their own truth: per-dataset bests recovered.
    best = fit.best_params_per_dataset()
    assert best[0]["scale"] == pytest.approx(2.0, abs=0.1)
    assert best[1]["scale"] == pytest.approx(1.0, abs=0.1)


def test_smc_validates_inputs():
    bounds = {"p0": (-1.0, 1.0)}

    def loglik(fn, params, dataset):
        return -0.5 * params["p0"] ** 2

    w = _make_walker(loglik, bounds, n_walkers=64)
    with pytest.raises(ValueError, match="missing"):
        w.smc_sample({})
    with pytest.raises(ValueError, match="target_ress"):
        w.smc_sample(bounds, target_ress=1.5)
    with pytest.raises(ValueError, match="high > low"):
        w.smc_sample({"p0": (1.0, -1.0)})
