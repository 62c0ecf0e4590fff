"""nested_per_dataset: S nested-sampling runs as one vmapped program.

Anchors:
  - linear-Gaussian fits, where the Laplace evidence is EXACT — each
    dataset's nested log_z must land on ITS OWN analytic anchor (this
    is the dataset-index-threading pin: the datasets are made very
    different, so a swapped or shared index fails by many sigma);
  - element-wise agreement with the single-fit nested_sample on the
    same data (same algorithm, independent RNG);
  - the named-prior (PriorSpec) u-space path against the same anchor.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.models import line
from lisp_mcmc_tpu.nested import nested_per_dataset, nested_sample

BOUNDS = {"m": (0.0, 4.0), "b": (-5.0, 5.0)}


def _datasets(seed=0):
    """Three deliberately different linear datasets: different slopes,
    intercepts, noise levels, and (ragged) lengths."""
    rng = np.random.default_rng(seed)
    specs = [(2.0, 1.0, 0.2, 40), (0.5, -2.0, 0.1, 40), (3.0, 0.0, 0.4, 28)]
    out, errs = [], []
    for m, b, s, n in specs:
        x = np.linspace(0.0, 10.0, n)
        out.append((x, m * x + b + rng.normal(0, s, n)))
        errs.append(s)
    return out, errs


def _batched(seed=0, **kwargs):
    data, errs = _datasets(seed)
    fit = mfit.BatchedFit(
        line, data, {"m": 1.5, "b": 0.5}, data_error=errs,
        log_prior=mfit.make_bounds_prior(BOUNDS),
        walkers_per_dataset=64, seed=seed, **kwargs)
    return fit, data, errs


def test_per_dataset_log_z_matches_exact_laplace():
    """Linear-Gaussian: Laplace is exact, so each dataset's nested log_z
    must hit its own anchor — the index-threading pin."""
    fit, _, _ = _batched()
    fit.adaptive_steps(1500, auto=None)
    fit.optimize(200)
    lap = fit.laplace_per_dataset()
    res = fit.nested_per_dataset(n_live=256, seed=0)
    assert len(res) == 3
    # The three evidences are far apart (different n, noise): a swapped
    # index cannot pass all three.
    lz = [r.log_z for r in res]
    assert max(lz) - min(lz) > 5.0
    for s in range(3):
        tol = max(4 * res[s].log_z_err, 0.35)
        assert res[s].log_z == pytest.approx(lap[s].log_z, abs=tol), s


def test_matches_single_fit_nested():
    """Same algorithm, same data, independent RNG: per-dataset results
    agree with nested_sample on a plain Walker within joint error bars."""
    fit, data, errs = _batched()
    res = fit.nested_per_dataset(n_live=256, seed=3)
    for s in (0, 2):          # cheapest and raggedest
        w = mfit.walker_create(
            function=line, data=data[s], params={"m": 1.5, "b": 0.5},
            data_error=errs[s], log_prior=mfit.make_bounds_prior(BOUNDS),
            n_walkers=16, seed=1, walker_jitter=0.05)
        single = nested_sample(w, n_live=256, seed=7)
        tol = 4 * math.hypot(res[s].log_z_err, single.log_z_err)
        assert res[s].log_z == pytest.approx(single.log_z, abs=tol), s


def test_posterior_draws_recover_truth_per_dataset():
    fit, _, _ = _batched()
    res = fit.nested_per_dataset(n_live=256, seed=1)
    truths = [(2.0, 1.0), (0.5, -2.0), (3.0, 0.0)]
    for r, (m, b) in zip(res, truths):
        draws = r.posterior_draws(2000, seed=0)
        assert draws.mean(axis=0)[0] == pytest.approx(m, abs=0.1)
        assert draws.mean(axis=0)[1] == pytest.approx(b, abs=0.5)
        assert r.ess > 200
        assert 0.0005 < r.insertion_p <= 1.0


def test_named_prior_u_space_path():
    """PriorSpec (Gaussian on m, uniform on b): the u-space run must
    agree with the exact conjugate Laplace evidence under the SAME
    declared prior."""
    spec = mfit.PriorSpec({"m": mfit.Gaussian(2.0, 1.0),
                           "b": mfit.Uniform(-5.0, 5.0)})
    data, errs = _datasets()
    fit = mfit.BatchedFit(
        line, data, {"m": 1.5, "b": 0.5}, data_error=errs,
        log_prior=spec, walkers_per_dataset=64, seed=0)
    fit.adaptive_steps(1500, auto=None)
    fit.optimize(200)
    lap = fit.laplace_per_dataset(prior=spec)
    res = fit.nested_per_dataset(prior=spec, n_live=256, seed=0)
    for s in range(3):
        tol = max(4 * res[s].log_z_err, 0.35)
        assert res[s].log_z == pytest.approx(lap[s].log_z, abs=tol), s
        # Samples come back in PHYSICAL space.
        draws = res[s].posterior_draws(500, seed=0)
        assert 0.0 < draws[:, 0].mean() < 4.0


def test_ensemble_untouched_and_independent_termination():
    fit, _, _ = _batched()
    before = np.asarray(fit.state.position).copy()
    rounds = []
    res = fit.nested_per_dataset(
        n_live=256, seed=0,
        on_round=lambda info: rounds.append(info["done"].copy()) and False)
    np.testing.assert_array_equal(before, np.asarray(fit.state.position))
    # Different datasets terminate at different rounds (independent
    # stop rules), and n_iter records each one's own close.
    iters = [r.n_iter for r in res]
    assert len(set(iters)) > 1 or not rounds[-1].all()


def test_validation():
    fit, _, _ = _batched()
    with pytest.raises(ValueError, match="missing"):
        fit.nested_per_dataset(bounds={"m": (0.0, 4.0)})
    # Plain fits are pointed at nested_sample and vice versa.
    w = mfit.walker_create(
        function=line, data=_datasets()[0][0], params={"m": 1.5, "b": 0.5},
        data_error=0.2, log_prior=mfit.make_bounds_prior(BOUNDS),
        n_walkers=8, seed=0)
    with pytest.raises(ValueError, match="nested_sample"):
        nested_per_dataset(w)
    with pytest.raises(ValueError, match="nested_per_dataset"):
        nested_sample(fit)
