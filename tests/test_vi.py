"""ADVI (variational.py): exactness on Gaussian posteriors, the evidence
convention, the named-prior transform path, and the chaining verbs.

A straight-line fit with Gaussian noise has an EXACTLY Gaussian
posterior, so ``rank="full"`` ADVI must recover it (mean, covariance,
evidence) and its importance-sampled log_z must agree with the Laplace
closed form — the same oracle the ladder/SMC/nested anchors use.
"""

import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.models import line
from lisp_mcmc_tpu.priors import Gaussian, PriorSpec, MVGaussian

SIGMA = 0.05
BOUNDS = {"b": (-3.0, 5.0), "m": (-2.0, 4.0)}


def _line_walker(seed=0, n_walkers=128, log_prior=None):
    rng = np.random.default_rng(seed)
    x = np.linspace(0.0, 2.0, 40)
    y = 1.0 + 0.5 * x + SIGMA * rng.standard_normal(x.size)
    if log_prior is None:
        log_prior = mfit.make_bounds_prior(BOUNDS)
    w = mfit.walker_create(
        function=line, data=(x, y), params={"b": 1.0, "m": 0.5},
        data_error=SIGMA, log_prior=log_prior,
        n_walkers=n_walkers, seed=seed, walker_jitter=0.1)
    return w, x, y


def _analytic_posterior(x, y):
    """Exact Gaussian posterior (mean, cov) of the line fit."""
    A = np.stack([np.ones_like(x), x], axis=1)
    prec = A.T @ A / SIGMA**2
    cov = np.linalg.inv(prec)
    mean = cov @ (A.T @ y / SIGMA**2)
    return mean, cov


def test_advi_exact_on_gaussian_posterior():
    w, x, y = _line_walker()
    vi = w.advi(n_steps=1200, n_samples=8, seed=3)
    mean, cov = _analytic_posterior(x, y)

    assert vi.rank == "full"
    assert abs(vi.mean["b"] - mean[0]) < 4e-2
    assert abs(vi.mean["m"] - mean[1]) < 4e-2
    # covariance: correct scale and the (negative) b-m correlation
    assert vi.sd["b"] == pytest.approx(np.sqrt(cov[0, 0]), rel=0.15)
    assert vi.sd["m"] == pytest.approx(np.sqrt(cov[1, 1]), rel=0.15)
    r_true = cov[0, 1] / np.sqrt(cov[0, 0] * cov[1, 1])
    r_vi = vi.cov[0, 1] / (vi.sd["b"] * vi.sd["m"])
    assert r_true < -0.5 and abs(r_vi - r_true) < 0.15

    # evidence: IS estimate matches the Laplace closed form (exact for a
    # linear-Gaussian model), ELBO is a tight lower bound, weights healthy
    w.optimize(300, rounds=2)
    lap = w.laplace_approx()
    assert lap.n_clamped == 0
    assert vi.log_z == pytest.approx(lap.log_z, abs=0.1)
    assert vi.elbo <= vi.log_z + 3 * (vi.log_z_error or 0.0) + 1e-6
    assert vi.log_z - vi.elbo < 0.1           # exact family: tiny gap
    assert vi.converged_evidence and vi.pareto_k < 0.7
    # the trace must actually improve and settle
    t = vi.elbo_trace
    assert t.shape == (1200,)
    assert np.mean(t[-100:]) > np.mean(t[:50])


def test_advi_meanfield_is_a_weaker_bound():
    w, _, _ = _line_walker()
    mf = w.advi(rank="meanfield", n_steps=1200, n_samples=8, seed=3)
    fr = w.advi(rank="full", n_steps=1200, n_samples=8, seed=3)
    # strong b-m correlation: the diagonal family must lose ELBO
    assert mf.elbo < fr.elbo - 0.2
    # ... and its IS evidence still brackets the truth from its own draws
    assert mf.log_z == pytest.approx(fr.log_z, abs=0.3)


def test_advi_named_prior_path():
    spec = PriorSpec({"b": Gaussian(1.0, 0.5), "m": Gaussian(0.5, 0.5)})
    w, x, y = _line_walker(log_prior=spec)
    vi = w.advi(n_steps=1200, n_samples=8, seed=5)
    w.optimize(300, rounds=2)
    lap = w.laplace_approx()          # spec recovered from the fitted term
    assert lap.log_z is not None
    assert vi.log_z == pytest.approx(lap.log_z, abs=0.1)
    assert vi.converged_evidence


def test_advi_seed_walker_and_chaining():
    w, _, _ = _line_walker()
    vi = w.advi(n_steps=800, n_samples=8, seed=7)

    fresh, _, _ = _line_walker(seed=1, n_walkers=64)
    out = vi.seed_walker(fresh, seed=2)
    assert out is fresh
    pos = np.asarray(fresh.state.position)
    assert pos.shape == (64, 2)
    assert np.all(np.isfinite(np.asarray(fresh.state.logprob)))
    # ensemble replaced wholesale: best == current, history dropped
    assert np.array_equal(np.asarray(fresh.state.best_position), pos)
    assert fresh.steps(10)[0].shape[0] >= 1   # live-ensemble fallback only
    # the seeded ensemble is posterior-shaped, not jitter-shaped
    assert np.std(pos[:, 0]) < 0.1

    mv = vi.to_mvgaussian(inflate=1.5)
    assert isinstance(mv, MVGaussian)
    chained = mfit.walker_create(
        function=line, data=(np.linspace(0, 2, 20), np.ones(20)),
        params={"b": vi.mean["b"], "m": vi.mean["m"]},
        data_error=SIGMA, log_prior=mv.as_log_prior(), n_walkers=16, seed=0,
        walker_jitter=0.05)
    assert np.all(np.isfinite(np.asarray(chained.state.logprob)))


def test_advi_without_spec_has_no_evidence():
    def custom_prior(params, dataset=None):
        return -0.5 * (params["b"] / 10.0) ** 2 - 0.5 * (params["m"] / 10.0) ** 2

    w, x, y = _line_walker(log_prior=custom_prior)
    vi = w.advi(n_steps=600, n_samples=8, seed=9)
    mean, _ = _analytic_posterior(x, y)
    assert vi.log_z is None and vi.elbo is None
    assert abs(vi.mean["b"] - mean[0]) < 6e-2
    assert abs(vi.mean["m"] - mean[1]) < 6e-2


def test_advi_rejects_grouped_and_bad_args():
    w, _, _ = _line_walker()
    with pytest.raises(ValueError):
        w.advi(rank="banana")
    with pytest.raises(ValueError):
        w.advi(n_steps=0)


def test_advi_per_dataset_batched():
    """S per-dataset q's from ONE vmapped scan: each block's ADVI must
    match ITS OWN dataset's Laplace evidence/mean (the per-dataset
    toolchain convention), and a grouped fit must refuse the scalar
    verb with a pointer here."""
    rng = np.random.default_rng(3)
    x = np.linspace(0.0, 2.0, 40)
    slopes = [0.5, -1.2]
    ds = [(x, 1.0 + m * x + SIGMA * rng.standard_normal(x.size))
          for m in slopes]
    fit = mfit.BatchedFit(
        line, ds, {"b": 1.0, "m": 0.2}, data_error=SIGMA,
        walkers_per_dataset=64, seed=0, walker_jitter=0.1,
        log_prior=mfit.make_bounds_prior(BOUNDS))
    fit.adaptive_steps(4000, auto=None)

    with pytest.raises(ValueError, match="advi_per_dataset"):
        fit.advi(n_steps=100)

    res = fit.advi_per_dataset(n_steps=1200, n_samples=8, seed=5)
    assert len(res) == 2
    fit.optimize(300, rounds=2)
    laps = fit.laplace_per_dataset()
    for s, (vi, lap, m_true) in enumerate(zip(res, laps, slopes)):
        assert vi.mean["m"] == pytest.approx(m_true, abs=0.05)
        assert vi.log_z == pytest.approx(lap.log_z, abs=0.15), s
        assert vi.converged_evidence
        assert vi.elbo_trace.shape == (1200,)
    # The two datasets genuinely differ — no cross-block leakage.
    assert abs(res[0].mean["m"] - res[1].mean["m"]) > 1.0


def test_advi_per_dataset_without_spec():
    """No resolvable prior: per-dataset q still fits (whitened space),
    evidence fields are None."""
    rng = np.random.default_rng(7)
    x = np.linspace(0.0, 2.0, 30)
    ds = [(x, 1.0 + 0.5 * x + SIGMA * rng.standard_normal(x.size)),
          (x, 1.0 + 0.8 * x + SIGMA * rng.standard_normal(x.size))]
    fit = mfit.BatchedFit(
        line, ds, {"b": 1.0, "m": 0.5}, data_error=SIGMA,
        walkers_per_dataset=64, seed=1, walker_jitter=0.1)
    fit.adaptive_steps(3000, auto=None)
    res = fit.advi_per_dataset(n_steps=800, seed=2)
    assert [r.log_z for r in res] == [None, None]
    assert res[0].mean["m"] == pytest.approx(0.5, abs=0.1)
    assert res[1].mean["m"] == pytest.approx(0.8, abs=0.1)
