"""One-call calibration report card (diagnostics.audit).

The TUNING.md cheapest-first ladder as a verb: convergence -> LOO-PIT ->
prior sensitivity, each failure contributing plain-language advice,
each impossible check recorded in `skipped` (never silently passed).
"""

import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.diagnostics import AuditResult, audit
from lisp_mcmc_tpu.models import line
from lisp_mcmc_tpu.priors import Gaussian, PriorSpec

X = np.linspace(0, 10, 40)


def _fit(y, err, spec=None, n_steps=6000, seed=1):
    w = mfit.walker_create(function=line, data=(X, y),
                           params={"m": 1.5, "b": 0.5}, data_error=err,
                           n_walkers=64, seed=seed, walker_jitter=0.05,
                           log_prior=spec)
    w.adaptive_steps(n_steps, auto=None)
    w.burn_steps(len(w) // 2)
    return w


def test_audit_healthy_fit_passes():
    rng = np.random.default_rng(0)
    y = 2.0 * X + 1.0 + rng.normal(0, 0.3, 40)
    w = _fit(y, 0.3, PriorSpec({"m": Gaussian(2.0, 1.0),
                                "b": Gaussian(1.0, 2.0)}))
    # the documented production recipe: cold sampling history only
    w.reset_to_most_likely()
    w.sampling_steps(4000)
    r = audit(w, min_tail_ess=50.0)
    assert isinstance(r, AuditResult)
    assert r.ok and not r.advice and not r.skipped
    assert r.loo_pit is not None and r.prior_sensitivity is not None


def test_audit_understated_errors_and_conflict():
    rng = np.random.default_rng(1)
    y = 2.0 * X + 1.0 + rng.normal(0, 0.3, 40)
    # claimed error 3x too small AND a conflicting tight prior
    r = audit(_fit(y, 0.1, PriorSpec({"m": Gaussian(0.0, 0.15),
                                      "b": Gaussian(1.0, 2.0)}),
                   n_steps=10000), min_tail_ess=50.0)
    assert not r.ok
    text = " ".join(r.advice)
    assert "over-confident" in text or "understated" in text
    assert "prior-data conflict" in text


def test_audit_skips_impossible_checks():
    """A custom posterior has no pointwise decomposition: loo_pit and
    prior_sensitivity are SKIPPED with the library's own reason, and the
    convergence verdict still runs."""
    import jax.numpy as jnp

    from lisp_mcmc_tpu.fit import Walker
    from lisp_mcmc_tpu.params import ParamSpec

    def logp(theta, data):
        return -0.5 * jnp.sum(theta ** 2)

    w = Walker([], ParamSpec(("a", "b")), np.asarray([0.1, 0.1]),
               n_walkers=32, seed=0, walker_jitter=0.5,
               log_posterior=logp)
    w.adaptive_steps(4000, auto=None)
    w.burn_steps(len(w) // 2)
    r = audit(w, min_tail_ess=30.0)
    assert "loo_pit" in r.skipped
    assert r.loo_pit is None
    assert r.convergence["ok"] in (True, False)   # it RAN


def test_audit_flags_unconverged_history():
    rng = np.random.default_rng(2)
    y = 2.0 * X + 1.0 + rng.normal(0, 0.3, 40)
    w = _fit(y, 0.3, None, n_steps=400)           # hopeless budget
    r = w.audit()
    assert not r.ok
    assert any("converged" in a for a in r.advice)


def test_audit_per_dataset_on_batched_fit():
    rng = np.random.default_rng(3)
    x = np.linspace(0, 10, 40)
    datasets = [(x, 2.0 * x + 1.0 + rng.normal(0, 0.1, 40)),
                (x, 3.0 * x - 1.0 + rng.normal(0, 0.1, 40))]
    bf = mfit.BatchedFit(line, datasets, {"m": 1.0, "b": 0.5},
                         data_error=0.1, walkers_per_dataset=32, seed=0)
    bf.adaptive_steps(6000, auto=None)
    bf.burn_steps(len(bf) // 2)
    reports = bf.audit_per_dataset(min_tail_ess=30.0)
    assert len(reports) == 2
    assert all(r.loo_pit is not None for r in reports)
    assert all(isinstance(r, AuditResult) for r in reports)
