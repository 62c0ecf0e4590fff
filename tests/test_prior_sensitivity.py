"""Power-scaling prior/likelihood sensitivity (Kallioinen et al. 2023).

Completes the named-prior (PriorSpec) workflow: after fitting with an
informative prior, `diagnostics.prior_sensitivity` answers "was that
prior load-bearing, and does it fight the data?" by importance-
reweighting the existing history to prior^a * lik and prior * lik^a.
Anchors: a conflict triad (agreeable / conflicting / flat priors) and
the conjugate-Gaussian analytic derivative of the posterior mean under
prior power-scaling.
"""

import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.diagnostics import (PriorSensitivityResult,
                                       _cjs_distance, prior_sensitivity)
from lisp_mcmc_tpu.models import line
from lisp_mcmc_tpu.priors import Gaussian, PriorSpec, Uniform


def _linefit(spec, seed=1, noise=0.5, n_steps=6000):
    rng = np.random.default_rng(0)
    x = np.linspace(0, 10, 40)
    y = 2.0 * x + 1.0 + rng.normal(0, noise, 40)
    w = mfit.walker_create(function=line, data=(x, y),
                           params={"m": 1.5, "b": 0.5}, data_error=noise,
                           n_walkers=64, seed=seed, walker_jitter=0.05,
                           log_prior=spec)
    w.adaptive_steps(n_steps, auto=None)
    w.burn_steps(len(w) // 2)
    return w


def test_sensitivity_triad():
    """Agreeable prior -> robust; tight conflicting prior -> conflict on
    the constrained parameter; flat box -> prior sensitivity exactly 0
    (a uniform density is invariant under power-scaling)."""
    agree = _linefit(PriorSpec({"m": Gaussian(2.0, 1.0),
                                "b": Gaussian(1.0, 2.0)}))
    r = prior_sensitivity(agree)
    assert isinstance(r, PriorSensitivityResult)
    assert r.ok and r.diagnosis["m"] == "robust"
    assert r.prior["m"] < 0.02

    conflict = _linefit(PriorSpec({"m": Gaussian(0.0, 0.15),
                                   "b": Gaussian(1.0, 2.0)}))
    rc = prior_sensitivity(conflict)
    assert not rc.ok
    assert rc.diagnosis["m"] == "prior-data conflict"
    assert rc.prior["m"] > 0.1 and rc.likelihood["m"] > 0.1

    flat = _linefit(None)
    rf = prior_sensitivity(flat, prior={"m": (0.0, 5.0), "b": (-5.0, 5.0)})
    assert rf.ok
    assert all(v == 0.0 for v in rf.prior.values())


def test_conjugate_derivative_anchor():
    """IS finite-difference derivative of E[m] under prior power-scaling
    matches the conjugate-Gaussian analytic value.

    For prior N(mu0, s0^2) on m, d E[m] / d a at a=1 equals
    Cov_post(m, log pi(m)) = -sp^2 (mp - mu0) / s0^2 with (mp, sp) the
    posterior moments (third central moment ~ 0 for a Gaussian
    posterior)."""
    mu0, s0 = 1.0, 0.5
    w = _linefit(PriorSpec({"m": Gaussian(mu0, s0),
                            "b": Gaussian(1.0, 2.0)}), n_steps=12000)
    pos, _ = w.steps()
    m = np.asarray(pos)[:, w.spec.keys.index("m")].astype(np.float64)
    mp, sp = m.mean(), m.std(ddof=1)
    analytic = -sp ** 2 * (mp - mu0) / s0 ** 2
    # the prior pulls the data's m=2 toward mu0=1, so the derivative
    # must be decidedly negative (more prior power -> smaller mean)
    assert analytic < -1e-4

    logpi = -0.5 * ((m - mu0) / s0) ** 2
    a = 1.05
    means = []
    for alpha in (1.0 / a, a):
        lw = (alpha - 1.0) * logpi
        wgt = np.exp(lw - lw.max())
        wgt /= wgt.sum()
        means.append(float(np.sum(wgt * m)))
    fd = (means[1] - means[0]) / (a - 1.0 / a)
    assert fd == pytest.approx(analytic, rel=0.25)


def test_validation_and_error_paths():
    w = _linefit(PriorSpec({"m": Gaussian(2.0, 1.0),
                            "b": Gaussian(1.0, 2.0)}), n_steps=2000)
    with pytest.raises(ValueError, match="alpha"):
        prior_sensitivity(w, alpha=0.5)
    # a prior whose support excludes the posterior draws is an honest
    # error, not a silent +-inf weight
    with pytest.raises(ValueError, match="non-finite"):
        prior_sensitivity(w, prior=PriorSpec({"m": Uniform(10.0, 20.0),
                                              "b": Uniform(-5.0, 5.0)}))
    # grouped/batched fits must be computed per dataset
    x = np.linspace(0, 10, 30)
    bf = mfit.BatchedFit(line, [(x, 2 * x + 1), (x, 3 * x - 1)],
                         {"m": 1.0, "b": 0.5}, data_error=0.1,
                         walkers_per_dataset=8, seed=0)
    bf.adaptive_steps(400, auto=None)
    with pytest.raises(ValueError, match="per.dataset|grouped"):
        prior_sensitivity(bf)
    # ...and the per-dataset view works
    r = prior_sensitivity(bf.dataset_view(0),
                          prior={"m": (0.0, 5.0), "b": (-5.0, 5.0)})
    assert r.ok


def test_cjs_distance_properties():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(512)
    u = np.full(512, 1.0 / 512)
    assert _cjs_distance(x, u) == pytest.approx(0.0, abs=1e-12)
    # all mass on the extreme right tail: large but bounded by 1
    w1 = np.zeros(512)
    w1[np.argmax(x)] = 1.0
    d = _cjs_distance(x, w1)
    assert 0.5 < d <= 1.0
    # degenerate marginal (all samples equal) is 0, not NaN
    assert _cjs_distance(np.zeros(64), u[:64] * 8) == 0.0


def test_walker_delegate():
    w = _linefit(PriorSpec({"m": Gaussian(2.0, 1.0),
                            "b": Gaussian(1.0, 2.0)}), n_steps=2000)
    r = w.prior_sensitivity()
    assert set(r.prior) == {"m", "b"}
    assert set(r.diagnosis.values()) <= {
        "robust", "prior-data conflict", "strong prior / weak likelihood"}


def test_prior_sensitivity_plot(tmp_path):
    import os

    from lisp_mcmc_tpu import plotting

    w = _linefit(PriorSpec({"m": Gaussian(0.0, 0.15),
                            "b": Gaussian(1.0, 2.0)}), n_steps=3000)
    r = prior_sensitivity(w)
    path = str(tmp_path / "sens.png")
    plotting.prior_sensitivity_plot(r, filename=path)
    assert os.path.getsize(path) > 0


def test_expression_sensitivity():
    """Derived quantities join the audit: an expression of a conflicted
    parameter inherits its sensitivity and diagnosis."""
    w = _linefit(PriorSpec({"m": Gaussian(0.0, 0.15),
                            "b": Gaussian(1.0, 2.0)}))
    r = prior_sensitivity(w, expressions=["(/ 1 :m)"])
    assert "(/ 1 :m)" in r.prior and "(/ 1 :m)" in r.diagnosis
    assert r.diagnosis["(/ 1 :m)"] == "prior-data conflict"
    # parameter entries unchanged by the extra columns
    assert r.diagnosis["m"] == "prior-data conflict"


def test_multi_term_installed_prior_scaling():
    """A shared prior on a T-term global fit is INSTALLED once per term
    (reference log_post semantics), so the sampled measure is prior^T —
    the default sensitivity must scale the installed total, not the
    declared spec once (review round 3: the single-count path
    under-perturbed by T and could read a real conflict as robust)."""
    rng = np.random.default_rng(1)
    x = np.linspace(0, 10, 40)
    y1 = 2.0 * x + 1.0 + rng.normal(0, 0.5, 40)
    y2 = 2.0 * x - 3.0 + rng.normal(0, 0.5, 40)

    def f1(xx, p):
        return p["b1"] + p["m"] * xx

    def f2(xx, p):
        return p["b2"] + p["m"] * xx

    spec = PriorSpec({"m": Gaussian(0.0, 0.15), "b1": Gaussian(1.0, 3.0),
                      "b2": Gaussian(-3.0, 3.0)})
    w = mfit.walker_create(function=[f1, f2], data=[(x, y1), (x, y2)],
                           params={"m": 1.5, "b1": 0.0, "b2": 0.0},
                           data_error=[0.5, 0.5], n_walkers=64, seed=2,
                           walker_jitter=0.05, log_prior=spec)
    w.adaptive_steps(6000, auto=None)
    w.burn_steps(len(w) // 2)
    s_inst = prior_sensitivity(w)               # installed: prior^2
    s_decl = prior_sensitivity(w, prior=spec)   # declared: single count
    assert s_inst.diagnosis["m"] == "prior-data conflict"
    # in the linear-perturbation regime the installed path reads ~T x
    assert s_inst.prior["m"] > 1.4 * s_decl.prior["m"]
