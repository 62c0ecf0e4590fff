"""Hierarchical SBC (round 4, verdict item #2).

``sbc_check_hierarchical`` calibrates the PARTIAL-POOLING pipeline end
to end: walk-space truths from the declared prior (hypers from
``hyper``, z ~ N(0,1), non-pooled locals from ``local_priors``),
decode, simulate S datasets per truth via the likelihood's generative
twin, refit all n_sims joint posteriors as ONE grouped ensemble
(``HierarchicalFit._grouped_joint_walker``), rank every walk
coordinate.  The repo's own calibration standard (tests/test_sbc.py):
a well-specified positive control passes AND a pinned negative control
fails — partial pooling is the model class where miscalibration hides
best (tau posteriors concentrating near boundaries), so both matter.
"""

import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.priors import Gaussian, LogNormal


def const_model(x, p):
    return p["c"] + 0.0 * x


X = np.linspace(0.0, 1.0, 8)
HYPER = {"c": (Gaussian(0.0, 1.0), LogNormal(np.log(0.5), 0.4))}
KW = dict(data_error=0.5, hyper=HYPER, n_sims=40, walkers_per_sim=24,
          n_steps=3000, sampling_steps=3000, sampling_kernel="mala",
          seed=0)


def test_hier_sbc_well_specified_passes():
    """Normal-normal grid, simulator == likelihood == declared prior:
    every walk coordinate's ranks are uniform (mu, tau AND each z —
    tau uniformity is the funnel-calibration check nothing else in the
    toolchain provides)."""
    res = mfit.sbc_check_hierarchical(const_model, X, {"c": 0.0}, 4, **KW)
    assert res.ok()
    assert set(res.keys) == {"c__mu", "c__tau", "c__z0", "c__z1",
                             "c__z2", "c__z3"}
    assert res.ranks.shape == (40, 6)
    # ranks span the support (a stuck sampler would pin them)
    assert res.ranks.min() < 10 and res.ranks.max() > 53


def test_hier_sbc_negative_control_fails():
    """Cauchy noise simulated, Gaussian likelihood declared: the audit
    must FAIL, with the damage concentrated in the pooling coordinates
    (tau/z) — measured p ~ 1e-14 at these settings."""

    def cauchy_sim(rng, mu):
        return mu + 0.5 * rng.standard_t(1, size=mu.shape)

    res = mfit.sbc_check_hierarchical(const_model, X, {"c": 0.0}, 4,
                                      simulate=cauchy_sim, **KW)
    assert not res.ok()
    assert res.p_values["c__tau"] < 1e-6


def test_hier_sbc_requires_complete_prior():
    """A non-pooled local without a declared prior has no measure to
    draw truths from — refuse loudly."""

    def line2(x, p):
        return p["c"] + p["b"] * x

    with pytest.raises(ValueError, match="local_priors"):
        mfit.sbc_check_hierarchical(
            line2, X, {"c": 0.0, "b": 1.0}, 3, data_error=0.5,
            hyper=HYPER, pooled=["c"], n_sims=10)


def test_hier_sbc_poisson_pipeline():
    """Non-Gaussian partial pooling calibrates end to end: the Poisson
    reduction drives BOTH the joint fit (HierarchicalFit's
    custom-likelihood path) and the count simulator — the same
    never-guessed pairing sbc_check uses (measured worst-p 0.115 at
    these settings)."""
    hyper = {"c": (Gaussian(10.0, 2.0), LogNormal(np.log(0.5), 0.3))}
    res = mfit.sbc_check_hierarchical(
        const_model, X, {"c": 10.0}, 4, hyper=hyper,
        log_likelihood=mfit.log_likelihood_poisson,
        n_sims=40, walkers_per_sim=24, n_steps=3000,
        sampling_steps=3000, sampling_kernel="mala", seed=0)
    assert res.ok()


def test_hier_sbc_with_non_pooled_locals():
    """A pooled/non-pooled mix: truths draw from the complete prior
    (hyper + z + declared locals), the walk keys carry both layouts,
    and the audit passes (seed-fixed; worst p ~ 0.006 on one z at these
    budgets, comfortably above the Bonferroni bar)."""

    def line2(x, p):
        return p["c"] + p["b"] * x

    res = mfit.sbc_check_hierarchical(
        line2, X, {"c": 0.0, "b": 1.0}, 3, data_error=0.5,
        hyper={"c": (Gaussian(0.0, 1.0), LogNormal(np.log(0.5), 0.4))},
        pooled=["c"], local_priors={"b": Gaussian(1.0, 0.5)},
        n_sims=40, walkers_per_sim=24, n_steps=3000,
        sampling_steps=3000, sampling_kernel="mala", seed=0)
    assert res.ok()
    assert "b__0" in res.p_values and "c__z0" in res.p_values


def line_ab(x, p):
    return p["a"] + p["b"] * x


CORR_HYPER = {"a": (Gaussian(0.0, 1.0), LogNormal(np.log(0.5), 0.4)),
              "b": (Gaussian(0.0, 1.0), LogNormal(np.log(0.5), 0.4))}
CORR_KW = dict(data_error=0.5, hyper=CORR_HYPER, n_sims=40,
               walkers_per_sim=24, n_steps=3000, sampling_steps=3000,
               sampling_kernel="mala", seed=0,
               correlation="full", corr_prior=Gaussian(0.0, 0.5))


def test_hier_sbc_correlated_population_passes():
    """correlation="full" (VERDICT r4 #1): the slant coordinate rides
    the same walk-space SBC — its ranks (and every mu/tau/z) are
    uniform when simulator == likelihood == declared prior.  This is
    the calibration certificate that the correlated decode, its prior,
    and the simulator agree end to end."""
    res = mfit.sbc_check_hierarchical(line_ab, X, {"a": 0.0, "b": 0.0}, 3,
                                      **CORR_KW)
    assert "b__c_a" in res.keys
    assert res.ranks.shape == (40, 4 + 1 + 2 * 3)
    assert res.ok()
    # the slant coordinate specifically is uniform
    assert res.p_values["b__c_a"] > 0.01


def test_hier_sbc_correlated_negative_control_fails():
    """Power check for the correlated pipeline: Cauchy noise simulated
    against the declared Gaussian likelihood must FAIL the audit (the
    same pinned control as the diagonal tier)."""

    def cauchy_sim(rng, mu):
        return mu + 0.5 * rng.standard_t(1, size=mu.shape)

    res = mfit.sbc_check_hierarchical(line_ab, X, {"a": 0.0, "b": 0.0}, 3,
                                      simulate=cauchy_sim, **CORR_KW)
    assert not res.ok()
