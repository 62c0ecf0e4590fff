"""Joint posterior predictive / PPC for multi-term GLOBAL fits.

VERDICT r2 missing #3: the test.lisp:58-70 workflow — several datasets
fitted jointly with shared parameters — must support the predictive
toolchain in ONE call: replicate every term, per-term and pooled
statistics, and grid predictions for every model.
"""

import numpy as np
import pytest

import lisp_mcmc_tpu as mfit

NOISE = 0.05


def _f1(x, p):
    return p["b1"] + p["m"] * x


def _f2(x, p):
    return p["b2"] + p["m"] * x


@pytest.fixture(scope="module")
def global_fit():
    """Two datasets sharing slope m, distinct intercepts (test.lisp:52-70)."""
    x = np.linspace(0.0, 10.0, 50)
    rng = np.random.default_rng(0)
    y1 = 2.0 * x + 1.0 + rng.normal(0, NOISE, 50)
    y2 = 2.0 * x - 3.0 + rng.normal(0, NOISE, 50)
    w = mfit.walker_create(
        function=[_f1, _f2], data=[(x, y1), (x, y2)],
        params={"m": 1.0, "b1": 0.0, "b2": 0.0},
        data_error=[NOISE, NOISE], n_walkers=64, seed=2, walker_jitter=0.05)
    w.adaptive_steps(6000, auto=None)
    # predictive checks need POSTERIOR history: drop the anneal phase
    # (reset clears history) and collect a cold sampling phase.
    w.reset_to_most_likely()
    w.sampling_steps(4000)
    return w


def test_joint_posterior_predictive_one_call(global_fit):
    draws = global_fit.posterior_predictive()
    assert len(draws) == 2 and [d.term_index for d in draws] == [0, 1]
    for d in draws:
        # each term replicated against ITS OWN data, from the SHARED
        # posterior: a calibrated fit covers ~90% of its points
        assert d.coverage() > 0.75, (d.term_index, d.coverage())
        assert d.y_rep.shape[1] == d.y_obs.shape[0] == 50


def test_joint_ppc_pooled_and_per_term(global_fit):
    # a roughness statistic (np.std is trend-dominated on a line)
    rough = lambda y: float(np.std(np.diff(y)))
    res = global_fit.ppc_pvalue(stat=rough)
    assert set(res["per_term"]) == {0, 1}
    assert 0.02 < res["p"] < 0.98, res
    for t, p in res["per_term"].items():
        assert 0.01 < p < 0.99, (t, res)


def test_predict_all_terms_one_call(global_fit):
    x_new = np.linspace(-2.0, 12.0, 17)
    preds = global_fit.predict(x_new, term_index=None)
    assert isinstance(preds, list) and len(preds) == 2
    # shared slope, per-term intercepts: the two curves differ by b1-b2=4
    m0, m1 = preds[0].mean(), preds[1].mean()
    assert np.allclose(m0 - m1, 4.0, atol=0.3)
    assert np.allclose(m0, 2.0 * x_new + 1.0, atol=0.3)
    # integer index keeps returning a single Prediction (old behavior)
    one = global_fit.predict(x_new, term_index=1)
    assert not isinstance(one, list)
    assert np.allclose(one.mu, preds[1].mu)


def test_predict_noise_band_per_term(global_fit):
    x_new = np.linspace(0.0, 10.0, 21)
    preds = global_fit.predict(x_new, term_index=None, noise=NOISE)
    for pr in preds:
        lo, hi = pr.band(0.05, 0.95)
        assert np.all(hi - lo > NOISE)      # prediction interval > curve CI


def test_ppc_plot_all_terms(global_fit, tmp_path):
    out = str(tmp_path / "ppc_all.png")
    global_fit.ppc_plot(term_index=None, filename=out)
    import os

    assert os.path.exists(out)
    # single-term call keeps working
    out1 = str(tmp_path / "ppc_one.png")
    global_fit.ppc_plot(term_index=1, filename=out1)
    assert os.path.exists(out1)


def test_global_fit_loo_pit_and_sensitivity(global_fit):
    """The round-3 calibration diagnostics span ALL terms of a global
    fit in one call (pointwise machinery loops walker.terms).

    ``take=`` restricts to the converged tail: this fixture's cold-start
    sampling phase carries real burn-in rows (the same "posterior
    history only" requirement waic/loo document), and loo_pit's
    pareto_k honestly flags them when included."""
    from lisp_mcmc_tpu.diagnostics import loo_pit, prior_sensitivity

    r = loo_pit(global_fit, take=1000)
    assert r.n_points == 100           # both 50-point terms, pooled
    assert r.ok                        # well-specified joint model

    # with the burn-in rows INCLUDED the verdict must not silently
    # pass — the importance-ratio tails blow up and pareto_k says so
    r_all = loo_pit(global_fit)
    assert r_all.n_bad_k > r.n_bad_k

    s = prior_sensitivity(
        global_fit, take=1000,
        prior={"m": (0.0, 5.0), "b1": (-5.0, 5.0), "b2": (-5.0, 5.0)})
    assert set(s.prior) == {"m", "b1", "b2"}
    assert all(v == 0.0 for v in s.prior.values())   # flat box
