"""HierarchicalFit: partial pooling across datasets, non-centered.

Anchors:
  - decode algebra is exact (theta = mu + tau * z on pooled columns,
    identity elsewhere);
  - a conjugate normal-normal hierarchy with (sigma, tau) effectively
    known has a CLOSED-FORM joint Gaussian posterior over
    (mu, theta_1..S) — the fit must land on every dataset's own exact
    posterior mean (datasets are made different enough that index
    mix-ups fail hard);
  - the same model's marginal likelihood is a closed-form multivariate
    normal density — the nested-sampling evidence (through the
    auto-recovered PriorSpec, since the non-centered prior is a product
    of independent 1-D dists) must match it;
  - pooling SHRINKS: with weak per-dataset data, hierarchical estimates
    sit closer to the population mean than the per-dataset MLEs;
  - the per-dataset predictive toolchain (waic/loo/ppc) runs on
    natural-space dataset views.
"""

import math

import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.priors import Gaussian, LogNormal, Uniform

# ----------------------------------------------------------------- model


def const_model(x, p):
    return p["c"] + 0.0 * x


# Conjugate setting: y_si ~ N(theta_s, SIGMA^2), theta_s ~ N(mu, TAU^2),
# mu ~ N(M0, S0^2); tau pinned by a near-delta LogNormal prior.
SIGMA, TAU, M0, S0 = 0.4, 0.8, 1.0, 2.0
N_PTS = 8
# Deliberately spread per-dataset sample means (index mix-ups fail hard).
YBAR = np.asarray([0.2, 1.1, 2.4, -0.6])
S = len(YBAR)


def _datasets():
    """Datasets engineered so each sample mean is EXACTLY YBAR[s]."""
    x = np.linspace(0.0, 1.0, N_PTS)
    out = []
    rng = np.random.default_rng(7)
    for s in range(S):
        e = rng.standard_normal(N_PTS) * SIGMA
        e -= e.mean()                       # exact sample mean
        out.append((x, YBAR[s] + e))
    return out


def _exact_posterior():
    """Closed-form joint Gaussian over (mu, theta_1..S) given tau=TAU."""
    d = S + 1
    prec = np.zeros((d, d))
    b = np.zeros(d)
    prec[0, 0] = S / TAU**2 + 1.0 / S0**2
    b[0] = M0 / S0**2
    for s in range(S):
        i = 1 + s
        prec[i, i] = N_PTS / SIGMA**2 + 1.0 / TAU**2
        prec[0, i] = prec[i, 0] = -1.0 / TAU**2
        b[i] = N_PTS * YBAR[s] / SIGMA**2
    cov = np.linalg.inv(prec)
    return cov @ b, cov                     # mean (mu, theta...), cov


def _exact_log_evidence():
    """Marginal likelihood: y ~ N(M0*1, SIGMA^2 I + TAU^2 bdiag(J) +
    S0^2 J_full) — closed form for the tau-pinned hierarchy."""
    from scipy.stats import multivariate_normal

    ys = np.concatenate([y for _, y in _datasets()])
    n = S * N_PTS
    cov = SIGMA**2 * np.eye(n) + S0**2 * np.ones((n, n))
    for s in range(S):
        sl = slice(s * N_PTS, (s + 1) * N_PTS)
        cov[sl, sl] += TAU**2 * np.ones((N_PTS, N_PTS))
    return float(multivariate_normal(mean=np.full(n, M0), cov=cov,
                                     allow_singular=False).logpdf(ys))


@pytest.fixture(scope="module")
def conjugate_fit():
    fit = mfit.HierarchicalFit(
        const_model, _datasets(), {"c": 0.5}, data_error=SIGMA,
        hyper={"c": (Gaussian(M0, S0), LogNormal(math.log(TAU), 0.01))},
        n_walkers=96, seed=0,
        config=mfit.FitConfig(kernel="chees"))
    fit.adaptive_steps(6000, auto=None)
    fit.burn_steps(4000)
    return fit


# ------------------------------------------------------------------ tests


def test_decode_exact():
    rng = np.random.default_rng(0)
    x = np.linspace(0, 1, 5)
    ds = [(x, rng.standard_normal(5)) for _ in range(3)]
    fit = mfit.HierarchicalFit(
        lambda x, p: p["a"] * x + p["b"], ds, {"a": 1.0, "b": 0.0},
        data_error=1.0, pooled=["a"],
        hyper={"a": (Gaussian(0, 5), LogNormal(0.0, 1.0))},
        local_priors={"b": Gaussian(0, 5)}, n_walkers=8, seed=0)
    # layout: a__mu, a__tau, then (a__z{s}, b__{s}) per dataset
    assert fit.spec.keys[:2] == ("a__mu", "a__tau")
    assert fit.spec.keys[2:4] == ("a__z0", "b__0")
    theta = rng.standard_normal(fit.spec.ndim)
    nat = fit.decode_params(theta)
    mu, tau = theta[0], theta[1]
    for s in range(3):
        assert nat[s, 0] == pytest.approx(mu + tau * theta[2 + 2 * s],
                                          rel=1e-12)
        assert nat[s, 1] == pytest.approx(theta[3 + 2 * s], rel=1e-12)
    # batched decode keeps leading dims
    block = rng.standard_normal((4, 2, fit.spec.ndim))
    nb = fit.decode_params(block)
    assert nb.shape == (4, 2, 3, 2)
    assert nb[1, 1, 2, 0] == pytest.approx(
        block[1, 1, 0] + block[1, 1, 1] * block[1, 1, 2 + 2 * 2], rel=1e-12)


def test_validation():
    x = np.linspace(0, 1, 4)
    ds2 = [(x, x), (x, 2 * x)]
    line = lambda x, p: p["a"] * x + p["b"]   # noqa: E731
    with pytest.raises(ValueError, match=">= 2 datasets"):
        mfit.HierarchicalFit(line, [(x, x)], {"a": 1.0, "b": 0.0})
    with pytest.raises(ValueError, match="not in params"):
        mfit.HierarchicalFit(line, ds2, {"a": 1.0, "b": 0.0},
                             pooled=["nope"])
    with pytest.raises(ValueError, match="pools nothing"):
        mfit.HierarchicalFit(line, ds2, {"a": 1.0, "b": 0.0}, pooled=[])
    with pytest.raises(ValueError, match="non-pooled names"):
        mfit.HierarchicalFit(line, ds2, {"a": 1.0, "b": 0.0}, pooled=["a"],
                             hyper={"b": (Gaussian(0, 1), LogNormal(0, 1))})
    with pytest.raises(ValueError, match="non-negative support"):
        mfit.HierarchicalFit(line, ds2, {"a": 1.0, "b": 0.0}, pooled=["a"],
                             hyper={"a": (Gaussian(0, 1), Gaussian(0, 1))})
    with pytest.raises(ValueError, match="only NON-pooled"):
        mfit.HierarchicalFit(line, ds2, {"a": 1.0, "b": 0.0}, pooled=["a"],
                             local_priors={"a": (0, 1)})
    with pytest.raises(ValueError, match="guesses for"):
        mfit.HierarchicalFit(line, ds2, [{"a": 1.0, "b": 0.0}] * 3)


def test_conjugate_posterior_anchor(conjugate_fit):
    """Decoded per-dataset means land on the exact joint-Gaussian
    posterior (tau pinned): each dataset on ITS OWN anchor."""
    mean, cov = _exact_posterior()
    sds = np.sqrt(np.diag(cov))
    got = conjugate_fit.params_per_dataset("median")
    hyp = conjugate_fit.hyper_params("median")
    assert hyp["mu"]["c"] == pytest.approx(mean[0], abs=4 * sds[0] / 3)
    assert hyp["tau"]["c"] == pytest.approx(TAU, rel=0.05)  # pinned
    for s in range(S):
        # MC tolerance: a third of the posterior sd is ~10x the MCSE of
        # the retained history but far tighter than the anchor spacing
        # (adjacent YBAR entries differ by >= 4 posterior sds).
        assert got[s]["c"] == pytest.approx(mean[1 + s], abs=sds[1 + s] / 3)
    # Posterior sd of theta_s (marginal) within 25%
    pos, _ = conjugate_fit._history(None)
    nat = conjugate_fit.decode_params(np.asarray(pos))  # (T, W, S, 1)
    emp_sd = np.std(nat[..., 0].reshape(-1, S), axis=0)
    assert np.allclose(emp_sd, sds[1:], rtol=0.25)


def test_conjugate_evidence_anchor(conjugate_fit):
    """Nested-sampling evidence through the auto-recovered PriorSpec
    matches the closed-form marginal likelihood."""
    exact = _exact_log_evidence()
    ns = conjugate_fit.nested_sample(n_live=256, seed=0)
    assert ns.log_z == pytest.approx(exact, abs=max(5 * ns.log_z_err, 0.8))
    # Laplace cross-check (smooth unimodal posterior in walk space is
    # near-Gaussian except the pinned-tau direction, which is itself
    # Gaussian in log space — expect agreement within ~1 nat).
    conjugate_fit.optimize(400)
    lap = conjugate_fit.laplace_approx()
    assert lap.log_z == pytest.approx(exact, abs=1.5)


def test_pooling_shrinks():
    """Weak data: hierarchical per-dataset estimates shrink toward the
    population mean relative to the per-dataset MLEs (sample means)."""
    mean, _ = _exact_posterior()
    shrunk = np.abs(mean[1:] - mean[0])
    raw = np.abs(YBAR - mean[0])
    # closed form sanity: every theta_s strictly between ybar_s and mu
    assert np.all(shrunk < raw)
    # and the FIT reproduces that ordering
    fit = mfit.HierarchicalFit(
        const_model, _datasets(), {"c": 0.5}, data_error=SIGMA,
        hyper={"c": (Gaussian(M0, S0), LogNormal(math.log(TAU), 0.01))},
        n_walkers=64, seed=1, config=mfit.FitConfig(kernel="chees"))
    fit.adaptive_steps(4000, auto=None)
    fit.burn_steps(2500)
    got = np.asarray([p["c"] for p in fit.params_per_dataset("median")])
    mu_hat = fit.hyper_params("median")["mu"]["c"]
    assert np.all(np.abs(got - mu_hat) < np.abs(YBAR - mu_hat))


def test_dataset_view_toolchain(conjugate_fit):
    """waic/loo/ppc run per dataset on decoded natural-space views."""
    from lisp_mcmc_tpu import diagnostics

    v = conjugate_fit.dataset_view(2)
    assert tuple(v.spec.keys) == ("c",)
    w = diagnostics.waic(v)
    assert np.isfinite(w.elpd) and w.p_waic > 0
    res = conjugate_fit.waic_per_dataset(max_samples=128)
    assert len(res) == S
    ppc = conjugate_fit.posterior_predictive_per_dataset(max_samples=64)
    assert len(ppc) == S and ppc[1].y_rep.shape[-1] == N_PTS
    loo = conjugate_fit.loo_per_dataset(max_samples=128)
    assert len(loo) == S and np.isfinite(loo[0].elpd)
    # best params of a view = that dataset's decoded block
    p2 = v.most_likely_params()
    assert abs(p2["c"] - YBAR[2]) < 0.5
    with pytest.raises(IndexError):
        conjugate_fit.dataset_view(S)


def test_incomplete_prior_no_evidence():
    """Flat non-pooled locals: MCMC works, evidence layer sees no spec."""
    rng = np.random.default_rng(3)
    x = np.linspace(0, 1, 10)
    ds = [(x, 2 * x + rng.standard_normal(10) * 0.3) for _ in range(2)]
    fit = mfit.HierarchicalFit(
        lambda x, p: p["a"] * x + p["b"], ds, {"a": 1.0, "b": 0.0},
        data_error=0.3, pooled=["a"],
        hyper={"a": (Gaussian(0, 5), LogNormal(0.0, 0.5))},
        n_walkers=32, seed=0)                 # no local_priors for b
    assert fit.prior_spec is None
    fit.adaptive_steps(300, auto=None)
    assert np.isfinite(fit.most_likely_step()[0])
    with pytest.raises(ValueError):
        fit.nested_sample(n_live=64, max_iter=10)


def test_robust_likelihood_rides():
    """A factory likelihood (student-t) flows through the pooled path."""
    from lisp_mcmc_tpu.likelihoods import make_student_t_likelihood

    rng = np.random.default_rng(5)
    x = np.linspace(0, 1, 16)
    thetas = [1.8, 2.2, 2.0]
    ds = []
    for t in thetas:
        y = t * x + 0.15 * rng.standard_normal(16)
        y[3] += 3.0                            # outlier per dataset
        ds.append((x, y))
    fit = mfit.HierarchicalFit(
        lambda x, p: p["a"] * x, ds, {"a": 1.0}, data_error=0.15,
        log_likelihood=make_student_t_likelihood(4.0),
        hyper={"a": (Gaussian(2.0, 2.0), LogNormal(math.log(0.3), 0.5))},
        n_walkers=48, seed=0, config=mfit.FitConfig(kernel="chees"))
    fit.adaptive_steps(3000, auto=None)
    fit.burn_steps(2000)
    got = [p["a"] for p in fit.params_per_dataset("median")]
    assert np.allclose(got, thetas, atol=0.35)   # outliers downweighted


def test_checkpoint_roundtrip(conjugate_fit, tmp_path):
    """hierarchical_save/load: structure rebuilds from recipes, chain
    state restores exactly, and the loaded fit is resumable."""
    p = str(tmp_path / "hier.npz")
    mfit.hierarchical_save(conjugate_fit, p)
    # const_model is not in the registry -> recommendations + None
    assert mfit.hierarchical_load(p, quiet=True) is None
    fit2 = mfit.hierarchical_load(p, function=const_model)
    assert fit2 is not None
    assert fit2.spec.keys == conjugate_fit.spec.keys
    assert fit2.pooled == conjugate_fit.pooled
    assert fit2.prior_spec == conjugate_fit.prior_spec
    np.testing.assert_array_equal(np.asarray(fit2.state.position),
                                  np.asarray(conjugate_fit.state.position))
    np.testing.assert_array_equal(np.asarray(fit2.state.best_logprob),
                                  np.asarray(conjugate_fit.state.best_logprob))
    a = conjugate_fit.params_per_dataset("median")
    b = fit2.params_per_dataset("median")
    for s in range(S):
        assert b[s]["c"] == pytest.approx(a[s]["c"], rel=1e-12)
    # wrong-kind guard
    with pytest.raises(ValueError, match="not a hierarchical checkpoint"):
        x = np.linspace(0, 1, 8)
        w = mfit.walker_create(function=lambda x, p: p["a"] * x,
                               data=(x, x), params={"a": 1.0},
                               data_error=0.5, n_walkers=8, seed=0)
        q = str(tmp_path / "plain.npz")
        mfit.walker_save(w, q)
        mfit.hierarchical_load(q)
    # resumable: a short continuation runs on the restored state
    fit2.adaptive_steps(120, auto=None)
    assert np.isfinite(fit2.most_likely_step()[0])


def test_expressions_per_dataset():
    """Derived quantities evaluate at each dataset's decoded best."""
    rng = np.random.default_rng(2)
    x = np.linspace(0, 1, 6)
    ds = [(x, rng.standard_normal(6)) for _ in range(2)]
    fit = mfit.HierarchicalFit(
        lambda x, p: p["a"] * x + p["b"], ds, {"a": 2.0, "b": 0.5},
        pooled=["a"], data_error=1.0,
        hyper={"a": (Gaussian(2, 2), LogNormal(0.0, 0.5))},
        local_priors={"b": Gaussian(0, 2)}, n_walkers=8, seed=0)
    vals = fit.expressions_per_dataset("(/ :a :b)")
    best = fit.params_per_dataset("best")
    for s in range(2):
        assert vals[s] == pytest.approx(best[s]["a"] / best[s]["b"],
                                        rel=1e-12)


def test_joint_pointwise_toolchain(conjugate_fit):
    """The WHOLE fit exposes pointwise likelihood through the decode
    hook: joint waic/loo/loo_pit/prior_sensitivity/audit run across all
    datasets' points (the pooled-vs-unpooled comparison axis), and
    refit-CV runs through the hierarchical _refit_cv hook (round 4) —
    exact K-fold elpd on the JOINT posterior, consistent with loo's."""
    from lisp_mcmc_tpu import diagnostics

    w = diagnostics.waic(conjugate_fit, max_samples=256)
    assert np.isfinite(w.elpd)
    # Partial pooling: effective params well below the raw S+1 count
    # but above 1 (some per-dataset freedom survives).
    assert 1.0 < w.p_waic < S + 2
    lo = diagnostics.loo(conjugate_fit, max_samples=256)
    assert abs(lo.elpd - w.elpd) < 3 * max(w.se, 1e-9)
    pit = diagnostics.loo_pit(conjugate_fit, max_samples=256)
    assert pit.n_points == S * N_PTS
    assert pit.p_value > 0.01          # the model IS well-specified
    ps = diagnostics.prior_sensitivity(conjugate_fit, max_samples=256)
    assert "c__tau" in ps.diagnosis and "c__z0" in ps.diagnosis
    rep = diagnostics.audit(conjugate_fit, max_samples=256)
    assert rep.skipped == {}
    # Refit-CV on the JOINT posterior (r3 refused this; r4 dispatches
    # through HierarchicalFit._refit_cv — exact elpd, no importance
    # sampling left to diagnose).  On this well-specified conjugate
    # model the exact K-fold elpd must agree with PSIS-LOO's.
    kf = diagnostics.kfold(conjugate_fit, 4, n_steps=600,
                           walkers_per_dataset=16)
    assert np.isfinite(kf.elpd)
    assert kf.elpd == pytest.approx(lo.elpd, abs=3 * max(lo.se, 1.0))


def test_sharded_matches_unsharded():
    """Chain-axis DP on a hierarchical fit is bitwise-identical to the
    single-device run (C23 composition: custom posterior + mesh)."""
    from lisp_mcmc_tpu.parallel import make_mesh

    rng = np.random.default_rng(4)
    x = np.linspace(0, 1, 10)
    ds = [(x, (1.5 + 0.1 * s) * x + 0.8 + 0.1 * rng.standard_normal(10))
          for s in range(3)]

    def make():
        return mfit.HierarchicalFit(
            lambda x, p: p["a"] * x + p["b"], ds, {"a": 1.5, "b": 0.8},
            pooled=["a"], data_error=0.1,
            hyper={"a": (Gaussian(1.5, 1.0), LogNormal(np.log(0.2), 0.5))},
            local_priors={"b": Gaussian(0.8, 1.0)}, n_walkers=64, seed=0)

    w1 = make()
    w1.adaptive_steps(400, auto=None)
    w2 = make()
    w2.shard(make_mesh())
    w2.adaptive_steps(400, auto=None)
    np.testing.assert_array_equal(np.asarray(w1.state.position),
                                  np.asarray(w2.state.position))
    np.testing.assert_array_equal(np.asarray(w1.state.logprob),
                                  np.asarray(w2.state.logprob))


def test_view_guards_and_prior_predictive(conjugate_fit, tmp_path):
    """Review-pass pins: views refuse refit-CV and prior-side power-
    scaling (instead of silently analyzing the WRONG model), walker_save
    redirects to hierarchical_save, single-block decode matches the full
    decode, and prior_predictive returns per-dataset draws from the
    complete declared prior."""
    from lisp_mcmc_tpu import diagnostics

    v = conjugate_fit.dataset_view(1)
    with pytest.raises(ValueError, match="cannot be refit"):
        diagnostics.kfold(v, 3)
    with pytest.raises(ValueError, match="flat stand-in"):
        diagnostics.prior_sensitivity(v)
    rep = diagnostics.audit(v, max_samples=64)
    assert "prior_sensitivity" in rep.skipped
    assert "loo_pit" not in rep.skipped
    with pytest.raises(ValueError, match="hierarchical_save"):
        mfit.walker_save(conjugate_fit, str(tmp_path / "w.npz"))
    pos, _ = conjugate_fit._history(None)
    full = conjugate_fit._decode_np(np.asarray(pos))
    np.testing.assert_array_equal(
        full[..., 2, :],
        conjugate_fit._decode_np_one(np.asarray(pos), 2))
    draws = conjugate_fit.prior_predictive(n_samples=32, seed=0)
    assert len(draws) == S and draws[0].y_rep.shape == (32, N_PTS)
    assert np.all(np.isfinite(draws[2].y_rep))
    # prior draws must be WIDER than the posterior's predictive spread
    post = conjugate_fit.posterior_predictive_per_dataset(max_samples=32)
    assert draws[0].y_rep.std() > 2 * post[0].y_rep.std()


def test_forest_plot(conjugate_fit, tmp_path):
    """Forest plot: per-dataset intervals render for hierarchical
    (population band on pooled params) and batched fits; misuse raises."""
    import matplotlib

    matplotlib.use("Agg")
    from lisp_mcmc_tpu import plotting

    p1 = tmp_path / "forest.png"
    plotting.forest_plot(conjugate_fit, "c", filename=str(p1))
    assert p1.stat().st_size > 5000
    with pytest.raises(ValueError, match="ci must be"):
        plotting.forest_plot(conjugate_fit, "c", ci=0.0)
    x = np.linspace(0, 1, 6)
    w = mfit.walker_create(function=lambda x, p: p["a"] * x, data=(x, x),
                           params={"a": 1.0}, data_error=0.5,
                           n_walkers=8, seed=0)
    with pytest.raises(ValueError, match="BatchedFit or HierarchicalFit"):
        plotting.forest_plot(w, "a")


def test_predict_new_closed_form(conjugate_fit):
    """Population predictive for an UNSEEN dataset: in the tau-pinned
    conjugate hierarchy theta_new | y ~ N(E[mu|y], Var(mu|y) + TAU^2)
    exactly — predict_new's draws must land on both moments, and the
    population_mean=True band must collapse to the mu posterior alone."""
    mean, cov = _exact_posterior()
    x = np.linspace(0.0, 1.0, 5)
    pred = conjugate_fit.predict_new(x, max_samples=4096, seed=1)
    # const model: every grid column is the same theta_new draw
    assert pred.mu.shape[1] == 5
    np.testing.assert_allclose(
        pred.mu, np.broadcast_to(pred.mu[:, :1], pred.mu.shape))
    draws = pred.mu[:, 0]
    assert draws.mean() == pytest.approx(mean[0], abs=0.15)
    assert draws.var() == pytest.approx(cov[0, 0] + TAU**2, rel=0.35)
    # population-typical curve: z pinned at 0 -> just the mu posterior
    pm = conjugate_fit.predict_new(x, max_samples=4096, seed=1,
                                   population_mean=True)
    assert pm.mu[:, 0].mean() == pytest.approx(mean[0], abs=0.15)
    assert pm.mu[:, 0].var() < 0.5 * draws.var()
    # observation noise widens the band into a prediction interval
    pn = conjugate_fit.predict_new(x, noise=SIGMA, max_samples=512, seed=2)
    assert pn.y_rep is not None
    assert pn.y_rep.var() > pn.mu.var()


def test_predict_new_validation():
    rng = np.random.default_rng(0)
    x = np.linspace(0, 1, 5)
    ds = [(x, 0.5 * x + rng.standard_normal(5)) for _ in range(3)]
    line = lambda x, p: p["a"] * x + p["b"]   # noqa: E731
    fit = mfit.HierarchicalFit(
        line, ds, {"a": 1.0, "b": 0.0}, data_error=1.0, pooled=["a"],
        hyper={"a": (Gaussian(0, 5), LogNormal(0.0, 1.0))},
        n_walkers=8, seed=0)
    # non-pooled local with neither a prior nor a pinned value refuses
    # (even pre-history: steps() falls back to the live ensemble)
    with pytest.raises(ValueError, match="no population to draw"):
        fit.predict_new(x)
    fit.adaptive_steps(200, auto=None)
    pred = fit.predict_new(x, fixed={"b": 0.3}, max_samples=64)
    assert pred.mu.shape[1] == 5 and np.all(np.isfinite(pred.mu))
    with pytest.raises(ValueError, match="not non-pooled"):
        fit.predict_new(x, fixed={"a": 1.0})
    # a declared local prior supplies the new group's non-pooled draw
    fit2 = mfit.HierarchicalFit(
        line, ds, {"a": 1.0, "b": 0.0}, data_error=1.0, pooled=["a"],
        hyper={"a": (Gaussian(0, 5), LogNormal(0.0, 1.0))},
        local_priors={"b": Gaussian(0.0, 5.0)}, n_walkers=8, seed=0)
    fit2.adaptive_steps(200, auto=None)
    p2 = fit2.predict_new(x, max_samples=64)
    assert p2.mu.shape[1] == 5 and np.all(np.isfinite(p2.mu))


def _exact_logo():
    """Closed-form log p(y_s | y_{-s}) in the tau-pinned hierarchy:
    mu | y_rest is conjugate through the sufficient ybar_t (each rest
    dataset informs mu with variance TAU^2 + SIGMA^2/N), and a new
    group's data is then jointly Gaussian:
    y_s | y_rest ~ N(E[mu|rest]*1, SIGMA^2 I + (Var(mu|rest)+TAU^2) J)."""
    from scipy.stats import multivariate_normal

    v_t = TAU**2 + SIGMA**2 / N_PTS
    dss = _datasets()
    out = []
    for s in range(S):
        rest = [t for t in range(S) if t != s]
        prec = 1.0 / S0**2 + len(rest) / v_t
        mean = (M0 / S0**2 + sum(YBAR[t] for t in rest) / v_t) / prec
        v_theta = 1.0 / prec + TAU**2
        cov = SIGMA**2 * np.eye(N_PTS) + v_theta * np.ones((N_PTS, N_PTS))
        out.append(multivariate_normal(
            mean * np.ones(N_PTS), cov).logpdf(dss[s][1]))
    return np.asarray(out)


def test_logo_closed_form(conjugate_fit):
    """Leave-one-group-out CV must land on the exact new-group
    predictive density of the conjugate hierarchy, per dataset."""
    res = conjugate_fit.logo(n_steps=4000, walkers_per_dataset=64,
                             max_samples=128, n_z=64, seed=0)
    exact = _exact_logo()
    assert res.elpd_per_dataset.shape == (S,)
    np.testing.assert_allclose(res.elpd_per_dataset, exact, atol=0.6)
    assert res.elpd == pytest.approx(float(exact.sum()), abs=1.2)
    assert res.se > 0.0
    assert "elpd" in repr(res)


def test_logo_requires_complete_prior():
    rng = np.random.default_rng(0)
    x = np.linspace(0, 1, 5)
    ds = [(x, 0.5 * x + rng.standard_normal(5)) for _ in range(3)]
    fit = mfit.HierarchicalFit(
        lambda x, p: p["a"] * x + p["b"], ds, {"a": 1.0, "b": 0.0},
        data_error=1.0, pooled=["a"],
        hyper={"a": (Gaussian(0, 5), LogNormal(0.0, 1.0))},
        n_walkers=8, seed=0)
    with pytest.raises(ValueError, match="local_priors"):
        fit.logo(n_steps=200)


def test_logo_flags_alien_group():
    """Negative control: a dataset NOT from the population must score a
    far lower logo elpd than the members (the dataset-level outlier
    detector predict_new/logo exist to provide)."""
    rng = np.random.default_rng(3)
    x = np.linspace(0.0, 1.0, 10)
    sig = 0.05
    slopes = [0.95, 1.05, 1.0, 0.9, 2.6]       # last one is alien
    ds = [(x, m * x + 0.4 + sig * rng.standard_normal(10)) for m in slopes]
    fit = mfit.HierarchicalFit(
        lambda x, p: p["a"] * x + p["b"], ds, {"a": 1.0, "b": 0.4},
        data_error=sig, pooled=["a"],
        hyper={"a": (Gaussian(1.0, 1.0), LogNormal(np.log(0.15), 0.7))},
        local_priors={"b": Gaussian(0.4, 0.5)}, n_walkers=64, seed=0)
    fit.adaptive_steps(5000, auto=None)
    fit.burn_steps(3000)
    res = fit.logo(n_steps=3000, walkers_per_dataset=48, max_samples=96,
                   n_z=24, seed=0)
    members = res.elpd_per_dataset[:4]
    alien = res.elpd_per_dataset[4]
    assert np.all(np.isfinite(res.elpd_per_dataset))
    # the alien group sits many nats below every population member
    assert alien < members.min() - 10.0, res.elpd_per_dataset
