"""Student-t (outlier-robust) and fitted-noise-scale likelihood factories.

Both ship per-point forms (WAIC/PSIS-LOO) and predictive samplers, so
the full predictive toolchain works: the t fit survives contamination
the Gaussian fit cannot, and the noise-scale fit closes the
understated-data_error failure mode the PPC/SBC negative controls
demonstrate.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.likelihoods import pointwise_log_likelihood
from lisp_mcmc_tpu.models import line


def _contaminated_line(seed=0, n=60, n_out=6):
    rng = np.random.default_rng(seed)
    x = np.linspace(0.0, 10.0, n)
    y = 2.0 * x + 1.0 + rng.normal(0, 0.1, n)
    idx = rng.choice(n, n_out, replace=False)
    y[idx] += rng.choice([-1, 1], n_out) * rng.uniform(2.0, 4.0, n_out)
    return x, y


def _fit(x, y, likelihood, n_steps=4000, **kw):
    w = mfit.walker_create(
        function=line, data=(x, y), params={"m": 1.5, "b": 0.5},
        data_error=0.1, log_likelihood=likelihood,
        n_walkers=32, seed=0, walker_jitter=0.05, **kw)
    w.adaptive_steps(n_steps, auto=None)
    return w


# ------------------------------------------------------------- student-t
def test_student_t_robust_to_outliers():
    """10% gross outliers: the Gaussian fit gets dragged, the t fit
    recovers the inlier line."""
    x, y = _contaminated_line()
    w_t = _fit(x, y, mfit.make_student_t_likelihood(nu=4.0))
    best_t = w_t.most_likely_params()
    assert best_t["m"] == pytest.approx(2.0, abs=0.03)
    assert best_t["b"] == pytest.approx(1.0, abs=0.15)

    w_g = _fit(x, y, None)
    err_t = abs(best_t["m"] - 2.0) + abs(best_t["b"] - 1.0)
    best_g = w_g.most_likely_params()
    err_g = abs(best_g["m"] - 2.0) + abs(best_g["b"] - 1.0)
    assert err_t < err_g


def test_student_t_pointwise_sums_to_reduction():
    x, y = _contaminated_line()
    lik = mfit.make_student_t_likelihood(nu=3.0)
    w = _fit(x, y, lik, n_steps=400)
    t = w.terms[0]
    params = {k: jnp.asarray(v) for k, v in w.most_likely_params().items()}
    total = float(lik(t.fn, params, t.dataset))
    pw = float(jnp.sum(pointwise_log_likelihood(lik, t.fn, params, t.dataset)))
    assert pw == pytest.approx(total, rel=1e-10)


def test_student_t_matches_gaussian_at_large_nu():
    """nu -> inf limit: the t reduction converges to the Gaussian one."""
    from lisp_mcmc_tpu.likelihoods import log_likelihood_normal

    x = np.linspace(0.0, 5.0, 40)
    y = 2.0 * x + 1.0 + np.random.default_rng(1).normal(0, 0.1, 40)
    lik = mfit.make_student_t_likelihood(nu=1e7)
    w = _fit(x, y, lik, n_steps=200)
    t = w.terms[0]
    params = {"m": jnp.asarray(2.0), "b": jnp.asarray(1.0)}
    lt = float(lik(t.fn, params, t.dataset))
    lg = float(log_likelihood_normal(t.fn, params, t.dataset))
    assert lt == pytest.approx(lg, abs=1e-3)


def test_student_t_loo_prefers_t_on_contaminated_data():
    """The predictive comparison agrees with the robustness story: on
    contaminated data PSIS-LOO scores the t model above the Gaussian."""
    from lisp_mcmc_tpu import diagnostics

    x, y = _contaminated_line(seed=2)
    w_t = _fit(x, y, mfit.make_student_t_likelihood(nu=4.0), n_steps=6000)
    w_g = _fit(x, y, None, n_steps=6000)
    for w in (w_t, w_g):
        w.burn_steps(len(w) // 2)
    r_t, r_g = diagnostics.loo(w_t), diagnostics.loo(w_g)
    cmp = diagnostics.loo_compare(r_t, r_g)
    assert cmp["elpd_diff"] > 0


def test_student_t_predictive_sampler_heavy_tails():
    x, y = _contaminated_line()
    w = _fit(x, y, mfit.make_student_t_likelihood(nu=3.0))
    w.burn_steps(len(w) // 2)
    (d,) = w.posterior_predictive(max_samples=256)
    z = (d.y_rep - d.mu) / 0.1
    # t3 kurtosis is heavy: z beyond 4 sigma must appear far more often
    # than the Gaussian's ~6e-5 rate.
    assert np.mean(np.abs(z) > 4.0) > 1e-3


# ----------------------------------------------------------- noise scale
def test_noise_scale_recovers_true_noise():
    """data_error=1 + fitted scale: k's posterior mode is the true
    noise level the user did not know."""
    rng = np.random.default_rng(3)
    x = np.linspace(0.0, 10.0, 80)
    true_noise = 0.3
    y = 2.0 * x + 1.0 + rng.normal(0, true_noise, 80)
    w = mfit.walker_create(
        function=line, data=(x, y),
        params={"m": 1.5, "b": 0.5, "noise_scale": 1.0},
        data_error=1.0,
        log_likelihood=mfit.make_noise_scale_likelihood(),
        log_prior=mfit.make_bounds_prior({"noise_scale": (1e-3, 1e3)}),
        n_walkers=32, seed=0, walker_jitter=0.05)
    w.adaptive_steps(6000, auto=None)
    best = w.most_likely_params()
    assert best["m"] == pytest.approx(2.0, abs=0.05)
    assert best["noise_scale"] == pytest.approx(true_noise, rel=0.2)
    # Predictive coverage reflects the FITTED noise (params-aware
    # sampler), not the placeholder data_error=1.
    w.burn_steps(len(w) // 2)
    (d,) = w.posterior_predictive(max_samples=256)
    assert d.coverage(0.05, 0.95) == pytest.approx(0.9, abs=0.1)
    spread = d.y_rep.std(axis=0).mean()
    assert spread == pytest.approx(true_noise, rel=0.35)


def test_noise_scale_pointwise_sums_to_reduction():
    lik = mfit.make_noise_scale_likelihood()
    x = np.linspace(0.0, 5.0, 30)
    y = 2.0 * x + 1.0
    w = mfit.walker_create(
        function=line, data=(x, y),
        params={"m": 2.0, "b": 1.0, "noise_scale": 0.7}, data_error=1.0,
        log_likelihood=lik, n_walkers=8, seed=0)
    t = w.terms[0]
    params = {"m": jnp.asarray(1.9), "b": jnp.asarray(1.2),
              "noise_scale": jnp.asarray(0.7)}
    total = float(lik(t.fn, params, t.dataset))
    pw = float(jnp.sum(pointwise_log_likelihood(lik, t.fn, params, t.dataset)))
    assert pw == pytest.approx(total, rel=1e-10)


def test_student_t_nu_validation():
    with pytest.raises(ValueError, match="nu"):
        mfit.make_student_t_likelihood(nu=0.0)


# ------------------------------------------------------------ x errors
def test_x_error_likelihood_fixes_regression_dilution():
    """Steep line with large x-noise: the standard likelihood biases the
    slope toward zero by ~1/(1 + sx^2/Var(x)) (regression dilution); the
    errors-in-variables likelihood (autodiff df/dx per point) recovers
    the true slope."""
    rng = np.random.default_rng(7)
    n = 200
    x_true = np.linspace(0.0, 10.0, n)
    sx = 1.0
    x_obs = x_true + rng.normal(0, sx, n)
    y = 5.0 * x_true + 1.0 + rng.normal(0, 0.5, n)
    dilution = 1.0 / (1.0 + sx**2 / np.var(x_true))     # ~0.89 here

    w_naive = _fit(x_obs, y, None, n_steps=4000)
    m_naive = w_naive.most_likely_params()["m"]
    assert m_naive == pytest.approx(5.0 * dilution, rel=0.05)
    assert m_naive < 4.7                                 # visibly diluted

    w_xe = mfit.walker_create(
        function=line, data=(x_obs, y), params={"m": 4.0, "b": 0.5},
        data_error=0.5, log_likelihood=mfit.make_x_error_likelihood(sx),
        n_walkers=32, seed=0, walker_jitter=0.05)
    w_xe.adaptive_steps(4000, auto=None)
    m_xe = w_xe.most_likely_params()["m"]
    assert m_xe == pytest.approx(5.0, rel=0.04)
    assert abs(m_xe - 5.0) < abs(m_naive - 5.0)


def test_x_error_pointwise_sums_to_reduction():
    lik = mfit.make_x_error_likelihood(0.3)
    x = np.linspace(0.0, 5.0, 30)
    w = mfit.walker_create(
        function=line, data=(x, 2.0 * x + 1.0),
        params={"m": 2.0, "b": 1.0}, data_error=0.2,
        log_likelihood=lik, n_walkers=8, seed=0)
    t = w.terms[0]
    import jax.numpy as jnp_
    params = {"m": jnp_.asarray(1.9), "b": jnp_.asarray(1.1)}
    total = float(lik(t.fn, params, t.dataset))
    pw = float(jnp_.sum(pointwise_log_likelihood(lik, t.fn, params,
                                                 t.dataset)))
    assert pw == pytest.approx(total, rel=1e-10)


def test_x_error_predictive_spread_tracks_slope():
    """The predictive sampler maps x-error through the local slope:
    replicates of a steep line spread wider than sigma_y alone."""
    rng = np.random.default_rng(8)
    x = np.linspace(0.0, 10.0, 60)
    y = 5.0 * x + 1.0 + rng.normal(0, 0.2, 60)
    w = mfit.walker_create(
        function=line, data=(x, y), params={"m": 4.5, "b": 0.5},
        data_error=0.2, log_likelihood=mfit.make_x_error_likelihood(0.5),
        n_walkers=16, seed=0, walker_jitter=0.02)
    w.adaptive_steps(2000, auto=None)
    w.burn_steps(len(w) // 2)
    (d,) = w.posterior_predictive(max_samples=128)
    spread = d.y_rep.std(axis=0).mean()
    # sigma_eff ~ sqrt(0.2^2 + (5*0.5)^2) ~ 2.5 >> 0.2
    assert spread > 1.5


def test_x_error_per_point_sigma_and_padding():
    """Per-point sigma_x with a non-lane-multiple dataset: the factory
    must align it to the padded length (review finding: broadcast crash
    unless N was a multiple of 128)."""
    n = 50                                     # pads to 128
    rng = np.random.default_rng(9)
    x = np.linspace(0.0, 10.0, n)
    y = 3.0 * x + 1.0 + rng.normal(0, 0.2, n)
    sx = np.full(n, 0.4)
    lik = mfit.make_x_error_likelihood(sx)
    w = mfit.walker_create(function=line, data=(x, y),
                           params={"m": 2.5, "b": 0.5}, data_error=0.2,
                           log_likelihood=lik, n_walkers=16, seed=0,
                           walker_jitter=0.05)
    w.adaptive_steps(1000, auto=None)
    assert np.isfinite(w.most_likely_step()[0])
    # Too-long sigma_x is a clear error.
    with pytest.raises(ValueError, match="entries"):
        bad = mfit.make_x_error_likelihood(np.full(500, 0.4))
        mfit.walker_create(function=line, data=(x, y),
                           params={"m": 2.5, "b": 0.5}, data_error=0.2,
                           log_likelihood=bad, n_walkers=4, seed=0)


def test_x_error_descending_x_replicates_finite():
    """Descending abscissae (spectra recorded high-to-low): the sampler
    must not clamp the signed spacing to 1e-300 and return infinite
    replicates (review finding)."""
    rng = np.random.default_rng(10)
    x = np.linspace(10.0, 0.0, 60)             # descending
    y = 5.0 * x + 1.0 + rng.normal(0, 0.2, 60)
    w = mfit.walker_create(
        function=line, data=(x, y), params={"m": 4.5, "b": 0.5},
        data_error=0.2, log_likelihood=mfit.make_x_error_likelihood(0.5),
        n_walkers=16, seed=0, walker_jitter=0.02)
    w.adaptive_steps(1500, auto=None)
    w.burn_steps(len(w) // 2)
    (d,) = w.posterior_predictive(max_samples=64)
    assert np.isfinite(d.y_rep).all()
    assert 1.5 < d.y_rep.std(axis=0).mean() < 5.0


def test_x_error_multicolumn_x_rejected():
    def plane(x, p):
        return p["a"] * x[..., 0] + p["b"] * x[..., 1]

    x1 = np.linspace(0, 1, 20)
    x2 = np.linspace(1, 2, 20)
    y = x1 + 2 * x2
    with pytest.raises(ValueError, match="multi-column"):
        mfit.walker_create(function=plane, data=(x1, x2, y),
                           params={"a": 1.0, "b": 1.0}, data_error=0.1,
                           log_likelihood=mfit.make_x_error_likelihood(0.1),
                           n_walkers=4, seed=0)
