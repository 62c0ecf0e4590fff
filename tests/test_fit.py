"""End-to-end fitting: the MH kernel, adaptive driver, and Walker facade.

Covers SURVEY §4's rebuild strategy: detailed-balance smoke on a known
Gaussian, the reference's tiny line fit (mcmc-fitting.lisp:5-17), a global
two-dataset fit with shared params (test.lisp:52-70), and the Poisson path
(BASELINE.json config 3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.kernel import FitConfig, temperature_schedule
from lisp_mcmc_tpu.models import line


def test_temperature_schedule_matches_reference_formula():
    # temps (mcmc-fitting.lisp:878): cosine oscillation clamped at 1,
    # zero of the cosine exactly at temp-steps.
    cfg = FitConfig(n_steps=30000, temperature=10.0)
    ndim = 6
    ts = cfg.temp_steps(ndim)
    t0 = float(temperature_schedule(jnp.asarray(0), ndim, cfg))
    assert t0 == pytest.approx(10.0)
    t_end = float(temperature_schedule(jnp.asarray(ts - 1), ndim, cfg))
    assert t_end == pytest.approx(1.0, abs=0.1)
    t_after = float(temperature_schedule(jnp.asarray(ts + 5), ndim, cfg))
    assert t_after == 1.0
    # Reference python transcription for several indices:
    mult = 1 + 2 * (ts // 5000)
    for i in (0, 123, 5000, 17321):
        expected = max(1.0, np.cos(i * np.pi * mult / (2 * ts)) * 10.0)
        got = float(temperature_schedule(jnp.asarray(i), ndim, cfg))
        assert got == pytest.approx(expected, rel=1e-6)


def _gaussian_posterior_walker(n_walkers=64, seed=0):
    """A walker whose posterior is an exact 2-D Gaussian (no data)."""
    target_mean = np.array([1.0, -2.0])
    target_cov = np.array([[2.0, 0.6], [0.6, 0.5]])
    prec = np.linalg.inv(target_cov)

    def model(x, p):
        return jnp.zeros_like(x)

    def loglik(fn, params, dataset):
        v = jnp.stack([params["a"], params["b"]]) - jnp.asarray(target_mean)
        return -0.5 * v @ jnp.asarray(prec) @ v

    w = mfit.walker_create(
        function=model,
        data=([0.0, 1.0], [0.0, 0.0]),
        params={"a": 0.5, "b": -1.0},
        log_likelihood=loglik,
        n_walkers=n_walkers,
        seed=seed,
        walker_jitter=0.1,
    )
    return w, target_mean, target_cov


def test_mh_samples_known_gaussian():
    w, mean, cov = _gaussian_posterior_walker()
    w.adaptive_steps(8000, temperature=1.0, auto=None)
    pos, _ = w.steps(take=4000)
    emp_mean = pos.mean(axis=0)
    emp_cov = np.cov(pos.T, bias=True)
    np.testing.assert_allclose(emp_mean, mean, atol=0.25)
    np.testing.assert_allclose(emp_cov, cov, atol=0.5)


def test_acceptance_adapts_into_band():
    w, _, _ = _gaussian_posterior_walker()
    w.adaptive_steps(6000, temperature=1.0, auto=None)
    acc = w.acceptance(take=2000)
    assert 0.1 < acc < 0.6


def test_line_fit_recovers_least_squares():
    # The reference's 5-point smoke fit (mcmc-fitting.lisp:5-17).
    x = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    y = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    w = mfit.walker_create(
        function=line,
        data=(x, y),
        params={"m": 0.5, "b": 0.5},
        data_error=0.1,
        n_walkers=32,
        seed=1,
        walker_jitter=0.05,
    )
    w.adaptive_steps(6000, auto=None)
    best = w.most_likely_params()
    assert best["m"] == pytest.approx(1.0, abs=0.05)
    assert best["b"] == pytest.approx(0.0, abs=0.15)
    # Posterior max should reach the perfect-fit likelihood.
    lp_best, _ = w.most_likely_step()
    perfect = 5 * (-0.5 * np.log(2 * np.pi) - np.log(0.1))
    assert lp_best == pytest.approx(perfect, abs=0.5)


def test_global_fit_shared_params():
    # Two datasets sharing slope m, distinct intercepts (test.lisp:52-70).
    x = np.linspace(0.0, 10.0, 50)
    rng = np.random.default_rng(0)
    y1 = 2.0 * x + 1.0 + rng.normal(0, 0.05, 50)
    y2 = 2.0 * x - 3.0 + rng.normal(0, 0.05, 50)

    def f1(x, p):
        return p["b1"] + p["m"] * x

    def f2(x, p):
        return p["b2"] + p["m"] * x

    w = mfit.walker_create(
        function=[f1, f2],
        data=[(x, y1), (x, y2)],
        params={"m": 1.0, "b1": 0.0, "b2": 0.0},
        data_error=[0.05, 0.05],
        n_walkers=32,
        seed=2,
        walker_jitter=0.05,
    )
    w.adaptive_steps(8000, auto=None)
    best = w.most_likely_params()
    assert best["m"] == pytest.approx(2.0, abs=0.02)
    assert best["b1"] == pytest.approx(1.0, abs=0.1)
    assert best["b2"] == pytest.approx(-3.0, abs=0.1)


def test_poisson_fit():
    # BASELINE.json config 3: counting data.
    rng = np.random.default_rng(5)
    x = np.linspace(1.0, 10.0, 64)
    rate = 3.0 * x
    y = rng.poisson(rate).astype(float)

    w = mfit.walker_create(
        function=lambda x, p: p["rate"] * x,
        data=(x, y),
        params={"rate": 1.0},
        log_likelihood=mfit.log_likelihood_poisson,
        n_walkers=32,
        seed=3,
        walker_jitter=0.1,
    )
    w.adaptive_steps(4000, auto=None)
    assert w.most_likely_params()["rate"] == pytest.approx(3.0, rel=0.05)


def test_bounded_prior_keeps_walkers_inside():
    x = np.linspace(0, 5, 32)
    y = 2.0 * x
    prior = mfit.make_bounds_prior({"m": (0.0, 1.5), "b": (-1.0, 1.0)})
    w = mfit.walker_create(
        function=line,
        data=(x, y),
        params={"m": 1.0, "b": 0.0},
        data_error=0.1,
        log_prior=prior,
        n_walkers=16,
        seed=4,
    )
    w.adaptive_steps(3000, auto=None)
    # True slope 2.0 is outside the bound; best must respect (0, 1.5).
    assert w.most_likely_params()["m"] < 1.6


def test_walker_verbs():
    w, _, _ = _gaussian_posterior_walker(n_walkers=8)
    w.adaptive_steps(2000, temperature=1.0, auto=None)
    assert len(w) > 0
    med = w.median_params()
    assert set(med) == {"a", "b"}
    stddev = w.stddev_params()
    assert set(stddev) == {"a", "b"}
    cov = w.covariance_matrix()
    assert cov.shape == (2, 2)
    tr = w.param_trace("a")
    assert tr.ndim == 1 and len(tr) > 0
    lls = w.log_likelihoods(walker=0)
    assert lls.ndim == 1
    u = w.unique_steps()
    f = w.forward_steps()
    assert u.shape[1] == 2 and f.shape[1] == 2
    assert w.check_for_nonfinite() is None
    # diagnose: posterior at the target mean beats a far point.
    assert w.diagnose_params({"a": 1.0, "b": -2.0}) > w.diagnose_params(
        {"a": 50.0, "b": 50.0}
    )


def test_walker_mutations():
    w, _, _ = _gaussian_posterior_walker(n_walkers=8)
    w.adaptive_steps(2000, temperature=1.0, auto=None)
    n0 = len(w)
    w.keep_steps(n0 // 2)
    assert len(w) <= n0 // 2 + w.config.thin
    w.burn_steps(100)
    w.reset_to_most_likely()
    assert len(w) == 0 or len(w) <= w.config.thin
    lp_best, best = w.most_likely_step()
    np.testing.assert_allclose(
        np.asarray(w.state.position[0]),
        np.asarray([best["a"], best["b"]]),
    )
    w.delete()
    assert w.terms == []


def test_many_steps_fixed_l():
    w, _, _ = _gaussian_posterior_walker(n_walkers=8)
    l0 = np.asarray(w.state.l_matrix).copy()
    w.many_steps(400, l_matrix=0.1 * np.eye(2))
    np.testing.assert_allclose(np.asarray(w.state.l_matrix), 0.1 * np.eye(2)[None])
    assert int(w.state.age) == 400


def test_sample_region_tunes_scale():
    w, _, _ = _gaussian_posterior_walker(n_walkers=8)
    w.sample_region(initial_scale=1e-3, n=1000)
    assert int(w.state.age) == 1000
    assert np.isfinite(np.asarray(w.state.l_matrix)).all()


def test_force_step_and_swap_data():
    x = np.linspace(0, 5, 16)
    w = mfit.walker_create(
        function=line,
        data=(x, 2.0 * x),
        params={"m": 2.0, "b": 0.0},
        data_error=0.1,
        n_walkers=4,
    )
    lp0 = float(w.state.logprob[0])
    ds2 = mfit.Dataset.create(x, 2.0 * x + 5.0, 0.1)
    w.swap_data([ds2])
    lp1 = float(w.state.logprob[0])
    assert lp1 < lp0  # same params now fit worse


def test_estop_interrupts():
    # The driver clears the flag at entry like the reference (865), so the
    # stop must arrive mid-run — from another thread, like a REPL user.
    import threading

    w, _, _ = _gaussian_posterior_walker(n_walkers=8)
    done = threading.Event()

    def run():
        w.adaptive_steps(500000, auto=None)
        done.set()

    t = threading.Thread(target=run)
    t.start()
    while int(w.state.age) < 200 and t.is_alive():
        pass
    mfit.request_stop()
    t.join(timeout=60)
    assert done.is_set()
    # Stopped within a few chunk boundaries, long before 500k steps.
    assert int(w.state.age) < 100000


def test_nan_posterior_rejected_not_propagated():
    def bad_loglik(fn, params, dataset):
        # log of a negative number for m < 0 -> NaN
        return jnp.log(params["m"]) * 0.0 + jnp.where(
            params["m"] > 0, -params["m"] ** 2, jnp.nan
        )

    w = mfit.walker_create(
        function=line,
        data=([0.0, 1.0], [0.0, 1.0]),
        params={"m": 1.0, "b": 0.0},
        log_likelihood=bad_loglik,
        n_walkers=16,
        seed=7,
    )
    w.adaptive_steps(1000, auto=None)
    assert np.isfinite(np.asarray(w.state.logprob)).all()
    assert w.check_for_nonfinite() is None


def test_add_steps_best_is_per_walker():
    """add_steps may only update each walker's best from its OWN column
    (regression: a global argmax handed every improved walker the same
    position — cross-spectrum contamination in grouped fits)."""
    w = mfit.walker_create(
        function=line, data=([0.0, 1.0], [0.0, 2.0]),
        params={"m": 2.0, "b": 0.0}, data_error=0.5, n_walkers=2, seed=0)
    base = np.asarray(w.state.best_logprob)
    pos = np.zeros((1, 2, 2))
    pos[0, 0] = [5.0, 5.0]     # walker 0's entry
    pos[0, 1] = [7.0, 7.0]     # walker 1's entry (the global best)
    lps = np.asarray([[base[0] + 1.0, base[1] + 2.0]])
    w.add_steps(pos, lps)
    best_pos = np.asarray(w.state.best_position)
    np.testing.assert_allclose(best_pos[0], [5.0, 5.0])
    np.testing.assert_allclose(best_pos[1], [7.0, 7.0])
    np.testing.assert_allclose(np.asarray(w.state.best_logprob), lps[0])
    # A worse row must not regress anyone.
    w.add_steps(np.ones((1, 2, 2)), lps - 100.0)
    np.testing.assert_allclose(np.asarray(w.state.best_position)[0], [5.0, 5.0])


def test_best_value_refresh_rejects_gradient_kernels():
    """sampling_optimization='best-value' is the rwm diagonal-refresh
    policy; combined with mala/hmc it reinstated the measured
    absolute-scale limit cycle, so it must refuse at build time."""
    from lisp_mcmc_tpu.kernel import FitConfig

    with pytest.raises(ValueError, match="best-value"):
        w = mfit.walker_create(
            function=line, data=([0.0, 1.0], [0.0, 2.0]),
            params={"m": 2.0, "b": 0.0}, data_error=0.5, n_walkers=8, seed=0,
            config=FitConfig(kernel="mala", sampling_optimization="best-value"))
        w.adaptive_steps(200, auto=None)


def test_history_accounting_with_large_thin():
    """thin > chunk_size clamps to one row per chunk on device; the host
    steps<->rows conversions must use the same resolved thin
    (regression: len() overcounted 5x at thin=1000/chunk=200)."""
    from lisp_mcmc_tpu.kernel import FitConfig

    w = mfit.walker_create(
        function=line, data=([0.0, 1.0], [0.0, 2.0]),
        params={"m": 2.0, "b": 0.0}, data_error=0.5, n_walkers=8, seed=0,
        config=FitConfig(thin=1000))
    w.adaptive_steps(1000, auto=None)   # 5 chunks -> 5 rows at thin=200
    assert len(w) == 1000
