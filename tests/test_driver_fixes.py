"""Regression tests for driver/kernel semantics found in code review:
cold-finish temperature pinning, non-adaptive moment hygiene, auto-stop
windows for ensembles, unit-robust NV priors, and checkpoint refusal for
batched fits."""

import dataclasses

import jax
import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu import nv
from lisp_mcmc_tpu.kernel import FitConfig, build_chunk_runner
from lisp_mcmc_tpu.models import line


def _walker(n_walkers=32, temperature=10.0, n_steps=30000):
    x = np.linspace(0.0, 10.0, 50)
    y = 2.0 * x + 1.0
    return mfit.walker_create(
        function=line, data=(x, y), params={"m": 2.0, "b": 1.0},
        data_error=0.1, n_walkers=n_walkers, seed=0, walker_jitter=0.01,
        config=FitConfig(temperature=temperature, n_steps=n_steps),
    )


def test_force_cold_equals_temperature_one():
    """force_cold=True must reproduce a T=1 schedule exactly (same PRNG)."""
    w_hot = _walker(temperature=1000.0)
    w_cold = _walker(temperature=1.0)
    run_hot, _ = build_chunk_runner(w_hot._log_post_one, w_hot.ndim, w_hot.config,
                                    takes_data=True)
    run_cold, _ = build_chunk_runner(w_cold._log_post_one, w_cold.ndim, w_cold.config,
                                     takes_data=True)
    data = w_hot._posterior_data()

    state_forced, _ = jax.jit(run_hot)(w_hot.state, True, True, True, data)
    state_t1, _ = jax.jit(run_cold)(w_cold.state, True, True, False, data)
    np.testing.assert_allclose(
        np.asarray(state_forced.position), np.asarray(state_t1.position), rtol=0
    )

    # And without force_cold the hot schedule must actually differ.
    state_hot, _ = jax.jit(run_hot)(w_hot.state, True, True, False, data)
    assert not np.allclose(
        np.asarray(state_hot.position), np.asarray(state_t1.position)
    )


def test_many_steps_runs_cold_and_resets_moments():
    w = _walker(temperature=1000.0)
    w.many_steps(400, l_matrix=0.05 * np.eye(2))
    # Moment accumulators must not survive a non-adaptive run (they would
    # poison the next adaptive covariance refresh).
    assert float(np.asarray(w.state.m_count).sum()) == 0.0
    # Cold sampling of a sharp posterior keeps walkers near the optimum
    # (at T=1000 nearly every uphill/downhill move would be accepted and
    # the ensemble would scatter far from m=2, b=1).
    best = w.most_likely_params()
    assert abs(best["m"] - 2.0) < 0.2


def test_auto_stop_window_with_large_chunks():
    """1000 // chunk_size == 0 must not expand the window to everything."""
    w = _walker()
    w.config = dataclasses.replace(w.config, chunk_size=1024)
    # the driver computes k = max(1, 1000 // chunk): emulate its slice
    w._accept_log = [0.01] * 50 + [0.3]
    k = max(1, 1000 // w.config.chunk_size)
    assert float(np.mean(w._accept_log[-k:])) == pytest.approx(0.3)


def test_prob_settle_for_ensembles():
    """The single-chain 4..9 spread band must not gate ensembles."""
    w = _walker(n_walkers=64)
    settle = w.config.steps_to_settle(w.ndim)
    n = max(settle, 400)
    flat = 100.0 + 0.01 * np.sin(np.arange(n))      # settled, nearly flat
    w._lpmax_trace = [flat]
    w._lpmean_trace = [flat - 1.0]
    assert w._auto_settled(w.config, settle)
    drifting = np.linspace(0.0, 50.0, n)            # still climbing
    w._lpmax_trace = [drifting]
    w._lpmean_trace = [drifting - 1.0]
    assert not w._auto_settled(w.config, settle)


def test_rhat_auto_stop():
    """auto='rhat' stops a converged ensemble well before n_steps and
    keeps running an unconverged one."""
    rng = np.random.default_rng(1)
    x = np.linspace(0.0, 10.0, 50)
    y = 2.0 * x + 1.0 + 0.05 * rng.standard_normal(50)
    w = mfit.walker_create(
        function=line, data=(x, y), params={"m": 2.0, "b": 1.0},
        data_error=0.05, n_walkers=64, seed=0, walker_jitter=0.02,
        config=FitConfig(temperature=2.0),
    )
    w.adaptive_steps(40000, auto="rhat")
    assert w.age < 40000  # converged and stopped early
    from lisp_mcmc_tpu.diagnostics import rhat_per_param

    assert max(rhat_per_param(w, take=1000).values()) < 1.2


def test_nv_prior_scales_to_normalized_units():
    """A normalized spectrum (bg ~ 1.0, 2% dips) must satisfy the default
    pipeline prior at its own auto-guess (the reference's literal boxes
    assume lab units and reject it)."""
    rng = np.random.default_rng(0)
    x = np.linspace(2840.0, 2900.0, 128)
    y = (1.0
         - 0.02 * 100.0 / ((x - 2862.0) ** 2 + 100.0)
         - 0.02 * 100.0 / ((x - 2874.0) ** 2 + 100.0)
         + rng.normal(0, 2e-4, 128))
    guess = nv.guess_nv_params(y)
    prior = nv.make_nv_prior(y)
    guess["mu2"] = 2874.0  # guess mu defaults already satisfy the boxes
    assert float(prior(guess, None)) == 0.0
    # the reference-unit prior indeed rejects it (documented behavior)
    assert float(nv.log_prior_nv(guess, None)) < -1e4
    # and a short default-prior fit moves toward the dips
    w = nv.nv_walker((x, y), n_walkers=32, seed=0)
    w.adaptive_steps(3000, auto=None)
    assert float(w.most_likely_step()[0]) > 0


def test_sampling_optimization_best_value_refresh():
    """sampling_optimization='best-value' selects the diagonal refresh
    source (get-optimal-mcmc-l-matrix :best-value, mcmc-fitting.lisp:
    888-895): L stays diagonal for the whole run (initial diag, diag
    refreshes, scalar rescales), unlike the covariance source which
    generally produces off-diagonal structure."""
    x = np.linspace(0.0, 10.0, 50)
    rng = np.random.default_rng(3)
    y = 2.0 * x + 1.0 + 0.1 * rng.standard_normal(50)
    w = mfit.walker_create(
        function=line, data=(x, y), params={"m": 1.5, "b": 0.5},
        data_error=0.1, n_walkers=64, seed=0, walker_jitter=0.05,
        config=FitConfig(sampling_optimization="best-value", n_steps=4000),
    )
    w.adaptive_steps(4000, auto=None)
    l = np.asarray(w.state.l_matrix[0])
    assert l[0, 1] == 0.0 and l[1, 0] == 0.0
    assert w.most_likely_params()["m"] == pytest.approx(2.0, abs=0.1)


def test_annealing_clock_resets_per_run():
    """The annealing schedule is indexed per adaptive run (the reference's
    do-loop i, 919-921), not by lifetime age: a second run must restart
    its clock even though age keeps counting."""
    w = _walker()
    w.adaptive_steps(400, auto=None)
    w.adaptive_steps(400, auto=None)
    assert int(w.state.age) == 800
    assert int(w.state.anneal_step) == 400


def test_checkpoint_refuses_batched_fits(tmp_path):
    from lisp_mcmc_tpu.checkpoint import walker_save

    rng = np.random.default_rng(1)
    x = np.linspace(2840.0, 2900.0, 128)
    spectra = []
    for d in (2862.0, 2863.0):
        y = 8e-6 - 4e-5 * 100.0 / ((x - d) ** 2 + 100.0) \
            - 4e-5 * 100.0 / ((x - d - 12) ** 2 + 100.0) \
            + rng.normal(0, 4e-7, 128)
        spectra.append((x, y))
    fit = nv.BatchedNVFit(spectra, walkers_per_spectrum=8, seed=0)
    with pytest.raises(ValueError, match="use batched_save"):
        walker_save(fit, str(tmp_path / "batched.npz"))


def test_swap_data_refused_for_custom_posterior():
    rng = np.random.default_rng(2)
    x = np.linspace(2840.0, 2900.0, 128)
    y = 8e-6 - 4e-5 * 100.0 / ((x - 2862.0) ** 2 + 100.0) \
        - 4e-5 * 100.0 / ((x - 2874.0) ** 2 + 100.0) + rng.normal(0, 4e-7, 128)
    fit = nv.BatchedNVFit([(x, y)], walkers_per_spectrum=8, seed=0)
    with pytest.raises(ValueError, match="custom log-posterior"):
        fit.swap_data([fit.terms[0].dataset])
    # diagnose_params works with aux routing
    lp = fit.diagnose_params(nv.guess_nv_params(y))
    assert np.isfinite(lp)
