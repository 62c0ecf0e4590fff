"""Convergence gates on grouped refit programs (VERDICT r4 #3).

reloo/kfold/logo/SBC score fixed-budget refits; an unmixed block's
"exact" elpd (or rank row) would silently corrupt the result — the same
failure mode as the WAIC hot-straggler invariant.  These tests pin:

  - grouped_refit_health flags an unmixed grouped ensemble and warns;
  - a healthy ensemble passes silently;
  - reloo KEEPS the PSIS value and pareto_k for a failed block and
    marks it in ``refit_failed`` (never replaces a flagged estimate
    with a wrong "exact" one);
  - kfold attaches per-fold verdicts;
  - SBC results carry per-simulation verdicts.
"""

import warnings

import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu import diagnostics
from lisp_mcmc_tpu.diagnostics import grouped_refit_health


def _line(x, p):
    return p["a"] * x + p["b"]


def _walker(n_steps=3000, seed=0):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 1, 24)
    y = 2.0 * x + 1.0 + 0.1 * rng.standard_normal(24)
    w = mfit.walker_create(function=_line, data=(x, y),
                           params={"a": 2.0, "b": 1.0}, data_error=0.1,
                           n_walkers=64, seed=seed)
    w.adaptive_steps(n_steps, auto=None)
    w.burn_steps(len(w) // 2)
    return w


def _grouped_batched(n_steps, walker_jitter=0.05):
    rng = np.random.default_rng(3)
    x = np.linspace(0, 1, 16)
    ds = [(x, 2.0 * x + 1.0 + 0.1 * rng.standard_normal(16)),
          (x, -1.0 * x + 0.5 + 0.1 * rng.standard_normal(16))]
    fit = mfit.BatchedFit(_line, ds, {"a": 1.0, "b": 0.0}, data_error=0.1,
                          walkers_per_dataset=16, seed=0,
                          walker_jitter=walker_jitter)
    fit.adaptive_steps(n_steps)
    return fit


def test_health_gate_flags_unmixed():
    """A FROZEN ensemble (proposal scale blown up -> acceptance ~0 ->
    chains never move) is exactly the collapse the gate exists for:
    its draws are one stale point per walker, never adapted — the gate
    flags it and warns naming the blocks."""
    import dataclasses

    import jax.numpy as jnp

    fit = _grouped_batched(n_steps=50, walker_jitter=0.5)
    fit.reset()
    fit.state = dataclasses.replace(
        fit.state, l_matrix=fit.state.l_matrix * 1e8)
    fit.sampling_steps(60, kernel="rwm")
    assert float(jnp.asarray(fit.acceptance())) < 0.01
    with pytest.warns(UserWarning, match="collapse gate"):
        ok = grouped_refit_health(fit, "test-gate")
    assert not ok.all()


def test_health_gate_passes_mixed():
    fit = _grouped_batched(n_steps=4000)
    fit.burn_steps(len(fit) // 2)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        ok = grouped_refit_health(fit, "test-gate")
    assert ok.shape == (2,)
    assert ok.all()


def test_reloo_keeps_psis_for_failed_blocks(monkeypatch):
    """Fault injection: when every refit block fails the gate, reloo
    must keep the PSIS pointwise values AND the pareto_k flags, and
    mark the points in refit_failed — not merge wrong 'exact' values."""
    w = _walker()
    base = diagnostics.loo(w, max_samples=128)
    doctored_k = base.pareto_k.copy()
    doctored_k[[3, 7]] = 0.95           # force two "flagged" points
    doctored = diagnostics.LOOResult(
        elpd=base.elpd, p_loo=base.p_loo, lppd=base.lppd, se=base.se,
        n_points=base.n_points, n_samples=base.n_samples,
        pointwise=base.pointwise, pareto_k=doctored_k)

    monkeypatch.setattr(diagnostics, "grouped_refit_health",
                        lambda fit, name, **kw: np.zeros(2, dtype=bool))
    res = diagnostics.reloo(w, result=doctored, n_steps=400,
                            walkers_per_dataset=16, max_samples=64)
    assert res.refit_failed == (3, 7)
    # PSIS values and flags KEPT, not replaced
    assert res.pointwise[3] == pytest.approx(doctored.pointwise[3])
    assert res.pointwise[7] == pytest.approx(doctored.pointwise[7])
    assert res.pareto_k[3] == pytest.approx(0.95)
    assert res.pareto_k[7] == pytest.approx(0.95)
    assert res.elpd == pytest.approx(float(doctored.pointwise.sum()))


def test_reloo_healthy_replaces(monkeypatch):
    """Complement: a healthy gate lets the exact values in (pareto_k
    zeroed, refit_failed empty)."""
    w = _walker()
    base = diagnostics.loo(w, max_samples=128)
    doctored_k = base.pareto_k.copy()
    doctored_k[5] = 0.95
    doctored = diagnostics.LOOResult(
        elpd=base.elpd, p_loo=base.p_loo, lppd=base.lppd, se=base.se,
        n_points=base.n_points, n_samples=base.n_samples,
        pointwise=base.pointwise, pareto_k=doctored_k)
    monkeypatch.setattr(diagnostics, "grouped_refit_health",
                        lambda fit, name, **kw: np.ones(1, dtype=bool))
    res = diagnostics.reloo(w, result=doctored, n_steps=1500,
                            walkers_per_dataset=32, max_samples=64)
    assert res.refit_failed == ()
    assert res.pareto_k[5] == 0.0
    # exact leave-one-out on an uninfluential point of an easy fit
    # stays within a nat of the PSIS estimate
    assert res.pointwise[5] == pytest.approx(doctored.pointwise[5], abs=1.0)


def test_kfold_attaches_fold_ok():
    w = _walker()
    res = diagnostics.kfold(w, k=3, n_steps=1500, walkers_per_dataset=24,
                            max_samples=64)
    assert res.fold_ok is not None
    assert res.fold_ok.shape == (3,)
    assert res.fold_ok.dtype == bool


def test_sbc_result_carries_sim_ok():
    res = mfit.sbc_check(
        _line, {"a": (-3, 3), "b": (-2, 2)}, np.linspace(0, 1, 12), 0.2,
        n_sims=6, walkers_per_dataset=16, n_steps=1200, n_draws=31,
        seed=0)
    assert res.sim_ok is not None
    assert res.sim_ok.shape == (6,)
