"""Rank-normalized R-hat, tail ESS, MCSE (Vehtari et al. 2021).

The modern convergence layer on top of the classic split R-hat / ESS the
reference-era diagnostics provide: rank normalization makes bulk R-hat
robust to heavy tails, the folded tail statistic catches scale-only
chain disagreement invisible to any mean/variance R-hat, and tail ESS
certifies credible-interval endpoints rather than the mean.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu import diagnostics
from lisp_mcmc_tpu.models import line
from lisp_mcmc_tpu.ops.reductions import (
    mcse_mean,
    rank_normalized_rhat,
    split_rhat,
    tail_ess,
)


# ------------------------------------------------------------- reductions
def test_rank_rhat_iid_near_one():
    x = np.random.default_rng(0).normal(size=(400, 8))
    bulk, tail = rank_normalized_rhat(jnp.asarray(x))
    assert float(bulk) == pytest.approx(1.0, abs=0.01)
    assert float(tail) == pytest.approx(1.0, abs=0.01)


def test_rank_rhat_location_shift_detected():
    x = np.random.default_rng(1).normal(size=(400, 8))
    y = x + np.arange(8)[None, :] * 2.0
    bulk, _ = rank_normalized_rhat(jnp.asarray(y))
    assert float(bulk) > 1.5


def test_tail_rhat_catches_scale_only_disagreement():
    """Chains agreeing in location but not scale: classic split R-hat is
    blind (between-chain variance of the means is ~0); the folded tail
    statistic is the only one of the family that fires."""
    x = np.random.default_rng(2).normal(size=(400, 8))
    z = x * (1.0 + 3.0 * (np.arange(8)[None, :] % 2))
    assert float(split_rhat(jnp.asarray(z))) < 1.01          # blind
    bulk, tail = rank_normalized_rhat(jnp.asarray(z))
    assert float(bulk) < 1.01                                 # also blind
    assert float(tail) > 1.1                                  # fires


def test_rank_rhat_frozen_ensemble_inf():
    """Ties get average ranks, so a frozen ensemble stays degenerate
    after rank normalization and inherits split_rhat's inf guard."""
    frozen = np.full((100, 8), 3.14)
    bulk, tail = rank_normalized_rhat(jnp.asarray(frozen))
    assert float(bulk) == float("inf")
    assert float(tail) == float("inf")


def test_rank_rhat_heavy_tails_stable():
    c = np.random.default_rng(3).standard_cauchy(size=(400, 8))
    bulk, tail = rank_normalized_rhat(jnp.asarray(c))
    assert float(bulk) == pytest.approx(1.0, abs=0.02)
    assert float(tail) == pytest.approx(1.0, abs=0.02)


def test_tail_ess_iid_large_fraction():
    x = np.random.default_rng(4).normal(size=(400, 8))
    te = float(tail_ess(jnp.asarray(x)))
    assert 0.5 * x.size < te <= 1.3 * x.size


def test_tail_ess_sticky_tails_small():
    """AR(1)-correlated chains resolve their extremes far more slowly
    than iid; tail ESS must reflect that."""
    rng = np.random.default_rng(5)
    t_steps, w = 2000, 8
    x = np.empty((t_steps, w))
    x[0] = rng.normal(size=w)
    for t in range(1, t_steps):
        x[t] = 0.97 * x[t - 1] + np.sqrt(1 - 0.97**2) * rng.normal(size=w)
    te = float(tail_ess(jnp.asarray(x)))
    assert te < 0.15 * x.size


def test_mcse_mean_matches_iid_formula():
    x = np.random.default_rng(6).normal(size=(500, 8))
    got = float(mcse_mean(jnp.asarray(x)))
    # iid: ESS ~ S so mcse ~ sd/sqrt(S); allow ESS-estimator slack
    assert got == pytest.approx(x.std(ddof=1) / np.sqrt(x.size), rel=0.3)


# ------------------------------------------------------------ diagnostics
@pytest.fixture(scope="module")
def fitted():
    x = np.linspace(0.0, 10.0, 40)
    y = 2.0 * x + 1.0 + np.random.default_rng(0).normal(0, 0.05, 40)
    w = mfit.walker_create(
        function=line, data=(x, y), params={"m": 1.5, "b": 0.5},
        data_error=0.05, n_walkers=16, seed=0, walker_jitter=0.05,
    )
    w.adaptive_steps(4000, auto=None)
    w.burn_steps(len(w) // 2)
    return w


def test_rank_rhat_per_param_converged(fitted):
    rr = diagnostics.rank_rhat_per_param(fitted)
    assert set(rr) == {"m", "b"}
    for bulk, tail in rr.values():
        assert bulk < 1.2 and tail < 1.2


def test_tail_ess_and_mcse_per_param(fitted):
    te = diagnostics.tail_ess_per_param(fitted)
    mc = diagnostics.mcse_per_param(fitted)
    assert set(te) == set(mc) == {"m", "b"}
    assert all(v > 10 for v in te.values())
    # The mean must be pinned far tighter than the posterior sd.
    sd = fitted.stddev_params()
    assert all(mc[k] < sd[k] for k in mc)
    assert all(mc[k] > 0 for k in mc)


def test_batched_diagnostics_per_dataset_blocks():
    """A BatchedFit holds S populations targeting DIFFERENT posteriors;
    pooling them reads as divergence (R-hat huge) even when every fit
    converged. The walker-level diagnostics must compute within dataset
    blocks and report the worst case."""
    from lisp_mcmc_tpu.ops.reductions import split_rhat

    x = np.linspace(0.0, 10.0, 40)
    # Far-apart intercepts: pooled walkers span b=1 and b=101.
    datasets = [(x, 2.0 * x + 1.0), (x, 2.0 * x + 101.0)]
    fit = mfit.BatchedFit(line, datasets, [{"m": 1.8, "b": 0.5},
                                           {"m": 1.8, "b": 100.0}],
                          data_error=0.1, walkers_per_dataset=16, seed=0,
                          walker_jitter=0.01)
    fit.adaptive_steps(4000, auto=None)
    fit.burn_steps(len(fit) // 2)
    rr = diagnostics.rhat_per_param(fit)
    assert rr["b"] < 1.3                    # worst per-dataset block
    pos, _ = fit._history(None)
    pooled = float(split_rhat(jnp.asarray(pos)[:, :, 1]))
    assert pooled > 5.0                     # what pooling would report
    # ESS/tail-ESS/MCSE and the one-call report go block-wise too.
    assert diagnostics.ess_per_param(fit)["b"] > 50
    rep = diagnostics.convergence(fit, rhat_tol=1.5, min_tail_ess=10)
    assert rep["ok"], rep["failures"]
    m = diagnostics.metrics(fit)
    assert m["rhat"]["b"] < 1.3


def test_convergence_report_pass(fitted):
    rep = diagnostics.convergence(fitted, rhat_tol=1.3, min_tail_ess=10)
    assert rep["ok"] and rep["failures"] == []
    assert set(rep["rank_rhat"]) == {"m", "b"}


def test_auto_rank_rhat_stops_converged_fit():
    """auto='rank-rhat' (Vehtari-2021 stop rule in the driver) stops an
    easy converged ensemble well before n_steps."""
    rng = np.random.default_rng(1)
    x = np.linspace(0.0, 10.0, 50)
    y = 2.0 * x + 1.0 + 0.05 * rng.standard_normal(50)
    w = mfit.walker_create(
        function=line, data=(x, y), params={"m": 2.0, "b": 1.0},
        data_error=0.05, n_walkers=64, seed=0, walker_jitter=0.02,
    )
    w.adaptive_steps(40000, auto="rank-rhat", temperature=2.0)
    assert w.age < 40000
    rr = diagnostics.rank_rhat_per_param(w, take=1000)
    assert max(max(v) for v in rr.values()) < 1.2
    # collect_history=False is invalid for the history-based rule.
    with pytest.raises(ValueError, match="rank-rhat"):
        w.adaptive_steps(1000, auto="rank-rhat", collect_history=False)


def test_host_rank_normalize_matches_device():
    from lisp_mcmc_tpu.fit import _rank_normalize_host
    from lisp_mcmc_tpu.ops.reductions import _rank_normalize

    x = np.random.default_rng(0).normal(size=(50, 8, 3))
    host = _rank_normalize_host(x)
    for j in range(3):
        dev = np.asarray(_rank_normalize(jnp.asarray(x[:, :, j])))
        np.testing.assert_allclose(host[:, :, j], dev, atol=1e-12)


def test_convergence_report_fail_thresholds(fitted):
    rep = diagnostics.convergence(fitted, rhat_tol=1.0000001,
                                  min_tail_ess=1e9)
    assert not rep["ok"]
    assert len(rep["failures"]) >= 2
    assert any("tail ESS" in f for f in rep["failures"])
