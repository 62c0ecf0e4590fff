"""Regression tests for the third review pass: NaN-start recovery,
best-step reset on data swap, 2-D initial vectors, tuner bookkeeping
isolation, and checkpointed auto-stop traces."""

import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.data import Dataset
from lisp_mcmc_tpu.models import line


def _line_walker(rng, n_walkers=16, **kw):
    x = np.linspace(0.0, 10.0, 50)
    y = 2.0 * x + 1.0 + 0.05 * rng.standard_normal(50)
    return mfit.walker_create(
        function=line, data=(x, y), params=kw.pop("params", {"m": 2.0, "b": 1.0}),
        data_error=0.05, n_walkers=n_walkers, seed=0, walker_jitter=0.05, **kw,
    )


def test_nan_initial_posterior_recovers(rng):
    """A NaN posterior at the starting params (log of a negative Poisson
    rate) must behave like 'reject hard', not freeze the ensemble."""
    x = np.linspace(0.0, 10.0, 64)
    counts = rng.poisson(2.0 + 1.0 * x).astype(float)
    w = mfit.walker_create(
        function=line, data=(x, counts), params={"m": -5.0, "b": -5.0},
        log_likelihood=mfit.log_likelihood_poisson,
        n_walkers=32, seed=1, walker_jitter=0.1,
    )
    assert np.isfinite(np.asarray(w.state.logprob)).all()
    w.adaptive_steps(4000, auto=None)
    assert w.acceptance() > 0.0
    assert np.isfinite(w.most_likely_step()[0])
    assert w.most_likely_params()["m"] == pytest.approx(1.0, abs=0.3)


def test_swap_data_resets_best_tracking(rng):
    w = _line_walker(rng)
    w.adaptive_steps(600, auto=None)
    old_best_lp, old_best = w.most_likely_step()
    x = np.linspace(0.0, 10.0, 50)
    w.swap_data([Dataset.create(x, 5.0 * x - 3.0, 0.05)])
    new_lp, _ = w.most_likely_step()
    assert new_lp != old_best_lp  # stale best discarded
    w.adaptive_steps(3000, auto=None)
    assert w.most_likely_params()["m"] == pytest.approx(5.0, abs=0.3)


def test_2d_initial_vector_defines_ensemble(rng):
    from lisp_mcmc_tpu.fit import Walker

    w = _line_walker(rng)
    starts = np.stack([np.array([2.0, 1.0]) + 0.1 * i for i in range(8)])
    w2 = Walker(w.terms, w.spec, starts)
    assert w2.n_walkers == 8
    assert w2.state.position.shape == (8, 2)
    with pytest.raises(ValueError, match="walkers"):
        Walker(w.terms, w.spec, starts, n_walkers=4)


def test_tuner_stats_do_not_pollute_chunk_logs(rng):
    w = _line_walker(rng)
    w.adaptive_steps(600, auto=None)
    n_acc = len(w._accept_log)
    n_mean = len(w._lpmean_trace)
    w.sample_region(n=500)
    assert len(w._accept_log) == n_acc          # untouched
    assert len(w._lpmean_trace) == n_mean
    assert len(w.tuner_accept_log) > 0          # tracked separately


def test_checkpoint_round_trips_autostop_traces(rng, tmp_path):
    from lisp_mcmc_tpu.checkpoint import walker_load, walker_save

    w = _line_walker(rng)
    w.adaptive_steps(800, auto=None)
    path = str(tmp_path / "w.npz")
    walker_save(w, path)
    w2 = walker_load(path)
    assert sum(t.size for t in w2._lpmax_trace) == sum(t.size for t in w._lpmax_trace)
    assert sum(t.size for t in w2._lpmean_trace) == sum(t.size for t in w._lpmean_trace)


def test_on_chunk_callback_observes_and_stops(rng):
    w = _line_walker(rng)
    seen = []

    def hook(step, metrics):
        seen.append((step, metrics["accept_rate"]))
        return step >= 600  # request a graceful stop

    w.adaptive_steps(10000, auto=None, on_chunk=hook)
    assert seen and seen[0][0] == 200
    assert w.age < 10000  # stopped early at a chunk boundary


def test_vectorized_covariance_matches_per_walker(rng):
    w = _line_walker(rng, n_walkers=8)
    w.adaptive_steps(1000, auto=None)
    cov = w.covariance_matrix()
    # ground truth: the per-walker dedup path
    samples = np.concatenate([w.unique_steps(None, k) for k in range(8)], axis=0)
    from lisp_mcmc_tpu.ops.linalg import sample_covariance

    np.testing.assert_allclose(cov, np.asarray(sample_covariance(samples)), rtol=1e-10)
