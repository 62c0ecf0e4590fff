"""Generic vectorized walker sets (lisp_mcmc_tpu.batched.BatchedFit):
S same-shape datasets, any model, one ensemble with per-dataset
adaptation groups."""

import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.models import exponential_decay, line


def _decays(rng, taus, n=96):
    x = np.linspace(0.0, 10.0, n)
    out = []
    for tau in taus:
        y = 2.0 * np.exp(-x / tau) + 0.1 + 0.01 * rng.standard_normal(n)
        out.append((x, y))
    return out


def test_batched_fit_recovers_distinct_taus(rng):
    taus = [1.0, 2.5, 5.0]
    datasets = _decays(rng, taus)
    fit = mfit.BatchedFit(
        exponential_decay,
        datasets,
        {"scale": 1.5, "tau": 2.0, "bg0": 0.2},
        data_error=0.01,
        walkers_per_dataset=48,
        seed=0,
    )
    assert fit.n_walkers == 3 * 48
    fit.adaptive_steps(8000, auto=None)
    for tau, p in zip(taus, fit.best_params_per_dataset()):
        assert p["tau"] == pytest.approx(tau, rel=0.1)
        assert p["scale"] == pytest.approx(2.0, rel=0.15)
    # derived quantity per dataset (the vectorized walker-set-get-f)
    rates = fit.expressions_per_dataset("(/ 1 :tau)")
    for tau, r in zip(taus, rates):
        assert r == pytest.approx(1.0 / tau, rel=0.15)
    lps = fit.best_logprob_per_dataset()
    assert len(lps) == 3 and all(np.isfinite(lps))


def test_batched_fit_per_dataset_guesses_and_errors(rng):
    datasets = _decays(rng, [1.0, 4.0])
    fit = mfit.BatchedFit(
        exponential_decay,
        datasets,
        [{"scale": 1.0, "tau": 0.8, "bg0": 0.1},
         {"scale": 3.0, "tau": 5.0, "bg0": 0.3}],
        data_error=[0.01, np.full(96, 0.02)],
        walkers_per_dataset=16,
        seed=1,
    )
    p0 = fit.best_params_per_dataset()
    assert p0[0]["tau"] != p0[1]["tau"]  # distinct starting blocks


def test_batched_fit_validations(rng):
    datasets = _decays(rng, [1.0, 2.0])
    with pytest.raises(ValueError, match="no datasets"):
        mfit.BatchedFit(exponential_decay, [], {})
    with pytest.raises(ValueError, match="parameter guesses"):
        mfit.BatchedFit(exponential_decay, datasets,
                        [{"scale": 1.0, "tau": 1.0, "bg0": 0.1}])
    with pytest.raises(ValueError, match="error array length"):
        mfit.BatchedFit(exponential_decay, datasets,
                        {"scale": 1.0, "tau": 1.0, "bg0": 0.1},
                        data_error=[np.ones(5), 0.01])


def test_batched_fit_ragged_lengths(rng):
    """Different-length datasets batch fine: each pads to the batch max
    with its own mask, so padded lanes contribute nothing (round 3 —
    previously refused with 'same-length')."""
    x1 = np.linspace(0.0, 10.0, 96)
    x2 = np.linspace(0.0, 8.0, 41)           # shorter AND different grid
    y1 = 2.0 * np.exp(-x1 / 1.5) + 0.1 + 0.01 * rng.standard_normal(96)
    y2 = 2.0 * np.exp(-x2 / 4.0) + 0.1 + 0.01 * rng.standard_normal(41)
    fit = mfit.BatchedFit(
        exponential_decay, [(x1, y1), (x2, y2)],
        {"scale": 1.5, "tau": 2.0, "bg0": 0.2},
        data_error=0.01, walkers_per_dataset=48, seed=0)
    # both padded to one static shape, masks carry the true counts
    assert fit._datasets[0].x.shape == fit._datasets[1].x.shape
    assert fit._datasets[0].n == 96 and fit._datasets[1].n == 41
    fit.adaptive_steps(8000, auto=None)
    taus = [p["tau"] for p in fit.best_params_per_dataset()]
    assert taus[0] == pytest.approx(1.5, rel=0.1)
    assert taus[1] == pytest.approx(4.0, rel=0.15)
    # the per-dataset toolchain respects each block's true length
    draws = fit.posterior_predictive_per_dataset(max_samples=64)
    assert draws[0].y_obs.shape == (96,) and draws[1].y_obs.shape == (41,)
    w0, w1 = fit.waic_per_dataset(max_samples=64)
    assert np.isfinite(w0.elpd) and np.isfinite(w1.elpd)


def test_batched_shared_per_point_error_array():
    """One (n,)-length per-point error array is shared across datasets,
    not misread as per-dataset scalars (regression)."""
    x = np.linspace(0.0, 10.0, 40)
    datasets = [(x, 2.0 * x + 1.0), (x, 3.0 * x - 1.0)]
    err = np.full(40, 0.1)
    fit = mfit.BatchedFit(line, datasets, {"m": 1.0, "b": 0.5},
                          data_error=err, walkers_per_dataset=8, seed=0)
    fit.adaptive_steps(600, auto=None)
    best = fit.best_params_per_dataset()
    assert best[0]["m"] == pytest.approx(2.0, abs=0.1)
    assert best[1]["m"] == pytest.approx(3.0, abs=0.1)
    # Ambiguous n == S case demands an explicit list.
    two = [(x[:2], x[:2]), (x[:2], x[:2])]
    with pytest.raises(ValueError, match="ambiguous"):
        mfit.BatchedFit(line, two, {"m": 1.0, "b": 0.5},
                        data_error=np.array([0.1, 0.2]), walkers_per_dataset=4)


def test_predictive_toolchain_per_dataset(rng):
    """Batched fits are first-class for the predictive toolchain: each
    dataset block gets its own WAIC/PSIS-LOO/replicates through the
    single-dataset views (history columns mapped per block)."""
    x = np.linspace(0.0, 10.0, 50)
    noises = [0.1, 0.3]
    datasets = [(x, 2.0 * x + 1.0 + rng.normal(0, s, 50)) for s in noises]
    fit = mfit.BatchedFit(line, datasets, {"m": 1.8, "b": 0.8},
                          data_error=noises, walkers_per_dataset=24,
                          seed=0, walker_jitter=0.02)
    fit.adaptive_steps(4000, auto=None)
    fit.burn_steps(len(fit) // 2)

    waics = fit.waic_per_dataset(max_samples=128)
    loos = fit.loo_per_dataset(max_samples=128)
    assert len(waics) == len(loos) == 2
    for w_res, l_res in zip(waics, loos):
        assert w_res.n_points == 50 and l_res.n_points == 50
        # Same elpd target: WAIC and LOO agree on a well-behaved fit.
        assert w_res.elpd == pytest.approx(l_res.elpd, abs=3.0)
    # The noisier dataset predicts new points worse (lower elpd).
    assert waics[0].elpd > waics[1].elpd + 20

    draws = fit.posterior_predictive_per_dataset(max_samples=128)
    for d_res, (_, y) in zip(draws, datasets):
        np.testing.assert_allclose(d_res.y_obs, y)
        assert 0.7 < d_res.coverage(0.05, 0.95) <= 1.0
    # Replicate spreads track each dataset's own noise level.
    s0 = draws[0].y_rep.std(axis=0).mean()
    s1 = draws[1].y_rep.std(axis=0).mean()
    assert s1 > 2.0 * s0

    view = fit.dataset_view(1)
    pos, lp = view.steps()
    assert pos.shape[1] == 2 and pos.shape[0] == lp.shape[0] > 0
    with pytest.raises(IndexError):
        fit.dataset_view(2)


def test_dataset_view_maps_live_state_fallback(rng):
    """With no collected history, _history() falls back to the FULL
    live ensemble; the block mapping must follow that width instead of
    assuming the retained subsample (review finding: a stale mapping
    silently scored one dataset with another's walkers)."""
    x = np.linspace(0.0, 10.0, 40)
    datasets = [(x, 1.0 * x), (x, 3.0 * x)]
    fit = mfit.BatchedFit(line, datasets, [{"m": 1.0, "b": 0.0},
                                           {"m": 3.0, "b": 0.0}],
                          data_error=0.1, walkers_per_dataset=16, seed=0,
                          walker_jitter=0.01)
    fit.adaptive_steps(1000, auto=None, collect_history=False)
    for s, m_true in [(0, 1.0), (1, 3.0)]:
        pos, lp = fit.dataset_view(s).steps()
        assert pos.shape[0] == 16          # exactly this block's walkers
        assert np.median(pos[:, 0]) == pytest.approx(m_true, abs=0.3)


def test_auto_rank_rhat_fires_on_batched_fit(rng):
    """The rank-rhat stop rule judges each dataset block separately: on
    a batched fit of two easy posteriors with far-apart intercepts the
    POOLED statistic stays >> 1.01 forever (different targets), so a
    pooled rule would burn the whole budget; the per-block rule stops
    early (review finding, round 2)."""
    x = np.linspace(0.0, 10.0, 50)
    datasets = [(x, 2.0 * x + 1.0 + 0.05 * rng.standard_normal(50)),
                (x, 2.0 * x + 101.0 + 0.05 * rng.standard_normal(50))]
    fit = mfit.BatchedFit(line, datasets, [{"m": 2.0, "b": 1.0},
                                           {"m": 2.0, "b": 100.0}],
                          data_error=0.05, walkers_per_dataset=32, seed=0,
                          walker_jitter=0.02)
    fit.adaptive_steps(60000, auto="rank-rhat", temperature=2.0)
    assert fit.age < 60000


def test_reset_to_most_likely_per_dataset(rng):
    """The batched override resets each block to ITS OWN best step; the
    base verb's global argmax would teleport every dataset's walkers to
    one dataset's optimum (walkers evaluating a different posterior
    than the position they hold)."""
    x = np.linspace(0.0, 10.0, 40)
    datasets = [(x, 1.0 * x + 0.05 * rng.standard_normal(40)),
                (x, 3.0 * x + 0.05 * rng.standard_normal(40))]
    fit = mfit.BatchedFit(line, datasets, [{"m": 1.0, "b": 0.1},
                                           {"m": 3.0, "b": 0.1}],
                          data_error=0.05, walkers_per_dataset=16, seed=0,
                          walker_jitter=0.02)
    fit.adaptive_steps(2000, auto=None)
    bests = fit.best_params_per_dataset()
    fit.reset_to_most_likely()
    pos = np.asarray(fit.state.position)
    for s, best in enumerate(bests):
        blk = pos[s * 16:(s + 1) * 16]
        np.testing.assert_allclose(
            blk, np.broadcast_to(blk[0], blk.shape))  # block collapsed...
        assert blk[0][0] == pytest.approx(best["m"])  # ...to ITS best
    # ...and the two blocks differ (global broadcast would equal them).
    assert abs(pos[0, 0] - pos[16, 0]) > 1.0
    # Logprobs are consistent with the held positions (resumable).
    fit.adaptive_steps(400, auto=None)
    for tau_true, p in zip([1.0, 3.0], fit.best_params_per_dataset()):
        assert p["m"] == pytest.approx(tau_true, abs=0.1)


def test_batched_convergence_per_dataset(rng):
    """First-class BatchedFit.convergence: worst-case + per-dataset gate."""
    datasets = _decays(rng, [1.5, 4.0])
    fit = mfit.BatchedFit(
        exponential_decay, datasets, {"scale": 1.5, "tau": 2.0, "bg0": 0.2},
        data_error=0.01, walkers_per_dataset=48, seed=1)
    fit.adaptive_steps(5000, auto=None, collect_history=False)
    fit.reset_to_most_likely()
    fit.adaptive_steps(4000, temperature=1.0, auto=None)

    conv = fit.convergence(min_tail_ess=50.0)
    assert len(conv["per_dataset"]) == 2
    assert conv["ok"] == all(v["ok"] for v in conv["per_dataset"])
    assert conv["ok"], conv["failures"]
    # aggregate really is the worst case over blocks
    for k in fit.spec.keys:
        assert conv["tail_ess"][k] == pytest.approx(
            min(v["tail_ess"][k] for v in conv["per_dataset"]))

    # an honest verdict on an UNCONVERGED batch: tiny history, hot phase
    fit2 = mfit.BatchedFit(
        exponential_decay, datasets, {"scale": 1.5, "tau": 2.0, "bg0": 0.2},
        data_error=0.01, walkers_per_dataset=48, seed=2)
    fit2.adaptive_steps(600, temperature=20.0, auto=None)
    conv2 = fit2.convergence()
    assert not conv2["ok"]
    assert any(msg.startswith("dataset ") for msg in conv2["failures"])


def test_batched_loo_pit_and_sensitivity_per_dataset(rng):
    """The round-3 diagnostics follow the per-dataset toolchain pattern:
    one verdict per dataset block, computed on its own view."""
    datasets = _decays(rng, [1.0, 4.0])
    fit = mfit.BatchedFit(
        exponential_decay, datasets,
        {"scale": 1.5, "tau": 2.0, "bg0": 0.2},
        data_error=0.01, walkers_per_dataset=32, seed=0)
    fit.adaptive_steps(6000, auto=None)
    fit.burn_steps(len(fit) // 2)

    pits = fit.loo_pit_per_dataset(max_samples=128)
    assert len(pits) == 2
    assert all(p.n_points == 96 for p in pits)
    assert all(p.ok for p in pits)          # well-specified model

    sens = fit.prior_sensitivity_per_dataset(
        prior={"scale": (0.0, 5.0), "tau": (0.1, 10.0), "bg0": (0.0, 1.0)},
        max_samples=128)
    assert len(sens) == 2
    # box priors are invariant under power-scaling
    assert all(v == 0.0 for s in sens for v in s.prior.values())
