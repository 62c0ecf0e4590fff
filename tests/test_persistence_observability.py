"""Checkpoint/resume (C18), diagnostics (ESS/R-hat), plotting (C15)."""

import os

import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu import diagnostics, plotting
from lisp_mcmc_tpu.checkpoint import walker_load, walker_save
from lisp_mcmc_tpu.models import line
from lisp_mcmc_tpu.ops.reductions import effective_sample_size, split_rhat


def _fitted_walker(n_steps=3000, n_walkers=16):
    x = np.linspace(0.0, 10.0, 40)
    y = 2.0 * x + 1.0 + np.random.default_rng(0).normal(0, 0.05, 40)
    w = mfit.walker_create(
        function=line,
        data=(x, y),
        params={"m": 1.5, "b": 0.5},
        data_error=0.05,
        n_walkers=n_walkers,
        seed=0,
        walker_jitter=0.05,
    )
    w.adaptive_steps(n_steps, auto=None)
    return w


# ---------------------------------------------------------------- checkpoint
def test_save_load_roundtrip(tmp_path):
    w = _fitted_walker()
    path = str(tmp_path / "walker001.npz")
    walker_save(w, path)
    loaded = walker_load(path)
    assert loaded is not None
    np.testing.assert_allclose(
        np.asarray(loaded.state.position), np.asarray(w.state.position)
    )
    np.testing.assert_allclose(
        np.asarray(loaded.state.l_matrix), np.asarray(w.state.l_matrix)
    )
    assert loaded.age == w.age
    assert loaded.spec.keys == w.spec.keys
    assert loaded.most_likely_params() == w.most_likely_params()
    # History survives.
    assert len(loaded) > 0


def test_loaded_walker_is_resumable(tmp_path):
    w = _fitted_walker(n_steps=1000)
    path = str(tmp_path / "resume.npz")
    walker_save(w, path)
    loaded = walker_load(path)
    age0 = loaded.age
    loaded.adaptive_steps(1000, auto=None)
    assert loaded.age == age0 + 1000
    assert loaded.most_likely_params()["m"] == pytest.approx(2.0, abs=0.1)


def test_batched_save_load_roundtrip_and_resume(tmp_path):
    from lisp_mcmc_tpu.checkpoint import batched_load, batched_save

    x = np.linspace(0.0, 10.0, 30)
    datasets = [(x, 2.0 * x + 1.0), (x, 3.0 * x - 1.0)]
    fit = mfit.BatchedFit(line, datasets, {"m": 1.0, "b": 0.5},
                          data_error=0.1, walkers_per_dataset=16, seed=0)
    fit.adaptive_steps(800, auto=None)
    path = str(tmp_path / "batched.npz")
    batched_save(fit, path)
    loaded = batched_load(path)
    assert type(loaded).__name__ == "BatchedFit"
    np.testing.assert_allclose(
        np.asarray(loaded.state.position), np.asarray(fit.state.position)
    )
    for a, b in zip(fit.best_params_per_dataset(),
                    loaded.best_params_per_dataset()):
        assert a == pytest.approx(b)
    assert loaded.config == fit.config
    # Resumable, per-dataset adaptation intact.
    loaded.adaptive_steps(400, auto=None)
    best = loaded.best_params_per_dataset()
    assert best[0]["m"] == pytest.approx(2.0, abs=0.05)
    assert best[1]["m"] == pytest.approx(3.0, abs=0.05)
    # Pad-length regression: datasets of length 30 are lane-padded to 128
    # on device; the reload must slice the padding off before rebuilding
    # (zero-error pad rows made the posterior NaN and froze the chain).
    lp_re = np.asarray(loaded._eval_batch(loaded.state.position))
    np.testing.assert_allclose(lp_re, np.asarray(loaded.state.logprob), atol=1e-9)
    assert loaded.acceptance() > 0.0

    # walker_save still refuses batched fits (wrong format)...
    with pytest.raises(ValueError, match="use batched_save"):
        walker_save(fit, str(tmp_path / "nope.npz"))
    # ...and batched_load rejects a plain-walker file.
    plain = _fitted_walker(n_steps=600)
    walker_save(plain, str(tmp_path / "plain.npz"))
    with pytest.raises(ValueError, match="not a batched checkpoint"):
        batched_load(str(tmp_path / "plain.npz"))


def test_batched_nv_checkpoint_reconstructs_prior(tmp_path):
    """The NV pipeline's data-scaled bounds prior serializes as its
    recipe (bounds table + extra-hook name) and reconstructs exactly."""
    from lisp_mcmc_tpu import nv
    from lisp_mcmc_tpu.checkpoint import batched_load, batched_save
    from lisp_mcmc_tpu.models import double_lorentzian_bg

    rng = np.random.default_rng(0)
    freqs = np.linspace(2840.0, 2900.0, 128)

    def spec(d1, d2):
        c = double_lorentzian_bg(freqs, {"scale1": 1e-5, "scale2": 1e-5,
                                         "mu1": d1, "mu2": d2,
                                         "sigma": 10.0, "bg0": 1e-4})
        return freqs, np.asarray(c) + 2e-7 * rng.standard_normal(128)

    fit = nv.BatchedNVFit([spec(2858, 2876), spec(2862, 2874)],
                          walkers_per_spectrum=32, seed=0)
    fit.adaptive_steps(1200, auto=None)
    path = str(tmp_path / "nv.npz")
    batched_save(fit, path)
    loaded = batched_load(path)
    assert loaded is not None
    # Reconstructed posterior (incl. the physics constraints) evaluates
    # identically on the saved positions.
    np.testing.assert_allclose(
        np.asarray(loaded.state.logprob),
        np.asarray(loaded._eval_batch(loaded.state.position)),
        atol=1e-6,
    )


def test_load_without_functions_prints_recommendations(tmp_path, capsys):
    w = _fitted_walker(n_steps=400)
    # Make the model unresolvable by renaming (simulates a custom closure).
    w.terms[0] = type(w.terms[0])(
        fn=lambda x, p: p["b"] + p["m"] * x,
        dataset=w.terms[0].dataset,
        likelihood=w.terms[0].likelihood,
        prior=w.terms[0].prior,
    )
    path = str(tmp_path / "anon.npz")
    walker_save(w, path)
    result = walker_load(path)
    out = capsys.readouterr().out
    assert result is None
    assert "Recommendations" in out
    # With the function supplied, load succeeds (test.lisp:46-49 contract).
    loaded = walker_load(path, function=line)
    assert loaded is not None


def test_walker_set_save_load(tmp_path):
    from lisp_mcmc_tpu.checkpoint import walker_set_load, walker_set_save
    from lisp_mcmc_tpu.walker_set import WalkerSet

    ws = WalkerSet([_fitted_walker(400), _fitted_walker(400)])
    prefix = str(tmp_path / "set")
    walker_set_save(ws, prefix)
    paths = [f"{prefix}0000.npz", f"{prefix}0001.npz"]
    loaded = walker_set_load(paths)
    assert len(loaded) == 2
    assert loaded[0].age == ws[0].age


# --------------------------------------------------------------- diagnostics
def test_ess_iid_chains():
    rng = np.random.default_rng(1)
    chains = rng.normal(size=(500, 8))
    ess = float(effective_sample_size(chains))
    # iid samples: ESS should be near T*W.
    assert ess == pytest.approx(4000, rel=0.3)


def test_ess_correlated_chains():
    rng = np.random.default_rng(2)
    T, W = 2000, 4
    x = np.zeros((T, W))
    for t in range(1, T):
        x[t] = 0.95 * x[t - 1] + rng.normal(size=W)
    ess = float(effective_sample_size(x))
    # AR(1) with rho=.95: tau ~ (1+rho)/(1-rho) = 39 -> ESS ~ T*W/39.
    assert ess < 0.1 * T * W


def test_rhat_converged_vs_diverged():
    rng = np.random.default_rng(3)
    same = rng.normal(size=(400, 8))
    assert float(split_rhat(same)) == pytest.approx(1.0, abs=0.05)
    shifted = same + np.arange(8) * 10.0
    assert float(split_rhat(shifted)) > 1.5


def test_metrics_and_summary():
    w = _fitted_walker()
    m = diagnostics.metrics(w, elapsed_seconds=1.0)
    assert 0.0 < m["acceptance"] < 1.0
    assert m["chain_steps_per_sec"] == w.age * w.n_walkers
    assert set(m["ess"]) == {"m", "b"}
    assert m["rhat"]["m"] < 1.2  # converged easy fit
    text = diagnostics.summary(w)
    assert "best log-posterior" in text and "R-hat" in text


# ------------------------------------------------------------------ plotting
def test_all_plots_render(tmp_path):
    w = _fitted_walker()
    files = {
        "fit": plotting.plot_data_and_fit(w, filename=str(tmp_path / "fit.png")),
        "res": plotting.plot_residuals(w, filename=str(tmp_path / "res.png")),
        "cat": plotting.caterpillar_plots(w, filename=str(tmp_path / "cat.png")),
        "lik": plotting.likelihood_plot(w, filename=str(tmp_path / "lik.png")),
        "corner": plotting.corner_plot(w, "m", "b", filename=str(tmp_path / "c.png")),
        "grid": plotting.all_corner_plots(w, filename=str(tmp_path / "grid.png")),
        "hist": plotting.param_histogram(w, "m", filename=str(tmp_path / "h.png")),
        "heat": plotting.heatmap([1.0, 2.0, 3.0, 4.0], 2,
                                 filename=str(tmp_path / "heat.png")),
        "acf": w.autocorrelation_plot(filename=str(tmp_path / "acf.png")),
    }
    for name in ("fit", "res", "cat", "lik", "c", "grid", "h", "heat", "acf"):
        matches = [p for p in os.listdir(tmp_path) if p.startswith(name.split(".")[0])]
        assert matches, f"missing plot output for {name}"
    # show() degrades to returning the path when headless.
    assert plotting.show(str(tmp_path / "fit.png")) == str(tmp_path / "fit.png")


def test_envelope_contains_best_fit(tmp_path):
    w = _fitted_walker()
    grid, y_best, y_lo, y_hi = plotting._fit_envelope(w, 0, 1000, 200, 0.66)
    assert (y_lo <= y_best + 1e-9).all() and (y_best <= y_hi + 1e-9).all()


def test_plots_close_figures_and_subsample(tmp_path):
    """Saved figures must not accumulate in pyplot's global registry
    (batch loops leaked one figure per call), and trace plots cap the
    Line2D count regardless of ensemble size."""
    import matplotlib.pyplot as plt

    from lisp_mcmc_tpu import plotting

    w = _fitted_walker(n_steps=800)
    before = len(plt.get_fignums())
    for i in range(22):
        plotting.likelihood_plot(w, filename=str(tmp_path / f"lp{i}.png"))
    assert len(plt.get_fignums()) == before
    data = np.zeros((10, 500))
    assert plotting._subsample_walkers(data).shape[1] <= 64


def test_demc_config_checkpoint_roundtrip(tmp_path):
    """Round-2 FitConfig fields (kernel='demc' + demc_* knobs) survive
    the save/load cycle and the loaded walker resumes under them."""
    from lisp_mcmc_tpu.kernel import FitConfig

    x = np.linspace(0.0, 10.0, 30)
    y = 2.0 * x + 1.0
    w = mfit.walker_create(
        function=line, data=(x, y), params={"m": 1.0, "b": 0.5},
        data_error=0.1, n_walkers=16, seed=0, walker_jitter=0.05,
        config=FitConfig(kernel="demc", demc_gamma=0.7,
                         demc_jump_prob=0.2))
    w.adaptive_steps(600, auto=None)
    path = str(tmp_path / "demc.npz")
    walker_save(w, path)
    loaded = walker_load(path)
    assert loaded.config.kernel == "demc"
    assert loaded.config.demc_gamma == 0.7
    assert loaded.config.demc_jump_prob == 0.2
    loaded.adaptive_steps(600, auto=None)
    assert 0.0 < loaded.acceptance() < 1.0


def test_batched_save_load_ragged(tmp_path):
    """Ragged batches round-trip: the header records EVERY dataset's true
    length.  With dataset 0 the shortest, the old single-n_points header
    silently truncated dataset 1 to 41 points (a different posterior);
    with dataset 0 the longest, it kept dataset 1's zero-error pad lanes
    and the reload raised."""
    from lisp_mcmc_tpu.checkpoint import batched_load, batched_save

    rng = np.random.default_rng(3)
    x1 = np.linspace(0.0, 10.0, 41)
    x2 = np.linspace(0.0, 10.0, 96)
    datasets = [(x1, 2.0 * x1 + 1.0 + rng.normal(0, 0.05, 41)),
                (x2, 3.0 * x2 - 1.0 + rng.normal(0, 0.05, 96))]
    fit = mfit.BatchedFit(line, datasets, {"m": 1.0, "b": 0.5},
                          data_error=0.05, walkers_per_dataset=16, seed=0)
    fit.adaptive_steps(600, auto=None)
    path = str(tmp_path / "ragged.npz")
    batched_save(fit, path)
    loaded = batched_load(path)
    assert loaded is not None
    assert [ds.n for ds in loaded._datasets] == [41, 96]
    np.testing.assert_allclose(np.asarray(loaded.state.position),
                               np.asarray(fit.state.position))
    # Same posterior: re-evaluating the restored positions reproduces the
    # restored logprobs (truncation would shift every likelihood term).
    lp_re = np.asarray(loaded._eval_batch(loaded.state.position))
    np.testing.assert_allclose(lp_re, np.asarray(loaded.state.logprob),
                               atol=1e-9)
    loaded.adaptive_steps(200, auto=None)
    best = loaded.best_params_per_dataset()
    assert best[0]["m"] == pytest.approx(2.0, abs=0.1)
    assert best[1]["m"] == pytest.approx(3.0, abs=0.1)
