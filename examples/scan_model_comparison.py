"""Scan-grid model comparison: one peak or two, per spectrum, batched.

The lab question the reference pipeline could not ask: across a scan of
spectra (nv-specific's dir->nv-walkers workflow, one walker per file),
WHICH spectra actually resolve two peaks?  Here both model families fit
every spectrum as one batched ensemble each, and the per-dataset
comparison tools answer it spectrum-by-spectrum:

  - `laplace_per_dataset`  — S evidences per family from one vmapped
                             Hessian (instant, curvature-based)
  - `waic_per_dataset`     — S predictive scores per family from the
                             collected histories (prior-free)
  - `nested_per_dataset`   — S nested-sampling evidences per family as
                             ONE vmapped program (exact ridge-safe
                             integrals where Laplace flags n_clamped)

Run: ``python examples/scan_model_comparison.py`` (~2 min CPU).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from _common import phase, setup_platform  # noqa: E402

setup_platform()

import numpy as np

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.models import double_lorentzian_bg, lorentzian_bg


def make_scan(n_spectra=6, seed=0):
    """A field scan: peak splitting shrinks from resolved to merged."""
    rng = np.random.default_rng(seed)
    x = np.linspace(2800.0, 2940.0, 192)
    spectra, splits = [], []
    for i in range(n_spectra):
        split = 24.0 * (1.0 - i / (n_spectra - 1))        # 24 .. 0 MHz
        truth = {"scale1": 9e-5, "scale2": 8e-5,
                 "mu1": 2870.0 - split / 2, "mu2": 2870.0 + split / 2,
                 "sigma": 8.0, "bg0": 1e-4}
        y = np.asarray(double_lorentzian_bg(x, truth))
        spectra.append((x, y + 2e-6 * rng.standard_normal(x.shape)))
        splits.append(split)
    return x, spectra, splits


BOUNDS2 = {"scale1": (0.0, 1e-3), "scale2": (0.0, 1e-3),
           "mu1": (2800.0, 2940.0), "mu2": (2800.0, 2940.0),
           "sigma": (1.0, 40.0), "bg0": (0.0, 1e-3)}
# The scan data is DIPS below a background (double_lorentzian_bg is
# bg0 - L1 - L2); the one-peak lorentzian_bg is bg + scale*L, so its
# scale must be allowed NEGATIVE or it can only fit the background and
# the comparison is rigged (measured: with scale >= 0 every spectrum
# read "two peaks" by ~25+ log-units even at zero splitting).
BOUNDS1 = {"scale": (-1e-3, 1e-3), "x0": (2800.0, 2940.0),
           "linewidth": (1.0, 40.0), "bg0": (0.0, 1e-3),
           "bg1": (-1e-6, 1e-6)}


def fit_family(model, spectra, guess, bounds, steps=16000):
    fit = mfit.BatchedFit(model, spectra, guess, data_error=2e-6,
                          log_prior=mfit.make_bounds_prior(bounds),
                          walkers_per_dataset=128, seed=0,
                          walker_jitter=0.05)
    fit.adaptive_steps(steps, temperature=10.0, auto=None,
                       collect_history=False)
    fit.optimize(300)
    # WAIC needs POSTERIOR history: collapse anneal stragglers (each
    # dataset to its own best — the batched override) and sample cold.
    # Without this the hot-phase rows inflate p_waic by ~1e6 (measured
    # on this very example; see diagnostics.waic's docstring).
    fit.reset_to_most_likely()
    fit.adaptive_steps(6000, temperature=1.0, auto=None)
    fit.burn_steps(len(fit) // 2)
    return fit


def main():
    x, spectra, splits = make_scan()

    fit2 = fit_family(double_lorentzian_bg, spectra,
                      {"scale1": 8e-5, "scale2": 8e-5, "mu1": 2860.0,
                       "mu2": 2880.0, "sigma": 9.0, "bg0": 1e-4}, BOUNDS2)
    fit1 = fit_family(lorentzian_bg, spectra,
                      {"scale": -1.6e-4, "x0": 2870.0, "linewidth": 12.0,
                       "bg0": 1e-4, "bg1": 1e-12}, BOUNDS1)

    from lisp_mcmc_tpu import diagnostics

    # Quality gate before comparing anything: the per-dataset convergence
    # verdict (BatchedFit.convergence) — a failing spectrum would make
    # its WAIC/Laplace row meaningless, and the verdict names WHICH
    # spectrum to distrust instead of silently blessing the grid.  On
    # THIS grid the verdict is genuinely informative: as the splitting
    # merges (datasets 4-5), the two-peak model's mu1<->mu2 swap makes
    # the block multimodal and rank R-hat reads it loudly (measured 2.4
    # on the merged spectrum) — the same degeneracy n_clamped flags in
    # the Laplace column below.
    conv = fit2.convergence(rhat_tol=1.05, min_tail_ess=50.0)
    per_ok = [v["ok"] for v in conv["per_dataset"]]
    print(f"two-peak fit per-dataset convergence: {per_ok}")
    if conv["failures"]:
        print(f"  gate names the suspect spectra: {conv['failures'][:4]}")
    assert len(per_ok) == fit2.n_datasets
    # well-separated spectra must pass; the merged-split tail is ALLOWED
    # to fail (that failure is the signal, not a bug)
    assert all(per_ok[:3]), conv["failures"]
    failing = {int(msg.split()[1].rstrip(":")) for msg in conv["failures"]}
    assert failing <= {3, 4, 5}, conv["failures"]

    lap2 = fit2.laplace_per_dataset()
    lap1 = fit1.laplace_per_dataset()
    waic2 = fit2.waic_per_dataset(max_samples=256)
    waic1 = fit1.waic_per_dataset(max_samples=256)

    # Verdict from the PAIRED WAIC difference with its standard error
    # (the honest margin); the Laplace dlogZ is the instant cross-check
    # — note n_clamped: at merged splits the two-peak model's mu1=mu2
    # ridge is degenerate and its Laplace evidence is flagged unreliable
    # exactly where the comparison gets delicate.
    print("spectrum  split  dlogZ(Laplace) clamped  dELPD+-se(WAIC)  verdict")
    for s, split in enumerate(splits):
        dz = lap2[s].log_z - lap1[s].log_z
        cmpd = diagnostics.waic_compare(waic2[s], waic1[s])
        de, se = cmpd["elpd_diff"], cmpd["se_diff"]
        verdict = ("two peaks" if de > 2 * se else
                   "one peak" if de < -2 * se else "undecided")
        print(f"    {s}    {split:5.1f}   {dz:10.1f}      {lap2[s].n_clamped}"
              f"     {de:8.1f}+-{se:5.1f}   {verdict}")
    # Expected shape: decisively two-peak at large splits, shrinking
    # toward undecided as the splitting vanishes below the linewidth
    # (at tiny-but-nonzero splits the high-SNR data may still resolve
    # the asymmetry — "undecided" is a statement about margins, not a
    # guarantee of label "one peak").

    # Third column where it matters: on the merged spectra the two-peak
    # Laplace evidence was FLAGGED (n_clamped > 0: the mu1=mu2 ridge is
    # degenerate, a Gaussian integral there is a guess).  Nested sampling
    # integrates the ridge exactly — all S runs per family ride one
    # vmapped device program, fresh live sets from the prior (the fits'
    # ensembles are untouched).
    ns2 = fit2.nested_per_dataset(n_live=256, seed=0)
    ns1 = fit1.nested_per_dataset(n_live=256, seed=0)
    print("spectrum  split  dlogZ(nested)+-err   dlogZ(Laplace)")
    for s, split in enumerate(splits):
        dz_n = ns2[s].log_z - ns1[s].log_z
        err = float(np.hypot(ns2[s].log_z_err, ns1[s].log_z_err))
        dz_l = lap2[s].log_z - lap1[s].log_z
        print(f"    {s}    {split:5.1f}   {dz_n:10.1f}+-{err:4.2f}"
              f"   {dz_l:10.1f}")
    # On clean-curvature spectra the two estimators agree; the resolved
    # end must be decisively two-peak under BOTH.
    for s in (0, 1, 2):
        dz_n = ns2[s].log_z - ns1[s].log_z
        assert dz_n > 10.0, (s, dz_n)


if __name__ == "__main__":
    main()
