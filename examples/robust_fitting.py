"""Messy-data fitting tour: outliers, unknown noise, noisy abscissae.

Real lab data breaks the textbook Gaussian assumptions three ways, and
each breakage has a likelihood factory (all of them WAIC/LOO/PPC-ready,
all beyond anything the Lisp reference could express):

1. outliers            — `make_student_t_likelihood` (heavy tails
                         discount bad points instead of letting one
                         veto the fit)
2. unknown noise level — `make_noise_scale_likelihood` (fit sigma as a
                         parameter; predictive coverage then reflects
                         the FITTED noise)
3. noisy x             — `make_x_error_likelihood` (York/ODR profile
                         form; autodiff df/dx corrects regression
                         dilution)

Plus the scale story: S spectra with per-spectrum outliers fit as ONE
``BatchedFit`` under the t likelihood, and the robust pipeline audited
end to end by ``sbc_check(log_likelihood=...)``.

Run: ``python examples/robust_fitting.py`` (~2 min CPU).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from _common import phase, setup_platform  # noqa: E402

setup_platform()

import numpy as np

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu import diagnostics
from lisp_mcmc_tpu.models import line

rng = np.random.default_rng(0)
TRUE_M, TRUE_B = 2.0, 1.0


def fit(x, y, likelihood=None, data_error=0.1, params=None, prior=None):
    w = mfit.walker_create(
        function=line, data=(x, y),
        params=params or {"m": 1.5, "b": 0.5},
        data_error=data_error, log_likelihood=likelihood,
        log_prior=prior, n_walkers=32, seed=0, walker_jitter=0.05)
    w.adaptive_steps(5000, auto=None)
    w.burn_steps(len(w) // 2)
    return w


def main():
    x = np.linspace(0.0, 10.0, 80)

    # 1. Outliers: 10% of points are garbage.
    y = TRUE_M * x + TRUE_B + rng.normal(0, 0.1, 80)
    bad = rng.choice(80, 8, replace=False)
    y_out = y.copy()
    y_out[bad] += rng.choice([-1, 1], 8) * rng.uniform(2, 4, 8)
    w_g = fit(x, y_out)
    w_t = fit(x, y_out, mfit.make_student_t_likelihood(nu=4.0))
    print(f"outliers:   gaussian m={w_g.most_likely_params()['m']:.3f}  "
          f"student-t m={w_t.most_likely_params()['m']:.3f}  (truth 2.0)")
    r_t, r_g = diagnostics.loo(w_t), diagnostics.loo(w_g)
    print(f"            PSIS-LOO prefers t by "
          f"{diagnostics.loo_compare(r_t, r_g)['elpd_diff']:.1f} elpd "
          f"({r_g.n_bad_k} Pareto-k flags on the gaussian fit)")

    # 2. Unknown noise: data_error=1 placeholder, k fitted.
    y2 = TRUE_M * x + TRUE_B + rng.normal(0, 0.3, 80)
    w_k = fit(x, y2, mfit.make_noise_scale_likelihood(), data_error=1.0,
              params={"m": 1.5, "b": 0.5, "noise_scale": 1.0},
              prior=mfit.make_bounds_prior({"noise_scale": (1e-3, 1e3)}))
    (d,) = w_k.posterior_predictive(max_samples=256)
    print(f"unknown sigma: fitted noise_scale="
          f"{w_k.most_likely_params()['noise_scale']:.3f} (truth 0.30), "
          f"predictive coverage@90%={d.coverage():.1%}")
    # LOO-PIT tells the same story out-of-sample: trusting the claimed
    # sigma=1 is UNDER-confident (PIT humps at 0.5); the fitted noise
    # scale restores calibration.
    pit_fixed = diagnostics.loo_pit(fit(x, y2, data_error=1.0))
    pit_fitted = diagnostics.loo_pit(w_k)
    print(f"            LOO-PIT: claimed sigma ok={pit_fixed.ok} "
          f"(p={pit_fixed.p_value:.2g}) -> fitted ok={pit_fitted.ok} "
          f"(p={pit_fitted.p_value:.2g})")
    assert pit_fitted.ok and not pit_fixed.ok

    # 3. Noisy abscissae: regression dilution corrected.
    x_obs = x + rng.normal(0, 0.8, 80)
    y3 = TRUE_M * x + TRUE_B + rng.normal(0, 0.2, 80)
    w_naive = fit(x_obs, y3, data_error=0.2)
    w_xe = fit(x_obs, y3, mfit.make_x_error_likelihood(0.8), data_error=0.2)
    dil = 1.0 / (1.0 + 0.8**2 / np.var(x))
    print(f"noisy x:    naive m={w_naive.most_likely_params()['m']:.3f} "
          f"(analytic dilution predicts {TRUE_M * dil:.3f}), "
          f"york m={w_xe.most_likely_params()['m']:.3f}  (truth 2.0)")

    # 4. Robust fits at scan-grid scale: S spectra, each with its own
    #    gross outlier, fit as ONE BatchedFit under the t likelihood
    #    (r3: BatchedFit is likelihood-agnostic), then the pipeline
    #    itself is audited by SBC under the SAME likelihood — the
    #    simulator derives from the factory's generative twin.
    S = 6
    grids = []
    for s in range(S):
        ys = (1.5 + 0.2 * s) * x + TRUE_B + rng.normal(0, 0.1, x.size)
        ys[5 + s] += 5.0                         # one gross outlier each
        grids.append((x, ys))
    batch = mfit.BatchedFit(
        line, grids, {"m": 1.5, "b": 0.5}, data_error=0.1,
        log_likelihood=mfit.make_student_t_likelihood(4.0),
        walkers_per_dataset=64, seed=0)
    batch.adaptive_steps(5000, auto=None)
    slopes = [batch.best_params_per_dataset()[s]["m"] for s in range(S)]
    worst = max(abs(m - (1.5 + 0.2 * s)) for s, m in enumerate(slopes))
    print(f"scan grid:  {S} spectra, one outlier each, worst slope "
          f"error {worst:.3f} under t(4) (gaussian would be dragged)")
    assert worst < 0.1

    sbc = mfit.sbc_check(
        line, {"m": (0.5, 3.0), "b": (-1.0, 2.0)}, x[:40], 0.5,
        n_sims=30, walkers_per_dataset=32, n_steps=2500, seed=0,
        log_likelihood=mfit.make_student_t_likelihood(4.0))
    print(f"SBC audit:  robust pipeline calibrated ok={sbc.ok()} "
          f"(worst p={min(sbc.p_values.values()):.2g})")
    assert sbc.ok()


if __name__ == "__main__":
    main()
