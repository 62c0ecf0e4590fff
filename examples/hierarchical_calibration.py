"""The hierarchical calibration loop: trust, verify, refit (round 4).

Partial pooling (``HierarchicalFit``) is the model class where
miscalibration hides best: tau posteriors concentrate near boundaries,
shrinkage can bury a discrepant dataset, and PSIS-LOO's importance
ratios break exactly at the influential points you care about.  This
example runs the full closed loop the framework provides for it:

  1. **Before fitting** — ``sbc_check_hierarchical``: simulation-based
     calibration of the whole pipeline (prior -> simulate -> refit ->
     rank) in walk space.  tau/z rank uniformity is the funnel check
     nothing else provides.  All simulations refit as ONE grouped
     ensemble.
  2. **Fit** — a 5-dataset grid with one contaminated dataset (a gross
     outlier point), pooled slope through a population.
  3. **Verify** — joint ``diagnostics.loo`` over the dataset-major
     point axis flags the outlier (Pareto k > 0.7: importance sampling
     cannot reach its leave-one-out posterior).
  4. **Refit** — ``diagnostics.reloo`` masks each flagged point out of
     its stacked block and refits the FULL joint non-centered posterior
     (all leave-out posteriors as adaptation groups of one ensemble),
     replacing the flagged elpds with exact values; ``kfold`` cross-
     checks wholesale.

No reference analogue at any step: the Lisp original has no pooling, no
LOO, and no refit machinery (its closest workflow is the sequential
independent batch driver, nv-specific.lisp:58-66).

Run: ``python examples/hierarchical_calibration.py`` (~6 min CPU).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from _common import phase, setup_platform  # noqa: E402

setup_platform()

import numpy as np

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.diagnostics import kfold, loo, reloo
from lisp_mcmc_tpu.models import line
from lisp_mcmc_tpu.priors import Gaussian, LogNormal

HYPER = {"m": (Gaussian(2.0, 1.0), LogNormal(np.log(0.3), 0.5)),
         "b": (Gaussian(1.0, 1.0), LogNormal(np.log(0.3), 0.5))}


def main():
    rng = np.random.default_rng(7)

    # ---- 1. calibrate the pipeline BEFORE trusting any fit ----------
    print("== 1. SBC of the partial-pooling pipeline (walk space) ==")
    x_sbc = np.linspace(0.0, 1.0, 8)
    sbc = mfit.sbc_check_hierarchical(
        lambda x, p: p["c"] + 0.0 * x, x_sbc, {"c": 0.0}, 4,
        data_error=0.5,
        hyper={"c": (Gaussian(0.0, 1.0), LogNormal(np.log(0.5), 0.4))},
        n_sims=40, walkers_per_sim=24, n_steps=3000,
        sampling_steps=3000, sampling_kernel="mala", seed=0)
    print(f"   {sbc}")
    print(f"   tau uniformity p = {sbc.p_values['c__tau']:.3f} "
          f"(the funnel check)\n")

    # ---- 2. fit a grid with one contaminated dataset ----------------
    print("== 2. 5-dataset pooled fit, one gross outlier planted ==")
    S, n = 5, 16
    x = np.linspace(0.0, 10.0, n)
    ms = rng.normal(2.0, 0.3, S)
    datasets = [(x, m * x + 1.0 + rng.normal(0, 0.3, n)) for m in ms]
    datasets[1][1][7] += 4.5                      # the contamination
    fit = mfit.HierarchicalFit(line, datasets, {"m": 1.5, "b": 0.5},
                               data_error=0.3, hyper=HYPER,
                               n_walkers=128, seed=0)
    fit.adaptive_steps(3000, auto=None)
    fit.reset()
    fit.sampling_steps(3000, kernel="chees")
    fit.burn_steps(len(fit) // 2)
    hp = fit.hyper_params("median")
    print(f"   population slope: mu={hp['mu']['m']:.3f} "
          f"tau={hp['tau']['m']:.3f}\n")

    # ---- 3. joint LOO flags the point IS cannot handle --------------
    print("== 3. joint PSIS-LOO over all 80 points ==")
    base = loo(fit)
    flagged = np.where(base.pareto_k > 0.7)[0]
    planted = 1 * n + 7                           # dataset-major index
    print(f"   {base}")
    print(f"   flagged (k > 0.7): {flagged.tolist()} "
          f"(planted outlier is index {planted})\n")

    # ---- 4. exact refits: the loop closes ---------------------------
    print("== 4. reloo (exact leave-one-out refits of the JOINT fit) ==")
    exact = reloo(fit, base, n_steps=1200, walkers_per_dataset=16)
    print(f"   {exact}")
    print(f"   elpd PSIS -> exact: {base.elpd:.2f} -> {exact.elpd:.2f}; "
          f"all flags cleared: {bool((exact.pareto_k <= 0.7).all())}")
    kf = kfold(fit, k=5, n_steps=1200, walkers_per_dataset=16)
    print(f"   kfold cross-check: {kf}")
    print("\nThe loop: calibrate -> fit -> flag -> refit exactly. "
          "Every stage is one vectorized ensemble program.")


if __name__ == "__main__":
    main()
