"""Informative (named) priors end to end: fit, evidence, calibration.

The reference's prior contract is a log-density TERM (prior-bounds-let,
mcmc-fitting.lisp:346-369; data-dependent fixers 837-845) — so a user
with a Gaussian prior from an earlier experiment could always FIT with
it, but no box-free tool existed to integrate or calibrate against it.
This workflow shows the round-3 surface that closes that gap:

1. declare   — ``PriorSpec``: Gaussian / LogNormal / Uniform per
               parameter, truncations included; ``log_prior=spec`` fits
               with its exact normalized density.
2. sanity    — ``prior_predictive`` draws parameters from the spec.
3. fit       — the usual anneal + polish; the spec rides along.
4. evidence  — all four estimators (ladder / SMC / Laplace / nested)
               return the TRUE integral ``∫ L·π`` under the declared
               prior, triangulating one number from four independent
               mechanisms (unit-cube prior transform under the hood —
               see DESIGN.md "Named priors").
5. shrinkage — prior vs posterior: what the data actually learned.
6. audit     — ``sbc_check`` calibrates the whole pipeline against the
               SAME spec it fits with.

Run: ``python examples/informative_priors.py`` (CPU-friendly, ~2 min).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from _common import phase, setup_platform  # noqa: E402

setup_platform()

import numpy as np

import lisp_mcmc_tpu as mfit

SIGMA = 0.15


def decay(x, p):
    import jax.numpy as jnp

    return p["amp"] * jnp.exp(-x / p["tau"]) + p["bg"]


def main():
    rng = np.random.default_rng(11)
    x = np.linspace(0.0, 8.0, 64)
    y = 2.1 * np.exp(-x / 1.8) + 0.25 + SIGMA * rng.standard_normal(64)

    # 1. The prior story: amp was measured before (2.0 +- 0.3), tau is a
    # positive timescale best expressed log-normally, bg is only known
    # to sit in a band.
    spec = mfit.PriorSpec({
        "amp": mfit.Gaussian(2.0, 0.3, low=0.0),          # truncated at 0
        "tau": mfit.LogNormal(np.log(2.0), 0.5),          # positive scale
        "bg": mfit.Uniform(0.0, 1.0),
    })
    print("prior spec:", spec)

    w = mfit.walker_create(
        function=decay, data=(x, y),
        params={"amp": 1.5, "tau": 1.0, "bg": 0.3},
        data_error=SIGMA, n_walkers=512, seed=0, walker_jitter=0.2,
        log_prior=spec)

    # 2. Before fitting: do prior + model even generate data on the
    # observed scale?
    pp = w.prior_predictive(n_samples=256)[0]
    print(f"prior predictive: replicate scale {pp.y_rep.std():.2f} "
          f"vs data scale {y.std():.2f}")

    # 3. Fit: anneal, polish, cold samples.
    w.adaptive_steps(6000, temperature=3.0, auto=None)
    w.optimize(300)
    w.reset_to_most_likely()
    w.sampling_steps(4000)
    best = w.most_likely_params()
    print("MAP:", {k: round(v, 4) for k, v in best.items()})
    conv = w.convergence(min_tail_ess=50.0)
    print("convergence ok:", conv["ok"])

    # 4. Evidence under the DECLARED prior, four independent ways.
    la = w.laplace_approx()                       # spec recovered from fit
    ns = w.nested_sample(n_live=512, stop_frac=1e-5, seed=3)
    ev = w.log_evidence(n_steps=12000, rungs=16, t_max=1e4, prior=spec)
    sm = w.smc_sample(prior=spec, n_move=200)     # re-seeds from the prior
    print(f"log Z: laplace {la.log_z:.2f} | nested {ns.log_z:.2f} "
          f"+- {ns.log_z_err:.2f} | ladder {ev.log_z:.2f} +- {ev.error:.2f} "
          f"| smc {sm.log_z:.2f}")
    zs = [la.log_z, ns.log_z, ev.log_z, sm.log_z]
    assert max(zs) - min(zs) < 2.0, "estimators disagree — investigate"

    # 5. Shrinkage: what did the data teach us beyond the prior?
    draws = ns.posterior_draws(4000, seed=0)
    for i, k in enumerate(["amp", "tau", "bg"]):
        lo_p, hi_p = (np.percentile(spec.sample(rng, 4000, [k]), [16, 84]))
        lo, hi = np.percentile(draws[:, i], [16, 84])
        print(f"  {k}: prior 68% [{lo_p:.2f}, {hi_p:.2f}] -> "
              f"posterior 68% [{lo:.2f}, {hi:.2f}]")

    # 6. Was the declared prior load-bearing — and does it fight the
    # data?  Power-scaling sensitivity from the history already
    # collected, no refits (Kallioinen et al. 2023).
    sens = w.prior_sensitivity()
    print("prior sensitivity:", sens)
    assert sens.ok, sens.diagnosis   # this prior agrees with this data

    # 7. Pipeline audit with the SAME spec (prior/simulator agreement is
    # the contract SBC checks *given*).
    res = mfit.sbc_check(decay, spec, x, SIGMA, n_sims=32,
                         walkers_per_dataset=32, n_steps=2500, seed=5)
    print("SBC:", res)
    assert res.ok(), res.p_values
    print("informative-prior workflow complete")


if __name__ == "__main__":
    main()
