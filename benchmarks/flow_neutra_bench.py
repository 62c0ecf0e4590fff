"""Flow + NeuTra on curved geometry, measured on the device.

Target: d=8 "multi-banana" — four independent banana pairs
(t_{2i} ~ N(0,1), t_{2i+1} | t_{2i} ~ N(t_{2i}^2, 0.25^2)) under a
uniform box.  Closed-form evidence: log Z = 4 log(2 pi 0.25) - log V.
Every pairwise marginal is bent, so Gaussian summaries (ADVI, the
adapted L) are structurally wrong in all four planes at once.

Arms (all wall-clock on the current backend, compile included):
  1. theta-space sampling with rwm / chees on the converged ensemble;
  2. flow_advi training (evidence quality vs closed form);
  3. NeuTra: chees in the flow's latent space, min-ESS/sec of the
     MAPPED chains, amortizing the flow training into the cost.

Run: python benchmarks/flow_neutra_bench.py [W] [flow_steps]
"""

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.ops.reductions import effective_sample_size

PAIRS = 4
D = 2 * PAIRS
BOUNDS = {}
for i in range(PAIRS):
    BOUNDS[f"a{i}"] = (-6.0, 6.0)
    BOUNDS[f"b{i}"] = (-2.0, 10.0)
TRUTH = PAIRS * math.log(2 * math.pi * 0.25) - sum(
    math.log(hi - lo) for lo, hi in BOUNDS.values())


def model(x, p):
    return jnp.zeros_like(x)


def loglik(fn, params, dataset):
    lp = 0.0
    for i in range(PAIRS):
        a, b = params[f"a{i}"], params[f"b{i}"]
        lp = lp - 0.5 * a ** 2 - 0.5 * ((b - a ** 2) / 0.25) ** 2
    return lp


def min_ess_by_step(samples_by_step, max_chains=64):
    T, W, d = samples_by_step.shape
    idx = np.linspace(0, W - 1, min(W, max_chains)).astype(int)
    chains = samples_by_step[:, idx, :]
    return min(float(effective_sample_size(chains[:, :, j]))
               for j in range(d))


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    flow_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 12000
    guesses = {}
    for i in range(PAIRS):
        guesses[f"a{i}"] = 0.5
        guesses[f"b{i}"] = 0.5
    w = mfit.walker_create(
        function=model, data=([0.0, 1.0], [0.0, 0.0]), params=guesses,
        log_likelihood=loglik, log_prior=mfit.make_bounds_prior(BOUNDS),
        n_walkers=W, seed=0, walker_jitter=0.5)
    w.adaptive_steps(6000, temperature=2.0, auto=None)
    print(f"# multi-banana d={D}, W={W}, truth log Z = {TRUTH:.3f}")

    n_meas = 2000
    for kernel in ("rwm", "chees"):
        snap = w.state
        t0 = time.perf_counter()
        w.sampling_steps(n_meas, kernel=kernel)
        dt = time.perf_counter() - t0
        pos, _ = w._history(n_meas)
        ess = min_ess_by_step(pos)
        curv = np.polyfit(pos.reshape(-1, D)[:, 0],
                          pos.reshape(-1, D)[:, 1], 2)[0]
        print(f"theta-space {kernel:>6s}: {dt:6.1f}s  "
              f"min-ESS {ess:8.0f}  ESS/s {ess / dt:8.0f}  curv {curv:.2f}")
        w.state = snap
        w.reset()

    t0 = time.perf_counter()
    fv = w.flow_advi(n_steps=flow_steps, seed=0)
    t_flow = time.perf_counter() - t0
    print(f"flow_advi ({flow_steps} steps): {t_flow:6.1f}s  "
          f"log_z {fv.log_z:.3f} (err {fv.log_z - TRUTH:+.3f})  "
          f"pareto_k {fv.pareto_k:.2f}  trust {fv.converged_evidence}")

    t0 = time.perf_counter()
    res = fv.neutra_sample(w, n_steps=n_meas, kernel="chees",
                           n_walkers=min(W, 1024), seed=1)
    t_neutra = time.perf_counter() - t0
    ess = min_ess_by_step(res.samples_by_step)
    curv = np.polyfit(res.samples[:, 0], res.samples[:, 1], 2)[0]
    print(f"NeuTra chees       : {t_neutra:6.1f}s  "
          f"min-ESS {ess:8.0f}  ESS/s {ess / t_neutra:8.0f}  "
          f"(amortized w/ flow: {ess / (t_neutra + t_flow):.0f}/s)  "
          f"curv {curv:.2f}  acc {res.acceptance:.2f}")


if __name__ == "__main__":
    main()
