"""Measure HierarchicalFit throughput vs grid size on real hardware.

What scaling to expect (hierarchical.py design): each walker carries the
WHOLE grid, so the per-step work is W * S model evaluations — S times a
BatchedFit walker's — while d grows as 2P + S*d_local (the proposal
matmul is O(W d^2)).  On a TPU the (W, S, N) likelihood block is one
fused vmap program, so throughput should be compute-bound and scale
~1/S at fixed W until the proposal matmul's d^2 term catches up.

Protocol: double-Lorentzian scan pixels (d_local=6, N=160), pooled
(sigma, bg0) => d = 4 + 6S.  For S in {2, 4, 8, 16}: wall-time 2000
steps at W=256 (rwm: isolates the posterior+proposal cost from chees'
gradient budget), report steps/sec, walker-model-evals/sec, and the
equivalent per-dataset rate.

Run: python benchmarks/hierarchical_scaling.py   (TPU default platform;
JAX_PLATFORMS=cpu works for a functional check.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.models import double_lorentzian_bg
from lisp_mcmc_tpu.priors import Gaussian, LogNormal

W, STEPS, N = 256, 2000, 160


def make_scan(S, seed=0):
    rng = np.random.default_rng(seed)
    x = np.linspace(2800.0, 2940.0, N)
    out = []
    for i in range(S):
        split = 10.0 + 10.0 * i / max(S - 1, 1)
        truth = {"scale1": 9e-5, "scale2": 8.5e-5,
                 "mu1": 2870.0 - split / 2, "mu2": 2870.0 + split / 2,
                 "sigma": 8.0, "bg0": 1e-4}
        y = np.asarray(double_lorentzian_bg(x, truth))
        out.append((x, y + 4e-6 * rng.standard_normal(x.shape)))
    return out


def make_fit(S):
    guess = {"scale1": 8e-5, "scale2": 8e-5, "mu1": 2862.0, "mu2": 2878.0,
             "sigma": 9.0, "bg0": 1e-4}
    return mfit.HierarchicalFit(
        double_lorentzian_bg, make_scan(S), guess, data_error=4e-6,
        pooled=["sigma", "bg0"],
        hyper={"sigma": (Gaussian(9.0, 4.0, low=0.5),
                         LogNormal(np.log(0.8), 0.7)),
               "bg0": (Gaussian(1e-4, 5e-5), LogNormal(np.log(3e-6), 1.0))},
        local_priors={"scale1": (0.0, 1e-3), "scale2": (0.0, 1e-3),
                      "mu1": (2800.0, 2870.0), "mu2": (2870.0, 2940.0)},
        n_walkers=W, seed=0)


def main():
    mfit.enable_compilation_cache()
    print(f"W={W} steps={STEPS} N={N} (rwm)")
    print("   S    d   wall(s)  steps/s   model-evals/s  per-dataset-steps/s")
    for S in (2, 4, 8, 16):
        fit = make_fit(S)
        fit.adaptive_steps(200, auto=None)          # compile out of timing
        t0 = time.perf_counter()
        fit.adaptive_steps(STEPS, auto=None)
        dt = time.perf_counter() - t0
        sps = STEPS * W / dt
        print(f"  {S:2d}  {fit.spec.ndim:3d}  {dt:7.2f}  {sps:9.3g}"
              f"   {sps * S:12.3g}   {sps:10.3g}")


if __name__ == "__main__":
    main()
