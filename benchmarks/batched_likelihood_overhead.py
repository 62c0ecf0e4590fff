"""Generic-vs-specialized batched posterior: what does flexibility cost?

BatchedFit runs two posterior paths (batched.py): the default Gaussian
z-sum against cached per-dataset constants, and the stacked-``Dataset``
vmap path every other library/factory likelihood rides (r3).  This
benchmark measures the price of the generic path on IDENTICAL math —
a Gaussian point function through ``create_log_likelihood_function``
computes the same posterior as the z-sum, so the throughput gap is pure
plumbing (per-point log/σ ops the cached-constant path precomputes) —
and then the real robust workloads (student-t, fitted noise scale).

Methodology = bench.py's: time the raw jitted chunk runner directly
(warm chunks first, ``block_until_ready``, no history, no host work),
so the gap is the posterior path itself, not driver plumbing.

Run: python benchmarks/batched_likelihood_overhead.py [chunks]
One row per path: wall s, chain-steps/sec, relative to the z-sum path.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    import lisp_mcmc_tpu as mfit
    from lisp_mcmc_tpu.models import double_lorentzian_bg

    n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    S, B = 64, 256
    rng = np.random.default_rng(0)
    x = np.linspace(2800.0, 2940.0, 256)
    guess = {"scale1": 3e-4, "scale2": 2e-4, "mu1": 2850.0,
             "mu2": 2890.0, "sigma": 10.0, "bg0": 1e-4}

    datasets = []
    for s in range(S):
        p = dict(guess, mu1=2840.0 + 0.3 * s, mu2=2880.0 + 0.3 * s)
        mu = np.asarray(double_lorentzian_bg(
            jnp.asarray(x), {k: jnp.asarray(v) for k, v in p.items()}))
        datasets.append((x, mu + rng.normal(0, 2e-5, x.size)))

    def gaussian_point(y, mu, sigma):
        z = (y - mu) / sigma
        return -0.5 * z * z - jnp.log(sigma) - 0.5 * jnp.log(2.0 * jnp.pi)

    cases = [
        ("gaussian z-sum (default)", dict()),
        ("gaussian via generic path",
         dict(log_likelihood=mfit.create_log_likelihood_function(
             gaussian_point))),
        ("student-t(4)",
         dict(log_likelihood=mfit.make_student_t_likelihood(4.0))),
        ("fitted noise scale",
         dict(log_likelihood=mfit.make_noise_scale_likelihood(),
              log_prior=mfit.make_bounds_prior(
                  {"noise_scale": (1e-3, 1e3)}))),
    ]

    base_sps = None
    for label, kw in cases:
        params = dict(guess)
        key = getattr(kw.get("log_likelihood"), "_noise_key", None)
        if key:
            params[key] = 1.0
        fit = mfit.BatchedFit(
            double_lorentzian_bg, datasets, params, data_error=2e-5,
            walkers_per_dataset=B, seed=0, **kw)
        runner = fit._runner(with_history=False)
        data = fit._posterior_data()
        state = fit.state
        for _ in range(3):                          # compile + settle
            state, out = runner(state, True, True, False, data)
        jax.block_until_ready(state.position)
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            state, out = runner(state, True, True, False, data)
        jax.block_until_ready(state.position)
        dt = time.perf_counter() - t0
        chunk = fit.config.chunk_size
        sps = n_chunks * chunk * S * B / dt
        if base_sps is None:
            base_sps = sps
        print(f"{label:28s} {dt:7.2f} s   {sps / 1e6:8.1f}M steps/s   "
              f"{sps / base_sps:5.2f}x of z-sum")


if __name__ == "__main__":
    main()
