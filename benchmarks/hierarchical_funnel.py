"""Measure WHY HierarchicalFit is non-centered: the funnel, head-to-head.

Claim under test (hierarchical.py docstring): with weak per-dataset
data, the CENTERED parameterization (walk coordinates mu, tau,
theta_1..S) has Neal's-funnel geometry — as tau -> 0 the theta
coordinates must collapse with it, so any fixed proposal scale is wrong
at one end of the tau marginal — while the NON-CENTERED coordinates
(mu, tau, z with theta = mu + tau*z) make the prior factor exactly
N(0,1) per z and kill the coupling.

Protocol: same posterior twice —
  - centered: a custom-posterior Walker over (mu, tau, theta_1..S)
    with the conditional N(theta | mu, tau) prior term written out;
  - non-centered: HierarchicalFit itself;
same data (S=8 constant-model datasets, n=3 points, sigma=1 — weak on
purpose: the tau posterior has real mass near 0), same kernel, same
step budget, same seed policy.  Metric: rank-normalized bulk/tail R-hat
and tail ESS of tau (the funnel's victim coordinate) + min over thetas.

Run: python benchmarks/hierarchical_funnel.py [kernel] [steps]
(defaults: chees 20000; JAX_PLATFORMS=cpu works)
"""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu import diagnostics
from lisp_mcmc_tpu.data import Dataset
from lisp_mcmc_tpu.fit import Walker, _Term
from lisp_mcmc_tpu.likelihoods import log_likelihood_normal
from lisp_mcmc_tpu.params import ParamSpec
from lisp_mcmc_tpu.priors import Gaussian, LogNormal, log_prior_flat

S, N, SIGMA = 8, 3, 1.0
M0, S0 = 0.0, 3.0
TAU_MU, TAU_SD = math.log(0.5), 1.0
W = 128


def const_model(x, p):
    return p["c"] + 0.0 * x


def make_data(seed=0):
    rng = np.random.default_rng(seed)
    x = np.linspace(0.0, 1.0, N)
    thetas = 0.3 * rng.standard_normal(S)          # true tau small: funnel
    return [(x, t + SIGMA * rng.standard_normal(N)) for t in thetas]


def centered_walker(datasets, seed=0, config=None):
    """The SAME posterior in centered coordinates (mu, tau, theta_1..S)."""
    dsets = [Dataset.create(x, y, np.full(len(x), SIGMA)) for x, y in datasets]
    stacked = Dataset(
        x=jnp.stack([d.x for d in dsets]), y=jnp.stack([d.y for d in dsets]),
        sigma=jnp.stack([d.sigma for d in dsets]),
        mask=jnp.stack([d.mask for d in dsets]), n=int(dsets[0].x.shape[0]),
        inv_sigma=jnp.stack([d.inv_sigma for d in dsets]),
        log_norm_const=jnp.stack([d.log_norm_const for d in dsets]),
        log_norm_const_point=jnp.stack(
            [d.log_norm_const_point for d in dsets]),
        log_fact_y=jnp.stack([d.log_fact_y for d in dsets]))
    mu_d, tau_d = Gaussian(M0, S0), LogNormal(TAU_MU, TAU_SD)

    def log_post(theta, data):
        mu, tau = theta[0], theta[1]
        th = theta[2:]
        tau_s = jnp.maximum(tau, 1e-12)

        def per(th_s, ds_s):
            return log_likelihood_normal(const_model, {"c": th_s}, ds_s)

        lik = jnp.sum(jax.vmap(per)(th, data["ds"]))
        pool = (-0.5 * jnp.sum(((th - mu) / tau_s) ** 2)
                - S * jnp.log(tau_s) - 0.5 * S * math.log(2 * math.pi))
        hyp = mu_d.installed_log_pdf(mu) + tau_d.installed_log_pdf(tau)
        return lik + pool + hyp

    keys = ["mu", "tau"] + [f"theta{s}" for s in range(S)]
    rng = np.random.default_rng(seed)
    pos = np.empty((W, 2 + S))
    pos[:, 0] = 0.1 * rng.standard_normal(W)
    pos[:, 1] = 0.5 * np.exp(0.1 * rng.standard_normal(W))
    pos[:, 2:] = 0.3 * rng.standard_normal((W, S))
    return Walker(
        terms=[_Term(fn=const_model, dataset=dsets[0],
                     likelihood=log_likelihood_normal,
                     prior=log_prior_flat)],
        spec=ParamSpec(tuple(keys)),
        initial_vector=jnp.asarray(pos, jnp.float64),
        n_walkers=W, seed=seed, config=config,
        log_posterior=log_post, posterior_data={"ds": stacked})


def metrics(fit, tau_key, theta_keys, burn):
    fit.burn_steps(burn)
    from lisp_mcmc_tpu.diagnostics import (rank_rhat_per_param,
                                           tail_ess_per_param)
    te = tail_ess_per_param(fit)
    rrk = rank_rhat_per_param(fit)              # (bulk, tail) per key
    return {
        "tau_tail_ess": te[tau_key],
        "tau_rank_rhat": max(rrk[tau_key]),
        "min_theta_tail_ess": min(te[k] for k in theta_keys),
        "max_theta_rank_rhat": max(max(rrk[k]) for k in theta_keys),
    }


def main():
    kernel = sys.argv[1] if len(sys.argv) > 1 else "chees"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    burn = int(0.6 * steps)
    cfg = mfit.FitConfig(kernel=kernel)
    data = make_data()

    cw = centered_walker(data, seed=0, config=cfg)
    cw.adaptive_steps(steps, auto=None)
    m_c = metrics(cw, "tau", [f"theta{s}" for s in range(S)], burn)

    hf = mfit.HierarchicalFit(
        const_model, data, {"c": 0.0}, data_error=SIGMA,
        hyper={"c": (Gaussian(M0, S0), LogNormal(TAU_MU, TAU_SD))},
        n_walkers=W, seed=0, config=cfg)
    hf.adaptive_steps(steps, auto=None)
    m_n = metrics(hf, "c__tau", [f"c__z{s}" for s in range(S)], burn)

    print(f"kernel={kernel} steps={steps} burn={burn} W={W} "
          f"S={S} n={N} sigma={SIGMA}")
    print(f"{'':>22}  centered   non-centered")
    for k in m_c:
        print(f"{k:>22}  {m_c[k]:8.1f}   {m_n[k]:8.1f}")
    # The victim coordinate: tau mixing.
    print(f"tau tail-ESS ratio (non-centered / centered): "
          f"{m_n['tau_tail_ess'] / max(m_c['tau_tail_ess'], 1e-9):.1f}x")


if __name__ == "__main__":
    main()
